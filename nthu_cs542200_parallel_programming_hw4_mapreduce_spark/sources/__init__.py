"""Sources: chunked line-text (the reference's O1, with quirk flags) and
the parquet fixture catalog lives in ``catalog.py``."""
