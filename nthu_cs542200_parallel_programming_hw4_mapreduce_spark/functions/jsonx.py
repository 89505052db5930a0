"""Shared JSON-contract expressions (engine Column + oracle SQL pairs).

The duplicate-key contract lives HERE once, not at every consumer
(round-10 review): Spark's map-typed JSON reads keep the LAST
occurrence of a duplicated key while DuckDB's path lookups resolve the
FIRST — irreconcilable on mixed-type duplicates — so every typed shred
or schema profile declares duplicate-keyed payloads out-of-contract,
with the Spark predicate and the DuckDB fragment generated from the
same definition. A future refinement of the contract changes one
place and every consumer (variant_shred, json_schema_profile, and any
new JSON operator) inherits it on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def no_dup_keys(col: str = "props") -> Column:
    """TRUE iff the JSON object has no duplicated top-level key.
    NULL (→ filtered/excluded) on malformed JSON or non-objects:
    ``json_object_keys`` answers NULL there, and under ANSI
    ``size(NULL) = NULL`` propagates through the comparison."""
    keys = F.json_object_keys(col)
    return F.size(keys) == F.size(F.array_distinct(keys))


def dd_no_dup_keys(col: str = "props") -> str:
    """The DuckDB mirror of :func:`no_dup_keys`. Callers must keep a
    ``json_valid`` guard AHEAD of it (a preceding CASE arm, or a
    preceding conjunct in a WHERE — DuckDB applies filter conjuncts
    left-to-right through selection vectors, proven by the hostile
    sweep's malformed rows) because ``json_keys`` raises on malformed
    input."""
    return f"len(json_keys({col})) = len(list_distinct(json_keys({col})))"
