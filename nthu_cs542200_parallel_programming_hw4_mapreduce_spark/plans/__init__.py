"""Declared query plans, grouped by capability area.

* :mod:`.core` — the reference's own surface (O1-O11, hw4.cc) plus the
  standard relational categories it lacks (SURVEY.md §2.2).
* :mod:`.text` — text analysis (tokenize, lang-ID, quality, fingerprints).
* :mod:`.dedup` — exact + fuzzy dedup (MinHash-LSH, SimHash, n-gram Jaccard).
* :mod:`.similarity` — embedding similarity search (brute-force + LSH/IVF).
* :mod:`.multimodal` — binary-column plumbing for image/audio payloads.
* :mod:`.streaming` — event-time windowed aggregation (batch + streaming).
"""
