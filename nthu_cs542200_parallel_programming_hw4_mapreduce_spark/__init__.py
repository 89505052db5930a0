"""PySpark-native analytics engine with the capabilities of the reference
MapReduce engine (Eugenia9915/NTHU_CS542200_Parallel_Programming_HW4_MapReduce,
``hw4.cc``) — rebuilt Spark-first, plus the LLM-data-pipeline operators a
100 TB training-data pipeline needs (dedup, similarity search, multimodal
columns, text analysis).

Design stance (SURVEY.md §1.4/§4):

* **DataFrame/SQL first** — Catalyst supplies the optimizer the reference
  lacks entirely (predicate pushdown, column pruning, join selection, AQE).
* **Shuffle-aware** — broadcast small dims, partial aggregation everywhere,
  no ``collect()`` in any operator, no row-at-a-time Python UDFs on hot
  paths.
* **Faithful mode** — the reference's exact physical contract (first-char
  partitioner hw4.cc:479, per-reducer sorted text files hw4.cc:350-357,
  tokenizer quirks hw4.cc:460-465) lives in :mod:`.mapreduce`, opt-in.
"""

__version__ = "0.1.0"
