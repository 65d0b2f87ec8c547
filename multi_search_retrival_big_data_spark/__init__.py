"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference multi-modal retrieval system
(YouttyLe-DSAI/Multi-Search-Retrival-Big-Data).

The reference is a hand-written NumPy/SciPy/FAISS retrieval dataflow
behind a Flask API; this package re-expresses each of its operators as
idiomatic Spark DataFrame transformations (see SURVEY.md §2 for the
operator inventory and the reference citations on each function here).

Layout:
  session    SparkSession factory with scale-aware defaults
  tables     testdata table loaders + schemas
  functions  vector / text scalar-expression helpers (JVM-side, no UDFs)
  operators  query-side operators (dense, sparse, fusion, bridges, ...)
  pipeline   LLM-training-data operators (dedup, similarity, text stats)
  sources    ingest-side readers (binary/multimodal plumbing)
  streaming  Structured Streaming extension (windowed aggregation)
  queries    named query registry backing __spark_entry__.py
"""

__version__ = "0.1.0"
