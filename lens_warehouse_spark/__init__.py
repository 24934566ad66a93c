"""lens_warehouse_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query/data-processing capabilities of
``alexanderkiel/lens-warehouse`` (a Clojure/Datomic clinical-study data
warehouse; see SURVEY.md — /root/reference is empty, so reference citations
point at the public repo's namespaces, e.g. ``src/lens/api.clj``), built
Spark-first: DataFrame/SQL plans optimized by Catalyst, plus the
LLM-data-pipeline operator set (dedup, similarity search, text analysis,
multimodal plumbing) mandated by the project north star.

Layout:
    session.py     SparkSession factory (AQE, Arrow, UTC discipline)
    catalog.py     sf_dir parquet -> named DataFrames / temp views
    registry.py    query + oracle registry feeding __spark_entry__
    operators/     relational core, cohort algebra, windows, time-series
    llm/           dedup, minhash, vectors, text stats, multimodal
    streaming/     structured-streaming twins of the batch time ops
"""

__version__ = "0.1.0"
