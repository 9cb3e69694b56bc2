"""legislative_bills_database_spark — a PySpark-native analytics engine.

A brand-new engine providing the query and data-processing capabilities of
the reference project ``patrick95350/legislative-bills-database`` (a
legislative-bills ETL/analytics corpus: JSON document scans, regex/text
search, nested projections, semi/fallback joins, pivoted counts,
window-style dedup, unions, string/regex scalar functions, REST/PDF/HTML
ingestion with incremental caching), re-expressed idiomatically on Spark
SQL / DataFrames, plus LLM-data-pipeline extensions (exact/near dedup,
embedding similarity search, text analysis, multimodal column plumbing)
designed for 100 TB scale.

Layout:
  session.py    SparkSession factory (AQE on, UTC, tuned shuffle partitions)
  io.py         fixture-table loaders
  functions/    scalar expression builders (text, vectors, compat)
  operators/    composite dataflow operators (joins, dedup, similarity, ...)
  sources/      ingestion layer (rest, documents, extract, multimodal,
                sinks, cache — driver-side HTTP, JSON document model,
                PDF/HTML extraction UDFs, CSV sinks, staging/manifest)
  plans/        the declared query inventory + DuckDB oracle twins
  pipelines/    the three reference pipelines end-to-end
  streaming/    Structured Streaming variants of the batch operators
"""

__version__ = "0.1.0"
