"""PySpark-native analytics engine with the capability surface of the
``s3-glue-redshift-guide`` reference (an S3 -> Glue -> Redshift ETL pipeline),
re-expressed Spark-first, plus LLM-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis) designed for 100 TB scale.

The reference (/root/reference/README.md) is a console walkthrough of six AWS
services; its capability surface — CSV ingestion with an explicit dialect,
crawler-style schema inference with additive evolution, bookmark-incremental
processing, a column-level "Change schema" transform, and a staged warehouse
load — maps onto Spark primitives (see SURVEY.md §1.2). Everything here is a
library over DataFrames: Catalyst owns optimization and physical execution.

Layout:
    session.py    SparkSession construction + runtime confs the engine needs
    catalog.py    canonical loaders for the test tables (schema quirks handled)
    sources/      CSV dialect reader, schema inference/evolution, incremental
    sinks/        JDBC writer + staged COPY warehouse loader
    operators/    relational ops (schema mapping, joins incl. as-of/range,
                  aggregates, windows, set ops)
    functions/    scalar/vector/text function families
    llm/          dedup (exact/minhash/simhash/ngram/embedding), similarity
                  search, text analysis, quality filtering, multimodal columns
    streaming/    Structured Streaming data plane (windows, dedup, stateful)
    queries/      the driver-facing query registry (each with a DuckDB oracle)
"""

__version__ = "0.1.0"
