"""Sources: the reference's ingestion surface, Spark-native.

S1/S2/S7  csv_dialect   — OpenCSVSerde-parity CSV reader over folder prefixes
S3/S4     inference     — crawler-style schema inference + catalog registration
S5        evolution     — additive-only schema merge policy
S6/T1     incremental   — bookmark semantics via Structured Streaming file source
S10-S12   thin wrappers — parquet/json loads live in catalog.py and here
"""

from .csv_dialect import read_csv_dialect, read_csv_typed
from .evolution import SchemaEvolutionError, merge_additive
from .incremental import IncrementalFileSource
from .inference import crawl, infer_csv_schema

__all__ = [
    "read_csv_dialect",
    "read_csv_typed",
    "merge_additive",
    "SchemaEvolutionError",
    "IncrementalFileSource",
    "crawl",
    "infer_csv_schema",
]
