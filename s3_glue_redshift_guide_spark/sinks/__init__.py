"""Sinks: the reference's warehouse-load surface (S8/S9/S11).

jdbc            — direct JDBC writer with auto table creation
warehouse_copy  — the scale path: stage files + issue COPY (the pattern the
                  reference's S3 temp dir exists for)
"""

from .jdbc import write_jdbc
from .upsert import DuckDBUpsertWarehouse, UpsertWriter, merge_dataframes
from .warehouse_copy import DuckDBWarehouse, StagedCopyWriter

__all__ = [
    "write_jdbc",
    "StagedCopyWriter",
    "DuckDBWarehouse",
    "UpsertWriter",
    "DuckDBUpsertWarehouse",
    "merge_dataframes",
]
