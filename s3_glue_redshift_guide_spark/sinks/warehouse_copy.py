"""S8/S9 at scale — the staged COPY warehouse load.

Redshift (and every MPP warehouse) ingests orders of magnitude faster via
``COPY <table> FROM <staged files>`` than via JDBC INSERTs; the reference's
S3 "temporary directory" (README.md:146) exists precisely to stage job
output for that path. This module implements the pattern engine-side:

1. executors write the DataFrame as Parquet to a staging prefix
   (distributed, no driver bottleneck);
2. a single control-plane statement tells the warehouse to ingest the
   staged files;
3. staging is cleaned (or left for audit, caller's choice).

The warehouse side is pluggable via a tiny protocol (``execute_copy``) so
tests can run the full path against DuckDB as the warehouse stand-in, while
production supplies a Redshift implementation that issues the real
``COPY ... FROM 's3://...' FORMAT AS PARQUET`` over JDBC. Keeping step 2 a
single SQL statement is the point: the engine never funnels rows through
the driver or a JDBC connection.
"""

from __future__ import annotations

import shutil
import uuid
from typing import Protocol

from pyspark.sql import DataFrame


class WarehouseClient(Protocol):
    """Minimal control-plane surface a warehouse must offer."""

    def execute_copy(self, table: str, staging_path: str, mode: str) -> int:
        """Ingest staged parquet files into ``table``; return rows loaded.
        ``mode`` is "overwrite" (create/replace) or "append"."""
        ...


class StagedCopyWriter:
    def __init__(self, staging_root: str, warehouse: WarehouseClient,
                 cleanup: bool = True) -> None:
        self.staging_root = staging_root.rstrip("/")
        self.warehouse = warehouse
        self.cleanup = cleanup

    def write(self, df: DataFrame, table: str, mode: str = "append") -> int:
        """Stage ``df`` as parquet and COPY it into ``table``.

        Usable directly on a batch DataFrame or inside ``foreachBatch`` for
        the streaming load (T9) — each epoch stages to a unique prefix so
        retried epochs never double-load from a half-written directory.
        """
        staging = f"{self.staging_root}/{table}/{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(staging)
        try:
            return self.warehouse.execute_copy(table, staging, mode)
        finally:
            if self.cleanup:
                shutil.rmtree(staging, ignore_errors=True)

    def foreach_batch(self, table: str, mode: str = "append"):
        """Adapter for ``writeStream.foreachBatch`` (streaming warehouse load)."""

        def _sink(batch_df: DataFrame, epoch_id: int) -> None:
            self.write(batch_df, table, mode=mode)

        return _sink


class DuckDBWarehouse:
    """DuckDB standing in for Redshift: same control-plane shape (one COPY
    statement over staged parquet), embeddable in tests. Production swaps in
    a Redshift client issuing ``COPY ... FORMAT AS PARQUET`` over JDBC —
    the engine-side staging/contract is identical."""

    def __init__(self, con) -> None:
        self.con = con

    def execute_copy(self, table: str, staging_path: str, mode: str) -> int:
        glob = f"{staging_path}/*.parquet"
        exists = bool(
            self.con.sql(
                f"SELECT 1 FROM information_schema.tables WHERE table_name = '{table}'"
            ).fetchall()
        )
        if mode == "overwrite" or not exists:
            self.con.sql(f"CREATE OR REPLACE TABLE {table} AS SELECT * FROM '{glob}'")
        else:
            self.con.sql(f"INSERT INTO {table} SELECT * FROM '{glob}'")
        return self.con.sql(f"SELECT count(*) FROM '{glob}'").fetchall()[0][0]
