"""Idempotent warehouse upsert (MERGE emulation).

The reference's job appends via JDBC with the bookmark preventing
re-reads (README.md:145,150) — but real warehouse loads also need UPSERT
semantics (late-arriving corrections, reprocessed partitions). Without
Delta/Iceberg in v1, MERGE is emulated with the classic staged pattern,
which is exactly how Redshift does it natively (COPY to staging table,
then DELETE USING + INSERT):

* engine side: the batch stages as parquet (distributed write);
* warehouse side: one transaction — delete target rows whose keys appear
  in staging, insert all staged rows.

``merge_dataframes`` provides the same semantics engine-side (for
Spark-managed parquet targets): anti-join the target against the updates,
union the updates in — the SCD1 building block, one shuffle on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .warehouse_copy import StagedCopyWriter


def dedup_updates(
    updates: DataFrame, keys: list[str], version_col: str | None
) -> DataFrame:
    """Collapse an updates batch to one row per key — the SCD1 precondition.

    Reprocessing overlapping partitions routinely produces several rows per
    key; without this, a merge deletes the old row once but inserts every
    duplicate. ``version_col`` picks the winner (highest version; remaining
    ties broken by the key-ordered row_number, deterministic when versions
    are unique per key). With ``version_col=None`` the batch is REQUIRED to
    be key-unique and callers get exact-duplicate removal only."""
    if version_col is None:
        return updates.dropDuplicates()
    w = Window.partitionBy(*keys).orderBy(F.desc(version_col))
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_dataframes(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    version_col: str | None = None,
) -> DataFrame:
    """SCD1 merge engine-side: updates win on key collision, everything else
    passes through. One shuffle (the anti-join on keys). Updates are
    key-deduped first (see ``dedup_updates``) so the one-row-per-key
    invariant survives batches that carry the same key twice."""
    updates = dedup_updates(updates, keys, version_col)
    kept = target.join(updates.select(*keys), keys, "left_anti")
    return kept.unionByName(updates)


def apply_cdc(
    log: DataFrame,
    keys: list[str],
    version_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Collapse a change-data-capture log (insert/update/delete rows, each
    versioned) into the final table state: per key, the highest-version
    row wins; a winning delete removes the key entirely.

    One shuffle (the per-key window) over the LOG, not the table — the
    standard CDC-compaction shape: at warehouse scale the log is a day's
    deltas and this runs before a `merge_dataframes`/`UpsertWriter` pass
    against the target. Ties on version break by op descending ('U' > 'I'
    > 'D' alphabetically is NOT meaningful — versions are expected unique
    per key, same contract as ``dedup_updates``)."""
    w = Window.partitionBy(*keys).orderBy(F.desc(version_col))
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_col) != delete_op))
        .drop("__rn")
    )


def scd2_history(
    log: DataFrame,
    keys: list[str],
    version_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type 2: turn a versioned change log into
    validity intervals — each row gains ``valid_from`` (its version),
    ``valid_to`` (the next version for the key, NULL while current) and an
    ``is_current`` flag. One window pass per key ordered by version; the
    warehouse-history table every dimension load maintains."""
    w = Window.partitionBy(*keys).orderBy(F.asc(version_col))
    return (
        log.withColumn("valid_from", F.col(version_col))
        .withColumn("valid_to", F.lead(version_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull().cast("int"))
    )


class UpsertWriter(StagedCopyWriter):
    """Staged upsert into a warehouse table keyed by ``keys``.

    The warehouse client must implement ``execute_upsert(table,
    staging_path, keys)`` — for Redshift that is BEGIN; CREATE TEMP TABLE
    stage AS COPY...; DELETE FROM t USING stage WHERE keys match; INSERT
    INTO t SELECT * FROM stage; COMMIT — one round-trip, no rows through
    the driver."""

    def upsert(
        self,
        df: DataFrame,
        table: str,
        keys: list[str],
        version_col: str | None = None,
    ) -> int:
        import uuid

        df = dedup_updates(df, keys, version_col)
        staging = f"{self.staging_root}/{table}/{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(staging)
        try:
            return self.warehouse.execute_upsert(table, staging, keys)
        finally:
            if self.cleanup:
                import shutil

                shutil.rmtree(staging, ignore_errors=True)

    def foreach_batch_upsert(self, table: str, keys: list[str]):
        """Streaming variant: epoch retries re-upsert the same keys, making
        the sink effectively idempotent (exactly-once visible state)."""

        def _sink(batch_df: DataFrame, epoch_id: int) -> None:
            self.upsert(batch_df, table, keys)

        return _sink


class DuckDBUpsertWarehouse:
    """DuckDB stand-in implementing the staged-upsert control plane."""

    def __init__(self, con) -> None:
        self.con = con

    def execute_upsert(self, table: str, staging_path: str, keys: list[str]) -> int:
        glob = f"{staging_path}/*.parquet"
        exists = bool(
            self.con.sql(
                f"SELECT 1 FROM information_schema.tables WHERE table_name = '{table}'"
            ).fetchall()
        )
        if not exists:
            self.con.sql(f"CREATE TABLE {table} AS SELECT * FROM '{glob}'")
        else:
            on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
            self.con.sql("BEGIN")
            self.con.sql(
                f"DELETE FROM {table} t USING (SELECT * FROM '{glob}') s WHERE {on}"
            )
            self.con.sql(f"INSERT INTO {table} SELECT * FROM '{glob}'")
            self.con.sql("COMMIT")
        return self.con.sql(f"SELECT count(*) FROM '{glob}'").fetchall()[0][0]


def scd2_pointintime(
    history: DataFrame,
    probes: DataFrame,
    keys: list[str],
    as_of_col: str,
) -> DataFrame:
    """Point-in-time lookup against an SCD2 history: for each probe row,
    the attribute version valid at ``as_of_col`` — i.e. the history row
    with ``valid_from <= as_of < valid_to`` (open-ended for the current
    row). The read path that makes the SCD2 write path useful: training
    labels, audits, and late-event enrichment all need "what was true at
    time t", not "what is true now".

    Plan shape: an EQUI-join on the dimension key with the interval test
    as a residual filter — per-key fan-out is the key's version count
    (SCD depth, single digits in practice), so the shuffle stays linear
    in |probes| + |history| and never needs a nested loop. Probes with no
    valid version (as_of before first insert) drop out, as in SQL."""
    cond = F.lit(True)
    for k in keys:
        cond = cond & (history[k] == probes[k])
    cond = (
        cond
        & (probes[as_of_col] >= history["valid_from"])
        & (
            history["valid_to"].isNull()
            | (probes[as_of_col] < history["valid_to"])
        )
    )
    return probes.join(history, cond, "inner").drop(
        *[history[k] for k in keys]
    )
