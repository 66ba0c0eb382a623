"""S3/S4 — crawler-style schema inference and catalog registration.

The reference's crawler "scans data stores and determines the schema of the
data" (README.md:104), creating one catalog table per S3 path (README.md:117)
with partition metadata kept in sync. Spark-native equivalents:

* inference: a sampled ``inferSchema`` read (bounded by ``samplingRatio`` /
  file-limit so a 100 TB prefix never gets a full scan just to learn types);
* registration: a temp view or a catalog table (``CREATE TABLE ... USING``)
  whose partition columns come from directory layout — Spark's partition
  discovery is the crawler's partition-metadata sync (README.md:117).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .csv_dialect import OPENCSV_DIALECT
from .evolution import SchemaEvolutionError, conform, merge_additive


def infer_csv_schema(
    spark: SparkSession,
    path: str,
    header: bool = True,
    sampling_ratio: float = 1.0,
    path_glob: str | None = None,
) -> T.StructType:
    """Infer a typed schema for a CSV prefix (the crawler's classification
    step). ``sampling_ratio`` bounds the inference cost on large prefixes."""
    reader = (
        spark.read.options(**OPENCSV_DIALECT)
        .option("header", str(header).lower())
        .option("inferSchema", "true")
        .option("samplingRatio", str(sampling_ratio))
        .option("recursiveFileLookup", "true")
    )
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    return reader.csv(path).schema


@dataclass
class CatalogEntry:
    """What the crawler writes per path: name, location, format, schema,
    discovered partition columns and their discovered value tuples
    (README.md:104,117)."""

    name: str
    location: str
    fmt: str
    schema: T.StructType
    partition_columns: list[str] = field(default_factory=list)
    partitions: list[tuple] = field(default_factory=list)


#: Session-scoped catalog: (applicationId, table name) -> latest entry.
#: A second ``crawl()`` of the same name UPDATES the entry under the
#: crawler policy — add new columns only, never retype/drop, and refresh
#: the partition list with newly appeared partitions (the reference's
#: "update all new and existing partitions", README.md:117).
_CATALOG: dict[tuple[str, str], CatalogEntry] = {}


def catalog_entry(spark: SparkSession, name: str) -> CatalogEntry | None:
    return _CATALOG.get((spark.sparkContext.applicationId, name))


def crawl(
    spark: SparkSession,
    name: str,
    path: str,
    fmt: str = "csv",
    header: bool = True,
    sampling_ratio: float = 1.0,
    register: bool = True,
) -> CatalogEntry:
    """One-schema-per-path crawl: infer, discover partitions, register a view.

    Hive-style ``k=v`` directories become partition columns via Spark's
    partition discovery — no listing logic of our own, which is what keeps
    this O(metadata) instead of O(data) on a big prefix.
    """
    if fmt == "csv":
        df = (
            spark.read.options(**OPENCSV_DIALECT)
            .option("header", str(header).lower())
            .option("inferSchema", "true")
            .option("samplingRatio", str(sampling_ratio))
            .csv(path)
        )
    elif fmt == "parquet":
        # a crawler must see the UNION schema across file generations, not
        # whichever footer Spark samples first
        df = spark.read.option("mergeSchema", "true").parquet(path)
    elif fmt == "json":
        df = spark.read.option("samplingRatio", str(sampling_ratio)).json(path)
    elif fmt == "orc":
        # same union-schema requirement as parquet crawls
        df = spark.read.option("mergeSchema", "true").orc(path)
    elif fmt == "text":
        # raw text ingestion (one row per line, single `value` column) —
        # the entry point for unstructured corpora before the LLM-pipeline
        # operators take over; partition discovery still applies
        df = spark.read.text(path)
    elif fmt == "xml":
        # Spark 4 ships the XML source natively; rowTag defaults to "row"
        # (the crawler's XML classifier). samplingRatio bounds inference
        # cost the same way it does for CSV/JSON.
        df = (
            spark.read.format("xml")
            .option("rowTag", "row")
            .option("samplingRatio", str(sampling_ratio))
            .load(path)
        )
    else:
        raise ValueError(f"unsupported format: {fmt}")

    partition_cols = _partition_columns_from_layout(df, path)
    partitions = _partition_values_from_layout(df, partition_cols)

    key = (spark.sparkContext.applicationId, name)
    prev = _CATALOG.get(key)
    if prev is not None and prev.location != path:
        prev = None  # same name pointed at a new location: a fresh table
    schema = df.schema
    if prev is not None:
        # RE-crawl of a known table: additive evolution + partition sync.
        if prev.partition_columns != partition_cols:
            raise SchemaEvolutionError(
                f"table {name!r}: partition layout changed "
                f"{prev.partition_columns} -> {partition_cols}"
            )
        schema = merge_additive(prev.schema, df.schema)
        partitions = sorted(set(prev.partitions) | set(partitions))

    entry = CatalogEntry(
        name=name,
        location=path,
        fmt=fmt,
        schema=schema,
        partition_columns=partition_cols,
        partitions=partitions,
    )
    _CATALOG[key] = entry
    if register:
        # expose the EVOLVED schema: files from before a column was added
        # read as typed NULLs (metadata-only evolution, no data rewrite)
        conform(df, schema).createOrReplaceTempView(name)
    return entry


def _partition_columns_from_layout(df: DataFrame, base_path: str) -> list[str]:
    """Partition columns synthesized by discovery, recovered from the
    ``k=v`` segments of one input file's path — O(1) string parsing, no
    extra listing (``inputFiles`` reuses the scan's own file index)."""
    files = df.inputFiles()
    if not files:
        return []
    rel = files[0].split(base_path.rstrip("/").split("/")[-1], 1)[-1]
    cols = []
    for seg in rel.split("/"):
        if "=" in seg and not seg.startswith("."):
            cols.append(seg.split("=", 1)[0])
    # keep discovery order as present in df.columns
    return [c for c in df.columns if c in set(cols)]


def _partition_values_from_layout(
    df: DataFrame, partition_cols: list[str]
) -> list[tuple]:
    """Distinct partition value tuples recovered from the scan's own file
    index (``inputFiles`` — no extra listing). This is the crawler's
    partition inventory: a re-crawl unions it with what's already known,
    the MSCK-REPAIR equivalent."""
    if not partition_cols:
        return []
    seen: set[tuple] = set()
    for f in df.inputFiles():
        kv = {}
        for seg in f.split("/"):
            if "=" in seg and not seg.startswith("."):
                k, v = seg.split("=", 1)
                kv[k] = v
        if all(c in kv for c in partition_cols):
            seen.add(tuple(kv[c] for c in partition_cols))
    return sorted(seen)


def register_table(spark: SparkSession, entry: CatalogEntry, df: DataFrame) -> None:
    """Register (or refresh) the crawled table as a temp view — the session
    catalog stands in for the Glue Data Catalog (itself a Hive metastore)."""
    df.createOrReplaceTempView(entry.name)


def register_persistent_table(
    spark: SparkSession,
    name: str,
    location: str,
    schema: T.StructType,
    partition_columns: list[str],
    fmt: str = "parquet",
) -> None:
    """PERSISTENT catalog registration (the metastore path, surviving the
    session): ``CREATE TABLE ... USING <fmt> PARTITIONED BY ... LOCATION``
    over the external data, then an initial partition repair. After new
    partition directories land, call ``repair_partitions`` — the engine's
    literal MSCK REPAIR, the reference crawler's partition-metadata sync."""
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )
    parts = ", ".join(f"`{c}`" for c in partition_columns)
    spark.sql(f"DROP TABLE IF EXISTS `{name}`")
    ddl = f"CREATE TABLE `{name}` ({cols}) USING {fmt}"
    if partition_columns:
        ddl += f" PARTITIONED BY ({parts})"
    ddl += f" LOCATION '{location}'"
    spark.sql(ddl)
    repair_partitions(spark, name)


def repair_partitions(spark: SparkSession, name: str) -> int:
    """MSCK REPAIR: sync the catalog's partition list with the directories
    on storage (O(listing), no data read); returns the partition count."""
    spark.sql(f"MSCK REPAIR TABLE `{name}`")
    return spark.sql(f"SHOW PARTITIONS `{name}`").count()


def read_permissive(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "json",
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Crawler-grade messy-input read: malformed records land whole in
    ``corrupt_col`` (PERMISSIVE mode) instead of failing the job — the
    quarantine-and-continue posture a 100 TB ingest needs (one bad file
    must not kill a 10^6-file read). Filter ``corrupt_col IS NOT NULL``
    into a quarantine sink; the rest is the clean table."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    reader = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
    )
    if fmt == "json":
        return reader.json(path)
    if fmt == "csv":
        return reader.options(**OPENCSV_DIALECT).option("header", "true").csv(path)
    raise ValueError(f"unsupported format: {fmt}")
