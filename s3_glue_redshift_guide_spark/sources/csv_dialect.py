"""S1/S2/S7 — CSV ingestion with the reference's exact dialect.

The reference pins CSV parsing to OpenCSVSerde with ``escapeChar=\\``,
``quoteChar="``, ``separatorChar=,`` (reference README.md:125-131) and reads
**every column as string**; typing happens downstream in the job's schema
mapping (README.md:149). Spark's CSV defaults differ in one load-bearing way:
``escape`` defaults to ``"`` (RFC-4180 doubled-quote style), not backslash —
so this module sets the dialect explicitly and exposes the same
string-first-then-cast flow.

Folder-as-table (S2, README.md:75,113): pass a directory; ``recursiveFileLookup``
picks up nested files. Prefix/suffix filtering (S7, README.md:197-198) maps to
``pathGlobFilter``.

Scale: Spark splits large CSV files by byte ranges only when uncompressed
(multiline=False keeps records splittable); schema is declared (all-string)
so no inference pass over 100 TB is triggered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

#: the reference's OpenCSVSerde dialect (README.md:125-131)
OPENCSV_DIALECT = {
    "sep": ",",
    "quote": '"',
    "escape": "\\",
    # OpenCSVSerde has no concept of comment lines or flexible whitespace.
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
    # keep records one-per-line => byte-range splittable at scale
    "multiLine": "false",
    "mode": "PERMISSIVE",
}


def _all_string_schema(columns: list[str]) -> T.StructType:
    return T.StructType([T.StructField(c, T.StringType(), True) for c in columns])


def read_csv_dialect(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    header: bool = True,
    path_glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Read CSVs under ``path`` with OpenCSVSerde semantics: every column is a
    string (typing is the schema-mapping step's job, mirroring the crawler +
    "Change schema" split in the reference).

    ``columns`` declares names when there is no header row (the crawler would
    otherwise synthesize col0..colN); when given with ``header=True`` it
    overrides the header names positionally.
    """
    reader = spark.read.options(**OPENCSV_DIALECT).option("header", str(header).lower())
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    if columns is not None:
        df = reader.schema(_all_string_schema(columns)).csv(path)
    else:
        # No declared columns: let Spark take names from the header but force
        # StringType by disabling inference (inferSchema defaults to false).
        df = reader.csv(path)
    return df


def read_csv_typed(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    path_glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """String-first read + per-column cast to ``schema`` — the exact
    OpenCSVSerde-then-Change-schema pipeline as one call.

    Casting from the string read (rather than handing Spark the typed schema
    directly) preserves OpenCSVSerde's semantics for malformed numerics:
    a bad cell becomes NULL in that column instead of nulling the whole row.
    ``try_cast`` keeps that behavior under Spark 4's default ANSI mode,
    where a plain cast would fail the task.
    """
    raw = read_csv_dialect(
        spark,
        path,
        columns=[f.name for f in schema.fields],
        header=header,
        path_glob=path_glob,
        recursive=recursive,
    )
    return raw.select(
        *[F.col(f.name).try_cast(f.dataType).alias(f.name) for f in schema.fields]
    )
