"""M2 — reference-parity ETL: CSV dialect, schema inference/evolution,
bookmark-incremental processing, Change-schema transform, staged COPY load.

The last test runs the reference's whole pipeline shape end-to-end:
"upload" CSVs -> crawl (infer) -> bookmark-incremental job -> Change schema
-> COPY into a warehouse (DuckDB standing in for Redshift).
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F, types as T

from s3_glue_redshift_guide_spark.operators import SchemaMapping
from s3_glue_redshift_guide_spark.sinks import DuckDBWarehouse, StagedCopyWriter
from s3_glue_redshift_guide_spark.sources import (
    IncrementalFileSource,
    SchemaEvolutionError,
    crawl,
    infer_csv_schema,
    merge_additive,
    read_csv_dialect,
    read_csv_typed,
)
from s3_glue_redshift_guide_spark.sources.evolution import evolve_and_union


def _write(path, text):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)


class TestCsvDialect:
    def test_string_first_and_quotes(self, spark, tmp_path):
        # OpenCSVSerde dialect: quoted separator, backslash escape of a quote
        _write(
            str(tmp_path / "d" / "a.csv"),
            'id,name,amount\n1,"alpha, inc",10.5\n2,"say \\"hi\\"",20\n',
        )
        df = read_csv_dialect(spark, str(tmp_path / "d"))
        assert [f.dataType for f in df.schema.fields] == [T.StringType()] * 3
        rows = {r["id"]: r for r in df.collect()}
        assert rows["1"]["name"] == "alpha, inc"
        assert rows["2"]["name"] == 'say "hi"'

    def test_typed_read_nulls_bad_cells_not_rows(self, spark, tmp_path):
        _write(str(tmp_path / "d" / "a.csv"), "id,amount\n1,10.5\n2,notanumber\n")
        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("amount", T.DoubleType()),
            ]
        )
        df = read_csv_typed(spark, str(tmp_path / "d"), schema)
        rows = {r["id"]: r["amount"] for r in df.collect()}
        assert rows[1] == 10.5
        assert rows[2] is None  # bad cell nulls the cell, keeps the row

    def test_path_glob_and_recursive(self, spark, tmp_path):
        _write(str(tmp_path / "d" / "sub" / "a.csv"), "id\n1\n")
        _write(str(tmp_path / "d" / "sub" / "b.txt"), "id\n99\n")
        df = read_csv_dialect(spark, str(tmp_path / "d"), path_glob="*.csv")
        assert [r["id"] for r in df.collect()] == ["1"]


class TestInferenceAndEvolution:
    def test_infer_and_crawl_partitions(self, spark, tmp_path):
        _write(str(tmp_path / "t" / "dt=2024-01-01" / "a.csv"), "id,v\n1,2.5\n")
        _write(str(tmp_path / "t" / "dt=2024-01-02" / "a.csv"), "id,v\n2,3.5\n")
        schema = infer_csv_schema(spark, str(tmp_path / "t"))
        assert schema["id"].dataType == T.IntegerType()
        entry = crawl(spark, "crawled_t", str(tmp_path / "t"))
        assert entry.partition_columns == ["dt"]
        assert spark.sql("SELECT count(*) AS n FROM crawled_t").collect()[0]["n"] == 2

    def test_recrawl_syncs_new_partitions_and_columns(self, spark, tmp_path):
        """Reference README.md:117: a re-crawl must 'add new columns only'
        and 'update all new and existing partitions'."""
        from s3_glue_redshift_guide_spark.sources.inference import catalog_entry

        base = str(tmp_path / "grow")
        _write(f"{base}/dt=2024-01-01/a.json", '{"id": 1, "v": 2.5}\n')
        e1 = crawl(spark, "grow_t", base, fmt="json")
        assert e1.partitions == [("2024-01-01",)]

        # the table grows: a new partition whose files carry a NEW column
        _write(f"{base}/dt=2024-01-02/a.json",
               '{"id": 2, "v": 3.5, "src": "web"}\n')
        e2 = crawl(spark, "grow_t", base, fmt="json")
        assert e2.partitions == [("2024-01-01",), ("2024-01-02",)]
        assert "src" in [f.name for f in e2.schema.fields]
        assert catalog_entry(spark, "grow_t").schema == e2.schema
        rows = {r["id"]: r["src"] for r in
                spark.sql("SELECT id, src FROM grow_t").collect()}
        assert rows == {1: None, 2: "web"}  # old files read NULL for src

    def test_recrawl_rejects_retype(self, spark, tmp_path):
        from s3_glue_redshift_guide_spark.sources.evolution import (
            SchemaEvolutionError,
        )

        base = str(tmp_path / "retype")
        _write(f"{base}/dt=2024-01-01/a.json", '{"id": 1, "v": 2}\n')
        crawl(spark, "retype_t", base, fmt="json")
        _write(f"{base}/dt=2024-01-02/a.json", '{"id": "oops", "v": 3}\n')
        with pytest.raises(SchemaEvolutionError):
            crawl(spark, "retype_t", base, fmt="json")

    def test_additive_merge_allows_new_forbids_retype(self):
        cur = T.StructType([T.StructField("a", T.LongType())])
        add = T.StructType(
            [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
        )
        merged = merge_additive(cur, add)
        assert [f.name for f in merged.fields] == ["a", "b"]
        bad = T.StructType([T.StructField("a", T.StringType())])
        with pytest.raises(SchemaEvolutionError):
            merge_additive(cur, bad)

    def test_evolve_and_union_null_fills(self, spark):
        old = spark.createDataFrame([(1,)], "a long")
        new = spark.createDataFrame([(2, "x")], "a long, b string")
        out = evolve_and_union(old, new).orderBy("a").collect()
        assert out[0]["b"] is None and out[1]["b"] == "x"


class TestIncrementalBookmark:
    def test_each_run_sees_only_new_files(self, spark, tmp_path):
        data, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
        schema = T.StructType([T.StructField("id", T.LongType())])
        seen: list[list[int]] = []

        def sink(batch_df, epoch_id):
            seen.append(sorted(r["id"] for r in batch_df.collect()))

        src = IncrementalFileSource(spark, data, schema, ckpt)
        _write(os.path.join(data, "f1.csv"), "id\n1\n2\n")
        src.run_once(sink=sink)
        _write(os.path.join(data, "f2.csv"), "id\n3\n")
        src.run_once(sink=sink)
        src.run_once(sink=sink)  # nothing new
        flat = [ids for ids in seen if ids]
        assert flat == [[1, 2], [3]]  # exactly-once per file, no reprocessing


    def test_backlog_drains_in_bounded_micro_batches(self, spark, tmp_path):
        """maxFilesPerTrigger: a backlog of files drains under
        trigger(availableNow) as multiple bounded micro-batches, not one
        giant batch — the 100 TB backfill posture."""
        data, ckpt = str(tmp_path / "bk"), str(tmp_path / "bk_ckpt")
        schema = T.StructType([T.StructField("id", T.LongType())])
        batch_sizes: list[int] = []

        def sink(batch_df, epoch_id):
            n = batch_df.count()
            if n:
                batch_sizes.append(n)

        for i in range(6):
            _write(os.path.join(data, f"f{i}.csv"), f"id\n{i}\n")
        src = IncrementalFileSource(
            spark, data, schema, ckpt, max_files_per_trigger=2
        )
        src.run_once(sink=sink)
        # 6 one-row files, 2 files per micro-batch => 3 batches of 2 rows
        assert batch_sizes == [2, 2, 2]


class TestChangeSchema:
    def test_rename_reorder_add_remove_cast(self, spark):
        df = spark.createDataFrame(
            [("1", "x", "2024-01-01")], "id string, drop_me string, day string"
        )
        mapping = SchemaMapping.from_dict(
            {
                "event_day": ("day", "timestamp"),  # rename + cast, moved first
                "id": ("id", "bigint"),
                "source_system": ("'legacy'", None) if False else ("'legacy'", "string"),
            }
        )
        out = mapping.apply(df)
        assert out.columns == ["event_day", "id", "source_system"]
        row = out.collect()[0]
        assert row["id"] == 1 and row["source_system"] == "legacy"
        assert out.schema["event_day"].dataType == T.TimestampType()


class TestStagedCopy:
    def test_copy_overwrite_and_append(self, spark, tmp_path):
        con = duckdb.connect()
        writer = StagedCopyWriter(str(tmp_path / "stage"), DuckDBWarehouse(con))
        df = spark.range(5).select(F.col("id"), (F.col("id") * 2.0).alias("v"))
        assert writer.write(df, "target", mode="overwrite") == 5
        assert writer.write(df, "target", mode="append") == 5
        assert con.sql("SELECT count(*) FROM target").fetchall()[0][0] == 10
        # staging cleaned up
        assert not os.listdir(str(tmp_path / "stage" / "target"))


class TestReferencePipelineEndToEnd:
    def test_csv_to_warehouse_incremental(self, spark, tmp_path):
        """The reference's full DAG: S3 upload -> (crawler) -> job with
        bookmark -> Change schema -> Redshift COPY, on Spark primitives."""
        data, ckpt = str(tmp_path / "landing"), str(tmp_path / "ckpt")
        con = duckdb.connect()
        writer = StagedCopyWriter(str(tmp_path / "stage"), DuckDBWarehouse(con))
        mapping = SchemaMapping.from_dict(
            {
                "order_id": ("id", "bigint"),
                "amount_usd": ("amount", "double"),
                "order_day": ("day", "timestamp"),
            }
        )
        schema = T.StructType(
            [
                T.StructField("id", T.StringType()),
                T.StructField("amount", T.StringType()),
                T.StructField("day", T.StringType()),
            ]
        )
        src = IncrementalFileSource(
            spark, data, schema, ckpt, path_glob="*.csv"
        )

        _write(os.path.join(data, "u1.csv"), "id,amount,day\n1,10.5,2024-01-01\n")
        _write(os.path.join(data, "skip.txt"), "id,amount,day\n9,9,2024-01-09\n")
        src.run_once(transform=mapping.apply, sink=writer.foreach_batch("orders_wh"))
        _write(os.path.join(data, "u2.csv"), "id,amount,day\n2,20.5,2024-01-02\n")
        src.run_once(transform=mapping.apply, sink=writer.foreach_batch("orders_wh"))

        got = con.sql(
            "SELECT order_id, amount_usd FROM orders_wh ORDER BY order_id"
        ).fetchall()
        assert got == [(1, 10.5), (2, 20.5)]  # .txt filtered, no double-loads


class TestJsonSource:
    def test_json_lines_ingest_with_schema(self, spark, tmp_path):
        """S12: JSON-lines ingest — declared schema (no inference pass over
        a 100 TB prefix) incl. a nested struct column."""
        _write(
            str(tmp_path / "j" / "a.jsonl"),
            '{"id": 1, "tags": ["a", "b"], "meta": {"src": "x", "score": 0.5}}\n'
            '{"id": 2, "tags": [], "meta": {"src": "y", "score": 1.5}}\n',
        )
        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("tags", T.ArrayType(T.StringType())),
                T.StructField(
                    "meta",
                    T.StructType(
                        [
                            T.StructField("src", T.StringType()),
                            T.StructField("score", T.DoubleType()),
                        ]
                    ),
                ),
            ]
        )
        df = spark.read.schema(schema).json(str(tmp_path / "j"))
        rows = {r["id"]: r for r in df.collect()}
        assert rows[1]["meta"]["src"] == "x" and rows[1]["tags"] == ["a", "b"]
        assert rows[2]["meta"]["score"] == 1.5

    def test_json_crawl_infers(self, spark, tmp_path):
        _write(str(tmp_path / "j2" / "a.jsonl"), '{"id": 7, "name": "n7"}\n')
        from s3_glue_redshift_guide_spark.sources import crawl

        entry = crawl(spark, "crawled_json", str(tmp_path / "j2"), fmt="json")
        assert {f.name for f in entry.schema.fields} == {"id", "name"}
        assert spark.sql("SELECT name FROM crawled_json").collect()[0][0] == "n7"


class TestUpsert:
    def test_staged_upsert_idempotent(self, spark, tmp_path):
        import duckdb as _duck
        from s3_glue_redshift_guide_spark.sinks import (
            DuckDBUpsertWarehouse,
            UpsertWriter,
            merge_dataframes,
        )

        con = _duck.connect()
        w = UpsertWriter(str(tmp_path / "stage"), DuckDBUpsertWarehouse(con))
        v1 = spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0)], "id long, name string, v double"
        )
        w.upsert(v1, "t", ["id"])
        # correction for id=2 plus a new row; replayed twice (retry) -> same state
        v2 = spark.createDataFrame(
            [(2, "b2", 21.0), (3, "c", 30.0)], "id long, name string, v double"
        )
        w.upsert(v2, "t", ["id"])
        w.upsert(v2, "t", ["id"])
        got = con.sql("SELECT id, name, v FROM t ORDER BY id").fetchall()
        assert got == [(1, "a", 10.0), (2, "b2", 21.0), (3, "c", 30.0)]

        # engine-side merge has identical semantics
        merged = merge_dataframes(v1, v2, ["id"]).orderBy("id").collect()
        assert [(r["id"], r["name"], r["v"]) for r in merged] == got


class TestOrcAndTextSources:
    def test_orc_round_trip_and_crawl(self, spark, tmp_path):
        """ORC as a first-class columnar source: write partitioned ORC,
        crawl it (union schema + partition discovery), read back."""
        from s3_glue_redshift_guide_spark.sources.inference import crawl

        src = str(tmp_path / "orc_tbl")
        spark.range(100).selectExpr(
            "id", "id % 2 AS side", "CAST(id AS STRING) AS s"
        ).write.partitionBy("side").mode("overwrite").orc(src)
        entry = crawl(spark, "orc_tbl", src, fmt="orc")
        assert entry.fmt == "orc"
        assert entry.partition_columns == ["side"]
        got = spark.table("orc_tbl")
        assert got.count() == 100
        assert {f.name for f in got.schema.fields} == {"id", "s", "side"}

    def test_text_crawl_reads_raw_lines(self, spark, tmp_path):
        """Raw-text ingestion: one row per line, single `value` column —
        the entry point for unstructured corpora."""
        from s3_glue_redshift_guide_spark.sources.inference import crawl

        d = tmp_path / "txt" / "lang=en"
        d.mkdir(parents=True)
        (d / "a.txt").write_text("hello world\nsecond line\n")
        entry = crawl(spark, "raw_docs", str(tmp_path / "txt"), fmt="text")
        got = spark.table("raw_docs")
        assert got.count() == 2
        assert set(got.columns) == {"value", "lang"}
        assert entry.partition_columns == ["lang"]


class TestXmlSource:
    def test_xml_crawl_with_partitions(self, spark, tmp_path):
        """Spark 4 native XML source behind the crawler: schema inference
        from row elements plus the same hive-layout partition discovery
        every other format gets."""
        from s3_glue_redshift_guide_spark.sources.inference import crawl

        for region in ("eu", "us"):
            d = tmp_path / "xml_tbl" / f"region={region}"
            d.mkdir(parents=True)
            (d / "part.xml").write_text(
                "<rows>"
                "<row><id>1</id><name>alpha</name><score>1.5</score></row>"
                "<row><id>2</id><name>beta</name><score>2.5</score></row>"
                "</rows>"
            )
        entry = crawl(spark, "xml_tbl", str(tmp_path / "xml_tbl"), fmt="xml")
        assert entry.fmt == "xml"
        assert entry.partition_columns == ["region"]
        assert entry.partitions == [("eu",), ("us",)]
        got = spark.table("xml_tbl")
        assert got.count() == 4
        assert set(got.columns) == {"id", "name", "score", "region"}
        assert got.filter("region = 'eu' AND id = 2").collect()[0]["name"] == "beta"
