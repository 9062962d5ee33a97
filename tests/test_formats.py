"""CSV/JSON source-format tests: explicit-schema scans, malformed-row
quarantine, and the ingest->parquet landing step."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from transit_feed_etl_spark.sources import formats as FMT

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
    ]
)


def test_csv_roundtrip_with_quarantine(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "id,name,score\n"
        "1,alpha,1.5\n"
        "2,beta,2.5\n"
        "oops,not_a_long,xyz\n"  # malformed: id/score unparseable
        "4,delta,4.5\n"
    )
    df = FMT.read_csv(spark, str(p), SCHEMA)
    good, bad = FMT.split_quarantine(df)
    assert good.count() == 3
    assert bad.count() == 1
    assert bad.select("_corrupt").first()[0].startswith("oops")
    assert [f.name for f in good.schema.fields] == ["id", "name", "score"]
    assert good.filter(F.col("id") == 2).first().score == 2.5


def test_json_roundtrip_with_quarantine(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    rows = [
        json.dumps({"id": 1, "name": "alpha", "score": 1.5}),
        '{"id": broken',
        json.dumps({"id": 3, "name": "gamma", "score": None}),
    ]
    p.write_text("\n".join(rows) + "\n")
    df = FMT.read_json(spark, str(p), SCHEMA)
    good, bad = FMT.split_quarantine(df)
    assert good.count() == 2
    assert bad.count() == 1
    assert good.filter("id = 3").first().score is None


def test_land_as_partitioned_parquet(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text(
        "id,name,score\n" + "\n".join(f"{i},n{i},{i % 3}.0" for i in range(30)) + "\n"
    )
    df = FMT.read_csv(spark, str(src), SCHEMA, quarantine=False)
    df = df.withColumn("bucket", (F.col("id") % 3).cast("int"))
    out = str(tmp_path / "landed")
    FMT.to_parquet_partitioned(df, out, ["bucket"])
    back = spark.read.parquet(out)
    assert back.count() == 30
    # Hive-style layout on disk + partition pruning in the physical plan
    assert {d.name for d in (tmp_path / "landed").iterdir() if d.is_dir()} == {
        "bucket=0",
        "bucket=1",
        "bucket=2",
    }
    pruned = back.filter(F.col("bucket") == 1)
    assert pruned.count() == 10
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(bucket" in plan


def test_sink_roundtrips_csv_json_orc(spark, tmp_path):
    """Part B 'sinks other than parquet+SQLite': CSV / JSON-lines / ORC
    writers round-trip values and nulls through their paired readers."""
    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, None, None), (3, "gamma", 3.0)], SCHEMA
    )
    out = {}
    FMT.write_csv(df, str(tmp_path / "csv"))
    out["csv"] = FMT.read_csv(
        spark, str(tmp_path / "csv"), SCHEMA, quarantine=False,
        options={"nullValue": "\\N"},
    )
    FMT.write_json(df, str(tmp_path / "json"))
    out["json"] = FMT.read_json(spark, str(tmp_path / "json"), SCHEMA, quarantine=False)
    FMT.write_orc(df, str(tmp_path / "orc"))
    out["orc"] = spark.read.orc(str(tmp_path / "orc"))
    want = {(1, "alpha", 1.5), (2, None, None), (3, "gamma", 3.0)}
    for fmt, back in out.items():
        got = {tuple(r) for r in back.select("id", "name", "score").collect()}
        assert got == want, (fmt, got)


def test_text_log_parsing_with_quarantine(spark, tmp_path):
    """spark.read.text + regex grammar: well-formed lines parse into
    typed columns, garbage lines land in quarantine, nothing is lost."""
    lines = [
        "2024-03-01T12:00:00 INFO [ingest] batch 17 ok",
        "2024-03-01T12:00:05 WARN [catalog] slow insert",
        "not a log line at all",
        "2024-03-01T12:00:09 ERROR [sink] write failed",
    ]
    p = tmp_path / "app.log"
    p.write_text("\n".join(lines))
    ok, bad = FMT.read_text_logs(spark, str(p))
    rows = {r["level"]: r for r in ok.collect()}
    assert set(rows) == {"INFO", "WARN", "ERROR"}
    assert rows["WARN"]["component"] == "catalog"
    assert rows["ERROR"]["message"] == "write failed"
    assert rows["INFO"]["ts"].minute == 0
    assert [r["value"] for r in bad.collect()] == ["not a log line at all"]


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution on read: batches written with different column
    sets unify under mergeSchema — new columns read as NULL for old
    files. The append-only evolution story a long-lived 100 TB dataset
    needs (schema widens; old files never rewritten)."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], ["id", "name"]).write.parquet(p + "/batch=1")
    spark.createDataFrame(
        [(2, "b", 9.5)], ["id", "name", "score"]
    ).write.parquet(p + "/batch=2")
    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(df.columns) == {"id", "name", "score", "batch"}
    rows = {r["id"]: r for r in df.collect()}
    assert rows[1]["score"] is None and rows[2]["score"] == 9.5
