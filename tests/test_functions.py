"""Unit tests for the expression library (SURVEY §2.9/§2.10) —
hand-computed expectations for every semantic trap in SURVEY §7.3."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark import functions as ef


def one(spark, expr, **cols):
    row = spark.createDataFrame([cols or {"x": 1}]).select(expr.alias("v")).first()
    return row["v"]


def test_normalize_job_id(spark):
    # trailing digits extracted; non-numeric keeps original (trap 3)
    df = spark.createDataFrame(
        [("123",), ("job123",), ("jobID123",), ("JOB123",), ("weird",), ("a1b2",)],
        ["id"],
    )
    got = [r["v"] for r in df.select(ef.normalize_job_id("id").alias("v")).collect()]
    assert got == ["123", "123", "123", "123", "weird", "2"]


def test_to_fresco_job_id_rule_order(spark):
    # 'jobID' must be replaced before 'job' (trap 8)
    df = spark.createDataFrame([("jobID77",), ("job77",), ("77",)], ["id"])
    got = [r["v"] for r in df.select(ef.to_fresco_job_id("id").alias("v")).collect()]
    assert got == ["JOB77", "JOB77", "77"]


def test_safe_div(spark):
    assert one(spark, ef.safe_div(F.lit(10.0), F.lit(4.0))) == 2.5
    assert one(spark, ef.safe_div(F.lit(10.0), F.lit(0.0))) == 0.0
    assert one(spark, ef.safe_div(F.lit(10.0), F.lit(0.0), default=-1.0)) == -1.0


def test_validate_metric_clip_and_nullfill(spark):
    assert one(spark, ef.validate_metric(F.lit(150.0), 0.0, 100.0)) == 100.0
    assert one(spark, ef.validate_metric(F.lit(-3.0), 0.0, 100.0)) == 0.0
    assert one(spark, ef.validate_metric(F.lit(None).cast("double"), 0.0, 100.0)) == 0.0


def test_midpoint_floor_us(spark):
    lo = dt.datetime(2024, 1, 1, 0, 0, 0)
    hi = dt.datetime(2024, 1, 1, 0, 0, 1)  # 1s apart -> +500000us
    got = one(spark, ef.midpoint(F.lit(lo), F.lit(hi)))
    assert got == dt.datetime(2024, 1, 1, 0, 0, 0, 500000)
    # odd microsecond interval floors
    hi2 = dt.datetime(2024, 1, 1, 0, 0, 0, 3)
    got2 = one(spark, ef.midpoint(F.lit(lo), F.lit(hi2)))
    assert got2 == dt.datetime(2024, 1, 1, 0, 0, 0, 1)


def test_aligned_bucket_start(spark):
    anchor = dt.datetime(2024, 1, 1, 0, 0, 30)  # job starts at :30
    ts = dt.datetime(2024, 1, 1, 0, 2, 15)
    got = one(spark, ef.aligned_bucket_start(F.lit(ts), F.lit(anchor), 60))
    # buckets: [0:00:30,0:01:30) [0:01:30,0:02:30) -> ts in second bucket
    assert got == dt.datetime(2024, 1, 1, 0, 1, 30)
    # exactly on a boundary stays on it
    got2 = one(
        spark,
        ef.aligned_bucket_start(
            F.lit(dt.datetime(2024, 1, 1, 0, 1, 30)), F.lit(anchor), 60
        ),
    )
    assert got2 == dt.datetime(2024, 1, 1, 0, 1, 30)


def test_replace_first_and_finalize_jid(spark):
    df = spark.createDataFrame([("jobID123",)], ["jid"])
    # strip first 'ID' -> 'job123'; 'job'->'JOB' -> 'JOB123'; +_S
    got = df.select(ef.finalize_jid("jid").alias("v")).first()["v"]
    assert got == "JOB123_S"
    assert (
        one(spark, ef.replace_first(F.lit("abcabc"), "bc", "X")) == "aXabc"
    )
    assert one(spark, ef.replace_first(F.lit("abc"), "zz", "X")) == "abc"


def test_parse_timestamp_two_formats(spark):
    df = spark.createDataFrame(
        [("02/27/2013 13:05:01",), ("2013-02-27 13:05:01",), ("garbage",)],
        ["t"],
    )
    got = [r["v"] for r in df.select(ef.parse_timestamp("t").alias("v")).collect()]
    assert got[0] == dt.datetime(2013, 2, 27, 13, 5, 1)
    assert got[1] == dt.datetime(2013, 2, 27, 13, 5, 1)
    assert got[2] is None


def test_md5_int63_matches_duckdb(spark):
    import duckdb

    from stampede_to_fresco_etl_spark.functions import md5_int63_sql

    spark_val = one(spark, ef.md5_int63(F.lit("abc"), salt="s1"))
    oracle_expr = md5_int63_sql("'abc'", salt="s1")
    duck_val = duckdb.sql(f"select {oracle_expr} as v").fetchone()[0]
    assert spark_val == duck_val
    assert spark_val >= 0


def test_horizontal_sum(spark):
    df = spark.createDataFrame([(1.0, 2.0, 3.0)], ["a", "b", "c"])
    assert df.select(
        ef.horizontal_sum(["a", "b", "c"]).alias("v")
    ).first()["v"] == 6.0


def test_filename_date_extraction(spark, tmp_path):
    # F15: date-stamped filenames -> date column via input_file_name()
    from pyspark.sql import Row

    from stampede_to_fresco_etl_spark.functions import filename_date

    p1 = str(tmp_path / "FRESCO_Stampede_ts_2013-03-01.csv")
    p2 = str(tmp_path / "no_date_here.csv")
    import pandas as pd

    pd.DataFrame({"v": [1]}).to_csv(p1, index=False)
    pd.DataFrame({"v": [2]}).to_csv(p2, index=False)
    df = (
        spark.read.option("header", "true").csv([p1, p2])
        .select("v", filename_date().alias("file_date"))
    )
    got = {r["v"]: r["file_date"] for r in df.collect()}
    import datetime as dt

    assert got["1"] == dt.date(2013, 3, 1)
    assert got["2"] is None
