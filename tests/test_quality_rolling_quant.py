"""Hand-computed tests for the r3 additions: Gopher quality signals,
trailing time-range rolling stats, int8 embedding quantization."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pytest
from pyspark.sql import Row

from stampede_to_fresco_etl_spark.operators.similarity import quantize_int8
from stampede_to_fresco_etl_spark.operators.text import quality_signals
from stampede_to_fresco_etl_spark.operators.windows import rolling_stats


def test_quality_signals_hand_computed(spark):
    text = "\n".join(
        [
            "the cat sat",      # 3 words
            "- bullet one",     # bullet line
            "* bullet two",     # bullet line
            "the cat sat",      # duplicate of line 1
            "to be continued...",  # ellipsis line
            "## 42 ##",         # 4 '#' symbols, no alpha in '42'
        ]
    )
    df = spark.createDataFrame([Row(doc_id=1, text=text)])
    r = quality_signals(df, "doc_id", "text").first()

    assert r["n_lines"] == 6
    # newlines are whitespace to the tokenizer: 3 words per line
    assert r["n_words"] == 18
    assert r["bullet_line_ratio"] == pytest.approx(2 / 6)
    assert r["ellipsis_line_ratio"] == pytest.approx(1 / 6)
    assert r["dup_line_ratio"] == pytest.approx(1 - 5 / 6)
    # chars: dup line 'the cat sat' (11) counted once in distinct
    total = sum(len(line) for line in text.split("\n"))
    dchars = total - 11
    assert r["dup_line_char_ratio"] == pytest.approx(1 - dchars / total)


def test_quality_signals_word_counts(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="ab cde ... #x 42")])
    r = quality_signals(df, "doc_id", "text").first()
    assert r["n_words"] == 5
    assert r["mean_word_len"] == pytest.approx((2 + 3 + 3 + 2 + 2) / 5)
    assert r["alpha_word_ratio"] == pytest.approx(3 / 5)  # ab cde #x
    # one '#' + one '...' = 2 symbols over 5 words
    assert r["symbol_word_ratio"] == pytest.approx(2 / 5)
    assert r["n_lines"] == 1 and r["dup_line_ratio"] == 0.0


def test_rolling_stats_hand_computed(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        Row(k="u1", eid=1, ts=at(0), v=10),
        Row(k="u1", eid=2, ts=at(100), v=20),
        Row(k="u1", eid=3, ts=at(301), v=40),   # 0s row fell out (301>300)
        Row(k="u1", eid=4, ts=at(301), v=5),    # tie: peer of eid=3
        Row(k="u2", eid=5, ts=at(50), v=7),     # other key untouched
    ]
    df = spark.createDataFrame(rows)
    out = {
        r["eid"]: r
        for r in rolling_stats(
            df, ["k"], "ts", "v", 300, extra_cols=["eid"]
        ).collect()
    }
    assert (out[1]["roll_n"], out[1]["roll_sum"]) == (1, 10)
    assert (out[2]["roll_n"], out[2]["roll_sum"]) == (2, 30)
    # frame at t=301 covers [1, 301]: rows at 100 and both 301 peers
    for eid in (3, 4):
        assert out[eid]["roll_n"] == 3
        assert out[eid]["roll_sum"] == 65
        assert out[eid]["roll_min"] == 5 and out[eid]["roll_max"] == 40
    assert (out[5]["roll_n"], out[5]["roll_sum"]) == (1, 7)


def test_quantize_int8_roundtrip_properties(spark):
    rows = [
        Row(vid=1, vec=[1.0, -0.5, 0.25, 0.0]),
        Row(vid=2, vec=[0.0, 0.0, 0.0, 0.0]),   # zero vector
        Row(vid=3, vec=[-2.0, 2.0, 1.0, -1.0]),
    ]
    df = spark.createDataFrame(rows)
    out = {r["vid"]: r for r in quantize_int8(df, "vid", "vec").collect()}

    # max-abs element maps to ±127 exactly; floor for the rest
    assert out[1]["q"] == [127, -64, 31, 0]  # floor(-63.5)=-64, floor(31.75)=31
    assert out[1]["scale"] == pytest.approx(1.0 / 127.0)
    assert out[3]["q"] == [-127, 127, 63, -64]

    # zero vector: zeros with scale 0, zero error
    assert out[2]["q"] == [0, 0, 0, 0]
    assert out[2]["scale"] == 0.0 and out[2]["err_scaled"] == 0

    # digest is md5 of the comma-joined ints
    want = hashlib.md5(b"127,-64,31,0").hexdigest()
    assert out[1]["q_digest"] == want

    # reconstruction error bound: |v - q*scale| < scale per element
    for vid in (1, 3):
        s = out[vid]["scale"]
        err = out[vid]["err_scaled"] / 1e12
        assert 0 <= err < len(rows[0]["vec"]) * s * s

    # error really measures the dequant residual
    v = [1.0, -0.5, 0.25, 0.0]
    s = 1.0 / 127.0
    expect = sum(
        math.floor((x - q * s) * (x - q * s) * 1e12)
        for x, q in zip(v, out[1]["q"])
    )
    assert out[1]["err_scaled"] == expect


def test_group_zscore_basic_and_zero_variance(spark):
    from pyspark.sql import functions as F

    from stampede_to_fresco_etl_spark.operators.stats import group_zscore

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0), ("b", 5.0)],
        "g string, v double",
    )
    out = {(r["g"], r["v"]): r["z"]
           for r in group_zscore(df, ["g"], "v").collect()}
    # group a: mean 2, population std = sqrt(2/3) (on scaled ints the
    # factor cancels exactly for exact decimals)
    import math
    sd = math.sqrt(2.0 / 3.0) * 10000.0
    assert out[("a", 1.0)] == pytest.approx(-10000.0 / sd, rel=1e-12)
    assert out[("a", 2.0)] == 0.0
    assert out[("a", 3.0)] == pytest.approx(10000.0 / sd, rel=1e-12)
    # zero-variance group -> NULL, not NaN/inf
    assert out[("b", 5.0)] is None
