"""Unit tests for the r5 curation operators: decontamination,
per-group caps, repetition signals, ORC sink guard.  (The catalog
queries built on them are additionally oracle-gated end-to-end by
test_oracle_parity.)"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from stampede_to_fresco_etl_spark.operators.dedup import decontaminate
from stampede_to_fresco_etl_spark.operators.sampling import cap_per_group
from stampede_to_fresco_etl_spark.operators.text import repetition_signals


def test_decontaminate_counts_distinct_shared_shingles(spark):
    train = spark.createDataFrame(
        [
            # shares "a b c" and "b c d" with eval doc 100
            (1, "a b c d"),
            # shares nothing (no 3-gram overlap)
            (2, "x y z w"),
            # repeats the contaminated shingle — still counted ONCE
            (3, "a b c a b c a b c"),
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame([(100, "a b c d e")], ["doc_id", "text"])
    got = {
        r["doc_id"]: r["n_hits"]
        for r in decontaminate(train, ev, "doc_id", "text", 3).collect()
    }
    # doc 1: shingles {a b c, b c d} both in eval -> 2
    assert got[1] == 2
    # doc 2: clean docs do NOT appear (left-join-back contract)
    assert 2 not in got
    # doc 3: set semantics — {a b c, b c a, c a b}; only "a b c" hits
    assert got[3] == 1


def test_cap_per_group_deterministic_and_small_groups(spark):
    rows = [("s1", i, float(i % 3)) for i in range(10)] + [("s2", 100, 9.9)]
    df = spark.createDataFrame(rows, ["src", "id", "q"])
    out = cap_per_group(
        df, "src", [F.col("q").desc(), F.col("id")], 4
    ).collect()
    s1 = sorted(r["id"] for r in out if r["src"] == "s1")
    s2 = [r["id"] for r in out if r["src"] == "s2"]
    # q=2.0 ids {2,5,8} first, then q=1.0 tie broken by smallest id
    assert s1 == [1, 2, 5, 8]
    # group smaller than k survives whole
    assert s2 == [100]


def test_repetition_signals_edges(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a a"),   # all 2-grams identical
            (2, "a b c d e"),   # all distinct
            (3, "a"),           # too short: no 2-grams at all
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in
           repetition_signals(df, "doc_id", "text", ns=(2,)).collect()}
    assert got[1]["n_2grams"] == 4
    assert got[1]["dup_2gram_ratio"] == pytest.approx(1 - 1 / 4)
    assert got[2]["dup_2gram_ratio"] == 0.0
    assert got[3]["n_2grams"] == 0
    assert got[3]["dup_2gram_ratio"] is None
    assert not any(
        isinstance(v, float) and math.isnan(v)
        for r in got.values()
        for v in r.asDict().values()
    )


def test_write_orc_roundtrip_and_append_guard(spark, tmp_path):
    from stampede_to_fresco_etl_spark.sources.writers import (
        SchemaMismatchError,
        write_orc,
    )

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    path = str(tmp_path / "orc")
    write_orc(df, path)
    assert sorted(map(tuple, spark.read.orc(path).collect())) == [
        (1, "a"), (2, "b"),
    ]
    write_orc(df, path, mode="append")
    assert spark.read.orc(path).count() == 4
    drifted = df.withColumnRenamed("v", "w")
    with pytest.raises(SchemaMismatchError):
        write_orc(drifted, path, mode="append")


def test_winnow_shared_run_guarantee(spark):
    """Winnowing's core property: two docs sharing a run of
    k + w - 1 = 6 tokens share at least one fingerprint; disjoint
    docs share none."""
    from stampede_to_fresco_etl_spark.operators.text import (
        winnow_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [
            (1, f"one two {shared} three four"),
            (2, f"{shared} five six seven eight nine"),
            (3, "totally unrelated words appear in this document here"),
            (4, "tiny doc"),           # < k tokens: no shingle, no fp
            (5, "just three tokens"),  # exactly k: 1 shingle -> 1 fp
        ],
        ["doc_id", "text"],
    )
    out = winnow_fingerprints(df, "doc_id", "text", k=3, w=4).collect()
    fps = {}
    for r in out:
        fps.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert fps[1] & fps[2], "shared 6-token run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])
    assert 4 not in fps
    assert len(fps[5]) == 1


def test_bpe_token_count_vs_whitespace(spark):
    from stampede_to_fresco_etl_spark.operators.text import (
        bpe_token_count,
        token_count,
    )

    df = spark.createDataFrame(
        [(1, "it's a test-case 123"), (2, "plain words only")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["ws"], r["bpe"])
        for r in df.select(
            "doc_id",
            token_count("text").alias("ws"),
            bpe_token_count("text").alias("bpe"),
        ).collect()
    }
    # "it's a test-case 123" -> it | 's | ' a' | ' test' | '-' | 'case'
    # | ' 123' = 7 BPE-ish vs 4 whitespace
    assert got[1] == (4, 7)
    assert got[2] == (3, 3)


def test_binary_quantize_hamming(spark):
    """Signature packing: known sign patterns produce known words,
    and Hamming distances count exactly the flipped dims."""
    from stampede_to_fresco_etl_spark.operators.similarity import (
        binary_quantize,
        hamming_topk,
    )

    def vec(bits):
        return [1.0 if b else -1.0 for b in bits]

    all_pos = [True] * 64
    one_flip = [True] * 64
    one_flip[0] = False          # differs from all_pos in dim 0
    hi_flip = [True] * 64
    hi_flip[63] = False          # differs in the top bit of word 1
    rows = [(0, vec(all_pos)), (1, vec(one_flip)), (2, vec(hi_flip))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    sigs = binary_quantize(df, "vec_id", "embedding", dim=64)
    got = {r["vec_id"]: (r["sig0"], r["sig1"]) for r in sigs.collect()}
    assert got[0] == (2**32 - 1, 2**32 - 1)
    assert got[1] == (2**32 - 2, 2**32 - 1)   # bit 0 cleared
    assert got[2] == (2**32 - 1, 2**31 - 1)   # bit 63 cleared
    out = hamming_topk(sigs, sigs.filter("vec_id = 0"), k=2).collect()
    d = {r["vec_id"]: r["hamming"] for r in out}
    assert d == {1: 1, 2: 1}


def test_resample_ffill_gaps(spark):
    import datetime as dt

    from stampede_to_fresco_etl_spark.operators.windows import (
        resample_ffill,
    )

    def t(h):
        return dt.datetime(2024, 1, 1, h, 30)  # mid-hour samples

    rows = [
        ("u1", t(0), 1.0),
        ("u1", t(3), 4.0),   # hours 1,2 are gaps carrying 1.0
        ("u2", t(5), 7.0),   # singleton span: one row, no gap
    ]
    df = spark.createDataFrame(rows, ["uid", "ts", "value"])
    out = resample_ffill(df, ["uid"], "ts", "value", 3600).collect()
    got = {
        (r["uid"], r["bucket_ts"].hour): (r["value_ffill"], r["is_gap"])
        for r in out
    }
    assert got[("u1", 0)] == (1.0, False)
    assert got[("u1", 1)] == (1.0, True)
    assert got[("u1", 2)] == (1.0, True)
    assert got[("u1", 3)] == (4.0, False)
    assert got[("u2", 5)] == (7.0, False)
    assert len(got) == 5


def test_audio_frame_energy_truncation_and_nulls(spark):
    import struct

    from stampede_to_fresco_etl_spark.operators.multimodal import (
        audio_frame_energy,
    )

    # 2 full frames of 4 samples + 1 leftover sample + 1 odd byte
    samples = [100, -100, 32767, -32768, 1, 2, 3, 4, 999]
    payload = struct.pack("<9h", *samples) + b"\x01"
    rows = [(1, bytearray(payload)), (2, bytearray(b"\x00")), (3, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = audio_frame_energy(df, frame_samples=4).collect()
    got = {}
    for r in out:
        got.setdefault(r["media_id"], []).append(
            (r["frame_idx"], r["energy"])
        )
    e0 = 100**2 + 100**2 + 32767**2 + 32768**2
    e1 = 1 + 4 + 9 + 16
    assert sorted(got[1]) == [(0, e0), (1, e1)]  # sample 999 dropped
    assert got[2] == [(None, None)]  # sub-frame payload -> NULL row
    assert got[3] == [(None, None)]  # NULL payload -> NULL row
