"""PPJoin crossover rehearsal (SCALE.md §ppjoin; VERDICT r4 item 7).

`ngram_jaccard_pairs(prefix_filter=True)` is output-pinned by test but
was never BENCHED in the regime it exists for.  The naive inverted-
index self-join emits Σ_s df(s)·(df(s)−1)/2 candidate rows; the prefix
path joins only on each doc's rare-first prefix.  The documented
crossover claim: naive wins on short uniform docs (little for the
length/prefix filters to prune, and the naive path ships 8-byte count
partials where verification ships string arrays); prefix wins when
Σ df² explodes — long documents with a heavy-tailed shingle df, the
web-scale near-dup regime.  This script MEASURES both sides of that
claim on synthetic corpora engineered to sit in each regime:

  short  — 5,000 docs × ~50 single-use-ish tokens (the sf0.1-like
           shape the docstring already measured): Σ df² small, capped
           naive wins.  Run WITH the df cap (both paths share it).
  web    — 3,000 docs × 240 tokens with a Zipf HEAD and NO df cap:
           20 hot tokens per doc from a 25-token head (df ≈ 2,400
           each ⇒ the naive join emits Σ df²/2 ≈ 70M candidate rows
           from the head alone), 180 mid tokens from a 50k pool
           (df ≈ 11), 40 doc-unique.  Every 10th doc pair is a
           planted near-dup (5-token edit), so the output is
           non-empty and both paths must agree on it.

The `web` regime is run UNCAPPED deliberately: a df cap would also
kill the hot tokens, but the cap CHANGES SEMANTICS (Jaccard over the
filtered universe).  When exact full-universe Jaccard is required,
prefix filtering is the scalable exact path — rare-first ordering
fills each prefix (|pref| ≈ (1−t)·|doc|+1) with the doc-unique and
low-df tokens, so the df-2,400 head never enters ANY prefix and the
candidate space collapses to near-planted-pairs-only, while the naive
join must chew all ~70M head candidates.

A uniform mid-df background (everyone df≈100, no head) is NOT a
prefix-friendly regime even though Σ df² is large: with equal dfs the
rare-first order degenerates to the tie-break, a few tie-winning
tokens become prefix-hot, and array-shipping verification loses to
the naive path's 8-byte count partials (measured: 10.6 s vs 6.8 s at
t=0.8, 100 s vs 7 s at t=0.5 on a df≈100×8k-pool corpus).  The
crossover needs df VARIANCE, not just df mass.

Determinism: fixed seed, shingle_k=1 (shingle == token) so df is
controlled exactly.  Both paths' outputs are compared for equality
(sorted pair sets) before timings are reported.

Run:  python scripts/ppjoin_rehearsal.py [mode ...]  (default: both)
Prints one JSON line per (mode, threshold, path).
"""

from __future__ import annotations

import json
import random
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from stampede_to_fresco_etl_spark.operators.dedup import (  # noqa: E402
    ngram_jaccard_pairs,
)
from stampede_to_fresco_etl_spark.session import get_spark  # noqa: E402


def make_short(rng: random.Random) -> list[tuple[int, str]]:
    """5k docs, ~50 tokens each, near-unique vocabulary: tiny Σ df²."""
    docs = []
    for i in range(5_000):
        toks = [f"s{i}_{j}" for j in range(50)]
        if i % 10 == 1:  # planted near-dup of the previous doc
            toks = [f"s{i - 1}_{j}" for j in range(50)]
            for j in rng.sample(range(50), 3):
                toks[j] = f"s{i}_edit{j}"
        docs.append((i, " ".join(toks)))
    return docs


def make_web(rng: random.Random) -> list[tuple[int, str]]:
    """3k docs × 240 tokens, Zipf head: 20 hot from a 25-token head
    (df ≈ 2,400 ⇒ ~70M naive candidates), 180 mid from a 50k pool
    (df ≈ 11), 40 doc-unique."""
    head = [f"hot{p}" for p in range(25)]
    mid_pool_size = 50_000
    docs = []
    prev: list[str] | None = None
    for i in range(3_000):
        if i % 10 == 1 and prev is not None:
            toks = list(prev)
            for j in rng.sample(range(len(toks)), 5):
                toks[j] = f"u{i}_edit{j}"
        else:
            toks = (
                rng.sample(head, 20)
                + [f"mid{rng.randrange(mid_pool_size)}" for _ in range(180)]
                + [f"u{i}_{j}" for j in range(40)]
            )
            rng.shuffle(toks)
        prev = toks
        docs.append((i, " ".join(toks)))
    return docs


#: mode -> (generator, max_shingle_df)
MODES = {"short": (make_short, 200), "web": (make_web, None)}


def main() -> None:
    want = sys.argv[1:] or list(MODES)
    spark = get_spark(
        app_name="ppjoin_rehearsal",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    for mode in want:
        gen, cap = MODES[mode]
        rows = gen(random.Random(42))
        df = spark.createDataFrame(rows, ["doc_id", "text"]).localCheckpoint()
        for t in (0.5, 0.8):
            outs = {}
            for prefix in (False, True):
                fn = lambda: ngram_jaccard_pairs(  # noqa: E731
                    df, "doc_id", "text",
                    shingle_k=1, min_jaccard=t,
                    max_shingle_df=cap, prefix_filter=prefix,
                )
                fn().write.mode("overwrite").format("noop").save()  # warm
                t0 = time.perf_counter()
                fn().write.mode("overwrite").format("noop").save()
                wall = round(time.perf_counter() - t0, 2)
                outs[prefix] = sorted(
                    (r["doc_a"], r["doc_b"]) for r in fn().collect()
                )
                print(json.dumps({
                    "mode": mode, "t": t,
                    "path": "prefix" if prefix else "naive",
                    "sec": wall, "pairs": len(outs[prefix]),
                }))
            assert outs[False] == outs[True], f"path mismatch {mode}/{t}"
    spark.stop()


if __name__ == "__main__":
    main()
