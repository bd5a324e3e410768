"""Column-expression library — the engine's scalar-function surface.

The reference's near-UDFs (normalize_job_id, safe_division,
validate_metric, string finalizers — SURVEY §2.9/§2.10) are all
expressible as native Column expressions, so every helper here returns
a Catalyst expression: JVM-side, codegen-friendly, zero serialization
cost.  No Python UDFs anywhere in this module.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# ---------------------------------------------------------------------------
# Job-id normalization (step-2/consumer.py:161-174): extract trailing
# digits; non-numeric ids keep their original string.  Spark's
# regexp_extract yields '' on no-match (Polars yields null), so the ''
# must be nulled before the coalesce fallback — SURVEY §7.3 trap 3.
# ---------------------------------------------------------------------------

def normalize_job_id(col: Column | str) -> Column:
    c = _col(col)
    digits = F.regexp_extract(c.cast("string"), r"(\d+)$", 1)
    return F.coalesce(F.nullif(digits, F.lit("")), c.cast("string"))


def to_fresco_job_id(col: Column | str) -> Column:
    """step-1 output id normalization: 'jobID…'/'job…' → 'JOB…'
    (step-1/data_processor.py:133-134).  Rule order matters: 'jobID'
    first, else 'job123' inputs would become 'JOBID123' — SURVEY §7.3
    trap 8."""
    c = _col(col).cast("string")
    c = F.replace(c, F.lit("jobID"), F.lit("JOB"))
    return F.replace(c, F.lit("job"), F.lit("JOB"))


# ---------------------------------------------------------------------------
# Numeric guards (step-1/data_processor.py:29-36).
# ---------------------------------------------------------------------------

def safe_div(num: Column, den: Column, default: float = 0.0) -> Column:
    """when(den != 0, num/den).otherwise(default)
    (step-1/data_processor.py:29-31)."""
    return F.when(den != 0, num / den).otherwise(F.lit(default))


def clip(col: Column | str, lo: float | None = None, hi: float | None = None) -> Column:
    c = _col(col)
    if lo is not None:
        c = F.greatest(F.lit(float(lo)), c)
    if hi is not None:
        c = F.least(F.lit(float(hi)), c)
    return c


def validate_metric(col: Column | str, lo: float, hi: float | None = None) -> Column:
    """Clamp into [lo, hi] and fill null with lo
    (step-1/data_processor.py:34-36)."""
    return clip(F.coalesce(_col(col), F.lit(float(lo))), lo, hi)


def horizontal_sum(cols: list[Column | str]) -> Column:
    """Row-wise sum of columns (step-1/data_processor.py:192-195)."""
    return reduce(add, [_col(c) for c in cols])


# ---------------------------------------------------------------------------
# Timestamp helpers.
# ---------------------------------------------------------------------------

#: Raw-input format (step-1/data_processor.py:102, step-2/consumer.py:190)
FMT_US = "MM/dd/yyyy HH:mm:ss"
#: Intermediate/serialized format (step-2/consumer.py:235,267)
FMT_ISO = "yyyy-MM-dd HH:mm:ss"


def parse_timestamp(col: Column | str, fmts: list[str] | None = None) -> Column:
    """Non-strict multi-format timestamp parse: coalesce of
    try_to_timestamp over the known formats (multi-format cascade at
    step-3.1/old/consumer_2.py:175-215).  Unparseable → null (callers
    drop, mirroring strict=False + drop_nulls)."""
    c = _col(col)
    fmts = fmts or [FMT_US, FMT_ISO]
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(f)) for f in fmts])


def seconds_between(later: Column, earlier: Column) -> Column:
    """Interval → float seconds at μs precision
    (step-1/data_processor.py:119 `.dt.total_seconds()`)."""
    return (F.unix_micros(later) - F.unix_micros(earlier)) / F.lit(1_000_000.0)


def midpoint(lo: Column, hi: Column) -> Column:
    """Midpoint of two timestamps with integer-μs floor — matches the
    reference's `lo + (hi-lo)/2` at μs precision
    (step-2/consumer.py:412-414).  shiftright keeps the arithmetic in
    exact 64-bit integers (no double rounding)."""
    return F.timestamp_micros(
        F.shiftright(F.unix_micros(lo) + F.unix_micros(hi), 1)
    )


def aligned_bucket_start(ts: Column, anchor: Column, duration_sec: int) -> Column:
    """Start of the tumbling bucket containing `ts`, with buckets
    aligned to `anchor` (each job's own start), NOT wall-clock minutes
    (step-2/consumer.py:406-424; SURVEY §7.3 trap 4).  Pure integer-μs
    modulo arithmetic — exact, no floating-point boundary drift."""
    us = F.unix_micros(ts) - F.unix_micros(anchor)
    dur_us = F.lit(int(duration_sec) * 1_000_000).cast("long")
    return F.timestamp_micros(F.unix_micros(anchor) + (us - us % dur_us))


# ---------------------------------------------------------------------------
# String finalizers (step-3/final_cleanup.py:22-96).
# ---------------------------------------------------------------------------

def replace_first(col: Column | str, search: str, replacement: str) -> Column:
    """Replace the FIRST literal occurrence only — Polars
    `.str.replace` semantics used by step-3 (final_cleanup.py:43-54);
    Spark's `replace`/`regexp_replace` replace all, so this is built
    from locate/substr."""
    c = _col(col).cast("string")
    pos = F.locate(search, c)  # 1-based; 0 = not found
    return F.when(
        pos > 0,
        F.concat(
            F.substring(c, F.lit(1), pos - 1),
            F.lit(replacement),
            F.substring(c, pos + len(search), F.length(c)),
        ),
    ).otherwise(c)


def with_suffix(col: Column | str, suffix: str = "_S") -> Column:
    """Append a suffix unconditionally; null stays null
    (step-3/final_cleanup.py:44-75 `_S` finalization)."""
    c = _col(col).cast("string")
    return F.concat(c, F.lit(suffix))


def finalize_jid(col: Column | str) -> Column:
    """step-3 jid finalization: strip first 'ID', 'job'→'JOB' (first
    occurrence), append '_S' (step-3/final_cleanup.py:40-60)."""
    c = replace_first(col, "ID", "")
    c = replace_first(c, "job", "JOB")
    return with_suffix(c, "_S")


def host_list(host_col: Column | str) -> Column:
    """Aggregate expression: sorted unique hosts, comma-joined
    (step-2/consumer.py:403-404).  Deterministic despite collect_set's
    nondeterministic order because sort_array canonicalizes —
    SURVEY §7.3 trap 7."""
    return F.array_join(F.sort_array(F.collect_set(_col(host_col))), ",")


def filename_date(pattern: str = r"(\d{4}-\d{2}-\d{2})") -> Column:
    """F15 — date token extracted from the source file path
    (step-1/appender.py:72-83 parsed dates out of incoming
    filenames).  In the Spark layout Hive partition values normally
    carry the date, but files arriving with date-stamped names (the
    reference's `FRESCO_Stampede_ts_YYYY-MM-DD.parquet`) are covered
    by reading the scan-provided `input_file_name()`.  No match →
    null (callers route to quarantine, mirroring the reference's
    skip-with-log)."""
    return F.to_date(
        F.nullif(
            F.regexp_extract(F.input_file_name(), pattern, 1), F.lit("")
        )
    )


# ---------------------------------------------------------------------------
# Portable (cross-engine deterministic) hashing.
#
# Spark's hash()/xxhash64() are engine-specific, so operators whose
# results must be reproducible outside Spark (dedup fingerprints,
# MinHash signatures checked against SQL oracles) hash via md5 hex and
# take the first 15 hex digits as a non-negative int63.  conv() returns
# a string; 15 hex digits = 60 bits, always < 2^63.
# ---------------------------------------------------------------------------

def md5_int63(col: Column | str, salt: str | None = None) -> Column:
    c = _col(col).cast("string")
    if salt is not None:
        c = F.concat(F.lit(salt + ":"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_int63_sql(expr: str, salt: str | None = None) -> str:
    """DuckDB-side twin of md5_int63 for oracle queries."""
    inner = f"concat('{salt}:', {expr})" if salt is not None else expr
    return f"(('0x' || substr(md5({inner}), 1, 15))::BIGINT)"


def minhash_slot(col: Column | str, j: int) -> Column:
    """The j-th MinHash hash function: a 60-bit window of a salted
    md5 digest.  Each 32-hex digest yields TWO disjoint 15-hex
    windows (bits of a cryptographic digest are independent), so k
    hash functions cost ceil(k/2) md5 evaluations instead of k."""
    salt_idx, win = divmod(j, 2)
    c = F.concat(F.lit(f"{salt_idx}:"), _col(col).cast("string"))
    return F.conv(
        F.substring(F.md5(c), 1 + 15 * win, 15), 16, 10
    ).cast("long")


def minhash_slot_sql(expr: str, j: int) -> str:
    """DuckDB twin of minhash_slot."""
    salt_idx, win = divmod(j, 2)
    inner = f"concat('{salt_idx}:', {expr})"
    return f"(('0x' || substr(md5({inner}), {1 + 15 * win}, 15))::BIGINT)"


def minhash_slot_expr(expr: str, j: int) -> str:
    """Spark-SQL-string twin of minhash_slot: the same parsed
    expression tree, built in ONE py4j round trip instead of ~8
    Column calls per slot (the serving-path plan-construction wall —
    see the simhash F.expr fix's measurement)."""
    salt_idx, win = divmod(j, 2)
    return (
        f"cast(conv(substring(md5(concat('{salt_idx}:', "
        f"cast({expr} as string))), {1 + 15 * win}, 15), 16, 10)"
        " as bigint)"
    )


# ---------------------------------------------------------------------------
# §2.11 legacy-draft per-row formulas (rough-drafts/
# rough_transform_stampede_to_fresco_ts_data.py) — documented
# alternates to the canonical Δ-based kernels in pipeline/step1.
# ---------------------------------------------------------------------------

def legacy_block_rate(
    rd_sectors: Column, wr_sectors: Column,
    rd_ticks: Column, wr_ticks: Column,
) -> Column:
    """Tick-based per-row block rate:
    (rd+wr sectors)×512 / (rd_ticks+wr_ticks) / 2³⁰ GB/s
    (rough_transform...py:12-14); zero-tick rows yield 0.0."""
    return safe_div(
        (rd_sectors + wr_sectors) * F.lit(512.0),
        rd_ticks + wr_ticks,
    ) / F.lit(float(2**30))


def legacy_cpuuser(user: Column, nice: Column, total: Column) -> Column:
    """Per-row CPU%: (user+nice)/total × 100
    (rough_transform...py:37-38); zero-total rows yield 0.0."""
    return safe_div(user + nice, total) * F.lit(100.0)


def legacy_nfs_rate(direct_read: Column, direct_write: Column) -> Column:
    """Per-row NFS MB: (direct_read+direct_write) / 2²⁰
    (rough_transform...py:61)."""
    return (direct_read + direct_write) / F.lit(float(2**20))
