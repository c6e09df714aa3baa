"""Mergeable sketch synopses — count-min and HyperLogLog, md5-deterministic.

The two classic sublinear summaries every 100 TB counting problem reduces
to, built so that ANY engine reproduces the sketch register-for-register:

- **Count-min sketch** (Cormode & Muthukrishnan 2005, "An improved data
  stream summary"): a depth x width grid of counters; each item increments
  one cell per row (row-seeded hash), a point query is the MIN over its
  depth cells. Estimates never undercount (est >= true) and overcount by
  at most ~2N/width with probability 1 - 2^-depth.
- **HyperLogLog** (Flajolet, Fusy, Gandouet, Meunier 2007): m = 2^p
  registers each holding the max leading-zero rank (rho) of hashes routed
  to them; distinct count is estimated from the harmonic mean of 2^-rho,
  with Flajolet's linear-counting fallback in the small-cardinality regime.

Why not `approx_count_distinct` / `count_min_sketch`: Spark's built-ins
are xxhash64/OpenHashSet-seeded and NOT reproducible outside the JVM, so
they can never be oracle-checked cross-engine. These implementations hash
with md5 (identical in Spark, DuckDB, Python hashlib — the repo-wide
determinism contract, see plans/textops.py module docstring) and keep all
register/cell arithmetic in exact BIGINTs; the only floats are the final
estimate division and the linear-counting ln, both computed from identical
integers by an identical expression in every engine.

Scale shape (the reason sketches exist): both summaries are MERGEABLE —
CMS cells add, HLL registers max — so Spark computes them as ordinary
hash aggregates with map-side partial aggregation. The shuffle moves
depth*width (CMS) or groups*2^p (HLL) rows NO MATTER how many input rows
there are: distinct-counting 10^12 user events shuffles 16 registers per
group instead of 10^12-row distinct exchange, and the frequency table of a
10^10-token stream is a 4 KiB grid. That is the 100 TB answer to "how many
distinct" and "how often" when exact answers would shuffle the corpus.

No reference counterpart (the reference keeps exact SQLite counts,
main.py:1035-1082); this is new-operator-class territory like
operators/pagerank.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- count-min sketch ------------------------------------------------------

CMS_DEPTH = 4  # error probability 2^-4 per point query
CMS_WIDTH = 1024  # additive error ~ 2 * N / 1024


def cms_hash(token: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Row-seeded cell index: first 8 md5 hex chars of 'cms{row}:{token}'
    as an integer, mod width. Seeding by string concat (not by a hash
    family over integers) keeps the function reproducible in any engine
    that has md5."""
    h = F.md5(F.concat(F.lit(f"cms{row}:"), token))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def cms_probes(
    tf: DataFrame,
    token_col: str = "token",
    count_col: str = "cnt",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Expand a (token, count) frequency frame to one probe row per sketch
    row: (token, cnt, r, col). The same frame both BUILDS the sketch
    (sum cnt per cell) and QUERIES it (min cell per token), so the hash
    arithmetic is written once."""
    rows = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                cms_hash(F.col(token_col), r, width).alias("col"),
            )
            for r in range(depth)
        ]
    )
    return tf.select(
        token_col,
        count_col,
        F.explode(rows).alias("rc"),
    ).select(token_col, count_col, F.col("rc.r").alias("r"), F.col("rc.col").alias("col"))


def cms_cells(probes: DataFrame, count_col: str = "cnt") -> DataFrame:
    """The sketch itself: depth x width cells, each the sum of counts of
    all tokens hashing there. <= depth*width rows regardless of input size
    (map-side combined hash aggregate — the mergeable-summary property)."""
    return probes.groupBy("r", "col").agg(F.sum(count_col).alias("cell"))


def cms_estimates(
    probes: DataFrame,
    cells: DataFrame,
    token_col: str = "token",
    count_col: str = "cnt",
) -> DataFrame:
    """Point-query every token: est = MIN over the token's depth cells.
    The cell grid is tiny and broadcast; the min collapses the depth probe
    rows back to one row per token. est >= true always (counters only
    ever overcount — the CMS guarantee the tests pin)."""
    return (
        probes.join(F.broadcast(cells), ["r", "col"])
        .groupBy(token_col)
        .agg(
            F.min("cell").alias("est_count"),
            F.max(count_col).alias("true_count"),
        )
    )


# --- HyperLogLog -----------------------------------------------------------

HLL_P = 4  # m = 16 registers; standard error 1.04/sqrt(16) = 26%
HLL_M = 1 << HLL_P
# Flajolet et al. 2007, fig. 3: alpha_16 = 0.673 (bias correction for m=16)
HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}
# Registers are summed as exact BIGINTs scaled by 2^40 (rho <= 33, so
# 2^(40-rho) is always integral); the estimate numerator folds the scale
# back in. repr() of the Python float is embedded in BOTH engines'
# expressions so the single final division starts from bit-identical
# operands.
HLL_SCALE_BITS = 40


def hll_numerator(m: int) -> float:
    return HLL_ALPHA[m] * m * m * float(1 << HLL_SCALE_BITS)


def hll_bucket_rho(key: Column, p: int = HLL_P) -> tuple[Column, Column]:
    """Split one md5 into two disjoint 32-bit windows: chars 1-8 route to
    a register (mod 2^p), chars 9-16 supply rho = (leading zeros of the
    32-bit value) + 1. Bit length via base-conversion string length —
    integer-exact in Spark (conv hex->binary strips leading zeros) and
    DuckDB (bin() is unpadded), no float log2 anywhere."""
    h = F.md5(key)
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % (1 << p)
    w2 = F.substring(h, 9, 8)
    h2 = F.conv(w2, 16, 10).cast("long")
    rho = F.when(h2 == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.conv(w2, 16, 2))
    )
    return bucket, rho.cast("int")


def hll_registers(
    df: DataFrame,
    key: Column,
    group_cols: list[str],
    p: int = HLL_P,
) -> DataFrame:
    """Per-group register frame: (group..., bucket, max_rho). max() is the
    merge operator, so map-side partial aggregation reduces every partition
    to <= 2^p rows per group before the shuffle — the frame that replaces
    a distinct-exchange at scale."""
    bucket, rho = hll_bucket_rho(key, p)
    return (
        df.select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str],
    p: int = HLL_P,
) -> DataFrame:
    """Collapse registers to one estimate row per group.

    sum_scaled = SUM(2^(40 - max_rho)) + zeros * 2^40 is exact BIGINT
    arithmetic (order-independent — float summation here would make the
    result depend on aggregation order). raw = alpha*m^2*2^40 / sum_scaled
    is ONE double division from identical integers; the small-range branch
    (raw <= 2.5m and empty registers exist) switches to linear counting
    m*ln(m/zeros) exactly as Flajolet prescribes. ln() may differ in the
    last ulp across libm implementations — absorbed by the caller's
    stable_round, same contract as plans/textops.py weighted sampling."""
    m = 1 << p
    numer = hll_numerator(m)
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("used"),
        F.sum(
            F.expr(f"shiftleft(1L, {HLL_SCALE_BITS} - max_rho)")
        ).alias("sum_scaled"),
    )
    zeros = (F.lit(m) - F.col("used")).cast("long")
    total = (F.col("sum_scaled") + zeros * F.lit(1 << HLL_SCALE_BITS)).cast(
        "long"
    )
    raw = F.lit(numer) / total.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(*group_cols, est.alias("hll_est"), zeros.alias("zero_registers"))
