"""Cross-engine-deterministic numeric recipes.

Spark and DuckDB sum doubles in different orders, so a naive
``sum(double)`` will not hash-match (SURVEY.md §7 "Float hash-matching").
The recipe here makes aggregate values bit-identical on both engines
AND stays inside whole-stage codegen:

1. scale each row to an integer: ``floor(x * 10^s + 0.5) AS LONG``.
   The inputs are exact s-decimal values (money columns are 2-decimal;
   their pairwise products 4- / triple products 6-decimal), so the
   scaled true value is integral — x*10^s lands within float-epsilon of
   an integer, and +0.5/floor snaps to it identically in both engines.
   floor stays pure double math: Spark's round() would allocate a
   BigDecimal per row (~2.5× slower), and a bare CAST(double AS BIGINT)
   truncates in Spark but rounds in DuckDB.
2. ``sum(long)`` — associative, exact, and ~4× faster than Spark's
   overflow-checked decimal aggregation buffer.
3. divide once by 10^s as double — a correctly-rounded IEEE op on
   identical operands in both engines.

Pick ``scale`` ≥ the true decimal precision of the expression.

Overflow bound: |sum| < 2^63 / 10^scale — at scale 6 that is ~9.2e12,
plenty for per-group sums even at large SF; for whole-100-TB global
sums use scale 2 columns or plain double sums (no oracle involved).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column, scale: int = 2) -> Column:
    """Order-independent sum of an (exact s-decimal) double column, as DOUBLE."""
    m = F.lit(float(10**scale))
    scaled = F.floor(col * m + F.lit(0.5)).cast("long")
    return F.sum(scaled).cast("double") / m


def davg(col: Column, scale: int = 2) -> Column:
    """Order-independent average of a double column, as DOUBLE."""
    return dsum(col, scale) / F.count(F.lit(1))


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB fragment mirroring :func:`dsum` exactly."""
    m = float(10**scale)
    return (
        f"(CAST(sum(CAST(floor(({expr}) * {m!r} + 0.5) AS BIGINT)) AS DOUBLE) / {m!r})"
    )


def sql_davg(expr: str, scale: int = 2) -> str:
    """DuckDB fragment mirroring :func:`davg` exactly."""
    return f"({sql_dsum(expr, scale)} / count(*))"


# ---------------------------------------------------------------------------
# Cross-engine integer hash discipline
#
# The engine-hash keys (minhash/simhash) historically used xxhash64,
# which DuckDB cannot evaluate — making them rows-only in the oracle
# gate. The discipline below provides an avalanche-quality 32/64-bit
# hash from arithmetic BOTH engines evaluate bit-identically:
#
#   word/gram value --(polynomial fold, functions/text.py)--> h < 2^31
#   h + seed (mod 2^32) --fmix32--> 32 avalanche bits
#
# fmix32 is the public MurmurHash3 finalizer (Austin Appleby, public
# domain; the same constants appear in Spark's own Murmur3_x86_32).
# The only non-trivial step is the 32-bit wrapping multiply: DuckDB
# RAISES on BIGINT overflow instead of wrapping, so (x*c) mod 2^32 is
# computed in split 16-bit halves — every intermediate stays < 2^48,
# exact in signed 64-bit on both engines.
#
# Measured avalanche over a 20k sequential vocabulary (the adversarial
# input for the affine-only family): per-bit balance 0.49-0.51,
# random-pair hamming 32.0 +/- 4.0, adjacent-word hamming mean 32 min
# 16 — indistinguishable from a strong 64-bit hash.
# ---------------------------------------------------------------------------

#: 2^31 - 1 (Mersenne prime) — the shared affine-mixer modulus; also
#: used by the Count-Min row mixers (operators/aggregates.py).
MERSENNE31 = 2_147_483_647

M32 = 4_294_967_296  # 2^32

FMIX_MUL1, FMIX_MUL2 = 0x85EBCA6B, 0xC2B2AE35

#: Per-lane seed offsets (golden-ratio multiples mod 2^32): lanes 0/1
#: form the 64-bit hash's lo/hi words, lanes 2/3 the independent second
#: 64 bits (simhash128's high half).
HASH_SEEDS = tuple((0x9E3779B9 * (i + 1)) % M32 for i in range(4))


def mul32(x: Column, c: int) -> Column:
    """(x * c) mod 2^32 for 0 <= x < 2^32 — overflow-free in int64.

    Split 16-bit halves: lo16(x)*c < 2^48 and (hi16(x)*c mod 2^16)<<16
    <= 2^32, so no intermediate leaves signed-64 range in either engine
    (DuckDB raises on overflow rather than wrapping, so a plain x*c is
    not portable)."""
    lo = (x.bitwiseAND(F.lit(65535)) * F.lit(c)) % F.lit(M32)
    hi = ((F.shiftright(x, 16).bitwiseAND(F.lit(65535)) * F.lit(c)) % F.lit(65536)) * F.lit(65536)
    return (lo + hi) % F.lit(M32)


def mul32_sql(x: str, c: int) -> str:
    """DuckDB fragment mirroring :func:`mul32` exactly. `x` must be a
    column NAME (referenced three times)."""
    return (
        f"((({x} & 65535) * {c}) % {M32} + "
        f"(((({x} >> 16) & 65535) * {c}) % 65536) * 65536) % {M32}"
    )


def with_fmix32(df: DataFrame, cols: dict[str, Column], keep: list[str]) -> DataFrame:
    """`df` reduced to `keep` + one fmix32-mixed column per `cols` entry.

    Each cols[name] must evaluate to a value in [0, 2^32). The five
    finalizer stages are applied as successive PROJECTIONS (not nested
    expressions): each stage's column is a bound reference in the next,
    so the expression tree stays linear — nesting would duplicate the
    (potentially expensive) input fold 2^5 times textually and defeat
    codegen CSE (the round-6 HOF-inlining trap, generalized).
    All five stages fuse into one WholeStageCodegen span."""
    names = list(cols)
    d = df.select(*keep, *[c.alias(n) for n, c in cols.items()])

    # The five stages are emitted as SQL strings (one selectExpr call
    # per stage) instead of Column compositions: the Column form cost
    # ~15 py4j round-trips per column per stage of pure driver time
    # (round 14, guide §7.3) — same expression tree either way, and
    # `_mul32_spark_sql` mirrors :func:`mul32` token for token.
    def _mul32_spark_sql(x: str, c: int) -> str:
        return (
            f"((({x} & 65535) * {c}) % {M32} + "
            f"(((shiftright({x}, 16) & 65535) * {c}) % 65536) * 65536) "
            f"% {M32}"
        )

    # Backtick-quote every interpolated identifier (round-14 ADVICE 5):
    # a `keep`/`cols` name that is a SQL reserved word or carries
    # dots/spaces parsed fine under the old Column API and must keep
    # doing so through selectExpr.
    def q(n: str) -> str:
        return f"`{n}`"

    def step(d: DataFrame, f) -> DataFrame:
        return d.selectExpr(
            *[q(k_) for k_ in keep], *[f"{f(q(n))} AS {q(n)}" for n in names]
        )

    d = step(d, lambda x: f"{x} ^ shiftright({x}, 16)")
    d = step(d, lambda x: _mul32_spark_sql(x, FMIX_MUL1))
    d = step(d, lambda x: f"{x} ^ shiftright({x}, 13)")
    d = step(d, lambda x: _mul32_spark_sql(x, FMIX_MUL2))
    d = step(d, lambda x: f"{x} ^ shiftright({x}, 16)")
    return d


def fmix32_col(x: Column) -> Column:
    """fmix32 as ONE Column expression — only for per-element use inside
    HOF lambdas (where `x` is a lambda variable, evaluated once) or on
    cheap inputs; for per-row hashes of expensive folds use
    :func:`with_fmix32`'s staged projections instead."""
    x = x.bitwiseXOR(F.shiftright(x, 16))
    x = mul32(x, FMIX_MUL1)
    x = x.bitwiseXOR(F.shiftright(x, 13))
    x = mul32(x, FMIX_MUL2)
    return x.bitwiseXOR(F.shiftright(x, 16))


def fmix32_sql_ctes(
    base: str, keep: str, cols: dict[str, str], prefix: str = "fm"
) -> tuple[str, str]:
    """Emit the DuckDB CTE chain mirroring :func:`with_fmix32`.

    `cols` maps output column name -> input SQL expression (a value in
    [0, 2^32)). Returns (",<cte>,<cte>..." fragment to splice into a
    WITH chain, final CTE name). Same staged-projection structure as
    the Spark side so both plans evaluate each stage exactly once."""
    names = list(cols)
    sel0 = ", ".join(f"{e} AS {n}" for n, e in cols.items())
    ctes = [f"{prefix}0 AS (SELECT {keep}, {sel0} FROM {base})"]
    stages = [
        lambda n: f"xor({n}, {n} >> 16)",
        lambda n: mul32_sql(n, FMIX_MUL1),
        lambda n: f"xor({n}, {n} >> 13)",
        lambda n: mul32_sql(n, FMIX_MUL2),
        lambda n: f"xor({n}, {n} >> 16)",
    ]
    for i, st in enumerate(stages, start=1):
        sel = ", ".join(f"{st(n)} AS {n}" for n in names)
        ctes.append(f"{prefix}{i} AS (SELECT {keep}, {sel} FROM {prefix}{i-1})")
    return ", " + ", ".join(ctes), f"{prefix}{len(stages)}"


def pack_u32_pair(lo: Column, hi: Column) -> Column:
    """Signed int64 with `lo` in bits 0-31 and `hi` in bits 32-63.

    hi >= 2^31 must wrap to a negative long; both engines get there via
    (hi - 2^32) * 2^32 + lo, which never leaves signed-64 range (DuckDB
    refuses to left-shift negative values, so no shifts here)."""
    signed_hi = F.when(hi < F.lit(1 << 31), hi).otherwise(hi - F.lit(M32))
    return signed_hi * F.lit(M32) + lo


def pack_u32_pair_sql(lo: str, hi: str) -> str:
    """DuckDB fragment mirroring :func:`pack_u32_pair` exactly."""
    return (
        f"(CASE WHEN {hi} < 2147483648 THEN {hi} ELSE {hi} - {M32} END) "
        f"* {M32} + {lo}"
    )
