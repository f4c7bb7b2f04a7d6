"""Text / dedup primitives as pure Catalyst expressions, with engine-portable
arithmetic (every hash is an unrolled integer polynomial both Spark SQL and
the DuckDB oracle compute identically — no engine-specific hash() anywhere).

These back the training-data-pipeline operators: exact dedup, n-gram Jaccard,
MinHash+LSH banding, SimHash, language-ID scoring, quality stats,
fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import worldspec as W


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def token_hash(tok: Column) -> Column:
    """Unrolled base-23 polynomial over the first 12 chars, mod 1000003.
    ascii(out-of-range substring) = 0 in both engines."""
    h = F.lit(0).cast("long")
    for i in range(1, W.TOKEN_HASH_CHARS + 1):
        h = h + F.ascii(F.substring(tok, i, 1)).cast("long") \
            * F.lit(W.TOKEN_HASH_BASE ** (i - 1))
    return h % F.lit(W.TOKEN_HASH_MOD)


def minhash_params(j: int) -> tuple[int, int]:
    return ((j * 40503 + 17) % 65536 | 1, (j * 104729 + 31) % 65536)


def minhash_agg_cols(h: Column) -> list[Column]:
    out = []
    for j in range(W.MINHASH_N):
        a, b = minhash_params(j)
        out.append(F.min((F.lit(a) * h + F.lit(b)) % F.lit(W.MINHASH_P))
                   .alias(f"mh{j}"))
    return out


def simhash_spread(h: Column) -> Column:
    return (h * F.lit(W.SIMHASH_SPREAD)) % F.lit(W.SIMHASH_MOD)


def simhash_bit_sum_cols(h32: Column) -> list[Column]:
    """Per-bit +1/-1 sums (with multiplicity) — SUM then sign gives the bit."""
    out = []
    for b in range(W.SIMHASH_BITS):
        bit = (F.floor(h32 / F.lit(1 << b)).cast("long") % 2)
        out.append(F.sum(bit * 2 - 1).alias(f"s{b}"))
    return out


def simhash_from_sums() -> Column:
    sig = F.lit(0).cast("long")
    for b in range(W.SIMHASH_BITS):
        sig = sig + F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sig
