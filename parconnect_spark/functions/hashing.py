"""Invertible 64-bit id permutation — the reference's anti-skew salting.

parconnect applies Thomas Wang's 64-bit bijective hash to every edge
endpoint so block partitioning behaves like random partitioning
(/root/reference/src/graphGen/common/reduceIds.hpp:104-114; hash
/root/reference/ext/hash/invertible_hash.hpp:19-29, inverse :33-66 — the
Wang hash itself is public domain). Spark hash-partitions shuffles anyway,
so the permutation is only needed when label *values* must round-trip to
original ids; both directions are provided.

Vectorized numpy-on-Arrow pandas UDFs — uint64 two's-complement arithmetic,
bit-identical to the reference's unsigned wrap-around, no per-row Python
(BASELINE.json input_hint constraint).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType


def _wang_hash_np(x: np.ndarray) -> np.ndarray:
    """hash_64(key): invertible mix (shift/xor/multiply on u64)."""
    k = x.astype(np.uint64)
    k = (~k) + (k << np.uint64(21))
    k = k ^ (k >> np.uint64(24))
    k = (k + (k << np.uint64(3))) + (k << np.uint64(8))  # k * 265
    k = k ^ (k >> np.uint64(14))
    k = (k + (k << np.uint64(2))) + (k << np.uint64(4))  # k * 21
    k = k ^ (k >> np.uint64(28))
    k = k + (k << np.uint64(31))
    return k


def _invert_xor_shift(k: np.ndarray, shift: int) -> np.ndarray:
    """Invert y = x ^ (x >> shift) by iterated substitution."""
    out = k.copy()
    s = np.uint64(shift)
    for _ in range(64 // shift + 1):
        out = k ^ (out >> s)
    return out


def _wang_unhash_np(x: np.ndarray) -> np.ndarray:
    """hash_64i: exact inverse of _wang_hash_np (modular inverses of the
    *21/*265 steps and xor-shift unwinding, invertible_hash.hpp:33-66)."""
    k = x.astype(np.uint64)
    # invert k = k + (k << 31)  ==  k * (1 + 2^31); inverse mod 2^64
    k = k * np.uint64(pow(1 + (1 << 31), -1, 1 << 64))
    k = _invert_xor_shift(k, 28)
    k = k * np.uint64(pow(21, -1, 1 << 64))
    k = _invert_xor_shift(k, 14)
    k = k * np.uint64(pow(265, -1, 1 << 64))
    k = _invert_xor_shift(k, 24)
    # invert k = ~k + (k << 21)  ==  (k * (2^21 + 1)) - 1 ... actually
    # forward was: k = (~k) + (k << 21) = (k << 21) - k - 1 = k*(2^21 - 1) - 1
    k = (k + np.uint64(1)) * np.uint64(pow((1 << 21) - 1, -1, 1 << 64))
    return k


@F.pandas_udf(LongType())
def wang_hash(s: pd.Series) -> pd.Series:
    out = _wang_hash_np(s.to_numpy(dtype=np.int64).view(np.uint64))
    return pd.Series(out.view(np.int64))


@F.pandas_udf(LongType())
def wang_unhash(s: pd.Series) -> pd.Series:
    out = _wang_unhash_np(s.to_numpy(dtype=np.int64).view(np.uint64))
    return pd.Series(out.view(np.int64))


def permute_ids(edges: DataFrame) -> DataFrame:
    """permuteVectorIds (reduceIds.hpp:104-114): bijectively rename both
    endpoints of every edge."""
    return edges.select(
        wang_hash(F.col("src")).alias("src"), wang_hash(F.col("dst")).alias("dst")
    )
