"""Deterministic text sketches: shingles, MinHash, SimHash, LSH banding.

Used by entity/predicate canonicalization (operators/canonicalize.py — the
minhash-LSH clustering required by BASELINE.json north_star) and by the
document near-dup operators (operators/dedup.py).

Everything is seed-fixed and wall-clock-free: hash mixing uses splitmix64
constants over ``zlib.crc32`` of the shingle bytes, so signatures are stable
across Python workers, partitionings and sessions (PYTHONHASHSEED-proof) —
a resume/metamorphic-test requirement (SURVEY.md §7 "Determinism").

Scale notes:
* signatures are computed in Arrow-batched pandas UDFs (one pass per row);
* LSH candidate generation is ``explode(bands) → groupBy(band, hash)`` —
  a single shuffle whose keys are band buckets, not documents, so hot
  *documents* cannot skew it; hot *buckets* (a shingle-degenerate corpus)
  are capped by ``max_bucket`` before pair expansion to bound the quadratic
  blowup, and the cap is observable (bucket sizes come back as a column).
"""

from __future__ import annotations

import zlib
from typing import List

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

_MASK64 = (1 << 64) - 1
_PRIME = (1 << 61) - 1  # Mersenne prime for universal hashing


def _mix(seed: int) -> int:
    """splitmix64 finalizer — deterministic per-seed hash parameters."""
    z = (seed + 0x9E3779B97F4A7C15) & _MASK64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _MASK64
    return z ^ (z >> 31)


def _hash_params(n: int, seed: int = 42):
    return [(_mix(seed * 1_000_003 + i) | 1, _mix(seed * 2_000_003 + i)) for i in range(n)]


def char_shingles(text: str, k: int) -> List[int]:
    """crc32 of each k-char shingle (lowercased); whole string if shorter."""
    s = text.lower()
    if len(s) <= k:
        return [zlib.crc32(s.encode("utf-8"))]
    return [zlib.crc32(s[i : i + k].encode("utf-8")) for i in range(len(s) - k + 1)]


def word_shingles(text: str, k: int) -> List[int]:
    words = text.lower().split()
    if len(words) <= k:
        return [zlib.crc32(" ".join(words).encode("utf-8"))]
    return [
        zlib.crc32(" ".join(words[i : i + k]).encode("utf-8"))
        for i in range(len(words) - k + 1)
    ]


def minhash_signature(shingles: List[int], n_hashes: int, seed: int = 42) -> List[int]:
    params = _hash_params(n_hashes, seed)
    if not shingles:
        return [0] * n_hashes
    sig = []
    for a, b in params:
        best = _PRIME
        for x in shingles:
            v = (a * x + b) % _PRIME
            if v < best:
                best = v
        sig.append(best & 0x7FFFFFFFFFFFFFFF)
    return sig


def simhash64(shingles: List[int], seed: int = 42) -> int:
    """64-bit SimHash over shingle hashes."""
    if not shingles:
        return 0
    counts = [0] * 64
    for x in shingles:
        h = _mix(x ^ _mix(seed))
        for bit in range(64):
            counts[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if counts[bit] > 0:
            out |= 1 << bit
    return out & 0x7FFFFFFFFFFFFFFF  # keep in signed-long range


def jaccard(a: List[int], b: List[int]) -> float:
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------------------
# Spark-level operators
# ---------------------------------------------------------------------------


def with_minhash(
    df: DataFrame,
    text_col: str,
    n_hashes: int = 64,
    shingle_k: int = 3,
    mode: str = "char",
    out_col: str = "minhash",
    seed: int = 42,
) -> DataFrame:
    shingler = char_shingles if mode == "char" else word_shingles

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def mh(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: minhash_signature(shingler(t or "", shingle_k), n_hashes, seed)
        )

    return df.withColumn(out_col, mh(F.col(text_col)))


def with_simhash(
    df: DataFrame,
    text_col: str,
    shingle_k: int = 3,
    mode: str = "word",
    out_col: str = "simhash",
    seed: int = 42,
) -> DataFrame:
    shingler = char_shingles if mode == "char" else word_shingles

    @F.pandas_udf(T.LongType())
    def sh(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: simhash64(shingler(t or "", shingle_k), seed))

    return df.withColumn(out_col, sh(F.col(text_col)))


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    sig_col: str = "minhash",
    bands: int = 16,
    max_bucket: int = 1000,
) -> DataFrame:
    """MinHash-LSH banding → candidate pairs (id_a < id_b, distinct).

    One shuffle on (band_idx, band_hash); buckets larger than ``max_bucket``
    are dropped (degenerate content — near-identical boilerplate) to bound
    the within-bucket quadratic pair expansion; AQE handles residual bucket
    skew.
    """
    banded = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(_band_hashes_col(sig_col, bands)).alias(
            "band_idx", "band_hash"
        ),
    )
    sized = banded.join(
        banded.groupBy("band_idx", "band_hash").count(),
        ["band_idx", "band_hash"],
    ).where(F.col("count") <= max_bucket)
    a = sized.select("band_idx", "band_hash", F.col("_id").alias("id_a"))
    b = sized.select("band_idx", "band_hash", F.col("_id").alias("id_b"))
    return (
        a.join(b, ["band_idx", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def _band_hashes_col(sig_col: str, bands: int):
    """array<long> of per-band hashes from the signature column (native
    expression — no Python): xxhash64 over the band's slice."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda i: F.xxhash64(
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(
                        F.col(sig_col),
                        i * (F.size(F.col(sig_col)) / bands).cast("int") + 1,
                        (F.size(F.col(sig_col)) / bands).cast("int"),
                    ),
                    lambda v: v.cast("string"),
                ),
            ),
            i,
        ),
    )


def hamming64(col_a, col_b):
    """Native popcount of XOR for SimHash distance (no UDF)."""
    return F.bit_count(col_a.bitwiseXOR(col_b))
