"""Near-duplicate detection suite for training-data pipelines.

Four detectors over a ``documents(doc_id, text, ...)`` table:

- exact:   normalized-text hash groupBy (in queries.py: doc_dedup_exact)
- n-gram Jaccard (EXACT pairs): shared-shingle blocking — any pair with
  Jaccard > 0 shares >= 1 shingle, so blocking loses nothing; the
  intersection size falls out of the block join itself (count of shared
  distinct shingles), no array re-join needed.
- SimHash (EXACT pairs): 60-bit sign-aggregated word-hash fingerprint;
  banded self-join — with B bands and max hamming distance d < B, any
  qualifying pair matches exactly in >= 1 band (pigeonhole), so the
  banding is exact blocking, not an approximation.
- MinHash + LSH (APPROXIMATE, the 100 TB scale path): 64-permutation
  signatures over shingle hashes, 16 bands x 4 rows bucket join,
  candidates verified with exact Jaccard. Sub-quadratic; recall is
  probabilistic (tested in tests/test_dedup.py).

Cross-engine determinism: every hash is `conv(substr(md5(x),1,15),16,10)`
— a 60-bit positive int that DuckDB reproduces with
`CAST('0x'||substring(md5(x),1,15) AS BIGINT)`, so the exact detectors are
oracle-checkable value-for-value. MinHash permutations are fixed LCG
(a_j, b_j) pairs mod the Mersenne prime 2^31-1; a*h stays < 2^62 so the
arithmetic never overflows int64 in either engine or numpy.

Scale notes: shingle blocking is one explode + one shuffle on the shingle
key; hot shingles (stop-phrases) are the skew risk — cap them with
`max_block` (drop shingles occurring in more than max_block docs: they
contribute candidates, not correctness, for thresholds tau where a
dropped pair would still share a rarer shingle; the cap is OFF by default
and exactness-preserving when off). SimHash banding shuffles on 10-bit
band values. MinHash LSH shuffles on band buckets — the intended
sub-quadratic path at 10^12 scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MERSENNE_P = (1 << 31) - 1
SIMHASH_BITS = 60
N_PERM = 64
LSH_BANDS = 16
LSH_ROWS = 4


def _lcg_params(n_perm: int = N_PERM) -> tuple[np.ndarray, np.ndarray]:
    """Fixed (a_j, b_j) permutation parameters — pure function of j, shared
    by the Spark UDF and the python oracle in tests."""
    j = np.arange(n_perm, dtype=np.int64)
    a = (1103515245 * (j + 1) + 12345) % MERSENNE_P
    a = np.where(a == 0, 1, a)
    b = (69069 * (j + 1) + 1) % MERSENNE_P
    return a, b


def tokenize(col) -> Column:
    return F.split(F.lower(F.trim(col)), "\\s+")


def hash60(col) -> Column:
    """60-bit positive deterministic hash, reproducible in DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def word_shingles(col, k: int = 3) -> Column:
    """Distinct word k-gram shingle strings of a text column."""
    words = tokenize(col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(words) - k, F.lit(-1))),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
        )
    )


def _doc_shingles(docs: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        .filter(F.size(tokenize(F.col("text"))) >= k)
        .select("doc_id", word_shingles(F.col("text"), k).alias("shingles"))
        .withColumn("n_sh", F.size("shingles"))
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.2,
    max_block: int | None = None,
) -> DataFrame:
    """EXACT near-duplicate pairs with word-k-gram Jaccard >= threshold.

    Plan: shingle-explode -> self-join on shingle (blocking; exact since
    Jaccard>0 implies a shared shingle) -> count shared shingles per pair
    (= intersection size) -> broadcast-join per-doc shingle counts ->
    jaccard = common / (n_a + n_b - common).
    """
    sh = _doc_shingles(docs, id_col, text_col, k)
    ex = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    if max_block is not None:
        hot = (
            ex.groupBy("shingle").count().filter(F.col("count") > max_block)
            .select("shingle")
        )
        ex = ex.join(F.broadcast(hot), "shingle", "left_anti")
    a = ex.alias("a")
    b = ex.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    counts = sh.select("doc_id", "n_sh")
    jac = (
        common.join(F.broadcast(counts.withColumnRenamed("doc_id", "id_a")
                                .withColumnRenamed("n_sh", "n_a")), "id_a")
        .join(F.broadcast(counts.withColumnRenamed("doc_id", "id_b")
                          .withColumnRenamed("n_sh", "n_b")), "id_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("n_a") + F.col("n_b") - F.col("common")),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """60-bit SimHash per doc: per word occurrence, each bit of hash60(word)
    votes +1/-1; fingerprint bit i is set iff the vote sum is > 0. All
    JVM-side: explode + one map-side-combinable aggregate of 60 sums."""
    w = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(F.col(text_col))).alias("word"),
    ).withColumn("h", hash60(F.col("word")))
    votes = w.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(SIMHASH_BITS)
        ]
    )
    fp = None
    for i in range(SIMHASH_BITS):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return votes.select("doc_id", fp.cast("long").alias("fingerprint"))


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 5,
    n_bands: int = 6,
) -> DataFrame:
    """EXACT pairs with SimHash hamming distance <= max_hamming.

    Pigeonhole: max_hamming < n_bands, so any qualifying pair agrees
    exactly on >= 1 of the 6 10-bit bands — the banded self-join is exact
    blocking and the full O(n^2) comparison never materializes.
    """
    assert max_hamming < n_bands
    band_bits = SIMHASH_BITS // n_bands
    fp = simhash_fingerprints(docs, id_col, text_col)
    bands = fp.select(
        "doc_id",
        "fingerprint",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.shiftrightunsigned(
                        F.col("fingerprint"), bi * band_bits
                    ).bitwiseAND(F.lit((1 << band_bits) - 1)).alias("band_val"),
                )
                for bi in range(n_bands)
            ])
        ).alias("bv"),
    ).select("doc_id", "fingerprint", "bv.band", "bv.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.fingerprint").alias("fp_a"),
            F.col("b.fingerprint").alias("fp_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return cand.withColumn("hamming", ham).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


# ---------------------------------------------------------------------------
# MinHash + LSH (the sub-quadratic scale path)
# ---------------------------------------------------------------------------

def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    n_perm: int = N_PERM,
) -> DataFrame:
    """(doc_id, shingles, sig[n_perm]) — signatures via a vectorized pandas
    UDF: one (n_perm x n_shingles) modular-arithmetic min per doc."""
    a_par, b_par = _lcg_params(n_perm)
    sh = _doc_shingles(docs, id_col, text_col, k)
    hashed = sh.withColumn(
        "sh_hashes",
        F.transform(F.col("shingles"), lambda s: hash60(s) % MERSENNE_P),
    )

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig_udf(hashes: pd.Series) -> pd.Series:
        out = []
        for h in hashes:
            hv = np.asarray(h, dtype=np.int64)
            if len(hv) == 0:
                out.append(np.full(n_perm, MERSENNE_P, dtype=np.int64))
                continue
            m = (a_par[:, None] * hv[None, :] + b_par[:, None]) % MERSENNE_P
            out.append(m.min(axis=1))
        return pd.Series(out)

    return hashed.withColumn("sig", sig_udf(F.col("sh_hashes"))).drop("sh_hashes")


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.2,
    n_bands: int = LSH_BANDS,
    n_rows: int = LSH_ROWS,
) -> DataFrame:
    """Approximate near-dup pairs: LSH band-bucket join proposes
    candidates; each candidate is verified with EXACT Jaccard over the
    shingle sets, so precision is 1.0 and only recall is probabilistic
    (P[miss] = (1 - j^rows)^bands)."""
    sig = minhash_signatures(docs, id_col, text_col, k, n_bands * n_rows)
    bands = sig.select(
        "doc_id",
        "shingles",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.concat_ws(
                        ",", *[F.col("sig")[bi * n_rows + r].cast("string")
                               for r in range(n_rows)]
                    ).alias("band_key"),
                )
                for bi in range(n_bands)
            ])
        ).alias("bv"),
    ).select("doc_id", "shingles", "bv.band", "bv.band_key")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .distinct()
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return cand.withColumn("jaccard", jac).filter(
        F.col("jaccard") >= threshold
    ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


# ---------------------------------------------------------------------------
# Embedding cosine near-dup (exact; LSH/ANN scale path in operators/ann.py)
# ---------------------------------------------------------------------------

def embedding_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
) -> DataFrame:
    """EXACT pairs with cosine >= threshold via a self-join over
    pre-normalized vectors (dot product of unit vectors, JVM-side fold).
    O(n^2/2) compare — correctness baseline; the sub-quadratic path is the
    LSH bucketing in operators/ann.py."""
    v = F.col(vec_col).cast("array<double>")
    norm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))
    unit = emb.select(
        F.col(id_col).alias("vid"),
        F.transform(v, lambda x: x / norm).alias("u"),
    )
    a, b = unit.alias("a"), unit.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.u"), F.col("b.u"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, F.col("a.vid") < F.col("b.vid"))
        .withColumn("cosine", dot)
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.round("cosine", 6).alias("cosine"),
        )
    )
