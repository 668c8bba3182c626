"""Near-duplicate detection suite for training-data pipelines.

Four detectors over a ``documents(doc_id, text, ...)`` table:

- exact:   normalized-text hash groupBy (in queries.py: doc_dedup_exact)
- n-gram Jaccard (EXACT pairs): shared-shingle blocking — any pair with
  Jaccard > 0 shares >= 1 shingle, so blocking loses nothing; the
  intersection size falls out of the block join itself (count of shared
  distinct shingles), no array re-join needed.
- SimHash (EXACT pairs): 120-bit sign-aggregated word-hash fingerprint
  (two independent 60-bit halves from one md5 call); banded self-join —
  with B bands and max hamming distance d < B, any qualifying pair
  matches exactly in >= 1 band (pigeonhole), so the banding is exact
  blocking, not an approximation. 6 bands of 20 bits -> ~6.3M distinct
  join keys, so candidate volume stays sub-quadratic far past 10^6 docs
  (the previous 60-bit/10-bit-band layout capped at 6,144 keys and
  degenerated to ~n^2/6144 candidates at corpus scale).
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
`max_block` (removes shingles occurring in more than max_block docs from
the whole universe — intersection AND per-doc counts — yielding exact
Jaccard over the reduced universe at the cost of recall for pairs whose
only shared shingles are hot; OFF by default = fully exact). MinHash LSH
shuffles on band buckets — the intended sub-quadratic path at 10^12
scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MERSENNE_P = (1 << 31) - 1
SIMHASH_BITS = 60       # bits per fingerprint half (two halves = 120 bits)
SIMHASH_BANDS = 6       # 120 / 6 = 20-bit band keys
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


def hash60_tail(col) -> Column:
    """Second, independent 60-bit hash from the TAIL of the same md5
    digest (hex chars 17..31) — one md5 call yields both fingerprint
    halves. DuckDB: CAST('0x'||substring(md5(x),17,15) AS BIGINT)."""
    return F.conv(F.substring(F.md5(col), 17, 15), 16, 10).cast("long")


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

    With ``max_block`` set, shingles occurring in more than max_block docs
    are removed from the universe ENTIRELY — from both the intersection
    AND the per-doc counts — so the result is the exact Jaccard over the
    reduced shingle universe (a consistent skew cap, not an understated
    score). Pairs whose only shared shingles are hot ones are still lost;
    the cap trades that recall for bounded block sizes at corpus scale.
    """
    sh = _doc_shingles(docs, id_col, text_col, k)
    ex = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    if max_block is not None:
        hot = (
            ex.groupBy("shingle").count().filter(F.col("count") > max_block)
            .select("shingle")
        )
        ex = ex.join(F.broadcast(hot), "shingle", "left_anti")
        # per-doc sizes over the SAME reduced universe (shingles are
        # already distinct per doc, so count == |reduced shingle set|)
        counts = ex.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    else:
        counts = sh.select("doc_id", "n_sh")
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
    """120-bit SimHash per doc as two 60-bit longs (fp1 = md5 head hash,
    fp2 = md5 tail hash): per word occurrence, each of the 120 hash bits
    votes +1/-1; fingerprint bit i is set iff the vote sum is > 0. All
    JVM-side: explode + ONE map-side-combinable aggregate of 120 sums."""
    w = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(F.col(text_col))).alias("word"),
    ).withColumn("h1", hash60(F.col("word"))).withColumn(
        "h2", hash60_tail(F.col("word"))
    )

    def vote(src: str, i: int) -> Column:
        return F.sum(
            F.when(F.col(src).bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(-1)
        )

    votes = w.groupBy("doc_id").agg(
        *[vote("h1", i).alias(f"a{i}") for i in range(SIMHASH_BITS)],
        *[vote("h2", i).alias(f"c{i}") for i in range(SIMHASH_BITS)],
    )

    def assemble(prefix: str) -> Column:
        fp = F.lit(0)
        for i in range(SIMHASH_BITS):
            fp = fp + F.when(
                F.col(f"{prefix}{i}") > 0, F.lit(1 << i)
            ).otherwise(F.lit(0))
        return fp.cast("long")

    return votes.select(
        "doc_id", assemble("a").alias("fp1"), assemble("c").alias("fp2")
    )


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 5,
    n_bands: int = SIMHASH_BANDS,
) -> DataFrame:
    """EXACT pairs with 120-bit SimHash hamming distance <= max_hamming.

    Pigeonhole: max_hamming < n_bands and the bands are disjoint, so any
    qualifying pair agrees exactly on >= 1 of the n_bands 20-bit bands —
    the banded self-join is exact blocking and the full O(n^2) comparison
    never materializes. With 6 bands of 20 bits the key space is
    6 * 2^20 ~ 6.3M, so expected random-collision candidates are
    ~6 * n^2 / 2^20 — sub-quadratic growth holds past 10^6 docs (see
    tests/test_dedup.py::test_simhash_candidates_subquadratic).
    """
    assert max_hamming < n_bands
    assert n_bands % 2 == 0 and SIMHASH_BITS % (n_bands // 2) == 0
    per_half = n_bands // 2
    band_bits = SIMHASH_BITS // per_half
    fp = simhash_fingerprints(docs, id_col, text_col)

    def band_val(bi: int) -> Column:
        src = "fp1" if bi < per_half else "fp2"
        shift = (bi % per_half) * band_bits
        return F.shiftrightunsigned(F.col(src), shift).bitwiseAND(
            F.lit((1 << band_bits) - 1)
        )

    bands = fp.select(
        "doc_id",
        "fp1",
        "fp2",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band"), band_val(bi).alias("band_val")
                )
                for bi in range(n_bands)
            ])
        ).alias("bv"),
    ).select("doc_id", "fp1", "fp2", "bv.band", "bv.band_val")
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
            F.col("a.fp1").alias("fp1_a"),
            F.col("a.fp2").alias("fp2_a"),
            F.col("b.fp1").alias("fp1_b"),
            F.col("b.fp2").alias("fp2_b"),
        )
        .distinct()
    )
    ham = F.bit_count(
        F.col("fp1_a").bitwiseXOR(F.col("fp1_b"))
    ) + F.bit_count(F.col("fp2_a").bitwiseXOR(F.col("fp2_b")))
    return cand.withColumn("hamming", ham).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


def simhash_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bands: int = SIMHASH_BANDS,
) -> DataFrame:
    """Distinct candidate pairs the banded join proposes BEFORE the
    hamming filter — instrumentation for the sub-quadratic-growth test."""
    assert n_bands % 2 == 0 and SIMHASH_BITS % (n_bands // 2) == 0
    per_half = n_bands // 2
    band_bits = SIMHASH_BITS // per_half
    fp = simhash_fingerprints(docs, id_col, text_col)

    def band_val(bi: int) -> Column:
        src = "fp1" if bi < per_half else "fp2"
        shift = (bi % per_half) * band_bits
        return F.shiftrightunsigned(F.col(src), shift).bitwiseAND(
            F.lit((1 << band_bits) - 1)
        )

    bands = fp.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band"), band_val(bi).alias("band_val")
                )
                for bi in range(n_bands)
            ])
        ).alias("bv"),
    ).select("doc_id", "bv.band", "bv.band_val")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )


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
