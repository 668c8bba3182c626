"""ANN: LSH index determinism, candidate pruning, and recall vs the exact
brute force on clustered synthetic vectors (where LSH must shine)."""

import numpy as np
import pytest

from kapra_timeseries_anonymization_spark.operators.ann import (
    ann_index,
    ann_query,
    brute_force_topk,
    hyperplanes,
)


@pytest.fixture(scope="module")
def clustered(spark):
    """400 vectors in 8 tight clusters (dim 16): nearest neighbors of any
    vector are its cluster-mates."""
    rng = np.random.default_rng(7)
    cents = rng.normal(size=(8, 16))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    vecs, rows = [], []
    for i in range(400):
        c = i % 8
        v = cents[c] + rng.normal(scale=0.05, size=16)
        vecs.append(v)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, np.array(vecs)


def test_index_deterministic_and_pruning(spark, clustered):
    df, vecs = clustered
    idx1 = ann_index(df, n_planes=6).collect()
    idx2 = ann_index(df.repartition(9), n_planes=6).collect()
    b1 = {r["vec_id"]: r["bucket"] for r in idx1}
    b2 = {r["vec_id"]: r["bucket"] for r in idx2}
    assert b1 == b2  # partition-order independent
    # cluster-mates land together far more often than chance
    same = sum(1 for i in range(400) for j in range(i + 1, 400)
               if i % 8 == j % 8 and b1[i] == b1[j])
    pairs_same_cluster = sum(1 for i in range(400) for j in range(i + 1, 400)
                             if i % 8 == j % 8)
    assert same / pairs_same_cluster > 0.5


def test_recall_vs_bruteforce(spark, clustered):
    df, vecs = clustered
    idx = ann_index(df, n_planes=6).cache()
    recalls = []
    for qid in [0, 5, 13, 77]:
        q = vecs[qid]
        exact = {r["vec_id"] for r in
                 brute_force_topk(df, q, k=10, exclude_id=qid).collect()}
        approx = {r["vec_id"] for r in
                  ann_query(idx, q, k=10, n_planes=6, exclude_id=qid).collect()}
        recalls.append(len(exact & approx) / 10)
    assert sum(recalls) / len(recalls) >= 0.8


def test_bucket_expr_matches_numpy(spark, clustered):
    df, vecs = clustered
    planes = hyperplanes(6, 16)
    got = {r["vec_id"]: r["bucket"] for r in ann_index(df, n_planes=6).collect()}
    for i in range(0, 400, 37):
        want = int(sum((1 << p) for p in range(6) if planes[p] @ vecs[i] > 0))
        assert got[i] == want


def test_ivf_recall_vs_bruteforce(spark, clustered):
    """IVF probe over 4/16 lists must recover >= 0.8 of the exact top-10
    on clustered vectors (the coarse quantizer adapts to the clusters, so
    a query's cluster-mates live in its nearest lists)."""
    from kapra_timeseries_anonymization_spark.operators.ann import (
        ivf_index,
        ivf_query,
    )

    df, vecs = clustered
    idx, cents = ivf_index(df, n_lists=16)
    idx = idx.persist()
    assert cents.shape == (16, 16)
    recalls = []
    for qid in (0, 5, 11):
        q = vecs[qid]
        want = {
            r["vec_id"]
            for r in brute_force_topk(df, q, k=10, exclude_id=qid).collect()
        }
        got = {
            r["vec_id"]
            for r in ivf_query(idx, cents, q, k=10, n_probe=4,
                               exclude_id=qid).collect()
        }
        recalls.append(len(got & want) / len(want))
    assert sum(recalls) / len(recalls) >= 0.8, recalls
    idx.unpersist()


def test_ivf_probe_prunes_lists(spark, clustered):
    """A 4-of-16 probe must touch a strict subset of the corpus — the
    candidate set is bounded by the probed lists' sizes."""
    from kapra_timeseries_anonymization_spark.operators.ann import (
        ivf_index,
        ivf_query,
    )
    from pyspark.sql import functions as F

    df, vecs = clustered
    idx, cents = ivf_index(df, n_lists=16)
    idx = idx.persist()
    q = vecs[3]
    d = ((cents - q / np.linalg.norm(q)) ** 2).sum(axis=1)
    probe = set(int(i) for i in np.argsort(d)[:4])
    n_cand = idx.filter(F.col("list_id").isin(list(probe))).count()
    assert 0 < n_cand < 400
    got = ivf_query(idx, cents, q, k=10, n_probe=4, exclude_id=3).collect()
    assert len(got) == 10
    idx.unpersist()
