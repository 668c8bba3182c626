"""Text analysis: language ID on real sentences, quality features edge
cases, winnowing fingerprint properties."""

import hashlib

from pyspark.sql import functions as F

from kapra_timeseries_anonymization_spark.operators.text import (
    language_id,
    quality_features,
    token_count_bpe,
    winnow_fingerprint,
)

SAMPLES = [
    (1, "the cat sat on the mat and looked at the dog", "en"),
    (2, "der hund ist mit der katze auf das sofa und ein bett", "de"),
    (3, "le chat est dans la maison et les oiseaux pour une heure", "fr"),
    (4, "zzz qqq www rrr ttt yyy uuu", "und"),
    (5, "", "und"),
]


def test_language_id(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in SAMPLES], "id long, text string"
    )
    got = {
        r["id"]: r["pred"]
        for r in df.select("id", language_id(F.col("text")).alias("pred")).collect()
    }
    for i, _, want in SAMPLES:
        assert got[i] == want, (i, got[i], want)


def test_token_count_bpe(spark):
    df = spark.createDataFrame([(1, "hello, world! x2 (42)")], "id long, text string")
    n = df.select(token_count_bpe(F.col("text")).alias("n")).first()["n"]
    # hello , world ! x 2 ( 42 )
    assert n == 9


def test_quality_features_edges(spark):
    df = spark.createDataFrame(
        [
            (1, "the data pipeline runs on spark and writes to the lake today ok"),
            (2, "!!! ??? *** $$$ %%%"),
        ],
        "id long, text string",
    )
    feats = quality_features(F.col("text"))
    rows = {r["id"]: r for r in df.select("id", *[c.alias(n) for n, c in feats.items()]).collect()}
    assert rows[1]["quality_score"] == 1.0
    assert rows[2]["quality_score"] <= 0.5
    assert rows[2]["symbol_ratio"] > 0.5


def test_winnow_fingerprint_deterministic(spark):
    text = "a b c d e f g h"
    df = spark.createDataFrame([(1, text)], "id long, text string")
    fp = df.select(winnow_fingerprint(F.col("text")).alias("fp")).first()["fp"]
    # python replication
    w = text.split()
    sh = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
    hs = sorted({int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in sh})
    assert list(fp) == hs[:4]
