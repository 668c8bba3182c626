"""Multimodal plumbing: deterministic synth, fake-decode statistics,
feature extraction shapes, frame sampling, and the gated real-decoder
seam."""

import numpy as np
import pytest

from kapra_timeseries_anonymization_spark.operators.multimodal import (
    decode_media,
    extract_features,
    frame_sample,
    synth_media,
)


def test_synth_media_deterministic(spark):
    a = synth_media(spark, 30).collect()
    b = synth_media(spark, 30).collect()
    ka = sorted((r["media_id"], r["kind"], bytes(r["payload"])) for r in a)
    kb = sorted((r["media_id"], r["kind"], bytes(r["payload"])) for r in b)
    assert ka == kb
    kinds = {r["kind"] for r in a}
    assert kinds == {"image", "audio", "video"}
    for r in a:
        assert len(bytes(r["payload"])) > 0
        assert r["meta"]["width"] >= 16


def test_fake_decode_statistics(spark):
    m = synth_media(spark, 20)
    d = {r["media_id"]: r for r in decode_media(m).collect()}
    raw = {r["media_id"]: bytes(r["payload"]) for r in m.collect()}
    assert set(d) == set(raw)
    for mid, b in raw.items():
        arr = np.frombuffer(b, dtype=np.uint8)
        assert d[mid]["n_bytes"] == len(arr)
        assert abs(d[mid]["mean_byte"] - arr.mean()) < 1e-9


def test_real_decoder_gated(spark):
    m = synth_media(spark, 3)
    with pytest.raises(Exception) as ei:
        decode_media(m, decoder="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_feature_extraction(spark):
    m = synth_media(spark, 15)
    rows = extract_features(m, dim=16).collect()
    assert len(rows) == 15
    for r in rows:
        f = np.array(r["features"])
        assert len(f) == 16
        assert abs(f.sum() - 1.0) < 1e-9
        assert (f >= 0).all()


def test_frame_sampling(spark):
    m = synth_media(spark, 30)
    frames = frame_sample(m, every_ms=1000).collect()
    vids = {
        r["media_id"]: r["meta"]["duration_ms"]
        for r in m.collect()
        if r["kind"] == "video" and r["meta"]["duration_ms"] > 0
    }
    per_vid = {}
    for r in frames:
        per_vid.setdefault(r["media_id"], []).append(r)
    assert set(per_vid) == set(vids)
    for mid, fs in per_vid.items():
        assert len(fs) == -(-vids[mid] // 1000)  # ceil
        idxs = sorted(f["frame_idx"] for f in fs)
        assert idxs == list(range(len(fs)))
