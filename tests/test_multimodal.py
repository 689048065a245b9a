import numpy as np
import pytest

from parconnect_spark.functions.multimodal import (
    extract_features,
    frame_sample,
    synth_media,
)


def test_synth_media_schema_and_determinism(spark):
    m1 = synth_media(spark, n=30)
    m2 = synth_media(spark, n=30).repartition(4)
    assert m1.exceptAll(m2).count() == 0
    row = m1.where("media_id = 0").collect()[0]
    assert row["kind"] == "image" and row["width"] == 64
    assert len(row["payload"]) == 256


def test_extract_features_fake(spark):
    media = synth_media(spark, n=30)
    feats = extract_features(media, fake=True)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 30
    r0 = rows[0]
    assert r0["n_bytes"] == 256
    assert len(r0["feature"]) == 8
    assert abs(sum(r0["feature"]) - 1.0) < 1e-5  # histogram normalized
    # checksum matches a local recomputation of the same deterministic payload
    media_row = media.where("media_id = 0").collect()[0]
    arr = np.frombuffer(media_row["payload"], dtype=np.uint8)
    assert r0["checksum"] == int(arr.astype(np.uint64).sum())


def test_real_decode_is_stubbed(spark):
    media = synth_media(spark, n=3)
    with pytest.raises(Exception):  # NotImplementedError surfaces via Py4J
        extract_features(media, fake=False).collect()


def test_frame_sample(spark):
    media = synth_media(spark, n=30)
    frames = frame_sample(media, every_ms=250)
    got = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in got)  # 1000ms / 250ms
    kinds = {r["media_id"] % 3 for r in frames.select("media_id").distinct().collect()}
    assert kinds == {2}  # only video rows
