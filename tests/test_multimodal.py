import numpy as np
import pytest

from parconnect_spark.functions.multimodal import (
    decode_image,
    decode_wav,
    encode_ppm,
    encode_wav,
    extract_features,
    frame_sample,
    resize_images,
    resize_nearest,
    synth_media,
)


def test_ppm_roundtrip():
    rng = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    assert (decode_image(encode_ppm(rng)) == rng).all()


def test_bmp_decode():
    """Hand-built 2x2 24-bit BMP (bottom-up rows, 4-byte padded)."""
    import struct

    # pixels: (0,0)=red (1,0)=green / (0,1)=blue (1,1)=white
    top = bytes([0, 0, 255, 0, 255, 0])  # BGR: red, green
    bot = bytes([255, 0, 0, 255, 255, 255])  # BGR: blue, white
    rows = bot + b"\x00\x00" + top + b"\x00\x00"  # bottom-up, padded to 8
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    )
    img = decode_image(header + rows)
    assert img.shape == (2, 2, 3)
    assert tuple(img[0, 0]) == (255, 0, 0)  # red top-left
    assert tuple(img[0, 1]) == (0, 255, 0)
    assert tuple(img[1, 0]) == (0, 0, 255)
    assert tuple(img[1, 1]) == (255, 255, 255)


def test_wav_roundtrip():
    t = np.arange(800, dtype=np.float32)
    sig = 0.25 * np.sin(2 * np.pi * 440 * t / 16000.0)
    back, rate = decode_wav(encode_wav(sig, 16000))
    assert rate == 16000
    assert back.shape == sig.shape
    assert np.abs(back - sig).max() < 1e-3  # PCM16 quantization


def test_resize_nearest():
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    small = resize_nearest(img, 2, 2)
    assert small.shape == (2, 2, 3)
    assert (small[0, 0] == img[0, 0]).all()


def test_synth_media_schema_and_determinism(spark):
    m1 = synth_media(spark, n=30)
    m2 = synth_media(spark, n=30).repartition(4)
    assert m1.exceptAll(m2).count() == 0
    row = m1.where("media_id = 0").collect()[0]
    assert row["kind"] == "image" and row["width"] == 16
    assert bytes(row["payload"])[:2] == b"P6"  # a real PPM image


def test_extract_features_fake(spark):
    media = synth_media(spark, n=30)
    feats = extract_features(media, fake=True)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 30
    r0 = rows[0]
    assert len(r0["feature"]) == 8
    assert abs(sum(r0["feature"]) - 1.0) < 1e-5  # histogram normalized
    # checksum matches a local recomputation of the same deterministic payload
    media_row = media.where("media_id = 0").collect()[0]
    arr = np.frombuffer(media_row["payload"], dtype=np.uint8)
    assert r0["checksum"] == int(arr.astype(np.uint64).sum())


def test_extract_features_real_decode(spark):
    """Real decode path: PPM images and WAV audio produce meaningful
    features inside the Arrow kernel (no fake mode)."""
    media = synth_media(spark, n=12).where("kind != 'video'")
    feats = {r["media_id"]: r for r in extract_features(media, fake=False).collect()}
    img = feats[0]  # media_id 0 is an image
    aud = feats[1]  # media_id 1 is audio
    assert len(img["feature"]) == 8 and len(aud["feature"]) == 8
    # image features: channel means of uniform-noise PPM sit near 0.5
    assert 0.3 < img["feature"][0] < 0.7
    # audio features: rms of a 0.5-amp sine is ~0.35
    assert 0.25 < aud["feature"][0] < 0.45
    # and the FFT band energies are normalized
    assert abs(sum(aud["feature"][2:]) - 1.0) < 1e-3


def test_video_decode_is_stubbed(spark):
    media = synth_media(spark, n=3).where("kind = 'video'")
    with pytest.raises(Exception):  # NotImplementedError surfaces via Py4J
        extract_features(media, fake=False).collect()


def test_resize_images_spark(spark):
    media = synth_media(spark, n=9)
    out = resize_images(media, out_w=8, out_h=8).collect()
    assert len(out) == 3  # ids 0,3,6 are images
    for r in out:
        img = decode_image(bytes(r["payload"]))
        assert img.shape == (8, 8, 3)


def test_frame_sample(spark):
    media = synth_media(spark, n=30)
    frames = frame_sample(media, every_ms=25)
    got = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 4 for r in got)  # 100ms / 25ms
    kinds = {r["media_id"] % 3 for r in frames.select("media_id").distinct().collect()}
    assert kinds == {2}  # only video rows
