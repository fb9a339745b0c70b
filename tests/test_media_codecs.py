"""Real media codecs (operators/media_codecs.py) and the real multimodal
tier (with_real_media → extract_real_media_features → resize_media_real):
roundtrips for every format/filter, features equal a direct local decode,
and the resize hash is the hash of the genuinely resampled buffer."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import media_codecs as mc
from omnition_opentelemetry_service_spark.operators import multimodal as mm


def _img(h, w, c, seed=3):
    return ((np.arange(h * w * c).reshape(h, w, c) * 37 + seed) % 256
            ).astype(np.uint8)


def test_ppm_roundtrip():
    a = _img(5, 7, 3)
    assert (mc.decode_ppm(mc.encode_ppm(a)) == a).all()


def test_ppm_rejects_garbage():
    with pytest.raises(ValueError):
        mc.decode_ppm(b"not a ppm")


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_roundtrip_all_filters_and_channels(filter_type, channels):
    a = _img(6, 9, channels, seed=filter_type * 11 + channels)
    got = mc.decode_png(mc.encode_png(
        a if channels > 1 else a[:, :, 0], filter_type=filter_type))
    assert got.shape == (6, 9, channels)
    assert (got == a).all(), f"filter {filter_type} channels {channels}"


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        mc.decode_png(b"JFIF definitely not png")


def test_wav_roundtrip():
    x = ((np.arange(200) * 977) % 20000 - 10000).astype(np.int16)
    arr, rate = mc.decode_wav(mc.encode_wav(x, rate=12000))
    assert rate == 12000
    assert (arr[:, 0] == x).all()


def test_resize_nearest_known_case():
    a = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    s = mc.resize_nearest(a, 2, 2)
    # nearest with floor index mapping: rows 0,2 / cols 0,2
    assert s[:, :, 0].tolist() == [[0, 2], [8, 10]]


def test_jpeg_roundtrip_error_bounded():
    """Lossy, but bounded: at quality 95 the worst-case quantization error
    per DCT coefficient is a few units, so even an adversarial modular-
    noise image reconstructs within a small per-pixel bound — and a smooth
    gradient (the realistic case) reconstructs much tighter."""
    noise = _img(13, 17, 3, seed=5)
    got = mc.decode_jpeg(mc.encode_jpeg(noise, quality=95))
    assert got.shape == (13, 17, 3)
    assert int(np.max(np.abs(got.astype(int) - noise.astype(int)))) <= 40
    grad = np.stack([np.add.outer(np.arange(16) * 3, np.arange(24) * 2) % 200
                     + c * 10 for c in range(3)], axis=2).astype(np.uint8)
    got = mc.decode_jpeg(mc.encode_jpeg(grad, quality=95))
    assert int(np.max(np.abs(got.astype(int) - grad.astype(int)))) <= 12


def test_jpeg_grayscale_and_edge_sizes():
    g = _img(9, 11, 1, seed=2)
    got = mc.decode_jpeg(mc.encode_jpeg(g, quality=90))
    assert got.shape == (9, 11, 1)
    assert int(np.max(np.abs(got.astype(int) - g.astype(int)))) <= 24
    # 1x1 and exact-block sizes survive the pad/unpad path
    one = np.full((1, 1, 3), 77, np.uint8)
    assert mc.decode_jpeg(mc.encode_jpeg(one, 95)).shape == (1, 1, 3)
    sq = _img(8, 8, 3, seed=7)
    assert mc.decode_jpeg(mc.encode_jpeg(sq, 95)).shape == (8, 8, 3)


def test_jpeg_deterministic_and_quality_monotone():
    a = _img(12, 12, 3, seed=4)
    assert mc.encode_jpeg(a, 85) == mc.encode_jpeg(a, 85)
    # harsher quantization at lower quality → no larger payload on this
    # fixture and a looser reconstruction
    hi, lo = mc.encode_jpeg(a, 95), mc.encode_jpeg(a, 30)
    assert len(lo) <= len(hi)
    err_hi = int(np.max(np.abs(
        mc.decode_jpeg(hi).astype(int) - a.astype(int))))
    err_lo = int(np.max(np.abs(
        mc.decode_jpeg(lo).astype(int) - a.astype(int))))
    assert err_hi <= err_lo


def test_jpeg_rejects_malformed():
    with pytest.raises(ValueError):
        mc.decode_jpeg(b"not a jpeg at all")
    good = mc.encode_jpeg(_img(10, 10, 3), 90)
    with pytest.raises(ValueError):          # truncated entropy data
        mc.decode_jpeg(good[:len(good) // 2])
    # progressive (SOF2) is refused with a labelled error, not mis-decoded
    prog = bytearray(good)
    sof0 = bytes(good).find(b"\xff\xc0")
    prog[sof0 + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF0|baseline"):
        mc.decode_jpeg(bytes(prog))
    with pytest.raises(ValueError):
        mc.encode_jpeg(_img(4, 4, 3), quality=0)


def test_jpeg_mean_luminance_survives_roundtrip():
    """The feature the pipeline actually reads (image_stats mean_lum) is
    stable through the lossy roundtrip within ~1 gray level."""
    a = _img(16, 16, 3, seed=6)
    w0, h0, lum0 = mc.image_stats(a)
    w1, h1, lum1 = mc.image_stats(mc.decode_jpeg(mc.encode_jpeg(a, 90)))
    assert (w0, h0) == (w1, h1)
    assert abs(lum0 - lum1) <= 1.5


def test_decode_image_dispatch():
    a = _img(6, 6, 3, seed=8)
    assert (mc.decode_image(mc.encode_ppm(a), "image/ppm") == a).all()
    assert (mc.decode_image(mc.encode_png(a), "image/png") == a).all()
    assert mc.decode_image(
        mc.encode_jpeg(a, 95), "image/jpeg").shape == (6, 6, 3)
    with pytest.raises(ValueError):
        mc.decode_image(b"x", "image/webp")


def test_real_features_match_direct_decode(spark):
    docs = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    media = mm.with_real_media(docs)
    rows = {r.doc_id: r for r in media.collect()}
    feats = {r.doc_id: r
             for r in mm.extract_real_media_features(media).collect()}
    assert set(feats) == set(range(24))
    for did, r in rows.items():
        f = feats[did]
        b = bytes(r.media)
        assert f.n_bytes == len(b)
        assert f.checksum == hashlib.md5(b).hexdigest()
        if r.media_type == "audio/wav":
            n, rate, rms, zc = mc.audio_stats(*mc.decode_wav(b))
            assert (f.n_samples, f.sample_rate, f.rms, f.zero_crossings) == \
                (n, rate, rms, zc)
            assert f.width is None and f.mean_lum is None
            assert f.rms > 0 and f.zero_crossings > 0  # non-vacuous audio
        elif r.media_type == "video/mp4":
            dur, ts, w, h = mc.decode_mp4_meta(b)
            assert (f.width, f.height, f.timescale) == (w, h, ts)
            assert f.duration_s == mc.video_stats(dur, ts)
            assert f.duration_s > 0 and f.mean_lum is None
        elif r.media_type == "video/x-msvideo":
            frames, fps = mc.decode_avi_mjpeg(b)
            n, fps2, w, h, dur_s, lum = mc.avi_video_stats(frames, fps)
            assert (f.width, f.height, f.timescale) == (w, h, fps2)
            assert (f.duration_s, f.mean_lum) == (dur_s, lum)
            assert f.duration_s > 0 and f.mean_lum > 0  # real frame decode
        else:
            arr = mc.decode_image(b, r.media_type)
            w, h, lum = mc.image_stats(arr)
            assert (f.width, f.height, f.mean_lum) == (w, h, lum)
            assert f.n_samples is None and f.rms is None
    # all six modalities present — video metadata, jpeg AND real video
    # frames are no longer stubs (range(24): 6/14/22 → jpeg, 7/15/23 → avi)
    assert {r.media_type for r in rows.values()} == {
        "image/png", "audio/wav", "image/ppm", "image/jpeg",
        "video/mp4", "video/x-msvideo"}


def test_real_resize_hashes_actual_resampled_buffer(spark):
    docs = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    media = mm.with_real_media(docs)
    raw = {r.doc_id: r for r in media.collect()}
    out = {r.doc_id: r
           for r in mm.resize_media_real(media, 5, 4).collect()}
    # only the image modalities flow through
    assert set(out) == {d for d, r in raw.items()
                        if r.media_type.startswith("image/")}
    for did, r in out.items():
        b = bytes(raw[did].media)
        arr = mc.decode_image(b, raw[did].media_type)
        want = hashlib.md5(
            mc.encode_ppm(mc.resize_nearest(arr[:, :, :3], 5, 4))).hexdigest()
        assert r.resized_md5 == want
        assert (r.out_width, r.out_height) == (5, 4)


def test_unknown_media_type_raises(spark):
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "media": [b"\x00\x01"],
                      "media_type": ["video/webm"]}))
    with pytest.raises(Exception, match="NotImplementedError|no stdlib"):
        mm.extract_real_media_features(df).collect()


def test_mp4_meta_roundtrip_and_malformed():
    b = mc.encode_mp4_meta(3600, 600, 640, 360)
    assert mc.decode_mp4_meta(b) == (3600, 600, 640, 360)
    assert mc.video_stats(3600, 600) == 6.0
    # no video track → dims are None, duration still real
    b2 = mc.encode_mp4_meta(1234, 1000)
    assert mc.decode_mp4_meta(b2) == (1234, 1000, None, None)
    # 64-bit mvhd (version 1) parses too
    import struct
    mvhd1 = (struct.pack(">B3xQQIQ", 1, 0, 0, 90000, 270000)
             + b"\x00" * 80)
    moov = mc._chunk_mp4(b"moov", mc._chunk_mp4(b"mvhd", mvhd1))
    assert mc.decode_mp4_meta(moov)[:2] == (270000, 90000)
    with pytest.raises(ValueError):
        mc.decode_mp4_meta(b"garbage that is not bmff")
    with pytest.raises(ValueError):
        mc.video_stats(100, 0)


def test_avi_mjpeg_roundtrip_and_malformed():
    frames = [((np.arange(12 * 16 * 3).reshape(12, 16, 3) * 7 + i * 31)
               % 256).astype(np.uint8) for i in range(4)]
    b = mc.encode_avi_mjpeg(frames, fps=8, quality=95)
    got, fps = mc.decode_avi_mjpeg(b)
    assert fps == 8 and len(got) == 4
    for g, f in zip(got, frames):
        assert g.shape == f.shape
        assert int(np.max(np.abs(g.astype(int) - f.astype(int)))) <= 40
    assert mc.avi_video_stats(got, fps)[:5] == (4, 8, 16, 12, 0.5)
    # determinism + failure modes
    assert mc.encode_avi_mjpeg(frames, 8, 95) == b
    with pytest.raises(ValueError):
        mc.decode_avi_mjpeg(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError):
        mc.decode_avi_mjpeg(b"definitely not riff")
    with pytest.raises(ValueError):
        mc.encode_avi_mjpeg([], fps=8)
    with pytest.raises(ValueError):
        mc.encode_avi_mjpeg([frames[0], frames[0][:6]], fps=8)
    # a non-MJPG handler is refused, not mis-decoded
    hacked = bytearray(b)
    hpos = bytes(b).find(b"vidsMJPG")
    hacked[hpos + 4:hpos + 8] = b"H264"
    with pytest.raises(ValueError, match="MJPG"):
        mc.decode_avi_mjpeg(bytes(hacked))


def test_avi_rational_fps_multistream_and_maxbps_clamp():
    """ADVICE r4 closures: (1) non-integer frame rates decode exactly
    (NTSC 30000/1001 → 29.97..., not a truncated 29); (2) only the MJPG
    stream's 'NNdc' chunks decode in a multi-stream AVI; (3) huge
    maxsz*fps saturates dwMaxBytesPerSec instead of struct.error."""
    import struct

    frames = [((np.arange(12 * 16 * 3).reshape(12, 16, 3) * 7 + i * 31)
               % 256).astype(np.uint8) for i in range(3)]
    b = mc.encode_avi_mjpeg(frames, fps=30, quality=95)

    # (1) patch strh timing to the NTSC rational: dwScale=1001 dwRate=30000
    pos = b.find(b"vidsMJPG")
    patched = bytearray(b)
    patched[pos + 20:pos + 28] = struct.pack("<II", 1001, 30000)
    got, fps = mc.decode_avi_mjpeg(bytes(patched))
    assert abs(fps - 30000 / 1001) < 1e-12 and len(got) == 3
    stats = mc.avi_video_stats(got, fps)
    assert stats[4] == round(3 * 1001 / 30000, 6)  # exact duration, not 3/29

    # (2) rebuild the same AVI with a leading non-video stream (strl #0)
    # so MJPG becomes stream 01: '00dc' junk chunks must NOT be decoded
    jpegs = []
    hdrl_children = []
    for fourcc, b0, b1 in mc._riff_children(b, 12, len(b)):
        if fourcc == b"LIST" and b[b0:b0 + 4] == b"hdrl":
            for f2, c0, c1 in mc._riff_children(b, b0 + 4, b1):
                hdrl_children.append((f2, b[c0 - 8:c1]))
        elif fourcc == b"LIST" and b[b0:b0 + 4] == b"movi":
            jpegs = [b[c0:c1] for f2, c0, c1
                     in mc._riff_children(b, b0 + 4, b1)]
    auds_strh = (b"auds" + b"\x00" * 4
                 + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, 8000,
                               0, 8000, 1024, 0, 0) + struct.pack("<4H", 0, 0, 0, 0))
    auds_strl = mc._riff_list(b"strl", mc._riff_chunk(b"strh", auds_strh))
    avih = next(body for f, body in hdrl_children if f == b"avih")
    vid_strl = next(body for f, body in hdrl_children
                    if f == b"LIST" and body[8:12] == b"strl")
    hdrl2 = mc._riff_list(b"hdrl", avih + auds_strl + vid_strl)
    movi2 = mc._riff_list(b"movi", mc._riff_chunk(b"00dc", b"\x01\x02junk")
                          + b"".join(mc._riff_chunk(b"01dc", j) for j in jpegs))
    body2 = b"AVI " + hdrl2 + movi2
    multi = b"RIFF" + struct.pack("<I", len(body2)) + body2
    got2, fps2 = mc.decode_avi_mjpeg(multi)
    assert fps2 == 30 and len(got2) == 3  # junk 00dc skipped, not "decoded"
    assert all(np.array_equal(a, c) for a, c in zip(got2, got))

    # a SECOND vids stream with a foreign handler is skipped (its track's
    # chunks prefix-filtered), as long as an MJPG track exists — only a
    # file with NO MJPG track raises
    dib_strh = (b"vids" + b"DIB "
                + struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, 1, 10,
                              0, 3, 64, 0, 0) + struct.pack("<4H", 0, 0, 4, 4))
    dib_strl = mc._riff_list(b"strl", mc._riff_chunk(b"strh", dib_strh))
    hdrl3 = mc._riff_list(b"hdrl", avih + dib_strl + vid_strl)
    body3 = b"AVI " + hdrl3 + movi2  # movi2 already keys MJPG as stream 01
    got3, fps3 = mc.decode_avi_mjpeg(
        b"RIFF" + struct.pack("<I", len(body3)) + body3)
    assert fps3 == 30 and len(got3) == 3
    # no MJPG track anywhere → the labelled handler error, post-scan
    hdrl4 = mc._riff_list(b"hdrl", avih + dib_strl)
    body4 = b"AVI " + hdrl4 + movi2
    with pytest.raises(ValueError, match="MJPG"):
        mc.decode_avi_mjpeg(b"RIFF" + struct.pack("<I", len(body4)) + body4)

    # (3) dwMaxBytesPerSec saturates at field width (documented upper bound)
    import types  # noqa: F401 — monkeypatch-free: swap and restore

    real_encode = mc.encode_jpeg
    mc.encode_jpeg = lambda a, quality=90: b"\xff" * (5 * 1024 * 1024)
    try:
        big = mc.encode_avi_mjpeg([frames[0]], fps=1000, quality=95)
    finally:
        mc.encode_jpeg = real_encode
    avih_pos = big.find(b"avih") + 8
    assert struct.unpack("<I", big[avih_pos + 4:avih_pos + 8])[0] == 0xFFFFFFFF


def test_video_frames_real_sampling(spark):
    """The frame-sample op decodes REAL frames: every sampled frame_md5
    equals the md5 of the PPM re-encode of the locally decoded frame, and
    every_k/offset select exactly the expected frame ids."""
    import hashlib

    docs = spark.range(0, 32).select(F.col("id").alias("doc_id"))
    media = mm.with_real_media(docs)
    raw = {r.doc_id: bytes(r.media) for r in media.collect()
           if r.media_type == "video/x-msvideo"}
    assert raw, "fixture must contain avi docs"
    out = mm.video_frames(media, every_k=2, offset=1).collect()
    got = {(r.doc_id, r.frame_id): r.frame_md5 for r in out}
    want = {}
    for did, b in raw.items():
        frames, _ = mc.decode_avi_mjpeg(b)
        for fi, f in enumerate(frames):
            if fi % 2 == 1:
                want[(did, fi)] = hashlib.md5(
                    mc.encode_ppm(f[:, :, :3])).hexdigest()
    assert got == want
    with pytest.raises(ValueError):
        mm.video_frames(media, every_k=2, offset=2)


def test_real_resize_handles_gray_png(spark):
    """decode_png legitimately returns (h, w, 1) for color type 0 — the
    resize kernel must broadcast gray to RGB before the 3-channel PPM
    re-encode instead of crashing (ADVICE r2)."""
    import pandas as pd

    gray = _img(6, 5, 1, seed=9)
    buf = mc.encode_png(gray)
    assert mc.decode_png(buf).shape == (6, 5, 1)
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [1], "media": [buf], "media_type": ["image/png"]}))
    out = mm.resize_media_real(df, 3, 2).collect()
    assert len(out) == 1
    rgb = np.repeat(gray, 3, axis=2)
    want = hashlib.md5(
        mc.encode_ppm(mc.resize_nearest(rgb, 3, 2))).hexdigest()
    assert out[0].resized_md5 == want
    assert (out[0].width, out[0].height) == (5, 6)
