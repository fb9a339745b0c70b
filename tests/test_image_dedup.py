"""Image perceptual near-dup (multimodal.image_ahash /
image_near_dup_pairs): loop-wise Python model parity for the hash kernel,
planted near-dup geometry, pigeonhole recall vs brute force, the DuckDB
pairing twin, and the no-cartesian plan pin."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from omnition_opentelemetry_service_spark.operators import media_codecs as mc
from omnition_opentelemetry_service_spark.operators import multimodal as mm


def _model_ahash(arr) -> int:
    """Independent loop-wise reference: nearest-neighbor indices, channel
    sums, integer cross-multiplied threshold — no numpy vector ops, no
    calls into the operator under test."""
    h, w = arr.shape[0], arr.shape[1]
    lums = []
    for r in range(8):
        for c in range(8):
            y, x = (r * h) // 8, (c * w) // 8
            lums.append(int(arr[y][x][0]) + int(arr[y][x][1])
                        + int(arr[y][x][2]))
    total = sum(lums)
    bits = 0
    for i, v in enumerate(lums):
        if v * 64 > total:
            bits |= 1 << i
    return bits - (1 << 64) if bits >= 1 << 63 else bits


def _media_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, media binary, media_type string")


def _checker(flip=()):
    """8x8 two-level image, every cell far from the mean; flipping pixel
    (r, c) flips exactly that aHash bit."""
    arr = np.zeros((8, 8, 3), np.uint8)
    for r in range(8):
        for c in range(8):
            if (r + c) % 2 == 0:
                arr[r, c] = 200
    for r, c in flip:
        arr[r, c] = 0 if (r + c) % 2 == 0 else 200
    return arr


def test_kernel_matches_loop_model_on_fixture(spark):
    docs = spark.range(0, 48).select(F.col("id").alias("doc_id"))
    media = mm.with_real_media(docs)
    got = {r.doc_id: r.ahash for r in mm.image_ahash(media).collect()}
    # images only (doc_id % 4 in {0, 2} — png/ppm/jpeg); audio/video rows
    # filtered out
    assert set(got) == {i for i in range(48) if i % 4 in (0, 2)}
    for r in media.collect():
        if not r.media_type.startswith("image/"):
            continue
        arr = mc.decode_image(bytes(r.media), r.media_type)
        assert got[r.doc_id] == _model_ahash(arr), r.doc_id


def test_planted_near_dup_within_hamming(spark):
    base = _checker()
    near = _checker(flip=[(0, 0), (3, 4)])      # 2 bits
    far = _checker(flip=[(r, c) for r in range(8) for c in range(4)])
    rows = [(1, mc.encode_png(base), "image/png"),
            (2, mc.encode_png(near), "image/png"),
            (3, mc.encode_png(far), "image/png")]
    hashes = mm.image_ahash(_media_df(spark, rows))
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in mm.image_near_dup_pairs(hashes, max_hamming=3)
             .collect()}
    assert pairs == {(1, 2): 2}


def test_reencode_is_exact_dup(spark):
    # the SAME pixels through two codecs (png filter variants + ppm) hash
    # identically — hamming 0, the re-encode dedup case
    arr = _checker(flip=[(5, 5)])
    rows = [(10, mc.encode_png(arr, filter_type=2), "image/png"),
            (11, mc.encode_png(arr, filter_type=4), "image/png"),
            (12, mc.encode_ppm(arr), "image/ppm")]
    hashes = mm.image_ahash(_media_df(spark, rows))
    out = mm.image_near_dup_pairs(hashes, max_hamming=0).collect()
    assert {(r.id_a, r.id_b, r.hamming) for r in out} == {
        (10, 11, 0), (10, 12, 0), (11, 12, 0)}


def test_pigeonhole_recall_vs_brute_force(spark):
    docs = spark.range(0, 120).select(F.col("id").alias("doc_id"))
    hashes_df = mm.image_ahash(mm.with_real_media(docs))
    hs = {r.doc_id: r.ahash for r in hashes_df.collect()}
    brute = {(a, b, bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1"))
             for a in hs for b in hs if a < b
             and bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1") <= 3}
    got = {(r.id_a, r.id_b, r.hamming)
           for r in mm.image_near_dup_pairs(hashes_df, 3).collect()}
    assert got == brute


def test_pairs_match_duckdb_twin(spark):
    docs = spark.range(0, 120).select(F.col("id").alias("doc_id"))
    media = mm.with_real_media(docs)
    hashes_df = mm.image_ahash(media)
    got = {tuple(r) for r in
           mm.image_near_dup_pairs(hashes_df, 3).collect()}
    # model hashes (independent of the Spark kernel) feed the SQL twin
    model_rows = []
    for r in media.collect():
        if not r.media_type.startswith("image/"):
            continue
        arr = mc.decode_image(bytes(r.media), r.media_type)
        model_rows.append((r.doc_id, _model_ahash(arr)))
    d = set(map(tuple, duckdb.connect().execute(
        mm.image_near_dup_pairs_sql_duck(model_rows, 3)).fetchall()))
    assert got == d


def test_max_hamming_above_band_guarantee_rejected(spark):
    docs = spark.range(0, 4).select(F.col("id").alias("doc_id"))
    hashes = mm.image_ahash(mm.with_real_media(docs))
    with pytest.raises(ValueError):
        mm.image_near_dup_pairs(hashes, max_hamming=4)


def test_no_cartesian_in_pair_plan(spark):
    docs = spark.range(0, 16).select(F.col("id").alias("doc_id"))
    hashes = mm.image_ahash(mm.with_real_media(docs))
    plan = (mm.image_near_dup_pairs(hashes, 3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- audio envelope hash (the modality-agnostic pairing reused) ----------

def _model_audio_ahash(samples) -> int:
    n = len(samples)
    absx = [abs(int(s)) for s in samples]
    total = sum(absx)
    bits = 0
    for w in range(64):
        lo, hi = (w * n) // 64, ((w + 1) * n) // 64
        s = 0
        for i in range(lo, hi):
            s += absx[i]
        if s * n > total * (hi - lo):
            bits |= 1 << w
    return bits - (1 << 64) if bits >= 1 << 63 else bits


def test_audio_kernel_matches_loop_model(spark):
    docs = spark.range(0, 60).select(F.col("id").alias("doc_id"))
    media = mm.with_real_media(docs)
    got = {r.doc_id: r.ahash for r in mm.audio_ahash(media).collect()}
    assert set(got) == {i for i in range(60) if i % 4 == 1}
    for r in media.collect():
        if r.media_type != "audio/wav":
            continue
        samples, _ = mc.decode_wav(bytes(r.media))
        assert got[r.doc_id] == _model_audio_ahash(samples), r.doc_id


def test_audio_planted_near_dup(spark):
    import numpy as np
    t = np.arange(256)
    base = np.where((t // 8) % 2 == 0, 8000, -200).astype(np.int16)
    near = base.copy()
    near[5] = 7600          # tiny local edit: same envelope shape
    far = np.roll(base, 4)  # phase shift flips many windows
    rows = [(1, mc.encode_wav(base), "audio/wav"),
            (2, mc.encode_wav(near), "audio/wav"),
            (3, mc.encode_wav(far), "audio/wav")]
    hashes = mm.audio_ahash(_media_df(spark, rows))
    hs = {r.doc_id: r.ahash for r in hashes.collect()}
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(hs[1], hs[2]) <= 3 < ham(hs[1], hs[3])
    pairs = {(r.id_a, r.id_b) for r in
             mm.ahash_near_dup_pairs(hashes, 3).collect()}
    assert pairs == {(1, 2)}


def test_audio_empty_clip_raises():
    with pytest.raises(ValueError):
        mm.audio_ahash_from_samples([])


# --- pHash (the DCT / re-encode identity; aHash's spectral sibling) -------

def _model_phash(arr) -> int:
    """Independent explicit-loop reference over the EXACT integer hash
    definition: nearest indices, channel sums, the 2^-20 fixed-point DCT
    matrix recomputed from math.cos + python round, four-nested-loop
    INTEGER transform sums, exact integer median — no numpy matmul, no
    calls into the kernel under test. Integer arithmetic is why kernel
    and model can agree bitwise: a float DCT differs in last-ulp
    summation order, which flips bits on sparse-spectrum images whose
    coefficients tie the median (observed on the gradient fixtures)."""
    import math

    q = [[round(math.sqrt(2.0 / 32)
                * (1 / math.sqrt(2) if u == 0 else 1.0)
                * math.cos((2 * x + 1) * u * math.pi / 64) * (1 << 20))
          for x in range(32)] for u in range(32)]
    h, w = arr.shape[0], arr.shape[1]
    lum = [[0] * 32 for _ in range(32)]
    for r in range(32):
        for c in range(32):
            y, x = (r * h) // 32, (c * w) // 32
            lum[r][c] = (int(arr[y][x][0]) + int(arr[y][x][1])
                         + int(arr[y][x][2]))
    coefs = []
    for u in range(8):
        for v in range(8):
            s = 0
            for r in range(32):
                for c in range(32):
                    s += q[u][r] * lum[r][c] * q[v][c]
            coefs.append(s)
    block = coefs[1:]
    med = sorted(block)[31]
    bits = 0
    for i, vv in enumerate(block):
        if vv > med:
            bits |= 1 << i
    return bits


def _dense(seed, h=24, w=30):
    return ((np.arange(h * w * 3).reshape(h, w, 3) * 37 + seed) % 256
            ).astype(np.uint8)


def test_phash_kernel_matches_loop_model(spark):
    docs = spark.range(0, 24).select(F.col("id").alias("doc_id"))
    media = mm.with_real_media(docs)
    got = {r.doc_id: r.phash for r in mm.image_phash(media).collect()}
    assert set(got) == {i for i in range(24) if i % 4 in (0, 2)}
    for r in media.collect():
        if not r.media_type.startswith("image/"):
            continue
        arr = mc.decode_image(bytes(r.media), r.media_type)
        if arr.shape[2] == 1:
            arr = arr.repeat(3, axis=2)
        assert got[r.doc_id] == _model_phash(arr), r.doc_id


def test_phash_reencode_identity_and_separation(spark):
    """The measured contract: lossy JPEG re-encode of the same dense-
    spectrum pixels lands within the banded pairing's hamming-3 guarantee;
    unrelated images land far away — so the SHARED banded pair join
    (hash_col='phash') finds exactly the re-encode pairs."""
    a, b_img = _dense(3), _dense(104)
    rows = [(1, mc.encode_png(a), "image/png"),
            (2, mc.encode_jpeg(a, 90), "image/jpeg"),
            (3, mc.encode_ppm(a), "image/ppm"),
            (4, mc.encode_png(b_img), "image/png")]
    hashes = mm.image_phash(_media_df(spark, rows))
    hs = {r.doc_id: r.phash for r in hashes.collect()}

    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert ham(hs[1], hs[2]) <= 3          # png vs jpeg of SAME pixels
    assert hs[1] == hs[3]                  # png vs ppm: identical pixels
    assert ham(hs[1], hs[4]) > 20          # unrelated image
    pairs = {(r.id_a, r.id_b) for r in mm.image_near_dup_pairs(
        hashes, max_hamming=3, hash_col="phash").collect()}
    assert pairs == {(1, 2), (1, 3), (2, 3)}
