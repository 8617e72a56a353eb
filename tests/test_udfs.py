"""UDF-surface tests: the Arrow-vectorized paths agree with the JVM paths."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_lake_proxy_spark.functions import similarity, udfs
from delta_lake_proxy_spark.io import load_table
from tests.conftest import SF_DIR


def test_pandas_cosine_matches_jvm(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    q = list(emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"])
    jvm = similarity.cosine_topk(emb, q, k=10).collect()
    arrow = udfs.cosine_topk_pandas(emb, q, k=10).collect()
    assert [(r["vec_id"], r["score"]) for r in jvm] == [
        (r["vec_id"], r["score"]) for r in arrow
    ]


def test_grouped_zscore(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 30.0), ("b", 4, 5.0)],
        "k string, id long, v double",
    )
    out = {r["id"]: r["v"] for r in udfs.grouped_zscore(df, "k", "v").collect()}
    assert abs(out[2]) < 1e-12  # group mean maps to 0
    assert abs(out[1] + out[3]) < 1e-12  # symmetric
    assert out[4] == 0.0  # single-element group (std=0) -> 0


# -- perceptual image hashing + near-dup (round 12) ---------------------------


def _ahash_oracle(px):
    """Pure-Python replica of ahash_media's integer pipeline."""
    import numpy as np

    gray = px.astype(np.int64).sum(axis=2) // 3
    h, w = gray.shape
    cells = gray[np.ix_((np.arange(8) * h) // 8, (np.arange(8) * w) // 8)]
    mean = int(cells.sum()) // 64
    val = 0
    for j, b in enumerate((cells > mean).ravel()):
        if b:
            val |= 1 << j
    return val - (1 << 64) if val >= 1 << 63 else val


def _media_row(doc_id, px):
    from delta_lake_proxy_spark.functions import multimodal as M

    payload = M.encode_ppm(px)
    return (
        doc_id,
        payload,
        {
            "modality": "image",
            "n_bytes": len(payload),
            "width": px.shape[1],
            "height": px.shape[0],
            "sample_rate": None,
        },
    )


_MEDIA_SCHEMA = (
    "doc_id long, media_bytes binary, "
    "media_meta struct<modality string, n_bytes long, width int, "
    "height int, sample_rate int>"
)


def test_ahash_matches_python_oracle(spark):
    import numpy as np

    from delta_lake_proxy_spark.functions import multimodal as M

    rng = np.random.RandomState(7)
    imgs = {i: rng.randint(0, 256, (24, 32, 3), dtype=np.uint8) for i in range(5)}
    rows = [_media_row(i, px) for i, px in imgs.items()]
    # a non-image row must be omitted
    rows.append((99, b"\x00\x01", {"modality": "audio", "n_bytes": 2,
                                   "width": None, "height": None,
                                   "sample_rate": 16000}))
    media = spark.createDataFrame(rows, _MEDIA_SCHEMA)
    got = {r["doc_id"]: r["ahash"] for r in M.ahash_media(media).collect()}
    assert set(got) == set(imgs)
    for i, px in imgs.items():
        assert got[i] == _ahash_oracle(px), i


def test_image_near_duplicates(spark):
    """A lightly-perturbed copy pairs with its source at small Hamming
    distance; unrelated random images do not pair."""
    import numpy as np

    from delta_lake_proxy_spark.functions import multimodal as M

    rng = np.random.RandomState(11)
    base = rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
    near = base.copy()
    near[:3, :3, :] = 255  # small corner overlay: few aHash bits flip
    far = rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [_media_row(1, base), _media_row(2, near), _media_row(3, far)],
        _MEDIA_SCHEMA,
    )
    exp_h = bin(
        (_ahash_oracle(base) ^ _ahash_oracle(near)) & ((1 << 64) - 1)
    ).count("1")
    assert exp_h <= 8  # the perturbation is genuinely small
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in M.image_near_duplicates(media, max_hamming=8).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == exp_h
    assert not any(3 in p for p in pairs)


def _audio_hash_oracle(samples):
    import numpy as np

    mag = np.abs(samples.astype(np.int64))
    n = mag.shape[0]
    total = int(mag.sum())
    bounds = (np.arange(65) * n) // 64
    val = 0
    for j in range(64):
        seg = mag[bounds[j]: bounds[j + 1]]
        if int(seg.sum()) * n > total * len(seg):
            val |= 1 << j
    return val - (1 << 64) if val >= 1 << 63 else val


def _audio_row(doc_id, samples, sr=16000):
    from delta_lake_proxy_spark.functions import multimodal as M

    payload = M.encode_wav_pcm16(samples, sr)
    return (
        doc_id,
        payload,
        {"modality": "audio", "n_bytes": len(payload), "width": None,
         "height": None, "sample_rate": sr},
    )


def test_audio_hash_scale_invariant_and_oracle(spark):
    """The energy-profile hash equals the Python oracle, a half-gain copy
    hashes IDENTICALLY (scale invariance), and short/non-audio rows are
    omitted."""
    import numpy as np

    from delta_lake_proxy_spark.functions import multimodal as M

    rng = np.random.RandomState(3)
    clip = (rng.randn(4000) * 8000).clip(-32768, 32767).astype(np.int16)
    half = (clip.astype(np.int32) // 2).astype(np.int16)
    rows = [
        _audio_row(1, clip),
        _audio_row(2, half),
        _audio_row(3, np.zeros(10, dtype=np.int16)),  # < 64 samples: omitted
    ]
    rows.append((99, b"ppm", {"modality": "image", "n_bytes": 3,
                              "width": 1, "height": 1, "sample_rate": None}))
    media = spark.createDataFrame(rows, _MEDIA_SCHEMA)
    got = {r["doc_id"]: r["audio_hash"] for r in M.audio_hash_media(media).collect()}
    assert set(got) == {1, 2}
    assert got[1] == _audio_hash_oracle(clip)
    # halving int16 amplitudes rounds toward zero, which can flip a
    # borderline frame; the profile must stay NEARLY identical
    diff = bin((got[1] ^ got[2]) & ((1 << 64) - 1)).count("1")
    assert diff <= 2
    assert got[2] == _audio_hash_oracle(half)


def test_audio_near_duplicates(spark):
    import numpy as np

    from delta_lake_proxy_spark.functions import multimodal as M

    rng = np.random.RandomState(5)
    clip = (rng.randn(4000) * 8000).clip(-32768, 32767).astype(np.int16)
    regained = (clip.astype(np.int32) * 3 // 4).astype(np.int16)
    other = (rng.randn(4000) * 8000).clip(-32768, 32767).astype(np.int16)
    media = spark.createDataFrame(
        [_audio_row(1, clip), _audio_row(2, regained), _audio_row(3, other)],
        _MEDIA_SCHEMA,
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in M.audio_near_duplicates(media, max_hamming=8).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 4
    assert not any(3 in p for p in pairs)


def _video_row(doc_id, y, cb, cr):
    from delta_lake_proxy_spark.functions import multimodal as M

    payload = M.encode_y4m(y, cb, cr, colorspace="C444")
    return (
        doc_id,
        payload,
        {"modality": "video", "n_bytes": len(payload), "width": y.shape[2],
         "height": y.shape[1], "sample_rate": None},
    )


def test_video_frame_hashes_and_near_duplicates(spark):
    """Per-frame luma hashes equal the shared ahash64_gray oracle; a
    re-cut copy sharing most frames pairs, an unrelated video does not;
    stride sampling and non-video omission hold."""
    import numpy as np

    from delta_lake_proxy_spark.functions import multimodal as M

    rng = np.random.RandomState(13)

    def vid(frames):
        y = np.stack(frames)
        n, h, w = y.shape
        c = rng.randint(0, 256, (n, h, w), dtype=np.uint8)
        return y, c, c.copy()

    frames = [rng.randint(0, 256, (16, 16), dtype=np.uint8) for _ in range(6)]
    base = vid(frames)
    recut = vid(frames[1:5] + [rng.randint(0, 256, (16, 16), dtype=np.uint8)])
    other = vid([rng.randint(0, 256, (16, 16), dtype=np.uint8) for _ in range(6)])
    media = spark.createDataFrame(
        [_video_row(1, *base), _video_row(2, *recut), _video_row(3, *other)],
        _MEDIA_SCHEMA,
    )
    fh = {(r["doc_id"], r["frame_idx"]): r["fhash"]
          for r in M.video_frame_hashes(media).collect()}
    assert len([k for k in fh if k[0] == 1]) == 6
    for fi in range(6):
        assert fh[(1, fi)] == M.ahash64_gray(frames[fi].astype("int64")), fi
    # stride skips frames
    assert len([r for r in M.video_frame_hashes(media, stride=2).collect()
                if r["doc_id"] == 1]) == 3
    pairs = {(r["id_a"], r["id_b"]): r["shared_frames"]
             for r in M.video_near_duplicates(media, min_shared_frames=3).collect()}
    assert pairs == {(1, 2): 4}  # frames 1..4 of base reappear in the recut
    with pytest.raises(ValueError):
        M.video_frame_hashes(media, stride=0)


def test_perceptual_hashes_string_ids_and_exact_match(spark):
    """String doc ids flow through every perceptual hasher unchanged, and
    max_hamming=0 (exact fingerprint match, the bands=1 degenerate case)
    works instead of crashing on the 2^64-1 mask literal."""
    import numpy as np

    from delta_lake_proxy_spark.functions import multimodal as M

    rng = np.random.RandomState(17)
    px = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    schema = (
        "doc_id string, media_bytes binary, "
        "media_meta struct<modality string, n_bytes long, width int, "
        "height int, sample_rate int>"
    )
    payload = M.encode_ppm(px)
    meta = {"modality": "image", "n_bytes": len(payload), "width": 16,
            "height": 16, "sample_rate": None}
    media = spark.createDataFrame(
        [("img-a", payload, meta), ("img-b", payload, meta)], schema
    )
    got = {r["doc_id"]: r["ahash"] for r in M.ahash_media(media).collect()}
    assert set(got) == {"img-a", "img-b"} and got["img-a"] == got["img-b"]
    pairs = M.image_near_duplicates(media, max_hamming=0).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [
        ("img-a", "img-b", 0)
    ]


# -- persisted perceptual-hash indexes: incremental media dedup (round 13) ----


def test_image_incremental_index_survives_corpus_corruption(spark):
    """Daily image ingest pairs against the persisted aHash index with the
    corpus media NEVER re-decoded — proven the hard way: after the index
    is built, the corpus payloads are replaced with garbage that would
    CRASH decode_ppm, the batch pairer on that union dies, and the
    incremental path still returns the exact pairs."""
    import numpy as np
    import pytest as _pytest

    from delta_lake_proxy_spark.functions import multimodal as M

    rng = np.random.RandomState(11)
    base = rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
    near = base.copy()
    near[:3, :3, :] = 255
    far = rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
    corpus = spark.createDataFrame(
        [_media_row(1, base), _media_row(3, far)], _MEDIA_SCHEMA
    )
    index = M.image_hash_index(corpus, max_hamming=8)
    index = spark.createDataFrame(index.collect(), index.schema)  # persisted
    new = spark.createDataFrame([_media_row(2, near)], _MEDIA_SCHEMA)
    exp_h = bin(
        (_ahash_oracle(base) ^ _ahash_oracle(near)) & ((1 << 64) - 1)
    ).count("1")
    got = {
        (r["new_id"], r["indexed_id"]): r["hamming"]
        for r in M.image_near_duplicates_incremental(new, index, max_hamming=8).collect()
    }
    assert got == {(2, 1): exp_h}
    # equality with the batch pairer's cross pairs on the (valid) union
    cross = {
        (max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"])): r["hamming"]
        for r in M.image_near_duplicates(corpus.union(new), max_hamming=8).collect()
        if 2 in (r["id_a"], r["id_b"])
    }
    assert cross == got
    # corrupt the corpus payloads: a rescanning implementation would crash
    corrupted = corpus.withColumn("media_bytes", F.lit(b"\x89not-a-ppm"))
    with _pytest.raises(Exception):
        M.image_near_duplicates(corrupted.union(new), max_hamming=8).collect()
    got2 = {
        (r["new_id"], r["indexed_id"]): r["hamming"]
        for r in M.image_near_duplicates_incremental(new, index, max_hamming=8).collect()
    }
    assert got2 == got  # the index, not the media, is the corpus contract


def test_audio_incremental_index(spark):
    """Audio energy-profile dedup via the persisted Hamming index: the
    re-gained copy in a new batch pairs with its indexed source; fresh
    content does not; distances equal the batch pairer's."""
    import numpy as np

    from delta_lake_proxy_spark.functions import multimodal as M

    rng = np.random.RandomState(5)
    clip = (rng.randn(4000) * 8000).clip(-32768, 32767).astype(np.int16)
    regained = (clip.astype(np.int32) * 3 // 4).astype(np.int16)
    other = (rng.randn(4000) * 8000).clip(-32768, 32767).astype(np.int16)
    corpus = spark.createDataFrame(
        [_audio_row(1, clip), _audio_row(3, other)], _MEDIA_SCHEMA
    )
    index = M.audio_hash_index(corpus, max_hamming=8)
    new = spark.createDataFrame([_audio_row(2, regained)], _MEDIA_SCHEMA)
    got = {
        (r["new_id"], r["indexed_id"]): r["hamming"]
        for r in M.audio_near_duplicates_incremental(new, index, max_hamming=8).collect()
    }
    assert set(got) == {(2, 1)} and got[(2, 1)] <= 4
    cross = {
        (max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"])): r["hamming"]
        for r in M.audio_near_duplicates(corpus.union(new), max_hamming=8).collect()
        if 2 in (r["id_a"], r["id_b"])
    }
    assert cross == got


def test_video_incremental_frame_hash_index(spark):
    """Video dedup via the persisted frame-fingerprint index: a re-cut in
    the new batch pairs with its indexed source on shared distinct frame
    hashes (count equal to the batch pairer's), fresh content does not,
    and the hot-frame guard drops non-discriminative frames from
    pairing."""
    import numpy as np

    from delta_lake_proxy_spark.functions import multimodal as M

    rng = np.random.RandomState(13)

    def vid(frames):
        y = np.stack(frames)
        n, h, w = y.shape
        c = rng.randint(0, 256, (n, h, w), dtype=np.uint8)
        return y, c, c.copy()

    frames = [rng.randint(0, 256, (16, 16), dtype=np.uint8) for _ in range(6)]
    base = vid(frames)
    recut = vid(frames[1:5] + [rng.randint(0, 256, (16, 16), dtype=np.uint8)])
    other = vid([rng.randint(0, 256, (16, 16), dtype=np.uint8) for _ in range(6)])
    corpus = spark.createDataFrame(
        [_video_row(1, *base), _video_row(3, *other)], _MEDIA_SCHEMA
    )
    index = M.video_frame_hash_index(corpus)
    assert index.columns == ["doc_id", "fhash"]
    new = spark.createDataFrame([_video_row(2, *recut)], _MEDIA_SCHEMA)
    got = {
        (r["new_id"], r["indexed_id"]): r["shared_frames"]
        for r in M.video_near_duplicates_incremental(
            new, index, min_shared_frames=3
        ).collect()
    }
    assert got == {(2, 1): 4}  # frames 1..4 of base reappear in the recut
    # hot-frame guard: a frame hash in MORE than max_bucket_size indexed
    # videos stops counting — the shared static frame alone cannot pair
    static = rng.randint(0, 256, (16, 16), dtype=np.uint8)
    hot_corpus = spark.createDataFrame(
        [
            _video_row(i, *vid([static,
                                rng.randint(0, 256, (16, 16), dtype=np.uint8)]))
            for i in (10, 11, 12)
        ],
        _MEDIA_SCHEMA,
    )
    hot_index = M.video_frame_hash_index(hot_corpus)
    probe = spark.createDataFrame(
        [_video_row(20, *vid([static,
                              rng.randint(0, 256, (16, 16), dtype=np.uint8)]))],
        _MEDIA_SCHEMA,
    )
    guarded = M.video_near_duplicates_incremental(
        probe, hot_index, min_shared_frames=1, max_bucket_size=2
    ).count()
    assert guarded == 0  # the only shared hash is hot -> excluded
    open_ = {
        (r["new_id"], r["indexed_id"])
        for r in M.video_near_duplicates_incremental(
            probe, hot_index, min_shared_frames=1, max_bucket_size=None
        ).collect()
    }
    assert open_ == {(20, 10), (20, 11), (20, 12)}
