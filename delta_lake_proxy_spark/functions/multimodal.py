"""Multimodal column plumbing (charter X5).

Images/audio/video are opaque ``binary`` columns travelling next to a typed
metadata struct. The Spark-side plumbing — schema, Arrow batch shape,
``mapInPandas`` signature, partition sizing — is real and tested.

Decode status: ``decode_stub=True`` produces a deterministic fake feature
vector (byte-histogram moments) for any payload. ``decode_stub=False`` runs
REAL decoders for one public uncompressed container per modality, all pure
numpy chunk/header parsers needing no codec libraries: WAV (RIFF PCM16,
:func:`decode_wav_pcm16`) for audio, binary PPM (P6, :func:`decode_ppm`)
for images, and YUV4MPEG2 (:func:`decode_y4m`, with stride frame-sampling)
for video. Compressed formats (JPEG/MP3/H.264/...) are rejected by the
container parsers with ``ValueError`` — decoding them genuinely requires
codec libraries absent from this environment.

Scale notes: binary payloads ride the normal columnar path (Parquet binary),
and feature extraction is an Arrow-batched ``mapInPandas`` — one Python worker
pass per partition, no per-row UDF calls. Partition sizing for ~MB-scale blobs
should come from ``spark.sql.files.maxPartitionBytes``, not row counts.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MODALITIES = ("image", "audio", "video")

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


# ---------------------------------------------------------------------------
# Real decoders: RIFF/WAVE PCM16 and binary PPM (P6) — pure numpy/stdlib,
# public formats (RIFF spec / netpbm spec), no codec libraries.
# ---------------------------------------------------------------------------


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Minimal mono RIFF/WAVE PCM16 encoder (fixture builder for the decoder
    round-trip; the byte layout follows the public RIFF/WAVE spec)."""
    import struct

    data = np.asarray(samples).astype("<i2").tobytes()
    n = len(data)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + n)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", n)
        + data
    )


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE chunk walker for uncompressed PCM16: validates the RIFF/WAVE
    container, walks word-aligned chunks to find ``fmt `` and ``data``, and
    returns (samples as float64 — multi-channel averaged to mono, sample_rate).
    Raises ValueError for non-WAV payloads or non-PCM16 encodings."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, data, sample_rate, n_channels = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt = int.from_bytes(body[0:2], "little")
            n_channels = int.from_bytes(body[2:4], "little")
            sample_rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"only PCM16 is supported (format={audio_fmt}, bits={bits})"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if data is None or sample_rate is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data[: len(data) - (len(data) % 2)], dtype="<i2")
    if n_channels and n_channels > 1:
        samples = samples[: len(samples) - (len(samples) % n_channels)]
        samples = samples.reshape(-1, n_channels).mean(axis=1)
    return samples.astype(np.float64), int(sample_rate)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """Binary PPM (P6) encoder for (h, w, 3) uint8 pixel arrays."""
    h, w = pixels.shape[0], pixels.shape[1]
    return f"P6\n{w} {h}\n255\n".encode("ascii") + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) parser: magic, whitespace/comment-tolerant header
    (width, height, maxval), then raw RGB bytes -> (h, w, 3) uint8."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end-of-line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported (got {maxval})")
    need = w * h * 3
    raster = np.frombuffer(payload[pos : pos + need], dtype=np.uint8)
    if raster.size != need:
        raise ValueError("truncated PPM raster")
    return raster.reshape(h, w, 3)


def encode_y4m(
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "C444",
) -> bytes:
    """YUV4MPEG2 encoder (fixture builder for the decoder round-trip; the
    layout follows the public yuv4mpeg spec): stream header with W/H/F/C
    tags, then per-frame ``FRAME\\n`` + planar Y, Cb, Cr bytes. ``y`` is
    (n_frames, h, w) uint8; ``cb``/``cr`` carry the chroma planes at the
    subsampling the colorspace implies ((h, w) for C444, (h/2, w/2) for
    C420 variants)."""
    n, h, w = y.shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 {colorspace}\n".encode("ascii")]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(y[i].astype(np.uint8).tobytes())
        out.append(cb[i].astype(np.uint8).tobytes())
        out.append(cr[i].astype(np.uint8).tobytes())
    return b"".join(out)


def _y4m_chroma_shape(colorspace: str, h: int, w: int) -> tuple[int, int]:
    cs = colorspace.lstrip("C")
    if cs.startswith("420"):
        return h // 2, w // 2
    if cs.startswith("422"):
        return h, w // 2
    if cs.startswith("444"):
        return h, w
    if cs == "mono":
        return 0, 0
    raise ValueError(f"unsupported Y4M colorspace {colorspace!r}")


def decode_y4m(
    payload: bytes,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, tuple[int, int]]:
    """YUV4MPEG2 parser: validates the ``YUV4MPEG2`` magic, reads the tagged
    stream header (W/H/F/C — C defaults to 420jpeg per the spec), then walks
    ``FRAME`` headers collecting planar frames. Returns
    ``(y (n,h,w) uint8, cb, cr, (fps_num, fps_den))``; chroma arrays are at
    the container's subsampling (empty for mono). Raises ValueError for
    non-Y4M payloads, unknown colorspaces, or truncated rasters."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    fps = (25, 1)
    colorspace = "C420jpeg"
    for tag in payload[9:nl].split():
        k, v = tag[:1], tag[1:].decode("ascii", "replace")
        if k == b"W":
            w = int(v)
        elif k == b"H":
            h = int(v)
        elif k == b"F":
            num, den = v.split(":")
            fps = (int(num), int(den))
        elif k == b"C":
            colorspace = tag.decode("ascii")
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    ch, cw = _y4m_chroma_shape(colorspace, h, w)
    y_sz, c_sz = h * w, ch * cw
    ys, cbs, crs, pos = [], [], [], nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed Y4M frame header")
        pos = fnl + 1
        end = pos + y_sz + 2 * c_sz
        if end > len(payload):
            raise ValueError("truncated Y4M raster")
        ys.append(np.frombuffer(payload[pos : pos + y_sz], np.uint8).reshape(h, w))
        cbs.append(
            np.frombuffer(payload[pos + y_sz : pos + y_sz + c_sz], np.uint8).reshape(ch, cw)
        )
        crs.append(np.frombuffer(payload[pos + y_sz + c_sz : end], np.uint8).reshape(ch, cw))
        pos = end
    return np.array(ys), np.array(cbs), np.array(crs), fps


def _wav_features(payload: bytes, n_features: int) -> list[float]:
    """Exact integer features from decoded PCM16 samples — every value is an
    integer representable in float64, so an external SQL oracle recomputes
    them bit-identically (no float rounding anywhere)."""
    samples, sr = decode_wav_pcm16(payload)
    a = samples.astype(np.int64)
    feats = [
        float(a.size),
        float(a.sum()),
        float((a * a).sum()),
        float(a.min()) if a.size else 0.0,
        float(a.max()) if a.size else 0.0,
        float(sr),
    ]
    return (feats + [0.0] * n_features)[:n_features]


def _ppm_features(payload: bytes, n_features: int) -> list[float]:
    px = decode_ppm(payload).astype(np.int64)
    feats = [
        float(px.shape[1]),  # width
        float(px.shape[0]),  # height
        float(px[:, :, 0].sum()),
        float(px[:, :, 1].sum()),
        float(px[:, :, 2].sum()),
    ]
    return (feats + [0.0] * n_features)[:n_features]


# every VIDEO_FRAME_STEP-th frame enters the video features — the standard
# frame-sampling step of a training pipeline (decode all, featurize a stride)
VIDEO_FRAME_STEP = 2


def _y4m_features(payload: bytes, n_features: int) -> list[float]:
    """Exact integer features from decoded Y4M luma: frame count, sampled
    frame count (every VIDEO_FRAME_STEP-th frame), and the sampled frames'
    luma sum / sum-of-squares — all integers exactly representable in
    float64, so an external SQL oracle recomputes them bit-identically."""
    y, _cb, _cr, fps = decode_y4m(payload)
    sampled = y[::VIDEO_FRAME_STEP].astype(np.int64)
    feats = [
        float(y.shape[0]),
        float(sampled.shape[0]),
        float(sampled.sum()),
        float((sampled * sampled).sum()),
        float(y.shape[2]),  # width
        float(fps[0]),
    ]
    return (feats + [0.0] * n_features)[:n_features]


def attach_media(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic opaque binary payload + typed metadata struct
    from each document (the fixture has no real media; payload bytes are the
    utf-8 text — an opaque stand-in exercising the binary column path).
    Modality is ``id % 3``-derived so an external SQL oracle can reproduce
    the per-modality rollup."""
    payload = F.encode(F.col(text_col), "utf-8")
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.pmod(F.col(id_col), F.lit(len(MODALITIES))) + 1).cast("int"),
    )
    meta = F.struct(
        modality.alias("modality"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.when(modality == "image", (F.pmod(F.xxhash64(F.col(id_col), F.lit(1)), F.lit(1920)) + 1).cast("int")).alias("width"),
        F.when(modality == "image", (F.pmod(F.xxhash64(F.col(id_col), F.lit(2)), F.lit(1080)) + 1).cast("int")).alias("height"),
        F.when(modality == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
    )
    return docs.select(
        F.col(id_col),
        payload.alias("media_bytes"),
        meta.alias("media_meta"),
    )


def extract_features(
    media: DataFrame, n_features: int = 8, decode_stub: bool = True
) -> DataFrame:
    """Arrow-batched feature extraction over (media_bytes, media_meta).

    With ``decode_stub=True`` the "decoder" computes a deterministic fake
    feature vector (byte-histogram moments) so the full pipeline — schema,
    batching, partitioning — is exercised on any payload. With
    ``decode_stub=False`` payloads are REALLY decoded: audio via the pure
    RIFF/PCM16 parser, images via the binary-PPM parser, video via the
    YUV4MPEG2 parser (luma features over a VIDEO_FRAME_STEP frame stride);
    compressed codecs are rejected by the container parsers (ValueError) —
    those formats need codec libraries absent from this environment.
    """

    def _decode(payload: bytes, modality: str) -> list[float]:
        if not decode_stub:
            if modality == "audio":
                return _wav_features(payload, n_features)
            if modality == "image":
                return _ppm_features(payload, n_features)
            if modality == "video":
                return _y4m_features(payload, n_features)
            raise NotImplementedError(
                f"real {modality!r} decode requires codec libraries not present "
                "in this environment (WAV/PCM16 audio, PPM images, and Y4M "
                "video have dependency-free decoders)"
            )
        if not payload:
            return [0.0] * n_features
        # deterministic fake features: strided byte-value means, vectorized
        # (np.frombuffer is zero-copy; uint8 sums are exact in float64, so
        # values are identical to the scalar formulation)
        arr = np.frombuffer(payload, dtype=np.uint8)
        return [
            round(float(arr[j::n_features].mean()), 6) if arr[j::n_features].size else 0.0
            for j in range(n_features)
        ]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["modality"] for m in pdf["media_meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["media_meta"]],
                    "feature": [
                        _decode(b, m["modality"])
                        for b, m in zip(pdf["media_bytes"], pdf["media_meta"])
                    ],
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_media(
    media: DataFrame, out_w: int, out_h: int
) -> DataFrame:
    """Charter X5 *resize*: nearest-neighbor downscale/upscale of every
    IMAGE payload (binary PPM) to ``(out_h, out_w)``; audio/video/other
    modalities pass through byte-identical. ONE Arrow-batched
    ``mapInPandas`` pass — the schema is unchanged (payload replaced,
    ``width``/``height``/``n_bytes`` metadata updated), so resizes compose
    with :func:`extract_features` and further pipeline stages.

    Nearest-neighbor (``src_idx = (dst_idx * src_dim) // dst_dim``) is
    chosen deliberately: it is exact integer arithmetic, deterministic
    across platforms, and reproducible by an external oracle; smoother
    kernels (bilinear/Lanczos) need codec/image libraries absent from this
    environment and are the documented NotImplementedError edge alongside
    compressed codecs."""
    # fail at PLAN time, not inside an executor task: zero/negative targets
    # would encode degenerate PPMs while media_meta claims the requested
    # dimensions, surfacing only in downstream decoders
    if int(out_w) < 1 or int(out_h) < 1:
        raise ValueError(
            f"resize_media target must be >= 1x1, got {out_w}x{out_h}"
        )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, metas = [], []
            for b, m in zip(pdf["media_bytes"], pdf["media_meta"]):
                if m["modality"] != "image":
                    payloads.append(b)
                    metas.append(m)
                    continue
                px = decode_ppm(bytes(b))
                rows = (np.arange(out_h, dtype=np.int64) * px.shape[0]) // out_h
                cols = (np.arange(out_w, dtype=np.int64) * px.shape[1]) // out_w
                out = encode_ppm(px[rows][:, cols])
                m2 = dict(m)
                m2["width"], m2["height"], m2["n_bytes"] = out_w, out_h, len(out)
                payloads.append(out)
                metas.append(m2)
            out_pdf = pdf.copy()
            out_pdf["media_bytes"] = payloads
            out_pdf["media_meta"] = metas
            yield out_pdf

    return media.mapInPandas(gen, schema=media.schema)


def resample_media(media: DataFrame, factor: int) -> DataFrame:
    """Charter X5 *audio resample*: integer-factor DECIMATION of every AUDIO
    payload (RIFF PCM16 WAV) — keep every ``factor``-th sample and rewrite
    the header at ``sample_rate // factor``; image/video/other modalities
    pass through byte-identical. ONE Arrow-batched ``mapInPandas`` pass with
    an unchanged schema (payload replaced, ``sample_rate``/``n_bytes`` meta
    updated), composing with :func:`extract_features` exactly like
    :func:`resize_media`.

    Plain decimation (no anti-alias filter) is chosen deliberately: exact
    integer arithmetic an external oracle reproduces sample-for-sample;
    filtered resampling needs DSP libraries absent from this environment
    (documented alongside the compressed-codec NotImplementedError edge)."""
    if int(factor) < 1:
        raise ValueError(f"resample_media factor must be >= 1, got {factor}")
    factor = int(factor)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, metas = [], []
            for b, m in zip(pdf["media_bytes"], pdf["media_meta"]):
                if m["modality"] != "audio":
                    payloads.append(b)
                    metas.append(m)
                    continue
                samples, rate = decode_wav_pcm16(bytes(b))
                out = encode_wav_pcm16(
                    samples[::factor].astype(np.int16), max(1, rate // factor)
                )
                m2 = dict(m)
                m2["sample_rate"] = max(1, int(rate) // factor)
                m2["n_bytes"] = len(out)
                payloads.append(out)
                metas.append(m2)
            out_pdf = pdf.copy()
            out_pdf["media_bytes"] = payloads
            out_pdf["media_meta"] = metas
            yield out_pdf

    return media.mapInPandas(gen, schema=media.schema)


def synth_wav_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    n_samples: int = 256,
    sample_rate: int = 16000,
) -> DataFrame:
    """Deterministic synthetic PCM16 WAV payload per document id, built
    executor-side via Arrow ``mapInPandas``. Sample k of doc d is the PUBLIC
    formula ``((d*31 + k*7) mod 65536) - 32768`` so an external SQL oracle can
    recompute any feature of the decoded samples independently — certifying
    the full encode -> RIFF bytes -> parse round-trip."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = np.arange(n_samples, dtype=np.int64)
        for pdf in it:
            ids = pdf[id_col].to_numpy()
            payloads = [
                encode_wav_pcm16(
                    (((int(d) * 31 + k * 7) % 65536) - 32768).astype(np.int16),
                    sample_rate,
                )
                for d in ids
            ]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "media_bytes": payloads,
                    "media_meta": [
                        {
                            "modality": "audio",
                            "n_bytes": len(p),
                            "width": None,
                            "height": None,
                            "sample_rate": sample_rate,
                        }
                        for p in payloads
                    ],
                }
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("media_bytes", T.BinaryType()),
            T.StructField("media_meta", MEDIA_META_SCHEMA),
        ]
    )
    return docs.mapInPandas(gen, schema=schema)


def synth_media_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    n_samples: int = 256,
    sample_rate: int = 16000,
    img_w: int = 8,
    img_h: int = 8,
    n_frames: int = 6,
) -> DataFrame:
    """Deterministic synthetic payload per document in its ``id % 3``
    modality (image / audio / video — same assignment as
    :func:`attach_media`), built in ONE corpus scan / one ``mapInPandas``
    pass (no per-modality union re-reading the input). All three payload
    formulas are PUBLIC so an external SQL oracle can recompute any feature
    of the decoded media independently:

    - image, PPM pixel (row y, col x, channel c):  (d*11 + y*5 + x*3 + c*7) % 256
    - audio, PCM16 sample k:                      ((d*31 + k*7) % 65536) - 32768
    - video, Y4M luma pixel (frame f, row y, col x): (d*7 + f*13 + y*3 + x) % 256
      (chroma planes (d + f + y + x) % 256 / (d*5 + f*3 + y + x) % 256 ride
      the container but carry no feature)
    """

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        k = np.arange(n_samples, dtype=np.int64)
        yy, xx = np.meshgrid(
            np.arange(img_h, dtype=np.int64), np.arange(img_w, dtype=np.int64), indexing="ij"
        )
        ff = np.arange(n_frames, dtype=np.int64)[:, None, None]
        for pdf in it:
            ids = pdf[id_col].to_numpy()
            payloads, metas = [], []
            for d in ids:
                d = int(d)
                m = MODALITIES[d % 3]
                if m == "image":
                    px = np.stack(
                        [(d * 11 + yy * 5 + xx * 3 + c * 7) % 256 for c in range(3)], axis=-1
                    ).astype(np.uint8)
                    p = encode_ppm(px)
                    meta = {"modality": m, "n_bytes": len(p), "width": img_w,
                            "height": img_h, "sample_rate": None}
                elif m == "audio":
                    p = encode_wav_pcm16(
                        (((d * 31 + k * 7) % 65536) - 32768).astype(np.int16), sample_rate
                    )
                    meta = {"modality": m, "n_bytes": len(p), "width": None,
                            "height": None, "sample_rate": sample_rate}
                else:
                    y = ((d * 7 + ff * 13 + yy * 3 + xx) % 256).astype(np.uint8)
                    cb = ((d + ff + yy + xx) % 256).astype(np.uint8)
                    cr = ((d * 5 + ff * 3 + yy + xx) % 256).astype(np.uint8)
                    p = encode_y4m(y, cb, cr, fps=(25, 1), colorspace="C444")
                    meta = {"modality": m, "n_bytes": len(p), "width": img_w,
                            "height": img_h, "sample_rate": None}
                payloads.append(p)
                metas.append(meta)
            yield pd.DataFrame(
                {"doc_id": ids, "media_bytes": payloads, "media_meta": metas}
            )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("media_bytes", T.BinaryType()),
            T.StructField("media_meta", MEDIA_META_SCHEMA),
        ]
    )
    return docs.mapInPandas(gen, schema=schema)


def multimodal_summary(features: DataFrame) -> DataFrame:
    """Per-modality rollup of the extracted features (exercises the full
    attach -> extract -> aggregate pipeline)."""
    f0 = F.element_at("feature", 1)
    return (
        features.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            # decimal accumulation: bit-stable under any partitioning, so the
            # rollup hash-compares clean against an external oracle
            F.round(
                F.sum(f0.cast("decimal(27,9)")).cast("double") / F.count(f0), 6
            ).alias("avg_f0"),
        )
        .orderBy("modality")
    )


def ahash64_gray(gray: "np.ndarray") -> int:
    """64-bit average hash of a 2-D integer grayscale plane: integer
    nearest-neighbor 8x8 downscale (``src = dst * dim // 8``), bit set
    when the cell is STRICTLY above the 8x8 integer mean, packed
    row-major (bit 0 = top-left) into a signed long. All-integer —
    bit-reproducible on any platform. Shared by image aHash and the
    per-frame video hash."""
    h, w = gray.shape
    cells = gray[np.ix_((np.arange(8) * h) // 8, (np.arange(8) * w) // 8)]
    mean = int(cells.sum()) // 64
    val = 0
    for j, b in enumerate((cells > mean).ravel()):
        if b:
            val |= 1 << j
    return val - (1 << 64) if val >= 1 << 63 else val


def _carry_schema(media: DataFrame, carry_cols) -> str:
    """Schema fragment for columns riding through a media hash pass
    (per-doc constants, e.g. the source's partition columns — folding
    them through the Arrow pass keeps index builds at ONE corpus scan)."""
    return "".join(
        f", `{c}` {media.schema[c].dataType.simpleString()}" for c in carry_cols
    )


def ahash_media(
    media: DataFrame,
    id_col: str = "doc_id",
    carry_cols: "tuple[str, ...] | list[str]" = (),
) -> DataFrame:
    """Perceptual average-hash (aHash) of every IMAGE payload: decode the
    PPM, grayscale by exact integer mean ``(r + g + b) // 3``, downscale
    to 8x8 with the same integer nearest-neighbor arithmetic as
    :func:`resize_media` (``src = dst * src_dim // 8``), threshold each
    cell STRICTLY ABOVE the 8x8 integer mean, and pack the 64 bits
    (row-major, bit 0 = top-left) into one signed long. All-integer, so
    the hash is bit-reproducible on any platform. Non-image rows are
    omitted. ONE Arrow-batched ``mapInPandas`` pass.

    A near-identical image (re-encode, small overlay, slight crop)
    flips few bits; pair detection is Hamming distance over these
    hashes — see :func:`image_near_duplicates`. The id column keeps the
    corpus's own type (string ids work like numeric ones); ``carry_cols``
    pass through per kept row.
    """
    id_type = media.schema[id_col].dataType.simpleString()
    carry = list(carry_cols)
    out_schema = f"{id_col} {id_type}{_carry_schema(media, carry)}, ahash long"

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            keep, hashes = [], []
            for i, (b, m) in enumerate(zip(pdf["media_bytes"], pdf["media_meta"])):
                if m["modality"] != "image":
                    continue
                px = decode_ppm(bytes(b))  # (h, w, 3) uint8
                gray = px.astype(np.int64).sum(axis=2) // 3  # (h, w)
                keep.append(i)
                hashes.append(ahash64_gray(gray))
            out = pdf.iloc[keep][[id_col, *carry]].reset_index(drop=True)
            out["ahash"] = pd.Series(hashes, dtype="int64")
            yield out

    return media.mapInPandas(gen, out_schema)


def image_near_duplicates(
    media: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 8,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Near-duplicate IMAGE pairs by perceptual-hash Hamming distance:
    :func:`ahash_media` fingerprints (one Arrow pass over the binary
    column), then the generic 64-bit pigeonhole banding + exact popcount
    verify of ``dedup.hamming_near_duplicates`` — the image analog of
    SimHash text near-dup, riding the identical candidate machinery
    (salted buckets, recall guarantee for ``max_hamming < bands``).
    Output: (id_a, id_b, hamming)."""
    from .dedup import hamming_near_duplicates

    sigs = ahash_media(media, id_col=id_col)
    return hamming_near_duplicates(
        sigs,
        id_col=id_col,
        sig_col="ahash",
        max_hamming=max_hamming,
        max_bucket_size=max_bucket_size,
    )


def audio_hash_media(
    media: DataFrame,
    id_col: str = "doc_id",
    carry_cols: "tuple[str, ...] | list[str]" = (),
) -> DataFrame:
    """Perceptual energy-profile hash of every AUDIO payload: decode the
    WAV, split the samples into 64 contiguous frames (``start = j * n //
    64``), and set bit ``j`` when frame ``j``'s mean absolute amplitude
    exceeds the overall mean — compared exactly via integer
    cross-multiplication (``frame_sum * n_total > total_sum * n_frame``),
    so the hash is bit-reproducible AND amplitude-scale-invariant (both
    sides scale together; a re-gained copy of the same clip hashes
    identically). Audio shorter than 64 samples and non-audio rows are
    omitted. ONE Arrow pass; pair detection via
    :func:`audio_near_duplicates`. The id column keeps the corpus's own
    type; ``carry_cols`` pass through per kept row."""
    id_type = media.schema[id_col].dataType.simpleString()
    carry = list(carry_cols)
    out_schema = f"{id_col} {id_type}{_carry_schema(media, carry)}, audio_hash long"

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            keep, hashes = [], []
            for i, (b, m) in enumerate(zip(pdf["media_bytes"], pdf["media_meta"])):
                if m["modality"] != "audio":
                    continue
                samples, _sr = decode_wav_pcm16(bytes(b))
                n = samples.shape[0]
                if n < 64:
                    continue
                mag = np.abs(samples.astype(np.int64))
                total = int(mag.sum())
                bounds = (np.arange(65) * n) // 64
                val = 0
                for j in range(64):
                    seg = mag[bounds[j] : bounds[j + 1]]
                    # exact integer compare of seg mean vs overall mean
                    if int(seg.sum()) * n > total * seg.shape[0]:
                        val |= 1 << j
                if val >= 1 << 63:
                    val -= 1 << 64
                keep.append(i)
                hashes.append(val)
            out = pdf.iloc[keep][[id_col, *carry]].reset_index(drop=True)
            out["audio_hash"] = pd.Series(hashes, dtype="int64")
            yield out

    return media.mapInPandas(gen, out_schema)


def audio_near_duplicates(
    media: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 8,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Near-duplicate AUDIO pairs by energy-profile Hamming distance —
    :func:`audio_hash_media` fingerprints, then the shared 64-bit
    ``dedup.hamming_near_duplicates`` banding. Catches re-gained /
    lightly-edited copies of the same clip. Output: (id_a, id_b,
    hamming)."""
    from .dedup import hamming_near_duplicates

    sigs = audio_hash_media(media, id_col=id_col)
    return hamming_near_duplicates(
        sigs,
        id_col=id_col,
        sig_col="audio_hash",
        max_hamming=max_hamming,
        max_bucket_size=max_bucket_size,
    )


def image_hash_index(
    media: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 8,
    bands: int | None = None,
) -> DataFrame:
    """Persistable perceptual-hash index of an IMAGE corpus —
    ``dedup.hamming_signature_index`` over :func:`ahash_media`
    fingerprints (~16 B payload per (doc, band) row). Daily ingests pair
    against it with :func:`image_near_duplicates_incremental` without
    re-decoding a single indexed image (verdict r12 next #1)."""
    from .dedup import hamming_signature_index

    return hamming_signature_index(
        ahash_media(media, id_col=id_col),
        id_col=id_col,
        sig_col="ahash",
        max_hamming=max_hamming,
        bands=bands,
    )


def image_near_duplicates_incremental(
    new_media: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 8,
    bands: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs between NEW images and an indexed corpus:
    hash only the new batch (one Arrow pass), join the persisted
    :func:`image_hash_index` by (band, bucket), verify exactly by
    popcount on the stored signatures — the corpus media is never
    re-read. Output: (new_id, indexed_id, hamming). Banding parameters
    must match the index build."""
    from .dedup import hamming_near_duplicates_incremental

    return hamming_near_duplicates_incremental(
        ahash_media(new_media, id_col=id_col),
        index,
        id_col=id_col,
        sig_col="ahash",
        max_hamming=max_hamming,
        bands=bands,
    )


def audio_hash_index(
    media: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 8,
    bands: int | None = None,
) -> DataFrame:
    """Persistable energy-profile-hash index of an AUDIO corpus — the
    audio analog of :func:`image_hash_index`, riding the same
    ``dedup.hamming_signature_index`` machinery over
    :func:`audio_hash_media` fingerprints."""
    from .dedup import hamming_signature_index

    return hamming_signature_index(
        audio_hash_media(media, id_col=id_col),
        id_col=id_col,
        sig_col="audio_hash",
        max_hamming=max_hamming,
        bands=bands,
    )


def audio_near_duplicates_incremental(
    new_media: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 8,
    bands: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs between NEW audio clips and an indexed
    corpus via the persisted :func:`audio_hash_index` — decode + hash
    only the new batch, exact popcount verify on stored signatures.
    Output: (new_id, indexed_id, hamming)."""
    from .dedup import hamming_near_duplicates_incremental

    return hamming_near_duplicates_incremental(
        audio_hash_media(new_media, id_col=id_col),
        index,
        id_col=id_col,
        sig_col="audio_hash",
        max_hamming=max_hamming,
        bands=bands,
    )


def video_frame_hashes(
    media: DataFrame,
    id_col: str = "doc_id",
    stride: int = 1,
    carry_cols: "tuple[str, ...] | list[str]" = (),
) -> DataFrame:
    """Per-frame perceptual fingerprints of every VIDEO payload: decode
    the Y4M, take every ``stride``-th frame's LUMA plane, and hash it
    with the shared :func:`ahash64_gray`. Output one row per sampled
    frame: (id, frame_idx, fhash) — the video analog of a document's
    line relation, feeding :func:`video_near_duplicates` (or any custom
    shot-level analysis). ONE Arrow pass; non-video rows omitted; the
    id column keeps the corpus's own type.

    ``stride`` is a COST knob for shot-level analysis, not for dedup: a
    trim shifting frame indexes by a non-multiple of ``stride`` samples
    a disjoint frame set from the copy, so duplicate detection should
    run at stride=1 (the :func:`video_near_duplicates` default)."""
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    id_type = media.schema[id_col].dataType.simpleString()
    carry = list(carry_cols)
    out_schema = (
        f"{id_col} {id_type}{_carry_schema(media, carry)}, "
        "frame_idx int, fhash long"
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows, idxs, hashes = [], [], []
            for i, (b, m) in enumerate(zip(pdf["media_bytes"], pdf["media_meta"])):
                if m["modality"] != "video":
                    continue
                y, _cb, _cr, _fps = decode_y4m(bytes(b))
                for fi in range(0, y.shape[0], stride):
                    rows.append(i)
                    idxs.append(fi)
                    hashes.append(ahash64_gray(y[fi].astype(np.int64)))
            out = pdf.iloc[rows][[id_col, *carry]].reset_index(drop=True)
            out["frame_idx"] = pd.Series(idxs, dtype="int32")
            out["fhash"] = pd.Series(hashes, dtype="int64")
            yield out

    return media.mapInPandas(gen, out_schema)


def video_near_duplicates(
    media: DataFrame,
    id_col: str = "doc_id",
    min_shared_frames: int = 2,
    stride: int = 1,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Near-duplicate VIDEO pairs by shared perceptual frame fingerprints:
    two videos pair when at least ``min_shared_frames`` DISTINCT frame
    hashes occur in both — a trimmed / re-cut / re-container'd copy
    shares most of its frames' aHashes even when frame indexes shift.

    Aggregation-shaped like the global line dedup: the (id, fhash)
    relation dedups per video, self-joins on the 8-byte hash, and pairs
    aggregate distinct shared-hash counts with map-side combine. Output:
    (id_a, id_b, shared_frames).

    A frame hash occurring in more than ``max_bucket_size`` videos is a
    NON-discriminative frame (black frames, title cards — pairing on it
    would blow candidates quadratically); salting splits such buckets,
    so those frames stop counting toward ``shared_frames`` for most
    pairs — the standard hot-bucket trade, here WITHOUT a second band
    to re-bucket the pair. Copies of mostly-static videos whose shared
    frames are all hot need a larger ``max_bucket_size`` (or None) to
    pair."""
    from ._persist_cache import cache_persisted
    from .dedup import salt_oversized_buckets
    from pyspark import StorageLevel

    fh = video_frame_hashes(media, id_col=id_col, stride=stride).select(
        F.col(id_col).alias("_id"), "fhash"
    ).dropDuplicates(["_id", "fhash"])
    if max_bucket_size is None:
        # no salting pass to materialize: persist so the video decode +
        # per-frame hashing runs once, not once per self-join branch
        fh = fh.persist(StorageLevel.MEMORY_AND_DISK)
        fh.count()
        cache_persisted(fh)
    fh, join_keys = salt_oversized_buckets(
        fh, ["fhash"], F.xxhash64(F.col("_id")), max_bucket_size
    )
    pairs = (
        fh.alias("a")
        .join(fh.alias("b"), on=join_keys)
        .filter(F.col("a._id") < F.col("b._id"))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("shared_frames"))
    )
    return pairs.filter(F.col("shared_frames") >= min_shared_frames)


def video_frame_hash_index(
    media: DataFrame,
    id_col: str = "doc_id",
    carry_cols: "tuple[str, ...] | list[str]" = (),
) -> DataFrame:
    """Persistable frame-fingerprint index of a VIDEO corpus: the distinct
    ``(id, fhash)`` relation of :func:`video_frame_hashes` at stride 1 —
    8 bytes per distinct frame hash per video, the exact relation the
    batch pairer self-joins. Write it partitioned/bucketed by ``fhash``;
    daily ingests pair against it with
    :func:`video_near_duplicates_incremental` without re-decoding a
    single indexed video. Stride is pinned to 1 because dedup must
    sample the full frame set (a trim shifts indexes; see
    :func:`video_frame_hashes`). ``carry_cols`` (per-video constants)
    ride through the distinct."""
    carry = list(carry_cols)
    return (
        video_frame_hashes(media, id_col=id_col, stride=1, carry_cols=carry)
        .select(id_col, "fhash", *carry)
        .dropDuplicates([id_col, "fhash"])
    )


def video_near_duplicates_incremental(
    new_media: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    min_shared_frames: int = 2,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Near-duplicate pairs between NEW videos and an indexed corpus:
    decode + frame-hash only the new batch, join the persisted
    :func:`video_frame_hash_index` on the 8-byte ``fhash``, and count
    distinct shared frame hashes per (new, indexed) pair with map-side
    combine — the corpus video bytes are never re-read. Output:
    ``(new_id, indexed_id, shared_frames)``.

    Hot-frame guard: a frame hash held by more than ``max_bucket_size``
    INDEXED videos is non-discriminative (black frames, title cards) and
    is EXCLUDED from pairing — one aggregation over the fhash-keyed index
    decides, so excluded frames simply stop counting toward
    ``shared_frames`` (the same trade the batch pairer's salting makes,
    expressed as a drop because a salt split on a two-sided join would
    lose cross-salt pairs; a residual hot fhash on the NEW side alone is
    an AQE skew-split, not a correctness risk)."""
    new_fh = (
        video_frame_hashes(new_media, id_col=id_col, stride=1)
        .select(F.col(id_col).alias("new_id"), "fhash")
        .dropDuplicates(["new_id", "fhash"])
    )
    old = index.select(F.col(id_col).alias("indexed_id"), "fhash")
    if max_bucket_size is not None:
        hot = (
            old.groupBy("fhash")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_bucket_size)
            .select("fhash")
        )
        old = old.join(hot, "fhash", "left_anti")
    pairs = (
        new_fh.join(old, "fhash")
        .groupBy("new_id", "indexed_id")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_frames"))
    )
    return pairs.filter(F.col("shared_frames") >= min_shared_frames)
