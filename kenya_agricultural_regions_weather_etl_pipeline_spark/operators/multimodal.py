"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct. The Spark-side plumbing — schema, partition-friendly layout,
Arrow-batched UDF signatures, mapInPandas batch shape — is real and
tested. The IMAGE path decodes for real: 24-bit BMP payloads go through
a stdlib-only codec (functions/codecs.py — decode → resample →
re-encode, pixel-level verified by mm5's oracle). The AUDIO path also
decodes for real: mono 16-bit PCM WAV payloads go through a stdlib RIFF
codec (decode → PCM window slice → re-encode, sample-level verified by
mm7's oracle). The VIDEO path decodes for real too: C420 YUV4MPEG2
(.y4m) streams go through a stdlib codec (decode → frame slice →
re-encode, plane-level verified by mm8's oracle). Formats outside
BMP/WAV/Y4M remain STUBBED (no media libs ship in this container)
behind deterministic fakes controlled by ``decode_fn`` /
``resize_fn``, clearly marked below.

Scale notes: payloads stay in executor memory only within a batch;
`mapInPandas` streams Arrow record batches, so a 100 TB corpus of
~1 MB blobs flows without driver involvement. Partition by a content
hash prefix to spread large objects evenly.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Typed envelope for a multimodal asset.
MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload_bytes", IntegerType()),
        StructField("payload_xxh", LongType()),
        StructField("feature_dim", IntegerType()),
        StructField("feature_norm", StringType()),
    ]
)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = patterned bytes)."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("asset_id"),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("media_type"),
            F.lit("application/octet-stream").alias("mime"),
            # patterned binary payload: repeatable, content-addressable
            F.encode(
                F.concat(F.lit("BLOB:"), F.lpad(F.col("id").cast("string"), 12, "0")),
                "utf-8",
            ).alias("payload"),
            (F.col("id") % 640).cast("int").alias("width"),
            (F.col("id") % 480).cast("int").alias("height"),
            (F.col("id") * 40).cast("int").alias("duration_ms"),
        )
    )


def _stub_decode(payload: bytes, media_type: str) -> list[float]:
    """STUB decode: deterministic fake feature vector from payload bytes.

    >>> REAL IMPLEMENTATION WOULD: decode image (PIL/cv2), resample audio,
    >>> frame-sample video — none of those libs ship in this container.
    """
    acc = 2166136261
    for by in payload:
        acc = ((acc ^ by) * 16777619) & 0xFFFFFFFF
    return [((acc >> (i % 24)) & 0xFF) / 255.0 for i in range(8)]


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes, str], list[float]] | None = None,
) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow-batched).

    The batch shape is the production one: an iterator of pandas
    DataFrames, each holding whole payloads; nothing is collected to
    the driver. Pass a real ``decode_fn`` when media libs exist.
    """
    fn = decode_fn or _stub_decode

    # The payload hash is computed JVM-side (xxhash64 built-in); only the
    # decode itself runs in Python.
    hashed = media.withColumn("payload_xxh", F.xxhash64(F.col("payload"))).withColumn(
        "payload_bytes", F.length(F.col("payload")).cast("int")
    )

    def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                fn(bytes(p), m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "payload_bytes": pdf["payload_bytes"],
                    "payload_xxh": pdf["payload_xxh"],
                    "feature_dim": [len(f) for f in feats],
                    "feature_norm": [
                        f"{sum(x * x for x in f) ** 0.5:.6f}" for f in feats
                    ],
                }
            )

    return hashed.select(
        "asset_id", "media_type", "payload", "payload_bytes", "payload_xxh"
    ).mapInPandas(decode_batches, FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame_ts_ms", IntegerType(), False),
        StructField("frame_payload", BinaryType()),
    ]
)


def _stub_frame_decode(payload: bytes, n_frames: int) -> list[bytes]:
    """STUB frame extraction: deterministic fake frame payloads.

    >>> REAL IMPLEMENTATION WOULD: demux the container and decode every
    >>> Nth frame (ffmpeg/pyav) — not shipped in this container.
    """
    return [payload + b":" + str(k).encode() for k in range(n_frames)]


def sample_frames(media: DataFrame, every_ms: int = 200) -> DataFrame:
    """Video frame sampling via mapInPandas — one row per sampled frame.

    The row-EXPLOSION batch shape is the production plumbing: each input
    asset yields ``max(1, duration_ms // every_ms)`` frame rows, built
    inside the Arrow batch without driver involvement. Y4M payloads get
    REAL single-frame extractions (each re-encoded as a standalone
    one-frame stream); other formats fall back to the deterministic
    stub. Schema/shape/cardinality are SQL-derivable either way, so the
    plumbing has an exact oracle.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import codecs as C

        for pdf in it:
            out: dict[str, list] = {
                "asset_id": [],
                "frame_idx": [],
                "frame_ts_ms": [],
                "frame_payload": [],
            }
            for aid, payload, dur in zip(
                pdf["asset_id"], pdf["payload"], pdf["duration_ms"]
            ):
                n_frames = max(1, int(dur) // every_ms)
                raw = bytes(payload)
                if C.is_y4m(raw):
                    n_avail = len(C.decode_y4m(raw)[3])
                    frames = [
                        C.slice_y4m(raw, min(k, n_avail - 1), min(k, n_avail - 1) + 1)
                        for k in range(n_frames)
                    ]
                else:
                    frames = _stub_frame_decode(raw, n_frames)
                for k, frame in enumerate(frames):
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(k)
                    out["frame_ts_ms"].append(k * every_ms)
                    out["frame_payload"].append(frame)
            yield pd.DataFrame(out)

    video = media.filter(F.col("media_type") == "video").select(
        "asset_id", "payload", "duration_ms"
    )
    return video.mapInPandas(batches, FRAME_SCHEMA)


SEGMENT_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("segment_idx", IntegerType(), False),
        StructField("start_ms", IntegerType(), False),
        StructField("end_ms", IntegerType(), False),
        StructField("segment_payload", BinaryType()),
    ]
)


def _stub_segment_decode(payload: bytes, n_segments: int) -> list[bytes]:
    """STUB audio slicing: deterministic fake segment payloads.

    >>> REAL IMPLEMENTATION WOULD: decode (soundfile/librosa), resample,
    >>> and slice PCM windows — audio libs are not in this container.
    """
    return [payload + b":" + str(k).encode() for k in range(n_segments)]


def segment_audio(
    media: DataFrame, win_ms: int = 400, hop_ms: int = 300
) -> DataFrame:
    """Audio windowing via mapInPandas — overlapping fixed-length
    segments (the ASR/audio-embedding batch shape: win 25ms/hop 10ms in
    real pipelines). One input asset explodes into
    ``max(1, ceil(duration_ms / hop_ms))`` rows inside the Arrow batch;
    cardinality/timestamps are exact SQL arithmetic (oracle-checkable),
    decode is stubbed like the other media ops.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import codecs as C

        for pdf in it:
            out: dict[str, list] = {
                "asset_id": [],
                "segment_idx": [],
                "start_ms": [],
                "end_ms": [],
                "segment_payload": [],
            }
            for aid, payload, dur in zip(
                pdf["asset_id"], pdf["payload"], pdf["duration_ms"]
            ):
                dur = int(dur)
                n_seg = max(1, -(-dur // hop_ms))
                raw = bytes(payload)
                if C.is_wav(raw):
                    # REAL path: slice actual PCM sample windows and
                    # re-encode each as a standalone playable WAV
                    rate, samples = C.decode_wav(raw)
                    segs = []
                    for k in range(n_seg):
                        s = k * hop_ms * rate // 1000
                        e = min((k * hop_ms + win_ms) * rate // 1000, len(samples))
                        segs.append(C.encode_wav(samples[s:e], rate))
                else:
                    segs = _stub_segment_decode(raw, n_seg)
                for k, seg in enumerate(segs):
                    out["asset_id"].append(aid)
                    out["segment_idx"].append(k)
                    out["start_ms"].append(k * hop_ms)
                    out["end_ms"].append(min(k * hop_ms + win_ms, dur))
                    out["segment_payload"].append(seg)
            yield pd.DataFrame(out)

    audio = media.filter(F.col("media_type") == "audio").select(
        "asset_id", "payload", "duration_ms"
    )
    return audio.mapInPandas(batches, SEGMENT_SCHEMA)


def _stub_resize(payload: bytes, width: int, height: int) -> bytes:
    """STUB resize: deterministic fake output tagged with the target box.

    >>> REAL IMPLEMENTATION WOULD: decode with PIL/cv2, resample, and
    >>> re-encode — neither lib ships in this container. The fake output
    >>> is content-addressed (payload-derived), so downstream schema,
    >>> partitioning, and size accounting are all exercised for real.
    """
    return payload + b":resized:" + f"{width}x{height}".encode()


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Image resize operator over the opaque binary column.

    mapInPandas with the production batch shape (Arrow batches of whole
    payloads, nothing on the driver). The default path does a REAL
    decode → nearest-neighbor resample → re-encode for BMP payloads
    (functions/codecs.py, stdlib-only) and falls back to the
    deterministic `_stub_resize` tag for formats with no in-container
    codec; pass ``resize_fn`` to plug in PIL/cv2 where they exist.
    Metadata (width/height) is rewritten to the target box; everything
    else passes through. Narrow map stage: zero shuffle at any scale.
    """
    fn = resize_fn or _real_or_stub_resize

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out["payload"] = [fn(bytes(p), width, height) for p in pdf["payload"]]
            out["width"] = width
            out["height"] = height
            yield out

    return media.mapInPandas(batches, media.schema)


def _real_or_stub_resize(payload: bytes, width: int, height: int) -> bytes:
    """REAL resize for BMP payloads (functions/codecs.py — pure-stdlib
    24-bit BI_RGB decode → nearest-neighbor resample → re-encode);
    deterministic stub fallback for formats with no in-container codec."""
    from ..functions import codecs as C

    if C.is_bmp(payload):
        return C.resize_bmp(payload, width, height)
    return _stub_resize(payload, width, height)


def synthetic_image_media(spark, n: int = 64) -> DataFrame:
    """Deterministic image fixture table with REAL (decodable) BMP
    payloads: asset ids follow synthetic_media's layout (every 3rd id is
    an image), sizes vary per asset (w = 8 + id%5, h = 6 + id%4), and
    every pixel follows codecs.synthetic_pixel — pure integer arithmetic
    a SQL oracle can replay. Payload bytes are built executor-side in
    Arrow batches (mapInPandas), not on the driver."""
    from ..functions import codecs as C

    ids = spark.range(n).filter(F.col("id") % 3 == 0).select(
        F.col("id").alias("asset_id"),
        (8 + F.col("id") % 5).cast("int").alias("width"),
        (6 + F.col("id") % 4).cast("int").alias("height"),
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": "image",
                    "mime": "image/bmp",
                    "payload": [
                        C.synthetic_bmp(int(a), int(w), int(h))
                        for a, w, h in zip(
                            pdf["asset_id"], pdf["width"], pdf["height"]
                        )
                    ],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "duration_ms": 0,
                }
            )

    return ids.mapInPandas(gen, MEDIA_SCHEMA)


PIXEL_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("payload_bytes", IntegerType(), False),
        StructField("pixel_sum", LongType(), False),
    ]
)


def image_pixel_stats(media: DataFrame) -> DataFrame:
    """REAL pixel-level verification: decode each BMP payload and emit
    the dimensions read from the file header plus the sum of every
    B+G+R byte. The decode is the honest codec path (no stub) — a
    corrupt or mis-resized payload changes pixel_sum — and the values
    are closed-form integer arithmetic for the synthetic fixtures, so
    the whole Arrow decode path is SQL-oracle-checkable."""
    from ..functions import codecs as C

    def stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "asset_id": [],
                "width": [],
                "height": [],
                "payload_bytes": [],
                "pixel_sum": [],
            }
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload)
                w, h, rows = C.decode_bmp(raw)
                out["asset_id"].append(aid)
                out["width"].append(w)
                out["height"].append(h)
                out["payload_bytes"].append(len(raw))
                out["pixel_sum"].append(
                    sum(b + g + r for row in rows for (b, g, r) in row)
                )
            yield pd.DataFrame(out)

    return media.select("asset_id", "payload").mapInPandas(
        stats, PIXEL_STATS_SCHEMA
    )


CHANNEL_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("sum_b", LongType(), False),
        StructField("sum_g", LongType(), False),
        StructField("sum_r", LongType(), False),
    ]
)


def image_channel_stats(media: DataFrame) -> DataFrame:
    """REAL image feature extraction: decode each BMP payload and emit
    per-channel byte sums — the integer core of a mean-color /
    brightness feature (divide by w·h downstream). Same honest codec
    path as image_pixel_stats, per-channel so a B/G/R swap anywhere in
    the codec chain is caught; closed-form for the synthetic fixtures,
    hence SQL-oracle-checkable."""
    from ..functions import codecs as C

    def stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "asset_id": [],
                "width": [],
                "height": [],
                "sum_b": [],
                "sum_g": [],
                "sum_r": [],
            }
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                w, h, rows = C.decode_bmp(bytes(payload))
                out["asset_id"].append(aid)
                out["width"].append(w)
                out["height"].append(h)
                out["sum_b"].append(sum(px[0] for row in rows for px in row))
                out["sum_g"].append(sum(px[1] for row in rows for px in row))
                out["sum_r"].append(sum(px[2] for row in rows for px in row))
            yield pd.DataFrame(out)

    return media.select("asset_id", "payload").mapInPandas(
        stats, CHANNEL_STATS_SCHEMA
    )


def synthetic_audio_media(spark, n: int = 64) -> DataFrame:
    """Deterministic audio fixture table with REAL (decodable) mono
    16-bit PCM WAV payloads: asset ids follow synthetic_media's layout
    (every id with id%3==1 is audio), lengths vary per asset
    (n_samples = 512 + id%7·128 at 8 kHz), and every sample follows
    codecs.synthetic_sample — pure integer arithmetic a SQL oracle can
    replay. Payload bytes are built executor-side in Arrow batches."""
    from ..functions import codecs as C

    ids = spark.range(n).filter(F.col("id") % 3 == 1).select(
        F.col("id").alias("asset_id"),
        (512 + F.col("id") % 7 * 128).cast("int").alias("n_samples"),
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": "audio",
                    "mime": "audio/wav",
                    "payload": [
                        C.synthetic_wav(int(a), int(ns))
                        for a, ns in zip(pdf["asset_id"], pdf["n_samples"])
                    ],
                    "width": 0,
                    "height": 0,
                    "duration_ms": [int(ns) * 1000 // 8000 for ns in pdf["n_samples"]],
                }
            )

    return ids.mapInPandas(gen, MEDIA_SCHEMA)


AUDIO_SEGMENT_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("segment_idx", IntegerType(), False),
        StructField("start_ms", IntegerType(), False),
        StructField("end_ms", IntegerType(), False),
        StructField("n_samples", IntegerType(), False),
        StructField("sum_abs", LongType(), False),
    ]
)


def audio_segment_stats(
    media: DataFrame, win_ms: int = 40, hop_ms: int = 30
) -> DataFrame:
    """REAL audio feature extraction (no stub anywhere in this path):
    decode each WAV payload, window it into overlapping PCM segments
    (win/hop on the sample grid), and emit each segment's integer
    |amplitude| sum — the energy core of a VAD / loudness feature.
    Every segment goes through slice_wav's encode→decode ROUNDTRIP, so
    a corrupt header, wrong stride, or sample-order bug anywhere in the
    codec changes sum_abs. Closed-form for the synthetic fixtures —
    SQL-oracle-checkable. Narrow Arrow map stage: zero shuffle."""
    from ..functions import codecs as C

    def stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "asset_id": [],
                "segment_idx": [],
                "start_ms": [],
                "end_ms": [],
                "n_samples": [],
                "sum_abs": [],
            }
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload)
                rate, samples = C.decode_wav(raw)
                win_s = win_ms * rate // 1000
                hop_s = hop_ms * rate // 1000
                n = len(samples)
                n_seg = max(1, -(-n // hop_s))
                for k in range(n_seg):
                    s = k * hop_s
                    e = min(s + win_s, n)
                    _, seg = C.decode_wav(C.slice_wav(raw, s, e))
                    out["asset_id"].append(aid)
                    out["segment_idx"].append(k)
                    out["start_ms"].append(s * 1000 // rate)
                    out["end_ms"].append(e * 1000 // rate)
                    out["n_samples"].append(e - s)
                    out["sum_abs"].append(sum(abs(v) for v in seg))
            yield pd.DataFrame(out)

    return media.select("asset_id", "payload").mapInPandas(
        stats, AUDIO_SEGMENT_STATS_SCHEMA
    )


def synthetic_video_media(spark, n: int = 64) -> DataFrame:
    """Deterministic video fixture table with REAL (decodable) Y4M
    streams: asset ids follow synthetic_media's layout (every id with
    id%3==2 is video), 16×12 C420 at 25 fps with 2 + id%4 frames, and
    every plane byte follows codecs.synthetic_y4m_plane — pure integer
    arithmetic a SQL oracle can replay. Built executor-side in Arrow
    batches."""
    from ..functions import codecs as C

    ids = spark.range(n).filter(F.col("id") % 3 == 2).select(
        F.col("id").alias("asset_id"),
        (2 + F.col("id") % 4).cast("int").alias("n_frames"),
    )

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": "video",
                    "mime": "video/x-yuv4mpeg",
                    "payload": [
                        C.synthetic_y4m(int(a), 16, 12, int(nf))
                        for a, nf in zip(pdf["asset_id"], pdf["n_frames"])
                    ],
                    "width": 16,
                    "height": 12,
                    "duration_ms": [int(nf) * 40 for nf in pdf["n_frames"]],
                }
            )

    return ids.mapInPandas(gen, MEDIA_SCHEMA)


FRAME_STATS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("luma_sum", LongType(), False),
        StructField("cb_sum", LongType(), False),
        StructField("cr_sum", LongType(), False),
    ]
)


def video_frame_stats(media: DataFrame) -> DataFrame:
    """REAL video feature extraction (no stub in this path): decode
    each Y4M stream, and emit per-frame integer plane sums (luma +
    both chroma) — the brightness/color-shift core of a shot-boundary
    feature. Every frame passes through slice_y4m's encode→decode
    ROUNDTRIP so a header, geometry, or plane-order bug changes the
    sums. Closed-form for the synthetic fixtures — SQL-oracle-checkable.
    Narrow Arrow map stage: zero shuffle."""
    from ..functions import codecs as C

    def stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "asset_id": [],
                "frame_idx": [],
                "luma_sum": [],
                "cb_sum": [],
                "cr_sum": [],
            }
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload)
                _, _, _, frames = C.decode_y4m(raw)
                for f in range(len(frames)):
                    _, _, _, (frame,) = C.decode_y4m(C.slice_y4m(raw, f, f + 1))
                    y, cb, cr = frame
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(f)
                    out["luma_sum"].append(sum(y))
                    out["cb_sum"].append(sum(cb))
                    out["cr_sum"].append(sum(cr))
            yield pd.DataFrame(out)

    return media.select("asset_id", "payload").mapInPandas(
        stats, FRAME_STATS_SCHEMA
    )


CENSUS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload_bytes", IntegerType(), False),
        StructField("feature_sum", LongType(), False),
    ]
)


def media_feature_census(media: DataFrame) -> DataFrame:
    """Content-SNIFFING multimodal feature extraction: one Arrow map
    dispatches every payload on its magic bytes (BMP / RIFF-WAVE /
    YUV4MPEG2) to the right stdlib codec and emits the modality's
    integer feature — pixel B+G+R sum for images, |amplitude| sum for
    audio, luma sum for video. This is the heterogeneous-lakehouse
    shape: the pipeline never trusts the metadata column, the bytes
    decide (feature_sum = -1 marks an undecodable payload for
    quarantine). Narrow map, zero shuffle."""
    from ..functions import codecs as C

    def census(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "asset_id": [],
                "media_type": [],
                "payload_bytes": [],
                "feature_sum": [],
            }
            for aid, mt, payload in zip(
                pdf["asset_id"], pdf["media_type"], pdf["payload"]
            ):
                raw = bytes(payload)
                if C.is_bmp(raw):
                    _, _, rows = C.decode_bmp(raw)
                    feat = sum(b + g + r for row in rows for (b, g, r) in row)
                elif C.is_wav(raw):
                    _, samples = C.decode_wav(raw)
                    feat = sum(abs(v) for v in samples)
                elif C.is_y4m(raw):
                    _, _, _, frames = C.decode_y4m(raw)
                    feat = sum(sum(y) for (y, _, _) in frames)
                else:
                    feat = -1  # undecodable: quarantine marker
                out["asset_id"].append(aid)
                out["media_type"].append(mt)
                out["payload_bytes"].append(len(raw))
                out["feature_sum"].append(feat)
            yield pd.DataFrame(out)

    return media.select("asset_id", "media_type", "payload").mapInPandas(
        census, CENSUS_SCHEMA
    )


PERCEPTUAL_HASH_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("edition", StringType(), False),
        StructField("phash", LongType(), False),
    ]
)

#: aHash geometry: 4×4 mean-threshold grid; resized editions pass
#: through a 16×12 intermediate whose dimensions are exact multiples of
#: the grid — see perceptual_hash_editions for why that makes the hash
#: provably resize-invariant under the codec's floor-mapped
#: nearest-neighbor resampling.
PHASH_GRID = 4
PHASH_MID_W, PHASH_MID_H = 16, 12


def _ahash_from_rows(
    rows: list[list[tuple[int, int, int]]], w: int, h: int
) -> int:
    """Average-hash of a decoded pixel grid: sample a PHASH_GRID² lattice
    with the codec's floor mapping (sx = j·w // G), grayscale each
    sample by integer mean of the three channels, threshold against the
    16-sample mean (compared as 16·g ≥ Σg so no float ever appears),
    and pack the bits row-major. Pure integer arithmetic end to end —
    the DuckDB oracle replays every step from the synthetic pixel
    formula."""
    g = PHASH_GRID
    samples = []
    for i in range(g):
        sy = i * h // g
        for j in range(g):
            sx = j * w // g
            b, gr, r = rows[sy][sx]
            samples.append((b + gr + r) // 3)
    total = sum(samples)
    bits = 0
    for k, s in enumerate(samples):
        if len(samples) * s >= total:
            bits |= 1 << k
    return bits


def perceptual_hash_editions(media: DataFrame) -> DataFrame:
    """Per-asset perceptual hashes for TWO physical editions of every
    image: the original payload and a re-encoded nearest-neighbor
    resize to 16×12 — the multimodal near-dup axis mm4's byte-md5
    cannot see (re-encoded/rescaled copies share not a single payload
    byte).

    The aHash is provably invariant under the codec's resize for this
    geometry: sampling the 16×12 edition at grid column j reads
    resized pixel x₁₆ = j·16//4 = 4j, which the resize built from
    source x = (4j·w)//16 = (j·w)//4 — exactly the pixel the original
    edition samples (same argument for rows with 12 = 4·3). So both
    editions of an asset produce IDENTICAL hashes by integer-arithmetic
    identity, not approximation, and the dedup rollup collapses them
    with zero distance threshold. For editions resized to non-multiple
    geometries the hash degrades gracefully to near-duplicate (Hamming
    proximity), which a banded bucket join handles exactly like SimHash
    (operators/dedup.py x4's pigeonhole blocks).

    Scale shape: decode + hash is one Arrow-batched mapInPandas pass
    (payload bytes never cross a shuffle); the emitted frame is 2 thin
    rows per asset, and the group-by key is the 16-bit hash — the
    exchange carries (asset_id, edition, phash) only. Same honest-codec
    discipline as image_channel_stats: real bytes decoded, no stub."""
    from ..functions import codecs as C

    def hashes(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "asset_id": [],
                "edition": [],
                "phash": [],
            }
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload)
                w, h, rows = C.decode_bmp(raw)
                out["asset_id"].append(aid)
                out["edition"].append("orig")
                out["phash"].append(_ahash_from_rows(rows, w, h))
                resized = C.resize_bmp(raw, PHASH_MID_W, PHASH_MID_H)
                rw, rh, rrows = C.decode_bmp(resized)
                out["asset_id"].append(aid)
                out["edition"].append("up16")
                out["phash"].append(_ahash_from_rows(rrows, rw, rh))
            yield pd.DataFrame(out)

    return media.select("asset_id", "payload").mapInPandas(
        hashes, PERCEPTUAL_HASH_SCHEMA
    )


#: Audio fingerprint geometry: 16 equal energy windows → 15 comparison
#: bits. The synthetic WAV fixtures' sample counts are all multiples of
#: 16, so the window split is exact on both engines.
AUDIO_FP_WINDOWS = 16

AUDIO_FP_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("edition", StringType(), False),
        StructField("afp", LongType(), False),
    ]
)


def _energy_fingerprint(
    samples: list[int], n_windows: int = AUDIO_FP_WINDOWS
) -> int:
    """Energy-contour fingerprint of a PCM sample array: split into
    ``n_windows`` equal windows, integer |amplitude| sum per window,
    bit k set iff E[k+1] > E[k] (the Haitsma–Kalker sign-of-delta
    idea reduced to one band). Comparison-only over integer sums, so
    any uniform gain g > 0 scales every window energy by exactly g and
    leaves every bit — hence the fingerprint — unchanged."""
    n = len(samples)
    chunk = max(1, n // n_windows)
    e = [
        sum(abs(v) for v in samples[k * chunk : (k + 1) * chunk])
        for k in range(n_windows)
    ]
    fp = 0
    for k in range(n_windows - 1):
        if e[k + 1] > e[k]:
            fp |= 1 << k
    return fp


def audio_fingerprint_editions(media: DataFrame) -> DataFrame:
    """Per-asset perceptual audio fingerprints for TWO physical
    editions of every clip: the original WAV payload and a re-encoded
    gain-doubled master (every sample ×2 — a different data chunk,
    different checksum, same recording louder). The energy-contour
    fingerprint is PROVABLY gain-invariant by integer identity:
    |2s| = 2|s| exactly (samples stay within int16 at ±9972), so every
    window energy doubles and every E[k+1] > E[k] comparison — hence
    every bit — is unchanged. That is the near-dup axis mm4's byte-md5
    cannot see for audio, completing mm9's story across modalities.
    Editions with non-uniform edits (fades, trims) degrade to Hamming
    proximity, which bands through x4's SimHash pigeonhole blocks
    unchanged.

    Scale shape: decode + window + fingerprint is one Arrow-batched
    mapInPandas pass (payload bytes never shuffle); the emitted frame
    is 2 thin rows per asset and the rollup key is the 15-bit
    fingerprint. The gain-2 edition goes through a full encode→decode
    roundtrip, so a codec header/stride/byte-order bug changes the
    fingerprint and the oracle catches it."""
    from ..functions import codecs as C

    def fps(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "asset_id": [],
                "edition": [],
                "afp": [],
            }
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload)
                rate, samples = C.decode_wav(raw)
                out["asset_id"].append(aid)
                out["edition"].append("orig")
                out["afp"].append(_energy_fingerprint(samples))
                louder = C.encode_wav([2 * v for v in samples], rate)
                _, s2 = C.decode_wav(louder)
                out["asset_id"].append(aid)
                out["edition"].append("gain2")
                out["afp"].append(_energy_fingerprint(s2))
            yield pd.DataFrame(out)

    return media.select("asset_id", "payload").mapInPandas(
        fps, AUDIO_FP_SCHEMA
    )


VIDEO_FP_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("edition", StringType(), False),
        StructField("vfp", StringType(), False),
    ]
)


def _frame_ahash(y: bytes, w: int, h: int, g: int = PHASH_GRID) -> int:
    """4×4 mean-threshold aHash of one luma plane (single-channel twin
    of mm9's _ahash_from_rows): sample the g² lattice with the floor
    mapping, threshold 16·s ≥ Σs (no float), pack row-major."""
    samples = [
        y[(i * h // g) * w + (j * w // g)]
        for i in range(g)
        for j in range(g)
    ]
    total = sum(samples)
    bits = 0
    for k, s in enumerate(samples):
        if len(samples) * s >= total:
            bits |= 1 << k
    return bits


def video_fingerprint_editions(media: DataFrame) -> DataFrame:
    """Per-asset perceptual VIDEO fingerprints for TWO physical
    editions of every clip: the original Y4M stream and a re-encoded
    2× nearest-neighbor upscale (32×24 from 16×12 — four times the
    plane bytes, not one byte shared). Each frame's luma plane hashes
    to a 16-bit aHash; the asset fingerprint is the md5 of the
    frame-ordered hash sequence (temporal structure included,
    engine-portable). The upscale is provably hash-invariant by mm9's
    grid-composition argument: the upscaled grid sample at (6i, 8j)
    reads source pixel (6i//2, 8j//2) = (3i, 4j) — exactly the pixel
    the original's grid samples — so both editions produce identical
    per-frame hashes by integer identity, and the dedup rollup
    collapses them at zero distance. Editions with brightness/contrast
    edits degrade to per-frame Hamming proximity (x4's banded regime).

    Scale shape: decode + hash is one Arrow-batched mapInPandas pass;
    the emitted frame is 2 thin rows per asset keyed by a 32-char
    fingerprint. Both editions pass a full encode→decode roundtrip."""
    import hashlib

    from ..functions import codecs as C

    def fps(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "asset_id": [],
                "edition": [],
                "vfp": [],
            }
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                raw = bytes(payload)
                w, h, fr, frames = C.decode_y4m(raw)
                hs = [_frame_ahash(y, w, h) for y, _cb, _cr in frames]
                out["asset_id"].append(aid)
                out["edition"].append("orig")
                out["vfp"].append(
                    hashlib.md5("-".join(map(str, hs)).encode()).hexdigest()
                )
                cw, ch = w // 2, h // 2
                up = []
                for y, cb, cr in frames:
                    uy = bytes(
                        y[(r // 2) * w + (c // 2)]
                        for r in range(2 * h)
                        for c in range(2 * w)
                    )
                    ucb = bytes(
                        cb[(r // 2) * cw + (c // 2)]
                        for r in range(2 * ch)
                        for c in range(2 * cw)
                    )
                    ucr = bytes(
                        cr[(r // 2) * cw + (c // 2)]
                        for r in range(2 * ch)
                        for c in range(2 * cw)
                    )
                    up.append((uy, ucb, ucr))
                raw2 = C.encode_y4m(2 * w, 2 * h, up, fr)
                w2, h2, _, frames2 = C.decode_y4m(raw2)
                hs2 = [_frame_ahash(y, w2, h2) for y, _cb, _cr in frames2]
                out["asset_id"].append(aid)
                out["edition"].append("up2x")
                out["vfp"].append(
                    hashlib.md5("-".join(map(str, hs2)).encode()).hexdigest()
                )
            yield pd.DataFrame(out)

    return media.select("asset_id", "payload").mapInPandas(
        fps, VIDEO_FP_SCHEMA
    )
