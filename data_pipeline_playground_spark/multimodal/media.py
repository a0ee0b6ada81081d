"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (driver north-star extension; SURVEY §2.12).

The container ships no image/audio libraries, so the DECODE step is
stubbed behind ``decoder=`` (a real PIL/ffmpeg decoder plugs in
unchanged); everything Spark-side — schema, binary column handling,
Arrow batch shape, mapInPandas signatures, partitioning — is real and
tested. The deterministic fake decoder lets tests assert exact values.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

# decoder: payload bytes → feature vector (list[float]); None → use stub
Decoder = Callable[[bytes], list[float]]


def attach_payload_from_text(docs: DataFrame) -> DataFrame:
    """Derive a deterministic binary `payload` column from documents
    (UTF-8 bytes) so multimodal plumbing is exercised on driver tables
    without synthesizing external data."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("raw").alias("codec"),
        ).alias("meta"),
    )


def _stub_decode(payload: bytes) -> list[float]:
    """Deterministic fake decode: 8 byte-histogram features in [0, 1].

    A real decoder (PIL image → pixels, librosa audio → spectrogram)
    replaces this function only; the Spark plumbing is identical.

    Rounding is floor(x·1e6 + 0.5)/1e6 — half-away-from-zero on the
    same double — rather than Python's round() (banker's), so the
    DuckDB oracle for multimodal_decode_histogram reproduces every
    feature bit-exactly (e.g. 1/128 rounds to .007813 on both sides,
    where banker's rounding would give .007812).
    """
    if payload is None:
        raise NotImplementedError("real media decode requires PIL/ffmpeg")
    import math

    buckets = [0] * 8
    for b in payload:
        buckets[b % 8] += 1
    total = max(len(payload), 1)
    return [math.floor(c * 1e6 / total + 0.5) / 1e6 for c in buckets]


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401
        return True
    except ImportError:
        return False


def pil_decode(payload: bytes) -> list[float]:
    """Real image decode (used when PIL is importable): grayscale
    8-bin luminance histogram — the same 8-float output contract as
    ``_stub_decode`` so downstream schema/consumers are identical.
    Raises like any decoder would on non-image bytes."""
    if payload is None:
        raise NotImplementedError("payload is null")
    import io
    import math

    import numpy as np
    from PIL import Image

    img = Image.open(io.BytesIO(bytes(payload))).convert("L")
    arr = np.asarray(img, dtype=np.float64)
    hist, _ = np.histogram(arr, bins=8, range=(0.0, 256.0))
    total = max(int(arr.size), 1)
    return [math.floor(int(c) * 1e6 / total + 0.5) / 1e6 for c in hist]


def pil_resize(payload: bytes, src_w: int, src_h: int,
               dst_w: int, dst_h: int) -> bytes:
    """Real image resize via PIL (used when importable); same
    bytes→bytes contract as ``_stub_resize``."""
    if payload is None:
        raise NotImplementedError("payload is null")
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(bytes(payload)))
    fmt = img.format or "PNG"
    buf = io.BytesIO()
    img.resize((dst_w, dst_h)).save(buf, format=fmt)
    return buf.getvalue()


def default_decoder() -> Decoder:
    """PIL-backed decode when the environment has PIL, else the
    deterministic stub (this container ships no image libs). The
    REGISTERED multimodal queries always pass ``_stub_decode``
    explicitly — their payloads are synthetic UTF-8 bytes with a
    DuckDB oracle pinned to the stub histogram — so environment
    differences can never flip a correctness gate; this default is
    for real-media users of the operator API."""
    return pil_decode if _pil_available() else _stub_decode


def default_resizer() -> Resizer:
    """PIL-backed resize when available, else the stub (see
    ``default_decoder`` for the query-pinning rationale)."""
    return pil_resize if _pil_available() else _stub_resize


def decode_features(media: DataFrame, decoder: Decoder | None = None,
                    batch_limit: int = 1024) -> DataFrame:
    """mapInPandas decode: binary payload → array<float> features.

    Arrow-batched, one Python worker pass per partition — the shape a
    GPU/codec stage would use at 100 TB (repartition upstream to bound
    per-task payload bytes; binary stays off the driver entirely).
    """
    import pandas as pd

    decode = decoder or default_decoder()

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                feats = [
                    decode(bytes(p)) if p is not None else None
                    for p in chunk["payload"]
                ]
                yield pd.DataFrame(
                    {"media_id": chunk["media_id"], "features": feats}
                )

    return media.mapInPandas(_run, schema="media_id bigint, features array<double>")


# resizer: (payload, src_w, src_h, dst_w, dst_h) → resized payload bytes
Resizer = Callable[[bytes, int, int, int, int], bytes]


def _stub_resize(payload: bytes, src_w: int, src_h: int,
                 dst_w: int, dst_h: int) -> bytes:
    """Deterministic fake resize: area-ratio byte subsampling.

    A real implementation (PIL ``Image.resize``) replaces this function
    only; schema and batch plumbing are identical.
    """
    if payload is None:
        raise NotImplementedError("real image resize requires PIL")
    src_area = max(src_w * src_h, 1)
    keep = max(1, (len(payload) * dst_w * dst_h) // src_area)
    step = max(1, len(payload) // keep)
    return payload[::step][:keep]


def resize_images(media: DataFrame, dst_w: int, dst_h: int,
                  resizer: Resizer | None = None) -> DataFrame:
    """mapInPandas resize for image rows: payload → payload at
    (dst_w, dst_h), meta updated to the new dimensions. Binary never
    touches the driver; partition count bounds per-task bytes."""
    import pandas as pd

    resize = resizer or default_resizer()

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out_payload = []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                src_w = (m or {}).get("width") or dst_w
                src_h = (m or {}).get("height") or dst_h
                out_payload.append(
                    resize(bytes(p), src_w, src_h, dst_w, dst_h)
                    if p is not None
                    else None
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out_payload,
                    "width": [dst_w] * len(pdf),
                    "height": [dst_h] * len(pdf),
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .mapInPandas(
            _run,
            schema="media_id bigint, kind string, payload binary, "
            "width int, height int",
        )
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: explode sample timestamps
    from metadata (duration) — pure Catalyst; the per-frame decode then
    rides decode_features. Rows without duration yield no frames."""
    n_frames = (F.col("meta.duration_ms") / every_ms).cast("int")
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.when(
                    n_frames > 0, F.sequence(F.lit(0), n_frames * every_ms, F.lit(every_ms))
                ).otherwise(F.expr("array()").cast("array<int>"))
            ),
        )
        .select("media_id", "frame_ts_ms", "payload", "meta")
    )


def attach_audio_from_text(docs: DataFrame) -> DataFrame:
    """Audio-kind twin of attach_payload_from_text: UTF-8 bytes stand
    in for a PCM waveform; duration_ms derives from the byte length so
    windowing logic sees realistic varying durations."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.length("text") * 10).cast("int").alias("duration_ms"),
            F.lit("pcm8").alias("codec"),
        ).alias("meta"),
    )


def audio_window_rms(media: DataFrame, win_ms: int = 200) -> DataFrame:
    """Windowed RMS energy for audio rows — the shape of every audio
    featurizer (VAD, loudness normalization, silence trimming): split
    the waveform into duration/win_ms windows, one energy value each.

    The stub decode treats payload bytes as centered 8-bit PCM
    (librosa/ffmpeg replaces only the bytes→samples step); the
    windowing is numpy-vectorized inside an Arrow-batched mapInPandas,
    one Python pass per partition, binary never on the driver. Output
    is (media_id, window_idx, rms) — rounded to 6dp so results are
    bitwise partition-order independent."""
    import math

    import pandas as pd

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            mids, widx, rms = [], [], []
            for mid, p, m in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                dur = (m or {}).get("duration_ms") or 0
                if p is None or dur <= 0:
                    continue
                wave = (
                    np.frombuffer(bytes(p), dtype=np.uint8).astype(np.float64)
                    - 128.0
                )
                n_win = max(int(dur) // win_ms, 1)
                for w, chunk in enumerate(np.array_split(wave, n_win)):
                    if not len(chunk):
                        continue
                    v = float(np.sqrt(np.mean(chunk * chunk)))
                    mids.append(mid)
                    widx.append(w)
                    rms.append(math.floor(v * 1e6 + 0.5) / 1e6)
            yield pd.DataFrame(
                {"media_id": mids, "window_idx": widx, "rms": rms}
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        _run, schema="media_id bigint, window_idx int, rms double"
    )


# Ship decode helpers by value in pickled mapInPandas closures (see
# functions/nlp_udfs.py — workers may not have this package on path;
# must use pyspark's vendored cloudpickle).
import sys as _sys

from pyspark.cloudpickle import register_pickle_by_value as _by_value

_by_value(_sys.modules[__name__])
