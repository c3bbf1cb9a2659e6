"""Multimodal column plumbing (SURVEY.md §2.2 LLM-ext multimodal row):
opaque binary payload columns with typed metadata, a decode/feature
pandas-UDF stage, and frame sampling over chunked payloads.

The container has no image/audio codecs, so the DECODE step is a
deterministic fake (features derived from the bytes themselves) behind
`decode_image_real`, which raises NotImplementedError — the Spark-side
plumbing (BinaryType columns, mapInPandas batch iteration, schema,
partitioning) is real and tested, and swapping the fake for a codec
(PIL/ffmpeg) changes one function.

Scale notes: binary payloads ride in parquet as BYTE_ARRAY — scans
prune them unless projected; mapInPandas streams Arrow batches so a
partition of 100 MB images never materializes as one Python object;
frame arrays stay bounded (sampling happens inside the expression, not
after explode).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FRAME_BYTES = 16  # synthetic "frame" chunk size for the frame-sampling op


def decode_image_real(payload: bytes) -> dict:
    """Real codec hook — not available in this container (no PIL/ffmpeg).

    Cited stub per the project brief; replace with e.g. PIL.Image.open
    on a cluster image that ships codecs."""
    raise NotImplementedError("image codecs not available in this container")


def fake_decode_features(payload: bytes) -> dict:
    """Deterministic fake decode: 'image' metadata derived from bytes.
    Keeps the full pipeline testable without codecs."""
    n = len(payload)
    return {
        "width": n % 640,
        "height": (n * 7) % 480,
        "channels": 3,
        "first_byte": payload[0] if n else -1,
    }


def to_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload column + typed metadata — the
    multimodal table shape (payload BINARY, meta STRUCT)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("content_md5"),
            F.lower(F.hex(payload)).substr(1, 8).alias("magic_hex"),
        ),
    )


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode/feature stage: binary in, typed features out.
    Arrow-batched; the decode function is pluggable (fake here)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(fake_decode_features)
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "width": feats.map(lambda d: d["width"]),
                "height": feats.map(lambda d: d["height"]),
                "channels": feats.map(lambda d: d["channels"]),
                "first_byte": feats.map(lambda d: d["first_byte"]),
            })

    return df.select(id_col, "payload").mapInPandas(
        run, schema="doc_id long, width long, height long, channels long, first_byte long")


AUDIO_WINDOW = 256  # samples per analysis window for the audio stage


def audio_window_features(df: DataFrame, id_col: str = "doc_id",
                          window: int = AUDIO_WINDOW) -> DataFrame:
    """mapInPandas audio feature stage: binary payload in, per-doc
    loudness features out. The DECODE is the deterministic fake codec
    (byte b -> PCM sample (b-128)/128, i.e. unsigned 8-bit PCM) — a real
    pipeline swaps it for soundfile/ffmpeg; everything else (Arrow
    batches, numpy vectorization, windowing, schema) is the real shape.

    Output: n_samples, n_windows (ceil), rms_w1 = RMS of the first
    window, peak = max |sample| — both rounded to 1e-6 so an oracle that
    recomputes them from the same bytes matches exactly.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def feats(b: bytes):
            s = (np.frombuffer(b, dtype=np.uint8).astype(np.float64)
                 - 128.0) / 128.0
            n = len(s)
            w1 = s[:window]
            rms = float(np.sqrt((w1 * w1).mean())) if n else 0.0
            peak = float(np.abs(s).max()) if n else 0.0
            return n, -(-n // window), round(rms, 6), round(peak, 6)

        for pdf in batches:
            rows = pdf["payload"].map(feats)
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "n_samples": rows.map(lambda r: r[0]),
                "n_windows": rows.map(lambda r: r[1]),
                "rms_w1": rows.map(lambda r: r[2]),
                "peak": rows.map(lambda r: r[3]),
            })

    return df.select(id_col, "payload").mapInPandas(
        run, schema=("doc_id long, n_samples long, n_windows long, "
                     "rms_w1 double, peak double"))


def frames_col(text_col: str = "text", frame_bytes: int = FRAME_BYTES) -> Column:
    """Chunk a payload into fixed-size 'frames' (array<binary>)."""
    n_frames = F.ceil(F.length(text_col) / frame_bytes).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: F.encode(
            F.substring(F.col(text_col), i * frame_bytes + 1, frame_bytes), "UTF-8"),
    )


def sample_frames(frames: Column, every: int = 3) -> Column:
    """Keep every k-th frame (0-based index) — the frame-sampling op."""
    return F.filter(frames, lambda x, i: i % every == 0)


def resize_payloads(df: DataFrame, id_col: str = "doc_id",
                    out_w: int = 32, out_h: int = 24) -> DataFrame:
    """mapInPandas resize stage: binary in, resized binary + dims out.

    The resize itself is a deterministic fake (crop to out_w*out_h
    bytes — a real implementation would decode via PIL/libvips, which
    this container lacks; swap `_fake_resize` for the real kernel).
    The Spark-side plumbing is real: Arrow-batched binary columns in
    and out, stable schema, no shuffle (map-only stage).
    """
    target = out_w * out_h

    def _fake_resize(b: bytes) -> bytes:
        return bytes(b[:target])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(_fake_resize)
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "out_w": out_w,
                "out_h": out_h,
                "n_out_bytes": resized.map(len),
                "resized": resized,
            })

    return df.select(id_col, "payload").mapInPandas(
        run, schema=("doc_id long, out_w int, out_h int, "
                     "n_out_bytes long, resized binary"))
