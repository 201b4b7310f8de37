"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the DECODE step is a
deterministic stub (clearly marked) — but everything Spark-side is real and
scale-shaped: binary columns, metadata structs, Arrow-batched mapInPandas
with an explicit output schema, frame-index expansion via sequence/explode.

Real-decoder swap-in: replace ``_fake_decode_batch`` with PIL/ffmpeg calls;
nothing else changes — the batch iterator signature, schema, and
partitioning are exactly what a production decode stage uses.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id bigint, n_bytes int, mean_byte double, feature_dim int, features array<double>"
)


def attach_binary(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: payload as an opaque binary column with a
    typed metadata struct — the storage layout for images/audio at scale
    (binary + metadata; decode lazily, never store decoded tensors)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        id_col,
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("content_type"),
            F.length(payload).alias("n_bytes"),
            F.lit("stub").alias("codec"),
        ).alias("media_meta"),
    )


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """STUB decoder: deterministic features from raw bytes.

    NotImplementedError territory for real codecs — this stands in for
    PIL.Image.open / torchaudio.load etc., producing a fixed-dim feature
    vector per payload so downstream plumbing is testable.
    """
    n_bytes = pdf["payload"].map(len)
    mean_byte = pdf["payload"].map(lambda b: (sum(b) / len(b)) if len(b) else 0.0)
    dim = 4
    feats = [
        [float(len(b)), float(sum(b) % 997), float(b[0] if b else 0), float(b[-1] if b else 0)]
        for b in pdf["payload"]
    ]
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "n_bytes": n_bytes.astype("int32"),
            "mean_byte": mean_byte.round(6),
            "feature_dim": dim,
            "features": feats,
        }
    )


def decode_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column.

    mapInPandas keeps whole partitions streaming through Python in Arrow
    batches — the only sane shape for CPU-bound media decode on Spark. The
    partitioning (inherited) and schema (explicit DDL) are the contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_decode_batch(pdf)

    return binary_df.select("doc_id", "payload").mapInPandas(run, schema=DECODE_SCHEMA)


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    length_col: str = "n_chars",
    frame_size: int = 100,
) -> DataFrame:
    """Deterministic frame sampling: one row per sampled frame offset.

    sequence + explode is the Spark-native fan-out (video frame indices,
    audio chunk offsets) — a narrow transform, no shuffle, output rows
    proportional to media duration."""
    n_frames = (F.col(length_col) / frame_size).cast("int") + 1
    return df.select(
        id_col,
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).select(
        id_col,
        "frame_idx",
        (F.col("frame_idx") * frame_size).alias("frame_offset"),
    )


RESIZE_SCHEMA = (
    "doc_id bigint, payload binary, width int, height int, n_bytes int"
)


def resize_stub(binary_df: DataFrame, width: int = 16, height: int = 8) -> DataFrame:
    """STUB image-resize: binary -> binary Arrow-batched transform with the
    metadata updated to the target geometry.

    The stub "resamples" by tiling/truncating the payload to width*height
    bytes (deterministic); a real implementation swaps in
    PIL.Image.resize / cv2.resize inside the same batch iterator. What is
    REAL and scale-shaped: payload stays binary end-to-end (never decoded
    to driver), batches stream through Arrow, output schema is explicit,
    partitioning is inherited (narrow — no shuffle)."""
    from collections.abc import Iterator

    import pandas as pd

    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def rs(b: bytes) -> bytes:
                if not b:
                    return bytes(target)
                reps = (target + len(b) - 1) // len(b)
                return (b * reps)[:target]

            out = pdf["payload"].map(rs)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "width": width,
                    "height": height,
                    "n_bytes": out.map(len).astype("int32"),
                }
            )

    return binary_df.select("doc_id", "payload").mapInPandas(run, schema=RESIZE_SCHEMA)


AUDIO_FRAME = 32
AUDIO_SCHEMA = "doc_id bigint, frame_id int, energy bigint, peak int"


def audio_frames_stub(binary_df: DataFrame, frame: int = AUDIO_FRAME) -> DataFrame:
    """STUB audio framing: the payload plays a mono PCM-8 stream, cut into
    fixed non-overlapping ``frame``-sample windows with per-frame energy
    (sum) and peak statistics; trailing partial frames are dropped (the
    torchaudio.load + unfold shape). Unlike decode_features (1:1), each
    input row FANS OUT to many output rows inside the Pandas batch — the
    second mapInPandas contract a real media pipeline needs. Swap the byte
    loop for a real codec + numpy reshape and nothing else changes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids: list[int] = []
            frame_ids: list[int] = []
            energies: list[int] = []
            peaks: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for f in range(len(b) // frame):
                    w = b[f * frame : (f + 1) * frame]
                    doc_ids.append(int(doc_id))
                    frame_ids.append(f)
                    energies.append(int(sum(w)))
                    peaks.append(int(max(w)))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "frame_id": pd.Series(frame_ids, dtype="int32"),
                    "energy": pd.Series(energies, dtype="int64"),
                    "peak": pd.Series(peaks, dtype="int32"),
                }
            )

    return binary_df.select("doc_id", "payload").mapInPandas(run, schema=AUDIO_SCHEMA)


PIXEL_SCHEMA = "doc_id bigint, pixels array<int>"


def decode_pixels(binary_df: DataFrame, n_pixels: int = 64, stride: int = 7) -> DataFrame:
    """STUB image decode to a fixed grid of grayscale pixels (the aHash
    front-end): pixel k = payload byte at (k*stride) mod n_bytes. Stands in
    for decode->grayscale->8x8 downsample; swap the body for
    PIL.Image.open(...).convert('L').resize((8,8)) and nothing else in the
    pipeline changes — Arrow batch iterator, explicit schema, inherited
    partitioning are the production contract."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels = []
            for b in pdf["payload"]:
                n = len(b)
                pixels.append([int(b[(k * stride) % n]) for k in range(n_pixels)])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "pixels": pixels})

    return binary_df.select("doc_id", "payload").mapInPandas(run, schema=PIXEL_SCHEMA)
