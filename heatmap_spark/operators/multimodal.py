"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; decode / feature-extraction / resize / frame
sampling run as Arrow-batched ``mapInPandas`` operators so the payload
bytes never round-trip through row-at-a-time Python.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so
the decode kernel is STUBBED: ``decode_stub_features`` computes
deterministic fake features (byte stats) and ``decode_real`` raises
NotImplementedError unless a codec import succeeds.  Everything
Spark-side — schema, batch iteration, partitioning, explode of sampled
frames — is real and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from heatmap_spark.sources.tables import load_table

MEDIA_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, payload binary"
)

FEATURES_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, "
    "byte_mean double, byte_min int, byte_max int, fake_width int, fake_height int"
)

FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_bytes binary"


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a media-shaped table from the documents fixture: utf-8
    payload bytes standing in for encoded image/audio data."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit("image/fake")).otherwise(
            F.lit("audio/fake")
        ).alias("media_type"),
        F.octet_length("text").alias("n_bytes"),
        F.encode("text", "utf-8").alias("payload"),
    )


def _try_real_codec():
    try:  # pragma: no cover - codec libs absent in this container
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_real(payload: bytes):  # pragma: no cover
    """Real decode path — requires a codec library."""
    if not _try_real_codec():
        raise NotImplementedError(
            "media codecs (PIL/librosa/ffmpeg) not installed; "
            "use decode_stub_features for the deterministic fake path"
        )


def decode_stub_features(media: DataFrame) -> DataFrame:
    """Arrow-batched 'decode': per-payload byte statistics + fake
    dimensions derived deterministically from content length.

    The mapInPandas shape is exactly what a real decoder uses — swap
    the body for PIL/librosa and the plan is unchanged.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            # vectorized over the whole Arrow batch: concatenate every
            # payload into one uint8 buffer and reduce per-payload
            # segments via np.add/min/max.reduceat — no per-row Python
            lens = pdf["payload"].map(len).to_numpy(dtype=np.int64)
            total = int(lens.sum())
            buf = np.frombuffer(
                b"".join(pdf["payload"]), dtype=np.uint8, count=total
            )
            starts = np.zeros(len(lens), dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            nonempty = lens > 0
            sums = np.zeros(len(lens), dtype=np.float64)
            mins = np.zeros(len(lens), dtype=np.int64)
            maxs = np.zeros(len(lens), dtype=np.int64)
            if total and nonempty.any():
                ne_starts = starts[nonempty]
                sums[nonempty] = np.add.reduceat(
                    buf.astype(np.int64), ne_starts
                )
                mins[nonempty] = np.minimum.reduceat(buf, ne_starts)
                maxs[nonempty] = np.maximum.reduceat(buf, ne_starts)
            means = np.divide(
                sums, lens, out=np.zeros_like(sums), where=nonempty
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "byte_mean": means,
                    "byte_min": mins,
                    "byte_max": maxs,
                    "fake_width": (lens % 64) + 1,
                    "fake_height": (lens % 48) + 1,
                }
            )

    return media.mapInPandas(batches, schema=FEATURES_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """'Frame sampling': split each payload into n deterministic byte
    slices (stand-in for video frame extraction), one row per frame.

    Native-expression implementation — the explode happens JVM-side;
    only a real decoder would need mapInPandas here.
    """
    frame = F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx")
    exploded = media.select("doc_id", "n_bytes", "payload", frame)
    return exploded.select(
        "doc_id",
        "frame_idx",
        F.expr(
            f"substring(payload, frame_idx * (CAST(n_bytes / {n_frames} AS INT) + 1) + 1, "
            f"CAST(n_bytes / {n_frames} AS INT) + 1)"
        ).alias("frame_bytes"),
    )


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """media table → stubbed decode features (query-registry shape)."""
    return decode_stub_features(media_table(spark, sf_dir))


def media_frames(spark: SparkSession, sf_dir: str, n_frames: int = 4) -> DataFrame:
    """Frame sampling under the hash-match gate: each payload's byte
    slices are identified by their md5, so the slicing arithmetic
    (offsets, lengths, last-frame remainder) is verified value-for-
    value against DuckDB doing the same substring math — the payload
    bytes are ASCII here, making string-substr ≡ byte-substr."""
    frames = sample_frames(media_table(spark, sf_dir), n_frames)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.octet_length("frame_bytes").alias("frame_len"),
        F.md5("frame_bytes").alias("frame_md5"),
    )


RESIZED_SCHEMA = "doc_id long, src_w int, src_h int, resized binary"


def resize_media(media: DataFrame, out_h: int = 16, out_w: int = 16) -> DataFrame:
    """Nearest-neighbor resize of the stub-decoded pixel grid — the
    'resize' stage of an image pipeline with the DECODE stubbed and
    the RESIZE math real.

    The stub decode views payload byte i of a length-L payload as
    pixel (i // w, i %% w) of an (h, w) grid with w=(L%%64)+1,
    h=(L%%48)+1 (wrapping modulo L — same fake dims as
    :func:`decode_stub_features`).  Resize picks source pixel
    (r·h // out_h, c·w // out_w) for every output (r, c) — the
    standard floor-mapping nearest neighbor, and REAL math: swap the
    grid construction for a PIL decode and the operator is a real
    image resizer with an identical plan shape (Arrow-batched
    mapInPandas, map-only, no shuffle)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        # output index grid is shared by every row
        rr = (np.arange(out_h)[:, None] * np.ones(out_w, dtype=np.int64)).astype(np.int64)
        cc = (np.ones((out_h, 1), dtype=np.int64) * np.arange(out_w)).astype(np.int64)
        for pdf in it:
            outs = []
            ws, hs = [], []
            for payload in pdf["payload"]:
                buf = np.frombuffer(payload, dtype=np.uint8)
                L = len(buf)
                w, h = (L % 64) + 1, (L % 48) + 1
                ws.append(w)
                hs.append(h)
                if L == 0:
                    # nothing to sample from — emit an empty buffer
                    # (mod-by-zero would otherwise poison the task)
                    outs.append(b"")
                    continue
                src = ((rr * h // out_h) * w + (cc * w // out_w)) % L
                outs.append(buf[src].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "src_w": ws,
                    "src_h": hs,
                    "resized": outs,
                }
            )

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


def media_resize(
    spark: SparkSession, sf_dir: str, out_h: int = 16, out_w: int = 16
) -> DataFrame:
    """Declared query: resized thumbnails as (doc_id, src dims, md5 of
    the resized pixel buffer) — the fixture payloads are pure-ASCII
    text bytes, so the DuckDB oracle reconstructs the identical buffer
    with character indexing and the md5 hash-matches byte-for-byte."""
    out = resize_media(media_table(spark, sf_dir), out_h, out_w)
    return out.select(
        "doc_id", "src_w", "src_h", F.md5("resized").alias("resized_md5")
    )
