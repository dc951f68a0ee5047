"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs.

The Spark-side machinery — schema, Arrow batch shape, mapInPandas
iterator signature, partition-size control — is real and tested.  The
codec step itself is STUBBED (no image/audio libraries exist in this
container): ``decode_mode="fake"`` produces a deterministic synthetic
decode from the bytes; ``decode_mode="real"`` raises
NotImplementedError at the exact seam where a Pillow/ffmpeg call would
slot in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id long, n_bytes long, sha256 string, magic string, "
    "width int, height int, n_frames int"
)


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Derive a deterministic opaque binary payload per row (stand-in
    for real image/audio bytes) plus its mime tag — the typed-metadata
    convention: (media binary, media_type string)."""
    return df.withColumn(
        "media", F.to_binary(F.sha2(F.col(text_col), 256), F.lit("hex"))
    ).withColumn(
        "media_type",
        F.element_at(
            F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
            (F.pmod(F.xxhash64(id_col), F.lit(3)) + 1).cast("int"),
        ),
    )


def _fake_decode(media_id: int, payload: bytes) -> dict:
    """Deterministic fake of a codec: dimensions derived from content
    bytes.  A real implementation would replace only this function."""
    h = hashlib.sha256(payload).hexdigest()
    return {
        "media_id": media_id,
        "n_bytes": len(payload),
        "sha256": h,
        "magic": payload[:4].hex(),
        "width": 16 + payload[0] % 240,
        "height": 16 + payload[1] % 240,
        "n_frames": 1 + payload[2] % 30,
    }


def extract_media_meta(
    df: DataFrame,
    id_col: str = "media_id",
    media_col: str = "media",
    decode_mode: str = "fake",
    batch_rows_hint: int = 1024,
) -> DataFrame:
    """mapInPandas feature extraction over binary media columns.

    Iterator form: one Python worker handles many Arrow batches without
    re-initializing codec state — the shape a real decoder needs.
    """
    if decode_mode not in ("fake", "real"):
        raise ValueError(decode_mode)

    narrowed = df.select(F.col(id_col).alias("media_id"), F.col(media_col).alias("media"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # codec init would happen here, once per worker
        if decode_mode == "real":
            raise NotImplementedError(
                "real media decode requires an image/audio library not "
                "present in this environment; plug Pillow/ffmpeg in at "
                "_fake_decode's seam"
            )
        for b in batches:
            out = [
                _fake_decode(int(i), bytes(p))
                for i, p in zip(b["media_id"], b["media"])
            ]
            yield pd.DataFrame(out)

    return narrowed.mapInPandas(run, schema=MEDIA_META_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "media_id",
    media_col: str = "media",
) -> DataFrame:
    """Frame-sampling plumbing: fan a video binary out to one row per
    sampled frame index (real decoder would attach frame bytes)."""
    meta = extract_media_meta(df, id_col, media_col)
    return meta.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
