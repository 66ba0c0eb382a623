"""L5 — multimodal columns: media as opaque binary + typed metadata.

The Spark-side contract for image/audio/video in a training-data pipeline:

* a media column is a STRUCT {uri: string, bytes: binary, mime: string}
  (``spark.read.format("binaryFile")`` yields the same shape for real
  files);
* decode / feature-extraction runs as Arrow-batched ``mapInPandas`` — the
  only sane shape for CPU-heavy per-item work at corpus scale (batch
  amortization, no row-at-a-time pickling, executors stream batches);
* partitioning: media rows are fat, so repartition by byte budget, not row
  count, before a decode stage.

The decode internals are STUBBED (no imaging/audio libs in this
environment): ``decode_image_features`` computes deterministic pseudo
features from the bytes. The Spark plumbing — schema, mapInPandas
signature, batch iteration, column contracts — is real and tested; a
production build swaps ``_fake_decode`` for PIL/ffmpeg and nothing else
changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = "struct<uri:string,bytes:binary,mime:string>"

IMAGE_FEATURES_SCHEMA = (
    "doc_id bigint, uri string, mime string, byte_len bigint, "
    "width int, height int, channel_mean double"
)


def attach_fake_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a deterministic media column per document (test stand-in
    for a binaryFile join): bytes derive from the id, so every run and
    every engine sees identical content."""
    return docs.withColumn(
        "media",
        F.struct(
            F.concat(F.lit("mem://img/"), F.col(id_col)).alias("uri"),
            F.sha2(F.col(id_col).cast("string"), 256).cast("binary").alias("bytes"),
            F.lit("image/png").alias("mime"),
        ),
    )


def _fake_decode(raw: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for an image decoder (no imaging libs here).
    Real build: PIL.Image.open(io.BytesIO(raw)) -> (w, h, mean)."""
    digest = hashlib.sha256(raw).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    channel_mean = round(digest[2] / 255.0, 6)
    return width, height, channel_mean


def decode_image_features(media_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode stage: STRUCT media column in, typed feature rows
    out. Batches stream through Arrow; per-batch pandas work is where a
    real decoder (vectorized or thread-pooled) plugs in."""

    def decode(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(bytes(b)) for b in pdf["media_bytes"]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "uri": pdf["media_uri"].values,
                    "mime": pdf["media_mime"].values,
                    "byte_len": [len(bytes(b)) for b in pdf["media_bytes"]],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "channel_mean": [f[2] for f in feats],
                }
            )
            yield out

    flat = media_df.select(
        F.col(id_col),
        F.col("media.uri").alias("media_uri"),
        F.col("media.bytes").alias("media_bytes"),
        F.col("media.mime").alias("media_mime"),
    )
    return flat.mapInPandas(decode, schema=IMAGE_FEATURES_SCHEMA)


FRAME_SCHEMA = (
    "doc_id bigint, uri string, frame_idx int, frame_offset bigint, "
    "frame_sha string"
)


def sample_frames(
    media_df: DataFrame, n_frames: int = 4, id_col: str = "doc_id"
) -> DataFrame:
    """Video-frame sampling plumbing: per media item, extract ``n_frames``
    evenly-spaced frames and emit one typed row per frame — the 1->N
    mapInPandas shape every video/audio pipeline needs (frame sampling,
    audio chunking, shot detection all share it). The decode internals are
    STUBBED (no ffmpeg here): a "frame" is the byte slice at the sampled
    offset; a production build replaces the slicing with
    ``ffmpeg -ss <offset>`` / PyAV and nothing else changes — schema,
    batching, partitioning, and the 1->N row fan-out are the real
    contract.

    Scale shape: media rows are fat, frame rows are thin (offset + hash,
    never the pixels unless asked) — the output shuffles metadata, and the
    heavy bytes never leave the executor that read them."""

    def extract(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [], "uri": [], "frame_idx": [],
                "frame_offset": [], "frame_sha": [],
            }
            for did, uri, raw in zip(
                pdf[id_col], pdf["media_uri"], pdf["media_bytes"]
            ):
                raw = bytes(raw)
                stride = max(1, len(raw) // n_frames)
                for i in range(n_frames):
                    off = i * stride
                    frame = raw[off:off + stride]
                    rows["doc_id"].append(did)
                    rows["uri"].append(uri)
                    rows["frame_idx"].append(i)
                    rows["frame_offset"].append(off)
                    rows["frame_sha"].append(
                        hashlib.sha256(frame).hexdigest()
                    )
            yield pd.DataFrame(rows)

    flat = media_df.select(
        F.col(id_col),
        F.col("media.uri").alias("media_uri"),
        F.col("media.bytes").alias("media_bytes"),
    )
    return flat.mapInPandas(extract, schema=FRAME_SCHEMA)
