"""Multimodal column plumbing (north-star extension).

Images/audio/video are opaque ``binary`` columns with typed metadata; the
Spark-side machinery — schema, partition-preserving mapInPandas, Arrow batch
shapes — is real and tested. The actual media decode is STUBBED (the
image/audio libraries are not in this environment): ``decode_media`` raises
NotImplementedError by contract, and ``featurize_assets`` uses a
deterministic byte-level featurizer in its place so the pipeline is
end-to-end testable.

At 100 TB: binary payloads ride in parquet with a small row-group size;
featurization is mapInPandas (Arrow-batched, one Python worker per core,
no shuffle — a pure map stage), and downstream joins use only the compact
(id, feature) output.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = "doc_id bigint, content binary, media_type string, byte_len int"
FEATURE_DIM = 8
FEATURE_SCHEMA = (
    "doc_id bigint, byte_len int, content_md5 string, "
    f"feature array<float>"
)


def to_binary_assets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a source column as an opaque binary asset with typed metadata —
    the shape every multimodal table shares regardless of media type."""
    content = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        content.alias("content"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(F.col(text_col)).alias("byte_len"),
    )


def decode_media(content: bytes, media_type: str):
    """Decode an asset into a media object (image array, audio samples...).

    STUB: real decoders (PIL / libsndfile / ffmpeg) are not available in
    this environment. The Spark-side contract is what matters: callers get
    per-asset decode inside the featurizer's Arrow batch loop.
    """
    raise NotImplementedError(
        f"media decode for {media_type!r} requires optional decoder libraries"
    )


def _byte_features(buf: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in featurizer: mean byte value of `dim` equal
    slices, scaled to [0, 1]. Replaces the model-based embedding the real
    pipeline would compute after decode_media."""
    arr = np.frombuffer(buf, dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(dim, dtype=np.float32)
    chunks = np.array_split(arr.astype(np.float64), dim)
    return np.array(
        [(c.mean() / 255.0) if c.size else 0.0 for c in chunks], dtype=np.float32
    )


def featurize_assets(assets: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """mapInPandas featurization: Arrow-batched, partition-preserving map —
    no shuffle. Each batch arrives as a pandas DataFrame with the binary
    column as Python bytes."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_byte_features(b, dim) for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": pdf["byte_len"].astype("int32"),
                    "content_md5": [
                        hashlib.md5(b).hexdigest() for b in pdf["content"]
                    ],
                    "feature": feats,
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)
