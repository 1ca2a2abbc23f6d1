"""Multimodal column plumbing (north-star extension).

Images/audio/video are opaque ``binary`` columns with typed metadata; the
Spark-side machinery — schema, partition-preserving mapInPandas, Arrow batch
shapes — is real and tested. ``decode_media``'s image path is REAL and
Pillow-gated (PNG/JPEG → numpy array when PIL imports; NotImplementedError
when not, as in this container — exercised by the importorskip'd test in
test_extensions_plumbing.py). Audio/video decode stays a contract stub
(libsndfile/ffmpeg absent), and ``featurize_assets`` uses a deterministic
byte-level featurizer in its place so the pipeline is end-to-end testable
with no imaging dependency.

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
    the shape every multimodal table shares regardless of media type.
    The scan is spread across cores first: every downstream stage here is
    a Python-side mapInPandas whose parallelism is capped by the incoming
    partition count."""
    from market_flow_spark.sources.layout import spread_to_cores

    content = F.encode(F.col(text_col), "UTF-8")
    return spread_to_cores(docs, "doc_id").select(
        "doc_id",
        content.alias("content"),
        F.lit("text/plain").alias("media_type"),
        F.octet_length(F.col(text_col)).alias("byte_len"),
    )


def decode_media(content: bytes, media_type: str):
    """Decode an asset into a media object (image → HxW[xC] uint8 numpy
    array; audio/video still stubbed).

    The image path is REAL when Pillow is importable: any PIL-supported
    container (PNG/JPEG/...) decodes to a numpy array inside the
    featurizer's Arrow batch loop — one import probe per Python worker
    (module-level cache), then pure per-asset decode. Where Pillow is
    absent (this container), the call raises NotImplementedError and
    callers fall back to the deterministic stand-ins below; the Spark-side
    contract (schema, partitioning, batch shape) is identical either way.
    Audio/video decoders (libsndfile / ffmpeg) remain stubs.
    """
    if media_type.startswith("image"):
        try:
            import io

            from PIL import Image  # optional dep, same gate as Prophet
        except ImportError as exc:
            raise NotImplementedError(
                "image decode requires the optional Pillow dependency"
            ) from exc
        with Image.open(io.BytesIO(content)) as img:
            return np.asarray(img)
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


RESIZE_SCHEMA = (
    "doc_id bigint, src_h int, src_w int, height int, width int, "
    "pixels array<float>"
)
FRAME_BYTES = 64
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_md5 string"


def _fake_decode_image(buf: bytes) -> np.ndarray:
    """Deterministic stand-in for an image decoder: interpret the payload as
    a row-major grayscale image with a square-ish shape. Replaces PIL/ffmpeg
    (not in this environment) so resize plumbing is end-to-end testable."""
    arr = np.frombuffer(buf, dtype=np.uint8).astype(np.float64)
    if arr.size == 0:
        return np.zeros((1, 1))
    w = max(1, int(np.sqrt(arr.size)))
    h = arr.size // w
    return arr[: h * w].reshape(h, w)


def _block_mean_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-style resize by averaging the source pixels each output cell
    covers — pure numpy, deterministic, no interpolation library."""
    src_h, src_w = img.shape
    ys = (np.arange(out_h + 1) * src_h) // out_h
    xs = (np.arange(out_w + 1) * src_w) // out_w
    out = np.empty((out_h, out_w))
    for i in range(out_h):
        y0, y1 = ys[i], max(ys[i] + 1, ys[i + 1])
        row = img[y0:y1]
        for j in range(out_w):
            x0, x1 = xs[j], max(xs[j] + 1, xs[j + 1])
            out[i, j] = row[:, x0:x1].mean()
    return out


def resize_assets(assets: DataFrame, height: int = 4, width: int = 4) -> DataFrame:
    """mapInPandas image-resize stage: decode (stubbed to the deterministic
    fake) → block-mean resize to (height, width) → flat pixel vector.
    Partition-preserving map, no shuffle; the real pipeline swaps
    `_fake_decode_image` for a PIL/libvips decode inside the same loop."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, buf in zip(pdf["doc_id"], pdf["content"]):
                img = _fake_decode_image(buf)
                small = _block_mean_resize(img, height, width)
                rows.append(
                    (
                        doc_id,
                        img.shape[0],
                        img.shape[1],
                        height,
                        width,
                        (small / 255.0).ravel().astype(np.float32),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "src_h", "src_w", "height", "width", "pixels"]
            )

    return assets.mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(
    assets: DataFrame, frame_bytes: int = FRAME_BYTES, every_k: int = 4
) -> DataFrame:
    """Row-expanding mapInPandas frame sampler: treat the payload as a fixed
    frame-size "video" and emit every k-th complete frame as its own row
    (doc_id, frame_idx, md5-of-frame). Demonstrates the 1→N Arrow batch
    shape a real ffmpeg frame-sample stage produces; byte-wise, so it holds
    for arbitrary binary payloads."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digests = [], [], []
            for doc_id, buf in zip(pdf["doc_id"], pdf["content"]):
                n_frames = len(buf) // frame_bytes
                for f in range(0, n_frames, every_k):
                    ids.append(doc_id)
                    idxs.append(f)
                    digests.append(
                        hashlib.md5(
                            buf[f * frame_bytes : (f + 1) * frame_bytes]
                        ).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_md5": digests}
            )

    return assets.mapInPandas(run, schema=FRAME_SCHEMA)


AHASH_SCHEMA = "doc_id bigint, ahash bigint"


def ahash_bits(buf: bytes, grid: int = 8) -> int:
    """Perceptual average-hash of one image payload (pure function, shared
    by the Spark stage and its test replica): decode (stubbed to the
    deterministic fake) → block-mean resize to grid×grid → each cell
    contributes bit 1 iff its mean exceeds the grid's overall mean. Bits
    are packed row-major into a SIGNED 64-bit int (bit grid²-1 as the
    two's-complement sign term — the same packing as the text SimHash) so
    the signature joins with plain BIGINT arithmetic."""
    img = _fake_decode_image(buf)
    small = _block_mean_resize(img, grid, grid).ravel()
    mean = small.mean()
    n_bits = grid * grid
    sig = 0
    for i, v in enumerate(small):
        if v > mean:
            sig |= 1 << i
    if sig >= 1 << (n_bits - 1):
        sig -= 1 << n_bits
    return sig


def image_ahash(assets: DataFrame, grid: int = 8) -> DataFrame:
    """Per-asset perceptual hash table (doc_id, ahash) via mapInPandas —
    Arrow-batched, partition-preserving, no shuffle. The real pipeline
    swaps `_fake_decode_image` for PIL/libvips inside the same loop; the
    hash itself (block-mean + mean-threshold, the classic aHash) is
    decoder-agnostic. grid=8 gives the standard 64-bit signature."""
    if grid * grid > 64:
        raise ValueError("grid*grid must fit a 64-bit signature")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "ahash": [ahash_bits(b, grid) for b in pdf["content"]],
                }
            )

    return assets.mapInPandas(run, schema=AHASH_SCHEMA)


def image_neardup_pairs(
    assets: DataFrame,
    max_hamming: int = 3,
    n_tables: int = 4,
    grid: int = 8,
) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash Hamming distance —
    the visual-dedup tier of a multimodal training pipeline (crops,
    re-encodes, and minor edits survive aHash within a few bits).

    Composition of the two scale-safe halves: :func:`image_ahash` is a
    map-only Python stage producing one BIGINT per asset, and the pairing
    reuses :func:`market_flow_spark.extensions.dedup.hamming_block_pairs`
    — rotated-block equi-joins, exact by pigeonhole for
    max_hamming < n_tables, never an all-pairs distance matrix. At 100 TB
    the hash table is corpus-row-sized (16 bytes/asset), so the join cost
    tracks near-dup density, not payload bytes."""
    from market_flow_spark.extensions.dedup import hamming_block_pairs

    return hamming_block_pairs(
        image_ahash(assets, grid),
        sig_col="ahash",
        max_hamming=max_hamming,
        n_tables=n_tables,
        total_bits=grid * grid,
    )


def image_neardup_against(
    new_assets: DataFrame,
    corpus_hashes: DataFrame,
    max_hamming: int = 3,
    n_tables: int = 4,
    grid: int = 8,
) -> DataFrame:
    """Incremental visual dedup: near-dup pairs between a NEW asset batch
    and a PREBUILT corpus hash table (the output of :func:`image_ahash`,
    persisted once — 16 bytes/asset) — tonight's crawl against the indexed
    corpus without re-hashing a single stored image. Cross-side band join
    only (cost scales with |new| × collision rate, not |corpus|²), same
    pigeonhole completeness as :func:`image_neardup_pairs`. Returns
    (new_doc_id, corpus_doc_id, hamming)."""
    from market_flow_spark.extensions.dedup import hamming_block_pairs_against

    return hamming_block_pairs_against(
        image_ahash(new_assets, grid),
        corpus_hashes,
        sig_col="ahash",
        max_hamming=max_hamming,
        n_tables=n_tables,
        total_bits=grid * grid,
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
