#!/usr/bin/env python
"""Measured >sf1 escalation point for the routed embedding near-dup tier.

The round-9 verdict accepted the emission-aware width chooser
(`similarity.choose_near_dup_bits`) with one caveat: at every BENCHED
scale the chooser deliberately stays at the base 8 bits (sf1's measured
emission 1.58e6 sits just under the measured 2e6 ≈ 15 s-of-verify cap),
so the routed row's benefit was zero by construction and the escalated
regime was certified only on a synthetic skewed corpus. This script is
the missing real-shaped scale point: a ×4-sf1 embeddings corpus (80 000
rows) generated with exactly `gen_sf1.py`'s construction — fresh unit
vectors with sf0.1's measured own-label centroid pull, NOT clones — where
the 8-bit emission (~16× sf1's ≈ 2.5e7) forces the chooser past 8 bits
end-to-end on data whose similarity structure matches the driver's.

Head-to-head on the same corpus, one process (round 11: the routed
entry's escalation regime now EXECUTES the banded ladder — this script
records the four shapes at the escalation point):
  - chooser: single-block escalation DETECTOR width + banded LAYOUT
    chooser pick, with walls (bounded TakeOrdered sample jobs)
  - routed entry (`embedding_neardup_pairs_routed`): wall + pairs +
    planted recall — since round 11 this is the BANDED LADDER at the
    chosen layout, not a wider single block
  - superseded single-block escalated shape
    (`embedding_neardup_pairs(n_bits=chosen)`): wall + pairs + planted
    recall — kept as the dominated comparator; sign_bucket(bits)
    refines sign_bucket(8), so its pairs ⊆ 8-bit pairs and its recall
    vs 8-bit is exact, reported OVERALL and BY COSINE BAND (the overall
    number is dominated by the marginal-cosine noise tail; the
    near-dup-grade pairs the tier exists for sit at cos → 1)
  - pinned 8-bit tier (`embedding_neardup_pairs`): wall + pairs
  - banded scale-default (4,16) direct: wall + pairs
  - planted-pair recall: 400 deliberate near-dup pairs at cos ≈ 0.97
    (perturbed copies — the shape real corpora have and this generator
    deliberately omits) appended to the corpus; recall of those pairs
    per shape measures each escalation's price on the pairs that
    matter, not on the noise tail.

Deterministic (fixed seeds); writes bench_escalation.json and prints one
JSON line. Run:  python bench_escalation.py  (~4-5 min: the 8-bit side
pays the ~2.5e7-pair verify the routing exists to avoid).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
N_OUT = 80_000  # 4 x sf1's 20k rows
N_PLANT = 400
SEED = 20260817
OUT_PARQUET = "/tmp/mfs_esc_embeddings.parquet"


def gen_corpus() -> None:
    """×4-sf1 embeddings: `gen_sf1._gen_embeddings`'s construction at
    N_OUT rows — fresh unit noise + measured centroid pull, never
    clones (cloning would plant cosine-1.0 twins the base data lacks)."""
    df = duckdb.sql(
        f"SELECT embedding, label FROM '{SRC}/embeddings.parquet'"
    ).fetchdf()
    V = np.vstack(df["embedding"].to_numpy())
    L = df["label"].to_numpy()
    dim = V.shape[1]
    rng = np.random.Generator(np.random.PCG64(SEED))
    cents = np.vstack([V[L == lab].mean(0) for lab in sorted(set(L))])
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    pull = float(
        np.mean([np.mean(V[L == lab] @ cents[lab]) for lab in range(len(cents))])
    )
    w = pull / np.sqrt(1.0 - pull * pull)
    labels = rng.integers(0, len(cents), size=N_OUT)
    g = rng.standard_normal((N_OUT, dim))
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    out = g + w * cents[labels]
    out /= np.linalg.norm(out, axis=1, keepdims=True)
    # planted near-dup pairs: N_PLANT perturbed copies of distinct base
    # vectors at cos ≈ 0.97 (eps = tan(acos(0.97))), ids N_OUT..N_OUT+k —
    # planted pair i is (i, N_OUT + rank(i)), returned for recall scoring
    base_ids = rng.choice(N_OUT, size=N_PLANT, replace=False)
    pert = rng.standard_normal((N_PLANT, dim))
    pert /= np.linalg.norm(pert, axis=1, keepdims=True)
    eps = np.tan(np.arccos(0.97))
    dup = out[base_ids] + eps * pert
    dup /= np.linalg.norm(dup, axis=1, keepdims=True)
    all_vecs = np.vstack([out, dup]).astype(np.float32)
    all_labels = np.concatenate([labels, labels[base_ids]]).astype(np.int32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(all_vecs), dtype=np.int64)),
            "embedding": pa.array(
                list(all_vecs), type=pa.list_(pa.float32())
            ),
            "label": pa.array(all_labels),
        }
    )
    pq.write_table(tbl, OUT_PARQUET)
    return {
        int(b): N_OUT + i for i, b in enumerate(base_ids)
    }  # base_id -> planted dup id


def main() -> None:
    planted = gen_corpus()
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from market_flow_spark.extensions import similarity

    emb = spark.read.parquet(OUT_PARQUET)
    emb.count()  # warm the scan

    t0 = time.perf_counter()
    bits = similarity.choose_near_dup_bits(emb)
    chooser_wall = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    layout = similarity.choose_banded_layout(emb)
    layout_chooser_wall = round(time.perf_counter() - t0, 3)

    # the canonical routed entry — since round 11 its escalation regime
    # executes the banded ladder at the layout chooser's pick
    t0 = time.perf_counter()
    routed = similarity.embedding_neardup_pairs_routed(emb).collect()
    routed_wall = round(time.perf_counter() - t0, 3)

    # the SUPERSEDED single-block escalated shape, kept as the dominated
    # comparator (the round-10 measurement that motivated the redirect)
    t0 = time.perf_counter()
    block = similarity.embedding_neardup_pairs(emb, n_bits=bits).collect()
    block_wall = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    flat = similarity.embedding_neardup_pairs(emb, n_bits=8).collect()
    flat_wall = round(time.perf_counter() - t0, 3)

    # the banded scale-default (4 bands x 16 bits) called directly: same
    # expected emission as a single 14-bit block, recall 1-(1-p^16)^4
    t0 = time.perf_counter()
    banded = similarity.embedding_neardup_pairs_banded(emb).collect()
    banded_wall = round(time.perf_counter() - t0, 3)

    routed_set = {(r["vec1"], r["vec2"]): r["cosine"] for r in routed}
    block_set = {(r["vec1"], r["vec2"]): r["cosine"] for r in block}
    flat_set = {(r["vec1"], r["vec2"]): r["cosine"] for r in flat}
    banded_set = {(r["vec1"], r["vec2"]): r["cosine"] for r in banded}
    assert set(block_set) <= set(flat_set), "wider blocks must refine narrower"
    if tuple(layout) == (4, 16):
        assert set(routed_set) == set(banded_set), (
            "routed entry at the default layout must equal the banded tier"
        )

    # single-block escalation recall by cosine band: the overall ratio is
    # dominated by the marginal-cosine noise tail; the near-dup tail is
    # what matters
    bands = [(0.25, 0.4), (0.4, 0.6), (0.6, 0.9), (0.9, 1.01)]
    band_recall = {}
    for lo, hi in bands:
        denom = [p for p, c in flat_set.items() if lo <= c < hi]
        num = [p for p in denom if p in block_set]
        band_recall[f"{lo}-{hi if hi <= 1 else 1.0}"] = {
            "flat8_pairs": len(denom),
            "block_pairs": len(num),
            "recall": round(len(num) / len(denom), 4) if denom else None,
        }

    # planted near-dup pairs (cos ~ 0.97, the tier's target shape)
    planted_pairs = {(min(a, b), max(a, b)) for a, b in planted.items()}
    plant_flat = sum(1 for p in planted_pairs if p in flat_set)
    plant_routed = sum(1 for p in planted_pairs if p in routed_set)
    plant_block = sum(1 for p in planted_pairs if p in block_set)
    plant_banded = sum(1 for p in planted_pairs if p in banded_set)

    rec = {
        "corpus_rows": N_OUT + N_PLANT,
        "corpus": "x4-sf1 embeddings, gen_sf1 construction, seed 20260817, "
        f"+{N_PLANT} planted cos~0.97 near-dup pairs",
        "detector_bits": int(bits),
        "chooser_wall_sec": chooser_wall,
        "banded_layout": list(layout),
        "layout_chooser_wall_sec": layout_chooser_wall,
        "routed_wall_sec": routed_wall,
        "routed_pairs": len(routed_set),
        "routed_shape": f"banded ladder {tuple(layout)}",
        "block_escalated_wall_sec": block_wall,
        "block_escalated_pairs": len(block_set),
        "flat8_wall_sec": flat_wall,
        "flat8_pairs": len(flat_set),
        "block_recall_vs_8bit_overall": round(
            len(block_set) / max(len(flat_set), 1), 4
        ),
        "block_recall_vs_8bit_by_cosine_band": band_recall,
        "planted_pairs": len(planted_pairs),
        "planted_recalled_8bit": plant_flat,
        "planted_recalled_routed": plant_routed,
        "planted_recalled_block_escalated": plant_block,
        "banded_wall_sec": banded_wall,
        "banded_pairs": len(banded_set),
        "planted_recalled_banded_4x16": plant_banded,
        "routed_speedup_vs_8bit": round(
            flat_wall / max(routed_wall, 1e-9), 2
        ),
        "block_speedup_vs_8bit": round(
            flat_wall / max(block_wall, 1e-9), 2
        ),
        "banded_speedup_vs_8bit": round(
            flat_wall / max(banded_wall, 1e-9), 2
        ),
    }
    Path(__file__).resolve().parent.joinpath("bench_escalation.json").write_text(
        json.dumps(rec, indent=1)
    )
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
