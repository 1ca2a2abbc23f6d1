"""Write-layout operators: file sizing and range-clustering actually
change the physical layout, and the clustered layout actually prunes."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from market_flow_spark.sources.layout import write_clustered, write_sized
from market_flow_spark.tables import load_table


def test_write_sized_bounds_file_record_counts(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()
    path = str(tmp_path / "sized")
    # tiny target → many files, each bounded by the record cap
    write_sized(li, path, target_file_bytes=64 * 256, approx_row_bytes=256)
    files = glob.glob(f"{path}/*.parquet")
    assert len(files) > 1
    back = spark.read.parquet(path)
    assert back.count() == n
    import pyarrow.parquet as pq

    for f in files:
        assert pq.ParquetFile(f).metadata.num_rows <= 64


def test_write_clustered_layout_prunes_row_groups(spark, sf_dir, tmp_path):
    """Each clustered file covers a narrow l_orderkey range, so the min/max
    spread per file is far below the global spread (the property parquet
    file skipping keys on), and a key-range read returns correct rows."""
    li = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "clustered")
    write_clustered(li, path, ["l_orderkey"], n_files=8)
    import pyarrow.parquet as pq

    files = glob.glob(f"{path}/*.parquet")
    assert len(files) >= 4
    spans = []
    bounds = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index("l_orderkey")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append(max(maxs) - min(mins))
        bounds.append((min(mins), max(maxs)))
    global_span = max(b[1] for b in bounds) - min(b[0] for b in bounds)
    # every file's key range is a fraction of the global range
    assert max(spans) < global_span / 2
    # ranges are (near-)disjoint: total covered ≈ global span
    bounds.sort()
    overlaps = sum(
        max(0, bounds[i][1] - bounds[i + 1][0]) for i in range(len(bounds) - 1)
    )
    assert overlaps <= global_span * 0.01

    back = spark.read.parquet(path)
    lo, hi = bounds[0][1], bounds[-1][0]
    want = li.filter(F.col("l_orderkey").between(lo, hi)).count()
    got = back.filter(F.col("l_orderkey").between(lo, hi)).count()
    assert got == want


def test_spread_to_cores_streaming_passthrough_and_memo(spark, tmp_path):
    """spread_to_cores must (a) pass streaming DataFrames through untouched
    (the partition probe would raise on them) and (b) memoize the probe per
    semantic plan so repeated calls from the shingle builders don't re-run
    full physical planning each time."""
    from market_flow_spark.sources.layout import _SPREAD_DECISIONS, spread_to_cores

    # streaming: no probe, no repartition, no raise
    src = tmp_path / "stream_src"
    src.mkdir()
    spark.range(10).write.mode("overwrite").parquet(str(src / "seed"))
    sdf = spark.readStream.schema("id long").parquet(str(src / "seed"))
    assert spread_to_cores(sdf) is sdf

    # batch: decision cached under (semanticHash, target)
    df = spark.range(5).toDF("doc_id")
    before = dict(_SPREAD_DECISIONS)
    out1 = spread_to_cores(df)
    key_new = set(_SPREAD_DECISIONS) - set(before)
    assert len(key_new) == 1
    # second call on an equivalent plan hits the memo (no new entries)
    out2 = spread_to_cores(spark.range(5).toDF("doc_id"))
    assert set(_SPREAD_DECISIONS) - set(before) == key_new
    assert out1.rdd.getNumPartitions() == out2.rdd.getNumPartitions()
