"""snapshot_diff + scd2_merge behavior: statuses, null-safe change
detection, and multi-batch SCD2 history evolution (the invariants the
single-batch SQL oracle can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from market_flow_spark.operators import incremental as inc


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_snapshot_diff_statuses(spark):
    old = _df(spark, [(1, 10.0), (2, 20.0), (3, 30.0)], "k BIGINT, v DOUBLE")
    new = _df(spark, [(2, 20.0), (3, 99.0), (4, 40.0)], "k BIGINT, v DOUBLE")
    out = {r.k: r for r in inc.snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert out[1].diff_status == "removed" and out[1].new_v is None
    assert out[2].diff_status == "unchanged"
    assert out[3].diff_status == "changed" and (out[3].old_v, out[3].new_v) == (30.0, 99.0)
    assert out[4].diff_status == "added" and out[4].old_v is None


def test_snapshot_diff_null_transitions_are_changes(spark):
    old = _df(spark, [(1, None), (2, 2.0), (3, None)], "k BIGINT, v DOUBLE")
    new = _df(spark, [(1, 1.0), (2, None), (3, None)], "k BIGINT, v DOUBLE")
    out = {r.k: r.diff_status for r in inc.snapshot_diff(old, new, ["k"], ["v"]).collect()}
    assert out[1] == "changed"   # NULL -> value
    assert out[2] == "changed"   # value -> NULL
    assert out[3] == "unchanged" # NULL == NULL (null-safe)


def _scd2_batch(spark, rows):
    return _df(spark, rows, "k BIGINT, v STRING")


def _empty_dim(spark):
    return spark.createDataFrame(
        [],
        "k BIGINT, v STRING, valid_from INT, valid_to INT, is_current BOOLEAN",
    )


def test_scd2_two_batch_history(spark):
    dim = _empty_dim(spark)
    # batch 1: k=1 'a', k=2 'b'
    dim = inc.scd2_merge(
        dim, _scd2_batch(spark, [(1, "a"), (2, "b")]), ["k"], ["v"], batch_id=1
    )
    # batch 2: k=1 changes to 'a2', k=2 unchanged, k=3 new
    dim = inc.scd2_merge(
        dim,
        _scd2_batch(spark, [(1, "a2"), (2, "b"), (3, "c")]),
        ["k"],
        ["v"],
        batch_id=2,
    )
    rows = sorted(
        ((r.k, r.v, r.valid_from, r.valid_to, r.is_current) for r in dim.collect())
    )
    assert rows == [
        (1, "a", 1, 2, False),    # closed at batch 2
        (1, "a2", 2, None, True), # reopened with new value
        (2, "b", 1, None, True),  # untouched
        (3, "c", 2, None, True),  # inserted
    ]
    # exactly one open row per live key
    open_counts = (
        dim.filter(F.col("is_current")).groupBy("k").count().collect()
    )
    assert all(r["count"] == 1 for r in open_counts)


def test_scd2_idempotent_batch_replay(spark):
    """Re-applying an identical batch is a no-op: no rows close, no rows
    insert — the property that makes the merge safe to retry."""
    dim = inc.scd2_merge(
        _empty_dim(spark), _scd2_batch(spark, [(1, "a")]), ["k"], ["v"], 1
    )
    again = inc.scd2_merge(
        dim, _scd2_batch(spark, [(1, "a")]), ["k"], ["v"], 2
    )
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, dim.collect()))


def test_scd2_null_attribute_not_a_change(spark):
    dim = inc.scd2_merge(
        _empty_dim(spark), _scd2_batch(spark, [(1, None)]), ["k"], ["v"], 1
    )
    out = inc.scd2_merge(
        dim, _scd2_batch(spark, [(1, None)]), ["k"], ["v"], 2
    ).collect()
    assert len(out) == 1 and out[0].is_current and out[0].valid_from == 1


def test_apply_cdc_compacts_multi_change_keys(spark):
    """With ts_col, only each key's LATEST change applies: an update then
    delete removes the key; a delete then update keeps the updated row."""
    from market_flow_spark.operators.incremental import apply_cdc

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
    )
    changes = spark.createDataFrame(
        [
            (1, "a2", "U", 1), (1, None, "D", 2),   # ends deleted
            (2, None, "D", 1), (2, "b2", "U", 2),   # ends updated
            (4, "d", "I", 1),                        # fresh insert
        ],
        "k bigint, v string, op string, ts bigint",
    )
    out = sorted(
        (r["k"], r["v"])
        for r in apply_cdc(snap, changes, on=["k"], ts_col="ts").collect()
    )
    assert out == [(2, "b2"), (3, "c"), (4, "d")]


def test_pit_join_picks_effective_version(spark):
    """Point-in-time semantics against a 3-version key: before history ->
    NULL, inside each period -> that period's value, at a boundary -> the
    opening version (valid_from inclusive, valid_to exclusive), after a
    truncated history -> NULL."""
    dim = _df(
        spark,
        [
            # key 1: price 10 in [1,3), 20 in [3,5), 30 open from 5
            (1, 10.0, 1, 3), (1, 20.0, 3, 5), (1, 30.0, 5, None),
            # key 2: single CLOSED period [2,4) — history truncated
            (2, 99.0, 2, 4),
        ],
        "k BIGINT, price DOUBLE, valid_from INT, valid_to INT",
    )
    facts = _df(
        spark,
        [(i, k, t) for i, (k, t) in enumerate(
            [(1, 0), (1, 1), (1, 2), (1, 3), (1, 7), (2, 3), (2, 4), (3, 1)]
        )],
        "fid INT, k BIGINT, asof INT",
    )
    out = {
        r.fid: r.price_asof
        for r in inc.pit_join(facts, dim, ["k"], "asof", ["price"]).collect()
    }
    assert out == {
        0: None,   # before key 1's history
        1: 10.0,   # valid_from inclusive
        2: 10.0,
        3: 20.0,   # boundary: old closes, new opens
        4: 30.0,   # open version
        5: 99.0,   # inside key 2's only period
        6: None,   # after truncated history: version closed at 4
        7: None,   # key with no history at all
    }
    # every fact survives exactly once (left semantics)
    assert inc.pit_join(facts, dim, ["k"], "asof", ["price"]).count() == 8
