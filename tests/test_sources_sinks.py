"""Source/sink operators (SURVEY.md §2.1): all-varchar CSV ingestion with
lineage, create-if-absent append, upsert, backup-then-replace, CSV/parquet
export, and the medallion pipeline end-to-end."""

from __future__ import annotations

from pyspark.sql import functions as F

from market_flow_spark.operators.incremental import backup_then_replace, upsert
from market_flow_spark.plans.pipeline import run_pipeline
from market_flow_spark.sources.csv_source import (
    all_varchar_schema,
    create_if_absent_append,
    normalize_column_name,
    read_csv_all_varchar,
    with_lineage,
)
from market_flow_spark.sources.sinks import export_csv, export_parquet


def test_normalize_column_name():
    assert normalize_column_name("Market Name") == "market_name"
    assert normalize_column_name("2024 price!") == "col_2024_price"
    assert normalize_column_name("  Lat/Lon ") == "latlon"


def test_all_varchar_schema():
    s = all_varchar_schema(["A B", "c"])
    assert [f.name for f in s.fields] == ["a_b", "c"]
    assert all(f.dataType.typeName() == "string" for f in s.fields)


def test_csv_roundtrip_with_lineage(spark, tmp_path):
    p = tmp_path / "raw.csv"
    p.write_text("Market Name,MP Price,2024 note\nNairobi,12.5,ok\nLagos,,xé\n")
    df = read_csv_all_varchar(spark, str(p), strip_non_ascii=True)
    assert df.columns == ["market_name", "mp_price", "col_2024_note"]
    assert dict(df.dtypes) == {c: "string" for c in df.columns}  # all-varchar
    rows = {r.market_name: r for r in with_lineage(df).collect()}
    assert rows["Nairobi"]._filename == "raw.csv"
    assert rows["Lagos"].mp_price is None  # empty → NULL, typed later
    assert rows["Lagos"].col_2024_note == "x"  # non-ASCII stripped


def test_create_if_absent_append(spark, tmp_path):
    df = spark.range(3).select(F.col("id").alias("k"))
    table = "test_ciaa"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    create_if_absent_append(df, table)
    assert spark.table(table).count() == 3
    create_if_absent_append(df, table)
    assert spark.table(table).count() == 6
    spark.sql(f"DROP TABLE {table}")


def test_upsert_semantics(spark):
    existing = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    incoming = spark.createDataFrame([(2, "B"), (3, "C")], "k int, v string")
    got = {r.k: r.v for r in upsert(existing, incoming, ["k"]).collect()}
    assert got == {1: "a", 2: "B", 3: "C"}  # incoming wins, unmatched survive


def test_backup_then_replace(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS t_btr")
    spark.sql("DROP TABLE IF EXISTS t_btr_backup")
    v1 = spark.createDataFrame([(1,)], "x int")
    v2 = spark.createDataFrame([(2,), (3,)], "x int")
    v1.write.saveAsTable("t_btr")
    backup_then_replace("t_btr", v2)
    assert spark.table("t_btr").count() == 2
    assert spark.table("t_btr_backup").collect()[0].x == 1
    spark.sql("DROP TABLE t_btr")
    spark.sql("DROP TABLE t_btr_backup")


def test_export_sinks(spark, tmp_path):
    df = spark.range(10).select(
        F.col("id"), (F.col("id") % 3).alias("part")
    )
    csv_dir = str(tmp_path / "csv_out")
    export_csv(df, csv_dir)
    back = spark.read.option("header", True).csv(csv_dir)
    assert back.count() == 10

    pq_dir = str(tmp_path / "pq_out")
    export_parquet(df, pq_dir, partition_by=["part"])
    back_pq = spark.read.parquet(pq_dir)
    assert back_pq.count() == 10
    # partition pruning: a filter on the partition column reads 1 partition
    plan = back_pq.filter(F.col("part") == 1)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or back_pq.filter(F.col("part") == 1).count() > 0


def test_run_pipeline(spark, sf_dir, tmp_path):
    written = run_pipeline(spark, sf_dir, str(tmp_path / "warehouse"))
    assert "flagship_wide" in written and "fact_transactions" in written
    # the quality gate ran and every check came back clean
    assert "_quality" in written
    assert "=0" in written["_quality"] and "relationship" in written["_quality"]
    flagship = spark.read.parquet(written["flagship_wide"])
    assert flagship.count() > 0
    # partitioned layout enables pruning on year
    years = [f.name for f in (tmp_path / "warehouse/analytics/flagship_wide").iterdir()
             if f.name.startswith("year=")]
    assert len(years) > 1


def test_register_views_sql_surface(spark, sf_dir):
    """The reference's query surface is SQL-over-models; after
    register_views every raw table and built model answers spark.sql."""
    from market_flow_spark.plans.pipeline import register_views

    names = register_views(spark, sf_dir)
    assert {"lineitem", "stg_transactions", "dim_product", "flagship_wide"} <= set(
        names
    )
    top = spark.sql(
        """
        SELECT product_name, SUM(price) AS revenue
        FROM flagship_wide GROUP BY product_name
        ORDER BY revenue DESC LIMIT 5
        """
    ).collect()
    assert len(top) == 5 and top[0].revenue >= top[-1].revenue
    joined = spark.sql(
        """
        SELECT d.p_type, COUNT(*) AS n
        FROM fact_transactions f JOIN dim_product d ON f.product_id = d.p_partkey
        GROUP BY d.p_type
        """
    ).collect()
    assert len(joined) > 0


def test_csv_encoding_fallback_chain(spark, tmp_path):
    """S2: the per-file utf-8 → latin1 → iso-8859-1 retry loop
    (/root/reference/utils/csv_utils.py:9-18): a clean utf-8 file and a
    latin-1 file (whose bytes are NOT valid utf-8) land in one DataFrame,
    each decoded with the first encoding that accepts it."""
    from market_flow_spark.sources.csv_source import read_csv_with_encoding_fallback

    (tmp_path / "utf8.csv").write_bytes(
        "Market,Price\nMünchen,3.0\n".encode("utf-8")
    )
    (tmp_path / "latin1.csv").write_bytes(
        "Market,Price\nSão Paulo,1.5\nZürich,2.0\n".encode("latin-1")
    )
    df = read_csv_with_encoding_fallback(spark, str(tmp_path))
    names = {r.market for r in df.collect()}
    assert names == {"München", "São Paulo", "Zürich"}

    stripped = read_csv_with_encoding_fallback(spark, str(tmp_path), strip_non_ascii=True)
    assert {r.market for r in stripped.collect()} == {"Mnchen", "So Paulo", "Zrich"}


def test_csv_encoding_latin1(spark, tmp_path):
    """S2: encoding-fallback path — a latin-1 file read with the right
    encoding keeps its characters; with strip_non_ascii they are removed
    (the reference's `encode('ascii','ignore')` pass)."""
    p = tmp_path / "latin1.csv"
    p.write_bytes("Market,Price\nSão Paulo,1.5\nZürich,2.0\n".encode("latin-1"))
    df = read_csv_all_varchar(spark, str(p), encoding="ISO-8859-1")
    names = {r.market for r in df.collect()}
    assert names == {"São Paulo", "Zürich"}
    stripped = read_csv_all_varchar(
        spark, str(p), encoding="ISO-8859-1", strip_non_ascii=True
    )
    assert {r.market for r in stripped.collect()} == {"So Paulo", "Zrich"}
