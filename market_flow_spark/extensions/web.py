"""Web-corpus URL operators: canonicalization, URL-level dedup, domain
rollups — the front door of a CommonCrawl-style training-data pipeline
(CCNet / RefinedWeb / FineWeb all dedup by canonical URL before any
content-level pass, because it removes the bulk of recrawl duplicates for
the cost of ONE projection plus ONE shuffle).

Reference anchor: the reference pipeline keys its ingest on cleaned
natural keys (market-flow `dags/sql/staging` LOWER/TRIM normalize before
joins); URL canonicalization is the same normalize-before-key idea lifted
to web provenance metadata.

Everything here is built-in-function column algebra (regexp + array ops)
— no UDFs, so the whole tier stays inside WholeStageCodegen and the only
shuffle in ``url_dedup``/``domain_stats`` is the final groupBy on the
canonical key. At 100 TB the canonicalization is scan-local; the dedup
shuffle is on a high-cardinality key (canonical URL), which partitions
evenly without salting.

Canonicalization rules (the fixed, documented contract — each is a plain
rewrite every major pipeline applies):

1. drop the ``#fragment``;
2. lowercase scheme and host (path/query case is preserved — paths are
   case-sensitive on origin servers);
3. strip a leading ``www.`` label and an explicit default port
   (``:80``/``:443``);
4. collapse ``//`` runs in the path and strip the trailing slash
   (empty path -> ``/``);
5. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``,
   ``ref``, ``mc_eid``) and sort the survivors so param order never
   splits a dedup group;
6. non-absolute inputs (no ``scheme://host``) pass through as
   ``lower(trim(url))`` — they cannot be canonicalized structurally but
   must still dedup case-insensitively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|ref|mc_eid)(=|$)"


def url_scheme(url: Column) -> Column:
    """Lowercased scheme of an absolute URL ('' when not absolute)."""
    return F.lower(F.regexp_extract(url, SCHEME_RE, 1))


def url_host(url: Column) -> Column:
    """Canonical host: lowercased, leading ``www.`` and explicit default
    port stripped ('' when the URL is not absolute)."""
    hostport = F.lower(F.regexp_extract(url, HOSTPORT_RE, 1))
    return F.regexp_replace(
        F.regexp_replace(hostport, r"^www\.", ""), r":(80|443)$", ""
    )


def url_domain(url: Column) -> Column:
    """Registered domain = last two dot-labels of the canonical host
    (``a.b.shop.com`` -> ``shop.com``). A public-suffix list would refine
    multi-label TLDs (``co.uk``); the two-label rule is the documented
    approximation and is applied identically in the oracle."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def canonical_url(url: Column) -> Column:
    """Apply the module-contract canonicalization (see module docstring).

    Pure column algebra over one row — scan-local, codegen-friendly, no
    shuffle. The fragment is stripped FIRST so every later regexp sees
    the defragmented string.
    """
    u0 = F.trim(url)
    nofrag = F.regexp_replace(u0, r"#.*", "")
    scheme = url_scheme(nofrag)
    host = url_host(nofrag)
    rawpath = F.regexp_extract(nofrag, PATH_RE, 1)
    collapsed = F.regexp_replace(rawpath, r"/{2,}", "/")
    stripped = F.regexp_replace(collapsed, r"/+$", "")
    cpath = F.when(stripped == "", F.lit("/")).otherwise(stripped)
    q = F.regexp_extract(nofrag, r"\?(.*)", 1)
    kept = F.filter(
        F.split(q, "&"),
        lambda p: (p != F.lit("")) & ~p.rlike(TRACKING_RE),
    )
    cq = F.array_join(F.array_sort(kept), "&")
    assembled = F.concat(
        scheme,
        F.lit("://"),
        host,
        cpath,
        F.when(cq != "", F.concat(F.lit("?"), cq)).otherwise(F.lit("")),
    )
    return F.when((scheme == "") | (host == ""), F.lower(u0)).otherwise(
        assembled
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level exact dedup: one row per canonical URL with the kept id
    (min id — deterministic) and the group size.

    Plan: canonicalize in the scan projection, ONE hash aggregate on the
    canonical URL (map-side partial combine makes the shuffle carry one
    row per canonical per task). No second pass, no window.
    """
    return (
        df.select(
            canonical_url(F.col(url_col)).alias("canonical_url"),
            F.col(id_col),
        )
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias(f"keep_{id_col}"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def url_index(df: DataFrame, url_col: str = "url") -> DataFrame:
    """The persisted side of incremental URL dedup: one row per canonical
    URL already in the corpus. Written once (e.g. parquet, partitioned by
    a hash prefix), then every nightly crawl batch joins against it —
    cost ∝ batch, not corpus."""
    return (
        df.select(canonical_url(F.col(url_col)).alias("canonical_url"))
        .distinct()
    )


def url_dedup_against(
    batch: DataFrame,
    index: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental URL dedup: drop batch rows whose canonical URL is
    already in the persisted ``index`` (left_anti equi-join on the
    canonical key), then exact-dedup the survivors within the batch
    (same keep-min rule as :func:`url_dedup`). Returns the batch-grain
    keeper list (canonical_url, keep_<id>, n_dups).

    At 100 TB the anti-join shuffles batch-sized data against the index
    partitioning; with both sides bucketed by canonical hash the join is
    co-located and shuffle-free."""
    canon = batch.select(
        canonical_url(F.col(url_col)).alias("canonical_url"), F.col(id_col)
    )
    fresh = canon.join(index, "canonical_url", "left_anti")
    return fresh.groupBy("canonical_url").agg(
        F.min(id_col).alias(f"keep_{id_col}"),
        F.count(F.lit(1)).alias("n_dups"),
    )


def domain_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per registered-domain crawl rollup: page count, distinct hosts,
    distinct canonical URLs, and the duplication ratio pages/canonical.

    Plan: both the host and the canonical URL are computed in the same
    scan projection; ONE aggregate on domain (count + two distinct-counts
    via the built-in partial-aggregating count(distinct) rewrite). At
    100 TB domain cardinality is ~1e7 — an even hash partitioning; a
    single pathological domain only skews the distinct-count, which AQE's
    skew handling splits.
    """
    from market_flow_spark.functions.aggregates import det_round

    u = F.col(url_col)
    base = df.select(
        url_domain(u).alias("domain"),
        url_host(u).alias("host"),
        canonical_url(u).alias("canonical_url"),
    )
    return base.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("host").alias("n_hosts"),
        F.countDistinct("canonical_url").alias("n_canonical"),
        det_round(
            F.count(F.lit(1)) / F.countDistinct("canonical_url"), 4
        ).alias("dup_ratio"),
    )
