"""Query registry — every operator family exposed as a (spark, sf_dir) →
DataFrame callable, each paired with ANSI-SQL in ``oracles.py`` for the
DuckDB differential gate (SURVEY.md §5).

Naming contract: every computed column is aliased identically here and in
the oracle SQL; float aggregates are rounded at the output edge (2dp money,
4dp ratios, 6dp similarities) so cross-engine double-summation noise cannot
flip the value hash.

Scale notes appear per query; the common themes: dims broadcast, predicates
push to parquet, aggregations partial map-side, top-k via windows not
collects, and the only wide shuffles are keyed on the query's natural key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geomesa_cassandra_tools_spark.functions import text as T
from geomesa_cassandra_tools_spark.operators import dedup, geo, joins, relational, similarity
from geomesa_cassandra_tools_spark.sources.tables import load_tables

# ---------------------------------------------------------------- relational


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → pushed filter → hash agg (map-side partials).

    The flagship: the plan is a single parquet scan (3-column ReadSchema,
    shipdate min/max pushed) feeding one partial+final agg over a 6-group
    key — no joins, no sort, shuffle carries 6 rows per partition.
    """
    l = load_tables(spark, sf_dir)["lineitem"]
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.where(F.col("l_shipdate") <= F.lit("1999-01-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q02_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact→fact shuffle join on orderkey, dims broadcast."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.countDistinct("c_custkey").alias("n_customers"),
        )
    )


def q03_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → joins → agg → global top-10
    (total order via (revenue desc, orderkey) so the limit is deterministic)."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .where(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q04_order_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + distinct — the reference's `list_sfts` shape
    (/root/reference/geomesa.py:39-43) on the test corpus."""
    t = load_tables(spark, sf_dir)
    return relational.distinct_values(t["orders"], "o_orderstatus", "o_orderpriority")


def q05_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti existence check — the reference's missing-tables probe
    (/root/reference/geomesa_cassandra.py:33-37) as one join, not N RPCs."""
    t = load_tables(spark, sf_dir)
    return relational.missing_keys(
        t["customer"].select("c_custkey", "c_name", "c_mktsegment"),
        t["orders"].select(F.col("o_custkey").alias("c_custkey")),
        on="c_custkey",
    )


def q06_open_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join + count per segment."""
    t = load_tables(spark, sf_dir)
    open_orders = t["orders"].where(F.col("o_orderstatus") == "O")
    return (
        t["customer"]
        .join(open_orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


def q07_nation_balance_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped bool_and — 'all nodes up' health gate
    (/root/reference/cluster.py:56-59) over customer balances."""
    t = load_tables(spark, sf_dir)
    joined = t["customer"].join(
        F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
    )
    return joined.groupBy("n_name").agg(
        F.bool_and(F.col("c_acctbal") > 0).alias("all_positive"),
        F.count("*").alias("n_customers"),
    )


def q08_event_type_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scatter-gather flatten (/root/reference/cluster.py:84-93): per-branch
    filtered projections unioned, then distinct-count per branch."""
    t = load_tables(spark, sf_dir)
    branches = [
        t["events"].where(F.col("event_type") == et).select("event_type", "user_id")
        for et in ("click", "view", "purchase")
    ]
    return (
        relational.union_all(branches)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def q09_top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number window (deterministic tie-break)."""
    t = load_tables(spark, sf_dir)
    return relational.top_k_per_group(
        t["part"].select("p_brand", "p_partkey", "p_retailprice"),
        ["p_brand"],
        [F.col("p_retailprice").desc(), F.col("p_partkey")],
        3,
        rank_col="rnk",
        keep_rank=True,
    )


def q10_event_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: JSON path over `events.props` (the
    engine's from_json surface), then grouped stats."""
    t = load_tables(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        t["events"]
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 2).alias("avg_k"),
            F.count("*").alias("n"),
        )
    )


def q11_hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming tumbling-window agg (streaming/windows.py
    runs the same plan over readStream)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def q12_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag-gap flags cumulative-summed per user —
    single shuffle on user_id; the streaming twin is `session_window`."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    return (
        t["events"]
        .withColumn("new_sess", new_sess)
        .groupBy("user_id")
        .agg(
            F.sum("new_sess").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


# ------------------------------------------------------------------- dedup


def q13_dedup_doc_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical exact dedup: one keeper (min doc_id) per (lang, length
    bucket) + bucket cardinality."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"].withColumn(
        "bucket", F.floor(F.col("n_chars") / 10).cast("bigint")
    )
    keepers = dedup.canonical_dedup(docs, ["lang", "bucket"], "doc_id").select(
        "lang", "bucket", F.col("doc_id").alias("keeper_doc_id")
    )
    counts = docs.groupBy("lang", "bucket").agg(F.count("*").alias("n_in_bucket"))
    return keepers.join(counts, ["lang", "bucket"])


def q14_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup: pair scores computed only for pairs
    sharing a shingle (equi-join — never a cross join), global top-20."""
    t = load_tables(spark, sf_dir)
    # cached: the self-join consumes the shingle frame twice
    sh = dedup.shingle_sets(t["documents"]).cache()
    return (
        dedup.jaccard_pairs(sh)
        .select("doc_a", "doc_b", "inter", "union_sz", F.round("jaccard", 6).alias("jaccard"))
        .orderBy(F.col("jaccard").desc(), "doc_a", "doc_b")
        .limit(20)
    )


def q15_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature matrix (16 hashes) — deterministic modular
    arithmetic over sorted-rank shingle ids (oracle-exact; xxhash64 swap at
    scale, see operators/dedup.py)."""
    t = load_tables(spark, sf_dir)
    # cached: consumed by both the vocabulary build and the signature agg
    sh = dedup.shingle_sets(t["documents"]).cache()
    vocab = dedup.shingle_vocabulary(sh)
    return dedup.minhash_signatures(sh, vocab, k=16)


def q16_lsh_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash-LSH dedup: 8 bands × 2 rows candidate generation, exact
    Jaccard verification of candidates only."""
    t = load_tables(spark, sf_dir)
    # cached: vocabulary + signatures + exact-Jaccard verify all branch here
    sh = dedup.shingle_sets(t["documents"]).cache()
    vocab = dedup.shingle_vocabulary(sh)
    sigs = dedup.minhash_signatures(sh, vocab, k=16).cache()
    cands = dedup.lsh_candidate_pairs(sigs, bands=8, rows=2)
    return dedup.jaccard_pairs(sh, candidates=cands).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )


def q25_simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 16-bit SimHash over shingle hashes (majority-vote bits)."""
    t = load_tables(spark, sf_dir)
    sh = dedup.shingle_sets(t["documents"]).cache()
    vocab = dedup.shingle_vocabulary(sh)
    return dedup.simhash(sh, vocab, bits=16)


# ------------------------------------------------------------ text analysis


def q17_text_quality_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-level quality profile: token counts, stopword/diversity
    ratios, composite score — all JVM expressions, zero UDFs."""
    t = load_tables(spark, sf_dir)
    txt = F.col("text")
    return (
        t["documents"]
        .select(
            "lang",
            T.token_count(txt).alias("ntok"),
            T.stopword_ratio(txt).alias("stopr"),
            T.distinct_token_ratio(txt).alias("distr"),
            T.quality_score(txt).alias("q"),
        )
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("ntok"), 2).alias("avg_tokens"),
            F.round(F.avg("stopr"), 4).alias("avg_stopword_ratio"),
            F.round(F.avg("distr"), 4).alias("avg_distinct_ratio"),
            F.round(F.avg("q"), 4).alias("avg_quality"),
        )
    )


def q18_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive polynomial fingerprint per doc over token-id stream.

    sum((tid+1)*(pos+1)) mod P — at 100 TB keep the running mod per term
    (here total-then-mod is exact in int64 for corpus-sized docs)."""
    t = load_tables(spark, sf_dir)
    toks = relational.ensure_parallelism(t["documents"].select("doc_id", "text")).select(
        "doc_id", F.posexplode(T.tokens(F.col("text"))).alias("pos", "tok")
    )
    vocab = (
        toks.select("tok")
        .distinct()
        .withColumn("tid", F.row_number().over(Window.orderBy("tok")).cast("bigint") - 1)
    )
    return (
        toks.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(
            (
                F.sum((F.col("tid") + 1) * (F.col("pos") + 1)) % T.FINGERPRINT_MOD
            ).alias("fingerprint")
        )
    )


# -------------------------------------------------------- similarity search


def q19_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for 8 query vectors: broadcast query
    side, JVM zip_with/aggregate scoring, window top-k."""
    t = load_tables(spark, sf_dir)
    emb = t["embeddings"]
    out = similarity.cosine_topk(emb.where(F.col("vec_id") < 8), emb, k=5)
    return out.select(
        "query_id", "cand_id", F.col("rank").alias("rnk"), F.round("cos", 6).alias("cos")
    )


# ---------------------------------------------------------------- analytic


def q20_sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals with grouping flags (hash-free NULL
    disambiguation)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n"),
        )
    )


def q21_purchase_asof_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest view at-or-
    before it — union+window implementation, ONE shuffle on user_id
    (operators/joins.py)."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    out = joins.asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id", "ts"],
        how="inner",
    )
    return out.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id_right").alias("view_id"),
        F.col("ts_right").alias("view_ts"),
    )


# ---------------------------------------------------------------- geospatial


def q22_geo_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bbox query via z2 cover-and-refine: the z2 range cover prunes, the
    exact lon/lat predicate refines — result equals a plain bbox scan (the
    oracle), which is precisely the cover-and-refine contract."""
    t = load_tables(spark, sf_dir)
    pts = t["customer"].select(
        "c_custkey",
        ((F.col("c_custkey") * 7919 % 36000) / 100.0 - 180.0).alias("lon"),
        ((F.col("c_custkey") * 104729 % 18000) / 100.0 - 90.0).alias("lat"),
    )
    # res=6 keeps the bbox cover to a few dozen merged z-ranges — a compact
    # pushable predicate. (res=8 would emit ~2000 BETWEEN terms: correct but
    # hostile to codegen; pruning resolution need not equal data resolution.)
    pts = pts.withColumn("z2", geo.z2(F.col("lon"), F.col("lat"), res=6))
    hits = geo.bbox_filter(
        pts, "lon", "lat", lon_min=-10.0, lon_max=40.0, lat_min=20.0, lat_max=60.0,
        z2_col="z2", res=6,
    )
    return hits.select(
        "c_custkey", F.round("lon", 6).alias("lon"), F.round("lat", 6).alias("lat")
    )


# --------------------------------------------------------------- maintenance


def q23_ttl_surviving_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TTL-expiry semantics (ALTER default_time_to_live analog,
    /root/reference/geomesa_cassandra.py:259-273): survivors within 7 days
    of the corpus max timestamp."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    mx = ev.agg(F.max("ts").alias("mx"))
    return (
        ev.crossJoin(F.broadcast(mx))
        .where(F.col("ts") >= F.col("mx") - F.expr("INTERVAL 7 DAYS"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_survivors"), F.min("ts").alias("first_ts"))
    )


def q24_suppliers_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop broadcast dim join (registry-lookup shape, SURVEY §2.1
    joins): supplier→nation→region, grouped stats."""
    t = load_tables(spark, sf_dir)
    return (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.round(F.avg("s_acctbal"), 2).alias("avg_acctbal"),
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_revenue_by_nation": q02_revenue_by_nation,
    "q03_top_orders": q03_top_orders,
    "q04_order_priorities": q04_order_priorities,
    "q05_customers_without_orders": q05_customers_without_orders,
    "q06_open_order_customers": q06_open_order_customers,
    "q07_nation_balance_health": q07_nation_balance_health,
    "q08_event_type_reach": q08_event_type_reach,
    "q09_top_parts_per_brand": q09_top_parts_per_brand,
    "q10_event_props_stats": q10_event_props_stats,
    "q11_hourly_event_stats": q11_hourly_event_stats,
    "q12_user_sessions": q12_user_sessions,
    "q13_dedup_doc_buckets": q13_dedup_doc_buckets,
    "q14_near_dup_pairs": q14_near_dup_pairs,
    "q15_minhash_signatures": q15_minhash_signatures,
    "q16_lsh_near_dups": q16_lsh_near_dups,
    "q17_text_quality_by_lang": q17_text_quality_by_lang,
    "q18_doc_fingerprints": q18_doc_fingerprints,
    "q19_cosine_topk": q19_cosine_topk,
    "q20_sales_rollup": q20_sales_rollup,
    "q21_purchase_asof_view": q21_purchase_asof_view,
    "q22_geo_bbox": q22_geo_bbox,
    "q23_ttl_surviving_events": q23_ttl_surviving_events,
    "q24_suppliers_by_region": q24_suppliers_by_region,
    "q25_simhash_docs": q25_simhash_docs,
}
