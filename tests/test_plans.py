"""Plan-quality regression tests: pushdown reaches the scan, column pruning
is real, dims broadcast, and no Python UDF sneaks into JVM-only paths —
checked as properties of the optimized physical plan (plans/inspect.py), not
by reading timing tea leaves."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from geomesa_cassandra_tools_spark.plans import inspect
from geomesa_cassandra_tools_spark.queries import QUERIES
from geomesa_cassandra_tools_spark.sources.tables import load_tables

SF = "/root/testdata/sf0.001"


def test_q01_filter_pushdown_and_pruning(spark):
    df = QUERIES["q01_pricing_summary"](spark, SF)
    plan = inspect.explain_str(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # projection pruning: only the 7 needed columns reach the scan
    read = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read and "l_partkey" not in read
    assert "l_quantity" in read and "l_returnflag" in read


def test_q24_dims_are_broadcast(spark):
    plan = inspect.explain_str(QUERIES["q24_suppliers_by_region"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert plan.count("BroadcastExchange") >= 2
    assert "SortMergeJoin" not in plan


def test_q05_anti_join_is_join_not_subquery_loop(spark):
    plan = inspect.explain_str(QUERIES["q05_customers_without_orders"](spark, SF))
    assert "LeftAnti" in plan


def test_equality_predicate_pushes_to_catalog_scan(spark, tmp_path):
    # the engine analog of interpolating WHERE sft='x' into CQL
    path = str(tmp_path / "cat")
    spark.createDataFrame(
        [("ks", "cat", "roads", "cat_roads_z2")],
        "keyspace string, catalog string, sft string, value string",
    ).write.parquet(path)
    df = spark.read.parquet(path).where(F.col("sft") == "roads").select("value")
    pushed = inspect.pushed_filters(df)
    assert "EqualTo(sft,roads)" in pushed


def test_jaccard_candidates_restrict_below_shingle_self_join(spark):
    """The LSH→verify contract: when candidates are given, the shingle
    pairing join itself must be candidate-restricted (b-side equi-joined on
    doc_b), NOT filtered after the pair aggregation — Catalyst cannot push a
    join below an aggregate, so the post-agg shape pays full exact-Jaccard
    cost and the LSH stage buys no work reduction (the 100 TB scale-killer
    VERDICT r3 flagged)."""
    import re

    from geomesa_cassandra_tools_spark.operators import dedup

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d x"), (3, "q w e r t")],
        "doc_id bigint, text string",
    )
    sh = dedup.shingle_sets(docs)
    cands = spark.createDataFrame([(1, 2)], "doc_a bigint, doc_b bigint")
    plan = (
        dedup.jaccard_pairs(sh, candidates=cands)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the pairing join's condition carries BOTH the shingle equality and the
    # b-side doc_b equality — proof the restriction sits below the groupBy
    assert re.search(
        r"Join Inner, \(\(?shingle#\d+ = shingle#\d+\)? AND \(?doc_id#\d+L? = doc_b#\d+L?\)?\)",
        plan,
    ) or re.search(
        r"Join Inner, \(\(?doc_id#\d+L? = doc_b#\d+L?\)? AND \(?shingle#\d+ = shingle#\d+\)?\)",
        plan,
    ), plan


def test_jvm_only_paths_have_no_python_udf(spark):
    for name in (
        "q01_pricing_summary",
        "q14_near_dup_pairs",
        "q19_cosine_topk",
        "q22_geo_bbox",
        "q26_lsh_cosine_topk",
        "q35_parse_compactions",
        "q41_rolling_hash_fingerprints",
    ):
        inspect.assert_no_python_udf(QUERIES[name](spark, SF))


def test_whole_stage_codegen_covers_flagship(spark):
    assert inspect.codegen_stage_count(QUERIES["q01_pricing_summary"](spark, SF)) >= 1


def test_z2_range_predicate_is_pushable_on_stored_column(spark, tmp_path):
    from geomesa_cassandra_tools_spark.operators import geo

    df = spark.createDataFrame(
        [(float(i % 360 - 180), float((i * 7) % 180 - 90)) for i in range(500)],
        "lon double, lat double",
    )
    path = str(tmp_path / "zstore")
    geo.write_z_ordered(df, path, "lon", "lat", num_files=2)
    stored = spark.read.parquet(path)
    out = geo.bbox_filter(
        stored, "lon", "lat", lon_min=0.0, lon_max=20.0, lat_min=0.0, lat_max=20.0,
        z2_col="z2", res=8,
    )
    pushed = inspect.pushed_filters(out)
    assert "GreaterThanOrEqual(z2" in pushed or "Or(And(" in pushed


def test_q131_zordered_layout_scan_prunes_storage(spark):
    """The stored-z2 contract (VERDICT r3 #4): q131 reads the z-ordered
    layout, the bbox cover must reach the parquet reader as range
    predicates, and the reader must DECODE strictly fewer rows than the
    layout holds (min/max skipping on the clustered column) — the property
    q22/q63's computed-z variants structurally cannot have."""
    from geomesa_cassandra_tools_spark import queries as Q

    df = QUERIES["q131_zordered_bbox_scan"](spark, SF)
    pushed = inspect.pushed_filters(df)
    assert "GreaterThanOrEqual(z2" in pushed, pushed
    total = spark.read.parquet(Q._z_ordered_events_path(spark, SF)).count()
    decoded = sum(m.get("numOutputRows", 0) for m in inspect.scan_metrics(df))
    assert 0 < decoded < total, (decoded, total)


def test_q134_z3_stored_layout_scan_prunes_storage(spark):
    """The stored-z3 twin: the space-time cover must reach the reader as
    z3 range predicates and skip rows on the clustered column — the
    property q63's computed-z3 variant structurally cannot have."""
    from geomesa_cassandra_tools_spark import queries as Q

    df = QUERIES["q134_z3_stored_spacetime_scan"](spark, SF)
    pushed = inspect.pushed_filters(df)
    assert "GreaterThanOrEqual(z3" in pushed, pushed
    total = spark.read.parquet(Q._z3_ordered_events_path(spark, SF)).count()
    decoded = sum(m.get("numOutputRows", 0) for m in inspect.scan_metrics(df))
    assert 0 < decoded < total, (decoded, total)


def test_no_accidental_cross_joins_anywhere(spark):
    """Sweep every batch query plan: cartesian products are never OK;
    broadcast nested loops only where a broadcast-small-side scan is the
    intended physical design (brute-force scoring baseline, scalar
    broadcast, centroid assignment)."""
    BNLJ_INTENDED = {
        "q19_cosine_topk",          # brute-force baseline vs broadcast queries
        "q23_ttl_surviving_events", # single-row broadcast of max(ts)
        "q27_ivf_topk",             # corpus × 4 broadcast centroids
        "q168_ivfpq_topk",          # composes q27's centroid assign (corpus × 4 broadcast centroids)
        "q171_ivfpq_residual_topk",  # query slice × 4 broadcast centroids (probe assign; corpus side reads the index)
        "q59_tfidf_top_terms",      # single-row broadcast of count(*) as N
        "q83_fuzzy_name_match",     # dirty names × broadcast clean dim (candidate gen)
        "q86_nearest_hub_assignment",  # points × 8 broadcast hub centroids
        "q94_bigram_lm_score",      # single-row broadcast of vocab size V
        "q208_perplexity_filter",   # single-row broadcast of the train-slice vocab size V
        "q100_token_cooccurrence",  # single-row broadcast of corpus size N
        "q128_token_kl_divergence",  # single-row broadcast of corpus token total N
        "q102_copurchase_triangles",  # 1-row agg × 1-row agg result stitch
        "q108_fk_integrity_audit",  # 1-row checked × 1-row violations stitch
        "q137_lang_rebalance_plan",  # per-lang counts × 1-row (total, n_langs)
        "q139_source_temperature_mixture",  # per-source weights × 1-row totals
        "q146_ann_recall_calibration",  # composes q19's brute-force baseline (broadcast queries × corpus) by design
        "q154_bm25_retrieval",      # single-row broadcast of (N, avgdl) totals
        "q190_dsir_importance_weights",  # B-row bucket table × 1-row (nraw, ntgt) totals
        "q158_hybrid_rrf_retrieval",  # composes q19's brute-force dense stage (broadcast 1 query × corpus) + q154's totals broadcast
    }
    for name, fn in sorted(QUERIES.items()):
        if "stream" in name:
            continue  # streaming plans resolve at query start
        plan = inspect.explain_str(fn(spark, SF))
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
        if name not in BNLJ_INTENDED:
            assert "BroadcastNestedLoopJoin" not in plan, (
                f"{name} plans an unintended broadcast nested loop"
            )


def test_q57_reuses_q26_persisted_signatures(spark):
    """The shared-signature contract: after q26 materializes the corpus
    hyperplane signature index, q57's plan must read it from storage
    (InMemoryTableScan) instead of planning a second corpus BLAS pass
    (mapInPandas over the embeddings scan)."""
    from geomesa_cassandra_tools_spark import queries as Q

    Q.release_shared_caches()
    try:
        # q26 computes + persists; materialize it
        QUERIES["q26_lsh_cosine_topk"](spark, SF).count()
        plan57 = inspect.explain_str(QUERIES["q57_lsh_multiprobe_topk"](spark, SF))
        # (the InMemoryRelation node prints its provenance plan, so the
        # MapInPandas text still APPEARS inside it — the scan node is what
        # proves the signatures come from storage, not a recompute)
        assert "InMemoryTableScan" in plan57, "q57 must reuse the persisted index"
    finally:
        Q.release_shared_caches()
        Q.release_query_caches()


def test_q168_q171_serve_from_persisted_codes_index(spark):
    """The r8-verdict wiring contract: the certified IVF-PQ paths must
    SERVE from the persisted manifest codes index, not re-encode the
    corpus per run — no MapInPandas (the BLAS encode pass) anywhere in
    either plan, and the manifest codes table's data files in the scan.
    q171 additionally never scans the raw corpus for candidates at all
    (its cell fence comes from the index's cid column)."""
    from geomesa_cassandra_tools_spark import queries as Q

    plan168 = inspect.explain_str(QUERIES["q168_ivfpq_topk"](spark, SF))
    assert "MapInPandas" not in plan168, "q168 must not re-encode the corpus"
    assert "gcts_pq_codes" in plan168, "q168 must scan the manifest index"

    plan171 = inspect.explain_str(QUERIES["q171_ivfpq_residual_topk"](spark, SF))
    assert "MapInPandas" not in plan171, "q171 must not re-encode the corpus"
    assert "gcts_ivfpq_res" in plan171, "q171 must scan the manifest index"


def test_dedup_family_reuses_persisted_document_index(spark):
    """The dedup twin of the signature-index contract: after any consumer
    materializes the shared shingle/MinHash index, every other family
    member's plan must read it from storage (InMemoryTableScan) instead of
    re-shingling the corpus — and the builders must hand back the same
    persisted frames, not fresh plans."""
    from geomesa_cassandra_tools_spark import queries as Q

    Q.release_shared_caches()
    try:
        sh = Q._document_shingles(spark, SF)
        assert Q._document_shingles(spark, SF) is sh
        assert sh.storageLevel.useMemory, "index frame must be persisted"
        QUERIES["q16_lsh_near_dups"](spark, SF).count()
        # q58 ends in checkpointed connected components (its plan is an
        # ExistingRDD scan by design), so the lazy-plan consumers carry the
        # assertion: the calibration audit and the incremental matcher
        plan126 = inspect.explain_str(QUERIES["q126_minhash_accuracy"](spark, SF))
        assert "InMemoryTableScan" in plan126, "q126 must reuse the stored index"
        plan132 = inspect.explain_str(
            QUERIES["q132_incremental_lsh_dedup"](spark, SF)
        )
        assert "InMemoryTableScan" in plan132, "q132 must reuse the stored index"
    finally:
        Q.release_shared_caches()
        Q.release_query_caches()


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Bucketing — the co-located-join layout for repeated big joins at
    scale: both sides bucketed+sorted on the join key produce a
    SortMergeJoin with NO Exchange (and no per-join shuffle ever again,
    which is the point at 100 TB where the fact-to-fact shuffle IS the
    bottleneck)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{tmp_path}/bdb'")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        load_tables(spark, SF)["lineitem"].select("l_orderkey", "l_quantity").write.bucketBy(
            4, "l_orderkey"
        ).sortBy("l_orderkey").mode("overwrite").saveAsTable("bdb.bl")
        load_tables(spark, SF)["orders"].select("o_orderkey", "o_totalprice").write.bucketBy(
            4, "o_orderkey"
        ).sortBy("o_orderkey").mode("overwrite").saveAsTable("bdb.bo")
        joined = spark.table("bdb.bl").join(
            spark.table("bdb.bo"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = inspect.explain_str(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join should not shuffle"
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bdb.bl")
        spark.sql("DROP TABLE IF EXISTS bdb.bo")
        spark.sql("DROP DATABASE IF EXISTS bdb")


def test_date_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-partitioned time layout: a filter on the partition column must
    appear as PartitionFilters on the scan (directory pruning — the list
    cost at 100 TB), and the pruned read must equal the plain filter."""
    from geomesa_cassandra_tools_spark.operators.maintenance import (
        write_date_partitioned,
    )

    ev = load_tables(spark, SF)["events"]
    path = str(tmp_path / "events_by_day")
    write_date_partitioned(ev, path, "ts", granularity="day")

    part = spark.read.parquet(path)
    day = "2024-01-05"
    pruned = part.where(F.col("part_day") == F.lit(day).cast("date"))
    plan = inspect.explain_str(pruned)
    assert "PartitionFilters" in plan and "part_day" in plan
    expected = ev.where(F.col("ts").cast("date") == F.lit(day).cast("date")).count()
    assert pruned.count() == expected


def test_shuffle_partition_sizing_policy():
    """The documented 64 MB/partition rule (session.py): floor of 16 for
    small corpora, data-sized in the middle, capped at 2x cores — so a
    scale-factor change re-sizes shuffles instead of silently keeping a
    test-scale constant."""
    from geomesa_cassandra_tools_spark.session import (
        SHUFFLE_PARTITION_FLOOR,
        SHUFFLE_TARGET_BYTES_PER_PARTITION,
        data_sized_shuffle_partitions,
    )

    mb64 = SHUFFLE_TARGET_BYTES_PER_PARTITION
    # tiny corpus (sf0.1 is ~200 MB): the floor binds
    assert data_sized_shuffle_partitions(200 << 20, 32) == SHUFFLE_PARTITION_FLOOR
    # mid-size: data-sized (ceil division), neither floor nor cap
    assert data_sized_shuffle_partitions(20 * mb64 + 1, 32) == 21
    # large corpus: the 2x-cores cap binds
    assert data_sized_shuffle_partitions(10_000 * mb64, 32) == 64
    # the cap also binds the floor on tiny-core boxes
    assert data_sized_shuffle_partitions(0, 4) == 8


def test_q147_salted_join_exchanges_on_salt(spark):
    """The salted join's whole point: the join-side Exchanges hash on
    (event_type, __salt), so no event_type's row set can land in a single
    task — a hot key splits across the 8 salt buckets by construction.
    Assert the physical join keys carry the salt, and the plain (unsalted)
    single-key join shape is absent from the join stage."""
    df = QUERIES["q147_salted_skew_join"](spark, SF)
    plan = inspect.explain_str(df)
    assert "__salt" in plan
    # the equi-join itself keys on [event_type..., __salt...] (formatted
    # explain puts the key lists on their own "Left/Right keys" lines)
    key_lines = [
        l for l in plan.splitlines() if "Left keys" in l or "Right keys" in l
    ]
    assert key_lines and all("__salt" in l for l in key_lines), key_lines


def test_dv_free_manifest_read_plans_no_join(spark, tmp_path):
    """The deletion-vector read path must cost NOTHING until a vector
    exists: a dv-free read_table plan is a plain scan (no join, no
    _metadata projection), and after a dv delete only the vectored
    files' branch gains the broadcast anti-join."""
    from geomesa_cassandra_tools_spark.operators import transactional as tx
    from geomesa_cassandra_tools_spark.plans import inspect as pi

    path = str(tmp_path / "t")
    tx.init_table(
        spark.createDataFrame(
            [(i, f"s{i}") for i in range(8)], "k bigint, s string"
        ).coalesce(2),
        path,
    )
    plan = pi.explain_str(tx.read_table(spark, path))
    assert "Join" not in plan and "_metadata" not in plan

    tx.delete_where(spark, path, "k = 3", mode="dv")
    plan2 = pi.explain_str(tx.read_table(spark, path))
    assert "LeftAnti" in plan2 and "BroadcastHashJoin" in plan2


def test_q180_repetition_gates_stay_map_only(spark):
    """The Gopher repetition gates are bound-once array lambdas: no
    Python UDF, no Generate/explode node — a single scan + one partial
    agg. An explode here would multiply the shuffle by tokens-per-doc
    (~25x) for no semantic gain."""
    df = QUERIES["q180_repetition_filters"](spark, SF)
    inspect.assert_no_python_udf(df)
    plan = inspect.explain_str(df)
    assert "Generate" not in plan, "q180 must not explode tokens"


def test_q182_generated_pruning_opens_only_covered_days(spark):
    """Generated-column derivation is a FILE-LIST property (driver-side,
    before the scan plans): the ts-range read resolves to files of
    exactly the two covered event_date partitions."""
    import datetime as _dt

    from geomesa_cassandra_tools_spark.operators import transactional as tx
    from geomesa_cassandra_tools_spark.queries import _generated_events_path

    path = _generated_events_path(spark, SF)
    w = [
        ("ts", ">=", _dt.datetime(2024, 1, 10, 0, 0)),
        ("ts", "<", _dt.datetime(2024, 1, 12, 0, 0)),
    ]
    opened = tx.resolve_files(path, w)
    assert opened and {f.split("/")[0] for f in opened} == {
        "event_date=2024-01-10", "event_date=2024-01-11"
    }
    assert len(opened) < len(tx.resolve_files(path))


def test_q190_dsir_weight_table_is_broadcast(spark):
    """DSIR's weight table is bucket-cardinality (B=4096 rows) and must
    come back over the gram stream as a BROADCAST join — a shuffled
    join here would re-partition the full exploded gram stream (the
    corpus x ~tokens/doc) against a KB-scale side. The totals fold also
    rides a broadcast (scalar frame)."""
    df = QUERIES["q190_dsir_importance_weights"](spark, SF)
    inspect.assert_no_python_udf(df)
    plan = inspect.explain_str(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan, (
        "the B-row weight table must broadcast, never sort-merge against "
        "the gram stream"
    )


def test_q187_char_gates_stay_map_only(spark):
    """The character-fraction gates keep q180's discipline: bound-once
    arrays, one sort + linear fold per metric — no Python UDF, no
    explode; the only shuffle is the final per-lang agg."""
    df = QUERIES["q187_gopher_char_gates"](spark, SF)
    inspect.assert_no_python_udf(df)
    plan = inspect.explain_str(df)
    assert "Generate" not in plan, "q187 must not explode grams"


def test_r12_text_and_image_paths_stay_vectorized(spark):
    """r12 plan hygiene: the BPE fold encode (q197/q200) and the image
    hash pipeline (q198) carry no row-at-a-time Python UDF — the only
    Python is Arrow-batched mapInPandas (decode) and JVM folds
    (encode); and the banded pair join is an equi-join (the no-cartesian
    sweep covers the rest)."""
    for name in (
        "q197_bpe_encode",
        "q200_bpe_sequence_packing",
        "q198_image_phash_dedup",
        "q192_merge_conditional_clauses",
        "q193_insert_overwrite_backfill",
        "q194_convert_hive_partitioned",
        "q199_column_defaults",
    ):
        inspect.assert_no_python_udf(QUERIES[name](spark, SF))


def test_q208_lm_tables_are_broadcast(spark):
    """The CCNet asymmetry, asserted in-plan: the bigram LM (trained on
    the curated slice) must come back over the corpus bigram stream as
    BROADCAST joins — a sort-merge here would shuffle the full exploded
    bigram stream against KB-scale LM tables. No Python UDF anywhere."""
    df = QUERIES["q208_perplexity_filter"](spark, SF)
    inspect.assert_no_python_udf(df)
    plan = inspect.explain_str(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, (
        "LM count tables must broadcast, never sort-merge against the "
        "corpus bigram stream"
    )
