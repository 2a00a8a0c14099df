package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan regression tests: the scale-critical plan shapes claimed in
  * SURVEY.md §4 must actually appear — filter/column pushdown into the
  * parquet scan, broadcast joins for dims, TakeOrderedAndProject for top-k,
  * partial (two-phase) aggregation. A change that silently degrades one of
  * these (e.g. a filter that stops pushing past a new projection) fails here
  * long before it shows up as an sf0.1 bench regression.
  */
class PlanSpec extends SparkSuite {

  private def plan(name: String): String = {
    val df: DataFrame = Queries.byName(name).run(spark, sfDir)
    df.queryExecution.explainString(FormattedMode)
  }

  test("filter_project pushes every predicate and prunes to 5 columns") {
    val p = plan("filter_project")
    assert(p.contains("PushedFilters:"), p)
    Seq("EqualTo(l_returnflag,R)", "GreaterThan(l_quantity,45.0)",
      "GreaterThanOrEqual(l_discount,0.05)", "LessThanOrEqual(l_discount,0.08)")
      .foreach(f => assert(p.contains(f), s"missing pushed filter $f\n$p"))
    // column pruning: unused lineitem columns must not reach the scan
    Seq("l_partkey", "l_suppkey", "l_tax", "l_commitdate")
      .foreach(c => assert(!p.contains(c), s"scan should not read $c\n$p"))
  }

  test("join_inner_star broadcasts all dimension sides, never sort-merges") {
    val p = plan("join_inner_star")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p)
    assert(!p.contains("SortMergeJoin"), p)
    // lineitem scan pruned to join key + measures
    assert(p.contains("struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"), p)
  }

  test("topk_orders plans as distributed TakeOrderedAndProject, not a global sort") {
    val p = plan("topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("rangepartitioning"), p)
  }

  test("ref_partition_count is a two-phase (partial/final) hash aggregate") {
    val p = plan("ref_partition_count")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_count"), p)
  }

  test("join_range keeps the equi-key hash join; range predicate stays a residual") {
    val p = plan("join_range")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("no query plans a Cartesian product (broadcast NLJ only where intended)") {
    // dedup_embedding_cosine / sim assignment stages use a deliberate
    // broadcast nested-loop (all-pairs scoring); a CartesianProduct node
    // anywhere is always a bug
    Queries.all.foreach { q =>
      val p = q.run(spark, sfDir).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"${q.name} plans a cartesian:\n$p")
    }
  }

  test("catalog-table reads keep Catalyst column pruning") {
    val p = plan("catalog_agg")
    // resolving through the catalog must produce the same pruned parquet
    // scan as a path read: only the grouping column is materialized
    assert(p.contains("ReadSchema: struct<o_orderstatus:string>"), p)
  }

  test("dedup_decontaminate broadcasts the benchmark shingle set") {
    val p = plan("dedup_decontaminate")
    // the eval set is tiny by nature — its shingles must broadcast, never
    // shuffle the corpus side
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // corpus scan pruned to the two columns the shingle explode needs
    assert(!p.contains("n_chars") && !p.contains("source"), p)
  }

  test("text_vocab ranks without a vocabulary-wide single-reducer window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = Queries.byName("text_vocab").run(spark, sfDir)
    // empty-partitionSpec windows funnel their whole input through one
    // reducer — allowed only over the per-partition count rows (bounded by
    // cluster width), never over the token rows themselves
    val bad = df.queryExecution.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty &&
        w.child.output.exists(_.name == "token") => w
    }
    assert(bad.isEmpty,
      s"single-reducer window over the vocabulary:\n${bad.mkString("\n")}")
  }

  test("agg_footer_stats answers from parquet footer metadata (PushedAggregation)") {
    val p = plan("agg_footer_stats")
    assert(p.contains("PushedAggregation"), p)
    Seq("COUNT(*)", "MIN(l_orderkey)", "MAX(l_extendedprice)")
      .foreach(a => assert(p.contains(a), s"missing pushed aggregate $a\n$p"))
  }

  test("text_encode broadcasts the vocabulary, never shuffles the corpus for it") {
    val p = plan("text_encode")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("sim_kmeans: both assignment passes are broadcast joins against centroids") {
    val p = plan("sim_kmeans")
    // the k-row centroid side must broadcast in BOTH Lloyd iterations; a
    // SortMergeJoin here would shuffle the full corpus against 8 rows
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("text_repetition rebalances the scan before the per-row n-gram work") {
    val p = plan("text_repetition")
    // the bigram/trigram construction is map-side; without the round-robin
    // exchange it all runs on the single scan partition (measured 14 s
    // single-threaded at sf0.1)
    assert(p.toLowerCase.contains("roundrobinpartitioning"), p)
  }

  test("join_fuzzy stays an equi-join on the block key, never a cross product") {
    val p = plan("join_fuzzy")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // levenshtein must run post-join on block candidates, not in a join cond
    assert(p.contains("levenshtein"), p)
  }

  test("text_quality_gate broadcasts the per-language thresholds back") {
    val p = plan("text_quality_gate")
    // the threshold side is a tiny aggregated frame — must ship broadcast,
    // not reshuffle the scored corpus
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("graph_ppr keeps the pagerank plan discipline: checkpointed adjacency, no window") {
    val p = plan("graph_ppr")
    // the degree-annotated adjacency is localCheckpoint'd (round-10 lineage
    // truncation), so the declared query's plan reads it as a pinned RDD
    // scan — the collect_set aggregation shape itself is pinned by the
    // pageRank unit spec
    assert(p.contains("ExistingRDD"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("graph_pagerank builds the adjacency in one aggregation, no window pass") {
    // degree rides the collect_set aggregation; a Window operator here means
    // the two-shuffle distinct+count-over formulation crept back. This pin
    // deliberately blocks the documented unbounded-degree fallback
    // (distinct + count over partition, Graph.scala) — adopting that swap is
    // a conscious perf decision and must relax the Window assertion with it.
    // The declared query checkpoints the adjacency, so the assertion runs on
    // the un-truncated adjacency builder over a raw edge frame.
    import org.apache.spark.sql.functions.col
    val edges = spark.range(10).select((col("id") % 5).as("src"), (col("id") % 3).as("dst"))
    val p = operators.Graph.degreeAdjacency(edges)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("collect_set"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
    // and the declared query keeps the no-window / no-cartesian discipline
    val pq = plan("graph_pagerank")
    assert(!pq.contains("Window"), pq)
    assert(!pq.contains("CartesianProduct"), pq)
  }

  test("graph_triangles closes wedges with key joins, never a cartesian") {
    val p = plan("graph_triangles")
    // wedge generation and closing are equi-joins (u key / (w1,w2) key)
    // with inequality residuals; the only nested loops allowed are the
    // 1-row scalar broadcasts at the top
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
    // the support filter must aggregate BEFORE the census (two-phase count
    // on the pair key), not re-derive pairs downstream
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
  }

  test("ml_auc runs its only window over the bounded level frame") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, Aggregate => LAgg}
    val opt = Queries.byName("ml_auc").run(spark, sfDir)
      .queryExecution.optimizedPlan
    val wins = opt.collect { case w: LWindow => w }
    assert(wins.size == 1, s"expected exactly one window, got ${wins.size}")
    // the window's input must already be aggregated (score levels), never
    // the raw per-vector score stream
    assert(wins.head.collectFirst { case a: LAgg => a }.nonEmpty,
      s"window reads a non-aggregated child:\n${wins.head}")
  }

  test("events_unique_rolling fans out map-side, no range join") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    val p = plan("events_unique_rolling")
    // the ×7 window-end fanout is a Generate (explode), and the distinct
    // count is a two-phase aggregate; a nested-loop range join means the
    // linear formulation regressed
    assert(p.contains("Generate"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the only join is the 1-row max-day scalar cross — a BETWEEN-style
    // range join against the day frame would surface as a second join or
    // a non-cross condition
    val joins = Queries.byName("events_unique_rolling").run(spark, sfDir)
      .queryExecution.optimizedPlan.collect { case j: LJoin => j }
    assert(joins.size == 1, s"expected only the scalar cross, got ${joins.size}")
  }

  test("orders_abc_pareto windows over the part aggregate, not the fact") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, Aggregate => LAgg}
    val opt = Queries.byName("orders_abc_pareto").run(spark, sfDir)
      .queryExecution.optimizedPlan
    val wins = opt.collect { case w: LWindow => w }
    assert(wins.size == 1, s"expected exactly one window, got ${wins.size}")
    assert(wins.head.collectFirst { case a: LAgg => a }.nonEmpty,
      s"running-share window must read the per-part aggregate:\n${wins.head}")
  }

  test("events_top_paths takes its top-20 as TakeOrderedAndProject") {
    val p = plan("events_top_paths")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("sim_dim_stats aggregates moments in two phases") {
    val p = plan("sim_dim_stats")
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"dim stats needs no join at all\n$p")
  }

  test("agg_pricing_summary scans only the aggregated columns") {
    val p = plan("agg_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(!p.contains("l_orderkey"), s"pricing summary should not read the key columns\n$p")
  }

  test("scd2_merge is a single full-outer join over the open slice, no window") {
    import org.apache.spark.sql.catalyst.plans.FullOuter
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin, Union => LUnion, Window => LWindow}
    val opt = Queries.byName("scd2_merge").run(spark, sfDir)
      .queryExecution.optimizedPlan
    val joins = opt.collect { case j: LJoin => j }
    assert(joins.size == 1 && joins.head.joinType == FullOuter,
      s"expected exactly one FULL OUTER join, got ${joins.map(_.joinType)}")
    // a Window here means a second full pass over the dimension crept in
    assert(opt.collect { case w: LWindow => w }.isEmpty, opt.toString)
    // history rows ride a single union leg; in the declared query the
    // current frame has no closed rows, so the leg may constant-fold away
    assert(opt.collect { case u: LUnion => u }.size <= 1, opt.toString)
  }

  test("text_bpe caches each round's winner — executed job count stays linear") {
    // The pin that keeps the O(rounds²) lineage replay out: uncached, every
    // round re-runs all prior rounds' aggregations (measured 10.8 s vs ~1 s
    // at sf0.1). With the per-round cache the whole query ran 35 jobs at
    // sf0.001 (local[4] may differ slightly under AQE — the quadratic shape
    // is a multiple, not a margin).
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // run the raw trainer, not the declared query: text_bpe is memoized
      // per (session, dir) since round 10, so its declared plan is a pinned
      // checkpoint scan — the quadratic-lineage pin must hold on the
      // training loop itself
      val df = operators.TextAnalysis
        .bpeMerges(Tables.load(spark, sfDir, "documents"))
      assert(df.queryExecution.explainString(FormattedMode)
        .contains("InMemoryTableScan"), "per-round winner cache missing")
      df.write.format("noop").mode("overwrite").save()
      // listener events are asynchronous: poll until the count stabilizes
      var prev = -1
      var waited = 0
      while (prev != jobs.get && waited < 5000) {
        prev = jobs.get; Thread.sleep(250); waited += 250
      }
      assert(jobs.get <= 70, s"text_bpe ran ${jobs.get} jobs — quadratic lineage?")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      Caches.release(spark)
      spark.catalog.clearCache()
    }
  }

  test("graph_pagerank's final plan is shallow — caches truncate iteration lineage") {
    val df = Queries.byName("graph_pagerank").run(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p.take(500))
    // round-10 discipline, r19 form: the adjacency/nodes substrate and each
    // round's contrib are CACHED co-partitioned (Graph.iterSubstrate), so
    // the FINAL action EXECUTES only the last readout's exchanges — a deep
    // executed tree means a cache was dropped and iteration lineage is
    // compounding again. Count real exchange NODES in the executed tree
    // (descending through AQE stages, stopping at InMemoryTableScan leaves
    // — execution stops there too): the plan STRING is no longer a valid
    // proxy because InMemoryRelation.toString recursively prints its
    // cached child plan, nesting one full iteration per round.
    assert(p.contains("ExistingRDD"), p.take(3000))
    def executedExchanges(plan: org.apache.spark.sql.execution.SparkPlan): Int = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.Exchange
      val self = plan match { case _: Exchange => 1; case _ => 0 }
      val kids = plan match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      self + kids.map(executedExchanges).sum
    }
    val n = executedExchanges(df.queryExecution.executedPlan)
    assert(n <= 13,
      s"final pagerank plan executes $n exchanges — iteration lineage is compounding\n${p.take(3000)}")
  }

  test("sample_reservoir takes its k-min sample as TakeOrderedAndProject") {
    val p = plan("sample_reservoir")
    // k smallest hashes = global top-k: per-partition bounded heaps, never
    // a global sort of the fact
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("quality_kendall_tau joins the domain grid, never the fact") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin, Aggregate => LAgg}
    val opt = Queries.byName("quality_kendall_tau").run(spark, sfDir)
      .queryExecution.optimizedPlan
    // the inequality pair join is allowed ONLY over the aggregated
    // (x, y, count) grid — both join children must sit above an Aggregate;
    // a raw lineitem leaf under the join means the domain-grid reduction
    // was lost and the pair count went corpus-quadratic
    val pairJoins = opt.collect { case j: LJoin => j }
      .filter(j => j.condition.exists(_.toString.contains(">")))
    assert(pairJoins.nonEmpty, s"expected the grid inequality join\n$opt")
    pairJoins.foreach { j =>
      assert(j.children.forall(c =>
        c.collectFirst { case a: LAgg => a }.nonEmpty),
        s"pair join reads a non-aggregated child\n$j")
    }
    // and the scan reads only the two grid columns
    val p = plan("quality_kendall_tau")
    assert(!p.contains("l_extendedprice"), "kendall scan should prune to qty+discount")
  }

  test("multimodal_hist16 rebalances the payload scan before the explode") {
    val p = plan("multimodal_hist16")
    // the per-codepoint explode is map-side; without the round-robin
    // exchange all of it runs on the single scan partition (the
    // text-family spread stance)
    assert(p.toLowerCase.contains("roundrobinpartitioning"), p)
  }

  test("events_power_law takes its top-50 via bounded heaps and scans events once per branch") {
    val p = plan("events_power_law")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
  }

  test("dedup_tfidf_cosine joins on the term key, never a cartesian") {
    val p = plan("dedup_tfidf_cosine")
    // the pair join must ride the df-capped term posting lists (an
    // equi-join on t) — a cartesian or nested loop means the cap filter
    // stopped reaching the join
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
  }

  test("orders_basket_size aggregates on the fact's natural key, one pass") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    val opt = Queries.byName("orders_basket_size").run(spark, sfDir)
      .queryExecution.optimizedPlan
    // per-order rollup + size histogram + 1-row total: the only join is
    // the broadcast scalar cross — anything else means a second fact scan
    // crept in through the share computation
    val joins = opt.collect { case j: LJoin => j }
    assert(joins.size == 1, s"expected only the scalar cross, got ${joins.size}")
  }

  test("graph_label_prop takes each round's arg-min as an aggregate, no window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val opt = Queries.byName("graph_label_prop").run(spark, sfDir)
      .queryExecution.optimizedPlan
    // the per-node mode is min(struct(-cnt, label)) — a two-phase hash
    // aggregate; a Window here means a sort + single pass over the
    // neighbor-label frame crept back in (3× per query, once per round)
    assert(opt.collect { case w: LWindow => w }.isEmpty, opt.toString)
    val p = plan("graph_label_prop")
    assert(p.contains("partial_min") || p.contains("partial_count"), p)
  }

  test("fk_integrity audits each edge in one pass — no anti-join second scan") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    val opt = Queries.byName("fk_integrity").run(spark, sfDir)
      .queryExecution.optimizedPlan
    val joins = opt.collect { case j: LJoin => j }
    // one LEFT join per FK edge; an orphan count via a separate anti-join
    // would double the child-table scans
    assert(joins.size == 7, s"expected 7 edge joins, got ${joins.size}")
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    assert(!joins.exists(_.joinType == LeftAnti), opt.toString)
  }

  test("events_max_concurrency never sweeps globally: every window is partitioned") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val opt = Queries.byName("events_max_concurrency").run(spark, sfDir)
      .queryExecution.optimizedPlan
    // the +1/−1 sweep must run per day and the sessionizer per user; an
    // empty partitionSpec is the classic single-reducer interval sweep
    val bad = opt.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
    assert(bad.isEmpty, s"global ordered sweep:\n${bad.mkString("\n")}")
  }

  test("events_ewma_volume fans out with Generate — no range join") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    val p = plan("events_ewma_volume")
    assert(p.contains("Generate"), p)
    val joins = Queries.byName("events_ewma_volume").run(spark, sfDir)
      .queryExecution.optimizedPlan.collect { case j: LJoin => j }
    // only the 1-row max-day scalar cross plus the final left join back to
    // daily counts; a BETWEEN range join would appear as a third
    assert(joins.size == 2, s"expected 2 joins (scalar cross + daily), got ${joins.size}")
  }

  test("ml_target_encode broadcasts the per-nation stats back onto the fact") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val p = plan("ml_target_encode")
    // the 25-row stats frame broadcasts; the LOO correction is row-side
    // arithmetic, never a window over the order stream
    assert(p.contains("BroadcastHashJoin"), p)
    val opt = Queries.byName("ml_target_encode").run(spark, sfDir)
      .queryExecution.optimizedPlan
    assert(opt.collect { case w: LWindow => w }.isEmpty, opt.toString)
  }

  test("sim_rand_proj is join-free map-side projection + one moment aggregate") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    val opt = Queries.byName("sim_rand_proj").run(spark, sfDir)
      .queryExecution.optimizedPlan
    // the sign matrix rides as literals inside the dot kernels — a join
    // against a sign/plane table would shuffle the corpus for 16 rows
    assert(opt.collect { case j: LJoin => j }.isEmpty, opt.toString)
    val p = plan("sim_rand_proj")
    assert(p.contains("fvec_dot"), p)
  }

  test("ml_naive_bayes scores through aggregates only — no window pass") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val opt = Queries.byName("ml_naive_bayes").run(spark, sfDir)
      .queryExecution.optimizedPlan
    // the per-doc arg-max is min(struct(-score, class)) — a Window here
    // means a sort crept over the doc × class score stream
    assert(opt.collect { case w: LWindow => w }.isEmpty, opt.toString)
  }

  test("ml_ols_trend reduces to one fact join + one two-phase moment aggregate") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin, Window => LWindow}
    val opt = Queries.byName("ml_ols_trend").run(spark, sfDir)
      .queryExecution.optimizedPlan
    assert(opt.collect { case j: LJoin => j }.size == 1, opt.toString)
    assert(opt.collect { case w: LWindow => w }.isEmpty, opt.toString)
    val p = plan("ml_ols_trend")
    assert(p.contains("partial_sum") || p.contains("partial_count"), p)
  }

  test("dedup_winnow pairs only through the df-capped fingerprint index") {
    val p = plan("dedup_winnow")
    // fingerprints explode map-side; docs meet ONLY via equi-joins on the
    // fingerprint key — a nested-loop anywhere means the cap regressed
    assert(p.contains("Generate"), p)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  test("ml_feature_hash is join-free: hashing replaces the vocab dictionary") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    val opt = Queries.byName("ml_feature_hash").run(spark, sfDir)
      .queryExecution.optimizedPlan
    // the whole point of the hashing trick is NO vocab build and NO join
    assert(opt.collect { case j: LJoin => j }.isEmpty, opt.toString)
    val p = plan("ml_feature_hash")
    assert(p.contains("partial_count"), p)
  }

  test("sample_weighted selects the top-k distributed, never a global sort") {
    val p = plan("sample_weighted")
    // A-ES selection is k rows per partition + k at the driver; a
    // rangepartitioning exchange means the whole corpus got sorted for 200 rows
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("rangepartitioning"), p)
  }

  test("quality_mad_outliers broadcasts the 5-row stats frames onto the fact") {
    val p = plan("quality_mad_outliers")
    // median and MAD frames are priority-sized (5 rows) — every join back
    // onto orders must be broadcast, never a fact reshuffle per stats pass
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("events_gap_fill windows per user, never over the whole spine") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val opt = Queries.byName("events_gap_fill").run(spark, sfDir)
      .queryExecution.optimizedPlan
    // the forward carry must partition by user_id — an empty partitionSpec
    // funnels every user-day row through one reducer
    val bad = opt.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
    assert(bad.isEmpty, s"global window in gap fill:\n${bad.mkString("\n")}")
  }

  test("quality_benford prunes the scan to the single audited column") {
    val p = plan("quality_benford")
    assert(p.contains("struct<o_totalprice:double>"), p)
  }

  test("quality_winsorize broadcasts the per-group fences onto the fact") {
    val p = plan("quality_winsorize")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("events_changepoint windows only over the day-aggregated frame") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val opt = Queries.byName("events_changepoint").run(spark, sfDir)
      .queryExecution.optimizedPlan
    // the global CUSUM window is bounded-by-design ONLY because its input
    // is the daily aggregate; a window whose child still carries raw event
    // columns means the reduction slipped below the window
    val bad = opt.collect {
      case w: LWindow if w.child.output.exists(a =>
        a.name == "event_id" || a.name == "ts") => w
    }
    assert(bad.isEmpty, s"window over raw events:\n${bad.mkString("\n")}")
    val p = plan("events_changepoint")
    assert(p.contains("partial_count"), p)
  }

  test("events_interpolate and orders_item_cf window per key, never globally") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    Seq("events_interpolate", "orders_item_cf").foreach { name =>
      val opt = Queries.byName(name).run(spark, sfDir)
        .queryExecution.optimizedPlan
      val bad = opt.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
      assert(bad.isEmpty, s"$name has a global window:\n${bad.mkString("\n")}")
    }
  }

  test("events_survival windows only per user or over the gap-reduced frame") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val opt = Queries.byName("events_survival").run(spark, sfDir)
      .queryExecution.optimizedPlan
    // the lead window is per-user over the distinct (user, day) frame; the
    // KM cumulative windows are global but run over the gap-cardinality
    // frame — a global window whose child still carries event_id/ts means
    // the reduction slipped below the window (the events_changepoint rule)
    val bad = opt.collect {
      case w: LWindow if w.partitionSpec.isEmpty && w.child.output.exists(a =>
        a.name == "event_id" || a.name == "user_id") => w
    }
    assert(bad.isEmpty, s"global window over an unreduced frame:\n${bad.mkString("\n")}")
  }

  test("events_hll_rolling fans out map-side — no range join, no nested loop") {
    val p = plan("events_hll_rolling")
    // both the sketch and exact paths reach their 7 target days through the
    // constant Generate fanout; a BNLJ/cartesian means a day-range join
    // crept back in
    assert(p.contains("Generate"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
  }

  test("ml_pr_curve and events_bot_detect window only over reduced or keyed frames") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    // pr_curve: the cumulative TP/FP window is global but must run over the
    // decile-bucket aggregate, never the raw score stream
    val prOpt = Queries.byName("ml_pr_curve").run(spark, sfDir)
      .queryExecution.optimizedPlan
    val badPr = prOpt.collect {
      case w: LWindow if w.partitionSpec.isEmpty && w.child.output.exists(a =>
        a.name == "vec_id") => w
    }
    assert(badPr.isEmpty, s"global window over raw scores:\n${badPr.mkString("\n")}")
    // bot_detect: the only window is the per-user gap lag
    val botOpt = Queries.byName("events_bot_detect").run(spark, sfDir)
      .queryExecution.optimizedPlan
    val botWs = botOpt.collect { case w: LWindow => w }
    assert(botWs.nonEmpty && botWs.forall(_.partitionSpec.nonEmpty),
      botWs.mkString("\n"))
  }

  test("join_interval meets through the bucket equi-join, never a nested loop") {
    val p = plan("join_interval")
    // the whole point of the bucketized formulation: a no-equi-key overlap
    // join must NOT fall back to BNLJ/cartesian — pairs meet on the bucket
    // id (hash-joinable) with the overlap test as a residual
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("graph_link_predict wedges via equi-joins with the hub cap applied, no window") {
    val p = plan("graph_link_predict")
    // the center self-join and the adjacency anti-join are key joins; a
    // CartesianProduct or BroadcastNestedLoopJoin here means the wedge
    // enumeration lost its equi key
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
    // (the deg <= 64 hub cap is applied before the ctr localCheckpoint, so
    // it lives upstream of this plan's ExistingRDD leaf — its behavior is
    // pinned functionally by GraphSpec's hub-cap test)
    // the AA arg-ordering is the final top-k, not a window pass
    assert(!p.contains("Window"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("ml_knn_classify votes through aggregates; the only window is the kNN rank") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val opt = Queries.byName("ml_knn_classify").run(spark, sfDir)
      .queryExecution.optimizedPlan
    // since round 10 the query reads the memoized lshTop5 substrate (a
    // pinned checkpoint — no window in the declared plan); the
    // vote/argmax/confusion stages must still be two-phase aggregates
    // with no window of their own, and the rank-window discipline is
    // pinned on the substrate builder below
    assert(opt.collect { case w: LWindow => w }.isEmpty,
      s"vote pipeline grew a window:\n$opt")
    val p = plan("ml_knn_classify")
    assert(!p.contains("CartesianProduct"), p)
    // the substrate builder ranks through the bounded-state TopK
    // aggregate since r15 — NO window anywhere (the r13 rank window's
    // map-side prune still sorted the candidate stream; Round15Spec pins
    // the full no-sort discipline on the production auto path)
    val sub = operators.Similarity
      .lshTopK(Tables.load(spark, sfDir, "embeddings"), 5)
      .queryExecution.optimizedPlan
    val ws = sub.collect { case w: LWindow => w }
    assert(ws.isEmpty, s"rank path grew a window back:\n$ws")
    Caches.release(spark)
  }

  test("graph_harmonic frontier rounds stay equi-join + anti-join, no nested loop") {
    val p = plan("graph_harmonic")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
    // the final ranking is distributed top-k
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("events_dau_wau_mau fans out map-side, no range join") {
    val p = plan("events_dau_wau_mau")
    // the 1/7/28-day trailing windows are Generates (explode), never a
    // BETWEEN-style range join over the day frame; the only nested-loop
    // joins are the 1-row max-day scalar crosses (the unique_rolling
    // convention), and the three window frames combine by hash join
    assert("Generate".r.findAllIn(p).size >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("orders_cohort_ltv runs its cumulative window over the cohort aggregate") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, Aggregate => LAgg}
    val opt = Queries.byName("orders_cohort_ltv").run(spark, sfDir)
      .queryExecution.optimizedPlan
    val ws = opt.collect { case w: LWindow => w }
    assert(ws.size == 1, s"expected one cumulative window, got ${ws.size}")
    assert(ws.head.partitionSpec.nonEmpty, "LTV window must partition by cohort")
    // the window input is the (cohort, age) triangle aggregate, never raw orders
    assert(ws.head.collectFirst { case a: LAgg => a }.nonEmpty,
      s"window reads a non-aggregated child:\n${ws.head}")
  }

  test("ml_kfold_cv trains from per-fold partials, coefficients broadcast back") {
    val p = plan("ml_kfold_cv")
    // leave-fold-out = total - fold on the 5-row stats frame: the join of
    // coefficients back onto the fact must be broadcast, not sort-merge
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // two-phase aggregation of the sufficient statistics
    assert(p.contains("partial_sum") || p.contains("partial_count"), p)
  }

  /** Shared pin for the distributed two-level prefix sum (quality_ks_test,
    * orders_gini): any UNPARTITIONED window must read an Aggregate child —
    * i.e. run over the per-band totals frame (bounded by the fixed band
    * count), never over the distinct-value frame.
    */
  private def assertTwoLevelPrefix(name: String): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow, Aggregate => LAgg}
    val opt = Queries.byName(name).run(spark, sfDir)
      .queryExecution.optimizedPlan
    val ws = opt.collect { case w: LWindow => w }
    assert(ws.nonEmpty, s"$name lost its prefix-sum windows")
    ws.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.collectFirst { case a: LAgg => a }.nonEmpty,
        s"$name: global window over a non-aggregated child:\n$w")
    }
    assert(!plan(name).contains("CartesianProduct"))
  }

  test("quality_ks_test prefix sums stay two-level: global window only over band totals") {
    assertTwoLevelPrefix("quality_ks_test")
  }

  test("orders_gini rank algebra windows partition by segment/band over aggregates") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val opt = Queries.byName("orders_gini").run(spark, sfDir)
      .queryExecution.optimizedPlan
    // both prefix windows carry a partition spec (segment×band / segment)
    val ws = opt.collect { case w: LWindow => w }
    assert(ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty),
      s"orders_gini grew an unpartitioned window:\n$ws")
    assert(!plan("orders_gini").contains("CartesianProduct"))
  }

  test("graph_hits iterations are joins + aggregates — zero windows, no nested loop") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val opt = Queries.byName("graph_hits").run(spark, sfDir)
      .queryExecution.optimizedPlan
    assert(opt.collect { case w: LWindow => w }.isEmpty)
    val p = plan("graph_hits")
    assert(!p.contains("CartesianProduct"), p)
    // the per-kind top-10 readouts are distributed top-k, not full sorts
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("text_kmv_setops signatures come from the bounded-heap grouped top-k") {
    val p = plan("text_kmv_setops")
    // per-set signature: custom TopKPerGroup; union signature: global
    // TakeOrdered — neither is a set-wide sort or window rank
    assert(p.contains("TopKPerGroup"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("text_rake_keywords: phrase-id window partitions by doc, readout is distributed top-k") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val opt = Queries.byName("text_rake_keywords").run(spark, sfDir)
      .queryExecution.optimizedPlan
    val ws = opt.collect { case w: LWindow => w }
    assert(ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty),
      s"rake grew an unpartitioned window:\n$ws")
    val p = plan("text_rake_keywords")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sim_rrf_fusion ranks partition by query; fusion adds no extra scan") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val opt = Queries.byName("sim_rrf_fusion").run(spark, sfDir)
      .queryExecution.optimizedPlan
    val ws = opt.collect { case w: LWindow => w }
    assert(ws.nonEmpty && ws.forall(_.partitionSpec.nonEmpty),
      s"rrf grew an unpartitioned window:\n$ws")
    // both rankings and the fusion rank come off ONE scored frame — the
    // embeddings table is scanned for queries + corpus, never per-ranker
    assert("Scan parquet .*embeddings".r.findAllIn(plan("sim_rrf_fusion"))
      .size <= 2, plan("sim_rrf_fusion"))
  }

  test("events_brown_smooth is one bounded-fanout explode, no range join") {
    val p = plan("events_brown_smooth")
    assert(p.contains("Generate"), p) // the ≤20-day explode
    assert(!p.contains("CartesianProduct"), p)
    // both smoothing sums come out of ONE final aggregate over the explode
    assert(p.contains("partial_sum"), p)
  }
}
