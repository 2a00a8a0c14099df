package graft

import operators.Similarity
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Round-18 pins, all closing r17-verdict items:
  *  1. the multi-probe candidate join's BROADCAST-PANEL shape — the 20 M
  *     decade survives only because the corpus side never exchanges
  *     (hash-partitioning it spilled ~70 GB of sort runs); an AQE or
  *     threshold change reverting it must fail loudly, mirroring
  *     Round16Spec's IVF hint pins (verdict item 1);
  *  2. an ABSOLUTE recall floor for the multi-probe row — Round17Spec
  *     pins dominance (mp ≥ exact-collision) but a correlated regression
  *     could sink both; the level pin closes that hole (item 3);
  *  3. [[Similarity.pqMemoConsumers]] membership pinned to actual memo
  *     access — the hand-maintained set mirrors lshMemoConsumers, whose
  *     spec guard caught exactly the silent-reattribution failure mode
  *     this set is still exposed to (r17 ADVICE).
  */
class Round18Spec extends SparkSuite {

  private val Sf001 = "/root/testdata/sf0.01"

  /** Flatten a physical plan across AQE boundaries (adaptive root, query
    * stages, reused stages) so structural assertions see the real tree.
    */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(flatten)
  }

  test("multi-probe candidate join broadcasts the panel — corpus side never exchanges") {
    for (dir <- Seq(sfDir, Sf001);
         row <- Seq("sim_lsh_multiprobe", "sim_lsh_multiprobe2")) {
      val df = SparkEntry.queries(row)(spark, dir)
      df.collect()
      val nodes = flatten(df.queryExecution.executedPlan)
      // the candidate join is the one keyed on (band, bucket); the panel
      // semi-join (keyed on vec_id) and scalar broadcasts don't match
      val cand = nodes.collect {
        case b: BroadcastHashJoinExec
            if b.leftKeys.exists(_.toString.contains("band")) => b
      }
      assert(cand.nonEmpty,
        s"$dir: no (band,bucket)-keyed BroadcastHashJoin — the candidate " +
          s"join degraded off the broadcast-panel shape\n" +
          df.queryExecution.executedPlan.toString.take(3000))
      cand.foreach { b =>
        assert(b.buildSide == org.apache.spark.sql.catalyst.optimizer.BuildLeft,
          s"$dir: candidate join builds on the CORPUS side — the probe " +
            "expansion must be the broadcast side")
        // the streamed (corpus) subtree must be exchange-free: scan →
        // explode → join, the shape whose hash-partitioned alternative
        // spilled ~70 GB at the 20 M decade
        val shuffles = flatten(b.right).filter {
          case _: ShuffleExchangeLike => true
          case p => p.getClass.getSimpleName.contains("Shuffle")
        }
        assert(shuffles.isEmpty,
          s"$dir: corpus side of the multi-probe candidate join exchanges: " +
            shuffles.map(_.getClass.getSimpleName).mkString(","))
      }
      Caches.release(spark); spark.catalog.clearCache()
    }
  }

  private def recallOf(name: String, dir: String): Double = {
    val r = SparkEntry.queries(name)(spark, dir).collect().head
    Caches.release(spark); spark.catalog.clearCache()
    assert(r.getAs[Long]("n_exact_pairs") > 0, s"$name: empty exact panel")
    r.getAs[Double]("recall_at5")
  }

  test("multi-probe recall@5 holds an absolute floor at both gate scales") {
    // measured 0.994 / 0.997 at sf0.001 / sf0.01 (r17 verify dumps);
    // deterministic (literal planes, fixed data), so 0.9 only trips on a
    // real probing regression — the dominance pin alone would let a
    // correlated exact+multiprobe collapse slip through
    assert(recallOf("sim_lsh_multiprobe_recall", sfDir) >= 0.9)
    assert(recallOf("sim_lsh_multiprobe_recall", Sf001) >= 0.9)
  }

  test("radius-2 probing dominates radius-1 at both gate scales") {
    // pq2's pair probes ADD to pq1's radius-≤1 set, so candidates are a
    // strict superset and panel recall can only go up — a flip-order or
    // pair-arithmetic regression that loses the containment fails here
    // (the Round17Spec dominance pin, one rung up the ladder)
    for (dir <- Seq(sfDir, Sf001)) {
      val r2 = recallOf("sim_lsh_multiprobe2_recall", dir)
      val r1 = recallOf("sim_lsh_multiprobe_recall", dir)
      assert(r2 >= r1, s"$dir: radius-2 $r2 < radius-1 $r1")
      assert(r2 >= 0.9, s"$dir: radius-2 recall $r2 under the family floor")
    }
  }

  test("streaming suppression recall holds its clone-regime floor") {
    // the r17-item-6 measurement made a standing alarm: on a deterministic
    // ±0.05 clone amplification (the ScaleUp clone convention, inline so
    // the gate needs no /tmp corpus), the single-band-0 blocking key must
    // keep catching its measured share of in-contract (Hamming ≤ 6)
    // near-dups. Suppression recall is replica-DENSITY-dependent (a later
    // arrival is caught if ANY admitted earlier near-dup shares its
    // bucket): the 200 k ScaleUp corpus at 100 reps/source measured 0.744
    // against a 0.778 single-band collision bound and a 0.984 4-band-OR
    // deployment bound (SemStreamProbe, SURVEY §6); this ×4-rep gate
    // amplification measures 0.366 — fewer qualifying predecessors per
    // arrival, same machinery. Deterministic end-to-end, so the floor sits
    // just under the measured value. Organic regime is a measured
    // NON-regime for this operator: 0 suppressible pairs at 200 k organic
    // (cos ≈ 0.5 neighborhoods have no cos ≥ 0.96 members).
    import org.apache.spark.sql.functions._
    val base = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val stride = 1L << 40
    val amp = base
      .select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0L), lit(3L))).as("rep"))
      .select((col("vec_id") + col("rep") * stride).as("vec_id"),
        when(col("rep") === 0, col("embedding")).otherwise(
          transform(col("embedding"), (x, d) =>
            (x + (hash(col("vec_id"), d, col("rep")) % 1000).cast("float")
              / 20000.0f).cast("float"))).as("embedding"))
    val (truth, caught, _, _, _) = SemStreamProbe.measure(spark, amp, stride)
    assert(truth > 500, s"clone amplification produced only $truth in-contract pairs")
    val recall = caught.toDouble / truth
    info(f"gate-scale clone suppression recall = $recall%.3f ($caught/$truth)")
    assert(recall >= 0.3, f"suppression recall $recall%.3f under the 0.3 floor")
    Caches.release(spark); spark.catalog.clearCache()
  }

  test("pqMemoConsumers matches the queries that actually force the training memos") {
    def forcesPq(name: String): Boolean = {
      Caches.dropMemos(spark)
      SparkEntry.queries(name)(spark, sfDir).count()
      val hit = Caches.memoKeys(spark).exists(_.startsWith("pq:train:"))
      Caches.release(spark); spark.catalog.clearCache()
      hit
    }
    Similarity.pqMemoConsumers.foreach(n =>
      assert(forcesPq(n), s"$n is listed in pqMemoConsumers but did not touch the memo"))
    // PQ-adjacent rows on the SEED codebook must not be charged pq_build —
    // a new trained-book consumer missing from the set reattributes the
    // multi-second Lloyd chain onto its own bench row (the r15 lsh lesson)
    Seq("sim_pq_topk", "sim_ivfpq_topk", "sim_ivfpq_recall")
      .foreach(n => assert(!forcesPq(n),
        s"$n forced the pq training memos but is not in pqMemoConsumers — " +
          "add it or Bench mis-attributes pq_build"))
    Caches.dropMemos(spark)
  }
}
