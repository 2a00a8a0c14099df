package graft

import java.sql.Timestamp

import operators.Similarity
import org.apache.spark.sql.functions._
import graft.streaming.SemanticDedupStream
import graft.streaming.SemanticDedupStream.{BandDecision, BandSigRow, SigRow}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Round-19 pins, closing r18-verdict items:
  *  1. OR-keyed streaming suppression ([[SemanticDedupStream.suppressOr]])
  *     — band-0 slice identity, streaming ≡ batch fold equality, and the
  *     clone-regime recall floor LIFTED over the single-band operator's
  *     (verdict item 1);
  *  2. the retrieval-geometry socket (`fixedBits`) — pinning the chooser's
  *     own value must be byte-identical to the default, so the knob
  *     cannot drift the declared rows (item 2);
  *  3. the ranked probe BUDGET — candidates remain a superset of exact
  *     collision at any budget (the family's standing dominance pin, one
  *     rung further), with an absolute recall floor (item 3).
  */
class Round19Spec extends SparkSuite {

  private val Sf001 = "/root/testdata/sf0.001"

  private def ts(ms: Long) = new Timestamp(ms)

  private def recallOf(name: String, dir: String): Double = {
    val r = SparkEntry.queries(name)(spark, dir).collect().head
    Caches.release(spark); spark.catalog.clearCache()
    assert(r.getAs[Long]("n_exact_pairs") > 0, s"$name: empty exact panel")
    r.getAs[Double]("recall_at5")
  }

  test("fixedBits pinned to the chooser's own value is byte-identical to the default") {
    for (dir <- Seq(sfDir, Sf001)) {
      val e = Tables.load(spark, dir, "embeddings")
      // re-derive the chooser's pick the same way autoBits does
      val n = e.count()
      val chosen = math.max(4, math.min(20,
        java.lang.Long.toBinaryString(math.max(0L, (n + 255) / 256 - 1)).length))
      val base = Similarity.lshMultiProbeTopK(e).collect().toSet
      Caches.release(spark); spark.catalog.clearCache()
      val pinned = Similarity.lshMultiProbeTopK(e, fixedBits = Some(chosen))
        .collect().toSet
      Caches.release(spark); spark.catalog.clearCache()
      assert(pinned == base,
        s"$dir: fixedBits=Some($chosen) diverged from the chooser's default")
      // a DIFFERENT pin actually changes the geometry and still yields
      // full lists — the socket is live, not a no-op
      val other = Similarity.lshMultiProbeTopK(e, fixedBits = Some(chosen + 2))
        .select(countDistinct(col("q_id"))).collect().head.getLong(0)
      Caches.release(spark); spark.catalog.clearCache()
      assert(other > 0, s"$dir: fixedBits=${chosen + 2} produced no lists")
    }
  }

  test("budgeted probing stays a candidate superset of exact collision") {
    // LshProbeSeq always leaves the exact bucket as probe 0, so panel
    // recall can only exceed the exact-collision rung — the Round17Spec
    // dominance pin extended to the ranked-budget rung
    for (dir <- Seq(sfDir, Sf001)) {
      val rb = recallOf("sim_lsh_multiprobe_budget_recall", dir)
      val r0 = recallOf("sim_lsh_recall", dir)
      assert(rb >= r0, s"$dir: budget recall $rb < exact-collision $r0")
      assert(rb >= 0.9, s"$dir: budget recall $rb under the family floor")
    }
  }

  test("per-band fold's band-0 slice is decision-identical to the single-band operator") {
    val arr = Similarity.semReplayArrivals(spark, Sf001)
    val sig = SemanticDedupStream.signatures(arr)
    val single = SemanticDedupStream
      .suppress(sig, Similarity.SemReplayTtlMs, streaming = false)
      .collect().map(d => d.vec_id -> ((d.is_dup, d.dup_of, d.hamming))).toMap
    val band0 = SemanticDedupStream
      .suppressPerBand(SemanticDedupStream.bandSignatures(sig),
        Similarity.SemReplayTtlMs, streaming = false)
      .filter(_.band == 0)
      .collect().map(d => d.vec_id -> ((d.is_dup, d.dup_of, d.hamming))).toMap
    assert(band0 == single,
      s"band-0 slice diverged on ${(band0.toSet diff single.toSet).take(3)}")
    Caches.release(spark); spark.catalog.clearCache()
  }

  test("OR-keyed suppression: streaming micro-batches match the batch fold") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // near-identical sketches (Hamming 1 apart) that share words 1–3 but
    // DIFFER in word 0: the single-band-0 key can never block them, the
    // OR keying must — the exact miss mode the operator exists to close
    val t0 = 3600000L
    val rows = Seq(
      SigRow(1L, ts(t0), 7L, 11L, 13L, 17L),
      SigRow(2L, ts(t0 + 1000), 6L, 11L, 13L, 17L), // word0 flips bit 0
      SigRow(3L, ts(t0 + 2000), 999L, 11L, 13L, 17L), // word0 far; 1–3 match
      SigRow(4L, ts(t0 + 3000), 999L, 0L, 0L, 0L)) // genuinely distinct
    val batch = SemanticDedupStream
      .suppressPerBand(SemanticDedupStream.bandSignatures(
        spark.createDataset(rows)), ttlMs = 600000L, streaming = false)
      .collect().map(d => (d.vec_id, d.band) -> ((d.is_dup, d.dup_of, d.hamming)))
      .toMap
    val input = MemoryStream[BandSigRow]
    val out = SemanticDedupStream.suppressPerBand(
      input.toDS().withWatermark("ts", "0 seconds"), ttlMs = 600000L)
    val q = out.writeStream.format("memory").queryName("semor_out")
      .outputMode("append").start()
    try {
      // one arrival per micro-batch — the adversarial schedule for
      // state-carry bugs (everything crosses a batch boundary)
      rows.foreach { r =>
        input.addData(SemanticDedupStream.bandSignatures(
          spark.createDataset(Seq(r))).collect().toSeq)
        q.processAllAvailable()
      }
      val got = spark.table("semor_out").as[BandDecision].collect()
        .map(d => (d.vec_id, d.band) -> ((d.is_dup, d.dup_of, d.hamming))).toMap
      assert(got == batch,
        s"streaming diverged on ${(got.toSet diff batch.toSet).take(4)}")
      // and the OR-combine catches what band-0 blocking alone misses:
      // ids 2 (hamming 1 from id 1) and 3 (hamming 5) both differ from
      // id 1 in WORD 0, so the single-band key never co-buckets them —
      // bands 1–3 do; id 4 shares id 3's band-0 bucket but sits at
      // hamming 8, outside the contract
      val comb = SemanticDedupStream.combineBandDecisions(
        SemanticDedupStream.suppressPerBand(
          SemanticDedupStream.bandSignatures(spark.createDataset(rows)),
          ttlMs = 600000L, streaming = false).toDF())
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(!comb(1L) && comb(2L) && comb(3L), s"combine verdicts wrong: $comb")
      assert(!comb(4L), "distinct arrival suppressed")
    } finally q.stop()
  }

  test("OR keying lifts clone-regime suppression recall over the single band") {
    // the Round18Spec inline ×4 clone amplification, now measuring both
    // operators side by side: the OR-keyed fold must dominate the
    // single-band fold AND clear a floor sitting just under its measured
    // value (set from the r19 measurement on this deterministic input)
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
    val (truth, caught, caughtOr, _, blockOr) =
      SemStreamProbe.measure(spark, amp, stride)
    assert(truth > 500, s"clone amplification produced only $truth in-contract pairs")
    val single = caught.toDouble / truth
    val or4 = caughtOr.toDouble / truth
    info(f"gate-scale clone suppression: single=$single%.3f or4=$or4%.3f " +
      f"or4_collision_bound=${blockOr.toDouble / truth}%.3f ($truth pairs)")
    assert(or4 >= single, f"OR keying regressed below single-band: $or4%.3f < $single%.3f")
    assert(or4 >= 0.85, f"OR-keyed suppression recall $or4%.3f under the 0.85 floor")
    Caches.release(spark); spark.catalog.clearCache()
  }

  test("coarse-assign kernel is value-identical to the dataflow and shuffle-free") {
    // r19 item 4: the stage probe named the coarse assign (crossJoin ×
    // ivfK + embedding-keyed ObjectHashAggregate + corpus shuffle +
    // re-join) the 20 M trained build's dominant term; IvfAssignCell runs
    // the identical cos arithmetic per row against plan-constant
    // centroids. Pin (a) full value identity of (vec_id, cent_id, res)
    // against the retained dataflow rung on both gate corpora, and (b)
    // the kernel path's plan has NO shuffle — the 100 TB shape is a
    // single map pass over the corpus.
    for (dir <- Seq(sfDir, Sf001)) {
      val e = Tables.load(spark, dir, "embeddings")
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getSeq[Double](2).toList)
      val kernel = Similarity.ivfResiduals(e, e)
      val viaKernel = kernel.collect().map(key).toSet
      val viaFlow = Similarity.ivfResiduals(e, e, assignKernel = false)
        .collect().map(key).toSet
      assert(viaKernel == viaFlow,
        s"$dir: kernel coarse assign diverged from the dataflow " +
          s"(${(viaKernel -- viaFlow).size} kernel-only, " +
          s"${(viaFlow -- viaKernel).size} flow-only)")
      val shuffles = kernel.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"$dir: kernel residual plan still shuffles (${shuffles.size} exchanges)")
      Caches.release(spark); spark.catalog.clearCache()
    }
  }

  private def flatten(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val kids = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(flatten)
  }

  test("fused ADC pack: kernel path equals the dataflow rung; corpus build never shuffles") {
    // r19 pack fusion: the kernel path keeps codes as the encode kernel's
    // array (cs = transform, rsq = PqPackRsq against the plan-constant
    // recon table) — the r16 explode → recon-join → (n_id, cent_id)
    // re-group shuffle is gone. Pin (a) end-to-end value identity of
    // ivfPqTopK against the dataflow rung (which still runs the r16 pack)
    // at both gate scales, and (b) the packed subtree — everything below
    // the rsq projection — is exchange-free across AQE boundaries.
    for (dir <- Seq(sfDir, Sf001)) {
      val raw = Tables.load(spark, dir, "embeddings")
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))
      val fused = Similarity.ivfPqTopK(Tables.spread(raw), raw)
      val viaKernel = fused.collect().map(key).toSet
      val nodes = flatten(fused.queryExecution.executedPlan)
      // the node whose OWN projections compute rsq (a whole-tree toString
      // would match every ancestor and drag the TopK exchange into scope)
      val packed = nodes.collect {
        case p: org.apache.spark.sql.execution.ProjectExec
            if p.projectList.exists(_.toString.contains("pq_pack_rsq")) => p
      }
      assert(packed.nonEmpty, s"$dir: no pq_pack_rsq projection — the fused " +
        "pack fell off the kernel path")
      // Tables.spread's deliberate round-robin repartition
      // (REPARTITION_BY_NUM) is the corpus-scan convention, not a pack
      // shuffle — the pin rejects planner-inserted ENSURE_REQUIREMENTS
      // exchanges (the r16 pack's (n_id, cent_id) re-group)
      val shuffles = flatten(packed.head).collect {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if s.shuffleOrigin ==
              org.apache.spark.sql.execution.exchange.ENSURE_REQUIREMENTS => s
      }
      assert(shuffles.isEmpty,
        s"$dir: packed ADC subtree carries planner-inserted exchanges: " +
          shuffles.map(_.outputPartitioning.toString).mkString(","))
      Caches.release(spark); spark.catalog.clearCache()
      val viaFlow = Similarity.ivfPqTopK(Tables.spread(raw), raw,
        encodeKernel = false).collect().map(key).toSet
      assert(viaKernel == viaFlow,
        s"$dir: fused pack diverged from the dataflow rung " +
          s"(${(viaKernel -- viaFlow).size} fused-only, " +
          s"${(viaFlow -- viaKernel).size} flow-only)")
      Caches.release(spark); spark.catalog.clearCache()
    }
  }
}
