package graft

import graft.streaming.SemanticDedupStream
import graft.streaming.SemanticDedupStream.{Decision, SigRow}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Round-17 additions: semantic recall floors for the non-LSH ANN rungs
  * (r16 verdict item 4 — hashes pin values against ACCIDENT, floors pin
  * meaning against INTENTIONAL re-pins that would silently trade recall
  * away) and the streaming ⇔ batch-replay equivalence for the semantic
  * near-dup suppressor (item 6 — the declared
  * `dedup_semantic_stream_replay` oracle checks the batch fold; this
  * suite proves the true micro-batched streaming execution emits the
  * SAME decisions, closing oracle ⇔ batch fold ⇔ streaming operator).
  */
class Round17Spec extends SparkSuite {

  private def recallOf(name: String, dir: String): Double = {
    val r = SparkEntry.queries(name)(spark, dir).collect().head
    Caches.release(spark)
    assert(r.getAs[Long]("n_exact_pairs") > 0, s"$name: empty exact panel")
    r.getAs[Double]("recall_at5")
  }

  /** Floors sit just under the weakest measured rung at the two gate
    * scales (deterministic — literal planes / seed books / fixed data —
    * so nothing here can flap): hamming 0.352/0.368, seed-IVFPQ
    * 0.181/0.184, trained-IVFPQ 0.222/0.175 at sf0.001/sf0.01 (r17
    * verify dumps). The trained floor matches the seed floor: at the
    * gate scales (500 vectors, pqK = 16, fixed-20 shortlist) Lloyd
    * refinement does not move panel recall — its win is a SCALE effect
    * (pqK = 256 lifted 200 k recall 0.336 → 0.978, SURVEY §6); this
    * floor only pins that a trained book never craters the fused path.
    */
  test("hamming recall@5 holds its floor at both gate scales") {
    assert(recallOf("sim_hamming_recall", sfDir) >= 0.34)
    assert(recallOf("sim_hamming_recall", "/root/testdata/sf0.01") >= 0.34)
  }

  test("seed-IVFPQ recall@5 holds its floor at both gate scales") {
    assert(recallOf("sim_ivfpq_recall", sfDir) >= 0.15)
    assert(recallOf("sim_ivfpq_recall", "/root/testdata/sf0.01") >= 0.15)
  }

  test("trained-IVFPQ recall@5 holds its floor at both gate scales") {
    assert(recallOf("sim_ivfpq_trained_recall", sfDir) >= 0.15)
    assert(recallOf("sim_ivfpq_trained_recall", "/root/testdata/sf0.01") >= 0.15)
  }

  test("multi-probe recall dominates exact-collision recall at both gate scales") {
    // the probe set CONTAINS the exact bucket (f = 0), so candidates are a
    // strict superset and panel recall can only go up — a probing or
    // bucket-arithmetic regression that loses the containment fails here
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01")) {
      val mp = recallOf("sim_lsh_multiprobe_recall", dir)
      val ex = recallOf("sim_lsh_recall", dir)
      assert(mp >= ex, s"$dir: multiprobe $mp < exact-collision $ex")
    }
  }

  test("streaming micro-batch execution matches the declared batch replay") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the declared row's exact arrival schedule and TTL
    val arrivals = operators.Similarity.semReplayArrivals(spark, sfDir)
    val want = SparkEntry.queries("dedup_semantic_stream_replay")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Boolean]("is_dup"), r.getAs[Long]("dup_of"),
          r.getAs[Int]("hamming"))))
      .toMap
    // stream the same rows in EVENT-TIME order across ~8 micro-batches —
    // the decision function is watermark-independent (event-time TTL in
    // the match), so the only order that matters is arrival order, which
    // ascending-ts chunks preserve. Chunk on DISTINCT-ts boundaries: a
    // chunk split mid-tie would leave the tail of the tie at ts ==
    // watermark in the next batch, where the 0-second watermark drops it
    // as late data
    val sigRows = SemanticDedupStream.signatures(arrivals).collect()
      .sortBy(r => (r.ts.getTime, r.vec_id))
    val tsRuns = sigRows.groupBy(_.ts.getTime).toSeq.sortBy(_._1).map(_._2)
    val input = MemoryStream[SigRow]
    val out = SemanticDedupStream.suppress(
      input.toDS().withWatermark("ts", "0 seconds"),
      operators.Similarity.SemReplayTtlMs)
    val q = out.writeStream.format("memory").queryName("r17_replay_out")
      .outputMode("append").start()
    try {
      tsRuns.grouped(math.max(1, tsRuns.length / 8)).foreach { runs =>
        input.addData(runs.flatten.toSeq)
        q.processAllAvailable()
      }
      val got = spark.table("r17_replay_out").as[Decision].collect()
        .map(d => d.vec_id -> ((d.is_dup, d.dup_of, d.hamming))).toMap
      assert(got.size == want.size,
        s"streaming emitted ${got.size} decisions, batch replay ${want.size}")
      val diff = want.collect {
        case (id, w) if got(id) != w => s"$id: stream=${got(id)} batch=$w"
      }
      assert(diff.isEmpty, diff.take(5).mkString("; "))
    } finally q.stop()
    Caches.release(spark)
  }
}
