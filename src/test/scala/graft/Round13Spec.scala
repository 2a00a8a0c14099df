package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Round-13 additions: the corpus-adaptive LSH geometry (in-plan bit
  * budget), the panel-scoped 4×4 anchor, the geometry observability row,
  * and the S3A session block.
  */
class Round13Spec extends SparkSuite {

  private def emb = Tables.load(spark, sfDir, "embeddings")

  test("autoBits reproduces the measured geometry ladder") {
    // the hand-tuned rungs rounds 9–12 measured: 2 k vectors → the 4×4
    // default, 20 k → the r12 production 4×7, 200 k → the promised 4×10,
    // 2 M → 13 (the r14 probe decade — was the r13 cap pin), 20 M → 17
    // (un-capped in r18: the old cap-16 pin measured occupancy 305 and
    // growing linearly — the invariant the chooser exists to hold), cap
    // 20 beyond ~134 M; empty corpus degrades to the floor geometry
    val expect = Seq(0L -> 4L, 500L -> 4L, 2000L -> 4L, 20000L -> 7L,
      200000L -> 10L, 2000000L -> 13L, 20000000L -> 17L,
      200000000L -> 20L)
    expect.foreach { case (n, bits) =>
      val got = Similarity.autoBits(spark.range(n).toDF("vec_id"))
        .collect().head.getLong(0)
      assert(got == bits, s"n=$n: expected $bits bits, got $got")
    }
  }

  test("lshTopKAuto at a 4-bit corpus is value-identical to the fixed block") {
    // at this corpus size the chooser picks the floor bit budget, so the
    // kernel-packed adaptive buckets must reproduce the static per-plane
    // literal packing bit-for-bit at the SAME geometry — the strongest
    // cheap check that the LshAutoBuckets kernel arithmetic (sign-table
    // offsets, 2^j weights, band offsets) is right. 10×4 since r15
    // (AutoBands = 10; the fixed builder draws the same seed-42 plane
    // prefix, so the two paths must agree exactly).
    def key(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("q_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSeq
    val auto = key(Similarity.lshTopKAuto(emb, 5))
    val fixed = key(Similarity.lshTopK(emb, 5, 10, 4))
    assert(auto.nonEmpty && auto == fixed)
    Caches.release(spark)
  }

  test("lshTopKPanel is exactly the panel slice of the full 4x4 lists") {
    // neighbor side is the full corpus either way, so restricting the
    // query side must not change any surviving query's ranked list
    val full = Similarity.lshTopK(emb, 5, 4, 4)
      .filter(col("q_id") % 8 === 3) // sf0.001: 500 vectors => m = 8
      .orderBy("q_id", "rank").collect().toSeq
    val panel = Similarity.lshTopKPanel(emb, 5)
      .orderBy("q_id", "rank").collect().toSeq
    assert(panel.nonEmpty && panel == full)
    Caches.release(spark)
  }

  test("lshTopK plans the map-side bounded-state rank (partial TopK aggregate)") {
    // r13 pinned the WindowGroupLimit prune here; r15 replaced the window
    // entirely with the TopK.neighbors Aggregator (the window's map-side
    // prune still SORTED the per-task candidate stream — >90 GB spill at
    // the 2 M probe). The surviving scale property: per-query top-k is
    // still reduced MAP-SIDE before the exchange — two ObjectHashAggregate
    // occurrences = partial + final — and no Window/sort remains in the
    // rank path (Round15Spec pins the full discipline on the auto path).
    for ((label, df) <- Seq(
        "fixed" -> Similarity.lshTopK(emb, 5, 4, 4),
        "auto" -> Similarity.lshTopKAuto(emb, 5))) {
      val p = df.queryExecution.executedPlan.toString
      assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
        s"$label: bounded-state rank not planned two-phase:\n$p")
      assert(!p.contains("WindowGroupLimit"), s"$label: window rank came back:\n$p")
    }
    Caches.release(spark)
  }

  test("sim_lsh_occupancy: per-band load accounting is consistent") {
    val n = emb.count()
    val rows = SparkEntry.queries("sim_lsh_occupancy")(spark, sfDir).collect()
    assert(rows.length == 10) // one row per band (AutoBands = 10 since r15)
    rows.foreach { r =>
      val (abits, nVec, used, maxOcc, sumSq) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(abits == 4L) // 500 vectors => floor geometry
      assert(nVec == n) // every vector lands in exactly one bucket per band
      assert(used <= (1L << abits)) // bucket ids live in [0, 2^abits)
      assert(maxOcc <= n && sumSq >= nVec) // sum occ^2 >= sum occ
      // the candidate budget the row reports must bound the band's true
      // candidate pair count: sum occ^2 - n = pairs counted both ways
      assert(sumSq - nVec >= 0 && (sumSq - nVec) % 2 == 0)
    }
    Caches.release(spark)
  }

  test("semantic audit panel: exact clusters cover the panel incl singletons") {
    val rows = SparkEntry.queries("dedup_semantic_clusters")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // output = the whole residue panel, cluster_id = min member (self for
    // singletons)
    assert(rows.nonEmpty)
    assert(rows.forall { case (v, _) => v % 8 == 3 })
    assert(rows.forall { case (v, c) => c <= v && c % 8 == 3 })
    val ids = rows.map(_._1).toSet
    assert(rows.forall { case (_, c) => ids.contains(c) })
    Caches.release(spark)
  }

  test("s3a defaults: magic committer bound, rename commit path off") {
    val d = Sessions.s3aDefaults
    // the committer chain: S3A factory for the s3a scheme, magic committer
    // selected and enabled, and Spark's parquet write bound through the
    // cloud PathOutputCommitProtocol so the factory is consulted at all
    assert(d("spark.hadoop.fs.s3a.committer.name") == "magic")
    assert(d("spark.hadoop.fs.s3a.committer.magic.enabled") == "true")
    assert(d("spark.hadoop.mapreduce.outputcommitter.factory.scheme.s3a")
      .endsWith("S3ACommitterFactory"))
    assert(d("spark.sql.sources.commitProtocolClass")
      .endsWith("PathOutputCommitProtocol"))
    assert(d("spark.sql.parquet.output.committer.class")
      .endsWith("BindingParquetOutputCommitter"))
    // part size matches the repo's 128 MiB row-group write convention
    assert(d("spark.hadoop.fs.s3a.multipart.size") == "134217728")
    // NOT live-set here: Spark validates committer classes for loadability
    // at conf-set time, and the cloud committer jars (spark-hadoop-cloud /
    // hadoop-aws) are deployment-provided — absent in this sandbox by
    // design. The keys are builder configs, so a deployment session made
    // via s3aBuilder inherits them by construction; assert that wiring.
    assert(d.keys.forall(k =>
      k.startsWith("spark.hadoop.fs.s3a.") ||
        k.startsWith("spark.hadoop.mapreduce.") ||
        k.startsWith("spark.sql.")))
    // every hadoop-side key rides the spark.hadoop. prefix (the documented
    // channel into executors' Hadoop Configuration), never a bare fs.s3a.
    assert(!d.keys.exists(_.startsWith("fs.")))
  }
}
