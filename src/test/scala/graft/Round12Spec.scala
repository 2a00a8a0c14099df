package graft

import org.apache.spark.sql.functions._

/** Invariant specs for the round-12 changes: the kendall readout-type fix,
  * the pHash band-width knob, and the LSH consumer migration to the
  * production lists (4×7 in r12; corpus-adaptive since r13). Oracle hashes
  * pin the values; these pin the structural properties the hash can't
  * express.
  */
class Round12Spec extends SparkSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("quality_kendall_tau: double readout, bounded tau, pair conservation") {
    val df = q("quality_kendall_tau")
    // the r11 regression class: decimal readouts hash differently across
    // engines — concordant/discordant must surface as DOUBLE
    val types = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("concordant") == "double" && types("discordant") == "double")
    assert(!types.values.exists(_.startsWith("decimal")))
    val r = df.collect().head
    val n = r.getLong(0).toDouble
    val (c, d) = (r.getDouble(1), r.getDouble(2))
    // doubled pair counts: C + D can never exceed m0 = n(n-1)
    assert(c >= 0 && d >= 0 && c + d <= n * (n - 1) + 1e-6)
    if (!r.isNullAt(3)) assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9)
  }

  test("phash scaled: pigeonhole keeps every hamming<=1 pair at 2x32 bands") {
    val d = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val h = graft.operators.Multimodal.imageHashes(spark, d).toDF()
      .select("doc_id", "ahash")
    val dup = h.toDF("a", "ha").join(h.toDF("b", "hb"), col("a") < col("b"))
      .select(bit_count(expr("ha ^ hb")).as("hd"))
      .filter(col("hd") <= 1).count()
    val reported = q("multimodal_phash_dedup_scaled").collect()
      .filter(_.getString(0) == "0_dup_le1").map(_.getLong(1)).sum
    assert(reported == dup)
  }

  test("phash scaled: dense 5-tier shape, candidates subset of the default's") {
    val rows = q("multimodal_phash_dedup_scaled").collect()
    // dense mode: all five tiers present even when empty (at tiny corpora
    // the 2^32 buckets admit nothing — the sparse form would be 0 rows)
    assert(rows.length == 5)
    assert(rows.map(_.getString(0)).toSeq == Seq("0_dup_le1", "1_near_2_8",
      "2_far_9_16", "3_bg_17_32", "4_anti_33_64"))
    // a 32-bit band collision implies both its 16-bit halves collide, so
    // wide-band candidates are a SUBSET of the default's
    val scaledTotal = rows.map(_.getLong(1)).sum
    val defaultTotal = q("multimodal_phash_dedup").collect().map(_.getLong(1)).sum
    assert(scaledTotal <= defaultTotal)
    Caches.release(spark)
  }

  test("sim_mutual_knn on adaptive lists: edges unique, ordered, ranks bounded") {
    val rows = q("sim_mutual_knn").collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length == pairs.length)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 5)
      assert(r.getInt(4) >= 1 && r.getInt(4) <= 5)
    }
    Caches.release(spark)
  }

  test("ml_knn_classify on adaptive lists: matrix mass bounded by the corpus") {
    val total = q("ml_knn_classify").agg(sum(col("n"))).collect().head.getLong(0)
    val corpus = Tables.load(spark, sfDir, "embeddings").count()
    // sparser production buckets may abstain (no neighbors -> no row), but
    // can never invent vectors
    assert(total > 0 && total <= corpus)
    Caches.release(spark)
  }

  test("phash scaled plans without cartesian; dense join broadcasts") {
    import org.apache.spark.sql.execution.FormattedMode
    val p = SparkEntry.queries("multimodal_phash_dedup_scaled")(spark, sfDir)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct"))
    // the 5-row tier domain must come in as a broadcast, never a shuffle
    // of the aggregated side against a 5-row frame. The crossJoin of the
    // grand-total scalar is ALWAYS a BroadcastNestedLoopJoin, so a single
    // broadcast occurrence would pass even if the tier-domain left join
    // regressed — require BOTH broadcast joins (r12 ADVICE). FormattedMode
    // prints every operator twice (tree + numbered details), so count only
    // the numbered detail-section headers (r13 ADVICE): one distinct
    // BroadcastNestedLoopJoin would otherwise already read as 2 matches.
    val nBcast = "\\(\\d+\\) Broadcast(HashJoin|NestedLoopJoin)".r.findAllIn(p).size
    assert(nBcast >= 2, s"expected >=2 broadcast join operators, got $nBcast")
    Caches.release(spark)
  }

  test("dedup_semantic_clusters_scaled: valid min-label CC over knn edges") {
    val rows = SparkEntry.queries("dedup_semantic_clusters_scaled")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    val members = rows.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    rows.foreach { case (v, c) => assert(c <= v) } // label = min member
    members.foreach { case (c, ms) =>
      assert(ms.contains(c))    // the labeling vertex is in its own cluster
      assert(ms.size >= 2)      // vectors appear only via >= 1 surviving edge
    }
    Caches.release(spark)
  }

  test("phash default hash-continuity: 4-band output keeps the r11 tiers") {
    val rows = q("multimodal_phash_dedup").collect()
    // the historical-anchor geometry must keep its sparse shape and labels
    assert(rows.map(_.getString(0)).forall(Set("0_dup_le3", "1_near_4_8",
      "2_far_9_16", "3_bg_17_32", "4_anti_33_64")))
    val shares = rows.map(_.getDouble(3)).sum
    assert(math.abs(shares - 1.0) < 1e-3)
    Caches.release(spark)
  }
}
