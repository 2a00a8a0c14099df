package graft

import org.apache.spark.sql.functions._

/** Invariant specs for the round-11 additions: the declared queries are
  * oracle-hash-checked by Verify; these pin the semantic properties the
  * hash can't express (bounds, conservation, monotone structure).
  */
class Round11Spec extends SparkSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("ml_mcc_sweep: mcc bounded in [-1, 1], confusion rows conserve n") {
    val rows = q("ml_mcc_sweep").collect()
    assert(rows.nonEmpty)
    val n = rows.head.getLong(1) + rows.head.getLong(2) +
      rows.head.getLong(3) + rows.head.getLong(4)
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) + r.getLong(4) == n)
      if (!r.isNullAt(5))
        assert(math.abs(r.getDouble(5)) <= 1.0 + 1e-9)
    }
  }

  test("sim_embedding_drift: cosines bounded, halves partition each label") {
    val e = Tables.load(spark, sfDir, "embeddings")
    val perLabel = e.groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    q("sim_embedding_drift").collect().foreach { r =>
      assert(r.getLong(1) + r.getLong(2) == perLabel(r.getInt(0)))
      if (!r.isNullAt(3))
        assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9)
    }
  }

  test("sim_kcenter_seeds: 5 distinct picks, seed first, min_dist positive") {
    val rows = q("sim_kcenter_seeds").collect()
    assert(rows.length == 5)
    assert(rows.map(_.getLong(1)).distinct.length == 5)
    // seed row: pick_order 0, NULL distance; later picks carry a real
    // distance (cosine dist is > 0 unless the corpus has exact duplicates)
    assert(rows.head.getInt(0) == 0 && rows.head.isNullAt(2))
    rows.tail.foreach(r => assert(!r.isNullAt(2) && r.getDouble(2) >= 0.0))
    // greedy max-min: each later pick's covering distance cannot increase
    val ds = rows.tail.map(_.getDouble(2)).toSeq
    ds.zip(ds.tail).foreach { case (a, b) => assert(b <= a + 1e-9) }
  }

  test("sim_ivf_recall / sim_lsh_recall: recall in [0, 1] on the same panel") {
    val ivf = q("sim_ivf_recall").collect().head
    val lsh = q("sim_lsh_recall").collect().head
    // both ground truths are the identical sampled exactTop5 panel
    assert(ivf.getLong(0) == lsh.getLong(0) && ivf.getLong(1) == lsh.getLong(1))
    Seq(ivf, lsh).foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("text_heaps_law: sublinear vocabulary growth with decent fit") {
    val r = q("text_heaps_law").collect().head
    assert(r.getLong(0) > 0)
    val beta = r.getDouble(1)
    // types can't grow faster than tokens (beta <= 1) and must grow (>0)
    assert(beta > 0.0 && beta <= 1.0)
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0 + 1e-9)
  }

  test("dedup_band_efficiency: shares sum to 1 over banding candidates") {
    val rows = q("dedup_band_efficiency").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getDouble(4)).sum
    assert(math.abs(total - 1.0) < 1e-3)
    rows.foreach(r => assert(r.getLong(3) > 0))
    Caches.release(spark)
  }

  test("multimodal_phash_dedup: pigeonhole keeps every hamming<=3 pair") {
    // brute-force ground truth over all pairs at sf0.001
    val d = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val h = graft.operators.Multimodal.imageHashes(spark, d).toDF()
      .select("doc_id", "ahash")
    val dup = h.toDF("a", "ha").join(h.toDF("b", "hb"), col("a") < col("b"))
      .select(bit_count(expr("ha ^ hb")).as("hd"))
      .filter(col("hd") <= 3).count()
    val reported = q("multimodal_phash_dedup").collect()
      .filter(_.getString(0) == "0_dup_le3").map(_.getLong(2)).sum
    assert(reported == dup)
  }

  test("ml_group_auc: per-shard AUCs bounded, macro is their mean") {
    val rows = q("ml_group_auc").collect()
    assert(rows.length == 4)
    rows.foreach(r => assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    val macroExpected = rows.map(_.getDouble(3)).sum / rows.length
    assert(math.abs(rows.head.getDouble(4) - macroExpected) < 1e-5)
  }

  test("ml_brier_ci: interval brackets the mean, all within [0, 1]") {
    val r = q("ml_brier_ci").collect().head
    assert(r.getLong(0) == 32)
    val (mean, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(lo <= hi)
    assert(mean >= lo - 0.05 && mean <= hi + 0.05)
    Seq(mean, lo, hi).foreach(v => assert(v >= 0.0 && v <= 1.0))
  }

  test("sim_recall_curve: recall@5 equals the sim_lsh_recall point") {
    val curve = q("sim_recall_curve").collect()
    assert(curve.length == 5)
    val at5 = curve.find(_.getInt(0) == 5).get
    val point = q("sim_lsh_recall").collect().head
    assert(at5.getLong(1) == point.getLong(1))
    assert(at5.getLong(2) == point.getLong(2))
    curve.foreach(r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
  }

  test("ml_learning_curve: nested subsets, full fraction matches ml_auc") {
    val rows = q("ml_learning_curve").collect()
    assert(rows.length == 4)
    // n_train strictly increases with the nested residue subsets
    val ns = rows.map(_.getLong(1)).toSeq
    ns.zip(ns.tail).foreach { case (a, b) => assert(a < b) }
    // the 100% point trains on everything — identical to ml_auc's number
    val full = rows.find(_.getDouble(0) == 1.0).get
    val auc = q("ml_auc").collect().head
    assert(full.getDouble(4) == auc.getDouble(2))
    rows.foreach(r =>
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0))
  }

  test("text_script_mix: shares partition the char mass per source") {
    q("text_script_mix").collect().foreach { r =>
      val s = r.getDouble(3) + r.getDouble(4) + r.getDouble(5) + r.getDouble(6)
      assert(math.abs(s - 1.0) < 1e-4)
      assert(r.getLong(2) > 0)
    }
  }

  test("text_bpe_fertility: at least one piece per word, per-lang rows") {
    val rows = q("text_bpe_fertility").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1)) // pieces >= words
      assert(r.getDouble(3) >= 1.0)
    }
    Caches.release(spark)
  }

  test("ml_learning_curve: no gradient-join broadcast of the residual") {
    import org.apache.spark.sql.execution.FormattedMode
    val p = q("ml_learning_curve").queryExecution.explainString(FormattedMode)
    // the hinted shuffle joins must survive planning — a per-vector frame
    // is never broadcastable at production row counts
    assert(p.contains("ShuffledHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("multimodal_phash_dedup and band_efficiency plan without cartesian") {
    import org.apache.spark.sql.execution.FormattedMode
    Seq("multimodal_phash_dedup", "dedup_band_efficiency").foreach { n =>
      val p = q(n).queryExecution.explainString(FormattedMode)
      assert(!p.contains("CartesianProduct"), s"$n plans a cartesian")
    }
    Caches.release(spark)
  }

  test("dedup_minhash_scurve: detection rate is monotone-consistent with theory") {
    val rows = q("dedup_minhash_scurve").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(3)) // banded <= pairs per bin
      val rate = r.getDouble(5)
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // the top bin (J in [0.9, 1.0]) must be near-fully admitted — theory
    // says p > 0.999; a sag here means the banding machinery is broken
    rows.find(_.getInt(0) == 9).foreach(r => assert(r.getDouble(5) >= 0.9))
    Caches.release(spark)
  }

  test("graph pagerank mass conserved on the wide fallback shapes too") {
    // the small-graph path is pinned elsewhere; here assert the fallback
    // adjacency produces the same degree frame as collect_set on sf0.001
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val edges = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
    val viaSet = edges.groupBy("src")
      .agg(collect_set(col("dst")).as("ds"))
      .select(col("src"), size(col("ds")).as("cnt"), explode(col("ds")).as("dst"))
    val wS = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy("dst")
    val viaSort = edges.select("src", "dst")
      .withColumn("prev", lag(col("dst"), 1).over(wS))
      .filter(col("prev").isNull || col("prev") =!= col("dst")).drop("prev")
      .select(col("src"),
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("src")).cast("int").as("cnt"), col("dst"))
    assert(viaSet.exceptAll(viaSort).count() == 0)
    assert(viaSort.exceptAll(viaSet).count() == 0)
  }
}
