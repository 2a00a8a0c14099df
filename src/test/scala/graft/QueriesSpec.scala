package graft

/** Every declared query: runs at sf0.001, has a stable schema, and is
  * deterministic (two runs collect identical results — the property the
  * driver's hash compare needs).
  */
class QueriesSpec extends SparkSuite {

  // queries whose correct result may legitimately be empty at this sf
  private val mayBeEmpty =
    Set("dedup_ngram_jaccard", "dedup_minhash_lsh", "join_anti", "join_fuzzy",
      "dedup_source_overlap")

  Queries.all.foreach { q =>
    test(s"${q.name}: runs, nonempty, deterministic at sf0.001") {
      val r1 = q.run(spark, sfDir).collect()
      val r2 = q.run(spark, sfDir).collect()
      if (!mayBeEmpty(q.name)) assert(r1.nonEmpty, s"${q.name} returned 0 rows")
      assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq,
        s"${q.name} not deterministic across runs")
    }
  }

  test("query names are unique and every oracle belongs to a query") {
    assert(Queries.byName.size == Queries.all.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
