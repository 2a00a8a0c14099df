package graft

import org.apache.spark.sql.SparkSession

/** End-to-end check of the `spark.sql.extensions` entry point: a session
  * built with `graft.GraftExtensions` resolves the kernel functions in plain
  * SQL with no per-session register calls.
  */
class ExtensionsSpec extends SparkSuite {

  test("GraftExtensions injects the kernel functions into SQL") {
    // force the shared context to exist first, then build a sibling session
    // with extensions on the same SparkContext
    spark.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // spark.sql.extensions is a static conf — honored only when the
    // SparkContext is created, so a config() here would be ignored against
    // the shared test context. withExtensions is the equivalent supported
    // path for an existing context and exercises the same class.
    val extSession = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val row = extSession.sql(
        """SELECT fvec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |                array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
          |       fvec_norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS n,
          |       size(shingle_hash64('a b c d e')) AS n_shingles,
          |       size(minhash_bands(shingle_hash64('a b c d e'))) AS n_bands,
          |       simhash64('a b c') AS sh,
          |       bvec_dot(array(CAST(2 AS TINYINT), CAST(-3 AS TINYINT)),
          |                array(CAST(4 AS TINYINT), CAST(5 AS TINYINT))) AS bd
          |""".stripMargin).head()
      assert(row.getDouble(0) == 11.0)
      assert(row.getDouble(1) == 5.0)
      assert(row.getInt(2) == 3)   // 5 words → 3 trigram shingles
      assert(row.getInt(3) == 8)   // 8 LSH bands
      assert(row.getLong(4) != 0L)
      assert(row.getLong(5) == -7L)  // 2*4 + (-3)*5
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("kernel functions reject wrong-typed SQL inputs at analysis time") {
    // without checkInputDataTypes these would pass analysis and read
    // garbage through ArrayData accessors at runtime
    graft.functions.VectorKernels.register(spark)
    graft.functions.TextKernels.register(spark)
    Seq(
      "SELECT bvec_dot(array(1, 2), array(3, 4))",          // int, not tinyint
      "SELECT fvec_dot(array(1.0, 2.0), array(3.0, 4.0))",  // double, not float
      "SELECT fvec_norm('nope')",
      "SELECT shingle_hash64(42)",
      "SELECT minhash_bands(array('a'))",
      "SELECT simhash64(array(1))",
      "SELECT shingle_explode(7)",
      "SELECT pair_explode(CAST(7 AS BIGINT), array(1, 2), 5)"
    ).foreach { sql =>
      val e = intercept[org.apache.spark.sql.AnalysisException](
        spark.sql(sql).collect())
      assert(e.getMessage.toLowerCase.contains("expects") ||
        e.getMessage.contains("DATATYPE_MISMATCH"), s"$sql -> ${e.getMessage}")
    }
  }

  test("pair_explode dedupes non-adjacent repeated doc ids") {
    graft.functions.TextKernels.register(spark)
    def pairs(listSql: String, cap: Int) = spark.sql(
      s"""SELECT p.* FROM (SELECT CAST(7 AS BIGINT) AS g) t
         |LATERAL VIEW pair_explode(g, $listSql, $cap) p AS doc_a, doc_b, n_a, n_b
         |""".stripMargin).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    // collect_list gives no ordering guarantee: ids [5,3,5] must emit the
    // (3,5) pair exactly once, not twice
    val dup = pairs(
      "array(struct(CAST(5 AS BIGINT), 3), struct(CAST(3 AS BIGINT), 2), " +
        "struct(CAST(5 AS BIGINT), 3))", 10)
    assert(dup.toSeq == Seq((3L, 5L, 2, 3)))
    // duplicate inflation must not route a genuinely sub-cap list down the
    // hot-membership path: 4 raw entries over cap=3, but only 2 unique docs
    val inflated = pairs(
      "array(struct(CAST(1 AS BIGINT), 4), struct(CAST(2 AS BIGINT), 5), " +
        "struct(CAST(1 AS BIGINT), 4), struct(CAST(2 AS BIGINT), 5))", 3)
    assert(inflated.toSeq == Seq((1L, 2L, 4, 5)))
    // all-duplicates list collapses below 2 docs → no output at all
    val solo = pairs(
      "array(struct(CAST(9 AS BIGINT), 2), struct(CAST(9 AS BIGINT), 2))", 10)
    assert(solo.isEmpty)
  }

  test("pair_explode with a null group key yields no rows instead of an NPE") {
    graft.functions.TextKernels.register(spark)
    def run(cap: Int) = spark.sql(
      s"""SELECT p.* FROM (SELECT CAST(NULL AS BIGINT) AS g) t
         |LATERAL VIEW pair_explode(g,
         |  array(struct(CAST(1 AS BIGINT), 1), struct(CAST(2 AS BIGINT), 1),
         |        struct(CAST(3 AS BIGINT), 1)), $cap) p AS doc_a, doc_b, n_a, n_b
         |""".stripMargin).collect()
    // hot branch (3 unique docs > cap 2) carries the key in doc_b — a null
    // key must degrade to "no rows", never an executor NPE
    assert(run(2).isEmpty)
    // the sub-cap pair branch never reads the key: pairs still emit
    assert(run(10).length == 3)
  }
}
