package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Live JDBC connector coverage against embedded Derby (on the Spark
  * classpath): round-trip write/read, predicate pushdown into the remote
  * query, and the partitioned parallel read.
  */
class JdbcSpec extends SparkSuite {

  private lazy val url = {
    val dir = java.nio.file.Files.createTempDirectory("graft-derby")
    // Derby writes a derby.log next to the CWD unless told otherwise
    System.setProperty("derby.stream.error.file",
      dir.resolve("derby.log").toString)
    s"jdbc:derby:${dir.resolve("db")};create=true"
  }

  private def seed(): Unit = {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, s"name_$i", i % 7)).toDF("id", "name", "grp")
    Sources.jdbcSink(df.coalesce(1), url, "people", mode = "overwrite")
  }

  test("jdbc write/read round-trip preserves rows and schema") {
    seed()
    val back = Sources.jdbc(spark, url, "people")
    assert(back.count() == 100)
    assert(back.columns.map(_.toLowerCase).sorted.toSeq == Seq("grp", "id", "name"))
    assert(back.filter(col("id") === 42).select("name").collect()
      .map(_.getString(0)).toSeq == Seq("name_42"))
  }

  test("jdbc filters push into the remote query, not a post-scan filter") {
    seed()
    val q = Sources.jdbc(spark, url, "people").filter(col("grp") === 3)
    val p = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("JDBCRelation"), p)
    assert(p.contains("PushedFilters") && p.contains("EqualTo(grp,3)"),
      s"grp=3 should reach the JDBC source\n$p")
    assert(q.count() == 100 / 7 // 14 full groups
      + (if (3 <= 100 % 7) 1 else 0))
  }

  test("jdbc partitioned read splits into parallel range queries") {
    seed()
    val part = Sources.jdbcPartitioned(spark, url, "people",
      partitionColumn = "id", lower = 1L, upper = 101L, numPartitions = 4)
    assert(part.rdd.getNumPartitions == 4)
    // bounds shape the slicing only — every row still arrives
    assert(part.count() == 100)
  }
}
