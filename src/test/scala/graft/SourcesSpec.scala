package graft

import java.nio.file.Files

import graft.sources.{Sources, TableSchemas}
import org.apache.spark.sql.functions._

/** Reader/writer roundtrips: every format preserves schema + rows; the
  * partitioned parquet sink produces a prunable Hive layout without a
  * single-writer bottleneck.
  */
class SourcesSpec extends SparkSuite {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private lazy val orders = Tables.load(spark, sfDir, "orders")

  test("csv roundtrip with explicit schema preserves types and rows") {
    val dir = tmp("graft-csv")
    // timestamps go through CSV as strings; export a string-safe projection
    val src = orders.select(col("o_orderkey"), col("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"))
    Sources.csvSink(src, dir)
    val back = Sources.csv(spark, dir,
      org.apache.spark.sql.types.StructType(TableSchemas.orders.fields.take(4)))
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    assert(back.agg(sum("o_orderkey")).head.getLong(0) ==
      src.agg(sum("o_orderkey")).head.getLong(0))
  }

  test("json roundtrip with explicit schema") {
    val dir = tmp("graft-json")
    val src = Tables.load(spark, sfDir, "documents")
    Sources.jsonSink(src, dir)
    val back = Sources.json(spark, dir, TableSchemas.documents)
    assert(back.count() == src.count())
    assert(back.agg(sum(length(col("text")))).head.getLong(0) ==
      src.agg(sum(length(col("text")))).head.getLong(0))
  }

  test("partitioned parquet sink: Hive layout, no single-task write, prunable") {
    val dir = tmp("graft-part")
    val src = orders.withColumn("order_year", year(col("o_orderdate")))
    Sources.partitionedParquet(src, dir, Seq("order_year"))
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("order_year=")), dirs.mkString(","))
    val back = Sources.parquet(spark, dir)
    assert(back.count() == src.count())
    // partition pruning: filtering on the partition column scans one dir
    val pruned = back.filter(col("order_year") === 2000)
    val scanned = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() ==
      src.filter(col("order_year") === 2000).count())
    assert(!scanned.contains("PushedFilters: [IsNotNull(order_year)"),
      "partition filter should prune, not post-filter")
  }

  test("inferred csv read reproduces the reference parity path") {
    val dir = tmp("graft-infer")
    Sources.csvSink(orders.select("o_orderkey", "o_totalprice"), dir)
    val back = Sources.csvInferred(spark, dir)
    // inference picks the narrowest integral type that fits the data
    assert(Set("integer", "long").contains(back.schema("o_orderkey").dataType.typeName))
    assert(back.schema("o_totalprice").dataType.typeName == "double")
    assert(back.count() == orders.count())
  }
}
