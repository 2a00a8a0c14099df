package graft

import graft.functions.Hll
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class HllSpec extends SparkSuite {

  import spark.implicits._

  private val items: Seq[(String, String)] =
    (1 to 200).map(i => ("a", s"u${i % 60}")) ++
      (1 to 90).map(i => ("b", s"v${i % 25}"))

  test("streaming register maintenance equals one batch pass under uneven chunking") {
    // merge = cell-wise MAX is associative/commutative/idempotent, so ANY
    // micro-batching (here 3 uneven chunks with re-deliveries across
    // chunks) must yield the identical register table Spark's streaming
    // aggregation state maintains
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val regs = Hll.registers(input.toDF().toDF("g", "k"), col("g"), col("k"))
    val q = regs.writeStream.format("memory").queryName("hll_regs")
      .outputMode("complete").start()
    try {
      input.addData(items.take(7): _*)
      q.processAllAvailable()
      input.addData(items.slice(7, 180): _*)
      input.addData(items.drop(180): _*)
      q.processAllAvailable()
      val streamed = spark.table("hll_regs")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      val batch = Hll.registers(items.toDF("g", "k"), col("g"), col("k"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      assert(streamed == batch,
        s"stream-maintained registers diverged: ${streamed.diff(batch)} / ${batch.diff(streamed)}")
    } finally q.stop()
  }

  test("register merge across shards equals registers of the union") {
    val (l, r) = items.splitAt(137)
    val merged = Hll.registers(l.toDF("g", "k"), col("g"), col("k"))
      .unionByName(Hll.registers(r.toDF("g", "k"), col("g"), col("k")))
      .groupBy("g", "idx").agg(max(col("mreg")).as("mreg"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getInt(2))).toSet
    val whole = Hll.registers(items.toDF("g", "k"), col("g"), col("k"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getInt(2))).toSet
    assert(merged == whole)
  }

  test("estimate lands within the m=64 accuracy band on known cardinalities") {
    val est = Hll.estimate(Hll.registers(items.toDF("g", "k"), col("g"), col("k")))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // true distincts: a -> 60, b -> 25
    assert(math.abs(est("a") / 60.0 - 1) <= 0.35, est.toString)
    assert(math.abs(est("b") / 25.0 - 1) <= 0.35, est.toString)
  }
}
