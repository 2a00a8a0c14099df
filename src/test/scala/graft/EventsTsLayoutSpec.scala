package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** The events.ts physical-layout contract (VERDICT r8 #2): driver testdata
  * has shipped `ts` as parquet TIMESTAMP(NANOS) (Spark reads int64 under
  * `nanosAsLong`), as TIMESTAMP(MICROS) without zone (Spark: TIMESTAMP_NTZ)
  * and as zoned TIMESTAMP(MICROS) (plain TimestampType). `Tables.load`
  * normalizes all three to session-zone TimestampType; this spec proves the
  * two timestamp-boundary-sensitive queries (the day-splitting concurrency
  * sweep and the per-(user, day) rate limiter) return IDENTICAL results on
  * every layout — including sessions that end exactly at midnight, the
  * −1 µs day-split edge.
  */
class EventsTsLayoutSpec extends SparkSuite {
  import spark.implicits._

  /** Deterministic event stream in epoch MICROS, crafted to cross day
    * boundaries: user 7's last event sits exactly 10 minutes before
    * midnight, so its session (gap-extended by +10 min) ends exactly AT
    * midnight — the half-open [start, end) split edge.
    */
  private lazy val baseMicros: Seq[(Long, Long, Long)] = {
    val day0 = java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
      .toInstant(java.time.ZoneOffset.UTC)
    def us(day: Int, h: Int, m: Int, s: Int, micro: Int): Long =
      day0.plusSeconds(day * 86400L + h * 3600L + m * 60L + s)
        .toEpochMilli * 1000L + micro
    val regular = for {
      u <- 0L until 6L
      k <- 0 until 20
    } yield (u * 100 + k, u,
      us((k / 10) % 2, (k * 3) % 24, ((u * 7 + k * 11) % 60).toInt, (k * 13 % 60), (k % 5) * 7))
    val midnightEdge = Seq(
      (700L, 7L, us(1, 23, 40, 0, 0)),
      (701L, 7L, us(1, 23, 50, 0, 0)), // session end = day2 00:00:00 exactly
      (702L, 7L, us(2, 0, 30, 0, 999999)),
      (703L, 8L, us(0, 23, 59, 59, 999999))) // last micro of day 0
    regular ++ midnightEdge
  }

  private def writeLayout(tx: DataFrame => DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-evlayout").toString
    val df = baseMicros.toDF("event_id", "user_id", "us")
      .withColumn("event_type", concat(lit("t"), pmod(col("event_id"), lit(3))))
      .withColumn("value", (col("event_id") % 10).cast("double"))
    tx(df).drop("us").write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def results(name: String, dir: String): Seq[String] =
    Queries.byName(name).run(spark, dir).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq

  test("day-boundary queries agree byte-for-byte across all three ts layouts") {
    val zoned = writeLayout(df =>
      df.withColumn("ts", timestamp_micros(col("us"))))
    val ntz = writeLayout(df =>
      df.withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType)))
    // int64 nanoseconds — the Spark-visible form of parquet TIMESTAMP(NANOS)
    // once `nanosAsLong` applies (plain INT64 reads as LongType either way,
    // which is exactly the loader branch under test)
    val nanos = writeLayout(df =>
      df.withColumn("ts", col("us") * 1000L))
    // layout sanity: the three dirs genuinely carry three physical types
    assert(spark.read.parquet(s"$zoned/events.parquet").schema("ts").dataType
      == org.apache.spark.sql.types.TimestampType)
    assert(spark.read.parquet(s"$ntz/events.parquet").schema("ts").dataType
      == TimestampNTZType)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    assert(spark.read.parquet(s"$nanos/events.parquet").schema("ts").dataType
      == org.apache.spark.sql.types.LongType)
    for (q <- Seq("events_max_concurrency", "events_rate_limit")) {
      val a = results(q, zoned)
      val b = results(q, ntz)
      val c = results(q, nanos)
      assert(a.nonEmpty, s"$q returned nothing on the crafted stream")
      assert(a == b, s"$q: zoned vs NTZ diverge\n$a\n$b")
      assert(a == c, s"$q: zoned vs nanos diverge\n$a\n$c")
    }
    // the −1 µs day-split edge actually fires on this stream: user 7's
    // [Jan 2 23:40, Jan 3 00:00) session is half-open, so Jan 3's active
    // sessions come only from genuine Jan-3 events (user 7's 00:30 one)
    val jan3 = Queries.byName("events_max_concurrency").run(spark, zoned)
      .filter(col("d") === lit(java.sql.Date.valueOf("2024-01-03")))
      .select("n_active").collect()
    assert(jan3.length == 1 && jan3.head.getLong(0) == 1L,
      s"midnight-ending session leaked into Jan 3: ${jan3.mkString(",")}")
  }
}
