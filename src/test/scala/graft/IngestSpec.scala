package graft

import java.nio.file.{Files, Paths}
import graft.operators.IngestJob
import graft.streaming.StreamingIngest
import org.apache.spark.sql.types._

/** End-to-end ingest parity with the reference pipeline
  * (glue_job_script.py + the EventBridge/Lambda control plane): Hive layout,
  * schema, append-on-rerun, non-CSV guard, and the streaming variant's
  * exactly-once file pickup.
  */
class IngestSpec extends SparkSuite {

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  private val sampleCsv =
    """patient_id,encounter_id,diagnosis,amount
      |P001,E1001,J45.909,125.50
      |P002,E1002,E11.9,87.25
      |""".stripMargin

  private def writeCsv(dir: String, name: String, body: String = sampleCsv): Unit =
    Files.writeString(Paths.get(dir, name), body)

  test("batch ingest: CSV → Hive-partitioned parquet with inferred schema") {
    val (src, out) = (tmp("src"), tmp("out"))
    writeCsv(src, "sample.csv")
    val n = IngestJob.run(spark, IngestJob.Config(src, Some("sample.csv"), out, "2026-08-12"))
    assert(n == 2)
    assert(Files.isDirectory(Paths.get(out, "ingest_date=2026-08-12")))
    val df = spark.read.parquet(out)
    assert(df.schema.fieldNames.toSet ==
      Set("patient_id", "encounter_id", "diagnosis", "amount", "ingest_date"))
    assert(df.schema("amount").dataType == DoubleType) // inferSchema parity
  }

  test("batch ingest: rerun appends (reference append mode)") {
    val (src, out) = (tmp("src"), tmp("out"))
    writeCsv(src, "sample.csv")
    val cfg = IngestJob.Config(src, Some("sample.csv"), out, "2026-08-12")
    IngestJob.run(spark, cfg)
    val n2 = IngestJob.run(spark, cfg)
    assert(n2 == 2) // THIS run's rows, not the cumulative partition
    assert(spark.read.parquet(out).count() == 4) // both runs appended
  }

  test("batch ingest: non-CSV object is skipped by the guard") {
    val (src, out) = (tmp("src"), tmp("out"))
    writeCsv(src, "sample.json")
    val n = IngestJob.run(spark, IngestJob.Config(src, Some("sample.json"), out, "2026-08-12"))
    assert(n == 0)
    assert(!Files.exists(Paths.get(out, "ingest_date=2026-08-12")))
  }

  test("batch ingest: prefix scan picks up only *.csv") {
    val (src, out) = (tmp("src"), tmp("out"))
    writeCsv(src, "a.csv")
    writeCsv(src, "b.csv")
    writeCsv(src, "noise.txt", "not,a,csv\n1,2,3\n")
    val n = IngestJob.run(spark, IngestJob.Config(src, None, out, "2026-08-12"))
    assert(n == 4)
  }

  private val schema = StructType(Seq(
    StructField("patient_id", StringType),
    StructField("encounter_id", StringType),
    StructField("diagnosis", StringType),
    StructField("amount", DoubleType)))

  test("streaming ingest: AvailableNow drains pending files exactly once") {
    val (src, out, chk) = (tmp("ssrc"), tmp("sout"), tmp("schk"))
    writeCsv(src, "first.csv")
    val q1 = StreamingIngest.start(spark, src, out, chk, schema, "2026-08-12")
    q1.awaitTermination()
    assert(spark.read.parquet(out).count() == 2)

    // rerun with the same checkpoint: first.csv must NOT be reprocessed,
    // the newly landed file must be
    writeCsv(src, "second.csv")
    val q2 = StreamingIngest.start(spark, src, out, chk, schema, "2026-08-12")
    q2.awaitTermination()
    val df = spark.read.parquet(out)
    assert(df.count() == 4)
    // Spark's partition-type inference reads yyyy-MM-dd values as DateType;
    // with inference off the column is the reference's string partition key
    // (what the Glue crawler registers).
    assert(df.schema("ingest_date").dataType == DateType)
    val key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    spark.conf.set(key, "false")
    try {
      val asString = spark.read.parquet(out)
      assert(asString.schema("ingest_date").dataType == StringType)
    } finally spark.conf.set(key, "true")
  }
}
