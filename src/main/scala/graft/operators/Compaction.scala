package graft.operators

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance operator every
  * file-per-event ingest (like the reference's one-Glue-run-per-upload,
  * /root/reference/health-etl/main.tf:231-252 + glue_job_script.py:49)
  * eventually needs: thousands of tiny parquet files destroy scan
  * parallelism bookkeeping and footer-read time at 100 TB.
  *
  * Rewrites a parquet directory into ⌈totalBytes / targetBytes⌉ files via a
  * single round-robin repartition; reading back preserves rows exactly.
  */
object Compaction {

  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val totalBytes = listFileBytes(new java.io.File(inDir))
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(inDir)
      .repartition(nFiles)
      .write.mode("overwrite").parquet(outDir)
    nFiles
  }

  private def listFileBytes(f: java.io.File): Long =
    if (f.isFile) { if (f.getName.endsWith(".parquet")) f.length else 0L }
    else Option(f.listFiles()).map(_.map(listFileBytes).sum).getOrElse(0L)

  /** Partition retention sweep over a Hive-layout table: drop every
    * `column=value` partition directory whose value sorts strictly below
    * `cutoff` — the TTL maintenance a date-partitioned ingest runs so the
    * lake doesn't grow without bound. The cutoff is a caller parameter
    * (never wall clock: reruns must be reproducible), the comparison is on
    * the partition VALUE (lexicographic — correct for ISO dates, the
    * layout's convention), and only first-level partition dirs are
    * touched. Returns the dropped partition values.
    *
    * Metadata-only: no Spark job runs — at scale this is a manifest/object
    * delete, never a data read.
    */
  def expirePartitions(tableDir: String, column: String,
                       cutoff: String): Seq[String] = {
    val root = new java.io.File(tableDir)
    val prefix = column + "="
    val victims = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(prefix))
      .filter(_.getName.stripPrefix(prefix) < cutoff)
      .sortBy(_.getName)
    victims.foreach(deleteRecursively)
    victims.map(_.getName.stripPrefix(prefix)).toSeq
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}
