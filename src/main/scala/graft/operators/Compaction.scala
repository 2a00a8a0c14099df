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
}
