package graft

/** Developer timing harness: time individual queries by name without paying
  * for the full [[Bench]] sweep. `runMain graft.BenchOne q1 q2 ...` (repeats
  * each query twice, reports best — same convention as Bench).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    // CPU canary (the Bench dual-canary convention, r13): a fixed
    // pure-compute kernel whose best-of-2 moves only with the host's
    // effective CPU throughput — the count canary below is I/O/metadata-
    // shaped and misses noisy-neighbor CPU modes. Printed first so every
    // BENCHONE block carries both noise floors.
    val canaryCpu = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      spark.range(0, 30000000L, 1, cpus.toInt)
        .select(org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.xxhash64(
            org.apache.spark.sql.functions.col("id")))).count()
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"BENCHONE canary_cpu                   best=$canaryCpu%.3f")
    // contention canary first (the Bench convention): a code-stable cheap
    // query whose time moves only with host load, so every BENCHONE block
    // carries its own noise floor
    ("ref_partition_count" +: args.toSeq).distinct.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        // cache teardown excluded from the timed window, same as Bench
        Caches.release(spark)
        spark.catalog.clearCache()
        dt
      }
      println(f"BENCHONE $name%-28s best=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
