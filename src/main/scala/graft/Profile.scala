package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev profiling harness (guide §1): time queries by name AND decompose the
  * wall clock into scheduler-visible structure — jobs, stages, tasks, task
  * time, shuffle bytes — so "slow" separates into per-task work vs stage-wave
  * latency vs shuffle volume. `runMain graft.Profile q1 q2 ...`; each query
  * runs twice (memo-warm floor, Bench's best-of convention), listener counts
  * reset per run, second run reported.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    val shufRead = new AtomicLong
    val shufWrite = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(): Unit }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(): Unit
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
          shufRead.addAndGet(t.taskMetrics.shuffleReadMetrics.totalBytesRead)
          shufWrite.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten): Unit
        }
      }
    })
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      var line = ""
      (1 to 2).foreach { i =>
        jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0)
        shufRead.set(0); shufWrite.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Caches.release(spark)
        spark.catalog.clearCache()
        // listener events drain asynchronously; give them a beat
        Thread.sleep(300)
        line = f"PROFILE $name%-36s run$i=$dt%7.3f s  jobs=${jobs.get}%3d stages=${stages.get}%4d tasks=${tasks.get}%5d taskTime=${taskMs.get / 1000.0}%8.1f s  shufR=${shufRead.get / 1048576.0}%8.1f MB shufW=${shufWrite.get / 1048576.0}%8.1f MB"
        println(line)
      }
    }
    spark.stop()
  }
}
