package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $label"); r
    }
    graft.functions.TextKernels.register(spark)
    val d = Tables.load(spark, dir, "documents")
    d.count()
    val sh = Tables.spread(d)
      .select(col("doc_id"), col("lang"),
        graft.functions.TextKernels.shingleHash64(col("text")).as("sh"))
    val ex = sh.select(col("doc_id"), col("lang"),
      size(col("sh")).as("n"), explode(col("sh")).as("g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = ex.toDF("doc_a", "lang", "n_a", "g")
    val b = ex.toDF("doc_b", "lang_b", "n_b", "g_b")
    val pairs = a.join(b, col("g") === col("g_b") && col("lang") === col("lang_b") &&
        col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b", "n_a", "n_b")
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("n_a") + col("n_b") - col("common")))
      .filter(col("jaccard") >= 0.8)
      .select("doc_a", "doc_b")
    val e = time("materialize pairs") {
      val p = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println("pairs: " + p.count()); p
    }
    val sym = e.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(e.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("u")).distinct().withColumn("label", col("u"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("init labels") { labels.count() }
    var changed = 1L; var i = 0
    while (changed > 0 && i < 20) {
      time(s"iter $i") {
        val nbrMin = sym
          .join(labels.select(col("u").as("v"), col("label").as("nl")), "v")
          .groupBy("u").agg(min(col("nl")).as("cand"))
        val next = labels.join(nbrMin, Seq("u"), "left")
          .select(col("u"), least(col("label"), coalesce(col("cand"), col("label"))).as("label"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        changed = next.join(labels.select(col("u"), col("label").as("old")), "u")
          .filter(col("label") =!= col("old")).count()
        labels = next
        println(s"  changed=$changed")
      }
      i += 1
    }
    spark.stop()
  }
}
