package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorKernels

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    VectorKernels.register(spark)
    val dir = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $label"); r
    }
    val e = Tables.spread(Tables.load(spark, dir, "embeddings"))
    e.count()

    // how many LSH candidate pairs at sf0.1?
    val withNorm = e.select(col("vec_id"), col("embedding"),
      VectorKernels.fnorm(col("embedding")).as("nrm"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    withNorm.count()
    import graft.operators.Similarity
    // same plane construction as Similarity (seed 42)
    val NumPlanes = 16; val Bands = 4; val BitsPerBand = 4
    val rnd = new scala.util.Random(42)
    val planes = Array.fill(NumPlanes, 64)(if (rnd.nextBoolean()) 1.0f else -1.0f)
    val bucketCols = (0 until Bands).map { b =>
      val bits = (0 until BitsPerBand).map { j =>
        val plane = array(planes(b * BitsPerBand + j).map(lit): _*)
        when(VectorKernels.fdot(col("embedding"), plane) >= 0, lit(1L << j)).otherwise(lit(0L))
      }
      struct(lit(b).as("band"), bits.reduce(_ + _).as("bucket")).as(s"bb_$b")
    }
    val banded = withNorm
      .withColumn("bb", explode(array(bucketCols: _*)))
      .select(col("vec_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .persist()
    time("bucket histogram") {
      banded.groupBy("band", "bucket").count()
        .agg(sum(col("count") * col("count")).as("sum_sq"), max("count"), count(lit(1)))
        .show()
    }
    val cand = banded.toDF("q_id", "band", "bucket")
      .join(banded.toDF("n_id", "band_b", "bucket_b"),
        col("band") === col("band_b") && col("bucket") === col("bucket_b") &&
          col("q_id") =!= col("n_id"))
      .select("q_id", "n_id")
    time("raw candidate rows") { println("cand rows: " + cand.count()) }
    time("distinct candidate pairs") { println("pairs: " + cand.distinct().count()) }
    time("full lshTopK") {
      println("rows: " + Similarity.lshTopK(e).count())
    }
    spark.stop()
  }
}
