package graft

import graft.operators.{Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._

class TextMultimodalSpec extends SparkSuite {

  test("langId identifies real sentences (the testdata soup can't)") {
    import spark.implicits._
    val samples = Seq(
      ("the quick brown fox jumps over the lazy dog and that is that", "en"),
      ("der hund ist nicht ein katze und das ist gut", "de"),
      ("le chat est sur la table et les enfants sont une famille", "fr"),
      ("el perro es que las casas una para los gatos", "es"),
      ("这是一个中文句子", "zh"))
    val got = samples.toDF("text", "expected")
      .withColumn("guess", TextAnalysis.langId(col("text")))
      .collect()
    got.foreach(r => assert(r.getAs[String]("guess") == r.getAs[String]("expected"),
      s"text='${r.getString(0)}'"))
  }

  test("sorted-token fingerprint is permutation-invariant, rolling hash is not") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha"),
      (3L, "alpha beta gamma epsilon")).toDF("doc_id", "text")
    val fp = df.select(
      col("doc_id"),
      md5(array_join(sort_array(split(col("text"), " ")), " ")).as("sorted"),
      aggregate(split(col("text"), " "), lit(0L),
        (acc, t) => (acc * 31 + graft.functions.Deterministic.md5Hash32(t)) % 2147483647L)
        .as("rolling"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(fp(1L)._1 == fp(2L)._1) // permutation → same sorted fingerprint
    assert(fp(1L)._1 != fp(3L)._1) // different tokens → different fingerprint
    assert(fp(1L)._2 != fp(2L)._2) // rolling hash is order-sensitive
  }

  test("media decode: deterministic, right batch shape, plausible values") {
    val d = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val r1 = Multimodal.decodeImages(spark, d).collect().sortBy(_.doc_id)
    val r2 = Multimodal.decodeImages(spark, d).collect().sortBy(_.doc_id)
    assert(r1.length == 500)
    assert(r1.toSeq == r2.toSeq)
    r1.foreach { m =>
      assert(m.width >= 16 && m.width < 256)
      assert(m.height >= 16 && m.height < 256)
      assert(m.n_channels == 3)
      assert(m.mean_intensity > 0 && m.mean_intensity < 256)
    }
  }
}
