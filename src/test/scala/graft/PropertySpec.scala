package graft

import graft.operators.IngestJob
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pure (driver-side) helpers, via ScalaCheck
  * generators sampled deterministically.
  */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("isCsv accepts any casing of .csv and nothing else") {
    for (stem <- samples(Gen.alphaNumStr, 100); ext <- Seq(".csv", ".CSV", ".cSv"))
      assert(IngestJob.isCsv(stem + ext))
    for (stem <- samples(Gen.alphaNumStr, 100); ext <- Seq(".json", ".parquet", ".tsv", ""))
      assert(!IngestJob.isCsv(stem + ext))
  }

  test("jaccard reference formula stays in [0,1] and is 1 iff sets equal") {
    val gl = Gen.listOf(Gen.choose(0, 30))
    for ((xs, ys) <- samples(gl).zip(samples(gl).reverse)) {
      val (a, b) = (xs.toSet, ys.toSet)
      if (a.nonEmpty || b.nonEmpty) {
        val inter = a.intersect(b).size
        val j = inter.toDouble / (a.size + b.size - inter)
        assert(j >= 0.0 && j <= 1.0)
        assert((j == 1.0) == (a == b))
      }
    }
  }
}
