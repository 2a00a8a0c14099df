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

  test("text kernels: determinism, shingle-count bounds, simhash bag-of-words invariance") {
    import graft.functions.TextHash
    import org.apache.spark.unsafe.types.UTF8String
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val text = Gen.nonEmptyListOf(word).map(_.mkString(" "))
    for (t <- samples(text, 150)) {
      val u = UTF8String.fromString(t)
      val nWords = t.split(" ").length
      val sh = TextHash.shingleHashes(u, 3)
      // determinism + bounds + sortedness (dedup relies on sorted arrays)
      assert(sh.toSeq == TextHash.shingleHashes(u, 3).toSeq)
      assert(sh.length >= 1 && sh.length <= math.max(1, nWords - 2))
      assert(sh.toSeq == sh.toSeq.sorted && sh.toSeq.distinct == sh.toSeq)
    }
    // simhash: pure bag-of-words — any permutation of the words hashes equal
    def simOf(s: String): Long = TextHash.simhash(UTF8String.fromString(s))
    val rng = new scala.util.Random(42)
    for (t <- samples(Gen.listOfN(8, word).map(_.mkString(" ")), 80)) {
      val perm = rng.shuffle(t.split(" ").toSeq).mkString(" ")
      assert(simOf(t) == simOf(perm), s"'$t' vs '$perm'")
    }
  }

  test("minhash bands: identical shingle sets collide in every band, disjoint rarely") {
    import graft.functions.TextHash
    def bands(hs: Array[Long]): Seq[Long] =
      TextHash.minhashBands(hs, 32, 8).toSeq
    val hashes = Gen.nonEmptyListOf(Gen.long).map(_.distinct.sorted.toArray)
    for (hs <- samples(hashes, 100)) {
      assert(bands(hs) == bands(hs))            // deterministic
      assert(bands(hs).length == 8)
    }
    // disjoint random sets should essentially never share a band
    val pairs = samples(hashes, 60).grouped(2).collect { case Seq(a, b) => (a, b) }
    val collisions = pairs.count { case (a, b) =>
      a.intersect(b).isEmpty && bands(a).intersect(bands(b)).nonEmpty
    }
    assert(collisions == 0)
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
