package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-state grouped top-k — the aggregation shape for "k best
  * neighbors per query" at corpus scale (SURVEY.md §2.11 kernel policy:
  * Aggregators over UDFs; the [[HeavyHitters]]/[[Kmv]] convention).
  *
  * Why this exists (r14): the LSH candidate ranking previously relied on a
  * rank window whose map-side WindowGroupLimit prune still SORTS the whole
  * per-task candidate stream before pruning — at the 2 M-vector probe
  * corpus the ~2·10⁹ scored pairs spilled >90 GB of sort runs and the
  * build died on scratch space (the cap-12 run filled 77 GB the same way).
  * A k-sized insertion buffer per query never materializes the stream at
  * all: per-task state is O(live queries × k), the shuffle carries ≤ k
  * entries per (task, query), and there is NO sort anywhere in the rank
  * path. This is the textbook 100 TB top-k aggregate — candidate volume
  * only ever streams through compare-and-insert.
  *
  * Semantics are EXACTLY the dense_rank form it replaces (value-identical,
  * every oracle hash unchanged): candidates order by
  * (round(cos, 9) DESC, n_id ASC) — the 9-dp round replicated with the
  * same HALF_UP BigDecimal arithmetic Catalyst's Round uses — and a pair
  * colliding in several bands carries an identical cosine, so duplicate
  * (n_id, cos) arrivals are dropped on insert exactly as the old
  * dense_rank + distinct() collapsed them. Rank = 1-based position in the
  * final merged order.
  */
final case class TopKNeighborsBuf(
    k: Int,
    // sorted by (r9 desc, nId asc); length <= k. Entries are
    // (r9 = round(cos, 9), nId, raw cos).
    buf: ArrayBuffer[(Double, Long, Double)]) {

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  def add(nId: Long, cos: Double): TopKNeighborsBuf = {
    val r9 = round9(cos)
    var i = 0
    while (i < buf.length &&
        (buf(i)._1 > r9 || (buf(i)._1 == r9 && buf(i)._2 < nId))) i += 1
    // a band duplicate of a pair has the identical (r9, nId) key and lands
    // exactly here — drop it (the old distinct())
    if (i < buf.length && buf(i)._1 == r9 && buf(i)._2 == nId) return this
    if (i < k) {
      buf.insert(i, (r9, nId, cos))
      if (buf.length > k) buf.remove(k)
    }
    this
  }

  def merge(o: TopKNeighborsBuf): TopKNeighborsBuf = {
    o.buf.foreach { case (_, nId, cos) => add(nId, cos) }
    this
  }
}

/** `groupBy(q_id).agg(TopK.neighbors(k)(n_id, cos))` → array of
  * (n_id, cos, rank) structs, rank 1-based in (round(cos,9) desc, n_id)
  * order, band duplicates collapsed.
  */
class TopKNeighborsAgg(k: Int)
    extends Aggregator[(Long, Double), TopKNeighborsBuf, Seq[(Long, Double, Int)]] {

  override def zero: TopKNeighborsBuf =
    TopKNeighborsBuf(k, ArrayBuffer.empty)

  override def reduce(b: TopKNeighborsBuf, in: (Long, Double)): TopKNeighborsBuf =
    b.add(in._1, in._2)

  override def merge(b1: TopKNeighborsBuf, b2: TopKNeighborsBuf): TopKNeighborsBuf =
    b1.merge(b2)

  override def finish(b: TopKNeighborsBuf): Seq[(Long, Double, Int)] =
    b.buf.iterator.zipWithIndex
      .map { case ((_, nId, cos), i) => (nId, cos, i + 1) }.toSeq

  override def bufferEncoder: Encoder[TopKNeighborsBuf] =
    Encoders.kryo[TopKNeighborsBuf]

  override def outputEncoder: Encoder[Seq[(Long, Double, Int)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double, Int)]]()
}

object TopK {
  /** Column form over (n_id: bigint, cos: double). */
  def neighbors(k: Int)(nId: Column, cos: Column): Column =
    udaf(new TopKNeighborsAgg(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))(nId, cos)
}
