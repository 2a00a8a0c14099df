package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** SpaceSaving heavy-hitters sketch as a typed [[Aggregator]] (SURVEY.md
  * §2.11): one-pass approximate top-k frequencies with the classic
  * guarantee — any token with true count > n/capacity is present, and every
  * reported count overestimates by at most the evicted minimum. When the
  * observed vocabulary never exceeds `capacity`, counts are EXACT (the spec
  * exploits this).
  *
  * Scale shape: partial sketches of bounded size (`capacity` entries) are
  * built map-side and merged associatively — a heavy-hitter query over
  * 100 TB of tokens shuffles `capacity` entries per partition instead of
  * the full vocabulary, unlike an exact groupBy count.
  */
final case class SpaceSaving(
    capacity: Int,
    counts: mutable.HashMap[String, Long]) {

  def add(tok: String): SpaceSaving = {
    counts.get(tok) match {
      case Some(c) => counts.update(tok, c + 1)
      case None if counts.size < capacity => counts.update(tok, 1L)
      case None =>
        val (minTok, minC) = counts.minBy(_._2)
        counts.remove(minTok)
        counts.update(tok, minC + 1)
    }
    this
  }

  def merge(o: SpaceSaving): SpaceSaving = {
    o.counts.foreach { case (k, v) =>
      counts.update(k, counts.getOrElse(k, 0L) + v)
    }
    if (counts.size > capacity) {
      val keep = counts.toSeq.sortBy { case (k, v) => (-v, k) }.take(capacity)
      counts.clear()
      keep.foreach { case (k, v) => counts.update(k, v) }
    }
    this
  }
}

/** `agg(heavyHitters.toColumn)` over a Dataset[String] (or via
  * `functions.udaf` for DataFrame use): returns (token, count) pairs sorted
  * by (count desc, token), truncated to `k`.
  */
class HeavyHitters(capacity: Int = 256, k: Int = 20)
    extends Aggregator[String, SpaceSaving, Seq[(String, Long)]] {

  override def zero: SpaceSaving =
    SpaceSaving(capacity, mutable.HashMap.empty)

  override def reduce(b: SpaceSaving, tok: String): SpaceSaving = b.add(tok)

  override def merge(b1: SpaceSaving, b2: SpaceSaving): SpaceSaving = b1.merge(b2)

  override def finish(b: SpaceSaving): Seq[(String, Long)] =
    b.counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(k)

  override def bufferEncoder: Encoder[SpaceSaving] = Encoders.kryo[SpaceSaving]

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}
