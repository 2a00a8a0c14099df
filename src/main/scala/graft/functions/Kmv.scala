package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) signature algebra — the SET-OPERATIONS member of
  * the mergeable-sketch family ([[Hll]] = cardinality, [[Cms]] = counts,
  * Bloom = membership, SpaceSaving = top-k): a signature is the k smallest
  * distinct hash values of a set, and signatures alone answer distinct
  * counts, UNION cardinality and — uniquely — INTERSECTION cardinality via
  * the Jaccard fraction of the union signature (the batch query path is
  * `TextAnalysis.kmvPanel`, oracle-replayed; this module is the
  * maintenance/merge surface).
  *
  * Merge = "k smallest of the concatenation", which is associative AND
  * IDEMPOTENT (signatures are sets — min-k of A ∪ A = min-k of A), so KMV
  * sits with HLL on the replay-tolerant side of the contract [[Cms]]'s
  * Scaladoc draws: at-least-once delivery is harmless, a re-delivered
  * chunk changes nothing. KmvSpec pins stream ≡ batch, shard-merge ≡
  * union, replay no-op, and agreement with the kmvPanel signature path.
  *
  * Scale shape: the [[KmvAgg]] Aggregator keeps a bounded sorted buffer of
  * ≤ k longs per group — map-side partials shuffle k values per partition
  * instead of the set's full cardinality, and the same Aggregator maintains
  * the signature incrementally under Structured Streaming (update/complete
  * mode), state a constant k longs per group at any corpus size.
  */
object Kmv {

  /** Bounded sorted-distinct buffer of the k smallest values. */
  final case class KmvBuf(k: Int, vs: scala.collection.mutable.TreeSet[Long]) {
    def add(h: Long): KmvBuf = {
      if (vs.size < k) vs += h
      else if (h < vs.max && !vs.contains(h)) { vs -= vs.max; vs += h }
      this
    }
    def mergeWith(o: KmvBuf): KmvBuf = {
      o.vs.foreach(add)
      this
    }
  }

  /** `groupBy(g).agg(udaf over the hash column)` → sorted signature array.
    * Deterministic: the buffer is a set of exact longs; order and content
    * are independent of partitioning and delivery order/multiplicity.
    */
  class KmvAgg(k: Int = 128) extends Aggregator[Long, KmvBuf, Seq[Long]] {
    override def zero: KmvBuf =
      KmvBuf(k, scala.collection.mutable.TreeSet.empty[Long])
    override def reduce(b: KmvBuf, h: Long): KmvBuf = b.add(h)
    override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = a.mergeWith(b)
    override def finish(b: KmvBuf): Seq[Long] = b.vs.toSeq
    override def bufferEncoder: Encoder[KmvBuf] = Encoders.kryo[KmvBuf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** (g, sig) signature table of a (g, k-string) frame: hash, then the
    * bounded-buffer aggregation. Runs unchanged on a streaming frame.
    */
  def signatures(df: DataFrame, group: Column, key: Column,
                 k: Int = 128): DataFrame = {
    val agg = udaf(new KmvAgg(k))
    df.select(group.as("g"),
        Deterministic.md5Hash32(key.cast("string")).as("h"))
      .groupBy("g").agg(agg(col("h")).as("sig"))
  }

  /** Merge signature tables from shards/days: k-smallest of concatenation,
    * expressed on the signature ARRAYS (constant-size input — never back to
    * raw data).
    */
  def merge(k: Int, tables: DataFrame*): DataFrame =
    tables.reduce(_ unionByName _)
      .select(col("g"), explode(col("sig")).as("h")).distinct()
      .groupBy("g").agg(slice(array_sort(collect_set(col("h"))), 1, k).as("sig"))

  /** Distinct-cardinality estimate column for a signature array:
    * (k−1)·2³²/h₍ₖ₎, exact count below k members (`TextAnalysis.kmvPanel`'s
    * estimator, as one reusable expression).
    */
  def estimate(sig: Column, k: Int = 128): Column =
    when(size(sig) < k, size(sig).cast("double"))
      .otherwise(lit((k - 1).toDouble * 4294967296.0) /
        element_at(sig, -1).cast("double"))
}
