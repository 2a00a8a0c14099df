package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-state grouped top-k — the aggregation shape for "k best
  * neighbors per query" at corpus scale (SURVEY.md §2.11 kernel policy:
  * Aggregators over UDFs; the [[HeavyHitters]]/[[Kmv]] convention).
  *
  * Why this exists (r14, WIRED in r15): the LSH candidate ranking
  * previously relied on a rank window whose map-side WindowGroupLimit
  * prune still SORTS the whole per-task candidate stream before pruning —
  * at the 2 M-vector probe corpus the ~2·10⁹ scored pairs spilled >90 GB
  * of sort runs and the build died on scratch space (the cap-12 run
  * filled 77 GB the same way). A k-sized insertion buffer per query never
  * materializes the stream at all: per-task state is O(live queries × k),
  * the exchange carries one ≤ k-entry partial buffer per (task, query),
  * and there is NO sort anywhere in the rank path. This is the textbook
  * 100 TB top-k aggregate — candidate volume only ever streams through
  * compare-and-insert. `rankBanded` (operators/Similarity.scala) is the
  * call site; Round15Spec pins both the no-Window/no-rank-Sort plan and
  * value-identity against the row_number-over-distinct-candidates oracle
  * form.
  *
  * Semantics are EXACTLY the dense_rank form it replaces (value-identical,
  * every oracle hash unchanged): candidates order by
  * (round(cos, 9) DESC, n_id ASC) — the 9-dp round replicated with the
  * same HALF_UP BigDecimal arithmetic Catalyst's Round uses — and a pair
  * colliding in several bands carries an identical cosine, so duplicate
  * (n_id, cos) arrivals are dropped on insert exactly as the old
  * dense_rank + distinct() collapsed them. Rank = 1-based position in the
  * final merged order. `finish` returns the RAW cosine; the caller's
  * projection applies the same round(cos, 6) the window form emitted.
  *
  * Buffer representation: an immutable sorted List inside a product-encoded
  * case class (NOT kryo — the buffer crosses the partial/final exchange
  * once per (task, query) and a product encoder writes it as a plain
  * array-of-struct column). The hot path never allocates: a full buffer
  * rejects a non-qualifying candidate with one double compare (the
  * round(cos,9) can only move a value by < 5e-10, so `cos < minR9 - 1e-9`
  * proves the candidate cannot reach the buffer tail even after rounding,
  * with the extra 5e-10 absorbing the ~ulp of IEEE error the compare and
  * the stored r9 each carry — the BigDecimal round runs only for the
  * O(k·ln n) candidates that survive the guard).
  */
final case class TopKNeighborEntry(r9: Double, nId: Long, cos: Double)

final case class TopKNeighborsBuf(k: Int, buf: List[TopKNeighborEntry]) {

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  def add(nId: Long, cos: Double): TopKNeighborsBuf = {
    // fast reject: buffer full and the candidate provably sorts below the
    // current tail even after rounding — the overwhelmingly common case on
    // a candidate stream, no BigDecimal, no allocation. The margin is a
    // full 1e-9 grid cell (double the 5e-10 rounding half-width): the
    // subtraction and the stored r9 each carry ~1 ulp of IEEE error, so a
    // 5e-10 margin left a ~2-ulp window where a candidate that TIES the
    // tail at 9 dp (and wins the nId tiebreak) could be wrongly rejected;
    // at 1e-9 a rejected cos rounds to at most tail.r9 − 1e-9 + 5e-10 +
    // ulp-noise < tail.r9, strictly below the tail, so rejection is sound.
    // Anything inside the margin falls through to the exact round9 path.
    if (buf.length >= k && cos < buf.last.r9 - 1e-9) return this
    val r9 = round9(cos)
    if (buf.length >= k) {
      val last = buf.last
      if (r9 < last.r9 || (r9 == last.r9 && nId > last.nId)) return this
    }
    // insertion point in (r9 desc, nId asc) order
    val (before, after) = buf.span(e => e.r9 > r9 || (e.r9 == r9 && e.nId < nId))
    // a band duplicate of a pair has the identical (r9, nId) key and lands
    // exactly here — drop it (the old distinct())
    if (after.nonEmpty && after.head.r9 == r9 && after.head.nId == nId) return this
    val merged = before ::: TopKNeighborEntry(r9, nId, cos) :: after
    copy(buf = if (merged.length > k) merged.take(k) else merged)
  }

  def merge(o: TopKNeighborsBuf): TopKNeighborsBuf =
    o.buf.foldLeft(this)((b, e) => b.add(e.nId, e.cos))
}

/** `groupBy(q_id).agg(TopK.neighbors(k)(n_id, cos))` → array of
  * (n_id, cos, rank) structs, rank 1-based in (round(cos,9) desc, n_id)
  * order, band duplicates collapsed, cosine RAW (caller rounds for
  * display).
  */
class TopKNeighborsAgg(k: Int)
    extends Aggregator[(Long, Double), TopKNeighborsBuf, Seq[(Long, Double, Int)]] {

  override def zero: TopKNeighborsBuf = TopKNeighborsBuf(k, Nil)

  override def reduce(b: TopKNeighborsBuf, in: (Long, Double)): TopKNeighborsBuf =
    b.add(in._1, in._2)

  override def merge(b1: TopKNeighborsBuf, b2: TopKNeighborsBuf): TopKNeighborsBuf =
    b1.merge(b2)

  override def finish(b: TopKNeighborsBuf): Seq[(Long, Double, Int)] =
    b.buf.iterator.zipWithIndex
      .map { case (e, i) => (e.nId, e.cos, i + 1) }.toSeq

  override def bufferEncoder: Encoder[TopKNeighborsBuf] =
    Encoders.product[TopKNeighborsBuf]

  override def outputEncoder: Encoder[Seq[(Long, Double, Int)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double, Int)]]()
}

object TopK {
  /** Column form over (n_id: bigint, cos: double). */
  def neighbors(k: Int)(nId: Column, cos: Column): Column =
    udaf(new TopKNeighborsAgg(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))(nId, cos)

  /** Wide-shortlist variant (k ≫ 20): same (round(cos,9) desc, nId asc)
    * contract as [[neighbors]], different buffer mechanics — the
    * insertion LIST pays O(k) per accepted candidate, which at the probe
    * ladder's k = 4000 shortlists became the dominant 2 M-decade cost
    * (SURVEY §6 r16); this buffer appends accepts into a flat array and
    * COMPACTS (sort + truncate to k + tighten the reject threshold) only
    * when the scratch fills — amortized O(log k) per accept, still O(k)
    * state, still no sort of the candidate STREAM. Caveat vs the list
    * form: duplicate (nId, cos) arrivals are collapsed only at
    * compaction/finish, so intermediate scratch can hold both copies —
    * fine for its call sites (the ivfpq/hamming shortlists are
    * one-row-per-pair streams; the multi-band LSH rank keeps the list
    * form at k ≤ 20 where the list is optimal).
    */
  def neighborsWide(k: Int)(nId: Column, cos: Column): Column =
    udaf(new TopKNeighborsWideAgg(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))(nId, cos)
}

/** Flat scratch buffer for [[TopK.neighborsWide]]: `ids`/`coss` hold up to
  * 2·k candidates (`n` live), `thr` is the round-9 score of the current
  * k-th best AFTER the last compaction (−∞ until k accepts seen) — the
  * fast-reject bound. Arrays are mutated in place between serializations
  * (the ObjectHashAggregate holds the JVM object; the product encoder
  * writes the arrays only at the partial/final exchange).
  *
  * The scratch GROWS lazily (r17): it starts at 64 entries and doubles —
  * capped at 2k+1 — whenever compaction leaves it more than half full.
  * Eager 2k+1 allocation OOM'd the 2 M-decade probe at k = 40 000: the
  * map-side partial aggregate holds one buffer PER GROUP PER TASK
  * (panel × tasks ≈ 8 000 live buffers × 1.3 MB eager = 10 GB before a
  * single candidate arrives), and the product encoder serializes the
  * FULL capacity across the exchange. Lazy growth makes buffer memory
  * and exchange bytes proportional to candidates actually accepted —
  * the result is value-identical (compaction is an order-insensitive
  * dedup + sort + truncate; growth only changes WHEN it runs).
  */
final case class TopKWideBuf(k: Int, var n: Int, var thr: Double,
                             var ids: Array[Long], var coss: Array[Double]) {

  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Sort desc by (round9(cos), −nId), dedup exact (nId, cos) pairs,
    * truncate to k, tighten `thr`. The dedup-then-rank is exactly the
    * list form's collapse of duplicate arrivals.
    */
  def compact(): TopKWideBuf = {
    val entries = Array.tabulate(n)(i => (round9(coss(i)), ids(i), coss(i)))
      .distinctBy(e => (e._1, e._2)) // the list form's (r9, nId) collapse
      .sortBy { case (r9, id, _) => (-r9, id) }
    val keep = math.min(k, entries.length)
    // grow when the kept entries crowd the scratch (> half full) — else a
    // sub-2k capacity would re-compact on every append (O(n log n) per
    // add); doubling keeps the amortized O(log k) bound at every size
    val cap = if (keep > ids.length / 2)
      math.min(math.max(2 * ids.length, 64), 2 * k + 1)
    else ids.length
    val nids = new Array[Long](cap)
    val ncos = new Array[Double](cap)
    var i = 0
    while (i < keep) { nids(i) = entries(i)._2; ncos(i) = entries(i)._3; i += 1 }
    ids = nids; coss = ncos; n = keep
    if (keep >= k) thr = entries(keep - 1)._1
    this
  }

  def add(nId: Long, cos: Double): TopKWideBuf = {
    // the [[TopKNeighborsBuf]] fast-reject bound, against the compacted
    // threshold: a full 1e-9 grid cell of margin proves the candidate
    // cannot reach the kept k even after rounding
    if (thr > Double.NegativeInfinity && cos < thr - 1e-9) return this
    if (n == ids.length) compact()
    // compaction always reclaims or grows: capacity after it is > n
    // (truncate to k < 2k+1, or the > half-full doubling) — append is safe
    ids(n) = nId; coss(n) = cos; n += 1
    this
  }

  def merge(o: TopKWideBuf): TopKWideBuf = {
    var i = 0
    while (i < o.n) { add(o.ids(i), o.coss(i)); i += 1 }
    this
  }
}

/** Same contract as [[TopKNeighborsAgg]] at wide k — see
  * [[TopK.neighborsWide]].
  */
class TopKNeighborsWideAgg(k: Int)
    extends Aggregator[(Long, Double), TopKWideBuf, Seq[(Long, Double, Int)]] {

  override def zero: TopKWideBuf =
    TopKWideBuf(k, 0, Double.NegativeInfinity,
      new Array[Long](math.min(64, 2 * k + 1)),
      new Array[Double](math.min(64, 2 * k + 1)))

  override def reduce(b: TopKWideBuf, in: (Long, Double)): TopKWideBuf =
    b.add(in._1, in._2)

  override def merge(b1: TopKWideBuf, b2: TopKWideBuf): TopKWideBuf =
    b1.merge(b2)

  override def finish(b: TopKWideBuf): Seq[(Long, Double, Int)] = {
    b.compact()
    (0 until b.n).map(i => (b.ids(i), b.coss(i), i + 1))
  }

  override def bufferEncoder: Encoder[TopKWideBuf] =
    Encoders.product[TopKWideBuf]

  override def outputEncoder: Encoder[Seq[(Long, Double, Int)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double, Int)]]()
}
