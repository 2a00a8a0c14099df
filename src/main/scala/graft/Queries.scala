package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a named DataFrame query over a
  * scale-factor directory plus (usually) a DuckDB-oracle ANSI SQL equivalent.
  *
  * Determinism contract (SURVEY.md §7.4 / FIXTURES.md): every query ends in a
  * total ORDER BY; aggregated doubles go through exact decimal summation
  * ([[graft.functions.Deterministic]]); no wall-clock reads.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  // a forward reference inside an operator object's body reads null during
  // initialization — fail at construction, not deep inside Verify's JSON dump
  require(name != null && oracle != null && !oracle.contains(null),
    s"query $name: null name/oracle (object-initialization forward reference?)")
}

/** Central registry: each operator family contributes its queries here. */
object Queries {
  def all: Seq[Q] =
    operators.Relational.queries ++
      operators.Analytics.queries ++
      operators.Wrangling.queries ++
      operators.TimeSeries.queries ++
      operators.Dedup.queries ++
      operators.TextAnalysis.queries ++
      operators.Similarity.queries ++
      operators.Multimodal.queries ++
      operators.Graph.queries ++
      streaming.EventWindows.queries

  lazy val byName: Map[String, Q] = {
    val qs = all
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs.map(q => q.name -> q).toMap
  }
}
