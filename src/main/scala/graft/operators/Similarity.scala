package graft.operators

import graft.{Q, Tables}
import graft.functions.VectorKernels
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2.12 D4):
  * brute-force cosine top-k as the exact baseline, and random-hyperplane
  * LSH-bucketed ANN as the scale path.
  *
  * The dot/norm kernels are custom codegen Catalyst expressions
  * ([[graft.functions.FloatVecDot]]) — Spark's built-in higher-order
  * functions are CodegenFallback and dominated the candidate re-rank at
  * sf0.1. Same arithmetic (float widened to double, sequential
  * accumulation), so oracle compatibility is unchanged.
  */
object Similarity {

  private def emb(s: SparkSession, dir: String): DataFrame = {
    VectorKernels.register(s)
    // spread: the local embeddings file is a single scan partition; dot
    // products would otherwise run single-threaded (see Tables.spread).
    Tables.spread(Tables.load(s, dir, "embeddings"))
  }

  /** The PRODUCTION LSH top-5 ranked lists — the [[lshTopKAuto]]
    * CORPUS-ADAPTIVE geometry — memoized per (session, dir): the candidate
    * substrate every downstream LSH consumer rides (sim_lsh_ann_scaled,
    * sim_mutual_knn, ml_knn_classify, sim_lsh_recall, sim_recall_curve,
    * dedup_semantic_clusters_scaled, sim_lsh_occupancy). The
    * [[graft.Caches.memo]] convention — deterministic build (literal
    * planes, round-9 + id tiebreaks, integer-exact geometry choice) ⇒
    * reuse is value-identical and each query stays self-contained for
    * Verify; the n×5 ranked list is tiny and safe to pin eagerly.
    *
    * History: rounds ≤ 11 memoized the fixed 4×4 default here (quadratic
    * densification — 18 s at sf1, unrunnable at sf10), round 12 a fixed
    * 4×7 block (flat through sf1, densifying at sf10, with the next block
    * a hand-tuned knob). Round 13 replaces the hand ladder with the
    * in-plan [[autoBits]] rule, so ONE memo serves every scale and the
    * sf10 decade cell is a measurement instead of a promise (SURVEY §6).
    */
  private def lshTop5Auto(s: SparkSession, dir: String): DataFrame =
    graft.Caches.memo(s, s"lsh:top5a:$dir")(lshTopKAuto(emb(s, dir), 5))

  /** The memo key [[lshTop5Auto]] installs for `dir` — exposed so tests
    * can observe (via [[graft.Caches.memoKeys]]) which queries actually
    * force the shared list build.
    */
  def lshMemoKey(dir: String): String = s"lsh:top5a:$dir"

  /** The declared queries that force the [[lshTop5Auto]] memo — the single
    * source of truth Bench reads to decide whether a restricted board owes
    * the `lsh_build` line item (r15 verdict: Bench hand-duplicated this
    * set, so a future consumer added without updating it would silently
    * reattribute the multi-second memo build onto that query's row).
    * Round16Spec pins membership against ACTUAL memo access per query, so
    * the set cannot drift from the call graph unnoticed.
    */
  val lshMemoConsumers: Set[String] = Set("sim_lsh_ann_scaled",
    "sim_mutual_knn", "ml_knn_classify", "sim_lsh_recall",
    "sim_recall_curve", "dedup_semantic_clusters_scaled")

  /** Force the shared [[lshTop5Auto]] memo for `dir` and return its row
    * count. Bench calls this BEFORE the query loop and reports the elapsed
    * seconds as its own `lsh_build` line item — otherwise the multi-second
    * adaptive list build lands invisibly on whichever consumer happens to
    * run first alphabetically, and single-pass boards read that one row
    * ~3× heavy (r13 verdict: dedup_semantic_clusters_scaled 14.7 s
    * single-pass vs 3.86 s warm at sf1, the difference being this build).
    */
  def prewarmProductionLists(s: SparkSession, dir: String): Long =
    lshTop5Auto(s, dir).count()

  /** The ground-truth query-sample modulus: m = max(8, 2^⌈log₂(n/256)⌉)
    * computed IN-PLAN from the corpus count, so the residue-class sample
    * `vec_id % m = 3` holds ~256–512 query vectors at ANY corpus size —
    * the knob that turns the exact ground-truth build from corpus-
    * quadratic into (bounded queries) × (linear candidates). Closed-form
    * power-of-two arithmetic on an exact integer count ⇒ both engines
    * derive the identical m: the exponent is the BIT LENGTH of
    * ⌈nc/256⌉ − 1 (integer division + `length(bin(·))`, exact on both
    * engines) — NOT ceil(log2(·)), whose Spark log(x)/log(2)
    * implementation diverges from DuckDB's exact log2 at some exact
    * powers of two (e.g. 2²⁹) and would derive different moduli there.
    * pow(2, k) on an exact integer k is an exact power-of-two double on
    * both engines. Algebraically identical to the old closed form
    * (smallest pow2 ≥ ⌈x⌉ = smallest pow2 ≥ x for x ≥ 1), so every
    * existing panel hash is unchanged. The inner greatest(0, ·) clamp is
    * the empty-corpus guard: nc = 0 would feed −1 whose 64-char bin
    * saturates pow(2, 64) — Spark's long cast saturates silently but
    * DuckDB's raises out-of-range; clamped, both engines degrade to m = 8
    * (nc ≥ 1 already yields ≥ 0, so populated-corpus hashes are unchanged).
    */
  private def sampleModulus(e: DataFrame): DataFrame =
    e.agg(count(lit(1)).as("nc"))
      .select(greatest(lit(8L),
        pow(lit(2.0),
          length(bin(greatest(lit(0L), expr("(nc + 255) DIV 256") - 1)))
            .cast("double"))
          .cast("long")).as("m"))

  /** Fragment mirroring [[sampleModulus]] in the oracle: one scalar CTE
    * `mm(m)` off the already-defined `e`.
    */
  private val mmSql: String =
    """mm AS (SELECT greatest(8, CAST(power(2,
      |   length(bin(greatest(0, (count(*) + 255) // 256 - 1)))) AS BIGINT)) AS m
      | FROM e)""".stripMargin

  /** Exact cosine top-5 lists for the DETERMINISTIC QUERY SAMPLE
    * (vec_id ≡ 3 mod [[sampleModulus]] — the sim_pair_hist residue-class
    * convention), memoized per (session, dir) — the ground-truth substrate
    * sim_knn_outlier, sim_hubness and sim_lsh_recall derive. The round-10
    * form ranked EVERY vector's neighbors (a full all-pairs self-join —
    * 72 s at sf1, 203× per decade, the board's worst scaler); eval metrics
    * (recall@5, k-occurrence, isolation ranks) are statistically valid on
    * a fixed-size query panel, and the dynamic modulus keeps the panel
    * ~256–512 queries at any corpus, so the build is linear-in-corpus with
    * a bounded constant. Candidates remain the FULL corpus — each sampled
    * query's top-5 list is its true exact list, not a sample-vs-sample
    * approximation. Carries (q_id, n_id, cos, rank), rank ≤ 5 by
    * (round(cos, 9) desc, n_id); the oracles replay the same residue
    * filter, so the frame stays hash-checkable.
    */
  private def exactTop5(s: SparkSession, dir: String): DataFrame =
    graft.Caches.memo(s, s"exact:top5:$dir") {
      val e = emb(s, dir).select(col("vec_id"), col("embedding"),
        l2norm(col("embedding")).as("nrm"))
      val a = e.crossJoin(broadcast(sampleModulus(e)))
        .filter(col("vec_id") % col("m") === 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"))
      val b = e.toDF("n_id", "n_emb", "n_nrm")
      // rank tail: the bounded-state TopK aggregate (r15) — the window
      // form sorted the panel × corpus pair stream per task (the exact
      // path's copy of the rank-sort spill shape at the 2 M decade);
      // identical (round(cos,9) desc, n_id) order, raw cos preserved
      a.join(b, col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("n_id"),
          (dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm"))).as("cos"))
        .groupBy(col("q_id"))
        .agg(graft.functions.TopK.neighbors(5)(col("n_id"), col("cos")).as("nb"))
        .select(col("q_id"), explode(col("nb")).as("x"))
        .select(col("q_id"), col("x._1").as("n_id"),
          col("x._2").as("cos"), col("x._3").as("rank"))
    }

  /** Σ aᵢ·bᵢ in double (codegen kernel; session must be registered). */
  def dot(a: Column, b: Column): Column = VectorKernels.fdot(a, b)

  /** L2 norm in double (codegen kernel; session must be registered). */
  def l2norm(a: Column): Column = VectorKernels.fnorm(a)

  /** Brute-force exact cosine top-5 neighbors for the query subset
    * (vec_id < 10). Query side is tiny → broadcast; candidate side streams.
    * Ranking uses round(cos, 9) + id tiebreak so cross-engine last-ulp noise
    * can't reorder neighbors.
    */
  private val simBruteTopk = Q(
    "sim_brute_topk",
    (s, dir) => {
      VectorKernels.register(s)
      // Query side: straight off the scan so `vec_id < 10` pushes into
      // parquet (10-row read); candidate side: spread for parallel dots.
      val raw = Tables.load(s, dir, "embeddings")
      val q = broadcast(raw.filter(col("vec_id") < 10)
        .select(col("vec_id"), col("embedding"), l2norm(col("embedding")).as("nrm"))
        .toDF("q_id", "q_emb", "q_nrm"))
      val n = emb(s, dir).select(col("vec_id"), col("embedding"),
        l2norm(col("embedding")).as("nrm"))
        .toDF("n_id", "n_emb", "n_nrm")
      // bounded-state TopK rank (r15): value-identical to the
      // row_number window the oracle replays, no per-task sort of the
      // 10 × corpus candidate stream
      q.join(n, col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("n_id"),
          (dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm"))).as("cos"))
        .groupBy(col("q_id"))
        .agg(graft.functions.TopK.neighbors(5)(col("n_id"), col("cos")).as("nb"))
        .select(col("q_id"), explode(col("nb")).as("x"))
        .select(col("q_id"), col("x._1").as("n_id"),
          round(col("x._2"), 6).as("cosine"), col("x._3").as("rank"))
        .orderBy("q_id", "rank")
    },
    Some("""WITH e AS (SELECT vec_id, embedding,
           |   sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
           | FROM embeddings),
           |p AS (SELECT q.vec_id AS q_id, n.vec_id AS n_id,
           |   list_sum(list_transform(range(1, 65),
           |     i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)))
           |     / (q.nrm * n.nrm) AS cos
           | FROM e q JOIN e n ON q.vec_id < 10 AND n.vec_id != q.vec_id),
           |r AS (SELECT q_id, n_id, cos,
           |   CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |     ORDER BY round(cos, 9) DESC, n_id) AS INT) AS rank FROM p)
           |SELECT q_id, n_id, round(cos, 6) AS cosine, rank
           |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin))

  /** Random-hyperplane LSH ANN: 16 Rademacher (±1) hyperplanes → 4 bands ×
    * 4 sign bits; vectors sharing any band bucket become candidate pairs,
    * re-ranked by exact cosine, top-5 kept per query vector.
    *
    * Scale: candidates per band ≈ Σ bucketᵢ² — linear-ish shuffle instead of
    * the vectors² cross product; bands/bits tune recall vs cost. Planes are
    * seeded-RNG literals, so the plan is deterministic run-to-run. No SQL
    * oracle (bucket recall is hash-dependent); SimilaritySpec measures
    * recall against sim_brute_topk ground truth.
    */
  private val NumPlanes = 16
  private val Bands = 4
  private val BitsPerBand = NumPlanes / Bands

  /** Ceiling of the adaptive bit budget ([[autoBits]]):
    * [[AutoBands]] × [[MaxAutoBits]] seed-42 planes (200 at the current
    * 10-band OR-construction) are baked into the plan
    * (and the oracle) as literals, enough for per-band-bucket occupancy
    * ≤ ~256 through ~134 M vectors (bits = 20 engages at
    * n ≥ 256·2¹⁹ ≈ 134 M). Raised from 12 in r14 after the 2 M-vector
    * probe measured the capped geometry densifying (occupancy ~488 at
    * 4×12), and 16 → 20 in r18 after the 20 M organic rung measured the
    * cap binding (abits pinned at 16 ⇒ occupancy 305 and growing
    * linearly with every further decade — the exact invariant the
    * chooser exists to hold). The kernels compute a plane's dot product
    * only when the CHOSEN budget uses it, so sub-cap corpora pay nothing
    * for the headroom and keep choosing — and computing — the identical
    * geometry ([[planesFor]] extends the seed-42 sequence compatibly, a
    * larger cap only APPENDS plane literals; every sub-cap declared-row
    * hash is unchanged, re-gated dual-scale). Beyond 20 a deployment
    * raises this constant again; each +1 bit costs [[AutoBands]] plane
    * literals in the replayed oracle text, nothing at sub-cap runtime.
    */
  private val MaxAutoBits = 20

  /** Bands of the CORPUS-ADAPTIVE geometry — the OR-construction width:
    * a true neighbor is admitted if it collides in ANY band, so the miss
    * probability is (1 − q)^bands for per-band hit probability q. Raised
    * 4 → 10 in r15 as the recall lever the r14 verdict priced: the
    * 4-band recall@5 was 0.406 / 0.451 / 0.493 at sf0.001/0.01/0.1
    * (per-band q ≈ 0.12–0.16); measured post-raise the 10-band geometry
    * reads 0.711 / 0.740 / 0.810 at the same scales (8 bands measured
    * 0.660 / 0.686 / 0.732 — short of the ≥0.7 bar at two scales, hence
    * 10). Candidate volume — bands × n × occupancy, the
    * `sim_lsh_occupancy` readout — scales by exactly 2.5×, a priced,
    * linear trade. The bit budget per band ([[autoBits]]) is unchanged:
    * recall comes from MORE independent bands, not coarser buckets, so
    * per-band occupancy (and with it worst-case bucket skew) stays pinned
    * at ~256. Decoupled from the fixed 4×4 historical anchor ([[Bands]] —
    * the oracle-pinned round-1 geometry `sim_lsh_ann` keeps alive).
    */
  private val AutoBands = 10

  /** The CORPUS-ADAPTIVE LSH bit budget, computed IN-PLAN from the corpus
    * count — the geometry chooser measured by LshScaleProbe (SURVEY §6)
    * promoted from a hand-tuned per-decade knob into plan arithmetic:
    *
    *   abits = clamp(4, bitlength(⌈n/256⌉ − 1), [[MaxAutoBits]])
    *
    * i.e. the smallest power-of-two bucket count per band that holds
    * per-bucket occupancy n/2^abits ≤ ~256, the regime the probe measured
    * as the recall-vs-cost knee. With occupancy pinned, candidate pairs
    * Σ bucket² ≈ bands · n · 256 grow LINEARLY in the corpus where any
    * fixed geometry densifies quadratically. The rule reproduces exactly
    * the hand ladder rounds 9–12 measured: 2 k vectors → 4 bits (the
    * historical 4×4 default), 20 k → 7 (the r12 production 4×7),
    * 200 k → 10 (the "next plane block" every r12 sf10 cell promised).
    *
    * Same integer-exact cross-engine arithmetic as [[sampleModulus]]:
    * bit length via `length(bin(·))` on an exact count (never
    * ceil(log2(·)), whose float forms diverge between engines at exact
    * powers of two), `greatest(0, ·)` clamping the empty corpus to the
    * floor geometry on BOTH engines.
    */
  private[graft] def autoBits(e: DataFrame): DataFrame =
    e.agg(count(lit(1)).as("nc"))
      .select(greatest(lit(4L), least(lit(MaxAutoBits.toLong),
        length(bin(greatest(lit(0L), expr("(nc + 255) DIV 256") - 1)))
          .cast("long"))).as("abits"))

  /** [[autoBits]] replayed in the oracle: one scalar CTE `g(abits)` off
    * the already-defined `e`.
    */
  private val abitsSql: String =
    s"""g AS (SELECT greatest(4, least($MaxAutoBits,
       |   length(bin(greatest(0, (count(*) + 255) // 256 - 1))))) AS abits
       | FROM e)""".stripMargin

  /** The VALUES rows interpolating the first `n` seed-42 ±1 planes into
    * SQL (they are fixed constants of the operator).
    */
  private def planeValuesSql(n: Int): String =
    planesFor(n).zipWithIndex.map { case (p, i) =>
      s"($i, [${p.map(c => if (c > 0) "1.0" else "-1.0").mkString(",")}]::DOUBLE[])"
    }.mkString(",\n")

  /** The LSH pipeline replayed in DuckDB for ANY (bands, bitsPerBand)
    * geometry: the seed-42 ±1 hyperplanes are interpolated into the SQL as
    * literals (`planesFor` draws the seed-42 sequence, so the first
    * `bands × bitsPerBand` planes of a larger geometry are identical to a
    * smaller one's and the literals stay pure constants of the operator),
    * sign bits pack into band buckets exactly as [[lshTopK]] does, and
    * candidates from bucket collisions get the same exact cosine re-rank.
    * The plane dots match bit-for-bit because [[graft.functions
    * .FloatVecDot]] multiplies float→double and accumulates sequentially —
    * the same order `list_sum(list_transform(...))` evaluates in. `panel = true` restricts the QUERY
    * side of the candidate join to the [[sampleModulus]] residue-class
    * panel (the sim_pair_hist convention), mirroring [[lshTopKPanel]].
    */
  private def lshOracleCtesFor(bands: Int, bitsPerBand: Int,
                               panel: Boolean = false): String = {
    val mmCte = if (panel) s"$mmSql,\n" else ""
    val panelPred =
      if (panel) "\n       AND a.vec_id % (SELECT m FROM mm) = 3" else ""
    s"""WITH e AS (SELECT vec_id, embedding,
       |   sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
       | FROM embeddings),
       |${mmCte}pl(plane, coef) AS (VALUES ${planeValuesSql(bands * bitsPerBand)}),
       |bits AS (SELECT e.vec_id, pl.plane,
       |    CASE WHEN list_sum(list_transform(range(1,65),
       |           i -> CAST(e.embedding[i] AS DOUBLE) * coef[i])) >= 0
       |         THEN CAST(power(2, plane % $bitsPerBand) AS BIGINT) ELSE 0 END AS bit
       |  FROM e CROSS JOIN pl),
       |bk AS (SELECT vec_id, CAST(plane // $bitsPerBand AS INT) AS band, sum(bit) AS bucket
       |       FROM bits GROUP BY vec_id, plane // $bitsPerBand),
       |cand AS (SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS n_id
       |  FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
       |                     AND a.vec_id != b.vec_id$panelPred),
       |sc AS (SELECT cand.q_id, cand.n_id,
       |    list_sum(list_transform(range(1, 65),
       |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)))
       |      / (q.nrm * n.nrm) AS cos
       |  FROM cand JOIN e q ON q.vec_id = cand.q_id
       |            JOIN e n ON n.vec_id = cand.n_id),
       |r AS (SELECT q_id, n_id, cos, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY q_id ORDER BY round(cos, 9) DESC, n_id) AS INT) AS rank
       |  FROM sc)
       |""".stripMargin
  }

  /** The CORPUS-ADAPTIVE replay ([[lshTopKAuto]]): all
    * [[AutoBands]] × [[MaxAutoBits]] seed-42 planes as literals, the
    * `g(abits)` chooser CTE, and the band/bit packing driven by the
    * CHOSEN budget — planes ≥ AutoBands·abits are
    * filtered out, `plane // abits` assigns bands, `2^(plane % abits)`
    * weights bits. Every arithmetic step is integer-exact on both engines,
    * so the geometry the oracle replays is provably the one the plan chose.
    */
  private def lshOracleCtesAuto: String =
    s"""WITH e AS (SELECT vec_id, embedding,
       |   sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
       | FROM embeddings),
       |$abitsSql,
       |pl(plane, coef) AS (VALUES ${planeValuesSql(AutoBands * MaxAutoBits)}),
       |bits AS (SELECT e.vec_id, pl.plane,
       |    CASE WHEN list_sum(list_transform(range(1,65),
       |           i -> CAST(e.embedding[i] AS DOUBLE) * coef[i])) >= 0
       |         THEN CAST(power(2, plane % (SELECT abits FROM g)) AS BIGINT)
       |         ELSE 0 END AS bit
       |  FROM e CROSS JOIN pl WHERE pl.plane < $AutoBands * (SELECT abits FROM g)),
       |bk AS (SELECT vec_id,
       |       CAST(plane // (SELECT abits FROM g) AS INT) AS band,
       |       CAST(sum(bit) AS BIGINT) AS bucket
       |       FROM bits GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS n_id
       |  FROM bk a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
       |                     AND a.vec_id != b.vec_id),
       |sc AS (SELECT cand.q_id, cand.n_id,
       |    list_sum(list_transform(range(1, 65),
       |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)))
       |      / (q.nrm * n.nrm) AS cos
       |  FROM cand JOIN e q ON q.vec_id = cand.q_id
       |            JOIN e n ON n.vec_id = cand.n_id),
       |r AS (SELECT q_id, n_id, cos, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY q_id ORDER BY round(cos, 9) DESC, n_id) AS INT) AS rank
       |  FROM sc)
       |""".stripMargin

  private def lshOracle: String = lshOracleCtesFor(Bands, BitsPerBand, panel = true) +
    """SELECT q_id, n_id, round(cos, 6) AS cosine, rank
      |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  /** The mutual cut of the same replay: a pair survives iff each endpoint
    * ranks inside the other's top-5. Replays the PRODUCTION adaptive
    * geometry ([[lshOracleCtesAuto]] — the r13 chooser migration).
    */
  private def mutualKnnOracle: String = lshOracleCtesAuto +
    """SELECT a.q_id AS vec_a, a.n_id AS vec_b, round(a.cos, 6) AS cosine,
      |  a.rank AS rank_ab, b.rank AS rank_ba
      |FROM r a JOIN r b ON a.q_id = b.n_id AND a.n_id = b.q_id
      |WHERE a.rank <= 5 AND b.rank <= 5 AND a.q_id < a.n_id
      |ORDER BY vec_a, vec_b""".stripMargin

  /** Deterministic ±1 hyperplanes (seed 42), 64-dim each; float so they feed
    * the array<float> kernel directly.
    */
  private lazy val planes: Array[Array[Float]] = planesFor(NumPlanes)

  /** Seed-42 ±1 hyperplanes, any count: `Random(42)` draws sequentially,
    * so the first 16 rows of a larger request are IDENTICAL to [[planes]]
    * — raising the bit budget extends the plane set without moving the
    * oracle-pinned defaults.
    */
  private def planesFor(n: Int): Array[Array[Float]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(n, 64)(if (rnd.nextBoolean()) 1.0f else -1.0f)
  }

  /** One plane as a SINGLE folded literal column — never a
    * `array(lit, …×64)` CreateArray, which codegen rebuilds (and boxes)
    * per ROW and whose 64-way expansion per plane pushes wide stages out
    * of whole-stage codegen entirely (measured: the interpreted fallback
    * cost ~0.3 ms/row on the 48-plane auto projection). A `typedlit`
    * arrives as one constant ArrayData the kernel reads in place.
    */
  private def planeLit(p: Array[Float]): Column = typedlit(p.toSeq)

  /** The HISTORICAL 4×4 default geometry, rescoped to the residue-class
    * query panel (the r13 verdict item): the full-corpus 4×4 list build
    * this row carried through r12 was quadratic-densifying — 61.4 s at
    * sf1, ~10¹⁰ candidate pairs at sf10 — because 16 buckets/band cannot
    * absorb corpus growth. The production path is [[lshTopKAuto]]
    * (`sim_lsh_ann_scaled`); this row keeps the round-1 geometry alive as
    * the oracle-pinned ANCHOR, priced the way a fixed geometry can be at
    * any corpus: ranked lists for the ~256–512 [[sampleModulus]] panel
    * queries only, against full-corpus band candidates — O(panel ×
    * occupancy), linear in the corpus with a bounded constant.
    *
    * Declared AFTER the constants and lshOracle it captures — a val
    * initializer reading a later val silently interpolates zeros.
    */
  private val simLshAnn = Q(
    "sim_lsh_ann",
    (s, dir) => lshTopKPanel(emb(s, dir), 5).orderBy("q_id", "rank"),
    Some(lshOracle))

  /** The PRODUCTION LSH geometry as a declared, oracle-checked query —
    * the [[autoBits]] corpus-adaptive block (r13; rounds 11–12 pinned the
    * hand-tuned 4×7 rung here). Per-band bucket count now tracks the
    * corpus in-plan — 2 k vectors → 4 bits, 20 k → 7, 200 k → 10, the
    * ladder LshScaleProbe measured — so per-bucket occupancy, and
    * therefore candidate-pair cost per vector, stays ~constant at every
    * decade where any fixed block eventually densifies quadratically.
    * All [[AutoBands]]·[[MaxAutoBits]] seed-42 planes interpolate into the oracle as literals (the
    * first 16 ARE the default's — `planesFor` draws sequentially) with
    * the chooser arithmetic replayed, so the scaled geometry is
    * hash-checked end-to-end at every scale factor, not just probed.
    * Sparser buckets admit fewer candidates, so lists may run short of 5 —
    * that is the recall-vs-cost trade the sim_lsh_recall row prices.
    */
  private val simLshAnnScaled = Q(
    "sim_lsh_ann_scaled",
    // rides the same memoized adaptive lists as every LSH consumer: one
    // list build per session instead of one per consumer (~4.7 s saved
    // per extra toucher at sf1)
    (s, dir) => lshTop5Auto(s, dir).orderBy("q_id", "rank"),
    Some(lshOracleCtesAuto +
      """SELECT q_id, n_id, round(cos, 6) AS cosine, rank
        |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin))

  /** Geometry OBSERVABILITY for the production adaptive lists — the
    * chooser's decision and its load consequences as a declared,
    * oracle-checked row (the SURVEY §6 probe promoted into the query
    * surface, so any corpus can ask "what geometry am I getting and what
    * does it cost?" without a dev utility): per band, the chosen bit
    * budget, buckets actually occupied, worst-bucket occupancy, and
    * Σ occupancy² — the exact candidate-pair budget the band contributes
    * before the top-k cut. All integers; the only non-count is the
    * occupancy skew each band's bucket histogram carries.
    */
  private val simLshOccupancy = Q(
    "sim_lsh_occupancy",
    (s, dir) => {
      val e = emb(s, dir)
      val occ = lshBucketsAutoLight(e)
        .groupBy("band", "bucket")
        .agg(count(lit(1)).as("occ"))
      occ.groupBy("band")
        .agg(sum(col("occ")).as("n_vectors"),
          count(lit(1)).as("n_buckets_used"),
          max(col("occ")).as("max_occupancy"),
          sum(col("occ") * col("occ")).as("sum_sq_occupancy"))
        .crossJoin(broadcast(autoBits(e)))
        .select(col("band").cast("int").as("band"), col("abits"),
          col("n_vectors"), col("n_buckets_used"), col("max_occupancy"),
          col("sum_sq_occupancy"))
        .orderBy("band")
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
       |$abitsSql,
       |pl(plane, coef) AS (VALUES ${planeValuesSql(AutoBands * MaxAutoBits)}),
       |bits AS (SELECT e.vec_id, pl.plane,
       |    CASE WHEN list_sum(list_transform(range(1,65),
       |           i -> CAST(e.embedding[i] AS DOUBLE) * coef[i])) >= 0
       |         THEN CAST(power(2, plane % (SELECT abits FROM g)) AS BIGINT)
       |         ELSE 0 END AS bit
       |  FROM e CROSS JOIN pl WHERE pl.plane < $AutoBands * (SELECT abits FROM g)),
       |bk AS (SELECT vec_id,
       |       CAST(plane // (SELECT abits FROM g) AS INT) AS band,
       |       CAST(sum(bit) AS BIGINT) AS bucket
       |       FROM bits GROUP BY 1, 2),
       |occ AS (SELECT band, bucket, count(*) AS occ FROM bk GROUP BY 1, 2)
       |SELECT band, (SELECT abits FROM g) AS abits,
       |  CAST(sum(occ) AS BIGINT) AS n_vectors,
       |  count(*) AS n_buckets_used,
       |  CAST(max(occ) AS BIGINT) AS max_occupancy,
       |  CAST(sum(occ * occ) AS BIGINT) AS sum_sq_occupancy
       |FROM occ GROUP BY band ORDER BY band""".stripMargin))

  /** Mutual-kNN graph over the LSH top-5 lists — the symmetrized edge set
    * semantic clustering consumes (an edge survives only if each endpoint
    * ranks in the other's top-k, which prunes hub-dominated one-way
    * neighbors). The ranked lists are built once ([[lshTop5Auto]] — the
    * corpus-adaptive production geometry since r13; the fixed 4×4 lists
    * were 15.8 s at sf1 and unrunnable at sf10, the fixed 4×7 block
    * densified at sf10) and the mutual cut is a self-join on the k·n
    * edge list, linear in candidates.
    */
  private val simMutualKnn = Q(
    "sim_mutual_knn",
    (s, dir) => {
      val knn = lshTop5Auto(s, dir)
      val rev = knn.select(col("n_id").as("rva"), col("q_id").as("rvb"),
        col("rank").as("rank_ba"))
      knn.join(rev, col("q_id") === col("rva") && col("n_id") === col("rvb"))
        .filter(col("q_id") < col("n_id"))
        .select(col("q_id").as("vec_a"), col("n_id").as("vec_b"),
          col("cosine"), col("rank").as("rank_ab"), col("rank_ba"))
        .orderBy("vec_a", "vec_b")
    },
    Some(mutualKnnOracle))

  /** kNN label transfer (weak supervision): predict every vector's class as
    * the MAJORITY vote of its LSH top-5 neighbors' labels, smallest label
    * breaking ties — the standard "propagate labels from a seed set through
    * the embedding space" step of a curation pipeline (quality/domain labels
    * exist for a slice of the corpus; ANN transfers them to the rest), here
    * scored in resubstitution form so the output is the 2-D confusion
    * matrix of true vs kNN-predicted label.
    *
    * Scale shape: candidates come from [[lshTop5Auto]]'s band buckets
    * (never all-pairs; the corpus-adaptive production geometry since r13 —
    * the fixed 4×4 lists cost 18.0 s at sf1 and densify quadratically);
    * the vote is one equi-join of the k·n neighbor list against
    * the label column plus two two-phase aggregates; the arg-max is
    * `min(struct(-cnt, label))` — no window over the vote frame (the only
    * window is lshTopK's per-query rank, already bounded per bucket).
    * Vectors whose buckets collide with nothing have no neighbor list and
    * are absent from the matrix — the abstain set; at production k/bands
    * the abstain rate is the recall knob, and the oracle replays the same
    * semantics. All-integer arithmetic after the (already deterministic)
    * cosine ranking.
    */
  private val mlKnnClassify = Q(
    "ml_knn_classify",
    (s, dir) => {
      val e = emb(s, dir)
      val labels = e.select(col("vec_id"), col("label"))
      val votes = lshTop5Auto(s, dir)
        .join(labels.select(col("vec_id").as("n_id"), col("label").as("nlab")), "n_id")
        .groupBy(col("q_id"), col("nlab"))
        .agg(count(lit(1)).as("cnt"))
      val pred = votes.groupBy("q_id")
        .agg(min(struct((-col("cnt")).as("nc"), col("nlab").as("l"))).as("t"))
        .select(col("q_id"), col("t").getField("l").as("pred_label"))
      pred.join(labels.select(col("vec_id").as("q_id"), col("label").as("true_label")), "q_id")
        .groupBy("true_label", "pred_label")
        .agg(count(lit(1)).as("n"))
        .orderBy("true_label", "pred_label")
    },
    Some(lshOracleCtesAuto +
      """,v AS (SELECT r.q_id, l.label AS nlab, count(*) AS cnt
        |  FROM r JOIN embeddings l ON r.n_id = l.vec_id
        |  WHERE r.rank <= 5 GROUP BY r.q_id, l.label),
        |p AS (SELECT q_id, nlab AS pred_label FROM (
        |    SELECT q_id, nlab, row_number() OVER (PARTITION BY q_id
        |      ORDER BY cnt DESC, nlab) AS rn FROM v) WHERE rn = 1)
        |SELECT t.label AS true_label, p.pred_label, count(*) AS n
        |FROM p JOIN embeddings t ON p.q_id = t.vec_id
        |GROUP BY t.label, p.pred_label
        |ORDER BY true_label, pred_label""".stripMargin))

  /** LSH top-k with the oracle-pinned default geometry (4 bands × 4 bits).
    *
    * SCALE KNOB (measured, SURVEY §6): bucket count per band is 2^bits and
    * does NOT grow with the corpus, so at fixed bits the candidate stage is
    * Θ(Σ bucket²) — per-bucket occupancy rises linearly with n and
    * candidate pairs quadratically (the 10× amplified corpus measured
    * 10.7× wall on this query while the honest-linear operators sat at
    * ~2×). The production setting raises `bitsPerBand` by log₂ of the
    * corpus growth (10× data ≈ +3–4 bits) to hold occupancy — and
    * therefore per-row cost — constant; recall is then re-bought with more
    * bands if the threshold regime needs it. The declared query keeps the
    * 4×4 default because the planes are interpolated into the DuckDB
    * oracle as literals.
    */
  def lshTopK(e: DataFrame, k: Int = 5, bands: Int = Bands,
              bitsPerBand: Int = BitsPerBand): DataFrame =
    rankBanded(lshBanded(e, bands, bitsPerBand),
      lshBanded(e, bands, bitsPerBand), k)

  /** The banded (vec_id, embedding, nrm, band, bucket) frame of a FIXED
    * (bands × bitsPerBand) geometry. All sign-dot + bucket-packing
    * arithmetic runs INSIDE the persisted projection (same codegen
    * discipline as [[lshBandedAuto]], r13: bucket expressions left
    * downstream of the cache land in the candidate-join stage and at wide
    * geometries push it out of whole-stage codegen — the per-pair cosine
    * then runs interpreted, 40+ min instead of ~2 min for the 4×10 block
    * at the 100× corpus). The persist is consumed by both join sides, so
    * the norm/bucket pass runs once; Spark's cache manager dedups the two
    * identical-plan calls onto one cached build.
    *
    * Embeddings ride through the band self-join: the pre-join shuffle is
    * bands × corpus wide-rows (linear in the corpus, the standard LSH
    * replication cost), and every row AFTER the join is just
    * (q_id, n_id, cos) — 24 bytes. The alternative (id-only candidates,
    * then join the wide vectors back per candidate) shuffles
    * O(candidates × vector width), ~20× more here.
    */
  private def lshBanded(e: DataFrame, bands: Int, bitsPerBand: Int): DataFrame = {
    VectorKernels.register(e.sparkSession)
    val pl = if (bands * bitsPerBand <= NumPlanes) planes
             else planesFor(bands * bitsPerBand)
    def bucketFor(b: Int): Column = (0 until bitsPerBand).map { j =>
      when(dot(col("embedding"), planeLit(pl(b * bitsPerBand + j))) >= 0,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val withBuckets = graft.Caches.track(e.select(col("vec_id"), col("embedding"),
      l2norm(col("embedding")).as("nrm"),
      array((0 until bands).map(bucketFor): _*).as("bks")))
    withBuckets
      .withColumn("bb", explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          element_at(col("bks"), b + 1).as("bucket"))): _*)))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** The bucket-join + exact-rerank tail every lshTopK* variant shares:
    * query-side banded rows × neighbor-side banded rows on (band, bucket),
    * exact cosine, per-query rank ≤ k with cross-band dedup.
    *
    * Rank SHAPE (r15 — the bounded-state form): the per-query top-k is a
    * [[graft.functions.TopK.neighbors]] Aggregator — a k-sized insertion
    * buffer ordered by (round(cos,9) desc, n_id) that drops band
    * duplicates on insert (a pair colliding in several bands carries an
    * IDENTICAL cosine — same two vectors, same kernel — so its (r9, n_id)
    * key is identical and the insert is the old distinct()). Value-
    * identical to the r13 dense_rank window AND to the oracle's
    * row_number-over-distinct-candidates replay (Round15Spec proves both);
    * what changes is the PLAN. The window form's map-side WindowGroupLimit
    * prune still SORTS the whole per-task candidate stream before pruning:
    * at the 2 M-vector probe the ~2·10⁹ scored pairs spilled >90 GB of
    * sort runs and the build died on scratch space. The aggregate form
    * never materializes the stream — candidates flow through
    * compare-and-insert into O(live queries × k) task state
    * (ObjectHashAggregate; [[graft.Sessions.scaleDefaults]] raises the
    * 128-key sort-based fallback so the map stays hash-based at corpus
    * key counts), the partial/final exchange carries ONE ≤ k-entry buffer
    * per (task, query), and NO sort exists anywhere in the rank path
    * (Round15Spec pins the plan). The old distinct() exchange on the
    * ≤ k·n output disappears too — dedup happens inside the buffer.
    */
  private def rankBanded(q: DataFrame, n: DataFrame, k: Int): DataFrame = {
    val scored = q.select("vec_id", "embedding", "nrm", "band", "bucket")
      .toDF("q_id", "q_emb", "q_nrm", "band", "bucket")
      .join(n.select("vec_id", "embedding", "nrm", "band", "bucket")
        .toDF("n_id", "n_emb", "n_nrm", "band_b", "bucket_b"),
        col("band") === col("band_b") &&
          col("bucket") === col("bucket_b") && col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm"))).as("cos"))
    scored
      .groupBy(col("q_id"))
      .agg(graft.functions.TopK.neighbors(k)(col("n_id"), col("cos")).as("nb"))
      .select(col("q_id"), explode(col("nb")).as("x"))
      .select(col("q_id"), col("x._1").as("n_id"),
        round(col("x._2"), 6).as("cosine"), col("x._3").as("rank"))
  }

  /** [[lshTopK]] at the default 4×4 geometry with the QUERY side
    * restricted to the [[sampleModulus]] residue-class panel — how a fixed
    * (non-adaptive) geometry stays priceable at any corpus: the neighbor
    * side is still every band bucket (candidates per query = band
    * occupancy, linear in n), but only ~256–512 panel queries pay it, so
    * the total is O(panel × n / 2^bits) instead of O(n² / 2^bits).
    */
  def lshTopKPanel(e: DataFrame, k: Int = 5): DataFrame = {
    val banded = lshBanded(e, Bands, BitsPerBand)
    val panel = banded.crossJoin(broadcast(sampleModulus(e)))
      .filter(col("vec_id") % col("m") === 3)
      .drop("m")
    rankBanded(panel, banded, k)
  }

  /** The banded (vec_id, embedding, nrm, band, bucket) frame of the
    * CORPUS-ADAPTIVE geometry — the substrate [[lshTopKAuto]] self-joins
    * and sim_lsh_occupancy inspects. The bit budget is [[autoBits]]'
    * in-plan scalar, so the NUMBER of sign bits consulted per band is
    * data-dependent while the plan stays static: ALL AutoBands·abits
    * plane dots and the band bucket packing run inside ONE
    * [[graft.functions.LshAutoBuckets]] kernel — a single compact loop
    * nest over the seed-42 sign table, AutoBands·abits × 64 multiply-adds
    * per vector, linear and negligible next to the candidate join.
    *
    * Encode SHAPE history: r13 built the encode from per-plane
    * [[graft.functions.FloatVecDot]] columns gated by `when(j < …)` into
    * a sign array + conditional packing — at the r15 8×16 width that is
    * 128 inlined 64-float loops in one generated projection method, which
    * silently crosses the JVM huge-method JIT limit and runs
    * bytecode-interpreted (the 2 M encode measured >40 min vs seconds —
    * the same failure class as r13's interpreted-expression lesson one
    * level down the stack). The kernel is immune at any width: its
    * bytecode size is constant, loop bounds are runtime values.
    *
    * Codegen discipline (measured, r13): the bucket arithmetic happens
    * INSIDE the persisted projection, so the frame every consumer reads —
    * and crucially the candidate self-join's stage — sees only plain
    * attribute columns (bucket expressions left in the join stage pushed
    * it out of whole-stage codegen — the per-pair cosine ran interpreted,
    * 126 s vs 6 s at sf1).
    */
  /** Explode a `bks` array column into (band, bucket) rows, keeping `keep`.
    */
  private def explodeBands(df: DataFrame, keep: Seq[String]): DataFrame =
    df.withColumn("bb", explode(array((0 until AutoBands).map(b =>
        struct(lit(b).as("band"),
          element_at(col("bks"), b + 1).as("bucket"))): _*)))
      .select((keep.map(col) :+ col("bb.band").as("band")
        :+ col("bb.bucket").as("bucket")): _*)

  /** The band-bit budget as a 1-row broadcastable frame: [[autoBits]]'
    * in-plan chooser by default, or a RETRIEVAL-PINNED constant when the
    * deployment overrides it (r18 verdict item 2). The chooser's clamp
    * serves the SELF-JOIN occupancy invariant — halving candidate pairs is
    * worth recall there — but a panel-query retrieval deployment pays
    * per-query probe cost, not pair cost, and at 20 M the r18 cap raise
    * (abits 16 → 17) cost full-width radius-2 recall 0.635 → 0.482 with no
    * way back. `fixedBits` is that way back: the SURVEY §6 remedy ("a
    * retrieval deployment pins its own geometry") as an actual knob.
    * Clamped to [4, MaxAutoBits] — the planes only exist to the cap.
    */
  private def bitsFrame(e: DataFrame, fixedBits: Option[Int]): DataFrame =
    fixedBits match {
      case Some(b) =>
        require(b >= 4 && b <= MaxAutoBits,
          s"[lsh] fixedBits=$b outside [4, $MaxAutoBits] — no planes exist there")
        e.sparkSession.range(1).select(lit(b.toLong).as("abits"))
      case None => autoBits(e)
    }

  private[graft] def lshBandedAuto(e: DataFrame,
                                   fixedBits: Option[Int] = None): DataFrame = {
    VectorKernels.register(e.sparkSession)
    // ONE projection computes dots → sign array → packed buckets, and the
    // PERSISTED frame carries only (vec_id, embedding, nrm, bks) — the
    // intermediate AutoBands·MaxAutoBits-long sign array must NOT reach the cache: the SQL
    // cache's columnar encode of a 48-element array column measured ~6 s (r13 geometry)
    // at 20 k rows (3× the whole fixed-geometry build) while the same
    // frame without it caches in <1 s. The un-cached single-stage
    // projection itself is cheap (0.8 s at 20 k rows — whole-stage
    // codegen'd, no alias blow-up).
    val withBuckets = graft.Caches.track(
      e.select(col("vec_id"), col("embedding"), l2norm(col("embedding")).as("nrm"))
        .crossJoin(broadcast(bitsFrame(e, fixedBits)))
        .select(col("vec_id"), col("embedding"), col("nrm"),
          VectorKernels.abuckets(col("embedding"), col("abits"),
            AutoBands, MaxAutoBits).as("bks")))
    explodeBands(withBuckets, Seq("vec_id", "embedding", "nrm"))
  }

  /** (vec_id, band, bucket) of the adaptive geometry WITHOUT the vector
    * payload or any persist — the load-accounting path (sim_lsh_occupancy):
    * a single consumer reading one linear pass has nothing to cache, and
    * the full [[lshBandedAuto]] build pays the embedding-column cache
    * encode (~36 s at the 100× corpus) that an occupancy readout never
    * needs.
    */
  private[graft] def lshBucketsAutoLight(e: DataFrame): DataFrame = {
    VectorKernels.register(e.sparkSession)
    explodeBands(
      e.select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(autoBits(e)))
        .select(col("vec_id"),
          VectorKernels.abuckets(col("embedding"), col("abits"),
            AutoBands, MaxAutoBits).as("bks")),
      Seq("vec_id"))
  }

  /** LSH top-k at the CORPUS-ADAPTIVE geometry: [[autoBits]] chooses the
    * bit budget from the corpus count inside the plan, [[lshBandedAuto]]
    * buckets with it, and the shared band self-join + exact re-rank tail
    * does the rest. THE production entry point — holds per-bucket
    * occupancy (and so candidate cost per vector) ~constant at every
    * corpus size up to the [[MaxAutoBits]] cap, where a fixed geometry
    * must be re-tuned by hand each decade. Fully oracle-replayable
    * ([[lshOracleCtesAuto]]): the chooser is integer-exact arithmetic and
    * the [[AutoBands]]·[[MaxAutoBits]] planes are seed-42 literals of the operator.
    */
  def lshTopKAuto(e: DataFrame, k: Int = 5): DataFrame = {
    val banded = lshBandedAuto(e)
    rankBanded(banded, banded, k)
  }

  /** MULTI-PROBE LSH top-k (Lv et al., VLDB 2007) — the organic-regime
    * recall lever the r17 ladder measured the need for: exact-collision
    * banding holds the candidate budget constant per decade, so in the
    * organic regime (neighbors at cosine ≈ 0.5, not near-dup clones)
    * recall decays with the chooser's growing bit budget (0.157 at 200 k,
    * 0.082 at 2 M — SURVEY §6 r17, matching the banding closed form).
    * Multi-probe recovers it THROUGH THE INDEX: each query probes, per
    * band, its exact bucket plus every bucket at Hamming distance 1 in
    * sign space (`bucket XOR 2^j`, j < abits) — the buckets a
    * near-miss neighbor most likely landed in — multiplying the candidate
    * budget by (1 + abits) at query time with NO index change, no extra
    * bands, no corpus scan. Closed form at the 2 M organic decade: a
    * 12-bit band's exact-collision P ≈ 0.011 gains ≈ 0.059 from the 12
    * single-bit flips → OR-10 recall ≈ 0.5 vs 0.082 exact-only, at
    * ~(1+12)× the per-band candidate volume (occupancy is the adaptive
    * geometry's ~256 constant, so probes cost panel × bands × 13 × 256
    * lookups — bucket equi-joins, never a scan).
    *
    * Query side only: the corpus index is [[lshBandedAuto]] unchanged
    * (one build, both join sides). Candidates are a strict SUPERSET of
    * the exact-collision path's (the exact bucket is probe 0), so recall
    * is provably ≥ [[simLshRecall]]'s on the same panel — spec-pinned.
    * Deterministic end-to-end (the probe set is pure bucket arithmetic),
    * so the whole expansion replays in the oracle.
    *
    * `panel`: optional (vec_id, …) query frame (the probe harness's hash
    * panel); default is the [[sampleModulus]] residue class the declared
    * recall family measures on. `maxFlips` caps the per-band flip count
    * (0 = exact-collision only — the single-probe baseline through the
    * same plan, so the two rungs are measurable decade-for-decade on one
    * code path), and caps the probe RADIUS with it (maxFlips < 2 disables
    * `pairBits`' radius-2 pairs so the baseline stays a true subset rung).
    * `fixedBits` pins the band geometry for a retrieval deployment
    * ([[bitsFrame]] — the self-join chooser trades recall for occupancy at
    * cap boundaries; a retrieval index pins the geometry its recall target
    * was measured at and rebuilds on its own schedule). `probeBudget` = B
    * > 0 switches probe selection to the ranked Lv et al. sequence: the B
    * best radius-≤2 probes per band by margin mass
    * ([[graft.functions.LshProbeSeq]]), exclusive of the radius knobs.
    *
    * Scale shape: the query side is ALWAYS panel-sized here, so it is
    * BROADCAST into the candidate join — the 20 M-decade probe of the
    * hash-partitioned form sorted the corpus-side band rows (embeddings
    * included, ~70 GB of sort spill) to death; with the panel broadcast
    * the corpus side never exchanges at all: scan → broadcast-hash join →
    * partial TopK, the 100 TB shape for panel × corpus candidate joins.
    */
  def lshMultiProbeTopK(e: DataFrame, k: Int = 5,
                        panel: Option[DataFrame] = None,
                        maxFlips: Int = Int.MaxValue,
                        pairBits: Int = 0,
                        fixedBits: Option[Int] = None,
                        probeBudget: Int = 0): DataFrame = {
    require(probeBudget <= 0 || (pairBits <= 0 && maxFlips == Int.MaxValue),
      "[multiprobe] probeBudget is its own probe-selection axis — combine " +
        "it with the radius knobs (maxFlips/pairBits) and the rungs stop nesting")
    val banded = lshBandedAuto(e, fixedBits)
    val qside = panel match {
      case Some(p) =>
        banded.join(broadcast(p.select(col("vec_id"))), Seq("vec_id"), "left_semi")
      case None =>
        banded.crossJoin(broadcast(sampleModulus(e)))
          .filter(col("vec_id") % col("m") === 3).drop("m")
    }
    // per (query, band): 1 + min(abits, maxFlips) probe buckets — the
    // exact bucket and each single sign-bit flip; 2^j as an exact
    // power-of-two double cast to long (the oracle's power(2, ·)
    // convention — exact for any j < 53, so the MaxAutoBits = 20 geometry
    // and decades of further cap raises stay inside the exact range).
    // Guarded concat: sequence(0, n−1) DESCENDS for n ≤ 0 (Spark
    // semantics), so the zero-flip case must short-circuit to the bare
    // bucket.
    val nf = least(col("abits"), lit(maxFlips))
    val singles = when(nf > 0,
      concat(array(col("bucket")),
        transform(sequence(lit(0), nf - 1),
          j => col("bucket").bitwiseXOR(pow(lit(2.0), j).cast("long")))))
      .otherwise(array(col("bucket")))
    val base = qside.crossJoin(broadcast(bitsFrame(e, fixedBits)))
    // `pairBits` = T > 0 adds QUERY-DIRECTED radius-2 probes (Lv et al.
    // §4): all C(min(T, abits), 2) two-bit flips among the T LOWEST-MARGIN
    // bits of each band — the [[graft.functions.LshAutoFlipOrder]] order.
    // Radius-2 is where the organic-regime mass sits (at neighbor cosine
    // ≈ 0.5 the per-bit flip probability is arccos(.5)/π = 1/3, so a
    // 12-bit band has P(d=2) ≈ 0.127 vs P(d=1) ≈ 0.046 and P(d=0) ≈
    // 0.008), and margin-directed pair selection captures most of it at
    // C(T,2) instead of C(abits,2) probes. pairBits = 0 is byte-identical
    // to the radius-1 plan (the declared radius-1 rows' pin).
    // `maxFlips` caps the probe RADIUS too (r18 ADVICE): pairs are radius-2
    // probes, so maxFlips < 2 suppresses them — otherwise the
    // exact-collision baseline mode (maxFlips = 0) would silently gain
    // radius-2 probes and the ladder's rungs would stop nesting.
    val effPairBits = if (maxFlips < 2) 0 else pairBits
    // `probeBudget` = B > 0 replaces the radius split entirely (r18
    // verdict item 3 — Lv et al. §4.1's ranked probe sequence): the
    // [[graft.functions.LshProbeSeq]] kernel scores EVERY radius-≤2 probe
    // by flipped-margin mass and emits the B best per band as XOR masks;
    // a low-margin pair can outrank a high-margin single, the frontier
    // point the fixed all-singles-then-all-pairs split cannot reach. The
    // exact bucket is always probe 0, so candidates remain a strict
    // superset of exact collision at any budget.
    val probeArr =
      if (probeBudget > 0)
        concat(array(col("bucket")),
          transform(VectorKernels.aprobeseq(col("embedding"), col("abits"),
              col("band"), AutoBands, MaxAutoBits, probeBudget),
            mask => col("bucket").bitwiseXOR(mask)))
      else if (effPairBits <= 0) singles else {
      val t = least(lit(effPairBits.toLong), col("abits"))
      def flipAt(pos: Column): Column =
        pow(lit(2.0), element_at(col("fo"), (pos + 1).cast("int"))).cast("long")
      val pairs = flatten(transform(sequence(lit(0L), t - 2),
        a => transform(sequence(a + 1, t - 1),
          b => col("bucket").bitwiseXOR(flipAt(a)).bitwiseXOR(flipAt(b)))))
      // sequence() descends for t < 2 — same guard discipline as `singles`
      concat(singles, when(t >= 2, pairs).otherwise(array().cast("array<bigint>")))
    }
    val expanded = (if (effPairBits <= 0) base else
      base.withColumn("fo", VectorKernels.afliporder(
        col("embedding"), col("abits"), col("band"), AutoBands, MaxAutoBits)))
    val probes = expanded
      .select(col("vec_id"), col("embedding"), col("nrm"), col("band"),
        explode(probeArr).as("bucket"))
    rankBanded(broadcast(probes), banded, k)
  }

  /** [[lshMultiProbeTopK]]'s DuckDB replay: the adaptive-geometry CTEs
    * with the query side expanded to its (1 + abits) probe buckets —
    * f = 0 is the exact bucket, f = j probes `xor(bucket, 2^(j−1))`.
    */
  private def multiProbeOracleCtes: String =
    s"""WITH e AS (SELECT vec_id, embedding,
       |   sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
       | FROM embeddings),
       |$mmSql,
       |$abitsSql,
       |pl(plane, coef) AS (VALUES ${planeValuesSql(AutoBands * MaxAutoBits)}),
       |bits AS (SELECT e.vec_id, pl.plane,
       |    CASE WHEN list_sum(list_transform(range(1,65),
       |           i -> CAST(e.embedding[i] AS DOUBLE) * coef[i])) >= 0
       |         THEN CAST(power(2, plane % (SELECT abits FROM g)) AS BIGINT)
       |         ELSE 0 END AS bit
       |  FROM e CROSS JOIN pl WHERE pl.plane < $AutoBands * (SELECT abits FROM g)),
       |bk AS (SELECT vec_id,
       |       CAST(plane // (SELECT abits FROM g) AS INT) AS band,
       |       CAST(sum(bit) AS BIGINT) AS bucket
       |       FROM bits GROUP BY 1, 2),
       |pq AS (SELECT vec_id, band,
       |       CASE WHEN f = 0 THEN bucket
       |            ELSE xor(bucket, CAST(power(2, f - 1) AS BIGINT)) END AS bucket
       |       FROM bk, unnest(range(0, (SELECT abits FROM g) + 1)) AS t(f)
       |       WHERE vec_id % (SELECT m FROM mm) = 3),
       |cand AS (SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS n_id
       |  FROM pq a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
       |                     AND a.vec_id != b.vec_id),
       |sc AS (SELECT cand.q_id, cand.n_id,
       |    list_sum(list_transform(range(1, 65),
       |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)))
       |      / (q.nrm * n.nrm) AS cos
       |  FROM cand JOIN e q ON q.vec_id = cand.q_id
       |            JOIN e n ON n.vec_id = cand.n_id),
       |r AS (SELECT q_id, n_id, cos, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY q_id ORDER BY round(cos, 9) DESC, n_id) AS INT) AS rank
       |  FROM sc)
       |""".stripMargin

  /** The multi-probe lists as a declared row (panel queries × full-corpus
    * index, the [[simLshAnn]] pricing shape): top-5 per residue-panel
    * query from the (1 + abits)-probe candidate set, whole expansion
    * oracle-replayed.
    */
  private val simLshMultiprobe = Q(
    "sim_lsh_multiprobe",
    (s, dir) => lshMultiProbeTopK(emb(s, dir)).orderBy("q_id", "rank"),
    Some(multiProbeOracleCtes +
      """SELECT q_id, n_id, round(cos, 6) AS cosine, rank
        |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin))

  /** Recall@5 of the multi-probe path on the shared residue panel — the
    * FIFTH rung of the declared recall family (LSH-exact / multi-probe /
    * IVF / IVFPQ / Hamming, one panel, one metric): prices what
    * single-bit probing buys back over exact collision at the same index.
    * Provably ≥ sim_lsh_recall (candidate superset) — Round17Spec pins
    * the dominance at both gate scales.
    */
  private val simLshMultiprobeRecall = Q(
    "sim_lsh_multiprobe_recall",
    (s, dir) => {
      VectorKernels.register(s)
      val e = emb(s, dir)
      val got = lshMultiProbeTopK(e).select("q_id", "n_id")
      panelRecallReadout(s, dir, got)
    },
    Some(multiProbeOracleCtes + recallTailSql))

  /** Declared radius-2 probe width T: pairs are drawn from the T
    * lowest-margin bits per band, C(T,2) = 15 extra probes at full width
    * (6 at the gate scales' 4-bit geometry). 6 balances the measured
    * organic-recall gain (most of the radius-2 mass concentrates in the
    * lowest-margin third of the bits — Lv et al. §4's point) against
    * candidate growth; [[lshMultiProbeTopK]]'s `pairBits` socket prices
    * other widths in the SURVEY §6 ladder.
    */
  private[graft] val MultiProbePairBits = 6

  /** [[lshMultiProbeTopK]]-with-pairs replayed in DuckDB: the adaptive
    * CTEs keeping each plane's raw dot `d`, so the per-band flip order is
    * ROW_NUMBER OVER (ORDER BY abs(d), bit) — exactly
    * [[graft.functions.LshAutoFlipOrder]]'s (|dot| asc, bit asc) key
    * (the dot is the same exact-product left-to-right double sum in both
    * engines, so the permutation replays bit-for-bit). pq1 is the
    * radius-≤1 probe set, pq2 the margin-directed pairs; candidates are
    * the DISTINCT union, so probe ORDER never matters, only the set.
    */
  private def multiProbe2OracleCtes(t: Int): String =
    s"""WITH e AS (SELECT vec_id, embedding,
       |   sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
       | FROM embeddings),
       |$mmSql,
       |$abitsSql,
       |pl(plane, coef) AS (VALUES ${planeValuesSql(AutoBands * MaxAutoBits)}),
       |dts AS (SELECT e.vec_id, pl.plane,
       |    list_sum(list_transform(range(1,65),
       |      i -> CAST(e.embedding[i] AS DOUBLE) * coef[i])) AS d
       |  FROM e CROSS JOIN pl WHERE pl.plane < $AutoBands * (SELECT abits FROM g)),
       |bk AS (SELECT vec_id,
       |       CAST(plane // (SELECT abits FROM g) AS INT) AS band,
       |       CAST(sum(CASE WHEN d >= 0
       |         THEN CAST(power(2, plane % (SELECT abits FROM g)) AS BIGINT)
       |         ELSE 0 END) AS BIGINT) AS bucket
       |       FROM dts GROUP BY 1, 2),
       |fo AS (SELECT vec_id,
       |       CAST(plane // (SELECT abits FROM g) AS INT) AS band,
       |       CAST(plane % (SELECT abits FROM g) AS INT) AS bit,
       |       CAST(ROW_NUMBER() OVER (
       |         PARTITION BY vec_id, plane // (SELECT abits FROM g)
       |         ORDER BY abs(d), plane % (SELECT abits FROM g)) AS INT) AS mr
       |  FROM dts WHERE vec_id % (SELECT m FROM mm) = 3),
       |pq1 AS (SELECT vec_id, band,
       |       CASE WHEN f = 0 THEN bucket
       |            ELSE xor(bucket, CAST(power(2, f - 1) AS BIGINT)) END AS bucket
       |       FROM bk, unnest(range(0, (SELECT abits FROM g) + 1)) AS u(f)
       |       WHERE vec_id % (SELECT m FROM mm) = 3),
       |pq2 AS (SELECT a.vec_id, a.band,
       |       xor(xor(k.bucket, CAST(power(2, a.bit) AS BIGINT)),
       |           CAST(power(2, b.bit) AS BIGINT)) AS bucket
       |  FROM fo a JOIN fo b ON a.vec_id = b.vec_id AND a.band = b.band
       |                     AND a.mr < b.mr
       |  JOIN bk k ON k.vec_id = a.vec_id AND k.band = a.band
       |  WHERE b.mr <= least($t, (SELECT abits FROM g))),
       |pq AS (SELECT * FROM pq1 UNION ALL SELECT * FROM pq2),
       |cand AS (SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS n_id
       |  FROM pq a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
       |                     AND a.vec_id != b.vec_id),
       |sc AS (SELECT cand.q_id, cand.n_id,
       |    list_sum(list_transform(range(1, 65),
       |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)))
       |      / (q.nrm * n.nrm) AS cos
       |  FROM cand JOIN e q ON q.vec_id = cand.q_id
       |            JOIN e n ON n.vec_id = cand.n_id),
       |r AS (SELECT q_id, n_id, cos, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY q_id ORDER BY round(cos, 9) DESC, n_id) AS INT) AS rank
       |  FROM sc)
       |""".stripMargin

  /** The query-directed radius-2 lists as a declared row — the r17
    * verdict's named organic-recall lever (item 2) as a first-class,
    * oracle-replayed operator, not just a probe mode.
    */
  private val simLshMultiprobe2 = Q(
    "sim_lsh_multiprobe2",
    (s, dir) => lshMultiProbeTopK(emb(s, dir), pairBits = MultiProbePairBits)
      .orderBy("q_id", "rank"),
    Some(multiProbe2OracleCtes(MultiProbePairBits) +
      """SELECT q_id, n_id, round(cos, 6) AS cosine, rank
        |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin))

  /** Recall@5 of the radius-2 path on the shared residue panel — the
    * SIXTH rung of the declared recall family; prices what margin-directed
    * pair probing buys back over radius-1 at the same index.
    */
  private val simLshMultiprobe2Recall = Q(
    "sim_lsh_multiprobe2_recall",
    (s, dir) => {
      VectorKernels.register(s)
      val e = emb(s, dir)
      val got = lshMultiProbeTopK(e, pairBits = MultiProbePairBits)
        .select("q_id", "n_id")
      panelRecallReadout(s, dir, got)
    },
    Some(multiProbe2OracleCtes(MultiProbePairBits) + recallTailSql))

  /** Declared probe budget B: 8 ranked probes per band beyond the exact
    * bucket. Under the gate geometries (abits 4–5 ⇒ 10–15 radius-≤2
    * candidates) the selection is genuinely active — some candidates are
    * rejected — while staying cheaper per band than the radius-2 row's
    * 1 + abits + C(6,2) fixed expansion; the 2 M organic ladder prices
    * other budgets through [[graft.LshScaleProbe]]'s
    * SPARK_GRAFT_MULTIPROBE_BUDGET knob.
    */
  private[graft] val MultiProbeBudget = 8

  /** [[lshMultiProbeTopK]]-with-`probeBudget` replayed in DuckDB: the
    * adaptive CTEs keep each plane's raw dot, every radius-≤2 probe is
    * scored by its flipped-margin mass — singles m², pairs m_i² + m_j² in
    * bit order, the [[graft.functions.LshProbeSeq]] doubles exactly — and
    * ROW_NUMBER OVER (ORDER BY score, mask) takes the B best per
    * (query, band). Candidates are the DISTINCT union over the exact
    * bucket plus the selected masks, so probe order never matters, only
    * the selected set.
    */
  private def multiProbeBudgetOracleCtes(b: Int): String =
    s"""WITH e AS (SELECT vec_id, embedding,
       |   sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
       | FROM embeddings),
       |$mmSql,
       |$abitsSql,
       |pl(plane, coef) AS (VALUES ${planeValuesSql(AutoBands * MaxAutoBits)}),
       |dts AS (SELECT e.vec_id, pl.plane,
       |    list_sum(list_transform(range(1,65),
       |      i -> CAST(e.embedding[i] AS DOUBLE) * coef[i])) AS d
       |  FROM e CROSS JOIN pl WHERE pl.plane < $AutoBands * (SELECT abits FROM g)),
       |bk AS (SELECT vec_id,
       |       CAST(plane // (SELECT abits FROM g) AS INT) AS band,
       |       CAST(sum(CASE WHEN d >= 0
       |         THEN CAST(power(2, plane % (SELECT abits FROM g)) AS BIGINT)
       |         ELSE 0 END) AS BIGINT) AS bucket
       |       FROM dts GROUP BY 1, 2),
       |mg AS (SELECT vec_id,
       |       CAST(plane // (SELECT abits FROM g) AS INT) AS band,
       |       CAST(plane % (SELECT abits FROM g) AS INT) AS bit,
       |       abs(d) AS m
       |  FROM dts WHERE vec_id % (SELECT m FROM mm) = 3),
       |cs AS (SELECT vec_id, band, CAST(power(2, bit) AS BIGINT) AS mask,
       |         m * m AS score
       |       FROM mg
       |       UNION ALL
       |       SELECT a.vec_id, a.band,
       |         CAST(power(2, a.bit) AS BIGINT) + CAST(power(2, b.bit) AS BIGINT),
       |         a.m * a.m + b.m * b.m
       |       FROM mg a JOIN mg b ON a.vec_id = b.vec_id AND a.band = b.band
       |                          AND a.bit < b.bit),
       |ps AS (SELECT vec_id, band, mask FROM (
       |       SELECT vec_id, band, mask, ROW_NUMBER() OVER (
       |         PARTITION BY vec_id, band ORDER BY score, mask) AS rn
       |       FROM cs) WHERE rn <= $b),
       |pq AS (SELECT vec_id, band, bucket FROM bk
       |       WHERE vec_id % (SELECT m FROM mm) = 3
       |       UNION ALL
       |       SELECT p.vec_id, p.band, xor(k.bucket, p.mask)
       |       FROM ps p JOIN bk k ON k.vec_id = p.vec_id AND k.band = p.band),
       |cand AS (SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS n_id
       |  FROM pq a JOIN bk b ON a.band = b.band AND a.bucket = b.bucket
       |                     AND a.vec_id != b.vec_id),
       |sc AS (SELECT cand.q_id, cand.n_id,
       |    list_sum(list_transform(range(1, 65),
       |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)))
       |      / (q.nrm * n.nrm) AS cos
       |  FROM cand JOIN e q ON q.vec_id = cand.q_id
       |            JOIN e n ON n.vec_id = cand.n_id),
       |r AS (SELECT q_id, n_id, cos, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY q_id ORDER BY round(cos, 9) DESC, n_id) AS INT) AS rank
       |  FROM sc)
       |""".stripMargin

  /** The ranked-budget lists as a declared row — the r18 verdict's item 3
    * (replace the radius split with a query-directed probe BUDGET) as a
    * first-class, oracle-replayed operator.
    */
  private val simLshMultiprobeBudget = Q(
    "sim_lsh_multiprobe_budget",
    (s, dir) => lshMultiProbeTopK(emb(s, dir), probeBudget = MultiProbeBudget)
      .orderBy("q_id", "rank"),
    Some(multiProbeBudgetOracleCtes(MultiProbeBudget) +
      """SELECT q_id, n_id, round(cos, 6) AS cosine, rank
        |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin))

  /** Recall@5 of the budgeted path on the shared residue panel — the
    * SEVENTH rung of the declared recall family: prices what margin-ranked
    * probe selection buys per probe over the fixed radius split at the
    * same index.
    */
  private val simLshMultiprobeBudgetRecall = Q(
    "sim_lsh_multiprobe_budget_recall",
    (s, dir) => {
      VectorKernels.register(s)
      val e = emb(s, dir)
      val got = lshMultiProbeTopK(e, probeBudget = MultiProbeBudget)
        .select("q_id", "n_id")
      panelRecallReadout(s, dir, got)
    },
    Some(multiProbeBudgetOracleCtes(MultiProbeBudget) + recallTailSql))

  /** Exact all-pairs cosine >= `minCos` via a triangle-tiled self-join — the
    * distributed shape for exact pairwise similarity when the threshold sits
    * below LSH's useful regime.
    *
    * Why not LSH candidates here: measured on this corpus (whose pairwise
    * cosine ceiling is ≈ 0.51), the cheapest banding that reaches recall 1.0
    * at θ=0.4 (32 bands × 3 bits) admits 97.8 % of ALL pairs as candidates —
    * at a weak-similarity threshold LSH is a no-op filter plus a recall
    * coin-flip, so the exact path must own the n² compare. LSH banding
    * ([[lshTopK]]) and MinHash banding ([[Dedup.minhashPairs]]) remain the
    * scale path for true near-dup thresholds (>= 0.8), where the filter is
    * sharp.
    *
    * The tiling: block b = vec_id mod `blocks`; every unordered block pair
    * (i <= j) is one tile. A vector in block b is shuffled to the tiles whose
    * ROW block is b (left side) and those whose COLUMN block is b (right
    * side), and tiles meet through a plain equi-join on the tile id — so the
    * plan is a shuffled hash/sort-merge join, never a broadcast nested-loop,
    * and no executor ever holds the whole vector set. Shuffle volume is
    * rows × (blocks+1); per-tile work is (n/blocks)², so the unavoidable n²/2
    * comparisons spread evenly over blocks(blocks+1)/2 tasks. `blocks` scales
    * with cluster cores (√tasks), independent of data volume per task.
    */
  def tiledCosinePairs(e: DataFrame, minCos: Double, blocks: Int = 16): DataFrame = {
    VectorKernels.register(e.sparkSession)
    // pmod, not %: a negative vec_id under % would yield a negative block
    // and a descending (empty) tile sequence — pmod keeps the helper safe
    // for arbitrary id domains
    val v = graft.Caches.track(e.select(col("vec_id"), col("embedding"),
        l2norm(col("embedding")).as("nrm"))
      .withColumn("blk", pmod(col("vec_id"), lit(blocks)).cast("int")))
    // left: all tiles (blk, j) for j >= blk; right: all tiles (i, blk) for i <= blk
    val left = v.withColumn("tile",
        explode(transform(sequence(col("blk"), lit(blocks - 1)),
          j => col("blk") * blocks + j)))
      .select(col("tile"), col("vec_id").as("va"), col("embedding").as("emb_a"),
        col("nrm").as("nrm_a"), col("blk").as("blk_a"))
    val right = v.withColumn("tile",
        explode(transform(sequence(lit(0), col("blk")),
          i => i * blocks + col("blk"))))
      .select(col("tile").as("tile_b"), col("vec_id").as("vb"),
        col("embedding").as("emb_b"), col("nrm").as("nrm_b"), col("blk").as("blk_b"))
    left.join(right, col("tile") === col("tile_b"))
      // diagonal tiles carry both orientations of a pair — keep one; a pair
      // spanning two blocks occurs in exactly one tile, either orientation
      .filter(col("blk_a") =!= col("blk_b") || col("va") < col("vb"))
      .withColumn("cos", dot(col("emb_a"), col("emb_b")) / (col("nrm_a") * col("nrm_b")))
      .filter(round(col("cos"), 9) >= minCos)
      .select(least(col("va"), col("vb")).as("vec_a"),
        greatest(col("va"), col("vb")).as("vec_b"), col("cos"))
  }

  /** Embedding-cosine near-duplicate pairs (SURVEY.md §2.12 D3/D4 bridge):
    * all vector pairs with cosine >= 0.4 — the top ~1e-4 of the pair
    * distribution in this corpus (which plants no true duplicates; max
    * pairwise cosine ≈ 0.51). Runs the tiled exact self-join
    * ([[tiledCosinePairs]]) — no broadcast of the vector set, no
    * nested-loop join; see there for why LSH candidates are unsound at this
    * threshold.
    */
  private val dedupEmbeddingCosine = Q(
    "dedup_embedding_cosine",
    (s, dir) => tiledCosinePairs(emb(s, dir), 0.4)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cosine"))
      .orderBy("vec_a", "vec_b"),
    Some("""WITH e AS (SELECT vec_id, embedding,
           |   sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
           | FROM embeddings),
           |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           |   list_sum(list_transform(range(1, 65),
           |     i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
           |     / (a.nrm * b.nrm) AS cos
           | FROM e a JOIN e b ON a.vec_id < b.vec_id)
           |SELECT vec_a, vec_b, round(cos, 6) AS cosine
           |FROM p WHERE round(cos, 9) >= 0.4
           |ORDER BY vec_a, vec_b""".stripMargin))

  /** IVF (inverted-file) ANN: assign every vector to its nearest of K coarse
    * centroids, then answer queries by scanning only the `nprobe` closest
    * cells — the classic IVF-Flat layout. Centroids here are K deterministic
    * seed vectors (`vec_id < K`, a pushed-down 8-row scan); at 100 TB they'd
    * come from k-means over a sample, but the query-side plan — broadcast
    * centroids, cell equi-join, exact re-rank — is exactly this one.
    * Every stage is deterministic (seed centroids, round(·,9)+id tie-broken
    * argmax, fixed nprobe, exact re-rank), so the whole pipeline is
    * oracle-checked in SQL; SimilaritySpec additionally measures recall and
    * verifies the cell scan is a genuine pre-filter.
    */
  private val simIvfAnn = Q(
    "sim_ivf_ann",
    (s, dir) => ivfTopK(emb(s, dir),
      Tables.load(s, dir, "embeddings")).orderBy("q_id", "rank"),
    Some("""WITH e AS (SELECT vec_id, embedding,
           |   sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
           | FROM embeddings),
           |c AS (SELECT vec_id AS cent_id, embedding AS c_emb, nrm AS c_nrm
           |      FROM e WHERE vec_id < 8),
           |asg AS (SELECT cent_id, vec_id AS n_id, embedding AS n_emb, nrm AS n_nrm FROM (
           |   SELECT e.vec_id, e.embedding, e.nrm, c.cent_id,
           |     ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY round(
           |       list_sum(list_transform(range(1, 65),
           |         i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.c_emb[i] AS DOUBLE)))
           |       / (e.nrm * c.c_nrm), 9) DESC, c.cent_id) AS rn
           |   FROM e CROSS JOIN c) WHERE rn = 1),
           |pr AS (SELECT q_id, q_emb, q_nrm, cent_id FROM (
           |   SELECT e.vec_id AS q_id, e.embedding AS q_emb, e.nrm AS q_nrm, c.cent_id,
           |     ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY round(
           |       list_sum(list_transform(range(1, 65),
           |         i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.c_emb[i] AS DOUBLE)))
           |       / (e.nrm * c.c_nrm), 9) DESC, c.cent_id) AS rn
           |   FROM e CROSS JOIN c WHERE e.vec_id < 10) WHERE rn <= 3),
           |sc AS (SELECT pr.q_id, a.n_id,
           |    list_sum(list_transform(range(1, 65),
           |      i -> CAST(pr.q_emb[i] AS DOUBLE) * CAST(a.n_emb[i] AS DOUBLE)))
           |      / (pr.q_nrm * a.n_nrm) AS cos
           |  FROM pr JOIN asg a USING (cent_id) WHERE pr.q_id != a.n_id),
           |r AS (SELECT q_id, n_id, cos, CAST(ROW_NUMBER() OVER (
           |    PARTITION BY q_id ORDER BY round(cos, 9) DESC, n_id) AS INT) AS rank
           |  FROM sc)
           |SELECT q_id, n_id, round(cos, 6) AS cosine, rank
           |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin))

  private[graft] val IvfK = 8       // coarse cells
  // cells scanned per query; private[graft] so the dev probe's nprobe
  // fallback reads THIS constant instead of duplicating the literal (a
  // drifted duplicate would silently price a different operator than the
  // declared rows run — r17 ADVICE)
  private[graft] val IvfNProbe = 3

  /** `e`: spread full vector set; `raw`: unspread scan for the pushed-down
    * centroid/query reads.
    */
  def ivfTopK(e: DataFrame, raw: DataFrame, k: Int = 5): DataFrame = {
    VectorKernels.register(e.sparkSession)
    val cents = broadcast(raw.filter(col("vec_id") < IvfK)
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"),
        l2norm(col("embedding")).as("c_nrm")))
    // cell assignment: one broadcast pass, argmax cosine via the
    // bounded-state TopK aggregate at k = 1 (r15 — the window form sorted
    // the IvfK × n assignment stream; ordering identical: (round(cos,9)
    // desc, cent_id)). The vector payload rides as a grouping key so no
    // join-back pass is needed.
    val assigned = e.select(col("vec_id"), col("embedding"),
        l2norm(col("embedding")).as("nrm"))
      // hint re-stated at the join site (not only on cents' definition) so
      // the broadcast does not ride on hint propagation through the
      // intervening projections surviving a future refactor (r15 verdict)
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("cent_id"),
        (dot(col("embedding"), col("c_emb")) / (col("nrm") * col("c_nrm"))).as("cos_c"))
      .groupBy(col("vec_id"), col("embedding"), col("nrm"))
      .agg(graft.functions.TopK.neighbors(1)(col("cent_id"), col("cos_c")).as("nb"))
      .select(col("nb").getItem(0).getField("_1").as("cent_id"),
        col("vec_id").as("n_id"), col("embedding").as("n_emb"),
        col("nrm").as("n_nrm"))
    // query side: nprobe nearest cells per query vector
    val wProbe = Window.partitionBy("q_id")
      .orderBy(round(col("cos_c"), 9).desc, col("cent_id"))
    val probes = raw.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        l2norm(col("embedding")).as("q_nrm"))
      .crossJoin(broadcast(cents))
      .withColumn("cos_c", dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= IvfNProbe)
      .select(col("q_id"), col("q_emb"), col("q_nrm"), col("cent_id"))
    // scan only the probed cells; exact rank via the bounded-state TopK
    // aggregate (the probed-cell stream is ~nprobe/IvfK of the corpus per
    // query — still corpus-linear, never sorted)
    broadcast(probes).join(assigned, "cent_id")
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm"))).as("cos"))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopK.neighbors(k)(col("n_id"), col("cos")).as("nb"))
      .select(col("q_id"), explode(col("nb")).as("x"))
      .select(col("q_id"), col("x._1").as("n_id"),
        round(col("x._2"), 6).as("cosine"), col("x._3").as("rank"))
  }

  /** Int8 scalar-quantized top-k — the FAISS/ScaNN SQ8 layout in DataFrame
    * terms. Per-vector symmetric quantization (q_i = round(x_i / s), s =
    * max|x| / 127) shrinks the candidate side to 1 byte per dimension, so
    * the scoring pass moves 4× less data through shuffle and cache and runs
    * the integer [[graft.functions.ByteVecDot]] codegen kernel; the top 4·k
    * quantized candidates per query are then re-ranked exactly in float
    * (only candidates × dims floats are ever fetched) and the true top-k
    * kept. The quantization is deterministic arithmetic (`s = max|x|/127`,
    * `q_i = round(x_i/s)`, integer dot), so the full pipeline — candidate
    * set included — is oracle-checked in SQL; SimilaritySpec additionally
    * measures recall against the exact baseline.
    */
  private val simQuantizedTopk = Q(
    "sim_quantized_topk",
    (s, dir) => quantizedTopK(emb(s, dir),
      Tables.load(s, dir, "embeddings")).orderBy("q_id", "rank"),
    Some("""WITH s1 AS (SELECT vec_id, embedding,
           |   sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm,
           |   CAST(greatest(list_max(list_transform(embedding, x -> abs(x))),
           |     CAST(1e-30 AS REAL)) AS DOUBLE) / 127.0 AS scale
           | FROM embeddings),
           |qz AS (SELECT vec_id, nrm, scale,
           |   list_transform(embedding,
           |     x -> CAST(round(CAST(x AS DOUBLE) / scale) AS BIGINT)) AS qvec
           | FROM s1),
           |cand AS (SELECT q_id, n_id FROM (
           |   SELECT a.vec_id AS q_id, b.vec_id AS n_id,
           |     ROW_NUMBER() OVER (PARTITION BY a.vec_id ORDER BY round(
           |       CAST(list_sum(list_transform(range(1, 65),
           |         i -> a.qvec[i] * b.qvec[i])) AS BIGINT)
           |         * a.scale * b.scale / (a.nrm * b.nrm), 9) DESC, b.vec_id) AS arank
           |   FROM qz a JOIN qz b ON a.vec_id < 10 AND b.vec_id != a.vec_id)
           | WHERE arank <= 20),
           |sc AS (SELECT cand.q_id, cand.n_id,
           |    list_sum(list_transform(range(1, 65),
           |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)))
           |      / (q.nrm * n.nrm) AS cos
           |  FROM cand JOIN s1 q ON q.vec_id = cand.q_id
           |            JOIN s1 n ON n.vec_id = cand.n_id),
           |r AS (SELECT q_id, n_id, cos, CAST(ROW_NUMBER() OVER (
           |    PARTITION BY q_id ORDER BY round(cos, 9) DESC, n_id) AS INT) AS rank
           |  FROM sc)
           |SELECT q_id, n_id, round(cos, 6) AS cosine, rank
           |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin))

  /** `e`: spread full vector set; `raw`: unspread scan for the pushed-down
    * query-side read.
    */
  def quantizedTopK(e: DataFrame, raw: DataFrame, k: Int = 5): DataFrame = {
    VectorKernels.register(e.sparkSession)
    def quantized(d: DataFrame): DataFrame = d
      .withColumn("scale",
        greatest(array_max(transform(col("embedding"), x => abs(x))), lit(1e-30f))
          .cast("double") / 127.0)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") / col("scale")).cast("tinyint")).as("qvec"),
        col("scale"), l2norm(col("embedding")).as("nrm"))
    val qs = broadcast(quantized(raw.filter(col("vec_id") < 10))
      .toDF("q_id", "q_qvec", "q_scale", "q_nrm"))
    val ns = quantized(e).toDF("n_id", "n_qvec", "n_scale", "n_nrm")
    // approx shortlist via the bounded-state TopK aggregate (r15): same
    // (round(qcos,9) desc, n_id) order as the old row_number window, no
    // per-task sort of the panel × corpus quantized-score stream
    val cand = qs.join(ns, col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (VectorKernels.bdot(col("q_qvec"), col("n_qvec")) * col("q_scale") *
          col("n_scale") / (col("q_nrm") * col("n_nrm"))).as("qcos"))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopK.neighbors(4 * k)(col("n_id"), col("qcos")).as("nb"))
      .select(col("q_id"), explode(col("nb")).as("x"))
      .select(col("q_id"), col("x._1").as("n_id"))
    // exact re-rank of candidates only: float vectors join back by id
    val nf = e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
      l2norm(col("embedding")).as("n_nrm"))
    val qf = broadcast(raw.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        l2norm(col("embedding")).as("q_nrm")))
    val wExact = Window.partitionBy("q_id")
      .orderBy(round(col("cos"), 9).desc, col("n_id"))
    cand.join(nf, "n_id").join(qf, "q_id")
      .withColumn("cos",
        dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), round(col("cos"), 6).as("cosine"), col("rank"))
  }

  private val PqM = 4        // subspaces
  private val PqK = 16       // centroids per subspace
  private val PqSubDim = 16  // dims / PqM

  /** Product-quantized top-k (the FAISS IVFPQ residual-free layout in
    * DataFrame terms) — the last rung of the compression ladder after SQ8:
    * each vector is represented by `PqM` centroid codes (4 bytes here vs
    * 256 bytes of float32, a 64× compression), so at 100 TB the candidate
    * side shuffles codes only, and scoring a (query, candidate) pair is
    * `PqM` lookups in a per-query distance table (built once per query
    * against the 64-entry codebook) instead of a 64-dim dot product.
    *
    * Deterministic end-to-end, so fully oracle-checked like
    * [[simIvfAnn]]/[[simQuantizedTopk]]: codebooks are the first `PqK`
    * vectors' subspace slices (a real system would k-means them — the
    * [[kmeansAssign]] operator is that machinery), assignment is argmin
    * L2² with `(round(·,9), cent_id)` tie-break, ADC partial dots are
    * summed with the order-independent decimal [[graft.functions
    * .Deterministic.dsumFine]], the top `4k` ADC candidates are re-ranked
    * exactly in float, and only candidates × dims floats are ever fetched.
    * SimilaritySpec measures recall against the exact baseline.
    */
  private val simPqTopk = Q(
    "sim_pq_topk",
    (s, dir) => pqTopK(emb(s, dir),
      Tables.load(s, dir, "embeddings")).orderBy("q_id", "rank"),
    Some {
      // 1-based slice of subspace `sub` (0-based) is embedding[sub*16+i],
      // i in 1..16 — mirrored by Spark's slice(embedding, sub*16+1, 16)
      def subDot(a: String, b: String) =
        s"list_sum(list_transform(range(1, 17), i -> " +
          s"CAST($a[sub*16+i] AS DOUBLE) * CAST($b[sub*16+i] AS DOUBLE)))"
      s"""WITH e AS (SELECT vec_id, embedding,
         |   sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
         | FROM embeddings),
         |subs AS (SELECT unnest(range(0, 4)) AS sub),
         |cb AS (SELECT c.vec_id AS cent_id, sub, c.embedding AS c_emb,
         |    ${subDot("c.embedding", "c.embedding")} AS c_sq
         |  FROM e c, subs WHERE c.vec_id < 16),
         |asg AS (SELECT vec_id AS n_id, sub, cent_id, c_sq FROM (
         |   SELECT x.vec_id, cb.sub, cb.cent_id, cb.c_sq,
         |     ROW_NUMBER() OVER (PARTITION BY x.vec_id, cb.sub ORDER BY round(
         |       ${subDot("x.embedding", "x.embedding")}
         |       - 2 * ${subDot("x.embedding", "cb.c_emb")} + cb.c_sq, 9), cb.cent_id) AS rn
         |   FROM e x CROSS JOIN cb) WHERE rn = 1),
         |dt AS (SELECT q.vec_id AS q_id, cb.sub, cb.cent_id, q.nrm AS q_nrm,
         |    ${subDot("q.embedding", "cb.c_emb")} AS part
         |  FROM e q CROSS JOIN cb WHERE q.vec_id < 10),
         |adc AS (SELECT dt.q_id, asg.n_id, dt.q_nrm,
         |    CAST(SUM(CAST(dt.part AS DECIMAL(38,20))) AS DOUBLE) AS apx,
         |    CAST(SUM(CAST(asg.c_sq AS DECIMAL(38,20))) AS DOUBLE) AS pq_sq
         |  FROM asg JOIN dt ON asg.sub = dt.sub AND asg.cent_id = dt.cent_id
         |  WHERE asg.n_id != dt.q_id
         |  GROUP BY dt.q_id, asg.n_id, dt.q_nrm),
         |cand AS (SELECT q_id, n_id FROM (
         |   SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |     ORDER BY round(apx / (q_nrm * sqrt(pq_sq)), 9) DESC, n_id) AS arank
         |   FROM adc) WHERE arank <= 20),
         |sc AS (SELECT cand.q_id, cand.n_id,
         |    list_sum(list_transform(range(1, 65),
         |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)))
         |      / (q.nrm * n.nrm) AS cos
         |  FROM cand JOIN e q ON q.vec_id = cand.q_id
         |            JOIN e n ON n.vec_id = cand.n_id),
         |r AS (SELECT q_id, n_id, cos, CAST(ROW_NUMBER() OVER (
         |    PARTITION BY q_id ORDER BY round(cos, 9) DESC, n_id) AS INT) AS rank
         |  FROM sc)
         |SELECT q_id, n_id, round(cos, 6) AS cosine, rank
         |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
    })

  /** `e`: spread full vector set; `raw`: unspread scan for the pushed-down
    * codebook/query reads.
    */
  def pqTopK(e: DataFrame, raw: DataFrame, k: Int = 5): DataFrame = {
    VectorKernels.register(e.sparkSession)
    import graft.functions.Deterministic.dsumFine
    val subs = explode(sequence(lit(0), lit(PqM - 1))).as("sub")
    def subSlice(emb: Column) =
      slice(emb, col("sub") * PqSubDim + 1, lit(PqSubDim))
    // codebook: first PqK vectors' subspace slices — PqM×PqK = 64 rows
    val cb = broadcast(raw.filter(col("vec_id") < PqK)
      .select(col("vec_id").as("cent_id"), subs, col("embedding"))
      .select(col("cent_id"), col("sub"), subSlice(col("embedding")).as("c_sub"))
      .withColumn("c_sq", dot(col("c_sub"), col("c_sub"))))
    // encode: argmin L2² per (vector, subspace) → PqM code rows per vector.
    // Linear in N·PqM·PqK, map-side against the broadcast codebook.
    val wAssign = Window.partitionBy("n_id", "sub")
      .orderBy(round(col("dist2"), 9), col("cent_id"))
    val codes = e
      .select(col("vec_id").as("n_id"), subs, col("embedding"))
      .select(col("n_id"), col("sub"), subSlice(col("embedding")).as("x_sub"))
      // hoist |x_sub|² above the codebook join (constant per (vector,
      // subspace); Catalyst won't lift it out of the per-code expression)
      .withColumn("x_sq", dot(col("x_sub"), col("x_sub")))
      .join(cb, "sub")
      .withColumn("dist2",
        col("x_sq") - lit(2) * dot(col("x_sub"), col("c_sub"))
          + col("c_sq"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select("n_id", "sub", "cent_id", "c_sq")
    // per-query distance table: one subspace dot per (query, codebook entry)
    val dt = broadcast(raw.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), l2norm(col("embedding")).as("q_nrm"),
        subs, col("embedding"))
      .select(col("q_id"), col("q_nrm"), col("sub"), subSlice(col("embedding")).as("q_sub"))
      .join(cb, "sub")
      .select(col("q_id"), col("q_nrm"), col("sub"), col("cent_id"),
        dot(col("q_sub"), col("c_sub")).as("part")))
    // ADC: PqM table lookups per (query, candidate) — a broadcast equi-join
    // on (sub, cent_id) + a map-side-combined decimal sum; candidate floats
    // never move. The approximate norm is the codeword norm (standard ADC).
    // ADC shortlist via the bounded-state TopK aggregate (r15) — same
    // order as the old row_number window, no candidate-stream sort
    val cand = codes.join(dt, Seq("sub", "cent_id"))
      .filter(col("n_id") =!= col("q_id"))
      .groupBy("q_id", "n_id", "q_nrm")
      .agg(dsumFine(col("part")).as("apx"), dsumFine(col("c_sq")).as("pq_sq"))
      .select(col("q_id"), col("n_id"),
        (col("apx") / (col("q_nrm") * sqrt(col("pq_sq")))).as("cos_adc"))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopK.neighbors(4 * k)(col("n_id"), col("cos_adc")).as("nb"))
      .select(col("q_id"), explode(col("nb")).as("x"))
      .select(col("q_id"), col("x._1").as("n_id"))
    // exact re-rank of candidates only: float vectors join back by id
    val nf = e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
      l2norm(col("embedding")).as("n_nrm"))
    val qf = broadcast(raw.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        l2norm(col("embedding")).as("q_nrm")))
    val wExact = Window.partitionBy("q_id")
      .orderBy(round(col("cos"), 9).desc, col("n_id"))
    cand.join(nf, "n_id").join(qf, "q_id")
      .withColumn("cos",
        dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), round(col("cos"), 6).as("cosine"), col("rank"))
  }

  /** Fused IVF+PQ top-k — the FAISS IVFPQ architecture proper, composing
    * the two pruning axes the flat rungs exercise separately: the coarse
    * IVF quantizer prunes WHICH vectors are scored (only the `IvfNProbe`
    * probed cells per query reach the ADC join — candidate volume drops to
    * ~nprobe/IvfK of the corpus, [[ivfTopK]]'s axis) and the product
    * quantizer shrinks WHAT is scored (each candidate contributes `PqM`
    * code rows, [[pqTopK]]'s axis) — and, unlike the residual-free
    * [[simPqTopk]], the codes quantize the RESIDUAL x − c(cell(x)), the
    * refinement that makes IVFPQ's codebook spend its entropy on what the
    * coarse step missed. approx dot(q, x) decomposes exactly:
    * dot(q, c) + Σ_sub dot(q_sub, cb_sub(code)) — the first term is one
    * per-(query, probed-cell) scalar, the second `PqM` lookups in the
    * per-query distance table; the approximate norm is the reconstruction
    * norm √Σ_sub |c_sub + cb_sub|², a 512-entry (cell, sub, code) table.
    *
    * At 100 TB this is THE ANN shape: the corpus-sized frames are the
    * assignment/encode passes (linear, map-side against broadcast
    * centroids + codebook) and the probed-cell code join (equi-join on
    * cent_id, shuffle carries codes only — 4 ints per candidate, never
    * floats); every table (centroids, codebook, distance tables,
    * reconstruction norms) is broadcast; the shortlist is the
    * bounded-state [[graft.functions.TopK]] aggregate (no sort on the
    * candidate stream); exact re-rank fetches shortlist × dims floats
    * only. Deterministic end-to-end — seed-vector centroids/codebook
    * (`vec_id < IvfK` / `< PqK` residuals), round-9 + id tie-broken
    * argmins, order-independent decimal ADC sums — so the whole fused
    * pipeline is oracle-checked in SQL; SimilaritySpec measures recall
    * and verifies the cell pruning is genuine.
    *
    * Residual arithmetic is exact cross-engine: both operands are float32,
    * so `double(x_i) − double(c_i)` is exactly representable in double and
    * DuckDB's `CAST(… AS DOUBLE) − CAST(… AS DOUBLE)` reproduces it
    * bit-for-bit; all downstream dots run the same sequential double MAC
    * as [[graft.functions.DoubleVecDot]].
    */
  /** The fused-IVFPQ pipeline replayed in DuckDB, CTE-for-CTE against
    * [[ivfPqTopK]] (assignment, residuals, residual codebook, encode,
    * reconstruction norms, probes + coarse dots, distance tables, the
    * cell-pruned ADC aggregate, shortlist, exact re-rank). `panel = true`
    * swaps the default `vec_id < 10` query panel for the
    * [[sampleModulus]] residue class — the recall row's convention.
    */
  private def ivfPqOracleCtes(panel: Boolean, trained: Boolean = false): String = {
      def dot64(a: String, b: String) =
        s"list_sum(list_transform(range(1, 65), i -> " +
          s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
      val mmCte = if (panel) s"$mmSql,\n" else ""
      val prPred = if (panel) "e.vec_id % (SELECT m FROM mm) = 3"
                   else "e.vec_id < 10"
      val dtPred = if (panel) "q.vec_id % (SELECT m FROM mm) = 3"
                   else "q.vec_id < 10"
      // the codebook CTE: seed residual slices by default; with `trained`
      // the 2-round Lloyd chain ([[pqTrainCtesSql]]) is spliced in and the
      // book is cb2 — same (code, sub, cb_sub, cb_sq) shape downstream
      val cbCte =
        if (trained)
          s"""$pqTrainCtesSql,
             |cb AS (SELECT code, sub, cb2.cb AS cb_sub,
             |    list_sum(list_transform(range(1, 17), i -> cb2.cb[i] * cb2.cb[i])) AS cb_sq
             |  FROM cb2)""".stripMargin
        else
          s"""cb AS (SELECT code, sub, cb_sub,
             |    list_sum(list_transform(range(1, 17), i -> cb_sub[i] * cb_sub[i])) AS cb_sq
             |  FROM (SELECT r.vec_id AS code, sub,
             |      list_transform(range(1, 17), i -> r.res[sub*$PqSubDim+i]) AS cb_sub
             |    FROM res r, subs WHERE r.vec_id < $PqK))""".stripMargin
      s"""WITH e AS (SELECT vec_id, embedding,
         |   sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
         | FROM embeddings),
         |${mmCte}c AS (SELECT vec_id AS cent_id, embedding AS c_emb, nrm AS c_nrm
         |      FROM e WHERE vec_id < $IvfK),
         |asg AS (SELECT vec_id, embedding, cent_id, c_emb FROM (
         |   SELECT e.vec_id, e.embedding, c.cent_id, c.c_emb,
         |     ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY round(
         |       ${dot64("e.embedding", "c.c_emb")} / (e.nrm * c.c_nrm), 9)
         |       DESC, c.cent_id) AS rn
         |   FROM e CROSS JOIN c) WHERE rn = 1),
         |res AS (SELECT vec_id, cent_id,
         |   list_transform(range(1, 65),
         |     i -> CAST(embedding[i] AS DOUBLE) - CAST(c_emb[i] AS DOUBLE)) AS res
         | FROM asg),
         |subs AS (SELECT unnest(range(0, $PqM)) AS sub),
         |$cbCte,
         |codes AS (SELECT vec_id AS n_id, cent_id, sub, code FROM (
         |   SELECT r.vec_id, r.cent_id, cb.sub, cb.code,
         |     ROW_NUMBER() OVER (PARTITION BY r.vec_id, cb.sub ORDER BY round(
         |       list_sum(list_transform(range(1, 17),
         |         i -> r.res[sub*$PqSubDim+i] * r.res[sub*$PqSubDim+i]))
         |       - 2 * list_sum(list_transform(range(1, 17),
         |         i -> r.res[sub*$PqSubDim+i] * cb.cb_sub[i]))
         |       + cb.cb_sq, 9), cb.code) AS rn
         |   FROM res r CROSS JOIN cb) WHERE rn = 1),
         |rq AS (SELECT c.cent_id, cb.sub, cb.code,
         |    list_sum(list_transform(range(1, 17),
         |      i -> (CAST(c.c_emb[sub*$PqSubDim+i] AS DOUBLE) + cb.cb_sub[i])
         |         * (CAST(c.c_emb[sub*$PqSubDim+i] AS DOUBLE) + cb.cb_sub[i]))) AS recon_sq
         |  FROM c CROSS JOIN cb),
         |pr AS (SELECT q_id, q_nrm, cent_id, qc FROM (
         |   SELECT e.vec_id AS q_id, e.nrm AS q_nrm, c.cent_id,
         |     ${dot64("e.embedding", "c.c_emb")} AS qc,
         |     ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY round(
         |       ${dot64("e.embedding", "c.c_emb")} / (e.nrm * c.c_nrm), 9)
         |       DESC, c.cent_id) AS rn
         |   FROM e CROSS JOIN c WHERE $prPred) WHERE rn <= $IvfNProbe),
         |dt AS (SELECT q.vec_id AS q_id, cb.sub, cb.code,
         |    list_sum(list_transform(range(1, 17),
         |      i -> CAST(q.embedding[sub*$PqSubDim+i] AS DOUBLE) * cb.cb_sub[i])) AS part
         |  FROM e q CROSS JOIN cb WHERE $dtPred),
         |adc AS (SELECT pr.q_id, cd.n_id, pr.q_nrm, pr.qc,
         |    CAST(SUM(CAST(dt.part AS DECIMAL(38,20))) AS DOUBLE) AS rpart,
         |    CAST(SUM(CAST(rq.recon_sq AS DECIMAL(38,20))) AS DOUBLE) AS rsq
         |  FROM pr JOIN codes cd ON cd.cent_id = pr.cent_id
         |    JOIN rq ON rq.cent_id = cd.cent_id AND rq.sub = cd.sub AND rq.code = cd.code
         |    JOIN dt ON dt.q_id = pr.q_id AND dt.sub = cd.sub AND dt.code = cd.code
         |  WHERE cd.n_id != pr.q_id
         |  GROUP BY pr.q_id, cd.n_id, pr.q_nrm, pr.qc),
         |cand AS (SELECT q_id, n_id FROM (
         |   SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
         |     ORDER BY round((qc + rpart) / (q_nrm * sqrt(rsq)), 9) DESC, n_id) AS arank
         |   FROM adc) WHERE arank <= 20),
         |sc AS (SELECT cand.q_id, cand.n_id,
         |    ${dot64("q.embedding", "n.embedding")} / (q.nrm * n.nrm) AS cos
         |  FROM cand JOIN e q ON q.vec_id = cand.q_id
         |            JOIN e n ON n.vec_id = cand.n_id),
         |r AS (SELECT q_id, n_id, cos, CAST(ROW_NUMBER() OVER (
         |    PARTITION BY q_id ORDER BY round(cos, 9) DESC, n_id) AS INT) AS rank
         |  FROM sc)
         |""".stripMargin
  }

  private val simIvfPqTopk = Q(
    "sim_ivfpq_topk",
    (s, dir) => ivfPqTopK(emb(s, dir),
      Tables.load(s, dir, "embeddings")).orderBy("q_id", "rank"),
    Some(ivfPqOracleCtes(panel = false) +
      """SELECT q_id, n_id, round(cos, 6) AS cosine, rank
        |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin))

  /** Recall@5 of the FUSED IVF+PQ path against the sampled exact ground
    * truth — [[simLshRecall]]/[[simIvfRecall]]'s readout for the third ANN
    * rung, so all three candidate generators (hash buckets, probed cells,
    * probed cells × residual codes) are priced on the SAME residue-class
    * panel by the SAME metric: the fused row isolates what the 4-byte
    * residual code costs ON TOP of the cell pruning (its recall is
    * bounded above by sim_ivf_recall's). Deterministic end-to-end like
    * its parents, so the recall number is hash-checked, not asserted.
    */
  /** The residue-class query panel every declared recall row measures on
    * (the sim_pair_hist convention — [[sampleModulus]] keeps it ~256–512
    * queries at any corpus).
    */
  private def residuePanel(e: DataFrame): DataFrame =
    e.crossJoin(broadcast(sampleModulus(e)))
      .filter(col("vec_id") % col("m") === 3)
      .select(col("vec_id"), col("embedding"))

  /** The shared recall@5 readout: hits of `got` (q_id, n_id candidate
    * pairs) against the memoized exact panel ground truth — identical
    * arithmetic in every declared recall row so the family's numbers are
    * the same metric by construction.
    */
  private def panelRecallReadout(s: SparkSession, dir: String,
                                 got: DataFrame): DataFrame = {
    val exact = exactTop5(s, dir).select("q_id", "n_id")
    val hits = exact.join(got, Seq("q_id", "n_id"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    exact.agg(countDistinct(col("q_id")).as("n_queries"),
        count(lit(1)).as("n_exact_pairs"))
      .crossJoin(broadcast(hits))
      .select(col("n_queries"), col("n_exact_pairs"), col("n_hits"),
        round(col("n_hits").cast("double") /
          col("n_exact_pairs").cast("double"), 6).as("recall_at5"))
  }

  /** [[panelRecallReadout]]'s oracle twin, spliced after any CTE chain
    * ending in `r` (q_id, n_id, rank) with `e`/`mm` defined upstream —
    * byte-identical text in every panel-recall oracle.
    */
  private def recallTailSql: String =
    s""",got AS (SELECT q_id, n_id FROM r WHERE rank <= 5),
      |exp AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      |      / (a.nrm * b.nrm) AS cos
      |  FROM e a JOIN e b ON b.vec_id != a.vec_id
      |  WHERE a.vec_id % (SELECT m FROM mm) = 3),
      |ex AS (SELECT q_id, n_id FROM (
      |    SELECT q_id, n_id, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
      |      ORDER BY round(cos, 9) DESC, n_id) AS INT) AS xr FROM exp)
      |  WHERE xr <= 5),
      |h AS (SELECT count(*) AS n_hits FROM ex
      |      WHERE EXISTS (SELECT 1 FROM got
      |                    WHERE got.q_id = ex.q_id AND got.n_id = ex.n_id))
      |SELECT (SELECT count(DISTINCT q_id) FROM ex) AS n_queries,
      |  (SELECT count(*) FROM ex) AS n_exact_pairs, n_hits,
      |  round(CAST(n_hits AS DOUBLE) / (SELECT count(*) FROM ex), 6) AS recall_at5
      |FROM h""".stripMargin

  private val simIvfPqRecall = Q(
    "sim_ivfpq_recall",
    (s, dir) => {
      VectorKernels.register(s)
      val e = emb(s, dir)
      val got = ivfPqTopK(e, Tables.load(s, dir, "embeddings"),
          panel = Some(residuePanel(e)))
        .select("q_id", "n_id")
      panelRecallReadout(s, dir, got)
    },
    Some(ivfPqOracleCtes(panel = true) + recallTailSql))

  /** Recall@5 of the fused IVF+PQ path THROUGH the trained codebook — the
    * declared ladder's top rung (r16 verdict item 2): the seed-book row
    * ([[simIvfPqRecall]]) isolates what 4-byte residual codes cost BEFORE
    * Lloyd refinement (0.184 at sf0.01); this row prices the same fused
    * pipeline AFTER the 2-round training the probe scales up (trained
    * pqK=256 read 0.978 at the 200 k decade, SURVEY §6). Same residue
    * panel, same exact ground truth, same metric — and the whole
    * train → encode → probe → ADC → re-rank chain replays in one oracle
    * ([[pqTrainCtesSql]] spliced into the trained [[ivfPqOracleCtes]]).
    */
  private val simIvfPqTrainedRecall = Q(
    "sim_ivfpq_trained_recall",
    (s, dir) => {
      VectorKernels.register(s)
      val e = emb(s, dir)
      val (cb2, _) = pqTrainChain(s, dir)
      val cbArg = cb2.select(col("code"), col("sub"), col("cb").as("cb_sub"))
        .withColumn("cb_sq", dotD(col("cb_sub"), col("cb_sub")))
      val got = ivfPqTopK(e, Tables.load(s, dir, "embeddings"),
          panel = Some(residuePanel(e)), codebook = Some(cbArg))
        .select("q_id", "n_id")
      panelRecallReadout(s, dir, got)
    },
    Some(ivfPqOracleCtes(panel = true, trained = true) + recallTailSql))

  /** PQ codebook TRAINING as a declared, oracle-replayed row — the
    * machinery behind the probe-measured codebook knob (SURVEY §6 r16:
    * trained pqK=256 lifted the fused path from 0.336 to 0.978 recall at
    * 200 k). Two complete Lloyd rounds (assign → mean-update) over the
    * corpus's IVF residual slices: seeds are the first [[PqK]] vectors'
    * slices (the production default's identity, so training isolates the
    * refinement), assignment is the encode argmin (round-9 + code
    * tie-break via the bounded-state TopK at k = 1 — no window over the
    * n·PqM·PqK stream), centroid updates are ORDER-INDEPENDENT decimal
    * means (dsumFine / exact count per (sub, code, dim) — the sim_kmeans
    * stance), and an emptied cluster keeps its previous centroid so codes
    * stay dense in [0, PqK) (the packed distance-table index is
    * positional). Output: per (sub, code) the trained centroid's norm,
    * the final assignment's member count, and its mean quantization
    * error (the Lloyd objective) — the training-health readout a
    * deployment monitors before swapping a codebook in.
    *
    * Scale: each round is one broadcast-join linear pass + a
    * vocabulary-sized (PqM·PqK·dims) mean aggregate; rounds are
    * driver-bounded at 2 with `localCheckpoint` truncating the iteration
    * lineage (the graph-family iteration discipline).
    */
  /** The 2-round Lloyd chain behind [[simPqTrain]] (and consumed by
    * [[simIvfPqTrained]]): returns (trained codebook (sub, code, cb),
    * final assignment (vec_id, sub, x, code, d2)). Deterministic — see
    * [[simPqTrain]]'s scaladoc for the exact conventions.
    */
  private[graft] def pqTrainChain(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    VectorKernels.register(s)
    import graft.functions.Deterministic.dsumFine
    // every stage is a [[graft.Caches.memo]] (r17): THREE declared rows
    // consume this chain (sim_pq_train, sim_ivfpq_trained,
    // sim_ivfpq_trained_recall) and each previously re-ran the full
    // 2-round training — the r9 GD-eval lesson repeated (4 trainings per
    // pass → 1). Builders are deterministic, frames are small (slices =
    // corpus×PqM rows of 16 doubles at the declared scales; codebooks are
    // PqM·PqK rows), and memo reuse is value-identical to recomputing.
    // Bench prices the build as its own `pq_build` line item via
    // [[prewarmPqTraining]], the lsh_build convention.
    def sl = graft.Caches.memo(s, s"pq:train:sl:$dir") {
      val raw = Tables.load(s, dir, "embeddings")
      val subsE = explode(sequence(lit(0), lit(PqM - 1))).as("sub")
      ivfResiduals(emb(s, dir), raw)
        .select(col("vec_id"), subsE, col("res"))
        .select(col("vec_id"), col("sub"),
          slice(col("res"), col("sub") * PqSubDim + 1, lit(PqSubDim)).as("x"))
    }
    def cb0 = sl.filter(col("vec_id") < PqK)
      .select(col("vec_id").as("code"), col("sub"), col("x").as("cb"))
    def assign(cbN: DataFrame): DataFrame = sl
      .withColumn("x_sq", dotD(col("x"), col("x")))
      .join(broadcast(cbN.withColumn("cb_sq", dotD(col("cb"), col("cb")))), "sub")
      .select(col("vec_id"), col("sub"), col("x"), col("code"),
        (col("x_sq") - lit(2) * dotD(col("x"), col("cb")) + col("cb_sq")).as("d2"))
      .groupBy(col("vec_id"), col("sub"), col("x"))
      .agg(graft.functions.TopK.neighbors(1)(col("code"), -col("d2")).as("nb"))
      .select(col("vec_id"), col("sub"), col("x"),
        col("nb").getItem(0).getField("_1").as("code"),
        (-col("nb").getItem(0).getField("_2")).as("d2"))
    def update(asg: DataFrame, cbPrev: DataFrame): DataFrame = {
      val means = asg.select(col("sub"), col("code"), posexplode(col("x")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg((dsumFine(col("col")) / count(lit(1))).as("v"))
        .groupBy(col("sub"), col("code"))
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("v")))),
          t => t.getField("v")).as("m"))
      cbPrev.join(means, Seq("sub", "code"), "left")
        .select(col("sub"), col("code"), coalesce(col("m"), col("cb")).as("cb"))
    }
    val cb1 = graft.Caches.memo(s, s"pq:train:cb1:$dir")(update(assign(cb0), cb0))
    val a2 = graft.Caches.memo(s, s"pq:train:a2:$dir")(assign(cb1))
    val cb2 = graft.Caches.memo(s, s"pq:train:cb2:$dir")(update(a2, cb1))
    (cb2, a2)
  }

  /** The declared queries that force the [[pqTrainChain]] memos — the
    * Bench `pq_build` attribution set, mirroring [[lshMemoConsumers]].
    */
  val pqMemoConsumers: Set[String] = Set("sim_pq_train", "sim_ivfpq_trained",
    "sim_ivfpq_trained_recall")

  /** Force the shared [[pqTrainChain]] memos for `dir` and return the
    * trained book's row count — Bench's `pq_build` prewarm (the lsh_build
    * convention: the multi-second training must not land invisibly on
    * whichever consumer runs first alphabetically).
    */
  def prewarmPqTraining(s: SparkSession, dir: String): Long =
    pqTrainChain(s, dir)._1.count()

  private def pqD2Sql(x: String, cb: String) =
    s"list_sum(list_transform(range(1, 17), i -> $x[i]*$x[i]))" +
      s" - 2*list_sum(list_transform(range(1, 17), i -> $x[i]*$cb[i]))" +
      s" + list_sum(list_transform(range(1, 17), i -> $cb[i]*$cb[i]))"

  private def pqAssignSql(a: String, cbN: String) =
    s"""$a AS (SELECT vec_id, sub, x, code, d2 FROM (
       |   SELECT sl.vec_id, sl.sub, sl.x, $cbN.code,
       |     ${pqD2Sql("sl.x", s"$cbN.cb")} AS d2,
       |     ROW_NUMBER() OVER (PARTITION BY sl.vec_id, sl.sub ORDER BY
       |       round(${pqD2Sql("sl.x", s"$cbN.cb")}, 9), $cbN.code) AS rn
       |   FROM sl JOIN $cbN ON sl.sub = $cbN.sub) WHERE rn = 1)""".stripMargin

  private def pqUpdateSql(m: String, a: String, cbPrev: String, cbN: String) =
    s"""$m AS (SELECT sub, code, pos,
       |    CAST(SUM(CAST(x[pos] AS DECIMAL(38,20))) AS DOUBLE) / count(*) AS v
       |  FROM $a, unnest(range(1, 17)) AS t(pos) GROUP BY sub, code, pos),
       |$cbN AS (SELECT $cbPrev.sub, $cbPrev.code,
       |    CASE WHEN g.sub IS NULL THEN $cbPrev.cb ELSE g.arr END AS cb
       |  FROM $cbPrev LEFT JOIN (SELECT sub, code, list(v ORDER BY pos) AS arr
       |                          FROM $m GROUP BY sub, code) g
       |    ON g.sub = $cbPrev.sub AND g.code = $cbPrev.code)""".stripMargin

  /** The 2-round Lloyd training replayed in SQL — sl (residual slices) →
    * cb0 (seed book) → assign/update ×2 → cb2. Assumes `res` (per-vector
    * residual array) and `subs` CTEs upstream; spliced by both
    * [[simPqTrain]]'s oracle and the trained [[ivfPqOracleCtes]] variant.
    */
  private def pqTrainCtesSql: String =
    s"""sl AS (SELECT vec_id, sub,
       |    list_transform(range(1, 17), i -> res[sub*$PqSubDim+i]) AS x
       |  FROM res, subs),
       |cb0 AS (SELECT vec_id AS code, sub, x AS cb FROM sl WHERE vec_id < $PqK),
       |${pqAssignSql("a1", "cb0")},
       |${pqUpdateSql("m1", "a1", "cb0", "cb1")},
       |${pqAssignSql("a2", "cb1")},
       |${pqUpdateSql("m2", "a2", "cb1", "cb2")}""".stripMargin

  private val simPqTrain = Q(
    "sim_pq_train",
    (s, dir) => {
      import graft.functions.Deterministic.dsumFine
      val (cb2, a2) = pqTrainChain(s, dir)
      val stats = a2.groupBy("sub", "code")
        .agg(count(lit(1)).as("n_members"),
          round(dsumFine(col("d2")) / count(lit(1)), 6).as("mse"))
      cb2.join(stats, Seq("sub", "code"), "left")
        .select(col("sub"), col("code").cast("int").as("code"),
          coalesce(col("n_members"), lit(0L)).as("n_members"),
          round(sqrt(dotD(col("cb"), col("cb"))), 6).as("cb_norm"),
          coalesce(col("mse"), lit(0.0)).as("mse"))
        .orderBy("sub", "code")
    },
    Some {
      s"""WITH e AS (SELECT vec_id, embedding,
         |   sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
         | FROM embeddings),
         |c AS (SELECT vec_id AS cent_id, embedding AS c_emb, nrm AS c_nrm
         |      FROM e WHERE vec_id < $IvfK),
         |asg AS (SELECT vec_id, embedding, c_emb FROM (
         |   SELECT e.vec_id, e.embedding, c.c_emb,
         |     ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY round(
         |       list_sum(list_transform(range(1, 65),
         |         i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.c_emb[i] AS DOUBLE)))
         |       / (e.nrm * c.c_nrm), 9) DESC, c.cent_id) AS rn
         |   FROM e CROSS JOIN c) WHERE rn = 1),
         |res AS (SELECT vec_id,
         |   list_transform(range(1, 65),
         |     i -> CAST(embedding[i] AS DOUBLE) - CAST(c_emb[i] AS DOUBLE)) AS res
         | FROM asg),
         |subs AS (SELECT unnest(range(0, $PqM)) AS sub),
         |$pqTrainCtesSql,
         |st AS (SELECT sub, code, count(*) AS n_members,
         |    round(CAST(SUM(CAST(d2 AS DECIMAL(38,20))) AS DOUBLE) / count(*), 6) AS mse
         |  FROM a2 GROUP BY sub, code)
         |SELECT CAST(cb2.sub AS INT) AS sub, CAST(cb2.code AS INT) AS code,
         |  COALESCE(st.n_members, 0) AS n_members,
         |  round(sqrt(list_sum(list_transform(range(1, 17), i -> cb2.cb[i]*cb2.cb[i]))), 6) AS cb_norm,
         |  COALESCE(st.mse, 0.0) AS mse
         |FROM cb2 LEFT JOIN st ON st.sub = cb2.sub AND st.code = cb2.code
         |ORDER BY sub, code""".stripMargin
    })

  /** The fused IVF+PQ query THROUGH the trained codebook — the capstone
    * of the production path: [[pqTrainChain]]'s 2-round Lloyd book swaps
    * into [[ivfPqTopK]]'s `codebook` socket and the ENTIRE train → encode
    * → probe → ADC → re-rank chain replays in one oracle (the
    * [[simPqTrain]] training CTEs spliced into the [[simIvfPqTopk]] query
    * CTEs). Same panel/schema as the flat row, so the two are directly
    * comparable: the delta between their answer sets is exactly what
    * Lloyd refinement buys at this scale — measured at the decades in
    * SURVEY §6 (trained pqK=256 lifts 200 k recall 0.336 → 0.978; this
    * row pins the pqK=16 machinery the probe scales up).
    */
  private val simIvfPqTrained = Q(
    "sim_ivfpq_trained",
    (s, dir) => {
      val (cb2, _) = pqTrainChain(s, dir)
      val cbArg = cb2.select(col("code"), col("sub"), col("cb").as("cb_sub"))
        .withColumn("cb_sq", dotD(col("cb_sub"), col("cb_sub")))
      ivfPqTopK(emb(s, dir), Tables.load(s, dir, "embeddings"),
        codebook = Some(cbArg)).orderBy("q_id", "rank")
    },
    Some(ivfPqOracleCtes(panel = false, trained = true) +
      """SELECT q_id, n_id, round(cos, 6) AS cosine, rank
        |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin))

  /** The PQ ENCODE stage as a frame: (n_id, cent_id, sub, code) — every
    * corpus vector's [[PqM]] residual codes against the broadcast-frame
    * codebook `cb` ((sub, code, cb_sub, cb_sq), codes dense in [0, pqK)).
    *
    * `encodeKernel = true` (production): the codebook is collected to a
    * plan-constant array and ALL codes compute in one
    * [[graft.functions.PqEncodeCodes]] call per vector — the r18 answer
    * to the r17-named 20 M knob (the dataflow form's N·PqM·pqK joined
    * rows + N·PqM-group argmin aggregate were the trained-256 build's
    * dominant cost). `false` keeps the r17 dataflow shape — the A/B rung
    * [[graft.PqEncodeProbe]] prices; both paths are value-identical
    * (same d2 arithmetic order, same round-9 + smallest-code tie), pinned
    * by PqEncodeSpec and every ivfpq oracle row.
    */
  private[graft] def pqCodesFrame(e: DataFrame, raw: DataFrame, cb: DataFrame,
                                  pqK: Int, encodeKernel: Boolean,
                                  ivfK: Int = IvfK): DataFrame = {
    import graft.functions.VectorKernels.ddot
    def residual(v: DataFrame): DataFrame = ivfResiduals(v, raw, ivfK)
    val subs = explode(sequence(lit(0), lit(PqM - 1))).as("sub")
    def subSlice(a: Column) = slice(a, col("sub") * PqSubDim + 1, lit(PqSubDim))
    if (encodeKernel) {
      pqCodesArray(e, raw, cb, pqK, ivfK)
        .select(col("n_id"), col("cent_id"), posexplode(col("codes")))
        .toDF("n_id", "cent_id", "sub", "code")
    } else residual(e)
      .select(col("vec_id").as("n_id"), col("cent_id"), subs, col("res"))
      .select(col("n_id"), col("cent_id"), col("sub"), subSlice(col("res")).as("x_sub"))
      // hoist |x_sub|² above the codebook join: it is constant per
      // (vector, subspace) and Catalyst will not lift it out of the
      // per-code expression on its own — same value, PqK× fewer dots
      .withColumn("x_sq", ddot(col("x_sub"), col("x_sub")))
      .join(cb, "sub")
      .select(col("n_id"), col("cent_id"), col("sub"), col("code"),
        (col("x_sq") - lit(2) * ddot(col("x_sub"), col("cb_sub"))
          + col("cb_sq")).as("d2"))
      .groupBy(col("n_id"), col("cent_id"), col("sub"))
      .agg(graft.functions.TopK.neighbors(1)(col("code"), -col("d2")).as("nb"))
      .select(col("n_id"), col("cent_id"), col("sub"),
        col("nb").getItem(0).getField("_1").as("code"))
  }

  /** The kernel encode as an ARRAY frame: (n_id, cent_id, codes) with
    * codes(sub) = the vector's PqM codes in subspace order — the shared
    * substrate of [[pqCodesFrame]] (posexplode for the row form) and the
    * r19 packed ADC layout ([[pqPackedFrame]], no explode at all).
    * Collects the codebook to a plan constant with the slot-uniqueness
    * require (r18 ADVICE): a positional hole or duplicate would
    * mis-encode silently.
    */
  private[graft] def pqCodesArray(e: DataFrame, raw: DataFrame, cb: DataFrame,
                                  pqK: Int, ivfK: Int = IvfK): DataFrame = {
    val cbRows = cb.select(col("sub"), col("code"), col("cb_sub"), col("cb_sq"))
      .collect()
    require(cbRows.length == PqM * pqK,
      s"[ivfpq] sparse codebook: expected ${PqM * pqK} entries, got ${cbRows.length}")
    val cbFlat = new Array[Double](PqM * pqK * PqSubDim)
    val cbSq = new Array[Double](PqM * pqK)
    val seen = new Array[Boolean](PqM * pqK)
    cbRows.foreach { r =>
      val slot = r.getInt(0) * pqK + r.getLong(1).toInt
      require(slot >= 0 && slot < PqM * pqK && !seen(slot),
        s"[ivfpq] codebook slot (sub=${r.getInt(0)}, code=${r.getLong(1)}) " +
          "out of range or written twice — a positional hole would mis-encode")
      seen(slot) = true
      val v = r.getSeq[Double](2)
      var i = 0
      while (i < PqSubDim) { cbFlat(slot * PqSubDim + i) = v(i); i += 1 }
      cbSq(slot) = r.getDouble(3)
    }
    ivfResiduals(e, raw, ivfK)
      .select(col("vec_id").as("n_id"), col("cent_id"),
        org.apache.spark.sql.GraftBridge.column(
          graft.functions.PqEncodeCodes(
            org.apache.spark.sql.GraftBridge.expr(col("res")),
            scala.collection.immutable.ArraySeq.unsafeWrapArray(cbFlat),
            scala.collection.immutable.ArraySeq.unsafeWrapArray(cbSq),
            PqM, pqK, PqSubDim)).as("codes"))
  }

  /** The packed per-vector ADC layout (n_id, cent_id, cs, rsq) in ONE
    * shuffle-free map pass (r19 pack fusion). The r16–r18 form exploded
    * the kernel's code array to N·PqM rows, joined the broadcast
    * recon-norm table, and re-grouped per vector (sort_array collect_list
    * + decimal-sum ObjectHashAggregate — a full-corpus shuffle keyed on
    * (n_id, cent_id)). Here `cs` is a `transform` over the code array
    * (codes are emitted in subspace order, so the struct array is already
    * the sorted (sub, code) list the collect_list produced) and `rsq` is
    * the [[graft.functions.PqPackRsq]] kernel against the recon table as
    * a plan constant — each slot's scale-20 HALF_UP decimal precomputed
    * from the same doubles the dataflow's `dsumFine` cast, summed with
    * the same exact adds (digit-identical; Round19Spec pins full value
    * equality against the dataflow rung). Slot-uniqueness require on the
    * collect, the [[pqCodesArray]] convention.
    */
  private[graft] def pqPackedFrame(e: DataFrame, raw: DataFrame, cb: DataFrame,
                                   reconSq: DataFrame, pqK: Int,
                                   ivfK: Int = IvfK): DataFrame = {
    val recRows = reconSq
      .select(col("cent_id"), col("sub"), col("code"), col("recon_sq"))
      .collect()
    require(recRows.length == ivfK * PqM * pqK,
      s"[ivfpq] sparse recon table: expected ${ivfK * PqM * pqK} entries, " +
        s"got ${recRows.length}")
    val recFlat = new Array[Double](ivfK * PqM * pqK)
    val seen = new Array[Boolean](ivfK * PqM * pqK)
    recRows.foreach { r =>
      val slot = (r.getLong(0).toInt * PqM + r.getInt(1)) * pqK + r.getLong(2).toInt
      require(slot >= 0 && slot < recFlat.length && !seen(slot),
        s"[ivfpq] recon slot (cent=${r.getLong(0)}, sub=${r.getInt(1)}, " +
          s"code=${r.getLong(2)}) out of range or written twice")
      seen(slot) = true
      recFlat(slot) = r.getDouble(3)
    }
    pqCodesArray(e, raw, cb, pqK, ivfK)
      .select(col("n_id"), col("cent_id"),
        transform(col("codes"),
          (c, i) => struct(i.cast("int").as("sub"), c.as("code"))).as("cs"),
        org.apache.spark.sql.GraftBridge.column(
          graft.functions.PqPackRsq(
            org.apache.spark.sql.GraftBridge.expr(col("cent_id")),
            org.apache.spark.sql.GraftBridge.expr(col("codes")),
            scala.collection.immutable.ArraySeq.unsafeWrapArray(recFlat),
            PqM, pqK)).as("rsq"))
  }

  /** Coarse-assign `v`'s vectors to their nearest of [[IvfK]] seed cells
    * (read from `raw`) and emit per-vector residuals in double — exact:
    * both operands are float32, the difference is exactly representable.
    * Shared by [[ivfPqTopK]] (encode + codebook) and the
    * [[graft.LshScaleProbe]] ivfpq mode's codebook training.
    */
  private[graft] def ivfResiduals(v: DataFrame, raw: DataFrame,
                                  ivfK: Int = IvfK,
                                  assignKernel: Boolean = true): DataFrame = {
    VectorKernels.register(v.sparkSession)
    val cents = broadcast(raw.filter(col("vec_id") < ivfK)
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"),
        l2norm(col("embedding")).as("c_nrm")))
    val assigned =
      if (assignKernel) {
        // r19: the stage probe named the coarse assign the trained build's
        // dominant cost (the dataflow below is N·ivfK crossJoin rows + an
        // ObjectHashAggregate whose group key is the 64-float embedding +
        // a full-corpus shuffle + a re-join — for ivfK·dim MACs/vector).
        // [[graft.functions.IvfAssignCell]] runs the identical cos
        // arithmetic per row against the centroids as a plan constant
        // (collected ONCE from the same cents frame, c_nrm the very
        // doubles the dataflow multiplied by), keeping the corpus pass
        // shuffle-free. Dense-slot require = the PqEncodeCodes collect
        // convention: a hole or duplicate would mis-assign silently.
        val dim = PqM * PqSubDim
        val centRows = cents.select(col("cent_id"), col("c_emb"), col("c_nrm"))
          .collect()
        require(centRows.length == ivfK,
          s"[ivf] expected $ivfK centroid rows (vec_id dense in [0, $ivfK)), " +
            s"got ${centRows.length}")
        val centFlat = new Array[Float](ivfK * dim)
        val centNrm = new Array[Double](ivfK)
        val seen = new Array[Boolean](ivfK)
        centRows.foreach { r =>
          val slot = r.getLong(0).toInt
          require(slot >= 0 && slot < ivfK && !seen(slot),
            s"[ivf] centroid slot $slot out of range or written twice")
          seen(slot) = true
          val e = r.getSeq[Float](1)
          var i = 0
          while (i < dim) { centFlat(slot * dim + i) = e(i); i += 1 }
          centNrm(slot) = r.getDouble(2)
        }
        v.select(col("vec_id"), col("embedding"),
          org.apache.spark.sql.GraftBridge.column(
            graft.functions.IvfAssignCell(
              org.apache.spark.sql.GraftBridge.expr(col("embedding")),
              scala.collection.immutable.ArraySeq.unsafeWrapArray(centFlat),
              scala.collection.immutable.ArraySeq.unsafeWrapArray(centNrm),
              ivfK, dim)).as("cent_id"))
      } else
        v.select(col("vec_id"), col("embedding"), l2norm(col("embedding")).as("nrm"))
          .crossJoin(broadcast(cents))
          .select(col("vec_id"), col("embedding"), col("cent_id"),
            (dot(col("embedding"), col("c_emb")) / (col("nrm") * col("c_nrm"))).as("cos_c"))
          .groupBy(col("vec_id"), col("embedding"))
          .agg(graft.functions.TopK.neighbors(1)(col("cent_id"), col("cos_c")).as("nb"))
          .select(col("vec_id"), col("embedding"),
            col("nb").getItem(0).getField("_1").as("cent_id"))
    assigned
      .join(broadcast(cents.select(col("cent_id"), col("c_emb"))), "cent_id")
      .select(col("vec_id"), col("cent_id"),
        zip_with(col("embedding"), col("c_emb"),
          (x, c) => x.cast("double") - c.cast("double")).as("res"))
  }

  /** `e`: spread full vector set; `raw`: unspread scan for the pushed-down
    * centroid/codebook/query reads. `panel`: optional (vec_id, embedding)
    * query frame replacing the default `vec_id < 10` panel — the recall
    * row passes the residue-class sample here so the fused path is priced
    * on the same panel as the other ANN rungs. `shortlist`: ADC
    * candidates kept per query before the exact re-rank (default 4·k,
    * the declared rows' oracle-pinned width) — THE recall knob at scale:
    * a fixed shortlist over a growing corpus is a shrinking fraction of
    * each probed cell, so recall decays by construction (measured ladder
    * in SURVEY §6: 0.206 → 0.051 → 0.024 clone-recall at 20 k → 200 k →
    * 2 M with the default 20); deployments scale it ∝ corpus (the
    * [[LshScaleProbe]] ivfpq mode prices the trade). `codebook`/`pqK`:
    * swap in a trained residual codebook — (code, sub, cb_sub, cb_sq)
    * with codes dense in [0, pqK) — e.g. [[pqTrainChain]]'s output (the
    * `sim_ivfpq_trained` row) or the probe's k-means variant; the default
    * is the seed-residual book the flat rows pin in their oracles.
    */
  def ivfPqTopK(e: DataFrame, raw: DataFrame, k: Int = 5,
                panel: Option[DataFrame] = None,
                shortlist: Int = -1,
                codebook: Option[DataFrame] = None,
                pqK: Int = PqK,
                nprobe: Int = IvfNProbe,
                encodeKernel: Boolean = true,
                ivfK: Int = IvfK): DataFrame = {
    val shortlistN = if (shortlist > 0) shortlist else 4 * k
    VectorKernels.register(e.sparkSession)
    import graft.functions.Deterministic.dsumFine
    val qv = panel.getOrElse(raw.filter(col("vec_id") < 10))
      .select(col("vec_id"), col("embedding"))
    // `ivfK` is the cell-count axis (the r17 organic ladder priced nprobe
    // at the rig's 8 cells; production cell counts need both knobs) — the
    // declared rows keep the oracle-pinned [[IvfK]] default
    val cents = broadcast(raw.filter(col("vec_id") < ivfK)
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"),
        l2norm(col("embedding")).as("c_nrm")))
    def residual(v: DataFrame): DataFrame = ivfResiduals(v, raw, ivfK)
    val subs = explode(sequence(lit(0), lit(PqM - 1))).as("sub")
    def subSlice(a: Column) = slice(a, col("sub") * PqSubDim + 1, lit(PqSubDim))
    // residual codebook: by default the first pqK vectors' residual
    // slices (PqM×pqK rows); `codebook` overrides with a trained one —
    // (code, sub, cb_sub, cb_sq) with codes dense in [0, pqK) — the
    // [[graft.LshScaleProbe]] ivfpq mode's k-means-refined variant (the
    // declared rows keep the seed default, oracle-pinned)
    val cb = broadcast(codebook.getOrElse(
      residual(raw.filter(col("vec_id") < pqK))
        .select(col("vec_id").as("code"), subs, col("res"))
        .select(col("code"), col("sub"), subSlice(col("res")).as("cb_sub"))
        .withColumn("cb_sq", dotD(col("cb_sub"), col("cb_sub")))))
    // encode: argmin L2² of (residual slice − codebook slice) per
    // (vector, subspace). Production path: ONE [[graft.functions.
    // PqEncodeCodes]] kernel call per vector over the codebook collected
    // as a plan constant — the dataflow form materialized N·PqM·pqK
    // joined rows plus an N·PqM-group aggregate whose row-at-a-time
    // overhead dominated the 20 M trained-256 build (r17 verdict item 5);
    // the kernel runs the identical arithmetic (same d2 order, same
    // round-9 + code tie convention) in a tight loop nest, value-pinned
    // by PqEncodeSpec and every ivfpq oracle row. `encodeKernel = false`
    // keeps the dataflow shape — the A/B rung LshScaleProbe prices. The
    // encode feeds `nvec` below (r19: fused with the pack on the kernel
    // path — see [[pqPackedFrame]]).
    // reconstruction-norm table: |c_sub + cb_sub|² per (cell, sub, code) —
    // IvfK·PqM·PqK = 512 rows, broadcast
    val reconSq = broadcast(cents.select(col("cent_id"), subs, col("c_emb"))
      .select(col("cent_id"), col("sub"),
        transform(subSlice(col("c_emb")), x => x.cast("double")).as("c_sub"))
      .join(cb, "sub")
      .withColumn("recon_sub", zip_with(col("c_sub"), col("cb_sub"), (a, b) => a + b))
      .select(col("cent_id"), col("sub"), col("code"),
        dotD(col("recon_sub"), col("recon_sub")).as("recon_sq")))
    // query side: nprobe nearest cells + the per-(query, cell) coarse dot
    val wProbe = Window.partitionBy("q_id")
      .orderBy(round(col("cos_c"), 9).desc, col("cent_id"))
    val probes = broadcast(qv
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        l2norm(col("embedding")).as("q_nrm"))
      .crossJoin(broadcast(cents))
      .withColumn("qc", dot(col("q_emb"), col("c_emb")))
      .withColumn("cos_c", col("qc") / (col("q_nrm") * col("c_nrm")))
      .withColumn("rn", row_number().over(wProbe))
      // `nprobe` is the organic-recall knob on the cell axis (the probed
      // fraction bounds what ANY shortlist can recover — measured in the
      // r17 organic ladder); the declared rows keep the oracle-pinned
      // IvfNProbe default
      .filter(col("rn") <= nprobe)
      .select(col("q_id"), col("q_nrm"), col("cent_id"), col("qc")))
    // per-query residual distance table, packed to ONE 64-double array per
    // query ordered by sub·PqK + code (dense: dt is qv × the full
    // codebook), so a pair's PqM lookups are array indexing, not a join
    // parts are pre-cast to scale-20 decimals HERE, once per query (64
    // entries), not inside the ADC fold (once per candidate × PqM — a
    // BigDecimal construction through Double.toString, ~2 G calls at the
    // 20 M geometry): the same HALF_UP 20-digit round of the same double,
    // so every downstream digit is unchanged (r19, stage-probe measured)
    val dtArr = broadcast(qv
      .select(col("vec_id").as("q_id"), subs, col("embedding"))
      .select(col("q_id"), col("sub"),
        transform(subSlice(col("embedding")), x => x.cast("double")).as("q_sub"))
      .join(cb, "sub")
      .select(col("q_id"), (col("sub") * pqK + col("code")).as("i"),
        dotD(col("q_sub"), col("cb_sub")).as("part"))
      .groupBy(col("q_id"))
      .agg(transform(sort_array(collect_list(struct(col("i"), col("part")))),
        s => s.getField("part")
          .cast(org.apache.spark.sql.types.DecimalType(33, 20))).as("dts"))
      // the ADC fold indexes dts POSITIONALLY at sub·pqK + code: a sparse
      // caller-supplied codebook (a hole in [0, pqK) for some sub) would
      // shift every later lookup and mis-score silently — fail loudly
      // instead (the seed and Lloyd-trained books are dense by
      // construction, so declared rows never take this branch)
      .select(col("q_id"),
        when(size(col("dts")) === lit(PqM * pqK), col("dts"))
          .otherwise(raise_error(concat(
            lit(s"[ivfpq] sparse codebook: expected ${PqM * pqK} " +
              "distance-table entries per query, got "),
            size(col("dts")).cast("string")))).as("dts")))
    // pack the PqM codes into ONE row per vector, folding the
    // reconstruction norm² in — the production ADC scan layout (codes
    // contiguous per vector): the candidate stream is 1 row per
    // (query, candidate) instead of PqM, and the per-pair ADC sum is a
    // fixed-order PqM-term decimal expression instead of a
    // panel×candidates hash aggregate (r16, measured: that aggregate was
    // the recall row's dominant cost). r19: on the kernel path the pack
    // itself is FUSED ([[pqPackedFrame]]) — no explode, no recon join, no
    // (n_id, cent_id) re-group shuffle; the corpus build pipeline is one
    // map pass. The dataflow A/B rung keeps the r16 join + grouped
    // decimal sum (value-identical both ways — decimal addition is exact).
    val nvec =
      if (encodeKernel) pqPackedFrame(e, raw, cb, reconSq, pqK, ivfK)
      else pqCodesFrame(e, raw, cb, pqK, encodeKernel = false, ivfK)
        .join(reconSq, Seq("cent_id", "sub", "code"))
        .groupBy(col("n_id"), col("cent_id"))
        .agg(sort_array(collect_list(struct(col("sub"), col("code")))).as("cs"),
          dsumFine(col("recon_sq")).as("rsq"))
    // exact fixed-point ADC sum, FLAT (r19): a PqM-term decimal add chain
    // over the pre-cast table — (33,20)+(33,20)=(34,20), +(33,20)=(35,20),
    // +(33,20)=(36,20): scale stays 20 and precision headroom only grows,
    // so NO step ever rounds and the chain equals the grouped decimal sum
    // it descends from digit-for-digit (|sum| < 10¹³ — parts are O(1)
    // subspace dots). The r16–r18 form was an `aggregate()` higher-order
    // fold: HOFs are CodegenFallback, so EVERY candidate row dropped out
    // of whole-stage codegen and paid lambda dispatch + a per-element
    // double→decimal conversion; the flat chain is plain codegen'd
    // expressions (stage-probe A/B in SURVEY §6 r19). Size-guarded the
    // dtArr way: the fold summed whatever was present, the flat form
    // indexes PqM fixed positions — a short cs would silently drop terms,
    // so fail loudly instead (dense books always pack exactly PqM).
    def rpart(cs: Column, dts: Column): Column = {
      val sum = (0 until PqM).map { j =>
        val c = element_at(cs, j + 1)
        element_at(dts,
          (c.getField("sub") * pqK + c.getField("code") + 1).cast("int"))
      }.reduce(_ + _)
      when(size(cs) === lit(PqM), sum.cast("double"))
        .otherwise(raise_error(concat(
          lit(s"[ivfpq] packed code row with size(cs) != $PqM: "),
          size(cs).cast("string"))))
    }
    // the fusion: probed-cell equi-join prunes candidates (IVF), the
    // packed codes score against the broadcast per-query table (PQ ADC) —
    // shuffle carries codes, never floats; shortlist via the bounded-state
    // TopK aggregate
    val cand = probes.join(nvec, "cent_id")
      .filter(col("n_id") =!= col("q_id"))
      .join(dtArr, "q_id")
      .select(col("q_id"), col("n_id"),
        ((col("qc") + rpart(col("cs"), col("dts"))) /
          (col("q_nrm") * sqrt(col("rsq")))).as("cos_adc"))
      .groupBy(col("q_id"))
      // wide probe shortlists take the flat-scratch aggregator (amortized
      // O(log k) accepts); declared rows (k*4 = 20) keep the list form
      .agg((if (shortlistN > 64)
          graft.functions.TopK.neighborsWide(shortlistN)(col("n_id"), col("cos_adc"))
        else
          graft.functions.TopK.neighbors(shortlistN)(col("n_id"), col("cos_adc"))).as("nb"))
      .select(col("q_id"), explode(col("nb")).as("x"))
      .select(col("q_id"), col("x._1").as("n_id"))
    // exact re-rank of the shortlist only
    val nf = e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
      l2norm(col("embedding")).as("n_nrm"))
    val qf = broadcast(qv
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        l2norm(col("embedding")).as("q_nrm")))
    val wExact = Window.partitionBy("q_id")
      .orderBy(round(col("cos"), 9).desc, col("n_id"))
    cand.join(nf, "n_id").join(qf, "q_id")
      .withColumn("cos",
        dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), round(col("cos"), 6).as("cosine"), col("rank"))
  }

  /** Binary-signature (1 bit/dim) Hamming top-k — the last rung of the
    * compression ladder after SQ8 (8 bits/dim, [[simQuantizedTopk]]) and
    * PQ (4 codes/vector, [[simPqTopk]]): each vector compresses to 64
    * sign bits against the seed-42 hyperplanes (the SAME first-64-planes
    * sign machinery as LSH — one [[graft.functions.LshAutoBuckets]] kernel
    * call at 4 bands × 16 bits), and candidate scoring is XOR + popcount
    * over four packed 16-bit words: no float ever moves until the exact
    * re-rank. Where banded LSH ([[lshTopKAuto]]) prunes by bucket
    * EQUALITY (recall from OR-ed bands), the Hamming scan RANKS by
    * signature distance — a complete ordering at 64× compression, the
    * symmetric-sketch shape (SimHash for embeddings) used when the
    * candidate generator must return a fixed-size shortlist with no
    * occupancy variance. Top `4k` by (hamming asc, n_id) via the
    * bounded-state [[graft.functions.TopK]] aggregate (score = −hamming:
    * integer-exact at 9 dp), then exact float re-rank of the shortlist.
    *
    * Scale: the signature build is linear map-side kernel work; the scan
    * streams panel × corpus sign-words through compare-and-insert with
    * O(panel·k) state — at 10⁹ vectors the same signatures feed a banded
    * multi-index (the LSH path) so the scan side prunes too; this
    * operator prices the exhaustive-rank variant. Deterministic
    * (seed-42 planes, ≥ 0 sign convention, integer Hamming, round-9 + id
    * tie-breaks), so the full pipeline — signatures included — is
    * oracle-checked in SQL; SimilaritySpec measures recall.
    */
  private val HamBands = 4   // 4 packed 16-bit sign words …
  private val HamBits = 16   // … = 64 sign bits, 1 bit per dimension

  /** The binary-rung pipeline replayed in DuckDB (signatures from the 64
    * plane literals, per-band popcount Hamming, shortlist, exact
    * re-rank); `panel = true` swaps the `vec_id < 10` query side for the
    * [[sampleModulus]] residue class — the recall row's convention.
    */
  private def hammingOracleCtes(panel: Boolean): String = {
    val mmCte = if (panel) s"$mmSql,\n" else ""
    val qPred = if (panel) "a.vec_id % (SELECT m FROM mm) = 3"
                else "a.vec_id < 10"
    s"""WITH e AS (SELECT vec_id, embedding,
       |   sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
       | FROM embeddings),
       |${mmCte}pl(plane, coef) AS (VALUES ${planeValuesSql(HamBands * HamBits)}),
       |bits AS (SELECT e.vec_id, pl.plane,
       |    CASE WHEN list_sum(list_transform(range(1,65),
       |           i -> CAST(e.embedding[i] AS DOUBLE) * coef[i])) >= 0
       |         THEN CAST(power(2, plane % $HamBits) AS BIGINT) ELSE 0 END AS bit
       |  FROM e CROSS JOIN pl),
       |bk AS (SELECT vec_id, CAST(plane // $HamBits AS INT) AS band,
       |       CAST(sum(bit) AS BIGINT) AS bucket
       |       FROM bits GROUP BY vec_id, plane // $HamBits),
       |hm AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
       |    CAST(SUM(bit_count(xor(a.bucket, b.bucket))) AS BIGINT) AS ham
       |  FROM bk a JOIN bk b ON a.band = b.band AND a.vec_id != b.vec_id
       |  WHERE $qPred
       |  GROUP BY a.vec_id, b.vec_id),
       |cand AS (SELECT q_id, n_id FROM (
       |   SELECT q_id, n_id, ROW_NUMBER() OVER (PARTITION BY q_id
       |     ORDER BY ham, n_id) AS arank FROM hm) WHERE arank <= 20),
       |sc AS (SELECT cand.q_id, cand.n_id,
       |    list_sum(list_transform(range(1, 65),
       |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)))
       |      / (q.nrm * n.nrm) AS cos
       |  FROM cand JOIN e q ON q.vec_id = cand.q_id
       |            JOIN e n ON n.vec_id = cand.n_id),
       |r AS (SELECT q_id, n_id, cos, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY q_id ORDER BY round(cos, 9) DESC, n_id) AS INT) AS rank
       |  FROM sc)
       |""".stripMargin
  }

  private val simHammingTopk = Q(
    "sim_hamming_topk",
    (s, dir) => hammingTopK(emb(s, dir),
      Tables.load(s, dir, "embeddings")).orderBy("q_id", "rank"),
    Some(hammingOracleCtes(panel = false) +
      """SELECT q_id, n_id, round(cos, 6) AS cosine, rank
        |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin))

  /** Recall@5 of the binary Hamming rung against the sampled exact ground
    * truth — the fourth member of the declared recall family
    * ([[simLshRecall]]/[[simIvfRecall]]/[[simIvfPqRecall]]): all four
    * candidate generators (hash buckets, probed cells, probed cells ×
    * residual codes, complete 64-bit sign ordering) priced on the SAME
    * residue panel by the SAME metric. The Hamming rung's number bounds
    * what any 64-bit-signature scheme can reach — banded LSH prunes the
    * same signatures by bucket equality, so this row is its
    * recall-per-sketch ceiling at the fixed 20-candidate width.
    */
  private val simHammingRecall = Q(
    "sim_hamming_recall",
    (s, dir) => {
      VectorKernels.register(s)
      val e = emb(s, dir)
      val got = hammingTopK(e, Tables.load(s, dir, "embeddings"),
          panel = Some(residuePanel(e)))
        .select("q_id", "n_id")
      panelRecallReadout(s, dir, got)
    },
    Some(hammingOracleCtes(panel = true) + recallTailSql))

  /** The streaming semantic near-dup suppressor's decision function as a
    * DECLARED, oracle-replayed row (r16 verdict item 3):
    * [[graft.streaming.SemanticDedupStream]] is deterministic given
    * arrival order — sign-bucket blocking, (ts, vec_id)-sorted folds,
    * event-time TTL — so the same `suppress` function run in one batch
    * pass over a deterministic arrival schedule is exactly replayable as
    * a per-bucket sequential recursion in SQL (a recursive CTE carrying
    * each bucket's admitted-entry list — one working row per bucket, the
    * incremental-dedup row's arrival-rank trick generalized to stateful
    * near-match). SemanticDedupStreamSpec asserts the true streaming
    * execution (MemoryStream micro-batches) emits decisions identical to
    * this batch replay on the same input, closing the loop: oracle ⇔
    * batch fold ⇔ streaming operator.
    *
    * Arrival schedule (both decision branches + the TTL exercised every
    * run): every vector arrives at t₀ + (vec_id mod 64)·7 s, then
    * re-arrives under a shifted id — even ids ttl/2 later (inside TTL ⇒
    * suppressed at Hamming 0 against the original), odd ids 2·ttl later
    * (original expired ⇒ re-admitted).
    */
  private[graft] val SemReplayTtlMs = 600000L

  /** Re-arrival id offset: 2⁶² sits provably ABOVE every id this engine
    * can mint — source vec_ids are table row numbers and [[graft.ScaleUp]]
    * replicas live at rep·2⁴⁰ + id < 2⁶² for any feasible rep — so a
    * shifted id can never alias a real vec_id (the r17-ADVICE hazard: at
    * the old +1 000 000 offset a ≥1 M-row corpus would collide, producing
    * duplicate vec_id rows, a non-total ORDER BY and wrong dup_of edges).
    * The plan still guards the assumption loudly rather than trusting it.
    */
  private[graft] val SemReplayIdOffset = 1L << 62

  private[graft] def semReplayArrivals(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    def baseMs = lit(3600000L) + pmod(col("vec_id"), lit(64L)) * lit(7000L)
    val base = e.select(col("vec_id"),
      timestamp_millis(baseMs).as("ts"), col("embedding"))
    // in-plan id-space guard (the ScaleUp raise_error convention): any
    // corpus whose ids escape [0, 2⁶²) fails the build instead of
    // silently aliasing re-arrivals onto real vectors
    val guarded = when(col("vec_id") >= 0 && col("vec_id") < SemReplayIdOffset,
      col("vec_id")).otherwise(raise_error(concat(
        lit("[sem_replay] vec_id outside [0, 2^62): "), col("vec_id").cast("string"))))
    val re = e.select((guarded + SemReplayIdOffset).as("vec_id"),
      timestamp_millis(baseMs +
        when(pmod(col("vec_id"), lit(2L)) === 0, lit(SemReplayTtlMs / 2))
          .otherwise(lit(SemReplayTtlMs * 2))).as("ts"),
      col("embedding"))
    base.unionByName(re)
  }

  private val dedupSemanticStreamReplay = Q(
    "dedup_semantic_stream_replay",
    (s, dir) => {
      import graft.streaming.SemanticDedupStream
      SemanticDedupStream.suppress(
          SemanticDedupStream.signatures(semReplayArrivals(s, dir)),
          SemReplayTtlMs, streaming = false)
        .toDF()
        .orderBy("vec_id")
    },
    Some {
      // the recursion: one working row per (bucket, iteration) carrying
      // the bucket's live admitted-entry list `st` plus the decision made
      // at that arrival rank; the inner join on rnk = it + 1 terminates
      // each bucket when its arrivals are exhausted. Struct key order
      // ('h' then 'v') makes list_sort the minBy((hamming, vec_id))
      // tie-break; e.x > n.ms is the event-time TTL prune the operator
      // applies before matching.
      s"""WITH RECURSIVE
         |arr AS (
         |  SELECT vec_id, 3600000 + (vec_id % 64) * 7000 AS ms, embedding
         |  FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + ${SemReplayIdOffset},
         |         3600000 + (vec_id % 64) * 7000
         |           + CASE WHEN vec_id % 2 = 0 THEN ${SemReplayTtlMs / 2}
         |             ELSE ${SemReplayTtlMs * 2} END,
         |         embedding
         |  FROM embeddings),
         |pl(plane, coef) AS (VALUES ${planeValuesSql(HamBands * HamBits)}),
         |bits AS (SELECT a.vec_id, a.ms, pl.plane,
         |    CASE WHEN list_sum(list_transform(range(1,65),
         |           i -> CAST(a.embedding[i] AS DOUBLE) * coef[i])) >= 0
         |         THEN CAST(power(2, plane % $HamBits) AS BIGINT) ELSE 0 END AS bit
         |  FROM arr a CROSS JOIN pl),
         |sg AS (SELECT vec_id, ms, CAST(plane // $HamBits AS INT) AS band,
         |       CAST(sum(bit) AS BIGINT) AS w
         |       FROM bits GROUP BY vec_id, ms, plane // $HamBits),
         |sig AS (SELECT vec_id, ms,
         |         max(CASE WHEN band=0 THEN w END) AS s0,
         |         max(CASE WHEN band=1 THEN w END) AS s1,
         |         max(CASE WHEN band=2 THEN w END) AS s2,
         |         max(CASE WHEN band=3 THEN w END) AS s3
         |        FROM sg GROUP BY vec_id, ms),
         |rk AS (SELECT *, CAST(ROW_NUMBER() OVER (
         |         PARTITION BY s0 ORDER BY ms, vec_id) AS INT) AS rnk
         |       FROM sig),
         |dec AS (
         |  SELECT 1 AS it, s0, vec_id, ms, FALSE AS is_dup,
         |         CAST(-1 AS BIGINT) AS dup_of, -1 AS ham,
         |         [{'v': vec_id, 'x': ms + $SemReplayTtlMs,
         |           'a': s1, 'b': s2, 'c': s3}] AS st
         |  FROM rk WHERE rnk = 1
         |  UNION ALL
         |  SELECT p.it + 1, p.s0, n.vec_id, n.ms,
         |         L.best.v IS NOT NULL AS is_dup,
         |         COALESCE(L.best.v, -1) AS dup_of,
         |         COALESCE(L.best.h, -1) AS ham,
         |         CASE WHEN L.best.v IS NULL
         |              THEN list_append(L.live, {'v': n.vec_id,
         |                'x': n.ms + $SemReplayTtlMs,
         |                'a': n.s1, 'b': n.s2, 'c': n.s3})
         |              ELSE L.live END AS st
         |  FROM dec p
         |  JOIN rk n ON n.s0 = p.s0 AND n.rnk = p.it + 1,
         |  LATERAL (SELECT list_filter(p.st, e -> e.x > n.ms) AS live) L1,
         |  LATERAL (SELECT L1.live AS live, list_sort(list_transform(
         |        list_filter(L1.live, e ->
         |          bit_count(xor(e.a, n.s1)) + bit_count(xor(e.b, n.s2))
         |            + bit_count(xor(e.c, n.s3)) <= ${graft.streaming.SemanticDedupStream.HammingMax}),
         |        e -> {'h': CAST(bit_count(xor(e.a, n.s1))
         |                + bit_count(xor(e.b, n.s2))
         |                + bit_count(xor(e.c, n.s3)) AS INT),
         |              'v': e.v}))[1] AS best) L)
         |SELECT vec_id, is_dup, dup_of, ham AS hamming
         |FROM dec ORDER BY vec_id""".stripMargin
    })

  /** The OR-KEYED streaming suppressor's decision function as a declared
    * row (r18 verdict item 1): [[graft.streaming.SemanticDedupStream
    * .suppressOr]] runs the identical per-bucket fold keyed per
    * (band, bucket) — 4 keys per arrival — and OR-combines the verdicts,
    * lifting clone-corpus suppression recall from the single band-0 key's
    * 0.744 collision ceiling toward the measured 0.984 4-band-OR bound
    * (SemStreamProbe, SURVEY §6). Same arrival schedule and TTL as
    * [[dedupSemanticStreamReplay]], so the two rows price OR-keying as a
    * standing correctness alarm; the oracle is the single-band recursion
    * generalized to a per-(band, bucket) recursion (state entries carry
    * all four sketch words — the keyed word XORs to zero in-band, exactly
    * the operator's arithmetic) plus a bool_or/struct-min combine tail
    * mirroring [[graft.streaming.SemanticDedupStream.combineBandDecisions]]
    * tie-break for tie-break.
    */
  private val dedupSemanticStreamOr = Q(
    "dedup_semantic_stream_or",
    (s, dir) => {
      import graft.streaming.SemanticDedupStream
      SemanticDedupStream.suppressOr(
          SemanticDedupStream.signatures(semReplayArrivals(s, dir)),
          SemReplayTtlMs, streaming = false)
        .orderBy("vec_id")
    },
    Some {
      s"""WITH RECURSIVE
         |arr AS (
         |  SELECT vec_id, 3600000 + (vec_id % 64) * 7000 AS ms, embedding
         |  FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + ${SemReplayIdOffset},
         |         3600000 + (vec_id % 64) * 7000
         |           + CASE WHEN vec_id % 2 = 0 THEN ${SemReplayTtlMs / 2}
         |             ELSE ${SemReplayTtlMs * 2} END,
         |         embedding
         |  FROM embeddings),
         |pl(plane, coef) AS (VALUES ${planeValuesSql(HamBands * HamBits)}),
         |bits AS (SELECT a.vec_id, a.ms, pl.plane,
         |    CASE WHEN list_sum(list_transform(range(1,65),
         |           i -> CAST(a.embedding[i] AS DOUBLE) * coef[i])) >= 0
         |         THEN CAST(power(2, plane % $HamBits) AS BIGINT) ELSE 0 END AS bit
         |  FROM arr a CROSS JOIN pl),
         |sg AS (SELECT vec_id, ms, CAST(plane // $HamBits AS INT) AS band,
         |       CAST(sum(bit) AS BIGINT) AS w
         |       FROM bits GROUP BY vec_id, ms, plane // $HamBits),
         |sig AS (SELECT vec_id, ms,
         |         max(CASE WHEN band=0 THEN w END) AS s0,
         |         max(CASE WHEN band=1 THEN w END) AS s1,
         |         max(CASE WHEN band=2 THEN w END) AS s2,
         |         max(CASE WHEN band=3 THEN w END) AS s3
         |        FROM sg GROUP BY vec_id, ms),
         |bnd AS (SELECT s.vec_id, s.ms, b.band,
         |         CASE b.band WHEN 0 THEN s.s0 WHEN 1 THEN s.s1
         |                     WHEN 2 THEN s.s2 ELSE s.s3 END AS bkt,
         |         s.s0, s.s1, s.s2, s.s3
         |        FROM sig s CROSS JOIN (VALUES (0),(1),(2),(3)) b(band)),
         |rk AS (SELECT *, CAST(ROW_NUMBER() OVER (
         |         PARTITION BY band, bkt ORDER BY ms, vec_id) AS INT) AS rnk
         |       FROM bnd),
         |dec AS (
         |  SELECT 1 AS it, band, bkt, vec_id, ms, FALSE AS is_dup,
         |         CAST(-1 AS BIGINT) AS dup_of, -1 AS ham,
         |         [{'v': vec_id, 'x': ms + $SemReplayTtlMs,
         |           'a': s0, 'b': s1, 'c': s2, 'd': s3}] AS st
         |  FROM rk WHERE rnk = 1
         |  UNION ALL
         |  SELECT p.it + 1, p.band, p.bkt, n.vec_id, n.ms,
         |         L.best.v IS NOT NULL AS is_dup,
         |         COALESCE(L.best.v, -1) AS dup_of,
         |         COALESCE(L.best.h, -1) AS ham,
         |         CASE WHEN L.best.v IS NULL
         |              THEN list_append(L.live, {'v': n.vec_id,
         |                'x': n.ms + $SemReplayTtlMs,
         |                'a': n.s0, 'b': n.s1, 'c': n.s2, 'd': n.s3})
         |              ELSE L.live END AS st
         |  FROM dec p
         |  JOIN rk n ON n.band = p.band AND n.bkt = p.bkt AND n.rnk = p.it + 1,
         |  LATERAL (SELECT list_filter(p.st, e -> e.x > n.ms) AS live) L1,
         |  LATERAL (SELECT L1.live AS live, list_sort(list_transform(
         |        list_filter(L1.live, e ->
         |          bit_count(xor(e.a, n.s0)) + bit_count(xor(e.b, n.s1))
         |            + bit_count(xor(e.c, n.s2)) + bit_count(xor(e.d, n.s3))
         |            <= ${graft.streaming.SemanticDedupStream.HammingMax}),
         |        e -> {'h': CAST(bit_count(xor(e.a, n.s0))
         |                + bit_count(xor(e.b, n.s1))
         |                + bit_count(xor(e.c, n.s2))
         |                + bit_count(xor(e.d, n.s3)) AS INT),
         |              'v': e.v}))[1] AS best) L),
         |comb AS (SELECT vec_id, bool_or(is_dup) AS is_dup,
         |         min(CASE WHEN is_dup THEN {'h': ham, 'v': dup_of} END) AS best
         |  FROM dec GROUP BY vec_id)
         |SELECT vec_id, is_dup,
         |  CAST(COALESCE(best.v, -1) AS BIGINT) AS dup_of,
         |  CAST(COALESCE(best.h, -1) AS INT) AS hamming
         |FROM comb ORDER BY vec_id""".stripMargin
    })

  /** `e`: spread full vector set; `raw`: unspread scan for the pushed-down
    * query-side read. `panel`/`shortlist`: the [[ivfPqTopK]] conventions —
    * probe-time query frame and the corpus-scaled candidate width (default
    * 4·k, the declared row's oracle-pinned 20; a fixed shortlist over a
    * growing corpus decays recall exactly as the IVFPQ ladder measured).
    */
  def hammingTopK(e: DataFrame, raw: DataFrame, k: Int = 5,
                  panel: Option[DataFrame] = None,
                  shortlist: Int = -1): DataFrame = {
    val shortlistN = if (shortlist > 0) shortlist else 4 * k
    VectorKernels.register(e.sparkSession)
    // 64 sign bits via the adaptive-LSH bucket kernel at its full fixed
    // width (abits = maxBits = 16 → planes 0..63, band-major — identical
    // plane indexing to the oracle's plane // 16 packing)
    def signed(v: DataFrame): DataFrame = v
      .select(col("vec_id"), col("embedding"), l2norm(col("embedding")).as("nrm"),
        VectorKernels.abuckets(col("embedding"), lit(HamBits.toLong),
          HamBands, HamBits).as("sig"))
    val qv = panel.getOrElse(raw.filter(col("vec_id") < 10))
      .select(col("vec_id"), col("embedding"))
    val qs = broadcast(signed(qv)
      .toDF("q_id", "q_emb", "q_nrm", "q_sig"))
    val ns = signed(e).toDF("n_id", "n_emb", "n_nrm", "n_sig")
    // XOR + popcount over the four packed words; −hamming feeds the
    // bounded-state TopK (integers are exact at the 9-dp round, ordering
    // ≡ (hamming asc, n_id asc)).
    // UNROLLED, not aggregate(zip_with(...)) (r19): the higher-order fold
    // is CodegenFallback — every panel × corpus candidate row dropped out
    // of whole-stage codegen and paid an interpreted lambda plus a
    // per-row array allocation (the same pathology the r19 build round
    // evicted from the ADC fold). Four fixed element_at/bit_count terms
    // stay inside codegen; integer adds in any order are the identical
    // exact hamming count.
    val ham = (0 until HamBands).map { i =>
      call_function("bit_count",
        element_at(col("q_sig"), i + 1)
          .bitwiseXOR(element_at(col("n_sig"), i + 1))).cast("long")
    }.reduce(_ + _)
    val cand = qs.join(ns, col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"), (-ham.cast("double")).as("nham"))
      .groupBy(col("q_id"))
      .agg((if (shortlistN > 64)
          graft.functions.TopK.neighborsWide(shortlistN)(col("n_id"), col("nham"))
        else
          graft.functions.TopK.neighbors(shortlistN)(col("n_id"), col("nham"))).as("nb"))
      .select(col("q_id"), explode(col("nb")).as("x"))
      .select(col("q_id"), col("x._1").as("n_id"))
    // exact re-rank of the shortlist only: float vectors join back by id
    val nf = e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
      l2norm(col("embedding")).as("n_nrm"))
    val qf = broadcast(qv
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        l2norm(col("embedding")).as("q_nrm")))
    val wExact = Window.partitionBy("q_id")
      .orderBy(round(col("cos"), 9).desc, col("n_id"))
    cand.join(nf, "n_id").join(qf, "q_id")
      .withColumn("cos",
        dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("n_id"), round(col("cos"), 6).as("cosine"), col("rank"))
  }

  /** Semantic dedup clusters, the EXACT AUDIT: the embedding-cosine
    * near-dup pairs of the deterministic [[sampleModulus]] residue-class
    * panel resolved into connected components (cluster id = min vec_id) —
    * the embedding-space twin of `dedup_clusters`, sharing the same CC
    * loop. The threshold is tighter than `dedup_embedding_cosine` because
    * transitive closure amplifies weak edges into sprawling components.
    *
    * Scale stance (the r12 verdict item): θ = 0.45 is provably below
    * LSH's filtering regime (banding at θ = 0.4 admits 97.8 % of all
    * pairs — measured, see [[tiledCosinePairs]] call sites), so an exact
    * full-corpus closure is irreducibly Θ(n²) — 16.5 s at sf1 and
    * 11.5×/decade as a declared row through r12. An audit does not need
    * all n² pairs: like every eval row in the family (sim_knn_outlier,
    * sim_lsh_recall), it runs EXACTLY on the bounded ~256–512-vector
    * panel — all pairs WITHIN the panel, O(panel²) constant at any corpus
    * — estimating near-dup pair rate and cluster-size structure the way a
    * 10⁹-vector deployment audits its [[dedupSemanticClustersScaled]]
    * production clustering. The panel is tiny by construction, so the
    * pair stage is one broadcast self-join, no tiling needed. Unlike the
    * pre-r13 full-corpus form, SINGLETONS are included (cluster_id =
    * vec_id): an audit must say "this doc has no near-dup" explicitly, and
    * a small panel at a tight threshold is legitimately singleton-heavy.
    */
  private val dedupSemanticClusters = Q(
    "dedup_semantic_clusters",
    (s, dir) => {
      val e = emb(s, dir)
      val p = e.crossJoin(broadcast(sampleModulus(e)))
        .filter(col("vec_id") % col("m") === 3)
        .select(col("vec_id"), col("embedding"),
          l2norm(col("embedding")).as("nrm"))
      val pairs = p.toDF("va", "a_emb", "a_nrm")
        .join(broadcast(p.toDF("vb", "b_emb", "b_nrm")),
          col("va") < col("vb"))
        .withColumn("cos",
          dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
        .filter(round(col("cos"), 9) >= 0.45)
        .select(col("va").as("doc_a"), col("vb").as("doc_b"))
      val cc = Dedup.connectedComponents(pairs)
        .select(col("doc_id").as("vec_id"), col("cluster_id").as("cid"))
      p.select(col("vec_id")).join(broadcast(cc), Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("cid"), col("vec_id")).as("cluster_id"))
        .orderBy("vec_id")
    },
    Some(s"""WITH RECURSIVE
           |e AS (SELECT vec_id, embedding,
           |   sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
           | FROM embeddings),
           |$mmSql,
           |pe AS (SELECT * FROM e WHERE vec_id % (SELECT m FROM mm) = 3),
           |p AS (SELECT a.vec_id AS va, b.vec_id AS vb,
           |   list_sum(list_transform(range(1, 65),
           |     i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
           |     / (a.nrm * b.nrm) AS cos
           | FROM pe a JOIN pe b ON a.vec_id < b.vec_id),
           |pairs AS (SELECT va, vb FROM p WHERE round(cos, 9) >= 0.45),
           |edges AS (SELECT va AS u, vb AS v FROM pairs
           |          UNION ALL SELECT vb, va FROM pairs),
           |reach(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM edges)
           |                UNION
           |                SELECT ed.u, r.v FROM edges ed JOIN reach r ON ed.v = r.u),
           |cc AS (SELECT u AS vec_id, min(v) AS cluster_id FROM reach GROUP BY u)
           |SELECT pe.vec_id, COALESCE(cc.cluster_id, pe.vec_id) AS cluster_id
           |FROM pe LEFT JOIN cc ON cc.vec_id = pe.vec_id
           |ORDER BY pe.vec_id""".stripMargin))

  /** SEMANTIC dedup clusters, the SCALE path: connected components over
    * the adaptive-geometry LSH top-5 kNN graph's θ ≥ 0.45 edges — the
    * SemDeDup shape (cluster the ANN neighbor graph, keep one
    * representative per component) that a 10⁹-vector corpus actually
    * runs, where [[dedupSemanticClusters]]'s exact panel audit estimates
    * the same structure on a bounded sample. Edge generation is the
    * memoized [[lshTop5Auto]] candidate lists (linear in candidates,
    * bucket-bounded at every decade by the [[autoBits]] chooser, shared
    * with the whole LSH family), the threshold cut runs on the list's
    * 6-dp cosine, and components resolve by the same pointer-jumping CC
    * loop.
    *
    * The trade vs the exact variant, priced: edges are restricted to each
    * vector's top-5 bucket-colliding neighbors, so a pair below both
    * endpoints' top-5 (or never bucket-colliding) joins a cluster only
    * through a transitive chain — the kNN-graph-covers-near-dup-sets
    * argument every production semantic dedup rests on. The oracle replays
    * the AutoBands·MaxAutoBits seed-42 plane literals, the chooser, the lists, the cut, and
    * the recursive closure, so the approximation itself is hash-checked
    * end-to-end.
    */
  private val dedupSemanticClustersScaled = Q(
    "dedup_semantic_clusters_scaled",
    (s, dir) => {
      val pairs = lshTop5Auto(s, dir)
        .filter(col("cosine") >= 0.45)
        .select(least(col("q_id"), col("n_id")).as("doc_a"),
          greatest(col("q_id"), col("n_id")).as("doc_b"))
        .distinct()
      Dedup.connectedComponents(pairs)
        .select(col("doc_id").as("vec_id"), col("cluster_id"))
        .orderBy("vec_id")
    },
    // the closure CTE is recursive, so the shared LSH prefix's WITH needs
    // the RECURSIVE keyword (DuckDB requires it up front; non-recursive
    // CTEs mix freely under it)
    Some(lshOracleCtesAuto.replaceFirst("WITH ", "WITH RECURSIVE ") +
      """,pairs AS (SELECT DISTINCT least(q_id, n_id) AS va,
        |    greatest(q_id, n_id) AS vb
        |  FROM r WHERE rank <= 5 AND round(cos, 6) >= 0.45),
        |edges AS (SELECT va AS u, vb AS v FROM pairs
        |          UNION ALL SELECT vb, va FROM pairs),
        |reach(u, v) AS (SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        |                UNION
        |                SELECT ed.u, re.v FROM edges ed JOIN reach re ON ed.v = re.u)
        |SELECT u AS vec_id, min(v) AS cluster_id FROM reach
        |GROUP BY u ORDER BY vec_id""".stripMargin))

  /** Σ aᵢ·bᵢ over double arrays — the [[graft.functions.DoubleVecDot]]
    * codegen kernel (the `zip_with`+`aggregate` formulation is
    * CodegenFallback and paid ~0.8 s of interpreted lambda dispatch at
    * sf0.1). Same sequential accumulation as `list_sum`, so scores stay
    * oracle-comparable. Session must be kernel-registered.
    */
  private def dotD(a: Column, b: Column): Column = VectorKernels.ddot(a, b)

  /** Spherical k-means assignment (cosine argmax, per-dimension mean
    * update) — the topic-bucketing / mixture-balancing pass a curation
    * pipeline runs over its embedding corpus. Deterministic seeds (the
    * k lowest-id vectors, whatever the id space), `iters` Lloyd iterations.
    *
    * Scale shape: centroids stay k×dims small however large the corpus, so
    * every assignment pass is a map-side broadcast crossJoin (never a
    * vec×vec product) + one per-vector window; the mean update is a
    * two-phase hash aggregate over (cluster, dim) — k·dims rows of shuffle
    * output per iteration.
    *
    * Determinism: assignment ranks round(cos, 9) with centroid-id
    * tie-break; means go through [[graft.functions.Deterministic.dsumFine]]
    * (order-independent decimal sum) so re-runs are identical on any
    * partitioning.
    */
  /** K-means internals exposed for the quality readouts ([[simSilhouette]]):
    * returns (assignments carrying the normalized vectors, the centroids
    * that PRODUCED the final assignment). Same algorithm and determinism
    * as [[kmeansAssign]].
    */
  def kmeansModel(e: DataFrame, k: Int = 8,
                  iters: Int = 2): (DataFrame, DataFrame) = {
    require(k >= 1, s"kmeansAssign: k must be >= 1, got $k")
    require(iters >= 1, s"kmeansAssign: iters must be >= 1, got $iters")
    VectorKernels.register(e.sparkSession)
    val base = e.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(dotD(col("v"), col("v"))))
    // seeds: the k LOWEST ids (a distributed top-k, not `vec_id < k` — id
    // spaces that don't start at 0 must still yield k centroids)
    var cents = base.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("c"), col("v").as("cv"), col("nrm").as("cn"))
    var assigned: DataFrame = base // overwritten on the first iteration
    for (it <- 1 to iters) {
      val wA = Window.partitionBy("vec_id")
        .orderBy(round(col("cos_c"), 9).desc, col("c"))
      assigned = base.crossJoin(broadcast(cents))
        .withColumn("cos_c", dotD(col("v"), col("cv")) / (col("nrm") * col("cn")))
        .withColumn("rn", row_number().over(wA))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("v"), col("nrm"), col("c"))
      if (it < iters) {
        cents = assigned
          .select(col("c"), posexplode(col("v")).as(Seq("pos", "x")))
          .groupBy("c", "pos")
          .agg((graft.functions.Deterministic.dsumFine(col("x")) /
            count(lit(1))).as("mv"))
          .groupBy("c")
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("mv")))),
            s => s("mv")).as("cv"))
          .withColumn("cn", sqrt(dotD(col("cv"), col("cv"))))
      }
    }
    (assigned, cents)
  }

  def kmeansAssign(e: DataFrame, k: Int = 8, iters: Int = 2): DataFrame =
    kmeansModel(e, k, iters)._1
      .select(col("vec_id"), col("c").as("cluster_id"))

  /** K-means summary over the corpus (k = 8, 2 Lloyd iterations): integer
    * per-cluster stats only, so cross-engine float noise in the means can't
    * leak into the compared values (assignments themselves are stabilized
    * by the round(·,9)+id ranking). Fully oracle-checked — seed choice,
    * both assignment passes and the mean update are plain SQL.
    */
  private val simKmeans = Q(
    "sim_kmeans",
    (s, dir) => kmeansAssign(emb(s, dir))
      .groupBy("cluster_id")
      .agg(count(lit(1)).cast("int").as("n_members"),
        min(col("vec_id")).as("min_vec_id"),
        sum(col("vec_id")).as("sum_vec_id"))
      .orderBy("cluster_id"),
    Some("""WITH en AS (SELECT vec_id,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
           |    sqrt(list_sum(list_transform(embedding,
           |      x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
           |  FROM embeddings),
           |c0 AS (SELECT vec_id AS c, v AS cv, nrm AS cn FROM en
           |       ORDER BY vec_id LIMIT 8),
           |a1 AS (SELECT vec_id, v, nrm, c FROM (
           |    SELECT en.vec_id, en.v, en.nrm, c0.c,
           |      ROW_NUMBER() OVER (PARTITION BY en.vec_id ORDER BY round(
           |        list_sum(list_transform(range(1,65), i -> en.v[i]*c0.cv[i]))
           |        / (en.nrm*c0.cn), 9) DESC, c0.c) AS rn
           |    FROM en CROSS JOIN c0) WHERE rn = 1),
           |m AS (SELECT c, i,
           |        CAST(sum(CAST(v[i] AS DECIMAL(38,20))) AS DOUBLE) / count(*) AS mv
           |      FROM a1, unnest(range(1,65)) AS t(i) GROUP BY c, i),
           |c1 AS (SELECT c, array_agg(mv ORDER BY i) AS cv FROM m GROUP BY c),
           |c1n AS (SELECT c, cv, sqrt(list_sum(list_transform(cv, x -> x*x))) AS cn
           |        FROM c1),
           |a2 AS (SELECT vec_id, c FROM (
           |    SELECT en.vec_id, c1n.c,
           |      ROW_NUMBER() OVER (PARTITION BY en.vec_id ORDER BY round(
           |        list_sum(list_transform(range(1,65), i -> en.v[i]*c1n.cv[i]))
           |        / (en.nrm*c1n.cn), 9) DESC, c1n.c) AS rn
           |    FROM en CROSS JOIN c1n) WHERE rn = 1)
           |SELECT c AS cluster_id, CAST(count(*) AS INT) AS n_members,
           |  min(vec_id) AS min_vec_id, CAST(sum(vec_id) AS BIGINT) AS sum_vec_id
           |FROM a2 GROUP BY c ORDER BY cluster_id""".stripMargin))

  /** Per-dimension distribution profile of the embedding corpus (the
    * fitness check before any ANN indexing: dead dimensions, scale
    * imbalance, outliers). One explode → two-phase decimal-exact moment
    * aggregate over (vectors × dims) rows, grouped by the 64 dimension
    * keys — linear, map-side partials, no joins. Same exact-moment
    * formulation as `agg_stats`.
    */
  def dimStats(d: DataFrame): DataFrame = {
    val x = col("x")
    val nD = col("n").cast("double")
    val sx = col("sx"); val sxx = col("sxx")
    d.select(posexplode(col("embedding")).as(Seq("dim", "xf")))
      .select(col("dim"), col("xf").cast("double").as("x"))
      .groupBy("dim")
      .agg(count(lit(1)).as("n"),
        graft.functions.Deterministic.dsumFine(x).as("sx"),
        graft.functions.Deterministic.dsumFine(x * x).as("sxx"),
        min(x).as("mn"), max(x).as("mx"))
      .select(col("dim"), col("n"),
        round(sx / nD, 6).as("mean"),
        // clamp: dec20-truncated moments of a constant non-dec20-exact
        // dimension can cancel epsilon-negative — Spark's sqrt would say
        // NaN where DuckDB hard-errors on a negative operand
        round(sqrt(greatest((sxx - sx * sx / nD) / (nD - 1.0), lit(0.0))), 6)
          .as("stddev"),
        round(col("mn"), 6).as("min_val"),
        round(col("mx"), 6).as("max_val"))
  }

  private val simDimStats = Q(
    "sim_dim_stats",
    (s, dir) => dimStats(emb(s, dir)).orderBy("dim"),
    Some("""WITH x AS (SELECT CAST(i - 1 AS INT) AS dim,
           |        CAST(embedding[i] AS DOUBLE) AS x
           |      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
           |a AS (SELECT dim, count(*) AS n,
           |        CAST(SUM(CAST(x AS DECIMAL(38,20))) AS DOUBLE) AS sx,
           |        CAST(SUM(CAST(x * x AS DECIMAL(38,20))) AS DOUBLE) AS sxx,
           |        min(x) AS mn, max(x) AS mx
           |      FROM x GROUP BY dim)
           |SELECT dim, n,
           |  round(sx / CAST(n AS DOUBLE), 6) AS mean,
           |  round(sqrt(greatest(
           |    (sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0), 0.0)), 6) AS stddev,
           |  round(mn, 6) AS min_val,
           |  round(mx, 6) AS max_val
           |FROM a ORDER BY dim""".stripMargin))

  /** Distributed PCA, top principal component by power iteration — the
    * whitening/compression preamble of an embedding pipeline (PQ/IVF both
    * improve on decorrelated inputs). The shape that scales:
    *
    *  - mean vector: one explode → 64-key decimal-exact aggregate;
    *  - covariance: per-row outer product via two CHAINED `posexplode`s
    *    (no self-join — the d² fan-out happens inside the row) → two-phase
    *    decimal aggregate whose map-side combine shuffles only
    *    d² × partitions rows, then the mean correction
    *    `C = Σxxᵀ/n − μμᵀ` on the tiny d² frame;
    *  - 2 power iterations on the persisted d²-row covariance: broadcast
    *    the 64-row vector, one join + decimal aggregate per step; the
    *    starting vector is the exact constant 1/8 (= 1/√64), so every
    *    arithmetic step is a single IEEE op from exact decimal sums —
    *    deterministic, and the DuckDB oracle replays the whole chain
    *    CTE-for-CTE. λ is estimated as ‖C·v‖ of the final step (v entered
    *    normalized).
    *
    * No driver-side collect anywhere: n, norms, and λ all ride broadcast
    * 1-row frames.
    */
  def pca1(e: DataFrame, iters: Int = 2): (DataFrame, DataFrame) = {
    val cnt = e.agg(count(lit(1)).as("n"))
    val x = e.select(posexplode(col("embedding")).as(Seq("i", "xf")))
      .select(col("i"), col("xf").cast("double").as("x"))
    val mu = x.groupBy("i")
      .agg(graft.functions.Deterministic.dsumFine(col("x")).as("sx"))
      .crossJoin(broadcast(cnt))
      .select(col("i"), (col("sx") / col("n")).as("mu"))
    // UPPER TRIANGLE only (j ≥ i, filtered between the explodes — a slice
    // per (row, i) would allocate 64 arrays per row and measured SLOWER):
    // halves the aggregated d²-row stream, and the mirrored (j,i) sums are
    // bit-identical because x_i·x_j = x_j·x_i addend-for-addend and the
    // decimal sum is order-independent — so the oracle can stay full-matrix
    val tri = e
      .select(col("embedding"), posexplode(col("embedding")).as(Seq("i", "xaf")))
      .select(col("i"), col("xaf").cast("double").as("xa"),
        posexplode(col("embedding")).as(Seq("j", "xbf")))
      .filter(col("j") >= col("i"))
      .select(col("i"), col("j"), (col("xa") * col("xbf").cast("double")).as("xy"))
      .groupBy("i", "j")
      .agg(graft.functions.Deterministic.dsumFine(col("xy")).as("sxy"))
    val prod = tri.unionByName(tri.filter(col("i") =!= col("j"))
      .select(col("j").as("i"), col("i").as("j"), col("sxy")))
    // d² rows; NOT persisted — the repeated cov/mu subtrees across the two
    // iterations dedupe through AQE exchange reuse within the one action,
    // which measured faster than stacked lazy caches (same finding as
    // graph_pagerank: cache-population barriers serialize the stage graph)
    val cov = prod
      .join(broadcast(mu.toDF("i2", "mu_i")), col("i") === col("i2"))
      .join(broadcast(mu.toDF("j2", "mu_j")), col("j") === col("j2"))
      .crossJoin(broadcast(cnt))
      .select(col("i"), col("j"),
        (col("sxy") / col("n") - col("mu_i") * col("mu_j")).as("c"))
    var v = mu.select(col("i").as("j"), lit(0.125).as("v")) // 1/√64, exact
    var nrm = cnt.select(lit(1.0).as("nrm"))
    for (_ <- 1 to iters) {
      val y = cov.join(broadcast(v), "j")
        .groupBy("i")
        .agg(graft.functions.Deterministic.dsumFine(col("c") * col("v")).as("y"))
      nrm = y.agg(
        sqrt(graft.functions.Deterministic.dsumFine(col("y") * col("y"))).as("nrm"))
      v = y.crossJoin(broadcast(nrm))
        .select(col("i").as("j"), (col("y") / col("nrm")).as("v"))
    }
    (v.select(col("j").as("dim"), col("v").as("loading")), nrm)
  }

  /** One power-iteration SQL round: y_k = C·v_{k-1}, its norm, and the
    * normalized v_k.
    */
  private def pcaIterSql(k: Int): String = {
    val prev = s"v${k - 1}"
    s"""y$k AS (SELECT cov.i,
       |    CAST(SUM(CAST(cov.c * $prev.v AS DECIMAL(38,20))) AS DOUBLE) AS y
       |  FROM cov JOIN $prev ON cov.j = $prev.j GROUP BY cov.i),
       |n$k AS (SELECT sqrt(CAST(SUM(CAST(y * y AS DECIMAL(38,20))) AS DOUBLE)) AS nrm
       |  FROM y$k),
       |v$k AS (SELECT i AS j, y / (SELECT nrm FROM n$k) AS v FROM y$k)""".stripMargin
  }

  private val simPcaPower = Q(
    "sim_pca_power",
    (s, dir) => {
      val (v, nrm) = pca1(emb(s, dir))
      v.crossJoin(broadcast(nrm))
        .select(col("dim"), round(col("loading"), 6).as("pc1_loading"),
          round(col("nrm"), 6).as("lambda"))
        .orderBy("dim")
    },
    Some("""WITH cnt AS (SELECT count(*) AS n FROM embeddings),
           |x AS (SELECT e.vec_id, CAST(i - 1 AS INT) AS i,
           |        CAST(embedding[i] AS DOUBLE) AS x
           |      FROM embeddings e, unnest(range(1, len(embedding) + 1)) AS t(i)),
           |mu AS (SELECT i,
           |    CAST(SUM(CAST(x AS DECIMAL(38,20))) AS DOUBLE) / (SELECT n FROM cnt) AS mu
           |  FROM x GROUP BY i),
           |pr AS (SELECT a.i AS i, b.i AS j,
           |    CAST(SUM(CAST(a.x * b.x AS DECIMAL(38,20))) AS DOUBLE) AS sxy
           |  FROM x a JOIN x b ON a.vec_id = b.vec_id GROUP BY a.i, b.i),
           |cov AS (SELECT pr.i, pr.j,
           |    sxy / (SELECT n FROM cnt) - mi.mu * mj.mu AS c
           |  FROM pr JOIN mu mi ON pr.i = mi.i JOIN mu mj ON pr.j = mj.i),
           |v0 AS (SELECT i AS j, CAST(0.125 AS DOUBLE) AS v FROM mu),
           |""".stripMargin +
      (1 to 2).map(pcaIterSql).mkString(",\n") + "\n" +
      """SELECT j AS dim, round(v, 6) AS pc1_loading,
        |  round((SELECT nrm FROM n2), 6) AS lambda
        |FROM v2 ORDER BY dim""".stripMargin))

  /** Distributed logistic-regression training steps (full-batch gradient
    * descent) over the embedding corpus — the linear-probe baseline an
    * embedding pipeline fits on top of frozen vectors. Per step:
    *
    *  - margins: x ⋈ broadcast(w) equi-join + per-row decimal dot (n keys);
    *  - residuals: σ(z) − y as single IEEE ops per row;
    *  - gradient: x ⋈ residuals equi-join on the row key + 64-key
    *    decimal-exact aggregate, divided by the broadcast corpus count.
    *
    * Two shuffles per step, both linear in n·d; weights and counts ride
    * broadcast frames — no driver collect. Step 1 from w₀ = 0 is
    * sigmoid-exact on both engines (σ(0) = ½); later steps' exp() last-ulp
    * noise sits ~10 orders below the round(·,6) reporting edge (same
    * stance as text_tfidf's ln). The DuckDB oracle replays every step
    * CTE-for-CTE.
    */
  def logregSteps(e: DataFrame, steps: Int = 2, lr: Double = 0.1): DataFrame = {
    val cnt = e.agg(count(lit(1)).as("n"))
    val xy = e.select(col("vec_id"), (col("label") % 2).cast("double").as("y"),
      posexplode(col("embedding")).as(Seq("i", "xf")))
      .select(col("vec_id"), col("y"), col("i"), col("xf").cast("double").as("x"))
    // w0 is all zeros — its index set needs one row's array length, not a
    // full-corpus explode + distinct (which would cost an n·d shuffle
    // before the first step)
    val dims = e.select(col("embedding")).limit(1)
      .select(posexplode(col("embedding")).as(Seq("i", "xf")))
    var w = dims.select(col("i"), lit(0.0).as("w"))
    for (_ <- 1 to steps) {
      val z = xy.join(broadcast(w), "i")
        .groupBy("vec_id", "y")
        .agg(graft.functions.Deterministic.dsumFine(col("x") * col("w")).as("z"))
      val resid = z.select(col("vec_id"),
        (lit(1.0) / (lit(1.0) + exp(-col("z"))) - col("y")).as("r"))
      // shuffle_hash, never broadcast: resid is CORPUS-sized (one row per
      // training vector) — AQE happily broadcasts it at bench scale, but
      // at 10⁹ vectors that is a corpus broadcast, and even at the 100×
      // test corpus four concurrent training chains' residual broadcasts
      // exhausted the driver's build memory (ml_learning_curve OOM)
      val grad = xy.join(resid.hint("shuffle_hash"), "vec_id")
        .groupBy("i")
        .agg(graft.functions.Deterministic.dsumFine(col("x") * col("r")).as("g"))
        .crossJoin(broadcast(cnt))
        .select(col("i"), (col("g") / col("n")).as("g"))
      w = w.join(grad, "i").select(col("i"), (col("w") - lit(lr) * col("g")).as("w"))
    }
    w.select(col("i").as("dim"), col("w").as("weight"))
  }

  /** One oracle GD round: margins z_k, residuals r_k, gradient g_k, w_k. */
  private def logregIterSql(k: Int): String = {
    val prev = s"w${k - 1}"
    s"""z$k AS (SELECT x.vec_id, x.y,
       |    CAST(SUM(CAST(x.x * $prev.w AS DECIMAL(38,20))) AS DOUBLE) AS z
       |  FROM x JOIN $prev ON x.i = $prev.i GROUP BY x.vec_id, x.y),
       |r$k AS (SELECT vec_id, 1.0 / (1.0 + exp(-z)) - y AS r FROM z$k),
       |w$k AS (SELECT $prev.i,
       |    $prev.w - 0.1 * (CAST(SUM(CAST(x.x * r$k.r AS DECIMAL(38,20))) AS DOUBLE)
       |                     / (SELECT n FROM cnt)) AS w
       |  FROM x JOIN r$k ON x.vec_id = r$k.vec_id JOIN $prev ON x.i = $prev.i
       |  GROUP BY $prev.i, $prev.w)""".stripMargin
  }

  /** The eval family's shared trained model: [[logregSteps]] weights for
    * `dir`'s corpus, memoized per session via [[graft.Caches.memo]]. The
    * 64-row weights frame is trained ONCE and pinned; ml_logreg_step,
    * ml_auc, ml_pr_curve and ml_calibration all score against the same
    * materialized frame instead of each replaying the identical 2-step GD
    * chain (four trainings per bench pass before this). The build is
    * deterministic ([[graft.functions.Deterministic]] sums), so reuse is
    * value-identical to retraining and each query stays self-contained for
    * the oracle compare — the DuckDB side still replays the chain
    * CTE-for-CTE.
    */
  private def trainedLogreg(s: SparkSession, dir: String): DataFrame =
    graft.Caches.memo(s, s"logreg_w:$dir")(logregSteps(emb(s, dir)))

  private val mlLogregStep = Q(
    "ml_logreg_step",
    (s, dir) => trainedLogreg(s, dir)
      .select(col("dim"), round(col("weight"), 6).as("weight"))
      .orderBy("dim"),
    Some("""WITH cnt AS (SELECT count(*) AS n FROM embeddings),
           |x AS (SELECT vec_id, CAST(label % 2 AS DOUBLE) AS y,
           |        CAST(i - 1 AS INT) AS i, CAST(embedding[i] AS DOUBLE) AS x
           |      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
           |w0 AS (SELECT DISTINCT i, CAST(0.0 AS DOUBLE) AS w FROM x),
           |""".stripMargin +
      (1 to 2).map(logregIterSql).mkString(",\n") + "\n" +
      """SELECT CAST(i AS INT) AS dim, round(w, 6) AS weight
        |FROM w2 ORDER BY dim""".stripMargin))

  /** Distributed AUC-ROC for the trained classifier — the evaluation half
    * of the [[logregSteps]] train step, closing the train → score → eval
    * loop. AUC is computed by the rank-sum identity
    * AUC = Σ_levels n⁺(level) · (cum n⁻ below + n⁻(level)/2) / (N⁺ · N⁻)
    * — exactly equivalent to pairwise P(s⁺ > s⁻) + ½P(s⁺ = s⁻), but with
    * NO pairwise join.
    *
    * Scale: scores are sigmoids rounded to 6 dp, so the level frame is
    * PROVABLY ≤ 10⁶+1 rows no matter the corpus size — the single ordered
    * window runs over that bounded aggregate (the text_vocab stance:
    * windows over aggregated frames, never the raw fact). Everything else
    * is two-phase: the margin aggregation reuses the training's
    * fine-decimal dot product; count products are summed as decimals of
    * double products (longs never multiply into longs).
    */
  def aucRankSum(e: DataFrame, w: DataFrame): DataFrame = {
    val xy = e.select(col("vec_id"), (col("label") % 2).cast("double").as("y"),
      posexplode(col("embedding")).as(Seq("i", "xf")))
      .select(col("vec_id"), col("y"), col("i"), col("xf").cast("double").as("x"))
    val scores = xy.join(broadcast(w.select(col("dim").as("i"), col("weight"))), "i")
      .groupBy("vec_id", "y")
      .agg(graft.functions.Deterministic.dsumFine(col("x") * col("weight")).as("z"))
      .select(col("y"), round(lit(1.0) / (lit(1.0) + exp(-col("z"))), 6).as("p"))
    val lvl = scores.groupBy("p")
      .agg(sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("np"),
        sum(when(col("y") === 1.0, 0L).otherwise(1L)).as("nn"))
    val below = coalesce(sum(col("nn")).over(
      Window.orderBy("p").rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val tot = lvl.agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"))
    lvl.select(col("np"), col("nn"), below.as("below"))
      .crossJoin(broadcast(tot))
      .agg(first(col("n_pos")).as("n_pos"), first(col("n_neg")).as("n_neg"),
        round(graft.functions.Deterministic.dsumFine(
          col("np").cast("double") *
            (col("below").cast("double") + col("nn").cast("double") / 2.0)) /
          (first(col("n_pos")).cast("double") *
            first(col("n_neg")).cast("double")), 6).as("auc"))
  }

  private val mlAuc = Q(
    "ml_auc",
    (s, dir) => aucRankSum(emb(s, dir), trainedLogreg(s, dir)),
    Some("""WITH cnt AS (SELECT count(*) AS n FROM embeddings),
           |x AS (SELECT vec_id, CAST(label % 2 AS DOUBLE) AS y,
           |        CAST(i - 1 AS INT) AS i, CAST(embedding[i] AS DOUBLE) AS x
           |      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
           |w0 AS (SELECT DISTINCT i, CAST(0.0 AS DOUBLE) AS w FROM x),
           |""".stripMargin +
      (1 to 2).map(logregIterSql).mkString(",\n") + ",\n" +
      """scores AS (SELECT x.y,
        |    round(1.0 / (1.0 + exp(-(CAST(SUM(CAST(x.x * w2.w AS DECIMAL(38,20))) AS DOUBLE)))), 6) AS p
        |  FROM x JOIN w2 ON x.i = w2.i GROUP BY x.vec_id, x.y),
        |lvl AS (SELECT p, SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS np,
        |               SUM(CASE WHEN y = 1.0 THEN 0 ELSE 1 END) AS nn
        |        FROM scores GROUP BY p),
        |c AS (SELECT np, nn,
        |        COALESCE(SUM(nn) OVER (ORDER BY p
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        |      FROM lvl),
        |tot AS (SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
        |               CAST(SUM(nn) AS BIGINT) AS n_neg FROM lvl)
        |SELECT tot.n_pos, tot.n_neg,
        |  round(CAST(SUM(CAST(CAST(np AS DOUBLE) * (CAST(below AS DOUBLE) + CAST(nn AS DOUBLE) / 2.0)
        |    AS DECIMAL(38,20))) AS DOUBLE)
        |    / (CAST(tot.n_pos AS DOUBLE) * CAST(tot.n_neg AS DOUBLE)), 6) AS auc
        |FROM c, tot GROUP BY tot.n_pos, tot.n_neg""".stripMargin))

  /** Precision-recall curve at decile thresholds for the trained
    * classifier — the threshold-CHOICE readout completing the eval family
    * ([[aucRankSum]] is threshold-free ranking quality, [[mlCalibration]]
    * is probability quality): for each decile bucket b, TP/FP counts of
    * predicting positive at score ≥ b/10, by a cumulative-from-top window
    * over the FIXED ≤10-row bucket frame (the AUC stance: ordered windows
    * only over bounded aggregates). Scores and bucketing reuse the exact
    * GD-chain replay (round(p,6), floor(p·10) clamp 9 — the
    * [[mlCalibration]] bucket convention); precision/recall are single
    * double divisions of exact longs.
    */
  private val mlPrCurve = Q(
    "ml_pr_curve",
    (s, dir) => {
      val e = emb(s, dir)
      val w = trainedLogreg(s, dir)
      val xy = e.select(col("vec_id"), (col("label") % 2).cast("double").as("y"),
        posexplode(col("embedding")).as(Seq("i", "xf")))
        .select(col("vec_id"), col("y"), col("i"), col("xf").cast("double").as("x"))
      val scores = xy
        .join(broadcast(w.select(col("dim").as("i"), col("weight"))), "i")
        .groupBy("vec_id", "y")
        .agg(graft.functions.Deterministic.dsumFine(col("x") * col("weight")).as("z"))
        .select(col("y"),
          round(lit(1.0) / (lit(1.0) + exp(-col("z"))), 6).as("p"))
      val bkt = scores
        .withColumn("b", least(floor(col("p") * 10), lit(9.0)).cast("int"))
        .groupBy("b")
        .agg(sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("np"),
          sum(when(col("y") === 1.0, 0L).otherwise(1L)).as("nn"))
      val wTop = Window.orderBy(col("b").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val tot = bkt.agg(sum(col("np")).as("n_pos"))
      bkt.select(col("b"), sum(col("np")).over(wTop).as("tp"),
          sum(col("nn")).over(wTop).as("fp"))
        .crossJoin(broadcast(tot))
        .select((col("b").cast("double") / 10).as("threshold"),
          col("tp"), col("fp"),
          round(col("tp").cast("double") /
            (col("tp") + col("fp")).cast("double"), 6).as("precision"),
          round(col("tp").cast("double") / col("n_pos").cast("double"), 6)
            .as("recall"))
        .orderBy("threshold")
    },
    Some("""WITH cnt AS (SELECT count(*) AS n FROM embeddings),
           |x AS (SELECT vec_id, CAST(label % 2 AS DOUBLE) AS y,
           |        CAST(i - 1 AS INT) AS i, CAST(embedding[i] AS DOUBLE) AS x
           |      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
           |w0 AS (SELECT DISTINCT i, CAST(0.0 AS DOUBLE) AS w FROM x),
           |""".stripMargin +
      (1 to 2).map(logregIterSql).mkString(",\n") + ",\n" +
      """scores AS (SELECT x.y,
        |    round(1.0 / (1.0 + exp(-(CAST(SUM(CAST(x.x * w2.w AS DECIMAL(38,20))) AS DOUBLE)))), 6) AS p
        |  FROM x JOIN w2 ON x.i = w2.i GROUP BY x.vec_id, x.y),
        |bkt AS (SELECT CAST(least(floor(p * 10), 9.0) AS INT) AS b,
        |    SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS np,
        |    SUM(CASE WHEN y = 1.0 THEN 0 ELSE 1 END) AS nn
        |  FROM scores GROUP BY 1),
        |c AS (SELECT b,
        |    CAST(SUM(np) OVER (ORDER BY b DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
        |    CAST(SUM(nn) OVER (ORDER BY b DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fp
        |  FROM bkt),
        |tot AS (SELECT CAST(SUM(np) AS BIGINT) AS n_pos FROM bkt)
        |SELECT CAST(b AS DOUBLE) / 10 AS threshold, tp, fp,
        |  round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6) AS precision,
        |  round(CAST(tp AS DOUBLE) / CAST(n_pos AS DOUBLE), 6) AS recall
        |FROM c CROSS JOIN tot ORDER BY threshold""".stripMargin))

  /** Calibration / reliability table for the trained classifier — the
    * companion readout to [[aucRankSum]]: predicted-probability deciles vs
    * observed positive rate (a well-calibrated model has mean_p ≈ pos_rate
    * per bucket). Scores bucket by floor(p·10) clamped to 9, so the output
    * is a FIXED ≤10-row frame from one two-phase aggregate — nothing about
    * the corpus size reaches the reduce side but 10 groups of exact
    * decimal sums.
    */
  private val mlCalibration = Q(
    "ml_calibration",
    (s, dir) => {
      val e = emb(s, dir)
      val w = trainedLogreg(s, dir)
      val xy = e.select(col("vec_id"), (col("label") % 2).cast("double").as("y"),
        posexplode(col("embedding")).as(Seq("i", "xf")))
        .select(col("vec_id"), col("y"), col("i"), col("xf").cast("double").as("x"))
      xy.join(broadcast(w.select(col("dim").as("i"), col("weight"))), "i")
        .groupBy("vec_id", "y")
        .agg(graft.functions.Deterministic.dsumFine(col("x") * col("weight")).as("z"))
        .select(col("y"), (lit(1.0) / (lit(1.0) + exp(-col("z")))).as("p"))
        .withColumn("bucket", least(floor(col("p") * 10), lit(9.0)).cast("int"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          round(graft.functions.Deterministic.dsumFine(col("p")) /
            count(lit(1)), 6).as("mean_p"),
          round(sum(col("y").cast("long")).cast("double") /
            count(lit(1)), 6).as("pos_rate"))
        .orderBy("bucket")
    },
    Some("""WITH cnt AS (SELECT count(*) AS n FROM embeddings),
           |x AS (SELECT vec_id, CAST(label % 2 AS DOUBLE) AS y,
           |        CAST(i - 1 AS INT) AS i, CAST(embedding[i] AS DOUBLE) AS x
           |      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
           |w0 AS (SELECT DISTINCT i, CAST(0.0 AS DOUBLE) AS w FROM x),
           |""".stripMargin +
      (1 to 2).map(logregIterSql).mkString(",\n") + ",\n" +
      """scores AS (SELECT x.y,
        |    1.0 / (1.0 + exp(-(CAST(SUM(CAST(x.x * w2.w AS DECIMAL(38,20))) AS DOUBLE)))) AS p
        |  FROM x JOIN w2 ON x.i = w2.i GROUP BY x.vec_id, x.y)
        |SELECT CAST(least(floor(p * 10), 9.0) AS INT) AS bucket,
        |  count(*) AS n,
        |  round(CAST(SUM(CAST(p AS DECIMAL(38,20))) AS DOUBLE) / count(*), 6) AS mean_p,
        |  round(CAST(SUM(CAST(y AS BIGINT)) AS DOUBLE) / count(*), 6) AS pos_rate
        |FROM scores GROUP BY 1 ORDER BY bucket""".stripMargin))

  /** Expected Calibration Error + calibration slope — the one-number and
    * one-line summaries of the [[mlCalibration]] reliability table: ECE =
    * Σ (n_b/n)·|pos_rate_b − mean_p_b| (the standard miscalibration
    * magnitude a gate thresholds), and the OLS slope/intercept of observed
    * rate on predicted probability over the occupied deciles (slope < 1 =
    * overconfident, > 1 = underconfident — which DIRECTION to recalibrate,
    * which ECE alone can't say). Everything reduces the same rounded
    * decile frame the reliability table publishes, so the two readouts are
    * consistent with what the operator already shows.
    *
    * Scale shape: the decile frame is ≤ 10 rows by construction; ECE and
    * the slope moments are one aggregate over it (weighted sums via
    * [[graft.functions.Deterministic.dsumFine]]); the scored frame rides
    * the memoized GD-eval substrate. NULLIF guards a degenerate
    * single-point fit.
    */
  private val mlCalibrationSlope = Q(
    "ml_calibration_slope",
    (s, dir) => {
      val bkt = logregScores(s, dir)
        .withColumn("bucket", least(floor(col("p") * 10), lit(9.0)).cast("int"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          round(graft.functions.Deterministic.dsumFine(col("p")) /
            count(lit(1)), 6).as("mp"),
          round(sum(col("y").cast("long")).cast("double") /
            count(lit(1)), 6).as("pr"))
      val mo = bkt.agg(sum(col("n")).as("nt"), count(lit(1)).as("k"),
        graft.functions.Deterministic.dsumFine(
          col("n").cast("double") * abs(col("pr") - col("mp"))).as("wgap"),
        graft.functions.Deterministic.dsumFine(col("mp")).as("sx"),
        graft.functions.Deterministic.dsumFine(col("pr")).as("sy"),
        graft.functions.Deterministic.dsumFine(col("mp") * col("mp")).as("sxx"),
        graft.functions.Deterministic.dsumFine(col("mp") * col("pr")).as("sxy"))
      val k = col("k").cast("double")
      val den = k * col("sxx") - col("sx") * col("sx")
      val slope = (k * col("sxy") - col("sx") * col("sy")) /
        when(den =!= 0.0, den)
      mo.select(col("nt").as("n_scored"), col("k").as("n_buckets"),
        round(col("wgap") / col("nt").cast("double"), 6).as("ece"),
        round(slope, 6).as("cal_slope"),
        round((col("sy") - slope * col("sx")) / k, 6).as("cal_intercept"))
    },
    Some(scoresSqlPrefix +
      """bkt AS (SELECT CAST(least(floor(p * 10), 9.0) AS INT) AS bucket,
        |    count(*) AS n,
        |    round(CAST(SUM(CAST(p AS DECIMAL(38,20))) AS DOUBLE) / count(*), 6) AS mp,
        |    round(CAST(SUM(CAST(y AS BIGINT)) AS DOUBLE) / count(*), 6) AS pr
        |  FROM scores GROUP BY 1),
        |mo AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, count(*) AS k,
        |    CAST(SUM(CAST(CAST(n AS DOUBLE) * abs(pr - mp) AS DECIMAL(38,20))) AS DOUBLE) AS wgap,
        |    CAST(SUM(CAST(mp AS DECIMAL(38,20))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(pr AS DECIMAL(38,20))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(mp * mp AS DECIMAL(38,20))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(mp * pr AS DECIMAL(38,20))) AS DOUBLE) AS sxy
        |  FROM bkt),
        |sl AS (SELECT *,
        |    (k * sxy - sx * sy) / NULLIF(k * sxx - sx * sx, 0.0) AS slope
        |  FROM mo)
        |SELECT nt AS n_scored, k AS n_buckets,
        |  round(wgap / nt, 6) AS ece, round(slope, 6) AS cal_slope,
        |  round((sy - slope * sx) / k, 6) AS cal_intercept
        |FROM sl""".stripMargin))

  /** Deterministic ±1 Rademacher projection matrix (seed 7), 16 rows of 64 —
    * the same seeded-literal convention as the LSH [[planes]].
    */
  private lazy val rpSigns: Array[Array[Float]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(16, 64)(if (rnd.nextBoolean()) 1.0f else -1.0f)
  }

  /** Johnson–Lindenstrauss random projection 64-d → 16-d:
    * y_j = (1/√16)·Σ_d sign(j,d)·x_d with a fixed ±1 Rademacher matrix —
    * the 4× dimensionality-reduction rung BEFORE the quantization rungs
    * (SQ8/PQ compress precision; this compresses dimensions, and
    * E‖y‖² = ‖x‖² keeps distances usable downstream). Map-only per row: 16
    * codegen'd [[FloatVecDot]] kernels against literal sign vectors, scale
    * by the exact dyadic 0.25 — no shuffle until the 16-group moment
    * aggregate. Output: per projected dimension, mean and variance (fine-
    * decimal sums → exact moments; variance via (s/n) reused, never
    * `pow`, and clamped at 0 — the [[graft.functions.Deterministic]]
    * conventions). The oracle interpolates the same sign literals and
    * replays dot, scale, and moments bit-for-bit.
    */
  private lazy val simRandProj = Q(
    "sim_rand_proj",
    (s, dir) => {
      import graft.functions.Deterministic.dsumFine
      VectorKernels.register(s)
      val ys = (0 until 16).map { j =>
        val sv = array(scala.collection.immutable.ArraySeq.unsafeWrapArray(
          rpSigns(j).map(lit)): _*)
        (dot(col("embedding"), sv) * lit(0.25)).as(s"y$j")
      }
      val n = count(lit(1))
      val mean = dsumFine(col("y")) / n
      emb(s, dir).select(col("vec_id") +: ys: _*)
        .select(posexplode(array((0 until 16).map(j => col(s"y$j")): _*))
          .as(Seq("proj_dim", "y")))
        .groupBy("proj_dim")
        .agg(n.as("n"),
          round(mean, 9).as("mean_y"),
          round(greatest(dsumFine(col("y") * col("y")) / n - mean * mean,
            lit(0.0)), 9).as("var_y"))
        .orderBy("proj_dim")
    },
    Some {
      val vals = rpSigns.zipWithIndex.map { case (p, j) =>
        s"($j, [${p.map(c => if (c > 0) "1.0" else "-1.0").mkString(",")}]::DOUBLE[])"
      }.mkString(",\n")
      s"""WITH pl(j, coef) AS (VALUES $vals),
         |y AS (SELECT e.vec_id, pl.j,
         |    list_sum(list_transform(range(1, 65),
         |      i -> CAST(e.embedding[i] AS DOUBLE) * coef[i])) * 0.25 AS y
         |  FROM embeddings e CROSS JOIN pl)
         |SELECT j AS proj_dim, count(*) AS n,
         |  round(CAST(SUM(CAST(y AS DECIMAL(38,20))) AS DOUBLE) / count(*), 9)
         |    AS mean_y,
         |  round(greatest(
         |    CAST(SUM(CAST(y*y AS DECIMAL(38,20))) AS DOUBLE) / count(*)
         |    - (CAST(SUM(CAST(y AS DECIMAL(38,20))) AS DOUBLE) / count(*))
         |      * (CAST(SUM(CAST(y AS DECIMAL(38,20))) AS DOUBLE) / count(*)),
         |    0.0), 9) AS var_y
         |FROM y GROUP BY j ORDER BY proj_dim""".stripMargin
    })

  /** Quantile normalization across embedding dimensions — the batch-effect
    * remover (force every dimension onto one common distribution: rank each
    * value within its dim, replace it by the cross-dim mean at that rank).
    * The shape: one posexplode (rows × dims), a rank window PARTITIONED BY
    * DIM (parallelism = dim count — inherent to the definition; each dim's
    * sort is independent and distributes across the cluster), then a
    * two-phase mean per rank. No window is global and no frame is
    * corpus × corpus. Determinism: float→double casts are exact, rank ties
    * break on vec_id, and the per-rank mean rides fine-decimal sums
    * ([[graft.functions.Deterministic.dsumFine]]) — the reference
    * distribution is bit-stable under any partitioning. Output: the first
    * 100 ranks of the learned reference distribution.
    */
  private lazy val mlQuantileNorm = Q(
    "ml_quantile_norm",
    (s, dir) => {
      import graft.functions.Deterministic.dsumFine
      val x = emb(s, dir)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "xf")))
        .select(col("vec_id"), col("dim"), col("xf").cast("double").as("x"))
      val w = Window.partitionBy("dim").orderBy(col("x"), col("vec_id"))
      x.withColumn("rank_pos", row_number().over(w))
        .groupBy("rank_pos")
        .agg(count(lit(1)).as("n_dims"), dsumFine(col("x")).as("sx"))
        .select(col("rank_pos"), col("n_dims"),
          round(col("sx") / col("n_dims"), 6).as("norm_value"))
        .orderBy("rank_pos")
        .limit(100)
    },
    Some("""WITH x AS (SELECT vec_id, CAST(i - 1 AS INT) AS dim,
           |        CAST(embedding[i] AS DOUBLE) AS x
           |      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
           |r AS (SELECT x, row_number() OVER (PARTITION BY dim
           |        ORDER BY x, vec_id) AS rk FROM x),
           |a AS (SELECT rk, count(*) AS n_dims,
           |        CAST(SUM(CAST(x AS DECIMAL(38,20))) AS DOUBLE) AS sx
           |      FROM r GROUP BY rk)
           |SELECT CAST(rk AS INT) AS rank_pos, n_dims,
           |  round(sx / n_dims, 6) AS norm_value
           |FROM a ORDER BY rank_pos LIMIT 100""".stripMargin))

  /** Gini-optimal decision stump over the embedding dims — the weakest
    * useful learner (the unit a boosting/tree ensemble stacks) and the
    * fastest "is there any single separating feature?" probe before
    * spending GD steps: for every dimension, split the corpus at that
    * dimension's mean and score the weighted Gini impurity of the
    * (label % 2) classes; report the best dim. ONE n·d-row pass computes
    * the per-dim means (fine-decimal, exact), ONE more the four split
    * counts per dim (64-row frame); everything after is closed-form
    * arithmetic on exact longs, with the arg-min taken on the 9-dp-rounded
    * score + dim tiebreak (the [[mlKnnClassify]] selection convention).
    * Two linear shuffles total; nothing about the corpus size reaches the
    * reduce side but 64 groups.
    */
  /** The stump trainer under `ml_decision_stump`, public for the
    * planted-feature spec: best mean-split (dim, threshold, gini, accuracy)
    * over an embeddings-shaped frame (vec_id, embedding, label).
    */
  def decisionStump(e: DataFrame): DataFrame = {
      val xy = e.select((col("label") % 2).cast("long").as("y"),
        posexplode(col("embedding")).as(Seq("i", "xf")))
        .select(col("y"), col("i"), col("xf").cast("double").as("x"))
      val mu = xy.groupBy("i")
        .agg((graft.functions.Deterministic.dsumFine(col("x")) /
          count(lit(1))).as("mu"))
      val c = xy.join(broadcast(mu), "i")
        .groupBy("i")
        .agg(max(col("mu")).as("mu"),
          sum(when(col("x") <= col("mu") && col("y") === 1, 1L).otherwise(0L)).as("l1"),
          sum(when(col("x") <= col("mu") && col("y") === 0, 1L).otherwise(0L)).as("l0"),
          sum(when(col("x") > col("mu") && col("y") === 1, 1L).otherwise(0L)).as("r1"),
          sum(when(col("x") > col("mu") && col("y") === 0, 1L).otherwise(0L)).as("r0"))
      def d(c: Column) = c.cast("double")
      val nL = col("l0") + col("l1")
      val nR = col("r0") + col("r1")
      val n = nL + nR
      val gL = when(nL > 0,
        lit(1.0) - (d(col("l0")) * d(col("l0")) + d(col("l1")) * d(col("l1"))) /
          (d(nL) * d(nL))).otherwise(lit(0.0))
      val gR = when(nR > 0,
        lit(1.0) - (d(col("r0")) * d(col("r0")) + d(col("r1")) * d(col("r1"))) /
          (d(nR) * d(nR))).otherwise(lit(0.0))
      val gini = (d(nL) * gL + d(nR) * gR) / d(n)
      val acc = (greatest(col("l0"), col("l1")) + greatest(col("r0"), col("r1")))
        .cast("double") / d(n)
      c.select(col("i").as("dim"), col("mu"), gini.as("gini"), acc.as("acc"))
        .orderBy(round(col("gini"), 9), col("dim"))
        .limit(1)
        .select(col("dim"), round(col("mu"), 6).as("threshold"),
          round(col("gini"), 6).as("gini"), round(col("acc"), 6).as("accuracy"))
  }

  private val mlDecisionStump = Q(
    "ml_decision_stump",
    (s, dir) => decisionStump(emb(s, dir)),
    Some("""WITH x AS (SELECT CAST(label % 2 AS BIGINT) AS y, CAST(i - 1 AS INT) AS i,
           |    CAST(embedding[i] AS DOUBLE) AS x
           |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
           |mu AS (SELECT i, CAST(SUM(CAST(x AS DECIMAL(38,20))) AS DOUBLE)
           |         / count(*) AS mu
           |       FROM x GROUP BY i),
           |c AS (SELECT x.i, max(mu.mu) AS mu,
           |    CAST(SUM(CASE WHEN x <= mu AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS l1,
           |    CAST(SUM(CASE WHEN x <= mu AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS l0,
           |    CAST(SUM(CASE WHEN x > mu AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS r1,
           |    CAST(SUM(CASE WHEN x > mu AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS r0
           |  FROM x JOIN mu ON x.i = mu.i GROUP BY x.i),
           |g AS (SELECT i AS dim, mu,
           |    (CAST(l0 + l1 AS DOUBLE) *
           |       (CASE WHEN l0 + l1 > 0 THEN 1.0 -
           |          (CAST(l0 AS DOUBLE) * CAST(l0 AS DOUBLE)
           |           + CAST(l1 AS DOUBLE) * CAST(l1 AS DOUBLE))
           |          / (CAST(l0 + l1 AS DOUBLE) * CAST(l0 + l1 AS DOUBLE))
           |        ELSE 0.0 END)
           |     + CAST(r0 + r1 AS DOUBLE) *
           |       (CASE WHEN r0 + r1 > 0 THEN 1.0 -
           |          (CAST(r0 AS DOUBLE) * CAST(r0 AS DOUBLE)
           |           + CAST(r1 AS DOUBLE) * CAST(r1 AS DOUBLE))
           |          / (CAST(r0 + r1 AS DOUBLE) * CAST(r0 + r1 AS DOUBLE))
           |        ELSE 0.0 END))
           |    / CAST(l0 + l1 + r0 + r1 AS DOUBLE) AS gini,
           |    CAST(greatest(l0, l1) + greatest(r0, r1) AS DOUBLE)
           |      / CAST(l0 + l1 + r0 + r1 AS DOUBLE) AS acc
           |  FROM c)
           |SELECT dim, round(mu, 6) AS threshold, round(gini, 6) AS gini,
           |  round(acc, 6) AS accuracy
           |FROM g ORDER BY round(gini, 9), dim LIMIT 1""".stripMargin))

  /** Cosine RANGE query — the "everything within θ of this anchor" API
    * member beside top-k ([[simBruteTopk]]) and threshold self-join
    * ([[tiledCosinePairs]]): one anchor vector (vec_id 0, the corpus
    * min) broadcast against the corpus, every dot a codegen'd
    * [[FloatVecDot]], one filter, distributed top-ordering of the matches.
    * Map-only until the final sort — the 1×n shape whose scale path at
    * many anchors is the LSH/IVF bucket route; a single range probe is
    * exactly a broadcast scan and should plan as one.
    */
  private val simRangeQuery = Q(
    "sim_range_query",
    (s, dir) => {
      VectorKernels.register(s)
      val raw = Tables.load(s, dir, "embeddings")
      val seed = broadcast(raw.filter(col("vec_id") === 0)
        .select(col("embedding").as("s_emb"))
        .withColumn("s_nrm", l2norm(col("s_emb"))))
      emb(s, dir).filter(col("vec_id") =!= 0)
        .select(col("vec_id"), col("embedding"), l2norm(col("embedding")).as("nrm"))
        .crossJoin(seed)
        .withColumn("cos",
          dot(col("embedding"), col("s_emb")) / (col("nrm") * col("s_nrm")))
        .filter(col("cos") >= 0.25)
        .select(col("vec_id"), round(col("cos"), 6).as("cosine"))
        .orderBy(col("cosine").desc, col("vec_id"))
    },
    Some("""WITH e AS (SELECT vec_id, embedding,
           |   sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
           | FROM embeddings),
           |s AS (SELECT embedding AS s_emb, nrm AS s_nrm FROM e WHERE vec_id = 0),
           |c AS (SELECT e.vec_id,
           |   list_sum(list_transform(range(1, 65),
           |     i -> CAST(e.embedding[i] AS DOUBLE) * CAST(s.s_emb[i] AS DOUBLE)))
           |     / (e.nrm * s.s_nrm) AS cos
           | FROM e CROSS JOIN s WHERE e.vec_id != 0)
           |SELECT vec_id, round(cos, 6) AS cosine FROM c
           |WHERE cos >= 0.25 ORDER BY cosine DESC, vec_id""".stripMargin))

  /** Simplified (centroid-based) silhouette of the k-means clustering —
    * the cluster-quality readout completing the clustering family
    * (sim_kmeans = the partition, this = "is the partition any good?"):
    * per vector, a = cosine distance to its OWN centroid, b = the minimum
    * distance to any OTHER centroid, s = (b−a)/max(a,b) ∈ [−1, 1]; the
    * per-cluster mean separates tight clusters (s → 1) from arbitrary
    * splits (s ≈ 0). The full-silhouette a/b (mean pairwise member
    * distances) is corpus-quadratic; the centroid form (Hruschka 2004) is
    * the standard linear surrogate — one broadcast-centroid cross per
    * vector, map-only until the per-cluster aggregate, the exact shape of
    * the assignment pass it audits.
    *
    * Determinism: identical centroid chain as sim_kmeans (fully oracle-
    * replayed), each distance the same single-division expression the
    * assignment ranked on, s two subtractions + one division, means via
    * fine-decimal sums at round(·,6).
    */
  private val simSilhouette = Q(
    "sim_silhouette",
    (s, dir) => {
      val (assigned, cents) = kmeansModel(emb(s, dir))
      val d = assigned
        .crossJoin(broadcast(cents.withColumnRenamed("c", "cc")))
        .withColumn("dist",
          lit(1.0) - dotD(col("v"), col("cv")) / (col("nrm") * col("cn")))
      val ab = d.groupBy("vec_id", "c")
        .agg(max(when(col("cc") === col("c"), col("dist"))).as("a"),
          min(when(col("cc") =!= col("c"), col("dist"))).as("b"))
      val sil = ab.select(col("vec_id"), col("c"),
        when(greatest(col("a"), col("b")) > 0,
          (col("b") - col("a")) / greatest(col("a"), col("b")))
          .otherwise(lit(0.0)).as("s"))
      sil.groupBy(col("c").as("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          round(graft.functions.Deterministic.dsumFine(col("s")) /
            count(lit(1)), 6).as("mean_silhouette"))
        .orderBy("cluster_id")
    },
    Some("""WITH en AS (SELECT vec_id,
           |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
           |    sqrt(list_sum(list_transform(embedding,
           |      x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
           |  FROM embeddings),
           |c0 AS (SELECT vec_id AS c, v AS cv, nrm AS cn FROM en
           |       ORDER BY vec_id LIMIT 8),
           |a1 AS (SELECT vec_id, v, nrm, c FROM (
           |    SELECT en.vec_id, en.v, en.nrm, c0.c,
           |      ROW_NUMBER() OVER (PARTITION BY en.vec_id ORDER BY round(
           |        list_sum(list_transform(range(1,65), i -> en.v[i]*c0.cv[i]))
           |        / (en.nrm*c0.cn), 9) DESC, c0.c) AS rn
           |    FROM en CROSS JOIN c0) WHERE rn = 1),
           |m AS (SELECT c, i,
           |        CAST(sum(CAST(v[i] AS DECIMAL(38,20))) AS DOUBLE) / count(*) AS mv
           |      FROM a1, unnest(range(1,65)) AS t(i) GROUP BY c, i),
           |c1 AS (SELECT c, array_agg(mv ORDER BY i) AS cv FROM m GROUP BY c),
           |c1n AS (SELECT c, cv, sqrt(list_sum(list_transform(cv, x -> x*x))) AS cn
           |        FROM c1),
           |a2 AS (SELECT vec_id, v, nrm, c FROM (
           |    SELECT en.vec_id, en.v, en.nrm, c1n.c,
           |      ROW_NUMBER() OVER (PARTITION BY en.vec_id ORDER BY round(
           |        list_sum(list_transform(range(1,65), i -> en.v[i]*c1n.cv[i]))
           |        / (en.nrm*c1n.cn), 9) DESC, c1n.c) AS rn
           |    FROM en CROSS JOIN c1n) WHERE rn = 1),
           |d AS (SELECT a2.vec_id, a2.c, c1n.c AS cc,
           |        1.0 - list_sum(list_transform(range(1,65),
           |          i -> a2.v[i]*c1n.cv[i])) / (a2.nrm*c1n.cn) AS dist
           |      FROM a2 CROSS JOIN c1n),
           |ab AS (SELECT vec_id, c,
           |        max(CASE WHEN cc = c THEN dist END) AS a,
           |        min(CASE WHEN cc <> c THEN dist END) AS b
           |       FROM d GROUP BY vec_id, c),
           |sil AS (SELECT vec_id, c,
           |        CASE WHEN greatest(a, b) > 0
           |          THEN (b - a) / greatest(a, b) ELSE 0.0 END AS s
           |       FROM ab)
           |SELECT c AS cluster_id, count(*) AS n_members,
           |  round(CAST(SUM(CAST(s AS DECIMAL(38,20))) AS DOUBLE) / count(*),
           |    6) AS mean_silhouette
           |FROM sil GROUP BY c ORDER BY cluster_id""".stripMargin))

  /** Reciprocal-rank fusion (Cormack 2009, the RAG-stack default) of two
    * retrieval rankings — cosine (norm-calibrated) and raw inner product
    * (magnitude-sensitive): RRF(d) = Σᵣ 1/(60 + rankᵣ(d)) rewards documents
    * BOTH rankers place high without comparing their incommensurable
    * scores. Both rankings come off ONE pass over the query×corpus frame
    * (two windows, both partitioned by q_id); this is the brute-force
    * baseline exactly like [[simBruteTopk]] — the scale path swaps each
    * ranker for its ANN variant and fuses the candidate lists, the fusion
    * arithmetic is unchanged.
    *
    * Determinism: ranks are exact ints off round(·,9)+id orderings; each
    * RRF term is one IEEE division by a small exact integer, the fusion
    * one addition, ordered at round(·,9) with id tie-break.
    */
  private val simRrfFusion = Q(
    "sim_rrf_fusion",
    (s, dir) => {
      VectorKernels.register(s)
      val raw = Tables.load(s, dir, "embeddings")
      val q = broadcast(raw.filter(col("vec_id") < 10)
        .select(col("vec_id"), col("embedding"), l2norm(col("embedding")).as("nrm"))
        .toDF("q_id", "q_emb", "q_nrm"))
      val n = emb(s, dir).select(col("vec_id"), col("embedding"),
        l2norm(col("embedding")).as("nrm"))
        .toDF("n_id", "n_emb", "n_nrm")
      val scored = q.join(n, col("q_id") =!= col("n_id"))
        .withColumn("dp", dot(col("q_emb"), col("n_emb")))
        .withColumn("cos", col("dp") / (col("q_nrm") * col("n_nrm")))
      val wc = Window.partitionBy("q_id")
        .orderBy(round(col("cos"), 9).desc, col("n_id"))
      val wd = Window.partitionBy("q_id")
        .orderBy(round(col("dp"), 9).desc, col("n_id"))
      val wf = Window.partitionBy("q_id")
        .orderBy(round(col("rrf"), 9).desc, col("n_id"))
      scored
        .withColumn("r_cos", row_number().over(wc))
        .withColumn("r_dot", row_number().over(wd))
        .withColumn("rrf",
          lit(1.0) / (lit(60) + col("r_cos")) +
            lit(1.0) / (lit(60) + col("r_dot")))
        .withColumn("rank", row_number().over(wf))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("rank"), col("n_id"),
          col("r_cos"), col("r_dot"), round(col("rrf"), 6).as("rrf"))
        .orderBy("q_id", "rank")
    },
    Some("""WITH e AS (SELECT vec_id, embedding,
           |   sqrt(list_sum(list_transform(embedding,
           |     x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
           | FROM embeddings),
           |p AS (SELECT q.vec_id AS q_id, n.vec_id AS n_id,
           |   list_sum(list_transform(range(1, 65),
           |     i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)))
           |     AS dp,
           |   q.nrm * n.nrm AS nn
           | FROM e q JOIN e n ON q.vec_id < 10 AND n.vec_id != q.vec_id),
           |r AS (SELECT q_id, n_id,
           |   CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |     ORDER BY round(dp / nn, 9) DESC, n_id) AS INT) AS r_cos,
           |   CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |     ORDER BY round(dp, 9) DESC, n_id) AS INT) AS r_dot
           | FROM p),
           |f AS (SELECT q_id, n_id, r_cos, r_dot,
           |   1.0 / (60 + r_cos) + 1.0 / (60 + r_dot) AS rrf FROM r),
           |k AS (SELECT q_id, n_id, r_cos, r_dot, rrf,
           |   CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |     ORDER BY round(rrf, 9) DESC, n_id) AS INT) AS rank FROM f)
           |SELECT q_id, rank, n_id, r_cos, r_dot, round(rrf, 6) AS rrf
           |FROM k WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin))

  /** Full confusion-matrix sweep for the trained classifier at decile
    * thresholds — the model-SELECTION readout completing the eval family:
    * [[mlPrCurve]] reports precision/recall, this adds the fn/tn halves,
    * F1, accuracy, and flags the F1-maximizing threshold (the operating
    * point a gating pipeline would deploy). Same shape discipline as the
    * PR curve: the exact GD-chain scores bucket by floor(p·10), the
    * cumulative-from-top window runs over the FIXED ≤10-row bucket frame,
    * fn/tn derive from the broadcast 1-row totals, and the best-F1 flag
    * compares each row's unrounded F1 against the broadcast max of the
    * same 10-row frame — identical IEEE expressions on both engines, so
    * the boolean is engine-stable.
    */
  private val mlF1Sweep = Q(
    "ml_f1_sweep",
    (s, dir) => {
      val e = emb(s, dir)
      val w = trainedLogreg(s, dir)
      val xy = e.select(col("vec_id"), (col("label") % 2).cast("double").as("y"),
        posexplode(col("embedding")).as(Seq("i", "xf")))
        .select(col("vec_id"), col("y"), col("i"), col("xf").cast("double").as("x"))
      val scores = xy
        .join(broadcast(w.select(col("dim").as("i"), col("weight"))), "i")
        .groupBy("vec_id", "y")
        .agg(graft.functions.Deterministic.dsumFine(col("x") * col("weight")).as("z"))
        .select(col("y"),
          round(lit(1.0) / (lit(1.0) + exp(-col("z"))), 6).as("p"))
      val bkt = scores
        .withColumn("b", least(floor(col("p") * 10), lit(9.0)).cast("int"))
        .groupBy("b")
        .agg(sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("np"),
          sum(when(col("y") === 1.0, 0L).otherwise(1L)).as("nn"))
      val wTop = Window.orderBy(col("b").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val tot = bkt.agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"))
      val conf = bkt
        .select(col("b"), sum(col("np")).over(wTop).as("tp"),
          sum(col("nn")).over(wTop).as("fp"))
        .crossJoin(broadcast(tot))
        .select(col("b"), col("tp"), col("fp"),
          (col("n_pos") - col("tp")).as("fn"),
          (col("n_neg") - col("fp")).as("tn"),
          col("n_pos"), col("n_neg"))
        .withColumn("f1", (lit(2.0) * col("tp").cast("double")) /
          (lit(2) * col("tp") + col("fp") + col("fn")).cast("double"))
      val best = conf.agg(max(col("f1")).as("bf"))
      conf.crossJoin(broadcast(best))
        .select((col("b").cast("double") / 10).as("threshold"),
          col("tp"), col("fp"), col("fn"), col("tn"),
          round(col("f1"), 6).as("f1"),
          round((col("tp") + col("tn")).cast("double") /
            (col("n_pos") + col("n_neg")).cast("double"), 6).as("accuracy"),
          (col("f1") === col("bf")).as("is_best"))
        .orderBy("threshold")
    },
    Some("""WITH cnt AS (SELECT count(*) AS n FROM embeddings),
           |x AS (SELECT vec_id, CAST(label % 2 AS DOUBLE) AS y,
           |        CAST(i - 1 AS INT) AS i, CAST(embedding[i] AS DOUBLE) AS x
           |      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
           |w0 AS (SELECT DISTINCT i, CAST(0.0 AS DOUBLE) AS w FROM x),
           |""".stripMargin +
      (1 to 2).map(logregIterSql).mkString(",\n") + ",\n" +
      """scores AS (SELECT x.y,
        |    round(1.0 / (1.0 + exp(-(CAST(SUM(CAST(x.x * w2.w AS DECIMAL(38,20))) AS DOUBLE)))), 6) AS p
        |  FROM x JOIN w2 ON x.i = w2.i GROUP BY x.vec_id, x.y),
        |bkt AS (SELECT CAST(least(floor(p * 10), 9.0) AS INT) AS b,
        |    SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS np,
        |    SUM(CASE WHEN y = 1.0 THEN 0 ELSE 1 END) AS nn
        |  FROM scores GROUP BY 1),
        |tot AS (SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
        |               CAST(SUM(nn) AS BIGINT) AS n_neg FROM bkt),
        |conf AS (SELECT b,
        |    CAST(SUM(np) OVER (ORDER BY b DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
        |    CAST(SUM(nn) OVER (ORDER BY b DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fp
        |  FROM bkt),
        |f AS (SELECT b, tp, fp, n_pos - tp AS fn, n_neg - fp AS tn,
        |    n_pos, n_neg,
        |    (2.0 * CAST(tp AS DOUBLE)) / CAST(2 * tp + fp + (n_pos - tp) AS DOUBLE) AS f1
        |  FROM conf CROSS JOIN tot),
        |best AS (SELECT max(f1) AS bf FROM f)
        |SELECT CAST(b AS DOUBLE) / 10 AS threshold, tp, fp, fn, tn,
        |  round(f1, 6) AS f1,
        |  round(CAST(tp + tn AS DOUBLE) / CAST(n_pos + n_neg AS DOUBLE), 6) AS accuracy,
        |  f1 = bf AS is_best
        |FROM f CROSS JOIN best ORDER BY threshold""".stripMargin))

  /** Position-discount literals for NDCG@20: 1/log₂(i+1) and their running
    * sums, computed ONCE in the JVM and inlined as literals into both the
    * Spark plan and the oracle SQL (the LSH-plane stance — no cross-engine
    * per-row transcendental dependence; 20 bounded positions make the
    * table finite by construction).
    */
  private val NdcgDisc: IndexedSeq[Double] =
    (1 to 20).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))
  private val NdcgDiscCum: IndexedSeq[Double] =
    NdcgDisc.scanLeft(0.0)(_ + _).tail.toIndexedSeq

  /** NDCG@20 of the trained classifier's score ranking against the binary
    * labels — the RANKING-quality readout the retrieval half of a curation
    * pipeline needs (AUC says "positives rank above negatives on average";
    * NDCG says "the top of the list, where the budget goes, is right").
    * DCG = Σ y_i/log₂(1+rank_i) over the top 20 by (score desc, vec_id);
    * IDCG indexes the cumulative discount literal at min(n_pos, 20).
    *
    * Scale shape: top-20 selection is a global top-k (TakeOrdered — no
    * global sort), the rank window runs over the selected 20-row frame
    * only, and the discount/ideal tables are inlined literals, so nothing
    * engine-variant or super-linear exists anywhere. The DCG sum rides
    * [[graft.functions.Deterministic.dsumFine]].
    */
  private val mlNdcg = Q(
    "ml_ndcg",
    (s, dir) => {
      val e = emb(s, dir)
      val w = trainedLogreg(s, dir)
      val xy = e.select(col("vec_id"), (col("label") % 2).cast("double").as("y"),
        posexplode(col("embedding")).as(Seq("i", "xf")))
        .select(col("vec_id"), col("y"), col("i"), col("xf").cast("double").as("x"))
      val scores = xy
        .join(broadcast(w.select(col("dim").as("i"), col("weight"))), "i")
        .groupBy("vec_id", "y")
        .agg(graft.functions.Deterministic.dsumFine(col("x") * col("weight")).as("z"))
        .select(col("vec_id"), col("y"),
          round(lit(1.0) / (lit(1.0) + exp(-col("z"))), 6).as("p"))
      val top = scores.orderBy(col("p").desc, col("vec_id")).limit(20)
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("p").desc, col("vec_id"))))
      val disc = array(NdcgDisc.map(lit): _*)
      val cum = array(NdcgDiscCum.map(lit): _*)
      val dcg = top
        .select((col("y") * element_at(disc, col("rnk"))).as("g"))
        .agg(graft.functions.Deterministic.dsumFine(col("g")).as("dcg"))
      val npos = scores.agg(
        sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("n_pos"))
      // n_pos = 0 guard: element_at(_, 0) THROWS on Spark (1-based array
      // indexing) while DuckDB's [0] returns NULL — clamp the index to ≥ 1
      // and NULL the readout explicitly so a positive-free corpus yields
      // NULL ndcg on both engines instead of an engine-divergent crash
      val idcgIdx = greatest(least(col("n_pos"), lit(20L)), lit(1L)).cast("int")
      val idcg = when(col("n_pos") === 0L, lit(null).cast("double"))
        .otherwise(element_at(cum, idcgIdx))
      dcg.crossJoin(broadcast(npos))
        .select(col("n_pos"), round(col("dcg"), 6).as("dcg_at20"),
          round(idcg, 6).as("idcg_at20"),
          round(col("dcg") / idcg, 6).as("ndcg_at20"))
    },
    Some("""WITH cnt AS (SELECT count(*) AS n FROM embeddings),
           |x AS (SELECT vec_id, CAST(label % 2 AS DOUBLE) AS y,
           |        CAST(i - 1 AS INT) AS i, CAST(embedding[i] AS DOUBLE) AS x
           |      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
           |w0 AS (SELECT DISTINCT i, CAST(0.0 AS DOUBLE) AS w FROM x),
           |""".stripMargin +
      (1 to 2).map(logregIterSql).mkString(",\n") + ",\n" +
      s"""scores AS (SELECT x.vec_id, x.y,
         |    round(1.0 / (1.0 + exp(-(CAST(SUM(CAST(x.x * w2.w AS DECIMAL(38,20))) AS DOUBLE)))), 6) AS p
         |  FROM x JOIN w2 ON x.i = w2.i GROUP BY x.vec_id, x.y),
         |top AS (SELECT y, rnk FROM (SELECT y, row_number() OVER
         |    (ORDER BY p DESC, vec_id) AS rnk FROM scores) WHERE rnk <= 20),
         |dcg AS (SELECT CAST(SUM(CAST(y * CAST(([${NdcgDisc.mkString(", ")}])[rnk] AS DOUBLE)
         |    AS DECIMAL(38,20))) AS DOUBLE) AS dcg FROM top),
         |npos AS (SELECT CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_pos FROM scores)
         |SELECT n_pos, round(dcg, 6) AS dcg_at20,
         |  round(CASE WHEN n_pos = 0 THEN NULL ELSE
         |    CAST(([${NdcgDiscCum.mkString(", ")}])[CAST(greatest(least(n_pos, 20), 1) AS INT)] AS DOUBLE) END, 6) AS idcg_at20,
         |  round(CASE WHEN n_pos = 0 THEN NULL ELSE
         |    dcg / CAST(([${NdcgDiscCum.mkString(", ")}])[CAST(greatest(least(n_pos, 20), 1) AS INT)] AS DOUBLE) END, 6) AS ndcg_at20
         |FROM dcg CROSS JOIN npos""".stripMargin))

  /** The eval family's shared scored frame: (vec_id, y, p) with p the
    * 6-dp-rounded sigmoid of the [[trainedLogreg]] margin — the exact
    * construction ml_auc/ml_pr_curve/ml_calibration inline, factored for
    * the round-10 additions (rounding p BEFORE any downstream statistic is
    * the determinism anchor: both engines read identical 6-dp doubles).
    */
  private def logregScores(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val w = trainedLogreg(s, dir)
    e.select(col("vec_id"), (col("label") % 2).cast("double").as("y"),
        posexplode(col("embedding")).as(Seq("i", "xf")))
      .select(col("vec_id"), col("y"), col("i"), col("xf").cast("double").as("x"))
      .join(broadcast(w.select(col("dim").as("i"), col("weight"))), "i")
      .groupBy("vec_id", "y")
      .agg(graft.functions.Deterministic.dsumFine(col("x") * col("weight")).as("z"))
      .select(col("vec_id"), col("y"),
        round(lit(1.0) / (lit(1.0) + exp(-col("z"))), 6).as("p"))
  }

  /** The scores CTE prefix shared by the round-10 eval oracles: the GD
    * chain replay + per-vector sigmoid, identical to [[logregScores]].
    */
  private def scoresSqlPrefix: String =
    """WITH cnt AS (SELECT count(*) AS n FROM embeddings),
      |x AS (SELECT vec_id, CAST(label % 2 AS DOUBLE) AS y,
      |        CAST(i - 1 AS INT) AS i, CAST(embedding[i] AS DOUBLE) AS x
      |      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
      |w0 AS (SELECT DISTINCT i, CAST(0.0 AS DOUBLE) AS w FROM x),
      |""".stripMargin +
      (1 to 2).map(logregIterSql).mkString(",\n") + ",\n" +
      """scores AS (SELECT x.vec_id, x.y,
        |    round(1.0 / (1.0 + exp(-(CAST(SUM(CAST(x.x * w2.w AS DECIMAL(38,20))) AS DOUBLE)))), 6) AS p
        |  FROM x JOIN w2 ON x.i = w2.i GROUP BY x.vec_id, x.y),
        |""".stripMargin

  /** Brier score of the trained classifier's probabilities — the PROPER
    * scoring rule the threshold metrics (F1 sweep, accuracy) can't give: it
    * penalizes miscalibrated confidence, not just wrong argmax, and
    * decomposes against the climatological reference forecast (always
    * predict the base rate), whose Brier is exactly ȳ(1−ȳ). The skill
    * score 1 − BS/BS_ref is the standard "is this model better than the
    * prior?" readout a labeling pipeline gates on before trusting scores.
    *
    * Scale shape: one pass over the scored frame — (p−y)² per row, exact
    * decimal sum, one divide; the scored frame itself is the memoized
    * GD-eval substrate. Determinism: p is 6-dp-rounded before squaring, the
    * sum rides [[graft.functions.Deterministic.dsumFine]], and the
    * base-rate reference is a handful of IEEE ops on exact counts, mirrored
    * expression-for-expression; the degenerate one-class corpus (BS_ref =
    * 0) yields NULL skill via the NULLIF convention.
    */
  private val mlBrierScore = Q(
    "ml_brier_score",
    (s, dir) => {
      val d = col("p") - col("y")
      val mo = logregScores(s, dir).agg(
        count(lit(1)).as("n_scored"),
        sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("n_pos"),
        graft.functions.Deterministic.dsumFine(d * d).as("se"))
      val rate = col("n_pos").cast("double") / col("n_scored").cast("double")
      val ref = rate * (lit(1.0) - rate)
      mo.select(col("n_scored"),
        round(rate, 6).as("base_rate"),
        round(col("se") / col("n_scored"), 6).as("brier"),
        round(ref, 6).as("brier_ref"),
        round(lit(1.0) - (col("se") / col("n_scored")) /
          when(ref =!= 0.0, ref), 6).as("brier_skill"))
    },
    Some(scoresSqlPrefix +
      """mo AS (SELECT count(*) AS n_scored,
        |    CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |    CAST(SUM(CAST((p - y) * (p - y) AS DECIMAL(38,20))) AS DOUBLE) AS se
        |  FROM scores)
        |SELECT n_scored, round(CAST(n_pos AS DOUBLE) / n_scored, 6) AS base_rate,
        |  round(se / n_scored, 6) AS brier,
        |  round((CAST(n_pos AS DOUBLE) / n_scored) * (1.0 - CAST(n_pos AS DOUBLE) / n_scored), 6) AS brier_ref,
        |  round(1.0 - (se / n_scored) /
        |    NULLIF((CAST(n_pos AS DOUBLE) / n_scored) * (1.0 - CAST(n_pos AS DOUBLE) / n_scored), 0.0), 6) AS brier_skill
        |FROM mo""".stripMargin))

  /** Cohen's κ of the thresholded classifier (p ≥ 0.5) against the labels —
    * chance-corrected agreement: accuracy rewards a majority-class guesser
    * on imbalanced labels, κ subtracts exactly that (p_e, the agreement two
    * independent raters with these marginals reach by chance). The standard
    * inter-annotator / weak-labeler audit statistic for a labeling
    * pipeline.
    *
    * Scale shape: ONE conditional aggregate over the scored frame yields
    * the whole confusion matrix (no joins); κ is then a handful of IEEE
    * ops on exact longs — marginal products carried in DECIMAL(38,0)
    * (tp·n ≳ 2⁶³ at lake scale) and cast once. Degenerate marginals
    * (p_e = 1: both raters constant) yield NULL κ via NULLIF.
    */
  private val mlCohensKappa = Q(
    "ml_cohens_kappa",
    (s, dir) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val yhat = (col("p") >= 0.5).cast("int")
      val cm = logregScores(s, dir).agg(
        count(lit(1)).as("n_scored"),
        sum(when(col("y") === 1.0 && yhat === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("y") === 0.0 && yhat === 1, 1L).otherwise(0L)).as("fp"),
        sum(when(col("y") === 1.0 && yhat === 0, 1L).otherwise(0L)).as("fn"),
        sum(when(col("y") === 0.0 && yhat === 0, 1L).otherwise(0L)).as("tn"))
      val n2 = (col("n_scored").cast(dec) * col("n_scored")).cast("double")
      val po = (col("tp") + col("tn")).cast("double") / col("n_scored").cast("double")
      val pe = (((col("tp") + col("fp")).cast(dec) * (col("tp") + col("fn")) +
        (col("fn") + col("tn")).cast(dec) * (col("fp") + col("tn"))).cast("double")) / n2
      cm.select(col("n_scored"), col("tp"), col("fp"), col("fn"), col("tn"),
        round(po, 6).as("po"), round(pe, 6).as("pe"),
        round((po - pe) / when(lit(1.0) - pe =!= 0.0, lit(1.0) - pe), 6)
          .as("kappa"))
    },
    Some(scoresSqlPrefix +
      """cm AS (SELECT count(*) AS n_scored,
        |    CAST(SUM(CASE WHEN y = 1.0 AND p >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(SUM(CASE WHEN y = 0.0 AND p >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(SUM(CASE WHEN y = 1.0 AND p < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(SUM(CASE WHEN y = 0.0 AND p < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |  FROM scores),
        |k AS (SELECT *,
        |    CAST(tp + tn AS DOUBLE) / n_scored AS po,
        |    CAST(CAST(tp + fp AS DECIMAL(38,0)) * (tp + fn)
        |         + CAST(fn + tn AS DECIMAL(38,0)) * (fp + tn) AS DOUBLE)
        |      / CAST(CAST(n_scored AS DECIMAL(38,0)) * n_scored AS DOUBLE) AS pe
        |  FROM cm)
        |SELECT n_scored, tp, fp, fn, tn, round(po, 6) AS po, round(pe, 6) AS pe,
        |  round((po - pe) / NULLIF(1.0 - pe, 0.0), 6) AS kappa
        |FROM k""".stripMargin))

  /** k-th-NN distance outlier scores: each vector's 5th-nearest-neighbor
    * cosine, lowest 15 reported — the density-based "this embedding sits in
    * no neighborhood" triage (mislabeled points, encoder failures, format
    * leaks all surface as isolated vectors). The kNN-distance score is the
    * standard precursor to LOF, without LOF's second neighborhood pass.
    *
    * Scale honesty: scores come off the [[exactTop5]] SAMPLED ground
    * truth (a ~256–512-vector deterministic residue-class query panel
    * against the full candidate corpus — linear-in-corpus, the r10
    * verdict's fix for the all-pairs build), so the triage reads "the 15
    * most isolated vectors OF THE PANEL" — the estimator a 10⁹-vector
    * deployment runs anyway. The production path additionally swaps the
    * exact panel scoring for [[lshTopK]]/[[ivfTopK]] candidates (the
    * sim_mutual_knn wiring) and keeps this ranking readout unchanged; an
    * LSH 5th-NN cosine is a lower bound on the true one, so LSH-scored
    * "outliers" are a superset to re-check exactly. Determinism: the
    * sample is a residue class (no rand()), the rank window uses the
    * round-9 + id tiebreak, scores round at 6 dp.
    */
  private val simKnnOutlier = Q(
    "sim_knn_outlier",
    (s, dir) => exactTop5(s, dir)
      .filter(col("rank") === 5)
      .select(col("q_id").as("vec_id"), round(col("cos"), 6).as("knn5_cos"),
        col("cos"))
      .orderBy(round(col("cos"), 9).asc, col("vec_id")).limit(15)
      .select("vec_id", "knn5_cos"),
    Some(s"""WITH e AS (SELECT vec_id, embedding,
           |   sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
           | FROM embeddings),
           |$mmSql,
           |p AS (SELECT q.vec_id AS q_id, n.vec_id AS n_id,
           |   list_sum(list_transform(range(1, 65),
           |     i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)))
           |     / (q.nrm * n.nrm) AS cos
           | FROM e q JOIN e n ON n.vec_id != q.vec_id
           | WHERE q.vec_id % (SELECT m FROM mm) = 3),
           |r AS (SELECT q_id, cos,
           |   CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |     ORDER BY round(cos, 9) DESC, n_id) AS INT) AS rank FROM p)
           |SELECT q_id AS vec_id, round(cos, 6) AS knn5_cos
           |FROM r WHERE rank = 5
           |ORDER BY round(cos, 9) ASC, q_id LIMIT 15""".stripMargin))

  /** Pairwise-cosine histogram of a deterministic corpus sample — the
    * embedding-space HEALTH CHECK run before any similarity thresholding:
    * a healthy encoder gives a roughly centered unimodal pair-sim
    * distribution; collapse (all pairs ≈ 1), anisotropy (mass shifted
    * high) or dead dimensions show up here first, and every threshold the
    * dedup/ANN family uses (0.8 near-dup, 0.4 range query) should be read
    * against this curve.
    *
    * Scale shape: the sample is a deterministic residue class (vec_id ≡ 0
    * mod 8 — no rand(), stable under reruns), so the pair join is
    * (n/8)² — the modulus is the knob that keeps the sampled pair count
    * ~constant as the corpus grows. One self-join on the sample, one
    * two-phase bin count; bins are closed-form from the cosine.
    */
  private val simPairHist = Q(
    "sim_pair_hist",
    (s, dir) => {
      VectorKernels.register(s)
      val e = emb(s, dir).filter(col("vec_id") % 8 === 0)
        .select(col("vec_id"), col("embedding"), l2norm(col("embedding")).as("nrm"))
      val a = e.toDF("q_id", "q_emb", "q_nrm")
      val b = e.toDF("n_id", "n_emb", "n_nrm")
      val pairs = a.join(b, col("q_id") < col("n_id"))
        .withColumn("cos",
          dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
      val h = pairs
        .withColumn("bin", least(greatest(
          floor((round(col("cos"), 9) + 1.0) * 10).cast("int"), lit(0)), lit(19)))
        .groupBy("bin").agg(count(lit(1)).as("cnt"))
      val tot = h.agg(sum(col("cnt")).as("t"))
      h.crossJoin(broadcast(tot))
        .select(col("bin"),
          round(col("bin").cast("double") / 10 - 1.0, 1).as("lo"),
          round(col("bin").cast("double") / 10 - 0.9, 1).as("hi"),
          col("cnt"),
          round(col("cnt").cast("double") / col("t").cast("double"), 6).as("share"))
        .orderBy("bin")
    },
    Some("""WITH e AS (SELECT vec_id, embedding,
           |   sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
           | FROM embeddings WHERE vec_id % 8 = 0),
           |p AS (SELECT
           |   list_sum(list_transform(range(1, 65),
           |     i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)))
           |     / (q.nrm * n.nrm) AS cos
           | FROM e q JOIN e n ON q.vec_id < n.vec_id),
           |h AS (SELECT least(greatest(CAST(floor((round(cos, 9) + 1.0) * 10) AS INT), 0), 19) AS bin,
           |   count(*) AS cnt FROM p GROUP BY 1),
           |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM h)
           |SELECT bin, round(CAST(bin AS DOUBLE) / 10 - 1.0, 1) AS lo,
           |  round(CAST(bin AS DOUBLE) / 10 - 0.9, 1) AS hi, cnt,
           |  round(CAST(cnt AS DOUBLE) / CAST(t AS DOUBLE), 6) AS share
           |FROM h CROSS JOIN tot ORDER BY bin""".stripMargin))

  /** LSH recall@5 against exact ground truth as a DECLARED query — the
    * ANN-quality readout promoted from spec-land to the oracle-checked
    * surface (the r9 verdict asked the scaled-geometry story to have a
    * green row, not just a probe): both paths are deterministic (literal
    * seed-42 planes, round-9 + id tiebreaks), so DuckDB replays LSH
    * candidates AND the exact ranking and the recall is hash-checked, not
    * just asserted. A pipeline runs this after every re-tune of
    * (bands, bits) — recall is THE acceptance metric for the geometry.
    *
    * Scale honesty: ground truth IS a query sample — [[exactTop5]]'s
    * deterministic residue-class panel (~256–512 queries at any corpus)
    * against full-corpus candidates, so the exact side is linear-in-corpus
    * with a bounded constant; recall@5 on a fixed panel is the estimator a
    * 10⁹-vector deployment runs, and the LSH side plus the recall
    * semi-join stay linear-in-candidates. The oracle replays the same
    * residue filter, so the sampled recall is still hash-checked.
    */
  private val simLshRecall = Q(
    "sim_lsh_recall",
    (s, dir) => {
      val exact = exactTop5(s, dir).select("q_id", "n_id")
      val got = lshTop5Auto(s, dir).select("q_id", "n_id")
      val hits = exact.join(got, Seq("q_id", "n_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      exact.agg(countDistinct(col("q_id")).as("n_queries"),
          count(lit(1)).as("n_exact_pairs"))
        .crossJoin(broadcast(hits))
        .select(col("n_queries"), col("n_exact_pairs"), col("n_hits"),
          round(col("n_hits").cast("double") /
            col("n_exact_pairs").cast("double"), 6).as("recall_at5"))
    },
    Some(lshOracleCtesAuto +
      s""", $mmSql,
        |exp AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |      / (a.nrm * b.nrm) AS cos
        |  FROM e a JOIN e b ON b.vec_id != a.vec_id
        |  WHERE a.vec_id % (SELECT m FROM mm) = 3),
        |exr AS (SELECT q_id, n_id, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
        |    ORDER BY round(cos, 9) DESC, n_id) AS INT) AS xr FROM exp),
        |ex AS (SELECT q_id, n_id FROM exr WHERE xr <= 5),
        |got AS (SELECT q_id, n_id FROM r WHERE rank <= 5),
        |h AS (SELECT count(*) AS n_hits FROM ex
        |      WHERE EXISTS (SELECT 1 FROM got
        |                    WHERE got.q_id = ex.q_id AND got.n_id = ex.n_id))
        |SELECT (SELECT count(DISTINCT q_id) FROM ex) AS n_queries,
        |  (SELECT count(*) FROM ex) AS n_exact_pairs, n_hits,
        |  round(CAST(n_hits AS DOUBLE) / (SELECT count(*) FROM ex), 6) AS recall_at5
        |FROM h""".stripMargin))

  /** Cost-sensitive threshold selection — the deployment half the F1 sweep
    * leaves open: with asymmetric error costs (a missed positive = 5× a
    * false alarm here — the curation default, where a leaked bad document
    * outweighs an over-filtered good one), the operating threshold is the
    * arg-min of expected cost, not max-F1. Same 0.1-wide threshold grid and
    * confusion algebra as [[mlF1Sweep]], one extra linear combine per row.
    */
  private val mlThresholdCost = Q(
    "ml_threshold_cost",
    (s, dir) => {
      val bkt = logregScores(s, dir)
        .withColumn("b", least(floor(col("p") * 10), lit(9.0)).cast("int"))
        .groupBy("b")
        .agg(sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("np"),
          sum(when(col("y") === 1.0, 0L).otherwise(1L)).as("nn"))
      val tot = bkt.agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"))
      val wTop = Window.orderBy(col("b").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val conf = bkt.select(col("b"),
          sum(col("np")).over(wTop).as("tp"), sum(col("nn")).over(wTop).as("fp"))
        .crossJoin(broadcast(tot))
        .select(col("b"), col("tp"), col("fp"),
          (col("n_pos") - col("tp")).as("fn"))
        .withColumn("cost", col("fp") + lit(5L) * col("fn"))
      val best = conf.agg(min(col("cost")).as("bc"))
      conf.crossJoin(broadcast(best))
        .select((col("b").cast("double") / 10).as("threshold"),
          col("tp"), col("fp"), col("fn"), col("cost"),
          (col("cost") === col("bc")).as("is_best"))
        .orderBy("threshold")
    },
    Some(scoresSqlPrefix +
      """bkt AS (SELECT CAST(least(floor(p * 10), 9.0) AS INT) AS b,
        |    SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS np,
        |    SUM(CASE WHEN y = 1.0 THEN 0 ELSE 1 END) AS nn
        |  FROM scores GROUP BY 1),
        |tot AS (SELECT CAST(SUM(np) AS BIGINT) AS n_pos FROM bkt),
        |conf AS (SELECT b,
        |    CAST(SUM(np) OVER (ORDER BY b DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
        |    CAST(SUM(nn) OVER (ORDER BY b DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fp
        |  FROM bkt),
        |c AS (SELECT b, tp, fp, n_pos - tp AS fn,
        |    fp + 5 * (n_pos - tp) AS cost FROM conf CROSS JOIN tot),
        |best AS (SELECT min(cost) AS bc FROM c)
        |SELECT CAST(b AS DOUBLE) / 10 AS threshold, tp, fp,
        |  CAST(fn AS BIGINT) AS fn, CAST(cost AS BIGINT) AS cost,
        |  cost = bc AS is_best
        |FROM c CROSS JOIN best ORDER BY threshold""".stripMargin))

  /** Matthews-correlation sweep over the same 0.1-wide threshold grid as
    * [[mlF1Sweep]]/[[mlThresholdCost]] — the BALANCED single-number
    * threshold metric the pair completes: F1 ignores true negatives
    * entirely and the cost curve needs the cost ratio as an input, while
    * MCC = (TP·TN − FP·FN)/√((TP+FP)(TP+FN)(TN+FP)(TN+FN)) stays
    * informative under class imbalance (the curation norm — "bad document"
    * prevalence is a few percent) and is the metric of record for
    * classifier comparisons on skewed data (Chicco & Jurman 2020).
    *
    * Scale shape: identical to the sibling sweeps — one linear bucket
    * count, an 11-row cumulative window, closed-form algebra. Determinism:
    * the TP·TN − FP·FN numerator runs in DECIMAL(38,0) (counts² pass 2⁶³
    * near 10¹⁰ rows — the quality_kendall_tau stance); the four
    * denominator factors are exact longs (< 2⁵³) so their double sqrts are
    * identical-on-identical-inputs; degenerate factors yield NULL mcc.
    */
  private val mlMccSweep = Q(
    "ml_mcc_sweep",
    (s, dir) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val bkt = logregScores(s, dir)
        .withColumn("b", least(floor(col("p") * 10), lit(9.0)).cast("int"))
        .groupBy("b")
        .agg(sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("np"),
          sum(when(col("y") === 1.0, 0L).otherwise(1L)).as("nn"))
      val tot = bkt.agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"))
      val wTop = Window.orderBy(col("b").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val conf = bkt.select(col("b"),
          sum(col("np")).over(wTop).as("tp"), sum(col("nn")).over(wTop).as("fp"))
        .crossJoin(broadcast(tot))
        .select(col("b"), col("tp"), col("fp"),
          (col("n_pos") - col("tp")).as("fn"),
          (col("n_neg") - col("fp")).as("tn"))
      val num = (col("tp").cast(dec) * col("tn").cast(dec) -
        col("fp").cast(dec) * col("fn").cast(dec)).cast("double")
      val den = sqrt((col("tp") + col("fp")).cast("double")) *
        sqrt((col("tp") + col("fn")).cast("double")) *
        sqrt((col("tn") + col("fp")).cast("double")) *
        sqrt((col("tn") + col("fn")).cast("double"))
      conf
        .select((col("b").cast("double") / 10).as("threshold"),
          col("tp"), col("fp"), col("fn"), col("tn"),
          round(num / when(den =!= 0.0, den), 6).as("mcc"))
        .orderBy("threshold")
    },
    Some(scoresSqlPrefix +
      """bkt AS (SELECT CAST(least(floor(p * 10), 9.0) AS INT) AS b,
        |    SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS np,
        |    SUM(CASE WHEN y = 1.0 THEN 0 ELSE 1 END) AS nn
        |  FROM scores GROUP BY 1),
        |tot AS (SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
        |    CAST(SUM(nn) AS BIGINT) AS n_neg FROM bkt),
        |conf AS (SELECT b,
        |    CAST(SUM(np) OVER (ORDER BY b DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tp,
        |    CAST(SUM(nn) OVER (ORDER BY b DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS fp
        |  FROM bkt),
        |c AS (SELECT b, tp, fp, n_pos - tp AS fn, n_neg - fp AS tn
        |  FROM conf CROSS JOIN tot)
        |SELECT CAST(b AS DOUBLE) / 10 AS threshold, tp, fp,
        |  CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
        |  round(CAST(CAST(tp AS DECIMAL(38,0)) * CAST(tn AS DECIMAL(38,0))
        |      - CAST(fp AS DECIMAL(38,0)) * CAST(fn AS DECIMAL(38,0)) AS DOUBLE)
        |    / NULLIF(sqrt(CAST(tp + fp AS DOUBLE)) * sqrt(CAST(tp + fn AS DOUBLE))
        |      * sqrt(CAST(tn + fp AS DOUBLE)) * sqrt(CAST(tn + fn AS DOUBLE)), 0.0), 6) AS mcc
        |FROM c ORDER BY threshold""".stripMargin))

  /** Hubness profile of the embedding space — the k-occurrence
    * distribution (how many top-5 lists each vector appears in) plus its
    * top hubs: in high dimensions a few points become near-neighbors of
    * EVERYTHING (Radovanović et al. 2010), silently dominating kNN votes,
    * retrieval results and mutual-kNN graphs; the max k-occurrence and
    * the share of never-retrieved "antihubs" are the two numbers that say
    * whether hub mitigation (mutual-kNN's symmetrization, local scaling)
    * is needed. Completes the embedding-health panel with
    * [[simPairHist]] (pair-sim shape) and [[simKnnOutlier]] (isolation).
    *
    * Scale honesty: k-occurrence is counted over the [[exactTop5]]
    * SAMPLED query panel (hubs emerge in any sufficiently large query
    * sample — the estimator a 10⁹-vector deployment runs; the build is
    * linear-in-corpus), and the antihub count is likewise read WITHIN the
    * sampled residue class (class members never retrieved by any panel
    * query — a density comparable across corpus sizes, where "full-corpus
    * vectors never retrieved by ~256 queries" would degenerate to ≈ n);
    * production reads the SAME k-occurrence count off the ANN candidate
    * lists (sim_mutual_knn wiring) unchanged.
    */
  private val simHubness = Q(
    "sim_hubness",
    (s, dir) => {
      val e = emb(s, dir)
      val kocc = exactTop5(s, dir).groupBy("n_id").agg(count(lit(1)).as("k_occ"))
      val hubs = kocc.orderBy(col("k_occ").desc, col("n_id")).limit(10)
        .withColumn("hub_rank", row_number().over(
          Window.orderBy(col("k_occ").desc, col("n_id"))))
      val anti = e.crossJoin(broadcast(sampleModulus(e)))
        .filter(col("vec_id") % col("m") === 3)
        .select(col("vec_id"))
        .join(kocc.select(col("n_id").as("vec_id")), Seq("vec_id"), "left_anti")
        .agg(count(lit(1)).as("n_antihubs"))
      hubs.crossJoin(broadcast(anti))
        .select(col("hub_rank"), col("n_id").as("vec_id"), col("k_occ"),
          col("n_antihubs"))
        .orderBy("hub_rank")
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding,
           |   sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
           | FROM embeddings),
           |$mmSql,
           |p AS (SELECT q.vec_id AS q_id, n.vec_id AS n_id,
           |   list_sum(list_transform(range(1, 65),
           |     i -> CAST(q.embedding[i] AS DOUBLE) * CAST(n.embedding[i] AS DOUBLE)))
           |     / (q.nrm * n.nrm) AS cos
           | FROM e q JOIN e n ON n.vec_id != q.vec_id
           | WHERE q.vec_id % (SELECT m FROM mm) = 3),
           |r AS (SELECT q_id, n_id,
           |   CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |     ORDER BY round(cos, 9) DESC, n_id) AS INT) AS rank FROM p),
           |kocc AS (SELECT n_id, count(*) AS k_occ FROM r WHERE rank <= 5 GROUP BY 1),
           |ah AS (SELECT count(*) AS n_antihubs FROM e
           |  WHERE vec_id % (SELECT m FROM mm) = 3
           |    AND vec_id NOT IN (SELECT n_id FROM kocc)),
           |hubs AS (SELECT CAST(row_number() OVER (ORDER BY k_occ DESC, n_id) AS INT)
           |    AS hub_rank, n_id AS vec_id, k_occ
           |  FROM kocc ORDER BY k_occ DESC, n_id LIMIT 10)
           |SELECT hub_rank, vec_id, k_occ, n_antihubs
           |FROM hubs CROSS JOIN ah ORDER BY hub_rank""".stripMargin))

  /** IVF recall@5 against the sampled exact ground truth — the
    * [[simLshRecall]] readout for the SECOND ANN path: LSH and IVF trade
    * recall differently (hash-bucket collisions vs probed-cell coverage),
    * and a pipeline choosing between them — or tuning nprobe — needs both
    * priced on the same panel by the same metric. Query side is the
    * [[exactTop5]] residue-class panel, so the exact side is
    * linear-in-corpus and both engines replay the full IVF pipeline
    * (deterministic seed centroids, round-9 + id tiebreaks) — the recall
    * number is hash-checked, not asserted.
    *
    * Scale shape: centroid assignment is one broadcast pass (K = 8 cells);
    * the panel's probes are a broadcast ≤ 3·panel frame against the
    * assigned corpus — linear in candidates; the recall semi-join is
    * panel-sized.
    */
  private val simIvfRecall = Q(
    "sim_ivf_recall",
    (s, dir) => {
      VectorKernels.register(s)
      val raw = Tables.load(s, dir, "embeddings")
      val e = emb(s, dir)
      val cents = broadcast(raw.filter(col("vec_id") < IvfK)
        .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"),
          l2norm(col("embedding")).as("c_nrm")))
      val withN = e.select(col("vec_id"), col("embedding"),
        l2norm(col("embedding")).as("nrm"))
      val wAssign = Window.partitionBy("vec_id")
        .orderBy(round(col("cos_c"), 9).desc, col("cent_id"))
      val assigned = withN.crossJoin(broadcast(cents))
        .withColumn("cos_c",
          dot(col("embedding"), col("c_emb")) / (col("nrm") * col("c_nrm")))
        .withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1)
        .select(col("cent_id"), col("vec_id").as("n_id"),
          col("embedding").as("n_emb"), col("nrm").as("n_nrm"))
      val panel = withN.crossJoin(broadcast(sampleModulus(e)))
        .filter(col("vec_id") % col("m") === 3)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
          col("nrm").as("q_nrm"))
      val wProbe = Window.partitionBy("q_id")
        .orderBy(round(col("cos_c"), 9).desc, col("cent_id"))
      val probes = panel.crossJoin(broadcast(cents))
        .withColumn("cos_c",
          dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
        .withColumn("rn", row_number().over(wProbe))
        .filter(col("rn") <= IvfNProbe)
        .select(col("q_id"), col("q_emb"), col("q_nrm"), col("cent_id"))
      val wRank = Window.partitionBy("q_id")
        .orderBy(round(col("cos"), 9).desc, col("n_id"))
      val got = broadcast(probes).join(assigned, "cent_id")
        .filter(col("q_id") =!= col("n_id"))
        .withColumn("cos",
          dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
        .withColumn("rank", row_number().over(wRank))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("n_id"))
      val exact = exactTop5(s, dir).select("q_id", "n_id")
      val hits = exact.join(got, Seq("q_id", "n_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      exact.agg(countDistinct(col("q_id")).as("n_queries"),
          count(lit(1)).as("n_exact_pairs"))
        .crossJoin(broadcast(hits))
        .select(col("n_queries"), col("n_exact_pairs"), col("n_hits"),
          round(col("n_hits").cast("double") /
            col("n_exact_pairs").cast("double"), 6).as("recall_at5"))
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding,
           |   sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
           | FROM embeddings),
           |$mmSql,
           |c AS (SELECT vec_id AS cent_id, embedding AS c_emb, nrm AS c_nrm
           |      FROM e WHERE vec_id < 8),
           |asg AS (SELECT cent_id, vec_id AS n_id, embedding AS n_emb, nrm AS n_nrm FROM (
           |   SELECT e.vec_id, e.embedding, e.nrm, c.cent_id,
           |     ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY round(
           |       list_sum(list_transform(range(1, 65),
           |         i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.c_emb[i] AS DOUBLE)))
           |       / (e.nrm * c.c_nrm), 9) DESC, c.cent_id) AS rn
           |   FROM e CROSS JOIN c) WHERE rn = 1),
           |pr AS (SELECT q_id, q_emb, q_nrm, cent_id FROM (
           |   SELECT e.vec_id AS q_id, e.embedding AS q_emb, e.nrm AS q_nrm, c.cent_id,
           |     ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY round(
           |       list_sum(list_transform(range(1, 65),
           |         i -> CAST(e.embedding[i] AS DOUBLE) * CAST(c.c_emb[i] AS DOUBLE)))
           |       / (e.nrm * c.c_nrm), 9) DESC, c.cent_id) AS rn
           |   FROM e CROSS JOIN c
           |   WHERE e.vec_id % (SELECT m FROM mm) = 3) WHERE rn <= 3),
           |sc AS (SELECT pr.q_id, a.n_id,
           |    list_sum(list_transform(range(1, 65),
           |      i -> CAST(pr.q_emb[i] AS DOUBLE) * CAST(a.n_emb[i] AS DOUBLE)))
           |      / (pr.q_nrm * a.n_nrm) AS cos
           |  FROM pr JOIN asg a USING (cent_id) WHERE pr.q_id != a.n_id),
           |got AS (SELECT q_id, n_id FROM (
           |    SELECT q_id, n_id, CAST(ROW_NUMBER() OVER (
           |      PARTITION BY q_id ORDER BY round(cos, 9) DESC, n_id) AS INT) AS rank
           |    FROM sc) WHERE rank <= 5),
           |exp AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
           |    list_sum(list_transform(range(1, 65),
           |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
           |      / (a.nrm * b.nrm) AS cos
           |  FROM e a JOIN e b ON b.vec_id != a.vec_id
           |  WHERE a.vec_id % (SELECT m FROM mm) = 3),
           |ex AS (SELECT q_id, n_id FROM (
           |    SELECT q_id, n_id, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
           |      ORDER BY round(cos, 9) DESC, n_id) AS INT) AS xr FROM exp)
           |  WHERE xr <= 5),
           |h AS (SELECT count(*) AS n_hits FROM ex
           |      WHERE EXISTS (SELECT 1 FROM got
           |                    WHERE got.q_id = ex.q_id AND got.n_id = ex.n_id))
           |SELECT (SELECT count(DISTINCT q_id) FROM ex) AS n_queries,
           |  (SELECT count(*) FROM ex) AS n_exact_pairs, n_hits,
           |  round(CAST(n_hits AS DOUBLE) / (SELECT count(*) FROM ex), 6) AS recall_at5
           |FROM h""".stripMargin))

  /** Learning curve — AUC of the GD linear probe trained on 25/50/75/100 %
    * deterministic residue subsets, each evaluated on the FULL corpus: the
    * "does more data still help?" readout that decides whether the next
    * collection/curation dollar buys model quality or the curve has
    * flattened (and its inverted form — quality per subset — is the data
    * ablation every mixture decision reads). Subsets nest (vec_id % 4 < f),
    * so the curve is monotone in information, and everything is replayed
    * chain-for-chain in the oracle: four independent 2-step GD trainings,
    * four rank-sum AUC evaluations.
    *
    * Scale shape (r14): the four chains ride ONE fraction-tagged plan —
    * 2.5 n·d tagged feature rows (the union of the nested subsets), each
    * GD phase a single (f, …)-keyed linear shuffle, one full-corpus
    * scoring pass for all four models, and one bounded level frame
    * windowed per fraction. Constant small multiple of the single
    * train/eval pair, all linear — and a constant number of stage waves
    * instead of four serial chains. Determinism: the ml_auc stance
    * end-to-end (fine-decimal sums, 6-dp score rounding).
    */
  private val mlLearningCurve = Q(
    "ml_learning_curve",
    (s, dir) => {
      // ONE fraction-tagged plan instead of four unioned chains (r14): a
      // vector with residue r = vec_id % 4 trains every fraction f > r, so
      // the explode is tagged with its chain memberships (2.5 n·d rows
      // total — the same volume the four per-chain explodes processed) and
      // each GD phase is ONE shuffle keyed by (f, …) instead of four. The
      // r13 shape held 4 chains × (2 steps × 2 shuffles) + 4 full-corpus
      // eval joins ≈ 25 serial stage waves (each weight broadcast is its
      // own job); at bench scale the row volume is trivial and the
      // latency was pure stage count — measured 11.5 → ~4 s warm at
      // sf0.1 (same-session canary). Value-identical by construction: the
      // fine-decimal sums are order- and grouping-independent, so every
      // per-(f, vec_id) margin, per-(f, i) gradient and per-f AUC is the
      // exact number the per-chain plan produced — the oracle still
      // replays four independent chains and the hashes must not move.
      import graft.functions.Deterministic.dsumFine
      val e = emb(s, dir)
      val xyAll = e.select(col("vec_id"),
          (col("label") % 2).cast("double").as("y"),
          (col("vec_id") % 4).cast("int").as("res"),
          posexplode(col("embedding")).as(Seq("i", "xf")))
        .select(col("vec_id"), col("y"), col("res"), col("i"),
          col("xf").cast("double").as("x"))
      import s.implicits._
      val fmap = (1 to 4).flatMap(f => (0 until f).map(r => (f, r)))
        .toDF("f", "res")
      val xyF = xyAll.join(broadcast(fmap), "res")
      // n_train per fraction: residue-class counts folded through the
      // same membership map — never a second corpus pass per chain
      val cnts = e.select((col("vec_id") % 4).cast("int").as("res"))
        .groupBy("res").agg(count(lit(1)).as("c"))
        .join(broadcast(fmap), "res")
        .groupBy("f").agg(sum(col("c")).as("n"))
      val dims = e.select(col("embedding")).limit(1)
        .select(posexplode(col("embedding")).as(Seq("i", "xf")))
        .select(col("i"))
      var w = dims.crossJoin((1 to 4).toDF("f"))
        .select(col("f"), col("i"), lit(0.0).as("w"))
      for (_ <- 1 to 2) {
        val z = xyF.join(broadcast(w), Seq("f", "i"))
          .groupBy("f", "vec_id", "y")
          .agg(dsumFine(col("x") * col("w")).as("z"))
        val resid = z.select(col("f"), col("vec_id"),
          (lit(1.0) / (lit(1.0) + exp(-col("z"))) - col("y")).as("r"))
        // shuffle_hash for the same reason as logregSteps: resid is
        // corpus-sized and must never broadcast at production row counts
        val grad = xyF.join(resid.hint("shuffle_hash"), Seq("f", "vec_id"))
          .groupBy("f", "i")
          .agg(dsumFine(col("x") * col("r")).as("g"))
          .join(broadcast(cnts), "f")
          .select(col("f"), col("i"), (col("g") / col("n")).as("g"))
        w = w.join(grad, Seq("f", "i"))
          .select(col("f"), col("i"), (col("w") - lit(0.1) * col("g")).as("w"))
      }
      // all four models score the FULL corpus in one pass: the broadcast
      // weight table carries (f, i, w), so the explode fans out ×4 and
      // map-side partial aggregation collapses it back to 4n margin groups
      val scores = xyAll.join(broadcast(w), "i")
        .groupBy("f", "vec_id", "y")
        .agg(dsumFine(col("x") * col("w")).as("z"))
        .select(col("f"), col("y"),
          round(lit(1.0) / (lit(1.0) + exp(-col("z"))), 6).as("p"))
      val lvl = scores.groupBy("f", "p")
        .agg(sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("np"),
          sum(when(col("y") === 1.0, 0L).otherwise(1L)).as("nn"))
      val below = coalesce(sum(col("nn")).over(
        Window.partitionBy("f").orderBy("p")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
      val tot = lvl.groupBy("f")
        .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"))
      lvl.select(col("f"), col("np"), col("nn"), below.as("below"))
        .join(broadcast(tot), "f")
        .groupBy("f", "n_pos", "n_neg")
        .agg(round(dsumFine(col("np").cast("double") *
            (col("below").cast("double") + col("nn").cast("double") / 2.0)) /
          (col("n_pos").cast("double") * col("n_neg").cast("double")), 6)
          .as("auc"))
        .join(broadcast(cnts), "f")
        .select((col("f") * lit(0.25)).as("fraction"), col("n").as("n_train"),
          col("n_pos"), col("n_neg"), col("auc"))
        .orderBy("fraction")
    },
    Some {
      def chain(f: Int): String = {
        val m = s"f$f"
        def iter(k: Int): String = {
          val prev = s"w${k - 1}_$m"
          s"""z${k}_$m AS (SELECT x.vec_id, x.y,
             |    CAST(SUM(CAST(x.x * $prev.w AS DECIMAL(38,20))) AS DOUBLE) AS z
             |  FROM x_$m x JOIN $prev ON x.i = $prev.i GROUP BY x.vec_id, x.y),
             |r${k}_$m AS (SELECT vec_id, 1.0 / (1.0 + exp(-z)) - y AS r FROM z${k}_$m),
             |w${k}_$m AS (SELECT $prev.i,
             |    $prev.w - 0.1 * (CAST(SUM(CAST(x.x * r.r AS DECIMAL(38,20))) AS DOUBLE)
             |                     / (SELECT n FROM cnt_$m)) AS w
             |  FROM x_$m x JOIN r${k}_$m r ON x.vec_id = r.vec_id
             |  JOIN $prev ON x.i = $prev.i
             |  GROUP BY $prev.i, $prev.w)""".stripMargin
        }
        s"""x_$m AS (SELECT * FROM x WHERE vec_id % 4 < $f),
           |cnt_$m AS (SELECT count(DISTINCT vec_id) AS n FROM x_$m),
           |w0_$m AS (SELECT DISTINCT i, CAST(0.0 AS DOUBLE) AS w FROM x),
           |${iter(1)},
           |${iter(2)},
           |sc_$m AS (SELECT x.y,
           |    round(1.0 / (1.0 + exp(-(CAST(SUM(CAST(x.x * w.w AS DECIMAL(38,20)))
           |      AS DOUBLE)))), 6) AS p
           |  FROM x JOIN w2_$m w ON x.i = w.i GROUP BY x.vec_id, x.y),
           |lvl_$m AS (SELECT p, SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS np,
           |    SUM(CASE WHEN y = 1.0 THEN 0 ELSE 1 END) AS nn
           |  FROM sc_$m GROUP BY p),
           |cw_$m AS (SELECT np, nn, COALESCE(SUM(nn) OVER (ORDER BY p
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
           |  FROM lvl_$m),
           |tot_$m AS (SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
           |    CAST(SUM(nn) AS BIGINT) AS n_neg FROM lvl_$m),
           |a_$m AS (SELECT CAST(${f * 0.25} AS DOUBLE) AS fraction,
           |    (SELECT n FROM cnt_$m) AS n_train, tot.n_pos, tot.n_neg,
           |    round(CAST(SUM(CAST(CAST(np AS DOUBLE)
           |        * (CAST(below AS DOUBLE) + CAST(nn AS DOUBLE) / 2.0)
           |      AS DECIMAL(38,20))) AS DOUBLE)
           |      / (CAST(tot.n_pos AS DOUBLE) * CAST(tot.n_neg AS DOUBLE)), 6) AS auc
           |  FROM cw_$m, tot_$m tot GROUP BY tot.n_pos, tot.n_neg)""".stripMargin
      }
      """WITH x AS (SELECT vec_id, CAST(label % 2 AS DOUBLE) AS y,
        |        CAST(i - 1 AS INT) AS i, CAST(embedding[i] AS DOUBLE) AS x
        |      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
        |""".stripMargin +
        (1 to 4).map(chain).mkString(",\n") + "\n" +
        (1 to 4).map(f => s"SELECT * FROM a_f$f")
          .mkString("", "\nUNION ALL ", "\nORDER BY fraction")
    })

  /** Per-shard AUC with macro average — SLICE evaluation: one global AUC
    * hides a shard that ranks badly (a bad source, a bad ingestion day, a
    * language the model underserves), so eval stacks report the metric per
    * deterministic slice plus the unweighted macro mean, whose divergence
    * from the pooled number is itself the alarm. Shards here are the
    * vec_id % 4 residue classes (the hash-split stance — at production the
    * slice key is source/language/day; the plan is identical).
    *
    * Scale shape: the [[aucRankSum]] rank-sum construction with every
    * window PARTITIONED BY SHARD — the per-shard level frames stay
    * score-cardinality-bounded, the macro mean is a 4-row aggregate.
    * Determinism: scores round 6 dp before leveling, sums ride dsumFine.
    */
  private val mlGroupAuc = Q(
    "ml_group_auc",
    (s, dir) => {
      import graft.functions.Deterministic.dsumFine
      val lvl = logregScores(s, dir)
        .withColumn("shard", (col("vec_id") % 4).cast("int"))
        .groupBy("shard", "p")
        .agg(sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("np"),
          sum(when(col("y") === 1.0, 0L).otherwise(1L)).as("nn"))
      val below = coalesce(sum(col("nn")).over(
        Window.partitionBy("shard").orderBy("p")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
      val tot = lvl.groupBy("shard")
        .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"))
      val a = lvl.select(col("shard"), col("np"), col("nn"), below.as("below"))
        .join(broadcast(tot), "shard")
        .groupBy("shard", "n_pos", "n_neg")
        .agg(round(dsumFine(col("np").cast("double") *
            (col("below").cast("double") + col("nn").cast("double") / 2.0)) /
          (col("n_pos").cast("double") * col("n_neg").cast("double")), 6)
          .as("auc"))
      val macroAvg = a.agg(round(dsumFine(col("auc")) /
        count(lit(1)).cast("double"), 6).as("macro_auc"))
      a.crossJoin(broadcast(macroAvg))
        .select(col("shard"), col("n_pos"), col("n_neg"), col("auc"),
          col("macro_auc"))
        .orderBy("shard")
    },
    Some(scoresSqlPrefix +
      """lvl AS (SELECT CAST(vec_id % 4 AS INT) AS shard, p,
        |    SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS np,
        |    SUM(CASE WHEN y = 1.0 THEN 0 ELSE 1 END) AS nn
        |  FROM scores GROUP BY 1, 2),
        |cc AS (SELECT shard, np, nn,
        |    COALESCE(SUM(nn) OVER (PARTITION BY shard ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        |  FROM lvl),
        |tt AS (SELECT shard, CAST(SUM(np) AS BIGINT) AS n_pos,
        |    CAST(SUM(nn) AS BIGINT) AS n_neg FROM lvl GROUP BY 1),
        |a AS (SELECT cc.shard, tt.n_pos, tt.n_neg,
        |    round(CAST(SUM(CAST(CAST(np AS DOUBLE)
        |        * (CAST(below AS DOUBLE) + CAST(nn AS DOUBLE) / 2.0)
        |      AS DECIMAL(38,20))) AS DOUBLE)
        |      / (CAST(tt.n_pos AS DOUBLE) * CAST(tt.n_neg AS DOUBLE)), 6) AS auc
        |  FROM cc JOIN tt ON cc.shard = tt.shard
        |  GROUP BY cc.shard, tt.n_pos, tt.n_neg),
        |m AS (SELECT round(CAST(SUM(CAST(auc AS DECIMAL(38,20))) AS DOUBLE)
        |    / count(*), 6) AS macro_auc FROM a)
        |SELECT shard, n_pos, n_neg, auc, macro_auc
        |FROM a CROSS JOIN m ORDER BY shard""".stripMargin))

  // cumulative Poisson(1) CDF literals for the bootstrap weight draw —
  // fixed constants of the operator, written to full double precision so
  // both engines compare the identical thresholds
  private val PoissonCdf1 = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119)

  /** Poisson-bootstrap confidence interval for the Brier score — the
    * UNCERTAINTY the point metrics lack: "model B beats A by 0.003" means
    * nothing without an interval, and the classical bootstrap (resample n
    * rows WITH replacement) is unimplementable on a distributed corpus
    * without n shuffles. The Poisson trick (Chamandy et al. 2012): each
    * row draws an independent Poisson(1) weight PER REPLICATE — for large
    * n the replicate weight vector is indistinguishable from multinomial
    * resampling — so all 32 replicates are computed in ONE linear pass
    * with zero data movement, each row's weights derived locally from a
    * deterministic hash (no rand(), replayable in SQL). The 90 % CI is
    * the (2nd, 31st) order statistic of the 32 replicate Briers.
    *
    * Scale shape: a constant 32× replicate explode over the score frame,
    * one two-phase (rep) aggregate, then order statistics on 32 rows.
    * Determinism: hash-derived uniforms against full-precision CDF
    * literals; weighted sums ride dsumFine; replicate Briers rank with
    * the round-9 + rep tiebreak.
    */
  private val mlBrierCi = Q(
    "ml_brier_ci",
    (s, dir) => {
      import graft.functions.Deterministic.{dsumFine, md5Hash32}
      val reps = explode(array((0 until 32).map(lit): _*)).as("rep")
      val u = md5Hash32(concat(lit("boot:"), col("rep").cast("string"),
        lit(":"), col("vec_id").cast("string"))).cast("double") / 4294967296.0
      val w = PoissonCdf1.zipWithIndex
        .foldRight(lit(7): Column) { case ((c, k), acc) =>
          when(u < c, k).otherwise(acc)
        }
      val rb = logregScores(s, dir)
        .select(col("vec_id"), col("y"), col("p"), reps)
        .withColumn("w", w.cast("long"))
        .groupBy("rep")
        .agg((dsumFine(col("w").cast("double") *
            (col("p") - col("y")) * (col("p") - col("y"))) /
          sum(col("w")).cast("double")).as("b"))
      val rk = rb.withColumn("rk",
        row_number().over(Window.orderBy(round(col("b"), 9), col("rep"))))
      val mean = rb.agg(count(lit(1)).as("n_reps"),
        round(dsumFine(col("b")) / count(lit(1)).cast("double"), 6)
          .as("brier_mean"))
      val lo = rk.filter(col("rk") === 2)
        .select(round(col("b"), 6).as("ci_lo"))
      val hi = rk.filter(col("rk") === 31)
        .select(round(col("b"), 6).as("ci_hi"))
      mean.crossJoin(broadcast(lo)).crossJoin(broadcast(hi))
        .select(col("n_reps"), col("brier_mean"), col("ci_lo"), col("ci_hi"))
    },
    Some(scoresSqlPrefix +
      s"""reps AS (SELECT CAST(r AS INT) AS rep FROM unnest(range(0, 32)) AS t(r)),
        |bu0 AS (SELECT s.vec_id, s.y, s.p, reps.rep,
        |    CAST(CAST('0x' || substr(md5('boot:' || CAST(reps.rep AS VARCHAR)
        |      || ':' || CAST(s.vec_id AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE)
        |      / 4294967296.0 AS u
        |  FROM scores s CROSS JOIN reps),
        |wt AS (SELECT vec_id, y, p, rep,
        |    CAST(CASE ${PoissonCdf1.zipWithIndex
             .map { case (c, k) => s"WHEN u < $c THEN $k" }.mkString(" ")}
        |      ELSE 7 END AS BIGINT) AS w
        |  FROM bu0),
        |rb AS (SELECT rep,
        |    CAST(SUM(CAST(CAST(w AS DOUBLE) * (p - y) * (p - y)
        |      AS DECIMAL(38,20))) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS b
        |  FROM wt GROUP BY rep),
        |rk AS (SELECT rep, b, ROW_NUMBER() OVER (ORDER BY round(b, 9), rep) AS rk
        |  FROM rb)
        |SELECT (SELECT count(*) FROM rb) AS n_reps,
        |  (SELECT round(CAST(SUM(CAST(b AS DECIMAL(38,20))) AS DOUBLE)
        |     / count(*), 6) FROM rb) AS brier_mean,
        |  (SELECT round(b, 6) FROM rk WHERE rk = 2) AS ci_lo,
        |  (SELECT round(b, 6) FROM rk WHERE rk = 31) AS ci_hi""".stripMargin))

  /** Recall@k curve (k = 1…5) of the LSH lists against the sampled exact
    * panel — [[simLshRecall]] is the k = 5 point; retrieval quality is a
    * CURVE, and the k = 1 point (does the single nearest neighbor
    * survive?) is the one kNN-classification actually consumes. Both
    * ranked lists are already memoized; the sweep is five bounded joins.
    */
  private val simRecallCurve = Q(
    "sim_recall_curve",
    (s, dir) => {
      val exact = exactTop5(s, dir)
        .select(col("q_id"), col("n_id"), col("rank").as("xr"))
      val got = lshTop5Auto(s, dir)
        .select(col("q_id"), col("n_id"), col("rank").as("gr"))
      val ks = explode(array((1 to 5).map(lit): _*)).as("k")
      exact.select(col("q_id"), col("n_id"), col("xr"), ks)
        .filter(col("xr") <= col("k"))
        .join(got, Seq("q_id", "n_id"), "left")
        .groupBy("k")
        .agg(count(lit(1)).as("n_exact_pairs"),
          sum(when(col("gr").isNotNull && col("gr") <= col("k"), 1L)
            .otherwise(0L)).as("n_hits"))
        .select(col("k"), col("n_exact_pairs"), col("n_hits"),
          round(col("n_hits").cast("double") /
            col("n_exact_pairs").cast("double"), 6).as("recall_at_k"))
        .orderBy("k")
    },
    Some(lshOracleCtesAuto +
      s""", $mmSql,
        |exp AS (SELECT a.vec_id AS q_id, b.vec_id AS n_id,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
        |      / (a.nrm * b.nrm) AS cos
        |  FROM e a JOIN e b ON b.vec_id != a.vec_id
        |  WHERE a.vec_id % (SELECT m FROM mm) = 3),
        |exr AS (SELECT q_id, n_id, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
        |    ORDER BY round(cos, 9) DESC, n_id) AS INT) AS xr FROM exp),
        |ks AS (SELECT CAST(k AS INT) AS k FROM unnest(range(1, 6)) AS t(k)),
        |cur AS (SELECT ks.k, count(*) AS n_exact_pairs,
        |    CAST(SUM(CASE WHEN r.rank IS NOT NULL AND r.rank <= ks.k
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
        |  FROM exr CROSS JOIN ks
        |  LEFT JOIN (SELECT q_id, n_id, rank FROM r WHERE rank <= 5) r
        |    ON r.q_id = exr.q_id AND r.n_id = exr.n_id
        |  WHERE exr.xr <= ks.k
        |  GROUP BY ks.k)
        |SELECT k, n_exact_pairs, n_hits,
        |  round(CAST(n_hits AS DOUBLE) / n_exact_pairs, 6) AS recall_at_k
        |FROM cur ORDER BY k""".stripMargin))

  /** Per-label embedding DRIFT between two deterministic corpus halves
    * (vec_id parity — the sample_hash_split stance, no rand()): the cosine
    * between each label's even-half and odd-half centroid. The
    * encoder-regression monitor a feature store runs between ingestion
    * batches or model versions — on one healthy corpus a label's two
    * half-centroids should be nearly parallel (cos → 1), and a label whose
    * drift_cos sags flags embedding-space movement (encoder change, data
    * shift, silent preprocessing divergence) BEFORE downstream ANN/kNN
    * quality decays. Centroid cosine is computed from per-dimension MEANS,
    * so the statistic is magnitude-normalized and the decimal sums stay
    * range-bounded at any corpus (a sum-of-components formulation would
    * square corpus-scale magnitudes).
    *
    * Scale shape: ONE linear posexplode pass, a two-phase (label, dim)
    * decimal aggregate (64 × labels cells), then closed-form algebra on
    * the tiny cell frame. Determinism: per-cell sums ride [[graft
    * .functions.Deterministic.dsumFine]]; the mean division and the final
    * 64-term products run on identical doubles cross-engine; 6-dp round.
    */
  private val simEmbeddingDrift = Q(
    "sim_embedding_drift",
    (s, dir) => {
      import graft.functions.Deterministic.dsumFine
      val e = emb(s, dir)
      val x = e.select(col("label"), (col("vec_id") % 2 === 0).as("even"),
          posexplode(col("embedding")).as(Seq("i", "xf")))
        .select(col("label"), col("even"), col("i"),
          col("xf").cast("double").as("x"))
      val sums = x.groupBy("label", "i")
        .agg(dsumFine(when(col("even"), col("x")).otherwise(0.0)).as("sa"),
          dsumFine(when(!col("even"), col("x")).otherwise(0.0)).as("sb"))
      val cnts = e.groupBy("label")
        .agg(sum(when(col("vec_id") % 2 === 0, 1L).otherwise(0L)).as("n_even"),
          sum(when(col("vec_id") % 2 =!= 0, 1L).otherwise(0L)).as("n_odd"))
      val means = sums.join(broadcast(cnts), "label")
        .select(col("label"), col("n_even"), col("n_odd"),
          (col("sa") / when(col("n_even") > 0, col("n_even"))).as("ma"),
          (col("sb") / when(col("n_odd") > 0, col("n_odd"))).as("mb"))
      means.groupBy("label", "n_even", "n_odd")
        .agg(dsumFine(col("ma") * col("mb")).as("num"),
          dsumFine(col("ma") * col("ma")).as("a2"),
          dsumFine(col("mb") * col("mb")).as("b2"))
        .select(col("label"), col("n_even"), col("n_odd"),
          round(col("num") / when(sqrt(col("a2")) * sqrt(col("b2")) =!= 0.0,
            sqrt(col("a2")) * sqrt(col("b2"))), 6).as("drift_cos"))
        .orderBy("label")
    },
    Some("""WITH x AS (SELECT label, vec_id % 2 = 0 AS even,
           |    CAST(i - 1 AS INT) AS i, CAST(embedding[i] AS DOUBLE) AS x
           |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
           |s AS (SELECT label, i,
           |    CAST(SUM(CAST(CASE WHEN even THEN x ELSE 0.0 END AS DECIMAL(38,20))) AS DOUBLE) AS sa,
           |    CAST(SUM(CAST(CASE WHEN NOT even THEN x ELSE 0.0 END AS DECIMAL(38,20))) AS DOUBLE) AS sb
           |  FROM x GROUP BY label, i),
           |c AS (SELECT label,
           |    CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
           |    CAST(SUM(CASE WHEN vec_id % 2 != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_odd
           |  FROM embeddings GROUP BY label),
           |m AS (SELECT s.label, n_even, n_odd,
           |    sa / NULLIF(CASE WHEN n_even > 0 THEN CAST(n_even AS DOUBLE) ELSE 0.0 END, 0.0) AS ma,
           |    sb / NULLIF(CASE WHEN n_odd > 0 THEN CAST(n_odd AS DOUBLE) ELSE 0.0 END, 0.0) AS mb
           |  FROM s JOIN c ON s.label = c.label),
           |d AS (SELECT label, n_even, n_odd,
           |    CAST(SUM(CAST(ma * mb AS DECIMAL(38,20))) AS DOUBLE) AS num,
           |    CAST(SUM(CAST(ma * ma AS DECIMAL(38,20))) AS DOUBLE) AS a2,
           |    CAST(SUM(CAST(mb * mb AS DECIMAL(38,20))) AS DOUBLE) AS b2
           |  FROM m GROUP BY label, n_even, n_odd)
           |SELECT label, n_even, n_odd,
           |  round(num / NULLIF(sqrt(a2) * sqrt(b2), 0.0), 6) AS drift_cos
           |FROM d ORDER BY label""".stripMargin))

  /** Greedy k-center (farthest-point) seed selection over the embedding
    * corpus — the CORESET primitive behind diverse curation: pick k
    * vectors such that every point is near some pick, by repeatedly taking
    * the point FARTHEST (max-min cosine distance) from the current set
    * (Gonzalez 1985, a 2-approximation to optimal k-center). Where
    * [[simMmrRerank]] diversifies a RANKED candidate list, k-center seeds
    * an unranked corpus: k-means initialization (k-means++'s deterministic
    * cousin), annotation-batch selection, eval-set seeding. Seed = min
    * vec_id (data-derived, no config literal), k = 5.
    *
    * Scale shape: each of the k−1 steps is one linear pass (corpus ×
    * ≤ k−1 broadcast picks → per-candidate max-cos aggregate → global
    * top-1), so total work is k linear scans — the MMR unrolled-greedy
    * stance, but with corpus-sized candidate frames, which is why each
    * step must stay a scan + aggregate, never a pairwise join.
    * Determinism: picks tie-break (round(dist, 9) desc, vec_id); the seed
    * row carries NULL min_dist (it has no distance to a prior set).
    */
  private val simKcenterSeeds = Q(
    "sim_kcenter_seeds",
    (s, dir) => {
      val e = emb(s, dir).select(col("vec_id"), col("embedding"),
        l2norm(col("embedding")).as("nrm"))
      val seed = e.agg(min(col("vec_id")).as("sid"))
      var picks = e.crossJoin(broadcast(seed))
        .filter(col("vec_id") === col("sid"))
        .select(col("vec_id"), col("embedding"), col("nrm"),
          lit(0).as("pick_order"),
          lit(null).cast("double").as("min_dist"))
      for (t <- 1 to 4) {
        val sel = broadcast(picks.select(col("vec_id").as("s_id"),
          col("embedding").as("s_emb"), col("nrm").as("s_nrm")))
        val next = e.join(picks.select(col("vec_id")), Seq("vec_id"), "left_anti")
          .crossJoin(sel)
          .withColumn("cos",
            dot(col("embedding"), col("s_emb")) / (col("nrm") * col("s_nrm")))
          .groupBy("vec_id", "embedding", "nrm")
          .agg(max(col("cos")).as("mx"))
          .withColumn("min_dist", lit(1.0) - col("mx"))
          .orderBy(round(col("min_dist"), 9).desc, col("vec_id")).limit(1)
          .select(col("vec_id"), col("embedding"), col("nrm"),
            lit(t).as("pick_order"), col("min_dist"))
        // eager localCheckpoint per step (≤ 5 rows): each step reads
        // `picks` twice (broadcast selected-set + anti-join exclusion), so
        // without truncation step t's plan embeds 2^t copies of the
        // scan+argmax chain — the pageRank contrib-checkpoint precedent.
        // coalesce(1) first (r19): the union otherwise accumulates the
        // spread frame's ~32 near-empty partitions PER STEP, and every
        // later step re-scans them all twice — Profile read 612 tasks /
        // 28 jobs on a query whose state is ≤ 5 rows; one narrow coalesce
        // keeps each checkpointed state a single task at any scale (the
        // picked-set is k-bounded by construction, never corpus-sized)
        picks = picks.unionByName(next).coalesce(1).localCheckpoint(true)
      }
      picks.select(col("pick_order"), col("vec_id"),
          round(col("min_dist"), 6).as("min_dist"))
        .orderBy("pick_order")
    },
    Some {
      def step(t: Int): String = {
        val prev = s"sel${t - 1}"
        s"""s$t AS (SELECT vid, $t AS pick_order, mx FROM (
           |    SELECT a.vec_id AS vid, max(
           |      list_sum(list_transform(range(1, 65),
           |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
           |        / (a.nrm * b.nrm)) AS mx
           |    FROM e a JOIN e b ON b.vec_id IN (SELECT vid FROM $prev)
           |    WHERE a.vec_id NOT IN (SELECT vid FROM $prev)
           |    GROUP BY a.vec_id)
           |  ORDER BY round(1.0 - mx, 9) DESC, vid LIMIT 1),
           |sel$t AS (SELECT vid FROM $prev UNION ALL SELECT vid FROM s$t)""".stripMargin
      }
      """WITH e AS (SELECT vec_id, embedding,
        |   sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
        | FROM embeddings),
        |sel0 AS (SELECT min(vec_id) AS vid FROM e),
        |""".stripMargin +
        (1 to 4).map(step).mkString(",\n") + "\n" +
        """SELECT 0 AS pick_order, vid AS vec_id, CAST(NULL AS DOUBLE) AS min_dist
          |FROM sel0
          |""".stripMargin +
        (1 to 4).map(t =>
          s"UNION ALL SELECT pick_order, vid AS vec_id, round(1.0 - mx, 6) AS min_dist FROM s$t"
        ).mkString("\n") +
        "\nORDER BY pick_order"
    })

  /** One unrolled MMR greedy step as oracle SQL: from the not-yet-selected
    * candidates, pick the arg-max of λ·rel − (1−λ)·max-sim-to-selected with
    * the (round(score, 9) DESC, n_id) tiebreak.
    */
  private def mmrStepSql(k: Int): String = {
    val prev = s"sel${k - 1}"
    s"""s$k AS (SELECT c.n_id, c.rel,
       |    0.7 * c.rel - 0.3 * mx.ms AS mmr_score, $k AS pick_order
       |  FROM cand c JOIN (SELECT a_id, max(sim) AS ms FROM pair
       |      WHERE b_id IN (SELECT n_id FROM $prev) GROUP BY a_id) mx
       |    ON c.n_id = mx.a_id
       |  WHERE c.n_id NOT IN (SELECT n_id FROM $prev)
       |  ORDER BY round(0.7 * c.rel - 0.3 * mx.ms, 9) DESC, c.n_id LIMIT 1),
       |sel$k AS (SELECT n_id FROM $prev UNION ALL SELECT n_id FROM s$k)""".stripMargin
  }

  /** Maximal-Marginal-Relevance re-ranking (Carbonell & Goldstein 1998) of
    * the query vector's top-20 exact-cosine candidates: greedily select 5,
    * each step maximizing λ·rel(q,d) − (1−λ)·max_{s∈S} sim(d,s) with
    * λ = 0.7 — the DIVERSIFIED retrieval a curation pipeline uses to avoid
    * filling a context/training budget with near-duplicates of one
    * document. The greedy recurrence is inherently sequential, but every
    * step runs over the BOUNDED candidate frame (20 rows, 380 pairwise
    * sims), so the unrolled 5-step plan is deep-but-tiny; at lake scale
    * the candidate generation (global top-k, no sort) is the only part
    * that sees the corpus, and per-query MMR parallelizes by query id
    * over windowed candidate groups.
    *
    * Determinism: cosines are the [[dot]] kernel's sequential float→double
    * accumulation (bit-matched by the DuckDB list_sum replay); every
    * arg-max uses the round-9 + id tiebreak; λ-combines are two IEEE ops
    * mirrored literally. The oracle unrolls the same 5 steps CTE-for-CTE.
    */
  private val simMmrRerank = Q(
    "sim_mmr_rerank",
    (s, dir) => {
      VectorKernels.register(s)
      val raw = Tables.load(s, dir, "embeddings")
      val q = broadcast(raw.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb"), l2norm(col("embedding")).as("q_nrm")))
      val n = emb(s, dir).filter(col("vec_id") =!= 0)
        .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
          l2norm(col("embedding")).as("n_nrm"))
      val rel = n.crossJoin(q)
        .select(col("n_id"), col("n_emb"), col("n_nrm"),
          (dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm"))).as("rel"))
      val cand = rel.orderBy(round(col("rel"), 9).desc, col("n_id")).limit(20)
        .localCheckpoint()
      val ca = cand.select(col("n_id").as("a_id"), col("n_emb").as("a_emb"),
        col("n_nrm").as("a_nrm"))
      val cb = cand.select(col("n_id").as("b_id"), col("n_emb").as("b_emb"),
        col("n_nrm").as("b_nrm"))
      val pair = ca.join(cb, col("a_id") =!= col("b_id"))
        .select(col("a_id"), col("b_id"),
          (dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm"))).as("sim"))
        .localCheckpoint()
      var sel = cand.orderBy(round(col("rel"), 9).desc, col("n_id")).limit(1)
        .select(col("n_id"), col("rel"), col("rel").as("mmr_score"),
          lit(1).as("pick_order"))
      for (k <- 2 to 5) {
        val selIds = sel.select("n_id")
        val mx = pair.join(selIds.withColumnRenamed("n_id", "b_id"), "b_id")
          .groupBy(col("a_id").as("n_id")).agg(max(col("sim")).as("ms"))
        val scored = cand.join(selIds, Seq("n_id"), "left_anti")
          .join(mx, "n_id")
          .select(col("n_id"), col("rel"),
            (lit(0.7) * col("rel") - lit(0.3) * col("ms")).as("mmr_score"))
        val pick = scored
          .orderBy(round(col("mmr_score"), 9).desc, col("n_id")).limit(1)
          .select(col("n_id"), col("rel"), col("mmr_score"),
            lit(k).as("pick_order"))
        sel = sel.unionByName(pick)
      }
      sel.select(col("pick_order"), col("n_id"),
        round(col("rel"), 6).as("rel"),
        round(col("mmr_score"), 6).as("mmr_score"))
        .orderBy("pick_order")
    },
    Some("""WITH e AS (SELECT vec_id, embedding,
           |   sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
           | FROM embeddings),
           |q AS (SELECT embedding, nrm FROM e WHERE vec_id = 0),
           |rel0 AS (SELECT e.vec_id AS n_id, e.embedding, e.nrm,
           |    list_sum(list_transform(range(1, 65),
           |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
           |      / (q.nrm * e.nrm) AS rel
           |  FROM e CROSS JOIN q WHERE e.vec_id != 0),
           |cand AS (SELECT n_id, embedding, nrm, rel FROM rel0
           |  ORDER BY round(rel, 9) DESC, n_id LIMIT 20),
           |pair AS (SELECT a.n_id AS a_id, b.n_id AS b_id,
           |    list_sum(list_transform(range(1, 65),
           |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
           |      / (a.nrm * b.nrm) AS sim
           |  FROM cand a JOIN cand b ON a.n_id != b.n_id),
           |s1 AS (SELECT n_id, rel, rel AS mmr_score, 1 AS pick_order
           |  FROM cand ORDER BY round(rel, 9) DESC, n_id LIMIT 1),
           |sel1 AS (SELECT n_id FROM s1),
           |""".stripMargin +
      (2 to 5).map(mmrStepSql).mkString(",\n") + "\n" +
      """SELECT pick_order, n_id, round(rel, 6) AS rel,
        |  round(mmr_score, 6) AS mmr_score
        |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
        |      UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
        |      UNION ALL SELECT * FROM s5)
        |ORDER BY pick_order""".stripMargin))

  /** Rocchio pseudo-relevance-feedback query expansion (Rocchio 1971, the
    * classic two-round retrieval): retrieve the query vector's top-10 by
    * exact cosine, move the query toward their centroid
    * (q' = q + 0.5·mean(top10), the positive-feedback half with β = 0.5),
    * and re-retrieve the final top-5 against q' — reporting each hit's
    * original and expanded-query cosine side by side. The recall-widening
    * step a retrieval stack runs between first-pass ANN and
    * [[simMmrRerank]]-style diversification.
    *
    * Scale shape: round one is the [[simBruteTopk]] broadcast-query scan;
    * the feedback centroid and q' are 64-row frames (one bounded
    * aggregate); round two scores by an exploded per-dimension product
    * against the BROADCAST q' — linear in vectors with no new shuffle
    * keyed on anything but vec_id. Determinism: q' components are doubles
    * from order-independent fine-decimal sums; both dot products against
    * q' ride [[graft.functions.Deterministic.dsumFine]] (q' is a frame,
    * not a float array, so the sequential-kernel convention does not
    * apply — the oracle mirrors the decimal sums instead); arg-max uses
    * the round-9 + id tiebreak throughout.
    */
  private val simRocchioExpand = Q(
    "sim_rocchio_expand",
    (s, dir) => {
      VectorKernels.register(s)
      val raw = Tables.load(s, dir, "embeddings")
      val q = broadcast(raw.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_emb"), l2norm(col("embedding")).as("q_nrm")))
      val n = emb(s, dir).filter(col("vec_id") =!= 0)
        .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"),
          l2norm(col("embedding")).as("n_nrm"))
      val rel = n.crossJoin(q)
        .select(col("n_id"), col("n_emb"), col("n_nrm"),
          (dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm"))).as("rel"))
      val top10 = rel.orderBy(round(col("rel"), 9).desc, col("n_id")).limit(10)
      val fb = top10.select(posexplode(col("n_emb")).as(Seq("i", "v")))
        .groupBy("i")
        .agg(graft.functions.Deterministic.dsumFine(col("v").cast("double")).as("sv"),
          count(lit(1)).as("c"))
        .select(col("i"), (col("sv") / col("c")).as("fbv"))
      val q1 = q.select(posexplode(col("q_emb")).as(Seq("i", "qv")))
        .select(col("i"), col("qv").cast("double").as("qv"))
      val q2 = q1.join(fb, "i")
        .select(col("i"), (col("qv") + lit(0.5) * col("fbv")).as("qq"))
        .localCheckpoint()
      val qn = q2.agg(
        sqrt(graft.functions.Deterministic.dsumFine(col("qq") * col("qq"))).as("q2n"))
      val sc = rel
        .select(col("n_id"), col("n_nrm"), col("rel"),
          posexplode(col("n_emb")).as(Seq("i", "v")))
        .join(broadcast(q2), "i")
        .groupBy("n_id", "n_nrm", "rel")
        .agg(graft.functions.Deterministic.dsumFine(
          col("v").cast("double") * col("qq")).as("dp"))
        .crossJoin(broadcast(qn))
        .select(col("n_id"), col("rel"),
          (col("dp") / (col("q2n") * col("n_nrm"))).as("cos2"))
      sc.orderBy(round(col("cos2"), 9).desc, col("n_id")).limit(5)
        .withColumn("rank", row_number().over(
          Window.orderBy(round(col("cos2"), 9).desc, col("n_id"))))
        .select(col("rank"), col("n_id"),
          round(col("rel"), 6).as("cos_orig"),
          round(col("cos2"), 6).as("cos_expanded"))
        .orderBy("rank")
    },
    Some("""WITH e AS (SELECT vec_id, embedding,
           |   sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)))) AS nrm
           | FROM embeddings),
           |q AS (SELECT embedding, nrm FROM e WHERE vec_id = 0),
           |rel AS (SELECT e.vec_id AS n_id, e.embedding, e.nrm,
           |    list_sum(list_transform(range(1, 65),
           |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
           |      / (q.nrm * e.nrm) AS rel
           |  FROM e CROSS JOIN q WHERE e.vec_id != 0),
           |top10 AS (SELECT n_id, embedding FROM rel
           |  ORDER BY round(rel, 9) DESC, n_id LIMIT 10),
           |fb AS (SELECT i,
           |    CAST(SUM(CAST(CAST(embedding[i + 1] AS DOUBLE) AS DECIMAL(38,20))) AS DOUBLE)
           |      / count(*) AS fbv
           |  FROM top10, unnest(range(0, 64)) AS t(i) GROUP BY i),
           |q2 AS (SELECT i, CAST(q.embedding[i + 1] AS DOUBLE) + 0.5 * fbv AS qq
           |  FROM fb CROSS JOIN q),
           |qn AS (SELECT sqrt(CAST(SUM(CAST(qq * qq AS DECIMAL(38,20))) AS DOUBLE)) AS q2n
           |  FROM q2),
           |sc AS (SELECT r.n_id, r.rel, any_value(r.nrm) AS nrm,
           |    CAST(SUM(CAST(CAST(r.embedding[q2.i + 1] AS DOUBLE) * q2.qq
           |      AS DECIMAL(38,20))) AS DOUBLE) AS dp
           |  FROM rel r CROSS JOIN q2 GROUP BY r.n_id, r.rel),
           |f AS (SELECT n_id, rel, dp / (q2n * nrm) AS cos2
           |  FROM sc CROSS JOIN qn)
           |SELECT CAST(row_number() OVER (ORDER BY round(cos2, 9) DESC, n_id) AS INT) AS rank,
           |  n_id, round(rel, 6) AS cos_orig, round(cos2, 6) AS cos_expanded
           |FROM f ORDER BY round(cos2, 9) DESC, n_id LIMIT 5""".stripMargin))

  /** Cumulative gains / lift table for the trained classifier by score
    * bucket from the top — the CAMPAIGN-targeting readout completing the
    * eval family ([[mlF1Sweep]] picks an operating threshold; this
    * answers "if I can only act on the top-scoring x%, what share of all
    * positives do I capture (gain) and how much better than random is
    * that slice (lift)?"). Same bounded-frame discipline as the PR curve:
    * exact GD-chain scores → ≤10 score buckets → cumulative-from-top
    * window over the bucket frame; gain and lift are single mirrored IEEE
    * divisions of exact longs.
    */
  private val mlLiftGains = Q(
    "ml_lift_gains",
    (s, dir) => {
      val e = emb(s, dir)
      val w = trainedLogreg(s, dir)
      val xy = e.select(col("vec_id"), (col("label") % 2).cast("double").as("y"),
        posexplode(col("embedding")).as(Seq("i", "xf")))
        .select(col("vec_id"), col("y"), col("i"), col("xf").cast("double").as("x"))
      val scores = xy
        .join(broadcast(w.select(col("dim").as("i"), col("weight"))), "i")
        .groupBy("vec_id", "y")
        .agg(graft.functions.Deterministic.dsumFine(col("x") * col("weight")).as("z"))
        .select(col("y"),
          round(lit(1.0) / (lit(1.0) + exp(-col("z"))), 6).as("p"))
      val bkt = scores
        .withColumn("b", least(floor(col("p") * 10), lit(9.0)).cast("int"))
        .groupBy("b")
        .agg(count(lit(1)).as("cnt"),
          sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("np"))
      val wTop = Window.orderBy(col("b").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val tot = bkt.agg(sum(col("cnt")).as("n_all"), sum(col("np")).as("n_pos"))
      bkt.select(col("b"), sum(col("cnt")).over(wTop).as("cum_n"),
          sum(col("np")).over(wTop).as("cum_pos"))
        .crossJoin(broadcast(tot))
        .select((col("b").cast("double") / 10).as("threshold"),
          col("cum_n"), col("cum_pos"),
          round(col("cum_n").cast("double") / col("n_all").cast("double"), 6)
            .as("depth"),
          round(col("cum_pos").cast("double") / col("n_pos").cast("double"), 6)
            .as("gain"),
          round((col("cum_pos").cast("double") / col("cum_n").cast("double")) /
            (col("n_pos").cast("double") / col("n_all").cast("double")), 6)
            .as("lift"))
        .orderBy(col("threshold").desc)
    },
    Some("""WITH cnt AS (SELECT count(*) AS n FROM embeddings),
           |x AS (SELECT vec_id, CAST(label % 2 AS DOUBLE) AS y,
           |        CAST(i - 1 AS INT) AS i, CAST(embedding[i] AS DOUBLE) AS x
           |      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
           |w0 AS (SELECT DISTINCT i, CAST(0.0 AS DOUBLE) AS w FROM x),
           |""".stripMargin +
      (1 to 2).map(logregIterSql).mkString(",\n") + ",\n" +
      """scores AS (SELECT x.y,
        |    round(1.0 / (1.0 + exp(-(CAST(SUM(CAST(x.x * w2.w AS DECIMAL(38,20))) AS DOUBLE)))), 6) AS p
        |  FROM x JOIN w2 ON x.i = w2.i GROUP BY x.vec_id, x.y),
        |bkt AS (SELECT CAST(least(floor(p * 10), 9.0) AS INT) AS b,
        |    count(*) AS cnt,
        |    SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS np
        |  FROM scores GROUP BY 1),
        |c AS (SELECT b,
        |    CAST(SUM(cnt) OVER (ORDER BY b DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
        |    CAST(SUM(np) OVER (ORDER BY b DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos
        |  FROM bkt),
        |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_all,
        |               CAST(SUM(np) AS BIGINT) AS n_pos FROM bkt)
        |SELECT CAST(b AS DOUBLE) / 10 AS threshold, cum_n, cum_pos,
        |  round(CAST(cum_n AS DOUBLE) / CAST(n_all AS DOUBLE), 6) AS depth,
        |  round(CAST(cum_pos AS DOUBLE) / CAST(n_pos AS DOUBLE), 6) AS gain,
        |  round((CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE)) /
        |    (CAST(n_pos AS DOUBLE) / CAST(n_all AS DOUBLE)), 6) AS lift
        |FROM c CROSS JOIN tot ORDER BY threshold DESC""".stripMargin))

  val queries: Seq[Q] = Seq(
    simBruteTopk, simLshAnn, dedupEmbeddingCosine, simIvfAnn,
    dedupSemanticClusters, simQuantizedTopk, simPqTopk, simKmeans,
    simDimStats, simMutualKnn, simPcaPower, mlLogregStep, mlAuc,
    mlCalibration, simRandProj, mlQuantileNorm, mlKnnClassify, mlPrCurve,
    mlDecisionStump, simRangeQuery, simSilhouette, simRrfFusion,
    mlF1Sweep, mlNdcg, simMmrRerank, simRocchioExpand, mlLiftGains,
    mlBrierScore, mlCohensKappa, simKnnOutlier, simPairHist,
    simLshRecall, mlThresholdCost, simHubness, mlCalibrationSlope,
    simLshAnnScaled, mlMccSweep, simEmbeddingDrift, simKcenterSeeds,
    simIvfRecall, mlGroupAuc, mlBrierCi, simRecallCurve, mlLearningCurve,
    dedupSemanticClustersScaled, simLshOccupancy, simIvfPqTopk,
    simHammingTopk, simIvfPqRecall, simPqTrain, simIvfPqTrained,
    simHammingRecall, simIvfPqTrainedRecall, dedupSemanticStreamReplay,
    dedupSemanticStreamOr,
    simLshMultiprobe, simLshMultiprobeRecall, simLshMultiprobe2,
    simLshMultiprobe2Recall, simLshMultiprobeBudget,
    simLshMultiprobeBudgetRecall)
}
