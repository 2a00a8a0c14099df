package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev/bench utility: amplify a testdata scale-factor directory by an
  * integer factor, producing a workload-representative larger corpus for
  * scale validation (`args: srcDir dstDir factor [table ...]` — trailing
  * table names restrict the amplification to those tables, for probes that
  * need one table at a decade the full amplified directory would make
  * needlessly expensive, e.g. the 2 M-vector LSH probe). This is measurement
  * scaffolding, not an operator — the library's scale arguments live in the
  * operators themselves; this main exists so those arguments can be checked
  * against a 10× corpus instead of only being argued (SURVEY §6).
  *
  * Amplification rules, chosen so per-key densities stay CONSTANT while row
  * counts scale — i.e. the amplified corpus stresses the linear machinery
  * (shuffles, joins, aggregates) without manufacturing quadratic blow-ups
  * the real distribution wouldn't have:
  *
  *  - Fact/entity keys shift by a constant stride (2⁴⁰) per replica: each
  *    replica is a disjoint key space, so joins/groups see 10× groups of the
  *    SAME size, never 10×-deeper groups (no driver-side max+1 — the stride
  *    is static, nothing is collected).
  *  - `nation`/`region` stay fixed (genuinely low-cardinality dims; facts
  *    keep referencing them, as a real 100 TB lake would).
  *  - `documents.text` prefixes every word with a replica tag (`r3_the`):
  *    replica shingle/token spaces are DISJOINT, so posting-list dfs and
  *    near-dup densities match the source corpus instead of every doc
  *    gaining 9 cross-replica near-duplicates that a real 10× crawl would
  *    not have.
  *  - `embeddings.embedding` gets deterministic per-(vec, dim, replica)
  *    hash noise (±0.05 against a 0.125 component σ): replica vectors are
  *    genuine new points — close to the source distribution, but not exact
  *    duplicates that would stack LSH/IVF buckets 10 deep at one point.
  */
object ScaleUp {
  // ALWAYS amplify from the ORIGINAL directory in one hop: the stride is a
  // fixed constant, so chaining hops (src -> x100 -> x10) makes replica i
  // of hop two collide with replica i of hop one (strides add: i + j gives
  // 109 distinct key spaces for a x100 then x10 chain, not 1000) — the r15
  // "2 M-vector" probe corpus built that way carried only 218 k distinct
  // vec_ids and silently under-reported list counts. A single x1000 hop
  // keeps every replica key space disjoint.
  private val Stride = 1L << 40

  def main(args: Array[String]): Unit = {
    val Array(src, dst, fStr, rest @ _*) = args
    // `organic` flag (r16 verdict item 1): replica EMBEDDINGS are fresh
    // full-σ draws instead of ±0.05 clones — see the embeddings rule below.
    // `clustered` flag (r18 verdict item 5): fresh draws from a
    // mixture-of-Gaussians instead of one isotropic ball — the regime
    // where IVF's recall-per-probed-fraction argument can actually hold
    // (the r18 cell-axis negative was measured on isotropic data, which
    // CANNOT show it). SPARK_GRAFT_CLUSTERS sets the mixture width
    // (default 64 components).
    val organic = rest.contains("organic")
    val clustered = rest.contains("clustered")
    val onlyTables = rest.filterNot(f => f == "organic" || f == "clustered")
    val f = fStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Guard enforced in-plan on every shifted key: a key outside
    // [0, Stride) means the source directory is ITSELF an amplified
    // corpus, and chaining hops silently collides replica key spaces
    // (the r15 incident documented above — 218 k distinct vec_ids in a
    // "2 M" corpus). raise_error fails the write job with the one-hop
    // instruction instead of producing a corrupt corpus.
    def shift(c: String, rep: Column) =
      when(col(c) < 0L || col(c) >= Stride,
        raise_error(concat(lit(s"[scaleup] $c="), col(c).cast("string"),
          lit(" outside [0, 2^40): input is already amplified — " +
            "amplify from the ORIGINAL directory in ONE hop"))))
        .otherwise(col(c) + rep.cast("long") * lit(Stride))

    // Replication is a broadcast range-join, not an f-way union (r17): the
    // previous `(0 until f).map(tx).reduce(unionByName)` built an f-child
    // Union plan whose analysis cost grows with f — fine at ×10, hostile
    // at the ×10 000 decade. One crossJoin against a broadcast f-row
    // replica index is a single map-side operator at ANY factor; `rep` is
    // cast to INT so every hash(vec_id, d, rep, …) value is bit-identical
    // to the literal-interpolated form the union build used.
    def replicate(name: String)(tx: (DataFrame, Column) => DataFrame): Unit = {
      if (onlyTables.nonEmpty && !onlyTables.contains(name)) return
      val base = Tables.load(spark, src, name)
      val reps = broadcast(
        spark.range(f).select(col("id").cast("int").as("rep_i")))
      val out = tx(base.crossJoin(reps), col("rep_i")).drop("rep_i")
      out.repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name x$f written")
    }

    Seq("region", "nation").foreach { n =>
      // genuinely low-cardinality dims stay fixed: only replica 0 survives
      replicate(n)((df, rep) => df.filter(rep === 0))
    }
    replicate("customer")((df, rep) => df.withColumn("c_custkey", shift("c_custkey", rep)))
    replicate("supplier")((df, rep) => df.withColumn("s_suppkey", shift("s_suppkey", rep)))
    replicate("part")((df, rep) => df.withColumn("p_partkey", shift("p_partkey", rep)))
    replicate("orders")((df, rep) => df
      .withColumn("o_orderkey", shift("o_orderkey", rep))
      .withColumn("o_custkey", shift("o_custkey", rep)))
    replicate("lineitem")((df, rep) => df
      .withColumn("l_orderkey", shift("l_orderkey", rep))
      .withColumn("l_partkey", shift("l_partkey", rep))
      .withColumn("l_suppkey", shift("l_suppkey", rep)))
    replicate("events")((df, rep) => df
      .withColumn("event_id", shift("event_id", rep))
      .withColumn("user_id", shift("user_id", rep)))
    replicate("documents")((df, rep) => df
      .withColumn("doc_id", shift("doc_id", rep))
      .withColumn("text", when(rep === 0, col("text")).otherwise(
        // replica word spaces are DISJOINT ("r3_the"): dfs and near-dup
        // densities match the source corpus instead of every doc gaining
        // f − 1 cross-replica near-duplicates
        concat_ws(" ", transform(split(col("text"), " "),
          w => concat(lit("r"), rep.cast("string"), lit("_"), w)))))
      .withColumn("n_chars", length(col("text"))))
    val mixtureK = sys.env.getOrElse("SPARK_GRAFT_CLUSTERS", "64").toInt
    replicate("embeddings")((df, rep) => df
      .withColumn("vec_id", shift("vec_id", rep))
      .withColumn("embedding",
        when(rep === 0, col("embedding")).otherwise(
          if (clustered) {
            // CLUSTERED regime: vector = centroid(component) + tight noise,
            // both deterministic hash draws (the organic 3-uniform shape).
            // Component centroids draw at the source's full 0.125 σ
            // (|μ| ≈ 1.0 over 64 dims); within-component noise at half σ
            // (|ε|² ≈ 0.25) puts same-component cosine ≈ 0.8 — real
            // neighborhood structure for a coarse quantizer to exploit,
            // far below the ±0.05 clone regime's 0.9+. Component id is a
            // hash of (vec_id, rep), so components are balanced ~n/k and
            // replica spaces share the SAME mixture (a real sharded crawl
            // of one distribution, not f private distributions).
            val comp = pmod(hash(col("vec_id"), rep, lit(77)), lit(mixtureK))
            def u(seed: Int, c: Column, d: Column) =
              (hash(c, d, lit(seed)) % 1000).cast("float") / 1000.0f
            transform(col("embedding"), (_, d) =>
              (lit(0.125f) * (u(11, comp, d) + u(12, comp, d) + u(13, comp, d))
                + lit(0.0625f) *
                  ((hash(col("vec_id"), d, rep, lit(4)) % 1000).cast("float") / 1000.0f
                    + (hash(col("vec_id"), d, rep, lit(5)) % 1000).cast("float") / 1000.0f
                    + (hash(col("vec_id"), d, rep, lit(6)) % 1000).cast("float") / 1000.0f))
                .cast("float"))
          } else if (organic)
            // ORGANIC regime: each replica vector is a FRESH deterministic
            // draw at the source's full per-component σ (0.125,
            // near-Gaussian via 3 summed ±1 uniforms — the source corpus
            // is isotropic hash-noise of exactly this shape, measured
            // min/max/σ/kurtosis in SURVEY §6), NOT a ±0.05 clone of the
            // source vector. The amplified corpus then prices organic ANN
            // structure: exact top-5 pairs are max-of-n order statistics
            // over independent points (cosine ~0.4–0.6 at these decades),
            // never same-source replica pairs at cosine 0.9+ — the
            // honesty split's clone regime is empty by construction. The
            // label column rides along unchanged (the source's
            // label-geometry signal is cos ≈ 0.07 — negligible).
            transform(col("embedding"), (_, d) =>
              (lit(0.125f) *
                ((hash(col("vec_id"), d, rep, lit(1)) % 1000).cast("float") / 1000.0f
                  + (hash(col("vec_id"), d, rep, lit(2)) % 1000).cast("float") / 1000.0f
                  + (hash(col("vec_id"), d, rep, lit(3)) % 1000).cast("float") / 1000.0f))
                .cast("float"))
          else
            // CLONE regime (default): deterministic ±0.05 hash noise —
            // replica vectors are genuine new points near the source
            transform(col("embedding"), (x, d) =>
              (x + (hash(col("vec_id"), d, rep) % 1000).cast("float") / 20000.0f)
                .cast("float")))))
    spark.stop()
  }
}
