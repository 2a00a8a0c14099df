package graft

import org.apache.spark.sql.SparkSession

/** The one place that pins the engine's scale-relevant session defaults, so
  * deployments (and the driver mains) share a single source of truth instead
  * of folklore scattered across builders.
  *
  * Every setting here targets the 100 TB plan, not the local test rig:
  *  - AQE on, with runtime coalescing and skew-join splitting — re-plans
  *    shuffle stages from observed sizes (partition counts picked for the
  *    average key are wrong for the hot key);
  *  - skew-join thresholds — a skewed reducer is split instead of straggling;
  *  - an explicit broadcast threshold — dims up to 64 MB broadcast instead
  *    of shuffling the fact side (executors at this scale have the headroom);
  *  - shuffle partitions from the deployment (parameter), since the right
  *    number is a function of cluster width, not of the engine.
  *
  * ScaleTechniquesSpec asserts these land in a real session.
  */
object Sessions {

  /** Keys and values, exposed for tests and for porting into any existing
    * builder (e.g. a notebook session the library doesn't own).
    */
  val scaleDefaults: Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "5.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256m",
    "spark.sql.autoBroadcastJoinThreshold" -> "64m",
    // file-source split size: with 128 MiB row-group parquet this yields
    // one task per row group — the scan parallelism the writers produce
    "spark.sql.files.maxPartitionBytes" -> "134217728",
    // unfiltered MIN/MAX/COUNT answer from parquet footer statistics alone —
    // a table-wide stats query reads metadata, not 100 TB of pages
    "spark.sql.parquet.aggregatePushdown" -> "true",
    // iterative operators pin checkpointed substrates in storage memory; at
    // the default 0.5 the protected storage pool starves the 16–32
    // concurrent per-executor aggregation tasks of execution pages exactly
    // when a fact-scale frame is cached (AGGREGATE_OUT_OF_MEMORY at the
    // 100× corpus on an 8 GiB JVM). 0.2 keeps hot blocks cached until
    // pressure but lets execution evict them to disk — iteration re-reads
    // then pay a disk read instead of the whole job failing
    "spark.memory.storageFraction" -> "0.2",
    "spark.sql.session.timeZone" -> "UTC")

  /** A builder with the scale defaults applied; `shufflePartitions` is the
    * deployment's reducer width (≈ 2–3× total cores).
    */
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    scaleDefaults.foldLeft(
      SparkSession.builder()
        .master(master)
        .config("spark.sql.shuffle.partitions", shufflePartitions)) {
      case (b, (k, v)) => b.config(k, v)
    }
}
