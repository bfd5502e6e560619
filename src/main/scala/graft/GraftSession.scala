package graft

import org.apache.spark.sql.SparkSession

/** Opinionated SparkSession builder for graft (SURVEY §7 step 1).
  *
  * Local parallelism comes from SPARK_GRAFT_CPUS (default: the
  * machine's cores, capped at 32) and is used for BOTH the master
  * thread count and shuffle partitions — on a real cluster, drop
  * `master` and size `spark.sql.shuffle.partitions` to ~2-3x total
  * executor cores instead. AQE (on by default in Spark 4) re-coalesces
  * and handles skew at runtime. Graft's native SQL functions
  * (cosine_similarity, ...) are registered via GraftExtensions.
  */
object GraftSession {

  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
    math.min(Runtime.getRuntime.availableProcessors, 32).toString)

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // SPARK_GRAFT_ANSI=true hard-errors on arithmetic overflow /
      // invalid casts instead of wrapping — the scale-gate switch
      // (round-7 verdict item 1: the q361/q369/q376 BIGINT-grid
      // overflows wrapped silently at sf1 under the default).
      .config("spark.sql.ansi.enabled",
        sys.env.getOrElse("SPARK_GRAFT_ANSI", "false"))
      // The driver's events table carries parquet TIMESTAMP(NANOS),
      // which Spark 4's vectorized reader rejects; read nanos as long
      // session-wide (Tables.events truncates to microseconds). Set
      // here once instead of mutating conf inside a table accessor.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)

  def getOrCreate(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session-level SQL surface for the udaf-based aggregates (native
    // expressions register through GraftExtensions; Aggregator-backed
    // functions go through the udf registry instead)
    spark.udf.register("quantile_sketch",
      org.apache.spark.sql.functions.udaf(
        new graft.operators.QuantileSketch.SketchAgg(
          graft.operators.QuantileSketch.DEFAULT_K)))
    spark
  }
}
