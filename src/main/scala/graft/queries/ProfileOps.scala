package graft.queries

import graft.Tables
import graft.operators.DistributedQuantile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-5 batch 10: time-series SLO percentiles, cross-source corpus
  * containment, and auto-binned histograms.
  */
object ProfileOps {

  /** q191: HOURLY P95 TIME SERIES — the SLO/latency panel metric:
    * per (hour, event_type), exact p50/p95 of value plus the exact
    * integer sum, through the bucket-prune quantile operator (groups
    * are numerous and bounded, so per-group histograms shard evenly;
    * nothing sorts the fact table).
    */
  def q191HourlyP95(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables(spark, dir).events
      .select(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
        .as("hour"), col("event_type"), col("value"))
    val q = DistributedQuantile.quantiles(
      ev, Seq("hour", "event_type"), "value",
      Seq("p50" -> 0.5, "p95" -> 0.95))
    ev.groupBy("hour", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("sum_c"))
      .join(q, Seq("hour", "event_type"))
      .select("hour", "event_type", "n", "sum_c", "p50", "p95")
  }

  val q191Sql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
      |  event_type, count(*) AS n,
      |  CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS sum_c,
      |  quantile_cont(value, 0.5) AS p50,
      |  quantile_cont(value, 0.95) AS p95
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q192: SOURCE CONTAINMENT MATRIX — for every ordered source pair,
    * the containment C(a,b) = |shingles(a) ∩ shingles(b)| / |shingles(a)|
    * (how much of source a's content also appears in b) — the corpus-
    * redundancy diagnostic that decides which sources to down-weight
    * in a training mix (q50/q58's upstream question). Source-level
    * DISTINCT shingle sets are a tiny rollup (|sources| x vocab), so
    * the pair join runs on source-level postings, never documents.
    * Containment is asymmetric — both directions are emitted.
    */
  def q192SourceContainment(spark: SparkSession, dir: String): DataFrame = {
    val srcSh = Tables(spark, dir).documents
      .select(col("source"),
        explode(graft.plans.ShingleHashSet(col("text"), DedupOps.SHINGLE_N))
          .as("sh"))
      .distinct()
      .localCheckpoint(true)
    val sizes = srcSh.groupBy("source").agg(count(lit(1)).as("n_sh"))
    val inter = srcSh.as("a")
      .join(srcSh.as("b"),
        col("a.sh") === col("b.sh") && col("a.source") =!= col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(broadcast(sizes.toDF("src_a", "n_a")), "src_a")
      .select(col("src_a"), col("src_b"), col("n_inter"),
        floor(col("n_inter") * lit(1e6) / col("n_a") + lit(0.5))
          .cast("long").as("containment_micro"))
  }

  val q192Sql: String = {
    val sh =
      s"""list_transform(generate_series(1, length(text) - ${DedupOps.SHINGLE_N - 1}),
        |      i -> list_reduce(
        |             list_transform(generate_series(i, i + ${DedupOps.SHINGLE_N - 1}),
        |                            j -> CAST(ascii(substr(text, j, 1)) AS BIGINT)),
        |             (a, c) -> a * 31 + c) % ${graft.functions.TextFunctions.MINHASH_P})""".stripMargin
    s"""WITH e AS (
      |  SELECT DISTINCT source, unnest($sh) AS sh FROM documents),
      |sizes AS (SELECT source, count(*) AS n_sh FROM e GROUP BY 1),
      |inter AS (
      |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_inter
      |  FROM e a JOIN e b ON a.sh = b.sh AND a.source <> b.source
      |  GROUP BY 1, 2)
      |SELECT i.src_a AS src_a, i.src_b AS src_b,
      |  CAST(i.n_inter AS BIGINT) AS n_inter,
      |  CAST(floor(i.n_inter * 1e6 / s.n_sh + 0.5) AS BIGINT)
      |    AS containment_micro
      |FROM inter i JOIN sizes s ON s.source = i.src_a
      |ORDER BY 1, 2""".stripMargin
  }

  /** q193: AUTO-BINNED HISTOGRAM (Freedman-Diaconis) of order totals —
    * the profiling histogram that picks its own bin width
    * h = 2*IQR/n^(1/3) instead of a magic constant. IQR comes from the
    * bucket-prune quantile pass; the bin width is frozen to an exact
    * INTEGER number of cents (ceil) so assignment `floor((v-min)/h)`
    * is pure integer arithmetic in both engines, and the histogram
    * itself is one aggregate.
    */
  def q193FdHistogram(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
      .select(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
        .as("v_c"))
    val stats = DistributedQuantile.quantiles(
      o, Seq(), "v_c", Seq("p25" -> 0.25, "p75" -> 0.75))
      .crossJoin(o.agg(count(lit(1)).as("n"), min("v_c").as("v_min")))
      .select(
        greatest(lit(1L),
          ceil(lit(2.0) * (col("p75") - col("p25")) /
            pow(col("n").cast("double"), 1.0 / 3.0)).cast("long"))
          .as("width_c"),
        col("v_min"), col("n"))
      .localCheckpoint(true)
    o.crossJoin(broadcast(stats))
      .groupBy((((col("v_c") - col("v_min")) / col("width_c"))
        .cast("long")).as("bin"))
      .agg(count(lit(1)).as("n_rows"))
      .crossJoin(broadcast(stats.select("width_c", "v_min")))
      .select(col("bin"), col("width_c"), col("v_min"), col("n_rows"))
  }

  val q193Sql: String =
    """WITH o AS (
      |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v_c
      |  FROM orders),
      |st AS (
      |  SELECT greatest(1, CAST(ceil(2.0 * (quantile_cont(v_c, 0.75)
      |      - quantile_cont(v_c, 0.25)) / pow(count(*), 1.0/3.0)) AS BIGINT))
      |    AS width_c,
      |    CAST(min(v_c) AS BIGINT) AS v_min
      |  FROM o)
      |SELECT CAST(floor((o.v_c - st.v_min) * 1.0 / st.width_c) AS BIGINT)
      |    AS bin,
      |  st.width_c, st.v_min, count(*) AS n_rows
      |FROM o CROSS JOIN st
      |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q191_hourly_p95" -> Gate.sorted(q191HourlyP95 _, "hour", "event_type"),
    "q192_source_containment" ->
      Gate.sorted(q192SourceContainment _, "src_a", "src_b"),
    "q193_fd_histogram" -> Gate.sorted(q193FdHistogram _, "bin"))

  val oracles: Map[String, String] = Map(
    "q191_hourly_p95" -> q191Sql,
    "q192_source_containment" -> q192Sql,
    "q193_fd_histogram" -> q193Sql)
}
