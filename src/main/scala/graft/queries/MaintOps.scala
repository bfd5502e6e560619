package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 batch 6: lakehouse-maintenance planning and two feature/
  * ranking transforms.
  */
object MaintOps {

  /** q179 compaction target: bytes per output bin (64 KB at test
    * scale; the same plan runs with 128 MB bins in production).
    */
  val COMPACT_TARGET = 64L * 1024L

  /** q179: SMALL-FILE COMPACTION PLAN — the OPTIMIZE pass every
    * lakehouse table needs: given per-file sizes (here: per-order
    * lineitem byte estimates standing in for data files), assign files
    * to merge bins so each bin approaches the target size. The
    * assignment is the deterministic running-sum rule: files ordered
    * by key, bin = floor(exclusive-prefix-sum / target) — one window
    * pass, no driver loop, reproducible on any cluster. The window is
    * global but its input is the FILE MANIFEST, not data rows — 1e5-1e6
    * entries even at 100 TB — so the single-partition sort is metadata-
    * sized. Emits the bin manifest (bin, n_files, bytes) a rewrite job
    * would execute.
    */
  def q179CompactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val files = Tables(spark, dir).lineitem
      .groupBy(col("l_orderkey").as("file_id"))
      .agg(sum(floor(col("l_extendedprice")).cast("long")).as("bytes"))
    val w = Window.orderBy("file_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("bin",
        (coalesce(sum("bytes").over(w), lit(0L)) / COMPACT_TARGET)
          .cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_files"), sum("bytes").as("bin_bytes"))
  }

  val q179Sql: String =
    s"""WITH f AS (
      |  SELECT l_orderkey AS file_id,
      |    CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS bytes
      |  FROM lineitem GROUP BY 1),
      |b AS (
      |  SELECT file_id, bytes,
      |    COALESCE(sum(bytes) OVER (ORDER BY file_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      // $COMPACT_TARGET AS bin
      |  FROM f)
      |SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n_files,
      |  CAST(sum(bytes) AS BIGINT) AS bin_bytes
      |FROM b GROUP BY 1 ORDER BY 1""".stripMargin

  /** q180: TOP-K PER GROUP WITH TIES — dense_rank <= 3 keeps ALL parts
    * tied at a kept price (q07's row_number arbitrarily drops
    * co-priced rows; this is the semantics a "top 3 price points per
    * brand" report actually wants). Same single window pass as q07.
    */
  def q180DenseTopk(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy(col("price_c").desc)
    Tables(spark, dir).part
      .select(col("p_brand"), col("p_partkey"),
        floor(col("p_retailprice") * 100 + lit(0.5)).cast("long")
          .as("price_c"))
      .withColumn("rk", dense_rank().over(w))
      .filter(col("rk") <= 3)
      .select("p_brand", "rk", "price_c", "p_partkey")
  }

  val q180Sql: String =
    """WITH r AS (
      |  SELECT p_brand, p_partkey,
      |    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c,
      |    CAST(dense_rank() OVER (PARTITION BY p_brand
      |      ORDER BY CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) DESC)
      |      AS INTEGER) AS rk
      |  FROM part)
      |SELECT p_brand, rk, price_c, p_partkey
      |FROM r WHERE rk <= 3
      |ORDER BY p_brand, rk, p_partkey""".stripMargin

  /** q181: CDF / PERCENTILE-RANK NORMALIZATION — the monotone feature
    * transform (empirical CDF in permille) for a bounded-domain column:
    * quantity's ~50 distinct values per flag mean the CDF table is
    * tiny, so the big table contributes ONE count aggregate and the
    * running sum + permille division run on the |flags| x |values|
    * rollup. cume_dist() over the raw rows would range-sort the whole
    * fact table for the identical result.
    */
  def q181CdfNormalize(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables(spark, dir).lineitem
      .groupBy(col("l_returnflag"),
        floor(col("l_quantity") * 100 + lit(0.5)).cast("long").as("qty_c"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("l_returnflag").orderBy("qty_c")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy("l_returnflag")
    counts
      .withColumn("cum", sum("n").over(w))
      .withColumn("tot", sum("n").over(wAll))
      .select(col("l_returnflag"), col("qty_c"), col("n"),
        floor(col("cum") * lit(1000) / col("tot")).cast("long")
          .as("cdf_permille"))
  }

  val q181Sql: String =
    """WITH c AS (
      |  SELECT l_returnflag,
      |    CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_c,
      |    count(*) AS n
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT l_returnflag, qty_c, n,
      |  CAST(floor(sum(n) OVER (PARTITION BY l_returnflag ORDER BY qty_c
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 1000.0 /
      |    sum(n) OVER (PARTITION BY l_returnflag)) AS BIGINT) AS cdf_permille
      |FROM c ORDER BY l_returnflag, qty_c""".stripMargin

  /** q205 synthetic file layout: quarterly ingest files (shipdate epoch
    * day div 90) — the layout a date-partitioned fact table actually
    * has, so date zone maps prune and price zone maps (mostly) don't.
    */
  val ZM_FILE_DAYS = 90L

  /** q205 predicate set: (id, column, lo, hi) with date bounds in epoch
    * days and price bounds in cents — integer domains in both engines.
    * p1-p3 probe shipdate windows (prunable on this layout); p4 probes
    * a price band (uncorrelated with file ranges — the report shows
    * zone maps failing, which is the signal to re-cluster via q166).
    */
  val ZM_PREDS: Seq[(Int, String, Long, Long)] = {
    def d(s: String): Long = java.time.LocalDate.parse(s).toEpochDay
    Seq(
      (1, "day", d("1995-06-01"), d("1995-12-31")),
      (2, "day", d("1999-01-01"), d("1999-06-30")),
      (3, "day", d("2001-06-01"), d("2002-12-31")),
      (4, "cents", 10000000L, 10500000L))
  }

  /** q205: ZONE-MAP SKIP ANALYSIS — for each candidate predicate, how
    * many files its scan could skip using per-file min/max statistics
    * (parquet row-group / Iceberg manifest zone maps), plus the exact
    * scan efficiency (rows matched / rows scanned). This is the
    * planner's file-skipping simulation: it quantifies whether the
    * current clustering serves the workload before paying for a
    * re-sort. ONE fact scan builds the manifest — per-file min/max AND
    * per-file per-predicate match counts as conditional aggregates (no
    * row explosion) — and everything after runs on the metadata-sized
    * manifest. Skipping uses the sound rule only (f_max < lo or
    * f_min > hi), so rows_matched is provably contained in
    * rows_scanned.
    */
  def q205ZonemapSkip(spark: SparkSession, dir: String): DataFrame = {
    val rows = Tables(spark, dir).lineitem.select(
      datediff(to_date(col("l_shipdate")), lit("1970-01-01")).cast("long")
        .as("day"),
      floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("cents"))
      .withColumn("file_id", expr(s"day div $ZM_FILE_DAYS"))
    val matchCols = ZM_PREDS.map { case (i, c, lo, hi) =>
      sum(when(col(c).between(lo, hi), 1L).otherwise(0L)).as(s"m$i")
    }
    val manifestAggs: Seq[org.apache.spark.sql.Column] = Seq(
      max("day").as("d_hi"),
      min("cents").as("c_lo"), max("cents").as("c_hi"),
      count(lit(1)).as("n")) ++ matchCols
    val manifest = rows.groupBy("file_id")
      .agg(min("day").as("d_lo"), manifestAggs: _*)
    val skipFlags = ZM_PREDS.map { case (i, c, lo, hi) =>
      val (fLo, fHi) = if (c == "day") ("d_lo", "d_hi") else ("c_lo", "c_hi")
      (i, col(fHi) < lo || col(fLo) > hi)
    }
    val aggCols = skipFlags.flatMap { case (i, skip) =>
      Seq(
        sum(when(skip, 1L).otherwise(0L)).as(s"fs$i"),
        sum(when(!skip, col("n")).otherwise(0L)).as(s"rs$i"),
        sum(col(s"m$i")).as(s"rm$i"))
    }
    val one = manifest.agg(
      count(lit(1)).as("files_total"), aggCols: _*)
    val stacked = ZM_PREDS.map(_._1).map(i =>
      s"$i, fs$i, rs$i, rm$i").mkString(", ")
    one.selectExpr("files_total",
      s"stack(${ZM_PREDS.size}, $stacked) as " +
        "(pred_id, files_skipped, rows_scanned, rows_matched)")
      .select(col("pred_id"), col("files_total"), col("files_skipped"),
        col("rows_scanned"), col("rows_matched"),
        when(col("rows_scanned") > 0,
          floor(col("rows_matched") * lit(1e6) / col("rows_scanned") + lit(0.5))
            .cast("long")).otherwise(lit(0L)).as("scan_eff_micro"))
  }

  val q205Sql: String = {
    val matchSelects = ZM_PREDS.map { case (i, c, lo, hi) =>
      s"sum(CASE WHEN $c BETWEEN $lo AND $hi THEN 1 ELSE 0 END) AS m$i"
    }.mkString(",\n      |    ")
    val measureSelects = ZM_PREDS.map { case (i, c, lo, hi) =>
      val (fLo, fHi) = if (c == "day") ("d_lo", "d_hi") else ("c_lo", "c_hi")
      s"""sum(CASE WHEN $fHi < $lo OR $fLo > $hi THEN 1 ELSE 0 END) AS fs$i,
      |    sum(CASE WHEN NOT ($fHi < $lo OR $fLo > $hi) THEN n ELSE 0 END) AS rs$i,
      |    sum(m$i) AS rm$i"""
    }.mkString(",\n      |    ")
    val branches = ZM_PREDS.map { case (i, _, _, _) =>
      s"""SELECT $i AS pred_id, files_total,
      |  CAST(fs$i AS BIGINT) AS files_skipped,
      |  CAST(rs$i AS BIGINT) AS rows_scanned, CAST(rm$i AS BIGINT) AS rows_matched,
      |  CASE WHEN rs$i > 0
      |    THEN CAST(floor(rm$i * 1e6 / rs$i + 0.5) AS BIGINT) ELSE 0 END
      |    AS scan_eff_micro
      |FROM agg"""
    }.mkString("\nUNION ALL\n")
    s"""WITH r AS (
      |  SELECT datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS day,
      |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM lineitem),
      |f AS (
      |  SELECT day // $ZM_FILE_DAYS AS file_id,
      |    day, cents FROM r),
      |manifest AS (
      |  SELECT file_id, min(day) AS d_lo, max(day) AS d_hi,
      |    min(cents) AS c_lo, max(cents) AS c_hi, count(*) AS n,
      |    $matchSelects
      |  FROM f GROUP BY 1),
      |agg AS (
      |  SELECT count(*) AS files_total,
      |    $measureSelects
      |  FROM manifest)
      |$branches
      |ORDER BY pred_id""".stripMargin
  }

  /** q228 normalization bounds (shared literals with the oracle) and
    * the z-file span: a 32-bit Morton key div 2^26 yields up to 64
    * z-range files, comparable to the quarterly date layout's count.
    */
  val ZC_DAY_LO: Double = java.time.LocalDate.parse("1995-01-01").toEpochDay.toDouble
  val ZC_DAY_HI: Double = java.time.LocalDate.parse("2002-01-01").toEpochDay.toDouble
  val ZC_CENT_LO = 90000.0
  val ZC_CENT_HI = 10500000.0
  val ZC_FILE_SPAN: Long = 1L << 26

  /** q228: LAYOUT SKIP COMPARISON — the q205 zone-map simulation run
    * against TWO physical layouts of the same table: quarterly
    * date-clustered files versus z-ordered files (the q166 Morton key
    * over date x price), scored on a date predicate AND a price
    * predicate. This is the measurement that justifies a re-cluster:
    * the date layout prunes only the date predicate; the z-order
    * layout trades a little date pruning for real price pruning —
    * and the report shows both numbers instead of asserting the
    * folklore. Still ONE fact scan: the row is exploded into its two
    * (layout, file) assignments by a stack, and everything after runs
    * on the two metadata-sized manifests.
    */
  def q228LayoutCompare(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.ZOrderLayout
    val (_, dc, dLo, dHi) = ZM_PREDS(1) // 1999-H1 date window
    require(dc == "day")
    val (_, pc, pLo, pHi) = ZM_PREDS(3) // high-price band
    require(pc == "cents")
    val rows = Tables(spark, dir).lineitem.select(
      datediff(to_date(col("l_shipdate")), lit("1970-01-01")).cast("long")
        .as("day"),
      floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long").as("cents"))
      .withColumn("zk", ZOrderLayout.zkey(
        ZOrderLayout.rank16(col("day"), ZC_DAY_LO, ZC_DAY_HI),
        ZOrderLayout.rank16(col("cents"), ZC_CENT_LO, ZC_CENT_HI)))
      .selectExpr("day", "cents",
        s"stack(2, 'date', day div $ZM_FILE_DAYS, " +
          s"'zorder', zk div $ZC_FILE_SPAN) as (layout, file_id)")
    val manifest = rows.groupBy("layout", "file_id").agg(
      min("day").as("d_lo"), max("day").as("d_hi"),
      min("cents").as("c_lo"), max("cents").as("c_hi"),
      count(lit(1)).as("n"),
      sum(when(col("day").between(dLo, dHi), 1L).otherwise(0L)).as("m_d"),
      sum(when(col("cents").between(pLo, pHi), 1L).otherwise(0L)).as("m_p"))
    val skipD = col("d_hi") < dLo || col("d_lo") > dHi
    val skipP = col("c_hi") < pLo || col("c_lo") > pHi
    manifest.groupBy("layout").agg(
      count(lit(1)).as("files_total"),
      sum(when(skipD, 1L).otherwise(0L)).as("fs_d"),
      sum(when(!skipD, col("n")).otherwise(0L)).as("rs_d"),
      sum("m_d").as("rm_d"),
      sum(when(skipP, 1L).otherwise(0L)).as("fs_p"),
      sum(when(!skipP, col("n")).otherwise(0L)).as("rs_p"),
      sum("m_p").as("rm_p"))
      .selectExpr("layout", "files_total",
        "stack(2, 'date_range', fs_d, rs_d, rm_d, 'price_band', fs_p, rs_p, rm_p)" +
          " as (predicate, files_skipped, rows_scanned, rows_matched)")
  }

  val q228Sql: String = {
    val (_, _, dLo, dHi) = ZM_PREDS(1)
    val (_, _, pLo, pHi) = ZM_PREDS(3)
    def rank16(v: String, lo: Double, hi: Double): String =
      s"least(65535, greatest(0, CAST(floor(((CAST($v AS DOUBLE) - $lo) / ${hi - lo}) * 65536.0) AS BIGINT)))"
    val ra = rank16("day", ZC_DAY_LO, ZC_DAY_HI)
    val rb = rank16("cents", ZC_CENT_LO, ZC_CENT_HI)
    s"""WITH r AS (
      |  SELECT datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS day,
      |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM lineitem),
      |rk AS (SELECT day, cents, ($ra) AS a, ($rb) AS b FROM r),
      |s1 AS (SELECT day, cents,
      |  ((a | (a << 8)) & 16711935) AS a, ((b | (b << 8)) & 16711935) AS b
      |  FROM rk),
      |s2 AS (SELECT day, cents,
      |  ((a | (a << 4)) & 252645135) AS a, ((b | (b << 4)) & 252645135) AS b
      |  FROM s1),
      |s3 AS (SELECT day, cents,
      |  ((a | (a << 2)) & 858993459) AS a, ((b | (b << 2)) & 858993459) AS b
      |  FROM s2),
      |s4 AS (SELECT day, cents,
      |  ((a | (a << 1)) & 1431655765) AS a, ((b | (b << 1)) & 1431655765) AS b
      |  FROM s3),
      |z AS (SELECT day, cents, (a | (b << 1)) AS zk FROM s4),
      |u AS (
      |  SELECT day, cents, 'date' AS layout, day // $ZM_FILE_DAYS AS file_id
      |  FROM z
      |  UNION ALL
      |  SELECT day, cents, 'zorder', zk // $ZC_FILE_SPAN FROM z),
      |manifest AS (
      |  SELECT layout, file_id,
      |    min(day) AS d_lo, max(day) AS d_hi,
      |    min(cents) AS c_lo, max(cents) AS c_hi, count(*) AS n,
      |    sum(CASE WHEN day BETWEEN $dLo AND $dHi THEN 1 ELSE 0 END) AS m_d,
      |    sum(CASE WHEN cents BETWEEN $pLo AND $pHi THEN 1 ELSE 0 END) AS m_p
      |  FROM u GROUP BY 1, 2),
      |agg AS (
      |  SELECT layout, count(*) AS files_total,
      |    sum(CASE WHEN d_hi < $dLo OR d_lo > $dHi THEN 1 ELSE 0 END) AS fs_d,
      |    sum(CASE WHEN NOT (d_hi < $dLo OR d_lo > $dHi) THEN n ELSE 0 END) AS rs_d,
      |    sum(m_d) AS rm_d,
      |    sum(CASE WHEN c_hi < $pLo OR c_lo > $pHi THEN 1 ELSE 0 END) AS fs_p,
      |    sum(CASE WHEN NOT (c_hi < $pLo OR c_lo > $pHi) THEN n ELSE 0 END) AS rs_p,
      |    sum(m_p) AS rm_p
      |  FROM manifest GROUP BY 1)
      |SELECT layout, files_total, 'date_range' AS predicate,
      |  CAST(fs_d AS BIGINT) AS files_skipped, CAST(rs_d AS BIGINT) AS rows_scanned,
      |  CAST(rm_d AS BIGINT) AS rows_matched
      |FROM agg
      |UNION ALL
      |SELECT layout, files_total, 'price_band',
      |  CAST(fs_p AS BIGINT), CAST(rs_p AS BIGINT), CAST(rm_p AS BIGINT)
      |FROM agg
      |ORDER BY layout, predicate""".stripMargin
  }

  /** q272: TABLE-VERSION DIFF AUDIT — the snapshot-compare every CDC
    * validation, backfill review, and "what changed between runs"
    * question needs: given two versions of `orders` (v2 simulates a
    * maintenance pass that DELETES every 53rd order and REPRICES every
    * 41st by +1%, both derived deterministically from the same base so
    * the oracle can replay them), classify each key as removed /
    * changed / same and report per-priority counts plus the exact
    * repriced-cents delta.
    *
    * Scale shape: ONE full-outer join on the primary key — both sides
    * hash-partition on o_orderkey, so the diff co-locates without any
    * secondary shuffle — then a map-side-combined rollup. Row equality
    * is a comparison of the packed integer-cents price (at 100 TB the
    * same plan compares a murmur3 struct hash of the tracked columns;
    * integer cents keep the gate bit-exact). No collect, no windows.
    */
  def q272TableDiff(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables(spark, dir).orders
      .select(col("o_orderkey"), col("o_orderpriority"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
          .as("price_c"))
    val v2 = base.filter(col("o_orderkey") % 53 =!= 0)
      .select(col("o_orderkey"), col("o_orderpriority"),
        when(col("o_orderkey") % 41 === 0,
          floor(col("price_c") * lit(101L) / lit(100L)).cast("long"))
          .otherwise(col("price_c")).as("price_c2"))
    base.join(v2.select(col("o_orderkey"), col("price_c2")),
        Seq("o_orderkey"), "left_outer")
      .select(col("o_orderpriority"),
        when(col("price_c2").isNull, "removed")
          .when(col("price_c2") =!= col("price_c"), "changed")
          .otherwise("same").as("status"),
        coalesce(col("price_c2") - col("price_c"), lit(0L))
          .as("delta_c"))
      .groupBy("o_orderpriority", "status")
      .agg(count(lit(1)).as("n"), sum(col("delta_c")).as("delta_c"))
  }

  val q272Sql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
      |  FROM orders),
      |v2 AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 41 = 0
      |      THEN CAST(floor(price_c * 101 / 100) AS BIGINT)
      |      ELSE price_c END AS price_c2
      |  FROM base WHERE o_orderkey % 53 <> 0)
      |SELECT b.o_orderpriority,
      |  CASE WHEN v2.price_c2 IS NULL THEN 'removed'
      |       WHEN v2.price_c2 <> b.price_c THEN 'changed'
      |       ELSE 'same' END AS status,
      |  count(*) AS n,
      |  CAST(sum(COALESCE(v2.price_c2 - b.price_c, 0)) AS BIGINT)
      |    AS delta_c
      |FROM base b LEFT JOIN v2 ON b.o_orderkey = v2.o_orderkey
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q362 rank-bin count for the cross-source normalization. */
  val QN_BINS = 10L

  /** q362: CROSS-SOURCE QUANTILE NORMALIZATION — the batch-effect
    * correction (the genomics quantile-normalization recipe, the
    * cross-tokenizer length-equalization recipe): map each source's
    * doc-length distribution onto the POOLED distribution by rank
    * bin, emitting the (source, bin) → pooled-bin-mean transform
    * table. After applying it, every source shares the pooled length
    * profile — the preprocessing that stops a mixture model (q50/q209)
    * from learning "source" instead of "content". q181 normalizes
    * WITHIN a group to [0,1]; this maps ACROSS groups onto a common
    * target distribution.
    *
    * Scale shape: both rank sides run on |sources×values| /
    * |values| rollups (n_chars' domain is bounded), never the doc
    * table — the q181 idiom; windows partition by source. The bin
    * assignment is the midpoint rank floor(BINS·(2·cumBefore+cnt) /
    * (2·n)) in PURE BIGINT arithmetic (div), so the only float
    * anywhere is the final pooled-bin mean, micro-quantized.
    */
  def q362QuantileNormalize(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    def binned(rollup: DataFrame, part: Seq[String]): DataFrame = {
      val w = if (part.isEmpty) Window.orderBy("v")
        else Window.partitionBy(part.map(col): _*).orderBy("v")
      val wAll = if (part.isEmpty) Window.partitionBy()
        else Window.partitionBy(part.map(col): _*)
      rollup
        .withColumn("cb",
          coalesce(sum("cnt").over(w.rowsBetween(
            Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("nt", sum("cnt").over(wAll))
        .withColumn("bin",
          least(lit(QN_BINS - 1),
            expr(s"($QN_BINS * (2 * cb + cnt)) div (2 * nt)")))
    }
    val perSource = binned(
      docs.groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("cnt")), Seq("source"))
    val pooled = binned(
      docs.groupBy(col("n_chars").as("v")).agg(count(lit(1)).as("cnt")),
      Seq.empty)
    val targets = pooled.groupBy("bin")
      .agg(sum(col("v") * col("cnt")).as("sv"), sum("cnt").as("sc"))
      .select(col("bin"),
        floor(col("sv").cast("double") / col("sc").cast("double") *
          lit(1e6) + lit(0.5)).cast("long").as("target_micro"))
    perSource.groupBy("source", "bin")
      .agg(sum("cnt").as("n_docs"))
      .join(broadcast(targets), Seq("bin"))
      .select(col("source"), col("bin"), col("n_docs"), col("target_micro"))
  }

  val q362Sql: String =
    s"""WITH ps AS (
      |  SELECT source, n_chars AS v, CAST(count(*) AS BIGINT) AS cnt
      |  FROM documents GROUP BY 1, 2),
      |psb AS (
      |  SELECT source, v, cnt,
      |    CAST(coalesce(sum(cnt) OVER (PARTITION BY source ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS cb,
      |    CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS nt
      |  FROM ps),
      |psbin AS (
      |  SELECT source,
      |    least($QN_BINS - 1, ($QN_BINS * (2 * cb + cnt)) // (2 * nt))
      |      AS bin,
      |    cnt
      |  FROM psb),
      |p AS (SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS cnt
      |      FROM documents GROUP BY 1),
      |pb AS (
      |  SELECT v, cnt,
      |    CAST(coalesce(sum(cnt) OVER (ORDER BY v
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS cb,
      |    CAST(sum(cnt) OVER () AS BIGINT) AS nt
      |  FROM p),
      |tg AS (
      |  SELECT least($QN_BINS - 1, ($QN_BINS * (2 * cb + cnt)) // (2 * nt))
      |      AS bin,
      |    CAST(floor(CAST(sum(v * cnt) AS DOUBLE) /
      |      CAST(sum(cnt) AS DOUBLE) * 1e6 + 0.5) AS BIGINT)
      |      AS target_micro
      |  FROM pb GROUP BY 1)
      |SELECT s.source, s.bin, CAST(sum(s.cnt) AS BIGINT) AS n_docs,
      |  first(tg.target_micro) AS target_micro
      |FROM psbin s JOIN tg ON tg.bin = s.bin
      |GROUP BY s.source, s.bin
      |ORDER BY s.source, s.bin""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q362_quantile_normalize" ->
      Gate.sorted(q362QuantileNormalize _, "source", "bin"),
    "q272_table_diff" ->
      Gate.sorted(q272TableDiff _, "o_orderpriority", "status"),
    "q228_layout_compare" ->
      Gate.sorted(q228LayoutCompare _, "layout", "predicate"),
    "q179_compaction_plan" -> Gate.sorted(q179CompactionPlan _, "bin"),
    "q180_dense_topk" ->
      Gate.sorted(q180DenseTopk _, "p_brand", "rk", "p_partkey"),
    "q181_cdf_normalize" ->
      Gate.sorted(q181CdfNormalize _, "l_returnflag", "qty_c"),
    "q205_zonemap_skip" -> Gate.sorted(q205ZonemapSkip _, "pred_id"))

  val oracles: Map[String, String] = Map(
    "q362_quantile_normalize" -> q362Sql,
    "q272_table_diff" -> q272Sql,
    "q228_layout_compare" -> q228Sql,
    "q179_compaction_plan" -> q179Sql,
    "q180_dense_topk" -> q180Sql,
    "q181_cdf_normalize" -> q181Sql,
    "q205_zonemap_skip" -> q205Sql)
}
