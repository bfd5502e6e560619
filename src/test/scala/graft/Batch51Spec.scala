package graft

/** Round-9 batch-51 specs: the SIZED LSH code length (q40 default +
  * q412 fixed-plane control) — independent driver-side re-derivations
  * on sf0.001, mirroring Batch21's q63/q313 pair.
  */
class Batch51Spec extends SparkSpec {

  import graft.queries.EmbeddingOps.{
    EMB_DIM, LSH_TARGET_POP, NEARDUP_MIN_SIM, NUM_PLANES, NUM_TABLES,
    sizedPlanes}

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Independent md5 plane-weight recompute (same public construction
    * as EmbeddingOps.planeWeights, re-derived here from scratch).
    */
  private def weight(table: Int, plane: Int, d: Int): Double = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s"t${table}p$plane:$d".getBytes("UTF-8"))
    val v = ((dig(0) & 0xffL) << 16) | ((dig(1) & 0xffL) << 8) | (dig(2) & 0xffL)
    ((v % 2000) - 1000).toDouble / 1000.0
  }

  /** Driver-side near-dup recompute under an arbitrary plane count —
    * shared by the q40 (sized) and q412 (fixed-plane control) specs.
    */
  private def neardupRecompute(planes: Int): Set[(Long, Long)] = {
    val embs = Tables(spark, sfDir).embeddings
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .sortBy(_._1)
    def buckets(e: Array[Float]): Seq[(Int, Long)] =
      (0 until NUM_TABLES).map { t =>
        var b = 0L
        for (p <- 0 until planes) {
          var dot = 0.0
          for (d <- 0 until EMB_DIM) dot += e(d) * weight(t, p, d)
          if (dot >= 0.0) b |= 1L << p
        }
        t -> b
      }
    val bk = embs.map { case (v, e) => v -> buckets(e).toSet }.toMap
    (for {
      (a, ea) <- embs; (b, eb) <- embs
      if a < b && (bk(a) & bk(b)).nonEmpty && cosine(ea, eb) >= NEARDUP_MIN_SIM
    } yield (a, b)).toSet
  }

  test("sizedPlanes: integer-exact boundaries of the 2^p x POP rule") {
    assert(LSH_TARGET_POP == 32L)
    assert(sizedPlanes(1L) == 1)
    assert(sizedPlanes(64L) == 1)
    assert(sizedPlanes(65L) == 2)
    assert(sizedPlanes(512L) == 4)   // sf0.001/sf0.01 corpora land here
    assert(sizedPlanes(513L) == 5)
    assert(sizedPlanes(2000L) == 6)  // sf0.1
    assert(sizedPlanes(20000L) == 10) // sf1
    // monotone non-decreasing and always within the oracle's domain
    assert(sizedPlanes(3L * 1000 * 1000 * 1000) <= 30)
  }

  test("q40 equals a driver-side sized-code near-dup recompute") {
    val n = Tables(spark, sfDir).embeddings.count()
    val planes = sizedPlanes(n)
    // the code must actually size with the corpus
    assert((1L << planes) * LSH_TARGET_POP >= n)
    assert(planes == 1 || (1L << (planes - 1)) * LSH_TARGET_POP < n)
    val got = graft.queries.EmbeddingOps.q40EmbeddingNeardup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === neardupRecompute(planes))
  }

  test("q412 control equals the same recompute under fixed planes") {
    val got = graft.queries.EmbeddingOps.q412FixedplaneControl(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === neardupRecompute(NUM_PLANES))
  }

  test("q413 equals a driver-side BH step-up recompute") {
    import graft.queries.EventAnalytics.BH_ALPHA_MICRO
    val got = graft.queries.EventAnalytics.q413BhFdr(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7), r.getBoolean(8)))).toMap
    // recompute from the raw events with exact decimal sums
    val rows = Tables(spark, sfDir).events
      .select("event_type", "ts", "user_id", "value").collect()
    val segs = rows.groupBy { r =>
      val days = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.of(1970, 1, 1),
        r.getTimestamp(1).toLocalDateTime.toLocalDate)
      (r.getString(0), days % 7)
    }
    val stats = segs.view.mapValues { rs =>
      def arm(b: Boolean) = rs.filter(_.getLong(2) % 2 == (if (b) 1 else 0))
      def s(b: Boolean, f: Double => Double) = arm(b)
        .map(r => BigDecimal(f(r.getDouble(3))).setScale(4,
          BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      (arm(false).size.toLong, arm(true).size.toLong,
        s(false, identity), s(true, identity),
        s(false, x => x * x), s(true, x => x * x))
    }.toMap.filter { case (_, (na, nb, _, _, _, _)) => na > 1 && nb > 1 }
    val ps = stats.map { case (k, (na, nb, s1a, s1b, s2a, s2b)) =>
      val t = (s1a / na - s1b / nb) /
        math.sqrt((s2a - s1a * s1a / na) / (na - 1) / na +
          (s2b - s1b * s1b / nb) / (nb - 1) / nb)
      k -> (math.floor(t * 1e6 + 0.5).toLong,
        math.floor(1e6 / (1.0 + t * t) + 0.5).toLong)
    }
    val m = ps.size
    val ranked = ps.toSeq.sortBy { case ((et, dow), (_, p)) => (p, et, dow) }
      .zipWithIndex.map { case ((k, (t, p)), i) => (k, t, p, i + 1L) }
    val kstar = ranked.collect {
      case (_, _, p, rnk) if p <= rnk * BH_ALPHA_MICRO / m => rnk
    }.maxOption.getOrElse(0L)
    val want = ranked.map { case (k, t, p, rnk) =>
      k -> ((stats(k)._1, stats(k)._2, t, p, rnk,
        rnk * BH_ALPHA_MICRO / m, rnk <= kstar))
    }.toMap
    assert(got === want)
  }

  test("q413 rejects planted effects and spares null segments") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft-bh").toString
    // event_type "shifted": variant B (odd users) has value +50 — a
    // real effect every segment should reject; "null" has none
    spark.range(4000)
      .select(col("id").as("event_id"),
        expr("timestampadd(HOUR, CAST(id % 168 AS INT), " +
          "timestamp'2024-01-01 00:00:00')").as("ts"),
        col("id").as("user_id"),
        // type by id mod 4 < 2 so BOTH user parities land in each type
        when(col("id") % 4 < 2, "shifted").otherwise("nulltype")
          .as("event_type"),
        // base noise = week index mod 7: constant across an hour
        // block's arms (168 ≡ 0 mod 7 would make id%7 parity-biased)
        (expr("CAST((id div 168) % 7 AS DOUBLE)") +
          when(col("id") % 4 === 1, 50.0).otherwise(0.0)).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = graft.queries.EventAnalytics.q413BhFdr(spark, tmp).collect()
    val byType = out.groupBy(_.getString(0))
    // every shifted segment rejected (huge t), no null segment rejected
    assert(byType("shifted").forall(_.getBoolean(8)))
    assert(byType("nulltype").forall(!_.getBoolean(8)))
  }

  test("q414 equals a driver-side seasonal-decomposition recompute") {
    val got = graft.queries.TemporalOps.q414SeasonalDecompose(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val daily = Tables(spark, sfDir).events
      .selectExpr("event_type", "CAST(to_date(ts) AS STRING) AS day")
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = daily.keys.groupBy(_._1).flatMap { case (et, ks) =>
      val series = ks.map(_._2).toSeq.sorted.map(d => d -> daily((et, d)))
      val interior = series.zipWithIndex.collect {
        case ((d, n), i) if i >= 3 && i < series.size - 3 =>
          (d, n, series.slice(i - 3, i + 4).map(_._2).sum)
      }
      val byDow = interior.groupBy { case (d, _, _) =>
        java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.of(1970, 1, 1), java.time.LocalDate.parse(d)) % 7
      }.view.mapValues { rs =>
        (rs.map { case (_, n, t7) => 7 * n - t7 }.sum, rs.size.toLong)
      }.toMap
      interior.map { case (d, n, t7) =>
        val dow = java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.of(1970, 1, 1), java.time.LocalDate.parse(d)) % 7
        val (sSum, sN) = byDow(dow)
        (et, d) -> ((n,
          math.floor(t7.toDouble / 7.0 * 1e6 + 0.5).toLong,
          math.floor(sSum.toDouble / (sN * 7).toDouble * 1e6 + 0.5).toLong,
          math.floor((n.toDouble - t7.toDouble / 7.0 -
            sSum.toDouble / (sN * 7).toDouble) * 1e6 + 0.5).toLong))
      }
    }
    assert(got === want)
    // decomposition identity: trend + seasonal + remainder ~ n (to 1µ)
    got.values.foreach { case (n, t, s, r) =>
      assert(math.abs(n * 1000000L - (t + s + r)) <= 2L)
    }
  }

  test("q415 exact reach equals a driver-side BFS and the sketch " +
    "estimate holds its bound") {
    import graft.queries.GraphOps.{ANF_HOPS, ANF_PROBE_MAX,
      TRIANGLE_MIN_SUPPORT}
    val got = graft.queries.GraphOps.q415AnfReach(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    // driver-side graph + BFS
    val li = Tables(spark, sfDir).lineitem
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairCount = li.groupBy(_._1).values.toSeq.flatMap { ls =>
      for { (_, a) <- ls.toSeq; (_, b) <- ls.toSeq; if a < b } yield (a, b)
    }.groupBy(identity).view.mapValues(_.size)
    val edges = pairCount.collect {
      case ((a, b), n) if n >= TRIANGLE_MIN_SUPPORT => (a, b)
    }.toSeq
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val nodes = adj.keySet
    val probes = nodes.toSeq.sorted.take(ANF_PROBE_MAX)
    val want = probes.flatMap { p =>
      var ball = Set(p)
      (1 to ANF_HOPS).map { h =>
        ball = ball ++ ball.flatMap(n => adj.getOrElse(n, Set.empty))
        (p, h.toLong) -> ball.size.toLong
      }
    }.toMap
    assert(got.view.mapValues(_._1).toMap === want)
    // the HLL estimate stayed inside its 3-SE contract everywhere,
    // and balls are monotone in hop
    assert(got.values.forall(_._2))
    probes.foreach { p =>
      val seq = (1 to ANF_HOPS).map(h => got((p, h.toLong))._1)
      assert(seq == seq.sorted, s"ball not monotone for $p: $seq")
    }
  }

  test("q416 equals a driver-side Simpson-audit recompute") {
    val got = graft.queries.EventAnalytics.q416SimpsonAudit(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5)))).toMap
    val rows = Tables(spark, sfDir).events
      .select("event_type", "ts", "user_id", "value").collect()
    def dsum(xs: Seq[Double]) = xs.map(BigDecimal(_)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
    val want = rows.groupBy(_.getString(0)).map { case (et, rs) =>
      val segs = rs.groupBy { r =>
        java.time.temporal.ChronoUnit.DAYS.between(
          java.time.LocalDate.of(1970, 1, 1),
          r.getTimestamp(1).toLocalDateTime.toLocalDate) % 7
      }.values.toSeq.map { seg =>
        val (a, b) = seg.partition(_.getLong(2) % 2 == 0)
        (a.size.toLong, b.size.toLong,
          dsum(a.map(_.getDouble(3))), dsum(b.map(_.getDouble(3))))
      }.filter(s => s._1 > 0 && s._2 > 0)
      val ds = segs.map { case (na, nb, sa, sb) =>
        math.floor((sb.toDouble / nb - sa.toDouble / na) * 1e6 + 0.5).toLong
      }
      val pooled = math.floor(
        (segs.map(_._4).sum.toDouble / segs.map(_._2).sum -
          segs.map(_._3).sum.toDouble / segs.map(_._1).sum) * 1e6 + 0.5)
        .toLong
      val (pos, neg) = (ds.count(_ > 0).toLong, ds.count(_ < 0).toLong)
      et -> ((segs.size.toLong, pos, neg, pooled,
        (pos == segs.size && pooled < 0) || (neg == segs.size && pooled > 0)))
    }
    assert(got === want)
  }

  test("q416 flags a planted Simpson reversal") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft-simpson")
      .toString
    // classic construction: B beats A inside BOTH segments, but B's
    // mass sits in the low-value segment, so the pooled sign reverses
    val rows =
      Seq((0L, "2024-01-01", 0.0)) ++                       // L: 1 A @ 0
      (1 to 10).map(i => (2L * i + 1, "2024-01-01", 1.0)) ++ // L: 10 B @ 1
      (1 to 10).map(i => (2L * i, "2024-01-02", 100.0)) ++   // H: 10 A @ 100
      Seq((1L, "2024-01-02", 101.0))                        // H: 1 B @ 101
    import spark.implicits._
    rows.toDF("user_id", "day", "value")
      .select(monotonically_increasing_id().as("event_id"),
        to_timestamp(col("day")).as("ts"), col("user_id"),
        lit("para").as("event_type"), col("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = graft.queries.EventAnalytics.q416SimpsonAudit(spark, tmp)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 2 && r.getLong(2) == 2 && r.getLong(3) == 0)
    assert(r.getLong(4) < 0 && r.getBoolean(5),
      s"expected pooled reversal, got $r")
  }

  test("q322 density guard refuses a corpus past the mean-cell bound") {
    import org.apache.spark.sql.functions._
    import graft.queries.EventAnalytics.{
      DBSCAN_MAX_MEAN_CELL_POP, DBSCAN_SAMPLE}
    val tmp = java.nio.file.Files.createTempDirectory("graft-dense").toString
    // every event sampled (id % SAMPLE == 0) and co-located in ONE
    // eps-cell: mean population = n, far past the bound
    val n = (DBSCAN_MAX_MEAN_CELL_POP * 1.2).toLong
    spark.range(n)
      .select((col("id") * DBSCAN_SAMPLE).as("event_id"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("ts"),
        col("id").as("user_id"), lit("click").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val e = intercept[IllegalArgumentException] {
      graft.queries.EventAnalytics.q322Dbscan(spark, tmp)
    }
    assert(e.getMessage.contains("density guard"))
    // the real test corpus stays under the bound — gates unchanged
    assert(graft.queries.EventAnalytics.q322Dbscan(spark, sfDir)
      .limit(1).count() == 1)
  }
}
