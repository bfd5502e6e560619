package graft

import org.apache.spark.sql.functions._

/** Round-8 batch-50 spec: Avro roundtrip (q407) — the fourth row of
  * the interchange matrix. The recompute never touches Avro (it rolls
  * the parquet table up directly), so a lossy Avro writer/reader would
  * diverge it; a second test pins the roundtrip property itself
  * (row-for-row equality after write→read) plus the plan shape (avro
  * scan, pushed source predicate).
  */
class Batch50Spec extends SparkSpec {

  private val AVRO_FMT = graft.queries.CorpusOps.AVRO_FMT

  test("q407 equals a parquet-direct rollup (Avro adds nothing, loses nothing)") {
    val got = graft.queries.CorpusOps.q407AvroRoundtrip(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val want = Tables(spark, sfDir).documents
      .filter(col("source") =!= "src1")
      .select("source", "lang", "text", "doc_id").collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getString(2).codePointCount(0, r.getString(2).length).toLong,
        r.getLong(3)))
      .groupBy(t => (t._1, t._2)).map { case (k, rs) =>
        k -> ((rs.length.toLong, rs.map(_._3).sum,
          rs.map(_._4).min, rs.map(_._4).max))
      }
    assert(got === want)
  }

  test("q408 equals a driver-side brute-force interval-overlap recompute") {
    import graft.queries.JoinOps.{OVERLAP_PAD_US, OVERLAP_WATCH_MAX}
    val gapUs = graft.queries.SessionOps.GAP_MINUTES * 60L * 1000000L
    val got = graft.queries.JoinOps.q408IntervalOverlap(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // re-derive sessions with a plain fold (no windows), then pair by
    // brute force — independent of both the grid cells and the
    // emission-dedup trick
    val evs = Tables(spark, sfDir).events
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sessions = evs.groupBy(_._1).toSeq.flatMap { case (u, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3)).map(_._2)
      val ivs = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var lo = sorted.head; var hi = sorted.head
      sorted.tail.foreach { us =>
        if (us - hi > gapUs) { ivs += ((lo, hi)); lo = us }
        hi = us
      }
      ivs += ((lo, hi))
      ivs.map { case (l, h) => (u, l, h + OVERLAP_PAD_US) }
    }
    val want = sessions.filter(_._1 < OVERLAP_WATCH_MAX)
      .flatMap { case (ua, la, ha) =>
        sessions.collect {
          case (ub, lb, hb)
            if ub != ua && math.max(la, lb) <= math.min(ha, hb) =>
            (ua, ub, math.min(ha, hb) - math.max(la, lb))
        }
      }.groupBy(_._1).map { case (u, ps) =>
        u -> ((ps.size.toLong, ps.map(_._2).distinct.size.toLong,
          ps.map(_._3).sum))
      }
    assert(got === want)
  }

  test("q408 plan: cell equi-join only — no cartesian, no nested loop") {
    val p = graft.queries.JoinOps.q408IntervalOverlap(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"interval overlap degraded to a non-equi join:\n$p")
  }

  test("q409 equals a driver-side MD5-coin randomized-response recompute") {
    import graft.queries.StatsOps.{RR_TRUTH_PCT, RR_YES_PCT}
    val got = graft.queries.StatsOps.q409RandomizedResponse(spark, sfDir)
      .collect().head
    val md = java.security.MessageDigest.getInstance("MD5")
    def coin(salt: String, u: Long): Long = {
      val hex = md.digest(s"$salt$u".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val truth = Tables(spark, sfDir).events
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (u, rs) =>
        u -> (if (rs.exists(_._2 == "purchase")) 1L else 0L)
      }
    val reported = truth.map { case (u, t) =>
      if (coin("rr1:", u) < RR_TRUTH_PCT) t
      else if (coin("rr2:", u) < RR_YES_PCT) 1L else 0L
    }
    val n = truth.size.toLong
    val nTrue = truth.values.sum
    val nYes = reported.sum
    val p = RR_TRUTH_PCT / 100.0; val q = RR_YES_PCT / 100.0
    val piHat = (nYes.toDouble / n - (1.0 - p) * q) / p
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ===
      ((n, nTrue, nYes)))
    assert(got.getLong(3) === math.floor(piHat * 1e6 + 0.5).toLong)
    assert(got.getLong(4) ===
      math.floor((piHat - nTrue.toDouble / n) * 1e6 + 0.5).toLong)
    // the mechanism must actually perturb: some reports differ from truth
    assert(truth.values.toSeq.sum != nYes || n < 10)
  }

  test("q410 chunk walk: invariants the encoder-dependent fields obey, " +
    "and corruption detection the oracle can't see") {
    import graft.operators.ImageCodec
    // every synthesized PNG walks clean with >= 3 chunks (IHDR, >= 1
    // IDAT, IEND) and a positive compressed payload
    (0L until 40L).foreach { id =>
      val w = (id % 13 + 4).toInt; val h = (id % 7 + 3).toInt
      val m = ImageCodec.pngChunkWalk(id, ImageCodec.synthGrayPng(id, w, h))
      assert(m.well_formed && m.crc_ok && m.n_chunks >= 3 &&
        m.idat_bytes > 0 && m.width == w && m.height == h &&
        m.bit_depth == 8 && m.color_type == 0, s"id=$id: $m")
    }
    // a flipped payload byte must trip CRC but not well-formedness;
    // a truncated stream must trip well-formedness
    val bytes = ImageCodec.synthGrayPng(7L, 9, 5)
    val flipped = bytes.clone()
    flipped(40) = (flipped(40) ^ 0x5a).toByte
    val fm = ImageCodec.pngChunkWalk(7L, flipped)
    assert(!fm.crc_ok, "payload corruption must fail the CRC audit")
    val tm = ImageCodec.pngChunkWalk(7L, bytes.take(bytes.length - 5))
    assert(!tm.well_formed, "truncation must fail well-formedness")
    // non-PNG bytes are a flagged row, not an exception
    val nm = ImageCodec.pngChunkWalk(1L, Array[Byte](1, 2, 3))
    assert(!nm.well_formed && !nm.crc_ok)
    // crafted chunk length near Int.MaxValue: int overflow in the
    // bounds check must not bypass it into NegativeArraySizeException
    val sig = bytes.take(8)
    val huge = java.nio.ByteBuffer.allocate(20)
    huge.put(sig).putInt(Int.MaxValue - 3).put("IDAT".getBytes("US-ASCII"))
      .putInt(0)
    val hm = ImageCodec.pngChunkWalk(2L, huge.array())
    assert(!hm.well_formed && !hm.crc_ok)
    // IHDR declaring len < 13 passes CRC but must flag, not underflow
    val shortIhdr = java.nio.ByteBuffer.allocate(8 + 4 + 4 + 4 + 4)
    val td = "IHDR".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3, 4)
    val crc = new java.util.zip.CRC32; crc.update(td)
    shortIhdr.put(sig).putInt(4).put(td).putInt(crc.getValue.toInt)
    val sm = ImageCodec.pngChunkWalk(3L, shortIhdr.array())
    assert(!sm.well_formed && !sm.crc_ok)
  }

  test("q411 equals a driver-side confusion-matrix metric recompute") {
    val got = graft.queries.LlmText.q411MacroF1(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    val pairs = graft.queries.LlmText.q32LangId(spark, sfDir)
      .select("actual_lang", "pred_lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val classes = (pairs.map(_._1) ++ pairs.map(_._2)).distinct
    def micro(num: Long, den: Long): Long =
      if (den > 0) math.floor(num.toDouble * 1e6 / den.toDouble + 0.5).toLong
      else 0L
    val per = classes.map { c =>
      val tp = pairs.count(p => p._1 == c && p._2 == c).toLong
      val np = pairs.count(_._2 == c).toLong
      val na = pairs.count(_._1 == c).toLong
      val pm = micro(tp, np); val rm = micro(tp, na)
      val f1 = micro(2L * pm * rm, (pm + rm) * 1000000L)
      c -> ((tp, np, na, pm, rm, f1))
    }.toMap
    per.foreach { case (c, v) => assert(got(c) === v, s"class $c") }
    val sup = per.values.filter(_._3 > 0).toSeq
    def m(f: ((Long, Long, Long, Long, Long, Long)) => Long): Long =
      math.floor(sup.map(f).sum.toDouble / sup.size + 0.5).toLong
    assert(got("__macro")._4 === m(_._4))
    assert(got("__macro")._5 === m(_._5))
    assert(got("__macro")._6 === m(_._6))
    val tpAll = per.values.map(_._1).sum
    val nAll = pairs.length.toLong
    assert(got("__micro")._6 === micro(tpAll, nAll))
    // macro must genuinely differ from micro on imbalanced data (the
    // reason both rows exist); equality would suggest a wiring bug
    assert(got("__macro")._6 != got("__micro")._6 || sup.size <= 1)
  }

  test("q407 roundtrip is lossless and the avro scan pushes the filter") {
    import graft.queries.Scratch
    val docs = Tables(spark, sfDir).documents
    val tmp = Scratch.dir("avro_spec")
    docs.write.mode("overwrite").format(AVRO_FMT).save(s"$tmp/c")
    val back = spark.read.format(AVRO_FMT).load(s"$tmp/c")
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      docs.schema.map(f => (f.name, f.dataType)))
    val a = docs.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a === b, "avro write->read must roundtrip every row exactly")
    val p = back.filter(col("source") =!= "src1")
      .groupBy("source").count()
      .queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("avro"), s"expected an avro scan:\n$p")
    assert(p.contains("PushedFilters") && p.contains("source"),
      s"source predicate not pushed into the avro scan:\n$p")
  }
}
