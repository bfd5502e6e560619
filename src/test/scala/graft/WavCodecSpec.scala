package graft

import java.nio.{ByteBuffer, ByteOrder}

import graft.operators.{AudioRecord, WavCodec}
import org.scalatest.funsuite.AnyFunSuite

class WavCodecSpec extends AnyFunSuite {

  test("encode -> parse round-trips samples and rate exactly") {
    val n = WavCodec.synthLen(7L)
    val bytes = WavCodec.synthWav(7L, n, WavCodec.SAMPLE_RATE)
    val (rate, s) = WavCodec.parseWav(bytes)
    assert(rate === WavCodec.SAMPLE_RATE)
    assert(s.length === n)
    (0 until n).foreach(i => assert(s(i) === WavCodec.synthSample(7L, i)))
  }

  test("parser walks past unknown chunks between fmt and data") {
    val base = WavCodec.synthWav(3L, 100, 8000)
    // splice a LIST chunk (8 + 6 bytes, padded to even) before `data`
    val dataAt = {
      var p = 12
      while (!(base(p) == 'd' && base(p + 1) == 'a' &&
        base(p + 2) == 't' && base(p + 3) == 'a')) p += 1
      p
    }
    val extra = ByteBuffer.allocate(14).order(ByteOrder.LITTLE_ENDIAN)
      .put("LIST".getBytes("US-ASCII")).putInt(6)
      .put("INFOxy".getBytes("US-ASCII")).array()
    val spliced = base.take(dataAt) ++ extra ++ base.drop(dataAt)
    // fix the RIFF size field
    ByteBuffer.wrap(spliced).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    val (rate, s) = WavCodec.parseWav(spliced)
    assert(rate === 8000)
    assert(s.length === 100)
    assert(s(99) === WavCodec.synthSample(3L, 99))
  }

  test("malformed containers fail fast with a reason") {
    val good = WavCodec.synthWav(1L, 50, 8000)
    // truncated
    intercept[IllegalArgumentException](WavCodec.parseWav(good.take(20)))
    // wrong magic
    val bad = good.clone(); bad(0) = 'X'
    intercept[IllegalArgumentException](WavCodec.parseWav(bad))
    // stereo is rejected (channels field is at offset 22)
    val stereo = good.clone()
    ByteBuffer.wrap(stereo).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(22, 2)
    intercept[IllegalArgumentException](WavCodec.parseWav(stereo))
  }

  test("decodeAudio features match a scalar re-computation") {
    val spark0 = TestSpark.spark
    import spark0.implicits._
    val seeds = Seq(0L, 1L, 2L, 13L, 999L)
    val ds = seeds.toDS().map(id => AudioRecord(id,
      WavCodec.synthWav(id, WavCodec.synthLen(id), WavCodec.SAMPLE_RATE)))
    val got = WavCodec.decodeAudio(ds).collect().map(d => d.doc_id -> d).toMap
    seeds.foreach { id =>
      val n = WavCodec.synthLen(id)
      val s = (0 until n).map(WavCodec.synthSample(id, _))
      val d = got(id)
      assert(d.n_samples === n.toLong)
      assert(d.peak_abs === s.map(v => math.abs(v.toLong)).max)
      assert(d.sum_abs === s.map(v => math.abs(v.toLong)).sum)
      assert(d.zero_cross ===
        s.sliding(2).count(p => p(0).toLong * p(1) < 0).toLong)
      assert(d.duration_us === n.toLong * 1000000L / 8000L)
    }
  }
}
