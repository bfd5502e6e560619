package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** One audio blob as it would arrive from ingest: an already-encoded
  * WAV container in a plain `binary` column.
  */
final case class AudioRecord(doc_id: Long, wav: Array[Byte])

/** Integer-exact features of one REALLY parsed WAV blob — every field
  * is computable by the DuckDB oracle straight from the synthesis
  * formula, so the decode path is gated value-exact, not simulated.
  */
final case class DecodedAudio(
    doc_id: Long,
    sample_rate: Int,
    n_samples: Long,
    peak_abs: Long,
    sum_abs: Long,
    zero_cross: Long,
    duration_us: Long)

/** REAL audio codec for RIFF/WAVE PCM — the audio leg of the
  * multimodal path next to [[ImageCodec]] (images) and
  * [[MultimodalStub]] (the documented fallback for formats this
  * container cannot decode). The container format is public knowledge
  * (the RIFF/WAVE layout: 12-byte RIFF header, then tagged chunks;
  * `fmt ` carries PCM params, `data` carries little-endian samples),
  * and both writer and parser here implement it from that spec —
  * parseWav walks the chunk list generically, so containers with
  * extra chunks (LIST/INFO metadata is common in the wild) still
  * parse, and anything non-PCM / non-mono / non-16-bit fails fast
  * with a reason rather than producing garbage features.
  *
  * Scale shape: blobs stay one `binary` column; feature extraction
  * runs in `mapPartitions` so rows stream through the iterator and a
  * heavier codec (JNI resampler, ML feature net) could warm once per
  * partition — same contract as ImageCodec.decodeImages.
  */
object WavCodec {

  implicit val decodedAudioEncoder: Encoder[DecodedAudio] =
    Encoders.product[DecodedAudio]

  /** Test-fixture sample rate (8 kHz telephony). */
  val SAMPLE_RATE = 8000

  /** Deterministic per-doc sample count: 400 + (seed mod 5) * 80. */
  def synthLen(seed: Long): Int = (400 + (seed % 5) * 80).toInt

  /** The deterministic waveform shared with the DuckDB oracle:
    * sample(i) = ((seed*131 + i*17) mod 4001) - 2000, a full-swing
    * pseudo-sawtooth in [-2000, 2000]. Any change here must change
    * the oracle SQL in lockstep.
    */
  def synthSample(seed: Long, i: Int): Int =
    (((seed * 131 + i.toLong * 17) % 4001) - 2000).toInt

  /** Deterministic mono 16-bit PCM test signal, REALLY encoded into a
    * spec-compliant RIFF/WAVE container. Stands in for blobs that
    * arrive already-encoded in production.
    */
  def synthWav(seed: Long, n: Int, rate: Int): Array[Byte] = {
    val buf = ByteBuffer.allocate(44 + 2 * n).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)            // PCM
      .putShort(1)            // mono
      .putInt(rate)
      .putInt(rate * 2)       // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(2 * n)
    var i = 0
    while (i < n) { buf.putShort(synthSample(seed, i).toShort); i += 1 }
    buf.array()
  }

  /** Strict RIFF/WAVE PCM parse: validates the container magics, walks
    * the chunk list to `fmt ` and `data` (tolerating unknown chunks in
    * between, per the RIFF spec), and rejects anything that is not
    * mono 16-bit integer PCM. Returns (sampleRate, samples).
    */
  def parseWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    require(bytes.length >= 44, s"truncated container: ${bytes.length}B")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF container")
    buf.getInt() // declared riff size; not trusted, we walk chunks
    require(tag() == "WAVE", "not a WAVE form")
    var rate = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && (rate < 0 || samples == null)) {
      val id = tag()
      val size = buf.getInt()
      require(size >= 0 && size <= buf.remaining(),
        s"chunk $id overruns container")
      id match {
        case "fmt " =>
          require(size >= 16, "fmt chunk too small")
          val fmt = buf.getShort()
          require(fmt == 1, s"not integer PCM (fmt=$fmt)")
          val ch = buf.getShort()
          require(ch == 1, s"not mono (channels=$ch)")
          rate = buf.getInt()
          buf.getInt()   // byte rate
          buf.getShort() // block align
          val bits = buf.getShort()
          require(bits == 16, s"not 16-bit (bits=$bits)")
          buf.position(buf.position() + (size - 16))
        case "data" =>
          require(size % 2 == 0, "odd data chunk for 16-bit PCM")
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort(); i += 1 }
        case _ => // skip unknown chunk (word-aligned per spec)
          buf.position(buf.position() + size + (size & 1))
      }
    }
    require(rate > 0, "missing fmt chunk")
    require(samples != null, "missing data chunk")
    (rate, samples)
  }

  /** Parse each blob for real and reduce it to integer-exact features:
    * peak |amplitude|, total |amplitude|, strict zero crossings
    * (sign product < 0), and the container-derived duration in
    * microseconds.
    */
  def decodeAudio(ds: Dataset[AudioRecord]): Dataset[DecodedAudio] =
    ds.mapPartitions { it =>
      it.map { rec =>
        val (rate, s) = parseWav(rec.wav)
        var peak = 0L; var sumAbs = 0L; var zc = 0L
        var i = 0
        while (i < s.length) {
          val v = s(i).toLong
          val a = math.abs(v)
          if (a > peak) peak = a
          sumAbs += a
          if (i > 0 && s(i - 1).toLong * v < 0) zc += 1
          i += 1
        }
        DecodedAudio(rec.doc_id, rate, s.length.toLong, peak, sumAbs, zc,
          s.length.toLong * 1000000L / rate)
      }
    }
}
