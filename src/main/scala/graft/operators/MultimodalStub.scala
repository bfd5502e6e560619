package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Opaque media record: the 100 TB layout keeps image/audio/video as a
  * `binary` column plus typed metadata, partitioned so one partition
  * holds many small blobs (SURVEY §2 q36, §6).
  */
final case class MediaRecord(doc_id: Long, media_kind: Int, bytes: Array[Byte])

/** Decoded media features. `features` is the fixed-width embedding a
  * real decoder + feature extractor would emit.
  */
final case class DecodedMedia(
    doc_id: Long,
    media_kind: Int,
    n_bytes: Int,
    width: Int,
    height: Int,
    n_frames: Int,
    features: Array[Float])

/** Multimodal decode plumbing with a STUBBED codec (SURVEY §6: no
  * image/audio libraries in this container).
  *
  * The Spark side is real: typed Dataset in/out, `mapPartitions` so a
  * production codec initializes ONCE per partition (decoder handles,
  * GPU contexts, JNI libs are expensive; per-row init would dominate),
  * batch-friendly iterator pipelining, deterministic output for tests.
  * Only `fakeDecode` is a placeholder — swap it for an actual codec
  * call and nothing else changes.
  */
object MultimodalStub {

  implicit val decodedEncoder: Encoder[DecodedMedia] = Encoders.product[DecodedMedia]

  /** Deterministic fake decode: dimensions and features derived from
    * the byte content via a rolling hash. Replaces e.g. a JPEG decode +
    * CNN feature pass.
    */
  def fakeDecode(r: MediaRecord): DecodedMedia = {
    val n = r.bytes.length
    var h = 0L
    var i = 0
    while (i < n) { h = (h * 31 + (r.bytes(i) & 0xff)) % 1000000007L; i += 1 }
    val feats = Array.tabulate(8) { k =>
      (((h >> (k * 4)) & 0xffL).toFloat / 255.0f) - 0.5f
    }
    DecodedMedia(
      doc_id = r.doc_id,
      media_kind = r.media_kind,
      n_bytes = n,
      width = (n % 640) + 1,
      height = (n % 480) + 1,
      n_frames = if (r.media_kind == 2) (h % 16L).toInt + 1 else 1,
      features = feats)
  }

  /** Decode a partitioned dataset of media blobs. One codec init per
    * partition; rows stream through the iterator (no partition-sized
    * materialization).
    */
  def decode(ds: Dataset[MediaRecord]): Dataset[DecodedMedia] =
    ds.mapPartitions { it =>
      // production: val codec = Codec.acquire() here, once per partition
      it.map(fakeDecode)
    }

  implicit val frameEncoder: Encoder[SampledFrame] = Encoders.product[SampledFrame]

  /** Frame sampling: every `stride`-th frame of each medium, emitted as
    * one record per sampled frame — the bounded 1->N expansion a video
    * pipeline runs between decode and per-frame feature extraction.
    * Same mapPartitions shape as [[decode]] (codec init once per
    * partition, iterator flatMap, no partition-sized buffering); the
    * fanout is bounded by the decoder's frame count, so output bytes
    * are a small multiple of input records, never of input bytes. The
    * stub derives each frame's hash from the medium's rolling hash so
    * the whole expansion is oracle-checkable; a real pipeline would put
    * decoded frame tensors (or their features) in its place.
    */
  def frameSample(ds: Dataset[MediaRecord], stride: Int): Dataset[SampledFrame] =
    ds.mapPartitions { it =>
      // production: val codec = Codec.acquire() here, once per partition
      it.flatMap { r =>
        val n = r.bytes.length
        var h = 0L
        var i = 0
        while (i < n) { h = (h * 31 + (r.bytes(i) & 0xff)) % 1000000007L; i += 1 }
        val nFrames = if (r.media_kind == 2) (h % 16L).toInt + 1 else 1
        (0 until nFrames by stride).map { f =>
          SampledFrame(r.doc_id, r.media_kind, nFrames, f,
            (h * 31 + f) % 1000000007L)
        }
      }
    }
}

/** One sampled frame of a decoded medium (stubbed: `frame_hash` stands
  * in for the decoded frame's feature payload).
  */
final case class SampledFrame(
    doc_id: Long,
    media_kind: Int,
    n_frames: Int,
    frame_idx: Int,
    frame_hash: Long)
