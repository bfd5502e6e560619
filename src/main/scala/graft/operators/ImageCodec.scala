package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.ByteBuffer

import javax.imageio.ImageIO

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Pixel-level stats of one REALLY decoded image (vs [[DecodedMedia]],
  * whose payload is the stub's hash). Integer-exact, so the DuckDB
  * oracle can recompute them from the synthesis formula with no float
  * formatting in the gate.
  */
final case class DecodedImage(
    doc_id: Long,
    width: Int,
    height: Int,
    n_pixels: Long,
    px_sum: Long,
    px_min: Int,
    px_max: Int)

/** Audit row for the LOSSY decode leg (q297): JPEG bytes really
  * decoded, the decoded raster re-encoded to (lossless) PNG and
  * decoded again for a pixel-exact roundtrip check, and the decoded
  * pixels compared against the synthesis formula under a mean-abs-
  * error bound — the PSNR-floor shape every lossy-media gate takes,
  * since exact pixel values are codec-implementation-defined.
  */
final case class JpegAudit(
    doc_id: Long,
    width: Int,
    height: Int,
    is_jpeg: Boolean,
    png_roundtrip_exact: Boolean,
    mae_le_tol: Boolean)

/** One really-decoded sampled frame of a multi-frame container. */
final case class DecodedFrame(
    doc_id: Long,
    n_frames: Int,
    frame_idx: Int,
    width: Int,
    height: Int,
    px_sum: Long)

/** REAL image codec on the JDK's public `javax.imageio` — upgrades the
  * multimodal path from "hash the plumbing" (operators/MultimodalStub
  * .scala, kept as the documented fallback for formats this container
  * has no decoder for) to decoding actual pixels. PNG grayscale is
  * bit-lossless through ImageIO, so an encode -> bytes -> decode ->
  * pixel-stats pipeline is exactly reproducible by an oracle that
  * evaluates the synthesis formula directly — the decode is gated
  * pixel-exact, not simulated.
  *
  * Scale shape (SURVEY §2 q94/q111): blobs stay one `binary` column;
  * decode runs in `mapPartitions` so the codec warms once per
  * partition and rows stream through the iterator — swap ImageIO for
  * a JNI/GPU codec and nothing upstream changes.
  */
object ImageCodec {

  implicit val decodedImageEncoder: Encoder[DecodedImage] =
    Encoders.product[DecodedImage]
  implicit val decodedFrameEncoder: Encoder[DecodedFrame] =
    Encoders.product[DecodedFrame]
  implicit val jpegAuditEncoder: Encoder[JpegAudit] =
    Encoders.product[JpegAudit]

  /** PNG magic (the 8-byte signature's first 4 bytes are enough to
    * dispatch against the stub fallback).
    */
  def isPng(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 &&
      (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
      bytes(3) == 'G'

  /** PNG container metadata from a chunk walk — NO pixel decode.
    * The inventory pass a 100 TB image corpus runs before deciding
    * what to decode at all: dimensions and format from IHDR, payload
    * volume from the IDAT lengths, integrity from per-chunk CRC32,
    * well-formedness from the signature + IHDR-first/IEND-last rule.
    */
  final case class PngMeta(
      doc_id: Long, n_chunks: Int, width: Int, height: Int,
      bit_depth: Int, color_type: Int, idat_bytes: Long,
      crc_ok: Boolean, well_formed: Boolean)

  implicit val pngMetaEncoder: Encoder[PngMeta] = Encoders.product[PngMeta]

  /** Walk the PNG chunk stream: 8-byte signature, then
    * [len:4][type:4][data:len][crc:4] until IEND. CRC32 covers
    * type+data (RFC 2083). Truncated or mis-signed input yields
    * well_formed=false with zeroed fields rather than an exception —
    * a bad blob is a flagged row, not a dead job.
    */
  def pngChunkWalk(docId: Long, bytes: Array[Byte]): PngMeta = {
    def fail = PngMeta(docId, 0, 0, 0, 0, 0, 0L, crc_ok = false,
      well_formed = false)
    if (!isPng(bytes) || bytes.length < 8) return fail
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.position(8)
    var nChunks = 0
    var w = 0; var h = 0; var depth = 0; var color = 0
    var idat = 0L
    var crcOk = true
    var sawIhdrFirst = false
    var sawIend = false
    val crc = new java.util.zip.CRC32
    while (!sawIend && bb.remaining >= 12) {
      val len = bb.getInt
      // long arithmetic: a crafted len near Int.MaxValue overflows
      // `len + 8` (and `4 + len` below) in int, slipping past this
      // bounds check and throwing instead of flagging the row
      if (len < 0 || bb.remaining.toLong < len.toLong + 8L) return fail
      val typeAndData = new Array[Byte](4 + len)
      bb.get(typeAndData)
      val stored = bb.getInt
      crc.reset()
      crc.update(typeAndData)
      if (crc.getValue.toInt != stored) crcOk = false
      val ctype = new String(typeAndData, 0, 4, "US-ASCII")
      if (nChunks == 0 && ctype == "IHDR") {
        // a declared IHDR shorter than the 13-byte spec payload passes
        // the CRC stage but underflows the field reads — malformed
        // container, flagged not thrown
        if (len < 13) return fail
        sawIhdrFirst = true
        val d = java.nio.ByteBuffer.wrap(typeAndData, 4, len)
        w = d.getInt; h = d.getInt
        depth = d.get() & 0xff; color = d.get() & 0xff
      }
      if (ctype == "IDAT") idat += len
      if (ctype == "IEND") sawIend = true
      nChunks += 1
    }
    PngMeta(docId, nChunks, w, h, depth, color, idat, crcOk,
      well_formed = sawIhdrFirst && sawIend && bb.remaining == 0)
  }

  /** The deterministic test-image pixel formula, shared with the
    * DuckDB oracle: pixel(x, y) = (seed*31 + x*7 + y*13) mod 256.
    * Any change here must change the oracle SQL in lockstep.
    */
  def synthPixel(seed: Long, x: Int, y: Int): Int =
    (((seed * 31 + x * 7 + y * 13) % 256 + 256) % 256).toInt

  /** Deterministic grayscale test image, REALLY encoded to PNG bytes.
    * Stands in for blobs that arrive already-encoded in production.
    */
  def synthGrayPng(seed: Long, width: Int, height: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        raster.setSample(x, y, 0, synthPixel(seed, x, y))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real PNG decode -> integer pixel stats. Grayscale PNG round-trips
    * bit-exact through ImageIO, so these equal the synthesis formula.
    */
  def decodeGray(docId: Long, bytes: Array[Byte]): DecodedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val raster = img.getRaster
    val w = img.getWidth; val h = img.getHeight
    var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = raster.getSample(x, y, 0)
        sum += p
        if (p < mn) mn = p
        if (p > mx) mx = p
        x += 1
      }
      y += 1
    }
    DecodedImage(docId, w, h, w.toLong * h, sum, mn, mx)
  }

  /** JPEG magic: SOI marker 0xFFD8. */
  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8

  /** SMOOTH deterministic test-pixel formula for the lossy leg:
    * pixel(x, y) = seed mod 97 + 3x + 5y, a wrap-free linear ramp
    * (≤ 216 for the q297 dims) that JPEG's per-block DCT reproduces
    * within a few grey levels — unlike [[synthPixel]]'s mod-256 wraps,
    * whose discontinuities would force a sloppy error bound. Shared
    * with the oracle's dimension formulas; any change here must change
    * q297's SQL in lockstep.
    */
  def smoothPixel(seed: Long, x: Int, y: Int): Int =
    (((seed % 97 + 97) % 97) + 3 * x + 5 * y).toInt

  /** Deterministic smooth grayscale test image, REALLY encoded to JPEG
    * bytes with the JDK's built-in lossy encoder (default quality).
    */
  def synthSmoothGrayJpeg(seed: Long, width: Int, height: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        raster.setSample(x, y, 0, smoothPixel(seed, x, y))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Lossy-decode audit (q297): REALLY decode each JPEG blob, re-encode
    * the decoded raster to PNG and decode THAT for a pixel-exact
    * roundtrip check (PNG is lossless, so any mismatch is a codec
    * plumbing bug, not JPEG loss), and bound the decoded pixels' mean
    * absolute error against the synthesis formula by `maeTolMilli`
    * (units: 1/1000 grey level). Same once-per-partition iterator-
    * streaming shape as [[decodeImages]]; non-JPEG bytes report
    * loudly-but-deterministically with every flag false.
    */
  def jpegAudit(ds: Dataset[MediaRecord], maeTolMilli: Long): Dataset[JpegAudit] =
    ds.mapPartitions { it =>
      it.map { r =>
        if (!isJpeg(r.bytes)) JpegAudit(r.doc_id, 0, 0, false, false, false)
        else {
          val img = ImageIO.read(new ByteArrayInputStream(r.bytes))
          val w = img.getWidth; val h = img.getHeight
          val bos = new ByteArrayOutputStream()
          ImageIO.write(img, "png", bos)
          val img2 = ImageIO.read(new ByteArrayInputStream(bos.toByteArray))
          var exact = img2.getWidth == w && img2.getHeight == h
          var absErr = 0L
          val ra = img.getRaster; val rb = img2.getRaster
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = ra.getSample(x, y, 0)
              if (exact && rb.getSample(x, y, 0) != p) exact = false
              absErr += math.abs(p - smoothPixel(r.doc_id, x, y))
              x += 1
            }
            y += 1
          }
          val maeMilli = absErr * 1000L / (w.toLong * h)
          JpegAudit(r.doc_id, w, h, true, exact, maeMilli <= maeTolMilli)
        }
      }
    }

  /** Minimal multi-frame container for the video path: int32 frame
    * count, then per frame an int32 length + the frame's PNG bytes.
    * (Public formats like animated PNG/GIF need encoder plugins this
    * container lacks; the container is ours, the per-frame codec is
    * the real ImageIO one.)
    */
  def packFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val total = 4 + frames.map(4 + _.length).sum
    val buf = ByteBuffer.allocate(total)
    buf.putInt(frames.length)
    frames.foreach { f => buf.putInt(f.length); buf.put(f) }
    buf.array()
  }

  def unpackFrames(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    (0 until n).map { _ =>
      val len = buf.getInt
      val f = new Array[Byte](len)
      buf.get(f)
      f
    }
  }

  /** Decode a dataset of image blobs with the REAL codec; non-PNG
    * bytes fall back to the deterministic stub's dimensions (px stats
    * zeroed) so unknown formats degrade loudly-but-deterministically
    * instead of throwing mid-job — the production analogue is routing
    * undecodable blobs to a quarantine column.
    */
  def decodeImages(ds: Dataset[MediaRecord]): Dataset[DecodedImage] =
    ds.mapPartitions { it =>
      // real codec path: ImageIO plugin lookup warms once per partition
      it.map { r =>
        if (isPng(r.bytes)) decodeGray(r.doc_id, r.bytes)
        else {
          val fake = MultimodalStub.fakeDecode(r)
          DecodedImage(r.doc_id, fake.width, fake.height, 0L, 0L, 0, 0)
        }
      }
    }

  /** Nearest-neighbor 2x downsample as a REAL image transform: decode
    * the PNG, sample every even-coordinate pixel into a new image,
    * re-encode THAT image to PNG bytes, and decode the re-encoded
    * artifact for its stats — the full decode -> transform -> encode
    * -> decode cycle a thumbnailing/preprocessing stage performs, not
    * a stats shortcut. Grayscale PNG is lossless, so the stats equal
    * the synthesis formula at even coordinates exactly.
    */
  def resizeHalf(docId: Long, bytes: Array[Byte]): DecodedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val in = img.getRaster
    val w2 = (img.getWidth + 1) / 2
    val h2 = (img.getHeight + 1) / 2
    val out = new BufferedImage(w2, h2, BufferedImage.TYPE_BYTE_GRAY)
    val or = out.getRaster
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        or.setSample(x, y, 0, in.getSample(2 * x, 2 * y, 0))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(out, "png", bos)
    decodeGray(docId, bos.toByteArray)
  }

  /** Resize a dataset of image blobs (same once-per-partition,
    * iterator-streaming shape as [[decodeImages]]; non-PNG bytes take
    * the same loud-but-deterministic fallback).
    */
  def resizeImages(ds: Dataset[MediaRecord]): Dataset[DecodedImage] =
    ds.mapPartitions { it =>
      it.map { r =>
        if (isPng(r.bytes)) resizeHalf(r.doc_id, r.bytes)
        else {
          val fake = MultimodalStub.fakeDecode(r)
          DecodedImage(r.doc_id, fake.width, fake.height, 0L, 0L, 0, 0)
        }
      }
    }

  /** Every `stride`-th frame of each packed container, REALLY decoded
    * to per-frame pixel sums. Same once-per-partition, iterator-
    * streaming shape as [[decodeImages]]; the fanout is bounded by the
    * container's frame count.
    */
  def sampleFrames(ds: Dataset[MediaRecord], stride: Int): Dataset[DecodedFrame] =
    ds.mapPartitions { it =>
      it.flatMap { r =>
        val frames = unpackFrames(r.bytes)
        val n = frames.length
        (0 until n by stride).iterator.map { i =>
          val d = decodeGray(r.doc_id, frames(i))
          DecodedFrame(r.doc_id, n, i, d.width, d.height, d.px_sum)
        }
      }
    }
}
