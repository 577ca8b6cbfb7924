package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, plus the decode/feature-extract plumbing.
  *
  * The Spark-side design is real — schema, partition-preserving
  * `mapPartitions`, batch-shaped processing — and the decode stage now
  * splits by format: 24-bit BMP, binary PPM, AND non-interlaced 8-bit
  * truecolor PNG (zlib via the public JDK) are decoded FOR REAL by the
  * pure-JVM codecs at the bottom of this file
  * ([[encodeBmp]]/[[decodeBmp]]/[[decodePpm]]/[[decodePng]] →
  * [[imageStats]], oracle-checked value-exactly); formats needing
  * external codec libraries (JPEG/video) still take the [[decodeStub]]
  * fallback — swapping in libjpeg/ffmpeg changes only that function
  * body, not the plan shape.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRecord(media_id: Long, payload: Array[Byte], mime: String)

  /** Extracted features for one media record. */
  case class MediaFeatures(media_id: Long, byte_len: Int, width: Int,
                           height: Int, channels: Int,
                           features: Array[Float])

  /** Wrap a text table as a media table: payload = UTF-8 bytes (stands in for
    * image/audio bytes; the engine never looks inside the payload except in
    * the decode stage). */
  def asMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      lit("application/octet-stream").as("mime"))

  /** The stub "decoded" dimensions as a function of payload length — ONE
    * definition in JVM and Column form, because three call sites
    * (decodeStub, payloadMetadata, sampleFrames) must agree on it: the
    * column-only paths are meaningful precisely because they match what
    * the decode stage would report. Swapping in a real decoder replaces
    * these two definitions together. */
  private def stubWidth(len: Int): Int = len % 64 + 16
  private def stubHeight(len: Int): Int = len % 48 + 16
  private[llm] def stubWidthCol(len: org.apache.spark.sql.Column) = len % 64 + 16
  private[llm] def stubHeightCol(len: org.apache.spark.sql.Column) = len % 48 + 16

  /** STUB decode: deterministic fake "image decode + feature extraction".
    * Real deployments replace the body with an actual codec (e.g. JNI
    * libjpeg / ffmpeg); signature and batch shape stay identical. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val len = payload.length
    val width = stubWidth(len)
    val height = stubHeight(len)
    // 8 fake features: windowed byte averages — deterministic, cheap.
    // Empty payloads (zero-byte media) decode to all-zero features.
    val feats =
      if (len == 0) Array.fill(8)(0.0f)
      else Array.tabulate(8) { i =>
        val lo = i * len / 8
        val hi = math.max(lo + 1, (i + 1) * len / 8)
        var s = 0.0f
        var j = lo
        while (j < hi && j < len) { s += (payload(j) & 0xff); j += 1 }
        s / (hi - lo)
      }
    (width, height, 3, feats)
  }

  /** Per-partition decode: imperative inner loop over a partition's records —
    * the one legitimate `mapPartitions` use (per-record codec calls), keeping
    * partitioning intact and driver out of the data path. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val (w, h, ch, feats) = decodeStub(r.payload)
        MediaFeatures(r.media_id, r.payload.length, w, h, ch, feats)
      }
    }
  }

  /** Column-only metadata extraction (no decode): payload length and a hex
    * fingerprint prefix — pure codegen'd expressions, used when the payload
    * itself is not needed. */
  def payloadMetadata(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      length(col("payload")).as("byte_len"),
      substring(lower(hex(col("payload"))), 1, 32).as("payload_hex_prefix"),
      stubWidthCol(length(col("payload"))).as("fake_width"),
      stubHeightCol(length(col("payload"))).as("fake_height"),
      lit(3).as("channels"))

  /** Frame sampling plumbing: treat the payload as a fake "video" of
    * `frameSize`-byte frames and emit every `stride`-th frame with its
    * byte slice metadata and fingerprint — one media row fans out to
    * bounded frame rows, entirely in column expressions (explode over a
    * computed index sequence + binary substring), so the shape survives
    * 100 TB: no collect, no per-row driver work, frames stream through the
    * same task as their parent row. A real video decoder replaces the
    * byte-slice "frame" with actual frame extraction; the fan-out,
    * schema, and per-frame metadata stay identical. Also carries the
    * resize plan (target width, proportional height) as metadata — the
    * stub form of a resize stage. */
  def sampleFrames(media: DataFrame, frameSize: Int = 256, stride: Int = 2,
                   resizeTargetW: Int = 64): DataFrame = {
    val frame = expr(s"substring(payload, frame_idx * $frameSize + 1, $frameSize)")
    media
      .select(col("media_id"), col("payload"),
        greatest(ceil(length(col("payload")).cast("double") / frameSize).cast("int"),
          lit(1)).as("n_frames"),
        stubWidthCol(length(col("payload"))).as("w"),
        stubHeightCol(length(col("payload"))).as("h"))
      .select(col("media_id"), col("n_frames"), col("w"), col("h"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"),
        col("payload"))
      .select(col("media_id"), col("n_frames"), col("frame_idx"),
        length(frame).as("frame_len"),
        substring(lower(hex(frame)), 1, 16).as("frame_fp"),
        lit(resizeTargetW).as("resize_w"),
        round(col("h").cast("double") * resizeTargetW / col("w")).cast("int").as("resize_h"))
  }

  /** Typed dataset from a text-backed media frame. */
  def toMediaDataset(spark: SparkSession, df: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    df.as[MediaRecord]
  }

  // ------------------------------------------------------------------
  // REAL pure-JVM codecs. A zero-dependency container can still decode
  // two honest image formats bit-exactly: 24-bit uncompressed BMP and
  // binary PPM (P6). These are not stubs — encodeBmp writes a
  // spec-conformant file (BITMAPFILEHEADER + BITMAPINFOHEADER, BGR
  // pixel order, bottom-up rows, 4-byte row padding) and decodeBmp
  // parses arbitrary conformant payloads back (including top-down
  // negative-height files), so the decode stage of the pipeline runs a
  // real parse over real bytes. PNG (compressed, zlib through the
  // public JDK Inflater) decodes for real too — see the PNG section
  // below. Formats needing external codec libraries (JPEG/ffmpeg)
  // still take the documented [[decodeStub]] fallback.
  // ------------------------------------------------------------------

  /** Decoded image statistics: exact per-channel pixel sums (integer —
    * engine- and order-invariant) plus dimensions. */
  case class ImageStats(media_id: Long, width: Int, height: Int,
                        channels: Int, r_sum: Long, g_sum: Long,
                        b_sum: Long, n_pixels: Long)

  /** Write a 24-bit uncompressed bottom-up BMP. `pixel(x, y)` returns
    * (r, g, b); values are taken mod 256. */
  def encodeBmp(width: Int, height: Int,
                pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"need positive dims, got $width x $height")
    val rowSize = (width * 3 + 3) / 4 * 4
    val dataSize = rowSize * height
    val b = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54) // reserved, pixel-data offset
    b.putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1 // bottom-up row order, BGR byte order
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val (r, g, bl) = pixel(x, y)
        b.put(bl.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var p = width * 3
      while (p < rowSize) { b.put(0.toByte); p += 1 }
      y -= 1
    }
    b.array()
  }

  /** Parse a 24-bit uncompressed BMP: (width, height, [rSum, gSum,
    * bSum]). None for anything that is not a conformant 24bpp BMP
    * (wrong magic, compressed, truncated) — callers fall back. Handles
    * both bottom-up (positive height) and top-down (negative height)
    * files and arbitrary pixel-data offsets. */
  def decodeBmp(payload: Array[Byte]): Option[(Int, Int, Array[Long])] = {
    if (payload.length < 54 || payload(0) != 'B' || payload(1) != 'M') return None
    val b = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val off = b.getInt(10)
    val hdrSize = b.getInt(14)
    val width = b.getInt(18)
    val rawHeight = b.getInt(22)
    val planes = b.getShort(26)
    val bpp = b.getShort(28)
    val compression = b.getInt(30)
    if (hdrSize < 40 || planes != 1 || bpp != 24 || compression != 0) return None
    if (width <= 0 || rawHeight == 0 || off < 54) return None
    val height = math.abs(rawHeight)
    val rowSize = (width * 3 + 3) / 4 * 4
    if (off.toLong + rowSize.toLong * height > payload.length) return None
    var rSum = 0L; var gSum = 0L; var bSum = 0L
    var row = 0 // channel sums are row-order invariant: scan in file order
    while (row < height) {
      var p = off + row * rowSize
      var x = 0
      while (x < width) {
        bSum += payload(p) & 0xff
        gSum += payload(p + 1) & 0xff
        rSum += payload(p + 2) & 0xff
        p += 3; x += 1
      }
      row += 1
    }
    Some((width, height, Array(rSum, gSum, bSum)))
  }

  /** Parse a 24-bit BMP to the full grayscale image in IMAGE coordinates
    * (row-major, y=0 at the top): gray = (r+g+b)/3 truncating. Undoes the
    * file's bottom-up row order (positive height) so hashes are
    * orientation-independent; top-down (negative height) reads straight
    * through. None on non-conformant payloads, like [[decodeBmp]]. */
  def decodeBmpGray(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (payload.length < 54 || payload(0) != 'B' || payload(1) != 'M') return None
    val b = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val off = b.getInt(10)
    val hdrSize = b.getInt(14)
    val width = b.getInt(18)
    val rawHeight = b.getInt(22)
    if (hdrSize < 40 || b.getShort(26) != 1 || b.getShort(28) != 24 ||
      b.getInt(30) != 0) return None
    if (width <= 0 || rawHeight == 0 || off < 54) return None
    val height = math.abs(rawHeight)
    val rowSize = (width * 3 + 3) / 4 * 4
    if (off.toLong + rowSize.toLong * height > payload.length) return None
    val gray = new Array[Int](width * height)
    var row = 0
    while (row < height) {
      val y = if (rawHeight > 0) height - 1 - row else row
      var p = off + row * rowSize
      var x = 0
      while (x < width) {
        gray(y * width + x) = ((payload(p) & 0xff) + (payload(p + 1) & 0xff) +
          (payload(p + 2) & 0xff)) / 3
        p += 3; x += 1
      }
      row += 1
    }
    Some((width, height, gray))
  }

  /** Parse a binary PPM to the full grayscale image (row-major, already
    * top-down in the file). Same conformance rules as [[decodePpm]]. */
  def decodePpmGray(payload: Array[Byte]): Option[(Int, Int, Array[Int])] =
    decodePpmWith(payload) { (w, h, at) =>
      val gray = new Array[Int](w * h)
      var i = 0
      while (i < w * h) {
        gray(i) = (at(3 * i) + at(3 * i + 1) + at(3 * i + 2)) / 3
        i += 1
      }
      gray
    }

  /** Shared PPM header walk: parses P6 dims/maxval, hands the body reader
    * `(w, h, byteAt)` to the continuation. */
  private def decodePpmWith[A](payload: Array[Byte])(
      body: (Int, Int, Int => Int) => A): Option[(Int, Int, A)] = {
    if (payload.length < 9 || payload(0) != 'P' || payload(1) != '6') return None
    var p = 2
    def nextInt(): Option[Int] = {
      while (p < payload.length &&
        (payload(p) == ' ' || payload(p) == '\n' || payload(p) == '\r'
          || payload(p) == '\t' || payload(p) == '#')) {
        if (payload(p) == '#')
          while (p < payload.length && payload(p) != '\n') p += 1
        else p += 1
      }
      var v = 0L; var any = false
      while (p < payload.length && payload(p) >= '0' && payload(p) <= '9') {
        v = v * 10 + (payload(p) - '0'); any = true; p += 1
        if (v > Int.MaxValue) return None
      }
      if (any) Some(v.toInt) else None
    }
    val dims = for (w <- nextInt(); h <- nextInt(); mx <- nextInt()) yield (w, h, mx)
    dims match {
      case Some((w, h, mx)) if w > 0 && h > 0 && mx > 0 && mx <= 255 =>
        p += 1
        if (p.toLong + 3L * w * h > payload.length) None
        else {
          val off = p
          Some((w, h, body(w, h, i => payload(off + i) & 0xff)))
        }
      case _ => None
    }
  }

  /** Perceptual average-hash (aHash) over the REAL decoded pixels: gray
    * values of the fixed top-left `winW`×`winH` window, thresholded
    * against the window's truncating-integer mean, packed row-major into
    * one long (bit y·winW+x) — the image-dedup fingerprint (identical
    * hash ⇒ visually identical content; small Hamming distance ⇒ near-dup,
    * band-joinable exactly like [[Dedup]]'s SimHash path, since the hash
    * is bit-banded the same way).
    *
    * Default window 8×6 = 48 bits keeps the hash in positive BIGINT range
    * (SQL-comparable without sign games). Images smaller than the window
    * are dropped (no partial-window hashes — they would collide
    * structurally). Same partition-preserving `mapPartitions` decode
    * boundary as [[imageStats]] — map-only, no shuffle. */
  case class ImageHash(media_id: Long, width: Int, height: Int,
                       ahash: Long, n_set: Long)

  /** The aHash window math on a row-major gray plane: threshold the
    * top-left `winW`×`winH` window against its truncating-integer mean,
    * pack row-major into (hash, n_set). Shared by the image and video
    * paths so a frame hashes exactly like the equivalent still. */
  private def grayWindowHash(w: Int, gray: Array[Int],
                             winW: Int, winH: Int): (Long, Long) = {
    var sum = 0L
    var y = 0
    while (y < winH) {
      var x = 0
      while (x < winW) { sum += gray(y * w + x); x += 1 }
      y += 1
    }
    val mean = sum / (winW * winH)
    var hash = 0L
    var nSet = 0L
    y = 0
    while (y < winH) {
      var x = 0
      while (x < winW) {
        if (gray(y * w + x) > mean) {
          hash |= 1L << (y * winW + x)
          nSet += 1
        }
        x += 1
      }
      y += 1
    }
    (hash, nSet)
  }

  def aHash(media: Dataset[MediaRecord], winW: Int = 8,
            winH: Int = 6): Dataset[ImageHash] = {
    require(winW * winH <= 62, "hash window must fit a positive long")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        decodeBmpGray(r.payload).orElse(decodePpmGray(r.payload))
          .orElse(decodePngGray(r.payload)).collect {
          case (w, h, gray) if w >= winW && h >= winH =>
            val (hash, nSet) = grayWindowHash(w, gray, winW, winH)
            ImageHash(r.media_id, w, h, hash, nSet)
        }
      }
    }
  }

  /** One pooled output cell: the block mean of the decoded grayscale. */
  case class PooledPixel(media_id: Long, bx: Int, by: Int, g_mean: Long)

  /** REAL downsample: average-pool the decoded grayscale over `bw`×`bh`
    * blocks of the fixed `winW`×`winH` top-left window — the resize step
    * of an image feature pipeline, on actual pixels (the stub-path
    * [[sampleFrames]] keeps the plan-shape contract for formats without
    * a JVM codec). Truncating integer block means; images smaller than
    * the window drop, same contract as [[aHash]]. Map-only. */
  def avgPool(media: Dataset[MediaRecord], winW: Int = 8, winH: Int = 6,
              bw: Int = 2, bh: Int = 2): Dataset[PooledPixel] = {
    require(winW % bw == 0 && winH % bh == 0,
      s"window ${winW}x$winH must tile by ${bw}x$bh blocks")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        decodeBmpGray(r.payload).orElse(decodePpmGray(r.payload))
          .orElse(decodePngGray(r.payload)).toSeq.collect {
          case (w, h, gray) if w >= winW && h >= winH =>
            for {
              by <- 0 until winH / bh
              bx <- 0 until winW / bw
            } yield {
              var s = 0L
              var dy = 0
              while (dy < bh) {
                var dx = 0
                while (dx < bw) {
                  s += gray((by * bh + dy) * w + (bx * bw + dx))
                  dx += 1
                }
                dy += 1
              }
              PooledPixel(r.media_id, bx, by, s / (bw * bh))
            }
        }.flatten
      }
    }
  }

  /** Write a binary PPM (P6, maxval 255). */
  def encodePpm(width: Int, height: Int,
                pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"need positive dims, got $width x $height")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + width * height * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var p = header.length
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        out(p) = r.toByte; out(p + 1) = g.toByte; out(p + 2) = b.toByte
        p += 3; x += 1
      }
      y += 1
    }
    out
  }

  /** Parse a binary PPM (P6, maxval ≤ 255; whitespace + '#' comments per
    * the netpbm spec): (width, height, [rSum, gSum, bSum]). */
  def decodePpm(payload: Array[Byte]): Option[(Int, Int, Array[Long])] = {
    if (payload.length < 9 || payload(0) != 'P' || payload(1) != '6') return None
    var p = 2
    // read 3 whitespace/comment-separated ASCII ints, then ONE whitespace
    def nextInt(): Option[Int] = {
      while (p < payload.length &&
        (payload(p) == ' ' || payload(p) == '\n' || payload(p) == '\r'
          || payload(p) == '\t' || payload(p) == '#')) {
        if (payload(p) == '#') // comment runs to end of line
          while (p < payload.length && payload(p) != '\n') p += 1
        else p += 1
      }
      var v = 0L; var any = false
      while (p < payload.length && payload(p) >= '0' && payload(p) <= '9') {
        v = v * 10 + (payload(p) - '0'); any = true; p += 1
        if (v > Int.MaxValue) return None
      }
      if (any) Some(v.toInt) else None
    }
    val dims = for (w <- nextInt(); h <- nextInt(); mx <- nextInt()) yield (w, h, mx)
    dims match {
      case Some((w, h, mx)) if w > 0 && h > 0 && mx > 0 && mx <= 255 =>
        p += 1 // the single whitespace after maxval
        if (p.toLong + 3L * w * h > payload.length) return None
        var rSum = 0L; var gSum = 0L; var bSum = 0L
        var i = 0
        val n = w * h
        while (i < n) {
          rSum += payload(p) & 0xff
          gSum += payload(p + 1) & 0xff
          bSum += payload(p + 2) & 0xff
          p += 3; i += 1
        }
        Some((w, h, Array(rSum, gSum, bSum)))
      case _ => None
    }
  }

  /** Per-partition REAL decode over a media table: BMP and PPM parse for
    * real (magic-byte dispatch); payloads in neither format are dropped
    * (the stub pipeline [[extractFeatures]] remains the lossy-format
    * path). Same `mapPartitions` shape as the stub pipeline — the codec
    * body changed, the plan did not. */
  def imageStats(media: Dataset[MediaRecord]): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        decodeBmp(r.payload).orElse(decodePpm(r.payload))
          .orElse(decodePng(r.payload)).map {
          case (w, h, sums) =>
            ImageStats(r.media_id, w, h, 3, sums(0), sums(1), sums(2),
              w.toLong * h)
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // PNG (RFC 2083 subset): a REAL pure-JDK codec for non-interlaced
  // 8-bit truecolor images — zlib via java.util.zip (public JDK), real
  // CRC-checked chunks, the FULL five-filter suite (None/Sub/Up/
  // Average/Paeth) on both encode and decode. This is the compressed
  // sibling of the BMP/PPM path: the same magic-byte dispatch, the
  // same Option fallback for non-conformant payloads.
  // ------------------------------------------------------------------

  private val pngMagic: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** The PNG Paeth predictor (RFC 2083 §6.6): closest of left/up/up-left
    * to the linear estimate a+b−c, ties broken left, up, up-left. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Shared encoder core, part 1: filter a `bpp`-byte-per-pixel plane
    * row by row with the `y % 5` filter rotation (the rotation
    * DELIBERATELY emits every filter the spec defines, so round-tripping
    * through [[decodePng]] proves the whole defilter suite, not just the
    * inverse of one encoder habit). `sample(x, y, channel)` supplies the
    * byte at channel `c < bpp`. */
  private def pngFilterPlane(width: Int, height: Int, bpp: Int,
                             sample: (Int, Int, Int) => Int): Array[Byte] = {
    val stride = width * bpp
    val raw = new Array[Byte]((stride + 1) * height)
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride) // zeros above row 0, per spec
    var y = 0; var o = 0
    while (y < height) {
      var i = 0
      while (i < stride) { cur(i) = sample(i / bpp, y, i % bpp) & 0xff; i += 1 }
      val ft = y % 5
      raw(o) = ft.toByte; o += 1
      i = 0
      while (i < stride) {
        val a = if (i >= bpp) cur(i - bpp) else 0
        val b = prev(i)
        val c = if (i >= bpp) prev(i - bpp) else 0
        val v = ft match {
          case 0 => cur(i)
          case 1 => cur(i) - a
          case 2 => cur(i) - b
          case 3 => cur(i) - ((a + b) >> 1)
          case _ => cur(i) - paeth(a, b, c)
        }
        raw(o) = (v & 0xff).toByte; o += 1
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    raw
  }

  /** Shared encoder core, part 2: one length+tag+data+CRC chunk. */
  private def pngChunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(12 + data.length) // big-endian
    out.putInt(data.length).put(tag.getBytes("US-ASCII")).put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(tag.getBytes("US-ASCII")); crc.update(data)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  /** Shared encoder core, part 3: assemble the file — magic, IHDR for
    * `colorType`, any extra chunks (PLTE), one zlib IDAT, IEND. */
  private def pngAssemble(width: Int, height: Int, colorType: Byte,
                          extraChunks: Seq[(String, Array[Byte])],
                          raw: Array[Byte]): Array[Byte] = {
    val defl = new java.util.zip.Deflater()
    val z = new java.io.ByteArrayOutputStream()
    try {
      defl.setInput(raw); defl.finish()
      val buf = new Array[Byte](8192)
      while (!defl.finished()) z.write(buf, 0, defl.deflate(buf))
    } finally defl.end()
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte).put(colorType)
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
      .array()
    pngMagic ++ pngChunk("IHDR", ihdr) ++
      extraChunks.flatMap { case (t, d) => pngChunk(t, d) } ++
      pngChunk("IDAT", z.toByteArray) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** Write a non-interlaced 8-bit truecolor PNG (color type 2).
    * Chunks: IHDR, one IDAT (zlib, default level), IEND. */
  def encodePng(width: Int, height: Int,
                pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"need positive dims, got $width x $height")
    val raw = pngFilterPlane(width, height, 3, (x, y, c) => {
      val (r, g, b) = pixel(x, y)
      if (c == 0) r else if (c == 1) g else b
    })
    pngAssemble(width, height, colorType = 2, Seq.empty, raw)
  }

  private def beInt(p: Array[Byte], off: Int): Int =
    ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
      ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)

  /** Parse a non-interlaced 8-bit truecolor PNG to row-major RGB bytes.
    * Real decoding: chunk walk with CRC verification, ancillary chunks
    * skipped, multiple IDATs concatenated, zlib inflate, and the full
    * five-filter reconstruction. None for anything non-conformant
    * (wrong magic/depth/color type, interlaced, bad CRC, truncated
    * stream) — callers fall back, same contract as [[decodeBmp]]. */
  private def decodePngRgb(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (payload.length < 8 + 25) return None
    var i = 0
    while (i < 8) { if (payload(i) != pngMagic(i)) return None; i += 1 }
    var pos = 8
    var width = 0; var height = 0; var seenIhdr = false
    var colorType = 2
    var bpp = 3 // bytes per pixel: 3 (truecolor) or 1 (grayscale/indexed)
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      if (pos + 12 > payload.length) return None
      val len = beInt(payload, pos)
      if (len < 0 || pos + 12 + len > payload.length) return None
      val tag = new String(payload, pos + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32()
      crc.update(payload, pos + 4, 4 + len)
      if (crc.getValue.toInt != beInt(payload, pos + 8 + len)) return None
      tag match {
        case "IHDR" =>
          if (len != 13 || seenIhdr) return None
          width = beInt(payload, pos + 8); height = beInt(payload, pos + 12)
          val bitDepth = payload(pos + 16); colorType = payload(pos + 17)
          val compression = payload(pos + 18); val filterMethod = payload(pos + 19)
          val interlace = payload(pos + 20)
          if (bitDepth != 8 ||
            (colorType != 2 && colorType != 0 && colorType != 3) ||
            compression != 0 || filterMethod != 0 || interlace != 0) return None
          bpp = if (colorType == 2) 3 else 1
          if (width <= 0 || height <= 0) return None
        case "PLTE" =>
          // indexed-color lookup table: 1..256 RGB triples, before IDAT
          if (!seenIhdr || palette != null || idat.size() > 0) return None
          if (len == 0 || len % 3 != 0 || len > 768) return None
          palette = java.util.Arrays.copyOfRange(payload, pos + 8, pos + 8 + len)
        case "IDAT" => if (!seenIhdr) return None else idat.write(payload, pos + 8, len)
        case "IEND" => done = true
        case _ => // ancillary chunk: skip
      }
      if (tag == "IHDR") seenIhdr = true
      pos += 12 + len
    }
    if (!seenIhdr) return None
    if (colorType == 3 && palette == null) return None // PLTE is mandatory
    // LONG stride math first: width * bpp wraps Int for a conformant
    // truecolor IHDR with width > 715 M, and a wrapped-negative stride
    // would slip past the size guard and crash the allocation instead of
    // taking the documented None fallback
    val strideL = width.toLong * bpp
    // Division form: the product (strideL + 1) * height itself overflows
    // Long when width and height are both near 2^31 (≈1.4e19 > 2^63-1),
    // wrapping negative and slipping past a multiplication-based guard.
    // height ≥ 1 is guaranteed above, so the division is safe; the
    // (strideL + 1) bound subsumes the strideL * height one.
    if (strideL + 1 > (Int.MaxValue - 8).toLong / height) return None
    val stride = strideL.toInt
    val rawLen = (stride + 1).toLong * height
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        got += n
      }
      if (got < raw.length) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    val out = new Array[Int](stride * height)
    var y = 0
    while (y < height) {
      val ft = raw(y * (stride + 1)) & 0xff
      if (ft > 4) return None
      var k = 0
      while (k < stride) {
        val v = raw(y * (stride + 1) + 1 + k) & 0xff
        val a = if (k >= bpp) out(y * stride + k - bpp) else 0
        val b = if (y > 0) out((y - 1) * stride + k) else 0
        val c = if (y > 0 && k >= bpp) out((y - 1) * stride + k - bpp) else 0
        val rec = ft match {
          case 0 => v
          case 1 => v + a
          case 2 => v + b
          case 3 => v + ((a + b) >> 1)
          case _ => v + paeth(a, b, c)
        }
        out(y * stride + k) = rec & 0xff
        k += 1
      }
      y += 1
    }
    if (bpp == 3) Some((width, height, out))
    else {
      // the rawLen guard above only bounds (width+1)*height (bpp=1), so a
      // conformant huge grayscale/indexed PNG can still overflow the ×3
      // expansion — decline it like any other unrepresentable payload
      if (width.toLong * height * 3 > Int.MaxValue - 8) return None
      val rgb = new Array[Int](width * height * 3)
      if (colorType == 3) { // indexed: defiltered bytes are PLTE indices
        val nEntries = palette.length / 3
        var i2 = 0
        while (i2 < width * height) {
          val idx = out(i2)
          if (idx >= nEntries) return None // out-of-palette index: invalid
          rgb(3 * i2) = palette(3 * idx) & 0xff
          rgb(3 * i2 + 1) = palette(3 * idx + 1) & 0xff
          rgb(3 * i2 + 2) = palette(3 * idx + 2) & 0xff
          i2 += 1
        }
      } else { // grayscale surfaces through the RGB interface by replication
        var i2 = 0
        while (i2 < width * height) {
          rgb(3 * i2) = out(i2); rgb(3 * i2 + 1) = out(i2); rgb(3 * i2 + 2) = out(i2)
          i2 += 1
        }
      }
      Some((width, height, rgb))
    }
  }

  /** Write a non-interlaced 8-bit GRAYSCALE PNG (color type 0,
    * 1 byte/pixel) — the bpp=1 sibling of [[encodePng]], same per-row
    * filter rotation so round-trips prove the defilter suite at the
    * other byte width too. `pixel(x, y)` returns the gray value mod 256. */
  def encodePngGray(width: Int, height: Int,
                    pixel: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"need positive dims, got $width x $height")
    pngAssemble(width, height, colorType = 0, Seq.empty,
      pngFilterPlane(width, height, 1, (x, y, _) => pixel(x, y)))
  }

  /** Write a non-interlaced 8-bit INDEXED-COLOR PNG (color type 3 — the
    * most common web PNG flavor): a PLTE chunk of `nEntries` RGB triples
    * from `palColor(e)`, one index byte per pixel from `index(x, y)`,
    * same per-row filter rotation as the other encoders so round trips
    * prove the defilter suite over index bytes too. */
  def encodePngPalette(width: Int, height: Int, nEntries: Int,
                       palColor: Int => (Int, Int, Int),
                       index: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"need positive dims, got $width x $height")
    require(nEntries >= 1 && nEntries <= 256, s"PLTE takes 1..256 entries, got $nEntries")
    val plte = new Array[Byte](nEntries * 3)
    var e = 0
    while (e < nEntries) {
      val (r, g, b) = palColor(e)
      plte(3 * e) = (r & 0xff).toByte
      plte(3 * e + 1) = (g & 0xff).toByte
      plte(3 * e + 2) = (b & 0xff).toByte
      e += 1
    }
    val raw = pngFilterPlane(width, height, 1, (x, y, _) => {
      val i = index(x, y)
      require(i >= 0 && i < nEntries, s"index $i outside palette of $nEntries")
      i
    })
    pngAssemble(width, height, colorType = 3, Seq("PLTE" -> plte), raw)
  }

  /** Parse a PNG: (width, height, [rSum, gSum, bSum]) — the decodeBmp
    * shape, so the stats pipeline treats PNG/BMP/PPM uniformly. */
  def decodePng(payload: Array[Byte]): Option[(Int, Int, Array[Long])] =
    decodePngRgb(payload).map { case (w, h, px) =>
      var rSum = 0L; var gSum = 0L; var bSum = 0L
      var i = 0
      while (i < w * h) {
        rSum += px(3 * i); gSum += px(3 * i + 1); bSum += px(3 * i + 2)
        i += 1
      }
      (w, h, Array(rSum, gSum, bSum))
    }

  /** Parse a PNG to grayscale (row-major, top-down like the file):
    * gray = (r+g+b)/3 truncating — the decodeBmpGray shape for aHash
    * / pooling parity across formats. */
  def decodePngGray(payload: Array[Byte]): Option[(Int, Int, Array[Int])] =
    decodePngRgb(payload).map { case (w, h, px) =>
      val gray = new Array[Int](w * h)
      var i = 0
      while (i < w * h) {
        gray(i) = (px(3 * i) + px(3 * i + 1) + px(3 * i + 2)) / 3
        i += 1
      }
      (w, h, gray)
    }

  // ------------------------------------------------------------------
  // VIDEO: a REAL pure-JVM Y4M (YUV4MPEG2) codec — the uncompressed
  // video container (plain-text header + FRAME-delimited raw planes;
  // what ffmpeg/mjpegtools pipe between stages), here in its Cmono
  // flavor (one 8-bit Y plane per frame). Same contract as the image
  // and WAV paths: an uncompressed real container parses for real over
  // real bytes; compressed video (H.264/VP9/AV1) would take the
  // decodeStub fallback until a codec library is linked. On top of the
  // codec sit the two ops a training-data video pipeline needs first:
  // FRAME SAMPLING (every k-th frame → the image feature path — each
  // sampled frame aHashes exactly like the equivalent still, so video
  // frames join the same banded-Hamming dedup index as images) and
  // SHOT-BOUNDARY detection (consecutive-frame hash distance).
  // ------------------------------------------------------------------

  /** Write a YUV4MPEG2 Cmono stream: `nFrames` frames of
    * `pixel(frame)(x, y)` gray values (mod 256). Spec-shaped header
    * (`YUV4MPEG2 W.. H.. F25:1 Ip A1:1 Cmono`) and a `FRAME` marker per
    * frame — readable by any y4m consumer. */
  def encodeY4m(width: Int, height: Int, nFrames: Int,
                pixel: Int => (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0,
      s"need positive dims/frames, got $width x $height x $nFrames")
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$width H$height F25:1 Ip A1:1 Cmono\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    var f = 0
    while (f < nFrames) {
      out.write("FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      val px = pixel(f)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { out.write(px(x, y) & 0xff); x += 1 }
        y += 1
      }
      f += 1
    }
    out.toByteArray
  }

  /** Parse a YUV4MPEG2 Cmono stream, keeping every `every`-th frame
    * (frame 0 always kept): (width, height, n_frames_total,
    * sampled (frame_idx, gray plane)). None for anything non-conformant
    * (wrong magic, missing W/H, a colorspace other than mono, truncated
    * frame data) — same fall-back contract as the image codecs. FRAME
    * markers may carry parameters (spec-legal); they are skipped. */
  def decodeY4mFrames(payload: Array[Byte], every: Int = 1)
      : Option[(Int, Int, Int, Seq[(Int, Array[Int])])] = {
    if (every < 1) return None
    val magic = "YUV4MPEG2".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    if (payload.length < magic.length) return None
    var i = 0
    while (i < magic.length) { if (payload(i) != magic(i)) return None; i += 1 }
    var nl = i
    while (nl < payload.length && payload(nl) != '\n') nl += 1
    if (nl >= payload.length) return None
    val header = new String(payload, 0, nl,
      java.nio.charset.StandardCharsets.US_ASCII)
    var width = -1; var height = -1; var mono = false
    header.split(' ').drop(1).foreach { tok =>
      if (tok.nonEmpty) tok.charAt(0) match {
        case 'W' => width = tok.drop(1).toIntOption.getOrElse(-1)
        case 'H' => height = tok.drop(1).toIntOption.getOrElse(-1)
        case 'C' => mono = tok.drop(1) == "mono"
        case _ => // frame rate / interlace / aspect: irrelevant to pixels
      }
    }
    if (width <= 0 || height <= 0 || !mono) return None
    if (width.toLong * height > Int.MaxValue - 8) return None
    val frameLen = width * height
    val frameTag = "FRAME".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    var pos = nl + 1
    var idx = 0
    val sampled = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Int])]
    while (pos < payload.length) {
      var j = 0
      while (j < frameTag.length) {
        if (pos + j >= payload.length || payload(pos + j) != frameTag(j)) return None
        j += 1
      }
      pos += frameTag.length
      while (pos < payload.length && payload(pos) != '\n') pos += 1 // params
      if (pos >= payload.length) return None
      pos += 1
      // LONG compare: pos + frameLen can wrap Int for multi-GB payloads,
      // letting a truncated final plane through to an out-of-bounds read
      if (pos.toLong + frameLen > payload.length) return None // truncated plane
      if (idx % every == 0) {
        val gray = new Array[Int](frameLen)
        var k = 0
        while (k < frameLen) { gray(k) = payload(pos + k) & 0xff; k += 1 }
        sampled += ((idx, gray))
      }
      pos += frameLen
      idx += 1
    }
    if (idx == 0) None else Some((width, height, idx, sampled.toSeq))
  }

  /** One sampled video frame's perceptual hash: the SAME windowed aHash
    * as the still-image path ([[aHash]]), so frames and stills share one
    * dedup index. */
  case class VideoFrameHash(media_id: Long, n_frames: Int, frame_idx: Int,
                            ahash: Long, n_set: Long)

  /** Frame-sample + fingerprint: decode the y4m payload, keep every
    * `every`-th frame, aHash each kept frame. Map-only (the codec runs
    * inside `mapPartitions`, no shuffle); frames smaller than the hash
    * window drop, same contract as [[aHash]]. Shot-boundary detection
    * is a lag over this output partitioned by media_id — a
    * corpus-cardinality key, so the window is balanced at any scale. */
  def videoFrameHashes(media: Dataset[MediaRecord], every: Int = 1,
                       winW: Int = 8, winH: Int = 6): Dataset[VideoFrameHash] = {
    require(winW * winH <= 62, "hash window must fit a positive long")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        decodeY4mFrames(r.payload, every).toSeq.flatMap {
          case (w, h, nFrames, frames) if w >= winW && h >= winH =>
            frames.map { case (idx, gray) =>
              val (hash, nSet) = grayWindowHash(w, gray, winW, winH)
              VideoFrameHash(r.media_id, nFrames, idx, hash, nSet)
            }
          case _ => Seq.empty
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // AUDIO: a REAL pure-JVM WAV (RIFF / 16-bit mono PCM) codec — same
  // contract as the image path: uncompressed container formats parse
  // for real over real bytes; compressed audio (MP3/AAC/Opus) would
  // take the decodeStub fallback until a codec library is linked. The
  // feature set is the standard audio-pipeline battery: per-record
  // stats (duration, peak, RMS, zero-crossings), fixed-width frame
  // energies (the spectrogram-less analogue of STFT frames), and an
  // energy-delta fingerprint (Haitsma–Kalker style sign-of-derivative
  // bits) that feeds the SAME banded-Hamming near-dup machinery as
  // SimHash / image aHash. All integer arithmetic — engine- and
  // order-invariant, so every query is value-exact against a DuckDB
  // replay of the generator algebra.
  // ------------------------------------------------------------------

  /** Decoded audio statistics: all exact integers. `rms` is the floor
    * square root of the mean squared sample (integer mean first). */
  case class AudioStats(media_id: Long, sample_rate: Int, n_samples: Long,
                        duration_ms: Long, peak: Int, rms: Long,
                        zero_crossings: Long)

  /** One fixed-width analysis frame: `energy` = Σ s² over the frame
    * (exact Long), `zcr` = sign changes between consecutive samples
    * WITHIN the frame (frame-local, so frames are independent). */
  case class AudioFrame(media_id: Long, frame_id: Int, n: Int,
                        energy: Long, zcr: Int)

  /** Write a canonical 16-bit mono PCM WAV: RIFF header, `fmt ` chunk,
    * `data` chunk, little-endian samples. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, s"need positive sample rate, got $sampleRate")
    val dataSize = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                   // PCM
      .putShort(1)                   // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)        // byte rate
      .putShort(2)                   // block align
      .putShort(16)                  // bits per sample
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < samples.length) { b.putShort(samples(i)); i += 1 }
    b.array()
  }

  /** Parse a WAV container: (sampleRate, samples) for 16-bit mono PCM,
    * None for anything else (wrong magic, compressed, multi-channel,
    * truncated). Walks the chunk list — `fmt ` and `data` may appear in
    * any order with unknown chunks (LIST, fact, ...) between them, and
    * odd-sized chunks carry a pad byte, both per the RIFF spec. */
  def decodeWavPcm16(payload: Array[Byte]): Option[(Int, Array[Short])] = {
    if (payload.length < 44) return None
    val b = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String =
      new String(payload, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var rate = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= payload.length && (rate < 0 || dataOff < 0)) {
      val id = tag(off)
      val size = b.getInt(off + 4)
      if (size < 0 || off + 8 + size.toLong > payload.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val fmt = b.getShort(off + 8)
          val channels = b.getShort(off + 10)
          val bits = b.getShort(off + 22)
          if (fmt != 1 || channels != 1 || bits != 16) return None
          rate = b.getInt(off + 12)
          if (rate <= 0) return None
        case "data" =>
          dataOff = off + 8; dataLen = size
        case _ => // skip unknown chunk
      }
      off += 8 + size + (size & 1) // odd chunks are padded to even
    }
    if (rate < 0 || dataOff < 0) return None
    val n = dataLen / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = b.getShort(dataOff + i * 2); i += 1 }
    Some((rate, out))
  }

  /** Exact integer floor square root (no float round-trip on the hot
    * path — the value must equal the oracle's for every input). */
  private[llm] def floorSqrt(x: Long): Long = {
    require(x >= 0, s"floorSqrt of negative $x")
    if (x == 0) return 0L
    var r = math.sqrt(x.toDouble).toLong + 1
    while (r * r > x) r -= 1
    r
  }

  /** Per-partition REAL decode → audio statistics. Map-only: the decode
    * and the per-record reduction happen inside one task; nothing
    * shuffles until the caller aggregates. Non-WAV payloads drop. */
  def audioStats(media: Dataset[MediaRecord]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        decodeWavPcm16(r.payload).map { case (rate, s) =>
          var peak = 0; var sumSq = 0L; var zc = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i).toInt
            val a = math.abs(v)
            if (a > peak) peak = a
            sumSq += v.toLong * v
            if (i > 0 && (s(i - 1) < 0) != (v < 0)) zc += 1
            i += 1
          }
          val rms = if (s.length == 0) 0L else floorSqrt(sumSq / s.length)
          AudioStats(r.media_id, rate, s.length,
            s.length.toLong * 1000 / rate, peak, rms, zc)
        }
      }
    }
  }

  /** Fixed-width frame energies + frame-local zero-crossing counts. The
    * tail frame may be short (`n` < `frameLen`); zcr pairs never span a
    * frame boundary, so the frames of one record are independent and
    * the whole operator stays map-only (one output row per frame,
    * emitted from the decode task). */
  def audioFrames(media: Dataset[MediaRecord],
                  frameLen: Int = 160): Dataset[AudioFrame] = {
    require(frameLen > 0, s"need positive frame length, got $frameLen")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        decodeWavPcm16(r.payload).toSeq.flatMap { case (_, s) =>
          val nFrames = (s.length + frameLen - 1) / frameLen
          (0 until nFrames).map { f =>
            val lo = f * frameLen
            val hi = math.min(s.length, lo + frameLen)
            var e = 0L; var zc = 0
            var i = lo
            while (i < hi) {
              val v = s(i).toInt
              e += v.toLong * v
              if (i > lo && (s(i - 1) < 0) != (v < 0)) zc += 1
              i += 1
            }
            AudioFrame(r.media_id, f, hi - lo, e, zc)
          }
        }
      }
    }
  }

  /** Energy-delta fingerprint (Haitsma–Kalker sign-of-derivative, time
    * domain): bit f of `fp` is 1 iff energy(frame f+1) > energy(frame
    * f), for the first `bits` deltas. Identical audio → identical fp;
    * small edits flip few bits, so [[graft.llm.Dedup.sigBandPairs]]
    * applies unchanged. Input is [[audioFrames]] output. ONE exchange:
    * the adjacent-frame pairing is a lead() window PARTITIONED BY
    * media_id (high-cardinality key — never a one-task window), and the
    * bit packing rides the same partitioning as a partial aggregate. */
  def audioFingerprint(frames: Dataset[AudioFrame], bits: Int = 48): DataFrame = {
    require(bits > 0 && bits <= 63, s"fp bits must be in 1..63, got $bits")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("media_id").orderBy("frame_id")
    frames.toDF()
      .withColumn("energy_next", lead(col("energy"), 1).over(w))
      .filter(col("frame_id") < bits && col("energy_next").isNotNull)
      .groupBy(col("media_id"))
      .agg(sum(when(col("energy_next") > col("energy"),
        expr("shiftleft(1L, cast(frame_id as int))"))
        .otherwise(0L)).as("fp"))
  }
}
