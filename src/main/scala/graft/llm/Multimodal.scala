package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media as opaque `binary` columns with typed
  * metadata, plus the decode/feature-extract plumbing.
  *
  * The Spark-side design is real — schema, partition-preserving
  * `mapPartitions`, batch-shaped processing — while the codec itself is a
  * STUB: this container has no image/audio libraries, so `decodeStub`
  * produces a deterministic fake feature vector. Swapping in a real decoder
  * changes only the function body, not the plan shape.
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
}
