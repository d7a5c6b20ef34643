package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side shape is real and tested — schema, partitioning, batched
  * per-partition processing (the Scala analog of `mapInPandas` batch
  * processing: `mapPartitions` over fixed-size groups so a codec would
  * amortize setup per batch, not per row). The codec itself is a clearly
  * marked STUB (no image/audio libraries in this container): a
  * deterministic fake decode over the bytes, so every stage is
  * reproducible and testable end-to-end.
  */
object Multimodal {

  /** Typed media row: binary payload + metadata, the storage schema for
    * multimodal corpora (content stays opaque; metadata is columnar and
    * prunable so metadata-only queries never touch the bytes).
    */
  case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      content: Array[Byte],
      width: Int,
      height: Int,
      n_frames: Int)

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      byte_mean: Double,
      first_byte: Int,
      last_byte: Int)

  case class Frame(media_id: Long, frame_no: Int, offset: Long, frame_bytes: Array[Byte])

  /** Build a media table from `documents` (UTF-8 bytes stand in for encoded
    * media; deterministic metadata derived from the payload).
    */
  def fromDocuments(documents: DataFrame): Dataset[MediaRow] = {
    import documents.sparkSession.implicits._
    documents
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("content"),
        (col("n_chars") % 64 + 16).cast("int").as("width"),
        (col("n_chars") % 48 + 16).cast("int").as("height"),
        (col("n_chars") % 10 + 1).cast("int").as("n_frames"))
      .as[MediaRow]
  }

  /** Batched feature extraction over the binary payload.
    *
    * The image path is a REAL decoder: `javax.imageio` ships with the JDK
    * (PNG/JPEG/BMP/GIF, no external libraries), decoding to one gray byte
    * per pixel, so features for genuine image bytes are pixel statistics.
    * Payloads ImageIO can't parse (the synthetic corpus's UTF-8 stand-ins)
    * and non-image kinds fall back to the deterministic byte-level STUB,
    * keeping every stage reproducible end-to-end. Audio/video codecs are
    * not in the JDK — those kinds stay stubbed; the batch iteration,
    * schema, and partition shape around them are the production form.
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // codec setup would happen once per batch here
        batch.map { m =>
          val d = decode(m.kind, m.content)
          MediaFeatures(m.media_id, m.kind, d.length.toLong,
            if (d.isEmpty) 0.0 else d.map(b => (b & 0xff).toLong).sum.toDouble / d.length,
            if (d.isEmpty) -1 else d.head & 0xff,
            if (d.isEmpty) -1 else d.last & 0xff)
        }
      }
    }
  }

  private def decode(kind: String, content: Array[Byte]): Array[Byte] =
    if (kind == "image") imageToGray(content).getOrElse(content) else content

  /** JDK-only image decode: one gray byte per pixel in row-major order;
    * None when the bytes aren't a parseable image.
    */
  private[pipeline] def imageToGray(content: Array[Byte]): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      if (img == null) None
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val out = new Array[Byte](w * h)
        var i = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            out(i) = ((((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3).toByte
            i += 1; x += 1
          }
          y += 1
        }
        Some(out)
      }
    } catch { case _: Exception => None }

  /** Frame sampling: every `stride`-th frame of a video payload as its own
    * row (byte ranges sliced deterministically from the payload — the STUB
    * stand-in for container demuxing).
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 2): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val frameLen = math.max(1, m.content.length / math.max(1, m.n_frames))
      (0 until m.n_frames by stride).map { f =>
        val off = f.toLong * frameLen
        Frame(m.media_id, f, off,
          m.content.slice(off.toInt, math.min(off.toInt + frameLen, m.content.length)))
      }
    }
  }

  /** Resize: metadata-only transform (a real impl would also transform the
    * payload through the codec) — demonstrates metadata pruning: no byte
    * column is touched, Parquet never reads `content`.
    */
  def resizeMeta(media: Dataset[MediaRow], maxDim: Int): DataFrame =
    media.toDF()
      .select(col("media_id"), col("kind"),
        least(col("width"), lit(maxDim)).as("width"),
        least(col("height"), lit(maxDim)).as("height"))
}
