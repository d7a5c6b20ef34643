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

  private def decode(kind: String, content: Array[Byte]): Array[Byte] = kind match {
    case "image" => imageToGray(content).getOrElse(content)
    case "audio" => audioToSamples(content).getOrElse(content)
    case _ => content
  }

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

  /** JDK-only audio decode (`javax.sound.sampled`, WAV/AU/AIFF PCM): one
    * unsigned byte per frame — channel 0's most-significant sample byte,
    * sign-offset to 0..255 for signed encodings — so features for genuine
    * audio bytes are sample statistics, exactly parallel to
    * [[imageToGray]]'s gray-per-pixel. None when the bytes aren't a
    * parseable audio stream (the synthetic corpus's UTF-8 stand-ins).
    */
  private[pipeline] def audioToSamples(content: Array[Byte]): Option[Array[Byte]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        if (!signed && enc != javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED) None
        else {
          val raw = in.readAllBytes()
          val frameSize = fmt.getFrameSize // bytes per frame, all channels
          val sampleBytes = (fmt.getSampleSizeInBits + 7) / 8
          if (frameSize <= 0 || sampleBytes <= 0) None
          else {
            val n = raw.length / frameSize
            val msbOff = if (fmt.isBigEndian) 0 else sampleBytes - 1
            val out = new Array[Byte](n)
            var i = 0
            while (i < n) {
              val b = raw(i * frameSize + msbOff) & 0xff
              out(i) = (if (signed) b ^ 0x80 else b).toByte
              i += 1
            }
            Some(out)
          }
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** DuckDB oracle for the `media_features` query over the synthetic
    * corpus, where every payload takes the deterministic byte-stats path
    * (UTF-8 text never carries a PNG/RIFF magic header, so both real
    * decoders return None — asserted by the oracle itself matching): the
    * blob's bytes are recovered from its hex form, two chars per byte.
    */
  val mediaFeaturesSql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |              ELSE 'video' END AS kind,
      |         lower(hex(encode(text))) AS h,
      |         octet_length(encode(text)) AS n
      |  FROM documents
      |), bytes AS (
      |  SELECT media_id,
      |         CAST(sum((strpos('0123456789abcdef', substr(h, 2*i - 1, 1)) - 1) * 16
      |                + (strpos('0123456789abcdef', substr(h, 2*i, 1)) - 1)) AS BIGINT) AS s
      |  FROM m, unnest(generate_series(1, CAST(n AS INTEGER))) AS u(i)
      |  GROUP BY media_id
      |)
      |SELECT m.media_id, m.kind, CAST(m.n AS BIGINT) AS n_bytes,
      |       CASE WHEN m.n = 0 THEN 0.0
      |            ELSE CAST(b.s AS DOUBLE) / m.n END AS byte_mean,
      |       CAST(CASE WHEN m.n = 0 THEN -1
      |            ELSE (strpos('0123456789abcdef', substr(m.h, 1, 1)) - 1) * 16
      |               + (strpos('0123456789abcdef', substr(m.h, 2, 1)) - 1)
      |            END AS INTEGER) AS first_byte,
      |       CAST(CASE WHEN m.n = 0 THEN -1
      |            ELSE (strpos('0123456789abcdef', substr(m.h, 2*m.n - 1, 1)) - 1) * 16
      |               + (strpos('0123456789abcdef', substr(m.h, 2*m.n, 1)) - 1)
      |            END AS INTEGER) AS last_byte
      |FROM m LEFT JOIN bytes b ON m.media_id = b.media_id
      |ORDER BY m.media_id""".stripMargin

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
