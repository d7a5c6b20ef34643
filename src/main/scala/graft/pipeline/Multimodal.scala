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
  * amortize setup per batch, not per row). The codecs are the JDK's own:
  * ImageIO for still images (PNG/JPEG/BMP/GIF), javax.sound for PCM audio
  * (WAV/AU/AIFF), and ImageIO's sequence reader for multi-frame video
  * (animated GIF — the one video container the JDK decodes). Payloads no
  * JDK codec parses (other containers, and the synthetic corpus's UTF-8
  * stand-ins) take a deterministic byte-level fallback, so every stage
  * stays reproducible and testable end-to-end.
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

  /** Payload-derived fields are Options: a 100 TB multimodal corpus WILL
    * carry rows whose payload is missing entirely (upstream fetch/decode
    * failure → NULL blob column), and the contract is NULL features for
    * them — never a crashed job (primitive fields raise
    * NOT_NULL_ASSERT_VIOLATION the moment a NULL payload row is decoded;
    * observed on the adversarial SF's NULL-text documents).
    */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Option[Long],
      byte_mean: Option[Double],
      first_byte: Option[Int],
      last_byte: Option[Int])

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
        // metadata must stay total on malformed rows: NULL n_chars falls
        // back to the payload's own char length, a payload-less row to 0
        // (width/height/n_frames are non-nullable ints in the typed row)
        (coalesce(col("n_chars"), length(col("text")).cast("long"), lit(0L))
          % 64 + 16).cast("int").as("width"),
        (coalesce(col("n_chars"), length(col("text")).cast("long"), lit(0L))
          % 48 + 16).cast("int").as("height"),
        (coalesce(col("n_chars"), length(col("text")).cast("long"), lit(0L))
          % 10 + 1).cast("int").as("n_frames"))
      .as[MediaRow]
  }

  /** Batched feature extraction over the binary payload.
    *
    * The image path is a REAL decoder: `javax.imageio` ships with the JDK
    * (PNG/JPEG/BMP/GIF, no external libraries), decoding to one gray byte
    * per pixel, so features for genuine image bytes are pixel statistics.
    * The audio path decodes PCM WAV/AU/AIFF via `javax.sound.sampled`, and
    * the video path decodes multi-frame animated GIF via ImageIO's
    * sequence reader (frames concatenated, one gray byte per pixel).
    * Payloads no JDK codec parses (other containers, and the synthetic
    * corpus's UTF-8 stand-ins) take the deterministic byte-level fallback,
    * keeping every stage reproducible end-to-end.
    */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // ImageIO defaults to a DISK-backed stream cache: every read()
      // attempt creates (and deletes) a temp file. The in-memory cache is
      // decode-equivalent and removes one file-system round-trip per
      // image/video row — measured on the ×100 media_features pass.
      javax.imageio.ImageIO.setUseCache(false)
      rows.grouped(batchSize).flatMap { batch =>
        // codec setup would happen once per batch here
        batch.map { m =>
          if (m.content == null) // missing payload → NULL features (oracle: encode(NULL) chain)
            MediaFeatures(m.media_id, m.kind, None, None, None, None)
          else {
            val d = decode(m.kind, m.content)
            var sum = 0L
            var i = 0
            while (i < d.length) { sum += d(i) & 0xff; i += 1 } // no boxing
            MediaFeatures(m.media_id, m.kind, Some(d.length.toLong),
              Some(if (d.isEmpty) 0.0 else sum.toDouble / d.length),
              Some(if (d.isEmpty) -1 else d.head & 0xff),
              Some(if (d.isEmpty) -1 else d.last & 0xff))
          }
        }
      }
    }
  }

  private def decode(kind: String, content: Array[Byte]): Array[Byte] = kind match {
    case "image" => imageToGray(content).getOrElse(content)
    case "audio" => audioToSamples(content).getOrElse(content)
    case "video" => videoToGrayFrames(content)
      .map(fs => Array.concat(fs: _*)).getOrElse(content)
    case _ => content
  }

  /** One gray byte per pixel in row-major order. */
  private def grayOf(img: java.awt.image.BufferedImage): Array[Byte] = {
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
    out
  }

  /** JDK-only image decode: one gray byte per pixel in row-major order;
    * None when the bytes aren't a parseable image.
    */
  private[pipeline] def imageToGray(content: Array[Byte]): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      if (img == null) None else Some(grayOf(img))
    } catch { case _: Exception => None }

  /** JDK-only video decode: every frame of a multi-frame image stream
    * (animated GIF — the one video container ImageIO demuxes) as gray
    * bytes, in presentation order. None when the bytes aren't a parseable
    * multi-frame stream, so single still images keep their `image` path
    * and unparseable payloads fall back deterministically.
    */
  private[pipeline] def videoToGrayFrames(content: Array[Byte]): Option[Seq[Array[Byte]]] =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            // seekForwardOnly=false so getNumImages(true) may scan the stream
            reader.setInput(iis, false, true)
            val n = reader.getNumImages(true)
            if (n < 2) None // one frame is a still, not a video stream
            else Some((0 until n).map(i => grayOf(reader.read(i))))
          } finally reader.dispose()
        }
      } finally iis.close()
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

  /** [[extractFeatures]] over one representative per distinct
    * (payload, kind) pair, expanded back through the member map — the
    * [[graft.pipeline.Dedup.canonicalTexts]] pattern applied to media
    * decode. Features are pure functions of (kind, content); kind is
    * `media_id % 3` here, so the canonical key is (text group, id mod 3)
    * and every member of a group shares its rep's decode bit for bit. On
    * a duplicate-dense corpus the decoder (the expensive stage — ImageIO
    * probe + byte fold per payload) runs once per distinct payload-kind
    * instead of once per copy.
    */
  def extractFeaturesCanonical(documents: DataFrame): DataFrame = {
    val keyed = documents.select(col("doc_id"),
        graft.C.textGid(col("text")).as("gid"), (col("doc_id") % 3).as("k3"))
      .localCheckpoint(eager = true) // groups + members read it
    val grpK = keyed.groupBy(col("gid"), col("k3"))
      .agg(min(col("doc_id")).as("rep_id"))
      .localCheckpoint(eager = true)
    val membersK = keyed.join(grpK, Seq("gid", "k3"))
      .select(col("rep_id"), col("doc_id"))
    val reps = documents
      .join(grpK.select(col("rep_id")), documents("doc_id") === col("rep_id"))
      .select(documents("doc_id"), col("text"), col("n_chars"))
    val repFeat = extractFeatures(fromDocuments(reps)).toDF()
      .withColumnRenamed("media_id", "rep_id")
    membersK.join(repFeat, Seq("rep_id"))
      .select(col("doc_id").as("media_id"), col("kind"), col("n_bytes"),
        col("byte_mean"), col("first_byte"), col("last_byte"))
      .orderBy(col("media_id"))
  }

  /** DuckDB oracle for the `media_features` query over the synthetic
    * corpus, where every payload takes the deterministic byte-stats path
    * (UTF-8 text never carries a PNG/RIFF/GIF magic header, so all three
    * real decoders return None — asserted by the oracle itself matching):
    * the blob's bytes are recovered from its hex form, two chars per byte.
    */
  val mediaFeaturesSql: String =
    s"""WITH mk AS MATERIALIZED (
      |  SELECT doc_id, ${graft.C.textGidSql("text")} AS gid, doc_id % 3 AS k3
      |  FROM documents
      |), mg AS MATERIALIZED (
      |  SELECT gid, k3, min(doc_id) AS rep_id FROM mk GROUP BY gid, k3
      |), m AS (
      |  SELECT g.rep_id AS media_id,
      |         CASE d.doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |              ELSE 'video' END AS kind,
      |         lower(hex(encode(d.text))) AS h,
      |         octet_length(encode(d.text)) AS n
      |  FROM documents d JOIN mg g ON d.doc_id = g.rep_id
      |), bytes AS (
      |  SELECT media_id,
      |         CAST(sum((strpos('0123456789abcdef', substr(h, 2*i - 1, 1)) - 1) * 16
      |                + (strpos('0123456789abcdef', substr(h, 2*i, 1)) - 1)) AS BIGINT) AS s
      |  FROM m, unnest(generate_series(1, CAST(n AS INTEGER))) AS u(i)
      |  GROUP BY media_id
      |), rfeat AS MATERIALIZED (
      |  SELECT m.media_id AS rep_id, m.kind, CAST(m.n AS BIGINT) AS n_bytes,
      |         CASE WHEN m.n = 0 THEN 0.0
      |              ELSE CAST(b.s AS DOUBLE) / m.n END AS byte_mean,
      |         CAST(CASE WHEN m.n = 0 THEN -1
      |              ELSE (strpos('0123456789abcdef', substr(m.h, 1, 1)) - 1) * 16
      |                 + (strpos('0123456789abcdef', substr(m.h, 2, 1)) - 1)
      |              END AS INTEGER) AS first_byte,
      |         CAST(CASE WHEN m.n = 0 THEN -1
      |              ELSE (strpos('0123456789abcdef', substr(m.h, 2*m.n - 1, 1)) - 1) * 16
      |                 + (strpos('0123456789abcdef', substr(m.h, 2*m.n, 1)) - 1)
      |              END AS INTEGER) AS last_byte
      |  FROM m LEFT JOIN bytes b ON m.media_id = b.media_id
      |)
      |SELECT k.doc_id AS media_id, f.kind, f.n_bytes, f.byte_mean,
      |       f.first_byte, f.last_byte
      |FROM mk k JOIN mg g USING (gid, k3) JOIN rfeat f ON f.rep_id = g.rep_id
      |ORDER BY media_id""".stripMargin

  /** Frame sampling: every `stride`-th frame of a video payload as its own
    * row. Payloads the JDK demuxes (animated GIF) yield REAL decoded
    * frames — gray pixel bytes per frame, offset = pixel offset in the
    * decoded stream; anything else falls back to deterministic byte-range
    * slicing by the metadata frame count, so the stage is total and
    * reproducible over mixed corpora.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 2): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(m => m.kind == "video" && m.content != null).flatMap { m =>
      videoToGrayFrames(m.content) match {
        case Some(frames) =>
          val offs = frames.scanLeft(0L)((acc, f) => acc + f.length)
          (0 until frames.length by stride).map(f =>
            Frame(m.media_id, f, offs(f), frames(f)))
        case None =>
          val frameLen = math.max(1, m.content.length / math.max(1, m.n_frames))
          (0 until m.n_frames by stride).map { f =>
            val off = f.toLong * frameLen
            Frame(m.media_id, f, off,
              m.content.slice(off.toInt, math.min(off.toInt + frameLen, m.content.length)))
          }
      }
    }
  }

  /** Resize: metadata-only transform (the planning half of the resize
    * stage) — demonstrates metadata pruning: no byte column is touched,
    * Parquet never reads `content`. [[resizeImages]] is the pixel half.
    */
  def resizeMeta(media: Dataset[MediaRow], maxDim: Int): DataFrame =
    media.toDF()
      .select(col("media_id"), col("kind"),
        least(col("width"), lit(maxDim)).as("width"),
        least(col("height"), lit(maxDim)).as("height"))

  case class ResizedImage(
      media_id: Long, in_w: Int, in_h: Int, out_w: Int, out_h: Int,
      pixels: Array[Byte])

  /** REAL pixel resize of decodable images: nearest-neighbor downsample of
    * the decoded gray matrix to fit `maxDim` (aspect preserved, never
    * upscaled) — `out(x, y) = in(x·in_w / out_w, y·in_h / out_h)`, pure
    * integer index arithmetic on pixels this module already decodes, so
    * the result is bit-deterministic (no interpolation, no re-encode — a
    * training pipeline wants the TENSOR, not a recompressed file).
    * Payloads ImageIO cannot parse are dropped here (the deterministic
    * byte-fallback is feature extraction's totality story; a resize of
    * non-pixels means nothing). Embarrassingly parallel, batched per
    * partition like [[extractFeatures]].
    */
  def resizeImages(media: Dataset[MediaRow], maxDim: Int): Dataset[ResizedImage] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").flatMap { m =>
      imageToGrayDims(m.content).map { case (w, h, gray) =>
        val scale = math.max(1.0, math.max(w, h).toDouble / maxDim)
        val (ow, oh) = (math.max(1, (w / scale).toInt), math.max(1, (h / scale).toInt))
        val out = new Array[Byte](ow * oh)
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            // index math in Long: a row-offset product can pass 2^31 on
            // very large decoded bitmaps before the division brings it back
            out(y * ow + x) = gray(
              ((y.toLong * h / oh) * w + x.toLong * w / ow).toInt)
            x += 1
          }
          y += 1
        }
        ResizedImage(m.media_id, w, h, ow, oh, out)
      }
    }
  }

  /** [[imageToGray]] with dimensions — the resize path needs the matrix
    * shape, not just the flat bytes.
    */
  private[pipeline] def imageToGrayDims(
      content: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      if (img == null) None
      else Some((img.getWidth, img.getHeight, grayOf(img)))
    } catch { case _: Exception => None }
}
