package graft

import graft.agg.BloomDistinct
import graft.ops.EventWindows
import graft.pipeline.Multimodal
import org.apache.spark.sql.functions._

/** Bounds for the Bloom-gated distinct counter (SURVEY.md §5.4:
  * bloom-UV ≤ exact-UV) and end-to-end checks of the multimodal plumbing.
  */
class BloomMultimodalSpec extends SparkSuite {

  private lazy val events = Tables.events(spark, sf())
  private lazy val docs = Tables.documents(spark, sf())

  test("image decode path: real PNG bytes yield exact pixel statistics") {
    import graft.pipeline.Multimodal
    import spark.implicits._
    // 3x2 PNG with known gray values per pixel
    val img = new java.awt.image.BufferedImage(3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val grays = Array(Array(0, 128, 255), Array(10, 20, 30))
    for (y <- 0 until 2; x <- 0 until 3) {
      val g = grays(y)(x); img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val media = Seq(Multimodal.MediaRow(1L, "image", png, 3, 2, 1)).toDS()
    val f = Multimodal.extractFeatures(media).collect()(0)
    val flat = grays.flatten
    assert(f.n_bytes.contains(6L)) // pixels, not encoded bytes
    assert(f.byte_mean.contains(flat.map(_.toLong).sum.toDouble / 6))
    assert(f.first_byte.contains(0) && f.last_byte.contains(30)) // row-major order
    // non-image payloads still take the deterministic byte fallback
    val txt = Seq(Multimodal.MediaRow(2L, "image", "not a png".getBytes("UTF-8"), 1, 1, 1)).toDS()
    assert(Multimodal.extractFeatures(txt).collect()(0).n_bytes.contains(9L))
  }

  test("audio decode path: real WAV bytes yield exact sample statistics") {
    import javax.sound.sampled._
    import spark.implicits._
    // 16-bit signed little-endian mono PCM, 6 frames with known samples
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 256)
    val pcm = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      pcm(2 * i) = (samples(i) & 0xff).toByte // little-endian: LSB first
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, samples.length),
      AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    // expected decode: MSB of each sample, sign-offset to unsigned
    val expected = samples.map(s => ((s >> 8) & 0xff) ^ 0x80)
    val media = Seq(Multimodal.MediaRow(1L, "audio", wav, 1, 1, 1)).toDS()
    val f = Multimodal.extractFeatures(media).collect()(0)
    assert(f.n_bytes.contains(samples.length.toLong)) // frames, not encoded bytes
    assert(f.byte_mean.contains(expected.map(_.toLong).sum.toDouble / samples.length))
    assert(f.first_byte.contains(expected.head) && f.last_byte.contains(expected.last))
    // non-audio payloads still take the deterministic byte fallback
    val txt = Seq(Multimodal.MediaRow(2L, "audio", "not a wav".getBytes("UTF-8"), 1, 1, 1)).toDS()
    assert(Multimodal.extractFeatures(txt).collect()(0).n_bytes.contains(9L))
  }

  test("video decode path: real animated-GIF bytes yield per-frame pixel statistics") {
    import spark.implicits._
    // 3 frames of 2x2 with known gray values; GIF palettes hold 256
    // entries, so a gray image round-trips losslessly
    val frameGrays = Seq(
      Array(Array(0, 64), Array(128, 255)),
      Array(Array(10, 20), Array(30, 40)),
      Array(Array(200, 210), Array(220, 230)))
    // TYPE_BYTE_GRAY -> the GIF writer derives a full 256-gray palette,
    // so every frame's values survive exactly (an RGB first frame would
    // donate its few colors as the palette that quantizes later frames)
    def frame(g: Array[Array[Int]]): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(2, 2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 2; x <- 0 until 2)
        img.getRaster.setSample(x, y, 0, g(y)(x))
      img
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frameGrays.foreach { g =>
      val img = frame(g)
      // the JDK writer interlaces by default (and its reader then mangles
      // tiny interlaced frames — Toolkit decodes them fine, ImageIO
      // doesn't); real-world encoders default to non-interlaced, so the
      // fixture writes what production GIFs carry
      val meta = writer.getDefaultImageMetadata(
        new javax.imageio.ImageTypeSpecifier(img), null)
      val fmt = "javax_imageio_gif_image_1.0"
      val tree = meta.getAsTree(fmt).asInstanceOf[org.w3c.dom.Element]
      val desc = tree.getElementsByTagName("ImageDescriptor").item(0)
        .asInstanceOf[org.w3c.dom.Element]
      desc.setAttribute("interlaceFlag", "FALSE")
      meta.setFromTree(fmt, tree)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), null)
    }
    writer.endWriteSequence(); writer.dispose(); ios.close()
    val gif = bos.toByteArray

    val expected: Seq[Int] = frameGrays.flatMap(_.flatten.toSeq) // row-major, frames in order
    val media = Seq(Multimodal.MediaRow(1L, "video", gif, 2, 2, 3)).toDS()
    val f = Multimodal.extractFeatures(media).collect()(0)
    assert(f.n_bytes.contains(12L)) // 3 frames x 4 pixels, not encoded bytes
    assert(f.byte_mean.contains(expected.map(_.toLong).sum.toDouble / 12))
    assert(f.first_byte.contains(expected.head) && f.last_byte.contains(expected.last))

    // frame sampling demuxes the REAL frames: stride 2 -> frames 0 and 2,
    // offsets in decoded-pixel space
    val frames = Multimodal.sampleFrames(media, stride = 2).collect().sortBy(_.frame_no)
    assert(frames.map(_.frame_no).toSeq == Seq(0, 2))
    assert(frames.map(_.offset).toSeq == Seq(0L, 8L))
    assert(frames(0).frame_bytes.toSeq == frameGrays(0).flatten.map(_.toByte).toSeq)
    assert(frames(1).frame_bytes.toSeq == frameGrays(2).flatten.map(_.toByte).toSeq)

    // non-video payloads still take the deterministic byte-slice fallback
    val txt = Seq(Multimodal.MediaRow(2L, "video", "not a gif".getBytes("UTF-8"), 1, 1, 2)).toDS()
    assert(Multimodal.extractFeatures(txt).collect()(0).n_bytes.contains(9L))
    assert(Multimodal.sampleFrames(txt, stride = 1).collect().length == 2)
  }

  test("CMS heavy hitters: estimate >= exact, overshoot bounded by eps*N") {
    import org.apache.spark.sql.functions.col
    val out = graft.agg.HeavyHitters.hotItemsSketchScored(events).collect()
    assert(out.nonEmpty)
    val n = events.filter(col("event_type") === "click").count()
    out.foreach { r =>
      val (exact, cms) = (r.getLong(1), r.getLong(2))
      assert(cms >= exact, s"CMS underestimated item ${r.getLong(0)}")
      assert(cms - exact <= (0.001 * n).ceil.toLong * 5, // generous: 5x the 1-row bound
        s"CMS overshoot ${cms - exact} vs N=$n for item ${r.getLong(0)}")
    }
  }

  test("bloom distinct on a single partition: <= exact, within 5% of exact") {
    val single = events.repartition(1)
    val joined = EventWindows.uvHourly(single).withColumnRenamed("uv_count", "exact")
      .join(EventWindows.uvHourlyBloomRaw(single).withColumnRenamed("uv_bloom", "bloom"),
        "window_start")
    // per-partition the Bloom gate can only under-count (false positives)
    assert(joined.filter(col("bloom") > col("exact")).count() == 0)
    assert(joined.filter(col("bloom") < col("exact") * 0.95).count() == 0)
  }

  test("bloom distinct merge is defined (reference leaves it ???) and bounded") {
    import spark.implicits._
    // same value in many partitions: merged count may exceed 1 (documented
    // overcount) but never exceeds the partition count
    val df = spark.range(0, 8).select(lit(42L).as("v")).repartition(8)
    val merged = df.agg(BloomDistinct.bloomDistinct(col("v"))).collect()(0).getLong(0)
    assert(merged >= 1 && merged <= 8)
    // distinct values on one partition: exact
    val exact = spark.range(0, 1000).toDF("v").repartition(1)
      .agg(BloomDistinct.bloomDistinct(col("v"))).collect()(0).getLong(0)
    assert(exact <= 1000 && exact >= 990)
  }

  test("media features are deterministic and total over documents") {
    val media = Multimodal.fromDocuments(docs)
    val feats = Multimodal.extractFeatures(media, batchSize = 32).collect()
    assert(feats.length == docs.count())
    assert(feats.forall(f => f.n_bytes.exists(_ > 0) && f.byte_mean.exists(_ > 0) && f.first_byte.exists(_ >= 0)))
    // deterministic across runs
    val again = Multimodal.extractFeatures(media, batchSize = 7).collect()
    assert(feats.sortBy(_.media_id).toSeq == again.sortBy(_.media_id).toSeq)
  }

  test("frame sampling yields ceil(n_frames/stride) frames per video") {
    val media = Multimodal.fromDocuments(docs)
    val expected = media.filter(_.kind == "video").collect()
      .map(m => (m.n_frames + 1) / 2).sum
    val frames = Multimodal.sampleFrames(media, stride = 2).collect()
    assert(frames.length == expected)
    assert(frames.forall(_.frame_bytes.nonEmpty))
  }

  test("resize is metadata-only and clamps dimensions") {
    val out = Multimodal.resizeMeta(Multimodal.fromDocuments(docs), maxDim = 32)
    assert(out.filter(col("width") > 32 || col("height") > 32).count() == 0)
    assert(out.columns.toSeq == Seq("media_id", "kind", "width", "height"))
  }

  test("pixel resize: nearest-neighbor downsample is index-exact on a real PNG") {
    import spark.implicits._
    // 8x4 gray gradient: pixel(x, y) = 10x + 40y (all < 256, exactly encodable)
    val img = new java.awt.image.BufferedImage(8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8) {
      val g = 10 * x + 40 * y
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Seq(
      Multimodal.MediaRow(1L, "image", bos.toByteArray, 8, 4, 1),
      Multimodal.MediaRow(2L, "image", "not a png".getBytes("UTF-8"), 1, 1, 1),
      Multimodal.MediaRow(3L, "audio", bos.toByteArray, 8, 4, 1)).toDS()
    val out = Multimodal.resizeImages(media, maxDim = 4).collect()
    // undecodable and non-image rows drop; the PNG resizes 8x4 -> 4x2
    assert(out.map(_.media_id).toSeq == Seq(1L))
    val r = out.head
    assert((r.in_w, r.in_h, r.out_w, r.out_h) == ((8, 4, 4, 2)))
    // independent replication of out(x,y) = in(x*in_w/out_w, y*in_h/out_h)
    val expect = for (y <- 0 until 2; x <- 0 until 4)
      yield (10 * (x * 8 / 4) + 40 * (y * 4 / 2)).toByte
    assert(r.pixels.toSeq == expect)
    // no upscale: an image already within maxDim keeps its dimensions
    val same = Multimodal.resizeImages(media, maxDim = 64).collect().head
    assert((same.out_w, same.out_h) == ((8, 4)) && same.pixels.length == 32)
  }
}
