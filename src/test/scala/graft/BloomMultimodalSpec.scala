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
    assert(f.n_bytes == 6L) // pixels, not encoded bytes
    assert(f.byte_mean == flat.map(_.toLong).sum.toDouble / 6)
    assert(f.first_byte == 0 && f.last_byte == 30) // row-major order
    // non-image payloads still take the deterministic byte fallback
    val txt = Seq(Multimodal.MediaRow(2L, "image", "not a png".getBytes("UTF-8"), 1, 1, 1)).toDS()
    assert(Multimodal.extractFeatures(txt).collect()(0).n_bytes == 9L)
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
    assert(f.n_bytes == samples.length.toLong) // frames, not encoded bytes
    assert(f.byte_mean == expected.map(_.toLong).sum.toDouble / samples.length)
    assert(f.first_byte == expected.head && f.last_byte == expected.last)
    // non-audio payloads still take the deterministic byte fallback
    val txt = Seq(Multimodal.MediaRow(2L, "audio", "not a wav".getBytes("UTF-8"), 1, 1, 1)).toDS()
    assert(Multimodal.extractFeatures(txt).collect()(0).n_bytes == 9L)
  }

  test("CMS heavy hitters: estimate >= exact, overshoot bounded by eps*N") {
    import org.apache.spark.sql.functions.col
    val out = graft.agg.HeavyHitters.hotItemsSketch(events).collect()
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
      .join(EventWindows.uvHourlyBloom(single).withColumnRenamed("uv_bloom", "bloom"),
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
    assert(feats.forall(f => f.n_bytes > 0 && f.byte_mean > 0 && f.first_byte >= 0))
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
}
