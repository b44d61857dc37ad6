package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class MultimodalSpec extends SparkSpec {

  test("loadMediaDir builds (path, length, content, meta) with type from extension") {
    val dir = Files.createTempDirectory("graft-media")
    Files.write(dir.resolve("clip.mp4"), Array[Byte](9, 9))
    Files.write(dir.resolve("pic.jpg"), Array[Byte](1, 2, 3, 4))
    val df = Multimodal.loadMediaDir(spark, dir.toString)
    val types = df.select(col("meta.media_type")).collect()
      .map(_.getString(0)).sorted.toSeq
    assert(types == Seq("jpg", "mp4"))
    assert(df.schema("meta").dataType == Multimodal.mediaMetaSchema)
  }

  test("decodeImageMeta stub emits bounded deterministic dimensions") {
    import spark.implicits._
    val df = Seq(("a", Array[Byte](1, 2)), ("b", Array[Byte](3))).toDF("path", "content")
    val out = Multimodal.decodeImageMeta(df).select("decoded.width", "decoded.height")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(out.forall { case (w, h) => w >= 1 && w <= 1920 && h >= 1 && h <= 1080 })
    val again = Multimodal.decodeImageMeta(df).select("decoded.width", "decoded.height")
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(out.toSeq == again.toSeq)
  }

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("decodeImageMeta parses REAL PNG/JPEG headers through a binary dir") {
    val dir = Files.createTempDirectory("graft-realimg")
    Files.write(dir.resolve("a.png"), pngBytes(120, 80))
    val jbaos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(
      new java.awt.image.BufferedImage(
        33, 21, java.awt.image.BufferedImage.TYPE_INT_RGB), "jpg", jbaos)
    Files.write(dir.resolve("b.jpg"), jbaos.toByteArray)
    Files.write(dir.resolve("c.txt"), "not an image at all".getBytes("UTF-8"))
    val out = Multimodal.decodeImageMeta(
        Multimodal.loadMediaDir(spark, dir.toString))
      .select(col("meta.media_type"), col("decoded.width"),
        col("decoded.height"), col("decoded.channels"))
      .collect()
      .map(r => (r.getString(0), (r.getInt(1), r.getInt(2), r.getInt(3))))
      .toMap
    assert(out("png") == ((120, 80, 3)))
    assert(out("jpg") == ((33, 21, 3)))
    // the undecodable payload takes the md5 fake, inside its bounds
    val (tw, th, tch) = out("txt")
    assert(tw >= 1 && tw <= 1920 && th >= 1 && th <= 1080 && tch == 3)
  }

  test("decodeImageMeta fallback == the md5 Column formulation the q32 " +
      "oracle reproduces") {
    import spark.implicits._
    val df = Seq(
      ("t1", "some text payload".getBytes("UTF-8")),
      ("t2", Array[Byte](0, 1, 2, 3, 4)),
      ("t3", Array.empty[Byte])).toDF("path", "content")
    val kernel = Multimodal.decodeImageMeta(df)
      .select("path", "decoded.width", "decoded.height")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val h = md5(coalesce(col("content"), lit(Array.empty[Byte])))
    val column = df.select(col("path"),
        (conv(substring(h, 1, 8), 16, 10).cast("long") % 1920 + 1)
          .cast("int"),
        (conv(substring(h, 9, 8), 16, 10).cast("long") % 1080 + 1)
          .cast("int"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(kernel == column)
  }

  test("resize REALLY rescales a decodable image (payload re-decodes at " +
      "the target dimensions)") {
    import spark.implicits._
    val df = Multimodal.decodeImageMeta(
      Seq(("p.png", pngBytes(120, 80))).toDF("path", "content"))
    val row = Multimodal.resize(df, width = 64, height = 32).collect().head
    val dec = row.getStruct(row.fieldIndex("decoded"))
    assert((dec.getInt(0), dec.getInt(1)) == (64, 32))
    val outBytes = row.getAs[Array[Byte]](row.fieldIndex("content"))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(outBytes))
    assert(img != null && img.getWidth == 64 && img.getHeight == 32)
  }

  /** Real WAV bytes via javax.sound.sampled: `durMs` of silence at the
    * given rate/channels, 16-bit PCM little-endian.
    */
  private def wavBytes(rate: Int, channels: Int, durMs: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate.toFloat, 16, channels, true, false)
    val nFrames = rate.toLong * durMs / 1000
    val pcm = new Array[Byte](nFrames.toInt * fmt.getFrameSize)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  test("decodeAudioMeta parses REAL WAV headers; junk falls to the fake") {
    import spark.implicits._
    val df = Seq(
      ("mono8k", wavBytes(8000, 1, 750)),
      ("stereo44", wavBytes(44100, 2, 250)),
      ("junk", Array[Byte](1, 2, 3, 4, 5))).toDF("path", "content")
    val out = Multimodal.decodeAudioMeta(df)
      .select("path", "audio.channels", "audio.sample_rate",
        "audio.bits_per_sample", "audio.duration_ms")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))))
      .toMap
    assert(out("mono8k") == ((1, 8000, 16, 750L)))
    assert(out("stereo44") == ((2, 44100, 16, 250L)))
    // fake arm: deterministic, bounded
    val (ch, rate, bits, dur) = out("junk")
    assert(ch >= 1 && ch <= 2 && rate % 8000 == 0 && bits == 16 &&
      dur >= 1 && dur <= 600000)
    val again = Multimodal.decodeAudioMeta(df)
      .select("audio.channels").collect().map(_.getInt(0)).toSeq
    assert(again == out.toSeq.sortBy(_._1).map(_._2._1) ||
      again.toSet == out.values.map(_._1).toSet) // deterministic re-run
  }

  test("wavHeader survives extra chunks and rejects truncated payloads") {
    // LIST chunk before fmt/data: still parsed (chunk-walk, not offsets)
    val base = wavBytes(16000, 1, 100)
    assert(Multimodal.wavHeader(base).contains((1, 16000, 16, 100L)))
    assert(Multimodal.wavHeader(base.take(10)) == None)
    assert(Multimodal.wavHeader(Array[Byte]()) == None)
    // corrupt the RIFF magic
    val bad = base.clone(); bad(0) = 'X'
    assert(Multimodal.wavHeader(bad) == None)
  }

  test("wavHeader terminates on adversarial chunk sizes (no spin)") {
    // 'JUNK' chunk with unsigned size 0xFFFFFFF8: as a signed Int the
    // step would be 8 + (-8) = 0 — the long-space advance guard must
    // detect the non-advancing walk and bail as malformed
    val evil = java.nio.ByteBuffer.allocate(24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil.put("RIFF".getBytes("US-ASCII")).putInt(16)
      .put("WAVE".getBytes("US-ASCII"))
      .put("JUNK".getBytes("US-ASCII")).putInt(0xFFFFFFF8)
      .putInt(0)
    assert(Multimodal.wavHeader(evil.array()) == None)
    // zeroed bits-per-sample in an otherwise-valid fmt chunk: rejected
    val zb = wavBytes(16000, 1, 50)
    // find the fmt chunk's bits field (offset 12+8+14 for a canonical
    // AudioSystem WAV: fmt data starts at 20, bits at 20+14)
    zb(34) = 0; zb(35) = 0
    assert(Multimodal.wavHeader(zb) == None)
  }

  test("q32_multimodal runs end-to-end and yields one row per source") {
    val out = graft.SparkEntry.queries("q32_multimodal")(spark, sf("sf0.001"))
      .collect()
    assert(out.length > 0)
    assert(out.forall(r => r.getLong(r.fieldIndex("n_frames")) > 0))
  }

  test("resize stub rewrites payload and decoded dimensions, keeps schema") {
    import spark.implicits._
    val df = Multimodal.decodeImageMeta(
      Seq(("p1", Array[Byte](1, 2, 3, 4, 5))).toDF("path", "content"))
    val out = Multimodal.resize(df, width = 64, height = 32)
    val row = out.collect().head
    val dec = row.getStruct(row.fieldIndex("decoded"))
    assert((dec.getInt(0), dec.getInt(1)) == (64, 32))
    assert(row.getAs[Array[Byte]](row.fieldIndex("content")).length == 2)
    assert(out.schema.fieldNames.toSeq == df.schema.fieldNames.toSeq)
    // empty-payload safety is the caller's concern (binaryFile never
    // produces null content); deterministic across runs:
    val again = Multimodal.resize(df, 64, 32).collect().head
      .getAs[Array[Byte]](row.fieldIndex("content"))
    assert(again.toSeq == row.getAs[Array[Byte]](row.fieldIndex("content")).toSeq)
  }

  /** A w×h PNG where every pixel is the given packed RGB. */
  private def solidPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, rgb)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("extractFeatures computes REAL per-channel statistics for " +
      "decodable images") {
    import spark.implicits._
    // half pure red, half pure blue: channel means 0.5/0/0.5, red and
    // blue stds exactly 0.5 (two-point distribution at 0 and 255),
    // green std 0; both lumas (76, 29) land in histogram bin 0 of 2
    val img = new java.awt.image.BufferedImage(
      4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 4; y <- 0 until 2)
      img.setRGB(x, y, if (x < 2) 0xff0000 else 0x0000ff)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val df = Seq(
      ("redblue", baos.toByteArray),
      ("gray", solidPng(3, 3, 0x0a141e)), // uniform (10, 20, 30)
      ("fake", "definitely not an image".getBytes("UTF-8")))
      .toDF("path", "content")
    val out = Multimodal.extractFeatures(df, "content", dim = 8)
      .select("path", "features").collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    val eps = 1e-3f
    val rb = out("redblue")
    assert(math.abs(rb(0) - 0.5f) < eps && rb(1) == 0.0f &&
      math.abs(rb(2) - 0.5f) < eps)
    assert(math.abs(rb(3) - 0.5f) < eps && rb(4) == 0.0f &&
      math.abs(rb(5) - 0.5f) < eps)
    assert(rb(6) == 1.0f && rb(7) == 0.0f)
    val gray = out("gray")
    assert(math.abs(gray(0) - 10f / 255) < eps &&
      math.abs(gray(1) - 20f / 255) < eps &&
      math.abs(gray(2) - 30f / 255) < eps)
    assert(gray(3) == 0.0f && gray(4) == 0.0f && gray(5) == 0.0f)
    // the undecodable payload still takes the bounded md5 fake
    assert(out("fake").forall(f => f >= 0.0f && f < 1.0f))
    // deterministic re-run, real arm included
    val again = Multimodal.extractFeatures(df, "content", dim = 8)
      .select("path", "features").collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(out == again)
  }

  test("sampleFrames explodes one row per sampled frame position") {
    import spark.implicits._
    val df = Seq(("v1", 2500L)).toDF("path", "dur")
      .select(col("path"), struct(lit("mp4").as("media_type"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        col("dur").as("duration_ms")).as("meta"))
    val frames = Multimodal.sampleFrames(df, everyMs = 1000)
      .select("frame_ms").collect().map(_.getLong(0)).toSeq
    assert(frames == Seq(0L, 1000L, 2000L))
  }

  test("featureNearDup: identical payloads pair at l1 = 0 through the " +
      "signature bucket; distinct random payloads stay unpaired; " +
      "threshold bounds the verify; canonical id order") {
    import spark.implicits._
    val rows = Seq(
      (1L, "same-bytes"), (2L, "same-bytes"), (7L, "same-bytes"),
      (3L, "other"), (4L, "unrelated-payload"))
      .toDF("doc_id", "t")
      .select(col("doc_id"), col("t").cast("binary").as("content"))
    val got = Multimodal.featureNearDup(rows, col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // the exact-dup triangle, nothing else (md5 features of distinct
    // payloads are far apart at threshold 100 with overwhelming odds,
    // and these fixtures were checked to be)
    assert(got == Set((1L, 2L, 0L), (1L, 7L, 0L), (2L, 7L, 0L)))
    // threshold 8000 admits everything bucket-collided; still only
    // same-signature candidates can appear, ids canonical
    val loose = Multimodal.featureNearDup(rows, col("doc_id"),
        threshold = 8000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(loose.forall { case (a, b) => a < b })
    intercept[IllegalArgumentException](
      Multimodal.featureNearDup(rows, col("doc_id"), dim = 1))
    intercept[IllegalArgumentException](
      Multimodal.featureNearDup(rows, col("doc_id"), threshold = -1L))
  }

  test("featureNearDup fails loudly on a degenerate signature bucket " +
      "past maxBucketSize") {
    import spark.implicits._
    val rows = (1L to 10L).map(i => (i, "all-equal")).toDF("doc_id", "t")
      .select(col("doc_id"), col("t").cast("binary").as("content"))
    intercept[Exception] {
      Multimodal.featureNearDup(rows, col("doc_id"), maxBucketSize = 5)
        .collect()
    }
  }
}
