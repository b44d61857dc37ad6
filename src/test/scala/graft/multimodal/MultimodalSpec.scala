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
}
