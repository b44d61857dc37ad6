package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct alongside. Decode /
  * feature-extract stages run per-partition over batches so a real decoder
  * (JNI/ffmpeg/JPEG lib) drops in without changing the plan shape.
  *
  * The decode kernels themselves are STUBBED with deterministic fakes
  * (this environment has no media libraries); everything Spark-side —
  * schema, batching, partition sizing, null handling — is real and tested.
  *
  * Scale notes: media rows are wide (MBs); `maxRecordsPerBatch`-style
  * batching happens naturally via mapPartitions chunks, and repartitioning
  * by a size-bucket column before decode keeps tasks balanced when payload
  * sizes are skewed. Never collect payloads to the driver.
  */
object Multimodal {

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Load a directory of media files as (path, length, content, meta). */
  def loadMediaDir(spark: SparkSession, dir: String, glob: String = "*")
      : DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        col("path"),
        col("length"),
        col("content"),
        struct(
          lower(regexp_extract(col("path"), "\\.(\\w+)$", 1)).as("media_type"),
          lit(null).cast(IntegerType).as("width"),
          lit(null).cast(IntegerType).as("height"),
          lit(null).cast(LongType).as("duration_ms")).as("meta"))

  /** STUB image decode: a real implementation parses the codec header and
    * emits (width, height, channels, pixels). The deterministic fake
    * derives pseudo-dimensions from md5 of the payload — md5, not
    * xxhash64, so the fake is reproducible in ANY engine and a query over
    * decoded metadata can be oracle-checked end to end (q32): width from
    * hex digits 1-8, height from digits 9-16 of the same digest.
    */
  def decodeImageMeta(df: DataFrame, contentCol: String = "content")
      : DataFrame = {
    // loadMediaDir's content column is nullable; a null payload decodes
    // as empty bytes rather than poisoning width/height with nulls
    val h = md5(coalesce(col(contentCol), lit(Array.empty[Byte])))
    val fakeW = (conv(substring(h, 1, 8), 16, 10).cast("long") % 1920 + 1)
      .cast("int")
    val fakeH = (conv(substring(h, 9, 8), 16, 10).cast("long") % 1080 + 1)
      .cast("int")
    df.withColumn("decoded", struct(
      fakeW.as("width"), fakeH.as("height"), lit(3).as("channels")))
  }

  /** STUB feature extraction: batch-shaped per-partition kernel. A real
    * kernel would hand each batch of payloads to a native decoder and
    * return fixed-length feature vectors; the fake derives a deterministic
    * vector from payload bytes. The mapPartitions shape (batched pull,
    * vector output) is exactly what a JNI bridge needs.
    */
  def extractFeatures(
      df: DataFrame,
      contentCol: String = "content",
      dim: Int = 8): DataFrame = {
    val schema = df.schema.add("features", ArrayType(FloatType, false))
    val idx = df.schema.fieldIndex(contentCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.grouped(64).flatMap { batch => // batch boundary = decoder call
        batch.map { r =>
          // null payload = empty bytes (content is a nullable binary
          // column per the loadMediaDir contract) — same convention as
          // decodeImageMeta, so the fakes stay consistent across stages
          val bytes =
            if (r.isNullAt(idx)) Array.empty[Byte]
            else r.getAs[Array[Byte]](idx)
          val feats = Array.tabulate(dim) { i =>
            // ??? real decoder goes here; deterministic fake — feature i =
            // md5(payload ++ ":i") scaled to [0, 1). md5 (engine-neutral)
            // keeps the fake oracle-able: DuckDB's md5(text || ':' || i)
            // reproduces it exactly (q32).
            md.update(bytes)
            md.update((":" + i).getBytes("UTF-8"))
            val d = md.digest() // resets the digest
            var h = 0L
            var j = 0
            while (j < 4) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
            (h % 1000) / 1000.0f
          }
          Row.fromSeq(r.toSeq :+ feats.toSeq)
        }
      }
    }(enc)
  }

  /** STUB resize: a real kernel decodes, scales to (w, h), re-encodes.
    * The fake replaces the payload with a deterministic, length-scaled
    * transform of the original bytes and rewrites the decoded dimensions,
    * preserving exactly the plan shape (binary in, binary out, metadata
    * update) a real resizer has. Requires `decodeImageMeta` upstream.
    */
  def resize(
      df: DataFrame,
      width: Int,
      height: Int,
      contentCol: String = "content"): DataFrame = {
    val idx = df.schema.fieldIndex(contentCol)
    val schema = StructType(df.schema.fields.map { f =>
      if (f.name == "decoded")
        StructField("decoded", StructType(Seq(
          StructField("width", IntegerType, false),
          StructField("height", IntegerType, false),
          StructField("channels", IntegerType, false))), false)
      else f
    })
    val didx = df.schema.fieldIndex("decoded")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes =
          if (r.isNullAt(idx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](idx)
        // ??? real decode→scale→encode goes here; deterministic fake:
        // sample the payload down/up to a size proportional to the target
        // (null/empty payload resizes to zero-filled bytes)
        val outLen = math.max(1, (width.toLong * height / 1024).toInt)
        val out =
          if (bytes.isEmpty) new Array[Byte](outLen)
          else Array.tabulate(outLen)(i => bytes(i % bytes.length))
        val vals = r.toSeq
          .updated(idx, out)
          .updated(didx, Row(width, height, 3))
        Row.fromSeq(vals)
      }
    }(enc)
  }

  /** Frame-sampling plan for video rows: one output row per sampled frame
    * index (decode stub). Emits (every nth frame) positions from duration
    * metadata — the explode shape a real frame sampler produces.
    */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.withColumn("frame_ms",
        explode(sequence(lit(0L),
          greatest(coalesce(col("meta.duration_ms"), lit(0L)) - 1, lit(0L)),
          lit(everyMs))))
}
