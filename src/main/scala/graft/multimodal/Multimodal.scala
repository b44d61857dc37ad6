package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct alongside. Decode /
  * feature-extract stages run per-partition over batches so a real decoder
  * (JNI/ffmpeg/JPEG lib) drops in without changing the plan shape.
  *
  * IMAGE decode and resize are REAL for decodable payloads:
  * `decodeImageMeta` header-parses PNG/JPEG/GIF/BMP via `javax.imageio`
  * (width/height read from the codec header — no pixel decode), and
  * `resize` does a full `BufferedImage` bilinear rescale + PNG re-encode.
  * Undecodable payloads fall back to the md5-derived deterministic fake,
  * which keeps every stage oracle-able end to end (q32 fabricates
  * payloads from document text, so its whole pipeline hash-checks against
  * DuckDB's md5). AUDIO metadata decode is likewise real for RIFF/WAVE
  * payloads (`decodeAudioMeta` walks the chunk list — WAV needs no codec
  * library). Video and the feature-vector kernels remain deterministic
  * fakes (no codec libs here); their mapPartitions batch shape is what a
  * JNI bridge needs.
  *
  * Scale notes: media rows are wide (MBs); `maxRecordsPerBatch`-style
  * batching happens naturally via mapPartitions chunks, and repartitioning
  * by a size-bucket column before decode keeps tasks balanced when payload
  * sizes are skewed. A magic-byte pre-check keeps the non-image hot path
  * free of ImageIO reader lookups. Never collect payloads to the driver.
  */
object Multimodal extends Serializable {

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

  /** True iff the payload starts with a magic number `javax.imageio`'s
    * standard plugins handle (PNG/JPEG/GIF/BMP). Cheap pre-check so the
    * non-image hot path (fabricated corpora, audio, video) never pays an
    * ImageIO reader lookup per row.
    */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b != null && b.length >= 6 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N') || // PNG
      (b(0) == 0xff.toByte && b(1) == 0xd8.toByte &&
        b(2) == 0xff.toByte) ||                              // JPEG
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&          // GIF87a/89a
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a') ||
      (b(0) == 'B' && b(1) == 'M'))                          // BMP

  /** Header-parse (width, height, channels) via `javax.imageio` — reads
    * only the codec header (`reader.getWidth(0)` never decodes pixels),
    * so this costs microseconds per image, not a full decode. None for
    * anything ImageIO can't read.
    */
  // one-time per-JVM: in-memory streams, no tmp files (setUseCache is a
  // process-wide static — flip it once, not per row)
  @transient private lazy val imageIoInit: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  private[multimodal] def imageHeader(
      bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (!looksLikeImage(bytes)) return None
    imageIoInit
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          val w = r.getWidth(0)
          val h = r.getHeight(0)
          val ch =
            try {
              val types = r.getImageTypes(0)
              if (types.hasNext) types.next().getNumComponents else 3
            } catch { case scala.util.control.NonFatal(_) => 3 }
          // a signature-colliding non-image can parse a garbage header;
          // nonpositive dimensions fall through to the fake arm instead
          // of escaping the documented bounds
          if (w <= 0 || h <= 0) None else Some((w, h, ch))
        } catch { case scala.util.control.NonFatal(_) => None }
        finally r.dispose()
      }
    } finally iis.close()
  }

  /** The md5-derived fallback dimensions for undecodable payloads —
    * bit-identical to the Column formulation
    * `conv(substring(md5(content), 1, 8), 16, 10) % 1920 + 1` (hex digits
    * 1-8 = digest bytes 0-3 unsigned; 9-16 = bytes 4-7), which is what
    * the q32 DuckDB oracle reproduces. MultimodalSpec pins the
    * equivalence.
    */
  private def fakeDims(md: java.security.MessageDigest,
      bytes: Array[Byte]): (Int, Int) = {
    val d = md.digest(bytes)
    def u32(o: Int): Long =
      ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
        ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
    ((u32(0) % 1920 + 1).toInt, (u32(4) % 1080 + 1).toInt)
  }

  final case class DecodedDims(width: Int, height: Int, channels: Int)

  @transient private lazy val mdLocal =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Image decode, metadata stage: REAL `javax.imageio` header parse for
    * decodable payloads (PNG/JPEG/GIF/BMP — true width/height/channels
    * from the codec header, no pixel decode), md5-derived deterministic
    * fake for everything else — so fabricated-payload pipelines stay
    * oracle-able end to end (q32: the fixture's lowercase word-soup
    * bytes can never spell an image signature, so every fabricated
    * payload provably takes the fake arm the oracle mirrors; fake width
    * from md5 hex digits 1-8, height from digits 9-16 of the same
    * digest).
    *
    * A scalar UDF over the content column only — NOT a whole-row
    * kernel: the projection shape keeps column pruning and filter
    * pushdown working through this stage and never re-serializes the
    * (multi-MB) untouched columns. The header parse is per-row cheap,
    * so the batch shape `extractFeatures` keeps for a real JNI decoder
    * buys nothing here.
    */
  def decodeImageMeta(df: DataFrame, contentCol: String = "content")
      : DataFrame = {
    val decode = udf { bytes: Array[Byte] =>
      // loadMediaDir's content column is nullable; a null payload
      // decodes as empty bytes rather than poisoning width/height
      val b = if (bytes == null) Array.empty[Byte] else bytes
      imageHeader(b) match {
        case Some((w, h, ch)) => DecodedDims(w, h, ch)
        case None =>
          val (fw, fh) = fakeDims(mdLocal.get(), b)
          DecodedDims(fw, fh, 3)
      }
    }
    df.withColumn("decoded", decode(col(contentCol)))
  }

  /** REAL per-channel pixel statistics for a decoded image: the first 6
    * entries are R/G/B means then R/G/B standard deviations (all
    * normalized to [0, 1]), the remaining `dim - 6` entries a normalized
    * luminance histogram (ITU-R BT.601 weights). Deterministic — pixel
    * order is fixed, sums are exact integer accumulations — so the kernel
    * stays reproducible run to run like every other stage. For `dim < 6`
    * the stats vector is truncated.
    */
  private[multimodal] def pixelStats(
      img: java.awt.image.BufferedImage, dim: Int): Array[Float] = {
    val w = img.getWidth; val h = img.getHeight
    val n = w.toLong * h
    val sum = new Array[Long](3)
    val sumSq = new Array[Long](3)
    val bins = math.max(dim - 6, 0)
    val hist = new Array[Long](math.max(bins, 1))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        sum(0) += r; sum(1) += g; sum(2) += b
        sumSq(0) += r.toLong * r; sumSq(1) += g.toLong * g
        sumSq(2) += b.toLong * b
        if (bins > 0) {
          // BT.601 integer luma; 255 maps to the top bin, not bins
          val luma = (299 * r + 587 * g + 114 * b) / 1000
          hist(math.min(luma * bins / 256, bins - 1)) += 1
        }
        x += 1
      }
      y += 1
    }
    val out = new Array[Float](dim)
    var c = 0
    while (c < 3 && c < dim) {
      out(c) = (sum(c).toDouble / n / 255.0).toFloat
      c += 1
    }
    c = 0
    while (c < 3 && c + 3 < dim) {
      val mean = sum(c).toDouble / n
      val variance = sumSq(c).toDouble / n - mean * mean
      out(c + 3) = (math.sqrt(math.max(variance, 0.0)) / 255.0).toFloat
      c += 1
    }
    var i = 0
    while (i < bins) { out(i + 6) = (hist(i).toDouble / n).toFloat; i += 1 }
    out
  }

  /** Feature extraction: batch-shaped per-partition kernel with the same
    * two-arm contract as `decodeImageMeta` — REAL per-channel pixel
    * statistics (`pixelStats`: channel means/stds + luminance histogram)
    * for payloads `ImageIO` can decode, md5-derived deterministic fake for
    * everything else. Fabricated corpora (q32: lowercase word-soup bytes
    * that can never spell an image signature) provably take the fake arm,
    * so the pipeline stays oracle-able; real image files get real
    * features. The mapPartitions batch shape (batched pull, vector
    * output) is exactly what a heavier JNI/embedding-model kernel needs.
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
          val decoded =
            if (looksLikeImage(bytes))
              try
                Option(javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(bytes)))
              catch { case scala.util.control.NonFatal(_) => None }
            else None
          val feats = decoded match {
            case Some(img) => pixelStats(img, dim)
            case None =>
              Array.tabulate(dim) { i =>
                // deterministic fake — feature i = md5(payload ++ ":i")
                // scaled to [0, 1). md5 (engine-neutral) keeps the fake
                // oracle-able: DuckDB's md5(text || ':' || i) reproduces
                // it exactly (q32).
                md.update(bytes)
                md.update((":" + i).getBytes("UTF-8"))
                val d = md.digest() // resets the digest
                var h = 0L
                var j = 0
                while (j < 4) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
                (h % 1000) / 1000.0f
              }
          }
          Row.fromSeq(r.toSeq :+ feats.toSeq)
        }
      }
    }(enc)
  }

  /** Resize: REAL decode→scale→re-encode for decodable images — full
    * `ImageIO.read`, `BufferedImage` bilinear rescale to (width, height),
    * PNG re-encode — and a deterministic length-scaled byte transform for
    * undecodable payloads, so the plan shape (binary in, binary out,
    * metadata update) is identical on both arms and fabricated-payload
    * pipelines stay reproducible. Requires `decodeImageMeta` upstream.
    */
  def resize(
      df: DataFrame,
      width: Int,
      height: Int,
      contentCol: String = "content"): DataFrame = {
    // fail at plan-build time: the real-decode arm's BufferedImage
    // would otherwise throw inside a task on the first decodable image
    // while the fake arm tolerated the same bad target silently
    require(width > 0 && height > 0,
      s"target dimensions must be positive, got ${width}x$height")
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
        val decoded =
          if (looksLikeImage(bytes))
            try
              Option(javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(bytes)))
            catch { case scala.util.control.NonFatal(_) => None }
          else None
        val out = decoded match {
          case Some(img) =>
            val scaled = new java.awt.image.BufferedImage(
              width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = scaled.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, width, height, null)
            } finally g.dispose()
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(scaled, "png", baos)
            baos.toByteArray
          case None =>
            // deterministic fake: sample the payload down/up to a size
            // proportional to the target (null/empty payload resizes to
            // zero-filled bytes)
            val outLen = math.max(1, (width.toLong * height / 1024).toInt)
            if (bytes.isEmpty) new Array[Byte](outLen)
            else Array.tabulate(outLen)(i => bytes(i % bytes.length))
        }
        val vals = r.toSeq
          .updated(idx, out)
          .updated(didx, Row(width, height, 3))
        Row.fromSeq(vals)
      }
    }(enc)
  }

  private def looksLikeWav(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  /** RIFF/WAVE header parse: walk the chunk list for `fmt ` (channels,
    * sample rate, bits per sample) and `data` (payload size → duration).
    * Pure byte arithmetic — WAV needs no codec library, so unlike the
    * image path there is nothing to stub. None for malformed payloads.
    */
  private[multimodal] def wavHeader(
      bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    if (!looksLikeWav(bytes)) return None
    try {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var pos = 12
      var channels = -1; var sampleRate = -1; var bits = -1
      var byteRate = -1L; var dataSize = -1L
      var malformed = false
      while (!malformed && pos + 8 <= bytes.length &&
          (channels < 0 || dataSize < 0)) {
        val id = new String(bytes, pos, 4, "US-ASCII")
        val size = bb.getInt(pos + 4).toLong & 0xffffffffL
        if (id == "fmt " && size >= 16 && pos + 8 + 16 <= bytes.length) {
          channels = bb.getShort(pos + 10).toInt
          sampleRate = bb.getInt(pos + 12)
          byteRate = bb.getInt(pos + 16).toLong & 0xffffffffL
          bits = bb.getShort(pos + 22).toInt
        } else if (id == "data") {
          dataSize = math.min(size, (bytes.length - pos - 8).toLong)
        }
        // advance in LONG space: a corrupt unsigned size near 2^32 would
        // truncate to a non-positive Int step and spin this loop forever
        val next = pos.toLong + 8L + size + (size & 1L)
        if (next <= pos || next > Int.MaxValue) malformed = true
        else pos = next.toInt
      }
      if (malformed || channels <= 0 || sampleRate <= 0 || bits <= 0 ||
          byteRate <= 0 || dataSize < 0)
        None
      else Some((channels, sampleRate, bits,
        dataSize * 1000L / byteRate))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Audio decode, metadata stage: REAL RIFF/WAVE header parse for WAV
    * payloads (channels / sample rate / bits / duration from the actual
    * chunk list), md5-derived deterministic fake for everything else —
    * the same two-arm contract as `decodeImageMeta`, so fabricated-
    * payload pipelines stay reproducible while real corpora decode
    * truthfully. Fake: channels = 1 + (md5 bytes 0-3 mod 2), rate =
    * 8000 * (1 + bytes 4-7 mod 6), 16-bit, duration = bytes 8-11 mod
    * 600000 + 1 — all from one digest, engine-reproducible.
    */
  def decodeAudioMeta(df: DataFrame, contentCol: String = "content")
      : DataFrame = {
    val idx = df.schema.fieldIndex(contentCol)
    val schema = df.schema.add("audio", StructType(Seq(
      StructField("channels", IntegerType, false),
      StructField("sample_rate", IntegerType, false),
      StructField("bits_per_sample", IntegerType, false),
      StructField("duration_ms", LongType, false))), nullable = false)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val bytes =
          if (r.isNullAt(idx)) Array.empty[Byte]
          else r.getAs[Array[Byte]](idx)
        val (ch, rate, bits, dur) = wavHeader(bytes).getOrElse {
          val d = md.digest(bytes)
          def u32(o: Int): Long =
            ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
              ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
          ((u32(0) % 2 + 1).toInt, (8000 * (u32(4) % 6 + 1)).toInt, 16,
            u32(8) % 600000 + 1)
        }
        Row.fromSeq(r.toSeq :+ Row(ch, rate, bits, dur))
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

  /** Media near-duplicate pairs through the FEATURE path — the
    * multimodal→dedup bridge: [[extractFeatures]]' per-payload vector
    * becomes a sign-bit blocking signature (bit i set iff feature i ≥
    * 0.5), candidate pairs form inside equal-signature buckets, and an
    * exact integer L1 distance over the millesimal feature values
    * (feature i is k/1000 by construction — real decoders are
    * quantized the same way upstream) verifies them. The text-dedup
    * playbook (q20/q51 simhash→hamming) replayed over OPAQUE BINARY
    * payloads no tokenizer can touch.
    *
    * The signature is a BLOCKING key, not a guarantee: `dim` sign bits
    * give 2^dim buckets, so expected bucket occupancy is n/2^dim and
    * the bucket self-join costs Σ occupancy² — at corpus scale raise
    * `dim` (16-24 bits) exactly as LSH bands scale, and the loud
    * `maxBucketSize` turns a degenerate signature (all payloads equal
    * — every row one bucket) into an error naming the bucket instead
    * of an executor-killing join. Identical payloads always share a
    * bucket and verify at distance 0, so exact binary dups are never
    * lost; near-dups are caught iff no feature crosses the 0.5 sign
    * boundary (the standard LSH recall trade — band the signature
    * upstream if that matters).
    *
    * Scale shape: feature extraction is the map-only batched kernel;
    * ONE shuffle on the signature; the verify L1 is computed in the
    * join projection (no second pass). Payload bytes never ride the
    * shuffle — only (id, k₀..k_{dim−1}, sig).
    *
    * @param threshold max L1 distance over the 0-999 integer feature
    *   values (dim·999 max; identical payloads are 0)
    * @return (id1, id2, l1) with id1 < id2, one row per verified pair
    */
  def featureNearDup(
      df: DataFrame,
      idCol: org.apache.spark.sql.Column,
      contentCol: String = "content",
      dim: Int = 8,
      threshold: Long = 100L,
      maxBucketSize: Int = 100000): DataFrame = {
    require(dim >= 2 && dim <= 62, s"dim must be in [2, 62], got $dim")
    require(threshold >= 0, s"threshold must be >= 0, got $threshold")
    require(maxBucketSize >= 2, s"maxBucketSize must be >= 2")
    val feats = extractFeatures(
      df.select(idCol.cast("long").as("id"), col(contentCol)),
      contentCol, dim)
    // recover the exact 0-999 integers: float32(k/1000) is within
    // ~1e-4 of k after the double widening, so round() is exact
    val ks = (0 until dim).map(i =>
      round(element_at(col("features"), i + 1).cast("double") * 1000)
        .cast("long").as(s"k$i"))
    val sig = (0 until dim).map(i =>
      when(col(s"k$i") >= 500, lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    val m = feats.select((col("id") +: ks): _*).withColumn("sig", sig)
    val guarded = m.withColumn("__bn",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("sig"))))
      .withColumn("sig", when(col("__bn") <= maxBucketSize, col("sig"))
        .otherwise(raise_error(concat(
          lit(s"featureNearDup: signature bucket exceeds " +
            s"$maxBucketSize rows (sig="), col("sig"),
          lit(") — raise dim or band the signature")))))
      .drop("__bn")
    val l = guarded
    val r = (0 until dim).foldLeft(
        guarded.withColumnRenamed("id", "id2")) { (d, i) =>
      d.withColumnRenamed(s"k$i", s"j$i")
    }
    val l1 = (0 until dim).map(i =>
      abs(col(s"k$i") - col(s"j$i"))).reduce(_ + _)
    l.join(r, Seq("sig"))
      .filter(col("id") < col("id2"))
      .withColumn("l1", l1)
      .filter(col("l1") <= threshold)
      .select(col("id").as("id1"), col("id2"), col("l1"))
  }
}
