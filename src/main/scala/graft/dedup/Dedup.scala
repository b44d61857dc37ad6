package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Hashing, Text}

/** Document-deduplication operators for training-data pipelines. All are
  * relational plans (scan → project → shuffle-on-key → join), so they
  * scale by partitioning on the dedup key: at 100 TB the cost profile is
  * one scan plus one shuffle of (key, id) pairs, never a driver
  * materialization or an O(n²) comparison.
  *
  * Conventions: `idCol` is a unique document id; "keep" = the minimum id in
  * a duplicate group (deterministic winner).
  */
object Dedup {

  /** Shingle + base-hash kernel as a typed per-partition map.
    *
    * The Column formulation (Text.charShingles + Hashing.md5Mod inside
    * nested `transform`s) is semantically identical but runs interpreted —
    * Spark does not codegen lambda bodies of higher-order functions, and
    * profiling showed ~29 ms/document of expression-tree overhead. This
    * kernel does the same work in ~0.1 ms/doc. Equivalence with the
    * Column version is asserted by DedupKernelSpec.
    *
    * Output schema: (id <input type>, shingles array<string>,
    * vms array<bigint>) — vms(i) = md5Mod(shingles(i)).
    */
  private[graft] def shingleDocs(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      k: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val par = df.sparkSession.sparkContext.defaultParallelism
    val base = df.select(idCol.as("id"), textCol.cast("string").as("__text"))
      .repartition(par, col("id")) // kernel runs post-exchange, not at scan parallelism
    val schema = StructType(Seq(
      base.schema("id"),
      StructField("shingles", ArrayType(StringType, false), false),
      StructField("vms", ArrayType(LongType, false), false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    base.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        val text = r.getString(1)
        if (text == null || text.length < k) Iterator.empty
        else {
          val seen = new java.util.LinkedHashSet[String]()
          var i = 0
          while (i <= text.length - k) { seen.add(text.substring(i, i + k)); i += 1 }
          val shingles = new Array[String](seen.size)
          // vms deduped: downstream jaccard runs on the hashed-shingle SET,
          // so both engines see identical (collision-folded) sets
          val vmSet = new java.util.LinkedHashSet[java.lang.Long]()
          val it = seen.iterator(); var j = 0
          while (it.hasNext) {
            val s = it.next(); shingles(j) = s
            val d = md.digest(s.getBytes("UTF-8"))
            // first 15 hex digits = unsigned top 8 bytes >>> 4 (60 bits)
            val v = java.nio.ByteBuffer.wrap(d, 0, 8).getLong >>> 4
            vmSet.add(v % Hashing.MinhashP)
            j += 1
          }
          val vms = new Array[Long](vmSet.size)
          val vit = vmSet.iterator(); var jj = 0
          while (vit.hasNext) { vms(jj) = vit.next(); jj += 1 }
          Iterator(org.apache.spark.sql.Row(r.get(0),
            shingles.toIndexedSeq, vms.toIndexedSeq))
        }
      }
    }(enc)
  }

  /** Exact dedup via content hash: one row per distinct content with the
    * kept id and the duplicate count. groupBy on a 128-bit hash instead of
    * the full text keeps shuffle rows narrow (16 B + id vs whole documents).
    */
  def exact(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.groupBy(Hashing.md5Hex(textCol).as("content_hash"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Near-exact dedup on the normalized fingerprint (case/whitespace/punct
    * folded) — catches trivially-mutated copies exact dedup misses.
    */
  def fingerprint(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.groupBy(Text.fingerprint(textCol).as("fp"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_dups"))

  /** MinHash + LSH near-duplicate candidate pairs.
    *
    * Plan shape (the standard web-scale pipeline):
    *   shingle → k-min-hash signature → band keys → explode(bands) →
    *   self-join on band key (id1 < id2) → distinct pairs → exact-Jaccard
    *   verify on the shingle sets of surviving candidates.
    *
    * Scale notes: the explode emits `bands` rows per doc (narrow: band key
    * + id), the self-join shuffles on band key, and the verify re-joins
    * only candidate ids back to shingle sets — so the quadratic blowup is
    * confined to real near-duplicate buckets. Giant buckets (boilerplate
    * pages) should be capped upstream via a bucket-size filter.
    *
    * @return (id1, id2, jaccard) for candidate pairs with jaccard >= threshold
    */
  def minhashLsh(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      shingleK: Int = 8,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5,
      maxBucketSize: Int = 1000): DataFrame = {
    // Cache (id, hashed-shingle set): feeds BOTH the banding self-join
    // (each side) and the Jaccard verify re-joins. Only the compact long
    // array ships through the joins — the string shingles are never needed
    // again after hashing. At cluster scale this is the "signature table"
    // you'd persist between pipeline stages.
    val docs = shingleDocs(df, idCol, textCol, shingleK)
      .select(col("id"), col("vms")).cache()

    val rowsPerBand = numHashes / bands
    // signature + band keys as a typed kernel (same rationale as
    // shingleDocs: HOF lambdas don't codegen; this loop is the hot path)
    val banded = {
      import org.apache.spark.sql.types._
      val in = docs.select(col("id"), col("vms"))
      val schema = StructType(Seq(
        in.schema("id"), StructField("bucket", StringType, false)))
      val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
        .encoderFor(schema)
      in.mapPartitions { rows =>
        rows.flatMap { r =>
          val vms = r.getSeq[Long](1)
          val sig = new Array[Long](numHashes)
          var i = 0
          while (i < numHashes) {
            var min = Long.MaxValue
            val it = vms.iterator
            while (it.hasNext) {
              val v = it.next()
              val h = (v * (i + 1) + 40503L * i) % Hashing.MinhashP
              if (h < min) min = h
            }
            sig(i) = min; i += 1
          }
          (0 until bands).iterator.map { b =>
            val sb = new StringBuilder().append(b).append('|')
            var j = b * rowsPerBand
            val end = j + rowsPerBand
            while (j < end) {
              if (j > b * rowsPerBand) sb.append(',')
              sb.append(sig(j)); j += 1
            }
            org.apache.spark.sql.Row(r.get(0), sb.toString)
          }
        }
      }(enc).cache()
    }

    // Cap pathological buckets (boilerplate): aggregate bucket sizes (small
    // result, broadcast-joinable) rather than a window over the full table.
    val bucketed =
      if (maxBucketSize == Int.MaxValue) banded
      else {
        val ok = banded.groupBy("bucket").agg(count(lit(1)).as("bsize"))
          .filter(col("bsize") <= maxBucketSize)
          .select("bucket")
        banded.join(broadcast(ok), Seq("bucket"), "left_semi")
      }

    val pairs = bucketed.as("a")
      .join(bucketed.as("b"), col("a.bucket") === col("b.bucket") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()

    verifyJaccard(pairs, docs, threshold)
  }

  /** Exact n-gram Jaccard dedup via inverted index (no LSH approximation):
    * doc→distinct shingles → explode → self-join on shingle → common counts
    * → jaccard = common / (|a| + |b| − common). The `minDf`/`maxDf` filter
    * drops ubiquitous shingles so the inverted-index join doesn't explode
    * on stop-shingles — the standard trick that keeps this near-linear.
    */
  def ngramJaccard(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      shingleK: Int = 8,
      threshold: Double = 0.5,
      maxDf: Int = 500): DataFrame = {
    val docs = shingleDocs(df, idCol, textCol, shingleK)

    val posting = docs
      .select(col("id"), explode(col("shingles")).as("sh"))
    val rare = posting.groupBy("sh").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("sh")
    // cached: reused by the pair self-join (both sides) and the size table
    val filtered = posting.join(rare, "sh").cache()
    // Jaccard over the df-FILTERED shingle space (sizes from `filtered`,
    // not the raw sets) — self-consistent after dropping stop-shingles.
    val sizes = filtered.groupBy("id").agg(count(lit(1)).as("nsh"))

    val common = filtered.as("a")
      .join(filtered.as("b"),
        col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"))
      .agg(count(lit(1)).as("common"))

    common
      .join(sizes.withColumnRenamed("id", "id1")
        .withColumnRenamed("nsh", "n1"), "id1")
      .join(sizes.withColumnRenamed("id", "id2")
        .withColumnRenamed("nsh", "n2"), "id2")
      .withColumn("jaccard",
        col("common").cast("double") / (col("n1") + col("n2") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  /** SimHash near-dup: docs whose 32-bit simhash match exactly (tight
    * near-dup band). For a wider radius, group on rotations/bands of the
    * simhash and verify hamming distance <= maxHamming.
    */
  def simhashGroups(
      df: DataFrame,
      idCol: Column,
      textCol: Column): DataFrame = {
    import org.apache.spark.sql.types._
    val base = df.select(idCol.as("id"), textCol.cast("string").as("__text"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("id"))
    val schema = StructType(Seq(
      base.schema("id"), StructField("sh", LongType, false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    // typed kernel for the same reason as shingleDocs: the Column simhash
    // (Hashing.simhash) runs interpreted inside HOF lambdas. Identical
    // output: per-token md5 -> 32-bit value -> majority vote per bit.
    base.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val text = r.getString(1)
        val toks =
          if (text == null) Array.empty[String]
          else text.split("\\s+").filter(_.nonEmpty)
        val counts = new Array[Int](32)
        toks.foreach { t =>
          val d = md.digest(t.getBytes("UTF-8"))
          val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          var b = 0
          while (b < 32) { counts(b) += ((v >>> (31 - b)) & 1L).toInt; b += 1 }
        }
        var sh = 0L
        if (toks.nonEmpty) {
          var b = 0
          while (b < 32) {
            if (2 * counts(b) >= toks.length) sh += 1L << (31 - b)
            b += 1
          }
        }
        org.apache.spark.sql.Row(r.get(0), sh)
      }
    }(enc)
      .groupBy("sh")
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .filter(col("n_dups") > 1)
  }

  /** Re-verify candidate pairs with exact Jaccard over the hashed-shingle
    * sets (deterministic: both sides of the oracle fold hash collisions
    * identically; at P=1e9+7 the set-jaccard is indistinguishable from
    * string-shingle jaccard in practice).
    */
  private def verifyJaccard(
      pairs: DataFrame,
      docs: DataFrame,
      threshold: Double): DataFrame =
    pairs
      .join(docs.select(col("id").as("id1"), col("vms").as("sh1")), "id1")
      .join(docs.select(col("id").as("id2"), col("vms").as("sh2")), "id2")
      .withColumn("common", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jaccard",
        col("common").cast("double") /
          (size(col("sh1")) + size(col("sh2")) - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
}
