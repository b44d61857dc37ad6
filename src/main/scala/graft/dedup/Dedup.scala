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
    // Repartition before the compute stage: the fixture tables are single
    // row-group parquet (unsplittable scans), and at any scale the hashing
    // stage should spread across the cluster, not run at scan parallelism.
    val par = df.sparkSession.sparkContext.defaultParallelism
    // Cache (id, shingles, base-hash array): the shingle sets feed BOTH the
    // banding self-join (each side) and the Jaccard verify re-joins, and
    // materializing `vms` here keeps the per-shingle md5 from being
    // re-inlined into each of the k permutation lambdas (Catalyst does not
    // CSE across HOF bodies). At cluster scale this is the "signature
    // table" you'd persist between pipeline stages.
    val docs = df.select(
      idCol.as("id"),
      array_distinct(Text.charShingles(textCol, shingleK)).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .repartition(par, col("id"))
      .withColumn("vms", transform(col("shingles"), s => Hashing.md5Mod(s)))
      .cache()

    val rowsPerBand = numHashes / bands
    val banded = docs
      .select(col("id"),
        Hashing.lshBandKeys(
          Hashing.minhashFromBase(col("vms"), numHashes),
          bands, rowsPerBand).as("bandkeys"))
      .select(col("id"), explode(col("bandkeys")).as("bucket"))
      .cache()

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
    val par = df.sparkSession.sparkContext.defaultParallelism
    val docs = df.select(
      idCol.as("id"),
      array_distinct(Text.charShingles(textCol, shingleK)).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .repartition(par, col("id")) // spread shingling beyond scan splits

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
      textCol: Column): DataFrame =
    df.select(idCol.as("id"), textCol.as("text"))
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col("id"))
      .select(col("id"), Hashing.simhash(Text.tokens(col("text"))).as("sh"))
      .groupBy("sh")
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .filter(col("n_dups") > 1)

  /** Re-verify candidate pairs with exact Jaccard over shingle sets. */
  private def verifyJaccard(
      pairs: DataFrame,
      docs: DataFrame,
      threshold: Double): DataFrame =
    pairs
      .join(docs.select(col("id").as("id1"), col("shingles").as("sh1")), "id1")
      .join(docs.select(col("id").as("id2"), col("shingles").as("sh2")), "id2")
      .withColumn("common", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jaccard",
        col("common").cast("double") /
          (size(col("sh1")) + size(col("sh2")) - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
}
