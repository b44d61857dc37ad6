package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distinct-count sketching for corpus-scale profiling ("how many
  * distinct urls/domains/fingerprints?") where an exact
  * `count_distinct` would shuffle every distinct value.
  *
  * KMV (k minimum values, Bar-Yossef et al. 2002) rather than
  * HyperLogLog, deliberately: the sketch state is the k smallest
  * md5-derived unit hashes of the DISTINCT values — a pure function of
  * the value set, so the estimate is bit-identical across engines and
  * runs (graft's determinism rule; HLL implementations differ by
  * library and are unverifiable against an independent oracle).
  * Standard error ~ 1/sqrt(k-2): k=1024 gives ~3%.
  */
object Sketch {

  /** Per-thread MessageDigest for executor-side fold closures (object
    * member, so closures reference it statically instead of capturing).
    */
  private val md5Local: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** One-row (n_kept, estimate) distinct-count estimate of `valueCol`.
    *
    * Plan shape: the k smallest hashes ride graft's bounded `topk_by`
    * aggregate (score = -hash, distinct-by-value fold) — every map-side
    * partial holds at most k entries, ONE k-row partial per task
    * reaches the single final combine, and nothing else shuffles. With
    * fewer than k distinct values the sketch holds them all and the
    * estimate is exact; otherwise estimate = (k-1) / u_k with u_k the
    * k-th smallest unit hash.
    */
  /** Exact heavy hitters ("every value occurring >= minCount times")
    * with a count-min sketch doing the scale work.
    *
    * Why not a plain groupBy+HAVING: at corpus scale the group-by
    * shuffles EVERY distinct value (the long tail is the data).
    * Instead: pass 1 folds the stream into a d×w count-min sketch
    * (Cormode & Muthukrishnan 2005) via `treeAggregate` — counter
    * arrays sum elementwise, so the merged sketch is order-independent
    * and deterministic, and the layered combine means the driver
    * receives ONE d×w array, not one per partition (a 1000-executor
    * fleet with a wide sketch would otherwise land gigabytes of
    * partials on the driver). Pass 2 filters the raw stream through
    * the broadcast sketch BEFORE the exact group-by — only occurrences
    * of candidate values reach the exchange. CMS only ever
    * OVER-estimates, so candidates ⊇ true heavy hitters and the exact
    * downstream count + HAVING makes the output exactly the true set —
    * the sketch parameters affect shuffle volume, never results.
    *
    * Hashing: one md5 per value; row j's slot is Kirsch-Mitzenmacher
    * double hashing `(h1 + j·h2) mod w` over the digest's two 8-byte
    * halves — deterministic, no seed state.
    *
    * Sizing — the lever that decides whether the sketch prunes at all:
    * a row's expected collision inflation is ~ total_occurrences /
    * width, so pruning needs `width >> total_occurrences / minCount`
    * (rule of thumb: 10× that ratio). Below it every counter exceeds
    * the threshold and pass 2 degrades to the plain group-by (correct,
    * just unpruned). Depth fights unlucky single-row collisions:
    * P[min over d rows inflates > 2·total/width] ≤ 2^-d per value.
    * False candidates cost shuffle, never correctness.
    *
    * @return (value string, cnt long) — exact counts, all values with
    *   cnt >= minCount.
    */
  def heavyHitters(
      df: DataFrame,
      valueCol: Column,
      minCount: Long,
      depth: Int = 4,
      width: Int = 8192): DataFrame = {
    require(minCount > 0, "minCount must be positive")
    require(depth >= 1 && width >= 2, s"bad sketch shape $depth x $width")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(valueCol.cast("string").as("v"))
      .filter(col("v").isNotNull).as[String]

    // (h1, h2) from the digest's two 8-byte halves; row j's slot is
    // Kirsch-Mitzenmacher (h1 + j·h2) mod width — computed inline in
    // both passes, no per-value allocation. The MessageDigest is cached
    // per thread (treeAggregate's seqOp has no per-partition setup hook).
    val dep = depth
    val wid = width
    val merged = vals.rdd.treeAggregate(new Array[Long](dep * wid))(
      seqOp = { (sk, v) =>
        val d = Sketch.md5Local.get().digest(v.getBytes("UTF-8"))
        val bb = java.nio.ByteBuffer.wrap(d)
        val h1 = bb.getLong(0)
        val h2 = bb.getLong(8) | 1L // odd, so j·h2 walks all residues
        var j = 0
        while (j < dep) {
          sk(j * wid + (((h1 + j * h2) & Long.MaxValue) % wid).toInt) += 1L
          j += 1
        }
        sk
      },
      combOp = { (a, b) =>
        var i = 0
        while (i < a.length) { a(i) += b(i); i += 1 }
        a
      })
    val bc = spark.sparkContext.broadcast(merged)

    val mc = minCount
    val candidates = vals.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val sk = bc.value
      it.filter { v =>
        val d = md.digest(v.getBytes("UTF-8"))
        val bb = java.nio.ByteBuffer.wrap(d)
        val h1 = bb.getLong(0)
        val h2 = bb.getLong(8) | 1L
        var est = Long.MaxValue
        var j = 0
        while (j < dep && est >= mc) {
          val c = sk(j * wid + (((h1 + j * h2) & Long.MaxValue) % wid).toInt)
          if (c < est) est = c
          j += 1
        }
        est >= mc
      }
    }.toDF("value")
    candidates.groupBy("value").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= mc)
  }

  def kmvDistinct(
      df: DataFrame,
      valueCol: Column,
      k: Int = 1024,
      salt: String = "kmv"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.select(valueCol.cast("string").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("score", -Sampling.unitHash(col("v"), salt))
      .agg(call_function("topk_by", col("v"), col("score"), lit(k)).as("top"))
      .select(kmvEstimate(k): _*)
  }

  /** Per-group [[kmvDistinct]]: one KMV sketch per key of `groupCols`,
    * in a single aggregation — the "distinct users per segment" report
    * at corpus scale. Exactly the global sketch's plan with a grouped
    * `topk_by` (map-side k-bounded partials per group), so the shuffle
    * carries at most k hashes per (partition, group), never the
    * groups' distinct-value streams.
    *
    * @return groupCols ++ (n_kept, estimate) — same estimate contract
    *   as [[kmvDistinct]] (exact below k) per group.
    */
  def kmvDistinctByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: Column,
      k: Int = 1024,
      salt: String = "kmv"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    require(groupCols.nonEmpty,
      "use kmvDistinct for the ungrouped sketch")
    df.select(groupCols.map(col) :+ valueCol.cast("string").as("v"): _*)
      .filter(col("v").isNotNull)
      .withColumn("score", -Sampling.unitHash(col("v"), salt))
      .groupBy(groupCols.map(col): _*)
      .agg(call_function("topk_by", col("v"), col("score"), lit(k)).as("top"))
      .select(groupCols.map(col) ++ kmvEstimate(k): _*)
  }

  /** Top-k most frequent values per group — "top domains per language"
    * — as two bounded aggregations: exact (group, value) counts
    * (map-side combined), then the k best per group through `topk_by`
    * (score = count, ties broken value-ascending inside the aggregate,
    * so results are deterministic without a rank-window shuffle of the
    * whole count table). For a long-tailed value column at corpus
    * scale, compose with [[heavyHitters]] first to prune the tail
    * before the per-group count.
    *
    * @return groupCols ++ (value string, cnt long, rank long 1-based)
    */
  def topKByGroup(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: Column,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    require(groupCols.nonEmpty, "topKByGroup needs group columns")
    df.select(groupCols.map(col) :+ valueCol.cast("string").as("v"): _*)
      .filter(col("v").isNotNull)
      .groupBy(groupCols.map(col) :+ col("v"): _*)
      .agg(count(lit(1)).as("cnt"))
      .groupBy(groupCols.map(col): _*)
      .agg(call_function("topk_by",
        col("v"), col("cnt").cast("double"), lit(k)).as("top"))
      .select(groupCols.map(col) :+ posexplode(col("top")): _*)
      .select(groupCols.map(col) ++ Seq(
        col("col.id").as("value"),
        col("col.score").cast("long").as("cnt"),
        (col("pos") + 1).cast("long").as("rank")): _*)
  }

  /** The (n_kept, estimate) tail shared by both sketch forms: exact
    * below k, else (k-1)/u_k with u_k the k-th smallest unit hash.
    */
  private[graft] def kmvEstimate(k: Int): Seq[Column] = Seq(
    size(col("top")).cast("long").as("n_kept"),
    when(size(col("top")) < k, size(col("top")).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        -element_at(col("top"), k).getField("score"))
      .as("estimate"))

  /** KMV set algebra: distinct-count estimates for two value sets, their
    * union AND their intersection, from one bounded sketch per side —
    * the "how many users did both" / "how much does corpus B overlap
    * corpus A" question without shuffling either distinct stream.
    *
    * Mergeability is KMV's point (Bar-Yossef et al. 2002): the k
    * smallest hashes of A ∪ B are computable from the two k-min
    * sketches alone, and the standard intersection estimator counts
    * the union sketch's members that occur in BOTH sides:
    * ρ = |S_∪ ∩ A ∩ B| / k, est_∩ = ρ·est_∪. When the union holds
    * fewer than k distinct values both sketches are complete and every
    * figure is EXACT. Same determinism contract as [[kmvDistinct]]:
    * everything is a pure function of the value sets (md5 unit hashes,
    * (u asc, value asc) total order), so an oracle replays it.
    *
    * Plan shape: one bounded `topk_by` aggregation per side (map-side
    * k-bounded partials), then a 1-row × 1-row crossJoin evaluated
    * with array expressions — no further shuffle, nothing driver-side.
    *
    * Output, one row: (n_a, n_b, est_a, est_b, n_shared, est_union,
    * est_intersect).
    */
  def kmvSetOps(
      dfA: DataFrame,
      valueA: Column,
      dfB: DataFrame,
      valueB: Column,
      k: Int = 1024,
      salt: String = "kmv"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    def side(df: DataFrame, v: Column, name: String): DataFrame =
      df.select(v.cast("string").as("v"))
        .filter(col("v").isNotNull)
        .withColumn("score", -Sampling.unitHash(col("v"), salt))
        .agg(call_function("topk_by", col("v"), col("score"), lit(k))
          .as(name))
    val joined = side(dfA, valueA, "ta").crossJoin(side(dfB, valueB, "tb"))
    // (u asc, v asc) structs so array_sort orders exactly like topk_by
    def uv(c: Column): Column = transform(c, x =>
      struct((-x.getField("score")).as("u"), x.getField("id").as("v")))
    def vals(c: Column): Column = transform(c, _.getField("id"))
    joined
      .withColumn("uni",
        slice(array_sort(array_distinct(
          concat(uv(col("ta")), uv(col("tb"))))), 1, k))
      .withColumn("n_uni", size(col("uni")))
      .withColumn("shared", filter(col("uni"), x =>
        array_contains(vals(col("ta")), x.getField("v")) &&
          array_contains(vals(col("tb")), x.getField("v"))))
      .select(
        size(col("ta")).cast("long").as("n_a"),
        size(col("tb")).cast("long").as("n_b"),
        estOf(col("ta"), k).as("est_a"),
        estOf(col("tb"), k).as("est_b"),
        size(col("shared")).cast("long").as("n_shared"),
        when(col("n_uni") < k, col("n_uni").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            element_at(col("uni"), k).getField("u")).as("est_union"),
        when(col("n_uni") < k, size(col("shared")).cast("double"))
          .otherwise(size(col("shared")).cast("double") / k *
            (lit((k - 1).toDouble) /
              element_at(col("uni"), k).getField("u")))
          .as("est_intersect"))
  }

  private def estOf(top: Column, k: Int): Column =
    when(size(top) < k, size(top).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        -element_at(top, k).getField("score"))
}
