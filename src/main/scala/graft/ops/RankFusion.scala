package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal rank fusion (Cormack, Clarke & Buettcher 2009) — the
  * standard way to combine rankings from incomparable scorers (BM25
  * keyword scores and embedding cosines live on different scales;
  * their RANKS are always comparable):
  *
  *   rrf(d) = Σ over rankings of 1 / (kk + rank_r(d))
  *
  * kept exact as floor(2^20 / (kk + rank)) per source and an integer
  * sum — bit-identical across engines (the fixed-point discipline;
  * an oracle replays it with integer division). An item missing from
  * a source simply contributes nothing. kk=60 is the published
  * constant: it damps the head so one scorer's #1 cannot drown the
  * other's consensus.
  *
  * Scale shape: a unionByName of the (qid, id, rank) rankings — each
  * already small (top-N per query per source), one map-side-combined
  * groupBy to sum contributions, then the bounded `topk_by` aggregate
  * per query (map-side k-heaps, no rank window, no global sort).
  */
object RankFusion {

  val Scale: Long = 1L << 20

  /** Fuse rankings, each with columns (qid, id, rank) and rank
    * starting at 1. Output: (qid, id, rrf_fx, rank) — the k best per
    * qid by (rrf_fx desc, id asc).
    */
  def rrfTopK(
      rankings: Seq[DataFrame],
      kk: Int = 60,
      k: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfTopK needs at least one ranking")
    require(kk >= 0, s"kk must be non-negative, got $kk")
    require(k >= 1, s"k must be positive, got $k")
    val u = rankings
      .map(_.select(col("qid"), col("id"), col("rank")))
      .reduce(_ unionByName _)
    u.select(col("qid"), col("id"),
        expr(s"${Scale}L div (${kk}L + cast(rank as bigint))")
          .as("contrib"))
      .groupBy("qid", "id")
      .agg(sum(col("contrib")).as("rrf_fx"))
      .groupBy("qid")
      .agg(call_function("topk_by",
        struct(col("id"), col("rrf_fx")),
        col("rrf_fx").cast("double"), lit(k)).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id.id").as("id"),
        col("col.id.rrf_fx").as("rrf_fx"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Extrapolated rank-biased overlap, RBO_EXT@D (Webber, Moffat &
    * Zobel 2010 eq. 32), as an EXACT integer fraction — the
    * order-sensitive agreement measure between two rankings of the
    * same queries that recall@k cannot provide (recall@k treats the
    * top-k as a SET; two retrievers with identical recall can order
    * the head oppositely, and the head is what a consumer reads):
    *
    *   RBO@D = (1−p) · Σ_{d=1..D} p^(d−1) · X_d / d  +  p^D · X_D / D
    *
    * where X_d = |A_{1..d} ∩ B_{1..d}| and persistence p = pNum/pDen
    * (rational BY CONSTRUCTION — the standard p = 0.9 is 9/10). The
    * trailing term extrapolates the agreement at depth D over the
    * unseen tail, which is what makes identical rankings score
    * EXACTLY 1 (the truncated sum alone tops out at 1 − p^D). Every
    * term is exact: the common denominator pDen^D · lcm(1..D) clears
    * all the fractions, so the output is the integer pair (rbo_num,
    * rbo_den) with RBO = num/den, division left to the consumer's
    * float space (the assortativity/cohenKappa discipline — engines
    * diverge only in division, so don't divide). Identical rankings
    * yield num = den exactly (spec-pinned).
    *
    * Rankings use the [[rrfTopK]] contract: columns (qid, id, rank),
    * rank 1-based. Rows past `depth` are ignored; a query present in
    * only one ranking gets overlap 0 at every d (its row still
    * emits — silence would hide a retriever that returned nothing).
    * Truncated-prefix semantics: if a list is shorter than `depth`,
    * overlaps use the available prefix (the bounded-output grading
    * case; RBO's extrapolated tail is a reporting convention this
    * exact form deliberately omits).
    *
    * Shape: per side ONE capped grouped collect of ≤ depth (rank, id)
    * structs (bounded buffers), one equi-join on qid, then the Σ as a
    * literal unrolled sum of `depth` array_intersect terms — map-only,
    * codegen'd, no per-depth shuffle.
    *
    * @return (qid, rbo_num, rbo_den) one row per qid in either input
    */
  def rboExact(
      a: DataFrame,
      b: DataFrame,
      depth: Int = 10,
      pNum: Int = 9,
      pDen: Int = 10): DataFrame = {
    require(depth >= 1 && depth <= 16,
      s"depth must be in [1, 16] (exact long arithmetic), got $depth")
    require(pNum >= 1 && pNum < pDen,
      s"persistence must satisfy 1 <= pNum < pDen, got $pNum/$pDen")
    require(pDen <= 16, s"pDen must be <= 16, got $pDen")
    def lcm(x: Long, y: Long): Long = x / gcd(x, y) * y
    def gcd(x: Long, y: Long): Long = if (y == 0) x else gcd(y, x % y)
    val l = (1L to depth.toLong).reduce(lcm)
    // num_d = (pDen−pNum)·pNum^(d−1)·pDen^(D−d)·(L/d); den = pDen^D·L.
    // Bounds: pDen ≤ 16, D ≤ 16 ⇒ pDen^D ≤ 2^64... too lax — guard by
    // computing in Math.*Exact so an overflowing (depth, p) pair is a
    // loud error at PLAN BUILD, not wrapped arithmetic at runtime.
    def powExact(base: Long, e: Int): Long =
      (1 to e).foldLeft(1L)((acc, _) => Math.multiplyExact(acc, base))
    val den = Math.multiplyExact(powExact(pDen.toLong, depth), l)
    val coef = (1 to depth).map { d =>
      val base = Math.multiplyExact(
        Math.multiplyExact((pDen - pNum).toLong,
          powExact(pNum.toLong, d - 1)),
        Math.multiplyExact(powExact(pDen.toLong, depth - d), l / d))
      // extrapolation term p^D·X_D/D folds into the depth-D coefficient
      if (d == depth)
        Math.addExact(base,
          Math.multiplyExact(powExact(pNum.toLong, depth), l / depth))
      else base
    }
    def side(df: DataFrame, out: String): DataFrame =
      df.filter(col("rank") <= depth)
        .groupBy("qid")
        .agg(transform(
          array_sort(call_function("collect_list_capped",
            struct(col("rank"), col("id")), lit(depth))),
          e => e("id")).as(out))
    val sa = side(a, "a_ids")
    val sb = side(b, "b_ids")
    val joined = sa.join(sb, Seq("qid"), "full_outer")
      .withColumn("a_ids",
        coalesce(col("a_ids"), array().cast(sa.schema("a_ids").dataType)))
      .withColumn("b_ids",
        coalesce(col("b_ids"), array().cast(sb.schema("b_ids").dataType)))
    val num = (1 to depth).map { d =>
      lit(coef(d - 1)) *
        size(array_intersect(
          slice(col("a_ids"), 1, d), slice(col("b_ids"), 1, d)))
          .cast("long")
    }.reduce(_ + _)
    joined.select(col("qid"), num.as("rbo_num"), lit(den).as("rbo_den"))
  }

  /** EXACT fixed-point nDCG@k per query — the graded-relevance
    * retrieval metric (Järvelin & Kekäläinen 2002) the binary
    * recall@k/RBO family can't express: a ranker that puts the
    * 3-graded doc at rank 1 must beat one that buries it at rank 10
    * under equal recall. Kept exact (the q84/q179 discipline) so the
    * oracle replays bit-for-bit:
    *
    *   disc(i)  = 2^40 div ilog2Fx(i+1)      (2^20-scaled 1/log2(i+1);
    *              disc(1) = 2^20 exactly)
    *   dcg_fx   = Σ_{rank i ≤ k} rel_i · disc(i)
    *   idcg_fx  = the same sum over the query's grades sorted desc
    *   ndcg_fx  = dcg_fx·2^20 div idcg_fx    (0 when idcg = 0)
    *
    * Linear gains (not 2^rel−1): grades stay small integers and the
    * sums exact; callers wanting exponential gain pre-map the grade
    * column. System ranking = (score desc, doc asc) — a total order,
    * so ties cannot flip ranks between engines; the ideal ranking's
    * tie order is irrelevant (equal grades contribute equal sums
    * under any permutation). Grades must be in [0, 2^13) — loud: it
    * keeps dcg_fx ≤ grade·2^20·k < 2^43, so the final ·2^20 division
    * stays inside a long with headroom (graded relevance in practice
    * is 0-10).
    *
    * Shape: ONE exchange on the query key; both row_number windows
    * (system + ideal) ride it as two in-partition sorts; the ≤ k
    * discount dictionary is driver-built from the pure ilog2Fx kernel
    * (no job) and broadcast twice; one map-side-combined final
    * aggregation. Grouping supplies the parallelism (q164
    * discipline) — no corpus-wide sort anywhere.
    *
    * @return (qid, n_docs, dcg_fx, idcg_fx, ndcg_fx)
    */
  def ndcgAtK(
      df: DataFrame,
      queryCol: org.apache.spark.sql.Column,
      docCol: org.apache.spark.sql.Column,
      scoreCol: org.apache.spark.sql.Column,
      relCol: org.apache.spark.sql.Column,
      k: Int = 10): DataFrame = {
    require(k >= 1 && k <= 1000, s"k must be in [1, 1000], got $k")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val disc = (1 to k)
      .map(i => (i.toLong,
        (1L << 40) / graft.functions.Dsir.ilog2Fx(i + 1L)))
      .toDF("__rank", "__disc")
    val base = df.select(queryCol.as("qid"), docCol.as("doc"),
        scoreCol.cast("long").as("s"), relCol.cast("long").as("rel"))
      .filter(col("qid").isNotNull && col("doc").isNotNull &&
        col("s").isNotNull && col("rel").isNotNull)
      .withColumn("rel",
        when(col("rel") >= 0 && col("rel") < lit(1L << 13), col("rel"))
          .otherwise(raise_error(concat(
            lit("ndcgAtK grades must be in [0, 2^13), got "),
            col("rel")))))
    val sys = Window.partitionBy("qid")
      .orderBy(col("s").desc, col("doc").asc)
    val ideal = Window.partitionBy("qid")
      .orderBy(col("rel").desc, col("s").desc, col("doc").asc)
    base
      .withColumn("r", row_number().over(sys))
      .withColumn("ir", row_number().over(ideal))
      .join(broadcast(disc.withColumnRenamed("__rank", "r")
        .withColumnRenamed("__disc", "__dr")), Seq("r"), "left")
      .join(broadcast(disc.withColumnRenamed("__rank", "ir")
        .withColumnRenamed("__disc", "__di")), Seq("ir"), "left")
      .groupBy("qid")
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(when(col("r") <= k, col("rel") * col("__dr"))),
          lit(0L)).as("dcg_fx"),
        coalesce(sum(when(col("ir") <= k, col("rel") * col("__di"))),
          lit(0L)).as("idcg_fx"))
      .select(col("qid"), col("n_docs"), col("dcg_fx"), col("idcg_fx"),
        expr("CASE WHEN idcg_fx > 0 THEN (dcg_fx * 1048576L) div idcg_fx " +
          "ELSE 0L END").as("ndcg_fx"))
  }
}
