package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{Hashing, Vectors}

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Two paths:
  *
  *  - `bruteForceTopK`: exact cosine top-k, query-side broadcast. The
  *    baseline and the verifier for the approximate path. Scales linearly
  *    in corpus size — correct choice when |queries| is small (the common
  *    "probe a 100 TB corpus with a few thousand queries" shape).
  *  - `lshTopK`: sign-random-projection (hyperplane) LSH — corpus and
  *    queries bucketed by an m-bit signature; candidates = same-bucket
  *    pairs (multi-probe over `tables` independent signatures); exact
  *    re-rank within candidates. Sub-linear per query at scale; planes are
  *    derived deterministically from md5, so no fit/driver state and runs
  *    are reproducible across clusters.
  */
object Similarity {

  /** Exact cosine top-k for each query vector.
    * @param corpus  (idCol, vecCol) table — the big side
    * @param queries (idCol, vecCol) table — the small side (broadcast)
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism,
        col("corpus_id")) // spread the dot-product stage beyond scan splits
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("corpus_id"))
      .withColumn("sim", Vectors.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("corpus_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "sim", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for (table, plane,
    * dim): md5-derived value mapped into [-1, 1). Pure expression — the
    * "model" needs no storage and every executor computes it identically.
    */
  private def planeComponent(table: Int, plane: Column, dim: Column): Column = {
    val h = md5(concat(lit(s"t$table:p"), plane.cast("string"),
      lit(":d"), dim.cast("string")).cast("binary"))
    // first 8 hex chars -> uniform int in [0, 16^8) -> [-1, 1)
    val v = conv(substring(h, 1, 8), 16, 10).cast("double")
    v / lit(math.pow(16, 8) / 2.0) - 1.0
  }

  /** m-bit sign signature of a vector under table t's hyperplanes. */
  private def signature(vec: Column, t: Int, bits: Int): Column =
    concat_ws("", (0 until bits).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(t, lit(p), i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit("1")).otherwise(lit("0"))
    }: _*)

  /** LSH ANN: bucket by signature across `tables` independent tables,
    * union candidates, exact cosine re-rank, top-k.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      bits: Int = 12, tables: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))

    val cBuckets = (0 until tables).map { t =>
      c.select(col("corpus_id"), col("cv"),
        concat(lit(s"$t|"), signature(col("cv"), t, bits)).as("bucket"))
    }.reduce(_ union _)
    val qBuckets = (0 until tables).map { t =>
      q.select(col("query_id"), col("qv"),
        concat(lit(s"$t|"), signature(col("qv"), t, bits)).as("bucket"))
    }.reduce(_ union _)

    val candidates = cBuckets
      .join(broadcast(qBuckets), Seq("bucket"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select("query_id", "qv", "corpus_id", "cv")
      .distinct()

    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("corpus_id").asc)
    candidates
      .withColumn("sim", Vectors.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "sim", "rank")
  }
}
