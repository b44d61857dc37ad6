package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-text keyword search over a document corpus: inverted-index
  * statistics (tf / df / dl) + BM25 ranking, as plain aggregations the
  * optimizer can partial-aggregate map-side. The index is not a stored
  * side structure — at pipeline scale the "index build" IS the tf/df
  * aggregation, and persisting it is a caller-side `Stage` decision
  * (q75 pattern) when many query batches amortize it.
  *
  * Scoring is graft's deterministic BM25 variant: the standard
  * Robertson tf saturation (k1 = 1.2, b = 0.75) with the RATIONAL idf
  * `(N - df + 0.5) / (df + 0.5)` — no logarithm, so every term score is
  * an exact integer computation (2^20 fixed point, half-up rounding)
  * and results are bit-identical across engines. Monotonicity in
  * (tf, 1/df) — what the ranking needs — is the same as log-idf BM25
  * for single-term contributions.
  *
  * (Reference analog: none — hadron has no search surface; this serves
  * the LLM-pipeline extension family, like TF-IDF keywords in
  * [[Keywords]].)
  */
object Search {

  /** 2^20 — the repo-wide fixed-point scale (NOTES.md determinism rules). */
  val Scale: Long = 1L << 20

  /** BM25 top-k documents per query.
    *
    * Plan shape, and why it scales: two map-only tokenization passes
    * over the corpus text (one exploding into the tf aggregation, one
    * counting into dl — dl deliberately comes from the docs table so a
    * token-less document still counts in N, at the price of the second
    * pass), with df computed ONLY for query tokens (the tf stream is
    * filtered to the query vocabulary before the df aggregation and
    * the scoring join — a thousand-term query workload shuffles a
    * thousand tokens' postings, not the corpus vocabulary). Queries
    * and per-token df are broadcast; the scored (query, doc) stream
    * collapses through the bounded `topk_by` aggregate, so only k-row
    * partials per partition reach the final exchange — never a
    * corpus-wide rank window.
    *
    * Determinism bounds — the BINDING one is the ranking stage:
    * `topk_by` scores are doubles, so a total score_fp must stay under
    * 2^53 for exact rank order and exact round-trip of the emitted
    * score (per-term scores reach ~(2N/df)·2^20·2.2, so e.g. a
    * 100-term query over a corpus with min df = 1 needs N ≲ 2^24;
    * realistic df keeps it far looser). The integer arithmetic
    * upstream additionally needs `44 · tf · Σdl · 2^21 < 2^63`
    * (tf · Σdl < ~5e16) and `(2N+1) · 2^21 < 2^63`. Shard the corpus
    * (and merge stats) before either bound.
    *
    * @param queries (query_id, terms); terms are deduped — a repeated
    *   query term does not double-count.
    * @return (query_id, doc_id, score_fp, rank) — rank 1-based by
    *   (score_fp desc, doc_id asc), at most k rows per query; documents
    *   sharing no term with the query are absent.
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: Seq[(String, Seq[String])],
      k: Int): DataFrame = {
    require(queries.nonEmpty, "bm25TopK needs at least one query")
    require(k > 0, "k must be positive")
    val s = docs.sparkSession
    import s.implicits._

    val text = lower(coalesce(col(textCol), lit("")))
    val toks = docs.select(
      col(idCol).as("doc_id"), explode(Text.tokens(text)).as("tok"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    // dl comes from the docs table, NOT from tf: a token-less document
    // still counts in N (standard BM25 corpus statistics)
    val dl = docs.select(col(idCol).as("doc_id"),
      Text.tokenCount(text).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), sum("dl").as("sum_dl"))

    val qterms = queries
      .flatMap { case (qid, ts) => ts.distinct.map((qid, _)) }
      .toDF("query_id", "tok")
    val qvocab = queries.flatMap(_._2).distinct
    val tfq = tf.filter(col("tok").isin(qvocab: _*))
    val dfq = tfq.groupBy("tok").agg(count(lit(1)).as("df"))

    val scored = tfq
      .join(broadcast(qterms), Seq("tok"))
      .join(broadcast(dfq), Seq("tok"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      // integer `div` throughout — `/` is double division and loses
      // exactness past 2^53
      .withColumn("idf_fp", expr(
        s"(2 * (2*n - 2*df + 1) * $Scale + (2*df + 1)) div (2 * (2*df + 1))"))
      .withColumn("tfc_fp", expr(
        s"""(2 * (44 * tf * sum_dl) * $Scale
              + (20 * tf * sum_dl + 6 * sum_dl + 18 * dl * n))
            div (2 * (20 * tf * sum_dl + 6 * sum_dl + 18 * dl * n))"""))
      .withColumn("term_fp",
        expr(s"(2 * idf_fp * tfc_fp + $Scale) div (2 * $Scale)"))
      .groupBy("query_id", "doc_id")
      .agg(sum("term_fp").as("score_fp"))

    scored
      .groupBy("query_id")
      .agg(call_function("topk_by",
        col("doc_id"), col("score_fp").cast("double"), lit(k)).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(
        col("query_id"),
        col("col.id").as("doc_id"),
        col("col.score").cast("long").as("score_fp"),
        (col("pos") + 1).cast("long").as("rank"))
  }
}
