package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction over a document corpus — the standard
  * "what is this document about" signal a training-data pipeline uses
  * for topic filtering, domain tagging and mixture construction.
  *
  * The idf here is the LINEAR variant (N+1)/(df+1), not log((N+1)/(df+1)):
  * ranking per document is what matters, the linear form preserves the
  * df-ordering of the log form for fixed tf, and — the deciding reason —
  * it is an exact IEEE quotient of two small integers, so scores are
  * bit-identical in any engine (log's last-ulp behavior is libm-specific,
  * which would break hash-exact verification; the repo's determinism
  * rule, NOTES.md).
  */
object Keywords {

  /** Top-k terms per document by tf * (N+1)/(df+1).
    *
    * Plan shape at corpus scale: token explode feeds ONE wide grouping
    * shuffle keyed (id, term) for tf (map-side combined); document
    * frequencies aggregate from the tf rows (narrow, vocab-sized) and
    * BROADCAST back (vocabulary ≪ corpus — set `broadcastVocab` false
    * to shuffle-join when it is not); the per-doc ranking is `topk_by`'s
    * bounded aggregate, so partials carry at most k terms per (task,
    * doc) into the final narrow shuffle. N rides a 1-row broadcast
    * cross join — no separate driver action.
    *
    * @return (id, term, score, rank) — rank by (score desc, term asc)
    */
  def tfidfTopTerms(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      k: Int = 5,
      broadcastVocab: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val tf = df
      .select(idCol.as("id"),
        explode(Text.tokens(textCol.cast("string"))).as("term"))
      .groupBy("id", "term")
      .agg(count(lit(1)).as("tf"))
    // tf rows are distinct (id, term) pairs, so counting them per term
    // IS the document frequency — no second pass over the token stream.
    // count(when(tf > 0, 1)), NOT count(1): the values are identical
    // (tf >= 1 by construction), but count(1) lets the optimizer prune
    // the tf column and rewrite this consumer's copy of the aggregate
    // into a distinct-only shape — a DIFFERENT subtree below the
    // (id, term) exchange, which kills exchange reuse and runs the token
    // explode + shuffle TWICE (a plain count(tf) gets normalized back to
    // count(1) for never-null columns, so the dependency must be one
    // Catalyst cannot see through). KeywordsSpec pins the reuse.
    val dfreq0 = tf.groupBy("term")
      .agg(count(when(col("tf") > 0, 1)).as("df"))
    val dfreq = if (broadcastVocab) broadcast(dfreq0) else dfreq0
    val n = broadcast(df.agg(count_distinct(idCol).as("n")))
    tf.join(dfreq, "term")
      .crossJoin(n)
      .withColumn("score",
        col("tf").cast("double") *
          ((col("n") + 1).cast("double") / (col("df") + 1).cast("double")))
      .groupBy("id")
      .agg(call_function("topk_by", col("term"), col("score"), lit(k))
        .as("top"))
      .select(col("id"), posexplode(col("top")))
      .select(
        col("id"),
        col("col.id").as("term"),
        col("col.score").as("score"),
        (col("pos") + 1).as("rank"))
  }
}
