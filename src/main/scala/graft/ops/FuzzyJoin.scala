package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked edit-distance self-join — entity resolution over a string
  * key (near-identical names, one-typo ids, title linkage). The
  * classic q-gram blocking scheme (Gravano et al. 2001): candidate
  * pairs must share at least one character n-gram whose corpus
  * document frequency lies in [2, maxDf]; candidates are then scored
  * with exact Levenshtein distance and kept at `maxDist`.
  *
  * Semantics are the BLOCKED contract, deterministically replayable:
  * emitted = { (a < b) sharing ≥1 kept gram, levenshtein ≤ maxDist }.
  * The df window is both the scale lever and part of the definition —
  * grams rarer than 2 cannot form pairs, grams more common than
  * `maxDf` are stop-grams (for 2-grams, "er"-style pairs that would
  * hub every row together). Recall note: an edit touches at most
  * `gramLen` grams, so same-length strings of length L at distance d
  * still share ≥ L−1−(gramLen·d+gramLen−1) gram OCCURRENCES — misses
  * happen only when all shared grams fall outside the df window
  * (documented, and exactly mirrored by the oracle).
  *
  * Scale shape: per-gram posting lists are collected AFTER the df
  * filter, so every list is ≤ maxDf ids and per-gram pair expansion is
  * ≤ maxDf² — bucketed, never all-pairs (the MinHash-LSH discipline).
  * One grouping shuffle for dfs, one for postings, one distinct over
  * candidate pairs; the string-resolve joins are plain equi-joins AQE
  * can broadcast when the table is small. Levenshtein runs once per
  * CANDIDATE, not per pair of rows.
  */
object FuzzyJoin {

  /** Output: (ia, ib, dist) with ia < b under the id's ordering. */
  def editDistancePairs(
      df: DataFrame,
      id: Column,
      str: Column,
      maxDist: Int,
      maxDf: Int,
      gramLen: Int = 2): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(maxDf >= 2, s"maxDf must be >= 2, got $maxDf")
    require(gramLen >= 1, s"gramLen must be >= 1, got $gramLen")
    val p = df.select(id.as("id"), str.cast("string").as("s"))
      .filter(col("s").isNotNull && length(col("s")) >= gramLen)
    val grams = p.select(col("id"), explode(array_distinct(
        transform(sequence(lit(1), length(col("s")) - (gramLen - 1)),
          i => col("s").substr(i, lit(gramLen))))).as("g"))
    val keep = grams.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select("g")
    val postings = grams.join(keep, Seq("g"))
      .groupBy("g").agg(sort_array(collect_list(col("id"))).as("ids"))
    val cand = postings.select(explode(flatten(transform(col("ids"), a =>
        transform(filter(col("ids"), b => b > a),
          b => struct(a.as("ia"), b.as("ib")))))).as("pr"))
      .select(col("pr.ia").as("ia"), col("pr.ib").as("ib"))
      .distinct()
    cand
      .join(p.select(col("id").as("ia"), col("s").as("sa")), Seq("ia"))
      .join(p.select(col("id").as("ib"), col("s").as("sb")), Seq("ib"))
      .select(col("ia"), col("ib"),
        levenshtein(col("sa"), col("sb")).as("dist"))
      .filter(col("dist") <= maxDist)
  }
}
