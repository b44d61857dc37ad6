package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer — the REAL vocabulary behind
  * `Text.subwordTokens`' regex proxy. Standard BPE (Sennrich et al.
  * 2016): training learns a ranked merge list from corpus statistics;
  * tokenization applies merges greedily by rank.
  *
  * Spark-first split of the work, following the classic observation
  * that BPE trains on the WORD-FREQUENCY DICT, not the corpus:
  *
  *  - `train`: ONE distributed shuffle builds (word, count); the dict
  *    (vocabulary-sized, ≪ corpus — cap `maxVocabWords` bounds the
  *    collect explicitly) comes to the driver, and the merge loop runs
  *    there over the dict only — the corpus is never touched again.
  *    This is the bounded-collect idiom (IVF centroids, Prefix
  *    offsets): the dict IS the sufficient statistic for BPE. The loop
  *    is the INCREMENTAL formulation: pair counts build once, then
  *    each merge touches only the words that contain the merged pair
  *    (tracked in a pair → word-indices posting map) and applies count
  *    deltas — per-iteration cost scales with the merged pair's
  *    support, not the whole dict, which is what makes tens of
  *    thousands of merges over a 2^20-word dict a driver-side loop
  *    instead of a job. BpeSpec pins equivalence against the naive
  *    recount-every-iteration model.
  *  - `tokenize`: map-only kernel with the (small) merge table in the
  *    task closure; each word re-tokenizes greedily by merge rank.
  *    Fuses into the scan; nothing shuffles.
  *
  * Determinism: the dict truncates by (count desc, word asc); each
  * iteration merges the (count desc, pair lex asc) maximum — so the
  * learned vocabulary is a pure function of the corpus, reproducible
  * across runs, partitionings and cluster sizes.
  */
object Bpe extends Serializable {

  type Merge = (String, String)

  /** Learn `numMerges` BPE merges from the corpus's word statistics. */
  def train(
      df: DataFrame,
      textCol: Column,
      numMerges: Int,
      maxVocabWords: Int = 1 << 20): Seq[Merge] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val dict: Array[(String, Long)] = df
      .select(explode(Text.tokens(textCol.cast("string"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w").asc)
      .limit(maxVocabWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    // mutable tokenization of each dict word, starting at characters
    val words: Array[Array[String]] =
      dict.map(_._1.map(_.toString).toArray)
    val counts: Array[Long] = dict.map(_._2)

    // Incremental state: total pair counts + a posting map from pair to
    // the indices of dict words currently containing it. Built once;
    // each merge only touches the merged pair's postings.
    val pairCounts = new java.util.HashMap[Merge, Long]()
    val postings = new java.util.HashMap[Merge, java.util.HashSet[Integer]]()
    def addWordPairs(i: Int, sign: Long): Unit = {
      val w = words(i); val c = counts(i)
      var j = 0
      while (j < w.length - 1) {
        val p = (w(j), w(j + 1))
        val n = pairCounts.merge(p, sign * c, java.lang.Long.sum)
        if (n == 0L) pairCounts.remove(p)
        if (sign > 0)
          postings.computeIfAbsent(p, _ => new java.util.HashSet[Integer]())
            .add(i)
        j += 1
      }
      // stale postings (a word that no longer holds the pair) are fine:
      // applyMerge no-ops on them and they never affect pairCounts
    }
    var i = 0
    while (i < words.length) { addWordPairs(i, 1L); i += 1 }

    val merges = Vector.newBuilder[Merge]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      if (pairCounts.isEmpty) done = true
      else {
        // deterministic argmax: count desc, then pair lexicographic asc.
        // A scan over live pairs — already ≪ dict-chars; a heap would
        // need stale-entry laundering for the same order guarantees.
        var best: Merge = null; var bestC = -1L
        val it = pairCounts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val p = e.getKey; val c = e.getValue
          if (c > bestC || (c == bestC &&
              (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
            best = p; bestC = c
          }
        }
        merges += best
        // only words holding `best` change; retract their old pair
        // counts, merge, re-add the new ones
        val hosts = postings.remove(best)
        if (hosts != null) {
          val hit = hosts.iterator()
          while (hit.hasNext) {
            val wi = hit.next().intValue()
            val merged = applyMerge(words(wi), best)
            if (merged ne words(wi)) { // eq = stale posting, untouched
              addWordPairs(wi, -1L)
              words(wi) = merged
              addWordPairs(wi, 1L)
            }
          }
        }
        pairCounts.remove(best) // defensive: all hosts retracted it
        m += 1
      }
    }
    merges.result()
  }

  private def applyMerge(w: Array[String], p: Merge): Array[String] = {
    var has = false
    var j = 0
    while (!has && j < w.length - 1) {
      if (w(j) == p._1 && w(j + 1) == p._2) has = true
      j += 1
    }
    if (!has) return w
    val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
    j = 0
    while (j < w.length) {
      if (j < w.length - 1 && w(j) == p._1 && w(j + 1) == p._2) {
        out += w(j) + w(j + 1); j += 2
      } else { out += w(j); j += 1 }
    }
    out.toArray
  }

  /** Tokenize one word with ranked merges (lower rank = applied first) —
    * the standard greedy BPE apply.
    */
  private[functions] def tokenizeWord(
      word: String, rank: Map[Merge, Int]): Array[String] = {
    var toks = word.map(_.toString).toArray
    var changed = true
    while (changed && toks.length > 1) {
      var bestRank = Int.MaxValue; var bestAt = -1
      var j = 0
      while (j < toks.length - 1) {
        rank.get((toks(j), toks(j + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestAt = j }
        }
        j += 1
      }
      if (bestAt < 0) changed = false
      else toks = applyMerge(toks, (toks(bestAt), toks(bestAt + 1)))
    }
    toks
  }

  /** Subword-tokenize a text column with a trained merge list.
    * Output: (id <input type>, subwords array<string>) — whitespace
    * words each BPE-split, concatenated in order.
    */
  def tokenize(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      merges: Seq[Merge]): DataFrame = {
    import org.apache.spark.sql.types._
    val rank: Map[Merge, Int] = merges.zipWithIndex.toMap
    val base = df.select(idCol.as("id"), textCol.cast("string").as("__text"))
    val schema = StructType(Seq(
      base.schema("id"),
      StructField("subwords", ArrayType(StringType, false), false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    base.mapPartitions { rows =>
      rows.map { r =>
        val text = r.getString(1)
        val toks =
          if (text == null) Array.empty[String]
          else text.split("\\s+").filter(_.nonEmpty)
        val out = toks.flatMap(w => tokenizeWord(w, rank))
        org.apache.spark.sql.Row(r.get(0), out.toIndexedSeq)
      }
    }(enc)
  }
}
