package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style repetition quality signals (Rae et al. 2021, table A1):
  * natural text rarely repeats itself; scraped boilerplate, SEO spam and
  * template pages do. Three standard metrics per document:
  *
  *  - `dup_line_frac`: fraction of (non-empty) lines that are exact
  *    duplicates of another line in the same document.
  *  - `dup_line_char_frac`: fraction of line characters belonging to
  *    duplicated lines (weighs long repeated blocks over short ones).
  *  - `top_bigram_char_frac`: characters covered by the most frequent
  *    word bigram (occurrences x gram length) over total characters —
  *    high values mean one phrase dominates the document.
  *
  * One typed kernel pass per document (map-only — fuses into the scan,
  * nothing shuffles; the standard filter shape at corpus scale). A
  * Column/HOF formulation exists but runs interpreted per-element
  * (same rationale as Dedup.shingleDocs); RepetitionSpec pins the
  * kernel to a plain-Scala model of the same definitions.
  */
object Repetition extends Serializable {

  /** Per-doc repetition stats.
    * Output: (id, n_lines bigint, dup_line_frac, dup_line_char_frac,
    * top_bigram_char_frac — doubles, 0.0 for degenerate docs).
    */
  def stats(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    import org.apache.spark.sql.types._
    val base = df.select(idCol.as("id"), textCol.cast("string").as("__text"))
    val schema = StructType(Seq(
      base.schema("id"),
      StructField("n_lines", LongType, false),
      StructField("dup_line_frac", DoubleType, false),
      StructField("dup_line_char_frac", DoubleType, false),
      StructField("top_bigram_char_frac", DoubleType, false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    base.mapPartitions { rows =>
      rows.map { r =>
        val text = if (r.isNullAt(1)) "" else r.getString(1)

        val lines = text.split("\n", -1).filter(_.nonEmpty)
        val lineCounts = new java.util.HashMap[String, Int]()
        lines.foreach(l => lineCounts.merge(l, 1, Integer.sum))
        val nLines = lines.length.toLong
        var dupLines = 0L; var dupChars = 0L; var totChars = 0L
        lines.foreach { l =>
          // code points, not UTF-16 units (DuckDB len() convention —
          // same rationale as ngramStats below)
          val lLen = l.codePointCount(0, l.length)
          totChars += lLen
          if (lineCounts.get(l) > 1) { dupLines += 1; dupChars += lLen }
        }
        val dupLineFrac =
          if (nLines > 0) dupLines.toDouble / nLines.toDouble else 0.0
        val dupLineCharFrac =
          if (totChars > 0) dupChars.toDouble / totChars.toDouble else 0.0

        val toks = text.split("\\s+").filter(_.nonEmpty)
        var topBigramChars = 0L
        if (toks.length >= 2) {
          val bgCounts = new java.util.HashMap[String, Int]()
          var i = 0
          while (i < toks.length - 1) {
            bgCounts.merge(toks(i) + " " + toks(i + 1), 1, Integer.sum)
            i += 1
          }
          val it = bgCounts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val k = e.getKey
            val covered =
              e.getValue.toLong * k.codePointCount(0, k.length)
            if (covered > topBigramChars) topBigramChars = covered
          }
        }
        val topBigramCharFrac =
          if (text.nonEmpty && topBigramChars > 0)
            topBigramChars.toDouble /
              text.codePointCount(0, text.length).toDouble
          else 0.0

        org.apache.spark.sql.Row(r.get(0), nLines,
          dupLineFrac, dupLineCharFrac, topBigramCharFrac)
      }
    }(enc)
  }

  /** The FULL Gopher n-gram repetition table (Rae et al. 2021, table
    * A1) — [[stats]] covers the line metrics and the top bigram; this
    * emits, per document and per n ∈ [minN, maxN], BOTH remaining
    * families as one long-format row:
    *
    *  - `top_char_frac`: characters covered by the single most
    *    frequent word n-gram (count × gram chars, spaces included)
    *    over total document chars — Gopher applies it at n = 2..4.
    *  - `dup_char_frac`: characters covered by ALL occurrences of
    *    n-grams appearing more than once, over total chars — Gopher's
    *    n = 5..10 family. Overlapping occurrences each count (the
    *    common reimplementation reading of the paper's definition),
    *    so pathological repetition can exceed 1.0 — it is a screening
    *    signal, monotone in repetition, not a probability.
    *
    * Docs with fewer than n tokens emit no row for that n (no gram
    * exists — mirroring [[stats]]' degenerate-doc 0.0 convention would
    * conflate "no signal" with "clean"). Fractions are integer÷integer
    * IEEE divisions — bit-identical across engines, the q84 double
    * discipline. One typed kernel pass per document (map-only, fuses
    * into the scan); the (maxN − minN + 1) counting passes share the
    * one tokenization.
    *
    * @return (id, n bigint, n_grams bigint, top_char_frac double,
    *   dup_char_frac double)
    */
  def ngramStats(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      minN: Int = 2,
      maxN: Int = 10): DataFrame = {
    require(minN >= 2, s"minN must be >= 2, got $minN")
    require(maxN >= minN && maxN <= 32,
      s"maxN must be in [minN, 32], got $maxN")
    import org.apache.spark.sql.types._
    val base = df.select(idCol.as("id"), textCol.cast("string").as("__text"))
    val schema = StructType(Seq(
      base.schema("id"),
      StructField("n", LongType, false),
      StructField("n_grams", LongType, false),
      StructField("top_char_frac", DoubleType, false),
      StructField("dup_char_frac", DoubleType, false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    base.mapPartitions { rows =>
      rows.flatMap { r =>
        val text = if (r.isNullAt(1)) "" else r.getString(1)
        val toks = text.split("\\s+").filter(_.nonEmpty)
        // code points, not UTF-16 units: the oracle's DuckDB len()
        // counts code points, so a non-BMP char (emoji, supplementary
        // CJK) must weigh 1 here too
        val totChars = text.codePointCount(0, text.length).toLong
        (minN to maxN).iterator.flatMap { n =>
          if (toks.length < n || totChars == 0) Iterator.empty
          else {
            val counts = new java.util.HashMap[String, Int]()
            val sb = new java.lang.StringBuilder()
            var i = 0
            while (i <= toks.length - n) {
              sb.setLength(0)
              var j = 0
              while (j < n) {
                if (j > 0) sb.append(' ')
                sb.append(toks(i + j)); j += 1
              }
              counts.merge(sb.toString, 1, Integer.sum)
              i += 1
            }
            var top = 0L; var dup = 0L
            val it = counts.entrySet().iterator()
            while (it.hasNext) {
              val e = it.next()
              val k = e.getKey
              val cover =
                e.getValue.toLong * k.codePointCount(0, k.length)
              if (cover > top) top = cover
              if (e.getValue > 1) dup += cover
            }
            Iterator(org.apache.spark.sql.Row(r.get(0), n.toLong,
              (toks.length - n + 1).toLong,
              top.toDouble / totChars.toDouble,
              dup.toDouble / totChars.toDouble))
          }
        }
      }
    }(enc)
  }
}
