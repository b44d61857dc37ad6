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
          totChars += l.length
          if (lineCounts.get(l) > 1) { dupLines += 1; dupChars += l.length }
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
            val covered = e.getValue.toLong * e.getKey.length
            if (covered > topBigramChars) topBigramChars = covered
          }
        }
        val topBigramCharFrac =
          if (text.nonEmpty && topBigramChars > 0)
            topBigramChars.toDouble / text.length.toDouble
          else 0.0

        org.apache.spark.sql.Row(r.get(0), nLines,
          dupLineFrac, dupLineCharFrac, topBigramCharFrac)
      }
    }(enc)
  }
}
