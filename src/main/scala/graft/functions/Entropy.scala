package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Token-distribution Shannon entropy per document — the classic
  * "does this text carry information or repeat itself" quality signal
  * (low entropy = template/boilerplate/spam; complements
  * [[Repetition]]'s Gopher fractions with a single scale-free score).
  * The slot in the reference is a scored mapper-stage filter
  * (/root/reference/src/Hadron/Basic.hs), like [[Dsir]].
  *
  * Definition, all integer arithmetic at 2^20 scale:
  *
  *   H_fx(doc) = ilog2Fx(n) − floor( Σ_t c_t · ilog2Fx(c_t) / n )
  *
  * over whitespace tokens t with per-doc counts c_t and n = Σ c_t —
  * algebraically log2(n) − (1/n)·Σ c·log2(c) = −Σ p·log2(p), the
  * Shannon entropy in bits. Using [[Dsir.ilog2Fx]] (exact integer
  * binary log, 20-round squaring) keeps the score bit-identical
  * across engines — the DuckDB oracle replays the same loop.
  * Degenerate docs (0 tokens) score 0, as does a single repeated
  * token (c = n: both logs equal). Uniform token distributions at
  * power-of-two sizes score exactly k·2^20.
  *
  * Scale shape: ONE map-only kernel pass — per-doc token counting is
  * local, so nothing shuffles and the pass fuses into the scan (the
  * [[Repetition]] rationale: a Column/HOF formulation would run
  * interpreted per element). Overflow: n must stay under 2^43
  * (ilog2Fx domain); Σ c·ilog2Fx(c) ≤ n·43·2^20 < 2^63 for any such n.
  */
object Entropy extends Serializable {

  /** Output: (id, n_tokens bigint, entropy_fx bigint). */
  def tokenEntropy(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val base = df.select(idCol.as("id"), textCol.cast("string").as("__text"))
    val schema = StructType(Seq(
      base.schema("id"),
      StructField("n_tokens", LongType, false),
      StructField("entropy_fx", LongType, false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    base.mapPartitions { rows =>
      rows.map { r =>
        val text = if (r.isNullAt(1)) "" else r.getString(1)
        val toks = text.split("\\s+").filter(_.nonEmpty)
        val n = toks.length.toLong
        if (n == 0L) org.apache.spark.sql.Row(r.get(0), 0L, 0L)
        else {
          val counts = new java.util.HashMap[String, Long]()
          toks.foreach(t => counts.merge(t, 1L, java.lang.Long.sum))
          var acc = 0L
          val it = counts.values().iterator()
          while (it.hasNext) { val c = it.next(); acc += c * Dsir.ilog2Fx(c) }
          val h = Dsir.ilog2Fx(n) - acc / n
          org.apache.spark.sql.Row(r.get(0), n, h)
        }
      }
    }(enc)
  }
}
