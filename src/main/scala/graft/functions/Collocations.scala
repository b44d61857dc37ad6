package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** PMI collocation extraction (Church & Hanks 1990) — the corpus-level
  * "which word pairs belong together" tool (multi-word expressions,
  * named entities, domain phrases) that complements [[LangModel]]'s
  * per-document scoring with a corpus-wide ranked vocabulary of
  * adjacent pairs.
  *
  *   pmi(x,y) = log2( p(x,y) / (p(x)·p(y)) )
  *            = log2 c_xy + 2·log2 T − log2 B − log2 c_x − log2 c_y
  *
  * with c_xy adjacent-bigram counts, c_x unigram counts, T total
  * tokens, B total bigrams. All five logs run through [[Dsir.ilog2Fx]]
  * (exact integer binary log at 2^20 scale), so scores are
  * bit-identical across engines and the oracle replays the loop.
  * `minCount` drops the hapax noise PMI is notorious for (rare pairs
  * max the ratio); the published mitigation, kept as part of the
  * definition.
  *
  * Scale shape: one groupBy over the exploded bigram stream and one
  * over tokens — both map-side combined, shuffling at most the vocab
  * per partition. The two 1-row totals are broadcast via crossJoin
  * (the [[graft.ops.Hits]] normalize idiom — no driver round-trip),
  * unigram counts join the bigram table twice (x then y arm, each a
  * plain equi-join AQE broadcasts when the kept vocab is small), and
  * the per-row PMI is a map-only kernel. Top-k is orderBy+limit →
  * TakeOrderedAndProject.
  */
object Collocations extends Serializable {

  /** Output: the k highest-PMI adjacent pairs with c_xy ≥ minCount,
    * (w1, w2, n bigint, pmi_fx bigint), ties broken (w1, w2) asc.
    */
  def topPmi(
      df: DataFrame,
      id: Column,
      text: Column,
      minCount: Long,
      k: Int): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k >= 1, s"k must be positive, got $k")
    val tk = Text.tokens(text)
    val toks = df.select(id.as("id"), tk.as("tk"))
    val uni = toks.select(explode(col("tk")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val biAll = toks.filter(size(col("tk")) >= 2)
      .select(explode(zip_with(
        slice(col("tk"), lit(1), size(col("tk")) - 1),
        slice(col("tk"), lit(2), size(col("tk")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("b"))
      .select(col("b.w1"), col("b.w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n"))
    // B is the PRE-filter occurrence total: p(x,y) = c_xy / B is a
    // probability over all adjacent pairs, not over the kept vocab
    val bTot = broadcast(biAll.agg(sum(col("n")).as("b_tot")))
    val bi = biAll.filter(col("n") >= minCount)
    val tTot = broadcast(uni.agg(sum(col("c")).as("t_tot")))
    val joined = bi
      .join(uni.select(col("w").as("w1"), col("c").as("cx")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("cy")), Seq("w2"))
      .crossJoin(tTot).crossJoin(bTot)
      .select(col("w1"), col("w2"), col("n"), col("cx"), col("cy"),
        col("t_tot"), col("b_tot"))
    val schema = StructType(Seq(
      StructField("w1", StringType, true),
      StructField("w2", StringType, true),
      StructField("n", LongType, false),
      StructField("pmi_fx", LongType, false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    joined.mapPartitions { rows =>
      rows.map { r =>
        val n = r.getLong(2)
        val pmi = Dsir.ilog2Fx(n) + 2L * Dsir.ilog2Fx(r.getLong(5)) -
          Dsir.ilog2Fx(r.getLong(6)) - Dsir.ilog2Fx(r.getLong(3)) -
          Dsir.ilog2Fx(r.getLong(4))
        org.apache.spark.sql.Row(r.getString(0), r.getString(1), n, pmi)
      }
    }(enc)
      .orderBy(col("pmi_fx").desc, col("w1").asc, col("w2").asc)
      .limit(k)
  }
}
