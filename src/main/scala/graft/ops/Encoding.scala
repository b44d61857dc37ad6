package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic FEATURE ENCODING for training pipelines — the three
  * classic text/tabular featurizers, each a pure function of the data
  * (no fitted state to version, no RNG): the hashing trick, the
  * frequency-ranked vocabulary index, and leave-one-out target
  * encoding. Everything exact-integer and hash-addressed so a SQL
  * engine replays outputs bit-for-bit and an incremental corpus keeps
  * prior rows' features — the same discipline as
  * [[Sampling]]'s content-addressed splits.
  */
object Encoding {

  /** The HASHING TRICK (Weinberger et al. 2009): token → fixed slot
    * in [0, dim) via md5, per-document slot counts — the featurizer
    * that needs NO vocabulary pass, no fitted dictionary to ship or
    * version, and a fixed output width whatever the corpus grows
    * into. Collisions are the accepted price (dim trades them off).
    *
    * Slot = first 8 md5 hex digits of the token mod dim (exact in a
    * long, [[graft.functions.Dsir.bucketOf]]'s convention — the
    * DSIR buckets and hash splits already rely on it). Output is the
    * SPARSE (id, slot, n) triple form — the join-able, SQL-friendly
    * layout; densify at the consumer if a contiguous vector is
    * wanted.
    *
    * Shape: tokenize + md5 fused into the scan, one map-side-combined
    * (id, slot) count; the shuffle carries ≤ min(tokens, dim) rows
    * per document. Parallelism source: the map-side count.
    *
    * @return (id, slot, n) — slots with zero count are absent
    */
  def hashFeatures(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      dim: Int = 1024): DataFrame = {
    require(dim >= 2 && dim <= (1 << 20),
      s"dim must be in [2, 2^20], got $dim")
    df.select(idCol.as("id"), graft.functions.Text.tokens(textCol)
        .as("__tk"))
      .filter(col("id").isNotNull)
      .select(col("id"), explode(col("__tk")).as("__t"))
      .select(col("id"),
        graft.functions.Dsir.bucketOf(col("__t"), dim).as("slot"))
      .groupBy("id", "slot").agg(count(lit(1)).as("n"))
  }

  /** Frequency-ranked VOCABULARY INDEX — the deterministic
    * StringIndexer: term → contiguous index by (freq DESC, term ASC),
    * 1-based, so index 1 is the corpus's most common term and the
    * mapping is a pure function of the corpus (two corpora with equal
    * term statistics produce identical vocabularies). `minCount`
    * cuts the hapax tail BEFORE ranking, so indices stay dense.
    *
    * Scale shape: one map-side-combined term count, then the global
    * rank through [[Prefix.runningTotal]]'s range exchange under the
    * (2^62 − freq) fixed-width-hex + term order encoding (the
    * [[graft.functions.Collocations.zipfSlopeBySource]] convention —
    * an open vocabulary can dwarf any fixed parallelism, so never a
    * single-partition ROW_NUMBER window). Loud freq < 2^62 domain.
    *
    * @return (term, freq, idx)
    */
  def vocabIndex(
      df: DataFrame,
      textCol: Column,
      minCount: Long = 1L): DataFrame = {
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    val bias = 1L << 62
    val counts = df.select(graft.functions.Text.tokens(textCol)
        .as("__tk"))
      .select(explode(col("__tk")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minCount)
      .withColumn("freq", when(col("freq") < bias, col("freq"))
        .otherwise(raise_error(concat(
          lit("vocabIndex freq must stay under 2^62, got "),
          col("freq")))))
      .withColumn("__one", lit(1L))
      .withColumn("__ord", concat(
        format_string("%016x", lit(bias) - col("freq")), col("term")))
    Prefix.runningTotal(counts, orderCol = "__ord", valueCol = "__one",
        outCol = "idx")
      .select(col("term"), col("freq"), col("idx"))
  }

  /** LEAVE-ONE-OUT target encoding — the category feature that does
    * not leak its own row's label: each row gets the mean target of
    * the OTHER rows in its category,
    *
    *   loo_fx = TRUE-FLOOR( (S_g − v_i) · 2^20 / (n_g − 1) )
    *
    * (the standard fix for target encoding's self-leakage; plain
    * mean encoding memorizes singletons). Singleton categories emit
    * NULL — there is no "other rows" mean, and NULL is the honest
    * answer the consumer must impute deliberately (the global prior,
    * usually). TRUE floor so negative target sums replay
    * bit-identically in floor- and truncate-division engines alike.
    *
    * Shape: one map-side-combined category rollup (n, S), broadcast
    * back onto the stream — map-only after the counting pass, no
    * per-row shuffle. Parallelism source: the scan. Category
    * cardinality bounds the broadcast (loud ≤ 2^20 cap — high-card
    * categories belong in [[hashFeatures]], not here).
    *
    * @return input id/category/value plus loo_fx
    */
  def looTargetEncode(
      df: DataFrame,
      idCol: Column,
      categoryCol: Column,
      targetCol: Column,
      maxCategories: Int = 1 << 20): DataFrame = {
    require(maxCategories >= 1 && maxCategories <= (1 << 24),
      s"maxCategories must be in [1, 2^24], got $maxCategories")
    val base = df.select(idCol.as("id"), categoryCol.as("cat"),
        targetCol.cast("long").as("v"))
      .filter(col("id").isNotNull && col("cat").isNotNull &&
        col("v").isNotNull)
    val stats = base.groupBy(col("cat").as("__cat"))
      .agg(count(lit(1)).as("__n"),
        sum(col("v").cast("decimal(38,0)")).as("__s"))
      .withColumn("__nc", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
      .withColumn("__nc", when(col("__nc") <= maxCategories, col("__nc"))
        .otherwise(raise_error(concat(lit(
          s"looTargetEncode category cap $maxCategories exceeded " +
          "(use hashFeatures for high-card categories), got "),
          col("__nc")))))
      .drop("__nc")
      .localCheckpoint(true)
    base.join(broadcast(stats), col("cat") === col("__cat"))
      .select(col("id"), col("cat"), col("v"),
        when(col("__n") > 1L,
          expr("CAST(((__s - v) * 1048576) div (__n - 1) - " +
            "(CASE WHEN __s - v < 0 AND " +
            "((__s - v) * 1048576) % (__n - 1) != 0 " +
            "THEN 1 ELSE 0 END) AS BIGINT)"))
          .as("loo_fx"))
  }
}
