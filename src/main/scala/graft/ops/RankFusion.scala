package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal rank fusion (Cormack, Clarke & Buettcher 2009) — the
  * standard way to combine rankings from incomparable scorers (BM25
  * keyword scores and embedding cosines live on different scales;
  * their RANKS are always comparable):
  *
  *   rrf(d) = Σ over rankings of 1 / (kk + rank_r(d))
  *
  * kept exact as floor(2^20 / (kk + rank)) per source and an integer
  * sum — bit-identical across engines (the fixed-point discipline;
  * an oracle replays it with integer division). An item missing from
  * a source simply contributes nothing. kk=60 is the published
  * constant: it damps the head so one scorer's #1 cannot drown the
  * other's consensus.
  *
  * Scale shape: a unionByName of the (qid, id, rank) rankings — each
  * already small (top-N per query per source), one map-side-combined
  * groupBy to sum contributions, then the bounded `topk_by` aggregate
  * per query (map-side k-heaps, no rank window, no global sort).
  */
object RankFusion {

  val Scale: Long = 1L << 20

  /** Fuse rankings, each with columns (qid, id, rank) and rank
    * starting at 1. Output: (qid, id, rrf_fx, rank) — the k best per
    * qid by (rrf_fx desc, id asc).
    */
  def rrfTopK(
      rankings: Seq[DataFrame],
      kk: Int = 60,
      k: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfTopK needs at least one ranking")
    require(kk >= 0, s"kk must be non-negative, got $kk")
    require(k >= 1, s"k must be positive, got $k")
    val u = rankings
      .map(_.select(col("qid"), col("id"), col("rank")))
      .reduce(_ unionByName _)
    u.select(col("qid"), col("id"),
        expr(s"${Scale}L div (${kk}L + cast(rank as bigint))")
          .as("contrib"))
      .groupBy("qid", "id")
      .agg(sum(col("contrib")).as("rrf_fx"))
      .groupBy("qid")
      .agg(call_function("topk_by",
        struct(col("id"), col("rrf_fx")),
        col("rrf_fx").cast("double"), lit(k)).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), col("col.id.id").as("id"),
        col("col.id.rrf_fx").as("rrf_fx"),
        (col("pos") + 1).cast("long").as("rank"))
  }
}
