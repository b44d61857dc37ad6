package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge table — entity importance for
  * graphs a pipeline actually has (co-occurrence graphs, link graphs,
  * dup-pair graphs). Deliberately FIXED-POINT and FIXED-ITERATION:
  * ranks are 2^20-scaled longs, every per-step division is an integer
  * floor, and the loop runs exactly `iters` times — so results are
  * bit-identical across engines, partitionings, and runs, and an
  * independent oracle can replay the iterations (the
  * convergence-thresholded float formulation is none of those).
  *
  * Semantics: `r0(v) = floor(S / N)`;
  * `r_{t+1}(v) = floor((den-num)·S / (den·N))
  *              + floor(num · Σ_{u→v} floor(r_t(u) / outdeg(u)) / den)`
  * with damping `num/den` (default 85/100) and S = 2^20. Dangling-node
  * mass is dropped, not redistributed (the usual simplification; feed
  * bidirectional edges if every node should keep outflow). Ranks are
  * comparable WITHIN a run — the dropped mass means totals are not
  * conserved.
  *
  * Scale shape: one shuffle per iteration (contributions grouped by
  * dst) plus the rank⋈edges join. Edges and degrees are persisted once
  * and reused every iteration (the canonical PageRank pattern — the
  * edge table is read `iters` times otherwise); rank tables are N rows
  * of two longs. Driver holds only the loop counter. For iters beyond
  * ~10, checkpoint the rank table periodically to cut lineage.
  */
object PageRank {

  val Scale: Long = 1L << 20

  /** @param edges (srcCol, dstCol) directed edge table; duplicate
    *   edges count twice (pre-`distinct` if that is not intended).
    * @return (id, rank_fp long) for every node appearing as src or dst.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: Column,
      dstCol: Column,
      iters: Int,
      dampingNum: Int = 85,
      dampingDen: Int = 100): DataFrame = {
    require(iters >= 1, "iters must be positive")
    require(dampingDen > 0 && dampingNum >= 0 && dampingNum <= dampingDen,
      s"damping must be a fraction in [0,1], got $dampingNum/$dampingDen")
    val e = edges.select(srcCol.cast("long").as("u"),
      dstCol.cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull)
      .persist()
    val nodes = e.select(col("u").as("id"))
      .union(e.select(col("v").as("id"))).distinct().persist()
    val deg = e.groupBy("u").agg(count(lit(1)).as("d")).persist()
    try {
      val n = nodes.count()
      require(n > 0, "empty graph")
      val r0 = Scale / n
      val base = (dampingDen - dampingNum) * Scale / (dampingDen * n)
      var rank = nodes.withColumn("r", lit(r0))
      for (_ <- 1 to iters) {
        val contrib = e
          .join(rank.withColumnRenamed("id", "u"), Seq("u"))
          .join(deg, Seq("u"))
          .select(col("v").as("id"), expr("r div d").as("c"))
          .groupBy("id").agg(sum("c").as("cs"))
        rank = nodes.join(contrib, Seq("id"), "left")
          .select(col("id"),
            (lit(base) + expr(
              s"($dampingNum * coalesce(cs, 0L)) div $dampingDen"))
              .as("r"))
      }
      // materialize before unpersisting the inputs the lineage reads
      rank = rank.select(col("id"), col("r").as("rank_fp")).localCheckpoint()
      rank
    } finally {
      e.unpersist(); nodes.unpersist(); deg.unpersist()
    }
  }
}
