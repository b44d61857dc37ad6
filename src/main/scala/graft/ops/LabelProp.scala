package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-iteration synchronous label propagation (Raghavan et al.
  * 2007) over an edge table — community detection for the graphs a
  * pipeline actually has (co-occurrence, link, dup-pair graphs). The
  * graph-family companion to [[PageRank]]/[[Hits]]: where
  * [[graft.dedup.Components]] finds CONNECTIVITY, label propagation
  * finds DENSITY — nodes adopt the label most common among their
  * in-neighbors, so tightly-knit regions converge to one label even
  * inside a single connected component.
  *
  * Deliberately deterministic where the published algorithm is not:
  * SYNCHRONOUS rounds (all nodes update from the previous round's
  * labels — no update-order dependence), exactly `iters` rounds, and a
  * total tie-break (highest count, then SMALLEST label). Labels start
  * as the node's own id. A node with no in-edges keeps its label.
  * Feed both edge directions for undirected semantics (the [[PageRank]]
  * convention). Synchronous LPA can oscillate on bipartite regions —
  * that is a property of the fixed-point definition, not
  * nondeterminism; pick odd/even `iters` consistently when comparing.
  *
  * Scale shape: edges persisted once; each round is one join of the
  * N-row label table into the edge table (broadcast below
  * `broadcastNodesUpTo` nodes — the edge table never shuffles), a
  * map-side-combined (node, label) count, and a struct-min argmax.
  * Each round's label table is cut from its lineage with an eager
  * localCheckpoint — the round reads the previous table TWICE (vote
  * join + keep-own-label fallback), so without truncation the logical
  * plan doubles per round (the measured [[Hits]] failure mode).
  */
object LabelProp {

  def labelPropagation(
      edges: DataFrame,
      srcCol: Column,
      dstCol: Column,
      iters: Int,
      broadcastNodesUpTo: Long = PageRank.DefaultBroadcastNodesUpTo)
      : DataFrame = {
    require(iters >= 1, "iters must be positive")
    val e = edges.select(srcCol.cast("long").as("u"),
      dstCol.cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull)
      .persist()
    try {
      val nodes = e.select(col("u").as("id"))
        .union(e.select(col("v").as("id"))).distinct()
      var labels = nodes.withColumn("lbl", col("id")).localCheckpoint()
      val n = labels.count()
      require(n > 0, "empty graph")
      val gate = n <= broadcastNodesUpTo
      // shuffle arm: hash-build the N-row label side so no side of
      // the per-round vote join is ever SORTED; the edge exchange is
      // the algorithm's message pass and stays. (A pre-partitioned
      // persisted edge copy was measured and REJECTED — extra cache
      // materialization exchange outweighed the saved join exchanges
      // at x30, flat at x100; NOTES round 10.)
      def maybeB(df: DataFrame): DataFrame =
        if (gate) broadcast(df) else df.hint("shuffle_hash")
      for (_ <- 1 to iters) {
        // (count desc, label asc) argmax as a single struct-min: counts
        // are positive, so min over (-count, label) orders correctly
        val votes = e.join(
          maybeB(labels.withColumnRenamed("id", "u")), Seq("u"))
          .groupBy(col("v").as("id"), col("lbl"))
          .agg(count(lit(1)).as("c"))
        val best = votes.groupBy("id")
          .agg(min(struct((-col("c")).as("nc"), col("lbl"))).as("m"))
          .select(col("id"), col("m.lbl").as("new_lbl"))
        labels = labels.join(best, Seq("id"), "left")
          .select(col("id"),
            coalesce(col("new_lbl"), col("lbl")).as("lbl"))
          .localCheckpoint()
      }
      labels.select(col("id"), col("lbl").as("label"))
    } finally {
      e.unpersist()
    }
  }
}
