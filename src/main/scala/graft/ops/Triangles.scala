package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact triangle counting with degree-ordered orientation — the
  * clustering-coefficient building block the graph family
  * (PageRank/HITS/label-prop/connected-components) was missing.
  * Community-heavy corpus graphs (co-occurrence, dup-pair, link
  * graphs) are distinguishable from hub-spoke noise precisely by
  * where their triangles sit.
  *
  * Algorithm (the classic distributed form): normalize to undirected
  * distinct (a < b) edges with self-loops dropped; orient every edge
  * from its lower to its higher endpoint under the (degree, id) total
  * order; enumerate each apex's out-neighbor pairs (the wedges); a
  * wedge closes iff its far edge exists in the oriented set. The
  * orientation bounds every out-degree by O(√E), so the wedge join is
  * the E^1.5 bound — the reason this scales where a naive
  * neighbor-pairs join is Σ deg² (one hub kills it).
  *
  * Everything is exact integer arithmetic; ids must be orderable
  * (plan-time guard). Per-node `wedges = deg·(deg−1)/2` rides along so
  * the local clustering coefficient is the caller's exact rational
  * `tri/wedges` — no float, no division here.
  *
  * Scale shape: degree join + one self-join keyed on the apex + one
  * existence semi-join keyed on the far pair; every exchange carries
  * edges or wedges (bounded E^1.5), never node×node. The report caps
  * at `k` nodes via the bounded `topk_by` fold — never a corpus-wide
  * rank window.
  *
  * @param edges (srcCol, dstCol) edge list; direction ignored,
  *              duplicates and self-loops dropped
  * @param k     report size: top-k nodes by (triangles desc, id asc)
  * @return (node, tri, deg, wedges) — nodes with zero triangles are
  *         absent (triangle-free graphs report nothing)
  */
object Triangles {

  def triangleCounts(
      edges: DataFrame, srcCol: Column, dstCol: Column,
      k: Int = 50): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val idType = edges.select(srcCol).schema.head.dataType
    graft.dedup.Dedup.requireOrderableId(idType, "triangleCounts")
    // undirected normalized edge set — persisted: it feeds the degree
    // count, the orientation join, and the report's degree attach, and
    // the upstream edge builder (often a self-join + distinct) must
    // not re-execute per consumer
    val und = edges
      .select(least(srcCol, dstCol).as("a"), greatest(srcCol, dstCol).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // degrees on the undirected graph
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient low (deg, id) -> high (deg, id); persist — consumed by the
    // wedge self-join (twice) and the closing semi-join
    val withDeg = und
      .join(deg.withColumnRenamed("node", "a")
        .withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("node", "b")
        .withColumnRenamed("deg", "db"), "b")
    // the far endpoint carries its (deg, id) order key so wedge
    // ordering needs no second degree join
    val oriented = withDeg.select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v"), col("db").as("dv")))
          .otherwise(
            struct(col("b").as("u"), col("a").as("v"), col("da").as("dv")))
          .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // wedges at each apex u: out-neighbor pairs in (deg, id) order —
    // v before w, so the closing edge (if any) is oriented v -> w
    val e1 = oriented.select(col("u"), col("v"), col("dv"))
    val e2 = oriented.select(col("u"), col("v").as("w"), col("dv").as("dw"))
    val wedges = e1.join(e2, "u")
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
    val tris = wedges
      .join(oriented.select(col("u").as("v"), col("v").as("w")),
        Seq("v", "w"), "left_semi")
      .select(col("u"), col("v"), col("w"))
    // credit all three corners, then the bounded top-k fold. perNode is
    // node-sized but its LINEAGE is the wedge join — capPerGroup reads
    // its input twice (fold + keeper join-back), so without this
    // persist the E^1.5 stage executes twice (measured 2× at sf0.1)
    val perNode = tris
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Sampling.capPerGroup(perNode, lit(0), col("node"), col("tri"), k)
      .join(deg, "node")
      .select(col("node"), col("tri"),
        col("rank").as("tri_rank"), col("deg"),
        expr("(deg * (deg - 1)) div 2").as("wedges"))
  }

}
