package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph construction helpers shared by the graph-operator family —
  * the step every co-occurrence analysis (triangles, k-core, PMI
  * ranking) starts from and that is easy to write as a quadratic
  * self-join by accident.
  */
object Graphs {

  /** Weighted co-occurrence edges from a (group, item) membership
    * table: an undirected edge (a, b, w) per unordered item pair that
    * shares ≥ `minWeight` groups (a < b canonically; items compare in
    * their own type's ordering, cast upstream if that is not meant).
    *
    * Shape: ONE exchange — items are grouped per group and the ≤
    * cap·(cap−1)/2 pairs are emitted MAP-SIDE from the bounded array,
    * then one map-side-combined count. The tempting alternative, a
    * self-join on the group key, shuffles the membership table twice
    * and was measured dominating the whole triangle query before q146
    * switched to this form (NOTES r16tri). `maxItemsPerGroup` bounds
    * the per-group emission (a group of g items yields O(g²) pairs —
    * a 10⁵-item group is a 10¹⁰-pair bomb): items past the cap are
    * DROPPED with the capped-collect's deterministic keep rule, the
    * same loud-by-scaladoc trade as [[graft.plans.CollectListCapped]];
    * size the cap to the real "co-occurrence is meaningful" group
    * width, not the biggest group.
    *
    * @return (a, b, w) with a < b, w = co-occurrence count ≥ minWeight
    */
  def coOccurrenceEdges(
      df: DataFrame,
      groupCol: Column,
      itemCol: Column,
      minWeight: Long = 1L,
      maxItemsPerGroup: Int = 200): DataFrame = {
    require(minWeight >= 1, s"minWeight must be >= 1, got $minWeight")
    require(maxItemsPerGroup >= 2,
      s"maxItemsPerGroup must be >= 2, got $maxItemsPerGroup")
    df.select(groupCol.as("g"), itemCol.as("it")).distinct()
      .groupBy("g")
      .agg(array_distinct(call_function("collect_list_capped",
        col("it"), lit(maxItemsPerGroup))).as("ps"))
      .select(explode(expr(
        """flatten(transform(ps, x ->
             filter(transform(ps, y ->
               IF(x < y, struct(x AS a, y AS b), NULL)),
             z -> z IS NOT NULL)))""")).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("w"))
      .filter(col("w") >= minWeight)
  }
}
