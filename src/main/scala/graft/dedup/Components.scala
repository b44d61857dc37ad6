package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair list — the step
  * between pairwise dedup output and "keep ONE document per duplicate
  * CLUSTER". Removing `id2` of every pair (the q34 idiom) over- or
  * under-keeps whenever the pair graph is not transitively closed
  * (chain a-b, b-c plus pair b-c alone keeps both a and b); components
  * give the exact cluster and its deterministic representative (min id).
  * No reference analog: hadron stops at pairs.
  *
  * Algorithm: iterative min-label propagation as plain DataFrame joins —
  * each round every node takes the min of its own and its neighbors'
  * labels; converged when a round changes nothing. Rounds needed = graph
  * diameter, which for near-dup clusters (dense, star-ish) is small;
  * for adversarially long chains raise `maxIter` (or pre-close the
  * pairs). Each round is two shuffles (join + groupBy) over the label
  * table, whose width is one id + one label — at corpus scale the edge
  * table is the candidate-pair output, orders of magnitude smaller than
  * the corpus. Lineage is truncated per round with an eager
  * localCheckpoint, the standard Spark idiom for iterative plans (an
  * unbounded plan chain re-analyzes and re-optimizes quadratically).
  */
object Components {

  /** @param pairs (id1, id2) rows, undirected, any extra columns ignored
    * @return (id, component) for every id in `pairs`; component = min id
    *         of the connected component. Throws if `maxIter` rounds do
    *         not converge — a partial labeling is wrong data, not a
    *         degraded answer.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    import org.apache.spark.sql.types._
    val spark = pairs.sparkSession
    val edges = pairs.select(col("id1").as("src"), col("id2").as("dst"))
      .union(pairs.select(col("id2").as("src"), col("id1").as("dst")))
      .distinct()
      .cache() // probed every round
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id"))
      .localCheckpoint(true)
    val outSchema = StructType(Seq(
      labels.schema("id"), labels.schema("lbl")))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // ONE action per round: the eager localCheckpoint materializes the
      // new labels AND fills the changed-counter as a side effect of the
      // same job (iterative rounds are job-overhead bound at small label
      // counts, so a separate convergence-probe job would double the
      // round cost). Only zero-vs-nonzero is read, so task retries
      // inflating the counter are harmless.
      val changed = spark.sparkContext.longAccumulator(s"cc-changed-$iter")
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("lbl")), "dst")
        .select(col("src").as("id"), col("lbl"))
      // `own` tags each node's current-label row, so ONE groupBy yields
      // both the new label (min over own + neighbors) and the previous
      // one (min over the single own row) — no join back to the prior
      // labels, which would be a second shuffle every round
      val next = labels.withColumn("own", lit(true))
        .union(nbrMin.withColumn("own", lit(false)))
        .groupBy("id")
        .agg(
          min(col("lbl")).as("lbl"),
          min(when(col("own"), col("lbl"))).as("prev"))
        .mapPartitions { rows =>
          rows.map { r =>
            if (r.get(1) != r.get(2)) changed.add(1L)
            org.apache.spark.sql.Row(r.get(0), r.get(1))
          }
        }(enc)
        .localCheckpoint(true)
      converged = changed.value == 0
      labels = next
      iter += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds — " +
          "graph diameter exceeds maxIter; raise it")
    labels.select(col("id"), col("lbl").as("component"))
  }

  /** Keep exactly one document per duplicate cluster: the min-id
    * representative survives, every other cluster member is dropped.
    * Rows never mentioned in `pairs` pass through untouched. The
    * left_anti against the (small) non-representative id set is the
    * same corpus-scale shape as q34's pair-based removal, but
    * cluster-exact.
    */
  def keepOnePerCluster(
      df: DataFrame,
      idCol: org.apache.spark.sql.Column,
      pairs: DataFrame,
      maxIter: Int = 25): DataFrame = {
    val drop = connectedComponents(pairs, maxIter)
      .filter(col("id") =!= col("component"))
      .select(col("id").as("__drop_id"))
    df.join(drop, idCol === col("__drop_id"), "left_anti")
  }
}
