package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphsSpec extends SparkSpec {

  private def run(rows: Seq[(Long, Long)], minWeight: Long = 1L,
      cap: Int = 200): Set[(Long, Long, Long)] = {
    import spark.implicits._
    Graphs.coOccurrenceEdges(rows.toDF("g", "it").repartition(3),
        col("g"), col("it"), minWeight = minWeight,
        maxItemsPerGroup = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
  }

  test("coOccurrenceEdges equals the brute pair count: canonical a < b, " +
      "duplicate memberships collapse, weight = shared groups, " +
      "minWeight filters") {
    // group 1: {1,2,3}; group 2: {2,3,4} (3 twice — dup membership);
    // group 3: {1,2}
    val rows = Seq((1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 2L), (2L, 3L), (2L, 3L), (2L, 4L),
      (3L, 2L), (3L, 1L))
    val all = run(rows)
    assert(all == Set(
      (1L, 2L, 2L), (1L, 3L, 1L), (2L, 3L, 2L),
      (2L, 4L, 1L), (3L, 4L, 1L)))
    assert(run(rows, minWeight = 2L) == Set((1L, 2L, 2L), (2L, 3L, 2L)))
  }

  test("degreeAssortativity matches a brute moment model: star graph " +
      "negative, regular graph degenerate (num = den = 0), den_x = " +
      "den_y always, normalization and self-loops handled") {
    import spark.implicits._
    def run(edges: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
      val r = Graphs.degreeAssortativity(
        edges.toDF("s", "d").repartition(3), col("s"), col("d"))
        .select(col("n_edges"), col("num").cast("long"),
          col("den_x").cast("long"), col("den_y").cast("long"))
        .collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    def brute(edges: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
      val sym = edges.flatMap { case (a, b) =>
        if (a == b) Nil else Seq((a, b), (b, a)) }.distinct
      val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val xs = sym.map { case (u, _) => deg(u) }
      val ys = sym.map { case (_, v) => deg(v) }
      val n = sym.size.toLong
      val sx = xs.sum; val sy = ys.sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val sxx = xs.map(x => x * x).sum; val syy = ys.map(y => y * y).sum
      (n, n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)
    }
    // star: hub degree 4, leaves degree 1 — hubs link to non-hubs
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    val gs = run(star)
    assert(gs == brute(star) && gs._2 < 0L && gs._3 == gs._4)
    // triangle (2-regular): every degree equal — num and dens all 0
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(run(tri) == ((6L, 0L, 0L, 0L)))
    // mixed graph with dup/reversed/self-loop noise
    val mixed = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
      (2L, 1L), (5L, 5L), (6L, 1L))
    val gm = run(mixed)
    assert(gm == brute(mixed) && gm._3 == gm._4)
  }

  test("maxItemsPerGroup bounds the emission: a capped group " +
      "contributes pairs only among its kept items; guards") {
    // group 1 has 5 items, cap 3 → C(3,2)=3 pairs, not C(5,2)=10
    val rows = (1L to 5L).map(i => (1L, i))
    assert(run(rows, cap = 3).size == 3)
    import spark.implicits._
    val df = Seq((1L, 1L)).toDF("g", "it")
    intercept[IllegalArgumentException](
      Graphs.coOccurrenceEdges(df, col("g"), col("it"), minWeight = 0L))
    intercept[IllegalArgumentException](
      Graphs.coOccurrenceEdges(df, col("g"), col("it"),
        maxItemsPerGroup = 1))
  }

  test("coOccurrenceEdges Auto sizes the member-collect exchange from " +
      "the membership count (hint > plan stats > parallelism), no job " +
      "at plan build; sizing never changes the edge set") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.schema
    val par = spark.sparkContext.defaultParallelism
    def partsOf(df: org.apache.spark.sql.DataFrame): Int = {
      val p = df.queryExecution.executedPlan.toString
      val m = """hashpartitioning\(g#\d+L?, (\d+)\), REPARTITION_BY_NUM"""
        .r.findFirstMatchIn(p)
      assert(m.isDefined, s"no REPARTITION_BY_NUM exchange in plan:\n$p")
      m.get.group(1).toInt
    }
    def edges(hint: Long) = Graphs.coOccurrenceEdges(li,
      col("l_orderkey"), col("l_partkey"), minWeight = 2L,
      membershipsHint = hint)
    // a hint big enough to clear the parallelism floor must resolve
    // to exactly groupingPartitions(hint, 72 B, par, 32 MB)
    val bigHint = 100000000L
    assert(partsOf(edges(bigHint)) == Sizing.groupingPartitions(
      bigHint, 72L, par, targetBytesPerTask = 32L << 20))
    // hint-less over parquet: plan statistics, zero Spark jobs
    val group = "graft-cooccur-planbuild-probe"
    spark.sparkContext.setJobGroup(group, "plan-build job probe")
    val auto =
      try {
        val a = edges(-1L)
        assert(spark.sparkContext.statusTracker
          .getJobIdsForGroup(group).isEmpty,
          "Auto sizing ran a Spark job at plan build")
        a
      } finally spark.sparkContext.clearJobGroup()
    assert(partsOf(auto) == Sizing.groupingPartitions(
      Sizing.planRowsEstimate(
        li.select(col("l_orderkey").as("g"), col("l_partkey").as("it")),
        assumedBytesPerRow = 8L).get, 72L, par,
      targetBytesPerTask = 32L << 20))
    // partitioning is a performance lever only
    assert(auto.collect().toSet == edges(bigHint).collect().toSet)
  }
}
