package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PartitioningSpec extends SparkSpec {

  test("partitionSort groups keys contiguously in full-key order per partition") {
    import spark.implicits._
    val df = Seq((2, 30), (1, 2), (2, 10), (1, 1), (2, 20))
      .toDF("k", "v")
    val parts = Partitioning.partitionSort(df, Seq(col("k")), Seq(col("v")))
      .rdd.glom().collect()
    parts.filter(_.nonEmpty).foreach { p =>
      // within a partition: sorted by (k, v), so each k is one contiguous
      // ascending run — the shuffle contract hadron reducers rely on
      val pairs = p.map(r => (r.getInt(0), r.getInt(1))).toSeq
      assert(pairs == pairs.sorted)
    }
  }

  test("saltedJoin == plain inner join, with hot key spread over partitions") {
    import spark.implicits._
    // heavily skewed: one hot key with 10k rows
    val skewed = spark.range(10000).select(lit("hot").as("k"), col("id"))
      .union(spark.range(100).select(lit("cold").as("k"), col("id")))
    val dim = Seq(("hot", "H"), ("cold", "C"), ("never", "N")).toDF("k", "tag")

    val plain = skewed.join(dim, Seq("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val salted = Partitioning.saltedJoin(skewed, dim, Seq("k"), salt = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(salted == plain)

    // the hot key's rows really land on multiple shuffle partitions
    val saltCounts = skewed
      .withColumn("s", pmod(hash(skewed.columns.map(col): _*), lit(8)))
      .filter(col("k") === "hot")
      .select("s").distinct().count()
    assert(saltCounts > 1, "salting failed to spread the hot key")
  }

  test("AQE skew-join vs saltedJoin crossover (the saltedJoin scaladoc " +
      "table): default byte gates leave a sub-threshold hot key " +
      "unsplit, lowered gates split it, salting works at any size — " +
      "all arms row-equal") {
    import spark.implicits._
    // q157-shaped fixture with a synthetic hot key: one supplier key
    // owns 50k lineitem rows, the rest are sparse
    val li = spark.range(50000).select(lit(7L).as("k"),
        (col("id") % 50).as("q"))
      .union(spark.range(2000).select((col("id") % 100).as("k"),
        (col("id") % 50).as("q")))
    val sup = spark.range(100).select(col("id").as("k"),
      (col("id") % 25).as("nation"))
    def agg(j: org.apache.spark.sql.DataFrame) =
      j.groupBy("nation").agg(count(lit(1)).as("n"), sum("q").as("sq"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
    def withConf[A](pairs: (String, String)*)(body: => A): A = {
      val olds = pairs.map { case (k, _) => k -> spark.conf.get(k) }
      try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
      finally olds.foreach { case (k, v) => spark.conf.set(k, v) }
    }
    def planOf(j: org.apache.spark.sql.DataFrame)
        : (Seq[(Long, Long, Long)], String) = {
      val out = j.groupBy("nation")
        .agg(count(lit(1)).as("n"), sum("q").as("sq"))
      val rows = out.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sorted.toSeq
      (rows, out.queryExecution.executedPlan.toString) // AQE final plan
    }
    // force SMJ (broadcast would dissolve the skew — table row 1)
    val noBhj = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1")
    // arm 1: default gates — the hot partition is ~KBs, far below the
    // 256 MB skewedPartitionThresholdInBytes, so AQE leaves it alone
    val (defRows, defPlan) = withConf(noBhj: _*) {
      planOf(li.join(sup, Seq("k")))
    }
    assert(!defPlan.contains("skew=true"),
      "default AQE gates split a sub-threshold partition — the " +
        "crossover table's premise changed:\n" + defPlan)
    // arm 2: gates lowered to test scale — AQE now splits the join
    val (splitRows, splitPlan) = withConf(noBhj ++ Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16kb",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8kb",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false"): _*) {
      planOf(li.join(sup, Seq("k")))
    }
    assert(splitPlan.contains("skew=true"),
      "lowered gates did not trigger an AQE skew split:\n" + splitPlan)
    // arm 3: explicit salting — no byte gate, works at any hot-key size
    val saltRows = withConf(noBhj: _*) {
      agg(Partitioning.saltedJoin(li, sup, Seq("k"), salt = 8))
    }
    assert(defRows == splitRows && splitRows == saltRows &&
      defRows.nonEmpty)
  }
}
