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
}
