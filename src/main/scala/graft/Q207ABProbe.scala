package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM interleaved A/B for q207's bootstrap-replicate pass (the
  * heaviest statistics op, r17 VERDICT item 9). Arms compute the SAME
  * (g, b, nb, sb) replicate table (asserted equal every round):
  *
  *   A: shipped shape — explode ×32 then md5-filter then groupBy
  *      (map-side combined; 32M exploded rows at sf0.1)
  *   B: 4 passes × 8 replicates as conditional aggregates (16 buffer
  *      columns per pass — r17 measured the 64-wide single pass SLOWER;
  *      this probes the 16-wide middle)
  *   C: A with the membership predicate simplified to a single string
  *      compare — md5(x) < '8' ⇔ first hex digit ∈ 0..7 (lowercase hex:
  *      '0'..'7' < '8' < 'a'..'f') — drops the substring+conv+cast
  *      chain per (row, replicate)
  *
  * Usage: tools/run_main.sh graft.Q207ABProbe [sfDir] [rounds]
  */
object Q207ABProbe {
  private val Reps = 32

  private def base(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")
      .filter(col("value").isNotNull)
      .select(col("event_type").as("g"),
        col("event_id").cast("string").as("id"),
        expr("CAST(CAST(value AS DECIMAL(18,4)) * 100 AS BIGINT)").as("v"))
      .filter(col("g").isNotNull && col("id").isNotNull &&
        col("v").isNotNull)

  private def armA(b: DataFrame): DataFrame = b
    .withColumn("b", explode(array((0 until Reps).map(r =>
      lit(r.toLong)): _*)))
    .filter(conv(substring(md5(concat(col("id"), lit(":bs:"),
      col("b").cast("string"))), 1, 1), 16, 10).cast("long") < 8L)
    .groupBy(col("g"), col("b"))
    .agg(count(lit(1)).as("nb"),
      sum(col("v").cast("decimal(38,0)")).as("sb"))

  private def armB(b: DataFrame): DataFrame = {
    val passes = (0 until 4).map { p =>
      val aggs = (0 until 8).flatMap { r =>
        val rep = p * 8 + r
        val member = conv(substring(md5(concat(col("id"),
          lit(s":bs:$rep"))), 1, 1), 16, 10).cast("long") < 8L
        Seq(
          sum(when(member, 1L).otherwise(0L)).as(s"nb_$rep"),
          sum(when(member, col("v").cast("decimal(38,0)")))
            .as(s"sb_$rep"))
      }
      val wide = b.groupBy(col("g")).agg(aggs.head, aggs.tail: _*)
      val stackExpr = (0 until 8).map { r =>
        val rep = p * 8 + r
        s"${rep}L, nb_$rep, sb_$rep"
      }.mkString(s"stack(8, ", ", ", ") as (b, nb, sb)")
      wide.select(col("g"), expr(stackExpr)).filter(col("nb") > 0)
    }
    passes.reduce(_ unionAll _)
  }

  private def armC(b: DataFrame): DataFrame = b
    .withColumn("b", explode(array((0 until Reps).map(r =>
      lit(r.toLong)): _*)))
    .filter(md5(concat(col("id"), lit(":bs:"),
      col("b").cast("string"))) < "8")
    .groupBy(col("g"), col("b"))
    .agg(count(lit(1)).as("nb"),
      sum(col("v").cast("decimal(38,0)")).as("sb"))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val b = base(spark, sfDir).localCheckpoint(true)

    def sig(df: DataFrame): String = {
      val rows = df.select(col("g"), col("b"), col("nb"),
          col("sb").cast("string"))
        .collect().map(_.toString).sorted
      java.util.Arrays.hashCode(rows.asInstanceOf[Array[AnyRef]]).toString
    }
    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // results pinned equal once up front
    val (sa, sb2, sc) = (sig(armA(b)), sig(armB(b)), sig(armC(b)))
    require(sa == sb2 && sa == sc,
      s"arm results differ: A=$sa B=$sb2 C=$sc")
    println(s"arms agree (sig $sa); timing $rounds interleaved rounds")
    val ts = collection.mutable.Map("A" -> List.empty[Double],
      "B" -> List.empty[Double], "C" -> List.empty[Double])
    (1 to rounds).foreach { r =>
      Seq("A" -> (() => armA(b)), "B" -> (() => armB(b)),
          "C" -> (() => armC(b))).foreach { case (n, f) =>
        val s = time(f())
        ts(n) = ts(n) :+ s
        println(f"round $r arm $n: $s%.2f s")
      }
    }
    ts.toSeq.sortBy(_._1).foreach { case (n, xs) =>
      val m = xs.sorted.apply(xs.length / 2)
      println(f"arm $n median $m%.2f s  (${xs.map(x => f"$x%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
