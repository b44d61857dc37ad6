package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** topk_by: graft's bounded top-k TypedImperativeAggregate (registered via
  * SparkSessionExtensions in Sessions). Covers the contracts the similarity
  * operators lean on: window-formulation equivalence (duplicate ids, tied
  * scores), serde roundtrip, merge of empty/partial buffers, the buffer
  * size bound, null skipping, analysis-time type checks, and the plan
  * shape (partial aggregation below the exchange) that is the whole reason
  * the aggregate exists.
  */
class TopKByScoreSpec extends SparkSpec {

  // ---- end-to-end equivalence -------------------------------------------

  test("equals the row_number window formulation (dup ids, tied scores, multi-partition)") {
    // id % 37 duplicates ids within groups; score % 17 forces score ties
    // both within and across ids; 16 partitions force partial/merge paths.
    val df = spark.range(5000).repartition(16).select(
      (col("id") % 11).as("g"),
      (col("id") % 37).as("cid"),
      ((col("id") * 131) % 17).cast("double").as("score"))
    val k = 5
    val viaAgg = df.groupBy("g")
      .agg(call_function("topk_by", col("cid"), col("score"), lit(k)).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("pos"), col("col.id").as("cid"),
        col("col.score").as("score"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // reference semantics: per id keep its best score (argmax), then rank
    // by (score desc, id asc) and keep k
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("cid").asc)
    val viaWindow = df.groupBy("g", "cid").agg(max("score").as("score"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("g"), (col("rn") - 1).as("pos"), col("cid"), col("score"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(viaAgg == viaWindow)
  }

  test("duplicate ids keep their best score once (argmax), ties break by id asc") {
    import spark.implicits._
    val df = Seq(
      (1, 10L, 1.0), (1, 10L, 3.0), (1, 10L, 2.0), // dup id: argmax 3.0
      (1, 20L, 3.0),                               // tied with 10's best
      (1, 30L, 0.5))
      .toDF("g", "cid", "score")
    val out = df.groupBy("g")
      .agg(call_function("topk_by", col("cid"), col("score"), lit(2)).as("top"))
      .select(posexplode(col("top")))
      .collect().map(r => (r.getInt(0), r.getStruct(1).getLong(0),
        r.getStruct(1).getDouble(1)))
    assert(out.toSeq == Seq((0, 10L, 3.0), (1, 20L, 3.0)))
  }

  test("k larger than the distinct-id count returns all ids, in rank order") {
    import spark.implicits._
    val df = Seq((1, 7L, 0.1), (1, 7L, 0.4), (1, 9L, 0.2)).toDF("g", "cid", "score")
    val out = df.groupBy("g")
      .agg(call_function("topk_by", col("cid"), col("score"), lit(100)).as("top"))
      .select(explode(col("top")).as("e"))
      .collect().map(r => (r.getStruct(0).getLong(0), r.getStruct(0).getDouble(1)))
    assert(out.toSeq == Seq((7L, 0.4), (9L, 0.2)))
  }

  test("string ids work in SQL (interpreted ordering path)") {
    import spark.implicits._
    Seq(("a", 1.0), ("b", 2.0), ("c", 2.0), ("a", 5.0))
      .toDF("cid", "score").createOrReplaceTempView("topk_in")
    val out = spark.sql("SELECT topk_by(cid, score, 2) AS top FROM topk_in")
      .select(explode(col("top")).as("e"))
      .collect().map(r => (r.getStruct(0).getString(0), r.getStruct(0).getDouble(1)))
    assert(out.toSeq == Seq(("a", 5.0), ("b", 2.0)))
  }

  // ---- direct buffer-contract tests (the paths a wrong merge would hide) --

  private def makeAgg(k: Int) = TopKByScore(
    BoundReference(0, LongType, nullable = true),
    BoundReference(1, DoubleType, nullable = true), k)

  private def evalPairs(agg: TopKByScore,
      buf: scala.collection.mutable.ArrayBuffer[(Any, Double)]): Seq[(Long, Double)] = {
    val arr = agg.eval(buf).asInstanceOf[ArrayData]
    (0 until arr.numElements()).map { i =>
      val st = arr.getStruct(i, 2)
      (st.getLong(0), st.getDouble(1))
    }
  }

  test("serialize/deserialize roundtrip preserves the buffer") {
    val agg = makeAgg(3)
    var buf = agg.createAggregationBuffer()
    Seq((1L, 0.5), (2L, 0.9), (1L, 0.7), (3L, 0.1)).foreach { case (id, s) =>
      buf = agg.update(buf, InternalRow(id, s))
    }
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.toSeq == buf.toSeq)
    assert(evalPairs(agg, back) == evalPairs(agg, buf))
  }

  test("merge of empty buffers is empty; merge with one empty side is identity") {
    val agg = makeAgg(3)
    val bothEmpty = agg.merge(
      agg.createAggregationBuffer(), agg.createAggregationBuffer())
    assert(evalPairs(agg, bothEmpty).isEmpty)

    var buf = agg.createAggregationBuffer()
    buf = agg.update(buf, InternalRow(5L, 2.0))
    buf = agg.update(buf, InternalRow(6L, 1.0))
    val expected = evalPairs(agg, buf)
    // merge mutates its left argument, so evaluate eagerly per case
    assert(evalPairs(agg,
      agg.merge(buf.clone(), agg.createAggregationBuffer())) == expected)
    assert(evalPairs(agg,
      agg.merge(agg.createAggregationBuffer(), buf.clone())) == expected)
  }

  test("merge of overfull partials re-trims to the same result as one pass") {
    val agg = makeAgg(4)
    val rows = (0 until 200).map(i => ((i % 25).toLong, ((i * 7) % 31).toDouble))
    // single-pass reference
    var whole = agg.createAggregationBuffer()
    rows.foreach { case (id, s) => whole = agg.update(whole, InternalRow(id, s)) }
    // two partials merged
    val (l, r) = rows.splitAt(97)
    var b1 = agg.createAggregationBuffer()
    l.foreach { case (id, s) => b1 = agg.update(b1, InternalRow(id, s)) }
    var b2 = agg.createAggregationBuffer()
    r.foreach { case (id, s) => b2 = agg.update(b2, InternalRow(id, s)) }
    assert(evalPairs(agg, agg.merge(b1, b2)) == evalPairs(agg, whole))
  }

  test("buffer length never exceeds max(2k, k+16) during update") {
    val agg = makeAgg(3)
    val bound = math.max(2 * 3, 3 + 16)
    var buf = agg.createAggregationBuffer()
    (0 until 500).foreach { i =>
      buf = agg.update(buf, InternalRow(i.toLong, (i % 41).toDouble))
      assert(buf.length <= bound, s"buffer grew to ${buf.length} at row $i")
    }
  }

  test("null ids and null scores are skipped") {
    val agg = makeAgg(2)
    var buf = agg.createAggregationBuffer()
    buf = agg.update(buf, InternalRow(null, 1.0))
    buf = agg.update(buf, InternalRow(7L, null))
    buf = agg.update(buf, InternalRow(7L, 0.25))
    assert(evalPairs(agg, buf) == Seq((7L, 0.25)))
  }

  // ---- analysis-time guards ----------------------------------------------

  test("unorderable id type fails at analysis, not at task runtime") {
    import spark.implicits._
    val df = Seq((1, 1.0)).toDF("k", "s")
      .select(map(col("k"), col("k")).as("mid"), col("s"))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(call_function("topk_by", col("mid"), col("s"), lit(2))).collect()
    }
    assert(e.getMessage.contains("orderable"))
  }

  test("non-literal k is rejected with the argument name") {
    import spark.implicits._
    val df = Seq((1L, 1.0)).toDF("cid", "s")
    val e = intercept[Exception] {
      df.agg(call_function("topk_by", col("cid"), col("s"), col("cid"))).collect()
    }
    assert(e.getMessage.contains("'k'"))
  }

  // ---- plan shape: the aggregate's reason to exist ------------------------

  test("plan runs a partial ObjectHashAggregate with no exchange below it") {
    import org.apache.spark.sql.catalyst.expressions.aggregate.Partial
    import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // q26's shape: scored rows → per-group top-k. Input is a multi-split
      // range with NO repartition: any exchange below the partial
      // aggregate would then be one the aggregate itself caused.
      val df = spark.range(10000).select(
        (col("id") % 50).as("query_id"), col("id").as("corpus_id"),
        ((col("id") * 131) % 997).cast("double").as("sim"))
      val out = df.groupBy("query_id")
        .agg(call_function("topk_by", col("corpus_id"), col("sim"), lit(10))
          .as("top"))
      val plan = out.queryExecution.executedPlan
      val partials = plan.collect {
        case o: ObjectHashAggregateExec
            if o.aggregateExpressions.exists(_.mode == Partial) => o
      }
      assert(partials.nonEmpty, s"no partial ObjectHashAggregate:\n$plan")
      partials.foreach { p =>
        val below = p.child.collect { case e: ShuffleExchangeExec => e }
        assert(below.isEmpty,
          s"exchange below the partial aggregate — map-side fold lost:\n$plan")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
