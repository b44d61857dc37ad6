package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Same-JVM interleaved A/B for q139's `gradePairs` input
  * materialization (round-17 optimization): arm A is the round-16
  * form — each pair side feeds two consumers (tp join + its own
  * count) UNCUT, so both upstream dedup pipelines (q18 minhash LSH,
  * q19 ngram Jaccard) execute once per consumer inside one plan —
  * vs arm B, the shipped form with one eager localCheckpoint per
  * side (each pipeline executes exactly once; the checkpointed pair
  * tables are candidate-volume-sized). Arms alternate A,B,A,B,… in
  * one JVM so slow box drift hits both equally; the data cache is
  * cleared between runs (the Bench protocol).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  *   tools/run_main.sh graft.GradeABProbe
  *
  * Results in NOTES.md ("grade-ab") and OPTIMIZATION_r17.md.
  */
object GradeABProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // q18 / q19 exactly as SparkEntry declares them
    def pred(): DataFrame = graft.dedup.Dedup.minhashLsh(
      docs, col("doc_id"), col("text"),
      shingleK = 8, numHashes = 12, bands = 3, threshold = 0.3,
      maxBucketSize = 1000)
    def truth(): DataFrame = graft.dedup.Dedup.ngramJaccard(
      docs, col("doc_id"), col("text"),
      shingleK = 8, threshold = 0.3, maxDf = 100)

    // arm A: round-16 gradePairs, inlined (no input cut)
    def armA(): DataFrame = {
      val p = pred().select(col("id1"), col("id2")).distinct()
      val t = truth().select(col("id1"), col("id2")).distinct()
      val tp = p.join(t, Seq("id1", "id2")).agg(count(lit(1)).as("tp"))
      val np = p.agg(count(lit(1)).as("n_pred"))
      val nt = t.agg(count(lit(1)).as("n_truth"))
      tp.crossJoin(broadcast(np)).crossJoin(broadcast(nt))
        .select(col("n_pred"), col("n_truth"), col("tp"),
          (col("n_pred") - col("tp")).as("fp"),
          (col("n_truth") - col("tp")).as("fn"),
          expr("CASE WHEN n_pred > 0 THEN (tp * 10000) div n_pred END")
            .as("precision_bp"),
          expr("CASE WHEN n_truth > 0 THEN (tp * 10000) div n_truth END")
            .as("recall_bp"),
          expr("CASE WHEN n_pred + n_truth > 0 THEN " +
            "(2 * tp * 10000) div (n_pred + n_truth) END").as("f1_bp"))
    }
    // arm B: the shipped checkpointed form
    def armB(): DataFrame =
      graft.dedup.Dedup.gradePairs(pred = pred(), truth = truth())

    def once(f: () => DataFrame): (Double, String) = {
      val t0 = System.nanoTime()
      val df = f()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val sig = df.collect().toSeq.sortBy(_.toString).mkString("|")
      spark.catalog.clearCache()
      (sec, sig)
    }

    val rounds = sys.env.getOrElse("GRADE_AB_ROUNDS", "3").toInt
    once(armB _); once(armA _) // JVM warm, both plans compiled
    val as = collection.mutable.ArrayBuffer[Double]()
    val bs = collection.mutable.ArrayBuffer[Double]()
    var sigs = Set[String]()
    for (r <- 1 to rounds) {
      val (ta, sa) = once(armA _); as += ta; sigs += sa
      val (tb, sb) = once(armB _); bs += tb; sigs += sb
      println(f"[grade-ab] round $r: A(uncut)=$ta%.2f s  B(ckpt)=$tb%.2f s")
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
    println(f"[grade-ab] medians: A=${med(as.toSeq)}%.2f s " +
      f"B=${med(bs.toSeq)}%.2f s, arms_equal=${sigs.size == 1}")
    spark.stop()
  }
}
