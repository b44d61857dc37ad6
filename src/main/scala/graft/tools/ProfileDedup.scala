package graft.tools

import graft.Sessions
import graft.functions.{Hashing, Text}
import org.apache.spark.sql.functions._

/** Ad-hoc stage-by-stage profiler for the minhash pipeline (not part of
  * the driver contract; kept for perf iteration).
  */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val par = spark.sparkContext.defaultParallelism

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val df = spark.read.parquet(s"$dir/documents.parquet")
    time("scan count")(df.count())

    if (args.contains("ngram")) {
      val docs = graft.dedup.Dedup.shingleDocs(
        df, col("doc_id"), col("text"), 8)
      time("shingleDocs")(docs.count())
      time("shingleDocs again (warm)")(docs.count())
      // mirror of the current ngramJaccard shape, stage by stage
      val groups = docs.select(col("id"), explode(col("vms")).as("sh"))
        .groupBy("sh")
        .agg(call_function("collect_list_capped", col("id"), lit(100)).as("ids"),
          count(lit(1)).as("df"))
        .filter(col("df") <= 100)
        .cache()
      time("groups cache (capped agg)")(groups.count())
      val sizes = groups.select(explode(col("ids")).as("id"))
        .groupBy("id").agg(count(lit(1)).as("nsh"))
      time("sizes")(sizes.count())
      time("sizes warm")(sizes.count())
      val fusedRows = graft.dedup.Dedup.emitPairAndSizeCounts(
        groups, org.apache.spark.sql.types.LongType)
      time("fused kernel only")(fusedRows.count())
      time("fused kernel only warm")(fusedRows.count())
      val unified = graft.dedup.Dedup.emitPairAndSizeCounts(
          groups, org.apache.spark.sql.types.LongType)
        .groupBy("id1", "id2").agg(sum(col("cnt")).as("cnt"))
      time("unified (kernel+sum)")(unified.count())
      time("unified warm")(unified.count())
      val full = graft.dedup.Dedup.ngramJaccard(
        df, col("doc_id"), col("text"), 8, 0.3, 100)
      time("FULL ngramJaccard 1")(full.count())
      time("FULL ngramJaccard 2")(graft.dedup.Dedup.ngramJaccard(
        df, col("doc_id"), col("text"), 8, 0.3, 100).count())
      time("FULL ngramJaccard 3")(graft.dedup.Dedup.ngramJaccard(
        df, col("doc_id"), col("text"), 8, 0.3, 100).count())
      spark.stop(); return
    }

    if (args.contains("decon")) {
      import graft.dedup.Decontaminate
      // corpus-sized test side: 5% of the corpus, false arm forced
      val test = df.filter(col("doc_id") % 20 === 0)
      def arms(): Unit = {
        // A: current shape — LEFT join shuffles every (id, gram) row
        time("A left-join false arm")(Decontaminate.contamination(
          df, col("doc_id"), col("text"), test, col("doc_id"), col("text"),
          n = 13, broadcastTest = false).count())
        // B: restructured — n_shingles map-side, INNER join only for hits
        val d = Decontaminate.tokenShingleDocs(df, col("doc_id"), col("text"), 13)
        val t0 = Decontaminate.tokenShingleDocs(
            test, col("doc_id"), col("text"), 13)
          .select(explode(col("vms")).as("sh")).distinct()
        val perDoc = d.select(col("id"), size(col("vms")).as("n_shingles"))
        val hits = d.select(col("id"), explode(col("vms")).as("sh"))
          .join(t0, Seq("sh"))
          .groupBy("id").agg(count(lit(1)).as("n_contaminated"))
        time("B inner-join restructure")(perDoc.join(hits, Seq("id"), "left")
          .select(col("id"), col("n_shingles"),
            coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
          .count())
        // C: B + driver bloom pre-filter on the corpus gram stream
        val t1 = Decontaminate.tokenShingleDocs(
            test, col("doc_id"), col("text"), 13)
          .select(explode(col("vms")).as("sh")).distinct()
        val nTest = time("C bloom: test gram count")(t1.count())
        val bf = time("C bloom build")(
          t1.stat.bloomFilter("sh", nTest, 0.01))
        val bfB = spark.sparkContext.broadcast(bf)
        val mightContain = udf((x: Long) => bfB.value.mightContain(x))
        val hitsC = d.select(col("id"), explode(col("vms")).as("sh"))
          .filter(mightContain(col("sh")))
          .join(t1, Seq("sh"))
          .groupBy("id").agg(count(lit(1)).as("n_contaminated"))
        time("C bloom+inner")(perDoc.join(hitsC, Seq("id"), "left").count())
      }
      arms(); println("[prof] ---- second pass (warm) ----"); arms()
      spark.stop(); return
    }

    time("FULL minhashLsh cold")(graft.dedup.Dedup.minhashLsh(
      df, col("doc_id"), col("text"), 8, 12, 3, 0.3, Int.MaxValue).count())
    time("FULL minhashLsh warm")(graft.dedup.Dedup.minhashLsh(
      df, col("doc_id"), col("text"), 8, 12, 3, 0.3, Int.MaxValue).count())
    spark.catalog.clearCache()
    time("FULL minhashLsh uncached")(graft.dedup.Dedup.minhashLsh(
      df, col("doc_id"), col("text"), 8, 12, 3, 0.3, Int.MaxValue).count())

    // stage-by-stage, mirroring the real minhashLsh shape
    val docs = graft.dedup.Dedup.shingleDocs(
        df, col("doc_id"), col("text"), 8).cache()
    time("docs cache (shingle+md5)")(docs.count())

    val banded = graft.dedup.Dedup.bandBuckets(docs, 12, 3)
    time("banded (sig kernel)")(banded.count())

    val grouped = banded.groupBy("bucket")
      .agg(call_function("collect_list_capped", col("id"),
          lit(Int.MaxValue)).as("ids"),
        count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .cache()
    time("grouped cache")(grouped.count())

    val pairs = grouped.select(explode(col("ids")).as("id1"), col("ids"))
      .select(col("id1"), explode(col("ids")).as("id2"))
      .filter(col("id1") < col("id2"))
      .distinct().cache()
    time("pairs distinct cache")(pairs.count())

    val verified = pairs
      .join(docs.select(col("id").as("id1"), col("vms").as("sh1")), "id1")
      .join(docs.select(col("id").as("id2"), col("vms").as("sh2")), "id2")
      .withColumn("common", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("sh1")) + size(col("sh2")) - col("common")))
      .filter(col("jaccard") >= 0.3)
    time("verify (2 joins+intersect)")(verified.count())
    time("verify again (warm)")(verified.count())

    spark.stop()
  }
}
