package graft

import org.apache.spark.sql.functions._

/** Cell-count scaling evidence for the SemDeDup family: in-cell
  * all-pairs IS the operator's semantics (Abbas et al. 2023), so with a
  * FIXED `nlist` its work grows ~n²/nlist — the round-7 embedding scale
  * ladder measured q58 at exponent ~1.5 with nlist pinned. The paper's
  * (and this library's) scale lever is growing `nlist` with the corpus
  * so cell population stays constant. This probe measures both sides:
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_scale_emb/x10 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.CellScaleProbe"
  *
  * prints one JSON line with semDedup seconds at nlist = fixed (the
  * sf0.1 query's setting, population grows with n) vs scaled
  * (n / target-cell-size, population constant). Results in NOTES.md.
  */
object CellScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    // q58's bench setting vs population-preserving scaling (the sf0.1
    // fixture holds ~250 vectors/cell at nlist=8)
    val fixed = 8
    val scaled = math.max(fixed, (n / 250L).toInt)

    def timed(nlist: Int): Double = {
      val t0 = System.nanoTime()
      graft.similarity.Similarity.semDedup(
          emb, "vec_id", "embedding",
          threshold = 0.35, nlist = nlist, trainIters = 1)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    timed(fixed) // warm JIT/codegen once
    val tFixed = timed(fixed)
    val tScaled = timed(scaled)
    println(s"""{"metric":"semdedup_cells","rows":$n,""" +
      s""""nlist_fixed":$fixed,"sec_fixed":$tFixed,""" +
      s""""nlist_scaled":$scaled,"sec_scaled":$tScaled}""")
    spark.stop()
  }
}
