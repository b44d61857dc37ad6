package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale evidence for `semanticContamination`'s cell-routed large-test
  * arm (similarity/Similarity.scala): the round-8 rewrite replaced the
  * |corpus|×|test| distributed product with a spherical
  * triangle-inequality bound that prunes whole test cells per corpus
  * row. This probe measures both promised regimes on a >1M-row test
  * set:
  *
  *  - CLUSTERED (benchmark-shaped: many near-copies of few prompts,
  *    built as seeded perturbations of corpus vectors): most cells
  *    prune for most corpus rows → pairs actually scored should be a
  *    tiny fraction of the full product;
  *  - UNIFORM (adversarial: test vectors spread over the sphere, cell
  *    radii huge): pruning finds nothing, the arm degrades gracefully
  *    to the distributed product — compared against the broadcast
  *    arm's time on the same set, and output-equality-checked.
  *
  * Routing survivor counts come from the operator's OWN
  * `contaminationRouting` (package-private extraction), never a
  * re-derivation of the bound math. One JSON line per regime:
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_scale_root/emb/x10 \
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.ContaminationProbe"
  *
  * Results in NOTES.md ("cell-routed contamination ladder").
  */
object ContaminationProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/tmp/graft_scale_root/emb/x10")
    val nClustered = sys.env.getOrElse("SPARK_GRAFT_NTEST", "1050000").toLong
    val nUniform = sys.env.getOrElse("SPARK_GRAFT_NUNIFORM", "50000").toLong
    val threshold = 0.9
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val nCorpus = corpus.count()
    val dim = corpus.select(size(col("embedding"))).first().getInt(0)

    // benchmark-shaped test set: tight seeded clusters around the
    // first `nSeeds` corpus vectors (cos(member, seed) ~ 0.9998 —
    // paraphrase-grade copies, the contamination target)
    val seeds: Array[Array[Float]] = corpus
      .orderBy("vec_id").limit(256).collect()
      .map(_.getSeq[Float](1).toArray)
    val bSeeds = spark.sparkContext.broadcast(seeds)
    def clustered(n: Long): DataFrame =
      spark.range(n).map { id =>
        val s = bSeeds.value((id % bSeeds.value.length).toInt)
        val rnd = new java.util.Random(id * 2654435761L + 17)
        var norm = 0.0; s.foreach(x => norm += x.toDouble * x.toDouble)
        val rms = math.sqrt(norm / s.length)
        (id, s.map(x => (x + 0.02 * rms * rnd.nextGaussian()).toFloat))
      }.toDF("test_id", "tv")

    // adversarial test set: isotropic Gaussian directions — cell radii
    // approach pi/2 and the bound can prune (almost) nothing
    def uniform(n: Long): DataFrame =
      spark.range(n).map { id =>
        val rnd = new java.util.Random(id * 2654435761L + 29)
        (id, Array.fill(dim)(rnd.nextGaussian().toFloat))
      }.toDF("test_id", "tv")

    def timeCount(df: => DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = df.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    // ---- clustered regime: the >1M-row rung through the public API
    // (nTest > the 1M default => cell-routed arm engages naturally)
    val tCl = clustered(nClustered).cache(); tCl.count()
    val (secCl, hitsCl) = timeCount(
      graft.similarity.Similarity.semanticContamination(
        corpus, "vec_id", "embedding", tCl, "test_id", "tv", threshold))
    // routing stats via the operator's own bound math
    val cCanon = corpus.select(col("vec_id").as("id"),
      col("embedding").as("v"))
    val tCanon = tCl.select(col("test_id").cast("long").as("test_id"),
      col("tv"))
    val (assigned, candidates, _) = graft.similarity.Similarity
      .contaminationRouting(cCanon, tCanon, threshold, nClustered)
    val candCount = candidates.count()
    val cellSizes = assigned.groupBy("cell").count()
    val liveCells = cellSizes.count()
    val pairsScored = candidates.groupBy("cell").count()
      .withColumnRenamed("count", "nc")
      .join(cellSizes, "cell")
      .agg(sum(col("nc") * col("count"))).first().getLong(0)
    assigned.unpersist()
    println(s"""{"metric":"contamination_clustered","n_corpus":$nCorpus,""" +
      s""""n_test":$nClustered,"live_cells":$liveCells,""" +
      s""""cand_row_cells":$candCount,""" +
      s""""surviving_cells_per_corpus_row":${candCount.toDouble / nCorpus},""" +
      s""""pairs_scored":$pairsScored,""" +
      s""""full_product":${nCorpus * nClustered},""" +
      s""""pairs_over_product":${pairsScored.toDouble / (nCorpus * nClustered)},""" +
      s""""sec":$secCl,"contaminated_rows":$hitsCl}""")
    tCl.unpersist()

    // ---- uniform regime: same set through ALL arms, wall-clock +
    // output equality. The public API (low maxBroadcastTest) should
    // now ROUTE to the chunked arm here — the fan-out estimate sees
    // unprunable cells; the cell-join arm is pinned directly via the
    // package-private pieces to keep the historical comparison.
    val tU = uniform(nUniform).cache(); tU.count()
    val tUC = tU.select(col("test_id").cast("long").as("test_id"),
      col("tv"))
    def run(maxB: Long) = graft.similarity.Similarity.semanticContamination(
      corpus, "vec_id", "embedding", tU, "test_id", "tv", threshold,
      maxBroadcastTest = maxB)
    def cellArm() = {
      val (a, cand, _) = graft.similarity.Similarity
        .contaminationRouting(cCanon, tUC, threshold, nUniform)
      val out = graft.similarity.Similarity.cellArmScore(a, cand, threshold)
      (a, out)
    }
    // routed at maxB = nUniform/2 (two chunks): chunk size IS maxB,
    // so forcing it very low measures per-chunk job overhead (50
    // sequential Spark jobs at maxB=1000), not the arm — production's
    // 1M default gives single-digit chunk counts on any real test set
    val (secRouted, hitsRouted) = timeCount(run(nUniform / 2))
    val (secBcast, hitsBcast) = timeCount(run(Long.MaxValue))
    val t0c = System.nanoTime()
    val (aCell, outCell) = cellArm()
    val hitsCell = outCell.count()
    val secCell = (System.nanoTime() - t0c) / 1e9
    aCell.unpersist()
    val armsEqual = run(nUniform / 2).collect().toSet == run(Long.MaxValue)
      .collect().toSet
    println(s"""{"metric":"contamination_uniform","n_corpus":$nCorpus,""" +
      s""""n_test":$nUniform,"sec_routed":$secRouted,""" +
      s""""sec_cell_arm":$secCell,""" +
      s""""sec_broadcast_arm":$secBcast,"hits_routed":$hitsRouted,""" +
      s""""hits_cell":$hitsCell,""" +
      s""""hits_broadcast":$hitsBcast,"arms_equal":$armsEqual}""")
    spark.stop()
  }
}
