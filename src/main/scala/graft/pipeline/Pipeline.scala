package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.hadoop.fs.Path
import graft.tap.Tap

/** What to do when a stage's output already exists — port of
  * `RerunStrategy` (/root/reference/src/Hadron/Controller.hs:913-924,
  * exists-checks at :867-886). `RSSkip` is the reference's incremental-
  * memoization feature (SURVEY §4: "Port this"): skip the compute and read
  * the existing output instead.
  */
sealed trait RerunStrategy
case object RSFail extends RerunStrategy
case object RSReRun extends RerunStrategy
case object RSSkip extends RerunStrategy

/** One pipeline stage — the `connect` instruction of the Controller DSL
  * (/root/reference/src/Hadron/Controller.hs:676-677): named job from input
  * taps to an output tap via a transform.
  */
final case class Stage(
    name: String,
    inputs: Seq[Tap],
    output: Tap,
    rerun: RerunStrategy = RSReRun)(
    val op: Seq[DataFrame] => DataFrame)

/** Driver-side sequential runner — the Spark-native residue of hadron's
  * free-monad orchestrator (`orchestrate`, Controller.hs:789-906). The
  * instruction stream, state-file replay, run tokens and worker dispatch
  * (workNode, Controller.hs:1006-1143) all disappear: Spark ships closures
  * and the DAG scheduler runs stages; what remains worth porting is the
  * exists-check / rerun policy and per-stage bookkeeping.
  *
  * `runOnce`/`setVal`/`getVal` (Controller.hs:689-696, 724-725) need no
  * machinery at all — they are plain driver `val`s, broadcast automatically
  * inside task closures.
  */
final class Pipeline(spark: SparkSession, stages: Seq[Stage]) {

  private def exists(path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Run all stages in program order (the reference has no optimizer over
    * its instruction stream either — Controller instructions execute
    * sequentially; Catalyst optimizes *within* each stage instead).
    * Returns the names of stages that actually computed.
    */
  def run(): Seq[String] = stages.flatMap { st =>
    val outPath = st.output.paths.head
    (st.rerun, exists(outPath)) match {
      case (RSFail, true) =>
        throw new IllegalStateException(
          s"stage ${st.name}: output $outPath exists (RSFail)")
      case (RSSkip, true) => Nil // memoized: downstream reads existing output
      case _ =>
        spark.sparkContext.setJobDescription(s"stage:${st.name}")
        val out = st.op(st.inputs.map(_.read(spark)))
        st.output.write(out, SaveMode.Overwrite)
        Seq(st.name)
    }
  }
}
