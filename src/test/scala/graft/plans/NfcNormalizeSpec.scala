package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize` — the codegen'd scalar expression: Unicode NFC
  * ground truths (built from explicit \u escapes — source-file literals
  * can't be trusted to stay decomposed), the already-normalized fast
  * path, null propagation, codegen == interpreted, and the
  * Text.normalizeText composition.
  */
class NfcNormalizeSpec extends SparkSpec {

  private val decomposed = "Cafe\u0301" // e + COMBINING ACUTE
  private val composed = "Caf\u00e9" //    precomposed e-acute

  private def viaSpark(ss: Seq[String]): Seq[String] = {
    import spark.implicits._
    ss.toDF("s")
      .select(call_function("nfc_normalize", col("s")))
      .collect().map(_.getString(0)).toSeq
  }

  test("Unicode ground truths: composes decomposed accents, leaves " +
      "ligatures alone (NFC, not NFKC), idempotent, ASCII unchanged") {
    val out = viaSpark(Seq(
      decomposed, composed, "\ufb01le", "A\u030a", "plain ascii"))
    assert(out(0) == composed) //              composition happened
    assert(out(1) == composed) //              idempotent on composed input
    assert(out(2) == "\ufb01le") // fi-ligature NOT decomposed (not NFKC)
    assert(out(3) == "\u00c5") // A + combining ring -> precomposed Aring
    assert(out(4) == "plain ascii")
    assert(java.text.Normalizer.isNormalized(
      out(0), java.text.Normalizer.Form.NFC))
  }

  test("already-normalized fast path returns the input reference " +
      "(no reallocation), and the kernel equals java.text.Normalizer") {
    val in = UTF8String.fromString("already normal")
    assert(NfcNormalize.nfc(in) eq in)
    val deco = UTF8String.fromString(decomposed)
    assert(NfcNormalize.nfc(deco).toString ==
      java.text.Normalizer.normalize(
        decomposed, java.text.Normalizer.Form.NFC))
    assert(NfcNormalize.nfc(deco).toString == composed)
  }

  test("null propagates; SQL registration works; codegen matches " +
      "interpreted eval") {
    import spark.implicits._
    val df = Seq[(Integer, String)]((1, decomposed), (2, null))
      .toDF("id", "s")
    // embed the decomposed string into the SQL text itself — Spark's
    // chr() is mod-256 (ASCII-only), unlike DuckDB's codepoint chr()
    val viaSql = spark
      .sql(s"SELECT nfc_normalize('$decomposed')")
      .collect().head.getString(0)
    assert(viaSql == composed)
    val rows = df.select(col("id"),
        call_function("nfc_normalize", col("s")).as("n"))
      .collect().map(r => r.getInt(0) -> Option(r.getString(1))).toMap
    assert(rows(1) == Some(composed) && rows(2).isEmpty)
    // interpreted eval (direct expression) == the codegen'd df path
    val interpreted = NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString(decomposed))).eval(null)
    assert(interpreted.toString == composed)
  }

  test("Text.normalizeText: NFC + lower + explicit-class ws collapse + " +
      "trim, null-propagating") {
    import spark.implicits._
    val out = Seq(
        "  HeLLo\t\tWorld \n x ",
        "E\u0301cole", // decomposed E+acute -> nfc -> lower
        null)
      .toDF("s")
      .select(graft.functions.Text.normalizeText(col("s")))
      .collect().map(r => Option(r.getString(0)))
    assert(out(0) == Some("hello world x"))
    assert(out(1) == Some("\u00e9cole"))
    assert(out(2).isEmpty)
  }
}
