package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Text

/** Sliding-window document chunking — the retrieval/embedding prep
  * step: split each document into token windows of `size` tokens
  * advancing by `size - overlap`, so consecutive chunks share `overlap`
  * tokens of context.
  *
  * Chunk contract: starts are 0, step, 2·step, …, stopping at the
  * first chunk that reaches the end of the tokens —
  * `n_chunks = 1 + ceil(max(0, n − size) / step)` — so every token is
  * covered, the final chunk may be shorter than `size`, and a
  * fully-redundant tail (one whose tokens ALL appeared in the previous
  * chunk) is never emitted. A token-less document yields no chunks.
  * Tokenization is graft's whitespace `Text.tokens`, so chunk text is
  * whitespace-NORMALIZED, not a substring of the original.
  *
  * Map-only (no shuffle); the kernel is a `mapPartitions` walk because
  * the Column formulation (`transform(sequence(...), i ->
  * slice(ws, ...))`) re-evaluates the tokenized array per chunk under
  * interpreted HOF evaluation — the measured blowup documented in
  * NOTES.md. `chunkColumn` is the Column mirror kept for the
  * kernel≡Column equivalence spec (ChunkingSpec).
  */
object Chunking {

  /** @return (id (input type), chunk_idx long 0-based, chunk_text,
    *   n_tokens long) — one row per chunk, document order preserved by
    *   (id, chunk_idx).
    */
  def chunkTokens(
      df: DataFrame,
      idCol: Column,
      textCol: Column,
      size: Int,
      overlap: Int): DataFrame = {
    require(size > 0, "chunk size must be positive")
    require(overlap >= 0 && overlap < size,
      s"overlap must be in [0, size), got $overlap for size $size")
    val step = size - overlap
    // keep the caller's id column name on the output
    val idName = df.select(idCol).schema.head.name
    val base = df.select(idCol.as(idName), textCol.cast("string").as("__text"))
    val schema = StructType(Seq(
      base.schema(idName),
      StructField("chunk_idx", LongType, false),
      StructField("chunk_text", StringType, false),
      StructField("n_tokens", LongType, false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    base.mapPartitions { rows =>
      rows.flatMap { r =>
        val text = r.getString(1)
        val toks =
          if (text == null) Array.empty[String]
          else text.split("\\s+").filter(_.nonEmpty)
        val n = toks.length
        if (n == 0) Iterator.empty
        else {
          val nChunks =
            if (n <= size) 1 else 1 + (n - size + step - 1) / step
          (0 until nChunks).iterator.map { idx =>
            val start = idx * step
            val end = math.min(start + size, n)
            val sb = new java.lang.StringBuilder()
            var i = start
            while (i < end) {
              if (i > start) sb.append(' ')
              sb.append(toks(i))
              i += 1
            }
            org.apache.spark.sql.Row(
              r.get(0), idx.toLong, sb.toString, (end - start).toLong)
          }
        }
      }
    }(enc)
  }

  /** Column mirror of the kernel: array of chunk strings for one text
    * value. Only for the equivalence spec — per-chunk HOF re-evaluation
    * of the token array makes it quadratic on the hot path.
    */
  private[graft] def chunkColumn(
      textCol: Column, size: Int, overlap: Int): Column = {
    val step = size - overlap
    val ws = Text.tokens(textCol)
    when(size_(ws) > 0,
      transform(
        // ceil(max(0, n - size)/step): Column `/` is double division,
        // hence the explicit floor over (x + step - 1)
        sequence(lit(0),
          greatest(lit(0), floor(
            (size_(ws) - size + (step - 1)) / lit(step))).cast("int")),
        i => array_join(slice(ws, i * step + 1, lit(size)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  private def size_(c: Column): Column = org.apache.spark.sql.functions.size(c)

  /** Sentence spans with exact character offsets — the RAG/eval
    * passage-extraction step where BYTE-FAITHFUL provenance matters:
    * each span is (start, len) into the ORIGINAL text, so
    * `substr(text, start, len)` reconstructs the sentence exactly
    * (the oracle proves it by hashing the reconstruction while the
    * operator hashes the piece).
    *
    * Sentence rule (deliberately simple, fully specified): a sentence
    * is a maximal run of non-terminator chars followed by one-or-more
    * `[.!?]` and any trailing whitespace; a final terminator-less tail
    * is its own span. One alternation regex in the shared Java/RE2
    * leftmost-first subset — no lookarounds, no `\s` (Java's includes
    * \x0B where RE2's differs), no `$` (Java's default `$` matches
    * before a final newline, RE2's does not: a real divergence this
    * pattern avoids by using an unanchored tail alternative, correct
    * under leftmost-first because the terminator arm wins wherever a
    * terminator remains).
    *
    * Shape: one codegen'd regexp_extract_all pass + a per-document
    * prefix window (partitions are document-keyed, rows = that
    * document's sentences — bounded, never corpus-wide).
    *
    * @return (id, sent_idx 1.., start 1-based char offset, len,
    *         span_md5) — empty/NULL texts emit nothing
    */
  def sentenceSpans(df: DataFrame, idCol: Column, textCol: Column)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pieces = regexp_extract_all(textCol,
      lit("[^.!?]*[.!?]+[ \t\n\r]*|[^.!?]+"), lit(0))
    val w = Window.partitionBy("id").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(idCol.as("id"), posexplode(pieces).as(Seq("i", "piece")))
      .select(col("id"), (col("i") + 1).cast("long").as("sent_idx"),
        (lit(1L) + coalesce(sum(length(col("piece"))).over(w), lit(0L)))
          .as("start"),
        length(col("piece")).cast("long").as("len"),
        md5(col("piece").cast("binary")).as("span_md5"))
  }
}
