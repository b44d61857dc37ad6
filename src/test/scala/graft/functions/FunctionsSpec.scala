package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {

  private def eval1(c: org.apache.spark.sql.Column): Any = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("r")).collect().head.get(0)
  }

  test("tokens drops empties from leading/trailing/multiple whitespace") {
    val r = eval1(Text.tokens(lit("  a  b\tc \n")))
    assert(r.asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("a", "b", "c"))
  }

  test("charShingles of short strings is empty (no descending sequence)") {
    assert(eval1(Text.charShingles(lit("abc"), 8)).asInstanceOf[scala.collection.Seq[_]].isEmpty)
    assert(eval1(Text.charShingles(lit("abcd"), 4)).asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("abcd"))
    assert(eval1(Text.charShingles(lit("abcde"), 4)).asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("abcd", "bcde"))
  }

  test("wordShingles builds n-grams over tokens") {
    val r = eval1(Text.wordShingles(Text.tokens(lit("a b c")), 2))
    assert(r.asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("a b", "b c"))
  }

  test("wordShingles zip_with form is bit-identical to the old " +
      "transform+slice formulation (n = 1..4, short/exact/empty inputs)") {
    // the per-ELEMENT re-evaluation formulation this replaced — kept
    // here as the semantic reference
    def oldForm(toks: org.apache.spark.sql.Column, n: Int) =
      when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
    val inputs = Seq("a b c d e", "a b", "a", "", "x  y   z", "one")
    for (s <- inputs; n <- 1 to 4) {
      val toks = Text.tokens(lit(s))
      val neu = eval1(Text.wordShingles(toks, n))
        .asInstanceOf[scala.collection.Seq[String]].toSeq
      val old = eval1(oldForm(toks, n))
        .asInstanceOf[scala.collection.Seq[String]].toSeq
      assert(neu == old, s"input='$s' n=$n: $neu != $old")
    }
  }

  test("canonicalizeUrl: case/www/default-port/trailing-slash/tracking/" +
      "fragment variants collapse; meaningful differences survive") {
    def cu(s: String): String =
      eval1(Text.canonicalizeUrl(lit(s))).asInstanceOf[String]
    // every chrome variant of the same page -> one key
    val want = "http://ex.com/Docs/3?a=1&b=2"
    assert(cu("HTTP://WWW.Ex.COM:80/Docs/3/?utm_source=f&b=2&a=1#frag")
      == want)
    assert(cu("http://ex.com/Docs/3?b=2&a=1") == want)
    assert(cu(" http://www.ex.com/Docs/3/?a=1&utm_campaign=x&b=2 ") == want)
    // https strips :443, not :80
    assert(cu("HTTPS://ex.com:443/p") == "https://ex.com/p")
    assert(cu("https://ex.com:80/p") == "https://ex.com:80/p")
    // a NON-default port is meaning, not chrome
    assert(cu("http://ex.com:8080/p") == "http://ex.com:8080/p")
    // path case preserved (case-sensitive by spec); root becomes empty
    assert(cu("http://ex.com/A/b") == "http://ex.com/A/b")
    assert(cu("http://EX.com/") == "http://ex.com")
    // all-tracking query disappears entirely (no dangling '?'); bare
    // 'ref' without '=' is stripped too, 'refresh=1' is NOT (the
    // pattern requires a param boundary)
    assert(cu("http://ex.com/p?utm_a=1&fbclid=2&gclid=3&ref") ==
      "http://ex.com/p")
    assert(cu("http://ex.com/p?refresh=1") == "http://ex.com/p?refresh=1")
    // scheme-less input passes through trimmed, unparsed
    assert(cu("  not a url  ") == "not a url")
  }

  test("md5Mod matches an independent JVM md5 computation") {
    val s = "hello"
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = digest.map("%02x".format(_)).mkString
    val expected = java.lang.Long.parseLong(hex.take(15), 16) % Hashing.MinhashP
    assert(eval1(Hashing.md5Mod(lit(s))) == expected)
  }

  test("minhash signature: equal sets => equal signatures, high overlap => mostly equal") {
    import spark.implicits._
    val df = Seq(
      ("d1", "the quick brown fox jumps over the lazy dog of the river"),
      ("d2", "the quick brown fox jumps over the lazy dog of the rivers"),
      ("d3", "completely different content with nothing shared at all xyz"))
      .toDF("id", "text")
    val sig = df.select(col("id"),
      Hashing.minhashSignature(
        array_distinct(Text.charShingles(col("text"), 4)), 16).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val agree12 = sig("d1").zip(sig("d2")).count { case (a, b) => a == b }
    val agree13 = sig("d1").zip(sig("d3")).count { case (a, b) => a == b }
    assert(agree12 > agree13)
    assert(sig("d1").length == 16)
  }

  test("simhash: identical token sets collide; disjoint sets differ") {
    import spark.implicits._
    val r = Seq(
      ("a", "alpha beta gamma delta"),
      ("b", "alpha beta gamma delta"),
      ("c", "epsilon zeta eta theta iota kappa"))
      .toDF("id", "text")
      .select(col("id"), Hashing.simhash(Text.tokens(col("text"))).as("sh"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("a") == r("b"))
    assert(r("a") != r("c"))
    // 64-bit fingerprint: any long value is legal (sign bit = digest MSB);
    // pin the width by matching the typed kernel, which FunctionsSpec
    // can reach via the package-private simhashSignatures
    import spark.implicits._
    val kernel = graft.dedup.Dedup.simhashSignatures(
        Seq(("a", "alpha beta gamma delta")).toDF("id", "text"),
        col("id"), col("text"))
      .collect().head.getLong(1)
    assert(r("a") == kernel, "Column simhash drifted from the kernel")
  }

  test("hammingDistance counts differing bits") {
    assert(eval1(Hashing.hammingDistance(lit(0L), lit(7L))) == 3)
    assert(eval1(Hashing.hammingDistance(lit(5L), lit(5L))) == 0)
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f), Seq(0.0f, 2.0f)))
      .toDF("a", "b", "c")
    val row = df.select(
      Vectors.cosine(col("a"), col("b")).as("same"),
      Vectors.cosine(col("a"), col("c")).as("orth"),
      Vectors.l2sq(col("a"), col("c")).as("d2")).collect().head
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(row.getDouble(1)) < 1e-12)
    assert(math.abs(row.getDouble(2) - 5.0) < 1e-12)
  }

  test("langId picks the language with most stopword hits") {
    assert(eval1(Text.langId(lit("the cat is in the house"))) == "en")
    assert(eval1(Text.langId(lit("der hund ist nicht da und"))) == "de")
    assert(eval1(Text.langId(lit("le chat est dans la maison"))) == "fr")
    assert(eval1(Text.langId(lit("xyzzy plugh"))) == "und")
  }

  test("quality/punct/alpha ratios on edge cases") {
    assert(eval1(Text.punctRatio(lit(""))) == 0.0)
    assert(eval1(Text.punctRatio(lit("!!!"))) == 1.0)
    assert(eval1(Text.alphaRatio(lit("ab12"))) == 0.5)
  }

  test("PII counters find emails, IPv4s and phones; clean text counts 0") {
    val s = "mail a.b+c@ex-1.org or boss@corp.io, host 10.0.255.7, " +
      "call +1 555-123-4567 or 800-555-0100 thanks"
    assert(eval1(Text.emailCount(lit(s))) == 2)
    assert(eval1(Text.ipv4Count(lit(s))) == 1)
    assert(eval1(Text.phoneCount(lit(s))) == 2)
    assert(eval1(Text.emailCount(lit("no pii here at all"))) == 0)
    assert(eval1(Text.ipv4Count(lit("version 1.2 of 3"))) == 0)
    assert(eval1(Text.phoneCount(lit("sections 12-345 and 1-2-3"))) == 0)
  }

  test("redactPii replaces every match with its typed token") {
    val s = "a@b.co then 192.168.0.1 then +44 123-456-7890 end"
    assert(eval1(Text.redactPii(lit(s))) ==
      "[EMAIL] then [IP] then [PHONE] end")
    // idempotent on clean text
    assert(eval1(Text.redactPii(lit("plain words"))) == "plain words")
    // count/redact parity: after redaction all counters read 0
    assert(eval1(Text.emailCount(Text.redactPii(lit(s)))) == 0)
    assert(eval1(Text.ipv4Count(Text.redactPii(lit(s)))) == 0)
    assert(eval1(Text.phoneCount(Text.redactPii(lit(s)))) == 0)
  }

  private def gopher(s: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minStop: Int = 2): Map[String, Any] = {
    import spark.implicits._
    val row = Seq(1).toDF("x")
      .select(Text.gopherRules(lit(s), minWords = minWords,
        maxWords = maxWords, minStopwordHits = minStop).as("g"))
      .select("g.*").collect().head
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  test("gopherRules: each rule fires on its own pathology and the " +
      "published defaults hold on plain prose") {
    val prose = ("the cat sat on the mat and we have to be " +
      "patient with that idea ") * 5 // 75 words, all rules clean
    val ok = gopher(prose)
    assert(ok("ok_words") == true && ok("ok_mean_word_len") == true &&
      ok("ok_symbol_ratio") == true && ok("ok_bullet_lines") == true &&
      ok("ok_ellipsis_lines") == true && ok("ok_alpha_words") == true &&
      ok("ok_stopwords") == true && ok("pass") == true &&
      ok("n_words") == 75L)
    // word count out of range (too short) — only that rule fails
    val short = gopher("the dog and that have to be quick")
    assert(short("ok_words") == false && short("pass") == false &&
      short("ok_stopwords") == true)
    // hash/ellipsis spam: 8 symbols over 60 words > 1/10
    val spam = gopher(("w " * 52) + ("# " * 4) + ("... " * 4) +
      "the of and be", minWords = 10)
    assert(spam("ok_symbol_ratio") == false && spam("ok_words") == true)
    // bullet lines: 10 of 11 lines start with '-' or '*' > 9/10
    val bullets = (1 to 5).map(i => s"- item the $i").mkString("\n") +
      "\n" + (1 to 5).map(i => s"* item of $i").mkString("\n") +
      "\nthe plain and line that we have to be with " + ("w " * 40)
    assert(gopher(bullets, minWords = 10)("ok_bullet_lines") == false)
    // ellipsis-terminated lines: 2 of 4 > 3/10
    val ell = "the first line is fine\nsecond one trails ...\n" +
      "third of them also trails...\nlast line that we have " + ("w " * 46)
    assert(gopher(ell, minWords = 10)("ok_ellipsis_lines") == false)
    // non-alphabetic words: 20 of 60 numeric > the 1/5 allowance
    val nums = ("42 " * 20) + ("the of and that be with have to " * 5)
    assert(gopher(nums, minWords = 10)("ok_alpha_words") == false)
    // mean word length: single-char words pull the mean under 3
    val tiny = ("a b c d " * 15) + "the of"
    assert(gopher(tiny, minWords = 10)("ok_mean_word_len") == false)
  }

  test("gopherRules stopword rule counts DISTINCT stopwords, not " +
      "occurrences, and zero-word docs fail via ok_words") {
    // 'the' twelve times is still ONE distinct hit
    val rep = gopher(("the " * 12) + ("w " * 48), minWords = 10)
    assert(rep("ok_stopwords") == false)
    assert(gopher(("the of " * 6) + ("w " * 48),
      minWords = 10)("ok_stopwords") == true)
    val empty = gopher("   ", minWords = 10)
    assert(empty("n_words") == 0L && empty("ok_words") == false &&
      empty("pass") == false)
  }

  private def c4(s: String, minLineWords: Int = 5,
      minSentences: Int = 3): Map[String, Any] = {
    import spark.implicits._
    val row = Seq(1).toDF("x")
      .select(Text.c4Rules(lit(s), minLineWords = minLineWords,
        minSentences = minSentences).as("c"))
      .select("c.*").collect().head
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  test("c4Rules: each line rule drops exactly its pathology and the " +
      "page rules fire independently") {
    val good = "the cat sat on the mat today.\n" +
      "we walked to the store and back!\n" +
      "is this the right question to ask?"
    val ok = c4(good)
    assert(ok("n_lines") == 3L && ok("n_lines_kept") == 3L &&
      ok("n_sentences") == 3L && ok("ok_sentences") == true &&
      ok("ok_lorem") == true && ok("ok_brace") == true &&
      ok("pass") == true && ok("clean_text") == good)
    // line with < 5 words dropped, even when punctuated
    val short = c4("too few words here.\n" + good)
    assert(short("n_lines") == 4L && short("n_lines_kept") == 3L)
    // line without terminal punctuation dropped (trailing spaces ignored)
    val unpunct = c4("this line has five words but no period\n" + good)
    assert(unpunct("n_lines_kept") == 3L)
    assert(c4("ends with a quoted word \"stop\"  ")("n_lines_kept") == 1L)
    // the javascript rule is case-insensitive and drops the whole line
    val js = c4("please enable JavaScript to view this page.\n" + good)
    assert(js("n_lines_kept") == 3L)
    // sentence count reads the CLEANED text: a dropped line's periods
    // don't count toward ok_sentences
    val dropped = c4("a. b. c. d.\n" + "the only kept line is this one.",
      minSentences = 2)
    assert(dropped("n_sentences") == 1L && dropped("ok_sentences") == false)
    // page rules: lorem ipsum / brace reject the page but keep the
    // per-rule fields independent
    val lorem = c4(good + "\nfooter: Lorem Ipsum dolor sit amet etc.")
    assert(lorem("ok_lorem") == false && lorem("ok_brace") == true &&
      lorem("pass") == false)
    val brace = c4(good + "\nif (x) { return the value of it; }")
    assert(brace("ok_brace") == false && brace("ok_lorem") == true &&
      brace("pass") == false)
    // zero kept lines fails pass even when page rules hold
    val none = c4("no punct here at all", minSentences = 0)
    assert(none("n_lines_kept") == 0L && none("clean_text") == "" &&
      none("pass") == false)
  }

  test("c4Rules composes map-only: stripHtml ∘ c4Rules plans with " +
      "zero exchanges") {
    val d = spark.range(100).select(col("id"),
      concat(lit("<p>the quick brown fox jumps.</p>\n<p>"),
        col("id").cast("string"), lit(" of them ran away too.</p>"))
        .as("html"))
    val out = d.select(col("id"),
      Text.c4Rules(Text.stripHtml(col("html")))("pass").as("pass"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("subwordCount equals size(subwordTokens) — the lookaround-free " +
      "RE2-replayable form counts the same units") {
    val cases = Seq(
      "plain words only here",
      "data-set query's 3.14 a,b;c",
      "x!!!y", "...", "a  b\tc\nd", "abc123 mixed9runs",
      "", " ", "trailing punct.")
    for (s <- cases) {
      val viaSplit = eval1(size(Text.subwordTokens(lit(s))))
      val viaExtract = eval1(Text.subwordCount(lit(s)))
      assert(viaExtract == viaSplit, s"on '$s'")
    }
    assert(eval1(Text.subwordCount(lit("data-set query's"))) == 6)
  }

  test("the extraction/quality stack composes map-only: stripHtml ∘ " +
      "normalizeText ∘ gopherRules plans with zero exchanges") {
    val d = spark.range(100).select(col("id"),
      concat(lit("<p>"), col("id").cast("string"), lit(" the of</p>"))
        .as("html"))
    val out = d.select(col("id"),
      Text.gopherRules(
        Text.normalizeText(Text.stripHtml(col("html"))))("pass")
        .as("pass"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("stripHtml: block removal order, entity decoding order, unknown " +
      "entities and word boundaries preserved") {
    def sh(s: String): String = eval1(Text.stripHtml(lit(s))).asInstanceOf[String]
    // a '<' INSIDE a script body: the block must go before the generic
    // tag pass would mis-parse '< 2;</script>' as one tag
    assert(sh("<p>keep</p><script>if (1 < 2) { x(); }</script><p>this</p>")
      == "keep this")
    assert(sh("a<style>p { color: red }</style>b") == "a b")
    // tags become spaces so adjacent words don't fuse
    assert(sh("one</p><p>two") == "one two")
    // &amp; decodes LAST: '&amp;lt;' is the literal text '&lt;', not '<'
    assert(sh("x &amp;lt; y") == "x &lt; y")
    assert(sh("a &lt;b&gt; &quot;c&quot; &#39;d&#39; e&nbsp;f &amp; g")
      == "a <b> \"c\" 'd' e f & g")
    // unknown entities pass through undecoded
    assert(sh("&copy; 2026 &middot; x") == "&copy; 2026 &middot; x")
    // attributes and self-closing tags; multi-line input collapses
    assert(sh("<a href=\"/x?a=1&amp;b=2\">link</a>\n<br/>next")
      == "link next")
    // case-insensitive block tags
    assert(sh("<SCRIPT>var a;</SCRIPT>done<STYLE>b</STYLE>") == "done")
  }

  test("fleschMil == plain-Scala integer model; fragments count one " +
      "sentence; vowel groups proxy syllables; empty text is NULL") {
    import spark.implicits._
    def model(text: String): Option[Long] = {
      val w = text.split("\\s+").count(_.nonEmpty).toLong
      if (w == 0) None else {
        val s = math.max(1L,
          "[.!?]+".r.findAllIn(text).length.toLong)
        val y = "[aeiouy]+".r.findAllIn(text.toLowerCase).length.toLong
        Some(206835L - (1015L * w) / s - (84600L * y) / w)
      }
    }
    val texts = Seq(
      "The cat sat on the mat. It was happy!",
      "no punctuation fragment",
      "Incomprehensibility notwithstanding, parallelization terminated.",
      "a e i o u",
      "    ",
      "Multi. Sentence? Text! With... runs?!")
    val got = texts.toDF("tx")
      .select(col("tx"), graft.functions.Text.fleschMil(col("tx")))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    texts.foreach { t => assert(got(t) == model(t), s"text: '$t'") }
    // whitespace-only text has no words -> NULL
    assert(got("    ").isEmpty)
    // short common words read easier than latinate mouthfuls
    assert(got(texts.head).get > got(texts(2)).get)
  }
}
