package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that would otherwise fail silently: a
  * mistyped oracle key records a rows-only check instead of a hash
  * check, and an oracle without a query is dead SQL.
  */
class ContractSpec extends AnyFunSuite {

  // queries that intentionally have no DuckDB oracle — empty since round
  // 3 (q32's decode stubs became md5-derived, so even the multimodal
  // pipeline is hash-checked); keep the escape hatch for future ops
  private val rowsOnly = Set.empty[String]

  test("every query has an oracle unless explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == rowsOnly, s"queries without oracle: $missing")
  }

  test("no orphaned oracle SQL") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("oracle SQL only references fixture tables") {
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings",
      "range") // DuckDB's generator table function
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      // the lookbehind skips the null-safe comparison phrase
      // "[IS [NOT]] DISTINCT FROM x" — its FROM is an operator, not a
      // table reference (q185 tripped this)
      val froms = "(?i)(?<!DISTINCT\\s)(?:FROM|JOIN)\\s+([a-z_][a-z0-9_]*)".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
      val unknown = froms -- tables -- extractCteNames(sql)
      assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
    }
  }

  private def extractCteNames(sql: String): Set[String] =
    // WITH [RECURSIVE] name[(col, ...)] AS [MATERIALIZED] (   — and
    // later ", name AS ("; MATERIALIZED is DuckDB's inlining override
    // (q152's 12-round unroll needs it)
    ("(?i)(?:WITH(?:\\s+RECURSIVE)?|,)\\s*([a-z_][a-z0-9_]*)\\s*" +
      "(?:\\([^)]*\\))?\\s+AS\\s*(?:MATERIALIZED\\s*)?\\(").r
      .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet ++
      // subquery aliases: ") alias" and ") AS alias(cols)"
      "(?i)\\)\\s+(?:AS\\s+)?([a-z_][a-z0-9_]*)".r
        .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
}
