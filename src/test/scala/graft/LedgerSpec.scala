package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.11 is the judged coverage ledger; `SparkEntry.queries` is the
  * gated surface. The two drifted twice (round 8: two ids missing from the
  * family rows; round 9: two more) because nothing machine-checked them.
  * This spec makes the ledger EXACT: every op id in the §2.11 family-table
  * rows must be a registered query, and every registered query must appear
  * in some family row — so an op can neither ship unledgered nor be
  * claimed without a gate. No SparkSession needed: pure text vs the
  * registry keyset.
  */
class LedgerSpec extends AnyFunSuite {

  test("SURVEY §2.11 family rows enumerate exactly SparkEntry.queries") {
    val survey = new java.io.File("SURVEY.md")
    assert(survey.isFile, s"SURVEY.md not found at ${survey.getAbsolutePath}")
    val lines = {
      val src = scala.io.Source.fromFile(survey, "UTF-8")
      try src.getLines().toVector finally src.close()
    }
    val start = lines.indexWhere(_.startsWith("### 2.11"))
    assert(start >= 0, "SURVEY.md has no §2.11 heading")
    val end = lines.indexWhere(_.startsWith("## §3"), start)
    assert(end > start, "SURVEY.md §2.11 is not followed by §3")
    // family-table data rows only (skip headers/rules): prose above the
    // tables name ids narratively and must not count as ledger entries
    val tableRows = lines.slice(start, end).filter(l =>
      l.startsWith("| ") && !l.startsWith("| family") && !l.startsWith("|---"))
    assert(tableRows.nonEmpty, "§2.11 family tables are empty")
    // backticked lowercase_underscore tokens are the op ids; qualified
    // names (dots), URIs, and placeholders fail the pattern by design
    val ledger = tableRows
      .flatMap("`([a-z0-9_]+)`".r.findAllMatchIn(_).map(_.group(1)))
      .toSet
    val registered = SparkEntry.queries.keySet
    val unregistered = ledger -- registered
    val unledgered = registered -- ledger
    assert(unregistered.isEmpty,
      s"§2.11 lists ids with no SparkEntry.queries gate: " +
        unregistered.toSeq.sorted.mkString(", "))
    assert(unledgered.isEmpty,
      s"SparkEntry.queries ids missing from the §2.11 family rows: " +
        unledgered.toSeq.sorted.mkString(", "))
  }

  test("every gated query has an oracle or is a declared rows-only op") {
    // the rows-only set is a deliberate, enumerated design decision
    // (engine-specific hashing / approximation / codec); anything NEW
    // without an oracle must be added here consciously, not silently
    // (round 12: agg_approx_distinct / agg_approx_percentile left via the
    // differential error-bound gates; round 13: the PNG-codec quartet left
    // too — the synthesized pixels are a pure function of the text bytes,
    // so DuckDB recomputes the features/dHash from hex(encode(text)) while
    // Spark still runs the real codec round-trip. The set is now EMPTY:
    // every gated query is hash-oracled.)
    val declaredRowsOnly = Set.empty[String]
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == declaredRowsOnly,
      s"oracle coverage drifted - undeclared rows-only: " +
        s"${(noOracle -- declaredRowsOnly).toSeq.sorted.mkString(", ")}; " +
        s"declared but now oracled: " +
        s"${(declaredRowsOnly -- noOracle).toSeq.sorted.mkString(", ")}")
  }
}
