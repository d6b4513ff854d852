package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round 19 (r18 verdict item 5): COVERAGE.md is the authoritative
  * row-by-row coverage map, and its prose Totals paragraph lagged the
  * registry twice (r17: 291 stated vs 292 actual). This spec makes the
  * drift a failing test: the declared-query and oracle-checked tallies
  * stated in COVERAGE.md must equal the live `Queries.all` registry.
  * No Spark session needed — pure file + registry arithmetic. */
class CoverageTallySpec extends AnyFunSuite {

  private def coverageText: String = {
    val src = scala.io.Source.fromFile("COVERAGE.md", "UTF-8")
    try src.mkString finally src.close()
  }

  test("COVERAGE.md Totals paragraph matches the Queries.all registry") {
    val totals =
      raw"""\*\*Totals: (\d+) declared queries \((\d+) oracle-checked""".r
    totals.findFirstMatchIn(coverageText) match {
      case Some(m) =>
        val declared = m.group(1).toInt
        val oracleChecked = m.group(2).toInt
        assert(declared == Queries.all.size,
          s"COVERAGE.md claims $declared declared queries; registry has " +
            s"${Queries.all.size} — refresh the Totals paragraph")
        val actualOracle = Queries.all.count(_.oracle.isDefined)
        assert(oracleChecked == actualOracle,
          s"COVERAGE.md claims $oracleChecked oracle-checked; registry " +
            s"has $actualOracle — refresh the Totals paragraph")
      case None =>
        fail("COVERAGE.md has no parseable '**Totals: N declared queries " +
          "(M oracle-checked' paragraph — the authoritative map lost its " +
          "machine-checkable tally")
    }
  }

  test("registry names are unique (the CORRECTNESS artifact keys by name)") {
    val dupes = Queries.all.groupBy(_.name).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: ${dupes.mkString(", ")}")
  }
}
