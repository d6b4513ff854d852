package graft

/** Every declared query EXECUTES at sf0.001 — the local tripwire for the
  * round-12 failure class, where a driver testdata regeneration changed
  * a physical parquet encoding and 16 queries silently dropped out of
  * the correctness artifact (Verify catches the exception, deletes the
  * output, and the driver just records fewer queries; nothing local
  * failed). This spec makes "every QuerySpec fn runs against the current
  * testdata" an `sbt test` invariant: an analysis-time break (type
  * mismatch, unresolved column, schema drift) fails HERE, named, before
  * any artifact is produced.
  *
  * Execution, not just planning: limit(1) forces each plan through its
  * full operator chain (a TakeOrdered over whatever the query computes)
  * while keeping the data volume trivial at sf0.001; streaming replays
  * and snapshot fixtures run their real paths (memoized per dir by
  * oncePerDir, so repeated suites stay cheap). Value correctness stays
  * the oracle gate's job — this is purely the does-it-run contract.
  */
class AllQueriesSmokeSpec extends SparkSpec {
  private val d = sf("sf0.001")

  Queries.all.foreach { q =>
    test(s"${q.name} executes against current testdata") {
      // any thrown analysis/execution error fails the named test
      q.fn(spark, d).limit(1).collect()
      ()
    }
  }
}
