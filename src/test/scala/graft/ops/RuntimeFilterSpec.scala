package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  test("bloom prune has no false negatives: pruned join == plain join") {
    val facts = (1L to 20000L).map(i => (i % 997, i)).toDF("key", "v")
    val dim = Seq(3L, 11L, 250L, 996L).toDF("key")
    val bloom = RuntimeFilter.keyBloom(dim, "key", expectedItems = 1024)
    val pruned = RuntimeFilter.pruneByBloom(facts, "key", bloom)
      .join(dim, Seq("key")).as[(Long, Long)].collect().toSet
    val plain = facts.join(dim, Seq("key")).as[(Long, Long)].collect().toSet
    assert(pruned == plain)
    assert(plain.nonEmpty)
  }

  test("bloom prune actually prunes (selectivity near fpp for non-members)") {
    val facts = (1L to 50000L).toDF("key")
    val dim = (1L to 100L).map(_ * 1000000L).toDF("key") // disjoint from facts
    val bloom = RuntimeFilter.keyBloom(dim, "key", expectedItems = 1024,
      fpp = 0.03)
    val survivors = RuntimeFilter.pruneByBloom(facts, "key", bloom).count()
    // all 50k facts are non-members; survivors are pure false positives.
    // 3% nominal -> allow generous slack, but an unselective filter
    // (the thing this operator exists to prevent) must fail the test
    assert(survivors < 5000, s"bloom not selective: $survivors / 50000 passed")
  }

  test("null keys stay null through the probe (filter drops them, as a join would)") {
    val facts = Seq(Some(1L), None, Some(2L)).toDF("key")
    val bloom = RuntimeFilter.keyBloom(Seq(1L).toDF("key"), "key", 16)
    val out = RuntimeFilter.pruneByBloom(facts, "key", bloom)
      .as[Option[Long]].collect().toSeq
    assert(out == Seq(Some(1L)))
  }

  test("the probe sits on the scan side BELOW the join and stays codegen'd") {
    // spark.range, not toDF: a Filter over a LocalRelation gets evaluated
    // away by ConvertToLocalRelation and would vanish from the plan
    val facts = spark.range(1, 1001)
      .select(col("id").as("key"), (col("id") * 2).as("v"))
    val dim = Seq(1L, 2L).toDF("key")
    val bloom = RuntimeFilter.keyBloom(dim, "key", 16)
    val joined = RuntimeFilter.pruneByBloom(facts, "key", bloom)
      .join(dim, Seq("key"))
    val plan = planOf(joined)
    assert(plan.contains("Filter graft_bloom_contains"),
      "bloom probe not a Filter on the scan:\n" + plan.take(2000))
    // WholeStageCodegen spans are only visible in the FINAL adaptive plan
    // (pre-AQE executedPlan strings omit them) — execute, then assert the
    // probe Filter fused into a codegen span (no CodegenFallback boundary)
    // collect() (not count(), which builds its OWN plan) so THIS
    // queryExecution finalizes and exposes the adaptive plan, where
    // codegen membership prints as a `*(stageId)` node prefix
    assert(joined.collect().length == 2)
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Filter graft_bloom_contains""".r
        .findFirstIn(finalPlan).isDefined,
      "probe Filter not fused into a codegen stage:\n" + finalPlan.take(2000))
  }
}
