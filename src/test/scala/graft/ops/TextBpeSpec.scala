package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextBpeSpec extends SparkSpec {
  import spark.implicits._

  test("X4k bpeLearn follows greedy max-frequency merging with the " +
      "(count DESC, x ASC, y ASC) tie-break — hand-computed table") {
    val tiny = Seq((1L, "low low low"), (2L, "lower lower"), (3L, "newest"))
      .toDF("doc_id", "text")
    // freqs: low:3 lower:2 newest:1
    // r1: (l,o) and (o,w) both 5 -> tie-break x: (l,o)
    // r2: (lo,w) 5
    // r3: (low,e) and (e,r) both 2 -> tie-break x: (e,r)
    // r4: (low,er) 2
    assert(TextOps.bpeLearn(tiny, "text", 4) ==
      Seq(("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er")))
  }

  test("X4k bpeLearn stops when no adjacent pairs remain") {
    val tiny = Seq((1L, "a b a b")).toDF("doc_id", "text")
    // single-char words: nothing to merge, regardless of numMerges asked
    assert(TextOps.bpeLearn(tiny, "text", 8).isEmpty)
  }

  test("X4k bpeEncode applies merges greedily and is LOSSLESS " +
      "(drop spaces, map | back to space == lower(text))") {
    val merges = Seq(("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er"))
    val docs = Seq((1L, "low lower newest"), (2L, "Lo OW")).toDF("doc_id", "text")
    val out = TextOps.bpeEncode(docs, "text", merges)
    // [low] [lower] [n e w e s t] = 1 + 1 + 6 tokens ("lower" closes via
    // the (low, er) merge — components first, then their composition)
    assert(out.filter(col("doc_id") === 1).select("n_bpe").as[Int].head() == 8)
    // "lo" merges, "ow" stays chars (l,o wins the span first in 'low' but
    // in isolation 'ow' has no (o,w) merge in this table)
    assert(out.filter(col("doc_id") === 2).select("n_bpe").as[Int].head() == 3)
    val bad = out.withColumn("rt",
      call_function("replace",
        call_function("replace", col("enc"), lit(" "), lit("")),
        lit("|"), lit(" ")))
      .filter(col("rt") =!= lower(col("text")))
    assert(bad.count() == 0)
  }

  test("X4k defaultMerges IS bpeLearn(sf0.001 documents, 32) — the frozen " +
      "artifact cannot drift from its derivation") {
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    assert(TextOps.bpeLearn(docs, "text", 32) == TextOps.defaultMerges)
  }
}
