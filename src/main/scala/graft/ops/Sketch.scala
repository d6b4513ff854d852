package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X5 — mergeable frequency sketches and weighted sampling.
  *
  * The count-min sketch is THE mergeable frequency structure for corpus
  * analytics at 100 TB: the sketch is d×w counters regardless of corpus
  * size, partial aggregation collapses every partition to at most d×w
  * rows before the single shuffle, and two sketches built over disjoint
  * shards merge by elementwise addition — so per-shard sketches roll up
  * a cluster-wide vocabulary frequency table without ever shuffling the
  * tokens themselves. Estimates only ever OVERcount (each cell is a
  * superset sum), which is the safe direction for the ops this feeds:
  * hot-token detection, stop-word harvesting, df-cutoff seeding.
  *
  * Hashing is md5-derived (row i's bucket = first 8 hex chars of
  * md5("i:value") mod w), not Spark's Murmur3, for the same reason as
  * [[Scale.hashSample]]: any engine reproduces the exact sketch, so the
  * whole chain — build, merge, probe — is oracle-replayable bit for bit.
  * One md5 per (row, value) is the portability cost; at scale the build
  * is one narrow pass over tokens, the same cost class as tokenizing.
  *
  * Reference scope: stockanalyses-downloader has no sketch surface
  * (no analytics at all, `downloader/main.py` is record-at-a-time I/O);
  * this lane is part of the beyond-reference LLM-pipeline mandate.
  */
object Sketch {

  /** Row-i bucket for a value: first 32 bits of md5("i:v"), mod w.
    * conv() parses the 8 hex chars as an unsigned value (< 2^32, so the
    * long cast never wraps negative and plain % == pmod). */
  private def bucket(value: Column, i: Int, w: Int): Column =
    conv(substring(md5(concat(lit(i.toString), lit(":"),
      value.cast("string"))), 1, 8), 16, 10).cast("long") % w

  /** Build a d×w count-min sketch over `valueCol`: one row per occupied
    * cell, (r, b, cnt). The explode fans each value to its d cells, and
    * because the groupBy key space is exactly d×w, map-side partial
    * aggregation bounds the shuffle at d×w rows PER PARTITION no matter
    * how many values flow in — the sketch never grows with the corpus. */
  def cmsBuild(df: DataFrame, valueCol: String, d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 1, s"cms needs d >= 1, w >= 1, got d=$d w=$w")
    val cells = (0 until d).map(i =>
      struct(lit(i).as("r"), bucket(col(valueCol), i, w).as("b")))
    df.select(explode(array(cells: _*)).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketches built with the SAME (d, w): elementwise counter sum.
    * This is the shard roll-up: per-day / per-shard sketches combine into
    * the corpus sketch with a d×w-bounded aggregation, never re-reading
    * the shards. */
  def cmsMerge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "cmsMerge needs at least one sketch")
    sketches.reduce(_ unionByName _)
      .groupBy(col("r"), col("b"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Point-estimate frequencies for `probes` (one row per distinct probe
    * value): est = min over the d rows of the probed cell's counter, 0
    * for a never-written cell. The sketch side is d×w rows — broadcast —
    * so probing any number of candidates is a narrow pass over the
    * probes, no shuffle of the corpus. CMS guarantee: est >= true count
    * always; est <= true + eps·N with the usual (eps, delta) for
    * (d, w) = (ceil(ln 1/delta), ceil(e/eps)). */
  def cmsEstimate(cms: DataFrame, probes: DataFrame, valueCol: String,
      d: Int, w: Int): DataFrame = {
    val cells = (0 until d).map(i =>
      struct(lit(i).as("r"), bucket(col(valueCol), i, w).as("b")))
    probes.select(col(valueCol), explode(array(cells: _*)).as("rb"))
      .select(col(valueCol), col("rb.r").as("r"), col("rb.b").as("b"))
      .join(broadcast(cms), Seq("r", "b"), "left")
      .groupBy(col(valueCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Weighted sampling WITHOUT replacement, k rows, P(i beats j) =
    * w_i / (w_i + w_j) — the exponential race (Efraimidis–Spirakis),
    * but run on integers: each row enters `weightCol` tickets, every
    * ticket draws a 128-bit md5, the row's race key is its MINIMUM
    * ticket hash, and the k smallest keys win. The min of w iid uniforms
    * is exactly the Beta(1, w) draw the float formulation computes as
    * u^(1/w) — same distribution, but no log/pow, so there is no libm
    * ulp to diverge across engines: the selection replays bit-identically
    * in any SQL dialect (the portability property all X5 sampling shares).
    *
    * Cost: the explode is one row per unit of weight — for token-count
    * weights that is the corpus token count, the same linear pass class
    * as tokenization — then min-agg partial-combines map-side (one row
    * per doc reaches the shuffle) and the k winners come from
    * TakeOrderedAndProject, never a global sort. For unbounded weights
    * (where ticket fan-out would dominate) switch the key to the float
    * exponential form; the race semantics are unchanged. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.select(col(idCol), col(weightCol),
        explode(sequence(lit(1), col(weightCol).cast("int"))).as("_t"))
      .select(col(idCol), col(weightCol),
        md5(concat(col(idCol).cast("string"), lit(":"),
          col("_t").cast("string"))).as("_tkey"))
      .groupBy(col(idCol), col(weightCol))
      .agg(min(col("_tkey")).as("sample_key"))
      .orderBy(col("sample_key"), col(idCol))
      .limit(k)
  }
}
