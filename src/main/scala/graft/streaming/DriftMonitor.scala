package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Sketch

/** ST10 — streaming distribution-drift monitor (ops-plane composition).
  *
  * A training-data pipeline's silent failure mode is DISTRIBUTION drift:
  * the feed keeps flowing, rows keep validating, but the value
  * distribution walks away from what the model was trained on. The
  * monitor composes the engine's own pieces: each micro-batch is binned
  * with [[Sketch.histBuildWith]] against the BASELINE's pinned bounds
  * (the same pinned-bounds contract as incremental histogram
  * maintenance — out-of-range drift lands loudly in the edge bins), the
  * batch's per-bin shares are compared to the baseline's, and one JSON
  * line per batch carries the L1 distance in parts-per-million —
  * integer arithmetic end to end (floor(cnt·1e6 / n) shares), so the
  * alarm threshold means the same thing on every engine and every run.
  *
  * Per batch the work is one histBuildWith pass (partial agg to
  * ≤ nBins rows) plus a ≤ nBins-row broadcast join — O(batch) compute,
  * O(nBins) state, no growing stream state at all. The baseline is a
  * plain DataFrame: refresh it by swapping the frame (e.g. from a
  * snapshot version via the x7 lanes) without touching the query.
  */
object DriftMonitor {

  /** L1 drift between a batch histogram and the baseline, both over the
    * baseline's bounds, as a ONE-ROW frame (`l1_ppm` BIGINT) — the
    * batch-expressible kernel (judged as `x10_drift` since round 12,
    * comparing two snapshot versions); [[l1DriftPpm]] collapses it to
    * the scalar the streaming wrapper publishes. */
  def l1DriftFrame(batch: DataFrame, valueCol: String, baseline: DataFrame,
      nBins: Int): DataFrame = {
    val bounds = baseline.select(col("lo"), col("hi")).limit(1)
    val h = Sketch.histBuildWith(batch.select(col(valueCol)), valueCol,
      nBins, bounds)
    val share = (c: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =>
      floor(c * 1000000L / n).cast("long")
    val b = h.select(col("bin"), col("cnt").as("cnt_b"))
      .crossJoin(broadcast(h.agg(sum(col("cnt")).as("n_b"))))
    val base = baseline.select(col("bin"), col("cnt").as("cnt_0"))
      .crossJoin(broadcast(baseline.agg(sum(col("cnt")).as("n_0"))))
    val joined = b.join(base, Seq("bin"), "full_outer")
      .select(
        abs(coalesce(share(col("cnt_b"), col("n_b")), lit(0L)) -
          coalesce(share(col("cnt_0"), col("n_0")), lit(0L))).as("d"))
    joined.agg(coalesce(sum(col("d")), lit(0L)).as("l1_ppm"))
  }

  /** Scalar form of [[l1DriftFrame]] for the per-batch publish path. */
  def l1DriftPpm(batch: DataFrame, valueCol: String, baseline: DataFrame,
      nBins: Int): Long =
    l1DriftFrame(batch, valueCol, baseline, nBins).head().getLong(0)

  /** Watch a streaming frame: per micro-batch, publish one JSON line
    * `{"batch":N,"rows":R,"l1_ppm":D}`. Empty batches publish rows=0
    * with zero drift (no data is not drift). */
  def monitor(stream: DataFrame, valueCol: String, baseline: DataFrame,
      nBins: Int, publish: String => Unit): StreamingQuery =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        val n = batch.count()
        val d = if (n == 0) 0L else l1DriftPpm(batch, valueCol, baseline, nBins)
        publish(s"""{"batch":$id,"rows":$n,"l1_ppm":$d}""")
      }
      .start()
}
