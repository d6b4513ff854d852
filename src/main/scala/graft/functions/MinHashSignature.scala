package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: the full MinHash signature of a shingle
  * array in ONE fused kernel.
  *
  * Semantics are EXACTLY the builtin route it replaces
  * (Dedup.minhash pre-round-4):
  *
  *   transform(sequence(0, numHashes-1),
  *     h -> array_min(transform(shingles, s -> md5(concat(h, '|', s)))))
  *
  * i.e. sig[h] = lexicographic min over shingles of the lowercase md5 hex
  * of UTF-8 "h|shingle" (nulls skipped; all-null/empty input yields null
  * elements, as array_min does). The DuckDB oracle computes the identical
  * signature, so swapping the kernel does not move the oracle.
  *
  * Why custom (the graft_cosine playbook, CosineSimilarity.scala): Spark's
  * higher-order functions are CodegenFallback — the builtin route runs
  * numHashes interpreted `transform` passes per row, each allocating a
  * UTF8String per shingle plus an array per pass, then numHashes more
  * interpreted `array_min` folds. This expression does one pass over the
  * shingles, hashing each shingle numHashes times with a reused
  * MessageDigest and keeping numHashes running minima as raw digest bytes.
  * Only the winners are hex-encoded. Lowercase-hex lexicographic order
  * equals unsigned-byte order of the digests (nibble -> '0'..'9','a'..'f'
  * is monotonic), so comparing raw bytes is exact, not approximate.
  *
  * The generated code is a single static call, so the expression
  * participates in whole-stage codegen (no CodegenFallback barrier
  * splitting the stage).
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_minhash expects (array<string>, positive int literal), got " +
          s"(${child.dataType.simpleString}, $numHashes)")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashKernel.compute($c, $numHashes);")

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignature = copy(child = newChild)
}

/** The per-row kernel, static so generated code can call it directly. */
object MinHashKernel {
  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val hexChars = "0123456789abcdef".toCharArray

  def compute(shingles: ArrayData, numHashes: Int): ArrayData = {
    val md = mdLocal.get()
    val prefixes = new Array[Array[Byte]](numHashes)
    var h = 0
    while (h < numHashes) {
      prefixes(h) = (h.toString + "|").getBytes(StandardCharsets.UTF_8)
      h += 1
    }
    val mins = new Array[Array[Byte]](numHashes)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i).getBytes
        h = 0
        while (h < numHashes) {
          md.reset()
          md.update(prefixes(h))
          md.update(s)
          val d = md.digest()
          if (mins(h) == null || unsignedLess(d, mins(h))) mins(h) = d
          h += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](numHashes)
    h = 0
    while (h < numHashes) {
      out(h) = if (mins(h) == null) null else UTF8String.fromString(toHex(mins(h)))
      h += 1
    }
    new GenericArrayData(out)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private def toHex(d: Array[Byte]): String = {
    val cs = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      cs(i * 2) = hexChars((d(i) >> 4) & 0xf)
      cs(i * 2 + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(cs)
  }
}
