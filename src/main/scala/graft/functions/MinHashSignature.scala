package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: the full MinHash signature of a document's
  * token array in ONE fused kernel — word-`shingleSize`-gram shingling
  * included.
  *
  * Semantics are EXACTLY the builtin route it replaces
  * (Dedup.minhash pre-round-4; here for shingleSize = 3):
  *
  *   shingles = transform(sequence(1, n-2),
  *                i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))
  *   sig = transform(sequence(0, numHashes-1),
  *           h -> array_min(transform(shingles, s -> md5(concat(h, '|', s)))))
  *
  * i.e. sig[h] = lexicographic min over word n-gram shingles of the
  * lowercase md5 hex of UTF-8 "h|shingle" (null tokens skipped by
  * concat_ws; fewer than shingleSize tokens yields null elements, as
  * array_min over an empty array does). `shingleSize = 1` hashes the
  * elements themselves (pre-shingled input). The DuckDB oracle computes
  * the identical signature, so the kernel does not move the oracle.
  *
  * Why custom (the graft_cosine playbook, CosineSimilarity.scala): Spark's
  * higher-order functions are CodegenFallback — the builtin route runs
  * interpreted lambda passes per row (one to build shingles, numHashes to
  * hash, numHashes more to fold minima), allocating every intermediate
  * string. This kernel streams token BYTES straight into a reused
  * MessageDigest (prefix, tok[i], ' ', tok[i+1], ...) — the shingle
  * string is never materialized — and keeps numHashes running minima as
  * raw digest bytes; only winners are hex-encoded. Lowercase-hex
  * lexicographic order equals unsigned-byte order of the digests (nibble
  * -> '0'..'9','a'..'f' is monotonic), so comparing raw bytes is exact.
  *
  * With shingling inside, the whole projection is this one codegen-able
  * expression: the enclosing stage stays in whole-stage codegen instead
  * of dropping to interpreted eval at a CodegenFallback barrier.
  */
case class MinHashSignature(child: Expression, numHashes: Int,
    shingleSize: Int = 1) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 && shingleSize > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_minhash expects (array<string>, positive int literal" +
          s"[, positive int literal]), got (${child.dataType.simpleString}, " +
          s"$numHashes, $shingleSize)")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.compute(input.asInstanceOf[ArrayData], numHashes, shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashKernel.compute($c, $numHashes, $shingleSize);")

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignature = copy(child = newChild)
}

/** The per-row kernel, static so generated code can call it directly. */
object MinHashKernel {
  private val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val hexChars = "0123456789abcdef".toCharArray

  private val SPACE = " ".getBytes(StandardCharsets.UTF_8)

  def compute(toks: ArrayData, numHashes: Int, shingleSize: Int): ArrayData = {
    val md = mdLocal.get()
    val prefixes = new Array[Array[Byte]](numHashes)
    var h = 0
    while (h < numHashes) {
      prefixes(h) = (h.toString + "|").getBytes(StandardCharsets.UTF_8)
      h += 1
    }
    // token bytes fetched once; null tokens stay null (concat_ws skips
    // them — no separator either — and a null 1-gram shingle is skipped
    // entirely, as array_min skips null elements)
    val n = toks.numElements()
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) bytes(i) = toks.getUTF8String(i).getBytes
      i += 1
    }
    val mins = new Array[Array[Byte]](numHashes)
    val nShingles = n - shingleSize + 1
    i = 0
    while (i < nShingles) {
      // 1-gram null shingle <=> null element in pre-shingled input: skip
      if (shingleSize > 1 || bytes(i) != null) {
        h = 0
        while (h < numHashes) {
          md.reset()
          md.update(prefixes(h))
          var j = 0
          var first = true
          while (j < shingleSize) {
            val b = bytes(i + j)
            if (b != null) { // concat_ws semantics: nulls contribute nothing
              if (!first) md.update(SPACE)
              md.update(b)
              first = false
            }
            j += 1
          }
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
