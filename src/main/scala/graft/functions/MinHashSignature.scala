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
  * Hash family (round 5 — one digest per shingle): each shingle is
  * digested ONCE, and the `numHashes` family members are byte-aligned
  * rotations of that digest's hex form,
  *
  *   h_i(s) = rotl(md5(shingle), 4*i hex chars),   i in [0, numHashes)
  *   sig[i] = lexicographic min over shingles of h_i
  *
  * equivalently, in builtin Spark SQL (here shingleSize = 3):
  *
  *   shingles = transform(sequence(1, n-2),
  *                i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))
  *   sig = transform(sequence(0, numHashes-1), h -> array_min(
  *           transform(shingles, s -> concat(substring(md5(s), h*4+1, 32-h*4),
  *                                           substring(md5(s), 1, h*4)))))
  *
  * This is one-permutation-hashing style reuse of a single strong digest
  * (cf. Li/Owen/Zhang, "One Permutation Hashing", NIPS 2012): ranking by
  * rotation i orders shingles by digest bytes starting at byte 2i, so each
  * i induces a different (dependent but uniform) ordering — exactly what
  * LSH banding needs — at 1/numHashes of the md5 cost of the round-4
  * family md5(i||'|'||s), which digested every shingle numHashes times.
  * At 100 TB the signature pass is md5-bound, so this is a direct ~8x CPU
  * cut on the corpus scan. Rotations are 4-hex-char (2-byte) aligned;
  * 16-byte digests give at most 8 distinct members, enforced below.
  * Null tokens are skipped by concat_ws; fewer than shingleSize tokens
  * yields null elements, as array_min over an empty array does.
  * `shingleSize = 1` hashes the elements themselves (pre-shingled input).
  * The DuckDB oracle computes the identical signature with the same
  * substr arithmetic, so the kernel does not move the oracle.
  *
  * Why custom (the graft_cosine playbook, CosineSimilarity.scala): Spark's
  * higher-order functions are CodegenFallback — the builtin route runs
  * interpreted lambda passes per row, allocating every intermediate
  * string. This kernel streams token BYTES straight into a reused
  * MessageDigest (tok[i], ' ', tok[i+1], ...) — the shingle string is
  * never materialized — and keeps numHashes running minima as raw digest
  * references compared CYCLICALLY from byte offset 2i (rotation never
  * materialized either); only winners are hex-encoded. Lowercase-hex
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
    case ArrayType(StringType, _)
        if numHashes > 0 && numHashes <= 8 && shingleSize > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_minhash expects (array<string>, int literal in [1,8]" +
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
    // mins(h) holds the DIGEST whose rotation by 2h bytes is minimal so
    // far; rotations are compared cyclically in place, never materialized
    val mins = new Array[Array[Byte]](numHashes)
    val nShingles = n - shingleSize + 1
    i = 0
    while (i < nShingles) {
      // 1-gram null shingle <=> null element in pre-shingled input: skip
      if (shingleSize > 1 || bytes(i) != null) {
        md.reset()
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
        val d = md.digest() // ONE digest per shingle — the whole point
        var h = 0
        while (h < numHashes) {
          if (mins(h) == null || cyclicLess(d, mins(h), 2 * h)) mins(h) = d
          h += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](numHashes)
    var h = 0
    while (h < numHashes) {
      out(h) =
        if (mins(h) == null) null
        else UTF8String.fromString(toHexRot(mins(h), 2 * h))
      h += 1
    }
    new GenericArrayData(out)
  }

  /** rotl(a, off bytes) < rotl(b, off bytes), compared as unsigned bytes
    * (== hex-lexicographic order of the rotated hex strings). */
  private def cyclicLess(a: Array[Byte], b: Array[Byte], off: Int): Boolean = {
    val len = a.length
    var i = 0
    while (i < len) {
      val k = (off + i) % len
      val ai = a(k) & 0xff
      val bi = b(k) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  /** Hex of the digest rotated left by `off` bytes. */
  private def toHexRot(d: Array[Byte], off: Int): String = {
    val len = d.length
    val cs = new Array[Char](len * 2)
    var i = 0
    while (i < len) {
      val v = d((off + i) % len)
      cs(i * 2) = hexChars((v >> 4) & 0xf)
      cs(i * 2 + 1) = hexChars(v & 0xf)
      i += 1
    }
    new String(cs)
  }
}
