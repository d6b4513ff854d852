package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Custom Catalyst expression: membership test of a long key against a
  * pre-built Bloom filter — the engine's runtime-filter / semi-join-
  * reduction primitive (see ops.RuntimeFilter for the operator story).
  *
  * Design mirrors Spark's own internal runtime filter: the serialized
  * sketch travels as a FOLDABLE BinaryType child inside the plan, is
  * deserialized once per task (transient lazy), and the membership probe
  * is generated into whole-stage codegen — so a bloom-pruned scan stays
  * one fused loop with no UDF boundary. `putLong`/`mightContainLong` pair
  * with how DataFrameStatFunctions.bloomFilter ingests integral columns,
  * so a filter built there probes correctly here.
  */
case class BloomKeyFilter(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains expects a bigint key, got ${left.dataType.simpleString}")
    else if (right.dataType != BinaryType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_bloom_contains expects a foldable binary bloom-filter argument")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable

  @transient private lazy val bloom: BloomFilter = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, "graft_bloom_contains: bloom bytes must not be null")
    BloomFilter.readFrom(bytes)
  }

  /** Only the key child is evaluated per row — the sketch is a constant. */
  override def eval(input: InternalRow): Any = {
    val key = left.eval(input)
    if (key == null) null
    else bloom.mightContainLong(key.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bloomRef =
      ctx.addReferenceObj("bloomFilter", bloom, classOf[BloomFilter].getName)
    val keyGen = left.genCode(ctx)
    ev.copy(code = code"""
      ${keyGen.code}
      boolean ${ev.isNull} = ${keyGen.isNull};
      boolean ${ev.value} = false;
      if (!${ev.isNull}) {
        ${ev.value} = $bloomRef.mightContainLong(${keyGen.value});
      }""")
  }

  override def prettyName: String = "graft_bloom_contains"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomKeyFilter =
    copy(left = newLeft, right = newRight)
}

object BloomKeyFilter {
  def serialize(bloom: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bloom.writeTo(out)
    out.toByteArray
  }
}
