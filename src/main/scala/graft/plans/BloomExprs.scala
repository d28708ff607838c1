package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(bloomBytes, keyHash)` — membership probe of a
  * serialized [[org.apache.spark.util.sketch.BloomFilter]] (the public
  * spark-sketch format produced by `df.stat.bloomFilter`).
  *
  * The filter argument must be FOLDABLE (a literal): the sketch is
  * deserialized once per executor when the expression is first
  * evaluated and referenced from generated code, so the per-row cost
  * is the filter's k hash probes — no per-row deserialization, no
  * allocation. False positives are possible (rate = the fpp the
  * filter was built with), false negatives are not; callers use it as
  * a conservative pre-filter and keep an exact join downstream
  * ([[graft.operators.BloomPrune]]).
  */
case class BloomMightContain(bloomBytes: Expression, valueHash: Expression)
    extends BinaryExpression {
  require(bloomBytes.foldable,
    "bloom_might_contain: the bloom argument must be a literal")

  override def left: Expression = bloomBytes
  override def right: Expression = valueHash
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (bloomBytes.dataType == BinaryType && valueHash.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects (binary, bigint), got (${bloomBytes.dataType.sql}, ${valueHash.dataType.sql})")
  }

  @transient private lazy val filter: BloomFilter = {
    val bytes = bloomBytes.eval().asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(b: Any, v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the deserialized sketch rides the references array — per-row code
    // is just the k hash probes (the binary literal child compiles to a
    // reference too; nothing is copied per row)
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, v) =>
      s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(bloomBytes = newLeft, valueHash = newRight)
}
