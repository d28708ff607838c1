package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** `cms_estimate(cmsBytes, keyHash)` — frequency estimate of a key hash
  * against a serialized [[org.apache.spark.util.sketch.CountMinSketch]]
  * (the public spark-sketch format produced by the `count_min_sketch`
  * SQL aggregate and `df.stat.countMinSketch`).
  *
  * The sketch argument must be FOLDABLE (a literal): it is deserialized
  * once and referenced from generated code, so the per-row cost is the
  * sketch's `depth` hash probes — no per-row deserialization. Estimates
  * NEVER undercount (CMS error is one-sided: true ≤ est ≤ true + ε·N
  * w.p. ≥ confidence), so `cms_estimate(...) >= t` is a recall-exact
  * pre-filter for "count ≥ t" — callers keep an exact aggregate
  * downstream to drop the overestimates ([[graft.operators.HeavyHitters]]).
  */
case class CmsEstimate(cmsBytes: Expression, valueHash: Expression)
    extends BinaryExpression {
  require(cmsBytes.foldable,
    "cms_estimate: the sketch argument must be a literal")

  override def left: Expression = cmsBytes
  override def right: Expression = valueHash
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (cmsBytes.dataType == BinaryType && valueHash.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects (binary, bigint), got (${cmsBytes.dataType.sql}, ${valueHash.dataType.sql})")
  }

  @transient private lazy val sketch: CountMinSketch = {
    val bytes = cmsBytes.eval().asInstanceOf[Array[Byte]]
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(b: Any, v: Any): Any =
    sketch.estimateCount(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the deserialized sketch rides the references array — per-row code
    // is just the depth counter probes
    val ref = ctx.addReferenceObj("cmsSketch", sketch,
      classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev, (_, v) =>
      s"${ev.value} = $ref.estimateCount(java.lang.Long.valueOf($v));")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(cmsBytes = newLeft, valueHash = newRight)
}
