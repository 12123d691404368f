package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bf_contains(filter_bytes, key)` — membership probe against a
  * serialized [[org.apache.spark.util.sketch.BloomFilter]] (the public
  * sketch `DataFrame.stat.bloomFilter` produces).
  *
  * The filter argument must be FOLDABLE (a literal): the filter is one
  * bounded artifact built once per batch, not per-row data. It is
  * deserialized exactly once on the driver and shipped to executors as a
  * codegen reference object, so the per-row work is just the hash probes —
  * no per-row deserialization, no UDF, and the surrounding projection
  * stays inside WholeStageCodegen.
  *
  * Used by [[graft.dedup.BloomDedup]] for incremental corpus dedup: probe
  * a new batch against the historical corpus's fingerprint filter without
  * joining the historical corpus. Guarantees no false negatives (a key in
  * the filter always reports true); false positives at the configured fpp
  * are re-checked exactly by the caller.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckFailure(
        "graft_bf_contains expects a constant (foldable) filter argument")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bf_contains expects (binary, bigint), got ($l, $r)")
    }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bf_contains"

  @transient private lazy val filter: BloomFilter = {
    val bytes = left.eval(InternalRow.empty).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(f: Any, v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("graftBloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, v) => s"${ev.value} = $bf.mightContainLong($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
