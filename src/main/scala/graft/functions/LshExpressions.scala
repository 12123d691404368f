package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native multi-table hyperplane sign-bucket assignment —
  * `graft_lsh_buckets(v, planes, nPlanes)` returns the per-table bucket
  * array: bucket[t] = Σ_p (planes[t·nPlanes+p] · v > 0 ? 1L << p : 0).
  *
  * The DataFrame formulation (explode the corpus × (numTables·nPlanes)
  * plane rows through a broadcast join, then groupBy (key, table) to OR
  * the bits) paid a corpus×planes-sized Exchange per bucketing pass and
  * interpreted per-plane expression dispatch. This expression computes all
  * numTables buckets in one codegen'd call per row — zero shuffle
  * (guide §2.4) — with the identical dot product (sequential
  * left-to-right fold over min(len) components, the graft_dot contract),
  * so bucket values are bit-equal to the join+groupBy form
  * (LshExpressionsSpec asserts it).
  *
  * `planes` is a foldable array<array<double>> literal of length
  * numTables·nPlanes in (table-major, plane-minor) order; `nPlanes` a
  * foldable int.
  */
case class LshBuckets(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _),
          IntegerType) if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "graft_lsh_buckets expects (array<double>, array<array<double>> literal, " +
          s"int literal), got ($a, $b, $c)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  override def nullSafeEval(v: Any, planes: Any, nPlanes: Any): Any =
    LshBuckets.compute(v.asInstanceOf[ArrayData],
      planes.asInstanceOf[ArrayData], nPlanes.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, p, n) =>
      s"graft.functions.LshBuckets.compute($v, $p, $n)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): LshBuckets =
    copy(first = f, second = s, third = t)
}

object LshBuckets {
  /** Static so generated code can call it directly. */
  def compute(v: ArrayData, planes: ArrayData, nPlanes: Int): ArrayData = {
    val nTables = planes.numElements() / nPlanes
    val out = new Array[Any](nTables)
    val vLen = v.numElements()
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        val pv = planes.getArray(t * nPlanes + p)
        val n = math.min(pv.numElements(), vLen)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += pv.getDouble(i) * v.getDouble(i); i += 1 }
        if (acc > 0) bucket |= 1L << p
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
