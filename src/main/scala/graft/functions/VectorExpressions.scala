package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the double-array dot product.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) -> acc+x)`) is
  * interpreted per element — lambda dispatch and boxing per multiply — and
  * breaks the surrounding WholeStageCodegen span. This expression generates
  * a tight primitive loop instead (doGenCode), keeping the similarity-search
  * projection fully codegen'd; the interpreted path (nullSafeEval) computes
  * the identical sequential left-to-right sum, so results are bit-equal to
  * the HOF version and to the DuckDB oracle.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects (array<double>, array<double>), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Session registration for graft's native SQL functions. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot expects 2 arguments")
        DotProduct(children.head, children(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc",
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_nfc expects 1 argument")
        NfcNormalize(children.head)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bf_contains",
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_bf_contains expects 2 arguments")
        BloomMightContain(children.head, children(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles",
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_shingles expects 2 arguments")
        ShingleArray(children.head, children(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_lsh_buckets",
      (children: Seq[Expression]) => {
        require(children.size == 3, "graft_lsh_buckets expects 3 arguments")
        LshBuckets(children.head, children(1), children(2))
      },
      "built-in")
  }
}

/** SparkSessionExtensions entry point — the production path for shipping
  * graft's native functions with a cluster config instead of per-session
  * code:
  *
  * {{{
  * spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_nfc"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => NfcNormalize(children.head)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bf_contains"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[BloomMightContain].getName, "graft_bf_contains"),
      (children: Seq[Expression]) => BloomMightContain(children.head, children(1))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_shingles"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ShingleArray].getName, "graft_shingles"),
      (children: Seq[Expression]) => ShingleArray(children.head, children(1))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_lsh_buckets"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[LshBuckets].getName, "graft_lsh_buckets"),
      (children: Seq[Expression]) =>
        LshBuckets(children.head, children(1), children(2))))
  }
}
