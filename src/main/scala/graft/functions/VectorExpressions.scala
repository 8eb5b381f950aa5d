package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.{graftbridge => bridge}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, NumericType}

/**
 * Native Catalyst expression for the similarity hot path: the dot product
 * of two numeric arrays as ONE codegen'd tight loop.
 *
 * The composable alternative — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
 * is a higher-order function, which Spark evaluates INTERPRETED (HOFs are
 * CodegenFallback): per pair it allocates a zipped array and runs two
 * lambda closures per element. On an ANN pair-scoring stage that is the
 * entire inner loop, so at 100 TB it dominates the job. This expression
 * instead compiles to `for (i) s += a.getDouble(i) * b.getDouble(i)` inside
 * whole-stage codegen — no allocation, no virtual calls, auto-vectorizable.
 *
 * Accepts float and double arrays in any combination (embeddings ship as
 * `array<float>`; promotion to double happens per element in the loop, so
 * no `transform(v, _.cast("double"))` materialization is needed upstream).
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _                                    => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got ${left.dataType} and ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  private def elemType(e: Expression): NumericType =
    e.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      // null elements contribute 0 (parquet list elements are nullable by
      // default, and reading a null slot as a primitive is undefined)
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        s += xi * yi
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      def getter(arr: String, e: Expression) =
        if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += ${getter(a, left)} * ${getter(b, right)};
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Column-level entry points for the native vector expressions. */
object VectorFunctions {
  /** Codegen'd dot product of two float/double array columns. */
  def dotProduct(a: Column, b: Column): Column =
    bridge.column(DotProduct(bridge.expression(a), bridge.expression(b)))

  /** Codegen'd L2 norm. */
  def l2Norm(v: Column): Column = org.apache.spark.sql.functions.sqrt(dotProduct(v, v))

  /** Codegen'd cosine similarity of two raw (un-normalized) vectors. */
  def cosineSim(a: Column, na: Column, b: Column, nb: Column): Column =
    dotProduct(a, b) / (na * nb)
}
