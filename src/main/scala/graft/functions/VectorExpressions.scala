package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.{graftbridge => bridge}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType, NumericType}

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
      case ArrayType(FloatType | DoubleType | ByteType, _) => true
      case _                                               => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double|tinyint> inputs, got ${left.dataType} and ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  private def elemType(e: Expression): NumericType =
    e.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[NumericType]

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    def get(arr: ArrayData, e: Expression, i: Int): Double = elemType(e) match {
      case FloatType => arr.getFloat(i).toDouble
      case ByteType  => arr.getByte(i).toDouble // int8-quantized vectors
      case _         => arr.getDouble(i)
    }
    var s = 0.0
    var i = 0
    while (i < n) {
      // null elements contribute 0 (parquet list elements are nullable by
      // default, and reading a null slot as a primitive is undefined)
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        s += get(x, left, i) * get(y, right, i)
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
      def getter(arr: String, e: Expression) = elemType(e) match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case ByteType  => s"(double) $arr.getByte($i)"
        case _         => s"$arr.getDouble($i)"
      }
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

/**
 * Scores of one vector against a FIXED centroid matrix, as a single
 * expression node: `scores[c] = dot(v, cents[c]) / norms[c]`, folded
 * ascending-index exactly like [[DotProduct]] so the values are
 * bit-identical to composing `dot_product(v, lit(cents[c])) / norm[c]`
 * per cell (which is what the DuckDB oracle replays).
 *
 * WHY an expression and not composition: nlist cells × dims-element
 * array literals, each referenced from `greatest` AND a when-chain,
 * put tens of thousands of Literal nodes in the plan — at 16×64 that
 * made analysis+codegen of the IVF query take seconds per run, far
 * exceeding the actual data work. Here the matrix rides along as ONE
 * constant reference object; the plan stays a handful of nodes no
 * matter how many cells. Runtime is the same tight primitive loop.
 */
case class CentroidScores(child: Expression,
                          cents: Array[Array[Double]], norms: Array[Double])
    extends UnaryExpression {

  require(cents.length == norms.length, "one norm per centroid")
  require(norms.forall(_ > 0),
    "centroid norms must be > 0: a zero-norm centroid has no direction and its " +
    "0/0 = NaN score would diverge between the kernel, Spark's NaN ordering, and " +
    "the DuckDB oracle — exclude degenerate centroids before building the matrix")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got $other")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "centroid_scores"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Double](cents.length)
    val fl = isFloat
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val n = math.min(v.numElements(), cent.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i)) // null elements contribute 0, like DotProduct
          s += (if (fl) v.getFloat(i).toDouble else v.getDouble(i)) * cent(i)
        i += 1
      }
      out(c) = s / norms(c)
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("cents", cents, "double[][]")
      val nr = ctx.addReferenceObj("norms", norms, "double[]")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val get = if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |double[] $out = new double[$m.length];
         |for (int $c = 0; $c < $m.length; $c++) {
         |  int $n = java.lang.Math.min($v.numElements(), $m[$c].length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$v.isNullAt($i)) { $s += $get * $m[$c][$i]; }
         |  }
         |  $out[$c] = $s / $nr[$c];
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): CentroidScores =
    copy(child = c)
}

/**
 * Symmetric int8 quantization of a float/double vector in ONE codegen'd
 * pass: `q_i = clamp(floor(x_i * 127 / amax + 0.5), -127, 127)` with
 * `amax = max |x_i|` computed in the same loop (zero vector → zeros).
 *
 * WHY: at 100 TB an `array<float>` embedding store is the dominant byte
 * cost of ANN; int8 cuts it 4x and integer dot products are exact in
 * double arithmetic, so a quantized cosine is bit-reproducible by any
 * engine (q69's DuckDB oracle replays quantization AND scoring exactly —
 * floor/clamp/IEEE division are deterministic, unlike float summation of
 * unquantized values which this repo already handles via ordered folds).
 * The composable form (`transform` + `aggregate` HOFs) is interpreted;
 * this is the same scan-speed-kernel argument as [[DotProduct]].
 */
case class QuantizeI8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got $other")
  }

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "quantize_i8"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val fl = isFloat
    def get(i: Int): Double =
      if (v.isNullAt(i)) 0.0 else if (fl) v.getFloat(i).toDouble else v.getDouble(i)
    var amax = 0.0
    var i = 0
    while (i < n) { val a = math.abs(get(i)); if (a > amax) amax = a; i += 1 }
    val out = new Array[Byte](n)
    if (amax > 0) {
      i = 0
      while (i < n) {
        val r = math.floor(get(i) * 127.0 / amax + 0.5)
        out(i) = math.max(-127.0, math.min(127.0, r)).toByte
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val amax = ctx.freshName("amax")
      val a = ctx.freshName("a")
      val r = ctx.freshName("r")
      val out = ctx.freshName("out")
      val get = (idx: String) =>
        s"($v.isNullAt($idx) ? 0.0 : " +
          (if (isFloat) s"(double) $v.getFloat($idx))" else s"$v.getDouble($idx))")
      s"""
         |int $n = $v.numElements();
         |double $amax = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $a = java.lang.Math.abs(${get(i)});
         |  if ($a > $amax) $amax = $a;
         |}
         |byte[] $out = new byte[$n];
         |if ($amax > 0.0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $r = java.lang.Math.floor(${get(i)} * 127.0 / $amax + 0.5);
         |    $out[$i] = (byte) java.lang.Math.max(-127.0, java.lang.Math.min(127.0, $r));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): QuantizeI8 =
    copy(child = c)
}

/** Argmax cell over the same scores: ascending scan with strict `>`, so
  * exact ties keep the SMALLEST cell id — identical to the oracle's
  * `row_number() OVER (ORDER BY score DESC, cell ASC) = 1`. Returns -1
  * only for an empty matrix, mirroring the old when-chain's
  * `otherwise(-1)`. Zero-norm centroids are rejected at construction:
  * their 0/0 = NaN score is skipped by the strict `>` here but ranked
  * FIRST by DuckDB's `ORDER BY score DESC` (and equal-greatest by
  * Spark's `greatest`), so allowing them would silently diverge from
  * both the composed form and the oracle. */
case class BestCentroid(child: Expression,
                        cents: Array[Array[Double]], norms: Array[Double])
    extends UnaryExpression {

  require(cents.length == norms.length, "one norm per centroid")
  require(norms.forall(_ > 0),
    "centroid norms must be > 0: a zero-norm centroid scores 0/0 = NaN, which this " +
    "kernel's strict `>` skips while the DuckDB oracle's ORDER BY DESC ranks first — " +
    "exclude degenerate centroids before building the matrix")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got $other")
  }

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "best_centroid"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val fl = isFloat
    var best = Double.NegativeInfinity
    var cell = -1
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val n = math.min(v.numElements(), cent.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        if (!v.isNullAt(i))
          s += (if (fl) v.getFloat(i).toDouble else v.getDouble(i)) * cent(i)
        i += 1
      }
      s /= norms(c)
      if (s > best) { best = s; cell = c }
      c += 1
    }
    cell
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("cents", cents, "double[][]")
      val nr = ctx.addReferenceObj("norms", norms, "double[]")
      val best = ctx.freshName("best")
      val cell = ctx.freshName("cell")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val get = if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |double $best = java.lang.Double.NEGATIVE_INFINITY;
         |int $cell = -1;
         |for (int $c = 0; $c < $m.length; $c++) {
         |  int $n = java.lang.Math.min($v.numElements(), $m[$c].length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$v.isNullAt($i)) { $s += $get * $m[$c][$i]; }
         |  }
         |  $s /= $nr[$c];
         |  if ($s > $best) { $best = $s; $cell = $c; }
         |}
         |${ev.value} = $cell;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): BestCentroid =
    copy(child = c)
}

/**
 * Per-vector statistics against ONE fixed direction, in exact long
 * arithmetic: for a milli-scaled integer vector `sv` (array<long>) and the
 * fixed-point direction `v` (the anisotropy power method's output,
 * components in [−10⁴, 10⁴]) it returns
 * `struct(dot = Σ sv·v, energy = Σ sv², res_dot = Σ (sv − (dot·v)/vn2)·v)`
 * — dot with the direction, the row's second-moment energy, and the dot
 * the ALL-BUT-THE-TOP residual still has with the direction (0 up to the
 * per-component truncation of the integer projection). Divisions truncate
 * toward zero (Java `/`), matching Spark `div` and DuckDB `//`.
 *
 * One codegen'd pass; the direction rides as a constant reference object
 * like [[CentroidScores]]'s matrix. Overflow bounds (documented): the
 * accumulation loop needs d·max|sv|·10⁴ < 2⁶³, but the RESIDUAL loop's
 * `dot·v_i` term is the binding constraint — it needs
 * d·max|sv|·10⁸ < 2⁶³, i.e. max|x| below ~2e7 at d = 64 (~3e5 at
 * d = 4096). Far beyond any real embedding scale, but 10⁴ tighter than
 * the first loop's bound; past it Java longs wrap silently while the
 * DuckDB oracle's BIGINT raises.
 */
case class TopDirectionStats(child: Expression, v: Array[Long], vn2: Long)
    extends UnaryExpression {

  require(vn2 > 0, "direction must be nonzero (vn2 = Σ v² > 0)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input (milli-scaled), got $other")
  }

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("dot", org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("energy", org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("res_dot", org.apache.spark.sql.types.LongType, nullable = false)))

  override def prettyName: String = "top_direction_stats"

  override def nullSafeEval(input: Any): Any = {
    val sv = input.asInstanceOf[ArrayData]
    val n = math.min(sv.numElements(), v.length)
    var dot = 0L; var energy = 0L
    var i = 0
    while (i < n) {
      if (!sv.isNullAt(i)) {
        val a = sv.getLong(i)
        dot += a * v(i); energy += a * a
      }
      i += 1
    }
    var res = 0L
    i = 0
    while (i < n) {
      if (!sv.isNullAt(i)) res += (sv.getLong(i) - (dot * v(i)) / vn2) * v(i)
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(dot, energy, res)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, sv => {
      val vr = ctx.addReferenceObj("dir", v, "long[]")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val a = ctx.freshName("a")
      val dot = ctx.freshName("dot")
      val energy = ctx.freshName("energy")
      val res = ctx.freshName("res")
      s"""
         |int $n = java.lang.Math.min($sv.numElements(), $vr.length);
         |long $dot = 0L; long $energy = 0L; long $res = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$sv.isNullAt($i)) {
         |    long $a = $sv.getLong($i);
         |    $dot += $a * $vr[$i]; $energy += $a * $a;
         |  }
         |}
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$sv.isNullAt($i)) {
         |    $res += ($sv.getLong($i) - ($dot * $vr[$i]) / ${vn2}L) * $vr[$i];
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { $dot, $energy, $res });
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): TopDirectionStats =
    copy(child = c)
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

  /** All centroid scores of a vector column (array<double>, one per cell). */
  def centroidScores(v: Column, cents: Array[Array[Double]], norms: Array[Double]): Column =
    bridge.column(CentroidScores(bridge.expression(v), cents, norms))

  /** Argmax centroid cell of a vector column (int, -1 for empty matrix). */
  def bestCentroid(v: Column, cents: Array[Array[Double]], norms: Array[Double]): Column =
    bridge.column(BestCentroid(bridge.expression(v), cents, norms))

  /** Codegen'd symmetric int8 quantization (array<tinyint>). */
  def quantizeI8(v: Column): Column =
    bridge.column(QuantizeI8(bridge.expression(v)))

  /** Per-vector (dot, energy, res_dot) against a fixed direction. */
  def topDirectionStats(sv: Column, v: Array[Long], vn2: Long): Column =
    bridge.column(TopDirectionStats(bridge.expression(sv), v, vn2))
}
