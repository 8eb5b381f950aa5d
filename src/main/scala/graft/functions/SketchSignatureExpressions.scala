package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.{graftbridge => bridge}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native per-ROW signature kernels for the dedup family. The r2 shapes
 * computed signatures with explode → shuffle → 64 aggregate columns; both
 * signatures are pure per-document functions of data already sitting in
 * one row (the shingle-hash array / the token array), so these expressions
 * compute them at scan speed with ZERO shuffle — at 100 TB the signature
 * stage becomes map-side only, and no shuffle ever carries exploded
 * shingle rows or collected shingle sets again.
 */

/** MinHash signature of a shingle-hash array: for each permutation p,
  * min over shingles of xxhash64(h, p) — hash-compatible with the
  * `xxhash64(hashCol, lit(p))` column form it replaced (seed 42, then
  * hashLong(h), then hashInt(p)). Returns numPerm longs. */
case class MinHashSignature(child: Expression, numPerm: Int)
    extends UnaryExpression {

  require(numPerm >= 1, "numPerm must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long> input, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = Array.fill(numPerm)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val base = XXH64.hashLong(hs.getLong(i), 42L)
        var p = 0
        while (p < numPerm) {
          val v = XXH64.hashInt(p, base)
          if (v < out(p)) out(p) = v
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val base = ctx.freshName("base")
      val v = ctx.freshName("v")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      s"""
         |int $n = $hs.numElements();
         |long[] $out = new long[$numPerm];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$hs.isNullAt($i)) {
         |    long $base = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(
         |      $hs.getLong($i), 42L);
         |    for (int $p = 0; $p < $numPerm; $p++) {
         |      long $v = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt($p, $base);
         |      if ($v < $out[$p]) $out[$p] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array (frequency-weighted bit votes over the
  * token multiset, seed-42 xxhash64 per token — the same per-token hash
  * as the exploded `xxhash64(t)` form it replaced). */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got $other")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val t = if (toks.isNullAt(i)) UTF8String.EMPTY_UTF8 else toks.getUTF8String(i)
      val h = XXH64.hashUTF8String(t, 42L)
      var b = 0
      while (b < 64) {
        votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val n = ctx.freshName("n")
      val votes = ctx.freshName("votes")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      s"""
         |int $n = $toks.numElements();
         |int[] $votes = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
         |    $toks.isNullAt($i)
         |      ? org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
         |      : $toks.getUTF8String($i), 42L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Column-level entry points. */
object SignatureFunctions {
  /** Per-row MinHash signature (numPerm mins) of a shingle-hash array. */
  def minhashSignature(hashes: Column, numPerm: Int): Column =
    bridge.column(MinHashSignature(bridge.expression(hashes), numPerm))

  /** Per-row 64-bit SimHash of a token array. */
  def simhash64(tokens: Column): Column =
    bridge.column(SimHash64(bridge.expression(tokens)))
}
