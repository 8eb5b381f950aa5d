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

/** Portable-md5 31-bit hashes of all word n-gram shingles of a token
  * array — the per-row form of the q52 twin's explode → window-lead
  * → distinct → md5 pipeline, hash-for-hash identical to
  * `conv(substring(md5(concat_ws(' ', …)), 1, 15), 16, 10) & 0x7FFFFFFF`
  * so the DuckDB oracle replay is untouched. Shorter-than-n docs yield
  * one shingle over all tokens (callers that need the raw-text fallback
  * branch on token count).
  *
  * `distinct = true` (dedup/minhash/contamination callers): sorted,
  * deduped — consumers are order-insensitive (mins, set intersections).
  * `distinct = false` (repetition profiling): every occurrence, in
  * document order — multiplicity is the signal. */
case class PortableShingleHashes(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  require(n >= 1, "ngram size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "portable_shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val hs = if (distinct) PortableShingleHashes.distinctHashes(toks, n)
             else PortableShingleHashes.allHashes(toks, n)
    new GenericArrayData(hs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val call = if (distinct) "distinctHashes" else "allHashes"
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.PortableShingleHashes.$call($toks, $n));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PortableShingleHashes =
    copy(child = newChild)
}

object PortableShingleHashes {
  /** Every shingle hash, document order, multiplicity preserved. */
  def allHashes(toks: ArrayData, n: Int): Array[Long] = {
    val m = toks.numElements()
    val eff = math.min(n, m)
    val count = math.max(m - n + 1, if (m > 0) 1 else 0)
    val hs = new Array[Long](count)
    var i = 0
    while (i < count) {
      hs(i) = HashUtil.md5Hash31Shingle(toks, i, eff)
      i += 1
    }
    hs
  }

  /** Shared by eval and codegen: hash every shingle, sort, dedupe. */
  def distinctHashes(toks: ArrayData, n: Int): Array[Long] = {
    val hs = allHashes(toks, n)
    val count = hs.length
    java.util.Arrays.sort(hs)
    var w = 0
    var r = 0
    while (r < count) {
      if (w == 0 || hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    if (w == count) hs else java.util.Arrays.copyOf(hs, w)
  }
}

/** Per-row affine MinHash over portable 31-bit hashes: out[p] =
  * min over h of (h * mult(p) + add(p)) — the per-row form of the q52
  * twin's numPerm min-aggregates, value-identical (31-bit operands keep
  * every product < 2^62: overflow-free under ANSI and in DuckDB). */
case class AffineMinHash(child: Expression, mults: Seq[Long], adds: Seq[Long])
    extends UnaryExpression {

  require(mults.nonEmpty && mults.length == adds.length,
    "mults and adds must be same-length and non-empty")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<long> input, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "affine_minhash"

  private lazy val mArr = mults.toArray
  private lazy val aArr = adds.toArray

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    new GenericArrayData(AffineMinHash.mins(hs, mArr, aArr))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("mults", mArr, "long[]")
    val aRef = ctx.addReferenceObj("adds", aArr, "long[]")
    nullSafeCodeGen(ctx, ev, hs => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.AffineMinHash.mins($hs, $mRef, $aRef));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AffineMinHash =
    copy(child = newChild)
}

object AffineMinHash {
  def mins(hs: ArrayData, mults: Array[Long], adds: Array[Long]): Array[Long] = {
    val numPerm = mults.length
    val out = Array.fill(numPerm)(Long.MaxValue)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        var p = 0
        while (p < numPerm) {
          val v = h * mults(p) + adds(p)
          if (v < out(p)) out(p) = v
          p += 1
        }
      }
      i += 1
    }
    out
  }
}

/** Per-row 32-bit portable SimHash (frequency-weighted votes, md5 31-bit
  * token hash) — the per-row form of the q53 twin's dictionary-join +
  * 32 vote aggregates, value-identical. */
case class PortableSimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got $other")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "portable_simhash32"

  override def nullSafeEval(input: Any): Any =
    PortableSimHash32.signature(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      s"${ev.value} = graft.functions.PortableSimHash32.signature($toks);"
    })

  override protected def withNewChildInternal(newChild: Expression): PortableSimHash32 =
    copy(child = newChild)
}

object PortableSimHash32 {
  def signature(toks: ArrayData): Long = {
    val n = toks.numElements()
    val votes = new Array[Int](32)
    var i = 0
    while (i < n) {
      val t = if (toks.isNullAt(i)) UTF8String.EMPTY_UTF8 else toks.getUTF8String(i)
      val h = HashUtil.md5Hash31(t)
      var b = 0
      while (b < 32) {
        votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** Column-level entry points. */
object SignatureFunctions {
  /** Per-row MinHash signature (numPerm mins) of a shingle-hash array. */
  def minhashSignature(hashes: Column, numPerm: Int): Column =
    bridge.column(MinHashSignature(bridge.expression(hashes), numPerm))

  /** Per-row 64-bit SimHash of a token array. */
  def simhash64(tokens: Column): Column =
    bridge.column(SimHash64(bridge.expression(tokens)))

  /** Per-row distinct portable shingle hashes (q52 twin kernel). */
  def portableShingleHashes(tokens: Column, n: Int): Column =
    bridge.column(PortableShingleHashes(bridge.expression(tokens), n))

  /** Per-row ALL portable shingle hashes (multiplicity preserved). */
  def allShingleHashes(tokens: Column, n: Int): Column =
    bridge.column(PortableShingleHashes(bridge.expression(tokens), n, distinct = false))

  /** Per-row affine MinHash mins (q52 twin kernel). */
  def affineMinHash(hashes: Column, consts: Seq[(Long, Long)]): Column =
    bridge.column(AffineMinHash(bridge.expression(hashes), consts.map(_._1), consts.map(_._2)))

  /** Per-row 32-bit portable SimHash (q53 twin kernel). */
  def portableSimhash32(tokens: Column): Column =
    bridge.column(PortableSimHash32(bridge.expression(tokens)))
}
