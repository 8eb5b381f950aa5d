package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.{graftbridge => bridge}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static hash helpers shared by interpreted eval and generated code. */
object HashUtil {
  /** Rolling-hash modulus: prime < 2^49, so 31*acc + h stays < 2^63. */
  val M: Long = 562949953421231L

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  private def digest31(d: java.security.MessageDigest): Long = {
    val bytes = d.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (bytes(i) & 0xFFL); i += 1 }
    (v >>> 4) & 0x7FFFFFFFL
  }

  /** The repo's portable 31-bit hash — identical to the SQL form
    * `conv(substring(md5(s), 1, 15), 16, 10) & 0x7FFFFFFF`: the first 15
    * hex chars are the top 60 bits of the first 8 digest bytes, masked to
    * 31 bits. Kept for oracle twins DuckDB replays via
    * `CAST(CONCAT('0x', ...) AS BIGINT)`. */
  def md5Hash31(s: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    d.update(s.getBytes)
    digest31(d)
  }

  /** md5Hash31 of tokens[start, start+n) joined by single spaces —
    * byte-identical to hashing `concat_ws(' ', ...)` without building the
    * joined string. Like concat_ws, null tokens are SKIPPED (no separator
    * emitted for them), so the equivalence holds for any token array, not
    * just the null-free ones `split()` produces. */
  def md5Hash31Shingle(toks: org.apache.spark.sql.catalyst.util.ArrayData,
                       start: Int, n: Int): Long = {
    val d = md5.get()
    d.reset()
    var j = 0
    var emitted = false
    while (j < n) {
      if (!toks.isNullAt(start + j)) {
        if (emitted) d.update(' '.toByte)
        d.update(toks.getUTF8String(start + j).getBytes)
        emitted = true
      }
      j += 1
    }
    digest31(d)
  }

  /** xxhash64 (Spark's seed-42 SQL function) reduced into the field. */
  def xx64ModM(s: UTF8String): Long = {
    val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(s, 42L) % M
    if (h < 0) h + M else h
  }
}

/**
 * Native Catalyst expression for the order-sensitive rolling-hash document
 * fingerprint: fold `acc = (acc * 31 + hash(token)) mod M` over a token
 * array in ONE codegen'd loop.
 *
 * The composable form — `aggregate(tokens, 0L, (acc, t) => pmod(...))` —
 * is a higher-order function, which Spark evaluates INTERPRETED
 * (CodegenFallback): two closure invocations and a boxed long per token,
 * per row. Fingerprinting is a scan-speed per-row kernel (SURVEY §5's
 * HOF ban, same reasoning as [[NgramHashes]] / [[DotProduct]]); this
 * expression runs the fold as a tight primitive loop inside whole-stage
 * codegen.
 *
 * `portable = false` hashes tokens with seed-42 xxhash64 (the production
 * fingerprint, q40); `portable = true` uses the md5-derived 31-bit hash so
 * a DuckDB oracle replays the exact fold via list_reduce (q54). Both
 * reduce each token hash into [0, M) first, so every intermediate stays
 * below 31·M + M < 2^54 — no overflow on either engine.
 */
case class RollingHash(child: Expression, portable: Boolean)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got $other")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val t = if (toks.isNullAt(i)) UTF8String.EMPTY_UTF8 else toks.getUTF8String(i)
      val h = if (portable) HashUtil.md5Hash31(t) else HashUtil.xx64ModM(t)
      acc = (acc * 31 + h) % HashUtil.M
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val hashCall = if (portable) "md5Hash31" else "xx64ModM"
      s"""
         |int $n = $toks.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc = ($acc * 31 + graft.functions.HashUtil.$hashCall(
         |    $toks.isNullAt($i)
         |      ? org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
         |      : $toks.getUTF8String($i))) % graft.functions.HashUtil.M();
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** Column-level entry point. */
object RollingHashFunctions {
  /** Codegen'd rolling-hash fingerprint of a token-array column. */
  def rollingHash(tokens: Column, portable: Boolean = false): Column =
    bridge.column(RollingHash(bridge.expression(tokens), portable))
}
