package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.{graftbridge => bridge}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/**
 * Native Catalyst expression producing the 64-bit hashes of all word
 * n-gram shingles of a tokenized document in ONE codegen'd pass.
 *
 * The composable form —
 * `transform(sequence(0, size-n), i -> xxhash64(concat_ws(" ", slice(toks, i+1, n))))`
 * — is an interpreted higher-order function that allocates a slice array
 * and builds a concatenated string per shingle; on a shingling stage it is
 * the whole inner loop (measured ~4 s for 5 k docs at sf0.1, dominating
 * MinHash end-to-end). This expression emits
 * `h = xx(tok[i]); h = xx(tok[i+1], h); …` per shingle — zero allocation
 * per element, scan-local (no shuffle), inside whole-stage codegen.
 *
 * Hash identity: chained `XXH64.hashUTF8String` over the n tokens (token
 * boundaries are hash field boundaries, so ("a b","c") never collides
 * with ("a","b c") the way string-joining would). Shorter-than-n docs
 * yield ONE shingle over all their tokens, so no document drops out of
 * dedup. Output may contain duplicate hashes (one per shingle
 * occurrence); set-consumers dedupe via `array_distinct`/aggregation.
 */
case class NgramHashes(child: Expression, n: Int, seed: Long = 42L)
    extends UnaryExpression {

  require(n >= 1, "ngram size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "ngram_hashes"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val eff = math.min(n, m)
    val count = math.max(m - n + 1, if (m > 0) 1 else 0)
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      var h = seed
      var j = 0
      while (j < eff) {
        // null tokens hash as empty (split never emits them; stay safe)
        val t = if (toks.isNullAt(i + j)) org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
                else toks.getUTF8String(i + j)
        h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(t, h)
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val m = ctx.freshName("m")
      val eff = ctx.freshName("eff")
      val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |int $m = $toks.numElements();
         |int $eff = java.lang.Math.min($n, $m);
         |int $cnt = java.lang.Math.max($m - $n + 1, $m > 0 ? 1 : 0);
         |long[] $out = new long[$cnt];
         |for (int $i = 0; $i < $cnt; $i++) {
         |  long $h = ${seed}L;
         |  for (int $j = 0; $j < $eff; $j++) {
         |    $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
         |      $toks.isNullAt($i + $j)
         |        ? org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
         |        : $toks.getUTF8String($i + $j), $h);
         |  }
         |  $out[$i] = $h;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

/**
 * Unicode NFC normalization as a native codegen'd expression (Spark has no
 * built-in normalizer, and a Scala UDF would break the suite-wide no-UDF
 * contract AND leave whole-stage codegen). Composition normalization is
 * the standard first step of text canonicalization before dedup: "é" as
 * one codepoint and "e"+U+0301 must hash identically or exact/near-dup
 * both miss trivially-equal documents.
 *
 * `java.text.Normalizer` implements Unicode Standard Annex #15 — the same
 * spec DuckDB's `nfc_normalize` implements, so the canonical form is
 * cross-engine replayable. ASCII-only strings pass through unchanged
 * (Normalizer.isNormalized fast-path inside the JDK).
 */
case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got $other")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_nfc"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($v.toString(),
         |    java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
}

/** Column-level entry points for the native text expressions. */
/**
 * Codegen'd 28-bin character histogram: bin 0 = space, 1–26 = 'a'–'z',
 * 27 = everything else (digits, punctuation, every non-ASCII codepoint —
 * UTF-8 continuation bytes are skipped, so multi-byte characters count as
 * ONE unit). Purpose: the Levenshtein lower bound
 * `lev(a,b) >= ceil(L1(hist(a), hist(b)) / 2)` — any single-character
 * insert/delete/substitute changes at most two bins by one — which lets
 * edit-distance candidate pairs die on a 28-int comparison instead of an
 * O(maxDist·len) DP run. Collapsing many characters into bin 27 only
 * WEAKENS the bound (never breaks it), so pruning stays complete.
 */
case class CharHistogram(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $other")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "char_histogram"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val h = new Array[Int](28)
    val nb = s.numBytes()
    var i = 0
    while (i < nb) {
      val b = s.getByte(i)
      if ((b & 0xC0) != 0x80) { // skip UTF-8 continuation bytes
        val u = b & 0xFF
        if (u == 32) h(0) += 1
        else if (u >= 97 && u <= 122) h(u - 96) += 1
        else h(27) += 1
      }
      i += 1
    }
    new GenericArrayData(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val h = ctx.freshName("h")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val u = ctx.freshName("u")
      s"""
         |int[] $h = new int[28];
         |int $nb = $s.numBytes();
         |for (int $i = 0; $i < $nb; $i++) {
         |  byte $b = $s.getByte($i);
         |  if (($b & 0xC0) != 0x80) {
         |    int $u = $b & 0xFF;
         |    if ($u == 32) $h[0]++;
         |    else if ($u >= 97 && $u <= 122) $h[$u - 96]++;
         |    else $h[27]++;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($h);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): CharHistogram =
    copy(child = c)
}

/** Codegen'd L1 distance of two int-array columns (Σ|aᵢ−bᵢ|; a missing
  * tail counts as zeros). The pair-loop companion of [[CharHistogram]]. */
case class L1Distance(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<int> inputs, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "l1_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements(); val ny = y.numElements()
    val n = math.min(nx, ny)
    var s = 0L
    var i = 0
    while (i < n) { s += math.abs(x.getInt(i).toLong - y.getInt(i)); i += 1 }
    while (i < nx) { s += math.abs(x.getInt(i).toLong); i += 1 }
    i = n
    while (i < ny) { s += math.abs(y.getInt(i).toLong); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val n = ctx.freshName("n"); val s = ctx.freshName("s"); val i = ctx.freshName("i")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $n = java.lang.Math.min($nx, $ny);
         |long $s = 0L;
         |int $i = 0;
         |for (; $i < $n; $i++) $s += java.lang.Math.abs((long) $a.getInt($i) - $b.getInt($i));
         |for (; $i < $nx; $i++) $s += java.lang.Math.abs((long) $a.getInt($i));
         |for ($i = $n; $i < $ny; $i++) $s += java.lang.Math.abs((long) $b.getInt($i));
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): L1Distance =
    copy(left = l, right = r)
}

/** Codegen'd common-prefix LENGTH of two long-array columns — the LCP
  * unit of the suffix-ordering dedup ([[graft.operators.Suffix]]): how
  * many leading elements two token-hash tails share. O(answer) per
  * pair; nulls inside arrays don't occur on its call sites (hash
  * arrays are containsNull = false). */
case class CommonPrefixLen(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> inputs, got $other")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "common_prefix_len"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n && x.getLong(i) == y.getLong(i)) i += 1
    i.toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $i = 0;
         |while ($i < $n && $a.getLong($i) == $b.getLong($i)) $i++;
         |${ev.value} = (long) $i;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CommonPrefixLen =
    copy(left = l, right = r)
}

object TextFunctions {
  /** Codegen'd word n-gram shingle hashes of a token-array column
    * (with duplicates; wrap in `array_distinct` for set semantics). */
  def ngramHashes(tokens: Column, n: Int): Column =
    bridge.column(NgramHashes(bridge.expression(tokens), n))

  /** Codegen'd Unicode NFC normalization (UAX #15; DuckDB nfc_normalize). */
  def normalizeNfc(text: Column): Column =
    bridge.column(NormalizeNfc(bridge.expression(text)))

  /** Codegen'd 28-bin character histogram (Levenshtein prefilter unit). */
  def charHistogram(text: Column): Column =
    bridge.column(CharHistogram(bridge.expression(text)))

  /** Codegen'd L1 distance between two int-array columns. */
  def l1Distance(a: Column, b: Column): Column =
    bridge.column(L1Distance(bridge.expression(a), bridge.expression(b)))

  /** Codegen'd common-prefix length of two long-array columns. */
  def commonPrefixLen(a: Column, b: Column): Column =
    bridge.column(CommonPrefixLen(bridge.expression(a), bridge.expression(b)))
}
