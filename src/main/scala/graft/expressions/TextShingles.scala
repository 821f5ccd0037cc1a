package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The word-gram / shingle / fingerprint builders FUSED into codegen'd
  * expressions — the [[VectorKernels]] recipe applied to the text
  * family's per-row hot path (round-18 verdict item 4: the last
  * `lambdafunction` in the minhash-family plans was the shingling
  * `transform`).
  *
  * WHY: the HOF formulations evaluated, PER ROW, an interpreted
  * `transform(sequence(0, n−w), i → array_join(slice(tokens, i+1, w)))`
  * lambda per gram — with the `split(trim(coalesce(text)))` token
  * array recomputed in several branches of the surrounding CASE — plus
  * an interpreted `array_distinct`. Shingling sits under every MinHash
  * sign/screen (dedup family + admission streams + decontaminate) and
  * the gram counters under drift/importance/repetition; the
  * fingerprint's `transform(sequence, i → md5(substr))` materialized
  * every candidate hash as a string before `array_min`.
  *
  * BIT-EXACT PARITY with the HOF trees (TextShinglesSpec pins fused ==
  * HOF on randomized + adversarial inputs): tokenization goes through
  * the same `UTF8String.trim` / Java-regex split the interpreted
  * `StringTrim`/`StringSplit` used, joins produce the same UTF-8
  * bytes, `array_distinct` order (first occurrence) is replayed with a
  * linked set, and the fingerprint compares the same lowercase-hex md5
  * strings. Null text behaves as the `coalesce(text, '')` the
  * originals started with — never a null output. */
object TextShingles {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  private def trimmed(text: UTF8String): UTF8String =
    if (text == null) UTF8String.EMPTY_UTF8 else text.trim()

  /** `split(trim(coalesce(text, '')), "\\s+", -1)` — String.split
    * semantics, exactly what StringSplit evaluates. */
  private def tokens(t: UTF8String): Array[String] =
    Ws.split(t.toString, -1)

  /** [[graft.functions.TextFns.word_shingles]]: distinct w-shingles,
    * whole-trimmed-text fallback when fewer than `w` tokens. */
  def shingles(text: UTF8String, w: Int): ArrayData = {
    val t = trimmed(text)
    val tok = tokens(t)
    if (tok.length < w)
      new GenericArrayData(Array[Any](t))
    else {
      val seen = new java.util.LinkedHashSet[String](tok.length * 2)
      var i = 0
      val last = tok.length - w
      val sb = new java.lang.StringBuilder
      while (i <= last) {
        sb.setLength(0)
        var j = 0
        while (j < w) {
          if (j > 0) sb.append(' ')
          sb.append(tok(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var o = 0
      while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
      new GenericArrayData(out)
    }
  }

  /** [[graft.functions.TextFns.word_grams]]: w-grams WITH multiplicity,
    * empty array for empty text or fewer than `w` tokens. */
  def grams(text: UTF8String, w: Int): ArrayData = {
    val t = trimmed(text)
    if (t.numBytes() == 0) return new GenericArrayData(Array.empty[Any])
    val tok = tokens(t)
    if (tok.length < w) return new GenericArrayData(Array.empty[Any])
    val last = tok.length - w
    val out = new Array[Any](last + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(tok(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** [[graft.functions.TextFns.doc_fingerprint]]: min lowercase-hex md5
    * over the k-char grams of `lower(regexp_replace(trim(text), "\\s+",
    * " "))`, md5 of the whole text at ≤ k chars, "" when empty. The
    * min runs over the SAME hex strings `array_min(transform(…))`
    * compared (binary UTF8 order == String order on hex), without
    * materializing the candidate array. */
  // one MessageDigest per thread, reset per gram — DigestUtils.md5Hex
  // allocates a fresh digest per call, which at (chars − k + 1) calls
  // per document is the fingerprint's dominant allocation
  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))
  private val HexDigits = "0123456789abcdef".toCharArray

  @inline private def md5Hex(md: java.security.MessageDigest,
                             bytes: Array[Byte]): String = {
    md.reset()
    val d = md.digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def fingerprint(text: UTF8String, k: Int): UTF8String = {
    val t = trimmed(text)
    // RegExpReplace then Lower, in the original's order; the regex runs
    // on the Java string exactly as RegExpReplace does
    val norm = UTF8String.fromString(
      Ws.matcher(t.toString).replaceAll(" ")).toLowerCase
    val n = norm.numChars()
    val md = md5Local.get()
    if (n == 0) UTF8String.EMPTY_UTF8
    else if (n <= k) UTF8String.fromString(md5Hex(md, norm.getBytes))
    else {
      var best: String = null
      var i = 1
      val lastStart = n - k + 1
      while (i <= lastStart) {
        val h = md5Hex(md, norm.substringSQL(i, k).getBytes)
        if (best == null || h.compareTo(best) < 0) best = h
        i += 1
      }
      UTF8String.fromString(best)
    }
  }

  // ---------------------------------------------------------- columns

  def word_shingles_fused(text: Column, w: Int): Column =
    Bridge.column(WordShinglesExpr(Bridge.expression(text), w))

  def word_grams_fused(text: Column, w: Int): Column =
    Bridge.column(WordGramsExpr(Bridge.expression(text), w))

  def doc_fingerprint_fused(text: Column, k: Int): Column =
    Bridge.column(DocFingerprintExpr(Bridge.expression(text), k))
}

private[expressions] trait TextKernelBase extends UnaryExpression {
  override def nullable: Boolean = false
  protected def checkString(): Unit = child.dataType match {
    case StringType => ()
    case other => throw new IllegalArgumentException(
      s"$prettyName expects a string column, got $other")
  }
}

/** Distinct w-shingles — never null (null text behaves as ''). */
case class WordShinglesExpr(child: Expression, w: Int)
    extends TextKernelBase {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles_fused"

  override def eval(input: InternalRow): Any = {
    checkString()
    TextShingles.shingles(
      child.eval(input).asInstanceOf[UTF8String], w)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    checkString()
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      |${c.code}
      |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
      |  graft.expressions.TextShingles.shingles(
      |    ${c.isNull} ? null : ${c.value}, $w);
      |""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordShinglesExpr = copy(child = newChild)
}

/** w-grams with multiplicity — never null. */
case class WordGramsExpr(child: Expression, w: Int)
    extends TextKernelBase {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_grams_fused"

  override def eval(input: InternalRow): Any = {
    checkString()
    TextShingles.grams(child.eval(input).asInstanceOf[UTF8String], w)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    checkString()
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      |${c.code}
      |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
      |  graft.expressions.TextShingles.grams(
      |    ${c.isNull} ? null : ${c.value}, $w);
      |""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordGramsExpr = copy(child = newChild)
}

/** Winnowing-style min-md5 fingerprint — never null. */
case class DocFingerprintExpr(child: Expression, k: Int)
    extends TextKernelBase {
  override def dataType: DataType = StringType
  override def prettyName: String = "doc_fingerprint_fused"

  override def eval(input: InternalRow): Any = {
    checkString()
    TextShingles.fingerprint(
      child.eval(input).asInstanceOf[UTF8String], k)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    checkString()
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      |${c.code}
      |org.apache.spark.unsafe.types.UTF8String ${ev.value} =
      |  graft.expressions.TextShingles.fingerprint(
      |    ${c.isNull} ? null : ${c.value}, $k);
      |""".stripMargin,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): DocFingerprintExpr = copy(child = newChild)
}
