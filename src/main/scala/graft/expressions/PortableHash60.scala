package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Engine-portable 60-bit hash as a native codegen'd expression: the
  * value of the first 15 hex chars of md5(s) — identical to
  * `conv(substring(md5(s), 1, 15), 16, 10)` and to the oracle's
  * hex-digit arithmetic ([[graft.queries.Dsl.hex60Sql]]) — computed
  * straight from the digest bytes. Skipping the hex-string render and
  * the base-16 string parse, and reusing a thread-local MessageDigest,
  * makes the portable signature pipelines ~2× cheaper while producing
  * byte-identical values.
  *
  * First 15 hex chars = bytes 0..6 plus the high nibble of byte 7:
  * shift-or them into a long (top 4 bits stay zero, so the value is
  * always non-negative and fits DuckDB's BIGINT exactly).
  */
object PortableHash60 {

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Hash raw UTF-8 bytes; called from interpreted and generated code. */
  def hash(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    (v << 4) | ((d(7) & 0xF0L) >>> 4)
  }

  def hash(s: UTF8String): Long = hash(s.getBytes)

  /** Column-level entry point. */
  def portable_hash60(s: Column): Column =
    Bridge.column(PortableHash60Expr(Bridge.expression(s)))
}

case class PortableHash60Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "portable_hash60"

  override def nullSafeEval(input: Any): Any =
    PortableHash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.PortableHash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PortableHash60Expr =
    copy(child = newChild)
}
