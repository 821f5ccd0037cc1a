package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Flagship custom Catalyst scalar expression (SURVEY.md §4 item 1):
  * canonical-URL rewrite — drop the reference's 14 tracking parameters from
  * the query string, keep everything else (path, other params in order,
  * fragment). Semantics from `apps-scripts/code-LLM-intergration.js:612-619`
  * (`makeCanonical_`), minus WHATWG re-normalization: we rewrite only the
  * query component, so already-well-formed URLs round-trip byte-identical —
  * the property the dedup key actually needs (idempotent: f(f(x)) = f(x)).
  *
  * Spark's `parse_url` can extract a query param but cannot *rewrite* the
  * query, hence the custom expression. Implemented with `doGenCode` calling
  * a static method so the operator stays inside whole-stage codegen.
  */
object CanonicalUrl {
  /** Tracking params stripped for dedup (`code-LLM-intergration.js:615`). */
  val DropParams: Set[String] = Set(
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gh_src", "src", "source", "vq_campaign", "vq_source",
    "__jvst", "__jvsd", "codes", "gh_jid")

  private def decodeKey(k: String): String =
    try java.net.URLDecoder.decode(k, "UTF-8")
    catch { case _: Exception => k }

  /** Pure string rewrite; called from both interpreted and generated code. */
  def canonicalize(url: String): String = {
    val qStart = url.indexOf('?')
    if (qStart < 0) return url
    val hashIdx = url.indexOf('#', qStart)
    val qEnd = if (hashIdx < 0) url.length else hashIdx
    val query = url.substring(qStart + 1, qEnd)
    if (query.isEmpty) return url
    val kept = query.split("&", -1).filter { pair =>
      val eq = pair.indexOf('=')
      val key = if (eq < 0) pair else pair.substring(0, eq)
      !DropParams.contains(decodeKey(key))
    }
    val prefix = url.substring(0, qStart)
    val suffix = url.substring(qEnd)
    if (kept.isEmpty) prefix + suffix
    else prefix + "?" + kept.mkString("&") + suffix
  }

  /** Column-level entry point. */
  def canonical_url(url: Column): Column =
    Bridge.column(CanonicalUrlExpr(Bridge.expression(url)))
}

case class CanonicalUrlExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "canonical_url"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      CanonicalUrl.canonicalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.expressions.CanonicalUrl.canonicalize($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): CanonicalUrlExpr =
    copy(child = newChild)
}
