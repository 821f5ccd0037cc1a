package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.Bridge
import graft.expressions.CanonicalUrlExpr
import graft.functions._

/** Engine registration surface (SURVEY.md §7.0 "registered SQL functions
  * for oracle parity" + §4 item 3 optimizer-extension showcase).
  *
  *  - [[GraftRegistry.registerFunctions]] exposes the operator library to
  *    SQL texts. Every function binds to the same Catalyst expression tree
  *    the column API builds (no UDF wrapper), so SQL use keeps codegen.
  *  - [[GraftExtensions]] is a `SparkSessionExtensions` installer — use
  *    `.withExtensions(new GraftExtensions)` or `spark.sql.extensions` —
  *    injecting the [[GraftRegistry.CanonicalUrlIdempotence]] rule.
  */
object GraftRegistry {

  /** Optimizer rule: `canonical_url` is idempotent (f∘f = f), so nested
    * applications collapse to one — a domain rewrite Catalyst can't know
    * on its own. */
  object CanonicalUrlIdempotence extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressions {
        case CanonicalUrlExpr(inner @ CanonicalUrlExpr(_)) => inner
      }
  }

  private def asCol(e: Expression): Column = Bridge.column(e)

  private def reg(spark: SparkSession, name: String)(builder: Seq[Expression] => Column): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => Bridge.expressionNow(spark, builder(exprs)), "built-in")

  /** Register the scalar library for SQL use on this session. */
  def registerFunctions(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "canonical_url", exprs => CanonicalUrlExpr(exprs.head), "built-in")
    reg(spark, "host_from_url") { e => UrlFns.host_from_url(asCol(e.head)) }
    reg(spark, "is_ats_host") { e => UrlFns.is_ats_host(asCol(e.head)) }
    reg(spark, "is_aggregator_host") { e => UrlFns.is_aggregator_host(asCol(e.head)) }
    reg(spark, "nice_case") { e => UrlFns.nice_case(asCol(e.head)) }
    reg(spark, "guess_company_from_url") { e => UrlFns.guess_company_from_url(asCol(e.head)) }
    reg(spark, "find_first_ats_link") { e => UrlFns.find_first_ats_link(asCol(e.head)) }
    reg(spark, "get_title") { e => HtmlFns.get_title(asCol(e.head)) }
    reg(spark, "get_h1") { e => HtmlFns.get_h1(asCol(e.head)) }
    reg(spark, "strip_emojis") { e => HtmlFns.strip_emojis(asCol(e.head)) }
    reg(spark, "decode_html") { e => HtmlFns.decode_html(asCol(e.head)) }
    reg(spark, "is_generic_title") { e => HtmlFns.is_generic_title(asCol(e.head)) }
    reg(spark, "has_useful_signal") { e => HtmlFns.has_useful_signal(asCol(e.head)) }
    reg(spark, "text_preview") { e => HtmlFns.text_preview(asCol(e.head)) }
    reg(spark, "clean_role") { e => RoleFns.clean_role(asCol(e.head), asCol(e(1))) }
    reg(spark, "parse_jsonld_jobposting") { e =>
      JsonLdFns.parse_jsonld_jobposting(asCol(e.head)) }
    reg(spark, "token_count") { e => TextFns.token_count(asCol(e.head)) }
    reg(spark, "subword_count") { e => TextFns.subword_count(asCol(e.head)) }
    reg(spark, "language_id") { e => TextFns.language_id(asCol(e.head)) }
    reg(spark, "quality_score") { e => TextFns.quality_score(asCol(e.head)) }
    reg(spark, "doc_fingerprint") { e => TextFns.doc_fingerprint(asCol(e.head)) }
    reg(spark, "word_shingles") { e => TextFns.word_shingles(asCol(e.head)) }
    reg(spark, "vec_cosine") { e => VectorFns.cosine(asCol(e.head), asCol(e(1))) }
    reg(spark, "vec_dot") { e => VectorFns.dot(asCol(e.head), asCol(e(1))) }
    reg(spark, "vec_l2_norm") { e => VectorFns.l2_norm(asCol(e.head)) }
    // the remaining fusion/provenance vocabulary, so the WHOLE parse
    // lifecycle is expressible as one SQL text (pipeline_end_to_end_sql):
    // get_meta/source_token_upsert take a compile-time name argument in
    // the column API; the SQL form requires that argument foldable
    reg(spark, "get_meta") { e =>
      HtmlFns.get_meta(asCol(e.head), foldedString(e(1)), foldedString(e(2))) }
    reg(spark, "looks_like_company_dash_role") { e =>
      RoleFns.looks_like_company_dash_role(asCol(e.head)) }
    reg(spark, "title_split_company") { e => RoleFns.title_split_company(asCol(e.head)) }
    reg(spark, "title_split_role") { e => RoleFns.title_split_role(asCol(e.head)) }
    reg(spark, "parse_token") { e =>
      graft.ops.Provenance.parse_token(asCol(e.head), asCol(e(1)), asCol(e(2))) }
    reg(spark, "source_token_upsert") { e =>
      graft.ops.Provenance.source_token_upsert(
        asCol(e.head), foldedString(e(1)), asCol(e(2))) }
  }

  /** Evaluate a foldable string argument (SQL literal) at registration
    * time — the handful of functions with compile-time name parameters
    * surface them in SQL as literal-only arguments. */
  private def foldedString(e: Expression): String = {
    require(e.foldable, s"argument must be a string literal, got $e")
    val v = e.eval(null)
    require(v != null, s"argument must be a non-null string literal, got $e")
    v.toString
  }
}

/** `SparkSessionExtensions` installer: optimizer rule + planner strategy
  * injection. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => GraftRegistry.CanonicalUrlIdempotence)
    e.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}
