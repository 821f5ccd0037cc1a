package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Provenance / audit operators (SURVEY.md §2.9 V1-V3).
  *
  * The reference keeps a human-auditable `Source` trail of tokens shaped
  * `kind:{k=v, k2=v2}` joined by ` | `, where re-emitting a token of the
  * same kind replaces it in place (`apps-scripts/code-LLM-intergration.js:
  * 791-812`). Pure column expressions — the upsert is a regex replace, the
  * append a concat — so provenance costs one projection, no shuffle.
  */
object Provenance {

  /** Render a token `kind:{k=v, k2=v2}` from literal keys + column values
    * (reference `pretty`, lines 803-805). */
  def render_token(kind: String, fields: Seq[(String, Column)]): Column = {
    val body = fields.map { case (k, v) => concat(lit(s"$k="), v) }
    concat(lit(s"$kind:{"), concat_ws(", ", body: _*), lit("}"))
  }

  /** V1 `appendSourceToken_`: replace an existing same-kind token in place,
    * else append with ` | ` (lines 806-811). `prev` may be null/''.
    *
    * Note: `regexp_replace`'s replacement string treats `$` and `\` as
    * group references, so the rendered token is escaped first. */
  def source_token_upsert(prev: Column, kind: String, token: Column): Column = {
    val kindRe = java.util.regex.Pattern.quote(kind) + ":\\{[^}]*\\}"
    val safePrev = coalesce(prev, lit(""))
    val escaped = regexp_replace(token, "([\\\\$])", "\\\\$1")
    when(safePrev.rlike(kindRe), regexp_replace(safePrev, lit(kindRe), escaped))
      .otherwise(when(safePrev === "", token)
        .otherwise(concat(safePrev, lit(" | "), token)))
  }

  /** The standard parse token written at write-back (reference
    * `writeBack_`, lines 846-851): provider + decision trail + conf with
    * exactly 2 decimals (`conf.toFixed(2)`). */
  def parse_token(provider: Column, decision: Column, conf: Column): Column =
    render_token("parse", Seq(
      "provider" -> coalesce(nullif(provider, lit("")), lit("direct")),
      "signals" -> coalesce(nullif(decision, lit("")), lit("heuristic")),
      "conf" -> format_number(conf, 2)))

  /** V3 error capture: message truncated to `limit` chars (reference
    * truncates to 300/200; lines 915-917). */
  def error_message(err: Column, limit: Int = 300): Column =
    substring(coalesce(err, lit("")), 1, limit)
}
