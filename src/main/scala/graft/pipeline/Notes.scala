package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** R6 `renderTemplateNotes_` + F16 snippet assembly + J5 profile
  * cross-join (SURVEY.md §2.8/§2.7; reference `apps-scripts/
  * code-LLM-intergration.js:982-998,1061-1079`).
  *
  * The profile is a tiny key-value table → broadcast cross join puts its
  * fields on every row for free; templates are pure string expressions
  * (byte-for-byte the reference's wording, including typographic quotes
  * and the 10–15 en-dash). */
object Notes {

  /** J5/S11: collect the 2-column profile table into one row and
    * broadcast-cross-join it onto `df` as `profile_<key>` columns.
    *
    * The cross join is row-count-safe BY CONSTRUCTION, not by
    * precondition: the global aggregate below always produces exactly one
    * row — an empty profile yields null fields instead of annihilating
    * `df`, and duplicate keys reduce deterministically via `min` instead
    * of multiplying rows or picking an arbitrary `first` (on a well-formed
    * profile, keys are unique and `min` IS the value). */
  def withProfile(df: DataFrame, profile: DataFrame,
                  keys: Seq[String] = Seq("one-line hook", "headline", "top skills")): DataFrame = {
    val fields = keys.map { k =>
      min(when(col("key") === k, col("value")))
        .as("profile_" + k.replaceAll("[^a-z0-9]+", "_"))
    }
    val one = profile.groupBy().agg(fields.head, fields.tail: _*)
    df.crossJoin(broadcast(one))
  }

  /** Template fields from reference lines 1067-1077. Expects `company`,
    * `role`, and the profile_* columns; appends template_invite (≤280)
    * and template_followup. */
  def withTemplateNotes(df: DataFrame): DataFrame = {
    val hook = coalesce(nullif(col("profile_one_line_hook"), lit("")),
      nullif(col("profile_headline"), lit("")), lit("software engineer"))
    val comp = coalesce(nullif(col("company"), lit("")), lit("your company"))
    val role = coalesce(nullif(col("role"), lit("")), lit("this role"))
    val skills = coalesce(nullif(col("profile_top_skills"), lit("")),
      lit("full-stack development and shipping production features"))
    val invite = concat(
      lit("Hi there — I applied for "), role, lit(" at "), comp, lit("."),
      lit(" I'm a "), hook, lit(" and would love to connect."))
    val followup = concat(
      lit("Thanks for connecting! I just applied for "), role, lit(" at "),
      comp, lit("."),
      lit(" My background includes "), skills, lit("."),
      lit(" If there’s a chance to chat, I’d value 10–15 minutes to share how I can contribute."))
    df.withColumn("template_invite", substring(invite, 1, 280))
      .withColumn("template_followup", followup)
  }

  /** F16 `buildNoteSnippet_`: the nested snippet struct handed to the
    * notes model (reference lines 989-997), serialized to JSON. */
  def snippet_json(url: Column, company: Column, role: Column, h1: Column,
                   ogTitle: Column, ogSite: Column, title: Column,
                   bodyPreview: Column, sheet: Column): Column =
    to_json(struct(
      graft.functions.UrlFns.canonical_url(url).as("url"),
      coalesce(company, lit("")).as("company"),
      coalesce(role, lit("")).as("role"),
      h1.as("h1"), ogTitle.as("ogTitle"), ogSite.as("ogSite"),
      title.as("title"), bodyPreview.as("body_preview"),
      sheet.as("sheet")))

  /** P8/J2: notes idempotency — only rows whose notes are still blank. */
  def needsNotes(df: DataFrame): DataFrame =
    df.filter(trim(coalesce(col("li_invite"), lit(""))) === "" ||
      trim(coalesce(col("li_followup"), lit(""))) === "")
}
