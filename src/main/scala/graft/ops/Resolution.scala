package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{HtmlFns, JsonLdFns, RoleFns, UrlFns}

/** R1 `decideCompanyRole_` — priority-ordered multi-signal fusion
  * (SURVEY.md §2.8; reference `apps-scripts/code-LLM-intergration.js:
  * 692-777`).
  *
  * Signal ladder (weights are the reference's):
  *   jsonld-org +0.5 · jsonld-title +0.5 · ats-slug +0.35 · h1 +0.35 /
  *   og:title +0.25 / title +0.15 · og:site_name +0.25 (suppressed on
  *   aggregator hosts) · title-split rescue (conf = max(conf, 0.55)) ·
  *   clean → clamp (missing field caps conf at 0.5; final clamp [0,1]).
  *
  * Implemented as one layered `select` of when/coalesce columns — all
  * Catalyst expressions except the JSON-LD recursion UDF, so the whole
  * decision runs inside whole-stage codegen per row, embarrassingly
  * parallel at any scale. The LLM escalation arm (R4) is a separate
  * optional stage in [[LlmRescue]]; this core is fully deterministic.
  */
object Resolution {

  /** Appends decision columns: company, role, canonical, conf, decision.
    * Inputs: `html` page content, `finalUrl` post-redirect URL.
    *
    * The URL-derived signals (`_host`, `_is_agg`, `_ats_slug`, and the
    * canonical URL) depend only on `finalUrl`, so a second fusion pass
    * over re-fetched html (renderer escalation) recomputes them for
    * nothing. `keepUrlSignals = true` leaves them (plus `_canon`) in the
    * output for a follow-up pass; `reuseUrlSignals = true` consumes them
    * instead of recomputing — regex/codegen work on the escalation pass
    * drops to the html-derived signals only. */
  def decideCompanyRole(df: DataFrame, html: Column, finalUrl: Column,
                        keepUrlSignals: Boolean = false,
                        reuseUrlSignals: Boolean = false): DataFrame = {
    val base =
      if (reuseUrlSignals) df
      else df
        .withColumn("_host", UrlFns.host_from_url(finalUrl))
        .withColumn("_is_agg", UrlFns.is_aggregator_host(col("_host")))
        .withColumn("_ats_slug", UrlFns.guess_company_from_url(finalUrl))
        .withColumn("_canon", UrlFns.canonical_url(finalUrl))
    val withSignals = base
      .withColumn("_jsonld", JsonLdFns.parse_jsonld_jobposting(html))
      .withColumn("_og_site", HtmlFns.get_meta(html, "og:site_name", "property"))
      .withColumn("_h1", HtmlFns.get_h1(html))
      .withColumn("_og_title", HtmlFns.get_meta(html, "og:title", "property"))
      .withColumn("_title", HtmlFns.get_title(html))

    val jsonCompany = col("_jsonld.company")
    val jsonRole = col("_jsonld.role")

    // Company ladder: jsonld → ats-slug → og:site_name (non-aggregator).
    val staged = withSignals
      .withColumn("_c1", when(jsonCompany =!= "", jsonCompany).otherwise(lit("")))
      .withColumn("_c2", when(col("_c1") =!= "", col("_c1"))
        .otherwise(col("_ats_slug")))
      // Role ladder: jsonld → h1 → og:title → title.
      .withColumn("_r1", when(jsonRole =!= "", jsonRole)
        .when(col("_h1") =!= "", col("_h1"))
        .when(col("_og_title") =!= "", col("_og_title"))
        .otherwise(col("_title")))
      .withColumn("_c3", when(col("_c2") =!= "", col("_c2"))
        .when(col("_og_site") =!= "" && !col("_is_agg"), col("_og_site"))
        .otherwise(lit("")))
      // Title-split rescue: only when still no company and role has a
      // spaced dash.
      .withColumn("_split",
        col("_c3") === "" && col("_r1") =!= "" &&
          RoleFns.looks_like_company_dash_role(col("_r1")))
      .withColumn("_c4", when(col("_split"), RoleFns.title_split_company(col("_r1")))
        .otherwise(col("_c3")))
      .withColumn("_r2", when(col("_split"), RoleFns.title_split_role(col("_r1")))
        .otherwise(col("_r1")))

    // Additive confidence in reference signal order, then split-floor.
    val confRaw =
      when(jsonCompany =!= "", lit(0.5)).otherwise(lit(0.0)) +
      when(jsonRole =!= "", lit(0.5)).otherwise(lit(0.0)) +
      when(jsonCompany === "" && col("_ats_slug") =!= "", lit(0.35)).otherwise(lit(0.0)) +
      when(jsonRole === "" && col("_h1") =!= "", lit(0.35))
        .when(jsonRole === "" && col("_h1") === "" && col("_og_title") =!= "", lit(0.25))
        .when(jsonRole === "" && col("_h1") === "" && col("_og_title") === "" &&
          col("_title") =!= "", lit(0.15))
        .otherwise(lit(0.0)) +
      when(col("_c2") === "" && col("_og_site") =!= "" && !col("_is_agg"), lit(0.25))
        .otherwise(lit(0.0))

    // Decision trail: signal names in reference push-order, '+'-joined.
    val trail = concat_ws("+",
      when(jsonCompany =!= "", lit("jsonld-org")),
      when(jsonRole =!= "", lit("jsonld-title")),
      when(jsonCompany === "" && col("_ats_slug") =!= "", lit("ats-slug")),
      when(jsonRole === "" && col("_h1") =!= "", lit("h1")),
      when(jsonRole === "" && col("_h1") === "" && col("_og_title") =!= "",
        lit("og:title")),
      when(jsonRole === "" && col("_h1") === "" && col("_og_title") === "" &&
        col("_title") =!= "", lit("title")),
      when(col("_c2") === "" && col("_og_site") =!= "" && !col("_is_agg"),
        lit("og:site_name")),
      when(col("_split"), lit("title-split")))

    val decided = staged
      .withColumn("_conf0", when(col("_split"), greatest(confRaw, lit(0.55)))
        .otherwise(confRaw))
      .withColumn("company", col("_c4"))
      .withColumn("role", RoleFns.clean_role(col("_r2"), col("_c4")))
      .withColumn("canonical", col("_canon"))
      .withColumn("_conf1",
        when(col("company") === "", least(col("_conf0"), lit(0.5)))
          .otherwise(col("_conf0")))
      .withColumn("_conf2",
        when(col("role") === "", least(col("_conf1"), lit(0.5)))
          .otherwise(col("_conf1")))
      .withColumn("conf", greatest(least(col("_conf2"), lit(1.0)), lit(0.0)))
      .withColumn("decision",
        when(trail === "", lit("heuristic")).otherwise(trail))

    val alwaysDrop = Seq(
      "_jsonld", "_og_site", "_h1", "_og_title", "_title",
      "_c1", "_c2", "_c3", "_c4", "_r1", "_r2", "_split",
      "_conf0", "_conf1", "_conf2")
    val urlCols = Seq("_host", "_is_agg", "_ats_slug", "_canon")
    decided.drop(
      (if (keepUrlSignals) alwaysDrop else alwaysDrop ++ urlCols): _*)
  }
}
