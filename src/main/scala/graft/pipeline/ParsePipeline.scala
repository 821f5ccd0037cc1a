package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Provenance, Resolution}

/** §3.1 end-to-end parse stage: cascade fetch → signal fusion → renderer
  * escalation → keyed write-back with provenance.
  *
  * The reference's per-row sequential loop (12-row batches, 1 row/s
  * throttle) becomes three declarative passes over the whole batch; the
  * write-back mutation becomes a left join + column overwrite (SURVEY.md
  * §1.3) — the shape that scales to arbitrarily many rows.
  */
object ParsePipeline {

  /** R3 escalation (reference lines 897-906): rows that parsed at conf 0
    * from a non-renderer provider get one re-parse on the rendered html;
    * the better parse wins and the fetch token records the escalation. */
  def withEscalation(decided: DataFrame): DataFrame = {
    // rename the first-pass columns, then gate the re-parse on them
    val renamed = decided
      .withColumnRenamed("company", "company_1")
      .withColumnRenamed("role", "role_1")
      .withColumnRenamed("canonical", "canonical_1")
      .withColumnRenamed("conf", "conf_1")
      .withColumnRenamed("decision", "decision_1")
    val needs = col("conf_1") === 0.0 && col("provider") =!= "renderer" &&
      coalesce(col("rendered_html"), lit("")) =!= ""
    // URL-derived signals are identical in both passes — reuse them when
    // the first pass kept them instead of re-running the URL regexes
    val re = Resolution.decideCompanyRole(renamed,
      when(needs, col("rendered_html")).otherwise(lit("")),
      col("final_url"),
      reuseUrlSignals = renamed.columns.contains("_canon"))
    val better = col("conf") > col("conf_1")
    re
      .withColumn("escalated", needs && better)
      .withColumn("company", when(better, col("company")).otherwise(col("company_1")))
      .withColumn("role", when(better, col("role")).otherwise(col("role_1")))
      .withColumn("canonical", when(better, col("canonical")).otherwise(col("canonical_1")))
      .withColumn("decision", when(better, col("decision")).otherwise(col("decision_1")))
      .withColumn("conf", when(better, col("conf")).otherwise(col("conf_1")))
      .drop("company_1", "role_1", "canonical_1", "conf_1", "decision_1",
        "_host", "_is_agg", "_ats_slug", "_canon")
  }

  /** Full parse stage over a links batch (columns: sheet_name, row_index,
    * url) against fetch fixtures. Returns parse results keyed for
    * write-back. */
  def parse(links: DataFrame, fixtures: DataFrame): DataFrame = {
    val fetched = FetchCascade(links, fixtures)
    val decided = Resolution.decideCompanyRole(fetched, col("html"),
      col("final_url"), keepUrlSignals = true)
    val escalated = withEscalation(decided)
    escalated.withColumn("parse_token",
      Provenance.parse_token(col("provider"), col("decision"), col("conf")))
      .withColumn("source_new",
        Provenance.source_token_upsert(lit(""), "parse", col("parse_token")))
      .withColumn("source_new",
        when(col("escalated"), Provenance.source_token_upsert(col("source_new"),
          "fetch", lit("fetch:{escalated=renderer}")))
          .otherwise(col("source_new")))
  }

  /** J3/S9 write-back: overwrite derived columns on matching tracker rows,
    * set Status, upsert provenance; untouched rows flow through. */
  def writeBack(tracker: DataFrame, results: DataFrame): DataFrame = {
    val r = results.select(
      col("sheet_name"), col("row_index"),
      col("canonical").as("_canonical"), col("company").as("_company"),
      col("role").as("_role"), col("source_new").as("_source"))
    tracker.join(r, Seq("sheet_name", "row_index"), "left_outer")
      .withColumn("canonical_link",
        when(col("_canonical").isNotNull, col("_canonical")).otherwise(col("canonical_link")))
      .withColumn("company_auto",
        when(col("_company").isNotNull, col("_company")).otherwise(col("company_auto")))
      .withColumn("role_auto",
        when(col("_role").isNotNull, col("_role")).otherwise(col("role_auto")))
      .withColumn("status",
        when(col("_source").isNotNull, lit("ok")).otherwise(col("status")))
      .withColumn("source", {
        // merge: upsert each freshly-written kind into the existing trail
        val withParse = Provenance.source_token_upsert(
          coalesce(col("source"), lit("")), "parse",
          regexp_extract(col("_source"), "parse:\\{[^}]*\\}", 0))
        val merged = when(col("_source").rlike("fetch:\\{[^}]*\\}"),
          Provenance.source_token_upsert(withParse, "fetch",
            regexp_extract(col("_source"), "fetch:\\{[^}]*\\}", 0)))
          .otherwise(withParse)
        when(col("_source").isNotNull, merged).otherwise(col("source"))
      })
      .drop("_canonical", "_company", "_role", "_source")
  }
}
