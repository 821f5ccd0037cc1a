package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.{FetchCascade, Notes}

/** Driver-contract demos of the pipeline stages (SURVEY.md §2.8 R2, §2.8
  * R6, §3.1): the access-path cascade and the notes template, run over
  * fixtures synthesized from `orders` so the DuckDB oracle can replicate
  * the expected routing/rendering per modulo class. */
object PipelineQueries extends QueryModule {

  private val RichHtml =
    """<script type="application/ld+json">{"@type":"JobPosting","title":"Fixture Role","hiringOrganization":{"name":"Fixture Co"}}</script>"""
  private val ThinHtml = "<p>loading</p>"

  /** R2: one fixture row per synthesized URL + unwrap targets; cascade
    * routes each of 5 page classes to its expected provider. */
  /** 5 synthesized page classes keyed by o_orderkey % 5 (shared by the
    * cascade demo and the end-to-end capstone). */
  private def classLinks(s: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    Tables.spread(Tables.orders(s, dir)).select(
      concat(lit("t"), k % 3).as("sheet_name"), k.as("row_index"),
      when(k % 5 === 0, concat(lit("https://boards.greenhouse.io/co"), k % 7,
          lit("/jobs/"), k))
      .when(k % 5 === 1, concat(lit("https://direct.example.com/j/"), k))
      .when(k % 5 === 2, concat(lit("https://jsheavy.example.com/j/"), k))
      .when(k % 5 === 3, concat(lit("https://www.linkedin.com/jobs/view/"), k))
      .otherwise(concat(lit("https://dead.example.com/j/"), k)).as("url"))
  }

  private def classFixtures(links: DataFrame): DataFrame = {
    val primary = links.select(col("url"),
      when(col("url").contains("direct.example") ||
           col("url").contains("linkedin") ||
           col("url").contains("jsheavy") ||
           col("url").contains("dead"),
        when(col("url").contains("dead"), lit(500)).otherwise(lit(200)))
        .as("direct_status"),
      when(col("url").contains("direct.example"), lit(RichHtml))
        .when(col("url").contains("jsheavy") || col("url").contains("dead"),
          lit(ThinHtml))
        .when(col("url").contains("linkedin"),
          concat(lit("<a href=\"https://jobs.lever.co/wrap"),
            regexp_extract(col("url"), "view/(\\d+)", 1), lit("/x\">ats</a>")))
        .as("direct_html"),
      when(col("url").contains("jsheavy"), lit(RichHtml)).as("rendered_html"),
      when(col("url").contains("greenhouse"), lit("API Role")).as("api_role"))

    val unwrapTargets = links.filter(col("url").contains("linkedin"))
      .select(
        concat(lit("https://jobs.lever.co/wrap"), col("row_index"), lit("/x")).as("url"),
        lit(200).as("direct_status"),
        lit("<h1>Unwrapped Role</h1>").as("direct_html"),
        lit(null).cast("string").as("rendered_html"),
        lit(null).cast("string").as("api_role"))
    primary.union(unwrapTargets)
  }

  private def r2Cascade(s: SparkSession, dir: String): DataFrame = {
    val links = classLinks(s, dir)
    FetchCascade(links, classFixtures(links))
      .groupBy("provider")
      .agg(count(lit(1)).as("n"), min(col("api_company")).as("min_company"))
  }

  private val r2Sql =
    """SELECT
      |  CASE o_orderkey % 5
      |    WHEN 0 THEN 'gh-api' WHEN 1 THEN 'direct' WHEN 2 THEN 'renderer'
      |    WHEN 3 THEN 'direct-unwrapped' ELSE 'direct' END AS provider,
      |  COUNT(*) AS n,
      |  MIN(CASE WHEN o_orderkey % 5 = 0 THEN 'Co' || (o_orderkey % 7) END)
      |    AS min_company
      |FROM orders GROUP BY 1""".stripMargin

  /** R6/J5: profile cross-join + deterministic template rendering. */
  private def r6TemplateNotes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val profile = Seq(
      ("one-line hook", "backend engineer who ships"),
      ("top skills", "Scala, Spark, SQL")).toDF("key", "value")
    val k = col("o_orderkey")
    val rows = Tables.spread(Tables.orders(s, dir)).select(
      concat(lit("Co "), k % 7).as("company"),
      when(k % 3 === 0, lit("")).otherwise(concat(lit("Role "), k % 5)).as("role"))
    Notes.withTemplateNotes(Notes.withProfile(rows, profile))
      .groupBy("template_invite").agg(count(lit(1)).as("n"))
  }

  private val r6Sql =
    """SELECT 'Hi there — I applied for ' ||
      |  (CASE WHEN o_orderkey % 3 = 0 THEN 'this role'
      |        ELSE 'Role ' || (o_orderkey % 5) END) ||
      |  ' at Co ' || (o_orderkey % 7) ||
      |  '. I''m a backend engineer who ships and would love to connect.'
      |    AS template_invite,
      |  COUNT(*) AS n
      |FROM orders GROUP BY 1""".stripMargin

  /** R3 renderer escalation: direct pages whose JSON-LD is present but
    * carries no JobPosting parse at conf 0 (useful-signal ≠ parseable),
    * triggering the one-shot renderer re-parse; the rendered page parses
    * at conf 1. Even keys escalate; odd keys parse directly. */
  private def r3Escalation(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.ParsePipeline
    val k = col("o_orderkey")
    val orders = Tables.spread(Tables.orders(s, dir))
    val links = orders.select(lit("t1").as("sheet_name"), k.as("row_index"),
      concat(lit("https://site.example.com/j/"), k).as("url"))
    val emptyJsonLd =
      """<script type="application/ld+json">{"@type":"WebSite"}</script>"""
    val fixtures = links.select(col("url"),
      lit(200).as("direct_status"),
      when(col("row_index") % 2 === 0, lit(emptyJsonLd))
        .otherwise(lit(RichHtml)).as("direct_html"),
      when(col("row_index") % 2 === 0, lit(RichHtml)).as("rendered_html"),
      lit(null).cast("string").as("api_role"))
    ParsePipeline.parse(links, fixtures)
      .groupBy("escalated", "conf", "decision")
      .agg(count(lit(1)).as("n"), min(col("source_new")).as("min_source"))
  }

  private val r3Sql =
    """SELECT (o_orderkey % 2 = 0) AS escalated, CAST(1.0 AS DOUBLE) AS conf,
      |  'jsonld-org+jsonld-title' AS decision, COUNT(*) AS n,
      |  CASE WHEN o_orderkey % 2 = 0 THEN
      |    'parse:{provider=direct, signals=jsonld-org+jsonld-title, conf=1.00} | fetch:{escalated=renderer}'
      |  ELSE
      |    'parse:{provider=direct, signals=jsonld-org+jsonld-title, conf=1.00}'
      |  END AS min_source
      |FROM orders GROUP BY 1""".stripMargin

  /** Capstone: the reference's §3.1 lifecycle end-to-end — validity-gated
    * idempotent enqueue → cascade fetch → signal fusion → escalation →
    * keyed write-back with provenance — over the 5 page classes plus an
    * invalid-link class (o_orderkey % 7 == 6 never enqueues). Output is
    * the final tracker state grouped by (status, source trail). */
  private def pipelineEndToEnd(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.{ParsePipeline, Queues}
    val k = col("o_orderkey")
    val classed = classLinks(s, dir)
    val tracker = classed
      .withColumn("link",
        when(col("row_index") % 7 === 6, lit("not a url")).otherwise(col("url")))
      .select(col("sheet_name"), col("row_index"), col("link"),
        lit("").as("canonical_link"), lit("").as("company_auto"),
        lit("").as("role_auto"), lit("").as("status"), lit("").as("source"))
    val emptyQueue = tracker
      .select(col("sheet_name"), col("row_index"), col("link").as("url"))
      .withColumn("status", lit("queued")).filter(lit(false))
    val queued = Queues.enqueue(
      tracker.select(col("sheet_name"), col("row_index"), col("link").as("url")),
      emptyQueue)
    val results = ParsePipeline.parse(
      queued.select("sheet_name", "row_index", "url"),
      classFixtures(classed))
    ParsePipeline.writeBack(tracker, results)
      .groupBy("status", "source")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("company_auto")).as("n_companies"))
  }

  private val pipelineEndToEndSql =
    """WITH rows AS (
      |  SELECT o_orderkey AS k,
      |    CASE WHEN o_orderkey % 7 = 6 THEN '' ELSE 'ok' END AS status,
      |    CASE WHEN o_orderkey % 7 = 6 THEN '' ELSE
      |      CASE o_orderkey % 5
      |        WHEN 0 THEN 'parse:{provider=gh-api, signals=ats-slug, conf=0.35}'
      |        WHEN 1 THEN 'parse:{provider=direct, signals=jsonld-org+jsonld-title, conf=1.00}'
      |        WHEN 2 THEN 'parse:{provider=renderer, signals=jsonld-org+jsonld-title, conf=1.00}'
      |        WHEN 3 THEN 'parse:{provider=direct-unwrapped, signals=ats-slug+h1, conf=0.70}'
      |        ELSE 'parse:{provider=direct, signals=heuristic, conf=0.00}'
      |      END END AS source,
      |    CASE WHEN o_orderkey % 7 = 6 THEN '' ELSE
      |      CASE o_orderkey % 5
      |        WHEN 0 THEN 'Co' || (o_orderkey % 7)
      |        WHEN 1 THEN 'Fixture Co'
      |        WHEN 2 THEN 'Fixture Co'
      |        WHEN 3 THEN 'Wrap' || o_orderkey
      |        ELSE '' END END AS company
      |  FROM orders)
      |SELECT status, source, COUNT(*) AS n,
      |  COUNT(DISTINCT company) AS n_companies
      |FROM rows GROUP BY 1, 2""".stripMargin

  /** P8 + F16 on the gate: the needs-notes idempotency filter (blank OR
    * whitespace-only notes qualify; fully-noted rows are excluded) feeds
    * the snippet struct the notes model receives, serialized by the same
    * `to_json` the pipeline uses. URLs are query-less so canonical_url
    * is the identity and the oracle can rebuild the JSON by string
    * assembly. */
  private def p8NeedsNotesSnippet(s: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    val tracker = Tables.orders(s, dir).select(
      lit("t1").as("sheet_name"), k.as("row_index"),
      concat(lit("https://co.example/j/"), k).as("url"),
      concat(lit("Co "), k % 7).as("company"),
      when(k % 3 === 0, lit("")).otherwise(concat(lit("Role "), k % 5)).as("role"),
      when(k % 4 === 1, lit("sent")).when(k % 4 === 2, lit("   "))
        .otherwise(lit("")).as("li_invite"),
      when(k % 4 === 1, lit("sent fu")).otherwise(lit("")).as("li_followup"))
    Notes.needsNotes(tracker)
      .select(col("row_index"),
        Notes.snippet_json(col("url"), col("company"), col("role"),
          lit("H1"), lit("OG Title"), lit("OG Site"), lit("Title"),
          lit("body preview"), col("sheet_name")).as("snippet"))
  }

  private val p8Sql =
    """SELECT o_orderkey AS row_index,
      |  '{"url":"https://co.example/j/' || o_orderkey ||
      |  '","company":"Co ' || (o_orderkey % 7) ||
      |  '","role":"' ||
      |  (CASE WHEN o_orderkey % 3 = 0 THEN ''
      |        ELSE 'Role ' || (o_orderkey % 5) END) ||
      |  '","h1":"H1","ogTitle":"OG Title","ogSite":"OG Site",' ||
      |  '"title":"Title","body_preview":"body preview","sheet":"t1"}'
      |    AS snippet
      |FROM orders WHERE o_orderkey % 4 <> 1""".stripMargin

  /** R4/R7: LLM extract-rescue over a deterministic fixture transport
    * (prompt → strict-JSON completion, a pure function, so the oracle can
    * replay it). Odd keys parse strongly and skip the model; even keys
    * have no company and a generic role → rescued, conf floor 0.6,
    * extract token recorded. Keys divisible by 10 get a malformed
    * completion → fallback path with err token. */
  private def r4LlmRescue(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.Llm
    val k = col("o_orderkey")
    val rows = Tables.spread(Tables.orders(s, dir)).select(
      k.as("o_orderkey"),
      concat(lit("prompt-"), k).as("prompt"),
      when(k % 2 === 0, lit("")).otherwise(concat(lit("Known Co "), k % 5)).as("company"),
      when(k % 2 === 0, lit("Job Details")).otherwise(lit("Staff Engineer")).as("role"),
      when(k % 2 === 0, lit(0.15)).otherwise(lit(0.85)).as("conf"))
    val transport = Llm.FixtureTransport { p =>
      val key = p.stripPrefix("prompt-").toLong
      if (key % 10 == 0) Some("no json here")
      else Some(s"""Sure: {"company":"LLM Co ${key % 3}","role":"LLM Role"} done""")
    }
    Llm.extractRescue(rows, transport, col("prompt"))
      .groupBy("company", "role", "conf", "extract_token")
      .agg(count(lit(1)).as("n"))
  }

  private val r4Sql =
    """SELECT
      |  CASE WHEN o_orderkey % 2 = 1 THEN 'Known Co ' || (o_orderkey % 5)
      |       WHEN o_orderkey % 10 = 0 THEN ''
      |       ELSE 'LLM Co ' || (o_orderkey % 3) END AS company,
      |  CASE WHEN o_orderkey % 2 = 1 THEN 'Staff Engineer'
      |       WHEN o_orderkey % 10 = 0 THEN 'Job Details'
      |       ELSE 'LLM Role' END AS role,
      |  CAST(CASE WHEN o_orderkey % 2 = 1 THEN 0.85
      |       WHEN o_orderkey % 10 = 0 THEN 0.15 ELSE 0.6 END AS DOUBLE) AS conf,
      |  CASE WHEN o_orderkey % 2 = 1 THEN NULL
      |       WHEN o_orderkey % 10 = 0 THEN 'extract:{mode=llm, err=no-output}'
      |       ELSE 'extract:{mode=llm}' END AS extract_token,
      |  COUNT(*) AS n
      |FROM orders GROUP BY 1, 2, 3, 4""".stripMargin

  /** R5/R7 notes fallback semantics, oracle-gated the way R4 is: a
    * fixture transport with DETERMINISTIC FAILURES — %10==0 malformed
    * completion, %10==5 blank invite field, %7==2 transport returns None
    * (model unavailable) — all three land in template mode; everything
    * else is LLM mode, with %3==1 planting a 300-char invite that must
    * truncate to exactly 280 (reference `apps-scripts/
    * code-LLM-intergration.js:1181`) and every LLM follow-up planted in
    * the reference's 280-500 length band (lines 1019-1020). The output is
    * mode counts + length bounds, so a wrong fallback decision, a missed
    * truncation, or an out-of-band follow-up all hash-mismatch. */
  private def r5NotesFallback(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.Llm
    import s.implicits._
    val profile = Seq(
      ("one-line hook", "backend engineer who ships"),
      ("top skills", "Scala, Spark, SQL")).toDF("key", "value")
    val k = col("o_orderkey")
    val rows = Tables.spread(Tables.orders(s, dir)).select(
      k.as("o_orderkey"),
      concat(lit("p-"), k).as("prompt"),
      concat(lit("Co "), k % 7).as("company"),
      when(k % 3 === 0, lit("")).otherwise(concat(lit("Role "), k % 5)).as("role"),
      lit("").as("source"))
    val transport = Llm.FixtureTransport { p =>
      val key = p.stripPrefix("p-").toLong
      if (key % 10 == 0) Some("the model rambled, no json")
      else if (key % 10 == 5) Some("""{"invite":"","followup":"present"}""")
      else if (key % 7 == 2) None // deterministic transport failure
      else {
        val fu = "F" * (280 + (key % 221)).toInt
        val invite = if (key % 3 == 1) "L" * 300
          else s"Hi Co ${key % 7}! Keen to connect."
        Some(s"""ok {"invite":"$invite","followup":"$fu"} bye""")
      }
    }
    Llm.notesWithFallback(
      Notes.withTemplateNotes(Notes.withProfile(rows, profile)),
      transport, col("prompt"))
      .groupBy("notes_mode")
      .agg(count(lit(1)).as("n"),
        max(length(col("li_invite"))).as("max_invite_len"),
        min(length(col("li_followup"))).as("min_fu_len"),
        max(length(col("li_followup"))).as("max_fu_len"))
  }

  private val r5Sql =
    """WITH cls AS (
      |  SELECT o_orderkey AS k,
      |    CASE WHEN o_orderkey % 3 = 0 THEN 'this role'
      |         ELSE 'Role ' || (o_orderkey % 5) END AS role2,
      |    'Co ' || (o_orderkey % 7) AS comp
      |  FROM orders),
      |f AS (
      |  SELECT k,
      |    CASE WHEN k % 10 = 0 OR k % 10 = 5 OR k % 7 = 2
      |         THEN 'template' ELSE 'llm' END AS notes_mode,
      |    CASE
      |      WHEN k % 10 = 0 OR k % 10 = 5 OR k % 7 = 2 THEN
      |        'Hi there — I applied for ' || role2 || ' at ' || comp ||
      |        '. I''m a backend engineer who ships and would love to connect.'
      |      WHEN k % 3 = 1 THEN repeat('L', 280)
      |      ELSE 'Hi Co ' || (k % 7) || '! Keen to connect.'
      |    END AS li_invite,
      |    CASE
      |      WHEN k % 10 = 0 OR k % 10 = 5 OR k % 7 = 2 THEN
      |        'Thanks for connecting! I just applied for ' || role2 || ' at ' ||
      |        comp || '. My background includes Scala, Spark, SQL.' ||
      |        ' If there’s a chance to chat, I’d value 10–15 minutes to share how I can contribute.'
      |      ELSE repeat('F', CAST(280 + (k % 221) AS INT))
      |    END AS li_followup
      |  FROM cls)
      |SELECT notes_mode, COUNT(*) AS n,
      |  CAST(MAX(length(li_invite)) AS INT) AS max_invite_len,
      |  CAST(MIN(length(li_followup)) AS INT) AS min_fu_len,
      |  CAST(MAX(length(li_followup)) AS INT) AS max_fu_len
      |FROM f GROUP BY 1""".stripMargin

  /** Capstone: the reference's §3.2 notes lifecycle end-to-end (reference
    * `apps-scripts/code-LLM-intergration.js:1119-1198`): needs-notes
    * idempotency filter (P8/J2) → snippet assembly (F16) → fixture LLM
    * (R5) with a malformed-completion class and a blank-field class →
    * template fallback (R7) → 280-char invite truncation → keyed
    * write-back with `notes:{mode=llm|template}` provenance upsert (V1).
    * Classes by o_orderkey: %11==3 already has notes (skipped untouched);
    * %10==0 malformed completion and %10==5 blank invite → template mode;
    * %3==1 over-long LLM invite → truncated to exactly 280 chars; rest →
    * LLM mode. */
  private def notesEndToEnd(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.Llm
    import s.implicits._
    val profile = Seq(
      ("one-line hook", "backend engineer who ships"),
      ("top skills", "Scala, Spark, SQL")).toDF("key", "value")
    val k = col("o_orderkey")
    val tracker = Tables.spread(Tables.orders(s, dir)).select(
      lit("t1").as("sheet_name"), k.as("row_index"),
      concat(lit("https://co.example/j/"), k).as("url"),
      concat(lit("Co "), k % 7).as("company"),
      when(k % 3 === 0, lit("")).otherwise(concat(lit("Role "), k % 5)).as("role"),
      when(k % 11 === 3, lit("already sent")).otherwise(lit("")).as("li_invite"),
      when(k % 11 === 3, lit("sent fu")).otherwise(lit("")).as("li_followup"),
      lit("parse:{provider=direct}").as("source"))
    val todo = Notes.needsNotes(tracker)
      .withColumn("prompt", Notes.snippet_json(col("url"), col("company"),
        col("role"), lit("H1"), lit("OG Title"), lit("OG Site"), lit("Title"),
        lit("body preview"), col("sheet_name")))
    val transport = Llm.FixtureTransport { p =>
      val key = "/j/(\\d+)".r.findFirstMatchIn(p).map(_.group(1).toLong).getOrElse(-1L)
      if (key % 10 == 0) Some("the model rambled with no json")
      else if (key % 10 == 5) Some("""{"invite":"","followup":"present"}""")
      else if (key % 3 == 1)
        Some(s"""ok: {"invite":"${"L" * 300}","followup":"FU ${key % 4}","meta":"m"} bye""")
      else Some(s"""{"invite":"Hi Co ${key % 7}! Keen to connect.","followup":"FU ${key % 4}","meta":"m"}""")
    }
    val noted = Llm.notesWithFallback(
      Notes.withTemplateNotes(Notes.withProfile(todo, profile)),
      transport, col("prompt"))
    val updates = noted.select(col("row_index").as("u_key"),
      col("li_invite").as("u_invite"), col("li_followup").as("u_followup"),
      col("source").as("u_source"))
    tracker.join(updates, col("row_index") === col("u_key"), "left")
      .select(
        coalesce(col("u_invite"), col("li_invite")).as("li_invite"),
        coalesce(col("u_followup"), col("li_followup")).as("li_followup"),
        coalesce(col("u_source"), col("source")).as("source"))
      .groupBy("li_invite", "li_followup", "source")
      .agg(count(lit(1)).as("n"))
  }

  private val notesEndToEndSql =
    """WITH classed AS (
      |  SELECT o_orderkey AS k,
      |    CASE WHEN o_orderkey % 3 = 0 THEN 'this role'
      |         ELSE 'Role ' || (o_orderkey % 5) END AS role2,
      |    'Co ' || (o_orderkey % 7) AS comp
      |  FROM orders),
      |final AS (
      |  SELECT
      |    CASE
      |      WHEN k % 11 = 3 THEN 'already sent'
      |      WHEN k % 10 = 0 OR k % 10 = 5 THEN
      |        'Hi there — I applied for ' || role2 || ' at ' || comp ||
      |        '. I''m a backend engineer who ships and would love to connect.'
      |      WHEN k % 3 = 1 THEN repeat('L', 280)
      |      ELSE 'Hi ' || comp || '! Keen to connect.'
      |    END AS li_invite,
      |    CASE
      |      WHEN k % 11 = 3 THEN 'sent fu'
      |      WHEN k % 10 = 0 OR k % 10 = 5 THEN
      |        'Thanks for connecting! I just applied for ' || role2 || ' at ' ||
      |        comp || '. My background includes Scala, Spark, SQL.' ||
      |        ' If there’s a chance to chat, I’d value 10–15 minutes to share how I can contribute.'
      |      ELSE 'FU ' || (k % 4)
      |    END AS li_followup,
      |    CASE
      |      WHEN k % 11 = 3 THEN 'parse:{provider=direct}'
      |      WHEN k % 10 = 0 OR k % 10 = 5 THEN
      |        'parse:{provider=direct} | notes:{mode=template}'
      |      ELSE 'parse:{provider=direct} | notes:{mode=llm}'
      |    END AS source
      |  FROM classed)
      |SELECT li_invite, li_followup, source, COUNT(*) AS n
      |FROM final GROUP BY 1, 2, 3""".stripMargin

  /** The §3.1 lifecycle as ONE `spark.sql` text — the SQL-string surface
    * of [[pipelineEndToEnd]]. Every stage (validity-gated enqueue,
    * cascade levels, signal-fusion ladder, renderer escalation, token
    * assembly, keyed write-back) is SQL over the registered function
    * library ([[graft.GraftRegistry.registerFunctions]]) and three temp
    * views; the DataFrame inputs build only the INPUT views (fixtures /
    * tracker — test scaffolding, not lifecycle). Gated by the SAME oracle
    * as the DataFrame path, so both surfaces must hash-agree. */
  private def pipelineEndToEndViaSql(s: SparkSession, dir: String): DataFrame = {
    graft.GraftRegistry.registerFunctions(s)
    val classed = classLinks(s, dir)
    classed.withColumn("link",
        when(col("row_index") % 7 === 6, lit("not a url")).otherwise(col("url")))
      .select(col("sheet_name"), col("row_index"), col("link"),
        lit("").as("canonical_link"), lit("").as("company_auto"),
        lit("").as("role_auto"), lit("").as("status"), lit("").as("source"))
      .createOrReplaceTempView("petl_tracker")
    classFixtures(classed).createOrReplaceTempView("petl_fixtures")
    classed.select(col("sheet_name"), col("row_index"), col("url"),
        lit("queued").as("status")).filter(lit(false))
      .createOrReplaceTempView("petl_queue")

    // regexes as SQL literals (the parser consumes one backslash level)
    def rx(re: String) = re.replace("\\", "\\\\")
    val gh = rx(FetchCascade.GhUrlRe)
    val lever = rx(FetchCascade.LeverUrlRe)
    val structT = "STRUCT<provider:STRING,status:INT,final_url:STRING," +
      "html:STRING,api_company:STRING,api_role:STRING>"

    /** One cascade level over `p`-prefixed fixture columns for url `u` —
      * the SQL rendition of FetchCascade.level. */
    def level(u: String, p: String) =
      s"""CASE
         |  WHEN ${p}api_role IS NOT NULL AND regexp_extract($u, '$gh', 1) <> '' THEN
         |    named_struct('provider', 'gh-api', 'status', 200,
         |      'final_url', canonical_url($u), 'html', '',
         |      'api_company', nice_case(regexp_extract($u, '$gh', 1)),
         |      'api_role', ${p}api_role)
         |  WHEN ${p}api_role IS NOT NULL AND regexp_extract($u, '$lever', 1) <> '' THEN
         |    named_struct('provider', 'lever-api', 'status', 200,
         |      'final_url', canonical_url($u), 'html', '',
         |      'api_company', nice_case(regexp_extract($u, '$lever', 1)),
         |      'api_role', ${p}api_role)
         |  WHEN ${p}direct_status IS NOT NULL AND ${p}direct_status < 400
         |      AND ${p}direct_useful THEN
         |    named_struct('provider', 'direct', 'status', ${p}direct_status,
         |      'final_url', $u, 'html', ${p}direct_html,
         |      'api_company', CAST(NULL AS STRING), 'api_role', CAST(NULL AS STRING))
         |  WHEN ${p}rendered_useful THEN
         |    named_struct('provider', 'renderer', 'status', 200,
         |      'final_url', $u, 'html', ${p}rendered_html,
         |      'api_company', CAST(NULL AS STRING), 'api_role', CAST(NULL AS STRING))
         |  ELSE CAST(NULL AS $structT)
         |END""".stripMargin

    /** The R1 fusion ladder (Resolution.decideCompanyRole) over html
      * expression `h`, emitting `company/role/conf/decision` with suffix
      * `sfx`; URL signals (_host/_is_agg/_ats_slug/_canon) are computed
      * by an upstream CTE and reused by both passes. */
    def fusion(h: String, sfx: String) =
      s"""  parse_jsonld_jobposting($h).company AS _jc$sfx,
         |  parse_jsonld_jobposting($h).role AS _jr$sfx,
         |  get_meta($h, 'og:site_name', 'property') AS _og_site$sfx,
         |  get_h1($h) AS _h1$sfx,
         |  get_meta($h, 'og:title', 'property') AS _og_title$sfx,
         |  get_title($h) AS _title$sfx""".stripMargin
    def ladder(sfx: String) =
      s"""  CASE WHEN _jc$sfx <> '' THEN _jc$sfx ELSE _ats_slug END AS _c2$sfx,
         |  CASE WHEN _jr$sfx <> '' THEN _jr$sfx
         |       WHEN _h1$sfx <> '' THEN _h1$sfx
         |       WHEN _og_title$sfx <> '' THEN _og_title$sfx
         |       ELSE _title$sfx END AS _r1$sfx,
         |  (CASE WHEN _jc$sfx <> '' THEN 0.5D ELSE 0.0D END +
         |   CASE WHEN _jr$sfx <> '' THEN 0.5D ELSE 0.0D END +
         |   CASE WHEN _jc$sfx = '' AND _ats_slug <> '' THEN 0.35D ELSE 0.0D END +
         |   CASE WHEN _jr$sfx = '' AND _h1$sfx <> '' THEN 0.35D
         |        WHEN _jr$sfx = '' AND _h1$sfx = '' AND _og_title$sfx <> '' THEN 0.25D
         |        WHEN _jr$sfx = '' AND _h1$sfx = '' AND _og_title$sfx = ''
         |          AND _title$sfx <> '' THEN 0.15D
         |        ELSE 0.0D END) AS _confa$sfx,
         |  concat_ws('+',
         |    CASE WHEN _jc$sfx <> '' THEN 'jsonld-org' END,
         |    CASE WHEN _jr$sfx <> '' THEN 'jsonld-title' END,
         |    CASE WHEN _jc$sfx = '' AND _ats_slug <> '' THEN 'ats-slug' END,
         |    CASE WHEN _jr$sfx = '' AND _h1$sfx <> '' THEN 'h1' END,
         |    CASE WHEN _jr$sfx = '' AND _h1$sfx = '' AND _og_title$sfx <> ''
         |      THEN 'og:title' END,
         |    CASE WHEN _jr$sfx = '' AND _h1$sfx = '' AND _og_title$sfx = ''
         |      AND _title$sfx <> '' THEN 'title' END) AS _trail1$sfx""".stripMargin
    def decide(sfx: String) =
      s"""  CASE WHEN _c3$sfx = '' AND _r1$sfx <> ''
         |      AND looks_like_company_dash_role(_r1$sfx)
         |    THEN true ELSE false END AS _split$sfx""".stripMargin
    def finish(sfx: String) =
      s"""  CASE WHEN _split$sfx THEN title_split_company(_r1$sfx)
         |       ELSE _c3$sfx END AS _company0$sfx,
         |  clean_role(CASE WHEN _split$sfx THEN title_split_role(_r1$sfx)
         |                  ELSE _r1$sfx END,
         |             CASE WHEN _split$sfx THEN title_split_company(_r1$sfx)
         |                  ELSE _c3$sfx END) AS _role0$sfx,
         |  CASE WHEN _split$sfx THEN greatest(
         |      CASE WHEN _confb$sfx > _confa$sfx THEN _confb$sfx ELSE _confa$sfx END,
         |      0.55D)
         |    ELSE _confb$sfx END AS _conf0$sfx,
         |  CASE WHEN concat_ws('+', nullif(_trail1$sfx, ''),
         |        CASE WHEN _split$sfx THEN 'title-split' END) = ''
         |    THEN 'heuristic'
         |    ELSE concat_ws('+', nullif(_trail1$sfx, ''),
         |        CASE WHEN _split$sfx THEN 'title-split' END) END AS _decision$sfx""".stripMargin

    s.sql(s"""
      |WITH queued AS (
      |  -- J1 validity-gated idempotent enqueue (anti-join vs in-flight)
      |  SELECT t.sheet_name, t.row_index, t.link AS url
      |  FROM petl_tracker t
      |  LEFT ANTI JOIN (
      |    SELECT sheet_name, row_index FROM petl_queue
      |    WHERE status IN ('queued', 'processing')) q
      |    ON t.sheet_name = q.sheet_name AND t.row_index = q.row_index
      |  WHERE t.link RLIKE '(?i)^https?://'
      |),
      |fx AS (
      |  SELECT url, CAST(direct_status AS INT) AS direct_status, direct_html,
      |    rendered_html, api_role,
      |    has_useful_signal(direct_html) AS direct_useful,
      |    has_useful_signal(rendered_html) AS rendered_useful
      |  FROM petl_fixtures
      |),
      |j1 AS (
      |  SELECT q.*, f.direct_status AS f_direct_status,
      |    f.direct_html AS f_direct_html, f.rendered_html AS f_rendered_html,
      |    f.api_role AS f_api_role, f.direct_useful AS f_direct_useful,
      |    f.rendered_useful AS f_rendered_useful
      |  FROM queued q LEFT JOIN fx f ON q.url = f.url
      |),
      |l1 AS (
      |  SELECT *, ${level("url", "f_")} AS _lvl1,
      |    CASE WHEN ${level("url", "f_")} IS NULL
      |        AND is_aggregator_host(host_from_url(url))
      |        AND find_first_ats_link(concat(coalesce(f_rendered_html, ''),
      |              coalesce(f_direct_html, ''))) <> ''
      |      THEN find_first_ats_link(concat(coalesce(f_rendered_html, ''),
      |              coalesce(f_direct_html, '')))
      |    END AS _ats_url
      |  FROM j1
      |),
      |l2 AS (
      |  -- null-skew bypass (same as FetchCascade): null _ats_url rows get
      |  -- per-row never-matching keys so the hash exchange stays uniform;
      |  -- the IS NOT NULL guard makes the bypass sentinel-independent
      |  SELECT l1.*, u.direct_status AS u_direct_status,
      |    u.direct_html AS u_direct_html, u.rendered_html AS u_rendered_html,
      |    u.api_role AS u_api_role, u.direct_useful AS u_direct_useful,
      |    u.rendered_useful AS u_rendered_useful
      |  FROM l1 LEFT JOIN fx u
      |    ON coalesce(l1._ats_url, concat(' ', l1.url)) = u.url
      |      AND l1._ats_url IS NOT NULL
      |),
      |cascaded AS (
      |  SELECT sheet_name, row_index, url,
      |    coalesce(
      |      _lvl1,
      |      CASE WHEN _lvl2x IS NOT NULL THEN named_struct(
      |        'provider', concat(_lvl2x.provider, '-unwrapped'),
      |        'status', _lvl2x.status, 'final_url', _lvl2x.final_url,
      |        'html', _lvl2x.html, 'api_company', _lvl2x.api_company,
      |        'api_role', _lvl2x.api_role) END,
      |      CASE
      |        WHEN coalesce(f_rendered_html, '') <> '' THEN named_struct(
      |          'provider', 'renderer', 'status', 200, 'final_url', url,
      |          'html', f_rendered_html, 'api_company', CAST(NULL AS STRING),
      |          'api_role', CAST(NULL AS STRING))
      |        WHEN f_direct_status IS NOT NULL THEN named_struct(
      |          'provider', 'direct', 'status', f_direct_status,
      |          'final_url', url, 'html', coalesce(f_direct_html, ''),
      |          'api_company', CAST(NULL AS STRING),
      |          'api_role', CAST(NULL AS STRING))
      |      END) AS fetched,
      |    f_rendered_html AS rendered_html
      |  FROM (SELECT *, ${level("_ats_url", "u_")} AS _lvl2x FROM l2)
      |),
      |fetched AS (
      |  SELECT sheet_name, row_index, url,
      |    fetched.provider AS provider, fetched.final_url AS final_url,
      |    fetched.html AS html, fetched.api_company AS api_company,
      |    rendered_html
      |  FROM cascaded
      |),
      |-- R1 fusion pass 1: URL signals + html signals + ladder
      |sig1 AS (
      |  SELECT *, host_from_url(final_url) AS _host,
      |    is_aggregator_host(host_from_url(final_url)) AS _is_agg,
      |    guess_company_from_url(final_url) AS _ats_slug,
      |    canonical_url(final_url) AS _canon,
      |${fusion("html", "")}
      |  FROM fetched
      |),
      |lad1 AS (SELECT *,
      |${ladder("")}
      |  FROM sig1),
      |c31 AS (SELECT *,
      |  CASE WHEN _c2 <> '' THEN _c2
      |       WHEN _og_site <> '' AND NOT _is_agg THEN _og_site
      |       ELSE '' END AS _c3,
      |  _confa + CASE WHEN _c2 = '' AND _og_site <> '' AND NOT _is_agg
      |    THEN 0.25D ELSE 0.0D END AS _confb,
      |  concat_ws('+', nullif(_trail1, ''),
      |    CASE WHEN _c2 = '' AND _og_site <> '' AND NOT _is_agg
      |      THEN 'og:site_name' END) AS _trail1b
      |  FROM lad1),
      |sp1 AS (SELECT *, ${decide("")} FROM
      |  (SELECT * EXCEPT (_trail1), _trail1b AS _trail1 FROM c31)),
      |pass1 AS (SELECT *,
      |${finish("")}
      |  FROM sp1),
      |clamp1 AS (
      |  SELECT *, greatest(least(
      |      CASE WHEN _role0 = '' THEN least(
      |        CASE WHEN _company0 = '' THEN least(_conf0, 0.5D) ELSE _conf0 END,
      |        0.5D)
      |      ELSE CASE WHEN _company0 = '' THEN least(_conf0, 0.5D)
      |           ELSE _conf0 END END,
      |      1.0D), 0.0D) AS conf_1
      |  FROM pass1
      |),
      |-- R3 escalation: conf-0 non-renderer rows with rendered html re-fuse
      |esc AS (
      |  SELECT *, (conf_1 = 0.0D AND provider <> 'renderer'
      |    AND coalesce(rendered_html, '') <> '') AS _needs,
      |    CASE WHEN (conf_1 = 0.0D AND provider <> 'renderer'
      |      AND coalesce(rendered_html, '') <> '') THEN rendered_html
      |      ELSE '' END AS _html2
      |  FROM clamp1
      |),
      |sig2 AS (SELECT *,
      |${fusion("_html2", "_e")}
      |  FROM esc),
      |lad2 AS (SELECT *,
      |${ladder("_e")}
      |  FROM sig2),
      |c32 AS (SELECT *,
      |  CASE WHEN _c2_e <> '' THEN _c2_e
      |       WHEN _og_site_e <> '' AND NOT _is_agg THEN _og_site_e
      |       ELSE '' END AS _c3_e,
      |  _confa_e + CASE WHEN _c2_e = '' AND _og_site_e <> '' AND NOT _is_agg
      |    THEN 0.25D ELSE 0.0D END AS _confb_e,
      |  concat_ws('+', nullif(_trail1_e, ''),
      |    CASE WHEN _c2_e = '' AND _og_site_e <> '' AND NOT _is_agg
      |      THEN 'og:site_name' END) AS _trail1b_e
      |  FROM lad2),
      |sp2 AS (SELECT *, ${decide("_e")} FROM
      |  (SELECT * EXCEPT (_trail1_e), _trail1b_e AS _trail1_e FROM c32)),
      |pass2 AS (SELECT *,
      |${finish("_e")}
      |  FROM sp2),
      |clamp2 AS (
      |  SELECT *, greatest(least(
      |      CASE WHEN _role0_e = '' THEN least(
      |        CASE WHEN _company0_e = '' THEN least(_conf0_e, 0.5D)
      |             ELSE _conf0_e END, 0.5D)
      |      ELSE CASE WHEN _company0_e = '' THEN least(_conf0_e, 0.5D)
      |           ELSE _conf0_e END END,
      |      1.0D), 0.0D) AS conf_2
      |  FROM pass2
      |),
      |merged AS (
      |  SELECT sheet_name, row_index,
      |    (_needs AND conf_2 > conf_1) AS escalated,
      |    CASE WHEN conf_2 > conf_1 THEN _company0_e ELSE _company0 END AS company,
      |    CASE WHEN conf_2 > conf_1 THEN _role0_e ELSE _role0 END AS role,
      |    _canon AS canonical,
      |    CASE WHEN conf_2 > conf_1 THEN conf_2 ELSE conf_1 END AS conf,
      |    CASE WHEN conf_2 > conf_1 THEN _decision_e ELSE _decision END AS decision,
      |    provider
      |  FROM clamp2
      |),
      |results AS (
      |  SELECT sheet_name, row_index, canonical, company, role,
      |    CASE WHEN escalated THEN source_token_upsert(
      |        source_token_upsert('', 'parse',
      |          parse_token(provider, decision, conf)),
      |        'fetch', 'fetch:{escalated=renderer}')
      |      ELSE source_token_upsert('', 'parse',
      |        parse_token(provider, decision, conf)) END AS source_new
      |  FROM merged
      |),
      |-- J3/S9 keyed write-back over the tracker
      |written AS (
      |  SELECT
      |    CASE WHEN r.source_new IS NOT NULL THEN 'ok' ELSE t.status END AS status,
      |    CASE WHEN r.source_new IS NOT NULL THEN
      |      CASE WHEN r.source_new RLIKE 'fetch:\\\\{[^}]*\\\\}' THEN
      |        source_token_upsert(
      |          source_token_upsert(coalesce(t.source, ''), 'parse',
      |            regexp_extract(r.source_new, 'parse:\\\\{[^}]*\\\\}', 0)),
      |          'fetch', regexp_extract(r.source_new, 'fetch:\\\\{[^}]*\\\\}', 0))
      |      ELSE source_token_upsert(coalesce(t.source, ''), 'parse',
      |        regexp_extract(r.source_new, 'parse:\\\\{[^}]*\\\\}', 0)) END
      |    ELSE t.source END AS source,
      |    CASE WHEN r.company IS NOT NULL THEN r.company
      |         ELSE t.company_auto END AS company_auto
      |  FROM petl_tracker t
      |  LEFT JOIN results r
      |    ON t.sheet_name = r.sheet_name AND t.row_index = r.row_index
      |)
      |SELECT status, source, COUNT(*) AS n,
      |  COUNT(DISTINCT company_auto) AS n_companies
      |FROM written GROUP BY 1, 2
      |""".stripMargin)
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r4_llm_rescue"        -> r4LlmRescue _,
    "r2_fetch_cascade"     -> r2Cascade _,
    "r3_escalation"        -> r3Escalation _,
    "r5_notes_fallback"    -> r5NotesFallback _,
    "r6_template_notes"    -> r6TemplateNotes _,
    "notes_end_to_end"     -> notesEndToEnd _,
    "p8_needs_notes_snippet" -> p8NeedsNotesSnippet _,
    "pipeline_end_to_end"  -> pipelineEndToEnd _,
    "pipeline_end_to_end_sql" -> pipelineEndToEndViaSql _)

  def oracles: Map[String, String] = Map(
    "r4_llm_rescue"        -> r4Sql,
    "r2_fetch_cascade"     -> r2Sql,
    "r3_escalation"        -> r3Sql,
    "r5_notes_fallback"    -> r5Sql,
    "r6_template_notes"    -> r6Sql,
    "notes_end_to_end"     -> notesEndToEndSql,
    "p8_needs_notes_snippet" -> p8Sql,
    "pipeline_end_to_end"  -> pipelineEndToEndSql,
    // the SQL surface must land on the SAME oracle as the DataFrame path
    "pipeline_end_to_end_sql" -> pipelineEndToEndSql)
}
