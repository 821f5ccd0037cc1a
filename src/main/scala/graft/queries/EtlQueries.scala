package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{HtmlFns, JsonLdFns, RoleFns, UrlFns}
import graft.ops.{Provenance, Resolution}

/** Driver-contract demos of the reference's own operator families
  * (SURVEY.md §2.2 predicates, §2.7 scalar functions, §2.8 resolution,
  * §2.9 provenance), each named by its §2 operator ID.
  *
  * Pattern: synthesize the operator's input (URL / HTML / title strings)
  * deterministically from testdata columns, run the REAL operator, and
  * let the DuckDB oracle replicate the expected output in plain SQL —
  * possible because we control the synthesized input shape. Everything
  * except the JSON-LD recursion runs as pure codegen'd Catalyst
  * expressions, so these scale like any other projection.
  */
object EtlQueries extends QueryModule {

  /** F1: host extraction over synthesized URLs, grouped. */
  private def f1HostFromUrl(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.orders(s, dir))
      .withColumn("url",
        concat(lit("https://www.Board"), col("o_orderkey") % 20,
          lit(".Example.com/jobs/"), col("o_orderkey"), lit("?ref=x")))
      .withColumn("host", UrlFns.host_from_url(col("url")))
      .groupBy("host").agg(count(lit(1)).as("n"))

  private val f1Sql =
    """SELECT 'board' || (o_orderkey % 20) || '.example.com' AS host,
      |  COUNT(*) AS n
      |FROM orders GROUP BY 1""".stripMargin

  /** F8+F7: ATS slug → company, cycling 4 ATS URL shapes. */
  private def f8GuessCompany(s: SparkSession, dir: String): DataFrame = {
    val slug = regexp_replace(col("p_name"), " ", "-")
    Tables.spread(Tables.part(s, dir))
      .withColumn("url",
        when(col("p_partkey") % 4 === 0,
          concat(lit("https://jobs.lever.co/"), slug, lit("/job/1")))
        .when(col("p_partkey") % 4 === 1,
          concat(lit("https://boards.greenhouse.io/"), slug, lit("/jobs/123")))
        .when(col("p_partkey") % 4 === 2,
          concat(lit("https://jobs.ashbyhq.com/"), slug, lit("/x")))
        .otherwise(
          concat(lit("https://apply.workable.com/"), slug, lit("/j/abc"))))
      .withColumn("company", UrlFns.guess_company_from_url(col("url")))
      .groupBy("company").agg(count(lit(1)).as("n"))
  }

  // p_name is two lowercase words → expected Title Case via list transform.
  private val f8Sql =
    """SELECT array_to_string(
      |    list_transform(string_split(p_name, ' '),
      |                   x -> upper(substr(x,1,1)) || substr(x,2)), ' ') AS company,
      |  COUNT(*) AS n
      |FROM part GROUP BY 1""".stripMargin

  /** F12: canonical URL (custom Catalyst expression) over tracked URLs. */
  private def f12Canonical(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("url",
        concat(lit("https://jobs.example.com/post/"), col("o_orderkey"),
          lit("?utm_source=news&utm_campaign=x&id="), col("o_custkey"),
          lit("&gh_src=tok&page=2#apply")))
      .select(col("o_orderkey"),
        UrlFns.canonical_url(col("url")).as("canonical"))

  private val f12Sql =
    """SELECT o_orderkey,
      |  'https://jobs.example.com/post/' || o_orderkey ||
      |  '?id=' || o_custkey || '&page=2#apply' AS canonical
      |FROM orders""".stripMargin

  /** F2/F3/F4: meta/title/h1 extraction from synthesized pages. */
  private def f2SignalExtract(s: SparkSession, dir: String): DataFrame = {
    val html = concat(
      lit("<html><head><title>  "), col("p_name"), lit("\n jobs  </title>"),
      lit("<meta property=\"og:title\" content=\""), col("p_name"), lit(" lead\">"),
      lit("<meta property=\"og:site_name\" content=\""), col("p_brand"), lit("\">"),
      lit("</head><body><h1><span>"), col("p_name"), lit("</span> III</h1></body></html>"))
    Tables.part(s, dir)
      .withColumn("html", html)
      .select(col("p_partkey"),
        HtmlFns.get_title(col("html")).as("title"),
        HtmlFns.get_meta(col("html"), "og:title", "property").as("og_title"),
        HtmlFns.get_meta(col("html"), "og:site_name", "property").as("og_site"),
        HtmlFns.get_h1(col("html")).as("h1"))
  }

  private val f2Sql =
    """SELECT p_partkey,
      |  p_name || ' jobs' AS title,
      |  p_name || ' lead' AS og_title,
      |  p_brand AS og_site,
      |  p_name || ' III' AS h1
      |FROM part""".stripMargin

  /** F5/F6: JSON-LD JobPosting extraction (incl. @graph traversal). */
  private def f5JsonLd(s: SparkSession, dir: String): DataFrame = {
    val html = concat(
      lit("""<html><script type="application/ld+json">{"@context":"https://schema.org","@graph":[{"@type":"WebSite"},{"@type":"JobPosting","title":"Engineer """),
      col("c_custkey"),
      lit("""","hiringOrganization":{"name":""""),
      col("c_name"),
      lit(""""}}]}</script></html>"""))
    Tables.customer(s, dir)
      .withColumn("html", html)
      .withColumn("jp", JsonLdFns.parse_jsonld_jobposting(col("html")))
      .select(col("c_custkey"), col("jp.company").as("company"),
        col("jp.role").as("role"))
  }

  private val f5Sql =
    """SELECT c_custkey, c_name AS company,
      |  'Engineer ' || c_custkey AS role
      |FROM customer""".stripMargin

  /** F11 (+F10): role cleanup — entity decode, req-ID strip, company echo. */
  private def f11CleanRole(s: SparkSession, dir: String): DataFrame = {
    val raw1 = concat(col("p_name"), lit(" &amp; co Req# "), col("p_partkey"))
    val raw2 = concat(col("p_brand"), lit(": "), col("p_name"))
    Tables.part(s, dir)
      .select(col("p_partkey"),
        RoleFns.clean_role(raw1, lit("")).as("cleaned"),
        RoleFns.clean_role(raw2, col("p_brand")).as("no_echo"))
  }

  private val f11Sql =
    """SELECT p_partkey,
      |  p_name || ' & co' AS cleaned,
      |  p_name AS no_echo
      |FROM part""".stripMargin

  /** P1: URL validity gate over a mixed link column. */
  private def p1UrlFilter(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("link",
        when(col("event_id") % 3 === 0,
          concat(lit("https://ok.example/"), col("event_id")))
        .when(col("event_id") % 3 === 1,
          concat(lit("HTTP://CAPS.example/"), col("event_id")))
        .otherwise(concat(lit("javascript:alert("), col("event_id"), lit(")"))))
      .filter(col("link").rlike("(?i)^https?://"))
      .groupBy("event_type").agg(count(lit(1)).as("n"))

  private val p1Sql =
    """SELECT event_type, COUNT(*) AS n
      |FROM events WHERE event_id % 3 IN (0, 1)
      |GROUP BY event_type""".stripMargin

  /** P5: generic-title classification over synthesized titles. */
  private def p5GenericTitle(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("title",
        when(col("doc_id") % 4 === 0, lit("Job Details"))
        .when(col("doc_id") % 4 === 1, lit("  Sign In  "))
        .when(col("doc_id") % 4 === 2, concat(lit("Senior Engineer "), col("doc_id")))
        .otherwise(lit("ab")))
      .withColumn("is_generic", HtmlFns.is_generic_title(col("title")))
      .groupBy("is_generic").agg(count(lit(1)).as("n"))

  private val p5Sql =
    """SELECT (doc_id % 4 <> 2) AS is_generic, COUNT(*) AS n
      |FROM documents GROUP BY 1""".stripMargin

  /** F14/A4: first ATS href in page (extract-all → filter → first). */
  private def f14FirstAtsLink(s: SparkSession, dir: String): DataFrame = {
    val slug = regexp_replace(col("p_name"), " ", "-")
    val html = concat(
      lit("<a href=\"https://www.linkedin.com/jobs/view/1\">agg</a>"),
      lit("<a href=\"https://example.com/about\">x</a>"),
      lit("<a href=\"https://jobs.lever.co/"), slug, lit("/1\">ats</a>"))
    Tables.spread(Tables.part(s, dir))
      .withColumn("html", html)
      .withColumn("ats_link", UrlFns.find_first_ats_link(col("html")))
      .groupBy("ats_link").agg(count(lit(1)).as("n"))
  }

  private val f14Sql =
    """SELECT 'https://jobs.lever.co/' || replace(p_name, ' ', '-') || '/1' AS ats_link,
      |  COUNT(*) AS n
      |FROM part GROUP BY 1""".stripMargin

  /** R1 flagship: full multi-signal fusion over 5 synthesized page classes
    * (jsonld / ats+h1 / og-pair / title-split / empty), verifying company,
    * role, conf weights, and decision trail per class. */
  private def r1Decide(s: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    val html =
      when(k % 5 === 0, concat(
        lit("""<script type="application/ld+json">{"@type":"JobPosting","title":"Staff Engineer","hiringOrganization":{"name":"Acme """),
        k % 7, lit(""""}}</script>""")))
      .when(k % 5 === 1, lit("<h1>Platform Engineer</h1>"))
      .when(k % 5 === 2, lit(
        """<meta property="og:title" content="Backend Developer"><meta property="og:site_name" content="Gamma Corp">"""))
      .when(k % 5 === 3, lit("<title>Delta Co – Staff Eng</title>"))
      .otherwise(lit(""))
    val url =
      when(k % 5 === 1, concat(lit("https://jobs.lever.co/beta"), k % 7, lit("/x")))
      .otherwise(concat(lit("https://site"), k % 5, lit(".example.com/j/"), k))
    val base = Tables.spread(Tables.orders(s, dir))
      .withColumn("html", html).withColumn("final_url", url)
    Resolution.decideCompanyRole(base, col("html"), col("final_url"))
      .groupBy("decision", "conf")
      .agg(count(lit(1)).as("n"),
        min(col("company")).as("min_company"),
        min(col("role")).as("min_role"))
  }

  private val r1Sql =
    """SELECT
      |  CASE o_orderkey % 5
      |    WHEN 0 THEN 'jsonld-org+jsonld-title'
      |    WHEN 1 THEN 'ats-slug+h1'
      |    WHEN 2 THEN 'og:title+og:site_name'
      |    WHEN 3 THEN 'title+title-split'
      |    ELSE 'heuristic' END AS decision,
      |  CAST(CASE o_orderkey % 5
      |    WHEN 0 THEN 1.0 WHEN 1 THEN 0.7 WHEN 2 THEN 0.5
      |    WHEN 3 THEN 0.55 ELSE 0.0 END AS DOUBLE) AS conf,
      |  COUNT(*) AS n,
      |  MIN(CASE o_orderkey % 5
      |    WHEN 0 THEN 'Acme ' || (o_orderkey % 7)
      |    WHEN 1 THEN 'Beta' || (o_orderkey % 7)
      |    WHEN 2 THEN 'Gamma Corp'
      |    WHEN 3 THEN 'Delta Co' ELSE '' END) AS min_company,
      |  MIN(CASE o_orderkey % 5
      |    WHEN 0 THEN 'Staff Engineer'
      |    WHEN 1 THEN 'Platform Engineer'
      |    WHEN 2 THEN 'Backend Developer'
      |    WHEN 3 THEN 'Staff Eng' ELSE '' END) AS min_role
      |FROM orders GROUP BY 1, 2""".stripMargin

  /** V1/V2: provenance token upsert chain — append, then replace-in-place. */
  private def v1Provenance(s: SparkSession, dir: String): DataFrame = {
    val provider = when(col("o_orderkey") % 2 === 0, lit("gh-api"))
      .otherwise(lit("direct"))
    val t1 = Provenance.parse_token(provider, lit("h1"), lit(0.35))
    val s1 = Provenance.source_token_upsert(lit(""), "parse", t1)
    val s2 = Provenance.source_token_upsert(s1, "notes", lit("notes:{mode=template}"))
    val t2 = Provenance.parse_token(provider, lit("h1"), lit(0.9))
    val s3 = Provenance.source_token_upsert(s2, "parse", t2)
    Tables.orders(s, dir)
      .withColumn("source", s3)
      .groupBy("source").agg(count(lit(1)).as("n"))
  }

  private val v1Sql =
    """SELECT 'parse:{provider=' ||
      |  (CASE WHEN o_orderkey % 2 = 0 THEN 'gh-api' ELSE 'direct' END) ||
      |  ', signals=h1, conf=0.90} | notes:{mode=template}' AS source,
      |  COUNT(*) AS n
      |FROM orders GROUP BY 1""".stripMargin

  /** J1/T5: idempotent enqueue — composite-key anti-join of new work
    * against in-flight queue rows. */
  private def j1EnqueueAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val incoming = Tables.orders(s, dir)
      .select(col("o_orderpriority").as("sheet_name"),
        col("o_orderkey").as("row_index"), col("o_orderstatus"))
    val inFlight = incoming.filter(col("o_orderstatus") === "P")
      .select("sheet_name", "row_index")
    incoming.join(inFlight, Seq("sheet_name", "row_index"), "left_anti")
      .groupBy("sheet_name").agg(count(lit(1)).as("n_enqueued"))
  }

  private val j1Sql =
    """SELECT o_orderpriority AS sheet_name, COUNT(*) AS n_enqueued
      |FROM orders o
      |WHERE NOT EXISTS (SELECT 1 FROM orders q
      |  WHERE q.o_orderstatus = 'P'
      |    AND q.o_orderpriority = o.o_orderpriority
      |    AND q.o_orderkey = o.o_orderkey)
      |GROUP BY 1""".stripMargin

  /** J3/S9: keyed-update write-back — join parse results to the tracker and
    * overwrite derived columns, preserving untouched rows. */
  private def j3WriteBack(s: SparkSession, dir: String): DataFrame = {
    val tracker = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        lit("").as("company_auto"))
    val results = Tables.orders(s, dir)
      .filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey"),
        concat(lit("Parsed Co "), col("o_orderkey") % 11).as("company_new"))
    tracker.join(results, Seq("o_orderkey"), "left_outer")
      .select(col("o_orderkey"),
        coalesce(nullif(col("company_new"), lit("")), col("company_auto"))
          .as("company_auto"),
        when(col("company_new").isNotNull, lit("ok"))
          .otherwise(col("o_orderstatus")).as("status"))
  }

  private val j3Sql =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 3 = 0
      |       THEN 'Parsed Co ' || (o_orderkey % 11) ELSE '' END AS company_auto,
      |  CASE WHEN o_orderkey % 3 = 0 THEN 'ok' ELSE o_orderstatus END AS status
      |FROM orders""".stripMargin

  /** P2: header-row / whitelist filter — restrict to allow-listed
    * "sheets" and drop the header row index. */
  private def p2Whitelist(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
        col("o_orderkey") > 1)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))

  private val p2Sql =
    """SELECT o_orderpriority, COUNT(*) AS n FROM orders
      |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND o_orderkey > 1
      |GROUP BY 1""".stripMargin

  /** P6: useful-signal predicate over 4 synthesized page classes. */
  private def p6UsefulSignal(s: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    val html =
      when(k % 4 === 0, lit("""<script type="application/ld+json">{}</script>"""))
      .when(k % 4 === 1, lit("<h1>Senior Engineer</h1>"))
      .when(k % 4 === 2, lit("<title>Sign In</title>"))
      .otherwise(lit(""))
    Tables.spread(Tables.orders(s, dir))
      .withColumn("useful", HtmlFns.has_useful_signal(html))
      .groupBy("useful").agg(count(lit(1)).as("n"))
  }

  private val p6Sql =
    """SELECT (o_orderkey % 4 IN (0, 1)) AS useful, COUNT(*) AS n
      |FROM orders GROUP BY 1""".stripMargin

  /** A1 duplicate guard: COUNTIFS(company, role, canonical) > 1 as a
    * grouped count (the conditional-formatting rule as a query). */
  private def a1DuplicateGuard(s: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    Tables.orders(s, dir)
      .select(concat(lit("Co "), k % 50).as("company"),
        concat(lit("Role "), k % 20).as("role"),
        concat(lit("https://x.example/j/"), k % 400).as("canonical"))
      .groupBy("company", "role", "canonical")
      .agg(count(lit(1)).as("n_dupes"))
      .filter(col("n_dupes") > 1)

  }

  private val a1Sql =
    """SELECT 'Co ' || (o_orderkey % 50) AS company,
      |  'Role ' || (o_orderkey % 20) AS role,
      |  'https://x.example/j/' || (o_orderkey % 400) AS canonical,
      |  COUNT(*) AS n_dupes
      |FROM orders GROUP BY 1, 2, 3 HAVING COUNT(*) > 1""".stripMargin

  /** F13: visible-text preview with script/style removal + truncation. */
  private def f13TextPreview(s: SparkSession, dir: String): DataFrame = {
    val html = concat(
      lit("<html><script>var x=1;</script><style>.a{}</style><p>"),
      col("text"), lit("</p></html>"))
    Tables.documents(s, dir)
      .withColumn("html", html)
      .select(col("doc_id"),
        HtmlFns.text_preview(col("html"), 100).as("preview"))
  }

  // documents.text has no tags/entities and is whitespace-normalized, so
  // the preview is simply the first 100 chars of the trimmed text.
  private val f13Sql =
    """SELECT doc_id, substr(trim(text), 1, 100) AS preview
      |FROM documents""".stripMargin

  /** SQL surface: the registered function library driven through a SQL
    * text (same Catalyst trees as the column API — GraftRegistry). */
  private def sqlRegisteredFns(s: SparkSession, dir: String): DataFrame = {
    graft.GraftRegistry.registerFunctions(s)
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT o_orderkey,
        |  canonical_url('https://jobs.example.com/p/' || o_orderkey ||
        |                '?utm_source=x&id=' || o_custkey) AS canonical,
        |  host_from_url('https://www.Site' || o_orderkey % 9 || '.example.com/x')
        |    AS host,
        |  nice_case('brand-' || o_orderkey % 5) AS brand,
        |  token_count('alpha beta gamma') AS n_tok
        |FROM orders_v""".stripMargin)
  }

  private val sqlRegisteredFnsSql =
    """SELECT o_orderkey,
      |  'https://jobs.example.com/p/' || o_orderkey || '?id=' || o_custkey
      |    AS canonical,
      |  'site' || (o_orderkey % 9) || '.example.com' AS host,
      |  'Brand ' || (o_orderkey % 5) AS brand,
      |  3 AS n_tok
      |FROM orders""".stripMargin

  /** W3: latest-wins per key (structured provenance analog) over events. */
  private def w3LatestWins(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"))
  }

  private val w3Sql =
    """SELECT user_id, event_id, event_type FROM (
      |  SELECT user_id, event_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |                       ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t WHERE rn = 1""".stripMargin

  /** P7: FIFO batch take over a synthesized queue — first 100 queued rows
    * by (enqueued_at, sheet_name, row_index). Plans as
    * TakeOrderedAndProject (see [[graft.pipeline.Queues.takeBatch]]). */
  private def p7TakeBatch(s: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    val queue = Tables.orders(s, dir).select(
      col("o_orderpriority").as("sheet_name"),
      k.as("row_index"),
      when(k % 3 === 0, lit("queued")).when(k % 3 === 1, lit("processing"))
        .otherwise(lit("ok")).as("status"),
      timestamp_seconds(k % 100000).as("enqueued_at"))
    graft.pipeline.Queues.takeBatch(queue, 100)
  }

  private val p7Sql =
    """SELECT o_orderpriority AS sheet_name, o_orderkey AS row_index,
      |  'queued' AS status,
      |  make_timestamp((o_orderkey % 100000) * 1000000) AS enqueued_at
      |FROM orders WHERE o_orderkey % 3 = 0
      |ORDER BY enqueued_at, sheet_name, row_index LIMIT 100""".stripMargin

  /** S10: queue cleanup — drop rows whose key appears in the processed
    * set, as an anti-join (order-free, unlike the reference's bottom-up
    * index deletes). */
  private def s10RemoveProcessed(s: SparkSession, dir: String): DataFrame = {
    val queue = Tables.orders(s, dir).select(
      col("o_orderpriority").as("sheet_name"),
      col("o_orderkey").as("row_index"), col("o_orderstatus"))
    val processed = queue.filter(col("o_orderstatus") === "F")
      .select("sheet_name", "row_index")
    graft.pipeline.Queues.removeProcessed(queue, processed)
      .groupBy("sheet_name").agg(count(lit(1)).as("n_remaining"))
  }

  private val s10Sql =
    """SELECT o_orderpriority AS sheet_name, COUNT(*) AS n_remaining
      |FROM orders o
      |WHERE NOT EXISTS (SELECT 1 FROM orders p
      |  WHERE p.o_orderstatus = 'F'
      |    AND p.o_orderpriority = o.o_orderpriority
      |    AND p.o_orderkey = o.o_orderkey)
      |GROUP BY 1""".stripMargin

  /** V3: per-row error capture — failing rows get status `error` and the
    * message truncated to 300 chars (reference
    * `code-LLM-intergration.js:915-917`); the long body exercises the
    * truncation boundary. */
  private def v3ErrorCapture(s: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    val fails = k % 7 === 0
    val err = concat(lit("Error: fetch failed: "),
      repeat(concat(lit("backend unavailable ("), col("o_orderpriority"),
        lit("); ")), 12))
    Tables.orders(s, dir).select(
      k.as("o_orderkey"),
      when(fails, lit("error")).otherwise(lit("ok")).as("status"),
      when(fails, Provenance.error_message(err, 300))
        .otherwise(lit("")).as("last_error"))
  }

  private val v3Sql =
    """SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 7 = 0 THEN 'error' ELSE 'ok' END AS status,
      |  CASE WHEN o_orderkey % 7 = 0
      |       THEN substring('Error: fetch failed: ' ||
      |              repeat('backend unavailable (' || o_orderpriority || '); ', 12),
      |            1, 300)
      |       ELSE '' END AS last_error
      |FROM orders""".stripMargin

  /** S8: paid-scraper provider selection — first-configured-wins with
    * throw-on-≥400 (no fall-through), per the reference's
    * `fetchRendered_`. Three per-row config tiers exercise every branch:
    * both keys set, scrape.do only, none (direct). */
  private def s8ProviderCascade(s: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    import graft.pipeline.FetchCascade
    FetchCascade.paidProviderFetch(
      Tables.orders(s, dir),
      beeConfigured = k % 3 === 0,
      doConfigured = k % 3 === 1,
      beeStatus = when(k % 5 === 0, lit(500)).otherwise(lit(200)),
      doStatus = when(k % 4 === 0, lit(429)).otherwise(lit(200)),
      directStatus = when(k % 2 === 0, lit(200)).otherwise(lit(404)),
      errorBody = repeat(concat(lit("upstream said no ("),
        col("o_orderpriority"), lit("); ")), 15))
      .select("o_orderkey", "provider", "fetch_status", "status", "last_error")
  }

  private val s8Sql =
    """WITH cfg AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 3 = 0 THEN 'scrapingbee'
      |         WHEN o_orderkey % 3 = 1 THEN 'scrape.do'
      |         ELSE 'direct' END AS provider,
      |    CASE WHEN o_orderkey % 3 = 0 THEN
      |           CASE WHEN o_orderkey % 5 = 0 THEN 500 ELSE 200 END
      |         WHEN o_orderkey % 3 = 1 THEN
      |           CASE WHEN o_orderkey % 4 = 0 THEN 429 ELSE 200 END
      |         ELSE CASE WHEN o_orderkey % 2 = 0 THEN 200 ELSE 404 END
      |    END AS fetch_status,
      |    repeat('upstream said no (' || o_orderpriority || '); ', 15) AS body
      |  FROM orders)
      |SELECT o_orderkey, provider, fetch_status,
      |  CASE WHEN provider = 'direct' OR fetch_status < 400
      |       THEN 'ok' ELSE 'error' END AS status,
      |  CASE WHEN provider = 'direct' OR fetch_status < 400 THEN ''
      |       WHEN provider = 'scrapingbee'
      |       THEN substring('Bee ' || fetch_status || ': ' ||
      |              substring(body, 1, 300), 1, 200)
      |       ELSE substring('Scrape.do ' || fetch_status || ': ' ||
      |              substring(body, 1, 300), 1, 200)
      |  END AS last_error
      |FROM cfg""".stripMargin

  /** F9: Extended_Pictographic strip via the custom codegen'd expression —
    * true pictographs and U+FE0F go, while non-pictographic symbols
    * (②, ☆) and CJK stay, exactly like the reference's
    * `\p{Extended_Pictographic}` path. Oracle renders the same UCD range
    * table as an RE2 class. */
  private def f9StripEmojis(s: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    val title =
      when(k % 5 === 0, lit("🚀 Launch Engineer ✨"))
      .when(k % 5 === 1, lit("Data ②nd tier ☆"))
      .when(k % 5 === 2, lit("Backend ❤️ dev"))
      .when(k % 5 === 3, lit("日本語 エンジニア"))
      .otherwise(lit("Plain role"))
    Tables.orders(s, dir).select(k.as("o_orderkey"),
      HtmlFns.strip_emojis(title).as("cleaned"))
  }

  private val f9Sql = {
    val cls = graft.expressions.StripEmojis.duckdbClass
    s"""SELECT o_orderkey,
       |  regexp_replace(
       |    CASE WHEN o_orderkey % 5 = 0 THEN '🚀 Launch Engineer ✨'
       |         WHEN o_orderkey % 5 = 1 THEN 'Data ②nd tier ☆'
       |         WHEN o_orderkey % 5 = 2 THEN 'Backend ❤️ dev'
       |         WHEN o_orderkey % 5 = 3 THEN '日本語 エンジニア'
       |         ELSE 'Plain role' END,
       |    '$cls', '', 'g') AS cleaned
       |FROM orders""".stripMargin
  }

  /** Fuzzy company-name reconciliation (the entity-resolution step the
    * reference does by exact company echo): two 500-name registries —
    * one canonical, one with deterministic single-character typos —
    * matched by 4-gram blocking + bounded edit distance. Blocking is
    * pigeonhole-lossless for 1 substitution over the 10-char names
    * (a substitution kills at most 4 of the 7 grams), so candidates are
    * an equi-join on grams, never a cross join; `levenshtein` verifies
    * exactly and both engines implement the same edit distance. */
  private def joinFuzzyNames(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .select((col("o_orderkey") % 500).as("id")).distinct()
      .withColumn("name", substring(md5(col("id").cast("string")), 1, 10))
    val typo = base.withColumn("name",
      when(col("id") % 2 === 0,
        concat(substring(col("name"), 1, 2), lit("z"),
          substring(col("name"), 4, 7)))
        .otherwise(col("name")))
    def grams(df: DataFrame, side: String): DataFrame =
      df.select(col("id").as(s"${side}_id"), col("name").as(s"${side}_name"),
        explode(expr("transform(sequence(1, 7), g -> substring(name, g, 4))"))
          .as("gram"))
    val cand = grams(base, "l").join(grams(typo, "r"), Seq("gram"))
      .select("l_id", "l_name", "r_id", "r_name").distinct()
    cand
      .withColumn("dist", levenshtein(col("l_name"), col("r_name")))
      .filter(col("dist") <= 1)
      .groupBy("l_id", "l_name")
      .agg(count(lit(1)).as("n_matches"), min("r_id").as("best_r_id"),
        min("dist").as("best_dist"))
  }

  private val joinFuzzyNamesSql =
    """WITH ids AS (
      |  SELECT DISTINCT o_orderkey % 500 AS id FROM orders),
      |base AS (
      |  SELECT id, md5(id::VARCHAR)[1:10] AS name FROM ids),
      |typo AS (
      |  SELECT id, CASE WHEN id % 2 = 0
      |    THEN name[1:2] || 'z' || name[4:10] ELSE name END AS name
      |  FROM base),
      |lg AS (
      |  SELECT id AS l_id, name AS l_name, unnest(
      |    [name[g:g+3] for g in generate_series(1, 7)]) AS gram FROM base),
      |rg AS (
      |  SELECT id AS r_id, name AS r_name, unnest(
      |    [name[g:g+3] for g in generate_series(1, 7)]) AS gram FROM typo),
      |cand AS (
      |  SELECT DISTINCT l_id, l_name, r_id, r_name
      |  FROM lg JOIN rg USING (gram)),
      |scored AS (
      |  SELECT l_id, l_name, levenshtein(l_name, r_name) AS dist, r_id
      |  FROM cand)
      |SELECT l_id, l_name, COUNT(*) AS n_matches,
      |  MIN(r_id) AS best_r_id, CAST(MIN(dist) AS INT) AS best_dist
      |FROM scored WHERE dist <= 1 GROUP BY 1, 2""".stripMargin

  /** V4 (beyond the reference's V1-V3 audit ops): the data-quality
    * constraint report an ETL engine runs before promoting a load —
    * null/blank counts, duplicate candidate keys, referential orphans,
    * range constraints — all as in-band (check, n_violations) rows from
    * [[graft.ops.Quality]]. Violations are PLANTED with modular
    * arithmetic so the oracle recomputes every count in closed form
    * (the synthetic tables themselves are clean — a report of zeros
    * would gate nothing). */
  private def v4QualityReport(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Quality
    val k = col("o_orderkey")
    val dirty = Tables.spread(Tables.orders(s, dir)).select(
      when(k % 13 === 0, lit(null).cast("long")).otherwise(k).as("okey"),
      when(k % 7 === 0, lit("")).otherwise(concat(lit("c"), k % 50)).as("cat"),
      (k % 1000).as("ref"),
      when(k % 11 === 0, lit(-1.0)).otherwise(lit(5.0)).as("amount"))
    val parent = Tables.orders(s, dir).select((k % 500).as("pkey"))
    Quality.report(Seq(
      Quality.nullReport(dirty, Seq("okey", "cat")),
      Quality.duplicateKeys(dirty, Seq(col("ref")), "ref_mod1000"),
      Quality.referentialOrphans(dirty, col("ref"), parent, col("pkey"),
        "ref_to_parent"),
      Quality.constraintViolations(dirty, col("amount") >= 0, "amount_nonneg")))
  }

  private val v4Sql =
    """SELECT * FROM (
      |  SELECT 'null_or_blank:okey' AS "check",
      |    COUNT(CASE WHEN o_orderkey % 13 = 0 THEN 1 END) AS n_violations
      |  FROM orders
      |  UNION ALL SELECT 'null_or_blank:cat',
      |    COUNT(CASE WHEN o_orderkey % 7 = 0 THEN 1 END) FROM orders
      |  UNION ALL SELECT 'duplicate_key:ref_mod1000',
      |    COUNT(*) - COUNT(DISTINCT o_orderkey % 1000) FROM orders
      |  UNION ALL SELECT 'orphans:ref_to_parent',
      |    COUNT(CASE WHEN o_orderkey % 1000 >= 500 THEN 1 END) FROM orders
      |  UNION ALL SELECT 'constraint:amount_nonneg',
      |    COUNT(CASE WHEN o_orderkey % 11 = 0 THEN 1 END) FROM orders)
      |ORDER BY "check"""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v4_quality_report"  -> v4QualityReport _,
    "join_fuzzy_names"   -> joinFuzzyNames _,
    "f9_strip_emojis"    -> f9StripEmojis _,
    "p7_take_batch"      -> p7TakeBatch _,
    "s10_remove_processed" -> s10RemoveProcessed _,
    "v3_error_capture"   -> v3ErrorCapture _,
    "s8_provider_cascade" -> s8ProviderCascade _,
    "f1_host_from_url"   -> f1HostFromUrl _,
    "f8_guess_company"   -> f8GuessCompany _,
    "f12_canonical_url"  -> f12Canonical _,
    "f2_signal_extract"  -> f2SignalExtract _,
    "f5_jsonld_extract"  -> f5JsonLd _,
    "f11_clean_role"     -> f11CleanRole _,
    "f14_first_ats_link" -> f14FirstAtsLink _,
    "p1_url_filter"      -> p1UrlFilter _,
    "p2_whitelist_filter" -> p2Whitelist _,
    "p5_generic_title"   -> p5GenericTitle _,
    "p6_useful_signal"   -> p6UsefulSignal _,
    "a1_duplicate_guard" -> a1DuplicateGuard _,
    "f13_text_preview"   -> f13TextPreview _,
    "r1_decide_company_role" -> r1Decide _,
    "v1_provenance_upsert"   -> v1Provenance _,
    "j1_enqueue_anti_join"   -> j1EnqueueAntiJoin _,
    "sql_registered_fns"     -> sqlRegisteredFns _,
    "j3_write_back"          -> j3WriteBack _,
    "w3_latest_wins"         -> w3LatestWins _)

  def oracles: Map[String, String] = Map(
    "v4_quality_report"  -> v4Sql,
    "join_fuzzy_names"   -> joinFuzzyNamesSql,
    "f9_strip_emojis"    -> f9Sql,
    "p7_take_batch"      -> p7Sql,
    "s10_remove_processed" -> s10Sql,
    "v3_error_capture"   -> v3Sql,
    "s8_provider_cascade" -> s8Sql,
    "f1_host_from_url"   -> f1Sql,
    "f8_guess_company"   -> f8Sql,
    "f12_canonical_url"  -> f12Sql,
    "f2_signal_extract"  -> f2Sql,
    "f5_jsonld_extract"  -> f5Sql,
    "f11_clean_role"     -> f11Sql,
    "f14_first_ats_link" -> f14Sql,
    "p1_url_filter"      -> p1Sql,
    "p2_whitelist_filter" -> p2Sql,
    "p5_generic_title"   -> p5Sql,
    "p6_useful_signal"   -> p6Sql,
    "a1_duplicate_guard" -> a1Sql,
    "f13_text_preview"   -> f13Sql,
    "r1_decide_company_role" -> r1Sql,
    "v1_provenance_upsert"   -> v1Sql,
    "j1_enqueue_anti_join"   -> j1Sql,
    "sql_registered_fns"     -> sqlRegisteredFnsSql,
    "j3_write_back"          -> j3Sql,
    "w3_latest_wins"         -> w3Sql)
}
