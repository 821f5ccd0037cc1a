package graft.functions

import graft.SparkSpec
import graft.ops.{Provenance, Resolution}
import org.apache.spark.sql.functions._

/** Golden tests for the scalar function library (SURVEY.md §5 item 2).
  * Expected values are hand-traced from the reference's actual regexes
  * (not its doc-comment examples, which in two cases disagree with the
  * code — see cleanRole notes below). */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def eval1(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).collect()(0).get(0)

  private def evalStr(input: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
    Seq(input).toDF("s").select(f(col("s")).as("r")).collect()(0).getString(0)

  test("host_from_url: lowercase, www-stripped, '' on junk") {
    assert(evalStr("https://WWW.LinkedIn.com/jobs/view/123", UrlFns.host_from_url) == "linkedin.com")
    assert(evalStr("https://jobs.lever.co/acme/x", UrlFns.host_from_url) == "jobs.lever.co")
    assert(evalStr("not a url", UrlFns.host_from_url) == "")
  }

  test("ats/aggregator host classifiers") {
    assert(eval1(UrlFns.is_ats_host(lit("jobs.lever.co"))) == true)
    assert(eval1(UrlFns.is_ats_host(lit("boards.greenhouse.io"))) == true)
    assert(eval1(UrlFns.is_ats_host(lit("recruiting2.ultipro.com"))) == true)
    assert(eval1(UrlFns.is_ats_host(lit("example.com"))) == false)
    assert(eval1(UrlFns.is_aggregator_host(lit("www.linkedin.com"))) == true)
    assert(eval1(UrlFns.is_aggregator_host(lit("builtin.nyc"))) == true)
    assert(eval1(UrlFns.is_aggregator_host(lit("jobs.lever.co"))) == false)
  }

  test("nice_case preserves intra-word case (unlike initcap)") {
    assert(evalStr("acme-corp", UrlFns.nice_case) == "Acme Corp")
    assert(evalStr("IBM-corp", UrlFns.nice_case) == "IBM Corp")
    assert(evalStr("a__b--c", UrlFns.nice_case) == "A B C")
  }

  test("guess_company_from_url: first-match-wins over 10 ATS patterns") {
    assert(evalStr("https://jobs.lever.co/acme/role-123", UrlFns.guess_company_from_url) == "Acme")
    assert(evalStr("https://boards.greenhouse.io/megacorp/jobs/12345", UrlFns.guess_company_from_url) == "Megacorp")
    assert(evalStr("https://job-boards.greenhouse.io/littleco/jobs/9", UrlFns.guess_company_from_url) == "Littleco")
    assert(evalStr("https://jobs.ashbyhq.com/Nifty/abc", UrlFns.guess_company_from_url) == "Nifty")
    assert(evalStr("https://acme.wd1.myworkdayjobs.com/en-US/acme_careers/job/x", UrlFns.guess_company_from_url) == "Acme Careers")
    assert(evalStr("https://example.com/jobs/1", UrlFns.guess_company_from_url) == "")
  }

  test("canonical_url strips the 14 tracking params, keeps the rest") {
    assert(evalStr("https://x.com/j?utm_source=a&id=7&gh_src=b", UrlFns.canonical_url) == "https://x.com/j?id=7")
    assert(evalStr("https://x.com/j?utm_source=a&utm_medium=b", UrlFns.canonical_url) == "https://x.com/j")
    assert(evalStr("https://x.com/j?id=7#frag", UrlFns.canonical_url) == "https://x.com/j?id=7#frag")
    assert(evalStr("https://x.com/j?gh_jid=1#frag", UrlFns.canonical_url) == "https://x.com/j#frag")
    assert(evalStr("https://x.com/j", UrlFns.canonical_url) == "https://x.com/j")
    // idempotence
    val once = evalStr("https://x.com/j?src=z&a=1&codes=qq", UrlFns.canonical_url)
    assert(evalStr(once, UrlFns.canonical_url) == once)
  }

  test("get_meta / get_title / get_h1") {
    val html = """<html><head><title> Senior
                 |  Engineer </title><meta property="og:title" content="OG Role">
                 |<meta name="description" content="desc here"></head>
                 |<body><h1><span>Big</span> Role</h1></body></html>""".stripMargin
    assert(evalStr(html, HtmlFns.get_title) == "Senior Engineer")
    assert(evalStr(html, c => HtmlFns.get_meta(c, "og:title", "property")) == "OG Role")
    assert(evalStr(html, c => HtmlFns.get_meta(c, "description", "name")) == "desc here")
    assert(evalStr(html, c => HtmlFns.get_meta(c, "missing", "name")) == "")
    assert(evalStr(html, HtmlFns.get_h1) == "Big Role")
  }

  test("decode_html decodes exactly the 5 common entities") {
    assert(evalStr("a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&apos;", HtmlFns.decode_html)
      == "a & b <c> \"d\" 'e'")
    assert(evalStr("&nbsp;", HtmlFns.decode_html) == "&nbsp;")
  }

  test("strip_emojis removes pictographs and variation selectors") {
    assert(evalStr("Engineer 🚀️!", HtmlFns.strip_emojis) == "Engineer !")
    assert(evalStr("❤ core ⭐", HtmlFns.strip_emojis) == " core ")
    assert(evalStr("日本語 intact", HtmlFns.strip_emojis) == "日本語 intact")
  }

  test("portable_hash60 equals the hex-prefix-of-md5 reference definition") {
    import org.apache.spark.sql.functions.{conv, md5, substring, lit}
    val samples = Seq("", "a", "hello world", "0|the quick brown",
      "日本語", "x" * 500)
    samples.foreach { s =>
      val viaExpr = eval1(graft.functions.TextFns.portable_hash60(lit(s)))
        .asInstanceOf[Long]
      val viaSql = eval1(
        conv(substring(md5(lit(s).cast("binary")), 1, 15), 16, 10).cast("long"))
        .asInstanceOf[Long]
      assert(viaExpr == viaSql, s"mismatch for '$s'")
      assert(viaExpr >= 0L)
    }
  }

  test("strip_emojis has exact Extended_Pictographic boundaries") {
    import graft.expressions.StripEmojis
    // non-pictographic symbols survive: circled digit, white star, arrows
    assert(evalStr("Data ②nd tier ☆ ←", HtmlFns.strip_emojis) == "Data ②nd tier ☆ ←")
    // boundary checks against the UCD table: 2605 in, 2606 out, 2607 in
    assert(StripEmojis.isPictographic(0x2605) && !StripEmojis.isPictographic(0x2606)
      && StripEmojis.isPictographic(0x2607))
    assert(StripEmojis.isPictographic(0x1FAFF) && !StripEmojis.isPictographic(0x1FB00))
    // astral pictographs removed, surrogate-safe
    assert(evalStr("a🧠b🪐c", HtmlFns.strip_emojis) == "abc")
    assert(StripEmojis.strip("🚀") == "")
  }

  test("nfc_normalize: composed and decomposed forms hash identically") {
    import graft.expressions.NormalizeText
    val composed = "café"              // é precomposed (U+00E9)
    val decomposed = "café"           // e + combining acute (U+0301)
    assert(composed != decomposed)          // different code points...
    assert(evalStr(decomposed, NormalizeText.nfc_normalize) == composed)
    assert(evalStr(composed, NormalizeText.nfc_normalize) == composed)
    // already-NFC fast path returns the input text unchanged
    assert(NormalizeText.nfc("plain ascii").eq("plain ascii"))
    // Hangul canonical composition (multi-char recomposition)
    assert(NormalizeText.nfc("가") == "가")
  }

  test("text_preview drops script/style, strips tags, truncates") {
    val html = "<html><script>var x=1;</script><style>.a{}</style><p>Hello   <b>world</b></p></html>"
    assert(evalStr(html, c => HtmlFns.text_preview(c, 1200)) == "Hello world")
    assert(evalStr(html, c => HtmlFns.text_preview(c, 3)) == "Hel")
  }

  test("is_generic_title blocklist + short titles") {
    assert(eval1(HtmlFns.is_generic_title(lit("Job Details"))) == true)
    assert(eval1(HtmlFns.is_generic_title(lit("  Sign In  "))) == true)
    assert(eval1(HtmlFns.is_generic_title(lit("ab"))) == true)
    assert(eval1(HtmlFns.is_generic_title(lit(""))) == true)
    assert(eval1(HtmlFns.is_generic_title(lit("Senior Data Engineer"))) == false)
  }

  test("has_useful_signal: json-ld OR non-generic h1/og/title") {
    assert(eval1(HtmlFns.has_useful_signal(lit("<script type=\"application/ld+json\">{}</script>"))) == true)
    assert(eval1(HtmlFns.has_useful_signal(lit("<h1>Senior Engineer</h1>"))) == true)
    assert(eval1(HtmlFns.has_useful_signal(lit("<title>Sign In</title>"))) == false)
    assert(eval1(HtmlFns.has_useful_signal(lit(""))) == false)
  }

  test("find_first_ats_link skips non-ATS hrefs") {
    val html = """<a href="https://www.linkedin.com/jobs/1">agg</a>
                 |<a href="https://jobs.lever.co/acme/1">ats</a>""".stripMargin
    assert(evalStr(html, UrlFns.find_first_ats_link) == "https://jobs.lever.co/acme/1")
    assert(evalStr("<a href='https://example.com/x'>n</a>", UrlFns.find_first_ats_link) == "")
  }

  test("clean_role: company echo, locations, req-ids (actual regex semantics)") {
    def cr(t: String, c: String): String =
      Seq((t, c)).toDF("t", "c").select(RoleFns.clean_role(col("t"), col("c")).as("r"))
        .collect()(0).getString(0)
    assert(cr("Acme: Senior Eng", "Acme") == "Senior Eng")
    assert(cr("Senior Eng - Acme", "Acme") == "Senior Eng")
    assert(cr("Senior SWE - Austin, TX", "") == "Senior SWE")
    // two-word cities do NOT match the reference's location regex
    assert(cr("Senior SWE - New York, NY", "") == "Senior SWE - New York, NY")
    assert(cr("Engineer Req# 12345", "") == "Engineer")
    // reference quirk reproduced exactly: the bare `R` alternative matches a
    // trailing 'r' before digits, so "Engineer 123456" loses its final 'r'
    assert(cr("Engineer 123456", "") == "Enginee")
    assert(cr("Engineer - 123456", "") == "Engineer")
    assert(cr("<b>Data&amp;ML Lead</b> 🚀", "") == "Data&ML Lead")
    // regex-quoted echo; both ends match so the whole string collapses —
    // same as the reference (prefix strip then suffix strip)
    assert(cr("C++ Dev - C++ Dev", "C++ Dev") == "")
    assert(cr("C++ Dev - Backend", "C++ Dev") == "Backend")
    assert(cr("", "X") == "")
  }

  test("jsonld jobposting: plain, @graph, array @type, malformed-first") {
    def jp(html: String): (String, String) = {
      val r = Seq(html).toDF("h")
        .select(JsonLdFns.parse_jsonld_jobposting(col("h")).as("j"))
        .select("j.company", "j.role").collect()(0)
      (r.getString(0), r.getString(1))
    }
    val plain = """<script type="application/ld+json">
      {"@type":"JobPosting","title":"SWE","hiringOrganization":{"name":"Acme"}}
      </script>"""
    assert(jp(plain) == ("Acme", "SWE"))
    val graph = """<script type="application/ld+json">
      {"@graph":[{"@type":"WebSite"},{"@type":["Thing","JobPosting"],"title":"PM","hiringOrganization":"Beta"}]}
      </script>"""
    assert(jp(graph) == ("Beta", "PM"))
    val malformedFirst = """<script type="application/ld+json">{broken</script>
      <script type="application/ld+json">{"@type":"jobPosting","title":"X"}</script>"""
    assert(jp(malformedFirst) == ("", "X"))
    assert(jp("<p>nothing</p>") == ("", ""))
  }

  test("provenance token render + upsert replace-in-place") {
    def up(prev: String, kind: String, tok: String): String =
      Seq((prev, tok)).toDF("p", "t")
        .select(Provenance.source_token_upsert(col("p"), kind, col("t")).as("r"))
        .collect()(0).getString(0)
    val tok1 = "parse:{provider=gh-api, signals=jsonld-org+h1, conf=0.90}"
    assert(up("", "parse", tok1) == tok1)
    val appended = up("fetch:{escalated=renderer}", "parse", tok1)
    assert(appended == s"fetch:{escalated=renderer} | $tok1")
    val tok2 = "parse:{provider=direct, signals=title, conf=0.15}"
    assert(up(appended, "parse", tok2) ==
      s"fetch:{escalated=renderer} | $tok2")
    // idempotence: same-kind upsert twice = once
    assert(up(up("", "notes", "notes:{mode=llm}"), "notes", "notes:{mode=llm}")
      == "notes:{mode=llm}")
  }

  test("render_token formats kind:{k=v, k2=v2}") {
    val r = Seq(("gh-api", "jsonld-org")).toDF("p", "s")
      .select(Provenance.render_token("parse",
        Seq("provider" -> col("p"), "signals" -> col("s"))).as("r"))
      .collect()(0).getString(0)
    assert(r == "parse:{provider=gh-api, signals=jsonld-org}")
  }

  test("zorder16: exact interleave on known values, tile locality") {
    import graft.functions.ZOrderFns
    val rows = Seq((3L, 1L), (0L, 5L), (0xFFFFL, 0xFFFFL), (21L, 0L))
      .toDF("x", "y")
      .select(ZOrderFns.zorder16(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    // spread(3)=0b101=5, spread(1)<<1=2 → 7; spread(5)=0b10001=17 → 34;
    // full 16+16 bits → 2^32-1; spread(21)=0b100010001=273
    assert(rows.toSeq == Seq(7L, 34L, 4294967295L, 273L))
    // tile locality: the key's high bits are the interleave of the
    // coordinates' high bits, so a 16×16 tile shares zkey >> 8
    val tile = (for (x <- 16 until 32; y <- 48 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .select((ZOrderFns.zorder16(col("x"), col("y"))
        .cast("long") / 256).cast("long").as("hi"))
      .distinct().collect()
    assert(tile.length == 1, s"16x16 tile spans ${tile.length} zkey>>8 prefixes")
  }
}
