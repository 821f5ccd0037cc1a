package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end signal-fusion tests mirroring the reference weight table
  * (`docs/ARCHITECTURE.md:100-121`, `code-LLM-intergration.js:692-777`). */
class ResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def decide(html: String, url: String) = {
    val df = Seq((html, url)).toDF("html", "final_url")
    Resolution.decideCompanyRole(df, col("html"), col("final_url"))
      .select("company", "role", "conf", "decision").collect()(0)
  }

  test("jsonld org+title → conf 1.0, trail jsonld-org+jsonld-title") {
    val html = """<script type="application/ld+json">
      {"@type":"JobPosting","title":"Staff Engineer","hiringOrganization":{"name":"Acme"}}
      </script>"""
    val r = decide(html, "https://acme.com/careers/1")
    assert(r.getString(0) == "Acme")
    assert(r.getString(1) == "Staff Engineer")
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
    assert(r.getString(3) == "jsonld-org+jsonld-title")
  }

  test("ats slug + h1 → 0.70, ats-slug+h1") {
    val html = "<h1>Senior Platform Engineer</h1>"
    val r = decide(html, "https://jobs.lever.co/acme/123")
    assert(r.getString(0) == "Acme")
    assert(r.getString(1) == "Senior Platform Engineer")
    assert(math.abs(r.getDouble(2) - 0.70) < 1e-9)
    assert(r.getString(3) == "ats-slug+h1")
  }

  test("og:site_name suppressed on aggregator host") {
    val html = """<meta property="og:site_name" content="LinkedIn">
      <h1>Data Engineer</h1>"""
    val agg = decide(html, "https://www.linkedin.com/jobs/view/1")
    assert(agg.getString(0) == "")
    assert(math.abs(agg.getDouble(2) - 0.35) < 1e-9) // h1 only, capped? no-company cap 0.5 → 0.35 stands
    assert(agg.getString(3) == "h1")
    val ok = decide(html.replace("LinkedIn", "Acme"), "https://acme.com/jobs/1")
    assert(ok.getString(0) == "Acme")
    assert(math.abs(ok.getDouble(2) - 0.60) < 1e-9) // h1 0.35 + og:site 0.25
    assert(ok.getString(3) == "h1+og:site_name")
  }

  test("title-split rescue: Company — Role, conf floor 0.55") {
    val html = "<title>Acme – Senior SWE</title>"
    val r = decide(html, "https://unknownhost.com/x")
    assert(r.getString(0) == "Acme")
    assert(r.getString(1) == "Senior SWE")
    assert(math.abs(r.getDouble(2) - 0.55) < 1e-9)
    assert(r.getString(3) == "title+title-split")
  }

  test("og:title fallback when no h1; missing-company cap at 0.5") {
    val html = """<meta property="og:title" content="Backend Engineer">"""
    val r = decide(html, "https://nowhere.example/x")
    assert(r.getString(0) == "")
    assert(r.getString(1) == "Backend Engineer")
    assert(math.abs(r.getDouble(2) - 0.25) < 1e-9)
    assert(r.getString(3) == "og:title")
  }

  test("empty page → heuristic, conf 0") {
    val r = decide("", "https://nowhere.example/x")
    assert(r.getString(0) == "")
    assert(r.getString(1) == "")
    assert(r.getDouble(2) == 0.0)
    assert(r.getString(3) == "heuristic")
  }

  test("role cleaned with company echo removed") {
    val html = """<script type="application/ld+json">
      {"@type":"JobPosting","title":"Acme: ML Engineer","hiringOrganization":{"name":"Acme"}}
      </script>"""
    val r = decide(html, "https://acme.com/1")
    assert(r.getString(1) == "ML Engineer")
  }

  test("conf always in [0,1]") {
    val htmls = Seq(
      "", "<h1>Engineer</h1>",
      """<script type="application/ld+json">{"@type":"JobPosting","title":"T","hiringOrganization":{"name":"C"}}</script><h1>H</h1>""")
    val df = htmls.zipWithIndex.map { case (h, i) => (h, s"https://jobs.lever.co/c$i/1") }
      .toDF("html", "final_url")
    val out = Resolution.decideCompanyRole(df, col("html"), col("final_url"))
    assert(out.filter(col("conf") < 0 || col("conf") > 1).count() == 0)
  }
}
