package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

import java.util.regex.Pattern
import scala.jdk.CollectionConverters._

/** JSON-LD JobPosting extraction (SURVEY.md §2.7 F5/F6).
  *
  * Semantics from `parseJsonLdJobPosting_` / `findJobPosting_`
  * (`apps-scripts/code-LLM-intergration.js:509-539`): scan every
  * `<script type="application/ld+json">` block, parse, and recursively
  * search for a node whose `@type` contains "jobposting" (case-insensitive,
  * arrays joined), descending into `@graph`, arrays, and nested objects;
  * first hit wins. Returns `{company, role}` from
  * `hiringOrganization.name` (or a string `hiringOrganization`) and `title`.
  *
  * Unbounded recursion over unknown JSON shapes is not expressible in pure
  * Catalyst (SURVEY.md §7.3), so this is the engine's one deliberate Scala
  * UDF over Jackson. It stays cheap at scale: the UDF runs once per row and
  * its inputs/outputs are plain strings (no Python/serialization boundary).
  */
object JsonLdFns extends Serializable {

  case class JobPostingSignal(company: String, role: String)

  private val scriptRe = Pattern.compile(
    "<script[^>]+type=[\"']application/ld\\+json[\"'][^>]*>([\\s\\S]*?)</script>",
    Pattern.CASE_INSENSITIVE)

  @transient private lazy val mapper = new ObjectMapper()

  /** F6 `findJobPosting_`: recursive descent for `@type` ∋ "jobposting". */
  private def findJobPosting(node: JsonNode): Option[JsonNode] = {
    if (node == null || node.isNull) return None
    if (node.isArray) {
      node.elements().asScala.foreach { n =>
        val r = findJobPosting(n)
        if (r.isDefined) return r
      }
      return None
    }
    if (node.isObject) {
      val t = node.get("@type")
      val tstr =
        if (t == null) ""
        else if (t.isArray) t.elements().asScala.map(_.asText("")).mkString(",").toLowerCase
        else t.asText("").toLowerCase
      if (tstr.contains("jobposting")) return Some(node)
      val graph = node.get("@graph")
      if (graph != null) {
        val r = findJobPosting(graph)
        if (r.isDefined) return r
      }
      node.properties().asScala.foreach { e =>
        if (e.getValue.isContainerNode) {
          val r = findJobPosting(e.getValue)
          if (r.isDefined) return r
        }
      }
    }
    None
  }

  /** F5 `parseJsonLdJobPosting_`: first parsable block wins; malformed
    * blocks are skipped (reference swallows JSON.parse errors). */
  def extract(html: String): JobPostingSignal = {
    if (html == null) return JobPostingSignal("", "")
    val m = scriptRe.matcher(html)
    while (m.find()) {
      val raw = m.group(1).trim
      try {
        val json = mapper.readTree(raw)
        findJobPosting(json) match {
          case Some(jp) =>
            val orgNode = jp.get("hiringOrganization")
            val org =
              if (orgNode == null) ""
              else if (orgNode.isObject) {
                val n = orgNode.get("name")
                if (n == null) "" else n.asText("")
              } else orgNode.asText("")
            val title = { val t = jp.get("title"); if (t == null) "" else t.asText("") }
            return JobPostingSignal(org, title)
          case None => ()
        }
      } catch { case _: Exception => () }
    }
    JobPostingSignal("", "")
  }

  private val extractUdf = udf((html: String) => extract(html))

  /** Column API: struct(company, role); both '' when absent. A cheap
    * codegen'd contains-check gates the UDF so Jackson never runs for
    * pages without an ld+json script tag (the common case). */
  def parse_jsonld_jobposting(html: Column): Column = {
    import org.apache.spark.sql.functions._
    val empty = struct(lit("").as("company"), lit("").as("role"))
    when(lower(coalesce(html, lit(""))).contains("ld+json"), extractUdf(html))
      .otherwise(empty)
  }
}
