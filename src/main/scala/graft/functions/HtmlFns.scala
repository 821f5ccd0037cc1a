package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML signal-extraction column functions (SURVEY.md §2.7 F2-F4, F9, F10,
  * F13; §2.2 P5/P6).
  *
  * Semantics from the reference's extractor helpers
  * (`apps-scripts/code-LLM-intergration.js:301-332,485-502,569-584,968-975`),
  * re-expressed as pure Catalyst regex expressions — codegen'd, no UDFs.
  */
object HtmlFns {

  private def rquote(s: String): String = java.util.regex.Pattern.quote(s)

  /** F2 `getMeta_`: `<meta attr="key" content="…">` value, trimmed; ''
    * when absent (`code-LLM-intergration.js:485-489`). `key`/`attr` are
    * compile-time constants at every call site, so the pattern is static. */
  def get_meta(html: Column, key: String, attr: String): Column =
    trim(regexp_extract(html,
      s"""(?i)<meta[^>]+$attr=["']${rquote(key)}["'][^>]*content=["']([^"']+)["']""", 1))

  /** F3 `getTitle_`: `<title>` text, whitespace collapsed to single spaces
    * (`code-LLM-intergration.js:492-495`). */
  def get_title(html: Column): Column =
    trim(regexp_replace(
      regexp_extract(html, "(?i)<title[^>]*>([\\s\\S]*?)</title>", 1),
      "\\s+", " "))

  /** F4 `getH1_`: first `<h1>` inner text, tags stripped, whitespace
    * collapsed (`code-LLM-intergration.js:498-502`). */
  def get_h1(html: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_extract(html, "(?i)<h1[^>]*>([\\s\\S]*?)</h1>", 1),
        "<[^>]+>", " "),
      "\\s+", " "))

  /** F9 `stripEmojis_`: drop emoji/pictographs + variation selectors
    * (`code-LLM-intergration.js:569-577`) with exact
    * `Extended_Pictographic` parity via the custom codegen'd expression
    * [[graft.expressions.StripEmojis]] (Java 17 regex lacks the
    * property; the reference's primary `\p{Extended_Pictographic}` path
    * is the semantic, not its range fallback). */
  def strip_emojis(s: Column): Column =
    graft.expressions.StripEmojis.strip_emojis(s)

  /** F10 `decodeHtml_`: decode exactly the 5 common entities — NOT a full
    * entity decoder, by design (`code-LLM-intergration.js:580-584`). */
  def decode_html(s: Column): Column = {
    val steps: Seq[(String, String)] = Seq(
      "(?i)&amp;" -> "&", "(?i)&lt;" -> "<", "(?i)&gt;" -> ">",
      "(?i)&quot;" -> "\"", "(?i)&#39;|&apos;" -> "'")
    steps.foldLeft(s) { case (c, (pat, rep)) => regexp_replace(c, pat, rep) }
  }

  /** F13 `textPreview_`: visible-text preview — drop script/style blocks,
    * strip tags, collapse whitespace, truncate to `limit` chars
    * (`code-LLM-intergration.js:968-975`). */
  def text_preview(html: Column, limit: Int = 1200): Column =
    substring(
      trim(regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(html, "(?i)<script[\\s\\S]*?</script>", " "),
            "(?i)<style[\\s\\S]*?</style>", " "),
          "<[^>]+>", " "),
        "\\s+", " ")),
      1, limit)

  /** P5 `isGenericTitle_`: boilerplate-title predicate — blocklist of 16
    * phrases (contains-match on lowercase), or length ≤ 2, or empty
    * (`code-LLM-intergration.js:301-313`).
    *
    * Compiled as ONE regex (`^.{0,2}$` for the short/empty arm, plus the
    * quoted phrase alternation) so the input expression is embedded — and
    * therefore evaluated — exactly once. A `Column` is an expression
    * *tree*, not a value: the earlier per-phrase `contains` chain embedded
    * a copy of the caller's whole extraction tree into every one of the
    * 17 branches, and because boolean short-circuits block codegen
    * subexpression elimination, each row re-ran the title/h1/meta regexes
    * up to 17× (measured 9× end-to-end on the parse pipeline). */
  def is_generic_title(s: Column): Column = {
    val t = trim(lower(coalesce(s, lit(""))))
    val blocklist = Seq(
      "job details", "job detail", "careers", "career portal",
      "choose your sign in option", "sign in", "signin", "login", "log in",
      "home", "open positions", "all jobs", "search results", "job search",
      "apply now", "opportunities", "join our team")
    // \z, not $: Java's $ matches before a final line terminator, which
    // would misclassify 3-char titles ending in a newline as "short"
    val generic = "(?s)^.{0,2}\\z|" +
      blocklist.map(java.util.regex.Pattern.quote).mkString("|")
    t.rlike(generic)
  }

  /** P6 `hasUsefulSignal_`: page likely parseable — JSON-LD script present,
    * or any of {h1, og:title, title} non-generic
    * (`code-LLM-intergration.js:321-332`). A signal is "good" iff it is
    * not generic — [[is_generic_title]] is true for empty strings, so the
    * non-empty check is implied and each signal tree is embedded once. */
  def has_useful_signal(html: Column): Column = {
    val h = coalesce(html, lit(""))
    val hasJson = h.rlike("(?i)<script[^>]+application/ld\\+json")
    def good(c: Column): Column = !is_generic_title(c)
    (h =!= "") && (hasJson || good(get_h1(h)) || good(get_meta(h, "og:title", "property")) ||
      good(get_title(h)))
  }
}
