package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.UrlFns
import graft.expressions.CanonicalUrlExpr

/** SQL registration + optimizer-rule showcase tests (SURVEY.md §7.0/§4). */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions evaluate like the column API") {
    GraftRegistry.registerFunctions(spark)
    val r = spark.sql(
      """SELECT canonical_url('https://x.com/j?utm_source=a&id=1') AS c,
        |  host_from_url('https://WWW.Example.com/x') AS h,
        |  nice_case('acme-corp') AS n,
        |  clean_role('Acme: SWE', 'Acme') AS cr,
        |  token_count('a b c') AS t,
        |  language_id('the cat and the dog is here') AS l""".stripMargin)
      .collect()(0)
    assert(r.getString(0) == "https://x.com/j?id=1")
    assert(r.getString(1) == "example.com")
    assert(r.getString(2) == "Acme Corp")
    assert(r.getString(3) == "SWE")
    assert(r.getInt(4) == 3)
    assert(r.getString(5) == "en")
  }

  test("SQL jsonld struct extraction") {
    GraftRegistry.registerFunctions(spark)
    val r = spark.sql(
      """SELECT parse_jsonld_jobposting(
        |  '<script type="application/ld+json">{"@type":"JobPosting","title":"T","hiringOrganization":{"name":"C"}}</script>'
        |).company AS c""".stripMargin).collect()(0)
    assert(r.getString(0) == "C")
  }

  test("idempotence rule collapses nested canonical_url") {
    // the production path installs the rule via `new GraftExtensions` /
    // spark.sql.extensions at session build; on the shared test session
    // the same rule goes through experimental.extraOptimizations
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations =
      prev :+ GraftRegistry.CanonicalUrlIdempotence
    try {
      // parquet-backed input: a local relation would be const-folded away
      // by ConvertToLocalRelation before the expressions can be inspected
      val df = Tables.orders(spark, sf)
        .select(concat(lit("https://x.example/j/"), col("o_orderkey"),
          lit("?utm_source=a&id=1")).as("url"))
        .select(UrlFns.canonical_url(UrlFns.canonical_url(col("url"))).as("c"))
      val optimized = df.queryExecution.optimizedPlan
      val remaining = optimized.expressions.flatMap(_.collect {
        case e: CanonicalUrlExpr => e
      })
      assert(remaining.size == 1, s"expected 1 CanonicalUrlExpr, got $remaining")
      assert(df.orderBy("c").collect()(0).getString(0)
        .endsWith("?id=1"))
    } finally spark.experimental.extraOptimizations = prev
  }
}
