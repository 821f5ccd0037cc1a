package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Dsl._

/** Built-in function parity demos (SURVEY.md §2.7 note: "date/math
  * functions beyond F17 — engine parity demos use built-ins"), plus the
  * typed Dataset surface. All exact-arithmetic oracles. */
object FunctionQueries extends QueryModule {

  /** Top-level for Encoder derivation (local classes have no TypeTag). */
  case class Cust(c_custkey: Long, c_acctbal: Double, c_mktsegment: String)

  /** Date functions: extraction, truncation, arithmetic, formatting. */
  private def dateFns(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofweek(col("o_orderdate")).as("dow"),
        date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"))

  private val dateFnsSql =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(quarter(o_orderdate) AS INT) AS q,
      |  CAST(month(o_orderdate) AS INT) AS m,
      |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
      |  CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_date,
      |  strftime(o_orderdate, '%Y-%m') AS ym
      |FROM orders""".stripMargin

  /** Math functions: rounding, abs, sign, exact integer arithmetic. */
  private def mathFns(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        // round on decimal, not double: double rounding differs across
        // engines (shortest-repr vs binary scaling) at .x5 boundaries
        round(col("l_extendedprice").cast("decimal(18,2)"), 1).as("rounded"),
        floor(col("l_quantity")).as("flr"),
        ceil(col("l_quantity")).as("cl"),
        abs(col("l_quantity") - 25).as("dist25"),
        pmod(col("l_orderkey"), lit(97)).as("bucket"),
        (col("l_orderkey") * 31 + col("l_linenumber")).as("synth_key"))

  private val mathFnsSql =
    """SELECT l_orderkey, l_linenumber,
      |  round(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS rounded,
      |  CAST(floor(l_quantity) AS BIGINT) AS flr,
      |  CAST(ceil(l_quantity) AS BIGINT) AS cl,
      |  abs(l_quantity - 25) AS dist25,
      |  l_orderkey % 97 AS bucket,
      |  l_orderkey * 31 + l_linenumber AS synth_key
      |FROM lineitem""".stripMargin

  /** String functions: pad/case/trim/split/substring/translate. */
  private def stringFns(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        lower(col("c_name")).as("lower_name"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
        substring(col("c_name"), 1, 8).as("prefix"),
        element_at(split(col("c_name"), "#"), 2).as("num_part"),
        translate(col("c_mktsegment"), "AEIOU", "aeiou").as("translated"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"),
        length(col("c_name")).as("name_len"))

  private val stringFnsSql =
    """SELECT c_custkey,
      |  lower(c_name) AS lower_name,
      |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
      |  substr(c_name, 1, 8) AS prefix,
      |  string_split(c_name, '#')[2] AS num_part,
      |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
      |  c_mktsegment || '|' || c_name AS joined,
      |  CAST(length(c_name) AS INT) AS name_len
      |FROM customer""".stripMargin

  /** Typed Dataset surface: case-class Encoder, typed filter + map, back
    * to DataFrame for the sink. */
  private def typedDataset(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .select("c_custkey", "c_acctbal", "c_mktsegment").as[Cust]
      .filter(_.c_acctbal > 1000.0)
      .map(c => (c.c_custkey, c.c_mktsegment, c.c_acctbal >= 5000.0))
      .toDF("c_custkey", "segment", "high_value")
  }

  private val typedDatasetSql =
    """SELECT c_custkey, c_mktsegment AS segment,
      |  (c_acctbal >= 5000.0) AS high_value
      |FROM customer WHERE c_acctbal > 1000.0""".stripMargin

  /** Exact interpolated percentiles (both engines use the same linear
    * interpolation over sorted values). */
  private def percentiles(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.9)").as("p90"),
        expr("percentile(o_totalprice, 0.99)").as("p99"))

  private val percentilesSql =
    """SELECT o_orderstatus,
      |  quantile_cont(o_totalprice, 0.5) AS p50,
      |  quantile_cont(o_totalprice, 0.9) AS p90,
      |  quantile_cont(o_totalprice, 0.99) AS p99
      |FROM orders GROUP BY 1""".stripMargin

  /** Approximate percentile sketch with a REAL oracle (unlike the HLL++
    * sketch, which stays rows-only): the sketch value itself is
    * engine-specific and never surfaces — instead the query emits the
    * exact interpolated median plus a within-bound flag checking the
    * sketch against exact quantiles at 0.5 ± 5ε. approx_percentile's
    * rank-error guarantee (ε = 1/accuracy) holds for ANY partition/merge
    * order, so the flag is deterministically true and the whole row
    * hash-compares. At 100 TB the sketch is the one that runs (mergeable
    * partials, bounded memory); the exact percentile here is the
    * small-scale certificate. */
  private def approxPercentile(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("p50_exact"),
        expr("approx_percentile(o_totalprice, 0.5, 1000)").as("_p50_sketch"),
        expr("percentile(o_totalprice, 0.495)").as("_lo"),
        expr("percentile(o_totalprice, 0.505)").as("_hi"))
      .select(col("o_orderstatus"), col("p50_exact"),
        (col("_p50_sketch") >= col("_lo") && col("_p50_sketch") <= col("_hi"))
          .as("within_bound"))

  private val approxPercentileSql =
    """SELECT o_orderstatus,
      |  quantile_cont(o_totalprice, 0.5) AS p50_exact,
      |  TRUE AS within_bound
      |FROM orders GROUP BY 1""".stripMargin

  /** Z-order (Morton) clustering key over (customer, order) — the
    * 2-D lake-layout sort key; the oracle expands the identical
    * shift/mask pipeline, so every interleaved bit is hash-compared. */
  private def zorderKey(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ZOrderFns
    Tables.orders(s, dir).select(col("o_orderkey"),
      ZOrderFns.zorder16(col("o_custkey"), col("o_orderkey") % 65536)
        .as("zkey"))
  }

  private val zorderKeySql =
    s"""SELECT o_orderkey,
       |  ${graft.functions.ZOrderFns.zorderSql("o_custkey", "(o_orderkey % 65536)")}
       |    AS zkey
       |FROM orders""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fn_zorder_key"    -> zorderKey _,
    "agg_approx_percentile" -> approxPercentile _,
    "agg_percentile"   -> percentiles _,
    "fn_date"          -> dateFns _,
    "fn_math"          -> mathFns _,
    "fn_string"        -> stringFns _,
    "fn_typed_dataset" -> typedDataset _)

  def oracles: Map[String, String] = Map(
    "fn_zorder_key"    -> zorderKeySql,
    "agg_approx_percentile" -> approxPercentileSql,
    "agg_percentile"   -> percentilesSql,
    "fn_date"          -> dateFnsSql,
    "fn_math"          -> mathFnsSql,
    "fn_string"        -> stringFnsSql,
    "fn_typed_dataset" -> typedDatasetSql)
}
