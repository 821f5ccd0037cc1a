package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural invariants for the round-7 parity queries — the properties
  * the value-level oracle gate can't state directly. */
class ParityQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("4-gram blocking is lossless for any single substitution") {
    // a substitution at position p kills only grams covering p: at most 4
    // of the 7 — pigeonhole guarantees a surviving shared gram
    val name = "0123456789"
    val variants = (0 until 10).map { p =>
      (p.toLong, name.updated(p, 'z'))
    }.toDF("pos", "name")
    val canonical = Seq((-1L, name)).toDF("pos", "name")
    def grams(df: org.apache.spark.sql.DataFrame) =
      df.select(col("pos"), explode(
        expr("transform(sequence(1, 7), g -> substring(name, g, 4))"))
        .as("gram"))
    val blocked = grams(canonical).select(col("gram"))
      .join(grams(variants), Seq("gram"))
      .select("pos").distinct().count()
    assert(blocked == 10, "every 1-substitution variant must share a gram")
  }

  test("gap fill: planted outage days are re-densified with LOCF values") {
    val df = TemporalQueries.all("w7_gap_fill")(spark, sf)
    // spine is complete: same day count for every type
    val perType = df.groupBy("event_type").count()
      .select("count").distinct().count()
    assert(perType == 1, "all event types must share the full date spine")
    // outage days exist (n = 0) and carry non-null LOCF
    val outage = df.filter(col("n") === 0)
    assert(outage.count() > 0)
    assert(outage.filter(col("total_locf").isNull).count() == 0)
    // non-outage days: locf equals that day's own total
    val live = df.filter(col("n") > 0)
      .filter(col("total_locf") =!= col("total")).count()
    assert(live == 0, "an observed day is its own last observation")
  }

  test("exact-comoment correlation matches Spark's corr within float merge noise") {
    val ours = StarQueries.all("agg_corr")(spark, sf)
      .select("l_returnflag", "corr_qty_price").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val builtin = graft.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    ours.foreach { case (k, v) =>
      assert(math.abs(v - builtin(k)) < 1e-9, s"flag $k: $v vs ${builtin(k)}")
    }
  }
}
