package graft

import org.apache.spark.sql.types._

/** Canary for driver-side testdata regeneration. The driver rewrites
  * /root/testdata between rounds and physical types have drifted before
  * (round 11: events.ts INT64 nanos → timestamp[us], which crashed all
  * 22 events-reading queries until the loader learned both
  * generations). This spec pins what the LOADERS promise downstream —
  * column names and the normalized types — against the live files, so
  * the next generation change fails here, loudly, before it fails as a
  * silent hole in the correctness surface. */
class TablesSpec extends SparkSpec {

  private def fields(name: String)(load: => org.apache.spark.sql.DataFrame)
      : Map[String, DataType] =
    load.schema.fields.map(f => f.name -> f.dataType).toMap

  test("events loader normalizes ts to a session-TZ timestamp") {
    val f = fields("events")(Tables.events(spark, sf))
    assert(f("ts") == TimestampType,
      s"events.ts surfaced as ${f("ts")} — testdata generation changed again?")
    Seq("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType).foreach { case (c, t) =>
      assert(f.get(c).contains(t), s"events.$c: expected $t, got ${f.get(c)}")
    }
  }

  test("fact and corpus tables carry the columns the queries assume") {
    val expect = Map(
      "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority"),
      "lineitem" -> Seq("l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus",
        "l_shipdate", "l_suppkey", "l_partkey"),
      "documents" -> Seq("doc_id", "text", "lang", "source"),
      "embeddings" -> Seq("vec_id", "embedding"))
    expect.foreach { case (table, cols) =>
      val have = Tables.load(spark, sf, table).schema.fieldNames.toSet
      val missing = cols.filterNot(have)
      assert(missing.isEmpty,
        s"$table lost columns $missing — regeneration drift; have: $have")
    }
    // the embedding column must stay a float array — the similarity
    // family's Expression signatures depend on it
    val emb = Tables.load(spark, sf, "embeddings").schema("embedding").dataType
    assert(emb == ArrayType(FloatType) || emb == ArrayType(FloatType, true),
      s"embeddings.embedding surfaced as $emb")
  }
}
