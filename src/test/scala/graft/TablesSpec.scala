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

  // ---- full physical-schema surface (round-12): every table, every
  // column, probed the way the loaders actually read it, so ANY
  // driver-side regeneration drift fails here at `sbt test` time
  // instead of costing a round of silently-broken queries. ----

  private val allTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  test("every table exists as a readable file-or-directory parquet") {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    allTables.foreach { t =>
      val p = new org.apache.hadoop.fs.Path(s"$sf/$t.parquet")
      assert(fs.exists(p), s"$t.parquet missing from $sf")
      // both shapes are legitimate (driver ships single files; ScaleUp
      // images are part-file directories) — what matters is that a
      // plain scan opens it
      assert(Tables.load(spark, sf, t).schema.fields.nonEmpty,
        s"$t.parquet unreadable")
    }
  }

  test("timestamp columns surface as a KNOWN physical generation") {
    // Under nanosAsLong=true the raw scan type is the generation probe:
    // INT64 TIMESTAMP(NANOS) -> LongType, micros NTZ -> TimestampNTZType,
    // adjusted-micros / INT96 -> TimestampType. events tolerates all
    // three (its loader normalizes); the plain-loaded fact timestamps
    // tolerate only the two timestamp surfaces — a nanos regeneration
    // of orders/lineitem would NOT be normalized by their loaders and
    // must fail here rather than inside 40 queries.
    val eventsRaw = Tables.load(spark, sf, "events").schema("ts").dataType
    assert(Set[DataType](LongType, TimestampNTZType, TimestampType)(eventsRaw),
      s"events.ts raw surface $eventsRaw is a new generation — extend " +
        "Tables.events before trusting any streaming/window query")
    Seq("orders" -> "o_orderdate", "lineitem" -> "l_shipdate").foreach {
      case (t, c) =>
        val raw = Tables.load(spark, sf, t).schema(c).dataType
        assert(Set[DataType](TimestampNTZType, TimestampType)(raw),
          s"$t.$c raw surface $raw — plain loaders don't normalize this; " +
            "add handling in Tables before any date query can be trusted")
    }
  }

  test("all tables: loader column names and types, column by column") {
    val I = IntegerType; val L = LongType; val D = DoubleType
    val S = StringType
    val expect: Map[String, Seq[(String, DataType)]] = Map(
      "region"   -> Seq("r_regionkey" -> I, "r_name" -> S),
      "nation"   -> Seq("n_nationkey" -> I, "n_name" -> S, "n_regionkey" -> I),
      "customer" -> Seq("c_custkey" -> L, "c_name" -> S, "c_nationkey" -> I,
        "c_acctbal" -> D, "c_mktsegment" -> S),
      "supplier" -> Seq("s_suppkey" -> L, "s_name" -> S, "s_nationkey" -> I,
        "s_acctbal" -> D),
      "part"     -> Seq("p_partkey" -> L, "p_name" -> S, "p_brand" -> S,
        "p_type" -> S, "p_size" -> I, "p_retailprice" -> D),
      "orders"   -> Seq("o_orderkey" -> L, "o_custkey" -> L,
        "o_orderstatus" -> S, "o_totalprice" -> D,
        "o_orderpriority" -> S),
      "lineitem" -> Seq("l_orderkey" -> L, "l_partkey" -> L, "l_suppkey" -> L,
        "l_linenumber" -> I, "l_quantity" -> D, "l_extendedprice" -> D,
        "l_discount" -> D, "l_tax" -> D, "l_returnflag" -> S,
        "l_linestatus" -> S),
      "documents" -> Seq("doc_id" -> L, "text" -> S, "lang" -> S,
        "source" -> S, "n_chars" -> L),
      "embeddings" -> Seq("vec_id" -> L, "label" -> I))
    expect.foreach { case (t, cols) =>
      val have = Tables.load(spark, sf, t).schema.fields
        .map(f => f.name -> f.dataType).toMap
      cols.foreach { case (c, want) =>
        assert(have.get(c).contains(want),
          s"$t.$c: expected $want, got ${have.get(c)} — regeneration drift")
      }
    }
    // parquet optionals: every column has shipped nullable in every
    // generation; a required (non-nullable) regeneration would change
    // Catalyst constraint propagation, so surface it
    allTables.foreach { t =>
      val notNull = Tables.load(spark, sf, t).schema.fields
        .filterNot(_.nullable).map(_.name)
      assert(notNull.isEmpty,
        s"$t columns $notNull turned non-nullable — new generation")
    }
  }
}
