package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Driver-gate smoke + invariants for the ingest/streaming round-trip
  * queries (S2/S3/T1-T3/stateful/bucketed-join). The value-exactness of
  * each query is enforced by the DuckDB oracle in CI; these tests pin the
  * structural properties the oracle can't see — plan shape, gate
  * behavior, source round-trip fidelity. */
class IngestQueriesSpec extends SparkSpec {

  test("every ingest query runs, returns rows, and has an oracle") {
    IngestQueries.all.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
    assert(IngestQueries.oracles.keySet == IngestQueries.all.keySet)
  }

  test("s2: both sheets survive the round-trip with identical row counts") {
    val rows = IngestQueries.all("s2_header_roundtrip")(spark, sf)
      .groupBy("origin").agg(sum("n").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = graft.Tables.orders(spark, sf).count()
    assert(rows("sheetA") == expected && rows("sheetB") == expected)
  }

  test("s3: validity gate drops scheme-less urls; tries initialize to 0") {
    val agg = IngestQueries.all("s3_queue_bootstrap")(spark, sf)
      .agg(sum("n").as("n"), max("max_tries").as("t")).head()
    val orders = graft.Tables.orders(spark, sf)
    val expected = orders.filter(col("o_orderkey") % 10 =!= 0).count()
    assert(agg.getLong(0) == expected)
    assert(agg.getInt(1) == 0)
  }

  test("t1: drained stream matches the batch windowed aggregation") {
    val drained = IngestQueries.all("t1_drain_loop")(spark, sf)
      .orderBy("event_type").collect()
    val batch = graft.Tables.events(spark, sf)
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_windows"), sum(col("n")).as("n_events"))
      .orderBy("event_type").collect()
    assert(drained.length == batch.length)
    drained.zip(batch).foreach { case (d, b) =>
      assert(d.getString(0) == b.getString(0))
      assert(d.getLong(1) == b.getLong(1), s"window count ${d.getString(0)}")
      assert(d.getLong(2) == b.getLong(2), s"event count ${d.getString(0)}")
    }
  }

  test("t6: stateful sessions equal gaps-and-islands minus each user's last") {
    import org.apache.spark.sql.expressions.Window
    val stateful = IngestQueries.all("t6_stateful_sessions")(spark, sf)
      .agg(sum("n_sessions"), sum("n_events")).head()
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sessions = graft.Tables.events(spark, sf)
      .withColumn("prev", lag(col("ts"), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev").isNull ||
          col("ts").cast("long") - col("prev").cast("long") > 300, 1).otherwise(0))
      .withColumn("sid", sum("new_s").over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid").agg(count(lit(1)).as("n"))
    val closed = sessions
      .withColumn("last_sid", max("sid").over(Window.partitionBy("user_id")))
      .filter(col("sid") < col("last_sid"))
      .agg(count(lit(1)), sum("n")).head()
    assert(stateful.getLong(0) == closed.getLong(0), "closed session count")
    assert(stateful.getLong(1) == closed.getLong(1), "events in closed sessions")
  }

  test("bucketed co-located join plans with zero exchanges") {
    val df = IngestQueries.all("join_bucketed_colocated")(spark, sf)
    // the final single-partition agg over 5 groups may exchange; assert
    // the JOIN itself is exchange-free: no Exchange below SortMergeJoin
    val plan = df.queryExecution.executedPlan.toString
    val joinIdx = plan.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected a sort-merge join:\n$plan")
    assert(!plan.substring(joinIdx).contains("Exchange"),
      s"bucketed join must not shuffle its inputs:\n$plan")
  }
}
