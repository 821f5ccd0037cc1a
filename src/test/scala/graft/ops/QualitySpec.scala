package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Data-quality constraint checks: counting semantics, null handling,
  * and the empty/clean edge cases a gate must not trip over. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("nullReport counts nulls and blank strings in one pass") {
    val df = Seq(
      (Some(1L), "a"), (None, "b"), (Some(3L), ""), (None, "  "))
      .toDF("id", "s")
    val out = asMap(Quality.nullReport(df, Seq("id", "s")))
    assert(out("null_or_blank:id") == 2)
    assert(out("null_or_blank:s") == 2) // "" and "  " are both blank
  }

  test("duplicateKeys counts rows beyond the first per key") {
    val df = Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("k")
    val out = asMap(Quality.duplicateKeys(df, Seq(col("k")), "k"))
    assert(out("duplicate_key:k") == 3) // 2 extra 1s + 1 extra 3
    val clean = asMap(Quality.duplicateKeys(
      Seq(1L, 2L).toDF("k"), Seq(col("k")), "k"))
    assert(clean("duplicate_key:k") == 0)
  }

  test("referentialOrphans: anti-join count, null child keys excluded") {
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = asMap(Quality.referentialOrphans(
      child, col("fk"), parent, col("pk"), "fk"))
    assert(out("orphans:fk") == 1) // only 9; null is not an orphan
  }

  test("constraintViolations: false counts, null passes") {
    val df = Seq(Some(5.0), Some(-1.0), None).toDF("amt")
    val out = asMap(Quality.constraintViolations(df, col("amt") >= 0, "amt"))
    assert(out("constraint:amt") == 1)
  }

  test("report unions checks; empty input yields zero counts, not nulls") {
    val empty = Seq.empty[(Long, String)].toDF("id", "s")
    val out = asMap(Quality.report(Seq(
      Quality.nullReport(empty, Seq("id")),
      Quality.duplicateKeys(empty, Seq(col("id")), "id"),
      Quality.constraintViolations(empty, col("id") > 0, "pos"))))
    assert(out.values.forall(_ == 0L) && out.size == 3)
  }
}
