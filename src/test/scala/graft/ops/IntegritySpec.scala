package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntegritySpec extends SparkSpec {
  import spark.implicits._

  private def dig(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val r = Integrity.tableDigest(df, "t", Seq(col("k"), col("v"))).head()
    (r.getLong(1), r.getLong(2))
  }

  test("digest is independent of row order and partitioning") {
    val rows = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
    val base = dig(rows.toDF("k", "v").coalesce(1))
    assert(dig(rows.reverse.toDF("k", "v").repartition(7)) == base)
    assert(dig(rows.sortBy(_._2).toDF("k", "v").repartition(2)) == base)
  }

  test("any single-row change flips the digest") {
    val rows = Seq((1L, "a"), (2L, "b"), (3L, "c"))
    val base = dig(rows.toDF("k", "v"))
    val changed = dig(Seq((1L, "a"), (2L, "X"), (3L, "c")).toDF("k", "v"))
    val dropped = dig(rows.take(2).toDF("k", "v"))
    assert(changed._2 != base._2)
    assert(dropped != base) // count moves even if xor ever collided
  }

  test("a swapped pair of values across rows is still detected") {
    // (1,a),(2,b) vs (1,b),(2,a): same value multiset, different rows
    val a = dig(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val b = dig(Seq((1L, "b"), (2L, "a")).toDF("k", "v"))
    assert(a._2 != b._2)
  }

  test("snapshotDiff: each verdict class lands once, unchanged rows drop") {
    import org.apache.spark.sql.functions.col
    val before = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val after = Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("k", "v")
    val got = Integrity.snapshotDiff(before, after, col("k"), Seq(col("v")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(2L -> "changed", 3L -> "removed", 4L -> "added"),
      s"diff misclassified: $got")
  }

  test("snapshotDiff: identical snapshots diff to empty") {
    import org.apache.spark.sql.functions.col
    val t = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    assert(Integrity.snapshotDiff(t, t, col("k"), Seq(col("v"))).count() === 0L)
  }
}
