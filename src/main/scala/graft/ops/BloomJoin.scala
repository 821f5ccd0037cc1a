package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-prefiltered joins — the runtime-filter pattern (Spark's own
  * `InjectRuntimeFilter`, here as an explicit operator): build a Bloom
  * filter over the build side's join keys, prefilter the probe side with
  * the codegen'd `BloomFilterMightContain` BEFORE its shuffle, then run the
  * exact join to clear false positives. Results are exactly the plain
  * join's — the bloom only cuts the probe side's shuffle volume.
  *
  * At 100 TB this is the difference between shuffling the full probe table
  * and shuffling only the ~selectivity fraction that can match: the filter
  * is a few MB broadcast into a scan-side predicate, evaluated at ~ns/row
  * inside whole-stage codegen. Build cost is one extra aggregation over the
  * build side's keys (map-side combined into per-partition filters).
  */
object BloomJoin {

  /** Serialized Bloom filter over xxhash64 of `key` in `keys`, built
    * distributed (one `BloomFilterAggregate` job) and returned as the
    * few-MB sketch — the same driver-side materialization a scalar
    * subquery performs. */
  def buildBloom(keys: DataFrame, key: Column, expectedItems: Long,
                 fpp: Double = 0.03): Array[Byte] = {
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      Bridge.expressionNow(keys.sparkSession, xxhash64(key)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    keys.select(Bridge.column(agg).as("bf")).head.getAs[Array[Byte]](0)
  }

  /** `might_contain(bloom, xxhash64(key))` as a codegen'd predicate. */
  def mightContain(df: DataFrame, key: Column, bloom: Array[Byte]): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(bloom),
      Bridge.expressionNow(df.sparkSession, xxhash64(key))))

  /** Exact left-semi join with a Bloom prefilter on the probe side.
    * Equivalent to `left ⋉ right` — false positives are cleared by the
    * semi join itself. */
  def semiJoin(left: DataFrame, right: DataFrame,
               leftKey: Column, rightKey: Column,
               expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val bloom = buildBloom(right.select(rightKey.as("k")), col("k"),
      expectedItems, fpp)
    left.where(mightContain(left, leftKey, bloom))
      .join(right.select(rightKey.as("__bk")), leftKey === col("__bk"), "left_semi")
  }

  /** Exact left-anti join with a Bloom shortcut: probe rows the bloom
    * rejects are DEFINITELY absent from the build side and bypass the join
    * entirely (no shuffle); only the maybe-present fraction pays the exact
    * anti join to separate true matches from false positives. */
  def antiJoin(left: DataFrame, right: DataFrame,
               leftKey: Column, rightKey: Column,
               expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val bloom = buildBloom(right.select(rightKey.as("k")), col("k"),
      expectedItems, fpp)
    val might = mightContain(left, leftKey, bloom)
    val definiteMiss = left.where(!might)
    val confirmed = left.where(might)
      .join(right.select(rightKey.as("__bk")), leftKey === col("__bk"), "left_anti")
    definiteMiss.unionByName(confirmed)
  }
}
