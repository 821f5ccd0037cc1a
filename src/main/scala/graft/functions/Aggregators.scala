package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregations (SURVEY.md §2.11): the engine's UDAF
  * extension point, as `Aggregator[IN, BUF, OUT]` (Tungsten-encoded
  * buffers, map-side partial merge — the scalable aggregation shape).
  */
object Aggregators {

  /** One-pass numeric profile: count/sum/min/max in a single buffer.
    * Sum is kept in scaled-long cents so results are exact and
    * engine-order-independent (same trick as the Dsl decimal casts). */
  case class StatsBuf(n: Long, sumCents: Long, min: Double, max: Double)
  case class Stats(n: Long, sum: java.math.BigDecimal, min: Double, max: Double)

  class NumericProfile extends Aggregator[Double, StatsBuf, Stats] {
    override def zero: StatsBuf =
      StatsBuf(0L, 0L, Double.PositiveInfinity, Double.NegativeInfinity)
    override def reduce(b: StatsBuf, v: Double): StatsBuf =
      StatsBuf(b.n + 1, b.sumCents + Math.round(v * 100),
        math.min(b.min, v), math.max(b.max, v))
    override def merge(a: StatsBuf, b: StatsBuf): StatsBuf =
      StatsBuf(a.n + b.n, a.sumCents + b.sumCents,
        math.min(a.min, b.min), math.max(a.max, b.max))
    override def finish(b: StatsBuf): Stats =
      Stats(b.n, java.math.BigDecimal.valueOf(b.sumCents, 2), b.min, b.max)
    override def bufferEncoder: Encoder[StatsBuf] = Encoders.product[StatsBuf]
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }

  /** MinHash signature union: merges per-document signatures into the
    * group's signature by element-wise min — the monoid that lets near-dup
    * *clusters* be signed incrementally (partial merge on the map side,
    * signature-sized shuffle). */
  class MinHashUnion(numHashes: Int)
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)
    override def reduce(b: Array[Long], sig: Seq[Long]): Array[Long] = {
      var i = 0
      while (i < numHashes && i < sig.length) {
        if (sig(i) < b(i)) b(i) = sig(i)
        i += 1
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Seq[Long] = b.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
