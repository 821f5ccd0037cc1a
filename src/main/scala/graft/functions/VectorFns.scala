package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions over `array<float>` (north-star
  * similarity-search scope, SURVEY.md §7.1 M8).
  *
  * Pure higher-order-function expressions: `zip_with` + `aggregate` keep
  * the math in Tungsten with no UDF/serialization boundary. Accumulation
  * is in double for stability regardless of input element type.
  */
object VectorFns {

  /** Dot product of two equal-length float vectors. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2_norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val na = l2_norm(a)
    val nb = l2_norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(dot(a, b) / (na * nb))
  }

  /** Symmetric int8 scalar quantization: q_i = ⌊x_i/scale·127 + ½⌋ with
    * scale = max|x| — the 4× storage cut (float32 → int8) an embedding
    * store takes at corpus scale, as a pure codegen'd projection. The
    * ⌊·+½⌋ convention (not `round`) keeps every lane integer-exact and
    * engine-portable: floor is IEEE-deterministic where banker's/half-up
    * tie rules differ between engines. Zero vectors quantize to zeros.
    *
    * Pass the scale as a PRECOMPUTED column (e.g. a
    * `withColumn("scale", quantize_scale(v))` projection): codegen does
    * not hoist subexpressions out of lambda bodies, so an inline
    * aggregate here would re-fold the whole vector once per lane —
    * O(dim²) per row. */
  def quantize_i8(v: Column, scale: Column): Column =
    when(scale === 0.0, transform(v, _ => lit(0)))
      .otherwise(transform(v,
        x => floor(x.cast("double") / scale * 127.0 + 0.5).cast("int")))

  /** Convenience form for one-off/test use; see the scale-column caveat
    * above before putting this in a hot path. */
  def quantize_i8(v: Column): Column = quantize_i8(v, quantize_scale(v))

  /** The quantization scale (max |x|) the de-quantizer needs. */
  def quantize_scale(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double"))))

  /** Squared euclidean distance. */
  def l2_sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
      (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** Random-hyperplane LSH bucket: sign bits of dot products against
    * `planes` pseudo-random hyperplanes derived from xxhash64 of the
    * element index and plane seed (deterministic, data-independent).
    * Vectors in the same bucket are cosine-similar candidates — the
    * 100 TB path that replaces the all-pairs cross join. */
  def hyperplane_bucket(vec: Column, planes: Int = 8): Column = {
    val bits = (0 until planes).map { p =>
      // pseudo-random ±1 weights per (plane, dimension), summed via
      // position-aware transform; sign of the projection is the bit.
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) =>
          x.cast("double") *
            when(xxhash64(lit(p), i).bitwiseAND(1) === 1, lit(1.0))
              .otherwise(lit(-1.0))),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1), p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** The ±1 weight for (plane p, dimension i): the low bit of the first
    * 15 hex chars of md5("p,i") — i.e. the low bit of
    * [[graft.functions.TextFns.portable_hash60]] over the same string,
    * which is just the low bit of hex digit 15. Computed driver-side so
    * the weights become plan literals; the oracle recomputes the same
    * bit in SQL. */
  private[graft] def portableWeight(p: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$p,$i".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if ((Integer.parseInt(hex.substring(14, 15), 16) & 1) == 1) 1.0 else -1.0
  }

  /** Engine-portable variant of [[hyperplane_bucket]]: the ±1 weights
    * derive from md5 of "plane,dim" (see [[portableWeight]]), so any
    * engine with md5 — the correctness oracle — rebuilds identical
    * hyperplanes. Weights are plan-time literal arrays (`dim` must be the
    * actual vector length); per row this is the same zip_with/aggregate
    * fold as the xxhash64 path, with the same left-to-right double
    * accumulation the oracle's list_sum uses. */
  def hyperplane_bucket_portable(vec: Column, planes: Int = 8,
                                 dim: Int = 64): Column = {
    val bits = (0 until planes).map { p =>
      val weights = array((0 until dim).map(i => lit(portableWeight(p, i))): _*)
      val proj = aggregate(
        zip_with(vec, weights, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1), p)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }
}
