package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys — the lake-layout tool for
  * multi-dimensional locality: sort/range-partition by the interleaved
  * key and rows close in BOTH dimensions land in the same files, so
  * min/max file statistics prune two-dimensional range predicates the
  * way a single-column sort can only prune one.
  *
  * The interleave is the classic magic-mask bit spread — five shifts and
  * masks per coordinate, all plain bitwise column arithmetic: codegen'd
  * by Spark, pushed through any engine, and exactly reproducible in the
  * DuckDB oracle (no UDF, no lookup table). Inputs are truncated to
  * their low 16 bits (the usual Z-order practice is hashing or
  * quantizing coordinates into a fixed budget first). */
object ZOrderFns {

  private val steps = Seq(
    (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))

  /** Spread the low 16 bits of `c` into the even bit positions of a
    * 32-bit value: bit i of the input lands at bit 2i. */
  def spread_bits16(c: Column): Column =
    steps.foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFL))) {
      case (x, (s, m)) => x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** 2-D Morton key: a-bits at even positions, b-bits at odd. */
  def zorder16(a: Column, b: Column): Column =
    spread_bits16(a).bitwiseOR(shiftleft(spread_bits16(b), 1))

  /** The identical spread as a SQL string (for the DuckDB oracle): the
    * same shift/mask pipeline, textually expanded. */
  def spreadSql(e: String): String =
    steps.foldLeft(s"($e & 65535)") {
      case (x, (s, m)) => s"(($x | ($x << $s)) & $m)"
    }

  def zorderSql(a: String, b: String): String =
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"
}
