package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The slop-serve anchor-count kernel (proximity's interval-island
  * intersection sweep — see [[graft.ops.TextCorpus.proximityMatchTopK]]
  * for the full derivation) FUSED into one codegen'd expression.
  *
  * Input is one document's matched (group, position) pairs sorted by
  * (`grp` asc, `v` asc) — `grp` is the query OFFSET (proximity, long)
  * or the query TERM (NEAR, string); each occurrence supports the
  * interval `[v − reach, v]`, and the result is
  * `n_windows = |∩_grp ∪_occurrences [v − reach, v]|`, or 0 when the
  * array covers fewer than `quorum` distinct groups (the missing-term
  * precheck, fused so the group scan and the sweep share one pass over
  * the array).
  *
  * WHY an expression and not the HOF formulation it replaces: Spark's
  * array higher-order functions (`transform`/`filter`/`aggregate`) are
  * CodegenFallback — each element evaluates an interpreted lambda tree,
  * and the three-layer island → sort → sweep chain left proximity/NEAR
  * at ~1.6× phrase's wall at the 100× decade (BASELINE.md round-17)
  * with the sweep interpreted per event. This kernel is one compiled
  * method — island detection in a single forward scan (the input is
  * group-sorted, so island starts/ends are per-group boundary checks),
  * then a two-pointer merge over the island endpoint arrays instead of
  * materializing + sorting struct events — and `doGenCode` emits a
  * static call, so the surrounding projection stays inside
  * WholeStageCodegen instead of breaking the span at every HOF.
  *
  * Parity with the HOF chain it replaces (asserted value-for-value in
  * SlopWindowsSpec): the sweep charges each segment with the cover held
  * across it (compare BEFORE applying the event), so same-position ties
  * contribute zero-length segments whatever their processing order —
  * start-before-end at ties here vs array_sort's d = −1-first is
  * indistinguishable in the accumulated count.
  */
object SlopWindows {

  /** Count anchors covered by every group's island set; 0 when fewer
    * than `quorum` distinct groups appear. `oa` MUST be sorted by
    * (grp, v) with non-null elements — the `sort_array(collect_list)`
    * contract of the callers. */
  def count(oa: ArrayData, grpIsString: Boolean, reach: Long,
            quorum: Long): Long = {
    val n = oa.numElements()
    if (n == 0) return 0L
    val gap = reach + 1L
    // ≤ n islands; starts are island lower bounds (v − reach), ends are
    // one past the island upper bounds (v + 1) — the +1/−1 sweep events
    val starts = new Array[Long](n)
    val ends = new Array[Long](n)
    var m = 0
    var groups = 0L
    var prevV = 0L
    var prevGrpL = 0L
    var prevGrpS: UTF8String = null
    var i = 0
    while (i < n) {
      val row = oa.getStruct(i, 2)
      val v = row.getLong(1)
      var newGroup = i == 0
      if (grpIsString) {
        val g = row.getUTF8String(0)
        if (!newGroup) newGroup = !g.equals(prevGrpS)
        prevGrpS = g
      } else {
        val g = row.getLong(0)
        if (!newGroup) newGroup = g != prevGrpL
        prevGrpL = g
      }
      if (newGroup) groups += 1
      if (newGroup || v - prevV > gap) {
        m += 1
        starts(m - 1) = v - reach
      }
      ends(m - 1) = v + 1L
      prevV = v
      i += 1
    }
    if (groups != quorum) return 0L
    // Two-pointer merge sweep: island starts and ends sorted
    // independently; cover == quorum segments accumulate. Equivalent to
    // sorting the interleaved ±1 events (see tie note in the class doc).
    java.util.Arrays.sort(starts, 0, m)
    java.util.Arrays.sort(ends, 0, m)
    var si = 0
    var ei = 0
    var cover = 0L
    var last = 0L
    var acc = 0L
    while (ei < m) {
      val startNext = si < m && starts(si) <= ends(ei)
      val at = if (startNext) starts(si) else ends(ei)
      if (cover == quorum) acc += at - last
      if (startNext) { cover += 1; si += 1 }
      else { cover -= 1; ei += 1 }
      last = at
    }
    acc
  }

  /** Column entry point: `oa` array<struct<grp: long|string, v: long>>
    * sorted by (grp, v); `reach`, `quorum` long columns. */
  def slop_windows(oa: Column, reach: Column, quorum: Column): Column =
    Bridge.column(SlopWindowsExpr(Bridge.expression(oa),
      Bridge.expression(reach), Bridge.expression(quorum)))
}

case class SlopWindowsExpr(first: Expression, second: Expression,
                           third: Expression) extends TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "slop_windows"

  /** NEAR groups by term (string), proximity by offset (long) — decided
    * once from the input schema, not per row. */
  private lazy val grpIsString: Boolean = first.dataType match {
    case ArrayType(st: StructType, _) => st.head.dataType == StringType
    case other =>
      throw new IllegalArgumentException(
        s"slop_windows expects array<struct<grp, v: long>>, got $other")
  }

  override def nullSafeEval(oa: Any, reach: Any, quorum: Any): Any =
    SlopWindows.count(oa.asInstanceOf[ArrayData], grpIsString,
      reach.asInstanceOf[Long], quorum.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (oa, reach, quorum) =>
      s"graft.expressions.SlopWindows.count($oa, $grpIsString, $reach, $quorum)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): SlopWindowsExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}
