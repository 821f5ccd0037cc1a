package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality constraint checks — the expectations layer an ETL engine
  * runs before promoting a load. Every check reduces to counts a single
  * declarative plan computes, so at 100 TB a full report costs one pass
  * per table (conditional aggregates, map-side partials) plus one
  * anti-join per referential rule — never a per-rule rescan.
  *
  * Results are rows, not exceptions: (check, n_violations) unions into
  * one report frame the caller can sink, alert on, or gate a promotion
  * with. Keeping failures in-band matches the engine's poison-row stance
  * (see `ops.Provenance` / per-row error capture).
  */
object Quality {

  /** Null-or-blank counts for `cols`, ONE pass over `df`: each column
    * contributes a conditional sum; blank means trimmed-empty string for
    * string columns (null-only for everything else). */
  def nullReport(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "nullReport needs at least one column")
    val isStr = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    val aggs = cols.map { c =>
      val bad =
        if (isStr.get(c).contains("string"))
          col(c).isNull || trim(col(c)) === ""
        else col(c).isNull
      coalesce(sum(when(bad, 1L).otherwise(0L)), lit(0L)).as(c)
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single row into (check, n_violations)
    one.select(explode(array(cols.map(c =>
        struct(lit(s"null_or_blank:$c").as("check"),
          col(c).as("n_violations"))): _*)).as("c"))
      .select(col("c.check").as("check"), col("c.n_violations").as("n_violations"))
  }

  /** Duplicate-key count for a candidate key: rows beyond the first per
    * key value. One grouped count (map-side partial on the key). */
  def duplicateKeys(df: DataFrame, keys: Seq[Column], name: String): DataFrame =
    df.groupBy(keys: _*).agg(count(lit(1)).as("n"))
      .agg(coalesce(sum(col("n") - 1), lit(0L)).as("n_violations"))
      .select(lit(s"duplicate_key:$name").as("check"), col("n_violations"))

  /** Referential-integrity orphans: child rows whose key has no parent —
    * a LEFT ANTI join (build side broadcastable when the parent key set
    * is small; otherwise a key-only shuffle, never the payloads). Null
    * child keys are not orphans (they are `nullReport`'s business). */
  def referentialOrphans(child: DataFrame, childKey: Column,
                         parent: DataFrame, parentKey: Column,
                         name: String): DataFrame =
    child.select(childKey.as("_k")).filter(col("_k").isNotNull)
      .join(parent.select(parentKey.as("_k")), Seq("_k"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(s"orphans:$name").as("check"), col("n_violations"))

  /** Range-constraint violations: rows where `expr` is FALSE (null is
    * not a violation — nullability is checked separately). */
  def constraintViolations(df: DataFrame, constraint: Column,
                           name: String): DataFrame =
    df.agg(coalesce(
        sum(when(not(coalesce(constraint, lit(true))), 1L).otherwise(0L)),
        lit(0L)).as("n_violations"))
      .select(lit(s"constraint:$name").as("check"), col("n_violations"))

  /** Union a set of checks into one report, ordered by check name. */
  def report(checks: Seq[DataFrame]): DataFrame = {
    require(checks.nonEmpty, "report needs at least one check")
    checks.reduce(_ unionByName _).orderBy("check")
  }
}
