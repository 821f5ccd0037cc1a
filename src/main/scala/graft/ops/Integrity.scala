package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Whole-table content fingerprinting — the migration-validation tool
  * for exactly the switch this library exists for: after moving a
  * pipeline from the reference engine (or between clusters/formats),
  * prove the data survived byte-for-byte WITHOUT sorting or comparing
  * rows pairwise. The digest is an XOR of per-row md5-derived values:
  * commutative and associative, so it is independent of partitioning,
  * row order, and file layout — one aggregation pass, a 16-byte answer,
  * and any single-row difference flips it.
  *
  * XOR (not SUM) keeps the fold overflow-free at any row count; the
  * row count rides along to guard the (astronomical) case of
  * cancelling double-flips. Callers pick the columns: keys + categorical
  * columns digest raw, free-text columns should be pre-hashed (md5) by
  * the caller, and floats should be avoided — engines disagree on
  * float→string rendering, which is an ENCODING difference, not a data
  * difference. */
object Integrity {

  /** (table, n_rows, digest) for one table: digest = XOR over rows of
    * the 60-bit md5 prefix of the '|'-joined column rendering. */
  def tableDigest(df: DataFrame, table: String, cols: Seq[Column]): DataFrame =
    df.select(TextFns.portable_hash60(concat_ws("|", cols: _*)).as("h"))
      .agg(count(lit(1)).as("n_rows"), bit_xor(col("h")).as("digest"))
      .select(lit(table).as("tbl"), col("n_rows"), col("digest"))

  /** Digests for several tables in one result set. */
  def digests(tables: Seq[(String, DataFrame, Seq[Column])]): DataFrame =
    tables.map { case (n, df, cs) => tableDigest(df, n, cs) }
      .reduce(_ unionByName _)

  /** Row-level diff of two table snapshots keyed by `key`: one output
    * row per key whose content CHANGED between snapshots — verdict
    * `added` (key only in `after`), `removed` (only in `before`) or
    * `changed` (both sides, different content hash) with both sides'
    * hashes. Unchanged keys are dropped, not materialized: at warehouse
    * scale the diff is small, the table is not.
    *
    * The compare happens on the 60-bit content hash of `cols`, never
    * the columns themselves — the full-outer join shuffles (key, 8-byte
    * hash) rows regardless of row width, and the same float-rendering
    * caveat as [[tableDigest]] applies to the column choice. `key` must
    * be a candidate key on both sides (check with
    * [[Quality.duplicateKeys]] first) — duplicate keys would fan out
    * the join and classify the cross-matches. */
  def snapshotDiff(before: DataFrame, after: DataFrame, key: Column,
                   cols: Seq[Column]): DataFrame = {
    def hashed(df: DataFrame, h: String) =
      df.select(key.as("key"),
        TextFns.portable_hash60(concat_ws("|", cols: _*)).as(h))
    hashed(before, "h_before").join(hashed(after, "h_after"),
        Seq("key"), "full")
      .withColumn("verdict",
        when(col("h_before").isNull, lit("added"))
          .when(col("h_after").isNull, lit("removed"))
          .when(col("h_before") =!= col("h_after"), lit("changed")))
      .filter(col("verdict").isNotNull)
      .select(col("key"), col("verdict"), col("h_before"), col("h_after"))
  }
}
