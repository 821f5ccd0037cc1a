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
}
