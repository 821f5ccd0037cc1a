package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-study data builder: writes an N× copy of a testdata dir by
  * unioning key-shifted copies of the big tables (dims are copied
  * verbatim — in a warehouse the dimensions don't grow with the fact
  * feed). Used to measure how every query's runtime scales from sf0.1
  * to ~sf1 (BASELINE.md scaling table); NOT a correctness input — the
  * oracle contract stays on the driver-generated dirs.
  *
  * Copy hygiene so the scaled statistics resemble bigger data instead of
  * planted duplicates:
  *  - fact keys shift by copy × (max+1) so joins stay consistent within a
  *    copy and key cardinality grows linearly;
  *  - document text gets a per-copy Caesar rotation of [a-z] so shingle /
  *    minhash / fingerprint domains are disjoint across copies (otherwise
  *    every doc has N-1 planted near-dups and pair counts grow N², which
  *    measures the corpus, not the engine);
  *  - embeddings get a small deterministic per-copy component offset for
  *    the same reason (bucket populations grow ~linearly, not N identical
  *    echoes of each vector).
  *
  * Usage: runMain graft.ScaleUp <srcDir> <outDir> <copies>
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(src, out, copiesStr) = args.take(3)
    val copies = copiesStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // micros on disk (not INT96): keeps the image's timestamp physical
      // type in the same family the driver generator ships
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def copyThrough(name: String): Unit =
      spark.read.parquet(s"$src/$name.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")

    // Key-shift offset: cast to long before max so a future testdata
    // generation shipping 32-bit key columns (schema drift between
    // rounds is a known hazard) widens instead of ClassCastException-ing,
    // and an empty table (null max) falls back to a shift of 1.
    def shiftOf(df: DataFrame, key: String): Long = {
      val row = df.agg(max(col(key).cast("long"))).head()
      (if (row.isNullAt(0)) 0L else row.getLong(0)) + 1
    }

    /** Union `copies` key-shifted images of `df`. */
    def scaled(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until copies).map(i => shift(df, i)).reduce(_ unionByName _)

    // Caesar-rotate lowercase letters by i so cross-copy shingles diverge
    def rot(c: org.apache.spark.sql.Column, i: Int) =
      translate(c, "abcdefghijklmnopqrstuvwxyz",
        "abcdefghijklmnopqrstuvwxyz".drop(i % 26) +
          "abcdefghijklmnopqrstuvwxyz".take(i % 26))

    Seq("region", "nation", "customer", "supplier", "part").foreach(copyThrough)

    val orders = spark.read.parquet(s"$src/orders.parquet")
    val oShift = shiftOf(orders, "o_orderkey")
    scaled(orders)((d, i) => d.withColumn("o_orderkey", col("o_orderkey") + lit(i * oShift)))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/orders.parquet")

    val lineitem = spark.read.parquet(s"$src/lineitem.parquet")
    scaled(lineitem)((d, i) => d.withColumn("l_orderkey", col("l_orderkey") + lit(i * oShift)))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/lineitem.parquet")

    val events = Tables.events(spark, src)
    val eShift = shiftOf(events, "event_id")
    val uShift = shiftOf(events, "user_id")
    scaled(events)((d, i) => d
        .withColumn("event_id", col("event_id") + lit(i * eShift))
        .withColumn("user_id", col("user_id") + lit(i * uShift)))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/events.parquet")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val dShift = shiftOf(docs, "doc_id")
    scaled(docs)((d, i) => d
        .withColumn("doc_id", col("doc_id") + lit(i * dShift))
        .withColumn("text", rot(col("text"), i)))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val vShift = shiftOf(emb, "vec_id")
    scaled(emb)((d, i) => d
        .withColumn("vec_id", col("vec_id") + lit(i * vShift))
        .withColumn("embedding",
          transform(col("embedding"), x => x + lit(i * 0.013f))))
      .write.mode(SaveMode.Overwrite).parquet(s"$out/embeddings.parquet")

    spark.stop()
  }
}
