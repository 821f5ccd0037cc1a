package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.TextCorpus

/** Incremental maintenance of a BM25 postings index — the SPARSE
  * counterpart of [[IndexStream]]'s dense ANN lists: new document
  * batches are tokenized and their index partials appended to a
  * [[BatchStore]], so the retrieval index keeps up with ingest without
  * ever re-scanning the standing corpus.
  *
  * WHY PARTIALS COMPOSE: doc_ids are unique across batches (the same
  * caller contract as [[IndexStream]] — upstream admission enforces
  * at-most-once ingest), so every BM25 index frame is a disjoint union
  * of per-batch frames: tf rows are per-(doc, word) facts, dl rows
  * per-doc facts, and df — the one frame aggregated across documents —
  * is a per-word SUM of per-batch document counts. The serve path
  * re-aggregates the df partials and hands the frames to
  * [[TextCorpus.bm25ScoreTopK]], the batch build's own scoring core,
  * so the served ranking is BIT-IDENTICAL to rebuilding the index from
  * the full corpus (`t14_postings_maintain` certifies this end to end
  * against the batch oracle).
  *
  * ONE FRAME PER BATCH: the partials ship as one union-typed frame
  * (`kind` ∈ tf|dl|df, plus per-occurrence `tp` position rows when the
  * store is positional; `n` carries the count or position) written to a
  * single `graft_batch=<id>` dir — under the store family's read
  * contract (serve between drains/batches, like [[BatchStore
  * .compact]]), a reader sees each batch all-or-nothing, and a replay
  * after a crash-before-checkpoint-commit overwrites its previous
  * attempt wholesale, the same crash contract as
  * [[DedupStream]]/[[IndexStream]]. Split per-kind stores would break
  * that batch-granularity: a crash between the kind writes leaves tf
  * visible with dl missing, which silently drops the batch's docs from
  * scoring until the replay — repairable only with an extra per-batch
  * commit marker. Each batch
  * file is written sorted by (kind, word), so parquet row-group stats
  * prune the serve's kind filters instead of paying a full-file scan.
  *
  * Store lifecycle: [[compactIndex]] folds old batch dirs through
  * [[BatchStore.compact]] with a merge that re-sums the df partials
  * (one row per word per base generation — the vocabulary never
  * accumulates per-batch copies) and passes the tf/dl facts through
  * untouched. */
object PostingsStream {

  /** Write-once root marker: present iff EVERY batch in the store
    * carries positional (`tp`) rows. Underscore-prefixed so Spark's
    * file index ignores it, like [[BatchStore]]'s `_BASE`. */
  private val PositionsMarker = "_POSITIONS"

  private def fsFor(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Whether `storeDir` was maintained with `positions = true`. */
  def hasPositions(spark: SparkSession, storeDir: String): Boolean =
    fsFor(spark, storeDir).exists(new Path(storeDir, PositionsMarker))

  private def hasAnyBatchDir(spark: SparkSession, storeDir: String): Boolean = {
    val fs = fsFor(spark, storeDir)
    val p = new Path(storeDir)
    fs.exists(p) && fs.listStatus(p).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith(s"${BatchStore.BatchCol}="))
  }

  /** The per-batch index partial of `docs` (doc_id, text): tf, dl and
    * df rows union-typed under `kind`; with `positions`, also one `tp`
    * row per token occurrence (`n` = 0-based position — positions only
    * ever enter phrase matching as differences, so the base is free). */
  private[streaming] def batchPartial(docs: DataFrame,
                                      positions: Boolean = false): DataFrame = {
    val words = TextCorpus.tokenize(docs, col("doc_id"), col("text"))
    val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("n"))
      .select(lit("tf").as("kind"), col("doc_id"), col("word"), col("n"))
    // dl = Σ_word tf: derived from tf (one tokenize pass per batch)
    val dl = tf.groupBy("doc_id").agg(sum("n").as("n"))
      .select(lit("dl").as("kind"), col("doc_id"),
        lit(null).cast("string").as("word"), col("n"))
    val df = tf.groupBy("word").agg(count(lit(1)).as("n"))
      .select(lit("df").as("kind"), lit(null).cast("long").as("doc_id"),
        col("word"), col("n"))
    val base = tf.unionByName(dl).unionByName(df)
    if (!positions) base
    else base.unionByName(
      TextCorpus.positional(docs, col("doc_id"), col("text"), "doc_id", "pos")
        .select(lit("tp").as("kind"), col("doc_id"), col("word"),
          col("pos").cast("long").as("n")))
  }

  /** Start the maintenance stream over a streaming `docs` frame with
    * (doc_id, text) columns. AvailableNow by default (drain-then-stop);
    * `continuous = true` for a long-running micro-batch loop. The
    * compaction policy placement mirrors [[IndexStream.maintainIndex]]:
    * at drain start, or (continuous) at the top of each micro-batch,
    * both between-batches instants by construction.
    *
    * `positions = true` additionally stores per-occurrence token
    * positions (`tp` rows, ~dl-sum extra rows per batch) and marks the
    * store, enabling [[phraseServe]]. The mode is a WHOLE-STORE
    * property, checked fail-closed at start: flipping it mid-store
    * would leave old batches invisible to phrase matching (positions
    * missing) or break the marker's promise (positions partial), both
    * silent wrong-answer states — so a mismatch throws instead. */
  def maintainPostings(docs: DataFrame, storeDir: String,
                       checkpointDir: String,
                       continuous: Boolean = false,
                       compactWhenBatchesExceed: Option[Int] = None,
                       positions: Boolean = false)
      : StreamingQuery = {
    val spark = docs.sparkSession
    if (positions) {
      require(hasPositions(spark, storeDir) ||
          !hasAnyBatchDir(spark, storeDir),
        s"$storeDir already holds position-less batches — a positional " +
          "retrofit would silently hide them from phrase matching; " +
          "rebuild the store instead")
      val fs = fsFor(spark, storeDir)
      fs.mkdirs(new Path(storeDir))
      val out = fs.create(new Path(storeDir, PositionsMarker), true)
      out.close()
    } else require(!hasPositions(spark, storeDir),
      s"$storeDir is marked positional — appending position-less batches " +
        "would break phraseServe's completeness; pass positions = true")
    def runPolicy(): Unit = compactWhenBatchesExceed.foreach { threshold =>
      val p = new Path(storeDir)
      if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
        BatchStore.compactIfOver(spark, storeDir, threshold,
          merge = Some(mergeDfPartials))
    }
    runPolicy()
    val writer = docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (continuous) runPolicy()
        batchPartial(batch.select("doc_id", "text"), positions)
          .sortWithinPartitions("kind", "word")
          .write.mode("overwrite")
          .parquet(s"$storeDir/${BatchStore.BatchCol}=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
    (if (continuous) writer else writer.trigger(Trigger.AvailableNow()))
      .start()
  }

  /** [[BatchStore.compact]] merge for this store: df partials re-sum to
    * one row per word (recency-free — df is a pure sum, so folding
    * loses nothing); tf/dl facts pass through untouched. */
  val mergeDfPartials: DataFrame => DataFrame = in => {
    val facts = in.filter(col("kind") =!= "df")
      .select("kind", "doc_id", "word", "n")
    val df = in.filter(col("kind") === "df")
      .groupBy("word").agg(sum("n").as("n"))
      .select(lit("df").as("kind"), lit(null).cast("long").as("doc_id"),
        col("word"), col("n"))
    facts.unionByName(df).sortWithinPartitions("kind", "word")
  }

  /** Fold old batch dirs into a base generation (run between drains —
    * see [[BatchStore]] for the protocol). */
  def compactIndex(spark: SparkSession, storeDir: String,
                   keepBatches: Int = 2): BatchStore.Compaction =
    BatchStore.compact(spark, storeDir, keepBatches,
      merge = Some(mergeDfPartials))

  /** The index frames as the scoring core expects them. df stays as
    * PARTIALS (per-batch per-word counts, one row per word per live
    * batch/base dir) — the scoring core restricts to the query
    * vocabulary before summing, so no consumer ever pays a
    * vocabulary-wide aggregate; tf/dl read straight through the
    * pointer filter. */
  def readIndex(spark: SparkSession, storeDir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val rows = BatchStore.read(spark, storeDir)
    (rows.filter(col("kind") === "tf")
       .select(col("doc_id"), col("word"), col("n").as("tf")),
     rows.filter(col("kind") === "dl")
       .select(col("doc_id"), col("n").as("dl")),
     rows.filter(col("kind") === "df")
       .select(col("word"), col("n").as("df")))
  }

  /** BM25 top-k straight off the maintained store —
    * [[TextCorpus.bm25ScoreTopK]] over [[readIndex]]'s frames, so an
    * index that has lived through any number of refresh batches and
    * compactions serves the exact ranking of a from-scratch build. */
  def bm25Serve(spark: SparkSession, storeDir: String, queries: DataFrame,
                k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val (tf, dl, df) = readIndex(spark, storeDir)
    TextCorpus.bm25ScoreTopK(tf, dl, df, queries, k, k1, b)
  }

  /** Exact-phrase top-k straight off a POSITIONAL store
    * ([[maintainPostings]] with `positions = true`) —
    * [[TextCorpus.phraseMatchTopK]] over the pointer-filtered `tp`
    * rows, the same end-state-identity contract as [[bm25Serve]].
    * Fail-closed on a store without the positions marker: `tp` rows
    * would simply be absent and every phrase would silently match
    * nothing. */
  def phraseServe(spark: SparkSession, storeDir: String, queries: DataFrame,
                  k: Int): DataFrame = {
    require(hasPositions(spark, storeDir),
      s"$storeDir carries no positional postings (maintainPostings " +
        "positions = true) — refusing to phrase-match against nothing")
    val pos = BatchStore.read(spark, storeDir)
      .filter(col("kind") === "tp")
      .select(col("doc_id"), col("n").as("pos"), col("word"))
    TextCorpus.phraseMatchTopK(pos, queries, k)
  }
}
