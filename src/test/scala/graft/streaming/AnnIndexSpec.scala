package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.similarity.Similarity

/** Contract of the versioned ANN index's retrain → re-encode →
  * atomic-swap lifecycle: a refreshed index equals a from-scratch
  * rebuild over the live corpus, a crash mid-rebuild leaves the old
  * version serving and a rerun converges, the replay fence kills
  * already-folded batches re-delivered across a swap, and refresh
  * fails closed on partial corpus coverage. The recall-improvement
  * story is gated end-to-end by `t19_quantizer_refresh`. */
class AnnIndexSpec extends SparkSpec {

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def emb: DataFrame =
    Tables.embeddings(spark, sf).select("vec_id", "embedding")

  private def serveSet(root: String, queries: DataFrame,
                       corpus: DataFrame): Set[(Long, Int, Long)] =
    AnnIndex.serve(spark, root, queries, corpus, k = 3, nprobe = 2)
      .select("query_id", "rank", "cand_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  private def initAt(corpus: DataFrame): String = {
    val root = tmp("annix")
    AnnIndex.init(spark, root, corpus, nlist = 4, lloydIters = 1)
    root
  }

  test("refresh equals a from-scratch rebuild over the live corpus") {
    val e = emb
    val root = initAt(e)
    val q = e.filter(col("vec_id") < 4)
    AnnIndex.refresh(spark, root, e, nlist = 4, lloydIters = 1)
    assert(AnnIndex.currentVersion(spark, root) === Some(2L))
    // a from-scratch v1 on the same corpus must serve identically —
    // refresh IS ivfBuildQuantized over the live read, nothing else
    val fresh = initAt(e)
    assert(serveSet(root, q, e) === serveSet(fresh, q, e))
  }

  test("crash mid-rebuild: staged version invisible, old serves, rerun " +
       "converges") {
    val e = emb
    val root = initAt(e)
    val q = e.filter(col("vec_id") < 4)
    val before = serveSet(root, q, e)
    // simulate a crash DURING staging: v=2 dirs exist, pointer untouched
    e.limit(3).write.mode("overwrite").parquet(s"$root/v=2/centroids")
    assert(AnnIndex.currentVersion(spark, root) === Some(1L))
    assert(serveSet(root, q, e) === before,
      "a crashed staging must not change any serve")
    // rerun overwrites the torn staging and publishes
    AnnIndex.refresh(spark, root, e, nlist = 4, lloydIters = 1)
    assert(AnnIndex.currentVersion(spark, root) === Some(2L))
    assert(serveSet(root, q, e).nonEmpty)
  }

  test("replay fence: a batch folded by refresh is dead on re-delivery " +
       "into the new version") {
    val e = emb
    val standing = e.filter(col("vec_id") % 4 =!= 0)
    val delta = e.filter(col("vec_id") % 4 === 0)
    val root = initAt(standing)
    // one maintenance batch lands as graft_batch=0 in v1
    IndexStream.encodeAgainst(delta, s"$root/v=1/centroids")
      .write.mode("overwrite").parquet(s"$root/v=1/lists/graft_batch=0")
    AnnIndex.refresh(spark, root, e, nlist = 4, lloydIters = 1)
    val served = IndexStream.readLists(spark, s"$root/v=2/lists")
    val total = served.count()
    // the crash-replay of batch 0 arrives AFTER the swap: its rows are
    // already folded into v2's base, and the fence (hwm pinned at seed)
    // must keep the duplicate dir invisible
    IndexStream.encodeAgainst(delta, s"$root/v=2/centroids")
      .write.mode("overwrite").parquet(s"$root/v=2/lists/graft_batch=0")
    assert(IndexStream.readLists(spark, s"$root/v=2/lists").count() === total,
      "replayed folded batch must be excluded by the pointer filter")
    assert(served.select("cand_id").distinct().count() === total,
      "no vector may be listed twice")
  }

  test("refresh fails closed on partial corpus coverage and carries " +
       "tombstones forward") {
    val e = emb
    val root = initAt(e)
    assertThrows[IllegalArgumentException] {
      AnnIndex.refresh(spark, root, e.filter(col("vec_id") % 2 === 0),
        nlist = 4, lloydIters = 1)
    }
    AnnIndex.delete(spark, root,
      e.filter(col("vec_id") % 7 === 0).select("vec_id"))
    AnnIndex.refresh(spark, root, e, nlist = 4, lloydIters = 1)
    // deleted vectors are physically absent from the rebuilt lists...
    val lists = spark.read
      .parquet(s"$root/v=2/lists/${BatchStore.BatchCol}=-2")
    assert(lists.filter(col("cand_id") % 7 === 0).count() === 0)
    // ...and the tombstone set traveled with the swap
    assert(BatchStore.hasDeletes(spark, s"$root/v=2/lists"))
  }

  test("maintain + serve equal the fixed-quantizer batch build") {
    val e = emb
    val standing = e.filter(col("vec_id") % 4 =!= 0)
    val delta = e.filter(col("vec_id") % 4 === 0)
    val root = initAt(standing)
    IndexStream.encodeAgainst(delta, s"$root/v=1/centroids")
      .write.mode("overwrite").parquet(s"$root/v=1/lists/graft_batch=0")
    val q = e.filter(col("vec_id") < 4)
    // reference: the one-shot build trained on standing, assignment over
    // everything (ivfServeQuantized over manually encoded full corpus)
    val (cent, _) = Similarity.ivfBuildQuantized(standing, nlist = 4,
      lloydIters = 1)
    val centDir = tmp("annixcent")
    cent.write.mode("overwrite").parquet(centDir)
    val want = Similarity.ivfServeQuantized(q,
        spark.read.parquet(centDir),
        IndexStream.encodeAgainst(e, centDir), e, 3, nprobe = 2,
        rescoreK = 6)
      .select("query_id", "rank", "cand_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val got = AnnIndex.serve(spark, root, q, e, k = 3, nprobe = 2,
        rescoreK = 6)
      .select("query_id", "rank", "cand_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === want)
  }
}
