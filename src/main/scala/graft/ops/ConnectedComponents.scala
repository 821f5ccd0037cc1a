package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components by iterative min-label propagation —
  * the clustering step a dedup pipeline runs after near-dup pair
  * generation (MinHash/SimHash/embedding pairs → duplicate GROUPS, so one
  * survivor per cluster can be kept even when similarity is only
  * transitive: a~b, b~c, a≁c).
  *
  * Each round every vertex takes the min label among itself and its
  * neighbors; convergence is detected by the (strictly decreasing) sum of
  * labels going flat — one cheap aggregate per round, no row-level driver
  * work. Near-dup clusters have tiny diameter (duplicates of one source
  * document), so rounds ≈ 3-5 in practice; `maxIter` bounds adversarial
  * chains. Every round is two hash-shuffles (join + groupBy) on the
  * vertex id; the previous round's cache is dropped as soon as the next
  * materializes. For graphs with genuinely long chains at 100 TB, the
  * escalation is the large-star/small-star variant (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond"), which converges in
  * O(log²) rounds with the same per-round shuffle shape.
  */
object ConnectedComponents {

  /** `edges` must have two columns (u, v); vertices are whatever appears
    * in an edge. Returns (id, label) with label = min vertex id of the
    * component. Throws if `maxIter` rounds don't converge. */
  def run(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val u = col(edges.columns(0))
    val v = col(edges.columns(1))
    // both orientations from ONE pass over the (possibly expensive) edge
    // plan — a union of two selects would compute it twice
    val adj = edges
      .select(explode(array(
        struct(u.as("src"), v.as("dst")),
        struct(v.as("src"), u.as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // init fuses the first propagation round: label = min(self, neighbors).
    // Each round's plan references the previous labels TWICE (neighbor
    // join + merge join), so without lineage truncation the logical plan
    // doubles per round — exponential analysis cost by round ~15. Eager
    // localCheckpoint keeps the per-round plan flat and the data cached.
    var labels = adj.groupBy("src").agg(min("dst").as("nmin"))
      .select(col("src").as("id"), least(col("src"), col("nmin")).as("label"))
      .localCheckpoint()
    // sum over a cast-to-long label: one scan, null only on empty input
    def labelSum(df: DataFrame): Long = {
      val r = df.agg(sum(col("label").cast("long"))).head
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    var prevSum = labelSum(labels)
    var iter = 0
    var done = false
    while (!done) {
      if (iter >= maxIter)
        throw new IllegalStateException(
          s"connected components did not converge in $maxIter rounds")
      val nbrMin = adj.join(labels, adj("dst") === labels("id"))
        .groupBy(col("src")).agg(min("label").as("nbr_min"))
      val next = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label")))
            .as("label"))
        .localCheckpoint()
      val s = labelSum(next)
      labels = next
      done = s == prevSum // labels only decrease; flat sum == fixpoint
      prevSum = s
      iter += 1
    }
    adj.unpersist()
    labels
  }
}
