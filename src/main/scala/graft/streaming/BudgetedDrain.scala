package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** Wall-clock-budgeted drain — the reference pipeline's time-budget
  * loop (its drain stops launching new work once ~285 s of budget are
  * spent and picks up where it left off on the next scheduled run:
  * reference `code-LLM-intergration.js:266`) re-expressed over
  * Structured Streaming's AvailableNow trigger.
  *
  * Semantics: let the drain run until either it exhausts the available
  * input (normal AvailableNow termination) or the budget elapses, in
  * which case the query is stopped. The checkpoint handoff is CLEAN by
  * construction, not by timing luck: every batch that committed before
  * the stop is the durable prefix, and if the stop lands mid-batch the
  * uncommitted batch is simply re-delivered on the next drain — which
  * is exactly the crash-replay path the per-batch overwrite sinks
  * ([[DedupStream]], [[IndexStream]], [[LateData]]) are already
  * idempotent against. A later drain with the same checkpoint resumes
  * precisely where this one left off (proven in StreamingSpec).
  *
  * No oracle gate: the cut point is timing-dependent by design (the
  * contract allows omission for non-deterministic operational
  * behavior); what IS deterministic — resume covers the remainder
  * exactly once, final state equals an unbudgeted drain — is spec'd.
  */
object BudgetedDrain {

  /** What a budgeted drain did. `finished` = the query drained all
    * available input and terminated on its own; `cut` = the budget
    * expired first and the query was stopped (resume later).
    * `lastCommittedBatchId` is -1 when no batch committed. */
  case class DrainReport(finished: Boolean, elapsedMs: Long,
                         lastCommittedBatchId: Long) {
    def cut: Boolean = !finished
  }

  /** Drive `query` (already started, AvailableNow-triggered) to
    * completion or budget exhaustion, whichever is first. Polls at
    * `pollMs`; the stop is issued from this thread, so the caller gets
    * back a fully-terminated query either way. */
  def await(query: StreamingQuery, budgetMs: Long,
            pollMs: Long = 25): DrainReport = {
    require(budgetMs >= 0, s"budgetMs: $budgetMs")
    val t0 = System.nanoTime()
    def elapsedMs: Long = (System.nanoTime() - t0) / 1000000L
    var cut = false
    while (query.isActive && !cut) {
      val remaining = budgetMs - elapsedMs
      if (remaining <= 0) {
        // Deadline: stop scheduling. An in-flight micro-batch is
        // interrupted WITHOUT committing — the next drain re-delivers
        // it, and the per-batch overwrite sink replaces (never
        // duplicates) any partial output it wrote. The committed
        // prefix is untouched: stop() cannot unwind a checkpoint
        // commit.
        query.stop()
        cut = true
      } else {
        Thread.sleep(math.min(pollMs, remaining).max(1L))
      }
    }
    if (!cut) query.awaitTermination()
    val lastCommitted = Option(query.lastProgress)
      .map(_.batchId).getOrElse(-1L)
    DrainReport(finished = !cut, elapsedMs = elapsedMs,
      lastCommittedBatchId = lastCommitted)
  }
}
