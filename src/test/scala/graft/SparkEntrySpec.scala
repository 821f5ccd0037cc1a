package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants over the merged query surface. The module
  * maps merge with `++`, so a name collision between two modules would
  * silently shadow one query — and its oracle would then gate the wrong
  * plan. */
class SparkEntrySpec extends AnyFunSuite {

  private val modules = Seq(
    "Star" -> graft.queries.StarQueries,
    "Etl" -> graft.queries.EtlQueries,
    "Text" -> graft.queries.TextQueries,
    "Dedup" -> graft.queries.DedupQueries,
    "Similarity" -> graft.queries.SimilarityQueries,
    "Multimodal" -> graft.queries.MultimodalQueries,
    "Streaming" -> graft.queries.StreamingQueries,
    "Pipeline" -> graft.queries.PipelineQueries,
    "Function" -> graft.queries.FunctionQueries,
    "Temporal" -> graft.queries.TemporalQueries,
    "Sampling" -> graft.queries.SamplingQueries,
    "Hygiene" -> graft.queries.HygieneQueries,
    "Ingest" -> graft.queries.IngestQueries,
    "Sink" -> graft.queries.SinkQueries,
    "Graph" -> graft.queries.GraphQueries,
    "Probe" -> graft.queries.ProbeQueries,
    "Incremental" -> graft.queries.IncrementalQueries,
    "StreamGate" -> graft.queries.StreamGateQueries,
    "Selection" -> graft.queries.SelectionQueries)

  test("no query name is defined by two modules") {
    val names = modules.flatMap { case (m, q) => q.all.keys.map(_ -> m) }
    val dup = names.groupBy(_._1).filter(_._2.size > 1)
    assert(dup.isEmpty, s"shadowed query names: $dup")
    assert(SparkEntry.queries.size == names.size)
  }

  test("every oracle key names an existing query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query is oracle-gated (the sketch gates its error contract)") {
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"queries without oracles: $unoracled")
  }
}
