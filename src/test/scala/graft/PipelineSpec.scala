package graft

import org.apache.spark.sql.functions._

/** The composed corpus-build pipeline (q100): stage arithmetic and plan
  * shape. Value-level correctness against DuckDB is the driver gate's
  * job; these tests pin the invariants the gate can't see — stage
  * monotonicity against the standalone queries the pipeline composes,
  * and the absence of any all-pairs plan.
  */
class PipelineSpec extends SparkSpec {

  private def q100 = SparkEntry.queries("q100_corpus_pipeline")(spark, sfDir)

  test("q100 emits only valid splits and positive counts") {
    val rows = q100.collect()
    assert(rows.nonEmpty)
    val splits = rows.map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    assert(rows.forall(_.getLong(2) > 0), "empty (split, lang) group emitted")
    assert(rows.forall(r => r.getLong(3) >= 10 * r.getLong(2)),
      "a surviving doc has fewer than the quality gate's 10-token floor")
  }

  test("q100 survivor count is bounded by each upstream stage's output") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val total = docs.count()
    val distinctTexts = docs.select("text").distinct().count()
    // q22 = exact dedup of the WHOLE corpus (no quality gate), q91 =
    // quality pass of the whole corpus; the pipeline applies both, so
    // its survivor count is ≤ each standalone stage's count
    val exactSurvivors = SparkEntry.queries("q22_dedup")(spark, sfDir)
      .agg(sum("n_docs")).first().getLong(0)
    val qualityPass = SparkEntry.queries("q91_quality_filter")(spark, sfDir)
      .agg(sum("n_pass")).first().getLong(0)
    val pipelineSurvivors = q100.agg(sum("n_docs")).first().getLong(0)
    assert(exactSurvivors == distinctTexts)
    assert(pipelineSurvivors <= exactSurvivors)
    assert(pipelineSurvivors <= qualityPass)
    assert(pipelineSurvivors <= total)
    assert(pipelineSurvivors > 0)
  }

  test("q100 plan: no cartesian or broadcast-nested-loop join anywhere") {
    val p = q100.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }
}
