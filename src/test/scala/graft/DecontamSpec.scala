package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Two-phase bloom decontamination (graft.llm.Decontam): the prefilter
  * must be invisible in the results (false positives die in the exact
  * join, false negatives are impossible), and the planted contaminated
  * docs must always surface. */
class DecontamSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("bloom-prefiltered overlap equals the plain equi-join exactly") {
    val plain = graft.operators.PipelineOps.qDecontam.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val bloom = graft.operators.PipelineOps.qDecontamBloom.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(plain.nonEmpty, "decontam oracle query returned no overlaps")
    assert(bloom.toSeq == plain.toSeq)
  }

  test("every planted contaminated doc is flagged with full overlap") {
    // shifted-id copies of benchmark docs (doc_id >= 1000000) share ALL
    // their grams with the benchmark by construction
    val flagged = graft.operators.PipelineOps.qDecontamBloom.run(spark, sf)
      .filter(col("doc_id") >= 1000000L)
    val planted = graft.engine.Tables.documents(spark, sf)
      .filter(col("doc_id") < 20)
      .filter(size(split(col("text"), " ")) >= 5)
      .count()
    assert(flagged.count() == planted,
      s"expected $planted planted docs flagged")
  }
}
