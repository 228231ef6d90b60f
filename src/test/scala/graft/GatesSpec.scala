package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Single-pass observability (graft.engine.Gates) and bad-record
  * quarantine ingest (Sources.readJsonQuarantine) — the two operational
  * seams of a 100 TB load: metrics must ride the action (no audit
  * re-scan), and corrupt rows must divert, not kill the job. */
class GatesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("observedFilter meters rows_in/rows_kept in the same pass") {
    import spark.implicits._
    val docs = graft.engine.Tables.documents(spark, sf)
    val keep = length($"text") > 100
    val (gated, obs) = graft.engine.Gates.observedFilter(docs, keep)
    val written = gated.count() // the one action; metrics ride it
    val m = obs.get
    assert(m("rows_in") == docs.count())
    assert(m("rows_kept") == written)
    assert(m("rows_kept") == docs.filter(keep).count())
  }

  test("two default-named gates stack in one query (auto-unique names)") {
    import spark.implicits._
    val docs = graft.engine.Tables.documents(spark, sf)
    // Duplicate observed-metric names fail at analysis time; defaulted
    // names must therefore be per-call unique or this pipeline can't form.
    val (g1, o1) = graft.engine.Gates.observedFilter(docs, length($"text") > 100)
    val (g2, o2) = graft.engine.Gates.observedFilter(g1, $"lang" === "en")
    val out = g2.count()
    assert(o1.get("rows_kept") == o2.get("rows_in"))
    assert(o2.get("rows_kept") == out)
  }

  test("observedNullAudit reports per-column null counts with the job") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some(1.0)), (2L, None, Some(2.0)),
      (3L, Some("c"), None), (4L, None, None)
    ).toDF("id", "s", "x")
    val (instrumented, obs) =
      graft.engine.Gates.observedNullAudit(df, Seq("s", "x"))
    instrumented.count()
    val m = obs.get
    assert(m("rows") == 4L)
    assert(m("nulls_s") == 2L)
    assert(m("nulls_x") == 2L)
  }

  test("readJsonQuarantine diverts malformed rows instead of failing the load") {
    val dir = java.nio.file.Files.createTempDirectory("quarantine")
    java.nio.file.Files.writeString(dir.resolve("feed.json"),
      """{"doc_id": 1, "n_chars": 10}
        |{"doc_id": 2, "n_chars": "not_a_number"}
        |{"doc_id": 3, "n_chars": 30}
        |this is not json at all
        |{"doc_id": 5, "n_chars": 50}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, n_chars BIGINT")
    val (clean, quarantined, raw) = graft.sources.Sources
      .readJsonQuarantineCached(spark, dir.toString, schema)
    assert(clean.count() == 3)
    assert(clean.columns.toSeq == Seq("doc_id", "n_chars"))
    assert(quarantined.count() == 2)
    val raws = quarantined.collect().map(_.getString(0))
    assert(raws.exists(_.contains("not_a_number")))
    assert(raws.exists(_.contains("not json at all")))
    // clean rows parsed with full fidelity
    val kept = clean.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept == Set((1L, 10L), (3L, 30L), (5L, 50L)))
    // the returned handle releases the load-bearing cache after the writes
    assert(raw.storageLevel.useMemory)
    raw.unpersist(blocking = true)
    assert(!raw.storageLevel.useMemory)
  }
}
