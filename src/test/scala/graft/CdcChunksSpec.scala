package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.PipelineOps

/** The fused [[graft.functions.CdcChunks]] kernel must be row-for-row
  * equal to the relational CDC chunk-digest stage the DuckDB oracle
  * states (token explode → boundary flag → window cumsum → chunk
  * re-assembly → ≥5-token filter → per-doc distinct digests) — on the
  * organic fixture, on the planted prefix-edited clones, and on crafted
  * boundary-edge docs. The fixture run exercises the CODEGEN path.
  */
class CdcChunksSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def key(df: DataFrame): Set[(Long, String, Long)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  private def both(docs: DataFrame)
      : (Set[(Long, String, Long)], Set[(Long, String, Long)]) = (
    key(PipelineOps.cdcChunkDigests(docs)
      .select(col("doc_id"), col("ch"), col("tok"))),
    key(PipelineOps.cdcChunkDigestsRelational(docs)
      .select(col("doc_id"), col("ch"), col("tok"))))

  test("fused kernel == relational reference on fixture + plants") {
    import spark.implicits._
    val base = graft.engine.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
    val docs = base.unionByName(
      base.filter($"doc_id" < 25)
        .select(($"doc_id" + 430000L).as("doc_id"),
          concat(lit("zq zr "), $"text").as("text")))
    val (fused, rel) = both(docs)
    assert(fused == rel,
      s"diff: ${(fused diff rel).take(3)} / ${(rel diff fused).take(3)}")
    assert(fused.size > 400, s"suspiciously few chunks: ${fused.size}")
  }

  test("fused kernel == relational reference on crafted edge docs") {
    import spark.implicits._
    // find one token that IS a boundary and one that is not, so the
    // crafted docs provably exercise boundary-at-end / run-without-
    // boundary / short-chunk-floor paths in both forms
    val probe = (1 to 200).map(i => s"w$i")
    val isB: String => Boolean = t => {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      val v = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      v % 8 == 0
    }
    val b = probe.find(isB).get
    val nb = probe.filterNot(isB).take(12)
    val docs = Seq(
      (1L, ""),                                     // 1 empty token
      (2L, nb.take(4).mkString(" ")),               // 4 tokens, no boundary -> floor
      (3L, nb.take(5).mkString(" ")),               // 5 tokens, trailing chunk
      (4L, (nb.take(5) :+ b).mkString(" ")),        // boundary ends 6-token chunk
      (5L, (nb.take(5) ++ Seq(b) ++ nb.slice(5, 10)).mkString(" ")), // two chunks
      (6L, Seq(b, b, b).mkString(" ")),             // all-boundary, all short
      (7L, (nb.take(5) ++ Seq(b) ++ nb.take(5) ++ Seq(b)).mkString(" ")), // dup chunk
      (8L, (Seq(b) ++ nb.take(7)).mkString(" "))    // leading boundary
    ).toDF("doc_id", "text")
    val (fused, rel) = both(docs)
    assert(fused == rel,
      s"diff: ${(fused diff rel).take(5)} / ${(rel diff fused).take(5)}")
    // doc 7's duplicated 6-token chunk must collapse to ONE digest row
    assert(fused.count(_._1 == 7L) == 1)
  }
}
