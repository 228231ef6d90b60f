package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** `graft.functions.registerAllFunctions` must make every kernel
  * callable by its SQL name in one shot — the library user's entry
  * point. One smoke row through each function; deep semantics live in
  * the per-kernel specs.
  */
class FunctionsBundleSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  test("all nine kernels callable from SQL after one registration call") {
    graft.functions.registerAllFunctions(spark)
    import spark.implicits._
    val r = Seq(("a b c a b c d e f g h i j", Seq(1.0, 2.0), Seq(3.0, 4.0)))
      .toDF("text", "va", "vb")
      .selectExpr(
        "dot_product(va, vb) AS dp",
        "cosine_sim(va, vb) AS cs",
        "ngram_stats(split(text, ' '), 2) AS ns",
        "size(ngram_digests(split(text, ' '), 2)) AS nd",
        "size(word_grams(split(text, ' '), 3)) AS wg",
        "repetition_stats(text) AS rs",
        "size(minhash_sig(split(text, ' '))) AS mh",
        "size(cdc_chunks(split(text, ' '))) AS cc",
        "size(window_digests(split(text, ' '), 5)) AS wd")
      .collect()(0)
    val ns = r.getSeq[Long](r.fieldIndex("ns"))
    assert(math.abs(r.getAs[Double]("dp") - 11.0) < 1e-9)
    assert(r.getAs[Double]("cs") > 0.9)
    // 13 tokens -> 12 bigrams, 10 distinct ("a b"/"b c" repeat)
    assert(ns.toList == List(12L, 10L), ns.toString)
    assert(r.getAs[Int]("nd") == 10)
    assert(r.getAs[Int]("wg") > 0 && r.getAs[Int]("mh") == 16)
    assert(r.getSeq[Long](r.fieldIndex("rs")).length == 9)
    assert(r.getAs[Int]("cc") >= 0 && r.getAs[Int]("wd") == 13 - 5 + 1)
  }
}
