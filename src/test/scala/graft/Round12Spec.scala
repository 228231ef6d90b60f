package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Invariant pins for the round-12 declared queries — properties the
  * shared-formula DuckDB oracle cannot see: accounting identities,
  * planted-row guarantees, budget conservation, and the full-corpus _xl
  * twins' containment relationships to their bounded originals.
  */
class Round12Spec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def rows(q: String): Array[Row] =
    SparkEntry.queries(q)(spark, sf).collect()

  test("q_curation_budget: gate accounting, plants dropped, budget conserved") {
    val r = rows("q_curation_budget")
    assert(r.nonEmpty, "no sources")
    r.foreach { x =>
      val (n, nq, ns, nk) =
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))
      assert(nk <= nq && nq <= n, s"quality chain broken: $nk <= $nq <= $n")
      assert(nk <= ns && ns <= n, s"dedup chain broken: $nk <= $ns <= $n")
      assert(math.abs(x.getDouble(5) - nk.toDouble / n) < 2e-6)
      val budget = x.getLong(7)
      assert(budget >= 0)
      if (nk > 0)
        assert(math.abs(x.getDouble(8) - budget.toDouble / nk) < 2e-6)
      else assert(x.getDouble(8) == 0.0)
    }
    // plants: 15 same-text clones + 9 of the 10 identical junk docs must
    // fall to keep-first dedup (organic dups only add)
    val dupDrops = r.map(x => x.getLong(1) - x.getLong(3)).sum
    assert(dupDrops >= 24, s"expected >= 24 dedup drops, got $dupDrops")
    // the 10 all-digit junk docs all fail the letter/stopword rules
    val qualDrops = r.map(x => x.getLong(1) - x.getLong(2)).sum
    assert(qualDrops >= 10, s"expected >= 10 quality drops, got $qualDrops")
    // mixture weights sum to 1 and the 100k budget is conserved up to
    // per-source half-ulp rounding
    val wSum = r.map(_.getDouble(6)).sum
    assert(math.abs(wSum - 1.0) < 2e-5, s"weights sum to $wSum")
    val bSum = r.map(_.getLong(7)).sum
    assert(math.abs(bSum - 100000L) <= r.length,
      s"budget $bSum strays from 100000 by more than 1/source")
  }

  test("q_model_gate: rate identity, organic corpus splits both ways") {
    val r = rows("q_model_gate")
    assert(r.nonEmpty)
    var keeps = 0L; var docs = 0L
    r.foreach { x =>
      val (n, nk) = (x.getLong(1), x.getLong(2))
      assert(nk >= 0 && nk <= n)
      assert(math.abs(x.getDouble(3) - nk.toDouble / n) < 2e-6)
      keeps += nk; docs += n
    }
    assert(keeps > 0, "gate dropped everything")
    assert(keeps < docs, "gate kept everything — threshold proves nothing")
  }

  test("_xl twins contain their bounded originals' planted findings") {
    // same plants, superset corpus: every planted near-dup pair found on
    // the 500-doc slice must still be found on the full corpus
    val small = rows("q_neardup_minhash")
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val xl = rows("q_neardup_minhash_xl")
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(small.subsetOf(xl),
      s"xl lost pairs: ${(small -- xl).take(5)}")
    // both carry the 50 planted identical clones
    assert(small.count { case (a, b) => b == a + 1000000L } == 50)
    assert(xl.count { case (a, b) => b == a + 1000000L } == 50)

    // band sweep: candidacy still nests at full corpus
    val sweep = rows("q_band_sweep_xl").sortBy(_.getInt(0))
    assert(sweep.length == 3)
    val cand = sweep.map(_.getLong(2))
    assert(cand(0) <= cand(1) && cand(1) <= cand(2), "xl nesting violated")

    // semdedup: the 25 planted identical vectors are still dropped
    val sd = rows("q_semdedup_xl")
    assert(sd.map(_.getLong(2)).sum >= 25, "xl lost planted drops")
    sd.foreach { x =>
      assert(math.abs(x.getDouble(3) -
        x.getLong(2).toDouble / x.getLong(1)) < 2e-6)
    }

    // ann_ivf: 5 probes, each finds itself at rank 1 with cos 1
    val ivf = rows("q_ann_ivf_xl").filter(_.getInt(4) == 1)
    assert(ivf.length == 5)
    ivf.foreach { x =>
      assert(x.getLong(0) == x.getLong(1), "self not top-1 at xl")
      assert(x.getDouble(3) == 1.0)
    }
  }

  test("q_ivfadc: candidates bounded by probed cells, recall identity") {
    val r = rows("q_ivfadc")
    assert(r.length == 5, "one row per probe")
    r.foreach { x =>
      val (nc, ov, rec) = (x.getLong(1), x.getLong(2), x.getDouble(3))
      // nProbe=2 of 9 cells: candidates are a strict corpus subset and
      // never empty (the probe's own cell is always probed)
      assert(nc > 0 && nc < 500, s"n_cand $nc outside (0, 500)")
      assert(ov >= 0 && ov <= 10)
      assert(math.abs(rec - ov / 10.0) < 2e-6)
    }
    // the ADC ranking must beat a dead index: some probe recovers some
    // exact neighbor (10-codeword residual PQ on unstructured vectors is
    // coarse — per-probe floors would overfit the fixture)
    assert(r.map(_.getLong(2)).sum >= 1, "ADC recovered nothing")
  }
}
