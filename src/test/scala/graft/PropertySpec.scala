package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.KeyedModels

/** Property tests (SURVEY.md §5.2): algebraic invariants of the pure
  * kernels, plus small-cardinality Spark algebra checks. Generators are
  * driven with fixed seeds (no scalatestplus bridge in the offline
  * cache), so failures are reproducible by seed index. */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("solveNormal solves random well-conditioned systems") {
    val gen = for {
      d <- Gen.choose(1, 5)
      beta <- Gen.listOfN(d, Gen.choose(-5.0, 5.0))
    } yield (d, beta)
    samples(gen, 25).foreach { case (d, beta) =>
      val rng = new scala.util.Random(d * 1000 + beta.hashCode())
      val n = 50 + d * 10
      val xs = Array.fill(n)(Array.fill(d)(rng.nextDouble() * 4 - 2))
      val ys = xs.map(x => x.zip(beta).map { case (a, b) => a * b }.sum)
      val tri = Array.ofDim[Double](d * (d + 1) / 2)
      val xty = Array.ofDim[Double](d)
      xs.zip(ys).foreach { case (x, y) =>
        var idx = 0
        for (i <- 0 until d) {
          for (j <- i until d) { tri(idx) += x(i) * x(j); idx += 1 }
          xty(i) += x(i) * y
        }
      }
      val got = KeyedModels.solveNormal(d, tri, xty)
      got.zip(beta).foreach { case (g, b) =>
        assert(math.abs(g - b) < 1e-6, s"d=$d beta=$beta got=${got.toSeq}")
      }
    }
  }

  test("dedup by hash is idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    samples(Gen.listOfN(30, Gen.oneOf("aa bb", "cc dd", "ee ff", "aa bb ")), 5)
      .foreach { texts =>
        val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val once = df.groupBy(sha2($"text", 256).as("h"))
          .agg(min($"doc_id").as("keep"))
        val twice = once.groupBy($"h").agg(min($"keep").as("keep"))
        assert(once.count() == twice.count())
        assert(once.exceptAll(twice.select($"h", $"keep")).count() == 0)
      }
  }

  test("set algebra: (A union B) except B has no B rows; intersect subsets") {
    import spark.implicits._
    val genSet = Gen.listOfN(12, Gen.choose(0, 8))
    samples(Gen.zip(genSet, genSet), 5).foreach { case (as, bs) =>
      val a = as.toDF("v"); val b = bs.toDF("v")
      val exceptB = a.unionAll(b).except(b)
      assert(exceptB.intersect(b).count() == 0)
      val inter = a.intersect(b)
      assert(inter.except(a).count() == 0 && inter.except(b).count() == 0)
      assert(exceptB.except(a.distinct()).count() == 0)
    }
  }

  test("simhash hamming: identity is 0, symmetric, bounded by 64") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val gen = Gen.listOfN(8, Gen.listOfN(6,
      Gen.oneOf("tok1", "tok2", "tok3", "tok4", "zz")).map(_.mkString(" ")))
    samples(gen, 3).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val h = graft.llm.NearDup.simHash(df)
      val pairs = h.as("a").crossJoin(h.as("b"))
        .select(col("a.id").as("ia"), col("b.id").as("ib"),
          graft.llm.NearDup.hamming(col("a.simhash"), col("b.simhash")).as("d"))
        .collect().map(r =>
          (r.getLong(0), r.getLong(1)) -> r.getAs[Number](2).longValue).toMap
      pairs.foreach { case ((ia, ib), d) =>
        assert(d >= 0 && d <= 64)
        assert(pairs((ib, ia)) == d, "hamming must be symmetric")
        if (ia == ib) assert(d == 0)
      }
    }
  }

  test("mergeByKey: idempotent, identity on empty updates, batch-split invariant") {
    import spark.implicits._
    import graft.operators.Upsert.mergeByKey
    val gen = for {
      base <- Gen.listOfN(12, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 9L)))
      ups <- Gen.listOfN(10, Gen.zip(Gen.choose(0L, 5L), Gen.choose(10L, 19L)))
    } yield (base, ups)
    samples(gen, 5).foreach { case (baseRows, upRows) =>
      // distinct versions per key so latest-wins is unambiguous
      def mk(rows: Seq[(Long, Long)]) = rows.zipWithIndex
        .map { case ((k, v), i) => (k, v * 100 + i, s"p$i") }
        .toDF("id", "version", "payload")
      val base = mk(baseRows)
      val ups = mk(upRows.distinct)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("id", "version", "payload").collect().toSeq

      val once = mergeByKey(base, ups, Seq("id"), "version")
      // idempotent: applying the same updates again changes nothing
      assert(canon(mergeByKey(once, ups, Seq("id"), "version")) == canon(once))
      // identity on a compacted snapshot: empty updates change nothing
      // (on a raw multi-version base, merge IS the compaction)
      val snap = mergeByKey(base, base.limit(0), Seq("id"), "version")
      assert(canon(mergeByKey(snap, base.limit(0), Seq("id"), "version")) ==
        canon(snap))
      // batch-split invariance: applying updates in two batches equals one
      val (u1, u2) = (ups.filter($"id" % 2 === 0), ups.filter($"id" % 2 === 1))
      val split = mergeByKey(mergeByKey(base, u1, Seq("id"), "version"),
        u2, Seq("id"), "version")
      assert(canon(split) == canon(once))
    }
  }

  test("aggState: incremental delta merges equal from-scratch aggregation") {
    import spark.implicits._
    import graft.operators.Upsert.{aggState, mergeAggState}
    val gen = Gen.listOfN(3, Gen.listOfN(15,
      Gen.zip(Gen.choose(0L, 4L), Gen.choose(-1000, 1000))))
    samples(gen, 5).foreach { batches =>
      def mk(rows: Seq[(Long, Int)]) = rows
        .map { case (k, v) => (k, v / 100.0, v) }.toDF("id", "x", "y")
      def st(df: org.apache.spark.sql.DataFrame) =
        aggState(df, Seq("id"), sumCols = Seq("x"), minMaxCols = Seq("y"))
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("id").collect().toSeq
      val Seq(b0, b1, b2) = batches.map(mk)
      // incremental: state(b0) ⊕ state(b1) ⊕ state(b2)
      val inc = mergeAggState(
        mergeAggState(st(b0), st(b1), Seq("id")), st(b2), Seq("id"))
      // from scratch over the union, and in a different merge order
      val scratch = st(b0.unionByName(b1).unionByName(b2))
      val reord = mergeAggState(
        st(b0), mergeAggState(st(b2), st(b1), Seq("id")), Seq("id"))
      assert(canon(inc) == canon(scratch))
      assert(canon(reord) == canon(scratch))
    }
  }
}
