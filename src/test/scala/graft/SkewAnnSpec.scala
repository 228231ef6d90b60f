package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Skew
import graft.llm.Ann

class SkewAnnSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("saltedAgg equals plain aggregation on a skewed key") {
    import spark.implicits._
    // 90% of rows share one key
    val rows = (1 to 2000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toDouble)
    }
    val df = rows.toDF("k", "v").repartition(8)
    val salted = Skew.saltedAgg(df, Seq("k"), 16)(
      partial = Seq(sum($"v").as("s"), count(lit(1)).as("n")),
      merge = Seq(sum($"s").as("s"), sum($"n").as("n")))
    val plain = df.groupBy($"k").agg(sum($"v").as("s"), count(lit(1)).as("n"))
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("saltedJoin equals plain join on skewed fact data") {
    import spark.implicits._
    val fact = (1 to 1000).map(i => (if (i % 5 == 0) i % 3 else 0, i))
      .toDF("k", "v")
    val dim = Seq((0, "zero"), (1, "one"), (2, "two")).toDF("k", "name")
    val salted = Skew.saltedJoin(fact, dim, "k", 8)
      .select("k", "v", "name")
    val plain = fact.join(dim, "k").select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("heavyHitters surfaces the hot key first") {
    import spark.implicits._
    val df = ((1 to 900).map(_ => "hot") ++ (1 to 100).map(i => s"k$i"))
      .toDF("k")
    val top = Skew.heavyHitters(df, Seq("k"), 1).collect()
    assert(top(0).getString(0) == "hot" && top(0).getLong(1) == 900)
  }

  test("IVF ANN recall vs brute force >= 0.6 at k=10") {
    import spark.implicits._
    val emb = graft.engine.Tables.embeddings(spark, sf)
    val probes = emb.filter($"vec_id" < 5)
    val exact = Ann.bruteForceTopK(emb, probes, 10)
      .select($"p_id", $"c_id").as[(Long, Long)].collect().toSet
    val ivf = Ann.ivfTopK(emb, probes, 10, nCells = 8, nProbe = 3)
      .select($"p_id", $"c_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall too low")
    // self-match must always be found (probe's own cell is its nearest)
    (0L until 5L).foreach(id => assert(ivf.contains((id, id))))
  }

  test("cosineNearDupPairs finds planted duplicate vectors") {
    import spark.implicits._
    val emb = graft.engine.Tables.embeddings(spark, sf).limit(100)
    // plant exact duplicates with shifted ids
    val dups = emb.filter($"vec_id" < 3)
      .select(($"vec_id" + 5000).as("vec_id"), $"embedding", $"label")
    val corpus = emb.unionByName(dups)
    val pairs = Ann.cosineNearDupPairs(corpus, minCosine = 0.99)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    (0L until 3L).foreach { id =>
      assert(pairs.contains((id, id + 5000)),
        s"planted dup ($id,${id + 5000}) missing; got ${pairs.take(10)}")
    }
  }
}
