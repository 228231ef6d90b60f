package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.llm.{Ann, NearDup}

/** Non-oracle LLM ops: MinHash-LSH / SimHash near-dup and LSH ANN are
  * validated against exact small-N computations (the same role DuckDB
  * plays for the declared queries). */
class LlmSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def docsWithPlantedDups = {
    import spark.implicits._
    val base = graft.engine.Tables.documents(spark, sf)
      .select($"doc_id", $"text").limit(50)
    // plant near-dups: copy with a single appended token
    val nearDups = base.filter($"doc_id" < 5)
      .select(($"doc_id" + 10000).as("doc_id"),
        concat($"text", lit(" extraword")).as("text"))
    base.unionAll(nearDups)
  }

  test("incremental near-dup matches the batch against the corpus only") {
    import spark.implicits._
    val corpus = graft.engine.Tables.documents(spark, sf)
      .select($"doc_id", $"text")
    // batch: 15 exact copies of corpus docs + 5 novel docs sharing no
    // 3-gram with anything (distinct synthetic vocab per doc)
    val copies = corpus.filter($"doc_id" < 15)
      .select(($"doc_id" + 900000L).as("doc_id"), $"text")
    val novel = (0 until 5).map { i =>
      (900100L + i, (0 until 30).map(j => s"zz${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val batch = copies.unionByName(novel)

    val pairs = NearDup.incrementalNearDups(batch, corpus, minJaccard = 0.8)
      .select($"new_id", $"corpus_id", $"jaccard")
      .as[(Long, Long, Double)].collect()
    // every pair is batch x corpus by construction
    pairs.foreach { case (n, c, _) =>
      assert(n >= 900000L && c < 900000L, s"non-incremental pair ($n, $c)")
    }
    // all 15 planted copies surface at jaccard 1.0
    (0L until 15L).foreach { id =>
      val hit = pairs.find(p => p._1 == id + 900000L && p._2 == id)
      assert(hit.exists(_._3 == 1.0), s"planted copy $id missing: $hit")
    }
    // novel docs pair with nothing
    assert(!pairs.exists(_._1 >= 900100L), s"novel doc paired: ${pairs.toSeq}")

    // the precomputed-signature path (the lake-table workflow) is
    // identical to recomputing corpus signatures inline
    val sigs = NearDup.bandedSignatures(corpus)
    val viaSigs = NearDup
      .incrementalNearDups(batch, corpus, corpusSigs = Some(sigs),
        minJaccard = 0.8)
      .select($"new_id", $"corpus_id", $"jaccard")
      .as[(Long, Long, Double)].collect()
    assert(viaSigs.sorted.toSeq == pairs.sorted.toSeq)
  }

  test("per-row banded signatures equal the aggregated construction exactly") {
    import spark.implicits._
    val docs = graft.engine.Tables.documents(spark, sf).select($"doc_id", $"text")
    val viaAgg = NearDup.bandedSignatures(docs)
      .as[(Long, Int, String)].collect().toSet
    val perRow = NearDup.bandedSignaturesPerRow(docs)
      .as[(Long, Int, String)].collect().toSet
    assert(perRow == viaAgg,
      s"diff: ${(perRow diff viaAgg).take(3)} / ${(viaAgg diff perRow).take(3)}")
    assert(perRow.nonEmpty)
  }

  test("MinHashLSH pairs every planted near-duplicate") {
    import spark.implicits._
    val pairs = NearDup.minHashPairs(docsWithPlantedDups, minJaccard = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    (0L until 5L).foreach { id =>
      assert(pairs.contains((id, id + 10000)),
        s"planted pair ($id, ${id + 10000}) not found; got ${pairs.take(10)}")
    }
  }

  test("MinHash jaccard distance approximates exact n-gram jaccard") {
    import spark.implicits._
    val docs = docsWithPlantedDups
    val lsh = NearDup.minHashPairs(docs, minJaccard = 0.3)
      .filter($"id_b" === $"id_a" + 10000)
      .select($"id_a", (lit(1.0) - $"jaccard_dist").as("est")).collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val est = r.getDouble(1)
      assert(est > 0.5 && est <= 1.0, s"implausible jaccard estimate $est")
    }
  }

  test("SimHash: identical texts collide, near-dups within small hamming") {
    import spark.implicits._
    val hashes = NearDup.simHash(docsWithPlantedDups)
    val joined = hashes.as("a").join(hashes.as("b"),
        col("b.id") === col("a.id") + 10000)
      .select(NearDup.hamming(col("a.simhash"), col("b.simhash")).as("d"))
      .as[Long].collect()
    assert(joined.length == 5)
    // one appended token on ~40-token docs flips few bits
    joined.foreach(d => assert(d <= 12, s"hamming $d too large for near-dup"))

    val exact = hashes.as("a").join(hashes.as("b"), col("b.id") === col("a.id"))
      .select(NearDup.hamming(col("a.simhash"), col("b.simhash")).as("d"))
      .as[Long].collect()
    assert(exact.forall(_ == 0))
  }

  test("simHashPairs surfaces planted near-dups via banding") {
    import spark.implicits._
    val pairs = NearDup.simHashPairs(
      NearDup.simHash(docsWithPlantedDups), maxHamming = 12)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val found = (0L until 5L).count(id => pairs.contains((id, id + 10000)))
    // banding guarantees recall only for hamming<=3; expect most planted
    // pairs found at these doc sizes
    assert(found >= 3, s"only $found/5 planted pairs found: $pairs")
  }

  test("ngramJaccardPairs matches a hand-computed pair") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d x"),
      (3L, "zz yy xx ww vv")).toDF("doc_id", "text")
    val out = NearDup.ngramJaccardPairs(docs, n = 3)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)]
      .collect().map { case (a, b, j) => (a, b) -> j }.toMap
    // 3-grams doc1: {abc,bcd,cde}; doc2: {abc,bcd,cdx} → inter 2, union 4
    assert(math.abs(out((1L, 2L)) - 0.5) < 1e-9)
    assert(!out.contains((1L, 3L)))
  }

  test("LSH ANN recall vs brute force >= 0.6 at k=10") {
    import spark.implicits._
    val emb = graft.engine.Tables.embeddings(spark, sf)
    val probes = emb.filter($"vec_id" < 5)
    val exact = Ann.bruteForceTopK(emb, probes, 10)
      .select($"p_id", $"c_id").as[(Long, Long)].collect().toSet
    val approx = Ann.lshTopK(emb, probes, 10)
      .select($"p_id", $"c_id").as[(Long, Long)].collect().toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.6, s"ANN recall $recall too low")
  }
}
