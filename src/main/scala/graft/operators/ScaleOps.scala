package graft.operators

import org.apache.spark.sql.functions._
import graft.engine.{GQuery, Tables}

/** Scale-path operators DECLARED without a SQL oracle (SURVEY.md §2.B.8 ◻
  * set promoted to the t2 surface): MinHash-LSH / SimHash near-dup, LSH and
  * IVF approximate nearest neighbor, HLL approximate distinct. None are
  * ANSI-SQL-expressible (sketches + hash-family randomness), so the driver
  * records the weaker rows-only check for them — their VALUE correctness is
  * covered by unit/property specs (LlmSpec, SkewAnnSpec: planted-duplicate
  * recall, LSH/IVF recall vs brute force, HLL ±5% vs exact).
  *
  * Queries plant guaranteed duplicates (shifted-id unions) so the rows-only
  * gate can never pass vacuously on 0 rows.
  *
  * The heavy ones (LSH fits, KMeans quantizer) carry `bench = false`: they
  * stay out of the headline timing loop but remain driver-visible and
  * smoke-checked.
  */
object ScaleOps {

  /** Declared pair generators run on a BOUNDED corpus slice (500 docs +
    * 50 planted duplicates): the t2 dump is a smoke check of the operator
    * wiring, not a scale benchmark, and an unbounded LSH self-join at
    * larger SFs costs minutes of Verify wall-time for no additional
    * signal. The unbounded scale path is the NearDup library itself
    * (LlmSpec recall tests + SURVEY §2.B.8). */
  private val corpusBound = 500L

  /** MinHash-LSH near-duplicate candidate pairs over documents with 50
    * planted exact duplicates (shifted ids) — every planted pair must
    * surface, so rows ≥ 50. */
  val qNeardupMinhash: GQuery = GQuery(
    "q_neardup_minhash",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir).filter(col("doc_id") < corpusBound)
      val planted = docs.filter(col("doc_id") < 50)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      graft.llm.NearDup.minHashPairs(docs.unionByName(planted), minJaccard = 0.7)
        .orderBy(col("id_a"), col("id_b"))
    },
    oracle = None,
    bench = false,
  )

  /** SimHash near-duplicate pairs (64-bit fingerprint, Hamming ≤ 3) over
    * the same planted-duplicate corpus. */
  val qNeardupSimhash: GQuery = GQuery(
    "q_neardup_simhash",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir).filter(col("doc_id") < corpusBound)
      val planted = docs.filter(col("doc_id") < 50)
        .withColumn("doc_id", col("doc_id") + 1000000L)
      val hashes = graft.llm.NearDup.simHash(docs.unionByName(planted))
      graft.llm.NearDup.simHashPairs(hashes, maxHamming = 3)
        .orderBy(col("id_a"), col("id_b"))
    },
    oracle = None,
    bench = false,
  )

  /** LSH approximate nearest neighbor: top-5 per probe via
    * BucketedRandomProjectionLSH on normalized vectors. */
  val qAnnLsh: GQuery = GQuery(
    "q_ann_lsh",
    (spark, dir) => {
      val emb = Tables.embeddings(spark, dir).filter(col("vec_id") < corpusBound)
      graft.llm.Ann.lshTopK(emb, emb.filter(col("vec_id") < 5), k = 5)
        .orderBy(col("p_id"), col("rnk"))
    },
    oracle = None,
    bench = false,
  )

  /** IVF approximate nearest neighbor: KMeans coarse quantizer, nProbe
    * cells searched, exact cosine re-rank of candidates. */
  val qAnnIvf: GQuery = GQuery(
    "q_ann_ivf",
    (spark, dir) => {
      val emb = Tables.embeddings(spark, dir).filter(col("vec_id") < corpusBound)
      graft.llm.Ann.ivfTopK(emb, emb.filter(col("vec_id") < 5), k = 5)
        .orderBy(col("p_id"), col("rnk"))
    },
    oracle = None,
    bench = false,
  )

  /** HLL approximate distinct counts per group — the sketch that replaces
    * exact distinct at 100 TB (constant memory per group vs a full hash
    * set). Values are approximate (ApproxSpec bounds the error at ±5% vs
    * exact), so no hash oracle; the row shape is deterministic. */
  val qApproxDistinct: GQuery = GQuery(
    "q_approx_distinct",
    (spark, dir) => {
      Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          approx_count_distinct(col("l_suppkey")).as("approx_supps"))
        .orderBy(col("l_returnflag"))
    },
    oracle = None,
  )

  /** Approximate percentiles per group — the single-pass sketch
    * (Greenwald-Khanna with accuracy 1/eps) that replaces exact
    * percentile's full sort+gather at 100 TB. Approximate values → no
    * hash oracle; ApproxSpec bounds the rank error vs the exact
    * percentile at the same probes. */
  val qApproxPctl: GQuery = GQuery(
    "q_approx_pctl",
    (spark, dir) => {
      Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_percentile(col("l_extendedprice"), lit(0.5), lit(1000))
            .as("p50_price"),
          approx_percentile(col("l_extendedprice"), lit(0.99), lit(1000))
            .as("p99_price"))
        .orderBy(col("l_returnflag"))
    },
    oracle = None,
  )

  val all: Seq[GQuery] = Seq(
    qNeardupMinhash, qNeardupSimhash, qAnnLsh, qAnnIvf, qApproxDistinct,
    qApproxPctl)
}
