package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for the _xxl minhash twins: where do the ~7 s go —
  * corpus generation, kernel signatures, banding join, or verify?
  * Throwaway diagnostic (not part of the declared surface).
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.XxlStageProbe */
object XxlStageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(label: String)(f: => Long): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"STAGE $label%-28s best=${runs.map(_._1).min}%.3f n=${runs.head._2}")
    }

    val base0 = graft.engine.Tables.documents(spark, sfDir)
      .filter($"doc_id" < 1000000L).select($"doc_id", $"text")
    val gen = base0.select(col("doc_id"), col("text"),
        explode(expr("sequence(0, 9)")).as("k"))
      .select((col("doc_id") + col("k").cast("long") * lit(100000L))
          .as("doc_id"),
        expr("array_join(transform(split(text, ' '), " +
          "t -> concat(t, cast(k as string))), ' ')").as("text"))
    val docs = gen.unionByName(
      gen.filter($"doc_id" < 50)
        .select(($"doc_id" + 1000000L).as("doc_id"), $"text"))

    time("xdocs generation (union)") { docs.count() }

    graft.functions.MinHashSig.register(spark)
    def sigsNoCkpt = docs
      .select(col("doc_id"), expr("minhash_sig(split(text, ' '))").as("mh"))
      .filter(size(col("mh")) === 16)
      .select((col("doc_id") +: (0 until 16).map(i =>
        element_at(col("mh"), i + 1).as(s"h$i"))): _*)
    time("kernel sigs (no checkpoint)") { sigsNoCkpt.count() }

    val sigs = sigsNoCkpt.localCheckpoint()
    val bandStructs = (0 until 4).map(b =>
      struct(lit(b).as("band_id"),
        md5(concat_ws("|", col(s"h${4 * b}"), col(s"h${4 * b + 1}"),
          col(s"h${4 * b + 2}"), col(s"h${4 * b + 3}"))).as("sig")))
    val bands = sigs
      .select($"doc_id", explode(array(bandStructs: _*)).as("bs"))
      .select($"doc_id", $"bs.band_id".as("band_id"), $"bs.sig".as("sig"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    time("bands self-join + distinct") { cand.count() }

    val sigsA = sigs.select(
      ($"doc_id".as("id_a") +: (0 until 16).map(i => col(s"h$i").as(s"a$i"))): _*)
    val sigsB = sigs.select(
      ($"doc_id".as("id_b") +: (0 until 16).map(i => col(s"h$i").as(s"b$i"))): _*)
    val nMatch = (0 until 16)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
      .reduce(_ + _)
    val out = broadcast(cand)
      .join(sigsA, "id_a").join(sigsB, "id_b")
      .select($"id_a", $"id_b", nMatch.as("n_match"),
        (nMatch.cast("double") / lit(16.0)).as("est_jaccard"))
      .filter($"est_jaccard" >= 0.5)
      .orderBy($"id_a", $"id_b")
    time("verify join + sort (cached sigs)") { out.count() }
    spark.stop()
  }
}
