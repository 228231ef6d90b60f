package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stage-level timing for the r15 jaccardPairs (PPJoin) rewrite at ×10:
  * where do the remaining seconds go — corpus+gram arrays, the df/prefix
  * windows, the candidate join, or the array-intersect verify?
  * Throwaway diagnostic (not part of the declared surface).
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.JaccardStageProbe */
object JaccardStageProbe {
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
      gen.filter($"doc_id" < 35)
        .select(($"doc_id" + 1000000L).as("doc_id"),
          concat($"text", lit(" zzextra")).as("text")))

    graft.functions.WordGrams.register(spark)
    def dgNoCkpt = docs
      .repartition(spark.sparkContext.defaultParallelism)
      .select($"doc_id", expr("word_grams(split(text, ' '), 3)").as("grams"))
    time("dg arrays (no checkpoint)") { dgNoCkpt.count() }
    val dg = dgNoCkpt.localCheckpoint()

    val tok = dg.select($"doc_id",
      size($"grams").cast("long").as("n"), explode($"grams").as("token"))
    time("tok explode only") { tok.count() }
    val wTok = Window.partitionBy($"token")
    val wDoc = Window.partitionBy($"doc_id").orderBy($"df", $"token")
    def sized = tok
      .withColumn("df", count(lit(1)).over(wTok))
    time("tok + df window") { sized.count() }
    def prefix = sized
      .withColumn("pos", row_number().over(wDoc))
      .filter($"pos" <= $"n" - ceil(lit(0.8) * $"n").cast("int") + 1)
      .select($"doc_id", $"token", $"n")
    time("tok + both windows + filter") { prefix.count() }
    def cand = prefix.as("x").join(prefix.as("y"),
        col("x.token") === col("y.token") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        col("x.n").as("n1"), col("y.n").as("n2"))
      .distinct()
    time("+ candidate join + distinct") { cand.count() }
    val candC = cand.localCheckpoint()
    def inter = broadcast(candC)
      .join(dg.select($"doc_id".as("d1"), $"grams".as("g1")), "d1")
      .join(dg.select($"doc_id".as("d2"), $"grams".as("g2")), "d2")
      .select($"d1", $"d2", $"n1", $"n2",
        size(array_intersect($"g1", $"g2")).as("n_inter"))
    time("verify (from ckpt cand/dg)") { inter.count() }
    spark.stop()
  }
}
