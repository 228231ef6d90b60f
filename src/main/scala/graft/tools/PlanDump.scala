package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import graft.engine.Registry

/** Dump `.explain("formatted")` for named registry queries to
  * <outDir>/<query>_<suffix>.txt — the r15 optimization-round evidence
  * files (plans/r15/<q>_before.txt / _after.txt). Usage:
  *   sbt "runMain graft.tools.PlanDump plans/r15 before q_a q_b ..."
  * Data dir comes from SPARK_GRAFT_SF_DIR (plan shape only; any SF works,
  * default sf0.1 so AQE thresholds see bench-scale inputs).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <q>...")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxMetadataStringLength", 1000)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val reg = Registry.byName
    names.foreach { n =>
      val df = reg(n).run(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"PLANDUMP wrote ${n}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
