package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Sessions, Tables}

/** Catalog statistics + cost-based optimizer (round 2): ANALYZE TABLE
  * feeds row counts and column NDV/min/max into the planner so join
  * reorder and broadcast decisions stop guessing from file sizes. At
  * 100 TB this is the scheduled metadata pass after each load. */
class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def dropTable(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val d = new java.io.File(s"spark-warehouse/$t")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    if (d.exists()) rm(d)
  }

  test("ANALYZE TABLE populates row-count and column statistics the planner sees") {
    val cbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      dropTable("cust_stats")
      Tables.customer(spark, sf).write.saveAsTable("cust_stats")
      Sessions.analyze(spark, "cust_stats", Seq("c_custkey", "c_nationkey"))

      val described = spark.sql("DESC EXTENDED cust_stats")
        .filter(col("col_name") === "Statistics")
        .select("data_type").collect()
      assert(described.nonEmpty && described.head.getString(0).contains("rows"),
        s"expected row-count statistics, got ${described.toSeq}")

      val ndv = spark.sql("DESC EXTENDED cust_stats c_nationkey")
        .filter(col("info_name") === "distinct_count")
        .select("info_value").collect()
      assert(ndv.nonEmpty && ndv.head.getString(0).toLong > 0,
        "expected a positive NDV for c_nationkey")

      // the optimizer must surface the analyzed row count in plan stats
      val stats = spark.table("cust_stats").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(150)),
        s"expected rowCount=150 from ANALYZE, got ${stats.rowCount}")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", cbo)
      dropTable("cust_stats")
    }
  }

  test("stats-informed planning broadcasts the small analyzed table without a hint") {
    val cbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      Seq("nation_stats", "cust_stats2").foreach(dropTable)
      Tables.nation(spark, sf).write.saveAsTable("nation_stats")
      Tables.customer(spark, sf).write.saveAsTable("cust_stats2")
      Sessions.analyze(spark, "nation_stats")
      Sessions.analyze(spark, "cust_stats2")
      val joined = spark.table("cust_stats2")
        .join(spark.table("nation_stats"),
          col("c_nationkey") === col("n_nationkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"expected stats-based broadcast of the 25-row nation table:\n$plan")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", cbo)
      Seq("nation_stats", "cust_stats2").foreach(dropTable)
    }
  }
}
