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

  test("AQE splits a skewed join partition at runtime (the 100TB skew lever)") {
    import spark.implicits._
    // one hot key carrying ~95% of the left side
    val left = spark.range(0, 200000)
      .select(when($"id" < 190000, lit(7L)).otherwise($"id").as("k"),
        $"id".as("payload"))
    val right = spark.range(0, 1000).select($"id".as("k"), ($"id" * 2).as("v"))
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // no same-key aggregation downstream: AQE declines to split a skewed
      // partition when the join's hash partitioning is reused by a later
      // stage, which is itself correct behavior — the lever under test is
      // the plain skewed-join shape
      val j = left.join(right, "k").select($"payload", $"v")
      // run THIS DataFrame (count() would execute a different QueryExecution
      // and leave j's adaptive plan unfinalized)
      assert(j.collect().length == 190000) // only the hot key matches right
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true") && finalPlan.contains("skewed"),
        s"expected a skew-split AQEShuffleRead in:\n${finalPlan.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the probe side of a selective fact-fact join") {
    // The third runtime lever beside AQE skew-split and stats-informed
    // broadcast: when one side of a shuffle join carries a selective
    // filter, the optimizer builds a bloom filter from it and pushes a
    // might_contain probe into the OTHER side's scan — at 100 TB this
    // skips most of the probe-side shuffle for month-slice joins. The
    // default application-side threshold (10GB) exists so small scans
    // skip the overhead; lower it (and disable broadcast) to observe the
    // mechanism at test scale.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val ord = Tables.orders(spark, sf)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp_ntz") &&
          col("o_orderdate") < lit("1997-02-01").cast("timestamp_ntz"))
      val joined = Tables.lineitem(spark, sf)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).count()
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n$optimized")
      assert(joined.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
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
