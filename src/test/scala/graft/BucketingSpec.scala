package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing (SURVEY.md §4 / scale posture): pre-partitioning both sides
  * of a recurring fact⋈fact join by the join key removes the shuffle from
  * EVERY subsequent join — at 100 TB this converts the dominant cost of
  * the pipeline into a one-time write-side layout decision. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("bucketed fact-fact join runs without a shuffle exchange") {
    import spark.implicits._
    // warehouse.dir is a static conf — managed tables land in the default
    // ./spark-warehouse; DROP TABLE at the end removes the files.
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    // a crashed prior run can leave orphaned table dirs the metastore
    // no longer knows about — clear them or CTAS refuses the location
    Seq("li_b", "ord_b").foreach { t =>
      val d = new java.io.File(s"spark-warehouse/$t")
      if (d.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(d)
      }
    }

    graft.engine.Tables.lineitem(spark, sf)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    graft.engine.Tables.orders(spark, sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    // tiny test data fits the broadcast threshold, which would hide the
    // bucketing effect — pin the merge join the big-data plan would use
    val joined = spark.table("li_b").hint("merge")
      .join(spark.table("ord_b"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      plan)
    // the join keys are co-bucketed: no Exchange may feed the join
    val joinSection = plan.substring(0, plan.indexOf("Scan"))
    assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey"),
      s"bucketed join must not reshuffle the fact side:\n$plan")

    // and the result matches the unbucketed join
    val expected = graft.engine.Tables.lineitem(spark, sf)
      .join(graft.engine.Tables.orders(spark, sf),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
    assert(joined.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(joined).count() == 0)

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
  }
}
