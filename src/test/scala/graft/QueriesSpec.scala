package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Registry

/** Every declared query must run on sf0.001 and produce a stable schema.
  * Correctness against DuckDB is checked by tools/oracle_check.py + the
  * driver's t2 gate; this suite guards compile-and-run health. */
class QueriesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  // q_join_anti can legitimately return 0 rows at tiny scale.
  private val mayBeEmpty = Set("q_join_anti")

  Registry.all.foreach { q =>
    test(s"${q.name} runs on sf0.001") {
      val df = q.run(spark, sf)
      val n = df.count()
      assert(n >= 0)
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
      assert(df.columns.nonEmpty)
    }
  }

  test("oracle SQL declared for every oracle-bearing query exactly once") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    assert(SparkEntry.queries.keySet == names.toSet)
    assert(SparkEntry.oracleSql.keySet.subsetOf(names.toSet))
  }
}

object TestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
