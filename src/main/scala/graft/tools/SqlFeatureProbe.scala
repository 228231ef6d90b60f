package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe Spark 4.1.2 SQL feature support: recursive CTEs, lateral joins,
  * correlated scalar subqueries. */
object SqlFeatureProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def probe(name: String, sql: String): Unit =
      try {
        val rows = spark.sql(sql).collect()
        println(s"PROBE $name OK: ${rows.take(5).mkString(" | ")}")
      } catch {
        case e: Throwable =>
          println(s"PROBE $name FAIL: ${e.getMessage.linesIterator.next()}")
      }

    probe("recursive_cte",
      """WITH RECURSIVE r(n) AS (
        |  SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 5)
        |SELECT sum(n) FROM r""".stripMargin)

    spark.range(3).createOrReplaceTempView("t3")
    probe("lateral_join",
      """SELECT t3.id, l.v FROM t3,
        |LATERAL (SELECT t3.id * 10 AS v) l""".stripMargin)

    probe("correlated_scalar",
      """SELECT id, (SELECT max(i2.id) FROM t3 i2 WHERE i2.id < t3.id) m
        |FROM t3""".stripMargin)

    val sf = "/root/testdata/sf0.001"
    spark.read.parquet(s"$sf/customer.parquet").createOrReplaceTempView("customer")
    spark.read.parquet(s"$sf/nation.parquet").createOrReplaceTempView("nation")

    probe("lateral_limit",
      """SELECT n_nationkey, l.c_custkey, l.c_acctbal FROM nation,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer
        |         WHERE c_nationkey = n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) l
        |ORDER BY n_nationkey, l.c_acctbal DESC LIMIT 6""".stripMargin)

    probe("recursive_div",
      """WITH RECURSIVE anc(orig, k, depth) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey < 8
        |  UNION ALL SELECT orig, k DIV 2, depth + 1 FROM anc WHERE k > 0)
        |SELECT orig, count(*) n FROM anc GROUP BY orig ORDER BY orig LIMIT 5""".stripMargin)

    probe("corr_scalar_ineq",
      """SELECT c_custkey, (SELECT max(c2.c_custkey) FROM customer c2
        |  WHERE c2.c_nationkey = customer.c_nationkey
        |    AND c2.c_custkey < customer.c_custkey) m
        |FROM customer ORDER BY c_custkey LIMIT 4""".stripMargin)

    spark.stop()
  }
}
