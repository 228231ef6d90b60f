package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.engine.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The query inventory itself lives in [[graft.engine.Registry]]; each
  * operator family is an object under [[graft.operators]].
  */
object SparkEntry {
  /** Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("q_pricing").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
