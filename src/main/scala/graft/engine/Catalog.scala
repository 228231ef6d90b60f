package graft.engine

import org.apache.spark.sql.SparkSession

/** SQL facade: register every testdata table as a temp view so the whole
  * engine is drivable with plain `spark.sql(...)` — the surface a SQL-only
  * user of the reference would reach for. Views are lazy plans over the
  * parquet scans (no materialization; pushdown and pruning work through
  * them unchanged), and `events` goes through [[Tables.events]] so the
  * nanosecond-timestamp normalization is baked into the view — SQL users
  * never see the raw ns column trap (SURVEY.md §1.2). */
object Catalog {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "documents", "embeddings", "events")

  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    Seq(
      "region" -> Tables.region(spark, sfDir),
      "nation" -> Tables.nation(spark, sfDir),
      "customer" -> Tables.customer(spark, sfDir),
      "supplier" -> Tables.supplier(spark, sfDir),
      "part" -> Tables.part(spark, sfDir),
      "orders" -> Tables.orders(spark, sfDir),
      "lineitem" -> Tables.lineitem(spark, sfDir),
      "documents" -> Tables.documents(spark, sfDir),
      "embeddings" -> Tables.embeddings(spark, sfDir),
      "events" -> Tables.events(spark, sfDir),
    ).foreach { case (name, df) => df.createOrReplaceTempView(name) }
  }
}
