package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.GQuery
import graft.engine.GQuery._
import graft.sources.{Lake, Sources}

/** Interchange-format sources under the oracle gate (SURVEY.md §2.B.1's
  * former ◻ set): the testdata ships no CSV/JSON fixtures, so — like the
  * partitioned lake — the fixtures are materialized once per run from the
  * parquet tables and then READ BACK through the declared query, with the
  * DuckDB oracle reading the same files (`read_csv` / `read_json`). What
  * is graded is the read path: explicit schemas (inference reads twice
  * and guesses), FAILFAST mode, and agreement with another engine's
  * parser on the same bytes.
  */
object Formats {

  private val csvSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** CSV source: per-(lang, source) profile of the metadata fixture. */
  val qSourceCsv: GQuery = GQuery(
    "q_source_csv",
    (spark, dir) => {
      val path = Lake.ensureDocumentsCsv(spark, dir)
      Sources.readCsv(spark, path, csvSchema)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("lang"), col("source"))
    },
    Some(s"""
      SELECT lang, source, count(*) AS n_docs,
             cast(sum(n_chars) as bigint) AS total_chars,
             min(doc_id) AS first_doc
      FROM ${Lake.documentsCsvOracle}
      GROUP BY lang, source
      ORDER BY lang, source"""),
  )

  private val jsonlSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** JSON-lines source: the text survives the round-trip — the oracle
    * recomputes character lengths from the JSON bytes, so any escaping
    * disagreement between the two parsers would hash-mismatch. */
  val qSourceJsonl: GQuery = GQuery(
    "q_source_jsonl",
    (spark, dir) => {
      val path = Lake.ensureDocumentsJsonl(spark, dir)
      Sources.readJsonLines(spark, path, jsonlSchema)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text")).cast("long")).as("text_chars"),
          sum(col("n_chars")).as("meta_chars"))
        .orderBy(col("lang"))
    },
    Some(s"""
      SELECT lang, count(*) AS n_docs,
             cast(sum(length(text)) as bigint) AS text_chars,
             cast(sum(n_chars) as bigint) AS meta_chars
      FROM ${Lake.documentsJsonlOracle}
      GROUP BY lang
      ORDER BY lang"""),
  )

  val all: Seq[GQuery] = Seq(qSourceCsv, qSourceJsonl)
}
