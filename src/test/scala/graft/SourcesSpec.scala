package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("CSV round-trip preserves documents exactly") {
    val docs = graft.engine.Tables.documents(spark, sf)
    val dir = Files.createTempDirectory("csv_rt").toString + "/docs"
    Sources.writeCsv(docs, dir)
    val back = Sources.readCsv(spark, dir, docs.schema)
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).count() == 0)
    assert(docs.exceptAll(back).count() == 0)
  }

  test("JSON-lines round-trip preserves orders exactly") {
    val orders = graft.engine.Tables.orders(spark, sf)
    val dir = Files.createTempDirectory("json_rt").toString + "/orders"
    Sources.writeJsonLines(orders, dir)
    val back = Sources.readJsonLines(spark, dir, orders.schema)
    assert(back.count() == orders.count())
    assert(back.exceptAll(orders).count() == 0)
  }

  test("ORC round-trip preserves lineitem exactly") {
    val li = graft.engine.Tables.lineitem(spark, sf)
    val dir = Files.createTempDirectory("orc_rt").toString + "/li"
    Sources.writeOrc(li, dir)
    val back = Sources.readOrc(spark, dir, li.schema)
    assert(back.count() == li.count())
    assert(back.exceptAll(li).count() == 0)
  }

  test("partitioned parquet layout enables partition pruning") {
    import spark.implicits._
    val docs = graft.engine.Tables.documents(spark, sf)
    val dir = Files.createTempDirectory("part_pq").toString + "/docs"
    Sources.writePartitionedParquet(docs, dir, Seq("lang"))
    val pruned = spark.read.parquet(dir).filter($"lang" === "en")
    assert(pruned.count() ==
      docs.filter($"lang" === "en").count())
    val scan = pruned.queryExecution.executedPlan.toString
    // partition filter applied at the source, not post-scan
    assert(scan.contains("PartitionFilters: [isnotnull(lang"), scan)
  }

  test("XML round-trip preserves nation exactly (Spark 4 built-in source)") {
    val nation = graft.engine.Tables.nation(spark, sf)
    val dir = Files.createTempDirectory("xml_rt").toString + "/nation"
    Sources.writeXml(nation, dir, rowTag = "nation")
    val back = Sources.readXml(spark, dir, nation.schema, rowTag = "nation")
    assert(back.count() == nation.count())
    assert(back.exceptAll(nation).count() == 0)
  }

  test("zstd parquet round-trips exactly and actually uses the codec") {
    val li = graft.engine.Tables.lineitem(spark, sf)
    val dir = Files.createTempDirectory("zstd_pq").toString + "/li"
    Sources.writeParquetZstd(li, dir, level = 3)
    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())
    assert(back.exceptAll(li).count() == 0)
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".zstd.parquet")),
      s"expected zstd-codec part files, got ${files.toSeq}")
  }

  test("z-ordered write gives tight per-file ranges on BOTH cluster columns") {
    import spark.implicits._
    val li = graft.engine.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select($"l_orderkey", $"l_partkey", $"l_suppkey")

    def avgFileRangeFrac(dir: String, c: String): Double = {
      val global = li.agg(max(col(c)) - min(col(c))).head().getLong(0).toDouble
      val perFile = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).as("r"))
        .agg(avg($"r")).head().getDouble(0)
      perFile / global
    }

    val zDir = Files.createTempDirectory("zorder").toString + "/li"
    Sources.writeZOrdered(li, zDir, Seq("l_partkey", "l_suppkey"), numFiles = 16)
    assert(spark.read.parquet(zDir).count() == li.count())

    // baseline: plain sort by l_partkey only — its SECOND column sprays
    val sDir = Files.createTempDirectory("sorted").toString + "/li"
    li.repartitionByRange(16, $"l_partkey").sortWithinPartitions("l_partkey")
      .write.parquet(sDir)

    val zPart = avgFileRangeFrac(zDir, "l_partkey")
    val zSupp = avgFileRangeFrac(zDir, "l_suppkey")
    val sSupp = avgFileRangeFrac(sDir, "l_suppkey")
    // z-order: both columns tight (each file covers a fraction of the
    // domain); single-column sort leaves the second column near-full-range
    assert(zPart < 0.5, s"l_partkey file range frac $zPart")
    assert(zSupp < 0.5, s"l_suppkey file range frac $zSupp")
    assert(sSupp > 0.9, s"sorted-baseline l_suppkey should spray, got $sSupp")
    assert(zSupp < sSupp / 2,
      s"z-order must beat single-sort on the 2nd column: $zSupp vs $sSupp")
  }

  test("compactParquet collapses a many-file directory, preserves data exactly") {
    val dir = Files.createTempDirectory("compact").toString + "/li"
    val li = graft.engine.Tables.lineitem(spark, "/root/testdata/sf0.001")
    li.repartition(40).write.parquet(dir)
    def parquetFiles = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(parquetFiles.length == 40, s"setup: ${parquetFiles.length} files")
    val total = parquetFiles.map(_.length).sum
    // target half the total -> exactly 2 output files
    val n = Sources.compactParquet(spark, dir, targetFileBytes = total / 2 + 1)
    assert(n == 2, s"expected 2 files, compactor chose $n")
    assert(parquetFiles.length == 2, s"dir has ${parquetFiles.length} files")
    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
    // no temp/backup residue
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(_.contains("compact.")), parent.mkString(","))
  }

  test("compactParquet returns files actually written when request exceeds partitions") {
    val dir = Files.createTempDirectory("compact_over").toString + "/li"
    val li = graft.engine.Tables.lineitem(spark, "/root/testdata/sf0.001")
    li.repartition(3).write.parquet(dir)
    // targetFileBytes=1 requests thousands of files, but coalesce cannot
    // INCREASE the partition count — the honest return value is the 3
    // files actually written, not the request
    val n = Sources.compactParquet(spark, dir, targetFileBytes = 1L)
    val onDisk = new java.io.File(dir).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(n == onDisk, s"returned $n but $onDisk files on disk")
    assert(n == 3, s"expected 3 files (input partition count), got $n")
    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())
  }

  test("compactPartitionedParquet compacts every leaf, preserves partition values") {
    val dir = Files.createTempDirectory("compact_part").toString + "/orders"
    val ord = graft.engine.Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumn("status", col("o_orderstatus"))
    ord.repartition(8).write.partitionBy("status").parquet(dir)
    def leafFiles(leaf: String) = new java.io.File(s"$dir/status=$leaf")
      .listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val statuses = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName.stripPrefix("status=")).sorted
    assert(statuses.nonEmpty && leafFiles(statuses.head).length > 1)
    val res = Sources.compactPartitionedParquet(spark, dir, Long.MaxValue)
    assert(res.size == statuses.length, res)
    assert(res.values.forall(_ == 1), res)
    statuses.foreach(s => assert(leafFiles(s).length == 1, s"leaf $s"))
    val back = spark.read.parquet(dir)
    assert(back.count() == ord.count())
    assert(back.select("status").distinct().count() == statuses.length)
    assert(back.drop("status").exceptAll(ord.drop("status")).isEmpty)
  }

  test("FAILFAST surfaces malformed input instead of nulling it") {
    val dir = Files.createTempDirectory("bad_csv")
    Files.writeString(dir.resolve("bad.csv"), "doc_id,n_chars\n1,10\n2,not_a_number\n")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, n_chars BIGINT")
    val ex = intercept[Exception] {
      Sources.readCsv(spark, dir.toString, schema).collect()
    }
    assert(ex.getMessage.contains("MALFORMED") ||
      (ex.getCause != null), s"unexpected: ${ex.getMessage}")
  }
}
