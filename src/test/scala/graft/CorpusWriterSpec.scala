package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sinks.CorpusWriter

/** Pins the corpus writer's layout contract: partition directories,
  * planning-time partition pruning on read (PartitionFilters, not a
  * post-scan filter), row-group predicate pushdown on the sort column,
  * bounded file counts, deterministic re-run layout, and roundtrip
  * fidelity. */
class CorpusWriterSpec extends SparkSpec {

  private def writeDocs(out: String, filesPerPartition: Int = 1): Unit = {
    val d = graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text", "lang", "source")
    CorpusWriter.writePartitioned(d, out, partitionCol = "lang",
      sortCols = Seq("doc_id"), filesPerPartition = filesPerPartition)
  }

  test("partitioned layout prunes at planning time and pushes the " +
      "sort-column predicate to the scan") {
    val out = Files.createTempDirectory("graft_corpus_out").toString
    writeDocs(out)

    // one directory per lang value
    val dirs = Files.list(Paths.get(out)).iterator()
    val langDirs = Iterator.continually(dirs)
      .takeWhile(_.hasNext).map(_.next().getFileName.toString)
      .filter(_.startsWith("lang=")).toSet
    assert(langDirs.nonEmpty)

    val back = spark.read.parquet(out)
    val pruned = back.filter(col("lang") === "en" && col("doc_id") < 50)
    val plan = pruned.queryExecution.executedPlan.toString

    // partition pruning is in the scan's PartitionFilters — the lang
    // predicate must NOT survive as a post-scan data filter
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("lang"), s"lang not in PartitionFilters:\n$plan")
    // row-group pushdown on the sorted column
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("LessThan(doc_id,50)"),
      s"doc_id range not pushed:\n$plan")

    // roundtrip fidelity on the pruned slice
    val expect = graft.sources.Tables.documents(spark, sf0001)
      .filter(col("lang") === "en" && col("doc_id") < 50)
      .select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val got = pruned.select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(got === expect)
    assert(got.nonEmpty)
  }

  test("the REGISTERED corpus_write_read query's re-read scan prunes " +
      "partitions at planning time and pushes the doc_id range") {
    // the CORRECTNESS row proves the round trip is value-preserving;
    // this pins that it is also LAYOUT-preserving — the lang predicate
    // reaches PartitionFilters (excluded dirs never listed) and the
    // range reaches the row-group stats, not a post-scan filter
    val df = SparkEntry.queries("corpus_write_read")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("lang"), s"lang not in PartitionFilters:\n$plan")
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("GreaterThanOrEqual(doc_id,100)"),
      s"doc_id range not pushed:\n$plan")
    assert(df.count() > 0)
  }

  test("one shuffle partition per value bounds the file count; " +
      "filesPerPartition spreads it deterministically") {
    def parquetFiles(root: String): Map[String, Int] = {
      val base = Paths.get(root)
      val perDir = scala.collection.mutable.Map[String, Int]()
      Files.walk(base).iterator().forEachRemaining { p =>
        if (p.toString.endsWith(".parquet")) {
          val rel = base.relativize(p).toString
          val dir = rel.split('/').head
          perDir(dir) = perDir.getOrElse(dir, 0) + 1
        }
      }
      perDir.toMap
    }
    val out1 = Files.createTempDirectory("graft_corpus_one").toString
    writeDocs(out1)
    val files1 = parquetFiles(out1)
    assert(files1.nonEmpty && files1.values.forall(_ == 1),
      s"expected exactly one file per lang dir, got $files1")

    val out3 = Files.createTempDirectory("graft_corpus_three").toString
    writeDocs(out3, filesPerPartition = 3)
    val files3 = parquetFiles(out3)
    assert(files3.values.forall(n => n >= 1 && n <= 3),
      s"expected <=3 files per lang dir, got $files3")
    // salting is md5-deterministic: a re-run reproduces the layout
    val out3b = Files.createTempDirectory("graft_corpus_threeb").toString
    writeDocs(out3b, filesPerPartition = 3)
    assert(parquetFiles(out3b) === files3, "re-run layout drifted")

    // both layouts hold the same rows
    val n1 = spark.read.parquet(out1).count()
    val n3 = spark.read.parquet(out3).count()
    assert(n1 === n3)
  }
}
