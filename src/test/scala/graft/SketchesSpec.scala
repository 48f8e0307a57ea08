package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches
import graft.sources.Tables

/** Pins [[Sketches]] beyond the hll_shingle_report oracle row: the
  * MERGE law that makes the sketch distributable (registers of a
  * union = element-wise max of the parts' registers — why the
  * aggregate is partial and a 1000-executor fan-in is exact), and the
  * raw-regime accuracy the report's p choice depends on. */
class SketchesSpec extends SparkSpec {

  private def shingleStream(dir: String) =
    Tables.documents(spark, dir).select(col("source"),
      explode(graft.operators.TextAnalysis.shingles(col("text"), 3))
        .as("sh"))

  test("merge law: HLL registers of the whole corpus equal the " +
      "element-wise max of per-half registers — the property that " +
      "makes the sketch exact under any partitioning/fan-in") {
    val sh = shingleStream(sf0001)
    val whole = Sketches.hllRegisters(sh, col("source"), col("sh"), 8)
    val a = sh.filter(pmod(crc32(col("sh")), lit(2)) === 0)
    val b = sh.filter(pmod(crc32(col("sh")), lit(2)) === 1)
    val merged = Sketches.hllRegisters(a, col("source"), col("sh"), 8)
      .unionByName(Sketches.hllRegisters(b, col("source"), col("sh"), 8))
      .groupBy("key", "register").agg(max("m").as("m"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty,
      "union-of-registers diverged from registers-of-union")
  }

  test("raw-regime accuracy: every source's estimate is within 20% " +
      "of exact at p=8 (1.04/sqrt(256) ~ 6.5% stderr; deterministic " +
      "data, so this is a pin, not a flake) and no source is in the " +
      "small-range regime the sketch deliberately avoids") {
    val sh = shingleStream(sf0001)
    val summ = Sketches.hllSummary(
      Sketches.hllRegisters(sh, col("source"), col("sh"), 8), 8)
    val exact = sh.groupBy(col("source").as("key"))
      .agg(countDistinct(col("sh")).as("exact"))
    val rows = summ.join(exact, "key")
      .withColumn("est", expr(Sketches.hllEstimateSql(8)))
      .collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val exactN = r.getAs[Long]("exact").toDouble
      val est = r.getAs[Double]("est")
      assert(exactN > 2.5 * 256,
        s"${r.getAs[String]("key")}: cardinality $exactN is in the " +
          "small-range regime — the report's p choice no longer holds")
      assert(math.abs(est - exactN) / exactN < 0.20,
        s"${r.getAs[String]("key")}: estimate $est vs exact $exactN")
    }
  }
}
