package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.queries.TrainingQueries
import graft.sources.Tables

/** Pins for the round-11 data-mixing trio (pack_sequences,
  * mixture_upsample, adaptive_quality) beyond the DuckDB oracle: each
  * query's SEMANTIC contract is recomputed with an independent local
  * (driver-side, fold-based) formulation at sf0.001 and compared row
  * for row, so a future refactor that keeps the oracle SQL in lockstep
  * with a broken Spark side (the one blind spot of a two-sided oracle)
  * still fails here. Plan-shape pins keep the 100 TB arguments honest:
  * packing pays exactly ONE hash exchange, upsampling never shuffles
  * the exploded volume, the adaptive threshold join stays broadcast.
  */
class MixturePackingSpec extends SparkSpec {

  private def docsWithToks = Tables.documents(spark, sf0001)
    .select(col("doc_id"), col("source"), col("lang"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("toks"))

  test("pack_sequences matches a driver-side concat-and-chop fold " +
      "and conserves every token") {
    val rows = docsWithToks
      .withColumn("bucket",
        pmod(conv(substring(md5(concat(lit("pack:"),
          col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long"),
          lit(32L)))
      .select("bucket", "doc_id", "toks")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // independent formulation: sort each bucket by doc_id, walk a
    // running offset, assign seq = off div 256, aggregate
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (bucket, ds) =>
      var off = 0L
      ds.sortBy(_._2).map { case (_, _, toks) =>
        val seq = off / 256; off += toks; (bucket, seq, toks)
      }
    }.groupBy(t => (t._1, t._2)).map { case ((bucket, seq), ts) =>
      (bucket, seq, ts.size.toLong, ts.map(_._3).sum)
    }.toSeq.sorted
    val got = TrainingQueries.all("pack_sequences")(spark, sf0001)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(got === expected)
    // conservation: chopping must not drop or duplicate tokens
    assert(got.map(_._4).sum === rows.map(_._3).sum)
    assert(got.map(_._3).sum === rows.length.toLong)
  }

  test("pack_sequences pays exactly one hash exchange (bucket) — the " +
      "chop itself is partition-local") {
    val plan = TrainingQueries.all("pack_sequences")(spark, sf0001)
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).length
    assert(hashExchanges === 1,
      s"expected 1 hash exchange (salt bucket), got $hashExchanges:\n$plan")
  }

  test("mixture_upsample: largest source runs exactly one epoch, the " +
      "cap holds at 4, and full epochs carry the whole source") {
    val perSource = docsWithToks.groupBy("source")
      .agg(count(lit(1)).as("n"), sum("toks").as("tok_s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .map { case (s, n, t) => s -> (n, t) }.toMap
    val largest = perSource.maxBy(_._2._2)._1
    val got = TrainingQueries.all("mixture_upsample")(spark, sf0001)
      .collect().map(r =>
        (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.filter(_._1 == largest).map(_._2).toSeq === Seq(1),
      "the anchor source must not be upsampled")
    assert(got.map(_._2).max <= 4, "epoch factor cap breached")
    got.foreach { case (src, epoch, nDocs, tokens) =>
      val (n, tokS) = perSource(src)
      // epochs 1..floor(factor) replicate the ENTIRE source
      val target = perSource.values.map(_._2).max.toDouble
      val f = math.min(target / tokS, 4.0)
      if (epoch <= f.floor.toInt) {
        assert(nDocs === n, s"full epoch $epoch of $src must carry all docs")
        assert(tokens === tokS)
      } else {
        assert(nDocs <= n, s"fractional epoch $epoch of $src overflowed")
      }
    }
  }

  test("mixture_upsample plan: the factor table joins broadcast and " +
      "no exchange follows the explode") {
    val plan = TrainingQueries.all("mixture_upsample")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"factor table should broadcast:\n$plan")
    // the exploded (upsampled) rows must reach their aggregate via
    // map-side partials, not a pre-agg repartition of the blown-up
    // volume: the only hash exchanges sit on post-partial aggregates
    val generateIdx = plan.indexOf("Generate explode")
    assert(generateIdx >= 0, s"explode missing:\n$plan")
    val afterExplode = plan.substring(0, generateIdx)
    // executedPlan prints top-down: anything ABOVE the Generate node
    // that is a hash exchange must be fed by a partial_ aggregate
    assert(!afterExplode.contains("Exchange hashpartitioning") ||
      afterExplode.contains("partial_"),
      s"raw exploded volume hits an exchange before partial agg:\n$plan")
  }

  test("adaptive_quality cutoffs equal the driver-side exact " +
      "10th percentile and the kept/dropped split is conserved") {
    val byLang = docsWithToks.select("lang", "toks").collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    val expected = byLang.map { case (lang, ds) =>
      val sorted = ds.map(_._2).sorted
      val n = sorted.length
      val rank = math.ceil(0.10 * n).toInt // cum >= ceil(p*n)
      val cutoff = sorted(math.max(rank, 1) - 1)
      val kept = sorted.count(_ >= cutoff).toLong
      (lang, cutoff, kept, n - kept)
    }.toSeq.sorted
    val got = TrainingQueries.all("adaptive_quality")(spark, sf0001)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(got === expected)
  }
}
