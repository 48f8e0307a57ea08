package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingUrlFrontier
import graft.streaming.StreamingUrlFrontier.{FrontierEvent, SeenUrl}

/** Pins [[StreamingUrlFrontier]]: one admit per canonical URL per TTL
  * window (raw host-case/:443/#fragment variants suppressed and
  * counted), a watermark-driven retire row carrying the suppressed
  * count, state cleared on retire (bounded by the live frontier), and
  * re-admission afterwards — plus the canonicalization chain agreeing
  * with the batch url_dedup family definition. */
class StreamingUrlFrontierSpec extends SparkSpec {

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"

  test("admit-once per canonical URL, variant suppression with audit " +
      "count on retire, and re-admission after the TTL (event-time " +
      "timers, RocksDB transformWithState)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[SeenUrl]
    val out = StreamingUrlFrontier.frontier(input.toDS(),
      ttlUs = 60000000L, maxDelay = "1 second")
    val q = out.writeStream.format("memory").queryName("urlf_out")
      .outputMode("update").start()
    def events(): Seq[FrontierEvent] =
      spark.table("urlf_out").as[FrontierEvent].collect().toSeq
    val t0 = 1000000000L
    val page1 = "https://site1.com/page/1.html"
    val page2 = "https://site2.org/page/2.html"
    try {
      // batch 1: three raw variants of page1 (distinct ts) + page2
      input.addData(
        SeenUrl("https://SITE1.com/page/1.html", t0),
        SeenUrl("https://site1.com/page/1.html#top", t0 + 100),
        SeenUrl("https://site1.com:443/page/1.html", t0 + 200),
        SeenUrl(page2, t0))
      q.processAllAvailable()
      val admits1 = events()
      assert(admits1.forall(_.kind == "admit"))
      assert(admits1.map(_.canonicalUrl).sorted === Seq(page1, page2))
      // deterministic in-batch winner: (tsUs, rawUrl)-least variant
      val a1 = admits1.find(_.canonicalUrl == page1).get
      assert(a1.rawUrl === "https://SITE1.com/page/1.html")
      assert(a1.tsUs === t0)

      // batch 2: a fourth variant while the admit is live → suppressed
      input.addData(SeenUrl("https://Site1.COM/page/1.html", t0 + 300))
      q.processAllAvailable()
      assert(events().size === 2, "suppressed sighting emitted a row")

      // batches 3-4: advance the watermark past t0 + ttl + delay —
      // both admits retire with their audit counts (two pushes so the
      // timer batch definitely runs)
      input.addData(SeenUrl("https://flush.net/a.html", t0 + 65000000L))
      q.processAllAvailable()
      input.addData(SeenUrl("https://flush.net/b.html", t0 + 70000000L))
      q.processAllAvailable()
      val retired = events().filter(_.kind == "retire")
      val r1 = retired.find(_.canonicalUrl == page1).get
      assert(r1.nSuppressed === 3L,
        s"expected 3 suppressed variants, got $retired")
      assert(r1.tsUs === t0, "retire must carry the original admit time")
      assert(r1.rawUrl === "https://SITE1.com/page/1.html")
      assert(retired.find(_.canonicalUrl == page2).get.nSuppressed === 0L)

      // batch 5: page1 re-appears after retirement → re-admits (state
      // was cleared, not merely ignored)
      input.addData(SeenUrl(page1, t0 + 71000000L))
      q.processAllAvailable()
      val admitsP1 = events().filter(e =>
        e.kind == "admit" && e.canonicalUrl == page1)
      assert(admitsP1.size === 2, s"no re-admit after TTL: ${events()}")
      assert(admitsP1.map(_.tsUs).sorted === Seq(t0, t0 + 71000000L))
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }

  test("canonicalize collapses exactly the url_dedup variant family " +
      "(host case, :443, fragment) and keeps distinct pages distinct") {
    import spark.implicits._
    val got = Seq(
        "https://SITE1.com/page/1.html",
        "https://site1.com:443/page/1.html",
        "https://site1.com/page/1.html#top",
        "https://site1.com:8443/page/1.html", // non-default port KEPT
        "https://site1.com/page/2.html")
      .toDF("raw")
      .select(StreamingUrlFrontier.canonicalize(col("raw")).as("c"))
      .as[String].collect().toSeq
    assert(got === Seq(
      "https://site1.com/page/1.html",
      "https://site1.com/page/1.html",
      "https://site1.com/page/1.html",
      "https://site1.com:8443/page/1.html",
      "https://site1.com/page/2.html"))
  }
}
