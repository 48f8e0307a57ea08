package graft

import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/** Pins the engine-wide `events.ts` contract: an epoch-NANO long,
  * whatever physical type the generator shipped (TIMESTAMP(NANOS) read
  * via nanosAsLong, or TIMESTAMP(MICROS)/NTZ normalized by
  * `Tables.normalizeTs`). Round 11's testdata regeneration silently
  * flipped the physical type to TIMESTAMP(MICROS) NTZ and broke every
  * `ts div 1000` consumer (13 registry queries) — this spec makes the
  * next drift fail here, in-session, instead of in the driver's bench.
  */
class TablesContractSpec extends SparkSpec {

  test("events.ts arrives as an epoch-nano long on the real testdata") {
    val e = Tables.events(spark, sf0001)
    assert(e.schema("ts").dataType == LongType)
    // Value sanity: epoch nanos for any plausible generator clock are
    // ~1.4e18..1.9e18 (2014..2030); an accidental micros/millis pass-
    // through would be 3-6 orders of magnitude off.
    val row = e.selectExpr("min(ts)", "max(ts)").head
    val (lo, hi) = (row.getLong(0), row.getLong(1))
    assert(lo > 1_000_000_000_000_000_000L, s"ts min $lo is not epoch nanos")
    assert(hi < 2_000_000_000_000_000_000L, s"ts max $hi is not epoch nanos")
  }

  test("ts div 1000 (epoch micros) round-trips to a sane timestamp") {
    val d = Tables.events(spark, sf0001)
      .selectExpr("timestamp_micros(ts div 1000) AS t")
      .selectExpr("min(year(t)) AS y0", "max(year(t)) AS y1").head
    assert(d.getInt(0) >= 2014 && d.getInt(1) <= 2030,
      s"derived event-time years ${d.getInt(0)}..${d.getInt(1)} out of range")
  }

  test("documents/embeddings columns the query families consume keep " +
      "their types (regeneration drift fails here, not in the bench)") {
    import org.apache.spark.sql.types._
    val doc = Tables.documents(spark, sf0001).schema
    assert(doc("doc_id").dataType == LongType)
    assert(doc("text").dataType == StringType)
    assert(doc("lang").dataType == StringType)
    assert(doc("source").dataType == StringType)
    assert(doc("n_chars").dataType == LongType)
    val emb = Tables.embeddings(spark, sf0001).schema
    assert(emb("vec_id").dataType == LongType)
    assert(emb("embedding").dataType == ArrayType(FloatType,
      containsNull = true))
    assert(emb("label").dataType == IntegerType)
  }

  test("lineitem/orders columns the TPC-H-flavor queries consume keep " +
      "their types (q1_agg's decimal-exact casts assume double inputs)") {
    import org.apache.spark.sql.types._
    val li = Tables.lineitem(spark, sf0001).schema
    for (c <- Seq("l_quantity", "l_extendedprice", "l_discount"))
      assert(li(c).dataType == DoubleType, s"$c drifted to ${li(c).dataType}")
    assert(li("l_orderkey").dataType == LongType)
    assert(li("l_returnflag").dataType == StringType)
    val ord = Tables.orders(spark, sf0001).schema
    assert(ord("o_orderkey").dataType == LongType)
    assert(ord("o_custkey").dataType == LongType)
  }
}
