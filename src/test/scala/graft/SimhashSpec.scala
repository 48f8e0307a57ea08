package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Pins the 64-bit SimHash kernel and the banded pairing operator:
  * the signature against an independent bit-vote reimplementation, and
  * the 4×16-bit band join against brute-force all-pairs ground truth
  * (the pigeonhole exact-recall claim, checked on real corpus data).
  */
class SimhashSpec extends SparkSpec {

  /** Independent reference: same definition, different code path
    * (BigInteger hex parse + testBit instead of the kernel's
    * parseUnsignedLong + shift loop). */
  private def refSimhash(text: String): Long = {
    val toks = text.trim.toLowerCase.split("\\s+")
    val md = java.security.MessageDigest.getInstance("MD5")
    val vals = toks.map { t =>
      val hex = md.digest(t.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 16)
      new java.math.BigInteger(hex, 16)
    }
    (0 until 64).foldLeft(0L) { (sig, j) =>
      val ones = vals.count(_.testBit(j))
      if (2 * ones > toks.length) sig | (1L << j) else sig
    }
  }

  test("simhash64 matches an independent bit-vote reference") {
    import spark.implicits._
    val texts = Seq("hello world foo", "a", "  padded   spacing  text ",
      "Mixed CASE Tokens repeat repeat repeat", "zZz Abc 123 !?")
    val got = texts.toDF("text")
      .select(graft.functions.TextShingles.simhash64(col("text")))
      .as[Long].collect()
    assert(got.toSeq === texts.map(refSimhash))
  }

  test("bands reassemble the signature (disjoint 16-bit split)") {
    import spark.implicits._
    val sigs = Seq(0L, -1L, Long.MinValue, Long.MaxValue, 0x123456789abcdefL)
    val bands = sigs.toDF("sig").select(
      (0 until 4).map(b => shiftrightunsigned(col("sig"), 16 * b)
        .bitwiseAND(lit(0xFFFFL)).as(s"b$b")): _*)
      .as[(Long, Long, Long, Long)].collect()
    sigs.zip(bands).foreach { case (sig, (b0, b1, b2, b3)) =>
      assert((b0 | (b1 << 16) | (b2 << 32) | (b3 << 48)) === sig)
    }
  }

  test("simhashPairs == brute-force all-pairs at Hamming<=3 (exact recall)") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text"))
    val all = docs.unionByName(
      docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))

    val got = Dedup.simhashPairs(all, col("doc_id"), col("text"))
      .select("id_a", "id_b", "hamming")
      .as[(Long, Long, Int)].collect().toSet

    // brute force over every pair — small corpus, exhaustive oracle
    val sigs = all.select(col("doc_id"),
        graft.functions.TextShingles.simhash64(col("text")).as("sig"))
      .as[(Long, Long)].collect()
    val expected = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb)
      if h <= 3
    } yield (ia, ib, h)).toSet
    assert(expected.nonEmpty) // planted copies guarantee hamming-0 pairs
    assert(got === expected)
  }
}
