package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.Sequencing

/** Property-style checks of the Q1 sort-key normalization: for
  * randomly generated homogeneous part values, ordering by
  * `sortKey` must equal the semantic ordering of the type
  * (ScalaCheck-style with a seeded generator; each round is one Spark
  * sort job). */
class SortKeyPropsSpec extends SparkSpec {

  private val rnd = new Random(42)

  private def sparkOrder(values: Seq[String]): Seq[String] = {
    import spark.implicits._
    // tag each value with its index so duplicates stay distinguishable
    values.zipWithIndex.map { case (v, i) => (v, i) }.toDF("v", "i")
      .orderBy(Sequencing.sortKey(col("v")), col("i"))
      .select("v").as[String].collect().toSeq
  }

  test("INTEGER_LIKE: sortKey order == BigInt order (mixed magnitude, signs)") {
    (1 to 5).foreach { _ =>
      val vals = Seq.fill(40) {
        val digits = 1 + rnd.nextInt(30)
        val sign = if (rnd.nextBoolean()) "-" else ""
        sign + (1 to digits).map(_ => rnd.nextInt(10)).mkString
      }.map(s => if (s.matches("-?0\\d+")) s.replaceFirst("0+", "") else s)
        .filter(s => s.nonEmpty && s != "-")
      val expected = vals.sortBy(BigInt(_))
      assert(sparkOrder(vals).map(BigInt(_)) === expected.map(BigInt(_)))
    }
  }

  test("NUMBER: sortKey order == double order") {
    (1 to 5).foreach { _ =>
      val vals = Seq.fill(40)((rnd.nextDouble() - 0.5) * 1e6)
        .map(d => f"$d%.4f")
      val expected = vals.sortBy(_.toDouble)
      assert(sparkOrder(vals).map(_.toDouble) === expected.map(_.toDouble))
    }
  }

  test("DATE_TIME: sortKey order == chronological order") {
    (1 to 5).foreach { _ =>
      val vals = Seq.fill(40) {
        f"20${10 + rnd.nextInt(20)}%d-${1 + rnd.nextInt(12)}%02d-" +
          f"${1 + rnd.nextInt(28)}%02dT${rnd.nextInt(24)}%02d:" +
          f"${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d.${rnd.nextInt(1000)}%03dZ"
      }
      val expected = vals.sorted // ISO-8601 fixed-width strings sort chronologically
      assert(sparkOrder(vals) === expected)
    }
  }

  test("STRING: sortKey order == case-sensitive binary order") {
    (1 to 5).foreach { _ =>
      val vals = Seq.fill(40) {
        val letters = "azAZmM_ :#"
        (1 to (1 + rnd.nextInt(8)))
          .map(_ => letters(rnd.nextInt(letters.length))).mkString
      }.filter(s => !s.matches("-?\\d+(\\.\\d+)?")) // keep STRING-typed
      val expected = vals.sorted
      assert(sparkOrder(vals) === expected)
    }
  }
}
