package graft

import graft.ext.Bpe
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck contract for the boundary-wrapped BPE replace chain: for
  * ARBITRARY merge lists — not just the committed pretrained artifact —
  * the chain projection evaluated by Spark equals the driver-side greedy
  * [[Bpe.encode]], word for word. This is the fixture-independent form of
  * the r8 ADVICE fix: the unwrapped chain's symbol-boundary false-match
  * ('cow' → [c][ow] fused by a (c,o) rule) is exactly the class of bug a
  * random merge pool over a 3-letter alphabet manufactures constantly
  * (merged symbols immediately share prefixes/suffixes with raw letters
  * and with each other).
  *
  * Merge lists are generated the way BPE actually produces them: a
  * symbol pool seeded with the alphabet, each step merging two pooled
  * symbols (repeats allowed — (a,a) runs exercise greedy non-overlap)
  * and adding the product back to the pool, so later merges can consume
  * earlier merges' outputs — the composed-symbol regime where boundary
  * anchoring has to hold. */
object BpeChainProps extends Properties("graft.bpechain") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkSpec.session

  private val alphabet = Vector("a", "b", "c")

  private val mergesGen: Gen[List[(String, String)]] =
    Gen.choose(0, 10).flatMap { n =>
      def step(pool: Vector[String], left: Int,
          acc: List[(String, String)]): Gen[List[(String, String)]] =
        if (left == 0) Gen.const(acc.reverse)
        else for {
          x <- Gen.oneOf(pool)
          y <- Gen.oneOf(pool)
          r <- step(pool :+ (x + y), left - 1, (x, y) :: acc)
        } yield r
      step(alphabet, n, Nil)
    }

  private val wordsGen: Gen[List[String]] =
    Gen.listOfN(25, Gen.choose(0, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(alphabet)).map(_.mkString)))

  property("spark-evaluated chain count == driver encode, any merge list") =
    forAll(mergesGen, wordsGen) { (merges, words) =>
      import spark.implicits._
      val got = words.distinct.toDF("w")
        .select(col("w"), Bpe.subtokenCountCol(col("w"), merges).as("n"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      words.distinct.forall { w =>
        got(w) == Bpe.encode(w, merges).length
      }
    }
}
