package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck contracts for the r8 quality-signal operators: Shannon
  * entropy (information-theoretic bounds + permutation invariance — the
  * properties any entropy implementation must satisfy regardless of fold
  * order) and the temperature mixture (distribution + flattening
  * monotonicity in alpha). 10 cases per property — each runs real Spark
  * jobs over generated frames. */
object QualitySignalProps extends Properties("graft.quality") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.session
  import org.apache.spark.sql.functions._

  private val word: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)
  private val text: Gen[String] =
    Gen.nonEmptyListOf(word).map(_.mkString(" "))

  private def entropies(texts: Seq[String]): Seq[(Double, Double)] = {
    import spark.implicits._
    graft.ext.TextAnalysis.entropySignals(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getDouble(1), r.getDouble(2))).toSeq
  }

  property("entropy bounds: 0 <= H <= log2(distinct symbols)") =
    forAll(Gen.nonEmptyListOf(text)) { texts =>
      entropies(texts).zip(texts).forall { case ((hc, hw), t) =>
        val maxC = math.log(t.distinct.length.toDouble) / math.log(2)
        val maxW = math.log(t.split(" ", -1).distinct.length.toDouble) /
          math.log(2)
        hc >= 0 && hw >= 0 && hc <= maxC + 1e-6 && hw <= maxW + 1e-6
      }
    }

  property("entropy is permutation-invariant (counts, not order)") =
    forAll(text, Gen.long) { (t, seed) =>
      val perm = new scala.util.Random(seed)
        .shuffle(t.split(" ", -1).toList).mkString(" ")
      // word entropy depends only on the token multiset; char entropy
      // only on the char multiset (a space-preserving token permutation
      // preserves both)
      entropies(Seq(t)).head == entropies(Seq(perm)).head
    }

  property("all-distinct symbols give exactly log2(n)") =
    forAll(Gen.choose(1, 16)) { n =>
      // n distinct single-char words: uniform distribution over n tokens
      val t = ('a' until ('a' + n).toChar).mkString(" ")
      val hw = entropies(Seq(t)).head._2
      math.abs(hw - math.log(n.toDouble) / math.log(2)) < 1e-6
    }

  private val counts: Gen[List[Int]] =
    Gen.nonEmptyListOf(Gen.choose(1, 500)).map(_.take(8))

  private def shares(cnts: List[Int], alpha: Double): Seq[Double] = {
    import spark.implicits._
    val docs = cnts.zipWithIndex.flatMap { case (n, i) =>
      (0 until n).map(j => (i.toLong * 10000 + j, s"src$i"))
    }.toDF("doc_id", "source")
    graft.ext.Pipeline.mixTemperature(docs, alpha = alpha, budget = 1000L)
      .orderBy("source").collect().map(_.getDouble(3)).toSeq
  }

  property("temperature shares are a distribution; alpha=0 is uniform") =
    forAll(counts) { cnts =>
      val s0 = shares(cnts, 0.0)
      // shares are rounded to 6 decimals per group: the sum can drift by
      // up to k half-ulps of 1e-6 (k <= 8)
      math.abs(s0.sum - 1.0) < 5e-6 &&
        s0.forall(v => math.abs(v - 1.0 / cnts.size) < 1e-6)
    }

  property("flattening is monotone in alpha: lower alpha, flatter mix") =
    forAll(counts) { cnts =>
      val hot = shares(cnts, 1.0)
      val mid = shares(cnts, 0.5)
      math.abs(mid.sum - 1.0) < 5e-6 &&
        mid.max <= hot.max + 1e-9 && mid.min >= hot.min - 1e-9
    }
}
