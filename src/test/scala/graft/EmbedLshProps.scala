package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the threshold-contract embedding near-dup
  * path (SRP banding → exact cosine verify). Banding recall is
  * probabilistic by design, but two contract sides are deterministic and
  * fuzzed here on random 64-dim vectors against a plain-Scala cosine
  * reference (same sequential float→double accumulation as the native
  * expression):
  *
  *  1. SOUNDNESS: every emitted pair really has cosine >= minCosine,
  *     with the exact score — banding can only lose candidates, never
  *     corrupt one (catches id-swap/join-plumbing bugs the planted
  *     ExtSpec fixture can't reach).
  *  2. IDENTICAL-VECTOR FLOOR: a verbatim duplicate vector collides in
  *     EVERY band (same signature) and is always emitted. */
object EmbedLshProps extends Properties("graft.embedlsh") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.session

  private val vec: Gen[Array[Float]] = for {
    tail <- Gen.listOfN(63, Gen.choose(-8, 8).map(_ / 4.0f))
  } yield (1.0f :: tail).toArray // head pinned nonzero: no zero vectors

  private val vecsGen: Gen[List[(Long, Array[Float])]] = for {
    n <- Gen.choose(4, 8)
    vs <- Gen.listOfN(n, vec)
  } yield vs.zipWithIndex.map { case (v, i) => ((i + 1).toLong, v) }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  property("soundness + identical-vector floor on random vectors") =
    forAll(vecsGen) { base =>
      import spark.implicits._
      // plant a verbatim duplicate of the first vector under a new id
      val all = base :+ (100L + base.head._1, base.head._2)
      val df = all.toDF("vec_id", "embedding")
      val got = graft.ext.Dedup.embedNearDupsLsh(df)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val byId = all.toMap
      val ids = all.map(_._1).sorted
      val exactRef = (for {
        a <- ids; b <- ids if a < b
        c = cosine(byId(a), byId(b)) if c >= 0.85
      } yield (a, b) -> c).toMap
      val sound = got.keySet.subsetOf(exactRef.keySet) &&
        got.forall { case (k, s) => math.abs(s - exactRef(k)) < 1e-6 }
      val floor = got.contains((base.head._1, 100L + base.head._1))
      sound && floor
    }
}
