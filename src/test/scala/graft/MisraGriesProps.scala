package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.functions.MisraGriesAggregator
import graft.functions.MisraGriesAggregator.MgBuf

/** ScalaCheck contracts for the mergeable Misra–Gries summary — the
  * candidate pass of the exact heavy-hitters operator. The operator's
  * exactness rests entirely on ONE property: for ANY split of the stream
  * into partitions and ANY merge tree over the partial summaries, every
  * item with true frequency > N/(capacity+1) must survive into the
  * candidate set (the recount pass then restores exact counts). These run
  * PURE (no Spark jobs): small alphabets force heavy collisions, tiny
  * capacities force constant evictions, and the merge tree is folded in
  * adversarial chunk orders.
  */
object MisraGriesProps extends Properties("graft.misragries") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  // Zipf-ish streams over a small alphabet: a few hot tokens + a noise tail
  private val token: Gen[String] = Gen.frequency(
    (5, Gen.oneOf("hot1", "hot2", "hot3")),
    (3, Gen.oneOf((0 until 20).map(i => s"mid$i"))),
    (2, Gen.choose(0, 500).map(i => s"tail$i")))

  private val stream: Gen[List[String]] =
    Gen.choose(0, 600).flatMap(n => Gen.listOfN(n, token))

  private val capGen: Gen[Int] = Gen.choose(1, 24)

  private def reduceAll(cap: Int, xs: List[String]): MgBuf = {
    val agg = MisraGriesAggregator.agg(cap)
    xs.foldLeft(agg.zero)(agg.reduce)
  }

  /** Split into `parts` chunks, summarize each, merge left-to-right. */
  private def summarize(cap: Int, xs: List[String], parts: Int): MgBuf = {
    val agg = MisraGriesAggregator.agg(cap)
    val size = math.max(1, math.ceil(xs.size.toDouble / parts).toInt)
    xs.grouped(size).map(reduceAll(cap, _))
      .foldLeft(agg.zero)(agg.merge)
  }

  property("buffer never exceeds capacity (reduce and merge)") =
    forAll(stream, capGen, Gen.choose(1, 6)) { (xs, cap, parts) =>
      summarize(cap, xs, parts).counts.size <= cap &&
        reduceAll(cap, xs).counts.size <= cap
    }

  property("single-pass summary keeps every item with freq > N/(cap+1)") =
    forAll(stream, capGen) { (xs, cap) =>
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong)
      val floor = xs.size.toDouble / (cap + 1)
      val kept = reduceAll(cap, xs).counts.keySet
      exact.filter(_._2 > floor).keys.forall(kept.contains)
    }

  property("any partition split + merge keeps every freq > N/(cap+1) item") =
    forAll(stream, capGen, Gen.choose(1, 6)) { (xs, cap, parts) =>
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong)
      val floor = xs.size.toDouble / (cap + 1)
      val kept = summarize(cap, xs, parts).counts.keySet
      exact.filter(_._2 > floor).keys.forall(kept.contains)
    }

  /** Random BINARY merge tree (not just a left fold): Spark's partial
    * aggregation merges in whatever shape the scheduler produces. */
  private def summarizeTree(cap: Int, xs: List[String], parts: Int,
      seed: Long): MgBuf = {
    val agg = MisraGriesAggregator.agg(cap)
    val size = math.max(1, math.ceil(xs.size.toDouble / parts).toInt)
    val rnd = new scala.util.Random(seed)
    var bufs = xs.grouped(size).map(reduceAll(cap, _)).toVector
    if (bufs.isEmpty) agg.zero
    else {
      while (bufs.size > 1) {
        val i = rnd.nextInt(bufs.size - 1)
        val merged = agg.merge(bufs(i), bufs(i + 1))
        bufs = (bufs.take(i) :+ merged) ++ bufs.drop(i + 2)
      }
      bufs.head
    }
  }

  property("any MERGE TREE shape keeps every freq > N/(cap+1) item") =
    forAll(stream, capGen, Gen.choose(1, 6), Gen.choose(0L, 1000L)) {
      (xs, cap, parts, seed) =>
        val exact = xs.groupBy(identity).view.mapValues(_.size.toLong)
        val floor = xs.size.toDouble / (cap + 1)
        val kept = summarizeTree(cap, xs, parts, seed).counts.keySet
        exact.filter(_._2 > floor).keys.forall(kept.contains)
    }

  property("summary counts never overcount the true frequency") =
    forAll(stream, capGen, Gen.choose(1, 6)) { (xs, cap, parts) =>
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      summarize(cap, xs, parts).counts.forall { case (k, v) =>
        v <= exact.getOrElse(k, 0L)
      }
    }

  /** The end-to-end exactness shape the operator is built on: candidate
    * superset + exact recount == plain group-by at threshold ⌈φN⌉
    * whenever capacity·φ ≥ 2. */
  property("candidates + recount equals GROUP BY HAVING at ceil(phi*N)") =
    forAll(stream, Gen.choose(1, 10), Gen.choose(1, 6)) { (xs, philn, parts) =>
      val phi = philn / 20.0 // 0.05 .. 0.5
      val cap = math.max(1, math.ceil(2.0 / phi).toInt)
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val threshold = math.max(1L, math.ceil(phi * xs.size).toLong)
      val expected = exact.filter(_._2 >= threshold)
      val cands = summarize(cap, xs, parts).counts.keySet
      val recounted = exact.view.filterKeys(cands.contains)
        .filter(_._2 >= threshold).toMap
      recounted == expected
    }
}
