package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.functions.TopKAggregator
import graft.functions.TopKAggregator.{Buf, Entry}

/** ScalaCheck contracts for the bounded top-k aggregator — the partial
  * aggregation core of the exact k-NN join. The whole scale story rests
  * on partial+final being SOUND: any split of the input into partitions,
  * reduced locally and merged in any tree shape, must equal the global
  * sort-take-k. These run PURE (no Spark jobs), so they fuzz hard:
  * duplicate scores (tie-break by id), NaN-free doubles, k above and
  * below the input size, adversarial partition splits.
  */
object TopKProps extends Properties("graft.topk") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  private val entry: Gen[Entry] = for {
    // coarse scores force score collisions so the id tie-break is exercised
    s <- Gen.choose(0, 8)
    id <- Gen.choose(0L, 50L)
  } yield Entry(s / 4.0, id)

  private val entries: Gen[List[Entry]] = Gen.listOf(entry)
  private val kGen: Gen[Int] = Gen.choose(1, 12)

  /** The specification: DISTINCT entries (the aggregator is idempotent
    * on identical (score, id) pairs — set semantics, which is what lets
    * multi-route candidate generators skip their dropDuplicates
    * pre-pass), global sort by (score desc, id asc), take k. */
  private def reference(xs: List[Entry], k: Int): Seq[Entry] =
    xs.distinct.sortBy(e => (-e.score, e.id)).take(k)

  private def reduceAll(agg: org.apache.spark.sql.expressions.Aggregator[
      Entry, Buf, Seq[Entry]], xs: List[Entry]): Buf =
    xs.foldLeft(agg.zero)(agg.reduce)

  property("sequential reduce equals sort-take-k") =
    forAll(entries, kGen) { (xs, k) =>
      val agg = TopKAggregator.agg(k)
      agg.finish(reduceAll(agg, xs)) == reference(xs, k)
    }

  property("any partition split + merge equals sort-take-k") =
    forAll(entries, kGen, Gen.choose(1, 6)) { (xs, k, parts) =>
      val agg = TopKAggregator.agg(k)
      // split round-robin into `parts` partials (adversarial interleave),
      // merge left-to-right like a final-stage combine
      val partials = xs.zipWithIndex.groupBy(_._2 % parts).values
        .map(g => reduceAll(agg, g.map(_._1)))
      val merged = partials.reduceOption(agg.merge).getOrElse(agg.zero)
      agg.finish(merged) == reference(xs, k)
    }

  property("merge order does not matter (reversed tree)") =
    forAll(entries, kGen, Gen.choose(2, 5)) { (xs, k, parts) =>
      val agg = TopKAggregator.agg(k)
      val groups = xs.zipWithIndex.groupBy(_._2 % parts).values
        .map(g => g.map(_._1)).toList
      val fwd = groups.map(reduceAll(agg, _))
        .reduceOption(agg.merge).getOrElse(agg.zero).items
      // fresh buffers for the reversed pass: merge mutates its left arg
      val rev = groups.reverse.map(reduceAll(agg, _))
        .reduceOption(agg.merge).getOrElse(agg.zero).items
      fwd == rev
    }

  property("buffer never exceeds k, stays STRICTLY sorted (no duplicates)") =
    forAll(entries, kGen) { (xs, k) =>
      val agg = TopKAggregator.agg(k)
      val b = reduceAll(agg, xs)
      // strict: idempotent insertion means equal (score, id) pairs never
      // occupy two slots, so consecutive entries are strictly ordered
      val sorted = b.items.sliding(2).forall {
        case Seq(a, c) => a.score > c.score ||
          (a.score == c.score && a.id < c.id)
        case _ => true
      }
      b.items.size <= math.min(k, xs.distinct.size) && sorted
    }

  property("NaN-scored duplicates dedup and rank LAST (total-order keys)") =
    forAll(entries, kGen, Gen.choose(1L, 5L)) { (xs, k, nanId) =>
      // raw == is false for NaN against itself — the aggregator compares
      // through canonical score keys, so a NaN duplicate must not fill
      // slots; compare results the same way (case-class == on NaN would
      // only pass via a shared-instance shortcut, a refactor trap)
      def canon(s: Seq[Entry]): Seq[(Long, Long)] =
        s.map(e => (java.lang.Double.doubleToLongBits(e.score), e.id))
      val withNan = Entry(Double.NaN, nanId) :: xs
      val agg = TopKAggregator.agg(k)
      val once = agg.finish(reduceAll(agg, withNan))
      val dup = agg.finish(reduceAll(agg, withNan ++ withNan))
      val acrossParts = agg.finish(agg.merge(
        reduceAll(agg, withNan), reduceAll(agg, withNan)))
      // garbage never outranks a real score: NaN entries form a SUFFIX
      val nanLast = {
        val i = once.indexWhere(_.score.isNaN)
        i == -1 || once.drop(i).forall(_.score.isNaN)
      }
      canon(once) == canon(dup) && canon(once) == canon(acrossParts) &&
        once.count(e => e.score.isNaN && e.id == nanId) <= 1 && nanLast
    }

  property("duplicated inputs change nothing: reduce and merge are idempotent") =
    forAll(entries, kGen, Gen.choose(1, 4)) { (xs, k, copies) =>
      val agg = TopKAggregator.agg(k)
      val once = agg.finish(reduceAll(agg, xs))
      // duplicates inside one partition (sequential reduce path)…
      val inline = agg.finish(reduceAll(agg,
        List.fill(copies + 1)(xs).flatten))
      // …and duplicates ACROSS partitions (the multi-table LSH shape:
      // every partial holds the same pairs, merged at the final stage)
      val across = agg.finish(
        List.fill(copies + 1)(reduceAll(agg, xs)).reduce(agg.merge))
      inline == once && across == once
    }
}
