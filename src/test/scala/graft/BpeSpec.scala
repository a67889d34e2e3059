package graft

import graft.ext.Bpe
import org.apache.spark.sql.functions._

/** BPE tokenizer training: hand-computed merge expectations, encode
  * properties, and distributed-vs-plain-Scala equality. */
class BpeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("merge loop matches the hand-computed classic BPE example") {
    // {low:3, lower:1, lowest:1}: round 1 ties (l,o)/(o,w) at 5 → lexico
    // smallest (l,o); then (lo,w) at 5; then (low,e) at 2.
    val freq = Map("low" -> 3L, "lower" -> 1L, "lowest" -> 1L)
    val m = Bpe.trainFromFreq(freq, 3)
    assert(m.merges === Seq(("l", "o"), ("lo", "w"), ("low", "e")))
    assert(Bpe.encode("low", m.merges) === Vector("low"))
    assert(Bpe.encode("lower", m.merges) === Vector("lowe", "r"))
    assert(Bpe.encode("lowest", m.merges) === Vector("lowe", "s", "t"))
    assert(m.segments === Map("low" -> 1, "lower" -> 2, "lowest" -> 3))
  }

  test("training stops when no pairs remain (merge exhaustion)") {
    val m = Bpe.trainFromFreq(Map("ab" -> 1L, "c" -> 5L), 10)
    assert(m.merges === Seq(("a", "b")))
    assert(m.segments === Map("ab" -> 1, "c" -> 1))
  }

  test("encode reconstructs the word and is monotone in merge count") {
    val docs = graft.Tables.documents(spark, sf)
    val m20 = Bpe.train(docs, 20)
    val m5 = Bpe.Model(m20.merges.take(5), Map.empty)
    m20.segments.keysIterator.take(200).foreach { w =>
      val e20 = Bpe.encode(w, m20.merges)
      assert(e20.mkString === w) // sub-tokens concatenate back to the word
      assert(e20.length <= Bpe.encode(w, m5.merges).length) // more merges, fewer tokens
      assert(e20.length >= 1)
    }
  }

  test("distributed word-dict training == plain-Scala dict training") {
    val docs = graft.Tables.documents(spark, sf)
    val distributed = Bpe.train(docs, 15)
    val localFreq = docs.collect()
      .flatMap(_.getAs[String]("text").split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val local = Bpe.trainFromFreq(localFreq, 15)
    assert(distributed.merges === local.merges)
    assert(distributed.segments === local.segments)
  }

  test("subtokenCounts: broadcast-join apply equals the driver-side computation") {
    val docs = graft.Tables.documents(spark, sf)
    val model = Bpe.train(docs, 20)
    val got = Bpe.subtokenCounts(docs, model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val expected = docs.select("doc_id", "text").collect()
      .map { r =>
        val ws = r.getString(1).split(" ").filter(_.nonEmpty)
        (r.getLong(0), ws.length.toLong,
          ws.map(w => Bpe.encode(w, model.merges).length.toLong).sum)
      }
      .filter(_._2 > 0).sortBy(_._1).toSeq
    assert(got === expected)
  }

  test("train fails fast when the word dict exceeds the driver bound") {
    import spark.implicits._
    val docs = Seq((1L, "aa bb cc dd")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      Bpe.train(docs, numMerges = 2, maxDictWords = 3))
    assert(e.getMessage.contains("driver bound"))
    // at the bound exactly, training proceeds
    assert(Bpe.train(docs, numMerges = 2, maxDictWords = 4).merges.nonEmpty)
  }

  test("pretrainedMerges is exactly what train() learns on sf0.001 — the artifact can't drift") {
    val docs = graft.Tables.documents(spark, sf)
    assert(Bpe.train(docs, 24).merges === Bpe.pretrainedMerges)
    // the separator must stay outside the corpus alphabet or the
    // replace-chain symbol encoding could false-match
    val alphabet = docs.select(
      org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), "")).as("ch"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(!alphabet.contains(","))
  }

  test("replace-chain projection == driver-side encode, for every corpus word and edge cases") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // corpus vocab + adversarial edges: single char, a word that IS a
    // merged symbol, repeated-symbol runs (greedy non-overlap), unseen
    // letters the merges never touch, the empty word, and the
    // symbol-BOUNDARY collision words the unwrapped chain got wrong:
    // 'cow' ([c][ow] — pattern c,o must NOT match the o inside ow),
    // 'cord'/'corn' ([c][or][d/n] — same prefix collision via (o,r)),
    // 'scant' (s+can merge then t — suffix collision shape), and
    // doubled forms exercising consecutive-boundary sep sharing
    val words = graft.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w")).distinct()
      .union(Seq("e", "er", "ererer", "column", "window", "qqq", "sortsort",
        "", "cow", "cord", "corn", "cows", "scant", "cowcow", "corder",
        "colu", "colum", "wind", "indow", "dowdow")
        .toDF("w"))
      .distinct()
    val got = words.select(col("w"), Bpe.subtokenCountCol(col("w")).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1))
    got.foreach { case (w, n) =>
      assert(n === Bpe.encode(w, Bpe.pretrainedMerges).length,
        s"chain != encode for '$w'")
    }
    // 'cow' specifically is the ADVICE repro: true BPE is [c][ow] = 2
    assert(Bpe.encode("cow", Bpe.pretrainedMerges) === Vector("c", "ow"))
    assert(got.toMap.apply("cow") === 2)
  }

  test("replace-chain projection == encode on random words over the merge alphabet (fuzz)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // every character that appears in any pretrained merge — random words
    // over exactly this alphabet maximize boundary-collision pressure
    val alphabet = Bpe.pretrainedMerges
      .flatMap { case (a, b) => a + b }.distinct.toVector
    val rnd = new scala.util.Random(41)
    val words = Vector.fill(400) {
      val len = 1 + rnd.nextInt(10)
      (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.size))).mkString
    }.distinct
    val got = words.toDF("w")
      .select(col("w"), Bpe.subtokenCountCol(col("w")).as("n"))
      .collect().map(r => r.getString(0) -> r.getInt(1))
    got.foreach { case (w, n) =>
      assert(n === Bpe.encode(w, Bpe.pretrainedMerges).length,
        s"chain != encode for '$w'")
    }
  }
}
