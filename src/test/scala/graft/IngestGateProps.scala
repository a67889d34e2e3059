package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the ingest-time near-dup gate, which has no
  * SQL oracle (banded-LSH candidate generation is probabilistic) and was
  * covered only by example tests. Two sides of its contract ARE
  * deterministic, and both are pinned here on random corpora/batches:
  *
  *  1. SOUNDNESS (verify-before-act): every doc the gate DROPS has an
  *     exact-Jaccard >= 0.5 partner in the corpus — the gate never loses
  *     a non-duplicate, under any corpus, ever. (The converse — every
  *     near-dup dropped — is probabilistic by design: banding can miss.)
  *  2. EXACT-DUP RECALL FLOOR: a batch doc whose text appears verbatim
  *     in the corpus is ALWAYS dropped — identical texts have identical
  *     shingle sets, hence identical signatures and bands, so a
  *     re-crawl/mirror cannot slip past the gate.
  *
  * Reference math is plain Scala (shingle sets + pairwise Jaccard), no
  * Spark. Tiny alphabet forces dense near-dup structure. */
object IngestGateProps extends Properties("graft.ingestgate") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.session

  private val word = Gen.oneOf("aa", "bb", "cc", "dd", "ee")
  private def docList(n0: Int, n1: Int, base: Long): Gen[List[(Long, String)]] =
    for {
      n <- Gen.choose(n0, n1)
      texts <- Gen.listOfN(n, for {
        len <- Gen.choose(3, 7)
        toks <- Gen.listOfN(len, word)
      } yield toks.mkString(" "))
    } yield texts.zipWithIndex.map { case (t, i) => (base + i, t) }

  private def shingles(text: String): Set[String] = {
    val toks = text.split(" ")
    (0 to toks.length - 3).map(i => toks.slice(i, i + 3).mkString(" ")).toSet
  }

  private def jaccard(a: Set[String], b: Set[String]): Double = {
    val inter = a.intersect(b).size
    inter.toDouble / (a.size + b.size - inter)
  }

  property("soundness + exact-dup floor: drops are true near-dups; verbatim re-crawls never survive") =
    forAll(docList(3, 8, 1L), docList(2, 6, 101L)) { (corpus, batch0) =>
      import spark.implicits._
      // plant one guaranteed verbatim re-crawl so the floor is non-vacuous
      val batch = (200L, corpus.head._2) :: batch0
      val index = graft.ext.Dedup.buildIngestIndex(corpus.toDF("doc_id", "text"))
      val survivors =
        try graft.ext.Dedup.nearDupIngestGate(batch.toDF("doc_id", "text"), index)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        finally index.close()
      val dropped = batch.map(_._1).toSet -- survivors
      val corpusSh = corpus.map { case (_, t) => shingles(t) }
      val batchSh = batch.toMap.view.mapValues(shingles).toMap
      val soundness = dropped.forall(d =>
        corpusSh.exists(c => jaccard(batchSh(d), c) >= 0.5))
      val verbatim = batch.collect {
        case (id, t) if corpus.exists(_._2 == t) => id
      }.toSet
      val floor = verbatim.subsetOf(dropped)
      soundness && floor
    }
}
