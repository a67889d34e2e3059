package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Distributed BPE tokenizer training — the piece of a training-data
  * pipeline that turns a corpus into a tokenizer, not just counts under an
  * existing one ([[TextAnalysis.bpeTokenCounts]] is the latter).
  *
  * Split of labor (the standard production shape — GPT-2's reference
  * trainer operates on a word-frequency dict, not the raw corpus):
  *  - the CORPUS-sized pass is distributed: one explode + hash-aggregate
  *    builds the word-frequency dict (a single shuffle whose output is
  *    vocab-bounded, i.e. tiny relative to the corpus at any scale);
  *  - the VOCAB-sized merge loop runs driver-side over that dict, like
  *    the FAISS-style driver-resident quantizers in [[Similarity]]: at
  *    100 TB the dict of distinct whitespace words is millions of rows —
  *    megabytes — and iterating k merges over it distributed would pay k
  *    job launches to save nothing.
  *  - APPLYING the tokenizer is distributed and UDF-free: the learned
  *    segmentation is itself vocab-bounded, so it broadcast-joins against
  *    the exploded corpus (unseen words fall back to character count) and
  *    the per-doc aggregate is one hash-agg. The corpus never shuffles
  *    with payloads; only (doc_id, word) pairs reach the join.
  *
  * Merge semantics are classic BPE: symbols start as characters; each
  * round merges the most frequent adjacent pair (ties → lexicographically
  * smallest pair, so training is deterministic); encoding applies merges
  * in learned order, each greedily left-to-right. Training and encoding
  * are spec-tested against hand-computed corpora and an independent
  * plain-Scala path (BpeSpec).
  */
object Bpe {

  /** A trained BPE model: ordered merges plus the training vocab's
    * ready-made segmentations (word → encoded sub-token count). */
  final case class Model(merges: Seq[(String, String)],
                         segments: Map[String, Int])

  /** Learn `numMerges` merges from the corpus (distributed word count,
    * driver-side merge loop — see object scaladoc). The dict collect is
    * BOUNDED, not just documented: at most `maxDictWords + 1` rows ever
    * reach the driver (`limit` caps the collect itself, so an over-bound
    * corpus fails fast on a cheap probe instead of OOMing the driver
    * mid-collect); callers with genuinely larger vocabularies raise the
    * bound consciously or pre-filter rare words (the standard min-count
    * trim) first. */
  def train(docs: DataFrame, numMerges: Int,
      maxDictWords: Int = 10000000): Model = {
    val rows = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .limit(maxDictWords + 1)
      .collect()
    require(rows.length <= maxDictWords,
      s"Bpe.train: word dict exceeds the $maxDictWords-row driver bound — " +
        "raise maxDictWords or pre-filter rare words (min-count trim)")
    trainFromFreq(rows.map(r => r.getString(0) -> r.getLong(1)).toMap, numMerges)
  }

  /** The driver-side trainer — public for the spec's independent-path
    * equality check (distributed dict == plain-Scala dict). */
  def trainFromFreq(wordFreq: Map[String, Long], numMerges: Int): Model = {
    var words: Vector[(Vector[String], Long)] = wordFreq.toVector
      .map { case (w, c) => (w.map(_.toString).toVector, c) }
    val merges = Vector.newBuilder[(String, String)]
    var made = 0
    var exhausted = false
    while (made < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        pairCounts.updateWith((syms(i), syms(i + 1)))(p => Some(p.getOrElse(0L) + c))
      if (pairCounts.isEmpty) exhausted = true
      else {
        // highest count; ties broken by lexicographically smallest pair
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) => (mergeOnce(syms, best._1, best._2), c) }
        made += 1
      }
    }
    val ms = merges.result()
    // the final `words` state ALREADY holds each word's exact post-merge
    // segmentation (the loop applied every merge in rank order — the
    // same fold encode() runs): re-encoding the whole vocabulary from
    // scratch was O(V × merges) redundant mergeOnce passes on the
    // driver. Symbols concatenate back to the original word, so the key
    // reconstructs for free.
    Model(ms, words.iterator
      .map { case (syms, _) => syms.mkString -> syms.length }.toMap)
  }

  /** One greedy left-to-right pass replacing adjacent (a, b) with a+b. */
  private def mergeOnce(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Encode a word under the learned merges (applied in rank order). */
  def encode(word: String, merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(word.map(_.toString).toVector) {
      case (syms, (a, b)) => mergeOnce(syms, a, b)
    }

  /** The committed tokenizer artifact: 24 merges [[train]]ed on the
    * sf0.001 documents corpus — the production shape (train once, ship
    * the merge list, apply everywhere). BpeSpec re-trains from the same
    * corpus and asserts equality, so this constant cannot silently drift
    * from the trainer. */
  val pretrainedMerges: Seq[(String, String)] = Seq(
    "e" -> "r", "o" -> "r", "i" -> "n", "o" -> "w", "s" -> "t",
    "l" -> "u", "a" -> "r", "p" -> "ar", "m" -> "er", "a" -> "t",
    "a" -> "n", "c" -> "an", "s" -> "can", "c" -> "o", "co" -> "lu",
    "colu" -> "m", "colum" -> "n", "d" -> "ow", "in" -> "dow",
    "w" -> "indow", "d" -> "er", "or" -> "der", "or" -> "t", "s" -> "ort")

  /** Separator for the replace-chain symbol encoding below — any char
    * outside the corpus alphabet works (the documents tables are space +
    * lowercase letters; asserted impossible to collide in BpeSpec). */
  private[ext] val sep = ","

  /** Merge application as a PURE STRING PROJECTION — the trained
    * tokenizer's distributed apply. A word's symbol vector is encoded
    * BOUNDARY-WRAPPED: every symbol is enclosed in single `sep`s, so the
    * string is `,c,,o,,w,` and the boundary between symbols is exactly
    * `sep+sep`. Each merge (a, b) is one literal
    * `replace(s, ",a,,b,", ",ab,")`. The wrapping is what makes a literal
    * match align ONLY on whole symbols: the pattern's leading `sep`
    * forces `a` to start at a symbol start (a mid-symbol suffix like the
    * `a` in `xa` is preceded by `x`, not `sep`), the interior `sep+sep`
    * forces a true symbol boundary, and the trailing `sep` forces `b` to
    * end at a symbol end (a mid-symbol prefix like the `o` in `ow` is
    * followed by `w`, not `sep`) — the unwrapped form `replace("a,b")`
    * false-matched both ways (`'cow'` → `c,ow` → `cow`: 1 token vs true
    * BPE's 2). Left-to-right non-overlapping replace then equals
    * [[mergeOnce]]'s greedy pass: consecutive merge sites each take one
    * `sep` from the shared `sep+sep` boundary, so `[a,b,a,b]` merges
    * twice, and replaced output is never rescanned, matching
    * `mergeOnce`'s i+2 skip. Chain == [[encode]] for EVERY word
    * (property-tested in BpeSpec incl. the boundary-collision words
    * `cow`/`cord`/`corn`), and the DuckDB twin inlines the identical
    * chain. Unlike [[subtokenCounts]]' broadcast-join of the
    * training-vocab segmentation table (char-count fallback on unseen
    * words), the chain computes the TRUE segmentation of any word, seen
    * or not, with zero joins, zero shuffles, and no driver-side vocab —
    * codegen'd string ops all the way down. */
  def subtokenCountCol(word: org.apache.spark.sql.Column,
      merges: Seq[(String, String)] = pretrainedMerges): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val chain = merges.foldLeft(
      concat(lit(sep), concat_ws(sep + sep, split(word, "")), lit(sep))) {
      case (s, (a, b)) =>
        replace(s, lit(sep + a + sep + sep + b + sep), lit(sep + a + b + sep))
    }
    // n symbols ↔ n-1 interior `sep+sep` boundaries; empty word → 0 (what
    // encode("") returns), pinned explicitly so neither engine's
    // split-of-empty-string convention leaks in
    when(length(word) === 0, lit(0)).otherwise(size(split(chain, sep + sep)))
  }

  /** The DuckDB twin of [[subtokenCountCol]]: the same boundary-wrapped
    * literal replace chain over `exprW` (a SQL expression yielding the
    * word). */
  def subtokenCountSql(exprW: String,
      merges: Seq[(String, String)] = pretrainedMerges): String = {
    val chain = merges.foldLeft(
      s"'$sep' || array_to_string(string_split($exprW, ''), '$sep$sep') || '$sep'") {
      case (s, (a, b)) =>
        s"replace($s, '$sep$a$sep$sep$b$sep', '$sep$a$b$sep')"
    }
    s"CASE WHEN length($exprW) = 0 THEN 0 ELSE len(string_split($chain, '$sep$sep')) END"
  }

  /** Per-document sub-token counts under a trained model, distributed:
    * explode the corpus into (doc_id, word), broadcast-join the
    * vocab-bounded segmentation table (words the model never saw fall
    * back to their character count — what char-level BPE degrades to),
    * one hash-agg per doc. */
  def subtokenCounts(docs: DataFrame, model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val seg = model.segments.toSeq.toDF("w", "n_sub")
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .join(broadcast(seg), Seq("w"), "left")
      .withColumn("n_sub", coalesce(col("n_sub"), length(col("w"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_subtokens"))
      .orderBy("doc_id")
  }
}
