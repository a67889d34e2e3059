package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** [EXT] Text analysis for training-data pipelines: token counting
  * (whitespace + BPE-ish regex), quality scoring (length / stopword /
  * diversity ratios), language ID (marker-n-gram heuristic), and document
  * fingerprinting (winnowing over rolling windows).
  *
  * Public API is DataFrame-in/DataFrame-out over any frame with
  * `(doc_id, text)` columns; the `queries` map binds them to the driver
  * testdata. Everything is Catalyst built-ins (split / regexp_extract_all /
  * higher-order array functions) — codegen-friendly, no UDFs, scales
  * linearly in tokens with zero shuffles (all per-row projections).
  */
object TextAnalysis {
  type Q = (SparkSession, String) => DataFrame

  private val stopwords = Seq("the", "a", "an", "and", "of", "to", "in")
  private[ext] val stopList = stopwords.map(w => s"'$w'").mkString("(", ", ", ")")
  private[ext] val bpeRegex = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

  /** Tiny per-language marker profiles (n-gram heuristic). Real pipelines
    * use fastText-style models; the Spark plumbing is identical. */
  private val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "es" -> Seq("el", "la", "que", "de", "los"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq() // handled by CJK codepoint detection below
  )

  private def tokens: Column = split(col("text"), " ")

  /** Whether this session permits broadcast joins — the LM-side ceiling
    * knob: `spark.sql.autoBroadcastJoinThreshold <= 0` disables them. */
  private def broadcastsEnabled(df: DataFrame): Boolean = {
    val v = df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10MB").trim
    !v.startsWith("-") &&
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v) > 0
  }

  /** The vocab-scale LM side of a scoring join. The LM is vocab-bounded
    * and Zipf-small, so it broadcasts by default — but at 100 TB a
    * raw-token vocab can outgrow the broadcast ceiling, and when the
    * session says so (`autoBroadcastJoinThreshold` disabled/zero, the same
    * knob Spark's own planner keys off) the join re-plans as a key-wise
    * shuffle HASH join: the exploded corpus shuffles once on the token
    * key but never pays a sort (`shuffle_hash`, not sort-merge — gated by
    * ExtSpec's fallback test, which proves both paths hash-identical).
    * Class-count / single-row frames stay broadcast unconditionally:
    * they are bounded by the class dictionary at any corpus size. */
  private def lmSide(lm: DataFrame): DataFrame =
    if (broadcastsEnabled(lm)) broadcast(lm) else lm.hint("shuffle_hash")

  /** EXACT corpus φ-heavy hitters (tokens with frequency ≥ ⌈φ·N⌉) via the
    * classic two-pass scale shape — the corpus-vocabulary query that a
    * naive `groupBy(token)` answers with a shuffle of the ENTIRE distinct
    * vocabulary:
    *
    * Pass 1 — candidates: one aggregation through the bounded
    * [[graft.functions.MisraGriesAggregator]] (plus the token total `N`
    * in the same job). Each map task ships ≤ `capacity` counters, so the
    * exchange is O(tasks × capacity) regardless of vocabulary size, and
    * the merged candidate set (≤ capacity strings, bounded driver state)
    * is a GUARANTEED superset of the φ-heavy tokens whenever
    * capacity·φ ≥ 2 (enforced; MG undercount ≤ N/(capacity+1) < φN/2).
    *
    * Pass 2 — exact recount: re-scan with `token IN candidates` (an
    * `InSet` probe in the scan stage — only candidate tokens survive to
    * the shuffle) and filter to ≥ ⌈φ·N⌉. The recount makes the answer
    * EXACT and partitioning-independent — equal to the plain
    * GROUP BY + HAVING, which is the DuckDB oracle — while the shuffled
    * volume stays candidate-bounded in both passes. */
  def heavyHitters(docs: DataFrame, phi: Double = 0.002,
      capacity: Int = 2048): DataFrame = {
    require(phi > 0 && phi < 1, s"phi must be in (0,1), got $phi")
    require(capacity * phi >= 2.0,
      s"capacity ($capacity) too small for phi=$phi: the MG superset " +
        s"guarantee needs capacity * phi >= 2")
    val toks = docs.select(explode(tokens).as("token"))
    val mg = udaf(graft.functions.MisraGriesAggregator.agg(capacity))
    val pass1 = toks
      .agg(mg(col("token")).as("cands"), count(lit(1)).as("n")).head()
    val cands = pass1.getSeq[String](0)
    val threshold = math.max(1L, math.ceil(phi * pass1.getLong(1)).toLong)
    if (cands.isEmpty) // empty corpus: a schema-stable empty result
      return toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .filter(lit(false))
    toks.filter(col("token").isInCollection(cands))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
      .orderBy(col("cnt").desc, col("token"))
  }

  /** Token + length statistics (whitespace tokenizer). */
  def textStats(docs: DataFrame): DataFrame = docs
    .withColumn("tokens", tokens)
    .select(col("doc_id"),
      length(col("text")).as("n_chars"),
      size(col("tokens")).as("n_tokens"),
      size(array_distinct(col("tokens"))).as("n_uniq_tokens"),
      ((length(col("text")) - size(col("tokens")) + 1).cast("double")
        / size(col("tokens"))).as("avg_token_len"))

  /** BPE-ish regex tokenizer count: letter runs, digit runs, single punct. */
  def bpeTokenCounts(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(bpeRegex), lit(0)))
        .as("n_bpe_tokens"))

  /** Quality scoring: stopword ratio + lexical diversity (type/token). */
  def qualityScores(docs: DataFrame): DataFrame = docs
    .withColumn("tokens", tokens)
    .withColumn("n_tok", size(col("tokens")))
    .withColumn("n_stop", expr(s"size(filter(tokens, t -> t IN $stopList))"))
    .withColumn("n_uniq", size(array_distinct(col("tokens"))))
    .select(col("doc_id"), col("n_tok"), col("n_stop"),
      (col("n_stop").cast("double") / col("n_tok")).as("stopword_ratio"),
      (col("n_uniq").cast("double") / col("n_tok")).as("type_token_ratio"))

  /** Shannon-entropy quality signals (the Gopher/CCNet-family repetition
    * filters' information-theoretic cousin): character-level and
    * word-level unigram entropy per document. Low char entropy flags
    * boilerplate/padding (one dominant symbol class); low word entropy
    * flags template/repetitive text that a plain length filter passes.
    *
    * Entirely row-local higher-order functions — O(len × alphabet) per
    * doc, zero shuffles at any corpus size. The fold runs over the
    * SORTED distinct symbols so the floating-point accumulation order is
    * deterministic and engine-portable (the DuckDB twin folds an
    * identically ordered count list). */
  def entropySignals(docs: DataFrame): DataFrame = {
    def entropyOf(c: String): Column = expr(
      s"""round(cast(0.0 as double) - aggregate(
         |  transform(array_sort(array_distinct($c)),
         |            u -> size(filter($c, x -> x = u))),
         |  cast(0.0 as double),
         |  (acc, cnt) -> acc
         |    + (cnt / cast(size($c) as double))
         |      * log2(cnt / cast(size($c) as double))), 6)""".stripMargin)
    docs
      .withColumn("chars", split(col("text"), ""))
      .withColumn("words", tokens)
      .select(col("doc_id"),
        entropyOf("chars").as("char_entropy"),
        entropyOf("words").as("word_entropy"))
  }

  /** Language ID: CJK codepoint check, else argmax over marker-word hits
    * (deterministic tie-break by language ordinal). Keeps every input
    * column needed downstream plus `predicted_lang`. */
  def languageId(docs: DataFrame): DataFrame = {
    val scored = Seq("en", "de", "es", "fr").foldLeft(
      docs.withColumn("tokens", tokens)) {
      case (df, lang) =>
        val markers = langMarkers(lang).map(w => s"'$w'").mkString("(", ", ", ")")
        df.withColumn(s"score_$lang",
          expr(s"size(filter(tokens, t -> t IN $markers))"))
    }
    val best = Seq("en", "de", "es", "fr")
      .map(l => struct(col(s"score_$l").as("score"),
        lit(mapLangOrd(l)).as("ord"), lit(l).as("lang")))
    scored
      .withColumn("has_cjk", col("text").rlike("[\\u4e00-\\u9fff]"))
      .withColumn("best", greatest(best: _*))
      .withColumn("predicted_lang",
        when(col("has_cjk"), "zh")
          .when(col("best.score") === 0, "unknown")
          .otherwise(col("best.lang")))
  }

  /** Per-doc top-k most-distinctive terms (lowest corpus document
    * frequency; tf-idf shape kept in integers so oracles are exact).
    * Inverted index + two window passes; one shuffle on term. */
  def distinctiveTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = docs
      .select(col("doc_id"), explode(array_distinct(tokens)).as("term"))
    val docFreq = terms.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("term"))
    terms.join(docFreq, "term")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk"), col("term"), col("df"))
  }

  /** Winnowed fingerprint: lexicographic-min md5 over `window`-token
    * rolling windows. md5 (not xxhash64) so the digest is engine-portable
    * (oracle-checkable); the choice is irrelevant to the algorithm. */
  def fingerprints(docs: DataFrame, window: Int = 4): DataFrame = docs
    .withColumn("tokens", tokens)
    .select(col("doc_id"), expr(
      s"""array_min(transform(
         |  sequence(0, greatest(size(tokens) - $window, 0)),
         |  i -> md5(concat_ws(' ', slice(tokens, i + 1, $window)))))"""
        .stripMargin).as("fingerprint"))

  /** Corpus bigram language-model statistics: top-k bigrams with their
    * conditional probability P(w2 | w1) = c(w1 w2) / c(w1 ·) — both counts
    * integers, one final division, so the probabilities are bit-exact
    * across engines. c(w1 ·) counts bigram OCCURRENCES with w1 first
    * (= unigram count excluding each doc's last token), so probabilities
    * per w1 sum to exactly 1. Two distributed aggregations + one join. */
  /** One row per bigram occurrence: (doc_id, w1, w2). Shared by
    * [[bigramStats]] and [[repetitionSignals]] so the tokenizer coupling
    * and the sequence-descends-when-negative guard live in one place. */
  private def docBigramPairs(docs: DataFrame): DataFrame = docs
    .withColumn("tokens", tokens)
    // sequence(0, n) DESCENDS when n < 0 — filter 1-token docs out first
    .filter(size(col("tokens")) >= 2)
    .select(col("doc_id"), posexplode(expr(
      """transform(sequence(0, size(tokens) - 2),
        |  i -> struct(tokens[i] AS w1, tokens[i+1] AS w2))""".stripMargin))
      .as(Seq("pos", "bg")))
    .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  def bigramStats(docs: DataFrame, k: Int = 50): DataFrame = {
    val bigrams = docBigramPairs(docs)
    val c2 = bigrams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = bigrams.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    c2.join(c1, "w1")
      .select(col("w1"), col("w2"), col("c2"),
        round(col("c2").cast("double") / col("c1"), 6).as("p_w2_given_w1"))
      .orderBy(col("c2").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Per-document repetition signals (the Gopher-style repetitiousness
    * gates a pretraining quality filter runs): the fraction of a doc's
    * bigrams taken by its single most frequent bigram, and the fraction of
    * bigram occurrences that are repeats of an earlier one. Both are ratios
    * of integer counts with one final double division — bit-exact across
    * engines. Shape: explode → (doc, bigram) count → per-doc aggregate;
    * both aggregations are hash aggregates with map-side partials (the
    * groupBy(doc_id) re-shuffles — HashPartitioning(doc_id, bg) does not
    * satisfy a doc_id-only clustering), plus the final presentation sort. */
  def repetitionSignals(docs: DataFrame): DataFrame = docBigramPairs(docs)
    .select(col("doc_id"), concat(col("w1"), lit(" "), col("w2")).as("bg"))
    .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("c"))
    .groupBy(col("doc_id"))
    .agg(sum(col("c")).as("n_bigrams"),
      count(lit(1)).as("n_distinct_bigrams"),
      max(col("c")).as("top_bigram_cnt"))
    .select(col("doc_id"), col("n_bigrams"), col("n_distinct_bigrams"),
      col("top_bigram_cnt"),
      (col("top_bigram_cnt").cast("double")
        / col("n_bigrams").cast("double")).as("top_bigram_frac"),
      ((col("n_bigrams") - col("n_distinct_bigrams")).cast("double")
        / col("n_bigrams").cast("double")).as("dup_bigram_frac"))
    .orderBy("doc_id")

  /** CCNet-style LM quality scoring: train a bigram LM on the corpus
    * itself, then score every document by its average conditional
    * log-probability under that LM (low = atypical/noisy text — the
    * perplexity filter of CCNet/ccnet-style pipelines) plus the fraction
    * of bigram occurrences that are corpus-rare (p(w2|w1) < 0.01).
    *
    * Cross-engine exactness: a sum of doubles is order-dependent, so the
    * per-pair log-prob is FIXED-POINTED first —
    * `round(ln(c2/c1)*1e6) :: long` per distinct (w1,w2) — and the
    * per-doc aggregation sums LONGS (order-independent, exact); the only
    * floating ops after that are two IEEE-specified divisions. ln() is
    * evaluated once per distinct bigram TYPE on both engines, and a
    * last-ulp ln() disagreement only matters if it crosses a 0.5e-6
    * rounding boundary (~1e-8 probability per type — measured green at
    * both gate SFs).
    *
    * Scale shape: two hash-aggregates over exploded bigrams build the LM
    * (vocab²-bounded, Zipf-small in practice — broadcast here); the
    * scoring pass re-explodes the corpus and broadcast-joins the LM, so
    * documents themselves never shuffle — at 100 TB the corpus-side cost
    * is one scan plus the per-doc hash-agg. When the LM outgrows the
    * broadcast ceiling the same plan holds with a (w1,w2)-keyed shuffle
    * hash join — implemented, not just documented: [[lmSide]] switches on
    * the session's broadcast knob, and the fallback plan is asserted
    * hash-identical in ExtSpec. */
  def lmScores(docs: DataFrame, rareThreshold: Double = 0.01): DataFrame = {
    val bg = docBigramPairs(docs)
    // The unigram-context counts are an exact projection of the bigram
    // grid (c1(w1) = Σ_w2 c2(w1,w2)), so deriving c1 from c2 — instead
    // of a second independent corpus explode+aggregate — drops a full
    // corpus pass (guide §2.3); the duplicated c2 subtree dedupes at
    // runtime via ReusedExchange. Counts are identical by definition;
    // the LM table is unchanged.
    val c2 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val lm = c2.join(lmSide(c1), "w1")
      .select(col("w1"), col("w2"),
        round(log(col("c2").cast("double") / col("c1")) * 1e6)
          .cast("long").as("logp_micro"),
        (col("c2").cast("double") / col("c1") < rareThreshold).as("is_rare"))
    bg.join(lmSide(lm), Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("logp_micro")).as("sum_logp_micro"),
        sum(col("is_rare").cast("long")).as("n_rare"))
      .select(col("doc_id"), col("n_bigrams"),
        ((col("sum_logp_micro").cast("double") / lit(1000000.0))
          / col("n_bigrams")).as("avg_logp"),
        col("n_rare"),
        (col("n_rare").cast("double") / col("n_bigrams")).as("rare_frac"))
      .orderBy("doc_id")
  }

  /** Deny-list scrubbing (the PII/secret-redaction shape of a training
    * pipeline, run here with a term deny-list since the synthetic corpus
    * carries no real PII — the regex machinery is identical): replace
    * every whole-word occurrence of a banned term with `[REDACTED]` and
    * count replacements. Pure per-row projection — zero shuffles, both
    * `regexp_replace` and `regexp_count` are codegen'd builtins — so it
    * scales embarrassingly with the corpus; at 100 TB this is a
    * map-only pass fused into whatever scan feeds it. The pattern stays
    * in the RE2/Java-regex common subset (alternation + \b) so the
    * DuckDB oracle matches byte-for-byte. */
  def redact(docs: DataFrame,
             denyList: Seq[String] = Seq("customer", "key")): DataFrame = {
    // terms are LITERALS, not patterns: an unescaped '.' would wildcard
    // ("api.key" matching "apiXkey"), '(' would unbalance the
    // alternation, and "c++" would throw at runtime. Backslash-escaping
    // the metacharacter set (rather than \Q...\E) stays inside the
    // RE2/Java common subset the DuckDB twin requires.
    def quote(t: String): String =
      t.replaceAll("""([\\.\[\]{}()*+?^$|\-])""", """\\$1""")
    val pat = denyList.map(quote).mkString("\\b(", "|", ")\\b")
    docs.select(col("doc_id"),
      regexp_count(col("text"), lit(pat)).cast("int").as("n_redacted"),
      regexp_replace(col("text"), pat, "[REDACTED]").as("redacted_text"))
  }

  /** C4/Gopher-style quality-filter cascade in ONE scan: per-doc gates
    * (min length, stopword presence, type/token diversity, top-bigram
    * repetition) computed entirely with row-local array HOFs — no
    * explode, no join, no per-doc shuffle; the only exchange is the
    * final tiny per-language aggregate. The repetition signal reuses
    * [[repetitionSignals]]' definition but row-locally:
    * max-bigram-count via nested transform/filter over the doc's own
    * bigram array (O(distinct x n) per doc — bounded by doc length,
    * codegen'd, and embarrassingly parallel, which at 100 TB beats the
    * explode->groupBy(doc_id, bg) shuffle by the full corpus width).
    * Every gate threshold sits inside the observed signal distribution
    * so both keep and drop sets are non-empty (non-vacuous oracle).
    * A doc failing several gates counts in EACH drop_* column (standard
    * funnel accounting); `n_kept` requires all four. */
  def filterCascade(docs: DataFrame): DataFrame = docs
    .withColumn("tokens", tokens)
    .withColumn("n_tok", size(col("tokens")))
    .withColumn("n_stop", expr(s"size(filter(tokens, t -> t IN $stopList))"))
    .withColumn("ttr",
      size(array_distinct(col("tokens"))).cast("double") / col("n_tok"))
    // sequence(0, n) DESCENDS when n < 0 (the docBigramPairs guard): a
    // 1-token doc would evaluate tokens[-1] — an ANSI INVALID_ARRAY_INDEX
    // crash. The oracle's generate_series(1, 0) is simply empty, so the
    // degenerate branch mirrors it: no bigrams, NULL repetition signal
    // (the doc fails the min-length gate regardless).
    .withColumn("bgs", expr(
      """CASE WHEN size(tokens) < 2 THEN array()
        |ELSE transform(sequence(0, size(tokens) - 2),
        |  i -> concat(tokens[i], ' ', tokens[i+1])) END""".stripMargin))
    .withColumn("top_bg_frac", expr(
      """CASE WHEN size(bgs) = 0 THEN CAST(NULL AS DOUBLE)
        |ELSE CAST(array_max(transform(array_distinct(bgs),
        |  b -> size(filter(bgs, x -> x = b)))) AS DOUBLE) / size(bgs)
        |END""".stripMargin))
    .withColumn("g_minlen", col("n_tok") >= 20)
    .withColumn("g_stop", col("n_stop") >= 1)
    .withColumn("g_div", col("ttr") >= 0.35)
    .withColumn("g_rep", col("top_bg_frac") <= 0.09)
    .groupBy(col("lang"))
    .agg(count(lit(1)).as("n_docs"),
      sum((col("g_minlen") && col("g_stop") && col("g_div") && col("g_rep"))
        .cast("long")).as("n_kept"),
      sum((!col("g_minlen")).cast("long")).as("drop_minlen"),
      sum((!col("g_stop")).cast("long")).as("drop_stopword"),
      sum((!col("g_div")).cast("long")).as("drop_diversity"),
      sum((!col("g_rep")).cast("long")).as("drop_repetition"))
    .withColumn("survival_rate",
      col("n_kept").cast("double") / col("n_docs"))
    .orderBy("lang")

  /** Trained Naive Bayes language classifier, one distributed pass —
    * the statistical complement of [[languageId]]'s fixed marker
    * heuristic (fastText-style learned classifiers sit between the two;
    * the Spark plumbing is this one's). Training IS aggregation:
    * per-(token, class) counts plus per-class totals, Laplace-smoothed
    * into a log-likelihood table over the full vocab × class grid (the
    * smoothing term makes unseen pairs first-class rows, so scoring
    * needs no per-token fallback logic). Scoring re-explodes the corpus
    * and broadcast-joins the LM; argmax(class) per doc with ties broken
    * by class name; output is the (labeled, predicted) confusion matrix.
    *
    * Cross-engine exactness follows x_text_perplexity's fixed-point
    * contract: per-(token, class) `round(ln(p)*1e6)::long`, per-doc LONG
    * sums (order-independent), integer argmax — no float accumulation
    * anywhere, so the DuckDB twin is hash-identical.
    *
    * Scale shape: the LM is vocab-bounded (V×C rows, Zipf-small) and
    * broadcasts; the corpus never shuffles until the per-(doc, class)
    * partial-agg'd sum — C× the exploded token count, with C a small
    * constant. The V×C grid itself comes from a C-row broadcast nested
    * loop (allowlisted: the build side is the class dictionary). When the
    * LM outgrows the broadcast ceiling the vocab-scale joins (cnt, lm)
    * re-plan as token-keyed shuffle hash joins via [[lmSide]] — same
    * switch and same ExtSpec hash-identity proof as lmScores; the C-row
    * and 1-row frames stay broadcast (class-bounded at any scale). */
  def nbClassify(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("token"))
    // Class totals and the vocab are exact projections of the
    // (token, class) count grid, so deriving them from `cnt` — instead
    // of three independent corpus explodes (clsStats, vocab, cnt) —
    // drops two full passes over the corpus (guide §2.3); the
    // duplicated cnt subtree dedupes at runtime via ReusedExchange.
    // Numbers are identical: n_cls is the per-class token count either
    // way, and the vocab is the same token set.
    val cnt = toks.groupBy(col("token"), col("lang").as("cls"))
      .agg(count(lit(1)).as("c_tc"))
    val clsStats = cnt.groupBy(col("cls"))
      .agg(sum(col("c_tc")).as("n_cls"))
    val vocab = cnt.select(col("token")).distinct()
    val vSize = vocab.agg(count(lit(1)).as("v_size"))
    val lm = vocab.crossJoin(broadcast(clsStats))
      .join(lmSide(cnt), Seq("token", "cls"), "left")
      .na.fill(0L, Seq("c_tc"))
      .crossJoin(broadcast(vSize))
      .select(col("token"), col("cls"),
        round(log((col("c_tc") + lit(1)).cast("double")
          / (col("n_cls") + col("v_size"))) * lit(1000000.0))
          .cast("long").as("logp_micro"))
    val priors = docs.groupBy(col("lang").as("cls"))
      .agg(count(lit(1)).as("n_docs_cls"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("n_corpus"))))
      .select(col("cls"),
        round(log(col("n_docs_cls").cast("double") / col("n_corpus"))
          * lit(1000000.0)).cast("long").as("prior_micro"))
    toks
      .join(lmSide(lm), "token")
      .groupBy(col("doc_id"), col("lang"), col("cls"))
      .agg(sum(col("logp_micro")).as("ll_micro"))
      .join(broadcast(priors), "cls")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy((col("ll_micro") + col("prior_micro")).desc, col("cls"))))
      .filter(col("rk") === 1)
      .groupBy(col("lang"), col("cls").as("predicted_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "predicted_lang")
  }

  val queries: Map[String, Q] = Map(
    "x_text_perplexity" -> ((s, d) => lmScores(documents(s, d))),
    "x_text_nb_classify" -> ((s, d) => nbClassify(documents(s, d))),
    "x_text_redact" -> ((s, d) => redact(documents(s, d)).orderBy("doc_id")),
    "x_text_filter_cascade" -> ((s, d) => filterCascade(documents(s, d))),
    "x_text_repetition" -> ((s, d) => repetitionSignals(documents(s, d))),
    "x_text_bigrams" -> ((s, d) => bigramStats(documents(s, d))),
    "x_text_stats" -> ((s, d) => textStats(documents(s, d)).orderBy("doc_id")),
    "x_text_entropy" -> ((s, d) =>
      entropySignals(documents(s, d)).orderBy("doc_id")),
    "x_text_tokens_bpe" -> ((s, d) =>
      bpeTokenCounts(documents(s, d)).orderBy("doc_id")),
    "x_text_quality" -> ((s, d) =>
      qualityScores(documents(s, d)).orderBy("doc_id")),
    "x_text_langid" -> ((s, d) => languageId(documents(s, d))
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        col("predicted_lang"))
      .orderBy("doc_id")),
    "x_text_topterms" -> ((s, d) =>
      distinctiveTerms(documents(s, d)).orderBy("doc_id", "rk")),
    "x_text_heavyhitters" -> ((s, d) => heavyHitters(documents(s, d))),
    "x_text_fingerprint" -> ((s, d) =>
      fingerprints(documents(s, d)).orderBy("doc_id"))
  )

  /** Tie-break ordinal: later languages win only on strictly higher score. */
  private def mapLangOrd(l: String): Int =
    Seq("fr", "es", "de", "en").indexOf(l)

  val oracle: Map[String, String] = Map(
    // fixed-point per-TYPE log-prob (exact long sums per doc; see
    // lmScores scaladoc for the cross-engine determinism argument)
    "x_text_perplexity" ->
      """WITH bg AS (
        |  SELECT doc_id,
        |         unnest(toks[1:len(toks)-1]) AS w1,
        |         unnest(toks[2:len(toks)]) AS w2
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |        FROM documents WHERE len(string_split(text, ' ')) >= 2)
        |), c2 AS (
        |  SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2
        |), c1 AS (
        |  SELECT w1, count(*) AS c1 FROM bg GROUP BY w1
        |), lm AS (
        |  SELECT w1, w2,
        |    CAST(round(ln(CAST(c2 AS DOUBLE) / c1) * 1000000) AS BIGINT)
        |      AS logp_micro,
        |    CAST(c2 AS DOUBLE) / c1 < 0.01 AS is_rare
        |  FROM c2 JOIN c1 USING (w1)
        |)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  (CAST(sum(logp_micro) AS DOUBLE) / 1000000.0) / count(*)
        |    AS avg_logp,
        |  CAST(sum(CASE WHEN is_rare THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
        |  CAST(sum(CASE WHEN is_rare THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
        |    AS rare_frac
        |FROM bg JOIN lm USING (w1, w2)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // same fixed-point micro-log-prob contract as x_text_perplexity:
    // LONG per-(token,class) scores, LONG per-doc sums, integer argmax
    "x_text_nb_classify" ->
      """WITH tk AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        |  FROM documents
        |), cls AS (
        |  SELECT lang AS cls, CAST(count(*) AS BIGINT) AS n_cls
        |  FROM tk GROUP BY lang
        |), vocab AS (
        |  SELECT DISTINCT token FROM tk
        |), v AS (
        |  SELECT CAST(count(*) AS BIGINT) AS v_size FROM vocab
        |), cnt AS (
        |  SELECT token, lang AS cls, CAST(count(*) AS BIGINT) AS c_tc
        |  FROM tk GROUP BY token, lang
        |), lm AS (
        |  SELECT vocab.token AS token, cls.cls AS cls,
        |    CAST(round(ln(CAST(COALESCE(c_tc, 0) + 1 AS DOUBLE)
        |      / (n_cls + v_size)) * 1000000) AS BIGINT) AS logp_micro
        |  FROM vocab CROSS JOIN cls CROSS JOIN v
        |  LEFT JOIN cnt ON cnt.token = vocab.token AND cnt.cls = cls.cls
        |), pri AS (
        |  SELECT lang AS cls,
        |    CAST(round(ln(CAST(count(*) AS DOUBLE)
        |      / (SELECT CAST(count(*) AS BIGINT) FROM documents))
        |      * 1000000) AS BIGINT) AS prior_micro
        |  FROM documents GROUP BY lang
        |), sc AS (
        |  SELECT doc_id, lang, cls, CAST(sum(logp_micro) AS BIGINT) AS ll_micro
        |  FROM tk JOIN lm USING (token) GROUP BY doc_id, lang, cls
        |), ranked AS (
        |  SELECT doc_id, lang, cls,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY ll_micro + prior_micro DESC, cls) AS rk
        |  FROM sc JOIN pri USING (cls)
        |)
        |SELECT lang, cls AS predicted_lang, CAST(count(*) AS BIGINT) AS n_docs
        |FROM ranked WHERE rk = 1
        |GROUP BY lang, cls ORDER BY lang, predicted_lang""".stripMargin,
    "x_text_redact" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\b(customer|key)\b')) AS INT)
        |    AS n_redacted,
        |  regexp_replace(text, '\b(customer|key)\b', '[REDACTED]', 'g')
        |    AS redacted_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_text_filter_cascade" ->
      s"""WITH s AS (
         |  SELECT lang, len(toks) AS n_tok,
         |    len(list_filter(toks, t -> t IN $stopList)) AS n_stop,
         |    CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr,
         |    list_transform(generate_series(1, len(toks) - 1),
         |      i -> toks[i] || ' ' || toks[i+1]) AS bgs
         |  FROM (SELECT lang, string_split(text, ' ') AS toks FROM documents)
         |), g AS (
         |  SELECT lang,
         |    n_tok >= 20 AS g_minlen,
         |    n_stop >= 1 AS g_stop,
         |    ttr >= 0.35 AS g_div,
         |    CAST(list_max(list_transform(list_distinct(bgs),
         |      b -> len(list_filter(bgs, x -> x = b)))) AS DOUBLE) / len(bgs)
         |      <= 0.09 AS g_rep
         |  FROM s
         |)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN g_minlen AND g_stop AND g_div AND g_rep
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  CAST(sum(CASE WHEN NOT g_minlen THEN 1 ELSE 0 END) AS BIGINT)
         |    AS drop_minlen,
         |  CAST(sum(CASE WHEN NOT g_stop THEN 1 ELSE 0 END) AS BIGINT)
         |    AS drop_stopword,
         |  CAST(sum(CASE WHEN NOT g_div THEN 1 ELSE 0 END) AS BIGINT)
         |    AS drop_diversity,
         |  CAST(sum(CASE WHEN NOT g_rep THEN 1 ELSE 0 END) AS BIGINT)
         |    AS drop_repetition,
         |  CAST(sum(CASE WHEN g_minlen AND g_stop AND g_div AND g_rep
         |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS survival_rate
         |FROM g GROUP BY lang ORDER BY lang""".stripMargin,
    "x_text_repetition" ->
      """WITH bg AS (
        |  SELECT doc_id, w1 || ' ' || w2 AS bg
        |  FROM (SELECT doc_id,
        |          unnest(toks[1:len(toks)-1]) AS w1,
        |          unnest(toks[2:len(toks)]) AS w2
        |        FROM (SELECT doc_id, string_split(text, ' ') AS toks
        |              FROM documents WHERE len(string_split(text, ' ')) >= 2))
        |), c AS (
        |  SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS c
        |  FROM bg GROUP BY doc_id, bg
        |)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |  CAST(count(*) AS BIGINT) AS n_distinct_bigrams,
        |  CAST(max(c) AS BIGINT) AS top_bigram_cnt,
        |  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_bigram_frac,
        |  CAST(sum(c) - count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS dup_bigram_frac
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x_text_bigrams" ->
      """WITH bg AS (
        |  SELECT unnest(toks[1:len(toks)-1]) AS w1,
        |         unnest(toks[2:len(toks)]) AS w2
        |  FROM (SELECT string_split(text, ' ') AS toks FROM documents)
        |), c2 AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2
        |  FROM bg GROUP BY w1, w2
        |), c1 AS (
        |  SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY w1
        |)
        |SELECT c2.w1 AS w1, w2, c2.c2 AS c2,
        |  round(CAST(c2.c2 AS DOUBLE) / c1.c1, 6) AS p_w2_given_w1
        |FROM c2 JOIN c1 ON c2.w1 = c1.w1
        |ORDER BY c2 DESC, w1, w2 LIMIT 50""".stripMargin,
    "x_text_stats" ->
      """SELECT doc_id, CAST(length(text) AS INT) AS n_chars,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq_tokens,
        |  CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
        |    / len(string_split(text, ' ')) AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    // Entropy twin: identical fold ORDER (counts listed by sorted symbol)
    // so the double accumulation matches the Spark HOF bit-for-bit.
    "x_text_entropy" ->
      """WITH d AS (SELECT doc_id, text FROM documents),
        |ch AS (SELECT doc_id, unnest(range(1, length(text) + 1)) AS i, text FROM d),
        |cf AS (SELECT doc_id, substring(text, i, 1) AS u, count(*) AS cnt
        |       FROM ch GROUP BY 1, 2),
        |cagg AS (SELECT doc_id, list(cnt ORDER BY u) AS cnts, sum(cnt) AS n
        |         FROM cf GROUP BY doc_id),
        |ce AS (SELECT doc_id, round(0.0 - list_sum(list_transform(cnts,
        |         c -> (c / CAST(n AS DOUBLE)) * log2(c / CAST(n AS DOUBLE)))), 6)
        |         AS char_entropy FROM cagg),
        |wf AS (SELECT doc_id, unnest(string_split(text, ' ')) AS u FROM d),
        |wc AS (SELECT doc_id, u, count(*) AS cnt FROM wf GROUP BY 1, 2),
        |wagg AS (SELECT doc_id, list(cnt ORDER BY u) AS cnts, sum(cnt) AS n
        |         FROM wc GROUP BY doc_id),
        |we AS (SELECT doc_id, round(0.0 - list_sum(list_transform(cnts,
        |         c -> (c / CAST(n AS DOUBLE)) * log2(c / CAST(n AS DOUBLE)))), 6)
        |         AS word_entropy FROM wagg)
        |SELECT d.doc_id,
        |  coalesce(ce.char_entropy, 0.0) AS char_entropy,
        |  coalesce(we.word_entropy, 0.0) AS word_entropy
        |FROM d LEFT JOIN ce ON d.doc_id = ce.doc_id
        |     LEFT JOIN we ON d.doc_id = we.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    "x_text_topterms" ->
      """WITH terms AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
        |  FROM documents
        |), df AS (
        |  SELECT term, count(*) AS df FROM terms GROUP BY term
        |)
        |SELECT doc_id, rk, term, df FROM (
        |  SELECT t.doc_id, t.term, df.df,
        |    CAST(row_number() OVER (PARTITION BY t.doc_id
        |      ORDER BY df.df, t.term) AS INT) AS rk
        |  FROM terms t JOIN df USING (term))
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    // The MG candidate pass is invisible to the answer (guaranteed
    // superset + exact recount), so the oracle is the plain
    // GROUP BY + HAVING at threshold ceil(phi * N).
    "x_text_heavyhitters" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
        |), tot AS (SELECT count(*) AS n FROM toks)
        |SELECT token, cnt FROM
        |  (SELECT token, count(*) AS cnt FROM toks GROUP BY token), tot
        |WHERE cnt >= greatest(1, CAST(ceil(0.002 * n) AS BIGINT))
        |ORDER BY cnt DESC, token""".stripMargin,
    "x_text_tokens_bpe" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS INT)
        |    AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_text_quality" ->
      s"""SELECT doc_id, n_tok, n_stop,
         |  CAST(n_stop AS DOUBLE) / n_tok AS stopword_ratio,
         |  CAST(n_uniq AS DOUBLE) / n_tok AS type_token_ratio
         |FROM (
         |  SELECT doc_id,
         |    CAST(len(toks) AS INT) AS n_tok,
         |    CAST(len(list_filter(toks, t -> t IN $stopList)) AS INT) AS n_stop,
         |    CAST(len(list_distinct(toks)) AS INT) AS n_uniq
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
         |ORDER BY doc_id""".stripMargin,
    // Same tie semantics as the Spark greatest-over-struct argmax: highest
    // score wins; on ties the CASE chain prefers en > de > es > fr (the
    // struct ordinal). CJK detection overrides; zero markers -> unknown.
    "x_text_langid" ->
      """WITH sc AS (
        |  SELECT doc_id, lang AS labeled_lang,
        |    len(list_filter(toks, t -> t IN ('the','a','of','and','to'))) AS s_en,
        |    len(list_filter(toks, t -> t IN ('der','die','und','ist','das'))) AS s_de,
        |    len(list_filter(toks, t -> t IN ('el','la','que','de','los'))) AS s_es,
        |    len(list_filter(toks, t -> t IN ('le','la','les','et','est'))) AS s_fr,
        |    regexp_matches(text, '[\x{4e00}-\x{9fff}]') AS has_cjk
        |  FROM (SELECT doc_id, lang, text, string_split(text, ' ') AS toks
        |        FROM documents)
        |)
        |SELECT doc_id, labeled_lang,
        |  CASE WHEN has_cjk THEN 'zh'
        |       WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'unknown'
        |       WHEN s_en = greatest(s_en, s_de, s_es, s_fr) THEN 'en'
        |       WHEN s_de = greatest(s_en, s_de, s_es, s_fr) THEN 'de'
        |       WHEN s_es = greatest(s_en, s_de, s_es, s_fr) THEN 'es'
        |       ELSE 'fr' END AS predicted_lang
        |FROM sc ORDER BY doc_id""".stripMargin,
    "x_text_fingerprint" ->
      """SELECT doc_id,
        |  list_aggregate(list_transform(
        |    generate_series(0, greatest(len(toks) - 4, 0)),
        |    i -> md5(array_to_string(toks[i+1:i+4], ' '))), 'min') AS fingerprint
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |ORDER BY doc_id""".stripMargin
  )
}
