package graft

import org.apache.spark.sql.SparkSession

/** Per-round ANN recall artifact (`RECALL_r*.json`): the committed,
  * diffable form of the recall assertions that otherwise live only in
  * transient ExtSpec runs. The four approximate ANN entries are the
  * catalog's least-audited surface — no portable SQL oracle can
  * replicate probe/quantizer internals, so until r15 the correctness
  * gate recorded them rows-only; since r15 the catalog entries return
  * oracle-ENFORCED recall contracts ([[graft.ext.Similarity]]'s
  * annRecallCheck/knnRecallCheck) and this main stays the DIAGNOSTIC
  * sweep: it scores each raw variant (Similarity.rawAnn) against the
  * exact brute-force baseline (`x_ann_bruteforce`, itself oracle-backed
  * bit-for-bit) and emits one JSON file. A recall regression shows up
  * here as a number and in CORRECTNESS_r*.json as a failed hash.
  *
  * Determinism: every variant runs its registered query shape unchanged —
  * fixed seeds (SRP seed 42; IVF/PQ quantizers seed from the
  * deterministic md5(vec_id)-order hash-sample since r11), fixed
  * probes/rerank defaults, the same 10 fixed queries (vec_id < 10),
  * k = 5 — so the file is reproducible run-over-run on the same
  * testdata.
  *
  * recall@5 per query = |ANN top-5 ∩ exact top-5| / 5; the file carries
  * the mean and min across queries (the min catches a single-query
  * failure a mean can hide).
  */
object Recall {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("RECALL_r7.json")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("q_id", "c_id").collect()
        .groupBy(_.getLong(0))
        .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // the approximate variants' RAW top-k frames (the catalog entries of
    // the same names return the oracle-backed recall contract since r15)
    def topSets(name: String): Map[Long, Set[Long]] =
      sets(graft.ext.Similarity.rawAnn(name)(spark, sfDir))

    val exact = sets(SparkEntry.queries("x_ann_bruteforce")(spark, sfDir))
    val k = 5
    // Locale.ROOT: f-interpolation under a comma-decimal JVM locale
    // would make the committed artifact invalid JSON
    def f3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def meanMin(ann: Map[Long, Set[Long]]): (Double, Double) = {
      val perQuery = exact.toSeq.sortBy(_._1).map { case (q, ex) =>
        ann.getOrElse(q, Set.empty).intersect(ex).size.toDouble / k
      }
      (perQuery.sum / perQuery.size, perQuery.min)
    }
    val variants = Seq("x_ann_lsh", "x_ann_ivf", "x_ann_pq", "x_ann_ivfpq")
    val entries = variants.map { name =>
      val (mean, min) = meanMin(topSets(name))
      s""""$name":{"mean":${f3(mean)},"min":${f3(min)}}"""
    }

    // Operating-point sweep (r7 verdict item 7): the registered pq/ivfpq
    // entries are single points (r11 defaults: pq rerank=200, ivfpq
    // probes=12/rerank=400); the sweep shows recall per knob so
    // consumers pick an operating point and a regression is visible per
    // cell, not just at the default. Quantizer training is
    // deterministic, so every cell is reproducible.
    import org.apache.spark.sql.functions.col
    val embAll = graft.Tables.embeddings(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
    val reranks = Seq(100, 200, 400)
    // pqCodes joined the grid in r14 (VERDICT r13 #7: the registered
    // point's min-recall tail) — 32 codes need the long-packed layout
    // the expressions grew this round; training cost doubles per step
    // (k-means over 2x centroids) but the ADC scan shape is unchanged.
    val pqSweep = Seq(16, 32).flatMap { kc =>
      val pqIdx = graft.ext.Similarity.PqIndex.train(embAll, pqCodes = kc)
      reranks.map { r =>
        val (mean, min) = meanMin(sets(
          pqIdx.search(embAll.filter(col("vec_id") < 10), k, r)))
        s"""{"pqCodes":$kc,"rerank":$r,"mean":${f3(mean)},"min":${f3(min)}}"""
      }
    }
    val ivfpqSweep = for (p <- Seq(4, 8, 12); r <- reranks) yield {
      val idx = graft.ext.Similarity.IvfPqIndex.train(
        embAll, cells = 16, probes = p, m = 8, pqCodes = 16)
      val (mean, min) = meanMin(sets(idx.searchWhere(col("vec_id") < 10, k, r)))
      s"""{"probes":$p,"rerank":$r,"mean":${f3(mean)},"min":${f3(min)}}"""
    }
    // NON-SEED query honesty check (r8): under the old first-k seeding
    // the registered entries' 10 fixed queries (vec_id < 10) were a
    // SUBSET of the quantizer seeds, flattering the quantizer-routed
    // variants — a seed vector is near its own cell's centroid by
    // construction. Since r11 the quantizers hash-sample their seeds,
    // so this block is the REGRESSION GATE that the two query
    // populations stay in agreement: re-score from 10 queries far from
    // the old seed range (1000 <= vec_id < 1010) against the exact
    // baseline on the same filter; registered-vs-nonseed divergence
    // reappearing means seed/query correlation crept back in.
    val nonSeed = col("vec_id") >= 1000 && col("vec_id") < 1010
    val nsExact = sets(graft.ext.Similarity.exactTopK(
      embAll, embAll.filter(nonSeed), k))
    def nsMeanMin(ann: Map[Long, Set[Long]]): (Double, Double) = {
      val perQ = nsExact.toSeq.sortBy(_._1).map { case (q, ex) =>
        ann.getOrElse(q, Set.empty).intersect(ex).size.toDouble / k
      }
      (perQ.sum / perQ.size, perQ.min)
    }
    val nsEntries = Seq(
      "x_ann_lsh" -> graft.ext.Similarity.lshTopK(embAll, nonSeed, k),
      "x_ann_ivf" -> graft.ext.Similarity.ivfTopK(embAll, nonSeed, k),
      "x_ann_pq" -> graft.ext.Similarity.pqTopK(embAll, nonSeed, k),
      "x_ann_ivfpq" -> graft.ext.Similarity.ivfpqTopK(embAll, nonSeed, k))
      .map { case (name, df) =>
        val (mean, min) = nsMeanMin(sets(df))
        s""""$name":{"mean":${f3(mean)},"min":${f3(min)}}"""
      }

    // k-NN JOIN recall (r8): unlike the x_ann_* entries (10 fixed
    // queries), the join variants rank neighbors for EVERY vector, so
    // recall@3 here averages over the whole corpus. The exact blocked
    // join (itself oracle-backed) is the baseline; both approximate
    // variants run their registered defaults, and the IVF variant gets a
    // probes sweep because on THIS testdata its recall is coverage-bound:
    // the embeddings are isotropic (measured: intra-label mean cosine ==
    // inter-label == 0.0; top-3 same-label fraction at chance), so a
    // coarse quantizer has no cluster structure to route by and recall
    // tracks probes/cells — the ANN-adversarial regime. SRP banding stays
    // angle-sensitive there, which is exactly the gap the two variants
    // exist to document; clustered real corpora move IVF far above its
    // coverage floor.
    val kj = 3
    val kjExact = sets(SparkEntry.queries("x_knn_join")(spark, sfDir))
    def kjPerQ(ann: Map[Long, Set[Long]]): Seq[Double] =
      kjExact.toSeq.sortBy(_._1).map { case (q, ex) =>
        ann.getOrElse(q, Set.empty).intersect(ex).size.toDouble / kj
      }
    def kjRecall(ann: Map[Long, Set[Long]]): (Double, Double) = {
      val perQ = kjPerQ(ann)
      (perQ.sum / perQ.size, perQ.min)
    }
    // r11 verdict: min recall 0.0 needed quantifying — the full
    // distribution (p10/p50/min + zero-recall and below-half fractions)
    // is the operating contract, not just mean/min. A zero for the LSH
    // variant means an SRP-isolated vector (detectable → rescued since
    // r12, so its frac_zero should be ~0 up to the rescue cap); a zero
    // for IVF means all true neighbors sat in unprobed cells
    // (undetectable without exact scoring — the documented tail:
    // ~(1-coverage)^k of queries at probe coverage p).
    def f4(v: Double) =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    def dist(perQ: Seq[Double]): String = {
      val s = perQ.sorted
      def pct(p: Double) = s(math.round(p * (s.size - 1)).toInt)
      s""""mean":${f3(s.sum / s.size)},"p10":${f3(pct(0.1))},""" +
        s""""p50":${f3(pct(0.5))},"min":${f3(s.min)},""" +
        s""""frac_zero":${f4(s.count(_ == 0.0).toDouble / s.size)},""" +
        s""""frac_below_half":${f4(s.count(_ < 0.5).toDouble / s.size)}"""
    }
    val kjVariants = Seq("x_knn_join_ivf", "x_knn_join_lsh").map { name =>
      s""""$name":{${dist(kjPerQ(sets(
        graft.ext.Similarity.rawAnn(name)(spark, sfDir))))}}"""
    }
    val kjIvfSweep = Seq(2, 4, 8, 12).map { p =>
      val (mean, min) = kjRecall(sets(
        graft.ext.Similarity.knnJoinIvf(embAll, kj, cells = 16, probes = p)))
      s"""{"probes":$p,"mean":${f3(mean)},"min":${f3(min)}}"""
    }
    val kjJson = s""""baseline":"x_knn_join","k":$kj,""" +
      s""""queries":${kjExact.size},${kjVariants.mkString(",")},""" +
      s""""ivf_probes_sweep":[${kjIvfSweep.mkString(",")}]"""

    // Appended-fraction recall decay (r9 verdict item 6): IvfPqIndex
    // .append encodes new vectors with FROZEN quantizers, so recall
    // decays as the untrained (appended) fraction of the corpus grows —
    // the honest scale contract for train-once/serve-many needs that
    // curve measured, not asserted. Each point trains on the first
    // (1-f) of vec_ids at the operating point the emitted JSON records
    // (cells=16, probes=12, m=8, pqCodes=16, rerank=400), appends the
    // rest through the real save → append → load path, and scores the
    // 50-query decay set against the full-corpus exact baseline.
    // f=0 is the curve's anchor: the full corpus trains the quantizers
    // (no appended fraction), the same algorithm and knobs as the
    // registered x_ann_ivfpq entry but over THIS block's wider query
    // set — so diff f=0 against this curve's own history, not against
    // the registered 10-query recall (review r16: the old comment
    // promised that equality and it stopped holding at the widening).
    //
    // WIDENED to 50 queries in r16 (VERDICT r15 #5): the 10-query r15
    // curve read non-monotone (0.94 → 0.88/0.88/0.84 → 0.94 at f=0.9),
    // which at 10 queries × k=5 is a 2-3 neighbor swing — inside
    // single-query noise. 50 queries (the exact baseline below, one
    // extra KB-scale pass) shrink the per-point standard error ~2.2×
    // so a real frozen-quantizer dip would survive averaging; the
    // mid-curve mean at 50 queries is the monotonicity verdict.
    val nVecs = embAll.agg(org.apache.spark.sql.functions
      .max(col("vec_id"))).collect().head.getLong(0) + 1
    val decayQueries = col("vec_id") < 50
    val decayExact = sets(graft.ext.Similarity.exactTopK(
      embAll, embAll.filter(decayQueries), k))
    def decayMeanMin(ann: Map[Long, Set[Long]]): (Double, Double) = {
      val perQ = decayExact.toSeq.sortBy(_._1).map { case (q, ex) =>
        ann.getOrElse(q, Set.empty).intersect(ex).size.toDouble / k
      }
      (perQ.sum / perQ.size, perQ.min)
    }
    val decayPoints = Seq(0.0, 0.25, 0.5, 0.75, 0.9).map { frac =>
      val cut = math.max(16L, ((1.0 - frac) * nVecs).toLong)
      val idx = graft.ext.Similarity.IvfPqIndex.train(
        embAll.filter(col("vec_id") < cut),
        cells = 16, probes = 12, m = 8, pqCodes = 16)
      val dir = java.nio.file.Files
        .createTempDirectory("graft_recall_decay").toString
      val name = s"decay_f${(frac * 100).toInt}"
      idx.save(name, dir)
      if (cut < nVecs)
        graft.ext.Similarity.IvfPqIndex.append(spark, name, dir,
          embAll.filter(col("vec_id") >= cut))
      val loaded = graft.ext.Similarity.IvfPqIndex.load(
        spark, name, dir, embAll)
      val (mean, min) = decayMeanMin(sets(
        loaded.searchWhere(decayQueries, k, rerank = 400)))
      s"""{"appended_frac":$frac,"mean":${f3(mean)},"min":${f3(min)}}"""
    }
    val decayJson = s""""append_decay":{"variant":"ivfpq","k":$k,""" +
      s""""queries":${decayExact.size},"operating_point":""" +
      s""""cells=16,probes=12,m=8,pqCodes=16,rerank=400",""" +
      s""""points":[${decayPoints.mkString(",")}]}"""

    // The LSH note is part of the artifact: the operating point moved in
    // round 8 from the single-table strawman (mean 0.28) to the standard
    // multi-table form; a reader diffing r7→r8 should read the jump as
    // that design change, not noise.
    val note = "x_ann_lsh is multi-table SRP since r8: 8 independent " +
      "6-bit tables, flip-1 multi-probe per table, union of candidates " +
      "exact-reranked (miss prob decays as (1-p)^tables). The r7 value " +
      "(mean 0.28) was the single-table strawman; the near-dup regime " +
      "still belongs to the threshold-contract embedNearDupsLsh. " +
      "nonseed_queries (r8): the registered 10 queries (vec_id<10) are " +
      "a subset of the quantizer training anchors (IVF seeds vec_id<16, " +
      "PQ codebook seeds first 16 vectors), which flatters the three " +
      "quantizer-trained variants on THIS testdata's isotropic " +
      "embeddings (measured: intra-label cosine == inter-label == 0; " +
      "no cluster structure to route by) — off-seed they fall to their " +
      "probe-coverage floor while data-independent SRP holds (0.90). " +
      "Read the registered recall block as the seed-adjacent operating " +
      "point and nonseed_queries as the isotropic-corpus floor; " +
      "clustered real corpora sit between, and the spark.graft.ann.* " +
      "confs plus the sweep grids are the tuning path. r9: the " +
      "registered defaults moved to the r8 sweep winners (pq rerank " +
      "50->100, ivfpq probes 2->1 + rerank 50->100) — diff r8->r9 " +
      "registered pq 0.62->0.80 and ivfpq 0.82->0.96 is that " +
      "promotion, not an algorithm change; the sweep grid itself is " +
      "unchanged. knn_join_lsh r9 drops its dedup pre-pass (idempotent " +
      "top-k) — recall must match r8 exactly, pinning the rewrite as " +
      "plan-only. append_decay (r10): frozen-quantizer appends at the " +
      "registered ivfpq operating point — retrain guidance (Similarity " +
      "IvfPqIndex.append doc) is appended fraction ~0.5, sooner under " +
      "distribution shift. r11: IVF/PQ quantizers now seed from a " +
      "deterministic md5(vec_id)-order hash-sample with Lloyd " +
      "refinement (IVF 3 iters, PQ 2) instead of the first-k vectors " +
      "that made the registered queries a subset of the seeds and " +
      "flattered r8-r10 headline recall (nonseed was 0.26-0.36); " +
      "registered defaults re-tuned to the honest operating points " +
      "(ivf probes=10, pq rerank=200, ivfpq probes=12/rerank=400, " +
      "knn_join ivf probes=12) — seed and nonseed recall now agree, " +
      "which is the fix. Expect recall/nonseed/sweep/append_decay " +
      "numbers to be discontinuous r10->r11 for all quantizer-trained " +
      "variants; diff within r11+ only. r12: knn_join entries carry the " +
      "full recall DISTRIBUTION (p10/p50/min + frac_zero/frac_below_half) " +
      "— the operating contract for the tail, not just mean/min — and " +
      "knn_join_lsh gains the capped brute-force rescue for SRP-isolated " +
      "queries (knnJoinLsh rescueCap=1024). The rescue eliminates the " +
      "DETECTABLE zero tail (queries returning < k banded rows — " +
      "spec-pinned firing in ExtSpec since r13); a RESIDUAL nonzero " +
      "frac_zero can still appear when a query banded k-full but every " +
      "banked neighbor is wrong (the undetectable kind, same class as " +
      "IVF's wrong-cell tail) — at sf0.1 that reads as one query " +
      "(frac_zero 0.0005) on which the rescue, correctly, never fires. " +
      "The IVF variant's residual zeros are the undetectable wrong-cell " +
      "tail, bounded by ~(1-probes/cells)^k per query. r13: knnJoinLsh " +
      "bits default -1 = auto (log2(n/8) from a corpus count — resolves " +
      "to the legacy 8 at this sf0.1 corpus, so the registered block is " +
      "comparable r12->r13); the rescue pipeline went lazy (persist, " +
      "unconditional union) with identical results. r14: x_ann_pq's " +
      "registered default moved to pqCodes=32 (the sweep's pqCodes axis " +
      "is new this round: at the registered rerank=200, 16 codes read " +
      "mean 0.82/min 0.4 vs 32 codes 0.90/0.6 at flat wall — codebook " +
      "resolution, not shortlist depth, was the binding constraint; " +
      "conf spark.graft.ann.pq.codes) — diff x_ann_pq within r14+ or " +
      "against the pqCodes=16 sweep row. LSH auto-bits became " +
      "regime-aware (neighbor-cosine probe; isotropic corpora take a " +
      "half-rate anchored ramp) — NO effect at this corpus scale (both " +
      "formulas resolve 8 at the ~2000-vector anchor), pinned by the " +
      "unchanged lsh/knn_join_lsh blocks. r16: append_decay widened " +
      "from 10 to 50 queries (VERDICT r15 #5) — verdict: the r15 " +
      "non-monotone curve (0.94->0.84->0.94) was 10-query noise; at 50 " +
      "queries the curve is flat within +/-0.01 (0.872-0.892 across " +
      "appended fractions 0->0.9), so frozen-quantizer appends show NO " +
      "real recall dip at this operating point on this corpus and no " +
      "retrain advisory is warranted. The f=0 anchor moves 0.94->0.876 " +
      "because the query set changed (10->50) — diff decay curves " +
      "within r16+ only"
    val json =
      s"""{"metric":"ann_recall@$k","queries":${exact.size},"k":$k,""" +
        s""""baseline":"x_ann_bruteforce","sf":"$sfDir",""" +
        s""""recall":{${entries.mkString(",")}},""" +
        s""""nonseed_queries":{${nsEntries.mkString(",")}},""" +
        s""""knn_join":{$kjJson},$decayJson,""" +
        s""""sweep":{"pq":[${pqSweep.mkString(",")}],""" +
        s""""ivfpq":[${ivfpqSweep.mkString(",")}]},"note":"$note"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
