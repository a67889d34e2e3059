package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.functions.VectorFunctions.cosineSim

/** [EXT] Approximate-nearest-neighbor search over embedding tables
  * (`(vec_id: long, embedding: array<float>)`, 64-dim in the testdata).
  *
  * Public API is DataFrame-in/DataFrame-out (candidates + queries frames);
  * the `queries` map binds it to the driver testdata.
  *
  *  - brute force: exact cosine top-k — the correctness baseline. Cosine is
  *    the native codegen'd [[org.apache.spark.sql.graft.CosineSimilarity]]
  *    expression (a fused one-pass loop; the interpreted zip_with/aggregate
  *    formulation was 5-10× slower); query side is broadcast so the big
  *    side never shuffles.
  *  - LSH: MULTI-TABLE random-hyperplane hashing via the fused native
  *    SrpSignature expression (planes derived per-executor from a fixed
  *    seed, so the plan ships four ints, not plane literals): L
  *    independent tables, each probed with flip-1-bit multi-probe, union
  *    of candidates exact-reranked. At 100 TB the bucket join replaces
  *    the O(N·Q) nested loop with a lean banded join; recall is tuned by
  *    (tables, bits) — miss probability decays as (1-p)^tables.
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  private def topKSelect(joined: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("c_id"))
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Exact cosine top-k: every (query, candidate) pair scored with the
    * fused native expression; queries broadcast. O(N·Q) — the baseline
    * ANN variants are measured against. */
  def exactTopK(candidates: DataFrame, queryVecs: DataFrame, k: Int = 5): DataFrame = {
    val q = queryVecs.select(col("vec_id").as("q_id"), col("embedding").as("v_q"))
    val c = candidates.select(col("vec_id").as("c_id"), col("embedding").as("v_c"))
    topKSelect(
      c.join(broadcast(q), col("q_id") =!= col("c_id"))
        .withColumn("cosine", cosineSim(col("v_q"), col("v_c"))), k)
  }

  /** Distributed EXACT k-NN self-join — the SemDeDup / semantic-dedup
    * primitive: the top-k cosine neighbors of EVERY vector, not just a
    * bounded query set. Exact k-NN join is intrinsically O(n²) compute;
    * what a 1000-executor cluster needs is for that compute to be (a)
    * evenly sliced into bounded-memory tasks and (b) never buffered
    * unbounded. Both come from the classic blocked-matrix shape:
    *
    *  - the candidate side hashes into `blocks` slices, the query side
    *    into `qblocks` slices; each side EXPLODES across the other's
    *    slice ids, so one equi-join on (b, qb) yields every pair exactly
    *    once across a blocks × qblocks grid of uniform tasks. Replication
    *    is rows × gridDim per side — the knob that trades shuffle volume
    *    for task granularity (both scale with the cluster, never with
    *    n²).
    *  - per-pair scoring is the fused native cosine expression, and the
    *    reduction to top-k is [[graft.functions.TopKAggregator]]: a
    *    k-bounded buffer that Spark runs partial+final, so each grid task
    *    map-side-combines its scored pairs down to ≤ k entries per query
    *    before the exchange. The O(n²) pair stream lives and dies inside
    *    the grid tasks; only O(n × blocks × k) partial buffers shuffle.
    *
    * No window, no cartesian: the grid join is a plain equi-join and the
    * final ranking is a posexplode of the per-query sorted buffer. For
    * corpus-scale n where even sliced O(n²) is too much, the IVF/IVF-PQ
    * entries are the approximate path; this is their exact counterpart
    * (and the oracle-checkable ground truth for recall measurement).
    *
    * DEPLOYMENT NOTE (measured in CROSSOVER.md, r12): the partial top-k
    * runs through ObjectHashAggregate, whose sort-based fallback
    * threshold defaults to 128 IN-MEMORY GROUPS — any task scoring more
    * than 128 distinct queries silently falls back to sorting its whole
    * pair stream (3.6× wall at n=40k, a disk-filling spill at n=100k).
    * Group state here is k-bounded, so raise
    * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` to
    * cover the per-task query count (the Crossover harness uses 8M). */
  def knnJoin(vectors: DataFrame, k: Int = 3, blocks: Int = 8,
      qblocks: Int = 4): DataFrame =
    knnJoinAgainst(vectors, vectors, k, blocks, qblocks)

  /** The general two-frame form of [[knnJoin]]: top-k candidates for an
    * ARBITRARY query frame (retrieval / eval-set lookup / cross-corpus
    * semantic dedup), same blocked-grid + bounded-aggregation scale shape.
    * `excludeSelf` drops same-id pairs (the self-join convention; a
    * cross-corpus call where ids are unrelated can keep them). */
  def knnJoinAgainst(candidates: DataFrame, queryVecs: DataFrame,
      k: Int = 3, blocks: Int = 8, qblocks: Int = 4,
      excludeSelf: Boolean = true): DataFrame = {
    val topk = udaf(graft.functions.TopKAggregator.agg(k))
    val cand = candidates
      .select(col("vec_id").as("c_id"), col("embedding").as("v_c"),
        pmod(xxhash64(col("vec_id")), lit(blocks)).cast("int").as("b"))
      .withColumn("qb", explode(expr(s"sequence(0, ${qblocks - 1})")))
    val qs = queryVecs
      .select(col("vec_id").as("q_id"), col("embedding").as("v_q"),
        pmod(xxhash64(col("vec_id")), lit(qblocks)).cast("int").as("qb"))
      .withColumn("b", explode(expr(s"sequence(0, ${blocks - 1})")))
    // STRATEGY PINNED (r13): both grid sides are corpus-scale, but a
    // corpus that arrives from a narrow source (range-generated,
    // localCheckpointed, fresh cache) carries a tiny/propagated size
    // ESTIMATE, and Catalyst happily auto-broadcasts it — measured in
    // the 1M crossover rung: the replicated grid side planned as a
    // multi-GB HashedRelation build and OOM'd the driver. A join whose
    // sides scale with the corpus must never ride on an estimate; the
    // explicit shuffle-hash hint (build = the less-replicated side)
    // keeps the plan shape constant from 10k rows to 100 TB.
    val pairs = cand.hint("shuffle_hash").join(qs, Seq("b", "qb"))
    val nn = (if (excludeSelf) pairs.filter(col("q_id") =!= col("c_id"))
              else pairs)
      .select(col("q_id"), cosineSim(col("v_q"), col("v_c")).as("score"),
        col("c_id"))
      .groupBy("q_id")
      .agg(topk(col("score"), col("c_id")).as("nn"))
    nn.select(col("q_id"), posexplode(col("nn")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("c_id"), round(col("col.score"), 6).as("cosine"))
  }

  /** Approximate k-NN self-join through IVF cells — the 100 TB operating
    * shape of [[knnJoin]] (which is its exact, oracle-backed ground
    * truth; recall between the two is measured per round in
    * RECALL_r*.json, the same contract as the x_ann_* family). Candidates
    * for a query are the vectors assigned to its `probes` nearest cells,
    * so the all-pairs grid becomes a cell-keyed equi-join touching
    * ~probes/cells of the corpus per query — at the sqrt(n) cells rule
    * that is O(n^1.5) total pairs instead of O(n²) — and the same
    * k-bounded [[graft.functions.TopKAggregator]] reduces scored pairs
    * map-side. Scores are EXACT cosine: the approximation is candidate
    * coverage only (a true neighbor assigned to an unprobed cell is
    * missed), tuned by (cells, probes) exactly as in [[ivfTopK]]. */
  def knnJoinIvf(vectors: DataFrame, k: Int = 3, cells: Int = 16,
      probes: Int = -1): DataFrame = {
    val index = IvfIndex.train(vectors, cells)
    val nProbes = ivfpqProbes(cells, probes)
    val topk = udaf(graft.functions.TopKAggregator.agg(k))
    val qProbe = vectors
      .withColumn("probe_cells", probeCells(index.centroids, nProbes))
      .select(col("vec_id").as("q_id"), col("embedding").as("v_q"),
        explode(col("probe_cells")).as("cell"))
    // strategy pinned like [[knnJoinAgainst]]: both sides are
    // corpus-scale (assigned = n rows, probe side = n × probes), so the
    // cell join must never auto-broadcast off a narrow-source estimate
    val nn = index.assigned.hint("shuffle_hash").join(qProbe, Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), cosineSim(col("v_q"), col("v_c")).as("score"),
        col("c_id"))
      .groupBy("q_id")
      .agg(topk(col("score"), col("c_id")).as("nn"))
    nn.select(col("q_id"), posexplode(col("nn")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("c_id"), round(col("col.score"), 6).as("cosine"))
  }

  /** Approximate k-NN self-join via SYMMETRIC multi-table SRP banding —
    * the angle-sensitive complement to [[knnJoinIvf]]. Both sides emit
    * their (table, bucket) keys from one fused srp_signature call; the
    * query side adds flip-1 multi-probes; candidates are the bucket-join
    * matches, exact-cosine reranked through the k-bounded aggregation.
    *
    * Why both variants exist (measured, RECALL_r*.json): on the
    * testdata's ISOTROPIC embeddings — the ANN-adversarial regime, no
    * cluster structure for a coarse quantizer to exploit — IVF recall
    * collapses to its probe-coverage fraction, while hyperplane collision
    * probability stays angle-dependent, so SRP banding finds true
    * neighbors at a far better recall-per-candidate-scored rate
    * (simulated at matched ~25% candidate fractions: LSH ≈ 0.70 vs IVF
    * ≈ 0.54 mean recall@3; defaults here land ≈ 0.9). On clustered real
    * corpora IVF's routed scan wins storage and locality instead. The
    * bucket join carries payload-free (id, table, bucket) frames; the
    * join key space is tables × 2^bits, scaled by `bits` as the corpus
    * grows.
    *
    * `bits <= 0` = AUTO (the default): the signature width resolves to
    * ~log2(n / 8) from one count of `vectors` — the [[resolveProbes]]
    * discipline applied to the r12-measured LSH scale cliff
    * (CROSSOVER.md §1: fixed bits=8 went superlinear at 150k rows,
    * 446 s vs IVF's 54 s, because bucket population grows linearly with
    * n once the signature stops slicing). Bits growing as log2(n) pins
    * the EXPECTED bucket population (~8 per table) instead, so the
    * banded-join pair stream grows ~linearly in n. Recall holds because
    * flip-1 multi-probing widens with bits (bits+1 probes of 2^bits)
    * and the table count still drives the (1-p)^tables miss decay; the
    * ladder re-measured at 150k-400k is committed in CROSSOVER.md.
    *
    * REGIME-AWARE since r14 (VERDICT r13 #2): the full-rate ramp above
    * is the CLUSTERED-regime formula — on isotropic corpora recall is
    * collision-bound and the same ramp traded it DOWN (CROSSOVER §1:
    * 0.536 → 0.312 at 25k), so auto mode first resolves the regime
    * ([[resolveLshRegime]]: conf override or the measured
    * [[neighborCosineProbe]]) and isotropic corpora take the half-rate
    * anchored ramp instead (see [[resolveBits]]). At the registered
    * sf0.1 corpus (2000 vectors ≈ the anchor) BOTH formulas resolve to
    * the legacy 8, so the default operating point (and its RECALL
    * block) is unchanged under the switch. AUTO RUNS UP TO THREE JOBS
    * at plan-construction time (count, probe-query sample, one probe
    * scan; conf `spark.graft.ann.lsh.regime` skips the last two, and
    * since r15 both are also skipped whenever the two regime formulas
    * resolve the same clamped width — every corpus at or below the
    * anchor, the registered entries included) — callers that need a
    * fully lazy frame pass explicit bits.
    *
    * STRATIFIED since r15 (VERDICT r14 #3; discovery finalized late
    * r16): whenever the auto widths CAN diverge (past the anchor, no
    * regime override), [[stratifiedKnnJoinLsh]] decides driver-side
    * whether distinct neighbor-cosine populations exist — 1-D k-means
    * over per-sample chooser-median scores; pure corpora return to the
    * global path with zero extra Spark jobs. When populations are
    * found at diverging widths, the query side splits by a per-row
    * population label and each stratum runs at its own bits against
    * the full candidate set. `spark.graft.ann.lsh.stratify` = off
    * restores the single global choice.
    *
    * PROBE DEPTH (r16 late): the query side has probed the flip-1
    * (Hamming-1) shell since r8; `spark.graft.ann.lsh.probeHamming=2`
    * adds the margin-aware Hamming-2 shell — pair flips within the
    * `spark.graft.ann.lsh.probeMarginBits` (default 8) lowest-|margin|
    * planes, a strict superset of the flip-1 probe set over the same
    * planes ([[org.apache.spark.sql.graft.SrpProbes]]). This is the
    * in-family remedy for the isotropic recall wall: past the wall the
    * per-table capture is collision-bound and most of the remaining
    * collision mass sits in the H2 shell (CROSSOVER §1c — measured
    * recall/volume grid at the 250k wall rung). Probe volume grows
    * from `bits+1` to `1 + bits + mb(mb-1)/2` per table; default 1
    * keeps the legacy probe set bit-identical.
    *
    * Since r13 the rescue pipeline is LAZY (ADVICE r12): the banded
    * aggregate is `persist`ed, not checkpointed — recomputable lineage
    * (executor loss replays it) and no Spark job until an action —
    * and the rescue branch is unioned unconditionally (an empty
    * short-query set makes it a zero-row union, not a driver probe). */
  def knnJoinLsh(vectors: DataFrame, k: Int = 3, tables: Int = 16,
      bits: Int = -1, rescueCap: Int = 1024): DataFrame = {
    // memoized: auto-bits and the broadcast-bound guard share one count
    var counted = -1L
    // ENFORCED BOUND (r14, VERDICT r13 #1): the two vector re-joins below
    // broadcast the full n × (4·dim + 8)-byte vector projection — the one
    // architectural memory bound in this operator. Past it the failure
    // mode used to be a raw executor OOM / 8 GB-broadcast error with no
    // hint of the remedy; now it is a loud contract error that routes the
    // caller to the right tool. `spark.graft.ann.lsh.broadcastBound`
    // (bytes, default 1 GiB ≈ 4M × 64-dim rows; -1 disables) is checked
    // against the memoized auto-bits count, or — when explicit bits kept
    // the plan lazy — a LIMIT-bounded probe that scans at most
    // bound/rowBytes + 1 rows (the [[IvfIndex.train]] trainCap shape), so
    // the guard never pays a full count it doesn't already have. In auto
    // mode the check runs INSIDE the count callback, right after counting
    // (ADVICE r15): every auto resolution checks the bound — including
    // the probe-skip branch where the two width formulas agree — and an
    // over-bound corpus is still rejected before paying the regime
    // probe's full corpus scan (the most expensive plan-construction
    // job), because resolveBits counts before it probes.
    val bound = longConf(vectors.sparkSession,
      "spark.graft.ann.lsh.broadcastBound", 1L << 30)
    def checkBound(n: Long): Unit = if (bound > 0) {
      val rowBytes = 4L * 64 + 8
      val maxRows = bound / rowBytes
      require(n <= maxRows,
        s"knnJoinLsh: corpus has >= $n rows; the exact-rerank banded shape " +
          s"broadcasts n x (4*dim+8) = ${n * rowBytes} bytes of vectors, over " +
          s"spark.graft.ann.lsh.broadcastBound=$bound. Past this regime use " +
          "knnJoinIvf (vectors ride the cell join, no re-join) or the PQ " +
          "family (rerank from ~12-byte codes), or raise the bound / set it " +
          "to -1 if executors can hold the broadcast.")
    }
    // STRATIFIED MIXED-CORPUS PATH (r15, VERDICT r14 #3): a corpus of
    // clustered islands in an isotropic sea reads BETWEEN the regimes on
    // the probe mean and, under one global bits choice, gives the
    // isotropic half less than its pure-regime recall (r14 measured an
    // even 10k+10k mix at 1.000/0.503 per half — the global n drives the
    // width past what the isotropic STRATUM alone would resolve). When
    // (a) bits are auto, (b) no regime conf override, and (c) the widths
    // can diverge at this n (past the anchor — the probe-skip
    // condition), the stratified path decides for itself (driver-side)
    // whether distinct populations exist; when they do, each row is
    // labeled by ITS nearest-probe-query cosine and each stratum runs
    // at its own regime and size — see [[stratifiedKnnJoinLsh]].
    // `spark.graft.ann.lsh.stratify` = off restores the r14
    // single-choice behavior.
    val stratifyConf = {
      val v = vectors.sparkSession.conf
        .get("spark.graft.ann.lsh.stratify", "auto").trim
      require(Seq("auto", "off").contains(v),
        s"spark.graft.ann.lsh.stratify must be auto|off, got $v")
      v
    }
    if (bits <= 0 && stratifyConf == "auto"
        && regimeConf(vectors.sparkSession) == "auto") {
      counted = vectors.count()
      checkBound(counted)
      val (fullW, isoW) = autoWidths(counted, targetBucket = 8)
      if (fullW != isoW) {
        val thr = doubleConf(vectors.sparkSession,
          "spark.graft.ann.lsh.regimeThreshold", 0.80)
        // The stratify attempt is UNCONDITIONAL past this point (r16
        // late — the r15/r16 percentile pre-filter is gone): the
        // distributed per-query percentiles structurally CANNOT see a
        // small minority population, because minority rows mostly
        // choose MAJORITY samples as their nearest (the max over ~248
        // cross-population cosines beats the max over ~8 own-population
        // ones), so minority samples never even form groups in the
        // probe — no percentile read on the group values, however wide,
        // catches them. Discovery authority lives in
        // [[stratifiedKnnJoinLsh]]'s driver-side k-means over the
        // per-sample score (distributed median chooser cosine where a
        // sample had choosers, within-sample top-1 where not), which sees
        // minorities AND is orphan-clean; its validity gates (center
        // gap + mass floor) return None with ZERO additional Spark jobs
        // on a pure corpus — the probe below was already paid on every
        // widths-diverge path (and is memoized for the global path's
        // regime resolution).
        stratifiedKnnJoinLsh(vectors, k, tables, rescueCap, thr) match {
          case Some(out) => return out
          case None      => () // strata degenerate/agree: global path
        }
      }
    }
    val nBits = resolveBits(bits,
      () => {
        if (counted < 0) counted = vectors.count()
        checkBound(counted)
        counted
      },
      targetBucket = 8,
      regime = () => {
        val r = resolveLshRegime(vectors)
        // RECALL WALL (r16, VERDICT r15 #3): the broadcast bound rejects
        // by MEMORY; this rejects (or warns, the default) by RECALL
        // REGIME — the other way the banded exact-rerank shape becomes
        // the wrong tool. Runs exactly when the isotropic verdict is
        // about to pick the anchored width, so registered corpora (at or
        // under the anchor: probe skipped, width < wall) never see it.
        if (r == "isotropic")
          checkRecallWall(vectors.sparkSession,
            autoWidths(counted, targetBucket = 8)._2, counted)
        r
      },
      session = () => vectors.sparkSession)
    if (counted < 0 && bound > 0) {
      // explicit bits kept the plan lazy: LIMIT-bounded probe, never a
      // full count the caller didn't ask for
      val maxRows = bound / (4L * 64 + 8)
      checkBound(vectors.limit(
        math.min(maxRows + 1, Int.MaxValue.toLong).toInt).count())
    }
    bandedKnnPass(vectors, k, tables, nBits, rescueCap, lit(true))
  }

  /** One banded-join pass of [[knnJoinLsh]] at a FIXED signature width,
    * with the query side restricted to `queryPred` (lit(true) = the full
    * self-join). Candidates are ALWAYS the full corpus — a stratified
    * call changes each stratum's operating point, never its candidate
    * set, so cross-stratum neighbors stay reachable. The rescue cap
    * applies per pass (per stratum on the stratified path). */
  private def bandedKnnPass(vectors: DataFrame, k: Int, tables: Int,
      nBits: Int, rescueCap: Int, queryPred: Column): DataFrame = {
    val topk = udaf(graft.functions.TopKAggregator.agg(k))
    val sigs = graft.functions.VectorFunctions.srpSignature(
      col("embedding"), bands = tables, bits = nBits, dim = 64, seed = 42)
    val all = vectors.withColumn("sigs", sigs)
    val cand = all.select(col("vec_id").as("c_id"),
      posexplode(col("sigs")).as(Seq("t", "bucket")))
    // MULTI-PROBE DEPTH (r16 late): the Hamming-1 shell below has been
    // the probe set since r8; `spark.graft.ann.lsh.probeHamming` = 2
    // adds the margin-aware Hamming-2 shell ([[SrpProbes]] — pair flips
    // within the `probeMarginBits` lowest-|margin| planes, a strict
    // SUPERSET of the flip-1 set) for the isotropic past-the-wall
    // regime, where per-table capture is collision-bound and the H2
    // shell is where the remaining collision mass lives (CROSSOVER
    // §1c). Default 1 keeps the legacy probe set bit-identical.
    val hamming = {
      val h = intConf(vectors.sparkSession,
        "spark.graft.ann.lsh.probeHamming", 1)
      require(h == 1 || h == 2,
        s"spark.graft.ann.lsh.probeHamming must be 1 or 2, got $h")
      h
    }
    val qProbe =
      if (hamming == 2) {
        val mb = math.max(2, math.min(intConf(vectors.sparkSession,
          "spark.graft.ann.lsh.probeMarginBits", 8), nBits))
        val ppb = 1 + nBits + mb * (mb - 1) / 2
        vectors.filter(queryPred)
          .select(col("vec_id").as("q_id"),
            posexplode(graft.functions.VectorFunctions.srpProbes(
              col("embedding"), bands = tables, bits = nBits, dim = 64,
              seed = 42, marginBits = mb)).as(Seq("pos", "bucket")))
          .select(col("q_id"),
            (col("pos") / lit(ppb)).cast("int").as("t"), col("bucket"))
      } else all.filter(queryPred)
        .select(col("vec_id").as("q_id"),
          posexplode(col("sigs")).as(Seq("t", "bucket")))
        .select(col("q_id"), col("t"), explode(expr(
          s"""array_union(array(bucket),
             |  transform(sequence(0, ${nBits - 1}), p -> int(bucket ^ shiftleft(1, p))))"""
            .stripMargin)).as("bucket"))
    // no dropDuplicates pre-pass: the same pair surfacing via several
    // tables/probes scores identically, and TopKAggregator is idempotent
    // on identical (score, id) — duplicates die inside the partial
    // aggregation instead of costing a full exchange of the pair stream
    // STRATEGY PINNED (r13) — two different pins, for measured reasons:
    //
    // 1. The BANDED join's sides are lean (ids + bucket keys, no
    //    payloads) but corpus-scale, and a narrow-source input (range,
    //    localCheckpoint, fresh cache) estimates small, so Catalyst
    //    auto-broadcast the probe side — n × tables × (bits+1) rows, a
    //    ~5-8 GB HashedRelation build at the 1M crossover rung, OOM.
    //    Explicit shuffle-hash pins it: both lean sides shuffle
    //    (linear in n), the less-replicated cand side builds, and the
    //    FAT pair stream the join emits stays fused in-stage.
    //
    // 2. The two vector RE-JOINS are explicit BROADCASTS — and must
    //    be: the probe side of each is the pair stream (candidate
    //    volume — n × tables × bucket population, the O(n·clusterSize)
    //    term on clustered corpora), and any shuffle-based strategy
    //    exchanges IT: measured 7.5× wall at 25k and a disk-filling
    //    spill at 60k when these were shuffle-hash-pinned (the stream
    //    re-shuffles once per vector side, the second time carrying
    //    the first side's payloads). Broadcasting the n-row vector
    //    projection keeps the pair stream fused from banded join
    //    through scoring into the k-bounded partial aggregation —
    //    nothing pair-shaped ever hits an exchange. ARCHITECTURAL
    //    BOUND, now declared instead of estimate-accidental: the
    //    broadcast is n × (4·dim + 8) bytes (~280 MB at 1M × 64-dim)
    //    and must fit executor memory; past that regime the
    //    exact-rerank banded shape is the wrong tool — route to
    //    [[knnJoinIvf]] (vectors ride the cell join, no rejoin) or the
    //    PQ family (rerank from ~12-byte codes).
    val pairs = cand.hint("shuffle_hash").join(qProbe, Seq("t", "bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"))
    val cVecs = vectors.select(col("vec_id").as("c_id"),
      col("embedding").as("v_c"))
    val qVecs = vectors.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("embedding").as("v_q"))
    val nnRaw = pairs.join(broadcast(cVecs), "c_id")
      .join(broadcast(qVecs), "q_id")
      .select(col("q_id"), cosineSim(col("v_q"), col("v_c")).as("score"),
        col("c_id"))
      .groupBy("q_id")
      .agg(topk(col("score"), col("c_id")).as("nn"))
    // Zero-recall-tail rescue (r12): an SRP-isolated vector — one whose
    // buckets collide with nobody across all tables+probes — produces NO
    // pairs and silently vanishes from the result; unlike the IVF
    // variant's wrong-cell tail, this failure is DETECTABLE (the query
    // has < k neighbors or is missing), so those queries get an exact
    // brute-force pass. The rescue side is hard-capped (lowest q_id
    // first, deterministic) so an adversarial corpus where banding finds
    // nothing degrades to cap·n extra scores, never n². Queries past the
    // cap keep their partial results — or, if an over-cap query had ZERO
    // collided pairs, stay ABSENT from the output entirely (partial-or-
    // absent is the documented residual-tail contract; consumers that
    // need one row per query left-join the query set back).
    //
    // LAZY since r13 (ADVICE r12): `persist` keeps recomputable lineage
    // (fault-tolerant, unlike localCheckpoint) and runs NO job at
    // construction — the broadcast of the rescue set is the first thing
    // an action executes, which materializes the banded aggregate into
    // the persisted blocks the main scan then reuses. The rescue branch
    // unions unconditionally: with no short queries it contributes zero
    // rows through a broadcast of an empty frame, never a driver probe.
    val nn =
      if (rescueCap <= 0) nnRaw
      else {
        val done = nnRaw
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val short = vectors.filter(queryPred)
          .select(col("vec_id").as("q_id"))
          .join(done.filter(size(col("nn")) >= k).select("q_id"),
            Seq("q_id"), "left_anti")
          .orderBy("q_id").limit(rescueCap)
          .join(qVecs, "q_id")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // registered for [[sweepAnnCaches]] — see the registry scaladoc;
        // CacheManager would otherwise pin both for the session lifetime
        annCacheRegistry.add(done)
        annCacheRegistry.add(short)
        val rescued = cVecs
          .join(broadcast(short), col("q_id") =!= col("c_id"))
          .select(col("q_id"),
            cosineSim(col("v_q"), col("v_c")).as("score"), col("c_id"))
          .groupBy("q_id")
          .agg(topk(col("score"), col("c_id")).as("nn"))
        done.join(short.select("q_id"), Seq("q_id"), "left_anti")
          .unionByName(rescued)
      }
    nn.select(col("q_id"), posexplode(col("nn")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("c_id"), round(col("col.score"), 6).as("cosine"))
  }

  /** Per-stratum auto-bits for a MIXED corpus (r15, VERDICT r14 #3;
    * generalized past two strata in r16, VERDICT r15 #2).
    *
    * Labeling: the probe's own statistic, per row — cosine to the
    * nearest of the memoized probe's deterministic sample vectors
    * (a clustered row is near some sampled point of its island; an
    * isotropic row is near nothing). The sample rows themselves
    * would self-match at cosine 1, so they are pinned driver-side by
    * their per-sample SCORE (below).
    *
    * STRATA DISCOVERY (r16; minority-clean scoring r16 late): each
    * sample gets a score — its DISTRIBUTED median chooser cosine when
    * any corpus row chose it as nearest (orphan-clean: a cluster's only
    * sampled row still reads its population's pair cosine from its own
    * cluster's choosers; the median, not the extreme-valued max — see
    * [[ChooserStats]]),
    * falling back to its WITHIN-SAMPLE top-1 when it had no choosers
    * (the minority signature: a small population's rows choose
    * majority samples, so its samples form no groups — the fallback
    * reads their own low regime). The scores are clustered
    * driver-side by 1-D Lloyd k-means — the largest k ≤ `maxStrata`
    * (default 4) whose clusters all hold ≥ minMass samples (nq/16,
    * capped at 24 absolute so widening
    * `spark.graft.ann.lsh.probeQueries` lowers the discoverable
    * population share below ~6%) and whose adjacent CENTERS sit ≥
    * `strataMinGap` apart (default 0.15, well under the ~0.3
    * separation between pure populations) wins; bin boundaries are
    * the midpoints between adjacent centers. Center separation, not
    * empty-gap detection: a 256 sample of a multi-population corpus
    * always carries stragglers with mid-range scores that fill any
    * fixed gap window (measured: the 30k 3-population corpus reads
    * as a continuum p0=0.24 / p50=0.71 / p100=0.98 with no
    * adjacent-point gap ≥ 0.12, while its k-means centers sit at
    * ~0.37/0.70/0.97). Stragglers simply join the nearest
    * population. A corpus with THREE-plus
    * neighbor-cosine populations (e.g. tight islands + loose islands
    * + an isotropic sea) thus gets one operating point per
    * population: under the r15 two-way split the two sub-threshold
    * populations resolved bits from their COMBINED size — wider than
    * either alone under the half-rate ramp — and each read below its
    * pure-regime recall (CROSSOVER §5b). Over-splitting one true
    * population is self-correcting: its halves resolve the same
    * width and merge back into one pass.
    *
    * Each bin's regime is its sample-mean top-1 vs the regime
    * threshold (clustered → full-rate width, isotropic → anchored
    * half-rate width, both from [[autoWidths]] at the BIN's size).
    * Bins resolving to the SAME width merge into one pass (their
    * operating points are identical — the widths stay the per-bin
    * resolutions, never re-resolved at the merged size). The query
    * side splits by bin; the candidate side stays the FULL corpus in
    * every pass (cross-stratum neighbors reachable; the label column
    * is evaluated only on the query path). Cost when triggered: the
    * candidate side signs and bucket-joins once per DISTINCT width
    * (each pass against that width's share of the queries) plus one
    * label-count job — paid only on corpora the probe measures as
    * mixed AND where the per-bin widths actually diverge; returns
    * None otherwise (global path). Row contract is unchanged: the
    * bins partition the query set, so the union carries every query
    * exactly once. */
  private def stratifiedKnnJoinLsh(vectors: DataFrame, k: Int,
      tables: Int, rescueCap: Int, thr: Double): Option[DataFrame] = {
    import graft.functions.VectorFunctions.nearestCellSim
    val session = vectors.sparkSession
    // the memoized probe (first probe on this corpus, or a memo hit):
    // labels must be relative to the SAME sample the stats measured
    val pr = regimeProbeStats(vectors)
    val qVals = pr.ids
    val flat = pr.flat
    val nq = qVals.length
    if (nq < 2) return None
    val dim = flat.length / nq
    val mat = flat.toArray
    def cos(i: Int, j: Int): Double = {
      var dot = 0.0; var ni = 0.0; var nj = 0.0; var d = 0
      while (d < dim) {
        val a = mat(i * dim + d).toDouble; val b = mat(j * dim + d).toDouble
        dot += a * b; ni += a * a; nj += b * b; d += 1
      }
      val denom = math.sqrt(ni) * math.sqrt(nj)
      if (denom == 0.0) 0.0 else dot / denom
    }
    // Per-sample SCORE (r16 late): the DISTRIBUTED median chooser
    // cosine where the sample had choosers, the WITHIN-SAMPLE top-1
    // where it had none. The distributed value is orphan-clean — a
    // sample that is its cluster's only sampled row still reads its
    // own population's pair cosine (its own cluster's rows choose
    // it), where its within-sample top-1 would read the cross-cluster
    // cosine and fake a low-cosine population on a PURE clustered
    // corpus. The MEDIAN, not the max: max-over-choosers is
    // extreme-valued and drifts up with chooser count
    // ([[ChooserStats]] — loose 0.70-islands read ~0.85 and merged
    // into the tight bin). A genuine minority sample, by contrast,
    // usually has NO choosers (its population's rows choose majority
    // samples — the max over many cross-population cosines beats the
    // max over few own-population ones), and its within-sample top-1
    // correctly reads its own low regime. The within-sample fallback
    // is computed only for the absent samples: O(#absent · nq · dim)
    // driver flops, tiny at every probe width.
    val sampleTop1 = (0 until nq).map { i =>
      val score = pr.perQuery.get(i).map(_.median).getOrElse(
        (0 until nq).collect { case j if j != i => cos(i, j) }.max)
      (qVals(i), score)
    }
    // 1-D Lloyd k-means over the sample top-1 cosines: the largest
    // valid k (all clusters >= minMass, adjacent centers >= minGap
    // apart) up to maxStrata wins; none valid = one population
    val maxStrata = math.max(2,
      intConf(session, "spark.graft.ann.lsh.maxStrata", 4))
    val minGap =
      doubleConf(session, "spark.graft.ann.lsh.strataMinGap", 0.15)
    // Mass floor: fractional (nq/16 ≈ 6%) at the default 256-sample
    // probe — small enough that noise tails don't form a "population",
    // large enough to estimate a bin mean — but CAPPED at 24 absolute
    // samples (r16 late): what validates a population is an absolute
    // count, not a corpus share, so widening the probe
    // (`spark.graft.ann.lsh.probeQueries`) lowers the discoverable
    // population share instead of freezing it at ~6% (24 of 1024
    // samples ≈ a 2.3% population; at the default 256 the cap is
    // inactive — min(16, 24) — and behavior is unchanged).
    val minMass = math.max(4, math.min(nq / 16, 24))
    val sorted = sampleTop1.map(_._2).sorted
    // smallest plausible-population cluster rejected on mass alone
    // across the k ladder (see the near-miss tracking in kmeans1d)
    var massOnlyMiss: Option[Int] = None
    def kmeans1d(k: Int): Option[Seq[Double]] = {
      var centers = (0 until k)
        .map(i => sorted(math.min(nq - 1, ((i + 0.5) / k * nq).toInt)))
        .toArray
      def assign(): (Array[Double], Array[Int]) = {
        val sums = Array.fill(k)(0.0)
        val counts = Array.fill(k)(0)
        sorted.foreach { v =>
          var best = 0; var bd = math.abs(v - centers(0)); var c = 1
          while (c < k) {
            val d = math.abs(v - centers(c))
            if (d < bd) { bd = d; best = c }
            c += 1
          }
          sums(best) += v; counts(best) += 1
        }
        (sums, counts)
      }
      var iter = 0
      var moved = true
      while (moved && iter < 25) {
        moved = false
        val (sums, counts) = assign()
        (0 until k).foreach { c =>
          if (counts(c) > 0) {
            val m = sums(c) / counts(c)
            if (math.abs(m - centers(c)) > 1e-9) { moved = true; centers(c) = m }
          }
        }
        iter += 1
      }
      // validate mass against the FINAL centers (review r16): exiting
      // at the iteration cap would otherwise judge one-update-stale
      // assignments
      val counts = assign()._2
      val cs = centers.toSeq.sorted
      val gapsOk =
        cs.sliding(2).forall(p => p.size < 2 || p(1) - p(0) >= minGap)
      val massOk = counts.forall(_ >= minMass)
      // near-miss tracking (r16 late): a split whose centers separate
      // cleanly but whose smallest cluster is a PLAUSIBLE population
      // (>= the hard floor of 4, < minMass) failed only on sample
      // width — the caller can make it discoverable by widening the
      // probe, and deserves to be told so (the loud-contract pattern).
      // An empty/straggler cluster (< 4) is k-too-large, not a
      // population; gap failures are genuinely one population.
      if (gapsOk && !massOk && counts.min >= 4)
        massOnlyMiss = Some(massOnlyMiss.fold(counts.min)(
          math.min(_, counts.min)))
      if (gapsOk && massOk) Some(cs) else None
    }
    val centersOpt = (maxStrata to 2 by -1).view.flatMap(kmeans1d).headOption
    if (centersOpt.isEmpty) { // one population after all
      val widen = massOnlyMiss match {
        case Some(m) if nq < 4096 =>
          // Actionable width (r16 late, measured at the CROSSOVER §5c
          // 97k rung where 1024 drew 20 samples of an expected ~31 and
          // missed the 24 floor by four): at the OBSERVED share m/nq
          // the suggested width's expected count must clear the capped
          // floor with a one-sigma binomial margin — x − √x ≥ 24 ⇒
          // x ≥ ~29.4 expected samples — rounded up to a power of two
          // and clamped at the probe's 4096 cap. The suggestion leans
          // CONSERVATIVE twice over: m is the min near-miss across the
          // whole k ladder (a k>2 sub-split can undercount the k=2
          // population — measured ~4 of 256 at the 29k rung, where the
          // true minority held ~8), and a sub-floor count is itself a
          // noisy share estimate; both errors over-widen, never
          // under-widen, and the probe cost is linear in the width.
          // m < minMass ≤ 24 guarantees the suggestion > nq.
          val need = 29.4 * nq / m
          val suggest = math.min(4096L,
            math.pow(2, math.ceil(math.log(need) / math.log(2))).toLong)
          s"; a well-separated candidate population of ~$m samples sits " +
            s"under the $minMass mass floor — widening " +
            s"spark.graft.ann.lsh.probeQueries (currently $nq, " +
            s"try >= $suggest) may make it discoverable"
        case _ => ""
      }
      logOnce(session, "INFO graft-ann: lsh stratify probe found no " +
        f"valid sample split (centers < $minGap%.2f apart or under " +
        f"$minMass mass; top-1 spread p0=${sorted.head}%.2f " +
        f"p50=${sorted(nq / 2)}%.2f p100=${sorted.last}%.2f); global path" +
        widen)
      return None
    }
    // bin boundary = midpoint between adjacent centers; bin of cosine
    // c = the number of boundaries at or below c (ascending)
    val centers = centersOpt.get
    val boundaries = centers.sliding(2).collect {
      case Seq(a, b) => (a + b) / 2.0
    }.toSeq
    def binOfCos(c: Double): Int = boundaries.count(_ <= c)
    val nBins = boundaries.size + 1
    // per-bin regime from the bin's sample mean top-1 cosine
    val binMeans = (0 until nBins).map { b =>
      val vs = sampleTop1.map(_._2).filter(c => binOfCos(c) == b)
      if (vs.isEmpty) thr else vs.sum / vs.size
    }
    // sample rows pinned driver-side to their within-sample bin
    val sampleBins: Map[Int, Seq[Any]] = sampleTop1
      .groupBy { case (_, c) => binOfCos(c) }
      .view.mapValues(_.map(_._1)).toMap
    def inList(ids: Seq[Any]): Column =
      if (ids.isEmpty) lit(false) else col("vec_id").isin(ids: _*)
    // null-embedding rows get a NULL cosine → coalesce to -1 (bin 0,
    // the lowest-cosine/recall-safe stratum) so the label column is
    // never null: a null label would NPE the getInt in the count job
    // below (ADVICE r15), and such rows vanish from every pass anyway
    // (null sigs explode to nothing) — exactly the global path's
    // behavior.
    val simCol = coalesce(
      nearestCellSim(col("embedding"), flat, nq), lit(-1.0d))
    val computedBin = boundaries.foldLeft(lit(0)) { (acc, b) =>
      acc + when(simCol >= b, 1).otherwise(0)
    }
    val labelCol = sampleBins.foldLeft(when(lit(false), lit(0))) {
      case (acc, (b, ids)) => acc.when(inList(ids), lit(b))
    }.otherwise(computedBin)
    // persist: the label expression is a fused 256-cosine loop per row,
    // and without materialization every consumer below (the count job,
    // each pass's query filter, qVecs filter, and rescue anti-join)
    // would re-evaluate it over the full corpus (review r15). Registered
    // for [[sweepAnnCaches]] like the rescue-path persists.
    val labeled = vectors.withColumn("graft_lsh_bin", labelCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    annCacheRegistry.add(labeled)
    val counts = labeled.groupBy("graft_lsh_bin").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // per-bin width at the bin's OWN size and regime
    val binBits = (0 until nBins).map { b =>
      val n = counts.getOrElse(b, 0L)
      val w = autoWidths(math.max(n, 2L), targetBucket = 8)
      b -> (if (binMeans(b) >= thr) w._1 else w._2)
    }.toMap
    val binsDesc = (0 until nBins).map { b =>
      val regime = if (binMeans(b) >= thr) "clustered" else "isotropic"
      f"bin$b[mean=${binMeans(b)}%.2f $regime n=${counts.getOrElse(b, 0L)}" +
        s" -> bits=${binBits(b)}]"
    }.mkString(" ")
    logOnce(session, s"INFO graft-ann: lsh stratified auto-bits $binsDesc")
    // merge bins sharing a resolved width into one pass at that width
    val widthGroups = binBits.groupBy(_._2)
      .view.mapValues(_.keys.toSeq.sorted).toSeq.sortBy(_._1)
    // per-bin recall wall (r16): an isotropic bin large enough to
    // resolve past the wall gets the same loud contract as the global
    // path — the wall is a property of the operating width, not of how
    // the corpus was partitioned. Checked AFTER the merge decision
    // (review r16) so a merged-to-global fallback whose MEAN reads
    // isotropic warns once via the global path's regime callback, not
    // twice — but a merged fallback whose mean reads CLUSTERED would
    // skip the global check entirely (the wall only fires on the
    // isotropic verdict), so for that case the per-bin check still
    // runs here: a discovered isotropic bin past the wall must be
    // loud even when a clustered majority drags the mean over the
    // threshold (review r16 late).
    def perBinWall(): Unit = (0 until nBins).foreach { b =>
      if (binMeans(b) < thr)
        checkRecallWall(session, binBits(b), counts.getOrElse(b, 0L))
    }
    if (widthGroups.size < 2) { // one width fits all: global is cheaper
      // the bin summary keeps this line corpus-specific, so the
      // print-once dedup can never suppress one corpus's fallback
      // because another corpus merged at the same width
      logOnce(session, "INFO graft-ann: lsh stratify bins all resolve " +
        s"bits=${widthGroups.head._1} ($binsDesc); global path")
      if (pr.stats.mean >= thr) perBinWall()
      // the labeled frame is dead on this path — release it instead of
      // pinning a corpus-sized cache until the next sweep (review r16
      // late; the unconditional attempt made this branch common)
      labeled.unpersist(blocking = false)
      return None
    }
    perBinWall()
    Some(widthGroups.map { case (bits, bins) =>
      bandedKnnPass(labeled, k, tables, bits, rescueCap,
        col("graft_lsh_bin").isin(bins: _*))
    }.reduce(_ unionByName _))
  }

  /** Multi-table SRP LSH ANN — the standard high-recall LSH form:
    * `tables` INDEPENDENT `bits`-plane hash tables (one [[
    * org.apache.spark.sql.graft.SrpSignature]] call emits all `tables`
    * signatures in a single fused loop — the expression's `bands` ARE the
    * tables, each band drawing its own planes from the shared seed), each
    * probed with the query's own bucket plus every 1-bit flip; the UNION
    * of candidates across tables is exact-cosine reranked. A neighbor is
    * found if ANY of the `tables` tables banks it near the query —
    * miss probability decays as (1 - p)^tables, which is what lifts
    * recall@5 from the single-table ~0.28 to ≥0.8 on the near-uniform
    * testdata embeddings (measured per round in RECALL_r*.json).
    *
    * 100 TB shape: the bucket join carries LEAN banded frames only —
    * (c_id, table, bucket) rows, `tables` per vector, no payloads — and
    * the probe side broadcasts (queries × tables × (bits+1) rows). The
    * matched pair set (bounded by queries × union-bucket population)
    * broadcasts back against the vector table for the exact rerank, so
    * the corpus-sized embedding column never shuffles and is read only
    * for matched candidates — the same payload-free banding discipline as
    * [[Dedup.embedNearDupsLsh]]. */
  def lshTopK(candidates: DataFrame, queryFilter: Column, k: Int = 5,
      tables: Int = 8, bits: Int = 6): DataFrame = {
    // bits <= 0 = auto, same log2(n/target) shape as [[knnJoinLsh]] but
    // at a denser target bucket (~32): the probe side here is a bounded
    // query set, so candidate volume per query — not the symmetric pair
    // stream — is what the width controls. Auto resolves to the legacy
    // 6 at the registered sf0.1 corpus (2000 vectors).
    val nBits = resolveBits(bits, () => candidates.count(), targetBucket = 32,
      regime = () => resolveLshRegime(candidates),
      session = () => candidates.sparkSession)
    val sigs = graft.functions.VectorFunctions.srpSignature(
      col("embedding"), bands = tables, bits = nBits, dim = 64, seed = 42)
    val all = candidates.withColumn("sigs", sigs)
    // lean banded candidate frame: no embedding payloads through the join
    val cand = all.select(col("vec_id").as("c_id"),
      posexplode(col("sigs")).as(Seq("t", "c_bucket")))
    // per table: own bucket + each 1-bit flip (bits+1 probes of 2^bits)
    val qProbe = all.filter(queryFilter)
      .select(col("vec_id").as("q_id"),
        posexplode(col("sigs")).as(Seq("t", "bucket")))
      .select(col("q_id"), col("t"), explode(expr(
        s"""array_union(array(bucket),
           |  transform(sequence(0, ${nBits - 1}), p -> int(bucket ^ shiftleft(1, p))))"""
          .stripMargin)).as("c_bucket"))
    val pairs = cand.join(broadcast(qProbe), Seq("t", "c_bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"))
      .dropDuplicates("q_id", "c_id") // same candidate via several tables/probes
    val cVecs = candidates.select(col("vec_id").as("c_id"),
      col("embedding").as("v_c"))
    val qVecs = candidates.filter(queryFilter)
      .select(col("vec_id").as("q_id"), col("embedding").as("v_q"))
    topKSelect(
      cVecs.join(broadcast(pairs), "c_id")
        .join(broadcast(qVecs), "q_id")
        .withColumn("cosine", cosineSim(col("v_q"), col("v_c"))), k)
  }

  /** IVF (inverted-file) ANN: a `cells`-cell coarse quantizer —
    * deterministic hash-sampled seeds refined by Lloyd steps (see
    * [[IvfIndex.train]]) — then queries probe their `probes` nearest
    * cells and rerank exactly inside them; search touches
    * ~probes/cells of the data.
    *
    * The coarse quantizer is DRIVER-RESIDENT, exactly as in FAISS/ScaNN:
    * `cells` centroids (cells × dim floats, a few KB) collect to the driver
    * and re-enter each plan as literals, so cell assignment is a pure
    * projection — argmax over `cells` fused cosine calls inside one codegen
    * stage — with no join and NO shuffle of the table. (A previous
    * formulation broadcast-joined centroids against the table and ran
    * groupBy(vec_id)+max_by, shuffling the full embedding column twice; at
    * 100 TB that shuffle is the whole job.) Centroid recompute stays
    * distributed: the typed [[graft.functions.CentroidAggregator]] runs
    * partial+final, shuffling only `cells` × dim-double partials. */
  def ivfTopK(candidates0: DataFrame, queryFilter: Column, k: Int = 5,
      cells: Int = 16, probes: Int = -1): DataFrame = {
    val index = IvfIndex.train(candidates0, cells)
    index.search(index.source.filter(queryFilter), k, probes)
  }

  /** Default probe counts derive as a FRACTION of `cells`, never a fixed
    * count: the r11 measured ≥0.8-nonseed operating points on the
    * ISOTROPIC testdata are 10 and 12 of 16 cells (62.5% / 75% corpus
    * coverage — isotropic embeddings are the quantizer-adversarial
    * floor, where recall is coverage-bound), and a fixed `probes=12`
    * default against a caller-supplied `cells=256` would silently be a
    * ~5%-coverage operating point with a fraction of the recall.
    * `probes <= 0` means "auto" at every entry. Clustered real corpora
    * reach the same recall at far lower coverage — tune DOWN via the
    * `spark.graft.ann.*` confs using the committed RECALL sweep grids. */
  def resolveProbes(cells: Int, probes: Int, num: Int, den: Int): Int =
    if (probes > 0) probes else math.max(1, (cells * num + den - 1) / den)

  /** Auto SRP signature width: `bits <= 0` resolves to
    * round(log2(n / targetBucket)) clamped to [4, 24] — the
    * [[resolveProbes]] discipline for the OTHER fixed-knob scale cliff
    * (CROSSOVER.md §1 r12: bits=8 at 150k rows → linearly growing
    * bucket populations → superlinear banded join). Pinning the
    * EXPECTED per-table bucket population at `targetBucket` keeps the
    * pair stream ~linear in n; the count supplier runs only in auto
    * mode (explicit bits stay fully lazy). The cap at 24 bounds the
    * flip-1 probe fan-out (bits+1 probes/table) and keeps bucket ids
    * comfortably in int range. */
  def resolveBits(bits: Int, count: () => Long, targetBucket: Int): Int =
    resolveBits(bits, count, targetBucket, () => "clustered")

  /** The corpus-size scale at which the committed recall grids were
    * measured (RECALL_r*.json's registered sf0.1 corpus: 2000 vectors;
    * the CROSSOVER isotropic rungs anchor here too). The isotropic
    * auto-bits ramp grows FROM this anchor — both regime formulas
    * resolve to the same width at this n by construction, which is what
    * keeps every registered operating point invariant under the regime
    * switch. */
  private[graft] val LshAnchorN = 2048L

  /** Regime-aware auto width (r14, VERDICT r13 #2). The two regimes need
    * opposite things from the signature:
    *
    *  - CLUSTERED (real corpora): true neighbors sit at near-dup cosine
    *    (θ → 0), so per-plane collision probability 1 - θ/π ≈ 1 and
    *    recall survives ANY width — the binding constraint is the pair
    *    stream, so bits track the bucket-POPULATION target at full rate,
    *    log2(n / targetBucket) (bucket population pinned ≈ targetBucket,
    *    pair stream ~linear in n; the CROSSOVER §1 clustered ladder
    *    holds recall 1.000 up it).
    *  - ISOTROPIC (the adversarial floor): nearest neighbors sit at
    *    moderate cosine (θ ≈ 50-60°), per-plane collision ≈ 0.65-0.7,
    *    and recall decays ~p^bits per table — CROSSOVER §1 measured the
    *    full-rate ramp TRADING recall DOWN (25k: 0.536 at the old fixed
    *    10 bits → 0.312 at auto 12). Here bits grow at HALF rate from
    *    the measured-recall anchor: log2(AnchorN/target) +
    *    0.5·log2(n/AnchorN) — bucket population grows as sqrt(n)
    *    (candidate volume O(n^1.5) total: the honest price of recall in
    *    the regime where approximation has no structure to exploit),
    *    capped by the full-rate width so small corpora are never made
    *    WIDER than the population target.
    *
    * Which regime applies comes from `regime()` — resolved by
    * [[resolveLshRegime]] (conf override or the measured
    * [[neighborCosineProbe]]) and evaluated only in auto mode. */
  def resolveBits(bits: Int, count: () => Long, targetBucket: Int,
      regime: () => String,
      session: () => SparkSession = () =>
        org.apache.spark.sql.SparkSession.active): Int =
    if (bits > 0) bits
    else {
      val n = math.max(count(), 2L)
      val (fullW, isoW) = autoWidths(n, targetBucket)
      // Probe only when the verdict can MOVE the width (ADVICE r14): at
      // or below the anchor the half-rate ramp sits at/above the
      // full-rate one, so min(full, anchored) == full for BOTH regimes
      // and the (memoized but still ~1 s cold) corpus scan buys nothing;
      // clamping can also collapse the two raws to one resolved width.
      // The skip still VALIDATES the regime conf (review r15): a typo'd
      // override must fail loudly at first use, not silently pass until
      // the corpus grows past the anchor. The conf is read from the
      // CALLER-threaded session (ADVICE r15) — operators pass their
      // frame's own sparkSession, so a multi-session app validates the
      // conf on the session actually in use, not SparkSession.active.
      val (r, resolved) =
        if (fullW == isoW) {
          regimeConf(session())
          ("any (formulas agree; probe skipped)", fullW)
        } else if (regime() == "isotropic") ("isotropic", isoW)
        else ("clustered", fullW)
      System.err.println(s"INFO graft-ann: lsh auto-bits n=$n regime=$r" +
        s" targetBucket=$targetBucket -> bits=$resolved")
      resolved
    }

  /** The two clamped auto-width candidates at corpus size `n`: (the
    * clustered full-rate width, the isotropic anchored half-rate width).
    * Equal at or below the anchor — the condition under which auto mode
    * skips the regime probe entirely. Factored out of [[resolveBits]] so
    * the stratified path can resolve each stratum at ITS regime and size
    * with the identical formulas. */
  private[graft] def autoWidths(n0: Long, targetBucket: Int): (Int, Int) = {
    def log2(x: Double) = math.log(x) / math.log(2.0)
    def clamp(raw: Int) = math.max(4, math.min(24, raw))
    val n = math.max(n0, 2L)
    val full = math.round(log2(n.toDouble / targetBucket)).toInt
    val anchored = math.round(log2(LshAnchorN.toDouble / targetBucket) +
      0.5 * log2(n.toDouble / LshAnchorN)).toInt
    (clamp(full), clamp(math.min(full, anchored)))
  }

  /** Measured LSH regime verdict for a `(vec_id, embedding)` corpus:
    * mean top-1 neighbor cosine — the quantity that DIRECTLY decides
    * whether wider signatures preserve recall (per-plane collision
    * probability for a neighbor at angle θ is 1 - θ/π; clustered
    * corpora hold neighbors at θ → 0 and tolerate any width, isotropic
    * ones at θ ≈ 55° lose ~p^bits recall per table — the CROSSOVER §1
    * isotropic table). A driver-side SAMPLE cannot see this (cluster
    * count grows with n, so a bounded sample's same-cluster pair count
    * decays to zero), so the probe is one distributed pass: `nQueries`
    * hash-sampled query vectors re-enter as a literal matrix (the
    * [[org.apache.spark.sql.graft.NearestCellSim]] machinery — queries
    * play the centroid role), every non-query row scores its nearest
    * query in one codegen'd scan, and per-query max cosine over the
    * rows that chose it is a tight lower bound on that query's true
    * top-1 neighbor. Cost: one corpus scan evaluating two fused
    * nQueries-cosine loops per row (argmax id + max sim are separate
    * native expressions) — ~2× the count job auto mode already pays,
    * memoized per corpus by [[resolveLshRegime]].
    *
    * `spark.graft.ann.lsh.regimeThreshold` (default 0.80) splits the
    * verdicts: measured means are ~0.97+ on the clustered generator and
    * ~0.5-0.7 on isotropic ones (testdata embeddings included), so the
    * threshold sits in the gap. Returns the raw mean so callers can log
    * or re-threshold. */
  private[graft] def neighborCosineProbe(vectors: DataFrame,
      nQueries: Int = 256): Double =
    neighborCosineStats(vectors, nQueries).mean

  /** Summary of the probe's per-query top-1 cosine distribution. The
    * regime verdict thresholds the MEAN; `p10`/`p90` make an even MIX
    * (clustered islands in an isotropic sea) visible — such a corpus
    * reads between the regimes on the mean but shows a wide p10/p90
    * spread (spec-pinned on an even clustered+isotropic union: p90
    * near-dup-grade, p10 isotropic-grade). The 2% tails (r16 late) are
    * diagnostic only — logged at regime resolution so a heavy-tailed
    * distribution is visible where the tuning decision is made. Note
    * what this distribution structurally CANNOT show: a small MINORITY
    * population. Its rows mostly choose MAJORITY samples as their
    * nearest (the max over many cross-population cosines beats the max
    * over few own-population ones), so minority samples never form
    * groups here and no percentile of the group values catches them —
    * minority discovery lives in [[stratifiedKnnJoinLsh]]'s per-sample
    * score over the RAW `perQuery` map instead. Per-partition
    * regimes remain a documented non-feature. */
  private[graft] final case class ProbeStats(mean: Double, p02: Double,
      p10: Double, p90: Double, p98: Double)
  /** The probe's deterministic query sample: `nQueries` md5(vec_id)-order
    * rows as (ids, flattened row-major embedding matrix). Shared by the
    * probe scan and the stratified path's per-row labeling, which must
    * agree on the sample to agree on the labels. */
  private[graft] def probeSample(vectors: DataFrame,
      nQueries: Int = 256): (Seq[Any], Seq[Float]) = {
    val qRows = vectors
      .select(col("vec_id"), col("embedding"))
      .orderBy(md5(col("vec_id").cast("string")))
      .limit(nQueries)
      .collect()
    (qRows.map(_.get(0)).toSeq, qRows.flatMap(_.getSeq[Float](1)).toSeq)
  }

  private[graft] def neighborCosineStats(vectors: DataFrame,
      nQueries: Int = 256): ProbeStats =
    neighborCosineDistWith(vectors, probeSample(vectors, nQueries))._1

  /** Per-chosen-sample distributed statistics over the rows that chose
    * the sample as their nearest: `top1` = the MAX chooser cosine — an
    * extreme-value statistic that drifts UP with chooser count (it
    * feeds the regime summary, whose 0.80 threshold was calibrated on
    * it), `median` = the MEDIAN chooser cosine — the population's
    * characteristic operating cosine, which the stratified score uses
    * instead: max-over-choosers measured ~0.85 on loose 0.70-islands
    * (~50 choosers each), within the 0.15 center gap of tight islands
    * and merging their bins, while the median stays at the pair-cosine
    * level (~0.70). */
  private[graft] final case class ChooserStats(top1: Double, median: Double)

  /** The probe's FULL per-query result against an already-collected
    * sample — so the memoized path ([[regimeProbeStats]]) collects the
    * sample ONCE and shares it with the stratified labeler. Returns the
    * summary stats plus the raw per-query map (sample index →
    * [[ChooserStats]] over the non-sample rows that chose that sample
    * as their nearest), collected driver-side: it is ≤ nQueries rows,
    * the same single groupBy job the summary aggregation already ran,
    * and the summary quantiles become exact instead of
    * percentile_approx. A sample ABSENT from the map had NO choosers —
    * for a minority-population sample that absence is itself the
    * signal (see [[stratifiedKnnJoinLsh]]'s per-sample score). */
  private[graft] def neighborCosineDistWith(vectors: DataFrame,
      sample: (Seq[Any], Seq[Float])): (ProbeStats, Map[Int, ChooserStats]) = {
    import graft.functions.VectorFunctions.{nearestCellSim, nearestCells}
    val (qVals, flat) = sample
    if (qVals.length < 2)
      return (ProbeStats(0.0, 0.0, 0.0, 0.0, 0.0), Map.empty)
    val nq = qVals.length
    val rows = vectors
      .filter(!col("vec_id").isin(qVals: _*))
      .select(
        element_at(nearestCells(col("embedding"), 0 until nq, flat, 1), 1)
          .as("q"),
        nearestCellSim(col("embedding"), flat, nq).as("s"))
      .groupBy(col("q")).agg(max(col("s")).as("top1"),
        expr("percentile_approx(s, 0.5)").as("med"))
      .collect()
    val per = rows.iterator
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2))
      .map(r => r.getInt(0) -> ChooserStats(r.getDouble(1), r.getDouble(2)))
      .toMap
    if (per.isEmpty) return (ProbeStats(0.0, 0.0, 0.0, 0.0, 0.0), per)
    val sorted = per.values.iterator.map(_.top1).toArray.sorted
    def q(p: Double): Double =
      sorted(math.min(sorted.length - 1, (p * sorted.length).toInt))
    (ProbeStats(sorted.sum / sorted.length, q(0.02), q(0.1), q(0.9),
      q(0.98)), per)
  }

  /** Resolve the LSH regime for auto-bits: the conf override
    * `spark.graft.ann.lsh.regime` ∈ {auto, clustered, isotropic}
    * (default auto) short-circuits the probe for callers who know their
    * corpus; auto runs [[neighborCosineProbe]] once and thresholds at
    * `spark.graft.ann.lsh.regimeThreshold`. Logged at resolve time,
    * like the IVF isotropy probe — the operating regime is visible
    * exactly where the tuning decision is made. */
  /** The MEMOIZED probe stats: per (session, analyzed-plan, input files)
    * — the probe is ~0.8-1.0 s of fixed job/plan cost even warm (measured
    * at the registered sf0.1 corpus), which is real money on a 2.5 s
    * entry benched min-of-2 — and the regime is a corpus-level property,
    * identical across the repeated calls bench runs, ladder loops, and
    * library callers make on the same frame. The outer weak map keys on
    * the SESSION OBJECT (a recycled identity hash can't alias; dead
    * sessions are GC-reclaimable) and the inner key folds in the
    * file-listing fingerprint, so a table rewritten under an identical
    * plan (new part files at the same path) re-probes instead of serving
    * the stale verdict (VERDICT r14 #2). In-memory/checkpointed frames
    * have no file provenance and key on the plan alone. Regimes move
    * slowly; the bound is fine.
    *
    * SAMPLE SIZE (r16): `spark.graft.ann.lsh.probeQueries` (default
    * 256, clamped to [16, 4096]) — 256 deterministic samples are thin
    * for a corpus with thousands of clusters (a cluster the sample
    * misses labels its rows toward the recall-safe low-cosine side, at
    * full-rate cost forgone — the documented residual), so large mixed
    * corpora can widen the probe. Cost grows linearly: the probe scan
    * and the stratified label column each evaluate one fused
    * nQueries-cosine loop per row, and the literal sample matrix is
    * nQueries × dim × 4 B (1 MB at the 4096 cap). The size is part of
    * the memo key, so a mid-session conf change re-probes instead of
    * serving a mismatched sample. */
  /** One memoized probe of a corpus: summary stats, the deterministic
    * query sample (ids + row-major matrix), and the per-query top-1 map
    * ([[neighborCosineDistWith]]). */
  private[graft] final case class ProbeResult(stats: ProbeStats,
      ids: Seq[Any], flat: Seq[Float], perQuery: Map[Int, ChooserStats])

  private[graft] def regimeProbeStats(vectors: DataFrame): ProbeResult = {
    val s = vectors.sparkSession
    val filesKey = {
      val fs = try vectors.inputFiles
               catch { case _: UnsupportedOperationException =>
                 Array.empty[String] }
      scala.util.hashing.MurmurHash3.arrayHash(fs.sorted)
    }
    val nQueries = math.max(16, math.min(4096,
      intConf(s, "spark.graft.ann.lsh.probeQueries", 256)))
    val key = (vectors.queryExecution.analyzed.semanticHash(),
      filesKey ^ nQueries)
    val inner = regimeMemo.synchronized {
      var m = regimeMemo.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(Int, Int),
          ProbeResult]()
        regimeMemo.put(s, m)
      }
      m
    }
    // probe OUTSIDE the map (review r14): computeIfAbsent would run a
    // multi-second Spark job under the bucket lock, serializing
    // unrelated corpora that hash to the same bucket; a lost race
    // costs one redundant (idempotent) probe instead. The KB-scale
    // query SAMPLE memoizes alongside the stats (review r15): the
    // stratified labeler needs the identical sample, and re-collecting
    // it would repeat the full-corpus TakeOrdered job per call.
    val cached = inner.get(key)
    if (cached != null) cached
    else {
      val sample = probeSample(vectors, nQueries)
      val (stats, per) = neighborCosineDistWith(vectors, sample)
      val fresh = ProbeResult(stats, sample._1, sample._2, per)
      val prev = inner.putIfAbsent(key, fresh)
      if (prev != null) prev else fresh
    }
  }

  /** Loud wrong-tool contract for isotropic LSH past the measured recall
    * wall (r16, VERDICT r15 #3) — the [[knnJoinLsh]] broadcast-bound
    * pattern applied to RECALL instead of memory. CROSSOVER §1b measured
    * the anchored half-rate ramp's sampled recall@3 at 0.519 (250k rows,
    * 11 bits) and 0.452 (1M rows, 12 bits) on isotropic corpora: past
    * ~11-bit signatures in the structureless regime, the banded
    * exact-rerank shape pays its O(n^1.5) candidate price for sub-0.55
    * recall, and routed scans (IVF / IVF-PQ with exact rerank, ~110 s vs
    * 3592 s at the 1M cell) are the right tool. Fires when the regime
    * verdict (probe or conf override) is isotropic AND the resolved
    * anchored width reaches `spark.graft.ann.lsh.recallWallBits`
    * (default 11 — the first measured sub-0.55 rung). PROBE-DEPTH-AWARE
    * since late r16: under `probeHamming=2` the threshold shifts +3
    * bits (CROSSOVER §1c — 0.858 measured at the flip1 wall rung,
    * ≥ 0.632 at 13 bits at 4× sparser-than-ramp buckets, so 14 is the
    * first unproven anchored rung), and the flip1 warn message names
    * the Hamming-2 shell as the in-family remedy.
    * `spark.graft.ann.lsh.recallWallAction` = warn (default, stderr) |
    * fail (contract error) | off. */
  private[graft] def checkRecallWall(s: SparkSession, isoBits: Int,
      n: Long): Unit = {
    val action =
      s.conf.get("spark.graft.ann.lsh.recallWallAction", "warn").trim
    require(Seq("warn", "fail", "off").contains(action),
      "spark.graft.ann.lsh.recallWallAction must be warn|fail|off, " +
        s"got $action")
    val wallBits = intConf(s, "spark.graft.ann.lsh.recallWallBits", 11)
    // PROBE-DEPTH-AWARE (r16 late): the Hamming-2 shell moves the wall
    // +3 bits — CROSSOVER §1c measured recall@3 0.858 at the flip1 wall
    // rung (250k/11 bits) and >= 0.632 at 13 bits even at 4×
    // sparser-than-ramp buckets, so under flip2 the first UNPROVEN
    // anchored rung is wallBits+3 (~8M isotropic rows at the default).
    val hamming = intConf(s, "spark.graft.ann.lsh.probeHamming", 1)
    val effWall = if (hamming == 2) wallBits + 3 else wallBits
    if (action != "off" && isoBits >= effWall) {
      val remedy =
        if (hamming == 2)
          "Past the measured Hamming-2 evidence the remaining remedies " +
            "are routing to knnJoinIvf / the IVF-PQ family (routed scan " +
            "+ exact rerank — the serving path at this scale), passing " +
            "explicit narrower bits if the extra candidate volume is " +
            "acceptable, or setting " +
            "spark.graft.ann.lsh.recallWallAction=off to proceed silently."
        else
          "Set spark.graft.ann.lsh.probeHamming=2 (margin-aware " +
            "Hamming-2 multi-probe — measured 0.519 -> 0.858 recall@3 at " +
            "the 250k wall rung for 2.2x wall, CROSSOVER §1c; moves the " +
            "wall +3 bits), route to knnJoinIvf / the IVF-PQ family " +
            "(routed scan + exact rerank — the serving path at this " +
            "scale), pass explicit narrower bits if the extra candidate " +
            "volume is acceptable, or set " +
            "spark.graft.ann.lsh.recallWallAction=off to proceed silently."
      val msg = s"knnJoinLsh: the corpus resolved ISOTROPIC at n=$n and " +
        s"the anchored auto ramp picks $isoBits-bit signatures — at/past " +
        s"the measured recall wall ($effWall bits; CROSSOVER §1b/§1c: " +
        "flip-1 sampled recall@3 0.519 at 250k/11 bits, 0.452 at 1M/12 " +
        "bits; flip-2 unmeasured past the +3 shift). In this regime the " +
        "banded exact-rerank join pays O(n^1.5) candidate volume for " +
        s"collision-bound recall. $remedy"
      if (action == "fail") throw new IllegalArgumentException(msg)
      else System.err.println(s"WARN graft-ann: $msg")
    }
  }

  /** The validated `spark.graft.ann.lsh.regime` conf value — the ONE
    * read-and-require site, shared by every path that consults the
    * override (including the probe-skip branch of [[resolveBits]] and
    * the stratify trigger, so a typo'd value fails loudly everywhere). */
  private[graft] def regimeConf(s: SparkSession): String = {
    val conf = s.conf.get("spark.graft.ann.lsh.regime", "auto").trim
    require(Seq("auto", "clustered", "isotropic").contains(conf),
      s"spark.graft.ann.lsh.regime must be auto|clustered|isotropic, got $conf")
    conf
  }

  private[graft] def resolveLshRegime(vectors: DataFrame): String = {
    val s = vectors.sparkSession
    val conf = regimeConf(s)
    if (conf != "auto") conf
    else {
      val thr = doubleConf(s, "spark.graft.ann.lsh.regimeThreshold", 0.80)
      val st = regimeProbeStats(vectors).stats
      val verdict = if (st.mean >= thr) "clustered" else "isotropic"
      // wide spread = a MIXED corpus (tails = minority populations):
      // the verdict below is the mean's side; see [[ProbeStats]]
      System.err.println(
        f"INFO graft-ann: lsh regime probe meanTop1Cosine=${st.mean}%.3f" +
          f" p02=${st.p02}%.3f p10=${st.p10}%.3f p90=${st.p90}%.3f" +
          f" p98=${st.p98}%.3f threshold=$thr%.2f -> $verdict")
      verdict
    }
  }
  private def ivfProbes(cells: Int, probes: Int): Int =
    resolveProbes(cells, probes, 5, 8)   // 62.5% coverage → 10 of 16
  private def ivfpqProbes(cells: Int, probes: Int): Int =
    resolveProbes(cells, probes, 3, 4)   // 75% coverage → 12 of 16

  /** Top-`probes` nearest cell ids via the native
    * [[org.apache.spark.sql.graft.NearestCells]] expression. The r8-r11
    * formulation built `greatest`/`sort_array` over `cells` literal
    * (sim, cell) structs — at cells=16 that codegens, but past it the
    * inlined 64-float typedLits blow the generated stage over the
    * method limits and Spark silently drops the WHOLE stage (including
    * the downstream pair-scoring cosine — the corpus-sized work) to
    * interpreted eval: measured 91 s vs 4 s at cells=64/n=10k. The
    * native expression carries the centroid matrix as a reference
    * object and keeps ranking bit-identical (cosine desc, cell id
    * desc), so cells can scale with sqrt(n) as the 100 TB story needs.
    *
    * TWO-LEVEL ROUTING (r13): a flat scan is still O(cells) per row —
    * under the cells≈sqrt(n) rule that makes corpus-wide assignment
    * O(n^1.5), which CROSSOVER.md §1 measured as the residual growth
    * term of the r12 IVF ladder. Past
    * `spark.graft.ann.routedCells.threshold` cells (default 64; -1
    * disables) the probe column becomes
    * [[org.apache.spark.sql.graft.NearestCellsRouted]]: a driver-side
    * k-means ([[superGroups]]) folds the KB-scale centroid matrix into
    * ~sqrt(cells) super-cells and each row scans only its
    * `spark.graft.ann.superProbes` nearest groups (default -1 = auto =
    * max(ceil(sqrt(S)), ceil(S/4)) since the r14 fidelity extension:
    * sqrt fan-out is measured near-flat to S≈26 and DECAYING past it,
    * the S/4 floor holds 0.96+ top-1 at every measured rung — see the
    * in-line note below and CROSSOVER.md §4) — O(cells^0.75) per row up
    * to S≈30 and a constant 4× per-row saving past it. Registered entries
    * run at cells=16, below the threshold, so their plans and results
    * are byte-identical to r12; the routed path is the scale rung,
    * measured in the r13 CROSSOVER ladder. */
  private def probeCells(cents: Seq[(Int, Seq[Float])], probes: Int): Column =
    probeCellsWith(cents, probes, activeAssignMode())

  /** The conf-resolved routing parameters that decide HOW a probe/assign
    * expression scans the centroid matrix: (routedCells.threshold,
    * superProbes). Captured ONCE at quantizer train time and persisted
    * with the index (r14, ADVICE r13): an append that re-resolved these
    * from the session at call time would silently mix flat- and
    * routed-assigned rows in one table whenever the confs (or the
    * defaults) changed between build and append. */
  private[graft] def activeAssignMode(): (Int, Int) = {
    val s = org.apache.spark.sql.SparkSession.active
    (intConf(s, "spark.graft.ann.routedCells.threshold", 64),
      intConf(s, "spark.graft.ann.superProbes", -1))
  }

  private[graft] def probeCellsWith(cents: Seq[(Int, Seq[Float])], probes: Int,
      mode: (Int, Int)): Column = {
    // clamp: Lloyd steps can collapse emptied cells below the requested
    // probe count (the legacy slice() tolerated that silently)
    val p = math.min(probes, cents.size)
    val threshold = mode._1
    // Routing must not silently break the COVERAGE contract: the auto
    // probe defaults request a FRACTION of cells (62.5-75% on isotropic
    // corpora, where recall is coverage-bound), but a routed scan
    // capped at `superProbes` groups can only ever return
    // ~superProbes·cells/S cells. Two guards: (a) routing applies only
    // when the requested probes are a SMALL fraction of cells (≤ 1/4 —
    // at higher coverage the flat scan is within 4× of the routed one
    // and exact, and the probe column is a tiny share of the stage
    // either way, see the doGenCode note in NearestCells); (b) when it
    // applies, the group fan-out widens to what the requested probe
    // count needs (ceil(p·S/cells) + 1 slack for uneven groups) if the
    // conf default is too narrow.
    if (threshold == -1 || cents.size < threshold || p * 4 > cents.size)
      graft.functions.VectorFunctions.nearestCells(col("embedding"),
        cents.map(_._1), cents.flatMap(_._2), p)
    else {
      val (ids, mat, superMat, offs) = superGroups(cents)
      val nGroups = offs.length - 1
      val needed = (p * nGroups + cents.size - 1) / cents.size + 1
      // superProbes default -1 = AUTO = max(ceil(sqrt(S)), ceil(S/4)).
      // Two measured regimes (CROSSOVER.md §4, r13 sweep + r14 extension
      // to S=32/45): below S≈30 ceil(sqrt(S)) is near-flat (top-1
      // agreement 0.986/0.976 at S=20/26) at a per-row scan of
      // S + cells/sqrt(S) = O(cells^0.75) under S=sqrt(cells); past it
      // the sqrt fan-out DECAYS (0.941 at S=32, 0.894 at S=45 — the r13
      // "near-flat" read was an extrapolation, now measured false),
      // while a constant S/4 fraction holds 0.96-0.99 at every measured
      // rung at a ~28% fine-cell scan. The S/4 floor caps the router's
      // asymptotic win at a constant 4× per-row for very large cell
      // counts (a 3-level router would recover asymptotics if a corpus
      // ever needs cells >> 2000); both formulas coincide up to S≈20,
      // so every registered plan and the swept flat regime are
      // unchanged by the r14 re-tune.
      val conf = mode._2
      val base =
        if (conf > 0) conf
        else math.max(math.ceil(math.sqrt(nGroups.toDouble)).toInt,
          (nGroups + 3) / 4)
      val superProbes = math.min(nGroups, math.max(needed, base))
      graft.functions.VectorFunctions.nearestCellsRouted(col("embedding"),
        ids, mat, superMat, offs, p, superProbes)
    }
  }

  /** Driver-side k-means of the fine centroids into ~sqrt(cells)
    * super-cells for [[probeCells]]' routed mode — the classic two-level
    * coarse quantizer (FAISS IMI shape), built where it belongs: the
    * centroid matrix is KB-scale driver state already, so grouping it is
    * microseconds of pure Scala, deterministic (seeds are every
    * (cells/S)-th centroid in cell-id order; no RNG), and needs no Spark
    * job. Returns the fine ids/matrix GROUPED by super-cell, the
    * super-centroid matrix, and the S+1 fencepost offsets — the
    * [[org.apache.spark.sql.graft.NearestCellsRouted]] layout contract.
    * Empty groups are compacted away (fenceposts must be strictly
    * increasing). */
  private[graft] def superGroups(cents: Seq[(Int, Seq[Float])])
      : (Seq[Int], Seq[Float], Seq[Float], Seq[Int]) = {
    val sorted = cents.sortBy(_._1)
    val cells = sorted.size
    val dim = sorted.head._2.length
    val s = math.max(2, math.ceil(math.sqrt(cells.toDouble)).toInt)
    val fine: Array[Array[Double]] =
      sorted.map(_._2.map(_.toDouble).toArray).toArray
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < dim) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val denom = math.sqrt(na) * math.sqrt(nb)
      val c = if (denom == 0.0) 0.0 else dot / denom
      if (java.lang.Double.isNaN(c)) Double.NegativeInfinity else c
    }
    var superCents: Array[Array[Double]] =
      Array.tabulate(s)(i => fine((i.toLong * cells / s).toInt).clone())
    val assign = new Array[Int](cells)
    for (_ <- 0 until 5) {
      var c = 0
      while (c < cells) {
        var best = 0; var bestSim = Double.NegativeInfinity; var g = 0
        while (g < s) {
          val sim = cosine(fine(c), superCents(g))
          if (sim > bestSim) { bestSim = sim; best = g }
          g += 1
        }
        assign(c) = best
        c += 1
      }
      val sums = Array.fill(s)(new Array[Double](dim))
      val cnt = new Array[Int](s)
      c = 0
      while (c < cells) {
        val g = assign(c); cnt(g) += 1
        var i = 0
        while (i < dim) { sums(g)(i) += fine(c)(i); i += 1 }
        c += 1
      }
      superCents = Array.tabulate(s) { g =>
        if (cnt(g) == 0) superCents(g)
        else { val m = sums(g); var i = 0
          while (i < dim) { m(i) /= cnt(g); i += 1 }; m }
      }
    }
    val groups = (0 until s).map(g =>
      g -> (0 until cells).filter(assign(_) == g)).filter(_._2.nonEmpty)
    val orderedIdx = groups.flatMap(_._2)
    val ids = orderedIdx.map(i => sorted(i)._1)
    val mat = orderedIdx.flatMap(i => sorted(i)._2)
    val superMat = groups.flatMap { case (g, _) =>
      superCents(g).map(_.toFloat).toSeq
    }
    val offs = groups.map(_._2.size).scanLeft(0)(_ + _)
    (ids, mat, superMat, offs)
  }
  private[graft] def nearestCellColWith(cents: Seq[(Int, Seq[Float])],
      mode: (Int, Int)): Column =
    element_at(probeCellsWith(cents, 1, mode), 1)

  /** Freeze a FINAL quantizer's assignment mode: the conf pair with an
    * auto (-1) superProbes replaced by its concrete resolution against
    * the final centroid set. r14 (review finding): persisting the raw -1
    * in the sidecar let a future auto-FORMULA re-tune — exactly this
    * round's ceil(sqrt(S)) → S/4-floor change — silently alter
    * appended-row assignment on an index saved under the old auto, the
    * precise drift the sidecar exists to prevent. Resolution mirrors the
    * call-time auto in [[probeCellsWith]] (same superGroups, same
    * formula), so the frozen value assigns byte-identically to what auto
    * resolved at train time. Routing-inactive quantizers keep -1: with
    * the threshold and the frozen centroid count both persisted, flat
    * assignment is formula-era-independent. */
  private def freezeAssignMode(cents: Seq[(Int, Seq[Float])],
      mode: (Int, Int)): (Int, Int) =
    if (mode._2 > 0 || mode._1 == -1 || cents.size < mode._1) mode
    else {
      val (_, _, _, offs) = superGroups(cents)
      val s = offs.length - 1
      (mode._1, math.min(s, math.max(
        math.ceil(math.sqrt(s.toDouble)).toInt, (s + 3) / 4)))
    }

  /** Assignment-mode sidecar of a persisted index (see
    * [[activeAssignMode]]): KB-scale, written by both `save` variants,
    * read back by `load`/`append` so a maintained table keeps ONE
    * assignment semantics for its whole life regardless of session-conf
    * drift between build and append. Since the r14 review pass the
    * persisted super_probes is always CONCRETE for a routing-active
    * quantizer (see [[freezeAssignMode]]). */
  private def writeAssignMeta(spark: SparkSession, path: String,
      mode: (Int, Int)): Unit = {
    import spark.implicits._
    Seq(mode).toDF("routed_threshold", "super_probes")
      .repartition(1).write.mode("overwrite").parquet(s"$path/assign_meta")
  }
  /** Missing sidecar (an index saved before r14) falls back to the
    * CURRENT session confs with a loud warning — the documented caveat
    * that appends to such an index can mix assignment modes if confs
    * changed since it was built.
    *
    * A sidecar holding a RAW super_probes=-1 (saved between the sidecar's
    * introduction and the r14 freeze commit) is resolved HERE with the
    * formula that was in force when such sidecars were written —
    * ceil(sqrt(S)) — never the current auto formula (r15, ADVICE r14):
    * passing the -1 through to [[probeCellsWith]] would let any future
    * auto re-tune (exactly the r14 sqrt→S/4-floor change) silently alter
    * appended-row assignment on a routing-active index built under the
    * old auto. `cents` is the loaded quantizer's centroid set (every
    * read site has it), used only to decide routing-activeness and S. */
  private def readAssignMeta(spark: SparkSession, path: String,
      cents: Seq[(Int, Seq[Float])]): (Int, Int) =
    try {
      val r = spark.read.parquet(s"$path/assign_meta").collect().head
      val (threshold, sp) = (r.getInt(0), r.getInt(1))
      if (sp != -1 || threshold == -1 || cents.size < threshold)
        (threshold, sp) // concrete, or routing-inactive: formula-free
      else {
        val (_, _, _, offs) = superGroups(cents)
        val s = offs.length - 1
        val legacy = math.min(s, math.ceil(math.sqrt(s.toDouble)).toInt)
        System.err.println(s"WARN graft-ann: assign_meta at $path holds " +
          s"a pre-freeze auto super_probes (-1); pinning it to the " +
          s"formula of its era, ceil(sqrt(S))=$legacy at S=$s groups, so " +
          "appends keep the index's build-time assignment semantics")
        (threshold, legacy)
      }
    } catch {
      case _: org.apache.spark.sql.AnalysisException =>
        System.err.println(s"WARN graft-ann: no assign_meta at $path " +
          "(index saved before the sidecar existed); assignment falls " +
          "back to current session confs — appends may mix routing modes " +
          "if spark.graft.ann.* changed since the index was built")
        activeAssignMode()
    }

  /** A trained IVF index: driver-resident centroids (FAISS-style) plus the
    * cell-assigned vector table — build ONCE, [[IvfIndex.search]] many
    * times. The per-call [[ivfTopK]] contract retrains every invocation
    * (that is its benched/registered shape); a production serving path
    * amortizes training across queries through this handle instead. */
  final class IvfIndex private[Similarity] (
      val centroids: Seq[(Int, Seq[Float])],
      private[Similarity] val source: DataFrame,
      private[Similarity] val assigned: DataFrame,
      /** Isotropy probe result (NaN on a [[IvfIndex.load]]ed index —
        * reopening must not pay a training-set scan). */
      val meanCentroidSim: Double = Double.NaN,
      /** "lsh" when the probe saw no cluster structure, "ivf" when
        * routing pays, "unknown" on a loaded index. */
      val recommendation: String = "unknown",
      /** Routing parameters the assigned table was built under — frozen
        * at train time (or read back from the persisted sidecar), used
        * by every later assignment against this index so appends can
        * never mix flat- and routed-assigned rows (ADVICE r13). */
      private[Similarity] val assignMode: (Int, Int) = activeAssignMode()) {
    /** Persist the trained index: the cell-assigned vector table lands
      * as an EXTERNAL table bucketed by `cell` (one bucket per cell — a
      * loaded index's probe join prunes to matching buckets with no
      * shuffle of the table) and the KB-scale centroids as a tiny
      * parquet dataset — the standalone-[[IvfIndex]] twin of
      * [[IvfPqIndex.save]]. Unlike IVF-PQ's 12-byte code table, the IVF
      * structure IS the full-vector table routed by cell; that is the
      * storage trade the PQ variants exist to beat. */
    def save(name: String, path: String): Unit = {
      val spark = assigned.sparkSession
      import spark.implicits._
      graft.sources.Layout.writeBucketedExternal(assigned,
        s"${name}_assigned", s"$path/assigned", centroids.size, Seq("cell"))
      centroids.toDF("cell", "vec")
        .repartition(1).write.mode("overwrite").parquet(s"$path/centroids")
      writeAssignMeta(spark, path, assignMode)
    }

    /** Top-k per query vector in `queryVecs` (`vec_id`, `embedding`):
      * each query probes its `probes` nearest cells and reranks exactly
      * inside them — touches ~probes/cells of the data. */
    def search(queryVecs: DataFrame, k: Int = 5, probes: Int = -1): DataFrame = {
      val nProbes = ivfProbes(centroids.size, probes)
      // queries probe their `probes` nearest cells (cosine desc with
      // larger-cell tie-break — deterministic)
      val qProbe = queryVecs
        .withColumn("probe_cells", probeCells(centroids, nProbes))
        .select(col("vec_id").as("q_id"), col("embedding").as("v_q"),
          explode(col("probe_cells")).as("cell"))
      topKSelect(
        assigned.join(broadcast(qProbe), Seq("cell"))
          .withColumn("cosine", cosineSim(col("v_q"), col("v_c")))
          .filter(col("q_id") =!= col("c_id")), k)
    }
  }

  object IvfIndex {
    /** Re-open an index persisted by [[IvfIndex.save]]: centroids
      * collect back to the driver (KB-scale), the assigned table is a
      * pure bucketed scan — no re-assignment projection, no Lloyd
      * recompute, and no vectors parameter (the assigned table carries
      * the embeddings; `source` derives from it). Path-addressed like
      * every graft index load: a restarted session's catalog is
      * re-registered from the files. */
    def load(spark: SparkSession, name: String, path: String): IvfIndex = {
      val centroids = spark.read.parquet(s"$path/centroids").collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
      graft.sources.Layout.registerBucketedExternal(spark,
        s"${name}_assigned", s"$path/assigned", centroids.size, Seq("cell"))
      val assigned = spark.table(s"${name}_assigned")
      val source = assigned.select(col("c_id").as("vec_id"),
        col("v_c").as("embedding"))
      new IvfIndex(centroids, source, assigned,
        assignMode = readAssignMeta(spark, path, centroids))
    }

    /** Incremental maintenance for a saved full-vector IVF index — the
      * [[IvfPqIndex.append]] twin: assign a batch of NEW vectors to
      * their nearest cells with the FROZEN centroids and append them to
      * the persisted bucketed assigned table. No retrain, no rewrite,
      * no shuffle beyond the batch; the same recall-decay/retrain
      * guidance as the composite applies (retrain once the appended
      * fraction passes ~0.5, sooner under distribution shift). */
    def append(spark: SparkSession, name: String, path: String,
        newVectors: DataFrame): Unit = {
      val centroids = spark.read.parquet(s"$path/centroids").collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
      graft.sources.Layout.registerBucketedExternal(spark,
        s"${name}_assigned", s"$path/assigned", centroids.size, Seq("cell"))
      // assignment under the PERSISTED mode, never the session confs —
      // one table, one assignment semantics for its whole life
      val assigned = newVectors.select(col("vec_id"), col("embedding"))
        .withColumn("cell",
          nearestCellColWith(centroids, readAssignMeta(spark, path, centroids)))
        .select(col("vec_id").as("c_id"), col("cell"),
          col("embedding").as("v_c"))
      graft.sources.Layout.appendBucketedExternal(assigned,
        s"${name}_assigned", centroids.size, Seq("cell"))
    }

    /** Train a `cells`-cell coarse quantizer over `candidates0` and
      * assign every vector to its nearest cell.
      *
      * Seeding is a DETERMINISTIC HASH-SAMPLE: the `cells` vectors
      * first in md5(vec_id) order — engine-portable and stable across
      * partitionings (the [[graft.ext.Pipeline]] `x_split_stable`
      * discipline), and uniformly spread over the corpus. The previous
      * first-k seeding (`vec_id < cells`) made the registered queries
      * (vec_id < 10) a SUBSET of the seeds, flattering their recall
      * while arbitrary queries fell to the quantizer's true floor
      * (RECALL_r10 nonseed_queries: 0.26–0.36 vs the 0.96 headline) —
      * a hash-sample removes the seed/query correlation so the
      * measured recall IS the operating recall. `lloydIters` Lloyd
      * steps refine the sample (each fully distributed: assignment is
      * a codegen projection, recompute shuffles only cells × dim-double
      * partials; at corpus scale train on a sampled frame, as FAISS
      * does). */
    def train(candidates0: DataFrame, cells: Int = 16,
        lloydIters: Int = 3): IvfIndex = {
      // ENFORCED CELLS BOUND (r15, VERDICT r14 #5 — the broadcast-bound
      // discipline applied to the router's asymptotic boundary): the
      // two-level routed assignment is O(cells^0.75)/row only up to
      // S≈30 super-groups (cells≈900); past it the S/4 fidelity floor
      // caps the win at a CONSTANT ~4× over the flat O(cells) scan
      // (CROSSOVER §4, measured to S=45 / cells=2000 / 4M rows). Under
      // the cells≈sqrt(n) rule the default bound of 4096 covers ~16M
      // rows per index — beyond that, assignment cost per row grows
      // linearly in cells again, a regime the caller must opt into
      // consciously (shard the corpus across indexes, or raise
      // `spark.graft.ann.cellsBound` / set -1 after reading this; a
      // 3-level router would recover asymptotics and is the documented
      // next step if a real corpus needs it).
      val cellsBound = longConf(candidates0.sparkSession,
        "spark.graft.ann.cellsBound", 4096L)
      require(cellsBound <= 0 || cells <= cellsBound,
        s"IvfIndex.train: cells=$cells exceeds " +
          s"spark.graft.ann.cellsBound=$cellsBound. Past ~900 cells the " +
          "routed scan's win over flat assignment is a constant ~4x " +
          "(the S/4 fidelity floor, CROSSOVER.md §4), so per-row " +
          "assignment grows ~linearly in cells again. Shard the corpus " +
          "across indexes, or raise the bound (set -1 to disable) if " +
          "the O(cells/4)-per-row cost is acceptable.")
      // Materialize the (vec_id, embedding) projection ONCE: seed collect,
      // the Lloyd-step recompute, cell assignment, and (in the per-call
      // ivfTopK shape) the query-probe side otherwise each re-scan the
      // source (4 scans + repartition shuffles per invocation). Eager
      // localCheckpoint keeps the projection block-resident with no
      // lingering cache entry — ContextCleaner frees the blocks when the
      // caller drops the index (the [[Dedup.connectedComponents]]
      // residency pattern).
      val candidates = candidates0.select(col("vec_id"), col("embedding"))
        .localCheckpoint(true)
      // TRAINING-SET BOUND (the FAISS discipline): Lloyd steps need a
      // representative sample, not the corpus — past `trainCap` vectors
      // the quantizer trains on the first-cap md5(vec_id)-order sample
      // (one TakeOrdered pass; the same hash order that picks the
      // seeds, so seeds ⊂ training set), keeping training cost BOUNDED
      // while assignment/encode still cover every vector. Below the
      // cap the corpus trains as-is — bit-identical at test SF.
      val trainCap = intConf(candidates0.sparkSession,
        "spark.graft.ann.trainCap", 65536)
      // bounded probe: counts at most cap+1 checkpointed rows
      val trainSet =
        if (candidates.limit(trainCap + 1).count() <= trainCap) candidates
        else candidates
          .orderBy(md5(col("vec_id").cast("string")))
          .limit(trainCap)
          .repartition(candidates0.sparkSession
            .sparkContext.defaultParallelism)
          .localCheckpoint(true)
      // routing params frozen HERE: Lloyd steps, the final assignment,
      // and every future append against this index share one semantics
      val assignMode = activeAssignMode()
      def nearestCell(cents: Seq[(Int, Seq[Float])]): Column =
        nearestCellColWith(cents, assignMode)
      def collectCentroids(df: DataFrame): Seq[(Int, Seq[Float])] =
        df.collect().toSeq.map(r => (r.getInt(0), r.getSeq[Float](1)))

      val seeds: Seq[(Int, Seq[Float])] = trainSet
        .select(col("embedding"), md5(col("vec_id").cast("string")).as("__h"))
        .orderBy(col("__h"))
        .limit(cells)
        .collect().toSeq
        .sortBy(_.getString(1))
        .zipWithIndex
        .map { case (r, i) => (i, r.getSeq[Float](0)) }
      // misuse fails deliberately: greatest() needs >= 2 cell structs,
      // and a 1-cell quantizer is not an IVF
      require(seeds.size >= 2,
        s"IvfIndex.train: needs >= 2 seed vectors (cells=$cells); got ${seeds.size}")
      // Lloyd steps: assign to nearest centroid, recompute per-cell means.
      // Centroid recompute stays distributed: the typed
      // [[graft.functions.CentroidAggregator]] runs partial+final,
      // shuffling only `cells` × dim-double partials. (k-means objective is
      // monotone non-increasing per step; an emptied cell simply drops out
      // of the quantizer.)
      val centroidUdaf = udaf(graft.functions.CentroidAggregator.agg)
      val centroids = (0 until math.max(lloydIters, 1))
        .foldLeft(seeds) { (cents, _) =>
          val next = collectCentroids(trainSet
            .withColumn("cell", nearestCell(cents))
            .groupBy(col("cell")).agg(centroidUdaf(col("embedding")).as("c_vec")))
          require(next.size >= 2,
            s"IvfIndex.train: quantizer collapsed to ${next.size} cell(s)")
          next
        }
      // Isotropy probe (r12): mean cosine of the training vectors to
      // their nearest centroid — a one-pass routing-usefulness signal
      // over the already-checkpointed training set. On isotropic data
      // (no cluster structure) the best of `cells` directions in high
      // dimension is weak (~0.2-0.35 here) and quantizer recall is
      // coverage-bound, so data-independent SRP-LSH dominates at equal
      // cost; on clustered corpora vectors hug their centroid (≫0.5)
      // and IVF routing pays. Logged at train time so the operating
      // regime is visible exactly where the tuning decision is made.
      val meanCentroidSim = trainSet
        .select(graft.functions.VectorFunctions.nearestCellSim(
          col("embedding"), centroids.flatMap(_._2), centroids.size).as("s"))
        .agg(avg(col("s"))).collect().head.getDouble(0)
      val recommendation = if (meanCentroidSim < 0.5) "lsh" else "ivf"
      System.err.println(
        f"INFO graft-ann: isotropy probe meanCentroidSim=$meanCentroidSim%.3f" +
          s" -> recommend $recommendation (" +
          (if (recommendation == "lsh")
            "no cluster structure to route by: SRP-LSH dominates " +
              "quantizer ANN here; quantizer recall is coverage-bound — " +
              "see spark.graft.ann.* confs and the RECALL sweep grids"
          else
            "cluster structure detected: IVF cell routing is effective") +
          ")")
      // the mode the index CARRIES (and persists) resolves auto against
      // the final centroids — byte-identical assignment to the auto
      // path today, immune to auto-formula re-tunes tomorrow
      val frozenMode = freezeAssignMode(centroids, assignMode)
      val assigned = candidates
        .withColumn("cell", nearestCellColWith(centroids, frozenMode))
        .select(col("vec_id").as("c_id"), col("cell"), col("embedding").as("v_c"))
      new IvfIndex(centroids, candidates, assigned,
        meanCentroidSim, recommendation, frozenMode)
    }
  }

  /** Product-quantization ANN — the memory-bound scale path: vectors
    * compress to `m` packed ceil(log2(pqCodes))-bit codes + a norm
    * (~12 bytes at the default 4-bit layout; 16 at a long-packed one), the heavy
    * query×candidate scan scores via `m` lookups into a per-query ADC
    * table, and only a `rerank`-deep shortlist ever touches the full
    * vectors again (via a join back to the vector table — the codes scan
    * itself never carries embeddings). Codebooks are hash-sample-seeded
    * and Lloyd-refined per subspace (see [[PqIndex.train]]; the
    * encode/ADC machinery is what changes the scale economics, the
    * training just has to be uncorrelated with the queries). Shortlist
    * ranking = ADC-approximate
    * cosine (adc_dot / candidate norm; the query norm is constant within
    * a query and cannot change its ranking).
    *
    * `pqCodes` defaults to 32 since r14 (VERDICT r13 #7: the 16-code
    * registered point carried a 0.4 min-recall tail for several rounds).
    * The RECALL_r14 sweep at the registered rerank=200: 16 codes
    * mean 0.82 / min 0.4 → 32 codes mean 0.90 / min 0.6 — codebook
    * RESOLUTION was the binding constraint on this isotropic corpus, not
    * shortlist depth (16 codes needed rerank=400 to reach min 0.6).
    * Costs: codes pack 5-bit → a long (8 B/vector vs 4), LUT doubles to
    * m×32 doubles per query, training Lloyd steps score 2× centroids —
    * the ADC scan shape (the corpus-bound term) is unchanged. */
  def pqTopK(candidates: DataFrame, queryFilter: Column, k: Int = 5,
      m: Int = 8, pqCodes: Int = 32, rerank: Int = 200): DataFrame = {
    val index = PqIndex.train(candidates, m, pqCodes)
    index.search(candidates.filter(queryFilter), k, rerank)
  }

  /** A trained PQ index: driver-resident codebooks plus the ~12-byte
    * (codes, norm) compressed table — build ONCE, [[PqIndex.search]] many
    * times (the [[pqTopK]] per-call contract retrains every invocation;
    * that is its benched/registered shape). */
  final class PqIndex private[Similarity] (
      val codebooks: Array[Float], m: Int, pqCodes: Int,
      candidates: DataFrame, private[Similarity] val enc: DataFrame) {
    /** Persist the trained index: the ~12-byte (c_id, codes, norm)
      * compressed table plus the codebook meta. The code table lands as
      * PLAIN parquet — deliberately unbucketed: PQ's ADC stage is a full
      * scan against a broadcast query side by design (there is no join
      * key to co-locate; bounding the scanned FRACTION is IVF's job, and
      * the composite [[IvfPqIndex]] buckets by cell for exactly that
      * reason). The vector table is not copied — [[PqIndex.load]] takes
      * the same `(vec_id, embedding)` frame back for the rerank stage. */
    def save(path: String): Unit = {
      val spark = enc.sparkSession
      import spark.implicits._
      enc.write.mode("overwrite").parquet(s"$path/enc")
      Seq((codebooks.toSeq, m, pqCodes)).toDF("codebooks", "m", "pq_codes")
        .repartition(1).write.mode("overwrite").parquet(s"$path/meta")
    }

    /** Top-k per query vector: ADC-scored shortlist of `rerank`
      * candidates, then exact rerank touching full vectors only for the
      * shortlist. */
    def search(queryVecs: DataFrame, k: Int = 5, rerank: Int = 200): DataFrame = {
      import graft.functions.VectorFunctions.{pqAdc, pqLut}
      val q = queryVecs.select(col("vec_id").as("q_id"),
        col("embedding").as("v_q"),
        pqLut(col("embedding"), codebooks, m, pqCodes).as("lut"))
      val shortlist = enc.join(broadcast(q.select(col("q_id"), col("lut"))),
          col("q_id") =!= col("c_id"))
        .withColumn("adc", pqAdc(col("pq"), col("lut"), m, pqCodes) / col("norm_c"))
        .withColumn("srk", row_number().over(Window.partitionBy(col("q_id"))
          .orderBy(col("adc").desc, col("c_id"))))
        .filter(col("srk") <= rerank)
        .select(col("q_id"), col("c_id"))
      // exact rerank touches full vectors only for the shortlist
      val cVecs = candidates.select(col("vec_id").as("c_id"),
        col("embedding").as("v_c"))
      topKSelect(
        shortlist.join(cVecs, "c_id")
          .join(broadcast(q.select(col("q_id"), col("v_q"))), "q_id")
          .withColumn("cosine", cosineSim(col("v_q"), col("v_c"))), k)
    }
  }

  object PqIndex {
    /** Re-open an index persisted by [[PqIndex.save]]: codebooks collect
      * back to the driver (KB-scale), the compressed table is a pure
      * parquet scan — no re-encode pass. `vectors` is the same
      * `(vec_id, embedding)` corpus frame the index was built over,
      * touched only by the exact-rerank stage for shortlist rows. */
    def load(spark: SparkSession, path: String,
        vectors: DataFrame): PqIndex = {
      val metaRow = spark.read.parquet(s"$path/meta").collect().head
      val codebooks = metaRow.getSeq[Float](0).toArray
      val m = metaRow.getInt(1)
      val pqCodes = metaRow.getInt(2)
      new PqIndex(codebooks, m, pqCodes,
        vectors.select(col("vec_id"), col("embedding")),
        spark.read.parquet(s"$path/enc"))
    }

    /** Build codebooks — seeded from a DETERMINISTIC HASH-SAMPLE of
      * `pqCodes` vectors' subvectors (first in md5(vec_id) order — the
      * same engine-portable discipline as [[IvfIndex.train]]; the old
      * first-k seeding correlated seeds with the registered queries and
      * flattered measured recall), then refined by `lloydIters`
      * per-subspace k-means steps and encode every vector to `m` packed
      * ceil(log2(pqCodes))-bit codes plus its norm (at pqCodes=16 — the
      * historical layout — codes int-pack bit-identically to pre-r14, so
      * old saved indexes keep loading; the r14 DEFAULT 32 long-packs at
      * 5 bits/field into a BIGINT column).
      * Each Lloyd step is fully distributed:
      * one pass encodes with the current codebooks and the
      * per-(subspace, code) mean subvectors come back through the typed
      * [[graft.functions.CentroidAggregator]] (≤ m×k tiny partials);
      * a code that captures no vectors keeps its previous centroid. The
      * k-means objective (total sub-quantization error) is monotone
      * non-increasing per step — property-tested in ExtSpec. */
    def train(candidates: DataFrame, m: Int = 8, pqCodes: Int = 32,
        lloydIters: Int = 2): PqIndex = {
      import graft.functions.VectorFunctions.{pqEncode, vecNorm}
      // bounded training set, same discipline (and same hash order) as
      // [[IvfIndex.train]]: Lloyd refinement samples, encode covers all.
      // The over-cap probe counts at most cap+1 rows (CollectLimit, not
      // a full count), and BOTH branches land on a checkpointed frame so
      // the seed collect + `lloydIters` Lloyd scans replay blocks, not
      // the caller's upstream plan (which pqTopK passes raw).
      val trainCap = intConf(candidates.sparkSession,
        "spark.graft.ann.trainCap", 65536)
      val proj = candidates.select(col("vec_id"), col("embedding"))
      val overCap = proj.limit(trainCap + 1).count() > trainCap
      val trainSet =
        if (!overCap) proj.localCheckpoint(true)
        else proj
          .orderBy(md5(col("vec_id").cast("string")))
          .limit(trainCap)
          .repartition(candidates.sparkSession
            .sparkContext.defaultParallelism)
          .localCheckpoint(true)
      val seedRows = trainSet
        .select(col("embedding"), md5(col("vec_id").cast("string")).as("__h"))
        .orderBy(col("__h"))
        .limit(pqCodes)
        .collect().toSeq
        .sortBy(_.getString(1))
        .zipWithIndex
        .map { case (r, i) => (i, r.getSeq[Float](0)) }
      require(seedRows.nonEmpty,
        s"PqIndex.train: needs seed vectors to build codebooks; got none")
      val dim = seedRows.head._2.length
      require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
      val subDim = dim / m
      var codebooks = new Array[Float](m * pqCodes * subDim)
      for (((_, v), ki) <- seedRows.zipWithIndex; mi <- 0 until m; d <- 0 until subDim)
        codebooks((mi * pqCodes + ki) * subDim + d) = v(mi * subDim + d)
      val codeBits = org.apache.spark.sql.graft.PqLayout.bitsPerCode(pqCodes)
      val codeMask = (1L << codeBits) - 1
      val centroidUdaf = udaf(graft.functions.CentroidAggregator.agg)
      for (_ <- 0 until lloydIters) {
        val means = trainSet
          .select(pqEncode(col("embedding"), codebooks, m, pqCodes).as("pq"),
            col("embedding"))
          .select(explode(sequence(lit(0), lit(m - 1))).as("mi"),
            col("pq"), col("embedding"))
          .select(col("mi"),
            // generic unpack matching PqLayout: bits fields, int or long
            expr(s"int(shiftright(pq, mi * $codeBits) & $codeMask)")
              .as("code"),
            slice(col("embedding"), col("mi") * subDim + 1, lit(subDim)).as("sub"))
          .groupBy(col("mi"), col("code"))
          .agg(centroidUdaf(col("sub")).as("mean_sub"))
          .collect()
        val next = codebooks.clone()
        means.foreach { r =>
          val base = (r.getInt(0) * pqCodes + r.getInt(1)) * subDim
          val v = r.getSeq[Float](2)
          var d = 0
          while (d < subDim) { next(base + d) = v(d); d += 1 }
        }
        codebooks = next
      }
      // encode covers EVERY vector: below the cap the checkpointed
      // train set IS the corpus (reuse its blocks); above it the full
      // caller frame encodes in its one unavoidable pass
      val encSrc = if (!overCap) trainSet else candidates
      val enc = encSrc.select(col("vec_id").as("c_id"),
        pqEncode(col("embedding"), codebooks, m, pqCodes).as("pq"),
        vecNorm(col("embedding")).as("norm_c"))
      new PqIndex(codebooks, m, pqCodes, candidates, enc)
    }
  }

  /** IVF-PQ — the composite FAISS/ScaNN billion-scale shape: the IVF
    * coarse quantizer routes each query to `probes` of `cells` cells, and
    * WITHIN the probed cells candidates are scored from the ~12-byte PQ
    * codes via the per-query ADC table; only the `rerank`-deep shortlist
    * ever touches full vectors. Search cost per query is
    * ~(probes/cells) · N · (m lookups) with no full-vector I/O — the two
    * index families multiply: IVF bounds the fraction of the corpus
    * scanned, PQ bounds the bytes per scanned candidate. */
  def ivfpqTopK(candidates: DataFrame, queryFilter: Column, k: Int = 5,
      cells: Int = 16, probes: Int = -1, m: Int = 8, pqCodes: Int = 16,
      rerank: Int = 400): DataFrame = {
    val index = IvfPqIndex.train(candidates, cells, probes, m, pqCodes)
    index.search(index.ivf.source.filter(queryFilter), k, rerank)
  }

  /** A trained IVF-PQ index: the cell-routed table of PQ codes —
    * `(cell, c_id, pq codes, norm)` — built in ONE projection pass over
    * the (checkpointed) vector table, no join and no shuffle; both
    * quantizers are driver-resident exactly as in [[IvfIndex]] /
    * [[PqIndex]]. Build once, [[IvfPqIndex.search]] many times (the
    * [[ivfpqTopK]] per-call contract retrains every invocation; that is
    * its registered shape). */
  final class IvfPqIndex private[Similarity] (
      private[Similarity] val ivf: IvfIndex,
      val pq: PqIndex, probes: Int, m: Int, pqCodes: Int,
      codes: DataFrame) {

    /** Persist the trained index — the FAISS write_index analog, in
      * Spark-native form: the cell-routed code table (the only
      * corpus-sized piece, ~12 B/vector) lands as an EXTERNAL table
      * bucketed by `cell`, so a loaded index's probe joins are co-located
      * with zero shuffle of the codes; both quantizers (KB-scale driver
      * state) land as two tiny parquet datasets under `path`. The VECTOR
      * table is deliberately NOT copied — an index references the corpus,
      * it does not duplicate it; [[IvfPqIndex.load]] takes the same
      * `(vec_id, embedding)` frame back for the rerank stage. */
    def save(name: String, path: String): Unit = {
      val spark = codes.sparkSession
      import spark.implicits._
      graft.sources.Layout.writeBucketedExternal(codes, s"${name}_codes",
        s"$path/codes", ivf.centroids.size, Seq("cell"))
      ivf.centroids.toDF("cell", "vec")
        .repartition(1).write.mode("overwrite").parquet(s"$path/centroids")
      Seq((pq.codebooks.toSeq, m, pqCodes, probes))
        .toDF("codebooks", "m", "pq_codes", "probes")
        .repartition(1).write.mode("overwrite").parquet(s"$path/meta")
      writeAssignMeta(spark, path, ivf.assignMode)
    }
    /** [[search]] with the queries drawn from the index's own vector
      * table by predicate — the self-lookup shape every `x_ann_*` entry
      * and the media near-dup bridge use. */
    def searchWhere(queryFilter: Column, k: Int = 5,
        rerank: Int = 400): DataFrame =
      search(ivf.source.filter(queryFilter), k, rerank)

    /** Top-k per query: probe `probes` nearest cells, ADC-score the PQ
      * codes inside them, exact-rerank the `rerank`-deep shortlist. The
      * codes scan carries no embeddings; the corpus-side rerank join
      * broadcasts the (queries × rerank)-row shortlist so the vector
      * table never shuffles. */
    def search(queryVecs: DataFrame, k: Int = 5, rerank: Int = 400): DataFrame = {
      import graft.functions.VectorFunctions.{pqAdc, pqLut}
      val qProbe = queryVecs
        .withColumn("probe_cells", probeCells(ivf.centroids, probes))
        .select(col("vec_id").as("q_id"), col("embedding").as("v_q"),
          pqLut(col("embedding"), pq.codebooks, m, pqCodes).as("lut"),
          explode(col("probe_cells")).as("cell"))
      val shortlist = codes
        .join(broadcast(qProbe.select(col("q_id"), col("lut"), col("cell"))),
          Seq("cell"))
        .filter(col("q_id") =!= col("c_id"))
        .withColumn("adc", pqAdc(col("pq"), col("lut"), m, pqCodes) / col("norm_c"))
        .withColumn("srk", row_number().over(Window.partitionBy(col("q_id"))
          .orderBy(col("adc").desc, col("c_id"))))
        .filter(col("srk") <= rerank)
        .select(col("q_id"), col("c_id"))
      val cVecs = ivf.source.select(col("vec_id").as("c_id"),
        col("embedding").as("v_c"))
      topKSelect(
        cVecs.join(broadcast(shortlist), "c_id")
          .join(broadcast(qProbe.select(col("q_id"), col("v_q"))
            .dropDuplicates("q_id")), "q_id")
          .withColumn("cosine", cosineSim(col("v_q"), col("v_c"))), k)
    }
  }

  object IvfPqIndex {
    /** Re-open an index persisted by [[IvfPqIndex.save]]: quantizers
      * collect back to the driver (KB-scale), the code table is a pure
      * bucketed scan — NO retraining, no encode pass, no shuffle.
      * `vectors` is the same `(vec_id, embedding)` corpus frame the index
      * was built over; it is touched only by the exact-rerank stage (and
      * only for shortlist rows). Centroids are re-sorted by cell id —
      * every consumer (greatest/sort_array over (sim, cell) structs) is
      * order-independent, but a deterministic order keeps loaded and
      * trained plans byte-comparable. */
    def load(spark: SparkSession, name: String, path: String,
        vectors: DataFrame): IvfPqIndex = {
      val centroids = spark.read.parquet(s"$path/centroids").collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
      val metaRow = spark.read.parquet(s"$path/meta").collect().head
      val codebooks = metaRow.getSeq[Float](0).toArray
      val m = metaRow.getInt(1)
      val pqCodes = metaRow.getInt(2)
      val probes = metaRow.getInt(3)
      // codes table: path-addressed restore — a restarted session's
      // catalog (default in-memory/derby) lost the writer's entry, so
      // re-register it from the files with the writer's bucket spec
      // (one bucket per cell) before resolving by name
      graft.sources.Layout.registerBucketedExternal(spark,
        s"${name}_codes", s"$path/codes", centroids.size, Seq("cell"))
      val source = vectors.select(col("vec_id"), col("embedding"))
      val assignMode = readAssignMeta(spark, path, centroids)
      // assigned/enc are lazy projections off the loaded quantizers —
      // declared for API completeness (IvfIndex.search / PqIndex.search
      // on the loaded handle), never evaluated by IvfPqIndex.search
      val assigned = source
        .withColumn("cell", nearestCellColWith(centroids, assignMode))
        .select(col("vec_id").as("c_id"), col("cell"), col("embedding").as("v_c"))
      import graft.functions.VectorFunctions.{pqEncode, vecNorm}
      val enc = source.select(col("vec_id").as("c_id"),
        pqEncode(col("embedding"), codebooks, m, pqCodes).as("pq"),
        vecNorm(col("embedding")).as("norm_c"))
      new IvfPqIndex(
        new IvfIndex(centroids, source, assigned, assignMode = assignMode),
        new PqIndex(codebooks, m, pqCodes, source, enc),
        probes, m, pqCodes,
        spark.table(s"${name}_codes"))
    }

    /** Incremental maintenance — the refresh half of train-once/serve-many:
      * encode a batch of NEW vectors with the FROZEN quantizers of a saved
      * index (nearest-cell argmax + PQ encode + norm, the same fused
      * one-projection shape the trainer emits) and append it to the
      * persisted bucketed code table. No retrain, no rewrite of existing
      * codes, no shuffle of anything but the batch itself; quantizer
      * drift under a changing distribution is handled by periodic retrain,
      * the standard IVF-PQ operating practice.
      *
      * Retrain threshold: the measured decay curve (RECALL_r10+
      * `append_decay`, same-distribution appends at the registered
      * operating point) holds recall@5 flat through ~25% appended
      * fraction, −0.04 at 50%, −0.08 at 75% and −0.20 at 90% — so
      * RETRAIN ONCE THE APPENDED (UNTRAINED) FRACTION PASSES ~0.5, and
      * earlier under distribution shift (the curve is the no-shift
      * floor: appends drawn from a drifted distribution land in
      * ill-fitting cells/codebooks and decay faster). A retrain is one
      * [[IvfPqIndex.train]]+[[IvfPqIndex.save]] over the current corpus
      * frame — readers cut over on the next [[load]]. Caller owns vec_id
      * uniqueness across appends (an index references the corpus — dedup
      * is the corpus pipeline's job, and [[graft.ext.Dedup]]'s ingest gate
      * runs BEFORE vectors reach an index). The appended vectors become
      * searchable via [[load]] over the extended corpus frame. */
    def append(spark: SparkSession, name: String, path: String,
        newVectors: DataFrame): Unit = {
      val centroids = spark.read.parquet(s"$path/centroids").collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
      val metaRow = spark.read.parquet(s"$path/meta").collect().head
      val codebooks = metaRow.getSeq[Float](0).toArray
      val m = metaRow.getInt(1)
      val pqCodes = metaRow.getInt(2)
      import graft.functions.VectorFunctions.{pqEncode, vecNorm}
      graft.sources.Layout.registerBucketedExternal(spark, s"${name}_codes",
        s"$path/codes", centroids.size, Seq("cell"))
      // assignment under the PERSISTED mode, never the session confs —
      // one code table, one assignment semantics for its whole life
      val enc = newVectors.select(col("vec_id"), col("embedding"))
        .withColumn("cell",
          nearestCellColWith(centroids, readAssignMeta(spark, path, centroids)))
        .select(col("cell"), col("vec_id").as("c_id"),
          pqEncode(col("embedding"), codebooks, m, pqCodes).as("pq"),
          vecNorm(col("embedding")).as("norm_c"))
      graft.sources.Layout.appendBucketedExternal(enc, s"${name}_codes",
        centroids.size, Seq("cell"))
    }

    /** Train both quantizers over ONE materialized projection (the IVF
      * checkpoint is reused as the PQ training source and the code-table
      * scan), then emit the cell-routed code table in a single
      * shuffle-free projection: nearest-cell argmax + PQ encode + norm
      * fused into one codegen stage. */
    def train(candidates0: DataFrame, cells: Int = 16, probes: Int = -1,
        m: Int = 8, pqCodes: Int = 16): IvfPqIndex = {
      import graft.functions.VectorFunctions.{pqEncode, vecNorm}
      val ivf = IvfIndex.train(candidates0, cells)
      val pq = PqIndex.train(ivf.source, m, pqCodes)
      val codes = ivf.source
        .withColumn("cell", nearestCellColWith(ivf.centroids, ivf.assignMode))
        .select(col("cell"), col("vec_id").as("c_id"),
          pqEncode(col("embedding"), pq.codebooks, m, pqCodes).as("pq"),
          vecNorm(col("embedding")).as("norm_c"))
      new IvfPqIndex(ivf, pq, ivfpqProbes(cells, probes), m, pqCodes, codes)
    }
  }

  /** Streaming index maintenance: each arriving micro-batch of
    * `(vec_id, embedding)` rows is frozen-quantizer-encoded and appended
    * to the saved index via [[IvfPqIndex.append]] — readStream →
    * foreachBatch(append), the continuous-refresh half of the serving
    * story (new corpus documents become searchable without a retrain or
    * restart). Checkpointed: completed batches are not replayed across
    * restarts. Delivery is at-least-once at the batch boundary (a crash
    * MID-append can leave a batch partially written and replay it); an
    * exactly-once corpus is the upstream pipeline's contract — run the
    * ingest gate / exact dedup before vectors reach the index, and
    * dedup-on-read by c_id if a replayed batch must be tolerated. */
  def indexAppendStream(vectors: DataFrame, name: String, path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        IvfPqIndex.append(batch.sparkSession, name, path, batch)
      }.start()

  private def emb(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).repartition(s.sparkContext.defaultParallelism)

  /** ANN operating-point knobs. The RECALL_r*.json sweep documents the
    * recall-vs-cost grid (probes × rerank, tables × bits); these session
    * confs let a consumer pick a point WITHOUT code changes.
    *
    * Defaults were RE-TUNED in r11 after the hash-sample seeding fix:
    * the old first-k seeding made the registered queries a subset of
    * the quantizer seeds, so the r8–r10 "sweep winners" (ivf probes=2,
    * ivfpq probes=1/rerank=100) were artifacts of that correlation —
    * honest (nonseed) recall at those points was 0.18–0.28. On the
    * testdata's ISOTROPIC embeddings (no cluster structure to route
    * by), quantizer-routed recall is coverage-bound, so the honest
    * operating points probe most cells: ivf probes=10 (nonseed 0.84),
    * pq rerank=200 (0.82), ivfpq probes=12/rerank=400 (0.88) — all
    * measured seed≈nonseed now, which is the point. Clustered real
    * corpora reach the same recall at far lower probes; tune down via
    * these confs using the RECALL sweep grid. Since r12 the probes
    * defaults are -1 = auto, resolved as a FRACTION of cells
    * ([[resolveProbes]]) so the operating point survives a different
    * cells choice instead of silently collapsing to ~probes/cells
    * coverage. */
  private def intConf(s: SparkSession, key: String, dflt: Int): Int = {
    val v = s.conf.get(key, dflt.toString).trim.toInt
    require(v > 0 || v == -1,
      s"$key must be positive (or -1 = auto fraction-of-cells), got $v")
    v
  }

  private def longConf(s: SparkSession, key: String, dflt: Long): Long = {
    val v = s.conf.get(key, dflt.toString).trim.toLong
    require(v > 0 || v == -1,
      s"$key must be positive (or -1 = disabled), got $v")
    v
  }

  private def doubleConf(s: SparkSession, key: String, dflt: Double): Double = {
    val raw = s.conf.get(key, dflt.toString).trim
    try raw.toDouble catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"$key must be a decimal number (dot separator), got '$raw'")
    }
  }

  /** Intra-query persists registered by [[knnJoinLsh]]'s rescue path.
    * Dataset.persist pins the plan in the session CacheManager until an
    * explicit unpersist — and the returned frame is LAZY, so the operator
    * cannot unpersist after use itself (there is no "after" at
    * construction time). The registry holds each persisted intermediate
    * so [[sweepAnnCaches]] can release them once the caller's action has
    * run; without a sweep, every call over a DISTINCT input accumulates a
    * corpus-scale cached aggregate for the session's lifetime (ADVICE
    * r13). Harness loops (Crossover ladder rungs, Recall) sweep between
    * iterations; long-lived library sessions should sweep after consuming
    * each result. Unpersist is non-blocking and lineage stays
    * recomputable, so sweeping "too early" costs recompute, never
    * correctness. */
  private val annCacheRegistry =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Regime-probe memo for [[resolveLshRegime]]: per-SESSION (a weak map
    * keyed on the SparkSession object itself, so a dead session's entries
    * are GC-reclaimable and a recycled identity hash can never alias a
    * new session — ADVICE r14), inner key = (analyzed-plan semantic hash,
    * input-files fingerprint) → the probe's (mean, p10, p90). The files
    * fingerprint (VERDICT r14 #2) folds `DataFrame.inputFiles` into the
    * key so a table REWRITTEN under an identical path/plan (new part
    * files) re-probes instead of serving the stale verdict; frames with
    * no file provenance (in-memory, checkpointed) fingerprint to the
    * empty listing and key on the plan alone, as before. Cleared by
    * [[sweepAnnCaches]]. Exposed private[graft] so specs can pin the
    * single-probe-per-corpus behavior. */
  private[graft] val regimeMemo =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(Int, Int), ProbeResult]]()

  /** Total memoized probe verdicts across live sessions (spec surface). */
  private[graft] def regimeMemoSize: Int = regimeMemo.synchronized {
    var n = 0
    regimeMemo.values.forEach(m => n += m.size)
    n
  }

  /** Session-scoped print-once for the stratify INFO lines (review r16
    * late): the unconditional stratify attempt means a service issuing
    * many knnJoinLsh calls over the same memoized corpus would re-run
    * the (cheap) driver k-means AND re-print an identical verdict line
    * per call — the k-means is noise-free to repeat, the log line is
    * not. Keyed on the full message text (same corpus + confs → same
    * text; the spread percentiles make distinct corpora distinct).
    * Cleared by [[sweepAnnCaches]] so a swept session re-announces. */
  private val loggedOnce =
    new java.util.WeakHashMap[SparkSession, java.util.Set[String]]()
  private def logOnce(s: SparkSession, msg: String): Unit = {
    val set = loggedOnce.synchronized {
      var v = loggedOnce.get(s)
      if (v == null) {
        v = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
        loggedOnce.put(s, v)
      }
      v
    }
    if (set.add(msg)) System.err.println(msg)
  }

  /** Release every cached intermediate registered by [[knnJoinLsh]] since
    * the last sweep, the regime-probe memo, and the exact-baseline memo.
    * Safe to call at any time (see [[annCacheRegistry]]). */
  def sweepAnnCaches(): Unit = {
    var df = annCacheRegistry.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      df = annCacheRegistry.poll()
    }
    regimeMemo.synchronized(regimeMemo.clear())
    exactBaselineMemo.synchronized(exactBaselineMemo.clear())
    loggedOnce.synchronized(loggedOnce.clear())
  }

  /** Shared exact ground-truth memo for the recall-contract checks (r16,
    * VERDICT r15 #1): the four [[annRecallCheck]] entries join against
    * the IDENTICAL 10-query exact top-5, and the two [[knnRecallCheck]]
    * entries against the identical sampled exact top-3 — yet each entry
    * recomputed its baseline from scratch, a full corpus scan worth
    * ~1.3 s at bench SF (measured: x_ann_bruteforce's whole wall) paid
    * 4× + a blocked ~n/7-pair pass paid 2× per bench pass. The
    * KB-scale (q_id, c_id) result memoizes per session + corpus
    * identity + baseline tag (the [[regimeMemo]] key shape — analyzed
    * plan semantic hash and input-files fingerprint — plus a tag
    * separating the two baseline families) and re-enters later plans
    * as a local relation. Determinism makes the swap hash-invisible:
    * both baselines rank bit-reproducibly, so the memoized rows ARE
    * what a recomputation would return. Cleared by [[sweepAnnCaches]].
    * Same staleness contract as [[regimeMemo]]: the files fingerprint
    * re-keys a corpus rewritten into NEW part files (the Spark rewrite
    * shape), not a same-name in-place overwrite, and in-memory frames
    * key on the plan alone — call sweepAnnCaches after mutating a
    * corpus out-of-band. Memory contract: these are GATE fixtures —
    * the ann baseline is a fixed 50 rows, the knn-join baseline grows
    * as ~3n/7 pairs and the check computes an O(n²/7) blocked pass
    * eagerly at construction, so at non-gate corpus scale use the
    * sampled RECALL harness, not the registered check entries. */
  private val exactBaselineMemo =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[(String, Int, Int),
        Seq[(Long, Long)]]]()

  /** Total memoized exact baselines across live sessions (spec surface,
    * the [[regimeMemoSize]] pattern). */
  private[graft] def exactBaselineMemoSize: Int =
    exactBaselineMemo.synchronized {
      var n = 0
      exactBaselineMemo.values.forEach(m => n += m.size)
      n
    }

  private def memoizedBaseline(all: DataFrame, tag: String)(
      compute: => DataFrame): DataFrame = {
    val s = all.sparkSession
    val filesKey = {
      val fs = try all.inputFiles
               catch { case _: UnsupportedOperationException =>
                 Array.empty[String] }
      scala.util.hashing.MurmurHash3.arrayHash(fs.sorted)
    }
    val key = (tag, all.queryExecution.analyzed.semanticHash(), filesKey)
    val inner = exactBaselineMemo.synchronized {
      var m = exactBaselineMemo.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[(String, Int, Int),
          Seq[(Long, Long)]]()
        exactBaselineMemo.put(s, m)
      }
      m
    }
    // compute OUTSIDE the map (the regimeProbeStats discipline): a lost
    // race costs one redundant idempotent scan, never a lock convoy
    val cached = inner.get(key)
    val rows =
      if (cached != null) cached
      else {
        val fresh = compute.select(col("q_id"), col("c_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        val prev = inner.putIfAbsent(key, fresh)
        if (prev != null) prev else fresh
      }
    import s.implicits._
    rows.toDF("q_id", "c_id")
  }

  /** RAW registered operating points of the six approximate ANN entries —
    * the actual top-k result frames. Consumed by the Recall harness and
    * the specs; since r15 the CATALOG entries of the same names wrap
    * these in the recall-contract check below, so the correctness gate
    * hash-verifies the contract instead of recording a rows-only pass. */
  private[graft] val rawAnn: Map[String, Q] = Map(
    // Multi-table SRP LSH ANN (8 tables × 6 bits, flip-1 multi-probe).
    "x_ann_lsh" -> ((s, d) =>
      lshTopK(emb(s, d), col("vec_id") < 10,
        tables = intConf(s, "spark.graft.ann.lsh.tables", 8),
        bits = intConf(s, "spark.graft.ann.lsh.bits", 6))
        .orderBy("q_id", "rank")),
    // IVF coarse-quantizer ANN.
    "x_ann_ivf" -> ((s, d) =>
      ivfTopK(emb(s, d), col("vec_id") < 10,
        probes = intConf(s, "spark.graft.ann.ivf.probes", -1))
        .orderBy("q_id", "rank")),
    // Product-quantization ANN (ADC shortlist + exact rerank).
    "x_ann_pq" -> ((s, d) =>
      pqTopK(emb(s, d), col("vec_id") < 10,
        pqCodes = intConf(s, "spark.graft.ann.pq.codes", 32),
        rerank = intConf(s, "spark.graft.ann.pq.rerank", 200))
        .orderBy("q_id", "rank")),
    // IVF-PQ composite: cell-routed scan over PQ codes + exact rerank.
    "x_ann_ivfpq" -> ((s, d) =>
      ivfpqTopK(emb(s, d), col("vec_id") < 10,
        probes = intConf(s, "spark.graft.ann.ivfpq.probes", -1),
        rerank = intConf(s, "spark.graft.ann.ivfpq.rerank", 400))
        .orderBy("q_id", "rank")),
    // IVF-celled approximate k-NN self-join — the routed-scan scale path
    // (recall ~ probe coverage on isotropic data; see knnJoinLsh
    // scaladoc). probes=12 promoted in r11: the committed sweep showed
    // 0.794 → 0.943 mean recall@3 over probes=8 at NO measured wall
    // cost at bench SF (the probe explode is payload-free; the scored
    // pair count is what grows, and TopKAggregator map-side-combines
    // it away).
    "x_knn_join_ivf" -> ((s, d) =>
      knnJoinIvf(emb(s, d), k = 3,
        probes = intConf(s, "spark.graft.knnjoin.ivf.probes", -1))
        .orderBy("q_id", "rank")),
    // Symmetric SRP-banded approximate k-NN self-join — the
    // angle-sensitive path that dominates IVF on unclustered embeddings;
    // recall for both committed per round vs the exact entry. bits
    // defaults to -1 = auto since r13 (resolves to the legacy 8 at this
    // corpus size — identical results — and grows as log2(n) past it).
    "x_knn_join_lsh" -> ((s, d) =>
      knnJoinLsh(emb(s, d), k = 3,
        tables = intConf(s, "spark.graft.knnjoin.lsh.tables", 16),
        bits = intConf(s, "spark.graft.knnjoin.lsh.bits", -1))
        .orderBy("q_id", "rank"))
  )

  /** Recall-contract check for the four `x_ann_*` entries (r15, VERDICT
    * r14 #1 — the `x_approx_agg` bound-check pattern): the approximate
    * result has no portable SQL oracle (it depends on probe/quantizer
    * internals), but its CONTRACT does. The entry joins the raw ANN
    * top-5 against the in-plan exact baseline (`exactTopK` — the same
    * computation the oracle-backed `x_ann_bruteforce` hash-verifies
    * bit-for-bit) and emits, per query: the exact-side row count (a
    * value DuckDB recomputes from the brute-force CTE) plus two flags
    * the oracle asserts as literal TRUE — `recall_ok` (per-query hits ≥
    * `minHits`, the registered point's floor) and `mean_ok` (total hits
    * over all 10 queries ≥ `minTotal`, the tight aggregate bound).
    * Recall drift past either bound now fails the HASH gate
    * mechanically; RECALL_r*.json stays the diagnostic sweep.
    *
    * Thresholds: measured r15 per-query hits at the registered points —
    * sf0.001 totals 42/47/49/49 of 50 with per-query mins 2/3/4/4
    * (lsh/ivf/pq/ivfpq), sf0.01 totals 44/44/49/48 with mins 4/3/4/4,
    * sf0.1 totals 46/47/45/47 with mins 4/4/3/3. The quantizer-trained
    * families take one notch of margin under the worst measured SF
    * (merge-order float jitter in training can flip one borderline
    * neighbor); LSH has no training (fixed-seed SRP planes — bit-exact
    * reproducible), so its floor sits AT the measured cross-SF min.
    * The totals keep ≥2 hits of margin (aggregate mean ≥ 0.8), so the
    * gate cannot flap while genuine drift (a probe regression, a
    * quantizer bug) still trips it. Conf-overridable per entry. */
  private def annRecallCheck(name: String, short: String,
      minHitsDflt: Int, minTotalDflt: Int): Q = (s, d) => {
    val all = emb(s, d)
    val minHits = intConf(s, s"spark.graft.ann.check.$short.minHits",
      minHitsDflt)
    val minTotal = intConf(s, s"spark.graft.ann.check.$short.minTotal",
      minTotalDflt)
    val approx = rawAnn(name)(s, d).select(col("q_id"), col("c_id"))
    // shared across the four x_ann_* checks — see [[memoizedBaseline]]
    val exact = memoizedBaseline(all, "ann_q10_k5")(
      exactTopK(all, all.filter(col("vec_id") < 10), 5))
    // 10 queries × 5 rows: the per-query fold and the all-query window
    // are KB-scale by construction (never corpus-proportional)
    val perQ = exact
      .join(approx.withColumn("hit", lit(1L)), Seq("q_id", "c_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("hits"))
    // the all-query total rides a constant-key broadcast hash join of
    // the 1-row aggregate (a partition-less window would drag the
    // plan-gate exception in for a 10-row frame)
    val total = perQ.agg(sum(col("hits")).as("total_hits"))
      .withColumn("join_one", lit(1))
    perQ
      .withColumn("join_one", lit(1))
      .join(broadcast(total), Seq("join_one"))
      .select(col("q_id"), col("n_exact"),
        (col("hits") >= minHits).as("recall_ok"),
        (col("total_hits") >= minTotal).as("mean_ok"))
      .orderBy("q_id")
  }

  /** Recall-contract check for the two approximate k-NN JOIN entries:
    * the raw variant still computes neighbors for EVERY vector (the
    * benched operator is unchanged), but exact ground truth for every
    * vector would double the entry's cost with a second O(n²) pass — so
    * the contract is verified on the deterministic `vec_id % 7 == 0`
    * sample (~14%: 72 queries at sf0.01, 286 at sf0.1), whose exact
    * top-3 comes from one `knnJoinAgainst` blocked pass at ~1/7 of the
    * full join's pair volume. One output row, all columns
    * oracle-computable: the sampled query count plus two flags asserted
    * TRUE — aggregate sampled recall@3 ≥ `minRecallPct`% (measured r15:
    * ivf 0.940/0.937, lsh 0.986/0.895 at sf0.01/sf0.1; defaults 85/80
    * keep ~0.09 of margin) and a rescued-tail flag (zero-recall queries
    * ≤ 2% of the sample; measured 0 at both SFs, full-corpus frac_zero
    * 0.0005 in RECALL_r14). */
  private def knnRecallCheck(name: String, short: String,
      minPctDflt: Int): Q = (s, d) => {
    val all = emb(s, d)
    val minPct = intConf(s,
      s"spark.graft.knnjoin.check.$short.minRecallPct", minPctDflt)
    val sample = all.filter(col("vec_id") % 7 === 0)
    val approx = rawAnn(name)(s, d).select(col("q_id"), col("c_id"))
    // shared across the two x_knn_join_* checks — see [[memoizedBaseline]]
    val exact = memoizedBaseline(all, "knn_mod7_k3")(
      knnJoinAgainst(all, sample, 3))
    exact
      .join(approx.withColumn("hit", lit(1L)), Seq("q_id", "c_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .agg(count(lit(1)).as("n_queries"),
        (sum(col("hits")) * 100L >= sum(col("n_exact")) * minPct)
          .as("recall_ok"),
        // zeros·50 ≤ n ⇔ zero-recall fraction ≤ 2%, in exact integers
        (sum(when(col("hits") === 0L, 1L).otherwise(0L)) * 50L
          <= count(lit(1))).as("zero_tail_ok"))
  }

  val queries: Map[String, Q] = Map(
    // Exact cosine top-5 for the first 10 vectors (the ANN baseline).
    "x_ann_bruteforce" -> ((s, d) => {
      val all = emb(s, d)
      exactTopK(all, all.filter(col("vec_id") < 10)).orderBy("q_id", "rank")
    }),
    // The four approximate ANN families + the two approximate k-NN
    // joins, each wrapped in its oracle-backed recall contract (the raw
    // top-k frames live in [[rawAnn]]; RECALL_r*.json diagnoses, this
    // gate ENFORCES).
    "x_ann_lsh" -> annRecallCheck("x_ann_lsh", "lsh", 2, 40),
    "x_ann_ivf" -> annRecallCheck("x_ann_ivf", "ivf", 2, 40),
    "x_ann_pq" -> annRecallCheck("x_ann_pq", "pq", 2, 41),
    "x_ann_ivfpq" -> annRecallCheck("x_ann_ivfpq", "ivfpq", 2, 43),
    // Exact k-NN SELF-join (every vector's top-3) — the semantic-dedup
    // primitive: blocked-grid equi-join + bounded top-k aggregation.
    "x_knn_join" -> ((s, d) =>
      knnJoin(emb(s, d), k = 3,
        blocks = intConf(s, "spark.graft.knnjoin.blocks", 8),
        qblocks = intConf(s, "spark.graft.knnjoin.qblocks", 4))
        .orderBy("q_id", "rank")),
    "x_knn_join_ivf" -> knnRecallCheck("x_knn_join_ivf", "ivf", 85),
    "x_knn_join_lsh" -> knnRecallCheck("x_knn_join_lsh", "lsh", 80)
  )

  /** The exact brute-force baseline IS SQL-expressible: the oracle mirrors
    * the native CosineSimilarity accumulation shape exactly — sequential
    * float→double products summed in list order, denom = sqrt(nx)*sqrt(ny),
    * then dot/denom — so the doubles (and hence the ranking and the rounded
    * output) are bit-identical across engines. The approximate variants'
    * RESULTS depend on probe/quantizer internals a portable SQL oracle
    * cannot replicate, so since r15 their entries return the recall
    * CONTRACT instead ([[annRecallCheck]]/[[knnRecallCheck]]): DuckDB
    * recomputes the deterministic columns (the exact baseline's per-query
    * row count / the sampled query count) and asserts the recall flags as
    * literal TRUE — drift past the registered bounds fails the hash gate. */
  val oracle: Map[String, String] = Map(
    "x_ann_bruteforce" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |pr AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    list_sum(list_transform(range(1, len(q.embedding) + 1),
        |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(q.embedding,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(c.embedding,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosine
        |  FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
        |)
        |SELECT q_id, CAST(rk AS INT) AS "rank", c_id, round(cosine, 6) AS cosine
        |FROM (
        |  SELECT q_id, c_id, cosine,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rk
        |  FROM pr)
        |WHERE rk <= 5 ORDER BY q_id, rk""".stripMargin,
    // The exact k-NN join shares the brute-force entry's accumulation
    // contract (sequential float→double products in list order), so its
    // all-pairs oracle is bit-comparable the same way — just unfiltered
    // on the query side and k=3.
    "x_knn_join" ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |pr AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    list_sum(list_transform(range(1, len(q.embedding) + 1),
        |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(q.embedding,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(c.embedding,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosine
        |  FROM e q JOIN e c ON c.vec_id <> q.vec_id
        |)
        |SELECT q_id, CAST(rk AS INT) AS "rank", c_id, round(cosine, 6) AS cosine
        |FROM (
        |  SELECT q_id, c_id, cosine,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rk
        |  FROM pr)
        |WHERE rk <= 3 ORDER BY q_id, rk""".stripMargin
  ) ++
    // The four x_ann_* recall-contract entries share one oracle: DuckDB
    // re-derives the exact baseline (the brute-force CTE, so n_exact is
    // COMPUTED, not a literal) and asserts both flags TRUE.
    Seq("x_ann_lsh", "x_ann_ivf", "x_ann_pq", "x_ann_ivfpq").map(_ ->
      """WITH e AS (SELECT vec_id, embedding FROM embeddings),
        |pr AS (
        |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
        |    list_sum(list_transform(range(1, len(q.embedding) + 1),
        |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
        |    / (sqrt(list_sum(list_transform(q.embedding,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |     * sqrt(list_sum(list_transform(c.embedding,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cosine
        |  FROM e q JOIN e c ON q.vec_id < 10 AND c.vec_id <> q.vec_id
        |)
        |SELECT q_id, count(*) AS n_exact,
        |  TRUE AS recall_ok, TRUE AS mean_ok
        |FROM (
        |  SELECT q_id, c_id,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rk
        |  FROM pr)
        |WHERE rk <= 5 GROUP BY q_id ORDER BY q_id""".stripMargin).toMap ++
    // The sampled k-NN join contracts: the query count is the
    // deterministic vec_id % 7 == 0 sample size, the flags assert the
    // aggregate recall and the zero-recall tail bound.
    Seq("x_knn_join_ivf", "x_knn_join_lsh").map(_ ->
      """SELECT count(*) AS n_queries,
        |  TRUE AS recall_ok, TRUE AS zero_tail_ok
        |FROM embeddings WHERE vec_id % 7 = 0""".stripMargin).toMap
}
