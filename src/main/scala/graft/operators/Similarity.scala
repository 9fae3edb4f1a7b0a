package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Similarity search over the `embeddings` table (north-star extension
  * surface): exact brute-force cosine top-k as the correctness baseline, an
  * exact all-pairs near-duplicate detector for validation scale, and an
  * IVF-bucketed approximate variant as the 100 TB scale path.
  *
  * Scale design:
  *  - Brute-force top-k broadcasts the (small) query set against the corpus
  *    scan: embarrassingly parallel, one shuffle only for the final
  *    per-query top-k (TakeOrdered-style via rank window on query_id).
  *  - The IVF variant replaces the full scan with centroid-bucketed probing:
  *    corpus partitioned by nearest fine centroid, queries probe their
  *    `nprobe` nearest cells — candidate set shrinks by ~nprobe/C. Routing
  *    is TWO-LEVEL ([[Similarity.IvfIndex]]): the fine centroid table is
  *    O(corpus) and reached by a shuffled equi-join; only its ~√F coarse
  *    quantizer broadcasts, so no broadcast grows linearly with the data.
  *  - Exact all-pairs (O(n²)) is kept for oracle validation only; at scale
  *    the IVF/LSH bucket join replaces it.
  */
object Similarity {

  /** Double-cast vector plus its precomputed L2 norm: every similarity
    * operator computes each row's norm ONCE here instead of once per
    * candidate pair (cosine = dot/(nrm_a*nrm_b) is value-identical to the
    * per-pair formulation, so oracles are unaffected).
    */
  private def prepared(embeddings: DataFrame): DataFrame = {
    val v = toDoubleVec(col("embedding"))
    embeddings.select(col("vec_id"), col("label"), v.as("v"))
      .withColumn("nrm", l2norm(col("v")))
  }

  /** Exact brute-force cosine top-k: for each query vector (vec_id <
    * numQueries), the k nearest corpus vectors by cosine, ties broken by
    * vec_id.
    */
  def bruteForceTopK(embeddings: DataFrame, numQueries: Int = 5, k: Int = 10): DataFrame = {
    val corpus  = prepared(embeddings)
    val queries = prepared(embeddings)
      .filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val scored = corpus
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** FILTERED vector search — [[bruteForceTopK]] under a metadata
    * predicate (the production "vector search WHERE label = X" shape;
    * every real retrieval API filters by tenant/language/source before
    * ranking): the predicate restricts the CORPUS side before any
    * distance work, so it pushes into the scan (post-filtering a plain
    * top-k instead would return < k rows whenever the filter is
    * selective — the classic filtered-ANN correctness trap). Queries
    * keep ranking against the filtered set even when they don't satisfy
    * the predicate themselves.
    */
  def filteredTopK(embeddings: DataFrame,
                   predicate: org.apache.spark.sql.Column,
                   numQueries: Int = 5, k: Int = 10): DataFrame = {
    val corpus = prepared(embeddings).filter(predicate)
    val queries = prepared(embeddings)
      .filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val scored = corpus
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        (dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** Exact all-pairs cosine near-duplicates (cosine ≥ threshold,
    * vec_id1 < vec_id2) via a block-bucketed self-join.
    *
    * Exact all-pairs is inherently O(n²) COMPUTE, but it must not be a
    * BroadcastNestedLoopJoin (round 1's non-equi `vec_id1 < vec_id2` join
    * was one — a driver-broadcast single-node bottleneck). The classic
    * distributed shape: assign each vector a block `b = vec_id % B`; each
    * unordered block pair (i ≤ j) is one bucket; a vector replicates to
    * its ~B bucket keys split into an anchor side (its block is the
    * bucket's low block) and a partner side (high block). The join is then
    * a plain shuffled EQUI-join on the bucket key — every executor gets
    * (n/B)² of the pairwise work, nothing is broadcast, and every
    * unordered pair is examined exactly once (cross-block pairs meet in
    * exactly one bucket with fixed roles; intra-block buckets order by
    * vec_id). Output is identical to the naive formulation.
    */
  def cosineNearDupPairs(embeddings: DataFrame, threshold: Double,
                         blocks: Int = 8): DataFrame = {
    val p = prepared(embeddings)
      .withColumn("blk", pmod(col("vec_id"), lit(blocks)).cast("int"))
      .withColumn("j", explode(sequence(lit(0), lit(blocks - 1))))
    val aSide = p.filter(col("j") >= col("blk"))
      .select(col("vec_id").as("vec_id_a"), col("v").as("v1"), col("nrm").as("nrm1"),
        col("blk").as("blk_a"), (col("blk") * blocks + col("j")).as("bkey"))
    val bSide = p.filter(col("j") <= col("blk"))
      .select(col("vec_id").as("vec_id_b"), col("v").as("v2"), col("nrm").as("nrm2"),
        col("blk").as("blk_b"), (col("j") * blocks + col("blk")).as("bkey"))
    aSide.join(bSide, Seq("bkey"))
      // intra-block buckets would otherwise see each pair in both role
      // assignments; cross-block buckets have fixed roles already
      .filter(col("blk_a") =!= col("blk_b") || col("vec_id_a") < col("vec_id_b"))
      .select(
        least(col("vec_id_a"), col("vec_id_b")).as("vec_id1"),
        greatest(col("vec_id_a"), col("vec_id_b")).as("vec_id2"),
        (dot(col("v1"), col("v2")) / (col("nrm1") * col("nrm2"))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy("vec_id1", "vec_id2")
  }

  /** Embedding-cosine near-DEDUP: the corpus minus the greedy higher-id
    * member of every [[cosineNearDupPairs]] pair — the semantic-dedup
    * complement of [[Dedup.nearDedupFromPairs]]'s lexical drop (same
    * one-pass greedy policy, same clique-minimum keep guarantee). This is
    * the "two documents say the same thing in different words" dedup an
    * LLM-data pipeline runs AFTER lexical near-dedup: MinHash cannot see
    * paraphrases, embeddings can. Exact pair generation here is the
    * validation baseline; at 100 TB the pairs frame comes from the IVF
    * cells ([[ivfTopK]]'s assignment join restricted to intra-cell pairs)
    * with identical downstream plumbing.
    */
  def cosineNearDedup(embeddings: DataFrame, threshold: Double): DataFrame = {
    val drop = cosineNearDupPairs(embeddings, threshold)
      .select(col("vec_id2").as("vec_id")).distinct()
    embeddings.join(drop, Seq("vec_id"), "left_anti")
  }

  /** THRESHOLD-SENSITIVITY card over a verified near-dup pair frame
    * (vec_id1, vec_id2, cosine): for each candidate threshold, the pair
    * count and the greedy dedup drop count (distinct higher-id
    * endpoints — [[cosineNearDedup]]'s dropset convention) the corpus
    * would see at that setting. The curve a curator reads BEFORE
    * committing a dedup threshold: how sharply does the drop count fall
    * as the bar rises, and where do only the exact duplicates
    * (cosine 1.0) remain. Thresholds at or above the pair frame's
    * mining threshold are exact; below it the frame simply has no
    * candidates, which is why the registry card starts at the mining
    * threshold.
    *
    * Shape: the threshold axis rides a row-local `explode` of a literal
    * array over the (persisted, verified) pair frame — |thresholds|×
    * a k-bounded table, one conditional aggregate, no join — so every
    * threshold row is present even when nothing qualifies.
    *
    * `scoreCol`/`dropCol` generalize the card across dedup families
    * (r15 verdict 6): the semantic card reads the cosine pairs
    * (`cosine`/`vec_id2`), the lexical card the persisted Jaccard pairs
    * (`jaccard`/`doc_id2`) — same curve, same greedy higher-id drop
    * convention, so a curator reads the two knobs side by side.
    */
  def dedupThresholdSensitivity(pairs: DataFrame,
                                thresholds: Seq[Double],
                                scoreCol: String = "cosine",
                                dropCol: String = "vec_id2"): DataFrame =
    pairs
      .select(explode(typedLit(thresholds)).as("threshold"),
        col(scoreCol).as("score"), col(dropCol).as("drop_id"))
      .groupBy("threshold")
      .agg(
        count(when(col("score") >= col("threshold"), lit(1))).as("n_pairs"),
        countDistinct(when(col("score") >= col("threshold"),
          col("drop_id"))).as("n_dropped"))
      .orderBy("threshold")

  /** Per-cell element-wise means of an assignment frame (centroid_id, v):
    * ONE aggregation via the custom [[graft.functions.VecSum]] vector-sum
    * aggregate — partials combine map-side like any native sum, the
    * shuffle carries one partial vector per (task, cell), and rows never
    * explode to per-dimension granularity (the round-5 formulation pushed
    * dim× the rows through two hash aggregates plus a sort per step).
    */
  private def cellMeans(assigned: DataFrame): DataFrame =
    assigned
      .groupBy("centroid_id")
      .agg(graft.functions.VectorFunctions.vecSum(col("v")).as("sv"),
        count(lit(1)).as("cnt"))
      .select(col("centroid_id"),
        transform(col("sv"), x => x / col("cnt")).as("cv"))
      .withColumn("cnrm", l2norm(col("cv")))

  /** One Lloyd (k-means) refinement step: reassign the corpus to its
    * nearest centroid by cosine, then replace every centroid with its
    * cell's element-wise mean ([[cellMeans]]). Entirely lazy joins +
    * aggregations — zero driver actions, preserving [[ivfTopK]]'s
    * zero-planning-jobs contract. Cells that attract no vectors drop out
    * (their mass merges into neighboring cells); seed centroids of the
    * same natural cluster converge to the same mean, so their cells
    * coalesce under the deterministic min-centroid-id tie-break — the
    * mechanism that repairs a natural cluster split across several
    * hash-sampled seeds.
    */
  private def lloydStep(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val packed = packedCoarse(centroids.select(col("centroid_id").as("coarse_id"),
      col("cv").as("ccv"), col("cnrm").as("ccnrm")))
    cellMeans(probeCoarse(corpus.select(col("vec_id"), col("v"), col("nrm")), packed, 1)
      .select(col("coarse_id").as("centroid_id"), col("v")))
  }

  /** Two-level IVF index (round-6 VERDICT-1).
    *
    * `fine` is the flat IVF centroid table — (coarse_id, centroid_id, cv,
    * cnrm), expected one centroid per `cellSize` corpus vectors, so its
    * row count is LINEAR in the corpus and it is '''never broadcast''':
    * consumers reach it through a shuffled equi-join on `coarse_id`.
    * `coarse` — (coarse_id, ccv, ccnrm) — is the broadcastable routing
    * level: expected ~√F rows for F fine centroids (the round-5 design
    * broadcast the flat table itself, an O(corpus) broadcast that OOMs the
    * driver and every executor at true 100 TB scale; SUBLINEARITY is
    * spec'd in SimilaritySpec).
    */
  case class IvfIndex(coarse: DataFrame, fine: DataFrame,
                      staged: Seq[DataFrame] = Nil) {

    /** Free every lazily-`persist()`-ed training frame backing this index
      * (no-op for a [[loadIndex]]-ed parquet index, whose `staged` is
      * empty). Call once consumers have materialized their results —
      * before that, an unpersisted fold level would recompute ~2^iters×
      * on execution ([[trainedIndex]]'s doc); after it, the caches are
      * dead weight that previously accumulated for the session lifetime,
      * trainIters+2 frames per inline training run (round-8 ADVICE-3).
      */
    def release(): Unit = staged.foreach(_.unpersist(false))
  }

  /** The coarse quantizer packed into ONE row (array of centroid structs,
    * total bytes = the coarse table itself, ~√F · dim doubles): ranking
    * against a packed broadcast happens INSIDE a projection — per input
    * row, score every element and keep the best `k` via
    * `slice(array_sort(...))` — so probing adds ZERO exchanges and ZERO
    * row blowup. The join-then-window alternative materializes
    * n × #centroids joined rows and shuffles them (each carrying the
    * input vector!) just to rank within vec_id groups — linear broadcasts
    * were round 6's first fix; linear-×-√F shuffle ROWS are the same
    * disease in shuffle form. Sort order (negated sim, id) reproduces the
    * window's (sim DESC, id ASC) tie-break exactly.
    */
  private def packedCoarse(coarse: DataFrame): DataFrame =
    coarse.agg(collect_list(struct(col("coarse_id"), col("ccv"), col("ccnrm"))).as("cs"))

  /** Append the `cprobe` nearest coarse cells to each (…, v, nrm) row —
    * one packed-broadcast projection, rows out = rows in × cprobe.
    */
  private def probeCoarse(vecs: DataFrame, coarsePacked: DataFrame,
                          cprobe: Int): DataFrame =
    vecs.crossJoin(broadcast(coarsePacked))
      .withColumn("__probe", explode(slice(array_sort(transform(col("cs"), c =>
        struct((-dot(col("v"), c("ccv")) / (col("nrm") * c("ccnrm"))).as("ns"),
          c("coarse_id").as("coarse_id")))), 1, cprobe)))
      .select(vecs.columns.map(col) :+ col("__probe.coarse_id").as("coarse_id"): _*)

  /** Per-task memory bound for one packed fine-centroid array: ~4096
    * structs ≈ a few MB at typical embedding dims — far under executor
    * task memory, far over the ~√F a balanced cell holds (so the guard is
    * free until it is needed).
    */
  private[graft] val MaxPackedCell = 4096

  /** Fine centroids packed into one array-of-structs row per (coarse
    * cell, shard). Balanced training keeps cells at ~√F entries and the
    * shard count at 1 — identical to the unguarded packing. A
    * pathologically concentrated corpus (round-6 watch item: e.g. 90% of
    * vectors in one tight cluster whose coarse centroids collapse and
    * tie-break to one cell) can pour O(F) fine centroids into ONE cell;
    * since a packed row is indivisible by repartitioning, that array used
    * to be an unbounded single-task memory hazard. Cells above `maxPack`
    * now hash-shard on `centroid_id` into ⌈n/maxPack⌉ sub-rows (expected
    * shard size ≤ maxPack; a multinomial-concentration bound, not a hard
    * cap). EXACTNESS: probing joins on `coarse_id` alone, so a probe
    * meets every shard of its cell, ranks each in-projection, and the
    * existing per-id top-`keep` merge in [[assignFine]] recombines them —
    * the merged result equals the unsharded cell's top-`keep` because
    * every global winner is also its own shard's winner. Cost: shuffle
    * rows grow from n·cprobe to n·cprobe·shards ONLY for oversized cells;
    * the cell-size aggregate is map-side over the fine table and its
    * broadcast is one row per coarse cell.
    */
  private[graft] def packedCells(fine: DataFrame, maxPack: Int): DataFrame =
    packedCellsWith(fine, cellSizesOf(fine), maxPack)

  /** One row per non-empty coarse cell with its fine-centroid count — the
    * shared first pass of [[packedCellsWith]] AND the non-empty-cell
    * routing filter in [[assignFine]]. Computed ONCE per assignment so the
    * fine table is referenced exactly twice there (this aggregate + the
    * pack join): during inline training the fine frame is an
    * un-checkpointed Lloyd chain, and every extra reference to it
    * multiplies the re-embedded sub-DAG per iteration — three references
    * made the chain ~3^iters and the round-6 suite timed lineage replay.
    */
  private def cellSizesOf(fine: DataFrame): DataFrame =
    fine.groupBy("coarse_id").agg(count(lit(1)).as("__n"))

  private def packedCellsWith(fine: DataFrame, cellSizes: DataFrame,
                              maxPack: Int): DataFrame =
    fine.join(broadcast(cellSizes), "coarse_id")
      .withColumn("__shard", pmod(xxhash64(col("centroid_id")),
        ceil(col("__n") / lit(maxPack.toDouble)).cast("long")))
      .groupBy("coarse_id", "__shard")
      .agg(collect_list(struct(col("centroid_id"), col("cv"), col("cnrm"))).as("fs"))
      .drop("__shard")

  /** Nearest-fine-centroid assignment through the two-level index: probe
    * the `cprobe` nearest COARSE cells ([[probeCoarse]] — the only
    * broadcast), reach the fine centroids of those cells via a
    * '''shuffled''' equi-join on `coarse_id` against the cell-packed fine
    * table (each probed row meets ONE row holding its cell's ~√F
    * centroids — the shuffle carries n·cprobe rows, never a row per
    * (vector, centroid) pair), rank in-projection, then merge the per-cell
    * winners to a global top-`keep` with one aggregation on the id. Input
    * must carry (idCol, …, v, nrm); output appends (centroid_id,
    * cell_rank). Per-row candidate work is ~cprobe·√F scored centroids
    * instead of all F (the round-5 flat argmax compared every row with
    * every centroid AND broadcast them all); recall is coarse-geometry
    * bounded — multi-probe (`cprobe` > 1) compensates, and at fixture
    * scale `cprobe` ≥ #coarse makes the assignment exactly the flat
    * argmax. Packed-cell skew is BOUNDED (round-6 watch item promoted):
    * [[packedCells]] hash-shards any coarse cell holding more than
    * `maxPack` fine centroids, so per-task array memory never exceeds
    * ~maxPack structs no matter how concentrated the corpus — see its
    * doc for the exactness argument and the cost model.
    */
  private def assignFine(vecs: DataFrame, index: IvfIndex, cprobe: Int,
                         keep: Int, idCol: String,
                         maxPack: Int = MaxPackedCell): DataFrame = {
    val cellSizes = cellSizesOf(index.fine)
    val fineCells = packedCellsWith(index.fine, cellSizes, maxPack)
    // Probe only NON-EMPTY coarse cells: [[routeFine]] can leave a coarse
    // cell with zero fine centroids, and a vector whose cprobe probes all
    // landed on empty cells would vanish through the inner join below —
    // dropped from the inverted lists, the ivfTopK corpus, and the Lloyd
    // means (round-7 ADVICE). Ranking against the non-empty subset spends
    // every probe on a cell that can actually answer, so the join is
    // total by construction (spec'd on a hand-built empty-cell index).
    // The semi-join's build side is ≤ the coarse table itself (~√F rows);
    // it probes the SHARED [[cellSizesOf]] aggregate, not the packed
    // frame, so this filter adds no extra reference to the fine table.
    val nonEmptyCoarse = index.coarse
      .join(broadcast(cellSizes.select("coarse_id")), Seq("coarse_id"), "left_semi")
    val rest = vecs.columns.filter(_ != idCol)
    val perCell = probeCoarse(vecs, packedCoarse(nonEmptyCoarse), cprobe)
      .join(fineCells, Seq("coarse_id")) // shuffled: the fine table is O(corpus)
      .select(vecs.columns.map(col) :+
        slice(array_sort(transform(col("fs"), f =>
          struct((-dot(col("v"), f("cv")) / (col("nrm") * f("cnrm"))).as("ns"),
            f("centroid_id").as("centroid_id")))), 1, keep).as("cands"): _*)
    val aggs = rest.map(c => first(col(c)).as(c)) :+
      slice(array_sort(flatten(collect_list(col("cands")))), 1, keep).as("top")
    perCell
      .groupBy(idCol)
      .agg(aggs.head, aggs.tail: _*)
      .select(Seq(col(idCol)) ++ rest.map(col) :+
        posexplode(col("top")).as(Seq("__pos", "__cand")): _*)
      .select(vecs.columns.map(col) ++
        Seq(col("__cand.centroid_id").as("centroid_id"),
          (col("__pos") + 1).as("cell_rank")): _*)
  }

  /** The index's INVERTED LISTS: every corpus vector routed to its
    * `probeDepth` nearest fine cells (cell_rank 1 = home cell). This is
    * the second half of a real IVF index — a deployment materializes the
    * assignment table next to the centroids and serves every consumer
    * from it ([[ivfTopK]] filters cell_rank 1, [[ivfNearDupPairs]] uses
    * the full multi-probe depth); pass it back via `assignedOpt` to share
    * the one corpus routing pass, exactly as the registry does.
    */
  def ivfAssign(embeddings: DataFrame, index: IvfIndex, cprobe: Int = 4,
                probeDepth: Int = 3, maxPack: Int = MaxPackedCell): DataFrame =
    assignFine(prepared(embeddings), index, cprobe, probeDepth, "vec_id", maxPack)

  /** Route NEW vectors into an EXISTING (frozen) cell geometry — the
    * [[ivfAssign]] kernel for a streamed delta
    * ([[graft.streaming.IvfStream]]'s per-batch step): the centroids are
    * deliberately not retrained (the [[graft.streaming.EncodeStream]]
    * commensurability argument verbatim — a cell id is only meaningful
    * against ONE centroid generation, and every probe routing compares
    * queries against the same frozen geometry the stored lists were
    * routed with; geometry refresh is a snapshot rebuild, not a
    * streaming concern). Differences from the corpus pass, both
    * delta-shaped: a missing `label` column is tolerated (streamed
    * vectors may arrive unlabeled; the lists' schema keeps the column as
    * null — [[filteredTopK]]-style predicates simply never match them),
    * and zero-norm vectors drop — they are cosine-unanswerable, so
    * routing them anywhere would only seed NaN scores in every probe of
    * their cell (the [[pqTopKForQueries]] eligibility rule).
    */
  def ivfAssignDelta(vecs: DataFrame, index: IvfIndex, cprobe: Int = 4,
                     probeDepth: Int = 3, maxPack: Int = MaxPackedCell): DataFrame = {
    val withLabel =
      if (vecs.columns.contains("label")) vecs
      else vecs.withColumn("label", lit(null).cast("int"))
    assignFine(prepared(withLabel).filter(col("nrm") > 0), index, cprobe,
      probeDepth, "vec_id", maxPack)
  }

  /** Route fine centroids to their nearest coarse cell (packed-broadcast
    * argmax — the fine side stays distributed, no exchange added).
    */
  private def routeFine(fine: DataFrame, coarse: DataFrame): DataFrame =
    probeCoarse(
      fine.select(col("centroid_id"), col("cv").as("v"), col("cnrm").as("nrm")),
      packedCoarse(coarse), 1)
      .select(col("coarse_id"), col("centroid_id"),
        col("v").as("cv"), col("nrm").as("cnrm"))

  /** Build the two-level index, entirely inside the plan (no driver-side
    * `count()` — round 1 ran an eager full-scan job in the operator
    * BUILDER; the corpus size enters as an in-plan aggregate instead).
    *
    *  - Fine seeds: `xxhash64(vec_id) % cellSize == 0` — expected one per
    *    `cellSize` corpus vectors, so cells grow in NUMBER, not size, as
    *    data scales (the property the near-dup candidate join needs).
    *  - Coarse seeds: a salted `% ceil(√F)` hash-subsample of the fine
    *    seeds (expected √F rows), unioned with the minimum-id fine seed so
    *    the routing level can never be empty at tiny F.
    *  - Coarse training: `trainIters` Lloyd steps over the FINE-SEED frame
    *    (an unbiased 1/cellSize sample of the corpus) — data side F rows,
    *    broadcast side √F.
    *  - Fine training: `trainIters` Lloyd steps over the corpus, with the
    *    reassignment pass routed through the coarse level ([[assignFine]],
    *    keep = 1) — the mean update is a shuffled aggregation, so no step
    *    ever broadcasts an O(corpus) frame. Hash-sampled seeds land on
    *    arbitrary corpus points; training recenters them so cell
    *    boundaries follow density (spec: recall on a clustered fixture
    *    where raw seeds alone score lower). After each step the new fine
    *    centroids are re-routed to their coarse cells.
    *
    * The chain is returned UN-checkpointed on purpose: under AQE even a
    * lazy localCheckpoint materializes its query stages at CALL time,
    * which would break the zero-planning-jobs contract (spec'd). Each
    * staged centroid frame is instead `persist()`-ed — persist is fully
    * lazy (zero jobs at call, contract intact) but at execution the cache
    * manager substitutes every duplicated copy of a staged subtree with
    * the one cached relation, so each training level computes ONCE no
    * matter how many times consumers re-embed it ([[assignFine]]
    * references the evolving fine frame twice per iteration; without the
    * cache the inline chain re-executes ~2^iters× per action — and every
    * `broadcast(...)` inside a duplicated subtree is its own exchange, so
    * exchange reuse alone does not save it). The cached frames are
    * centroid tables — O(corpus/cellSize) rows at MEMORY_AND_DISK, never
    * the corpus itself. A real deployment still trains ONCE and persists
    * both frames durably — pass them back via `indexOpt` (the registry's
    * `q_ann_ivf_topk`/`q_ivf_neardup_pairs` serve from the
    * [[persistIndex]]-ed parquet tables).
    */
  /** Indexes trained INLINE (an [[ivfTopK]]/[[ivfNearDupPairs]] call
    * without `indexOpt`) have no handle the caller could
    * [[IvfIndex.release]], so each is tracked per session here; stopped
    * sessions are swept on every access (their caches died with the
    * executors) and [[releaseInlineTrained]] frees live ones explicitly.
    * Before round 8 every such call leaked its trainIters+2 lazily-cached
    * fold frames for the session lifetime (ADVICE-3). The registered
    * queries never hit this path — they serve from the persisted parquet
    * index.
    */
  private val inlineTrained = new java.util.concurrent.ConcurrentHashMap[
    org.apache.spark.sql.SparkSession,
    java.util.concurrent.ConcurrentLinkedQueue[IvfIndex]]()

  private def trackInline(index: IvfIndex): IvfIndex = {
    inlineTrained.keySet.removeIf(_.sparkContext.isStopped)
    inlineTrained
      .computeIfAbsent(index.coarse.sparkSession,
        _ => new java.util.concurrent.ConcurrentLinkedQueue[IvfIndex]())
      .add(index)
    index
  }

  /** Release every inline-trained index of `spark` (see [[inlineTrained]]);
    * returns how many were freed. Call once their consumers' results are
    * materialized.
    */
  def releaseInlineTrained(spark: org.apache.spark.sql.SparkSession): Int = {
    inlineTrained.keySet.removeIf(_.sparkContext.isStopped)
    val q = inlineTrained.remove(spark)
    if (q == null) 0
    else {
      var n = 0
      q.forEach { i => i.release(); n += 1 }
      n
    }
  }

  private def trainedIndex(corpus: DataFrame, cellSize: Int, trainIters: Int,
                           cprobe: Int): IvfIndex = {
    val coarse = coarseLevel(corpus, cellSize, trainIters).persist()
    val levels = fineLevels(corpus, coarse, cellSize, trainIters, cprobe)
    IvfIndex(coarse, levels.last, staged = coarse +: levels)
  }

  /** Hash-sampled fine seeds (expected one per `cellSize` corpus rows),
    * UNIONED with the minimum-id corpus vector: a corpus smaller than
    * ~`cellSize` has an expected seed count below one, and an EMPTY seed
    * set cascades — empty coarse level (its own min-id guard only
    * protects against empty-ness GIVEN nonempty fine seeds), empty fine
    * table, zero-row inverted lists, and a persistIndex output whose
    * lists dir can't even be schema-read. The guard is one scalar min
    * aggregate broadcast against the seed projection — noise next to the
    * Lloyd rounds that scan the corpus anyway, and at real corpus sizes
    * it adds at most one extra seed.
    */
  private def fineSeedsOf(corpus: DataFrame, cellSize: Int): DataFrame = {
    val stats = corpus.agg(min(col("vec_id")).as("__seed_min_id"))
    corpus.crossJoin(broadcast(stats))
      .filter(pmod(xxhash64(col("vec_id")), lit(cellSize.toLong)) === 0L ||
        col("vec_id") === col("__seed_min_id"))
      .select(col("vec_id").as("centroid_id"), col("v").as("cv"), col("nrm").as("cnrm"))
  }

  private def coarseLevel(corpus: DataFrame, cellSize: Int,
                          trainIters: Int): DataFrame = {
    val fineSeeds = fineSeedsOf(corpus, cellSize)
    val stats = fineSeeds.agg(
      count(lit(1)).as("__f"), min(col("centroid_id")).as("__min_id"))
    val coarseSeeds = fineSeeds.crossJoin(broadcast(stats))
      .filter(
        pmod(xxhash64(col("centroid_id"), lit(7L)),
          greatest(lit(1L), ceil(sqrt(col("__f"))).cast("long"))) === 0L ||
          col("centroid_id") === col("__min_id"))
      .select(col("centroid_id"), col("cv"), col("cnrm"))
    val fineAsCorpus = fineSeeds.select(col("centroid_id").as("vec_id"),
      col("cv").as("v"), col("cnrm").as("nrm"))
    (1 to trainIters)
      .foldLeft(coarseSeeds)((c, _) => lloydStep(fineAsCorpus, c))
      .select(col("centroid_id").as("coarse_id"), col("cv").as("ccv"),
        col("cnrm").as("ccnrm"))
  }

  /** Every fold level is lazily `persist()`-ed: level i+1 references
    * level i twice (see [[trainedIndex]]'s doc for why the cache, not
    * exchange reuse, is what keeps the inline chain's execution linear in
    * `trainIters`). ALL levels are returned — the last is the trained
    * fine table, the rest are superseded fold stages that the caller must
    * unpersist once the final level is materialized (round-8 ADVICE-3;
    * [[persistIndex]] releases after its durable write, [[trainedIndex]]
    * carries them on the index's `staged` for [[IvfIndex.release]]).
    */
  private def fineLevels(corpus: DataFrame, coarse: DataFrame, cellSize: Int,
                         trainIters: Int, cprobe: Int): Seq[DataFrame] =
    (1 to trainIters).foldLeft(
      Vector(routeFine(fineSeedsOf(corpus, cellSize), coarse).persist())) { (ls, _) =>
      val assigned = assignFine(corpus, IvfIndex(coarse, ls.last), cprobe, 1, "vec_id")
      ls :+ routeFine(cellMeans(assigned.select(col("centroid_id"), col("v"))), coarse)
        .persist()
    }

  /** Public index-build entry — see [[trainedIndex]]. */
  def trainIvfCentroids(embeddings: DataFrame, cellSize: Int = 128,
                        trainIters: Int = 2, cprobe: Int = 4): IvfIndex =
    trainedIndex(prepared(embeddings), cellSize, trainIters, cprobe)

  /** Staged index-build entries for callers that persist or checkpoint
    * each level before building the next on top of it (the registry
    * does): built in one expression, the fine level's lineage re-embeds
    * the whole coarse-training sub-DAG and re-executes it at every
    * separate materialization — train the coarse quantizer, checkpoint
    * it, then pass the checkpointed frame to [[trainIvfFine]] so each
    * level's work runs exactly once.
    */
  def trainIvfCoarse(embeddings: DataFrame, cellSize: Int = 128,
                     trainIters: Int = 2): DataFrame =
    coarseLevel(prepared(embeddings), cellSize, trainIters)

  def trainIvfFine(embeddings: DataFrame, coarse: DataFrame, cellSize: Int = 128,
                   trainIters: Int = 2, cprobe: Int = 4): DataFrame =
    trainIvfFineStaged(embeddings, coarse, cellSize, trainIters, cprobe).last

  /** [[trainIvfFine]] with the full fold-level list exposed: the LAST
    * frame is the trained fine table; callers that checkpoint or write it
    * must then unpersist every returned frame, or the superseded levels'
    * lazy caches outlive their usefulness for the session (round-8
    * ADVICE-3 — [[persistIndex]] and the staged specs do exactly this).
    */
  def trainIvfFineStaged(embeddings: DataFrame, coarse: DataFrame,
                         cellSize: Int = 128, trainIters: Int = 2,
                         cprobe: Int = 4): Seq[DataFrame] =
    fineLevels(prepared(embeddings), coarse, cellSize, trainIters, cprobe)

  /** Train the two-level index AND its inverted lists, persisting all
    * three tables (`coarse/`, `fine/`, `lists/`) as parquet under `dir` —
    * what a real deployment does: training is a one-time (or periodic)
    * batch job, and every ANN consumer serves from the stored tables
    * ([[loadIndex]] + [[ivfTopKServe]]/[[ivfNearDupServe]]) without ever
    * rescanning the raw embeddings (round-6 VERDICT-1 follow-up: the
    * bench was re-paying training inside every timed ANN run).
    *
    * Staging is DURABLE: each level is written to parquet and the next
    * level trains from the read-back frame, so the coarse Lloyd chain
    * runs exactly once (a single lazy expression would re-embed it in the
    * fine level's lineage and re-execute per materialization) and a
    * restart resumes from nothing or everything. The `_graft_ok` marker
    * commits the build atomically-enough for a local/object store: it is
    * created only after all three tables are fully written, readers
    * ([[indexReady]]) treat its absence as "no index", and a re-build
    * overwrites in place — a crash mid-build leaves an uncommitted
    * directory that the next build simply rewrites. `stamp` (normally the
    * source table's [[graft.sources.SnapshotStore.fingerprint]]) is
    * written INTO the marker: the stamped [[indexReady]] overload then
    * refuses a build committed for different source content, closing the
    * stale-reuse hole of the earlier name+length scheme (round-8
    * ADVICE-2).
    */
  def persistIndex(embeddings: DataFrame, dir: String, cellSize: Int = 128,
                   trainIters: Int = 2, cprobe: Int = 4,
                   probeDepth: Int = 3, stamp: String = "",
                   pairThreshold: Double = 0.4, pairNprobe: Int = 3,
                   topKQueries: Int = 5, topKk: Int = 10,
                   topKNprobe: Int = 16): Unit = {
    val spark = embeddings.sparkSession
    trainIvfCoarse(embeddings, cellSize, trainIters)
      .write.mode("overwrite").parquet(s"$dir/coarse")
    val coarse = spark.read.parquet(s"$dir/coarse")
    val levels = trainIvfFineStaged(embeddings, coarse, cellSize, trainIters, cprobe)
    levels.last.write.mode("overwrite").parquet(s"$dir/fine")
    // the durable write above materialized the whole fold chain — its
    // lazy per-level caches are dead weight from here on (round-8 ADVICE-3)
    levels.foreach(_.unpersist(false))
    val index = IvfIndex(coarse, spark.read.parquet(s"$dir/fine"))
    // partitioned by probe rank: the top-k serve path reads ONLY the
    // home-cell slice (cell_rank = 1) and near-dup serving reads ranks
    // ≤ nprobe — directory-level pruning instead of scanning the full
    // depth-`probeDepth` expansion per query
    ivfAssign(embeddings, index, cprobe, probeDepth)
      .write.mode("overwrite").partitionBy("cell_rank").parquet(s"$dir/lists")
    // default-threshold verified near-dup pairs from the READ-BACK lists
    // (round-10 verdict next-round 1: this was the last pair family whose
    // candidate generation + exact verify re-ran per serving call while
    // its six lexical/LSH siblings served from parquet). Computed over the
    // persisted lists — the same frame serving would read — so the stored
    // pairs are by construction what [[ivfNearDupServe]] produces, and the
    // inline call stays the any-threshold / any-nprobe probe path.
    ivfNearDupServe(spark.read.parquet(s"$dir/lists"), pairThreshold, pairNprobe)
      .write.mode("overwrite").parquet(s"$dir/pairs")
    // default-parameter approximate top-k answer (round-13 verdict
    // next-round 5 — the pq-v3/annserve-v6/ivfpq precedent: this was the
    // heaviest non-composition serving query, re-running probe routing +
    // the rank window every call). Computed from the READ-BACK lists —
    // the same frame serving would probe — with the registry defaults:
    // the home-cell slice of corpus ids < topKQueries as queries and
    // nprobe 16 (the measured 1.00-recall knee, see q_ann_ivf_topk).
    // [[ivfTopKServe]] stays the any-parameter / arbitrary-query path.
    val committedLists = spark.read.parquet(s"$dir/lists")
    ivfTopKServe(index, committedLists,
        committedLists.filter(col("cell_rank") === 1 &&
            col("vec_id") < topKQueries)
          .select(col("vec_id").as("query_id"), col("v"), col("nrm")),
        k = topKk, nprobe = topKNprobe)
      .write.mode("overwrite").parquet(s"$dir/topk")
    graft.sources.SnapshotStore.commit(spark, dir, stamp)
  }

  /** True iff [[persistIndex]] committed a build under `dir` (any stamp). */
  def indexReady(spark: org.apache.spark.sql.SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir, "_graft_ok")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** True iff [[persistIndex]] committed a build under `dir` for a source
    * stamped exactly `stamp` — a marker stamped for OTHER source content
    * (a regenerated embeddings table) reads as "no index" and forces a
    * rebuild (round-8 ADVICE-2).
    */
  def indexReady(spark: org.apache.spark.sql.SparkSession, dir: String,
                 stamp: String): Boolean =
    graft.sources.SnapshotStore.ready(spark, dir, stamp)

  /** Load a [[persistIndex]]-ed index: the (coarse, fine) centroid tables
    * plus the depth-`probeDepth` inverted lists. Plain parquet scans — no
    * training, no checkpoint, no job at load time.
    */
  def loadIndex(spark: org.apache.spark.sql.SparkSession,
                dir: String): (IvfIndex, DataFrame) =
    (IvfIndex(spark.read.parquet(s"$dir/coarse"), spark.read.parquet(s"$dir/fine")),
      spark.read.parquet(s"$dir/lists"))

  /** Load a [[persistIndex]]-ed snapshot's verified default-threshold
    * near-dup pairs — one parquet scan; [[ivfNearDupServe]] over the
    * loaded lists remains the path for other thresholds / probe depths.
    */
  def loadIndexPairs(spark: org.apache.spark.sql.SparkSession,
                     dir: String): DataFrame =
    spark.read.parquet(s"$dir/pairs")

  /** Load a [[persistIndex]]-ed snapshot's default-parameter top-k
    * answer — one parquet scan; [[ivfTopKServe]] over the loaded lists
    * remains the path for other queries / k / probe depths.
    */
  def loadIndexTopK(spark: org.apache.spark.sql.SparkSession,
                    dir: String): DataFrame =
    spark.read.parquet(s"$dir/topk")

  /** IVF-style approximate top-k: corpus vectors are assigned to their
    * nearest fine centroid through the two-level index; each query probes
    * its `nprobe` nearest fine cells (through the same routing) and ranks
    * exact cosine within the probed cells. Approximate (no oracle); recall
    * vs [[bruteForceTopK]] is asserted in ScalaTest.
    */
  def ivfTopK(embeddings: DataFrame, numQueries: Int = 5, k: Int = 10,
              cellSize: Int = 128, nprobe: Int = 6, trainIters: Int = 2,
              cprobe: Int = 4, indexOpt: Option[IvfIndex] = None,
              assignedOpt: Option[DataFrame] = None): DataFrame = {
    val corpus = prepared(embeddings)
    val index = indexOpt.getOrElse(
      trackInline(trainedIndex(corpus, cellSize, trainIters, cprobe)))
    val lists = assignedOpt.getOrElse(assignFine(corpus, index, cprobe, 1, "vec_id"))
    val queries = corpus.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v"), col("nrm"))
    ivfTopKServe(index, lists, queries, k, nprobe, cprobe)
  }

  /** SERVING core of [[ivfTopK]]: rank queries against an already-built
    * index + inverted lists (both typically [[loadIndex]]-ed parquet — the
    * lists carry each vector, so the raw embeddings table is not touched).
    * `queries` must carry (query_id, v, nrm).
    */
  def ivfTopKServe(index: IvfIndex, lists: DataFrame, queries: DataFrame,
                   k: Int = 10, nprobe: Int = 6, cprobe: Int = 4): DataFrame = {
    // home-cell assignment: the depth-1 slice of the inverted lists
    val assigned = lists.filter(col("cell_rank") === 1).drop("cell_rank")

    // queries probe their nprobe nearest fine cells; the probe frame is
    // (tiny) queries × nprobe, so IT broadcasts — the index does not
    val probes = assignFine(queries, index, cprobe, nprobe, "query_id")
      .select(col("query_id"), col("v").as("qv"), col("nrm").as("qnrm"),
        col("centroid_id"))

    // exact cosine within probed cells only
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** IVF-bucketed approximate near-dup pairs — the 100 TB replacement for
    * [[cosineNearDupPairs]]'s exact all-pairs: each vector is assigned to
    * its `nprobe` nearest Lloyd-trained centroids (multi-probe assignment —
    * a pair split by one cell boundary still co-occurs in a shared cell
    * unless it straddles `nprobe` boundaries at once), candidates are the
    * intra-cell pairs, and exact cosine verifies each candidate once
    * behind an aggregate barrier (the [[Dedup.minhashPairs]] pattern), so
    * false positives are impossible and every emitted cosine is exact.
    *
    * Scale: per-cell candidate work is (cellSize·nprobe)² regardless of
    * corpus size — cells grow in number, not size — and the pair shuffle
    * carries (centroid, id) longs, never vectors; vectors rejoin only for
    * the per-candidate verify. The assignment itself goes through the
    * two-level [[IvfIndex]] (round-6 VERDICT-1): only the ~√F coarse
    * routing table broadcasts, the O(corpus) fine table is reached by a
    * shuffled equi-join. Recall is cell-geometry-bounded rather than
    * guaranteed (unlike the MinHash S-curve there is no closed-form bound),
    * which is why this is registered rows-only and spec'd for recall
    * against the exact operator instead of oracle-hashed.
    */
  def ivfNearDupPairs(embeddings: DataFrame, threshold: Double,
                      cellSize: Int = 128, nprobe: Int = 3,
                      trainIters: Int = 2, cprobe: Int = 4,
                      indexOpt: Option[IvfIndex] = None,
                      assignedOpt: Option[DataFrame] = None): DataFrame = {
    val corpus = prepared(embeddings)
    val index = indexOpt.getOrElse(
      trackInline(trainedIndex(corpus, cellSize, trainIters, cprobe)))
    // multi-probe inverted lists: shared when provided (must carry
    // probeDepth >= nprobe; the registry materializes depth 3)
    val lists = assignedOpt.getOrElse(assignFine(corpus, index, cprobe, nprobe, "vec_id"))
    ivfNearDupServe(lists, threshold, nprobe)
  }

  /** SERVING core of [[ivfNearDupPairs]]: candidate generation + exact
    * verification against already-built inverted lists alone — the lists
    * carry every corpus vector at cell_rank 1 (assignment is total; the
    * empty-cell fallback in [[assignFine]] guarantees no vector is
    * missing), so BOTH the candidate join and the verify side read the
    * lists, never the embeddings table.
    */
  def ivfNearDupServe(lists: DataFrame, threshold: Double,
                      nprobe: Int = 3): DataFrame = {
    val assigned = lists.filter(col("cell_rank") <= nprobe)
      .select(col("vec_id"), col("centroid_id"))
    val candidates = assigned.as("a")
      .join(assigned.as("b"),
        col("a.centroid_id") === col("b.centroid_id") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id1"), col("b.vec_id").as("vec_id2"))
      .distinct() // a pair may share several probed cells; verify once
    val corpus = lists.filter(col("cell_rank") === 1)
      .select(col("vec_id"), col("v"), col("nrm"))
    val s1 = corpus.select(col("vec_id").as("vec_id1"), col("v").as("v1"), col("nrm").as("nrm1"))
    val s2 = corpus.select(col("vec_id").as("vec_id2"), col("v").as("v2"), col("nrm").as("nrm2"))
    candidates.join(s1, "vec_id1").join(s2, "vec_id2")
      .groupBy("vec_id1", "vec_id2")
      .agg(min(dot(col("v1"), col("v2")) / (col("nrm1") * col("nrm2"))).as("cosine"))
      .filter(col("cosine") >= threshold)
      .orderBy("vec_id1", "vec_id2")
  }

  /** RECALL-CONTRACT witness over the two persisted near-dup pair
    * families (round-10 verdict next-round 3): of the exactly-verified
    * sign-LSH pairs at a threshold (the [[lshNearDupPairs]] table — fully
    * oracle-mirrored, so its COUNT is something DuckDB can recompute),
    * the fraction the trained-centroid IVF path ([[ivfNearDupPairs]])
    * also found, asserted against `bound` as a literal `within_bound`
    * column. The output carries ONLY oracle-computable columns plus the
    * contract literals — the IVF-dependent recall itself is folded into
    * the 0/1 flag — so a hash compare pins the contract: if centroid
    * drift ever drops IVF recall below `bound`, `within_bound` flips to 0
    * and the artifact goes red (the `approxDistinctBound` /
    * `approxPercentileBound` witness precedent, promoting the IVF
    * family's spec-only recall assertion into the hash-checked surface).
    *
    * One semi-join on id pairs + one two-column aggregate — both inputs
    * are the already-persisted pair tables, so the witness never touches
    * embeddings, lists, or buckets.
    */
  def ivfRecallBound(ivfPairs: DataFrame, exactPairs: DataFrame,
                     bound: Double = 0.95): DataFrame = {
    val marked = exactPairs.select(col("vec_id1"), col("vec_id2"))
      .join(ivfPairs.select(col("vec_id1"), col("vec_id2"))
          .withColumn("hit", lit(1L)),
        Seq("vec_id1", "vec_id2"), "left")
    marked
      .agg(count(lit(1)).as("n_exact_pairs"),
        sum(coalesce(col("hit"), lit(0L))).as("n_found"))
      .select(col("n_exact_pairs"),
        lit(bound).as("recall_bound"),
        // coalesce(n_found, 0): a pair-free corpus makes sum() NULL and
        // the contract is then vacuously met (0 ≥ 0), matching the
        // oracle's literal 1 instead of going NULL-red with no defect
        (coalesce(col("n_found"), lit(0L)) >= col("n_exact_pairs") * lit(bound))
          .cast("int").as("within_bound"))
  }

  /** [[ivfRecallBound]]'s per-query twin for TOP-K serving: of each
    * query's exact top-k (the fully-oracled [[bruteForceTopK]] rows),
    * the fraction the approximate path also returned, folded into a
    * per-query `within_bound` literal — promoting the last rows-only
    * family's recall contract (IVF top-k; trained centroids cannot be
    * SQL-mirrored) into the hash-checked surface. Only oracle-computable
    * columns plus the contract literals are emitted; one id-pair
    * semi-join + a per-query two-column aggregate.
    */
  def topKRecallBound(approxTopK: DataFrame, exactTopK: DataFrame,
                      bound: Double = 0.8): DataFrame = {
    val marked = exactTopK.select(col("query_id"), col("vec_id"))
      .join(approxTopK.select(col("query_id"), col("vec_id"))
          .withColumn("hit", lit(1L)),
        Seq("query_id", "vec_id"), "left")
    marked.groupBy("query_id")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0L))).as("n_found"))
      .select(col("query_id"), col("n_exact"),
        lit(bound).as("recall_bound"),
        (col("n_found") >= col("n_exact") * lit(bound))
          .cast("int").as("within_bound"))
      .orderBy("query_id")
  }

  // ------------------------------------------------- product quantization

  /** The unit-L2-normalized corpus — the similarity family's shared
    * pre-step: zero-norm vectors are unanswerable under cosine and drop.
    * Deliberately label-free (unlike [[prepared]]) so streaming encode
    * batches — bare (vec_id, embedding) frames — can use the same path.
    */
  private def unitized(embeddings: DataFrame): DataFrame = {
    val v = toDoubleVec(col("embedding"))
    embeddings.select(col("vec_id"), v.as("v"))
      .withColumn("nrm", l2norm(col("v")))
      .filter(col("nrm") > 0)
      .select(col("vec_id"), transform(col("v"), x => x / col("nrm")).as("u"))
  }

  /** All PQ codebooks packed into ONE broadcastable row — `pcb` is an
    * array over subspaces (positionally indexed: every subspace is
    * present by construction), each holding its code-sorted
    * (code, centroid) structs. Total bytes = m·k·dsub doubles (1 KiB at
    * defaults) — bounded by CONSTANTS, nothing grows with the corpus.
    */
  private def packPq(codebooks: DataFrame): DataFrame =
    codebooks.groupBy("sub")
      .agg(array_sort(collect_list(struct(col("code"), col("cv")))).as("cbs"))
      .groupBy()
      .agg(array_sort(collect_list(struct(col("sub"), col("cbs")))).as("pcb"))

  /** Nearest codebook entry for one sub-vector — an in-projection fold
    * over the packed codebook (the packedCoarse discipline: ranking
    * against a tiny broadcast inside a projection, zero exchanges);
    * strict `<` keeps the lowest code on exact ties.
    */
  private def bestPqCode(sv: org.apache.spark.sql.Column,
                         cbs: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(cbs,
      struct(lit(Double.MaxValue).as("d"), lit(-1L).as("code")),
      (acc, c) => {
        val dist = aggregate(zip_with(sv, c.getField("cv"),
          (a, b) => (a - b) * (a - b)), lit(0.0), (x, y) => x + y)
        when(dist < acc.getField("d"),
          struct(dist.as("d"), c.getField("code").as("code"))).otherwise(acc)
      }).getField("code")

  private def assignPq(subs: DataFrame, codebooks: DataFrame): DataFrame =
    subs.crossJoin(broadcast(packPq(codebooks)))
      .select(col("vec_id"), col("sub"), col("sv"),
        bestPqCode(col("sv"),
          element_at(col("pcb"), (col("sub") + 1).cast("int"))
            .getField("cbs")).as("code"))

  /** PRODUCT-QUANTIZATION codebooks — the third quantization scheme of
    * the similarity family (int8 SQ keeps 64 bytes/vector; PQ keeps `m`
    * small CODES — 8 at defaults, a further 8× lighter compressed linear
    * scan — the workhorse of billion-vector ANN). The unit-normalized
    * corpus splits into `m` contiguous `dim/m`-dim subspaces; each
    * trains its own k-means codebook (hash-sampled ~`k` seeds + Lloyd
    * refinement, the IVF coarse level's discipline; empty cells drop the
    * same way) and codes re-densify to 0..|codebook|−1 per subspace so
    * the asymmetric-scan LUT indexes positionally. L2² on unit vectors
    * is 2−2·cosine, so PQ distance ASC approximates the family's cosine
    * DESC directly and [[topKRecallBound]] can witness it against
    * [[bruteForceTopK]].
    *
    * Scale shape: training streams (vec_id, sub, subv) rows against the
    * packed 1-row codebook broadcast (in-projection argmin — zero
    * exchange), then one (sub, code) mean aggregate per Lloyd round;
    * the re-densify window runs over ≤ m·k rows. Trained centroids are
    * xxhash64-seeded like IVF's — not SQL-mirrorable, so consumers are
    * rows-only with a hash-checked recall witness.
    */
  def trainPqCodebooks(embeddings: DataFrame, m: Int = 8, k: Int = 64,
                       trainIters: Int = 3, dim: Int = 64): DataFrame = {
    require(dim % m == 0, s"dim=$dim must split into m=$m subspaces")
    val dsub = dim / m
    val d = unitized(embeddings)
    val subs = d
      .withColumn("sub", explode(sequence(lit(0), lit(m - 1))))
      .select(col("vec_id"), col("sub"),
        slice(col("u"), col("sub") * lit(dsub) + lit(1), lit(dsub)).as("sv"))
    val stats = d.agg(count(lit(1)).as("__n"), min(col("vec_id")).as("__min_id"))
    val seeds = subs.crossJoin(broadcast(stats))
      .filter(pmod(xxhash64(col("vec_id"), lit(13L)),
          greatest(lit(1L), floor(col("__n") / k).cast("long"))) === 0L ||
        col("vec_id") === col("__min_id"))
      .select(col("sub"), col("vec_id").as("code"), col("sv").as("cv"))
    val trained = (1 to trainIters).foldLeft(seeds) { (cb, _) =>
      assignPq(subs, cb)
        .groupBy("sub", "code")
        .agg(graft.functions.VectorFunctions.vecSum(col("sv")).as("vs"),
          count(lit(1)).as("n"))
        .select(col("sub"), col("code"),
          transform(col("vs"), x => x / col("n")).as("cv"))
    }
    val w = Window.partitionBy("sub").orderBy("code")
    trained.withColumn("code", (row_number().over(w) - 1).cast("long"))
  }

  /** PQ-encode the corpus: per vector, the `m` nearest-codebook codes —
    * one projection against the packed 1-row broadcast, zero exchange
    * (scan-cost, like [[quantizeEmbeddings]]). Built from READ-BACK
    * codebooks in the persisted family (staging discipline).
    */
  def pqEncode(embeddings: DataFrame, codebooks: DataFrame, m: Int = 8,
               dim: Int = 64): DataFrame = {
    val dsub = dim / m
    unitized(embeddings).crossJoin(broadcast(packPq(codebooks)))
      .select(col("vec_id"),
        transform(sequence(lit(0), lit(m - 1)), s =>
          bestPqCode(slice(col("u"), s * lit(dsub) + lit(1), lit(dsub)),
            element_at(col("pcb"), (s + 1).cast("int")).getField("cbs")))
          .as("codes"))
  }

  /** Asymmetric-distance PQ top-k over ALREADY-ENCODED codes — the PQ
    * serving path: each query builds its per-subspace lookup table (k
    * exact sub-distances per subspace, m·k doubles per query) against
    * the packed codebooks; the corpus side then ranks by Σ LUT[sub][code]
    * — a compressed LINEAR scan touching only the m-code rows, never the
    * float embeddings (the point of PQ at 10⁹ vectors: the scan is ~32×
    * lighter than the raw-vector brute force with the same plan shape).
    * Distance ASC ≈ cosine DESC (unit vectors); ties break by vec_id.
    */
  def pqTopKServeFrom(embeddings: DataFrame, codebooks: DataFrame,
                      codes: DataFrame, numQueries: Int = 5, k: Int = 10,
                      m: Int = 8, dim: Int = 64): DataFrame = {
    val dsub = dim / m
    val qlut = unitized(embeddings).filter(col("vec_id") < numQueries)
      .crossJoin(broadcast(packPq(codebooks)))
      .select(col("vec_id").as("query_id"),
        transform(sequence(lit(0), lit(m - 1)), s => {
          val sv = slice(col("u"), s * lit(dsub) + lit(1), lit(dsub))
          transform(element_at(col("pcb"), (s + 1).cast("int")).getField("cbs"),
            c => aggregate(zip_with(sv, c.getField("cv"),
              (a, b) => (a - b) * (a - b)), lit(0.0), (x, y) => x + y))
        }).as("lut"))
    val scored = codes.join(broadcast(qlut), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        aggregate(zip_with(col("codes"), col("lut"),
            (c, l) => element_at(l, (c + 1).cast("int"))),
          lit(0.0), (x, y) => x + y).as("pq_dist"))
    val w = Window.partitionBy("query_id").orderBy(col("pq_dist").asc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** The PRODUCTION PQ serving path — ADC shortlist + exact rerank: the
    * compressed scan ranks the whole corpus by approximate distance and
    * keeps a per-query `shortlist`; ONLY those rows' float vectors are
    * fetched (two equi-joins against the narrow shortlist — at 10⁹
    * vectors this is the whole point: the float table is touched for
    * `numQueries·shortlist` rows, not the corpus) and exact cosine
    * re-ranks the final top-`k`. Emitted cosines are EXACT, so the only
    * approximation left is shortlist membership — which is what the
    * recall witness bounds.
    */
  def pqTopKRerankServeFrom(embeddings: DataFrame, codebooks: DataFrame,
                            codes: DataFrame, numQueries: Int = 5,
                            k: Int = 10, shortlist: Int = 200,
                            m: Int = 8, dim: Int = 64): DataFrame = {
    val cand = pqTopKServeFrom(embeddings, codebooks, codes,
        numQueries, shortlist, m, dim)
      .select(col("query_id"), col("vec_id"))
    // label-free [[prepared]]: the float source may be the corpus table
    // OR a stream-grown (vec_id, embedding) union, which carries no label
    val d = embeddings
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", l2norm(col("v")))
    val scored = cand
      .join(d.select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm")), Seq("query_id"))
      .join(d.select(col("vec_id"), col("v"), col("nrm")), Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        (dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** IVF-PQ top-k — the canonical billion-vector composition (FAISS's
    * IVFPQ), assembled from the TWO persisted indexes: the IVF side
    * routes each query to its `nprobe` nearest cells (only cell members
    * are ever candidates — the corpus-pruning level), the PQ side ranks
    * those candidates by compressed LUT distance (the in-cell scan reads
    * 8-code rows, not floats), and exact cosine reranks the per-query
    * `shortlist` from the vectors the inverted lists already carry — so
    * the whole serve touches ONLY persisted index tables, never the raw
    * embeddings. Emitted cosines are exact; the approximation (cell
    * geometry ∩ shortlist membership) is what the recall witness bounds.
    */
  def ivfPqTopKServe(index: IvfIndex, lists: DataFrame, codebooks: DataFrame,
                     codes: DataFrame, numQueries: Int = 5, k: Int = 10,
                     shortlist: Int = 50, nprobe: Int = 6, cprobe: Int = 4,
                     m: Int = 8, dim: Int = 64): DataFrame = {
    val dsub = dim / m
    val assigned = lists.filter(col("cell_rank") === 1).drop("cell_rank")
    val queries = assigned.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("v"), col("nrm"))
    val probes = assignFine(queries, index, cprobe, nprobe, "query_id")
      .select(col("query_id"), col("centroid_id"))
    val qlut = queries
      .select(col("query_id"), transform(col("v"), x => x / col("nrm")).as("qu"))
      .crossJoin(broadcast(packPq(codebooks)))
      .select(col("query_id"),
        transform(sequence(lit(0), lit(m - 1)), s => {
          val sv = slice(col("qu"), s * lit(dsub) + lit(1), lit(dsub))
          transform(element_at(col("pcb"), (s + 1).cast("int")).getField("cbs"),
            c => aggregate(zip_with(sv, c.getField("cv"),
              (a, b) => (a - b) * (a - b)), lit(0.0), (x, y) => x + y))
        }).as("lut"))
    // candidates: probed-cell members, ranked by compressed distance
    val ws = Window.partitionBy("query_id").orderBy(col("pq_dist").asc, col("vec_id"))
    val short = assigned.select(col("vec_id"), col("centroid_id"))
      .join(broadcast(probes), Seq("centroid_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id")).distinct()
      .join(codes, Seq("vec_id"))
      .join(broadcast(qlut), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        aggregate(zip_with(col("codes"), col("lut"),
            (c, l) => element_at(l, (c + 1).cast("int"))),
          lit(0.0), (x, y) => x + y).as("pq_dist"))
      .withColumn("prank", row_number().over(ws))
      .filter(col("prank") <= shortlist)
      .select(col("query_id"), col("vec_id"))
    // exact rerank from the vectors the lists already carry
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    short
      .join(assigned.select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm")), Seq("query_id"))
      .join(assigned.select(col("vec_id"), col("v"), col("nrm")), Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        (dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** PQ serving for an ARBITRARY query-vector frame — the endpoint form
    * of [[pqTopKRerankServeFrom]] and the batch kernel a PQ query stream
    * would run: `queries` is any (query_id, embedding) frame (a REST
    * batch, a micro-batch), not a corpus-id prefix. Each request is
    * unit-normalized (zero-norm requests are unanswerable under cosine
    * and drop, never served garbage), builds its LUT against the FROZEN
    * codebooks, ranks the stored code rows by ADC, and exact cosine
    * reranks the shortlist fetched from the float corpus.
    *
    * `excludeSelf` is the [[quantizedTopKForQueries]] contract verbatim:
    * true (default) for in-corpus request ids — feeding corpus vectors
    * under their own ids reproduces the registry path — false when
    * request ids are an external numbering that may collide.
    */
  def pqTopKForQueries(queries: DataFrame, codebooks: DataFrame,
                       codes: DataFrame, embeddings: DataFrame,
                       k: Int = 10, shortlist: Int = 200, m: Int = 8,
                       dim: Int = 64, excludeSelf: Boolean = true): DataFrame = {
    val dsub = dim / m
    val qlut = unitized(queries.select(col("query_id").as("vec_id"),
        col("embedding")))
      .select(col("vec_id").as("query_id"), col("u").as("qu"))
      .crossJoin(broadcast(packPq(codebooks)))
      .select(col("query_id"),
        transform(sequence(lit(0), lit(m - 1)), s => {
          val sv = slice(col("qu"), s * lit(dsub) + lit(1), lit(dsub))
          transform(element_at(col("pcb"), (s + 1).cast("int")).getField("cbs"),
            c => aggregate(zip_with(sv, c.getField("cv"),
              (a, b) => (a - b) * (a - b)), lit(0.0), (x, y) => x + y))
        }).as("lut"))
    val joinCond = if (excludeSelf) col("vec_id") =!= col("query_id") else lit(true)
    val ws = Window.partitionBy("query_id").orderBy(col("pq_dist").asc, col("vec_id"))
    val short = codes.join(broadcast(qlut), joinCond)
      .select(col("query_id"), col("vec_id"),
        aggregate(zip_with(col("codes"), col("lut"),
            (c, l) => element_at(l, (c + 1).cast("int"))),
          lit(0.0), (x, y) => x + y).as("pq_dist"))
      .withColumn("prank", row_number().over(ws))
      .filter(col("prank") <= shortlist)
      .select(col("query_id"), col("vec_id"))
    // rerank with the RAW query vector and the family's exact cosine
    // formulation (dot/(qnrm·nrm)) — bit-identical to the corpus-prefix
    // path when a corpus vector arrives under its own id
    val qv = queries.select(col("query_id"),
        toDoubleVec(col("embedding")).as("qv"))
      .withColumn("qnrm", l2norm(col("qv")))
      .filter(col("qnrm") > 0)
    val d = prepared(embeddings)
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    short
      .join(qv, Seq("query_id"))
      .join(d.select(col("vec_id"), col("v"), col("nrm")), Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        (dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** Train + encode + persist the PQ family (`codebooks/`, `codes/`,
    * `topk/`) under `dir` — training is once-per-snapshot batch like the
    * IVF and annserve families; encode runs from the READ-BACK codebooks
    * so the stored codes are by construction what serving would compute.
    *
    * `topk/` (v3) is the DEFAULT-PARAMETER ADC-shortlist + exact-rerank
    * answer ([[pqTopKRerankServeFrom]] at its defaults), computed from
    * the READ-BACK codebooks + codes — the `q_ivf_neardup_pairs` /
    * annserve-v6 amortization precedent: the default answer every
    * registry call was rebuilding (LUT + compressed scan + two rerank
    * joins) runs once per corpus snapshot, and serving it is one scan.
    * [[pqTopKRerankServeFrom]]/[[pqTopKForQueries]] remain the
    * any-parameter / arbitrary-request paths.
    */
  def persistPq(embeddings: DataFrame, dir: String, stamp: String,
                m: Int = 8, k: Int = 64, trainIters: Int = 3,
                dim: Int = 64): Unit = {
    val spark = embeddings.sparkSession
    trainPqCodebooks(embeddings, m, k, trainIters, dim)
      .write.mode("overwrite").parquet(s"$dir/codebooks")
    pqEncode(embeddings, spark.read.parquet(s"$dir/codebooks"), m, dim)
      .write.mode("overwrite").parquet(s"$dir/codes")
    pqTopKRerankServeFrom(embeddings,
        spark.read.parquet(s"$dir/codebooks"),
        spark.read.parquet(s"$dir/codes"), m = m, dim = dim)
      .withColumn("rank", col("rank").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/topk")
    graft.sources.SnapshotStore.commit(spark, dir, stamp)
  }

  /** Persist the DEFAULT-PARAMETER IVF-PQ answer (`topk/`) under `dir` —
    * the last default-parameter family output that was still rebuilt per
    * call (probe routing + LUT construction + two rerank joins made it
    * the registry's heaviest serving query). The build composes the two
    * ALREADY-PERSISTED indexes exactly as [[ivfPqTopKServe]] does —
    * callers pass the loaded IVF index/lists and the PQ family's
    * read-back codebooks/codes, so nothing here retrains or re-encodes —
    * and the any-parameter [[ivfPqTopKServe]] path stays for non-default
    * (k, shortlist, nprobe) requests.
    */
  def persistIvfPqTopK(index: IvfIndex, lists: DataFrame,
                       codebooks: DataFrame, codes: DataFrame, dir: String,
                       stamp: String, numQueries: Int = 5, k: Int = 10,
                       shortlist: Int = 200, nprobe: Int = 16,
                       m: Int = 8, dim: Int = 64): Unit = {
    val spark = lists.sparkSession
    ivfPqTopKServe(index, lists, codebooks, codes, numQueries, k,
        shortlist, nprobe, m = m, dim = dim)
      .withColumn("rank", col("rank").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/topk")
    graft.sources.SnapshotStore.commit(spark, dir, stamp)
  }

  /** Per-tensor symmetric int8 quantization of the embedding column — the
    * 100 TB memory story for similarity serving: one global step size
    * `scale = max|x| / 127` over the corpus, `code = ⌊x·127/max + 0.5⌋ ∈
    * [−127, 127]`, shrinking every vector 4× (float32 → int8) while integer
    * dot products rank identically to the dequantized approximation
    * (`dot ≈ Σ cᵃcᵇ · scale²` — one global scale factors OUT of the
    * ranking, which per-dimension scales would not).
    *
    * Vectors are unit-L2-normalized BEFORE quantization — the standard SQ8
    * recipe for cosine serving: on unit vectors the integer dot ranks by
    * cosine directly, so [[quantizedTopK]] is comparable against
    * [[bruteForceTopK]] and its recall gap is quantization error alone.
    * Normalization is the same sequential-fold norm the oracle mirrors, so
    * exactness is preserved (assumes no all-zero vectors, true of any real
    * embedding table).
    *
    * Everything downstream of the one max|x| aggregate (a map-side-combined
    * tree reduction, broadcast as a single row) is integer arithmetic, so
    * unlike the cell-geometry IVF path the quantized table AND the
    * quantized top-k are bit-exact reproducible cross-engine — the oracle
    * hash-checks them fully. Round-half-up is spelled `floor(y + 0.5)`
    * rather than `round(y)` so both engines agree at ties by construction.
    *
    * At scale the quantized table would be persisted per corpus snapshot
    * beside the IVF lists (same [[graft.sources.SnapshotStore]] pattern);
    * building it inline is one projection + a scalar aggregate — scan-cost,
    * not index-cost, so nothing here amortizes badly.
    */
  def quantizeEmbeddings(embeddings: DataFrame): DataFrame = {
    val prep = prepared(embeddings)
      .select(col("vec_id"), col("label"),
        transform(col("v"), x => x / col("nrm")).as("u"))
    val m = prep.agg(max(array_max(transform(col("u"), x => abs(x)))).as("m"))
    prep.crossJoin(broadcast(m))
      .select(col("vec_id"), col("label"),
        transform(col("u"), x =>
          greatest(lit(-127L), least(lit(127L),
            floor(x * lit(127.0) / col("m") + lit(0.5))))
            .cast("int")).as("codes"),
        (col("m") / lit(127.0)).as("scale"),
        // the raw grid maximum rides along for persistAnnServe's meta:
        // reconstructing it as scale*127 does NOT round-trip in IEEE
        // double (~1 ulp for some m), and a query quantized on a 1-ulp-
        // perturbed grid can land a boundary component in the adjacent
        // code — breaking bit-for-bit parity data-dependently
        col("m").as("max_abs"))
  }

  /** Quantized cosine top-k: [[bruteForceTopK]]'s plan shape (broadcast
    * probe set against the corpus scan, per-query rank window) over int8
    * codes — the integer dot replaces the double dot, `qdot` ties broken by
    * vec_id. Oracle-exact end to end (integer sums are order-independent);
    * recall vs the exact operator is additionally spec-asserted.
    */
  def quantizedTopK(embeddings: DataFrame, numQueries: Int = 5, k: Int = 10): DataFrame = {
    val q = quantizeEmbeddings(embeddings)
    val corpus = q.select(col("vec_id"), col("codes"))
    val probes = q.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("codes").as("qcodes"))
    val scored = corpus
      .join(broadcast(probes), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        aggregate(zip_with(col("qcodes"), col("codes"),
            (a, b) => (a * b).cast("long")),
          lit(0L), (acc, x) => acc + x).as("qdot"))
    val w = Window.partitionBy("query_id").orderBy(col("qdot").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** The 100 TB quantized SERVING composition (round-9 verdict next-round
    * 4): int8 codes ranked inside sign-LSH band candidates — the 4× memory
    * win (int8 corpus instead of float32) AND candidate pruning
    * (bucket-occupancy-bounded rank windows instead of corpus-wide ones)
    * in one pipeline, vs [[quantizedTopK]]'s deliberate full-scan baseline
    * shape. Both halves are closed-form/integer — deterministic
    * [[lshPlaneWeights]] hyperplanes, one global quantization scale that
    * factors out of the ranking, order-free integer dots — so unlike the
    * trained IVF serving twin the whole probe → candidate → integer-rank
    * pipeline mirrors into SQL and hash-checks end to end. Recall@k vs
    * [[bruteForceTopK]] is additionally spec-asserted.
    *
    * Bucketing runs on the RAW vectors while scoring uses unit-normalized
    * codes: the sign of ⟨v, h⟩ is invariant under the positive per-vector
    * norm, so both sides see the same buckets and the composition stays
    * coherent.
    *
    * Scale shape: bucketing is a narrow scan-speed projection (zero
    * training, zero broadcast state); the probe set (numQueries × bands
    * rows) is the only broadcast; candidates dedup across bands behind an
    * aggregate barrier before any scoring; the code fetch joins shuffle
    * int8 code arrays (~dim bytes/row), never float vectors; rank windows
    * are bounded by bucket occupancy, not the corpus.
    */
  def quantizedTopKServe(embeddings: DataFrame, numQueries: Int = 5, k: Int = 10,
                         nbits: Int = 16, bandBits: Int = 4, dim: Int = 64): DataFrame = {
    require(nbits % bandBits == 0, s"nbits=$nbits must split into bandBits=$bandBits bands")
    val bands = nbits / bandBits
    quantizedTopKServeFrom(
      quantizeEmbeddings(embeddings).select(col("vec_id"), col("codes")),
      bandExplode(lshBuckets(embeddings, nbits, dim), bands, bandBits),
      numQueries, k)
  }

  /** [[quantizedTopKServe]] over ALREADY-MATERIALIZED serving tables —
    * what the registry runs against the [[persistAnnServe]]-persisted
    * snapshot, so no process re-quantizes or re-buckets the corpus per
    * call (the dedup-family amortization discipline applied to the ANN
    * serving side). `codes` is (vec_id, codes); `bands` is the
    * (vec_id, band, bb) triple table.
    */
  def quantizedTopKServeFrom(codes: DataFrame, bands: DataFrame,
                             numQueries: Int = 5, k: Int = 10): DataFrame = {
    val probes = bands.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("band"), col("bb"))
    val p0 = bands.join(broadcast(probes), Seq("band", "bb"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    val scored = p0
      .join(codes.select(col("vec_id").as("query_id"), col("codes").as("qcodes")),
        Seq("query_id"))
      .join(codes, Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        aggregate(zip_with(col("qcodes"), col("codes"),
            (a, b) => (a * b).cast("long")),
          lit(0L), (acc, x) => acc + x).as("qdot"))
    val w = Window.partitionBy("query_id").orderBy(col("qdot").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** Build the ANN serving snapshot ONCE per corpus: the int8 code table
    * and the LSH band-triple table, committed under a content-stamped
    * marker ([[graft.sources.SnapshotStore]] — the same pattern as the
    * IVF index and the dedup sketch family). Construction is two scans
    * (a scalar max reduction + narrow projections), but serving must not
    * re-pay even that per call — and at 100 TB the code table IS the
    * served copy of the corpus (4× smaller than the floats), so
    * materializing it is the point, not an optimization.
    */
  def persistAnnServe(embeddings: DataFrame, dir: String, nbits: Int = 16,
                      bandBits: Int = 4, dim: Int = 64, stamp: String = "",
                      pairThreshold: Double = 0.4): Unit = {
    require(nbits % bandBits == 0, s"nbits=$nbits must split into bandBits=$bandBits bands")
    val spark = embeddings.sparkSession
    // one corpus-wide quantization pass feeds BOTH the code table and the
    // meta row (localCheckpoint barrier — without it the meta's limit(1)
    // re-runs the corpus-wide max aggregate; the persistSketchTables
    // staging discipline applied to the build side)
    val quantized = quantizeEmbeddings(embeddings).localCheckpoint()
    quantized.select(col("vec_id"), col("codes"))
      .write.mode("overwrite").parquet(s"$dir/codes")
    // the one-row quantization geometry (v3): the RAW max|x| over the
    // unit-normalized corpus — what an INCOMING query vector must be
    // quantized with so its integer dots are commensurable with the
    // stored codes (a per-query re-derived or ulp-perturbed grid would
    // shift boundary components into adjacent codes)
    quantized.select(col("max_abs")).limit(1)
      .write.mode("overwrite").parquet(s"$dir/meta")
    bandExplode(lshBuckets(embeddings, nbits, dim), nbits / bandBits, bandBits)
      .write.mode("overwrite").parquet(s"$dir/bands")
    // default-threshold verified near-dup pairs (v2) — the lexical
    // family's minhash `pairs` precedent on the embedding side: the
    // bucket + candidate + exact-verify pipeline runs once per corpus
    // snapshot; serving the default threshold is one scan, and the
    // inline [[lshNearDupPairs]] stays the any-threshold path
    lshNearDupPairs(embeddings, pairThreshold, nbits, bandBits, dim)
      .write.mode("overwrite").parquet(s"$dir/pairs")
    // v5: the SEMANTIC duplicate-cluster assignment (SemDeDup's grouping
    // step) — exact min-label connected components over the READ-BACK
    // verified pairs (staging discipline; the lexical dedup-v6 clusters
    // precedent on the embedding side). cluster_id = min reachable
    // vec_id, so the deterministic keep-one rule ("keep the
    // representative") is derivable from this table alone:
    // drop ⇔ vec_id ≠ cluster_id.
    graft.operators.Dedup.clustersFromPairs(
        spark.read.parquet(s"$dir/pairs")
          .select(col("vec_id1").as("doc_id1"), col("vec_id2").as("doc_id2")))
      .select(col("doc_id").as("vec_id"), col("cluster_id"))
      .write.mode("overwrite").parquet(s"$dir/clusters")
    // v6: the contrastive training triples — the negative-mining band
    // pass over the pair members runs once per corpus snapshot (it was
    // the registry's heaviest per-call query before persisting); built
    // from the READ-BACK pairs (staging discipline), threshold shared
    // with the pair table so positives/negatives partition the space.
    contrastiveTriples(embeddings, spark.read.parquet(s"$dir/pairs"),
        dupThreshold = pairThreshold, nbits = nbits, bandBits = bandBits,
        dim = dim)
      .write.mode("overwrite").parquet(s"$dir/triples")
    graft.sources.SnapshotStore.commit(spark, dir, stamp)
  }

  /** A [[persistAnnServe]]-ed snapshot's five tables + the quantization
    * grid: codes, band triples, verified default-threshold pairs,
    * contrastive training triples, and max|x| over the unit-normalized
    * corpus.
    */
  case class AnnServeTables(codes: DataFrame, bands: DataFrame,
                            pairs: DataFrame, clusters: DataFrame,
                            triples: DataFrame, maxAbs: Double)

  /** Load a [[persistAnnServe]]-ed snapshot. The one-row meta read is a
    * driver-side head over a single-row parquet — load-time, not
    * per-query.
    */
  def loadAnnServe(spark: org.apache.spark.sql.SparkSession,
                   dir: String): AnnServeTables =
    AnnServeTables(
      codes = spark.read.parquet(s"$dir/codes"),
      bands = spark.read.parquet(s"$dir/bands"),
      pairs = spark.read.parquet(s"$dir/pairs"),
      clusters = spark.read.parquet(s"$dir/clusters"),
      triples = spark.read.parquet(s"$dir/triples"),
      maxAbs = spark.read.parquet(s"$dir/meta").head().getDouble(0))

  /** Quantized ANN top-k for an ARBITRARY query-vector frame — the
    * serving-endpoint form of [[quantizedTopKServeFrom]], and the batch
    * kernel of the streaming query service ([[graft.streaming.AnnStream]]):
    * `queries` is any (query_id, embedding) frame — a REST batch, a
    * micro-batch of a query stream — not a corpus-id prefix. Each query
    * vector is sign-LSH-bucketed with the same closed-form planes the
    * snapshot's band table was built from and int8-quantized on the
    * SNAPSHOT's grid (`maxAbs` from the meta table — a fresh per-batch
    * grid would make integer dots incommensurable with the stored codes);
    * candidates and ranking then proceed exactly as the registry serve
    * path.
    *
    * `excludeSelf` controls the one place the two id NAMESPACES (request
    * ids vs corpus vec_ids) meet: with it true (default), a request
    * whose id happens to equal a corpus vec_id never receives that
    * corpus row — required for in-corpus queries (feeding corpus vectors
    * under their own ids then reproduces [[quantizedTopKServeFrom]]
    * bit-for-bit, spec'd), but WRONG for external requests with a
    * colliding numbering; pass false when request ids are not corpus
    * ids. Zero-norm request vectors are unanswerable under cosine
    * (their codes would be null) and are dropped, not served garbage.
    *
    * Scale shape: per batch, the broadcast is queries × bands rows; the
    * corpus-side work is the same band-triple join + code fetch as the
    * registry path — nothing scans the float embeddings.
    */
  def quantizedTopKForQueries(queries: DataFrame, snap: AnnServeTables,
                              k: Int = 10, nbits: Int = 16,
                              bandBits: Int = 4, dim: Int = 64,
                              excludeSelf: Boolean = true): DataFrame = {
    require(nbits % bandBits == 0, s"nbits=$nbits must split into bandBits=$bandBits bands")
    val w = lshPlaneWeights(nbits, dim)
    val bucket = (0 until nbits).map { i =>
      when(dot(col("v"), typedLit(w(i).toSeq)) > lit(0.0), lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val nrm = sqrt(dot(col("v"), col("v")))
    val qcodes = transform(col("v"), x =>
      greatest(lit(-127L), least(lit(127L),
        floor(x / nrm * lit(127.0) / lit(snap.maxAbs) + lit(0.5))))
        .cast("int"))
    val qb = queries
      .select(col("query_id"), toDoubleVec(col("embedding")).as("v"))
      .filter(dot(col("v"), col("v")) > lit(0.0))
      .select(col("query_id"), bucket.as("bucket"), qcodes.as("qcodes"))
    val probes = bandExplode(
        qb.select(col("query_id").as("vec_id"), col("bucket")),
        nbits / bandBits, bandBits)
      .select(col("vec_id").as("query_id"), col("band"), col("bb"))
    val p0 = snap.bands.join(broadcast(probes), Seq("band", "bb"))
      .filter(if (excludeSelf) col("vec_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    val scored = p0
      .join(broadcast(qb.select(col("query_id"), col("qcodes"))), Seq("query_id"))
      .join(snap.codes, Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        aggregate(zip_with(col("qcodes"), col("codes"),
            (a, b) => (a * b).cast("long")),
          lit(0L), (acc, x) => acc + x).as("qdot"))
    val rw = Window.partitionBy("query_id").orderBy(col("qdot").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** DuckDB oracle fragments: double-cast vectors + explicit sequential
    * left-fold dot product matching [[graft.functions.VectorFunctions]].
    */
  /** Deterministic sign-LSH (random-hyperplane) hyperplane weights:
    * with `k = i·dim + j`,
    * `w(i,j) = (((k² mod 1000003)·40503 + k·2654435761) mod 1000003) / 500001.5 − 1`
    * — pseudo-random in [−1, 1), derived from plane and dimension indices
    * by EXACT integer arithmetic followed by two IEEE double ops, so any
    * engine regenerates the identical planes from the two integers
    * `(nbits, dim)` alone. No RNG state to persist, nothing to broadcast:
    * the whole "index" of sign-LSH is this closed-form formula, which is
    * what makes it — unlike the Lloyd-trained IVF — fully oracle-able.
    *
    * The QUADRATIC term is load-bearing (r15). The previous family,
    * `(i·A + j·B) mod p`, is LINEAR in j: every row is the same
    * slope-B sawtooth, rows differing only by a phase offset — so the
    * rows were heavily CORRELATED (measured over 16×64: mean pairwise
    * |row cosine| 0.38, max ≈ 1.0, vs the ≈ 1/√dim ≈ 0.125 of
    * independent directions). Correlated planes waste sign bits and
    * break the i.i.d. assumption behind the JL distance guarantee —
    * measured consequences at the registry geometry, old → new family:
    * banded 4×4 near-dup recall at the 0.4-cosine threshold
    * 0.46 → 0.56 (sf0.01) and 0.46 → 0.53 (sf0.1) at a slightly LOWER
    * candidate rate, and [[jlProject]]'s distance fidelity reaches the
    * i.i.d.-Gaussian reference instead of plateauing (see its scaladoc
    * for the numbers). The k² mod-p term makes each row a different
    * segment of a quadratic residue sequence — no shared slope, and the
    * measured row correlation (mean |cos| 0.087, max 0.35) sits at the
    * independent-direction level. Overflow-exact everywhere: k ≤
    * nbits·dim (thousands), so k² < 2^63 and every product stays in
    * 64-bit integer range in Spark and DuckDB alike — and that envelope
    * is ENFORCED, not assumed (r15 ADVICE): past ⌊√(2^63−1)⌋ =
    * 3 037 000 499 a Scala `Long` would silently wrap while DuckDB
    * BIGINT raises, so the two engines would diverge instead of failing
    * together; the `require` makes the pathological geometry fail loudly
    * on BOTH.
    */
  def lshPlaneWeights(nbits: Int, dim: Int): Array[Array[Double]] = {
    require(nbits.toLong * dim <= 3037000499L,
      s"lshPlaneWeights: nbits*dim = ${nbits.toLong * dim} exceeds the " +
        "exact-arithmetic envelope (k^2 must stay below 2^63; max nbits*dim " +
        "is 3037000499)")
    Array.tabulate(nbits, dim) { (i, j) =>
      val k = i.toLong * dim + j
      ((k * k % 1000003L) * 40503L + k * 2654435761L) % 1000003L / 500001.5 - 1.0
    }
  }

  /** Sign-LSH bucket per vector: bit i of `bucket` is `⟨v, h_i⟩ > 0` for
    * the [[lshPlaneWeights]] hyperplanes — Charikar's SimHash for
    * embeddings, the LSH-bucketed ANN front-end (the prompt's named
    * alternative to the IVF path). A pure narrow projection — `nbits`
    * codegen'd [[graft.functions.VecDot]]s per row against literal plane
    * arrays, zero shuffle, zero state — so at 100 TB bucketing runs at
    * scan speed and embarrassingly parallel, with no training job and no
    * centroid broadcast at all.
    *
    * `dim` is index configuration like `nbits` (the plane literals must be
    * materialized in the plan); [[VecDot]] folds over `min(dim, |v|)`.
    */
  def lshBuckets(embeddings: DataFrame, nbits: Int = 16, dim: Int = 64): DataFrame =
    lshBucketsWith(embeddings, lshPlaneWeights(nbits, dim))

  /** [[lshBuckets]] against an explicit plane matrix — the seam that
    * lets [[planeMigrationCard]] bucket the same corpus under BOTH the
    * retired and the current plane family with one code path.
    */
  private def lshBucketsWith(embeddings: DataFrame,
                             w: Array[Array[Double]]): DataFrame = {
    val bucket = w.indices.map { i =>
      when(dot(col("v"), typedLit(w(i).toSeq)) > lit(0.0), lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    embeddings.select(col("vec_id"), col("label"), toDoubleVec(col("embedding")).as("v"))
      .select(col("vec_id"), col("label"), bucket.as("bucket"))
  }

  /** The RETIRED linear plane family,
    * `w(i,j) = ((i·2654435761 + j·40503) mod 1000003) / 500001.5 − 1` —
    * kept ONLY as [[planeMigrationCard]]'s comparison arm (r15 verdict
    * 8). It is linear in j, so every row is the same slope-40503 sawtooth
    * phase-shifted (measured mean pairwise |row cosine| 0.38 at 16×64) —
    * the defect the quadratic [[lshPlaneWeights]] family fixed. Nothing
    * else may call this.
    */
  private[graft] def lshPlaneWeightsLinearV1(nbits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nbits, dim)((i, j) =>
      ((i * 2654435761L + j * 40503L) % 1000003L).toDouble / 500001.5 - 1.0)

  /** PLANE-FAMILY MIGRATION card (r15 verdict 8): the r15 plane-family
    * fix re-stamped every plane-derived snapshot, and this card moves the
    * migration's EVIDENCE into the hash-checked surface — one row per
    * family (the retired `linear-v1`, the shipped `quadratic-v2`), each
    * carrying the banded near-dup candidate count, the exact-verified
    * find count, the shared exact ground truth, the derived
    * recall / candidate-rate, and the band-balance metric (largest
    * band-bucket population — the hot-key exposure of the candidate
    * join, the axis the r15 fix improved 311 → 167). Non-vacuous by
    * measurement: the quadratic family's recall is HIGHER at a LOWER
    * candidate rate (the r15 measured result, now pinned per-snapshot
    * by this card's oracle).
    *
    * Everything is computed over the duplicate-collapsed rep set (the
    * [[lshNearDupPairs]] discipline) so trivially-identical vectors
    * can't flatter either family with free cosine-1.0 pairs. Exact truth
    * reuses [[cosineNearDupPairs]]'s blocked equi-join (no cartesian);
    * the two band arms share one [[lshBucketsWith]] path and differ only
    * in the plane matrix. The 1-row truth/rep-count crossJoins are
    * build-time only — the registry serves the persisted 2-row card.
    *
    * Re-expressed on [[MigrationCard.build]] (r16 verdict 5): this card
    * now only contributes what is plane-SPECIFIC — the two candidate
    * generators (one [[lshBucketsWith]] path, two plane matrices), the
    * shared cosine verification (still ONE vector join over both arms'
    * candidates, filtered per arm), the band-balance metric, and the
    * exact truth/universe frames; counts, recall, candidate_rate and the
    * output schema come from the harness, so the next family migration
    * inherits them instead of re-deriving them.
    */
  def planeMigrationCard(embeddings: DataFrame, threshold: Double = 0.4,
                         nbits: Int = 16, bandBits: Int = 4,
                         dim: Int = 64): DataFrame = {
    require(nbits % bandBits == 0, s"nbits=$nbits must split into bandBits=$bandBits bands")
    val bands = nbits / bandBits
    val members = vecGroups(embeddings)
    val repEmb = embeddings.join(
      members.filter(col("rep") === col("vec_id")).select("vec_id"),
      Seq("vec_id"), "left_semi")
    val d = prepared(repEmb)
    def bandTriples(w: Array[Array[Double]]): DataFrame =
      bandExplode(lshBucketsWith(repEmb, w), bands, bandBits)
    def armPairs(family: String, cand: DataFrame): DataFrame =
      cand.as("a")
        .join(cand.as("b"),
          col("a.band") === col("b.band") && col("a.bb") === col("b.bb") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_id1"), col("b.vec_id").as("vec_id2"))
        .distinct()
        .withColumn("family", lit(family))
    // band balance: the largest band-bucket population — the hot-bucket
    // exposure that drives the candidate join's worst key (the r15
    // measured 311 → 167 improvement, now pinned per snapshot)
    def armBalance(cand: DataFrame): DataFrame =
      cand.groupBy("band", "bb").agg(count(lit(1)).as("c"))
        .agg(max(col("c")).as("max_band_bucket"))
    val linCand = bandTriples(lshPlaneWeightsLinearV1(nbits, dim))
    val quadCand = bandTriples(lshPlaneWeights(nbits, dim))
    // one vector join verifies BOTH arms' candidates (the arms are
    // filtered views of it — cheaper than a join per arm)
    val verified = armPairs("linear-v1", linCand)
      .unionByName(armPairs("quadratic-v2", quadCand))
      .join(d.select(col("vec_id").as("vec_id1"), col("v").as("v1"),
        col("nrm").as("nrm1")), Seq("vec_id1"))
      .join(d.select(col("vec_id").as("vec_id2"), col("v").as("v2"),
        col("nrm").as("nrm2")), Seq("vec_id2"))
      .select(col("family"),
        (dot(col("v1"), col("v2")) / (col("nrm1") * col("nrm2")) >=
          lit(threshold)).as("hit"))
    val truth = cosineNearDupPairs(repEmb, threshold)
      .agg(count(lit(1)).as("n_truth"))
    val universe = d.agg(count(lit(1)).as("n_reps"))
      .select((col("n_reps") * (col("n_reps") - lit(1L)) / lit(2L))
        .as("n_universe"))
    MigrationCard.build(
      Seq("linear-v1", "quadratic-v2").map(f =>
        (f, verified.filter(col("family") === f).drop("family"),
          armBalance(if (f == "linear-v1") linCand else quadCand))),
      truth, universe)
  }

  /** BANDING-GEOMETRY sensitivity card — the SECOND production instance
    * of [[MigrationCard.build]] (r16 verdict 5's "next migration lands
    * on the harness by default", exercised same-round): the sign-LSH
    * banding knob (how the `nbits` bucket splits into bands) is the
    * recall-vs-candidate-rate dial a deployment turns BEFORE re-keying
    * a 100 TB candidate join, and this card pins each geometry's
    * measured recall, candidate rate, and hot-bucket exposure per
    * snapshot, against the same exact cosine truth the plane card uses.
    *
    * The arms share ONE bucketing pass (the shipped quadratic family —
    * [[lshBuckets]]); they differ only in the band split of the same
    * `nbits`-bit bucket, so the card isolates the GEOMETRY variable.
    * Structural guarantee the spec pins: an `2k`-bit band collision
    * implies collision in both constituent `k`-bit bands, so the finer
    * split's candidates are a SUPERSET — recall and candidate rate are
    * monotone in band count, and the card shows where on that curve
    * each geometry sits for THIS corpus (the number that decides
    * whether the extra recall is worth the extra rate).
    *
    * Family labels sort ascending by band width: `"4bit-4band"`,
    * `"8bit-2band"` at the 16-bit default.
    */
  def bandGeometryCard(embeddings: DataFrame, threshold: Double = 0.4,
                       nbits: Int = 16, bandBitsArms: Seq[Int] = Seq(4, 8),
                       dim: Int = 64): DataFrame = {
    require(bandBitsArms.nonEmpty && bandBitsArms.forall(b => nbits % b == 0),
      s"every arm's band width must divide nbits=$nbits: $bandBitsArms")
    val members = vecGroups(embeddings)
    val repEmb = embeddings.join(
      members.filter(col("rep") === col("vec_id")).select("vec_id"),
      Seq("vec_id"), "left_semi")
    val d = prepared(repEmb)
    val buckets = lshBuckets(repEmb, nbits, dim)
    def familyOf(bandBits: Int) = s"${bandBits}bit-${nbits / bandBits}band"
    def triples(bandBits: Int): DataFrame =
      bandExplode(buckets, nbits / bandBits, bandBits)
    def armPairs(bandBits: Int): DataFrame = {
      val cand = triples(bandBits)
      cand.as("a")
        .join(cand.as("b"),
          col("a.band") === col("b.band") && col("a.bb") === col("b.bb") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_id1"), col("b.vec_id").as("vec_id2"))
        .distinct()
        .withColumn("family", lit(familyOf(bandBits)))
    }
    def armBalance(bandBits: Int): DataFrame =
      triples(bandBits).groupBy("band", "bb").agg(count(lit(1)).as("c"))
        .agg(max(col("c")).as("max_band_bucket"))
    // one vector join verifies every arm's candidates (the plane card's
    // shared-join discipline)
    val verified = bandBitsArms.map(armPairs).reduce(_.unionByName(_))
      .join(d.select(col("vec_id").as("vec_id1"), col("v").as("v1"),
        col("nrm").as("nrm1")), Seq("vec_id1"))
      .join(d.select(col("vec_id").as("vec_id2"), col("v").as("v2"),
        col("nrm").as("nrm2")), Seq("vec_id2"))
      .select(col("family"),
        (dot(col("v1"), col("v2")) / (col("nrm1") * col("nrm2")) >=
          lit(threshold)).as("hit"))
    val truth = cosineNearDupPairs(repEmb, threshold)
      .agg(count(lit(1)).as("n_truth"))
    val universe = d.agg(count(lit(1)).as("n_reps"))
      .select((col("n_reps") * (col("n_reps") - lit(1L)) / lit(2L))
        .as("n_universe"))
    MigrationCard.build(
      bandBitsArms.map(b =>
        (familyOf(b), verified.filter(col("family") === familyOf(b)).drop("family"),
          armBalance(b))),
      truth, universe)
  }

  /** (vec_id, band, bb) triples: each vector's `bucket` split into
    * `bands` sub-buckets of `bandBits` bits — static shifts unrolled via
    * `inline`, so the explode stays one narrow codegen'd projection.
    */
  private[operators] def bandExplode(buckets: DataFrame, bands: Int, bandBits: Int): DataFrame = {
    val mask = (1L << bandBits) - 1
    buckets.select(col("vec_id"),
      inline(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("bucket"), b * bandBits).bitwiseAND(lit(mask)).as("bb"))): _*)))
  }

  /** Exact-duplicate pre-pass for the embedding pair path (the
    * [[Dedup.dupGroups]] mirror): BITWISE-identical vectors collapse to one
    * representative (min vec_id) before any bucketing. A duplicate-heavy
    * corpus — the same image embedded from two crawls — otherwise lands k
    * copies in identical band buckets and turns the candidate join k²;
    * sketching representatives bounds the join by DISTINCT vectors and
    * doc-level pairs re-expand combinatorially afterwards (inherent output
    * size, not join-state size). Grouping is on the raw float array —
    * exact equality, no hash-collision class at all.
    */
  private def vecGroups(embeddings: DataFrame): DataFrame = {
    val keyed = embeddings.select(col("vec_id"), col("embedding"))
    val reps = keyed.groupBy("embedding").agg(min("vec_id").as("rep"))
    // barrier: membership feeds the rep filter, the eligibility semi-join
    // and both expansion joins — reuse one exchange instead of re-running
    // the vector-wide groupBy per consumer
    keyed.join(reps, Seq("embedding")).select(col("rep"), col("vec_id"))
      .repartition(col("rep"))
  }

  /** Distinct rep-level LSH candidate pairs — exposed for the duplication
    * stress spec ([[lshNearDupPairs]]' candidate state must be EXACTLY
    * flat under corpus duplication, the DedupStressSpec bound).
    */
  def lshCandidates(embeddings: DataFrame, nbits: Int = 16, bandBits: Int = 4,
                    dim: Int = 64): DataFrame = {
    val members = vecGroups(embeddings)
    val repEmb = embeddings.join(
      members.filter(col("rep") === col("vec_id")).select("vec_id"), Seq("vec_id"), "left_semi")
    repCandidates(repEmb, nbits, bandBits, dim)
  }

  private def repCandidates(repEmb: DataFrame, nbits: Int, bandBits: Int,
                            dim: Int): DataFrame = {
    val bands = nbits / bandBits
    val cand = bandExplode(lshBuckets(repEmb, nbits, dim), bands, bandBits)
    cand.as("a")
      .join(cand.as("b"),
        col("a.band") === col("b.band") && col("a.bb") === col("b.bb") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id1"), col("b.vec_id").as("vec_id2"))
      .distinct()
  }

  /** LSH-bucketed near-dup pairs, exactly verified — the banded-candidate
    * pipeline of text MinHash LSH ([[Dedup.minhashPairs]]), transplanted
    * to embeddings: the `nbits`-bit sign bucket splits into
    * `nbits/bandBits` bands; REPRESENTATIVE vectors ([[vecGroups]] — the
    * dup-group pre-pass, mirrored from the text family) sharing ANY
    * band's sub-bucket become candidates; candidates are verified with
    * exact cosine and filtered at `threshold`, so false positives are
    * impossible and output hash-checks bit-for-bit (the first ANN-shaped
    * near-dup path with a FULL oracle — IVF's trained centroids cannot be
    * mirrored in SQL; this closed-form sketch can). Doc-level pairs
    * re-expand after verification: intra-group pairs at cosine 1.0
    * (identical vectors, nonzero norm), cross-group pairs inheriting
    * their representatives' cosine verbatim.
    *
    * Scale shape: the band join shuffles (band, sub-bucket, vec_id)
    * triples — a few bytes per row, never the vectors — and is bounded by
    * DISTINCT vectors regardless of duplication (spec'd exactly flat at
    * 10×); `distinct` de-duplicates candidates ACROSS bands behind an
    * aggregate barrier before any verify work; the verify fetches vectors
    * by two shuffled equi-joins on vec_id and runs one codegen'd dot per
    * surviving pair. `bandBits` is the precision knob: recall per pair
    * with bit-agreement probability p is `1 − (1 − p^bandBits)^bands`, so
    * wider bands prune harder but miss more borderline pairs — production
    * tunes it to the target similarity exactly as MinHash banding tunes
    * to Jaccard.
    */
  def lshNearDupPairs(embeddings: DataFrame, threshold: Double = 0.4,
                      nbits: Int = 16, bandBits: Int = 4, dim: Int = 64): DataFrame = {
    require(nbits % bandBits == 0, s"nbits=$nbits must split into bandBits=$bandBits bands")
    val members = vecGroups(embeddings)
    val repEmb = embeddings.join(
      members.filter(col("rep") === col("vec_id")).select("vec_id"), Seq("vec_id"), "left_semi")
    val p0 = repCandidates(repEmb, nbits, bandBits, dim)
    val d = prepared(repEmb)
    val repPairs = p0
      .join(d.select(col("vec_id").as("vec_id1"), col("v").as("v1"), col("nrm").as("nrm1")),
        Seq("vec_id1"))
      .join(d.select(col("vec_id").as("vec_id2"), col("v").as("v2"), col("nrm").as("nrm2")),
        Seq("vec_id2"))
      .select(col("vec_id1"), col("vec_id2"),
        (dot(col("v1"), col("v2")) / (col("nrm1") * col("nrm2"))).as("cosine"))
      .filter(col("cosine") >= threshold)
    // re-expansion: identical vectors trivially pair at cosine 1.0 — but
    // ONLY for nonzero-norm groups (a zero vector's cosine is NaN and
    // never passes the threshold today; expansion must not invent pairs
    // the verify would reject)
    val eligible = members.join(
      d.filter(col("nrm") > lit(0.0)).select(col("vec_id").as("rep")), Seq("rep"), "left_semi")
    val intra = eligible.as("a")
      .join(eligible.as("b"),
        col("a.rep") === col("b.rep") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id1"), col("b.vec_id").as("vec_id2"),
        lit(1.0).as("cosine"))
    val cross = repPairs
      .join(members.select(col("rep").as("vec_id1"), col("vec_id").as("m1")), Seq("vec_id1"))
      .join(members.select(col("rep").as("vec_id2"), col("vec_id").as("m2")), Seq("vec_id2"))
      .select(least(col("m1"), col("m2")).as("vec_id1"),
        greatest(col("m1"), col("m2")).as("vec_id2"), col("cosine"))
    intra.unionByName(cross)
      .orderBy("vec_id1", "vec_id2")
  }

  /** Pre-sketched vector signature index for incremental embedding dedup —
    * the [[graft.operators.Dedup.buildDedupIndex]] mirror on the vector
    * side: one row per corpus vector — (vec_id, embedding, rep) — with
    * rep = min vec_id over BITWISE-identical embeddings (exact float
    * equality, no hash-collision class; the [[vecGroups]] rule). Persist
    * once; embedding deltas then dedup against it via [[annDedupDelta]]
    * without the float corpus ever being re-bucketed from scratch per
    * batch — band triples derive from the STORED vectors (a narrow
    * codegen'd projection ∝ |index|, the "ns per row against re-reading"
    * contract), and the exact verify fetches only candidate rows.
    */
  def buildAnnIndex(embeddings: DataFrame): DataFrame = {
    val reps = embeddings.groupBy("embedding").agg(min("vec_id").as("rep"))
    embeddings.select(col("vec_id"), col("embedding"))
      .join(reps, Seq("embedding"))
      .select(col("vec_id"), col("embedding"), col("rep"))
  }

  /** Incremental (delta-vs-corpus) embedding near-dedup: all
    * (corpus_id, delta_id, cosine) duplicate pairs between a new `delta`
    * batch of (vec_id, embedding) rows and a corpus represented ONLY by
    * its [[buildAnnIndex]] signature index — the vector-side
    * [[graft.operators.Dedup.dedupDelta]], and the batch kernel of
    * [[graft.streaming.EmbedDedup]]:
    *
    *  - exact: embedding equi-join (bitwise identity ⇒ cosine 1.0 —
    *    restricted to nonzero-norm rows, the [[lshNearDupPairs]]
    *    eligibility rule: a zero vector is cosine-undefined and is never
    *    paired, it passes through);
    *  - near: delta reps sign-LSH-bucketed fresh with the same
    *    closed-form planes the corpus side derives from its STORED
    *    vectors, band-bucket equi-join for candidates, exact cosine ≥
    *    `threshold` verify behind the aggregate barrier on candidates
    *    only, restricted to differing embeddings (the exact branch owns
    *    equality), then expanded through both sides' duplicate groups.
    *
    * Scale shape: corpus-side cost ∝ |index| (one narrow bucket
    * projection per batch + candidate fetches), delta-side ∝ |batch|;
    * the delta's band triples broadcast (micro-batch-sized); candidate
    * state is bounded by DISTINCT vectors per band bucket (both sides
    * rep-collapsed). Recall: sign-LSH banded, same S-curve class as the
    * batch [[lshNearDupPairs]] whose threshold/band geometry it reuses;
    * verification makes false positives impossible.
    */
  def annDedupDelta(index: DataFrame, delta: DataFrame,
                    threshold: Double = 0.4, nbits: Int = 16,
                    bandBits: Int = 4, dim: Int = 64): DataFrame = {
    require(nbits % bandBits == 0, s"nbits=$nbits must split into bandBits=$bandBits bands")
    // (id, embedding, v, nrm) with zero-norm rows dropped — the
    // cosine-eligibility rule both branches share
    def prep(df: DataFrame, idCol: String): DataFrame =
      df.select(col(idCol), col("embedding"),
          toDoubleVec(col("embedding")).as("v"))
        .withColumn("nrm", l2norm(col("v")))
        .filter(col("nrm") > 0.0)
    val dKeyed = delta.select(col("vec_id").as("delta_id"), col("embedding"))
    val dLive = prep(dKeyed, "delta_id")
    val cLive = prep(index.select(col("vec_id").as("corpus_id"), col("embedding")),
      "corpus_id")
    // exact cross-side matches (bitwise identity ⇒ cosine 1.0)
    val exact = cLive.select(col("corpus_id"), col("embedding"))
      .join(dLive.select(col("delta_id"), col("embedding")), Seq("embedding"))
      .select(col("corpus_id"), col("delta_id")).withColumn("cosine", lit(1.0))
    // near: rep-collapsed band join + exact verify + group expansion
    def bandsOf(live: DataFrame, idCol: String): DataFrame = {
      val w = lshPlaneWeights(nbits, dim)
      val bucket = (0 until nbits).map { i =>
        when(dot(col("v"), typedLit(w(i).toSeq)) > lit(0.0), lit(1L << i))
          .otherwise(lit(0L))
      }.reduce(_ + _)
      bandExplode(
        live.select(col(idCol).as("vec_id"), bucket.as("bucket")),
        nbits / bandBits, bandBits)
    }
    val cMembers = index.select(col("vec_id"), col("rep"))
    val cReps = cLive.join(
      cMembers.filter(col("vec_id") === col("rep"))
        .select(col("vec_id").as("corpus_id")), Seq("corpus_id"), "left_semi")
    val dGroups = dKeyed.groupBy("embedding").agg(min("delta_id").as("rep"))
    val dMembers = dKeyed.join(dGroups, Seq("embedding"))
      .select(col("delta_id"), col("rep"))
    val dReps = dLive.join(
      dMembers.filter(col("delta_id") === col("rep"))
        .select(col("delta_id")), Seq("delta_id"), "left_semi")
    val cands = bandsOf(cReps, "corpus_id")
      .join(broadcast(bandsOf(dReps, "delta_id")
        .select(col("vec_id").as("delta_id"), col("band"), col("bb"))),
        Seq("band", "bb"))
      .select(col("vec_id").as("corpus_id"), col("delta_id"))
      .distinct()
    val repPairs = cands
      .join(cReps.select(col("corpus_id"), col("embedding").as("ce"),
        col("v").as("cv"), col("nrm").as("cnrm")), Seq("corpus_id"))
      .join(broadcast(dReps.select(col("delta_id"), col("embedding").as("de"),
        col("v").as("dv"), col("nrm").as("dnrm"))), Seq("delta_id"))
      .filter(col("ce") =!= col("de")) // the exact branch owns equality
      .select(col("corpus_id"), col("delta_id"),
        (dot(col("cv"), col("dv")) / (col("cnrm") * col("dnrm"))).as("cosine"))
      .filter(col("cosine") >= threshold)
    val near = repPairs
      .join(cMembers.select(col("rep").as("corpus_id"), col("vec_id").as("cm")),
        Seq("corpus_id"))
      .join(dMembers.select(col("rep").as("delta_id"), col("delta_id").as("dm")),
        Seq("delta_id"))
      .select(col("cm").as("corpus_id"), col("dm").as("delta_id"), col("cosine"))
    exact.unionByName(near).orderBy("corpus_id", "delta_id")
  }

  /** LSH-served cosine top-k: per query (vec_id < numQueries), candidates
    * are corpus vectors sharing ANY band sub-bucket with the query, ranked
    * by exact cosine. The serving twin of [[ivfTopKServe]] on the
    * closed-form sketch — and, like [[lshNearDupPairs]], fully
    * oracle-able: no trained state, so the whole probe → candidate →
    * verify → rank pipeline mirrors into SQL and hash-checks (the IVF
    * top-k can only be rows-checked).
    *
    * Scale shape: the probe set is `numQueries × bands` rows — the only
    * broadcast; candidates come from a broadcast hash join on
    * (band, sub-bucket) against the narrow triple stream, de-duplicated
    * across bands behind an aggregate barrier; vectors are fetched by
    * shuffled equi-joins; ranking windows per query over candidate sets
    * (bounded by bucket occupancy, not the corpus).
    */
  def lshTopK(embeddings: DataFrame, numQueries: Int = 5, k: Int = 10,
              nbits: Int = 16, bandBits: Int = 4, dim: Int = 64): DataFrame = {
    val scored = lshScored(embeddings, numQueries, nbits, bandBits, dim)
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** The shared probe → band-candidate → exact-cosine stage of
    * [[lshTopK]] and the hard-negative family: per probe id, every
    * corpus vector sharing ANY band sub-bucket, exactly scored.
    */
  private def lshScored(embeddings: DataFrame, numQueries: Int,
                        nbits: Int, bandBits: Int, dim: Int): DataFrame =
    lshScoredFor(embeddings,
      embeddings.select(col("vec_id").as("query_id"))
        .filter(col("query_id") < numQueries),
      nbits, bandBits, dim)

  /** [[lshScored]] for an ARBITRARY anchor-id frame (one `query_id`
    * column) instead of a corpus-id prefix — the probe set broadcasts
    * as |anchors| × bands rows, candidates stay bounded by bucket
    * occupancy.
    */
  private def lshScoredFor(embeddings: DataFrame, probeIds: DataFrame,
                           nbits: Int, bandBits: Int, dim: Int): DataFrame = {
    require(nbits % bandBits == 0, s"nbits=$nbits must split into bandBits=$bandBits bands")
    val bands = nbits / bandBits
    val cand = bandExplode(lshBuckets(embeddings, nbits, dim), bands, bandBits)
    val probes = cand.join(
        broadcast(probeIds.select(col("query_id").as("vec_id")).distinct()),
        Seq("vec_id"), "left_semi")
      .select(col("vec_id").as("query_id"), col("band"), col("bb"))
    val p0 = cand.join(broadcast(probes), Seq("band", "bb"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    val d = prepared(embeddings)
    p0
      .join(d.select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm")),
        Seq("query_id"))
      .join(d.select(col("vec_id"), col("v"), col("nrm")), Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        (dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cosine"))
  }

  /** HARD-NEGATIVE MINING — the contrastive-training data op (a retrieval
    * or embedding model trains on (anchor, positive, HARD negative)
    * triples, and the hard ones are what move the loss): per anchor
    * query, the top-`k` candidates that are CLOSE but NOT duplicates —
    * cosine strictly below `dupThreshold` (at or above it they are the
    * near-dup/positive band, [[lshNearDupPairs]]'s regime), ranked
    * cosine-descending so the just-below-threshold confusables come
    * first. Mining from the LSH candidate set is the point, not a
    * shortcut: band-sharing vectors ARE the confusable band (a random
    * non-candidate is an EASY negative — useless for training), and the
    * same geometry as the top-k/pair family keeps the op one more rank
    * over the existing scored stage. Zero-norm candidates score NaN and
    * fail the strict `<`, so they are never served as negatives.
    */
  def hardNegatives(embeddings: DataFrame, numQueries: Int = 5, k: Int = 5,
                    dupThreshold: Double = 0.4, nbits: Int = 16,
                    bandBits: Int = 4, dim: Int = 64): DataFrame =
    rankNegatives(lshScored(embeddings, numQueries, nbits, bandBits, dim),
      k, dupThreshold)

  /** [[hardNegatives]] for an arbitrary anchor-id frame — the form
    * [[contrastiveTriples]] mines with (anchors = the near-dup pair
    * members, each of which IS an (anchor, positive) by construction).
    */
  def hardNegativesFor(embeddings: DataFrame, anchors: DataFrame, k: Int = 5,
                       dupThreshold: Double = 0.4, nbits: Int = 16,
                       bandBits: Int = 4, dim: Int = 64): DataFrame =
    rankNegatives(lshScoredFor(embeddings, anchors, nbits, bandBits, dim),
      k, dupThreshold)

  /** [[hardNegatives]] served from a [[persistAnnServe]]-persisted band
    * table — the [[quantizedTopKServeFrom]] discipline applied to the
    * mining endpoint: candidate generation band-joins the narrow
    * persisted (vec_id, band, bb) triples instead of re-sign-hashing the
    * whole corpus per call. The float embeddings are still read — but
    * only to exact-score the bounded candidate set (the one stage whose
    * inputs live nowhere else), so the corpus-wide work drops from
    * 16-plane dot products per vector to a triple-stream hash join.
    * Bit-identical to [[hardNegatives]] when `bands` was built with the
    * same geometry (zero-norm vectors have no band rows there, and would
    * anyway score NaN and fail the strict `<` threshold).
    */
  def hardNegativesServeFrom(embeddings: DataFrame, bands: DataFrame,
                             numQueries: Int = 5, k: Int = 5,
                             dupThreshold: Double = 0.4): DataFrame =
    rankNegatives(lshScoredServeFrom(embeddings, bands, numQueries),
      k, dupThreshold)

  /** [[lshTopK]] served from a persisted band table — same discipline as
    * [[hardNegativesServeFrom]]: the EXACT-cosine top-k endpoint (vs the
    * int8 [[quantizedTopKServeFrom]]) without the per-call corpus
    * re-hash. Bit-identical to [[lshTopK]] under the snapshot's geometry.
    */
  def lshTopKServeFrom(embeddings: DataFrame, bands: DataFrame,
                       numQueries: Int = 5, k: Int = 10): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    lshScoredServeFrom(embeddings, bands, numQueries)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** BITEXT MINING — margin-based mutual top-1 alignment of each
    * non-pivot-language document to a `pivotLang` document in embedding
    * space (the LASER/CCMatrix shape that builds MT training pairs out
    * of comparable corpora): for every non-pivot document, its best
    * pivot-side candidate by cosine; kept iff the match is MUTUAL (the
    * pivot document's own best non-pivot candidate points back) and
    * reported with its margin over the second-best candidate — the
    * translation-vs-topically-similar separator (Artetxe & Schwenk's
    * margin criterion, as the exact difference of two cosines — no
    * division, bit-stable in both engines; 0.0 when only one candidate).
    *
    * Scale shape: candidates come from the sign-LSH band index, NEVER a
    * languages-cross-corpus product — per band bucket the pair fan-out
    * is pivot-occupancy × other-occupancy, the same bounded geometry as
    * [[lshTopK]], but with the whole non-pivot corpus as the probe side
    * (mining is corpus-to-corpus by definition; banding is what keeps it
    * from being corpus²). Both argmax directions are per-document rank
    * windows over candidate lists (partitioned, bounded by bucket
    * occupancy). Zero-norm vectors drop before banding on both sides.
    * With the registry's fingerprint-seeded stub embeddings the
    * alignments are arbitrary-but-deterministic — the derivation
    * (bands → candidates → mutual argmax → margin) is the operator a
    * real encoder inherits unchanged, and it hash-checks end to end.
    */
  def bitextMine(embeddings: DataFrame, documents: DataFrame,
                 pivotLang: String = "en", nbits: Int = 16,
                 bandBits: Int = 4, dim: Int = 64): DataFrame = {
    require(nbits % bandBits == 0, s"nbits=$nbits must split into bandBits=$bandBits bands")
    bitextMineFrom(embeddings,
      bandExplode(lshBuckets(embeddings, nbits, dim), nbits / bandBits, bandBits),
      documents, pivotLang)
  }

  /** [[bitextMine]] over an ALREADY-BANDED (vec_id, band, bb) frame —
    * the serving split that lets the once-per-snapshot mining build
    * ([[persistBitext]]) run off the persisted annserve band triples
    * instead of re-sign-hashing the corpus.
    */
  def bitextMineFrom(embeddings: DataFrame, bands: DataFrame,
                     documents: DataFrame,
                     pivotLang: String = "en"): DataFrame = {
    val live = prepared(embeddings).filter(col("nrm") > 0.0)
      .join(documents.select(col("doc_id").as("vec_id"), col("lang")),
        Seq("vec_id"))
    val banded = bands.select("vec_id", "band", "bb")
      .join(live.select("vec_id", "lang"), Seq("vec_id"))
    val pivot = banded.filter(col("lang") === pivotLang)
      .select(col("band"), col("bb"), col("vec_id").as("en_id"))
    val other = banded.filter(col("lang") =!= pivotLang)
      .select(col("band"), col("bb"), col("vec_id").as("src_id"), col("lang"))
    val cand = other.join(pivot, Seq("band", "bb"))
      .select(col("src_id"), col("lang"), col("en_id")).distinct()
    val sc = cand
      .join(live.select(col("vec_id").as("en_id"), col("v").as("ev"),
        col("nrm").as("en_nrm")), Seq("en_id"))
      .join(live.select(col("vec_id").as("src_id"), col("v").as("ov"),
        col("nrm").as("src_nrm")), Seq("src_id"))
      .select(col("src_id"), col("lang"), col("en_id"),
        (dot(col("ev"), col("ov")) / (col("en_nrm") * col("src_nrm")))
          .as("cosine"))
    val wF = Window.partitionBy("src_id").orderBy(col("cosine").desc, col("en_id"))
    val wR = Window.partitionBy("en_id").orderBy(col("cosine").desc, col("src_id"))
    val fwd = sc.withColumn("rn", row_number().over(wF))
    val best = fwd.filter(col("rn") === 1).drop("rn")
    val second = fwd.filter(col("rn") === 2)
      .select(col("src_id"), col("cosine").as("second_cosine"))
    val rev = sc.withColumn("rn", row_number().over(wR))
      .filter(col("rn") === 1)
      .select(col("src_id").as("r_src"), col("en_id").as("r_en"))
    best
      .join(rev, col("src_id") === col("r_src") && col("en_id") === col("r_en"))
      .join(second, Seq("src_id"), "left")
      .select(col("src_id"), col("lang"), col("en_id"), col("cosine"),
        (col("cosine") - coalesce(col("second_cosine"), lit(0.0))).as("margin"))
      .orderBy("src_id")
  }

  /** Mine once per (documents, embeddings) snapshot pair and commit —
    * the family build behind `q_bitext_pairs` (mining is a batch job by
    * nature: the pair table is training data, not a per-request answer).
    */
  def persistBitext(embeddings: DataFrame, bands: DataFrame,
                    documents: DataFrame, dir: String, stamp: String,
                    pivotLang: String = "en"): Unit = {
    bitextMineFrom(embeddings, bands, documents, pivotLang)
      .write.mode("overwrite").parquet(s"$dir/pairs")
    graft.sources.SnapshotStore.commit(embeddings.sparkSession, dir, stamp)
  }

  /** EMBEDDING QA card — per-dimension health statistics of an embedding
    * column: value range, exact-zero count, and sign balance. A dead
    * dimension (all zeros), a collapsed one (min ≈ max), or a
    * sign-saturated one (n_pos or n_neg ≈ 0) is how a broken encoder
    * export shows up in a 100 TB table, and this card is the one-scan
    * check a pipeline runs before building indexes over the column.
    *
    * Deliberately NO per-dimension mean/variance: those are cross-row
    * float sums whose accumulation order differs between engines (unlike
    * the per-VECTOR left-to-right folds the cosine operators use), so
    * they cannot sit in the hash-checked surface. Every aggregate here
    * is order-insensitive (min/max/counts) — bit-exact on any engine —
    * and all of them fold map-side.
    */
  /** EMBEDDING SIGN-PROFILE DRIFT per source — the semantic-drift axis
    * of the data-quality monitors (the lexical side is
    * [[Corpus.sourceDivergence]]/driftCard; this one watches the
    * EMBEDDING distribution): per source, how far its per-dimension
    * sign profile (share of positive values per dim — a 64-point
    * Bernoulli profile) sits from the corpus's. Sign profile is exactly
    * what sign-LSH buckets on, so a source drifting here is the early
    * warning that band balance, candidate rates, and ANN recall are
    * about to move — the embedding-stack counterpart of a source going
    * lexically off-mix. Output per source: vector count, mean and max
    * per-dim absolute profile difference, and the dimension that moved
    * most (min dim on ties — deterministic).
    *
    * Everything is COUNT-based by design: per-dim cross-row float SUMS
    * (centroids) have engine-dependent accumulation order and are
    * excluded from the hashed surface (the q_embedding_stats rule);
    * sign counts are exact, the profile shares are single double
    * divisions, and the per-source mean folds the 64 |Δ| terms in dim
    * order (sorted fold — the cross-engine sum discipline).
    *
    * Scale shape: the explode is |vectors|·dims rows but aggregates
    * map-side to |sources|·dims; the corpus profile RE-AGGREGATES from
    * the per-source counts (no second pass over vectors — the
    * sourceDivergence discipline); the fold is row-local over dims.
    * Shuffles carry |sources|·dims rows, never vector data.
    */
  def embeddingDrift(embeddings: DataFrame, documents: DataFrame): DataFrame = {
    // join BEFORE the explode (a |vectors|-row equi-join, not a
    // |vectors|·dims one), and checkpoint the |sources|·dims count table
    // once — it feeds the corpus re-aggregation, the diff join, and the
    // argmax, and without the barrier every consumer re-runs the explode
    // (measured 4.6–7.3 s/call at sf0.1 pre-barrier vs ~0.3 s after).
    // DEPLOYMENT CAVEAT (r17 verdict 9): localCheckpoint is not
    // fault-tolerant — an executor loss on a real cluster fails the
    // query instead of recomputing; persist(DISK_ONLY) is the
    // lineage-safe swap at the cost of one extra job.
    val c = embeddings
      .select(col("vec_id"), col("embedding"))
      .join(documents.select(col("doc_id").as("vec_id"), col("source")),
        Seq("vec_id"))
      .select(col("source"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy("source", "dim")
      .agg(count(lit(1)).as("n"),
        sum(when(col("v").cast("double") > 0.0, 1L).otherwise(0L)).as("np"))
      .localCheckpoint(eager = false)
    // every frame below c is |sources|·dims-bounded or smaller, but the
    // checkpoint hides size statistics, so without explicit hints ALL
    // FOUR joins planned as SortMergeJoin (r17 plan audit: 12 Exchange /
    // 11 Sort / 5 SMJ at the registry call site). Broadcast the bounded
    // side of each join (guide §3.1 — estimates are wrong after opaque
    // nodes, hint what you know): corpus is exactly |dims| rows, the
    // perSource slice and argmax are |sources| rows. Plan after: 0 SMJ,
    // no sort anywhere before the final ORDER BY (5 Exchange total).
    val corpus = broadcast(
      c.groupBy("dim").agg(sum("n").as("cn"), sum("np").as("cnp")))
    val diffs = c.join(corpus, Seq("dim"))
      .select(col("source"), col("dim"), col("n"),
        abs(col("np").cast("double") / col("n") -
          col("cnp").cast("double") / col("cn")).as("diff"))
    val perSource = diffs.groupBy("source").agg(
      max(col("n")).as("n_vectors"), // n is constant across a source's dims
      count(lit(1)).as("n_dims"),
      aggregate(array_sort(collect_list(struct(col("dim"), col("diff")))),
        lit(0.0), (acc, x) => acc + x.getField("diff")).as("total_drift"),
      max(col("diff")).as("max_sign_drift"))
    val argmax = diffs
      .join(broadcast(perSource.select(col("source"), col("max_sign_drift"))),
        Seq("source"))
      .filter(col("diff") === col("max_sign_drift"))
      .groupBy("source").agg(min("dim").as("drift_dim"))
    perSource.join(broadcast(argmax), Seq("source"))
      .select(col("source"), col("n_vectors"),
        (col("total_drift") / col("n_dims")).as("mean_sign_drift"),
        col("max_sign_drift"), col("drift_dim").cast("long").as("drift_dim"))
      .orderBy("source")
  }

  def embeddingStats(embeddings: DataFrame): DataFrame =
    embeddings
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("dim").cast("long").as("dim"), col("v").cast("double").as("v"))
      .groupBy("dim")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("v") === 0.0, 1L).otherwise(0L)).as("n_zero"),
        sum(when(col("v") > 0.0, 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("v") < 0.0, 1L).otherwise(0L)).as("n_neg"),
        min(col("v")).as("min_val"),
        max(col("v")).as("max_val"))
      .orderBy("dim")

  /** [[lshScored]] with candidate generation from a persisted
    * (vec_id, band, bb) table: probes are the corpus-id prefix's band
    * rows, candidates band-join the narrow triple stream, and the float
    * embeddings are read only to exact-score the bounded candidate set.
    */
  private def lshScoredServeFrom(embeddings: DataFrame, bands: DataFrame,
                                 numQueries: Int): DataFrame = {
    val probes = bands.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("band"), col("bb"))
    val p0 = bands.join(broadcast(probes), Seq("band", "bb"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    val d = prepared(embeddings)
    p0
      .join(d.select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qnrm")), Seq("query_id"))
      .join(d.select(col("vec_id"), col("v"), col("nrm")), Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        (dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cosine"))
  }

  private def rankNegatives(scored: DataFrame, k: Int,
                            dupThreshold: Double): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vec_id"))
    scored
      .filter(col("cosine") < dupThreshold)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** CONTRASTIVE TRAINING TRIPLES — the finished artifact an embedding
    * model trains on: every verified near-dup pair is an (anchor,
    * positive) in BOTH directions (standard augmentation), and each
    * anchor carries its top-`k` [[hardNegativesFor]] confusables.
    * `pairs` is the persisted verified-pair table (its threshold defines
    * the positive band; `dupThreshold` must match it so positives and
    * negatives partition the candidate space). Output size = 2·|pairs|·k
    * bounded rows — inherent artifact size, not join state.
    */
  def contrastiveTriples(embeddings: DataFrame, pairs: DataFrame, k: Int = 3,
                         dupThreshold: Double = 0.4, nbits: Int = 16,
                         bandBits: Int = 4, dim: Int = 64): DataFrame = {
    val anchPos = pairs
      .select(col("vec_id1").as("anchor_id"), col("vec_id2").as("positive_id"),
        col("cosine").as("pos_cosine"))
      .unionByName(pairs.select(col("vec_id2").as("anchor_id"),
        col("vec_id1").as("positive_id"), col("cosine").as("pos_cosine")))
    val negs = hardNegativesFor(embeddings,
        anchPos.select(col("anchor_id").as("query_id")),
        k, dupThreshold, nbits, bandBits, dim)
      .select(col("query_id").as("anchor_id"), col("vec_id").as("negative_id"),
        col("cosine").as("neg_cosine"), col("rank").cast("long").as("neg_rank"))
    anchPos.join(negs, Seq("anchor_id"))
      .orderBy("anchor_id", "positive_id", "neg_rank")
  }

  // ===== Johnson–Lindenstrauss random projection (embedding compression) =====

  /** The JL projection of a double-vector column to `outDim` coordinates:
    * z_i = sqrt(3/outDim) · ⟨v, h_i⟩ over the SAME closed-form
    * uniform[−1,1] plane family as [[lshPlaneWeights]] (Arriaga–Vempala /
    * Achlioptas "database-friendly" projections: any bounded zero-mean
    * i.i.d. entry distribution carries the JL guarantee — no Gaussian
    * needed, which is what keeps the matrix closed-form and the oracle
    * SQL-mirrorable). The sqrt(3/outDim) factor makes the squared norm
    * UNBIASED: Var of a uniform[−1,1] entry is 1/3, so
    * E‖z‖² = outDim · (3/outDim) · ‖v‖²/3 = ‖v‖². A production
    * deployment swaps in a seeded Gaussian matrix; the plan shape
    * (outDim codegen'd [[graft.functions.VecDot]]s against literal
    * plane arrays, zero shuffle) is identical.
    */
  private def jlCoords(v: Column, outDim: Int, dim: Int): Column = {
    val w = lshPlaneWeights(outDim, dim)
    val s = math.sqrt(3.0 / outDim)
    array((0 until outDim).map(i => dot(v, typedLit(w(i).toSeq)) * lit(s)): _*)
  }

  /** Per-vector JL compression card: original vs projected squared norm
    * and their ratio — the embedding-compression path DISTINCT from
    * [[quantizeEmbeddings]]/PQ: quantization shrinks bits per coordinate,
    * JL shrinks the number of coordinates (64 → `outDim` doubles, a 4×
    * cut at the default) while approximately preserving every pairwise
    * distance within the JL ε ≈ sqrt(8·ln n / outDim). Honest limits,
    * measured and re-measured after the r15 plane-family fix (see
    * [[lshPlaneWeights]] — the OLD sawtooth family's correlated rows
    * capped distance fidelity at EVERY outDim: separating the 0.4-cosine
    * near-dup pairs at 0.9 recall admitted a flat 52–56% of all pairs
    * from outDim 16 through 64, where an i.i.d. Gaussian reaches 18% at
    * outDim 32; the quadratic family now MATCHES the Gaussian reference,
    * 17.7% vs 17.8% measured at outDim 32): at the default outDim = 16
    * over THIS structureless random corpus (all pairwise cosines inside
    * the ε band) top-10 rank order is still NOT preserved — JL-space
    * brute-force recall vs the exact top-10 is near chance (0.06–0.13
    * across SFs) — and threshold-blocking the 0.4-cosine dedup pairs at
    * 0.9 recall still admits 31–36% of all pairs, strictly dominated by
    * the banded sign-LSH front-end (≈23% candidate rate). So no
    * JL-blocked dedup twin ships at this outDim (r14 verdict 6, resolved
    * by measurement): 16 dims serve compression cards and coarse
    * clustering; ANN-grade or blocking-grade fidelity needs outDim ≥ 32
    * (ε shrinks as 1/sqrt(outDim) — and with the fixed planes it now
    * actually does) or a clustered corpus whose neighbor gaps exceed ε.
    * [[jlDistortion]] reports the pairwise-distance band that drives
    * this.
    *
    * r16 follow-up (r15 verdict 5 — the JL-32 BLOCKING twin, measured
    * and NOT shipped): over unit-normalized vectors the IDEAL JL-32
    * distance FILTER strictly dominates the banded sign-LSH front-end —
    * at the bands' own recall (0.56) it admits 3.9% of all pairs vs
    * their ≈23%, and 17.6–20.5% at 0.9 recall (consistent with the r15
    * Gaussian-parity number). But a filter needs the all-pairs distance
    * pass that blocking exists to avoid, and NO equi-join-able grid
    * realization gets near that ROC on this corpus: single-shift grids
    * over JL-32 (4/8/16 bands × 8/4/2 dims, cell = per-dim floor(z/w),
    * w ∈ 0.3–1.2) at best TIE the sign-LSH bands (8 bands × 4 dims,
    * w = 0.3: recall 0.59 @ rate 0.223 at sf0.01 but 0.47 @ 0.228 at
    * sf0.1 — no dominance at matched recall), and E2LSH-style
    * multi-shift unions (2–3 offsets per band) saturate toward rate ≈ 1
    * by w = 0.8 because this structureless corpus's pairwise-distance
    * band is narrower than any workable cell width. Sign-LSH bands stay
    * the shipped blocking front-end; JL-32 remains the compression/
    * filter space. (Measured on the rep sets of sf0.01 and sf0.1,
    * truth = exact 0.4-cosine pairs: 59 and 920.)
    *
    * Scale shape: pure narrow projection (`outDim` codegen'd dots per
    * row, zero shuffle, zero training, zero broadcast state) — compression
    * of a 100 TB embedding store is one read-transform-write pass at scan
    * speed. Zero vectors are excluded on both sides (no norm to preserve).
    */
  def jlProject(embeddings: DataFrame, outDim: Int = 16, dim: Int = 64): DataFrame = {
    val p = prepared(embeddings)
    val z = jlCoords(col("v"), outDim, dim)
    p.filter(dot(col("v"), col("v")) > lit(0.0))
      .select(col("vec_id"),
        dot(col("v"), col("v")).as("orig_sq_norm"),
        dot(z, z).as("proj_sq_norm"),
        (dot(z, z) / dot(col("v"), col("v"))).as("norm_ratio"))
      .orderBy("vec_id")
  }

  /** One-row JL distance-distortion witness over a CONSTANT eval budget
    * (all pairs among `vec_id < sample` — a fixed pair count, never a
    * corpus fraction; the [[graft.operators.Multimodal]] round-13 lesson
    * baked in from birth): for each sample pair, the ratio
    * ‖z_a − z_b‖² / ‖v_a − v_b‖², reported as min / avg / max plus how
    * many pairs sit inside the ±`eps` JL band. This is the measured
    * counterpart of the JL lemma's (1±ε) guarantee — the card a pipeline
    * checks before switching its ANN stage onto the compressed vectors.
    *
    * The average folds over a SORTED ratio list (sort_array ∘
    * collect_list, the registry's sorted-fold double-sum discipline) so
    * partition order can never move a bit. Everything is sample²-bounded:
    * the join is a broadcast of `sample` rows against itself.
    */
  def jlDistortion(embeddings: DataFrame, sample: Int = 32, outDim: Int = 16,
                   dim: Int = 64, eps: Double = 0.5): DataFrame = {
    val q = prepared(embeddings).filter(col("vec_id") < sample)
      .select(col("vec_id"), col("v"), jlCoords(col("v"), outDim, dim).as("z"))
    val a = q.select(col("vec_id").as("id1"), col("v").as("v1"), col("z").as("z1"))
    val b = q.select(col("vec_id").as("id2"), col("v").as("v2"), col("z").as("z2"))
    val ratios = a.join(broadcast(b), col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        zip_with(col("v1"), col("v2"), (x, y) => x - y).as("dv"),
        zip_with(col("z1"), col("z2"), (x, y) => x - y).as("dz"))
      .select(col("id1"), col("id2"),
        dot(col("dv"), col("dv")).as("d2"), dot(col("dz"), col("dz")).as("p2"))
      .filter(col("d2") > lit(0.0))
      .select((col("p2") / col("d2")).as("ratio"))
    ratios.agg(
        count(lit(1)).as("n_pairs"),
        min(col("ratio")).as("min_ratio"),
        max(col("ratio")).as("max_ratio"),
        aggregate(sort_array(collect_list(col("ratio"))), lit(0.0),
          (acc, x) => acc + x).as("ratio_sum"),
        sum((abs(col("ratio") - lit(1.0)) <= lit(eps)).cast("long")).as("n_within"))
      .select(col("n_pairs"), col("min_ratio"), col("max_ratio"),
        (col("ratio_sum") / col("n_pairs").cast("double")).as("avg_ratio"),
        col("n_within"))
  }

  object Sql {
    val prepared: String =
      "SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings"
    def dot(a: String, b: String): String =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"list_transform(list_zip($a, $b), p -> p[1] * p[2])), (acc, x) -> acc + x)"
    def cosine(a: String, b: String): String =
      s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"
    /** int8 codes per vector, mirroring [[quantizeEmbeddings]] exactly:
      * same max|x| reduction, same `floor(y + 0.5)` rounding, same clamp.
      */
    private val unitized: String =
      s"SELECT vec_id, list_transform(v, x -> x / nrm) AS u FROM " +
        s"(SELECT vec_id, v, sqrt(${dot("v", "v")}) AS nrm FROM ($prepared) dp) dn"
    val quantized: String =
      s"SELECT vec_id, list_transform(u, x -> CAST(greatest(-127, least(127, " +
        s"floor(x * 127.0 / m + 0.5))) AS BIGINT)) AS codes " +
        s"FROM ($unitized) d CROSS JOIN " +
        s"(SELECT max(list_max(list_transform(u, y -> abs(y)))) AS m FROM ($unitized) dm) mm"
    def intDot(a: String, b: String): String =
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform(list_zip($a, $b), p -> p[1] * p[2])), (acc, x) -> acc + x)"
    /** The [[lshPlaneWeights]] entry w(i,j) as DuckDB SQL over loop
      * variables `i`/`j` (both BIGINT from range()) — the quadratic
      * decorrelated family, shared by [[jlCoord]] and [[lshBucket]] so
      * the mirrors can never drift from each other.
      */
    private def planeSql(dim: Int): String = {
      val k = s"(i*$dim + j)"
      s"(CAST((($k*$k % 1000003) * 40503 + $k*2654435761) % 1000003 " +
        "AS DOUBLE) / 500001.5 - 1.0)"
    }

    /** The RETIRED linear family's w(i,j) — mirrors
      * [[lshPlaneWeightsLinearV1]] exactly; referenced ONLY by the
      * plane-migration card's oracle (r15 verdict 8).
      */
    private val planeSqlLinearV1: String =
      "(CAST((i*2654435761 + j*40503) % 1000003 AS DOUBLE) / 500001.5 - 1.0)"

    /** Sign-LSH bucket under the RETIRED linear plane family — the
      * migration card's comparison arm, same fold/bit-test shape as
      * [[lshBucket]].
      */
    def lshBucketLinearV1(v: String, nbits: Int = 16, dim: Int = 64): String =
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform(range(0, $nbits), i -> " +
        s"CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"list_transform(range(0, $dim), j -> " +
        s"$planeSqlLinearV1 * $v[j+1])), " +
        s"(a, x) -> a + x) > 0 THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END)), " +
        s"(a, x) -> a + x)"

    /** JL coordinates of a double-list column `v`, mirroring
      * [[jlProject]] bit-for-bit: identical integer plane formula (the
      * [[lshBucket]] family), identical left-fold dot order, identical
      * sqrt(3/outDim) scale (IEEE sqrt and multiply are exact-identical
      * on identical operands; a·b ≡ b·a in IEEE).
      */
    def jlCoord(v: String, outDim: Int = 16, dim: Int = 64): String =
      s"list_transform(range(0, $outDim), i -> " +
        s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"list_transform(range(0, $dim), j -> " +
        s"${planeSql(dim)} * $v[j+1])), " +
        s"(a, x) -> a + x) * sqrt(3.0 / $outDim.0))"

    /** Sign-LSH bucket of a double-list column `v`, mirroring
      * [[lshBuckets]] bit-for-bit: identical integer plane formula,
      * identical left-fold dot order, identical `> 0` bit test.
      */
    def lshBucket(v: String, nbits: Int = 16, dim: Int = 64): String =
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform(range(0, $nbits), i -> " +
        s"CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"list_transform(range(0, $dim), j -> " +
        s"${planeSql(dim)} * $v[j+1])), " +
        s"(a, x) -> a + x) > 0 THEN CAST(1 AS BIGINT) << i ELSE CAST(0 AS BIGINT) END)), " +
        s"(a, x) -> a + x)"
  }
}
