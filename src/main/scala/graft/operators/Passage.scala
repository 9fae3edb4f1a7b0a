package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** CHUNK-LEVEL PASSAGE RETRIEVAL — the RAG data shape (round-12 verdict
  * next-round 3): chunk → embed → index → serve a per-query passage top-k
  * with a max-passages-per-document diversity cap. This is the composition
  * a retrieval-training corpus actually ships: not "which DOCUMENT is
  * nearest" (the `q_lsh_topk` family) but "which PASSAGES answer this
  * query", where a single long document must not monopolize the context
  * window — hence the diversity cap, the one genuinely new ranking clause.
  *
  * Every ingredient is an existing, already-verified operator re-used at
  * chunk granularity:
  *  - chunking is [[Corpus.chunkDocuments]] (token windows with overlap,
  *    oracle-green as `q_chunk_documents`);
  *  - the passage encoder is the closed-form TEXT tower of
  *    [[Multimodal.textEmbedStub]] applied to `chunk_text` — same
  *    fingerprint-seeded formula, same (2d+3, 65599) mixing constants, so
  *    a one-chunk document embeds identically at document and chunk
  *    granularity (spec-pinned). A real deployment swaps the tower kernel;
  *    the chunk-id plumbing, index shape and ranking are the real operator.
  *  - the index is the sign-LSH band table of [[Similarity.lshBuckets]] on
  *    the chunk vectors (closed-form planes — no training, fully
  *    oracle-able, unlike the Lloyd-trained IVF);
  *  - candidate → exact-cosine verify → rank is the
  *    [[Similarity.lshTopKServeFrom]] discipline with the diversity window
  *    inserted between verify and the global rank.
  *
  * Chunk identity: `pid = doc_id·2²⁰ + chunk_id` — one BIGINT key the band
  * table and the oracle both derive by exact integer arithmetic.
  * `chunk_id < 2²⁰` is enforced with a row-local raise (a 2²⁰-chunk
  * document is ≈ 25 M tokens at the default stride — far past any training
  * document; silent pid aliasing would corrupt the index, so overflowing
  * rows fail loudly instead). `doc_id < 2⁴³` (no overflow of the product)
  * is a documented contract of the id space.
  *
  * Scale shape: chunking + embedding is one narrow pass over the corpus
  * (bounded explode, rows ∝ corpus tokens / stride); bucketing is
  * codegen'd dot products against literal plane arrays (zero shuffle);
  * construction runs ONCE per corpus snapshot ([[persistPassage]], the
  * snapshot-store discipline) and the registry serves the persisted
  * default answer as one scan. The serving path never scans text — only
  * the narrow (pid, band, bb) triples and the bounded candidate set's
  * vectors. Band geometry (nbits/bandBits) tunes the candidate rate
  * exactly as in the document-level family.
  *
  * Reference scope note: the reference pipeline (consumer/producer Java,
  * BASELINE.md) has no retrieval surface — this module is north-star
  * extension surface for LLM-training data prep.
  */
object Passage {

  /** Bits reserved for `chunk_id` inside the composite passage id. */
  val ChunkIdBits = 20
  private val ChunkIdCap = 1L << ChunkIdBits

  /** Chunk the corpus and embed every chunk with the closed-form text
    * tower: (pid, doc_id, chunk_id, embedding[dims]). Pure narrow
    * projection over [[Corpus.chunkDocuments]]'s bounded explode.
    */
  def chunkVectors(documents: DataFrame, maxTokens: Int = 32,
                   overlap: Int = 8, dims: Int = 16): DataFrame = {
    // loud failure beats silent pid aliasing: a chunk_id at/over the cap
    // would collide with the next doc_id's chunk 0
    val cid = when(col("chunk_id") < lit(ChunkIdCap), col("chunk_id"))
      .otherwise(raise_error(concat(lit("chunk_id overflows the pid field: "),
        col("chunk_id").cast("string"))).cast("long"))
    Corpus.chunkDocuments(documents, maxTokens, overlap)
      .select(
        (col("doc_id") * lit(ChunkIdCap) + cid).as("pid"),
        col("doc_id"), col("chunk_id"), col("n_tokens"),
        towerOf(col("chunk_text"), dims).as("embedding"))
  }

  /** Sign-LSH bucket of the double-vector column `v` at the chunk
    * embedding's dimensionality — the [[Similarity.lshBuckets]] formula
    * shared by index build and query probing (an incoming query must be
    * bucketed with the SAME planes the index was built from).
    */
  private def bucketOf(nbits: Int, dims: Int): org.apache.spark.sql.Column = {
    val w = Similarity.lshPlaneWeights(nbits, dims)
    (0 until nbits).map { i =>
      when(dot(col("v"), typedLit(w(i).toSeq)) > lit(0.0), lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** The closed-form text tower over a string column — one chunk's
    * embedding (the [[Multimodal.textEmbedStub]] formula, shared by the
    * index build and the query endpoint).
    */
  private def towerOf(text: org.apache.spark.sql.Column,
                      dims: Int): org.apache.spark.sql.Column = {
    val fp = TextAnalysis.fingerprintCol(text)
    transform(sequence(lit(0), lit(dims - 1)), d =>
      ((fp * (d.cast("long") * 2L + 3L) + d.cast("long") * 65599L)
        % 2000001L).cast("double") / 1000000.0 - 1.0)
  }

  /** Sign-LSH band triples (pid, band, bb) over the chunk vectors — the
    * passage index. Same closed-form planes as the document-level family
    * ([[Similarity.lshPlaneWeights]]), instantiated at the chunk
    * embedding's dimensionality.
    */
  def chunkBands(vectors: DataFrame, nbits: Int = 16, bandBits: Int = 4,
                 dims: Int = 16): DataFrame = {
    require(nbits % bandBits == 0, s"nbits=$nbits must split into bandBits=$bandBits bands")
    Similarity.bandExplode(
      vectors.select(col("pid").as("vec_id"), toDoubleVec(col("embedding")).as("v"))
        .select(col("vec_id"), bucketOf(nbits, dims).as("bucket")),
      nbits / bandBits, bandBits)
      .select(col("vec_id").as("pid"), col("band"), col("bb"))
  }

  /** Passage retrieval for an ARBITRARY request frame — the
    * serving-endpoint form of [[passageTopKServeFrom]] (the
    * `q_pq_query_serve`/`keywordSearchForQueries` discipline): `queries`
    * is any (query_id, query_text) frame — a REST batch, a micro-batch of
    * a query stream. The query string is tower-embedded as ONE chunk
    * (retrieval queries are short by construction; a long query would be
    * truncated by a real encoder the same way), bucketed with the index's
    * frozen planes, and candidates/cosine/diversity-cap/rank proceed
    * exactly as the registry path. Request ids are an EXTERNAL namespace:
    * no own-document exclusion exists (an external query has no own
    * document), so feeding a corpus chunk's text under any id retrieves
    * that chunk itself at cosine 1 — the bit-parity spec pins that
    * in-corpus requests reproduce the registry path minus its own-doc
    * filter. Zero-norm query vectors are unanswerable under cosine and
    * drop, never served NaN.
    */
  def passageTopKForQueries(vectors: DataFrame, bands: DataFrame,
                            queries: DataFrame, k: Int = 10,
                            maxPerDoc: Int = 2, dims: Int = 16,
                            nbits: Int = 16, bandBits: Int = 4): DataFrame = {
    val qv = queries
      .select(col("query_id"), toDoubleVec(towerOf(col("query_text"), dims)).as("v"))
      .withColumn("qnrm", l2norm(col("v")))
      .filter(col("qnrm") > 0.0)
      .select(col("query_id"), col("v").as("qv"), col("qnrm"))
    val probes = Similarity.bandExplode(
        qv.select(col("query_id").as("vec_id"), col("qv").as("v"))
          .select(col("vec_id"), bucketOf(nbits, dims).as("bucket")),
        nbits / bandBits, bandBits)
      .select(col("vec_id").as("query_id"), col("band"), col("bb"))
    val p0 = bands.join(broadcast(probes), Seq("band", "bb"))
      .select(col("query_id"), col("pid"))
      .distinct()
    val v = vectors.select(col("pid"), col("doc_id"), col("chunk_id"),
        toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", l2norm(col("v")))
      .filter(col("nrm") > 0.0)
    // candidate-vector fetch (r18): p0 is bounded by probe-bucket
    // occupancy, but the planner's estimate is unbounded, so the fetch
    // planned as a SortMergeJoin shuffling the WHOLE chunk-vector table
    // (the r18 heavy-tier plan audit). Count-gated broadcast
    // ([[Adaptive.broadcastGate]]): under the cap the vector table is
    // scanned once and never exchanged; a degenerate band geometry
    // falls back to the shuffle join.
    val scored = Adaptive.broadcastGate(p0, boundedBy = bands)
      .join(v, Seq("pid"))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("pid"), col("doc_id"), col("chunk_id"),
        (dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cosine"))
    val perDoc = Window.partitionBy("query_id", "doc_id")
      .orderBy(col("cosine").desc, col("pid"))
    val overall = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("doc_id"), col("chunk_id"))
    scored
      .withColumn("rn_doc", row_number().over(perDoc))
      .filter(col("rn_doc") <= maxPerDoc)
      .withColumn("rank", row_number().over(overall).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "chunk_id", "cosine", "rank")
      .orderBy("query_id", "rank")
  }

  /** Passage top-k with a diversity cap, served from persisted chunk
    * vectors + band triples: for each query document (`doc_id <
    * numQueries`), the query vector is its FIRST chunk's embedding
    * (chunkDocuments guarantees every document at least one chunk);
    * candidates band-join the triple table, own-document passages are
    * excluded (a query must retrieve from OTHER documents — the retrieval
    * shape, and it also drops the query pid's trivial self-match), exact
    * cosine verifies the bounded candidate set, and ranking applies TWO
    * windows: at most `maxPerDoc` passages per (query, document) — the
    * context-window diversity cap — then the global per-query top-k.
    * Zero-norm vectors are unanswerable under cosine and drop on both the
    * query and candidate side (the hybrid-search guard).
    *
    * Both windows are rank-limit shapes (row_number ≤ constant) that
    * compile to WindowGroupLimit — map-side group limits below the
    * exchange, so the scored stream never shuffles more than the
    * per-partition limit. Ties break deterministically: per-doc by pid,
    * globally by (doc_id, chunk_id) — bit-stable across engines.
    */
  def passageTopKServeFrom(vectors: DataFrame, bands: DataFrame,
                           numQueries: Int = 5, k: Int = 10,
                           maxPerDoc: Int = 2): DataFrame = {
    val v = vectors.select(col("pid"), col("doc_id"), col("chunk_id"),
        toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", l2norm(col("v")))
    val qv = v.filter(col("doc_id") < numQueries && col("chunk_id") === 0 &&
        col("nrm") > 0.0)
      .select(col("doc_id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    // query probes straight off the persisted triples: chunk 0 of doc q is
    // pid = q·2^20 exactly, so the filter is pure integer arithmetic
    val probes = bands
      .filter(col("pid").bitwiseAND(lit(ChunkIdCap - 1)) === 0L &&
        col("pid") < lit(numQueries * ChunkIdCap))
      .select(shiftrightunsigned(col("pid"), ChunkIdBits).as("query_id"),
        col("band"), col("bb"))
    val p0 = bands.join(broadcast(probes), Seq("band", "bb"))
      .filter(shiftrightunsigned(col("pid"), ChunkIdBits) =!= col("query_id"))
      .select(col("query_id"), col("pid"))
      .distinct()
    // count-gated broadcast for the candidate-vector fetch — same
    // rationale as [[passageTopKForQueries]] (r18)
    val scored = Adaptive.broadcastGate(p0, boundedBy = bands)
      .join(v.filter(col("nrm") > 0.0), Seq("pid"))
      .join(broadcast(qv), Seq("query_id"))
      .select(col("query_id"), col("pid"), col("doc_id"), col("chunk_id"),
        (dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cosine"))
    val perDoc = Window.partitionBy("query_id", "doc_id")
      .orderBy(col("cosine").desc, col("pid"))
    val overall = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("doc_id"), col("chunk_id"))
    scored
      .withColumn("rn_doc", row_number().over(perDoc))
      .filter(col("rn_doc") <= maxPerDoc)
      .withColumn("rank", row_number().over(overall).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "chunk_id", "cosine", "rank")
      .orderBy("query_id", "rank")
  }

  /** LATE-INTERACTION document ranking (ColBERT's MaxSim, banded): a
    * query DOCUMENT is its bag of chunk vectors, a candidate document
    * scores Σ over query chunks of max over its own chunks of the
    * chunk-pair cosine — fine-grained interaction a single pooled vector
    * can't express (the passage family's vectors double as the
    * token-level multi-vector index). Candidate chunk pairs come from
    * the band index; a pair that collides in no band contributes 0 to
    * its max — the standard production lower bound (ColBERT serving
    * generates candidates by ANN over token vectors exactly like this;
    * only colliding pairs are exact-scored).
    *
    * Engine-exactness: max() is order-insensitive; the per-document sum
    * folds in SORTED query-chunk order via aggregate() over a sorted
    * struct array (the keywordSearch fold discipline), so the MaxSim
    * double is bit-identical on any engine.
    */
  def lateInteractionTopK(vectors: DataFrame, bands: DataFrame,
                          numQueries: Int = 5, k: Int = 10): DataFrame = {
    val v = vectors.select(col("pid"), col("doc_id"), col("chunk_id"),
        toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", l2norm(col("v")))
      .filter(col("nrm") > 0.0)
    val qchunks = v.filter(col("doc_id") < numQueries)
      .select(col("doc_id").as("query_id"), col("pid").as("qpid"),
        col("v").as("qv"), col("nrm").as("qnrm"))
    val probes = bands
      .filter(shiftrightunsigned(col("pid"), ChunkIdBits) < numQueries)
      .select(shiftrightunsigned(col("pid"), ChunkIdBits).as("query_id"),
        col("pid").as("qpid"), col("band"), col("bb"))
    val p0 = bands.join(broadcast(probes), Seq("band", "bb"))
      .filter(shiftrightunsigned(col("pid"), ChunkIdBits) =!= col("query_id"))
      .select(col("query_id"), col("qpid"), col("pid"))
      .distinct()
    val perPair = p0
      .join(v, Seq("pid"))
      .join(broadcast(qchunks), Seq("query_id", "qpid"))
      .select(col("query_id"), col("qpid"), col("doc_id"),
        (dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cosine"))
      .groupBy("query_id", "qpid", "doc_id")
      .agg(max(col("cosine")).as("maxsim"))
    val rw = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    perPair
      .groupBy("query_id", "doc_id")
      .agg(
        aggregate(array_sort(collect_list(struct(col("qpid"), col("maxsim")))),
          lit(0.0), (acc, x) => acc + x.getField("maxsim")).as("score"),
        count(lit(1)).as("n_qchunks_matched"))
      .withColumn("rank", row_number().over(rw).cast("long"))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** RETRIEVAL-DISTILLATION pairs — the training-data artifact a
    * retriever-distillation run ships (the ColBERTv2 recipe, public):
    * for every (query, candidate-document) pair the STUDENT retriever
    * surfaced (the single-vector passage top-k — cheap, index-served),
    * the TEACHER's full MaxSim score over ALL chunk pairs of the two
    * documents, plus both rankings. The student trains on the teacher's
    * ordering of its own candidate list — which is why the artifact
    * carries both scores and both ranks, not just labels: the
    * disagreement rows ARE the training signal.
    *
    * Scale shape: the teacher is the expensive exact scorer, but it only
    * runs on the candidate slate (queries × ≤ k docs — slate-bounded,
    * never corpus-bounded); query chunks ride one broadcast, candidate
    * chunks arrive by one narrow equi-join on doc_id, and the per-pair
    * MaxSim folds in sorted query-chunk order so the double hash-checks
    * (the [[lateInteractionTopK]] determinism discipline). Unlike that
    * ranking, the teacher here is NOT band-limited: a distillation
    * target must score the full interaction, or the student just
    * re-learns the index's blind spots.
    *
    * `student_rank` re-ranks the slate by the student's own evidence
    * (best-passage rank from the top-k, already unique per query);
    * `teacher_rank` orders by MaxSim. Both windows are per-query over
    * ≤ k rows.
    */
  def distillPairs(vectors: DataFrame, topk: DataFrame): DataFrame = {
    val cands = topk.groupBy("query_id", "doc_id")
      .agg(max(col("cosine")).as("student_score"),
        min(col("rank")).as("best_rank"))
    val v = vectors.select(col("pid"), col("doc_id"), col("chunk_id"),
        toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", l2norm(col("v")))
      .filter(col("nrm") > 0.0)
    val qchunks = v.join(cands.select(col("query_id")).distinct(),
        col("doc_id") === col("query_id"))
      .select(col("query_id"), col("pid").as("qpid"),
        col("v").as("qv"), col("nrm").as("qnrm"))
    val teacher = cands.select("query_id", "doc_id")
      .join(v, Seq("doc_id"))
      .join(broadcast(qchunks), Seq("query_id"))
      .select(col("query_id"), col("doc_id"), col("qpid"),
        (dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cosine"))
      .groupBy("query_id", "doc_id", "qpid")
      .agg(max(col("cosine")).as("maxsim"))
      .groupBy("query_id", "doc_id")
      .agg(aggregate(array_sort(collect_list(struct(col("qpid"), col("maxsim")))),
        lit(0.0), (acc, x) => acc + x.getField("maxsim")).as("teacher_score"))
    val sw = Window.partitionBy("query_id").orderBy(col("best_rank"))
    val tw = Window.partitionBy("query_id")
      .orderBy(col("teacher_score").desc, col("doc_id"))
    cands.join(teacher, Seq("query_id", "doc_id"))
      .withColumn("student_rank", row_number().over(sw).cast("long"))
      .withColumn("teacher_rank", row_number().over(tw).cast("long"))
      .select("query_id", "doc_id", "student_score", "student_rank",
        "teacher_score", "teacher_rank")
      .orderBy("query_id", "teacher_rank")
  }

  /** EXACT brute-force diversity-capped passage top-k — the validation
    * baseline of the band-indexed path ([[Similarity.bruteForceTopK]]'s
    * role on the chunk side): same query set, same own-doc exclusion,
    * same two rank windows, but candidates are ALL chunks instead of
    * band colliders. O(queries · chunks) compute over a bounded query
    * broadcast — the recall witness's reference, never the serving path.
    */
  def passageBruteTopK(vectors: DataFrame, numQueries: Int = 5, k: Int = 10,
                       maxPerDoc: Int = 2): DataFrame = {
    val v = vectors.select(col("pid"), col("doc_id"), col("chunk_id"),
        toDoubleVec(col("embedding")).as("v"))
      .withColumn("nrm", l2norm(col("v")))
      .filter(col("nrm") > 0.0)
    val qv = v.filter(col("doc_id") < numQueries && col("chunk_id") === 0)
      .select(col("doc_id").as("query_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val scored = v
      .join(broadcast(qv), col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("pid"), col("doc_id"), col("chunk_id"),
        (dot(col("qv"), col("v")) / (col("qnrm") * col("nrm"))).as("cosine"))
    val perDoc = Window.partitionBy("query_id", "doc_id")
      .orderBy(col("cosine").desc, col("pid"))
    val overall = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("doc_id"), col("chunk_id"))
    scored
      .withColumn("rn_doc", row_number().over(perDoc))
      .filter(col("rn_doc") <= maxPerDoc)
      .withColumn("rank", row_number().over(overall).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "chunk_id", "cosine", "rank")
      .orderBy("query_id", "rank")
  }

  /** MEASURED-RECALL witness of the band-indexed passage path against
    * the exact baseline — aggregate across the query set (per-query
    * recall on a near-random stub corpus is high-variance: a query whose
    * exact top-10 sits just under the band-collision floor can
    * legitimately recall 0.3 while the set-wide rate stays ≥ 0.7).
    * Unlike the IVF/PQ witnesses this one emits the REAL n_found and
    * recall columns, not just the flag: both sides are closed-form, so
    * DuckDB re-derives the entire row and the hash check pins the exact
    * recall value at every SF — any banding edit that loses a passage
    * moves a hashed number, not merely a bit.
    */
  def recallBound(approx: DataFrame, exact: DataFrame,
                  bound: Double = 0.6): DataFrame = {
    val marked = exact.select(col("query_id"), col("doc_id"), col("chunk_id"))
      .join(approx.select(col("query_id"), col("doc_id"), col("chunk_id"))
          .withColumn("hit", lit(1L)),
        Seq("query_id", "doc_id", "chunk_id"), "left")
    marked
      .agg(count(lit(1)).as("n_exact"),
        coalesce(sum(coalesce(col("hit"), lit(0L))), lit(0L)).as("n_found"))
      .select(col("n_exact"), col("n_found"),
        // empty query set ⇒ vacuously-met contract, matching the oracle's
        // CASE instead of going NULL-red with no defect (the
        // ivfRecallBound discipline)
        when(col("n_exact") === 0, lit(1.0))
          .otherwise(col("n_found").cast("double") / col("n_exact")).as("recall"),
        lit(bound).as("recall_bound"),
        (col("n_found").cast("double") >= col("n_exact") * lit(bound))
          .cast("int").as("within_bound"))
  }

  /** MEAN-RECIPROCAL-RANK card of the served passage list against the
    * exact baseline — the rank-POSITION-sensitive retrieval metric the
    * set-overlap [[recallBound]] cannot express: a served list that
    * buries the true nearest chunk at rank 10 recalls it (set hit) yet
    * serves it badly (rr 0.1). Ground truth per query is the exact
    * brute-force top-1 chunk; its reciprocal served rank (0 when the
    * banding missed it entirely) averages over the query set via the
    * sorted-fold double-sum discipline. Both sides are closed-form, so
    * the whole card — n_found AND the mrr value — hash-checks against
    * the SQL re-derivation at every SF (the [[recallBound]] precedent).
    *
    * Scale shape: two k-bounded rank lists (queries × k rows each) join
    * on their id triple — constant work once the lists exist; the lists
    * come from the persisted snapshot and the numQueries-bounded exact
    * pass that every witness already pays.
    */
  def mrrCard(approx: DataFrame, exact: DataFrame): DataFrame = {
    val top1 = exact.filter(col("rank") === 1)
      .select(col("query_id"), col("doc_id"), col("chunk_id"))
    val hit = top1.join(
        approx.select(col("query_id"), col("doc_id"), col("chunk_id"),
          col("rank").as("served_rank")),
        Seq("query_id", "doc_id", "chunk_id"), "left")
      .select(coalesce(lit(1.0) / col("served_rank").cast("double"), lit(0.0))
        .as("rr"))
    hit.agg(count(lit(1)).as("n_queries"),
        sum((col("rr") > 0.0).cast("long")).as("n_found_top1"),
        aggregate(sort_array(collect_list(col("rr"))), lit(0.0),
          (a, x) => a + x).as("rr_sum"))
      .select(col("n_queries"), col("n_found_top1"),
        when(col("n_queries") === 0, lit(1.0))
          .otherwise(col("rr_sum") / col("n_queries").cast("double")).as("mrr"))
  }

  /** The per-rank nDCG discount weights 1/log2(rank+1), rank = 1..k —
    * computed ONCE here and embedded as LITERALS on both engines (the
    * Spark plan carries the array literal; the generated oracle prints
    * each double via `Double.toString`, whose shortest-round-trip decimal
    * DuckDB parses back to the identical bits), so the two sides can
    * never diverge on a transcendental: no engine evaluates log at query
    * time.
    */
  def ndcgDiscounts(k: Int): Seq[Double] =
    (1 to k).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))

  /** nDCG@k retrieval-quality card — the rank-WEIGHTED companion of
    * [[mrrCard]] (MRR sees only the exact top-1's served position;
    * nDCG grades the WHOLE served list): relevance of an exact-top-k
    * chunk is `k + 1 − exact_rank` (graded by the exact ranking, 10
    * down to 1 at the default — chunks outside the exact top-k gain 0),
    * DCG discounts each served position by [[ndcgDiscounts]], and IDCG
    * is the exact list's own DCG (the ideal ordering by construction),
    * so `ndcg = dcg / idcg ∈ [0, 1]` per query. Per-query sums fold
    * over SORTED ≤k-element lists (the registry's sorted-fold
    * discipline) so partitioning can never move a bit, and every
    * product is (integer-valued double) × (shared literal) — IEEE
    * identical on both engines.
    *
    * Scale shape: [[mrrCard]]'s — two k-bounded rank lists join on
    * their id triple; constant work past the persisted snapshot and the
    * numQueries-bounded exact pass every witness already pays.
    *
    * PRECONDITION (r17 ADVICE): `(query_id, doc_id, chunk_id)` must be
    * UNIQUE within each input — true of any rank list (row_number
    * assigns one rank per key) and of every registry caller. The one-
    * pass full-outer merge below relies on it: a duplicated key in
    * `approx` would replicate its matching exact row and inflate idcg,
    * where the old two-branch shape computed idcg from the exact list
    * alone. A non-ranking caller feeding unkeyed lists must dedup first.
    */
  def ndcgCard(approx: DataFrame, exact: DataFrame, k: Int = 10): DataFrame = {
    val discArr = typedLit(ndcgDiscounts(k))
    // ONE full-outer merge of the two k-bounded lists, then ONE
    // aggregate computing idcg and dcg side by side (r17): the previous
    // idcg-aggregate + dcg-join + final-stitch shape referenced the
    // exact list twice, so the O(queries·chunks) brute-force pass
    // upstream ran once per branch (the r17 plan audit caught the
    // subtree twice in q_passage_ndcg's plan; a localCheckpoint barrier
    // fixed the double pass but its extra job cost MORE at bench scale —
    // measured 0.95 → 1.31 s — so the merge, not a barrier, is the fix).
    // Element multisets are unchanged: collect_list skips nulls, so the
    // idcg fold sees exactly the exact-side rows (ideal_disc is null on
    // served-only rows) and the dcg fold sees exactly the served rows
    // (disc is null on exact-only rows, and unmatched served rows
    // contribute the same 0.0 the old left join's coalesce produced);
    // sorted folds then add identical doubles in identical order. The
    // n_rel > 0 filter reproduces the old output domain (queries present
    // in the exact list).
    val rel = exact.select(col("query_id"), col("doc_id"), col("chunk_id"),
      (lit(k + 1L) - col("rank")).cast("double").as("rel"),
      element_at(discArr, col("rank").cast("int")).as("ideal_disc"))
    val served = approx.select(col("query_id"), col("doc_id"), col("chunk_id"),
      element_at(discArr, col("rank").cast("int")).as("disc"))
    rel.join(served, Seq("query_id", "doc_id", "chunk_id"), "full_outer")
      .groupBy("query_id").agg(
        aggregate(sort_array(collect_list(col("rel") * col("ideal_disc"))),
          lit(0.0), (a, x) => a + x).as("idcg"),
        aggregate(sort_array(collect_list(
          coalesce(col("rel"), lit(0.0)) * col("disc"))),
          lit(0.0), (a, x) => a + x).as("dcg"),
        count(col("ideal_disc")).as("n_rel"))
      .filter(col("n_rel") > 0)
      .select(col("query_id"), col("dcg"), col("idcg"),
        (col("dcg") / col("idcg")).as("ndcg"))
      .orderBy("query_id")
  }

  /** The persisted passage family's five tables. */
  case class PassageTables(vectors: DataFrame, bands: DataFrame,
                           topk: DataFrame, liTopk: DataFrame,
                           distill: DataFrame)

  /** Build the passage-retrieval snapshot ONCE per corpus: chunk vectors,
    * the band-triple index, and the default-parameter top-k answer,
    * committed under a content-stamped marker
    * ([[graft.sources.SnapshotStore]] — the family discipline). Each later
    * stage reads the earlier one BACK from parquet (staging discipline:
    * the chunk/embed explode runs once, not once per consumer), and
    * serving any of the three is a scan.
    */
  def persistPassage(documents: DataFrame, dir: String, stamp: String,
                     maxTokens: Int = 32, overlap: Int = 8, dims: Int = 16,
                     nbits: Int = 16, bandBits: Int = 4,
                     numQueries: Int = 5, k: Int = 10,
                     maxPerDoc: Int = 2): Unit = {
    val spark = documents.sparkSession
    chunkVectors(documents, maxTokens, overlap, dims)
      .write.mode("overwrite").parquet(s"$dir/vectors")
    val vecs = spark.read.parquet(s"$dir/vectors")
    chunkBands(vecs, nbits, bandBits, dims)
      .write.mode("overwrite").parquet(s"$dir/bands")
    passageTopKServeFrom(vecs, spark.read.parquet(s"$dir/bands"),
        numQueries, k, maxPerDoc)
      .write.mode("overwrite").parquet(s"$dir/topk")
    // v3: the default-parameter MaxSim answer — the late-interaction
    // ranking was the family's last default output rebuilt per call
    lateInteractionTopK(vecs, spark.read.parquet(s"$dir/bands"), numQueries, k)
      .write.mode("overwrite").parquet(s"$dir/li_topk")
    // v4: the distillation slate — teacher MaxSim over the student's
    // persisted candidates (both inputs read back from this snapshot)
    distillPairs(vecs, spark.read.parquet(s"$dir/topk"))
      .write.mode("overwrite").parquet(s"$dir/distill")
    graft.sources.SnapshotStore.commit(spark, dir, stamp)
  }

  /** Load a [[persistPassage]]-ed snapshot. */
  def loadPassage(spark: SparkSession, dir: String): PassageTables =
    PassageTables(
      vectors = spark.read.parquet(s"$dir/vectors"),
      bands = spark.read.parquet(s"$dir/bands"),
      topk = spark.read.parquet(s"$dir/topk"),
      liTopk = spark.read.parquet(s"$dir/li_topk"),
      distill = spark.read.parquet(s"$dir/distill"))

  /** CONTEXT PACKING — the artifact a RAG pipeline actually assembles
    * from a top-k: per query, passages admitted in RANK order while the
    * running token total stays within `budgetTokens` (greedy prefix
    * packing — rank order IS the relevance order, so the prefix is the
    * best context the budget buys; a passage that overflows the budget
    * stops the prefix even if a later, shorter one would fit — skipping
    * it would reorder relevance under the model's nose). Token counts
    * come from the family's stored per-chunk `n_tokens`; the running sum
    * is a per-query window over ≤ k rows — integer arithmetic, engine-
    * exact, bounded input.
    */
  def contextPack(topk: DataFrame, vectors: DataFrame,
                  budgetTokens: Int = 128): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy("rank")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    topk
      .join(vectors.select(col("doc_id"), col("chunk_id"), col("n_tokens")),
        Seq("doc_id", "chunk_id"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      // n_tokens ≥ 1 makes the running sum strictly monotone in rank, so
      // this filter IS the greedy prefix — the first overflow cuts
      // everything after it, no separate prefix check needed
      .filter(col("cum_tokens") <= budgetTokens)
      .select("query_id", "rank", "doc_id", "chunk_id", "n_tokens", "cum_tokens")
      .orderBy("query_id", "rank")
  }
}
