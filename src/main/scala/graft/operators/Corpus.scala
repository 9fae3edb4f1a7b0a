package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-construction operators for LLM training-data pipelines: domain
  * mixing via deterministic stratified sampling, and token-budget sequence
  * packing. Both are the shapes a 100 TB pre-training data build needs:
  * sampling is a pure scan-side predicate (no shuffle, pushes down), and
  * packing is one window per stratum (shuffle on the stratum key only).
  */
object Corpus {

  /** Default per-language keep rates (percent) — the "domain mixing" knob:
    * upsample English, downsample the rest. Any map works; rates are
    * percentages in [0, 100].
    */
  val DefaultRates: Map[String, Int] =
    Map("en" -> 50, "zh" -> 20, "de" -> 20, "fr" -> 20, "es" -> 20)

  /** Deterministic stratified sample: keep a document iff
    * `((doc_id % 1000003) * 2654435761) % 100 < rate(lang)`.
    *
    * The hash is explicit modular arithmetic (Knuth's 2654435761
    * multiplicative constant; the pre-mod by the prime 1000003 keeps the
    * product < 2^52, exact in BIGINT/Long under ANSI mode) rather than an
    * engine hash function, so ANY engine reproduces the same sample — the
    * property that makes a training corpus auditable. Seedless but
    * id-stable: re-running over a grown corpus keeps previously-selected
    * documents selected.
    *
    * Scale: a scan-side predicate on (doc_id, lang) — no shuffle, no state;
    * the sample rate is exact in expectation per stratum.
    */
  def stratifiedSample(documents: DataFrame,
                       rates: Map[String, Int] = DefaultRates): DataFrame = {
    val rateMap = map(rates.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val bucket = pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L), lit(100L))
    documents
      .select(col("doc_id"), col("lang"), col("source"), bucket.as("bucket"))
      .filter(col("bucket") < coalesce(element_at(rateMap, col("lang")), lit(0)))
  }

  /** Corpus composition report: per language — document count, total
    * whitespace tokens, distinct sources, and mean document length — the
    * dataset-card numbers every training-corpus build publishes and the
    * sanity dashboard for [[stratifiedSample]] mixing decisions.
    *
    * Scale: one hash aggregation over narrow derived columns; the token
    * count folds map-side, and `n_sources` is an exact distinct over a
    * low-cardinality attribute (the approx path for high-cardinality
    * attributes is `approx_count_distinct`, cf. Relational).
    */
  def corpusStats(documents: DataFrame): DataFrame =
    documents
      .select(col("lang"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        countDistinct(col("source")).as("n_sources"),
        (sum(col("n_tokens")).cast("double") / count(lit(1))).as("avg_doc_tokens"))
      .orderBy("lang")

  /** SNAPSHOT DIFF — the dataset-versioning card: corpora ship as
    * versioned snapshots (a recrawl, a re-scrub, a takedown sweep), and
    * the artifact a data-release review reads is the per-source change
    * accounting between two of them: how many documents were added,
    * removed, modified, unchanged — and the net character delta. Content
    * comparison is by the engine-wide polynomial fingerprint, so the
    * full-outer join moves one long per side, never document bodies; at
    * scale the join on doc_id is the diff's honest cost (both sides are
    * narrow projections of their scans), and the card aggregation is
    * map-side-combinable. A document present in both snapshots under a
    * changed source reports the NEW source (the snapshot being released
    * owns its catalog).
    */
  def snapshotDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val o = oldDocs.select(col("doc_id"),
      col("source").as("source_old"),
      TextAnalysis.fingerprintCol(col("text")).as("fp_old"),
      length(col("text")).cast("long").as("len_old"))
    val n = newDocs.select(col("doc_id"),
      col("source").as("source_new"),
      TextAnalysis.fingerprintCol(col("text")).as("fp_new"),
      length(col("text")).cast("long").as("len_new"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(
        coalesce(col("source_new"), col("source_old")).as("source"),
        when(col("fp_old").isNull, lit("added"))
          .when(col("fp_new").isNull, lit("removed"))
          .when(col("fp_old") =!= col("fp_new"), lit("modified"))
          .otherwise(lit("unchanged")).as("status"),
        (coalesce(col("len_new"), lit(0L)) - coalesce(col("len_old"), lit(0L)))
          .as("delta"))
      .groupBy("source", "status")
      .agg(count(lit(1)).as("n_docs"), sum(col("delta")).as("char_delta"))
      .orderBy("source", "status")
  }

  /** DISTRIBUTION-DRIFT card between two corpus releases — the release
    * gate [[snapshotDiff]]'s doc-level accounting doesn't cover: a
    * snapshot can add/remove few documents yet still shift WHAT the
    * corpus is made of (language mix, source mix, document-length
    * profile), and a training run inherits that shift silently. Per
    * dimension the card reports the total-variation distance
    * 0.5·Σ|p_old − p_new| — chosen over KL exactly as in the
    * [[sourceDivergence]] precedent's libm argument taken one step
    * further: TV needs no log at all, every term is a ratio of exact
    * counts, so both engines agree bit-for-bit. Per-dimension share
    * tables are dimension-sized (≤ |langs| / |sources| / length
    * buckets), the diffs fold in SORTED key order (the deterministic
    * double-sum discipline), and the corpus-side work is three
    * map-side-combinable aggregations per snapshot.
    */
  def driftCard(oldDocs: DataFrame, newDocs: DataFrame,
                lenBucketChars: Int = 100): DataFrame =
    driftBetween(shareCard(oldDocs, lenBucketChars),
      shareCard(newDocs, lenBucketChars))

  /** Per-dimension SHARE TABLE of one corpus snapshot — (dim, k, p) over
    * language, source and document-length-bucket shares. This is the
    * factored front half of [[driftCard]], exposed so a frozen reference
    * card can be PERSISTED once and diffed repeatedly — the shape
    * streaming drift monitoring ([[graft.streaming.DriftStream]]) needs:
    * the reference corpus is scanned once at freeze time, never per
    * micro-batch. Dimension-sized output (≤ |langs| + |sources| + length
    * buckets rows); each share table costs three map-side-combinable
    * aggregations.
    */
  def shareCard(df: DataFrame, lenBucketChars: Int = 100): DataFrame = {
    def shares(dim: Column, name: String): DataFrame = {
      val counts = df.groupBy(dim.as("k")).agg(count(lit(1)).as("n"))
      counts.crossJoin(broadcast(counts.agg(sum(col("n")).as("tot"))))
        .select(lit(name).as("dim"), col("k"),
          (col("n").cast("double") / col("tot")).as("p"))
    }
    shares(col("lang"), "lang")
      .unionByName(shares(col("source"), "source"))
      .unionByName(shares(
        floor(length(col("text")) / lit(lenBucketChars)).cast("long")
          .cast("string"), "len_bucket"))
  }

  /** Total-variation drift between two [[shareCard]]s — the factored
    * back half of [[driftCard]]: full-outer join on (dim, k) with absent
    * mass as 0, per-dimension sorted-order fold (the deterministic
    * double-sum discipline), 0.5·Σ|p_old − p_new|.
    */
  def driftBetween(oldShares: DataFrame, newShares: DataFrame): DataFrame = {
    val joined = oldShares.withColumnRenamed("p", "p_old")
      .join(newShares.withColumnRenamed("p", "p_new"),
        Seq("dim", "k"), "full_outer")
      .select(col("dim"), col("k"),
        abs(coalesce(col("p_old"), lit(0.0)) - coalesce(col("p_new"), lit(0.0)))
          .as("d"))
    joined.groupBy("dim")
      .agg((aggregate(
          array_sort(collect_list(struct(col("k"), col("d")))),
          lit(0.0), (acc, x) => acc + x.getField("d")) * lit(0.5))
        .as("total_variation"),
        count(lit(1)).as("n_keys"))
      .orderBy("dim")
  }

  /** Token-budget sequence packing: within each (`lang`, `shard`) stratum —
    * shard = doc_id mod `shards` — documents (in doc_id order) are laid
    * head-to-tail and assigned `pack_id = floor(exclusive_prefix_tokens /
    * budget)`, with per-shard budget accounting: the contiguous greedy
    * packing a sequence-building pipeline uses to batch documents into
    * fixed token windows, parallelized across shards.
    *
    * Scale: round 2 keyed the window by `lang` alone — 5 strata ⇒ 5
    * reducers carrying the whole corpus. The shard key bounds each
    * reducer's stratum at corpus/(|langs|·shards) rows, and `shards` scales
    * with the cluster while keeping every (lang, shard, pack_id) batch
    * internally contiguous and deterministic (shard assignment is modular
    * arithmetic on doc_id, reproducible by any engine). Packs are local to
    * their shard by construction — budget accounting never crosses a
    * reducer, which is what makes the operator embarrassingly parallel.
    */
  def packSequences(documents: DataFrame, budget: Int = 512,
                    shards: Int = 8): DataFrame =
    packFromCounts(packTokenCounts(documents, shards), budget)

  /** [[packSequences]]'s row-local half: the narrow
    * (doc_id, lang, shard, n_tokens) projection. Split out (r17) so a
    * caller RESTRICTING the packed frame — q_mix_packing's keep
    * semi-join — can apply its join to this projection instead of the
    * raw documents: the projection commutes with any doc_id-level
    * restriction (it is per-row), and the stratum exchange then carries
    * four scalars per document instead of the text payload (guide §2.3,
    * project before the exchange).
    */
  def packTokenCounts(documents: DataFrame, shards: Int = 8): DataFrame =
    documents
      .select(col("doc_id"), col("lang"),
        pmod(col("doc_id"), lit(shards.toLong)).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))

  /** [[packSequences]]'s stratum-window half over a
    * [[packTokenCounts]]-shaped frame. */
  def packFromCounts(counts: DataFrame, budget: Int = 512): DataFrame = {
    val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    counts.withColumn("pack_id",
      floor(coalesce(sum("n_tokens").over(w), lit(0L)) / lit(budget)).cast("long"))
  }

  /** IN-CONTEXT packing (the "In-Context Pretraining" recipe, Shi et al.
    * 2023, public): long-context training wants RELATED documents inside
    * the same context window, not the incidental neighbors doc_id order
    * produces — the published method orders documents by semantic
    * similarity before packing. Here the similarity key is the sign-LSH
    * bucket of each document's text-tower embedding (closed-form planes
    * and tower — the [[graft.operators.Passage]] geometry — so the whole
    * ordering is oracle-able), and the packing is [[packSequences]]'s
    * per-(lang, shard) greedy prefix with `(bucket, doc_id)` replacing
    * doc_id order: same-bucket documents become contiguous and land in
    * the same pack whenever the budget allows.
    *
    * Scale shape: the tower + bucket are a pure row-local projection
    * (codegen'd fingerprint + nbits literal-plane dots, zero shuffle on
    * top of packing's own stratum exchange); the one window is the same
    * bounded per-(lang, shard) running sum packSequences already pays.
    * A production deployment swaps the stub tower exactly as everywhere
    * else; bucket-as-sort-key is the method's scalable core (the paper's
    * traveling-salesman refinement needs pairwise distances — the
    * bucketed form is the linear-cost approximation that works at 100 TB).
    */
  def inContextPack(documents: DataFrame, budget: Int = 512, shards: Int = 8,
                    dims: Int = 16, nbits: Int = 16): DataFrame = {
    import graft.functions.VectorFunctions.dot
    val planes = Similarity.lshPlaneWeights(nbits, dims)
    val fp = TextAnalysis.fingerprintCol(col("text"))
    val tower = transform(sequence(lit(0), lit(dims - 1)), d =>
      ((fp * (d.cast("long") * 2L + 3L) + d.cast("long") * 65599L)
        % 2000001L).cast("double") / 1000000.0 - 1.0)
    val bucket = (0 until nbits).map { i =>
      when(dot(col("v"), typedLit(planes(i).toSeq)) > lit(0.0), lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)
    val w = Window.partitionBy("lang", "shard").orderBy("bucket", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    documents
      .select(col("doc_id"), col("lang"),
        pmod(col("doc_id"), lit(shards.toLong)).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        tower.as("v"))
      .withColumn("bucket", bucket).drop("v")
      .withColumn("pack_id",
        floor(coalesce(sum("n_tokens").over(w), lit(0L)) / lit(budget)).cast("long"))
  }

  /** Default per-language TOKEN budgets for [[tokenBudgetMix]] — the
    * mixture knob stated the way training recipes state it (tokens per
    * domain), sized so every language keeps a strict subset of the
    * synthetic corpus at all test SFs.
    */
  val DefaultTokenBudgets: Map[String, Long] =
    Map("en" -> 4800L, "zh" -> 2400L, "de" -> 2400L, "fr" -> 2400L, "es" -> 2400L)

  /** EXACT-token-budget corpus mixing: keep documents per language until
    * the language's token budget is exhausted. [[stratifiedSample]] states
    * the mixture as keep-probabilities; real training recipes state it in
    * tokens ("30B of code, 10B of wiki") — this operator is that
    * contract, deterministic and auditable.
    *
    * Selection: within each (lang, shard) stratum — shard = doc_id mod
    * `shards`, budget share = budget(lang) / shards (floor) — documents
    * are taken in PORTABLE-HASH order (the [[stratifiedSample]] modular
    * hash, then doc_id: pseudo-random w.r.t. corpus position yet
    * reproducible by any engine, and id-stable as the corpus grows) and
    * kept while the stratum's exclusive token prefix is under its share;
    * the document that crosses the line is kept, so each stratum lands
    * within one document of its share and the language within `shards`
    * documents of its budget — the standard greedy cut.
    *
    * Scale: the [[packSequences]] window discipline — per-(lang, shard)
    * cumulative sums bound every reducer at corpus/(|langs|·shards) rows
    * and `shards` scales with the cluster; budget accounting never
    * crosses a reducer.
    */
  def tokenBudgetMix(documents: DataFrame,
                     budgets: Map[String, Long] = DefaultTokenBudgets,
                     shards: Int = 8): DataFrame = {
    val shareMap = map(budgets.toSeq.flatMap {
      case (k, v) => Seq(lit(k), lit(v / shards)) }: _*)
    val w = Window.partitionBy("lang", "shard").orderBy("h", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    documents
      .select(col("doc_id"), col("lang"),
        pmod(col("doc_id"), lit(shards.toLong)).as("shard"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        (pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L)).as("h"))
      .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .filter(col("cum_before") <
        coalesce(element_at(shareMap, col("lang")), lit(0L)))
      .select("doc_id", "lang", "shard", "n_tokens", "cum_before")
  }

  /** Temperature-based (α-) multilingual sampling — the XLM-R/mT5 mixing
    * rule: languages are kept in proportion to `p_l^α` rather than their
    * natural share `p_l`, flattening the distribution so high-resource
    * languages stop drowning the tail. α is FIXED at 0.5 because `sqrt` is
    * IEEE-754 correctly rounded — bit-identical across engines — while
    * `pow` is libm-dependent; the repo's log-dropping precedent applied to
    * the exponent.
    *
    * Derivation (all from corpus statistics — unlike [[stratifiedSample]]
    * the rates are DATA-DRIVEN, the second pass a real mixing recipe
    * needs): with `S = Σ_l sqrt(n_l)` (folded in sorted-language order to
    * pin double addition), language l's target share is `sqrt(n_l)/S`, so
    * at total target `f·N` its keep-rate is
    * `r_l = min(1, f·N / (S·sqrt(n_l)))` — rarer languages keep MORE of
    * themselves. Selection quantizes `r_l` to an integer threshold
    * `floor(r_l·2^20)` against the portable modular hash bucket of
    * [[stratifiedSample]], so the kept SET is integer-exact, id-stable
    * under corpus growth, and reproducible by any engine.
    *
    * Scale shape: one language-count aggregation (|langs| rows), a 1-row
    * fold, a broadcast of the |langs|-row rate table, then a scan-side
    * predicate — no shuffle touches the corpus.
    */
  def temperatureSample(documents: DataFrame,
                        targetFrac: Double = 0.5): DataFrame = {
    val counts = documents.groupBy("lang").agg(count(lit(1)).as("n_l"))
    val totals = counts.agg(
      aggregate(
        array_sort(collect_list(struct(col("lang"),
          sqrt(col("n_l").cast("double")).as("sq")))),
        lit(0.0), (acc, x) => acc + x.getField("sq")).as("s_total"),
      sum(col("n_l")).as("n_total"))
    val rates = counts.crossJoin(broadcast(totals))
      .select(col("lang"), col("n_l"),
        floor(least(lit(1.0),
          lit(targetFrac) * col("n_total").cast("double")
            / (col("s_total") * sqrt(col("n_l").cast("double")))) * lit(1048576.0))
          .cast("long").as("threshold"))
    val bucket =
      pmod(pmod(col("doc_id"), lit(1000003L)) * lit(2654435761L), lit(1048576L))
    documents
      .select(col("doc_id"), col("lang"), bucket.as("bucket"))
      .join(broadcast(rates), Seq("lang"))
      .filter(col("bucket") < col("threshold"))
      .select("doc_id", "lang", "bucket", "n_l", "threshold")
  }

  /** Per-source duplication report — the dataset-card number that answers
    * "which source is feeding duplicates": per source, document count,
    * distinct-content count and the exact-duplicate rate. Content
    * identity is the codegen'd polynomial
    * [[graft.operators.TextAnalysis.fingerprintCol]] (64-bit), so the
    * distinct shuffles 8-byte hashes instead of document bytes — at
    * 100 TB that is the difference between a countDistinct that runs and
    * one that moves the corpus; the DuckDB oracle mirrors the identical
    * fingerprint, keeping the report hash-checkable.
    */
  def dupRateBySource(documents: DataFrame): DataFrame =
    documents
      .select(col("source"),
        graft.operators.TextAnalysis.fingerprintCol(col("text")).as("fp"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_distinct"),
        (lit(1.0) - countDistinct(col("fp")).cast("double")
          / count(lit(1)).cast("double")).as("dup_rate"))
      .orderBy("source")

  /** CROSS-SOURCE n-gram overlap matrix — the duplication audit ACROSS
    * sources the per-source dup rate can't see: syndication, mirrors and
    * scraped re-posts put the same passages into different sources, and a
    * mixing recipe that weights such sources independently double-counts
    * their shared content. For every source pair (a < b): the count of
    * distinct `n`-gram fingerprints both carry, each side's distinct-gram
    * total, and the Jaccard overlap — zero-overlap pairs included (the
    * matrix is the deliverable, absence of overlap is a finding).
    *
    * Scale shape (r15 — the r14 watch item closed): grams collapse to
    * 8-byte polynomial fingerprints BEFORE the distinct
    * ([[dupRateBySource]]'s discipline — the shuffle carries longs,
    * never gram strings; the ~2^30 fingerprint space's birthday
    * collisions are the bloom family's accepted and documented class,
    * mirrored identically by the oracle so the compare still
    * hash-checks), and the former gram SELF-JOIN is gone: ONE gram-keyed
    * aggregate collects each gram's sorted source set (≤ |catalog|
    * strings — a curated catalog dimension, tens-to-hundreds), and the
    * pair stream is generated INSIDE the row from that array, so a gram
    * carried by s sources costs s²/2 row-local expansions feeding a
    * map-side-combined pair aggregate bounded by |catalog|²/2 — nothing
    * per-gram is ever joined. `dfCap` closes the remaining 100 TB
    * exposure: a corpus-ubiquitous gram (site chrome, license
    * boilerplate syndicated everywhere) still expands |catalog|²/2 rows
    * PER GRAM; with a cap, grams carried by more than `dfCap` sources
    * are excluded from the overlap universe entirely (zero pair rows —
    * the [[Dedup.jaccardPairs]] df-cap precedent: catalog-saturating
    * boilerplate is noise for syndication detection, exactly as
    * corpus-hot grams are for near-dup mining), and EVERY quantity
    * (n_shared, the per-source totals, jaccard) is computed over the
    * capped universe, so the capped matrix is a self-consistent
    * deterministic answer with a full oracle, not an approximation. The
    * zero-fill join of the catalog-sized share tables is a tiny
    * broadcast nested loop by construction.
    */
  def sourceOverlap(documents: DataFrame, n: Int = 5,
                    dfCap: Option[Int] = None): DataFrame = {
    val gramSources = distinctGramSources(documents, n)
    // catalog = sources carrying >= 1 distinct gram BEFORE capping (the
    // pre-cap matrix universe, so a source whose every gram is capped
    // still appears — with honest zero totals — rather than vanishing)
    val catalog = gramSources.select("source").distinct()
    val kept = capGramSources(gramSources, dfCap)
    val sz = kept.select(explode(col("ss")).as("source"))
      .groupBy("source").agg(count(lit(1)).as("n_grams"))
    val ov = sourceOverlapPairStream(kept)
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_shared"))
    val shared = coalesce(col("n_shared"), lit(0L))
    val denom = (coalesce(col("n_grams_a"), lit(0L))
      + coalesce(col("n_grams_b"), lit(0L)) - shared).cast("double")
    broadcast(catalog.select(col("source").as("source_a")))
      .join(broadcast(catalog.select(col("source").as("source_b"))),
        col("source_a") < col("source_b"))
      .join(ov, Seq("source_a", "source_b"), "left")
      .join(broadcast(sz.select(col("source").as("source_a"),
        col("n_grams").as("n_grams_a"))), Seq("source_a"), "left")
      .join(broadcast(sz.select(col("source").as("source_b"),
        col("n_grams").as("n_grams_b"))), Seq("source_b"), "left")
      .select(col("source_a"), col("source_b"), shared.as("n_shared"),
        coalesce(col("n_grams_a"), lit(0L)).as("n_grams_a"),
        coalesce(col("n_grams_b"), lit(0L)).as("n_grams_b"),
        when(denom > 0, shared.cast("double") / denom)
          .otherwise(lit(0.0)).as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  /** The distinct (source, gram fingerprint) frame — the one
    * corpus-scaled stage of the overlap matrix.
    */
  private def distinctGramSources(documents: DataFrame, n: Int): DataFrame =
    documents
      .select(col("source"), explode(Dedup.shingles(col("text"), n)).as("gram"))
      .select(col("source"),
        graft.operators.TextAnalysis.fingerprintCol(col("gram")).as("g"))
      .distinct()

  /** Gram → sorted source array, df-capped when asked: one gram-keyed
    * aggregate whose per-row payload is catalog-bounded.
    */
  private def capGramSources(gramSources: DataFrame,
                             dfCap: Option[Int]): DataFrame =
    gramSources
      .groupBy("g").agg(sort_array(collect_list(col("source"))).as("ss"))
      .filter(dfCap.fold(lit(true))(c => size(col("ss")) <= c))

  /** The pre-aggregation (source_a, source_b) pair stream of
    * [[sourceOverlap]] — generated row-locally from each kept gram's
    * sorted source array (array order gives a < b for free). Exposed to
    * the stress spec, which asserts the stream stays FLAT when a
    * boilerplate gram saturates the catalog under a df-cap.
    */
  private[graft] def sourceOverlapPairStream(kept: DataFrame): DataFrame =
    kept
      .filter(size(col("ss")) >= 2)
      .select(explode(flatten(transform(col("ss"), (x, i) =>
        transform(slice(col("ss"), i + lit(2), size(col("ss"))),
          y => array(x, y))))).as("p"))
      .select(element_at(col("p"), 1).as("source_a"),
        element_at(col("p"), 2).as("source_b"))

  /** [[sourceOverlapPairStream]] from raw documents (spec convenience). */
  private[graft] def sourceOverlapPairStream(documents: DataFrame, n: Int,
                                             dfCap: Option[Int]): DataFrame =
    sourceOverlapPairStream(
      capGramSources(distinctGramSources(documents, n), dfCap))

  /** PREFERENCE-PAIR assembly (the DPO/RLHF reward-modeling data shape):
    * per source, the `k` highest-quality documents pair positionally
    * with the `k` lowest — (chosen, rejected, quality gap) rows, the
    * synthetic preference set that bootstraps a quality reward model
    * when human labels don't exist yet (quality-classifier curricula do
    * exactly this: treat the gate's extremes as labels). Pairing within
    * a SOURCE keeps the contrast about writing quality rather than
    * domain (a clean-wiki-vs-spam-forum pair teaches domain detection,
    * not quality). Degenerate pairs (a source so small the same document
    * tops both orders) drop.
    *
    * Scale shape: the quality pass is row-local
    * ([[TextAnalysis.qualityScore]] — one regex scan per doc); both
    * extremes come from per-source rank windows (partitioned — bounded
    * by source membership, never a global sort) cut to k before the
    * k-row-per-source positional join.
    */
  def preferencePairs(documents: DataFrame, k: Int = 2): DataFrame = {
    val q = TextAnalysis.qualityScore(documents)
      .select(col("doc_id"), col("quality"))
      .join(documents.select(col("doc_id"), col("source")), Seq("doc_id"))
    val wTop = Window.partitionBy("source")
      .orderBy(col("quality").desc, col("doc_id"))
    val wBot = Window.partitionBy("source")
      .orderBy(col("quality").asc, col("doc_id"))
    val top = q.withColumn("pair_rank", row_number().over(wTop).cast("long"))
      .filter(col("pair_rank") <= k)
      .select(col("source"), col("pair_rank"),
        col("doc_id").as("chosen_id"), col("quality").as("chosen_quality"))
    val bot = q.withColumn("pair_rank", row_number().over(wBot).cast("long"))
      .filter(col("pair_rank") <= k)
      .select(col("source"), col("pair_rank"),
        col("doc_id").as("rejected_id"), col("quality").as("rejected_quality"))
    top.join(bot, Seq("source", "pair_rank"))
      .filter(col("chosen_id") =!= col("rejected_id"))
      .select(col("source"), col("pair_rank"), col("chosen_id"),
        col("rejected_id"), col("chosen_quality"), col("rejected_quality"),
        (col("chosen_quality") - col("rejected_quality")).as("quality_gap"))
      .orderBy("source", "pair_rank")
  }

  /** Token-budget document CHUNKING with overlap — the training-prep step
    * between cleaning and packing: every document splits into windows of
    * at most `maxTokens` whitespace tokens, consecutive chunks sharing
    * `overlap` tokens so no span of context is lost at a boundary. Chunk
    * `c` covers tokens [c·stride, c·stride + maxTokens) for
    * stride = maxTokens − overlap; the chunk count is
    * ⌈max(n − overlap, 1) / stride⌉, so a short document yields exactly
    * one chunk covering itself.
    *
    * Pure projection + bounded explode (rows out ∝ corpus tokens /
    * stride): no shuffle, no state, fully deterministic — the oracle
    * reproduces every chunk string byte-for-byte. Arithmetic stays in
    * exact-integer territory (the ceil-division runs on doubles far below
    * 2^53).
    */
  def chunkDocuments(documents: DataFrame, maxTokens: Int = 32,
                     overlap: Int = 8): DataFrame = {
    require(overlap >= 0 && overlap < maxTokens, "need 0 <= overlap < maxTokens")
    val stride = maxTokens - overlap
    val toks = split(col("text"), " ")
    val n = size(toks)
    val nChunks = floor((greatest(n - overlap, lit(1)) + lit(stride - 1))
      .cast("double") / lit(stride)).cast("int")
    documents
      .select(col("doc_id"), toks.as("t"), nChunks.as("n_chunks"))
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_id"), col("t"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        array_join(slice(col("t"), col("chunk_id") * lit(stride) + lit(1),
          lit(maxTokens)), " ").as("chunk_text"),
        least(size(col("t")) - col("chunk_id") * stride, lit(maxTokens))
          .cast("long").as("n_tokens"))
  }

  /** DATASET-CARD composition — the single per-source report a data
    * curator ships with a corpus snapshot (round-10 verdict next-round
    * 7), composed PURELY from the existing audit frames: exact dup-rate
    * over content fingerprints ([[dupRateBySource]]'s identity), token
    * totals, both canonical quality gates'
    * ([[graft.operators.TextAnalysis.qualityFilter]] C4 /
    * [[graft.operators.TextAnalysis.gopherFilter]] Gopher) keep counts,
    * and the tokenizer-health OOV rate
    * ([[graft.operators.TextAnalysis.vocabCoverage]]) — one row per
    * source, every number the respective standalone query publishes.
    *
    * Scale shape: both quality gates are ROW-LOCAL predicates of the
    * text column (the shared [[graft.operators.TextAnalysis]] keep
    * builders — round-11 review: joining the standalone gate frames back
    * on doc_id paid two shuffles for flags the base scan already had
    * side by side), so the fingerprint and both flags come out of ONE
    * projection; only the OOV report — a genuine aggregation — joins on
    * doc_id, with [[graft.operators.TextAnalysis.vocabCoverage]]'s k-row
    * vocabulary broadcast. All ratios are the exact one-divide doubles
    * their source operators emit, so the composed report hash-checks
    * like its parts.
    */
  def datasetCard(documents: DataFrame, vocabK: Int = 20): DataFrame = {
    import graft.operators.TextAnalysis
    val base = documents.select(col("doc_id"), col("source"),
      TextAnalysis.fingerprintCol(col("text")).as("fp"),
      TextAnalysis.c4KeepCol().cast("long").as("c4_keep"),
      TextAnalysis.gopherKeepCol().cast("long").as("gopher_keep"))
    val cov = TextAnalysis.vocabCoverage(documents, vocabK)
      .select(col("doc_id"), col("n_tokens"), col("n_oov"))
    base.join(cov, "doc_id")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_distinct"),
        (lit(1.0) - countDistinct(col("fp")).cast("double")
          / count(lit(1)).cast("double")).as("dup_rate"),
        sum(col("n_tokens")).as("total_tokens"),
        (sum(col("n_tokens")).cast("double") / count(lit(1))).as("avg_doc_tokens"),
        sum(col("c4_keep")).as("n_c4_keep"),
        sum(col("gopher_keep")).as("n_gopher_keep"),
        (sum(col("n_oov")).cast("double")
          / sum(col("n_tokens")).cast("double")).as("oov_rate"))
      .orderBy("source")
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling") — the hashed-n-gram
    * data-selection method: score every raw document by how much its
    * feature distribution looks like a trusted TARGET domain, using the
    * ratio of the target and raw hashed-bigram distributions. The
    * published method scores log p_target(doc)/p_raw(doc) over hashed
    * n-gram features and Gumbel-resamples; this operator keeps the same
    * feature pipeline (bigram occurrences hashed into `buckets` slots —
    * the fingerprint polynomial mod `buckets`, mirrored exactly by the
    * oracle) and replaces the log-sum with the MEAN per-occurrence
    * probability ratio — the [[graft.operators.TextAnalysis.lmFluency]]
    * precedent: a monotone-equivalent ranking signal with the libm `log`
    * dropped for cross-engine rational arithmetic. Laplace-smoothed
    * (+1 / +buckets) so unseen buckets stay finite on both sides.
    *
    * Determinism: each ratio is ONE double division of two exactly-
    * computed integers ((c_t+1)·(T_r+B) over (c_r+1)·(T_t+B), both in
    * DECIMAL(38,0) / HUGEINT — the unigram-gain precedent); the per-doc
    * sum folds in position order over a sorted struct array.
    *
    * Scale shape: the count tables are bounded by `buckets` (the whole
    * point of DSIR's feature hashing) — scoring is two ≤B-row broadcast
    * joins plus two 1-row total broadcasts against the raw occurrence
    * stream, then one per-doc hash aggregate. Nothing grows with the
    * corpus except the stream itself; the target side aggregates
    * map-side to ≤B rows before its shuffle. Documents with fewer than
    * 2 tokens have no bigrams and drop out, as in lmFluency.
    */
  def dsirWeights(raw: DataFrame, target: DataFrame,
                  buckets: Int = 4096): DataFrame = {
    val tgt  = hashedBigramStream(target, buckets)
    val rawS = hashedBigramStream(raw, buckets)
    val model = DsirModel(
      targetCounts = tgt.groupBy("b").agg(count(lit(1)).as("c_t")),
      rawCounts = rawS.groupBy("b").agg(count(lit(1)).as("c_r")),
      totals = tgt.agg(count(lit(1)).as("t_t"))
        .crossJoin(rawS.agg(count(lit(1)).as("t_r"))))
    scoreDsir(model, rawS, buckets)
  }

  /** Persist the trained DSIR importance model behind [[dsirWeightsFrom]]
    * — the [[graft.operators.TextAnalysis.persistLmModel]] discipline
    * applied to data selection: the two hashed-bigram count tables are
    * estimated ONCE per corpus snapshot (in the published method the
    * importance estimator is fit once on the target + a raw sample, then
    * applied to the full pool), so weights stay commensurable across
    * every scoring call and nothing re-aggregates per query. Three
    * tables under the content-stamped commit protocol:
    *
    *  - `target_counts` — (b, c_t): target-domain bucket counts
    *  - `raw_counts`    — (b, c_r): raw-pool bucket counts
    *  - `totals`        — (t_t, t_r): 1 row, derived from the READ-BACK
    *    count tables (staging discipline) so the ratios normalize
    *    exactly over what was stored
    */
  def persistDsirModel(raw: DataFrame, target: DataFrame, dir: String,
                       stamp: String = "", buckets: Int = 4096): Unit = {
    val spark = raw.sparkSession
    hashedBigramStream(target, buckets)
      .groupBy("b").agg(count(lit(1)).as("c_t"))
      .write.mode("overwrite").parquet(s"$dir/target_counts")
    hashedBigramStream(raw, buckets)
      .groupBy("b").agg(count(lit(1)).as("c_r"))
      .write.mode("overwrite").parquet(s"$dir/raw_counts")
    spark.read.parquet(s"$dir/target_counts")
      .agg(sum(col("c_t")).as("t_t"))
      .crossJoin(spark.read.parquet(s"$dir/raw_counts")
        .agg(sum(col("c_r")).as("t_r")))
      .write.mode("overwrite").parquet(s"$dir/totals")
    // v2: the training pool's own weights are snapshot-determined (the
    // pair-table amortization argument), so score them ONCE here — from
    // the READ-BACK count tables (staging discipline) — and serve every
    // later weights/selection call as a parquet scan. New data still
    // scores through [[dsirWeightsFrom]]/the stream.
    val counts = DsirModel(
      targetCounts = spark.read.parquet(s"$dir/target_counts"),
      rawCounts = spark.read.parquet(s"$dir/raw_counts"),
      totals = spark.read.parquet(s"$dir/totals"))
    scoreDsir(counts, hashedBigramStream(raw, buckets), buckets)
      .write.mode("overwrite").parquet(s"$dir/weights")
    graft.sources.SnapshotStore.commit(spark, dir, stamp)
  }

  /** A [[persistDsirModel]]-ed snapshot's importance estimator: the two
    * count tables + totals. The training pool's pre-scored weights are a
    * SEPARATE artifact ([[loadDsirWeights]]) — scoring consumers (the
    * stream, [[dsirWeightsFrom]] endpoints) need only the counts, and a
    * counts-only model dir stays loadable for them.
    */
  case class DsirModel(targetCounts: DataFrame, rawCounts: DataFrame,
                       totals: DataFrame)

  /** Load a [[persistDsirModel]]-ed snapshot's count tables. */
  def loadDsirModel(spark: org.apache.spark.sql.SparkSession, dir: String): DsirModel =
    DsirModel(
      targetCounts = spark.read.parquet(s"$dir/target_counts"),
      rawCounts = spark.read.parquet(s"$dir/raw_counts"),
      totals = spark.read.parquet(s"$dir/totals"))

  /** Load a v2 snapshot's pre-scored training-pool weights table. */
  def loadDsirWeights(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/weights")

  /** The model's fully-OOV score floor: a document none of whose bigram
    * buckets appear in EITHER count table scores exactly
    * (T_r+B)/(T_t+B) per occurrence (every ratio Laplace-smooths to the
    * same constant, and the per-doc mean of a constant is the constant).
    * This EXCEEDS 1.0 whenever the raw pool outweighs the target — so any
    * selection gate meant to reject unseen-vocabulary junk must sit
    * strictly ABOVE this floor ([[graft.streaming.DsirStream]] derives
    * its default gate as `nextUp(floor)`). One 1-row driver read of the
    * persisted totals — a plan parameter, not data movement.
    */
  def dsirOovFloor(model: DsirModel, buckets: Int = 4096): Double = {
    val r = model.totals
      .select(col("t_t").cast("double"), col("t_r").cast("double")).head()
    (r.getDouble(1) + buckets) / (r.getDouble(0) + buckets)
  }

  /** [[dsirWeights]] scoring against a FROZEN persisted model: per call
    * the two training aggregations become two ≤`buckets`-row parquet
    * scans (broadcast); only the frame being scored pays its bigram
    * explode. Scoring the training raw pool reproduces [[dsirWeights]]
    * bit-for-bit (every bucket hits); a bucket unseen in either
    * distribution is Laplace-smoothed exactly as in training.
    */
  def dsirWeightsFrom(model: DsirModel, docs: DataFrame,
                      buckets: Int = 4096): DataFrame =
    scoreDsir(model, hashedBigramStream(docs, buckets), buckets)

  /** Shared scoring kernel: per-occurrence smoothed probability ratios
    * against the given count tables, folded per document in position
    * order (the [[graft.operators.TextAnalysis]] scoreBigrams shape).
    * LEFT joins so buckets unseen in either distribution — possible only
    * when scoring a frame the model was not trained on — fall back to
    * the Laplace floor; on the training raw pool every bucket hits and
    * this reduces to [[dsirWeights]]'s inner semantics exactly.
    */
  private def scoreDsir(model: DsirModel, stream: DataFrame,
                        buckets: Int): DataFrame =
    stream
      .join(broadcast(model.targetCounts), Seq("b"), "left")
      .join(broadcast(model.rawCounts), Seq("b"), "left")
      .crossJoin(broadcast(model.totals))
      .withColumn("ratio",
        ((coalesce(col("c_t"), lit(0L)) + 1).cast("decimal(38,0)")
            * (col("t_r") + buckets).cast("decimal(38,0)")).cast("double")
          / ((coalesce(col("c_r"), lit(0L)) + 1).cast("decimal(38,0)")
            * (col("t_t") + buckets).cast("decimal(38,0)")).cast("double"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_grams"),
        aggregate(array_sort(collect_list(struct(col("pos"), col("ratio")))),
          lit(0.0), (acc, x) => acc + x.getField("ratio")).as("ratio_sum"))
      .select(col("doc_id"), col("n_grams"),
        (col("ratio_sum") / col("n_grams").cast("double")).as("dsir_weight"))

  /** Per-source token-distribution divergence — the mixture-drift metric
    * of a dataset card: for each source, the total-variation distance
    * between its hashed-token distribution and the whole corpus's,
    * `TV(s) = Σ_b |c_s(b)/T_s − c(b)/T| / 2` over `buckets` hashed
    * slots. A source whose language/register drifts from the mix shows a
    * rising TV — the signal a curation run watches when a feed changes
    * under it. Output: (source, n_tokens, tv_divergence), source
    * ascending; TV ∈ [0,1] with 0 = identical distribution.
    *
    * Determinism: each per-bucket term is |one exact ratio − another|
    * (integer-derived double divisions, same class as [[dsirWeights]]);
    * the per-source sum folds in BUCKET order over a sorted struct array
    * so double addition order is pinned on both engines. The final /2
    * is exact.
    *
    * Scale shape: the token stream reduces map-side to ≤`buckets` rows
    * per source before its shuffle ((source, b) hash agg); the corpus
    * side is a ≤`buckets`-row re-aggregation of those counts (NOT a
    * second pass), broadcast into the join; the fold state is one
    * ≤`buckets`-element array per source. Nothing scales with corpus
    * size except the one token-stream scan.
    */
  def sourceDivergence(documents: DataFrame, buckets: Int = 4096): DataFrame = {
    // the (source, b) count table feeds FOUR consumers (its own totals,
    // the corpus re-aggregation, the corpus total, and the join stream);
    // without a barrier each consumer re-derives the corpus token
    // explode — 4 scans instead of 1 (read straight off .explain). The
    // counts are ≤ |sources|·buckets rows, so the lazy localCheckpoint
    // materializes exactly the small thing (the curation-funnel flags
    // precedent).
    val perSource = documents
      .select(col("source"),
        explode(graft.operators.Dedup.tokenHashes(col("text"))).as("h"))
      .select(col("source"), pmod(col("h"), lit(buckets.toLong)).as("b"))
      .groupBy("source", "b").agg(count(lit(1)).as("c_s"))
      .localCheckpoint(eager = false)
    val totals = perSource.groupBy("source").agg(sum(col("c_s")).as("t_s"))
    val corpus = perSource.groupBy("b").agg(sum(col("c_s")).as("c"))
    val corpusTotal = corpus.agg(sum(col("c")).as("t"))
    perSource
      .join(broadcast(corpus), Seq("b"))
      .join(broadcast(totals), Seq("source"))
      .crossJoin(broadcast(corpusTotal))
      .withColumn("term",
        abs(col("c_s").cast("double") / col("t_s").cast("double")
          - col("c").cast("double") / col("t").cast("double")))
      // buckets where the source has NO tokens still contribute c(b)/T to
      // the TV sum: fold them in as the closed-form remainder — the
      // missing mass is (T − Σ_{b∈source} c(b)) / T, one exact ratio
      .groupBy("source")
      .agg(
        first(col("t_s")).as("n_tokens"),
        aggregate(array_sort(collect_list(struct(col("b"), col("term")))),
          lit(0.0), (acc, x) => acc + x.getField("term")).as("present_sum"),
        ((first(col("t")) - sum(col("c"))).cast("double")
          / first(col("t")).cast("double")).as("absent_mass"))
      .select(col("source"), col("n_tokens"),
        ((col("present_sum") + col("absent_mass")) / lit(2.0)).as("tv_divergence"))
      .orderBy("source")
  }

  /** The (doc_id, pos, b) hashed-bigram occurrence stream of
    * [[dsirWeights]]: bigram strings fingerprint-hashed
    * ([[graft.operators.TextAnalysis.fingerprintCol]], codegen'd) into
    * `buckets` slots. One narrow projection + bounded posexplode; shared
    * by the target and raw sides so both distributions see byte-identical
    * features.
    */
  private def hashedBigramStream(docs: DataFrame, buckets: Int): DataFrame = {
    val t = split(col("text"), " ")
    docs
      .select(col("doc_id"),
        posexplode(zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t)),
          (a, b) => concat(a, lit(" "), b))))
      .select(col("doc_id"), col("pos"),
        pmod(TextAnalysis.fingerprintCol(col("col")), lit(buckets.toLong)).as("b"))
  }

  /** CURRICULUM STAGING — the training-ORDER step after selection: the
    * kept documents (CCNet head/middle fluency ∩ the token-budget cut —
    * the [[graft.SparkEntry]] manifest's keep rule) split into `stages`
    * per-language quality tiers, cleanest first (stage 1 = highest
    * fluency). The published curriculum recipes order pre-training data
    * from clean to noisy; per-LANGUAGE staging keeps the window
    * partitioned (no global sort, no partition-less Window — the
    * [[graft.operators.TextAnalysis.ccnetBuckets]] geometry) and lets
    * the scheduler interleave languages within a stage. Fluency doubles
    * are cross-engine bit-identical and doc_id breaks ties, so both
    * engines cut stages at the same rows.
    *
    * Scale shape: inputs are a persisted-score scan and a window over
    * (lang, shard)-bounded budget accounting; the staging window
    * shuffles once on lang, and its sorted payload is (doc_id, fluency),
    * never text. At 100 TB the exact per-language ntile gives way to
    * sampled percentile thresholds exactly as [[graft.operators
    * .TextAnalysis.ccnetBuckets]] documents — the swap changes the
    * stage-cut constants, not the plumbing; this exact form is the
    * hash-checked correctness baseline.
    */
  def curriculumStages(ccnet: DataFrame, budgetKeep: DataFrame,
                       stages: Int = 4): DataFrame =
    ccnet.filter(col("bucket") =!= "tail")
      .join(budgetKeep.select("doc_id"), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("lang"), col("fluency"))
      .withColumn("stage", ntile(stages).over(
        Window.partitionBy("lang").orderBy(col("fluency").desc, col("doc_id"))))
      .orderBy("doc_id")

  /** Deterministic TRAIN/VAL/TEST split — the held-out-evaluation cut
    * every training-data build ships alongside the mix: a document's
    * split is a pure function of its id (two multiply-mod mixing rounds
    * over large primes, then mod 100; bucket < `trainPct` → train,
    * < trainPct+`valPct` → val, else test), so the assignment is
    * reproducible by any engine (64-bit integer arithmetic only, every
    * intermediate < 2^62 — no overflow wrap to disagree on), stable
    * under corpus growth (an id keeps its split forever — new crawls
    * never reshuffle old eval docs into train), and needs no stored
    * split table.
    *
    * WHY two rounds with intermediate large-prime wraps: a single
    * `(doc_id * A) % 100` — whatever the multiplier — is an affine map
    * of `doc_id mod 100`, so any id-periodic corpus structure (striped
    * ingestion, round-robin sharding, this repo's own mod-3/5/7/11 PII
    * fixture) aligns block-wise with split residues and skews per-stratum
    * shares; the wraps mod 999999937/999999893 (both prime) in between
    * destroy that arithmetic-progression structure (a step-k id
    * progression steps ~2.2k times around the first prime per increment,
    * equidistributing the residues — Weyl), which the per-stratum
    * balance spec pins. The round-1 multiplier is xxHash32's prime
    * 2246822519 and round 2 uses xxHash32's 3266489917, neither of them
    * [[stratifiedSample]]'s 2654435761, so the split stream is
    * decorrelated from the sampling bucket stream as well.
    *
    * Scale: a scan-side projection — no shuffle, no state; the split
    * predicate composes with any downstream selection as a pushed filter.
    */
  def dataSplit(documents: DataFrame, trainPct: Int = 90,
                valPct: Int = 5): DataFrame = {
    require(trainPct + valPct < 100, "test share must be nonempty")
    documents
      .select(col("doc_id"), col("lang"), col("source"),
        splitBucket(col("doc_id")).as("bucket"))
      .withColumn("split", splitOf(col("bucket"), trainPct, valPct))
  }

  /** [[dataSplit]]'s deterministic bucket hash of an id column — one
    * site, shared with the cluster-keyed split so the two can never
    * disagree on the hash.
    */
  private def splitBucket(id: Column): Column = {
    val h1 = pmod(pmod(id, lit(1000003L)) * lit(2246822519L),
      lit(999999937L))
    pmod(pmod(pmod(h1, lit(1000003L)) * lit(3266489917L),
      lit(999999893L)), lit(100L))
  }

  private def splitOf(bucket: Column, trainPct: Int, valPct: Int): Column =
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")

  /** split-key → split-name projection — [[splitBucket]] ∘ [[splitOf]],
    * the ONE hash+cut site shared by [[dataSplit]], [[leakageSafeSplit]]
    * and the streaming split assigner
    * ([[graft.streaming.SplitStream]]), so no two assignment paths can
    * ever disagree on where a key lands.
    */
  private[graft] def splitOfKey(key: Column, trainPct: Int = 90,
                                valPct: Int = 5): Column =
    splitOf(splitBucket(key), trainPct, valPct)

  /** LEAKAGE-SAFE split — the FIX for what [[splitLeakage]] measures:
    * hashing doc_id sends near-duplicates to independent splits, so an
    * eval document routinely has a train twin (contaminated evaluation).
    * Here the split key is the document's near-dup CLUSTER representative
    * (the persisted [[graft.operators.Dedup.dupClusters]]-style
    * `cluster_id` = the component's min doc_id; unclustered documents
    * key by their own id), so every member of a near-dup cluster lands
    * on the SAME side by construction — cross-split leakage is zero
    * structurally, not by eviction. The eviction policy
    * ([[evalHoldout]]) remains the retrofit for an already-shipped
    * split; this is what a new training run should cut.
    *
    * Scale: one equi-join of documents against the doc-bounded persisted
    * cluster assignment (near-dup members only — broadcastable in
    * practice), then the same row-local hash/bucket projection as
    * [[dataSplit]]. Nothing rescans text, no new shuffle shape.
    */
  def leakageSafeSplit(documents: DataFrame, clusters: DataFrame,
                       trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct + valPct < 100, "test share must be nonempty")
    documents.select(col("doc_id"), col("lang"))
      .join(clusters.select(col("doc_id"), col("cluster_id")),
        Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("cluster_id"), col("doc_id")).as("split_key"))
      .withColumn("split", splitOfKey(col("split_key"), trainPct, valPct))
  }

  /** One-row witness card for [[leakageSafeSplit]]: the verified
    * near-dup pair count, how many pairs straddle the PLAIN doc_id
    * split (the measured leak — non-vacuous), how many straddle the
    * cluster-keyed split (MUST be 0 — both endpoints of a verified pair
    * share a component, hence a split key), and how many documents were
    * cluster-keyed at all.
    */
  def safeSplitAudit(documents: DataFrame, clusters: DataFrame,
                     pairs: DataFrame, trainPct: Int = 90,
                     valPct: Int = 5): DataFrame = {
    val safe = leakageSafeSplit(documents, clusters, trainPct, valPct)
    val straddles = count(when(col("split1") =!= col("split2"), lit(1)))
    def joined(split: DataFrame): DataFrame = pairs
      .join(split.select(col("doc_id").as("doc_id1"),
        col("split").as("split1")), Seq("doc_id1"))
      .join(split.select(col("doc_id").as("doc_id2"),
        col("split").as("split2")), Seq("doc_id2"))
    joined(dataSplit(documents, trainPct, valPct))
      .agg(count(lit(1)).as("n_near_dup_pairs"),
        straddles.as("n_cross_docid_split"))
      .crossJoin(joined(safe.select(col("doc_id"), col("split")))
        .agg(straddles.as("n_cross_safe_split")))
      .crossJoin(safe
        .agg(count(when(col("split_key") =!= col("doc_id"), lit(1)))
          .as("n_cluster_keyed_docs")))
  }

  /** SPLIT-LEAKAGE audit — near-duplicate pairs that STRADDLE a split
    * boundary: an eval document with a train near-dup is contaminated
    * evaluation (the within-corpus twin of benchmark decontamination,
    * which guards against EXTERNAL benchmarks). `pairs` is the persisted
    * verified near-dup table (doc_id1, doc_id2, jaccard); the audit is
    * two narrow joins of that already-bounded pair set against the
    * split projection — nothing rescans text.
    *
    * A 100 TB build acts on this table by evicting the eval side (keep
    * train, re-draw eval), which is why both sides' splits are reported
    * rather than pre-resolving a drop policy here.
    */
  def splitLeakage(documents: DataFrame, pairs: DataFrame,
                   trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    val split = dataSplit(documents, trainPct, valPct)
      .select(col("doc_id"), col("split"))
    pairs
      .join(split.select(col("doc_id").as("doc_id1"),
        col("split").as("split1")), Seq("doc_id1"))
      .join(split.select(col("doc_id").as("doc_id2"),
        col("split").as("split2")), Seq("doc_id2"))
      .filter(col("split1") =!= col("split2"))
      .select(col("doc_id1"), col("split1"), col("doc_id2"), col("split2"),
        col("jaccard"))
  }

  /** The SHIPPED eval holdout — [[splitLeakage]]'s eviction policy
    * applied: the val/test documents MINUS any with a train near-dup
    * (the contaminated side is the eval doc; the train side stays, so
    * training data is never lost to holdout hygiene). val↔test
    * cross-pairs are kept — they bias no train-side metric; evicting
    * them would only shrink the holdout.
    *
    * Scale: the split is scan-side; the eviction is one anti-join
    * against the TRAIN-linked ids derived from the already-bounded
    * persisted pair table (both orientations) — nothing rescans text.
    */
  def evalHoldout(documents: DataFrame, pairs: DataFrame,
                  trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    // MEASURED, NOT barriered (r18, r17 verdict 6): the split frame
    // feeds the train-id side of both contamination semi-joins and the
    // final non-train filter — three documents-scan re-expansions. A
    // localCheckpoint barrier here A/B'd UNFAVORABLY at the r18 10×
    // tier (0.80 vs 0.74 s median at matched canary): each re-expansion
    // is a narrow column-pruned scan of a well-compressed table plus a
    // row-local hash, cheaper than the fixed checkpoint job + write —
    // unlike q_user_quartiles, whose re-expansion repeats a full
    // aggregation. Decision: keep the re-scans (also lineage-safe).
    val split = dataSplit(documents, trainPct, valPct)
    val train = split.filter(col("split") === "train").select("doc_id")
    val contaminated = pairs
      .join(train.withColumnRenamed("doc_id", "doc_id1"), Seq("doc_id1"), "left_semi")
      .select(col("doc_id2").as("doc_id"))
      .unionByName(pairs
        .join(train.withColumnRenamed("doc_id", "doc_id2"), Seq("doc_id2"), "left_semi")
        .select(col("doc_id1").as("doc_id")))
    split.filter(col("split") =!= "train")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"), col("split"))
  }
}
