package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines over the
  * `documents` table (north-star extension surface): exact dedup, exact
  * n-gram Jaccard near-dup (inverted-index join), and sketch-based
  * (MinHash/SimHash) near-dup for the approximate scale path.
  *
  * Scale design:
  *  - Exact dedup groups on sha2(text) — a 32-byte shuffle key instead of
  *    the full document body; the only wide stage is one hash aggregation.
  *  - Jaccard near-dup uses the standard inverted-index candidate join:
  *    explode distinct shingles → self-join on shingle → count shared.
  *    LOSSLESS for any threshold > 0 (a pair with Jaccard > 0 shares ≥ 1
  *    shingle), unlike LSH. At 100 TB the candidate join is the bottleneck:
  *    frequent-shingle skew is handled by dropping top-frequency shingles
  *    (stopword shingles contribute candidates, not precision) and/or AQE
  *    skew-join; joining on a 64-bit shingle hash instead of the string
  *    cuts shuffle width (kept as the string here for oracle exactness).
  */
object Dedup {

  /** Token n-gram shingle set (distinct) of the `text` column.
    *
    * Built as chained `zip_with`s of the token array against its shifted
    * slices: expressions in HOF *argument* position evaluate once per row,
    * whereas an expression referenced inside a lambda body re-evaluates per
    * ELEMENT — the naive `transform(sequence(...), i -> element_at(toks, i))`
    * formulation re-splits the text ~3·|tokens| times per row (measured 10×
    * slower at sf0.1). `concat` (not concat_ws) propagates the null tail of
    * the shorter slice, which [[filter]] then drops — also covering texts
    * with fewer than n tokens (empty result).
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(text, " ")
    var cur = toks
    // NB: slice length must not overflow (start+length); Int.MaxValue yields
    // an all-null array — size(toks) is always enough to take the whole tail.
    for (j <- 1 until n)
      cur = zip_with(cur, slice(toks, lit(j + 1), size(toks)),
        (a, b) => concat(a, lit(" "), b))
    array_distinct(filter(cur, s => s.isNotNull))
  }

  /** Exact duplicate groups: one representative (min doc_id) per distinct
    * text, with the copy count. Groups on sha2-256 of the body.
    */
  def exactDuplicates(documents: DataFrame): DataFrame =
    documents
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select("doc_id", "n_copies")
      .orderBy("doc_id")

  /** Distinct-text corpus after exact dedup (keeps the min-doc_id copy). */
  def exactDedup(documents: DataFrame): DataFrame = {
    val keep = documents
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
    documents.join(keep, Seq("doc_id"), "left_semi")
  }

  /** Exact n-gram Jaccard near-duplicate pairs (doc_id1 < doc_id2,
    * jaccard ≥ threshold) via the inverted-index candidate join.
    */
  def jaccardPairs(documents: DataFrame, threshold: Double, n: Int = 3): DataFrame = {
    // Set size rides along with each exploded shingle (it is functionally
    // dependent on doc_id), so no extra join against a sizes frame — and the
    // shingle set is computed exactly once per document.
    // The repartition on the join key is a deliberate materialization
    // barrier: it stops CollapseProject from inlining the (expensive)
    // shingle expression into downstream consumers, pre-partitions BOTH
    // sides of the self-join (one exchange, reused), and computes each
    // document's shingle set exactly once.
    val ex = documents
      .select(col("doc_id"), shingles(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("shingle"))
      .repartition(col("shingle"))
    val inter = ex.as("a")
      .join(ex.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_id1"), col("b.doc_id").as("doc_id2"),
        col("a.n_sh").as("n_sh1"), col("b.n_sh").as("n_sh2"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .select(col("doc_id1"), col("doc_id2"),
        (col("n_common").cast("double") /
          (col("n_sh1") + col("n_sh2") - col("n_common"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("doc_id1", "doc_id2")
  }

  /** Per-token polynomial hashes — same scheme as
    * [[TextAnalysis.fingerprintCol]] ((acc*31+code) mod 1e9+7), applied per
    * token, so the DuckDB oracle can reproduce the values exactly.
    */
  def tokenHashes(text: Column): Column =
    transform(split(text, " "), t =>
      aggregate(
        transform(filter(split(t, ""), c => c =!= ""), c => ascii(c).cast("long")),
        lit(0L), (acc, c) => (acc * 31 + c) % 1000000007L))

  /** 64-bit shingle hashes for MinHash (xxhash64 — sketch-internal, no
    * oracle dependency on the hash values themselves).
    */
  def shingleHashes(text: Column, n: Int = 3): Column =
    transform(shingles(text, n), s => xxhash64(s))

  /** MinHash + LSH banding near-dup pairs, verified exactly.
    *
    * shingle→minhash→band→bucket-join (the classic pipeline): a k-hash
    * signature per doc (one-pass custom expression
    * [[graft.functions.MinHashSignature]]), banded into `bands` buckets;
    * docs sharing any band bucket become candidates; candidates are verified
    * with EXACT shingle-set Jaccard and filtered at `threshold`, so false
    * positives are impossible and the miss probability at j ≥ 0.8 with
    * 32 bands × 4 rows is (1-0.8⁴)³² ≈ 5e-8 — the output equals the exact
    * Jaccard pairs for practical purposes (the oracle asserts exactly that).
    *
    * Scale: candidate generation shuffles (band, bucket) pairs — k·n rows of
    * a few bytes — instead of the full shingle inverted index; verification
    * touches only candidate pairs. This is the 100 TB path where the exact
    * inverted-index join of [[jaccardPairs]] becomes too wide.
    */
  def minhashPairs(documents: DataFrame, threshold: Double = 0.8,
                   numHashes: Int = 128, bands: Int = 32): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    // Materialization barriers (repartition): without them CollapseProject
    // inlines the shingle/minhash expressions into every one of the `bands`
    // band-hash expressions AND into both self-join branches — a bands×2
    // recompute of the whole sketch pipeline per row.
    val sets = documents
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .repartition(col("doc_id"))
    val sigs = sets.select(col("doc_id"),
      graft.functions.Sketches.minhashSignature(
        transform(col("sh"), s => xxhash64(s)), numHashes, 42L).as("sig"))
      .repartition(col("doc_id"))
    // rotate-xor fold: overflow-free under ANSI mode (shift/xor only)
    val bandHashes = array((0 until bands).map(b =>
      aggregate(slice(col("sig"), b * rows + 1, rows), lit(17L),
        (acc, x) => shiftleft(acc, 1).bitwiseOR(shiftrightunsigned(acc, 63)).bitwiseXOR(x))): _*)
    val banded = sigs
      .select(col("doc_id"), posexplode(bandHashes).as(Seq("band", "bucket")))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id1"), col("b.doc_id").as("doc_id2"))
      .distinct()
    val s1 = sets.select(col("doc_id").as("doc_id1"), col("sh").as("sh1"))
    val s2 = sets.select(col("doc_id").as("doc_id2"), col("sh").as("sh2"))
    candidates
      .join(s1, "doc_id1").join(s2, "doc_id2")
      .select(col("doc_id1"), col("doc_id2"),
        (size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          (size(col("sh1")) + size(col("sh2")) -
            size(array_intersect(col("sh1"), col("sh2"))))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("doc_id1", "doc_id2")
  }

  /** SimHash near-dup pairs with EXACT hamming-≤-k semantics.
    *
    * 30-bit SimHash over token polynomial hashes (one-pass custom expression
    * [[graft.functions.SimHash]]); candidate pairs via the pigeonhole block
    * join — 3 blocks of 10 bits, so any pair within hamming distance 2 shares
    * at least one exact block (no recall loss) — then verified with
    * bit_count(xor). Fully deterministic, integer-only, hence oracle-checked.
    */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 2, bits: Int = 30,
                   blocks: Int = 3): DataFrame = {
    require(blocks > maxHamming, "need more blocks than allowed hamming distance")
    val blockBits = bits / blocks
    val mask = (1L << blockBits) - 1
    // barrier: materialize the simhash once (see minhashPairs note)
    val sigs = documents.select(col("doc_id"),
      graft.functions.Sketches.simhash(tokenHashes(col("text")), bits).as("simhash"))
      .repartition(col("doc_id"))
    val blockCols = array((0 until blocks).map(b =>
      shiftright(col("simhash"), b * blockBits).bitwiseAND(lit(mask))): _*)
    val banded = sigs.select(col("doc_id"), col("simhash"),
      posexplode(blockCols).as(Seq("block", "bval")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.block") === col("b.block") && col("a.bval") === col("b.bval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id1"), col("b.doc_id").as("doc_id2"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_id1", "doc_id2")
  }

  /** DuckDB oracle fragments. */
  object Sql {
    /** Shingle-set CTE body over `documents` (mirrors [[shingles]], n=3). */
    val shingleSets: String =
      """SELECT doc_id, list_distinct(
        |  list_transform(generate_series(1, len(t) - 2),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
        |FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)""".stripMargin
  }
}
