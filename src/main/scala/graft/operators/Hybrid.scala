package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RECIPROCAL-RANK-FUSION hybrid retrieval — the PARALLEL composition of
  * the lexical and vector endpoints (the `q_hybrid_search` cascade runs
  * lexical recall THEN vector rerank; production "hybrid search" in
  * Elasticsearch/Vespa/pgvector runs both rankers INDEPENDENTLY and fuses
  * their rank lists): fused(d) = Σ_lists 1/(rrfK + rank_list(d)), the
  * standard RRF with k = 60 (Cormack & Clarke's constant). RRF is the
  * fusion of choice precisely because it consumes only RANKS — BM25
  * scores and cosines are incommensurable scales, and rank arithmetic is
  * also what keeps the whole operator engine-exact: 1/(60+rank) is one
  * IEEE division of small integers and the two contributions add in a
  * fixed order (lexical first), so the fused score is bit-identical on
  * any engine.
  *
  * The registry instance is "MORE-LIKE-THIS" hybrid retrieval for the
  * corpus-prefix query documents: each query doc contributes its top
  * `nTerms` SALIENT terms (highest rational-idf-weighted tf — real
  * systems select query terms exactly so the postings semi-join stays
  * bounded by rare terms instead of exploding on stopwords) to the
  * lexical ranker, and its embedding to the sign-LSH vector ranker
  * (vec_id = doc_id: the corpus ships one embedding per document — the
  * testdata contract every cross-table consumer shares). Both sides
  * exclude the query document itself and rank their own top `kIn`; the
  * fusion sees only those two bounded lists.
  *
  * Scale shape: term selection is a narrow aggregate over the QUERY
  * docs' tokens joined broadcast to the lexicon; the lexical ranker is
  * the [[TextAnalysis.keywordSearchForQueries]] shape (postings equi-join
  * on the selected terms — bounded by Σ df(term), which salient-term
  * selection keeps small); the vector ranker is the persisted band-triple
  * probe of [[Similarity.lshTopKServeFrom]]; the fusion itself joins two
  * ≤ queries·kIn-row frames. Nothing rescans the corpus.
  */
object Hybrid {

  /** Per-query salient terms: the query document's top `nTerms` tokens by
    * rational-idf-weighted tf (w = tf·(N−df+0.5)/(df+0.5), the
    * [[TextAnalysis.keywordSearch]] weight applied to the QUERY side),
    * ties broken by token — a total, engine-exact order.
    */
  def salientTerms(documents: DataFrame, lexicon: DataFrame, nTotal: Long,
                   numQueries: Int = 5, nTerms: Int = 8): DataFrame = {
    val qtf = documents.filter(col("doc_id") < numQueries)
      .select(col("doc_id").as("query_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("query_id", "tok").agg(count(lit(1)).as("qtf"))
    val w = Window.partitionBy("query_id").orderBy(col("w").desc, col("tok"))
    // broadcast the QUERY side: qtf is a few docs' distinct tokens, the
    // lexicon is vocabulary-sized (millions of rows at corpus scale) and
    // must stream past the broadcast, never ship to every executor
    lexicon.join(broadcast(qtf), Seq("tok"))
      .withColumn("w",
        col("qtf") * (lit(nTotal) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      .withColumn("trank", row_number().over(w))
      .filter(col("trank") <= nTerms)
      .select("query_id", "tok")
  }

  /** Lexical more-like-this top-k from the persisted inverted index:
    * [[TextAnalysis.keywordSearchForQueries]]'s scoring (identical
    * rational idf, identical sorted-term fold) with the query document
    * itself excluded BEFORE the rank window — an MLT result of "the query
    * doc" is vacuous, and dropping it after ranking would waste a slot.
    */
  def mltLexicalTopK(index: TextAnalysis.SearchIndex, terms: DataFrame,
                     k: Int = 20): DataFrame = {
    val tf = index.postings.join(broadcast(terms), Seq("tok"))
    val rw = Window.partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))
    tf.join(broadcast(index.lexicon
          .join(broadcast(terms.select("tok").distinct()), Seq("tok"))),
        Seq("tok"))
      .withColumn("w",
        col("tf") * (lit(index.nTotal) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy("query_id", "doc_id")
      .agg(aggregate(array_sort(collect_list(struct(col("tok"), col("w")))),
        lit(0.0), (acc, x) => acc + x.getField("w")).as("score"))
      .withColumn("rank", row_number().over(rw).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Fuse two per-query rank lists by reciprocal rank: each side
    * contributes 1/(rrfK + rank) where it ranked the doc and exactly 0.0
    * where it did not (rank sentinel 0 = "absent from this list" — the
    * hash-checked surface carries no nulls); contributions add in fixed
    * a-then-b order. Final rank: row_number over (rrf_score DESC, doc_id)
    * per query, top `k`.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int = 10,
              rrfK: Int = 60): DataFrame = {
    val aa = a.select(col("query_id"), col("doc_id"), col("rank").as("a_rank"))
    val bb = b.select(col("query_id"), col("doc_id"), col("rank").as("b_rank"))
    val rw = Window.partitionBy("query_id").orderBy(col("rrf_score").desc, col("doc_id"))
    aa.join(bb, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"),
        coalesce(col("a_rank"), lit(0L)).as("a_rank"),
        coalesce(col("b_rank"), lit(0L)).as("b_rank"))
      .withColumn("rrf_score",
        when(col("a_rank") > 0, lit(1.0) / (lit(rrfK.toDouble) + col("a_rank"))).otherwise(lit(0.0))
          + when(col("b_rank") > 0, lit(1.0) / (lit(rrfK.toDouble) + col("b_rank"))).otherwise(lit(0.0)))
      .withColumn("rank", row_number().over(rw).cast("long"))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** Persist the default-parameter MLT-RRF answer — the
    * q_ivfpq_topk/annserve-v6 amortization discipline applied to the
    * fusion: both input rankers already serve from persisted families,
    * but the composition (two rank windows, a full-outer fuse, a third
    * window) was the registry's heaviest per-call query. It now runs once
    * per (documents, embeddings) snapshot PAIR — the stamp combines both
    * source fingerprints, so either table regenerating rebuilds — and the
    * registry serves one scan. [[mltHybridRrf]] stays the any-parameter
    * path.
    */
  def persistRrf(documents: DataFrame, index: TextAnalysis.SearchIndex,
                 embeddings: DataFrame, bands: DataFrame,
                 dir: String, stamp: String): Unit = {
    mltHybridRrf(documents, index, embeddings, bands)
      .write.mode("overwrite").parquet(s"$dir/topk")
    graft.sources.SnapshotStore.commit(documents.sparkSession, dir, stamp)
  }

  /** The composed MORE-LIKE-THIS RRF endpoint the registry serves:
    * salient-term lexical top-kIn ∥ LSH-served cosine top-kIn → RRF.
    * `embeddings`/`bands` are the annserve family's tables; vec_id is
    * renamed under the vec_id = doc_id corpus contract.
    */
  def mltHybridRrf(documents: DataFrame, index: TextAnalysis.SearchIndex,
                   embeddings: DataFrame, bands: DataFrame,
                   numQueries: Int = 5, kIn: Int = 20, k: Int = 10,
                   nTerms: Int = 8, rrfK: Int = 60): DataFrame = {
    val terms = salientTerms(documents, index.lexicon, index.nTotal,
      numQueries, nTerms)
    val lex = mltLexicalTopK(index, terms, kIn)
    val vec = Similarity.lshTopKServeFrom(embeddings, bands, numQueries, kIn)
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("rank").cast("long").as("rank"))
    rrfFuse(lex, vec, k, rrfK)
      .select(col("query_id"), col("doc_id"),
        col("a_rank").as("lex_rank"), col("b_rank").as("vec_rank"),
        col("rrf_score"), col("rank"))
  }
}
