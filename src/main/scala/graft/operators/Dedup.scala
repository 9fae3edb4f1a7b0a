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

  /** Token 3-gram shingle set (distinct) of the `text` column. Spark's
    * `sequence(0, k)` turns DESCENDING for k < 0, so short texts (< n tokens)
    * are guarded to an empty set explicitly.
    */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = split(text, " ")
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))))
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
    val sets = documents
      .select(col("doc_id"), shingles(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val sizes = sets.select(col("doc_id"), size(col("sh")).as("n_sh"))
    val ex = sets.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val inter = ex.as("a")
      .join(ex.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_id1"), col("b.doc_id").as("doc_id2"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.as("s1"), col("doc_id1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("doc_id2") === col("s2.doc_id"))
      .select(col("doc_id1"), col("doc_id2"),
        (col("n_common").cast("double") /
          (col("s1.n_sh") + col("s2.n_sh") - col("n_common"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
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
