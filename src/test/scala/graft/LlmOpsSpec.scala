package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Specs for the LLM-data-pipeline operators (text analysis + dedup). */
class LlmOpsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf).cache()

  test("token stats: whitespace count consistent with text length") {
    val r = TextAnalysis.tokenStats(docs)
    // single-space corpus: n_tokens = spaces + 1, so text_len >= 2*n_tokens - 1
    assert(r.filter(col("n_tokens") <= 0).count() == 0)
    assert(r.filter(col("text_len") < col("n_tokens") * 2 - 1).count() == 0)
    assert(r.filter(col("n_bpe_tokens") < col("n_tokens")).count() == 0)
  }

  test("quality score stays in [0,1] and ratios in range") {
    val r = TextAnalysis.qualityScore(docs)
    assert(r.filter(col("quality") < 0 || col("quality") > 1).count() == 0)
    assert(r.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1).count() == 0)
    assert(r.filter(col("unique_ratio") <= 0 || col("unique_ratio") > 1).count() == 0)
  }

  test("language id predicts a known language for every doc") {
    val r = TextAnalysis.languageId(docs)
    val langs = r.select("predicted_lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(TextAnalysis.LangSets.map(_._1).toSet))
    assert(r.count() == docs.count())
  }

  test("fingerprint is deterministic and content-sensitive") {
    val r1 = TextAnalysis.fingerprints(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r2 = TextAnalysis.fingerprints(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == r2)
    // distinct texts should essentially never collide with a 1e9+7 modulus at this corpus size
    assert(r1.values.toSet.size > docs.count() * 9 / 10)
  }

  test("exact dedup: representatives + copies account for every doc") {
    val dups = Dedup.exactDuplicates(docs)
    assert(dups.agg(sum("n_copies")).head().getLong(0) == docs.count())
    val deduped = Dedup.exactDedup(docs)
    assert(deduped.count() == dups.count())
  }

  test("shingles: short texts yield empty sets, no descending-sequence blowup") {
    import spark.implicits._
    val tiny = Seq((1L, "one two"), (2L, "one two three"), (3L, "a b c d")).toDF("doc_id", "text")
    val r = tiny.select(col("doc_id"), size(Dedup.shingles(col("text"))).as("n")).collect()
      .map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r(1L) == 0)
    assert(r(2L) == 1)
    assert(r(3L) == 2)
  }

  test("jaccard pairs: symmetric-free, thresholded, and self-consistent") {
    val pairs = Dedup.jaccardPairs(docs, 0.5).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(r => r.getDouble(2) >= 0.5 && r.getDouble(2) <= 1.0))
    // identical docs (if any) must appear with jaccard == 1.0 — cross-check a planted pair
    val withDup = docs.union(docs.limit(1).withColumn("doc_id", col("doc_id") + 1000000L))
    val planted = Dedup.jaccardPairs(withDup, 0.99)
      .filter(col("doc_id2") === col("doc_id1") + 1000000L)
    assert(planted.count() == 1)
  }
}
