package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pii, Similarity, TextAnalysis}

/** Round-14 additions: k-anonymity release governance, segment-level
  * code-switching, and JL random-projection compression.
  */
class GovernanceJlSpec extends SparkSpec {
  import spark.implicits._

  // ===== k-anonymity =====

  private val kFixture = Seq(
    // class (1, "A", band 0): 5 rows, 5 distinct balances — meets k=5, l=5
    (1, "A", 100.0), (1, "A", 101.0), (1, "A", 102.0),
    (1, "A", 103.0), (1, "A", 104.0),
    // class (2, "B", band 1): 2 rows, ONE shared balance — below k, l=1
    (2, "B", 1500.0), (2, "B", 1500.0)
  ).toDF("c_nationkey", "c_mktsegment", "c_acctbal")

  test("kAnonymity: class sizes, k flag, and sensitive diversity per QI tuple") {
    val r = Pii.kAnonymity(kFixture, k = 5).collect()
    assert(r.length == 2)
    val a = r(0) // ordered by QI tuple
    assert(a.getInt(0) == 1 && a.getString(1) == "A" && a.getLong(2) == 0L)
    assert(a.getLong(3) == 5L && a.getInt(4) == 1 && a.getLong(5) == 5L)
    val b = r(1)
    assert(b.getInt(0) == 2 && b.getLong(2) == 1L)
    assert(b.getLong(3) == 2L && b.getInt(4) == 0 && b.getLong(5) == 1L)
  }

  test("kAnonymityCard: k_min/l_min and the suppression ledger") {
    val c = Pii.kAnonymityCard(kFixture, k = 5).head()
    assert(c.getLong(0) == 7L)           // n_rows
    assert(c.getLong(1) == 2L)           // n_classes
    assert(c.getLong(2) == 2L)           // k_min
    assert(c.getLong(3) == 1L)           // l_min
    assert(c.getLong(4) == 1L)           // n_classes_below_k
    assert(c.getLong(5) == 2L)           // n_rows_below_k
    assert(math.abs(c.getDouble(6) - 2.0 / 7.0) < 1e-15) // suppressed_frac
  }

  test("kAnonymity: banding generalizes — distinct balances in one band share a class") {
    val df = Seq((1, "A", 200.0), (1, "A", 999.99), (1, "A", 1000.0))
      .toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val r = Pii.kAnonymity(df, k = 2).collect()
    assert(r.length == 2) // band 0 holds the first two, band 1 the third
    assert(r(0).getLong(3) == 2L && r(1).getLong(3) == 1L)
  }

  // ===== code-switching =====

  private val xySets = Seq("x" -> Seq("x"), "y" -> Seq("y"))

  private def switchRow(text: String) =
    TextAnalysis.codeSwitch(
      Seq((1L, text, "en", "src0")).toDF("doc_id", "text", "lang", "source"),
      segLen = 2, sets = xySets).head()

  test("codeSwitch: segment votes, majority, switch count, mixed flag") {
    // segments: [x,x]->x  [y,y]->y  [x,x]->x
    val r = switchRow("x x y y x x")
    assert(r.getLong(2) == 3L)       // n_segments
    assert(r.getLong(3) == 3L)       // n_detected
    assert(r.getLong(4) == 2L)       // n_langs
    assert(r.getString(5) == "x")    // majority (x:2 vs y:1)
    assert(r.getLong(6) == 2L)       // switches x->y->x
    assert(r.getInt(7) == 1)         // mixed
  }

  test("codeSwitch: undetectable segments are 'und' and excluded from votes") {
    val r = switchRow("z z z z")
    assert(r.getLong(2) == 2L && r.getLong(3) == 0L && r.getLong(4) == 0L)
    assert(r.getString(5) == "und" && r.getLong(6) == 0L && r.getInt(7) == 0)
  }

  test("codeSwitch: single detected segment — no switch, not mixed") {
    val r = switchRow("x x")
    assert(r.getLong(2) == 1L && r.getLong(3) == 1L && r.getLong(4) == 1L)
    assert(r.getString(5) == "x" && r.getLong(6) == 0L && r.getInt(7) == 0)
  }

  test("codeSwitch: within-segment score tie breaks to the first lexicon") {
    val r = switchRow("x y") // one segment, x:1 y:1 — first set wins
    assert(r.getString(5) == "x")
  }

  test("codeSwitch over the corpus with RegisterSets is non-vacuous") {
    val r = TextAnalysis.codeSwitch(Tables.documents(spark, sf),
      sets = TextAnalysis.RegisterSets)
    val agg = r.agg(sum("mixed"), sum("n_switches"), count(lit(1))).head()
    assert(agg.getLong(0) > 0L, "no mixed documents — vacuous card")
    assert(agg.getLong(1) > 0L, "no register switches — vacuous card")
    assert(agg.getLong(2) == Tables.documents(spark, sf).count())
  }

  // ===== JL projection =====

  test("jlProject: squared norms approximately preserved on the real embeddings") {
    val r = Similarity.jlProject(Tables.embeddings(spark, sf))
    val stats = r.agg(min("norm_ratio"), avg("norm_ratio"), max("norm_ratio"),
      count(lit(1))).head()
    assert(stats.getDouble(0) > 0.0, "a projected norm collapsed to zero")
    assert(stats.getDouble(1) > 0.5 && stats.getDouble(1) < 1.5,
      s"norm-ratio mean ${stats.getDouble(1)} far from the unbiased 1.0")
    assert(stats.getLong(3) > 0)
  }

  test("jlProject is deterministic (closed-form planes, no RNG)") {
    val a = Similarity.jlProject(Tables.embeddings(spark, sf)).collect()
    val b = Similarity.jlProject(Tables.embeddings(spark, sf)).collect()
    assert(a.sameElements(b))
  }

  test("jlDistortion: full constant pair budget, positive ratios, sane band") {
    val c = Similarity.jlDistortion(Tables.embeddings(spark, sf)).head()
    assert(c.getLong(0) == (32L * 31L) / 2L) // all C(32,2) pairs survive
    assert(c.getDouble(1) > 0.0)             // min_ratio
    val avg = c.getDouble(3)
    assert(avg > 0.5 && avg < 1.5, s"avg distortion ratio $avg far from 1")
    assert(c.getLong(4) <= c.getLong(0))     // n_within <= n_pairs
  }

  test("jlDistortion: average folds sorted — partitioning cannot move a bit") {
    val one = Similarity.jlDistortion(
      Tables.embeddings(spark, sf).repartition(1)).head().getDouble(3)
    val many = Similarity.jlDistortion(
      Tables.embeddings(spark, sf).repartition(7)).head().getDouble(3)
    assert(one == many)
  }
}
