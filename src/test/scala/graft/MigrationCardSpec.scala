package graft

import org.apache.spark.sql.functions._

import graft.operators.MigrationCard

/** The generic migration-evidence harness (r16 verdict 5): arms supply
  * verified candidates + a balance metric; counts, recall and
  * candidate_rate derive uniformly against one shared truth/universe.
  * [[graft.operators.Similarity.planeMigrationCard]] is the production
  * instance (its own spec pins the plane semantics); this spec pins the
  * harness arithmetic on a second, non-plane instance so the next
  * migration can lean on it directly.
  */
class MigrationCardSpec extends SparkSpec {
  import spark.implicits._

  test("counts, recall, candidate_rate and arm metrics derive uniformly") {
    val armA = Seq(true, true, false).toDF("hit")
    val armB = Seq(true).toDF("hit")
    val balA = Seq(7L).toDF("max_list_depth")
    val balB = Seq(2L).toDF("max_list_depth")
    val truth = Seq(4L).toDF("n_truth")
    val universe = Seq(10.0).toDF("n_universe")
    val got = MigrationCard.build(
      Seq(("retired-a", armA, balA), ("shipped-b", armB, balB)),
      truth, universe).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      ("retired-a", 3L, 2L, 4L, 0.5, 0.3, 7L),
      ("shipped-b", 1L, 1L, 4L, 0.25, 0.1, 2L)),
      s"harness must derive the card uniformly, family-ascending: ${got.toSeq}")
  }

  test("mismatched balance metric columns are refused loudly") {
    val arm = Seq(true).toDF("hit")
    val ex = intercept[IllegalArgumentException] {
      MigrationCard.build(
        Seq(("a", arm, Seq(1L).toDF("max_list_depth")),
          ("b", arm, Seq(1L).toDF("other_metric"))),
        Seq(1L).toDF("n_truth"), Seq(1.0).toDF("n_universe"))
    }
    assert(ex.getMessage.contains("metric columns"))
  }
}
