package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reusable closed-form-family MIGRATION-EVIDENCE harness (r16 verdict
  * 5) — the two-arms / shared-truth / recall-rate-balance shape the
  * r15→r16 plane-family migration proved out
  * ([[Similarity.planeMigrationCard]], the first instance), factored so
  * the NEXT family migration (tokenizer vocab, quality thresholds, hash
  * families, blocking grids) lands with hash-checked evidence by
  * default instead of by bespoke code.
  *
  * The shape: N arms — the retired family, the shipped family, any
  * challenger — each contributing
  *
  *  - its VERIFIED candidate rows: one row per candidate the arm
  *    proposes, with a boolean `hit` column = "verified against the
  *    arm-independent exact criterion" (cosine ≥ t, exact Jaccard ≥ t,
  *    token-level equality — whatever the family is recalled against);
  *  - a 1-row balance frame carrying the arm's hot-key-exposure
  *    metric(s) (largest band-bucket population, deepest posting list —
  *    the column(s) that tell a 100 TB operator which arm's join has
  *    the worse worst key). All arms MUST share the metric column
  *    name(s) — the card unions them.
  *
  * plus ONE shared ground truth (1-row frame, column `n_truth`, counted
  * by the exact method every arm is recalled against — sharing it is
  * what makes the arms comparable) and ONE shared universe size (1-row
  * frame, column `n_universe` — candidate_rate's denominator, e.g. the
  * rep-pair count). The card is one row per arm:
  * `(family, n_candidates, n_found, n_truth, recall, candidate_rate,
  * <balance metrics>)`, `family`-ascending — so "the new family is
  * strictly better" is a hash-checked TABLE instead of prose, and its
  * DuckDB oracle mirrors arithmetic this harness fixes once
  * (`n_found / n_truth`, `n_candidates / n_universe`, both as double
  * divisions of the already-aggregated counts).
  *
  * Scale shape: per arm one count-aggregate over its verified
  * candidates (map-side combinable); the truth/universe crossJoins are
  * 1-row broadcasts. Like every evidence card, this is built once per
  * snapshot and served as a scan — the registry's persisted-card
  * discipline.
  */
object MigrationCard {

  def build(arms: Seq[(String, DataFrame, DataFrame)],
            truth: DataFrame, universe: DataFrame): DataFrame = {
    require(arms.nonEmpty, "a migration card needs at least one arm")
    val metricCols = arms.head._3.columns.toSeq
    require(arms.forall(_._3.columns.toSeq == metricCols),
      s"every arm's balance frame must carry the same metric columns: $metricCols")
    val perFamily = arms.map { case (family, verified, _) =>
      verified.agg(
        count(lit(1)).as("n_candidates"),
        count(when(col("hit"), lit(1))).as("n_found"))
        .withColumn("family", lit(family))
    }.reduce(_.unionByName(_))
    val balance = arms.map { case (family, _, b) =>
      b.withColumn("family", lit(family))
    }.reduce(_.unionByName(_))
    perFamily.join(balance, Seq("family"))
      .crossJoin(broadcast(truth))
      .crossJoin(broadcast(universe))
      .select(Seq(col("family"), col("n_candidates"), col("n_found"),
        col("n_truth"),
        (col("n_found").cast("double") / col("n_truth")).as("recall"),
        (col("n_candidates").cast("double") / col("n_universe"))
          .as("candidate_rate")) ++ metricCols.map(col): _*)
      .orderBy("family")
  }
}
