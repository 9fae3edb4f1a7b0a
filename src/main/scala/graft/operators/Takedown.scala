package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TAKEDOWN PROPAGATION — the deletion-compliance surface (GDPR erasure,
  * DMCA, opt-out lists): once a document enters the takedown set it must
  * stop being SERVED everywhere, immediately, without waiting for the
  * next index rebuild. The mechanism is the log-structured stores' own
  * discipline turned around: a tombstone table + a serve-time anti-join
  * (merge-on-read of a DELETION delta), with the next snapshot rebuild /
  * compaction folding the removals in permanently — serving never blocks
  * on reconstruction.
  *
  * Two serving shapes need more than a bare anti-join:
  *  - RANKED answers must re-rank after suppression: a top-k with holes
  *    leaks WHERE the removed document ranked (position is information —
  *    an erasure that leaves a gap at rank 3 tells the consumer there
  *    was something at rank 3), and downstream consumers assume
  *    contiguous ranks.
  *  - Fixed-size answers need BACKFILL: suppression from a k-deep answer
  *    silently narrows it, so the serving path recalls DEEPER than it
  *    serves (`recallK > serveK`) and cuts after suppression — full
  *    budget as long as fewer than `recallK − serveK` of the recalled
  *    candidates are tombstoned; beyond that the answer narrows honestly
  *    (documented, never padded).
  *
  * Scale shape: takedown sets are request-scaled (legal/opt-out queues —
  * thousands, not corpus-scaled), so the anti-join rides a broadcast;
  * re-ranking windows are per-query over ≤ recallK rows. Nothing
  * corpus-sized moves.
  *
  * Registry fixture: `doc_id % 13 = 6` — a deterministic residue class,
  * coprime to the %11 benchmark split and the %3/%5/%7 PII-injection
  * classes, chosen (measured at all three SFs) to intersect BOTH served
  * surfaces so the suppression path is non-vacuous everywhere.
  */
object Takedown {

  /** The registry's deterministic takedown fixture: (doc_id, reason). */
  def tombstones(documents: DataFrame): DataFrame =
    documents
      .filter(pmod(col("doc_id"), lit(13)) === 6)
      .select(col("doc_id"), lit("erasure_request").as("reason"))

  /** Bare serve-time suppression: drop every served row whose `idCol`
    * is tombstoned (one broadcast anti-join — the composable primitive;
    * apply to any family output whose rows carry a document id).
    */
  def suppress(served: DataFrame, tombstones: DataFrame,
               idCol: String = "doc_id"): DataFrame =
    served.join(broadcast(tombstones.select(col("doc_id").as(idCol))),
      Seq(idCol), "left_anti")

  /** Suppress + re-cut a GLOBAL ranked answer (no query key): surviving
    * rows keep their relative order (re-sorted on the original ordering
    * columns) and the answer is cut to `serveK` — rank stays POSITIONAL,
    * as in the un-suppressed search serving, so this compiles to
    * TakeOrderedAndProject (never a partition-less Window — the
    * single-reducer anti-pattern the plan guard bans). Feed it a deeper
    * recall than you serve.
    */
  def servedWithTakedown(deep: DataFrame, tombstones: DataFrame,
                         order: Seq[Column], serveK: Int): DataFrame =
    suppress(deep, tombstones)
      .orderBy(order: _*)
      .limit(serveK)

  /** Suppress + re-rank a PER-QUERY ranked answer on its existing `rank`
    * column: surviving rows keep relative order within each query, ranks
    * close up contiguously, cut to `serveK`. `idCol` names the served
    * row's document identity (`media_id` for the cross-modal surface —
    * media derive from documents, so the SAME tombstone set gates every
    * modality; round-13 verdict 7).
    */
  def topKWithTakedown(topk: DataFrame, tombstones: DataFrame,
                       serveK: Int, idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy("rank")
    suppress(topk, tombstones, idCol)
      .withColumn("rank_t", row_number().over(w).cast("long"))
      .filter(col("rank_t") <= serveK)
      .drop("rank").withColumnRenamed("rank_t", "rank")
      // the anti-join moved its key column first; restore the input's
      // column order so consumers read positions unchanged
      .select(topk.columns.map(col).toIndexedSeq: _*)
      .orderBy("query_id", "rank")
  }

  /** Suppress an UNDIRECTED pair surface (near-dup pairs, neighbor
    * lists) on BOTH endpoints: a pair touching a tombstoned document
    * leaks that document's existence and similarity structure from
    * either side, so it drops whichever side matches. Two broadcast
    * anti-joins; input column order restored (round-13 verdict 7 — the
    * media family's serving gate).
    */
  def pairsWithTakedown(pairs: DataFrame, tombstones: DataFrame,
                        id1: String = "id1", id2: String = "id2"): DataFrame =
    suppress(suppress(pairs, tombstones, id1), tombstones, id2)
      .select(pairs.columns.map(col).toIndexedSeq: _*)

  /** The compliance witness: for each suppressed surface, the count of
    * tombstoned ids still present (MUST be 0) next to the suppression
    * accounting — how many recalled rows the takedown removed. One row.
    */
  def takedownAudit(tombs: DataFrame,
                    surfaces: Seq[(String, DataFrame)]): DataFrame = {
    val t = tombs.select("doc_id")
    val nT = tombs.agg(count(lit(1)).as("n_tombstones"))
    surfaces.foldLeft(nT) { case (acc, (name, served)) =>
      acc
        .crossJoin(served.join(broadcast(t), Seq("doc_id"), "left_semi")
          .agg(count(lit(1)).as(s"n_leaked_$name")))
    }
  }
}
