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

  /** ONE-scan audit counts over a per-query ranked surface (r14 verdict
    * 3): the recall frame is scanned ONCE with a broadcast tombstone
    * flag; the serving gate's close-up-and-cut applies in place — for an
    * unflagged row, the running count of unflagged rows in rank order IS
    * [[topKWithTakedown]]'s row_number over the anti-joined survivors
    * (pinned by the gate≡audit parity spec) — and one aggregate returns
    * both compliance counts: `n_leaked_<name>` (tombstoned rows inside
    * the served cut) and `n_suppressed_<name>` (tombstoned rows anywhere
    * in the recall). CONSUMER NOTE (r15 ADVICE): in this one-scan form
    * `n_leaked_*` ATTESTS CONSTRUCTION, NOT MEASUREMENT — the leak
    * predicate contradicts the served definition computed in the same
    * expression, so the column is structurally zero and can never fire
    * on a gate regression (exactly as the served path's anti-join makes
    * it). The MANDATORY regression tripwires are (a) the gate≡audit
    * parity spec ([[topKAuditServed]] vs [[topKWithTakedown]]) and
    * (b) each surface's DuckDB oracle, whose SQL bakes the suppression
    * predicate in; a downstream compliance consumer must read
    * `n_leaked_* = 0` as "the gate is applied by construction on this
    * export", not as an independent audit of the serving path.
    */
  def topKAuditCounts(topk: DataFrame, tombstones: DataFrame, serveK: Int,
                      name: String, idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy("rank")
    tombFlagged(topk, tombstones, idCol, "tombstoned")
      .withColumn("served", !col("tombstoned") &&
        sum(when(col("tombstoned"), 0L).otherwise(1L)).over(w) <= serveK)
      .agg(
        count(when(col("tombstoned") && col("served"), lit(1)))
          .as(s"n_leaked_$name"),
        count(when(col("tombstoned"), lit(1))).as(s"n_suppressed_$name"))
  }

  /** The served slice of [[topKAuditCounts]]'s flagged pass, in
    * [[topKWithTakedown]]'s output shape — exists for the parity spec
    * that pins the audit's in-place gate to the serving gate.
    */
  private[graft] def topKAuditServed(topk: DataFrame, tombstones: DataFrame,
                                     serveK: Int,
                                     idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy("rank")
    tombFlagged(topk, tombstones, idCol, "tombstoned")
      .withColumn("rank_t",
        sum(when(col("tombstoned"), 0L).otherwise(1L)).over(w))
      .filter(!col("tombstoned") && col("rank_t") <= serveK)
      .drop("rank").withColumnRenamed("rank_t", "rank")
      .select(topk.columns.map(col).toIndexedSeq: _*)
      .orderBy("query_id", "rank")
  }

  /** ONE-scan audit counts over an undirected pair surface: both
    * endpoint flags ride broadcast joins on the single scan; a pair is
    * suppressed when EITHER endpoint is tombstoned and served otherwise
    * ([[pairsWithTakedown]] semantics). Leak accounting counts
    * tombstoned ENDPOINTS inside served pairs (the served-path audit
    * exploded endpoints) — zero by construction, as above.
    */
  def pairsAuditCounts(pairs: DataFrame, tombstones: DataFrame,
                       name: String, id1: String = "id1",
                       id2: String = "id2"): DataFrame =
    tombFlagged(tombFlagged(pairs, tombstones, id1, "t1"),
        tombstones, id2, "t2")
      .agg(
        coalesce(sum(when(!(col("t1") || col("t2")),
            col("t1").cast("long") + col("t2").cast("long"))
          .otherwise(0L)), lit(0L)).as(s"n_leaked_$name"),
        count(when(col("t1") || col("t2"), lit(1)))
          .as(s"n_suppressed_$name"))

  /** Broadcast tombstone FLAG join — [[suppress]]'s anti-join with the
    * verdict kept instead of applied, so one scan can feed both sides
    * of the audit accounting.
    */
  private def tombFlagged(df: DataFrame, tombstones: DataFrame,
                          idCol: String, flagCol: String): DataFrame =
    df.join(broadcast(tombstones.select(col("doc_id").as(idCol),
        lit(true).as(flagCol))), Seq(idCol), "left")
      .withColumn(flagCol, coalesce(col(flagCol), lit(false)))
}
