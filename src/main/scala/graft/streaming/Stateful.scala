package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class StreakAlert(city: String, streak: Int, last_ts: Timestamp)

/** Custom keyed state beyond windowed aggregation (SURVEY.md §7.2 M3 /
  * build-brief Structured Streaming bullet): per-city consecutive
  * high-severity streak detection via `flatMapGroupsWithState` — state that
  * no built-in window operator expresses (a streak crosses micro-batch
  * boundaries and resets on any low-severity event).
  *
  * Emits one [[StreakAlert]] each time a city's consecutive run of
  * high/critical events reaches `minStreak`. State per key is a single Int —
  * bounded, and at cluster scale partitioned by city across the state store.
  * Within a batch, a group's rows are processed in event-time order for
  * determinism (micro-batch iterator order is not guaranteed).
  *
  * Memory note: the `toSeq.sortBy` buffers one (city, micro-batch) group to
  * establish that order — Structured Streaming offers no secondary sort
  * under `flatMapGroupsWithState` (pre-sorting a streaming Dataset before a
  * stateful op is rejected at analysis), so ordered traversal implies
  * buffering the group. Per-batch group size is the quantity to bound
  * operationally (`maxOffsetsPerTrigger` / trigger cadence); the STATE
  * stays O(1) per city regardless. A batch-mode caller with huge groups
  * should use the window-function streak formulation instead.
  */
object Stateful {

  def severityStreaks(normalized: DataFrame, minStreak: Int = 3): Dataset[StreakAlert] = {
    val spark = normalized.sparkSession
    import spark.implicits._
    normalized
      .selectExpr("city", "severity", "ts")
      .as[(String, String, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (city: String, rows: Iterator[(String, String, Timestamp)], state: GroupState[Int]) =>
          var streak = state.getOption.getOrElse(0)
          val alerts = scala.collection.mutable.ArrayBuffer.empty[StreakAlert]
          rows.toSeq.sortBy(_._3.getTime).foreach { case (_, severity, ts) =>
            if (severity == "high" || severity == "critical") {
              streak += 1
              if (streak == minStreak) alerts += StreakAlert(city, streak, ts)
            } else streak = 0
          }
          state.update(streak)
          alerts.iterator
      }
  }
}
