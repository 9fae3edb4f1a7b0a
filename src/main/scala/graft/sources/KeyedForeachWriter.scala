package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, ForeachWriter, Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.StreamExecution
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Row-level keyed sink implementing the reference's only custom extension
  * point: the DynamoDB `ForeachWriter` (consumer
  * `SparkDynamoDBConsumer.java:202-283`) with its full lifecycle contract —
  *
  *  - `open(partitionId, epochId)` acquires the per-partition "connection"
  *    (here: a write buffer + the store handle; the reference builds its
  *    DynamoDB client per partition) and returns **false to skip the
  *    partition** when this (writer, epoch, partition) is already durably
  *    committed — that is the replay-idempotence half of effectively-once
  *    (T7);
  *  - `process(row)` stages one keyed record; any exception propagates —
  *    Spark fails the task and retries it, re-invoking `open` for the same
  *    epoch (the reference's rethrow-to-retry, consumer :258-271) (T8);
  *  - `close(error)` commits atomically on success (temp file → rename →
  *    commit marker) and leaves NOTHING on failure, so a half-written
  *    attempt is invisible to readers and to the retry.
  *
  * Replay fencing is WRITER-SCOPED, like [[KeyedUpsertSink]]'s (round-5
  * ADVICE-1 class of defect): the marker path embeds the owning streaming
  * query's durable queryId (read from the `sql.streaming.queryId` local
  * property, which Spark ships to tasks; `default` for driver-side/ad-hoc
  * use). A bare `(epoch, partition)` fence silently skipped every
  * partition after a checkpoint was deleted/recreated (epochs restart at
  * 0 under a marker that already exists) — with the writer in the path, a
  * new checkpoint is a new writer and its rows always land, while the
  * same writer's replays still skip (spec'd in ForeachSinkSpec).
  *
  * Rows must carry the producer wire shape `(key: String, value: String)`
  * ([[graft.streaming.EventStreamSource.toKafkaRecords]]);
  * [[KeyedForeachWriter.read]] resolves last-writer-wins per key across
  * epochs — DynamoDB putItem semantics over an append-only log, the
  * log-structured cousin of [[KeyedUpsertSink]]. Cross-WRITER ordering has
  * no store-assigned sequence at row granularity (that needs the columnar
  * store's commit log): the LWW view orders by (epoch, writer, seq),
  * exact per writer and deterministic — not arrival-ordered — across
  * writers.
  */
class KeyedForeachWriter(storeDir: String) extends ForeachWriter[Row] {

  @transient private var buf: scala.collection.mutable.ArrayBuffer[String] = _
  private var part: Long = -1L
  private var epoch: Long = -1L
  private var seq: Long = 0L
  private var writer: String = _

  private def fs = new Path(storeDir).getFileSystem(new Configuration())
  private def commitPath = new Path(s"$storeDir/commits/$writer-$epoch-$part")
  private def dataPath = new Path(s"$storeDir/data/$writer-$epoch-$part.log")

  /** The owning query's durable id, resolved ON THE EXECUTOR at open time
    * (local properties travel with the task; stable across restarts of one
    * checkpoint, fresh for a recreated one). Sanitized: it becomes a path
    * segment and a record field.
    */
  private def resolveWriter(): String = {
    val raw = Option(TaskContext.get())
      .flatMap(tc => Option(tc.getLocalProperty(StreamExecution.QUERY_ID_KEY)))
      .getOrElse("default")
    raw.map(c => if (c.isLetterOrDigit || c == '-') c else '_')
  }

  override def open(partitionId: Long, epochId: Long): Boolean = {
    part = partitionId; epoch = epochId; seq = 0L
    writer = resolveWriter()
    val f = fs
    f.mkdirs(new Path(s"$storeDir/commits"))
    f.mkdirs(new Path(s"$storeDir/data"))
    if (f.exists(commitPath)) {
      false // epoch already durable for this (writer, partition): replay, skip
    } else {
      buf = new scala.collection.mutable.ArrayBuffer[String]
      true
    }
  }

  override def process(row: Row): Unit = {
    // 0x01-separated record: (epoch, writer, seq) orders the LWW read.
    // A thrown exception here fails the task — Spark retries the partition
    // and close(error) below guarantees the aborted attempt left no trace.
    buf += Seq(writer, epoch.toString, seq.toString,
      row.getAs[String]("key"), row.getAs[String]("value"))
      .mkString(KeyedForeachWriter.Sep)
    seq += 1L
  }

  override def close(errorOrNull: Throwable): Unit = {
    if (errorOrNull != null || buf == null) { buf = null; return }
    val f = fs
    val tmp = new Path(s"$storeDir/data/.tmp-$writer-$epoch-$part")
    val out = f.create(tmp, true)
    out.write(buf.mkString("\n").getBytes(UTF_8))
    out.close()
    f.rename(tmp, dataPath)
    f.create(commitPath, true).close() // marker last: commit point
    buf = null
  }
}

object KeyedForeachWriter {

  /** Field separator (0x01 — cannot appear in the JSON wire values). */
  val Sep: String = "\u0001"

  /** Last-writer-wins view of the append-only store: latest
    * (epoch, writer, seq) per key — the reader-side equivalent of DynamoDB
    * putItem upserts (exact within a writer; deterministic writer-id
    * tie-break across writers, see the class doc).
    */
  def read(spark: SparkSession, storeDir: String): DataFrame = {
    val parts = split(col("value"), Sep, 5)
    val w = Window.partitionBy("key")
      .orderBy(col("epoch").desc, col("writer").desc, col("seq").desc)
    spark.read.textFile(s"$storeDir/data/*.log").toDF("value")
      .filter(length(col("value")) > 0)
      .select(
        parts.getItem(0).as("writer"),
        parts.getItem(1).cast("long").as("epoch"),
        parts.getItem(2).cast("long").as("seq"),
        parts.getItem(3).as("key"),
        parts.getItem(4).as("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("key", "value")
  }
}
