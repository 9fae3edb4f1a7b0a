package graft

import java.nio.file.Files
import graft.sources.KeyedUpsertSink

/** Log-structured keyed store semantics (T7 + the round-2 scale fix):
  * per-batch write volume is O(batch) not O(store), replay of a committed
  * epoch is a no-op, compaction folds segments without changing the
  * last-writer-wins view.
  */
class LogStoreSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("logstore").toString + "/t"

  test("per-batch write volume scales with the batch, not the store") {
    import spark.implicits._
    val store = tmp()
    // epoch 0: a large base; epochs 1..3: tiny deltas
    KeyedUpsertSink.upsert(spark, store, Seq("k"),
      (1 to 1000).map(i => (s"k$i", i)).toDF("k", "v"), 0L)
    (1 to 3).foreach { e =>
      KeyedUpsertSink.upsert(spark, store, Seq("k"),
        Seq((s"k$e", e * 100), ("fresh", e)).toDF("k", "v"), e.toLong)
    }
    // each delta segment persisted exactly its own 2 rows — the O(store)
    // full rewrite would have made every segment ~1001 rows
    (1 to 3).foreach { e =>
      assert(KeyedUpsertSink.segmentRows(spark, store, e.toLong) == 2L,
        s"epoch $e segment must contain only its batch")
    }
    assert(KeyedUpsertSink.segmentRows(spark, store, 0L) == 1000L)
    // LWW view: k1..k3 replaced, fresh keeps the last write
    val m = KeyedUpsertSink.read(spark, store).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(m.size == 1001)
    assert(m("k1") == 100 && m("k2") == 200 && m("k3") == 300)
    assert(m("fresh") == 3 && m("k999") == 999)
  }

  test("replaying a committed epoch is a no-op (T7)") {
    import spark.implicits._
    val store = tmp()
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("a", 1)).toDF("k", "v"), 5L)
    // foreachBatch re-delivers the same epoch after recovery
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("a", 1)).toDF("k", "v"), 5L)
    assert(KeyedUpsertSink.segmentCount(spark, store) == 1)
    assert(KeyedUpsertSink.read(spark, store).count() == 1)
  }

  test("compaction folds segments to per-key winners without changing the view") {
    import spark.implicits._
    val store = tmp()
    KeyedUpsertSink.upsert(spark, store, Seq("k"),
      Seq(("a", 1), ("b", 2)).toDF("k", "v"), 0L)
    KeyedUpsertSink.upsert(spark, store, Seq("k"),
      Seq(("b", 9), ("c", 3)).toDF("k", "v"), 1L)
    KeyedUpsertSink.upsert(spark, store, Seq("k"),
      Seq(("c", 7)).toDF("k", "v"), 2L)
    val before = KeyedUpsertSink.read(spark, store).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    KeyedUpsertSink.compact(spark, store)
    assert(KeyedUpsertSink.segmentCount(spark, store) == 1)
    val after = KeyedUpsertSink.read(spark, store).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(after == before && after == Map("a" -> 1, "b" -> 9, "c" -> 7))
    // appends after compaction still win over compacted rows
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("a", 42)).toDF("k", "v"))
    val m = KeyedUpsertSink.read(spark, store).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(m == Map("a" -> 42, "b" -> 9, "c" -> 7))
  }

  test("re-compaction after an epoch replay never destroys the committed store") {
    import spark.implicits._
    val store = tmp()
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("a", 1), ("b", 2)).toDF("k", "v"), 0L)
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("b", 9)).toDF("k", "v"), 1L)
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("c", 3)).toDF("k", "v"), 2L)
    KeyedUpsertSink.compact(spark, store) // -> compact-2
    // foreachBatch replays epoch 2 after recovery (its marker was retired
    // with the compaction inputs): the compact segment's name carries the
    // folded high-water epoch, so the replay is fenced — even a replay
    // whose content DIFFERS (processing-time stamps) must not re-apply
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("c", 777)).toDF("k", "v"), 2L)
    KeyedUpsertSink.compact(spark, store)
    val m = KeyedUpsertSink.read(spark, store).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(m == Map("a" -> 1, "b" -> 9, "c" -> 3),
      "folded epochs must stay fenced against replay (T7)")
    assert(KeyedUpsertSink.segmentCount(spark, store) == 1)
    // epoch allocation advances past the compacted watermark, and NEW
    // epochs above the fence apply normally
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("d", 4)).toDF("k", "v"))
    assert(KeyedUpsertSink.read(spark, store).count() == 4)
  }

  test("a recreated checkpoint (epochs restarting at 0) is a NEW writer: its batches apply") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val storeRoot = Files.createTempDirectory("store").toString
    def ev(id: Long, t: String) = EventRec(id, java.sql.Timestamp.valueOf(t),
      1L, "click", 50.0, s"""{"k": $id}""")
    // run 1: checkpoint A, epochs 0..2
    val in1 = MemoryStream[EventRec]
    val p1 = new graft.streaming.Pipeline(spark, storeRoot,
      Files.createTempDirectory("ckptA").toString)
    val q1 = p1.startRawEvents(in1.toDF())
    try {
      (0 until 3).foreach { b => in1.addData(ev(b, s"2024-01-01 10:0$b:00")); q1.processAllAvailable() }
    } finally q1.stop()
    assert(KeyedUpsertSink.read(spark, p1.rawStorePath).count() == 3)
    // run 2: checkpoint DELETED and recreated (fresh dir) — the new query's
    // epochIds restart at 0. The round-3 epoch-only fence silently skipped
    // every batch here until the counter passed the old high-water mark;
    // the writer-scoped fence must apply them (ADVICE r4 item 1).
    val in2 = MemoryStream[EventRec]
    val p2 = new graft.streaming.Pipeline(spark, storeRoot,
      Files.createTempDirectory("ckptB").toString)
    val q2 = p2.startRawEvents(in2.toDF())
    try {
      (0 until 2).foreach { b => in2.addData(ev(100 + b, s"2024-01-01 11:0$b:00")); q2.processAllAvailable() }
    } finally q2.stop()
    val ids = KeyedUpsertSink.read(spark, p2.rawStorePath)
      .select("rec_id").collect().map(_.getString(0)).toSet
    assert(ids.size == 5 && ids.exists(_.contains("11:00")) && ids.exists(_.contains("11:01")),
      "batches from a recreated checkpoint must not be silently dropped")
  }

  test("two writers on one store path cannot fence each other (no silent drop)") {
    import spark.implicits._
    val store = tmp()
    // writer A commits epochs 0..1, then writer B starts at epoch 0: under
    // the old bare-epoch fence B's batches vanished silently
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("a1", 1)).toDF("k", "v"), 0L, "writer-A")
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("a2", 2)).toDF("k", "v"), 1L, "writer-A")
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("b1", 3)).toDF("k", "v"), 0L, "writer-B")
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("b2", 4)).toDF("k", "v"), 1L, "writer-B")
    assert(KeyedUpsertSink.read(spark, store).count() == 4,
      "each writer's epochs are fenced independently")
    // replay WITHIN a writer still skips ...
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("b1", 99)).toDF("k", "v"), 0L, "writer-B")
    val m = KeyedUpsertSink.read(spark, store).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(m("b1") == 3, "a writer's own epoch replay must still be a no-op")
    // ... including after compaction retires the commit markers (_txn fence)
    KeyedUpsertSink.compact(spark, store)
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("a1", 99)).toDF("k", "v"), 1L, "writer-A")
    val m2 = KeyedUpsertSink.read(spark, store).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(m2 == m, "folded epochs stay fenced per writer via _txn")
    // a brand-new writer appending epoch 0 AFTER compaction still applies
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("c1", 5)).toDF("k", "v"), 0L, "writer-C")
    assert(KeyedUpsertSink.read(spark, store).count() == 5)
  }

  test("a crashed manifest write cannot brick the store; comma key names round-trip") {
    import spark.implicits._
    val store = tmp()
    // simulate the crash artifact of the tmp+rename protocol: a stray,
    // truncated temp file left mid-write. It must be invisible — the next
    // upsert creates the real manifest atomically and reads work.
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(store))
    val stray = new org.apache.hadoop.fs.Path(s"$store/.keys-tmp-crashed")
    val out = fs.create(stray, true); out.write("k,garbage-trunc".getBytes); out.close()
    // key column whose NAME contains a comma: the round-3 comma-joined
    // manifest decoded this as two keys and bricked the store
    val kc = "k,1"
    val df = Seq(("a", 1), ("b", 2)).toDF(kc, "v")
    KeyedUpsertSink.upsert(spark, store, Seq(kc), df, 0L, "w")
    KeyedUpsertSink.upsert(spark, store, Seq(kc), Seq(("a", 10)).toDF(kc, "v"), 1L, "w")
    val m = KeyedUpsertSink.read(spark, store).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(m == Map("a" -> 10, "b" -> 2))
  }

  test("mismatched key columns against an existing store fail fast") {
    import spark.implicits._
    val store = tmp()
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("a", "x", 1)).toDF("k", "k2", "v"))
    intercept[IllegalArgumentException] {
      KeyedUpsertSink.upsert(spark, store, Seq("k", "k2"), Seq(("a", "y", 2)).toDF("k", "k2", "v"))
    }
  }

  test("scheduled compaction in the streaming topology bounds segment count") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventRec]
    val p = new graft.streaming.Pipeline(spark,
      Files.createTempDirectory("store").toString,
      Files.createTempDirectory("ckpt").toString, compactEvery = 2)
    val q = p.startRawEvents(input.toDF())
    def ev(id: Long, t: String) = EventRec(id, java.sql.Timestamp.valueOf(t),
      1L, "click", 50.0, s"""{"k": $id}""")
    try {
      (0 until 6).foreach { b =>
        input.addData(ev(b * 2, s"2024-01-01 10:0$b:00"), ev(b * 2 + 1, s"2024-01-01 10:0$b:30"))
        q.processAllAvailable()
      }
      // 6 epochs at compactEvery=2: segments fold repeatedly instead of
      // accumulating one per epoch
      assert(KeyedUpsertSink.segmentCount(spark, p.rawStorePath) <= 3,
        "compaction must bound read amplification")
      assert(KeyedUpsertSink.read(spark, p.rawStorePath).count() == 12)
    } finally q.stop()
  }

  test("model-based: random interleavings of upsert/replay/compact match the LWW model") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2) {
      val store = tmp()
      val model = scala.collection.mutable.Map[String, Int]()
      // per-writer journal of committed (epoch, batch) for replay attempts
      val journal = scala.collection.mutable.Map(
        "w1" -> scala.collection.mutable.ArrayBuffer[(Long, Seq[(String, Int)])](),
        "w2" -> scala.collection.mutable.ArrayBuffer[(Long, Seq[(String, Int)])]())
      var v = 0
      for (_ <- 1 to 14) {
        rnd.nextInt(4) match {
          case 0 | 1 => // fresh batch from a random writer: applies, model updates
            val w = if (rnd.nextBoolean()) "w1" else "w2"
            val batch = Seq.fill(1 + rnd.nextInt(3)) {
              v += 1; (s"k${rnd.nextInt(8)}", v)
            }.distinctBy(_._1)
            val epoch = journal(w).lastOption.map(_._1 + 1).getOrElse(0L)
            KeyedUpsertSink.upsert(spark, store, Seq("k"), batch.toDF("k", "v"), epoch, w)
            batch.foreach { case (k, x) => model(k) = x }
            journal(w) += ((epoch, batch))
          case 2 if journal.values.exists(_.nonEmpty) => // replay with MUTATED content: must be a no-op
            val w = journal.filter(_._2.nonEmpty).keys.toSeq(rnd.nextInt(
              journal.count(_._2.nonEmpty)))
            val (epoch, batch) = journal(w)(rnd.nextInt(journal(w).size))
            val poisoned = batch.map { case (k, _) => (k, 999999) }
            KeyedUpsertSink.upsert(spark, store, Seq("k"), poisoned.toDF("k", "v"), epoch, w)
          case _ => // compact: view-preserving at any point
            if (KeyedUpsertSink.exists(spark, store)) KeyedUpsertSink.compact(spark, store)
        }
        if (KeyedUpsertSink.exists(spark, store)) {
          val got = KeyedUpsertSink.read(spark, store).collect()
            .map(r => r.getString(0) -> r.getInt(1)).toMap
          assert(got == model.toMap, s"store diverged from LWW model")
        } else assert(model.isEmpty)
      }
    }
  }

  test("composite keys and epoch-less allocation keep LWW semantics") {
    import spark.implicits._
    val store = tmp()
    KeyedUpsertSink.upsert(spark, store, Seq("k1", "k2"),
      Seq(("a", "x", 1), ("a", "y", 2)).toDF("k1", "k2", "v"))
    KeyedUpsertSink.upsert(spark, store, Seq("k1", "k2"),
      Seq(("a", "x", 10), ("a", "x", 10)).toDF("k1", "k2", "v")) // batch-internal dup
    val rows = KeyedUpsertSink.read(spark, store).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(rows == Map(("a", "x") -> 10, ("a", "y") -> 2))
  }

  test("simultaneous writers never share a sequence; no segment is lost (round-6 VERDICT-6)") {
    import spark.implicits._
    val store = tmp()
    val writers = 4
    val epochsEach = 3
    // every writer upserts the SAME key plus a private key, all in parallel
    // threads — the worst case for sequence allocation races
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    try {
      val futures = (0 until writers).map { w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit =
            (0 until epochsEach).foreach { e =>
              KeyedUpsertSink.upsert(spark, store, Seq("k"),
                Seq(("shared", s"w$w-e$e"), (s"own-$w", s"w$w-e$e")).toDF("k", "v"),
                e.toLong, s"writer-$w")
            }
        })
      }
      futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdown()
    // no lost commit: every (writer, epoch) segment exists
    assert(KeyedUpsertSink.segmentCount(spark, store) == writers * epochsEach)
    (0 until writers).foreach { w =>
      (0 until epochsEach).foreach { e =>
        assert(KeyedUpsertSink.segmentRows(spark, store, e.toLong, s"writer-$w") == 2L,
          s"writer $w epoch $e segment lost or wrong")
      }
    }
    // CAS: all allocated sequences are distinct — concurrent writers can
    // never share one, so cross-writer LWW order is total by allocation
    val seqs = new java.io.File(s"$store/commits").list().toSeq
      .filterNot(_.startsWith("."))
      .map(_.split("__")(0).toLong)
    assert(seqs.distinct.size == seqs.size,
      s"duplicate commit sequences allocated under concurrency: ${seqs.sorted}")
    // the read resolves: each private key serves its writer's last epoch,
    // and the shared key serves the value of the max-sequence segment
    val m = KeyedUpsertSink.read(spark, store).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m.size == writers + 1)
    (0 until writers).foreach(w => assert(m(s"own-$w") == s"w$w-e${epochsEach - 1}"))
    val names = new java.io.File(s"$store/commits").list().toSeq
      .filterNot(_.startsWith("."))
    val maxSeqName = names.maxBy(_.split("__")(0).toLong)
    val Array(_, maxW, maxE) = maxSeqName.split("__")
    assert(m("shared") == s"w${maxW.stripPrefix("writer-")}-e$maxE",
      s"shared key must serve the highest-sequence commit ($maxSeqName), got ${m("shared")}")
    // compaction over the concurrent store folds cleanly and prunes claims
    KeyedUpsertSink.compact(spark, store)
    assert(KeyedUpsertSink.read(spark, store).collect().length == writers + 1)
    assert(new java.io.File(s"$store/_seq").list().isEmpty,
      "compaction must prune covered sequence claims")
  }

  test("CAS violation under a non-atomic create: documented degradation, never corruption") {
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    val store = tmp()
    // writer A commits sequence 0 through the real path
    KeyedUpsertSink.upsert(spark, store, Seq("k"),
      Seq(("x", "a-val"), ("only-a", "a")).toDF("k", "v"), 0L, "writerA")
    // Simulate the object-store caveat documented on claimSeq: on a
    // filesystem whose create(overwrite = false) is check-then-create
    // (no atomic create, no conditional put), a concurrent writer can WIN
    // the same claim instead of throwing. Hand-commit exactly what that
    // lost race persists — writer B's segment carrying the DUPLICATE
    // sequence 0 with a conflicting value for a shared key.
    val name = "0__writerB__0"
    Seq(("x", "b-val"), ("only-b", "b")).toDF("k", "v")
      .withColumn("__graft_epoch", lit(0L))
      .withColumn("__graft_src", lit(name))
      .write.parquet(s"$store/seg/$name")
    Files.write(new java.io.File(s"$store/commits/$name").toPath, Array.emptyByteArray)
    // CONTRACT, pinned by assertion: a duplicated sequence degrades LWW
    // between the two racing commits to the read-side segment-name
    // tie-break (deterministic on every read — writerB outranks writerA
    // lexicographically at equal sequence); it can NEVER corrupt the
    // store, drop a non-conflicting key, or diverge between reads.
    val m = KeyedUpsertSink.read(spark, store).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m == Map("x" -> "b-val", "only-a" -> "a", "only-b" -> "b"), s"got $m")
    // the next legitimate claim observes the burned duplicate and strictly
    // exceeds it — the violation cannot cascade into later sequences
    KeyedUpsertSink.upsert(spark, store, Seq("k"),
      Seq(("x", "later")).toDF("k", "v"), 1L, "writerA")
    val m2 = KeyedUpsertSink.read(spark, store).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m2("x") == "later")
    // compaction folds the violated store with the same tie-break: the
    // view is unchanged and the duplicate sequence is retired with the rest
    KeyedUpsertSink.compact(spark, store)
    val folded = KeyedUpsertSink.read(spark, store).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(folded == m2)
  }

  test("a mixed legacy/new store reads and compacts (round-6 ADVICE-3)") {
    import java.nio.charset.StandardCharsets.UTF_8
    import spark.implicits._
    val store = tmp()
    // hand-build a round-3/4 legacy store: bare-epoch segment name, rows
    // stamped with the sequence column only — no __graft_src
    val segDir = new java.io.File(s"$store/seg"); segDir.mkdirs()
    new java.io.File(s"$store/commits").mkdirs()
    Seq(("a", 1), ("b", 2)).toDF("k", "v")
      .withColumn("__graft_epoch", org.apache.spark.sql.functions.lit(5L))
      .write.parquet(s"$store/seg/5")
    Files.write(new java.io.File(s"$store/commits/5").toPath, Array.emptyByteArray)
    Files.write(new java.io.File(s"$store/_keys").toPath, "k".getBytes(UTF_8))
    // an all-legacy store must already read (schema has no __graft_src)
    val legacyOnly = KeyedUpsertSink.read(spark, store).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(legacyOnly == Map("a" -> 1, "b" -> 2))
    // a new stamped segment over it: allocation continues after the legacy
    // sequence, the mixed read resolves, and the new row wins the shared key
    KeyedUpsertSink.upsert(spark, store, Seq("k"), Seq(("a", 10)).toDF("k", "v"))
    val mixed = KeyedUpsertSink.read(spark, store).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(mixed == Map("a" -> 10, "b" -> 2),
      s"mixed legacy/new store must merge-read with new rows winning, got $mixed")
    // compaction folds the mixed store without changing the view
    KeyedUpsertSink.compact(spark, store)
    assert(KeyedUpsertSink.segmentCount(spark, store) == 1)
    val folded = KeyedUpsertSink.read(spark, store).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(folded == mixed)
  }
}
