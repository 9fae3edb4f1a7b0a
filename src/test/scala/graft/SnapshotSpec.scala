package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.SnapshotStore

/** Specs for the durable per-snapshot table store: content-stamped
  * staleness (round-8 ADVICE-2) and parquet-served dedup-family queries
  * (round-7 VERDICT-1).
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("fingerprint distinguishes same-length different-content regenerations (r8 ADVICE-2)") {
    val base = Files.createTempDirectory("snapfp")
    val src = base.resolve("t.txt")
    Files.write(src, "aaaa".getBytes(UTF_8))
    val fp1 = SnapshotStore.fingerprint(spark, src.toString)
    // regenerate: SAME byte length, different content — the case the old
    // name+length scheme silently reused. mtime is bumped explicitly so
    // the spec never races filesystem timestamp granularity.
    Files.write(src, "bbbb".getBytes(UTF_8))
    assert(src.toFile.setLastModified(src.toFile.lastModified() + 2000))
    val fp2 = SnapshotStore.fingerprint(spark, src.toString)
    assert(fp1 != fp2, "a same-length regeneration must change the fingerprint")
    // marker protocol: a build committed for fp1 is NOT ready for fp2
    val dir = base.resolve("derived").toString
    SnapshotStore.commit(spark, dir, fp1)
    assert(SnapshotStore.ready(spark, dir, fp1))
    assert(!SnapshotStore.ready(spark, dir, fp2),
      "a marker stamped for other source content must read as no-build")
  }

  test("fingerprint aggregates a directory table's part files, never collapses to the dir stat") {
    // Spark parquet output is a DIRECTORY whose own FileStatus length is
    // ~0 — the second ADVICE-2 hole. The fingerprint must see the data
    // files (and ignore hidden .crc/_SUCCESS shadows).
    val base = Files.createTempDirectory("snapdir")
    Seq((1L, "a"), (2L, "b")).toDF("id", "t")
      .write.parquet(s"$base/t.parquet")
    val fp = SnapshotStore.fingerprint(spark, s"$base/t.parquet")
    val Array(_, count, len, mtime) = fp.split("-", 4)
    assert(count.toLong >= 1 && len.toLong > 0 && mtime.toLong > 0,
      s"directory fingerprint must aggregate part files, got $fp")
    // same leaf name under a different root → different fingerprint
    val other = Files.createTempDirectory("snapdir2")
    Seq((1L, "a"), (2L, "b")).toDF("id", "t")
      .write.parquet(s"$other/t.parquet")
    assert(fp != SnapshotStore.fingerprint(spark, s"$other/t.parquet"),
      "two roots sharing a leaf name must not share a fingerprint")
  }

  test("fingerprint ignores files under hidden directories, not just hidden leaves (r9 ADVICE-1)") {
    // listFiles(recursive) descends into _temporary/.spark-staging trees
    // left by crashed writes; their files must not perturb the stamp
    val base = Files.createTempDirectory("snaphid")
    val tbl = base.resolve("t.parquet")
    Seq((1L, "a"), (2L, "b")).toDF("id", "t").write.parquet(tbl.toString)
    val fp = SnapshotStore.fingerprint(spark, tbl.toString)
    // simulate a crashed concurrent write: VISIBLE-named files under
    // hidden directories (the exact shape the leaf-only filter miscounted)
    val tmpDir = tbl.resolve("_temporary").resolve("0")
    Files.createDirectories(tmpDir)
    Files.write(tmpDir.resolve("part-00000.parquet"), "junk".getBytes(UTF_8))
    val stgDir = tbl.resolve(".spark-staging-123")
    Files.createDirectories(stgDir)
    Files.write(stgDir.resolve("part-00001.parquet"), "junkjunk".getBytes(UTF_8))
    assert(SnapshotStore.fingerprint(spark, tbl.toString) == fp,
      "files under hidden directories must not change the fingerprint")
  }

  test("commit leaves no temp marker and survives re-commit (r9 ADVICE-4)") {
    val base = Files.createTempDirectory("snapcommit")
    val dir = base.resolve("derived").toString
    SnapshotStore.commit(spark, dir, "stamp-a")
    assert(SnapshotStore.ready(spark, dir, "stamp-a"))
    // re-commit over an existing marker (rebuild path) must also succeed
    SnapshotStore.commit(spark, dir, "stamp-b")
    assert(SnapshotStore.ready(spark, dir, "stamp-b"))
    assert(!SnapshotStore.ready(spark, dir, "stamp-a"))
    val leftovers = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.contains("_graft_ok.tmp"))
    assert(leftovers.isEmpty, s"temp marker must be renamed away: ${leftovers.mkString(",")}")
  }

  test("commit sweeps abandoned sibling snapshot dirs of the same source (r8 next-round 5)") {
    val base = Files.createTempDirectory("snapgc")
    val family = base.resolve("graft_fam")
    val live = family.resolve("sf9_aabbccdd")
    val stale = family.resolve("sf9_123456")   // earlier spelling of the same source
    val other = family.resolve("sfX_99887766") // different parent name: a different source
    Files.createDirectories(stale)
    Files.createDirectories(other)
    SnapshotStore.commit(spark, live.toString, "stamp")
    assert(SnapshotStore.ready(spark, live.toString, "stamp"))
    assert(!Files.exists(stale), "a same-source earlier spelling must be GC'd at commit")
    assert(Files.exists(other), "a different source's snapshot must be kept")
  }

  test("registry re-checks snapshot staleness per call, not per session (r9 ADVICE-2)") {
    // a corpus regenerated while the session lives must be re-served from
    // a fresh snapshot on the NEXT registry call — the memo may cache
    // readers only while the fingerprint matches
    val base = Files.createTempDirectory("snapmemo")
    def writeCorpus(tag: String): Unit =
      ((0 until 8).map(i => (i.toLong, s"$tag one two three four five v$i")) :+
        ((100L, s"$tag one two three four five v0")))
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$base/documents.parquet")
    writeCorpus("alpha")
    val r1 = SparkEntry.queries("q_minhash_pairs")(spark, base.toString).collect()
    assert(r1.nonEmpty)
    Thread.sleep(5)
    writeCorpus("beta")
    // force a visible content difference: beta corpus drops the planted dup
    Seq((0L, "solo beta document unlike anything"), (1L, "another unique beta row"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$base/documents.parquet")
    val r2 = SparkEntry.queries("q_minhash_pairs")(spark, base.toString).collect()
    assert(r2.isEmpty,
      s"regenerated corpus has no near-dups; stale snapshot would still pair: ${r2.length} rows")
  }

  test("the round-12 families (quality, decon) honor the same per-call staleness contract") {
    val base = Files.createTempDirectory("snapmemo12")
    def writeCorpus(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
        .write.mode("overwrite").parquet(s"$base/documents.parquet")
    val longText = (1 to 25).map(i => s"w$i").mkString(" ")
    writeCorpus(Seq((1L, longText), (11L, longText + " x")))
    // quality: both docs pass C4 (≥20 tokens, no punct, unique)
    val q1 = SparkEntry.queries("q_quality_filter")(spark, base.toString)
      .filter(col("keep")).count()
    assert(q1 == 2, s"precondition: both alpha docs keep: $q1")
    // decon: doc 1 (corpus, 1 % 11 ≠ 0) shares 5-grams with doc 11
    // (benchmark split, 11 % 11 = 0)
    val c1 = SparkEntry.queries("q_contamination")(spark, base.toString).count()
    assert(c1 == 1, s"precondition: the planted cross-split collision flags: $c1")
    Thread.sleep(5)
    // regenerate: short docs (fail C4) with disjoint cross-split grams
    writeCorpus(Seq((1L, "tiny"), (11L, "other words entirely")))
    val q2 = SparkEntry.queries("q_quality_filter")(spark, base.toString)
      .filter(col("keep")).count()
    assert(q2 == 0, s"stale quality snapshot would still keep 2: $q2")
    val c2 = SparkEntry.queries("q_contamination")(spark, base.toString).count()
    assert(c2 == 0, s"stale decon snapshot would still flag 1: $c2")
  }

  test("sketch snapshot rebuilds on regeneration and serves the NEW corpus") {
    val base = Files.createTempDirectory("snapsketch")
    val srcPath = s"$base/documents.parquet"
    def writeCorpus(tag: String): Unit =
      ((0 until 8).map(i => (i.toLong, s"$tag one two three four five v$i")) :+
        ((100L, s"$tag one two three four five v0")))
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(srcPath)
    writeCorpus("alpha")
    val dir = s"$base/sketch"
    val stamp1 = SnapshotStore.fingerprint(spark, srcPath)
    Dedup.persistSketchTables(spark.read.parquet(srcPath), dir, stamp = stamp1)
    assert(SnapshotStore.ready(spark, dir, stamp1))
    val pairs1 = Dedup.loadSketchTables(spark, dir).pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs1.nonEmpty, "the planted near-dup must pair")
    // regenerate the corpus: the old stamp must now read stale and the
    // rebuilt snapshot must reflect the new content
    Thread.sleep(5) // parquet rewrite → new files; sleep guards coarse mtime
    writeCorpus("beta")
    val stamp2 = SnapshotStore.fingerprint(spark, srcPath)
    assert(stamp2 != stamp1)
    assert(!SnapshotStore.ready(spark, dir, stamp2),
      "a regenerated corpus must invalidate the committed snapshot")
    Dedup.persistSketchTables(spark.read.parquet(srcPath), dir, stamp = stamp2)
    assert(SnapshotStore.ready(spark, dir, stamp2))
    val direct = Dedup.minhashPairs(spark.read.parquet(srcPath), 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val served = Dedup.loadSketchTables(spark, dir).pairs.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served == direct, "the rebuilt snapshot must serve the new corpus' pairs")
  }

  test("registry dedup family serves from snapshot parquet, never rescans documents (r7 VERDICT-1)") {
    // first access builds + commits the snapshot; every consumer after
    // that — including this plan — reads the four persisted tables
    val clusters = SparkEntry.queries("q_dup_clusters")(spark, sf)
    assert(clusters.count() > 0)
    def scansOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).filter(_.contains("FileScan")).toSeq
    // dedup-v6: the converged cluster assignment is itself a snapshot
    // table (round-10 next-round 2) — serving q_dup_clusters is ONE
    // parquet scan, never a label-propagation fixpoint per call
    val clusterScans = scansOf(SparkEntry.queries("q_dup_clusters")(spark, sf))
    assert(clusterScans.size == 1 && clusterScans.forall(_.contains("graft_dedup")),
      s"cluster serving must be one snapshot-table scan:\n${clusterScans.mkString("\n")}")
    assert(clusterScans.forall(!_.contains("documents.parquet")),
      "the served path must never scan documents")
    // ...and keep-best is one anti-join of documents against the
    // persisted drop set: exactly a documents scan + a snapshot scan
    // (counted over the full plan text — AQE folds both leaves into one
    // AdaptiveSparkPlan node, so collectLeaves undercounts here)
    val kbPlan = SparkEntry.queries("q_dedup_keep_best")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("FileScan".r.findAllIn(kbPlan).length == 2 &&
        kbPlan.contains("graft_dedup") && kbPlan.contains("documents.parquet"),
      s"keep-best must be documents anti-join drop-set:\n$kbPlan")
    // the persisted tables equal the direct computations over the same
    // persisted pairs (the containment/jaccard equality contract)
    val pairsTbl = graft.operators.Dedup.loadSketchTables(spark,
      graft.sources.SnapshotStore.snapshotDir(spark, s"$sf/documents.parquet", "graft_dedup"))
    def idPairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(idPairs(pairsTbl.clusters) ==
      idPairs(graft.operators.Dedup.clustersFromPairs(
        pairsTbl.pairs.select("doc_id1", "doc_id2"))),
      "persisted clusters must equal fixpoint propagation over the persisted pairs")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assert(pairsTbl.keepBestDrop.collect().map(_.getLong(0)).toSet ==
      graft.operators.Dedup.keepBestDrop(docs, pairsTbl.clusters)
        .collect().map(_.getLong(0)).toSet,
      "persisted drop set must equal the per-cluster argmax over the persisted clusters")
    val pairScans = scansOf(SparkEntry.queries("q_minhash_pairs")(spark, sf))
    assert(pairScans.nonEmpty && pairScans.forall(_.contains("graft_dedup")),
      s"pair serving must read only snapshot tables:\n${pairScans.mkString("\n")}")
    // jaccard over the persisted index + members: snapshot tables only
    val jacScans = scansOf(SparkEntry.queries("q_jaccard_pairs")(spark, sf))
    assert(jacScans.nonEmpty && jacScans.forall(_.contains("graft_dedup")),
      s"index-fed jaccard must read only snapshot tables:\n${jacScans.mkString("\n")}")
  }

  test("containment pairs serve from the persisted v4 table, never rescan the index (r9 next-round 1)") {
    def scansOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).filter(_.contains("FileScan")).toSeq
    val cp = SparkEntry.queries("q_containment_pairs")(spark, sf)
    assert(cp.count() > 0, "sf0.01 plants containment-grade near-dups")
    // FileScan toString truncates the location path, so assert the
    // snapshot root (like the sibling specs) + single-scan plan shape:
    // serving is ONE parquet scan, no documents read, no index self-join
    val cpScans = scansOf(cp)
    assert(cpScans.size == 1 && cpScans.forall(_.contains("graft_dedup")),
      s"containment serving must be one snapshot-table scan:\n${cpScans.mkString("\n")}")
    assert(cpScans.forall(!_.contains("documents.parquet")),
      "the served path must never scan documents")
    // the persisted table must equal the direct index-fed computation at
    // the registry's default threshold (same contract the minhash `pairs`
    // table honors in the rebuild spec above)
    val tables = SparkEntry.queries("q_dup_clusters")(spark, sf) // ensure family built
    tables.count()
    val direct = Dedup.containmentPairs(
        spark.read.parquet(s"$sf/documents.parquet"), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val served = cp.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(served == direct,
      s"persisted containment pairs must equal the direct computation (served=${served.size}, direct=${direct.size})")
    // v5: the jaccard + stop-list-stripped pairs honor the same contract —
    // single snapshot scan, equal to the direct index-fed computation
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def triples(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val jacServed = SparkEntry.queries("q_jaccard_pairs")(spark, sf)
    assert(scansOf(jacServed).size == 1,
      "jaccard serving must be one snapshot-table scan")
    assert(triples(jacServed) == triples(Dedup.jaccardPairs(docs, 0.5)),
      "persisted jaccard pairs must equal the direct computation")
    val stopServed = SparkEntry.queries("q_stoplist_pairs")(spark, sf)
    assert(scansOf(stopServed).size == 1,
      "stoplist-pair serving must be one snapshot-table scan")
    val stopDirect = Dedup.jaccardPairs(docs, 0.5,
      stopHashesOpt = Some(Dedup.stopListHashes(Dedup.hotShingles(docs))))
    assert(triples(stopServed) == triples(stopDirect),
      "persisted stop-list-stripped pairs must equal the direct computation")
  }

  test("keyword search serves from the persisted inverted index, In-pruned, parity with index-free") {
    import graft.operators.TextAnalysis
    val terms = Seq("hash", "join", "vector")
    val served = SparkEntry.queries("q_keyword_search")(spark, sf)
    served.count()
    // plan: only graft_search scans, and the postings scan pushes the
    // terms down as an In filter (the index-pruning the design promises)
    val scans = served.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("FileScan"))
    assert(scans.nonEmpty && scans.forall(_.contains("graft_search")),
      s"search serving must read only the index:\n${scans.mkString("\n")}")
    assert(scans.exists(s => s.contains("PushedFilters") && s.contains("In(tok")),
      s"the terms must push down to the postings scan:\n${scans.mkString("\n")}")
    // parity: identical rows (score fold included) vs the index-free path
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double, Long)] =
      df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    val free = TextAnalysis.keywordSearch(
      spark.read.parquet(s"$sf/documents.parquet"), terms, k = 10)
    assert(rows(served) == rows(free),
      "index-served search must equal the index-free operator exactly")
  }

  test("BPE merges serve from the persisted tokenizer table, equal to the direct training run") {
    import graft.operators.TextAnalysis
    val served = SparkEntry.queries("q_bpe_merges")(spark, sf)
    served.count()
    val scans = served.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("FileScan"))
    assert(scans.size == 1 && scans.forall(_.contains("graft_bpe")),
      s"merge serving must be one snapshot-table scan:\n${scans.mkString("\n")}")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, String, String, Long)] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val direct = TextAnalysis.bpeMerges(
      spark.read.parquet(s"$sf/documents.parquet"), 5)
    assert(rows(served) == rows(direct),
      "persisted merges must equal the direct training run")
    // bpe-v3: the corpus encodes are pre-segmented into the snapshot —
    // both encode queries serve as ONE scan, and each equals the direct
    // operator applied to the served artifacts (the staging-discipline
    // equality: snapshot encode ≡ encode over the snapshot's own tables)
    def encRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getString(3))).toSeq
    for (name <- Seq("q_bpe_encode", "q_unigram_encode")) {
      val enc = SparkEntry.queries(name)(spark, sf)
      val encScans = enc.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).filter(_.contains("FileScan"))
      assert(encScans.size == 1 && encScans.forall(_.contains("graft_bpe")),
        s"$name must serve as one snapshot scan:\n${encScans.mkString("\n")}")
    }
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val merges = SparkEntry.queries("q_bpe_merges")(spark, sf)
      .orderBy("merge_rank").select("lhs", "rhs").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(encRows(SparkEntry.queries("q_bpe_encode")(spark, sf)) ==
      encRows(TextAnalysis.bpeEncode(docs, merges).orderBy("doc_id", "pos")),
      "persisted BPE encode must equal the direct operator on the served merges")
    val vocab = SparkEntry.queries("q_unigram_vocab")(spark, sf)
    assert(encRows(SparkEntry.queries("q_unigram_encode")(spark, sf)) ==
      encRows(TextAnalysis.unigramEncode(docs, vocab).orderBy("doc_id", "pos")),
      "persisted unigram encode must equal the direct operator on the served vocab")
  }

  test("simhash + incremental dedup serve from persisted sketches (r8 next-round 3)") {
    def scansOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).filter(_.contains("FileScan")).toSeq
    // simhash pairs: banded join over the persisted simhash table +
    // group-expand via the persisted members table — zero document scans
    val sh = SparkEntry.queries("q_simhash_pairs")(spark, sf)
    assert(sh.count() > 0, "sf0.01 plants simhash-grade near-dups")
    val shScans = scansOf(sh)
    assert(shScans.nonEmpty && shScans.forall(_.contains("graft_dedup")),
      s"simhash serving must read only snapshot tables:\n${shScans.mkString("\n")}")
    // incremental dedup: the corpus side must come from the persisted
    // graft_incdex signature index (the delta side reads documents — the
    // fresh crawl is the one thing a daily run MUST scan)
    val inc = SparkEntry.queries("q_dedup_incremental")(spark, sf)
    assert(inc.count() > 0)
    val incScans = scansOf(inc)
    assert(incScans.exists(_.contains("graft_incdex")),
      s"corpus side must be the persisted signature index:\n${incScans.mkString("\n")}")
    assert(incScans.filterNot(_.contains("graft_incdex"))
      .forall(_.contains("documents.parquet")),
      s"only delta-side document scans allowed beside the index:\n${incScans.mkString("\n")}")
  }

  test("exact contamination serves from the persisted collision table, never re-explodes the corpus (r11 verdict 1)") {
    def scansOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).filter(_.contains("FileScan")).toSeq
    // first access builds + commits graft_decon; the serving plan is ONE
    // snapshot-table scan — the per-call corpus 5-gram explode is gone
    val c = SparkEntry.queries("q_contamination")(spark, sf)
    assert(c.count() > 0, "the %11 split plants cross-split collisions at every SF")
    val cScans = scansOf(SparkEntry.queries("q_contamination")(spark, sf))
    assert(cScans.size == 1 && cScans.forall(_.contains("graft_decon")),
      s"contamination serving must be one snapshot-table scan:\n${cScans.mkString("\n")}")
    assert(cScans.forall(!_.contains("documents.parquet")),
      "the served path must never scan documents")
    // the drop-side is documents anti-join the snapshot: exactly two
    // scans (counted over the plan text — the keep-best precedent)
    val dPlan = SparkEntry.queries("q_decontaminated")(spark, sf)
      .queryExecution.executedPlan.toString
    assert("FileScan".r.findAllIn(dPlan).length == 2 &&
        dPlan.contains("graft_decon") && dPlan.contains("documents.parquet"),
      s"decontaminated must be documents anti-join collision-set:\n$dPlan")
    // the persisted table equals the direct any-benchmark-path
    // computation over the registry's split (the family equality contract)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val direct = Dedup.contamination(
        docs.filter(pmod(col("doc_id"), lit(11)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(11)) === 0), n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val served = c.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(served == direct,
      s"persisted collisions must equal the direct computation (served=${served.size}, direct=${direct.size})")
  }

  test("bloom family serves from graft_bloom scans; persisted bloom-path " +
    "contamination equals the exact family; staleness honored per call") {
    def scansOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).filter(_.contains("FileScan")).toSeq
    // serving scans: candidates and the bloom-path contamination are each
    // ONE graft_bloom table scan — neither text nor bitmap rescans per call
    for (q <- Seq("q_bloom_candidates", "q_bloom_contamination")) {
      assert(SparkEntry.queries(q)(spark, sf).count() > 0)
      val scans = scansOf(SparkEntry.queries(q)(spark, sf))
      assert(scans.size == 1 && scans.forall(_.contains("graft_bloom")),
        s"$q must serve as one graft_bloom scan:\n${scans.mkString("\n")}")
    }
    // cross-family equality: the bloom-path answer (probe → verify on
    // candidates) IS the exact decon table — the no-false-negative
    // composition identity, here checked between two PERSISTED families
    val viaBloom = SparkEntry.queries("q_bloom_contamination")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaExact = SparkEntry.queries("q_contamination")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaBloom == viaExact,
      s"bloom-path contamination must equal the exact family " +
        s"(bloom=${viaBloom.size}, exact=${viaExact.size})")
    // per-call staleness: a regenerated corpus re-probes (the planted
    // cross-split collision appears, then vanishes with the rewrite)
    val base = java.nio.file.Files.createTempDirectory("snapbloom")
    def writeCorpus(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
        .write.mode("overwrite").parquet(s"$base/documents.parquet")
    val longText = (1 to 25).map(i => s"w$i").mkString(" ")
    writeCorpus(Seq((1L, longText), (11L, longText + " x")))
    assert(SparkEntry.queries("q_bloom_candidates")(spark, base.toString)
      .count() == 1)
    Thread.sleep(5)
    writeCorpus(Seq((1L, "tiny"), (11L, "other words entirely")))
    assert(SparkEntry.queries("q_bloom_candidates")(spark, base.toString)
      .count() == 0, "stale bloom snapshot would still flag 1")
  }

  test("release family serves both cards as graft_release scans; staleness honored") {
    def scansOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).filter(_.contains("FileScan")).toSeq
    for (q <- Seq("q_snapshot_diff", "q_drift_card")) {
      assert(SparkEntry.queries(q)(spark, sf).count() > 0)
      val scans = scansOf(SparkEntry.queries(q)(spark, sf))
      assert(scans.size == 1 && scans.forall(_.contains("graft_release")),
        s"$q must serve as one graft_release scan:\n${scans.mkString("\n")}")
    }
    // staleness: a regenerated corpus rebuilds the fixture pair — the
    // %23=1 added slice appears, then tracks the rewrite
    val base = java.nio.file.Files.createTempDirectory("snaprel")
    def writeCorpus(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
        .write.mode("overwrite").parquet(s"$base/documents.parquet")
    writeCorpus(Seq((1L, "alpha words"), (24L, "beta words")))
    def added(): Long = SparkEntry.queries("q_snapshot_diff")(spark, base.toString)
      .filter(col("status") === "added").collect().map(_.getLong(2)).sum
    assert(added() == 2L, "1 and 24 are both ≡ 1 mod 23 — two added docs")
    Thread.sleep(5)
    writeCorpus(Seq((1L, "alpha words"), (24L, "beta words"), (47L, "gamma words")))
    assert(added() == 3L, "stale release snapshot would still report 2 added")
  }

  test("quality flags serve from the persisted table and equal the direct regex pass") {
    def scansOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).filter(_.contains("FileScan")).toSeq
    val q = SparkEntry.queries("q_quality_filter")(spark, sf)
    assert(q.count() > 0)
    val qScans = scansOf(SparkEntry.queries("q_quality_filter")(spark, sf))
    assert(qScans.size == 1 && qScans.forall(_.contains("graft_quality")),
      s"quality serving must be one snapshot-table scan:\n${qScans.mkString("\n")}")
    assert(qScans.forall(!_.contains("documents.parquet")),
      "the served path must never scan documents")
    // family equality: the persisted flags equal the direct any-threshold
    // computation row for row (keep flag + the audit ratios)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_tokens", "unique_ratio", "punct_ratio", "keep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4))).toSet
    assert(rows(q) == rows(graft.operators.TextAnalysis.qualityFilter(docs)),
      "persisted flags must equal the direct computation")
    // v2: the gopher flags are the family's second table — same contract
    val g = SparkEntry.queries("q_gopher_filter")(spark, sf)
    val gScans = scansOf(SparkEntry.queries("q_gopher_filter")(spark, sf))
    assert(gScans.size == 1 && gScans.forall(_.contains("graft_quality")),
      s"gopher serving must be one snapshot-table scan:\n${gScans.mkString("\n")}")
    def grows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_tokens", "stop_hits", "keep")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    assert(grows(g) == grows(graft.operators.TextAnalysis.gopherFilter(docs)),
      "persisted gopher flags must equal the direct computation")
    // the agreement cross-tab joins the two persisted tables only
    val aScans = scansOf(SparkEntry.queries("q_filter_agreement")(spark, sf))
    assert(aScans.nonEmpty && aScans.forall(_.contains("graft_quality")),
      s"agreement must read only the flag tables:\n${aScans.mkString("\n")}")
    val agg = SparkEntry.queries("q_filter_agreement")(spark, sf).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    val direct2 = graft.operators.TextAnalysis.filterAgreement(docs).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    assert(agg == direct2,
      "flag-table agreement must equal the direct cross-tab")
  }

  test("semantic clusters serve from the annserve snapshot and equal fixpoint over the persisted pairs") {
    def scansOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).filter(_.contains("FileScan")).toSeq
    val c = SparkEntry.queries("q_semantic_clusters")(spark, sf)
    assert(c.count() > 0, "sf0.001 plants cosine near-dups")
    val cScans = scansOf(SparkEntry.queries("q_semantic_clusters")(spark, sf))
    assert(cScans.size == 1 && cScans.forall(_.contains("graft_annserve")),
      s"cluster serving must be one snapshot-table scan:\n${cScans.mkString("\n")}")
    // family equality: the persisted assignment equals min-label
    // propagation over the persisted pairs (the dedup-v6 contract)
    val dir = graft.sources.SnapshotStore.snapshotDir(spark,
      s"$sf/embeddings.parquet", "graft_annserve")
    val pairs = spark.read.parquet(s"$dir/pairs")
    def asn(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(asn(c) == asn(graft.operators.Dedup.clustersFromPairs(
        pairs.select(col("vec_id1").as("doc_id1"), col("vec_id2").as("doc_id2")))),
      "persisted clusters must equal fixpoint propagation over the persisted pairs")
    // keep-one rule: cluster_id is the min member, so exactly the
    // non-representative members drop
    val kept = SparkEntry.queries("q_semantic_keep_best")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val dropped = c.collect().filter(r => r.getLong(0) != r.getLong(1))
      .map(_.getLong(0)).toSet
    assert(dropped.nonEmpty && (kept & dropped).isEmpty,
      "every non-representative cluster member must drop")
  }

  test("contrastive triples serve from the annserve-v6 snapshot and equal the direct mining run") {
    def scansOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).filter(_.contains("FileScan")).toSeq
    val t = SparkEntry.queries("q_contrastive_triples")(spark, sf)
    assert(t.count() > 0, "sf0.001 plants near-dup pairs, so triples exist")
    val scans = scansOf(SparkEntry.queries("q_contrastive_triples")(spark, sf))
    assert(scans.size == 1 && scans.forall(_.contains("graft_annserve")),
      s"triple serving must be one snapshot-table scan:\n${scans.mkString("\n")}")
    // family equality: the persisted artifact equals the inline mining
    // run over the embeddings + the persisted pairs (staging contract)
    val dir = SnapshotStore.snapshotDir(spark,
      s"$sf/embeddings.parquet", "graft_annserve")
    val pairs = spark.read.parquet(s"$dir/pairs")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4), r.getLong(5))).toSet
    assert(rows(t) == rows(graft.operators.Similarity.contrastiveTriples(
        Tables.embeddings(spark, sf), pairs)),
      "persisted triples must equal the direct mining run")
  }

  test("hard negatives serve from the persisted band table and equal the direct mining run") {
    def scansOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).filter(_.contains("FileScan")).toSeq
    val served = SparkEntry.queries("q_hard_negatives")(spark, sf)
    // candidate generation must come from the snapshot bands; embeddings
    // appear ONLY as the exact-scoring input (2 scans total, no third
    // embeddings scan for re-hashing)
    val scans = scansOf(SparkEntry.queries("q_hard_negatives")(spark, sf))
    assert(scans.exists(_.contains("graft_annserve")),
      s"candidates must band-join the persisted triples:\n${scans.mkString("\n")}")
    assert(scans.count(_.contains("embeddings")) <= 2,
      s"embeddings feed exact scoring only (probe + candidate sides):\n${scans.mkString("\n")}")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(rows(served) == rows(
        graft.operators.Similarity.hardNegatives(Tables.embeddings(spark, sf))
          .withColumn("rank", org.apache.spark.sql.functions.col("rank").cast("long"))),
      "band-table serving must be bit-identical to direct mining")
    // the exact-cosine top-k endpoint follows the same discipline
    assert(rows(SparkEntry.queries("q_lsh_topk")(spark, sf)) == rows(
        graft.operators.Similarity.lshTopK(Tables.embeddings(spark, sf))
          .withColumn("rank", org.apache.spark.sql.functions.col("rank").cast("long"))),
      "band-table lshTopK serving must be bit-identical to the direct run")
  }

  test("training manifest equals each standalone selection it composes (r11 verdict 4)") {
    val m = SparkEntry.queries("q_training_manifest")(spark, sf)
    val rows = m.collect().map(r => r.getLong(0) ->
      ((r.getString(4), r.getDouble(5), r.getLong(6), r.getBoolean(7),
        r.getDouble(8)))).toMap
    assert(rows.nonEmpty)
    // one row per document — the manifest covers the corpus exactly
    assert(rows.size == spark.read.parquet(s"$sf/documents.parquet").count())
    // bucket column equals the standalone CCNet tercile query
    val cc = SparkEntry.queries("q_ccnet_buckets")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    cc.foreach { case (id, b) =>
      assert(rows(id)._1 == b, s"bucket mismatch at $id") }
    rows.collect { case (id, (b, _, _, _, _)) if !cc.contains(id) =>
      assert(b == "none", s"unscored doc $id must carry 'none'") }
    // dsir_weight equals the standalone persisted-weights query
    val dw = SparkEntry.queries("q_dsir_weights")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    dw.foreach { case (id, w) =>
      assert(rows(id)._2 == w, s"dsir weight mismatch at $id") }
    // in_budget set equals the standalone token-budget cut
    val tb = SparkEntry.queries("q_token_budget_mix")(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(rows.filter(_._2._3 == 1L).keySet == tb,
      "in_budget must equal the token-budget selection")
    // the decision rule holds row-wise
    rows.foreach { case (id, (b, w, ib, keep, p)) =>
      assert(keep == (ib == 1L && b != "tail"), s"keep rule at $id")
      if (!keep) assert(p == 0.0, s"dropped doc $id must have prob 0")
      else assert(p == 1.0 || p == math.min(1.0, w), s"prob rule at $id")
    }
  }

  test("dsir registry serves persisted weights; the endpoint scores against frozen counts only") {
    def scansOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).filter(_.contains("FileScan")).toSeq
    // registry weights/selection: ONE scan of the pre-scored snapshot
    // table (dsir-v2 — the training pool's weights are snapshot state)
    val w = SparkEntry.queries("q_dsir_weights")(spark, sf)
    assert(w.count() > 0)
    val wScans = scansOf(w)
    assert(wScans.size == 1 && wScans.forall(_.contains("graft_dsir")),
      s"registry weights must be one snapshot scan:\n${wScans.mkString("\n")}")
    // the scoring ENDPOINT (new data): model side must be graft_dsir
    // tables; the only other scan is the frame being scored (it pays its
    // bigram explode — the work scoring inherently does), and every join
    // broadcasts (the ≤buckets-row bound is the point of hashing)
    import graft.operators.Corpus
    val dir = graft.sources.SnapshotStore.snapshotDir(spark,
      s"$sf/documents.parquet", "graft_dsir")
    val model = Corpus.loadDsirModel(spark, dir)
    val e = Corpus.dsirWeightsFrom(model,
      spark.read.parquet(s"$sf/documents.parquet").limit(20))
    val eScans = scansOf(e)
    assert(eScans.exists(_.contains("graft_dsir")),
      s"endpoint counts must come from the persisted model:\n${eScans.mkString("\n")}")
    assert(eScans.filterNot(_.contains("graft_dsir"))
      .forall(_.contains("documents.parquet")),
      s"only the scored frame may scan documents:\n${eScans.mkString("\n")}")
    assert(eScans.count(_.contains("documents.parquet")) == 1,
      s"the scored frame is read exactly once:\n${eScans.mkString("\n")}")
    val plan = e.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"scoring joins must all broadcast:\n$plan")
  }

  test("PQ/IVFPQ default answers persist: one-scan serving, recompute parity, staleness (r12 next-round 1)") {
    import graft.operators.Similarity
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    // build both families, then check the served rows equal a full recompute
    val pqServed = rows(SparkEntry.queries("q_pq_topk")(spark, sf))
    val ivfpqServed = rows(SparkEntry.queries("q_ivfpq_topk")(spark, sf))
    val src = s"$sf/embeddings.parquet"
    val pqDir = SnapshotStore.snapshotDir(spark, src, "graft_pq")
    val (cb, codes) = (spark.read.parquet(s"$pqDir/codebooks"),
      spark.read.parquet(s"$pqDir/codes"))
    val emb = Tables.embeddings(spark, sf)
    assert(pqServed == rows(Similarity.pqTopKRerankServeFrom(emb, cb, codes)
        .withColumn("rank", col("rank").cast("long"))),
      "persisted PQ topk must equal the any-parameter path at defaults")
    val (idx, lists) = Similarity.loadIndex(spark,
      SnapshotStore.snapshotDir(spark, src, "graft_ivf"))
    assert(ivfpqServed == rows(Similarity.ivfPqTopKServe(idx, lists, cb, codes,
        shortlist = 200, nprobe = 16)
        .withColumn("rank", col("rank").cast("long"))),
      "persisted IVFPQ topk must equal the any-parameter path at defaults")
    // serving is ONE scan of the family's topk table — never the
    // composition (probe routing + LUT + rerank joins) per call
    Seq(("q_pq_topk", "graft_pq"), ("q_ivfpq_topk", "graft_ivfpq"))
      .foreach { case (q, fam) =>
        val scans = SparkEntry.queries(q)(spark, sf)
          .queryExecution.executedPlan.collectLeaves()
          .map(_.toString).filter(_.contains("FileScan"))
        assert(scans.length == 1 && scans.head.contains(fam),
          s"$q must serve one $fam scan:\n${scans.mkString("\n")}")
      }
    // per-call staleness: a regenerated embeddings source must re-serve a
    // fresh composed answer on the NEXT call (all three stamps — ivf, pq,
    // ivfpq — key to the same source fingerprint)
    val base = Files.createTempDirectory("snapivfpq")
    def writeCorpus(twin: Long): Unit =
      (0L until 10L).map { i =>
        val v =
          if (i == twin) Array.tabulate(64)(j => if (j == 0) 9f else 1f)
          else Array.tabulate(64)(j => if (j == i * 6) 10f else 1f)
        (i, v, (i % 4).toInt)
      }.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite").parquet(s"$base/embeddings.parquet")
    writeCorpus(twin = 1L)
    def top1(): Long = SparkEntry.queries("q_ivfpq_topk")(spark, base.toString)
      .filter(col("query_id") === 0 && col("rank") === 1)
      .head().getLong(1)
    assert(top1() == 1L, "corpus A plants vec 1 as query 0's nearest")
    Thread.sleep(5)
    writeCorpus(twin = 2L)
    assert(top1() == 2L,
      "a stale persisted answer would still report vec 1 after regeneration")
  }

  test("passage + RRF default answers persist: one-scan serving, recompute parity, staleness") {
    import graft.operators.{Hybrid, Passage}
    // recompute parity: the served tables equal the any-parameter paths
    val passServed = SparkEntry.queries("q_passage_topk")(spark, sf)
    val pDir = SnapshotStore.snapshotDir(spark, s"$sf/documents.parquet", "graft_passage")
    val pt = Passage.loadPassage(spark, pDir)
    val passLive = Passage.passageTopKServeFrom(pt.vectors, pt.bands)
    assert(passServed.exceptAll(passLive).isEmpty && passLive.exceptAll(passServed).isEmpty,
      "persisted passage topk must equal the any-parameter path at defaults")
    val liServed = SparkEntry.queries("q_late_interaction_topk")(spark, sf)
    val liLive = Passage.lateInteractionTopK(pt.vectors, pt.bands)
    assert(liServed.exceptAll(liLive).isEmpty && liLive.exceptAll(liServed).isEmpty,
      "persisted MaxSim topk must equal the any-parameter path at defaults")
    val rrfServed = SparkEntry.queries("q_rrf_fusion")(spark, sf)
    val ixDir = SnapshotStore.snapshotDir(spark, s"$sf/documents.parquet", "graft_search")
    val annDir = SnapshotStore.snapshotDir(spark, s"$sf/embeddings.parquet", "graft_annserve")
    val rrfLive = Hybrid.mltHybridRrf(Tables.documents(spark, sf),
      graft.operators.TextAnalysis.loadSearchIndex(spark, ixDir),
      Tables.embeddings(spark, sf), spark.read.parquet(s"$annDir/bands"))
    assert(rrfServed.exceptAll(rrfLive).isEmpty && rrfLive.exceptAll(rrfServed).isEmpty,
      "persisted RRF topk must equal the any-parameter path at defaults")
    // serving is ONE scan of the family's answer table
    Seq(("q_passage_topk", "graft_passage"),
        ("q_late_interaction_topk", "graft_passage"),
        ("q_rrf_fusion", "graft_rrf"))
      .foreach { case (q, fam) =>
        val scans = SparkEntry.queries(q)(spark, sf)
          .queryExecution.executedPlan.collectLeaves()
          .map(_.toString).filter(_.contains("FileScan"))
        assert(scans.length == 1 && scans.head.contains(fam),
          s"$q must serve one $fam scan:\n${scans.mkString("\n")}")
      }
    // per-call staleness: a regenerated documents source re-serves fresh
    val base = Files.createTempDirectory("snappassage")
    def writeDocs(twin: Long): Unit =
      (0L until 10L).map { i =>
        val text =
          if (i == 0L) Array.fill(32)("w").mkString(" ")
          else if (i == twin) Array.fill(32)("w").mkString(" ")
          else (1 to 32).map(j => s"t$i-$j").mkString(" ")
        (i, text, "en", "src0", text.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$base/documents.parquet")
    writeDocs(twin = 7L)
    def top1(): Long = SparkEntry.queries("q_passage_topk")(spark, base.toString)
      .filter(col("query_id") === 0 && col("rank") === 1)
      .head().getLong(1)
    assert(top1() == 7L, "corpus A plants doc 7's chunk as query 0's nearest")
    Thread.sleep(5)
    writeDocs(twin = 8L)
    assert(top1() == 8L,
      "a stale persisted answer would still report doc 7 after regeneration")
  }

  test("bitext pair table persists: one-scan serving, recompute parity (mining is a batch job)") {
    import graft.operators.Similarity
    val served = SparkEntry.queries("q_bitext_pairs")(spark, sf)
    val annDir = SnapshotStore.snapshotDir(spark,
      s"$sf/embeddings.parquet", "graft_annserve")
    val live = Similarity.bitextMineFrom(Tables.embeddings(spark, sf),
      spark.read.parquet(s"$annDir/bands"), Tables.documents(spark, sf))
    assert(served.exceptAll(live).isEmpty && live.exceptAll(served).isEmpty,
      "persisted bitext pairs must equal the any-parameter path at defaults")
    val scans = SparkEntry.queries("q_bitext_pairs")(spark, sf)
      .queryExecution.executedPlan.collectLeaves()
      .map(_.toString).filter(_.contains("FileScan"))
    assert(scans.length == 1 && scans.head.contains("graft_bitext"),
      s"q_bitext_pairs must serve one graft_bitext scan:\n${scans.mkString("\n")}")
  }
}
