package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Commit protocol for DERIVED per-snapshot tables (the persisted IVF index,
  * the dedup sketch family): a build writes its parquet tables under one
  * directory, then commits them with a `_graft_ok` marker whose CONTENT is
  * the source table's fingerprint. Readers treat "no marker" and "marker
  * stamped with a different fingerprint" identically — no committed build
  * for THIS source content, rebuild in place.
  *
  * The fingerprint is (qualified absolute path hash, data-file count, total
  * byte length, max modificationTime), aggregated RECURSIVELY over the
  * source's data files. That closes both round-8 ADVICE-2 staleness holes in
  * the previous leaf-name+length scheme: a regenerated same-length table
  * differs by mtime, two dataset roots sharing a leaf name differ by path
  * hash, and a directory-shaped table (normal Spark parquet output, whose
  * top-level `FileStatus.getLen` is ~0) aggregates its part files instead of
  * collapsing to zero. Hidden (`.`/`_` prefixed) files are excluded — local
  * filesystems accrue `.crc` shadows whose mtimes mean nothing.
  *
  * A content checksum would be stronger still, but needs a full read of the
  * source — at the 100 TB design point that is a second scan per staleness
  * CHECK, while count+length+mtime is one namenode listing. mtime is part of
  * the stamp, so even a byte-identical rewrite rebuilds — the cheap side to
  * err on.
  */
object SnapshotStore {

  /** Content stamp of the source table at `path` (file or directory). */
  def fingerprint(spark: SparkSession, path: String): String = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val q = fs.makeQualified(p)
    var len = 0L
    var mtime = 0L
    var count = 0L
    val it = fs.listFiles(q, true)
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (!name.startsWith(".") && !name.startsWith("_")) {
        len += st.getLen
        mtime = math.max(mtime, st.getModificationTime)
        count += 1
      }
    }
    f"${q.toString.hashCode}%08x-$count-$len-$mtime"
  }

  /** Directory for `family`'s derived tables of the source at `srcPath`:
    * `<warehouse>/<family>/<srcParentName>_<absPathHash>`. The parent name
    * keeps it human-readable (testdata tables all share their file leaf
    * name, the sf dir is what distinguishes them); the path hash keeps two
    * roots with the same parent name apart. STALENESS is not encoded here —
    * the marker stamp carries it, so a regenerated source rebuilds in place
    * instead of accreting one abandoned directory per regeneration.
    */
  def snapshotDir(spark: SparkSession, srcPath: String, family: String): String = {
    val q = new Path(srcPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(new Path(srcPath))
    new Path(spark.conf.get("spark.sql.warehouse.dir"),
      f"$family/${q.getParent.getName}_${q.toString.hashCode}%08x").toString
  }

  /** Commit a finished build under `dir` for a source stamped `stamp`. */
  def commit(spark: SparkSession, dir: String, stamp: String): Unit = {
    val p = new Path(dir, "_graft_ok")
    val out = p.getFileSystem(spark.sparkContext.hadoopConfiguration).create(p, true)
    try out.write(stamp.getBytes(UTF_8)) finally out.close()
  }

  /** True iff `dir` holds a build committed for exactly `stamp`. */
  def ready(spark: SparkSession, dir: String, stamp: String): Boolean = {
    val p = new Path(dir, "_graft_ok")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && {
      val in = fs.open(p)
      val buf = new java.io.ByteArrayOutputStream()
      try {
        val chunk = new Array[Byte](4096)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      } finally in.close()
      new String(buf.toByteArray, UTF_8) == stamp
    }
  }
}
