package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned, atomically-committed manifest publishes (the commit
  * protocol half of a lakehouse table format, K11's metadata layer).
  *
  * Protocol (Iceberg-flavored optimistic concurrency, no lock service):
  *   1. The manifest dataset is written to a dot-prefixed TEMP dir —
  *      invisible to readers, garbage if the writer dies mid-write —
  *      along with an underscore-prefixed writer-unique SENTINEL file
  *      (hidden from Spark reads by Hadoop's hidden-file filter).
  *   2. Commit = `rename(temp, manifest_v<N>)` followed by an
  *      OWNERSHIP CHECK: the sentinel must exist directly under the
  *      destination. Directory rename is atomic on HDFS and POSIX, so
  *      a committed version is complete-by-construction; the sentinel
  *      check is what makes the version CLAIM trustworthy — Hadoop's
  *      LocalFileSystem `rename` does NOT simply fail when the
  *      destination exists (its fallback copies the source INTO the
  *      existing destination and returns true), so the returned
  *      boolean alone cannot prove the writer won. A loser cleans up
  *      any stray copy, re-stages its temp dir if the fallback
  *      consumed it, bumps N, and retries.
  *   3. Readers list `manifest_v*` and take the highest version: every
  *      listed version appeared via atomic rename, so a reader can
  *      NEVER observe a partial file list, no matter how many
  *      publishers race.
  *
  * No pointer file is needed — "highest committed version" is derived
  * from the listing, which keeps the commit a single atomic primitive
  * instead of a rename-plus-pointer-swap with a window between them.
  */
object ManifestStore {

  private val VersionRe = "manifest_v(\\d+)".r

  private def fileSystem(spark: SparkSession, base: String): FileSystem =
    new Path(base).getFileSystem(spark.sessionState.newHadoopConf())

  private def versionOf(name: String): Option[Long] = name match {
    case VersionRe(v) => Some(v.toLong)
    case _ => None
  }

  /** Committed versions under `base`, ascending (empty if none). */
  def versions(spark: SparkSession, base: String): Seq[Long] = {
    val fs = fileSystem(spark, base)
    val basePath = new Path(base)
    if (!fs.exists(basePath)) Seq.empty
    else fs.listStatus(basePath).toSeq
      .flatMap(st => versionOf(st.getPath.getName)).sorted
  }

  /** Committed versions with their COMMIT INSTANTS (epoch millis),
    * ascending by version. The instant is the version directory's
    * mtime, normalized by the winning publisher to be strictly
    * increasing in version order (see [[commitAttempt]]) — what
    * `TIMESTAMP AS OF` resolution reads (K36).
    */
  def versionsWithTimes(spark: SparkSession, base: String): Seq[(Long, Long)] = {
    val fs = fileSystem(spark, base)
    val basePath = new Path(base)
    if (!fs.exists(basePath)) Seq.empty
    else fs.listStatus(basePath).toSeq
      .flatMap(st => versionOf(st.getPath.getName)
        .map(v => (v, st.getModificationTime)))
      .sortBy(_._1)
  }

  /** Atomically publish `manifest` as the next version under `base`;
    * returns the committed version number.
    */
  def publish(spark: SparkSession, base: String, manifest: DataFrame): Long = {
    val fs = fileSystem(spark, base)
    val basePath = new Path(base)
    fs.mkdirs(basePath)
    val writerId = java.util.UUID.randomUUID().toString.take(12)
    var temp = stageTemp(fs, basePath, manifest, writerId)
    var v = versions(spark, base).lastOption.getOrElse(0L) + 1
    var attempts = 0
    while (attempts < 10000) {
      attempts += 1
      commitAttempt(fs, basePath, temp, writerId, v) match {
        case Some(won) => if (won) return v
        case None => // temp was consumed by the loser-copy fallback
      }
      // lost the race — claim the next version with a (re-)staged temp
      if (!fs.exists(temp)) temp = stageTemp(fs, basePath, manifest, writerId)
      v += 1
    }
    throw new java.io.IOException(
      s"manifest commit under $base did not win a version after $attempts attempts")
  }

  /** Compare-and-swap publish: commit `manifest` at EXACTLY `version`,
    * or return false if another publisher claimed it first — the
    * primitive behind [[graft.sinks.TableStore.mergeCdc]]'s optimistic
    * retry, where committing at any other version would silently
    * serialize a merge computed against a stale base snapshot.
    */
  def tryPublish(spark: SparkSession, base: String, manifest: DataFrame,
                 version: Long): Boolean = {
    val fs = fileSystem(spark, base)
    val basePath = new Path(base)
    fs.mkdirs(basePath)
    val writerId = java.util.UUID.randomUUID().toString.take(12)
    val temp = stageTemp(fs, basePath, manifest, writerId)
    val won = commitAttempt(fs, basePath, temp, writerId, version).contains(true)
    if (!won && fs.exists(temp)) fs.delete(temp, true)
    won
  }

  /** Write the manifest + writer sentinel into a dot-prefixed temp dir
    * (invisible to readers; garbage if the writer dies mid-write).
    */
  private def stageTemp(fs: FileSystem, basePath: Path, manifest: DataFrame,
                        writerId: String): Path = {
    val temp = new Path(basePath, s".manifest_tmp_$writerId")
    manifest.coalesce(1).write.mode("overwrite").json(temp.toString)
    fs.create(new Path(temp, s"_writer_$writerId"), true).close()
    temp
  }

  /** One rename-claim attempt of `temp` onto version `v`. Some(true) =
    * won; Some(false) = lost with `temp` intact; None = lost and the
    * LocalFileSystem exists-destination fallback consumed `temp` (it
    * copies the source INTO the winner's dir and deletes the source —
    * the stray copy is removed here; the caller re-stages). Directory
    * rename is atomic on HDFS/POSIX; the sentinel ownership check is
    * what makes the claim trustworthy, since the fallback returns true
    * without the rename having happened.
    */
  private def commitAttempt(fs: FileSystem, basePath: Path, temp: Path,
                            writerId: String, v: Long): Option[Boolean] = {
    val dst = new Path(basePath, s"manifest_v$v")
    val renamed = fs.rename(temp, dst)
    if (renamed && fs.exists(new Path(dst, s"_writer_$writerId"))) {
      // in-commit-timestamp normalization (K36): POSIX rename PRESERVES
      // the staged dir's mtime (the staging-write instant, not the
      // claim), and coarse-mtime stores can collapse back-to-back
      // commits onto one tick — so the WINNER re-stamps its version to
      // be strictly after its predecessor's, making `TIMESTAMP AS OF`
      // resolution monotone in version order by construction
      try {
        val prev = if (v <= 1) 0L else {
          val p = new Path(basePath, s"manifest_v${v - 1}")
          if (fs.exists(p)) fs.getFileStatus(p).getModificationTime else 0L
        }
        val mine = fs.getFileStatus(dst).getModificationTime
        if (mine <= prev) fs.setTimes(dst, prev + 1, -1)
      } catch { case _: Exception => () } // stamp is best-effort; order, not the commit, depends on it
      Some(true)
    }
    else if (!renamed && !fs.exists(dst))
      // rename only legitimately fails when a concurrent publisher
      // claimed this version first; anything else is a real IO error
      throw new java.io.IOException(s"manifest commit rename failed for $dst")
    else {
      val stray = new Path(dst, s".manifest_tmp_$writerId")
      if (fs.exists(stray)) fs.delete(stray, true)
      if (fs.exists(temp)) Some(false) else None
    }
  }

  /** Retention sweep: delete committed versions below latest-`keep`
    * (readers pinned to a swept version would break — sweep with the
    * same retention window the table's readers are allowed to lag by,
    * exactly Delta/Iceberg's VACUUM contract). Returns the versions
    * deleted. Without this, every publish accrues a `manifest_v<N>`
    * dir forever — repeated bench/verify runs grow the store without
    * bound.
    */
  def retain(spark: SparkSession, base: String, keep: Int): Seq[Long] = {
    require(keep >= 1, s"must keep at least the current version, got $keep")
    val fs = fileSystem(spark, base)
    val doomed = versions(spark, base).dropRight(keep)
    doomed.foreach(v => fs.delete(new Path(new Path(base), s"manifest_v$v"), true))
    doomed
  }

  /** The highest committed version and its manifest rows. Throws if
    * nothing has been published. `schema` (DDL string): pass it for
    * any manifest that can legally commit ZERO rows — schema
    * inference over an empty JSON dir has no columns and wedges every
    * later read (the RefStore review finding); the default inferred
    * read is only safe for manifests that always carry rows.
    */
  def current(spark: SparkSession, base: String,
              schema: Option[String] = None): (Long, DataFrame) = {
    val v = versions(spark, base).lastOption.getOrElse(
      throw new java.util.NoSuchElementException(s"no committed manifest under $base"))
    (v, readVersion(spark, base, v, schema))
  }

  /** Time travel: the manifest rows AT a pinned committed version
    * (`None` = latest) — the `VERSION AS OF` read path. Throws with
    * the available versions listed if the pin is not committed (a
    * swept or never-committed version must fail loudly, not fall
    * back to some other snapshot). See [[current]] for `schema`.
    */
  def at(spark: SparkSession, base: String, version: Option[Long],
         schema: Option[String] = None): (Long, DataFrame) =
    version match {
      case None => current(spark, base, schema)
      case Some(v) =>
        val committed = versions(spark, base)
        if (!committed.contains(v))
          throw new java.util.NoSuchElementException(
            s"version $v is not committed under $base (available: ${committed.mkString(", ")})")
        (v, readVersion(spark, base, v, schema))
    }

  private def readVersion(spark: SparkSession, base: String, v: Long,
                          schema: Option[String]): DataFrame = {
    val path = new Path(new Path(base), s"manifest_v$v").toString
    schema.fold(spark.read.json(path))(s => spark.read.schema(s).json(path))
  }
}
