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
  // group-commit (2PC) breadcrumb in the manifest BASE dir:
  // pending_v<version>_<txnId> — a zero-IO hint (it rides the listing
  // the readers already do) that version <version> MAY be a pending
  // group-transaction claim needing journal resolution
  private val PendingRe = "pending_v(\\d+)_([A-Za-z0-9]+)".r

  private def fileSystem(spark: SparkSession, base: String): FileSystem =
    new Path(base).getFileSystem(spark.sessionState.newHadoopConf())

  private def versionOf(name: String): Option[Long] = name match {
    case VersionRe(v) => Some(v.toLong)
    case _ => None
  }

  /** GROUP-COMMIT VISIBILITY (the K52 two-phase protocol): a version
    * claimed by a multi-table transaction carries a `_pending_<txnId>`
    * marker inside its dir (staged before the atomic rename, so claim
    * and mark are one operation) plus a `pending_v<N>_<txnId>`
    * breadcrumb beside it. Such a version is visible IFF the journal
    * (whose path the marker records) holds `committed_<txnId>` — so
    * the visibility of EVERY table's claim in the group flips on one
    * journal-file create, the single atomic commit point. Steady
    * state costs nothing: resolution only runs for versions whose
    * breadcrumb appears in the listing the readers already perform,
    * and a committed claim is finalized (marker + breadcrumb removed,
    * best-effort) by the first reader that resolves it. An UNRESOLVED
    * claim suppresses its version: CAS writers then keep targeting the
    * claimed number and fail the rename, i.e. they BLOCK behind the
    * in-flight group commit instead of silently publishing around it.
    */
  private def listVisible(fs: FileSystem, basePath: Path)
      : Seq[org.apache.hadoop.fs.FileStatus] = {
    if (!fs.exists(basePath)) return Seq.empty
    val all = fs.listStatus(basePath).toSeq
    val crumbs = all.flatMap(_.getPath.getName match {
      case PendingRe(v, txn) => Some((v.toLong, txn))
      case _ => None
    })
    val versioned = all.filter(st => versionOf(st.getPath.getName).isDefined)
    if (crumbs.isEmpty) return versioned
    versioned.filter { st =>
      val v = versionOf(st.getPath.getName).get
      crumbs.filter(_._1 == v).forall { case (_, txn) =>
        val marker = new Path(st.getPath, s"_pending_$txn")
        if (!fs.exists(marker)) {
          // already finalized (or the crumb is another claimer's
          // leftover) — the crumb is stale; drop it best-effort
          try fs.delete(new Path(basePath, s"pending_v${v}_$txn"), false)
          catch { case _: Exception => () }
          true
        } else {
          val journalDir =
            try {
              val in = fs.open(marker)
              try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
              finally in.close()
            } catch { case _: Exception => "" }
          val committed = journalDir.nonEmpty &&
            fs.exists(new Path(journalDir, s"committed_$txn"))
          if (committed) {
            // commit point passed — finalize so later listings skip
            // the resolution (marker first: a crumb without a marker
            // reads as stale and is cleaned above)
            try { fs.delete(marker, false)
              fs.delete(new Path(basePath, s"pending_v${v}_$txn"), false) }
            catch { case _: Exception => () }
            true
          } else
            // the eager finalizer (or another reader) may have removed
            // the marker AND retired the journal file between our
            // exists() and the journal check — marker-gone now means
            // FINALIZED-VISIBLE, not uncommitted; without this
            // re-check a racing reader would serve snapshot N after
            // N+1 was already visible (review pass 2, round 13)
            !fs.exists(marker)
        }
      }
    }
  }

  /** Committed versions under `base`, ascending (empty if none).
    * Pending group-commit claims whose transaction has not reached its
    * journal commit point are NOT listed (see [[listVisible]]).
    */
  def versions(spark: SparkSession, base: String): Seq[Long] = {
    val fs = fileSystem(spark, base)
    listVisible(fs, new Path(base))
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
    listVisible(fs, new Path(base))
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

  /** Phase-1 of the K52 group commit: claim EXACTLY `version` as a
    * PENDING version for transaction `txnId` — the same atomic rename
    * CAS as [[tryPublish]], but the staged dir carries a
    * `_pending_<txnId>` marker (recording `journalDir`) and the claim
    * leaves a `pending_v<N>_<txnId>` breadcrumb beside it, so readers
    * suppress the version until `<journalDir>/committed_<txnId>`
    * exists (the group's single commit point — see [[listVisible]]).
    * Returns false if another publisher (or pending claim) holds the
    * version. The breadcrumb is written BEFORE the rename: a crumb
    * pointing at a version claimed by someone else is harmless (the
    * marker check resolves it as stale), while a marked claim without
    * a crumb would be an invisible-forever commit.
    */
  def tryPublishPending(spark: SparkSession, base: String, manifest: DataFrame,
                        version: Long, txnId: String, journalDir: String): Boolean = {
    require(txnId.matches("[A-Za-z0-9]+"), s"unsafe txn id: $txnId")
    val fs = fileSystem(spark, base)
    val basePath = new Path(base)
    fs.mkdirs(basePath)
    // IDEMPOTENT per transaction: a retried group commit (crash between
    // phase 1 and phase 2) re-claims versions its earlier attempt
    // already holds — losing the rename to YOUR OWN claim is a win, and
    // the cleanup below must never remove the live claim's breadcrumb
    // (the crumb file is shared across attempts; deleting it on a
    // same-txn loss made the uncommitted claim visible — review pass 1,
    // round 13)
    def ownClaim(): Boolean =
      fs.exists(new Path(basePath, s"manifest_v$version/_pending_$txnId"))
    if (ownClaim()) return true
    val writerId = java.util.UUID.randomUUID().toString.take(12)
    val temp = stageTemp(fs, basePath, manifest, writerId)
    val marker = fs.create(new Path(temp, s"_pending_$txnId"), true)
    try marker.write(journalDir.getBytes("UTF-8")) finally marker.close()
    fs.create(new Path(basePath, s"pending_v${version}_$txnId"), true).close()
    val won = commitAttempt(fs, basePath, temp, writerId, version).contains(true)
    if (!won) {
      if (fs.exists(temp)) fs.delete(temp, true)
      if (ownClaim()) return true // raced our own earlier attempt
      try fs.delete(new Path(basePath, s"pending_v${version}_$txnId"), false)
      catch { case _: Exception => () }
    }
    won
  }

  /** The versions transaction `txnId` holds pending claims on under
    * `base` — read off the `pending_v<N>_<txnId>` breadcrumbs. The ONE
    * claim-discovery implementation every protocol consumer shares
    * (commit finalization, abort rollback, VACUUM's journal sweep);
    * the breadcrumb naming scheme must never be re-derived at call
    * sites (review pass 1, round 14).
    */
  def pendingClaims(spark: SparkSession, base: String,
                    txnId: String): Seq[Long] = {
    require(txnId.matches("[A-Za-z0-9]+"), s"unsafe txn id: $txnId")
    val fs = fileSystem(spark, base)
    val basePath = new Path(base)
    if (!fs.exists(basePath)) return Seq.empty
    val crumb = s"pending_v(\\d+)_$txnId".r
    fs.listStatus(basePath).toSeq.flatMap(_.getPath.getName match {
      case crumb(v) => Some(v.toLong)
      case _ => None
    }).sorted
  }

  /** Remove a COMMITTED claim's marker + breadcrumb (what readers do
    * lazily in [[listVisible]]) — the eager form the commit path runs
    * so the journal file can be retired immediately after.
    */
  def finalizePending(spark: SparkSession, base: String, version: Long,
                      txnId: String): Unit = {
    val fs = fileSystem(spark, base)
    val basePath = new Path(base)
    try {
      fs.delete(new Path(basePath, s"manifest_v$version/_pending_$txnId"), false)
      fs.delete(new Path(basePath, s"pending_v${version}_$txnId"), false)
    } catch { case _: Exception => () } // readers finalize lazily anyway
  }

  /** Drop an UNCOMMITTED pending claim (phase-1 rollback): the version
    * dir was never visible to any reader and no writer can have based
    * on it, so deleting it (and its breadcrumb) is safe. Must not be
    * called after the journal commit point.
    */
  def abortPending(spark: SparkSession, base: String, version: Long,
                   txnId: String): Unit = {
    val fs = fileSystem(spark, base)
    val basePath = new Path(base)
    val dir = new Path(basePath, s"manifest_v$version")
    // only this txn's claim — never a plain committed version
    if (fs.exists(new Path(dir, s"_pending_$txnId"))) fs.delete(dir, true)
    try fs.delete(new Path(basePath, s"pending_v${version}_$txnId"), false)
    catch { case _: Exception => () }
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
