package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned, atomically-committed manifest publishes (the commit
  * protocol half of a lakehouse table format, K11's metadata layer).
  *
  * Protocol (Iceberg-flavored optimistic concurrency, no lock service):
  *   1. The manifest dataset is written to a dot-prefixed TEMP dir —
  *      invisible to readers, garbage if the writer dies mid-write.
  *   2. Commit = one atomic `rename(temp, manifest_v<N>)`. Directory
  *      rename is atomic on HDFS and POSIX, and FAILS if the
  *      destination exists — so the rename is simultaneously the
  *      version CLAIM and the publish. A loser (concurrent publisher
  *      claimed the same N first) bumps N and renames again; its data
  *      is untouched in temp, so retry costs no rewrite.
  *   3. Readers list `manifest_v*` and take the highest version: every
  *      listed version is complete-by-construction (it appeared via
  *      atomic rename), so a reader can NEVER observe a partial file
  *      list, no matter how many publishers race.
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

  /** Atomically publish `manifest` as the next version under `base`;
    * returns the committed version number.
    */
  def publish(spark: SparkSession, base: String, manifest: DataFrame): Long = {
    val fs = fileSystem(spark, base)
    val basePath = new Path(base)
    fs.mkdirs(basePath)
    val temp = new Path(basePath,
      s".manifest_tmp_${java.util.UUID.randomUUID().toString.take(12)}")
    manifest.coalesce(1).write.mode("overwrite").json(temp.toString)
    var v = versions(spark, base).lastOption.getOrElse(0L) + 1
    while (true) {
      val dst = new Path(basePath, s"manifest_v$v")
      if (fs.rename(temp, dst)) return v
      // rename only legitimately fails when a concurrent publisher
      // claimed this version first; anything else is a real IO error
      if (!fs.exists(dst))
        throw new java.io.IOException(s"manifest commit rename failed for $dst")
      v += 1
    }
    v // unreachable
  }

  /** The highest committed version and its manifest rows. Throws if
    * nothing has been published.
    */
  def current(spark: SparkSession, base: String): (Long, DataFrame) = {
    val v = versions(spark, base).lastOption.getOrElse(
      throw new java.util.NoSuchElementException(s"no committed manifest under $base"))
    (v, spark.read.json(new Path(new Path(base), s"manifest_v$v").toString))
  }
}
