package graft.sinks

import org.apache.spark.sql.SparkSession

/** Named refs — BRANCHES and TAGS — over a [[ManifestStore]] version
  * history (the Iceberg ref system / Nessie shape, K38): a branch is
  * a mutable name → version pointer, a tag an immutable one. Because
  * every manifest version is a COMPLETE snapshot (a full file list,
  * never a delta), a ref carries everything a reader needs — reading
  * a branch IS reading the manifest at its head version — and
  * "fast-forward publish" (the write-audit-publish branch workflow,
  * K16 done the Iceberg way) is nothing but a main-ref flip: no data
  * moves, ever.
  *
  * The ref table itself lives in its own ManifestStore lake, so every
  * ref flip is an atomic, versioned, auditable commit. Updates go
  * through a compare-and-swap loop ([[update]]): read the refs at the
  * current version, transform, `tryPublish` at exactly version+1 —
  * a concurrent flip forces a re-read-and-retry, so two racing
  * updates to DIFFERENT refs both land (no lost update, the hazard a
  * read-modify-write over `publish` would have) and two racing
  * updates to the SAME ref serialize with last-committer-wins over a
  * FRESH read.
  *
  * At 100 TB the cost model is the whole point: refs are a handful of
  * metadata rows; branch creation, tagging, audit-branch publish and
  * rollback are all O(refs) commits that never touch a data file.
  */
object RefStore {

  /** All refs at the ref store's current version: name → (kind, version).
    * Empty before the first flip.
    */
  def refs(spark: SparkSession, refBase: String): Map[String, (String, Long)] =
    refsAt(spark, refBase,
      ManifestStore.versions(spark, refBase).lastOption.getOrElse(0L))

  private val RefSchema = "name STRING, kind STRING, version BIGINT"

  private def refsAt(spark: SparkSession, refBase: String,
                     v: Long): Map[String, (String, Long)] =
    if (v == 0L) Map.empty
    // EXPLICIT schema: dropping the last ref publishes a ZERO-ROW
    // manifest, and schema inference over an empty JSON dir has no
    // columns — the inferred read would wedge the store permanently
    // (review finding, round 10; the schema rides ManifestStore's own
    // read so the store's path layout stays in one place)
    else ManifestStore.at(spark, refBase, Some(v), Some(RefSchema))._2
      .collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap

  /** Resolve `name` to (kind, version); throws if the ref does not exist. */
  def resolve(spark: SparkSession, refBase: String, name: String): (String, Long) =
    refs(spark, refBase).getOrElse(name,
      throw new java.util.NoSuchElementException(
        s"no ref '$name' under $refBase (have: ${refs(spark, refBase).keys.toSeq.sorted.mkString(", ")})"))

  /** Atomically set `name` (kind `branch` or `tag`) to `version`.
    * Tags are IMMUTABLE: re-pointing an existing tag at a different
    * version throws (re-asserting the same version is a no-op flip);
    * a name cannot change kind.
    */
  def set(spark: SparkSession, refBase: String, name: String,
          kind: String, version: Long): Unit = {
    require(kind == "branch" || kind == "tag", s"unknown ref kind '$kind'")
    update(spark, refBase) { cur =>
      cur.get(name).foreach { case (k, v) =>
        require(k == kind, s"ref '$name' already exists with kind '$k'")
        if (kind == "tag" && v != version)
          throw new IllegalStateException(
            s"tag '$name' is immutable (pinned at v$v; refusing move to v$version)")
      }
      cur + (name -> (kind, version))
    }
  }

  /** Drop a ref (branch rollback-by-delete; tags drop too — deletion
    * is not mutation, matching Iceberg's tag semantics).
    */
  def drop(spark: SparkSession, refBase: String, name: String): Unit =
    update(spark, refBase)(_ - name)

  /** CAS-loop commit of a refs transformation: read at the current
    * version, transform, publish at exactly current+1; a lost race
    * re-reads and retries so no concurrent flip is ever overwritten
    * from a stale base.
    */
  def update(spark: SparkSession, refBase: String)(
      f: Map[String, (String, Long)] => Map[String, (String, Long)]): Unit = {
    var attempts = 0
    while (attempts < 1000) {
      attempts += 1
      val basedOn = ManifestStore.versions(spark, refBase).lastOption.getOrElse(0L)
      val next = f(refsAt(spark, refBase, basedOn))
      import spark.implicits._
      val df = next.toSeq.map { case (n, (k, v)) => (n, k, v) }
        .toDF("name", "kind", "version")
      if (ManifestStore.tryPublish(spark, refBase, df, basedOn + 1)) return
    }
    throw new java.io.IOException(
      s"ref update under $refBase lost $attempts consecutive CAS races")
  }
}
