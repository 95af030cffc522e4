package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions._

import graft.sinks.{ManifestStore, RefStore}

/** Round-10 batch-3 specs: the manifest-lake ref system (K38) — the
  * contracts a DataFrame-level oracle can't see: tag immutability
  * (the move must THROW), branch isolation on hand data, and the CAS
  * loop surviving a LIVE two-writer ref race without a lost update.
  */
class Round23Spec extends SparkSpec {

  private def freshBase(): String =
    java.nio.file.Files.createTempDirectory("graft_refspec").toString

  test("refstore: tags are immutable — re-pointing throws, re-asserting is a no-op") {
    val refs = freshBase() + "/refs"
    RefStore.set(spark, refs, "rel", "tag", 5L)
    RefStore.set(spark, refs, "rel", "tag", 5L) // same version: allowed
    assert(RefStore.resolve(spark, refs, "rel") == ("tag", 5L))
    intercept[IllegalStateException] {
      RefStore.set(spark, refs, "rel", "tag", 6L)
    }
    assert(RefStore.resolve(spark, refs, "rel") == ("tag", 5L),
      "a refused move must leave the tag untouched")
    intercept[IllegalArgumentException] {
      RefStore.set(spark, refs, "rel", "branch", 7L) // kind change refused
    }
  }

  test("refstore: branch commits are invisible through main until the fast-forward flip") {
    import spark.implicits._
    val base = freshBase()
    val (versions, refs) = (base + "/versions", base + "/refs")
    def commit(rows: Seq[(Long, String)]): Long = {
      val path = base + s"/data_${rows.length}"
      rows.toDF("k", "v").write.mode("overwrite").parquet(path)
      ManifestStore.publish(spark, versions,
        spark.read.parquet(path).groupBy(input_file_name().as("file"))
          .agg(count(lit(1)).as("n_rows")))
    }
    def rowsThrough(name: String): Long = {
      val (_, v) = RefStore.resolve(spark, refs, name)
      val (_, man) = ManifestStore.at(spark, versions, Some(v))
      spark.read.parquet(man.select("file").collect().map(_.getString(0)): _*).count()
    }
    val v1 = commit(Seq((1L, "a"), (2L, "b")))
    RefStore.set(spark, refs, "main", "branch", v1)
    RefStore.set(spark, refs, "dev", "branch", v1)
    val v2 = commit(Seq((1L, "a"), (2L, "b"), (3L, "c")))
    RefStore.set(spark, refs, "dev", "branch", v2)
    assert(rowsThrough("dev") == 3L && rowsThrough("main") == 2L,
      "a branch commit must be visible through the branch and invisible through main")
    // fast-forward publish = one ref flip, zero data movement
    RefStore.set(spark, refs, "main", "branch",
      RefStore.resolve(spark, refs, "dev")._2)
    assert(rowsThrough("main") == 3L)
  }

  test("refstore: LIVE two-writer CAS race — racing flips to different refs both land") {
    val refs = freshBase() + "/refs"
    RefStore.set(spark, refs, "main", "branch", 1L)
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    val fails = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    def racer(name: String, v: Long): Runnable = () => {
      start.await()
      try RefStore.set(spark, refs, name, "branch", v)
      catch { case t: Throwable => fails.add(t) }
    }
    pool.submit(racer("exp_a", 7L)); pool.submit(racer("exp_b", 9L))
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(fails.isEmpty, s"racer failed: ${fails.peek()}")
    val after = RefStore.refs(spark, refs)
    // the lost-update hazard: a stale read-modify-write would drop one
    assert(after.get("exp_a").contains(("branch", 7L)), s"lost exp_a in $after")
    assert(after.get("exp_b").contains(("branch", 9L)), s"lost exp_b in $after")
    assert(after.get("main").contains(("branch", 1L)))
    // the ref lake recorded one version per landed flip (1 seed + 2 racers)
    assert(ManifestStore.versions(spark, refs).size == 3)
  }
}
