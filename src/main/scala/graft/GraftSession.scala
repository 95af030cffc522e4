package graft

import org.apache.spark.sql.SparkSession

/** Tuned SparkSession factory for the graft engine.
  *
  * Every knob here is chosen for the 100 TB / many-executor target and
  * merely *also* works on `local[32]`:
  *   - AQE on (runtime coalescing, skew-join splitting, join-strategy
  *     demotion) so static shuffle-partition counts don't need to be
  *     right at every scale factor;
  *   - shuffle partitions default to the core count locally — on a real
  *     cluster deployments override this to 2–3× total cores and AQE
  *     coalesces back down;
  *   - broadcast threshold 16 MiB: all true dimension tables
  *     (region/nation/supplier, LSH centroid sets, language-marker
  *     tables) stay map-side at any SF, while array-heavy corpus
  *     tables never qualify (see the inline note on the config);
  *   - 256 MiB parquet split size keeps task counts sane on wide scans.
  */
object GraftSession {
  def builder(
      appName: String = "graft",
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors()
  ): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .master(master)
      // native graft expressions on the SQL surface (graft_cosine, …)
      .withExtensions(new org.apache.spark.sql.graft.GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // 16 MiB: dimension tables (region/nation/supplier, centroid sets,
      // marker lists) are KBs and always qualify; array-heavy corpus
      // tables (shingle sets, embeddings) must NOT qualify — their
      // deserialized footprint is several× the plan's serialized
      // estimate and repeated broadcasts become driver-heap churn
      .config("spark.sql.autoBroadcastJoinThreshold", (16L * 1024 * 1024).toString)
      .config("spark.sql.files.maxPartitionBytes", (256L * 1024 * 1024).toString)
      .config("spark.sql.parquet.filterPushdown", "true")
      // testdata events.ts is TIMESTAMP(NANOS) — read as nanos long (see Tables.load)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft_warehouse")
      .config("spark.ui.enabled", "false")

  def getOrCreate(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
