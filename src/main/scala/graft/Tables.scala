package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's "point the pipeline at a data file" model
  * (reference: week_1/data_ingest/data_ingest.py:22 `get_data`), except
  * the reader is Spark's vectorized parquet scan: column pruning and
  * predicate pushdown reach the file scan for free once plans stay
  * declarative.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's TimestampType
    * (micros) cannot hold — the session reads it as a nanos LongType
    * (`spark.sql.legacy.parquet.nanosAsLong`). We keep the exact nanos as
    * `ts_ns` (for gap/session arithmetic — no precision loss vs the
    * DuckDB oracle's native nanos) and derive a micros `ts` timestamp for
    * calendar ops (date truncation is unaffected).
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(path(dir, name))
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumnRenamed("ts", "ts_ns")
        // integer `div`, NOT `/`: lossy long→double at ~1.7e18 shifts the
        // truncation point by up to ~1 µs (observed vs the DuckDB oracle)
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts_ns div 1000")))
    else df
  }

  /** Register every table as a temp view so `spark.sql(...)` works —
    * the reference's query layer is arbitrary SQL
    * (week_1/data_ingest/data_ingest.py:109 `query_data_from_table`).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
