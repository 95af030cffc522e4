package graft.sources

import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** File ingestion — the reference's `get_data` step
  * (reference: week_1/data_ingest/data_ingest.py:22 reads a CSV or
  * parquet path into a DataFrame; week_2/data_ingest/pipeline.py:150
  * `get_data` same idea with retries).
  *
  * Spark-first re-expression: `spark.read` with an explicit format
  * dispatch. At 100 TB the important properties are
  *   - explicit schema for text formats (no inference pre-scan of the
  *     whole dataset; inference samples on parquet are free since the
  *     schema is in the footer);
  *   - the returned plan is a plain scan relation, so downstream
  *     filters/projections push into it (PushedFilters / ReadSchema);
  *   - CSV/JSON parse inside codegen'd scan tasks — ingestion is a
  *     fully parallel narrow stage, no driver involvement.
  */
object Ingest {

  /** Infer the format from the path extension, like the reference does
    * with its `.csv` / `.parquet` branches
    * (week_1/data_ingest/data_ingest.py:31-47).
    */
  def detectFormat(path: String): String = {
    val p = path.toLowerCase.stripSuffix(".gz").stripSuffix(".gzip")
    if (p.endsWith(".parquet")) "parquet"
    else if (p.endsWith(".csv")) "csv"
    else if (p.endsWith(".json") || p.endsWith(".jsonl") || p.endsWith(".ndjson")) "json"
    else sys.error(s"cannot detect format of $path (expected .csv/.json/.parquet)")
  }

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV with header. Explicit schema when provided (the scale path);
    * otherwise inference (samples the file — fine for interactive use,
    * avoid on 100 TB inputs).
    */
  def readCsv(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(path)
  }

  def readJson(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** The reference's single entry point: point at a file, get a table. */
  def read(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame =
    detectFormat(path) match {
      case "parquet" => readParquet(spark, path)
      case "csv"     => readCsv(spark, path, schema)
      case "json"    => readJson(spark, path, schema)
    }
}
