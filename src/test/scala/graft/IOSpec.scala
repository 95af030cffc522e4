package graft

import graft.sinks.TableStore
import graft.sources.Ingest
import org.apache.spark.sql.functions._

import java.nio.file.Files

class IOSpec extends SparkSpec {

  test("format autodetection by extension") {
    assert(Ingest.detectFormat("/a/b/data.parquet") == "parquet")
    assert(Ingest.detectFormat("x.CSV") == "csv")
    assert(Ingest.detectFormat("x.csv.gz") == "csv")
    assert(Ingest.detectFormat("events.jsonl") == "json")
    intercept[RuntimeException](Ingest.detectFormat("mystery.bin"))
  }

  test("partitioned lake read is partition-pruned") {
    val orders = Tables.load(spark, sfDir, "orders")
    val lake = Files.createTempDirectory("graft_prune").toString + "/lake"
    TableStore.writePartitioned(orders, lake, Seq("o_orderstatus"))
    val plan = spark.read.parquet(lake)
      .filter(col("o_orderstatus") === "F")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("o_orderstatus"), s"no partition pruning in plan:\n$plan")
  }

  test("filter and projection push into the parquet scan") {
    val plan = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_quantity") > 45)
      .select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned:\n$plan")
  }

  test("upsert: second batch wins on overlapping keys, first survives elsewhere") {
    import spark.implicits._
    val path = Files.createTempDirectory("graft_upsert").toString + "/t"
    val b1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val b2 = Seq((2L, "B"), (3L, "C")).toDF("k", "v")
    TableStore.upsert(spark, path, b1, Seq("k"))
    TableStore.upsert(spark, path, b2, Seq("k"))
    val got = spark.read.parquet(path).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "B", 3L -> "C"))
  }

  test("bucketed join plans without a shuffle exchange") {
    val df = graft.queries.IOQueries.sinkBucketed(spark, sfDir)
    // drop the presentation sort/agg: check the join itself
    val joinPlan = df.queryExecution.executedPlan.toString
    // the two bucketed scans feed SortMergeJoin directly - no
    // hashpartitioning exchange may appear below the join
    val exchanges = "Exchange hashpartitioning\\((o_orderkey|l_orderkey)".r
      .findAllIn(joinPlan).length
    assert(exchanges == 0, s"bucketed join still shuffles:\n$joinPlan")
    assert(df.collect().nonEmpty)
  }

  test("dimension joins broadcast (no shuffle on the dim side)") {
    val plan = graft.queries.Relational.qJoin(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }
}
