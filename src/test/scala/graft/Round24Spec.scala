package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

import graft.sinks.ManifestStore

/** Round-11 specs: K42 positional-delete merge-on-read — the contracts
  * the DataFrame-level oracle can't see: no data-file rewrite under
  * DML, the COLUMNAR scan surviving live deletes, `_file`/`_pos`
  * metadata-column semantics, position union across successive DMLs,
  * compaction/OPTIMIZE interplay, and the round-11 VACUUM orphan-GC
  * grace window.
  */
class Round24Spec extends SparkSpec {

  private val cat = "graft"

  private def ensure(): Unit = graft.queries.IOQueries.ensureCatalog(spark)

  private def manBase(table: String): String =
    graft.queries.IOQueries.catalogRoot + s"/lake/$table/manifest"

  private def manifestFiles(table: String): Seq[String] = {
    val mb = manBase(table)
    ManifestStore.versions(spark, mb).lastOption
      .map(v => org.apache.spark.sql.graft.GraftLakeTable
        .manifestRowsFull(spark, mb, v).map(_.file))
      .getOrElse(Seq.empty)
  }

  private def freshPosTable(name: String): Unit = {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.$name")
    spark.sql(
      s"""CREATE TABLE $cat.lake.$name (k BIGINT NOT NULL, v STRING, amt DOUBLE)
         |TBLPROPERTIES('graft.merge-on-read.mode'='position')""".stripMargin)
  }

  private def batchScans(plan: SparkPlan): Seq[BatchScanExec] =
    plan.collect { case b: BatchScanExec => b }

  test("posdelta: DELETE masks rows, rewrites no data file, lands one posdel file") {
    freshPosTable("pos_t")
    spark.sql(s"INSERT INTO $cat.lake.pos_t VALUES (1,'a',1.0),(2,'b',2.0),(3,'c',3.0)")
    spark.sql(s"INSERT INTO $cat.lake.pos_t VALUES (4,'d',4.0),(5,'e',5.0)")
    val dataBefore = manifestFiles("pos_t").filter(_.startsWith("data_")).toSet
    spark.sql(s"DELETE FROM $cat.lake.pos_t WHERE k % 2 = 0")
    val after = manifestFiles("pos_t")
    assert(after.filter(_.startsWith("data_")).toSet == dataBefore,
      s"DELETE must not rewrite or drop committed data files: $after")
    assert(after.count(_.startsWith("posdel_")) == 1,
      s"DELETE must land exactly one position-delete file: $after")
    val out = spark.sql(s"SELECT k, v FROM $cat.lake.pos_t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((1L, "a"), (3L, "c"), (5L, "e")), s"masked read: $out")
  }

  test("posdelta: masked reads stay COLUMNAR (the whole point vs equality deletes)") {
    freshPosTable("pos_col")
    spark.sql(s"INSERT INTO $cat.lake.pos_col VALUES (1,'a',1.0),(2,'b',2.0),(3,'c',3.0)")
    spark.sql(s"DELETE FROM $cat.lake.pos_col WHERE k = 2")
    assert(manifestFiles("pos_col").exists(_.startsWith("posdel_")),
      "precondition: live position deletes")
    val df = spark.sql(s"SELECT k, amt FROM $cat.lake.pos_col")
    val scans = batchScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, "expected a BatchScanExec")
    assert(scans.forall(_.supportsColumnar),
      s"a masked positional read must keep the columnar scan:\n${df.queryExecution.executedPlan}")
    assert(df.schema.fieldNames.toSeq == Seq("k", "amt"),
      "the internal row-index column must not leak into the output")
    val got = df.collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 3L), s"columnar masked values: $got")
  }

  test("posdelta: UPDATE = position delete + reinsert; old files untouched") {
    freshPosTable("pos_u")
    spark.sql(s"INSERT INTO $cat.lake.pos_u VALUES (1,'a',1.0),(2,'b',2.0)")
    val dataBefore = manifestFiles("pos_u").filter(_.startsWith("data_")).toSet
    spark.sql(s"UPDATE $cat.lake.pos_u SET amt = amt + 100.0 WHERE k = 2")
    val after = manifestFiles("pos_u")
    assert(dataBefore.subsetOf(after.filter(_.startsWith("data_")).toSet),
      "UPDATE must carry old data files by reference")
    assert(after.count(_.startsWith("posdel_")) == 1)
    val out = spark.sql(s"SELECT k, amt FROM $cat.lake.pos_u ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out == Seq((1L, 1.0), (2L, 102.0)), s"updated read: $out")
  }

  test("posdelta: _file/_pos are user-queryable metadata columns with file-ordinal semantics") {
    freshPosTable("pos_m")
    spark.sql(
      s"""INSERT INTO $cat.lake.pos_m
         |SELECT /*+ REPARTITION(1) */ id + 10 AS k, 'x' AS v,
         |  cast(id AS DOUBLE) AS amt FROM range(3)""".stripMargin)
    val rows = spark.sql(s"SELECT _file, _pos, k FROM $cat.lake.pos_m ORDER BY _pos")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.forall(_._1.startsWith("data_")),
      s"_file must be the table-relative data file path: $rows")
    // single-partition insert = one file; ordinals are 0..n-1
    assert(rows.map(_._2).sorted == Seq(0L, 1L, 2L), s"_pos ordinals: $rows")
    assert(rows.map(_._1).distinct.size == 1, s"one file expected: $rows")
  }

  test("posdelta: successive DMLs union positions; delete of an updated row's new copy works") {
    freshPosTable("pos_s")
    spark.sql(s"INSERT INTO $cat.lake.pos_s VALUES (1,'a',1.0),(2,'b',2.0),(3,'c',3.0)")
    spark.sql(s"DELETE FROM $cat.lake.pos_s WHERE k = 1")
    spark.sql(s"UPDATE $cat.lake.pos_s SET v = 'B' WHERE k = 2")
    // the updated copy of k=2 lives in a NEW file; deleting it must
    // mask the reinserted row, not the original (already-masked) one
    spark.sql(s"DELETE FROM $cat.lake.pos_s WHERE k = 2")
    val out = spark.sql(s"SELECT k, v FROM $cat.lake.pos_s ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == Seq((3L, "c")), s"after delete/update/delete: $out")
    assert(manifestFiles("pos_s").count(_.startsWith("posdel_")) == 3)
  }

  test("posdelta: MERGE INTO drives matched-update / not-matched-insert through positions") {
    freshPosTable("pos_mg")
    spark.sql(s"INSERT INTO $cat.lake.pos_mg VALUES (1,'a',1.0),(2,'b',2.0)")
    spark.range(2, 4).selectExpr("id AS k", "'m' AS v", "cast(id as double) AS amt")
      .createOrReplaceTempView("pos_mg_src")
    spark.sql(
      s"""MERGE INTO $cat.lake.pos_mg t USING pos_mg_src s ON t.k = s.k
         |WHEN MATCHED THEN UPDATE SET v = s.v, amt = s.amt
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = spark.sql(s"SELECT k, v, amt FROM $cat.lake.pos_mg ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out == Seq((1L, "a", 1.0), (2L, "m", 2.0), (3L, "m", 3.0)), s"merged: $out")
  }

  test("posdelta: OPTIMIZE refuses on live position deletes; compact_deletes folds them") {
    freshPosTable("pos_c")
    spark.sql(s"INSERT INTO $cat.lake.pos_c VALUES (1,'a',1.0),(2,'b',2.0),(3,'c',3.0)")
    spark.sql(s"DELETE FROM $cat.lake.pos_c WHERE k = 2")
    val err = intercept[Exception](
      spark.sql(s"CALL $cat.system.optimize('lake.pos_c', 100)").collect())
    assert((err.getMessage + Option(err.getCause).map(_.getMessage).getOrElse(""))
      .contains("delete"), s"OPTIMIZE must refuse with a named error: ${err.getMessage}")
    val metrics = spark.sql(s"CALL $cat.system.compact_deletes('lake.pos_c')")
      .collect().head
    assert(metrics.getLong(0) == 1L && metrics.getLong(1) == 1L,
      s"compaction metrics: $metrics")
    assert(!manifestFiles("pos_c").exists(_.startsWith("posdel_")),
      "compaction must leave no delete files")
    val out = spark.sql(s"SELECT k FROM $cat.lake.pos_c ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 3L))
    // and OPTIMIZE now runs
    spark.sql(s"CALL $cat.system.optimize('lake.pos_c', 100)").collect()
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.pos_c").head.getLong(0) == 2L)
  }

  test("posdelta: filter pushdown and stats file-pruning still reach the masked scan") {
    freshPosTable("pos_f")
    spark.sql(s"INSERT INTO $cat.lake.pos_f VALUES (1,'a',1.0),(2,'b',2.0)")
    spark.sql(s"INSERT INTO $cat.lake.pos_f VALUES (100,'x',10.0),(101,'y',11.0)")
    spark.sql(s"DELETE FROM $cat.lake.pos_f WHERE k = 100")
    val df = spark.sql(s"SELECT k FROM $cat.lake.pos_f WHERE k >= 100")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [k >= 100]"),
      s"filters must push into the parquet scan:\n$plan")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(101L))
  }

  test("cdf stream: per-commit attribution, delta images, retention guard") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{count, input_file_name, lit}
    val base = java.nio.file.Files.createTempDirectory("graft_cdfspec").toString
    val (lake, man) = (base + "/lake", base + "/man")
    def publish(rows: Seq[(Long, Double)], gen: Int): Unit = {
      rows.toDF("k", "p").repartition(1).write.parquet(s"$lake/gen$gen")
      graft.sinks.ManifestStore.publish(spark, man,
        spark.read.parquet(s"$lake/gen$gen")
          .groupBy(input_file_name().as("file")).agg(count(lit(1)).as("n_rows")))
    }
    publish(Seq((1L, 1.0), (2L, 2.0)), 1)                 // v1: two inserts
    publish(Seq((1L, 9.0), (3L, 3.0)), 2)                 // v2: upd k1, del k2, ins k3
    publish(Seq((1L, 9.0)), 3)                            // v3: del k3
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("p", org.apache.spark.sql.types.DoubleType)))
    def drain(name: String): Unit = {
      val q = spark.readStream.format("graft-cdf").schema(schema)
        .option("manifest", man).option("key", "k").load()
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", s"$base/ckpt_$name")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain("cdfspec")
    val got = spark.sql("SELECT * FROM cdfspec ORDER BY _commit_version, _change_type, k")
      .collect().map(r => (r.getLong(3), r.getString(2), r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq(
      (1L, "insert", 1L, 1.0), (1L, "insert", 2L, 2.0),
      (2L, "delete", 2L, 2.0), (2L, "insert", 3L, 3.0),
      (2L, "update_postimage", 1L, 9.0), (2L, "update_preimage", 1L, 1.0),
      (3L, "delete", 3L, 3.0)),
      s"per-commit delta images: $got")
    // retention guard: sweep v1/v2, a fresh drain needs v2 as the base
    // of step v3 and must fail NAMED, never re-baseline to inserts
    graft.sinks.ManifestStore.retain(spark, man, 1)
    val err = intercept[Exception](drain("cdfspec_swept"))
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(err).contains("no longer committed"),
      s"swept base must fail with the named retention error: ${msgs(err)}")
    // ...and the named remedy is SATISFIABLE: startingVersion on the
    // oldest retained version re-delivers its snapshot as inserts
    val q2 = spark.readStream.format("graft-cdf").schema(schema)
      .option("manifest", man).option("key", "k")
      .option("startingVersion", "3").load()
      .writeStream.format("memory").queryName("cdfspec_sv")
      .option("checkpointLocation", s"$base/ckpt_sv")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    val sv = spark.sql("SELECT k, p, _change_type, _commit_version FROM cdfspec_sv")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getLong(3))).toSeq
    assert(sv == Seq((1L, 9.0, "insert", 3L)),
      s"oldest-retained startingVersion must deliver the snapshot as inserts: $sv")
  }

  test("cdf stream: merge-on-read delete files are refused, never misread as data") {
    freshPosTable("pos_cdf")
    spark.sql(s"INSERT INTO $cat.lake.pos_cdf VALUES (1,'a',1.0),(2,'b',2.0)")
    spark.sql(s"DELETE FROM $cat.lake.pos_cdf WHERE k = 2")
    val tdir = graft.queries.IOQueries.catalogRoot + "/lake/pos_cdf"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("amt", org.apache.spark.sql.types.DoubleType)))
    val err = intercept[Exception] {
      val q = spark.readStream.format("graft-cdf").schema(schema)
        .option("manifest", s"$tdir/manifest").option("key", "k")
        .option("dir", tdir).load()
        .writeStream.format("noop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft_cdfmor").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(err).contains("delete file"),
      s"MoR versions must be refused with a named error: ${msgs(err)}")
  }

  test("cdf stream through the catalog: masked snapshots make MoR deletes diff as deletes") {
    freshPosTable("pos_cdfc")
    spark.sql(s"INSERT INTO $cat.lake.pos_cdfc VALUES (1,'a',1.0),(2,'b',2.0)")
    spark.sql(s"DELETE FROM $cat.lake.pos_cdfc WHERE k = 2")
    spark.sql(s"UPDATE $cat.lake.pos_cdfc SET amt = 9.0 WHERE k = 1")
    val q = spark.readStream.format("graft-cdf")
      .option("table", s"$cat.lake.pos_cdfc").option("key", "k").load()
      .writeStream.format("memory").queryName("cdfc")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_cdfc").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.sql(
      "SELECT _commit_version, _change_type, k, amt FROM cdfc " +
        "ORDER BY _commit_version, _change_type, k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq(
      (1L, "insert", 1L, 1.0), (1L, "insert", 2L, 2.0),
      (2L, "delete", 2L, 2.0),
      (3L, "update_postimage", 1L, 9.0), (3L, "update_preimage", 1L, 1.0)),
      s"catalog CDF over positional MoR: $got")
  }

  test("ktruss incremental peel ≡ full recompute on hand graphs and the real parts graph") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def run(pairs: org.apache.spark.sql.DataFrame, k: Int, rounds: Int) = {
      val inc = graft.operators.Graph.ktrussOf(pairs, k, rounds)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val full = graft.operators.Graph.ktrussFullOf(pairs, k, rounds)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(inc == full, s"incremental vs full diverged (k=$k): inc=$inc full=$full")
      inc
    }
    // K4 clique (stable 4-truss) + pendant triangle (peels at k=4):
    // nodes 1..4 = K4; triangle 4-5-6 hangs off node 4
    val hand = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L)).toDF("a", "b")
    val k4 = run(hand, 4, 4)
    assert(k4 == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)),
      s"K4 must survive k=4, the pendant triangle must peel: $k4")
    // k=3 keeps both (every edge sits in >= 1 triangle)
    assert(run(hand, 3, 4).map(_._1) == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    // a CHAIN of triangles sharing edges peels over MULTIPLE rounds at
    // k=4 — exercises the round>2 decrement path (drops cascade)
    val chain = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (3L, 5L), (4L, 5L), (4L, 6L), (5L, 6L)).toDF("a", "b")
    assert(run(chain, 4, 4).isEmpty, "a bare triangle chain has no 4-truss")
    // the REAL co-ordered-parts graph (same build as g_ktruss)
    val l1 = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_partkey")
    val pp = l1.as("x").join(l1.as("y"),
        col("x.l_orderkey") === col("y.l_orderkey") &&
          col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b"))
      .distinct()
    run(pp, 4, 4)
  }

  test("metadata tables at a version: files/history pin, flat partitions rollup, bad pin named") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.meta_pin")
    spark.sql(s"CREATE TABLE $cat.lake.meta_pin (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $cat.lake.meta_pin VALUES (1,'a'),(2,'b')")
    spark.sql(s"INSERT INTO $cat.lake.meta_pin VALUES (3,'c')")
    spark.sql(s"DELETE FROM $cat.lake.meta_pin WHERE k = 1")
    // files at the v1 pin = exactly v1's layout (rows sum 2)
    val v1Rows = spark.sql(
      s"SELECT sum(n_rows) FROM $cat.lake.meta_pin.files VERSION AS OF 1")
      .head.getLong(0)
    assert(v1Rows == 2L, s"pinned files must report v1's layout: $v1Rows")
    // history pinned at v2 truncates to commits <= 2
    val hist = spark.sql(
      s"SELECT version FROM $cat.lake.meta_pin.history VERSION AS OF 2 ORDER BY version")
      .collect().map(_.getLong(0)).toSeq
    assert(hist == Seq(1L, 2L), s"pinned history: $hist")
    // a flat table's partitions rollup: ONE '' partition, live rows only
    val parts = spark.sql(s"SELECT * FROM $cat.lake.meta_pin.partitions")
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSeq
    assert(parts.length == 1 && parts.head._1 == "" &&
      parts.head._2 == 2L && parts.head._3 > 0L,
      s"flat partitions rollup: $parts")
    // TIMESTAMP AS OF resolves for metadata relations too (against the
    // BASE table's commit instants; a far-future instant pins latest)
    val histTs = spark.sql(
      s"SELECT count(*) FROM $cat.lake.meta_pin.history TIMESTAMP AS OF '2999-01-01'")
      .head.getLong(0)
    assert(histTs == 3L, s"timestamp-pinned metadata history: $histTs")
    // an uncommitted pin fails with the available range, not a raw read
    val err = intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.lake.meta_pin.files VERSION AS OF 9").collect())
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + msgs(t.getCause)
    assert(msgs(err).contains("not committed"), s"named pin error: ${msgs(err)}")
  }

  test("column defaults: existence default backs old files, current default fills inserts") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.def_t")
    spark.sql(s"CREATE TABLE $cat.lake.def_t (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $cat.lake.def_t VALUES (1,'a')")
    // meta-only commit: the OLD file is untouched, its rows project 2.5
    val filesBefore = manifestFiles("def_t").toSet
    spark.sql(s"ALTER TABLE $cat.lake.def_t ADD COLUMN score DOUBLE DEFAULT 2.5")
    assert(manifestFiles("def_t").toSet == filesBefore,
      "ADD COLUMN DEFAULT must be a metadata-only change")
    // an INSERT omitting the column materializes the CURRENT default
    spark.sql(s"INSERT INTO $cat.lake.def_t (k, v) VALUES (2,'b')")
    // an explicit value wins
    spark.sql(s"INSERT INTO $cat.lake.def_t VALUES (3,'c', 9.9)")
    val got = spark.sql(s"SELECT k, score FROM $cat.lake.def_t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 2.5), (2L, 2.5), (3L, 9.9)),
      s"existence/current default read-back: $got")
    // CREATE TABLE with an inline default
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.def_t2")
    spark.sql(s"CREATE TABLE $cat.lake.def_t2 (k BIGINT, s STRING DEFAULT 'x')")
    spark.sql(s"INSERT INTO $cat.lake.def_t2 (k) VALUES (7)")
    assert(spark.sql(s"SELECT s FROM $cat.lake.def_t2").head.getString(0) == "x")
    // a NON-LITERAL default is refused (Spark's constant-folding gate)
    val err = intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.lake.def_t ADD COLUMN r DOUBLE DEFAULT rand()"))
    assert(err.getMessage != null)
    // the table still reads after the refusal
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.def_t").head.getLong(0) == 3L)
  }

  test("optimize zorder: a 2-D box on a uniform grid touches a bounded file count") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.zo_grid")
    spark.sql(s"CREATE TABLE $cat.lake.zo_grid (x BIGINT, y BIGINT, v DOUBLE)")
    // a 64x64 uniform grid, inserted in x-striped fragments (so the
    // pre-zorder layout is sorted on ONE axis — the case zorder fixes)
    spark.sql(
      s"""INSERT INTO $cat.lake.zo_grid
         |SELECT id % 64 AS x, id DIV 64 AS y, cast(id AS DOUBLE) AS v
         |FROM range(4096)""".stripMargin)
    val metrics = spark.sql(
      s"CALL $cat.system.optimize('lake.zo_grid', 256, array('x', 'y'))")
      .collect().head
    assert(metrics.getLong(2) == 16L,
      s"4096 rows at target 256 must land 16 curve-segment files: $metrics")
    def touched(sql: String): Long = {
      val df = spark.sql(sql)
      df.collect() // force execution (the pruned scan is in the plan)
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan match {
            case g: org.apache.spark.sql.graft.GraftLakeScan => g.inner match {
              case p: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
                p.fileIndex.inputFiles.length.toLong
              case _ => fail("expected the pruned parquet scan")
            }
            case other => fail(s"unexpected scan $other")
          }
      }.sum
    }
    // the pruning LAW: a 16x16 box (1/16 of the area) intersects at
    // most 4 of the 16 curve segments on a uniform grid
    val boxFiles = touched(
      s"SELECT * FROM $cat.lake.zo_grid WHERE x BETWEEN 16 AND 31 AND y BETWEEN 16 AND 31")
    assert(boxFiles <= 4L, s"a 1/16 box must touch <= 4 of 16 zordered files, got $boxFiles")
    // both axes prune INDIVIDUALLY too (the whole point vs one sort)
    val xSlice = touched(s"SELECT * FROM $cat.lake.zo_grid WHERE x BETWEEN 0 AND 7")
    val ySlice = touched(s"SELECT * FROM $cat.lake.zo_grid WHERE y BETWEEN 0 AND 7")
    assert(xSlice < 16L && ySlice < 16L,
      s"single-axis slices must prune on both dims: x=$xSlice y=$ySlice")
    // correctness: the box holds exactly its 256 grid points
    val n = spark.sql(
      s"""SELECT count(*) FROM $cat.lake.zo_grid
         |WHERE x BETWEEN 16 AND 31 AND y BETWEEN 16 AND 31""".stripMargin)
      .head.getLong(0)
    assert(n == 256L, s"box contents after rewrite: $n")
  }

  test("bucketed INSERT write distribution: one file per bucket regardless of source partitioning") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.bdist")
    spark.sql(
      s"""CREATE TABLE $cat.lake.bdist (k BIGINT, v DOUBLE)
         |PARTITIONED BY (bucket(4, k))""".stripMargin)
    // a deliberately MULTI-partition source: without the clustered
    // write distribution the router would land up to tasks x buckets
    // files; with it, each bucket lives in exactly one task
    spark.sql(
      s"""INSERT INTO $cat.lake.bdist
         |SELECT /*+ REPARTITION(8) */ id AS k, cast(id AS DOUBLE) AS v
         |FROM range(1000)""".stripMargin)
    val files1 = manifestFiles("bdist")
    assert(files1.length == 4, s"one file per bucket expected: $files1")
    assert(files1.map(f => f.split('/')(1)).distinct.length == 4,
      s"each bucket dir exactly once: $files1")
    // a second insert appends one more file per bucket
    spark.sql(
      s"""INSERT INTO $cat.lake.bdist
         |SELECT /*+ REPARTITION(8) */ id + 1000 AS k, cast(id AS DOUBLE) AS v
         |FROM range(1000)""".stripMargin)
    assert(manifestFiles("bdist").length == 8)
    // data intact and the SPJ-readable layout preserved
    assert(spark.sql(s"SELECT count(*), sum(k) FROM $cat.lake.bdist")
      .head.toSeq == Seq(2000L, (0L until 2000L).sum))
    // INSERT OVERWRITE resets to one file per bucket
    spark.sql(
      s"""INSERT OVERWRITE $cat.lake.bdist
         |SELECT /*+ REPARTITION(8) */ id AS k, 0.0 AS v FROM range(100)""".stripMargin)
    assert(manifestFiles("bdist").length == 4,
      s"overwrite must land a fresh one-file-per-bucket layout: ${manifestFiles("bdist")}")
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.bdist").head.getLong(0) == 100L)
  }

  test("alter column set/drop default: current default drifts, existence default stays") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.def_drift")
    spark.sql(s"CREATE TABLE $cat.lake.def_drift (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $cat.lake.def_drift VALUES (1,'a')")
    spark.sql(s"ALTER TABLE $cat.lake.def_drift ADD COLUMN seg STRING DEFAULT 'old'")
    spark.sql(s"INSERT INTO $cat.lake.def_drift (k, v) VALUES (2,'b')")
    // the CURRENT default moves; the EXISTENCE default must NOT —
    // rows in files written before the column appeared keep 'old'
    spark.sql(s"ALTER TABLE $cat.lake.def_drift ALTER COLUMN seg SET DEFAULT 'new'")
    spark.sql(s"INSERT INTO $cat.lake.def_drift (k, v) VALUES (3,'c')")
    val got = spark.sql(s"SELECT k, seg FROM $cat.lake.def_drift ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "old"), (2L, "old"), (3L, "new")),
      s"existence default must stay 'old' for pre-ADD rows while the " +
        s"current default drifts to 'new': $got")
    // DROP DEFAULT: later omitted inserts null-fill; history unchanged
    spark.sql(s"ALTER TABLE $cat.lake.def_drift ALTER COLUMN seg DROP DEFAULT")
    spark.sql(s"INSERT INTO $cat.lake.def_drift (k, v) VALUES (4,'d')")
    val afterDrop = spark.sql(s"SELECT k, seg FROM $cat.lake.def_drift ORDER BY k")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("NULL"))).toSeq
    assert(afterDrop == Seq((1L, "old"), (2L, "old"), (3L, "new"), (4L, "NULL")),
      s"after DROP DEFAULT: $afterDrop")
    // the review-pinned refold hazard: a LATER ADD COLUMN runs every
    // field through applySchemaChanges, whose AddColumn path re-folds
    // CURRENT defaults into EXISTS defaults — pre-ADD rows must still
    // read their ORIGINAL existence value afterwards
    spark.sql(s"ALTER TABLE $cat.lake.def_drift ALTER COLUMN seg SET DEFAULT 'newer'")
    spark.sql(s"ALTER TABLE $cat.lake.def_drift ADD COLUMN extra BIGINT")
    val afterAdd = spark.sql(
      s"SELECT seg FROM $cat.lake.def_drift WHERE k = 1").head.getString(0)
    assert(afterAdd == "old",
      s"a later ADD COLUMN must not re-fold the drifted current default " +
        s"into the existence default: got '$afterAdd'")
  }

  test("cdf through the catalog binds columns by ordinal even when the key is not first") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.cdf_kord")
    // key column deliberately LAST: a positional misbind would read
    // long bits as double (garbage) — review finding, round 11
    spark.sql(s"CREATE TABLE $cat.lake.cdf_kord (amt DOUBLE, name STRING, k BIGINT)")
    spark.sql(s"INSERT INTO $cat.lake.cdf_kord VALUES (1.5,'a',10),(2.5,'b',20)")
    spark.sql(s"DELETE FROM $cat.lake.cdf_kord WHERE k = 20")
    val q = spark.readStream.format("graft-cdf")
      .option("table", s"$cat.lake.cdf_kord").option("key", "k").load()
      .writeStream.format("memory").queryName("cdf_kord")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_kord").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.sql(
      "SELECT _commit_version, _change_type, amt, name, k FROM cdf_kord " +
        "ORDER BY _commit_version, _change_type, k")
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, "insert", 1.5, "a", 10L), (1L, "insert", 2.5, "b", 20L),
      (2L, "delete", 2.5, "b", 20L)),
      s"key-last table must bind by declared ordinal: $got")
  }

  test("bucketed write distribution handles NULL keys like hash(NULL)=seed") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.bnull")
    spark.sql(
      s"""CREATE TABLE $cat.lake.bnull (k BIGINT, v DOUBLE)
         |PARTITIONED BY (bucket(4, k))""".stripMargin)
    // NULL keys from a multi-partition source: the shuffle must route
    // them to the SAME task as the seed bucket's non-null keys or the
    // one-file-per-bucket law breaks (review finding, round 11)
    spark.sql(
      s"""INSERT INTO $cat.lake.bnull
         |SELECT /*+ REPARTITION(8) */
         |  CASE WHEN id % 10 = 0 THEN NULL ELSE id END AS k,
         |  cast(id AS DOUBLE) AS v
         |FROM range(1000)""".stripMargin)
    val files = manifestFiles("bnull")
    assert(files.length == 4,
      s"NULL keys must not split a bucket into extra files: $files")
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.bnull").head.getLong(0) == 1000L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.lake.bnull WHERE k IS NULL")
      .head.getLong(0) == 100L)
  }

  test("vacuum grace window: young unreferenced files survive; grace 0 reclaims them") {
    ensure()
    spark.sql(s"DROP TABLE IF EXISTS $cat.lake.grace_t")
    spark.sql(s"CREATE TABLE $cat.lake.grace_t (k BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $cat.lake.grace_t VALUES (1,'a')")
    spark.sql(s"INSERT OVERWRITE $cat.lake.grace_t VALUES (2,'b')")
    val dir = new java.io.File(graft.queries.IOQueries.catalogRoot + "/lake/grace_t")
    def dataFiles(): Seq[java.io.File] =
      Option(dir.listFiles()).getOrElse(Array.empty).toSeq
        .filter(_.getName.startsWith("data_"))
        .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty).toSeq)
        .filter(_.getName.endsWith(".parquet"))
    val before = dataFiles().size
    assert(before >= 2, s"precondition: v1's file still on disk ($before)")
    // default 24h grace: the just-unreferenced v1 file is YOUNG — an
    // in-flight writer's files look exactly like this; must survive
    spark.sql(s"CALL $cat.system.vacuum(table => 'lake.grace_t', keep => 1)").collect()
    assert(dataFiles().size == before,
      "a young unreferenced file must survive the default grace window")
    // explicit grace 0 on a quiesced table reclaims it
    spark.sql(s"CALL $cat.system.vacuum('lake.grace_t', 1, 0)").collect()
    assert(dataFiles().size < before,
      "grace 0 must reclaim the unreferenced file")
    assert(spark.sql(s"SELECT k FROM $cat.lake.grace_t").head.getLong(0) == 2L)
  }
}
