package graft

import graft.operators.Dedup
import graft.operators.Similarity
import graft.queries.{Relational, TextQueries}
import graft.streaming.Events
import org.apache.spark.sql.functions._

/** Exactness/property specs for the round-2 operators (SURVEY.md §2
  * Q17–Q19, T7, X5–X7, D7, A4, E7–E9). Each is checked against either
  * a driver-side replay of the semantics or an internal invariant the
  * operator must satisfy; the DuckDB oracle gate covers value-level
  * equality separately.
  */
class Round2Spec extends SparkSpec {

  test("as-of join matches a driver-side replay (latest click <= purchase)") {
    val events = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val clicksByUser = events.filter(_._4 == "click").groupBy(_._1)
      .map { case (u, es) => u -> es.map(_._3).sorted }
    val expected = events.filter(_._4 == "purchase").map { case (u, eid, ts, _) =>
      val click = clicksByUser.get(u).flatMap { cs =>
        val at = cs.search(ts) match {
          case scala.collection.Searching.Found(i) => i
          case scala.collection.Searching.InsertionPoint(i) => i - 1
        }
        if (at >= 0) Some(cs(at)) else None
      }
      (u, eid, ts, click)
    }.toSet
    val got = Events.asofJoin(spark, sfDir).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]))
    }.toSet
    assert(got == expected)
  }

  test("cube totals: the (ALL, ALL) cell equals the ungrouped aggregate") {
    val cube = Relational.qCube(spark, sfDir).collect()
    val all = cube.find(r => r.getString(0) == "ALL" && r.getString(1) == "ALL").get
    val li = Tables.load(spark, sfDir, "lineitem")
    assert(all.getAs[Long]("n") == li.count())
    // per-flag marginals sum to the grand total
    val flagRows = cube.filter(r => r.getString(0) != "ALL" && r.getString(1) == "ALL")
    assert(flagRows.map(_.getAs[Long]("n")).sum == all.getAs[Long]("n"))
  }

  test("quantiles are monotone per group") {
    Relational.qQuantiles(spark, sfDir).collect().foreach { r =>
      val (p25, p50, p75, p95) = (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p25 <= p50 && p50 <= p75 && p75 <= p95, s"non-monotone: $r")
    }
  }

  test("range join partitions all orders exactly once") {
    val bands = Relational.qRangeJoin(spark, sfDir).collect()
    val total = Tables.load(spark, sfDir, "orders").count()
    assert(bands.map(_.getAs[Long]("n")).sum == total)
  }

  test("hash sampling is deterministic and near the nominal rate") {
    val a = Relational.tSampleHash(spark, sfDir).collect()
    val b = Relational.tSampleHash(spark, sfDir).collect()
    assert(a.toSeq == b.toSeq)
    val sampled = a.map(_.getAs[Long]("n_sampled")).sum.toDouble
    val total = Tables.load(spark, sfDir, "lineitem").count().toDouble
    val rate = sampled / total
    assert(rate > 0.02 && rate < 0.10, s"rate $rate out of band for nominal 1/20")
  }

  test("pii counts match a driver-side Java-regex replay") {
    val urlRe = "https?://[^\\s]+".r
    val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}".r
    val texts = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    TextQueries.textPiiRedact(spark, sfDir).collect().foreach { r =>
      val t = texts(r.getLong(0))
      val noUrl = urlRe.replaceAllIn(t, "<URL>")
      assert(r.getInt(1) == urlRe.findAllIn(t).size, s"urls differ for doc ${r.getLong(0)}")
      assert(r.getInt(2) == emailRe.findAllIn(noUrl).size, s"emails differ for doc ${r.getLong(0)}")
    }
  }

  test("repetition: gram counts consistent with quality token counts") {
    val nTok = TextQueries.textQuality(spark, sfDir).select("doc_id", "n_tokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    TextQueries.textRepetition(spark, sfDir).collect().foreach { r =>
      val expected2 = math.max(nTok(r.getLong(0)) - 1, 0L)
      assert(r.getInt(1).toLong == expected2, s"n_2grams mismatch: $r")
      assert(r.getDouble(2) >= 0 && r.getDouble(2) <= 1)
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
    }
  }

  test("tfidf: ranks are 1..k with strictly non-increasing scores per doc") {
    val rows = TextQueries.textTfidf(spark, sfDir).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      val scores = sorted.map(_.getLong(5))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
    }
  }

  test("paragraph dedup matches a driver-side sentence-hash replay") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
    val counts = scala.collection.mutable.Map[String, Int]()
    docs.foreach { r =>
      val text =
        if (r.getLong(0) % 7 == 0) r.getString(1) + Dedup.boilerplate else r.getString(1)
      text.split("\\.\\s+").filter(_.trim.nonEmpty).foreach { s =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s.trim.toLowerCase.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        counts(h) = counts.getOrElse(h, 0) + 1
      }
    }
    val expected = counts.count(_._2 > 1)
    // the injected boilerplate guarantees the gate is non-vacuous
    assert(expected > 0, "boilerplate injection produced no repeated sentences")
    assert(Dedup.paragraphDedup(spark, sfDir).count() == expected)
  }

  test("embedding norms: fixed dim and positive norms") {
    val rows = Similarity.embNorm(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val dims = rows.map(_.getInt(2)).distinct
    assert(dims.length == 1, s"mixed dims: ${dims.toSeq}")
    rows.foreach(r => assert(r.getDouble(3) > 0))
  }

  test("sliding windows: every event lands in exactly two windows") {
    val winN = Events.slidingWindow(spark, sfDir)
      .agg(sum("n")).head.getLong(0)
    val events = Tables.load(spark, sfDir, "events").count()
    assert(winN == 2 * events)
  }

  test("json extract: group counts cover all events, min <= max") {
    val rows = Events.jsonExtract(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == Tables.load(spark, sfDir, "events").count())
    rows.foreach { r =>
      assert(r.getAs[Long]("min_k") <= r.getAs[Long]("max_k"))
    }
  }

  test("dedup clusters match a driver-side union-find over the pair graph") {
    val pairs = Dedup.ngramJaccard(spark, sfDir).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val expected = nodes.groupBy(find).map { case (root, ms) => (root, ms.length.toLong) }
    val got = Dedup.dedupClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
  }

  test("binaryFile ingestion round-trips byte counts and checksums") {
    val expected = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") < 50).select("doc_id", "text").collect()
      .map { r =>
        val bytes = r.getString(1).getBytes("UTF-8")
        (r.getLong(0), (bytes.length.toLong, bytes.map(b => (b & 0xff).toLong).sum))
      }.toMap
    val got = operators.Multimodal.mmBinaryFiles(spark, sfDir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
  }

  test("stream-stream interval join matches the batch equivalent") {
    val events = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val clicksByUser = events.filter(_._4 == "click").groupBy(_._1)
    val expected = events.filter(_._4 == "purchase").flatMap { case (u, eid, ts, _) =>
      clicksByUser.getOrElse(u, Array.empty).collect {
        case (_, _, cts, _) if cts <= ts && cts >= ts - 1800000000L => (u, eid, ts, cts)
      }
    }.toSet
    val got = Events.streamStreamJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("chunking covers every token and consecutive chunks overlap by size-stride") {
    val chunkSize = 64; val stride = 48
    val docs = Tables.load(spark, sfDir, "documents").count()
    val chunks = TextQueries.textChunk(spark, sfDir, chunkSize, stride).collect()
    // exact replay: chunk i holds min(chunkSize, n_tokens - i*stride)
    // tokens, starts are consecutive multiples of stride inside the doc
    val docTokens = TextQueries.textTokens(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    chunks.groupBy(_.getLong(0)).foreach { case (docId, cs) =>
      val n = docTokens(docId)
      val byIdx = cs.sortBy(_.getLong(1))
      assert(byIdx.map(_.getLong(1)).toSeq == byIdx.indices.map(_.toLong))
      assert(byIdx.length == (n - 1) / stride + 1)
      byIdx.foreach { r =>
        val start = r.getLong(1) * stride
        assert(r.getLong(2) == math.min(chunkSize, n - start), s"doc $docId chunk $r")
      }
    }
    assert(chunks.map(_.getLong(0)).distinct.length.toLong == docs)
  }

  test("stratified sample is a deterministic subset with per-stratum rates") {
    val a = Relational.tStratifiedSample(spark, sfDir).collect()
    val b = Relational.tStratifiedSample(spark, sfDir).collect()
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
    val full = Tables.load(spark, sfDir, "orders")
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    a.foreach { r =>
      val (status, n) = (r.getString(0), r.getLong(1))
      val rate = n.toDouble / full(status)
      val expected = status match { case "F" => 0.10; case "O" => 0.05; case _ => 0.50 }
      assert(rate > expected / 3 && rate < expected * 3,
        s"$status rate $rate far from $expected")
    }
  }

  test("ntile deciles partition all customers with balanced sizes") {
    val rows = Relational.qNtile(spark, sfDir).collect()
    val nCustomers = Tables.load(spark, sfDir, "orders")
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == nCustomers)
    val sizes = rows.map(_.getAs[Long]("n_customers"))
    assert(sizes.max - sizes.min <= 1)
    // decile boundaries are monotone
    val byDecile = rows.sortBy(_.getInt(0))
    byDecile.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Double]("max_spend") <= hi.getAs[Double]("min_spend"))
    }
  }
}
