package graft

import graft.functions.Aggregators.{CountMinSketch, GramMatrix, StringMode, TopKByScore, VectorSum}
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}

/** Property tests for the custom mergeable aggregates: the scale claims
  * ("only k rows per (src, partition) cross the shuffle", "one
  * double[dim] per (group, partition)") are only sound if reduce/merge
  * are insensitive to how Spark partitions the input and in which order
  * partial buffers combine. scalacheck drives random inputs, random
  * partitionings, and random merge orders; determinism here is what the
  * ScalaTest exactness specs and the DuckDB oracles stand on.
  */
object AggregatorLawsProps extends Properties("AggregatorLaws") {

  // rounded cosine-like scores, ±0.0 included deliberately: a -0.0 from
  // round(-1e-9, 4) must rank identically to 0.0 (SQL semantics)
  private val score: Gen[Double] = Gen.frequency(
    8 -> Gen.chooseNum(-1.0, 1.0).map(s => math.rint(s * 10000) / 10000.0),
    1 -> Gen.const(0.0),
    1 -> Gen.const(-0.0))
  private val entries: Gen[List[(Double, Long)]] =
    Gen.listOf(Gen.zip(score, Gen.chooseNum(0L, 50L)))

  private def chunks[A](xs: List[A], seed: Long): Seq[List[A]] = {
    val rnd = new scala.util.Random(seed)
    val shuffled = rnd.shuffle(xs)
    if (shuffled.isEmpty) Seq(Nil)
    else shuffled.grouped(math.max(1, shuffled.size / (1 + rnd.nextInt(4)) + 1)).toSeq
  }

  property("TopKByScore: result independent of partitioning and merge order") =
    forAll(entries, Gen.chooseNum(1, 5), Gen.long) { (xs, k, seed) =>
      val agg = TopKByScore(k)
      val direct = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      val partial = chunks(xs, seed).map(_.foldLeft(agg.zero)(agg.reduce))
      val rnd = new scala.util.Random(seed ^ 0x9e3779b9L)
      val merged = agg.finish(rnd.shuffle(partial).reduceLeft(agg.merge))
      merged == direct
    }

  property("TopKByScore: keeps at most k, sorted by (score desc, id asc)") =
    forAll(entries, Gen.chooseNum(1, 5)) { (xs, k) =>
      val agg = TopKByScore(k)
      val out = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      out.size <= k && out.sliding(2).forall {
        case Seq((s1, i1), (s2, i2)) => s1 > s2 || (s1 == s2 && i1 <= i2)
        case _                       => true
      }
    }

  property("StringMode: result independent of partitioning and merge order") =
    forAll(Gen.listOf(Gen.oneOf("a", "b", "c", "dd", "e")), Gen.long) { (xs, seed) =>
      val direct = StringMode.finish(xs.foldLeft(StringMode.zero)(StringMode.reduce))
      val partial = chunks(xs, seed).map(_.foldLeft(StringMode.zero)(StringMode.reduce))
      val rnd = new scala.util.Random(seed ^ 0x51ed2701L)
      val merged = StringMode.finish(rnd.shuffle(partial).reduceLeft(StringMode.merge))
      merged == direct
    }

  property("CountMinSketch: grid independent of partitioning and merge order") =
    forAll(
      Gen.listOf(Gen.listOfN(3, Gen.chooseNum(0, 15)).map(_.toSeq)),
      Gen.long) { (idxs, seed) =>
      val agg = CountMinSketch(3, 16)
      val direct = agg.finish(idxs.foldLeft(agg.zero)(agg.reduce))
      val partial = chunks(idxs, seed).map(_.foldLeft(agg.zero)(agg.reduce))
      val rnd = new scala.util.Random(seed ^ 0x7f4a7c15L)
      val merged = agg.finish(rnd.shuffle(partial).reduceLeft(agg.merge))
      // integer counters: exact equality, not tolerance
      merged == direct
    }

  property("CountMinSketch: every cell a key touches counts it (no undercount)") =
    forAll(Gen.nonEmptyListOf(Gen.listOfN(3, Gen.chooseNum(0, 15)).map(_.toSeq))) { idxs =>
      val agg = CountMinSketch(3, 16)
      val grid = agg.finish(idxs.foldLeft(agg.zero)(agg.reduce))
      idxs.groupBy(identity).forall { case (idx, occs) =>
        (0 until 3).forall(r => grid(r * 16 + idx(r)) >= occs.size)
      }
    }

  property("GramMatrix: count exact, moments within fp tolerance, empty vectors inert") =
    forAll(
      Gen.chooseNum(1, 5).flatMap(d =>
        Gen.listOf(Gen.frequency(
          8 -> Gen.listOfN(d, Gen.chooseNum(-5.0f, 5.0f)).map(_.toSeq),
          1 -> Gen.const(Seq.empty[Float])))),   // empty vectors must not skew n
      Gen.long) { (vecs, seed) =>
      val direct = GramMatrix.finish(vecs.foldLeft(GramMatrix.zero)(GramMatrix.reduce))
      val partial = chunks(vecs, seed).map(_.foldLeft(GramMatrix.zero)(GramMatrix.reduce))
      val rnd = new scala.util.Random(seed ^ 0x1b873593L)
      val merged = GramMatrix.finish(rnd.shuffle(partial).reduceLeft(GramMatrix.merge))
      merged._3 == direct._3 &&
        merged._3 == vecs.count(_.nonEmpty) &&
        merged._1.zip(direct._1).forall { case (a, b) => math.abs(a - b) < 1e-9 } &&
        merged._2.zip(direct._2).forall { case (a, b) => math.abs(a - b) < 1e-9 }
    }

  property("VectorSum: counts exact, sums within fp tolerance of direct") =
    forAll(
      Gen.chooseNum(1, 8).flatMap(d =>
        Gen.listOf(Gen.listOfN(d, Gen.chooseNum(-10.0f, 10.0f)).map(_.toSeq))),
      Gen.long) { (vecs, seed) =>
      val direct = VectorSum.finish(vecs.foldLeft(VectorSum.zero)(VectorSum.reduce))
      val partial = chunks(vecs, seed).map(_.foldLeft(VectorSum.zero)(VectorSum.reduce))
      val rnd = new scala.util.Random(seed ^ 0x2545f491L)
      val merged = VectorSum.finish(rnd.shuffle(partial).reduceLeft(VectorSum.merge))
      merged._2 == direct._2 &&
        merged._1.zip(direct._1).forall { case (a, b) => math.abs(a - b) < 1e-9 }
    }
}
