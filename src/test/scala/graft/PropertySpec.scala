package graft

import graft.index.IvfMaintain
import graft.vector.{KMeans, TopKAgg, TopKBuf}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks over the driver-side algorithmic cores
  * (SURVEY.md §5.4) — pure JVM, no Spark session needed. ScalaCheck is
  * driven directly (no scalatestplus bridge in the offline dep set). */
class PropertySpec extends AnyFunSuite {
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val vecGen: Gen[Array[Float]] =
    Gen.containerOfN[Array, Float](8, Gen.chooseNum(-100f, 100f))

  test("splitThreshold is always clamped to [splitSize/1.5, splitSize*2] (O13, quake_min.py:174-175)") {
    check(Prop.forAll(Gen.chooseNum(-100000L, 100000L), Gen.chooseNum(-100000L, 100000L)) {
      (hits, lastSplit) =>
        val t = IvfMaintain.splitThreshold(hits, lastSplit, 2000.0, 3000L)
        t >= 3000.0 / 1.5 - 1e-9 && t <= 6000.0 + 1e-9
    })
  }

  test("KMeans.nearest returns the first index of minimum distance (argmin semantics)") {
    val centsGen = Gen.nonEmptyListOf(vecGen).map(_.toArray)
    check(Prop.forAll(centsGen, vecGen) { (cents, v) =>
      val dists = cents.map { c =>
        c.zip(v).map { case (a, b) => (a.toDouble - b.toDouble) * (a.toDouble - b.toDouble) }.sum
      }
      val expected = dists.indexOf(dists.min)
      KMeans.nearest(cents, v.toSeq) == expected
    })
  }

  test("TopKAgg equals global sort-take-k under ANY partitioning of the input") {
    val rowGen = Gen.zip(Gen.chooseNum(0.0, 1000.0), Gen.chooseNum(0L, 50L))
    val rowsGen = Gen.listOf(rowGen)
    val kGen = Gen.chooseNum(1, 8)
    check(Prop.forAll(rowsGen, kGen, Gen.chooseNum(1, 5)) { (rows, k, nSplits) =>
      val agg = new TopKAgg(k)
      // feed through arbitrary partition splits, then merge
      val chunks = if (rows.isEmpty) Seq(rows) else rows.grouped(math.max(1, rows.length / nSplits)).toSeq
      val merged = chunks
        .map(ch => ch.foldLeft(agg.zero)((b, r) => agg.reduce(b, (0L, r._1, r._2))))
        .foldLeft(agg.zero)(agg.merge)
      val got = agg.finish(merged)
      val expected = rows.map(r => (r._1, r._2)).sorted.take(k)
      got == expected
    })
  }

  test("hashChain is deterministic") {
    check(Prop.forAll(Gen.long, Gen.long, Gen.long) { (seed, g, id) =>
      KMeans.hashChain(seed, g, id) == KMeans.hashChain(seed, g, id)
    })
  }

  test("Zipf sampler stays in range, is deterministic per seed, and is rank-skewed") {
    val z1 = new graft.bench.Replay.Zipf(16, 1.1, seed = 7L)
    val z2 = new graft.bench.Replay.Zipf(16, 1.1, seed = 7L)
    val draws1 = Array.fill(2000)(z1.next())
    val draws2 = Array.fill(2000)(z2.next())
    assert(draws1.toSeq == draws2.toSeq)
    assert(draws1.forall(r => r >= 0 && r < 16))
    val counts = draws1.groupBy(identity).view.mapValues(_.length).toMap
    assert(counts.getOrElse(0, 0) > counts.getOrElse(15, 0), "rank 0 must be hotter than rank 15")
  }

  test("TopKBuf trim keeps exactly the k smallest with (value, id) tie-breaks") {
    val agg = new TopKAgg(3)
    val b = Seq((1.0, 5L), (1.0, 2L), (0.5, 9L), (2.0, 1L), (1.0, 1L))
      .foldLeft(agg.zero)((acc, r) => agg.reduce(acc, (0L, r._1, r._2)))
    assert(agg.finish(b) == Seq((0.5, 9L), (1.0, 1L), (1.0, 2L)))
  }
}
