package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SparseSimSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "apple banana cherry apple durian elder fig grape"),
    (2L, "wolf bear lynx otter marten badger stoat weasel"),
    (3L, "apple wolf stone river cloud stone river cloud")).toDF("doc_id", "text")

  private def pairs(probes: Seq[(Long, String)], bar: Double = 0.1) =
    SparseSim.cosineAgainst(corpus, probes.toDF("probe_id", "text"), bar)
      .select("probe_id", "doc_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  test("an exact copy scores ~1.0 with its source and beats every other doc") {
    val p = pairs(Seq((-1L, "apple banana cherry apple durian elder fig grape")))
    assert(p((-1L, 1L)) > 0.9999)
    assert(p.filterNot(_._1._2 == 1L).values.forall(_ < 0.5))
  }

  test("tokens unseen in the corpus carry no weight (scores equal the stripped probe's)") {
    val withOov = pairs(Seq((-1L, "apple banana cherry zzz qqq xxx")))
    val without = pairs(Seq((-1L, "apple banana cherry")))
    assert(math.abs(withOov((-1L, 1L)) - without((-1L, 1L))) < 1e-12)
  }

  test("a fully out-of-vocabulary probe yields no pairs") {
    assert(pairs(Seq((-1L, "zzz qqq xxx www"))).isEmpty)
  }

  test("zero-norm sides are filtered, not NaN-passed: a corpus-universal-token doc never pairs") {
    // every doc contains 'the' → idf('the') applies everywhere; doc 4 is ONLY
    // universal tokens → norm² = 0 → unguarded cosine would be NaN (> any bar)
    val uni = Seq(
      (1L, "the alpha beta"),
      (2L, "the gamma delta"),
      (3L, "the epsilon zeta"),
      (4L, "the the the")).toDF("doc_id", "text")
    val p = SparseSim.cosineAgainst(uni, Seq((-1L, "the alpha")).toDF("probe_id", "text"), 0.01)
      .select("doc_id", "cosine").as[(Long, Double)].collect().toMap
    assert(!p.contains(4L), "zero-norm doc leaked through the cosine bar")
    assert(p.values.forall(v => !v.isNaN))
    // a probe of only universal tokens has zero norm itself → no pairs at all
    assert(SparseSim.cosineAgainst(uni, Seq((-2L, "the")).toDF("probe_id", "text"), 0.01).count() == 0)
  }

  test("disjoint-vocabulary docs never pair; shared rare tokens outweigh shared text length") {
    val p = pairs(Seq((-1L, "apple banana")))
    assert(!p.contains((-1L, 2L)))                  // no shared tokens at all
    assert(p((-1L, 1L)) > p.getOrElse((-1L, 3L), 0.0)) // doc 1 carries both tokens
  }
}
