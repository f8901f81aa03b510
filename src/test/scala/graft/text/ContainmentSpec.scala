package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  test("containmentPairs: full prefix scores 1.0 against its source; partial overlap scores |shared|/|probe|; bar filters") {
    val corpus = Seq(
      (1L, "a b c d e f g h i j k l"),
      (2L, "z y x w v u t")).toDF("doc_id", "text")
    val probes = Seq(
      (10L, "a b c d e"),          // prefix of doc 1 → containment 1.0
      (11L, "a b c q r s t u")     // shares only 'a b c' → 1/6
    ).toDF("doc_id", "text")

    val loose = Dedup.containmentPairs(corpus, probes, shingleN = 3, minContainment = 0.1)
      .select("probe_id", "doc_id", "n_shared", "containment")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(loose((10L, 1L)) == ((3L, 1.0)))               // all 3 probe shingles in doc 1
    assert(loose((11L, 1L)) == ((1L, 1.0 / 6.0)))          // exactly 'a b c'
    assert(!loose.contains((10L, 2L)) && !loose.contains((11L, 2L)))

    // the 0.5 bar drops the partial pair, keeps the full-prefix one
    val strict = Dedup.containmentPairs(corpus, probes, shingleN = 3, minContainment = 0.5)
      .select("probe_id", "doc_id").as[(Long, Long)].collect().toSet
    assert(strict == Set((10L, 1L)))
  }

  test("containmentPairs is asymmetric: the long doc as probe against the short source scores low") {
    val corpus = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val probes = Seq((10L, "a b c d e f g h i j k l")).toDF("doc_id", "text")
    // probe has 10 shingles, only 3 occur in the short corpus doc
    val res = Dedup.containmentPairs(corpus, probes, shingleN = 3, minContainment = 0.1)
      .select("containment").as[Double].head()
    assert(math.abs(res - 0.3) < 1e-12)
  }
}
