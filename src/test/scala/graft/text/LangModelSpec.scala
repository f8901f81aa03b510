package graft.text

import graft.SparkSpec

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  /** The emitted-score projection: float32 squeeze then HALF_UP round(4),
    * matching Spark's `round` semantics. */
  private def f32r4(d: Double): Double =
    BigDecimal(d.toFloat.toDouble).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def nllMap(docs: Seq[(Long, String)]): Map[Long, (Long, Double)] =
    LangModel
      .bigramNll(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

  test("hand-computed value on a two-doc corpus") {
    // corpus: "a b a b" and "a b"  → bigrams: (a,b)x3, (b,a)x1
    // c12(a,b)=3 c12(b,a)=1; c1(a)=3 c1(b)=1; V=2
    val out = nllMap(Seq(1L -> "a b a b", 2L -> "a b"))
    val pAB = math.log(4.0 / 5.0) // (3+1)/(3+2)
    val pBA = math.log(2.0 / 3.0) // (1+1)/(1+2)
    val d1 = -(2 * pAB + pBA) / 3.0
    val d2 = -pAB
    assert(out(1L)._1 == 3L && out(2L)._1 == 1L)
    assert(math.abs(out(1L)._2 - f32r4(d1)) < 1e-9)
    assert(math.abs(out(2L)._2 - f32r4(d2)) < 1e-9)
  }

  test("0/1-token documents are absent but still widen the vocabulary") {
    // doc 3 contributes token "z" to V (so c1(a)+V = 3+3) but emits no row
    val out = nllMap(Seq(1L -> "a b a b", 2L -> "a b", 3L -> "z"))
    assert(!out.contains(3L))
    val pAB = math.log(4.0 / 6.0)
    val d2 = -pAB
    assert(math.abs(out(2L)._2 - f32r4(d2)) < 1e-9)
  }

  test("a repetitive document scores lower NLL than a corpus outlier") {
    val docs = (1L to 20L).map(i => i -> "the cat sat on the mat") :+
      (99L -> "zyx wvu tsr qpo nml kji")
    val out = nllMap(docs)
    assert(out(1L)._2 < out(99L)._2,
      s"fluent doc ${out(1L)._2} must beat outlier ${out(99L)._2}")
  }

  test("pmi collocations: hand-computed scores and ranking") {
    // bigrams: (a,b)x3, (b,a)x1 → T=4; c1(a)=3,c1(b)=1; c2(b)=3,c2(a)=1
    // PMI(a,b)=ln(4/3) ≈ 0.2877, PMI(b,a)=ln(4) ≈ 1.3863 → (b,a) first
    val out = LangModel
      .pmiCollocations(Seq(1L -> "a b a b", 2L -> "a b").toDF("doc_id", "text"),
        minCount = 1L, topK = 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.length == 2)
    assert(out(0) == (("b", "a", 1L, f32r4(math.log(4.0)))))
    assert(out(1) == (("a", "b", 3L, f32r4(math.log(4.0 / 3.0)))))
  }

  test("pmi minCount floor drops rare pairs") {
    val out = LangModel
      .pmiCollocations(Seq(1L -> "a b a b", 2L -> "a b").toDF("doc_id", "text"),
        minCount = 2L, topK = 10)
      .collect()
    assert(out.length == 1 && out(0).getString(0) == "a")
  }

  test("scores are invariant to input partitioning") {
    val docs = (1L to 30L).map(i => i -> s"w${i % 5} w${(i + 1) % 5} w${(i + 2) % 7} w${i % 3}")
    val a = LangModel.bigramNll(docs.toDF("doc_id", "text").repartition(1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    graft.CacheScope.clear()
    val b = LangModel.bigramNll(docs.toDF("doc_id", "text").repartition(7))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(a.sameElements(b))
    graft.CacheScope.clear()
  }
}
