package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs: "common" appears everywhere (idf = ln(5/5) = 0);
  // "rare" only in doc 1; "pair" in docs 2 and 3.
  private def corpus = Seq(
    (1L, "common rare rare"),
    (2L, "common pair"),
    (3L, "common pair pair"),
    (4L, "common")
  ).toDF("doc_id", "text")

  test("a term present in every document scores exactly zero") {
    val out = TfIdf.topTerms(corpus, 10)
    val common = out.filter($"term" === "common").select("score").as[Double].collect()
    assert(common.nonEmpty && common.forall(_ == 0.0))
  }

  test("rarer terms outrank common ones; tf scales the score") {
    val out = TfIdf.topTerms(corpus, 1).orderBy("doc_id")
      .select("doc_id", "term").as[(Long, String)].collect()
    // docs 1-3: the non-universal term wins rank 1; doc 4 has only "common"
    assert(out.toSeq == Seq((1L, "rare"), (2L, "pair"), (3L, "pair"), (4L, "common")))
    val s2 = TfIdf.topTerms(corpus, 10).filter($"doc_id" === 3 && $"term" === "pair")
      .select("score").as[Double].head()
    val s1 = TfIdf.topTerms(corpus, 10).filter($"doc_id" === 2 && $"term" === "pair")
      .select("score").as[Double].head()
    assert(math.abs(s2 - 2 * s1) < 1e-3, s"tf=2 must double tf=1: $s2 vs $s1")
  }

  test("rnk is dense 1..k per doc, ties broken by term, k respected") {
    val out = TfIdf.topTerms(corpus, 2)
    val byDoc = out.collect().groupBy(_.getLong(0))
    byDoc.foreach { case (_, rows) =>
      val rnks = rows.map(_.getInt(4)).sorted.toSeq
      assert(rnks == (1 to rnks.size), s"dense ranks expected, got $rnks")
      assert(rnks.size <= 2)
    }
  }

  test("matches a from-first-principles local computation on the fixture") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").limit(200).cache()
    val out = TfIdf.topTerms(docs, 3)
    // local oracle
    val toks = docs.collect().map(r => r.getLong(0) ->
      r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq).toMap
    val withTokens = toks.filter(_._2.nonEmpty)
    val nDocs = withTokens.size.toDouble
    val dfMap = withTokens.values.flatMap(_.distinct).groupBy(identity).map { case (t, xs) => t -> xs.size }
    val expected = withTokens.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, xs) =>
        val raw = xs.size * math.log((nDocs + 1.0) / (dfMap(t) + 1.0))
        // mirror Spark's round(): BigDecimal HALF_UP on the f32-squeezed value
        val sq = BigDecimal(raw.toFloat.toDouble)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
        (id, t, sq)
      }
    }.groupBy(_._1).flatMap { case (_, rows) =>
      rows.toSeq.sortBy(r => (-r._3, r._2)).take(3)
    }.map(r => (r._1, r._2, r._3)).toSet
    val got = out.select("doc_id", "term", "score").as[(Long, String, Double)].collect().toSet
    assert(got == expected, s"diff: ${(got -- expected).take(5)} / ${(expected -- got).take(5)}")
  }
}
