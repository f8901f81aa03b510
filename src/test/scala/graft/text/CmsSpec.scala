package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CmsSpec extends SparkSpec {
  import spark.implicits._

  // vocab (503 tokens) deliberately > width (64) so collisions are forced;
  // zipf-ish skew via the quadratic index map
  private def toks = spark.range(4000)
    .select(concat(lit("tok"), (col("id") * col("id") % 503).cast("string")).as("tok"))

  private val D = 4
  private val W = 64

  test("CMS never undercounts — est ≥ exact for EVERY token, under forced collisions") {
    val sk = Cms.sketch(toks, "tok", D, W)
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact_n"))
    val est = Cms.estimate(exact, "tok", sk, D, W)
    val bad = est.filter(col("est_n") < col("exact_n")).count()
    assert(bad == 0, s"$bad tokens undercounted — CMS must only ever overcount")
    // and collisions actually happened, or the test proves nothing
    val over = est.filter(col("est_n") > col("exact_n")).count()
    assert(over > 0, "no collisions at vocab 503 / width 64 — widen the vocab")
  }

  test("total mass conservation: every sketch row sums to the token-occurrence count") {
    val n = toks.count()
    val rows = Cms.sketch(toks, "tok", D, W)
      .groupBy("row_j").agg(sum("cnt").as("mass")).collect()
    assert(rows.length == D)
    rows.foreach(r => assert(r.getAs[Long]("mass") == n,
      s"row ${r.getAs[Int]("row_j")} mass ${r.getAs[Long]("mass")} != $n"))
  }

  test("sketches merge by adding cells: sketch(A ∪ B) = sketch(A) ⊕ sketch(B)") {
    val a = toks.filter(col("tok").substr(4, 1) < "5")
    val b = toks.exceptAll(a)
    val merged = Cms.sketch(a, "tok", D, W).unionByName(Cms.sketch(b, "tok", D, W))
      .groupBy("row_j", "cell").agg(sum("cnt").as("cnt"))
    val whole = Cms.sketch(toks, "tok", D, W)
    assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty,
      "cell-wise sum of part sketches must equal the whole-corpus sketch")
  }

  test("estimate error respects the ε·N bound at the fixture's scale") {
    // w=64 → ε = e/64 ≈ 0.0425; N = 4000 → bound ≈ 170 per row, and the
    // min over d=4 rows should do far better on a zipf-ish stream
    val sk = Cms.sketch(toks, "tok", D, W)
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact_n"))
    val worst = Cms.estimate(exact, "tok", sk, D, W)
      .select(max(col("est_n") - col("exact_n"))).as[Long].head()
    val bound = math.ceil(math.E / W * 4000).toLong
    assert(worst <= bound, s"worst overcount $worst exceeds ε·N = $bound")
  }
}
