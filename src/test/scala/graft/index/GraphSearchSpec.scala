package graft.index

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select("vec_id", "embedding").cache()

  private lazy val graph = KnnJoin.knnGraph(emb, k = 4).cache()

  private def queries(n: Int) = emb
    .filter(col("vec_id") < n)
    .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

  test("beam search finds high-recall top-k vs brute force, from a single fixed entry") {
    val q = queries(20)
    val got = GraphSearch.search(q, graph, emb, entries = Seq(0L), k = 5, beam = 16, rounds = 8)
    val exact = KnnJoin.exact(q, emb, k = 5)
      .select(col("query_id"), col("vec_id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val mine = got.select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (qid, want) =>
      (mine.getOrElse(qid, Set.empty) & want).size.toDouble / want.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"beam-search mean recall@5 $mean below bar")
  }

  test("contract shape: exactly k ranked rows per query, no duplicates, rank follows distance") {
    val got = GraphSearch.search(queries(10), graph, emb, entries = Seq(0L), k = 5, beam = 12, rounds = 6)
      .cache()
    val per = got.groupBy("query_id").agg(
      count(lit(1)).as("n"),
      countDistinct("vec_id").as("nd"),
      max("rnk").as("mr"))
    assert(per.filter(col("n") =!= 5 || col("nd") =!= 5 || col("mr") =!= 5).isEmpty)
    // rank order follows dist2 within each query
    val bad = got.as("a")
      .join(got.as("b"),
        col("a.query_id") === col("b.query_id") && col("a.rnk") < col("b.rnk") &&
          col("a.dist2") > col("b.dist2"))
    assert(bad.isEmpty, "rank order violates distance order")
    got.unpersist()
  }

  test("more hops never hurt: summed top-k distance is monotonically non-increasing in rounds") {
    val q = queries(10)
    val cost = Seq(1, 3, 6).map { r =>
      r -> GraphSearch.search(q, graph, emb, entries = Seq(0L), k = 5, beam = 12, rounds = r)
        .agg(sum("dist2")).head().getDouble(0)
    }
    cost.sliding(2).foreach { case Seq((r1, c1), (r2, c2)) =>
      assert(c2 <= c1 + 1e-9, s"beam cost rose from rounds=$r1 ($c1) to rounds=$r2 ($c2)")
    }
  }

  test("multiple entries: unknown entry ids are ignored; seeding more entries keeps the bar") {
    val q = queries(10)
    // an entry id outside the corpus drops out at the scoring join —
    // the walk proceeds from the surviving seed exactly as single-entry
    val withGhost =
      GraphSearch.search(q, graph, emb, entries = Seq(0L, 999999999L), k = 5, beam = 12, rounds = 6)
        .select("query_id", "vec_id", "rnk").as[(Long, Long, Int)].collect().toSet
    val single =
      GraphSearch.search(q, graph, emb, entries = Seq(0L), k = 5, beam = 12, rounds = 6)
        .select("query_id", "vec_id", "rnk").as[(Long, Long, Int)].collect().toSet
    assert(withGhost == single)
    // spread seeds hold the same contract shape and the recall bar
    val multi = GraphSearch.search(q, graph, emb,
      entries = Seq(0L, 100L, 200L, 300L), k = 5, beam = 12, rounds = 6).cache()
    val per = multi.groupBy("query_id").agg(
      count(lit(1)).as("n"), countDistinct("vec_id").as("nd"))
    assert(per.filter(col("n") =!= 5 || col("nd") =!= 5).isEmpty)
    val exact = KnnJoin.exact(q, emb, k = 5)
      .select(col("query_id"), col("vec_id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val mine = multi.select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val mean = exact.map { case (qid, want) =>
      (mine.getOrElse(qid, Set.empty) & want).size.toDouble / want.size
    }.sum / exact.size
    multi.unpersist()
    assert(mean >= 0.9, s"multi-entry mean recall@5 $mean below bar")
  }

  test("per-query seeds (searchFrom): a walk seeded inside its own neighborhood converges fast") {
    val q = queries(10)
    // the queries are corpus members — seeding each walk at its own id
    // is the idealized router (distance-0 seed); a few hops must then
    // recover the true top-k almost exactly
    val seeds = q.select(col("query_id"), col("query_id").as("vec_id"))
    val got = GraphSearch.searchFrom(q, graph, emb, seeds, k = 5, beam = 12, rounds = 4)
    val exact = KnnJoin.exact(q, emb, k = 5)
      .select(col("query_id"), col("vec_id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val mine = got.select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val mean = exact.map { case (qid, want) =>
      (mine.getOrElse(qid, Set.empty) & want).size.toDouble / want.size
    }.sum / exact.size
    assert(mean >= 0.9, s"self-seeded mean recall@5 $mean below bar")
  }

  test("no cartesian product; the query table is the only broadcast") {
    val plan = GraphSearch.search(queries(5), graph, emb, entries = Seq(0L), k = 3, beam = 8, rounds = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"beam search degenerated:\n$plan")
  }
}
