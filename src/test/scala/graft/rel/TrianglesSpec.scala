package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def tris(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] =
    Triangles.triangles(edges.toDF("src", "dst"))
      .as[(Long, Long, Long)].collect().toSet

  test("hand-checked graphs: K4 has 4 triangles, a 4-ring none, a wheel spokes them back in") {
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    assert(tris(k4) == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(tris(ring) == Set.empty)
    // wheel: ring + hub 9 -> each ring edge closes exactly one triangle
    val wheel = ring ++ (1L to 4L).map(n => (9L, n))
    assert(tris(wheel) == Set((1L, 2L, 9L), (2L, 3L, 9L), (3L, 4L, 9L), (1L, 4L, 9L)))
  }

  test("each triangle emits exactly once, regardless of edge direction, duplication, or self-loops") {
    val messy = Seq(
      (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L),
      (1L, 1L), (2L, 2L), (1L, 2L), (3L, 1L))
    val df = Triangles.triangles(messy.toDF("src", "dst"))
    assert(df.as[(Long, Long, Long)].collect().toSeq == Seq((1L, 2L, 3L)))
  }

  test("hub skew: a degree-n star node produces zero wedge fan-out (all edges point into it)") {
    // star K_{1,50} plus one closing chord -> exactly one triangle; the
    // naive wedge count at the hub would be C(50,2) = 1225, the oriented
    // plan's wedge total stays <= a handful
    val star = (1L to 50L).map(n => (100L, n)) :+ (1L, 2L)
    assert(tris(star) == Set((1L, 2L, 100L)))
    val canon = Triangles.canonical(star.toDF("src", "dst"))
    val deg = canon.select(col("u").as("node"))
      .unionAll(canon.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val oriented = canon
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u"))
          .otherwise(col("v")).as("lo"))
    // the hub (node 100, degree 50) must never be a wedge apex
    assert(oriented.filter(col("lo") === 100L).count() == 0L,
      "degree-ordering failed: the hub kept out-edges")
  }

  test("no cartesian product in the physical plan") {
    val edges = (1L to 30L).flatMap(n => Seq((n, n % 30 + 1), (n, (n + 1) % 30 + 1))).toDF("src", "dst")
    val plan = Triangles.triangles(edges).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"triangle plan degenerated:\n$plan")
  }
}
