package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [engine-added] TRIANGLE enumeration by degree-ordered edge orientation
  * (Schank–Wagner / Suri–Vassilvitskii "MR node-iterator++") — the
  * canonical scalable graph-analytics kernel (clustering coefficients,
  * community density, spam/link-farm signals over similarity graphs).
  *
  * Why orientation is the whole trick: enumerating wedges from RAW
  * adjacency fans out quadratically in the hottest node's degree — one
  * celebrity node with degree 10⁶ mints 10¹² wedges and a dead executor.
  * Orienting every undirected edge from its (degree, id)-smaller endpoint
  * to its larger one makes each triangle countable at exactly ONE vertex
  * (the one whose two out-edges reach the other two), and bounds the
  * oriented out-degree by O(√m) REGARDLESS of the raw degree
  * distribution — the hub's million edges all point INTO it, its wedge
  * fan-out is 0. Total wedge work drops to O(m^1.5) worst-case, the best
  * known for exact counting, and the plan is three equality shuffles
  * (degree agg, wedge self-join, closure semi-join) — no cartesian
  * product, nothing broadcast, skew handled by construction rather than
  * salting.
  */
object Triangles {

  /** Canonical undirected edge set from a possibly-directed, possibly-dup
    * edge list: one row per unordered pair `{u,v}`, u < v, self-loops
    * dropped. One shuffle (the distinct). */
  def canonical(edges: DataFrame): DataFrame =
    edges
      .select(
        least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** Enumerate every triangle of the undirected graph exactly once as a
    * sorted node triple `(a, b, c)`, a < b < c. `edges(src, dst)` may be
    * directed/duplicated — canonicalized first. */
  def triangles(edges: DataFrame): DataFrame = {
    val canon = canonical(edges)
    // undirected degree: each canonical edge contributes to both endpoints
    val deg = canon.select(col("u").as("node"))
      .unionAll(canon.select(col("v").as("node")))
      .groupBy("node")
      .agg(count(lit(1)).as("deg"))
    // orient by (deg, node): strict total order, so every edge gets
    // exactly one direction and out-degree is O(sqrt m)-bounded
    val oriented = canon
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u"))
          .otherwise(col("v")).as("lo"),
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("v"))
          .otherwise(col("u")).as("hi"))
    // wedges at the orientation-lowest vertex of each candidate triangle;
    // the a < b canonical form lets the closure check hit `canon` directly
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.lo") === col("e2.lo") && col("e1.hi") < col("e2.hi"))
      .select(col("e1.lo").as("w"), col("e1.hi").as("a"), col("e2.hi").as("b"))
    wedges
      .join(canon, wedges("a") === canon("u") && wedges("b") === canon("v"), "left_semi")
      // w is orientation-smallest, not id-smallest — sort the triple so
      // each triangle emits one canonical row
      .select(array_sort(array(col("w"), col("a"), col("b"))).as("t"))
      .select(col("t").getItem(0).as("a"), col("t").getItem(1).as("b"), col("t").getItem(2).as("c"))
  }
}
