package graft.bench

import org.apache.spark.sql.SparkSession

/** [engine-added] Full-corpus scale-up generator: writes a K×
  * sf-equivalent replica of EVERY fixture table (not just the probe
  * pair), so the whole 160+-query roster — and its DuckDB oracle — can
  * run at a measured point above sf0.1 (K = 10 over sf0.1 ≈ sf1.0).
  *
  * Table rules, all referential-integrity-preserving:
  *  - `documents` / `embeddings`: the ScaleProbe natural-crawl transforms
  *    (replica-tagged tokens, norm-preserving rotated vectors) — replicas
  *    are NEW content, not exact twins, so dedup/ANN workloads keep their
  *    per-unit near-dup density instead of gaining K−1 planted clones;
  *  - `customer`/`supplier`/`events`/`part`/`orders`/`lineitem`: replicas
  *    with every key (both FK sides) shifted by `j·10⁷` — replica j's
  *    orders point at replica j's customers, lineitems at replica j's
  *    orders/parts/suppliers;
  *  - `region`/`nation`: fixed dimension tables, copied as-is (replicating
  *    them would mint nonexistent nations and break FK joins).
  *
  * Fixed-frontier queries (id-capped samples, p16's 100-node graph,
  * q46's 10-root forest) keep byte-identical answers while their scans
  * grow K× — exactly the bounded-work property the run certifies; uncapped
  * queries grow their whole pipeline. Usage:
  * `runMain graft.bench.ScaleUp <sfDir> <k> <outBase>` then point Verify /
  * selfcheck / Bench at `<outBase>/x<k>`.
  */
object ScaleUp {

  def build(spark: SparkSession, sfDir: String, k: Int, outBase: String): String = {
    // documents + embeddings + customer + supplier + events
    val out = ScaleProbe.buildDir(spark, sfDir, k, outBase)
    Seq("region", "nation").foreach { tb =>
      graft.Tables.t(spark, sfDir, tb).write.mode("overwrite").parquet(s"$out/$tb.parquet")
    }
    ScaleProbe.shiftedTable(spark, sfDir, "part", Seq("p_partkey"), k)
      .write.mode("overwrite").parquet(s"$out/part.parquet")
    ScaleProbe.shiftedTable(spark, sfDir, "orders", Seq("o_orderkey", "o_custkey"), k)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    ScaleProbe.shiftedTable(spark, sfDir, "lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"), k)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    out
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <sfDir> <k> <outBase>")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = build(spark, args(0), args(1).toInt, args(2))
    println(s"SCALEUP wrote $out")
    spark.stop()
  }
}
