package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [engine-added] Rerank-depth calibration probe for the quantized ANN
  * paths (PQ/ADC, IVFADC residual, IVF+binary): for each query it ranks
  * the WHOLE corpus by the quantized ordering, joins the exact top-10,
  * and reports the minimal candidate depth D at which recall@10 would
  * reach 0.8 / 0.9 / 1.0 — i.e. the depth the rerank stage actually
  * needs at THIS corpus density. Exists because fixed depths calibrated
  * at one corpus size fail at 10× (round-14 finding: ADC top-100 rerank
  * recall@10 dropped below the 0.8 bar when the embeddings table grew
  * 500→5000 random unit vectors — the k-th↔D-th true-neighbor gap
  * shrinks with n while quantization error stays constant), and the
  * density-aware defaults this tool calibrated need re-measuring
  * whenever the operating point changes. Usage:
  * `runMain graft.bench.DepthProbe <sfDir> [nQueries=20]`. */
object DepthProbe {

  /** Per-query minimal depth for recall targets, given the full
    * quantized ordering `ranked(query_id, vec_id, qrank)` and the exact
    * top-k `exact(query_id, vec_id)`. */
  private def depthFor(ranked: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    val hits = exact
      .select("query_id", "vec_id")
      .join(ranked, Seq("query_id", "vec_id"), "left")
    // a true neighbor missing from the quantized ordering (possible for
    // probed variants: its partition was never probed) = depth infinity
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy("qrank")
    hits
      .withColumn("qrank", coalesce(col("qrank"), lit(Long.MaxValue)))
      .withColumn("nth", row_number().over(w))
      .groupBy("query_id")
      .agg(
        max(when(col("nth") <= math.ceil(0.8 * k).toInt, col("qrank"))).as("d80"),
        max(when(col("nth") <= math.ceil(0.9 * k).toInt, col("qrank"))).as("d90"),
        max(col("qrank")).as("d100"))
  }

  private def summarize(name: String, d: DataFrame): Unit = {
    val row = d.agg(
      max("d80").as("max_d80"), expr("percentile(d80, 0.5)").as("p50_d80"),
      max("d90").as("max_d90"),
      max("d100").as("max_d100")).head()
    println(s"DEPTH $name max_d80=${row.get(0)} p50_d80=${row.get(1)} " +
      s"max_d90=${row.get(2)} max_d100=${row.get(3)}")
  }

  /** Mean recall@k over the query set as a function of candidate depth —
    * the quantity the registered bars actually bound. */
  private def meanCurve(name: String, ranked: DataFrame, exact: DataFrame,
      k: Int, nq: Int, depths: Seq[Int]): Unit = {
    val hits = exact
      .select("query_id", "vec_id")
      .join(ranked, Seq("query_id", "vec_id"), "left")
      .select(coalesce(col("qrank").cast("long"), lit(Long.MaxValue)).as("qrank"))
      .cache()
    val curve = depths.map { d =>
      val got = hits.filter(col("qrank") <= d).count()
      f"$d:${got.toDouble / (k.toLong * nq)}%.3f"
    }
    hits.unpersist()
    println(s"CURVE $name ${curve.mkString(" ")}")
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: DepthProbe <sfDir> [nQueries]")
    val dir = args(0)
    val nq = if (args.length > 1) args(1).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.rel.PipelineQueries.{indexFor, pqFor, pqResidualFor, residualCodesFor}
    import graft.vector.{BinaryQuant, Pq}
    import graft.Tables.t

    val emb = t(spark, dir, "embeddings").select("vec_id", "embedding")
    val n = emb.count()
    val k = 10
    val qs = emb.filter(col("vec_id") < nq)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val exact = graft.index.KnnJoin.exact(qs, emb, k).cache()
    println(s"DEPTH corpus n=$n queries=$nq")

    // raw-vector ADC (v12's ordering): rank the whole corpus
    val pq = pqFor(spark, dir)
    val codes = Pq.encode(emb, pq)
    val depths = Seq(100, 200, 400, 640, 1000, 1600, 2500, 4000, 6400, 10000, n.toInt)
      .filter(_ <= n).distinct
    val adcAll = Pq.adcTopK(codes, pq, qs, k = n.toInt)
      .select(col("query_id"), col("vec_id"), col("rank").as("qrank")).cache()
    summarize("pq_adc", depthFor(adcAll, exact, k))
    meanCurve("pq_adc", adcAll, exact, k, nq, depths)
    adcAll.unpersist()

    // residual IVFADC over APS probes (v13's ordering)
    val model = indexFor(spark, dir)
    val cents = model.partitions.map(p => p.pid -> p.centroid).toMap
    val probes = graft.index.IvfSearch
      .chooseProbes(model, qs, graft.index.IvfSearch.Params(k = k))
      .select("query_id", "partition_id")
    val resAll = Pq.ivfAdcResidualTopK(
      residualCodesFor(spark, dir), pqResidualFor(spark, dir), cents, probes, qs, k = n.toInt)
      .select(col("query_id"), col("vec_id"), col("rank").as("qrank")).cache()
    summarize("ivf_pq_residual", depthFor(resAll, exact, k))
    meanCurve("ivf_pq_residual", resAll, exact, k, nq, depths)
    resAll.unpersist()

    // IVF + binary Hamming (v23's ordering)
    val bq = BinaryQuant.encodeWithPartition(model.vectors, model.dim)
    val bqAll = BinaryQuant.ivfTopK(bq, probes, qs, model.dim, k = n.toInt, rerank = 1)
      .select(col("query_id"), col("vec_id"), col("rank").as("qrank")).cache()
    summarize("ivf_binary", depthFor(bqAll, exact, k))
    meanCurve("ivf_binary", bqAll, exact, k, nq, depths)
    bqAll.unpersist()

    spark.stop()
  }
}
