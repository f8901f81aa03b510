package graft.bench

import org.apache.spark.sql.SparkSession

/** [engine-added] Standalone scale-probe runner: N back-to-back
  * [[ScaleProbe]] runs in one JVM, one JSON line each — the direct check
  * that the published exponents are REPRODUCIBLE (the round-13 finding:
  * single-pass exponents swapped 0.14↔1.1 between identical-binary runs;
  * the min-of-2 alternating-order discipline is certified by exactly this
  * tool showing run-to-run agreement). Bench embeds the same probe in the
  * official record; this main exists so stability can be measured without
  * paying for the full suite.
  *
  * Cold-build rows (v31/v45) spawn a fresh child JVM PER REP by default
  * — deliberate, not redundant: each rep then measures exactly the
  * regime the official record publishes (ScaleProbe's `fresh_jvm`
  * mode), where in-JVM timing would re-introduce the accumulated-state
  * drift for reps ≥ 2. The price is one JVM+session spin-up per rep;
  * set `SPARK_GRAFT_COLD_PROBE_JVM=0` to time them in THIS JVM instead
  * (cheaper, and the record stamps `cold_build_mode: in_bench`). Usage:
  * `runMain graft.bench.ProbeMain <sfDir> [k=10] [reps=2] [onlyCsv]` —
  * the optional comma-separated query list restricts the roster (the
  * single-outlier re-adjudication discipline: two quiet points for one
  * query must not cost a full-roster probe). */
object ProbeMain {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProbeMain <sfDir> [k] [reps] [onlyCsv]")
    val sfDir = args(0)
    val k = if (args.length > 1) args(1).toInt else 10
    val reps = if (args.length > 2) args(2).toInt else 2
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).filter(_.nonEmpty).toSet)
      else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to reps).foreach { rep =>
      val r = ScaleProbe.run(spark, sfDir, k, only)
      println(s"""PROBE_REP {"rep":$rep,"probe":${ScaleProbe.toJson(k, r)}}""")
    }
    spark.stop()
  }
}
