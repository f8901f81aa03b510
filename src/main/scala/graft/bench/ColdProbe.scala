package graft.bench

import org.apache.spark.sql.SparkSession

/** [engine-added] Child-JVM runner for the scale probe's COLD-BUILD
  * queries ([[ScaleProbe.ColdBuildQueries]] — v31/v45 build their k-NN
  * graph in-query, so their probe timing IS a cold Ω(n) build): spawned
  * by [[ScaleProbe.run]] against the parent's already-built probe dirs,
  * it reproduces ProbeMain's fresh-JVM measurement regime inside the
  * official record — end-of-suite JVM state made the same binary read
  * exp 1.6 on one box and 1.08 on another while fresh-JVM reps held
  * 1.004–1.080 (VERDICT r16 #1). One JSON line on stdout, prefixed
  * `COLD_PROBE `, parsed by the parent. Usage (normally only via the
  * parent): `ColdProbe <d1> <dK> <k>`. */
object ColdProbe {

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ColdProbe <dir1x> <dirKx> <k> [rosterCsv]")
    val d1 = args(0)
    val dK = args(1)
    val k = args(2).toInt
    // the parent's roster restriction must reach the child: re-building
    // and timing BOTH cold queries to throw one away defeats the
    // single-query re-adjudication the restriction exists for
    val roster: Seq[String] =
      if (args.length > 3 && args(3).nonEmpty) args(3).split(",").toSeq.filter(_.nonEmpty)
      else ScaleProbe.ColdBuildQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = ScaleProbe.coldPoints(spark, d1, dK, k, roster)
    println(s"COLD_PROBE ${ScaleProbe.toJson(k, r)}")
    spark.stop()
  }
}
