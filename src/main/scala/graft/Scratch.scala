package graft

import org.apache.spark.sql.SparkSession

/** Throwaway timing probe (deleted after use). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    Seq("documents").foreach(t => Tables.t(spark, dir, t).limit(1).collect())
    val names = args.toSeq
    (1 to 3).foreach { pass =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).write.mode("overwrite").format("noop").save()
        CacheScope.clear()
        println(f"PASS$pass $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
