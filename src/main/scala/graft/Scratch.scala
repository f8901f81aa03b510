package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

object Scratch {
  def main(args: Array[String]): Unit = {
    val names = Seq("t08_bm25_rank", "t09_cms_heavy_hitters", "p07_scd2_versions", "q32_zorder_stats")
    val sfDir = "/root/testdata/sf0.01"
    val outDir = "/tmp/verify_new"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      CacheScope.clear()
      println(f"[scratch] $name done in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
