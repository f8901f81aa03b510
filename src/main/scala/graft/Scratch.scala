package graft
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8").config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- Seq("q18_status_cube", "q19_quantity_percentiles", "q20_order_linenumbers", "q21_stats_profile"))
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.01").coalesce(1)
        .write.mode("overwrite").parquet(s"/tmp/newq/$q")
    spark.stop()
  }
}
