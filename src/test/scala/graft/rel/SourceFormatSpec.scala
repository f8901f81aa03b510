package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Source/sink coverage beyond Parquet (SURVEY.md §2.B scans/sources row):
  * CSV and JSON round-trips over a fixture-derived table, schema preserved
  * well enough to re-run an aggregation identically. */
class SourceFormatSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "lang", "source", "n_chars")

  private def langCounts(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
    df.groupBy("lang").agg(count(lit(1)).as("n")).orderBy("lang").as[(String, Long)].collect().toSeq

  test("ORC sink + scan round-trips rows and aggregates, with pushdown") {
    val dir = java.nio.file.Files.createTempDirectory("orc").toString
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() == docs.count())
    assert(langCounts(back) == langCounts(docs))
    // ORC scans take predicate pushdown just like parquet
    val plan = back.filter(col("n_chars") > 100).select("doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("n_chars"), s"no ORC pushdown:\n$plan")
  }

  test("JSON sink + scan round-trips rows and aggregates") {
    val dir = java.nio.file.Files.createTempDirectory("json").toString
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == docs.count())
    assert(langCounts(back.select(col("doc_id"), col("lang"), col("source"), col("n_chars"))) == langCounts(docs))
  }

  test("CSV sink + scan (header + explicit schema) round-trips rows and aggregates") {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString
    docs.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(docs.schema).csv(dir)
    assert(back.count() == docs.count())
    assert(langCounts(back) == langCounts(docs))
  }

  test("CSV + JSON round-trips preserve microsecond timestamps under an explicit timestampFormat") {
    // the default millisecond timestampFormat would silently truncate the
    // fixture's microsecond event times — this pins the format q29 relies on
    val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    // Tables.t, not a raw parquet read: the fixture's ts is TIMESTAMP(NANOS),
    // which the vectorized reader refuses — t() reads nanos-as-long and
    // rebuilds a microsecond timestamp (the same shape q29 round-trips)
    val ev = graft.Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "ts", "props")
    def sig(df: org.apache.spark.sql.DataFrame): Seq[Any] =
      df.agg(
        sum(pmod(unix_micros(col("ts")), lit(86400000000L))),
        sum(length(col("props")).cast("long")),
        count(lit(1))).head.toSeq
    val dir = java.nio.file.Files.createTempDirectory("srcrt").toString
    ev.write.option("header", "true").option("timestampFormat", tsFmt).csv(s"$dir/csv")
    ev.write.option("timestampFormat", tsFmt).json(s"$dir/json")
    val csv = spark.read.schema(ev.schema).option("header", "true").option("timestampFormat", tsFmt).csv(s"$dir/csv")
    val json = spark.read.schema(ev.schema).option("timestampFormat", tsFmt).json(s"$dir/json")
    assert(sig(csv) == sig(ev))
    assert(sig(json) == sig(ev))
  }

  test("bucketed tables co-locate the join: no Exchange on either side") {
    // the 100 TB claim behind "bucketing for co-located joins": two fact
    // tables bucketed by the join key join WITHOUT shuffling — the scan
    // output already satisfies the join's required distribution
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
    ord.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    // disable broadcast so the planner is IN the shuffle-join regime the
    // fixture's tiny tables would otherwise skip — that regime is where
    // bucketing must eliminate the exchanges
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
