package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")

  // key 1: A → A → B → A  (3 versions; the repeat must NOT open one)
  // key 2: single row      (1 open version)
  // key 3: same-ts tie broken by the tie column (B wins the later slot)
  private def events = Seq(
    (1L, ts(1), 10L, "A"), (1L, ts(2), 11L, "A"), (1L, ts(3), 12L, "B"), (1L, ts(4), 13L, "A"),
    (2L, ts(5), 20L, "X"),
    (3L, ts(6), 30L, "A"), (3L, ts(6), 31L, "B")
  ).toDF("k", "t", "tie", "attr")

  private def history = Scd.scd2(events, "k", "t", "tie", "attr")

  test("versions capture changes only, in order, 1-based") {
    val h = history.orderBy("k", "version")
      .select("k", "version", "attr").as[(Long, Int, String)].collect()
    assert(h.toSeq == Seq((1L, 1, "A"), (1L, 2, "B"), (1L, 3, "A"), (2L, 1, "X"), (3L, 1, "A"), (3L, 2, "B")))
  }

  test("validity windows tile the timeline: valid_to(k) = valid_from(k+1), last is open") {
    val rows = history.orderBy("k", "version")
      .select("k", "valid_from", "valid_to").collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      rs.sliding(2).foreach {
        case Array(prev, next) =>
          assert(prev.getTimestamp(2) == next.getTimestamp(1), s"windows must tile: $prev → $next")
        case _ =>
      }
      assert(rs.last.isNullAt(2) && !rs.init.exists(_.isNullAt(2)),
        "exactly the final version is open-ended")
    }
  }

  test("is_current reconstruction equals the direct latest-attribute-per-key") {
    val current = history.filter(col("is_current")).select("k", "attr")
    val direct = events
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("k").orderBy(col("t").desc, col("tie").desc)))
      .filter(col("rn") === 1).select("k", "attr")
    assert(current.exceptAll(direct).isEmpty && direct.exceptAll(current).isEmpty)
  }

  test("NULL attributes: first row opens v1 even when NULL; NULL→NULL is not a change") {
    // key 4: NULL → NULL → A → NULL  (3 versions: NULL, A, NULL)
    // key 5: single NULL row         (1 open version)
    val ev = Seq[(Long, Timestamp, Long, Option[String])](
      (4L, ts(1), 40L, None), (4L, ts(2), 41L, None), (4L, ts(3), 42L, Some("A")), (4L, ts(4), 43L, None),
      (5L, ts(5), 50L, None)
    ).toDF("k", "t", "tie", "attr")
    val h = Scd.scd2(ev, "k", "t", "tie", "attr").orderBy("k", "version")
      .select("k", "version", "attr").as[(Long, Int, Option[String])].collect()
    assert(h.toSeq == Seq(
      (4L, 1, None), (4L, 2, Some("A")), (4L, 3, None), (5L, 1, None)))
  }

  test("plan shape: one exchange — both windows reuse the key partitioning") {
    val df = history
    df.collect()
    val n = countShuffles(df)
    assert(n == 1,
      s"SCD-2 must shuffle once on the key, got $n executed shuffles:\n" +
        df.queryExecution.executedPlan.toString)
  }
}
