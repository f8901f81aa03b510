package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the boundary semantics the s13 oracle assumes: Spark session
  * windows MERGE when the next event lands at exactly start+gap (the
  * merge test is `start <= prevEnd`, i.e. closed [ts, ts+gap]), so a new
  * session begins only at a gap STRICTLY greater than the window length —
  * identical to q22's strict `>` is_new rule. */
class SessionWindowSpec extends SparkSpec {
  import spark.implicits._

  private val gapMs = 30L * 60 * 1000

  private def sessions(offsetsMs: Long*) = offsetsMs
    .map(o => (1L, new java.sql.Timestamp(1700000000000L + o)))
    .toDF("user_id", "ts")
    .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
    .agg(count(lit(1)).as("n"))
    .select("n").as[Long].collect().sorted.toSeq

  test("events a hair under the gap apart merge into one session") {
    assert(sessions(0L, gapMs - 1) == Seq(2L))
  }

  test("events EXACTLY the gap apart still merge (closed interval); one past it splits") {
    assert(sessions(0L, gapMs) == Seq(2L))
    assert(sessions(0L, gapMs + 1) == Seq(1L, 1L))
  }

  test("chained sub-gap steps keep one session open indefinitely") {
    assert(sessions(0L, gapMs - 1, 2 * (gapMs - 1), 3 * (gapMs - 1)) == Seq(4L))
  }
}
