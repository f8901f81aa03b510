package graft.rel

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def snapshot = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
  ).toDF("k", "name", "v")

  // key 1: update; key 2: delete; key 3: untouched; key 4: update then
  // delete (delete wins by ord); key 5: insert; key 6: insert then delete
  // (never lands); key 7: delete then re-insert (lands)
  private def changes = Seq(
    (1L, 1L, "U", "a2", 11.0),
    (2L, 1L, "D", null, 0.0),
    (4L, 1L, "U", "d2", 41.0), (4L, 2L, "D", null, 0.0),
    (5L, 1L, "I", "e", 50.0),
    (6L, 1L, "I", "f", 60.0), (6L, 2L, "D", null, 0.0),
    (7L, 1L, "D", null, 0.0), (7L, 2L, "I", "g", 70.0)
  ).toDF("k", "ord", "op", "name", "v")

  test("latest op per key wins: update, delete, passthrough, insert, and re-insert") {
    val out = Merge.applyChangelog(snapshot, changes, "k", "ord", "op")
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq(
      (1L, "a2", 11.0), (3L, "c", 30.0), (5L, "e", 50.0), (7L, "g", 70.0)))
  }

  test("merge of an empty changelog is the identity") {
    val out = Merge.applyChangelog(snapshot, changes.limit(0), "k", "ord", "op")
    assert(out.orderBy("k").collect().toSeq == snapshot.orderBy("k").collect().toSeq)
  }

  test("idempotent: re-applying the same changelog to the merged result is a no-op") {
    val once = Merge.applyChangelog(snapshot, changes, "k", "ord", "op")
    val twice = Merge.applyChangelog(once, changes, "k", "ord", "op")
    assert(twice.orderBy("k").collect().toSeq == once.orderBy("k").collect().toSeq)
  }

  test("equal-ord ties break on the explicit U > D > I rank, not op string order") {
    // key 1: U vs D at the same ord — the update wins (U outranks D);
    // key 2: D vs I at the same ord — the delete wins (D outranks I;
    //        lexicographic op order would wrongly keep the insert);
    // key 8: I vs D at the same ord on a fresh key — never lands
    val tied = Seq(
      (1L, 1L, "D", null, 0.0), (1L, 1L, "U", "a2", 11.0),
      (2L, 1L, "I", "b2", 21.0), (2L, 1L, "D", null, 0.0),
      (8L, 1L, "I", "h", 80.0), (8L, 1L, "D", null, 0.0)
    ).toDF("k", "ord", "op", "name", "v")
    val out = Merge.applyChangelog(snapshot, tied, "k", "ord", "op")
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq(
      (1L, "a2", 11.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("malformed ops — null or unknown — upsert on BOTH legs, matching the rank-0 tie bucket") {
    // key 1 (existing): null op replaces the payload (leg 1);
    // key 9 (fresh): null op INSERTS (leg 2 — a bare =!= 'D' would
    //   null-filter it into a silent drop, diverging from leg 1);
    // key 10 (fresh): unknown op 'X' inserts the same way
    val malformed = Seq(
      (1L, 1L, null.asInstanceOf[String], "a9", 19.0),
      (9L, 1L, null.asInstanceOf[String], "i", 90.0),
      (10L, 1L, "X", "j", 100.0)
    ).toDF("k", "ord", "op", "name", "v")
    val out = Merge.applyChangelog(snapshot, malformed, "k", "ord", "op")
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq(
      (1L, "a9", 19.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0),
      (9L, "i", 90.0), (10L, "j", 100.0)))
  }

  test("randomized differential: applyChangelog equals an in-memory reference on seeded scenarios") {
    val rnd = new scala.util.Random(20260813L)
    (1 to 10).foreach { scenario =>
      val snapshot = (1L to (5 + rnd.nextInt(20)).toLong)
        .filter(_ => rnd.nextBoolean())
        .map(k => (k, rnd.nextInt(100).toDouble))
      // unique ord per row, so latest-op is unambiguous
      val changeRows = (1 to rnd.nextInt(30)).map { i =>
        (1L + rnd.nextInt(25), i.toLong, Seq("I", "U", "D")(rnd.nextInt(3)), rnd.nextInt(1000).toDouble)
      }
      val latest = changeRows.groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
      val snapMap = snapshot.toMap
      val expected = (snapMap.keySet ++ latest.keySet).toSeq.flatMap { k =>
        latest.get(k) match {
          case Some((_, _, "D", _))  => None
          case Some((_, _, _, v))    => Some((k, v))
          case None                  => snapMap.get(k).map((k, _))
        }
      }.sorted
      val got = Merge
        .applyChangelog(snapshot.toDF("k", "v"), changeRows.toDF("k", "ord", "op", "v"), "k", "ord", "op")
        .as[(Long, Double)].collect().toSeq.sorted
      assert(got == expected, s"scenario $scenario: $got != $expected")
    }
  }

  test("plan shape: the snapshot side is joined, not window-shuffled; joins broadcast") {
    val out = Merge.applyChangelog(snapshot, changes, "k", "ord", "op")
    out.collect()
    val s = out.queryExecution.executedPlan.toString
    assert(s.contains("BroadcastHashJoin"), s"small changelog must broadcast:\n$s")
    // the only Window in the plan must be over the changelog, whose rows
    // carry `ord` — the snapshot has no such column to window over
    assert(!s.contains("SortMergeJoin"), s"snapshot must not shuffle for a small changelog:\n$s")
  }
}
