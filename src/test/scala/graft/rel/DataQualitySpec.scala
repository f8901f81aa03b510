package graft.rel

import graft.SparkSpec

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private val parent = Seq(1L, 2L, 3L).toDF("pk")
  private val child  = Seq((10L, 1L), (11L, 2L), (12L, 9L), (13L, 9L)).toDF("id", "fk")

  test("orphans: exactly the child rows whose key has no parent") {
    val o = DataQuality.orphans(child, "fk", parent, "pk").select("id").as[Long].collect().toSet
    assert(o == Set(12L, 13L))
  }

  test("orphans: NULL foreign keys are the null-check's business, not orphans") {
    val withNull = Seq((10L, Some(1L)), (11L, None), (12L, Some(9L)))
      .toDF("id", "fk")
    val o = DataQuality.orphans(withNull, "fk", parent, "pk").select("id").as[Long].collect().toSet
    assert(o == Set(12L), s"null fk must not count as an orphan: $o")
  }

  test("orphans: duplicate parent keys don't fan out the child") {
    val dupParent = Seq(1L, 1L, 2L).toDF("pk")
    assert(DataQuality.orphans(child, "fk", dupParent, "pk").count() == 2)
  }

  test("duplicateKeys reports each over-represented key once with its row count") {
    val df = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("k")
    val d = DataQuality.duplicateKeys(df, "k").as[(Long, Long)].collect().toMap
    assert(d == Map(2L -> 2L, 3L -> 3L))
  }

  test("auditCounts: one labeled row per check, zero counts included") {
    val rows = DataQuality.auditCounts(
      "orphans" -> DataQuality.orphans(child, "fk", parent, "pk"),
      "dups" -> DataQuality.duplicateKeys(child, "id"))
      .as[(String, Long)].collect().toMap
    assert(rows == Map("orphans" -> 2L, "dups" -> 0L))
  }
}
