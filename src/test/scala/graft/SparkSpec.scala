package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test run (suites would otherwise
  * each pay ~5 s of Spark startup). */
object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  spark.sparkContext.setLogLevel("WARN")

  /** Count the shuffle exchanges a query actually executes. Walks the
    * final adaptive plan tree (descending into materialized query stages),
    * skipping `ReusedExchange` — a textual count over `plan.toString` is
    * brittle because AQE prints BOTH a Final and an Initial plan section,
    * double-counting every exchange and hiding reuse. Call after an
    * action so `isFinalPlan` holds. */
  def countShuffles(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    def walk(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec        => walk(q.plan)
      case _: ReusedExchangeExec    => 0
      case s: ShuffleExchangeLike   => 1 + s.children.map(walk).sum
      case other                    => other.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }
}
