import org.apache.spark.sql.{DataFrame, SparkSession}

package object graft {
  /** Driver-contract query shape: (session, sfDir) → result frame. */
  type QFn = (SparkSession, String) => DataFrame

  /** One named engine query plus its optional DuckDB oracle SQL (run by the
    * driver over the same parquet tables; omitted ⇒ rows-only check). */
  final case class NamedQuery(name: String, fn: QFn, oracle: Option[String])

  object Tables {
    /** Fixture reader. `events.ts` is TIMESTAMP(NANOS), which Spark's
      * vectorized Parquet reader refuses — read nanos as long and convert
      * to a microsecond timestamp with integer division (no double
      * round-trip, so no sub-µs drift vs DuckDB's native NS read). */
    def t(s: SparkSession, dir: String, n: String): DataFrame =
      if (n == "events") {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        s.read.parquet(s"$dir/$n.parquet")
          .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      } else s.read.parquet(s"$dir/$n.parquet")
  }
}
