import org.apache.spark.sql.{DataFrame, SparkSession}

package object graft {
  /** Driver-contract query shape: (session, sfDir) → result frame. */
  type QFn = (SparkSession, String) => DataFrame

  /** One named engine query plus its optional DuckDB oracle SQL (run by the
    * driver over the same parquet tables; omitted ⇒ rows-only check). */
  final case class NamedQuery(name: String, fn: QFn, oracle: Option[String])

  object Tables {
    /** Fixture reader. `events.ts` has shipped in two parquet encodings
      * across fixture drops: TIMESTAMP(NANOS) (which Spark's vectorized
      * reader only surfaces as long via `nanosAsLong`) and
      * TIMESTAMP(MICROS, isAdjustedToUTC=false) (surfaced as
      * timestamp_ntz). Normalize both to a session-TZ TIMESTAMP so every
      * downstream query/oracle sees identical values (session TZ is UTC
      * in all entry points, so ntz→ltz is a pure reinterpretation). */
    def t(s: SparkSession, dir: String, n: String): DataFrame =
      if (n == "events") {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val raw = s.read.parquet(s"$dir/$n.parquet")
        import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
        import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
        raw.schema("ts").dataType match {
          case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
          case _                => raw
        }
      } else s.read.parquet(s"$dir/$n.parquet")
  }
}
