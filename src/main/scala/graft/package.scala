import org.apache.spark.sql.{DataFrame, SparkSession}

package object graft {
  /** Driver-contract query shape: (session, sfDir) → result frame. */
  type QFn = (SparkSession, String) => DataFrame

  /** One named engine query plus its optional DuckDB oracle SQL (run by the
    * driver over the same parquet tables; omitted ⇒ rows-only check). */
  final case class NamedQuery(name: String, fn: QFn, oracle: Option[String])

  object Tables {
    def t(s: SparkSession, dir: String, n: String): DataFrame =
      s.read.parquet(s"$dir/$n.parquet")
  }
}
