package graft

import graft.index.IvfSearch
import graft.rel.{PipelineQueries, RelQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is exposed here as a named
  * query; the SQL-expressible ones carry DuckDB oracle SQL for the driver's
  * hash-compare, the rest (seeded-hash LSH, IVF probe math) are rows-only
  * and get their oracles in ScalaTest instead.
  */
object SparkEntry {

  private val all: Seq[NamedQuery] = RelQueries.defs ++ PipelineQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exact 10-NN of the first 5 vectors over `embeddings` — the reference's
    * ground-truth query (exact_topk, quake_min.py:212-215), batched. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    IvfSearch
      .exactTopK(
        emb.select("vec_id", "embedding"),
        emb.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"), col("embedding").as("qvec")),
        k = 10)
      .orderBy("query_id", "rank")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
