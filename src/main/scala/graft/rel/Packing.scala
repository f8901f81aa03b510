package graft.rel

import graft.CacheScope
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [engine-added] Sequence packing for LLM pre-training: concatenate a
  * document stream (in stable id order) into one global token stream and
  * cut it into fixed-`budget` training sequences. Each document's
  * placement is fully described by its global token `start_offset`; the
  * sequences it lands in are `[start/budget, (start+n-1)/budget]` —
  * documents may straddle a boundary, exactly like the standard
  * concat-then-chunk pretraining packer.
  *
  * The global offset is a prefix sum. The naive formulation — a window
  * over `ORDER BY id` with no partition key — collapses the whole corpus
  * into ONE task and is the canonical 100 TB scale-killer. This operator
  * computes the identical answer with a two-level prefix sum:
  *
  *   1. range-partition by id (the one and only shuffle) + in-partition
  *      sort — global order becomes (partition, position) order;
  *   2. per-partition token subtotals: one tiny row per partition,
  *      collected to the driver (O(#partitions), metadata-sized);
  *   3. exclusive-scan those subtotals into per-partition base offsets,
  *      broadcast the ≤`#partitions`-entry map back, and stream each
  *      partition once, accumulating locally from its base.
  *
  * Zero-token documents occupy no span and are dropped (a span-less row
  * has no well-defined sequence interval).
  */
object Packing {

  /** @param docs       input with a unique numeric id and a token count
    * @param idCol      stable orderable id (cast to long)
    * @param nTokensCol per-doc token count (cast to long; rows ≤ 0 dropped)
    * @param budget     tokens per packed training sequence
    * @return `(idCol, n_tokens, start_offset, seq_first, seq_last)`,
    *         deterministic in values regardless of partitioning
    */
  def packSequences(docs: DataFrame, idCol: String, nTokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val s = docs.sparkSession
    import s.implicits._

    val p = s.conf.get("spark.sql.shuffle.partitions").toInt
    // cache: the ranged layout is read twice (subtotals + packing) and the
    // partition assignment MUST be identical across both reads
    val ranged = CacheScope.track(
      docs
        .select(col(idCol).cast("long").as("_id"), col(nTokensCol).cast("long").as("_n"))
        .filter(col("_n") > 0)
        .repartitionByRange(p, col("_id"))
        // _n as tiebreaker: ids are expected unique, but if a caller feeds
        // duplicates the output stays deterministic anyway (equal (id, n)
        // rows are interchangeable; unequal ones get a fixed order)
        .sortWithinPartitions("_id", "_n")
        .as[(Long, Long)]
        .cache())

    // (2) one subtotal row per partition — metadata, not data.
    // .rdd.mapPartitionsWithIndex, NOT Dataset.mapPartitions +
    // TaskContext.getPartitionId: the task's partition id is the STAGE
    // partition index, which drifts from the dataset's own partition
    // number whenever this lineage is fused into a wider stage (e.g. a
    // union/exceptAll downstream) — the RDD-level index is the
    // partition's identity regardless of what stage computes it.
    val rdd = ranged.rdd
    val subtotals: Array[(Int, Long)] = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var t = 0L
        var any = false
        while (it.hasNext) { t += it.next()._2; any = true }
        if (any) Iterator.single((pid, t)) else Iterator.empty
      }
      .collect()

    // (3) exclusive scan → base offset per partition (range partitions are
    // ordered by id, so partition index order IS global order)
    val sorted = subtotals.sortBy(_._1)
    val bases: Map[Int, Long] =
      sorted.map(_._1).zip(sorted.scanLeft(0L)(_ + _._2)).toMap
    val bBases = s.sparkContext.broadcast(bases)
    val bSubs = s.sparkContext.broadcast(subtotals.toMap)

    // Correctness of the two-level scan REQUIRES the partition assignment
    // to be byte-identical across the subtotal read and this read. That
    // holds because `ranged` is cached, and on cache-block loss the
    // recompute re-samples RangePartitioner bounds with an rdd.id-seeded
    // (hence deterministic) sampler — a non-obvious dependency a storage-
    // level or Spark-version change could break SILENTLY, producing wrong
    // offsets. So each partition re-verifies itself: its token sum must
    // equal the pass-1 subtotal it was assigned a base from; drift fails
    // the job loudly instead of shipping a corrupted packing.
    rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val base = bBases.value.getOrElse(pid, 0L)
        var acc = base
        val mapped = it.map { case (id, n) =>
          val start = acc
          acc += n
          (id, n, start, start / budget, (start + n - 1) / budget)
        }
        // runs after `mapped` exhausts (++ is by-name): the guard
        mapped ++ {
          val expected = bSubs.value.getOrElse(pid, 0L)
          if (acc - base != expected)
            throw new IllegalStateException(
              s"packSequences partition $pid drifted between passes: " +
                s"subtotal pass saw $expected tokens, packing pass saw ${acc - base} — " +
                "range partition assignment was not stable across reads")
          Iterator.empty
        }
      }
      .toDF(idCol, "n_tokens", "start_offset", "seq_first", "seq_last")
  }
}
