package graft.rel

import graft.CacheScope
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [engine-added] Deterministic epoch shuffle for training-data delivery:
  * assign every document a position in a seeded pseudo-random permutation
  * of the corpus, plus a balanced contiguous shard. Re-seeding gives a
  * fresh, reproducible order per training epoch — the "global shuffle
  * before sharding to data loaders" step of a pre-training pipeline.
  *
  * The permutation is the rank of a keyed multiplicative hash. Rank — like
  * any global `row_number` — is the canonical 100 TB scale-killer when
  * written as a window with no partition key (one task sorts the corpus).
  * This operator computes the identical answer with the same two-level
  * scheme as [[Packing.packSequences]]:
  *
  *   1. range-partition by (hash, id) — the one shuffle — and sort within
  *      partitions: global hash order becomes (partition, position) order;
  *   2. count rows per partition (one metadata row each), exclusive-scan
  *      the counts on the driver, broadcast the per-partition base ranks;
  *   3. stream each partition once, emitting base + local index.
  *
  * The hash is `(id * MULT + seed) mod P` — deliberately small, portable
  * arithmetic (no engine-specific hash), so an external system (or the
  * DuckDB oracle) reproduces the exact permutation from the same formula.
  * Ties (hash collisions) break by id, so the order is total and the
  * output is deterministic in values regardless of partitioning.
  *
  * Shards are contiguous rank ranges (`shard = position * shards / n`),
  * so each shard differs by at most one row from perfect balance and a
  * data loader can claim its shard as one range scan of the output.
  */
object EpochShuffle {

  /** Knuth's 2^32 golden-ratio constant and a prime modulus. An ADDITIVE
    * seed in an affine hash mod P would only rotate the order (every hash
    * shifts by the same constant, so the permutation barely changes with
    * the seed) — the seed must pick the MULTIPLIER: mod a prime, distinct
    * nonzero multipliers give genuinely unrelated orders. All operands
    * stay < P ≈ 1e9, so products stay < 1e18 — safe under ANSI Long
    * arithmetic because ids are reduced mod P first. */
  private val Mult = 2654435761L
  val P = 998244353L

  /** The seed-derived multiplier/offset, exposed so an external replayer
    * (or SQL oracle) can embed them as literals. */
  def seedMult(seed: Long): Long = {
    val m = math.floorMod(seed * Mult + 0x9E3779B9L, P)
    if (m == 0L) 1L else m
  }
  def seedAdd(seed: Long): Long = math.floorMod(seed, P)

  /** Seeded portable hash of a numeric id, reproducible in plain SQL as
    * `((id % P) * seedMult(seed) + seedAdd(seed)) % P` — for NON-NEGATIVE
    * ids. This side uses `pmod` (always ≥ 0) while SQL's `%` follows the
    * dividend's sign, so an external replayer with signed ids would
    * diverge on negatives; replaying signed ids needs a double-pmod
    * (`((id % P) + P) % P`) in the SQL recipe. */
  def portableHash(id: org.apache.spark.sql.Column, seed: Long): org.apache.spark.sql.Column =
    pmod(pmod(id.cast("long"), lit(P)) * lit(seedMult(seed)) + lit(seedAdd(seed)), lit(P))

  /** @param docs   input with a unique numeric id column
    * @param idCol  stable unique id (cast to long)
    * @param seed   epoch seed — different seed, different permutation
    * @param shards number of contiguous output shards (> 0)
    * @return `(idCol, h, position, shard)`: 0-based permutation position
    *         and balanced shard index, one row per input row
    */
  def shuffle(docs: DataFrame, idCol: String, seed: Long, shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    val s = docs.sparkSession
    import s.implicits._

    val p = s.conf.get("spark.sql.shuffle.partitions").toInt
    // cached: the ranged layout is read twice (counts + rank assignment)
    // and the partition assignment must be identical across both reads —
    // same stability argument (and the same loud self-check) as Packing.
    val ranged = CacheScope.track(
      docs
        .select(portableHash(col(idCol), seed).as("_h"), col(idCol).cast("long").as("_id"))
        .repartitionByRange(p, col("_h"), col("_id"))
        .sortWithinPartitions("_h", "_id")
        .as[(Long, Long)]
        .cache())

    twoLevelRank(s, ranged, shards).toDF(idCol, "h", "position", "shard")
  }

  /** The shared two-level global rank over a range-partitioned,
    * within-partition-sorted `(key, id)` layout: per-partition subtotals
    * → broadcast cumulative bases → per-partition sequential positions,
    * plus balanced contiguous shard assignment. One range shuffle, never
    * a single-task global window — the only total-order primitive that
    * survives 100 TB. Caller must pass a CACHED dataset (it is read
    * twice and the partition assignment must be identical across reads;
    * a drift self-check throws loudly). Returns `(id, key, position,
    * shard)` unnamed — callers `.toDF` their own column names. */
  private[rel] def twoLevelRank(
      s: org.apache.spark.sql.SparkSession,
      ranged: org.apache.spark.sql.Dataset[(Long, Long)],
      shards: Int): org.apache.spark.sql.Dataset[(Long, Long, Long, Long)] = {
    import s.implicits._
    // .rdd.mapPartitionsWithIndex, NOT Dataset.mapPartitions +
    // TaskContext.getPartitionId: the task's partition id is the STAGE
    // partition index, which drifts from the dataset's own partition
    // number whenever this lineage is fused into a wider stage (e.g. a
    // union/exceptAll over two shuffles) — the RDD-level index is the
    // partition's identity regardless of what stage computes it.
    val rdd = ranged.rdd
    val counts: Array[(Int, Long)] = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var n = 0L
        while (it.hasNext) { it.next(); n += 1 }
        if (n > 0) Iterator.single((pid, n)) else Iterator.empty
      }
      .collect()

    val sorted = counts.sortBy(_._1)
    val total = sorted.map(_._2).sum
    val bases: Map[Int, Long] =
      sorted.map(_._1).zip(sorted.scanLeft(0L)(_ + _._2)).toMap
    val bBases = s.sparkContext.broadcast(bases)
    val bCounts = s.sparkContext.broadcast(counts.toMap)
    val nShards = shards.toLong

    rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val base = bBases.value.getOrElse(pid, 0L)
        var acc = base
        val mapped = it.map { case (h, id) =>
          val pos = acc
          acc += 1
          // contiguous balanced sharding; total==0 is unreachable here
          // (an empty partition emitted no rows)
          (id, h, pos, pos * nShards / total)
        }
        mapped ++ {
          val expected = bCounts.value.getOrElse(pid, 0L)
          if (acc - base != expected)
            throw new IllegalStateException(
              s"twoLevelRank partition $pid drifted between passes: " +
                s"count pass saw $expected rows, rank pass saw ${acc - base} — " +
                "range partition assignment was not stable across reads")
          Iterator.empty
        }
      }
      .toDS()
  }
}
