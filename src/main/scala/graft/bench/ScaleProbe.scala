package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [engine-added] Scale rehearsal beyond the fixture: the sf0.1 bench
  * proves correctness and small-scale speed, but the 100 TB claims are
  * about GROWTH — so each round's record measures the heaviest batch
  * queries at 1× and ~10× the corpus and publishes the scaling exponent
  * `log(t_K / t_1) / log(K)` (≤ 1 ⇒ at-most-linear; a super-linear
  * exponent is a plan that will not survive the cluster).
  *
  * The K× corpus is the NATURAL null model of a bigger crawl, not a naive
  * row copy: replica `j` shifts ids by `j·10⁷`, prefixes every token with
  * a replica tag (so shingle/token keys are disjoint across replicas —
  * near-dup density per unit of corpus stays constant instead of every
  * doc gaining K−1 exact twins, which would measure quadratic PAIR growth
  * rather than plan growth), suffixes block keys (`source`) the same way,
  * and rotates embeddings by `j` positions (norm-preserving, so the
  * vector distribution is unchanged while replicas stay distinct).
  * Relational side tables (`customer`, `supplier`, `events`) replicate
  * with the same id shift, so fixed-frontier operators (p16's 100-node
  * graph, q46's 10-root forest, v31's capped exact sample) keep their
  * frontier CONSTANT while the scan under them grows — exactly the
  * bounded-work-at-scale claim their exponents certify. Scale 1 runs
  * through the SAME transform (replica 0 alone) so both measurements see
  * identically-shaped data.
  *
  * Measurement discipline (round-13 finding: single-pass exponents were
  * not reproducible — d16/v14 swapped 0.14↔1.1 between identical-binary
  * runs): each scale now takes TWO timed passes, query order ALTERNATES
  * between them (so order-dependent shared state — page cache, JIT,
  * executor pools — cannot systematically tax the same query), the
  * published time is the per-query MIN (the main suite's own rule), a
  * query that throws in any pass is excluded (elapsed-to-failure is not
  * a time), and warm-pass failures are RECORDED in the JSON instead of
  * vanishing into stderr (a failed warm pass silently lands one-time
  * training cost inside a timed query — the reader must see that). */
object ScaleProbe {

  /** The suite's heaviest batch queries (round-11 plan audit) plus the
    * round-12/13 additions whose growth the verdicts asked to measure:
    * the BSP loop (p16), all three k-NN-graph paths (v31 exact-capped,
    * v33 probed — steady since round 20, its index warmed per
    * [[timeAt]]'s dependency map, so its point measures the probed SCAN's
    * growth; v45 NN-descent, the default cold construction), the
    * sketch-law pass (t19), recursion (q46), and the streaming sketch
    * (s14). */
  val ProbeQueries: Seq[String] = Seq(
    "d03_ngram_jaccard",
    "d07_ppjoin_jaccard",
    "d14_line_dedup",
    "d16_minhash_estimator_audit",
    "v14_knn_backends",
    "v31_knn_graph",
    "v33_knn_graph_ivf",
    "v45_knn_graph_descent",
    "p16_pagerank",
    "t19_cms_mergeability",
    "q46_recursive_hierarchy",
    "s14_stream_approx_distinct")

  /** The replica id shift. Every shifted key column is ASSERTED below it
    * at build time ([[assertShiftable]]): a base fixture whose keys reach
    * the shift (sf1 orderkeys would at k ≥ 2) would silently collide
    * replica key ranges and break the referential-integrity and
    * replicas-are-new-entities invariants every exponent relies on. */
  private[bench] val Shift = 10000000L

  /** One cheap max() per shifted key column — fail LOUDLY at build time
    * instead of publishing exponents over a self-colliding corpus. */
  private def assertShiftable(df: DataFrame, table: String, keyCols: Seq[String]): Unit = {
    // Spark's greatest() requires >1 args — single-key tables take max alone
    val maxes = keyCols.map(c => max(col(c).cast("long")))
    val row = df.agg(if (maxes.size == 1) maxes.head else greatest(maxes: _*)).head()
    val mx = if (row.isNullAt(0)) Long.MinValue else row.getLong(0)
    require(mx < Shift,
      s"$table key(s) ${keyCols.mkString(",")} reach $mx >= replica shift $Shift — " +
        "replica key ranges would collide; raise the shift or shrink the base fixture")
  }

  /** Write the K×-scaled probe tables under `outBase/x<k>`; returns the
    * dir usable as a `(spark, dir)` query argument. */
  def buildDir(spark: SparkSession, sfDir: String, k: Int, outBase: String): String = {
    val out = s"$outBase/x$k"
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    assertShiftable(docs, "documents", Seq("doc_id"))
    val scaledDocs = (0 until k).map { j =>
      val tag = s"z${j}x"
      val text = concat_ws(" ",
        transform(
          filter(split(lower(col("text")), "\\s+"), t => length(t) > 0),
          t => concat(lit(tag), t)))
      docs.select(
        (col("doc_id") + j * Shift).as("doc_id"),
        text.as("text"),
        col("lang"),
        concat(col("source"), lit(s"_$tag")).as("source"),
        // cast: length() is INT, the fixture schema declares n_chars
        // BIGINT — the probe dirs must match the documented schema so
        // probe queries exercise the same plans/casts as every fixture
        length(text).cast("long").as("n_chars"))
    }.reduce(_.unionByName(_))
    scaledDocs.write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    assertShiftable(emb, "embeddings", Seq("vec_id"))
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val scaledEmb = (0 until k).map { j =>
      val rot = j % dim
      val rotated =
        if (rot == 0) col("embedding")
        else concat(
          slice(col("embedding"), rot + 1, dim - rot),
          slice(col("embedding"), 1, rot))
      emb.select(
        (col("vec_id") + j * Shift).as("vec_id"),
        rotated.as("embedding"),
        col("label"))
    }.reduce(_.unionByName(_))
    scaledEmb.write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // relational side tables: replicate with the same id shift on every
    // key column; non-key attributes ride along unchanged, so replicas
    // are new entities (new customers/suppliers/users), not duplicates
    shiftedTable(spark, sfDir, "customer", Seq("c_custkey"), k)
      .write.mode("overwrite").parquet(s"$out/customer.parquet")
    shiftedTable(spark, sfDir, "supplier", Seq("s_suppkey"), k)
      .write.mode("overwrite").parquet(s"$out/supplier.parquet")
    shiftedTable(spark, sfDir, "events", Seq("event_id", "user_id"), k)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    out
  }

  /** K replicas of a fixture table with every id in `keyCols` shifted by
    * `j·10⁷` — referential integrity holds across tables as long as both
    * sides of an FK shift by the same rule (ScaleUp shifts
    * orders.o_custkey and customer.c_custkey identically, etc.). */
  private[bench] def shiftedTable(
      spark: SparkSession,
      sfDir: String,
      table: String,
      keyCols: Seq[String],
      k: Int): DataFrame = {
    assertShiftable(graft.Tables.t(spark, sfDir, table), table, keyCols)
    (0 until k).map { j =>
      keyCols.foldLeft(graft.Tables.t(spark, sfDir, table)) { (df, c) =>
        df.withColumn(c, col(c) + j * Shift)
      }
    }.reduce(_.unionByName(_))
  }

  final case class Point(name: String, t1: Double, tK: Double, exponent: Double)

  final case class Result(
      points: Seq[Point],
      warmFailures: Seq[String],
      coldMode: String = "fresh_jvm")

  /** Time `names` at `dir` with the probe's measurement discipline: one
    * untimed v14 warm pass (v14 trains the per-dir index/PQ/SQ artifacts
    * on first touch — steady-state growth, not one-time training, is
    * what the exponent certifies), then two timed passes in alternating
    * order, min per query. A query that throws in any pass is excluded
    * (elapsed-to-failure is not a time — the same invariant the main
    * suite enforces; a fast-throwing query must not read as a fast
    * query, and here it would become a bogus exponent). */
  private def timeAt(
      spark: SparkSession,
      dir: String,
      scaleTag: String,
      names: Seq[String],
      warmFailures: scala.collection.mutable.ArrayBuffer[String],
      passes: Int = 2): Map[String, Double] = {
    val queries = graft.SparkEntry.queries
    // artifact warm pass (untimed), SIZED TO THE ROSTER: a roster that
    // times v14 needs the full index+PQ+SQ+codes training off the timed
    // path; the cold-build roster (v31/v45, the child JVM) consumes NO
    // session artifacts at all (that is the point of the descent path) —
    // warming v14 there trained ~2-4 min of codebooks nothing would
    // read, which is what pushed the r19 child past its deadline cap
    // and degraded the record to in-bench cold timing.
    // A warm failure means a timed query may absorb training cost — it
    // is recorded in the published JSON, not just stderr.
    def recordWarmFailure(what: String, e: Throwable): Unit = {
      // carry the CAUSE in the published entry, not just stderr — the
      // r18 record had warm_failures at both scales and no way to tell
      // why (the stderr with the message was lost with the driver kill).
      // Commas and brackets are stripped too: the parent parses the
      // child's warm_failures with a [^\]]* capture + a comma split,
      // and Spark messages routinely carry both (e.g. "[PATH_NOT_FOUND]
      // Path ...") — an unsanitized message would shred the merged list
      val why = (s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
        .replaceAll("[\"\\\\\\n\\r\\t,\\[\\]{}]", " ").replaceAll(" +", " ").take(160).trim
      warmFailures += s"$scaleTag:$what:$why"
      System.err.println(s"[scale-probe] warm ($what) failed at $dir: ${e.getMessage}")
    }
    // warm PER ARTIFACT DEPENDENCY, not per roster shape: the prior
    // if/else-if keyed on v14/v33 membership, so a restricted roster
    // (via `only`) pairing v14 with another artifact consumer warmed
    // only v14's chain, and a roster of just v33 relied on the else
    // branch — any future artifact-consuming probe query added to the
    // roster would silently absorb its training cost in the timed pass
    // with no warm_failures stamp. Each entry maps the artifact to the
    // roster queries that consume it; every matched artifact warms
    // (re-warming one v14 already trained is a cheap saved-artifact
    // read, so overlap is harmless).
    val warmDeps: Seq[(String, Set[String], () => Unit)] = Seq(
      // v14 consumes the full chain: IVF index + PQ codebook + residual
      // codes + SQ model — warming IS running the query once untimed
      ("v14_knn_backends", Set("v14_knn_backends"),
        () => queries("v14_knn_backends")(spark, dir)
          .write.mode("overwrite").format("noop").save()),
      // the probed graph build consumes only the saved IVF index
      ("index", Set("v33_knn_graph_ivf"),
        () => { graft.rel.PipelineQueries.indexFor(spark, dir); () }))
    warmDeps.foreach { case (what, consumers, warm) =>
      if (names.exists(consumers.contains))
        try warm()
        catch { case e: Throwable => recordWarmFailure(what, e) }
    }
    graft.CacheScope.clear()
    def onePass(order: Seq[String]): Map[String, Double] =
      order.flatMap { name =>
        val t0 = System.nanoTime()
        val ok =
          try { queries(name)(spark, dir).write.mode("overwrite").format("noop").save(); true }
          catch {
            case e: Throwable =>
              System.err.println(s"[scale-probe] $name FAILED at $dir — excluded: ${e.getMessage}")
              false
          }
        graft.CacheScope.clear()
        if (ok) Some(name -> (System.nanoTime() - t0) / 1e9) else None
      }.toMap
    val runs = (1 to math.max(1, passes)).map { i =>
      onePass(if (i % 2 == 1) names else names.reverse)
    }
    // min over passes; a query missing from ANY pass threw there — drop
    // it (the passes proved nothing reproducible about it)
    names.flatMap { name =>
      val ts = runs.map(_.get(name))
      if (ts.exists(_.isEmpty)) None else Some(name -> ts.flatten.min)
    }.toMap
  }

  private def toPoints(
      names: Seq[String],
      t1: Map[String, Double],
      tK: Map[String, Double],
      k: Int): Seq[Point] =
    names.flatMap { name =>
      (t1.get(name), tK.get(name)) match {
        case (Some(a0), Some(b0)) =>
          val a = math.max(1e-3, a0)
          val b = math.max(1e-3, b0)
          Some(Point(name, r3(a), r3(b), r3(math.log(b / a) / math.log(k.toDouble))))
        case _ => None
      }
    }

  /** [[ColdBuildQueries]] timed against already-built probe dirs — the
    * body [[ColdProbe]] (a fresh child JVM) runs. Public so the child
    * main can reach it. Two passes at ×1 (cheap — launch-floor noise is
    * the risk there), ONE pass at ×K: a multi-minute cold build sits far
    * above scheduler noise, and the second ×K pass was most of what
    * pushed the r19 child past the bench's deadline-derived cap (a
    * killed child degrades the record to the in-bench regime the child
    * exists to avoid — one slightly-noisier fresh-JVM point beats a
    * precise point from the wrong regime). */
  def coldPoints(
      spark: SparkSession,
      d1: String,
      dK: String,
      k: Int,
      roster: Seq[String] = ColdBuildQueries): Result = {
    val warm = scala.collection.mutable.ArrayBuffer.empty[String]
    val t1 = timeAt(spark, d1, "x1", roster, warm)
    val tK = timeAt(spark, dK, s"x$k", roster, warm, passes = 1)
    Result(toPoints(roster, t1, tK, k), warm.toSeq)
  }

  /** Run the cold-build queries in a FRESH child JVM (round-17 fix for
    * the unstable official exponents): v31/v45 build their graph
    * in-query, and timing that cold build in the END-OF-SUITE JVM
    * produced a 3× run-to-run swing (r16: driver-run exp 1.616 vs
    * same-binary builder-run 1.08 vs fresh-JVM ProbeMain 1.004–1.080) —
    * accumulated JVM state, not the plan, was being measured. A child
    * JVM reproduces ProbeMain's regime inside the official record. The
    * child inherits this JVM's own launch arguments (add-opens, -Xmx,
    * spark -D flags) and runs while the parent is idle, so nothing
    * contends with it. Returns None on any failure — the caller falls
    * back to in-bench timing and stamps the mode in the record. */
  private def runColdChild(
      d1: String, dK: String, k: Int,
      roster: Seq[String] = ColdBuildQueries,
      waitSec: Long = 1800L): Option[(Seq[Point], Seq[String])] =
    try {
      import scala.jdk.CollectionConverters._
      val javaBin = java.nio.file.Paths.get(
        System.getProperty("java.home"), "bin", "java").toString
      val inherited = java.lang.management.ManagementFactory
        .getRuntimeMXBean.getInputArguments.asScala.toSeq
        // the child builds its own (headless) session; a stale -Dspark.*
        // port/UI flag is fine to inherit, an agent/debugger flag is not
        .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-javaagent"))
      val cmd = Seq(javaBin) ++ inherited ++ Seq(
        "-cp", System.getProperty("java.class.path"),
        "graft.bench.ColdProbe", d1, dK, k.toString, roster.mkString(","))
      val pb = new ProcessBuilder(cmd.asJava)
      pb.redirectErrorStream(false)
      val proc = pb.start()
      // drain both pipes on threads so the child can't block on a full
      // pipe AND the parent's timeout below stays authoritative (a
      // blocking read here would outlive waitFor if the child hangs)
      val errDrain = new Thread(() => {
        val src = scala.io.Source.fromInputStream(proc.getErrorStream)
        try src.getLines().foreach(l => System.err.println(s"[cold-probe-jvm] $l"))
        catch { case _: Throwable => () }
        finally src.close()
      })
      errDrain.setDaemon(true)
      errDrain.start()
      val outLines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val outDrain = new Thread(() => {
        val src = scala.io.Source.fromInputStream(proc.getInputStream)
        try src.getLines().foreach(outLines.add)
        catch { case _: Throwable => () }
        finally src.close()
      })
      outDrain.setDaemon(true)
      outDrain.start()
      // bounded wait (r18: an unconditional 30-minute allowance here is
      // what the driver's 60-minute kill landed on — Bench passes a cap
      // sized to ITS remaining deadline via max(60, min(600,
      // remaining-240)), i.e. ≤ 10 min); a slow child degrades to
      // in-bench timing, stamped in the record
      val done = proc.waitFor(waitSec, java.util.concurrent.TimeUnit.SECONDS)
      if (!done) {
        System.err.println(
          s"[scale-probe] cold child JVM exceeded the $waitSec s budget — killing it " +
            "and falling back to in-bench cold timing")
        proc.destroyForcibly(); None
      }
      else if (proc.exitValue() != 0) None
      else {
        outDrain.join(10000L)
        val line = outLines.asScala.find(_.startsWith("COLD_PROBE "))
        line.map { l0 =>
          val l = l0.stripPrefix("COLD_PROBE ")
          // the child serializes bounded-work rows (v31) without an
          // exponent — accept both forms; the placeholder 0.0 is never
          // published (toJson re-suppresses it by name)
          val re = """"([A-Za-z0-9_]+)":\{"t1":([0-9.]+),"tk":([0-9.]+),(?:"exp":(-?[0-9.]+(?:[eE][+-]?[0-9]+)?)|"bounded":true)\}""".r
          val pts = re.findAllMatchIn(l)
            .map(m => Point(m.group(1), m.group(2).toDouble, m.group(3).toDouble,
              Option(m.group(4)).map(_.toDouble).getOrElse(0.0)))
            .toSeq
          // the child records its own warm-pass failures; dropping them
          // here would violate the module invariant that a failed warm
          // pass is IN the JSON (it silently lands one-time training
          // cost inside a timed cold query) — merge them into ours
          val wf = """"warm_failures":\[([^\]]*)\]""".r
            .findFirstMatchIn(l)
            .map(_.group(1).split(',').toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
              .filter(_.nonEmpty))
            .getOrElse(Nil)
          (pts, wf)
        }.filter(_._1.nonEmpty)
      }
    } catch {
      case e: Throwable =>
        System.err.println(s"[scale-probe] cold child JVM failed: ${e.getMessage}")
        None
    }

  /** Run every probe query at scale 1 and scale `k` and publish the
    * scaling exponents. The steady-state queries are timed in THIS JVM
    * (two alternating passes per scale, min); the cold-build queries
    * (v31/v45) are timed in a fresh child JVM — see [[runColdChild]] —
    * unless `SPARK_GRAFT_COLD_PROBE_JVM=0` (builder iteration) or the
    * child fails, in which case they fall back to in-bench timing and
    * the record's `cold_build_mode` says so. `only` restricts the
    * roster (re-adjudicating ONE query's outlier point must not cost a
    * full-roster probe — the d03/d04/d07 noise-verdict discipline). */
  /** `childWaitSec` bounds the cold child JVM's wall-clock. The default
    * stays at the generous standalone bound (ProbeMain has no deadline
    * pressure and exists precisely to measure the fresh-JVM regime —
    * killing a slow cold build would degrade it to the in-bench timing
    * it cross-checks); Bench passes an aggressive cap sized from ITS
    * remaining driver-window budget. `remainingBudgetSec` (when given)
    * also gates the IN-BENCH cold fallback after a killed/failed child:
    * on the r19 corpus roll that fallback alone ran ~15 minutes, pushing
    * the whole bench past the driver's kill window — the one failure
    * mode the deadline machinery exists to prevent. A skipped fallback
    * publishes NO cold points and stamps `cold_build_mode:
    * "deadline_skipped"` (steady points are unaffected). */
  def run(
      spark: SparkSession,
      sfDir: String,
      k: Int = 10,
      only: Option[Set[String]] = None,
      childWaitSec: Long = 1800L,
      remainingBudgetSec: Option[() => Double] = None): Result = {
    val base = java.nio.file.Files.createTempDirectory("graft_scaleprobe_").toString
    val warmFailures = scala.collection.mutable.ArrayBuffer.empty[String]
    // a typo'd restriction must fail loudly, not produce a green-looking
    // probe that measured nothing (both scaled corpora still get built)
    only.foreach { o =>
      require(o.nonEmpty, "empty probe-query restriction")
      val unknown = o.diff(ProbeQueries.toSet)
      require(unknown.isEmpty,
        s"unknown probe queries ${unknown.mkString(",")} — roster: ${ProbeQueries.mkString(",")}")
    }
    val roster = only.map(o => ProbeQueries.filter(o.contains)).getOrElse(ProbeQueries)
    try {
      val d1 = buildDir(spark, sfDir, 1, base)
      val dK = buildDir(spark, sfDir, k, base)
      val steady = roster.filterNot(ColdBuildQueries.contains)
      val t1 = timeAt(spark, d1, "x1", steady, warmFailures)
      val tK = timeAt(spark, dK, s"x$k", steady, warmFailures)
      val steadyPoints = toPoints(steady, t1, tK, k)
      val coldRoster = roster.filter(ColdBuildQueries.contains)
      val wantChild = sys.env.getOrElse("SPARK_GRAFT_COLD_PROBE_JVM", "1") != "0"
      val (coldPts, coldMode) =
        // a restricted roster with no cold-build queries ran no child at
        // all — stamp a distinct mode instead of asserting a fresh-JVM
        // regime that never existed (the Bench caveat note keys off it)
        if (coldRoster.isEmpty) (Nil, "skipped")
        else (if (wantChild) runColdChild(d1, dK, k, coldRoster, childWaitSec) else None) match {
          case Some((pts, childWarmFailures)) =>
            warmFailures ++= childWarmFailures
            (pts.filter(p => coldRoster.contains(p.name)), "fresh_jvm")
          case None =>
            // in-bench cold timing costs minutes (one full ×K build per
            // pass) — only affordable when the caller's budget covers it
            val affordable = remainingBudgetSec.forall(_() > 700.0)
            if (!affordable) {
              System.err.println(
                "[scale-probe] child JVM unavailable AND the remaining deadline " +
                  "cannot cover in-bench cold timing — cold points skipped, stamped")
              (Nil, "deadline_skipped")
            } else {
              if (wantChild)
                System.err.println(
                  "[scale-probe] falling back to in-bench cold-build timing " +
                    "(child JVM unavailable) — cross-check ProbeMain")
              val c1 = timeAt(spark, d1, "x1", coldRoster, warmFailures)
              val cK = timeAt(spark, dK, s"x$k", coldRoster, warmFailures, passes = 1)
              (toPoints(coldRoster, c1, cK, k), "in_bench")
            }
        }
      // publish in the roster's order, whatever the source JVM
      val byName = (steadyPoints ++ coldPts).map(p => p.name -> p).toMap
      Result(roster.flatMap(byName.get), warmFailures.toSeq, coldMode)
    } finally
      // the scaled corpora are ~(k+1)× the fixture on disk — free them as
      // soon as the points are collected. No shutdown-hook fallback: a
      // per-invocation hook leaks a registration each run, and its
      // "[cleanup] …" line printed AFTER Bench's final digest line is what
      // null'ed the round-13 BENCH record's parse (a crash simply leaves
      // one temp dir behind in a throwaway sandbox)
      graft.rel.PipelineQueries.deleteRecursively(java.nio.file.Paths.get(base))
  }

  /** Probe queries that BUILD their graph structure in-query at the
    * probe dirs (v31/v45 are the registered k-NN-graph build operators —
    * no session artifact exists for a freshly-generated probe corpus, so
    * their timed passes include a cold Ω(n) build). Measured in a FRESH
    * child JVM by default (see [[runColdChild]]): under end-of-suite JVM
    * state the same binary read exp 1.6 on one box and 1.08 on another
    * while fresh-JVM ProbeMain held 1.004–1.080 — the child reproduces
    * ProbeMain's regime inside the official record, and the JSON's
    * `cold_build_mode` says which regime produced the numbers.
    * Round 20: v45 (NN-descent, index-free) replaced v33 here — descent
    * is the default cold construction path, while v33's cold point
    * (index training + probed scan) was both the slowest probe row
    * (344 s at ×10, most of the child budget) and the corpus-roll-
    * sensitive one; v33 now rides the steady roster with its index
    * warmed, measuring the probed scan's growth instead. */
  val ColdBuildQueries: Seq[String] = Seq("v31_knn_graph", "v45_knn_graph_descent")

  /** Probe queries whose measured work is BOUNDED by construction (v31's
    * exact path has been capped to a constant node sample since round
    * 14), so both probe points sit at the job-launch floor and a fitted
    * exponent is noise around a constant — r17's record published
    * v31: −0.448, a physically meaningless negative slope (VERDICT r17
    * what's-wrong #1). Their rows keep both TIMES (the flatness is the
    * evidence of boundedness) but publish `"bounded": true` in place of
    * an exponent. */
  val BoundedWorkQueries: Set[String] = Set("v31_knn_graph")

  def toJson(k: Int, r: Result): String = {
    val pts = r.points
      .map { p =>
        if (BoundedWorkQueries.contains(p.name))
          s""""${p.name}":{"t1":${p.t1},"tk":${p.tK},"bounded":true}"""
        else s""""${p.name}":{"t1":${p.t1},"tk":${p.tK},"exp":${p.exponent}}"""
      }
      .mkString(",")
    val warm = r.warmFailures.map(w => s""""$w"""").mkString("[", ",", "]")
    val cold = ColdBuildQueries.map(q => s""""$q"""").mkString("[", ",", "]")
    val sep = if (r.points.isEmpty) "" else ","
    // cold ×K points take ONE pass (see coldPoints); everything else two
    s"""{"k":$k,"passes":2,"cold_xk_passes":1,"warm_failures":$warm,"cold_build":$cold,""" +
      s""""cold_build_mode":"${r.coldMode}"$sep$pts}"""
  }

  private def r3(d: Double): Double = math.rint(d * 1000) / 1000
}
