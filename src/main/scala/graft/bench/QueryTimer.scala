package graft.bench

import org.apache.spark.sql.SparkSession

/** Builder-side iteration harness: time a named subset of the registered
  * queries (args = query names; prefix match allowed) with the same
  * methodology as Bench (noop sink, min over SPARK_GRAFT_TIMER_PASSES
  * passes, CacheScope cleared between queries) — so a single query can be
  * re-measured in seconds during optimization work instead of re-running
  * the whole 188-query suite. Optionally dumps `.explain("formatted")`
  * to SPARK_GRAFT_PLAN_DIR/<name>_<tag>.txt when the env var is set
  * (plan-evidence capture for the optimization record). Not part of the
  * driver contract; Bench remains the official surface. */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_TIMER_PASSES", "2").toInt
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val planTag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B hook for session-conf experiments, e.g.
    // SPARK_GRAFT_TIMER_CONF="spark.sql.join.preferSortMergeJoin=false,..."
    sys.env.get("SPARK_GRAFT_TIMER_CONF").foreach { kvs =>
      kvs.split(',').filter(_.contains("=")).foreach { kv =>
        val Array(a, b) = kv.split("=", 2)
        builder.config(a.trim, b.trim)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    locally {
      val tables = Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")
      tables.foreach { t =>
        try graft.Tables.t(spark, sfDir, t).limit(1).collect()
        catch { case _: Throwable => () }
      }
    }
    // per-query job/stage/task counters: the evidence for (or against)
    // the "job-count-bound at the local launch floor" diagnosis
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    // where the wall time goes: stage wall (submission→completion, includes
    // scheduling + codegen at first task), executor run time (real compute),
    // and the scheduler/deser overhead — the evidence separating
    // compute-bound from launch-floor-bound queries
    val stageWallMs = new java.util.concurrent.atomic.AtomicLong
    val runMs = new java.util.concurrent.atomic.AtomicLong
    val gapMs = new java.util.concurrent.atomic.AtomicLong // job submit → first stage submit etc.
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks.toLong)
        for (a <- s.stageInfo.submissionTime; b <- s.stageInfo.completionTime)
          stageWallMs.addAndGet(b - a)
        runMs.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
        gapMs.addAndGet(
          s.stageInfo.taskMetrics.executorDeserializeTime)
      }
    })
    val all = graft.SparkEntry.queries.toSeq.sortBy(_._1)
    val wanted =
      if (args.isEmpty) all
      else all.filter { case (n, _) => args.exists(a => n == a || n.startsWith(a)) }
    if (wanted.isEmpty) {
      System.err.println(s"[timer] no queries match ${args.mkString(",")}")
      sys.exit(2)
    }
    wanted.foreach { case (name, fn) =>
      planDir.foreach { d =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(d, s"${name}_$planTag.txt"), txt)
          graft.CacheScope.clear()
        } catch {
          case e: Throwable =>
            System.err.println(s"[timer] $name plan dump failed: ${e.getMessage}")
        }
      }
      val counts = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val walls = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val times = (1 to passes).map { _ =>
        val (w0, r0, g0) = (stageWallMs.get(), runMs.get(), gapMs.get())
        val (j0, s0, t0c) = (jobs.get(), stages.get(), tasks.get())
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
          catch {
            case e: Throwable =>
              System.err.println(s"[timer] $name failed: ${e.getMessage}")
              false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        graft.CacheScope.clear()
        counts += ((jobs.get() - j0, stages.get() - s0, tasks.get() - t0c))
        walls += ((stageWallMs.get() - w0, runMs.get() - r0, gapMs.get() - g0))
        if (ok) sec else Double.NaN
      }
      val fmt = times.map(t => f"$t%.2f").mkString(" ")
      val (j, st, tk) = counts.last
      val (sw, rn, gp) = walls.last
      println(f"[timer] $name%-34s min=${times.min}%.2f  passes=[$fmt]  " +
        f"jobs=$j stages=$st tasks=$tk stageWallMs=$sw execRunMs=$rn deserMs=$gp")
    }
    spark.stop()
  }
}
