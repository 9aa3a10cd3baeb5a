package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev profiler for the optimization rounds: run each declared query once
  * (after one untimed warm pass) and report per-query Spark JOB / STAGE /
  * TASK counts plus wall time — the fixed-overhead census. A query whose
  * time is dominated by job count (many tiny actions / materializations)
  * optimizes differently from one dominated by one heavy stage.
  *
  * Usage: sbt "runMain graft.DevJobStats [q1 q2 ...]"   (no args = all)
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 8).
  * Output: TSV lines `name  sec  jobs  stages  tasks` on stdout, also
  * written to /tmp/jobstats.tsv.
  */
object DevJobStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config(graft.streaming.EventStream.ReplayPartitionsKey, "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    })
    val all = (SparkEntry.queries ++ graft.queries.BenchOps.ops).toSeq.sortBy(_._1)
    val queries = if (args.nonEmpty) {
      val keep = args.toSet
      all.filter(q => keep.contains(q._1))
    } else all
    // warm pass
    queries.foreach { case (_, fn) =>
      try Bench.exec(fn(spark, sfDir)) catch { case _: Throwable => () }
    }
    val sb = new StringBuilder
    queries.foreach { case (name, fn) =>
      // drain the listener bus so prior-query events don't bleed in
      org.apache.spark.sql.graftbridge.Bridge.waitListenerBus(spark)
      val (j0, s0, t0) = (jobs.get, stages.get, tasks.get)
      val start = System.nanoTime()
      try Bench.exec(fn(spark, sfDir)) catch { case _: Throwable => () }
      val sec = (System.nanoTime() - start) / 1e9
      org.apache.spark.sql.graftbridge.Bridge.waitListenerBus(spark)
      val line = f"$name\t$sec%.3f\t${jobs.get - j0}\t${stages.get - s0}\t${tasks.get - t0}"
      println(line); sb.append(line).append('\n')
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/jobstats.tsv"), sb.toString)
    spark.stop()
  }
}
