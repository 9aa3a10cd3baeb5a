package graft
import org.apache.spark.sql.SparkSession

/** In-session A/B decomposition of the st23/st24 slice-compaction cost:
  * replays each MV at compactEvery ∈ {2 (mid+close, the declared
  * cadence), 4 (close only), never} three times in ONE JVM, so the
  * numbers are immune to the cross-session ambient noise that makes
  * wall-clock bench deltas under ~20% unreadable (PLANS.md envelope).
  * Used to size `compactEvery` against a replay's batch count: each
  * cycle is a roughly fixed overhead (sentinel-collect job + one
  * exchange / 3 windows / 2 sorts over the state), so production
  * cadences amortize it to nothing while 4-batch replays pay ~25%. */
object CompactCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config(graft.streaming.EventStream.ReplayPartitionsKey, "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = args.headOption.getOrElse("/root/testdata/sf0.1/events.parquet")
    def time(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[probe] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // one untimed warm pass per runner (plan analysis, codegen, JIT)
    graft.streaming.EventStream.runDrawdownMvOnce(spark, path).count()
    graft.streaming.EventStream.runAutocorrMvOnce(spark, path).count()
    for (rep <- 1 to 3; (tag, ce) <- Seq(
        ("dd_every2", 2), ("dd_closeOnly", 4), ("dd_never", Int.MaxValue))) {
      time(s"$tag#$rep") {
        graft.streaming.EventStream.runDrawdownMvOnce(spark, path, compactEvery = ce).count()
      }
    }
    for (rep <- 1 to 3; (tag, ce) <- Seq(
        ("ac_every2", 2), ("ac_closeOnly", 4), ("ac_never", Int.MaxValue))) {
      time(s"$tag#$rep") {
        graft.streaming.EventStream.runAutocorrMvOnce(spark, path, compactEvery = ce).count()
      }
    }
    spark.stop()
  }
}
