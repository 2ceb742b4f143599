package graft
import org.apache.spark.sql.SparkSession

/** Dev micro-timer for ONE query: cold prime + 5 timed reps under the
  * bench session config. `sbt "runMain graft.QTime <name> <sfDir>"` —
  * for isolating a single query's cost without the full Bench sweep. */
object QTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = args(0); val dir = args(1)
    (1 to 6).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      println(s"[qtime] rep$i ${(System.nanoTime() - t0) / 1e9}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
