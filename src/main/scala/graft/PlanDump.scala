package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Writes `explain("formatted")` for the named queries to
  * `<outDir>/<query>_<suffix>.txt` — the per-query before/after plan
  * evidence for the optimization rounds (the `Plans` main serves the
  * PLANS.md headline record; this one captures arbitrary queries at a
  * labelled point in time so a plan diff can be committed next to the
  * change it documents).
  *
  * Run: `sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> q1,q2,..."`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "usage: PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>")
    val Array(sfDir, outDir, suffix, qcsv) = args
    val names = qcsv.split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), formatted)
      println(s"[plandump] $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
