package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway round-16 measurement probe (not part of the driver
  * contract; deleted at round end). */
object Probe16 {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.documents(s, dir)
    val withSh = docs.withColumn("tk", graft.llm.TextOps.tokens(col("text")))
      .filter(size(col("tk")) >= 2)
      .withColumn("sset", array_distinct(graft.llm.TextOps.bigrams(col("tk"))))
      .withColumn("hh", array_distinct(transform(col("sset"), t => graft.llm.TextOps.rollingHash(t))))
    val sigs = withSh.select(col("doc_id"), col("hh"),
      call_function("minhash_sigs", col("hh")).as("sig")).cache()
    println("DOCS=" + sigs.count())
    val nb = graft.functions.MinHashParams.planBands(16, 0.4)._1
    println("BANDS=" + nb)
    val bandArr = array((0 until nb).map { j =>
      struct(lit(j).as("band_id"), col("sig").getItem(2 * j).as("k0"),
        col("sig").getItem(2 * j + 1).as("k1")) }: _*)
    val b = sigs.select(col("doc_id"), explode(bandArr).as("x"))
      .select(col("doc_id"), col("x.band_id"), col("x.k0"), col("x.k1"))
    val cand = b.as("x").join(b.as("y"),
      col("x.band_id") === col("y.band_id") && col("x.k0") === col("y.k0") &&
        col("x.k1") === col("y.k1") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("lo"), col("y.doc_id").as("hi"))
    println("CANDROWS=" + cand.count())
    val candD = cand.distinct()
    println("CANDPAIRS=" + candD.count())
    val sa = sigs.select(col("doc_id").as("lo"), col("hh").as("set_a"))
    val sb2 = sigs.select(col("doc_id").as("hi"), col("hh").as("set_b"))
    val ver = candD.join(sa, "lo").join(sb2, "hi")
      .withColumn("inter", size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("j", floor(col("inter").cast("double") /
        (size(col("set_a")) + size(col("set_b")) - col("inter")) * 10000.0 + 0.5) / 10000.0)
    println("VERIFIED=" + ver.filter(col("j") >= 0.4).count())
    println("AVGHH=" + sigs.agg(avg(size(col("hh")))).head.getDouble(0))
    s.stop()
  }
}
