package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared MinHash permutation parameters: h_i(x) = (a_i·x + b_i) mod P,
  * generated deterministically (splitmix64) so the Spark expression and
  * the generated DuckDB oracle SQL use the SAME constants. */
object MinHashParams {
  val P = 1000000007L
  val NumSig = 16
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  val ab: IndexedSeq[(Long, Long)] = (0 until NumSig).map { i =>
    (((mix64(2 * i + 1) & Long.MaxValue) % (P - 1)) + 1, (mix64(2 * i + 2) & Long.MaxValue) % P)
  }
  val aArr: Array[Long] = ab.map(_._1).toArray
  val bArr: Array[Long] = ab.map(_._2).toArray

  /** P(two docs with Jaccard `s` share at least one of `b` bands of `r`
    * rows) — the LSH S-curve 1 − (1 − s^r)^b (MMDS §3.4.2). */
  def candidateProb(s: Double, bands: Int, rows: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, rows), bands)

  /** The similarity where the S-curve rises steepest, ≈ (1/b)^(1/r) —
    * the de-facto "threshold" of a banding. */
  def bandingThreshold(bands: Int, rows: Int): Double =
    math.pow(1.0 / bands, 1.0 / rows)

  /** Choose (bands, rowsPerBand) for a target Jaccard threshold: among
    * the factorizations b·r = nSig, take the banding whose S-curve
    * threshold is closest to the target WITHOUT exceeding it (MMDS
    * §3.4.3: sit slightly below the target so true near-dups at the
    * threshold are still likely candidates; false positives this
    * admits are killed by the exact verify stage, false negatives are
    * gone forever — the asymmetry that rules out thresholds above the
    * target). Falls back to the most-selective banding below 1.0 when
    * every threshold overshoots (tiny signatures + low targets). */
  def planBands(nSig: Int, threshold: Double): (Int, Int) = {
    require(nSig > 0, s"signature length must be positive, got $nSig")
    require(threshold > 0.0 && threshold < 1.0,
      s"threshold must be in (0, 1), got $threshold")
    val options = (1 to nSig).filter(nSig % _ == 0)
      .map(b => (b, nSig / b))
    val below = options.filter { case (b, r) => bandingThreshold(b, r) <= threshold }
    if (below.nonEmpty) below.maxBy { case (b, r) => bandingThreshold(b, r) }
    else options.filter { case (b, _) => b > 1 } // exclude the useless single-band id map
      .minBy { case (b, r) => bandingThreshold(b, r) }
  }

  /** False-positive / false-negative areas of a banding against a
    * target threshold (midpoint rule): FP = expected candidate mass
    * below the threshold (wasted verify work), FN = expected missed
    * mass above it (lost duplicates). Diagnostic for sizing nSig. */
  def bandingProfile(bands: Int, rows: Int, threshold: Double,
      steps: Int = 2000): (Double, Double) = {
    var fp = 0.0
    var fn = 0.0
    var i = 0
    while (i < steps) {
      val s = (i + 0.5) / steps
      val p = candidateProb(s, bands, rows)
      if (s < threshold) fp += p else fn += 1.0 - p
      i += 1
    }
    (fp / steps, fn / steps)
  }
}

/** All 16 MinHash signature values in ONE pass over the hash array.
  *
  * The composable form — 16 × `array_min(transform(hh, …))` — walks the
  * array 16 times and materializes 16 intermediate arrays per row. This
  * expression keeps 16 running minima in registers while scanning the
  * input once, inside whole-stage codegen. Returns array<long> of
  * length 16 (null for an empty input, matching array_min-of-empty). */
case class MinHashSigsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sigs expects array<bigint>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return null
    val k = MinHashParams.NumSig
    val a = MinHashParams.aArr
    val b = MinHashParams.bArr
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < k) {
        val v = (a(i) * h + b(i)) % MinHashParams.P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", MinHashParams.aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhB", MinHashParams.bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $c.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[${MinHashParams.NumSig}];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $h = $c.getLong($j);
         |    for (int $i = 0; $i < ${MinHashParams.NumSig}; $i++) {
         |      long $v = ($aRef[$i] * $h + $bRef[$i]) % ${MinHashParams.P}L;
         |      if ($v < $mins[$i]) $mins[$i] = $v;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigsExpr =
    copy(child = newChild)
}
