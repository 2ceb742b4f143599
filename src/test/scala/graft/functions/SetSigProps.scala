package graft.functions

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck properties for the 256-bit set signature powering q118's
  * exact candidate filter. The load-bearing claim is SOUNDNESS:
  * popcount(sig(A) ⊕ sig(B)) ≤ |A Δ B| for ALL sets — an element in
  * A Δ B flips at most one bit, an element shared (or colliding) can
  * only clear one. If this ever failed, the filter would silently drop
  * true near-duplicate pairs, which is exactly the bug class the
  * superset oracle cannot see (it verifies no pair is INVENTED, not
  * that none is lost — the brute-force SimJoinExactSpec covers loss
  * end-to-end, this covers it at the kernel level for arbitrary sets,
  * not just the corpus). Pure JVM eval — the codegen path is pinned by
  * the corpus spec running through the real session. */
object SetSigProps extends Properties("graft.setsig") {

  private def sig(xs: Set[Long]): Array[Long] = {
    val words = new Array[Long](4)
    xs.foreach { h => val b = (h & 255L).toInt; words(b >> 6) |= (1L << (b & 63)) }
    words
  }
  private def xorPop(a: Array[Long], b: Array[Long]): Int =
    (0 until 4).map(i => java.lang.Long.bitCount(a(i) ^ b(i))).sum

  // small element domain forces heavy collisions — the adversarial case
  private val sets: Gen[Set[Long]] = for {
    n <- Gen.choose(0, 120)
    xs <- Gen.listOfN(n, Gen.choose(-512L, 512L))
  } yield xs.toSet

  property("xor-popcount never exceeds the symmetric difference") =
    Prop.forAll(sets, sets) { (a, b) =>
      val d = (a diff b).size + (b diff a).size
      val p = xorPop(sig(a), sig(b))
      (p <= d) :| s"popcount $p > |A delta B| $d"
    }

  property("identical sets have xor-popcount zero") =
    Prop.forAll(sets) { a => xorPop(sig(a), sig(a)) == 0 }

  property("matches the Catalyst expression's eval on the same input") =
    Prop.forAll(sets) { a =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(a.toArray)
      val viaExpr = SetSig256(org.apache.spark.sql.catalyst.expressions.Literal(
          arr, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
      viaExpr.sameElements(sig(a))
    }
}
