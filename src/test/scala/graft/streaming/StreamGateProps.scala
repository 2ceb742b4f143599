package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean
import java.util.concurrent.atomic.AtomicInteger

/** ScalaCheck properties for the stateful streaming gates: the
  * load-bearing claim is TRIGGER-BOUNDARY INVARIANCE — the same ordered
  * arrivals produce the same admissions/emissions no matter where the
  * micro-batch boundaries fall (a checkpoint restart, a backpressure
  * re-chunking, or a replay must never change what downstream saw).
  * Each case drives a real MemoryStream query per split, so case counts
  * stay small (the PackingProps budget); the reference semantics are
  * driver-side folds of the documented contracts. */
object StreamGateProps extends Properties("graft.streamgates") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.session
  import spark.implicits._
  private val nameCounter = new AtomicInteger(0)

  /** Run `f` over the batches through a memory-sink streaming query. */
  private def runStream[T: Encoder, U: Encoder](
      batches: Seq[Seq[T]], f: Dataset[T] => Dataset[U]): Seq[U] = {
    implicit val sqlCtx = spark.sqlContext
    val name = s"gateprops_${nameCounter.incrementAndGet()}"
    val input = MemoryStream[T]
    val q = f(input.toDS()).writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) input.addData(b: _*)
        q.processAllAvailable()
      }
      spark.table(name).as[U].collect().toSeq
    } finally q.stop()
  }

  /** Contiguous split of an ordered list at the given cut points. */
  private def splitAt[T](xs: List[T], cuts: List[Int]): Seq[Seq[T]] = {
    val cs = (cuts.map(c => math.min(math.max(c, 0), xs.size)).distinct.sorted :+ xs.size).distinct
    val (parts, rest, _) = cs.foldLeft((Vector.empty[Seq[T]], xs, 0)) {
      case ((acc, remaining, off), c) =>
        val (h, t) = remaining.splitAt(c - off)
        (acc :+ h, t, c)
    }
    (parts :+ rest).filter(_.nonEmpty)
  }

  private def cutsGen(n: Int): Gen[List[Int]] =
    Gen.listOfN(3, Gen.choose(0, n))

  // ---- budgetGate: admissions invariant + fold-exact ----
  private val budgetDocs: Gen[List[StreamOps.BudgetDoc]] = for {
    n <- Gen.choose(1, 25)
    rows <- Gen.listOfN(n, for {
      src <- Gen.oneOf("a", "b")
      tok <- Gen.choose(1L, 60L)
    } yield (src, tok))
  } yield rows.zipWithIndex.map { case ((s, t), i) => StreamOps.BudgetDoc(s, i.toLong, t) }

  property("budgetGate admissions are split-invariant and equal the prefix fold") =
    Prop.forAll(budgetDocs, Gen.choose(20L, 120L)) { (docs, budget) =>
      Prop.forAll(cutsGen(docs.size)) { cuts =>
        val whole = runStream(Seq(docs), (d: Dataset[StreamOps.BudgetDoc]) =>
          StreamOps.budgetGate(d, budget))
        val split = runStream(splitAt(docs, cuts), (d: Dataset[StreamOps.BudgetDoc]) =>
          StreamOps.budgetGate(d, budget))
        // driver fold of the documented contract: per-source docId-order
        // prefix positions, position advances over rejected docs
        val ref = docs.groupBy(_.source).toSeq.flatMap { case (src, ds) =>
          var cum = 0L
          ds.sortBy(_.docId).flatMap { d =>
            cum += d.nTokens
            if (cum <= budget) Some(StreamOps.AdmittedDoc(src, d.docId, d.nTokens, cum))
            else None
          }
        }.toSet
        (whole.toSet == ref) :| s"whole-batch run != fold" &&
          (split.toSet == ref) :| s"split run != fold (cuts $cuts)"
      }
    }

  // ---- cusumState: emissions invariant under splits AND stale replays ----
  private val revenueDays: Gen[List[StreamOps.DailyRevenue]] = for {
    n <- Gen.choose(1, 20)
    ys <- Gen.listOfN(n, Gen.choose(0L, 40L))
  } yield ys.zipWithIndex.map { case (y, d) => StreamOps.DailyRevenue("purchase", d.toLong, y) }

  property("cusumState emissions are split-invariant, replay-proof, fold-exact") =
    Prop.forAll(revenueDays, Gen.choose(5L, 25L), Gen.choose(5L, 40L)) { (days, target, h) =>
      Prop.forAll(cutsGen(days.size)) { cuts =>
        val targets = Map("purchase" -> (target, h))
        val batches = splitAt(days, cuts)
        // inject stale replays: each batch after the first re-sends the
        // previous batch's last day — must be refused, not re-emitted
        val withReplays = batches.zipWithIndex.map { case (b, i) =>
          if (i == 0) b else batches(i - 1).lastOption.toSeq ++ b
        }
        val whole = runStream(Seq(days), (d: Dataset[StreamOps.DailyRevenue]) =>
          StreamOps.cusumState(d, targets))
        val split = runStream(withReplays, (d: Dataset[StreamOps.DailyRevenue]) =>
          StreamOps.cusumState(d, targets))
        // closed-form reference: S = P − min(0, running min P)
        var p = 0L; var minP = 0L
        val ref = days.map { d =>
          p += d.y - target
          minP = math.min(minP, p)
          val s = p - math.min(0L, minP)
          StreamOps.CusumPoint("purchase", d.day, d.y, s, s > h)
        }
        (whole == ref) :| "whole-batch run != closed form" &&
          (split == ref) :| s"split+replay run != closed form (cuts $cuts)"
      }
    }

  // ---- mannKendallState / cusumMonitorState: the r13 GRID states.
  // Unlike cusumState's ordered fold, these absorb ANY arrival order
  // (per-day cells are plain sums), so the property is stronger:
  // final snapshot is invariant under PERMUTATION as well as split,
  // and equals the driver grid fold. ----
  private val dailyValues: Gen[List[StreamOps.DailyValue]] = for {
    n <- Gen.choose(6, 30)
    ds <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 9L), Gen.choose(1L, 500L)))
  } yield ds.map { case (d, c) => StreamOps.DailyValue("s", d, c) }

  private def permuted[T](xs: List[T], seed: Long): List[T] =
    xs.zipWithIndex.sortBy { case (_, i) => (i * 2654435761L + seed) % 1000003L }.map(_._1)

  property("mannKendallState final snapshot is split- AND permutation-invariant, grid-fold exact") =
    Prop.forAll(dailyValues, Gen.choose(0L, 1000L)) { (vals, seed) =>
      Prop.forAll(cutsGen(vals.size)) { cuts =>
        def mkRef(prefix: Seq[StreamOps.DailyValue]) = {
          val grid = prefix.groupBy(_.d).view.mapValues(_.map(_.cents).sum).toMap
          val days = grid.toSeq.sortBy(_._1)
          val n = days.size.toLong
          val s = (for { i <- days.indices; j <- (i + 1) until days.size }
            yield java.lang.Long.signum(days(j)._2 - days(i)._2).toLong).sum
          val ts = days.groupBy(_._2).map(_._2.size.toLong)
          val tie = ts.map(t => t * (t - 1) * (2 * t + 5)).sum
          val v18 = n * (n - 1) * (2 * n + 5) - tie
          if (n < 2 || v18 <= 0L)
            StreamOps.MkSnapshot("s", n, ts.size.toLong, s, tie, v18, 0L,
              java.lang.Long.signum(s).toLong, defined = false)
          else {
            val sd = math.sqrt(v18.toDouble / 18.0)
            val z = if (s > 0) (s - 1) / sd else if (s < 0) (s + 1) / sd else 0.0
            StreamOps.MkSnapshot("s", n, ts.size.toLong, s, tie, v18,
              math.floor(z * 1e6 + 0.5).toLong,
              java.lang.Long.signum(s).toLong, defined = true)
          }
        }
        val shuffled = permuted(vals, seed)
        val batches = splitAt(shuffled, cuts)
        val got = runStream(batches, (d: Dataset[StreamOps.DailyValue]) =>
          StreamOps.mannKendallState(d))
        val ref = mkRef(vals)
        // per-trigger snapshots equal the SHUFFLED prefixes' grid folds;
        // the final one equals the canonical-order fold (permutation
        // invariance: the grid doesn't know arrival order)
        val prefixesOk = batches.inits.toList.reverse.drop(1)
          .map(_.flatten).zip(got).forall { case (pfx, snap) => snap == mkRef(pfx) }
        prefixesOk :| s"a trigger diverged from its prefix grid fold (cuts $cuts)" &&
          (got.last == ref) :| s"final snapshot != canonical-order fold (seed $seed)"
      }
    }

  property("cusumMonitorState final snapshot is split- AND permutation-invariant, recurrence exact") =
    Prop.forAll(dailyValues, Gen.choose(0L, 1000L)) { (vals, seed) =>
      Prop.forAll(cutsGen(vals.size)) { cuts =>
        val B = 2
        def ref(prefix: Seq[StreamOps.DailyValue]) = {
          val grid = prefix.groupBy(_.d).view.mapValues(_.map(_.cents).sum).toMap
          val days = grid.toSeq.sortBy(_._1)
          if (days.size <= B)
            StreamOps.CusumSnapshot("s", days.size.toLong, 0L, 0L, 0L, 0L,
              alarmNow = false, defined = false)
          else {
            val mu0 = Math.floorDiv(days.take(B).map(_._2).sum, B.toLong)
            val slack = Math.floorDiv(mu0, 20L)
            val h = Math.floorDiv(mu0, 2L)
            var sp = 0L; var sn = 0L; var nA = 0L; var al = false
            days.drop(B).foreach { case (_, v) =>
              sp = math.max(0L, sp + v - mu0 - slack)
              sn = math.max(0L, sn + mu0 - slack - v)
              al = sp > h || sn > h
              if (al) nA += 1
            }
            StreamOps.CusumSnapshot("s", days.size.toLong, mu0, sp, sn, nA, al,
              defined = true)
          }
        }
        val shuffled = permuted(vals, seed)
        val batches = splitAt(shuffled, cuts)
        val got = runStream(batches, (d: Dataset[StreamOps.DailyValue]) =>
          StreamOps.cusumMonitorState(d, baselineDays = B))
        val prefixesOk = batches.inits.toList.reverse.drop(1)
          .map(_.flatten).zip(got).forall { case (pfx, snap) => snap == ref(pfx) }
        prefixesOk :| s"a trigger diverged from its prefix recurrence (cuts $cuts)" &&
          (got.last == ref(vals)) :| s"final snapshot != canonical-order recurrence (seed $seed)"
      }
    }

  // ---- heavyHittersState: MG theorems hold at every split ----
  private val tokenStreams: Gen[List[StreamOps.TokenArrival]] = for {
    n <- Gen.choose(10, 80)
    toks <- Gen.listOfN(n, Gen.frequency(
      (6, Gen.const("hot")), (3, Gen.const("warm")),
      (1, Gen.oneOf("c1", "c2", "c3", "c4", "c5", "c6"))))
  } yield toks.map(StreamOps.TokenArrival("s", _))

  property("heavyHittersState holds the MG containment+undercount theorems for any split") =
    Prop.forAll(tokenStreams, Gen.choose(2, 5)) { (toks, k) =>
      Prop.forAll(cutsGen(toks.size)) { cuts =>
        val snaps = runStream(splitAt(toks, cuts), (d: Dataset[StreamOps.TokenArrival]) =>
          StreamOps.heavyHittersState(d, k))
        val last = snaps.maxBy(_.nSeen)
        val counters = last.counters.split(",").filter(_.nonEmpty)
          .map { s => val Array(t, c) = s.split(":"); t -> c.toLong }.toMap
        val n = toks.size.toLong
        val freq = toks.groupBy(_.token).view.mapValues(_.size.toLong).toMap
        val bound = n / (k + 1)
        val contained = freq.filter(_._2 > bound).keys
          .forall(counters.contains) // freq > n/(k+1) ⇒ surfaced
        val undercount = counters.forall { case (t, c) =>
          c <= freq.getOrElse(t, 0L) && freq.getOrElse(t, 0L) - c <= bound
        }
        (last.nSeen == n) :| "final snapshot must cover the whole stream" &&
          contained :| "a guaranteed heavy hitter was dropped" &&
          undercount :| "counter exceeded true frequency or undercount bound"
      }
    }

  // ---- distinctSketchState: registers invariant under splits, order,
  // and replays — max-merge makes the WHOLE state (not just emissions)
  // trigger-boundary-invariant, a stronger claim than the gates above
  private val keyStreams: Gen[List[StreamOps.KeyArrival]] = for {
    n <- Gen.choose(1, 60)
    ks <- Gen.listOfN(n, Gen.choose(0L, 40L))
  } yield ks.map(k => StreamOps.KeyArrival("s", s"k$k"))

  property("distinctSketchState registers are split-, order-, and replay-invariant and prefix-exact") =
    Prop.forAll(keyStreams) { keys =>
      Prop.forAll(cutsGen(keys.size), Gen.choose(0L, Long.MaxValue)) { (cuts, seed) =>
        val batches = splitAt(keys, cuts)
        // each batch re-sends the previous batch's tail, shuffled by a
        // deterministic seed: at-least-once AND reorder, together
        val rnd = new scala.util.Random(seed)
        val withReplays = batches.zipWithIndex.map { case (b, i) =>
          val merged = (if (i == 0) b else batches(i - 1).takeRight(3) ++ b)
          rnd.shuffle(merged)
        }
        val snaps = runStream(withReplays, (d: Dataset[StreamOps.KeyArrival]) =>
          StreamOps.distinctSketchState(d))
        val last = snaps.maxBy(_.nSeen)
        val regs = keys.foldLeft(graft.functions.Hll.zero)((r, k) =>
          graft.functions.Hll.add(r, k.key))
        val (used, sumRank, maxRank, d, est) = graft.functions.Hll.summary(regs)
        ((last.regsUsed, last.sumRank, last.maxRank, last.denom, last.estMicro)
          == ((used, sumRank, maxRank, d, est))) :|
          s"final registers diverged from the clean fold (cuts $cuts)"
      }
    }

  // ---- hdrQuantileState: bucket table split/order-invariant, prefix-exact ----
  private val centStreams: Gen[List[StreamOps.ValueArrival]] = for {
    n <- Gen.choose(1, 60)
    vs <- Gen.listOfN(n, Gen.oneOf(Gen.choose(0L, 40L), Gen.choose(0L, 100000L)))
  } yield vs.map(StreamOps.ValueArrival("s", _))

  property("hdrQuantileState bucket table and quantiles are split- and order-invariant, prefix-exact") =
    Prop.forAll(centStreams) { vals =>
      Prop.forAll(cutsGen(vals.size), Gen.choose(0L, Long.MaxValue)) { (cuts, seed) =>
        val rnd = new scala.util.Random(seed)
        val batches = splitAt(vals, cuts).map(b => rnd.shuffle(b))
        val snaps = runStream(batches, (d: Dataset[StreamOps.ValueArrival]) =>
          StreamOps.hdrQuantileState(d))
        val last = snaps.maxBy(_.nSeen)
        // clean driver fold: plain-sum bucket counts + the q214 walk
        val tbl = vals.map(_.cents).groupBy(StreamOps.hdrBucket)
          .view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
        val n = vals.size.toLong
        val qs = Seq(50L, 90L, 95L, 99L).map { p =>
          val k = (p * n + 99L) / 100L
          var cum = 0L
          tbl.find { case (_, c) => cum += c; cum >= k }
            .fold(s"$p:$k:-1:-1:-1") { case (b, _) =>
              val (lo, hi) = StreamOps.hdrBounds(b); s"$p:$k:$b:$lo:$hi"
            }
        }.mkString(",")
        val want = tbl.map { case (b, c) => s"$b:$c" }.mkString(",")
        ((last.buckets == want) && (last.quantiles == qs) && (last.nSeen == n)) :|
          s"final sketch diverged from the clean fold (cuts $cuts): ${last.buckets} vs $want"
      }
    }

  // ---- funnelState: stage emissions split-invariant, replay-proof ----
  private val funnelStreams: Gen[List[StreamOps.FunnelEvent]] = for {
    n <- Gen.choose(1, 40)
    evs <- Gen.listOfN(n, for {
      u <- Gen.choose(0, 3)
      t <- Gen.choose(0L, 50L)
      e <- Gen.oneOf("view", "click", "purchase", "error")
    } yield (u, t, e))
  } yield evs.zipWithIndex
    .map { case ((u, t, e), i) => StreamOps.FunnelEvent(s"u$u", t, i.toLong, e) }
    .sortBy(e => (e.tsUs, e.eventId)) // in-order delivery, the documented precondition

  property("funnelState emissions are split-invariant, replay-proof, fold-exact") =
    Prop.forAll(funnelStreams) { evs =>
      Prop.forAll(cutsGen(evs.size)) { cuts =>
        val batches = splitAt(evs, cuts)
        // each batch re-delivers the previous batch's tail: at-least-once
        val withReplays = batches.zipWithIndex.map { case (b, i) =>
          if (i == 0) b else batches(i - 1).takeRight(3) ++ b
        }
        val got = runStream(withReplays, (d: Dataset[StreamOps.FunnelEvent]) =>
          StreamOps.funnelState(d))
          .map(s => (s.user, s.stage, s.tsUs)).sorted
        // sequential reference: the q106 chain folded in event order
        val want = evs.groupBy(_.user).toSeq.flatMap { case (u, es) =>
          var (tv, tc, tb) = (-1L, -1L, -1L)
          val out = Seq.newBuilder[(String, String, Long)]
          es.sortBy(e => (e.tsUs, e.eventId)).foreach { e =>
            e.etype match {
              case "view" if tv < 0 => tv = e.tsUs; out += ((u, "view", e.tsUs))
              case "click" if tv >= 0 && tc < 0 && e.tsUs > tv =>
                tc = e.tsUs; out += ((u, "click", e.tsUs))
              case "purchase" if tc >= 0 && tb < 0 && e.tsUs > tc =>
                tb = e.tsUs; out += ((u, "purchase", e.tsUs))
              case _ => ()
            }
          }
          out.result()
        }.sorted
        (got == want) :| s"funnel emissions diverged (cuts $cuts): $got vs $want"
      }
    }

  // ---- alertState: fired/resolved edges invariant, replay-proof ----
  private val predRuns: Gen[List[Boolean]] = for {
    n <- Gen.choose(3, 25)
    ps <- Gen.listOfN(n, Gen.oneOf(true, false))
  } yield ps

  property("alertState edges are split-invariant, replay-proof, island-exact") =
    Prop.forAll(predRuns, Gen.choose(0L, 4L)) { (preds, forTicks) =>
      Prop.forAll(cutsGen(preds.size)) { cuts =>
        val forSec = forTicks * 60L
        val ticks = preds.zipWithIndex.map { case (p, i) =>
          StreamOps.AlertTick("r", i * 60L, p)
        }.toList
        val batches = splitAt(ticks, cuts)
        val withReplays = batches.zipWithIndex.map { case (b, i) =>
          if (i == 0) b else batches(i - 1).takeRight(1) ++ b
        }
        val got = runStream(withReplays, (d: Dataset[StreamOps.AlertTick]) =>
          StreamOps.alertState(d, Map("r" -> forSec)))
          .map(e => (e.ts, e.event))
        // island fold: fire once a true-run holds forSec, resolve on the
        // first false tick while firing
        var runStart = -1L; var firing = false
        val ref = ticks.flatMap { t =>
          if (t.pred) {
            if (runStart < 0) runStart = t.ts
            if (!firing && t.ts - runStart >= forSec) {
              firing = true; Some((t.ts, "fired"))
            } else None
          } else {
            val out = if (firing) Some((t.ts, "resolved")) else None
            runStart = -1L; firing = false
            out
          }
        }
        (got == ref) :| s"edges diverged from island fold (cuts $cuts): got $got want $ref"
      }
    }
}
