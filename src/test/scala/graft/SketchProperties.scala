package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.expressions.MGSummary

/** Property tests for the mergeable-sketch kernels (q41/s23): the
  * Misra–Gries guarantee — every item with true frequency > n/k
  * survives — must hold for ARBITRARY streams, arbitrary capacities,
  * and arbitrary splits of the stream across summaries merged
  * afterwards (Agarwal et al. PODS'12). A counter-example here is a
  * wrong heavy-hitter table at some adversarial data distribution the
  * fixed gate corpus can't represent. */
object SketchProperties extends Properties("MisraGries") {

  // skewed streams: a few hot items (low ids drawn often) + cold tail
  private val streamGen: Gen[List[Int]] = for {
    n <- Gen.choose(50, 600)
    items <- Gen.listOfN(n, Gen.frequency(
      (4, Gen.choose(0, 3)),       // hot candidates
      (2, Gen.choose(4, 15)),      // warm
      (3, Gen.choose(16, 10000)))) // cold tail, mostly unique
  } yield items

  private def heavyHitters(xs: List[Int], k: Int): Set[Int] = {
    val n = xs.size
    xs.groupBy(identity).collect { case (x, g) if g.size * k > n => x }.toSet
  }

  property("single summary keeps every true heavy hitter") =
    forAll(streamGen, Gen.choose(2, 12)) { (xs, k) =>
      val s = new MGSummary(k)
      xs.foreach(x => s.add(x.toString))
      val tracked = s.sortedEntries.map(_._1).toSet
      s.counts.size <= k &&
        heavyHitters(xs, k).forall(h => tracked.contains(h.toString))
    }

  property("any split + merge keeps every true heavy hitter") =
    forAll(streamGen, Gen.choose(2, 12), Gen.choose(0, 1 << 20)) { (xs, k, seed) =>
      // deterministic pseudo-random 3-way split of the SAME stream
      val parts = Array.fill(3)(List.newBuilder[Int])
      xs.zipWithIndex.foreach { case (x, i) =>
        parts((((i * 2654435761L + seed) >>> 16) % 3).toInt) += x
      }
      val summaries = parts.map { p =>
        val s = new MGSummary(k)
        p.result().foreach(x => s.add(x.toString))
        s
      }
      val merged = summaries.head
      summaries.tail.foreach(merged.mergeFrom)
      val tracked = merged.sortedEntries.map(_._1).toSet
      merged.counts.size <= k &&
        heavyHitters(xs, k).forall(h => tracked.contains(h.toString))
    }

  property("residual counts are lower bounds within n/k of truth") =
    forAll(streamGen, Gen.choose(2, 12)) { (xs, k) =>
      val s = new MGSummary(k)
      xs.foreach(x => s.add(x.toString))
      val exact = xs.groupBy(identity).map { case (x, g) => (x.toString, g.size.toLong) }
      s.sortedEntries.forall { case (t, c) =>
        val f = exact.getOrElse(t, 0L)
        c <= f && f - c <= xs.size.toLong / k
      }
    }
}
