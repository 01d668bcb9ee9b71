package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.queries.AnalyticsQueries

/** Property: the composed serving stack is PER-QUERY DECOMPOSABLE —
  * for ANY partition of the query set into batches, the union of
  * per-batch stack serves is row-identical to the one-shot run. This
  * is the invariant s26's correctness rides on (its gate pins one
  * fixed 4-batch split; this pins the quantifier the scaladoc argues:
  * every stage — keyword probe, RRF fusion, MMR greedy, MaxSim
  * re-rank — ranks each query against the FROZEN indexes alone, so
  * batch boundaries cannot leak between queries). The generator draws
  * random assignments of the 10 query ids to 1–3 batches, including
  * the degenerate all-in-one batch (= the one-shot replay) and
  * singleton batches. */
object StackDecomposabilityProperties extends Properties("ServedStack") {

  // each case runs the full four-index stack once per batch — cap the
  // case count so the suite stays seconds, not minutes
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(5).withWorkers(1)

  private lazy val spark = GraftSession.local(cores = 4, shufflePartitions = 4)
  private val dir = "/root/testdata/sf0.001"

  /** Run the stack for the given query ids and CONSUME the result
    * (constructing the next stack releases this one's pinned
    * intermediates — ServingPins generations). */
  private def serveStack(ids: Seq[Long]): Seq[(Long, Int, Long, Long)] = {
    import spark.implicits._
    val qdocs = Tables.documents(spark, dir)
      .filter(col("doc_id").isin(ids: _*))
      .select(col("doc_id"), col("text"))
    val stages = AnalyticsQueries.servingStackStagesFor(spark, dir, qdocs)
    stages.dropRight(1).foreach(_._2())
    stages.last._2().as[(Long, Int, Long, Long)].collect().toSeq
  }

  private lazy val oneShot: Set[(Long, Int, Long, Long)] =
    serveStack(0L until 10L).toSet

  private val partitionGen: Gen[Seq[Seq[Long]]] =
    Gen.listOfN(10, Gen.choose(0, 2)).map { labels =>
      (0L until 10L).zip(labels).groupBy(_._2).values
        .map(_.map(_._1).toSeq).toSeq
    }

  property("union of per-batch serves == one-shot, for ANY query partition") =
    forAll(partitionGen) { batches =>
      val union = batches.flatMap(serveStack)
      union.size == oneShot.size && union.toSet == oneShot
    }
}
