package graft.sources

/** S2 — size-bounded greedy first-fit batching of a listing
  * (reference: aws_utils.py:27-45). Spark's own scan packing
  * (`spark.sql.files.maxPartitionBytes` + `openCostInBytes`) implements
  * the same greedy shape for file sources; this utility exists for
  * (a) parity tests pinning the exact reference semantics, including
  * the `>=` threshold and the oversized-singleton case, (b) batch
  * assignment over driver-side listings (metadata-scale input), and
  * (c) executor-side per-shard sequence packing (t11: one fold per
  * `flatMapGroups` group — O(1) working memory, shards in parallel).
  */
object GreedyBatcher {

  /** Assign a batch id to each item, in input order. Semantics mirror
    * the reference exactly:
    *   - a new batch starts when `acc + size >= cap`;
    *   - if the current batch is empty, the item is an oversized
    *     singleton (its own batch, accumulator untouched);
    *   - otherwise the triggering item opens the next batch.
    */
  def assign(sizes: Seq[Long], cap: Long): Seq[Int] = {
    val out = new Array[Int](sizes.length)
    var batch = 0
    var acc = 0L
    var i = 0
    var nonEmpty = false
    while (i < sizes.length) {
      val s = sizes(i)
      if (acc + s >= cap) {
        if (!nonEmpty) {
          out(i) = batch // oversized singleton
          batch += 1
        } else {
          batch += 1
          out(i) = batch
          acc = s
          // batch now holds the triggering item only
          nonEmpty = true
        }
      } else {
        out(i) = batch
        acc += s
        nonEmpty = true
      }
      i += 1
    }
    out.toSeq
  }

  /** Batches as (batchIndices, batchBytes), reference return shape. */
  def batches(sizes: Seq[Long], cap: Long): Seq[(Seq[Int], Long)] = {
    val ids = assign(sizes, cap)
    sizes.indices.groupBy(ids).toSeq.sortBy(_._1)
      .map { case (_, idx) => (idx.map(identity), idx.map(sizes).sum) }
  }
}
