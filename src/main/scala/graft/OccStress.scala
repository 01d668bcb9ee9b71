package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import graft.operators.OccCommitLog

/** Dev measurement: the optimistic-concurrency commit protocol's
  * metadata costs, priced in isolation (no Spark jobs in any timed
  * region — the protocol's whole claim is that arbitration costs log
  * writes, not index bytes, and these numbers are that claim).
  *
  * Four measured rows per log size N:
  *   - sequential commits: one writer appending N commits (the ingest
  *     daemon's steady-state arbitration overhead per batch);
  *   - contended commits: W barrier-released writers splitting the
  *     same N commits on ONE log, with the total attempt count — the
  *     conflict tax of the lock-free retry (each conflict means
  *     another writer made progress, so attempts/commit bounds the
  *     wasted work);
  *   - read at N, raw log: list + parse N one-line files — the cost
  *     that grows with history and motivates checkpoints;
  *   - read at N after checkpoint + cleanLog: one checkpoint file —
  *     the bounded steady state (Delta's N.checkpoint economics).
  *
  * Usage: runMain graft.OccStress [nCsv] [writers]
  * Results recorded in PERF.md. */
object OccStress {
  def main(args: Array[String]): Unit = {
    val ns = (if (args.length > 0) args(0) else "100,400")
      .split(",").map(_.trim.toInt).toSeq
    val writers = if (args.length > 1) args(1).toInt else 4
    // a session only for the Hadoop conf (no jobs run in timed regions)
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val conf = spark.sessionState.newHadoopConf()

    def freshLog(tag: String): (org.apache.hadoop.fs.FileSystem, String) = {
      val root = graft.queries.PipelineQueries.staging(s"occst$tag", "stress")
      val fs = new Path(root).getFileSystem(conf)
      fs.delete(new Path(root), true)
      (fs, s"$root/log")
    }
    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    ns.foreach { n =>
      // sequential
      val (fs1, log1) = freshLog(s"seq$n")
      val (_, tSeq) = timed {
        (0 until n).foreach(i =>
          OccCommitLog.commit(fs1, log1, "segment", s"p$i"))
      }
      // contended: W writers, one log, total attempts counted via a
      // wrapper loop around tryCommit (commit() hides its retries)
      val (fs2, log2) = freshLog(s"con$n")
      val attempts = new java.util.concurrent.atomic.AtomicLong(0)
      val barrier = new java.util.concurrent.CyclicBarrier(writers)
      val per = n / writers
      val (_, tCon) = timed {
        val ts = (0 until writers).map { w =>
          new Thread(() => {
            barrier.await()
            (0 until per).foreach { i =>
              var done = false
              while (!done) {
                val next = OccCommitLog.read(fs2, log2)
                  .lastOption.map(_.version + 1).getOrElse(0)
                attempts.incrementAndGet()
                done = OccCommitLog.tryCommit(fs2, log2, next, "segment", s"w$w-$i")
              }
            }
          })
        }
        ts.foreach(_.start()); ts.foreach(_.join())
      }
      val committed = OccCommitLog.read(fs2, log2).size
      require(committed == per * writers, s"lost commits: $committed")
      // the maintained daemon: same sequential appends with a
      // checkpoint + cleanup every 50 commits — each commit's tail
      // read is then O(since-checkpoint), so the rate stays flat
      // where the raw log's O(n) read makes appending O(n²) total
      val (fs3, log3) = freshLog(s"ck$n")
      val (_, tSeqCk) = timed {
        (0 until n).foreach { i =>
          OccCommitLog.commit(fs3, log3, "segment", s"p$i")
          if ((i + 1) % 50 == 0) {
            OccCommitLog.checkpoint(fs3, log3)
            OccCommitLog.cleanLog(fs3, log3)
          }
        }
      }
      // the replayed writer: N txn-carrying commits on a maintained
      // log (checkpoint+cleanup every 50), then the FULL replay —
      // every commit resolved to a skip through the txn action. The
      // recovery path's cost is log READS only, so it stays flat for
      // the same reason the maintained append does: this prices
      // exactly-once restart, the claim behind s41/s42's post-drain
      // replays
      val (fs4, log4) = freshLog(s"txn$n")
      (0 until n).foreach { i =>
        OccCommitLog.commit(fs4, log4, "segment", s"p$i",
          txn = Some(("w", i.toLong)))
        if ((i + 1) % 50 == 0) {
          OccCommitLog.checkpoint(fs4, log4)
          OccCommitLog.cleanLog(fs4, log4)
        }
      }
      val (_, tReplay) = timed {
        (0 until n).foreach(i =>
          OccCommitLog.commit(fs4, log4, "segment", s"p$i",
            txn = Some(("w", i.toLong))))
      }
      require(OccCommitLog.read(fs4, log4).size == n, "replay moved the log")
      // read costs: raw vs checkpointed
      val (_, tReadRaw) = timed { OccCommitLog.read(fs1, log1).size }
      OccCommitLog.checkpoint(fs1, log1)
      OccCommitLog.cleanLog(fs1, log1)
      val (_, tReadCp) = timed { OccCommitLog.read(fs1, log1).size }
      println(f"[occstress] n=$n%d seq=${tSeq}%.3fs (${n / tSeq}%.0f c/s) " +
        f"seq+ckpt50=${tSeqCk}%.3fs (${n / tSeqCk}%.0f c/s) " +
        f"contended(w=$writers)=${tCon}%.3fs (${committed / tCon}%.0f c/s, " +
        f"attempts=${attempts.get()}%d = ${attempts.get().toDouble / committed}%.2f/commit) " +
        f"replay=${tReplay}%.3fs (${n / tReplay}%.0f skips/s) " +
        f"read_raw=${tReadRaw * 1000}%.1fms read_ckpt=${tReadCp * 1000}%.1fms")
    }
    spark.stop()
  }
}
