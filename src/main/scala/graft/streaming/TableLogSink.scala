package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TableLog

/** Exactly-once streaming append into a [[TableLog]] table.
  *
  * Structured Streaming's `foreachBatch` is at-least-once: after a crash
  * between sink write and checkpoint commit, recovery REPLAYS the last
  * micro-batch with the same batch id. The log absorbs the replay:
  * [[TableLog.appendExactlyOnce]] records the highest applied batch id
  * per writer stream in the commit metadata (`txn`), so the replayed
  * batch is recognized against the CURRENT snapshot and skipped — the
  * write and the dedup marker flip atomically on one log json, which is
  * exactly the transactional-sink contract Delta's `txnAppId`/`txnVersion`
  * option implements.
  *
  * Readers see each batch's rows in exactly one version; downstream
  * consumers can tail versions as an incremental feed. Combine with
  * [[TableLog.optimize]] for small-file compaction of long-running
  * streams and [[TableLog.vacuum]] for retention. */
object TableLogSink {

  /** Start the sink. `txnId` names this writer stream (one counter per
    * id — two different streams appending to one table don't interfere);
    * `checkpoint` is the Structured Streaming checkpoint location.
    * `optimizeEvery` > 0 runs [[TableLog.optimize]] after every Nth
    * applied batch (small-file compaction keeps pace with the stream;
    * a replayed batch skips its append AND its compaction — the
    * version chain stays deterministic). Old pre-compaction versions
    * remain readable until an explicit vacuum. */
  def start(df: DataFrame, dir: String, txnId: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      optimizeEvery: Int = 0,
      optimizeMaxRows: Long = 10000000L): StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val applied = TableLog.appendExactlyOnce(batch, dir, txnId, batchId)
        if (applied.isDefined && optimizeEvery > 0 &&
          batchId % optimizeEvery == (optimizeEvery - 1).toLong) {
          // compaction has guaranteed progress against concurrent
          // APPENDS: optimize rebases its commit over them internally
          // (appended files carry through untouched, never dropped).
          // The one remaining IllegalStateException is a TRUE conflict —
          // another compaction rewrote our input files first. Its work
          // is done for us; skip this round rather than kill the query
          // whose append already succeeded.
          try TableLog.optimize(batch.sparkSession, dir,
            maxRows = optimizeMaxRows)
          catch { case _: IllegalStateException => () }
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(trigger)
      .start()
}
