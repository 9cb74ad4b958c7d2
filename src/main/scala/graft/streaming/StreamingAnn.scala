package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame

/** Streaming ANN — online retrieval against a persisted IVF index
  * ([[graft.operators.Similarity.writeIvfIndex]]): each micro-batch of
  * query vectors is scored with the indexed probe path and handed to the
  * caller's sink. The deployment shape of "embed the incoming request,
  * fetch its neighbors" on a Structured Streaming pipeline.
  *
  * Why a foreachBatch adapter and NOT an in-stream stream-static join:
  * the indexed path's whole point is that a query batch reads ONLY its
  * probed cells — `ivfTopKIndexed` collects the batch's probed cell ids
  * (bounded: ≤ nlist ints) and states them as a literal partition
  * IN-filter, so the corpus scan prunes to nprobe/nlist of the index
  * per batch. A stream-static join on `cell` cannot do that: the probed
  * set isn't known at plan time, so every micro-batch would rescan the
  * FULL index — the difference between touching 1/16th of 100 TB and
  * all of it, every trigger. Per-query top-k ranking (a rank window)
  * is also batch-only; inside foreachBatch both come for free, and the
  * per-batch driver work stays bounded (centroid load + one cell-id
  * collect).
  *
  * State: none — scoring is stateless per batch, so there is no state
  * store, no watermark requirement, and exactly-once lands on the
  * sink's own idempotence (foreachBatch re-delivers a batch id on
  * recovery; parquet-append sinks should key on `batchId`).
  *
  * Usage:
  * {{{
  * queries.writeStream
  *   .foreachBatch(StreamingAnn.topKIndexedBatches(idxPath, "query_id", "qv",
  *     k = 5, nprobe = 4) { (scored, batchId) =>
  *       scored.write.mode("append").parquet(outDir) })
  *   .trigger(Trigger.AvailableNow()).start()
  * }}}
  */
object StreamingAnn {

  /** Build the `foreachBatch` function: score each micro-batch of
    * `(qId, qVec)` rows against the stored index at `path` and pass the
    * ranked `(query_id, corpus_id, cosine, rank)` result to `sink` with
    * the micro-batch id. Same semantics/columns as
    * [[graft.operators.Similarity.ivfTopKIndexed]]; at nprobe = nlist
    * the per-batch answer is exact (every cell probed). */
  def topKIndexedBatches(
      path: String, qId: String, qVec: String, k: Int, nprobe: Int)(
      sink: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      // an empty trigger has no probed cells and nothing to rank — skip
      // the index read entirely instead of planning a no-op scan
      if (!batch.isEmpty)
        sink(Similarity.ivfTopKIndexed(batch, qId, qVec, path, k, nprobe), batchId)
    }
}
