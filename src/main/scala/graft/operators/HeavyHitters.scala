package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One reported heavy hitter: estimated count and maximum overestimate.
  * Invariant: trueCount <= cnt <= trueCount + err. */
case class HeavyHitter(key: String, cnt: Long, err: Long)

/** Space-Saving heavy-hitters sketch (Metwally, Agrawal, El Abbadi '05)
  * as a typed Spark `Aggregator` — the missing approx-top-k: a bounded
  * summary of the most frequent values of a string column.
  *
  *  - **Bounded**: at most `capacity` counters per partial aggregate,
  *    regardless of input cardinality — safe at any scale.
  *  - **Mergeable**: partials combine associatively, so Spark runs it as
  *    a map-side partial aggregation + one reduce — the same execution
  *    shape as a built-in agg, never a full groupBy of the raw column.
  *  - **Guarantees**: every key with true frequency > N/capacity is in
  *    the sketch; reported cnt overestimates by at most err; with
  *    capacity >= distinct(keys) the sketch is EXACT (err = 0) — which
  *    is what lets the `topk_heavy` query be DuckDB-oracle-checked.
  *
  * Use via `functions.udaf(new HeavyHitters(k, capacity), Encoders.STRING)`.
  */
class HeavyHitters(k: Int, capacity: Int)
    extends Aggregator[String, Map[String, (Long, Long)], Seq[HeavyHitter]] {
  require(k > 0 && capacity >= k, "need capacity >= k > 0")

  override def zero: Map[String, (Long, Long)] = Map.empty

  // NULL is its own group, exactly as SQL GROUP BY treats it (merging it
  // with "" would both miscount and hash-mismatch the oracle). Orderings
  // must therefore be null-safe: NULL sorts first among equal counts.
  private def keyOrd(key: String): (Boolean, String) =
    (key != null, if (key == null) "" else key)

  override def reduce(
      b: Map[String, (Long, Long)], key: String): Map[String, (Long, Long)] = {
    b.get(key) match {
      case Some((c, e)) => b.updated(key, (c + 1, e))
      case None if b.size < capacity => b.updated(key, (1L, 0L))
      case None =>
        // evict the minimum counter; the newcomer inherits its count as
        // the classic overestimate bound
        val (mk, (mc, _)) = b.minBy { case (key2, (c, _)) => (c, keyOrd(key2)) }
        (b - mk).updated(key, (mc + 1, mc))
    }
  }

  override def merge(
      a: Map[String, (Long, Long)], b: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
    // Mergeable-summaries combine (Agarwal et al. '12): a key absent from
    // a sketch may have been evicted there after accumulating up to that
    // sketch's MIN counter — charge absent keys that min as both estimate
    // and error, so cnt >= true and cnt - err <= true survive the merge.
    // A sketch that never filled to capacity evicted nothing: its min
    // charge is 0 and the merge degenerates to the exact counter sum.
    val minA = if (a.size < capacity) 0L else a.valuesIterator.map(_._1).min
    val minB = if (b.size < capacity) 0L else b.valuesIterator.map(_._1).min
    val merged = (a.keySet ++ b.keySet).iterator.map { key2 =>
      val (c1, e1) = a.getOrElse(key2, (minA, minA))
      val (c2, e2) = b.getOrElse(key2, (minB, minB))
      key2 -> (c1 + c2, e1 + e2)
    }.toMap
    if (merged.size <= capacity) merged
    else merged.toSeq
      .sortBy { case (key2, (c, _)) => (-c, keyOrd(key2)) }
      .take(capacity).toMap
  }

  override def finish(b: Map[String, (Long, Long)]): Seq[HeavyHitter] =
    b.toSeq.sortBy { case (key2, (c, _)) => (-c, keyOrd(key2)) }
      .take(k).map { case (key2, (c, e)) => HeavyHitter(key2, c, e) }

  override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
    Encoders.kryo[Map[String, (Long, Long)]]

  override def outputEncoder: Encoder[Seq[HeavyHitter]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HeavyHitter]]()
}
