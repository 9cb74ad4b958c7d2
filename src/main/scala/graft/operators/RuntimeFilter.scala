package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit bloom-filter runtime filtering: build a bloom filter over the
  * small (dimension/filtered) side's join key, broadcast it, and drop
  * big-side rows that cannot possibly match BEFORE the join's shuffle.
  *
  * This is the pattern behind Spark's own injected runtime filters
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`) and dynamic
  * partition pruning, exposed as an operator so a pipeline can apply it
  * where the optimizer can't see the opportunity (e.g. the small side is
  * the output of arbitrary transforms, or the join happens in a later
  * job entirely). At 100 TB the win is shuffle bytes: a 1% selective
  * dimension turns a full-table exchange of the fact side into ~1% + the
  * false-positive rate.
  *
  * Mechanics: `DataFrameStatFunctions.bloomFilter` builds the filter
  * distributed (treeAggregate over the key column — executors OR their
  * partial bit arrays); the driver holds only the final bits (~1.2 MB for
  * 1M keys at 1% fpp) which the probe UDF closure broadcasts once. False
  * positives pass the prefilter but are eliminated by the real join, so
  * the composed result is EXACTLY the plain join's — which is what lets
  * the plain-SQL oracle check the whole machinery. False negatives cannot
  * occur by bloom construction (property-tested in CurationSpec).
  */
object RuntimeFilter {

  /** Filter `big` to rows whose `bigKey` might be present in
    * `small`'s `smallKey` (bloom membership — may keep false positives,
    * never drops a true match). */
  def bloomPrefilter(
      big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types._
    // the probe must hash the same representation the build side put in:
    // stat.bloomFilter puts integral keys as longs and strings as UTF-8
    // bytes, so the key families must agree and the probe dispatches on
    // type — a blanket cast-to-long would silently drop every true match
    // for string keys (null after cast -> filtered).
    def family(dt: DataType): String = dt match {
      case ByteType | ShortType | IntegerType | LongType => "integral"
      case StringType => "string"
      case other => throw new IllegalArgumentException(
        s"bloomPrefilter supports integral and string keys, got $other")
    }
    val bigFam = family(big.schema(bigKey).dataType)
    val smallFam = family(small.schema(smallKey).dataType)
    require(bigFam == smallFam,
      s"join key families must match: $bigKey is $bigFam, $smallKey is $smallFam")
    val bf = small.stat.bloomFilter(smallKey, expectedItems, fpp)
    // primitive/String-arg UDFs: Spark null-checks the input, so null keys
    // null keys can never equi-join, so both probes drop them: the Long
    // path via Spark's automatic primitive null-check (null in -> null
    // out), the String path via an explicit guard (String is a reference
    // type — Spark passes null through, and mightContainString(null)
    // would NPE the task)
    bigFam match {
      case "integral" =>
        val mightContain = udf((k: Long) => bf.mightContainLong(k))
        big.filter(mightContain(col(bigKey).cast("long")))
      case _ =>
        val mightContain = udf((k: String) => k != null && bf.mightContainString(k))
        big.filter(mightContain(col(bigKey)))
    }
  }

  /** Inner equi-join with a bloom prefilter on the big side. Result is
    * exactly `big.join(small, bigKey == smallKey)` — the join clears any
    * bloom false positives. */
  def bloomPrefilteredJoin(
      big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val pre = bloomPrefilter(big, bigKey, small, smallKey, expectedItems, fpp)
    pre.join(small, pre(bigKey) === small(smallKey))
  }
}
