package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Curation

/** The batch-serving amortization claim, measured (r17): N hybrid-band
  * query term sets answered as N [[Curation.bm25SearchIndexed]] calls
  * (one snapshot-gated listing + one pruned scan EACH) vs ONE
  * [[Curation.bm25SearchIndexedMany]] pass (union term set → one
  * listing, one scan, shared df) over the SAME stored postings index —
  * with per-query answer parity REQUIRED in-run. Run against an index
  * a prior lab built (e.g. HybridScaleLab's 21 M-doc `lexidx`):
  * {{{
  *   SPARK_DRIVER_MEM=24g sbt "runMain graft.tools.LexManyLab \
  *     --index /tmp/graft_hybridlab/lexidx --queries 8"
  * }}} */
object LexManyLab {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    var index = "/tmp/graft_hybridlab/lexidx"
    var nQueries = 8
    var k = 20
    var reps = 2
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--index" => index = args(i + 1); i += 2
        case "--queries" => nQueries = args(i + 1).toInt; i += 2
        case "--k" => k = args(i + 1).toInt; i += 2
        case "--reps" => reps = args(i + 1).toInt; i += 2
        case other => sys.error(s"unknown arg $other")
      }
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // the HybridScaleLab mid-frequency band, distinct terms per query
    def termsFor(qi: Int): Seq[String] = {
      val r = new scala.util.Random(9000 + qi)
      val out = scala.collection.mutable.LinkedHashSet.empty[String]
      while (out.size < 3) out += "w" + (200 + r.nextInt(1000))
      out.toSeq
    }
    val batch = (0 until nQueries).map(qi => (qi.toLong, termsFor(qi)))
    println(s"""{"index":"$index","queries":$nQueries,"k":$k,"reps":$reps}""")

    def singles() = batch.map { case (_, terms) =>
      Curation.bm25SearchIndexed(spark, index, terms, topK = k)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    }
    def many() = Curation.bm25SearchIndexedMany(spark, index,
      batch.toDF("query_id", "terms"), topK = k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))

    // alternating min-of-N reps (the cold-file-cache protocol): rep 1 of
    // each arm absorbs the cold read; the min is the warm capability
    var singleSecs = Double.MaxValue
    var manySecs = Double.MaxValue
    var singleAnswers: Seq[Seq[(Long, Double, Long)]] = null
    var manyAnswers: Array[(Long, Long, Double, Long)] = null
    for (rep <- 1 to reps) {
      val (aS, sS) = t(singles())
      val (aM, sM) = t(many())
      singleSecs = math.min(singleSecs, sS); singleAnswers = aS
      manySecs = math.min(manySecs, sM); manyAnswers = aM
      println(f"""{"rep":$rep,"singles_secs":$sS%.2f,"many_secs":$sM%.2f}""")
    }
    // parity per query, required
    batch.foreach { case (qid, _) =>
      val mine = manyAnswers.filter(_._1 == qid)
        .sortBy(t => (-t._3, t._2)).map(t => (t._2, t._3, t._4)).toSeq
      require(mine == singleAnswers(qid.toInt),
        s"batched answers diverged from the per-query path for query $qid")
    }
    println(f"""{"amortization":"${nQueries}q","singles_min_secs":$singleSecs%.2f,""" +
      f""""many_min_secs":$manySecs%.2f,"speedup":${singleSecs / manySecs}%.2f,"parity":"required, green"}""")
    spark.stop()
  }
}
