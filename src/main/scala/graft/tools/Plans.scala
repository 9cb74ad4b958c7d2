package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of selected SparkEntry queries —
  * the `.explain("formatted")` iteration loop: verify pushdown reaches
  * scans, broadcasts are chosen, shuffles are only where the semantics
  * require them.
  *
  * Usage: Plans [--executed] [queryName ...]  (default: a representative set)
  *
  * `--executed` runs each query first and prints the FINAL adaptive plan
  * instead of the static one — AQE applies exchange/subquery reuse at
  * RUNTIME, so scan/shuffle dedup across repeated subtrees (scalar
  * frames derived from a shared count table, for instance) is only
  * visible here; the static plan over-counts scans.
  */
object Plans {
  def main(args0: Array[String]): Unit = {
    val executed = args0.contains("--executed")
    // --conf k=v pairs applied to the session (r20: A/B graft confs);
    // ONE parse pass so a malformed or dangling --conf fails with usage
    // instead of silently running the A/B with the conf unset
    val confs = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val args = {
      val a = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < args0.length) {
        args0(i) match {
          case "--conf" =>
            require(i + 1 < args0.length, "usage: --conf key=value")
            val p = args0(i + 1).split("=", 2)
            require(p.length == 2, s"usage: --conf key=value (got '${args0(i + 1)}')")
            confs += ((p(0), p(1))); i += 2
          case "--executed" => i += 1
          case x => a += x; i += 1
        }
      }
      a.toArray
    }
    val names = if (args.nonEmpty) args.toSeq
      else Seq("project_filter", "join_broadcast", "agg_groupby", "xlsx_roundtrip",
        "xlsx_scan_filtered", "semantic_dedup_ivf",
        "dedup_minhash", "ann_lsh", "window_rank", "join_asof", "join_range",
        "join_salted", "topk_heavy", "bloom_join", "line_dedup", "split_assign",
        "pii_redact", "lm_score",
        "doc_chunk", "sequence_pack", "pack_payload", "semantic_dedup",
        "nb_classify", "funnel", "retention", "cdc_compact", "passage_dedup",
        "ann_ivf_indexed", "key_skew", "corpus_report",
        "sample_weighted", "split_leakage_safe", "cdc_dedup", "bpe_encode",
        "csv_single_file_bz2", "neardup_survivors",
        "dedup_substring", "dedup_substring_keepfirst", "decontaminate_spans",
        "incremental_scrub")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, dir)
      if (executed) {
        df.count()
        println(df.queryExecution.executedPlan.toString)
        val (file, cache, dsv2) = executedScanCensus(df)
        println(s"-- scan census: $file file scans, $cache cache scans, $dsv2 dsv2 scans")
      } else df.explain("formatted")
    }
    spark.stop()
  }

  /** Precise scan census of an ALREADY-EXECUTED frame's final adaptive
    * plan: (file scans, cache scans, dsv2 scans). Walks the executed tree
    * including subqueries and adaptive stages; cached-relation children
    * are not walked — an InMemoryTableScan is a cache hit, not a file
    * read. This is the number the r11 audit used to catch full-corpus
    * rescans hiding behind in-plan scalar frames, and ScanCensusSpec pins
    * it per query as a CI gate. Run an action on `df` first (the census
    * reads `executedPlan`, which AQE finalizes at runtime). */
  def executedScanCensus(df: org.apache.spark.sql.DataFrame): (Int, Int, Int) = {
    def leaves(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collectWithSubqueries {
        case s: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          leaves(s.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          leaves(q.plan)
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => Seq(c)
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => Seq(b)
      }.flatten
    val ls = leaves(df.queryExecution.executedPlan)
    (ls.count(_.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]),
      ls.count(_.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryTableScanExec]),
      ls.count(_.isInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec]))
  }

  /** Every physical node of the FINAL adaptive plan, descending into AQE
    * stages and subqueries — the operator-dispatch sibling of
    * [[executedScanCensus]]: lets a spec pin WHICH physical operator a
    * query resolved to (e.g. "heap aggregate present, no Window node")
    * instead of only how many scans it ran. Run an action on `df` first,
    * for the same AQE-finalization reason. */
  def executedNodes(df: org.apache.spark.sql.DataFrame):
      Seq[org.apache.spark.sql.execution.SparkPlan] = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collectWithSubqueries {
        case s: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(s.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case n => Seq(n)
      }.flatten
    walk(df.queryExecution.executedPlan)
  }
}
