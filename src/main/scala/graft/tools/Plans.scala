package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of selected SparkEntry queries —
  * the `.explain("formatted")` iteration loop: verify pushdown reaches
  * scans, broadcasts are chosen, shuffles are only where the semantics
  * require them.
  *
  * Usage: Plans [queryName ...]  (default: a representative set)
  */
object Plans {
  def main(args: Array[String]): Unit = {
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
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
