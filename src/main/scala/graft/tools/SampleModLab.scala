package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup}

/** Measurement harness for the span-removal family's `sampleMod` regime —
  * the documented 100 TB knob ([[Dedup.substringDedup]] scaladoc) that the
  * per-round bench never exercises (every driver query runs exact,
  * sampleMod = 1). For each requested corpus dir this runs the
  * `dedup_substring`- and `decontaminate_spans`-shaped pipelines at
  * sampleMod ∈ {1, 4, 16} (cold-ish: persist registry + cache drained
  * between runs) and reports, per mod:
  *  - wall time and its ratio to the exact pass;
  *  - char recall = Σ n_removed(sampled) / Σ n_removed(exact) — exact
  *    char-level recall because sampled removal is a SUBSET of exact
  *    removal (pinned in SubstringDedupPropertySpec), so no position
  *    diffing is needed;
  *  - doc recall = fraction of exact-affected docs the sampled pass also
  *    cut (a missed doc is worse than a coarsened boundary);
  *  - mean boundary deficit = mean chars NOT removed per exact-affected
  *    doc (the coarsening cost concentrated at span edges).
  *
  * Run: {{{ sbt "runMain graft.tools.SampleModLab [--sf dir]... [--reps N]" }}}
  */
object SampleModLab {
  def main(args: Array[String]): Unit = {
    val dirs = scala.collection.mutable.ArrayBuffer[String]()
    var reps = 1
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--sf" => dirs += args(i + 1); i += 2
        case "--reps" => reps = args(i + 1).toInt; i += 2
        case a => sys.error(s"unknown arg $a")
      }
    }
    if (dirs.isEmpty) dirs += "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus(dir: String): DataFrame = {
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      // same planted partial copies as the dedup_substring driver query
      val planted = d.filter(col("doc_id") < 50)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(lit("COPY "), col("doc_id").cast("string"), lit(": "),
            substring(col("text"), 1, 120)).as("text"))
      d.unionByName(planted)
    }

    // per (op, mod): collected (doc_id -> n_removed) plus wall time
    def measure(label: String, dir: String,
        f: Int => DataFrame): Unit = {
      val exactRes = scala.collection.mutable.Map[Long, Long]()
      val header = f"$label%-22s ${dir}%-22s"
      Seq(1, 4, 16).foreach { mod =>
        var best = Double.MaxValue
        var removed: Map[Long, Long] = Map.empty
        (1 to reps).foreach { _ =>
          Dedup.unpersistAll(spark)
          spark.sharedState.cacheManager.clearCache()
          val t0 = System.nanoTime()
          val rows = f(mod).filter(col("n_removed") > 0)
            .select(col("doc_id"), col("n_removed")).collect()
          val t = (System.nanoTime() - t0) / 1e9
          if (t < best) best = t
          removed = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
        }
        if (mod == 1) {
          exactRes ++= removed
          val total = removed.values.sum
          println(f"$header mod=1   ${best}%7.2f s  docsCut=${removed.size}%-7d charsCut=$total%-10d (exact)")
        } else {
          val exactChars = exactRes.values.sum.toDouble
          val charRecall = removed.values.sum / math.max(1.0, exactChars)
          val docRecall = exactRes.keys.count(removed.contains) /
            math.max(1.0, exactRes.size.toDouble)
          val deficit =
            if (exactRes.isEmpty) 0.0
            else exactRes.map { case (id, n) => n - removed.getOrElse(id, 0L) }
              .sum.toDouble / exactRes.size
          println(f"$header mod=$mod%-3d ${best}%7.2f s  charRecall=$charRecall%.3f docRecall=$docRecall%.3f meanDeficit=$deficit%.1f chars")
        }
      }
    }

    dirs.foreach { dir =>
      // warmup per corpus: footers + codegen
      corpus(dir).count()
      measure("dedup_substring", dir, mod =>
        Dedup.substringDedup(corpus(dir), "doc_id", "text", k = 40,
          sampleMod = mod))
      measure("decontaminate_spans", dir, { mod =>
        val d = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text"))
        val bench = d.filter(col("doc_id") % 10 === 3)
          .select(substring(col("text"), 21, 100).as("bench_text"))
        Curation.scrubSpans(d, "doc_id", "text", bench, "bench_text",
          k = 40, sampleMod = mod)
      })
    }
    Dedup.unpersistAll(spark)
    spark.stop()
  }
}
