package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** Measurement harness behind the plan choice in
  * [[graft.operators.Dedup.ngramJaccardPairs]] vs
  * [[graft.operators.Dedup.ngramJaccardPairsPrefix]]: times both variants
  * on the documents table and asserts result parity. Run:
  * {{{ sbt "runMain graft.tools.NgramLab /root/testdata/sf0.1" }}}
  */
object NgramLab {
  def main(args: Array[String]): Unit = {
    // --prefix-only: probe JUST the PPJoin prefix plan (the sf10 organic
    // regime: the all-token fan-out is measured-dead there — 70+ GB of
    // shuffle spill; see SCALE.md r11)
    val prefixOnly = args.contains("--prefix-only")
    val pos = args.filterNot(_.startsWith("--"))
    val sfDir = if (pos.nonEmpty) pos(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$name%-14s rows=${ts.head._2} times=${ts.map(t => f"${t._1}%.2f").mkString(",")} min=${ts.map(_._1).min}%.2f")
    }
    if (prefixOnly) {
      // One-box probe knob (documented in SCALE.md r11): the verify tail's
      // exchange is Θ(candidate pairs × shingle-array width) — 40+ GB of
      // shuffle at organic sf10, over this box's disk. The persisted
      // shingle table itself is < 1 GB, so broadcast it into both verify
      // joins instead of shuffling arrays per pair — now the operator's
      // own broadcastVerify option (scoped hint, no session config).
      val t0 = System.nanoTime()
      val n = Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 3, 0.5, 10000,
        broadcastVerify = true).count()
      println(f"prefix-only    rows=$n cold=${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.stop(); return
    }
    time("all-token") { Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, 10000,
      collapseExact = false).count() }
    spark.catalog.clearCache() // each variant persists its shingle index
    time("collapsed") { Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, 10000).count() }
    spark.catalog.clearCache()
    time("prefix") { Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 3, 0.5, 10000).count() }
    spark.catalog.clearCache()
    time("minhash-direct") { Dedup.minhashNearDups(docs, "doc_id", "text",
      collapseExact = false).count() }
    spark.catalog.clearCache()
    time("minhash-coll") { Dedup.minhashNearDups(docs, "doc_id", "text").count() }
    spark.catalog.clearCache()
    val a = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, 10000,
      collapseExact = false).collect().map(_.toString).sorted
    val b = Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 3, 0.5, 10000)
      .collect().map(_.toString).sorted
    val c = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, 10000)
      .collect().map(_.toString).sorted
    println(s"parity: all-token=${a.length} prefix=${b.length} collapsed=${c.length} " +
      s"prefixEq:${a.sameElements(b)} collapseEq:${a.sameElements(c)}")
    assert(a.sameElements(b), "PARITY BROKEN between ngram variants")
    assert(a.sameElements(c), "PARITY BROKEN between direct and collapsed paths")
    val md = Dedup.minhashNearDups(docs, "doc_id", "text", collapseExact = false)
      .collect().map(_.toString).sorted
    val mc = Dedup.minhashNearDups(docs, "doc_id", "text")
      .collect().map(_.toString).sorted
    println(s"minhash parity: direct=${md.length} collapsed=${mc.length} equal:${md.sameElements(mc)}")
    assert(md.sameElements(mc), "PARITY BROKEN between minhash direct and collapsed paths")
    spark.stop()
  }
}
