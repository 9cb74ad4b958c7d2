package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Known-answer and law tests for [[Dedup.substringDedup]] — duplicated-
  * span removal (exact substring dedup). The oracle-checked driver query
  * covers the distributed exact path at sf0.01; these pin the semantics
  * on hand-built corpora where the right answer is computable by eye.
  *
  * Filler text is seeded-random per tag: structured filler (`<a-0005>`
  * style) silently SHARES k-gram substrings across docs (the numeric
  * suffixes match), which is exactly the duplication the operator is
  * built to find — random streams from distinct seeds share nothing.
  */
class SubstringDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("substring-dedup-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "text")
  }

  private def run(df: DataFrame, k: Int, sampleMod: Int = 1): Map[Long, (String, Long)] =
    Dedup.substringDedup(df, "id", "text", k = k, sampleMod = sampleMod)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  /** Deterministic per-tag random filler; distinct seeds -> no shared
    * 40-gram with any other tag's filler or with the planted spans. */
  private def rand(tag: String, n: Int): String = {
    val r = new scala.util.Random(tag.hashCode * 1000003L + 7)
    val alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    (0 until n).map(_ => alpha(r.nextInt(alpha.length))).mkString
  }

  test("planted shared span is removed from both docs, unique text kept") {
    val shared = "0123456789" * 4 // 40 chars, k = 40 -> exactly one window
    val a = rand("a", 48) + shared + rand("b", 48)
    val b = rand("c", 48) + shared + rand("d", 48)
    val out = run(docs(1L -> a, 2L -> b), k = 40)
    assert(out(1L)._1 === rand("a", 48) + rand("b", 48))
    assert(out(2L)._1 === rand("c", 48) + rand("d", 48))
    assert(out(1L)._2 === 40L && out(2L)._2 === 40L)
  }

  test("unique corpus passes through unchanged") {
    val df = docs(1L -> rand("x", 160), 2L -> rand("y", 160), 3L -> "short")
    val out = run(df, k = 40)
    assert(out(1L) === ((rand("x", 160), 0L)))
    assert(out(2L) === ((rand("y", 160), 0L)))
    assert(out(3L) === (("short", 0L))) // shorter than k: no windows
  }

  test("full-copy documents are BOTH fully removed (no survivor, by design)") {
    val t = rand("z", 96)
    val out = run(docs(1L -> t, 2L -> t), k = 40)
    assert(out(1L) === (("", 96L)))
    assert(out(2L) === (("", 96L)))
  }

  test("keepFirst: full-copy pair keeps the lower id intact, wipes the copy") {
    val t = rand("z", 96)
    val out = Dedup.substringDedup(docs(1L -> t, 2L -> t), "id", "text",
        k = 40, keepFirst = true)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) === ((t, 0L)), "canonical copy must survive untouched")
    assert(out(2L) === (("", 96L)), "the duplicate must be wiped")
  }

  test("keepFirst: shared interior span survives only in the lower id") {
    val shared = "0123456789" * 4
    val a = rand("a", 48) + shared + rand("b", 48)
    val b = rand("c", 48) + shared + rand("d", 48)
    val out = Dedup.substringDedup(docs(1L -> a, 2L -> b), "id", "text",
        k = 40, keepFirst = true)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) === ((a, 0L)))
    assert(out(2L) === ((rand("c", 48) + rand("d", 48), 40L)))
  }

  test("self-repetition inside one document is removed") {
    val phrase = "the same forty characters repeat here!!!" // 40 chars
    assert(phrase.length === 40)
    val t = rand("p", 48) + phrase + rand("q", 48) + phrase + rand("r", 48)
    val out = run(docs(1L -> t), k = 40)
    assert(out(1L)._1 === rand("p", 48) + rand("q", 48) + rand("r", 48))
    assert(out(1L)._2 === 2L * phrase.length)
  }

  test("overlapping duplicated windows merge into one span (no double cut)") {
    // 50-char shared run: its 11 interior windows are all duplicated
    // (period 10 + the cross-doc copy); the island merge must produce ONE
    // 50-char span per doc, not 11 overlapping cuts
    val shared = "abcdefghij" * 5
    val a = rand("m", 50) + shared
    val b = shared + rand("n", 50)
    val out = run(docs(1L -> a, 2L -> b), k = 40)
    assert(out(1L) === ((rand("m", 50), 50L)))
    assert(out(2L) === ((rand("n", 50), 50L)))
  }

  test("multibyte text: code-point spans cut correctly") {
    val shared = "é世界😀" * 10 // 40 code points, incl. a surrogate pair
    val a = rand("u", 48) + shared + rand("v", 48)
    val b = rand("w", 48) + shared + rand("x", 48)
    val out = run(docs(1L -> a, 2L -> b), k = 40)
    assert(out(1L)._1 === rand("u", 48) + rand("v", 48))
    assert(out(2L)._1 === rand("w", 48) + rand("x", 48))
    assert(out(1L)._2 === 40L) // code points, not Java chars
  }

  test("sampleMod > 1: long duplicated run still detected (content-keyed sampling)") {
    // 400-char shared run >> k*sampleMod: windows with hash % 4 == 0
    // exist in the run whp, and content-keyed selection picks the SAME
    // windows in both copies despite the different alignment
    val shared = rand("s", 400)
    val a = rand("g", 24) + shared + rand("h", 24)
    val b = rand("i", 56) + shared + rand("j", 16) // different offset
    val out = run(docs(1L -> a, 2L -> b), k = 40, sampleMod = 4)
    assert(out(1L)._2 > 300L, s"expected most of the 400-char run cut, got ${out(1L)._2}")
    assert(out(2L)._2 > 300L)
    assert(out(1L)._2 === out(2L)._2, "same sampled windows -> same span length in both copies")
    // nothing outside the run is ever cut
    assert(out(1L)._1.startsWith(rand("g", 24)) && out(1L)._1.endsWith(rand("h", 24)))
    assert(out(2L)._1.startsWith(rand("i", 56)) && out(2L)._1.endsWith(rand("j", 16)))
  }

  test("scrubSpans: leaked benchmark passage cut, everything else intact") {
    val passage = rand("bench", 80)
    val a = rand("a", 50) + passage + rand("b", 50) // leaked in the middle
    val clean = rand("c", 180)                      // no overlap with bench
    val s = spark
    import s.implicits._
    val bench = Seq(passage, rand("other-bench", 60)).toDF("btext")
    val out = Curation.scrubSpans(docs(1L -> a, 2L -> clean), "id", "text",
        bench, "btext", k = 40)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) === ((rand("a", 50) + rand("b", 50), 80L)))
    assert(out(2L) === ((clean, 0L)))
  }

  test("scrubSpans: bench snippets shorter than k scrub nothing") {
    val s = spark
    import s.implicits._
    val bench = Seq("tiny", rand("bb", 39)).toDF("btext")
    val t = rand("dd", 120) + rand("bb", 39) // contains the short snippet!
    val out = Curation.scrubSpans(docs(1L -> t), "id", "text", bench, "btext", k = 40)
      .collect()
    assert(out.head.getString(1) === t && out.head.getLong(2) === 0L)
  }

  test("scrubSpans: sampleMod selects the same windows on both sides") {
    val passage = rand("leak", 400)
    val s = spark
    import s.implicits._
    val bench = Seq(passage).toDF("btext")
    val t = rand("e", 37) + passage + rand("f", 23) // alignment differs from bench
    val out = Curation.scrubSpans(docs(1L -> t), "id", "text", bench, "btext",
        k = 40, sampleMod = 4)
      .collect().head
    assert(out.getLong(2) > 300L, s"expected most of the passage cut, got ${out.getLong(2)}")
    assert(out.getString(1).startsWith(rand("e", 37)))
    assert(out.getString(1).endsWith(rand("f", 23)))
  }

  test("n_removed is always length(text) - length(clean_text)") {
    val shared = "0123456789" * 5
    val df = docs(1L -> (rand("a", 40) + shared), 2L -> (shared + rand("b", 40)),
      3L -> rand("c", 72), 4L -> "tiny")
    val out = Dedup.substringDedup(df, "id", "text", k = 40)
    val joined = df.select(col("id"), length(col("text")).as("n0"))
      .join(out.select(col("id"), length(col("clean_text")).as("n1"), col("n_removed")), "id")
      .filter(col("n_removed") =!= col("n0") - col("n1"))
    assert(joined.count() === 0)
  }

  test("hotGramCap is physical-only: hot-path, warm-path, and mixed outputs are identical") {
    // "hotgram" appears in 6 docs (hot at cap 2, warm at cap MAX), "pair"
    // in 2 (always warm) — so cap=4 exercises the warm and hot branches
    // SIMULTANEOUSLY, including keepFirst's per-branch canonical pick
    val hotSpan = rand("H", 60)
    val pairSpan = rand("P", 55)
    val df = docs(
      (1L to 6L).map(i => i -> (rand(s"u$i", 30) + hotSpan + rand(s"v$i", 25))) ++
        Seq(7L -> (rand("w", 41) + pairSpan), 8L -> (pairSpan + rand("x", 47))): _*)
    for (keep <- Seq(false, true)) {
      def m(cap: Long): Map[Long, (String, Long)] =
        Dedup.substringDedup(df, "id", "text", k = 40, keepFirst = keep,
            hotGramCap = cap)
          .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      val allHot = m(2L)
      val mixed = m(4L)
      val allWarm = m(Long.MaxValue)
      assert(allHot === allWarm, s"keepFirst=$keep: hot path diverged from warm")
      assert(mixed === allWarm, s"keepFirst=$keep: mixed cap diverged")
      // sanity: the operator actually cut something in this corpus
      assert(allWarm.values.map(_._2).sum > 0)
    }
  }
}
