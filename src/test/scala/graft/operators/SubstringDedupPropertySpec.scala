package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.mutable
import scala.util.Random

/** Property laws for the span-removal family against a NAIVE in-memory
  * reference implementation (brute-force window counting over ASCII
  * corpora — no hashing, no sampling, no islands): randomized corpora
  * built from a small shared phrase pool, so real cross-doc and self
  * duplication occurs at every seed. Seeded — reruns are deterministic.
  */
class SubstringDedupPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("substring-dedup-property-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Corpus mixing a shared phrase pool (duplication source) with
    * per-doc random runs (unique filler). ASCII only, so Java char
    * indexing below equals code-point indexing. */
  private def corpus(seed: Long, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val pool = Vector.tabulate(6) { p =>
      val n = 30 + rnd.nextInt(60)
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }
    (0L until nDocs.toLong).map { i =>
      val segs = 1 + rnd.nextInt(5)
      val t = (0 until segs).map { _ =>
        if (rnd.nextBoolean()) pool(rnd.nextInt(pool.size))
        else (0 until 10 + rnd.nextInt(40)).map(_ => ('A' + rnd.nextInt(26)).toChar).mkString
      }.mkString
      (i, t)
    }
  }

  /** Brute-force substringDedup: count every k-window, mark coverage. */
  private def naiveDedup(docs: Seq[(Long, String)], k: Int): Map[Long, (String, Long)] = {
    val counts = mutable.Map.empty[String, Int].withDefaultValue(0)
    for ((_, t) <- docs; i <- 0 to t.length - k) counts(t.substring(i, i + k)) += 1
    docs.map { case (id, t) =>
      val covered = Array.fill(t.length)(false)
      for (i <- 0 to t.length - k; if counts(t.substring(i, i + k)) >= 2; j <- i until i + k)
        covered(j) = true
      val clean = t.indices.collect { case j if !covered(j) => t.charAt(j) }.mkString
      id -> ((clean, (t.length - clean.length).toLong))
    }.toMap
  }

  /** Brute-force keepFirst variant: the first occurrence of each
    * duplicated gram in (id, position) order stays uncut. */
  private def naiveKeepFirst(docs: Seq[(Long, String)], k: Int): Map[Long, (String, Long)] = {
    val counts = mutable.Map.empty[String, Int].withDefaultValue(0)
    for ((_, t) <- docs; i <- 0 to t.length - k) counts(t.substring(i, i + k)) += 1
    val canonical = mutable.Map.empty[String, (Long, Int)]
    for ((id, t) <- docs.sortBy(_._1); i <- 0 to t.length - k) {
      val g = t.substring(i, i + k)
      if (!canonical.contains(g)) canonical(g) = (id, i)
    }
    docs.map { case (id, t) =>
      val covered = Array.fill(t.length)(false)
      for (i <- 0 to t.length - k) {
        val g = t.substring(i, i + k)
        if (counts(g) >= 2 && canonical(g) != ((id, i)))
          for (j <- i until i + k) covered(j) = true
      }
      val clean = t.indices.collect { case j if !covered(j) => t.charAt(j) }.mkString
      id -> ((clean, (t.length - clean.length).toLong))
    }.toMap
  }

  /** Brute-force scrubSpans: mark coverage by bench-window membership. */
  private def naiveScrub(docs: Seq[(Long, String)], bench: Seq[String],
      k: Int): Map[Long, (String, Long)] = {
    val bg = (for (b <- bench; i <- 0 to b.length - k) yield b.substring(i, i + k)).toSet
    docs.map { case (id, t) =>
      val covered = Array.fill(t.length)(false)
      for (i <- 0 to t.length - k; if bg(t.substring(i, i + k)); j <- i until i + k)
        covered(j) = true
      val clean = t.indices.collect { case j if !covered(j) => t.charAt(j) }.mkString
      id -> ((clean, (t.length - clean.length).toLong))
    }.toMap
  }

  private def runOp(docs: Seq[(Long, String)], k: Int, sampleMod: Int = 1): Map[Long, (String, Long)] = {
    val s = spark
    import s.implicits._
    Dedup.substringDedup(docs.toDF("id", "text"), "id", "text", k = k, sampleMod = sampleMod)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
  }

  test("substringDedup equals the naive reference on randomized corpora") {
    for (seed <- 1L to 8L) {
      val docs = corpus(seed, nDocs = 12)
      val expected = naiveDedup(docs, k = 20)
      val got = runOp(docs, k = 20)
      assert(got === expected, s"seed=$seed")
    }
  }

  test("substringDedup with k = 7 (small windows, dense duplication) still matches") {
    for (seed <- 20L to 23L) {
      val docs = corpus(seed, nDocs = 8)
      assert(runOp(docs, k = 7) === naiveDedup(docs, k = 7), s"seed=$seed")
    }
  }

  test("keepFirst equals the naive canonical-occurrence reference") {
    val s = spark
    import s.implicits._
    for (seed <- 80L to 85L) {
      val docs = corpus(seed, nDocs = 12)
      val expected = naiveKeepFirst(docs, k = 20)
      val got = Dedup.substringDedup(docs.toDF("id", "text"), "id", "text",
          k = 20, keepFirst = true)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      assert(got === expected, s"seed=$seed")
    }
  }

  test("keepFirst removal is a subset of remove-all") {
    for (seed <- 90L to 93L) {
      val docs = corpus(seed, nDocs = 10)
      val all = naiveDedup(docs, k = 20)
      val kept = naiveKeepFirst(docs, k = 20)
      for ((id, (_, nAll)) <- all)
        assert(kept(id)._2 <= nAll, s"seed=$seed id=$id")
    }
  }

  test("sampled removal is a subset of exact removal, span-aligned") {
    for (seed <- 40L to 43L) {
      val docs = corpus(seed, nDocs = 10)
      val exact = naiveDedup(docs, k = 20)
      val sampled = runOp(docs, k = 20, sampleMod = 3)
      for ((id, (_, nSampled)) <- sampled) {
        assert(nSampled <= exact(id)._2,
          s"seed=$seed id=$id: sampling removed MORE than the exact pass")
      }
    }
  }

  test("scrubSpans equals the naive reference on randomized corpora") {
    val s = spark
    import s.implicits._
    for (seed <- 60L to 65L) {
      val docs = corpus(seed, nDocs = 12)
      // bench = interior slices of a few docs plus one unrelated string
      val bench = docs.filter(_._1 % 3 == 0)
        .map { case (_, t) => t.substring(t.length / 4, t.length / 4 + math.min(60, 3 * t.length / 4)) }
        .filter(_.nonEmpty) :+ "completely unrelated benchmark question text here"
      val expected = naiveScrub(docs, bench, k = 20)
      val got = Curation.scrubSpans(docs.toDF("id", "text"), "id", "text",
          bench.toDF("btext"), "btext", k = 20)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      assert(got === expected, s"seed=$seed")
      // the non-broadcast (incremental-ingest) path must be semantically
      // identical: hashes meet in the shuffle, strings verify
      val gotShuffled = Curation.scrubSpans(docs.toDF("id", "text"), "id", "text",
          bench.toDF("btext"), "btext", k = 20, broadcastBench = false)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      assert(gotShuffled === expected, s"seed=$seed (broadcastBench=false)")
    }
  }
}
