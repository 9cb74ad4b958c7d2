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

  test("sampleMod coverage bound: duplicated spans >= k*(sampleMod+1) chars are caught, symmetrically") {
    // The documented 100 TB guarantee (Dedup.substringDedup scaladoc): with
    // content-keyed "0 mod p" window sampling, a duplicated span of length
    // L >= k*(p+1) contains W = L-k+1 >= k*p fully-interior duplicated
    // windows, each kept with density 1/p under a uniform 64-bit hash, so
    // P(miss) <= (1-1/p)^(k*p) ~= e^-k — astronomically small for k = 20
    // (~2e-9). A miss here is a bug, not bad luck. Coverage of the span's
    // interior is also near-total: an interior char escapes only if none
    // of its k containing windows is sampled, P <= (1-1/p)^k.
    val k = 20
    for (p <- Seq(4, 16)) {
      val coverages = (1L to 15L).map { seed =>
        val rnd = new Random(1000 * p + seed)
        def run(n: Int, alpha: Char): String =
          (0 until n).map(_ => (alpha + rnd.nextInt(26)).toChar).mkString
        val L = k * (p + 1) + rnd.nextInt(40)
        val span = run(L, 'a')
        // distinct alignments and distinct unique flanks in the two docs
        val docs = Seq(
          1L -> (run(5 + rnd.nextInt(30), 'A') + span + run(15, 'A')),
          2L -> (run(11 + rnd.nextInt(17), 'A') + span + run(9, 'A')))
        val got = runOp(docs, k = k, sampleMod = p)
        val (r1, r2) = (got(1L)._2, got(2L)._2)
        assert(r1 > 0 && r2 > 0, s"p=$p seed=$seed: planted span of $L chars MISSED")
        // content-keyed selection is alignment-free: both copies lose the
        // same sampled windows, so removal is symmetric
        assert(r1 === r2, s"p=$p seed=$seed: asymmetric removal $r1 vs $r2")
        r1.toDouble / L
      }
      // per-span coverage fluctuates (sampled windows can cluster — a 46%
      // span was observed at p=16), so the coverage claim is about the
      // MEAN: expected interior coverage is 1-(1-1/p)^k (~99.7% at p=4,
      // ~72% at p=16) minus boundary coarsening; 0.6 fails on any
      // structural sampling bug while admitting the honest low tail
      val mean = coverages.sum / coverages.size
      assert(mean >= 0.6, f"p=$p: mean span coverage $mean%.2f below 0.6")
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
