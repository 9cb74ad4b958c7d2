package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Known-answer tests for the dataset-curation operators (sampling,
  * decontamination, n-gram stats, TF-IDF/BM25, quality filtering). */
class CurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("curation-spec")
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

  test("mixKey envelope: in-band values untouched, out-of-band raises instead of wrapping") {
    val s = spark
    import s.implicits._
    // inside the envelope: the guard passes values through bit-identical
    // (oracle replays unchanged) — spot-check against the raw formula
    val ok = Seq(0L, 1L, 123456789L, Curation.MixEnvelopeMax).toDF("id")
      .select(col("id"), Curation.mixKey(col("id")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ok.foreach { case (k, m) =>
      assert(m === java.lang.Math.floorMod(k * 2654435761L, 4294967296L)) }
    // past the envelope the multiply would silently wrap Long and diverge
    // from any ANSI oracle — must raise, not degrade (ADVICE r10)
    val over = intercept[Exception] {
      Seq(Curation.MixEnvelopeMax + 1).toDF("id")
        .select(Curation.mixKey(col("id"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(over).exists(m => m != null && m.contains("envelope")),
      s"expected the mixKey envelope guard, got: ${over.getMessage}")
    // negative keys are equally out of contract
    assertThrows[Exception] {
      Seq(-1L).toDF("id").select(Curation.mixKey(col("id"))).collect()
    }
    // the seeded variant guards the SHIFTED value (key + seed stride)
    assertThrows[Exception] {
      Seq(Curation.MixEnvelopeMax - 1000L).toDF("id")
        .select(Curation.mixKeySeeded(col("id"), seed = 5L)).collect()
    }
  }

  test("foldKey: any BIGINT (xxhash64 range, negatives, extremes) lands in the envelope") {
    val s = spark
    import s.implicits._
    // the one-line migration for hash-derived keys: mixKey(foldKey(k))
    // must compute for the FULL signed range — including the values the
    // guard alone would (correctly) reject — and match the plain model
    val keys = Seq(Long.MinValue, Long.MinValue + 1, -2654435761L, -1L, 0L,
      1L, Curation.MixEnvelopeMax, Curation.MixEnvelopeMax + 1, Long.MaxValue) ++
      (0 until 200).map(i => scala.util.hashing.MurmurHash3.stringHash(s"k$i").toLong * 2654435761L)
    val m = Curation.MixEnvelopeMax + 1L
    val got = keys.toDF("id")
      .select(col("id"), Curation.foldKey(col("id")).as("f"),
        Curation.mixKey(Curation.foldKey(col("id"))).as("mx"))
      .collect()
    got.foreach { r =>
      val (k, f, mx) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(f === java.lang.Math.floorMod(k, m), s"foldKey($k)")
      assert(f >= 0 && f <= Curation.MixEnvelopeMax)
      assert(mx === java.lang.Math.floorMod(f * 2654435761L, 4294967296L))
    }
    // and the documented end-to-end shape: sampling on a raw xxhash64
    // fingerprint — negative for ~half of real texts — works when folded
    val fp = docs(1L -> "alpha", 2L -> "beta", 3L -> "gamma")
      .select(xxhash64(col("text")).as("fp"))
    val n = fp.filter(Curation.mixKey(Curation.foldKey(col("fp"))) >= 0L).count()
    assert(n === 3L)
  }

  test("deterministic sample: reproducible, monotone in fraction, exact at the ends") {
    val s = spark
    import s.implicits._
    val df = (0L until 1000L).toDF("id")
    assert(Curation.deterministicSample(df, "id", 0.0).count() === 0)
    assert(Curation.deterministicSample(df, "id", 1.0).count() === 1000)
    val a = Curation.deterministicSample(df, "id", 0.1).collect().map(_.getLong(0)).toSet
    val b = Curation.deterministicSample(df, "id", 0.1).collect().map(_.getLong(0)).toSet
    assert(a === b, "same fraction must select the same rows")
    // Knuth multiplicative mixing is near-uniform: 10% ± a few percent
    assert(a.size > 60 && a.size < 140, s"10% of 1000 sampled ${a.size}")
    // monotone: a smaller fraction selects a subset
    val half = Curation.deterministicSample(df, "id", 0.05).collect().map(_.getLong(0)).toSet
    assert(half.subsetOf(a))
  }

  test("stratified sample: n per stratum, deterministic, small strata kept whole") {
    val s = spark
    import s.implicits._
    val df = ((0L until 100L).map(i => (i, "big")) ++ Seq((900L, "tiny"), (901L, "tiny")))
      .toDF("id", "grp")
    val out = Curation.stratifiedSample(df, "grp", "id", n = 5)
      .collect().map(r => (r.getString(1), r.getLong(0))).groupBy(_._1)
    assert(out("big").length === 5)
    assert(out("tiny").length === 2) // stratum smaller than n -> all rows
    val again = Curation.stratifiedSample(df, "grp", "id", n = 5)
      .collect().map(_.getLong(0)).toSet
    assert(again === out.values.flatten.map(_._2).toSet)
  }

  test("stratified sample: heap fast path matches the window path exactly") {
    val s = spark
    import s.implicits._
    // BIGINT keys dispatch to the TopKByScore bounded-heap aggregate;
    // any other key type keeps the row_number window. Same data through
    // both paths (int copy of the same key values) must agree on every
    // (stratum, key, rk) triple — including rk, the within-stratum rank —
    // across a skewed multi-partition layout and a null stratum.
    val rows = (0L until 400L).map(i => (i, if (i % 7 == 0) null else s"g${i % 3}")) ++
      Seq((9000L, "tiny"))
    val df = rows.toDF("id", "grp").repartition(7)
    val heap = Curation.stratifiedSample(df, "grp", "id", n = 4)
      .select(col("grp"), col("id"), col("rk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val window = Curation.stratifiedSample(
        df.withColumn("id", col("id").cast("int")), "grp", "id", n = 4)
      .select(col("grp"), col("id").cast("long"), col("rk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(heap === window)
    assert(heap.count(_._1 == null) === 4, "null stratum sampled like any other")
    assert(heap.count(_._1 == "tiny") === 1)
  }

  test("decontaminate: doc sharing a benchmark 5-gram flagged, clean doc not") {
    val s = spark
    import s.implicits._
    val contaminated = "alpha beta gamma delta epsilon zeta eta theta"
    val clean = "one two three four five six seven eight"
    val corpus = docs(1L -> contaminated, 2L -> clean)
    val bench = Seq("xx beta gamma delta epsilon zeta yy").toDF("qtext")
    val out = Curation.decontaminate(corpus, "id", "text", bench, "qtext", k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // shared 5-grams: "beta gamma delta epsilon zeta" only
    assert(out === Map(1L -> 1L))
  }

  test("ngram stats: hand-computed document frequencies, ties broken by gram") {
    val df = docs(1L -> "a b c d", 2L -> "a b c x", 3L -> "a b c d")
    val out = Curation.ngramStats(df, "text", k = 3, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // "a b c" in all 3 docs; "b c d" in docs 1,3; "b c x" in doc 2
    assert(out.toSeq === Seq(("a b c", 3L), ("b c d", 2L), ("b c x", 1L)))
  }

  test("tf-idf: corpus-wide term scores 0, rare term dominates its doc") {
    val df = docs(
      1L -> "common common rare",
      2L -> "common other",
      3L -> "common thing")
    val out = Curation.tfIdfTopTerms(df, "id", "text", perDoc = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // "common" appears in every doc -> idf = ln(4/4) = 0; the unique term
    // wins each doc despite tf("common") being higher in doc 1
    assert(out === Map(1L -> "rare", 2L -> "other", 3L -> "thing"))
  }

  test("bm25: more query-term mass ranks higher; non-hit docs absent") {
    val df = docs(
      1L -> "spark spark vector filler words here",
      2L -> "spark filler words here again now",
      3L -> "nothing relevant in this one at all")
    val out = Curation.bm25Search(df, "id", "text", Seq("spark", "vector"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(out.map(_._1).toSeq === Seq(1L, 2L)) // doc 3 never scores
    assert(out(0)._2 > out(1)._2)
    assert(out(0)._3 === 2L && out(1)._3 === 1L) // terms hit
  }

  test("rrfFuse: hand-computed fusion, consensus beats single-list winners, absent ids ignored") {
    val s = spark
    import s.implicits._
    def ranking(rows: (Long, Int)*) = rows.toDF("id", "rank")
    // lexical says (10, 20, 30); semantic says (20, 40, 10): id 20 is the
    // consensus pick even though neither list ranked it first
    val lex = ranking(10L -> 1, 20L -> 2, 30L -> 3)
    val sem = ranking(20L -> 1, 40L -> 2, 10L -> 3)
    val out = Curation.rrfFuse(Seq(lex, sem), topK = 10, kRrf = 60)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    def rrf(ranks: Int*) = BigDecimal(ranks.map(r => 1.0 / (60 + r)).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.map(_._1).toSeq === Seq(20L, 10L, 40L, 30L),
      s"consensus id 20 (ranks 2+1) must beat id 10 (ranks 1+3): ${out.toSeq}")
    assert(out.map(_._2).toSeq === Seq(rrf(2, 1), rrf(1, 3), rrf(2), rrf(3)))
    // n_lists reports coverage: 2 for the consensus ids, 1 for singles
    assert(out.map(_._3).toSeq === Seq(2L, 2L, 1L, 1L))
    // topK truncates by fused score with id tie-break (40 and 30 both
    // appear once; 40's rank 2 beats 30's rank 3)
    val top2 = Curation.rrfFuse(Seq(lex, sem), topK = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top2 === Seq(20L, 10L))
  }

  test("rrfFuseMany: per-query fusion equals rrfFuse run query by query") {
    val s = spark
    import s.implicits._
    def ranking(rows: (Long, Long, Int)*) = rows.toDF("query_id", "id", "rank")
    val lex = ranking((0L, 10L, 1), (0L, 20L, 2), (0L, 30L, 3),
      (1L, 20L, 1), (1L, 50L, 2))
    val sem = ranking((0L, 20L, 1), (0L, 40L, 2), (0L, 10L, 3),
      (1L, 50L, 1), (1L, 60L, 2))
    val many = Curation.rrfFuseMany(Seq(lex, sem), topK = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    for (q <- Seq(0L, 1L)) {
      val single = Curation.rrfFuse(Seq(
        lex.filter(col("query_id") === q).select("id", "rank"),
        sem.filter(col("query_id") === q).select("id", "rank")), topK = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      assert(many.filter(_._1 == q).map(t => (t._2, t._3, t._4)).toSeq === single.toSeq,
        s"query $q diverged from the single-query fusion")
    }
    assert(many.length === 4, "topK truncation is PER QUERY")
  }

  test("bm25SearchIndexed: answer-identical to the scan path; bucket-pruned; duplicate terms collapse") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("spark", "vector", "stream", "data", "index", "query",
      "batch", "shuffle", "column", "row", "fold", "probe")
    val corpus = (0L until 300L).map { id =>
      (id, Seq.fill(5 + rnd.nextInt(25))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("bm25idx").toString
    Curation.writeBm25Index(corpus, "doc_id", "text", base, buckets = 8)
    def scan(terms: Seq[String]) =
      Curation.bm25Search(corpus, "doc_id", "text", terms, topK = 15)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    def indexed(terms: Seq[String]) =
      Curation.bm25SearchIndexed(spark, base, terms, topK = 15)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    for (terms <- Seq(Seq("spark"), Seq("spark", "vector", "stream"),
        Seq("fold", "probe", "absentterm"), vocab.take(6)))
      assert(indexed(terms) === scan(terms), s"parity broke for $terms")
    // a term absent from the corpus contributes nothing, never NaNs
    assert(indexed(Seq("absentterm")).isEmpty)
    // duplicate query terms collapse to one contribution
    assert(indexed(Seq("spark", "spark")) === indexed(Seq("spark")))
    // the probed-bucket set lands as a partition filter on the postings
    // scan — the query reads its terms' buckets, not the index
    val plan = Curation.bm25SearchIndexed(spark, base, Seq("spark"), topK = 5)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      plan.take(2000))
    assert(plan.contains("PushedFilters: [IsNotNull(term), EqualTo(term,spark)]"),
      "the term equality must reach the parquet scan")
  }

  test("appendBm25Index: build-then-grow answers like all-at-once; empty batch is a no-op") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("spark", "vector", "stream", "data", "index", "query", "fold")
    val corpus = (0L until 200L).map { id =>
      (id, Seq.fill(4 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("bm25grow").toString
    val grown = s"$base/grown"; val whole = s"$base/whole"
    Curation.writeBm25Index(corpus.filter(col("doc_id") < 100), "doc_id", "text", grown, buckets = 8)
    Curation.appendBm25Index(corpus.filter(col("doc_id") >= 100), "doc_id", "text", grown)
    Curation.writeBm25Index(corpus, "doc_id", "text", whole, buckets = 8)
    def ask(p: String, terms: Seq[String]) =
      Curation.bm25SearchIndexed(spark, p, terms, topK = 12)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    for (terms <- Seq(Seq("spark"), Seq("spark", "vector", "stream"), vocab.take(5)))
      assert(ask(grown, terms) === ask(whole, terms), s"grown != whole for $terms")
    // the incrementally recombined stats row matches the rescan EXACTLY
    // (sums, not means — integer arithmetic, no float drift possible)
    def stats(p: String) = spark.read.parquet(s"$p/stats")
      .select("n_docs", "sum_dl", "buckets").collect()(0)
    assert(stats(grown) === stats(whole))
    // empty batch: stats identical, no postings added
    val before = ask(grown, Seq("spark"))
    Curation.appendBm25Index(corpus.filter(col("doc_id") < 0), "doc_id", "text", grown)
    assert(ask(grown, Seq("spark")) === before)
    assert(stats(grown).getLong(0) === 200L)
  }

  test("rrfFuse collapses within-list duplicate ids to their best rank") {
    val s = spark
    import s.implicits._
    // a retriever that emitted id 10 twice (ranks 3 and 1) must fuse
    // exactly like one that emitted it once at its best rank — one list
    // can never contribute twice, and n_lists stays <= rankings.length
    val dirty = Seq((10L, 3), (10L, 1), (20L, 2)).toDF("id", "rank")
    val clean = Seq((10L, 1), (20L, 2)).toDF("id", "rank")
    val other = Seq((20L, 1), (10L, 2)).toDF("id", "rank")
    def run(l: DataFrame) = Curation.rrfFuse(Seq(l, other), topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(run(dirty) === run(clean))
    assert(run(dirty).forall(_._3 <= 2L), s"n_lists must not exceed the list count: ${run(dirty)}")
  }

  test("rrfFuse laws: list-order invariance; improving a rank never hurts the fused score") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    def randomRanking(ids: Seq[Long], n: Int): DataFrame =
      rnd.shuffle(ids).take(n).zipWithIndex
        .map { case (id, i) => (id, i + 1) }.toDF("id", "rank")
    val ids = (1L to 30L)
    val lists = Seq(randomRanking(ids, 10), randomRanking(ids, 10), randomRanking(ids, 10))
    def fused(ls: Seq[DataFrame]) = Curation.rrfFuse(ls, topK = 30)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    // fusion is a sum over lists — permuting the input list order must
    // not change a single output row (the operator's determinism story)
    assert(fused(lists) === fused(lists.reverse))
    assert(fused(lists) === fused(Seq(lists(1), lists(2), lists(0))))
    // monotonicity: promote one id to rank 1 in one list (shifting the
    // ids it passes down one) — its fused score must strictly rise and
    // every other id's must not rise
    val before = fused(lists).map(r => r._1 -> r._2).toMap
    val l0 = lists(0).collect().map(r => (r.getLong(0), r.getInt(1)))
    val promoted = l0.minBy(_._2 * -1)._1 // the id currently ranked LAST
    val bumped = l0.map { case (id, rk) =>
      if (id == promoted) (id, 1)
      else if (rk < l0.find(_._1 == promoted).get._2) (id, rk + 1)
      else (id, rk)
    }.toSeq.toDF("id", "rank")
    val after = fused(Seq(bumped, lists(1), lists(2))).map(r => r._1 -> r._2).toMap
    assert(after(promoted) > before(promoted),
      s"promoting $promoted to rank 1 must raise its fused score")
    (before.keySet - promoted).foreach { id =>
      assert(after.getOrElse(id, 0.0) <= before(id) + 1e-9,
        s"id $id gained score from another id's promotion")
    }
  }

  test("quality filter: rule flags fire independently and conjoin") {
    val good = (("the quick brown fox jumps over a lazy dog and then " * 5) + "end").trim
    val short = "the a of brief"
    val noisy = "the a " + ("@#$%^&* " * 30) // symbols >> 10%
    val df = docs(1L -> good, 2L -> short, 3L -> noisy)
    val out = TextAnalysis.qualityFilter(df, "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6)))
      .toMap
    val (gN, gW, gS, gStop, gPass) = out(1L)
    assert(gN && gW && gS && gStop && gPass)
    assert(!out(2L)._1 && !out(2L)._5) // too few words -> fails
    assert(!out(3L)._3 && !out(3L)._5) // symbol-noisy -> fails
  }

  test("repetition stats: hand-computed duplicate and top-gram fractions") {
    val df = docs(
      1L -> "a b a b a b",  // 2-grams: ab,ba,ab,ba,ab -> 5 total, 2 distinct, top 3
      2L -> "x y z w",      // 3 total, 3 distinct, top 1
      3L -> "solo")         // <2 words -> absent
    val out = Curation.repetitionStats(df, "id", "text", k = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === ((5L, 2L, 3L, 0.6d, 0.6d)))
    assert(out(2L) === ((3L, 3L, 1L, 0.0d, round3(1.0 / 3))))
  }

  private def round3(x: Double): Double = math.rint(x * 10000) / 10000

  test("curation composition: filter -> dedup -> sample preserves determinism") {
    val s = spark
    import s.implicits._
    val good = ("the and of to in " + ("plain ordinary words flowing onward " * 8)).trim
    val rows = (0L until 20L).map(i => (i, good)) :+ ((99L, "short a the"))
    val df = rows.toDF("doc_id", "text")
    val passing = TextAnalysis.qualityFilter(df, "doc_id", "text")
      .filter(col("passes")).select("doc_id")
    // 20 identical passing docs collapse to doc 0; the short doc fails
    val deduped = df.join(passing, "doc_id")
      .groupBy("text").agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    assert(deduped.collect().map(_.getLong(0)).toSeq === Seq(0L))
    val s1 = Curation.deterministicSample(deduped, "doc_id", 1.0).count()
    assert(s1 === 1L)
  }

  test("hashed shingles equal fnv1a64 over the expression-form string shingles") {
    val s = spark
    import s.implicits._
    // The DuckDB oracles compute jaccard from STRING shingle sets; the
    // operators run on hashed sets. This pins the bridge: for texts with
    // repeats, unicode, varied whitespace and short docs, the hash set is
    // exactly fnv1a64 of each distinct string shingle.
    val texts = Seq(
      "a b c d e", "a a a a", "x", "", "solo pair",
      "tab\tand  double  spaces here", "Ñoño emoji 😀 mixed 中文 words",
      ("w1 " * 30).trim, "a b a b a b a b")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val fnv = udf((x: String) => graft.functions.GraftFunctions.fnv1a64(x))
    val fromStrings = df
      .select(col("id"), explode(Dedup.shingles(col("text"), 3)).as("g"))
      .select(col("id"), fnv(col("g")).as("h"))
      .groupBy("id").agg(sort_array(collect_set(col("h"))).as("hs"))
    val fromHashes = df
      .select(col("id"), Dedup.shingleHashUdf(3)(col("text")).as("hs"))
      .filter(size(col("hs")) > 0)
    val a = fromStrings.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = fromHashes.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a === b)
  }

  test("bpe-ish token count: letter runs, digit runs, single symbols") {
    val df = docs(1L -> "hello world42 x-ray 3.14!")
    // hello | world | 42 | x | - | ray | 3 | . | 14 | !  -> 10
    val n = df.select(TextAnalysis.bpeTokenCount(col("text"))).collect().head.getInt(0)
    assert(n === 10)
  }

  test("split assign: total partition, stable fractions, subset-independent") {
    val s = spark
    import s.implicits._
    val df = (0L until 10000L).toDF("id")
    val out = Curation.splitAssign(df, "id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size === 10000, "every row gets a split")
    val byLabel = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byLabel.keySet === Set("train", "val", "test"))
    assert(byLabel("train") > 8700 && byLabel("train") < 9300, s"train=${byLabel("train")}")
    assert(byLabel("val") > 300 && byLabel("val") < 700, s"val=${byLabel("val")}")
    assert(byLabel("test") > 300 && byLabel("test") < 700, s"test=${byLabel("test")}")
    // assignment of a row is independent of what other rows exist:
    // growing the dataset can never move an existing row between splits
    val subset = Curation.splitAssign((0L until 100L).toDF("id"), "id",
        Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    subset.foreach { case (id, label) => assert(out(id) === label) }
  }

  test("split assign: single label and remainder-to-last behavior") {
    val s = spark
    import s.implicits._
    val df = (0L until 50L).toDF("id")
    val one = Curation.splitAssign(df, "id", Seq("all" -> 1.0))
      .select("split").distinct().collect().map(_.getString(0))
    assert(one.toSeq === Seq("all"))
    // fractions summing below 1: remainder falls in the last label
    val skewed = Curation.splitAssign(df, "id", Seq("a" -> 0.1, "b" -> 0.1))
      .collect().map(r => r.getString(1))
    assert(skewed.count(_ == "b") > skewed.count(_ == "a"))
  }

  test("weighted sample w/o replacement: heavier rows dominate; exact at the ends") {
    // the DuckDB oracle replays the same arithmetic, so it cannot catch a
    // semantic error in the formula itself (a flipped sign would pass both
    // sides) — this spec pins the actual Efraimidis-Spirakis property
    val s = spark
    import s.implicits._
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) 10.0 else 1.0))
      .toDF("id", "w")
    val picked = Curation.weightedSampleTopK(df, "id", col("w"), k = 200)
      .collect().map(_.getLong(0))
    assert(picked.length == 200)
    val heavy = picked.count(_ % 2 == 0)
    // with 10:1 weights the heavy class must dominate the sample strongly
    // (deterministic draw -> this is a fixed, not statistical, outcome)
    assert(heavy > 3 * (200 - heavy), s"heavy=$heavy of 200")
    // k = n selects everything with positive weight; w <= 0 never selected
    val withZero = df.withColumn("w", when($"id" < 10, lit(0.0)).otherwise($"w"))
    val all = Curation.weightedSampleTopK(withZero, "id", col("w"), k = 2000)
      .collect().map(_.getLong(0)).toSet
    assert(all.size == 990 && (0L until 10L).forall(!all.contains(_)))
    // determinism: reruns pick the identical set in the identical order
    val again = Curation.weightedSampleTopK(df, "id", col("w"), k = 200)
      .collect().map(_.getLong(0))
    assert(picked.toSeq == again.toSeq)
  }

  test("leakage-safe split: duplicate texts share a fate; rep = min id") {
    val df = docs(
      1L -> "alpha beta gamma", 4L -> "alpha beta gamma", 9L -> "alpha beta gamma",
      2L -> "delta epsilon", 7L -> "delta epsilon",
      3L -> "unique text here")
    val out = Curation.leakageSafeSplit(df, "id", "text",
        Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toList
    val byId = out.map(t => t._1 -> (t._2, t._3)).toMap
    assert(byId(1L)._1 == 1L && byId(4L)._1 == 1L && byId(9L)._1 == 1L)
    assert(byId(2L)._1 == 2L && byId(7L)._1 == 2L)
    assert(byId(3L)._1 == 3L)
    // the leakage invariant: one split per duplicate group
    assert(Set(byId(1L)._2, byId(4L)._2, byId(9L)._2).size == 1)
    assert(byId(2L)._2 == byId(7L)._2)
    // representative's split equals what splitAssign gives the rep key
    val direct = Curation.splitAssign(docs(1L -> "x", 2L -> "x", 3L -> "x"), "id",
        Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(byId(1L)._2 == direct(1L) && byId(2L)._2 == direct(2L))
  }

  test("leakage-safe split: text stays out of the agg exchange; pruned output drops it from the join too") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val df = docs(1L -> "alpha beta", 2L -> "alpha beta", 3L -> "gamma")
    val pruned = Curation.leakageSafeSplit(df, "id", "text",
        Seq("train" -> 0.8, "test" -> 0.2))
      .select("id", "rep_id", "split")
    val opt = pruned.queryExecution.optimizedPlan
    // representative aggregation must consume the (id, fp) projection only
    val aggs = opt.collect { case a: Aggregate => a }
    assert(aggs.nonEmpty)
    aggs.foreach(a => assert(a.child.output.forall(_.name != "text"),
      s"agg input must be id-width: ${a.child.output.map(_.name)}"))
    // with text pruned from the output, NO side of the join carries it —
    // the whole assignment runs on 16-byte rows
    val joins = opt.collect { case j: Join => j }
    assert(joins.nonEmpty)
    joins.foreach(j => j.children.foreach(c =>
      assert(c.output.forall(_.name != "text"),
        s"join input must be pruned: ${c.output.map(_.name)}")))
  }

  test("char-LM score: gibberish scores below typical text; gram counts exact") {
    val typical = "the cat sat on the mat and the cat sat again"
    val df = docs(
      1L -> typical, 2L -> typical, 3L -> typical, 4L -> typical,
      5L -> "zqxv jkwq pzvx qjzk") // character soup: rare contexts
    val out = Curation.charLmScore(df, "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // every trigram position counted: len - 2
    assert(out(1L)._2 === typical.length - 2)
    assert(out(5L)._2 === "zqxv jkwq pzvx qjzk".length - 2)
    // smoothing makes rare-context gibberish atypical, not perfect
    assert(out(5L)._1 < out(1L)._1,
      s"gibberish ${out(5L)._1} must score below typical ${out(1L)._1}")
    // identical docs score identically
    assert(out(1L)._1 === out(2L)._1)
  }

  test("shard assign: partition into shards, dense in-shard positions, stable") {
    val s = spark
    import s.implicits._
    val df = (0L until 800L).toDF("id")
    val out = Curation.shardAssign(df, "id", numShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out.length === 800)
    val byShard = out.groupBy(_._2)
    assert(byShard.keySet === (0 until 8).toSet)
    byShard.values.foreach { rows =>
      // positions are a dense 1..n sequence within each shard
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length).toSeq)
      // shards are roughly balanced under the multiplicative mix
      assert(rows.length > 50 && rows.length < 150, s"shard size ${rows.length}")
    }
    val again = Curation.shardAssign(df, "id", numShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(again === out.toSet, "shard+pos must be deterministic")
  }

  test("epoch shuffle: epoch 0 == shardAssign; epochs permute; each epoch valid") {
    val s = spark
    import s.implicits._
    val df = (0L until 800L).toDF("id")
    def orderOf(epoch: Long): Map[Long, (Int, Int)] =
      Curation.epochShuffle(df, "id", numShards = 8, epoch)
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    val e0 = orderOf(0L)
    val base = Curation.shardAssign(df, "id", numShards = 8)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(e0 === base, "epoch 0 must be exactly shardAssign")
    val e1 = orderOf(1L); val e2 = orderOf(2L)
    // different epochs genuinely reshuffle (most rows move)
    def moved(a: Map[Long, (Int, Int)], b: Map[Long, (Int, Int)]): Int =
      a.count { case (k, v) => b(k) != v }
    assert(moved(e0, e1) > 400, s"epoch 1 moved only ${moved(e0, e1)} of 800")
    assert(moved(e1, e2) > 400, s"epoch 2 moved only ${moved(e1, e2)} of 800")
    // every epoch is a valid training order: dense 1..n positions per shard
    Seq(e1, e2).foreach { e =>
      e.groupBy(_._2._1).values.foreach { rows =>
        assert(rows.values.map(_._2).toSeq.sorted === (1 to rows.size).toSeq)
      }
    }
    // and reproducible in isolation
    assert(orderOf(1L) === e1, "an epoch's order must be rerun-stable")
  }

  test("temperature sample: alpha=1 keeps natural shares, alpha<1 flattens") {
    val s = spark
    import s.implicits._
    // skewed corpus: big source 8000 rows, small source 800
    val df = ((0L until 8000L).map(i => (i, "big")) ++
      (8000L until 8800L).map(i => (i, "small"))).toDF("id", "src")
    def sharesAt(alpha: Double): (Double, Double) = {
      val kept = Curation.temperatureSample(df, "id", "src", alpha, targetFrac = 0.5)
        .groupBy("src").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      (kept.getOrElse("big", 0L).toDouble / 8000.0,
        kept.getOrElse("small", 0L).toDouble / 800.0)
    }
    val (b1, s1) = sharesAt(1.0)
    // alpha=1: both sources sampled at ~the same rate (natural mixture)
    assert(math.abs(b1 - s1) < 0.07, f"alpha=1 rates diverged: big $b1%.3f small $s1%.3f")
    val (b5, s5) = sharesAt(0.5)
    // alpha=0.5 upweights the small source's keep-rate over the big one's
    assert(s5 > b5 + 0.3, f"alpha=0.5 must favor the small source: big $b5%.3f small $s5%.3f")
    // determinism
    val once = Curation.temperatureSample(df, "id", "src", 0.5, 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    val again = Curation.temperatureSample(df, "id", "src", 0.5, 0.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(once === again)
  }

  test("contamination report: per-benchmark attribution, hand-computed") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),      // hits bench A (2 grams)
      (2L, "alpha beta gamma delta epsilon other"),     // hits bench A (1 gram)
      (3L, "one two three four five six seven"),        // hits bench B
      (4L, "nothing shared here at all today friend")   // clean
    ).toDF("doc_id", "text")
    val benches = Seq(
      ("A", "alpha beta gamma delta epsilon zeta"),
      ("B", "zero one two three four five six")
    ).toDF("bench", "qtext")
    val out = Curation.contaminationReport(docs, "doc_id", "text",
        benches, "bench", "qtext", k = 5)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // bench A: docs 1 (grams "a b g d e","b g d e z") and 2 ("a b g d e")
    assert(out("A") === ((2L, 2L, 3L)), s"A was ${out("A")}")
    // bench B: doc 3 shares "one two three four five" and "two three four five six"
    assert(out("B") === ((1L, 2L, 2L)), s"B was ${out("B")}")
    assert(out.size === 2, "clean docs and unmatched benches produce no rows")
  }

  test("temperature sample: kept mass tracks targetFrac across shapes (mass law)") {
    val s = spark
    import s.implicits._
    // three corpora with different skew shapes; expected kept mass is
    // the operator's own contract: per source min(n_s, q_s·frac·N) with
    // q_s = n_s^alpha / Σ n^alpha (the cap binds when a small source
    // can't up-sample past itself — e.g. 9000/500/500 at frac 0.6)
    val shapes = Seq(
      Seq(6000, 3000, 1000),
      Seq(9000, 500, 500),
      Seq(4000, 3000, 2000, 1000))
    for (sizes <- shapes; alpha <- Seq(0.5, 0.7); frac <- Seq(0.3, 0.6)) {
      var off = 0L
      val rows = sizes.zipWithIndex.flatMap { case (nS, si) =>
        val r = (off until off + nS).map(i => (i, s"s$si")); off += nS; r
      }
      val df = rows.toDF("id", "src")
      val n = rows.size
      val z = sizes.map(math.pow(_, alpha)).sum
      val expected = sizes.map(nS =>
        math.min(nS.toDouble, math.pow(nS, alpha) / z * frac * n)).sum
      val kept = Curation.temperatureSample(df, "id", "src", alpha, frac).count()
      assert(math.abs(kept - expected) < 0.04 * n,
        s"sizes=$sizes alpha=$alpha frac=$frac: kept $kept, expected ~$expected")
    }
  }

  test("weighted sample: weight 0 drops all, 1 keeps all, rates scale") {
    val s = spark
    import s.implicits._
    val df = (0L until 4000L).map(i => (i, if (i % 2 == 0) "even" else "odd"))
      .toDF("id", "src")
    val w = when(col("src") === "even", lit(1.0d)).otherwise(lit(0.25d))
    val kept = Curation.weightedSample(df, "id", w)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.count(_._2 == "even") === 2000, "weight 1.0 keeps everything")
    val odd = kept.count(_._2 == "odd")
    assert(odd > 350 && odd < 650, s"0.25 of 2000 kept $odd")
    assert(Curation.weightedSample(df, "id", lit(0.0d)).count() === 0)
    // deterministic: kept odd ids are exactly the 0.25-fraction sample
    val again = Curation.weightedSample(df, "id", w)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(again === kept.toSet)
  }

  test("gram builders equal naive models over randomized texts (bindArray refactor law)") {
    // guards the let-binding rewrite of the HOF gram builders: values
    // must be exactly what the quadratic inline form produced
    val rnd = new scala.util.Random(11)
    val texts = (0L until 60L).map { i =>
      val n = rnd.nextInt(14)
      val seps = Seq(" ", "  ", "\t")
      (i, (0 until n).map(_ => "w" + rnd.nextInt(8))
        .mkString(seps(rnd.nextInt(seps.size))))
    }
    val df = docs(texts: _*)
    for (k <- Seq(2, 3)) {
      val got = df.select(col("id"), explode(graft.operators.Dedup.shingles(col("text"), k)).as("g"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val want = texts.flatMap { case (i, t) =>
        val w = t.split("\\s+").filter(_.nonEmpty)
        if (w.length >= k) w.sliding(k).map(s => (i, s.mkString(" "))).toSeq.distinct
        else Seq.empty
      }.toSet
      assert(got === want, s"shingles k=$k")
      val rep = Curation.repetitionStats(df, "id", "text", k)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      texts.foreach { case (i, t) =>
        val w = t.split("\\s+").filter(_.nonEmpty)
        if (w.length >= k) {
          val grams = w.sliding(k).map(_.mkString(" ")).toSeq
          assert(rep(i) === ((grams.size.toLong, grams.distinct.size.toLong)),
            s"repetitionStats id=$i k=$k")
        } else assert(!rep.contains(i))
      }
    }
  }

  test("DSIR weights: on-target docs outweigh off-target; short docs absent; OOV sane") {
    // target domain: cooking-ish bigrams; corpus mixes on-target copies,
    // off-target legalese, and a 1-token doc (no bigrams -> absent)
    val target = docs(
      100L -> "stir the sauce and season the sauce with salt",
      101L -> "simmer the sauce then season with salt and pepper")
    val corpus = docs(
      1L -> "stir the sauce and season with salt",      // on-target
      2L -> "the party of the first part hereby waives", // off-target
      3L -> "simmer the sauce with salt and pepper",     // on-target
      4L -> "notwithstanding any provision herein the parties agree",
      5L -> "word")                                      // 1 token
    val w = Curation.dsirWeights(corpus, "id", "text", target, "text",
      vocab = 64, smoothing = 1.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!w.contains(5L), "doc under 2 tokens has no features")
    assert(w.keySet === Set(1L, 2L, 3L, 4L))
    // per-gram normalization isn't needed for the ranking law: on-target
    // docs must beat off-target docs on the LOG weight
    val onT = Seq(w(1L)._2, w(3L)._2).min
    val offT = Seq(w(2L)._2, w(4L)._2).max
    assert(onT > offT, s"on-target $onT must outweigh off-target $offT: $w")
    // n_grams = token count - 1 (occurrences, not distinct)
    assert(w(1L)._1 === 6L)
    // determinism across reruns
    val again = Curation.dsirWeights(corpus, "id", "text", target, "text",
      vocab = 64, smoothing = 1.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(again === w)
  }

  test("DSIR model: save/load roundtrip scores identically; per-row scorer matches the aggregate form") {
    val target = docs(
      100L -> "stir the sauce and season the sauce with salt",
      101L -> "simmer the sauce then season with salt and pepper")
    val corpus = docs(
      1L -> "stir the sauce and season with salt",
      2L -> "the party of the first part hereby waives",
      3L -> "simmer the sauce with salt and pepper",
      4L -> "notwithstanding any provision herein the parties agree",
      5L -> "word")
    val model = Curation.trainDsirModel(corpus, "text", target, "text",
      vocab = 64, smoothing = 1.0)
    val dir = java.nio.file.Files.createTempDirectory("dsirm").toString
    Curation.saveDsirModel(model, spark, s"$dir/m")
    val loaded = Curation.loadDsirModel(spark, s"$dir/m")
    assert(loaded.ratios.toMap === model.ratios.toMap)
    assert(loaded.oovLr === model.oovLr)
    assert(loaded.vocab === model.vocab && loaded.smoothing === model.smoothing)
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val agg = snap(Curation.dsirScore(corpus, "id", "text", model))
    assert(snap(Curation.dsirScore(corpus, "id", "text", loaded)) === agg)
    // per-row scorer: same rows once the no-feature docs are filtered
    // (the projection form emits (0, 0.0) where the exploded form omits)
    val rows = Curation.dsirScoreRows(corpus, "id", "text", model)
    assert(snap(rows.filter(col("n_grams") > 0)) === agg)
    assert(snap(rows).exists(r => r._1 === 5L && r._2 === 0L))
    // and dsirWeights is exactly train-then-score
    assert(snap(Curation.dsirWeights(corpus, "id", "text", target, "text",
      vocab = 64)) === agg)
  }

  test("DSIR per-row scorer == aggregate scorer over randomized non-ASCII text") {
    // The two scorers tokenize through different code: dsirScore via SQL
    // lower() + regexp_extract_all, dsirScoreRows via a Java Pattern over
    // String.toLowerCase(Locale.ROOT). Unicode case-mapping edge cases —
    // dotted/dotless I, sharp s, final sigma, supplementary-plane chars
    // whose case pair lives outside the BMP — are exactly where such
    // twins drift apart, so the parity contract is pinned over texts
    // stuffed with them (ADVICE r11).
    val edge = Array(
      "İstanbul", // İ: lowercases to i + combining dot in both paths?
      "DIYARBAKIR", "straße", "STRAẞE", // ß and capital ẞ
      "Σοφός ΣΑ", // Σ → σ/ς finals
      "𐐀𐐨", // Deseret 𐐀 (upper) + 𐐨 (lower), non-BMP
      "café naïve ÉCOLE", "ıssiz IRMAK", // ı dotless
      "x́ÿz", // combining marks between word chars
      "Ab_9 7alpha __", "ＡＢＣ １２", // full-width A1
      "中文 words mixed 日本語")
    val rnd = new scala.util.Random(42)
    def text(): String =
      Seq.fill(3 + rnd.nextInt(8))(edge(rnd.nextInt(edge.length))).mkString(" ")
    val corpus = docs((1L to 60L).map(i => i -> text()): _*)
    val target = docs((100L to 110L).map(i => i -> text()): _*)
    val model = Curation.trainDsirModel(corpus, "text", target, "text",
      vocab = 128, smoothing = 1.0)
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val agg = snap(Curation.dsirScore(corpus, "id", "text", model))
    val rows = snap(Curation.dsirScoreRows(corpus, "id", "text", model)
      .filter(col("n_grams") > 0))
    assert(rows === agg,
      s"tokenizer drift on non-ASCII text:\nonly-agg=${(agg -- rows).take(5)}\nonly-rows=${(rows -- agg).take(5)}")
  }

  test("DSIR select: k rows, dense ranks, key = logw + deterministic Gumbel") {
    val target = docs(100L -> "alpha beta gamma delta alpha beta")
    val corpus = docs((1L to 40L).map(i =>
      i -> (if (i % 4 == 0) "alpha beta gamma delta" else "zeta eta theta iota kappa")): _*)
    val sel = Curation.dsirSelect(corpus, "id", "text", target, "text",
      k = 8, vocab = 32)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(sel.length === 8)
    assert(sel.map(_._1).toSeq === (1 to 8), "dense ranks in order")
    assert(sel.map(_._2).distinct.length === 8, "without replacement")
    // recompute the Gumbel key independently for each picked row
    sel.foreach { case (_, id, logw, key) =>
      val mix = (id * 2654435761L) % 4294967296L
      val u = (mix + 0.5d) / 4294967296.0d
      val expect = BigDecimal(logw - math.log(-math.log(u)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(key - expect) < 1e-9, s"id=$id key=$key expect=$expect")
    }
    // keys descend with rank
    assert(sel.sliding(2).forall(p => p(0)._4 >= p(1)._4))
  }
}
