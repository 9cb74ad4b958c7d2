package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Head-to-head measurement harness for the round-6 plan changes (same
  * JVM, same session — cross-run comparisons on this VM are noise; see
  * [[NgramLab]]). Compares:
  *
  *  - minhash banding: legacy expression form (numHashes interpreted
  *    xxhash64 passes per shingle + slice/concat bucketing) vs the
  *    Kirsch-Mitzenmacher single-pass UDF now in [[Dedup.minhashNearDups]];
  *  - ngram df-cap: legacy inner-join against the ≤cap gram list vs the
  *    broadcast anti-join against the >cap hot list;
  *  - ann_ivf phase split: centroid training vs the distributed probe.
  *
  * Run: {{{ sbt "runMain graft.tools.PerfLab /root/testdata/sf0.1" }}}
  * An optional second arg limits the run to one section (`dedup`,
  * `throughput`) — the throughput A/B is the one re-pinned per round and
  * shouldn't cost a dedup suite to refresh.
  */
object PerfLab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val section = if (args.length > 1) args(1) else "all"
    def in(s: String): Boolean = section == "all" || section == s
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.storage.StorageLevel

    lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    lazy val d = docs.select(col("doc_id").as("id"), col("text"))
    lazy val corpus = {
      val c = d.unionByName(d.select((col("id") + 100000).as("id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text")))
      c.count(); c
    }

    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$name%-22s rows=${ts.head._2} times=${ts.map(t => f"${t._1}%.2f").mkString(",")} min=${ts.map(_._1).min}%.2f")
    }

    // ---- legacy minhash plan (pre-round-6), inlined for comparison ----
    def minhashLegacy(df: DataFrame): DataFrame = {
      val bands = 16; val rowsPerBand = 4; val numHashes = bands * rowsPerBand
      val sh = df
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("id"), Dedup.shingles(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val banded = sh
        .withColumn("sig", Dedup.minhashSignature(col("sh"), numHashes))
        .select(col("id"),
          explode(array((0 until bands).map { b =>
            struct(lit(b).as("band"),
              xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))).as("bucket"))
          }: _*)).as("bb"))
        .select(col("id"), col("bb.band"), col("bb.bucket"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val candidates = banded.select(col("band"), col("bucket"), col("id").as("id_a"))
        .join(banded.select(col("band"), col("bucket"), col("id").as("id_b")),
          Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
        .dropDuplicates("id_a", "id_b")
      candidates
        .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
        .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
        .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
        .withColumn("jaccard", col("inter").cast("double") / col("uni"))
        .filter(col("jaccard") >= 0.5)
    }

    // ---- legacy ngram df-cap (inner join on the ≤cap list) ----
    def ngramLegacy(df: DataFrame): DataFrame = {
      val threshold = 0.5; val dfCap = 10000
      val sh = df
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("id"), Dedup.shingles(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
      val exploded = sh
        .select(col("id"), size(col("sh")).as("n"), explode(col("sh")).as("g"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val capped = exploded.join(
        exploded.groupBy("g").agg(count(lit(1)).as("gdf")).filter(col("gdf") <= dfCap).select("g"),
        "g")
      val a = capped.select(col("g"), col("id").as("id_a"), col("n").as("n_a"))
      val b = capped.select(col("g"), col("id").as("id_b"), col("n").as("n_b"))
      a.join(b, Seq("g"))
        .filter(col("id_a") < col("id_b")
          && col("n_a") >= col("n_b") * lit(threshold)
          && col("n_b") >= col("n_a") * lit(threshold))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(count(lit(1)).as("inter"))
        .withColumn("jaccard", col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
        .filter(col("jaccard") >= threshold)
    }

    if (in("dedup")) {
      time("minhash legacy") { minhashLegacy(corpus).count() }
      time("minhash km-udf") { Dedup.minhashNearDups(corpus, "id", "text").count() }
      time("ngram legacy-cap") { ngramLegacy(corpus).count() }
      time("ngram anti-cap") { Dedup.ngramJaccardPairs(corpus, "id", "text", 3, 0.5).count() }

      // result parity: candidate generation differs for minhash (different
      // hash family), so compare verified pair sets, which should coincide
      // at this corpus (every planted pair well above threshold)
      val mA = minhashLegacy(corpus).select("id_a", "id_b").collect().map(_.toString).sorted
      val mB = Dedup.minhashNearDups(corpus, "id", "text").select("id_a", "id_b").collect().map(_.toString).sorted
      println(s"minhash pairs: legacy=${mA.length} km=${mB.length} equal=${mA.sameElements(mB)}")
      val nA = ngramLegacy(corpus).select("id_a", "id_b").collect().map(_.toString).sorted
      val nB = Dedup.ngramJaccardPairs(corpus, "id", "text", 3, 0.5).select("id_a", "id_b").collect().map(_.toString).sorted
      println(s"ngram pairs: legacy=${nA.length} anti=${nB.length} equal=${nA.sameElements(nB)}")
      assert(nA.sameElements(nB), "ngram df-cap inversion changed the result")
    }

    if (in("ivf")) {
      // ---- ann_ivf phase split ----
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      e.count()
      val q = e.filter(col("vec_id") < 10)
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        Similarity.trainIvfCentroids(e, "vec_id", "e", nlist = 8)
        val t1 = System.nanoTime()
        Similarity.ivfTopK(q, "vec_id", "e", e, "vec_id", "e", k = 5, nlist = 8, nprobe = 8).count()
        val t2 = System.nanoTime()
        println(f"ivf train=${(t1 - t0) / 1e9}%.2f full=${(t2 - t1) / 1e9}%.2f")
      }
    }

    if (in("rankagg")) {
      // ---- rank window vs aggregate form (r13): the two non-ANN rank
      // tails converted this round, measured on whatever events corpus
      // sfDir carries (point --sf at the 100M-row rung for the real
      // numbers; event_type has ~5 values, so the window arm is the
      // few-strata single-task-sort cliff in its purest form) ----
      val evt = spark.read.parquet(s"$sfDir/events.parquet")
      import org.apache.spark.sql.expressions.Window
      // checksum the PAYLOAD, not count(): count lets Catalyst prune
      // every non-key column out of both plans, which hides the window
      // arm's real shuffle width — the operator contract returns rows
      def sink(df: DataFrame): Long = df.agg(
        sum(length(col("last_type")) + col("last_value"))).collect()(0).getDouble(0).toLong
      time("cdc window") {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        sink(evt.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("user_id"), col("event_id").as("last_event_id"),
            col("ts").as("last_ts"), col("event_type").as("last_type"),
            round(col("value"), 4).as("last_value")))
      }
      time("cdc max_by") {
        sink(evt.groupBy(col("user_id"))
          .agg(max_by(struct(col("event_id"), col("ts"), col("event_type"),
            col("value")), struct(col("ts"), col("event_id"))).as("m"))
          .select(col("user_id"), col("m.event_id").as("last_event_id"),
            col("m.ts").as("last_ts"), col("m.event_type").as("last_type"),
            round(col("m.value"), 4).as("last_value")))
      }
      // scale_up's replica stride puts event_id past mixKey's overflow
      // envelope, and a plain foldKey collides at 100M keys — so compact
      // the (replica, base) structure bijectively instead: id = r·1e9 + b
      // with b < 1e5, key = r·1e5 + b stays unique and in-envelope on
      // both the driver corpus (r = 0) and every scale_up rung.
      val keyed = evt.withColumn("key",
        expr("event_id div 1000000000") * 100000L +
          pmod(col("event_id"), lit(1000000000L)))
      def sinkStrat(df: DataFrame): Long = df.agg(
        sum(length(col("props")) + col("rk"))).collect()(0).getLong(0)
      time("strat window") {
        val w = Window.partitionBy(col("event_type"))
          .orderBy(graft.operators.Curation.mixKey(col("key")), col("key"))
        sinkStrat(keyed.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5))
      }
      time("strat heap") {
        sinkStrat(graft.operators.Curation
          .stratifiedSample(keyed, "event_type", "key", n = 5))
      }
    }

    if (in("join")) {
      // ---- salted join vs plain ----
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val ords = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
      time("join plain") {
        li.join(ords, Seq("l_orderkey")).groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n")).count()
      }
      time("join salted4") {
        graft.operators.Skew.saltedJoin(li, ords, Seq("l_orderkey"), salts = 4)
          .groupBy("o_orderpriority").agg(count(lit(1)).as("n")).count()
      }
    }
    if (!in("throughput")) { spark.stop(); return }

    // ---- xlsx throughput A/B: the two bench numbers that drifted ±10 %
    // between the driver's and builder's runs in rounds 6-7. Interleaved
    // A/B/A/B/A in ONE JVM with per-run times and medians, so the
    // published number carries its own variance instead of depending on
    // which VM ran it (the CsvLab discipline).
    // same 8 columns as graft.Bench's throughput metrics, so these
    // medians correspond 1:1 to the bench JSON keys
    val li4 = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_returnflag", "l_shipdate")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nRows = li4.count()
    def t1(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)
    val runs = 5
    val w1 = Seq.newBuilder[Double]; val ws = Seq.newBuilder[Double]
    (1 to runs).foreach { _ =>
      w1 += t1(li4.coalesce(1).write.mode("overwrite").format("xlsx")
        .option("header", "true").save("/tmp/graft_perflab/x1"))
      ws += t1(li4.repartition(32).write.mode("overwrite").format("xlsx")
        .option("header", "true").option("singleFile", "true")
        .save("/tmp/graft_perflab/x1s/book.xlsx"))
    }
    def row(name: String, xs: Seq[Double]): Unit =
      println(f"$name%-22s rows/s med=${nRows / med(xs)}%.0f " +
        f"spread=[${nRows / xs.max}%.0f..${nRows / xs.min}%.0f] times=${xs.map(x => f"$x%.2f").mkString(",")}")
    row("xlsx write 1core", w1.result())
    row("xlsx write stitched", ws.result())
    def readOne(split: Boolean): Unit = spark.read.format("xlsx")
      .option("header", "true").option("allSheets", "true")
      .option("splitSheets", split.toString)
      .option("splitBytes", 16 * 1024 * 1024)
      .load("/tmp/graft_perflab/x1")
      .agg(count(lit(1))).collect()
    val ru = Seq.newBuilder[Double]; val rs = Seq.newBuilder[Double]
    (1 to runs).foreach { _ => ru += t1(readOne(false)); rs += t1(readOne(true)) }
    row("xlsx read unsplit", ru.result())
    row("xlsx read split", rs.result())

    // ---- csv single-FILE A/B: coalesce(1) funnel vs the round-8 stitch,
    // same plain codec, input pre-shuffled so only the sink is timed
    val liRe = li4.repartition(32).persist(StorageLevel.MEMORY_AND_DISK)
    liRe.count()
    val cf = Seq.newBuilder[Double]; val cS = Seq.newBuilder[Double]
    (1 to runs).foreach { _ =>
      cf += t1(li4.coalesce(1).write.mode("overwrite")
        .option("header", "true").csv("/tmp/graft_perflab/c1"))
      cS += t1(graft.sources.csv.CsvSingleFile.write(
        liRe, "/tmp/graft_perflab/c1s/data.csv", Map("header" -> "true")))
    }
    row("csv write 1core", cf.result())
    row("csv write stitched", cS.result())
    // at 600K rows the stitch is fixed-overhead-bound (32 tiny tasks);
    // the 8x frame shows the per-task volume a real cluster sees — this
    // row corresponds to the bench's csv_write_1file_stitched_repl8 key
    val li8 = (1 to 8).map(_ => li4).reduce(_ union _)
      .repartition(32).persist(StorageLevel.MEMORY_AND_DISK)
    val n8 = li8.count()
    val c8 = Seq.newBuilder[Double]
    (1 to runs).foreach { _ =>
      c8 += t1(graft.sources.csv.CsvSingleFile.write(
        li8, "/tmp/graft_perflab/c8s/data.csv", Map("header" -> "true")))
    }
    val xs8 = c8.result()
    println(f"csv write stitched r8  rows/s med=${n8 / med(xs8)}%.0f " +
      f"spread=[${n8 / xs8.max}%.0f..${n8 / xs8.min}%.0f] times=${xs8.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
