package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Filtered vector search at rung scale (r18): a 20 M-vector IVF index
  * built with a stored metadata column (`writeIvfIndex(metaCols)`),
  * probed with and without a predicate
  * (`ivfTopKIndexed(filter = Some(...))`). The claims measured:
  *
  *  - the predicate rides INSIDE the cell-pruned parquet scan (pushdown
  *    — plan-asserted in-run), so a filtered probe costs no more than
  *    an unfiltered one (it reads the same pruned files and keeps
  *    fewer rows — no join, no second pass);
  *  - every filtered answer satisfies the predicate (required in-run);
  *  - at FULL probe the filtered answer equals brute force over the
  *    predicate-filtered corpus (required in-run, per query) — the
  *    exactness contract `ann_ivf_filtered` states at sf0.01, held at
  *    20 M.
  *
  * The r19 arms:
  *
  *  - `--recall`: the filtered-probe RECALL contract — backfill finer
  *    selectivity columns onto the stored index
  *    ([[Similarity.backfillMetaCols]], itself the 20 M upgrade-path
  *    measurement: one id-keyed join + republish vs the 160 s rebuild),
  *    then sweep selectivity (50 % / 10 % / 1 %) × nprobe (8/32/128)
  *    against brute-force-over-filtered recall@10, plus an
  *    ultra-selective (0.01 %) point where `minCandidates` auto-widen
  *    is the difference between thin shortlists and full answers;
  *  - `--deleted`: filtered + deleted composition — a ~210 K-id ledger
  *    live (probe cost with the anti-join), then the purge, then the
  *    post-purge probe (the last unmeasured composition).
  *
  * Run: {{{
  *   SPARK_DRIVER_MEM=24g sbt "runMain graft.tools.FilterScaleLab \
  *     --n 20000000 --nlist 256 --nprobe 8 [--reuseIndex] [--recall] [--deleted]"
  * }}} */
object FilterScaleLab {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    var n = 20000000L
    var dim = 64
    var nlist = 256
    var nprobe = 8
    var k = 20
    var partitions = 64
    var noise = 2.0
    var root = "/tmp/graft_filterlab"
    var reuseIndex = false
    var doRecall = false
    var doDeleted = false
    var skipBase = false
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--n" => n = args(i + 1).toLong; i += 2
        case "--dim" => dim = args(i + 1).toInt; i += 2
        case "--nlist" => nlist = args(i + 1).toInt; i += 2
        case "--nprobe" => nprobe = args(i + 1).toInt; i += 2
        case "--k" => k = args(i + 1).toInt; i += 2
        case "--partitions" => partitions = args(i + 1).toInt; i += 2
        case "--root" => root = args(i + 1); i += 2
        case "--reuseIndex" => reuseIndex = true; i += 1
        case "--recall" => doRecall = true; i += 1
        case "--deleted" => doDeleted = true; i += 1
        case "--skipBase" => skipBase = true; i += 1
        case other => sys.error(s"unknown arg $other")
      }
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", partitions.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val gen = udf((id: Long) => EmbedSynth.vector(id, dim, 32, noise))
    def vecs(lo: Long, hi: Long) =
      spark.range(lo, hi, 1, partitions)
        .select(col("id").as("vec_id"), gen(col("id")).as("e"),
          pmod(col("id"), lit(4)).cast("int").as("category"))
    val idx = s"$root/idx"
    println(s"""{"corpus":"inplan:$n:dim$dim","nlist":$nlist,"nprobe":$nprobe,"meta":"category=id%4"}""")
    if (!reuseIndex) {
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val (_, buildS) = t(Similarity.writeIvfIndex(vecs(0, n), "vec_id", "e", idx,
        nlist = nlist, metaCols = Seq("category")))
      println(f"""{"step":"build_with_meta","rows":$n,"secs":$buildS%.1f}""")
    }
    val cents = Similarity.loadIvfCentroids(spark, idx)

    if (doRecall) {
      // ---- the metadata UPGRADE path at rung scale (r19): join two
      // finer selectivity columns onto the stored 20 M corpus through
      // backfillMetaCols — the one-join remedy this lab then uses for
      // the recall sweep, and the measured alternative to a rebuild
      val have = spark.read.parquet(s"$idx/corpus").columns.toSet
      if (!have.contains("cat100")) {
        val meta = spark.range(0, n, 1, partitions).select(
          col("id").as("vec_id"),
          pmod(col("id"), lit(100)).cast("int").as("cat100"),
          pmod(col("id"), lit(10000)).cast("int").as("cat10k"))
        val (_, bfS) = t(Similarity.backfillMetaCols(spark, idx, meta,
          idCol = "vec_id", metaCols = Seq("cat100", "cat10k")))
        println(f"""{"step":"backfill_meta","rows":$n,"cols":2,"secs":$bfS%.1f}""")
      }
      // ---- recall@10 vs brute force over the filtered corpus:
      // selectivity (50/10/1 %) x nprobe (8/32/128), 8 queries at once
      val kR = 10
      val qn = 8
      val qR = (0 until qn).map(qi => 1000L * qi + 7)
        .map(v => vecs(v, v + 1).select("vec_id", "e")).reduce(_ union _)
      def recallOf(got: Array[org.apache.spark.sql.Row],
          truth: Map[Long, Set[Long]]): Double = {
        val byQ = got.map(r => (r.getLong(0), r.getLong(1)))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
        truth.map { case (q, t) =>
          byQ.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
        }.sum / truth.size
      }
      for (sel <- Seq(50, 10, 1)) {
        val pred = col("cat100") < sel
        val (truthRows, bfS) = t(Similarity.bruteForceTopK(qR, "vec_id", "e",
            vecs(0, n).filter(pmod(col("vec_id"), lit(100)) < sel),
            "vec_id", "e", k = kR).collect())
        val truth = truthRows.map(r => (r.getLong(0), r.getLong(1)))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        println(f"""{"step":"truth","selectivity_pct":$sel,"brute_force_secs":$bfS%.1f}""")
        for (np <- Seq(8, 32, 128)) {
          val (got, s) = t(Similarity.ivfTopKIndexed(qR, "vec_id", "e", idx,
            k = kR, nprobe = np, cents = cents, filter = Some(pred),
            minCandidates = 0).collect())
          println(f"""{"step":"recall","selectivity_pct":$sel,"nprobe":$np,"recall_at_10":${recallOf(got, truth)}%.4f,"probe_secs":$s%.2f,"queries":$qn}""")
        }
      }
      // ---- the ultra-selective point (0.01 % ~ ${n/10000} rows): where
      // candidate counts actually fall below k and minCandidates is the
      // difference between thin shortlists and full answers
      val predU = col("cat10k") === 7
      val (truthU, bfUS) = t(Similarity.bruteForceTopK(qR, "vec_id", "e",
          vecs(0, n).filter(pmod(col("vec_id"), lit(10000)) === 7),
          "vec_id", "e", k = kR).collect())
      val truthUm = truthU.map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      println(f"""{"step":"truth","selectivity_pct":0.01,"brute_force_secs":$bfUS%.1f}""")
      for (mc <- Seq(0, 20 * kR)) {
        val (got, s) = t(Similarity.ivfTopKIndexed(qR, "vec_id", "e", idx,
          k = kR, nprobe = 8, cents = cents, filter = Some(predU),
          minCandidates = mc).collect())
        println(f"""{"step":"recall_ultra","nprobe":8,"min_candidates":$mc,"recall_at_10":${recallOf(got, truthUm)}%.4f,"rows":${got.length},"probe_secs":$s%.2f}""")
      }
    }

    if (doDeleted) {
      // ---- filtered + deleted at rung scale (r19): a ~210 K-id ledger
      // live, the filtered probe pays its broadcast anti-join; then the
      // purge retires it and the probe returns to the filtered baseline
      val qD = (0 until 5).map(qi => 1000L * qi + 7)
        .map(v => vecs(v, v + 1).select("vec_id", "e")).reduce(_ union _)
      val predD = col("category") === 1
      def probeD() = Similarity.ivfTopKIndexed(qD, "vec_id", "e", idx,
        k = k, nprobe = nprobe, cents = cents, filter = Some(predD),
        minCandidates = 0)
      val del = spark.range(0, n).filter(pmod(col("id"), lit(95)) === 7)
        .select(col("id"))
      val (_, delS) = t(Similarity.deleteFromIvfIndex(del, idx))
      val nDel = n / 95
      println(f"""{"step":"delete","ids":$nDel,"secs":$delS%.1f}""")
      var withLedger = Double.MaxValue
      for (_ <- 1 to 2) {
        val (r, s) = t(probeD().collect())
        require(r.forall(row => row.getLong(1) % 95 != 7),
          "no tombstoned id may surface")
        withLedger = math.min(withLedger, s)
        println(f"""{"rep":"probe_with_ledger","secs":$s%.2f}""")
      }
      println(f"""{"step":"filtered_probe_with_ledger","queries":5,"secs":$withLedger%.2f}""")
      val (cellsRw, purgeS) = t(Similarity.purgeIvfDeletes(spark, idx))
      println(f"""{"step":"purge","cells_rewritten":$cellsRw,"secs":$purgeS%.1f}""")
      var after = Double.MaxValue
      for (_ <- 1 to 2) {
        val (_, s) = t(probeD().count())
        after = math.min(after, s)
        println(f"""{"rep":"probe_after_purge","secs":$s%.2f}""")
      }
      println(f"""{"step":"filtered_probe_after_purge","queries":5,"secs":$after%.2f}""")
      // exactness: filtered + purged == brute force over (filtered minus
      // deleted), one query
      val q1 = vecs(1007, 1008).select("vec_id", "e")
      val got = Similarity.ivfTopKIndexed(q1, "vec_id", "e", idx,
          k = k, nprobe = nlist, cents = cents, filter = Some(predD),
          minCandidates = 0)
        .collect().map(r => (r.getLong(1), r.getInt(3))).sortBy(_._2).toSeq
      val want = Similarity.bruteForceTopK(q1, "vec_id", "e",
          vecs(0, n).filter(col("category") === 1 &&
            pmod(col("vec_id"), lit(95)) =!= 7), "vec_id", "e", k = k)
        .collect().map(r => (r.getLong(1), r.getInt(3))).sortBy(_._2).toSeq
      require(got == want, "filtered+purged must equal brute force over the live filtered corpus")
      println(s"""{"step":"exactness_deleted","equal":true}""")
    }

    if (skipBase) { spark.stop(); return }
    val flt = Some(col("category") === 1)
    // pushdown is structural, assert it once outside the timed loop
    val plan = Similarity.ivfTopKIndexed(vecs(7, 8).select("vec_id", "e"),
        "vec_id", "e", idx, k = k, nprobe = nprobe, cents = cents, filter = flt, minCandidates = 0)
      .queryExecution.executedPlan.toString
    require(plan.contains("PushedFilters: [") && plan.contains("category"),
      s"metadata predicate must push into the index scan:\n$plan")
    println(s"""{"step":"plan","filter_pushed":true}""")

    // pruned-probe cost: filtered vs unfiltered over the same queries,
    // min-of-2 alternating (cold file cache absorbed by rep 1)
    val q = (0 until 5).map(qi => 1000L * qi + 7)
      .map(v => vecs(v, v + 1).select("vec_id", "e")).reduce(_ union _)
    var unf = Double.MaxValue; var fil = Double.MaxValue
    var filRows: Array[org.apache.spark.sql.Row] = null
    for (_ <- 1 to 2) {
      val (_, s1) = t(Similarity.ivfTopKIndexed(q, "vec_id", "e", idx,
        k = k, nprobe = nprobe, cents = cents, filter = None, minCandidates = 0).count())
      val (r2, s2) = t(Similarity.ivfTopKIndexed(q, "vec_id", "e", idx,
        k = k, nprobe = nprobe, cents = cents, filter = flt, minCandidates = 0).collect())
      unf = math.min(unf, s1); fil = math.min(fil, s2); filRows = r2
      println(f"""{"rep":"probe","unfiltered_secs":$s1%.2f,"filtered_secs":$s2%.2f}""")
    }
    require(filRows.forall(_.getLong(1) % 4 == 1),
      "every filtered answer must satisfy the predicate")
    println(f"""{"step":"pruned_probe","queries":5,"unfiltered_secs":$unf%.2f,"filtered_secs":$fil%.2f}""")

    // exactness at FULL probe vs brute force over the filtered corpus,
    // 2 queries (each brute-force pass scans the in-plan corpus once)
    for (qi <- 0 until 2) {
      val qv = vecs(1000L * qi + 7, 1000L * qi + 8).select("vec_id", "e")
      val (got, fullS) = t(Similarity.ivfTopKIndexed(qv, "vec_id", "e", idx,
          k = k, nprobe = nlist, cents = cents, filter = flt, minCandidates = 0)
        .collect().map(r => (r.getLong(1), r.getInt(3))).sortBy(_._2).toSeq)
      val (want, bfS) = t(Similarity.bruteForceTopK(qv, "vec_id", "e",
          vecs(0, n).filter(col("category") === 1), "vec_id", "e", k = k)
        .collect().map(r => (r.getLong(1), r.getInt(3))).sortBy(_._2).toSeq)
      require(got == want,
        s"full-probe filtered answer must equal brute force over the filtered corpus (query $qi)")
      println(f"""{"step":"exactness","query":$qi,"full_probe_secs":$fullS%.1f,"brute_force_secs":$bfS%.1f,"equal":true}""")
    }
    spark.stop()
  }
}
