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
  * Run: {{{
  *   SPARK_DRIVER_MEM=24g sbt "runMain graft.tools.FilterScaleLab \
  *     --n 20000000 --nlist 256 --nprobe 8 [--reuseIndex]"
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
