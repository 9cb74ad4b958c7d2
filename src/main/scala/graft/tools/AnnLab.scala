package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Recall/probe-cost curves for the approximate ANN paths, measured
  * against the exact brute-force baseline on the embeddings fixture —
  * the data behind the recall floors pinned in AnnRecallSpec and the
  * table in README. Run:
  * {{{ sbt "runMain graft.tools.AnnLab /root/testdata/sf0.01" }}}
  *
  * Cost proxy: candidate pairs scored (the exact-cosine rerank work) as
  * a fraction of the full |queries|x|corpus| cross product the brute
  * force pays. Everything here is deterministic (seeded hyperplanes,
  * sampled k-means), so the numbers are reproducible run to run. */
object AnnLab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .persist()
    val n = e.count()
    val q = e.filter(col("vec_id") < 20).persist()
    val nq = q.count()
    val k = 5
    val exact = Similarity.bruteForceTopK(q, "vec_id", "e", e, "vec_id", "e", k = k)
      .select("query_id", "corpus_id").persist()
    val nExact = exact.count()
    println(s"corpus=$n queries=$nq k=$k exact_pairs=$nExact cross=${nq * n}")

    def recallOf(approx: DataFrame): Double =
      exact.join(approx.select("query_id", "corpus_id"),
        Seq("query_id", "corpus_id"), "left_semi").count().toDouble / nExact

    println("\nLSH (planes x bands): recall@5, candidates as % of cross product")
    for ((planes, bands) <- Seq((16, 4), (18, 6), (16, 8), (24, 6), (24, 8))) {
      val qb = Similarity.hyperplaneBuckets(q, "vec_id", "e", 64, planes, bands)
        .select(col("band"), col("bucket"), col("id").as("query_id"))
      val cb = Similarity.hyperplaneBuckets(e, "vec_id", "e", 64, planes, bands)
        .select(col("band"), col("bucket"), col("id").as("corpus_id"))
      val cand = qb.join(cb, Seq("band", "bucket"))
        .filter(col("query_id") =!= col("corpus_id"))
        .dropDuplicates("query_id", "corpus_id").count()
      val r = recallOf(Similarity.lshTopK(q, "vec_id", "e", e, "vec_id", "e",
        dim = 64, k = k, planes = planes, bands = bands))
      println(f"  $planes%2d x $bands%d: recall=$r%.3f candidates=${cand * 100.0 / (nq * n)}%5.1f%%")
    }

    println("\nIVF (nlist=8): recall@5, cells probed")
    for (nprobe <- Seq(1, 2, 4, 8)) {
      val r = recallOf(Similarity.ivfTopK(q, "vec_id", "e", e, "vec_id", "e",
        k = k, nlist = 8, nprobe = nprobe))
      println(f"  nprobe=$nprobe%d: recall=$r%.3f probe_fraction=${nprobe / 8.0}%.3f")
    }
    spark.stop()
  }
}
