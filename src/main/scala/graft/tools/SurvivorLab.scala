package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scale measurement behind the `neardup_survivors` tail: at organic
  * duplicate density the PAIR list grows with clique² (the r8 audit saw
  * 881× more pairs for 10× data) while the SURVIVOR list is bounded by the
  * corpus — pairs → connectedComponents → min-id survivor is the shape a
  * downstream consumer should take out of the near-dup family. This main
  * prints both cardinalities and times at one sfDir; run it at sf0.1 and
  * at the `tools/scale_up.py --mutate` corpus to see the contrast.
  *
  * Run: {{{ sbt "runMain graft.tools.SurvivorLab /tmp/sf1_organic" }}}
  */
object SurvivorLab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    val nDocs = docs.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // organic near-dup threshold (the dedup_ngram_jaccard setting); the
    // pairs df is recomputed inside the survivor run on purpose — the
    // numbers then reflect the full pipeline a consumer would launch
    val (nPairs, tPairs) = timed {
      Dedup.ngramJaccardPairs(docs, "id", "text", 3, 0.5).count()
    }
    Dedup.unpersistAll(spark)
    val (nSurv, tSurv) = timed {
      val pairs = Dedup.ngramJaccardPairs(docs, "id", "text", 3, 0.5)
      Dedup.keepOnePerComponent(docs, "id", pairs).count()
    }
    Dedup.unpersistAll(spark)
    println(f"docs=$nDocs pairs=$nPairs (${tPairs}%.1f s) " +
      f"survivors=$nSurv (${tSurv}%.1f s) " +
      f"pairs/doc=${nPairs.toDouble / nDocs}%.2f survivors/doc=${nSurv.toDouble / nDocs}%.3f")

    // the bench query's exact-regime shape (corpus ∪ shifted copy,
    // threshold 1.0): min of 3 so closure-overhead changes show through
    // the container's noise
    val corpus = docs.unionByName(docs.select((col("id") + 100000).as("id"), col("text")))
    val ts = (1 to 3).map { _ =>
      Dedup.unpersistAll(spark)
      timed {
        val pairs = Dedup.ngramJaccardPairs(corpus, "id", "text", 3, 1.0)
        Dedup.keepOnePerComponent(corpus, "id", pairs).count()
      }
    }
    println(f"exact-regime survivors=${ts.head._1} times=${ts.map(t => f"${t._2}%.2f").mkString(",")} min=${ts.map(_._2).min}%.2f")
    spark.stop()
  }
}
