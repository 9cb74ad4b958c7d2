package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic embedding corpus at PRODUCTION dimensionality.
  * The driver fixture ships 64-wide vectors; real text embeddings are
  * 256–1024-wide, and every ANN/SemDeDup cost (probe UDF time, broadcast
  * centroid bytes, pair-verify dot products, shuffle row width) scales
  * with dim — so the scale story needs measurements at a realistic width
  * (r9 verdict, missing #3).
  *
  * Shape: `nClusters` centroids at hash-derived coordinates in [-1, 1],
  * vector `id` = centroid(id % nClusters) + `noise` · hash-unit jitter —
  * clustered like real embedding spaces (IVF has structure to find),
  * fully determined by (id, dim, nClusters, noise) regardless of
  * partitioning, so specs can pin exact recall floors against it.
  */
object EmbedSynth {

  private def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** hash → uniform double in [-1, 1] */
  private def unit(h: Long): Double = (h >>> 11).toDouble / (1L << 52).toDouble - 1.0

  def vector(id: Long, dim: Int, nClusters: Int, noise: Double): Array[Double] = {
    val c = (id % nClusters).toInt
    Array.tabulate(dim) { d =>
      unit(mix(0xC0FFEE_00L + c * 4099L + d)) +
        noise * unit(mix(id * 7919L + d * 104729L))
    }
  }

  /** (vec_id, e: array<double>) corpus of `n` vectors. */
  def corpus(spark: SparkSession, n: Long, dim: Int,
      nClusters: Int = 32, noise: Double = 0.25): DataFrame = {
    val gen = udf((id: Long) => vector(id, dim, nClusters, noise))
    spark.range(n).select(col("id").as("vec_id"), gen(col("id")).as("e"))
  }
}
