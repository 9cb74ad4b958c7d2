package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), with a brute-force baseline and a random-hyperplane
  * LSH scale path. All math is `zip_with`/`aggregate` expressions
  * (whole-stage-codegen'd); no UDF in the hot path.
  */
object Similarity {

  /** Cosine similarity between two array<float|double> columns. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0d), (acc, x) => acc + x))
    dot / (na * nb)
  }

  /** Deterministic pseudo-random unit-ish hyperplanes: component j of plane
    * p derives from a hash of (p, j) mapped to [-1, 1). Seeded — identical
    * on every executor, no broadcast needed, no Math.random. */
  private def planeComponent(p: Int, j: Column): Column =
    (pmod(xxhash64(lit(p), j), lit(1000000L)).cast("double") / 500000.0d) - 1.0d

  /** Sign-bit signature under `planes` hyperplanes, sliced into `bands`
    * bucket keys. Output: (id, v, band, bucket) — one row per band. */
  def hyperplaneBuckets(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      planes: Int,
      bands: Int): DataFrame = {
    val bitsPerBand = planes / bands
    require(planes % bands == 0, "planes must divide into bands")
    val v = col("v")
    // bit p = sign(v · plane_p)
    val bits: Seq[Column] = (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(v, sequence(lit(0), lit(dim - 1)), (x, j) => x * planeComponent(p, j)),
        lit(0.0d), (acc, x) => acc + x)
      when(dot >= 0, 1).otherwise(0)
    }
    df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("sigbits", array(bits: _*))
      .select(col("id"), col("v"),
        explode(array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            xxhash64(concat_ws(",", slice(col("sigbits"), b * bitsPerBand + 1, bitsPerBand))).as("bucket"))
        }: _*)).as("bb"))
      .select(col("id"), col("v"), col("bb.band"), col("bb.bucket"))
  }

  /** Brute-force top-k: exact cosine of every (query, corpus) pair, then a
    * per-query window. The corpus side of the join should be the big one;
    * Spark broadcasts the query side when it is small (hint applied).
    * This is the *correctness baseline*: O(|Q|·|C|) — fine for |Q| small,
    * the standard evaluation harness shape. */
  def bruteForceTopK(
      queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(col(qId).as("query_id"), col(qVec).as("qv")))
    val c = corpus.select(col(cId).as("corpus_id"), col(cVec).as("cv"))
    val scored = c.crossJoin(q)
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), round(col("cosine"), 4).as("cosine"), col("rank"))
  }

  /** LSH-bucketed approximate top-k: candidates share at least one
    * hyperplane band with the query; exact cosine re-ranks candidates.
    * The 100 TB path: corpus is bucketed once (write-side, reusable),
    * each query probes only its own buckets — no cross join, the shuffle
    * is on uniform hash buckets. Recall tunes with planes/bands. */
  def lshTopK(
      queries: DataFrame, qId: String, qVec: String,
      corpus: DataFrame, cId: String, cVec: String,
      dim: Int, k: Int, planes: Int = 16, bands: Int = 4): DataFrame = {
    val qb = hyperplaneBuckets(queries, qId, qVec, dim, planes, bands)
      .select(col("band"), col("bucket"), col("id").as("query_id"), col("v").as("qv"))
    val cb = hyperplaneBuckets(corpus, cId, cVec, dim, planes, bands)
      .select(col("band"), col("bucket"), col("id").as("corpus_id"), col("v").as("cv"))
    val candidates = qb.join(cb, Seq("band", "bucket"))
      .filter(col("query_id") =!= col("corpus_id"))
      .dropDuplicates("query_id", "corpus_id")
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("corpus_id"))
    candidates
      .withColumn("cosine", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), round(col("cosine"), 4).as("cosine"), col("rank"))
  }
}
