package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization laws.
  *
  * The exactness law uses a corpus of exactly `ksub` vectors: the
  * deterministic k-means init places every sample subvector on a
  * centroid and Lloyd's cannot move a centroid that owns exactly one
  * point, so encoding is LOSSLESS — reconstruction equals the
  * normalized input and the full IVFPQ pipeline must reproduce brute
  * force bit-for-bit. Recall floors at production-ish shapes are pinned
  * in AnnRecallSpec (64-dim fixture and 256-dim synth). */
class PqSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("pq-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def synthCorpus(n: Int, dim: Int): DataFrame = {
    val gen = udf((id: Long) => graft.tools.EmbedSynth.vector(id, dim, 4, 0.3))
    spark.range(n).select(col("id").as("vec_id"), gen(col("id")).as("e"))
  }

  test("encode/decode is lossless when every sample vector seeds a centroid") {
    val c = synthCorpus(8, 8)
    val model = Pq.trainPq(c, "vec_id", "e", m = 2, ksub = 8, iters = 4)
    assert(model.dsub == 4 && model.codebooks.length == 2)
    val rows = c.orderBy("vec_id").collect()
    rows.foreach { r =>
      val v = Similarity.normalize(r.getSeq[Double](1).toArray)
      val rec = Pq.decode(model, Pq.encode(model, r.getSeq[Double](1).toArray))
      v.zip(rec).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    }
  }

  test("lossless regime: ivfPqTopK == bruteForceTopK exactly") {
    val c = synthCorpus(8, 8)
    val q = c.filter(col("vec_id") < 3)
    val exact = Similarity.bruteForceTopK(q, "vec_id", "e", c, "vec_id", "e", k = 3)
      .orderBy("query_id", "rank").collect()
    val pq = Pq.ivfPqTopK(q, "vec_id", "e", c, "vec_id", "e",
      k = 3, nlist = 2, nprobe = 2, m = 2, ksub = 8, refine = 3)
      .orderBy("query_id", "rank").collect()
    assert(pq.toSeq == exact.toSeq)
  }

  test("shortlist saturation: ivfPqTopK skips ADC, answers unchanged") {
    val c = synthCorpus(200, 16)
    val q = c.filter(col("vec_id") < 5)
    // budget 3*30000 clears SaturationCheckFloor and covers the 200-row
    // corpus -> ADC provably keeps every candidate, so the plan may skip
    // it; budget 3*100 covers the corpus too but sits under the floor ->
    // ADC runs. Exhaustive either way: answers must match row for row.
    val sat = Pq.ivfPqTopK(q, "vec_id", "e", c, "vec_id", "e",
      k = 3, nlist = 4, nprobe = 4, m = 4, ksub = 16, refine = 30000)
    val adc = Pq.ivfPqTopK(q, "vec_id", "e", c, "vec_id", "e",
      k = 3, nlist = 4, nprobe = 4, m = 4, ksub = 16, refine = 100)
    assert(!sat.queryExecution.executedPlan.toString.contains("adc_score"),
      "saturated budget must skip the ADC stage")
    assert(adc.queryExecution.executedPlan.toString.contains("adc_score"),
      "sub-floor budget must keep the ADC stage")
    val a = sat.orderBy("query_id", "rank").collect()
    val b = adc.orderBy("query_id", "rank").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("codes are m bytes and deterministic across runs") {
    val c = synthCorpus(64, 16)
    val model = Pq.trainPq(c, "vec_id", "e", m = 4, ksub = 8)
    val enc1 = Pq.encodePq(c, "vec_id", "e", model).orderBy("vec_id").collect()
    val enc2 = Pq.encodePq(c, "vec_id", "e", model).orderBy("vec_id").collect()
    enc1.zip(enc2).foreach { case (a, b) =>
      val ba = a.getAs[Array[Byte]]("codes"); val bb = b.getAs[Array[Byte]]("codes")
      assert(ba.length == 4)
      assert(java.util.Arrays.equals(ba, bb))
    }
  }

  test("quantization error shrinks as ksub grows (more centroids per subspace)") {
    val c = synthCorpus(512, 16)
    def meanErr(ksub: Int): Double = {
      val model = Pq.trainPq(c, "vec_id", "e", m = 4, ksub = ksub, iters = 8)
      val rows = c.collect()
      rows.map { r =>
        val v = Similarity.normalize(r.getSeq[Double](1).toArray)
        val rec = Pq.decode(model, Pq.encode(model, r.getSeq[Double](1).toArray))
        math.sqrt(v.zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum)
      }.sum / rows.length
    }
    val e4 = meanErr(4); val e32 = meanErr(32)
    assert(e32 < e4, f"ksub=32 err $e32%.4f not below ksub=4 err $e4%.4f")
  }

  test("ADC identity: table-lookup score == <normalized query, decoded codes>") {
    // By construction, summing the per-subspace LUT entries a code
    // selects IS the inner product with the code's reconstruction — an
    // exact algebraic identity (up to summation-order ulps). Pinning it
    // catches LUT layout bugs (j*ksub+c index mix-ups, subspace offset
    // slips) deterministically, where recall floors would only catch
    // them statistically.
    val c = synthCorpus(64, 16)
    val model = Pq.trainPq(c, "vec_id", "e", m = 4, ksub = 16)
    val vecs = c.orderBy("vec_id").collect().map(_.getSeq[Double](1).toArray)
    val queries = vecs.take(8).map(Similarity.normalize)
    val codes = vecs.drop(8).take(16).map(x => Pq.encode(model, x))
    for (q <- queries; cd <- codes) {
      // LUT exactly as ivfPqTopK builds it
      val lut = new Array[Double](model.m * model.ksub)
      for (j <- 0 until model.m; cc <- 0 until model.ksub) {
        val ct = model.codebooks(j)(cc)
        var acc = 0.0d
        for (d <- 0 until model.dsub) acc += q(j * model.dsub + d) * ct(d)
        lut(j * model.ksub + cc) = acc
      }
      val adc = graft.plans.GraftExprs.adcScore(cd,
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(lut), model.ksub)
      val rec = Pq.decode(model, cd)
      var dot = 0.0d
      for (d <- 0 until model.dim) dot += q(d) * rec(d)
      assert(math.abs(adc - dot) < 1e-9, s"ADC $adc != <q, decode> $dot")
    }
  }

  test("semanticDedupPq == semanticDedup exactly (Cauchy-Schwarz prefilter bound)") {
    val s = spark
    import s.implicits._
    val base = synthCorpus(300, 16)
    // planted exact-direction duplicates (cosine exactly 1.0)
    val planted = base.unionByName(
      base.filter(col("vec_id") < 30).select((col("vec_id") + 100000).as("vec_id"),
        transform(col("e"), x => x * 2).as("e")))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2, t._3))
    val exact = rows(Similarity.semanticDedup(planted, "vec_id", "e", k = 6, threshold = 0.9))
    val pq = rows(Pq.semanticDedupPq(planted, "vec_id", "e", k = 6, threshold = 0.9,
      m = 4, ksub = 32))
    Dedup.unpersistAll(spark)
    assert(pq.toSeq === exact.toSeq,
      s"PQ-prefiltered SemDeDup must equal the exact pair search (${pq.length} vs ${exact.length})")
    assert(exact.nonEmpty, "planted duplicates must produce pairs")
  }

  test("dimension mismatch fails loudly, corrupt vectors never encode") {
    val c = synthCorpus(16, 8)
    val model = Pq.trainPq(c, "vec_id", "e", m = 2, ksub = 8)
    val bad = Array.fill(12)(0.5d)
    val ex = intercept[IllegalArgumentException](Pq.encode(model, bad))
    assert(ex.getMessage.contains("dimension"))
  }
}
