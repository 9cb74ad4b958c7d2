package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The bounded-heap top-k aggregate must be bit-compatible with the
  * row_number window it replaces — same survivors, same ranks, same
  * tie-break (score desc, id asc) — including under heavy score ties
  * (the replicated-corpus regime) and through a real multi-partition
  * shuffle (serialize/merge path). */
class TopKByScoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  /** Deterministic sampler (scalatestplus bridge isn't in the offline
    * dependency set — sample the Gen directly, fixed seed). */
  private def forAll[A](g: Gen[A], n: Int = 200)(body: A => Unit): Unit =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L)).get.foreach(body)

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("topk-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("heap == sort reference on random offers (property)") {
    // scores drawn from a small set so ties are dense; k varies
    val gen = for {
      k <- Gen.choose(1, 7)
      xs <- Gen.listOf(Gen.zip(
        Gen.choose(0, 9).map(_ / 4.0), Gen.choose(-50L, 50L)))
    } yield (k, xs)
    forAll(gen) { case (k, xs) =>
      val h = new TopKHeap(k)
      xs.foreach { case (s, id) => h.offer(s, id) }
      val got = h.sortedPairs().toSeq
      val want = xs.sortWith { (a, b) =>
        if (a._1 == b._1) a._2 < b._2
        else java.lang.Double.compare(a._1, b._1) > 0
      }.take(k)
      assert(got === want)
    }
  }

  test("heap tie-break: equal scores keep the smallest ids, in order") {
    val h = new TopKHeap(3)
    Seq(5L, 1L, 9L, 3L, 7L).foreach(id => h.offer(1.0, id))
    assert(h.sortedPairs().toSeq === Seq((1.0, 1L), (1.0, 3L), (1.0, 5L)))
  }

  test("heap NaN sorts above every real score (SQL DESC semantics)") {
    val h = new TopKHeap(2)
    h.offer(0.9, 1L); h.offer(Double.NaN, 2L); h.offer(1.0, 3L)
    val got = h.sortedPairs().toSeq
    assert(got.head._2 === 2L && got(1) === ((1.0, 3L)))
  }

  test("heap -0.0 ties 0.0 (SQL double ordering), id breaks the tie") {
    val h = new TopKHeap(2)
    h.offer(0.0, 5L); h.offer(-0.0, 2L); h.offer(-1.0, 1L)
    assert(h.sortedPairs().toSeq === Seq((-0.0, 2L), (0.0, 5L)))
  }

  test("heap NaN ties NaN (SQL double ordering), id breaks the tie") {
    // Primitive NaN == NaN is false AND Double.compare(NaN, NaN) == 0, so
    // a naive better() never consults ids for two NaN scores — but Spark's
    // double ordering treats NaN as equal to NaN, and the window this
    // aggregate replaces tie-broke NaN rows by id asc. Eviction and final
    // order must both honor that (r13 advisory).
    val h = new TopKHeap(2)
    h.offer(Double.NaN, 7L); h.offer(Double.NaN, 3L); h.offer(Double.NaN, 5L)
    val got = h.sortedPairs().toSeq
    assert(got.map(_._2) === Seq(3L, 5L), s"NaN ties must keep smallest ids: $got")
    assert(got.forall(_._1.isNaN))
    // and a real score never beats NaN regardless of arrival order
    val h2 = new TopKHeap(2)
    h2.offer(1.0, 9L); h2.offer(Double.NaN, 7L); h2.offer(Double.NaN, 3L)
    assert(h2.sortedPairs().toSeq.map(_._2) === Seq(3L, 7L))
  }

  test("aggregate == row_number window through a real shuffle, with ties") {
    // 40 keys x 500 rows, scores drawn from 8 distinct values so every
    // key has deep ties; 4 input partitions force serialize+merge
    val df = spark.range(20000).repartition(4)
      .select((col("id") % 40).as("key"), col("id").as("rid"),
        ((col("id") * 2654435761L) % 8).cast("double").as("score"))
      .persist()
    df.count()
    val k = 7
    val agg = df.groupBy(col("key"))
      .agg(TopKByScore.topKCol(col("score"), col("rid"), k).as("tk"))
      .select(col("key"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("key"), col("e.id").as("rid"), col("e.score").as("score"),
        (col("pos") + 1).cast("int").as("rank"))
    val w = Window.partitionBy("key").orderBy(col("score").desc, col("rid"))
    val win = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("key"), col("rid"), col("score"), col("rank"))
    assert(agg.exceptAll(win).isEmpty && win.exceptAll(agg).isEmpty,
      "aggregate and window must produce identical (key, id, score, rank) rows")
    assert(agg.count() === 40L * k)
    df.unpersist()
  }

  test("registered ANN queries engage the heap fast path on the driver corpus") {
    // vec_id is BIGINT in the driver testdata; if that ever drifts (or a
    // select changes the id dtype), rankTopK silently falls back to the
    // row_number window — this pins the fast path on the real surface
    val df = graft.SparkEntry.queries("ann_bruteforce")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("topk_by_score"),
      s"expected the heap aggregate in ann_bruteforce's plan, got:\n$plan")
    assert(df.count() > 0)
  }

  test("partial aggregation is in the plan (map-side heaps, not a full shuffle)") {
    val df = spark.range(1000)
      .select((col("id") % 4).as("key"), col("id").as("rid"),
        col("id").cast("double").as("score"))
    val agg = df.groupBy(col("key"))
      .agg(TopKByScore.topKCol(col("score"), col("rid"), 3).as("tk"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected an object aggregate, got:\n$plan")
    assert(plan.contains("partial_topk_by_score"),
      s"expected a partial (map-side) aggregation stage, got:\n$plan")
  }
}
