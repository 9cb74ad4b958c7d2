package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Bloom runtime-filter properties: no false negatives (the prefilter
  * keeps every true match), and the prefiltered join equals the plain
  * join exactly. */
class RuntimeFilterSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("runtime-filter-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("prefilter is a superset of the semi-join; join result is exact") {
    val s = spark
    import s.implicits._
    val big = (0L until 10000L).map(i => (i, i % 7)).toDF("k", "v")
    val small = (0L until 10000L by 97L).toDF("sk") // ~104 keys
    val semi = big.join(small, big("k") === small("sk"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    val pre = RuntimeFilter.bloomPrefilter(big, "k", small, "sk",
      expectedItems = 1000L).collect().map(_.getLong(0)).toSet
    assert(semi.subsetOf(pre), "bloom must never drop a true match")
    // fpp 1% on ~10K probes: the prefilter should cut the bulk of the table
    assert(pre.size < 2000, s"prefilter kept ${pre.size} of 10000")

    val plain = big.join(small, big("k") === small("sk"))
      .select("k", "v", "sk").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bloomed = RuntimeFilter.bloomPrefilteredJoin(big, "k", small, "sk",
        expectedItems = 1000L)
      .select("k", "v", "sk").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bloomed === plain)
  }

  test("string keys probe as strings — every true match survives") {
    val s = spark
    import s.implicits._
    val big = (0 until 2000).map(i => (s"user$i", i)).toDF("k", "v")
    val small = Seq("user7", "user42", "user1999").toDF("sk")
    val joined = RuntimeFilter.bloomPrefilteredJoin(big, "k", small, "sk",
      expectedItems = 10L).select("k").collect().map(_.getString(0)).toSet
    assert(joined === Set("user7", "user42", "user1999"))
    // mismatched key families must fail loudly, not silently miss
    val longs = Seq(1L, 2L).toDF("sk")
    intercept[IllegalArgumentException] {
      RuntimeFilter.bloomPrefilter(big, "k", longs, "sk")
    }
  }

  test("null keys on the big side are dropped, not crashed on") {
    val s = spark
    import s.implicits._
    val big = Seq(Some(1L), None, Some(2L), Some(99L)).toDF("k")
    val small = Seq(1L, 2L).toDF("sk")
    val out = RuntimeFilter.bloomPrefilteredJoin(big, "k", small, "sk",
      expectedItems = 10L).collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 2L))
  }
}
