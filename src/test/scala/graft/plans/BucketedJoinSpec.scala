package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Scale evidence for the co-located-join strategy: writing both join
  * sides bucketed (and sorted) by the join key lets Spark plan the join
  * with NO shuffle exchange — the 100 TB recipe for repeated joins on the
  * same key (bucket once at ingest, join shuffle-free forever after).
  * AQE and auto-broadcast are disabled so the physical plan under test is
  * the real sort-merge path, not a small-data shortcut.
  */
class BucketedJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val warehouse = Files.createTempDirectory("graft-warehouse").toString

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("bucketed-join-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("bucketed+sorted tables join with zero shuffle exchanges, same result as plain join") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_orderpriority")

    li.write.mode("overwrite").bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bkt")
    ord.write.mode("overwrite").bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("ord_bkt")

    val joined = spark.table("li_bkt")
      .join(spark.table("ord_bkt"), col("l_orderkey") === col("o_orderkey"))
    val shuffles = joined.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(shuffles.isEmpty,
      s"bucketed join should be shuffle-free, found: ${shuffles.map(_.nodeName)}")

    val bucketed = joined.groupBy("o_orderpriority")
      .agg(sum("l_quantity").as("q")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(sum("l_quantity").as("q")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(bucketed === plain)
  }
}
