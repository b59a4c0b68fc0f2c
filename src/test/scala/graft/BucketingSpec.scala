package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.storage.Bucketing

class BucketingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Execute and unwrap AQE, then count shuffle exchanges in the plan. */
  private def countShuffles(df: DataFrame): Int = {
    df.collect()
    val plan: SparkPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case e: ShuffleExchangeExec => e }.size
  }

  private def dropStale(names: String*): Unit = names.foreach { n =>
    spark.sql(s"DROP TABLE IF EXISTS $n")
    val loc = new java.io.File(s"/tmp/graft-test-warehouse/$n")
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
  }

  test("co-bucketed tables join without a shuffle and match the plain join") {
    dropStale("b_orders", "b_lineitem")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")

    Bucketing.writeBucketed(orders, "b_orders", 8,
      Seq("o_orderkey"), Seq("o_orderkey"))
    Bucketing.writeBucketed(lineitem, "b_lineitem", 8,
      Seq("l_orderkey"), Seq("l_orderkey"))

    val joined = Bucketing.readBucketed(spark, "b_orders")
      .join(Bucketing.readBucketed(spark, "b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))

    // the join itself is exchange-free: the only shuffle in the whole plan
    // is the one feeding the groupBy on a different key
    val shuffles = countShuffles(joined)
    assert(shuffles == 1,
      s"expected only the groupBy shuffle, got $shuffles")

    val plain = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val got = joined.orderBy("o_orderpriority").collect().map(r => (r.getString(0), r.getLong(1)))
    val exp = plain.orderBy("o_orderpriority").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.sameElements(exp))
  }

  test("bucketed join on the bucket key aggregates exchange-free end-to-end") {
    // reuse the tables from the previous test; group on the BUCKET key:
    // bucketing satisfies the agg's distribution too -> zero shuffles
    val agg = Bucketing.readBucketed(spark, "b_orders")
      .join(Bucketing.readBucketed(spark, "b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(sum("l_quantity").as("qty"))
    assert(countShuffles(agg) == 0, "expected an exchange-free plan")
    assert(agg.count() > 0)
  }
}
