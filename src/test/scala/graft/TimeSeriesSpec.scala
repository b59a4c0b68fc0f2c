package graft

import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def refEwma(xs: Seq[Double], alpha: Double): Seq[Double] =
    xs.tail.scanLeft(xs.head)((s, x) => alpha * x + (1 - alpha) * s)

  test("ewma matches the sequential reference fold per key") {
    val rows = Seq(
      // (key, t, tiebreak, value) — key 2 interleaved with key 1 in input order
      (1L, 1L, 1L, 10.0), (2L, 1L, 2L, 100.0), (1L, 2L, 3L, 20.0),
      (2L, 2L, 4L, 50.0), (1L, 3L, 5L, 0.0), (1L, 3L, 6L, 40.0)
    ).toDF("k", "t", "id", "v")
    val out = TimeSeries.ewma(rows, "k", "t", "id", "v", alpha = 0.5)
      .orderBy("k", "t", "id")
      .select("k", "ewma").as[(Long, Double)].collect()

    val exp1 = refEwma(Seq(10.0, 20.0, 0.0, 40.0), 0.5)
    val exp2 = refEwma(Seq(100.0, 50.0), 0.5)
    assert(out.filter(_._1 == 1L).map(_._2).toSeq == exp1)
    assert(out.filter(_._1 == 2L).map(_._2).toSeq == exp2)
  }

  test("ewma with alpha=1 is the identity; constant series stays constant") {
    val df = (1 to 50).map(i => (i % 3L, i.toLong, i.toLong, 7.5)).toDF("k", "t", "id", "v")
    val id = TimeSeries.ewma(df, "k", "t", "id", "v", alpha = 1.0)
    assert(id.filter(col("ewma") =!= col("v")).count() == 0)
    val const = TimeSeries.ewma(df, "k", "t", "id", "v", alpha = 0.3)
    assert(const.filter(abs(col("ewma") - 7.5) > 1e-12).count() == 0)
  }

  test("ewma key boundaries survive many keys per partition") {
    // 100 keys on 4 shuffle partitions -> ~25 keys sharing each partition;
    // every key's first row must reseed the state
    val df = (0 until 1000).map { i =>
      (i % 100L, (i / 100).toLong, i.toLong, (i / 100).toDouble)
    }.toDF("k", "t", "id", "v")
    val out = TimeSeries.ewma(df, "k", "t", "id", "v", alpha = 0.4)
      .orderBy("k", "t").select("k", "ewma").as[(Long, Double)].collect()
    val byKey = out.groupBy(_._1)
    assert(byKey.size == 100)
    byKey.foreach { case (_, rows) =>
      val exp = refEwma((0 until 10).map(_.toDouble), 0.4)
      assert(rows.map(_._2).toSeq == exp)
    }
  }

  test("cumprod compounds per key") {
    val df = Seq((1L, 1L, 1L, 2.0), (1L, 2L, 2L, 3.0), (1L, 3L, 3L, 0.5),
      (2L, 1L, 4L, 4.0)).toDF("k", "t", "id", "v")
    val out = TimeSeries.cumprod(df, "k", "t", "id", "v")
      .orderBy("k", "t").select("cumprod").as[Double].collect().toSeq
    assert(out == Seq(2.0, 6.0, 3.0, 4.0))
  }
}
