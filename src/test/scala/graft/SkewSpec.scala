package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

/** Skew behavior: AQE's runtime skew-split and the explicit salted join
  * must both produce the unsalted result on a pathologically hot key.
  */
class SkewSpec extends SparkSpec {

  test("salted join equals plain join under a 90%-hot key, AQE on or off") {
    // dedicated AQE-on session (shared test session runs AQE off for the
    // plan-shape specs); cloneSession inherits state, newSession does not
    val aqe: SparkSession = spark.newSession()
    aqe.conf.set("spark.sql.adaptive.enabled", "true")
    aqe.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    import aqe.implicits._

    // 50k facts, 90% on key 7; 100 dim rows
    val facts = aqe.sparkContext.parallelize(0 until 50000, 8)
      .map(i => (if (i % 10 != 0) 7L else (i % 100).toLong, i.toLong))
      .toDF("k", "payload")
    val dim = (0L until 100L).map(k => (k, s"dim_$k")).toDF("dk", "name")

    val plain = facts.join(dim, col("k") === col("dk"))
      .groupBy("name").agg(count(lit(1)).as("n"), sum("payload").as("s"))
    val salted = SkewJoin.saltedInnerJoin(facts, dim, "k", "dk", salts = 8)
      .groupBy("name").agg(count(lit(1)).as("n"), sum("payload").as("s"))

    val p = plain.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val s = salted.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(p.sameElements(s))
    // hot key accounted in full
    assert(p.find(_._1 == "dim_7").get._2 == 45000L)
  }
}
