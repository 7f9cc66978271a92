package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ScaleJoinsSpec extends SparkSuite {
  import spark.implicits._

  test("saltedJoin equals the plain join on skewed data") {
    // hot key: 10k rows of key=1, a few of others
    val big = ((1 to 10000).map(_ => (1L, "hot")) ++
      (1 to 50).map(i => (i.toLong % 7 + 2, "cold"))).toDF("k", "tag")
    val small = Seq((1L, "A"), (2L, "B"), (3L, "C")).toDF("k", "v")
    val plain = big.join(small, "k").groupBy($"v")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = ScaleJoins.saltedJoin(big, small, "k", salts = 8)
      .groupBy($"v").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
    assert(salted("A") === 10000L)
  }

  test("salted left join keeps unmatched big-side rows") {
    val big = Seq((1L, "x"), (9L, "y")).toDF("k", "tag")
    val small = Seq((1L, "A")).toDF("k", "v")
    val r = ScaleJoins.saltedJoin(big, small, "k", 4, "left")
      .select($"k", $"v").collect()
      .map(row => row.getLong(0) -> Option(row.getString(1))).toMap
    assert(r(1L) === Some("A") && r(9L) === None)
  }

  test("bucketed tables join without an exchange on either side") {
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    val customer = spark.read.parquet(s"$sf0001/customer.parquet")
    orders.write.mode("overwrite").bucketBy(8, "o_custkey")
      .sortBy("o_custkey").saveAsTable("orders_bkt")
    customer.withColumn("c_custkey", $"c_custkey".cast("long"))
      .write.mode("overwrite").bucketBy(8, "c_custkey")
      .sortBy("c_custkey").saveAsTable("customer_bkt")
    // disable broadcast so the co-located sort-merge path is chosen
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_bkt").join(
        spark.table("customer_bkt"),
        $"o_custkey" === $"c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}
