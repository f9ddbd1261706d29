package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{GraftTask, Skew}
import graft.sources.{Tables, Writers}
import graft.functions.Mappings

class ScaleToolsSpec extends AnyFunSuite {
  import TestSpark._

  test("salted join preserves inner-join semantics") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey")).count()
    val salted = Skew.saltedJoin(orders, customer, Seq("o_custkey"), 8).count()
    assert(plain == salted)
  }

  test("bucketed table join plans without exchange on bucket key") {
    Writers.bucketedTable(
      Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice"),
      "orders_bucketed", Seq("o_custkey"), 4)
    val t = spark.table("orders_bucketed")
    val agg = t.groupBy("o_custkey").agg(sum("o_totalprice"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed agg should not shuffle:\n$plan")
  }

  test("GraftTask contract runs extract/transform/load with schema gate") {
    var loaded: Option[(String, Long)] = None
    val task = new GraftTask {
      val spark: SparkSession = TestSpark.spark
      val sources = Map("orders" -> (() => Tables.orders(TestSpark.spark, sf)))
      override val transforms = Map("orders" -> ((df: DataFrame) =>
        df.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_totalprice"))))
      override val schema = Seq("o_orderkey" -> "bigint", "o_totalprice" -> "double")
      def load(source: String, df: DataFrame): Unit =
        loaded = Some(source -> df.count())
    }
    task.run("l")
    assert(loaded.exists(_._1 == "orders") && loaded.exists(_._2 > 0))
  }

  test("countryTzOffset mirrors reference tz mapping") {
    import spark.implicits._
    val df = Seq("ID", "IN", "TW", "ZZ").toDF("c")
      .select(Mappings.countryTzOffset(col("c")).as("tz"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("+07:00", "+05:30", "+08:00", "+00:00"))
  }

  test("approx sketch tolerance flags hold and exact columns are exact") {
    val rows = SparkEntry.queries("q_approx_sketch")(spark, sf).collect()
    assert(rows.nonEmpty)
    // every group's sketches landed in tolerance (the oracle-gated flags)
    rows.foreach { r =>
      assert(r.getAs[Int]("hll_within_5pct") == 1, r.getAs[String]("event_type"))
      assert(r.getAs[Int]("p50_within_rank_band") == 1, r.getAs[String]("event_type"))
    }
    val exact = Tables.events(spark, sf).groupBy("event_type")
      .agg(countDistinct("user_id").as("u")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = rows.map(r => r.getAs[String]("event_type") -> r.getAs[Long]("users_exact")).toMap
    exact.foreach { case (k, v) => assert(got(k) == v, k) }
  }

  test("as-of join picks most recent snapshot, null when none") {
    import spark.implicits._
    import graft.operators.AsOf
    val left = Seq((1L, 10L, "2024-01-05 12:00:00"), (2L, 10L, "2024-01-01 00:00:00"))
      .toDF("id", "k", "t").withColumn("t", col("t").cast("timestamp"))
    val right = Seq((10L, "2024-01-02 00:00:00", 5.0), (10L, "2024-01-04 00:00:00", 9.0))
      .toDF("k", "rt", "snap").withColumn("rt", col("rt").cast("timestamp"))
    val out = AsOf.join(left, right, Seq("k"), "t", "rt")
      .select("id", "snap").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).contains(9.0))   // latest snapshot before Jan 5
    assert(out(2L).isEmpty)         // no snapshot before Jan 1
  }
}
