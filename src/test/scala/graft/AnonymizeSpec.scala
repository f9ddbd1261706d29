package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Anonymize
import graft.sources.{Tables, Writers}

class AnonymizeSpec extends AnyFunSuite {
  import TestSpark._

  test("hashId is stable and collision-free on the user space") {
    val e = Tables.events(spark, sf)
    val n = e.select("user_id").distinct().count()
    val h = e.select(Anonymize.hashId(col("user_id")).as("h")).distinct().count()
    assert(n == h)
  }

  test("maskIp zeroes host bytes") {
    import spark.implicits._
    val out = Seq("192.168.42.7").toDF("ip")
      .select(Anonymize.maskIp(col("ip"))).head.getString(0)
    assert(out == "192.168.0.0")
  }

  test("perturb stays within scale bounds and is deterministic") {
    val e = Tables.events(spark, sf).limit(200)
    val p = e.select(col("value"),
      Anonymize.perturb(col("value"), col("event_id")).as("pv"))
    val outOfBounds = p.filter(abs(col("pv") - col("value")) > col("value") * 0.11).count()
    assert(outOfBounds == 0)
  }

  test("overwriteDatePartitions replaces only targeted dates") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-dp").toString
    val orders = Tables.orders(spark, sf)
      .filter(col("o_orderdate") < lit("1995-03-01").cast("timestamp"))
    Writers.datePartitionedParquet(orders, tmp, "s", "t", "o", "o_orderdate")
    val before = spark.read.parquet(Writers.pathFor(tmp, "s", "t", "o")).count()
    // re-run one date with zero-effect replacement (same rows)
    val oneDay = orders.filter(to_date(col("o_orderdate")) === "1995-01-15")
    val dayCount = oneDay.count()
    assume(dayCount > 0)
    Writers.overwriteDatePartitions(oneDay, tmp, "s", "t", "o", "o_orderdate")
    val after = spark.read.parquet(Writers.pathFor(tmp, "s", "t", "o")).count()
    assert(after == before)
  }

  test("graft extensions register SQL functions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) c, " +
        "word_shingles('a b c d', 3) s, " +
        "simhash_bits('a b c', 32) h, " +
        "minhash_sigs('a b c d e', 8, 3) m")
      .head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getSeq[String](1) == Seq("a b c", "b c d"))
    assert(r.getString(2).length == 32 && r.getString(2).forall(c => c == '0' || c == '1'))
    assert(r.getSeq[String](3).length == 8)
  }
}
