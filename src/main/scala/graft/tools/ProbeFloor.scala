package graft.tools

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Quantifies the per-query FIXED cost under the ~170-query
  * sub-second floor: how much of a trivial query's wall is driver-side
  * source re-resolution (file listing + parquet footer schema read,
  * paid per `spark.read.parquet` call) vs the actual job. Compares
  * bare resolution, schema-supplied resolution, and a full trivial
  * noop evaluation, each over `iters` repetitions warm. */
object ProbeFloor {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = if (args.length > 1) args(1).toInt else 40
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      var i = 0
      while (i < iters) { f; i += 1 }
      println(f"[floor] $name%-40s ${(System.nanoTime() - t0) / 1e9 / iters * 1000}%8.1f ms/iter")
    }
    // warm everything once
    FullEval.run(Tables.lineitem(spark, dir).select(col("l_orderkey")).limit(1))
    val schema = Tables.lineitem(spark, dir).schema
    t("resolve lineitem (listing+footer)") {
      Tables.lineitem(spark, dir); ()
    }
    t("resolve lineitem with explicit schema") {
      spark.read.schema(schema).parquet(s"$dir/lineitem.parquet"); ()
    }
    t("trivial noop eval (resolve + 1-stage job)") {
      FullEval.run(Tables.lineitem(spark, dir)
        .select(col("l_orderkey")).limit(1))
    }
    t("trivial noop eval, schema supplied") {
      FullEval.run(spark.read.schema(schema).parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey")).limit(1))
    }
    t("1-agg noop eval (scan+2-stage agg)") {
      FullEval.run(Tables.lineitem(spark, dir)
        .groupBy(col("l_returnflag")).agg(count(lit(1))))
    }
    spark.stop()
  }
}
