package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{BinaryType, LongType}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}

import graft.queries.GraphCore

/** Head-to-head of wedge-enumeration formulations for
  * [[GraphCore.triangles]] (the shared hot path of the 6-query
  * triangle family): the current in-lambda bloom probe runs the
  * WHOLE Σ outdeg² enumeration interpreted (array HOFs are
  * CodegenFallback), while a Generate/Generate (double posexplode)
  * shape keeps enumeration AND the bloom probe inside whole-stage
  * codegen. Asserts identical triangle counts. */
object ProfileWedges {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }

    // double-Generate formulation: outer posexplode keeps the tail
    // array; inner explode enumerates ordered pairs; bloom probe is a
    // codegen'd WHERE between the two Generates.
    def trianglesGen(oriented: DataFrame, bf: Array[Byte]): DataFrame = {
      val nbrs = sort_array(collect_list(struct(
        col("degd").as("dg"), col("dst").as("nd"))))
      val might: Column =
        if (bf == null) lit(true)
        else GraftBridge.column(new BloomFilterMightContain(
          Literal(bf, BinaryType),
          GraftBridge.expression(xxhash64(col("b"), col("c")))))
      val wedges = oriented
        .groupBy(col("src").as("a"))
        .agg(first(col("degs")).as("dega"), nbrs.as("nbrs"))
        .select(col("a"), col("dega"), col("nbrs"),
          posexplode(col("nbrs")))
        .select(col("a"), col("dega"), col("col.nd").as("b"),
          explode(slice(col("nbrs"), col("pos") + 2, greatest(size(col("nbrs")) - col("pos") - 1, lit(0)))).as("y"))
        .select(col("a"), col("dega"), col("b"), col("y.nd").as("c"))
        .filter(might)
      wedges.join(oriented.hint("shuffle_hash"),
          col("b") === col("src") && col("c") === col("dst"))
        .select(col("a"), col("dega"), col("b"), col("degs").as("degb"),
          col("c"), col("degd").as("degc"))
    }

    // current formulation minus the bloom (plain enumerate + join)
    def trianglesNoBloom(oriented: DataFrame): DataFrame = {
      val nbrs = sort_array(collect_list(struct(
        col("degd").as("dg"), col("dst").as("nd"))))
      val wedges = oriented
        .groupBy(col("src").as("a"))
        .agg(first(col("degs")).as("dega"), nbrs.as("nbrs"))
        .select(col("a"), col("dega"),
          explode(flatten(transform(col("nbrs"), (x, i) =>
            transform(slice(col("nbrs"), i + 2, size(col("nbrs"))),
              y => struct(x.getField("nd").as("b"), y.getField("nd").as("c"))))))
            .as("w"))
        .select(col("a"), col("dega"), col("w.b").as("b"), col("w.c").as("c"))
      wedges.join(oriented.hint("shuffle_hash"),
          col("b") === col("src") && col("c") === col("dst"))
        .select(col("a"), col("dega"), col("b"), col("degs").as("degb"),
          col("c"), col("degd").as("degc"))
    }

    FullEval.run(graft.queries.Stats.triangleCount(spark, "/root/testdata/sf0.001"))
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val ed = GraphCore.copurchaseEdges(spark, dir)
      val or = GraphCore.orientedOf(ed)
      val bf = t("edgeBloom")(GraphCore.edgeBloom(or))
      t("current (in-lambda bloom)")(FullEval.run(GraphCore.triangles(or)))
      t("gen/gen + codegen bloom")(FullEval.run(trianglesGen(or, bf)))
      t("no bloom (plain lambda)")(FullEval.run(trianglesNoBloom(or)))
      t("gen/gen no bloom")(FullEval.run(trianglesGen(or, null)))
      // broadcast the ORIENTED frame as the closure build side: zero
      // exchanges after the wedge groupBy (candidate r14 plan — the
      // edge frame is size-known from edgeBloom's count, so the
      // broadcast can be deliberately size-guarded)
      def trianglesGenB(oriented: DataFrame, bf0: Array[Byte]): DataFrame = {
        val nbrs = sort_array(collect_list(struct(
          col("degd").as("dg"), col("dst").as("nd"))))
        val might: Column =
          if (bf0 == null) lit(true)
          else GraftBridge.column(new BloomFilterMightContain(
            Literal(bf0, BinaryType),
            GraftBridge.expression(xxhash64(col("b"), col("c")))))
        val wedges = oriented
          .groupBy(col("src").as("a"))
          .agg(first(col("degs")).as("dega"), nbrs.as("nbrs"))
          .select(col("a"), col("dega"), col("nbrs"),
            posexplode(col("nbrs")))
          .select(col("a"), col("dega"), col("col.nd").as("b"),
            explode(slice(col("nbrs"), col("pos") + 2,
              greatest(size(col("nbrs")) - col("pos") - 1, lit(0)))).as("y"))
          .select(col("a"), col("dega"), col("b"), col("y.nd").as("c"))
          .filter(might)
        wedges.join(broadcast(oriented),
            col("b") === col("src") && col("c") === col("dst"))
          .select(col("a"), col("dega"), col("b"), col("degs").as("degb"),
            col("c"), col("degd").as("degc"))
      }
      t("gen/gen bloom + BROADCAST closure")(FullEval.run(trianglesGenB(or, bf)))
      t("gen/gen noBloom + BROADCAST closure")(FullEval.run(trianglesGenB(or, null)))
      val c1 = GraphCore.triangles(or).count()
      val c2 = trianglesGen(or, bf).count()
      val c3 = trianglesNoBloom(or).count()
      val c4 = trianglesGenB(or, bf).count()
      println(s"[prof] counts current=$c1 gen=$c2 nobloom=$c3 bcast=$c4 " +
        (if (c1 == c2 && c2 == c3 && c3 == c4) "MATCH" else "MISMATCH"))
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
