package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Compact

class CompactSpec extends AnyFunSuite {
  import TestSpark._

  test("compactDir merges small files without changing the data") {
    val dir = Files.createTempDirectory("compact").toString + "/t"
    import spark.implicits._
    val df = (1 to 10000).map(i => (i.toLong, s"row$i")).toDF("id", "s")
    df.repartition(40).write.parquet(dir)
    val (before, _) = Compact.stats(spark, dir)
    assert(before == 40)
    val (b, after) = Compact.compactDir(spark, dir, 8L * 1024 * 1024)
    assert(b == 40 && after == 1) // 10k tiny rows fit one 8MB target file
    val back = spark.read.parquet(dir)
    assert(back.count() == 10000)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    // idempotent: already compact → untouched
    assert(Compact.compactDir(spark, dir, 8L * 1024 * 1024) == (1, 1))
  }

  test("compaction preserves non-canonical partition directory names (no duplicated partition)") {
    val dir = Files.createTempDirectory("compactnc").toString + "/t"
    import spark.implicits._
    (1 to 300).map(i => (i.toLong, "2024-01-05")).toDF("id", "d")
      .repartition(8).write.partitionBy("d").parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate an upstream writer that used a NON-canonical date form:
    // if compaction round-trips the value through type inference, the
    // rewrite lands in d=2024-01-05 while dynamic overwrite leaves
    // d=2024-1-5 alive — every row duplicated
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$dir/d=2024-01-05"),
      new org.apache.hadoop.fs.Path(s"$dir/d=2024-1-5")))
    val rewritten = Compact.compactDatePartitions(spark, dir, "d", 4)
    assert(rewritten == Seq("2024-1-5"))
    val back = spark.read.parquet(dir)
    assert(back.count() == 300, "partition was duplicated by the rewrite")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/d=2024-1-5")))
  }

  test("compactDatePartitions rewrites only hot partitions") {
    val dir = Files.createTempDirectory("compactp").toString + "/t"
    import spark.implicits._
    val hot = (1 to 2000).map(i => (i.toLong, "2024-01-01")).toDF("id", "d")
    val cold = (1 to 50).map(i => (i.toLong, "2024-01-02")).toDF("id", "d")
    hot.repartition(20).write.partitionBy("d").parquet(dir)
    cold.coalesce(1).write.mode("append").partitionBy("d").parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files(part: String) = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$dir/d=$part")).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
    assert(files("2024-01-01").size == 20 && files("2024-01-02").size == 1)
    val coldNames = files("2024-01-02").map(f =>
      (f.getPath.getName, f.getModificationTime)).toSet

    val rewritten = Compact.compactDatePartitions(spark, dir, "d", 4)
    assert(rewritten == Seq("2024-01-01"))
    assert(files("2024-01-01").size == 1)
    // the cold partition's physical files are byte-identical — never
    // read or written
    assert(files("2024-01-02").map(f =>
      (f.getPath.getName, f.getModificationTime)).toSet == coldNames)
    val back = spark.read.parquet(dir)
    assert(back.count() == 2050)
    assert(back.filter(col("d") === "2024-01-01").count() == 2000)
    // nothing hot anymore → no-op
    assert(Compact.compactDatePartitions(spark, dir, "d", 4).isEmpty)
  }
}
