package graft.validation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Data-quality gates mirroring the reference's validation surface.
  *
  * The reference validates transformed frames with pandas_schema dtype
  * checks (reference tasks/base.py:670-674) and assertion checks for
  * date ranges, schema membership, and nulls
  * (reference tasks/revenue.py check_dt_range / check_schema /
  * check_null). Each check here is a single distributed aggregation —
  * one pass, no collect of data rows.
  */
object Checks {

  /** Column/dtype validation (pandas_schema IsDtypeValidation). */
  def requireSchema(df: DataFrame, expected: Seq[(String, DataType)]): Unit = {
    val actual = df.schema.map(f => f.name -> f.dataType).toMap
    val problems = expected.flatMap { case (name, dt) =>
      actual.get(name) match {
        case None => Some(s"missing column $name")
        case Some(a) if a != dt => Some(s"$name: expected $dt got $a")
        case _ => None
      }
    }
    require(problems.isEmpty, problems.mkString("; "))
  }

  /** Non-null check over a set of columns
    * (reference check_null: "values in column [...] should not be N/A"). */
  def requireNonNull(df: DataFrame, cols: Seq[String]): Unit = {
    val counts = df.agg(
      count(lit(1)).as("__n"),
      cols.map(c => count(col(c)).as(c)): _*).head()
    val n = counts.getLong(0)
    val bad = cols.zipWithIndex.collect {
      case (c, i) if counts.getLong(i + 1) != n => c
    }
    require(bad.isEmpty, s"null values in: ${bad.mkString(",")}")
  }

  /** Bounds check on a date/timestamp column
    * (reference check_dt_range: min/max within arg window). */
  def requireRange(df: DataFrame, c: String, lo: String, hi: String): Unit = {
    val row = df.agg(min(col(c)).as("lo"), max(col(c)).as("hi")).head()
    require(row.get(0) == null || row.get(0).toString >= lo,
      s"$c min ${row.get(0)} < $lo")
    require(row.get(1) == null || row.get(1).toString.take(hi.length) <= hi,
      s"$c max ${row.get(1)} > $hi")
  }

  /** Row-count floor (reference rps.py: "Too few rows in FB index"). */
  def requireMinRows(df: DataFrame, n: Long): Unit = {
    val c = df.limit((n + 1).toInt).count()
    require(c >= n, s"too few rows: $c < $n")
  }

  /** Volume-drift gate vs the previous period: today's row count must
    * be within ±tolerance of yesterday's (the reference extracts the
    * previous date during extract "for validation",
    * tasks/base.py:303-305 — a collapsed or exploded daily feed is the
    * upstream failure a 100 TB pipeline must catch BEFORE overwriting
    * good partitions). */
  def requireCountWithinDrift(
      current: DataFrame, previous: DataFrame, tolerance: Double = 0.5): Unit = {
    val cur = current.count()
    val prev = previous.count()
    if (prev > 0) {
      val drift = math.abs(cur - prev).toDouble / prev
      require(drift <= tolerance,
        f"row count drifted $drift%.2f (cur=$cur prev=$prev, tolerance=$tolerance)")
    }
  }
}
