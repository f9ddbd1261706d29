package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: match each left row with the most recent
  * right row at or before its time, per key.
  *
  * Spark has no native as-of join; the scalable composition is the
  * union-and-carry trick: tag both sides, union, and carry the last
  * right-side payload forward with a window over (key, time). ONE
  * shuffle + sort on (key), no range cross-join, no per-key driver
  * loop — the shape that survives a 100 TB event stream joined to a
  * slowly-changing dimension. (DuckDB expresses the same thing natively
  * as `ASOF JOIN`, which serves as the correctness oracle.)
  *
  * Use cases from the reference: joining events to the latest
  * revenue-per-search rate (sql/mango_revenue_google.sql joins the
  * CURRENT rps snapshot; the as-of form joins the rate that was in
  * effect at event time).
  */
object AsOf {

  /** @param left      event-side frame
    * @param right     snapshot-side frame; its payload columns are
    *                  appended to matching left rows (null if no
    *                  snapshot at or before the left time)
    * @param keys      equi-join keys present on both sides
    * @param leftTime  left ordering column name
    * @param rightTime right ordering column name
    */
  def join(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val payload = right.columns.filterNot(c => keys.contains(c) || c == rightTime)
    val lCols = left.columns

    val taggedLeft = left
      .withColumn("__t", col(leftTime).cast("timestamp"))
      .withColumn("__side", lit(1))
      .select((lCols.map(col) :+ col("__t") :+ col("__side")) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__p_$c")): _*)
    val taggedRight = right
      .withColumn("__t", col(rightTime).cast("timestamp"))
      .withColumn("__side", lit(0))
      .select((lCols.map(c => if (keys.contains(c)) col(c) else lit(null).cast(left.schema(c).dataType).as(c)) :+
        col("__t") :+ col("__side")) ++ payload.map(c => col(c).as(s"__p_$c")): _*)

    // right rows sort before left rows at the same instant (__side 0<1)
    // so a snapshot AT the event time matches, mirroring ASOF >=
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(taggedLeft.unionByName(taggedRight)) { (df, c) =>
      df.withColumn(s"__c_$c", last(col(s"__p_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col("__side") === 1)
      .select(lCols.map(col) ++ payload.map(c => col(s"__c_$c").as(c)): _*)
  }
}
