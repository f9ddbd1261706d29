package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Task-level orchestration contract mirroring the reference's
  * `EtlTask` (reference tasks/base.py:36-909): named sources are
  * extracted, per-source transforms applied, results validated against
  * a declared schema, then loaded — with `run(step)` honoring the
  * E/T/L step argument (reference tasks/base.py:896-909).
  *
  * Spark-first: stages pass lazy DataFrames, so extract→transform→load
  * composes into ONE Catalyst plan per source — filters written in a
  * transform push down into the extract's scan; nothing materializes
  * until load.
  */
trait GraftTask {
  def spark: SparkSession

  /** Source name → extractor (reference `extract`). */
  def sources: Map[String, () => DataFrame]

  /** Source name → transform (reference `transform_{source}`);
    * identity when absent. */
  def transforms: Map[String, DataFrame => DataFrame] = Map.empty

  /** Expected (column, type-name) pairs validated after transform
    * (reference pandas_schema validation in tasks/base.py:670-674). */
  def schema: Seq[(String, String)] = Nil

  /** Schema expected for one source (defaults to the task-level
    * schema). Override to exempt auxiliary sources — lookup/const
    * inputs that feed transforms but are never loaded. */
  def schemaFor(source: String): Seq[(String, String)] = schema

  /** Loader for the transformed frame (reference `load`). */
  def load(source: String, df: DataFrame): Unit

  final def extracted: Map[String, DataFrame] =
    sources.map { case (name, fn) => name -> fn() }

  final def transformed: Map[String, DataFrame] =
    extracted.map { case (name, df) =>
      val out = transforms.getOrElse(name, identity[DataFrame] _)(df)
      val expected = schemaFor(name)
      if (expected.nonEmpty) {
        val actual = out.schema.map(f => f.name -> f.dataType.simpleString).toMap
        val bad = expected.filter { case (c, t) => !actual.get(c).contains(t) }
        require(bad.isEmpty, s"schema mismatch for $name: $bad vs $actual")
      }
      name -> out
    }

  /** Run E, T, or L (each step implies the previous ones, like the
    * reference's step argument). */
  final def run(step: String = "l"): Unit = step.toLowerCase.take(1) match {
    case "e" => extracted.foreach(_._2.schema) // force analysis
    case "t" => transformed.foreach(_._2.schema)
    case _   => transformed.foreach { case (name, df) => load(name, df) }
  }
}
