package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Privacy-preserving release batch (SURVEY §2 #148-149): the two
  * standard mechanisms for publishing aggregates derived from user
  * data — k-anonymous generalization with suppression (#148) and
  * noisy differential-privacy-style counts (#149). Complements the
  * row-level scrubbers (#51 anonymize, q_pii_scrub): those clean
  * individual records, these gate what AGGREGATE views may leave the
  * warehouse.
  */
object Privacy {

  private val K = 8 // minimum group size for release

  /** #148 K-ANONYMITY release — publish (segment, nation, balance-bin)
    * population counts, generalizing each too-small group up a fixed
    * hierarchy until every released row covers ≥ k individuals:
    * level 0 (seg, nation, bin) → level 1 (seg, nation) → level 2
    * (seg) → level 3 fully suppressed remainder. Every customer is
    * counted exactly once, at the finest level whose group reached k.
    *
    * Scale shape: the base relation is scanned ONCE into the level-0
    * map-side-combined count frame; every cascade step re-aggregates
    * only the still-too-small REMAINDER of the previous (already
    * group-sized, shrinking) frame — generalization never touches raw
    * rows again, so the cascade costs group-count-sized shuffles no
    * matter how large the table is. Generalized dims carry a -1
    * sentinel so the released schema is fixed and non-nullable. */
  def kanon(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(s, dir).select(
      col("c_mktsegment").as("seg"),
      col("c_nationkey").cast("long").as("nat"),
      floor(col("c_acctbal") / 1000.0).cast("long").as("bin"))
    val l0 = base.groupBy(col("seg"), col("nat"), col("bin"))
      .agg(count(lit(1)).as("n"))
    def release(df: DataFrame, level: Int) = df.filter(col("n") >= K)
      .select(lit(level).as("level"), col("seg"), col("nat"), col("bin"),
        col("n").as("n_users"))
    val l1 = l0.filter(col("n") < K)
      .groupBy(col("seg"), col("nat"))
      .agg(sum(col("n")).as("n")).withColumn("bin", lit(-1L))
    val l2 = l1.filter(col("n") < K)
      .groupBy(col("seg"))
      .agg(sum(col("n")).as("n"))
      .withColumn("nat", lit(-1L)).withColumn("bin", lit(-1L))
    val l3 = l2.filter(col("n") < K)
      .agg(sum(col("n")).as("n"))
      .select(lit("*").as("seg"), lit(-1L).as("nat"), lit(-1L).as("bin"),
        col("n")).filter(col("n").isNotNull)
    release(l0, 0)
      .unionByName(release(l1, 1))
      .unionByName(release(l2, 2))
      .unionByName(l3.select(lit(3).as("level"), col("seg"), col("nat"),
        col("bin"), col("n").as("n_users")))
  }

  /** The first 4 hex digits of md5(seed || tag) decoded to an integer
    * in [0, 65536) — a TRUE uniform over 16 bits (each md5 hex digit
    * decodes to its value, unlike the raw-ascii #61 idiom whose
    * residues are lumpy). Shared by every estimator that needs an
    * unbiased inclusion probability; both engines run the same ascii
    * arithmetic so the value is bit-identical cross-engine. */
  private[queries] def md5Raw16(seed: Column, tag: String): Column = {
    val h = md5(concat(seed, lit(tag)))
    def digit(i: Int): Column = {
      val a = ascii(substring(h, i, 1))
      when(a >= 97, a - 87).otherwise(a - 48)
    }
    ((digit(1) * 16 + digit(2)) * 16 + digit(3)) * 16 + digit(4)
  }

  /** Uniform in (0,1): (raw16 + 0.5) / 65536, shifted off the
    * endpoints so inverse-CDF transforms never hit log(0). */
  private def md5Uniform(seed: Column, tag: String): Column =
    (md5Raw16(seed, tag).cast("double") + 0.5) / 65536.0

  /** #149 DP-STYLE NOISY COUNTS — per-(event_type, day) activity
    * counts released with additive Laplace(1/ε) noise (ε = 1), the
    * mechanism every differential-privacy aggregate release uses. The
    * noise is derived DETERMINISTICALLY per released cell from an
    * md5-seeded uniform (inverse-CDF transform), which is exactly how
    * a production release pins its noise to an audit seed — and what
    * makes the query replayable by the oracle. Raw counts are NOT in
    * the output (publishing them next to the noisy value would defeat
    * the mechanism).
    *
    * Cross-engine determinism: the uniform is integer-derived
    * (endpoint-shifted so the log argument is ≥ 2⁻¹⁶, never 0), and
    * the noise expression is one fixed operation order both engines
    * evaluate identically; round(6) cuts far above any half-even
    * boundary risk on an irrational value.
    *
    * Scale shape: one map-side-combined hash agg over events, then
    * row-local noise arithmetic on the tiny released frame. */
  def dpNoise(s: SparkSession, dir: String): DataFrame = {
    val eps = 1.0
    val day = to_date(col("ts"))
    val cells = Tables.events(s, dir)
      .groupBy(col("event_type"), day.as("day"))
      .agg(count(lit(1)).as("n"))
    val u = md5Uniform(
      concat(col("event_type"), lit(":"), col("day").cast("string")), ":dp")
    val v = u - 0.5
    val noise = -(lit(1.0) / eps) * signum(v) * log(lit(1.0) - lit(2.0) * abs(v))
    cells.select(col("event_type"), col("day"),
      round(col("n") + noise, 6).as("noisy_n"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_kanon"    -> kanon _,
    "q_dp_noise" -> dpNoise _)

  /** DuckDB md5-hex-digit decode matching [[md5Raw16]]. */
  private[queries] def sqlRaw16(seedSql: String, tag: String): String = {
    def digit(i: Int) =
      s"(CASE WHEN ascii(substr(md5($seedSql || '$tag'), $i, 1)) >= 97 " +
        s"THEN ascii(substr(md5($seedSql || '$tag'), $i, 1)) - 87 " +
        s"ELSE ascii(substr(md5($seedSql || '$tag'), $i, 1)) - 48 END)"
    s"(((${digit(1)} * 16 + ${digit(2)}) * 16 + ${digit(3)}) * 16 + ${digit(4)})"
  }

  /** DuckDB uniform matching [[md5Uniform]]. */
  private def sqlUniform(seedSql: String, tag: String): String =
    s"((CAST(${sqlRaw16(seedSql, tag)} AS DOUBLE) + 0.5) / 65536.0)"

  val oracles: Map[String, String] = Map(
    "q_kanon" ->
      s"""WITH base AS (SELECT c_mktsegment AS seg,
        |    CAST(c_nationkey AS BIGINT) AS nat,
        |    CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bin
        |  FROM customer),
        |l0 AS (SELECT seg, nat, bin, COUNT(*) AS n FROM base GROUP BY 1,2,3),
        |l1 AS (SELECT seg, nat, CAST(-1 AS BIGINT) AS bin,
        |    CAST(SUM(n) AS BIGINT) AS n
        |  FROM l0 WHERE n < $K GROUP BY 1,2),
        |l2 AS (SELECT seg, CAST(-1 AS BIGINT) AS nat,
        |    CAST(-1 AS BIGINT) AS bin, CAST(SUM(n) AS BIGINT) AS n
        |  FROM l1 WHERE n < $K GROUP BY 1),
        |l3 AS (SELECT '*' AS seg, CAST(-1 AS BIGINT) AS nat,
        |    CAST(-1 AS BIGINT) AS bin, CAST(SUM(n) AS BIGINT) AS n
        |  FROM l2 WHERE n < $K HAVING SUM(n) IS NOT NULL)
        |SELECT 0 AS level, seg, nat, bin, n AS n_users FROM l0 WHERE n >= $K
        |UNION ALL
        |SELECT 1, seg, nat, bin, n FROM l1 WHERE n >= $K
        |UNION ALL
        |SELECT 2, seg, nat, bin, n FROM l2 WHERE n >= $K
        |UNION ALL
        |SELECT 3, seg, nat, bin, n FROM l3""".stripMargin,
    "q_dp_noise" -> {
      val u = sqlUniform("event_type || ':' || CAST(day AS VARCHAR)", ":dp")
      s"""WITH cells AS (SELECT event_type,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |noisy AS (SELECT event_type, day, n, $u - 0.5 AS v FROM cells)
        |SELECT event_type, day,
        |  ROUND(n + (-1.0 * SIGN(v) * LN(1.0 - 2.0 * ABS(v))), 6) AS noisy_n
        |FROM noisy""".stripMargin
    })
}
