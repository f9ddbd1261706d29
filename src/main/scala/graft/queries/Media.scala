package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.{BinaryDocs, SyntheticMedia}
import graft.sources.Tables

/** Media-dedup queries (SURVEY §2 #189): the audio member of the
  * multimodal near-dup family, oracle-gated end-to-end through the
  * planted-probe pattern `q_video_meta` established for the decode
  * path.
  */
object Media {

  /** #189 AUDIO NEAR-DUP DEDUP, oracle-gated end-to-end: each probe
    * doc plants a deterministic WAV ([[SyntheticMedia.plantWavs]] —
    * melody = id mod 40, volume = one of 3 gains), the REAL decode +
    * 64-bit energy-delta fingerprint ([[graft.multimodal
    * .AudioFingerprint]], Haitsma-Kalker temporal deltas) runs
    * partition-wise, and the banded pair join (4 × 16-bit bands,
    * provably complete for Hamming ≤ 3) returns the near-dup pairs.
    * Same-melody clips at DIFFERENT volumes have different bytes —
    * an exact hash misses every one of them — but identical
    * fingerprints, so the expected pair set is pure arithmetic on
    * doc_id and DuckDB replays it exactly (hamming 0, a<b, same
    * melody class). A regression anywhere in the WAV walk, PCM
    * conversion, windowing, banding or verify breaks the hash gate.
    *
    * Scale shape: the probe set is bounded (doc_id < 400 — the
    * planted-probe convention); decode + fingerprint are
    * partition-wise row-local; candidates are band-bucket-local
    * (never all-pairs); verify is a row-local bit_count. */
  def audioDedup(s: SparkSession, dir: String): DataFrame = {
    val ids = Tables.documents(s, dir)
      .select(col("doc_id")).filter(col("doc_id") < 400)
    BinaryDocs.audioNearDupPairs(SyntheticMedia.plantWavs(ids), maxDist = 3)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("int").as("hamming"))
  }

  /** #196 VIDEO NEAR-DUP DEDUP, oracle-gated end-to-end — the video
    * member completing the multimodal dedup triad (image dHash #47's
    * family, audio #189): each probe doc plants a deterministic GIF
    * clip ([[SyntheticMedia.plantVideoGifs]] — scene = id mod 25,
    * one of 3 resolutions), the REAL frame decode + 64-bit
    * frame-class fingerprint ([[graft.multimodal.VideoFingerprint]])
    * runs partition-wise, and the shared 4×16-bit banded pair join
    * (complete for Hamming ≤ 3) returns the near-dup pairs.
    * Same-scene clips at DIFFERENT resolutions differ byte-wise —
    * exact hashing misses all of them — but fingerprint identically,
    * so the expected pair set is pure doc_id arithmetic and DuckDB
    * replays it exactly. A regression in the GIF container walk,
    * frame ordering, pixel decode, class mapping, banding or verify
    * breaks the hash gate.
    *
    * Scale shape: bounded probe set (doc_id < 400); decode +
    * fingerprint row-local in mapPartitions; candidates band-bucket-
    * local (never all-pairs); verify a row-local bit_count. */
  def videoDedup(s: SparkSession, dir: String): DataFrame = {
    val ids = Tables.documents(s, dir)
      .select(col("doc_id")).filter(col("doc_id") < 400)
    BinaryDocs.videoNearDupPairs(SyntheticMedia.plantVideoGifs(ids), maxDist = 3)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("int").as("hamming"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_audio_dedup" -> audioDedup _,
    "q_video_dedup" -> videoDedup _)

  val oracles: Map[String, String] = Map(
    "q_audio_dedup" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 400)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(0 AS INT) AS hamming
        |FROM ids a JOIN ids b
        |  ON a.doc_id < b.doc_id AND a.doc_id % 40 = b.doc_id % 40""".stripMargin,
    "q_video_dedup" ->
      """WITH ids AS (SELECT doc_id FROM documents WHERE doc_id < 400)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(0 AS INT) AS hamming
        |FROM ids a JOIN ids b
        |  ON a.doc_id < b.doc_id AND a.doc_id % 25 = b.doc_id % 25""".stripMargin)
}
