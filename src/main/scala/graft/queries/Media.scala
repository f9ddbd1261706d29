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

  /** #232 INTER-FRAME VIDEO DECODE, oracle-gated end-to-end
    * (`q_video_interframe`) — closes the codec family's one stubbed
    * capability with a REAL inter-frame codec the pure JDK can carry:
    * FLV / Screen Video v1 (zlib tiles, java.util.zip both ways).
    * Each doc plants a deterministic clip
    * ([[SyntheticMedia.plantFlvs]] — 32×16 canvas = two 16×16 blocks,
    * 2 + id%3 frames, keyframe paints both blocks, every interframe
    * updates exactly ONE block and encodes the other as the codec's
    * zero-length persist entry), so every frame after the first is
    * readable ONLY through carried prediction state — a decoder that
    * drops, reorders or fails to persist blocks shifts the per-frame
    * means and breaks the hash. Output per doc: frame count, dims,
    * and per-channel block counts recovered FROM DECODED PIXELS
    * (mean·2/255 is exact for solid primary tiles); DuckDB replays
    * the update schedule arithmetically from doc_id. H.264-class
    * codecs still need an external library — but the inter-frame
    * STATE machinery (prediction carry, partial-update compositing)
    * is this same path and is now gated, not stubbed.
    *
    * Scale shape: generation stands in for the binaryFile source;
    * decode + stats are partition-wise row-local (the clip's state
    * never leaves its row), then ONE map-side-combined agg. */
  def videoInterframe(s: SparkSession, dir: String): DataFrame =
    BinaryDocs.decodeVideo(
        SyntheticMedia.plantFlvs(Tables.documents(s, dir).select(col("doc_id"))))
      .filter(col("decoded"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        max(col("width")).as("width"),
        max(col("height")).as("height"),
        sum(round(col("mean_r") * 2 / 255.0)).cast("long").as("red_blocks"),
        sum(round(col("mean_g") * 2 / 255.0)).cast("long").as("green_blocks"),
        sum(round(col("mean_b") * 2 / 255.0)).cast("long").as("blue_blocks"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_audio_dedup"      -> audioDedup _,
    "q_video_dedup"      -> videoDedup _,
    "q_video_interframe" -> videoInterframe _)

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
        |  ON a.doc_id < b.doc_id AND a.doc_id % 25 = b.doc_id % 25""".stripMargin,
    // the planted inter-frame schedule replayed arithmetically: left
    // block = last even-frame update (else keyframe id%3), right =
    // last odd-frame update (else keyframe (id+1)%3), update color at
    // frame i is (id + 2i)%3 — primaries 0 red / 1 green / 2 blue
    "q_video_interframe" ->
      """WITH f AS (
        |  SELECT d.doc_id, CAST(t.i AS BIGINT) AS i
        |  FROM documents d, UNNEST(range(0, 2 + d.doc_id % 3)) AS t(i)
        |),
        |c AS (
        |  SELECT doc_id, i,
        |    CASE WHEN i >= 2 THEN (doc_id + 2*(i - (i % 2))) % 3
        |         ELSE doc_id % 3 END AS lc,
        |    CASE WHEN i >= 1 THEN (doc_id + 2*(i - ((i+1) % 2))) % 3
        |         ELSE (doc_id + 1) % 3 END AS rc
        |  FROM f
        |)
        |SELECT doc_id,
        |  COUNT(*) AS n_frames,
        |  CAST(32 AS BIGINT) AS width,
        |  CAST(16 AS BIGINT) AS height,
        |  CAST(SUM(CASE WHEN lc = 0 THEN 1 ELSE 0 END +
        |           CASE WHEN rc = 0 THEN 1 ELSE 0 END) AS BIGINT) AS red_blocks,
        |  CAST(SUM(CASE WHEN lc = 1 THEN 1 ELSE 0 END +
        |           CASE WHEN rc = 1 THEN 1 ELSE 0 END) AS BIGINT) AS green_blocks,
        |  CAST(SUM(CASE WHEN lc = 2 THEN 1 ELSE 0 END +
        |           CASE WHEN rc = 2 THEN 1 ELSE 0 END) AS BIGINT) AS blue_blocks
        |FROM c GROUP BY doc_id""".stripMargin)
}
