package graft.operators

import graft.QueryModule
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (north-star): image/audio/video as opaque BINARY
  * columns with typed metadata, decoded/feature-extracted executor-side.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic FAKE ([[FakeCodec]]) — but everything
  * Spark-side is real and tested: the binary column derivation, the typed
  * metadata struct, the `mapPartitions` batch-decode shape (one codec
  * instance per partition, like Llm's one client per partition), and the
  * resulting feature schema. Swapping [[FakeCodec]] for a JNI/JavaCV codec
  * changes no plumbing.
  *
  * Scale: binary payloads stay opaque through the scan (no row-group
  * decode), partitions bound decoder memory, and features are computed in
  * one pass without shuffles until the final aggregate.
  */
object Multimodal extends QueryModule {

  /** Decoded-frame features (the real schema a codec would emit). */
  case class MediaFeatures(id: Long, n_bytes: Long, width: Long,
                           height: Long, n_frames: Long, mean_byte: Double)

  /** Deterministic stand-in for an image/video codec: derives fake
    * geometry from the payload. A real implementation would decode the
    * container header here. */
  object FakeCodec extends Serializable {
    def decode(id: Long, payload: Array[Byte]): MediaFeatures = {
      val n = payload.length.toLong
      var sum = 0L
      var i = 0
      while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
      MediaFeatures(
        id = id,
        n_bytes = n,
        width = 16 + n % 640,
        height = 16 + (n * 7) % 480,
        n_frames = 1 + n % 24,
        mean_byte = if (n == 0) 0.0 else sum.toDouble / n)
    }
  }

  /** Attach the opaque media column: payload = UTF-8 bytes of the text
    * (the testdata has no real media; byte-derivation keeps it honest). */
  def withMediaColumn(docs: DataFrame): DataFrame =
    docs.withColumn("media", encode(col("text"), "UTF-8"))
      .withColumn("media_meta", struct(
        col("source").as("origin"),
        lit("fake/v1").as("codec"),
        octet_length(col("media")).cast("long").as("content_length")))

  /** Batch decode: one codec per partition, features per media row. */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codec = FakeCodec // real codec init happens once per partition
        it.map { case (id, payload) => codec.decode(id, payload) }
      }
      .toDF()
  }

  /** Frame sampling ("video" path): every k-th frame index of each media
    * row, exploded to one row per sampled frame with a deterministic
    * per-frame feature (what a real pipeline hands to an image encoder).
    * Generator + arithmetic only — no shuffle until downstream use. */
  def sampleFrames(decoded: DataFrame, everyK: Int): DataFrame = {
    val s = decoded.sparkSession
    import s.implicits._
    decoded
      .withColumn("frame_idx",
        explode(sequence(lit(0L), $"n_frames" - 1, lit(everyK.toLong))))
      .select($"doc_id", $"frame_idx",
        // fake per-frame feature: stand-in for the decoded frame digest
        pmod($"doc_id" * 31 + $"frame_idx" * 7, lit(997)).as("frame_sig"))
  }

  /** Resize plan ("image" path): fit each decoded frame into a box×box
    * square preserving aspect ratio — pure integer arithmetic on decoded
    * geometry (out = dim·box ÷ max(w,h)), i.e. the (doc_id, out_w, out_h)
    * work orders a real pipeline hands to a GPU batch resizer. No decode
    * bytes move; the op is a projection over [[decodeFeatures]] output. */
  def resizePlan(decoded: DataFrame, box: Int): DataFrame = {
    val s = decoded.sparkSession
    import s.implicits._
    decoded.select($"id".as("doc_id"), $"width", $"height",
      expr(s"width * $box div greatest(width, height)").as("out_w"),
      expr(s"height * $box div greatest(width, height)").as("out_h"))
  }

  /** One framed audio window's features (what a real featurizer computes
    * per hop before MFCC/spectrogram work). */
  case class AudioWindow(doc_id: Long, win_idx: Long, n: Long,
                         peak: Long, energy: Long)

  /** "Audio" decode: read the payload as 16-bit little-endian PCM and
    * frame it into fixed windows, emitting per-window sample count, peak
    * amplitude, and exact integer energy (Σ s²). Same honest-fake stance
    * as [[FakeCodec]]: a real decoder would parse a WAV/FLAC header here;
    * the framing, per-partition batching, and feature schema are the real
    * plumbing. */
  def pcmWindows(id: Long, payload: Array[Byte], win: Int): Seq[AudioWindow] = {
    val ns = payload.length / 2
    (0 until ns by win).map { st =>
      val end = math.min(st + win, ns)
      var peak = 0L
      var energy = 0L
      var i = st
      while (i < end) {
        val lo = payload(2 * i) & 0xff
        val hi = payload(2 * i + 1) & 0xff
        var s = lo + (hi << 8)
        if (s >= 32768) s -= 65536
        val a = math.abs(s).toLong
        if (a > peak) peak = a
        energy += s.toLong * s
        i += 1
      }
      AudioWindow(id, (st / win).toLong, (end - st).toLong, peak, energy)
    }
  }

  /** q_multimodal_audio — the audio leg of the modality matrix (decode =
    * image features, frames = video sampling, resize = image geometry,
    * audio = PCM window framing): binary payload → 16-bit samples →
    * non-overlapping 256-sample windows → per-window peak/energy/RMS.
    * Integer sample extraction and energy sums are exact in both engines;
    * RMS is one IEEE sqrt (correctly rounded by spec) under
    * [[graft.Det.round6]]. One `mapPartitions` pass, no shuffle. */
  private def qMultimodalAudio(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = withMediaColumn(Tables.load(s, dir, "documents"))
    docs.select($"doc_id", $"media").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) => pcmWindows(id, payload, 256) }
      }
      .toDF()
      .select($"doc_id", $"win_idx", $"n", $"peak", $"energy",
        graft.Det.round6(sqrt($"energy".cast("double") / $"n")).as("rms"))
      .orderBy($"doc_id", $"win_idx")
  }

  /** q_multimodal_resize — decode → fit-into-224 resize work orders. */
  private def qMultimodalResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = withMediaColumn(Tables.load(s, dir, "documents"))
    resizePlan(decodeFeatures(docs), 224)
      .orderBy($"doc_id")
  }

  /** q_multimodal_frames — decode → sample every 4th frame. */
  private def qMultimodalFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = withMediaColumn(Tables.load(s, dir, "documents"))
    sampleFrames(decodeFeatures(docs).withColumnRenamed("id", "doc_id"), 4)
      .orderBy($"doc_id", $"frame_idx")
  }

  /** q_multimodal_decode — binary derivation + batch decode + metadata
    * join, end to end. The fake geometry is pure byte arithmetic, so the
    * oracle replays it in SQL. */
  private def qMultimodalDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = withMediaColumn(Tables.load(s, dir, "documents"))
    decodeFeatures(docs)
      .withColumnRenamed("id", "doc_id")
      .join(docs.select($"doc_id", $"media_meta.origin".as("origin"),
        $"media_meta.content_length".as("content_length")), Seq("doc_id"))
      .select($"doc_id", $"origin", $"content_length", $"n_bytes",
        $"width", $"height", $"n_frames", graft.Det.round6($"mean_byte").as("mean_byte"))
      .orderBy($"doc_id")
  }

  val queries: Map[String, Q] = Map(
    "q_multimodal_decode" -> (qMultimodalDecode _),
    "q_multimodal_frames" -> (qMultimodalFrames _),
    "q_multimodal_resize" -> (qMultimodalResize _),
    "q_multimodal_audio" -> (qMultimodalAudio _))

  val oracles: Map[String, String] = Map(
    "q_multimodal_audio" ->
      """WITH s AS (
           SELECT doc_id, string_split(text, '') ch FROM documents),
         samp AS (
           SELECT doc_id, ch, unnest(generate_series(1, len(ch) // 2)) i
           FROM s),
         v AS (
           SELECT doc_id, i - 1 AS idx,
                  ascii(ch[2*i - 1]) + 256 * ascii(ch[2*i]) AS raw
           FROM samp),
         sv AS (
           SELECT doc_id, idx,
                  CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END s
           FROM v),
         w AS (
           SELECT doc_id, idx // 256 AS win_idx, count(*) n,
                  max(abs(s)) peak,
                  CAST(sum(CAST(s AS BIGINT) * s) AS BIGINT) energy
           FROM sv GROUP BY 1, 2)
         SELECT doc_id, CAST(win_idx AS BIGINT) AS win_idx,
                CAST(n AS BIGINT) AS n, CAST(peak AS BIGINT) AS peak,
                energy,
                floor(sqrt(CAST(energy AS DOUBLE) / n) * 1000000.0 + 0.5)
                  / 1000000.0 AS rms
         FROM w ORDER BY doc_id, win_idx""",
    "q_multimodal_frames" ->
      """WITH b AS (
           SELECT doc_id,
                  1 + CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) % 24
                    AS n_frames
           FROM documents),
         f AS (
           SELECT doc_id, unnest(range(0, n_frames, 4)) AS frame_idx
           FROM b)
         SELECT doc_id, frame_idx,
                (doc_id * 31 + frame_idx * 7) % 997 AS frame_sig
         FROM f ORDER BY doc_id, frame_idx""",
    "q_multimodal_resize" ->
      """WITH b AS (
           SELECT doc_id,
                  16 + CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) % 640
                    AS width,
                  16 + (CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) * 7) % 480
                    AS height
           FROM documents)
         SELECT doc_id, width, height,
                (width * 224) // greatest(width, height) AS out_w,
                (height * 224) // greatest(width, height) AS out_h
         FROM b ORDER BY doc_id""",
    "q_multimodal_decode" ->
      """WITH b AS (
           SELECT doc_id, source AS origin,
                  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n,
                  CAST(list_sum(list_transform(string_split(text, ''),
                                               c -> ascii(c))) AS DOUBLE) AS bytesum
           FROM documents)
         SELECT doc_id, origin, n AS content_length, n AS n_bytes,
                16 + n % 640 AS width,
                16 + (n * 7) % 480 AS height,
                1 + n % 24 AS n_frames,
                floor(bytesum / n * 1000000.0 + 0.5) / 1000000.0 AS mean_byte
         FROM b ORDER BY doc_id""")
}
