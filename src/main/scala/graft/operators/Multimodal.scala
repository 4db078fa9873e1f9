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

  /** A 64-bit average-hash in 4×16-bit bands (perceptual hashing's
    * simplest member: sample a fixed pixel grid, threshold each sample
    * against the frame mean — Hamming-near hashes ⇔ visually-near
    * frames). Pure integer arithmetic over the payload, so the oracle
    * replays it byte-for-byte in SQL; a real pHash swaps the sampler for
    * a DCT over decoded luma, changing nothing downstream. */
  case class PHashBands(doc_id: Long, b0: Long, b1: Long, b2: Long, b3: Long)

  /** aHash of one payload: 64 evenly-spaced byte samples thresholded
    * against their own mean (×64 in integers — no division), packed LSB-
    * first into 4 16-bit band values. */
  def phashOf(id: Long, payload: Array[Byte]): PHashBands = {
    val n = payload.length
    val px = Array.tabulate(64)(i => payload((i * n) / 64) & 0xff)
    val sum = px.sum
    val bands = Array.fill(4)(0L)
    var i = 0
    while (i < 64) {
      if (px(i) * 64 > sum) bands(i / 16) |= (1L << (i % 16))
      i += 1
    }
    PHashBands(id, bands(0), bands(1), bands(2), bands(3))
  }

  /** q_multimodal_phash — near-duplicate detection for the BINARY
    * modality (the image-dedup leg a multimodal curation pipeline runs
    * next to the text dedups in [[Similarity]]): the corpus is each
    * document's payload PLUS a one-byte-perturbed "re-encode" of it
    * (media id 2·doc_id / 2·doc_id+1 — the compressed-again copy every
    * crawl contains, byte-different but perceptually identical); a
    * per-partition aHash over each payload, banded candidate generation
    * — pairs must share a full 16-bit band, which by pigeonhole is
    * LOSSLESS for the τ=3 Hamming cut (4 bands can't all contain one of
    * ≤3 differing bits) — and exact Hamming verification on candidates.
    * The re-encode twins land at Hamming ≈ 0–2 (one sampled byte plus
    * any mean-threshold flips), so the operator provably RECOVERS the
    * planted duplicate class; byte-level hashing (q_dedup_exact's
    * sha256) sees unrelated blobs, which is the point of perceptual
    * hashing.
    *
    * Scale: hashing is one codec-boundary pass (no shuffle); candidates
    * shuffle on (band, value) — never doc×doc; the hash relation is
    * persisted across its two consumers (band index + verify join), the
    * single-derivation discipline. */
  private def qMultimodalPhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs0 = Tables.load(s, dir, "documents").filter(length($"text") > 0)
    val orig = docs0.select(($"doc_id" * 2).as("mid"), $"text".as("pt"))
    val reenc = docs0.select(($"doc_id" * 2 + 1).as("mid"), expr(
      """concat(substring(text, 1, length(text) div 2), 'q',
        |       substring(text, length(text) div 2 + 2))""".stripMargin)
      .as("pt"))
    val hashes = orig.unionByName(reenc)
      .select($"mid".as("doc_id"), encode($"pt", "UTF-8").as("media"))
      .select($"doc_id", $"media").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) => phashOf(id, payload) }
      }
      .toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val idx = hashes.select($"doc_id",
        posexplode(array($"b0", $"b1", $"b2", $"b3")).as(Seq("band", "v")))
      val cand = idx.as("l")
        .join(idx.as("r"),
          col("l.band") === col("r.band") && col("l.v") === col("r.v") &&
            col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("da"), col("r.doc_id").as("db"))
        .distinct()
      val left = hashes.select($"doc_id".as("da"), $"b0".as("a0"),
        $"b1".as("a1"), $"b2".as("a2"), $"b3".as("a3"))
      val right = hashes.select($"doc_id".as("db"), $"b0".as("c0"),
        $"b1".as("c1"), $"b2".as("c2"), $"b3".as("c3"))
      cand.join(left, "da").join(right, "db")
        .withColumn("hamming", expr(
          """CAST(bit_count(a0 ^ c0) + bit_count(a1 ^ c1)
            |   + bit_count(a2 ^ c2) + bit_count(a3 ^ c3) AS BIGINT)"""
            .stripMargin))
        .filter($"hamming" <= 3L)
        .select($"da".as("doc_a"), $"db".as("doc_b"), $"hamming")
        .orderBy($"doc_a", $"doc_b")
        .transform(graft.Exec.seal)
    } finally hashes.unpersist(false)
  }

  val queries: Map[String, Q] = Map(
    "q_multimodal_phash" -> (qMultimodalPhash _),
    "q_multimodal_decode" -> (qMultimodalDecode _),
    "q_multimodal_frames" -> (qMultimodalFrames _),
    "q_multimodal_resize" -> (qMultimodalResize _),
    "q_multimodal_audio" -> (qMultimodalAudio _))

  /** One band of the oracle's aHash replay: 16 threshold bits packed via
    * exact small powers of two (CASE avoids engine shift operators). */
  private def PHASH_BAND(off: Int): String =
    s"""CAST(list_sum(list_transform(range(0, 16), k ->
        CASE WHEN p[k + ${off + 1}] * 64 > s
             THEN CAST(power(2, k) AS BIGINT) ELSE 0 END)) AS BIGINT)"""

  val oracles: Map[String, String] = Map(
    "q_multimodal_phash" ->
      s"""WITH d0 AS (
           SELECT doc_id, text FROM documents WHERE length(text) > 0),
         m AS (
           SELECT doc_id * 2 AS doc_id, text FROM d0
           UNION ALL
           SELECT doc_id * 2 + 1,
                  substr(text, 1, length(text) // 2) || 'q' ||
                  substr(text, length(text) // 2 + 2)
           FROM d0),
         d AS (
           SELECT doc_id, string_split(text, '') AS t,
                  length(text) AS n
           FROM m),
         px AS (
           SELECT doc_id,
                  list_transform(range(0, 64),
                    i -> ascii(t[(i * n) // 64 + 1])) AS p
           FROM d),
         h AS (SELECT doc_id, p, list_sum(p) AS s FROM px),
         bands AS (
           SELECT doc_id,
                  ${PHASH_BAND(0)} AS b0, ${PHASH_BAND(16)} AS b1,
                  ${PHASH_BAND(32)} AS b2, ${PHASH_BAND(48)} AS b3
           FROM h),
         idx AS (
           SELECT doc_id, 0 AS band, b0 AS v FROM bands
           UNION ALL SELECT doc_id, 1, b1 FROM bands
           UNION ALL SELECT doc_id, 2, b2 FROM bands
           UNION ALL SELECT doc_id, 3, b3 FROM bands),
         cand AS (
           SELECT DISTINCT l.doc_id AS da, r.doc_id AS db
           FROM idx l JOIN idx r
             ON l.band = r.band AND l.v = r.v AND l.doc_id < r.doc_id),
         ham AS (
           SELECT da, db,
                  CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
                     + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
                       AS BIGINT) AS hamming
           FROM cand
           JOIN bands a ON a.doc_id = da
           JOIN bands b ON b.doc_id = db)
         SELECT da AS doc_a, db AS doc_b, hamming
         FROM ham WHERE hamming <= 3 ORDER BY doc_a, doc_b""",
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
