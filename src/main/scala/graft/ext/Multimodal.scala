package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star extensions, SURVEY.md §7.2
  * step 8): media treated as opaque `binary` payloads with typed metadata,
  * plus a per-partition batch "decode" stage.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked deterministic fake (`fakeDecodeFrame`); everything
  * around it — binary columns, schema, per-partition batch iteration,
  * explode of variable-length frame output — is real Spark plumbing and
  * is what carries over to a production decoder at 100 TB (the decode
  * stage is embarrassingly parallel; partition count, not driver memory,
  * bounds throughput).
  */
object Multimodal {

  /** Metadata extraction over binary payloads — byte length, content
    * fingerprint, and fake decoded dimensions derived arithmetically
    * (oracle-checkable on both engines). */
  def payloadMeta(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        octet_length(col("text")).as("n_bytes"),
        sha2(col("text"), 256).as("fingerprint"),
        (lit(64) + pmod(col("n_chars"), lit(512))).as("width"),
        (lit(64) + pmod(col("n_chars") * 7, lit(512))).as("height"),
        lit(3).as("channels"))

  val payloadMetaSql: String =
    """SELECT doc_id,
      |       octet_length(encode(text)) AS n_bytes,
      |       sha256(text) AS fingerprint,
      |       64 + (n_chars % 512) AS width,
      |       64 + ((n_chars * 7) % 512) AS height,
      |       3 AS channels
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Seed for the frame-hash fold (a large prime reduced into the modular
    * field so every step stays overflow-free on both engines). */
  val FrameHashSeed: Long = 1125899906842597L % 2147483647L

  /** STUB decode: a real codec would parse the container format here.
    * This deterministic fake slices the payload into fixed-size "frames"
    * and fingerprints each with a modular polynomial fold — stable across
    * runs and partitionings, and expressible as a DuckDB `list_reduce` so
    * the operator is fully oracle-checkable despite the imperative
    * mapPartitions formulation. */
  def fakeDecodeFrame(payload: Array[Byte], frameSize: Int): Iterator[(Int, Int, Long)] =
    payload.grouped(frameSize).take(8).zipWithIndex.map { case (frame, idx) =>
      var h = FrameHashSeed
      frame.foreach(b => h = (h * 31 + (b & 0xff)) % 2147483647L)
      (idx, frame.length, h)
    }

  private val frameSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_bytes", IntegerType, nullable = false),
    StructField("frame_hash", LongType, nullable = false)))

  /** The opaque-binary projection every stub decoder stage consumes —
    * ONE definition so a change to the payload derivation (charset,
    * null-text guard) cannot silently diverge between the five
    * multimodal operators. */
  private def payloadProjection(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  private def payloadsOf(spark: SparkSession, sfDir: String): DataFrame =
    payloadProjection(Tables.documents(spark, sfDir))

  /** Frame sampling: binary payload → per-partition batch decode →
    * one row per sampled frame. The mapPartitions stage is where a
    * production pipeline calls the codec library once per batch (the
    * Scala analog of the Python `mapInPandas` pattern). Checked by
    * ExtensionsSpec (frame reassembly / byte accounting), a GraftProps
    * property (partitioning-independent frame hashes), and — since the
    * fixture corpus is pure ASCII, so UTF-8 byte slices coincide with
    * character slices — a full DuckDB oracle replaying the same modular
    * fold via `list_reduce`. */
  def frameSample(spark: SparkSession, sfDir: String): DataFrame = {
    val payloads = payloadsOf(spark, sfDir)
    val rowEncoder = org.apache.spark.sql.Encoders.row(frameSchema)
    payloads.mapPartitions { rows =>
      rows.flatMap { r =>
        val docId = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        fakeDecodeFrame(payload, 64).map { case (idx, len, h) =>
          Row(docId, idx, len, h)
        }
      }
    }(rowEncoder)
  }

  /** STUB feature extractor: a real pipeline would run an image/audio
    * featurizer here; this deterministic fake computes a 16-bin byte
    * histogram per payload. Same batch shape as a production featurizer
    * (one imperative pass per payload inside mapPartitions), exploded to
    * long-format rows so the oracle compare needs no array equality. */
  def extractFeatures(payload: Array[Byte]): Array[Int] = {
    val bins = new Array[Int](16)
    payload.foreach(b => bins((b & 0xff) >> 4) += 1)
    bins
  }

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("bin", IntegerType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false)))

  /** Per-payload feature rows: (doc_id, histogram bin, byte count), one
    * row per NON-EMPTY bin — the decode→featurize stage of a multimodal
    * pipeline with the real Spark plumbing (binary column in, batched
    * per-partition imperative pass, long-format rows out). */
  def featureExtract(spark: SparkSession, sfDir: String): DataFrame = {
    val payloads = payloadsOf(spark, sfDir)
    val rowEncoder = org.apache.spark.sql.Encoders.row(featureSchema)
    payloads.mapPartitions { rows =>
      rows.flatMap { r =>
        val docId = r.getLong(0)
        extractFeatures(r.getAs[Array[Byte]](1)).iterator.zipWithIndex.collect {
          case (n, bin) if n > 0 => Row(docId, bin, n)
        }
      }
    }(rowEncoder)
  }

  val featureExtractSql: String =
    """SELECT doc_id, bin, CAST(count(*) AS INT) AS n_bytes
      |FROM (
      |  SELECT doc_id, CAST(ascii(c) // 16 AS INT) AS bin
      |  FROM (SELECT doc_id,
      |               unnest(list_transform(range(1, length(text) + 1),
      |                 i -> substr(text, CAST(i AS INT), 1))) AS c
      |        FROM documents))
      |GROUP BY doc_id, bin
      |ORDER BY doc_id, bin""".stripMargin

  /** STUB resize: a real pipeline would rescale decoded pixel data; this
    * deterministic fake nearest-neighbor-samples the payload at `target`
    * evenly-spaced byte offsets (position k ↦ byte ⌊k·n/target⌋ — the 1-D
    * analog of nearest-neighbor image scaling) and fingerprints the
    * resampled bytes with the same modular fold as the frame decoder. */
  val ResizeTarget = 32

  def fakeResize(payload: Array[Byte], target: Int): (Int, Long) = {
    val n = payload.length
    var h = FrameHashSeed
    var k = 0
    val m = math.min(target, n)
    while (k < m) {
      val b = payload((k.toLong * n / m).toInt) & 0xff
      h = (h * 31 + b) % 2147483647L
      k += 1
    }
    (m, h)
  }

  private val resizeSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("resized_bytes", IntegerType, nullable = false),
    StructField("resized_hash", LongType, nullable = false)))

  /** Resize stage: binary payload in, fixed-size resampled fingerprint
    * out — per-partition imperative pass like the other codec stages, and
    * fully oracled because the sampling positions and the fold are pure
    * integer arithmetic over ASCII-coincident bytes. */
  def resize(spark: SparkSession, sfDir: String): DataFrame = {
    val payloads = payloadsOf(spark, sfDir)
    val rowEncoder = org.apache.spark.sql.Encoders.row(resizeSchema)
    payloads.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](1)
        val (m, h) = fakeResize(payload, ResizeTarget)
        Row(r.getLong(0), payload.length, m, h)
      }
    }(rowEncoder)
  }

  val resizeSql: String =
    s"""SELECT doc_id, CAST(length(text) AS INT) AS n_bytes,
       |       CAST(least($ResizeTarget, length(text)) AS INT) AS resized_bytes,
       |       list_reduce(list_prepend(1125899906842597 % 2147483647,
       |         list_transform(range(0, least($ResizeTarget, length(text))),
       |           k -> CAST(ascii(substr(text,
       |                  CAST(k * length(text) // least($ResizeTarget, length(text)) + 1 AS INT),
       |                  1)) AS BIGINT))),
       |         (a, b) -> (a*31 + b) % 2147483647) AS resized_hash
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Audio-style OVERLAPPING window framing (window 32 bytes, hop 16 —
    * the 50 %-overlap short-time analysis shape every audio featurizer
    * uses; a real pipeline would put PCM decode + FFT here). Per window:
    * integer energy (byte sum) and peak (byte max) — pure integer
    * arithmetic, so fully oracle-checkable. Same per-partition batch
    * plumbing as the codec stages; output rows ≈ 2× payload/window,
    * embarrassingly parallel, no shuffle anywhere. */
  val AudioWindowBytes = 32
  val AudioHopBytes = 16
  val AudioMaxWindows = 12

  def fakeAudioWindows(payload: Array[Byte]): Iterator[(Int, Int, Int, Long, Int)] = {
    val n = payload.length
    Iterator.range(0, n, AudioHopBytes).take(AudioMaxWindows).map { start =>
      val end = math.min(start + AudioWindowBytes, n)
      var energy = 0L
      var peak = 0
      var i = start
      while (i < end) {
        val b = payload(i) & 0xff
        energy += b
        if (b > peak) peak = b
        i += 1
      }
      (start / AudioHopBytes, start, end - start, energy, peak)
    }
  }

  private val audioSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("win_idx", IntegerType, nullable = false),
    StructField("start_byte", IntegerType, nullable = false),
    StructField("win_bytes", IntegerType, nullable = false),
    StructField("energy", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false)))

  def audioWindows(spark: SparkSession, sfDir: String): DataFrame = {
    val payloads = payloadsOf(spark, sfDir)
    val rowEncoder = org.apache.spark.sql.Encoders.row(audioSchema)
    payloads.mapPartitions { rows =>
      rows.flatMap { r =>
        val docId = r.getLong(0)
        fakeAudioWindows(r.getAs[Array[Byte]](1)).map {
          case (wi, start, len, energy, peak) => Row(docId, wi, start, len, energy, peak)
        }
      }
    }(rowEncoder)
  }

  val audioWindowsSql: String =
    s"""WITH idx AS (
       |  SELECT doc_id, text,
       |         unnest(range(0, least(CAST(ceil(length(text) / $AudioHopBytes.0) AS BIGINT),
       |                               $AudioMaxWindows))) AS wi
       |  FROM documents),
       |w AS (
       |  SELECT doc_id, CAST(wi AS INT) AS win_idx,
       |         CAST(wi * $AudioHopBytes AS INT) AS start_byte,
       |         substr(text, CAST(wi * $AudioHopBytes + 1 AS INT), $AudioWindowBytes) AS frame
       |  FROM idx)
       |SELECT doc_id, win_idx, start_byte,
       |       CAST(length(frame) AS INT) AS win_bytes,
       |       CAST(list_sum(list_transform(range(1, length(frame) + 1),
       |              i -> ascii(substr(frame, CAST(i AS INT), 1)))) AS BIGINT) AS energy,
       |       CAST(list_max(list_transform(range(1, length(frame) + 1),
       |              i -> ascii(substr(frame, CAST(i AS INT), 1)))) AS INT) AS peak
       |FROM w ORDER BY doc_id, win_idx""".stripMargin

  /** Energy threshold for VAD, as mean-byte-value × 100 so the activity
    * test is EXACT integer arithmetic in both engines
    * (energy·100 > threshold·win_bytes — no FP division anywhere).
    * 96.00 splits the fixture ~26 % active at both SFs. */
  val VadMeanByteX100 = 9600L

  /** Voice-activity segmentation — the speech-curation stage a speech
    * corpus pipeline runs right after framing (classic energy-based VAD,
    * Rabiner & Sambur 1975): a window is ACTIVE when its mean byte
    * energy clears the threshold, and maximal runs of consecutive
    * active windows merge into segments (gaps-and-islands per doc) —
    * the segments are what gets transcribed/kept, silence is dropped.
    * Built entirely on [[audioWindows]]'s per-window integer features:
    * activity is an exact integer compare, the run merge is one
    * `lag` + running-sum window PARTITIONED BY doc (bounded ≤
    * AudioMaxWindows rows per doc), and the per-segment reduce is a
    * hash aggregate — the decode stays map-side, only (doc, window)
    * feature rows ever shuffle. */
  def audioVad(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("win_idx"))
    audioWindows(spark, sfDir)
      .filter(col("energy") * 100 > lit(VadMeanByteX100) * col("win_bytes"))
      .withColumn("prev", lag(col("win_idx"), 1).over(byDoc))
      .withColumn("brk",
        when(col("prev").isNull || col("win_idx") - col("prev") > 1, 1L)
          .otherwise(0L))
      .withColumn("seg", sum(col("brk")).over(byDoc))
      .groupBy(col("doc_id"), col("seg"))
      .agg(min(col("win_idx")).as("start_win"),
        max(col("win_idx")).as("end_win"),
        count(lit(1)).as("n_windows"),
        sum(col("energy")).as("seg_energy"))
      .select(col("doc_id"), col("seg").cast("int").as("seg_idx"),
        col("start_win"), col("end_win"), col("n_windows"), col("seg_energy"))
  }

  lazy val audioVadSql: String =
    s"""WITH aw AS ($audioWindowsSql),
       |act AS (
       |  SELECT doc_id, win_idx, energy FROM aw
       |  WHERE energy * 100 > $VadMeanByteX100 * win_bytes),
       |mark AS (
       |  SELECT doc_id, win_idx, energy,
       |    CASE WHEN lag(win_idx) OVER w IS NULL
       |           OR win_idx - lag(win_idx) OVER w > 1
       |         THEN 1 ELSE 0 END AS brk
       |  FROM act
       |  WINDOW w AS (PARTITION BY doc_id ORDER BY win_idx)),
       |seg AS (
       |  SELECT *, sum(brk) OVER (PARTITION BY doc_id ORDER BY win_idx) AS seg
       |  FROM mark)
       |SELECT doc_id, CAST(seg AS INT) AS seg_idx,
       |       min(win_idx) AS start_win, max(win_idx) AS end_win,
       |       CAST(count(*) AS BIGINT) AS n_windows,
       |       CAST(sum(energy) AS BIGINT) AS seg_energy
       |FROM seg GROUP BY doc_id, seg
       |ORDER BY doc_id, seg_idx""".stripMargin

  val frameSampleSql: String =
    """WITH idx AS (
      |  SELECT doc_id, text,
      |         unnest(range(0, least(CAST(ceil(length(text)/64.0) AS BIGINT), 8))) AS fi
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, CAST(fi AS INT) AS frame_idx,
      |         substr(text, CAST(fi*64+1 AS INT), 64) AS frame
      |  FROM idx)
      |SELECT doc_id, frame_idx, CAST(length(frame) AS INT) AS frame_bytes,
      |       list_reduce(list_prepend(1125899906842597 % 2147483647,
      |         list_transform(range(1, length(frame)+1),
      |           i -> CAST(ascii(substr(frame, CAST(i AS INT), 1)) AS BIGINT))),
      |         (a, b) -> (a*31 + b) % 2147483647) AS frame_hash
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  /** Perceptual-hash near-dup detection over the payload "image" — the
    * IMAGE leg of the dedup story (text shingles ✓, embeddings ✓, and
    * now pixels): average-hash pHash on a fake 8×8 grid (pixel i = byte
    * i mod len of the payload — the stand-in for a real decoder's
    * grayscale downsample, same stub contract as [[fakeDecodeFrame]]),
    * each pixel thresholded against the grid SUM in pure integer math
    * (pixel·64 > Σ — no FP mean, so the code replays exactly), packed
    * into two 32-bit halves like the Hamming ANN codes. Candidate pairs
    * bucket on the code's 16-bit prefix — the same
    * fixed-size-key-shuffle posture as SimHash, never all-pairs — and
    * survive at Hamming ≤ 8 of 64. A production deployment swaps the
    * pixel stage for a real thumbnail decode; everything downstream
    * (threshold, packing, bucketing, verify) is unchanged. */
  def phashDedup(spark: SparkSession, sfDir: String): DataFrame = {
    // empty documents are excluded BEFORE the pixel expression: under
    // this project's ANSI-on sessions `i % length(text)` throws
    // DIVIDE_BY_ZERO at length 0 (the DuckDB twin's `i % 0` yields NULL
    // pixels, whose hash never joins — so exclusion is exactly the
    // twin's semantics, reached without killing the job)
    val px = Tables.documents(spark, sfDir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), expr(
        """transform(sequence(0, 63),
          |  i -> CAST(ascii(substring(text, CAST(i % length(text) AS INT) + 1, 1)) AS BIGINT))"""
          .stripMargin).as("p"))
      .withColumn("tot", expr("aggregate(p, CAST(0 AS BIGINT), (a, x) -> a + x)"))
    def half(lo: Int, hi: Int) = expr(
      s"""aggregate(slice(p, $lo, ${hi - lo + 1}), CAST(0 AS BIGINT),
         |  (a, x) -> a * 2 + IF(x * 64 > tot, 1, 0))""".stripMargin)
    // localCheckpoint: without it CollapseProject inlines the interpreted
    // 64-element folds into BOTH self-join sides' keys/conditions and the
    // optimizer re-walks the doubled expression trees for seconds
    // (measured 9 s → 0.5 s on 500 docs). Materializing is also the
    // production shape: the 24 B/row code table IS the pHash index.
    val codes = px.select(col("doc_id"),
      half(1, 32).as("hi"), half(33, 64).as("lo")).localCheckpoint()
    codes.as("a")
      .join(codes.as("b"),
        expr("(a.hi div 65536) = (b.hi div 65536)")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        (expr("bit_count(a.hi ^ b.hi)") + expr("bit_count(a.lo ^ b.lo)"))
          .cast("int").as("hamming"))
      .filter(col("hamming") <= 8)
  }

  val phashDedupSql: String =
    """WITH px AS (
      |  SELECT doc_id,
      |    list_transform(range(0, 64),
      |      i -> CAST(ascii(substring(text, CAST(i % length(text) AS INT) + 1, 1)) AS BIGINT)) AS p
      |  FROM documents),
      |s AS (SELECT doc_id, p, list_sum(p) AS tot FROM px),
      |code AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(p[1:32],
      |        x -> CASE WHEN x * 64 > tot THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
      |      (a, b) -> a * 2 + b) AS hi,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(p[33:64],
      |        x -> CASE WHEN x * 64 > tot THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
      |      (a, b) -> a * 2 + b) AS lo
      |  FROM s)
      |SELECT doc_a, doc_b, hamming FROM (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |         CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS INT) AS hamming
      |  FROM code a JOIN code b
      |    ON (a.hi // 65536) = (b.hi // 65536) AND a.doc_id < b.doc_id)
      |WHERE hamming <= 8
      |ORDER BY doc_a, doc_b""".stripMargin

  private val sceneSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame_bytes", IntegerType, nullable = false),
    StructField("hist", ArrayType(LongType, containsNull = false), nullable = false)))

  /** Scene-cut detection — shot-boundary detection by histogram
    * differencing (the classic video-segmentation baseline: a cut is
    * declared where consecutive frames' intensity histograms diverge),
    * over the same stub decoder contract as [[frameSample]]: frames are
    * 64-byte payload slices, the per-frame "intensity histogram" is a
    * 16-bin byte histogram from one imperative pass (the production
    * version histograms a decoded grayscale thumbnail; the surrounding
    * plumbing is identical). The L1 histogram delta then comes from a
    * per-doc lag window, and a frame is a cut when MORE THAN HALF the
    * total mass moved — `2·Δ > len_i + len_{i−1}`, pure integer math so
    * both engines agree exactly; frame 0 is always a cut (every video
    * opens a scene). 100 TB shape: decode is the embarrassingly-parallel
    * mapPartitions pass, and the only shuffle is the per-doc window over
    * ≤ 8 frame rows of 16 longs each — frames never leave their split
    * until they are histograms. */
  def sceneCuts(spark: SparkSession, sfDir: String): DataFrame =
    sceneCutsOnDocs(Tables.documents(spark, sfDir))

  def sceneCutsOnDocs(documents: DataFrame): DataFrame = {
    val payloads = payloadProjection(documents)
    val rowEncoder = org.apache.spark.sql.Encoders.row(sceneSchema)
    val frames = payloads.mapPartitions { rows =>
      rows.flatMap { r =>
        val docId = r.getLong(0)
        r.getAs[Array[Byte]](1).grouped(64).take(8).zipWithIndex.map {
          case (frame, idx) =>
            val hist = new Array[Long](16)
            frame.foreach(b => hist((b & 0xff) >> 4) += 1L)
            Row(docId, idx, frame.length, hist.toSeq)
        }
      }
    }(rowEncoder)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frames
      .withColumn("ph", lag(col("hist"), 1).over(w))
      .withColumn("pfb", lag(col("frame_bytes"), 1).over(w))
      .withColumn("delta", coalesce(
        aggregate(zip_with(col("hist"), col("ph"), (a, b) => abs(a - b)),
          lit(0L), (acc, x) => acc + x),
        lit(0L)))
      .select(col("doc_id"), col("frame_idx"), col("delta"),
        (col("ph").isNull ||
          col("delta") * 2 > (col("frame_bytes") + col("pfb")))
          .as("is_cut"))
  }

  val sceneCutsSql: String =
    """WITH idx AS (
      |  SELECT doc_id, text,
      |         unnest(range(0, least(CAST(ceil(length(text)/64.0) AS BIGINT), 8))) AS fi
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, CAST(fi AS INT) AS frame_idx,
      |         substr(text, CAST(fi*64+1 AS INT), 64) AS frame
      |  FROM idx),
      |h AS (
      |  SELECT doc_id, frame_idx, length(frame) AS fb,
      |    list_transform(range(0, 16), b -> CAST(len(list_filter(
      |      list_transform(range(1, length(frame) + 1),
      |        i -> ascii(substr(frame, CAST(i AS INT), 1)) // 16),
      |      v -> v = b)) AS BIGINT)) AS hist
      |  FROM f),
      |d AS (
      |  SELECT doc_id, frame_idx, fb, hist,
      |    lag(hist) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS ph,
      |    lag(fb) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS pfb
      |  FROM h),
      |e AS (
      |  SELECT doc_id, frame_idx, fb, ph, pfb,
      |    CAST(coalesce(list_sum(list_transform(list_zip(hist, ph),
      |      p -> abs(p[1] - p[2]))), 0) AS BIGINT) AS delta
      |  FROM d)
      |SELECT doc_id, frame_idx, delta,
      |  (ph IS NULL OR delta * 2 > fb + pfb) AS is_cut
      |FROM e ORDER BY doc_id, frame_idx""".stripMargin
}
