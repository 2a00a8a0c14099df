package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.12 D6): media payloads travel as
  * opaque `binary` columns with typed metadata alongside. The Spark-side
  * machinery — schema, partition-preserving batch processing, decode fan-out
  * — is real, and the image path uses a REAL codec (JDK `javax.imageio`
  * PNG/JPEG/BMP/GIF decode + raster resample). Frame sampling is likewise a
  * real multi-frame decode for the one animated container the JDK reads
  * natively (animated GIF — one row per true frame, pixel-exact spec'd);
  * payloads no reader accepts (the testdata ships text bytes, not media)
  * take a clearly-marked deterministic byte-window fallback.
  */
object Multimodal {

  /** Decoded-media metadata row. */
  final case class MediaMeta(doc_id: Long, width: Int, height: Int,
      n_channels: Int, mean_intensity: Double)

  /** Binary-column metadata extraction, fully oracle-checked: payload size,
    * leading-bytes hex ("magic number" inspection) and a content checksum.
    * The binary payload is synthesized from `text` (UTF-8 bytes) since the
    * testdata ships no real media — the point is that Catalyst handles
    * BinaryType end to end (scan → expressions → exchange).
    */
  private val multimodalMeta = Q(
    "multimodal_meta",
    (s, dir) => Tables.load(s, dir, "documents")
      .withColumn("payload", col("text").cast("binary"))
      .select(
        col("doc_id"),
        length(col("payload")).as("n_bytes"),
        upper(hex(substring(col("payload"), 1, 8))).as("magic_hex"),
        md5(col("text")).as("checksum"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
           | CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           | upper(hex(encode(substring(text, 1, 8)))) AS magic_hex,
           | md5(text) AS checksum
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** Decode / feature-extract over binary payloads via `mapPartitions` —
    * the Scala analogue of a batched `mapInPandas` decode: one decoder
    * context per partition, streaming the rows through it. The testdata
    * payloads are text bytes no ImageReader accepts, so every row takes the
    * deterministic byte-derived fallback — which is plain arithmetic over
    * the payload bytes and therefore fully oracle-checked (byte =
    * `ascii(substr(...))` on the all-ASCII corpus); the REAL codec path is
    * pixel-exact spec'd against in-memory PNGs (TextMultimodalSpec).
    */
  private val multimodalDecode = Q(
    "multimodal_decode",
    (s, dir) => {
      // spread: per-payload decode at full parallelism (Tables.spread doc)
      val d = Tables.spread(Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload")))
      decodeImages(s, d)
        .select(col("doc_id"), col("width"), col("height"),
          col("n_channels"), round(col("mean_intensity"), 6).as("mean_intensity"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
           | CAST(16 + ascii(substr(text,1,1)) % 240 AS INT) AS width,
           | CAST(16 + (CASE WHEN length(text) > 1 THEN ascii(substr(text,2,1)) ELSE 0 END) % 240 AS INT) AS height,
           | CAST(3 AS INT) AS n_channels,
           | round(CAST(list_sum(list_transform(range(1, length(text)+1),
           |   i -> ascii(substr(text, CAST(i AS INT), 1)))) AS DOUBLE) / length(text), 6) AS mean_intensity
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** Real PNG/JPEG decode via the JDK's `javax.imageio` (no external
    * dependency): payloads that any registered ImageReader accepts are
    * decoded to pixels — width/height/channel count from the image, mean
    * intensity as the average per-pixel RGB luminance. Non-image payloads
    * (e.g. the testdata's synthesized UTF-8 bytes) fall back to a
    * deterministic byte-derived summary so the operator is total and tests
    * are stable.
    *
    * Batch shape: partition-local codec applied per row inside
    * `mapPartitions` (the Scala analogue of a batched `mapInPandas` decode)
    * — no shuffle, schema typed via the case-class encoder.
    */
  def decodeImages(s: SparkSession, df: DataFrame): Dataset[MediaMeta] = {
    import s.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // ImageIO's reader registry is JVM-global; per-partition we only pay
        // stream setup per row
        rows.map { case (id, bytes) =>
          decodeOne(bytes) match {
            case Some(img) =>
              MediaMeta(id, img.getWidth, img.getHeight,
                img.getColorModel.getNumComponents, meanLuminance(img))
            case None =>
              val b0 = if (bytes.nonEmpty) bytes(0) & 0xff else 0
              val b1 = if (bytes.length > 1) bytes(1) & 0xff else 0
              val mean = if (bytes.isEmpty) 0.0
                else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length
              MediaMeta(id, 16 + b0 % 240, 16 + b1 % 240, 3, mean)
          }
        }
      }
  }

  /** ImageIO decode; None when no registered reader accepts the bytes.
    *
    * r19 per-row cost fixes (guide §1.2 step 2), both value-identical:
    *  - ImageIO's default stream cache is a DISK-backed
    *    FileCacheImageInputStream — a temp-file create+delete PER CALL;
    *    `setUseCache(false)` keeps the probe in memory (we already hold
    *    the full payload as a byte array).
    *  - A magic-byte sniff skips the reader-registry scan outright for
    *    payloads no JDK reader can accept. Every registered JDK reader
    *    (PNG/JPEG/GIF/BMP/WBMP/TIFF) gates `canDecodeInput` on exactly
    *    these leading bytes, so "no magic matches" already implied
    *    `ImageIO.read` returning null — the sniff just answers without
    *    constructing streams. Payloads that DO carry a magic still take
    *    the full decode (a corrupt body then returns null/throws as
    *    before).
    */
  private def maybeImage(bytes: Array[Byte]): Boolean = {
    if (bytes.length < 2) return false
    val b0 = bytes(0) & 0xff
    val b1 = bytes(1) & 0xff
    (b0 == 0x89 && b1 == 0x50) || // PNG
    (b0 == 0xff && b1 == 0xd8) || // JPEG
    (b0 == 'G' && b1 == 'I') ||   // GIF
    (b0 == 'B' && b1 == 'M') ||   // BMP
    (b0 == 'I' && b1 == 'I') ||   // TIFF little-endian
    (b0 == 'M' && b1 == 'M') ||   // TIFF big-endian
    (b0 == 0x00 && b1 == 0x00)    // WBMP type 0
  }

  private def decodeOne(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (!maybeImage(bytes)) None
    else
      try {
        javax.imageio.ImageIO.setUseCache(false)
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      } catch { case _: Exception => None }

  /** Mean of per-pixel (r+g+b)/3 over the full image. */
  private def meanLuminance(img: java.awt.image.BufferedImage): Double = {
    val (w, h) = (img.getWidth, img.getHeight)
    var acc = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        acc += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
        x += 1
      }
      y += 1
    }
    acc / (w.toLong * h)
  }

  /** Resized-image metadata row. */
  final case class ResizedMeta(doc_id: Long, out_width: Int, out_height: Int,
      mean_intensity: Double)

  /** One sampled frame. */
  final case class Frame(doc_id: Long, frame_idx: Int, n_bytes: Int, checksum: Long)

  /** Decode → resize to a fixed target — the standard image-normalization
    * stage before feature extraction. Same partition-local batch shape as
    * [[decodeImages]]. Real images go through an actual raster resample
    * (Graphics2D nearest-neighbor draw onto the target raster —
    * deterministic); non-image payloads fall back to a deterministic strided
    * byte sample so the operator is total.
    */
  def resizeImages(s: SparkSession, df: DataFrame,
                   outW: Int = 32, outH: Int = 32): Dataset[ResizedMeta] = {
    import s.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          decodeOne(bytes) match {
            case Some(img) =>
              val out = new java.awt.image.BufferedImage(outW, outH,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g2 = out.createGraphics()
              g2.drawImage(img, 0, 0, outW, outH, null)
              g2.dispose()
              ResizedMeta(id, outW, outH, meanLuminance(out))
            case None if bytes.isEmpty => ResizedMeta(id, outW, outH, 0.0)
            case None =>
              // deterministic fallback: mean over outW×outH strided byte samples
              val n = bytes.length
              var acc = 0.0
              var i = 0
              val samples = outW * outH
              while (i < samples) { acc += (bytes(i * n / samples % n) & 0xff); i += 1 }
              ResizedMeta(id, outW, outH, acc / samples)
          }
        }
      }
  }

  /** Frame sampling over a media payload — the 1→N `flatMap`-shaped batch
    * decode. Payloads an `ImageReader` accepts go through a REAL multi-frame
    * decode (the JDK's GIF reader iterates animated-GIF frames natively;
    * single-frame formats yield one row): every `stride`-th STORED frame
    * (see [[decodeFrames]] on delta-compressed GIFs) becomes a
    * row with `n_bytes` = its decoded RGB byte count and a FNV-1a checksum
    * over the row-major R,G,B stream — pixel-exact, so downstream exact
    * dedup of frames is a plain groupBy over the checksum. Non-media bytes
    * (the testdata's text payloads) take the deterministic byte-window
    * fallback: every `stride`-th fixed-size window of the byte stream, same
    * checksum convention, which is what the DuckDB oracle replays.
    */
  def sampleFrames(s: SparkSession, df: DataFrame,
                   frameBytes: Int = 64, stride: Int = 4): Dataset[Frame] = {
    import s.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        decodeFrames(bytes, stride) match {
          case Some(frames) =>
            frames.map { case (f, img) =>
              val (w, h) = (img.getWidth, img.getHeight)
              var acc = 0xcbf29ce484222325L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  acc ^= (rgb >> 16) & 0xffL; acc *= 0x100000001b3L
                  acc ^= (rgb >> 8) & 0xffL; acc *= 0x100000001b3L
                  acc ^= rgb & 0xffL; acc *= 0x100000001b3L
                  x += 1
                }
                y += 1
              }
              Frame(id, f, 3 * w * h, acc)
            }
          case None =>
            val nFrames = math.max(bytes.length / frameBytes, 1)
            (0 until nFrames by stride).map { f =>
              val from = math.min(f * frameBytes, math.max(bytes.length - 1, 0))
              val until = math.min(from + frameBytes, bytes.length)
              var h = 0xcbf29ce484222325L
              var i = from
              while (i < until) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
              Frame(id, f, until - from, h)
            }
        }
      }
  }

  /** Every `stride`-th STORED frame of a media payload via `ImageReader`
    * (animated GIF is the JDK-native multi-frame case); only the sampled
    * indices are decoded — never the whole animation — so peak memory per
    * row is one frame. Note the unit is the stored frame: an optimized GIF
    * using inter-frame compression stores delta patches, and those rows
    * carry the PATCH raster (compositing by disposal metadata is out of
    * scope; the pixel-exact spec covers full-frame GIFs). None when no
    * registered reader accepts the bytes — the fallback trigger, exactly
    * like [[decodeOne]].
    */
  private def decodeFrames(bytes: Array[Byte], stride: Int)
      : Option[IndexedSeq[(Int, java.awt.image.BufferedImage)]] = {
    // same magic sniff + in-memory stream cache as decodeOne: "no reader
    // magic" already meant getImageReaders came back empty → None
    if (!maybeImage(bytes)) return None
    javax.imageio.ImageIO.setUseCache(false)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          // allowSearch=true: the GIF reader walks the stream to count frames
          val n = r.getNumImages(true)
          if (n < 1) None else Some((0 until n by stride).map(f => f -> r.read(f)))
        } catch { case _: Exception => None }
        finally r.dispose()
      }
    } catch { case _: Exception => None }
    finally if (iis != null) iis.close()
  }

  /** Resize stage over the synthesized payloads. Like [[multimodalDecode]],
    * the testdata exercises the deterministic strided-byte-sample fallback,
    * which the oracle reproduces exactly (floor division and modular
    * striding over `ascii` bytes); the real raster resample is pixel-exact
    * spec'd in TextMultimodalSpec.
    */
  private val multimodalResize = Q(
    "multimodal_resize",
    (s, dir) => {
      // spread: per-payload resample at full parallelism (Tables.spread doc)
      val d = Tables.spread(Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload")))
      resizeImages(s, d)
        .select(col("doc_id"), col("out_width"), col("out_height"),
          round(col("mean_intensity"), 6).as("mean_intensity"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, CAST(32 AS INT) AS out_width, CAST(32 AS INT) AS out_height,
           | round(CAST(list_sum(list_transform(range(0, 1024),
           |   i -> ascii(substr(text,
           |     CAST((i*length(text))//1024 % length(text) AS INT) + 1, 1)))) AS DOUBLE)
           |   / 1024, 6) AS mean_intensity
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** Frame-sampling stage. The byte-window FNV-1a checksum is fully
    * oracle-checked: DuckDB lacks wrapping 64-bit arithmetic and byte
    * indexing, so the oracle emulates both — the hash accumulates in
    * HUGEINT mod 2^64 (the wrapping multiply fits 128 bits: 2^64·prime <
    * 2^104), the per-byte XOR touches only the low 8 bits (so it runs on a
    * BIGINT slice of the accumulator), bytes come from `ascii(substr(...))`
    * (byte = codepoint for the all-ASCII testdata payloads — asserted
    * cheaply by the oracle equality itself: any non-ASCII byte would
    * hash-mismatch), and the final value maps to signed two's-complement.
    */
  private val multimodalFrames = Q(
    "multimodal_frames",
    (s, dir) => {
      // spread: per-payload frame decode at full parallelism
      val d = Tables.spread(Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload")))
      sampleFrames(s, d)
        .orderBy("doc_id", "frame_idx")
        .toDF()
    },
    Some("""WITH d AS (SELECT doc_id, text, octet_length(encode(text)) AS len FROM documents),
           |f AS (SELECT doc_id, text, len,
           |        CAST(unnest(range(0, greatest(len // 64, 1), 4)) AS BIGINT) AS frame_idx
           |      FROM d),
           |w AS (SELECT doc_id, frame_idx, text,
           |        least(frame_idx * 64, greatest(len - 1, 0)) AS frm,
           |        least(least(frame_idx * 64, greatest(len - 1, 0)) + 64, len) AS unt
           |      FROM f),
           |h AS (SELECT doc_id, frame_idx, frm, unt,
           |        list_reduce(
           |          list_prepend(CAST(14695981039346656037 AS HUGEINT),
           |            list_transform(range(frm + 1, unt + 1),
           |              i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS HUGEINT))),
           |          (h, b) -> ((h - (h % 256) + xor(CAST(h % 256 AS BIGINT), CAST(b AS BIGINT)))
           |                     * 1099511628211) % 18446744073709551616) AS uh
           |      FROM w)
           |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           |  CAST(unt - frm AS INT) AS n_bytes,
           |  CAST(CASE WHEN uh >= 9223372036854775808
           |            THEN uh - 18446744073709551616 ELSE uh END AS BIGINT) AS checksum
           |FROM h ORDER BY doc_id, frame_idx""".stripMargin))

  /** 64-bit average-hash fingerprint row. */
  final case class MediaHash(doc_id: Long, ahash: Long, n_set_bits: Int)

  /** Average-hash (aHash) perceptual fingerprint: resample to an 8×8
    * luminance grid, set bit i when cell i is brighter than the grid mean.
    * Re-encodings of the same picture land on the same (or Hamming-close)
    * hash, which makes exact/near dedup of IMAGES a groupBy / band-join over
    * the hash — the multimodal counterpart of SimHash on text (spec:
    * PNG≡BMP of one picture collide, a different picture doesn't). Real
    * images go through the actual decode + raster resample; non-image
    * payloads take the same strided byte fallback as [[resizeImages]] so
    * the operator is total and the testdata path stays oracle-checkable.
    */
  def imageHashes(s: SparkSession, df: DataFrame): Dataset[MediaHash] = {
    import s.implicits._
    val grid = 8
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val cells = grid * grid
          val lum = new Array[Double](cells)
          decodeOne(bytes) match {
            case Some(img) =>
              val out = new java.awt.image.BufferedImage(grid, grid,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g2 = out.createGraphics()
              g2.drawImage(img, 0, 0, grid, grid, null)
              g2.dispose()
              var i = 0
              while (i < cells) {
                val rgb = out.getRGB(i % grid, i / grid)
                lum(i) = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
                i += 1
              }
            case None if bytes.isEmpty => () // all-zero grid → hash 0
            case None =>
              // long stride math (not Int like the historical resize path):
              // i*n must not overflow for multi-GB payloads, and the oracle's
              // BIGINT arithmetic is the contract
              val n = bytes.length
              var i = 0
              while (i < cells) {
                lum(i) = (bytes(((i.toLong * n) / cells % n).toInt) & 0xff).toDouble
                i += 1
              }
          }
          val mean = lum.sum / cells
          var h = 0L
          var nb = 0
          var i = 0
          while (i < cells) {
            if (lum(i) > mean) { h |= 1L << i; nb += 1 }
            i += 1
          }
          MediaHash(id, h, nb)
        }
      }
  }

  /** Perceptual-hash stage over the synthesized payloads; the bit-pack is
    * oracle-emulated in HUGEINT exactly like [[multimodalFrames]]' checksum
    * (each 2^i is a power of two, so the double `power(2, i)` is exact
    * before the HUGEINT cast; the sum of distinct powers then maps to
    * signed two's-complement). Same indexing convention as the resize/frames
    * oracles: `ascii(substr(...))` addresses CHARACTERS while the Scala
    * fallback strides UTF-8 BYTES — identical on the all-ASCII testdata, and
    * any non-ASCII byte would surface as a hash mismatch rather than pass
    * silently. Empty documents take the dedicated zero-hash branch on both
    * engines (the Scala side via `bytes.isEmpty`, the oracle via the
    * `clen = 0` union leg — never dividing or striding by zero).
    */
  private val multimodalPhash = Q(
    "multimodal_phash",
    (s, dir) => {
      // spread: per-payload hashing at full parallelism (Tables.spread doc)
      val d = Tables.spread(Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload")))
      imageHashes(s, d).orderBy("doc_id").toDF()
    },
    Some("""WITH base AS (SELECT doc_id, text, length(text) AS clen FROM documents),
           |b AS (SELECT doc_id,
           |    list_transform(range(0, 64),
           |      i -> ascii(substr(text,
           |             CAST((i * clen) // 64 % clen AS INT) + 1, 1))) AS s
           |  FROM base WHERE clen > 0),
           |m AS (SELECT doc_id, s, CAST(list_sum(s) AS DOUBLE) / 64 AS mean FROM b),
           |h AS (SELECT doc_id,
           |    list_sum(list_transform(range(0, 64),
           |      i -> CASE WHEN s[CAST(i AS INT) + 1] > mean
           |                THEN CAST(power(2, CAST(i AS INT)) AS HUGEINT)
           |                ELSE CAST(0 AS HUGEINT) END)) AS uh,
           |    len(list_filter(range(0, 64), i -> s[CAST(i AS INT) + 1] > mean)) AS nb
           |  FROM m)
           |SELECT doc_id,
           |  CAST(CASE WHEN uh >= 9223372036854775808
           |            THEN uh - 18446744073709551616 ELSE uh END AS BIGINT) AS ahash,
           |  CAST(nb AS INT) AS n_set_bits
           |FROM h
           |UNION ALL
           |SELECT doc_id, CAST(0 AS BIGINT) AS ahash, CAST(0 AS INT) AS n_set_bits
           |FROM base WHERE clen = 0
           |ORDER BY doc_id""".stripMargin))

  /** Audio-feature extraction plumbing: interpret the payload as PCM16
    * little-endian mono and compute the standard waveform envelope features
    * — peak amplitude, RMS level, and the mean-crossing rate (zero-crossing
    * rate after DC removal — raw zero crossings are degenerate on biased
    * signals, and provably so on this corpus, where every ASCII-derived
    * sample is positive). No audio codec ships in a stock JVM, so — per the
    * multimodal contract above — the DECODE is the deterministic PCM16
    * interpretation of the bytes, while the Spark-side plumbing is the real
    * thing a 100 TB audio corpus needs: a linear sample explode, per-doc
    * two-phase aggregates, the DC mean folded back by a doc-keyed join, and
    * exact-integer crossing tests ((s·n − Σs) sign products — no division,
    * no FP) with one double sqrt at presentation. Entirely codegen'd column
    * expressions — no UDF, no mapPartitions — and replayed byte-for-byte in
    * DuckDB via the documented all-ASCII `ascii(substr(...))` convention.
    * An odd trailing byte is truncated (PCM16 frames are 2 bytes); docs
    * shorter than one sample keep their row with zeroed features.
    *
    * Honest caveat: `substr(text, p, 1)` char addressing is O(p) on
    * UTF8String, so per-sample access is quadratic in PAYLOAD LENGTH —
    * irrelevant at this corpus's KB-scale rows (measured 0.13 s at sf0.1)
    * but wrong for multi-MB audio; there the sample extraction swaps for a
    * partition-local byte-array decode (the [[imageHashes]] mapPartitions
    * pattern) while every aggregate downstream of the sample frame — the
    * actual distributed shape this query declares — stays as is.
    */
  private val multimodalWaveform = Q(
    "multimodal_waveform",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("n", (length(col("text")) / 2).cast("int"))
      val sm0 = Tables.spread(d.filter(col("n") >= 1))
        .select(col("doc_id"), col("n"), col("text"),
          explode(sequence(lit(0), col("n") - 1)).as("i"))
      def byteAt(p: Column): Column = ascii(col("text").substr(p, lit(1)))
      val u = byteAt(col("i") * 2 + 1) + lit(256) * byteAt(col("i") * 2 + 2)
      val u2 = when(col("i") < col("n") - 1,
        byteAt(col("i") * 2 + 3) + lit(256) * byteAt(col("i") * 2 + 4))
      def toS(c: Column): Column =
        when(c < 32768, c).otherwise(c - 65536).cast("long")
      val sm = graft.Caches.track(sm0.select(col("doc_id"), col("n"),
        toS(u).as("smp"), toS(u2).as("smp2")))
      val m = sm.groupBy("doc_id").agg(sum(col("smp")).as("ssum"))
      val a = sm.join(m, "doc_id")
        .groupBy("doc_id")
        .agg(max(abs(col("smp"))).as("peak"),
          sum(col("smp") * col("smp")).as("ssq"),
          sum(when(col("smp2").isNotNull &&
            (col("smp") * col("n") - col("ssum")) *
              (col("smp2") * col("n") - col("ssum")) < 0, 1L)
            .otherwise(0L)).as("mc"))
      d.select(col("doc_id"), col("n").as("n_samples"))
        .join(a, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_samples"),
          coalesce(col("peak"), lit(0L)).as("peak"),
          when(col("n_samples") > 0,
            round(sqrt(col("ssq").cast("double") / col("n_samples")), 6))
            .otherwise(lit(0.0)).as("rms"),
          coalesce(col("mc"), lit(0L)).as("mean_crossings"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, text, length(text) // 2 AS n FROM documents),
           |sm0 AS (SELECT doc_id, n, i,
           |    ascii(substr(text, CAST(i*2+1 AS INT), 1))
           |      + 256 * ascii(substr(text, CAST(i*2+2 AS INT), 1)) AS u,
           |    CASE WHEN i < n - 1 THEN ascii(substr(text, CAST(i*2+3 AS INT), 1))
           |         + 256 * ascii(substr(text, CAST(i*2+4 AS INT), 1)) END AS u2
           |  FROM d, unnest(range(0, n)) AS t(i)),
           |sm AS (SELECT doc_id, n,
           |    CAST(CASE WHEN u < 32768 THEN u ELSE u - 65536 END AS BIGINT) AS s,
           |    CAST(CASE WHEN u2 IS NULL THEN NULL
           |         WHEN u2 < 32768 THEN u2 ELSE u2 - 65536 END AS BIGINT) AS s2
           |  FROM sm0),
           |m AS (SELECT doc_id, CAST(sum(s) AS BIGINT) AS ssum FROM sm GROUP BY doc_id),
           |a AS (SELECT sm.doc_id, max(abs(s)) AS peak, sum(s*s) AS ssq,
           |    sum(CASE WHEN s2 IS NOT NULL
           |        AND (s * sm.n - m.ssum) * (s2 * sm.n - m.ssum) < 0
           |        THEN 1 ELSE 0 END) AS mc
           |  FROM sm JOIN m ON sm.doc_id = m.doc_id GROUP BY sm.doc_id)
           |SELECT d.doc_id, CAST(d.n AS INT) AS n_samples,
           |  CAST(COALESCE(a.peak, 0) AS BIGINT) AS peak,
           |  CASE WHEN d.n > 0
           |       THEN round(sqrt(CAST(CAST(a.ssq AS BIGINT) AS DOUBLE) / d.n), 6)
           |       ELSE CAST(0 AS DOUBLE) END AS rms,
           |  CAST(COALESCE(a.mc, 0) AS BIGINT) AS mean_crossings
           |FROM d LEFT JOIN a USING (doc_id) ORDER BY doc_id""".stripMargin))

  /** Walsh–Hadamard band correlations over the PCM16 stream — the
    * integer-exact spectral proxy beside [[multimodalWaveform]]'s envelope
    * features: correlate each signal with the first four Walsh square
    * waves, w_k(i) = (−1)^bit_{k−1}(i) (alternating at every sample, every
    * 2nd, 4th, 8th — a dyadic filter bank). A true DFT needs cos/sin of
    * arbitrary angles (cross-engine libm on transcendental ARGUMENTS, the
    * one FP dependence this repo bans); Walsh correlations are ±1 dot
    * products, so every coefficient is an EXACT long and the only double
    * is the presentation-time normalization by sample count. Same linear
    * sample explode + per-doc two-phase aggregate shape as the waveform
    * query; all codegen column expressions, byte-for-byte replayed in
    * DuckDB via the ascii(substr) convention.
    */
  private val multimodalHadamard = Q(
    "multimodal_hadamard",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("n", (length(col("text")) / 2).cast("int"))
      val sm0 = Tables.spread(d.filter(col("n") >= 1))
        .select(col("doc_id"), col("n"), col("text"),
          explode(sequence(lit(0), col("n") - 1)).as("i"))
      def byteAt(p: Column): Column = ascii(col("text").substr(p, lit(1)))
      val u = byteAt(col("i") * 2 + 1) + lit(256) * byteAt(col("i") * 2 + 2)
      val smp = when(u < 32768, u).otherwise(u - 65536).cast("long")
      def walsh(k: Int): Column =
        (lit(1L) - lit(2L) * shiftright(col("i"), k - 1).bitwiseAND(lit(1)))
          .cast("long")
      val a = sm0.select(col("doc_id"), col("n"), smp.as("s"), col("i"))
        .groupBy("doc_id")
        .agg(max(col("n")).as("n_samples"),
          sum(col("s") * walsh(1)).as("c1"), sum(col("s") * walsh(2)).as("c2"),
          sum(col("s") * walsh(3)).as("c3"), sum(col("s") * walsh(4)).as("c4"))
      d.select(col("doc_id"), col("n"))
        .join(a, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n").as("n_samples"),
          coalesce(col("c1"), lit(0L)).as("c1"),
          coalesce(col("c2"), lit(0L)).as("c2"),
          coalesce(col("c3"), lit(0L)).as("c3"),
          coalesce(col("c4"), lit(0L)).as("c4"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, text, length(text) // 2 AS n FROM documents),
           |sm AS (SELECT doc_id, i,
           |    CAST(CASE WHEN u < 32768 THEN u ELSE u - 65536 END AS BIGINT) AS s
           |  FROM (SELECT doc_id, i,
           |      ascii(substr(text, CAST(i*2+1 AS INT), 1))
           |        + 256 * ascii(substr(text, CAST(i*2+2 AS INT), 1)) AS u
           |    FROM d, unnest(range(0, n)) AS t(i))),
           |a AS (SELECT doc_id,
           |    CAST(sum(s * (1 - 2 * ((i >> 0) & 1))) AS BIGINT) AS c1,
           |    CAST(sum(s * (1 - 2 * ((i >> 1) & 1))) AS BIGINT) AS c2,
           |    CAST(sum(s * (1 - 2 * ((i >> 2) & 1))) AS BIGINT) AS c3,
           |    CAST(sum(s * (1 - 2 * ((i >> 3) & 1))) AS BIGINT) AS c4
           |  FROM sm GROUP BY doc_id)
           |SELECT d.doc_id, CAST(d.n AS INT) AS n_samples,
           |  COALESCE(a.c1, 0) AS c1, COALESCE(a.c2, 0) AS c2,
           |  COALESCE(a.c3, 0) AS c3, COALESCE(a.c4, 0) AS c4
           |FROM d LEFT JOIN a USING (doc_id) ORDER BY doc_id""".stripMargin))

  /** Byte-stream run-length profile per payload — the COMPRESSIBILITY
    * signal of the multimodal family: run structure separates flat/
    * synthetic content (screenshots, rendered frames, silence — few long
    * runs) from natural/noisy content (photos, speech — runs ≈ 1), the
    * cheap screen a curation pipeline applies before spending decode
    * budget, and 2·runs/bytes is the exact coded-size ratio of a
    * (byte, count) RLE codec. Same byte-level access path as
    * [[multimodalWaveform]] (one position explode, `ascii ∘ substr` —
    * codegen expressions, no UDF). Run boundaries need NO window: boundary
    * b(i) = byte(i) ≠ byte(i−1) reads both bytes directly, so n_runs is a
    * plain conditional count; only max_run orders anything — a lead window
    * over the BOUNDARY rows (≤ runs per doc), partitioned by doc_id,
    * closed by each doc's n+1 sentinel. Linear, doc-partitioned at any
    * corpus size.
    *
    * Determinism: everything is integer arithmetic except the final ratio,
    * one double division per doc, rounded at 6 dp.
    */
  private val multimodalRle = Q(
    "multimodal_rle",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"), length(col("text")).as("n"))
      def byteAt(p: Column): Column = ascii(col("text").substr(p, lit(1)))
      val pos = Tables.spread(d.filter(col("n") >= 1))
        .select(col("doc_id"), col("n"),
          explode(sequence(lit(1), col("n"))).as("i"), col("text"))
        .withColumn("brk",
          (col("i") === 1 || byteAt(col("i")) =!= byteAt(col("i") - 1))
            .cast("int"))
      val bounds = pos.filter(col("brk") === 1)
        .select(col("doc_id"), col("n"), col("i"))
      val w = Window.partitionBy("doc_id").orderBy("i")
      val runs = bounds
        .withColumn("rlen",
          coalesce(lead(col("i"), 1).over(w), col("n") + 1) - col("i"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_runs"), max(col("rlen")).as("max_run"))
      d.select(col("doc_id"), col("n").cast("long").as("n_bytes"))
        .join(runs, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_bytes"),
          coalesce(col("n_runs"), lit(0L)).as("n_runs"),
          coalesce(col("max_run"), lit(0L)).cast("long").as("max_run"),
          when(col("n_bytes") > 0,
            round(lit(2.0) * col("n_runs") / col("n_bytes"), 6))
            .otherwise(lit(0.0)).as("rle_ratio"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
           |pos AS (SELECT doc_id, n, i,
           |    CASE WHEN i = 1 OR ascii(substr(text, CAST(i AS INT), 1))
           |        <> ascii(substr(text, CAST(i - 1 AS INT), 1))
           |      THEN 1 ELSE 0 END AS brk
           |  FROM d, unnest(range(1, n + 1)) AS t(i)),
           |bounds AS (SELECT doc_id, n, i FROM pos WHERE brk = 1),
           |runs AS (SELECT doc_id,
           |    COALESCE(lead(i, 1) OVER (PARTITION BY doc_id ORDER BY i),
           |             n + 1) - i AS rlen
           |  FROM bounds),
           |agg AS (SELECT doc_id, count(*) AS n_runs, max(rlen) AS max_run
           |  FROM runs GROUP BY doc_id)
           |SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_bytes,
           |  CAST(COALESCE(agg.n_runs, 0) AS BIGINT) AS n_runs,
           |  CAST(COALESCE(agg.max_run, 0) AS BIGINT) AS max_run,
           |  CASE WHEN d.n > 0
           |    THEN round(2.0 * agg.n_runs / d.n, 6) ELSE 0.0 END AS rle_ratio
           |FROM d LEFT JOIN agg ON d.doc_id = agg.doc_id
           |ORDER BY d.doc_id""".stripMargin))

  /** Blank / near-uniform payload detection over the binary column — the
    * corrupt-media triage gate (an all-one-color frame, a zeroed buffer, a
    * stuck sensor all show as LOW value dispersion): per-payload CHARACTER-
    * CODEPOINT mean and population variance (`ascii(substr(...))` reads
    * codepoints, not raw bytes — identical on the ASCII payload fixture it
    * shares with [[multimodalWaveform]]; a true byte-level variant would
    * decode the binary column first), reporting the 15 most uniform
    * payloads. Variance stays exact until presentation: with n values,
    * Σb and Σb² are exact longs and var = (n·Σb² − (Σb)²)/n² is one
    * DECIMAL(38,0)
    * numerator over one IEEE divide — no float accumulation over samples.
    * Same linear byte-explode shape (and the same documented substr-
    * quadratic caveat + mapPartitions swap for multi-MB payloads) as
    * [[multimodalWaveform]].
    */
  private val multimodalBlankDetect = Q(
    "multimodal_blank_detect",
    (s, dir) => {
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val d = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("n", length(col("text")).cast("long"))
        .filter(col("n") >= 1)
      val by = Tables.spread(d)
        .select(col("doc_id"), col("n"), col("text"),
          explode(sequence(lit(1L), col("n"))).as("i"))
        .select(col("doc_id"), col("n"),
          ascii(col("text").substr(col("i").cast("int"), lit(1))).cast("long").as("b"))
      by.groupBy("doc_id", "n")
        .agg(sum(col("b")).as("s1"), sum(col("b") * col("b")).as("s2"))
        .select(col("doc_id"), col("n").as("n_bytes"),
          round(col("s1").cast("double") / col("n").cast("double"), 6)
            .as("mean_byte"),
          round((col("n").cast(dec) * col("s2") - col("s1").cast(dec) * col("s1"))
            .cast("double") /
            (col("n").cast(dec) * col("n")).cast("double"), 6).as("byte_var"))
        .orderBy(col("byte_var"), col("doc_id"))
        .limit(15)
    },
    Some("""WITH d AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
           |  FROM documents WHERE length(text) >= 1),
           |by AS (SELECT doc_id, n,
           |    CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT) AS b
           |  FROM d, unnest(range(1, n + 1)) AS t(i)),
           |agg AS (SELECT doc_id, n, CAST(sum(b) AS BIGINT) AS s1,
           |    CAST(sum(b * b) AS BIGINT) AS s2
           |  FROM by GROUP BY doc_id, n)
           |SELECT doc_id, n AS n_bytes,
           |  round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_byte,
           |  round(CAST(CAST(n AS DECIMAL(38,0)) * s2
           |      - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE) /
           |    CAST(CAST(n AS DECIMAL(38,0)) * n AS DOUBLE), 6) AS byte_var
           |FROM agg ORDER BY byte_var, doc_id LIMIT 15""".stripMargin))

  /** Per-source 16-bin value histogram over the payload stream — the
    * content-type fingerprint of the triage family: different encodings /
    * media classes occupy characteristically different value bands, so the
    * per-source histogram (and its share vector) is the cheap "did source X
    * start shipping a different format?" drift check, the multimodal
    * sibling of quality_psi_drift. Same codepoint-as-byte convention (and
    * ASCII-payload caveat) as [[multimodalWaveform]].
    *
    * Scale shape: one linear explode → two-phase (source, bin) count —
    * 16 × sources output rows regardless of corpus size; the share divides
    * by a broadcast per-source total. All counts exact.
    */
  private val multimodalHist16 = Q(
    "multimodal_hist16",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("text"))
        .withColumn("n", length(col("text")).cast("long"))
        .filter(col("n") >= 1)
      val by = Tables.spread(d)
        .select(col("source"),
          explode(sequence(lit(1L), col("n"))).as("i"),
          col("text"))
        .select(col("source"),
          (ascii(col("text").substr(col("i").cast("int"), lit(1))) / 8)
            .cast("int").as("bin"))
      val h = by.groupBy("source", "bin").agg(count(lit(1)).as("cnt"))
      val tot = h.groupBy("source").agg(sum(col("cnt")).as("t"))
      h.join(broadcast(tot), "source")
        .select(col("source"), col("bin"), col("cnt"),
          round(col("cnt").cast("double") / col("t").cast("double"), 6).as("share"))
        .orderBy("source", "bin")
    },
    Some("""WITH by AS (SELECT source,
           |    CAST(ascii(substr(text, CAST(i AS INT), 1)) // 8 AS INT) AS bin
           |  FROM (SELECT source, text, length(text) AS n FROM documents
           |        WHERE length(text) >= 1),
           |    unnest(range(1, n + 1)) AS t(i)),
           |h AS (SELECT source, bin, count(*) AS cnt FROM by GROUP BY 1, 2),
           |tot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS t FROM h GROUP BY 1)
           |SELECT h.source, bin, cnt,
           |  round(CAST(cnt AS DOUBLE) / CAST(t AS DOUBLE), 6) AS share
           |FROM h JOIN tot ON h.source = tot.source
           |ORDER BY h.source, bin""".stripMargin))

  /** Per-payload first-difference energy — mean |sᵢ − sᵢ₋₁| and peak jump
    * over the sample stream: the 1-D gradient-energy triage (a blank or
    * stuck payload has ~zero delta energy, white noise has high; a real
    * signal sits between), complementing [[multimodalBlankDetect]]'s
    * variance with ORDER-sensitive structure variance can't see (a sorted
    * payload and a shuffled one share a variance but not delta energy).
    *
    * Scale shape: the adjacent sample rides the SAME explode row (the
    * waveform smp/smp2 trick — position i projects both codepoints), so
    * no self-join and no window over samples; one linear explode → one
    * two-phase aggregate. Exact integer deltas; the mean is one IEEE
    * divide.
    */
  private val multimodalDeltaEnergy = Q(
    "multimodal_delta_energy",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("n", length(col("text")).cast("long"))
      val by = Tables.spread(d.filter(col("n") >= 2))
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(1L), col("n") - 1)).as("i"))
      def cp(p: Column): Column = ascii(col("text").substr(p.cast("int"), lit(1)))
      val dd = (cp(col("i") + 1) - cp(col("i"))).cast("long")
      val a = by.select(col("doc_id"), dd.as("d"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_deltas"), sum(abs(col("d"))).as("sad"),
          max(abs(col("d"))).as("peak_jump"))
      d.select(col("doc_id"), col("n").as("n_chars"))
        .join(a, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chars"),
          coalesce(col("peak_jump"), lit(0L)).as("peak_jump"),
          when(col("n_deltas").isNotNull,
            round(col("sad").cast("double") / col("n_deltas").cast("double"), 6))
            .otherwise(lit(0.0)).as("delta_energy"))
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
           |  FROM documents),
           |by AS (SELECT doc_id,
           |    CAST(ascii(substr(text, CAST(i + 1 AS INT), 1))
           |      - ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT) AS dd
           |  FROM d, unnest(range(1, n)) AS t(i) WHERE n >= 2),
           |a AS (SELECT doc_id, count(*) AS n_deltas,
           |    CAST(SUM(abs(dd)) AS BIGINT) AS sad,
           |    CAST(MAX(abs(dd)) AS BIGINT) AS peak_jump
           |  FROM by GROUP BY doc_id)
           |SELECT d.doc_id, d.n AS n_chars,
           |  COALESCE(peak_jump, 0) AS peak_jump,
           |  CASE WHEN n_deltas IS NOT NULL
           |    THEN round(CAST(sad AS DOUBLE) / n_deltas, 6) ELSE 0.0 END
           |    AS delta_energy
           |FROM d LEFT JOIN a ON d.doc_id = a.doc_id
           |ORDER BY d.doc_id""".stripMargin))

  /** Per-payload value entropy — the scalar summary of
    * [[multimodalHist16]]'s distribution (an encoded/compressed payload
    * approaches the value-alphabet ceiling, flat/synthetic payloads sit
    * near zero), ranked from BOTH ends: the 8 lowest (blank/stuck — the
    * [[multimodalBlankDetect]] complement seen through information rather
    * than variance) and the 8 highest (already-compressed content that
    * should skip recompression budgets). One-pass identity H = ln n −
    * Σc·ln c/n per payload over the (doc, value) counts; same codepoint
    * convention and caveat as the rest of the family.
    *
    * Scale: one linear explode → two-phase (doc, value) count → per-doc
    * aggregate → two bounded top-ks. ln on exact counts, dsumFine, 6 dp.
    */
  private val multimodalEntropy = Q(
    "multimodal_entropy",
    (s, dir) => {
      val d = Tables.load(s, dir, "documents").select(col("doc_id"), col("text"))
        .withColumn("n", length(col("text")).cast("long"))
        .filter(col("n") >= 1)
      val h = Tables.spread(d)
        .select(col("doc_id"), explode(sequence(lit(1L), col("n"))).as("i"),
          col("text"))
        .select(col("doc_id"),
          ascii(col("text").substr(col("i").cast("int"), lit(1))).as("b"))
        .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_chars"), count(lit(1)).as("alphabet"),
          graft.functions.Deterministic.dsumFine(
            col("c").cast("double") * log(col("c").cast("double"))).as("clc"))
        .select(col("doc_id"), col("n_chars"), col("alphabet"),
          round(log(col("n_chars").cast("double")) -
            col("clc") / col("n_chars").cast("double"), 6).as("entropy"))
      val lo = h.orderBy(col("entropy").asc, col("doc_id")).limit(8)
        .withColumn("end", lit("low"))
      val hi = h.orderBy(col("entropy").desc, col("doc_id")).limit(8)
        .withColumn("end", lit("high"))
      lo.unionByName(hi)
        .select(col("end"), col("doc_id"), col("n_chars"), col("alphabet"),
          col("entropy"))
        .orderBy(col("end"), col("entropy"), col("doc_id"))
    },
    Some("""WITH by AS (SELECT doc_id, ascii(substr(text, CAST(i AS INT), 1)) AS b
           |  FROM (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
           |        FROM documents WHERE length(text) >= 1),
           |    unnest(range(1, n + 1)) AS t(i)),
           |c AS (SELECT doc_id, b, count(*) AS c FROM by GROUP BY 1, 2),
           |h AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_chars,
           |    count(*) AS alphabet,
           |    round(ln(CAST(SUM(c) AS DOUBLE))
           |      - CAST(SUM(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) AS DECIMAL(38,20))) AS DOUBLE)
           |        / CAST(SUM(c) AS BIGINT), 6) AS entropy
           |  FROM c GROUP BY doc_id),
           |lo AS (SELECT 'low' AS "end", doc_id, n_chars, alphabet, entropy
           |       FROM h ORDER BY entropy ASC, doc_id LIMIT 8),
           |hi AS (SELECT 'high', doc_id, n_chars, alphabet, entropy
           |       FROM h ORDER BY entropy DESC, doc_id LIMIT 8)
           |SELECT * FROM (SELECT * FROM lo UNION ALL SELECT * FROM hi)
           |ORDER BY "end", entropy, doc_id""".stripMargin))

  /** Perceptual-hash NEAR-DUP banding over the media corpus — the image
    * twin of the MinHash text pipeline: the 64-bit aHash splits into four
    * 16-bit bands, candidates collide on any band (the pigeonhole bound:
    * every pair within Hamming ≤ 3 keeps at least one band intact, so the
    * ≤ 3 "duplicate" tier is EXACT, not probabilistic), and each
    * candidate's full Hamming distance is one xor + popcount. Reported as
    * the candidate Hamming histogram plus the duplicate count — the
    * dedup-rate + banding-selectivity readout a 100 TB image corpus runs
    * per crawl (the dedup_band_efficiency stance: the high-distance bins
    * are the wasted verify work that says the bands need widening).
    *
    * Scale shape: banding replicates each hash 4× (linear), the candidate
    * join is bucket-bounded (65 536 buckets per band — occupancy, and so
    * pair cost, held down by the hash width), verification is O(1) per
    * candidate, and the rollup is ≤ 5 cells. Band extraction uses
    * ARITHMETIC shift on both engines (`shiftright` / `>>`) — NOT
    * DuckDB's `//`, which truncates toward zero on negative
    * two's-complement hashes and extracts off-by-one band values.
    */
  /** The banding pipeline parameterized by band COUNT — the width knob the
    * LSH family already carries ([[graft.operators.Similarity.lshTopK]]'s
    * `bitsPerBand`): `nBands` bands of `64 / nBands` bits each. Fewer,
    * WIDER bands shrink per-band occupancy geometrically (2¹⁶ → 2³²
    * buckets per band at 4 → 2) and with it the Σ bucket² candidate cost —
    * the pigeonhole trade is the exact tier: b bands guarantee only
    * Hamming ≤ b−1 pairs keep a band intact, so the guaranteed-exact dup
    * tier narrows from ≤ 3 to ≤ 1 as the bands widen. Tier labels carry
    * the cut so the two geometries stay distinguishable readouts.
    */
  private def phashDedupFrame(s: SparkSession, dir: String, nBands: Int,
                              dense: Boolean = false): DataFrame = {
    // loud guard, not silent truncation: 64 % nBands != 0 would drop hash
    // bits from the band extraction (64/12 = 5 covers only 60 bits), and
    // at nBands > 9 the pigeonhole dup tier `hd <= nBands-1` would swallow
    // the near tier's <= 8 cut, making its label unreachable
    require(nBands >= 1 && 64 % nBands == 0 && nBands <= 9,
      s"phashDedup: nBands must divide 64 and be <= 9, got $nBands")
    val bits = 64 / nBands
    val mask = (1L << bits) - 1
    val tierNames = Seq(s"0_dup_le${nBands - 1}", s"1_near_${nBands}_8",
      "2_far_9_16", "3_bg_17_32", "4_anti_33_64")
    // spread: the per-payload hash runs at scan parallelism (one local
    // partition otherwise); track: the hash frame is read FOUR times (both
    // sides of the band self-join + both Hamming verification joins) and
    // would re-run the decode per consumer without the cache
    val d = Tables.spread(Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload")))
    val hashes = graft.Caches.track(
      imageHashes(s, d).toDF().select("doc_id", "ahash"))
    val bands = hashes.select(col("doc_id"), col("ahash"),
        explode(array((0 until nBands).map(lit): _*)).as("band"))
      .withColumn("bv", expr(s"shiftright(ahash, band * $bits) & $mask"))
    val cand = bands.select(col("doc_id").as("doc_a"), col("band"), col("bv"))
      .join(bands.select(col("doc_id").as("doc_b"), col("band").as("band_b"),
        col("bv").as("bv_b")),
        col("band") === col("band_b") && col("bv") === col("bv_b") &&
          col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val ham = cand
      .join(hashes.toDF("doc_a", "ha"), "doc_a")
      .join(hashes.toDF("doc_b", "hb"), "doc_b")
      .select(bit_count(col("ha").bitwiseXOR(col("hb"))).as("hd"))
    val tier = when(col("hd") <= nBands - 1, s"0_dup_le${nBands - 1}")
      .when(col("hd") <= 8, s"1_near_${nBands}_8")
      .when(col("hd") <= 16, "2_far_9_16")
      .when(col("hd") <= 32, "3_bg_17_32")
      .otherwise("4_anti_33_64")
    val b0 = ham.groupBy(tier.as("hd_band"))
      .agg(count(lit(1)).as("n_pairs"), min(col("hd")).as("min_hd"))
    // dense mode (the scaled geometry's readout): left-join the fixed tier
    // domain so the wide banding's EMPTY tiers — its whole point — appear
    // as explicit zero rows instead of vanishing (at tiny corpora the 2³²
    // buckets admit nothing at all and the sparse form would be 0 rows)
    val b = if (!dense) b0 else
      b0.sparkSession.range(1)
        .select(explode(array(tierNames.map(lit): _*)).as("hd_band"))
        .join(b0, Seq("hd_band"), "left")
        .select(col("hd_band"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"), col("min_hd"))
    val tot = b.agg(sum(col("n_pairs")).as("t"))
    b.crossJoin(broadcast(tot))
      .select(col("hd_band"), col("n_pairs"), col("min_hd"),
        round(col("n_pairs").cast("double") /
          when(col("t") > 0, col("t").cast("double")), 6).as("share"))
      .orderBy("hd_band")
  }

  private val multimodalPhashDedup = Q(
    "multimodal_phash_dedup",
    (s, dir) => phashDedupFrame(s, dir, 4),
    Some(phashDedupOracleFor(4)))

  /** The DuckDB replay of [[phashDedupFrame]] for any band count — hash
    * build, banding, pigeonhole candidates, exact Hamming rollup. DuckDB's
    * `>>` on BIGINT is the arithmetic shift matching Spark's `shiftright`.
    */
  private def phashDedupOracleFor(nBands: Int, dense: Boolean = false): String = {
    val bits = 64 / nBands
    val mask = (1L << bits) - 1
    val bbRef = if (!dense) "bb" else "bbd"
    val denseCte = if (!dense) "" else
      s""",dom(hd_band) AS (VALUES ('0_dup_le${nBands - 1}'),
         |  ('1_near_${nBands}_8'), ('2_far_9_16'), ('3_bg_17_32'),
         |  ('4_anti_33_64')),
         |bbd AS (SELECT dom.hd_band,
         |    CAST(COALESCE(bb.n_pairs, 0) AS BIGINT) AS n_pairs, bb.min_hd
         |  FROM dom LEFT JOIN bb ON bb.hd_band = dom.hd_band)""".stripMargin
    s"""WITH base AS (SELECT doc_id, text, length(text) AS clen FROM documents),
       |b AS (SELECT doc_id,
       |    list_transform(range(0, 64),
       |      i -> ascii(substr(text,
       |             CAST((i * clen) // 64 % clen AS INT) + 1, 1))) AS s
       |  FROM base WHERE clen > 0),
       |m AS (SELECT doc_id, s, CAST(list_sum(s) AS DOUBLE) / 64 AS mean FROM b),
       |h AS (SELECT doc_id,
       |    list_sum(list_transform(range(0, 64),
       |      i -> CASE WHEN s[CAST(i AS INT) + 1] > mean
       |                THEN CAST(power(2, CAST(i AS INT)) AS HUGEINT)
       |                ELSE CAST(0 AS HUGEINT) END)) AS uh
       |  FROM m),
       |hh AS (SELECT doc_id, CAST(CASE WHEN uh >= 9223372036854775808
       |           THEN uh - 18446744073709551616 ELSE uh END AS BIGINT) AS ahash
       |       FROM h
       |       UNION ALL SELECT doc_id, CAST(0 AS BIGINT) FROM base WHERE clen = 0),
       |bands AS (SELECT doc_id, CAST(t.b AS INT) AS band,
       |    (ahash >> CAST(t.b * $bits AS INT)) & $mask AS bv
       |  FROM hh, unnest(range(0, $nBands)) AS t(b)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
       |ham AS (SELECT bit_count(xor(x.ahash, y.ahash)) AS hd
       |  FROM cand JOIN hh x ON x.doc_id = cand.doc_a
       |            JOIN hh y ON y.doc_id = cand.doc_b),
       |bb AS (SELECT CASE WHEN hd <= ${nBands - 1} THEN '0_dup_le${nBands - 1}'
       |        WHEN hd <= 8 THEN '1_near_${nBands}_8'
       |        WHEN hd <= 16 THEN '2_far_9_16'
       |        WHEN hd <= 32 THEN '3_bg_17_32'
       |        ELSE '4_anti_33_64' END AS hd_band,
       |      count(*) AS n_pairs, CAST(min(hd) AS INT) AS min_hd
       |  FROM ham GROUP BY 1)$denseCte,
       |tt AS (SELECT CAST(SUM(n_pairs) AS BIGINT) AS t FROM $bbRef)
       |SELECT hd_band, n_pairs, min_hd,
       |  round(CAST(n_pairs AS DOUBLE) / NULLIF(t, 0), 6) AS share
       |FROM $bbRef CROSS JOIN tt ORDER BY hd_band""".stripMargin
  }

  /** The SCALED pHash banding geometry as its own green row — 2 bands ×
    * 32 bits (the [[phashDedupFrame]] width knob at its larger-corpus
    * setting), declared the way `sim_lsh_ann_scaled` promoted the LSH
    * production geometry: the fixed 4×16-bit default densifies with the
    * corpus (0.93 → 4.9 → 82.6 s across the sf0.1→10 decades — 2¹⁶ buckets
    * per band, occupancy and so Σ bucket² pair cost rising quadratically),
    * while 2³² buckets per band hold occupancy ≈ 1 at any realistic corpus
    * and admit only (near-)identical-half pairs. The trade, priced in the
    * tier labels: the pigeonhole-exact dup tier narrows from Hamming ≤ 3
    * to ≤ 1 — at 2 bands only single-bit-flip pairs are GUARANTEED
    * candidates; the 2–3-bit tier becomes best-effort (it still surfaces
    * when the flips concentrate in one half). A 100 TB image crawl runs
    * the wide geometry for the dedup cut and keeps the 4-band default for
    * periodic recall audits on samples.
    */
  private val multimodalPhashDedupScaled = Q(
    "multimodal_phash_dedup_scaled",
    (s, dir) => phashDedupFrame(s, dir, 2, dense = true),
    Some(phashDedupOracleFor(2, dense = true)))

  val queries: Seq[Q] = Seq(
    multimodalMeta, multimodalDecode, multimodalResize, multimodalFrames,
    multimodalPhash, multimodalWaveform, multimodalHadamard, multimodalRle,
    multimodalBlankDetect, multimodalHist16, multimodalDeltaEnergy,
    multimodalEntropy, multimodalPhashDedup, multimodalPhashDedupScaled)
}
