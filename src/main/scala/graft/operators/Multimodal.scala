package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed metadata,
  * processed in partition-sized batches.
  *
  * IMAGE decode is real: [[ImageIoDecoder]] / [[pixelFeatures]] parse
  * payloads with the JDK's own `javax.imageio` readers (BMP/PNG/JPEG, no
  * native deps) and compute true dimensions + pixel-space statistics,
  * round-trip-gated against a closed-form oracle (t107/t109). AUDIO decode
  * is real too: [[audioFeatures]] parses WAV/AIFF with the JDK's
  * `javax.sound.sampled` (t110). Video and compressed-audio codecs
  * genuinely are not in this container, so [[StubDecoder]] keeps a
  * deterministic byte-level stand-in there; everything Spark-side — the
  * schema, the binary column handling, the mapPartitions batch shape, the
  * partition parallelism — is real either way. Swap `Decoder` for a
  * JNI/FFmpeg-backed impl on a real cluster.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, modality: String, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, modality: String,
      payload_len: Long, checksum: Long, width: Int, height: Int)

  /** Decode seam: bytes → (width, height) or equivalent modal dimensions. */
  trait Decoder extends Serializable {
    def decode(modality: String, payload: Array[Byte]): (Int, Int)
  }

  /** Deterministic fake: "dimensions" derived from payload length/content. */
  object StubDecoder extends Decoder {
    override def decode(modality: String, payload: Array[Byte]): (Int, Int) = {
      val base = payload.length
      modality match {
        case "image" => (base % 1920, base % 1080)
        case "audio" => (base % 48000, 1)
        case _ => (base % 1920, base % 60) // video: (res, fps-ish)
      }
    }
  }

  /** REAL image decode on the pure JVM: `javax.imageio` ships BMP/PNG/JPEG
    * readers in the JDK itself, no native media libraries needed. Image
    * payloads that ImageIO can parse report their true pixel dimensions;
    * opaque payloads (and the audio/video modalities, whose codecs genuinely
    * are not in this container) keep the byte-level stub path.
    */
  object ImageIoDecoder extends Decoder {
    override def decode(modality: String, payload: Array[Byte]): (Int, Int) =
      if (modality == "image") {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        if (img == null) StubDecoder.decode(modality, payload)
        else (img.getWidth, img.getHeight)
      } else StubDecoder.decode(modality, payload)
  }

  /** Minimal 24-bpp uncompressed BMP writer (pure JVM, bottom-up row order
    * with 4-byte row padding per the format): `gray(x, y)` is written to all
    * three channels so any decoder-side luminance weighting recovers it
    * exactly. Used to synthesize REAL image payloads for the round-trip
    * decode gate (t107) and specs — encode here, decode via `javax.imageio`,
    * so the decode path under test is the JDK's, not ours.
    */
  def encodeBmp(width: Int, height: Int, gray: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val rowBytes = (width * 3 + 3) & ~3
    val dataSize = rowBytes * height
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54) // reserved, pixel-data offset
    buf.putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER
      .putShort(1).putShort(24) // planes, bpp
      .putInt(0).putInt(dataSize) // BI_RGB (uncompressed), image size
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, palette none
    var y = height - 1 // bottom-up: last scanline first
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val v = (gray(x, y) & 0xFF).toByte
        buf.put(v).put(v).put(v) // B, G, R
        x += 1
      }
      var p = width * 3
      while (p < rowBytes) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Minimal 16-bit PCM mono WAV writer (RIFF header + little-endian
    * samples) — the audio counterpart of [[encodeBmp]]: synthesize REAL
    * audio payloads so the round-trip gate (t110) decodes them through the
    * JDK's own `javax.sound.sampled` parser, not our writer.
    */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && samples.nonEmpty, "need a rate and samples")
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate
      .putShort(2).putShort(16) // block align, bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  final case class AudioFeatures(doc_id: Long, sample_rate: Int,
      n_samples: Long, energy_sq_sum: Long, zero_crossings: Long)

  /** REAL audio decode on the pure JVM — retires the audio stub the way
    * [[pixelFeatures]] retired the image one: `javax.sound.sampled` ships a
    * WAV/AIFF parser in the JDK itself (no codec libraries, no audio
    * device). Payloads decode to their true sample rate and PCM samples;
    * the features are exact integer statistics a curation pipeline filters
    * on — squared-sample energy (silence/clipping detection) and
    * zero-crossing count (noisiness proxy) — so a cross-engine oracle can
    * recompute them closed-form. Rows that are not 16-bit mono
    * little-endian PCM (or not audio at all) drop out.
    *
    * Scale shape: one narrow mapPartitions projection, no shuffle; the
    * payload never leaves its partition and only (id, rate, 3 longs) flow
    * on. Compressed formats (MP3/AAC) still need codec libraries — the
    * byte-level [[aHashBands]] path keeps covering those as opaque bytes.
    */
  def audioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          val fmt = in.getFormat
          if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
              fmt.isBigEndian ||
              fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
          else {
            val bb = java.nio.ByteBuffer.wrap(in.readAllBytes())
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            var energy = 0L
            var zc = 0L
            var n = 0L
            var prevNeg = false
            while (bb.remaining() >= 2) {
              val s = bb.getShort.toLong
              energy += s * s
              val neg = s < 0
              if (n > 0 && neg != prevNeg) zc += 1
              prevNeg = neg
              n += 1
            }
            Some(AudioFeatures(r.doc_id, fmt.getSampleRate.toInt, n, energy, zc))
          }
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => None
          case _: java.io.IOException => None
        }
      }
    }
  }

  /** Minimal AVI writer for UNCOMPRESSED video (BI_RGB 24-bpp DIB frames,
    * the `00db` stream — a real format any player opens): RIFF `AVI ` with
    * an `hdrl` LIST (avih + one video strl) and a `movi` LIST of per-frame
    * DIB chunks, each frame bottom-up BGR like [[encodeBmp]]'s pixel data.
    * The video counterpart of encodeBmp/encodeWav: synthesize REAL video
    * payloads for the round-trip gate (t111).
    */
  def encodeAvi(width: Int, height: Int, fps: Int,
      frames: Seq[(Int, Int) => Int]): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && frames.nonEmpty, "bad avi params")
    val rowBytes = (width * 3 + 3) & ~3
    val frameBytes = rowBytes * height
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(8 + body.length + (body.length & 1))
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes("US-ASCII")).putInt(body.length).put(body)
      if ((body.length & 1) == 1) b.put(0.toByte) // RIFF chunks are word-aligned
      b.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", kind.getBytes("US-ASCII") ++ body)
    def le(n: Int*): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(n.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      n.foreach(b.putInt)
      b.array()
    }
    // avih: usec/frame, max bytes/sec, pad, flags, totalFrames, initial,
    // streams, suggested buffer, width, height, reserved[4]
    val avih = chunk("avih", le(1000000 / fps, 0, 0, 0, frames.size, 0, 1,
      frameBytes, width, height, 0, 0, 0, 0))
    // strh: 'vids', 'DIB ', flags, prio+lang, initial, scale, rate, start,
    // length, bufsize, quality, sampleSize, rcFrame
    val strh = chunk("strh", "vids".getBytes("US-ASCII") ++
      "DIB ".getBytes("US-ASCII") ++
      le(0, 0, 0, 1, fps, 0, frames.size, frameBytes, 0, 0, 0, 0))
    // strf: BITMAPINFOHEADER (40 bytes, BI_RGB)
    val strf = chunk("strf", {
      val b = java.nio.ByteBuffer.allocate(40)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
        .putInt(0).putInt(frameBytes).putInt(2835).putInt(2835)
        .putInt(0).putInt(0)
      b.array()
    })
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", frames.flatMap { gray =>
      val b = java.nio.ByteBuffer.allocate(frameBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var y = height - 1 // bottom-up scanlines, like BMP
      while (y >= 0) {
        var x = 0
        while (x < width) {
          val v = (gray(x, y) & 0xFF).toByte
          b.put(v).put(v).put(v)
          x += 1
        }
        var p = width * 3
        while (p < rowBytes) { b.put(0.toByte); p += 1 }
        y -= 1
      }
      chunk("00db", b.array())
    }.toArray)
    chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)
  }

  final case class VideoFrame(doc_id: Long, frame_idx: Int, width: Int,
      height: Int, fps: Int, frame_sum: Long, ahash_bits: String)

  /** REAL video decode for the uncompressed-AVI format — retires the video
    * stub the way pixelFeatures/audioFeatures retired the image and audio
    * ones, within what a pure JVM can honestly do: a RIFF container walk
    * (chunk discipline per the AVI spec: word alignment, hdrl's
    * BITMAPINFOHEADER for dimensions, avih for the frame rate) plus exact
    * per-frame luminance sums over the bottom-up BGR DIB scanlines. One
    * output row per decoded frame (UDTF-shaped row expansion). Payloads
    * that are not RIFF/AVI, not BI_RGB 24-bpp, or truncated mid-frame drop
    * out. Compressed codecs (H.264 & co) still need native libraries — the
    * byte-level path keeps covering those as opaque bytes.
    *
    * Scale shape: one narrow mapPartitions flatMap, no shuffle; only
    * (id, frame_idx, dims, one long) per frame flows on.
    */
  def videoFrames(media: Dataset[MediaRow]): Dataset[VideoFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val bb = java.nio.ByteBuffer.wrap(r.payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def str(n: Int): String = {
          val a = new Array[Byte](n); bb.get(a); new String(a, "US-ASCII")
        }
        try {
          if (bb.remaining() < 12 || str(4) != "RIFF") Iterator.empty
          else {
            bb.getInt // riff size
            if (str(4) != "AVI ") Iterator.empty
            else {
              var width = 0
              var height = 0
              var fps = 0
              var bitCount = 0
              var compression = -1
              val frames = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
              // walk chunks; descend into LISTs (their body is kind + chunks)
              def walk(end: Int): Unit =
                while (bb.position() + 8 <= end) {
                  val id = str(4)
                  val size = bb.getInt
                  val next = bb.position() + size + (size & 1)
                  if (next > end) throw new java.io.EOFException("truncated chunk")
                  id match {
                    case "LIST" => str(4); walk(next)
                    case "avih" =>
                      val usec = bb.getInt
                      if (usec > 0) fps = 1000000 / usec
                    case "strf" if size >= 40 =>
                      bb.getInt // biSize
                      width = bb.getInt
                      height = bb.getInt
                      bb.getShort // planes
                      bitCount = bb.getShort.toInt
                      compression = bb.getInt
                    case "00db" if width > 0 && height > 0 &&
                        bitCount == 24 && compression == 0 =>
                      val rowBytes = (width * 3 + 3) & ~3
                      if (size < rowBytes * height)
                        throw new java.io.EOFException("truncated frame")
                      // DIB scanlines are BOTTOM-UP: scanline s is image
                      // row height-1-s. The sum is orientation-free, but
                      // the average-hash cells are not — lum is built in
                      // image (top-down) orientation
                      val lum = Array.ofDim[Int](height, width)
                      var sum = 0L
                      var s = 0
                      while (s < height) {
                        val row = bb.position() + s * rowBytes
                        val imgY = height - 1 - s
                        var x = 0
                        while (x < width) {
                          val p = row + x * 3
                          val v = ((bb.get(p) & 0xFF) + (bb.get(p + 1) & 0xFF) +
                            (bb.get(p + 2) & 0xFF)) / 3
                          lum(imgY)(x) = v
                          sum += v
                          x += 1
                        }
                        s += 1
                      }
                      frames += ((sum, ahashBitsOf(lum, sum, width, height)))
                    case _ => ()
                  }
                  bb.position(next)
                }
              walk(bb.limit())
              frames.iterator.zipWithIndex.map { case ((s, bits), i) =>
                VideoFrame(r.doc_id, i, width, height, fps, s, bits)
              }
            }
          }
        } catch {
          case _: java.io.EOFException => Iterator.empty
          case _: java.nio.BufferUnderflowException => Iterator.empty
        }
      }
    }
  }

  /** Banded near-dup over DECODED VIDEO FRAMES — the dedup step a
    * captioning/training pipeline runs before spending model budget on
    * near-identical frames (static scenes within one video, re-uploads
    * across videos): [[videoFrames]] decodes and hashes each frame, then
    * the shared pigeonhole band join pairs frames whose 64-bit pixel
    * hashes lie within `maxHamming`, WITHIN and ACROSS videos. The pair
    * key is the (video, frame) struct, ordered lexicographically. Output:
    * (id_a, frame_a, id_b, frame_b, hamming).
    */
  def frameNearDupPairs(media: Dataset[MediaRow], maxHamming: Int = 3): DataFrame = {
    val fp = videoFrames(media).toDF().select(
      struct(col("doc_id"), col("frame_idx")).as("__id") +:
        (0 to 3).map(i =>
          conv(substring(col("ahash_bits"), i * 16 + 1, 16), 2, 10)
            .cast("int").as(s"fp$i")): _*)
    bandedHammingPairs(fp, maxHamming)
      .select(col("id_a.doc_id").as("id_a"), col("id_a.frame_idx").as("frame_a"),
        col("id_b.doc_id").as("id_b"), col("id_b.frame_idx").as("frame_b"),
        col("hamming"))
  }

  final case class PixelFeatures(doc_id: Long, width: Int, height: Int,
      pix_sum: Long, ahash_bits: String)

  /** PIXEL-space featurization — the path that retires the stub for images:
    * a real `javax.imageio` decode per row (JDK BMP/PNG/JPEG readers, no
    * native deps), then exact integer luminance statistics and the classic
    * 8×8 average-hash computed over DECODED PIXELS rather than payload
    * bytes. Rows whose payload ImageIO cannot parse are dropped (they belong
    * on the byte-level [[aHashBands]] path).
    *
    *  - luminance = (r+g+b)/3 integer — exact for grayscale pixels, so a
    *    cross-engine oracle can reproduce `pix_sum` closed-form;
    *  - `ahash_bits(8r+c)` = '1' iff cell (r,c) of the 8×8 grid averages
    *    strictly brighter than the whole image, decided by the exact
    *    cross-multiplied integer compare `cellSum * nPixels > pixSum *
    *    cellN` (no IEEE division, no ties-by-rounding);
    *  - emitted as a 64-char '0'/'1' string: sortable, cross-engine-stable,
    *    and free of the Long sign pitfalls of a packed 64-bit value.
    *
    * Scale shape: one narrow mapPartitions projection, no shuffle; the
    * payload never leaves its partition and only (id, dims, 64 bits) flow on.
    */
  def pixelFeatures(media: Dataset[MediaRow]): Dataset[PixelFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          val lum = Array.ofDim[Int](h, w)
          var total = 0L
          // fast path for the interleaved byte layouts the JDK readers
          // produce for BMP/JPEG (BGR) — one raster grab instead of a
          // per-pixel getRGB (which pays a color-model conversion call per
          // pixel: 3-4M calls on a single-megapixel image)
          val fastBands = img.getType match {
            case java.awt.image.BufferedImage.TYPE_3BYTE_BGR => 3
            case java.awt.image.BufferedImage.TYPE_4BYTE_ABGR => 4
            case _ => 0
          }
          // guard against exotic strides (subimages): the buffer must be
          // exactly the packed scanline layout or we fall back to getRGB
          if (fastBands > 0 &&
              img.getRaster.getDataBuffer.getSize == w * h * fastBands) {
            val data = img.getRaster.getDataBuffer
              .asInstanceOf[java.awt.image.DataBufferByte].getData
            val off = fastBands - 3 // alpha leads in ABGR
            var y = 0
            while (y < h) {
              var x = 0
              val row = y * w * fastBands
              while (x < w) {
                val p = row + x * fastBands + off
                val v = ((data(p) & 0xFF) + (data(p + 1) & 0xFF) + (data(p + 2) & 0xFF)) / 3
                lum(y)(x) = v
                total += v
                x += 1
              }
              y += 1
            }
          } else {
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val v = (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3
                lum(y)(x) = v
                total += v
                x += 1
              }
              y += 1
            }
          }
          Some(PixelFeatures(r.doc_id, w, h, total, ahashBitsOf(lum, total, w, h)))
        }
      }
    }
  }

  /** The 8×8 average-hash bit string over a TOP-DOWN luminance grid —
    * shared by the image ([[pixelFeatures]]) and video ([[videoFrames]])
    * paths. Integer cell boundaries are exact for any dims; when w,h are
    * multiples of 8 every cell is identical and the cross-multiplied
    * compare reduces to `cellSum * 64 > pixSum` — the oracles' form.
    */
  private def ahashBitsOf(lum: Array[Array[Int]], total: Long,
      w: Int, h: Int): String = {
    val n = w.toLong * h
    val bits = new java.lang.StringBuilder(64)
    var b = 0
    while (b < 64) {
      val r0 = (b / 8) * h / 8
      val r1 = (b / 8 + 1) * h / 8
      val c0 = (b % 8) * w / 8
      val c1 = (b % 8 + 1) * w / 8
      var cs = 0L
      var cn = 0L
      var yy = r0
      while (yy < r1) {
        var xx = c0
        while (xx < c1) { cs += lum(yy)(xx); cn += 1; xx += 1 }
        yy += 1
      }
      bits.append(if (cs * n > total * cn) '1' else '0')
      b += 1
    }
    bits.toString
  }

  /** Documents table → media rows: text bytes stand in for the payload; the
    * modality cycles deterministically. Real pipelines read
    * `spark.read.format("binaryFile")` and carry the same shape.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("payload")).as[MediaRow]
  }

  final case class ResizedMedia(doc_id: Long, modality: String, width: Int,
      height: Int, payload: Array[Byte])
  final case class FrameSample(doc_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Resize: the per-row transform a real pipeline runs after decode. The
    * stub "resampler" deterministically strides the payload bytes to the
    * target size; the Spark shape (mapPartitions batch, binary in/out,
    * per-task decoder init) is what a JNI/libvips-backed impl would reuse.
    */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val target = math.max(1, math.min(r.payload.length, targetW * targetH / 256))
        val stride = math.max(1, r.payload.length / target)
        val out = Array.tabulate(target)(i => r.payload(math.min(i * stride, r.payload.length - 1)))
        ResizedMedia(r.doc_id, r.modality, targetW, targetH, out)
      }
    }
  }

  /** Frame sampling: one row per sampled frame (UDTF-shaped row expansion —
    * `flatMap` over the partition iterator). The stub cuts the payload into
    * fixed-size "frames" and keeps every `everyN`th.
    */
  def frameSample(media: Dataset[MediaRow], frameBytes: Int = 64, everyN: Int = 2)
      : Dataset[FrameSample] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.modality == "video").flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex.collect {
        case (frame, i) if i % everyN == 0 => FrameSample(r.doc_id, i, frame)
      }
    }
  }

  /** 64-bit blockwise perceptual fingerprint (aHash over payload byte
    * blocks) of a binary column, as four big-endian 16-bit sub-bands —
    * decode-free, so it is REAL compute on any modality with no native
    * media libraries: near-identical payloads (small re-encodes, metadata
    * retags) land within a small Hamming distance. Delegates to the
    * codegen'd Catalyst expression [[graft.expressions.BlockAHash]].
    */
  def aHashBands(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.expressions.GraftFunctions.aHashBands(payload)

  /** Banded perceptual near-dup over binary payloads: candidate pairs agree
    * on at least one 16-bit fingerprint sub-band (equi-join — never
    * all-pairs), then the full 64-bit Hamming distance is verified exactly.
    * LOSSLESS for `maxHamming < 4` by pigeonhole: ≤3 differing bits across
    * 4 disjoint 16-bit bands leave at least one band identical, so every
    * true near-dup pair shares a band bucket. Output: (id_a, id_b, hamming)
    * with id_a < id_b, one row per pair.
    *
    * Scale shape: fingerprints are 4 ints per row (the payload itself never
    * rides the candidate shuffle); band buckets are 16-bit so random
    * payloads spread across 65k buckets per band; the verify step is a
    * codegen'd bit_count(xor) on the joined int columns.
    */
  def nearDupPairs(media: DataFrame, idCol: String, payloadCol: String,
      maxHamming: Int = 3): DataFrame = {
    val fp = media.select(
      col(idCol).as("__id"), aHashBands(col(payloadCol)).as("__fp"))
      .select(col("__id"),
        col("__fp")(0).as("fp0"), col("__fp")(1).as("fp1"),
        col("__fp")(2).as("fp2"), col("__fp")(3).as("fp3"))
    bandedHammingPairs(fp, maxHamming)
  }

  /** Pixel-space banded near-dup — the cross-FORMAT duplicate detector the
    * byte-level path cannot be: a BMP and a PNG of the same pixels share no
    * payload bytes (so [[nearDupPairs]] sees nothing) but have the
    * identical pixel average-hash, Hamming 0. Decodes each payload with
    * [[pixelFeatures]] (JDK readers; undecodable rows drop out), splits the
    * 64-bit pixel hash into the same 4 disjoint 16-bit bands, and runs the
    * shared pigeonhole-lossless band join. Output: (id_a, id_b, hamming).
    */
  def pixelNearDupPairs(media: Dataset[MediaRow], maxHamming: Int = 3): DataFrame = {
    val fp = pixelFeatures(media).toDF().select(
      col("doc_id").as("__id") +:
        (0 to 3).map(i => conv(substring(col("ahash_bits"), i * 16 + 1, 16), 2, 10)
          .cast("int").as(s"fp$i")): _*)
    bandedHammingPairs(fp, maxHamming)
  }

  /** Shared pigeonhole band join over (__id, fp0..fp3): candidate pairs
    * agree on at least one 16-bit band (equi-join — never all-pairs), then
    * the full 64-bit Hamming distance is verified exactly. LOSSLESS for
    * `maxHamming < 4`: ≤3 differing bits across 4 disjoint 16-bit bands
    * leave at least one band identical, so every true near-dup pair shares
    * a band bucket. Only 4 ints per row ride the candidate shuffle.
    */
  private def bandedHammingPairs(fp: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 4,
      s"banding over 4 sub-bands is lossless only for maxHamming < 4, got $maxHamming")
    val bands = fp
      .select(col("__id"), col("fp0"), col("fp1"), col("fp2"), col("fp3"),
        posexplode(array(col("fp0"), col("fp1"), col("fp2"), col("fp3")))
          .as(Seq("__band_idx", "__band_val")))
    val a = bands.select(col("__id").as("id_a"), col("fp0").as("a0"),
      col("fp1").as("a1"), col("fp2").as("a2"), col("fp3").as("a3"),
      col("__band_idx"), col("__band_val"))
    val b = bands.select(col("__id").as("id_b"), col("fp0").as("b0"),
      col("fp1").as("b1"), col("fp2").as("b2"), col("fp3").as("b3"),
      col("__band_idx"), col("__band_val"))
    val hamming =
      bit_count(expr("a0 ^ b0")) + bit_count(expr("a1 ^ b1")) +
      bit_count(expr("a2 ^ b2")) + bit_count(expr("a3 ^ b3"))
    a.join(b, Seq("__band_idx", "__band_val"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming.cast("int").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** The batch "decode" operator: per-partition decoder instantiation (the
    * expensive native-lib init happens once per task, not per row), then a
    * streaming pass over the rows.
    */
  def featurize(media: Dataset[MediaRow], decoder: Decoder = StubDecoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h) = decoder.decode(r.modality, r.payload)
        var sum = 0L
        var i = 0
        while (i < math.min(r.payload.length, 64)) { sum += (r.payload(i) & 0xFF); i += 1 }
        MediaFeatures(r.doc_id, r.modality, r.payload.length.toLong, sum, w, h)
      }
    }
  }
}
