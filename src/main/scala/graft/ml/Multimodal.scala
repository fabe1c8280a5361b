package graft.ml

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, batch decode / feature-extract via mapPartitions.
  *
  * The container-metadata decode is REAL for all five formats — their
  * headers are plain binary layouts needing no codec library: WAV (RIFF
  * fmt chunk: sample rate, channels, bits), BMP (BITMAPINFOHEADER: pixel
  * dimensions), MP4 (ISO-BMFF box walk to moov/mvhd: timescale,
  * duration), PNG (chunk walk: IHDR dimensions, CRC32-verified — a
  * flipped header bit is rejected, not misread), and JPEG (marker-segment
  * walk to the SOF0 frame header: dimensions).
  *
  * SAMPLE decode is REAL for every format except MP4 codec frames: PCM
  * (wav), the BMP pixel array (offset/padding/BGR/bottom-up), PNG
  * scanlines via the JDK's own zlib Inflater + per-row unfiltering, and
  * baseline-JPEG grayscale via a pure-JVM entropy decoder (canonical
  * Huffman tables rebuilt from the file's DHT segments, dequant, full 2D
  * IDCT) — see [[decodeSamples]] and [[decodeJpegGray]]. MP4 codec frames
  * remain the one honest, clearly marked STUB boundary (no codec
  * libraries in this container); a javacv/ffmpeg decoder drops into the
  * same mapPartitions slot. The synthesized payloads carry genuine
  * encoded bytes, so the pipeline exercises synthesize -> encode ->
  * decode -> statistics end-to-end and the DuckDB oracle recomputes the
  * expectations from the same generation formulas without seeing the
  * bytes.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Int,
      width: Option[Int], height: Option[Int],
      sample_rate: Option[Int], channels: Option[Int],
      duration_s: Option[Int],
      entropy: Double, head_hex: String, feature: Array[Float])

  // deterministic per-doc media parameters (shared with the SQL oracle)
  private def widthFor(id: Long): Int = (16 + id % 64).toInt
  private def heightFor(id: Long): Int = (9 + id % 32).toInt
  private def rateFor(id: Long): Int = (8000 + (id % 8) * 1000).toInt
  private def channelsFor(id: Long): Int = (1 + id % 2).toInt
  private def timescaleFor(id: Long): Int = (1000 * (1 + id % 4)).toInt
  private def durationSFor(id: Long): Int = (5 + id % 60).toInt

  /** 44-byte canonical RIFF/WAVE header (PCM fmt chunk + data chunk). */
  def wavHeader(sampleRate: Int, channels: Int, bitsPerSample: Int,
      dataLen: Int): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val b = ByteBuffer.allocate(44).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign) // byte rate
      .putShort(blockAlign.toShort)
      .putShort(bitsPerSample.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    b.array()
  }

  /** 54-byte BMP header (BITMAPFILEHEADER + BITMAPINFOHEADER, 24 bpp). */
  def bmpHeader(width: Int, height: Int, dataLen: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(54).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putShort(0).putShort(0).putInt(54) // reserved + pixel-data offset
      .putInt(40) // BITMAPINFOHEADER size
      .putInt(width).putInt(height)
      .putShort(1) // planes
      .putShort(24) // bpp
      .putInt(0) // BI_RGB
      .putInt(dataLen)
      .putInt(2835).putInt(2835) // 72 dpi
      .putInt(0).putInt(0)
    b.array()
  }

  /** Parse a WAV header: Some((sampleRate, channels)) iff the RIFF/WAVE
    * magic and fmt chunk are where the canonical layout puts them.
    */
  def parseWav(p: Array[Byte]): Option[(Int, Int)] = {
    if (p.length < 44) return None
    val b = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int, s: String) =
      s.getBytes("US-ASCII").zipWithIndex.forall { case (c, i) => p(off + i) == c }
    if (!tag(0, "RIFF") || !tag(8, "WAVE") || !tag(12, "fmt ")) None
    else Some((b.getInt(24), b.getShort(22).toInt))
  }

  /** Parse a BMP header: Some((width, height)) iff the BM magic and a
    * BITMAPINFOHEADER are present.
    */
  def parseBmp(p: Array[Byte]): Option[(Int, Int)] = {
    if (p.length < 54) return None
    val b = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    if (p(0) != 'B'.toByte || p(1) != 'M'.toByte || b.getInt(14) != 40) None
    else Some((b.getInt(18), b.getInt(22)))
  }

  private def writeFtyp(b: ByteBuffer): Unit = {
    b.putInt(20).put("ftyp".getBytes("US-ASCII"))
      .put("isom".getBytes("US-ASCII")).putInt(0)
      .put("mp41".getBytes("US-ASCII")): Unit
  }

  /** 108-byte `mvhd` v0 box (timescale + duration + boilerplate). */
  private def writeMvhd(b: ByteBuffer, timescale: Int, durationUnits: Int): Unit = {
    b.putInt(108).put("mvhd".getBytes("US-ASCII"))
      .putInt(0) // version 0 + flags
      .putInt(0).putInt(0) // creation, modification
      .putInt(timescale).putInt(durationUnits)
      .putInt(0x00010000) // rate 1.0
      .putShort(0x0100.toShort).putShort(0) // volume + reserved
      .putLong(0) // reserved
      .putInt(0x00010000).putInt(0).putInt(0) // unity matrix rows
      .putInt(0).putInt(0x00010000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
      .putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0) // predefined
      .putInt(2): Unit // next track id
  }

  /** 144-byte minimal ISO-BMFF (mp4) container prefix: `ftyp` (isom) +
    * `moov`/`mvhd` v0 carrying timescale + duration, then an `mdat` box
    * header wrapping the payload. All fields big-endian per the spec.
    */
  def mp4Header(timescale: Int, durationUnits: Int, dataLen: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(144).order(ByteOrder.BIG_ENDIAN)
    writeFtyp(b)
    b.putInt(116).put("moov".getBytes("US-ASCII"))
    writeMvhd(b, timescale, durationUnits)
    b.putInt(8 + dataLen).put("mdat".getBytes("US-ASCII"))
    b.array()
  }

  /** How often the synthesized video track places a sync sample. */
  val KEYFRAME_EVERY = 4

  /** Full minimal mp4 with ONE track and a REAL sample table: `ftyp` +
    * `moov`{`mvhd`, `trak`{`mdia`{`mdhd`, `minf`{`stbl`{`stts` one-entry
    * (every sample lasts one `timescale` tick run — here delta ==
    * timescale, i.e. 1 s/sample), `stss` sync-sample list (every
    * [[KEYFRAME_EVERY]]th), `stsz` per-sample sizes, `stsc` one
    * sample per chunk, `stco` absolute chunk offsets}}}}} + `mdat` whose
    * length is exactly the sample-size sum and whose offsets in `stco` are
    * the true byte positions. Everything a frame sampler needs to seek —
    * the shape real preprocessing reads via the same four boxes.
    */
  def mp4TrackBytes(timescale: Int, sizes: Array[Int]): Array[Byte] = {
    val n = sizes.length
    val keys = (1 to n by KEYFRAME_EVERY).toArray // 1-based sample numbers
    val dataLen = sizes.sum
    val sttsL = 24; val stssL = 16 + 4 * keys.length; val stszL = 20 + 4 * n
    val stscL = 28; val stcoL = 16 + 4 * n
    val stblL = 8 + sttsL + stssL + stszL + stscL + stcoL
    val minfL = 8 + stblL; val mdhdL = 32; val mdiaL = 8 + mdhdL + minfL
    val trakL = 8 + mdiaL; val moovL = 8 + 108 + trakL
    val headerLen = 20 + moovL + 8
    val b = ByteBuffer.allocate(headerLen + dataLen).order(ByteOrder.BIG_ENDIAN)
    writeFtyp(b)
    b.putInt(moovL).put("moov".getBytes("US-ASCII"))
    writeMvhd(b, timescale, n * timescale)
    b.putInt(trakL).put("trak".getBytes("US-ASCII"))
    b.putInt(mdiaL).put("mdia".getBytes("US-ASCII"))
    b.putInt(mdhdL).put("mdhd".getBytes("US-ASCII"))
      .putInt(0).putInt(0).putInt(0) // vf, creation, modification
      .putInt(timescale).putInt(n * timescale)
      .putShort(0x55c4.toShort).putShort(0) // language "und" + quality
    b.putInt(minfL).put("minf".getBytes("US-ASCII"))
    b.putInt(stblL).put("stbl".getBytes("US-ASCII"))
    b.putInt(sttsL).put("stts".getBytes("US-ASCII"))
      .putInt(0).putInt(1).putInt(n).putInt(timescale)
    b.putInt(stssL).put("stss".getBytes("US-ASCII")).putInt(0).putInt(keys.length)
    keys.foreach(k => b.putInt(k): Unit)
    b.putInt(stszL).put("stsz".getBytes("US-ASCII")).putInt(0).putInt(0).putInt(n)
    sizes.foreach(s => b.putInt(s): Unit)
    b.putInt(stscL).put("stsc".getBytes("US-ASCII"))
      .putInt(0).putInt(1).putInt(1).putInt(1).putInt(1) // one sample per chunk
    b.putInt(stcoL).put("stco".getBytes("US-ASCII")).putInt(0).putInt(n)
    var off = headerLen
    sizes.foreach { s => b.putInt(off): Unit; off += s }
    b.putInt(8 + dataLen).put("mdat".getBytes("US-ASCII"))
    var i = 0
    while (i < dataLen) { b.put((i % 251).toByte): Unit; i += 1 }
    b.array()
  }

  /** One parsed track sample: 1-based number, presentation second, byte
    * size, absolute byte offset, sync-sample flag.
    */
  case class Mp4Sample(sample_no: Int, pts_s: Long, n_bytes: Int,
      offset: Long, key: Boolean)

  /** Walk a [[mp4TrackBytes]]-shaped container down
    * moov/trak/mdia/minf/stbl and rebuild the sample map from the four
    * sample-table boxes (stts run-length deltas -> pts via the mdhd
    * timescale, stss sync set, stsz sizes, stco + one-sample-per-chunk stsc
    * -> offsets). Bounds-checked at every hop; anything malformed yields
    * Nil, never a misread. This is the real seek map a frame sampler uses.
    */
  def parseMp4Samples(p: Array[Byte]): Seq[Mp4Sample] = {
    val b = ByteBuffer.wrap(p).order(ByteOrder.BIG_ENDIAN)
    def boxType(off: Int): String = new String(p, off + 4, 4, "US-ASCII")
    // find the single child box named `t` inside [from, end)
    def child(from: Int, end: Int, t: String): Option[(Int, Int)] = {
      var off = from
      while (off + 8 <= end) {
        val size = b.getInt(off)
        if (size < 8 || off + size > end) return None
        if (boxType(off) == t) return Some((off + 8, off + size))
        off += size
      }
      None
    }
    if (p.length < 16 || boxType(0) != "ftyp") return Nil
    val parsed = for {
      (moovS, moovE) <- child(0, p.length, "moov")
      (trakS, trakE) <- child(moovS, moovE, "trak")
      (mdiaS, mdiaE) <- child(trakS, trakE, "mdia")
      (mdhdS, mdhdE) <- child(mdiaS, mdiaE, "mdhd")
      if mdhdE - mdhdS >= 24 && b.get(mdhdS) == 0
      timescale = b.getInt(mdhdS + 12)
      if timescale > 0
      (minfS, minfE) <- child(mdiaS, mdiaE, "minf")
      (stblS, stblE) <- child(minfS, minfE, "stbl")
      (sttsS, sttsE) <- child(stblS, stblE, "stts")
      (stssS, stssE) <- child(stblS, stblE, "stss")
      (stszS, stszE) <- child(stblS, stblE, "stsz")
      (stscS, stscE) <- child(stblS, stblE, "stsc")
      (stcoS, stcoE) <- child(stblS, stblE, "stco")
    } yield {
      // stsc must describe the one-sample-per-chunk layout we synthesize
      val stscOk = stscE - stscS == 20 && b.getInt(stscS + 4) == 1 &&
        b.getInt(stscS + 8) == 1 && b.getInt(stscS + 12) == 1
      val nStts = if (sttsE - sttsS >= 8) b.getInt(sttsS + 4) else -1
      val nSz = if (stszE - stszS >= 12) b.getInt(stszS + 8) else -1
      val nCo = if (stcoE - stcoS >= 8) b.getInt(stcoS + 4) else -1
      val nKeys = if (stssE - stssS >= 8) b.getInt(stssS + 4) else -1
      val lensOk = stscOk && nSz >= 0 && nSz == nCo && nKeys >= 0 &&
        nStts >= 1 && sttsE - sttsS >= 8 + 8 * nStts &&
        stszE - stszS >= 12 + 4 * nSz && stcoE - stcoS >= 8 + 4 * nCo &&
        stssE - stssS >= 8 + 4 * nKeys && b.getInt(stszS + 4) == 0
      if (!lensOk) Nil
      else {
        val keys = (0 until nKeys).map(i => b.getInt(stssS + 8 + 4 * i)).toSet
        // expand stts run-length (count, delta) entries into per-sample pts
        val deltas = Iterator.range(0, nStts).flatMap { e =>
          val cnt = b.getInt(sttsS + 8 + 8 * e)
          val delta = b.getInt(sttsS + 8 + 8 * e + 4)
          Iterator.fill(cnt)(delta.toLong)
        }.take(nSz).toArray
        if (deltas.length != nSz) Nil
        else {
          var elapsed = 0L
          (0 until nSz).map { i =>
            val pts = elapsed / timescale
            elapsed += deltas(i)
            Mp4Sample(i + 1, pts, b.getInt(stszS + 12 + 4 * i),
              b.getInt(stcoS + 8 + 4 * i).toLong, keys.contains(i + 1))
          }
        }
      }
    }
    parsed.getOrElse(Nil)
  }

  // per-doc video sample-size formula (shared with the SQL oracle)
  private def sampleSizeFor(id: Long, i0: Int): Int =
    (200 + (id * 31 + i0 * 7) % 100).toInt

  /** Video table: every document becomes an mp4 with a real sample table
    * ([[mp4TrackBytes]]): `durationSFor(id)` one-second samples, sizes from
    * the shared deterministic formula, a keyframe every
    * [[KEYFRAME_EVERY]]th sample.
    */
  def videoTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val n = durationSFor(id)
      MediaRow(id, "video/mp4",
        mp4TrackBytes(timescaleFor(id), Array.tabulate(n)(sampleSizeFor(id, _))))
    }
  }

  /** Frame sampling over the video table: parse each container's sample
    * map OUT OF THE BYTES and keep the sync samples (keyframes) — the
    * standard vision-preprocessing reduction (decode only seekable frames,
    * never the full stream). Map-only flatMap per row: the 10^12-row shape
    * is a scan whose output is ~1/[[KEYFRAME_EVERY]] of the sample count.
    */
  def videoFrameSample(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    videoTable(spark, docs).flatMap { r =>
      parseMp4Samples(r.payload).iterator.filter(_.key).map(s =>
        (r.doc_id, s.sample_no.toLong, s.pts_s, s.n_bytes.toLong, s.offset))
    }.toDF("doc_id", "sample_no", "pts_s", "n_bytes", "offset")
  }

  /** DuckDB twin of [[videoFrameSample]]: recomputes the sample map from
    * the shared synthesis formulas — sample count 5 + id % 60, sizes
    * 200 + (id*31 + i0*7) % 100, one-second pts, keyframes every 4th, and
    * byte offsets = the closed-form header length (312 + 4*ceil(n/4) + 8n,
    * the sum of the fixed box sizes plus the per-sample stsz/stco entries)
    * plus the running size prefix sum.
    */
  def videoFrameSampleSql(docsRel: String): String =
    s"""WITH base AS (SELECT doc_id, CAST(5 + doc_id % 60 AS BIGINT) AS n FROM $docsRel),
       |samples AS (SELECT doc_id, n, (n + 3) // 4 AS k, unnest(range(1, n + 1)) AS i FROM base),
       |sized AS (SELECT doc_id, n, k, i,
       |    200 + (doc_id * 31 + (i - 1) * 7) % 100 AS sz FROM samples),
       |placed AS (SELECT doc_id, i, sz,
       |    312 + 4 * k + 8 * n + COALESCE(SUM(sz) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off FROM sized)
       |SELECT doc_id, CAST(i AS BIGINT) AS sample_no, CAST(i - 1 AS BIGINT) AS pts_s,
       |  CAST(sz AS BIGINT) AS n_bytes, CAST(off AS BIGINT) AS offset
       |FROM placed WHERE (i - 1) % $KEYFRAME_EVERY = 0""".stripMargin.replace("\n", " ")

  /** Walk the ISO-BMFF box tree: Some((timescale, durationUnits)) iff an
    * `ftyp`-led file carries a `moov`/`mvhd` v0 box at sane offsets.
    * Bounds-checked box walk — truncated or corrupt sizes yield None, never
    * a misread.
    */
  def parseMp4(p: Array[Byte]): Option[(Int, Int)] = {
    val b = ByteBuffer.wrap(p).order(ByteOrder.BIG_ENDIAN)
    def boxType(off: Int): String =
      new String(p, off + 4, 4, "US-ASCII")
    if (p.length < 16 || boxType(0) != "ftyp") return None
    var off = 0
    while (off + 8 <= p.length) {
      val size = b.getInt(off)
      if (size < 8 || off + size > p.length) return None
      if (boxType(off) == "moov") {
        var in = off + 8
        val end = off + size
        while (in + 8 <= end) {
          val s2 = b.getInt(in)
          if (s2 < 8 || in + s2 > end) return None
          if (boxType(in) == "mvhd" && s2 >= 32 && b.get(in + 8) == 0) {
            val (ts, dur) = (b.getInt(in + 20), b.getInt(in + 24))
            // a zero/negative timescale is corrupt, not decodable — and
            // would divide-by-zero downstream
            return if (ts > 0 && dur >= 0) Some((ts, dur)) else None
          }
          in += s2
        }
        return None
      }
      off += size
      if (boxType(off - size) == "mdat") return None // data reached, no moov
    }
    None
  }

  private val PNG_SIG =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Full minimal PNG: signature + IHDR (8-bit truecolor) + one IDAT chunk
    * wrapping the payload + IEND, each chunk carrying its real CRC32 over
    * type+data per the PNG spec.
    */
  def pngBytes(width: Int, height: Int, data: Array[Byte]): Array[Byte] = {
    def chunk(typ: String, payload: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.update(t); crc.update(payload)
      val b = ByteBuffer.allocate(12 + payload.length).order(ByteOrder.BIG_ENDIAN)
      b.putInt(payload.length).put(t).put(payload).putInt(crc.getValue.toInt)
      b.array()
    }
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(width).putInt(height)
      .put(8.toByte) // bit depth
      .put(2.toByte) // truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
      .array()
    PNG_SIG ++ chunk("IHDR", ihdr) ++ chunk("IDAT", data) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Parse a PNG: Some((width, height)) iff the signature matches, the
    * first chunk is a 13-byte IHDR, and the IHDR CRC32 verifies — a
    * bit-flipped dimension field fails the CRC and yields None instead of
    * a wrong size.
    */
  def parsePng(p: Array[Byte]): Option[(Int, Int)] = {
    if (p.length < 33) return None // sig 8 + IHDR chunk 25
    if (!PNG_SIG.indices.forall(i => p(i) == PNG_SIG(i))) return None
    val b = ByteBuffer.wrap(p).order(ByteOrder.BIG_ENDIAN)
    if (b.getInt(8) != 13) return None
    if (!"IHDR".zipWithIndex.forall { case (c, i) => p(12 + i) == c.toByte }) return None
    val crc = new java.util.zip.CRC32()
    crc.update(p, 12, 4 + 13) // type + data, per spec
    if (crc.getValue.toInt != b.getInt(29)) return None
    val (w, h) = (b.getInt(16), b.getInt(20))
    if (w > 0 && h > 0) Some((w, h)) else None
  }

  /** Minimal baseline JFIF JPEG: SOI, APP0/JFIF, SOF0 frame header carrying
    * the dimensions (3 components, 4:2:0), payload standing in for entropy-
    * coded data, EOI. 41 bytes of container around the payload.
    */
  def jpegBytes(width: Int, height: Int, data: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(41 + data.length).order(ByteOrder.BIG_ENDIAN)
    b.putShort(0xffd8.toShort) // SOI
    b.putShort(0xffe0.toShort).putShort(16) // APP0, len 16
      .put("JFIF".getBytes("US-ASCII")).put(0.toByte)
      .put(1.toByte).put(2.toByte) // version 1.2
      .put(0.toByte) // density units
      .putShort(1).putShort(1) // 1x1 density
      .put(0.toByte).put(0.toByte) // no thumbnail
    b.putShort(0xffc0.toShort).putShort(17) // SOF0, len 17
      .put(8.toByte) // precision
      .putShort(height.toShort).putShort(width.toShort)
      .put(3.toByte) // components
      .put(1.toByte).put(0x22.toByte).put(0.toByte) // Y  2x2
      .put(2.toByte).put(0x11.toByte).put(1.toByte) // Cb 1x1
      .put(3.toByte).put(0x11.toByte).put(1.toByte) // Cr 1x1
    b.put(data)
    b.putShort(0xffd9.toShort) // EOI
    b.array()
  }

  /** Walk JPEG marker segments from SOI to the first SOF frame header
    * (C0-CF minus the C4/C8/CC non-frame markers): Some((width, height)).
    * Bounds-checked; reaching SOS/EOI or a malformed length yields None.
    */
  def parseJpeg(p: Array[Byte]): Option[(Int, Int)] = {
    if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8) return None
    def be16(off: Int) = ((p(off) & 0xff) << 8) | (p(off + 1) & 0xff)
    var off = 2
    while (off + 4 <= p.length) {
      if ((p(off) & 0xff) != 0xff) return None
      val marker = p(off + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS: no frame header seen
      val len = be16(off + 2)
      if (len < 2 || off + 2 + len > p.length) return None
      if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        if (len < 7) return None
        val (h, w) = (be16(off + 5), be16(off + 7))
        return if (w > 0 && h > 0) Some((w, h)) else None
      }
      off += 2 + len
    }
    None
  }

  /** Synthesize the media table from `documents`: a REAL container header
    * (bmp/wav/mp4/png/jpeg by doc_id) prepended to the utf-8 text bytes standing in
    * for pixel/sample/stream data. Runs as a typed map on the executors —
    * at scale this stage is wherever the real bytes come from (object
    * store, archive shards).
    */
  def mediaTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val data = text.getBytes("UTF-8")
      (id % 5) match {
        case 0 => MediaRow(id, "image/bmp",
          bmpHeader(widthFor(id), heightFor(id), data.length) ++ data)
        case 1 => MediaRow(id, "audio/wav",
          wavHeader(rateFor(id), channelsFor(id), 16, data.length) ++ data)
        case 2 => MediaRow(id, "video/mp4",
          mp4Header(timescaleFor(id), timescaleFor(id) * durationSFor(id),
            data.length) ++ data)
        case 3 => MediaRow(id, "image/png",
          pngBytes(widthFor(id), heightFor(id), data))
        case _ => MediaRow(id, "image/jpeg",
          jpegBytes(widthFor(id), heightFor(id), data))
      }
    }
  }

  /** Decode pass: container-header parse for all five mimes (REAL — the
    * bytes are read, not the generation formula): RIFF fmt for wav,
    * BITMAPINFOHEADER for bmp, the ISO-BMFF box walk to moov/mvhd for mp4,
    * the CRC-verified IHDR chunk for png, the marker walk to SOF0 for jpeg.
    * SAMPLE decode (frames, pcm, pixels) remains a stub — no codec
    * libraries in this container; a javacv/ffmpeg decoder drops into this
    * same mapPartitions slot with zero plan change. Every row also gets
    * the deterministic byte-level features (histogram entropy + an 8-dim
    * head vector) so downstream feature plumbing is exercised for all
    * mimes. `repartition` first when input skew would unbalance decode
    * work.
    */
  def decode(spark: SparkSession, media: Dataset[MediaRow],
      partitions: Int = 0): Dataset[MediaFeatures] = {
    import spark.implicits._
    val balanced =
      if (partitions > 0) media.repartition(partitions, col("doc_id")) else media
    balanced.mapPartitions { rows =>
      rows.map { r =>
        val counts = new Array[Long](256)
        r.payload.foreach(b => counts(b & 0xff) += 1)
        val n = math.max(r.payload.length, 1).toDouble
        var entropy = 0.0
        counts.foreach { c =>
          if (c > 0) { val p = c / n; entropy -= p * math.log(p) / math.log(2) }
        }
        val head = r.payload.take(8)
        val feature = Array.tabulate(8)(i =>
          if (i < head.length) (head(i) & 0xff) / 255.0f else 0.0f)
        val wav = if (r.mime == "audio/wav") parseWav(r.payload) else None
        val img = r.mime match {
          case "image/bmp" => parseBmp(r.payload)
          case "image/png" => parsePng(r.payload)
          case "image/jpeg" => parseJpeg(r.payload)
          case _ => None
        }
        val mp4 = if (r.mime == "video/mp4") parseMp4(r.payload) else None
        MediaFeatures(r.doc_id, r.mime, r.payload.length,
          img.map(_._1), img.map(_._2), wav.map(_._1), wav.map(_._2),
          mp4.map { case (ts, dur) => dur / ts }, // whole seconds by synthesis
          math.rint(entropy * 10000) / 10000, // round for cross-run stability
          head.map(b => f"${b & 0xff}%02x").mkString, feature)
      }
    }
  }

  /** Metadata projection of the decode output — every value here was parsed
    * back OUT of the synthesized payload bytes, and the oracle recomputes
    * the expectation from the shared generation formulas (the fake feature
    * vector + entropy are asserted in ScalaTest instead).
    */
  def mediaMeta(spark: SparkSession, docs: DataFrame): DataFrame =
    decode(spark, mediaTable(spark, docs))
      .toDF()
      .select(col("doc_id"), col("mime"), col("n_bytes"),
        col("width"), col("height"), col("sample_rate"), col("channels"),
        col("duration_s"))

  def mediaMetaSql(docsRel: String): String =
    s"""SELECT doc_id,
       | CASE doc_id % 5 WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'audio/wav' WHEN 2 THEN 'video/mp4' WHEN 3 THEN 'image/png' ELSE 'image/jpeg' END AS mime,
       | CAST(octet_length(encode(text)) + CASE doc_id % 5 WHEN 0 THEN 54 WHEN 1 THEN 44 WHEN 2 THEN 144 WHEN 3 THEN 57 ELSE 41 END AS INT) AS n_bytes,
       | CAST(CASE WHEN doc_id % 5 IN (0, 3, 4) THEN 16 + doc_id % 64 END AS INT) AS width,
       | CAST(CASE WHEN doc_id % 5 IN (0, 3, 4) THEN 9 + doc_id % 32 END AS INT) AS height,
       | CAST(CASE WHEN doc_id % 5 = 1 THEN 8000 + (doc_id % 8) * 1000 END AS INT) AS sample_rate,
       | CAST(CASE WHEN doc_id % 5 = 1 THEN 1 + doc_id % 2 END AS INT) AS channels,
       | CAST(CASE WHEN doc_id % 5 = 2 THEN 5 + doc_id % 60 END AS INT) AS duration_s
       | FROM $docsRel""".stripMargin.replace("\n", " ")

  // ------------------------------------------------------------------
  // REAL sample decode — PCM (wav), the BMP pixel array, PNG scanlines
  // via the JDK's own zlib (java.util.zip.Inflater) plus per-row
  // unfiltering, and baseline-JPEG grayscale via the pure-JVM entropy
  // decoder below. No external codec library: these formats' sample
  // layers are plain arithmetic + DEFLATE + Huffman/IDCT, all
  // implementable on the JDK. MP4 codec frames remain the documented
  // drop-in boundary (a javacv decoder slots into the same map).
  // ------------------------------------------------------------------

  case class DecodedMedia(doc_id: Long, mime: String,
      width: Option[Int], height: Option[Int],
      mean_r: Option[Double], mean_g: Option[Double], mean_b: Option[Double],
      mean_gray: Option[Double],
      n_samples: Option[Int], rms: Option[Double], peak: Option[Int])

  /** Deterministic sample formulas (shared with the SQL oracle). All
    * accumulations downstream are INTEGER sums (exact in double far past
    * these magnitudes), so the decoded statistics are bit-equal across
    * engines with no rounding discipline needed.
    */
  def pixelByte(id: Long, x: Int, y: Int, c: Int): Int =
    ((id * 31 + x * 7 + y * 13 + c * 101) % 256).toInt

  def pcmSample(id: Long, i: Int): Int =
    ((id * 31 + i.toLong * 7919) % 65536).toInt - 32768

  private def nSamplesFor(id: Long): Int = (800 + id % 100).toInt

  /** Bottom-up, BGR, 4-byte-row-padded 24-bpp pixel array (the classic
    * positive-height BMP layout).
    */
  def bmpPixelBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val rowLen = (w * 3 + 3) / 4 * 4
    val out = new Array[Byte](rowLen * h)
    var sr = 0
    while (sr < h) {
      val y = h - 1 - sr // storage row 0 is the BOTTOM image row
      var x = 0
      var o = sr * rowLen
      while (x < w) {
        out(o) = pixelByte(id, x, y, 2).toByte // B
        out(o + 1) = pixelByte(id, x, y, 1).toByte // G
        out(o + 2) = pixelByte(id, x, y, 0).toByte // R
        x += 1
        o += 3
      }
      sr += 1 // pad bytes stay zero
    }
    out
  }

  private def deflateBytes(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](8192)
    val bos = new java.io.ByteArrayOutputStream()
    while (!d.finished()) { val n = d.deflate(buf); bos.write(buf, 0, n) }
    d.end()
    bos.toByteArray
  }

  private def inflateBytes(z: Array[Byte], expected: Int): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(z)
    val out = new Array[Byte](expected)
    try {
      var off = 0
      while (off < expected && !inf.finished()) {
        val n = inf.inflate(out, off, expected - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      if (off == expected) Some(out) else None
    } catch { case _: java.util.zip.DataFormatException => None }
    finally inf.end()
  }

  /** Filter-0 RGB scanlines, zlib-deflated — a real PNG IDAT payload. */
  def pngIdat(id: Long, w: Int, h: Int): Array[Byte] = {
    val raw = new Array[Byte](h * (1 + 3 * w))
    var y = 0
    while (y < h) {
      var o = y * (1 + 3 * w)
      raw(o) = 0 // filter: None
      o += 1
      var x = 0
      while (x < w) {
        raw(o) = pixelByte(id, x, y, 0).toByte
        raw(o + 1) = pixelByte(id, x, y, 1).toByte
        raw(o + 2) = pixelByte(id, x, y, 2).toByte
        x += 1
        o += 3
      }
      y += 1
    }
    deflateBytes(raw)
  }

  /** 16-bit LE mono PCM for the data chunk. */
  def pcmBytes(id: Long): Array[Byte] = {
    val n = nSamplesFor(id)
    val b = ByteBuffer.allocate(2 * n).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) { b.putShort(pcmSample(id, i).toShort); i += 1 }
    b.array()
  }

  /** Decodable media table: REAL encoded samples under the real headers
    * (not text bytes standing in) — bmp / mono wav / png / baseline-jpeg
    * by doc_id % 4.
    */
  def decodableTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val (w, h) = (widthFor(id), heightFor(id))
      (id % 4) match {
        case 0 =>
          val px = bmpPixelBytes(id, w, h)
          MediaRow(id, "image/bmp", bmpHeader(w, h, px.length) ++ px)
        case 1 =>
          val pcm = pcmBytes(id)
          MediaRow(id, "audio/wav", wavHeader(rateFor(id), 1, 16, pcm.length) ++ pcm)
        case 2 =>
          MediaRow(id, "image/png", pngBytes(w, h, pngIdat(id, w, h)))
        case _ =>
          MediaRow(id, "image/jpeg", jpegGrayBytes(id, w, h))
      }
    }
  }

  // ---------------------------------------------------------- baseline JPEG
  // Real baseline-JPEG grayscale, pure JVM (ITU T.81): the encoder writes
  // DQT/DHT/SOF0/SOS plus genuinely Huffman-coded MCU data with the
  // standard Annex K luminance tables; the decoder rebuilds the canonical
  // Huffman tables FROM THE FILE's DHT segments, entropy-decodes DC + AC
  // (EOB/ZRL/run-length, the general path), dequantizes, and runs a full
  // 2D IDCT. The synthetic corpus uses per-8x8-block-constant images with
  // a DC quant step of 8 — for those the DC round-trip is exact
  // (DC = 8*(v-128) quantizes losslessly), so the decoded pixel stats are
  // closed-form predictable by the DuckDB oracle while the decoder itself
  // is the general baseline machine. MP4 codec frames remain the one
  // documented boundary.

  /** Standard luminance DC Huffman spec (T.81 Table K.3): (BITS, HUFFVAL). */
  private val JpegDcBits =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val JpegDcVals = (0 to 11).map(_.toByte).toArray

  /** Standard luminance AC Huffman spec (T.81 Table K.5). */
  private val JpegAcBits =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val JpegAcVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  /** Canonical Huffman codes from a (BITS, HUFFVAL) spec:
    * symbol -> (code, length). Shared by the encoder and (inverted) the
    * decoder, per T.81 Annex C.
    */
  private def huffCodes(bits: Array[Int], vals: Array[Byte]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out += (vals(k) & 0xff) -> (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    out.result()
  }

  /** Per-8x8-block constant gray value of the synthetic image — the shared
    * generation formula (the oracle recomputes pixel sums from it).
    */
  def jpegBlockValue(id: Long, blockIndex: Int): Int =
    ((id * 31 + blockIndex.toLong * 17) % 256).toInt

  /** DC quant step 8: DC = 8*(v-128) for a constant block, so the
    * quantized DC is exactly v-128 and the round-trip is lossless.
    */
  private val JpegQuantDc = 8
  private val JpegQuantAc = 16

  /** Real baseline grayscale JPEG of the per-block-constant image. */
  def jpegGrayBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def put(bs: Int*): Unit = bs.foreach(v => out.write(v & 0xff))
    def marker(m: Int, payload: Array[Int]): Unit = {
      put(0xff, m, (payload.length + 2) >> 8, (payload.length + 2) & 0xff)
      payload.foreach(v => out.write(v & 0xff))
    }
    put(0xff, 0xd8) // SOI
    marker(0xdb, Array(0x00) ++ (0 until 64).map(i =>
      if (i == 0) JpegQuantDc else JpegQuantAc)) // DQT, table 0
    marker(0xc4, Array(0x00) ++ JpegDcBits ++ JpegDcVals.map(_ & 0xff)) // DHT DC 0
    marker(0xc4, Array(0x10) ++ JpegAcBits ++ JpegAcVals.map(_ & 0xff)) // DHT AC 0
    marker(0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff,
      1, 1, 0x11, 0)) // SOF0: 8-bit, 1 component, 1x1 sampling, qtable 0
    marker(0xda, Array(1, 1, 0x00, 0, 63, 0)) // SOS: comp 1, DC 0 / AC 0

    val dcCodes = huffCodes(JpegDcBits, JpegDcVals)
    val acCodes = huffCodes(JpegAcBits, JpegAcVals)
    // bit writer with 0xFF byte stuffing
    var acc = 0L
    var nbits = 0
    def putBits(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1L << len) - 1)); nbits += len
      while (nbits >= 8) {
        val b = ((acc >> (nbits - 8)) & 0xff).toInt
        out.write(b); if (b == 0xff) out.write(0x00)
        nbits -= 8
      }
    }
    val bw = (w + 7) / 8
    val bh = (h + 7) / 8
    var prevDc = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        val dc = jpegBlockValue(id, by * bw + bx) - 128 // quantized DC (q=8)
        val diff = dc - prevDc
        prevDc = dc
        val cat = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        val (c, l) = dcCodes(cat)
        putBits(c, l)
        if (cat > 0)
          putBits(if (diff > 0) diff else diff + (1 << cat) - 1, cat)
        val (ec, el) = acCodes(0x00) // EOB: no AC coefficients
        putBits(ec, el)
        bx += 1
      }
      by += 1
    }
    if (nbits > 0) putBits(0xff, 8 - nbits) // pad final byte with 1s
    put(0xff, 0xd9) // EOI
    out.toByteArray
  }

  /** Full baseline grayscale decode: (w, h, mean gray). Tables come from
    * the FILE (DQT/DHT), entropy decoding handles DC categories and the
    * general AC run/size alphabet (EOB, ZRL, coefficient runs), and every
    * block goes through dequant + the full 2D IDCT. Any malformed
    * segment, truncated stream, or undefined code yields None.
    */
  def decodeJpegGray(p: Array[Byte]): Option[(Int, Int, Double)] = try {
    if (p.length < 4 || (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8) return None
    def be16(off: Int) = ((p(off) & 0xff) << 8) | (p(off + 1) & 0xff)
    var qt = Map.empty[Int, Array[Int]]
    // (class, id) -> (length, code) -> symbol
    var huff = Map.empty[(Int, Int), Map[(Int, Int), Int]]
    var dims: Option[(Int, Int)] = None
    var compQ = 0
    var sosOff = -1
    var dcSel = 0
    var acSel = 0
    var off = 2
    while (sosOff < 0 && off + 4 <= p.length) {
      if ((p(off) & 0xff) != 0xff) return None
      val m = p(off + 1) & 0xff
      if (m == 0xd9) return None // EOI before SOS
      val len = be16(off + 2)
      if (len < 2 || off + 2 + len > p.length) return None
      val seg = off + 4
      m match {
        case 0xdb => // DQT: possibly several tables per segment
          var s = seg
          while (s < off + 2 + len) {
            val pq = (p(s) & 0xf0) >> 4
            if (pq != 0) return None // 16-bit tables: not baseline
            val id = p(s) & 0x0f
            if (s + 65 > off + 2 + len) return None
            qt += id -> (1 to 64).map(i => p(s + i) & 0xff).toArray
            s += 65
          }
        case 0xc4 => // DHT: possibly several tables per segment
          var s = seg
          while (s < off + 2 + len) {
            val clazz = (p(s) & 0xf0) >> 4
            val id = p(s) & 0x0f
            val bits = (1 to 16).map(i => p(s + i) & 0xff).toArray
            val n = bits.sum
            if (s + 17 + n > off + 2 + len) return None
            val vals = (0 until n).map(i => p(s + 17 + i)).toArray
            huff += (clazz, id) ->
              huffCodes(bits, vals).map { case (sym, (c, l)) => (l, c) -> sym }
            s += 17 + n
          }
        case 0xc0 => // SOF0 baseline
          if (p(seg) != 8 || p(seg + 5) != 1) return None // 8-bit grayscale only
          dims = Some((be16(seg + 3), be16(seg + 1)))
          if (p(seg + 7) != 0x11) return None // 1x1 sampling
          compQ = p(seg + 8) & 0x0f
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 |
             0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return None // non-baseline frame types
        case 0xda =>
          if (p(seg) != 1) return None // one scan component
          dcSel = (p(seg + 2) & 0xf0) >> 4
          acSel = p(seg + 2) & 0x0f
          sosOff = off + 2 + len
        case _ => () // APPn / COM / DRI(unused): skip
      }
      off += 2 + len
    }
    val (w, h) = dims.getOrElse(return None)
    if (w <= 0 || h <= 0 || sosOff < 0) return None
    val q = qt.getOrElse(compQ, return None)
    val dcTab = huff.getOrElse((0, dcSel), return None)
    val acTab = huff.getOrElse((1, acSel), return None)

    // bit reader over the entropy stream with 0xFF00 unstuffing
    var pos = sosOff
    var bitBuf = 0L
    var bitCnt = 0
    def fill(): Boolean = {
      while (bitCnt <= 56 && pos < p.length) {
        val b = p(pos) & 0xff
        if (b == 0xff) {
          if (pos + 1 < p.length && p(pos + 1) == 0) {
            bitBuf = (bitBuf << 8) | 0xff; bitCnt += 8; pos += 2
          } else return bitCnt > 0 // a marker: stream ends here
        } else { bitBuf = (bitBuf << 8) | b; bitCnt += 8; pos += 1 }
      }
      bitCnt > 0
    }
    def readBit(): Int = {
      if (bitCnt == 0 && !fill()) throw new IllegalStateException("eof")
      bitCnt -= 1
      ((bitBuf >> bitCnt) & 1).toInt
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def decodeSym(tab: Map[(Int, Int), Int]): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        code = (code << 1) | readBit()
        len += 1
        tab.get((len, code)) match {
          case Some(s) => return s
          case None => ()
        }
      }
      throw new IllegalStateException("undefined huffman code")
    }
    def extend(v: Int, t: Int): Int =
      if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

    // the zigzag scan order (coefficient k -> natural row-major index)
    val zigzag = Array(
      0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)
    val cosT = Array.tabulate(8, 8)((x, u) =>
      math.cos((2 * x + 1) * u * math.Pi / 16))
    val cFac = Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2) else 1.0)

    val bw = (w + 7) / 8
    val bh = (h + 7) / 8
    var graySum = 0L
    var prevDc = 0
    val coef = new Array[Int](64)
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        java.util.Arrays.fill(coef, 0)
        val t = decodeSym(dcTab)
        prevDc += extend(readBits(t), t)
        coef(0) = prevDc * q(0)
        var k = 1
        var eob = false
        while (k < 64 && !eob) {
          val rs = decodeSym(acTab)
          val run = rs >> 4
          val size = rs & 0x0f
          if (size == 0) {
            if (run == 15) k += 16 // ZRL
            else eob = true // EOB
          } else {
            k += run
            if (k > 63) throw new IllegalStateException("AC run overflow")
            coef(zigzag(k)) = extend(readBits(size), size) * q(k)
            k += 1
          }
        }
        // full 2D IDCT + level shift + clamp, crop to the image bounds
        var y = 0
        while (y < 8) {
          val py = by * 8 + y
          var x = 0
          while (x < 8) {
            val px = bx * 8 + x
            if (px < w && py < h) {
              var s = 0.0
              var v = 0
              while (v < 8) {
                var u = 0
                while (u < 8) {
                  val cv = coef(v * 8 + u)
                  if (cv != 0) s += cFac(u) * cFac(v) * cv * cosT(x)(u) * cosT(y)(v)
                  u += 1
                }
                v += 1
              }
              val pix = math.max(0, math.min(255, math.round(s / 4).toInt + 128))
              graySum += pix
            }
            x += 1
          }
          y += 1
        }
        bx += 1
      }
      by += 1
    }
    Some((w, h, graySum.toDouble / (w.toLong * h)))
  } catch { case _: RuntimeException => None }

  /** Decode the BMP pixel array: (w, h, mean r/g/b) — honors the
    * pixel-data offset, bottom-up rows, BGR order, and row padding.
    */
  def decodeBmpPixels(p: Array[Byte]): Option[(Int, Int, Double, Double, Double)] =
    parseBmp(p).flatMap { case (w, h) =>
      val off = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN).getInt(10)
      val rowLen = (w * 3 + 3) / 4 * 4
      if (off < 0 || off.toLong + rowLen.toLong * h > p.length) None
      else {
        var (sr, sg, sb) = (0L, 0L, 0L)
        var row = 0
        while (row < h) {
          var x = 0
          var o = off + row * rowLen
          while (x < w) {
            sb += p(o) & 0xff
            sg += p(o + 1) & 0xff
            sr += p(o + 2) & 0xff
            x += 1
            o += 3
          }
          row += 1
        }
        val n = w.toLong * h
        Some((w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
      }
    }

  /** Decode PCM samples from the canonical wav layout: (n, rms, peak). */
  def decodeWavPcm(p: Array[Byte]): Option[(Int, Double, Int)] = {
    if (parseWav(p).isEmpty) return None
    def tag(off: Int, s: String) =
      s.getBytes("US-ASCII").zipWithIndex.forall { case (c, i) => p(off + i) == c }
    if (!tag(36, "data")) return None
    val b = ByteBuffer.wrap(p).order(ByteOrder.LITTLE_ENDIAN)
    val len = b.getInt(40)
    if (len < 0 || 44 + len > p.length || len % 2 != 0) return None
    val n = len / 2
    var sumSq = 0L
    var peak = 0
    var i = 0
    while (i < n) {
      val s = b.getShort(44 + 2 * i).toInt
      sumSq += s.toLong * s
      val a = math.abs(s)
      if (a > peak) peak = a
      i += 1
    }
    if (n == 0) Some((0, 0.0, 0))
    else Some((n, math.sqrt(sumSq.toDouble / n), peak))
  }

  /** Decode PNG pixels: chunk walk collecting CRC-verified IDATs, JDK
    * zlib inflate, per-row unfilter (None/Sub/Up — the filters a minimal
    * truecolor encoder emits), RGB means. Any CRC failure, truncated
    * stream, or unsupported filter yields None, never wrong pixels.
    */
  def decodePngPixels(p: Array[Byte]): Option[(Int, Int, Double, Double, Double)] =
    parsePng(p).flatMap { case (w, h) =>
      val b = ByteBuffer.wrap(p).order(ByteOrder.BIG_ENDIAN)
      val idat = new java.io.ByteArrayOutputStream()
      var off = 8
      var ok = true
      var done = false
      while (!done && ok && off + 12 <= p.length) {
        val len = b.getInt(off)
        val typ = new String(p, off + 4, 4, "US-ASCII")
        if (len < 0 || off + 12 + len > p.length) ok = false
        else {
          val crc = new java.util.zip.CRC32()
          crc.update(p, off + 4, 4 + len)
          if (crc.getValue.toInt != b.getInt(off + 8 + len)) ok = false
          else {
            if (typ == "IDAT") idat.write(p, off + 8, len)
            if (typ == "IEND") done = true
            off += 12 + len
          }
        }
      }
      if (!ok || !done) return None
      val stride = 1 + 3 * w
      inflateBytes(idat.toByteArray, h * stride).flatMap { raw =>
        var (sr, sg, sb) = (0L, 0L, 0L)
        val prev = new Array[Int](3 * w)
        var y = 0
        while (y < h) {
          val base = y * stride
          val filter = raw(base) & 0xff
          if (filter > 2) return None // Average/Paeth: not emitted here
          var i = 0
          var la = 0; var lb = 0; var lc = 0 // left-neighbor channels
          while (i < w) {
            val o = base + 1 + 3 * i
            val (pa, pb, pc) = (prev(3 * i), prev(3 * i + 1), prev(3 * i + 2))
            val r = filter match {
              case 0 => raw(o) & 0xff
              case 1 => ((raw(o) & 0xff) + la) & 0xff
              case _ => ((raw(o) & 0xff) + pa) & 0xff
            }
            val g = filter match {
              case 0 => raw(o + 1) & 0xff
              case 1 => ((raw(o + 1) & 0xff) + lb) & 0xff
              case _ => ((raw(o + 1) & 0xff) + pb) & 0xff
            }
            val bl = filter match {
              case 0 => raw(o + 2) & 0xff
              case 1 => ((raw(o + 2) & 0xff) + lc) & 0xff
              case _ => ((raw(o + 2) & 0xff) + pc) & 0xff
            }
            sr += r; sg += g; sb += bl
            prev(3 * i) = r; prev(3 * i + 1) = g; prev(3 * i + 2) = bl
            la = r; lb = g; lc = bl
            i += 1
          }
          y += 1
        }
        val n = w.toLong * h
        Some((w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n))
      }
    }

  /** Sample-decode pass over a [[decodableTable]]-shaped dataset. */
  def decodeSamples(spark: SparkSession, media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        r.mime match {
          case "image/bmp" =>
            val d = decodeBmpPixels(r.payload)
            DecodedMedia(r.doc_id, r.mime, d.map(_._1), d.map(_._2),
              d.map(_._3), d.map(_._4), d.map(_._5), None, None, None, None)
          case "audio/wav" =>
            val d = decodeWavPcm(r.payload)
            DecodedMedia(r.doc_id, r.mime, None, None, None, None, None,
              None, d.map(_._1), d.map(_._2), d.map(_._3))
          case "image/png" =>
            val d = decodePngPixels(r.payload)
            DecodedMedia(r.doc_id, r.mime, d.map(_._1), d.map(_._2),
              d.map(_._3), d.map(_._4), d.map(_._5), None, None, None, None)
          case "image/jpeg" =>
            val d = decodeJpegGray(r.payload)
            DecodedMedia(r.doc_id, r.mime, d.map(_._1), d.map(_._2),
              None, None, None, d.map(_._3), None, None, None)
          case _ =>
            DecodedMedia(r.doc_id, r.mime, None, None, None, None, None,
              None, None, None, None)
        }
      }
    }
  }

  /** Synthesize-encode-decode round trip as a frame (the `q_media_decode`
    * surface): every statistic was computed from DECODED bytes — BMP
    * pixels behind offset/padding/BGR, inflated+unfiltered PNG scanlines,
    * PCM samples — and the oracle recomputes the expectation from the
    * shared generation formulas without ever seeing the bytes.
    */
  def mediaDecode(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeSamples(spark, decodableTable(spark, docs)).toDF()

  def mediaDecodeSql(docsRel: String): String =
    s"""WITH base AS (SELECT doc_id, 16 + doc_id % 64 AS w, 9 + doc_id % 32 AS h,
       |    800 + doc_id % 100 AS ns FROM $docsRel),
       |ix AS (SELECT doc_id, w, h, unnest(range(w)) AS x FROM base WHERE doc_id % 4 IN (0, 2)),
       |px AS (SELECT doc_id, w, h, x, unnest(range(h)) AS y FROM ix),
       |imgstats AS (SELECT doc_id,
       |    CAST(sum((doc_id*31 + x*7 + y*13) % 256) AS DOUBLE) / (w*h) AS mean_r,
       |    CAST(sum((doc_id*31 + x*7 + y*13 + 101) % 256) AS DOUBLE) / (w*h) AS mean_g,
       |    CAST(sum((doc_id*31 + x*7 + y*13 + 202) % 256) AS DOUBLE) / (w*h) AS mean_b
       |  FROM px GROUP BY doc_id, w, h),
       |jx AS (SELECT doc_id, w, h, unnest(range(w)) AS x FROM base WHERE doc_id % 4 = 3),
       |jpx AS (SELECT doc_id, w, h, x, unnest(range(h)) AS y FROM jx),
       |jpegstats AS (SELECT doc_id,
       |    CAST(sum((doc_id*31 + ((y // 8) * ((w + 7) // 8) + (x // 8)) * 17) % 256) AS DOUBLE)
       |      / (w*h) AS mean_gray
       |  FROM jpx GROUP BY doc_id, w, h),
       |wv AS (SELECT doc_id, ns, unnest(range(ns)) AS i FROM base WHERE doc_id % 4 = 1),
       |wavstats AS (SELECT doc_id,
       |    sqrt(CAST(sum(s*s) AS DOUBLE) / ns) AS rms, max(abs(s)) AS peak
       |  FROM (SELECT doc_id, ns, (doc_id*31 + i*7919) % 65536 - 32768 AS s FROM wv)
       |  GROUP BY doc_id, ns)
       |SELECT b.doc_id,
       | CASE b.doc_id % 4 WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'audio/wav' WHEN 2 THEN 'image/png' ELSE 'image/jpeg' END AS mime,
       | CAST(CASE WHEN b.doc_id % 4 <> 1 THEN b.w END AS INT) AS width,
       | CAST(CASE WHEN b.doc_id % 4 <> 1 THEN b.h END AS INT) AS height,
       | i.mean_r, i.mean_g, i.mean_b, j.mean_gray,
       | CAST(CASE WHEN b.doc_id % 4 = 1 THEN b.ns END AS INT) AS n_samples,
       | wv2.rms, CAST(wv2.peak AS INT) AS peak
       |FROM base b
       |LEFT JOIN imgstats i ON i.doc_id = b.doc_id
       |LEFT JOIN jpegstats j ON j.doc_id = b.doc_id
       |LEFT JOIN wavstats wv2 ON wv2.doc_id = b.doc_id""".stripMargin.replace("\n", " ")
}
