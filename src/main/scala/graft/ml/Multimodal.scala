package graft.ml

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, batch decode / feature-extract via mapPartitions.
  *
  * The decode is REAL for the two container formats whose headers are plain
  * binary layouts needing no codec library — WAV (RIFF fmt chunk: sample
  * rate, channels, bits) and BMP (BITMAPINFOHEADER: pixel dimensions) — and
  * an honest, clearly marked STUB for compressed codecs (mp4 et al.: no
  * codec libraries in this container; [[decode]] passes their bytes through
  * with null metadata and the deterministic fake feature vector). The
  * synthesized payloads carry genuine headers, so the pipeline exercises
  * synthesize -> parse-bytes -> metadata end-to-end and the DuckDB oracle
  * recomputes the expected metadata from the same generation formulas.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Int,
      width: Option[Int], height: Option[Int],
      sample_rate: Option[Int], channels: Option[Int],
      entropy: Double, head_hex: String, feature: Array[Float])

  // deterministic per-doc media parameters (shared with the SQL oracle)
  private def widthFor(id: Long): Int = (16 + id % 64).toInt
  private def heightFor(id: Long): Int = (9 + id % 32).toInt
  private def rateFor(id: Long): Int = (8000 + (id % 8) * 1000).toInt
  private def channelsFor(id: Long): Int = (1 + id % 2).toInt

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

  /** Synthesize the media table from `documents`: a REAL header (wav/bmp by
    * doc_id) prepended to the utf-8 text bytes standing in for sample/pixel
    * data; mp4 rows stay opaque (the codec-stub lane). Runs as a typed map
    * on the executors — at scale this stage is wherever the real bytes come
    * from (object store, archive shards).
    */
  def mediaTable(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val data = text.getBytes("UTF-8")
      (id % 3) match {
        case 0 => MediaRow(id, "image/bmp",
          bmpHeader(widthFor(id), heightFor(id), data.length) ++ data)
        case 1 => MediaRow(id, "audio/wav",
          wavHeader(rateFor(id), channelsFor(id), 16, data.length) ++ data)
        case _ => MediaRow(id, "video/mp4", data)
      }
    }
  }

  /** Decode pass: header parse for wav/bmp (REAL — the bytes are read, not
    * the generation formula), STUB for compressed codecs (mp4: no codec
    * libraries in this container — a javacv/ffmpeg frame decoder drops into
    * this same mapPartitions slot with zero plan change). Every row also
    * gets the deterministic byte-level features (histogram entropy + an
    * 8-dim head vector) so downstream feature plumbing is exercised for all
    * mimes. `repartition` first when input skew would unbalance decode work.
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
        val bmp = if (r.mime == "image/bmp") parseBmp(r.payload) else None
        MediaFeatures(r.doc_id, r.mime, r.payload.length,
          bmp.map(_._1), bmp.map(_._2), wav.map(_._1), wav.map(_._2),
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
        col("width"), col("height"), col("sample_rate"), col("channels"))

  def mediaMetaSql(docsRel: String): String =
    s"""SELECT doc_id,
       | CASE WHEN doc_id % 3 = 0 THEN 'image/bmp' WHEN doc_id % 3 = 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
       | CAST(octet_length(encode(text)) + CASE WHEN doc_id % 3 = 0 THEN 54 WHEN doc_id % 3 = 1 THEN 44 ELSE 0 END AS INT) AS n_bytes,
       | CAST(CASE WHEN doc_id % 3 = 0 THEN 16 + doc_id % 64 END AS INT) AS width,
       | CAST(CASE WHEN doc_id % 3 = 0 THEN 9 + doc_id % 32 END AS INT) AS height,
       | CAST(CASE WHEN doc_id % 3 = 1 THEN 8000 + (doc_id % 8) * 1000 END AS INT) AS sample_rate,
       | CAST(CASE WHEN doc_id % 3 = 1 THEN 1 + doc_id % 2 END AS INT) AS channels
       | FROM $docsRel""".stripMargin.replace("\n", " ")
}
