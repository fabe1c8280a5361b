package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, batch "decode"/feature-extract via mapPartitions.
  *
  * The actual image/audio decode is a clearly marked STUB (no codec
  * libraries in this container): [[decodeStub]] produces a deterministic
  * fake feature vector from the bytes. Everything around it — schema,
  * partition balancing, batch iteration shape, typed Dataset plumbing —
  * is the real thing a decoder would plug into.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte], n_bytes: Int)
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Int,
      entropy: Double, head_hex: String, feature: Array[Float])

  /** Synthesize a media table from `documents`: payload = utf-8 bytes of the
    * text (stands in for image/audio bytes), mime from doc_id. Deterministic
    * and reproducible in SQL for the metadata oracle.
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image/png")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"),
      encode(col("text"), "UTF-8").as("payload"),
      length(encode(col("text"), "UTF-8")).as("n_bytes"))

  def mediaMetaSql(docsRel: String): String =
    s"""SELECT doc_id,
       | CASE WHEN doc_id % 3 = 0 THEN 'image/png' WHEN doc_id % 3 = 1 THEN 'audio/wav' ELSE 'video/mp4' END AS mime,
       | octet_length(encode(text)) AS n_bytes,
       | lower(hex(encode(substr(text, 1, 8)))) AS head_hex
       | FROM $docsRel""".stripMargin.replace("\n", " ")

  /** STUB decode: where a real pipeline would decode image/audio frames
    * (e.g. via javacv/ffmpeg on the executors), we compute a deterministic
    * fake: byte-histogram entropy + an 8-dim feature from the leading bytes.
    * Runs as mapPartitions so a real decoder drops in with zero plan change;
    * repartition first so decode work is balanced regardless of input skew.
    */
  def decodeStub(spark: SparkSession, media: DataFrame, partitions: Int = 0): Dataset[MediaFeatures] = {
    import spark.implicits._
    val balanced =
      if (partitions > 0) media.repartition(partitions, col("doc_id")) else media
    balanced.as[MediaRow].mapPartitions { rows =>
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
        MediaFeatures(r.doc_id, r.mime, r.n_bytes,
          math.rint(entropy * 10000) / 10000, // round for cross-run stability
          head.map(b => f"${b & 0xff}%02x").mkString, feature)
      }
    }
  }

  /** Metadata-only projection of the decode output (oracle-comparable part;
    * the fake feature vector is asserted in ScalaTest instead).
    */
  def mediaMeta(spark: SparkSession, docs: DataFrame): DataFrame = {
    decodeStub(spark, mediaTable(docs))
      .toDF()
      .select(col("doc_id"), col("mime"), col("n_bytes"), col("head_hex"))
  }
}
