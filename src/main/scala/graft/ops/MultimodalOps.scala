package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: images/audio/video are carried as opaque
 * `binary` columns with typed metadata. No media codecs exist in this
 * sandbox, so the DECODE STEP IS A DETERMINISTIC STUB (clearly marked
 * below) — what is real and tested is the Spark-side plumbing: the binary
 * schema, the partition-parallel `mapPartitions` decode (the Scala analog
 * of a Pandas-UDF `mapInPandas` batch loop), batch shapes, and the
 * metadata-extraction query with its DuckDB oracle.
 */
object MultimodalOps {

  /** One "media" row: content as opaque bytes + carried metadata. */
  final case class MediaRow(doc_id: Long, media_type: String, blob: Array[Byte])

  /** Extracted features (what a real image/audio decoder would emit). */
  final case class MediaFeatures(
      doc_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, checksum: Long)

  /**
   * STUB DECODER — stands in for an image/audio library. Deterministic pure
   * function of the bytes: "dimensions" are derived from a rolling checksum.
   * Replace the body with e.g. javax.imageio / ffmpeg bindings in a real
   * deployment; the signature and batch shape are the contract.
   */
  def decodeStub(r: MediaRow): MediaFeatures = {
    var cs = 1469598103934665603L // FNV-1a
    var i = 0
    while (i < r.blob.length) { cs = (cs ^ (r.blob(i) & 0xffL)) * 1099511628211L; i += 1 }
    val w = 64 + (math.floorMod(cs, 577L)).toInt
    val h = 64 + (math.floorMod(cs >>> 16, 577L)).toInt
    val frames = 1 + (r.blob.length / 100)
    MediaFeatures(r.doc_id, r.media_type, r.blob.length.toLong, w, h, frames, cs)
  }

  /**
   * Partition-parallel decode: the executor-side batch loop. One task per
   * input partition, each iterating its rows through the (stub) decoder —
   * exactly the shape a Pandas-UDF `mapInPandas` pipeline has, minus the
   * Arrow hop that Scala doesn't need.
   */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** Build a media dataset from `documents` (text bytes as the opaque blob —
    * the container has no real media; the plumbing doesn't care). */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("media_type"),
        encode(col("text"), "UTF-8").as("blob"))
      .as[MediaRow]
  }

  /**
   * Driver-verifiable metadata query (SQL-expressible subset of the decode:
   * sizes, deterministic fake dims from md5, frame sampling arithmetic).
   */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("media_type"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        (conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long") % 577 + 64)
          .as("fake_width"),
        (conv(substring(md5(col("text")), 5, 4), 16, 10).cast("long") % 577 + 64)
          .as("fake_height"))
      .withColumn("n_frames", expr("n_bytes div 100") + 1)
      .orderBy("doc_id")

  val mediaMetaSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio'
      |       ELSE 'video' END AS media_type,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(CAST('0x' || substr(md5(text), 1, 4) AS UBIGINT) AS BIGINT) % 577 + 64 AS fake_width,
      |  CAST(CAST('0x' || substr(md5(text), 5, 4) AS UBIGINT) AS BIGINT) % 577 + 64 AS fake_height,
      |  CAST(octet_length(encode(text)) AS BIGINT) // 100 + 1 AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  /**
   * Frame sampling: for each media row, the deterministic subset of frame
   * indices a decoder would extract — stride chosen so at most ~8 frames
   * are sampled regardless of media length (stride = ceil(n_frames/8)).
   * This is the pre-decode planning half of a video pipeline: the exploded
   * (doc_id, frame_idx) rows are exactly the work-list handed to the batch
   * decoder, and the arithmetic is engine-exact. One row explodes into at
   * most 8 — bounded fan-out, shuffle-free until the output sort.
   */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    mediaMeta(spark, dir)
      .filter(col("media_type") =!= "image") // images have no frame axis
      .withColumn("stride", expr("(n_frames + 7) div 8"))
      .select(col("doc_id"), col("media_type"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, col("stride")))
          .as("frame_idx"))
      .orderBy("doc_id", "frame_idx")

  val frameSampleSql: String =
    """WITH meta AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio'
      |         ELSE 'video' END AS media_type,
      |    CAST(octet_length(encode(text)) AS BIGINT) // 100 + 1 AS n_frames
      |  FROM documents)
      |SELECT doc_id, media_type, n_frames,
      |  unnest(range(0, n_frames, (n_frames + 7) // 8)) AS frame_idx
      |FROM meta WHERE media_type <> 'image'
      |ORDER BY doc_id, frame_idx""".stripMargin

  val all: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "multimodal_meta" -> (mediaMeta _, mediaMetaSql),
    "multimodal_frame_sample" -> (frameSample _, frameSampleSql))
}
