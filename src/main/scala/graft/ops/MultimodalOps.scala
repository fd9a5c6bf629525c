package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: images/audio/video are carried as opaque
 * `binary` columns with typed metadata.
 *
 * The metadata-extraction half of the decode is REAL: container headers
 * are pure byte layouts needing no codec library, so [[sniffDecode]]
 * genuinely parses PNG / JPEG / GIF / BMP / PPM / WAV headers (true
 * width/height/channels/sample-rate/frame counts, verified against
 * hand-built binaries in MultimodalSpec). Only PIXEL/SAMPLE decoding —
 * the part that genuinely needs libjpeg/ffmpeg, absent from this
 * sandbox — falls to the DETERMINISTIC STUB below, which also handles
 * unrecognized formats. What is additionally real and tested is the
 * Spark-side plumbing: the binary schema, the partition-parallel
 * `mapPartitions` decode (the Scala analog of a Pandas-UDF `mapInPandas`
 * batch loop), batch shapes, and the metadata query with its DuckDB
 * oracle.
 */
object MultimodalOps {

  /** One "media" row: content as opaque bytes + carried metadata. */
  final case class MediaRow(doc_id: Long, media_type: String, blob: Array[Byte])

  /** Extracted features (what a real image/audio decoder would emit).
    * `format` is the sniffed container ("png", "wav", ... or "unknown"). */
  final case class MediaFeatures(
      doc_id: Long, media_type: String, format: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, checksum: Long)

  private def fnv(blob: Array[Byte]): Long = {
    var cs = 1469598103934665603L // FNV-1a
    var i = 0
    while (i < blob.length) { cs = (cs ^ (blob(i) & 0xffL)) * 1099511628211L; i += 1 }
    cs
  }

  // big-endian / little-endian readers over the raw blob (bounds-checked
  // by callers' length guards)
  private def be32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  /**
   * REAL container-header decode: sniff the magic bytes and extract true
   * metadata. Returns (format, width, height, nFrames); `None` = format
   * not recognized (caller falls back to the stub). Pure byte parsing —
   * container METADATA needs no codec:
   *  - PNG: IHDR is always the first chunk, dims big-endian at offset 16
   *  - JPEG: walk the marker stream to the first SOF0/1/2 frame header
   *  - GIF: logical screen descriptor, little-endian u16 at offset 6;
   *    frame count = number of image descriptors (0x2C introducers at
   *    block level)
   *  - BMP: BITMAPINFOHEADER dims (signed LE; height may be negative for
   *    top-down rows)
   *  - PPM (P6): ASCII header "P6 <w> <h> <maxval>"
   *  - WAV: RIFF/WAVE fmt chunk (channels, sample rate) + data chunk
   *    size; "frames" = sample frames = dataBytes / blockAlign
   */
  def sniffDecode(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
    if (b.length >= 24 && be32(b, 0) == 0x89504e47 && be32(b, 4) == 0x0d0a1a0a)
      return Some(("png", be32(b, 16), be32(b, 20), 1))
    if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      // JPEG: scan markers for SOF0 (baseline) / SOF1 / SOF2 (progressive).
      // Any number of 0xFF fill bytes may legally pad before a marker id;
      // entropy-coded data after SOS ends the headers.
      var i = 2
      while (i < b.length && (b(i) & 0xff) == 0xff) {
        var k = i + 1
        while (k < b.length && (b(k) & 0xff) == 0xff) k += 1 // fill bytes
        if (k + 8 >= b.length) return Some(("jpeg", 0, 0, 1)) // truncated
        val m = b(k) & 0xff
        if (m == 0xc0 || m == 0xc1 || m == 0xc2)
          return Some(("jpeg", be16(b, k + 6), be16(b, k + 4), 1))
        if (m == 0xda) return Some(("jpeg", 0, 0, 1)) // SOS before any SOF
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd9)) i = k + 1 // standalone
        else {
          val len = be16(b, k + 1)
          if (len < 2) return Some(("jpeg", 0, 0, 1)) // corrupt length
          i = k + 1 + len
        }
      }
      return Some(("jpeg", 0, 0, 1)) // no SOF found: format known, dims not
    }
    if (b.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') {
      var frames = 0
      var i = 13 + (if ((b(10) & 0x80) != 0) 3 * (1 << ((b(10) & 7) + 1)) else 0)
      while (i < b.length) { // block-level walk: count image descriptors
        (b(i) & 0xff) match {
          case 0x2c => // image descriptor: 10-byte header (+ local palette)
            frames += 1
            if (i + 9 >= b.length) i = b.length
            else {
              i += 10 + (if ((b(i + 9) & 0x80) != 0) 3 * (1 << ((b(i + 9) & 7) + 1)) else 0)
              i += 1 // LZW min code size
              while (i < b.length && b(i) != 0) i += 1 + (b(i) & 0xff) // sub-blocks
              i += 1 // block terminator
            }
          case 0x21 => // extension: label + sub-blocks
            i += 2
            while (i < b.length && b(i) != 0) i += 1 + (b(i) & 0xff)
            i += 1
          case 0x3b => i = b.length // trailer
          case _ => i = b.length // corrupt: stop counting
        }
      }
      return Some(("gif", le16(b, 6), le16(b, 8), math.max(frames, 1)))
    }
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      return Some(("bmp", le32(b, 18), math.abs(le32(b, 22)), 1))
    if (b.length >= 2 && b(0) == 'P' && b(1) == '6') {
      // ASCII header: P6, then whitespace/comment-separated w, h, maxval
      var i = 2
      val nums = new Array[Int](2)
      var k = 0
      while (k < 2 && i < b.length) {
        while (i < b.length &&
          (b(i) == ' ' || b(i) == '\t' || b(i) == '\n' || b(i) == '\r' || b(i) == '#')) {
          if (b(i) == '#') { while (i < b.length && b(i) != '\n') i += 1 }
          else i += 1
        }
        var v = 0; val start = i
        while (i < b.length && b(i) >= '0' && b(i) <= '9') { v = v * 10 + (b(i) - '0'); i += 1 }
        if (i == start) return Some(("ppm", 0, 0, 1)) // malformed header
        nums(k) = v; k += 1
      }
      return Some(("ppm", nums(0), nums(1), 1))
    }
    if (b.length >= 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F'
        && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      // chunk walk: find fmt (channels, rate, block align) and data (size).
      // The size field is untrusted input — a negative or overflowing value
      // must stop the walk (a zero/negative step would otherwise loop a
      // Spark task forever, or index out of bounds), keeping whatever
      // metadata was parsed so far.
      var i = 12L
      var channels = 0; var rate = 0; var blockAlign = 0; var dataBytes = -1
      var walking = true
      while (walking && i + 8 <= b.length) {
        val o = i.toInt
        val size = le32(b, o + 4)
        if (size < 0) walking = false
        else {
          if (b(o) == 'f' && b(o + 1) == 'm' && b(o + 2) == 't' && o + 24 <= b.length) {
            channels = le16(b, o + 10); rate = le32(b, o + 12); blockAlign = le16(b, o + 20)
          } else if (b(o) == 'd' && b(o + 1) == 'a' && b(o + 2) == 't' && b(o + 3) == 'a') {
            dataBytes = size
          }
          i += 8L + size + (size & 1) // chunks are word-aligned; long math
        }
      }
      val frames = if (blockAlign > 0 && dataBytes >= 0) dataBytes / blockAlign else 0
      // width/height carry (sampleRate, channels) for audio — the two
      // scalars a pipeline partitions/filters on
      return Some(("wav", rate, channels, math.max(frames, 1)))
    }
    None
  }

  /**
   * STUB DECODER — stands in for the pixel/sample-decoding half only
   * (libjpeg/ffmpeg are absent from this sandbox) and for unrecognized
   * formats. Deterministic pure function of the bytes: "dimensions" are
   * derived from a rolling checksum. The signature and batch shape are
   * the contract.
   */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val cs = fnv(r.blob)
    val w = 64 + (math.floorMod(cs, 577L)).toInt
    val h = 64 + (math.floorMod(cs >>> 16, 577L)).toInt
    val frames = 1 + (r.blob.length / 100)
    MediaFeatures(r.doc_id, r.media_type, "unknown", r.blob.length.toLong,
      w, h, frames, cs)
  }

  /** Full per-row decode: real header sniffing first, stub fallback. */
  def decodeRow(r: MediaRow): MediaFeatures = sniffDecode(r.blob) match {
    case Some((fmt, w, h, frames)) =>
      MediaFeatures(r.doc_id, r.media_type, fmt, r.blob.length.toLong,
        w, h, frames, fnv(r.blob))
    case None => decodeStub(r)
  }

  /**
   * Partition-parallel decode: the executor-side batch loop. One task per
   * input partition, each iterating its rows through the decoder —
   * exactly the shape a Pandas-UDF `mapInPandas` pipeline has, minus the
   * Arrow hop that Scala doesn't need.
   */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(decodeRow))
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
