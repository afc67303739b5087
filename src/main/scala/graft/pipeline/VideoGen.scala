package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Synthetic video table — the third leg of the multimodal-column surface.
  * Payloads are a self-contained deterministic container "VID1":
  * magic(4) | w int16 | h int16 | nFrames int16 | frames, each frame raw
  * RGB w*h*3 from the same xorshift64 synthesis as [[ImageGen.rawPixels]]
  * seeded per (id, frame). Frame EXTRACTION re-encodes a frame as a
  * lossless GRB1 payload, so the whole image expression surface
  * (image_meta / image_gray_mean / image_resize / image_psnr) composes on
  * top — video → frame → image ops is one declarative pipeline. External
  * codecs (h264 & co — absent from this container) would plug into
  * [[decode]], the marked seam.
  */
object VideoGen {

  def dims(id: Long): (Int, Int, Int) =
    (8 + (id % 5L).toInt, 6 + (id % 4L).toInt, 4 + (id % 3L).toInt) // w, h, nFrames

  /** Per-frame pixel synthesis: the frame index perturbs the seed stream. */
  def framePixels(id: Long, frame: Int, w: Int, h: Int): Array[Byte] =
    ImageGen.rawPixels(id * 131L + frame * 2654435761L, w, h)

  def encode(id: Long): Array[Byte] = {
    val (w, h, nf) = dims(id)
    val fsz = w * h * 3
    val out = new Array[Byte](10 + nf * fsz)
    out(0) = 'V'; out(1) = 'I'; out(2) = 'D'; out(3) = '1'
    out(4) = ((w >> 8) & 0xff).toByte; out(5) = (w & 0xff).toByte
    out(6) = ((h >> 8) & 0xff).toByte; out(7) = (h & 0xff).toByte
    out(8) = ((nf >> 8) & 0xff).toByte; out(9) = (nf & 0xff).toByte
    var f = 0
    while (f < nf) {
      System.arraycopy(framePixels(id, f, w, h), 0, out, 10 + f * fsz, fsz)
      f += 1
    }
    out
  }

  /** (w, h, nFrames, frame rasters). The external-codec seam. */
  def decode(bytes: Array[Byte]): (Int, Int, Int, Array[Array[Byte]]) = {
    require(bytes.length >= 10 && bytes(0) == 'V' && bytes(1) == 'I' &&
      bytes(2) == 'D' && bytes(3) == '1', "not a VID1 payload")
    val w  = ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff)
    val h  = ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
    val nf = ((bytes(8) & 0xff) << 8) | (bytes(9) & 0xff)
    val fsz = w * h * 3
    val frames = Array.tabulate(nf)(f =>
      java.util.Arrays.copyOfRange(bytes, 10 + f * fsz, 10 + (f + 1) * fsz))
    (w, h, nf, frames)
  }

  /** [[decode]] behind the per-thread [[DecodeCache]] (the multimodal
    * kernel entry point; callers must not mutate the returned rasters). */
  val decodeCache = new DecodeCache[(Int, Int, Int, Array[Array[Byte]])](decode)
  def decodeCached(bytes: Array[Byte]): (Int, Int, Int, Array[Array[Byte]]) = decodeCache(bytes)

  /** A frame raster re-wrapped as a lossless GRB1 image payload. */
  def frameAsImage(w: Int, h: Int, raster: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](10 + raster.length)
    out(0) = 'G'; out(1) = 'R'; out(2) = 'B'; out(3) = '1'
    out(4) = ((w >> 8) & 0xff).toByte; out(5) = (w & 0xff).toByte
    out(6) = ((h >> 8) & 0xff).toByte; out(7) = (h & 0xff).toByte
    out(8) = 0
    System.arraycopy(raster, 0, out, 10, raster.length)
    out
  }

  /** n-row video table: video_id, bytes, w, h, n_frames. Built from codegen
    * expressions since round 7 (the [[ImageGen.table]] discipline): no
    * Dataset-encoder boundary, and the payload prunes when unread. */
  def table(spark: SparkSession, n: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.ops.Multimodal.register(spark)
    spark.range(n).select(
      concat(lit("vid_"), col("id").cast("string")).as("video_id"),
      call_function("vid1_bytes", col("id")).as("bytes"),
      (col("id") % 5 + 8).cast("int").as("w"),
      (col("id") % 4 + 6).cast("int").as("h"),
      (col("id") % 3 + 4).cast("int").as("n_frames"))
  }

  /** Round-6 row-based generator — the differential-spec twin of [[table]]. */
  private[graft] def tableRowBased(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val (w, h, nf) = dims(id)
          (s"vid_$id", VideoGen.encode(id), w, h, nf)
        }
      }
      .toDF("video_id", "bytes", "w", "h", "n_frames")
  }
}
