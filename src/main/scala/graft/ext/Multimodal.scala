package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines (north-star
  * extension). Media payloads are opaque `binary` columns with typed
  * metadata; decode / feature-extraction run per-partition in batches so a
  * real codec (image/audio libs are absent in this container) can be
  * dropped in without touching the Spark-side plumbing.
  *
  * The decode step itself is a clearly-marked deterministic STUB
  * (`stubDecode`): it derives pseudo-features from the raw bytes so the
  * schema, partitioning, batch shape and tests are all real.
  */
object Multimodal {

  /** One media item: payload + typed metadata. */
  final case class MediaItem(
      media_id: Long,
      payload: Array[Byte],
      format: String,
      source: String)

  /** Decoded features (what a real image/audio decoder would emit). */
  final case class MediaFeatures(
      media_id: Long,
      byte_len: Int,
      first_cp: Int,
      checksum: Long,
      width: Int,
      height: Int)

  /** STUB decoder — stands in for an image/audio codec. Deterministic pure
    * function of the payload bytes: byte length, first byte, a rolling
    * checksum, and fake dimensions derived from the length. Replace the
    * body with a real codec (e.g. TwelveMonkeys/JCodec) when available;
    * the signature is the contract.
    */
  def stubDecode(item: MediaItem): MediaFeatures = {
    val bytes = item.payload
    // first Unicode code point of the UTF-8 payload (0 when empty) — a
    // cross-engine-checkable stand-in for "decoded header field"
    val first =
      if (bytes.isEmpty) 0
      else new String(bytes, java.nio.charset.StandardCharsets.UTF_8).codePointAt(0)
    var cs = 0L
    var i = 0
    while (i < bytes.length) { // batch-friendly tight loop, no boxing
      cs = (cs * 31 + (bytes(i) & 0xff)) % 1000000007L
      i += 1
    }
    MediaFeatures(
      media_id = item.media_id,
      byte_len = bytes.length,
      first_cp = first,
      checksum = cs,
      width = bytes.length % 640 + 16,
      height = (bytes.length / 640) % 480 + 16)
  }

  /** Decode a media Dataset partition-wise. `mapPartitions` keeps the codec
    * initialization (a real decoder's native context) once per partition
    * and streams items through it — the Scala analogue of `mapInPandas`
    * batch plumbing.
    */
  def decode(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      // real codec would be initialized here, once per partition
      it.map(stubDecode)
    }
  }

  /** Frame-sampling plumbing: pick every `stride`-th chunk of `chunkLen`
    * bytes as a pseudo-frame (a video decoder would seek keyframes). Shows
    * the explode-to-frames shape: one row per sampled frame.
    */
  def sampleFrames(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      chunkLen: Int,
      stride: Int): DataFrame =
    df.select(
        col(idCol),
        posexplode(
          transform(
            sequence(lit(0),
              greatest((octet_length(col(payloadCol)) / (chunkLen * stride))
                .cast("int") - 1, lit(0))),
            i => substring(col(payloadCol), (i * chunkLen * stride + 1).cast("int"), lit(chunkLen))))
          .as(Seq("frame_idx", "frame_bytes")))

  /** Build a media table from any table with a string column, for tests and
    * the oracle query: payload = UTF-8 bytes of the text. */
  def mediaFromText(
      df: DataFrame,
      idCol: String,
      textCol: String,
      source: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"),
      lit("text/plain").as("format"),
      lit(source).as("source"))
}
