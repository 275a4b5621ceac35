package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** REAL (non-stub) audio metadata extraction — the audio sibling of
  * [[ImageHeaders]]: format sniffing and stream parameters straight from
  * the container headers, pure byte arithmetic on the `binary` column, no
  * media libraries. Sample decode stays behind [[MediaDecoder]].
  *
  *  - WAV: "RIFF" + "WAVE", then a chunk walk to the "fmt " chunk
  *    (channels, sample rate, bits/sample as little-endian fields) and
  *    the "data" chunk (payload size → duration; RIFF spec). Chunks may
  *    appear in any order with arbitrary padding chunks between, so the
  *    walk is a bounded loop — a tiny deterministic UDF, O(#chunks).
  *  - FLAC: "fLaC", then the mandatory first STREAMINFO block carries
  *    sample rate (20 bits), channels-1 (3 bits) and total samples
  *    (36 bits) bit-packed at byte 18 (FLAC format spec §METADATA_BLOCK_
  *    STREAMINFO) — fixed offsets, declarative byte math.
  *  - MP3/OGG: sniffed by magic ("ID3"/0xFFEx sync, "OggS") for routing;
  *    their stream parameters live in per-frame headers (a full-stream
  *    walk, not a header read) so metadata stays NULL here and rows route
  *    to the decode stage.
  *
  * Unknown/truncated blobs yield NULL fields — callers route them to the
  * decode stage or a reject channel, as with images.
  */
object AudioHeaders {

  private def u8(c: Column, i: Int): Column =
    conv(hex(substring(c, i, 1)), 16, 10).cast("int")
  private def ascii4(c: Column, i: Int): Column = substring(c, i, 4).cast("string")

  /** Format sniff from magic bytes: wav | flac | mp3 | ogg | NULL. */
  def audioFormat(bytes: Column): Column =
    when(length(bytes) >= 12 &&
      ascii4(bytes, 1) === "RIFF" && ascii4(bytes, 9) === "WAVE", "wav")
    .when(length(bytes) >= 4 && ascii4(bytes, 1) === "fLaC", "flac")
    .when(length(bytes) >= 3 && substring(bytes, 1, 3).cast("string") === "ID3", "mp3")
    .when(length(bytes) >= 2 &&
      u8(bytes, 1) === 0xff && (u8(bytes, 2) >= 0xe0), "mp3")
    .when(length(bytes) >= 4 && ascii4(bytes, 1) === "OggS", "ogg")

  /** Parsed WAV parameters: (channels, sampleRate, bitsPerSample,
    * dataBytes) from the fmt/data chunk walk. */
  private[multimodal] def wavParams(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def le16(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def le32(i: Int): Long = (le16(i) | (le16(i + 2).toLong << 16)) & 0xffffffffL
    if (b == null || b.length < 12) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None
    var dataBytes: Option[Long] = None
    while (i + 8 <= b.length && (fmt.isEmpty || dataBytes.isEmpty)) {
      val id = new String(b, i, 4, "US-ASCII")
      val size = le32(i + 4)
      if (id == "fmt " && i + 8 + 16 <= b.length) {
        val channels = le16(i + 10)
        val rate = le32(i + 12).toInt
        val bits = le16(i + 22)
        fmt = Some((channels, rate, bits))
      } else if (id == "data") {
        dataBytes = Some(size)
      }
      // chunks are word-aligned: odd sizes carry one pad byte (RIFF spec)
      i += 8 + size.toInt + (size.toInt & 1)
      if (size > Int.MaxValue - 16) return fmt.map { case (c, r, bt) =>
        (c, r, bt, dataBytes.getOrElse(0L)) } // pathological size: stop
    }
    fmt.map { case (c, r, bt) => (c, r, bt, dataBytes.getOrElse(0L)) }
  }

  private val wavChannels = udf((b: Array[Byte]) => wavParams(b).map(_._1))
  private val wavRate = udf((b: Array[Byte]) => wavParams(b).map(_._2))
  private val wavBits = udf((b: Array[Byte]) => wavParams(b).map(_._3))
  private val wavData = udf((b: Array[Byte]) => wavParams(b).map(_._4))

  // FLAC STREAMINFO (mandatory first metadata block, header at byte 4,
  // payload at byte 8; 1-based substring offsets): sample rate = 20 bits
  // starting at payload byte 10, then 3 channel bits, 5 bits/sample bits,
  // 36 total-sample bits (spec field order).
  private def flacRate(c: Column): Column =
    (u8(c, 19) * 4096 + u8(c, 20) * 16 + shiftright(u8(c, 21), 4)).cast("int")
  private def flacChannels(c: Column): Column =
    (shiftright(u8(c, 21), 1).bitwiseAND(lit(7)) + 1).cast("int")
  private def flacBits(c: Column): Column =
    (u8(c, 21).bitwiseAND(lit(1)) * 16 + shiftright(u8(c, 22), 4) + 1).cast("int")
  private def flacTotalSamples(c: Column): Column =
    (u8(c, 22).bitwiseAND(lit(15)).cast("long") * 4294967296L +
      u8(c, 23).cast("long") * 16777216L + u8(c, 24).cast("long") * 65536L +
      u8(c, 25).cast("long") * 256L + u8(c, 26).cast("long"))

  def audioChannels(bytes: Column): Column =
    when(audioFormat(bytes) === "wav", wavChannels(bytes))
      .when(audioFormat(bytes) === "flac" && length(bytes) >= 26, flacChannels(bytes))

  def audioSampleRate(bytes: Column): Column =
    when(audioFormat(bytes) === "wav", wavRate(bytes))
      .when(audioFormat(bytes) === "flac" && length(bytes) >= 26, flacRate(bytes))

  def audioBitsPerSample(bytes: Column): Column =
    when(audioFormat(bytes) === "wav", wavBits(bytes))
      .when(audioFormat(bytes) === "flac" && length(bytes) >= 26, flacBits(bytes))

  /** Stream duration in milliseconds (NULL when unknown): WAV from data
    * bytes / byte rate; FLAC from total samples / rate (total-samples = 0
    * means "unknown" per spec → NULL). */
  def audioDurationMs(bytes: Column): Column = {
    val wavDur = (wavData(bytes).cast("double") * 1000.0 /
      (wavRate(bytes) * wavChannels(bytes) * (wavBits(bytes) / lit(8))))
      .cast("long")
    val flacDur = when(flacTotalSamples(bytes) > 0,
      (flacTotalSamples(bytes).cast("double") * 1000.0 / flacRate(bytes)).cast("long"))
    when(audioFormat(bytes) === "wav", wavDur)
      .when(audioFormat(bytes) === "flac" && length(bytes) >= 26, flacDur)
  }

  /** Attach (format, channels, sample_rate, bits_per_sample, duration_ms)
    * metadata columns parsed from the binary column. */
  def withAudioMeta(df: DataFrame, bytesCol: String): DataFrame =
    df.withColumn("audio_format", audioFormat(col(bytesCol)))
      .withColumn("audio_channels", audioChannels(col(bytesCol)))
      .withColumn("audio_sample_rate", audioSampleRate(col(bytesCol)))
      .withColumn("audio_bits_per_sample", audioBitsPerSample(col(bytesCol)))
      .withColumn("audio_duration_ms", audioDurationMs(col(bytesCol)))
}
