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
  *    walk is a bounded loop — ONE deterministic UDF producing the whole
  *    parameter struct (per-field UDFs would re-walk per column),
  *    O(#chunks), Long cursor so a crafted chunk size can't overflow
  *    into a negative offset.
  *  - FLAC: "fLaC", then the mandatory first STREAMINFO block carries
  *    sample rate (20 bits), channels-1 (3 bits) and total samples
  *    (36 bits) bit-packed at byte 18 (FLAC format spec §METADATA_BLOCK_
  *    STREAMINFO) — fixed offsets, declarative byte math.
  *  - MP3: skip an ID3v2 tag (syncsafe size), scan a bounded window for
  *    the 0xFFEx frame sync, decode the 4-byte frame header through the
  *    MPEG-1/2/2.5 bitrate and sample-rate tables (ISO 11172-3 §2.4.2.3 /
  *    13818-3). Duration prefers the Xing/Info or VBRI frame count (the
  *    VBR case, where first-frame bitrate lies) and falls back to the
  *    CBR byte-length estimate.
  *  - OGG: codec parameters from the first page's Vorbis/Opus id header;
  *    duration from the highest granule position over a bounded page walk
  *    (page size = 27 + segments + segment-table sum). Opus granules run
  *    at 48 kHz regardless of the input rate (RFC 7845 §4).
  *
  * Unknown/truncated/malformed blobs yield NULL fields (a missing data
  * chunk yields NULL duration, not 0) — callers route them to the decode
  * stage or a reject channel, as with images.
  */
object AudioHeaders {
  import ByteCols.{ascii4, u8}

  /** Format sniff from magic bytes: wav | flac | mp3 | ogg | NULL. */
  def audioFormat(bytes: Column): Column =
    when(length(bytes) >= 12 &&
      ascii4(bytes, 1) === "RIFF" && ascii4(bytes, 9) === "WAVE", "wav")
    .when(length(bytes) >= 4 && ascii4(bytes, 1) === "fLaC", "flac")
    .when(length(bytes) >= 3 && substring(bytes, 1, 3).cast("string") === "ID3", "mp3")
    .when(length(bytes) >= 2 &&
      u8(bytes, 1) === 0xff && (u8(bytes, 2) >= 0xe0), "mp3")
    .when(length(bytes) >= 4 && ascii4(bytes, 1) === "OggS", "ogg")

  /** Parsed WAV parameters from the fmt/data chunk walk; `dataBytes` is
    * -1 when no data chunk was found (mapped to NULL duration). */
  private[multimodal] def wavParams(b: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def le16(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def le32(i: Int): Long = (le16(i) | (le16(i + 2).toLong << 16)) & 0xffffffffL
    if (b == null || b.length < 12) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var i = 12L // Long cursor: a crafted u32 chunk size must not wrap an Int
    var fmt: Option[(Int, Int, Int)] = None
    var dataBytes = -1L
    while (i + 8 <= b.length && (fmt.isEmpty || dataBytes < 0)) {
      val ii = i.toInt
      val id = new String(b, ii, 4, "US-ASCII")
      val size = le32(ii + 4)
      if (id == "fmt " && i + 8 + 16 <= b.length) {
        val channels = le16(ii + 10)
        val rate = le32(ii + 12).toInt
        val bits = le16(ii + 22)
        fmt = Some((channels, rate, bits))
      } else if (id == "data") {
        dataBytes = size
      }
      // chunks are word-aligned: odd sizes carry one pad byte (RIFF spec)
      i += 8L + size + (size & 1L)
    }
    fmt.map { case (c, r, bt) => (c, r, bt, dataBytes) }
  }

  /** ONE chunk walk per row: the whole parameter tuple as a struct column
    * (_1 channels, _2 rate, _3 bits, _4 dataBytes|-1). */
  private val wavMetaUdf = udf((b: Array[Byte]) => wavParams(b))

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

  /** (format, channels, sample_rate, bits_per_sample, duration_ms) parsed
    * from `bytes` — evaluates the WAV chunk walk ONCE per row. */
  private def metaColumns(bytes: Column): Seq[(String, Column)] = {
    val fmt = audioFormat(bytes)
    val wav = wavMetaUdf(bytes) // struct(_1.._4) or NULL
    val isFlac = fmt === "flac" && length(bytes) >= 26
    val wavDataBytes = wav.getField("_4")
    // a malformed fmt chunk can declare 0 channels/rate/bits — guard the
    // denominator so the division yields NULL, not Infinity→Long.MaxValue
    val wavDur = when(
      wavDataBytes >= 0 && wav.getField("_1") > 0 && wav.getField("_2") > 0 &&
        wav.getField("_3") >= 8,
      (wavDataBytes.cast("double") * 1000.0 /
        (wav.getField("_2") * wav.getField("_1") * (wav.getField("_3") / lit(8))))
        .cast("long"))
    val flacDur = when(flacTotalSamples(bytes) > 0,
      (flacTotalSamples(bytes).cast("double") * 1000.0 / flacRate(bytes)).cast("long"))
    Seq(
      "audio_format" -> fmt,
      "audio_channels" -> when(fmt === "wav", wav.getField("_1"))
        .when(isFlac, flacChannels(bytes)),
      "audio_sample_rate" -> when(fmt === "wav", wav.getField("_2"))
        .when(isFlac, flacRate(bytes)),
      "audio_bits_per_sample" -> when(fmt === "wav", wav.getField("_3"))
        .when(isFlac, flacBits(bytes)),
      "audio_duration_ms" -> when(fmt === "wav", wavDur).when(isFlac, flacDur))
  }

  def audioChannels(bytes: Column): Column = metaColumns(bytes)(1)._2
  def audioSampleRate(bytes: Column): Column = metaColumns(bytes)(2)._2
  def audioBitsPerSample(bytes: Column): Column = metaColumns(bytes)(3)._2

  /** Stream duration in milliseconds (NULL when unknown — including a WAV
    * missing its data chunk and a FLAC with total-samples = 0). */
  def audioDurationMs(bytes: Column): Column = metaColumns(bytes)(4)._2

  /** Attach (format, channels, sample_rate, bits_per_sample, duration_ms)
    * metadata columns parsed from the binary column. */
  def withAudioMeta(df: DataFrame, bytesCol: String): DataFrame =
    metaColumns(col(bytesCol)).foldLeft(df) { case (d, (name, c)) =>
      d.withColumn(name, c)
    }
}
