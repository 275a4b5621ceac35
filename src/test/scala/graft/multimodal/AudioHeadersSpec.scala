package graft.multimodal

import java.io.ByteArrayOutputStream

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class AudioHeadersSpec extends SparkSpec {
  import spark.implicits._

  // -- real byte-level builders (no media libs) ----------------------------

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Valid RIFF/WAVE with the given chunk order (chunks besides fmt/data
    * are junk payloads exercising the walk; odd sizes get the pad byte). */
  private def wav(channels: Int, rate: Int, bits: Int, dataBytes: Int,
      chunkOrder: Seq[String]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def chunk(id: String, payload: Array[Byte]): Unit = {
      out.write(id.getBytes("US-ASCII")); out.write(le32(payload.length))
      out.write(payload)
      if (payload.length % 2 == 1) out.write(0)
    }
    val fmt = le16(1) ++ le16(channels) ++ le32(rate) ++
      le32(rate.toLong * channels * bits / 8) ++
      le16(channels * bits / 8) ++ le16(bits)
    val body = new ByteArrayOutputStream()
    body.write("WAVE".getBytes("US-ASCII"))
    val tmp = out // reuse chunk() against body
    chunkOrder.foreach {
      case "fmt" => chunk("fmt ", fmt)
      case "data" => chunk("data", Array.fill[Byte](dataBytes)(7))
      case "junk" => chunk("LIST", Array[Byte](1, 2, 3)) // odd size → pad
    }
    body.write(tmp.toByteArray)
    val full = new ByteArrayOutputStream()
    full.write("RIFF".getBytes("US-ASCII"))
    full.write(le32(body.size().toLong))
    full.write(body.toByteArray)
    full.toByteArray
  }

  /** Valid fLaC signature + STREAMINFO block (spec bit layout). */
  private def flac(rate: Int, channels: Int, bits: Int, totalSamples: Long): Array[Byte] = {
    val p = new Array[Byte](34)
    p(0) = 0x10; p(1) = 0x00; p(2) = 0x10; p(3) = 0x00 // block sizes
    p(10) = ((rate >> 12) & 0xff).toByte
    p(11) = ((rate >> 4) & 0xff).toByte
    p(12) = (((rate & 0xf) << 4) | ((channels - 1) << 1) | ((bits - 1) >> 4)).toByte
    p(13) = ((((bits - 1) & 0xf) << 4) | ((totalSamples >> 32) & 0xf).toInt).toByte
    p(14) = ((totalSamples >> 24) & 0xff).toByte
    p(15) = ((totalSamples >> 16) & 0xff).toByte
    p(16) = ((totalSamples >> 8) & 0xff).toByte
    p(17) = (totalSamples & 0xff).toByte
    "fLaC".getBytes("US-ASCII") ++ Array[Byte](0x00, 0, 0, 34) ++ p
  }

  private def meta(blobs: Seq[Array[Byte]]) =
    AudioHeaders.withAudioMeta(blobs.toDF("bytes"), "bytes")
      .select("audio_format", "audio_channels", "audio_sample_rate",
        "audio_bits_per_sample", "audio_duration_ms")
      .collect()

  test("WAV: fmt/data walk handles chunk order, junk chunks and padding") {
    val rows = meta(Seq(
      wav(1, 8000, 16, 16000, Seq("fmt", "data")),
      wav(2, 44100, 16, 44100 * 4, Seq("junk", "fmt", "junk", "data")),
      wav(1, 16000, 8, 8000, Seq("data", "fmt")))) // data BEFORE fmt
    assert(rows(0).getString(0) == "wav" && rows(0).getInt(1) == 1 &&
      rows(0).getInt(2) == 8000 && rows(0).getInt(3) == 16 &&
      rows(0).getLong(4) == 1000L)
    assert(rows(1).getInt(1) == 2 && rows(1).getInt(2) == 44100 &&
      rows(1).getLong(4) == 1000L) // 44100*4 bytes / (44100*2ch*2B) = 1 s
    assert(rows(2).getInt(2) == 16000 && rows(2).getLong(4) == 500L)
  }

  test("FLAC: STREAMINFO bit unpacking (rate 20b, channels 3b, bits 5b, samples 36b)") {
    val rows = meta(Seq(
      flac(44100, 2, 16, 441000L),
      flac(48000, 1, 24, 0L),            // total=0 → unknown duration
      flac(96000, 8, 32, 1L << 33)))     // >32-bit sample count
    assert(rows(0).getString(0) == "flac" && rows(0).getInt(1) == 2 &&
      rows(0).getInt(2) == 44100 && rows(0).getInt(3) == 16 &&
      rows(0).getLong(4) == 10000L)
    assert(rows(1).getInt(2) == 48000 && rows(1).getInt(3) == 24 &&
      rows(1).isNullAt(4))
    assert(rows(2).getInt(1) == 8 && rows(2).getInt(2) == 96000 &&
      rows(2).getLong(4) == (1L << 33) * 1000 / 96000)
  }

  test("WAV without a data chunk: parameters parse, duration is NULL") {
    val rows = meta(Seq(wav(1, 8000, 16, 0, Seq("fmt")))) // no data chunk
    assert(rows(0).getString(0) == "wav" && rows(0).getInt(2) == 8000)
    assert(rows(0).isNullAt(4), "missing data chunk must yield NULL duration")
  }

  test("crafted near-Int.MaxValue chunk size cannot wrap the walk cursor") {
    // RIFF/WAVE + one chunk declaring size 0x7FFFFFEF: an Int cursor
    // would wrap negative and read out of bounds; must yield NULLs
    val evil = "RIFF".getBytes("US-ASCII") ++ le32(100) ++
      "WAVE".getBytes("US-ASCII") ++ "JUNK".getBytes("US-ASCII") ++
      le32(0x7FFFFFEFL) ++ Array.fill[Byte](16)(0)
    val rows = meta(Seq(evil))
    assert(rows(0).getString(0) == "wav" && rows(0).isNullAt(1) &&
      rows(0).isNullAt(4))
  }

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def le64(v: Long): Array[Byte] = le32(v & 0xffffffffL) ++ le32(v >>> 32)

  /** One OGG page: 27-byte header + 1-entry segment table (payload < 255). */
  private def oggPage(typ: Int, granule: Long, payload: Array[Byte]): Array[Byte] =
    "OggS".getBytes("US-ASCII") ++ Array[Byte](0, typ.toByte) ++
      le64(granule) ++ le32(1) ++ le32(0) ++ le32(0) ++
      Array[Byte](1, payload.length.toByte) ++ payload

  /** Vorbis identification header (packet type 1, §4.2.2 layout). */
  private def vorbisId(channels: Int, rate: Int): Array[Byte] =
    Array[Byte](1) ++ "vorbis".getBytes("US-ASCII") ++ le32(0) ++
      Array[Byte](channels.toByte) ++ le32(rate) ++ new Array[Byte](14)

  /** OpusHead (RFC 7845 §5.1): version, channels, pre-skip, input rate. */
  private def opusHead(channels: Int, inputRate: Int): Array[Byte] =
    "OpusHead".getBytes("US-ASCII") ++ Array[Byte](1, channels.toByte) ++
      le16(312) ++ le32(inputRate) ++ le16(0) ++ Array[Byte](0)

  test("MP3: frame-header tables, ID3v2 skip, Xing frame count, V2 mono") {
    // V1 Layer III, 128 kbps, 44.1 kHz, stereo; no Xing → CBR estimate
    val cbr = Array(0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00.toByte) ++
      new Array[Byte](16000)
    // ID3v2 (syncsafe size 10) + same frame + Xing at 4+32 with frames=100
    val xing = "ID3".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0, 0, 0, 10) ++
      new Array[Byte](10) ++
      Array(0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00.toByte) ++
      new Array[Byte](32) ++ "Xing".getBytes("US-ASCII") ++ be32(1) ++
      be32(100) ++ new Array[Byte](12)
    // MPEG2 Layer III, 80 kbps, 22.05 kHz, mono → 576 samples/frame path
    val v2mono = Array(0xff.toByte, 0xf3.toByte, 0x90.toByte, 0xc0.toByte) ++
      new Array[Byte](10000)
    val rows = meta(Seq(cbr, xing, v2mono))
    assert(rows(0).getString(0) == "mp3" && rows(0).getInt(1) == 2 &&
      rows(0).getInt(2) == 44100 && rows(0).isNullAt(3) &&
      rows(0).getLong(4) == 16004L * 8 / 128)
    assert(rows(1).getLong(4) == 100L * 1152 * 1000 / 44100, // Xing wins CBR
      s"xing duration ${rows(1)}")
    assert(rows(2).getInt(1) == 1 && rows(2).getInt(2) == 22050 &&
      rows(2).getLong(4) == 10004L * 8 / 80)
  }

  test("OGG: Vorbis/Opus id headers + last-granule duration") {
    val vorbis = oggPage(2, 0, vorbisId(2, 44100)) ++
      oggPage(0, 44100, new Array[Byte](5)) ++
      oggPage(4, 88200, new Array[Byte](5))
    val opus = oggPage(2, 0, opusHead(1, 24000)) ++
      oggPage(4, 96000, new Array[Byte](5)) // granules run at 48 kHz
    // id page only, no data page with a granule → duration unknown
    val headOnly = oggPage(2, 0, vorbisId(2, 48000))
    val rows = meta(Seq(vorbis, opus, headOnly))
    assert(rows(0).getString(0) == "ogg" && rows(0).getInt(1) == 2 &&
      rows(0).getInt(2) == 44100 && rows(0).isNullAt(3) &&
      rows(0).getLong(4) == 2000L)
    assert(rows(1).getInt(1) == 1 && rows(1).getInt(2) == 24000 &&
      rows(1).getLong(4) == 2000L)
    assert(rows(2).getInt(2) == 48000 && rows(2).isNullAt(4))
  }

  test("mp3/ogg sniff for routing; junk and truncation yield NULLs") {
    val rows = meta(Seq(
      "ID3\u0004\u0000junkjunk".getBytes("US-ASCII"),
      Array(0xff.toByte, 0xfb.toByte, 0x90.toByte, 0x00.toByte),
      "OggS\u0000junk".getBytes("US-ASCII"),
      "not audio at all".getBytes("US-ASCII"),
      "RIFF".getBytes("US-ASCII"))) // truncated RIFF
    assert(rows(0).getString(0) == "mp3" && rows(0).isNullAt(2))
    assert(rows(1).getString(0) == "mp3")
    assert(rows(2).getString(0) == "ogg" && rows(2).isNullAt(2))
    assert(rows(3).isNullAt(0) && rows(3).isNullAt(4))
    assert(rows(4).isNullAt(0))
  }

  test("ID3v2 text frames: v2.3 and v2.4 sizes, encodings, hostile stop") {
    def syncsafe(v: Long): Array[Byte] = Array(
      ((v >> 21) & 0x7f).toByte, ((v >> 14) & 0x7f).toByte,
      ((v >> 7) & 0x7f).toByte, (v & 0x7f).toByte)
    def frame(id: String, enc: Int, text: String, v4: Boolean): Array[Byte] = {
      val body = Array(enc.toByte) ++
        text.getBytes(if (enc == 0) "ISO-8859-1" else "UTF-8")
      id.getBytes("US-ASCII") ++
        (if (v4) syncsafe(body.length) else be32(body.length)) ++
        Array[Byte](0, 0) ++ body
    }
    def tag(ver: Int, frames: Array[Byte]): Array[Byte] =
      "ID3".getBytes("US-ASCII") ++ Array[Byte](ver.toByte, 0, 0) ++
        syncsafe(frames.length + 16) ++ frames ++ new Array[Byte](16)

    val v3 = tag(3, frame("TIT2", 0, "Hello", v4 = false) ++
      frame("TPE1", 3, "Ärtist", v4 = false))
    val got3 = AudioHeaders.id3TextFrames(v3).get
    assert(got3 == Map("TIT2" -> "Hello", "TPE1" -> "Ärtist"))

    val v4tag = tag(4, frame("TALB", 3, "Album", v4 = true))
    assert(AudioHeaders.id3TextFrames(v4tag).get == Map("TALB" -> "Album"))

    // hostile: frame size pointing past the tag end stops the walk clean
    val evil = tag(3, frame("TIT2", 0, "ok", v4 = false) ++
      "TXYZ".getBytes("US-ASCII") ++ be32(100000) ++ Array[Byte](0, 0))
    assert(AudioHeaders.id3TextFrames(evil).get == Map("TIT2" -> "ok"))
    // non-ID3 bytes → None; Column API round-trips as a map
    assert(AudioHeaders.id3TextFrames("RIFFxxxx".getBytes).isEmpty)
    import spark.implicits._
    val df = Seq(Tuple1(v3)).toDF("b")
      .select(AudioHeaders.id3Tags(org.apache.spark.sql.functions.col("b"))
        .as("tags"))
    val m = df.collect().head.getMap[String, String](0)
    assert(m("TIT2") == "Hello")
  }

  /** ADTS frames: 7-byte headers (protection_absent=1), zero payload. */
  private def adts(sfi: Int, chan: Int, frameLens: Seq[Int]): Array[Byte] =
    frameLens.flatMap { fl =>
      val b = Array.fill(fl)(0)
      b(0) = 0xff; b(1) = 0xf1
      b(2) = (1 << 6) | (sfi << 2) | ((chan >> 2) & 1)
      b(3) = ((chan & 3) << 6) | ((fl >> 11) & 3)
      b(4) = (fl >> 3) & 0xff
      b(5) = ((fl & 7) << 5) | 0x1f
      b(6) = 0xfc
      b
    }.map(_.toByte).toArray

  test("ADTS AAC: sniff beats the raw MP3 sync; rate/channels/duration parse") {
    // 43 frames @ 44100 Hz: 43*1024*1000/44100 = 998 ms
    val blob = adts(sfi = 4, chan = 2, frameLens = Seq.fill(43)(200))
    assert(AudioHeaders.aacParams(blob) == Some((2, 44100, 998L)))
    import spark.implicits._
    val r = AudioHeaders.withAudioMeta(
      Seq(Tuple1(blob)).toDF("b"), "b").collect().head
    assert(r.getAs[String]("audio_format") == "aac")
    assert(r.getAs[Int]("audio_channels") == 2)
    assert(r.getAs[Int]("audio_sample_rate") == 44100)
    assert(r.getAs[Long]("audio_duration_ms") == 998L)
    assert(r.isNullAt(r.fieldIndex("audio_bits_per_sample")))
  }

  test("ADTS AAC: trailing garbage stops the frame count cleanly") {
    val blob = adts(4, 1, Seq.fill(10)(150)) ++
      "garbage after the stream".getBytes("ASCII")
    // 10 frames @ 44100: 10*1024*1000/44100 = 232 ms
    assert(AudioHeaders.aacParams(blob) == Some((1, 44100, 232L)))
  }

  test("ADTS AAC: PCE-carried channel config 0 yields NULL channels; bad sfi yields NULLs") {
    import spark.implicits._
    val pce = adts(11, 0, Seq(100)) // sfi 11 = 8000 Hz, chan cfg 0
    val r = AudioHeaders.withAudioMeta(Seq(Tuple1(pce)).toDF("b"), "b")
      .collect().head
    assert(r.getAs[String]("audio_format") == "aac")
    assert(r.isNullAt(r.fieldIndex("audio_channels")))
    assert(r.getAs[Int]("audio_sample_rate") == 8000)
    // reserved sampling-frequency index: the parse refuses, fields NULL
    assert(AudioHeaders.aacParams(adts(14, 2, Seq(100))).isEmpty)
    // hostile frame length < header size cannot loop forever
    val tiny = adts(4, 2, Seq(100))
    tiny(4) = 0; tiny(5) = (3 << 5).toByte // frame length 3 < 7
    assert(AudioHeaders.aacParams(tiny) == Some((2, 44100, -1L)))
  }
}
