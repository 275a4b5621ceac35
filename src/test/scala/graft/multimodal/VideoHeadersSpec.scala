package graft.multimodal

import java.io.ByteArrayOutputStream

import graft.SparkSpec

class VideoHeadersSpec extends SparkSpec {
  import spark.implicits._

  // -- bit-exact ISO BMFF builders (no media libs) -------------------------

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long): Array[Byte] = be32(v >>> 32) ++ be32(v & 0xffffffffL)

  private def box(tpe: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ tpe.getBytes("US-ASCII") ++ payload

  private def ftyp = box("ftyp", "isom".getBytes ++ be32(512) ++ "isomiso2".getBytes)

  /** mvhd v0: timescale+duration at payload +12/+16. */
  private def mvhd(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd", new Array[Byte](12) ++ be32(timescale) ++ be32(duration) ++
      new Array[Byte](80))

  /** mvhd v1: 64-bit duration at +28, timescale at +20. */
  private def mvhdV1(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd", Array[Byte](1, 0, 0, 0) ++ new Array[Byte](16) ++
      be32(timescale) ++ be64(duration) ++ new Array[Byte](80))

  /** tkhd with 16.16 width/height as the LAST 8 payload bytes. */
  private def trak(w: Int, h: Int): Array[Byte] =
    box("trak", box("tkhd",
      new Array[Byte](76) ++ be32(w.toLong << 16) ++ be32(h.toLong << 16)))

  private def mp4(boxes: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    boxes.foreach(out.write)
    out.toByteArray
  }

  private def meta(blobs: Seq[Array[Byte]]) =
    VideoHeaders.withVideoMeta(blobs.toDF("bytes"), "bytes")
      .select("video_format", "video_duration_ms", "video_width", "video_height")
      .collect()

  test("mp4: mvhd v0/v1 duration and first video track dims parse") {
    val rows = meta(Seq(
      mp4(ftyp, box("moov", mvhd(1000, 90000) ++ trak(1920, 1080))),
      // audio track first (zero dims) — the video track must still win;
      // v1 mvhd with a >32-bit duration value
      mp4(ftyp, box("moov",
        mvhdV1(600, 3000000000L) ++ trak(0, 0) ++ trak(640, 360)))))
    assert(rows(0).getString(0) == "mp4" && rows(0).getLong(1) == 90000L &&
      rows(0).getInt(2) == 1920 && rows(0).getInt(3) == 1080)
    assert(rows(1).getLong(1) == 3000000000L * 1000 / 600 &&
      rows(1).getInt(2) == 640 && rows(1).getInt(3) == 360)
  }

  // -- EBML builders (Matroska / RFC 9559) ---------------------------------

  /** Element id bytes verbatim (the marker bit stays in). */
  private def ebmlId(id: Long): Array[Byte] = {
    val n = (64 - java.lang.Long.numberOfLeadingZeros(id) + 7) / 8
    (n - 1 to 0 by -1).map(k => ((id >> (8 * k)) & 0xff).toByte).toArray
  }

  /** Size VINT, 1 or 2 bytes. */
  private def vintSize(n: Int): Array[Byte] =
    if (n < 127) Array((0x80 | n).toByte)
    else Array((0x40 | (n >> 8)).toByte, (n & 0xff).toByte)

  private def el(id: Long, payload: Array[Byte]): Array[Byte] =
    ebmlId(id) ++ vintSize(payload.length) ++ payload

  private def webm(info: Array[Byte], tracks: Array[Byte],
      unknownSegmentSize: Boolean): Array[Byte] = {
    val body = info ++ tracks
    el(0x1A45DFA3L, Array.empty[Byte]) ++ ebmlId(0x18538067L) ++
      (if (unknownSegmentSize) Array(0xff.toByte) else vintSize(body.length)) ++
      body
  }

  private def track(w: Int, h: Int): Array[Byte] =
    el(0x1654AE6BL, el(0xAEL, el(0xE0L,
      el(0xB0L, Array(((w >> 8) & 0xff).toByte, (w & 0xff).toByte)) ++
        el(0xBAL, Array(((h >> 8) & 0xff).toByte, (h & 0xff).toByte)))))

  test("webm: EBML walk reads TimecodeScale+Duration and pixel dims, " +
      "incl. the unknown-size Segment of live-muxed files") {
    // explicit 10⁶ ns scale + 4-byte float duration, unknown Segment size
    val a = webm(
      el(0x1549A966L,
        el(0x2AD7B1L, be32(1000000L).drop(1)) ++
          el(0x4489L, be32(java.lang.Float.floatToIntBits(2000.0f) & 0xffffffffL))),
      track(1280, 720), unknownSegmentSize = true)
    // default scale (element omitted) + 8-byte double duration, sized Segment
    val b = webm(
      el(0x1549A966L,
        el(0x4489L, be64(java.lang.Double.doubleToLongBits(1500.0)))),
      track(640, 360), unknownSegmentSize = false)
    // Info present but no Duration → dims parse, duration NULL
    val c = webm(el(0x1549A966L, Array.empty[Byte]), track(320, 240),
      unknownSegmentSize = true)
    val rows = meta(Seq(a, b, c))
    assert(rows(0).getString(0) == "webm" && rows(0).getLong(1) == 2000L &&
      rows(0).getInt(2) == 1280 && rows(0).getInt(3) == 720)
    assert(rows(1).getLong(1) == 1500L && rows(1).getInt(2) == 640 &&
      rows(1).getInt(3) == 360)
    assert(rows(2).isNullAt(1) && rows(2).getInt(2) == 320 &&
      rows(2).getInt(3) == 240)
  }

  // -- RIFF/AVI builders ---------------------------------------------------

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def riffChunk(id: String, payload: Array[Byte]): Array[Byte] =
    id.getBytes("US-ASCII") ++ le32(payload.length) ++ payload ++
      (if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])

  private def avi(usPerFrame: Long, totalFrames: Long, w: Long, h: Long,
      junkFirst: Boolean = false): Array[Byte] = {
    val avih = new Array[Byte](56)
    le32(usPerFrame).copyToArray(avih, 0)
    le32(totalFrames).copyToArray(avih, 16)
    le32(w).copyToArray(avih, 32)
    le32(h).copyToArray(avih, 36)
    val hdrl = "hdrl".getBytes("US-ASCII") ++ riffChunk("avih", avih)
    val body = (if (junkFirst) riffChunk("JUNK", Array[Byte](1, 2, 3))
      else Array.empty[Byte]) ++ riffChunk("LIST", hdrl)
    "RIFF".getBytes("US-ASCII") ++ le32(4L + body.length) ++
      "AVI ".getBytes("US-ASCII") ++ body
  }

  test("avi: the avih main header yields duration and dimensions") {
    val rows = meta(Seq(
      avi(33333, 300, 640, 480),
      avi(33333, 300, 1280, 720, junkFirst = true), // walk skips junk chunks
      avi(0, 300, 640, 480))) // zero frame rate → duration NULL, dims parse
    assert(rows(0).getString(0) == "avi" && rows(0).getLong(1) == 9999L &&
      rows(0).getInt(2) == 640 && rows(0).getInt(3) == 480)
    assert(rows(1).getLong(1) == 9999L && rows(1).getInt(2) == 1280 &&
      rows(1).getInt(3) == 720)
    assert(rows(2).isNullAt(1) && rows(2).getInt(2) == 640)
  }

  test("webm/avi sniff; malformed boxes degrade to NULLs, never throw") {
    val evil = mp4(ftyp, be32(0xFFFFFFFFL) ++ "moov".getBytes) // absurd size
    val rows = meta(Seq(
      Array[Byte](0x1a, 0x45.toByte, 0xdf.toByte, 0xa3.toByte, 1, 2, 3),
      "RIFF".getBytes ++ be32(100).reverse ++ "AVI LIST".getBytes,
      evil,
      mp4(ftyp), // no moov at all
      "not a video".getBytes))
    assert(rows(0).getString(0) == "webm" && rows(0).isNullAt(1))
    assert(rows(1).getString(0) == "avi" && rows(1).isNullAt(1))
    assert(rows(2).getString(0) == "mp4" && rows(2).isNullAt(1) &&
      rows(2).isNullAt(2))
    assert(rows(3).getString(0) == "mp4" && rows(3).isNullAt(1))
    assert(rows(4).isNullAt(0))
  }
}
