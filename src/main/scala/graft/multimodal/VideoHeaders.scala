package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** REAL (non-stub) video container metadata — completes the multimodal
  * header triad (images: [[ImageHeaders]], audio: [[AudioHeaders]]):
  * ISO BMFF / MP4 box parsing straight from container bytes, no media
  * libraries. Frame decode stays behind [[MediaDecoder]].
  *
  *  - MP4/MOV ("ftyp" box at offset 4): top-level box walk to `moov`,
  *    then its children — `mvhd` carries timescale + duration (version 0:
  *    32-bit at payload +12/+16; version 1: timescale at +20, 64-bit duration at +24), `trak`/
  *    `tkhd` carries track width/height as 16.16 fixed point in the last
  *    8 payload bytes (ISO/IEC 14496-12 §8.2.2, §8.3.2). Box sizes are
  *    u32 with size==1 → 64-bit largesize; the walk uses a Long cursor
  *    and treats any malformed size as end-of-parse (NULLs, never a
  *    throw) — one bounded-loop UDF returning the whole tuple.
  *  - WebM/MKV (EBML magic 0x1A45DFA3) and AVI ("RIFF"+"AVI ") sniff for
  *    routing; their duration fields need an element/chunk tree walk with
  *    float timecodes, so metadata stays NULL and rows route to decode.
  *
  * The first video track's dimensions win (the reference corpus shape:
  * one video track + audio tracks whose tkhd dims are zero). */
object VideoHeaders {
  import ByteCols.{ascii4, u8}

  /** Format sniff: mp4 | webm | avi | NULL. */
  def videoFormat(bytes: Column): Column =
    when(length(bytes) >= 12 && ascii4(bytes, 5) === "ftyp", "mp4")
    .when(length(bytes) >= 4 &&
      u8(bytes, 1) === 0x1a && u8(bytes, 2) === 0x45 &&
      u8(bytes, 3) === 0xdf && u8(bytes, 4) === 0xa3, "webm")
    .when(length(bytes) >= 12 &&
      ascii4(bytes, 1) === "RIFF" && ascii4(bytes, 9) === "AVI ", "avi")

  /** (durationMs, width, height) from the moov walk; -1 = field absent. */
  private[multimodal] def mp4Params(b: Array[Byte]): Option[(Long, Int, Int)] = {
    if (b == null || b.length < 12) return None
    def u32(i: Long): Long = {
      val ii = i.toInt
      ((b(ii) & 0xffL) << 24) | ((b(ii + 1) & 0xffL) << 16) |
        ((b(ii + 2) & 0xffL) << 8) | (b(ii + 3) & 0xffL)
    }
    def u64(i: Long): Long = (u32(i) << 32) | u32(i + 4)
    def boxType(i: Long): String = new String(b, i.toInt + 4, 4, "US-ASCII")
    // header size for the box at i, or -1 when malformed/truncated
    def walk(from: Long, to: Long)(f: (String, Long, Long) => Unit): Unit = {
      var i = from
      while (i + 8 <= to) {
        val declared = u32(i)
        val (size, hdr) =
          if (declared == 1L && i + 16 <= to) (u64(i + 8), 16L)
          else (declared, 8L)
        if (size < hdr || i + size > to) return // malformed: stop, keep found
        f(boxType(i), i + hdr, i + size)
        i += size
      }
    }
    if (boxType(0) != "ftyp") return None // type field of the box at 0
    var durationMs = -1L
    var w = -1; var h = -1
    walk(0L, b.length.toLong) { (t, start, end) =>
      if (t == "moov") walk(start, end) { (t2, s2, e2) =>
        if (t2 == "mvhd" && e2 - s2 >= 20) {
          val version = b(s2.toInt) & 0xff
          // v1: version/flags(4) + creation(8) + modification(8) →
          // timescale u32 at +20, duration u64 at +24 (ISO 14496-12 §8.2.2)
          val (timescale, duration) =
            if (version == 1 && e2 - s2 >= 32) (u32(s2 + 20), u64(s2 + 24))
            else (u32(s2 + 12), u32(s2 + 16))
          if (timescale > 0) durationMs = duration * 1000L / timescale
        } else if (t2 == "trak") walk(s2, e2) { (t3, s3, e3) =>
          // width/height: 16.16 fixed point in the LAST 8 payload bytes
          if (t3 == "tkhd" && e3 - s3 >= 8 && w <= 0) {
            val tw = (u32(e3 - 8) >> 16).toInt
            val th = (u32(e3 - 4) >> 16).toInt
            if (tw > 0 && th > 0) { w = tw; h = th } // first video track wins
          }
        }
      }
    }
    Some((durationMs, w, h))
  }

  /** ONE box walk per row: (durationMs|-1, width|-1, height|-1). */
  private val mp4MetaUdf = udf((b: Array[Byte]) => mp4Params(b))

  private def metaColumns(bytes: Column): Seq[(String, Column)] = {
    val fmt = videoFormat(bytes)
    val mp4 = mp4MetaUdf(bytes)
    def pos(c: Column) = when(c >= 0, c)
    Seq(
      "video_format" -> fmt,
      "video_duration_ms" -> when(fmt === "mp4", pos(mp4.getField("_1"))),
      "video_width" -> when(fmt === "mp4", pos(mp4.getField("_2"))),
      "video_height" -> when(fmt === "mp4", pos(mp4.getField("_3"))))
  }

  def videoDurationMs(bytes: Column): Column = metaColumns(bytes)(1)._2
  def videoWidth(bytes: Column): Column = metaColumns(bytes)(2)._2
  def videoHeight(bytes: Column): Column = metaColumns(bytes)(3)._2

  /** Attach (format, duration_ms, width, height) metadata columns parsed
    * from the binary column. */
  def withVideoMeta(df: DataFrame, bytesCol: String): DataFrame =
    metaColumns(col(bytesCol)).foldLeft(df) { case (d, (name, c)) =>
      d.withColumn(name, c)
    }
}
