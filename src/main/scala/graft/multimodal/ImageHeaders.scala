package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** REAL (non-stub) multimodal metadata extraction: image format sniffing
  * and dimension parsing straight from the container headers — pure byte
  * arithmetic on the `binary` column, no media libraries. Covers the
  * formats whose headers are trivially self-describing (plus WebP's three
  * first-chunk layouts — see [[webpDim]]):
  *
  *  - PNG: 8-byte signature, then the IHDR chunk carries big-endian
  *    width/height at fixed offsets 16 and 20 (PNG spec §11.2.2).
  *  - GIF: "GIF87a"/"GIF89a", then little-endian u16 width/height at
  *    offsets 6 and 8 (GIF89a spec §18).
  *  - JPEG: 0xFFD8 SOI, then a marker walk to the first SOF0–SOF15 frame
  *    header, which carries big-endian height/width at +5/+7
  *    (ITU T.81 §B.2.2). The walk needs a loop → small deterministic UDF;
  *    PNG/GIF stay fully declarative (codegen'd byte getItem arithmetic).
  *
  * This replaces guessed metadata for the common web-image corpus slice;
  * unknown/truncated blobs yield NULL dims (callers route them to the
  * decode stage or a reject channel).
  */
object ImageHeaders {
  import ByteCols.{ascii4, beU32, leU16, leU24, leU32, u8}

  /** Format sniff from magic bytes: png | gif | jpeg | webp | bmp |
    * heif | avif | NULL. HEIF/AVIF are ISOBMFF like MP4 — same "ftyp"
    * box, distinguished from video by the major brand. */
  def imageFormat(bytes: Column): Column =
    when(length(bytes) >= 8 &&
      u8(bytes, 1) === 0x89 && u8(bytes, 2) === 0x50 &&
      u8(bytes, 3) === 0x4e && u8(bytes, 4) === 0x47, "png")
    .when(length(bytes) >= 10 &&
      u8(bytes, 1) === 0x47 && u8(bytes, 2) === 0x49 && u8(bytes, 3) === 0x46 &&
      u8(bytes, 4) === 0x38 && u8(bytes, 6) === 0x61, "gif")
    .when(length(bytes) >= 4 &&
      u8(bytes, 1) === 0xff && u8(bytes, 2) === 0xd8, "jpeg")
    .when(length(bytes) >= 16 &&
      ascii4(bytes, 1) === "RIFF" && ascii4(bytes, 9) === "WEBP", "webp")
    .when(length(bytes) >= 26 &&
      u8(bytes, 1) === 0x42 && u8(bytes, 2) === 0x4d, "bmp")
    .when(length(bytes) >= 16 && ascii4(bytes, 5) === "ftyp" &&
      (ascii4(bytes, 9) === "avif" || ascii4(bytes, 9) === "avis"), "avif")
    .when(length(bytes) >= 16 && ascii4(bytes, 5) === "ftyp" &&
      (ascii4(bytes, 9) === "heic" || ascii4(bytes, 9) === "heix" ||
        ascii4(bytes, 9) === "mif1" || ascii4(bytes, 9) === "msf1"), "heif")

  /** WebP dimensions — all three first-chunk layouts are fixed-offset,
    * so the parse is fully declarative (codegen'd), no UDF:
    *  - VP8X (extended): 24-bit LE canvas width−1 / height−1 at payload
    *    bytes 4..9 (WebP container spec, "Extended File Format");
    *  - "VP8 " (lossy): RFC 6386 §9.1 — 3-byte frame tag, 0x9D012A start
    *    code, then LE u16s whose low 14 bits are width/height;
    *  - VP8L (lossless): 0x2F signature then a LE u32 packing 14-bit
    *    width−1 / height−1 (WebP lossless bitstream spec §3).
    * Returns NULL on any other / truncated first chunk. */
  private def webpDim(bytes: Column, first: Boolean): Column = {
    val fourcc = ascii4(bytes, 13)
    val vp8Sync = u8(bytes, 24) === 0x9d && u8(bytes, 25) === 0x01 &&
      u8(bytes, 26) === 0x2a
    val vp8lBits = leU32(bytes, 22)
    when(fourcc === "VP8X" && length(bytes) >= 30,
      (if (first) leU24(bytes, 25) else leU24(bytes, 28)) + 1)
    .when(fourcc === "VP8 " && length(bytes) >= 30 && vp8Sync,
      (if (first) leU16(bytes, 27) else leU16(bytes, 29))
        .bitwiseAND(lit(0x3fff)))
    .when(fourcc === "VP8L" && length(bytes) >= 25 && u8(bytes, 21) === 0x2f,
      (if (first) vp8lBits.bitwiseAND(lit(0x3fffL))
       else shiftright(vp8lBits, 14).bitwiseAND(lit(0x3fffL)))
        .cast("int") + 1)
  }

  /** JPEG SOF marker walk (bounded loop — a tiny deterministic UDF; the
    * per-row work is O(#segments), independent of blob size). Returns
    * (height, width) or null. */
  private[multimodal] def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b == null || b.length < 4 ||
      (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 1 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // desynced
      // any number of 0xFF fill bytes may pad before the marker code
      // (T.81 §B.1.1.2) — skip to the last 0xFF of the run
      while (i + 1 < b.length && (b(i + 1) & 0xff) == 0xff) i += 1
      if (i + 1 >= b.length) return None
      val marker = b(i + 1) & 0xff
      if (marker == 0x01 || marker == 0xd8 ||
        (marker >= 0xd0 && marker <= 0xd7)) {
        i += 2 // standalone markers (TEM, SOI, RSTn) carry no length
      } else if (marker == 0xda || marker == 0xd9) {
        return None // scan data / EOI before any SOF
      } else {
        if (i + 3 >= b.length) return None // truncated length field
        val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        if (len < 2) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (i + 8 >= b.length) return None
          val h = ((b(i + 5) & 0xff) << 8) | (b(i + 6) & 0xff)
          val w = ((b(i + 7) & 0xff) << 8) | (b(i + 8) & 0xff)
          return Some((h, w))
        }
        i += 2 + len
      }
    }
    None
  }

  private val jpegH = udf((b: Array[Byte]) => jpegDims(b).map(_._1))
  private val jpegW = udf((b: Array[Byte]) => jpegDims(b).map(_._2))

  /** HEIF/AVIF dimensions: ISOBMFF box walk (the mp4Params idiom —
    * VideoHeaders.scala) to `meta` (a FULL box: 4 version/flags bytes
    * after the header) → `iprp` → `ipco` → the first `ispe` property
    * (ISO 23008-12 §6.5.3: 4 version/flags bytes, then BE u32
    * width/height). Bounded hostile-byte walk: size 1 → 64-bit
    * largesize, size 0 → to end, non-advancing or out-of-range boxes
    * abort to None. */
  private[multimodal] def heifDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b == null || b.length < 16) return None
    def u32(i: Long): Long = {
      if (i < 0 || i + 4 > b.length) return -1L
      ((b(i.toInt) & 0xffL) << 24) | ((b(i.toInt + 1) & 0xffL) << 16) |
        ((b(i.toInt + 2) & 0xffL) << 8) | (b(i.toInt + 3) & 0xffL)
    }
    def boxType(i: Long): String =
      if (i + 8 > b.length) "" else new String(b, i.toInt + 4, 4, "US-ASCII")
    // walks [from, to); f gets (type, payloadStart, payloadEnd)
    def walk(from: Long, to: Long)(f: (String, Long, Long) => Unit): Boolean = {
      var i = from
      while (i + 8 <= to) {
        val sz = u32(i)
        val (start, end) =
          if (sz == 1L) {
            if (i + 16 > to) return false
            val large = (u32(i + 8) << 32) | u32(i + 12)
            (i + 16, i + large)
          } else if (sz == 0L) (i + 8, to)
          else (i + 8, i + sz)
        if (end <= start || end > to) return false
        f(boxType(i), start, end)
        i = end
      }
      true
    }
    if (boxType(0) != "ftyp") return None
    var dims: Option[(Int, Int)] = None
    walk(0, b.length.toLong) { (t, s, e) =>
      if (t == "meta" && e - s > 4) walk(s + 4, e) { (t2, s2, e2) =>
        if (t2 == "iprp") walk(s2, e2) { (t3, s3, e3) =>
          if (t3 == "ipco") walk(s3, e3) { (t4, s4, e4) =>
            if (t4 == "ispe" && e4 - s4 >= 12 && dims.isEmpty)
              dims = Some((u32(s4 + 8).toInt, u32(s4 + 4).toInt))
          }
        }
      }
    }
    dims.filter { case (h, w) => h > 0 && w > 0 }
  }

  private val heifH = udf((b: Array[Byte]) => heifDims(b).map(_._1))
  private val heifW = udf((b: Array[Byte]) => heifDims(b).map(_._2))

  /** BMP dimensions: BITMAPINFOHEADER (size ≥ 40 at offset 14) carries
    * LE i32 width/height at 18/22 — height SIGNED (negative = top-down
    * rows, same pixel size → abs); the ancient BITMAPCOREHEADER
    * (size 12) carries LE u16s at 18/20. Fixed offsets, declarative. */
  private def bmpDim(bytes: Column, first: Boolean): Column = {
    val hdr = leU32(bytes, 15)
    def i32(at: Int): Column = {
      val v = leU32(bytes, at)
      abs(when(v >= 2147483648L, v - 4294967296L).otherwise(v)).cast("int")
    }
    when(hdr >= 40L && length(bytes) >= 26,
      if (first) i32(19) else i32(23))
    .when(hdr === 12L && length(bytes) >= 22,
      if (first) leU16(bytes, 19) else leU16(bytes, 21))
  }

  /** Parsed width in pixels (NULL when not a recognized image). */
  def imageWidth(bytes: Column): Column =
    when(imageFormat(bytes) === "png", beU32(bytes, 17).cast("int"))
      .when(imageFormat(bytes) === "gif", leU16(bytes, 7))
      .when(imageFormat(bytes) === "jpeg", jpegW(bytes))
      .when(imageFormat(bytes) === "webp", webpDim(bytes, first = true))
      .when(imageFormat(bytes) === "bmp", bmpDim(bytes, first = true))
      .when(imageFormat(bytes).isin("heif", "avif"), heifW(bytes))

  /** Parsed height in pixels (NULL when not a recognized image). */
  def imageHeight(bytes: Column): Column =
    when(imageFormat(bytes) === "png", beU32(bytes, 21).cast("int"))
      .when(imageFormat(bytes) === "gif", leU16(bytes, 9))
      .when(imageFormat(bytes) === "jpeg", jpegH(bytes))
      .when(imageFormat(bytes) === "webp", webpDim(bytes, first = false))
      .when(imageFormat(bytes) === "bmp", bmpDim(bytes, first = false))
      .when(imageFormat(bytes).isin("heif", "avif"), heifH(bytes))

  /** Attach (format, width, height) metadata columns parsed from the
    * binary column — the real half of the multimodal metadata stage; the
    * pixel decode behind [[MediaDecoder]] remains pluggable. */
  def withImageMeta(df: DataFrame, bytesCol: String): DataFrame =
    df.withColumn("image_format", imageFormat(col(bytesCol)))
      .withColumn("image_width", imageWidth(col(bytesCol)))
      .withColumn("image_height", imageHeight(col(bytesCol)))
}
