package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TIFF header / EXIF metadata extraction — pure bounded byte walks, no
  * media libraries (same posture as [[ImageHeaders]]/[[AudioHeaders]]).
  *
  *  - TIFF (TIFF 6.0 spec): "II"+42 little-endian or "MM"+42 big-endian,
  *    then the IFD0 entry table: 12-byte entries carrying
  *    ImageWidth (0x0100), ImageLength (0x0101) and Orientation (0x0112)
  *    as SHORT or LONG values inlined in the 4-byte value field.
  *  - EXIF-in-JPEG (EXIF 2.3 §4.5.2): the APP1 segment whose payload
  *    starts "Exif\0\0" embeds a whole TIFF structure; all IFD offsets
  *    are relative to that embedded TIFF base.
  *
  * Hostile-byte posture: every offset is bounds-checked against the
  * blob, the entry count is capped (a claimed 60k-entry IFD reads as
  * malformed → NULL), and the JPEG marker walk is the same desync-safe
  * loop [[ImageHeaders.jpegDims]] uses. Malformed anything → None, never
  * a throw — at 100 TB the reject channel gets the row, not the executor
  * a stack trace.
  */
object TiffExif {

  private val MaxIfdEntries = 512

  private def u16(b: Array[Byte], i: Int, le: Boolean): Int =
    if (le) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def u32(b: Array[Byte], i: Int, le: Boolean): Long =
    if (le) (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    else ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  /** (width, height, orientation), each optional, from a TIFF structure
    * whose byte 0 sits at `base`. */
  private[multimodal] def parseTiff(b: Array[Byte], base: Int)
      : Option[(Option[Long], Option[Long], Option[Int])] = {
    if (b == null || base < 0 || base + 8 > b.length) return None
    val le =
      if (b(base) == 'I' && b(base + 1) == 'I') true
      else if (b(base) == 'M' && b(base + 1) == 'M') false
      else return None
    if (u16(b, base + 2, le) != 42) return None
    val ifdOff = u32(b, base + 4, le)
    if (ifdOff < 8 || base + ifdOff + 2 > b.length) return None
    val ifd = base + ifdOff.toInt
    val n = u16(b, ifd, le)
    if (n > MaxIfdEntries || ifd + 2 + n * 12 > b.length) return None
    var w: Option[Long] = None
    var h: Option[Long] = None
    var o: Option[Int] = None
    var k = 0
    while (k < n) {
      val e = ifd + 2 + k * 12
      val tag = u16(b, e, le)
      val typ = u16(b, e + 2, le)
      val cnt = u32(b, e + 4, le)
      if (cnt == 1L && (typ == 3 || typ == 4)) {
        // SHORT sits in the first two bytes of the value field, LONG in
        // all four — both endian-ordered within the field (TIFF 6.0 §2)
        val v = if (typ == 3) u16(b, e + 8, le).toLong else u32(b, e + 8, le)
        tag match {
          case 0x0100 => w = Some(v)
          case 0x0101 => h = Some(v)
          case 0x0112 => if (typ == 3 && v >= 1 && v <= 8) o = Some(v.toInt)
          case _ => ()
        }
      }
      k += 1
    }
    Some((w, h, o))
  }

  /** Find the EXIF TIFF base inside a JPEG (APP1 "Exif\0\0"), or 0 for a
    * bare TIFF; then parse. */
  private[multimodal] def parseExif(b: Array[Byte])
      : Option[(Option[Long], Option[Long], Option[Int])] = {
    if (b == null || b.length < 4) return None
    if ((b(0) == 'I' && b(1) == 'I') || (b(0) == 'M' && b(1) == 'M'))
      return parseTiff(b, 0)
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 1 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      while (i + 1 < b.length && (b(i + 1) & 0xff) == 0xff) i += 1
      if (i + 1 >= b.length) return None
      val marker = b(i + 1) & 0xff
      if (marker == 0x01 || marker == 0xd8 ||
        (marker >= 0xd0 && marker <= 0xd7)) {
        i += 2
      } else if (marker == 0xda || marker == 0xd9) {
        return None // entered scan data: no EXIF ahead
      } else {
        if (i + 3 >= b.length) return None
        val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        if (len < 2 || i + 2 + len > b.length) return None
        if (marker == 0xe1 && len >= 8 &&
          b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' &&
          b(i + 7) == 'f' && b(i + 8) == 0 && b(i + 9) == 0) {
          return parseTiff(b, i + 10)
        }
        i += 2 + len
      }
    }
    None
  }

  private val exifUdf = udf((b: Array[Byte]) =>
    parseExif(b).map { case (w, h, o) =>
      (w.map(Long.box).orNull, h.map(Long.box).orNull,
        o.map(Int.box).orNull)
    })

  /** exif_width / exif_height / exif_orientation columns (NULL when the
    * blob is neither a TIFF nor an EXIF-bearing JPEG, or is malformed). */
  def withExifMeta(df: DataFrame, bytesCol: String): DataFrame =
    df.withColumn("__exif", exifUdf(col(bytesCol)))
      .withColumn("exif_width", col("__exif._1"))
      .withColumn("exif_height", col("__exif._2"))
      .withColumn("exif_orientation", col("__exif._3"))
      .drop("__exif")
}
