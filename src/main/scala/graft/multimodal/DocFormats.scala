package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Document/archive container metadata — the corpus-ingest slice for
  * PDF and ZIP-family blobs (docx/xlsx/jar are ZIP containers), same
  * discipline as Image/Audio/VideoHeaders: pure bounded byte walks on
  * the `binary` column, exact fields only, NULL on anything malformed
  * or out of the parsed subset (callers route those to a decode stage
  * or reject channel).
  *
  *  - ZIP (APPNOTE.TXT §4.3): the End-Of-Central-Directory record is
  *    found by a BOUNDED tail scan (its comment is ≤ 65535 bytes, so
  *    ≤ 65557 bytes are ever examined, regardless of archive size);
  *    it carries entry count, central-directory size/offset. Central
  *    directory entries then yield names + compressed/uncompressed
  *    sizes — the inventory is read WITHOUT touching file data, which
  *    is what makes ZIP listing O(entries) not O(bytes) at corpus
  *    scale. ZIP64 archives (0xFFFF/0xFFFFFFFF sentinels) return NULL
  *    (out of subset; the walk must not mis-report them).
  *  - PDF (ISO 32000-1): `%PDF-M.m` version from the header; the
  *    `startxref` byte offset from the bounded tail; `/Size N` (the
  *    object count) from a classic trailer dictionary when present —
  *    cross-reference-STREAM PDFs (1.5+) carry no trailer dict and
  *    yield NULL size, never a guess.
  */
object DocFormats {

  // ------------------------------------------------------------- ZIP

  /** (entries, centralDirSize, centralDirOffset) from the EOCD. */
  private[multimodal] def zipEocd(b: Array[Byte]): Option[(Int, Long, Long)] = {
    if (b == null || b.length < 22) return None
    def u16(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32(i: Int): Long = (u16(i) | (u16(i + 2).toLong << 16)) & 0xffffffffL
    val lo = math.max(0, b.length - 22 - 65535)
    var i = b.length - 22
    while (i >= lo) {
      if (b(i) == 0x50 && b(i + 1) == 0x4b && b(i + 2) == 0x05 &&
        b(i + 3) == 0x06 && i + 22 + u16(i + 20) == b.length) {
        val entries = u16(i + 10)
        val cdSize = u32(i + 12)
        val cdOff = u32(i + 16)
        // ZIP64 sentinels → out of subset
        if (entries == 0xffff || cdSize == 0xffffffffL ||
          cdOff == 0xffffffffL) return None
        return Some((entries, cdSize, cdOff))
      }
      i -= 1
    }
    None
  }

  /** Central-directory inventory: (name, compressed, uncompressed) per
    * entry, capped at `maxEntries`; None if the directory walk runs off
    * the EOCD's declared bounds (corruption must not half-report). */
  private[multimodal] def zipInventory(b: Array[Byte],
      maxEntries: Int = 4096): Option[Seq[(String, Long, Long)]] =
    zipEocd(b).flatMap { case (entries, cdSize, cdOff) =>
      def u16(i: Long) = (b(i.toInt) & 0xff) | ((b(i.toInt + 1) & 0xff) << 8)
      def u32(i: Long): Long =
        (u16(i) | (u16(i + 2).toLong << 16)) & 0xffffffffL
      val end = cdOff + cdSize
      if (end > b.length) return None
      val out = Seq.newBuilder[(String, Long, Long)]
      var p = cdOff
      var n = 0
      while (n < math.min(entries, maxEntries)) {
        if (p + 46 > end || u32(p) != 0x02014b50L) return None
        val nameLen = u16(p + 28)
        val extraLen = u16(p + 30)
        val commentLen = u16(p + 32)
        if (p + 46 + nameLen > end) return None
        val name = new String(b, p.toInt + 46, nameLen, "UTF-8")
        out += ((name, u32(p + 20), u32(p + 24)))
        p += 46 + nameLen + extraLen + commentLen
        n += 1
      }
      Some(out.result())
    }

  private val zipEocdUdf = udf((b: Array[Byte]) => zipEocd(b))
  private val zipInvUdf = udf((b: Array[Byte]) => zipInventory(b))

  /** Struct(entries, cd_size, cd_offset) or NULL. */
  def zipMeta(bytes: Column): Column = {
    val m = zipEocdUdf(bytes)
    struct(m.getField("_1").as("entries"),
      m.getField("_2").as("cd_size"), m.getField("_3").as("cd_offset"))
  }

  /** Array of struct(name, compressed, uncompressed) or NULL. */
  def zipEntries(bytes: Column): Column = zipInvUdf(bytes)

  // ------------------------------------------------------------- PDF

  /** (major, minor, startxref, sizeOrNull) — see object scaladoc. */
  private[multimodal] def pdfParams(
      b: Array[Byte]): Option[(Int, Int, Long, Option[Long])] = {
    if (b == null || b.length < 9) return None
    val head = new String(b, 0, math.min(16, b.length), "ISO-8859-1")
    if (!head.startsWith("%PDF-")) return None
    val ver = head.drop(5).takeWhile(c => c.isDigit || c == '.')
    val parts = ver.split("\\.")
    if (parts.length < 2 || parts(0).isEmpty || parts(1).isEmpty) return None
    val (major, minor) =
      try (parts(0).toInt, parts(1).toInt)
      catch { case _: NumberFormatException => return None }
    val tail = new String(b, math.max(0, b.length - 2048),
      math.min(2048, b.length), "ISO-8859-1")
    val sx = {
      val i = tail.lastIndexOf("startxref")
      if (i < 0) return None
      val digits = tail.drop(i + "startxref".length).dropWhile(_.isWhitespace)
        .takeWhile(_.isDigit)
      if (digits.isEmpty) return None
      digits.toLong
    }
    val size = {
      val t = tail.lastIndexOf("trailer")
      if (t < 0) None
      else {
        val afterT = tail.drop(t)
        val si = afterT.indexOf("/Size")
        if (si < 0) None
        else {
          val digits = afterT.drop(si + 5).dropWhile(_.isWhitespace)
            .takeWhile(_.isDigit)
          if (digits.isEmpty) None else Some(digits.toLong)
        }
      }
    }
    Some((major, minor, sx, size))
  }

  private val pdfUdf = udf((b: Array[Byte]) => pdfParams(b))

  /** Struct(major, minor, startxref, size) or NULL (size NULL for
    * xref-stream PDFs). */
  def pdfMeta(bytes: Column): Column = {
    val m = pdfUdf(bytes)
    struct(m.getField("_1").as("major"), m.getField("_2").as("minor"),
      m.getField("_3").as("startxref"), m.getField("_4").as("size"))
  }
}
