package graft.multimodal

import graft.SparkSpec

class TiffExifSpec extends SparkSpec {
  import spark.implicits._

  private def entryLE(tag: Int, typ: Int, value: Long): Array[Byte] = {
    val e = new Array[Byte](12)
    e(0) = (tag & 0xff).toByte; e(1) = ((tag >> 8) & 0xff).toByte
    e(2) = (typ & 0xff).toByte; e(3) = ((typ >> 8) & 0xff).toByte
    e(4) = 1 // count = 1
    if (typ == 3) { // SHORT in first two value bytes
      e(8) = (value & 0xff).toByte; e(9) = ((value >> 8) & 0xff).toByte
    } else {
      e(8) = (value & 0xff).toByte; e(9) = ((value >> 8) & 0xff).toByte
      e(10) = ((value >> 16) & 0xff).toByte
      e(11) = ((value >> 24) & 0xff).toByte
    }
    e
  }

  private def tiffLE(entries: Array[Byte]*): Array[Byte] = {
    val n = entries.size
    val head = Array[Byte]('I', 'I', 42, 0, 8, 0, 0, 0,
      (n & 0xff).toByte, ((n >> 8) & 0xff).toByte)
    head ++ entries.flatten ++ Array[Byte](0, 0, 0, 0)
  }

  private def tiffBE(wh: (Int, Int)): Array[Byte] = {
    def entryBE(tag: Int, value: Int): Array[Byte] = {
      val e = new Array[Byte](12)
      e(0) = ((tag >> 8) & 0xff).toByte; e(1) = (tag & 0xff).toByte
      e(2) = 0; e(3) = 3 // SHORT
      e(7) = 1
      e(8) = ((value >> 8) & 0xff).toByte; e(9) = (value & 0xff).toByte
      e
    }
    Array[Byte]('M', 'M', 0, 42, 0, 0, 0, 8, 0, 2) ++
      entryBE(0x0100, wh._1) ++ entryBE(0x0101, wh._2) ++
      Array[Byte](0, 0, 0, 0)
  }

  private def jpegWithExif(tiff: Array[Byte]): Array[Byte] = {
    val payload = "Exif".getBytes :+ 0.toByte :+ 0.toByte
    val len = 2 + payload.length + tiff.length
    Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe1.toByte,
      ((len >> 8) & 0xff).toByte, (len & 0xff).toByte) ++
      payload ++ tiff ++ Array[Byte](0xff.toByte, 0xd9.toByte)
  }

  test("LE and BE TIFF dims + orientation parse from IFD0") {
    val le = tiffLE(entryLE(0x0100, 4, 800L), entryLE(0x0101, 3, 600L),
      entryLE(0x0112, 3, 6L))
    assert(TiffExif.parseTiff(le, 0) ==
      Some((Some(800L), Some(600L), Some(6))))
    assert(TiffExif.parseTiff(tiffBE((320, 240)), 0) ==
      Some((Some(320L), Some(240L), None)))
  }

  test("EXIF-in-JPEG finds the APP1 TIFF; bare TIFF passes through") {
    val tiff = tiffLE(entryLE(0x0100, 3, 1024L), entryLE(0x0112, 3, 8L))
    assert(TiffExif.parseExif(jpegWithExif(tiff)) ==
      Some((Some(1024L), None, Some(8))))
    assert(TiffExif.parseExif(tiff) == Some((Some(1024L), None, Some(8))))
  }

  test("hostile bytes go to NULL, never a throw") {
    val cases = Seq[Array[Byte]](
      null,
      Array[Byte](),
      Array[Byte]('I', 'I'),                       // truncated header
      Array[Byte]('X', 'X', 42, 0, 8, 0, 0, 0),     // wrong magic
      Array[Byte]('I', 'I', 41, 0, 8, 0, 0, 0),     // wrong version
      Array[Byte]('I', 'I', 42, 0, 99, 0, 0, 0),    // IFD offset past end
      // entry count 0xFFFF blows the cap
      Array[Byte]('I', 'I', 42, 0, 8, 0, 0, 0,
        0xff.toByte, 0xff.toByte),
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xda.toByte,
        0, 4, 0, 0)                                 // JPEG: scan, no EXIF
    )
    cases.foreach(c => assert(TiffExif.parseExif(c).isEmpty,
      s"case ${Option(c).map(_.toSeq)}"))
    // invalid orientation value (9) ignored, dims survive
    val badO = tiffLE(entryLE(0x0100, 3, 10L), entryLE(0x0112, 3, 9L))
    assert(TiffExif.parseTiff(badO, 0) == Some((Some(10L), None, None)))
  }

  test("withExifMeta: typed NULLable columns over a binary frame") {
    val rows = Seq(
      (1L, jpegWithExif(tiffLE(entryLE(0x0100, 3, 640L),
        entryLE(0x0101, 3, 480L), entryLE(0x0112, 3, 3L)))),
      (2L, Array[Byte](1, 2, 3)),
      (3L, tiffBE((7, 9))))
    val got = TiffExif.withExifMeta(rows.toDF("id", "bytes"), "bytes")
      .select("id", "exif_width", "exif_height", "exif_orientation")
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got(1L) == ((Some(640L), Some(480L), Some(3))))
    assert(got(2L) == ((None, None, None)))
    assert(got(3L) == ((Some(7L), Some(9L), None)))
  }
}
