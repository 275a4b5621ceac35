package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DocFormatsSpec extends SparkSpec {
  import spark.implicits._

  /** A REAL zip built by java.util.zip — not hand-forged bytes. */
  private def realZip(comment: Option[String] = None): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    z.setLevel(9)
    z.putNextEntry(new ZipEntry("a.txt"))
    z.write(("alpha " * 50).getBytes("UTF-8"))
    z.closeEntry()
    z.putNextEntry(new ZipEntry("dir/b.bin"))
    z.write(Array.tabulate[Byte](256)(_.toByte))
    z.closeEntry()
    comment.foreach(z.setComment)
    z.close()
    bos.toByteArray
  }

  test("zip EOCD + inventory: real archive, names and exact sizes") {
    val df = Seq(Tuple1(realZip())).toDF("b")
      .select(DocFormats.zipMeta(col("b")).as("m"),
        DocFormats.zipEntries(col("b")).as("e"))
    val r = df.collect().head
    val m = r.getStruct(0)
    assert(m.getInt(0) == 2) // entries
    val entries = r.getSeq[org.apache.spark.sql.Row](1)
      .map(e => (e.getString(0), e.getLong(2)))
    assert(entries == Seq(("a.txt", 300L), ("dir/b.bin", 256L)))
  }

  test("zip with an archive comment still finds the EOCD") {
    val withComment = realZip(Some("trailing comment here"))
    val r = Seq(Tuple1(withComment)).toDF("b")
      .select(DocFormats.zipMeta(col("b")).as("m")).collect().head
    assert(!r.isNullAt(0) && r.getStruct(0).getInt(0) == 2)
  }

  test("zip malformed inputs yield NULL, never a half-report") {
    val garbage = Array.fill[Byte](100)(0x50)
    val truncated = realZip().dropRight(30) // EOCD destroyed
    val rows = Seq(Tuple1(garbage), Tuple1(truncated),
      Tuple1(Array.emptyByteArray))
      .toDF("b").select(DocFormats.zipMeta(col("b")).as("m"),
        DocFormats.zipEntries(col("b")).as("e")).collect()
    rows.foreach(r => assert(r.isNullAt(0) || r.getStruct(0).isNullAt(0)))
    rows.foreach(r => assert(r.isNullAt(1)))
  }

  test("pdf: version, startxref, classic-trailer /Size; stream-xref NULL size") {
    val classic = ("%PDF-1.4\n1 0 obj\n<< /Type /Catalog >>\nendobj\n" +
      "xref\n0 2\ntrailer\n<< /Size 2 /Root 1 0 R >>\n" +
      "startxref\n44\n%%EOF").getBytes("ISO-8859-1")
    val streamXref = ("%PDF-1.7\n1 0 obj\n<< /Type /XRef >>\nstream\n" +
      "endstream\nendobj\nstartxref\n9\n%%EOF").getBytes("ISO-8859-1")
    val rows = Seq(Tuple1(classic), Tuple1(streamXref))
      .toDF("b").select(DocFormats.pdfMeta(col("b")).as("m")).collect()
    val c = rows(0).getStruct(0)
    assert((c.getInt(0), c.getInt(1), c.getLong(2), c.getLong(3)) ==
      ((1, 4, 44L, 2L)))
    val s = rows(1).getStruct(0)
    assert((s.getInt(0), s.getInt(1), s.getLong(2)) == ((1, 7, 9L)))
    assert(s.isNullAt(3)) // xref-stream: no trailer dict → no /Size guess
  }

  test("pdf malformed inputs yield NULL") {
    val rows = Seq("not a pdf", "%PDF-", "%PDF-1.4 no startxref")
      .map(s => Tuple1(s.getBytes("ISO-8859-1")))
      .toDF("b").select(DocFormats.pdfMeta(col("b")).as("m")).collect()
    rows.foreach(r => assert(r.isNullAt(0) || r.getStruct(0).isNullAt(0)))
  }
}
