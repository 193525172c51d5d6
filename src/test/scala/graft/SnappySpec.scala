package graft

import org.scalatest.funsuite.AnyFunSuite

/** Snappy decode — cross-differentials against snappy-java (the
  * reference implementation Spark itself ships for parquet) in BOTH
  * directions, plus the framing format's masked-CRC32C integrity
  * chain (JDK CRC32C as the checksum reference) and hostile shapes.
  */
class SnappySpec extends AnyFunSuite {

  import graft.expr.{Snappy, SnappyBuild}

  private def corpora: Seq[Array[Byte]] = {
    val rnd = new scala.util.Random(11)
    Seq(
      "snappy probe payload payload payload payload".getBytes("UTF-8"),
      ("alpha beta gamma delta " * 5000).getBytes("UTF-8"), // >64KB
      Array.fill[Byte](3000)(rnd.nextInt().toByte), // incompressible
      ("head " * 20).getBytes("UTF-8") ++
        Array.fill[Byte](500)(rnd.nextInt().toByte) ++
        ("tail " * 300).getBytes("UTF-8"),
      "ab".getBytes("UTF-8"),
      Array.emptyByteArray)
  }

  test("raw: our decoder reads REAL snappy-java output") {
    corpora.foreach { d =>
      val c = org.xerial.snappy.Snappy.compress(d)
      val out = Snappy.decode(c)
      assert(out != null && java.util.Arrays.equals(out, d),
        s"len=${d.length}")
    }
  }

  test("raw: snappy-java reads OUR writer's output") {
    corpora.foreach { d =>
      val c = SnappyBuild.raw(d)
      assert(org.xerial.snappy.Snappy.isValidCompressedBuffer(c),
        s"len=${d.length}")
      val back = org.xerial.snappy.Snappy.uncompress(c)
      assert(java.util.Arrays.equals(back, d), s"len=${d.length}")
    }
  }

  test("framed: round-trips with compressed and uncompressed chunks") {
    corpora.foreach { d =>
      val f = SnappyBuild.framed(d)
      val out = Snappy.decode(f)
      assert(out != null && java.util.Arrays.equals(out, d),
        s"len=${d.length}")
      // the dispatch surface reads framed files too
      val viaDispatch = graft.expr.Decompress.decode(f)
      assert(viaDispatch != null &&
        java.util.Arrays.equals(viaDispatch, d))
    }
  }

  test("framed: corrupted payload and corrupted CRC both fail closed") {
    val d = ("integrity " * 2000).getBytes("UTF-8")
    val f = SnappyBuild.framed(d)
    val p = f.clone(); p(40) = (p(40) ^ 0x41).toByte
    assert(Snappy.decode(p) == null)
    val c = f.clone(); c(14) = (c(14) ^ 1).toByte // crc field
    assert(Snappy.decode(c) == null)
  }

  test("framed: skippable chunks skip, reserved unskippable fails, id re-validated") {
    val d = "body".getBytes("UTF-8")
    val f = SnappyBuild.framed(d)
    // splice a padding chunk (0xfe) after the identifier
    val pad = Array[Byte](0xfe.toByte, 3, 0, 0, 9, 9, 9)
    val spliced = f.take(10) ++ pad ++ f.drop(10)
    assert(java.util.Arrays.equals(Snappy.decode(spliced), d))
    // a reserved unskippable type (0x02) fails closed
    val bad = f.take(10) ++ Array[Byte](0x02, 1, 0, 0, 0) ++ f.drop(10)
    assert(Snappy.decode(bad) == null)
    // a corrupted repeated stream identifier fails closed
    val reId = f.take(10) ++ f.take(10) ++ f.drop(10)
    assert(java.util.Arrays.equals(Snappy.decode(reId), d))
    val reBad = reId.clone(); reBad(14) = 'x'
    assert(Snappy.decode(reBad) == null)
  }

  test("raw hostiles: declared-length lies, offset escapes, torn varint") {
    // declared longer than produced
    val c = org.xerial.snappy.Snappy.compress("abcdef".getBytes)
    val lie = c.clone(); lie(0) = (lie(0) + 1).toByte
    assert(Snappy.decode(lie) == null)
    // declared shorter: output overrun must fail, not truncate
    val lie2 = c.clone(); lie2(0) = (lie2(0) - 1).toByte
    assert(Snappy.decode(lie2) == null)
    // copy offset beyond produced output
    val escape = Array[Byte](5, 0x00, 'a', 0x0e, 9, 0)
    assert(Snappy.decode(escape) == null)
    // varint that never terminates
    val torn = Array[Byte](0x80.toByte, 0x80.toByte, 0x80.toByte)
    assert(Snappy.decode(torn) == null)
    // truncations of a valid stream
    (1 until c.length).foreach { cut =>
      assert(Snappy.decode(java.util.Arrays.copyOf(c, cut)) == null ||
        cut == c.length)
    }
  }

  test("tar.sz routes through the tar walk") {
    // reuse the fixture tar from Lz4Spec's pattern: one ustar member
    val payload = "sz member".getBytes("UTF-8")
    val hdr = new Array[Byte](512)
    val name = "a.txt".getBytes("UTF-8")
    System.arraycopy(name, 0, hdr, 0, name.length)
    System.arraycopy(("%011o".format(payload.length) + " ")
      .getBytes, 0, hdr, 124, 12)
    java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
    hdr(156) = '0'
    var sum = 0
    hdr.foreach(x => sum += x & 0xff)
    System.arraycopy(("%06o".format(sum) + "  ").getBytes, 0, hdr, 148, 8)
    val tar = new java.io.ByteArrayOutputStream()
    tar.write(hdr); tar.write(payload)
    tar.write(new Array[Byte]((512 - payload.length % 512) % 512))
    tar.write(new Array[Byte](1024))
    val rows = graft.expr.TarEntries.entries(
      SnappyBuild.framed(tar.toByteArray), 8)
    assert(rows != null && rows.numElements() == 1)
    assert(new String(rows.getStruct(0, 3).getBinary(2), "UTF-8") ==
      "sz member")
  }

  test("graft_unsnappy evaluates through SQL and codegen") {
    val spark = SparkSpec.session
    Graft.tune(spark)
    import spark.implicits._
    val raw = org.xerial.snappy.Snappy.compress(
      "sql snappy payload".getBytes("UTF-8"))
    val framed = SnappyBuild.framed("framed payload".getBytes("UTF-8"))
    Seq((raw, framed)).toDF("r", "f").createOrReplaceTempView("sz_docs")
    val row = spark.sql(
      """SELECT CAST(graft_unsnappy(r) AS STRING),
                CAST(graft_decompress(f) AS STRING) FROM sz_docs""")
      .collect()(0)
    assert(row.getString(0) == "sql snappy payload")
    assert(row.getString(1) == "framed payload")
  }
}
