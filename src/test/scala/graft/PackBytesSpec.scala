package graft

import org.apache.spark.sql.functions._

/** Focused equivalence spec for the r16 fixture-packing kernel
  * (expr/PackBytes): graft_pack_bytes must emit exactly the bytes the
  * composed hex pipelines produced — width-1 packing ≡
  * unhex(array_join(transform(..., lpad(hex(v), 2, '0')), '')),
  * width-2 LE ≡ the per-sample low/high lpad∘hex concat, and hex()
  * of the packed buffer ≡ the per-byte hex join (the in-plan fixture
  * builders rely on each identity).
  */
class PackBytesSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("width-1 pack ≡ unhex(per-byte lpad∘hex join) on random arrays") {
    for (_ <- 1 to 10) {
      val xs = Seq.fill(rnd.nextInt(50))(rnd.nextInt(256).toLong)
      val df = Seq(Tuple1(xs)).toDF("a")
      val got = df.selectExpr("graft_pack_bytes(a, 1)")
        .collect()(0).getAs[Array[Byte]](0)
      val ref = df.selectExpr(
        "unhex(array_join(transform(a, v -> lpad(hex(v), 2, '0')), ''))")
        .collect()(0).getAs[Array[Byte]](0)
      assert(got.toSeq == ref.toSeq, s"xs=$xs")
    }
  }

  test("width-2 LE pack ≡ low/high lpad∘hex pipeline on 16-bit values") {
    val xs = Seq.fill(40)(rnd.nextInt(65536).toLong)
    val df = Seq(Tuple1(xs)).toDF("a")
    val got = df.selectExpr("graft_pack_bytes(a, 2)")
      .collect()(0).getAs[Array[Byte]](0)
    val ref = df.selectExpr(
      """unhex(array_join(transform(a, v ->
           concat(lpad(hex(pmod(v, 256)), 2, '0'),
                  lpad(hex(cast(v as int) >> 8), 2, '0'))), ''))""")
      .collect()(0).getAs[Array[Byte]](0)
    assert(got.toSeq == ref.toSeq)
  }

  test("hex(width-1 pack) ≡ per-byte hex join (the hex-composed builders)") {
    val xs = Seq.fill(30)(rnd.nextInt(256).toLong)
    val df = Seq(Tuple1(xs)).toDF("a")
    val got = df.selectExpr("hex(graft_pack_bytes(a, 1))")
      .collect()(0).getString(0)
    val ref = df.selectExpr(
      "array_join(transform(a, v -> lpad(hex(v), 2, '0')), '')")
      .collect()(0).getString(0)
    assert(got == ref)
  }

  test("big-endian width-4 ≡ unhex(lpad(hex(v), 8, '0'))") {
    val xs = Seq(0L, 1L, 255L, 65535L, 16777215L, 4294967295L)
    val df = Seq(Tuple1(xs)).toDF("a")
    val got = df.selectExpr("graft_pack_bytes(a, 4, 1)")
      .collect()(0).getAs[Array[Byte]](0)
    val ref = df.selectExpr(
      "unhex(array_join(transform(a, v -> lpad(hex(v), 8, '0')), ''))")
      .collect()(0).getAs[Array[Byte]](0)
    assert(got.toSeq == ref.toSeq)
  }

  test("null array → null; empty array → empty binary") {
    val df = Seq((1L, null.asInstanceOf[Seq[Long]]), (2L, Seq.empty[Long]))
      .toDF("k", "a")
    val rows = df.selectExpr("k", "graft_pack_bytes(a, 1)").collect()
    assert(rows.find(_.getLong(0) == 1L).get.isNullAt(1))
    assert(rows.find(_.getLong(0) == 2L).get.getAs[Array[Byte]](1).isEmpty)
  }
}
