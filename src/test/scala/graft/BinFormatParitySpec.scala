package graft

import graft.functions.BinEncodeRT
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Byte-level parity with the reference's BIN viewer format
 * (geomesa-filter/src/test/.../function/Convert2ViewerFunctionTest.scala
 * and Convert2ViewerFunction.scala): 16-byte basic records laid out
 * track-hash/seconds/lat/lon little-endian, the 24-byte "reachback" form
 * with a trailing 64-bit label, Java String.hashCode as the track key,
 * second-truncated times, and convert2viewer's first-8-id-bytes label
 * packing. The wire layout is asserted against hand-built reference bytes,
 * not just our own decode (a self-roundtrip can't see a layout swap).
 */
class BinFormatParitySpec extends SparkSpec {

  private def u(s: String) = UTF8String.fromString(s)

  test("wire layout matches the reference put(): id @0, sec @4, lat @8, lon @12 LE") {
    val dtg = 1404100800000L // 2014-06-30T04:00:00Z, millis
    val got = BinEncodeRT.encode("1200".hashCode, 45.0f, 49.0f, dtg / 1000)
    // Convert2ViewerFunction.put (:119-135): putInt(trackId.hashCode),
    // putInt((dtg/1000).toInt), putFloat(lat), putFloat(lon) — all LE
    val want = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt("1200".hashCode).putInt((dtg / 1000).toInt)
      .putFloat(45.0f).putFloat(49.0f).array()
    assert(got.toSeq === want.toSeq)
  }

  test("encode and decode simple attributes (Convert2ViewerFunctionTest:31-40)") {
    val dtg = System.currentTimeMillis()
    val encoded = BinEncodeRT.encode("1200".hashCode, 45.0f, 49.0f, dtg / 1000)
    assert(encoded.length === 16)
    assert(BinEncodeRT.decodeLat(encoded) === 45.0f)
    assert(BinEncodeRT.decodeLon(encoded) === 49.0f)
    // dates truncate to the nearest second
    assert(math.abs(BinEncodeRT.decodeSec(encoded) * 1000L - dtg) < 1000L)
    assert(BinEncodeRT.decodeId(encoded) === "1200".hashCode)
  }

  test("encode and decode optional simple attributes (Convert2ViewerFunctionTest:42-51)") {
    // a missing track id writes 0 (reference trackId.getOrElse(0)); the
    // decoder maps 0 back to None
    val encoded = BinEncodeRT.encode(0, 45.0f, 49.0f, 1L)
    assert(encoded.length === 16)
    assert(BinEncodeRT.decodeId(encoded) === 0)
  }

  test("encode and decode extended attributes (Convert2ViewerFunctionTest:53-69)") {
    val dtg = System.currentTimeMillis()
    val encoded = BinEncodeRT.encodeExt("1200".hashCode, 45.0f, 49.0f, dtg / 1000, 10L)
    assert(encoded.length === 24)
    assert(BinEncodeRT.decodeLat(encoded) === 45.0f)
    assert(BinEncodeRT.decodeLon(encoded) === 49.0f)
    assert(math.abs(BinEncodeRT.decodeSec(encoded) * 1000L - dtg) < 1000L)
    assert(BinEncodeRT.decodeId(encoded) === "1200".hashCode)
    assert(BinEncodeRT.decodeLabel(encoded) === 10L)
  }

  test("encode and decode to an output stream (Convert2ViewerFunctionTest:71-105)") {
    val time = System.currentTimeMillis()
    val one = BinEncodeRT.encodeExt("1200".hashCode, 45.0f, 49.0f, time / 1000, 1000L)
    val two = BinEncodeRT.encodeExt("1201".hashCode, 45.0f, 49.0f, (time - 100) / 1000, 3000L)
    val array = one ++ two
    assert(array.length === 48)
    val (aOne, aTwo) = array.splitAt(24)
    assert(BinEncodeRT.decodeId(aOne) === "1200".hashCode)
    assert(BinEncodeRT.decodeLabel(aOne) === 1000L)
    assert(BinEncodeRT.decodeId(aTwo) === "1201".hashCode)
    assert(BinEncodeRT.decodeLabel(aTwo) === 3000L)
    assert(BinEncodeRT.decodeLat(aTwo) === 45.0f && BinEncodeRT.decodeLon(aTwo) === 49.0f)
  }

  test("convert2viewer id->label packing (Convert2ViewerFunction.scala:43)") {
    // label = id.getBytes.take(8).zipWithIndex.map((b,i) => (b&0xff)<<(8*i)).sum
    def refLabel(id: String): Long =
      id.getBytes.take(8).zipWithIndex.map { case (b, i) => (b & 0xffL) << (8 * i) }.sum
    for (id <- Seq("1200", "a", "12345678", "123456789longer", "")) {
      assert(BinEncodeRT.idLabel(u(id)) === refLabel(id), s"id=$id")
    }
  }

  test("DataFrame surface: toBin/toBinExt/fromBin round-trip with reference track keys") {
    import spark.implicits._
    val df = Seq(("fid-1", 45.0, 49.0, 1404100800L), ("fid-2", -78.5, 38.0, 1404100860L))
      .toDF("fid", "lat", "lon", "sec")
    // basic: 16-byte records, label decodes null, id_hash is String.hashCode
    val basic = graft.sources.IngestExport.fromBin(
      graft.sources.IngestExport.toBin(df, col("fid"), col("lat"), col("lon"), col("sec")),
      "bin").orderBy("sec").collect()
    assert(basic.map(_.getInt(0)).toSeq === Seq("fid-1".hashCode, "fid-2".hashCode))
    assert(basic.forall(_.isNullAt(4)))
    assert(basic.map(_.getFloat(1)).toSeq === Seq(45.0f, -78.5f))
    // extended: the label column survives the 24-byte round trip
    val ext = graft.sources.IngestExport.fromBin(
      graft.sources.IngestExport.toBinExt(df, col("fid"), col("lat"), col("lon"),
        col("sec"), lit(7L) * col("sec")), "bin").orderBy("sec").collect()
    assert(ext.map(_.getLong(4)).toSeq === Seq(7L * 1404100800L, 7L * 1404100860L))
  }

  test("a null id writes track key 0, not a null record (reference getOrElse(0))") {
    import spark.implicits._
    val df = Seq((Option.empty[String], 45.0, 49.0, 5L), (Some("t1"), 1.0, 2.0, 6L))
      .toDF("fid", "lat", "lon", "sec")
    val got = graft.sources.IngestExport.fromBin(
      graft.sources.IngestExport.toBin(df, col("fid"), col("lat"), col("lon"), col("sec")),
      "bin").orderBy("sec").collect()
    assert(got.length === 2) // the null-id row is still a record
    assert(got.head.getInt(0) === 0)
    assert(got(1).getInt(0) === "t1".hashCode)
  }
}
