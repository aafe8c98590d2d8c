package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The properties that make aHash a usable image near-dup fingerprint. */
class AhashSpec extends SparkSpec {
  import spark.implicits._

  private def hashOf(media: Seq[Multimodal.Media]): Map[Long, (Long, Long)] = {
    val ds = spark.createDataset(media)
    Multimodal.imageAhash(ds, 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }
  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
  private def img(id: Long, w: Int, h: Int, f: (Int, Int) => Int) =
    Multimodal.Media(id, "image", MediaCodecs.pngPattern(w, h, f))

  test("constant brightness shift leaves the hash bit-identical") {
    def scene(x: Int, y: Int) = (x * 7 + y * 3 + (x * y) % 31) % 200
    val m = hashOf(Seq(
      img(1L, 64, 64, scene),
      img(2L, 64, 64, (x, y) => scene(x, y) + 50)))
    assert(m(1L) == m(2L))
  }

  test("2x downsample of the same scene stays within small hamming distance") {
    def scene(x: Int, y: Int) = (x * 5 + y * 11 + (x / 4) * (y / 4)) % 256
    val m = hashOf(Seq(
      img(1L, 64, 64, scene),
      img(2L, 32, 32, (x, y) => scene(2 * x, 2 * y))))
    val d = hamming(m(1L), m(2L))
    assert(d <= 10, s"downsample moved $d of 64 bits")
  }

  test("unrelated scenes land far apart") {
    val m = hashOf(Seq(
      img(1L, 64, 64, (x, y) => (x * 31 + y * 17) % 256),
      img(2L, 64, 64, (x, y) => ((63 - x) * 13 + (63 - y) * 29) % 256)))
    val d = hamming(m(1L), m(2L))
    assert(d >= 16, s"unrelated scenes only $d bits apart")
  }

  test("a JPEG re-encode of the same scene hashes within small hamming distance") {
    // the aHash robustness claim across the codecs the corpus carries:
    // identical content as lossless PNG vs near-lossless baseline JPEG
    def scene(x: Int, y: Int) = (x * 7 + y * 3 + (x * y) % 31) % 200
    val w = 64; val h = 64
    val gray = Array.tabulate(w * h)(i => scene(i % w, i / w).toByte)
    val jpeg = graft.sources.JpegCodec.encode(
      graft.sources.JpegCodec.Image(w, h, 1, gray))
    val m = hashOf(Seq(
      img(1L, w, h, scene),
      Multimodal.Media(2L, "image", jpeg)))
    val d = hamming(m(1L), m(2L))
    assert(d <= 4, s"JPEG re-encode moved $d of 64 bits")
  }

  test("resizeNearest decodes JPEG payloads through the same partition-local pass") {
    val w = 32; val h = 16
    val gray = Array.tabulate(w * h)(i => ((i * 5) % 256).toByte)
    val jpeg = graft.sources.JpegCodec.encode(
      graft.sources.JpegCodec.Image(w, h, 1, gray))
    val ds = spark.createDataset(Seq(Multimodal.Media(9L, "image", jpeg)))
    val r = Multimodal.resizeNearest(ds, 2).collect()(0)
    assert(r.getInt(1) == 16 && r.getInt(2) == 8)
    assert(r.getLong(3) > 0L)
  }
}
