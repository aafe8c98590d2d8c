package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Positional-read source shared by the container codecs (HDF5,
  * GeoTIFF): a whole-file byte array (the binaryFile ingest path) or
  * a SeekableByteChannel behind an LRU page cache — granules beyond
  * JVM array addressing (multi-GiB NetCDF-4 / BigTIFF), which the
  * reference reaches through h5netcdf/rasterio lazy reads. Multi-byte
  * reads honor [[order]] (TIFF carries its own byte order in the
  * header; HDF5 is little-endian), with explicit BE/LE helpers for
  * fields that ignore it. */
final class ByteIn private (arr: Array[Byte],
                            ch: java.nio.channels.SeekableByteChannel,
                            val length: Long) {
  private var order: ByteOrder = ByteOrder.LITTLE_ENDIAN
  private val abb = if (arr == null) null else ByteBuffer.wrap(arr)

  /** Set the container's byte order once sniffed (TIFF `II`/`MM`). */
  def setOrder(o: ByteOrder): ByteIn = { order = o; this }
  def byteOrder: ByteOrder = order

  private val PageShift = 20 // 1 MiB pages
  private val PageSize = 1 << PageShift
  private val pages = new java.util.LinkedHashMap[Long, Array[Byte]](16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[Long, Array[Byte]]): Boolean = size > 64
  }
  private def page(pi: Long): Array[Byte] = {
    val got = pages.get(pi)
    if (got != null) got
    else {
      val at = pi << PageShift
      val len = math.min(PageSize.toLong, length - at).toInt
      val buf = ByteBuffer.allocate(len)
      ch.position(at)
      while (buf.hasRemaining)
        require(ch.read(buf) >= 0, s"channel EOF at ${at + buf.position()}")
      val a = buf.array()
      pages.put(pi, a)
      a
    }
  }
  private def chk(a: Long, n: Int): Unit =
    // compare as a > length - n: a corrupt near-Long.MaxValue address
    // would wrap a + n negative and slip past the additive form
    if (a < 0 || n > length || a > length - n) throw new IllegalArgumentException(
      s"address $a out of range (file is $length bytes)")

  def apply(a: Long): Byte = {
    chk(a, 1)
    if (arr != null) arr(a.toInt)
    else page(a >> PageShift)((a & (PageSize - 1)).toInt)
  }
  def slice(a: Long, len: Int): Array[Byte] = {
    require(len >= 0, s"negative slice length $len")
    chk(a, len)
    if (arr != null) java.util.Arrays.copyOfRange(arr, a.toInt, a.toInt + len)
    else {
      val out = new Array[Byte](len)
      var done = 0
      while (done < len) {
        val at = a + done
        val p = page(at >> PageShift)
        val po = (at & (PageSize - 1)).toInt
        val n = math.min(len - done, p.length - po)
        System.arraycopy(p, po, out, done, n)
        done += n
      }
      out
    }
  }
  private def buf(a: Long, n: Int, o: ByteOrder): ByteBuffer =
    if (arr != null) { chk(a, n); abb.order(o) }
    else ByteBuffer.wrap(slice(a, n)).order(o)
  private def pos(a: Long): Int = if (arr != null) a.toInt else 0
  def getShort(a: Long): Short = buf(a, 2, order).getShort(pos(a))
  def getInt(a: Long): Int = buf(a, 4, order).getInt(pos(a))
  def getLong(a: Long): Long = buf(a, 8, order).getLong(pos(a))
  def getFloat(a: Long): Float = buf(a, 4, order).getFloat(pos(a))
  def getDouble(a: Long): Double = buf(a, 8, order).getDouble(pos(a))
  def getIntBE(a: Long): Int = buf(a, 4, ByteOrder.BIG_ENDIAN).getInt(pos(a))
  def getLongBE(a: Long): Long = buf(a, 8, ByteOrder.BIG_ENDIAN).getLong(pos(a))
  def string(a: Long, len: Int): String = new String(slice(a, len), "UTF-8")
  def close(): Unit = if (ch != null) ch.close()
}

object ByteIn {
  def apply(bytes: Array[Byte]): ByteIn = new ByteIn(bytes, null, bytes.length.toLong)
  /** Open a file for positional reads (any size; pages cached). The
    * caller closes. */
  def fromPath(path: String): ByteIn = {
    val ch = java.nio.file.Files.newByteChannel(java.nio.file.Paths.get(path))
    new ByteIn(null, ch, ch.size())
  }
}
