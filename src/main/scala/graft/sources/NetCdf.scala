package graft.sources

import java.nio.ByteBuffer

/** Minimal NetCDF classic (CDF-1) codec: float variables on
  * (time?, lat, lon) dimensions with coordinate variables and a
  * `_FillValue` attribute mapped to NaN — the reference's NetCDF
  * surface (formats/netcdf.py:33-366: variable list, time-dim
  * detection, rectilinear grids, _FillValue→NaN). Written from the
  * public NetCDF classic format specification (magic `CDF\x01`,
  * big-endian headers + contiguous aligned data).
  *
  * Multi-timestep files explode to one grid per timestep at ingest,
  * matching SURVEY S3.
  */
object NetCdf {

  case class Variable(name: String, dims: Seq[String], data: Array[Float],
                      fill: Option[Float])
  case class File(dims: Seq[(String, Int)], vars: Seq[Variable]) {
    def dimSize(n: String): Int = dims.find(_._1 == n).get._2

    /** Decode one variable to rasters (one per timestep), using lat/lon
      * coordinate variables for georeferencing (descending lat =
      * north-up rows). */
    def rasters(varName: String): Seq[(Int, GeoTiff.Raster)] = {
      val v = vars.find(_.name == varName).getOrElse(
        throw new IllegalArgumentException(s"no variable $varName"))
      val lat = vars.find(_.name == "lat").get.data
      val lon = vars.find(_.name == "lon").get.data
      val h = lat.length; val w = lon.length
      val py = math.abs(lat(0) - lat(1)).toDouble
      val px = math.abs(lon(1) - lon(0)).toDouble
      val north = lat.max + py / 2; val west = lon.min - px / 2
      val northUp = lat(0) > lat(1)
      val nT = if (v.dims.size == 3) dimSize(v.dims.head) else 1
      (0 until nT).map { t =>
        val slice = new Array[Float](w * h)
        for (y <- 0 until h; x <- 0 until w) {
          val srcY = if (northUp) y else h - 1 - y
          val raw = v.data(t * w * h + srcY * w + x)
          slice(y * w + x) =
            if (v.fill.exists(f => f == raw)) Float.NaN else raw
        }
        t -> GeoTiff.Raster(w, h, slice, west, north, px, py)
      }
    }
  }

  def canHandle(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == 'C' && b(1) == 'D' && b(2) == 'F' && b(3) == 1

  /** Dispatch on magic: classic CDF-1 or NetCDF-4 (HDF5 container,
    * decoded natively by Hdf5 and assembled through the dimension-scale
    * conventions into the same model). */
  def readAny(bytes: Array[Byte]): File =
    if (Hdf5.canHandle(bytes)) Hdf5.toNetCdf(bytes) else read(bytes)

  private val NC_DIMENSION = 10
  private val NC_VARIABLE = 11
  private val NC_ATTRIBUTE = 12
  private val NC_FLOAT = 5

  // ---- encode ------------------------------------------------------

  /** Write dims + float variables (row-major, time-major). */
  def write(dims: Seq[(String, Int)], variables: Seq[Variable]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Unit = {
      out.write(v >> 24); out.write((v >> 16) & 0xff)
      out.write((v >> 8) & 0xff); out.write(v & 0xff)
    }
    def name(s: String): Unit = {
      u32(s.length); out.write(s.getBytes)
      val pad = (4 - s.length % 4) % 4
      (0 until pad).foreach(_ => out.write(0))
    }
    out.write("CDF".getBytes); out.write(1) // magic + version
    u32(0) // numrecs
    // dim_list
    u32(NC_DIMENSION); u32(dims.size)
    dims.foreach { case (n, sz) => name(n); u32(sz) }
    u32(0); u32(0) // no global attributes (ABSENT)
    // var_list — compute header size first to lay out offsets
    def varHeaderSize(v: Variable): Int = {
      def nameSz(s: String) = 4 + s.length + (4 - s.length % 4) % 4
      nameSz(v.name) + 4 + 4 * v.dims.size +
        (if (v.fill.isDefined) 8 + nameSz("_FillValue") + 8 + 4 else 8) +
        4 + 4 + 4 // type, vsize, begin
    }
    val fixed = out.size() + 8 + variables.map(varHeaderSize).sum
    var begin = fixed
    val begins = variables.map { v =>
      val b = begin
      begin += v.data.length * 4
      b
    }
    u32(NC_VARIABLE); u32(variables.size)
    for ((v, b) <- variables.zip(begins)) {
      name(v.name)
      u32(v.dims.size)
      v.dims.foreach(d => u32(dims.indexWhere(_._1 == d)))
      v.fill match {
        case Some(f) =>
          u32(NC_ATTRIBUTE); u32(1)
          name("_FillValue"); u32(NC_FLOAT); u32(1)
          u32(java.lang.Float.floatToIntBits(f))
        case None => u32(0); u32(0)
      }
      u32(NC_FLOAT)
      u32(v.data.length * 4) // vsize
      u32(b) // begin
    }
    require(out.size() == fixed, s"header layout mismatch ${out.size()} vs $fixed")
    variables.foreach(_.data.foreach(f => u32(java.lang.Float.floatToIntBits(f))))
    out.toByteArray
  }

  // ---- decode ------------------------------------------------------

  def read(bytes: Array[Byte]): File = {
    require(canHandle(bytes), "not NetCDF classic")
    val bb = ByteBuffer.wrap(bytes) // big-endian by default
    bb.position(4)
    bb.getInt // numrecs
    def name(): String = {
      val len = bb.getInt
      val s = new Array[Byte](len); bb.get(s)
      bb.position(bb.position() + (4 - len % 4) % 4)
      new String(s)
    }
    // dims
    val dimTag = bb.getInt; val nDims = bb.getInt
    require(dimTag == NC_DIMENSION || (dimTag == 0 && nDims == 0))
    val dims = (0 until nDims).map(_ => (name(), bb.getInt))
    // global atts (ABSENT = two zeros)
    val gaTag = bb.getInt; val nGa = bb.getInt
    require(gaTag == NC_ATTRIBUTE || (gaTag == 0 && nGa == 0))
    require(nGa == 0, "global attributes not supported")
    // vars
    val vTag = bb.getInt; val nVars = bb.getInt
    require(vTag == NC_VARIABLE || (vTag == 0 && nVars == 0))
    val metas = (0 until nVars).map { _ =>
      val vn = name()
      val nd = bb.getInt
      val vdims = (0 until nd).map(i => dims(bb.getInt)._1)
      val aTag = bb.getInt; val nAtts = bb.getInt
      var fill: Option[Float] = None
      require(aTag == NC_ATTRIBUTE || (aTag == 0 && nAtts == 0))
      for (_ <- 0 until nAtts) {
        val an = name(); val at = bb.getInt; val ac = bb.getInt
        val sz = at match {
          case NC_FLOAT => 4 * ac
          case 2 => ac + (4 - ac % 4) % 4 // NC_CHAR padded
          case 4 => 4 * ac // NC_INT
          case 6 => 8 * ac // NC_DOUBLE
          case _ => 4 * ac
        }
        if (an == "_FillValue" && at == NC_FLOAT && ac == 1)
          fill = Some(java.lang.Float.intBitsToFloat(bb.getInt))
        else bb.position(bb.position() + sz)
      }
      val typ = bb.getInt
      require(typ == NC_FLOAT, s"only float variables supported, got $typ")
      val vsize = bb.getInt
      val begin = bb.getInt
      (vn, vdims, fill, vsize, begin)
    }
    val variables = metas.map { case (vn, vdims, fill, vsize, begin) =>
      val n = vsize / 4
      val data = new Array[Float](n)
      var i = 0
      while (i < n) { data(i) = bb.getFloat(begin + i * 4); i += 1 }
      Variable(vn, vdims, data, fill)
    }
    File(dims, variables)
  }
}
