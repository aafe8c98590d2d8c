package graft.sources

import graft.SparkSpec

/** Virtual datasets (layout class 3, HDF5 >= 1.10 -- h5py
  * `VirtualLayout`/`virtual_sources`): the named variable is a MAPPING
  * over real source datasets. Same-file sources ('.') resolve and
  * scatter by serialized dataspace selection; CROSS-FILE sources (the
  * NWP member-file aggregation layout) resolve through a sibling
  * resolver rooted at the granule's directory, with absent members
  * filling their region (HDF5 default VDS view). Bytes-only entry
  * points have no directory context, so cross-file mappings fail
  * loudly there. Printf-pattern ('%b') unlimited-dimension mappings —
  * h5py's member-per-file layout — enumerate members under directory
  * context (first-missing view bounds the extent); bytes-only entry
  * points and malformed bounded '%b' mappings fail loudly.
  */
class Hdf5VdsSpec extends SparkSpec {

  private val h = 5; private val w = 7; private val nT = 3

  private def vars(n: Int) = {
    val lat = Array(40f, 30f, 20f, 10f, 0f)
    val lon = Array(-30f, -20f, -10f, 0f, 10f, 20f, 30f)
    val data = Array.tabulate(n * h * w)(i => if (i % 11 == 0) -9999f else i * 0.25f)
    (Seq("time" -> n, "lat" -> h, "lon" -> w),
      Seq(
        NetCdf.Variable("lat", Seq("lat"), lat, None),
        NetCdf.Variable("lon", Seq("lon"), lon, None),
        NetCdf.Variable("precip", Seq("time", "lat", "lon"), data, Some(-9999f))),
      data)
  }

  test("a virtual stack reads identically to the chunked form; sources are real datasets") {
    val (dims, vs, data) = vars(nT)
    val vds = Hdf5.write(dims, vs, virtualStack = true)
    val f = Hdf5.read(vds)
    val precip = f.datasets.find(_.name == "precip").get
    assert(precip.shape == Seq(nT, h, w))
    assert(precip.data.sameElements(data), "virtual assembly diverged from the source data")
    // the reference layout agrees
    assert(Hdf5.read(Hdf5.write(dims, vs)).datasets.find(_.name == "precip").get
      .data.sameElements(data))
    // each per-timestep source is an ordinary dataset of its slice
    for (k <- 0 until nT) {
      val src = f.datasets.find(_.name == s"precip_src$k").get
      assert(src.shape == Seq(h, w))
      assert(src.data.sameElements(data.slice(k * h * w, (k + 1) * h * w)))
    }
  }

  test("the virtual variable ingests through the production NetCDF path") {
    val (dims, vs, data) = vars(nT)
    val vds = Hdf5.write(dims, vs, virtualStack = true)
    assert(Formats.sniff(vds).map(_.name).contains("netcdf"))
    // variable discovery must NOT surface the mapping sources — they
    // are storage internals of the virtual dataset, and listing them
    // would double-ingest the same pixels once per slice
    assert(Formats.NetCdfDecoder.listVariables(vds) == Seq("precip"))
    val steps = Formats.NetCdfDecoder.decodeMulti(vds)
    assert(steps.size == nT)
    // timestep 1's raster equals the second slice, nodata as NaN
    val r1 = steps(1)._2
    assert(r1.width == w && r1.height == h)
    for (i <- 0 until h * w) {
      val expect = data(h * w + i)
      if (expect == -9999f) assert(r1.data(i).isNaN)
      else assert(r1.data(i) == expect)
    }
  }

  test("cross-file and dangling virtual mappings fail loudly") {
    val (dims, vs, _) = vars(nT)
    val good = Hdf5.write(dims, vs, virtualStack = true)

    // patch the first mapping's source FILE ('.') to another name;
    // the needle is dot, NUL, "/precip_src0", NUL -- unique to the blob
    val srcPath = "/precip_src0".getBytes("UTF-8")
    val cross = good.clone()
    val dotNeedle = Array[Byte]('.'.toByte, 0.toByte) ++ srcPath :+ 0.toByte
    val at = indexOfSlice(cross, dotNeedle)
    assert(at >= 0, "mapping blob not found in fixture bytes")
    cross(at) = 'x'.toByte
    val e1 = intercept[IllegalArgumentException] { Hdf5.read(cross) }
    assert(e1.getMessage.contains("cross-file virtual mapping"), e1.getMessage)

    // patch the mapped dataset PATH to a dangling name (the blob copy
    // only -- the real link names live in the local heap, untouched)
    val dangling = good.clone()
    val pathNeedle = srcPath :+ 0.toByte
    val pAt = indexOfSlice(dangling, pathNeedle)
    assert(pAt >= 0)
    dangling(pAt + srcPath.length - 1) = '9'.toByte // ..._src9: no such link
    val e2 = intercept[IllegalArgumentException] { Hdf5.read(dangling) }
    assert(e2.getMessage.contains("not found"), e2.getMessage)
  }

  // ---- cross-file VDS --------------------------------------------

  /** Member file k: a standalone HDF5 granule holding /precip = slice k. */
  private def memberBytes(data: Array[Float], k: Int): Array[Byte] = {
    val lat = Array(40f, 30f, 20f, 10f, 0f)
    val lon = Array(-30f, -20f, -10f, 0f, 10f, 20f, 30f)
    Hdf5.write(Seq("lat" -> h, "lon" -> w),
      Seq(
        NetCdf.Variable("lat", Seq("lat"), lat, None),
        NetCdf.Variable("lon", Seq("lon"), lon, None),
        NetCdf.Variable("precip", Seq("lat", "lon"),
          data.slice(k * h * w, (k + 1) * h * w), Some(-9999f))))
  }

  private def writeCrossFixture(dir: java.nio.file.Path,
                                members: Seq[(Int, String)]): Array[Float] = {
    val (dims, vs, data) = vars(nT)
    members.foreach { case (k, name) =>
      val p = dir.resolve(name)
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, memberBytes(data, k))
    }
    val vds = Hdf5.write(dims, vs, virtualStack = true,
      virtualCrossFiles = Seq(("m0.h5", "/precip"), ("members/m1.h5", "/precip"),
        ("m2.h5", "/precip")))
    java.nio.file.Files.write(dir.resolve("precip_20240102T00.nc"), vds)
    data
  }

  test("cross-file virtual mappings assemble sibling member files") {
    val dir = java.nio.file.Files.createTempDirectory("vdsx")
    val data = writeCrossFixture(dir,
      Seq(0 -> "m0.h5", 1 -> "members/m1.h5", 2 -> "m2.h5"))
    val vp = dir.resolve("precip_20240102T00.nc").toString
    val f = Hdf5.read(ByteIn.fromPath(vp), Some(Formats.siblingsOf(vp)))
    val precip = f.datasets.find(_.name == "precip").get
    assert(precip.shape == Seq(nT, h, w))
    assert(precip.data.sameElements(data),
      "cross-file virtual assembly diverged from the member data")
    // members are files of their own, NOT datasets of the virtual file
    assert(!f.datasets.exists(_.name.contains("_src")))
  }

  test("an absent member file fills its region (dangling mapping, default VDS view)") {
    val dir = java.nio.file.Files.createTempDirectory("vdsd")
    val data = writeCrossFixture(dir, Seq(0 -> "m0.h5", 2 -> "m2.h5")) // m1 missing
    val vp = dir.resolve("precip_20240102T00.nc").toString
    val f = Hdf5.read(ByteIn.fromPath(vp), Some(Formats.siblingsOf(vp)))
    val precip = f.datasets.find(_.name == "precip").get
    val slice = h * w
    assert(precip.data.slice(0, slice).sameElements(data.slice(0, slice)))
    assert(precip.data.slice(slice, 2 * slice).forall(_ == -9999f),
      "absent member's region must hold the fill value")
    assert(precip.data.slice(2 * slice, 3 * slice)
      .sameElements(data.slice(2 * slice, 3 * slice)))
  }

  test("a cross-file stack ingests through the production directory path") {
    val dir = java.nio.file.Files.createTempDirectory("vdsi")
    val data = writeCrossFixture(dir,
      Seq(0 -> "m0.h5", 1 -> "members/m1.h5", 2 -> "m2.h5"))
    val df = Formats.ingestDir(spark, dir.toString)
    // only the virtual granule matches the glob; members feed it
    assert(df.select("fname").distinct.collect().map(_.getString(0)).toSeq ==
      Seq("precip_20240102T00.nc"))
    val rows = df.collect()
    assert(rows.length == data.count(_ != -9999f))
    // spot-check: timestep 2, pixel (0, 1) carries slice 2's value
    val v201 = rows.find(r => r.getInt(1) == 2 && r.getInt(2) == 0 && r.getInt(3) == 1).get
    assert(v201.getDouble(4) == data(2 * h * w + 1).toDouble)
  }

  test("mapping source names cannot escape the granule directory") {
    val dir = java.nio.file.Files.createTempDirectory("vdse")
    val (dims, vs, _) = vars(nT)
    val evil = Hdf5.write(dims, vs, virtualStack = true,
      virtualCrossFiles = Seq(("../evil.h5", "/precip"), ("m1.h5", "/precip"),
        ("m2.h5", "/precip")))
    val vp = dir.resolve("evil.nc")
    java.nio.file.Files.write(vp, evil)
    val e = intercept[IllegalArgumentException] {
      Hdf5.read(ByteIn.fromPath(vp.toString), Some(Formats.siblingsOf(vp.toString)))
    }
    assert(e.getMessage.contains("escapes the granule directory"), e.getMessage)
    // absolute paths are rejected the same way
    val abs = intercept[IllegalArgumentException] {
      Formats.siblingsOf(vp.toString).apply("/etc/passwd")
    }
    assert(abs.getMessage.contains("escapes"), abs.getMessage)
  }

  test("a granule that both LINKS and virtually MAPS a member surfaces its pixels once") {
    // external link to m0.h5:/precip + cross-file VDS mapping over the
    // same dataset: the link-surfaced variable is the virtual cube's
    // storage internals and must be excluded, or the member's pixels
    // ingest twice (once through the cube, once through the mount)
    val dir = java.nio.file.Files.createTempDirectory("vdsxl")
    val (dims, vs, data) = vars(nT)
    Seq(0 -> "m0.h5", 1 -> "m1.h5", 2 -> "m2.h5").foreach { case (k, name) =>
      java.nio.file.Files.write(dir.resolve(name), memberBytes(data, k))
    }
    val main = Hdf5.write(dims, vs, virtualStack = true,
      virtualCrossFiles = Seq(("m0.h5", "/precip"), ("m1.h5", "/precip"),
        ("m2.h5", "/precip")),
      externalLinks = Seq(("mounted", "m0.h5", "/precip")))
    val vp = dir.resolve("precip_20240102T00.nc")
    java.nio.file.Files.write(vp, main)
    val nf = Hdf5.toNetCdf(ByteIn.fromPath(vp.toString),
      Some(Formats.siblingsOf(vp.toString)))
    val names = nf.vars.map(_.name)
    assert(names.contains("precip"), names.toString)
    assert(!names.contains("mounted"),
      s"link-mounted VDS source must not double-surface: $names")
    // the cube itself still assembles all members
    val precip = nf.vars.find(_.name == "precip").get
    assert(precip.data.sameElements(data))
    // a link to a NON-source dataset in the same member still surfaces
    val main2 = Hdf5.write(dims, vs, virtualStack = true,
      virtualCrossFiles = Seq(("m0.h5", "/precip"), ("m1.h5", "/precip"),
        ("m2.h5", "/precip")),
      externalLinks = Seq(("mlat", "m0.h5", "/lat")))
    val vp2 = dir.resolve("precip2_20240102T00.nc")
    java.nio.file.Files.write(vp2, main2)
    val nf2 = Hdf5.toNetCdf(ByteIn.fromPath(vp2.toString),
      Some(Formats.siblingsOf(vp2.toString)))
    assert(nf2.vars.exists(_.name == "mlat"),
      nf2.vars.map(_.name).toString)
  }

  test("sibling resolution decodes URI-encoded granule paths (spaces in directories)") {
    // binaryFile hands the reader a URI string: a directory with a
    // space arrives percent-encoded, and probing the RAW string would
    // miss every member — an all-fill cube with zero errors
    val dir = java.nio.file.Files.createTempDirectory("vds uri")
    val data = writeCrossFixture(dir,
      Seq(0 -> "m0.h5", 1 -> "members/m1.h5", 2 -> "m2.h5"))
    val uriForm = dir.resolve("precip_20240102T00.nc").toUri.toString
    assert(uriForm.contains("%20"), uriForm) // the fixture really encodes
    val f = Hdf5.read(ByteIn.fromPath(
        dir.resolve("precip_20240102T00.nc").toString),
      Some(Formats.siblingsOf(uriForm)))
    val precip = f.datasets.find(_.name == "precip").get
    assert(precip.data.sameElements(data),
      "URI-encoded granule path must still resolve members (not fill)")
    // present-but-not-a-regular-file member: loud, never silent fill
    val dir2 = java.nio.file.Files.createTempDirectory("vdsbad")
    writeCrossFixture(dir2, Seq(0 -> "m0.h5", 2 -> "m2.h5"))
    java.nio.file.Files.createDirectories(dir2.resolve("members/m1.h5"))
    val vp2 = dir2.resolve("precip_20240102T00.nc").toString
    val e = intercept[Exception] {
      Hdf5.read(ByteIn.fromPath(vp2), Some(Formats.siblingsOf(vp2)))
    }
    assert(e.getMessage.contains("not a") && e.getMessage.contains("readable"),
      e.getMessage)
  }

  test("bounded (non-unlimited) printf mappings fail loudly even with directory context") {
    val dir = java.nio.file.Files.createTempDirectory("vdsp")
    val (dims, vs, _) = vars(nT)
    val pf = Hdf5.write(dims, vs, virtualStack = true,
      virtualCrossFiles = Seq(("m%b.h5", "/precip"), ("m1.h5", "/precip"),
        ("m2.h5", "/precip")))
    val vp = dir.resolve("pf.nc")
    java.nio.file.Files.write(vp, pf)
    val e = intercept[IllegalArgumentException] {
      Hdf5.read(ByteIn.fromPath(vp.toString), Some(Formats.siblingsOf(vp.toString)))
    }
    assert(e.getMessage.contains("printf-pattern"), e.getMessage)
  }

  // ---- printf-pattern ('%b') unlimited-dimension VDS ---------------

  private def writePrintfFixture(dir: java.nio.file.Path, pattern: String,
                                 memberKs: Seq[Int]): Array[Float] = {
    val (dims, vs, data) = vars(nT)
    memberKs.foreach { k =>
      val p = dir.resolve(pattern.replace("%b", k.toString))
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, memberBytes(data, k))
    }
    val vds = Hdf5.write(dims, vs, virtualStack = true,
      virtualPrintf = Some(pattern))
    java.nio.file.Files.write(dir.resolve("precip_20240102T00.nc"), vds)
    data
  }

  test("printf-pattern VDS enumerates members under directory context") {
    val dir = java.nio.file.Files.createTempDirectory("vdspf")
    val data = writePrintfFixture(dir, "m%b.h5", Seq(0, 1, 2))
    val vp = dir.resolve("precip_20240102T00.nc").toString
    val f = Hdf5.read(ByteIn.fromPath(vp), Some(Formats.siblingsOf(vp)))
    val precip = f.datasets.find(_.name == "precip").get
    // the DECLARED extent is 0 along the unlimited dim — the shape
    // must come from enumeration
    assert(precip.shape == Seq(nT, h, w), precip.shape.toString)
    assert(precip.data.sameElements(data),
      "printf-pattern virtual assembly diverged from the member data")
  }

  test("printf extent stops at the first missing member (no silent gap fill)") {
    val dir = java.nio.file.Files.createTempDirectory("vdspfg")
    val data = writePrintfFixture(dir, "m%b.h5", Seq(0, 2)) // m1 missing
    val vp = dir.resolve("precip_20240102T00.nc").toString
    val f = Hdf5.read(ByteIn.fromPath(vp), Some(Formats.siblingsOf(vp)))
    val precip = f.datasets.find(_.name == "precip").get
    assert(precip.shape == Seq(1, h, w),
      s"first-missing view must bound the extent at member 0, got ${precip.shape}")
    assert(precip.data.sameElements(data.slice(0, h * w)))
  }

  test("printf with zero members and bytes-only printf reads are loud") {
    val dir = java.nio.file.Files.createTempDirectory("vdspf0")
    writePrintfFixture(dir, "m%b.h5", Seq(0)) // write main, then delete m0
    java.nio.file.Files.delete(dir.resolve("m0.h5"))
    val vp = dir.resolve("precip_20240102T00.nc").toString
    val e0 = intercept[IllegalArgumentException] {
      Hdf5.read(ByteIn.fromPath(vp), Some(Formats.siblingsOf(vp)))
    }
    assert(e0.getMessage.contains("resolved no members"), e0.getMessage)
    // bytes-only: no directory context to enumerate
    val bytes = java.nio.file.Files.readAllBytes(dir.resolve("precip_20240102T00.nc"))
    val e1 = intercept[IllegalArgumentException] { Hdf5.read(bytes) }
    assert(e1.getMessage.contains("needs directory context"), e1.getMessage)
  }

  test("printf granules ingest through the production directory path") {
    val dir = java.nio.file.Files.createTempDirectory("vdspfi")
    val data = writePrintfFixture(dir, "members/m%b.h5", Seq(0, 1, 2))
    val df = Formats.ingestDir(spark, dir.toString)
    assert(df.select("fname").distinct.collect().map(_.getString(0)).toSeq ==
      Seq("precip_20240102T00.nc"))
    val rows = df.collect()
    assert(rows.length == data.count(_ != -9999f))
    val v201 = rows.find(r => r.getInt(1) == 2 && r.getInt(2) == 0 && r.getInt(3) == 1).get
    assert(v201.getDouble(4) == data(2 * h * w + 1).toDouble)
  }

  private def indexOfSlice(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 0
    while (i + needle.length <= hay.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }
}
