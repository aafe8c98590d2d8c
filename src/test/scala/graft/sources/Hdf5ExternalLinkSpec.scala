package graft.sources

import graft.SparkSpec

/** External links (H5L class 64 — the mount-like aggregation layout):
  * the target object lives in a SIBLING file, resolved through the
  * same directory-rooted resolver as cross-file VDS. Dangling targets
  * skip like soft links; bytes-only entry points fail loudly. */
class Hdf5ExternalLinkSpec extends SparkSpec {

  private val h = 5; private val w = 7
  private val lat = Array(40f, 30f, 20f, 10f, 0f)
  private val lon = Array(-30f, -20f, -10f, 0f, 10f, 20f, 30f)

  private def memberBytes(offset: Float, subgroup: Option[String] = None): Array[Byte] =
    Hdf5.write(Seq("lat" -> h, "lon" -> w),
      Seq(
        NetCdf.Variable("lat", Seq("lat"), lat, None),
        NetCdf.Variable("lon", Seq("lon"), lon, None),
        NetCdf.Variable("precip", Seq("lat", "lon"),
          Array.tabulate(h * w)(i => offset + i), None)),
      subgroup = subgroup)

  private def mainBytes(links: Seq[(String, String, String)]): Array[Byte] =
    Hdf5.write(Seq("lat" -> h, "lon" -> w),
      Seq(
        NetCdf.Variable("lat", Seq("lat"), lat, None),
        NetCdf.Variable("lon", Seq("lon"), lon, None),
        NetCdf.Variable("local", Seq("lat", "lon"),
          Array.tabulate(h * w)(_.toFloat), None)),
      externalLinks = links)

  test("an external link surfaces the sibling's dataset under the link's name") {
    val dir = java.nio.file.Files.createTempDirectory("h5ext")
    java.nio.file.Files.write(dir.resolve("m0.h5"), memberBytes(1000f))
    val main = dir.resolve("main.nc")
    java.nio.file.Files.write(main, mainBytes(Seq(("mounted", "m0.h5", "/precip"))))
    val f = Hdf5.read(ByteIn.fromPath(main.toString),
      Some(Formats.siblingsOf(main.toString)))
    val names = f.datasets.map(_.name)
    assert(names.contains("local") && names.contains("mounted"), names.toString)
    val mounted = f.datasets.find(_.name == "mounted").get
    assert(mounted.shape == Seq(h, w))
    assert(mounted.data(3) == 1003f)
  }

  test("an external link to a sibling GROUP surfaces its children") {
    val dir = java.nio.file.Files.createTempDirectory("h5extg")
    java.nio.file.Files.write(dir.resolve("m1.h5"),
      memberBytes(2000f, subgroup = Some("inner")))
    val main = dir.resolve("main.nc")
    java.nio.file.Files.write(main, mainBytes(Seq(("ext", "m1.h5", "/inner"))))
    val f = Hdf5.read(ByteIn.fromPath(main.toString),
      Some(Formats.siblingsOf(main.toString)))
    val sub = f.datasets.filter(_.name.startsWith("ext/"))
    assert(sub.map(_.name) == Seq("ext/precip"), f.datasets.map(_.name).toString)
    assert(sub.head.data(0) == 2000f)
  }

  test("dangling external targets skip; bytes-only reads are loud") {
    val dir = java.nio.file.Files.createTempDirectory("h5extd")
    val main = dir.resolve("main.nc")
    // absent file AND present-file-dangling-path both skip
    java.nio.file.Files.write(dir.resolve("m2.h5"), memberBytes(0f))
    java.nio.file.Files.write(main, mainBytes(Seq(
      ("gone", "absent.h5", "/precip"), ("nopath", "m2.h5", "/missing"))))
    val f = Hdf5.read(ByteIn.fromPath(main.toString),
      Some(Formats.siblingsOf(main.toString)))
    assert(!f.datasets.exists(d => d.name.startsWith("gone") || d.name.startsWith("nopath")))
    assert(f.datasets.exists(_.name == "local"))
    // without directory context the SAME file is loud, not silently partial
    val e = intercept[IllegalArgumentException] {
      Hdf5.read(java.nio.file.Files.readAllBytes(main))
    }
    assert(e.getMessage.contains("needs directory context"), e.getMessage)
  }

  test("a mounted dataset from a DIFFERENTLY-laid-out sibling binds dims by size, not by address collision") {
    // the sibling carries an extra leading variable, so its object
    // addresses do NOT coincide with the main file's — a bare-address
    // DIMENSION_LIST map would either throw or silently bind to the
    // wrong main-file dataset
    val dir = java.nio.file.Files.createTempDirectory("h5extl")
    val shifted = Hdf5.write(Seq("lat" -> h, "lon" -> w),
      Seq(
        NetCdf.Variable("aaa_pad", Seq("lat", "lon"),
          Array.fill(h * w)(7f), None),
        NetCdf.Variable("lat", Seq("lat"), lat, None),
        NetCdf.Variable("lon", Seq("lon"), lon, None),
        NetCdf.Variable("precip", Seq("lat", "lon"),
          Array.tabulate(h * w)(i => 5000f + i), None)))
    java.nio.file.Files.write(dir.resolve("ms.h5"), shifted)
    val main = dir.resolve("main.nc")
    java.nio.file.Files.write(main, mainBytes(Seq(("mounted", "ms.h5", "/precip"))))
    val f = NetCdf.readAny(java.nio.file.Files.readAllBytes(main),
      Some(Formats.siblingsOf(main.toString)))
    val mounted = f.vars.find(_.name == "mounted").get
    assert(mounted.dims == Seq("lat", "lon"), mounted.dims.toString)
    assert(mounted.data(3) == 5003f)
  }

  test("a sibling's OWN external links resolve relative to its directory") {
    val dir = java.nio.file.Files.createTempDirectory("h5extn")
    java.nio.file.Files.createDirectories(dir.resolve("members"))
    java.nio.file.Files.write(dir.resolve("members/m2.h5"), memberBytes(4000f))
    // m1 lives in members/ and links its sibling by BARE name — the
    // libhdf5 referring-file-relative search
    java.nio.file.Files.write(dir.resolve("members/m1.h5"),
      mainBytes(Seq(("hop", "m2.h5", "/precip"))))
    val main = dir.resolve("main.nc")
    java.nio.file.Files.write(main, mainBytes(Seq(("nest", "members/m1.h5", "/"))))
    val f = Hdf5.read(ByteIn.fromPath(main.toString),
      Some(Formats.siblingsOf(main.toString)))
    val hopped = f.datasets.find(_.name == "nest/hop").get
    assert(hopped.data(0) == 4000f,
      s"nested link resolved against the wrong directory: ${f.datasets.map(_.name)}")
  }

  test("a virtual stack inside a linked sibling still excludes its sources") {
    val dir = java.nio.file.Files.createTempDirectory("h5extv")
    val nT = 2
    val stack = Hdf5.write(
      Seq("time" -> nT, "lat" -> h, "lon" -> w),
      Seq(NetCdf.Variable("lat", Seq("lat"), lat, None),
        NetCdf.Variable("lon", Seq("lon"), lon, None),
        NetCdf.Variable("precip", Seq("time", "lat", "lon"),
          Array.tabulate(nT * h * w)(i => i * 0.5f), None)),
      virtualStack = true)
    java.nio.file.Files.write(dir.resolve("stack.h5"), stack)
    val main = dir.resolve("main.nc")
    java.nio.file.Files.write(main, mainBytes(Seq(("vc", "stack.h5", "/"))))
    val f = NetCdf.readAny(java.nio.file.Files.readAllBytes(main),
      Some(Formats.siblingsOf(main.toString)))
    // the per-slice sources surface under the 'vc/' prefix if the
    // exclusion loses the traversal prefix — the double-ingest trap
    assert(!f.vars.exists(_.name.contains("_src")),
      s"VDS sources leaked through the link: ${f.vars.map(_.name)}")
    assert(f.vars.exists(_.name == "vc/precip"))
  }

  test("external links ingest through the production directory path") {
    val dir = java.nio.file.Files.createTempDirectory("h5exti")
    java.nio.file.Files.write(dir.resolve("m3.h5"), memberBytes(3000f))
    java.nio.file.Files.write(dir.resolve("t2m_20240101T00.nc"),
      mainBytes(Seq(("mounted", "m3.h5", "/precip"))))
    val df = Formats.ingestDir(spark, dir.toString)
    // both the local variable and the mounted one produce pixel rows
    // for the SAME granule; multi-variable files surface the first
    // grid var through decodeMulti, so just assert the decode works
    // and variable discovery sees both
    assert(df.count() > 0)
    val vars = Formats.NetCdfDecoder.listVariables(
      java.nio.file.Files.readAllBytes(dir.resolve("t2m_20240101T00.nc")),
      Some(Formats.siblingsOf(dir.resolve("t2m_20240101T00.nc").toString)))
    assert(vars.toSet == Set("local", "mounted"), vars.toString)
  }
}
