package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Filtered fractal heaps with HUGE objects: a link message past the
  * max-managed size on a filtered heap stores through the heap's own
  * I/O pipeline, indexed by the huge-object v2 B-tree's record type 3
  * (address, stored length, filter mask, de-filtered size, id). */
class Hdf5FilteredHugeSpec extends AnyFunSuite {

  private val h = 5; private val w = 7
  private val lat = Array(40f, 30f, 20f, 10f, 0f)
  private val lon = Array(-30f, -20f, -10f, 0f, 10f, 20f, 30f)
  private val d57 = Array.tabulate(h * w)(i => i * 0.5f)

  private def fixture(filtered: Boolean): Array[Byte] =
    Hdf5.write(
      Seq("lat" -> h, "lon" -> w),
      Seq(NetCdf.Variable("lat", Seq("lat"), lat, None),
        NetCdf.Variable("lon", Seq("lon"), lon, None)) ++
        (1 to 9).map(i => NetCdf.Variable(s"var$i", Seq("lat", "lon"),
          d57.map(_ + i), None)) :+
        NetCdf.Variable("huge_" + "q" * 160, Seq("lat", "lon"), d57, None),
      denseRoot = true, denseIdStyle = "hugebtree", filteredHeap = filtered)

  test("a filtered huge link resolves through the type-3 B-tree record") {
    val bytes = fixture(filtered = true)
    val f = Hdf5.read(bytes)
    val names = f.datasets.map(_.name)
    assert(names.count(_.startsWith("var")) == 9, names.toString)
    val huge = f.datasets.find(_.name.startsWith("huge_")).get
    assert(huge.name.length == 5 + 160)
    assert(huge.data.sameElements(d57))
    // and the stored HUGE BODY really is filtered: the 165-char name
    // appears once in the writer's shared local heap either way, but
    // the unfiltered file carries a SECOND verbatim copy inside the
    // huge link body — the filtered file must not
    val needle = ("huge_" + "q" * 160).getBytes("UTF-8")
    def occurrences(hay: Array[Byte]): Int = {
      var c = 0; var i = 0
      while (i + needle.length <= hay.length) {
        var j = 0
        while (j < needle.length && hay(i + j) == needle(j)) j += 1
        if (j == needle.length) c += 1
        i += 1
      }
      c
    }
    val plain = occurrences(fixture(filtered = false))
    assert(occurrences(bytes) == plain - 1,
      s"filtered file carries ${occurrences(bytes)} verbatim copies vs $plain " +
        "unfiltered — the huge body skipped the deflate pipeline")
  }

  test("the whole filtered-huge file assembles through the NetCDF model") {
    val f = NetCdf.readAny(fixture(filtered = true))
    assert(f.vars.exists(_.name.startsWith("huge_")))
    assert(f.vars.count(_.name.startsWith("var")) == 9)
    val v3 = f.vars.find(_.name == "var3").get
    assert(v3.data.sameElements(d57.map(_ + 3)))
  }
}
