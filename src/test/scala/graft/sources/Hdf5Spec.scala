package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import graft.SparkSpec

/** Direct round-trip coverage for the native HDF5 codec (the NetCDF-4
  * container path): superblock v0 and v2, chunked+deflate(+shuffle)
  * layout with partial edge chunks, DIMENSION_LIST resolution through
  * the global heap, fill values, and both read sources — in-memory
  * byte arrays and channel-backed positional reads, including a
  * sparse granule whose data lives beyond 2 GiB. */
class Hdf5Spec extends SparkSpec {

  private val w = 7; private val h = 5; private val nT = 3

  // lat descending (north-up), lon ascending; w=7 forces the writer's
  // partial edge chunk (rows axis chunks at h-1=4, cols full)
  private def fixture(shuffle: Boolean = false,
                      fletcher: Boolean = false): Array[Byte] = {
    val lat = Array(40f, 30f, 20f, 10f, 0f)
    val lon = Array(-30f, -20f, -10f, 0f, 10f, 20f, 30f)
    val data = Array.tabulate(nT * h * w)(i => if (i % 11 == 0) -9999f else i * 0.25f)
    Hdf5.write(
      Seq("time" -> nT, "lat" -> h, "lon" -> w),
      Seq(
        NetCdf.Variable("lat", Seq("lat"), lat, None),
        NetCdf.Variable("lon", Seq("lon"), lon, None),
        NetCdf.Variable("precip", Seq("time", "lat", "lon"), data, Some(-9999f))),
      shuffle = shuffle, fletcher = fletcher)
  }

  test("sniffs on the 4-byte prefix and the full signature") {
    val bytes = fixture()
    assert(Hdf5.canHandle(bytes))
    assert(Hdf5.canHandle(bytes.take(4))) // reference sniffs 4 bytes (netcdf.py:38-47)
    assert(!Hdf5.canHandle(bytes.take(3)))
    assert(Formats.sniff(bytes).map(_.name).contains("netcdf"))
  }

  test("superblock v0 round-trip: datasets, data, attrs, fill") {
    val f = Hdf5.read(fixture())
    // "time" has no coordinate variable but still gets a dimension-scale
    // dataset (netcdf-c's "not a netCDF variable" placeholder)
    assert(f.datasets.map(_.name).sorted == Seq("lat", "lon", "precip", "time"))
    val precip = f.datasets.find(_.name == "precip").get
    assert(precip.shape == Seq(nT, h, w))
    assert(precip.attrs("_FillValue") == -9999.0)
    val expected = Array.tabulate(nT * h * w)(i => if (i % 11 == 0) -9999f else i * 0.25f)
    assert(precip.data.sameElements(expected)) // exercises partial edge chunks
    val lat = f.datasets.find(_.name == "lat").get
    assert(lat.attrs("CLASS") == "DIMENSION_SCALE")
    assert(lat.data.sameElements(Array(40f, 30f, 20f, 10f, 0f)))
  }

  test("deflate+shuffle filter chain round-trips identically") {
    val plain = Hdf5.read(fixture(shuffle = false))
    val shuf = Hdf5.read(fixture(shuffle = true))
    val a = plain.datasets.find(_.name == "precip").get.data
    val b = shuf.datasets.find(_.name == "precip").get.data
    assert(a.sameElements(b))
  }

  test("fletcher32 checksum filter: verifies and strips; corruption fails loudly") {
    // netcdf-c checksum=on pipeline: shuffle → fletcher32 → deflate
    for (sh <- Seq(false, true)) {
      val f = Hdf5.read(fixture(shuffle = sh, fletcher = true))
      val expected = Hdf5.read(fixture()).datasets.find(_.name == "precip").get.data
      assert(f.datasets.find(_.name == "precip").get.data.sameElements(expected),
        s"fletcher round-trip (shuffle=$sh)")
    }
    // H5_checksum_fletcher32 hand-computed vectors (16-bit big-endian
    // words, mod-65535 end folds, odd tail = high byte of a final word):
    //   "ab"   one word 0x6162: sum1 = sum2 = 0x6162
    //   "abcd" sum1 = 0x6162+0x6364 = 0xC4C6,
    //          sum2 = 0x6162+0xC4C6 = 0x12628, folded 0x2629
    //   "abc"  words 0x6162, 0x6300: sum1 = 0xC462,
    //          sum2 = 0x6162+0xC462 = 0x125C4, folded 0x25C5
    assert(Hdf5.fletcher32("ab".getBytes, 2) == 0x61626162L)
    assert(Hdf5.fletcher32("abcd".getBytes, 4) == 0x2629C4C6L)
    assert(Hdf5.fletcher32("abc".getBytes, 3) == 0x25C5C462L)
    // corrupt ONE raw byte of a checksummed file inside a chunk: the
    // read must fail with the checksum message, never return wrong data
    val good = fixture(fletcher = true)
    val plainData = Hdf5.read(good).datasets.find(_.name == "precip").get.data
    var failedLoudly = false
    var i = good.length - 5
    while (!failedLoudly && i > good.length / 2) {
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x55).toByte
      // read OUTSIDE any assertion so a silent-wrong-data regression
      // cannot masquerade as the expected loud failure
      val outcome: Either[Exception, Array[Float]] =
        try Right(Hdf5.read(bad).datasets.find(_.name == "precip").get.data)
        catch { case e: Exception => Left(e) }
      outcome match {
        case Right(d) =>
          assert(d.sameElements(plainData),
            s"byte flip at $i decoded to WRONG data without any error")
        case Left(_) => failedLoudly = true // checksum or structure — loud
      }
      i -= 1
    }
    assert(failedLoudly, "no byte flip produced a loud failure")
  }

  test("fractal heap resolves through NESTED indirect blocks (thousands-of-links layout)") {
    // Hand-built heap bytes (the OHDR-v2 test's fabricate-the-layout
    // style): width 4, start 512, maxDirect 1024 → maxDirectRows 3,
    // so root rows 0-2 are direct (heap offsets < 8192) and row 3
    // entries are CHILD indirect blocks spanning 2048 bytes whose own
    // doubling table restarts at 512. Links are placed at offsets
    // 8192+ so every resolve recurses root FHIB → child FHIB → FHDB.
    val bytes = new Array[Byte](2048)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val Undef = -1L
    def sig(at: Int, s: String): Unit = (0 until 4).foreach(i => bytes(at + i) = s.charAt(i).toByte)
    // FRHP at 0
    sig(0, "FRHP"); bytes(4) = 0
    bb.putShort(5, 7.toShort)        // heap ID length
    bb.putShort(7, 0.toShort)        // no I/O filters
    bb.putShort(110, 4.toShort)      // table width
    bb.putLong(112, 512L)            // start block size
    bb.putLong(120, 1024L)           // max direct block size
    bb.putShort(128, 32.toShort)     // max heap size bits → 4-byte offsets
    bb.putLong(132, 160L)            // root indirect block
    bb.putShort(140, 4.toShort)      // current rows in root
    // root FHIB at 160: 16 entries (rows 0-3 × width 4)
    sig(160, "FHIB"); bytes(164) = 0
    bb.putLong(165, 0L)              // heap header addr (unread)
    bb.putInt(173, 0)                // block offset (offSize = 4)
    for (i <- 0 until 16) bb.putLong(177 + i * 8, Undef)
    bb.putLong(177 + 12 * 8, 320L)   // row 3, col 0 → CHILD indirect block
    // child FHIB at 320: its table restarts at 512; one row of 4
    sig(320, "FHIB"); bytes(324) = 0
    bb.putLong(325, 0L)
    bb.putInt(333, 8192)             // block offset within the heap
    for (i <- 0 until 4) bb.putLong(337 + i * 8, Undef)
    bb.putLong(337, 384L)            // row 0, col 0 → FHDB (heap 8192..8704)
    bb.putLong(337 + 8, 896L)        // row 0, col 1 → FHDB (heap 8704..9216)
    def fhdb(at: Int, logical: Int): Unit = {
      sig(at, "FHDB"); bytes(at + 4) = 0
      bb.putLong(at + 5, 0L); bb.putInt(at + 13, logical)
    }
    def link(at: Int, name: String, addr: Long): Unit = {
      bytes(at) = 1; bytes(at + 1) = 0 // version, flags (1-byte name len)
      bytes(at + 2) = name.length.toByte
      name.getBytes("UTF-8").zipWithIndex.foreach { case (b, i) => bytes(at + 3 + i) = b }
      bb.putLong(at + 3 + name.length, addr)
    }
    fhdb(384, 8192)
    link(384 + 17, "alpha", 0x1111L)  // heap offset 8209
    link(384 + 33, "beta", 0x2222L)   // heap offset 8225
    fhdb(896, 8704)
    link(896 + 17, "gamma", 0x3333L)  // heap offset 8721 (col 1!)
    // BTHD at 1408, depth 0, one BTLF leaf at 1440 with 3 records
    sig(1408, "BTHD")
    bb.putInt(1414, 512)             // node size
    bb.putShort(1418, 11.toShort)    // record size: hash(4) + id(7)
    bb.putShort(1420, 0.toShort)     // depth
    bb.putLong(1424, 1440L)          // root node
    bb.putShort(1432, 3.toShort)     // root record count
    sig(1440, "BTLF")
    def rec(i: Int, heapOff: Int): Unit = {
      val at = 1446 + i * 11
      bb.putInt(at, 0)               // name hash (unread)
      bytes(at + 4) = 0              // heap ID: version 0, managed
      bb.putInt(at + 5, heapOff); bb.putShort(at + 9, 16.toShort)
    }
    rec(0, 8209); rec(1, 8225); rec(2, 8721)

    val links = scala.collection.mutable.Buffer[Hdf5.Link]()
    Hdf5.denseLinks(ByteIn(bytes), 0L, 1408L, links)
    assert(links.toSet == Set[Hdf5.Link](("alpha", Hdf5.HardLink(0x1111L)),
      ("beta", Hdf5.HardLink(0x2222L)), ("gamma", Hdf5.HardLink(0x3333L))),
      s"nested-indirect resolution produced $links")
  }

  test("DIMENSION_LIST resolves through the global heap into NetCDF dims") {
    val nc = Hdf5.toNetCdf(fixture())
    // _Netcdf4Dimid restores creation order despite name-sorted traversal
    assert(nc.dims == Seq("time" -> nT, "lat" -> h, "lon" -> w))
    val precip = nc.vars.find(_.name == "precip").get
    assert(precip.dims == Seq("time", "lat", "lon"))
    assert(precip.fill.contains(-9999f))
    // dimension-scale variables self-describe their dim
    assert(nc.vars.find(_.name == "lat").get.dims == Seq("lat"))
  }

  test("NetCDF-4 CF packing: scale_factor/add_offset unscale, sentinel NaNs, fill cleared") {
    // the packed-short ERA5 layout as NetCDF-4: raw values + double
    // scale/offset attrs; the toNetCdf assembly must unscale with the
    // sentinel compared raw (same contract as the classic reader)
    val scale = 0.002; val offset = 250.0
    val raw = Array.tabulate(4 * 3)(i => if (i == 5) -32767f else (i * 500 - 1000).toFloat)
    val bytes = Hdf5.write(
      Seq("y" -> 4, "x" -> 3),
      Seq(NetCdf.Variable("t2m", Seq("y", "x"), raw, Some(-32767f),
        numAttrs = Map("scale_factor" -> scale, "add_offset" -> offset))))
    val nc = Hdf5.toNetCdf(bytes)
    val v = nc.vars.find(_.name == "t2m").get
    assert(v.fill.isEmpty, "packed fill must be consumed")
    assert(!v.numAttrs.contains("scale_factor"),
      "packing attrs must be dropped from the unpacked Variable")
    assert(!v.numAttrs.keys.exists(_.startsWith("_Netcdf4")),
      "internal bookkeeping attrs must not leak onto the exchange type")
    raw.zipWithIndex.foreach { case (r, i) =>
      if (i == 5) assert(v.data(i).isNaN)
      else assert(math.abs(v.data(i) - (r * scale + offset)) < 1e-3,
        s"at $i: ${v.data(i)} vs ${r * scale + offset}")
    }
  }

  test("anonymous dimension (no coordinate variable) still resolves") {
    val data = Array.tabulate(4 * 3)(_.toFloat)
    val bytes = Hdf5.write(
      Seq("y" -> 4, "x" -> 3),
      Seq(NetCdf.Variable("v", Seq("y", "x"), data, None)))
    val nc = Hdf5.toNetCdf(bytes)
    assert(nc.dims == Seq("y" -> 4, "x" -> 3))
    assert(nc.vars.find(_.name == "v").get.data.sameElements(data))
  }

  /** Rewrite the writer's v0 superblock prefix as a v2 superblock —
    * addresses are absolute, so only the prefix layout changes. */
  private def toSuperblockV2(v0: Array[Byte]): Array[Byte] = {
    val rootAddr = ByteBuffer.wrap(v0).order(ByteOrder.LITTLE_ENDIAN).getLong(64)
    val out = v0.clone()
    java.util.Arrays.fill(out, 8, 96, 0.toByte)
    val sb = ByteBuffer.wrap(out, 0, 96).order(ByteOrder.LITTLE_ENDIAN)
    sb.position(8)
    sb.put(2.toByte).put(8.toByte).put(8.toByte).put(0.toByte) // ver, sizeof, sizeof, flags
    sb.putLong(0L)              // base address
    sb.putLong(-1L)             // superblock extension: undefined
    sb.putLong(out.length.toLong) // EOF
    sb.putLong(rootAddr)        // root object header address
    sb.putInt(0)                // checksum (reader does not verify)
    out
  }

  test("superblock v2 (direct root object header) reads identically") {
    val v0 = fixture()
    val v2 = toSuperblockV2(v0)
    val a = Hdf5.read(v0).datasets.map(d => d.name -> d.data.toSeq).toMap
    val b = Hdf5.read(v2).datasets.map(d => d.name -> d.data.toSeq).toMap
    assert(a == b)
  }

  test("v2 object headers (OHDR) parse: dataspace/datatype/contiguous layout") {
    // hand-build: superblock v2 whose root object header is an OHDR
    // dataset (1-D float32, contiguous) — the layout h5py/netcdf-c emit
    // with libver=latest, which the fixture writer (v0/v1) never does
    val data = Array(1.5f, -2.25f, 3.0f, 10.125f)
    val out = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16le(v: Int): Unit = { u8(v); u8(v >> 8) }
    def u32le(v: Long): Unit = { u8(v.toInt); u8((v >> 8).toInt); u8((v >> 16).toInt); u8((v >> 24).toInt) }
    def u64le(v: Long): Unit = { u32le(v & 0xffffffffL); u32le(v >>> 32) }

    out.write(new Array[Byte](48)) // superblock v2 placeholder
    val dataAddr = out.size
    data.foreach(f => u32le(java.lang.Float.floatToIntBits(f).toLong & 0xffffffffL))

    // message bodies
    val ds = { // dataspace v1: rank 1, dims [4]
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte).put(1.toByte).put(0.toByte); b.put(new Array[Byte](5))
      b.putLong(data.length.toLong); b.array()
    }
    val dt = { // float32 IEEE little-endian
      val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
      b.put(0x11.toByte).put(0x20.toByte).put(0x1f.toByte).put(0.toByte).putInt(4)
      b.putShort(0).putShort(32).put(23.toByte).put(8.toByte).put(0.toByte).put(23.toByte).putInt(127)
      b.array()
    }
    val lay = { // layout v3 class 1 (contiguous)
      val b = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
      b.put(3.toByte).put(1.toByte).putLong(dataAddr.toLong).putLong(data.length * 4L)
      b.array()
    }
    val msgs = Seq((0x01, ds), (0x03, dt), (0x08, lay))
    val chunk0 = msgs.map(m => 4 + m._2.length).sum
    val rootAddr = out.size
    out.write("OHDR".getBytes); u8(2); u8(0) // version 2, flags 0 (1-byte size)
    u8(chunk0)
    msgs.foreach { case (t, body) =>
      u8(t); u16le(body.length); u8(0); out.write(body)
    }
    u32le(0) // checksum (unverified)

    val bytes = out.toByteArray
    val sb = ByteBuffer.wrap(bytes, 0, 48).order(ByteOrder.LITTLE_ENDIAN)
    sb.put(0x89.toByte).put('H'.toByte).put('D'.toByte).put('F'.toByte)
      .put('\r'.toByte).put('\n'.toByte).put(0x1a.toByte).put('\n'.toByte)
    sb.put(2.toByte).put(8.toByte).put(8.toByte).put(0.toByte)
    sb.putLong(0L).putLong(-1L).putLong(bytes.length.toLong).putLong(rootAddr.toLong)
    sb.putInt(0)

    val f = Hdf5.read(bytes)
    assert(f.datasets.size == 1)
    val d = f.datasets.head
    assert(d.shape == Seq(data.length))
    assert(d.data.sameElements(data))
  }

  test("dense root group (fractal heap, single direct block) reads a wide file") {
    // 10 data variables + 2 dims = 12 links — past netcdf-c's 8-link
    // compact→dense threshold; short names keep every link body in the
    // 512-byte start block, so the heap root IS a direct block
    val lat = Array(40f, 30f, 20f)
    val lon = Array(-30f, -20f, -10f, 0f)
    val vars = Seq(
      NetCdf.Variable("lat", Seq("lat"), lat, None),
      NetCdf.Variable("lon", Seq("lon"), lon, None)) ++
      (1 to 10).map(i => NetCdf.Variable(s"v$i", Seq("lat", "lon"),
        Array.tabulate(12)(j => (i * 100 + j).toFloat), None))
    val bytes = Hdf5.write(Seq("lat" -> 3, "lon" -> 4), vars, denseRoot = true)
    val f = Hdf5.read(bytes)
    assert(f.datasets.map(_.name).sorted ==
      (Seq("lat", "lon") ++ (1 to 10).map(i => s"v$i")).sorted)
    for (i <- 1 to 10)
      assert(f.datasets.find(_.name == s"v$i").get.data
        .sameElements(Array.tabulate(12)(j => (i * 100 + j).toFloat)), s"v$i data")
  }

  test("OLD-style (symbol-table) soft links resolve — the default h5py layout") {
    // cache-type-2 SNOD entries whose scratch word points at the path
    // string in the local heap — what h5py emits WITHOUT libver=latest
    val lat = Array(40f, 30f, 20f)
    val lon = Array(-30f, -20f, -10f, 0f)
    val vars = Seq(
      NetCdf.Variable("lat", Seq("lat"), lat, None),
      NetCdf.Variable("lon", Seq("lon"), lon, None),
      NetCdf.Variable("precip", Seq("lat", "lon"),
        Array.tabulate(12)(_.toFloat * 3f), None))
    val bytes = Hdf5.write(Seq("lat" -> 3, "lon" -> 4), vars,
      softLinks = Seq("alias" -> "/precip", "dangle" -> "/no_such"))
    val f = Hdf5.read(bytes)
    assert(f.datasets.find(_.name == "alias").get.data
      .sameElements(Array.tabulate(12)(_.toFloat * 3f)))
    assert(!f.datasets.exists(_.name == "dangle"))
    assert(f.datasets.exists(_.name == "precip"))
  }

  test("soft links resolve (absolute, relative, chained); dangling are skipped") {
    val lat = Array(40f, 30f, 20f)
    val lon = Array(-30f, -20f, -10f, 0f)
    val vars = Seq(
      NetCdf.Variable("lat", Seq("lat"), lat, None),
      NetCdf.Variable("lon", Seq("lon"), lon, None)) ++
      (1 to 9).map(i => NetCdf.Variable(s"var$i", Seq("lat", "lon"),
        Array.tabulate(12)(j => (i * 10 + j).toFloat), None))
    val bytes = Hdf5.write(Seq("lat" -> 3, "lon" -> 4), vars,
      denseRoot = true,
      softLinks = Seq(
        "alias_abs" -> "/var3",      // absolute path
        "alias_rel" -> "var5",       // relative to the linking group
        "alias_chain" -> "alias_abs", // soft → soft chain
        "alias_dangling" -> "/no_such_var"))
    val f = Hdf5.read(bytes)
    // aliased datasets surface under the LINK's name, data intact
    assert(f.datasets.find(_.name == "alias_abs").get.data
      .sameElements(Array.tabulate(12)(j => (30 + j).toFloat)))
    assert(f.datasets.find(_.name == "alias_rel").get.data
      .sameElements(Array.tabulate(12)(j => (50 + j).toFloat)))
    assert(f.datasets.find(_.name == "alias_chain").get.data
      .sameElements(Array.tabulate(12)(j => (30 + j).toFloat)))
    // dangling links are skipped, not errors (h5py iteration behavior)
    assert(!f.datasets.exists(_.name == "alias_dangling"))
    // the hard-linked originals are all still there
    assert((1 to 9).forall(i => f.datasets.exists(_.name == s"var$i")))
  }

  test("TINY and direct HUGE heap IDs resolve (18-byte-ID heap geometry)") {
    // 18-byte heap IDs (libhdf5's rule: ≥17 makes huge IDs direct, ≤18
    // keeps tiny IDs in the normal 4-bit-length form). Short names (≤3
    // chars → ≤14-byte link bodies) embed as tiny IDs; names past the
    // 96-byte max-managed-object size overflow to direct huge storage;
    // midsize names stay managed.
    val lat = Array(40f, 30f, 20f)
    val lon = Array(-30f, -20f, -10f, 0f)
    val longName = "huge_" + ("x" * 150)
    val vars = Seq(
      NetCdf.Variable("lat", Seq("lat"), lat, None),
      NetCdf.Variable("lon", Seq("lon"), lon, None)) ++ // tiny (3-char)
      (1 to 8).map(i => NetCdf.Variable(s"v$i", Seq("lat", "lon"),
        Array.tabulate(12)(j => (i * 100 + j).toFloat), None)) ++ // tiny (2-char)
      Seq(
        NetCdf.Variable("var_managed_mid", Seq("lat", "lon"),
          Array.tabulate(12)(_.toFloat + 0.5f), None), // managed
        NetCdf.Variable(longName, Seq("lat", "lon"),
          Array.tabulate(12)(_.toFloat * 2f), None)) // huge
    val bytes = Hdf5.write(Seq("lat" -> 3, "lon" -> 4), vars,
      denseRoot = true, denseIdStyle = "tinyhuge")
    val f = Hdf5.read(bytes)
    assert(f.datasets.map(_.name).sorted == vars.map(_.name).sorted)
    assert(f.datasets.find(_.name == longName).get.data
      .sameElements(Array.tabulate(12)(_.toFloat * 2f)))
    assert(f.datasets.find(_.name == "v3").get.data
      .sameElements(Array.tabulate(12)(j => (300 + j).toFloat)))
  }

  test("indirect HUGE heap IDs resolve through the huge-object B-tree v2") {
    // default 7-byte IDs: a huge link's ID is a key into the heap's
    // huge-object B-tree (record type 1: address, length, id) — the
    // layout real libhdf5 dense groups use for oversized link messages
    val lat = Array(40f, 30f, 20f)
    val lon = Array(-30f, -20f, -10f, 0f)
    val longA = "huge_a_" + ("y" * 120)
    val longB = "huge_b_" + ("z" * 180)
    val vars = Seq(
      NetCdf.Variable("lat", Seq("lat"), lat, None),
      NetCdf.Variable("lon", Seq("lon"), lon, None)) ++
      (1 to 9).map(i => NetCdf.Variable(s"var$i", Seq("lat", "lon"),
        Array.tabulate(12)(j => (i * 10 + j).toFloat), None)) ++
      Seq(
        NetCdf.Variable(longA, Seq("lat", "lon"),
          Array.tabulate(12)(_.toFloat + 1f), None),
        NetCdf.Variable(longB, Seq("lat", "lon"),
          Array.tabulate(12)(_.toFloat + 2f), None))
    val bytes = Hdf5.write(Seq("lat" -> 3, "lon" -> 4), vars,
      denseRoot = true, denseIdStyle = "hugebtree")
    val f = Hdf5.read(bytes)
    assert(f.datasets.map(_.name).sorted == vars.map(_.name).sorted)
    assert(f.datasets.find(_.name == longA).get.data
      .sameElements(Array.tabulate(12)(_.toFloat + 1f)))
    assert(f.datasets.find(_.name == longB).get.data
      .sameElements(Array.tabulate(12)(_.toFloat + 2f)))
  }

  test("FILTERED fractal heap: deflated direct blocks, single-block and indirect") {
    // heaps whose direct blocks sit behind the heap's own deflate
    // pipeline: link resolution must decompress the block before
    // reading the link message; the FRHP carries the filtered root
    // size + pipeline, FHIB direct entries gain (size, mask)
    val lat = Array(40f, 30f, 20f)
    val lon = Array(-30f, -20f, -10f, 0f)
    // single direct block (root IS the filtered block)
    val vsSmall = Seq(
      NetCdf.Variable("lat", Seq("lat"), lat, None),
      NetCdf.Variable("lon", Seq("lon"), lon, None)) ++
      (1 to 10).map(i => NetCdf.Variable(s"v$i", Seq("lat", "lon"),
        Array.tabulate(12)(j => (i * 100 + j).toFloat), None))
    val small = Hdf5.read(Hdf5.write(Seq("lat" -> 3, "lon" -> 4), vsSmall,
      denseRoot = true, filteredHeap = true))
    assert(small.datasets.map(_.name).sorted ==
      (Seq("lat", "lon") ++ (1 to 10).map(i => s"v$i")).sorted)
    for (i <- 1 to 10)
      assert(small.datasets.find(_.name == s"v$i").get.data
        .sameElements(Array.tabulate(12)(j => (i * 100 + j).toFloat)), s"v$i data")
    // multiple filtered blocks behind a root indirect block
    val vsWide = Seq(
      NetCdf.Variable("lat", Seq("lat"), lat, None),
      NetCdf.Variable("lon", Seq("lon"), lon, None)) ++
      (1 to 30).map(i => NetCdf.Variable(f"temperature_level_$i%02d", Seq("lat", "lon"),
        Array.tabulate(12)(j => (i * 1000 + j).toFloat), None))
    val wide = Hdf5.read(Hdf5.write(Seq("lat" -> 3, "lon" -> 4), vsWide,
      denseRoot = true, filteredHeap = true))
    assert(wide.datasets.size == 32)
    for (i <- Seq(1, 15, 30))
      assert(wide.datasets.find(_.name == f"temperature_level_$i%02d").get.data
        .sameElements(Array.tabulate(12)(j => (i * 1000 + j).toFloat)))
  }

  test("dense root group with a root INDIRECT block (links spill over direct blocks)") {
    // 30 long-named variables → link bodies ≈ 31 B each ≈ 1 KB total,
    // spilling past the 512-byte start block into multiple row-0
    // blocks under a root indirect block
    val vars = Seq(
      NetCdf.Variable("lat", Seq("lat"), Array(40f, 30f, 20f), None),
      NetCdf.Variable("lon", Seq("lon"), Array(-30f, -20f, -10f, 0f), None)) ++
      (1 to 30).map(i => NetCdf.Variable(f"temperature_level_$i%02d", Seq("lat", "lon"),
        Array.tabulate(12)(j => (i * 1000 + j).toFloat), None))
    val bytes = Hdf5.write(Seq("lat" -> 3, "lon" -> 4), vars, denseRoot = true)
    val f = Hdf5.read(bytes)
    assert(f.datasets.size == 32)
    for (i <- Seq(1, 15, 30)) {
      val d = f.datasets.find(_.name == f"temperature_level_$i%02d").get
      assert(d.data.sameElements(Array.tabulate(12)(j => (i * 1000 + j).toFloat)))
    }
    // the wide file flows through the whole NetCDF-4 surface too
    val nc = NetCdf.readAny(bytes)
    assert(nc.gridVars.size == 30)
  }

  test("dense root group with a MULTI-LEVEL name B-tree (400 links) reads") {
    // 400 variables × 11-byte records ≫ one 2048-byte leaf (185 records)
    // → the writer emits a depth-1 tree (leaves + BTIN root) and the
    // reader walks internal records and child pointers with the H5B2
    // variable-width count fields
    val vars = Seq(
      NetCdf.Variable("lat", Seq("lat"), Array(40f, 30f), None),
      NetCdf.Variable("lon", Seq("lon"), Array(-30f, -20f), None)) ++
      (1 to 400).map(i => NetCdf.Variable(f"var_$i%03d", Seq("lat", "lon"),
        Array.tabulate(4)(j => (i * 10 + j).toFloat), None))
    val bytes = Hdf5.write(Seq("lat" -> 2, "lon" -> 2), vars, denseRoot = true)
    val f = Hdf5.read(bytes)
    assert(f.datasets.size == 402)
    for (i <- Seq(1, 186, 200, 399, 400)) {
      val d = f.datasets.find(_.name == f"var_$i%03d").get
      assert(d.data.sameElements(Array.tabulate(4)(j => (i * 10 + j).toFloat)), s"var $i")
    }
    val nc = NetCdf.readAny(bytes)
    assert(nc.gridVars.size == 400)
  }

  test("addresses beyond the file (≥2 GiB offsets) are rejected loudly") {
    val bytes = fixture()
    val bad = bytes.clone()
    // point the v0 root symbol-table entry's object header at 3 GiB
    ByteBuffer.wrap(bad).order(ByteOrder.LITTLE_ENDIAN).putLong(64, 3L * 1024 * 1024 * 1024)
    val e = intercept[IllegalArgumentException](Hdf5.read(bad))
    assert(e.getMessage.contains("out of range"))
  }

  test("NetCDF-4 ingests end-to-end through the chipper") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-h5-").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/precip_20240301.nc"), fixture())
    val df = Formats.ingestDir(spark, dir)
    assert(df.select("time").distinct().count() == nT)
    // fill pixels dropped at the decode boundary (NaN discipline)
    val n = df.count()
    assert(n == (0 until nT * h * w).count(_ % 11 != 0))
    // pixel-center geocoding from the coordinate variables
    val r = df.filter(col("step") === 0 && col("y") === 0 && col("x") === 1)
      .select("lon", "lat", "v").collect()(0)
    assert(r.getDouble(0) == -20.0 && r.getDouble(1) == 40.0)
  }

  private def charFixture(vlen: Boolean): Array[Byte] = {
    val lat = Array(40f, 30f, 20f, 10f, 0f)
    val lon = Array(-30f, -20f, -10f, 0f, 10f, 20f, 30f)
    val data = Array.tabulate(h * w)(i => i * 0.5f)
    val names = "HalleyVI" + "Vostok\u0000\u0000" // 2 stations, width 8
    Hdf5.write(
      Seq("lat" -> h, "lon" -> w, "station" -> 2, "strlen" -> 8),
      Seq(
        NetCdf.Variable("lat", Seq("lat"), lat, None),
        NetCdf.Variable("lon", Seq("lon"), lon, None),
        NetCdf.Variable("station_name", Seq("station", "strlen"),
          names.map(_.toFloat).toArray, None, ncType = 2),
        NetCdf.Variable("t2m", Seq("lat", "lon"), data, None)),
      vlenStr = vlen)
  }

  test("fixed-string dataset (netcdf-c NC_CHAR shape) decodes to label strings") {
    val f = NetCdf.readAny(charFixture(vlen = false))
    assert(f.charValues("station_name") == Seq("HalleyVI", "Vostok"))
    // label variables never raster; the numeric variable still does
    assert(!f.gridVars.exists(_.name == "station_name"))
    assert(f.gridVars.exists(_.name == "t2m"))
    assert(f.rasters("t2m").forall(_._2.data.count(!_.isNaN) == h * w))
  }

  test("channel-backed reads (ByteIn.fromPath) decode identically to in-memory reads") {
    for (bytes <- Seq(fixture(), fixture(shuffle = true, fletcher = true),
                      charFixture(vlen = true))) {
      val tmp = java.nio.file.Files.createTempFile("graft-h5-ch-", ".nc")
      java.nio.file.Files.write(tmp, bytes)
      val viaArr = Hdf5.read(bytes)
      val in = ByteIn.fromPath(tmp.toString)
      val viaCh = try Hdf5.read(in) finally in.close()
      assert(viaCh.datasets.map(_.name) == viaArr.datasets.map(_.name))
      viaCh.datasets.zip(viaArr.datasets).foreach { case (a, b) =>
        assert(a.shape == b.shape && a.data.sameElements(b.data), a.name)
      }
      java.nio.file.Files.delete(tmp)
    }
  }

  test("a granule with data beyond 2 GiB decodes through the channel path") {
    // the OHDR-v2 hand-built layout, but the contiguous data lives at
    // 2.5 GiB in a SPARSE file — beyond any JVM byte array, the
    // ERA5-class granule shape. Holes read as zeros; only the header
    // and data pages are ever touched.
    val data = Array(1.5f, -2.25f, 3.0f, 10.125f)
    val dataAddr = 0xA0000000L // 2.5 GiB
    val head = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = head.write(v & 0xff)
    def u16le(v: Int): Unit = { u8(v); u8(v >> 8) }
    head.write(new Array[Byte](48)) // superblock v2 placeholder
    val ds = {
      val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte).put(1.toByte).put(0.toByte); b.put(new Array[Byte](5))
      b.putLong(data.length.toLong); b.array()
    }
    val dt = {
      val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
      b.put(0x11.toByte).put(0x20.toByte).put(0x1f.toByte).put(0.toByte).putInt(4)
      b.putShort(0).putShort(32).put(23.toByte).put(8.toByte).put(0.toByte).put(23.toByte).putInt(127)
      b.array()
    }
    val lay = {
      val b = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
      b.put(3.toByte).put(1.toByte).putLong(dataAddr).putLong(data.length * 4L)
      b.array()
    }
    val msgs = Seq((0x01, ds), (0x03, dt), (0x08, lay))
    val rootAddr = head.size
    head.write("OHDR".getBytes); u8(2); u8(0)
    u8(msgs.map(m => 4 + m._2.length).sum)
    msgs.foreach { case (t, body) => u8(t); u16le(body.length); u8(0); head.write(body) }
    u8(0); u8(0); u8(0); u8(0) // checksum (unverified)
    val hb = head.toByteArray
    val fileLen = dataAddr + data.length * 4L
    val sb = ByteBuffer.wrap(hb, 0, 48).order(ByteOrder.LITTLE_ENDIAN)
    sb.put(0x89.toByte).put('H'.toByte).put('D'.toByte).put('F'.toByte)
      .put('\r'.toByte).put('\n'.toByte).put(0x1a.toByte).put('\n'.toByte)
    sb.put(2.toByte).put(8.toByte).put(8.toByte).put(0.toByte)
    sb.putLong(0L).putLong(-1L).putLong(fileLen).putLong(rootAddr.toLong)
    sb.putInt(0)

    val tmp = java.nio.file.Files.createTempFile("graft-h5-big-", ".nc")
    val raf = new java.io.RandomAccessFile(tmp.toFile, "rw")
    try {
      raf.write(hb)
      raf.seek(dataAddr)
      val db = ByteBuffer.allocate(data.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      data.foreach(db.putFloat)
      raf.write(db.array())
    } finally raf.close()
    assert(java.nio.file.Files.size(tmp) == fileLen)

    val in = ByteIn.fromPath(tmp.toString)
    val f = try Hdf5.read(in) finally in.close()
    assert(f.datasets.size == 1 && f.datasets.head.data.sameElements(data))
    // the SAME file through the in-memory path fails loudly (array cap)
    java.nio.file.Files.delete(tmp)
  }

  test("ingestLargePaths matches ingestDir on the same granule") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-h5-lg-").toString
    val p = java.nio.file.Paths.get(s"$dir/precip_20240301.nc")
    java.nio.file.Files.write(p, fixture())
    val viaDir = Formats.ingestDir(spark, dir)
      .select("time", "step", "y", "x", "v", "lon", "lat").orderBy("step", "y", "x")
      .collect().toSeq
    val viaPaths = Formats.ingestLargePaths(spark, Seq(p.toString))
      .select("time", "step", "y", "x", "v", "lon", "lat").orderBy("step", "y", "x")
      .collect().toSeq
    assert(viaPaths == viaDir)
    assert(viaPaths.nonEmpty)
  }

  test("vlen-string dataset (NC_STRING/h5py shape) resolves through the global heap") {
    val f = NetCdf.readAny(charFixture(vlen = true))
    assert(f.charValues("station_name") == Seq("HalleyVI", "Vostok"))
    // the width axis is synthetic (folded into the type on the wire)
    val v = f.vars.find(_.name == "station_name").get
    assert(v.dims == Seq("station", "station_name_strlen"))
    assert(f.dimSize("station_name_strlen") == 8) // longest string
    assert(f.gridVars.exists(_.name == "t2m"))
  }

  test("enum dataset (NC_ENUM cloud-mask shape) decodes codes + CF flag attrs") {
    val h = 5; val w = 7
    val lat = Array(40f, 30f, 20f, 10f, 0f)
    val lon = Array(-30f, -20f, -10f, 0f, 10f, 20f, 30f)
    val labels = Seq("clear", "cloudy", "snow", "missing")
    // codes 0..2 as data, 3 as the fill sentinel
    val codes = Array.tabulate(h * w)(i => if (i % 13 == 0) 3f else (i % 3).toFloat)
    val bytes = Hdf5.write(
      Seq("lat" -> h, "lon" -> w),
      Seq(NetCdf.Variable("lat", Seq("lat"), lat, None),
        NetCdf.Variable("lon", Seq("lon"), lon, None),
        NetCdf.Variable("mask", Seq("lat", "lon"), codes, Some(3f))),
      enumVars = Map("mask" -> labels))
    val ds = Hdf5.read(bytes).datasets.find(_.name == "mask").get
    assert(ds.data.sameElements(codes))
    // classification semantics surface CF-style
    assert(ds.attrs("flag_meanings") == "clear cloudy snow missing")
    assert(ds.attrs("flag_values") == "0 1 2 3")
    // production ingest: the granule decodes as a raster, fill -> NaN
    val f = NetCdf.readAny(bytes)
    val r = f.rasters("mask").head._2
    for (i <- 0 until h * w) {
      if (codes(i) == 3f) assert(r.data(i).isNaN)
      else assert(r.data(i) == codes(i))
    }
  }
}
