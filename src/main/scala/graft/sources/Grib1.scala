package graft.sources

/** Minimal GRIB edition-1 codec (WMO FM-92 GRIB1) — the legacy
  * archives (ERA-40-era reanalyses, pre-2000s NCEP/DWD products) that
  * the reference reads through eccodes (formats/grib.py:122-230).
  * Written from the public WMO Manual on Codes edition-1 tables:
  * fixed-offset IS/PDS/GDS/BMS/BDS sections, sign-magnitude 16/24-bit
  * integers, IBM System/370 32-bit reference floats.
  *
  * Covered: simple packing (the overwhelming GRIB1 wire form),
  * second-order/complex packing in the standard GRIBEX form (the
  * ERA-era ECMWF archive encoding: secondary-bitmap groups or
  * row-by-row, constant or per-group second-order widths), bitmap
  * nodata, lat/lon (grid type 0) and regular global Gaussian (type 4)
  * grids, THINNED (quasi-regular) lat/lon and Gaussian grids via the
  * GDS PL row-count list (the DWD / older-ECMWF reduced-grid archive
  * form — rows expand nearest-neighbour to the widest row and the
  * message flags LOSSY), the GDS-less predefined global lat/lon grids
  * (NCEP ON388 Table B ids 2/3/4 — the pre-2000 NCEP archive form),
  * all 8 edition-1 scan-mode combinations, multi-message
  * concatenation. Spherical harmonics, general-extended/
  * boustrophedonic/spatially-differenced second order, and other grid
  * types FAIL LOUDLY — as do REGIONAL predefined (GDS-less) grid ids:
  * their ON388 orientations are center-table lore that cannot be
  * reproduced faithfully from the public spec alone, and a guessed
  * orientation would mis-georeference every pixel silently.
  *
  * Messages surface as [[Grib2.Message]], so the whole ingest path
  * (chipper, variable discovery, multi-message step indexing) is
  * shared with edition 2. GRIB1 has no discipline octet; messages
  * carry discipline 255 (the GRIB2 "missing" sentinel) and the
  * parameter-table version as the category, giving
  * `d255_c{table}_p{param}` variable names that cannot collide with
  * an edition-2 product's.
  */
object Grib1 {

  def canHandle(b: Array[Byte]): Boolean =
    b.length > 8 && b(0) == 'G' && b(1) == 'R' && b(2) == 'I' && b(3) == 'B' &&
      (b(7) & 0xff) == 1

  // ---- fixed-width big-endian + sign-magnitude readers --------------
  private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xff
  private def u16(b: Array[Byte], o: Int): Int = ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def u24(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 16) | ((b(o + 1) & 0xff) << 8) | (b(o + 2) & 0xff)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def sm16(b: Array[Byte], o: Int): Int = {
    val v = u16(b, o); if ((v & 0x8000) != 0) -(v & 0x7fff) else v
  }
  private def sm24(b: Array[Byte], o: Int): Int = {
    val v = u24(b, o); if ((v & 0x800000) != 0) -(v & 0x7fffff) else v
  }

  /** IBM System/370 single: sign, 7-bit base-16 exponent (bias 64),
    * 24-bit fraction — the edition-1 reference-value float. */
  private[sources] def ibm32(bits: Long): Double = {
    if ((bits & 0x7fffffffL) == 0) return 0.0
    val s = if ((bits >>> 31) != 0) -1.0 else 1.0
    val e = ((bits >>> 24) & 0x7f).toInt - 64
    s * ((bits & 0xffffff).toDouble / (1 << 24)) * math.pow(16.0, e)
  }

  private[sources] def toIbm32(v: Double): Long = {
    if (v == 0.0) return 0L
    val s = if (v < 0) 1L else 0L
    val a = math.abs(v)
    // smallest e with a/16^e < 1 → fraction in [1/16, 1)
    var e = math.floor(math.log(a) / math.log(16.0)).toInt + 1
    var frac = math.round(a / math.pow(16.0, e) * (1 << 24))
    if (frac >= (1 << 24)) { frac >>= 4; e += 1 } // rounding overflow
    require(e + 64 >= 0 && e + 64 <= 127, s"value $v outside IBM float range")
    (s << 31) | ((e + 64).toLong << 24) | (frac & 0xffffff)
  }

  // ---- decode -------------------------------------------------------

  def read(bytes: Array[Byte]): Grib2.Message = readAll(bytes).head

  def readAll(bytes: Array[Byte]): Seq[Grib2.Message] = {
    require(canHandle(bytes), "not GRIB1")
    val out = scala.collection.mutable.Buffer[Grib2.Message]()
    var pos = 0
    while (pos + 8 <= bytes.length) {
      require(new String(bytes, pos, 4) == "GRIB", s"expected GRIB at offset $pos")
      require(u8(bytes, pos + 7) == 1, "only GRIB edition 1")
      val total = u24(bytes, pos + 4)
      require(total > 8 && pos + total <= bytes.length,
        s"implausible message length $total at offset $pos")
      require(new String(bytes, pos + total - 4, 4) == "7777",
        s"message at $pos does not end in 7777")
      out += readMessage(bytes, pos)
      pos += total
    }
    out.toSeq
  }

  /** NCEP ON388 Table B global lat/lon grids, the GDS-less predefined
    * form: id → (ni, nj, degrees). All three scan +i −j from (90°, 0°). */
  private val predefinedGrids = Map(
    2 -> (144, 73, 2.5), 3 -> (360, 181, 1.0), 4 -> (720, 361, 0.5))

  private def readMessage(bytes: Array[Byte], start: Int): Grib2.Message = {
    var o = start + 8
    // ---- PDS ----
    val pdsLen = u24(bytes, o)
    require(pdsLen >= 28, s"implausible PDS length $pdsLen")
    val table = u8(bytes, o + 3)
    val gridId = u8(bytes, o + 6)
    val flags = u8(bytes, o + 7)
    val param = u8(bytes, o + 8)
    val yy = u8(bytes, o + 12); val mm = u8(bytes, o + 13); val dd = u8(bytes, o + 14)
    val hh = u8(bytes, o + 15); val mn = u8(bytes, o + 16)
    val unit = u8(bytes, o + 17)
    val p1 = u8(bytes, o + 18); val p2 = u8(bytes, o + 19)
    val tri = u8(bytes, o + 20)
    val century = u8(bytes, o + 24)
    val dScale = sm16(bytes, o + 26)
    val year = (century - 1) * 100 + yy
    val refTime = java.time.LocalDateTime.of(year, mm, dd, hh, mn)
    def hoursOf(n: Int): Int = unit match {
      case 0 => require(n % 60 == 0, s"sub-hour forecast step ($n min)"); n / 60
      case 1 => n
      case 2 => n * 24
      case 10 => n * 3
      case 11 => n * 6
      case 12 => n * 12
      case u => throw new IllegalArgumentException(s"unsupported time unit $u")
    }
    val forecastHours = tri match {
      case 0 | 1 => hoursOf(if (tri == 1) 0 else p1)
      case 2 | 3 | 4 | 5 => hoursOf(p2) // interval products: end of period
      case 10 => hoursOf((p1 << 8) | p2)
      case t => throw new IllegalArgumentException(s"unsupported time range indicator $t")
    }
    o += pdsLen
    // ---- GDS, or a predefined (centre-table) grid when absent ----
    var ni = 0; var nj = 0; var scanMode = 0
    var px = 0.0; var py = 0.0; var west = 0.0; var north = 0.0
    var proj: Option[Grib2.GridProj] = None
    var pl: Array[Int] = null // thinned grid: per-row point counts
    var specJ = -1; var specK = -1; var specM = -1 // type-50 spherical harmonics
    if ((flags & 0x80) == 0) {
      // GDS-less message: PDS octet 7 names an NCEP ON388 Table B
      // grid — the form the pre-2000 NCEP archives (reanalysis-1 era)
      // shipped. The global lat/lon entries are supported; regional/
      // thinned/polar predefined grids dead-letter by number.
      val (w, h, d) = predefinedGrids.getOrElse(gridId,
        throw new IllegalArgumentException(
          s"predefined GRIB1 grid $gridId not supported " +
            "(global lat/lon grids 2/3/4 only)"))
      ni = w; nj = h
      scanMode = 0 // ON388: +i (0°→east), −j (90°→south), row-major
      px = d; py = d
      west = -px / 2 // first column centered on 0°
      north = 90.0 + py / 2 // first row centered on the pole
    } else {
    val gdsLen = u24(bytes, o)
    val nv = u8(bytes, o + 3)
    val pvpl = u8(bytes, o + 4)
    val gtype = u8(bytes, o + 5)
    require(gtype == 0 || gtype == 4 || gtype == 50,
      s"unsupported GRIB1 grid type $gtype " +
        "(0 lat/lon, 4 Gaussian, 50 spherical harmonics)")
    if (gtype == 50) {
      // ---- spherical harmonic coefficients (ERA-40-era ECMWF
      // spectral archives): GDS octets 7-8 J, 9-10 K, 11-12 M,
      // 13 representation type, 14 representation mode — the
      // edition-1 twin of GRIB2 template 3.50, synthesized onto the
      // same truncation-sized global lat/lon raster
      val j = u16(bytes, o + 6); val k = u16(bytes, o + 8)
      val m = u16(bytes, o + 10)
      val repType = u8(bytes, o + 12); val repMode = u8(bytes, o + 13)
      require(repType == 1,
        s"spectral representation type $repType not supported " +
          "(1 = associated Legendre functions of the first kind)")
      require(repMode == 1,
        s"spectral representation mode $repMode not supported " +
          "(1 = complex coefficients, m >= 0)")
      // general pentagonal resolution (J, K, M): retained
      // coefficients m = 0..M, n = m..min(J + m, K) — triangular
      // (K = J = M), rhomboidal (K = J + M), trapezoidal (K = J > M)
      require(j >= 1 && j <= 2047 && m >= 0 && m <= j && k >= j && k <= j + m,
        s"unsupported spectral truncation J=$j K=$k M=$m " +
          "(pentagonal J <= K <= J+M, M <= J, J <= 2047)")
      specJ = j; specK = k; specM = m
      // synthesis raster sized by the band limit in total wavenumber
      ni = 2 * (k + 1); nj = k + 1
      px = 360.0 / ni; py = 180.0 / nj
      west = -180.0; north = 90.0
      scanMode = 0
      o += gdsLen
    } else {
    ni = u16(bytes, o + 6); nj = u16(bytes, o + 8)
    require(nj > 0 && nj != 0xffff, s"implausible GRIB1 row count $nj")
    // ---- thinned (quasi-regular) grid: Ni missing, per-row point
    // counts in the PL list (octet 5 names its 1-based GDS octet,
    // after 4·NV vertical-coordinate octets). The DWD/older-ECMWF
    // archive form — reduced lat/lon and reduced Gaussian (ERA-40's
    // N80) both arrive this way; eccodes reads them for the reference
    // (formats/grib.py:122-230). Rows expand to the widest row by
    // nearest-neighbour along the parallel; the expansion is a
    // resample, so the message is flagged LOSSY.
    if (ni == 0xffff) {
      require(pvpl != 255,
        "thinned grid declares Ni missing but carries no PL list (octet 5 = 255)")
      val plOff = o + (pvpl - 1) + 4 * nv
      // lower bound too: a corrupt pointer into the fixed 32-octet GDS
      // header would decode geometry bytes as plausible row counts and
      // silently expand the wrong row structure
      require(plOff >= o + 32,
        s"PL pointer (octet ${pvpl}, NV=$nv) lands inside the fixed GDS header")
      require(plOff + 2L * nj <= o + gdsLen,
        s"PL list of $nj row counts overruns the GDS of $gdsLen octets")
      pl = Array.tabulate(nj)(j => u16(bytes, plOff + 2 * j))
      require(pl.forall(p => p >= 1 && p != 0xffff),
        "implausible thinned-grid row count in the PL list")
      ni = pl.max
    }
    require(ni > 0 && ni != 0xffff && nj > 0 && ni.toLong * nj <= (1 << 26),
      s"implausible GRIB1 grid shape ${ni}x$nj")
    val la1 = sm24(bytes, o + 10) / 1000.0; val lo1 = sm24(bytes, o + 13) / 1000.0
    val la2 = sm24(bytes, o + 17) / 1000.0; val lo2 = sm24(bytes, o + 20) / 1000.0
    scanMode = u8(bytes, o + 27)
    // edition 1 defines scan bits 1-3 only (±i, ±j, column-major)
    require((scanMode & 0x1f) == 0, f"implausible GRIB1 scan mode 0x$scanMode%02x")
    // a thinned row IS a parallel: column-major or westward scans have
    // no defined row structure to expand (and don't occur in archives)
    require(pl == null || (scanMode & 0xa0) == 0,
      f"thinned grids decode eastward row-major only (scan 0x$scanMode%02x)")
    if (gtype == 0) {
      val di = u16(bytes, o + 23); val dj = u16(bytes, o + 25)
      // the i direction runs lo1→lo2 (reversed under the −i scan
      // flag); measuring the span ALONG that direction modulo 360 —
      // and anchoring west at the direction's start — stays correct
      // for grids crossing the 0°/360° wrap, where min/max of the
      // corners would mis-georeference every pixel
      val eastward = (scanMode & 0x80) == 0
      val lonSpan = {
        val d = if (eastward) lo2 - lo1 else lo1 - lo2
        if (d < 0) d + 360 else d
      }
      px = if (di != 0xffff) di / 1000.0
           else lonSpan / math.max(1, ni - 1)
      py = if (dj != 0xffff) dj / 1000.0
           else math.abs(la2 - la1) / math.max(1, nj - 1)
      val startLon = if (eastward) lo1 else lo2
      west = (if (startLon > 180) startLon - 360 else startLon) - px / 2
      north = math.max(la1, la2) + py / 2
    } else { // regular global Gaussian
      val nPar = u16(bytes, o + 25)
      require(nPar >= 1 && nPar <= 8192, s"implausible Gaussian N=$nPar")
      require(nj == 2 * nPar,
        s"regional Gaussian subsets not supported ($nj rows for N=$nPar)")
      val glats = Grib2.gaussLatsCached(2 * nPar)
      px = 360.0 / ni
      west = math.min(lo1, lo2) - px / 2
      py = (glats(0) - glats(nj - 1)) / (nj - 1)
      north = glats(0) + py / 2
      proj = Some(Grib2.GaussianGrid(nPar))
    }
    o += gdsLen
    }
    }
    // ---- BMS (optional) ----
    // thinned grids carry one point (and one bitmap bit) per PL entry,
    // not ni·nj
    val nPts = if (pl == null) ni * nj else pl.sum
    var bitmap: Array[Boolean] = null
    if ((flags & 0x40) != 0) {
      val bmsLen = u24(bytes, o)
      require(u16(bytes, o + 4) == 0,
        "predefined (centre-table) bitmaps not supported")
      require(bmsLen >= 6 + (nPts + 7) / 8,
        s"BMS length $bmsLen too short for $nPts bitmap bits")
      bitmap = new Array[Boolean](nPts)
      var i = 0
      while (i < bitmap.length) {
        bitmap(i) = ((bytes(o + 6 + i / 8) >> (7 - i % 8)) & 1) == 1
        i += 1
      }
      o += bmsLen
    }
    // ---- BDS ----
    // BDS octet 4 high nibble, WMO Code Table 11: bit 1 (0x8)
    // grid-point/spherical-harmonic, bit 2 (0x4) simple/complex,
    // bit 3 (0x2) float/INTEGER original type (same unpacking math —
    // allowed), bit 4 (0x1) octet-14 additional flags
    val bdsLen = u24(bytes, o)
    val bdsFlags = u8(bytes, o + 3) >> 4
    require((bdsFlags & 0x08) == 0 || specJ >= 1,
      "spherical-harmonic BDS flag without a type-50 GDS")
    require((bdsFlags & 0x08) != 0 || specJ < 0,
      "type-50 GDS with a grid-point BDS")
    val e = sm16(bytes, o + 4)
    val refR = ibm32(u32(bytes, o + 6))
    val nbits = u8(bytes, o + 10)
    val base = refR / math.pow(10, dScale)
    val factor = math.pow(2, e) / math.pow(10, dScale)
    if ((bdsFlags & 0x08) != 0) {
      require((bdsFlags & 0x01) == 0,
        "additional-flag (octet 14) GRIB1 forms not supported")
      require(bitmap == null, "bitmaps do not apply to spectral data")
      val nVals = 2 * SphericalHarmonics.nCoefficients(specJ, specK, specM)
      val coefs = new Array[Double](nVals)
      if ((bdsFlags & 0x04) == 0) {
        // ---- spherical harmonic coefficients, simple packing (WMO
        // Code Table 11 bit 1; the edition-1 twin of GRIB2 DRS 5.50):
        // octets 12-15 hold the (0,0) real coefficient as an IBM
        // float, the remaining coefficients pack from octet 16.
        require(15 + ((nVals - 1).toLong * nbits + 7) / 8 <= bdsLen,
          s"spectral data ($nVals x $nbits bits) overruns the BDS of $bdsLen octets")
        coefs(0) = ibm32(u32(bytes, o + 11))
        val r = new Grib2.BitReader(bytes, o + 15)
        var ci = 1
        while (ci < nVals) { coefs(ci) = base + r.get(nbits) * factor; ci += 1 }
      } else {
        // ---- COMPLEX spectral packing (Code Table 11 bits 1+2): the
        // GRIBEX sub-spectrum form of the ERA-15/ERA-40 native
        // spectral archives, the edition-1 twin of GRIB2 DRS 5.51.
        // Octet layout pinned by the public eccodes GRIBEX path
        // (definitions/grib1 spectral-complex branch +
        // data_g1complex_packing; the reference reads these through
        // eccodes via formats/grib.py:122-230): BDS octets 12-13 N
        // (1-based BDS octet where packed data begin), 14-15 P (the
        // Laplacian scaling power, sign-magnitude, 10^-3 units — the
        // edition-2 template stores the same quantity in 10^-6),
        // 16/17/18 the sub-spectrum truncation JS/KS/MS (one octet
        // each), 19.. the sub-spectrum coefficients UNPACKED as IBM
        // floats (decimal-scaled like every GRIB1 value), octet N..
        // the remaining coefficients simple-packed after
        // multiplication by (n(n+1))^P:
        // value = (R + X*2^E) * 10^-D / (n(n+1))^P.
        // the public GRIBEX/eccodes complex-packing path rejects
        // pen_j != pen_k != pen_m, so no operational producer emits
        // pentagonal complex-packed fields; the pentagonal form is
        // supported on the simple-packed path only, where the WMO
        // ordering alone pins the layout
        require(specK == specJ,
          s"GRIB1 spectral-complex with pentagonal field truncation " +
            s"J=$specJ K=$specK not supported (triangular fields only, " +
            "matching the operational producer implementation)")
        val pStart = u16(bytes, o + 11)
        val specP = sm16(bytes, o + 13) * 1e-3
        val sJ = u8(bytes, o + 15); val sK = u8(bytes, o + 16); val sM = u8(bytes, o + 17)
        require(sJ == sK && sJ == sM,
          s"unsupported GRIB1 spectral-complex subset truncation JS=$sJ KS=$sK MS=$sM " +
            "(triangular subsets only — operational producers emit JS = KS = MS)")
        require(sJ <= specJ && sJ <= specM,
          s"sub-spectrum truncation $sJ exceeds field truncation J=$specJ M=$specM")
        val nSub = 2 * SphericalHarmonics.nCoefficients(sJ, sJ)
        require(pStart >= 19 + 4 * nSub,
          s"packed-data pointer N=$pStart overlaps the $nSub-value unpacked sub-spectrum")
        require(pStart - 1 + ((nVals - nSub).toLong * nbits + 7) / 8 <= bdsLen,
          s"spectral data (${nVals - nSub} x $nbits bits from octet $pStart) " +
            s"overruns the BDS of $bdsLen octets")
        val dFac = math.pow(10, -dScale)
        // 1/(n(n+1))^P per total wavenumber; n = 0 is always inside
        // the sub-spectrum, so index 0 is never consumed
        val scals = new Array[Double](specJ + 1)
        var sn = 1
        while (sn <= specJ) {
          val op = math.pow(sn.toDouble * (sn + 1), specP)
          // loud failure, matching the decoder's dead-letter-by-name
          // convention: a P extreme enough to under/overflow the
          // double range would silently zero whole wavenumbers
          require(op != 0.0 && !op.isInfinite,
            s"GRIB1 spectral-complex Laplacian scale (n(n+1))^P " +
              s"unrepresentable at n=$sn, P=$specP (operator under/" +
              "overflow would silently zero coefficients)")
          scals(sn) = 1.0 / op
          sn += 1
        }
        var hPos = o + 18 // IBM sub-spectrum block head (octet 19)
        def sub(): Double = { val v = ibm32(u32(bytes, hPos)); hPos += 4; v }
        val r = new Grib2.BitReader(bytes, o + pStart - 1)
        var ci = 0; var m = 0
        while (m <= specM) {
          var n = m
          if (m <= sJ) {
            while (n <= sJ) {
              coefs(ci) = sub() * dFac; coefs(ci + 1) = sub() * dFac
              ci += 2; n += 1
            }
          }
          while (n <= specJ) {
            coefs(ci) = (base + r.get(nbits) * factor) * scals(n)
            coefs(ci + 1) = (base + r.get(nbits) * factor) * scals(n)
            ci += 2; n += 1
          }
          m += 1
        }
        require(ci == nVals, s"spectral-complex walk produced $ci of $nVals values")
      }
      val sdata = SphericalHarmonics.synthesize(coefs, specJ, specK, specM, ni, nj)
      return Grib2.Message(GeoTiff.Raster(ni, nj, sdata, west, north, px, py),
        discipline = 255, category = table, parameter = param,
        refTime = refTime, forecastHours = forecastHours, proj = None,
        lossy = false)
    }
    val nPresent = if (bitmap == null) nPts else bitmap.count(identity)
    val present = new Array[Double](nPresent)
    if ((bdsFlags & 0x04) != 0) {
      // ---- second-order (complex) packing: the GRIBEX BDS form of
      // the ERA-era ECMWF archives. Octets (1-based within the BDS):
      // 12-13 N1 (octet where first-order data begin), 14 extended
      // flags, 15-16 N2 (second-order data), 17-18 P1 (group count),
      // 19-20 P2 (second-order value count), 21 reserved, 22+ the
      // second-order width octets (one per group when "different
      // widths", one total otherwise), then the secondary bitmap
      // (one bit per present point, 1 opens a group) when flagged.
      // Without a secondary bitmap, each grid ROW is a group (the
      // eccodes row-by-row form). value = (R + (FO_g + SO_j)·2^E)/10^D.
      require((bdsFlags & 0x01) != 0,
        "second-order packing requires the octet-14 extended flags")
      val ext = u8(bytes, o + 13)
      require((ext & 0x80) == 0, "matrix-of-values GRIB1 fields not supported")
      require((ext & 0x10) == 0,
        "general extended second-order packing not supported (standard GRIBEX form only)")
      require((ext & 0x08) == 0, "boustrophedonic second-order ordering not supported")
      require((ext & 0x06) == 0,
        "spatial differencing in second-order packing not supported")
      val n1 = u16(bytes, o + 11)
      val n2 = u16(bytes, o + 14)
      val p1 = u16(bytes, o + 16)
      val p2 = u16(bytes, o + 18)
      require(p2 == nPresent,
        s"second-order P2 $p2 does not match $nPresent present points")
      val diffWidths = (ext & 0x20) != 0
      val secBitmap = (ext & 0x40) != 0
      val widths: Array[Int] =
        if (diffWidths) Array.tabulate(p1)(g => u8(bytes, o + 21 + g))
        else Array.fill(p1)(u8(bytes, o + 21))
      val sizes = new Array[Int](p1)
      if (secBitmap) {
        val bmOff = o + 21 + (if (diffWidths) p1 else 1)
        var g = -1; var i = 0
        while (i < nPresent) {
          if (((bytes(bmOff + (i >> 3)) >> (7 - (i & 7))) & 1) == 1) g += 1
          require(g >= 0, "secondary bitmap must open a group at the first point")
          require(g < p1, s"secondary bitmap opens more than P1=$p1 groups")
          sizes(g) += 1
          i += 1
        }
        require(g == p1 - 1, s"secondary bitmap opened ${g + 1} groups, P1=$p1")
      } else {
        // "each row is a group" follows the CONSECUTIVE scan
        // direction: i-consecutive scans group the nj grid rows of ni
        // points; j-consecutive (column-major, bit 0x20) scans group
        // the ni columns of nj points. The bitmap is stored in scan
        // order, so group g's points are the linear run [g·run, (g+1)·run).
        val colMajor = (scanMode & 0x20) != 0
        val nGroups = if (colMajor) ni else nj
        val runLen = if (colMajor) nj else ni
        require(p1 == nGroups,
          s"row-by-row second-order packing expects P1=$nGroups consecutive-" +
            s"direction rows, got $p1")
        var row = 0
        var rowBase = 0
        while (row < nGroups) {
          // a thinned row's run is its own PL count (colMajor is
          // already excluded for thinned grids above)
          val run = if (pl == null) runLen else pl(row)
          var cx = 0
          while (cx < run) {
            if (bitmap == null || bitmap(rowBase + cx)) sizes(row) += 1
            cx += 1
          }
          rowBase += run
          row += 1
        }
      }
      // every bit read must land inside this BDS — a corrupt width or
      // pointer must dead-letter, never stream into the next message
      // N2 marks where second-order data WOULD begin — with zero SO
      // bits (all widths 0) it legally points one past the section
      require(n1 >= 12 && n2 >= n1 && n2 - 1 <= bdsLen,
        s"second-order pointers N1=$n1 N2=$n2 outside BDS of $bdsLen octets")
      require(n1 - 1 + (p1.toLong * nbits + 7) / 8 <= bdsLen,
        s"first-order data ($p1 x $nbits bits at N1=$n1) overruns the BDS")
      val soBitsTotal = (0 until p1).map(g => sizes(g).toLong * widths(g)).sum
      require(n2 - 1 + (soBitsTotal + 7) / 8 <= bdsLen,
        s"second-order data ($soBitsTotal bits at N2=$n2) overruns the BDS")
      val fo = new Array[Long](p1)
      if (nbits > 0) {
        val fr = new Grib2.BitReader(bytes, o + n1 - 1)
        var g = 0
        while (g < p1) { fo(g) = fr.get(nbits); g += 1 }
      }
      val sr = new Grib2.BitReader(bytes, o + n2 - 1)
      var pi2 = 0; var g = 0
      while (g < p1) {
        var j = 0
        while (j < sizes(g)) {
          val so = if (widths(g) == 0) 0L else sr.get(widths(g))
          present(pi2) = base + (fo(g) + so) * factor
          pi2 += 1; j += 1
        }
        g += 1
      }
    } else {
      require((bdsFlags & 0x01) == 0,
        "additional-flag (octet 14) GRIB1 forms not supported")
      if (nbits == 0) java.util.Arrays.fill(present, base) // constant field
      else {
        require(11 + (nPresent.toLong * nbits + 7) / 8 <= bdsLen,
          s"simple-packed data ($nPresent x $nbits bits) overruns the BDS of $bdsLen octets")
        val r = new Grib2.BitReader(bytes, o + 11)
        var i = 0
        while (i < nPresent) { present(i) = base + r.get(nbits) * factor; i += 1 }
      }
    }
    var data = new Array[Float](ni * nj)
    if (pl == null) {
      var i = 0; var pi = 0
      while (i < data.length) {
        if (bitmap != null && !bitmap(i)) data(i) = Float.NaN
        else { data(i) = present(pi).toFloat; pi += 1 }
        i += 1
      }
    } else {
      // expand each thinned row to the widest-row raster by
      // nearest-neighbour along the parallel: column x of the output
      // samples the row point whose center is closest,
      // src = floor((x + 0.5)·nij / ni). NaN (bitmap-absent) points
      // expand like any other value.
      var bi = 0; var pi = 0
      var row = 0
      while (row < nj) {
        val nij = pl(row)
        val tmp = new Array[Float](nij)
        var k = 0
        while (k < nij) {
          if (bitmap != null && !bitmap(bi)) tmp(k) = Float.NaN
          else { tmp(k) = present(pi).toFloat; pi += 1 }
          bi += 1; k += 1
        }
        var x = 0
        while (x < ni) {
          data(row * ni + x) = tmp(math.min(nij - 1,
            ((x + 0.5) * nij / ni).toInt))
          x += 1
        }
        row += 1
      }
    }
    if (scanMode != 0) data = Grib2.fromScanOrder(data, ni, nj, scanMode)
    Grib2.Message(GeoTiff.Raster(ni, nj, data, west, north, px, py),
      discipline = 255, category = table, parameter = param,
      refTime = refTime, forecastHours = forecastHours, proj = proj,
      lossy = pl != null) // row expansion is a resample
  }

  // ---- fixture writer ----------------------------------------------

  /** Encode one message (simple packing; bitmap when the raster holds
    * NaN; lat/lon grid). Gaussian output is not needed for fixtures —
    * decode-side Gaussian coverage rides hand-built GDS bytes in the
    * spec. */
  def write(m: Grib2.Message, decimals: Int = 2, scanMode: Int = 0,
            predefinedGrid: Option[Int] = None): Array[Byte] =
    writeWith(m, decimals, scanMode, predefinedGrid)(scan =>
      simpleBds(scan, decimals))

  /** Second-order (complex) packed fixture, the GRIBEX BDS form of
    * the ERA-era ECMWF archives (see the decode-side comment for the
    * octet map). `rowByRow = true` writes the no-secondary-bitmap
    * variant where each grid row is a group; otherwise present points
    * chunk into `groupLen`-sized groups delimited by the secondary
    * bitmap. `differentWidths` selects per-group second-order width
    * octets vs one shared width. */
  def writeSecondOrder(m: Grib2.Message, decimals: Int = 2,
                       rowByRow: Boolean = false,
                       differentWidths: Boolean = true,
                       groupLen: Int = 13,
                       scanMode: Int = 0): Array[Byte] =
    writeWith(m, decimals, scanMode)(scan =>
      secondOrderBds(scan, m.raster.width, m.raster.height, decimals,
        rowByRow, differentWidths, groupLen))

  /** Thinned (quasi-regular) lat/lon fixture: row j carries
    * `rows(j)` points spanning the full lon range; the GDS declares
    * Ni missing with the per-row PL count list at octet 33 (NV = 0).
    * Geometry is that of the EXPANDED grid: widest row = `ni` columns
    * at `px` degrees. NaN points emit a bitmap (one bit per thinned
    * point). */
  def writeThinned(rows: Seq[Array[Float]], west: Double, north: Double,
                   px: Double, py: Double, table: Int, param: Int,
                   refTime: java.time.LocalDateTime, forecastHours: Int,
                   decimals: Int = 2): Array[Byte] = {
    val nj = rows.length
    require(nj > 0 && rows.forall(_.nonEmpty), "thinned fixture needs non-empty rows")
    val ni = rows.map(_.length).max
    val scan = rows.toArray.flatten
    val hasNaN = scan.exists(_.isNaN)
    def u16wTo(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
      b.write((v >> 8) & 0xff); b.write(v & 0xff)
    }
    def section(body: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      body(b)
      sectionBytes(b.toByteArray)
    }
    val pds = section { b =>
      def w8(v: Int) = b.write(v & 0xff)
      w8(table); w8(98); w8(0); w8(255)
      w8(0x80 | (if (hasNaN) 0x40 else 0)) // GDS present + BMS?
      w8(param)
      w8(1); u16wTo(b, 0)
      val t = refTime
      w8(t.getYear % 100 match { case 0 => 100; case y => y })
      w8(t.getMonthValue); w8(t.getDayOfMonth); w8(t.getHour); w8(t.getMinute)
      w8(1) // hours
      w8(forecastHours); w8(0); w8(0)
      u16wTo(b, 0); w8(0)
      w8((t.getYear - 1) / 100 + 1)
      w8(0)
      u16wTo(b, decimals)
    }
    val northC = north - py / 2
    val southC = northC - (nj - 1) * py
    val westC = west + px / 2
    val eastC = westC + (ni - 1) * px
    val gds = section { b =>
      def w8(v: Int) = b.write(v & 0xff)
      def w16(v: Int) = { w8(v >> 8); w8(v) }
      def w24sm(v: Int) = { val a = if (v < 0) 0x800000 | -v else v; w8(a >> 16); w8(a >> 8); w8(a) }
      w8(0); w8(33) // NV = 0; PV/PL: the PL list starts at GDS octet 33
      w8(0) // lat/lon
      w16(0xffff); w16(nj) // Ni MISSING (thinned), Nj
      w24sm(math.round(northC * 1000).toInt); w24sm(math.round(westC * 1000).toInt)
      w8(0x80)
      w24sm(math.round(southC * 1000).toInt); w24sm(math.round(eastC * 1000).toInt)
      w16(0xffff) // Di missing (derived from the span)
      w16(math.round(py * 1000).toInt)
      w8(0) // scan +i −j
      w24sm(0); w8(0) // reserved through octet 32
      rows.foreach(r => w16(r.length)) // the PL list
    }
    val bms = if (!hasNaN) Array.emptyByteArray else section { b =>
      val unused = (8 - scan.length % 8) % 8
      b.write(unused); b.write(0); b.write(0)
      var acc = 0; var nb = 0
      for (v <- scan) {
        acc = (acc << 1) | (if (v.isNaN) 0 else 1); nb += 1
        if (nb == 8) { b.write(acc); acc = 0; nb = 0 }
      }
      if (nb > 0) b.write(acc << (8 - nb))
    }
    val bds = simpleBds(scan, decimals)
    val body = pds ++ gds ++ bms ++ bds
    val total = 8 + body.length + 4
    val head = new java.io.ByteArrayOutputStream()
    head.write('G'); head.write('R'); head.write('I'); head.write('B')
    head.write(total >> 16); head.write((total >> 8) & 0xff); head.write(total & 0xff)
    head.write(1)
    head.toByteArray ++ body ++ "7777".getBytes
  }

  /** Spherical-harmonic fixture (GDS type 50 + the SH-flagged
    * simple-packed BDS): the edition-1 twin of Grib2.writeSpectral's
    * 5.50 form — (0,0) real part as an IBM float in BDS octets 12-15,
    * the rest simple-packed from octet 16. Coefficients in GRIB order
    * (m = 0..M, n = m..J, (re, im) pairs). */
  def writeSpectral(coefs: Array[Double], j: Int, mMax: Int,
                    table: Int, param: Int,
                    refTime: java.time.LocalDateTime, forecastHours: Int,
                    decimals: Int = 3, k: Int = -1): Array[Byte] = {
    val kk = if (k < 0) j else k // K; default triangular
    val nVals = 2 * SphericalHarmonics.nCoefficients(j, kk, mMax)
    require(coefs.length == nVals,
      s"${coefs.length} coefficient values for truncation J=$j K=$kk M=$mMax (need $nVals)")
    def section(body: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      body(b)
      sectionBytes(b.toByteArray)
    }
    val pds = section { b =>
      def w8(v: Int) = b.write(v & 0xff)
      def w16(v: Int) = { w8(v >> 8); w8(v) }
      w8(table); w8(98); w8(0); w8(255)
      w8(0x80) // GDS present, no BMS
      w8(param)
      w8(1); w16(0) // level type/value
      val t = refTime
      w8(t.getYear % 100 match { case 0 => 100; case y => y })
      w8(t.getMonthValue); w8(t.getDayOfMonth); w8(t.getHour); w8(t.getMinute)
      w8(1) // hours
      w8(forecastHours); w8(0); w8(0)
      w16(0); w8(0)
      w8((t.getYear - 1) / 100 + 1)
      w8(0)
      w16(decimals)
    }
    val gds = section { b =>
      def w8(v: Int) = b.write(v & 0xff)
      def w16(v: Int) = { w8(v >> 8); w8(v) }
      w8(0); w8(255) // NV = 0; no PV/PL
      w8(50) // spherical harmonic coefficients
      w16(j); w16(kk); w16(mMax) // J, K, M
      w8(1); w8(1) // representation type / mode
      (15 to 32).foreach(_ => w8(0)) // reserved through octet 32
    }
    val scale = math.pow(10, decimals)
    val rest = coefs.drop(1)
    val refBits = toIbm32(math.floor(rest.min * scale))
    val refR = ibm32(refBits)
    val xs = rest.map(v => math.round(v * scale - refR))
    require(xs.forall(_ >= 0), "reference value above a coefficient")
    val nbits = math.max(1,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, xs.max))).toInt
    require(nbits <= 24, s"spectral packing width $nbits too wide")
    val bds = {
      val b = new java.io.ByteArrayOutputStream()
      val dataBits = xs.length.toLong * nbits
      val unused = ((8 - dataBits % 8) % 8).toInt
      b.write(0x80 | unused) // flags: SH, simple; unused-bit count
      b.write(0); b.write(0) // E = 0
      writeIbm(b, refBits)
      b.write(nbits)
      writeIbm(b, toIbm32(coefs(0))) // (0,0) real, octets 12-15
      val w = new Grib2.BitWriter(b)
      xs.foreach(x => w.put(x, nbits))
      w.flush()
      sectionBytes(b.toByteArray)
    }
    val body = pds ++ gds ++ bds
    val total = 8 + body.length + 4
    val head = new java.io.ByteArrayOutputStream()
    head.write('G'); head.write('R'); head.write('I'); head.write('B')
    head.write(total >> 16); head.write((total >> 8) & 0xff); head.write(total & 0xff)
    head.write(1)
    head.toByteArray ++ body ++ "7777".getBytes
  }

  /** Complex (GRIBEX sub-spectrum) spherical-harmonic fixture — the
    * edition-1 twin of Grib2.writeSpectralComplex's 5.51 form: BDS
    * octets 12-13 the packed-data pointer N, 14-15 the Laplacian
    * power P (sign-magnitude, 10^-3 units), 16/17/18 the triangular
    * sub-spectrum truncation, 19.. the sub-spectrum UNPACKED as
    * decimal-scaled IBM floats, octet N.. the remainder simple-packed
    * after multiplication by (n(n+1))^P. Coefficients in GRIB order
    * (m = 0..M, n = m..J, (re, im) pairs). */
  def writeSpectralComplex(coefs: Array[Double], j: Int, mMax: Int,
                           subJ: Int, p: Double,
                           table: Int, param: Int,
                           refTime: java.time.LocalDateTime, forecastHours: Int,
                           decimals: Int = 3): Array[Byte] = {
    val nVals = 2 * SphericalHarmonics.nCoefficients(j, mMax)
    require(coefs.length == nVals,
      s"${coefs.length} coefficient values for truncation J=$j M=$mMax (need $nVals)")
    require(subJ >= 0 && subJ < j && subJ <= mMax,
      s"sub-spectrum truncation $subJ must sit inside J=$j M=$mMax")
    // split the GRIB-order walk into sub-spectrum and packed remainder
    val subVals = scala.collection.mutable.ArrayBuffer[Double]()
    val packVals = scala.collection.mutable.ArrayBuffer[(Double, Int)]() // (value, n)
    var ci = 0; var m = 0
    while (m <= mMax) {
      var n = m
      if (m <= subJ) {
        while (n <= subJ) {
          subVals += coefs(ci); subVals += coefs(ci + 1); ci += 2; n += 1
        }
      }
      while (n <= j) {
        packVals += ((coefs(ci), n)); packVals += ((coefs(ci + 1), n)); ci += 2; n += 1
      }
      m += 1
    }
    require(packVals.nonEmpty, "sub-spectrum swallows every coefficient")
    val scale = math.pow(10, decimals)
    val scaled = packVals.map { case (v, n) =>
      v * scale * math.pow(n.toDouble * (n + 1), p)
    }
    val refBits = toIbm32(math.floor(scaled.min))
    val refR = ibm32(refBits)
    val xs = scaled.map(v => math.round(v - refR))
    require(xs.forall(_ >= 0), "reference value above a coefficient")
    val nbits = math.max(1,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, xs.max))).toInt
    require(nbits <= 24, s"spectral packing width $nbits too wide")
    val pds = {
      val b = new java.io.ByteArrayOutputStream()
      def w8(v: Int) = b.write(v & 0xff)
      def w16(v: Int) = { w8(v >> 8); w8(v) }
      w8(table); w8(98); w8(0); w8(255)
      w8(0x80) // GDS present, no BMS
      w8(param)
      w8(1); w16(0) // level type/value
      val t = refTime
      w8(t.getYear % 100 match { case 0 => 100; case y => y })
      w8(t.getMonthValue); w8(t.getDayOfMonth); w8(t.getHour); w8(t.getMinute)
      w8(1) // hours
      w8(forecastHours); w8(0); w8(0)
      w16(0); w8(0)
      w8((t.getYear - 1) / 100 + 1)
      w8(0)
      w16(decimals)
      sectionBytes(b.toByteArray)
    }
    val gds = {
      val b = new java.io.ByteArrayOutputStream()
      def w8(v: Int) = b.write(v & 0xff)
      def w16(v: Int) = { w8(v >> 8); w8(v) }
      w8(0); w8(255) // NV = 0; no PV/PL
      w8(50) // spherical harmonic coefficients
      w16(j); w16(j); w16(mMax) // J, K, M (triangular)
      w8(1); w8(1) // representation type / mode
      (15 to 32).foreach(_ => w8(0)) // reserved through octet 32
      sectionBytes(b.toByteArray)
    }
    val nSub = subVals.length
    val bds = {
      val b = new java.io.ByteArrayOutputStream()
      def w8(v: Int) = b.write(v & 0xff)
      def w16sm(v: Int) = { // sign-magnitude 16
        val mag = math.abs(v)
        w8((if (v < 0) 0x80 else 0) | (mag >> 8)); w8(mag)
      }
      val dataBits = xs.length.toLong * nbits
      val unused = ((8 - dataBits % 8) % 8).toInt
      b.write(0xc0 | unused) // flags: SH, complex; unused-bit count
      b.write(0); b.write(0) // E = 0
      writeIbm(b, refBits)
      b.write(nbits)
      val pStart = 19 + 4 * nSub // packed data right after the IBM block
      b.write(pStart >> 8); b.write(pStart & 0xff) // octets 12-13: N
      w16sm(math.round(p * 1000).toInt) // octets 14-15: P in 10^-3 units
      w8(subJ); w8(subJ); w8(subJ) // octets 16-18: JS/KS/MS
      subVals.foreach(v => writeIbm(b, toIbm32(v * scale)))
      val w = new Grib2.BitWriter(b)
      xs.foreach(x => w.put(x, nbits))
      w.flush()
      sectionBytes(b.toByteArray)
    }
    val body = pds ++ gds ++ bds
    val total = 8 + body.length + 4
    val head = new java.io.ByteArrayOutputStream()
    head.write('G'); head.write('R'); head.write('I'); head.write('B')
    head.write(total >> 16); head.write((total >> 8) & 0xff); head.write(total & 0xff)
    head.write(1)
    head.toByteArray ++ body ++ "7777".getBytes
  }

  /** 3-byte length + even-length padding shared by every section. */
  private def sectionBytes(payload: Array[Byte]): Array[Byte] = {
    val padded = if ((payload.length + 3) % 2 == 0) payload
                 else payload :+ 0.toByte // sections have even length
    val res = new java.io.ByteArrayOutputStream()
    val len = padded.length + 3
    res.write(len >> 16); res.write((len >> 8) & 0xff); res.write(len & 0xff)
    res.write(padded)
    res.toByteArray
  }

  /** Scaled non-negative integer offsets of the present points plus
    * the IBM-encoded reference: the shared front half of every BDS.
    * The reference value must round-trip through IBM encoding, so the
    * offsets are computed against the DECODED encoded minimum. */
  private def scaledOffsets(scan: Array[Float], decimals: Int): (Long, Array[Long]) = {
    val valid = scan.filter(!_.isNaN)
    require(valid.nonEmpty, "all-NaN grid")
    val scale = math.pow(10, decimals)
    val refBits = toIbm32(math.floor(valid.min * scale))
    val refR = ibm32(refBits)
    val xs = valid.map(v => math.round(v * scale - refR))
    require(xs.forall(_ >= 0), "reference value above a data point")
    (refBits, xs)
  }

  private def writeIbm(b: java.io.ByteArrayOutputStream, refBits: Long): Unit = {
    b.write(((refBits >> 24) & 0xff).toInt); b.write(((refBits >> 16) & 0xff).toInt)
    b.write(((refBits >> 8) & 0xff).toInt); b.write((refBits & 0xff).toInt)
  }

  private def simpleBds(scan: Array[Float], decimals: Int): Array[Byte] = {
    val (refBits, xs) = scaledOffsets(scan, decimals)
    val nbits = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, xs.max)))
    require(nbits <= 24, s"simple packing width $nbits too wide")
    val b = new java.io.ByteArrayOutputStream()
    val dataBits = xs.length * nbits
    val unused = (8 - dataBits % 8) % 8
    b.write((0 << 4) | unused) // flag nibble 0 (grid, simple, float)
    b.write(0); b.write(0) // binary scale 0
    writeIbm(b, refBits)
    b.write(nbits)
    val w = new Grib2.BitWriter(b)
    xs.foreach(x => w.put(x, nbits))
    w.flush()
    sectionBytes(b.toByteArray)
  }

  private def secondOrderBds(scan: Array[Float], w0: Int, h0: Int,
                             decimals: Int, rowByRow: Boolean,
                             differentWidths: Boolean, groupLen: Int): Array[Byte] = {
    require(groupLen >= 1, "groupLen >= 1")
    val (refBits, xs) = scaledOffsets(scan, decimals)
    val sizes: Array[Int] =
      if (rowByRow)
        Array.tabulate(h0)(row => (0 until w0).count(cx => !scan(row * w0 + cx).isNaN))
      else {
        val n = xs.length
        Array.tabulate((n + groupLen - 1) / groupLen)(g =>
          math.min(groupLen, n - g * groupLen))
      }
    val p1 = sizes.length
    val fo = new Array[Long](p1); val soW = new Array[Int](p1)
    val so = new Array[Long](xs.length)
    var at = 0
    for (g <- 0 until p1) if (sizes(g) > 0) {
      var mn = Long.MaxValue
      for (j <- 0 until sizes(g)) mn = math.min(mn, xs(at + j))
      fo(g) = mn
      var mx = 0L
      for (j <- 0 until sizes(g)) {
        so(at + j) = xs(at + j) - mn; mx = math.max(mx, so(at + j))
      }
      soW(g) = if (mx == 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(mx)
      at += sizes(g)
    }
    val nbits = math.max(1,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, fo.max)))
    require(nbits <= 24, s"first-order width $nbits too wide")
    val widths: Array[Int] =
      if (differentWidths) soW else Array.fill(p1)(if (p1 == 0) 0 else soW.max)
    val widthBytes = if (differentWidths) p1 else 1
    val secBytes = if (rowByRow) 0 else (xs.length + 7) / 8
    val n1 = 22 + widthBytes + secBytes
    val n2 = n1 + (p1 * nbits + 7) / 8
    require(n2 <= 0xffff, "second-order BDS pointers exceed 16 bits")
    require(p1 <= 0xffff, s"second-order group count $p1 exceeds the 16-bit P1 field")
    require(xs.length <= 0xffff,
      s"second-order point count ${xs.length} exceeds the 16-bit P2 field")
    val soBits = (0 until p1).map(g => sizes(g).toLong * widths(g)).sum
    val unused = ((8 - soBits % 8) % 8).toInt
    val b = new java.io.ByteArrayOutputStream()
    // flag nibble: bit 2 complex (0x4) + bit 4 octet-14 flags (0x1)
    b.write((0x5 << 4) | unused)
    b.write(0); b.write(0) // binary scale 0
    writeIbm(b, refBits)
    b.write(nbits)
    b.write(n1 >> 8); b.write(n1 & 0xff)
    b.write((if (rowByRow) 0 else 0x40) | (if (differentWidths) 0x20 else 0))
    b.write(n2 >> 8); b.write(n2 & 0xff)
    b.write(p1 >> 8); b.write(p1 & 0xff)
    b.write(xs.length >> 8); b.write(xs.length & 0xff)
    b.write(0) // octet 21 reserved
    if (differentWidths) widths.foreach(b.write)
    else b.write(if (p1 == 0) 0 else widths(0))
    if (!rowByRow) { // secondary bitmap: a 1 opens each group
      val bw = new Grib2.BitWriter(b)
      var g2 = 0; var left = 0
      for (_ <- xs.indices) {
        if (left == 0) { bw.put(1, 1); left = sizes(g2); g2 += 1 }
        else bw.put(0, 1)
        left -= 1
      }
      bw.flush()
    }
    val fw = new Grib2.BitWriter(b)
    fo.foreach(v => fw.put(v, nbits))
    fw.flush()
    val sw = new Grib2.BitWriter(b)
    var at2 = 0
    for (g <- 0 until p1) {
      if (widths(g) > 0)
        for (j <- 0 until sizes(g)) sw.put(so(at2 + j), widths(g))
      at2 += sizes(g)
    }
    sw.flush()
    sectionBytes(b.toByteArray)
  }

  private def writeWith(m: Grib2.Message, decimals: Int, scanMode: Int,
                        predefinedGrid: Option[Int] = None)
                       (mkBds: Array[Float] => Array[Byte]): Array[Byte] = {
    require((scanMode & 0x1f) == 0, "edition-1 scan modes use bits 1-3 only")
    val r = m.raster
    predefinedGrid.foreach { id =>
      require(scanMode == 0, "predefined grids scan +i -j (mode 0) by definition")
      val (w, h, d) = predefinedGrids.getOrElse(id,
        throw new IllegalArgumentException(s"no predefined grid $id in the fixture table"))
      require(r.width == w && r.height == h &&
        math.abs(r.px - d) < 1e-9 && math.abs(r.py - d) < 1e-9 &&
        math.abs(r.west - (-d / 2)) < 1e-9 &&
        math.abs(r.north - (90.0 + d / 2)) < 1e-9,
        s"raster geometry does not match predefined grid $id " +
          s"(${w}x$h at $d°, first point 90°/0°)")
    }
    val scan = Grib2.toScanOrder(r.data, r.width, r.height, scanMode)
    val hasNaN = scan.exists(_.isNaN)

    def section(body: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      body(b)
      sectionBytes(b.toByteArray)
    }
    def u16wTo(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
      b.write((v >> 8) & 0xff); b.write(v & 0xff)
    }
    // PDS
    val pds = section { b =>
      def w8(v: Int) = b.write(v & 0xff)
      w8(m.category) // table version
      w8(98) // centre (ECMWF — fixture convention)
      w8(0)  // generating process
      w8(predefinedGrid.getOrElse(255)) // grid id (255: none, GDS present)
      val gdsBit = if (predefinedGrid.isEmpty) 0x80 else 0
      w8(gdsBit | (if (hasNaN) 0x40 else 0)) // flags: GDS? + BMS?
      w8(m.parameter)
      w8(1); u16wTo(b, 0) // level type sfc, level 0
      val t = m.refTime
      w8(t.getYear % 100 match { case 0 => 100; case y => y })
      w8(t.getMonthValue); w8(t.getDayOfMonth); w8(t.getHour); w8(t.getMinute)
      w8(1) // unit: hours
      require(m.forecastHours >= 0 && m.forecastHours <= 255,
        s"fixture writer emits one-octet P1 forecast hours (0-255), got ${m.forecastHours}")
      w8(m.forecastHours); w8(0); w8(0) // P1, P2, range indicator 0
      u16wTo(b, 0) // number in average
      w8(0) // missing from averages
      w8((t.getYear - 1) / 100 + 1) // century
      w8(0) // subcentre
      u16wTo(b, decimals) // decimal scale (non-negative here)
    }
    // GDS: lat/lon. First/last points are the SCAN start/end corners:
    // a -i scan (0x80) starts at the east edge, a +j scan (0x40) at
    // the south — the decoder anchors west/north from these plus the
    // scan mode, so a writer pinning NW->SE regardless of scan would
    // mis-georeference every non-default mode.
    val northC = r.north - r.py / 2
    val southC = northC - (r.height - 1) * r.py
    val westC = r.west + r.px / 2
    val eastC = westC + (r.width - 1) * r.px
    val la1 = math.round((if ((scanMode & 0x40) != 0) southC else northC) * 1000).toInt
    val la2 = math.round((if ((scanMode & 0x40) != 0) northC else southC) * 1000).toInt
    val lo1 = math.round((if ((scanMode & 0x80) != 0) eastC else westC) * 1000).toInt
    val lo2 = math.round((if ((scanMode & 0x80) != 0) westC else eastC) * 1000).toInt
    val gds = section { b =>
      def w8(v: Int) = b.write(v & 0xff)
      def w16(v: Int) = { w8(v >> 8); w8(v) }
      def w24sm(v: Int) = { val a = if (v < 0) 0x800000 | -v else v; w8(a >> 16); w8(a >> 8); w8(a) }
      w8(0); w8(255) // NV, PV: none
      w8(0) // grid type 0: lat/lon
      w16(r.width); w16(r.height)
      w24sm(la1); w24sm(lo1)
      w8(0x80) // resolution flags: directions given
      w24sm(la2); w24sm(lo2)
      w16(math.round(r.px * 1000).toInt); w16(math.round(r.py * 1000).toInt)
      w8(scanMode)
      w24sm(0); w8(0) // reserved
    }
    // BMS
    val bms = if (!hasNaN) Array.emptyByteArray else section { b =>
      val nBits = scan.length
      val unused = (8 - nBits % 8) % 8
      b.write(unused)
      b.write(0); b.write(0) // table reference 0: bitmap follows
      var acc = 0; var nb = 0
      for (v <- scan) {
        acc = (acc << 1) | (if (v.isNaN) 0 else 1); nb += 1
        if (nb == 8) { b.write(acc); acc = 0; nb = 0 }
      }
      if (nb > 0) b.write(acc << (8 - nb))
    }
    val bds = mkBds(scan)
    val body = pds ++
      (if (predefinedGrid.isEmpty) gds else Array.emptyByteArray) ++ bms ++ bds
    val total = 8 + body.length + 4
    val head = new java.io.ByteArrayOutputStream()
    head.write('G'); head.write('R'); head.write('I'); head.write('B')
    head.write(total >> 16); head.write((total >> 8) & 0xff); head.write(total & 0xff)
    head.write(1) // edition
    head.toByteArray ++ body ++ "7777".getBytes
  }
}
