package graft.sources

import java.nio.ByteBuffer

/** Minimal self-contained GRIB2 codec: edition-2 messages on a regular
  * lat/lon grid (template 3.0), projected grids (3.10 Mercator, 3.20
  * polar stereographic, 3.30 Lambert conformal — the NCEP
  * HRRR/NAM/RAP continental shape), Gaussian grids (3.40 regular +
  * reduced), space-view/geostationary grids (3.90 — the
  * Meteosat/GOES/Himawari full-disc family, CGMS perspective
  * geometry), and azimuthal equidistant grids (3.110 — radar-centric
  * products), all exposing exact per-pixel lon/lat through the
  * non-affine decoder hook;
  * product template 4.0, an optional bitmap (section 6) carrying
  * nodata, and these data representations:
  *
  *  - template 5.0  simple packing
  *  - template 5.2  complex packing (group splitting)
  *  - template 5.3  complex packing + spatial differencing (order 1/2)
  *    — the representation most operational feeds (ECMWF/NCEP) ship.
  *  - template 5.41 PNG packing (8/16-bit grayscale, 24-bit RGB,
  *    32-bit RGBA; full five-filter decode) — self-contained JVM PNG
  *    codec, no imageio.
  *  - template 5.40 JPEG2000 packing (single tile/component — the
  *    eccodes jasper/openjpeg shape) via the self-contained
  *    [[Jpeg2000]] codec: lossless (reversible 5/3) exactly, and lossy
  *    (compression type 1, irreversible 9/7 — e.g. MRMS) as the
  *    nearest-integer reconstruction with `Message.lossy` set.
  *  - template 5.200 run-length packing with level values (the
  *    radar/nowcast products JMA distributes): level-table lookup +
  *    base-(2^n−1−MV) run digits, exact at the declared decimal scale
  *  - template 5.42 CCSDS/AEC packing (the Rice coder ECMWF's open
  *    data ships) via the self-contained [[Ccsds]] codec.
  *
  * Written from the public WMO FM 92 GRIB-2 specification — no
  * eccodes/cfgrib on the JVM (the reference's decode path,
  * formats/grib.py:37-230, keys variables by (discipline, category,
  * number) which we surface as the VariableKey triple).
  *
  * Section-3 scanning-mode flags (octet 72) are parsed and normalized:
  * All 16 scanning-mode flag combinations — ±i (0x80), ±j (0x40),
  * consecutive-j column-major (0x20) and boustrophedon alternating
  * lines (0x10) — decode to the canonical north-up/west-east raster.
  *
  * Complex-packing stream layout (templates 7.2/7.3): each of the group
  * reference / width / length streams is byte-aligned; for 5.3 the data
  * section leads with the `order` original first values and the overall
  * minimum of the differences (sign-magnitude, octet-49-sized), and the
  * groups pack the remaining (n_present − order) offset differences.
  */
object Grib2 {

  /** Projected-grid parameters. When present, the raster's
    * west/north/px/py frame is PROJECTED METERS on the declared sphere
    * and per-pixel lon/lat comes from [[lonLatArrays]]; when absent the
    * frame is the regular lat/lon degrees of template 3.0. */
  sealed trait GridProj
  /** Lambert conformal (template 3.30 — NCEP HRRR/NAM/RAP). */
  case class LccProj(radius: Double, lov: Double,
                     latin1: Double, latin2: Double, lad: Double) extends GridProj
  /** North-aspect polar stereographic (template 3.20 — the NCEP
    * Alaska/sea-ice grids; true scale at `lad`, down-axis `lov`). */
  case class PsProj(radius: Double, lov: Double, lad: Double) extends GridProj
  /** Azimuthal equidistant (template 3.110 — radar-centric products:
    * the grid plane is tangent at (`latC`, `lonC`) and radial distance
    * from the center is TRUE, so range rings are concentric circles). */
  case class AeqdProj(radius: Double, latC: Double, lonC: Double) extends GridProj
  /** Mercator (template 3.10 — tropical-band products, e.g. the NWS
    * Pacific/Caribbean sector grids): true scale at `lad`; `lon0` is
    * the frame's zero-x meridian (the declared first point's
    * longitude). */
  case class MercProj(radius: Double, lon0: Double, lad: Double) extends GridProj
  /** Global regular Gaussian grid (template 3.40 — ECMWF's native
    * spectral-output grid): longitudes affine, latitudes at the 2N
    * Gauss–Legendre abscissae. The raster frame stores a NOMINAL
    * north/py (exact latitudes come from [[lonLatArrays]]). */
  case class GaussianGrid(n: Int) extends GridProj
  /** Global REDUCED Gaussian grid (template 3.40 with a points-per-row
    * list — the ECMWF HRES octahedral family, e.g. O1280): row j
    * carries pl(j) points spanning the full circle from 0°E at spacing
    * 360/pl(j). The raster is the max(pl)-wide rectangle with ragged
    * tails NaN-padded — no resampling, the real points keep their
    * exact coordinates through [[lonLatArrays]] and the padding never
    * survives the long-form explode (NaN cells are dropped). */
  case class ReducedGaussianGrid(n: Int, pl: Seq[Int]) extends GridProj
  /** Space-view / geostationary perspective (template 3.90 — the
    * Meteosat/GOES/Himawari full-disc imagery family): the satellite
    * sits `nr` equatorial radii from the earth CENTER over
    * (0°N, `lop`). The raster frame is SCAN-ANGLE RADIANS (px/py are
    * per-grid-length angular steps, west/north anchor the
    * sub-satellite point at angle zero); exact per-pixel lon/lat
    * comes from the CGMS geostationary inverse in [[lonLatArrays]],
    * with off-disc (space) pixels → NaN coordinates — such pixels are
    * bitmap-missing in any real product, so they never survive the
    * long-form explode. */
  case class SpaceViewProj(re: Double, rp: Double, lop: Double, nr: Double) extends GridProj
  /** Rotated lat/lon (template 3.1 — the COSMO/ICON/CORDEX regional
    * family): the raster frame is ROTATED degrees; true per-pixel
    * lon/lat comes from the pole rotation in [[lonLatArrays]].
    * `spLat`/`spLon` are the declared south pole of projection. */
  case class RotatedLatLonProj(spLat: Double, spLon: Double) extends GridProj

  /** `lossy` marks fields unpacked from an IRREVERSIBLE codestream
    * (5.40 compression type 1): values are the codec's nearest-integer
    * reconstruction, not the producer's exact scaled integers —
    * exactness-sensitive consumers filter on it. */
  /** `variant` distinguishes statistically-derived products of the
    * same parameter in variable naming: a 4.9 probability-of-
    * precipitation field is NOT precipitation, so it must not collide
    * with the 4.0 deterministic variable ("" deterministic, "_prob"
    * 4.5/4.9, "_pct" 4.10, "_sp" 4.15). */
  case class Message(raster: GeoTiff.Raster,
                     discipline: Int, category: Int, parameter: Int,
                     refTime: java.time.LocalDateTime, forecastHours: Int,
                     proj: Option[GridProj] = None,
                     lossy: Boolean = false,
                     variant: String = "")

  /** Exact per-pixel (lon, lat) at pixel centers for non-affine grids
    * (None for regular lat/lon — the affine path needs no arrays). */
  def lonLatArrays(m: Message): Option[(Array[Double], Array[Double])] =
    m.proj.map { p =>
      val r = m.raster
      val lons = new Array[Double](r.width * r.height)
      val lats = new Array[Double](r.width * r.height)
      p match {
        case GaussianGrid(nPar) =>
          // lon affine, lat from the Gaussian table (north→south — the
          // raster is already normalized north-up)
          val glats = gaussLatsCached(2 * nPar)
          var y = 0
          while (y < r.height) {
            val lat = glats(y)
            var x = 0
            while (x < r.width) {
              lons(y * r.width + x) = r.west + (x + 0.5) * r.px
              lats(y * r.width + x) = lat
              x += 1
            }
            y += 1
          }
        case ReducedGaussianGrid(nPar, pl) =>
          // each row spans the full circle from 0°E at its own spacing;
          // padded tail cells get out-of-row coordinates but are NaN in
          // the raster and never survive the long-form explode
          val glats = gaussLatsCached(2 * nPar)
          var y = 0
          while (y < r.height) {
            val lat = glats(y)
            val step = 360.0 / pl(y)
            var x = 0
            while (x < r.width) {
              lons(y * r.width + x) = x * step
              lats(y * r.width + x) = lat
              x += 1
            }
            y += 1
          }
        case _ =>
          val inv: (Double, Double) => (Double, Double) = p match {
            case LccProj(rad, lov, l1, l2, lad) =>
              graft.ops.Geo.invLambertConformalConicSph(rad, l1, l2, lad, lov)
            case PsProj(rad, lov, lad) =>
              graft.ops.Geo.invPolarStereographicSph(rad, lov, lad)
            case AeqdProj(rad, latC, lonC) =>
              graft.ops.Geo.invAzimuthalEquidistantSph(rad, latC, lonC)
            case MercProj(rad, lon0, lad) =>
              graft.ops.Geo.invMercatorSph(rad, lon0, lad)
            case SpaceViewProj(re, rp, lop, nr) =>
              graft.ops.Geo.invGeostationary(re, rp, lop, nr * re)
            case RotatedLatLonProj(spLat, spLon) =>
              graft.ops.Geo.invRotatedPole(spLat, spLon)
            case _ => throw new IllegalStateException("handled above")
          }
          var y = 0
          while (y < r.height) {
            val py = r.north - (y + 0.5) * r.py
            var x = 0
            while (x < r.width) {
              val (lon, lat) = inv(r.west + (x + 0.5) * r.px, py)
              lons(y * r.width + x) = lon; lats(y * r.width + x) = lat
              x += 1
            }
            y += 1
          }
      }
      (lons, lats)
    }

  /** Gaussian latitudes are O(n²) to compute (Newton × Legendre
    * recurrence) — memoized per parallel count so a 10⁶-granule feed
    * on one executor pays the table once, not per file. Bounded: the
    * operational grids use a handful of resolutions. */
  private val gaussCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Double]]()
  private[sources] def gaussLatsCached(n: Int): Array[Double] = {
    if (gaussCache.size() > 64) gaussCache.clear()
    gaussCache.computeIfAbsent(n, graft.ops.Geo.gaussianLatitudes)
  }

  def canHandle(b: Array[Byte]): Boolean =
    b.length > 8 && b(0) == 'G' && b(1) == 'R' && b(2) == 'I' && b(3) == 'B' &&
      (b(7) & 0xff) == 2 // octet 8 = edition; edition 1 routes to Grib1

  /** Nominal group size for complex packing (encoder choice). */
  private val GroupLen = 20

  // ---- encode ------------------------------------------------------

  /** Encode a message. `packing` ∈ {0 (simple), 2 (complex), 3 (complex
    * + 2nd-order spatial differencing)}; Y = (R + X·2^E)/10^D with D
    * decimal digits preserved; NaN cells go to the section-6 bitmap.
    * `scanMode` writes the grid in the given scanning order (0x40 = +j
    * rows south→north, 0x80 = -i within rows) for codec testing — the
    * raster handed in is always canonical north-up.
    * `j2kQuantShift`: with packing 40, Some(n) switches section 7 to
    * the IRREVERSIBLE 9/7 codestream (compression type 1) quantized at
    * Δ = 2^n per subband nominal range — the lossy form rate-limited
    * producers emit. */
  def write(m: Message, decimals: Int = 2, packing: Int = 0,
            scanMode: Int = 0, j2kQuantShift: Option[Int] = None,
            missingMgmt: Int = 0, sdOrder: Int = 2,
            productTemplate: Int = 0,
            ensMember: Int = 1, ensDerived: Int = 0): Array[Byte] = {
    require(Set(0, 2, 3, 40, 41, 42, 200).contains(packing), s"unsupported packing $packing")
    require(Set(0, 1, 2, 5, 9, 10, 15).contains(productTemplate),
      s"fixture writer emits product templates 4.0/1/2/5/9/10/15 only, got 4.$productTemplate")
    require(j2kQuantShift.isEmpty || packing == 40,
      "j2kQuantShift only applies to JPEG2000 packing (40)")
    require(missingMgmt == 0 || (missingMgmt == 1 && (packing == 2 || packing == 3)),
      "missingMgmt 1 (primary in-group markers) applies to complex packing only")
    require(sdOrder == 1 || sdOrder == 2, "spatial differencing order must be 1 or 2")
    val r = m.raster
    val reducedPl: Option[Seq[Int]] =
      m.proj.collect { case rg: ReducedGaussianGrid => rg.pl }
    val n = reducedPl.map(_.sum).getOrElse(r.width * r.height)
    // reorder into scan order (writer side of the normalization
    // contract); reduced grids slice the ragged rows out of the padded
    // rectangle instead (scan mode 0 only — enforced at the reader too)
    val scanData = reducedPl match {
      case Some(pl) =>
        require(scanMode == 0, "reduced Gaussian grids write scan mode 0 only")
        require(pl.length == r.height && pl.max <= r.width,
          s"row list (${pl.length} rows, max ${pl.max}) does not fit ${r.width}x${r.height}")
        val out = new Array[Float](pl.sum)
        var dst = 0
        var jj = 0
        while (jj < r.height) {
          Array.copy(r.data, jj * r.width, out, dst, pl(jj))
          dst += pl(jj)
          jj += 1
        }
        out
      case None => toScanOrder(r.data, r.width, r.height, scanMode)
    }
    val valid = scanData.filter(!_.isNaN)
    require(valid.nonEmpty, "all-NaN grid")
    val scale = math.pow(10, decimals)
    val ref = math.floor(valid.min * scale)
    val present = scanData.filter(!_.isNaN).map(v => math.round(v * scale - ref))
    val hasNaN = scanData.exists(_.isNaN)

    val sections = scala.collection.mutable.Buffer[Array[Byte]]()
    def sec(num: Int)(body: java.io.ByteArrayOutputStream => Unit): Unit = {
      val b = new java.io.ByteArrayOutputStream()
      body(b)
      val payload = b.toByteArray
      val bb = ByteBuffer.allocate(5 + payload.length)
      bb.putInt(5 + payload.length).put(num.toByte).put(payload)
      sections += bb.array()
    }
    def bu8(b: java.io.ByteArrayOutputStream, v: Int) = b.write(v & 0xff)
    def bu16(b: java.io.ByteArrayOutputStream, v: Int) = { bu8(b, v >> 8); bu8(b, v) }
    def bu32(b: java.io.ByteArrayOutputStream, v: Long) = {
      bu8(b, (v >> 24).toInt); bu8(b, (v >> 16).toInt); bu8(b, (v >> 8).toInt); bu8(b, v.toInt)
    }
    def bs16(b: java.io.ByteArrayOutputStream, v: Int) = {
      val a = math.abs(v); bu16(b, if (v < 0) a | 0x8000 else a)
    }
    def bs32(b: java.io.ByteArrayOutputStream, v: Long) = {
      val a = math.abs(v); bu32(b, if (v < 0) a | 0x80000000L else a)
    }
    def bitsFor(x: Long): Int =
      math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, x)))

    sec(1) { b => // identification
      bu16(b, 0); bu16(b, 0) // centre, subcentre
      bu8(b, 2); bu8(b, 1); bu8(b, 1) // tables, local tables, ref time sig
      bu16(b, m.refTime.getYear); bu8(b, m.refTime.getMonthValue)
      bu8(b, m.refTime.getDayOfMonth); bu8(b, m.refTime.getHour)
      bu8(b, m.refTime.getMinute); bu8(b, m.refTime.getSecond)
      bu8(b, 0); bu8(b, 1) // production status, data type
    }
    m.proj match {
      case None =>
        sec(3) { b => // grid definition, template 3.0 lat/lon
          val northCenter = r.north - r.py / 2
          val southCenter = r.north - r.py * r.height + r.py / 2
          val westCenter = r.west + r.px / 2
          val eastCenter = r.west + r.px * r.width - r.px / 2
          val (la1, la2) = if ((scanMode & 0x40) != 0) (southCenter, northCenter)
                           else (northCenter, southCenter)
          val (lo1, lo2) = if ((scanMode & 0x80) != 0) (eastCenter, westCenter)
                           else (westCenter, eastCenter)
          bu8(b, 0); bu32(b, n); bu8(b, 0); bu8(b, 0); bu16(b, 0)
          bu8(b, 6); bu8(b, 0); bu32(b, 0); bu8(b, 0); bu32(b, 0); bu8(b, 0); bu32(b, 0)
          bu32(b, r.width); bu32(b, r.height); bu32(b, 0); bu32(b, 0)
          bs32(b, math.round(la1 * 1e6)); bs32(b, math.round(lo1 * 1e6))
          bu8(b, 0x30)
          bs32(b, math.round(la2 * 1e6)); bs32(b, math.round(lo2 * 1e6))
          bu32(b, math.round(r.px * 1e6)); bu32(b, math.round(r.py * 1e6))
          bu8(b, scanMode)
        }
      case Some(rot: RotatedLatLonProj) =>
        sec(3) { b => // template 3.1: the 3.0 octets + pole of rotation
          val northCenter = r.north - r.py / 2
          val southCenter = r.north - r.py * r.height + r.py / 2
          val westCenter = r.west + r.px / 2
          val eastCenter = r.west + r.px * r.width - r.px / 2
          val (la1, la2) = if ((scanMode & 0x40) != 0) (southCenter, northCenter)
                           else (northCenter, southCenter)
          val (lo1, lo2) = if ((scanMode & 0x80) != 0) (eastCenter, westCenter)
                           else (westCenter, eastCenter)
          bu8(b, 0); bu32(b, n); bu8(b, 0); bu8(b, 0); bu16(b, 1)
          bu8(b, 6); bu8(b, 0); bu32(b, 0); bu8(b, 0); bu32(b, 0); bu8(b, 0); bu32(b, 0)
          bu32(b, r.width); bu32(b, r.height); bu32(b, 0); bu32(b, 0)
          bs32(b, math.round(la1 * 1e6)); bs32(b, math.round(lo1 * 1e6))
          bu8(b, 0x30)
          bs32(b, math.round(la2 * 1e6)); bs32(b, math.round(lo2 * 1e6))
          bu32(b, math.round(r.px * 1e6)); bu32(b, math.round(r.py * 1e6))
          bu8(b, scanMode)
          bs32(b, math.round(rot.spLat * 1e6)); bs32(b, math.round(rot.spLon * 1e6))
          bu32(b, 0) // rotation angle
        }
      case Some(rg: ReducedGaussianGrid) =>
        sec(3) { b => // template 3.40 + points-per-row list (O-grids)
          val glats = graft.ops.Geo.gaussianLatitudes(2 * rg.n)
          require(r.height == 2 * rg.n,
            s"reduced Gaussian raster carries ${r.height} rows for N=${rg.n}")
          bu8(b, 0); bu32(b, n)
          bu8(b, 2) // octets per list entry
          bu8(b, 1) // interpretation: number of points per row
          bu16(b, 40)
          bu8(b, 6); bu8(b, 0); bu32(b, 0); bu8(b, 0); bu32(b, 0); bu8(b, 0); bu32(b, 0)
          bu32(b, 0xFFFFFFFFL) // Ni: missing (varies per row)
          bu32(b, r.height); bu32(b, 0); bu32(b, 0)
          bs32(b, math.round(glats.head * 1e6)); bs32(b, 0) // first point 0°E
          bu8(b, 0x30)
          bs32(b, math.round(glats.last * 1e6))
          bs32(b, math.round((360.0 - 360.0 / rg.pl.last) * 1e6)) // last point
          bu32(b, 0xFFFFFFFFL) // Di: missing
          bu32(b, rg.n)
          bu8(b, scanMode)
          rg.pl.foreach(p => bu16(b, p)) // the row list follows the template
        }
      case Some(g: GaussianGrid) =>
        sec(3) { b => // grid definition, template 3.40 regular Gaussian
          val glats = graft.ops.Geo.gaussianLatitudes(2 * g.n)
          require(r.height == 2 * g.n,
            s"Gaussian raster carries ${r.height} rows for N=${g.n}")
          val (la1, la2) = if ((scanMode & 0x40) != 0) (glats.last, glats.head)
                           else (glats.head, glats.last)
          val westCenter = r.west + r.px / 2
          val eastCenter = r.west + r.px * r.width - r.px / 2
          val (lo1, lo2) = if ((scanMode & 0x80) != 0) (eastCenter, westCenter)
                           else (westCenter, eastCenter)
          bu8(b, 0); bu32(b, n); bu8(b, 0); bu8(b, 0); bu16(b, 40)
          bu8(b, 6); bu8(b, 0); bu32(b, 0); bu8(b, 0); bu32(b, 0); bu8(b, 0); bu32(b, 0)
          bu32(b, r.width); bu32(b, r.height); bu32(b, 0); bu32(b, 0)
          bs32(b, math.round(la1 * 1e6)); bs32(b, math.round(lo1 * 1e6))
          bu8(b, 0x30)
          bs32(b, math.round(la2 * 1e6)); bs32(b, math.round(lo2 * 1e6))
          bu32(b, math.round(r.px * 1e6)) // Di
          bu32(b, g.n)                    // N replaces Dj
          bu8(b, scanMode)
        }
      case Some(sv: SpaceViewProj) =>
        sec(3) { b => // template 3.90 space view / geostationary
          require(sv.re == sv.rp, "fixture writer emits spherical space-view only")
          // recover the grid geometry from the scan-angle raster frame
          val dxGl = math.round(2.0 * math.asin(1.0 / sv.nr) / r.px)
          val dyGl = math.round(2.0 * math.asin(1.0 / sv.nr) / r.py)
          val xpC = -r.west / r.px - 0.5 // west edge → center coordinate
          val ypC = r.north / r.py - 0.5
          val xpScan = if ((scanMode & 0x80) != 0) r.width - 1 - xpC else xpC
          val ypScan = if ((scanMode & 0x40) != 0) r.height - 1 - ypC else ypC
          def lonE(v: Double) = if (v < 0) v + 360 else v
          bu8(b, 0); bu32(b, n); bu8(b, 0); bu8(b, 0); bu16(b, 90)
          bu8(b, 1); bu8(b, 0); bu32(b, math.round(sv.re)) // shape 1: scaled sphere
          bu8(b, 0); bu32(b, 0); bu8(b, 0); bu32(b, 0)
          bu32(b, r.width); bu32(b, r.height)
          bs32(b, 0) // Lap: equatorial sub-satellite point
          bs32(b, math.round(lonE(sv.lop) * 1e6))
          bu8(b, 0x08) // resolution/component flags
          bu32(b, dxGl); bu32(b, dyGl)
          bu32(b, math.round(xpScan * 1000)); bu32(b, math.round(ypScan * 1000))
          bu8(b, scanMode)
          bu32(b, 0) // grid orientation
          bu32(b, math.round(sv.nr * 1e6))
          bu32(b, 0); bu32(b, 0) // Xo / Yo sector offsets
        }
      case Some(mp: MercProj) =>
        sec(3) { b => // grid definition, template 3.10 Mercator
          val inv = graft.ops.Geo.invMercatorSph(mp.radius, mp.lon0, mp.lad) _
          // first/last points per scan order, projected meters at centers
          val xFirst = if ((scanMode & 0x80) != 0) r.west + r.px * r.width - r.px / 2
                       else r.west + r.px / 2
          val yFirst = if ((scanMode & 0x40) != 0) r.north - r.py * r.height + r.py / 2
                       else r.north - r.py / 2
          val xLast = if ((scanMode & 0x80) != 0) r.west + r.px / 2
                      else r.west + r.px * r.width - r.px / 2
          val yLast = if ((scanMode & 0x40) != 0) r.north - r.py / 2
                      else r.north - r.py * r.height + r.py / 2
          val (lo1, la1) = inv(xFirst, yFirst)
          val (lo2, la2) = inv(xLast, yLast)
          def lonE(v: Double) = if (v < 0) v + 360 else v
          bu8(b, 0); bu32(b, n); bu8(b, 0); bu8(b, 0); bu16(b, 10)
          bu8(b, 1); bu8(b, 0); bu32(b, math.round(mp.radius))
          bu8(b, 0); bu32(b, 0); bu8(b, 0); bu32(b, 0)
          bu32(b, r.width); bu32(b, r.height)
          bs32(b, math.round(la1 * 1e6)); bs32(b, math.round(lonE(lo1) * 1e6))
          bu8(b, 0x08) // resolution/component flags
          bs32(b, math.round(mp.lad * 1e6))
          bs32(b, math.round(la2 * 1e6)); bs32(b, math.round(lonE(lo2) * 1e6))
          bu8(b, scanMode)
          bu32(b, 0) // orientation: i along equator
          bu32(b, math.round(r.px * 1000)); bu32(b, math.round(r.py * 1000)) // mm
        }
      case Some(p) =>
        sec(3) { b => // grid definition, template 3.20/3.30 projected
          // first point per scan order, projected meters at pixel center
          val xFirst = if ((scanMode & 0x80) != 0) r.west + r.px * r.width - r.px / 2
                       else r.west + r.px / 2
          val yFirst = if ((scanMode & 0x40) != 0) r.north - r.py * r.height + r.py / 2
                       else r.north - r.py / 2
          val (lo1, la1) = (p match {
            case LccProj(rad, lov, l1, l2, lad) =>
              graft.ops.Geo.invLambertConformalConicSph(rad, l1, l2, lad, lov) _
            case PsProj(rad, lov, lad) =>
              graft.ops.Geo.invPolarStereographicSph(rad, lov, lad) _
            case AeqdProj(rad, latC, lonC) =>
              graft.ops.Geo.invAzimuthalEquidistantSph(rad, latC, lonC) _
            case _ => throw new IllegalStateException("handled above")
          })(xFirst, yFirst)
          def lonE(v: Double) = if (v < 0) v + 360 else v // GRIB 0..360 east
          val (tmpl, lad, lov, radius) = p match {
            case l: LccProj  => (30, l.lad, l.lov, l.radius)
            case s: PsProj   => (20, s.lad, s.lov, s.radius)
            case a: AeqdProj => (110, a.latC, a.lonC, a.radius)
            case _ => throw new IllegalStateException("handled above")
          }
          bu8(b, 0); bu32(b, n); bu8(b, 0); bu8(b, 0); bu16(b, tmpl)
          // earth shape 1: sphere with declared scaled radius
          bu8(b, 1); bu8(b, 0); bu32(b, math.round(radius))
          bu8(b, 0); bu32(b, 0); bu8(b, 0); bu32(b, 0)
          bu32(b, r.width); bu32(b, r.height)
          bs32(b, math.round(la1 * 1e6)); bs32(b, math.round(lonE(lo1) * 1e6))
          bu8(b, 0x08) // resolution/component flags: u/v grid-relative
          bs32(b, math.round(lad * 1e6)); bs32(b, math.round(lonE(lov) * 1e6))
          bu32(b, math.round(r.px * 1000)); bu32(b, math.round(r.py * 1000)) // mm
          bu8(b, 0) // projection centre: north pole
          bu8(b, scanMode)
          p match {
            case l: LccProj =>
              bs32(b, math.round(l.latin1 * 1e6)); bs32(b, math.round(l.latin2 * 1e6))
              bs32(b, -90 * 1000000L); bu32(b, 0) // southern pole (unused)
            case _: PsProj | _: AeqdProj => // 3.20/3.110 end at the scanning mode
            case other => throw new IllegalStateException(s"handled above: $other")
          }
        }
    }
    sec(4) { b => // product definition: the shared 4.0 body (octets
      // 6-34), then the template-specific tail for 4.9/4.15
      bu16(b, 0); bu16(b, productTemplate)
      bu8(b, m.category); bu8(b, m.parameter)
      bu8(b, 0); bu8(b, 0); bu8(b, 0); bu16(b, 0); bu8(b, 0)
      bu8(b, 1) // time unit: hours
      bu32(b, m.forecastHours)
      bu8(b, 1); bu8(b, 0); bu32(b, 0); bu8(b, 255); bu8(b, 0); bu32(b, 0)
      def probBlock(): Unit = { // octets 35-47 shared by 4.5/4.9
        bu8(b, 0); bu8(b, 1); bu8(b, 1) // prob 0 of 1, type 1 (> lower)
        bu8(b, 0); bu32(b, 10) // lower limit: scale 0, value 10
        bu8(b, 0); bu32(b, 0) // upper limit (unused for type 1)
      }
      def intervalBlock(): Unit = { // the 4.8-style time-interval tail
        val e = m.refTime.plusHours(m.forecastHours)
        bu16(b, e.getYear); bu8(b, e.getMonthValue); bu8(b, e.getDayOfMonth)
        bu8(b, e.getHour); bu8(b, e.getMinute); bu8(b, e.getSecond)
        bu8(b, 1); bu32(b, 0) // one time range, 0 values missing
        bu8(b, 1); bu8(b, 2) // statistical process 1, increment type 2
        bu8(b, 1); bu32(b, m.forecastHours) // range length (hours)
        bu8(b, 1); bu32(b, 0) // increment (hours), 0
      }
      productTemplate match {
        case 0 => ()
        case 1 => // individual ensemble member: type, perturbation, total
          bu8(b, 3); bu8(b, ensMember); bu8(b, 8)
        case 2 => // derived ensemble: derived type (0 mean/4 spread), total
          bu8(b, ensDerived); bu8(b, 8)
        case 5 => probBlock() // probability at a point in time
        case 9 => probBlock(); intervalBlock() // probability over interval
        case 10 => bu8(b, 50); intervalBlock() // 50th percentile over interval
        case 15 => // spatially processed: statistical process, spatial
          // processing type, number of points used
          bu8(b, 0); bu8(b, 0); bu8(b, 4)
        case t => throw new IllegalStateException(s"guarded above: 4.$t")
      }
    }

    // ---- packing-specific sections 5 + 7 ----
    if (packing == 40) {
      // JPEG2000 packing (template 5.40): the scaled integers become a
      // lossless (reversible 5/3) single-component codestream — (W, H)
      // when every point is present, (nPresent, 1) under a bitmap (the
      // same g2lib shape convention as the PNG path below).
      require(present.nonEmpty, "JPEG2000 packing needs at least one present point")
      val maxX = present.max
      val nbits = bitsFor(maxX)
      sec(5) { b =>
        bu32(b, n); bu16(b, 40)
        bu32(b, java.lang.Float.floatToIntBits(ref.toFloat).toLong & 0xffffffffL)
        bs16(b, 0); bs16(b, decimals)
        bu8(b, nbits); bu8(b, 0)
        bu8(b, if (j2kQuantShift.isDefined) 1 else 0) // compression type
        bu8(b, 255) // target compression ratio: missing
      }
      writeBitmap(sec, scanData, hasNaN, bu8)
      val (iw, ih) = if (hasNaN) (present.length, 1) else (r.width, r.height)
      sec(7) { b =>
        b.write(j2kQuantShift match {
          case Some(qs) => Jpeg2000.encode(present.map(_.toInt), iw, ih, nbits,
            irreversible = true, quantShift = qs)
          case None => Jpeg2000.encode(present.map(_.toInt), iw, ih, nbits)
        })
      }
    } else if (packing == 42) {
      // CCSDS/AEC packing (template 5.42, ECMWF's default): the scaled
      // integers stream through the Rice coder with the eccodes/libaec
      // parameter shape — preprocessing on, 32-sample blocks, RSI 128.
      require(present.nonEmpty, "CCSDS packing needs at least one present point")
      val nbits = math.max(1, bitsFor(present.max))
      val (jBlk, rsiBlk, fl) = (32, 128, Ccsds.FlagPreprocess)
      sec(5) { b =>
        bu32(b, n); bu16(b, 42)
        bu32(b, java.lang.Float.floatToIntBits(ref.toFloat).toLong & 0xffffffffL)
        bs16(b, 0); bs16(b, decimals)
        bu8(b, nbits); bu8(b, 0)
        bu8(b, fl); bu8(b, jBlk); bu16(b, rsiBlk)
      }
      writeBitmap(sec, scanData, hasNaN, bu8)
      sec(7) { b =>
        b.write(Ccsds.encode(present.map(_.toInt), nbits, jBlk, rsiBlk, fl))
      }
    } else if (packing == 41) {
      // PNG packing (template 5.41): the scaled integers become a PNG
      // image — (W, H) grayscale/RGB(A) when every point is present,
      // (nPresent, 1) when a bitmap carries nodata (g2lib convention).
      val maxX = if (present.isEmpty) 1L else present.max
      val depth = bitsFor(maxX) match {
        case b if b <= 8 => 8
        case b if b <= 16 => 16
        case b if b <= 24 => 24
        case _ => 32
      }
      sec(5) { b =>
        bu32(b, n); bu16(b, 41)
        bu32(b, java.lang.Float.floatToIntBits(ref.toFloat).toLong & 0xffffffffL)
        bs16(b, 0); bs16(b, decimals)
        bu8(b, depth); bu8(b, 0)
      }
      writeBitmap(sec, scanData, hasNaN, bu8)
      val (iw, ih) = if (hasNaN) (present.length, 1) else (r.width, r.height)
      sec(7) { b => b.write(PngCodec.encode(present, iw, ih, depth)) }
    } else if (packing == 200) {
      // Run-length packing with level values (template 5.200 — the
      // radar/nowcast products JMA distributes): the data section is a
      // stream of nbits-wide symbols where 0 = missing, 1..MV = level
      // table entries, and symbols above MV are little-endian
      // base-(2^nbits−1−MV) digits of (run length − 1) for the
      // preceding level. The level table holds the distinct scaled
      // values, so the round-trip is exact at `decimals` precision.
      val scaledAll = scanData.filter(!_.isNaN).map(v => math.round(v * scale))
      val levels = scaledAll.distinct.sorted
      require(levels.forall(l => l >= 0 && l <= 0xffff),
        "5.200 level values must fit unsigned 16 bits after scaling")
      val mv = levels.length
      val nbits = math.max(8, bitsFor(mv + 2L))
      val rng = (1 << nbits) - 1 - mv
      val symOf = levels.zipWithIndex.map { case (l, i) => l -> (i + 1) }.toMap
      sec(5) { b =>
        bu32(b, n); bu16(b, 200)
        bu8(b, nbits); bu16(b, mv); bu16(b, mv); bu8(b, decimals)
        levels.foreach(l => bu16(b, l.toInt))
      }
      writeBitmap(sec, scanData, hasNaN, bu8)
      sec(7) { b =>
        val w = new BitWriter(b)
        val syms = scaledAll.map(symOf)
        var i = 0
        while (i < syms.length) {
          val s0 = syms(i)
          var j = i + 1
          while (j < syms.length && syms(j) == s0) j += 1
          w.put(s0.toLong, nbits)
          var rem = (j - i - 1).toLong
          while (rem > 0) { w.put(mv + 1 + (rem % rng), nbits); rem /= rng }
          i = j
        }
        w.flush()
      }
    } else if (packing == 0) {
      val maxX = if (present.isEmpty) 1L else present.max
      val nbits = bitsFor(maxX)
      sec(5) { b =>
        bu32(b, n); bu16(b, 0)
        bu32(b, java.lang.Float.floatToIntBits(ref.toFloat).toLong & 0xffffffffL)
        bs16(b, 0); bs16(b, decimals)
        bu8(b, nbits); bu8(b, 0)
      }
      writeBitmap(sec, scanData, hasNaN, bu8)
      sec(7) { b =>
        val w = new BitWriter(b)
        present.foreach(x => w.put(x, nbits))
        w.flush()
      }
    } else {
      val order = if (packing == 3) sdOrder else 0
      val mvm = missingMgmt
      // with missing-value management the NaN points stay IN the
      // packed stream as in-group markers (the wgrib2/NCEP shape)
      // instead of traveling in a bitmap
      val pts: Array[Long] =
        if (mvm == 0) present
        else scanData.map(v => if (v.isNaN) 0L else math.round(v * scale - ref))
      val ptMiss: Array[Boolean] =
        if (mvm == 0) new Array[Boolean](pts.length) else scanData.map(_.isNaN)
      val nmIdx = pts.indices.filter(j => !ptMiss(j)).toArray
      require(nmIdx.length > order, "too few points for spatial differencing")
      // spatial differencing over the NON-MISSING chain (identical to
      // the plain chain when nothing is missing)
      val diffed = pts.clone()
      if (order == 2) {
        var t = nmIdx.length - 1
        while (t >= 2) {
          val j = nmIdx(t)
          diffed(j) = pts(j) - 2 * pts(nmIdx(t - 1)) + pts(nmIdx(t - 2))
          t -= 1
        }
      } else if (order == 1) {
        var t = nmIdx.length - 1
        while (t >= 1) {
          diffed(nmIdx(t)) = pts(nmIdx(t)) - pts(nmIdx(t - 1))
          t -= 1
        }
      }
      // standard wire form (g2lib compack / eccodes): the packed group
      // stream covers ALL points — the first `order` (non-missing)
      // slots pack as ZERO (their original values travel in the extra
      // descriptors and overwrite these slots at decode) and the
      // overall minimum is taken over the differenced tail only
      val firstVals = nmIdx.take(order).map(pts)
      val tailIdx = nmIdx.drop(order)
      val gmin = if (order > 0) tailIdx.map(diffed).min else 0L
      val offset = new Array[Long](pts.length)
      tailIdx.foreach(j => offset(j) = diffed(j) - gmin)
      // group split boundaries: the `order` zero placeholders get
      // their OWN width-0 group when they lead the stream (otherwise
      // they'd widen whichever group they land in) — lengths go
      // non-uniform through the scaled-length stream (lbits)
      val cuts = scala.collection.mutable.Buffer[Int](0)
      if (order > 0 && mvm == 0) cuts += order
      while (cuts.last < pts.length)
        cuts += math.min(cuts.last + GroupLen, pts.length)
      val ng = cuts.length - 1
      val ranges = (0 until ng).map(k => (cuts(k), cuts(k + 1)))
      // per group: reference/width over the non-missing members; the
      // all-ones symbol at the group width marks a missing point, so a
      // group holding one needs width >= 1 and a spread clear of the
      // marker; an all-missing group is a width-0 group whose
      // reference is all-ones at the reference width (patched below)
      val legitMin = ranges.map { case (lo, hi) =>
        var m = Long.MaxValue
        var j = lo; while (j < hi) { if (!ptMiss(j) && offset(j) < m) m = offset(j); j += 1 }
        m
      }
      val widths = ranges.zipWithIndex.map { case ((lo, hi), k) =>
        if (legitMin(k) == Long.MaxValue) 0
        else {
          var mx = 0L; var hasMiss = false
          var j = lo
          while (j < hi) {
            if (ptMiss(j)) hasMiss = true
            else if (offset(j) - legitMin(k) > mx) mx = offset(j) - legitMin(k)
            j += 1
          }
          val w0 = if (mx == 0) 0 else bitsFor(mx)
          if (mvm == 0) w0
          else {
            // under missing management the all-ones symbol is the
            // marker in EVERY group (decoders check unconditionally),
            // so a legitimate maximum may never collide with it — not
            // just in groups that happen to contain a missing point
            val w1 = if (hasMiss) math.max(1, w0) else w0
            if (w1 > 0 && mx == (1L << w1) - 1) w1 + 1 else w1
          }
        }
      }.toArray
      val legitRefs = legitMin.filter(_ != Long.MaxValue)
      val nbitsRef = {
        var nb = bitsFor(math.max(1L, legitRefs.max))
        if (mvm > 0 && legitRefs.exists(_ == (1L << nb) - 1)) nb += 1
        nb
      }
      val msng1 = (1L << nbitsRef) - 1
      val refs = legitMin.map(v => if (v == Long.MaxValue) msng1 else v).toArray
      val wref = widths.min
      val wbits = { val mx = widths.max - wref; if (mx == 0) 0 else bitsFor(mx.toLong) }
      val lens = ranges.map { case (lo, hi) => hi - lo }.toArray
      val lastLen = lens.last
      val lref = if (ng == 1) lens.head else lens.init.min
      val linc = 1
      val lbits =
        if (ng == 1) 0
        else { val mx = lens.init.map(_ - lref).max; if (mx == 0) 0 else bitsFor(mx.toLong) }
      // ds: octets for the sign-magnitude descriptors (z values + gmin)
      val descMax = (firstVals :+ math.abs(gmin)).map(math.abs).max
      val ds = math.max(1, (bitsFor(descMax) + 1 + 7) / 8)

      sec(5) { b =>
        bu32(b, n); bu16(b, packing)
        bu32(b, java.lang.Float.floatToIntBits(ref.toFloat).toLong & 0xffffffffL)
        bs16(b, 0); bs16(b, decimals)
        bu8(b, nbitsRef); bu8(b, 0)
        bu8(b, 1) // group splitting method: general
        bu8(b, mvm) // missing value management
        // primary missing substitute (decoders mask it; cfgrib → NaN)
        bu32(b, if (mvm > 0) java.lang.Float.floatToIntBits(9999.0f).toLong & 0xffffffffL else 0L)
        bu32(b, 0) // secondary substitute (unused at mvm <= 1)
        bu32(b, ng)
        bu8(b, wref); bu8(b, wbits)
        bu32(b, lref); bu8(b, linc); bu32(b, lastLen)
        bu8(b, lbits)
        if (packing == 3) { bu8(b, order); bu8(b, ds) }
      }
      if (mvm > 0) sec(6)(b => bu8(b, 255)) // markers in-stream, no bitmap
      else writeBitmap(sec, scanData, hasNaN, bu8)
      sec(7) { b =>
        def sm(v: Long): Unit = { // sign-magnitude over ds octets
          val a = math.abs(v) | (if (v < 0) 1L << (ds * 8 - 1) else 0L)
          var k = ds - 1
          while (k >= 0) { bu8(b, ((a >> (k * 8)) & 0xff).toInt); k -= 1 }
        }
        if (packing == 3) { firstVals.foreach(sm); sm(gmin) }
        val w = new BitWriter(b)
        refs.foreach(x => w.put(x, nbitsRef)); w.flush()
        if (wbits > 0) { widths.foreach(x => w.put((x - wref).toLong, wbits)); w.flush() }
        if (lbits > 0) {
          // ng scaled lengths; the last is overwritten from lastLen at
          // decode (and may undershoot lref), so write 0 for it
          lens.init.foreach(l => w.put((l - lref).toLong, lbits))
          w.put(0L, lbits)
          w.flush()
        }
        for ((k, (lo, hi)) <- ranges.zipWithIndex.map(_.swap); j <- lo until hi)
          if (widths(k) > 0) {
            if (ptMiss(j)) w.put((1L << widths(k)) - 1, widths(k))
            else w.put(offset(j) - refs(k), widths(k))
          }
        w.flush()
      }
    }

    val body = sections.toArray.flatten
    val total = 16L + body.length + 4
    val head = ByteBuffer.allocate(16)
    head.put("GRIB".getBytes).putShort(0).put(m.discipline.toByte).put(2.toByte)
      .putLong(total)
    head.array() ++ body ++ "7777".getBytes
  }

  /** Spectral fixture: sections 3.50/5.50/7.50 around the coefficient
    * array (GRIB order — m = 0..M, n = m..J, (real, imag) pairs; the
    * (0,0) real part rides unpacked in the DRS template).
    *
    * `complexSubJ >= 0` switches to DRS 5.51 (spectral complex
    * packing, the ECMWF native wire form): coefficients with
    * m, n <= complexSubJ ride as a raw IEEE-32 block; the rest pack
    * like 5.0 AFTER multiplication by (n(n+1))^laplacianP. */
  def writeSpectral(coefs: Array[Double], j: Int, mMax: Int,
                    discipline: Int, category: Int, parameter: Int,
                    refTime: java.time.LocalDateTime, forecastHours: Int,
                    decimals: Int = 3, complexSubJ: Int = -1,
                    laplacianP: Double = 0.5, k: Int = -1): Array[Byte] = {
    val kk = if (k < 0) j else k // K; default triangular
    val nVals = 2 * SphericalHarmonics.nCoefficients(j, kk, mMax)
    require(coefs.length == nVals,
      s"${coefs.length} coefficient values for truncation J=$j K=$kk M=$mMax (need $nVals)")
    val sections = scala.collection.mutable.Buffer[Array[Byte]]()
    def sec(num: Int)(body: java.io.ByteArrayOutputStream => Unit): Unit = {
      val b = new java.io.ByteArrayOutputStream()
      body(b)
      val payload = b.toByteArray
      val bb = ByteBuffer.allocate(5 + payload.length)
      bb.putInt(5 + payload.length).put(num.toByte).put(payload)
      sections += bb.array()
    }
    def bu8(b: java.io.ByteArrayOutputStream, v: Int) = b.write(v & 0xff)
    def bu16(b: java.io.ByteArrayOutputStream, v: Int) = { bu8(b, v >> 8); bu8(b, v) }
    def bu32(b: java.io.ByteArrayOutputStream, v: Long) = {
      bu8(b, (v >> 24).toInt); bu8(b, (v >> 16).toInt); bu8(b, (v >> 8).toInt); bu8(b, v.toInt)
    }
    sec(1) { b =>
      bu16(b, 0); bu16(b, 0)
      bu8(b, 2); bu8(b, 1); bu8(b, 1)
      bu16(b, refTime.getYear); bu8(b, refTime.getMonthValue)
      bu8(b, refTime.getDayOfMonth); bu8(b, refTime.getHour)
      bu8(b, refTime.getMinute); bu8(b, refTime.getSecond)
      bu8(b, 0); bu8(b, 1)
    }
    sec(3) { b => // grid definition template 3.50
      bu8(b, 0); bu32(b, nVals); bu8(b, 0); bu8(b, 0); bu16(b, 50)
      bu32(b, j); bu32(b, kk); bu32(b, mMax) // J, K, M
      bu8(b, 1) // representation type: associated Legendre, 1st kind
      bu8(b, 1) // representation mode: complex coefficients, m >= 0
    }
    sec(4) { b => // product definition 4.0 (shared body)
      bu16(b, 0); bu16(b, 0)
      bu8(b, category); bu8(b, parameter)
      bu8(b, 0); bu8(b, 0); bu8(b, 0); bu16(b, 0); bu8(b, 0)
      bu8(b, 1); bu32(b, forecastHours)
      bu8(b, 1); bu8(b, 0); bu32(b, 0); bu8(b, 255); bu8(b, 0); bu32(b, 0)
    }
    val scale = math.pow(10, decimals)
    if (complexSubJ < 0) {
      // ---- DRS 5.50: simple packing of all values except the
      // leading (0,0) real part
      val rest = coefs.drop(1)
      val ref = if (rest.isEmpty) 0.0 else math.floor(rest.min * scale)
      val xs = rest.map(v => math.round(v * scale - ref))
      val nbits =
        if (xs.isEmpty) 0
        else math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, xs.max)))
      require(nbits <= 24, s"spectral packing width $nbits too wide")
      sec(5) { b => // DRS template 5.50
        bu32(b, nVals); bu16(b, 50)
        bu32(b, java.lang.Float.floatToIntBits(ref.toFloat).toLong & 0xffffffffL)
        bu16(b, 0) // binary scale 0
        bu16(b, decimals) // decimal scale (non-negative here)
        bu8(b, nbits)
        bu32(b, java.lang.Float.floatToIntBits(coefs(0).toFloat).toLong & 0xffffffffL)
      }
      sec(6) { b => bu8(b, 255) } // no bitmap
      sec(7) { b =>
        val w = new BitWriter(b)
        xs.foreach(x => w.put(x, nbits))
        w.flush()
      }
    } else {
      // ---- DRS 5.51: split the coefficient walk into the IEEE
      // subset (m, n <= complexSubJ) and the Laplacian-scaled packed
      // remainder, exactly as the reader expects to re-walk it
      val subJ = complexSubJ
      require(kk == j, "5.51 fixtures are triangular-only, like the producer")
      require(subJ <= j && subJ <= mMax,
        s"5.51 fixture subset $subJ exceeds truncation J=$j M=$mMax")
      val ieeeVals = scala.collection.mutable.ArrayBuffer[Double]()
      val packedScaled = scala.collection.mutable.ArrayBuffer[Double]()
      var ci = 0
      for (m <- 0 to mMax) {
        var n = m
        if (m <= subJ) {
          while (n <= subJ) {
            ieeeVals += coefs(ci) * scale; ieeeVals += coefs(ci + 1) * scale
            ci += 2; n += 1
          }
        }
        while (n <= j) {
          val op = math.pow(n.toDouble * (n + 1), laplacianP)
          packedScaled += coefs(ci) * scale * op
          packedScaled += coefs(ci + 1) * scale * op
          ci += 2; n += 1
        }
      }
      require(ci == nVals)
      val ref = if (packedScaled.isEmpty) 0.0 else math.floor(packedScaled.min)
      val xs = packedScaled.map(v => math.round(v - ref))
      val nbits =
        if (xs.isEmpty) 0
        else math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, xs.max)))
      require(nbits <= 24, s"5.51 packing width $nbits too wide")
      val pMicro = math.round(laplacianP * 1e6)
      sec(5) { b => // DRS template 5.51
        bu32(b, nVals); bu16(b, 51)
        bu32(b, java.lang.Float.floatToIntBits(ref.toFloat).toLong & 0xffffffffL)
        bu16(b, 0) // binary scale 0
        bu16(b, decimals)
        bu8(b, nbits)
        // P in 10^-6 units, sign-magnitude like every GRIB2 signed int
        bu32(b, if (pMicro >= 0) pMicro else 0x80000000L | -pMicro)
        bu16(b, subJ); bu16(b, subJ); bu16(b, subJ) // Js = Ks = Ms
        bu32(b, ieeeVals.length) // Ts
        bu8(b, 1) // precision: IEEE 32-bit
      }
      sec(6) { b => bu8(b, 255) } // no bitmap
      sec(7) { b =>
        ieeeVals.foreach(v =>
          bu32(b, java.lang.Float.floatToIntBits(v.toFloat).toLong & 0xffffffffL))
        val w = new BitWriter(b)
        xs.foreach(x => w.put(x, nbits))
        w.flush()
      }
    }
    val body = sections.toArray.flatten
    val total = 16L + body.length + 4
    val head = ByteBuffer.allocate(16)
    head.put("GRIB".getBytes).putShort(0).put(discipline.toByte).put(2.toByte)
      .putLong(total)
    head.array() ++ body ++ "7777".getBytes
  }

  private def writeBitmap(sec: Int => (java.io.ByteArrayOutputStream => Unit) => Unit,
                          data: Array[Float], hasNaN: Boolean,
                          bu8: (java.io.ByteArrayOutputStream, Int) => Unit): Unit =
    sec(6) { b =>
      if (!hasNaN) bu8(b, 255)
      else {
        bu8(b, 0)
        var acc = 0; var nb = 0
        for (v <- data) {
          acc = (acc << 1) | (if (v.isNaN) 0 else 1); nb += 1
          if (nb == 8) { bu8(b, acc); acc = 0; nb = 0 }
        }
        if (nb > 0) bu8(b, acc << (8 - nb))
      }
    }

  private[sources] class BitWriter(b: java.io.ByteArrayOutputStream) {
    private var acc = 0L; private var nb = 0
    def put(x: Long, bits: Int): Unit = {
      acc = (acc << bits) | (x & ((1L << bits) - 1)); nb += bits
      while (nb >= 8) { b.write(((acc >> (nb - 8)) & 0xff).toInt); nb -= 8 }
    }
    def flush(): Unit = { if (nb > 0) { b.write(((acc << (8 - nb)) & 0xff).toInt); nb = 0 }; acc = 0L }
  }

  private[sources] class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0L; private var nb = 0
    def get(bits: Int): Long = {
      if (bits == 0) return 0L
      while (nb < bits) { acc = (acc << 8) | (bytes(pos) & 0xffL); pos += 1; nb += 8 }
      val v = (acc >> (nb - bits)) & ((1L << bits) - 1); nb -= bits; v
    }
    def align(): Unit = { acc = 0L; nb = 0 }
  }

  /** Position of canonical pixel (row, col) — row 0 = north, col 0 =
    * west — in the declared scan sequence. Handles all four flag bits
    * of the GRIB2 scanning mode (table 3.4): 0x80 −i (east→west),
    * 0x40 +j (south→north), 0x20 consecutive-j (column-major), 0x10
    * boustrophedon (adjacent rows — or columns, under 0x20 — scan in
    * opposite directions; the FIRST scan line uses the declared
    * direction). */
  private def scanIndex(row: Int, col: Int, w: Int, h: Int, mode: Int): Int = {
    val rScan = if ((mode & 0x40) != 0) h - 1 - row else row
    val cScan = if ((mode & 0x80) != 0) w - 1 - col else col
    if ((mode & 0x20) == 0) {
      val c = if ((mode & 0x10) != 0 && rScan % 2 == 1) w - 1 - cScan else cScan
      rScan * w + c
    } else {
      val r = if ((mode & 0x10) != 0 && cScan % 2 == 1) h - 1 - rScan else rScan
      cScan * h + r
    }
  }

  /** Canonical north-up row-major grid → declared scan order (writer). */
  private[sources] def toScanOrder(data: Array[Float], w: Int, h: Int, mode: Int): Array[Float] = {
    if (mode == 0) return data
    val out = new Array[Float](data.length)
    var row = 0
    while (row < h) {
      var col = 0
      while (col < w) {
        out(scanIndex(row, col, w, h, mode)) = data(row * w + col)
        col += 1
      }
      row += 1
    }
    out
  }

  /** Declared scan order → canonical north-up row-major grid (reader). */
  private[sources] def fromScanOrder(data: Array[Float], w: Int, h: Int, mode: Int): Array[Float] = {
    if (mode == 0) return data
    val out = new Array[Float](data.length)
    var row = 0
    while (row < h) {
      var col = 0
      while (col < w) {
        out(row * w + col) = data(scanIndex(row, col, w, h, mode))
        col += 1
      }
      row += 1
    }
    out
  }

  // ---- decode ------------------------------------------------------

  /** Real GRIB files concatenate messages (one per variable/level/step);
    * split on the Section-0 total-length field and decode each. */
  def readAll(bytes: Array[Byte]): Seq[Message] = {
    val out = scala.collection.mutable.Buffer[Message]()
    var pos = 0
    while (pos + 16 <= bytes.length &&
           bytes(pos) == 'G' && bytes(pos + 1) == 'R' &&
           bytes(pos + 2) == 'I' && bytes(pos + 3) == 'B') {
      val total = ByteBuffer.wrap(bytes, pos + 8, 8).getLong.toInt
      out += read(java.util.Arrays.copyOfRange(bytes, pos, pos + total))
      pos += total
    }
    out.toSeq
  }

  def read(bytes: Array[Byte]): Message = {
    require(canHandle(bytes), "not GRIB")
    val discipline = bytes(6) & 0xff
    require((bytes(7) & 0xff) == 2, "only GRIB2")
    var pos = 16
    var width = 0; var height = 0
    var west = 0.0; var north = 0.0; var px = 1.0; var py = 1.0
    var scanMode = 0
    var proj: Option[GridProj] = None
    var tmpl5 = 0
    var refR = 0.0f; var e = 0; var d = 0; var nbits = 0
    // complex-packing (5.2/5.3) parameters
    var ng = 0; var wref = 0; var wbits = 0
    var lref = 0; var linc = 0; var lastLen = 0; var lbits = 0
    var order = 0; var ds = 0; var mvMgmt = 0
    // CCSDS (5.42) parameters
    var ccsdsFlags = 0; var ccsdsJ = 0; var ccsdsRsi = 0
    // run-length (5.200) parameters
    var rlNbits = 0; var rlMv = 0; var rlMvl = 0; var rlDec = 0
    var rlLevels: Array[Int] = null
    // spectral (3.50/5.50/5.51) parameters
    var specJ = -1; var specK = -1; var specM = -1; var p00 = 0.0f
    var specP = 0.0; var specSubJ = -1; var specTs = 0; var specPrec = 1
    var lossyField = false
    var variant = ""
    var category = 0; var parameter = 0; var forecastHours = 0
    var refTime = java.time.LocalDateTime.MIN
    var bitmap: Array[Boolean] = null
    var data: Array[Float] = null
    var nPts = 0

    def u16(o: Int) = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    def u32(o: Int): Long = ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
      ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    def s16(o: Int): Int = { val v = u16(o); if ((v & 0x8000) != 0) -(v & 0x7fff) else v }
    def s32(o: Int): Long = { val v = u32(o); if ((v & 0x80000000L) != 0) -(v & 0x7fffffffL) else v }

    while (pos < bytes.length - 4) {
      if (new String(bytes, pos, math.min(4, bytes.length - pos)) == "7777") { pos = bytes.length }
      else {
        val len = u32(pos).toInt
        // a corrupt length ≤ the 5-byte section header (or negative via
        // overflow) would re-parse the same bytes forever — the decode
        // loop must always make forward progress
        require(len > 5, s"implausible section length $len at offset $pos")
        val num = bytes(pos + 4) & 0xff
        val o = pos + 5
        num match {
          case 1 =>
            refTime = java.time.LocalDateTime.of(u16(o + 7), bytes(o + 9) & 0xff,
              bytes(o + 10) & 0xff, bytes(o + 11) & 0xff, bytes(o + 12) & 0xff,
              bytes(o + 13) & 0xff)
          case 3 =>
            nPts = u32(o + 1).toInt
            require(nPts > 0 && nPts <= (1 << 26),
              s"implausible point count $nPts (corrupt section 3?)")
            val tmpl3 = u16(o + 7)
            // an unknown grid template must fail loudly: parsing its
            // octets with another template's layout would SILENTLY
            // mis-georeference every pixel
            require(tmpl3 == 0 || tmpl3 == 1 || tmpl3 == 10 || tmpl3 == 20 ||
                tmpl3 == 30 || tmpl3 == 40 || tmpl3 == 50 || tmpl3 == 90 ||
                tmpl3 == 110,
              s"unsupported grid definition template 3.$tmpl3 " +
                "(supported: 3.0 lat/lon, 3.1 rotated lat/lon, 3.10 Mercator, " +
                "3.20 polar stereo, 3.30 Lambert, 3.40 Gaussian, " +
                "3.50 spherical harmonics, 3.90 space view, " +
                "3.110 azimuthal equidistant)")
            if (tmpl3 == 50) {
              // ---- spherical harmonic coefficients (spectral-native
              // model output). J/K/M pentagonal resolution; the data
              // are complex coefficients, synthesized to a
              // truncation-sized global lat/lon raster — see
              // SphericalHarmonics for the convention and the
              // reference comparison.
              specJ = u32(o + 9).toInt
              specK = u32(o + 13).toInt
              specM = u32(o + 17).toInt
              val repType = bytes(o + 21) & 0xff
              val repMode = bytes(o + 22) & 0xff
              require(repType == 1,
                s"spectral representation type $repType not supported " +
                  "(1 = associated Legendre functions of the first kind)")
              require(repMode == 1,
                s"spectral representation mode $repMode not supported " +
                  "(1 = complex coefficients, m >= 0)")
              // general pentagonal resolution (J, K, M): retained
              // coefficients m = 0..M, n = m..min(J + m, K), covering
              // triangular (K = J = M), rhomboidal (K = J + M) and
              // trapezoidal (K = J > M). K beyond J + M adds no
              // representable coefficient, so it is rejected as
              // implausible rather than decoded as an empty band.
              require(specJ >= 1 && specJ <= 2047 &&
                  specM >= 0 && specM <= specJ &&
                  specK >= specJ && specK <= specJ + specM,
                s"unsupported spectral truncation J=$specJ K=$specK M=$specM " +
                  "(pentagonal J <= K <= J+M, M <= J, J <= 2047)")
              require(nPts == 2 * SphericalHarmonics.nCoefficients(specJ, specK, specM),
                s"spectral point count $nPts does not match truncation " +
                  s"J=$specJ K=$specK M=$specM " +
                  s"(${2 * SphericalHarmonics.nCoefficients(specJ, specK, specM)} values)")
              // synthesis raster sized by the truncation's band limit
              // in total wavenumber (K; = J for triangular)
              width = 2 * (specK + 1); height = specK + 1
              px = 360.0 / width; py = 180.0 / height
              west = -180.0; north = 90.0
              scanMode = 0
            } else {
            width = u32(o + 25).toInt; height = u32(o + 29).toInt
            // corrupt dimension octets must dead-letter, not OOM the
            // executor with a multi-GiB allocation (width is checked
            // after the reduced-grid branch may overwrite it)
            require(height > 0 && height <= (1 << 24),
              s"implausible grid height $height")
            if (tmpl3 == 0 || tmpl3 == 1) {
              val la1 = s32(o + 41) / 1e6; val lo1 = s32(o + 45) / 1e6
              val la2 = s32(o + 50) / 1e6; val lo2 = s32(o + 54) / 1e6
              px = u32(o + 58) / 1e6; py = u32(o + 62) / 1e6
              scanMode = bytes(o + 66) & 0xff
              // bounds from whichever corner is north/west, not from
              // assuming the first point is NW (in ROTATED degrees for
              // 3.1 — the affine frame lives in the rotated system)
              west = math.min(lo1, lo2) - px / 2
              north = math.max(la1, la2) + py / 2
              if (tmpl3 == 1) { // rotated lat/lon: pole + rotation angle
                val spLat = s32(o + 67) / 1e6
                val spLon = s32(o + 71) / 1e6
                require(u32(o + 75) == 0,
                  "rotated lat/lon with a nonzero rotation angle not supported " +
                    "(COSMO/CORDEX grids declare 0)")
                proj = Some(RotatedLatLonProj(spLat, spLon))
              }
            } else if (tmpl3 == 40) { // global Gaussian (ECMWF F- and O-grids)
              val la1 = s32(o + 41) / 1e6; val lo1 = s32(o + 45) / 1e6
              val nPar = u32(o + 62).toInt // N: parallels pole→equator
              scanMode = bytes(o + 66) & 0xff
              require(height == 2 * nPar,
                s"regional Gaussian subsets not supported ($height rows for N=$nPar; " +
                  "global grids carry Nj = 2N)")
              // gaussianLatitudes is O(N^2) Newton x Legendre — a corrupt
              // granule with a huge but self-consistent N must dead-letter
              // promptly, not hang the executor. 8192 covers F/O2560
              // (N=2560) with generous margin over any operational grid.
              require(nPar >= 1 && nPar <= 8192,
                s"implausible Gaussian grid N=$nPar (operational max is O(2560))")
              val glats = gaussLatsCached(2 * nPar)
              // the declared first/last points must sit on the table —
              // anything else means a subset or a different grid family
              require(math.abs(math.max(la1, s32(o + 50) / 1e6) - glats(0)) < 1e-3,
                f"first Gaussian parallel != table head ${glats(0)}%.4f")
              val listOctets = bytes(o + 5) & 0xff
              val listInterp = bytes(o + 6) & 0xff
              if (listOctets > 0) { // REDUCED grid: points-per-row list
                require(listInterp == 1,
                  s"optional-list interpretation $listInterp not supported (1 = points per row)")
                require(listOctets == 2 || listOctets == 4,
                  s"unsupported list octet width $listOctets")
                require(scanMode == 0,
                  f"reduced Gaussian grids support scan mode 0 only, got 0x$scanMode%02x")
                val pl = IndexedSeq.tabulate(height) { jj =>
                  val base = o + 67 + jj * listOctets
                  if (listOctets == 2) u16(base) else u32(base).toInt
                }
                require(pl.forall(_ > 0), "zero-point row in reduced-grid list")
                width = pl.max
                px = 360.0 / width // nominal; exact lon is per-row
                west = 0.0
                py = (glats(0) - glats(height - 1)) / (height - 1)
                north = glats(0) + py / 2
                proj = Some(ReducedGaussianGrid(nPar, pl))
              } else { // regular F-grid
                val lo2 = s32(o + 54) / 1e6
                px = u32(o + 58) / 1e6 // Di
                west = math.min(lo1, lo2) - px / 2
                // NOMINAL affine frame; exact latitudes via lonLatArrays
                py = (glats(0) - glats(height - 1)) / (height - 1)
                north = glats(0) + py / 2
                proj = Some(GaussianGrid(nPar))
              }
            } else if (tmpl3 == 90) { // space view / geostationary
              val shape = bytes(o + 9) & 0xff
              val radius = shape match {
                case 0 => 6367470.0
                case 6 => 6371229.0
                case 1 =>
                  val sf = bytes(o + 10) & 0xff
                  u32(o + 11).toDouble / math.pow(10, sf)
                case sh => throw new IllegalArgumentException(
                  s"earth shape $sh not supported on space-view grids " +
                    "(spherical shapes 0/1/6 only)")
              }
              def lonNorm(v: Double) = if (v > 180) v - 360 else v
              val lap = s32(o + 33)
              require(lap == 0,
                "non-equatorial sub-satellite point not supported (Lap must be 0 — " +
                  "every operational geostationary product is equatorial)")
              val lop = lonNorm(s32(o + 37) / 1e6)
              val dxGl = u32(o + 42).toInt // apparent earth diameter, grid lengths
              val dyGl = u32(o + 46).toInt
              require(dxGl > 0 && dyGl > 0, s"implausible apparent diameter $dxGl x $dyGl")
              val xp = u32(o + 50) / 1000.0 // sub-satellite pixel, grid lengths
              val yp = u32(o + 54) / 1000.0
              scanMode = bytes(o + 58) & 0xff
              require(u32(o + 59) == 0, "rotated space-view grids not supported")
              val nr = u32(o + 63) / 1e6 // camera altitude, earth radii FROM CENTER
              require(nr > 1.0, s"satellite distance $nr must exceed one earth radius")
              require(u32(o + 67) == 0 && u32(o + 71) == 0,
                "space-view sector offsets (Xo/Yo) not supported — full-disc only")
              // per-grid-length scan angle: the full disc subtends
              // 2·asin(1/Nr) and spans dx grid lengths
              val rx = 2.0 * math.asin(1.0 / nr) / dxGl
              val ry = 2.0 * math.asin(1.0 / nr) / dyGl
              // normalize the sub-satellite pixel into the canonical
              // north-up/west-east frame the data is reordered into.
              // Xp/Yp are pixel-CENTER coordinates (eccodes/CGMS:
              // pixel i's center scan angle is (i − Xp)·rx) — unlike
              // the x1/dx templates where x1 is itself a center — so
              // the west/north EDGES sit half a grid length beyond,
              // and a mirrored scan renumbers centers as width−1−xp.
              val xpC = if ((scanMode & 0x80) != 0) width - 1 - xp else xp
              val ypC = if ((scanMode & 0x40) != 0) height - 1 - yp else yp
              px = rx; py = ry
              west = -(xpC + 0.5) * rx
              north = (ypC + 0.5) * ry
              proj = Some(SpaceViewProj(radius, radius, lop, nr))
            } else if (tmpl3 == 10) { // Mercator (tropical-band products)
              val shape = bytes(o + 9) & 0xff
              val radius = shape match {
                case 0 => 6367470.0
                case 6 => 6371229.0
                case 1 =>
                  val sf = bytes(o + 10) & 0xff
                  u32(o + 11).toDouble / math.pow(10, sf)
                case sh => throw new IllegalArgumentException(
                  s"earth shape $sh not supported on projected grids " +
                    "(spherical shapes 0/1/6 only)")
              }
              def lonNorm(v: Double) = if (v > 180) v - 360 else v
              // template 3.10 octets: La1 39-42, Lo1 43-46, LaD 48-51,
              // La2 52-55, Lo2 56-59, scan 60, orientation 61-64,
              // Di 65-68, Dj 69-72 (10^-3 m at LaD)
              val la1 = s32(o + 33) / 1e6
              val lo1 = lonNorm(s32(o + 37) / 1e6)
              val lad = s32(o + 42) / 1e6
              scanMode = bytes(o + 54) & 0xff
              require(u32(o + 55) == 0,
                "rotated Mercator (non-zero grid orientation) not supported")
              val dx = u32(o + 59) / 1000.0
              val dy = u32(o + 63) / 1000.0
              // zero-x meridian at the first point's longitude keeps x
              // magnitudes small and wrap-free across the antimeridian
              val fwd = graft.ops.Geo.fwdMercatorSph(radius, lo1, lad) _
              val (x1, y1) = fwd(lo1, la1)
              val xMin = if ((scanMode & 0x80) != 0) x1 - (width - 1) * dx else x1
              val yMax = if ((scanMode & 0x40) != 0) y1 + (height - 1) * dy else y1
              px = dx; py = dy
              west = xMin - dx / 2
              north = yMax + dy / 2
              proj = Some(MercProj(radius, lo1, lad))
            } else { // 3.20 polar stereo / 3.30 Lambert / 3.110 azimuthal equidistant
              val shape = bytes(o + 9) & 0xff
              val radius = shape match {
                case 0 => 6367470.0
                case 6 => 6371229.0
                case 1 =>
                  val sf = bytes(o + 10) & 0xff
                  u32(o + 11).toDouble / math.pow(10, sf)
                case s => throw new IllegalArgumentException(
                  s"earth shape $s not supported on projected grids " +
                    "(spherical shapes 0/1/6 only; the NCEP feeds declare spheres)")
              }
              def lonNorm(v: Double) = if (v > 180) v - 360 else v
              // templates 3.20, 3.30 and 3.110 share every octet through
              // the scanning mode; 3.30 appends the two standard
              // parallels. In 3.110 the (LaD, LoV) octet pair carries the
              // TANGENCY point (standard parallel + central longitude).
              val la1 = s32(o + 33) / 1e6
              val lo1 = lonNorm(s32(o + 37) / 1e6)
              val lad = s32(o + 42) / 1e6
              val lov = lonNorm(s32(o + 46) / 1e6)
              val dx = u32(o + 50) / 1000.0 // millimeters → meters
              val dy = u32(o + 54) / 1000.0
              val pcf = bytes(o + 58) & 0xff
              require((pcf & 0x80) == 0,
                "south-pole-aspect projected grids not supported (projection centre flag bit 1)")
              scanMode = bytes(o + 59) & 0xff
              val (p, fwd) =
                if (tmpl3 == 30) {
                  val latin1 = s32(o + 60) / 1e6
                  val latin2 = s32(o + 64) / 1e6
                  (LccProj(radius, lov, latin1, latin2, lad): GridProj,
                    graft.ops.Geo.fwdLambertConformalConicSph(
                      radius, latin1, latin2, lad, lov) _)
                } else if (tmpl3 == 110)
                  (AeqdProj(radius, lad, lov): GridProj,
                    graft.ops.Geo.fwdAzimuthalEquidistantSph(radius, lad, lov) _)
                else
                  (PsProj(radius, lov, lad): GridProj,
                    graft.ops.Geo.fwdPolarStereographicSph(radius, lov, lad) _)
              // anchor the projected frame at the declared first point,
              // normalized to the canonical top-left (max-y/min-x) corner
              val (x1, y1) = fwd(lo1, la1)
              val xMin = if ((scanMode & 0x80) != 0) x1 - (width - 1) * dx else x1
              val yMax = if ((scanMode & 0x40) != 0) y1 + (height - 1) * dy else y1
              px = dx; py = dy
              west = xMin - dx / 2
              north = yMax + dy / 2
              proj = Some(p)
            }
            }
            require(width > 0 && width.toLong * height <= (1 << 26),
              s"implausible grid shape ${width}x$height (corrupt section 3?)")
          case 4 =>
            val tmpl4 = u16(o + 2)
            // 4.0/4.1/4.2 (analysis/ensemble/derived), 4.8/4.11/4.12
            // (their accumulation forms), 4.5/4.9 (probability), 4.10
            // (percentile) and 4.15 (spatially processed) all share the
            // 4.0 prefix this reader consumes (category/parameter/
            // forecast octets 10-22 — their template-specific octets
            // follow the shared fixed-surface block at 23-34); anything
            // else could carry those octets with DIFFERENT meaning, so
            // it fails loudly rather than mislabeling
            require(Set(0, 1, 2, 5, 8, 9, 10, 11, 12, 15).contains(tmpl4),
              s"unsupported product definition template 4.$tmpl4")
            category = bytes(o + 4) & 0xff; parameter = bytes(o + 5) & 0xff
            forecastHours = u32(o + 13).toInt
            // statistically-derived products are DIFFERENT variables
            // from their deterministic parameter (see Message.variant).
            // Ensemble members (4.1/4.11, perturbation number at octet
            // 36) and derived-ensemble statistics (4.2/4.12, derived
            // type at octet 35) are distinguished the same way — a
            // 50-member GEFS granule would otherwise merge 50 rasters
            // into one per-step stream, and an ensemble MEAN would
            // merge with its SPREAD
            variant = tmpl4 match {
              case 1 | 11 => s"_m${bytes(o + 30) & 0xff}"
              case 2 | 12 => s"_d${bytes(o + 29) & 0xff}"
              case 5 | 9 => "_prob"
              case 10 => "_pct"
              case 15 => "_sp"
              case _ => ""
            }
          case 5 =>
            tmpl5 = u16(o + 4)
            require(Set(0, 2, 3, 40, 41, 42, 50, 51, 200).contains(tmpl5),
              s"unsupported packing template 5.$tmpl5")
            if (tmpl5 == 50)
              // spectral simple packing: the (0,0) real coefficient
              // rides UNPACKED in the template (octets 21-24)
              p00 = java.lang.Float.intBitsToFloat(u32(o + 15).toInt)
            if (tmpl5 == 51) {
              // spectral complex packing — the wire form ECMWF native
              // spectral output actually ships. Public WMO template
              // text; coefficient walk order and the Laplacian
              // normalization convention pinned by the public eccodes
              // implementation (the reference reads these through
              // eccodes via formats/grib.py:122-230). A pentagonal
              // SUBSET of low-degree coefficients rides as raw IEEE;
              // every other coefficient packs like 5.0 after
              // multiplication by (n(n+1))^P.
              specP = s32(o + 15) * 1e-6 // octets 21-24: P in 10^-6 units
              val sJ = u16(o + 19); val sK = u16(o + 21); val sM = u16(o + 23)
              require(sJ == sK && sJ == sM,
                s"unsupported 5.51 subset truncation Js=$sJ Ks=$sK Ms=$sM " +
                  "(triangular subsets only — operational producers emit " +
                  "Js = Ks = Ms)")
              specSubJ = sJ
              specTs = u32(o + 25).toInt // octets 31-34: unpacked value count
              specPrec = bytes(o + 29) & 0xff // octet 35, code table 5.7
              require(specPrec == 1 || specPrec == 2,
                s"unsupported 5.51 unpacked-subset precision $specPrec " +
                  "(1 = IEEE 32-bit, 2 = IEEE 64-bit)")
            }
            if (tmpl5 == 200) {
              // run-length packing with level values (JMA radar/nowcast
              // products): nbits(1), MV(2), MVL(2), decimal scale(1),
              // then MVL 2-byte scaled representative values. No
              // reference/binary-scale octets — the level table IS the
              // value mapping.
              rlNbits = bytes(o + 6) & 0xff
              rlMv = u16(o + 7)
              rlMvl = u16(o + 9)
              rlDec = { val v = bytes(o + 11) & 0xff; if ((v & 0x80) != 0) -(v & 0x7f) else v }
              require(rlNbits >= 1 && rlNbits <= 16, s"implausible 5.200 bit width $rlNbits")
              require(rlMv <= rlMvl && rlMvl <= 0xffff && rlMvl > 0,
                s"implausible 5.200 level counts MV=$rlMv MVL=$rlMvl")
              require((1 << rlNbits) - 1 - rlMv >= 1,
                s"5.200 bit width $rlNbits leaves no run-length symbols above MV=$rlMv")
              rlLevels = (0 until rlMvl).map(i => u16(o + 12 + 2 * i)).toArray
            } else if (tmpl5 == 40) {
              // octet 22 = type of compression: 0 lossless (reversible
              // 5/3), 1 lossy (irreversible 9/7 + scalar quantization,
              // e.g. rate-limited MRMS products) — both decode through
              // the self-contained Jpeg2000 codec (reference path:
              // eccodes via formats/grib.py:122-230). Lossy fields are
              // the codec's nearest-integer reconstruction, flagged on
              // the Message so exactness-sensitive consumers can
              // filter. octet 21 (o+15) is the ORIGINAL FIELD TYPE,
              // not this flag.
              val ctype = bytes(o + 16) & 0xff
              require(ctype == 0 || ctype == 1,
                s"unknown JPEG2000 compression type $ctype")
              lossyField = ctype == 1
            }
            if (tmpl5 != 200) { // 5.200 has no reference/binary-scale octets
              refR = java.lang.Float.intBitsToFloat(u32(o + 6).toInt)
              e = s16(o + 10); d = s16(o + 12); nbits = bytes(o + 14) & 0xff
            }
            if (tmpl5 == 42) { // CCSDS/AEC parameters
              ccsdsFlags = bytes(o + 16) & 0xff
              ccsdsJ = bytes(o + 17) & 0xff
              ccsdsRsi = u16(o + 18)
            }
            if (tmpl5 == 2 || tmpl5 == 3) {
              // octet 23: missing-value management. 0 = none (bitmap
              // carries nodata); 1 = primary missing substitute;
              // 2 = primary + secondary. The NCEP complex-packed
              // products (GFS/NAM via wgrib2) use in-group missing
              // markers instead of a bitmap; both substitute classes
              // decode to NaN, the reference's masked-array semantics
              // (cfgrib masks missing to NaN).
              mvMgmt = bytes(o + 17) & 0xff
              require(mvMgmt <= 2, s"unknown missing-value management $mvMgmt")
              ng = u32(o + 26).toInt
              wref = bytes(o + 30) & 0xff; wbits = bytes(o + 31) & 0xff
              lref = u32(o + 32).toInt; linc = bytes(o + 36) & 0xff
              lastLen = u32(o + 37).toInt; lbits = bytes(o + 41) & 0xff
              if (tmpl5 == 3) { order = bytes(o + 42) & 0xff; ds = bytes(o + 43) & 0xff }
            }
          case 6 =>
            val ind = bytes(o) & 0xff
            if (ind == 0) {
              bitmap = new Array[Boolean](nPts)
              var i = 0
              while (i < nPts) {
                bitmap(i) = ((bytes(o + 1 + i / 8) >> (7 - i % 8)) & 1) == 1
                i += 1
              }
            }
          case 7 if tmpl5 == 50 =>
            // spectral coefficients: value 0 is the unpacked (0,0)
            // real part; the remaining nPts-1 pack like 5.0. The
            // raster is the SYNTHESIS of the band-limited field onto
            // the truncation-sized lat/lon grid set up in section 3.
            require(specJ >= 1, "5.50 data section without a 3.50 grid definition")
            require(bitmap == null, "bitmaps do not apply to spectral data")
            val coefs = new Array[Double](nPts)
            coefs(0) = p00
            val base = refR / math.pow(10, d)
            val factor = math.pow(2, e) / math.pow(10, d)
            val r = new BitReader(bytes, o)
            var ci = 1
            while (ci < nPts) { coefs(ci) = base + r.get(nbits) * factor; ci += 1 }
            data = SphericalHarmonics.synthesize(coefs, specJ, specK, specM, width, height)
            nPts = width * height // raster form for the final shape check
          case 7 if tmpl5 == 51 =>
            // spectral complex packing: walk (m = 0..M, n = m..J) in
            // GRIB coefficient order; subset members (m <= Ms, n <= Js)
            // consume the leading IEEE block, everything else consumes
            // the packed stream and unscales the Laplacian weighting —
            // value = (R + X*2^E) * 10^-D / (n(n+1))^P
            require(specJ >= 1, "5.51 data section without a 3.50 grid definition")
            require(bitmap == null, "bitmaps do not apply to spectral data")
            // the Laplacian weighting is defined on the total
            // wavenumber alone, but the public eccodes implementation
            // (grib_accessor_class_data_complex_packing) rejects
            // pen_j != pen_k != pen_m outright, so no operational
            // producer emits pentagonal complex-packed fields — keep
            // the general pentagonal form on the simple-packed path
            // only, where the WMO ordering alone pins the layout
            require(specK == specJ,
              s"5.51 complex packing with pentagonal field truncation " +
                s"J=$specJ K=$specK not supported (triangular fields " +
                "only, matching the operational producer implementation)")
            require(specSubJ >= 0 && specSubJ <= specJ && specSubJ <= specM,
              s"5.51 subset truncation $specSubJ exceeds field truncation " +
                s"J=$specJ M=$specM")
            require(specTs == 2 * SphericalHarmonics.nCoefficients(specSubJ, specSubJ),
              s"5.51 unpacked count $specTs does not match subset " +
                s"truncation $specSubJ " +
                s"(${2 * SphericalHarmonics.nCoefficients(specSubJ, specSubJ)} values)")
            val ieeeW = if (specPrec == 1) 4 else 8
            require(o + specTs.toLong * ieeeW <= pos + len,
              s"5.51 unpacked subset ($specTs x $ieeeW bytes) overruns the data section")
            val coefs = new Array[Double](nPts)
            val dFac = math.pow(10, -d)
            val bFac = math.pow(2, e)
            // 1/(n(n+1))^P per total wavenumber; n = 0 never packs
            // (it is always inside the subset), so index 0 is unused
            val scals = new Array[Double](specJ + 1)
            var sn = 1
            while (sn <= specJ) {
              val op = math.pow(sn.toDouble * (sn + 1), specP)
              // loud failure, matching the decoder's dead-letter-by-
              // name convention (and the edition-1 twin): a P extreme
              // enough to under/overflow the double range would
              // silently zero whole wavenumbers
              require(op != 0.0 && !op.isInfinite,
                s"5.51 Laplacian scale (n(n+1))^P unrepresentable at " +
                  s"n=$sn, P=$specP (operator under/overflow would " +
                  "silently zero coefficients)")
              scals(sn) = 1.0 / op
              sn += 1
            }
            var hPos = o // IEEE block head
            def ieee(): Double = {
              val v =
                if (specPrec == 1) java.lang.Float.intBitsToFloat(u32(hPos).toInt).toDouble
                else java.lang.Double.longBitsToDouble((u32(hPos) << 32) | u32(hPos + 4))
              hPos += ieeeW; v
            }
            val r = new BitReader(bytes, o + specTs * ieeeW)
            var ci = 0; var m = 0
            while (m <= specM) {
              var n = m
              if (m <= specSubJ) {
                while (n <= specSubJ) {
                  coefs(ci) = ieee() * dFac; coefs(ci + 1) = ieee() * dFac
                  ci += 2; n += 1
                }
              }
              while (n <= specJ) {
                coefs(ci) = (refR + r.get(nbits) * bFac) * dFac * scals(n)
                coefs(ci + 1) = (refR + r.get(nbits) * bFac) * dFac * scals(n)
                ci += 2; n += 1
              }
              m += 1
            }
            require(ci == nPts, s"5.51 walk produced $ci of $nPts values")
            data = SphericalHarmonics.synthesize(coefs, specJ, specM, width, height)
            nPts = width * height
          case 7 =>
            val nPresent = if (bitmap == null) nPts else bitmap.count(identity)
            val present =
              if (tmpl5 == 0) {
                val r = new BitReader(bytes, o)
                Array.fill(nPresent)(refR / math.pow(10, d) +
                  r.get(nbits) * math.pow(2, e) / math.pow(10, d))
              } else if (tmpl5 == 40) {
                val img = Jpeg2000.decode(bytes, o, len - 5)
                require(img.samples.length == nPresent,
                  s"JPEG2000 stream carries ${img.samples.length} samples " +
                    s"for $nPresent present points")
                val base = refR / math.pow(10, d)
                val factor = math.pow(2, e) / math.pow(10, d)
                img.samples.map(x => base + x * factor)
              } else if (tmpl5 == 42) {
                val xs = Ccsds.decode(bytes, o, len - 5, nPresent,
                  math.max(1, nbits), ccsdsJ, ccsdsRsi, ccsdsFlags)
                val base = refR / math.pow(10, d)
                val factor = math.pow(2, e) / math.pow(10, d)
                xs.map(x => base + x * factor)
              } else if (tmpl5 == 41) {
                val xs = PngCodec.decode(bytes, o)
                require(xs.length == nPresent,
                  s"PNG image carries ${xs.length} samples for $nPresent present points")
                val base = refR / math.pow(10, d)
                val factor = math.pow(2, e) / math.pow(10, d)
                xs.map(x => base + x * factor)
              } else if (tmpl5 == 200) {
                decodeRunLength(bytes, o, len - 5, nPresent,
                  rlNbits, rlMv, rlMvl, rlDec, rlLevels)
              } else {
                decodeComplex(bytes, o, nPresent, refR, e, d, nbits,
                  ng, wref, wbits, lref, linc, lastLen, lbits, order, ds, mvMgmt)
              }
            data = new Array[Float](nPts)
            var i = 0; var pi = 0
            while (i < nPts) {
              if (bitmap != null && !bitmap(i)) data(i) = Float.NaN
              else { data(i) = present(pi).toFloat; pi += 1 }
              i += 1
            }
          case _ =>
        }
        pos += len
      }
    }
    proj match {
      case Some(ReducedGaussianGrid(_, pl)) =>
        // ragged rows → NaN-padded rectangle, each row left-anchored;
        // real points keep exact coords via lonLatArrays, padding never
        // survives the long-form explode
        require(nPts == pl.sum,
          s"reduced grid carries $nPts points but the row list sums to ${pl.sum}")
        val padded = Array.fill(width * height)(Float.NaN)
        var src = 0
        var jj = 0
        while (jj < height) {
          Array.copy(data, src, padded, jj * width, pl(jj))
          src += pl(jj)
          jj += 1
        }
        data = padded
      case _ =>
        // thinned/quasi-regular grids OUTSIDE the declared reduced-
        // Gaussian form carry fewer points than W×H; building a
        // rectangle from them would silently mis-place pixels
        require(nPts == width * height,
          s"thinned/quasi-regular grid ($nPts points for ${width}x$height) not supported")
        // normalize scan order to canonical north-up/west-east
        if (scanMode != 0) {
          data = fromScanOrder(data, width, height, scanMode)
          if (bitmap != null) { /* bitmap already applied into data */ }
        }
    }
    Message(GeoTiff.Raster(width, height, data, west, north, px, py),
      discipline, category, parameter, refTime, forecastHours, proj,
      lossy = lossyField, variant = variant)
  }

  /** Unpack a run-length-packed (5.200) data section into present-cell
    * values, in scan order. Symbol stream semantics (the wgrib2
    * unpk_run_length / JMA convention): each run opens with a LEVEL
    * symbol (0 = missing → NaN; 1..MV → representative value
    * levels(l−1) / 10^dec), optionally followed by digit symbols
    * > MV that accumulate (run length − 1) in little-endian base
    * (2^nbits − 1 − MV): digit value = symbol − MV − 1. Decoding stops
    * once the grid is full, so zero-bit stream padding never decodes
    * as a spurious missing run. */
  private def decodeRunLength(bytes: Array[Byte], o: Int, dataLen: Int,
                              nPresent: Int, nbits: Int, mv: Int, mvl: Int,
                              dec: Int, levels: Array[Int]): Array[Double] = {
    val rng = (1 << nbits) - 1 - mv
    val f = math.pow(10, dec)
    val nSyms = dataLen * 8 / nbits
    // a legal stream never needs more symbols than one value plus a
    // base-rng run suffix per emitted point (runs longer than the grid
    // are rejected below), so a corrupt section length can't force a
    // 32x-the-message Int allocation
    require(nSyms >= 0 && nSyms <= nPresent.toLong * 34 + 8,
      s"run-length stream of $nSyms symbols for $nPresent points (corrupt section length?)")
    val r = new BitReader(bytes, o)
    val syms = new Array[Int](nSyms)
    var k = 0
    while (k < nSyms) { syms(k) = r.get(nbits).toInt; k += 1 }
    val out = new Array[Double](nPresent)
    var i = 0; var oIdx = 0
    while (i < nSyms && oIdx < nPresent) {
      val s = syms(i); i += 1
      require(s <= mv,
        s"run-length stream: digit symbol $s opens a run (level symbols are 0..$mv)")
      var repeat = 1L; var base = 1L
      while (i < nSyms && syms(i) > mv) {
        repeat += (syms(i) - mv - 1).toLong * base
        base *= rng
        i += 1
      }
      val v = if (s == 0) Double.NaN else {
        require(s <= mvl, s"level symbol $s beyond the $mvl-entry table")
        levels(s - 1) / f
      }
      var c = 0L
      while (c < repeat) {
        require(oIdx < nPresent,
          s"run-length stream overruns the grid ($nPresent points)")
        out(oIdx) = v; oIdx += 1; c += 1
      }
    }
    require(oIdx == nPresent,
      s"run-length stream decoded $oIdx of $nPresent points")
    out
  }

  /** Unpack a complex-packed (5.2/5.3) data section into present-cell
    * values, in scan order. */
  private def decodeComplex(bytes: Array[Byte], o: Int, nPresent: Int,
                            refR: Float, e: Int, d: Int, nbitsRef: Int,
                            ng: Int, wref: Int, wbits: Int,
                            lref: Int, linc: Int, lastLen: Int, lbits: Int,
                            order: Int, ds: Int, mvm: Int = 0): Array[Double] = {
    var p = o
    def signMag(): Long = { // ds-octet sign-magnitude
      var v = 0L
      for (k <- 0 until ds) { v = (v << 8) | (bytes(p) & 0xffL); p += 1 }
      val neg = (v & (1L << (ds * 8 - 1))) != 0
      val mag = v & ((1L << (ds * 8 - 1)) - 1)
      if (neg) -mag else mag
    }
    // the group count comes raw from the section-5 header: a corrupt
    // 32-bit value would allocate three ng-sized arrays (refs, widths,
    // lens) BEFORE any bit read could fail — an OutOfMemoryError the
    // quarantine's `catch Exception` cannot contain (found by
    // FuzzSweep). Groups partition the present points, so ng is
    // bounded by them; the reference stream must also fit the section.
    require(ng >= 1 && ng <= nPresent.max(1),
      s"complex packing declares $ng groups for $nPresent present points")
    require(o + (ng.toLong * nbitsRef + 7) / 8 <= bytes.length,
      s"complex-packing group references ($ng x $nbitsRef bits) overrun the message")
    val firstVals = Array.fill(order)(signMag())
    val gmin = if (order > 0) signMag() else 0L

    val r = new BitReader(bytes, p)
    val refs = Array.fill(ng)(r.get(nbitsRef)); r.align()
    val widths = Array.fill(ng)(if (wbits == 0) wref else wref + r.get(wbits).toInt)
    if (wbits > 0) r.align()
    val lens = Array.fill(ng)(if (lbits == 0) lref else lref + linc * r.get(lbits).toInt)
    if (lbits > 0) r.align()
    lens(ng - 1) = lastLen

    val vals = new Array[Long](nPresent)
    // missing-value management (g2lib comunpack semantics): a
    // constant (width-0) group whose reference is all-ones at the
    // reference width is wholly primary-missing (all-ones−1 →
    // secondary, mvm 2); inside a width-w group, the all-ones symbol
    // at w bits marks a primary-missing point (all-ones−1 secondary)
    val miss = if (mvm > 0) new Array[Boolean](nPresent) else null
    if (mvm > 0) require(nbitsRef > 0,
      "missing-value management needs a nonzero reference width")
    val msng1 = (1L << nbitsRef) - 1
    val msng2 = msng1 - 1
    // the packed group stream covers ALL points (g2lib/eccodes wire
    // form); the first `order` slots are placeholders overwritten
    // from the explicitly-stored original first values below
    var i = 0
    var g = 0
    while (g < ng) {
      val wg = widths(g)
      val allMiss = mvm > 0 && wg == 0 &&
        (refs(g) == msng1 || (mvm == 2 && refs(g) == msng2))
      var k = 0
      while (k < lens(g) && i < nPresent) {
        if (wg == 0) {
          if (allMiss) miss(i) = true
          else vals(i) = refs(g) + gmin
        } else {
          val x = r.get(wg)
          if (mvm > 0 && (x == (1L << wg) - 1 || (mvm == 2 && x == (1L << wg) - 2)))
            miss(i) = true
          else vals(i) = refs(g) + x + gmin
        }
        i += 1; k += 1
      }
      g += 1
    }
    require(i == nPresent, s"complex packing group lengths cover $i of $nPresent values")
    if (mvm > 0 && order > 0) {
      // seed and accumulate over the NON-MISSING chain only: the first
      // `order` non-missing points are the stored originals, every
      // later one is a (gmin-restored) difference on its non-missing
      // predecessors
      var seen = 0; var p1 = 0L; var p2 = 0L
      var j = 0
      while (j < nPresent) {
        if (!miss(j)) {
          if (seen < order) vals(j) = firstVals(seen)
          else if (order == 1) vals(j) += p1
          else vals(j) += 2 * p1 - p2
          p2 = p1; p1 = vals(j)
          seen += 1
        }
        j += 1
      }
      require(seen >= order || seen == 0,
        s"fewer non-missing points ($seen) than the differencing order $order")
    } else {
      // seed the stored originals, then undo spatial differencing
      var j0 = 0
      while (j0 < order) { vals(j0) = firstVals(j0); j0 += 1 }
      if (order == 1) {
        var j = 1
        while (j < nPresent) { vals(j) += vals(j - 1); j += 1 }
      } else if (order == 2) {
        var j = 2
        while (j < nPresent) { vals(j) += 2 * vals(j - 1) - vals(j - 2); j += 1 }
      }
    }
    val base = refR / math.pow(10, d)
    val factor = math.pow(2, e) / math.pow(10, d)
    Array.tabulate(nPresent) { t =>
      if (miss != null && miss(t)) Double.NaN else base + vals(t) * factor
    }
  }

}
