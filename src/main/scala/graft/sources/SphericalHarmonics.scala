package graft.sources

/** Spherical-harmonic synthesis for GRIB spectral fields (grid
  * template 3.50, DRS 5.50 — written from the public WMO FM-92
  * spectral representation: complex coefficients F_n^m for m ≥ 0
  * under triangular or pentagonal (J, K, M) truncation — the
  * transmitted region is m = 0..M, n = m..min(J+m, K); triangular is
  * the J = K = M special case — associated Legendre functions of the
  * first kind "fully normalized" so that ∫₋₁¹ [P̄ₙᵐ(μ)]² dμ = 2,
  * without the Condon–Shortley phase — P̄₀⁰ = 1, P̄₁⁰ = √3·μ,
  * P̄₁¹ = √(3/2)·√(1−μ²)).
  *
  * The real field synthesis:
  *   F(λ, μ) = Σₙ Aₙ₀ P̄ₙ⁰(μ)
  *           + 2 Σ_{m=1}^{M} Σ_{n=m}^{J} [Aₙₘ cos mλ − Bₙₘ sin mλ] P̄ₙᵐ(μ)
  * with Fₙᵐ = Aₙₘ + i·Bₙₘ (the m < 0 half is the conjugate of a real
  * field and is not transmitted).
  *
  * The reference reads spectral GRIB through eccodes, which surfaces
  * the raw coefficient array (cfgrib "sh" fields have no lat/lon);
  * this engine's data model is a raster, so the decoder SYNTHESIZES
  * onto a deterministic global lat/lon grid sized by the truncation
  * (2(K+1) × (K+1) cell centers, K = total-wavenumber bound; for
  * triangular truncation that is the familiar 2(J+1) × (J+1)) —
  * exact for a band-limited field,
  * direct evaluation (no FFT; spectral archives are rare and small).
  */
object SphericalHarmonics {

  /** Fully normalized P̄ₙᵐ(μ) for n = m..nMax (stable three-term
    * recursion over n at fixed m). */
  private[sources] def alfs(m: Int, nMax: Int, mu: Double): Array[Double] = {
    val out = new Array[Double](nMax - m + 1)
    // seed: P̄ₘᵐ = √((2m+1)/(2m)) √(1−μ²) P̄₍ₘ₋₁₎₍ₘ₋₁₎, P̄₀⁰ = 1
    var pmm = 1.0
    val s = math.sqrt(math.max(0.0, 1.0 - mu * mu))
    var k = 1
    while (k <= m) { pmm *= math.sqrt((2.0 * k + 1) / (2.0 * k)) * s; k += 1 }
    out(0) = pmm
    if (nMax > m) {
      // P̄₍ₘ₊₁₎ᵐ = √(2m+3)·μ·P̄ₘᵐ
      out(1) = math.sqrt(2.0 * m + 3) * mu * pmm
      var n = m + 2
      while (n <= nMax) {
        val a = math.sqrt((4.0 * n * n - 1) / (n.toLong * n - m.toLong * m))
        val b = math.sqrt(((n - 1.0) * (n - 1) - m.toLong * m) /
          (4.0 * (n - 1) * (n - 1) - 1))
        out(n - m) = a * (mu * out(n - m - 1) - b * out(n - m - 2))
        n += 1
      }
    }
    out
  }

  /** Per-m degree limit of the pentagonal truncation (J, K, M): the
    * retained coefficients are m = 0..M, n = m..min(J + m, K) — the
    * WMO pentagonal resolution parameters, of which triangular
    * (J = K = M), rhomboidal (K = J + M) and trapezoidal (K = J > M)
    * are the named corners. */
  @inline def nMaxAt(j: Int, k: Int, m: Int): Int = math.min(j + m, k)

  /** Synthesize the coefficient array (GRIB order: m = 0..M, then
    * n = m..J, each (real, imag)) onto an ni × nj global lat/lon grid
    * at cell centers, row 0 northmost. Triangular/trapezoidal form
    * (K = J). */
  def synthesize(coefs: Array[Double], j: Int, mMax: Int,
                 ni: Int, nj: Int): Array[Float] =
    synthesize(coefs, j, j, mMax, ni, nj)

  /** General pentagonal form: the walk order is m = 0..M, then
    * n = m..min(J + m, K), each (real, imag) — the same ordering the
    * editions' spectral data sections transmit. */
  def synthesize(coefs: Array[Double], j: Int, k: Int, mMax: Int,
                 ni: Int, nj: Int): Array[Float] = {
    require(coefs.length == 2 * nCoefficients(j, k, mMax),
      s"${coefs.length} values for truncation J=$j K=$k M=$mMax " +
        s"(need ${2 * nCoefficients(j, k, mMax)})")
    val out = new Array[Float](ni * nj)
    val dLat = 180.0 / nj
    val dLon = 2.0 * math.Pi / ni
    var row = 0
    while (row < nj) {
      val mu = math.sin(math.toRadians(90.0 - (row + 0.5) * dLat))
      // Fourier coefficients at this latitude: fm = Σₙ Fₙₘ P̄ₙᵐ(μ)
      val fmRe = new Array[Double](mMax + 1)
      val fmIm = new Array[Double](mMax + 1)
      var base = 0
      var m = 0
      while (m <= mMax) {
        val nMax = nMaxAt(j, k, m)
        val p = alfs(m, nMax, mu)
        var n = m
        var re = 0.0; var im = 0.0
        while (n <= nMax) {
          re += coefs(base + 2 * (n - m)) * p(n - m)
          im += coefs(base + 2 * (n - m) + 1) * p(n - m)
          n += 1
        }
        fmRe(m) = re; fmIm(m) = im
        base += 2 * (nMax - m + 1)
        m += 1
      }
      var x = 0
      while (x < ni) {
        val lam = -math.Pi + (x + 0.5) * dLon
        var v = fmRe(0)
        m = 1
        while (m <= mMax) {
          v += 2.0 * (fmRe(m) * math.cos(m * lam) - fmIm(m) * math.sin(m * lam))
          m += 1
        }
        out(row * ni + x) = v.toFloat
        x += 1
      }
      row += 1
    }
    out
  }

  /** Complex coefficients under triangular-style truncation: m = 0..M,
    * n = m..J. */
  def nCoefficients(j: Int, mMax: Int): Int =
    nCoefficients(j, j, mMax)

  /** General pentagonal count: m = 0..M, n = m..min(J + m, K). */
  def nCoefficients(j: Int, k: Int, mMax: Int): Int =
    (0 to mMax).map(m => nMaxAt(j, k, m) - m + 1).sum
}
