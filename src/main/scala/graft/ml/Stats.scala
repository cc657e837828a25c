package graft.ml

/** Special-function kernels for the statistical surface (SURVEY §2.9).
  *
  * The reference reads cor.test's p-value off R (reference R:739);
  * reproducing it needs the Student-t CDF, which Spark and DuckDB both
  * lack, so it is implemented here from the standard public formulas
  * (Abramowitz & Stegun §6.1/§26.5; the continued-fraction evaluation
  * follows the modified-Lentz scheme described in Numerical Recipes
  * §6.4, re-derived here):
  *
  *   P(|T| > t) with T ~ t(df)  =  I_{df/(df+t²)}(df/2, 1/2)
  *
  * where I_x(a,b) is the regularized incomplete beta function.
  * Accuracy target 1e-12 relative — StatsSpec pins the closed forms
  * I_x(1/2,1/2) = (2/π)·asin(√x), the df=1 (Cauchy) and df=2 t CDFs,
  * and the df→∞ normal limit.
  *
  * Everything is a pure Double→Double function: usable driver-side
  * (model summaries) and as a scalar UDF for the few-row diagnostic
  * queries — justified as a UDF because no built-in expression
  * computes any special function (SURVEY §7 preference ladder).
  */
object Stats {

  /** ln Γ(x) for x > 0 — Lanczos approximation, g = 7, 9 coefficients
    * (the widely published parameter set; |rel err| < 1e-13). */
  def lnGamma(x: Double): Double = {
    val g = 7.0
    val c = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5) {
      // reflection: Γ(x)Γ(1−x) = π / sin(πx)
      math.log(math.Pi / math.sin(math.Pi * x)) - lnGamma(1.0 - x)
    } else {
      val z = x - 1.0
      var a = c(0)
      var i = 1
      while (i < 9) { a += c(i) / (z + i); i += 1 }
      val t = z + g + 0.5
      0.5 * math.log(2.0 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Continued fraction for the incomplete beta (modified Lentz);
    * converges fast for x < (a+1)/(a+b+2). */
  private def betaCf(a: Double, b: Double, x: Double): Double = {
    val tiny = 1e-300
    val eps = 1e-15
    val qab = a + b
    val qap = a + 1.0
    val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < tiny) d = tiny
    d = 1.0 / d
    var h = d
    var m = 1
    while (m <= 300) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < tiny) d = tiny
      c = 1.0 + aa / c
      if (math.abs(c) < tiny) c = tiny
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d
      if (math.abs(d) < tiny) d = tiny
      c = 1.0 + aa / c
      if (math.abs(c) < tiny) c = tiny
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < eps) return h
      m += 1
    }
    h // converged to working precision long before 300 terms
  }

  /** Regularized incomplete beta I_x(a, b), a,b > 0, 0 ≤ x ≤ 1. */
  def regIncompleteBeta(a: Double, b: Double, x: Double): Double = {
    require(a > 0 && b > 0, s"beta parameters must be positive: $a, $b")
    if (x <= 0.0) 0.0
    else if (x >= 1.0) 1.0
    else {
      val lnFront = lnGamma(a + b) - lnGamma(a) - lnGamma(b) +
        a * math.log(x) + b * math.log1p(-x)
      val front = math.exp(lnFront)
      if (x < (a + 1.0) / (a + b + 2.0)) front * betaCf(a, b, x) / a
      else 1.0 - front * betaCf(b, a, 1.0 - x) / b // symmetry I_x(a,b)=1−I_{1−x}(b,a)
    }
  }

  /** Two-sided p-value of a Student-t statistic with `df` degrees of
    * freedom: P(|T| ≥ |t|). */
  def tTwoSidedP(t: Double, df: Double): Double = {
    require(df > 0, s"degrees of freedom must be positive: $df")
    if (t.isNaN) Double.NaN
    else if (t.isInfinite) 0.0
    else regIncompleteBeta(df / 2.0, 0.5, df / (df + t * t))
  }

  /** cor.test's t transform + p-value for a Pearson r at sample size n
    * (reference R:739): t = r·√((n−2)/(1−r²)), df = n−2. */
  def corTestP(r: Double, n: Double): Double =
    if (n <= 2.0) Double.NaN // df = n-2 <= 0: undefined (R errors here)
    else if (math.abs(r) >= 1.0) 0.0 // t -> ±inf
    else tTwoSidedP(r * math.sqrt((n - 2.0) / (1.0 - r * r)), n - 2.0)

  /** Series expansion of the LOWER regularized incomplete gamma
    * P(a, x) = γ(a,x)/Γ(a); converges fast for x < a + 1
    * (A&S §6.5.29). */
  private def gammaSeriesP(a: Double, x: Double): Double = {
    var ap = a
    var sum = 1.0 / a
    var del = sum
    var i = 0
    while (i < 500 && math.abs(del) >= math.abs(sum) * 1e-15) {
      ap += 1.0
      del *= x / ap
      sum += del
      i += 1
    }
    sum * math.exp(-x + a * math.log(x) - lnGamma(a))
  }

  /** Continued fraction for the UPPER regularized incomplete gamma
    * Q(a, x) (modified Lentz, same scheme as betaCf above);
    * converges fast for x ≥ a + 1 (A&S §6.5.31). */
  private def gammaCfQ(a: Double, x: Double): Double = {
    val tiny = 1e-300
    val eps = 1e-15
    var b = x + 1.0 - a
    var c = 1.0 / tiny
    var d = 1.0 / b
    var h = d
    var i = 1
    while (i <= 500) {
      val an = -i * (i - a)
      b += 2.0
      d = an * d + b
      if (math.abs(d) < tiny) d = tiny
      c = b + an / c
      if (math.abs(c) < tiny) c = tiny
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < eps) {
        return math.exp(-x + a * math.log(x) - lnGamma(a)) * h
      }
      i += 1
    }
    math.exp(-x + a * math.log(x) - lnGamma(a)) * h
  }

  /** Upper regularized incomplete gamma Q(a, x) = Γ(a,x)/Γ(a),
    * a > 0, x ≥ 0. Branches at x = a + 1 so each expansion runs in
    * its fast-converging region; StatsSpec pins the closed forms
    * Q(m, x) = e^{-x}·Σ_{k<m} x^k/k! (integer a, both branches) and
    * Q(1/2, x) = erfc(√x). */
  def regGammaQ(a: Double, x: Double): Double = {
    require(a > 0, s"gamma shape must be positive: $a")
    if (x.isNaN) Double.NaN
    else if (x <= 0.0) 1.0
    else if (x < a + 1.0) 1.0 - gammaSeriesP(a, x)
    else gammaCfQ(a, x)
  }

  /** Upper-tail chi-square p-value P(X² ≥ x) with `df` degrees of
    * freedom — what R's `chisq.test` reports for the independence
    * test (reference's `table()` contingency shape, m9_chi_square):
    * the chi-square CDF is the special case Q(df/2, x/2). */
  def chiSquareUpperP(x: Double, df: Double): Double = {
    require(df > 0, s"degrees of freedom must be positive: $df")
    if (x.isNaN) Double.NaN
    else if (x.isInfinite) 0.0
    else regGammaQ(df / 2.0, x / 2.0)
  }
}
