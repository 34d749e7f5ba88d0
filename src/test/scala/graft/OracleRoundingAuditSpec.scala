package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Standing oracle-wide rounding audit (VERDICT r13 task #7): the r12
  * one-time cross-engine rounding review, made a permanent gate that
  * enumerates its sites from the LIVE `SparkEntry.oracleSql` map — not
  * a hand list — so every new query's oracle is screened on landing.
  *
  * The banned class: `ROUND(e, k)` where `e` is provably a FINITE
  * decimal of scale s > k. Such a value can land EXACTLY on a
  * digit-(k+1) tie of 5 (e.g. a 6dp × 6dp product has exactly 12
  * fractional digits — ties at digit 7 are systematic, not
  * measure-zero), and Spark (BigDecimal HALF_UP on the shortest
  * decimal repr) and DuckDB (float-domain round of the nearest double)
  * resolve those ties DIFFERENTLY — the exact mechanism behind the r12
  * text_heaps_law hash split, and the latent quota bug this spec
  * caught on its first run (sample_mix quotas rounded a 6dp-share ×
  * 10⁴ product — scale 6 > 0 — in double domain; fixed to exact
  * DECIMAL arithmetic in round 14). Divisions, transcendentals, and
  * untraceable column references stay un-flagged: their tie sets are
  * measure-zero for data-derived values (the documented "one double
  * division rounded once" discipline), probed statistically below. */
class OracleRoundingAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark

  // ------------------------------------------------------ site parser

  /** All `ROUND(arg...)` sites of `sql`, as (argument text, digits).
    * digits = None for the 1-arg integer form ROUND(x) (= 0 digits). */
  private def roundSites(sql: String): Seq[(String, Int)] = {
    val up = sql.toUpperCase
    val out = Seq.newBuilder[(String, Int)]
    var i = up.indexOf("ROUND(")
    while (i >= 0) {
      // balanced-paren scan for the closing paren
      var depth = 0; var k = i + 5; var end = -1
      while (k < sql.length && end < 0) {
        sql(k) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) end = k
          case _ =>
        }
        k += 1
      }
      require(end > 0, s"unbalanced ROUND( at $i")
      val arg = sql.substring(i + 6, end)
      // split the top-level digits argument
      var d = 0; var comma = -1
      arg.zipWithIndex.foreach { case (c, j) =>
        if (c == '(') d += 1
        else if (c == ')') d -= 1
        else if (c == ',' && d == 0) comma = j
      }
      val (expr, digits) =
        if (comma < 0) (arg, 0)
        else (arg.substring(0, comma),
          arg.substring(comma + 1).trim.toIntOption.getOrElse(0))
      out += ((expr.trim, digits))
      i = up.indexOf("ROUND(", i + 6)
    }
    out.result()
  }

  /** Split `e` at top-level occurrences of any char in `ops`. */
  private def topSplit(e: String, ops: Set[Char]): Seq[String] = {
    val parts = Seq.newBuilder[String]
    var depth = 0; var start = 0
    e.zipWithIndex.foreach { case (c, i) =>
      if (c == '(') depth += 1
      else if (c == ')') depth -= 1
      else if (depth == 0 && ops.contains(c)) {
        parts += e.substring(start, i); start = i + 1
      }
    }
    parts += e.substring(start)
    parts.result()
  }

  private def stripOuterParens(s0: String): String = {
    var s = s0.trim
    var changed = true
    while (changed) {
      changed = false
      if (s.startsWith("(") && s.endsWith(")")) {
        var depth = 0; var closesEarly = false
        s.zipWithIndex.foreach { case (c, i) =>
          if (c == '(') depth += 1
          else if (c == ')') { depth -= 1
            if (depth == 0 && i < s.length - 1) closesEarly = true }
        }
        if (!closesEarly) { s = s.substring(1, s.length - 1).trim; changed = true }
      }
    }
    s
  }

  private val CastDecimalRe =
    """(?is)^CAST\((.*)\s+AS\s+DECIMAL\(\s*\d+\s*,\s*(\d+)\s*\)\)$""".r
  private val CastDoubleRe = """(?is)^CAST\((.*)\s+AS\s+DOUBLE\)$""".r
  private val IntLitRe = """^\d+$""".r
  private val DecLitRe = """^\d+\.(\d*)$""".r

  /** Provable finite-decimal (SCALE, passes-through-DOUBLE?) of an
    * expression, or None when it cannot be traced textually (column
    * refs, CTE outputs, divisions, transcendentals — all conservatively
    * unknown; the gate is sound for what it CAN prove, and the
    * mirrored-helper discipline keeps the untraceable sites honest).
    * The domain flag is what separates the banned shape from its fix:
    * a finite value of scale s > k rounded in DOUBLE domain faces the
    * shortest-repr-vs-float tie split, while the same round computed in
    * exact DECIMAL domain is engine-identical by construction. */
  private def scaleOf(raw: String): Option[(Int, Boolean)] = {
    val e = stripOuterParens(raw)
    e match {
      case CastDecimalRe(_, s) => Some((s.toInt, false))
      case CastDoubleRe(inner) => scaleOf(inner).map { case (sc, _) => (sc, true) }
      case _ if e.toUpperCase.startsWith("ROUND(") =>
        // ROUND keeps its argument's type: decimal in, decimal out
        roundSites(e).headOption.map { case (inner, j) =>
          (j, scaleOf(inner).map(_._2).getOrElse(true))
        }
      case _ if IntLitRe.matches(e) => Some((0, false))
      case DecLitRe(frac) => Some((frac.length, false))
      case _ =>
        val divs = topSplit(e, Set('/'))
        if (divs.size > 1) return None // quotient: generally non-terminating
        val prods = topSplit(e, Set('*'))
        if (prods.size > 1) {
          val scales = prods.map(scaleOf)
          return if (scales.forall(_.isDefined))
            Some((scales.flatten.map(_._1).sum, scales.flatten.exists(_._2)))
          else None
        }
        val sums = topSplit(e, Set('+', '-')).filter(_.trim.nonEmpty)
        if (sums.size > 1) {
          val scales = sums.map(scaleOf)
          return if (scales.forall(_.isDefined))
            Some((scales.flatten.map(_._1).max, scales.flatten.exists(_._2)))
          else None
        }
        None
    }
  }

  // --------------------------------------------------------- the gate

  test("every ROUND site in the LIVE oracle map parses") {
    val n = SparkEntry.oracleSql.map { case (_, q) => roundSites(q).size }.sum
    assert(n > 500, s"only $n ROUND sites found — parser regression?")
  }

  test("no oracle rounds a provably-finite decimal past its own scale " +
    "(the r12 cross-engine tie class)") {
    val offenders = for {
      (name, q) <- SparkEntry.oracleSql.toSeq
      (expr, digits) <- roundSites(q)
      (s, isDouble) <- scaleOf(expr)
      if s > digits && isDouble
    } yield (name, expr.take(90), s, digits)
    assert(offenders.isEmpty,
      "ROUND(finite-decimal of scale s, k) with s > k faces systematic " +
        "digit-(k+1) ties that Spark and DuckDB resolve differently. " +
        "Re-express in exact DECIMAL arithmetic (see the sample_mix " +
        s"quota fix). Offenders:\n${offenders.mkString("\n")}")
  }

  // ---------------------------------------------------- 200k probes

  /** Deterministic pseudo-random doubles (no Math.random in tests that
    * must reproduce): splitmix64 over an index. */
  private def prng(i: Long): Long = {
    var z = i + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  test("probe 200k quotient shapes: Spark's round(double, 6) is the " +
    "BigDecimal-shortest-repr HALF_UP model, and exact digit-7 ties " +
    "stay rare") {
    import spark.implicits._
    val n = 200000
    val xs = (0 until n).map { i =>
      val a = (prng(i.toLong) >>> 40).toDouble + 1.0
      val b = (prng(i.toLong + n) >>> 44).toDouble + 3.0
      a / b // the dominant oracle shape: one double division
    }
    val got = xs.toDF("x").select(round(col("x"), 6).as("r"))
      .collect().map(_.getDouble(0))
    var ties = 0
    xs.zip(got).foreach { case (x, g) =>
      val bd = BigDecimal(java.math.BigDecimal.valueOf(x))
      val ref = bd.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(g == ref, s"round($x, 6): Spark $g != HALF_UP model $ref")
      // an EXACT digit-7 tie: the shortest repr continues past 6 digits
      // with exactly 5 then nothing
      val rem = (bd - bd.setScale(6, BigDecimal.RoundingMode.FLOOR)).abs
      if (rem == BigDecimal("0.0000005")) ties += 1
    }
    // small-integer quotients CAN terminate exactly on a tie (4 in 200k
    // here — denominators this small divide 10^7 often enough); the
    // division discipline is "rare + probed", not "impossible". The
    // bound pins the rate; a jump means the shape changed.
    assert(ties <= 20,
      s"$ties exact digit-7 ties in $n random quotients — tie rate " +
        "jumped an order of magnitude; audit the division shapes")
  }

  test("probe 200k product-of-6dp shapes: digit-7 ties ARE systematic " +
    "— the class must stay banned") {
    val n = 200000
    var ties = 0
    (0 until n).foreach { i =>
      val x6 = (prng(i.toLong) >>> 44).abs + 1 // 6dp value x*1e-6
      val y6 = (prng(i.toLong + n) >>> 44).abs + 1
      val p = BigInt(x6) * BigInt(y6) // exact, 1e-12 units
      if (p % 1000000 == 500000) ties += 1 // digit-7 remainder exactly 5
    }
    assert(ties > 0,
      s"no ties in $n random 6dp products — the probe lost its teeth")
  }
}
