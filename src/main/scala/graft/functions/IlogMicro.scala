package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: EXACT integer fixed-point natural log in
  * micro-nats — `ilog_micro(n) ≈ round(ln(n)·1e6)` for BIGINT
  * n ∈ [1, 2⁶²), computed with INTEGER operations only (shifts,
  * multiplies, one integer division, a 256-entry constant table), never
  * libm. Within 0.53 micro-nats of `math.log` across the whole domain
  * (property-tested in IlogMicroSpec), and — the reason it exists —
  * bit-identical in EVERY engine that replays the same integer
  * recurrence: the DSIR importance-weighting law (`TextAnalysis
  * .dsirLogRatios`, `dsirGumbelKey`) routes all its logarithms through
  * this function on the Spark side and through [[IlogMicro.duckDbSql]]
  * (the same recurrence emitted as DuckDB SQL, same interpolated
  * constants) on the oracle side, so a one-ulp `ln` difference between
  * the JVM and whatever libm a DuckDB build links can no longer flip a
  * quantized bucket (the round-17 driver-red failure mode on
  * `d_dsir_weights`/`d_dsir_resample`/`d_dsir_streamed`).
  *
  * Recurrence (all values non-negative, no intermediate exceeds 2⁶³):
  *   e   = ⌊log₂ n⌋                      (bit position, integer compares)
  *   m   = n · 2⁶¹⁻ᵉ ∈ [2⁶¹, 2⁶²)        (Q61 mantissa)
  *   hi  = m ≫ 53 ∈ [256, 511]           (8-bit table index)
  *   z   = (m − hi·2⁵³) / (hi·2¹³)       (Q40 residual, z < 2⁻⁸·2⁴⁰)
  *   ln n ≈ e·ln2 + ln(hi/256) + z − z²/2   (all in Q40 nats)
  *   result = round(totalQ40 · 1e6 / 2⁴⁰)   (micro-nats)
  * The ln2 and table constants are rounded ONCE from
  * `StrictMath.log` (fdlibm — reproducible by spec on every JVM) and
  * interpolated verbatim into the DuckDB emission, so both engines
  * consume literally the same integers. Error budget: 0.5 table/ln2
  * rounding ulps in Q40 (≤ 2⁻⁴¹ nat), series truncation ≤ z³/3
  * ≤ 2·10⁻⁸ nat, Q40 floor ≤ 2⁻⁴⁰ nat, final-shift floor ≤ 1.5·10⁻⁸
  * nat — all inside the terminal half-micro-nat rounding.
  */
case class IlogMicro(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"ilog_micro expects bigint, got ${dt.simpleString}")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ilog_micro"

  override def nullSafeEval(input: Any): Any =
    IlogMicro.ilog(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.IlogMicro.ilog($c)")

  override protected def withNewChildInternal(newChild: Expression): IlogMicro =
    copy(child = newChild)
}

object IlogMicro {
  private val Two40 = 1L << 40

  /** round(ln2 · 2⁴⁰) from StrictMath (fdlibm) — shared with the DuckDB
    * emission as a literal. */
  private[graft] val Ln2Q40: Long = math.round(StrictMath.log(2.0) * Two40)

  /** round(ln(hi/256) · 2⁴⁰) for hi ∈ [256, 511] — 256 literals shared
    * with the DuckDB emission. */
  private[graft] val TableQ40: Array[Long] =
    Array.tabulate(256)(i => math.round(StrictMath.log((i + 256) / 256.0) * Two40))

  /** The integer recurrence. Domain [1, 2⁶²) — a loud error outside it
    * beats a silently-diverging law (inputs are counts+1, odd 61-bit
    * hash values, and micro-nat magnitudes, all ≥ 1 by construction). */
  def ilog(n: Long): Long = {
    if (n < 1L || n >= (1L << 62))
      throw new IllegalArgumentException(
        s"ilog_micro domain is [1, 2^62), got $n")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    val mq = n << (61 - e)
    val hi = mq >>> 53
    val d = mq - (hi << 53)
    val zq = d / (hi << 13)
    val zh = zq >> 6
    val total = e * Ln2Q40 + TableQ40((hi - 256).toInt) + zq - ((zh * zh) >> 29)
    ((total >> 14) * 1000000L + (1L << 25)) >> 26
  }

  /** ilog(2⁶¹) — the `−ln u` constant for the Gumbel map
    * u = (h+½)/2⁶⁰ ⇒ −ln u = ln 2⁶¹ − ln(2h+1), in micro-nats. */
  val Ilog2Pow61: Long = ilog(1L << 61)

  /** ilog(10⁶) — converts a micro-nat magnitude a back through
    * −ln(a·10⁻⁶) = ln 10⁶ − ln a. */
  val Ilog1e6: Long = ilog(1000000L)

  private val reg = new Registration

  /** Per-session idempotent SQL registration ([[Registration]]); after
    * this, `expr("ilog_micro(n)")` resolves to the native expression. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    reg.once(spark) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "ilog_micro", exprs => IlogMicro(exprs(0)), "scala_udf")
    }

  private lazy val tableSqlLiteral: String =
    TableQ40.mkString("[", ", ", "]")

  /** The SAME recurrence as [[ilog]], emitted as a DuckDB scalar
    * expression over `n` (assumed a BIGINT expression in [1, 2⁶²)):
    * nested single-element `list_transform` lambdas serve as
    * let-bindings (nv/ev/mv/hv/zv = n, e, mantissa, hi, zQ40), the
    * exponent comes from 61 integer compares, and the constants are
    * interpolated from [[Ln2Q40]]/[[TableQ40]] — the oracle twin
    * evaluates only integer ops on the same literals, so it matches
    * the Spark side bit-for-bit on any DuckDB build. */
  def duckDbSql(n: String): String =
    s"""CAST(list_transform([CAST(($n) AS BIGINT)], nv ->
       |  list_transform([CAST(list_sum(list_transform(range(1, 62),
       |      p -> CASE WHEN nv >= (CAST(1 AS BIGINT) << CAST(p AS INT))
       |           THEN 1 ELSE 0 END)) AS BIGINT)], ev ->
       |  list_transform([nv << CAST(61 - ev AS INT)], mv ->
       |  list_transform([mv >> 53], hv ->
       |  list_transform([(mv - (hv << 53)) // (hv << 13)], zv ->
       |    ((((ev * $Ln2Q40 + ($tableSqlLiteral)[CAST(hv - 255 AS INT)]
       |        + zv - (((zv >> 6) * (zv >> 6)) >> 29)) >> 14)
       |       * 1000000 + ${1L << 25}) >> 26)
       |  )[1])[1])[1])[1])[1] AS BIGINT)""".stripMargin
}
