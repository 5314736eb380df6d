package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Registration point for all graft SQL functions, mirroring the
  * reference's `CREATE AGGREGATE FUNCTION` DDL step
  * (`/root/reference/README.md:40-46`) with Spark's
  * `FunctionRegistry`. After `register(spark)`, the literal SQL of the
  * reference README — `SELECT CAST(appx_median_bounded(x, 5) AS DOUBLE)
  * FROM numbers` — parses and runs unchanged.
  *
  * Registration is idempotent; query entry points call it eagerly. */
object GraftFunctions {

  private def two(name: String)(exprs: Seq[Expression]): (Expression, Expression) = {
    require(exprs.length == 2,
      s"$name(value, max_samples) takes 2 arguments, got ${exprs.length}")
    // Numeric inputs are welcome; the aggregate itself wants exactly
    // (DOUBLE, INT), like the reference signature (median.h:44).
    (Cast(exprs.head, DoubleType), Cast(exprs(1), IntegerType))
  }

  /** Typed variant: the value expression keeps its own data type; only
    * `max_samples` is normalized to INT. */
  private def twoTyped(name: String)(exprs: Seq[Expression]): (Expression, Expression) = {
    require(exprs.length == 2,
      s"$name(value, max_samples) takes 2 arguments, got ${exprs.length}")
    (exprs.head, Cast(exprs(1), IntegerType))
  }

  // ---- Expression builders, shared by the temp-function path below
  // and the cluster-wide GraftExtensions injection path ----

  private[graft] def buildAppxMedianBounded(exprs: Seq[Expression],
      asString: Boolean): Expression = {
    val name = if (asString) "appx_median_bounded" else "appx_median_bounded_double"
    val (v, k) = two(name)(exprs)
    AppxMedianBounded(v, k, asString)
  }

  // Typed forms: value keeps its own type (numeric/string/decimal/
  // date/timestamp), realizing the reference's latent per-type
  // comparators (median.cc:196-221) — no cast to DOUBLE.
  private[graft] def buildAppxMedianTyped(exprs: Seq[Expression]): Expression = {
    val (v, k) = twoTyped("appx_median_typed")(exprs)
    AppxMedianBounded(v, k, asString = false)
  }

  /** Reference-parity variant: third argument is the opt-in string
    * sample truncation length (median.cc:49's MAX_STRING_SAMPLE_LEN
    * generalized to an argument; pass 10 for exact reference
    * behavior). Kept a SEPARATE name so the faithful default path
    * stays truncation-free. */
  private[graft] def buildAppxMedianTypedRef(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"appx_median_typed_ref(value, max_samples, max_string_sample_len) " +
        s"takes 3 arguments, got ${exprs.length}")
    AppxMedianBounded(exprs.head, Cast(exprs(1), IntegerType),
      asString = false,
      maxStringSampleLen = foldableInt(exprs(2), "max_string_sample_len"))
  }

  private def foldableInt(e: Expression, name: String): Int = {
    require(e.foldable, s"$name must be a constant")
    Cast(e, IntegerType).eval() match {
      case i: java.lang.Integer => i.intValue
      case other => throw new IllegalArgumentException(
        s"$name must be an INT constant, got $other")
    }
  }

  private[graft] def buildAppxQuantileTyped(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"appx_quantile_typed(value, q, max_samples) takes 3 arguments, got ${exprs.length}")
    AppxQuantileBounded(exprs.head,
      Cast(exprs(1), DoubleType), Cast(exprs(2), IntegerType))
  }

  private[graft] def buildReservoirSample(exprs: Seq[Expression]): Expression = {
    val (v, k) = twoTyped("reservoir_sample")(exprs)
    ReservoirSampleAgg(v, k)
  }

  private[graft] def buildTopK(exprs: Seq[Expression],
      descending: Boolean): Expression = {
    val (v, k) = twoTyped(if (descending) "max_k" else "min_k")(exprs)
    TopKAgg(v, k, descending)
  }

  private[graft] def buildHeavyHitters(exprs: Seq[Expression]): Expression = {
    val (v, k) = twoTyped("heavy_hitters")(exprs)
    HeavyHittersAgg(v, k)
  }

  private[graft] def buildCountMin(exprs: Seq[Expression]): Expression = {
    val (v, k) = twoTyped("count_min")(exprs)
    CountMinAgg(v, k)
  }

  private[graft] def buildQuantileSketch(exprs: Seq[Expression]): Expression = {
    val (v, k) = twoTyped("quantile_sketch")(exprs)
    QuantileSketchAgg(v, k)
  }

  private[graft] def buildGramSums(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      s"gram_sums(qv, d) takes 2 arguments, got ${exprs.length}")
    GramAgg(exprs.head, Cast(exprs(1), IntegerType))
  }

  private[graft] def buildVecDot(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, s"vec_dot(a, b) takes 2 arguments, got ${exprs.length}")
    VecDotProduct(exprs.head, exprs(1))
  }

  private[graft] def buildSimHash60(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1,
      s"simhash60(text) takes 1 argument, got ${exprs.length}")
    SimHash60(exprs.head)
  }

  private[graft] def buildBloomAgg(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"bloom_agg(key, num_bits, num_hashes) takes 3 arguments, got ${exprs.length}")
    BloomAgg(exprs.head, Cast(exprs(1), IntegerType), Cast(exprs(2), IntegerType))
  }

  private[graft] def buildBloomMightContain(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3,
      s"bloom_might_contain(bloom, key, num_hashes) takes 3 arguments, got ${exprs.length}")
    BloomMightContain(exprs.head, exprs(1), Cast(exprs(2), IntegerType))
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    def reg(name: String)(b: Seq[Expression] => Expression): Unit =
      registry.createOrReplaceTempFunction(name, b, "scala_udf")

    reg("appx_median_bounded")(buildAppxMedianBounded(_, asString = true))
    reg("appx_median_bounded_double")(buildAppxMedianBounded(_, asString = false))
    reg("appx_median_typed")(buildAppxMedianTyped)
    reg("appx_median_typed_ref")(buildAppxMedianTypedRef)
    reg("appx_quantile_typed")(buildAppxQuantileTyped)
    reg("reservoir_sample")(buildReservoirSample)
    reg("max_k")(buildTopK(_, descending = true))
    reg("min_k")(buildTopK(_, descending = false))
    reg("heavy_hitters")(buildHeavyHitters)
    reg("count_min")(buildCountMin)
    reg("quantile_sketch")(buildQuantileSketch)
    reg("gram_sums")(buildGramSums)
    reg("vec_dot")(buildVecDot)
    reg("simhash60")(buildSimHash60)
    reg("bloom_agg")(buildBloomAgg)
    reg("bloom_might_contain")(buildBloomMightContain)
  }

  // ---- DataFrame/Column API (requires register(spark) on the active
  // session; resolved at analysis time via the function registry) ----

  /** Codegen'd dot product over ARRAY<DOUBLE> columns. */
  def vec_dot(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  /** STRING-returning form, signature-parity with the reference UDA. */
  def appx_median_bounded(value: Column, maxSamples: Int): Column =
    call_function("appx_median_bounded", value, lit(maxSamples))

  /** DOUBLE-returning form for direct numeric use. */
  def appx_median_bounded_double(value: Column, maxSamples: Int): Column =
    call_function("appx_median_bounded_double", value, lit(maxSamples))

  /** Typed median: result has the value column's own type (numeric,
    * string, decimal, date, timestamp). */
  def appx_median_typed(value: Column, maxSamples: Int): Column =
    call_function("appx_median_typed", value, lit(maxSamples))

  /** Reference-parity typed median with the opt-in string-sample
    * truncation (10 = the reference's MAX_STRING_SAMPLE_LEN). */
  def appx_median_typed_ref(value: Column, maxSamples: Int,
      maxStringSampleLen: Int): Column =
    call_function("appx_median_typed_ref", value, lit(maxSamples),
      lit(maxStringSampleLen))

  /** Typed quantile: sorted samples[floor(q * n)], the median's
    * upper-middle rule generalized; exact when maxSamples >= n. */
  def appx_quantile_typed(value: Column, q: Double, maxSamples: Int): Column =
    call_function("appx_quantile_typed", value, lit(q), lit(maxSamples))

  /** Bounded sample of a column as a value-sorted ARRAY of its type. */
  def reservoir_sample(value: Column, k: Int): Column =
    call_function("reservoir_sample", value, lit(k))

  /** The k largest values per group, descending — O(k) state, map-side
    * combined (vs a full window sort). */
  def max_k(value: Column, k: Int): Column =
    call_function("max_k", value, lit(k))

  /** The k smallest values per group, ascending. */
  def min_k(value: Column, k: Int): Column =
    call_function("min_k", value, lit(k))

  /** Misra-Gries frequent-items summary: MAP<value, BIGINT> of at most
    * `capacity` items with guaranteed-bounded undercounts. */
  def heavy_hitters(value: Column, capacity: Int): Column =
    call_function("heavy_hitters", value, lit(capacity))

  /** Count-min sketch over a STRING column: Depth x width counter
    * grid (flattened row-major ARRAY<BIGINT>), never-underestimating
    * frequency lookups via the replayable md5-slice hash family. */
  def count_min(value: Column, width: Int): Column =
    call_function("count_min", value, lit(width))

  /** HDR-style mergeable quantile sketch over non-negative BIGINT
    * values: MAP<bucket, count> with relative quantile error below
    * 2^-subBucketBits (deterministic and partition-independent; see
    * [[QuantileSketchAgg]]). */
  def quantile_sketch(value: Column, subBucketBits: Int): Column =
    call_function("quantile_sketch", value, lit(subBucketBits))

  /** Exact integer scatter summary of a quantized vector corpus:
    * [n, S_1..S_d, upper-triangle Gram sums] in one aggregate pass —
    * the single-exchange input of the PCA/whitening gates. */
  def gram_sums(qv: Column, d: Int): Column =
    call_function("gram_sums", qv, lit(d))

  /** Codegen'd 60-bit SimHash of a STRING column (the scan-speed form
    * of TextSketches.simhash). */
  def simhash60(text: Column): Column =
    call_function("simhash60", text)

  /** Bloom-filter build over BIGINT keys -> BINARY bit set. */
  def bloom_agg(key: Column, numBits: Int, numHashes: Int): Column =
    call_function("bloom_agg", key, lit(numBits), lit(numHashes))

  /** Bloom-filter probe; numHashes must match the build. */
  def bloom_might_contain(bloom: Column, key: Column, numHashes: Int): Column =
    call_function("bloom_might_contain", bloom, key, lit(numHashes))
}
