package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for ANN search (SURVEY §2.3 similarity —
  * no reference implementation; driver-mandated scale path).
  *
  * PQ is the memory-bandwidth endgame for vector search: the corpus is
  * stored as M small code ids (here 8 bytes/vector instead of 512),
  * and query-time scoring is M table lookups per vector against a
  * per-query lookup table (ADC — asymmetric distance computation).
  * At 100 TB the probe never touches the raw vectors: it scans the
  * code artifact, folds over a BROADCAST per-query LUT, and only the
  * per-query shortlist (a constant number of rows) is re-ranked in
  * exact double cosine against the source table.
  *
  * Everything here is deterministic and oracle-replayable:
  *  - Codeword training is per-subspace Lloyd with the same
  *    order-independent quantized means as [[IvfIndex]]: coordinate
  *    sums over `floor(x * 2^20)` are exact integer arithmetic under
  *    ANY aggregation order (magnitudes bounded far below 2^53), so
  *    both engines derive bit-identical codebooks.
  *  - Code assignment is an argmin of squared L2 over a subvector —
  *    a left-to-right fold both engines execute in the same order —
  *    with ties to the LOWEST code id (the fold only replaces on
  *    strictly smaller distance and iterates in ascending (m, c)).
  *  - ADC scores sum the M lookup values in ascending-m order (a
  *    fold here, `list_aggregate(list(l ORDER BY m), 'sum')` in the
  *    oracle), so even the float approximation is bit-reproducible.
  */
object PqIndex {

  /** Number of subspaces (code bytes per vector). */
  val M = 8

  /** Dimensions per subspace; M * SubDim = embedding dim (64). */
  val SubDim = 8

  /** Codewords per subspace. */
  val Ks = 16

  /** LUT map key for subspace m, code c — stride safely above Ks. */
  val KeyStride = 1000L

  /** Subvector m (0-based) of a full vector, 1-indexed slice. */
  def subVec(v: Column, m: Column): Column =
    slice(v, (m * SubDim + 1).cast("int"), lit(SubDim))

  /** Squared L2 between a subvector and a codeword — left-to-right
    * fold, same order as the oracle's list comprehension sum. */
  private def subL2(sv: Column, cw: Column): Column =
    aggregate(zip_with(sv, cw, (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)

  /** Seed codebook: subspace slices of the first Ks vectors —
    * deterministic, like the IVF seed centroids. */
  def seeds(corpus: DataFrame): DataFrame =
    corpus.where(col("vec_id") < Ks)
      .select(col("vec_id").as("c"), col("v"))
      .withColumn("m", explode(sequence(lit(0L), lit(M - 1L))))
      .select(col("m"), col("c"), subVec(col("v"), col("m")).as("cw"))

  /** Collapse a (m, c, cw) codebook to ONE broadcastable row holding
    * the sorted struct array — the shape the per-row encode fold and
    * the per-query LUT builder consume. */
  def codebookRow(cb: DataFrame): DataFrame =
    cb.agg(sort_array(collect_list(struct(col("m"), col("c"), col("cw"))))
      .as("cbs"))

  /** Encode each corpus row: codes[m] = argmin_c L2(v_sub_m, cw) over
    * the broadcast codebook — a per-row nested fold, ZERO shuffle
    * (the 100 TB encode is a map-only job, exactly like cell
    * assignment in [[IvfIndex.assignCells]]). Adds `codes`
    * (array<long>, one code id per subspace), keeps input columns. */
  def encode(corpus: DataFrame, cb: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(codebookRow(cb)))
      .withColumn("codes", transform(sequence(lit(0L), lit(M - 1L)), m =>
        aggregate(col("cbs"),
          struct(lit(-1L).as("c"), lit(Double.PositiveInfinity).as("d")),
          (acc, e) => {
            val d = subL2(subVec(col("v"), m), e.getField("cw"))
            when(e.getField("m") === m && d < acc.getField("d"),
              struct(e.getField("c").as("c"), d.as("d")))
              .otherwise(acc)
          }).getField("c")))
      .drop("cbs")

  /** One Lloyd update per subspace: new codeword (m, c) = quantized
    * coordinate means of the subvectors assigned to it. The exchange
    * carries (m, c, i) partial sums — M * Ks * SubDim rows per map
    * partition, never the vectors (same shape as
    * [[IvfIndex.lloydUpdate]] with the subspace as an extra key).
    * Codewords that lose all members drop out, mirrored by the
    * oracle because membership is identical. */
  def lloydUpdate(encoded: DataFrame): DataFrame = {
    val sums = encoded
      .select(col("v"), posexplode(col("codes")).as(Seq("m", "c")))
      .select(col("m").cast("long").as("m"), col("c"),
        posexplode(subVec(col("v"), col("m").cast("long"))).as(Seq("i0", "x")))
      .groupBy(col("m"), col("c"), col("i0"))
      .agg(sum(floor(col("x") * IvfIndex.Scale)).as("sv"),
        count(lit(1)).as("cnt"))
      .select(col("m"), col("c"), col("i0"),
        (col("sv").cast("double") / (col("cnt").cast("double") * IvfIndex.Scale))
          .as("mv"))
    sums.groupBy(col("m"), col("c"))
      .agg(transform(sort_array(collect_list(struct(col("i0"), col("mv")))),
        s => s.getField("mv")).as("cw"))
  }

  /** Train: seed codebook refined by `iterations` Lloyd rounds. Each
    * round's (tiny) codebook is checkpointed
    * ([[graft.queries.FrameMemo.checkpointed]] — honors
    * `spark.graft.memo.reliable`) so iteration plans stay flat
    * instead of re-embedding the corpus lineage. */
  def train(corpus: DataFrame, iterations: Int): DataFrame = {
    var cb = seeds(corpus)
    for (_ <- 0 until iterations)
      cb = graft.queries.FrameMemo.checkpointed(lloydUpdate(encode(corpus, cb)))
    cb
  }

  /** Per-query ADC lookup table as a MAP(m * KeyStride + c -> dot of
    * the query subvector with the codeword) — built once per query
    * row against the broadcast codebook; the probe fold then scores a
    * corpus row with M map lookups. */
  def queryLut(qv: Column, cbs: Column): Column =
    map_from_entries(transform(cbs, e =>
      struct((e.getField("m") * KeyStride + e.getField("c")).as("k"),
        aggregate(zip_with(subVec(qv, e.getField("m")), e.getField("cw"),
          (a, b) => a * b), lit(0.0), (acc, x) => acc + x).as("l"))))

  /** ADC score of a code array under a query LUT: the M lookup values
    * summed in ascending-m order. */
  def adcScore(codes: Column, qlut: Column): Column =
    aggregate(sequence(lit(0L), lit(M - 1L)), lit(0.0), (acc, m) =>
      acc + element_at(qlut, m * KeyStride +
        element_at(codes, (m + 1).cast("int"))))

  /** The (m, c) -> codeword MAP form of a codebook-row's `cbs` array —
    * same key scheme as [[queryLut]]; turns per-row codeword lookups
    * into one map probe instead of a 128-struct filter scan. */
  def codebookMap(cbs: Column): Column =
    map_from_entries(transform(cbs, e =>
      struct((e.getField("m") * KeyStride + e.getField("c")).as("k"),
        e.getField("cw").as("w"))))

  /** Stage-1 quantization residual of a full vector: per subspace,
    * subVec(v, m) minus its assigned codeword, re-flattened to a full
    * Dim-length vector — the input a SECOND (residual) codebook is
    * trained on. Pure per-row expression over the broadcast codebook
    * map, so computing residuals for the whole corpus stays map-only. */
  def residual(v: Column, codes: Column, cbMap: Column): Column =
    flatten(transform(sequence(lit(0L), lit(M - 1L)), m =>
      zip_with(subVec(v, m),
        element_at(cbMap, m * KeyStride + element_at(codes, (m + 1).cast("int"))),
        (a, b) => a - b)))
}
