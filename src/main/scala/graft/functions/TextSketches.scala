package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic text-sketch primitives shared by the near-dup
  * operators (SURVEY §2.3): tokenization, word n-gram shingles,
  * md5-family MinHash, and a 60-bit SimHash. Everything is built from
  * Spark built-ins (codegen-friendly, no UDF) and from md5 — the one
  * hash primitive DuckDB reproduces bit-for-bit, which keeps every
  * sketch oracle-checkable.
  *
  * All sketches are pure per-row expressions: at 100 TB they run
  * inside the scan stage with zero shuffle.
  */
object TextSketches {

  val SimHashBits = 60 // 15 md5 hex chars -> fits a signed 64-bit lane

  /** The MinHash signature width every consumer (batch near-dup,
    * streaming sketches, their oracles) must agree on. */
  val NumMinhashes = 16

  def tokens(text: Column): Column = split(text, " ")

  /** Signature column name of component `i` ("h00".."h15"). */
  def minhashColName(i: Int): String = f"h$i%02d"

  /** Append the NumMinhashes-component MinHash signature (columns
    * h00..h15) to a frame holding a shingle-set column — THE single
    * definition of the signature layout, shared by the batch near-dup
    * pipeline and the streaming sketcher so the two can never drift.
    * Two projections so each per-seed md5 array is materialized once
    * and feeds four 32-bit slice components. */
  def withMinhashSignature(df: DataFrame, shingleCol: String): DataFrame = {
    val keep = df.columns.toSeq.map(col)
    val withMd5 = df.select(keep ++ (0 until NumMinhashes / 4)
      .map(k => minhashMd5(k, col(shingleCol)).as(s"_m$k")): _*)
    withMd5.select(keep ++ (0 until NumMinhashes)
      .map(i => minhashSlice(i % 4, col(s"_m${i / 4}"))
        .as(minhashColName(i))): _*)
  }

  /** De-duplicated word n-gram shingles (1-based slice, matching
    * DuckDB list indexing in oracle SQL). Texts with fewer than n
    * tokens yield an EMPTY array — without the guard,
    * `sequence(1, 0)` counts DOWN in Spark and a 0 start index
    * throws.
    *
    * Gram construction is `array_join(slice(w, i, n))`, NOT n
    * `element_at` calls: higher-order lambdas run interpreted with NO
    * loop-invariant hoisting, so every expression mentioning `w`
    * re-evaluates `split(text)` per gram — the element_at form paid
    * n·grams splits per document (measured 8x slower at n=8 on the
    * fixture corpus for byte-identical output). */
  def shingles(text: Column, n: Int): Column = {
    val w = tokens(text)
    val grams = array_distinct(
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => array_join(slice(w, i, lit(n)), " ")))
    when(size(w) >= n, grams).otherwise(array().cast("array<string>"))
  }

  /** Per-shingle md5 array for seed `k` — materialize each seed's
    * array in its own projection, then slice 4 components out of it,
    * so one md5 call feeds 4 signature components. */
  def minhashMd5(k: Int, shingleSet: Column): Column =
    transform(shingleSet, t => md5(concat(lit(s"$k:"), t)))

  /** MinHash component from hex slice `r` (0..3) of a materialized
    * [[minhashMd5]] array: numeric min of the 32-bit slice. The md5's
    * 128 bits are independent, so the four slices are four independent
    * hash functions — full LSH quality at a quarter of the hash
    * cost (and a long min instead of a string min). */
  def minhashSlice(r: Int, md5Arr: Column): Column =
    array_min(transform(md5Arr,
      m => conv(substring(m, 1 + 8 * r, 8), 16, 10).cast("long")))

  /** Single MinHash component (test/reference form): lexical min of
    * md5("i:" + shingle) — the straightforward per-seed family. */
  def minhash(i: Int, shingleSet: Column): Column =
    array_min(transform(shingleSet, t => md5(concat(lit(s"$i:"), t))))

  /** 60-bit token hash: first 15 md5 hex chars as a BIGINT. */
  private def tokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** Frequency-weighted 60-bit SimHash over the token multiset: bit j
    * is set when the sum of (+/-1) votes from each token's hash bit j
    * is >= 0. One fold over the tokens with an array accumulator;
    * per-bit literal masks avoid variable shift amounts (the Column
    * API's shiftright only takes a literal count). */
  def simhash(text: Column): Column = {
    val masks = typedlit((0 until SimHashBits).map(1L << _))
    val hashes = transform(tokens(text), t => tokenHash(t))
    val bitSums = aggregate(
      hashes,
      array_repeat(lit(0L), SimHashBits),
      (acc, h) => zip_with(acc, masks,
        (a, m) => a + when(h.bitwiseAND(m) =!= 0, 1L).otherwise(-1L)))
    aggregate(
      zip_with(bitSums, masks,
        (s, m) => when(s >= 0, m).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc + b)
  }

  /** Hamming distance between two SimHash values. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")
}
