package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the pass that turns long
  * documents into fixed-size overlapping training/retrieval chunks
  * (context windows, embedding inputs). No reference implementation;
  * driver-mandated pipeline extension.
  *
  * Chunk layout for a document of `dl` tokens with window `size` and
  * stride `stride` (1-based starts `1, 1+stride, 1+2*stride, …`):
  * the last window is the first one whose end reaches `dl`, i.e.
  * `n_chunks = 1 + ceil(max(dl - size, 0) / stride)` — every token
  * is covered, the final chunk may be shorter than `size`, and a
  * document never yields a chunk fully contained in its predecessor.
  * All arithmetic is integer (ceil via `(x + stride - 1) div
  * stride`), so an ANSI engine replays the exact chunk set.
  *
  * Scale shape at 100 TB: a narrow projection + `posexplode` — a
  * MAP-ONLY plan with zero exchanges; chunking a corpus costs one
  * read and one write. Expansion factor is bounded by
  * `~1 + (dl/stride)` per document and the expression stays inside
  * whole-stage codegen (no UDFs).
  */
object Chunker {

  /** Explode `df` into (idCol, chunk_idx, n_tok, chunk) rows; `chunk`
    * is the window's tokens re-joined with single spaces. */
  def chunks(df: DataFrame, idCol: String, tokensCol: Column,
      size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val dl = functions.size(tokensCol).cast("long")
    // ceil-div on nonnegative longs; `/` would be double division in
    // the Column API, so route through floor (exact below 2^53)
    val lastIdx =
      floor((greatest(dl - size, lit(0L)) + (stride - 1)) / stride).cast("long")
    df.select(col(idCol), tokensCol.as("t"), lastIdx.as("last_i"))
      .select(col(idCol),
        posexplode(sequence(lit(0L), col("last_i"))).as(Seq("chunk_idx", "i")),
        col("t"))
      .select(col(idCol), col("chunk_idx").cast("int").as("chunk_idx"),
        slice(col("t"), (col("i") * stride + 1).cast("int"), lit(size)).as("c"))
      .select(col(idCol), col("chunk_idx"),
        functions.size(col("c")).cast("long").as("n_tok"),
        array_join(col("c"), " ").as("chunk"))
  }
}
