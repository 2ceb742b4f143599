package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Public text-analysis column builders — the composable pieces behind
  * the LLM-pipeline queries, usable on any DataFrame with a text
  * column (batch or streaming; everything here is a codegen'd column
  * expression, no UDFs).
  *
  * `shingleHashes` is the contract between the batch decontamination
  * sweep (q75) and the streaming [[graft.streaming.StreamOps
  * .contaminationGate]]: compute it on the eval corpus to build the
  * static index, and on arriving docs to probe it.
  */
object TextOps {

  /** Rolling-hash modulus shared with the DuckDB oracle arithmetic. */
  val HashModulus = 1000000007L

  /** Whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= lit(""))

  /** Word-bigram shingles "w_i w_{i+1}" over a token array. */
  def bigrams(toks: Column): Column =
    zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat(a, lit(" "), b))

  /** Native codegen'd rolling hash ([[graft.functions.RollingHash]]);
    * requires the GraftExtensions-registered session. */
  def rollingHash(t: Column): Column = call_function("rolling_hash", t)

  /** Distinct bigram-shingle hashes of a raw text column — the unit
    * every dedup/contamination operator joins on. Total: a doc with
    * fewer than 2 tokens (empty/whitespace text included) yields an
    * empty array rather than crashing the caller's query — slice with
    * a negative length throws, and a streaming consumer must survive
    * arbitrary input. */
  def shingleHashes(text: Column): Column = {
    val tk = tokens(text)
    when(size(tk) >= 2,
      array_distinct(transform(array_distinct(bigrams(tk)), t => rollingHash(t))))
      .otherwise(array().cast("array<bigint>"))
  }

  /** The q33 quality score over a token array: length saturation +
    * type-token ratio, floor-form 4dp rounding (shared by the quality
    * query, the composed corpus pipeline, and the cross-modal join). */
  def quality(tk: Column): Column =
    floor((least(lit(1.0), size(tk) / lit(100.0)) * 0.5 +
      (size(array_distinct(tk)).cast("double") / size(tk)) * 0.5) * 10000.0 + 0.5) / 10000.0

  /** The quality gate threshold used by q33's low_quality flag and the
    * corpus pipeline's filter. */
  val QualityGate = 0.55
}
