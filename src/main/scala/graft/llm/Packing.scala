package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pretraining batch packing — the concat-and-chunk placement GPT-style
  * pipelines use: within each shard, documents are concatenated in a
  * deterministic order and the resulting token stream is cut into
  * fixed-size context windows; every document needs to know where it
  * landed (which chunks, at what offset) so the batch builder can emit
  * examples without re-tokenizing.
  *
  * Absent from the reference (no text at all); north-star LLM-pipeline
  * surface.
  *
  * Scale shape: packing is per-SHARD (`groupCol`), so the cumulative sum is
  * a window over each shard only — shards pack in parallel and nothing ever
  * needs a global cumsum or a driver fold. That is the 100 TB form: a real
  * corpus arrives sharded (source, date, path prefix) and chunk ids are
  * (shard, local chunk) pairs; a GLOBAL chunk numbering would serialize the
  * whole corpus through one partition for zero training benefit.
  */
object Packing {

  /** Chunk placement for every document: `start_offset` (tokens before it
    * in its shard's stream), `end_offset` (exclusive), `chunk_first` /
    * `chunk_last` (0-based ids of the context windows it touches, width
    * `chunkTokens`) and `n_chunks` spanned. Zero-token documents occupy
    * the single chunk at their offset.
    *
    * `(orderCol)` must totally order each shard's rows (pass a unique id);
    * `tokensCol` must be a non-negative integral column.
    */
  def packChunks(docs: DataFrame, groupCol: String, orderCol: String,
                 tokensCol: String, chunkTokens: Long): DataFrame = {
    require(chunkTokens > 0, s"chunk size must be positive, got $chunkTokens")
    val appended = Seq("start_offset", "end_offset", "chunk_first", "chunk_last", "n_chunks")
    appended.foreach(c => require(!docs.columns.contains(c),
      s"packChunks appends a '$c' column but the input already has one — rename it first"))
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("end_offset", sum(col(tokensCol)).over(w).cast("long"))
      .withColumn("start_offset", col("end_offset") - col(tokensCol))
      .withColumn("chunk_first", expr(s"start_offset div $chunkTokens"))
      // last occupied token is end_offset - 1; empty docs pin to start
      .withColumn("chunk_last", expr(s"greatest(end_offset - 1, start_offset) div $chunkTokens"))
      .withColumn("n_chunks", col("chunk_last") - col("chunk_first") + 1)
  }
}
