package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Context-window document chunking — the step that turns a cleaned corpus
  * into training-sized pieces.
  *
  * Fixed character windows with overlap: chunk i covers
  * `[1 + i*stride, 1 + i*stride + size)` (1-based), `stride = size -
  * overlap`, so consecutive chunks share `overlap` characters and no
  * character is dropped. Starts run while `start <= len - overlap` — past
  * that bound a window holds only characters the previous chunk already
  * covers, so every emitted chunk contributes new text and the final
  * chunk is never a pure-overlap duplicate. The window starts come from
  * `sequence()` and the slices from `substr()` — one generator + one
  * explode per document, entirely codegen'd, no shuffle: chunking at
  * 100 TB is a map-only stage whose output is written straight back out
  * (or piped into dedup, which is why the chunk digest is part of the
  * output contract downstream).
  *
  * Token-boundary-aware chunking belongs to the tokenizer (a decode-side
  * concern, same boundary as [[Multimodal]]'s codec); character windows
  * are the engine-side primitive it composes with.
  */
object Chunker {

  /** Explode documents into overlapping fixed-size character chunks.
    *
    * @param df      input
    * @param id      stable document id column
    * @param text    text column
    * @param size    chunk width in characters
    * @param overlap characters shared between consecutive chunks
    * @return (id, chunk_idx, chunk) — empty/short texts yield exactly one
    *         (possibly short) chunk, so no document silently disappears
    */
  def fixedChunks(df: DataFrame, id: Column, text: Column,
      size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    df.select(id.as("id"), text.as("__text"))
      // greatest(..., 1): a start must exist even for the empty string
      .select(col("id"), col("__text"),
        explode(sequence(lit(1),
          greatest(length(col("__text")) - overlap, lit(1)),
          lit(stride))).as("__start"))
      .select(
        col("id"),
        ((col("__start") - 1) / stride).cast("int").as("chunk_idx"),
        col("__text").substr(col("__start"), lit(size)).as("chunk"))
  }

  /** DuckDB twin of [[fixedChunks]] (same starts, same slices), as a
    * FROM-able subquery over `tbl` producing (id, chunk_idx, chunk).
    */
  def fixedChunksSql(tbl: String, idExpr: String, textExpr: String,
      size: Int, overlap: Int): String = {
    val stride = size - overlap
    s"""SELECT $idExpr AS id,
       CAST((start - 1) // $stride AS INTEGER) AS chunk_idx,
       substring($textExpr, start, $size) AS chunk
       FROM $tbl, unnest(generate_series(1, greatest(length($textExpr) - $overlap, 1), $stride)) AS u(start)"""
  }
}
