package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar normalization / coercion primitives from the reference,
  * re-expressed as codegen-friendly Column expressions.
  *
  * Reference cites (`/root/reference/`):
  *  - numeric coercion w/ 0.0 default: `index_align_to_firebase.py:231-233`
  *  - string normalize (trim/lower/collapse ws): `executive_review_tool.py:168-175`
  *  - ticker normalize (trim/upper) + validity: `index_align_to_firebase.py:245-249`
  *  - Firebase key sanitization: `executive_review_tool.py:575,581`
  */
object Coercions {

  /** Invalid-to-default numeric coercion: junk strings → 0.0, never fails. */
  def numCoerce(c: Column, default: Double = 0.0): Column =
    coalesce(c.try_cast("double"), lit(default))

  /** null→""; trim, lower, collapse internal whitespace. */
  def normalizeString(c: Column): Column =
    regexp_replace(lower(trim(coalesce(c, lit("")))), "\\s+", " ")

  /** Ticker key normalization: trim + upper. */
  def normalizeTicker(c: Column): Column = upper(trim(c))

  /** Valid-ticker predicate: non-null, non-empty, not the string 'NAN'. */
  def isValidTicker(c: Column): Column = {
    val t = normalizeTicker(c)
    c.isNotNull && t =!= "" && t =!= "NAN"
  }

  /** Valid-name predicate: non-null and non-empty after trim. */
  def isNonEmpty(c: Column): Column = c.isNotNull && trim(c) =!= ""

  /** Key sanitization: spaces → '_', then strip ',' and '.' (exact
    * reference order: space first, then punctuation). */
  def sanitizeKey(c: Column): Column =
    regexp_replace(regexp_replace(c, " ", "_"), "[,.]", "")

  /** Count of non-null, non-blank fields — record completeness score. */
  def completeness(cols: Seq[Column]): Column =
    cols.map(c => when(c.isNotNull && trim(c.cast("string")) =!= "", 1).otherwise(0))
      .reduce(_ + _)
}
