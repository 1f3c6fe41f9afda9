package graft.core

import java.util.Locale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Logical-role → physical-column binding over a runtime-discovered schema.
  *
  * Rebuilds the reference's fuzzy column resolution (see
  * `/root/reference/index_align_to_firebase.py:180-229` and
  * `/root/reference/executive_review_tool.py:244-272`) as a pure resolver
  * over `df.schema`: case-insensitive exact synonym match first, then
  * case-insensitive substring match. A missing required role fails with the
  * list of available columns (reference behavior); a missing optional role
  * falls back to `fallback` when given.
  *
  * Resolution is driver-side metadata work — zero effect on the physical
  * plan beyond the projection it emits, so it is scale-free.
  */
object RoleResolver {

  final case class Role(
      name: String,
      synonyms: Seq[String],
      substrings: Seq[String] = Nil,
      required: Boolean = true,
      fallback: Option[String] = None)

  private def lc(s: String) = s.toLowerCase(Locale.ROOT)

  /** Resolve each role to a physical column name. */
  def resolve(schema: StructType, roles: Seq[Role]): Map[String, String] = {
    val phys = schema.fieldNames
    val byLc = phys.map(c => lc(c) -> c).toMap
    roles.flatMap { r =>
      val exact = r.synonyms.iterator.map(lc).flatMap(byLc.get).nextOption()
      val sub = exact.orElse {
        r.substrings.iterator
          .flatMap(s => phys.find(c => lc(c).contains(lc(s))))
          .nextOption()
      }
      sub match {
        case Some(c) => Some(r.name -> c)
        case None if r.fallback.isDefined =>
          r.fallback.flatMap(f => byLc.get(lc(f))).map(r.name -> _)
        case None if r.required =>
          throw new IllegalArgumentException(
            s"required role '${r.name}' not found; available columns: ${phys.mkString(", ")}")
        case None => None
      }
    }.toMap
  }

  /** Project `df` down to the resolved roles, renamed to role names. */
  def project(df: DataFrame, roles: Seq[Role]): DataFrame = {
    val bound = resolve(df.schema, roles)
    val cols = roles.flatMap(r => bound.get(r.name).map(p => col(p).as(r.name)))
    df.select(cols: _*)
  }
}
