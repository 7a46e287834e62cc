package graft.core

import org.apache.spark.sql.DataFrame

/** Session intermediates — the two value categories of the language
  * (reference: /root/reference/src/common/include/results.h:12-40).
  *
  * All schemas use Long `pos`/`id` (scale-ready: >2^31 rows) and Int `v`
  * (the language's single scalar type).
  */
sealed trait Intermediate

object Intermediate {

  /** A set/list of positions.
    *
    * - Select output ("bitmap" in the reference): `df(id)`, distinct,
    *   unordered; `srcCol`/`srcLen` record the selected column and its
    *   allocated-position count for the fetch length check
    *   (DBECOLDIFFLEN, storage.c:1311-1318) and for the treejoin
    *   full-select precondition (join.c:171-178).
    * - Join output ("array"): `df(pos, id)` — `pos` is the output ordinal;
    *   order significant, duplicates allowed (results.h:12-23).
    */
  final case class Ids(df: DataFrame, ordered: Boolean,
                       srcCol: Option[String] = None,
                       srcLen: Option[Long] = None,
                       fullSelect: Boolean = false) extends Intermediate

  /** A vector of values: `df(pos, id, v)` — `pos` the output ordinal
    * (alignment key for math/tuple), `id` the base position each value
    * came from (null for math/agg results, which therefore cannot feed
    * joins or fetch — reference server.c:721-728).
    *
    * `fetchCol`/`fullBase` record which column a fetch materialized and
    * whether its position set was a full select — the treejoin
    * precondition (DBENOTREE, join.c:171-178) checks both.
    */
  final case class Vals(df: DataFrame, hasIds: Boolean,
                        fetchCol: Option[String] = None,
                        fullBase: Boolean = false) extends Intermediate
}
