package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

/** O14 — the engine's "conform to catalog schema" operator.
  *
  * The reference stages rows into a typed DataTable by name: declared
  * columns are copied from the source row when present, absent
  * properties become DBNull, and string→typed coercions happen on
  * assignment (MD-PS:254-307, W365-PS:269-306). Spark-first this is one
  * declarative projection — a by-name select with `lit(null)` for
  * absent columns and a cast per field, which Catalyst folds into the
  * scan (column pruning) instead of an O(rows × cols) reflection loop.
  */
object SchemaConform {

  /** Project `df` onto `schema`: by-name lookup (case-insensitive,
    * matching Spark's own default resolution — a source column that
    * differs only in case must conform, not silently null out),
    * absent → typed NULL, present → cast, output column order =
    * schema order. */
  def conform(df: DataFrame, schema: StructType): DataFrame = {
    val byLower = df.columns.map(c => c.toLowerCase -> c).toMap
    val cols: Seq[Column] = schema.fields.toSeq.map { f =>
      val c = byLower.get(f.name.toLowerCase)
        .map(actual => col(s"`$actual`"))
        .getOrElse(lit(null))
      c.cast(f.dataType).as(f.name)
    }
    df.select(cols: _*)
  }
}
