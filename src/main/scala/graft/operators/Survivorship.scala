package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Survivorship — the golden-record merge of master-data management:
  * collapse every entity's duplicate/partial records into ONE record
  * whose each attribute carries the value from the most recent record
  * where that attribute was PRESENT ("last non-null wins, per
  * attribute" — the standard rule; a fresher record with a null phone
  * must not erase the older known phone).
  *
  * Scale shape: ONE hash aggregation, no window — per attribute the
  * survivor is `max(struct(order, tieBreak, attr))` over the rows where
  * the attribute is non-null (struct comparison is lexicographic, so
  * this is exactly "latest, ties by tieBreak"), which rides map-side
  * partial aggregation like any max: no per-entity sort, no
  * corpus-wide window state, AQE-skew-splittable. A window/row_number
  * formulation shuffles and sorts every duplicate row; this shuffles
  * one partially-aggregated struct per (entity, attribute).
  *
  * Determinism: `tieBreak` must be unique per record (an id); equal
  * `orderCol` values then resolve identically everywhere — the DuckDB
  * oracle re-derives the same survivors with window functions. */
object Survivorship {

  /** One golden record per `keyCols` group: each of `valueCols` is the
    * attribute value of the latest (by `orderCol`, ties by `tieBreak`)
    * record where it is non-null; `n_records` counts the collapsed
    * group. */
  def golden(df: DataFrame, keyCols: Seq[String], orderCol: String,
             tieBreak: String, valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "survivorship: empty key list")
    require(valueCols.nonEmpty, "survivorship: no value columns")
    val reserved = keyCols :+ orderCol :+ tieBreak
    valueCols.foreach(c => require(!reserved.contains(c),
      s"survivorship: value column '$c' collides with key/order/tie"))
    val survivors: Seq[Column] = valueCols.map { c =>
      max(when(col(c).isNotNull,
          struct(col(orderCol), col(tieBreak), col(c))))
        .getField(c).as(c)
    }
    df.groupBy(keyCols.map(col): _*)
      .agg(survivors.head, (survivors.tail :+
        count(lit(1)).as("n_records")): _*)
  }
}
