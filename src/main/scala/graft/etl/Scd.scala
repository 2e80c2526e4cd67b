package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) maintenance: apply a batch of
  * updated dimension rows to a versioned snapshot, closing out changed
  * versions and opening new ones, with full history retained.
  *
  * The reference overwrites its dims wholesale each run (its
  * notebook rebuilds dim_media/dim_visitor from bronze every time) —
  * losing attribute history. SCD2 is the standard warehouse answer;
  * this is the Spark-first formulation: one equi-join on the key to
  * find changes (null-safe attribute compare, so NULL→value and
  * value→NULL both count as changes), then pure unions. The only
  * shuffle is on the dimension key; at 100 TB the dim is the SMALL
  * table of the model — this never touches a fact.
  */
object Scd {

  /** Merge `updates` (one row per key: the new attribute values) into
    * `current` (the full SCD2 table: key, attrs, valid_from, valid_to,
    * is_current). Returns the complete new SCD2 table:
    *  - history rows (is_current=false) pass through untouched;
    *  - current rows whose attrs differ from their update are closed
    *    out (valid_to = effective, is_current = false);
    *  - each change (or brand-new key) opens a fresh current version
    *    (valid_from = effective);
    *  - current rows with no change pass through.
    * Idempotent for a replayed batch: re-applying the same updates
    * finds zero attribute diffs and returns the input unchanged. */
  def scd2Merge(current: DataFrame, updates: DataFrame, key: String,
                attrs: Seq[String], effective: Column): DataFrame = {
    val cur = current.filter(col("is_current"))
    // __cur_exists is an explicit presence marker: a brand-new key whose
    // update attributes are ALL null would otherwise vanish (NULL <=> NULL
    // is true for every attr, so attribute diffs alone can't distinguish
    // "no live version" from "live version with identical null attrs").
    val curKeyed = cur.select(col(key) +: lit(true).as("__cur_exists") +:
      attrs.map(a => col(a).as(s"__cur_$a")): _*)
    // changed = updates whose attrs differ from the live version, plus
    // keys with no live version at all (left join → null marker)
    val changed = updates.join(curKeyed, Seq(key), "left")
      .filter(col("__cur_exists").isNull ||
        attrs.map(a => !(col(a) <=> col(s"__cur_$a"))).reduce(_ || _))
      .select((key +: attrs).map(col): _*)
    val changedKeys = changed.select(key)
    val closed = cur.join(changedKeys, Seq(key), "left_semi")
      .withColumn("valid_to", effective)
      .withColumn("is_current", lit(false))
    val opened = changed
      .withColumn("valid_from", effective)
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
    val untouchedCurrent = cur.join(changedKeys, Seq(key), "left_anti")
    val history = current.filter(!col("is_current"))
    history.unionByName(untouchedCurrent)
      .unionByName(closed)
      .unionByName(opened.select(current.columns.toIndexedSeq.map(col): _*))
  }
}
