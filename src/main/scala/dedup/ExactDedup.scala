package dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact dedup by content hash (reference exact_spark.py:128-131 uses
  * `dropDuplicates([column])`, which keeps an arbitrary row per key; we use
  * the deterministic min-id representative so resumed/re-run jobs keep the
  * same rows — SURVEY.md §2.5 A1).
  *
  * Keyed on md5(text) (128-bit): at 10^12 docs, a 64-bit key would expect
  * ~3·10^4 birthday collisions; md5 expects ~0. Grouping on the hash, not
  * the text, keeps the shuffle narrow (16 bytes + id per row instead of the
  * full document).
  */
object ExactDedup {

  /** (id, component) where component = min id among byte-identical texts.
    * Unlike the fuzzy path this assigns every doc (self for uniques). */
  def assignments(docs: DataFrame, idCol: String = "id", textCol: String = "text"): DataFrame = {
    val keyed = docs.select(col(idCol).cast("long").as("id"), md5(col(textCol)).as("h"))
    val reps = keyed.groupBy(col("h")).agg(min(col("id")).as("component"))
    keyed.join(reps, "h").select(col("id"), col("component"))
  }

  /** Canonical text for normalization-insensitive dedup: lowercase, strip
    * everything but letters/digits/whitespace, collapse whitespace runs,
    * trim. Pure Catalyst (codegen'd, zero shuffle) and deliberately
    * restricted to regex classes with identical semantics in Java regex
    * and RE2 (`\p{L}`, `\p{N}`, `\s`) so any SQL engine can recompute the
    * key — the near-universal web-pipeline variant of exact dedup (same
    * page re-served with tracking punctuation, case or spacing drift). */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^\\p{L}\\p{N}\\s]+", ""),
      "\\s+", " "))

  /** [[assignments]] keyed on md5 of the NORMALIZED text — byte-different
    * but normalization-equal docs land in one component. The shuffle shape
    * is unchanged (16-byte key + id). */
  def normalizedAssignments(docs: DataFrame, idCol: String = "id", textCol: String = "text"): DataFrame = {
    val keyed = docs.select(col(idCol).cast("long").as("id"),
      md5(normalizeText(col(textCol))).as("h"))
    val reps = keyed.groupBy(col("h")).agg(min(col("id")).as("component"))
    keyed.join(reps, "h").select(col("id"), col("component"))
  }

  /** [[kept]] under the normalized key: min-id representative per
    * normalization class survives. */
  def normalizedKept(docs: DataFrame, idCol: String = "id", textCol: String = "text"): DataFrame = {
    val removal = normalizedAssignments(docs, idCol, textCol)
      .where(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    docs.join(removal, Seq(idCol), "left_anti")
  }

  /** Rows kept after exact dedup (min-id representative per text), via
    * left-anti join on the removal set (reference removal anti-join,
    * fuzzy multi gpu/removal.py:19-36). */
  def kept(docs: DataFrame, idCol: String = "id", textCol: String = "text"): DataFrame = {
    val removal = assignments(docs, idCol, textCol)
      .where(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    docs.join(removal, Seq(idCol), "left_anti")
  }
}
