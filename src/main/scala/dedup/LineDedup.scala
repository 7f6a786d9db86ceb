package dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line/paragraph-level exact dedup (the CCNet / RefinedWeb boilerplate
  * remover): drop every non-blank line whose exact content already occurred
  * earlier in the corpus, keeping the globally-first occurrence. "Earlier"
  * is the total order (doc id, line position) — deterministic across runs
  * and partition layouts, like every other representative choice in this
  * engine.
  *
  * This is the complement of document-level dedup: navigation bars, cookie
  * banners and footers repeat across *different* pages whose documents are
  * not near-duplicates, so no document-level pass removes them. The
  * reference has no counterpart (its unit of dedup is always the whole
  * text column, exact_spark.py:128-131); the operator family is standard
  * in webtext pipelines (CCNet §4.1 "deduplicating paragraphs").
  *
  * Scale shape (100 TB): lines are keyed by md5 (128-bit — no birthday
  * collisions at 10^12+ lines, same argument as ExactDedup), so the
  * first-occurrence aggregation shuffles 16 bytes + (id,pos) per line and
  * partial-aggregates map-side; a boilerplate line repeated 10^9 times
  * arrives at its reducer as one pre-combined row per map task. The
  * join-back probes on the same key (build side = one row per distinct
  * line, AQE skew-split handles hot probe keys), and reassembly groups by
  * doc id — bounded by single-document size. Three narrow shuffles total,
  * no window over a global order, no collect.
  */
object LineDedup {

  /** Exploded view: one row per line, `(id, pos, line)`, positions 0-based
    * in source order. `split(_, sep, -1)` keeps trailing empties so
    * reassembly is byte-exact for kept lines. */
  def lines(docs: DataFrame, idCol: String, textCol: String, sep: String = "\n"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("id"),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep), -1))
        .as(Seq("pos", "line")))

  /** Per-doc cleaned text: `(id, text_clean, n_lines, n_kept)` where
    * `text_clean` rejoins (with `sep`) the lines that survive:
    *   - blank lines (trim == "") always survive — they are document
    *     structure, and deduping them would splice unrelated paragraphs;
    *   - a non-blank line survives iff this (id,pos) is the minimum
    *     (id,pos) over all occurrences of the identical line content.
    * Docs whose text is null are passed through with null text_clean. */
  def dedupLines(docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame = {
    val ls = lines(docs, idCol, textCol, sep)
    val nonBlank = ls.where(trim(col("line")) =!= "")
    // Globally-first occurrence per exact line content. min(struct) gives
    // lexicographic (id, pos) — partial-aggregable, skew-immune.
    val firsts = nonBlank
      .groupBy(md5(col("line")).as("h"))
      .agg(min(struct(col("id"), col("pos"))).as("first"))
    val marked = ls
      .withColumn("h", md5(col("line")))
      .join(firsts, Seq("h"), "left")
      .withColumn("keep",
        trim(col("line")) === "" ||
          (col("first.id") === col("id") && col("first.pos") === col("pos")))
    val cleaned = marked
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("keep").cast("long")).as("n_kept"),
        // array_sort on struct(pos, line) orders by pos (unique per doc)
        array_join(
          transform(
            array_sort(collect_list(when(col("keep"), struct(col("pos"), col("line"))))),
            x => x.getField("line")),
          sep).as("text_clean"))
    docs.select(col(idCol).cast("long").as("id"))
      .join(cleaned, Seq("id"), "left")
      .select(col("id"),
        col("text_clean"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }
}
