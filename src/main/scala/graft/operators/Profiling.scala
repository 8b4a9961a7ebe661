package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table/corpus profiling — the data-validation pass a pipeline runs
  * before committing a corpus to training (the `SUMMARIZE` shape):
  * per-column null count, exact distinct count, and min/max rendered
  * as strings.
  */
object Profiling {

  /** One-pass per-column profile. All statistics for every column are
    * computed in a SINGLE aggregate over the table (Catalyst plans the
    * multi-distinct via Expand + partial aggregation — one scan, one
    * exchange); the collected result is exactly ONE row, unpivoted
    * driver-side into the per-column report. `count_distinct` is exact
    * to stay oracle-checkable — substitute `approx_count_distinct`
    * for a cheap 100 TB sweep where ±2% is fine.
    */
  def profileTable(df: DataFrame, columns: Seq[String] = Nil,
      exact: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cs = if (columns.nonEmpty) columns else df.columns.toSeq
    require(cs.nonEmpty, "profileTable needs at least one column")
    val aggs = cs.flatMap { c =>
      // exact=false is the 100 TB sweep: HLL sketches replace the
      // multi-distinct, which removes the Expand (cols+1 row copies)
      // AND the distinct-key exchange — the whole profile becomes one
      // ordinary partial/final aggregate pass (±~2% on distincts)
      val distinctAgg =
        if (exact) count_distinct(col(c)) else approx_count_distinct(col(c))
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__n_$c"),
        distinctAgg.as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def longAt(i: Int): Long = if (row.isNullAt(i)) 0L else row.getLong(i)
    def strAt(i: Int): String = if (row.isNullAt(i)) null else row.getString(i)
    cs.zipWithIndex.map { case (c, i) =>
      (c, longAt(i * 4), longAt(i * 4 + 1), strAt(i * 4 + 2), strAt(i * 4 + 3))
    }.toDF("column_name", "n_nulls", "n_distinct", "min_value", "max_value")
  }
}
