package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-profiling statistics over the fact tables — the feature-stats
  * pass a training-data pipeline runs before model work (and the
  * generalization of the reference's aggregate views,
  * sql/db_creation_script.sql:185-242).
  */
object StatsOps {

  /** Pearson correlation matrix over `cols` of `df` in ONE aggregate
    * pass: all first and second moments accumulate as partial aggregates
    * (map-side combined, a single 1-row shuffle), then the k(k-1)/2
    * pair rows unfold from the moment row with an explode — the fact
    * table is scanned exactly once regardless of k.
    *
    * Cross-engine determinism: `corr` is scale-invariant, so values are
    * first scaled by 10⁴ to EXACT integers (the testdata is 4-decimal;
    * the double → DECIMAL cast pins the value, ×10⁴ and the cast to
    * DECIMAL(19,0) are exact), and every moment accumulates in decimal
    * integer arithmetic — order-independent, engine-identical (Spark's
    * (19,0)×(19,0) product re-types to (38,0) with scale intact, and the
    * ~10¹⁸-scale products and ~10²³-scale sums fit). Only then does the
    * moment row cast to double, and the final formula is the same
    * correctly-rounded IEEE expression tree the DuckDB oracle evaluates
    * — bit-identical inputs, bit-identical arithmetic, ROUND(…, 4) last
    * (the cosine rule).
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val k = cols.size
    val scaled = df.select(cols.zipWithIndex.map { case (c, i) =>
      (col(c).cast("decimal(18,4)") * 10000).cast("decimal(19,0)")
        .as(s"_x$i")
    }: _*)
    val momentExprs =
      Seq(count(lit(1)).cast("double").as("_n")) ++
      (0 until k).map(i => sum(col(s"_x$i")).cast("double").as(s"_s$i")) ++
      (for (i <- 0 until k; j <- i until k) yield
        sum(col(s"_x$i") * col(s"_x$j")).cast("double").as(s"_s${i}_$j"))
    val moments = scaled.agg(momentExprs.head, momentExprs.tail: _*)
    def variance(i: Int) =
      col("_n") * col(s"_s${i}_$i") - col(s"_s$i") * col(s"_s$i")
    val pairRows = for (i <- 0 until k; j <- i + 1 until k) yield
      struct(lit(cols(i)).as("col_x"), lit(cols(j)).as("col_y"),
        round((col("_n") * col(s"_s${i}_$j") - col(s"_s$i") * col(s"_s$j"))
          / (sqrt(variance(i)) * sqrt(variance(j))), 4).as("corr"))
    moments.select(explode(array(pairRows: _*)).as("_p")).select("_p.*")
  }

  /** 107. Lineitem numeric-column correlation matrix (4 columns → 6
    * pairs). The oracle accumulates the same HUGEINT moments and
    * evaluates the same double expression.
    */
  def q93CorrMatrix(s: SparkSession, d: String): DataFrame =
    corrMatrix(Tables.lineitem(s, d),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
}
