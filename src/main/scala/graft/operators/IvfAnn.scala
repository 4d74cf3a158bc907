package graft.operators

import graft.Tables
import graft.functions.VectorExpressions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the alternative
  * scale path to sign-LSH: a coarse quantizer assigns every vector to
  * a cell; a query probes only its `nProbe` nearest cells.
  *
  * The index (centroid set) is O(nCells × dim) — kilobytes — so it
  * rides codegen literals; the corpus stays partitioned by cell.
  * Search touches nProbe/nCells of the data: at 100 TB with 4096 cells
  * and a proportional probe count, a query reads a fixed fraction of
  * the corpus, with recall controlled by nProbe rather than corpus
  * size.
  *
  * ENGINE-EXACT since r12: the quantizer is [[IntKMeans]] (md5-capped
  * sample, driver-side integer Lloyd on the floor-e6 lattice), cell
  * assignment and probing are broadcast-literal exact long-d² argmins,
  * and only the final re-rank computes a ROUND-4 cosine — the whole
  * pipeline (training included) replays in DuckDB via generated CTEs
  * (SparkEntry.ivfExactOracleSql), flipping q40 from rows-only to
  * full-oracle. The former Spark-ML k-means&#124;&#124; float trainer is gone:
  * no other engine can replay float-library cell assignments.
  *
  * Reference anchor: the reference scans per-deck aggregate usage
  * vectors exhaustively (helper_functions.py:27-52); this is the
  * sub-linear index replacing exhaustive scans when the vector table
  * is the corpus.
  */
object IvfAnn {

  private val K = 5

  /** Exact-integer IVF search: [[IntKMeans]] trains the coarse
    * quantizer, cell assignment and probing are exact long d² argmins,
    * and the final re-rank is the ROUND-4 cosine with (cos, nid)
    * tie-breaks. Scale shape: training is ONE TakeOrdered sample pass;
    * assignment/probing are codegen passes with zero joins; the
    * candidate join broadcasts the |queries|·nProbe probe set against
    * the cell-partitioned corpus.
    */
  def searchExactInt(s: SparkSession, emb: DataFrame, nCells: Int,
      nProbe: Int, rounds: Int = 3, sampleCap: Int = 4096): DataFrame = {
    val base = emb.select(col("vec_id"), col("embedding"),
      IntKMeans.e6(col("embedding")).as("_e6"))
    val cents = IntKMeans.trainOnSample(base, "vec_id", "_e6",
      nCells, rounds, sampleCap)
    val assigned = IntKMeans.assignCell(s, base, "_e6", cents, "cell")
    val probed = IntKMeans.probeCells(s,
      assigned.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("_e6")),
      "_e6", cents, nProbe, "cell")
      .select("qid", "qe", "cell")
    val scored = assigned
      .select(col("vec_id").as("nid"), col("embedding").as("ne"),
        col("cell"))
      .join(broadcast(probed), Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos_sim",
        round(VectorExpressions.cosine(s, col("qe"), col("ne")), 4))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("nid"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select("qid", "nid", "cos_sim", "rank")
  }

  /** nProbe 8 (vs the former float trainer's 6): the engine-exact
    * integer quantizer shapes cells slightly worse than 20-round
    * k-means&#124;&#124;, so it pays two extra probes for the same ≥0.8 recall@5
    * — the classic IVF knob (measured 0.86 vs brute force at
    * sf0.001).
    */
  def q40AnnIvf(s: SparkSession, d: String): DataFrame =
    searchExactInt(s, Tables.embeddings(s, d), nCells = 16, nProbe = 8)
}
