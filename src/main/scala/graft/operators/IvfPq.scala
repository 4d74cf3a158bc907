package graft.operators

import graft.Tables
import graft.functions.VectorExpressions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVF-PQ: the composed billion-scale ANN index (Jégou, Douze &
  * Schmid 2011 §IV — the layout FAISS calls `IVFx,PQy`). The coarse
  * quantizer (q40's IVF idea) partitions the corpus into cells so a
  * query touches only its `nProbe` nearest cells; within a cell,
  * vectors are stored as q120's 4-byte PQ codes — but computed on the
  * RESIDUAL (vector − cell centroid), which concentrates the
  * distribution each sub-codebook must cover and is what makes the
  * composition better than either half alone. Search is per-(query,
  * cell) asymmetric distance: the query's residual against its probed
  * cell yields 8 16-entry lookup tables; candidates in that cell score
  * with 8 table lookups over the codes-only scan. The float vectors
  * are read once, to exact-cosine re-rank the ADC shortlist.
  *
  * The 100-TB shape: the inverted lists are cell-partitioned (a probe
  * is partition pruning, not a scan), the per-candidate payload is 4
  * bytes + a cell id, the probe tables are |queries|·nProbe rows and
  * BROADCAST, and training is one capped content-keyed sample collect
  * (coarse + all 8 sub-codebooks from the same sample — bounded
  * artifacts, driver-side seeded Lloyd's, see PqAnn.trainCodebooks).
  * All ranking is deterministic: rounded scores, id tie-breaks.
  *
  * Reference anchor: the reference keeps per-deck aggregate "usage
  * vectors" it scans exhaustively (helper_functions.py:27-52); this is
  * the sub-linear index that replaces exhaustive scans when the vector
  * table is the corpus, not a dashboard.
  */
object IvfPq {

  private[graft] val M = 8
  private[graft] val SubK = 16
  private val K = 5

  /** Coarse centroids + residual sub-codebooks from ONE capped
    * deterministic sample (unit-normalized space, see PqAnn.unitE).
    */
  def train(emb: DataFrame, dim: Int, nCells: Int,
      sampleCap: Int = 4096)
      : (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val subDim = dim / M
    val sample: Array[Array[Double]] = emb
      .withColumn("e", PqAnn.unitE)
      .select(col("e"), xxhash64(col("vec_id")).as("h"), col("vec_id"))
      .orderBy(col("h"), col("vec_id"))
      .limit(sampleCap)
      .select("e")
      .collect()
      .map(_.getSeq[Double](0).toArray)
    val coarse = PqAnn.localKMeans(sample, nCells, seed = 7L, maxIter = 25)
    val residuals = sample.map { p =>
      var best = 0; var bestD = PqAnn.sq(p, coarse(0)); var j = 1
      while (j < nCells) {
        val d = PqAnn.sq(p, coarse(j))
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      val r = new Array[Double](p.length)
      var t = 0
      while (t < p.length) { r(t) = p(t) - coarse(best)(t); t += 1 }
      r
    }
    val pq = (0 until M).map { m =>
      val pts = residuals.map(v => java.util.Arrays.copyOfRange(
        v, m * subDim, (m + 1) * subDim))
      PqAnn.localKMeans(pts, SubK, seed = 42L + m, maxIter = 25)
    }.toArray
    (coarse, pq)
  }

  /** Append `cell` + residual codes `code0..code{M-1}`: one scan,
    * broadcast codebooks, first-match argmin.
    */
  def encode(emb: DataFrame, coarse: Array[Array[Double]],
      pq: Array[Array[Array[Double]]], dim: Int): DataFrame = {
    val subDim = dim / M
    val coarseLit = typedlit(coarse.map(_.toSeq).toSeq)
    val cellDs = transform(coarseLit, c => PqAnn.dist2(col("e"), c))
    val withCell = emb
      .withColumn("e", PqAnn.unitE)
      .withColumn("cell",
        (array_position(cellDs, array_min(cellDs)) - 1).cast("int"))
      .withColumn("r",
        zip_with(col("e"), element_at(coarseLit, col("cell") + 1),
          (x, c) => x - c))
    (0 until M).foldLeft(withCell) { (df, m) =>
      val cb = typedlit(pq(m).map(_.toSeq).toSeq)
      val ds = transform(cb,
        c => PqAnn.dist2(slice(col("r"), m * subDim + 1, subDim), c))
      df.withColumn(s"code$m",
        (array_position(ds, array_min(ds)) - 1).cast("int"))
    }.drop("e", "r")
  }

  /** Top-K cosine neighbors for queries (vec_id < 10): probe `nProbe`
    * cells, ADC over residual codes, exact re-rank of the shortlist.
    * Trains + encodes inline, then delegates to [[searchEncoded]] —
    * the same kernel the persisted-index path
    * ([[graft.sources.AnnIndexStore]]) uses, so index-backed search is
    * provably the in-memory result.
    */
  def search(spark: SparkSession, emb: DataFrame, nCells: Int,
      nProbe: Int, shortlist: Int = 64): DataFrame = {
    val dim = 64
    val (coarse, pq) = train(emb, dim, nCells)
    val coded = encode(emb, coarse, pq, dim).localCheckpoint(false)
    val codesOnly = coded.select(
      col("vec_id") +: col("cell") +:
        (0 until M).map(m => col(s"code$m")): _*)
    searchEncoded(spark, codesOnly,
      coded.select(col("vec_id"), col("embedding")),
      coarse, pq, dim, nProbe, shortlist)
  }

  /** The search-only kernel over a pre-encoded corpus: `codes` is the
    * index payload (vec_id, cell, code0..code{M-1} — 4 bytes + a cell
    * id per vector), `vecs` the float corpus (vec_id, embedding),
    * touched only for the query vectors and the shortlist re-rank.
    * Everything upstream (training, encoding) can come from a
    * persisted artifact; this path never trains.
    */
  private[graft] def searchEncoded(spark: SparkSession, codes: DataFrame,
      vecs: DataFrame, coarse: Array[Array[Double]],
      pq: Array[Array[Array[Double]]], dim: Int,
      nProbe: Int, shortlist: Int = 64): DataFrame = {
    val subDim = dim / M
    val coarseLit = typedlit(coarse.map(_.toSeq).toSeq)

    // probe selection: nProbe nearest cells per query, same metric as
    // the quantizer (L2 in unit-normalized space)
    val queries = vecs.filter(col("vec_id") < 10)
      .withColumn("q", PqAnn.unitE)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("q"))
    val probedAll = queries
      .select(col("qid"), col("qe"), col("q"),
        posexplode(coarseLit).as(Seq("cell", "centroid")))
      .withColumn("cdist", PqAnn.dist2(col("q"), col("centroid")))
    val probed = graft.plans.TopK.perKey(probedAll, keys = Seq("qid"),
      order = Seq(("cdist", false), ("cell", false)), k = nProbe)

    // per-(query, cell) ADC tables on the query residual — |queries|·
    // nProbe rows, each M arrays of SubK scalars → broadcast
    val withRes = probed.withColumn("qr",
      zip_with(col("q"), col("centroid"), (x, c) => x - c))
    val tables = (0 until M).foldLeft(withRes) { (df, m) =>
      val cb = typedlit(pq(m).map(_.toSeq).toSeq)
      df.withColumn(s"dt$m", transform(cb,
        c => PqAnn.dist2(slice(col("qr"), m * subDim + 1, subDim), c)))
    }.select(col("qid") +: col("cell").as("pcell") +:
      (0 until M).map(m => col(s"dt$m")): _*)

    // cell-pruned ADC scan: codes + cell only (4 bytes + int payload);
    // when codes come from a cell-partitioned parquet artifact the
    // probe join's cell predicate is partition pruning, not a scan
    val codesOnly = codes.select(
      col("vec_id").as("nid") +: col("cell") +:
        (0 until M).map(m => col(s"code$m")): _*)
    val adist = (0 until M).map(m =>
      element_at(col(s"dt$m"), col(s"code$m") + 1)).reduce(_ + _)
    val cand = codesOnly
      .join(broadcast(tables), col("cell") === col("pcell"))
      .filter(col("qid") =!= col("nid"))
      .withColumn("adist", adist)
    val short = graft.plans.TopK.perKey(cand, keys = Seq("qid"),
      order = Seq(("adist", false), ("nid", false)), k = shortlist)
      .select("qid", "nid")

    // exact re-rank: floats touched only for the shortlist
    val reranked = short
      .join(vecs.select(col("vec_id").as("nid"), col("embedding").as("ne")),
        "nid")
      .join(broadcast(queries.select(col("qid"), col("qe"))), "qid")
      .withColumn("cos_sim",
        round(VectorExpressions.cosine(spark, col("qe"), col("ne")), 4))
    graft.plans.TopK.perKey(reranked, keys = Seq("qid"),
        order = Seq(("cos_sim", true), ("nid", false)), k = K)
      .select("qid", "nid", "cos_sim")
  }

  def q121IvfPq(s: SparkSession, d: String): DataFrame =
    search(s, Tables.embeddings(s, d), nCells = 16, nProbe = 6)
}
