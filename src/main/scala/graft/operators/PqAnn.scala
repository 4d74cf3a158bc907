package graft.operators

import graft.Tables
import graft.functions.VectorExpressions
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product-quantization ANN (Jégou, Douze & Schmid 2011, "Product
  * quantization for nearest neighbor search"): the billion-scale tier
  * of the engine's ANN family. The 64-dim embedding splits into M=8
  * subspaces of 8 dims; each subspace gets its own 16-centroid
  * codebook (sample-trained, seeded — the q40 quantizer rule), so a
  * vector compresses to EIGHT 4-bit codes (4 bytes). Search is asymmetric
  * distance computation (ADC): a query precomputes one 16-entry
  * distance table per subspace (M·16 scalar distances — microseconds),
  * then every corpus vector's approximate distance is four TABLE
  * LOOKUPS — the scan reads the code columns, never the vectors.
  *
  * Why this is the 100-TB path: the code table is 64× smaller than the
  * float vectors (4 bytes vs 256), fits hot storage, and the
  * per-candidate cost is O(M) lookups instead of O(dim) multiplies.
  * The float embeddings are touched only to re-rank the ADC shortlist
  * exactly (the q87 two-stage rule: approximate cut, exact final
  * order), so recall failures are bounded to shortlist misses.
  * Composable with q40's IVF cells (IVF-PQ) — the cell assignment and
  * the codes are independent columns.
  *
  * Training fits M tiny KMeans models on a seeded sample; encoding is
  * one scan with broadcast codebooks (argmin over 16 centroids per
  * subspace via higher-order functions — at production scale this is
  * the one hot loop you would move into a codegen expression, the
  * q74/CountInSorted playbook). Deterministic end to end: seeded
  * training, first-match argmin, rounded re-rank scores, id
  * tie-breaks.
  */
object PqAnn {

  private val M = 8
  private val SubK = 16
  private val K = 5

  /** Train the M sub-codebooks on a seeded sample. Returns
    * M × SubK × subDim centroids.
    */
  def trainCodebooks(emb: DataFrame, dim: Int, nRows: Long,
      sampleFraction: Double = 0.5): Array[Array[Array[Double]]] = {
    val subDim = dim / M
    val withE = emb.withColumn("e", unitE)
    val sample =
      if (nRows * sampleFraction >= SubK * 4L)
        withE.sample(withReplacement = false, sampleFraction, seed = 42L)
      else withE
    (0 until M).map { m =>
      val sliceCol = array_to_vector(
        slice(col("e"), m * subDim + 1, subDim))
      val model = new KMeans().setK(SubK).setSeed(42L + m)
        .setMaxIter(20).setInitMode("k-means||")
        .fit(sample.select(sliceCol.as("features")))
      model.clusterCenters.map(_.toArray)
    }.toArray
  }

  private def dist2(a: Column, centroid: Column): Column =
    aggregate(zip_with(a, centroid, (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, x) => acc + x)

  /** L2-normalized double copy of the embedding: cosine order IS L2
    * order on the unit sphere, so the codebooks, codes and ADC tables
    * all live in normalized space and the ADC shortlist ranks by (a
    * quantized form of) the true cosine. Zero vectors pass through
    * unscaled (cosine is undefined there anyway; re-rank decides).
    */
  private def unitE: Column = {
    val e = transform(col("embedding"), x => x.cast("double"))
    val n = sqrt(aggregate(e, lit(0.0d), (acc, x) => acc + x * x))
    transform(e, x => when(n > 0.0d, x / n).otherwise(x))
  }

  /** Append `code0..code{M-1}` int columns: each subspace's nearest
    * sub-centroid (first-match argmin — deterministic).
    */
  def encode(emb: DataFrame, codebooks: Array[Array[Array[Double]]],
      dim: Int): DataFrame = {
    val subDim = dim / M
    (0 until M).foldLeft(emb.withColumn("e", unitE)) { (df, m) =>
      val cb = typedlit(codebooks(m).map(_.toSeq).toSeq)
      val ds = transform(cb, c => dist2(slice(col("e"), m * subDim + 1, subDim), c))
      df.withColumn(s"code$m",
        (array_position(ds, array_min(ds)) - 1).cast("int"))
    }.drop("e")
  }

  /** Top-K cosine neighbors for queries (vec_id < 10): ADC shortlist
    * over the code columns, exact cosine re-rank of the survivors.
    */
  def search(spark: SparkSession, emb: DataFrame, nRows: Long,
      shortlist: Int = 96): DataFrame = {
    val dim = 64
    val subDim = dim / M
    val codebooks = trainCodebooks(emb, dim, nRows)
    val coded = encode(emb, codebooks, dim).localCheckpoint(false)

    // per-query ADC tables: M arrays of SubK scalar distances
    val queries = (0 until M).foldLeft(
      coded.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
        .withColumn("q",
          transform(col("qe"), x => x.cast("double")))
        .withColumn("q", {
          val n = sqrt(aggregate(col("q"), lit(0.0d),
            (acc, x) => acc + x * x))
          transform(col("q"), x => when(n > 0.0d, x / n).otherwise(x))
        })
    ) { (df, m) =>
      val cb = typedlit(codebooks(m).map(_.toSeq).toSeq)
      df.withColumn(s"dt$m",
        transform(cb, c => dist2(slice(col("q"), m * subDim + 1, subDim), c)))
    }.drop("q")

    // the scan side carries ONLY ids + codes; approximate distance is
    // M element_at lookups per candidate
    val codesOnly = coded.select(
      col("vec_id").as("nid") +: (0 until M).map(m => col(s"code$m")): _*)
    val adist = (0 until M).map(m =>
      element_at(col(s"dt$m"), col(s"code$m") + 1)).reduce(_ + _)
    val cand = codesOnly.crossJoin(
        broadcast(queries.select(
          col("qid") +: (0 until M).map(m => col(s"dt$m")): _*)))
      .filter(col("qid") =!= col("nid"))
      .withColumn("adist", adist)
    val short = graft.plans.TopK.perKey(cand, keys = Seq("qid"),
      order = Seq(("adist", false), ("nid", false)), k = shortlist)
      .select("qid", "nid")

    // exact re-rank: vectors touched only for the shortlist
    val reranked = short
      .join(coded.select(col("vec_id").as("nid"), col("embedding").as("ne")),
        "nid")
      .join(broadcast(queries.select(col("qid"), col("qe"))), "qid")
      .withColumn("cos_sim",
        round(VectorExpressions.cosine(spark, col("qe"), col("ne")), 4))
    graft.plans.TopK.perKey(reranked, keys = Seq("qid"),
        order = Seq(("cos_sim", true), ("nid", false)), k = K)
      .select("qid", "nid", "cos_sim")
  }

  def q120PqAnn(s: SparkSession, d: String): DataFrame =
    search(s, Tables.embeddings(s, d),
      nRows = graft.sources.TableStatistics.tableRowCount(s, d, "embeddings"))
}
