package graft.operators

import graft.Tables
import graft.functions.VectorExpressions
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
  * Training runs seeded Lloyd's on the driver over ONE capped
  * content-keyed sample collect (the codebook is a bounded artifact —
  * 128 centroids × 8 dims); encoding is one scan with broadcast
  * codebooks (argmin over 16 centroids per
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

  /** Train the M sub-codebooks on a deterministic capped sample:
    * `orderBy(xxhash64(vec_id)).limit(cap)` is a content-keyed
    * priority sample — Spark plans it as TakeOrderedAndProject (top-cap
    * per partition, driver merge), so ONE job collects ≤cap rows no
    * matter the corpus size. The codebook itself is a bounded artifact
    * (M·SubK·subDim doubles), so Lloyd's runs on the driver: the 8
    * Spark-ML fits this replaces cost ~2 s of job-scheduling overhead
    * EACH regardless of data size. Seeded k-means++ init, first-match
    * argmin, index tie-breaks → deterministic end to end. Returns
    * M × SubK × subDim centroids.
    */
  def trainCodebooks(emb: DataFrame, dim: Int, nRows: Long,
      sampleCap: Int = 4096): Array[Array[Array[Double]]] = {
    val subDim = dim / M
    val sample: Array[Array[Double]] = emb
      .withColumn("e", unitE)
      .select(col("e"), xxhash64(col("vec_id")).as("h"), col("vec_id"))
      .orderBy(col("h"), col("vec_id"))
      .limit(sampleCap)
      .select("e")
      .collect()
      .map(_.getSeq[Double](0).toArray)
    (0 until M).map { m =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(
        v, m * subDim, (m + 1) * subDim))
      localKMeans(pts, SubK, seed = 42L + m, maxIter = 25)
    }.toArray
  }

  private[operators] def sq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Driver-side Lloyd's with seeded k-means++ init. Empty clusters
    * are re-seeded from the point farthest from its centroid (lowest
    * index on ties) — deterministic.
    */
  private[operators] def localKMeans(pts: Array[Array[Double]], k: Int, seed: Long,
      maxIter: Int): Array[Array[Double]] = {
    val n = pts.length
    val rnd = new scala.util.Random(seed)
    // k-means++ seeding
    val centers = Array.ofDim[Array[Double]](k)
    centers(0) = pts(rnd.nextInt(n)).clone()
    val d2 = pts.map(p => sq(p, centers(0)))
    var c = 1
    while (c < k) {
      val total = d2.sum
      val pick =
        if (total <= 0.0) rnd.nextInt(n)
        else {
          val target = rnd.nextDouble() * total
          var acc = 0.0; var i = 0
          while (i < n - 1 && acc + d2(i) < target) { acc += d2(i); i += 1 }
          i
        }
      centers(c) = pts(pick).clone()
      var i = 0
      while (i < n) { val d = sq(pts(i), centers(c))
        if (d < d2(i)) d2(i) = d; i += 1 }
      c += 1
    }
    // Lloyd iterations
    val assign = new Array[Int](n)
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      moved = false
      var i = 0
      while (i < n) {
        var best = 0; var bestD = sq(pts(i), centers(0)); var j = 1
        while (j < k) {
          val d = sq(pts(i), centers(j))
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        if (assign(i) != best || iter == 0) { assign(i) = best; moved = true }
        i += 1
      }
      val sums = Array.fill(k)(new Array[Double](pts(0).length))
      val cnt = new Array[Int](k)
      i = 0
      while (i < n) {
        val a = assign(i); cnt(a) += 1
        var j = 0
        while (j < pts(i).length) { sums(a)(j) += pts(i)(j); j += 1 }
        i += 1
      }
      var j = 0
      while (j < k) {
        if (cnt(j) > 0) {
          var t = 0
          while (t < sums(j).length) { sums(j)(t) /= cnt(j); t += 1 }
          centers(j) = sums(j)
        } else {
          // re-seed from the worst-fit point
          var worst = 0; var worstD = -1.0; var i2 = 0
          while (i2 < n) {
            val d = sq(pts(i2), centers(assign(i2)))
            if (d > worstD) { worstD = d; worst = i2 }
            i2 += 1
          }
          centers(j) = pts(worst).clone()
        }
        j += 1
      }
      iter += 1
    }
    centers.map(_.clone())
  }

  private[operators] def dist2(a: Column, centroid: Column): Column =
    aggregate(zip_with(a, centroid, (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, x) => acc + x)

  /** L2-normalized double copy of the embedding: cosine order IS L2
    * order on the unit sphere, so the codebooks, codes and ADC tables
    * all live in normalized space and the ADC shortlist ranks by (a
    * quantized form of) the true cosine. Zero vectors pass through
    * unscaled (cosine is undefined there anyway; re-rank decides).
    */
  private[operators] def unitE: Column = {
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
