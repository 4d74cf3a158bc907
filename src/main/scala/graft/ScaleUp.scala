package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator for scale-certification runs.
  *
  * Replicates the driver's sf0.1 testdata `factor`× (default 10 —
  * an "sf1"-shaped dataset: 6M lineitem / 1.5M orders / 1M events /
  * 50k documents) into a destination directory with the SAME table
  * names and schemas, so `graft.Bench` / `graft.Verify` run on it
  * unchanged. No sf1 testdata exists (TESTDATA.md stops at sf0.1),
  * so certification at the next decade is self-generated — like
  * [[Stress]], but producing the full star schema on disk rather
  * than ad-hoc frames.
  *
  * Replication is copy-offset, NOT row duplication: copy `c` shifts
  * every key family by a fixed stride (large enough to never collide,
  * small enough to stay inside the engine's documented domain guards:
  * doc_id < 1e6 in DedupOps.corpusWithPlantedDups, node ids < 2^32 in
  * GraphOps packed keys). All foreign keys shift together, so
  * referential integrity, join selectivities, and per-copy graph /
  * text / embedding structure are exactly preserved — the dataset is
  * `factor` disjoint sf0.1 worlds, which is precisely the shape a
  * 10× data growth has when key spaces grow with volume.
  *
  * Content transforms per copy (c > 0), all hash-deterministic:
  *
  *   - `customer.c_name` gets a two-char copy suffix ("~cc"): q91
  *     matches names at Levenshtein ≤ 1 and identical cross-copy
  *     names would inflate every blocking group `factor`× (candidate
  *     pairs ×factor² — a replication artifact, not a workload
  *     property). The doubled digit keeps every cross-copy distance
  *     ≥ 2 while same-copy distances are unchanged (equal-length
  *     zero-padded numerics, common suffix).
  *   - `documents.text` is word-permuted (exact permutation: sort by
  *     a per-(copy,doc,position) hash) and ~1/8 of words are mutated
  *     (reversed + copy digit). Without this every doc would have
  *     factor-1 verbatim twins and the near-dup family would measure
  *     the all-dups pathology (bucket pairs ×factor², again an
  *     artifact). The permutation breaks shingle/winnowing/rolling
  *     -hash identity while preserving unigram stats exactly; the
  *     mutation moves word-unigram SimHash past its Hamming radius.
  *     Token counts, lengths, and language markers stay ~7/8 intact.
  *   - `embeddings.embedding` is coordinate-rotated by 7c with
  *     per-(copy,dim) sign flips — an exact isometry within each
  *     copy (all distances/cosines preserved, so per-copy ANN
  *     structure is the real one) while cross-copy cosines are
  *     ~0 instead of 1. Embeddings scale `embFactor`× (default 4,
  *     matching the driver's own sf0.01→sf0.1 growth) and share the
  *     documents stride so the cross-modal doc_id=vec_id join keeps
  *     its per-copy alignment.
  *
  * Dimension leaves (region, nation) and all value/date distributions
  * are unchanged. Each table is written as ONE parquet file (multiple
  * row groups — still splittable) named `<table>.parquet`,
  * content-deterministic across runs (ScaleUpSpec pins multiset
  * equality; parquet footer bytes are not pinned), so both Spark and
  * the DuckDB oracle tooling read the destination exactly like driver
  * testdata.
  *
  * Usage: `sbt 'runMain graft.ScaleUp <srcDir> <dstDir> [factor] [embFactor]'`
  */
object ScaleUp {

  /** Cross-join df with copies 0..n-1 as column `_c` (long). */
  private def withCopies(df: DataFrame, n: Int): DataFrame =
    df.withColumn("_c", explode(sequence(lit(0L), lit(n - 1L))))

  private def shifted(k: String, stride: Long): Column =
    (col(k) + col("_c") * stride).as(k)

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    run(spark, args(0), args(1),
      args.lift(2).map(_.toInt).getOrElse(10),
      args.lift(3).map(_.toInt).getOrElse(4))
    spark.stop()
  }

  def run(spark: SparkSession, src: String, dst: String,
      factor: Int, embFactor: Int): Unit = {
    // The key strides below and the doubled-digit c_name suffix argument
    // (cross-copy Levenshtein >= 2) are only valid for single-digit copy
    // indices; both break silently past 10.
    require(factor >= 1 && factor <= 10,
      s"ScaleUp factor must be in [1, 10], got $factor")
    require(embFactor >= 1 && embFactor <= 10,
      s"ScaleUp embFactor must be in [1, 10], got $embFactor")
    val KCust = 100000L // max 14,999  -> < 1e6 at factor 10
    val KOrd = 1000000L // max 149,999
    val KPart = 100000L // max 19,999  -> < 2^31 (GraphOps packed keys)
    val KSupp = 10000L // max 999
    val KEv = 1000000L // max 99,999
    val KUser = 10000L // max 1,499
    val KDoc = 100000L // max 4,999   -> < 1e6 (DedupOps domain guard)
    val KVec = KDoc // shared stride keeps doc_id=vec_id alignment

    def write(df: DataFrame, name: String): Unit = {
      val tmp = s"$dst/_tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val conf = spark.sparkContext.hadoopConfiguration
      val fs = new org.apache.hadoop.fs.Path(dst).getFileSystem(conf)
      val part = fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$tmp/part-*.parquet"))(0).getPath
      val out = new org.apache.hadoop.fs.Path(s"$dst/$name.parquet")
      fs.delete(out, false)
      fs.rename(part, out)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      println(s"[scaleup] $name: ${spark.read.parquet(out.toString).count()} rows")
    }

    // dimension leaves: verbatim
    write(Tables.region(spark, src), "region")
    write(Tables.nation(spark, src), "nation")

    write(withCopies(Tables.customer(spark, src), factor)
      .select(shifted("c_custkey", KCust),
        when(col("_c") === 0, col("c_name"))
          .otherwise(concat(col("c_name"), lit("~"),
            col("_c").cast("string"), col("_c").cast("string")))
          .as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")),
      "customer")

    write(withCopies(Tables.supplier(spark, src), factor)
      .select(shifted("s_suppkey", KSupp), col("s_name"),
        col("s_nationkey"), col("s_acctbal")),
      "supplier")

    write(withCopies(Tables.part(spark, src), factor)
      .select(shifted("p_partkey", KPart), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size"), col("p_retailprice")),
      "part")

    write(withCopies(Tables.orders(spark, src), factor)
      .select(shifted("o_orderkey", KOrd), shifted("o_custkey", KCust),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority")),
      "orders")

    write(withCopies(Tables.lineitem(spark, src), factor)
      .select(shifted("l_orderkey", KOrd), shifted("l_partkey", KPart),
        shifted("l_suppkey", KSupp), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate")),
      "lineitem")

    write(withCopies(Tables.events(spark, src), factor)
      .select(shifted("event_id", KEv), col("ts"),
        shifted("user_id", KUser), col("event_type"), col("value"),
        col("props")),
      "events")

    // documents: permute word order + mutate ~1/8 of words per copy
    val docs = withCopies(Tables.documents(spark, src), factor)
      .withColumn("_ws", split(col("text"), " "))
      .withColumn("_perm",
        transform(
          array_sort(transform(col("_ws"),
            (w, i) => struct(
              xxhash64(col("_c"), col("doc_id"), i).as("h"),
              w.as("w")))),
          x => x.getField("w")))
      .withColumn("_mut",
        transform(col("_perm"), (w, i) =>
          when(col("_c") > 0 &&
            pmod(xxhash64(col("_c"), col("doc_id"), i, lit("m")), lit(8)) === 0,
            concat(reverse(w), col("_c").cast("string")))
            .otherwise(w)))
      .withColumn("_text",
        when(col("_c") === 0, col("text"))
          .otherwise(array_join(col("_mut"), " ")))
    write(docs.select(shifted("doc_id", KDoc), col("_text").as("text"),
      col("lang"), col("source"), length(col("_text")).as("n_chars")),
      "documents")

    // embeddings: exact per-copy isometry (rotation + sign flips)
    val dims = 64
    val emb = withCopies(Tables.embeddings(spark, src), embFactor)
      .withColumn("_e",
        when(col("_c") === 0, col("embedding"))
          .otherwise(transform(sequence(lit(0), lit(dims - 1)), d =>
            (element_at(col("embedding"),
              (pmod(d + col("_c") * 7, lit(dims)) + 1).cast("int")) *
              when(pmod(xxhash64(col("_c"), d), lit(2)) === 0, lit(1.0f))
                .otherwise(lit(-1.0f))).cast("float"))))
    write(emb.select(shifted("vec_id", KVec),
      col("_e").as("embedding"), col("label")),
      "embeddings")
  }
}
