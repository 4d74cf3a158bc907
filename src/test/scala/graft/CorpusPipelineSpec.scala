package graft

import graft.operators.DedupOps
import graft.pipeline.CorpusPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end pipeline integration: the composed clean → scrub →
  * filter → dedup → split flow over the real corpus plus planted
  * exact and near duplicates — the cross-operator seams (column
  * contracts between stages, dedup feeding split, counts telescoping)
  * that per-operator specs can't see.
  */
class CorpusPipelineSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def plantedDocs() = {
    val base = Tables.documents(spark, Sf)
      .filter(col("text").isNotNull)
      .select("doc_id", "text", "lang", "source")
    // exact copies (id + 1e7) and near copies missing the first word
    // (id + 2e7) for 20 docs — the pipeline must keep ONE per class
    val seed = base.filter(col("doc_id") < 20)
    base
      .unionByName(seed.select((col("doc_id") + 10000000L).as("doc_id"),
        col("text"), col("lang"), col("source")))
      .unionByName(seed.select((col("doc_id") + 20000000L).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"),
        col("lang"), col("source")))
  }

  test("corpus pipeline end to end: stages telescope, planted dups die, " +
      "every kept doc passes every filter, splits partition the output, " +
      "run log records the stages, and a re-run is bit-identical") {
    val out = java.nio.file.Files.createTempDirectory("graft_pipe").toString
    val res = CorpusPipeline.run(spark, plantedDocs(), out)
    val report = res.report.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(report.map(_._1).toSeq ==
      Seq("clean_scrub", "quality_filter", "exact_dedup",
        "neardup_dedup", "split"))
    // counts telescope: stage i's output is stage i+1's input
    report.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 == b._2, s"${a._1} out ${a._3} != ${b._1} in ${b._2}")
    }
    report.foreach { case (n, in, outN) =>
      assert(outN <= in && outN > 0, s"$n: $in -> $outN")
    }

    val kept = spark.read.parquet(res.corpusDir)
    val keptRows = kept.collect()
    assert(keptRows.length == report.last._3.toInt)
    // splits partition the output; hash rule respected
    val bySplit = keptRows.groupBy(_.getAs[String]("split"))
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit("train").size >
      bySplit.get("val").map(_.size).getOrElse(0))
    keptRows.foreach { r =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(r.getAs[Long]("doc_id").toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val expect = if (h < "e666") "train"
        else if (h < "f333") "val" else "test"
      assert(r.getAs[String]("split") == expect)
    }

    // every kept doc passes the quality gates on ITS OWN text
    keptRows.foreach { r =>
      val toks = r.getAs[String]("text").split("\\s+").filter(_.nonEmpty)
      assert(toks.length >= 3)
      val top = toks.groupBy(identity).values.map(_.length).max
      assert(top * 1000 <= 500 * toks.length,
        s"doc ${r.getAs[Long]("doc_id")} too repetitive")
      assert(!r.getAs[String]("text").matches(".*[0-9]{7,}.*"))
    }

    // exact dups: no two kept docs share a content hash; planted exact
    // copies lost to the original (min doc_id wins)
    val hashes = keptRows.map(_.getAs[String]("text"))
    assert(hashes.distinct.length == hashes.length)
    val keptIds = keptRows.map(_.getAs[Long]("doc_id")).toSet
    assert(!keptIds.exists(_ >= 10000000L),
      "planted duplicates must lose to their lower-id originals")
    // near-dups: re-verifying the KEPT set finds nothing >= threshold
    val residual = DedupOps.ngramJaccardVerify(
        kept.select(col("doc_id"), col("text")))
      .filter(col("jaccard") >= 0.8).count()
    assert(residual == 0L, s"$residual near-dup pairs survived")

    // run log: one JSON record, all steps ok
    val logJson = scala.io.Source.fromFile(
      res.runLogPath.stripPrefix("file:")).mkString
    assert(logJson.contains("\"ok\":true") &&
      logJson.contains("\"neardup_dedup\"") &&
      logJson.contains("\"write\""))

    // determinism: a second run keeps the identical id->split mapping
    val out2 = java.nio.file.Files.createTempDirectory("graft_pipe2")
      .toString
    val res2 = CorpusPipeline.run(spark, plantedDocs(), out2)
    val m1 = keptRows.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[String]("split")).toMap
    val m2 = spark.read.parquet(res2.corpusDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(m1 == m2)
  }

  test("full recipe: semantic dedup kills planted same-embedding twins " +
      "lexical dedup can't see, decontamination scrubs benchmark " +
      "leakage, and the extended stage counts still telescope") {
    // semantic twins: docs 100..119 cloned with UNRELATED text (passes
    // clean/quality/exact/near-dup) but the IDENTICAL embedding — only
    // the semantic stage can connect them to their originals
    val twinIds = (100L until 120L)
    val base = Tables.documents(spark, Sf)
      .filter(col("text").isNotNull)
      .select("doc_id", "text", "lang", "source")
    val twinDocs = twinIds.zipWithIndex.map { case (id, i) =>
      (id + 30000000L,
        s"unrelated twin body $i carries fresh vocabulary alpha$i " +
          s"beta$i gamma$i delta$i with no shingle overlap at all",
        "en", "twin")
    }.toDF("doc_id", "text", "lang", "source")
    val docs = base.unionByName(twinDocs)
    val emb = Tables.embeddings(spark, Sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val twinEmb = emb.filter(col("vec_id").isin(twinIds: _*))
      .select((col("vec_id") + 30000000L).as("vec_id"), col("embedding"))
    val allEmb = emb.unionByName(twinEmb)
    // benchmark: 10 real docs verbatim — exact-contaminated by their
    // sources, which decontamination must drop from the corpus
    val bench = base.filter(col("doc_id") % 50 === 0)
      .limit(10).select("doc_id", "text")
      .select((col("doc_id") + 40000000L).as("doc_id"), col("text"))

    val out = java.nio.file.Files.createTempDirectory("graft_pipe3").toString
    val res = CorpusPipeline.run(spark, docs, out,
      embeddings = Some(allEmb), benchmark = Some(bench))
    val report = res.report.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(report.map(_._1).toSeq ==
      Seq("clean_scrub", "quality_filter", "exact_dedup",
        "neardup_dedup", "semantic_dedup", "decontaminate", "split"))
    report.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 == b._2, s"${a._1} out ${a._3} != ${b._1} in ${b._2}")
    }

    val kept = spark.read.parquet(res.corpusDir)
    val keptIds = kept.collect().map(_.getAs[Long]("doc_id")).toSet
    // identical embeddings give cos 1.0 ≥ 0.95 and the min-id
    // canonical keeps the original — a pair can never BOTH survive.
    // (A base doc may die lexically BEFORE the semantic stage — its
    // twin then has no partner and legitimately survives.)
    twinIds.foreach { id =>
      assert(!(keptIds.contains(id) && keptIds.contains(id + 30000000L)),
        s"both $id and its semantic twin survived")
    }
    // twins can die ONLY at the semantic stage (their text is unique
    // and benchmark-disjoint); a twin survives only when its base died
    // lexically first, leaving no pair
    val twinsKilled = twinIds.count(id => !keptIds.contains(id + 30000000L))
    assert(twinsKilled >= 15,
      s"only $twinsKilled twins died — the semantic stage missed pairs")
    // decontamination: nothing kept shares a shingle with the benchmark
    val residualContam = graft.operators.DedupOps.contamination(
        kept.select(col("doc_id"), col("text")),
        bench).count()
    assert(residualContam == 0L,
      s"$residualContam benchmark-contaminated docs survived")
    // and the semantic stage really fired
    val sem = report.find(_._1 == "semantic_dedup").get
    assert(sem._2 - sem._3 >= twinsKilled,
      s"semantic stage dropped only ${sem._2 - sem._3}")
  }
}
