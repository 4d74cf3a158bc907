package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch dev probe: A/B the q96 prefix-join variants in one JVM. */
object ProbeSetsim {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = "/root/testdata/sf0.1"

    def shingled(repart: Boolean): DataFrame = {
      val raw = Tables.documents(spark, d)
        .filter(col("text").isNotNull)
        .select(col("doc_id"), col("text"))
      val src = if (repart)
        raw.repartition(spark.sparkContext.defaultParallelism) else raw
      src
        .select(col("doc_id"),
          split(lower(trim(col("text"))), "\\s+").as("tk"))
        .select(col("doc_id"), array_distinct(
          when(size(col("tk")) >= 3,
            transform(sequence(lit(0), size(col("tk")) - 3),
              i => concat_ws(" ", slice(col("tk"), i + 1, lit(3)))))
            .otherwise(array(concat_ws(" ", col("tk"))))).as("sh"))
    }

    def variant(ckBase: Boolean, ckPfx: Boolean, repart: Boolean): Long = {
      val base0 = shingled(repart)
        .select(col("doc_id").as("_ss_id"), col("sh").as("_ss_set"))
        .filter(size(col("_ss_set")) > 0)
      val base = if (ckBase) base0.localCheckpoint(false) else base0
      val toks = base.select(col("_ss_id"), size(col("_ss_set")).as("_n"),
        explode(col("_ss_set")).as("_tok"))
      val freq = toks.groupBy(col("_tok")).agg(count(lit(1)).as("_df"))
      val pfx0 = toks.join(freq, Seq("_tok"))
        .groupBy(col("_ss_id"))
        .agg(max(col("_n")).as("_n"),
          sort_array(collect_list(struct(col("_df"), col("_tok"))))
            .as("_fs"))
        .withColumn("_p", expr(s"_n - (_n * 1 + 1) DIV 2 + 1"))
        .select(col("_ss_id"), explode(slice(
          transform(col("_fs"), e => xxhash64(e("_tok"))), lit(1),
          col("_p"))).as("_tok"))
      val pfx = if (ckPfx) pfx0.localCheckpoint(false) else pfx0
      val cand = pfx.select(col("_ss_id").as("id_a"), col("_tok"))
        .join(pfx.select(col("_ss_id").as("id_b"), col("_tok")), Seq("_tok"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct()
      val att = base.select(col("_ss_id"), col("_ss_set"))
      cand
        .join(att.select(col("_ss_id").as("id_a"),
          col("_ss_set").as("_set_a")), Seq("id_a"))
        .join(att.select(col("_ss_id").as("id_b"),
          col("_ss_set").as("_set_b")), Seq("id_b"))
        .withColumn("inter",
          size(array_intersect(col("_set_a"), col("_set_b"))).cast("long"))
        .withColumn("size_a", size(col("_set_a")).cast("long"))
        .withColumn("size_b", size(col("_set_b")).cast("long"))
        .filter(col("inter") * 3 >= (col("size_a") + col("size_b")) * 1)
        .count()
    }

    val variants = Seq(
      ("r13: no ck", false, false, false),
      ("baseCk", true, false, false),
      ("baseCk+pfxCk", true, true, false),
      ("baseCk+pfxCk+repart", true, true, true),
      ("baseCk+repart", true, false, true))
    variants.foreach { case (_, a, b, c) => variant(a, b, c) } // warm all
    for (rep <- 1 to 3) {
      variants.foreach { case (name, a, b, c) =>
        val t0 = System.nanoTime
        val n = variant(a, b, c)
        println(f"[ab] rep$rep $name%-22s ${(System.nanoTime - t0) / 1e9}%6.2f s n=$n")
      }
    }
    spark.stop()
  }
}
