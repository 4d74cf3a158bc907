package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch dev probe: stage-by-stage wall/row split of the q96/q108
  * prefix-filter joins at sf0.1 (r15 — where does the residual go?).
  */
object ProbeSetsim {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = "/root/testdata/sf0.1"

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime
      val r = f
      println(f"[stage] $name%-28s ${(System.nanoTime - t0) / 1e9}%6.2f s")
      r
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (rep <- 1 to 3) {
      println(s"--- rep $rep")
      // q96 pipeline, stage by stage (fresh lineage each rep)
      val docs = Tables.documents(spark, d)
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          split(lower(trim(col("text"))), "\\s+").as("tk"))
        .select(col("doc_id"), array_distinct(
          when(size(col("tk")) >= 3,
            transform(sequence(lit(0), size(col("tk")) - 3),
              i => concat_ws(" ", slice(col("tk"), i + 1, lit(3)))))
            .otherwise(array(concat_ws(" ", col("tk"))))).as("sh"))
      val base = t("q96 base ckpt") {
        docs.select(col("doc_id").as("_ss_id"), col("sh").as("_ss_set"))
          .filter(size(col("_ss_set")) > 0)
          .localCheckpoint(false)
      }
      val toks = base.select(col("_ss_id"), size(col("_ss_set")).as("_n"),
        explode(col("_ss_set")).as("_tok"))
      val freq = toks.groupBy(col("_tok")).agg(count(lit(1)).as("_df"))
      val ordArr = toks.join(freq, Seq("_tok"))
        .groupBy(col("_ss_id"))
        .agg(max(col("_n")).as("_n"),
          sort_array(collect_list(struct(col("_df"), col("_tok"))))
            .as("_fs"))
        .withColumn("_p", expr(s"_n - (_n * 1 + 1) DIV 2 + 1"))
        .select(col("_ss_id"), col("_n").cast("long").as("_n"), col("_p"),
          transform(col("_fs"), e => xxhash64(e("_tok"))).as("_hs"))
      val pfx = ordArr.select(col("_ss_id"), col("_n"),
        posexplode(slice(col("_hs"), lit(1), col("_p")))
          .as(Seq("_pix", "_tok")))
      t("q96 pfx noop")(noop(pfx))
      val candNoFilter = pfx.select(col("_ss_id").as("id_a"), col("_tok"))
        .join(pfx.select(col("_ss_id").as("id_b"), col("_tok")),
          Seq("_tok"))
        .filter(col("id_a") < col("id_b"))
      val candRows = t("q96 cand rows (nofilter)")(candNoFilter.count())
      val cand = pfx.select(col("_ss_id").as("id_a"), col("_n").as("_na"),
          col("_pix").as("_pa"), col("_tok"))
        .join(pfx.select(col("_ss_id").as("id_b"), col("_n").as("_nb"),
          col("_pix").as("_pb"), col("_tok")), Seq("_tok"))
        .filter(col("id_a") < col("id_b"))
        .filter(least(col("_na") - col("_pa"), col("_nb") - col("_pb")) *
          3 >= (col("_na") + col("_nb")) * 1)
      val candRowsF = t("q96 cand rows (pos-filter)")(cand.count())
      val dis = cand.select("id_a", "id_b").distinct()
      val disRows = t("q96 cand distinct")(dis.count())
      println(s"[rows] cand=$candRows posfilter=$candRowsF distinct=$disRows")
      val att = base.select(col("_ss_id"), col("_ss_set"))
      val ver = dis
        .join(att.select(col("_ss_id").as("id_a"),
          col("_ss_set").as("_set_a")), Seq("id_a"))
        .join(att.select(col("_ss_id").as("id_b"),
          col("_ss_set").as("_set_b")), Seq("id_b"))
        .withColumn("inter",
          size(array_intersect(col("_set_a"), col("_set_b"))).cast("long"))
        .withColumn("size_a", size(col("_set_a")).cast("long"))
        .withColumn("size_b", size(col("_set_b")).cast("long"))
        .filter(col("inter") * 3 >= (col("size_a") + col("size_b")) * 1)
        .select("id_a", "id_b", "inter", "size_a", "size_b")
      t("q96 verify noop")(noop(ver))
      t("q96 full")(noop(
        SparkEntry.queries("q96_setsim_join")(spark, d)))
      t("q108 full")(noop(
        SparkEntry.queries("q108_containment")(spark, d)))
    }
    spark.stop()
  }
}
