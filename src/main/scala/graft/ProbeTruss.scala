package graft

import org.apache.spark.sql.functions._

/** Scratch dev probe: q240 k-truss stage timing (r15 basket path). */
object ProbeTruss {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val d = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime
      val r = f
      println(f"[kt] $name%-24s ${(System.nanoTime - t0) / 1e9}%6.2f s")
      r
    }
    for (_ <- 1 to 3) {
      val orders = t("orders groupBy+ck") {
        val o = Tables.lineitem(spark, d)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .groupBy(col("ok")).agg(collect_set(col("pk")).as("parts"))
          .select(col("parts")).filter(size(col("parts")) > 1)
          .localCheckpoint(false)
        o.count(); o
      }
      val nRaw = t("stats agg") {
        orders.agg(coalesce(sum(
          expr("CAST(size(parts) AS BIGINT) * (size(parts) - 1)")),
          lit(0L)).as("raw")).collect()(0).getLong(0)
      }
      val packed = t("packed collect") {
        orders.rdd.mapPartitions { it =>
          var buf = new Array[Long](1024)
          var o = 0
          it.foreach { row =>
            val parts = row.getSeq[Long](0)
            val need = o + parts.length + 1
            if (need > buf.length) buf = java.util.Arrays
              .copyOf(buf, math.max(buf.length * 2, need))
            buf(o) = parts.length; o += 1
            parts.foreach { p => buf(o) = p; o += 1 }
          }
          Iterator.single(java.util.Arrays.copyOf(buf, o))
        }.collect()
      }
      println(s"[kt] nRaw=$nRaw packedLongs=${packed.map(_.length).sum}")
      // replicate the in-memory assembly stepwise
      val (ids, us, vs) = t("pairgen+sort+orient") {
        val nodeIdx = new java.util.HashMap[java.lang.Long, Integer]()
        var ids0 = new Array[Long](1024)
        def idOf(x: Long): Int = {
          val got = nodeIdx.get(x)
          if (got != null) got.intValue
          else {
            val ix = nodeIdx.size
            if (ix == ids0.length)
              ids0 = java.util.Arrays.copyOf(ids0, ix * 2)
            ids0(ix) = x; nodeIdx.put(x, ix); ix
          }
        }
        val pairs = new Array[Long]((nRaw / 2).toInt)
        var m = 0
        packed.foreach { part =>
          var p = 0
          while (p < part.length) {
            val len = part(p).toInt
            var a = 0
            while (a < len) {
              val da = idOf(part(p + 1 + a))
              var b = a + 1
              while (b < len) {
                val db = idOf(part(p + 1 + b))
                pairs(m) = (math.min(da, db).toLong << 32) |
                  math.max(da, db).toLong
                m += 1
                b += 1
              }
              a += 1
            }
            p += 1 + len
          }
        }
        java.util.Arrays.sort(pairs, 0, m)
        var nUnd = 0
        var i = 0
        while (i < m) {
          if (i == 0 || pairs(i) != pairs(i - 1)) {
            pairs(nUnd) = pairs(i); nUnd += 1
          }
          i += 1
        }
        val nN = nodeIdx.size
        val idsA = java.util.Arrays.copyOf(ids0, nN)
        val usA = new Array[Int](nUnd); val vsA = new Array[Int](nUnd)
        i = 0
        while (i < nUnd) {
          val x = (pairs(i) >>> 32).toInt; val y = pairs(i).toInt
          if (idsA(x) < idsA(y)) { usA(i) = x; vsA(i) = y }
          else { usA(i) = y; vsA(i) = x }
          i += 1
        }
        (idsA, usA, vsA)
      }
      println(s"[kt] nUnd=${us.length} nN=${ids.length}")
      val peeled = t("driverPeel compute") {
        operators.GraphOps.driverPeel(spark, ids, us, vs, 6)
      }
      val nOut = t("noop write") {
        peeled.write.format("noop").mode("overwrite").save()
        peeled.count()
      }
      println(s"[kt] survivors=$nOut")
      t("full q240 + noop") {
        SparkEntry.queries("q240_ktruss")(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
