package graft

import org.apache.spark.sql.functions.{col, date_format}

import graft.etl.Analog
import graft.io.Tables
import graft.ops.Similarity

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    // warm up codegen/JIT/parquet-footer caches outside the timings
    try spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy("o_orderstatus").count().count()
    catch { case _: Throwable => }

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    def jsonMap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => s"\"" + k + "\":" + v }
        .mkString("{", ",", "}")

    // a failed query records -1.0 (never a fake small timing), and the
    // sorted Seq keeps the JSON keys in query order
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case e: Throwable =>
                   System.err.println(s"[bench] $name failed: ${e.getMessage}")
                   false }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val total = results.map(_._2).filter(_ >= 0).sum

    // ---- Amortized-Silver mode: the self-contained numbers above
    // rebuild Bronze→Silver inside every curated-family query (the
    // correctness gate needs that); at 100 TB you build Silver ONCE
    // and run Gold off the stored partitioned table (Pipeline.run's
    // shape). Both stories are reported: silver_build is the one-time
    // cost, amortized.queries are the same query definitions reading
    // the materialized Silver from parquet (no cache — storage-fed,
    // like a real warehouse scan).
    val silverDir =
      s"${sys.props("java.io.tmpdir")}/graft_bench_silver_${ProcessHandle.current().pid()}"
    val amortized = try {
      val silverBuild = timed {
        Tables.writeParquet(
          Analog.curated(spark, sfDir).withColumn("booking_month",
            date_format(col("booking_date"), "yyyy-MM")),
          silverDir, partitionBy = Seq("booking_month"))
      }
      // same failure isolation as the main loop: one bad query records
      // -1.0, it doesn't void silver_build and the other timings
      val aq = SparkEntry.curatedQueries.toSeq.sortBy(_._1).map {
        case (name, fn) =>
          name -> (try timed {
            fn(spark, spark.read.parquet(silverDir).drop("booking_month"))
              .count()
          } catch { case e: Throwable =>
            System.err.println(s"[bench] amortized $name failed: ${e.getMessage}")
            -1.0
          })
      }
      val aTotal = aq.map(_._2).filter(_ >= 0).sum
      s""""amortized":{"silver_build":$silverBuild,"total":$aTotal,"queries":${jsonMap(aq)}}"""
    } catch { case e: Throwable =>
      System.err.println(s"[bench] amortized failed: ${e.getMessage}")
      s""""amortized":{"silver_build":-1.0,"total":-1.0,"queries":{}}"""
    } finally {
      try org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(silverDir))
      catch { case _: Throwable => }
    }

    // ---- ANN recall@5 at the production q32/q36 parameters, measured
    // against brute force on this SF's real corpus (same harness the
    // SimilaritySessionsSpec retune used) — emitted per round so a
    // recall regression is as visible as a timing one.
    val recall = try {
      val emb = Tables.embeddings(spark, sfDir)
      val queries = emb.filter(col("vec_id") < 50)
      val truth = Similarity.bruteForceTopK(emb, queries, 5)
      val lsh = Similarity.recallAtK(truth,
        Similarity.lshTopK(emb, queries, 5, numPlanes = 4, tables = 8))
      val ivf = Similarity.recallAtK(truth,
        Similarity.ivfTopK(emb, queries, 5, numCentroids = 32, nProbe = 16))
      s""""recall_at_5":{"q32_lsh_topk":$lsh,"q36_ivf_topk":$ivf}"""
    } catch { case e: Throwable =>
      System.err.println(s"[bench] recall failed: ${e.getMessage}")
      s""""recall_at_5":{}"""
    }

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${jsonMap(results)},$amortized,$recall,"sf":"$sfDir"}""")
    spark.stop()
  }
}
