package graft.dev

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.GraftSession
import graft.io.Tables
import graft.ops.TextOps

/** r7 VERDICT item 1: q90_bm25_search regressed 0.49 → 1.51 s in the
  * r7 driver artifact, correlated with q88/q92/q72/q99 (1.25-1.7×).
  * Two candidate explanations: (a) driver-box contention (the same
  * code measures 0.75 s median-of-5 on an idle r8 box — between the
  * r6 and r7 artifacts), and (b) the `bm25Scored` core extraction for
  * q117 left the corpus tokenized TWICE per run (once under the
  * stats aggregate, once under the scoring projection — Spark does
  * not dedupe common lazy subtrees).
  *
  * This profile measures (b) directly, interleaved median-of-5:
  *   A  current two-pass plan (stats agg + broadcast-join scoring)
  *   B  single-tokenize via localCheckpoint of the narrow
  *      (id, toks, dln) frame (eager materialize, ContextCleaner
  *      frees the blocks when the result DF is GC'd)
  *   C  persist(MEMORY_AND_DISK) of the same frame with explicit
  *      unpersist after the count (the lifecycle a caller controls)
  * plus the q117 passage shape (chunkDocs is ALSO duplicated under
  * the current plan) for A and B. Results land in PLANS.md.
  */
object ProfileQ90 {

  private val terms = Seq("data", "model", "training")

  private def variantA(docs: DataFrame): DataFrame =
    TextOps.bm25Search(docs, terms, 20)

  // single-tokenize scoring core used by variants B/C
  private def scoreFrom(base: DataFrame, idCol: String): DataFrame = {
    val aggCols =
      count(lit(1)).cast(DoubleType).as("n_docs") +:
      sum(col("dln")).as("sum_dl") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum((size(filter(col("toks"), x => x === lit(t))) > 0)
          .cast(LongType)).as(s"df_$i")
      }
    val stats = base.agg(aggCols.head, aggCols.tail: _*)
    val dl = col("dln").cast(DoubleType)
    val avgdl = col("sum_dl").cast(DoubleType) / col("n_docs")
    val score = terms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(col("toks"), x => x === lit(t)))
        .cast(DoubleType)
      val df = col(s"df_$i").cast(DoubleType)
      (col("n_docs") - df + lit(0.5)) / (df + lit(0.5)) *
        (tf * lit(2.2)) /
        (tf + lit(1.2) * (lit(0.25) + lit(0.75) * dl / avgdl))
    }.reduce(_ + _)
    import org.apache.spark.sql.expressions.Window
    val top = base.crossJoin(broadcast(stats))
      .select(col(idCol), score.as("bm25"))
      .filter(col("bm25") > lit(0.0))
      .orderBy(col("bm25").desc, col(idCol)).limit(20)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("bm25").desc, col(idCol))))
      .select(col(idCol), col("rank"), col("bm25"))
      .orderBy("rank")
  }

  private def narrowBase(docs: DataFrame): DataFrame = {
    val toksC = TextOps.tokens(col("text"))
    docs.select(col("doc_id"), toksC.as("toks"),
      size(toksC).cast(LongType).as("dln"))
  }

  private def variantB(docs: DataFrame): DataFrame =
    scoreFrom(narrowBase(docs).localCheckpoint(true), "doc_id")

  /** D: tokenize ONCE into a per-doc (id, dln, tf_0..tf_q) frame —
    * ~q ints per doc, GBs not TBs at warehouse doc counts — and
    * localCheckpoint THAT; stats and scoring both read the tiny
    * materialized frame. */
  private def variantD(docs: DataFrame): DataFrame = {
    val idCol = "doc_id"
    val toksC = TextOps.tokens(col("text"))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(toksC, x => x === lit(t))).cast(LongType).as(s"tf_$i")
    }
    val base = docs.select(
      (col(idCol) +: size(toksC).cast(LongType).as("dln") +: tfCols): _*)
      .localCheckpoint(true)
    val aggCols =
      count(lit(1)).cast(DoubleType).as("n_docs") +:
      sum(col("dln")).as("sum_dl") +:
      terms.indices.map { i =>
        sum((col(s"tf_$i") > 0).cast(LongType)).as(s"df_$i")
      }
    val stats = base.agg(aggCols.head, aggCols.tail: _*)
    val dl = col("dln").cast(DoubleType)
    val avgdl = col("sum_dl").cast(DoubleType) / col("n_docs")
    val score = terms.indices.map { i =>
      val tf = col(s"tf_$i").cast(DoubleType)
      val df = col(s"df_$i").cast(DoubleType)
      (col("n_docs") - df + lit(0.5)) / (df + lit(0.5)) *
        (tf * lit(2.2)) /
        (tf + lit(1.2) * (lit(0.25) + lit(0.75) * dl / avgdl))
    }.reduce(_ + _)
    import org.apache.spark.sql.expressions.Window
    val top = base.crossJoin(broadcast(stats))
      .select(col(idCol), score.as("bm25"))
      .filter(col("bm25") > lit(0.0))
      .orderBy(col("bm25").desc, col(idCol)).limit(20)
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("bm25").desc, col(idCol))))
      .select(col(idCol), col("rank"), col("bm25"))
      .orderBy("rank")
  }

  private def variantC(docs: DataFrame): Long = {
    val base = narrowBase(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = scoreFrom(base, "doc_id").count()
    base.unpersist(false)
    n
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.documents(spark, sfDir)

    val reps = 5
    val items: Seq[(String, () => Long)] = Seq(
      "A_current" -> (() => variantA(docs).count()),
      "B_localckpt" -> (() => variantB(docs).count()),
      "C_persist" -> (() => variantC(docs)),
      "D_tf_frame" -> (() => variantD(docs).count()),
      "A_passage" -> (() => TextOps.passageSearch(docs, terms, 20).count()),
    )
    items.foreach { case (_, f) => f() } // warmup
    val samples = (1 to reps).map { _ =>
      items.map { case (name, f) =>
        val t0 = System.nanoTime()
        f()
        name -> (System.nanoTime() - t0) / 1e9
      }
    }
    items.map(_._1).zipWithIndex.foreach { case (name, i) =>
      val ts = samples.map(_(i)._2).sorted
      println(f"[q90] $name median=${ts(reps / 2)}%.2f s " +
        s"runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
