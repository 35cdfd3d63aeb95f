package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted IVF index (r8): stored-index answers must be
  * bit-identical to the in-memory fit, and a query must OPEN only
  * its probed cells' files — partition pruning at the metadata
  * level, asserted as a file census (the PipelineSpec discipline). */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private val emb =
    graft.io.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("ivfFromIndex ≡ ivfKmeansTopK bit-for-bit") {
    val dir = Files.createTempDirectory("graft_ivf_idx").toString
    Similarity.buildIvfIndex(emb, dir, numCentroids = 8, iters = 2)
    val queries = emb.filter($"vec_id" < 20)
    val mem = Similarity.ivfKmeansTopK(emb, queries, 5,
        numCentroids = 8, iters = 2, nProbe = 3)
      .as[(Long, Int, Long, Double)].collect().toSeq
    val idx = Similarity.ivfFromIndex(spark, dir, queries, 5, nProbe = 3)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(mem.nonEmpty && idx == mem)
  }

  test("appendToIvfIndex: incremental ingest ≡ full build under the " +
    "same centroids") {
    val half1 = emb.filter($"vec_id" % 2 === 0)
    val half2 = emb.filter($"vec_id" % 2 === 1)
    // incremental: fit on half1, append half2 under the STORED cents
    val incDir = Files.createTempDirectory("graft_ivf_inc").toString
    Similarity.buildIvfIndex(half1, incDir, numCentroids = 8, iters = 2)
    Similarity.appendToIvfIndex(half2, incDir)
    // reference: the same centroids assigned over the full union —
    // rebuild the index dir with half1's quantizer by hand
    val queries = emb.filter($"vec_id" < 20)
    val res = Similarity.ivfFromIndex(spark, incDir, queries, 5,
        nProbe = 8) // all cells: result = exact ANN under these cents
      .as[(Long, Int, Long, Double)].collect().toSeq
    // nProbe = numCentroids probes every cell, so the result must
    // equal brute force over the union — the strongest equivalence
    // (q128's nProbe=all ≡ brute-force argument, post-append)
    val brute = Similarity.bruteForceTopK(emb, queries, 5)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(res.nonEmpty && res == brute)
  }

  test("pqFromIndex ≡ pqTopK bit-for-bit; code rows are narrow") {
    val dir = Files.createTempDirectory("graft_pq_idx").toString
    Similarity.buildPqIndex(emb, dir, m = 4, codesPerSub = 8, iters = 2)
    val queries = emb.filter($"vec_id" < 20)
    val mem = Similarity.pqTopK(emb, queries, 5,
        m = 4, codesPerSub = 8, iters = 2, rerank = 60)
      .as[(Long, Int, Long, Double)].collect().toSeq
    val idx = Similarity.pqFromIndex(spark, dir, queries, 5, rerank = 60)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(mem.nonEmpty && idx == mem)
    // the ADC scan side must carry m int codes + one double, not the
    // float vectors — the compression story, asserted on the schema
    val codes = spark.read.parquet(s"$dir/codes")
    assert(codes.columns.length == 4 + 2) // corpus_id, __c0..3, __rn
    assert(codes.schema.fields.count(
      _.dataType.typeName == "integer") == 4)
  }

  test("a query opens ONLY its probed cells' partition files") {
    val dir = Files.createTempDirectory("graft_ivf_idx2").toString
    Similarity.buildIvfIndex(emb, dir, numCentroids = 8, iters = 2)
    val cellDirs = new java.io.File(s"$dir/cells").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.length > 3, "need >3 cells for pruning to bind")
    // ONE query, nProbe=2 → at most 2 of the ≥4 cells may be read
    val q1 = emb.filter($"vec_id" === 0)
    val res = Similarity.ivfFromIndex(spark, dir, q1, 5, nProbe = 2)
    assert(res.count() == 5)
    // file census via the same pruned read the operator performs:
    // reconstruct its cells frame and count distinct opened files
    val cents = spark.read.parquet(s"$dir/centroids")
      .orderBy("cell").as[(Long, Seq[Double])].collect()
    // replicate the probe ranking driver-side for the expected cells
    val qv = q1.select($"embedding").as[Seq[Float]].head()
      .map(_.toDouble)
    val ranked = cents.map { case (cell, c) =>
      val dp = qv.zip(c).foldLeft(0.0)((a, p) => a + p._1 * p._2)
      val nm = math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x))
      (-(dp / nm), cell)
    }.sorted.take(2).map(_._2).toSet
    val opened = spark.read.parquet(s"$dir/cells")
      .withColumn("cell", $"cell".cast("long"))
      .filter($"cell".isin(ranked.toSeq: _*))
      .select(input_file_name()).distinct().as[String].collect()
      .map(f => f.substring(f.indexOf("cell=")))
      .map(_.split('/').head).toSet
    assert(opened == ranked.map(c => s"cell=$c"),
      s"pruned read opened $opened, expected exactly $ranked")
    // and the pruned read's plan carries the partition filter
    val plan = spark.read.parquet(s"$dir/cells")
      .withColumn("cell", $"cell".cast("long"))
      .filter($"cell".isin(ranked.toSeq: _*))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"no partition filter in:\n$plan")
  }
}
