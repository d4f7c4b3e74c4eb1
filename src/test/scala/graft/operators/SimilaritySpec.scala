package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sfDir, "embeddings")

  test("cosine of a vector with itself is 1") {
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val c = df.select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
      .collect().head.getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("brute-force top-k returns k ranked rows per query, sims descending") {
    val out = Similarity.bruteForceTopK(emb, col("vec_id") < 3, 5)
      .orderBy("qid", "rank").collect()
    assert(out.length == 15)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sims = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("brute-force top-k matches a local exhaustive computation") {
    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(vecs(0L), v)) }
      .sortBy { case (id, s) => (-s, id) }.take(5).map(_._1)
    val got = Similarity.bruteForceTopK(emb, col("vec_id") === 0, 5)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(got == expected, s"operator top-5 $got != local top-5 $expected")
  }

  test("IVF with full probe (nprobe = kCells) equals brute force exactly") {
    val ivf = Similarity.ivfTopK(emb, col("vec_id") < 3, kCells = 4, nprobe = 4, k = 5)
      .collect().map(_.toSeq).toSet
    val bf = Similarity.bruteForceTopK(emb, col("vec_id") < 3, 5)
      .collect().map(_.toSeq).toSet
    assert(ivf == bf, s"full-probe IVF diverges from brute force: ${ivf -- bf} / ${bf -- ivf}")
  }

  test("IVF partial probe returns ranked rows from probed cells only") {
    val out = Similarity.ivfTopK(emb, col("vec_id") % 100 === 7,
        kCells = 16, nprobe = 2, k = 10)
      .orderBy("qid", "rank").collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(3)).toSeq == (1L to rows.length))
      val sims = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("sign-LSH buckets are deterministic and bounded") {
    val b1 = Similarity.signLshBuckets(emb, 8, 64).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b2 = Similarity.signLshBuckets(emb, 8, 64).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 == b2)
    b1.values.foreach(v => assert(v >= 0 && v < 256))
  }

  test("quantizer at kCells = 1024: no literal blowup, exact argmin, bounded cells") {
    val n = 4096; val dim = 16; val k = 1024
    val rnd = new scala.util.Random(42)
    val vecs = Array.tabulate(n)(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val df = vecs.toSeq.toDF("vec_id", "embedding")

    val assigned = Similarity.assignCells(df, k)
    // the plan must be O(1) in kCells: a broadcast join against a centroid
    // TABLE, not one literal-array expression per centroid (1024 cells ×
    // 16 dims of inlined doubles would already exceed 100 KB of plan text
    // and at SemDeDup's ~1e5 cells would fall out of codegen entirely)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(plan.length < 50000, s"plan text is ${plan.length} chars — literal blowup?")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "cell assignment should be a broadcast join against the centroid table")

    val got = assigned.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // exact local replay of the same double arithmetic (float widening is exact)
    def d2(e: Array[Float], c: Array[Float]): Double = {
      var sd = 0.0; var dc = 0.0; var cd = 0.0
      var i = 0
      while (i < e.length) {
        sd += e(i).toDouble * e(i).toDouble
        dc += e(i).toDouble * c(i).toDouble
        cd += c(i).toDouble * c(i).toDouble
        i += 1
      }
      sd - 2.0 * dc + cd
    }
    val expected = vecs.map { case (id, e) =>
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val d = d2(e, vecs(c)._2)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      id -> best
    }.toMap
    assert(got == expected, "distributed argmin diverges from local replay")
    // each centroid is its own nearest centroid (d2 = 0 exactly)
    (0 until k).foreach(i => assert(got(i.toLong) == i))
    // per-cell population stays bounded — the within-cell self-join of
    // semanticDedup is O(max_cell²), so this is the quantity that must not
    // degrade toward O((n/16)²) at scale
    val cellSizes = got.values.groupBy(identity).map(_._2.size)
    assert(cellSizes.max <= 64,
      s"max cell ${cellSizes.max} of $n rows — quantizer not spreading")
  }

  test("autoCells sizes the quantizer to the corpus") {
    assert(Similarity.autoCells(100) == 16, "small corpora clamp to 16 cells")
    assert(Similarity.autoCells(1024L * 1024) == 1024)
    // a 1 B-document corpus lands near SemDeDup's ~1e5 clusters
    val k1b = Similarity.autoCells(1000000000L)
    assert(k1b >= 100000 && k1b <= (1 << 20), s"1B docs -> $k1b cells")
    assert(Similarity.autoCells(Long.MaxValue) == (1 << 20), "hard upper clamp")
  }
}
