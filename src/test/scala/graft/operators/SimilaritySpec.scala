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
}
