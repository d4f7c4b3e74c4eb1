package graft.operators

import graft.SparkSpec

class SearchSpec extends SparkSpec {
  import spark.implicits._

  private def bm25(tf: Double, df: Double, n: Double, dl: Double, avgdl: Double,
      k1: Double = 1.2, b: Double = 0.75): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5)) * tf * (k1 + 1.0) /
      (tf + k1 * (1.0 - b + b * dl / avgdl))

  test("bm25TopK: hand-computed scores, rank order, n_terms_hit") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "apple apple apple apple")).toDF("doc_id", "text")
    val out = Search.bm25TopK(docs, Seq("apple", "cherry"), 10).collect()
    val byId = out.map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val avgdl = 3.0 // (3 + 2 + 4) / 3
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(byId(1L) == ((r6(bm25(2, 2, 3, 3, avgdl)), 1L)))
    assert(byId(2L) == ((r6(bm25(1, 1, 3, 2, avgdl)), 1L)))
    assert(byId(3L) == ((r6(bm25(4, 2, 3, 4, avgdl)), 1L)))
    // rank order: the rare term beats the common one; higher tf beats lower
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 3L, 1L))
  }

  test("bm25TopK: docs matching no term are absent; k truncates; multi-term hits counted") {
    val docs = Seq(
      (1L, "x y z"),
      (2L, "apple cherry plum"),
      (3L, "apple apple"),
      (4L, "cherry")).toDF("doc_id", "text")
    val out = Search.bm25TopK(docs, Seq("apple", "cherry"), 2).collect()
    assert(out.length == 2)
    assert(!out.map(_.getLong(0)).contains(1L))
    val all = Search.bm25TopK(docs, Seq("apple", "cherry"), 10).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(all(2L) == 2L) // hits both terms
    assert(all(3L) == 1L)
    assert(!all.contains(1L))
  }

  test("bm25TopK: query terms are lowercased and deduped; empty query rejected") {
    val docs = Seq((1L, "apple pie")).toDF("doc_id", "text")
    val out = Search.bm25TopK(docs, Seq("APPLE", "Apple"), 5).collect()
    assert(out.length == 1 && out(0).getLong(2) == 1L)
    intercept[IllegalArgumentException] { Search.bm25TopK(docs, Seq.empty, 5) }
  }
}
