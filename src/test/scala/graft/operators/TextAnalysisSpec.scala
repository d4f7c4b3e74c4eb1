package graft.operators

import graft.SparkSpec
import graft.core.Tables

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("langId prefers the profile with most stopword hits") {
    val df = Seq(
      (1L, "the cat and the dog is a friend of the house", "en"),
      (2L, "der hund und die katze ist das tier", "de"),
      (3L, "xyzzy plugh quux", "zz")
    ).toDF("doc_id", "text", "lang")
    val m = TextAnalysis.langId(df).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(1L) == "en")
    assert(m(2L) == "de")
    assert(m(3L) == "und")
  }

  test("quality features are consistent on real docs") {
    val q = TextAnalysis.qualityScore(Tables.load(spark, sfDir, "documents")).collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      assert(r.getLong(1) > 0) // n_tokens
      assert(r.getDouble(7) >= 0.0 && r.getDouble(7) <= 1.0) // quality score
    }
  }

  test("token stats count whitespace and regex tokens") {
    val df = Seq((1L, "Hello world, 42 times!")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenStats(df).collect().head
    assert(r.getLong(1) == 4) // hello | world, | 42 | times!
    // regex: hello, world, ',', 42, times, '!' = 6
    assert(r.getLong(2) == 6)
    assert(r.getLong(3) == 4)
  }

  test("fingerprint is invariant to punctuation/case noise") {
    val df = Seq(
      (1L, "Key Agg Row!"),
      (2L, "key agg row"),
      (3L, "other words")
    ).toDF("doc_id", "text")
    val m = TextAnalysis.fingerprint(df).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(m(1L)._1 == m(2L)._1)
    assert(m(1L)._2 == 2L)
    assert(m(3L)._2 == 1L)
  }
}
