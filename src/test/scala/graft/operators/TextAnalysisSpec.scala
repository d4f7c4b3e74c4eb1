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

  test("langId tiebreak is deterministic: equal scores fall to lang asc") {
    // 'la' scores 1 for both es and fr; 'de' scores 1 for es; so es wins 2-1.
    // A pure tie: 'la la' alone scores es=2, fr=2 → es (alphabetically first).
    val df = Seq((1L, "la la", "es")).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.langId(df).collect().head
    assert(r.getString(1) == "es" && r.getLong(2) == 2L)
  }

  test("langId is a zero-shuffle projection") {
    val df = Seq((1L, "the cat", "en")).toDF("doc_id", "text", "lang")
    val plan = TextAnalysis.langId(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"langId must not shuffle:\n$plan")
  }

  test("repetition stats on a known doc; short docs survive with zeros") {
    val df = Seq(
      (1L, "a b a b a"),     // 2-grams: "a b"×2, "b a"×2 → tot 4, top 2;
                             // 3-grams: "a b a"×2, "b a b"×1 → tot 3, dup 2
      (2L, "x"),             // no grams at all
      (3L, "p q")            // one 2-gram, no 3-grams
    ).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionStats(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m.keySet == Set(1L, 2L, 3L), "every doc must appear")
    val r1 = m(1L)
    assert(r1.getLong(1) == 4 && r1.getLong(2) == 2) // n_2grams, top_2gram_cnt
    assert(r1.getLong(3) == 500000)                  // top_2gram_ppm
    assert(r1.getLong(4) == 3 && r1.getLong(5) == 2) // n_3grams, dup_3gram_cnt
    assert(r1.getLong(6) == 666666)                  // dup_3gram_ppm
    val r2 = m(2L)
    assert(r2.getLong(1) == 0 && r2.getLong(4) == 0 && r2.isNullAt(3) && r2.isNullAt(6))
    val r3 = m(3L)
    assert(r3.getLong(1) == 1 && r3.getLong(4) == 0)
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
