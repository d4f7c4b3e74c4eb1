package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  test("shingles: count and content for a known doc") {
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val sh = Dedup.shingles(df, 3).orderBy("shingle").collect().map(_.getString(1))
    assert(sh.toSeq == Seq("a b c", "b c d"))
  }

  test("shingles: docs shorter than n tokens yield no shingles, no crash") {
    val df = Seq((1L, "a b"), (2L, ""), (3L, "one two three four")).toDF("doc_id", "text")
    val sh = Dedup.shingles(df, 3).collect()
    assert(sh.map(_.getLong(0)).toSet == Set(3L))
    // and the full pipelines survive short docs
    assert(Dedup.jaccardPairs(Dedup.shingles(df, 3), 0.1).collect().isEmpty)
    assert(Dedup.minhashLsh(df, 3, 8, 2, 0.3).collect().isEmpty)
  }

  test("duplicated spans: repeats flagged against the corpus-first occurrence") {
    val df = Seq(
      (1L, "a b c d e"), // windows: "a b c", "b c d", "c d e" — all first
      (2L, "b c d x y"), // "b c d" duplicates doc 1 pos 2; others unique
      (3L, "a b c d e"), // every window duplicates doc 1
      (4L, "a b")        // too short: no windows, absent from output
    ).toDF("doc_id", "text")
    val out = Dedup.duplicatedSpans(df, w = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == ((3L, 0L, false)))
    assert(out(2L) == ((3L, 1L, true)))
    assert(out(3L) == ((3L, 3L, true)))
  }

  test("duplicated spans: within-doc repetition counts after the first") {
    val df = Seq((7L, "x y x y x y")).toDF("doc_id", "text")
    // windows: "x y x"(1) "y x y"(2) "x y x"(3) "y x y"(4) — positions 3,4 dup
    val r = Dedup.duplicatedSpans(df, w = 3).head()
    assert(r.getLong(1) == 4L && r.getLong(2) == 2L && r.getLong(3) == 500000L)
  }

  test("duplicated spans plan: exactly two shuffles, no sort in the marker window") {
    val plan = Dedup.duplicatedSpans(docs, w = 20).queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 2, s"expected 2 shuffles (hash window + doc rollup):\n$plan")
    // min(struct) is an aggregate window — no per-partition sort by (doc,pos)
    assert(!plan.contains("row_number"), "marker must not rank-sort the hash partition")
  }

  test("jaccard pairs are symmetric-free, bounded, and ordered") {
    val pairs = Dedup.jaccardPairs(Dedup.shingles(docs, 3), 0.1).collect()
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val j = r.getDouble(3)
      assert(j >= 0.1 && j <= 1.0)
    }
  }

  test("prefix-filtered jaccard pairs equal the direct self-join exactly") {
    // the lossless-filter claim: the PPJoin-style path must produce the
    // IDENTICAL result set (pairs, common counts, jaccard values) as the
    // direct O(Σ df²) shingle self-join, on BOTH sides of the dispatch
    // threshold
    for (t <- Seq(0.1, 0.3, 0.6)) {
      val sh = Dedup.shingles(docs, 3)
      val prefix = Dedup.jaccardPairsPrefix(sh, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      val direct = Dedup.jaccardPairsDirect(sh, t).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(prefix == direct,
        s"t=$t: prefix path diverged (missing=${direct -- prefix}, extra=${prefix -- direct})")
      assert(t >= 0.3 || direct.nonEmpty, s"t=$t produced no pairs — test corpus too clean")
    }
  }

  test("identical docs have jaccard 1.0 via minhash LSH") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "completely different words appear in this other document here now")
    ).toDF("doc_id", "text")
    val out = Dedup.minhashLsh(df, 3, 8, 2, 0.5).collect()
    assert(out.length == 1)
    assert(out.head.getLong(0) == 1L && out.head.getLong(1) == 2L)
    assert(out.head.getDouble(2) == 1.0)
  }

  test("minhash LSH recall vs exact jaccard at high threshold") {
    // At J >= 0.5, 8 hashes / 4 bands x 2 rows: P(candidate) = 1-(1-J^2)^4
    // >= 93% per pair; on this corpus recall should be total.
    val sh = Dedup.shingles(docs, 3)
    val exact = Dedup.jaccardPairs(sh, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(docs, 3, 8, 2, 0.5)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH-verified pairs must be a subset of exact pairs")
    val recall = if (exact.isEmpty) 1.0 else lsh.size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall too low (${lsh.size}/${exact.size})")
  }

  test("simhash: identical docs get identical fingerprints, disjoint docs differ") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val m = Dedup.simhash16(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    assert(m(1L) != m(3L))
    m.values.foreach(v => assert(v >= 0 && v < 65536))
  }

  test("embedding near-dup: identical vectors always collide; sims verified exact") {
    // two identical vectors plus noise vectors: the identical pair MUST be
    // found (equal vectors share every band bucket) with sim = 1.0
    val rnd = new scala.util.Random(5)
    val base = Array.fill(64)(rnd.nextFloat() * 2f - 1f)
    val rows = Seq(0L -> base, 1L -> base) ++
      (2L to 20L).map(i => i -> Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    val df = rows.toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDup(df, bands = 4, planesPerBand = 2,
        dim = 64, minCos = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.contains((0L, 1L, 1.0)), s"identical pair missing from $out")
    out.foreach { case (i, j, s) => assert(i < j && s >= 0.99) }
  }

  test("embedding near-dup candidates are a subset of all-pairs at threshold") {
    val e = graft.core.Tables.load(spark, sfDir, "embeddings")
    val lsh = Dedup.embeddingNearDup(e, minCos = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = e.select(col("vec_id").as("i"), col("embedding").as("ea"))
      .crossJoin(e.select(col("vec_id").as("j"), col("embedding").as("eb")))
      .filter(col("i") < col("j"))
      .withColumn("sim", Similarity.cosine(col("ea"), col("eb")))
      .filter(col("sim") >= 0.35)
      .select("i", "j")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(all), s"LSH emitted non-dup pairs: ${lsh -- all}")
    assert(lsh.nonEmpty, "banded LSH found zero of the near-dup pairs")
  }

  test("segmentDedup: first occurrence wins, later copies dropped, md5 exact") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val tenTok = "a b c d e f g h i j"
    val docs = Seq(
      (1L, s"$tenTok k"),   // segs: [a..j], [k] — both first occurrences
      (2L, tenTok),         // duplicate of doc 1 seg 0 → nothing survives
      (3L, "k"),            // duplicate of doc 1 seg 1 → nothing survives
      (4L, "x y")           // unique single short segment
    ).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, width = 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap
    assert(out(1L) == ((2L, 2L, 1000000L, md5hex(s"$tenTok k"))))
    assert(out(2L) == ((1L, 0L, 0L, md5hex(""))))
    assert(out(3L) == ((1L, 0L, 0L, md5hex(""))))
    assert(out(4L) == ((1L, 1L, 1000000L, md5hex("x y"))))
  }

  test("segmentDedup: within-doc repeats dedup too; position order preserved") {
    import spark.implicits._
    // width 2: doc 1 = [p q] [p q] [r s] → second [p q] dropped
    val docs = Seq((1L, "p q p q r s")).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(docs, width = 2).collect()
    assert(out.length == 1)
    val r = out(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 2L, 666666L)))
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest("p q r s".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r.getString(4) == md5, "survivors re-assemble in position order")
  }

  test("aggregate-min minhash signatures equal the HOF signature array") {
    // r11 moved sig[s] = min md5(s|shingle) from a post-shuffle nested-HOF
    // projection over the collected set into map-side-combined min aggregate
    // columns over the raw (duplicated) shingle rows; both must agree.
    val d = docs.limit(200)
    val sh = Dedup.shinglesWithDups(d, 3)
    val numHashes = 8
    val viaAgg = sh.groupBy("doc_id")
      .agg(collect_set("shingle").as("set"),
        (0 until numHashes).map(s =>
          min(md5(concat(lit(s.toString + "|"), col("shingle")))).as(s"mh$s")): _*)
      .select(col("doc_id").cast("long").as("doc_id"),
        array((0 until numHashes).map(s => col(s"mh$s")): _*).as("sig"))
    val viaHof = Dedup.minhashSignatureArray(
      Dedup.shingles(d, 3).groupBy("doc_id").agg(collect_set("shingle").as("set")),
      numHashes)
      .select(col("doc_id").cast("long").as("doc_id"), col("sig"))
    val a = viaAgg.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val b = viaHof.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, sig) => assert(sig == b(id), s"doc $id signatures differ") }
  }
}
