package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  test("dedupClusters: pairs become clusters, min doc_id is canonical") {
    val d = (1L to 8L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // two clusters {1,2,3} (chain) and {5,7}; 4,6,8 singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 7L)).toDF("doc_a", "doc_b")
    val out = Curation.dedupClusters(d, pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out(1L) == ((1L, 3L, true)))
    assert(out(2L) == ((1L, 3L, false)))
    assert(out(3L) == ((1L, 3L, false)))
    assert(out(5L) == ((5L, 2L, true)))
    assert(out(7L) == ((5L, 2L, false)))
    for (s <- Seq(4L, 6L, 8L)) assert(out(s) == ((s, 1L, true)))
    // every doc appears exactly once
    assert(out.size == 8)
  }

  test("dedupClusters: no pairs → all singletons, all canonical") {
    val d = (1L to 5L).map(i => (i, "x")).toDF("doc_id", "text")
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val out = Curation.dedupClusters(d, empty).collect()
    assert(out.length == 5)
    assert(out.forall(r => r.getLong(0) == r.getLong(1) && r.getLong(2) == 1L && r.getBoolean(3)))
  }

  test("stratifiedSample: exactly k per stratum (when stratum has >= k), reproducible") {
    val s1 = Curation.stratifiedSample(docs, "lang", 5)
    val s2 = Curation.stratifiedSample(docs, "lang", 5)
    val a = s1.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val b = s2.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a == b, "sample must be reproducible run-to-run")
    val perStratum = s1.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val strataSizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perStratum.foreach { case (s, n) => assert(n == math.min(5L, strataSizes(s))) }
    assert(perStratum.keySet == strataSizes.keySet)
  }

  test("stratifiedSample: priority is a pure function of doc_id+salt, not position") {
    // same ids in a different row order / partitioning → identical sample
    val shuffled = docs.repartition(7, col("text"))
    val a = Curation.stratifiedSample(docs, "lang", 3).select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Curation.stratifiedSample(shuffled, "lang", 3).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // different salt → (almost surely) different sample
    val c = Curation.stratifiedSample(docs, "lang", 3, salt = "other")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a != c)
  }

  test("tokenBudgetSelect: greedy prefix by quality within budget, monotone cum_cost") {
    val out = Curation.tokenBudgetSelect(docs, "lang", "n_chars", budget = 20000L)
    val rows = out.collect().map(r => (r.getString(1), r.getDouble(2), r.getLong(0),
      r.getLong(3), r.getLong(4), r.getBoolean(5)))
    assert(rows.length == docs.count())
    rows.groupBy(_._1).foreach { case (_, g) =>
      // within a stratum, walking in (quality desc, doc_id) order the cum_cost
      // is the running sum of cost and `selected` is a prefix property
      val sorted = g.sortBy(t => (-t._2, t._3))
      var run = 0L
      var stillIn = true
      sorted.foreach { case (_, _, _, cost, cum, sel) =>
        run += cost
        assert(cum == run, "cum_cost must be the running total in rank order")
        assert(sel == (cum <= 20000L))
        if (!sel) stillIn = false else assert(stillIn || !sel)
      }
    }
  }

  test("piiScrub: urls, emails, ipv4 redacted in fixed order with correct counts") {
    val d = Seq(
      (1L, "Mail me at Bob.Smith+x@Example.COM or see https://a.b/c?x now"),
      (2L, "server at 10.0.0.1 and 192.168.1.255 no mail"),
      (3L, "nested http://host/u@v stays one url"),
      (4L, "plain words only")
    ).toDF("doc_id", "text")
    val out = Curation.piiScrub(d).orderBy("doc_id").collect()
    // doc 1: one email, one url (query part '?x' stops the url at '?', fine)
    assert(out(0).getLong(out(0).fieldIndex("n_emails")) == 1L)
    assert(out(0).getLong(out(0).fieldIndex("n_urls")) == 1L)
    val r1 = out(0).getString(out(0).fieldIndex("redacted"))
    assert(r1.contains("<EMAIL>") && r1.contains("<URL>"))
    assert(!r1.contains("@"))
    // casing of non-PII content is preserved — a scrub must not lowercase
    assert(r1.startsWith("Mail me at "))
    // doc 2: two IPs
    assert(out(1).getLong(out(1).fieldIndex("n_ipv4")) == 2L)
    assert(out(1).getString(out(1).fieldIndex("redacted")).contains("<IP>"))
    // doc 3: the URL swallows the @-shaped path — counted as url, not email
    assert(out(2).getLong(out(2).fieldIndex("n_urls")) == 1L)
    assert(out(2).getLong(out(2).fieldIndex("n_emails")) == 0L)
    // doc 4: untouched byte-for-byte
    assert(out(3).getString(out(3).fieldIndex("redacted")) == "plain words only")
    assert(out(3).getLong(out(3).fieldIndex("n_urls")) == 0L)
  }

  test("piiScrub: zero shuffles (pure projection)") {
    val plan = Curation.piiScrub(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"piiScrub must not shuffle:\n$plan")
  }

  test("weightedSample: reproducible, k rows, heavier docs sampled more often") {
    val a = Curation.weightedSample(docs, "n_chars", 50).collect()
    val b = Curation.weightedSample(docs, "n_chars", 50).collect()
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq)
    assert(a.length == 50)
    // ranks are 1..k and keys non-increasing in rank order
    assert(a.map(_.getLong(3)).sorted.toSeq == (1L to 50L))
    // weight-proportionality (statistical, loose): mean weight of the sample
    // should exceed the corpus mean — heavy docs win u^(1/w) races more often
    val sampleMean = a.map(_.getLong(1)).sum.toDouble / a.length
    val corpusMean = docs.agg(avg(col("n_chars"))).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"sample mean weight $sampleMean should exceed corpus mean $corpusMean")
  }

  test("weightedSample: non-positive weights raise instead of silently biasing") {
    val bad = Seq((1L, 10L), (2L, 0L), (3L, 25L)).toDF("doc_id", "w")
    val ex = intercept[Exception] {
      Curation.weightedSample(bad, "w", 3).collect()
    }
    assert(ex.getMessage.contains("non-positive") ||
      Option(ex.getCause).exists(_.getMessage.contains("non-positive")))
  }

  test("weightedSample: partitioning-invariant") {
    val a = Curation.weightedSample(docs, "n_chars", 20).collect().map(_.getLong(0)).toSet
    val b = Curation.weightedSample(docs.repartition(13, col("text")), "n_chars", 20)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("packSequences: offsets are the exact serial concatenation, packs correct") {
    val d = Seq((0L, 100L), (1L, 250L), (2L, 50L), (3L, 300L), (4L, 12L))
      .toDF("doc_id", "n_tok")
    val out = Curation.packSequences(d, "n_tok", seqLen = 128L, bucketSize = 2L)
      .orderBy("doc_id").collect()
    // serial offsets: 0, 100, 350, 400, 700
    val expect = Seq(
      (0L, 100L, 0L, 0L, 0L, 0L),     // [0,100) → pack 0
      (1L, 250L, 100L, 0L, 2L, 100L), // [100,350) → packs 0..2
      (2L, 50L, 350L, 2L, 3L, 94L),   // [350,400) → packs 2..3
      (3L, 300L, 400L, 3L, 5L, 16L),  // [400,700) → packs 3..5
      (4L, 12L, 700L, 5L, 5L, 60L))   // [700,712) → pack 5
    val got = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect)
  }

  test("packSequences: bucketed two-level scan equals a single global cumsum") {
    val global = docs.select(col("doc_id").cast("long").as("doc_id"),
        col("n_chars").cast("long").as("cost"))
      .withColumn("start_off",
        coalesce(sum("cost").over(org.apache.spark.sql.expressions.Window
          .orderBy("doc_id").rowsBetween(Long.MinValue, -1)), lit(0L)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val packed = Curation.packSequences(docs, "n_chars", 512L, bucketSize = 37L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(packed == global)
  }

  test("contamination: hits counted exactly, clean docs flagged clean") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),       // shares "alpha beta gamma"
      (2L, "one two three four five six"),          // clean
      (3L, "zz yy alpha beta gamma")                // shares, fewer shingles
    ).toDF("doc_id", "text")
    val probes = Seq((100L, "alpha beta gamma unrelated tail")).toDF("doc_id", "text")
    val out = Curation.contamination(corpus, probes, 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    assert(out(1L) == ((3L, 1L, true)))   // 3 shingles, 1 hit
    assert(out(2L) == ((4L, 0L, false)))
    assert(out(3L) == ((3L, 1L, true)))
  }

  test("contamination: plan broadcasts the probe side, single doc_id shuffle") {
    val plan = Curation.contamination(docs, docs.limit(5), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"probe side must broadcast:\n$plan")
  }

  test("hashPriority: uniform-ish and stable") {
    val pr = docs.select(Curation.hashPriority(col("doc_id"), "s").as("p"))
      .agg(min("p"), max("p"), avg("p")).head()
    assert(pr.getDouble(0) >= 0.0 && pr.getDouble(1) < 1.0)
    assert(math.abs(pr.getDouble(2) - 0.5) < 0.1, s"mean=${pr.getDouble(2)} not ~0.5")
  }

  test("semanticDedup: within-cell near-dups drop to the min-id survivor") {
    // 20 hand-built 4-dim vectors: ids 0..15 are the (distinct) centroid
    // rows; 16 duplicates 3 exactly, 17 is a near-copy of 5, 18 is the
    // NEGATION of 7 (cosine -1: same cell by distance, never a dup),
    // 19 is far from everything in its cell
    def unit(i: Int): Seq[Float] = {
      val v = Array.fill(4)(0.0f); v(i % 4) = 1.0f
      v(3 - i % 4) = 0.3f * (i / 4); v.toSeq
    }
    val rows = (0 until 16).map(i => (i.toLong, unit(i))) ++ Seq(
      (16L, unit(3)),
      (17L, unit(5).map(x => x * 1.01f)),
      (18L, unit(7).map(x => -x)),
      (19L, Seq(0.9f, -0.9f, 0.9f, -0.9f)))
    val df = rows.toDF("vec_id", "embedding")
    val out = Curation.semanticDedup(df, kCells = 16, threshold = 0.95)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) -1L else r.getLong(2), r.getBoolean(3))).toMap
    assert(out.size == 20)
    assert(out(16L) == ((3L, false)), "exact copy drops to its original")
    assert(out(17L) == ((5L, false)), "near-copy drops to its original")
    assert(out(18L)._2, "a negated vector shares the cell but is not a dup")
    assert(out(19L)._2)
    assert((0 until 16).forall(i => out(i.toLong)._2), "originals survive")
  }

  test("contaminationBloom: exact-verified output ≡ the broadcast-join operator") {
    val corpus = docs.filter(col("doc_id") % 89 =!= 0)
    val probes = docs.filter(col("doc_id") % 89 === 0)
    val bloom = Curation.contaminationBloom(corpus, probes, n = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val exact = Curation.contamination(corpus, probes, n = 3)
      .filter(col("is_contaminated")).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getString(5))).toMap
    assert(bloom == exact,
      "Bloom prefilter + exact verify must match the exact broadcast join")
    assert(bloom.nonEmpty, "fixture split produced no contamination to check")
  }

  test("contaminationBloom: empty probe set → empty result, not a crash") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val probes = corpus.filter(col("doc_id") < 0)
    assert(Curation.contaminationBloom(corpus, probes).collect().isEmpty)
  }

  test("mixtureWeights: weights sum to 1, τ up-samples the tail") {
    import spark.implicits._
    val d = (Seq.fill(90)("big") ++ Seq.fill(10)("small")).zipWithIndex
      .map { case (src, i) => (i.toLong, "w " * 10, src) }
      .toDF("doc_id", "text", "source")
    val out = Curation.mixtureWeights(d, "source", 0.5).collect()
      .map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-5, "Σ mix_weight = 1")
    // token shares 0.9/0.1; τ=0.5 → weights ∝ 3:1 → 0.75/0.25
    assert(math.abs(out("big")._2 - 0.75) < 1e-6)
    assert(math.abs(out("small")._2 - 0.25) < 1e-6)
    assert(out("small")._3 > 1.0, "tail domain is up-sampled")
    assert(out("big")._3 < 1.0, "head domain is down-sampled")
  }

  test("contaminationBloom: plan prunes with might_contain BEFORE the corpus exchange") {
    import org.apache.spark.sql.execution.FilterExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val exec = Curation.contaminationBloom(docs, docs.limit(5), 3)
      .queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.inputPlan // AQE wrapper is a leaf
        case p => p
      }
    val bloomFilters = exec.collect {
      case f: FilterExec if f.condition.toString.contains("might_contain") => f
    }
    assert(bloomFilters.nonEmpty,
      s"Bloom probe must appear as a Filter in the corpus-side plan:\n$exec")
    // the whole point is pruning before shuffle bytes are paid: no exchange
    // may sit UNDER the Bloom filter on the corpus stream
    assert(bloomFilters.forall(_.find(_.isInstanceOf[ShuffleExchangeLike]).isEmpty),
      s"might_contain must be scan-side (no Exchange beneath it):\n$exec")
  }

  test("mixtureWeights: τ=1 keeps natural proportions (multiplier 1)") {
    import spark.implicits._
    val d = Seq((1L, "a b c", "x"), (2L, "d e", "y")).toDF("doc_id", "text", "source")
    val out = Curation.mixtureWeights(d, "source", 1.0).collect()
      .map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(out.values.forall(m => math.abs(m - 1.0) < 1e-6))
  }
}
