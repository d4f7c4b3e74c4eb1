package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** `df.write.format("hdf5table").mode("append")` — PyTables' `append=True`:
  * extend a CHUNKED compound table along the record dimension in place
  * (old chunk bytes untouched, edge chunk merged, new single-leaf chunk
  * B-tree, fixed-width metadata patches). */
class Hdf5AppendSpec extends SparkSpec {
  import spark.implicits._

  private def tmpFile(): String = {
    val f = java.io.File.createTempFile("graft_h5app", ".h5")
    f.delete()
    f.getAbsolutePath
  }

  private def docs(from: Int, until: Int) =
    (from until until).map(i => (i.toLong, s"doc_$i", i * 1.5))
      .toDF("id", "name", "score")

  private def msgs(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))

  test("append == one-shot write, edge chunk merged (rows not a chunk multiple)") {
    val one = tmpFile(); val two = tmpFile()
    docs(0, 11).write.format("hdf5table").option("var", "t")
      .option("chunkRows", "4").option("stringSizes", "name:8")
      .mode("overwrite").save(one)
    // 6 rows (chunk 4 → edge chunk holds 2), then 5 more (merge into it)
    // declared string size, like a PyTables itemsize — appends must fit it
    docs(0, 6).write.format("hdf5table").option("var", "t")
      .option("chunkRows", "4").option("stringSizes", "name:8")
      .mode("overwrite").save(two)
    docs(6, 11).write.format("hdf5table").option("var", "t")
      .mode("append").save(two)
    val a = spark.read.format("hdf5table").option("var", "t").load(one)
      .orderBy("id").collect()
    val b = spark.read.format("hdf5table").option("var", "t").load(two)
      .orderBy("id").collect()
    assert(b.length == 11)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "the appended table must equal the one-shot write record-for-record")
  }

  test("three appends chain; count stays metadata-answerable") {
    val p = tmpFile()
    docs(0, 3).write.format("hdf5table").option("var", "t")
      .option("chunkRows", "4").option("stringSizes", "name:8")
      .mode("overwrite").save(p)
    docs(3, 8).write.format("hdf5table").option("var", "t").mode("append").save(p)
    docs(8, 9).write.format("hdf5table").option("var", "t").mode("append").save(p)
    docs(9, 20).write.format("hdf5table").option("var", "t").mode("append").save(p)
    val df = spark.read.format("hdf5table").option("var", "t").load(p)
    assert(df.count() == 20)
    val plan = df.groupBy().count().queryExecution.executedPlan.toString
    assert(plan.contains("data reads=0"),
      s"count over the grown table must stay metadata-only: $plan")
    assert(df.orderBy("id").select("name").as[String].collect()
      .toSeq == (0 until 20).map(i => s"doc_$i"))
  }

  test("nested STRUCT members and column reorder survive the append") {
    val p = tmpFile()
    val mk = (from: Int, until: Int) => (from until until)
      .map(i => (s"k$i", (i.toDouble, i * 10.0))).toDF("key", "stats")
      .select(col("key"), struct(col("stats._1").as("a"),
        col("stats._2").as("b")).as("stats"))
    mk(0, 5).write.format("hdf5table").option("var", "t")
      .option("chunkRows", "3").mode("overwrite").save(p)
    // append with the FRAME's columns in the opposite order — members
    // match by name
    mk(5, 9).select(col("stats"), col("key"))
      .write.format("hdf5table").option("var", "t").mode("append").save(p)
    val back = spark.read.format("hdf5table").option("var", "t").load(p)
      .select(col("key"), col("stats.a").as("a"), col("stats.b").as("b"))
      .orderBy("a").collect()
    assert(back.length == 9)
    back.zipWithIndex.foreach { case (r, i) =>
      assert(r.getString(0) == s"k$i" && r.getDouble(1) == i.toDouble &&
        r.getDouble(2) == i * 10.0)
    }
  }

  test("INNER struct fields reordered in the frame still land by NAME") {
    val p = tmpFile()
    val mk = (from: Int, until: Int) => (from until until)
      .map(i => (i.toLong, (i * 1.0, i * 100.0))).toDF("id", "s")
      .select(col("id"), struct(col("s._1").as("a"), col("s._2").as("b")).as("s"))
    mk(0, 4).write.format("hdf5table").option("var", "t")
      .option("chunkRows", "4").mode("overwrite").save(p)
    // same member NAMES, opposite INNER order — a positional encoder would
    // silently swap a and b (both f64, no type error to catch it)
    (4 until 7).map(i => (i.toLong, (i * 100.0, i * 1.0))).toDF("id", "s")
      .select(col("id"), struct(col("s._1").as("b"), col("s._2").as("a")).as("s"))
      .write.format("hdf5table").option("var", "t").mode("append").save(p)
    val back = spark.read.format("hdf5table").option("var", "t").load(p)
      .select(col("id"), col("s.a").as("a"), col("s.b").as("b"))
      .orderBy("id").collect()
    assert(back.length == 7)
    back.foreach { r =>
      val i = r.getDouble(0) // i64 members surface as DOUBLE columns
      assert(r.getDouble(1) == i * 1.0 && r.getDouble(2) == i * 100.0,
        s"record $i: a=${r.getDouble(1)} b=${r.getDouble(2)} — inner fields swapped?")
    }
  }

  test("creation-time layout options on an append fail by name") {
    val p = tmpFile()
    docs(0, 4).write.format("hdf5table").option("var", "t")
      .option("chunkRows", "4").option("stringSizes", "name:8")
      .mode("overwrite").save(p)
    val e = intercept[Exception] {
      docs(4, 6).write.format("hdf5table").option("var", "t")
        .option("stringSizes", "name:64")
        .mode("append").save(p)
    }
    assert(msgs(e).exists(_.contains("CREATION")), s"got: ${msgs(e)}")
  }

  test("a string longer than the stored fixed size fails by name") {
    val p = tmpFile()
    docs(0, 4).write.format("hdf5table").option("var", "t")
      .option("chunkRows", "4").mode("overwrite").save(p)
    val e = intercept[Exception] {
      Seq((99L, "a_name_far_longer_than_doc_N", 1.0))
        .toDF("id", "name", "score")
        .write.format("hdf5table").option("var", "t").mode("append").save(p)
    }
    assert(msgs(e).exists(_.contains("fixed size")), s"got: ${msgs(e)}")
  }

  test("appending onto a CONTIGUOUS table fails by name (not silently rewrites)") {
    val p = tmpFile()
    docs(0, 4).write.format("hdf5table").option("var", "t")
      .mode("overwrite").save(p) // no chunkRows → contiguous
    val e = intercept[Exception] {
      docs(4, 6).write.format("hdf5table").option("var", "t")
        .mode("append").save(p)
    }
    assert(msgs(e).exists(m => m.contains("CHUNKED") || m.contains("chunkRows")),
      s"got: ${msgs(e)}")
  }

  test("old chunk bytes are byte-identical after an aligned append") {
    val p = tmpFile()
    docs(0, 8).write.format("hdf5table").option("var", "t")
      .option("chunkRows", "4").option("stringSizes", "name:8")
      .mode("overwrite").save(p)
    val before = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    docs(8, 12).write.format("hdf5table").option("var", "t")
      .mode("append").save(p)
    val after = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    assert(after.length > before.length)
    // the only in-place differences in the old image are the three
    // fixed-width patches (dims, B-tree address, superblock EOF)
    val diffs = (0 until before.length).filter(i => before(i) != after(i))
    assert(diffs.nonEmpty && diffs.size <= 24,
      s"expected <=24 patched bytes in the old image, found ${diffs.size}")
  }

  test("a non-v0 superblock fails the append by name BEFORE any patch") {
    // the EOF patch lands at byte 40, an offset only a v0 superblock keeps
    // the EOF at — a v1/v2 image would be silently corrupted there
    val p = tmpFile()
    docs(0, 4).write.format("hdf5table").option("var", "t")
      .option("chunkRows", "4").option("stringSizes", "name:8")
      .mode("overwrite").save(p)
    val img = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    img(8) = 2 // forge the superblock version byte
    val e = intercept[Exception] {
      Hdf5.appendCompoundTable(img, "t", Seq(Seq(9L, "doc_9", 1.0)))
    }
    assert(msgs(e).exists(_.contains("superblock")), s"got: ${msgs(e)}")
  }

  test("an append growing past 64 chunks regrows a TWO-LEVEL v1 B-tree (round 11)") {
    // the single-leaf 64-entry refusal was lifted: past libhdf5's 2*K
    // per-node bound the regrown tree gains a level-1 root over ≤64-entry
    // leaves — the layout libhdf5 itself grows into
    val p = tmpFile()
    docs(0, 60).write.format("hdf5table").option("var", "t")
      .option("chunkRows", "1").option("stringSizes", "name:8")
      .mode("overwrite").save(p)
    docs(60, 70).write.format("hdf5table").option("var", "t")
      .mode("append").save(p)
    val got = spark.read.format("hdf5table").option("var", "t").load(p)
    assert(got.count() == 70)
    assert(got.select(col("id").cast("long")).orderBy("id")
      .collect().map(_.getLong(0)).toSeq == (0L until 70L))
    // the PER-NODE bound survives at the new limit: 4096+ chunks stay a
    // named error
    val e = intercept[Exception] {
      (70 until 4100).grouped(500).foldLeft(()) { (_, batch) =>
        docs(batch.head, batch.last + 1).write.format("hdf5table")
          .option("var", "t").mode("append").save(p)
      }
    }
    assert(msgs(e).exists(m => m.contains("4096") && m.contains("chunkRows")),
      s"got: ${msgs(e)}")
  }
}
