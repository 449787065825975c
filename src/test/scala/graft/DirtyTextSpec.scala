package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Dirty-text robustness: scraped corpora carry emoji, CJK, RTL scripts,
  * zero-width joiners, empty and whitespace-only strings, and the
  * occasional book-sized document. The text operators must neither crash
  * nor go quadratic on any of these. Two fixtures: a unicode zoo (every
  * text/dedup/pipeline operator) and a large-doc corpus (token-linear
  * operators only — pairwise DP verify is excluded BY DESIGN: its cost
  * contract is LSH-bounded candidates × len², which a colliding pair of
  * book-length docs legitimately breaks; production gates length-cap
  * before edit verify).
  */
class DirtyTextSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-dirty-text-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def writeDocs(rowsIn: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dirty").toString
    // n_chars is DERIVED from the text, never trusted from the caller —
    // hand-counted literals drifted from the actual code-point counts on
    // the unicode rows, gating operators against inconsistent metadata
    val rows = rowsIn.map { case (id, text, lang, src, _) =>
      (id, text, lang, src, text.codePointCount(0, text.length).toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // the other tables ride along untouched (some operators join them)
    Tables.names.filter(_ != "documents").foreach { t =>
      spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def textOps: Seq[(String, (SparkSession, String) => DataFrame)] =
    SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      n.startsWith("ta_") || n.startsWith("dd_") || n.startsWith("pipe_") ||
        n.startsWith("mm_") || n.startsWith("ir_")
    }

  behavior of "text-family operators"

  it should "survive a unicode zoo with empty and whitespace-only docs" in {
    val zoo = Seq[(Long, String, String, String, Long)](
      (0L, "hello world plain ascii text goes here", "en", "web", 38L),
      (1L, "café naïve résumé über straße", "de", "web", 30L),
      (2L, "今日は世界 中文文本 漢字だらけ", "zh", "web", 14L),
      (3L, "مرحبا بالعالم rtl text", "ar", "web", 20L),
      (4L, "emoji 😀🎉 zero​width and 👍 mixed", "en", "social", 30L),
      (5L, "", "en", "web", 0L), // empty string (distinct from null)
      (6L, "   \t  \n  ", "en", "web", 9L), // whitespace only → zero tokens
      (7L, "ééé ééé ééé", "fr", "web", 11L), // repeated non-ascii tokens
      (8L, "hello world plain ascii text goes here", "en", "mirror", 38L), // exact dup of 0
      (9L, "a b c d e f g h i j k l m n o p q r s t", "en", "web", 39L))
    val dir = writeDocs(zoo)
    val failures = TestSweep.collectFailures(textOps) { case (name, fn) =>
      try { fn(spark, dir).collect(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
      }
    }
    withClue(s"operators crashing on unicode/degenerate text:\n${failures.mkString("\n")}\n") {
      failures shouldBe empty
    }
    // and the exact-dedup semantics hold across the zoo: doc 8 duplicates doc 0
    val groups = operators.Dedup.ddExact(spark, dir).collect()
    groups.map(_.getAs[Long]("n_copies")).max should be >= 2L
  }

  it should "stay token-linear on book-sized documents" in {
    // ~60k tokens/doc; token-linear ops must finish comfortably. The DP
    // verify op (dd_edit_pairs) is excluded by its documented cost
    // contract; everything else in the text family must scale per-record.
    val big = (0 until 4).map { i =>
      val words = (0 until 60000).map(j => s"w${(j * 7919 + i * 104729) % 50000}")
      (i.toLong, words.mkString(" "), "en", "books", words.mkString(" ").length.toLong)
    }
    val dir = writeDocs(big)
    val linear = textOps.filterNot(_._1 == "dd_edit_pairs")
    val failures = linear.flatMap { case (name, fn) =>
      try { fn(spark, dir).collect(); None }
      catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
      }
    }
    withClue(s"operators failing on book-sized docs:\n${failures.mkString("\n")}\n") {
      failures shouldBe empty
    }
  }

  it should "census a book-sized multibyte doc in one byte pass (decoder parity at scale)" in {
    import spark.implicits._
    // ~300k codepoints hitting every census class (latin/digit/space/
    // punct/cjk/cyrillic/arabic/bad/other, ASCII through astral) — the
    // UTF8String byte-walk decoder must agree with String.codePoints
    // exactly, including the U+FDD0 noncharacter and control markers in
    // the bad class. Parity via slotOf on both sides isolates the DECODE
    // step, which is what the byte-walk rewrite changed.
    graft.plans.GraftFunctions.register(spark)
    val unit = "The quick brown fox 123, café über: " +
      "今日は世界 привет " +
      "مرحبا 😀🎉 �﷐\n"
    val text = unit * 4000
    val cps = text.codePoints().toArray
    val expected = (0 until 10).map { slot =>
      if (slot == 0) cps.length.toLong
      else cps.count(graft.functions.ScriptCensus.slotOf(_) == slot).toLong
    }
    // round-trip through parquet so the kernel runs over a scan-backed
    // UTF8String (not a LocalRelation constant-fold)
    val dir = java.nio.file.Files.createTempDirectory("graft-census-big").toString
    Seq((1L, text)).toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val got = spark.read.parquet(dir)
      .selectExpr("graft_script_census(text) AS cen")
      .collect()(0).getSeq[Long](0)
    got shouldBe expected
  }
}
