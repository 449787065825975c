package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Cross-engine multibyte pin for mm_phash's sampling kernel: the oracle
  * corpus is pure ASCII, so Spark-vs-DuckDB agreement of
  * `ascii`/`substr`/`length` on non-BMP text was never exercised by the
  * driver gate. Both engines are codepoint-based (length counts
  * codepoints, substr indexes codepoints, ascii returns the full
  * codepoint — probed empirically: U+1F600 → 128512 in both), and this
  * spec pins that three ways on a fixture with 2-byte, 3-byte and
  * ASTRAL (4-byte / surrogate-pair) characters:
  *
  *  1. Spark `mmPhash` over the fixture parquet;
  *  2. the production mm_phash oracle SQL, executed in REAL DuckDB via
  *     the driver-side python (gated with `assume` — cancels, not
  *     fails, where python3+duckdb are absent);
  *  3. a codepoint-correct driver recompute (NOT `String.length` /
  *     `codePointAt(i)`, which count UTF-16 units and diverge on
  *     astral text — the exact trap this spec exists to catch).
  */
class MultibytePhashSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-multibyte-phash-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def duckdbAvailable: Boolean =
    scala.util.Try {
      new ProcessBuilder("python3", "-c", "import duckdb").start().waitFor() == 0
    }.getOrElse(false)

  // the fixture: every UTF-8 width class, short (stride=1) and long
  // (stride>1) payloads, and the empty payload (NULL phash)
  private val docs: Seq[(Long, String)] = Seq(
    0L -> "",
    1L -> "hello world, plain ascii only",
    2L -> ("héllo wörld çà ñöt äscii " * 8), // 2-byte chars, 200 cp
    3L -> ("日本語のテキスト処理" * 20), // 3-byte chars, 200 cp
    4L -> ("😀🎉🚀😺" * 40), // astral only, 160 cp
    5L -> ("a😀b日c" * 30), // mixed widths straddling sample positions
    6L -> "😀", // single astral char
    7L -> "日本語") // short CJK, stride=1

  // one shared fixture write + the codepoint-correct reference, used by
  // BOTH tests so the Spark leg never depends on the DuckDB gate
  private lazy val fixtureDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mb-phash").toString
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'xx' AS lang", "'fixture' AS source",
        "CAST(length(text) AS LONG) AS n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Codepoint-correct recompute of the sampling kernel — deliberately
    * NOT `String.length`/`codePointAt(i)`, which count UTF-16 units. */
  private def phashOf(text: String): Option[Long] = {
    val cps = text.codePoints().toArray
    if (cps.isEmpty) return None
    val stride = math.max(1, cps.length / 64)
    val samples = (0 until 64).map(k => cps(math.min(1 + k * stride, cps.length) - 1))
    val total = samples.map(_.toLong).sum
    Some((0 until 16).map { j =>
      val b = (0 until 4).map(i => samples(4 * j + i).toLong).sum
      if (b * 16 > total) 1L << j else 0L
    }.sum)
  }

  private lazy val ref: Seq[(Long, Long, Option[Long])] = docs.map { case (id, t) =>
    (id, t.getBytes("UTF-8").length.toLong, phashOf(t))
  }.sortBy(_._1)

  behavior of "mm_phash multibyte sampling"

  // UNGATED: a UTF-16-unit regression in the Spark kernel on astral text
  // must fail everywhere, including boxes without python3/duckdb
  it should "match a codepoint-correct recompute on non-BMP text in Spark" in {
    val got = operators.Multimodal.mmPhash(spark, fixtureDir).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_bytes"),
        Option(r.getAs[java.lang.Long]("phash")).map(_.toLong)))
      .sortBy(_._1)
    got shouldBe ref
    // the astral-only doc is genuinely non-BMP: its byte count is 4x its
    // codepoint count, so this fixture cannot silently degrade to ASCII
    ref.find(_._1 == 4L).get._2 shouldBe 4L * 160L
  }

  behavior of "ta_script on multibyte text"

  it should "match a codepoint-correct census recompute and classify scripts sensibly" in {
    val got = operators.TextAnalysis.taScript(spark, fixtureDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    got.size shouldBe docs.size
    val classes = Seq("latin", "digit", "space", "punct", "cjk", "cyrillic",
      "arabic", "bad", "other")
    docs.foreach { case (id, text) =>
      val cps = text.codePoints().toArray
      val byClass = cps.groupBy(functions.ScriptCensus.slotOf).view.mapValues(_.length.toLong)
      val r = got(id)
      withClue(s"doc $id: ") {
        r.getAs[Long]("n_cp") shouldBe cps.length.toLong
        classes.zipWithIndex.foreach { case (n, i) =>
          r.getAs[Long](s"n_$n") shouldBe byClass.getOrElse(i + 1, 0L)
        }
      }
    }
    // the classifications a corpus filter would act on
    got(0L).getAs[String]("dominant") shouldBe "none" // empty doc
    got(3L).getAs[String]("dominant") shouldBe "cjk"
    got(4L).getAs[String]("dominant") shouldBe "other" // astral emoji
    got(1L).getAs[String]("dominant") shouldBe "latin"
  }

  it should "cross-tab declared language against dominant script with exact mismatch semantics" in {
    import spark.implicits._
    // real multilingual text: matches, mislabels in both directions, a
    // digit-dominant doc (content-shape, NOT a routing mismatch), and an
    // unknown declared lang (no expectation -> never flagged)
    val dir = java.nio.file.Files.createTempDirectory("graft-langid-x").toString
    Seq(
      (0L, "hello world plain text", "en"),
      (1L, "今日は世界の漢字だらけ", "en"),   // cjk under en -> mismatch
      (2L, "привет мир снова", "ru"),          // cyrillic under ru -> ok
      (3L, "hello world", "zh"),               // latin under zh -> mismatch
      (4L, "12345 67890", "en"),               // digit-dominant -> no flag
      (5L, "hello there", "xx"),               // unknown lang -> no flag
      (6L, "مرحبا بالعالم", "ar"))             // arabic under ar -> ok
      .map { case (id, t, l) => (id, t, l, "fix", t.codePointCount(0, t.length).toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = operators.TextAnalysis.taScriptLangid(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("dominant")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("lang_docs"),
          r.getAs[Double]("share_of_lang"), r.getAs[Long]("mismatch")))).toMap
    got(("en", "latin")) shouldBe ((1L, 3L, 0.3333, 0L))
    got(("en", "cjk")) shouldBe ((1L, 3L, 0.3333, 1L))
    got(("en", "digit")) shouldBe ((1L, 3L, 0.3333, 0L))
    got(("ru", "cyrillic")) shouldBe ((1L, 1L, 1.0, 0L))
    got(("zh", "latin")) shouldBe ((1L, 1L, 1.0, 1L))
    got(("xx", "latin")) shouldBe ((1L, 1L, 1.0, 0L))
    got(("ar", "arabic")) shouldBe ((1L, 1L, 1.0, 0L))
    got.size shouldBe 7
  }

  it should "agree with real DuckDB running the production ta_script oracle on non-BMP text" in {
    assume(duckdbAvailable, "python3+duckdb not available (driver-side gate)")
    val sqlFile = java.nio.file.Files.createTempFile("tascript", ".sql")
    java.nio.file.Files.write(sqlFile,
      SparkEntry.oracleSql("ta_script").getBytes("UTF-8"))
    val py =
      s"""import duckdb, pathlib
         |con = duckdb.connect()
         |con.sql("CREATE VIEW documents AS SELECT * FROM read_parquet('$fixtureDir/documents.parquet/*.parquet')")
         |for r in con.sql(pathlib.Path('$sqlFile').read_text()).fetchall():
         |    print('|'.join(str(x) for x in r))
         |""".stripMargin
    val proc = new ProcessBuilder("python3", "-c", py).redirectErrorStream(true).start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream).mkString
    withClue(s"duckdb output:\n$out") { proc.waitFor() shouldBe 0 }
    val duck = out.linesIterator.filter(_.nonEmpty).map(_.split('|').toSeq).toSeq
    val spark_ = operators.TextAnalysis.taScript(spark, fixtureDir).collect()
      .map(r => r.toSeq.map(String.valueOf).toSeq).toSeq
    duck shouldBe spark_
  }

  it should "agree with real DuckDB running the production oracle SQL on non-BMP text" in {
    assume(duckdbAvailable, "python3+duckdb not available (driver-side gate)")
    val sqlFile = java.nio.file.Files.createTempFile("mmphash", ".sql")
    java.nio.file.Files.write(sqlFile,
      SparkEntry.oracleSql("mm_phash").getBytes("UTF-8"))
    val py =
      s"""import duckdb, pathlib
         |con = duckdb.connect()
         |con.sql("CREATE VIEW documents AS SELECT * FROM read_parquet('$fixtureDir/documents.parquet/*.parquet')")
         |for r in con.sql(pathlib.Path('$sqlFile').read_text()).fetchall():
         |    print(f"{r[0]}|{r[2]}|{'' if r[3] is None else r[3]}")
         |""".stripMargin
    val proc = new ProcessBuilder("python3", "-c", py).redirectErrorStream(true).start()
    val out = scala.io.Source.fromInputStream(proc.getInputStream).mkString
    withClue(s"duckdb output:\n$out") { proc.waitFor() shouldBe 0 }
    val duck = out.linesIterator.filter(_.nonEmpty).map { l =>
      val p = l.split('|')
      (p(0).toLong, p(1).toLong, if (p.length < 3 || p(2).isEmpty) None else Some(p(2).toLong))
    }.toSeq.sortBy(_._1)
    duck shouldBe ref
  }
}
