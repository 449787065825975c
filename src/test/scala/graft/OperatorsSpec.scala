package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Batch-operator smoke/determinism spec at sf0.001. Full value-level
  * correctness is enforced by the DuckDB oracle gate (tools/check.py /
  * the driver's t2); these tests pin structural invariants and catch
  * regressions without the oracle in the loop.
  */
class OperatorsSpec extends AnyFlatSpec with Matchers with BeforeAndAfterAll {

  val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-operators-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  behavior of "SparkEntry"

  it should "expose an oracle for every query except rows-only ops" in {
    val rowsOnly = Set("mm_decode_stub", "sl_rowbinary", "q_approx_distinct", "dd_bloom",
      "q_approx_quantiles", "dd_neardup", "q_profile_approx", "mm_cdc_chunk",
      "ta_bpe_train", "ta_bpe_apply")
    (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet) shouldBe rowsOnly
    SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet) shouldBe true
  }

  it should "run the flagship entry with rows" in {
    SparkEntry.entry(spark).count() should be > 0L
  }

  it should "run every registered query non-empty and deterministically" in {
    val failures = TestSweep.collectFailures(
        SparkEntry.queries.toSeq.sortBy(_._1)) { case (name, fn) =>
      try {
        val first = fn(spark, sf)
        val n = first.count()
        // determinism: same plan re-run hashes identically
        val a = first.collect().map(_.toString).mkString("\n")
        val b = fn(spark, sf).collect().map(_.toString).mkString("\n")
        if (n == 0L) Some(s"$name: EMPTY result")
        else if (a != b) Some(s"$name: NONDETERMINISTIC re-run")
        else None
      } catch { case e: Throwable =>
        Some(s"$name: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
      }
    }
    withClue(s"queries failing the non-empty/determinism sweep:\n${failures.mkString("\n")}\n") {
      failures shouldBe empty
    }
  }

  behavior of "operator invariants"

  it should "keep the multimodal format SQL fragments in sync with FormatSql" in {
    operators.Multimodal.formatSqlConsistent shouldBe true
  }

  it should "profile within HLL bounds and WITHOUT an Expand in the approx variant" in {
    import org.apache.spark.sql.functions.col
    def byCol(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))))
      .toMap
    val exact = byCol(operators.StatsOps.qProfile(spark, sf))
    val approxDf = operators.StatsOps.qProfileApprox(spark, sf)
    val approx = byCol(approxDf)
    approx.keySet shouldBe exact.keySet
    exact.foreach { case (c, (nRows, nd, mn, mx)) =>
      val (aRows, and, amn, amx) = approx(c)
      withClue(s"column $c: ") {
        aRows shouldBe nRows // plain aggregates are exact in both
        amn shouldBe mn
        amx shouldBe mx
        // HLL++ at rsd 1%: allow ±5% (generous vs the configured bound)
        math.abs(and - nd).toDouble / nd should be <= 0.05
      }
    }
    // the reason the variant exists: exact multi-column countDistinct
    // plans an Expand (input ×6); the HLL swap must NOT
    approxDf.queryExecution.executedPlan.toString should not include "Expand"
    operators.StatsOps.qProfile(spark, sf)
      .queryExecution.executedPlan.toString should include("Expand")
  }

  it should "produce 8 minhash columns" in {
    operators.Dedup.ddMinhash(spark, sf).columns.toSeq shouldBe
      ("doc_id" +: (0 until 8).map(j => s"m$j"))
  }

  it should "widen minhash signatures prefix-consistently and monotonically in the width card" in {
    import org.apache.spark.sql.functions._
    graft.plans.GraftFunctions.register(spark)
    // prefix chain: salt g's digest never depends on the salt count, so
    // the 2-salt signature IS the first 8 slots of the 8-salt one, and
    // graft_minhash_tokens_w(tk, 2) is bit-equal to graft_minhash_tokens
    val tk = graft.functions.TextFns.tokens(col("text"))
    val sigs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        call_function("graft_minhash_tokens", tk).as("s8"),
        call_function("graft_minhash_tokens_w", tk, lit(2)).as("w8"),
        call_function("graft_minhash_tokens_w", tk, lit(8)).as("w32"))
      .collect()
    sigs.length should be > 0
    sigs.foreach { r =>
      val s8 = r.getSeq[String](1); val w8 = r.getSeq[String](2)
      val w32 = r.getSeq[String](3)
      withClue(s"doc ${r.getLong(0)}: ") {
        w8 shouldBe s8
        w32.length shouldBe 32
        w32.take(8) shouldBe s8
      }
    }
    // driver recompute of one non-trivial 32-perm signature (independent
    // of both engines): same salted-md5 slice-min loop in plain Scala
    val doc = Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.length(col("text")) > 50)
      .select("doc_id", "text").head()
    val toks = doc.getString(1).split("\\s+").filter(_.nonEmpty)
    val shingles = toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
    val expected = (0 until 32).map { j =>
      shingles.map { s =>
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s"${j / 4}|$s")
          .substring(8 * (j % 4), 8 * (j % 4) + 8)
      }.min
    }
    val got = sigs.find(_.getLong(0) == doc.getLong(0)).get.getSeq[String](3)
    got shouldBe expected
    // card invariants: same truth set in every row; catch rate
    // non-decreasing in width at fixed rows-per-band (wider bands are a
    // slot-prefix SUPERSET); r=2 catches at least what r=4 does at the
    // same width (a 4-slot band match implies both 2-slot halves match)
    val card = operators.Dedup.ddSigWidth(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(2)),
        (r.getLong(3), r.getDouble(5), r.getDouble(6)))).toMap
    card.size shouldBe 6
    card.values.map(_._1).toSet.size shouldBe 1 // one truth set
    for (r <- Seq(2L, 4L)) {
      card((8L, r))._2 should be <= card((16L, r))._2
      card((16L, r))._2 should be <= card((32L, r))._2
    }
    for (p <- Seq(8L, 16L, 32L)) {
      card((p, 4L))._2 should be <= card((p, 2L))._2
      card((p, 4L))._3 should be < card((p, 2L))._3 // theory agrees on direction
    }
  }

  it should "keep ann ranks within k and unique per query" in {
    import org.apache.spark.sql.functions._
    val df = operators.Similarity.annBruteforce(spark, sf)
    df.agg(max("rnk")).collect()(0).getLong(0) should be <= 10L
    val dup = df.groupBy("query_id", "rnk").count().filter(col("count") > 1).count()
    dup shouldBe 0L
  }

  it should "return exactly the above-threshold bruteforce pairs from radius search" in {
    import org.apache.spark.sql.functions._
    // radius(τ) must agree with the exact scorer: every returned pair is
    // ≥ τ, and every bruteforce TOP-ranked pair at ≥ τ appears (top-k can
    // truncate dense neighborhoods, so only containment one way: any
    // top-10 hit above τ must be in the radius set)
    val radius = operators.Similarity.annRadius(spark, sf)
    radius.filter(col("cos") < 0.3).count() shouldBe 0L
    val radiusPairs = radius.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val topAbove = operators.Similarity.annBruteforce(spark, sf)
      .filter(col("cos") >= 0.3).select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    topAbove.foreach(p => radiusPairs should contain(p))
  }

  it should "keep pagerank mass bounded with teleport-only dangling nodes" in {
    import org.apache.spark.sql.functions._
    val n = Tables.embeddings(spark, sf).count()
    val base = operators.Clustering.PrScale / n
    val tele = 15L * base / 100L
    val top = operators.Clustering.clPagerank(spark, sf).collect()
    top.length shouldBe 20
    // every rank carries at least the teleport mass and never exceeds the
    // total fixed-point mass; floor division only ever LOSES mass
    top.foreach { r =>
      r.getAs[Long]("rank_fp") should be >= tele
      r.getAs[Long]("rank_fp") should be < operators.Clustering.PrScale
    }
    // a dangling node's rank is EXACTLY the teleport term — no inflow
    top.filter(_.getAs[Long]("n_neighbors") == 0L)
      .foreach(_.getAs[Long]("rank_fp") shouldBe tele)
    // the list is rank-descending with id tiebreak
    val keys = top.map(r => (-r.getAs[Long]("rank_fp"), r.getAs[Long]("vec_id"))).toSeq
    keys shouldBe keys.sorted
  }

  it should "match a driver-side DBSCAN reclassification exactly" in {
    import org.apache.spark.sql.functions._
    // independent third implementation (union-find) of the same graph:
    // the oracle checks the recursive-CTE closure, hash-min is the
    // engine — this pins both against a direct reading of the semantics
    graft.plans.GraftFunctions.register(spark)
    val pairs = operators.Dedup.ddEmbedCosFor(
        Tables.embeddings(spark, sf).filter(col("embedding").isNotNull)
          .select(col("vec_id"), col("embedding").as("e")), Seq(1, 2, 3, 4), 0.25)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val nbrs = scala.collection.mutable.Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)
    pairs.foreach { case (a, b) => nbrs(a) += b; nbrs(b) += a }
    val core = nbrs.collect {
      case (n, s) if s.size >= operators.Clustering.DbscanMinPts => n }.toSet
    val parent = scala.collection.mutable.Map(core.toSeq.map(n => n -> n): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    pairs.foreach { case (a, b) =>
      if (core(a) && core(b)) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // root = min id
      }
    }
    val coreCluster = core.map(n => n -> find(n)).toMap
    val borderCluster = nbrs.collect {
      case (n, s) if !core(n) && s.exists(core) =>
        n -> s.filter(core).map(coreCluster).min
    }.toMap
    val nVecs = Tables.embeddings(spark, sf)
      .filter(col("embedding").isNotNull).count()
    val expected = (coreCluster.groupBy(_._2).map { case (c, m) =>
        c -> (m.size.toLong, borderCluster.count(_._2 == c).toLong)
      } + (-1L -> (0L, 0L))).map { case (c, (nc, nb)) =>
        if (c == -1L) (c, 0L, 0L, nVecs - coreCluster.size - borderCluster.size)
        else (c, nc, nb, nc + nb)
      }.toSeq.sortBy(_._1)
    val got = operators.Clustering.clDbscan(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    got shouldBe expected
    // census ties out: every vector is core, border, or noise exactly once
    got.map(_._4).sum shouldBe nVecs
  }

  it should "recompute the perceptual hash exactly on the driver" in {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def phashOf(text: String): Option[Long] = {
      if (text.isEmpty) return None
      val stride = math.max(1, text.length / 64)
      val samples = (0 until 64).map { k =>
        val pos = math.min(1 + k * stride, text.length)
        text.codePointAt(pos - 1)
      }
      val total = samples.sum
      Some((0 until 16).map { j =>
        val b = (0 until 4).map(i => samples(4 * j + i)).sum
        if (b * 16 > total) 1L << j else 0L
      }.sum)
    }
    val got = operators.Multimodal.mmPhash(spark, sf).collect()
    got.length shouldBe docs.size
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      withClue(s"doc $id: ") {
        Option(r.getAs[java.lang.Long]("phash")).map(_.toLong) shouldBe phashOf(docs(id))
      }
    }
    // 16-bit range and byte-identical payloads hash identically
    got.flatMap(r => Option(r.getAs[java.lang.Long]("phash"))).foreach { h =>
      h.toLong should be >= 0L
      h.toLong should be <= 65535L
    }
  }

  it should "find every Hamming<=2 phash pair (banding recall is complete)" in {
    val hashes = operators.Multimodal.mmPhash(spark, sf).collect()
      .flatMap(r => Option(r.getAs[java.lang.Long]("phash"))
        .map(h => r.getAs[Long]("doc_id") -> h.toLong))
    val expected = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 2
    } yield (a, b, d.toLong)).sorted.toSeq
    val got = operators.Multimodal.mmPhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe expected
  }

  it should "produce monotone below-diagonal Lorenz curves that close at 1" in {
    import org.apache.spark.sql.functions._
    val rows = operators.EventValue.evLorenz(spark, sf).collect()
      .groupBy(_.getAs[String]("event_type"))
    rows.nonEmpty shouldBe true
    val nUsers = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id")).distinct().count()
    rows.values.map(_.map(_.getAs[Long]("n_users")).sum).sum shouldBe nUsers
    rows.foreach { case (t, rs) =>
      withClue(s"type $t: ") {
        val byDec = rs.sortBy(_.getAs[Long]("decile"))
        val shares = byDec.map(_.getAs[Double]("cum_value_share"))
        shares.last shouldBe 1.0 +- 1e-6 // the curve closes
        shares.zip(shares.tail).foreach { case (a, b) => b should be >= a }
        // majorization: the mean of the k smallest values ≤ the overall
        // mean, so cum VALUE share ≤ cum POPULATION share — the exact
        // below-diagonal Lorenz property. Population through decile d is
        // floor((d·n−1)/10)+1 (the boundary rounds up by ≤ 1 user).
        val nT = byDec.map(_.getAs[Long]("n_users")).sum
        byDec.foreach { r =>
          val d = r.getAs[Long]("decile")
          val popBound = ((d * nT - 1) / 10 + 1).toDouble / nT
          r.getAs[Double]("cum_value_share") should be <= (popBound + 1e-6)
        }
      }
    }
  }

  it should "keep stationary mass bounded with teleport-floor states" in {
    val rows = operators.EventAnalytics.evMarkovStationary(spark, sf).collect()
    rows.length should be > 0
    val n = rows.length
    val base = operators.Clustering.PrScale / n
    val tele = 15L * base / 100L
    // every state keeps at least the teleport mass; floor division only
    // LOSES mass, so the total never exceeds the fixed-point scale
    rows.foreach(_.getAs[Long]("pi_fp") should be >= tele)
    val total = rows.map(_.getAs[Long]("pi_fp")).sum
    total should be <= operators.Clustering.PrScale
    total should be >= (operators.Clustering.PrScale * 95L) / 100L
    // a state nobody transitions INTO sits exactly at the teleport floor
    val intoStates = operators.EventAnalytics.evMarkov(spark, sf).collect()
      .map(_.getAs[String]("to_type")).toSet
    rows.filterNot(r => intoStates(r.getAs[String]("state")))
      .foreach(_.getAs[Long]("pi_fp") shouldBe tele)
  }

  it should "learn the same BPE merge table as a driver-side trainer" in {
    import org.apache.spark.sql.functions._
    // independent reference trainer on the collected word histogram
    val hist = scala.collection.mutable.Map.empty[Vector[String], Long]
      .withDefaultValue(0L)
    Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFns.tokens(col("text"))).as("w"))
      .collect().map(_.getString(0))
      .groupBy(identity).foreach { case (w, ws) =>
        hist(w.split("").toVector) += ws.length.toLong }
    val expected = Seq.newBuilder[(Long, String, String, String, Long)]
    for (k <- 0 until operators.TextAnalysis.BpeMerges) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      hist.foreach { case (syms, wc) =>
        syms.sliding(2).filter(_.size == 2)
          .foreach(p => pairs((p(0), p(1))) += wc) }
      if (pairs.nonEmpty) {
        val ((l, r), c) = pairs.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        expected += ((k.toLong, l, r, l + r, c))
        // greedy leftmost-non-overlapping fuse, same fold as the engine
        val fused = hist.toSeq.map { case (syms, wc) =>
          syms.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == l && x == r)
              acc.init :+ (l + r)
            else acc :+ x
          } -> wc
        }
        hist.clear()
        fused.foreach { case (syms, wc) => hist(syms) += wc }
      }
    }
    val got = operators.TextAnalysis.taBpeTrain(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    got shouldBe expected.result()
  }

  it should "re-encode every document identically under the learned merges" in {
    import org.apache.spark.sql.functions._
    val merges = operators.TextAnalysis.trainedBpeMerges(spark, sf)
      .map(m => (m._2, m._3))
    def encode(w: String): Vector[String] =
      merges.foldLeft(w.split("").toVector) { case (syms, (l, r)) =>
        syms.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
          else acc :+ x
        }
      }
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = operators.TextAnalysis.taBpeApply(spark, sf).collect()
    got.length shouldBe docs.size
    got.foreach { r =>
      val words = docs(r.getAs[Long]("doc_id")).split("\\s+").filter(_.nonEmpty)
      withClue(s"doc ${r.getAs[Long]("doc_id")}: ") {
        r.getAs[Long]("n_pieces") shouldBe words.map(encode(_).size.toLong).sum
        // every fuse consumes exactly one symbol
        r.getAs[Long]("n_pieces") + r.getAs[Long]("n_merges") shouldBe
          r.getAs[Long]("n_word_chars")
      }
    }
  }

  it should "flag a constructed A/B effect and guard degenerate pools" in {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // recover the operator's own hash arms, then construct an effect:
    // every user emits "base"; only arm-0 users emit "conv"
    val arms = spark.range(1, 201).toDF("user_id")
      .select(col("user_id"),
        graft.functions.TextFns.hashBucket("ab|", col("user_id"), 4, 2).as("arm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val t0 = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    val rows = arms.toSeq.flatMap { case (u, a) =>
      val base = Seq((u * 10, t0, u, "base", 1.0, "{}"))
      if (a == 0L) base :+ ((u * 10 + 1, t0, u, "conv", 1.0, "{}")) else base
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-ab").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = operators.EventValue.evAbtest(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    // conv reaches 100% of arm A and 0% of arm B — maximally significant
    out("conv").getAs[Boolean]("significant") shouldBe true
    out("conv").getAs[Double]("share_a") shouldBe 1.0
    out("conv").getAs[Double]("share_b") shouldBe 0.0
    // base reaches everyone: pooled p = 1 → z undefined, guarded to null
    out("base").isNullAt(out("base").fieldIndex("z_score")) shouldBe true
    out("base").getAs[Boolean]("significant") shouldBe false
  }

  it should "reproduce the farthest-first traversal on the driver" in {
    val vecs = Tables.embeddings(spark, sf)
      .filter(org.apache.spark.sql.functions.col("embedding").isNotNull)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toIndexedSeq)
      .sortBy(_._1)
    def d2(a: IndexedSeq[Double], b: IndexedSeq[Double]): Double =
      (0 until 64).foldLeft(0.0)((acc, i) => acc + (a(i) - b(i)) * (a(i) - b(i)))
    var centers = Vector(vecs.head)
    while (centers.size < operators.Clustering.KCenters) {
      val rest = vecs.filterNot(v => centers.exists(_._1 == v._1))
      // argmax of min-distance, ties to the lowest vec_id (sort is stable
      // and vecs is id-ascending, so maxBy's first-wins tie rule matches)
      centers :+= rest.maxBy(v => centers.map(c => d2(v._2, c._2)).min)
    }
    val got = operators.Clustering.clKcenter(spark, sf).collect()
    got.map(_.getAs[Long]("center_id")).toSeq shouldBe centers.map(_._1).toSeq
    // every vector is assigned exactly once and radii are non-negative
    got.map(_.getAs[Long]("n_assigned")).sum shouldBe vecs.length
    got.foreach(_.getAs[Double]("radius") should be >= 0.0)
  }

  it should "match a brute-force skyline on ties and duplicates" in {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // small domains force equal-price groups, equal-size chains and
    // exact duplicate points — every tie branch of the dominance test
    val pts = (0L until 300L).map(i =>
      (i, rnd.nextInt(12).toLong, (900 + rnd.nextInt(15)).toDouble))
    val expected = pts.filter { case (_, sz, pr) =>
      !pts.exists { case (_, s2, p2) =>
        s2 <= sz && p2 <= pr && (s2 < sz || p2 < pr) }
    }.map { case (k, s, p) => (p, s, k) }.sorted.map { case (p, s, k) => (k, s, p) }
    val got = operators.RelationalExt.qSkylineFor(
        pts.toDF("part_key", "size", "price"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    got shouldBe expected
  }

  it should "split a narrow fractional price domain into multiple skyline chunks" in {
    import spark.implicits._
    // every price inside ONE integer unit: the old fixed-64-unit
    // idChunks quantization collapsed this to a single chunk (single
    // carry task at scale); the data-derived rangeChunks must both
    // split it AND stay exact against brute force
    val rnd = new scala.util.Random(11)
    val pts = (0L until 5000L).map(i =>
      (i, rnd.nextInt(40).toLong, 900.0 + i * (0.9999 / 5000.0)))
    val df = pts.toDF("part_key", "size", "price")
    val (chunkCol, nChunks) = operators.RelationalExt.skylineChunks(df)
    nChunks should be > 1L
    // the chunk column actually spreads the domain (not all one value)
    val distinctChunks = df.select(chunkCol.as("c")).distinct().count()
    distinctChunks should be > 1L
    distinctChunks should be <= nChunks
    val expected = pts.filter { case (_, sz, pr) =>
      !pts.exists { case (_, s2, p2) =>
        s2 <= sz && p2 <= pr && (s2 < sz || p2 < pr) }
    }.map { case (k, s, p) => (p, s, k) }.sorted.map { case (p, s, k) => (k, s, p) }
    val got = operators.RelationalExt.qSkylineFor(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    got shouldBe expected
  }

  it should "merge one-sided groups in the incremental aggregate" in {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a type living ONLY in the delta (every id % 10 == 0) and one ONLY
    // in the snapshot — the full-outer null-side path the corpus never
    // exercises (all its types appear on both sides of the split)
    val dir = java.nio.file.Files.createTempDirectory("graft-incr").toString
    Seq(
      (10L, java.sql.Timestamp.valueOf("2025-01-01 00:00:00"), 1L, "deltaonly", 1.25, "{}"),
      (20L, java.sql.Timestamp.valueOf("2025-01-02 00:00:00"), 1L, "deltaonly", 2.50, "{}"),
      (3L, java.sql.Timestamp.valueOf("2025-01-03 00:00:00"), 2L, "snaponly", 4.00, "{}"),
      (4L, java.sql.Timestamp.valueOf("2025-01-04 00:00:00"), 2L, "both", 1.00, "{}"),
      (30L, java.sql.Timestamp.valueOf("2025-01-05 00:00:00"), 2L, "both", 3.00, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = operators.StreamSemantics.slIncrAgg(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    got shouldBe Array(
      ("both", 2L, 4.0, 2.0),
      ("deltaonly", 2L, 3.75, 1.875),
      ("snaponly", 1L, 4.0, 4.0))
  }

  it should "account every document once in the length-bucket card" in {
    import org.apache.spark.sql.functions._
    val rows = operators.Pipeline.pipeLenBuckets(spark, sf).collect()
    rows.map(_.getAs[Long]("n_docs")).sum shouldBe Tables.documents(spark, sf).count()
    rows.foreach { r =>
      val (b, nd, st, pad) = (r.getAs[Long]("bucket"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("sum_tokens"), r.getAs[Long]("pad_tokens"))
      // padding identity: pad = capacity − clamped token mass, and the
      // clamp only bites on oversize docs
      pad should be >= 0L
      pad should be <= nd * b
      if (r.getAs[Long]("n_oversize") == 0L) pad shouldBe nd * b - st
      val ws = r.getAs[Double]("waste_share")
      ws should be >= 0.0
      ws should be <= 1.0
    }
    val buckets = rows.map(_.getAs[Long]("bucket"))
    buckets.foreach(b => (b & (b - 1)) shouldBe 0L) // powers of two
  }

  it should "throttle nothing below the cap and account every event" in {
    import org.apache.spark.sql.functions._
    val rep = operators.EventAnalytics.evThrottle(spark, sf).collect()
    rep.map(_.getAs[Long]("n_events")).sum shouldBe Tables.events(spark, sf).count()
    rep.foreach { r =>
      r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") shouldBe r.getAs[Long]("n_events")
    }
    // cross-check against a direct per-(user, hour) census: total kept ==
    // Σ min(burst, cap) — the throttle's defining identity
    val cap = operators.EventAnalytics.ThrottleCap
    val expectKept = Tables.events(spark, sf)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")))
      .agg(count(lit(1)).as("c"))
      .select(least(col("c"), lit(cap.toLong)).as("k"))
      .agg(sum("k")).collect()(0).getLong(0)
    rep.map(_.getAs[Long]("n_kept")).sum shouldBe expectKept
  }

  it should "keep approx quantiles within 1% of the exact percentiles" in {
    import org.apache.spark.sql.functions._
    val approx = operators.Relational.qApproxQuantiles(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D))").as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    approx.keySet shouldBe exact.keySet
    approx.foreach { case (flag, (p50, p90, p99)) =>
      val e = exact(flag)
      math.abs(p50 - e(0)) / e(0) should be < 0.01
      math.abs(p90 - e(1)) / e(1) should be < 0.01
      math.abs(p99 - e(2)) / e(2) should be < 0.01
    }
  }

  it should "schedule the curriculum as a partition of the corpus ending at share 1.0" in {
    import org.apache.spark.sql.functions._
    val sched = operators.Pipeline.pipeCurriculum(spark, sf).collect()
    sched.map(_.getAs[Long]("n_docs")).sum shouldBe Tables.documents(spark, sf).count()
    sched.last.getAs[Double]("cum_share") shouldBe 1.0
    // stages ascend and cumulative mass is nondecreasing
    sched.map(_.getAs[Long]("stage")).toSeq shouldBe sched.map(_.getAs[Long]("stage")).sorted.toSeq
    val cums = sched.map(_.getAs[Long]("cum_tokens"))
    cums.zip(cums.tail).foreach { case (a, b) => b should be >= a }
    // band edges honored: every stage's token range sits inside its 20-token band
    sched.filter(_.getAs[Long]("stage") < 4).foreach { r =>
      val st = r.getAs[Long]("stage")
      r.getAs[Long]("min_tokens") should be >= st * 20
      r.getAs[Long]("max_tokens") should be < (st + 1) * 20
    }
  }

  it should "grade short-word prose easier than long-word prose" in {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-read").toString
    val easy = "he can go. we do it. it is so. you may be. I am up. " * 4
    val hard = "extraordinarily incomprehensible organizational responsibilities. " * 10
    Seq((0L, easy.trim, "en", "src0", 100L), (1L, hard.trim, "en", "src0", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.TextAnalysis.taReadability(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    rows(0L).getAs[Double]("flesch") should be > rows(1L).getAs[Double]("flesch")
    rows(0L).getAs[Double]("fk_grade") should be < rows(1L).getAs[Double]("fk_grade")
    rows(0L).getAs[String]("band") shouldBe "easy"
    rows(1L).getAs[String]("band") shouldBe "hard"
    // sentence runs count once: "go. we" has one [.!?]+ run per period
    rows(0L).getAs[Long]("n_sents") shouldBe 20L
  }

  it should "keep a stale centroid when a k-means cluster empties" in {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // seed 1 duplicates seed 0, so every vector prefers c0 (ties break to
    // the lowest cid): cluster 1 is empty after round 1 and its centroid
    // update must coalesce to the previous value instead of nulling out
    val dir = java.nio.file.Files.createTempDirectory("graft-km").toString
    val vecs = (0L until 12L).map { i =>
      val base = if (i == 1L) 0L else i // vec 1 == vec 0
      (i, Array.tabulate(64)(j => (base * 31 + j).toFloat / 100f), 0)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = operators.Clustering.clKmeans(spark, dir).collect()
    out.length shouldBe 12
    // nothing lands in the duplicated seed's cluster, and no NaN/null dists
    out.map(_.getLong(1)).toSet.contains(1L) shouldBe false
    out.foreach { r => r.getDouble(2).isNaN shouldBe false }
    // vec 0 and its duplicate sit at distance 0 from their centroid's seed
    out.filter(r => r.getLong(0) <= 1L).map(_.getLong(1)).toSet shouldBe Set(0L)
  }

  it should "never underestimate counts in the count-min sketch" in {
    import org.apache.spark.sql.functions._
    // CM-sketch invariant: collisions only inflate, so est_n >= exact_n
    operators.EventAnalytics.evHeavyHitters(spark, sf)
      .filter(col("est_n") < col("exact_n")).count() shouldBe 0L
  }

  it should "keep every source within its token budget allocation" in {
    import org.apache.spark.sql.functions._
    val mix = operators.Pipeline.pipeBudgetMix(spark, sf)
    mix.filter(col("tokens_kept") > col("budget")).count() shouldBe 0L
    // sqrt reweighting: allocations sum back to the global budget
    val total = mix.agg(sum(col("budget"))).collect()(0).getDouble(0)
    total shouldBe 100000.0 +- 1.0
  }

  it should "bound decay scores by the undecayed value sum" in {
    import org.apache.spark.sql.functions._
    // exp(-dt/24h) <= 1, and values are positive in the testdata, so the
    // decayed score can never exceed the plain per-user value sum
    val decay = operators.EventAnalytics.evDecay(spark, sf)
    val plain = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(sum(col("value")).as("value_sum"))
    decay.join(plain, "user_id")
      .filter(col("decay_score") > col("value_sum") + 1e-9).count() shouldBe 0L
  }

  it should "split every document into exactly one of train/val/test" in {
    import org.apache.spark.sql.functions._
    val split = operators.Pipeline.pipeSplit(spark, sf)
    split.select(col("split")).distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("train", "val", "test")) shouldBe true
    // partition: per-lang doc counts across splits sum to the corpus
    val total = split.agg(sum(col("n_docs"))).collect()(0).getLong(0)
    total shouldBe Tables.documents(spark, sf).count()
    // deterministic: the split column is a pure function of doc_id, so
    // train must dominate (80% expected mass)
    val train = split.filter(col("split") === "train")
      .agg(sum(col("n_docs"))).collect()(0).getLong(0)
    train.toDouble / total should be > 0.6
  }

  it should "keep WAU >= DAU with stickiness in (0, 1]" in {
    import org.apache.spark.sql.functions._
    val df = operators.EventAnalytics.evDauWau(spark, sf)
    df.filter(col("wau") < col("dau")).count() shouldBe 0L
    df.filter(col("stickiness") <= 0.0 || col("stickiness") > 1.0).count() shouldBe 0L
  }

  it should "bound containment by 1 and below by Jaccard" in {
    import org.apache.spark.sql.functions._
    // J = |∩|/|∪| <= |∩|/|A| since |∪| >= |A|; both directions in [0,1]
    val c = operators.Dedup.ddContainment(spark, sf)
    val j = operators.Dedup.ddJaccard(spark, sf).select(col("doc_a"), col("jaccard"))
    c.filter(col("containment_a") > 1.0 || col("containment_b") > 1.0 ||
      col("containment_a") < 0.0 || col("containment_b") < 0.0).count() shouldBe 0L
    c.join(j, "doc_a")
      .filter(col("jaccard") > col("containment_a") + 1e-9 ||
        col("jaccard") > col("containment_b") + 1e-9).count() shouldBe 0L
  }

  it should "keep repetition fractions in [0,1] on a corpus with a known stuffed doc" in {
    import org.apache.spark.sql.functions._
    val rep = operators.TextAnalysis.taRepetition(spark, sf)
    rep.filter(col("top_bigram_frac") < 0.0 || col("top_bigram_frac") > 1.0 ||
      col("dup_trigram_frac") < 0.0 || col("dup_trigram_frac") > 1.0).count() shouldBe 0L
    // a synthetic fully-repetitive doc must flag; a unique-token doc must not
    val dir = java.nio.file.Files.createTempDirectory("graft-rep").toString
    import spark.implicits._
    Seq((0L, ("spam ham " * 50).trim, "en", "src0", 100L),
        (1L, (1 to 100).map(i => s"w$i").mkString(" "), "en", "src0", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val flags = operators.TextAnalysis.taRepetition(spark, dir)
      .select(col("doc_id"), col("is_repetitive")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    flags(0L) shouldBe true
    flags(1L) shouldBe false
  }

  it should "pair documents sharing a long run through winnowing, and respect the fp cap" in {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // winnowing guarantee: a shared run of >= 8 tokens selects at least
    // one common fingerprint (5-gram hashes, window 4) in both docs
    val shared = (1 to 12).map(i => s"common$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-winnow").toString
    Seq(
      (0L, s"${(1 to 10).map(i => s"alpha$i").mkString(" ")} $shared", "en", "src0", 100L),
      (1L, s"$shared ${(1 to 10).map(i => s"beta$i").mkString(" ")}", "en", "src0", 100L),
      (2L, (1 to 30).map(i => s"gamma$i").mkString(" "), "en", "src0", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = operators.Dedup.ddPhraseDup(spark, dir)
      .select(col("doc_a"), col("doc_b")).collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs should contain((0L, 1L))
    pairs.exists(p => p._1 == 2L || p._2 == 2L) shouldBe false
    // the per-fingerprint TopKPerGroup cap bounds a degenerate hot
    // fingerprint: with cap=2 the pair count can never exceed C(2,2)=1
    // per fingerprint however many docs share the boilerplate
    val boiler = (1 to 12).map(i => s"boiler$i").mkString(" ")
    Seq.tabulate(6)(i => (i.toLong, boiler, "en", "src0", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val capped = operators.Dedup.ddPhraseDupImpl(spark, dir, maxBucketSize = 2)
    capped.select(max(col("doc_a"))).collect()(0).getLong(0) should be <= 1L
  }

  it should "score duplicated-span shares: clones 1.0, unique 0.0, self-repeats counted" in {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cloned = (1 to 20).map(i => s"clone$i").mkString(" ")
    val selfRep = ((1 to 8).map(i => s"loop$i").mkString(" ") + " ") * 3
    val dir = java.nio.file.Files.createTempDirectory("graft-substr").toString
    Seq(
      (0L, cloned, "en", "src0", 100L),
      (1L, cloned, "en", "src1", 100L),
      (2L, (1 to 20).map(i => s"uniq$i").mkString(" "), "en", "src0", 100L),
      (3L, selfRep.trim, "en", "src0", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.Dedup.ddSubstring(spark, dir)
      .select(col("doc_id"), col("n_windows"), col("dup_windows"), col("dup_share"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    rows(0L) shouldBe ((13L, 13L, 1.0)) // every window of a clone is shared
    rows(1L) shouldBe ((13L, 13L, 1.0))
    rows(2L)._2 shouldBe 0L            // unique doc: nothing duplicated
    rows(2L)._3 shouldBe 0.0
    // the self-repeating doc duplicates its own windows with no other doc
    rows(3L)._2 should be > 0L
    // shares stay in [0,1] on the main corpus
    operators.Dedup.ddSubstring(spark, sf)
      .filter(col("dup_share") < 0.0 || col("dup_share") > 1.0).count() shouldBe 0L
  }

  it should "bracket truncated-dim retrieval: exact on zero-tail vectors, re-rank never hurts" in {
    import spark.implicits._
    // fixture 1: ALL ranking signal in the first 8 dims (zeros after) —
    // truncated cosine == full cosine at every width, so both recall
    // columns must be EXACTLY 1.0
    val dir = java.nio.file.Files.createTempDirectory("graft-dimtrunc").toString
    (0 until 64).map { i =>
      val e = Array.tabulate(64)(j =>
        if (j < 8) math.sin(i * 7.0 + j * 1.3).toFloat else 0.0f)
      (i.toLong, e, i % 4)
    }.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val exact = operators.Similarity.annDimTrunc(spark, dir).collect()
    exact.length shouldBe 3
    exact.foreach { r =>
      withClue(s"dim ${r.getAs[Long]("dim")}: ") {
        r.getAs[Double]("recall_trunc5") shouldBe 1.0
        r.getAs[Double]("recall_at_5") shouldBe 1.0
      }
    }
    // corpus invariants at sf: the exact re-rank can only ADD recall
    // over the raw truncated top-5 (a shortlist truth hit provably
    // survives re-rank), and both stay in [0, 1]
    val rows = operators.Similarity.annDimTrunc(spark, sf).collect()
    rows.length shouldBe 3
    rows.foreach { r =>
      val (t5, r5) = (r.getAs[Double]("recall_trunc5"), r.getAs[Double]("recall_at_5"))
      withClue(s"dim ${r.getAs[Long]("dim")}: ") {
        r5 should be >= t5
        t5 should (be >= 0.0 and be <= 1.0)
        r5 should (be >= 0.0 and be <= 1.0)
        r.getAs[Long]("n_hits") should be <= 5L * r.getAs[Long]("n_queries")
      }
    }
  }

  it should "rank BM25 retrieval identically to a driver-side replay" in {
    // independent recompute of the whole card (tokenize → md5 query
    // sample → df/avgdl → Okapi scoring → rounded-score top-10) in pure
    // Scala — pins the operator end to end without the oracle in the loop
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[String]("text")).getOrElse(""))
    def toks(t: String): Array[String] = t.split("\\s+").filter(_.nonEmpty)
    val tk = docs.map { case (id, t) => id -> toks(t) }.toMap
    val n = docs.length.toLong
    n should be > 16L
    val avgdl = tk.values.map(_.length.toLong).sum.toDouble / n
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val qids = docs.map(_._1).sortBy(id => (md5hex(id.toString), id)).take(16)
    val queries = qids.map(id => id -> tk(id).take(6).distinct.toSeq)
    val dfm = queries.flatMap(_._2).distinct
      .map(t => t -> tk.values.count(_.contains(t)).toLong).toMap
    val (k1, b) = (1.2, 0.75)
    val expect = queries.filter(_._2.nonEmpty).flatMap { case (qid, terms) =>
      val scored = tk.toSeq.flatMap { case (did, dtk) =>
        val dl = dtk.length
        val sts = terms.flatMap { t =>
          val tf = dtk.count(_ == t).toLong
          if (tf == 0) None
          else Some(math.log((n - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1.0) *
            (tf * (k1 + 1.0)) /
            (tf + k1 * (1.0 - b + b * (dl.toDouble / avgdl))))
        }
        if (sts.isEmpty) None
        else Some((did, math.floor(sts.sum * 1e6 + 0.5) / 1e6, sts.length.toLong))
      }
      scored.sortBy { case (did, r, _) => (-r, did) }.take(10)
        .zipWithIndex.map { case ((did, r, nt), i) =>
          (qid, (i + 1).toLong, did, nt, r)
        }
    }.sortBy(t => (t._1, t._2)) // the op presents in (query_id, rnk) order
    val got = operators.Retrieval.irBm25(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rnk"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("n_terms"),
        r.getAs[Double]("score")))
    got.length shouldBe expect.length
    got.zip(expect).foreach {
      case ((gq, gr, gd, gn, gs), (eq, er, ed, en, es)) =>
        withClue(s"query $eq rank $er: ") {
          (gq, gr, gd, gn) shouldBe ((eq, er, ed, en))
          gs shouldBe es +- 2e-6 // replay sums doubles, op sums decimals
        }
    }
  }

  it should "score retrieval quality against a driver-replayed Jaccard truth" in {
    // the truth side (token-set Jaccard >= 1/2 via 2*inter >= union)
    // recomputed independently in Scala; the metric side checked for
    // its arithmetic identities against the replayed truth
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[String]("text")).getOrElse(""))
    val tk = docs.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty).toSet
    }.toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val qids = docs.map(_._1).sortBy(id => (md5hex(id.toString), id)).take(16)
    val truth = qids.flatMap { qid =>
      val a = tk(qid)
      docs.map(_._1).filter { did =>
        val b = tk(did)
        val inter = (a & b).size
        did != qid && 2 * inter >= a.size + b.size - inter
      }.map(qid -> _)
    }
    val withRel = truth.groupBy(_._1)
    val r = operators.Retrieval.irEval(spark, sf).collect()(0)
    r.getAs[Long]("n_queries") shouldBe withRel.size.toLong
    r.getAs[Long]("n_rel") shouldBe truth.length.toLong
    val (nq, nh) = (r.getAs[Long]("n_queries"), r.getAs[Long]("n_hits"))
    nh should be <= math.min(10 * nq, r.getAs[Long]("n_rel"))
    // macro precision@10 is exactly n_hits / (10 * n_queries)
    r.getAs[Double]("precision_at_10") shouldBe
      (math.floor(nh.toDouble / (10.0 * nq) * 1e6 + 0.5) / 1e6) +- 1e-9
    r.getAs[Double]("recall_at_10") should (be >= 0.0 and be <= 1.0)
    r.getAs[Double]("mrr") should (be >= 0.0 and be <= 1.0)
  }

  it should "find exact phrase occurrences identically to a driver-side sliding-window scan" in {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[String]("text")).getOrElse(""))
    val tk = docs.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty)
    }.toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val qs = docs.map(_._1).sortBy(id => (md5hex(id.toString), id)).take(16)
      .map(id => id -> tk(id).slice(1, 4).toSeq).filter(_._2.length == 3)
    qs.length should be > 0
    val expect = qs.flatMap { case (qid, ph) =>
      tk.toSeq.flatMap { case (did, dtk) =>
        val starts = dtk.sliding(3).zipWithIndex
          .collect { case (w, i) if w.length == 3 && w.toSeq == ph => i }
          .toSeq
        if (starts.isEmpty) None
        else Some((qid, ph.mkString(" "), did, starts.length.toLong,
          starts.min.toLong))
      }
    }.sortBy(t => (t._1, t._3))
    val got = operators.Retrieval.irPhrase(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[String]("phrase"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("n_occ"),
        r.getAs[Long]("first_pos"))).toSeq
    got shouldBe expect
    // each eligible query doc contains its own phrase (it was cut from
    // position 1, so the first occurrence can be no later than that)
    val byKey = got.map(t => (t._1, t._3) -> t._5).toMap
    qs.foreach { case (qid, _) =>
      withClue(s"query $qid self-occurrence: ") {
        byKey((qid, qid)) should be <= 1L
      }
    }
  }

  it should "reconstruct int8-exactly on two-level dims and never lose recall to the re-rank" in {
    import spark.implicits._
    // fixture: every dim takes exactly its per-dim {min, max} values, so
    // codes land on 0/255 and reconstruction is bit-exact — mse must be
    // EXACTLY 0 and both recalls exactly 1 (cosq == cos, same tie rule)
    val dir = java.nio.file.Files.createTempDirectory("graft-sq8").toString
    (0 until 64).map { i =>
      val e = Array.tabulate(64)(j => (1 + ((i >> (j % 6)) & 1)).toFloat)
      (i.toLong, e, i % 4)
    }.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val exact = operators.Similarity.annSq8(spark, dir).collect()(0)
    exact.getAs[Double]("mse") shouldBe 0.0
    exact.getAs[Double]("recall_sq5") shouldBe 1.0
    exact.getAs[Double]("recall_at_5") shouldBe 1.0
    // corpus invariants: the exact re-rank can only ADD recall over the
    // raw int8 top-5 (shortlist containment argument), bounds hold
    val c = operators.Similarity.annSq8(spark, sf).collect()(0)
    c.getAs[Long]("n_vec") should be > 0L
    c.getAs[Double]("recall_at_5") should be >= c.getAs[Double]("recall_sq5")
    c.getAs[Double]("recall_sq5") should (be >= 0.0 and be <= 1.0)
    c.getAs[Double]("recall_at_5") should (be >= 0.0 and be <= 1.0)
    c.getAs[Double]("mse") should be >= 0.0
    c.getAs[Long]("n_hits") should be <= 5L * c.getAs[Long]("n_queries")
  }

  it should "recommend the minimal power-of-two band count reaching each target catch" in {
    import spark.implicits._
    // driver recompute from the SAME measured truth-set J distribution:
    // per-pair repeated squaring (the IEEE-exact multiplication-only
    // chain), decimal(38,18) term rounding, exact decimal sum, 4-dp
    // floor-rounded mean — then the minimal power-of-two b >= target
    val js = operators.Dedup.ddPpjoin(spark, sf)
      .select("jaccard").as[Double].collect()
    js.length should be > 0
    def predicted(r: Int, b: Int): Double = {
      val sum = js.map { j =>
        val jr = if (r == 2) j * j else { val j2 = j * j; j2 * j2 }
        var m = 1.0 - jr
        var bb = 1
        while (bb < b) { m = m * m; bb *= 2 }
        java.math.BigDecimal.valueOf(1.0 - m)
          .setScale(18, java.math.RoundingMode.HALF_UP)
      }.foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
      math.floor(sum.doubleValue / js.length * 1e4 + 0.5) / 1e4
    }
    val got = operators.Dedup.ddSigPlan(spark, sf).collect().map(r =>
      (r.getAs[Long]("rows_per_band"), r.getAs[Double]("target_catch")) ->
        ((r.getAs[Long]("recommended_bands"), r.getAs[Long]("recommended_perms"),
          r.getAs[Double]("predicted_catch")))).toMap
    got.size shouldBe 4
    for (r <- Seq(2, 4); t <- Seq(0.95, 0.99)) {
      val bStar = (0 to 7).map(1 << _).find(b => predicted(r, b) >= t).get
      withClue(s"r=$r target=$t: ") {
        got((r.toLong, t)) shouldBe ((bStar.toLong, (bStar * r).toLong, predicted(r, bStar)))
      }
    }
    // a stricter target can never recommend fewer bands
    got((2L, 0.99))._1 should be >= got((2L, 0.95))._1
    got((4L, 0.99))._1 should be >= got((4L, 0.95))._1
  }

  it should "census duplicated lines: boilerplate across docs, self-repeats, aligned pseudo-lines" in {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val header = "nav home about contact"
    val footer = "copyright terms privacy cookies"
    val long16 = (1 to 16).map(i => s"wall$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-linedup").toString
    Seq(
      // 0/1 share header+footer; 1 uses CRLF — same line hashes as 0's LF
      (0L, s"$header\n${(1 to 10).map(i => s"a$i").mkString(" ")}\n$footer", "en", "src0", 100L),
      (1L, s"$header\r\n${(1 to 10).map(i => s"b$i").mkString(" ")}\r\n$footer", "en", "src1", 100L),
      // 2: all-unique lines — zero dup, no removal
      (2L, s"${(1 to 5).map(i => s"u$i").mkString(" ")}\n${(6 to 10).map(i => s"u$i").mkString(" ")}", "en", "src0", 100L),
      // 3: intra-doc repeated line — self-boilerplate counts
      (3L, "promo deal now\npromo deal now\npromo deal now", "en", "src0", 100L),
      // 4/5: ONE long unpunctuated line each; the first ALIGNED 16-token
      // pseudo-line is shared, the tails differ (4 has 40 tokens → 3
      // pseudo-lines of 16/16/8; 5 has 26 → 2 of 16/10)
      (4L, s"$long16 ${(1 to 24).map(i => s"t4x$i").mkString(" ")}", "en", "src0", 100L),
      (5L, s"$long16 ${(1 to 10).map(i => s"t5x$i").mkString(" ")}", "en", "src0", 100L),
      // 6: blank/whitespace-only lines drop; the surviving line is the
      // shared header → full-dup doc
      (6L, s"\n   \n\t\n$header\n  ", "en", "src0", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.Dedup.ddLineDup(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_lines"),
        r.getAs[Long]("dup_lines"), r.getAs[Double]("dup_line_share"),
        r.getAs[Long]("remove_flag")))).toMap
    rows(0L) shouldBe ((3L, 2L, 0.6667, 1L))
    rows(1L) shouldBe ((3L, 2L, 0.6667, 1L)) // CRLF hashes equal LF hashes
    rows(2L) shouldBe ((2L, 0L, 0.0, 0L))
    rows(3L) shouldBe ((3L, 3L, 1.0, 1L))    // self-repeat is removable
    rows(4L) shouldBe ((3L, 1L, 0.3333, 1L)) // aligned 16-token pseudo-line
    rows(5L) shouldBe ((2L, 1L, 0.5, 1L))
    rows(6L) shouldBe ((1L, 1L, 1.0, 1L))    // blanks dropped, header dups
    // corpus invariants: share in [0,1], flag exactly the 10·dup ≥ 3·n rule
    val bad = operators.Dedup.ddLineDup(spark, sf)
      .filter(col("dup_line_share") < 0.0 || col("dup_line_share") > 1.0 ||
        (col("remove_flag") === 1) =!= (col("dup_lines") * 10 >= col("n_lines") * 3))
      .count()
    bad shouldBe 0L
    // the census REPORT names the boilerplate with exact counts and the
    // deterministic (copies desc, docs desc, line) order
    val census = operators.Dedup.ddLineCensus(spark, dir).collect()
      .map(r => (r.getAs[String]("line"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_copies")))
    census.take(2) shouldBe Array(
      (header, 3L, 3L),             // docs 0/1/6 — ties on copies, more docs first
      ("promo deal now", 1L, 3L))   // doc 3's self-repeat
    census.drop(2).toSet shouldBe Set(
      (footer, 2L, 2L), (long16, 2L, 2L))
    // report ⊆ duplicated: every census line is duplicated by definition
    census.foreach { case (_, nd, nc) => nc should be > 1L; nd should be >= 1L }
  }

  it should "summarize the session distribution consistently with the session frame" in {
    val stats = operators.EventAnalytics.evSessionStats(spark, sf).collect()(0)
    val sessions = operators.EventAnalytics.evSessions(spark, sf)
    stats.getAs[Long]("n_sessions") shouldBe sessions.count()
    stats.getAs[Long]("n_singleton") shouldBe
      sessions.filter(sessions("n_events") === 1).count()
    val share = stats.getAs[Double]("singleton_share")
    share should (be >= 0.0 and be <= 1.0)
    stats.getAs[Double]("avg_events") should be >= 1.0
    // percentiles are nondecreasing in rank
    val (p50, p90, p99) = (stats.getAs[Double]("p50_dur_s"),
      stats.getAs[Double]("p90_dur_s"), stats.getAs[Double]("p99_dur_s"))
    p90 should be >= p50
    p99 should be >= p90
  }

  it should "report per-modality payload dedup consistently with exact content dedup" in {
    import org.apache.spark.sql.functions._
    val rows = operators.Multimodal.mmDedup(spark, sf).collect()
    rows.map(_.getAs[String]("format")).sorted shouldBe Array("audio", "image", "video")
    // lanes partition the corpus, and distinct-per-lane sums to at least
    // the corpus-wide distinct count (a cross-lane duplicate counts once
    // globally but once per lane here)
    rows.map(_.getAs[Long]("n_payloads")).sum shouldBe Tables.documents(spark, sf).count()
    val globalDistinct = operators.Dedup.ddExact(spark, sf).count()
    rows.map(_.getAs[Long]("n_distinct")).sum should be >= globalDistinct
    rows.foreach { r =>
      r.getAs[Long]("n_dupes") shouldBe r.getAs[Long]("n_payloads") - r.getAs[Long]("n_distinct")
      r.getAs[Double]("dup_share") should (be >= 0.0 and be <= 1.0)
    }
  }

  it should "measure the longest duplicated run and agree with the dup-share frame" in {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-span").toString
    // doc 0/1 share ONLY a 12-token span inside otherwise-unique text:
    // the run is exactly 12-7=5 windows → 12 tokens reported
    val span = (1 to 12).map(i => s"shared$i").mkString(" ")
    Seq(
      (0L, s"${(1 to 10).map(i => s"a$i").mkString(" ")} $span ${(1 to 10).map(i => s"b$i").mkString(" ")}", "en", "src0", 100L),
      (1L, s"${(1 to 10).map(i => s"c$i").mkString(" ")} $span ${(1 to 10).map(i => s"d$i").mkString(" ")}", "en", "src0", 100L),
      (2L, (1 to 30).map(i => s"u$i").mkString(" "), "en", "src0", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.Dedup.ddDupSpan(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_runs"), r.getAs[Long]("max_run_tokens")))).toMap
    rows.keySet shouldBe Set(0L, 1L)      // the unique doc emits nothing
    rows(0L) shouldBe ((1L, 12L))          // one run covering the shared span
    rows(1L) shouldBe ((1L, 12L))
    // corpus consistency: exactly the docs with dup_windows > 0 carry runs,
    // and no run can exceed the doc's window count
    val spanDocs = operators.Dedup.ddDupSpan(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    val shareDocs = operators.Dedup.ddSubstring(spark, sf)
      .filter(col("dup_windows") > 0).select("doc_id").as[Long].collect().toSet
    spanDocs shouldBe shareDocs
    operators.Dedup.ddDupSpan(spark, sf)
      .filter(col("max_run_windows") > col("n_windows")).count() shouldBe 0L
  }

  it should "fit traffic trends over the densified hour spine" in {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // a strictly growing type (n events in hour n) and a type active in
    // only two far-apart hours — the zero-filled spine must pull the
    // second slope toward 0, which a sparse fit would miss entirely
    val dir = java.nio.file.Files.createTempDirectory("graft-trend").toString
    def hourNs(h: Int) = h * 3600L * 1000000000L // Tables.events expects nanos
    val grow = for (h <- 0 until 10; i <- 0 to h)
      yield (h * 100L + i, hourNs(h), 1L, "grow", 1.0, "{}")
    val sparse = Seq(
      (5000L, hourNs(0), 2L, "sparse", 1.0, "{}"),
      (5001L, hourNs(9), 2L, "sparse", 1.0, "{}"))
    (grow ++ sparse).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = operators.EventAnalytics.evTrend(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    // y = x+1 over x = 0..9 → slope exactly 1
    rows("grow").getAs[Double]("slope_per_hour") shouldBe 1.0
    rows("grow").getAs[Long]("n_hours") shouldBe 10L
    rows("grow").getAs[Long]("n_events") shouldBe 55L
    // 10-hour spine with 8 zero hours: slope ≈ 0 (exactly 0 here by
    // symmetry: ones at both ends of the window)
    rows("sparse").getAs[Long]("n_hours") shouldBe 10L
    rows("sparse").getAs[Double]("slope_per_hour") shouldBe 0.0
  }

  it should "drop the full historical slice through the bloom gate report" in {
    import org.apache.spark.sql.functions._
    val rows = operators.Dedup.ddBloom(spark, sf).collect()
    rows.foreach { r =>
      r.getAs[Long]("n_dropped") shouldBe r.getAs[Long]("n_docs") - r.getAs[Long]("n_kept")
    }
    val total = Tables.documents(spark, sf).count()
    rows.map(_.getAs[Long]("n_docs")).sum shouldBe total
    // zero false negatives: the whole hash-split history drops, and at
    // most ~fpp of the fresh half follows it (1% fpp, generous margin)
    val histSize = Tables.documents(spark, sf)
      .filter(graft.functions.TextFns.hashBucket("bloomhist|", col("doc_id"), 8, 2) === 0)
      .count()
    val dropped = rows.map(_.getAs[Long]("n_dropped")).sum
    dropped should be >= histSize
    dropped should be <= histSize + math.max(1L, (total - histSize) / 20)
  }

  it should "account every active user-day in the cohort matrix" in {
    import org.apache.spark.sql.functions._
    val m = operators.EventAnalytics.evCohortMatrix(spark, sf)
    m.filter(col("offset_days") < 0).count() shouldBe 0L
    val total = m.agg(sum(col("n_users"))).collect()(0).getLong(0)
    val expected = Tables.events(spark, sf)
      .select(date_trunc("day", col("ts")), col("user_id")).distinct().count()
    total shouldBe expected
  }

  it should "rank collocations by PMI above the support floor" in {
    import org.apache.spark.sql.functions._
    val c = operators.TextAnalysis.taCollocations(spark, sf).collect()
    c.length should be <= 20
    all(c.map(_.getAs[Long]("n_ab"))) should be >= 5L
    val pmis = c.map(_.getAs[Double]("pmi"))
    pmis.zip(pmis.tail).foreach { case (hi, lo) => hi should be >= lo }
  }

  it should "produce contiguous byte offsets within every manifest shard" in {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val m = operators.Multimodal.mmManifest(spark, sf)
    // each record starts exactly where the previous one ended, per shard
    val w = Window.partitionBy(col("shard")).orderBy(col("rec_idx"))
    val bad = m.withColumn("expected", coalesce(
        lag(col("offset") + col("n_bytes"), 1).over(w), lit(0L)))
      .filter(col("offset") =!= col("expected"))
    bad.count() shouldBe 0L
    // shard totals account for every payload byte
    val total = m.agg(sum(col("n_bytes"))).collect()(0).getLong(0)
    total shouldBe Tables.documents(spark, sf)
      .agg(sum(octet_length(col("text")))).collect()(0).getLong(0)
  }

  it should "redact every injected PII span and prove it via the residual column" in {
    import org.apache.spark.sql.functions._
    val out = operators.Pipeline.pipeRedact(spark, sf)
    val n = Tables.documents(spark, sf).count()
    out.count() shouldBe n
    // exactly one injected span per class per doc — a >1 count would mean
    // the synthetic corpus grew organic PII (worth knowing), a 0 a regex
    // that no longer matches its own injection
    out.filter(col("n_email") =!= 1 || col("n_ssn") =!= 1 ||
      col("n_phone") =!= 1 || col("n_ip") =!= 1).count() shouldBe 0L
    // completeness proof: the redacted text re-scans to zero matches
    out.agg(sum(col("n_residual"))).collect()(0).getLong(0) shouldBe 0L
    // injection varies by doc_id, so redacted hashes stay per-doc distinct
    out.select("clean_hash").distinct().count() shouldBe n
  }

  it should "score a stuffed doc lower than a distinct-token doc on normalized entropy" in {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = operators.TextAnalysis.taEntropy(spark, sf)
    e.filter(col("norm_entropy") < 0.0 || col("norm_entropy") > 1.0 + 1e-9)
      .count() shouldBe 0L
    val dir = java.nio.file.Files.createTempDirectory("graft-ent").toString
    Seq((0L, ("spam " * 100).trim, "en", "src0", 100L),
        (1L, (1 to 100).map(i => s"w$i").mkString(" "), "en", "src0", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val scores = operators.TextAnalysis.taEntropy(spark, dir)
      .select(col("doc_id"), col("norm_entropy")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    scores(0L) shouldBe 0.0 // one repeated token: zero entropy
    scores(1L) shouldBe 1.0 +- 1e-6 // all distinct: maximal
  }

  it should "keep approx distinct within 5% of exact" in {
    import org.apache.spark.sql.functions._
    val approx = operators.Relational.qApproxDistinct(spark, sf)
      .select(col("event_type"), col("approx_users")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      math.abs(approx(k) - n).toDouble / n should be < 0.05
    }
  }

  it should "cluster identically through the driver union-find and distributed paths" in {
    // driverMaxEdges=0 forces the distributed pointer-jumping loop; the
    // default runs the driver union-find — both must reach the same
    // min-label fixpoint on the same corpus
    val viaDriver = operators.Dedup.ddDupGroupsImpl(spark, sf, driverMaxEdges = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaCluster = operators.Dedup.ddDupGroupsImpl(spark, sf, driverMaxEdges = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    viaDriver shouldBe viaCluster
  }

  it should "cluster LSH pairs consistently with the pair graph" in {
    import org.apache.spark.sql.functions._
    val pairs = operators.Dedup.ddLshPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = operators.Dedup.ddDupGroups(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every candidate pair must land in the same cluster
    pairs.foreach { case (a, b) => clusters(a) shouldBe clusters(b) }
    // representative is a member of its own cluster
    clusters.values.foreach(rep => clusters(rep) shouldBe rep)
  }

  it should "bound hot LSH buckets through the heap cap" in {
    import spark.implicits._
    // 50 identical documents collide into the SAME bucket in every band —
    // the degenerate hot bucket that would grow an unbounded collect_list
    val tmp = java.nio.file.Files.createTempDirectory("graft-lsh-hot").toString
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    (1L to 50L).map(i => (i, text)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // cap 8: each bucket keeps its 8 smallest doc_ids → exactly C(8,2) pairs
    val capped = operators.Dedup.lshPairsUnsorted(spark, tmp, maxBucketSize = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    capped shouldBe (for { a <- 1L to 8L; b <- (a + 1) to 8L } yield (a, b)).toSet
    // the default cap sits far above organic buckets: all C(50,2) pairs
    operators.Dedup.ddLshPairs(spark, tmp).count() shouldBe 50L * 49 / 2
  }

  it should "report ANN recall of the pruned variants vs bruteforce" in {
    def neighbors(df: org.apache.spark.sql.DataFrame, k: Int): Map[Long, Set[Long]] =
      df.filter(org.apache.spark.sql.functions.col("rnk") <= k).collect()
        .groupBy(_.getLong(0)).map { case (q, rows) => q -> rows.map(_.getLong(2)).toSet }
    val exact = neighbors(operators.Similarity.annBruteforce(spark, sf), 5)
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val approx = neighbors(df, 5)
      val scores = exact.map { case (q, truth) =>
        approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }
      scores.sum / scores.size
    }
    val rLsh = recall(operators.Similarity.annLsh(spark, sf))
    val rIvf = recall(operators.Similarity.annIvf(spark, sf))
    val rPq = recall(operators.Similarity.annPq(spark, sf))
    val rNnd = recall(operators.Similarity.annNnDescent(spark, sf))
    info(f"recall@5 vs bruteforce: multiprobe-LSH=$rLsh%.3f IVF(nprobe=4)=$rIvf%.3f PQ(8x16)=$rPq%.3f NN-descent=$rNnd%.3f")
    // NN-descent's seed IS the multi-probe LSH top-5, and each refinement
    // round re-selects over a superset of the current list — recall is
    // monotonically >= the LSH baseline by construction
    rNnd should be >= rLsh
    // pruned variants must find a meaningful fraction of true neighbors
    // even on isotropic random vectors (the hardest case for ANN)
    rLsh should be > 0.25
    rIvf should be > 0.3
    // PQ scans everything through quantized scores — no candidate pruning,
    // only quantization error, so recall runs higher than the pruned paths
    rPq should be > 0.4
  }

  it should "show the OPQ rotation beating plain PQ recall on anisotropic vectors" in {
    // Anisotropic vectors: the first 32 dims carry ~100× the variance of
    // the last 32, so PQ's subspaces 0–3 drown in quantization error
    // while 4–7 quantize nothing — the energy imbalance the OPQ
    // variance-equalizing Givens rotation on (i, i+32) pairs removes
    // (score-error variance ~ Σ var_j², minimized by balance). The
    // testdata embeddings are isotropic (rotation is a no-op by
    // symmetry; the oracle gate there proves correctness only), so the
    // recall GAIN is pinned here on generated anisotropic data, via the
    // same recall@5 protocol as the LSH/IVF/PQ test above.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    graft.plans.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(42)
    val rows = (0 until 1200).map { id =>
      val a = Array.fill(32)(rnd.nextGaussian())
      val b = Array.fill(32)(0.1 * rnd.nextGaussian())
      (id.toLong, a ++ b)
    }
    val v = rows.toDF("vec_id", "e")
      .withColumn("nrm", graft.functions.VecFns.l2norm(col("e")))
    val qs = v.filter(col("vec_id") % 4 === 0)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
    def neighbors(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.filter(col("rnk") <= 5).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val exact = neighbors(operators.Similarity.annBruteforceFor(v, qs))
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val approx = neighbors(df)
      val scores = exact.map { case (q, truth) =>
        approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }
      scores.sum / scores.size
    }
    val rPq = recall(operators.Similarity.annPqFor(v, qs))
    // same %4 fixture queries on BOTH sides (selected post-rotation on
    // the OPQ side — the id rule is content-independent)
    val rOpq = recall(operators.Similarity.annOpqFor(v,
      vr => vr.filter(col("vec_id") % 4 === 0)
        .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))))
    info(f"recall@5 on variance-imbalanced vectors: PQ=$rPq%.3f OPQ=$rOpq%.3f")
    rOpq should be > rPq
  }

  it should "show residual coding beating raw coding in IVF-PQ on clustered vectors" in {
    // Clustered fixture — the data shape residual coding exists for
    // (FAISS IVFPQ's default): 16 well-separated centers, every point =
    // center + a small offset along one of 16 direction vectors. RAW
    // coding quantizes whole vectors against the 16 centroids, so every
    // member of a cell reconstructs to the SAME centroid and ADC cannot
    // rank within the cell (ties → vec_id order → the shortlist is
    // arbitrary). Residual coding spends the identical codeword budget
    // on exactly the within-cell offsets — seeds 16..31 carry the 16
    // directions, so the residual codebook IS the direction set — and
    // ADC separates cell members. Same recall@5 protocol as above.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    graft.plans.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(16)(Array.fill(64)(10.0 * rnd.nextGaussian()))
    val dirs = Array.fill(16)(Array.fill(64)(rnd.nextGaussian()))
    def plus(a: Array[Double], b: Array[Double], s: Double) =
      a.zip(b).map { case (x, y) => x + s * y }
    val rows = (0 until 16).map(i => (i.toLong, centers(i))) ++
      (16 until 32).map(i => (i.toLong, plus(centers(i % 16), dirs(i - 16), 1.0))) ++
      (32 until 1200).map { id =>
        (id.toLong, plus(centers(rnd.nextInt(16)), dirs(rnd.nextInt(16)),
          0.8 + 0.4 * rnd.nextDouble()))
      }
    val v = rows.toDF("vec_id", "e")
      .withColumn("nrm", graft.functions.VecFns.l2norm(col("e")))
    val qs = v.filter(col("vec_id") % 4 === 0 && col("vec_id") >= 32)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
    def neighbors(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.filter(col("rnk") <= 5).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val exact = neighbors(operators.Similarity.annBruteforceFor(v, qs))
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val approx = neighbors(df)
      val scores = exact.map { case (q, truth) =>
        approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }
      scores.sum / scores.size
    }
    val rRaw = recall(operators.Similarity.annIvfPqFor(v, qs, residual = false))
    val rRes = recall(operators.Similarity.annIvfPqFor(v, qs, residual = true))
    info(f"recall@5 on clustered vectors: raw-coded=$rRaw%.3f residual-coded=$rRes%.3f")
    rRes should be > rRaw
  }

  it should "show the trained IVF codebook beating first-K seeding on id-ordered clusters" in {
    // Adversarial-but-realistic fixture for coarse-codebook training
    // (round 14): vec_ids CORRELATED with cluster — ids 0..39 all drawn
    // from cluster 0, the shape a sorted/partitioned ingest produces.
    // First-K seeding then picks K near-parallel vectors as centroids
    // (cell boundaries are cosine noise; probing 4 cells recovers a
    // near-random corpus slice), while two spherical-Lloyd rounds over
    // the hash-stratified sample (id-independent by construction) pull
    // the centroids onto the actual cluster directions. Same K, same
    // nprobe, same serving pipeline — only the codebook differs.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    graft.plans.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(11)
    // center scale vs jitter chosen so within-cluster spread is wide
    // enough that near-parallel noise centroids CANNOT assign a
    // cluster's members consistently (tight clusters hide bad seeding:
    // near-duplicate vectors land in the same noise cell as their
    // query and recall stays high no matter the codebook)
    val centers = Array.fill(16)(Array.fill(64)(4.0 * rnd.nextGaussian()))
    def near(c: Array[Double]) = c.map(x => x + 2.0 * rnd.nextGaussian())
    val rows = (0 until 40).map(id => (id.toLong, near(centers(0)))) ++
      (40 until 1240).map(id => (id.toLong, near(centers(id % 16))))
    val v = rows.toDF("vec_id", "e")
      .withColumn("nrm", graft.functions.VecFns.l2norm(col("e")))
    val qs = v.filter(col("vec_id") % 7 === 3 && col("vec_id") >= 40)
      .select(col("vec_id").as("query_id"), col("e").as("qe"), col("nrm").as("qn"))
    def neighbors(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.filter(col("rnk") <= 5).collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val exact = neighbors(operators.Similarity.annBruteforceFor(v, qs))
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val approx = neighbors(df)
      val scores = exact.map { case (q, truth) =>
        approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
      }
      scores.sum / scores.size
    }
    val rSeeded = recall(operators.Similarity.annIvfSqrtFor(v, qs))
    val rTrained = recall(operators.Similarity.annIvfTrainedFor(v, qs))
    info(f"recall@5 on id-ordered clusters: first-K=$rSeeded%.3f trained=$rTrained%.3f")
    // measured 0.758 vs 0.998 on this seed — pin a wide margin so the
    // assertion survives fixture noise but a training regression cannot
    rTrained should be > (rSeeded + 0.15)
    // the IVF-PQ composition inherits the same uplift: identical
    // pipeline, residual coding and re-rank, only the coarse book swaps
    val rPqSeeded = recall(operators.Similarity.annIvfPqFor(v, qs,
      residual = true, nCells = operators.Similarity.sqrtCells(1240), twoLevel = true))
    val rPqTrained = recall(operators.Similarity.annIvfPqTrainedFor(v, qs))
    info(f"IVF-PQ recall@5 on id-ordered clusters: first-K=$rPqSeeded%.3f trained=$rPqTrained%.3f")
    rPqTrained should be > rPqSeeded
  }

  it should "keep two-level coarse assignment in near-exact agreement with one-level" in {
    // Assignment-quality pin for assignCells' twoLevel rule (round 13,
    // r12 verdict item 1): on a clustered corpus — the shape IVF indexes
    // exist for — the two-level build must (a) assign EVERY vector the
    // one-level rule assigns (no coverage loss from probing), and (b)
    // agree with the exact argmax on ≥90% of vectors (a point near a
    // center scores that center's parent super-cell about as well as the
    // center does, so the true cell's parent is nearly always probed).
    // K = 64 exercises a real two-level split (8 super-cells, 8 children
    // each) rather than the degenerate √16 = 4 case.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    graft.plans.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(31)
    val k = 64
    val centers = Array.fill(k)(Array.fill(64)(10.0 * rnd.nextGaussian()))
    def plus(a: Array[Double], b: Array[Double], s: Double) =
      a.zip(b).map { case (x, y) => x + s * y }
    val rows = (0 until k).map(i => (i.toLong, centers(i))) ++
      (k until 2000).map { id =>
        (id.toLong, plus(centers(rnd.nextInt(k)),
          Array.fill(64)(rnd.nextGaussian()), 0.5))
      }
    val v = rows.toDF("vec_id", "e")
      .withColumn("nrm", graft.functions.VecFns.l2norm(col("e")))
    val cents = v.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("e").as("ce"), col("nrm").as("cn"))
    def cells(twoLevel: Boolean): Map[Long, Long] =
      operators.Similarity.assignCells(v, cents, k, twoLevel, carry = Nil)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val one = cells(twoLevel = false)
    val two = cells(twoLevel = true)
    two.keySet shouldBe one.keySet // every vector assigned under both rules
    val agree = one.count { case (id, c) => two(id) == c }.toDouble / one.size
    info(f"two-level vs one-level assignment agreement: $agree%.4f over ${one.size} vectors")
    agree should be >= 0.9
    // the centers themselves must assign exactly (cos(c, c) = 1 wins and
    // c's own parent is always probed — the construction's fixed point)
    (0 until k).foreach { i => two(i.toLong) shouldBe i.toLong }
  }

  it should "reject invalid PQ codes through the CODEGEN path too" in {
    // the generated-Java bounds guards are a hand-written twin of the
    // interpreted ones — drive them through a real whole-stage-codegen
    // projection, not just nullSafeEval
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    val bad = Seq((Array.fill(32)(0.0), Array(0L, 1L, 2L, 9L))).toDF("lut", "codes") // k=8, code 9
    val exCode = intercept[Throwable](bad.selectExpr("graft_pq_score(lut, codes) AS s").collect())
    messages(exCode).exists(_.contains("graft_pq_score")) shouldBe true
    val misshaped = Seq((Array.fill(30)(0.0), Array(0L, 1L, 2L, 3L))).toDF("lut", "codes")
    val exShape = intercept[Throwable](misshaped.selectExpr("graft_pq_score(lut, codes) AS s").collect())
    messages(exShape).exists(_.contains("graft_pq_score")) shouldBe true
    // and the happy path produces the fold the property spec pins
    Seq((Array.tabulate(32)(_.toDouble), Array(0L, 7L, 3L, 1L))).toDF("lut", "codes")
      .selectExpr("graft_pq_score(lut, codes) AS s")
      .collect()(0).getDouble(0) shouldBe (0.0 + 15.0 + 19.0 + 25.0)
  }

  it should "assign every event to exactly one session" in {
    import org.apache.spark.sql.functions._
    val sessions = operators.EventAnalytics.evSessions(spark, sf)
    val total = sessions.agg(sum("n_events")).collect()(0).getLong(0)
    total shouldBe Tables.events(spark, sf).count()
  }

  it should "score surprisal consistently with its own perplexity" in {
    val rows = operators.TextAnalysis.taSurprisal(spark, sf).collect()
    rows.length shouldBe Tables.documents(spark, sf).count()
    rows.foreach { r =>
      val (nll, ppl) = (r.getAs[Double]("avg_nll"), r.getAs[Double]("ppl"))
      nll should be > 0.0 // MLE probabilities are < 1 whenever vocab > 1
      ppl shouldBe math.exp(nll) +- 1e-4 // ppl = exp(avg_nll), both 6-dp rounded
    }
  }

  it should "fit a negative Zipf slope with a consistent token total" in {
    import org.apache.spark.sql.functions._
    val z = operators.TextAnalysis.taZipf(spark, sf).collect()(0)
    z.getAs[Double]("zipf_slope") should be < 0.0 // frequency falls with rank
    z.getAs[Long]("top_freq") should be > 0L
    // token total must agree with the per-source vocab report's total
    val vocabTotal = operators.TextAnalysis.taVocab(spark, sf)
      .agg(sum("n_tokens")).collect()(0).getLong(0)
    z.getAs[Long]("n_tokens") shouldBe vocabTotal
  }

  it should "honor same-timestamp stage ties in the funnel and as-of join" in {
    // Both ops ride one window ordered by (ts, stage-rank, event_id); these
    // fixtures pin the tie semantics that order encodes: an equal-timestamp
    // upstream event qualifies (ts >= is inclusive), an out-of-order click
    // does not, and among same-ts views the max event_id is the dedup winner.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tie").toString
    def ns(sec: Long) = sec * 1000000000L // Tables.events expects nanos
    Seq(
      (1L, ns(100), 1L, "view"), // user 1: full funnel, all three at t=100
      (2L, ns(100), 1L, "click"),
      (3L, ns(100), 1L, "purchase"),
      (4L, ns(50), 2L, "click"), // user 2: click BEFORE the first view
      (5L, ns(60), 2L, "view"),
      (6L, ns(10), 3L, "view"), // user 3: duplicate same-ts views, then
      (7L, ns(10), 3L, "view"), //   a same-ts click and a later purchase
      (8L, ns(10), 3L, "click"),
      (9L, ns(20), 3L, "purchase")
    ).toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val funnel = operators.Joins.evFunnel(spark, dir).collect()(0)
    funnel.getAs[Long]("n_viewed") shouldBe 3
    funnel.getAs[Long]("n_clicked_after") shouldBe 2 // users 1, 3 — not 2
    funnel.getAs[Long]("n_purchased_after") shouldBe 2
    val asof = operators.Joins.evAsofJoin(spark, dir).collect()
      .map(r => r.getAs[Long]("event_id") -> r).toMap
    asof(2L).getAs[Long]("last_view_id") shouldBe 1L // same-ts view visible
    asof(4L).isNullAt(asof(4L).fieldIndex("last_view_id")) shouldBe true
    asof(8L).getAs[Long]("last_view_id") shouldBe 7L // max id wins the tie
  }

  it should "time the funnel for exactly the purchase-stage converters" in {
    val funnel = operators.Joins.evFunnel(spark, sf).collect()(0)
    val timing = operators.Joins.evFunnelTiming(spark, sf).collect()(0)
    timing.getAs[Long]("n_converters") shouldBe funnel.getAs[Long]("n_purchased_after")
    if (timing.getAs[Long]("n_converters") > 0) {
      timing.getAs[Double]("p50_total_s") should be <= timing.getAs[Double]("p90_total_s")
      // end-to-end latency is the sum of the stage latencies per user, so
      // its median is bounded by the stage p90s only loosely — pin just
      // non-negativity and ordering per stage
      timing.getAs[Double]("p50_view_click_s") should be >= 0.0
      timing.getAs[Double]("p50_click_purchase_s") should be >= 0.0
    }
  }

  it should "bound silhouette scores and cover every cluster" in {
    import org.apache.spark.sql.functions._
    val sil = operators.Clustering.clSilhouette(spark, sf).collect()
    sil.foreach { r =>
      val sc = r.getAs[Double]("silhouette")
      sc should be >= -1.0
      sc should be <= 1.0
    }
    // every assigned cluster appears, with matching populations
    val pops = operators.Clustering.clKmeans(spark, sf)
      .groupBy(col("cluster")).count().collect()
      .map(r => r.getAs[Long]("cluster") -> r.getAs[Long]("count")).toMap
    sil.map(r => r.getAs[Long]("cluster") -> r.getAs[Long]("n")).toMap shouldBe pops
  }

  it should "bound cross-source containment and orient the pairs" in {
    val m = operators.Dedup.ddCrossSource(spark, sf).collect()
    m.foreach { r =>
      r.getAs[String]("src_a") should be < r.getAs[String]("src_b")
      val c = r.getAs[Double]("containment")
      c should be > 0.0
      c should be <= 1.0
      r.getAs[Long]("n_shared") should be > 0L
    }
  }

  it should "find exactly the brute-force J>=0.9 pairs via prefix filtering" in {
    // the PPJoin exactness contract: prefix filtering may generate extra
    // CANDIDATES but must lose no true pair and verify must kill every
    // false one — the result set equals an O(n²) scan's, pair for pair
    import graft.functions.TextFns.{shingles3, tokens}
    import org.apache.spark.sql.functions.{size => asize, _}
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), tokens(col("text")).as("tk0"))
      .select(col("doc_id"), array_distinct(shingles3(col("tk0"))).as("tk"))
      .filter(asize(col("tk")) >= 1)
    val brute = docs.select(col("doc_id").as("id_a"), col("tk").as("tk_a"))
      .crossJoin(docs.select(col("doc_id").as("id_b"), col("tk").as("tk_b")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("n_common", asize(array_intersect(col("tk_a"), col("tk_b"))).cast("long"))
      .withColumn("n_union",
        asize(col("tk_a")).cast("long") + asize(col("tk_b")).cast("long") - col("n_common"))
      .filter(lit(10) * col("n_common") >= lit(9) * col("n_union"))
      .select(col("id_a"), col("id_b"), col("n_common"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pp = operators.Dedup.ddPpjoin(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("n_common")))
      .toSet
    pp shouldBe brute
    pp.nonEmpty shouldBe true
  }

  behavior of "stats + value operators"

  it should "agree with Spark's built-in moments within 1e-6" in {
    import org.apache.spark.sql.functions._
    // the exact-power-sum formulation must reproduce var_pop/skewness/
    // kurtosis (Spark's skewness/kurtosis are the same population
    // definitions) up to double noise far inside the 6-dp pin
    val builtin = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(var_pop("l_quantity").as("v"), skewness("l_quantity").as("s"),
        kurtosis("l_quantity").as("k"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    operators.StatsOps.qMoments(spark, sf).collect().foreach { r =>
      val (v, s, k) = builtin(r.getAs[String]("l_returnflag"))
      r.getAs[Double]("var_pop") shouldBe v +- 1e-6
      r.getAs[Double]("skewness") shouldBe s +- 1e-6
      r.getAs[Double]("kurtosis") shouldBe k +- 1e-6
    }
  }

  it should "agree with Spark's regr_* aggregates within 1e-6" in {
    import org.apache.spark.sql.functions._
    val builtin = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(expr("regr_slope(l_extendedprice, l_quantity)").as("sl"),
        expr("regr_intercept(l_extendedprice, l_quantity)").as("ic"),
        expr("regr_r2(l_extendedprice, l_quantity)").as("r2"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    operators.StatsOps.qRegr(spark, sf).collect().foreach { r =>
      val (sl, ic, r2) = builtin(r.getAs[String]("l_returnflag"))
      r.getAs[Double]("slope") shouldBe sl +- 1e-6
      r.getAs[Double]("intercept") shouldBe ic +- 1e-6
      r.getAs[Double]("r2") shouldBe r2 +- 1e-6
    }
  }

  it should "pick a true per-month argmax in q_mode" in {
    import org.apache.spark.sql.functions._
    val census = Tables.orders(spark, sf)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).max).toMap
    val rows = operators.StatsOps.qMode(spark, sf).collect()
    rows.length shouldBe census.size
    rows.foreach { r =>
      r.getAs[Long]("n_orders") shouldBe census(r.getAs[String]("month"))
    }
  }

  it should "satisfy the bitwise-fold identities in q_bit_agg" in {
    operators.StatsOps.qBitAgg(spark, sf).collect().foreach { r =>
      val (a, o) = (r.getAs[Long]("pk_and"), r.getAs[Long]("pk_or"))
      (a & o) shouldBe a // AND-fold is a subset of the OR-fold bits
      r.getAs[Boolean]("all_positive_qty") shouldBe true
    }
  }

  it should "count islands consistently with the raw id sequence" in {
    import org.apache.spark.sql.functions._
    // census: an island starts wherever the previous same-type id is not
    // id-1 — the window-free definition of the same partition
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("event_id")
    val census = Tables.events(spark, sf)
      .withColumn("prev", lag(col("event_id"), 1).over(w))
      .withColumn("start", col("prev").isNull || col("prev") =!= col("event_id") - 1)
      .groupBy("event_type").agg(sum(col("start").cast("long")).as("n"), count(lit(1)).as("total"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    operators.StatsOps.qGapsIslands(spark, sf).collect().foreach { r =>
      val (n, total) = census(r.getAs[String]("event_type"))
      r.getAs[Long]("n_islands") shouldBe n
      r.getAs[Long]("max_len") should be <= total
    }
  }

  it should "account every purchase exactly once in ev_attribution" in {
    import org.apache.spark.sql.functions._
    val rows = operators.EventValue.evAttribution(spark, sf).collect()
    rows.map(_.getAs[String]("touch_type")).toSet.subsetOf(Set("view", "click", "none")) shouldBe true
    rows.map(_.getAs[Long]("n_purchases")).sum shouldBe
      Tables.events(spark, sf).filter(col("event_type") === "purchase").count()
  }

  it should "cover every token of every doc exactly in pipe_chunk" in {
    import org.apache.spark.sql.functions._
    val nTok = Tables.documents(spark, sf)
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(graft.functions.TextFns.tokens(col("text")))
          .cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chunks = operators.Pipeline.pipeChunk(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    chunks.keySet shouldBe nTok.keySet // every doc chunks, even short ones
    chunks.foreach { case (id, cs) =>
      val sorted = cs.sortBy(_.getAs[Long]("chunk_idx"))
      sorted.head.getAs[Long]("tok_start") shouldBe 0L
      // strides advance uniformly and the final chunk ends at n_tokens
      sorted.foreach { c =>
        c.getAs[Long]("tok_start") shouldBe
          c.getAs[Long]("chunk_idx") * operators.Pipeline.ChunkStride
      }
      val lastRow = sorted.last
      lastRow.getAs[Long]("tok_start") + lastRow.getAs[Long]("n_chunk_tokens") shouldBe nTok(id)
      // every non-final chunk is full-width
      sorted.init.foreach(_.getAs[Long]("n_chunk_tokens") shouldBe operators.Pipeline.ChunkSize.toLong)
    }
  }

  it should "publish a datacard whose shares sum to 1 and totals tie out" in {
    import org.apache.spark.sql.functions._
    val rows = operators.Pipeline.pipeDatacard(spark, sf).collect()
    rows.map(_.getAs[Double]("token_share")).sum shouldBe 1.0 +- 1e-4
    rows.foreach { r =>
      r.getAs[Long]("n_unique") should be <= r.getAs[Long]("n_docs")
      r.getAs[Long]("n_unique") should be > 0L
    }
    rows.map(_.getAs[Long]("n_docs")).sum shouldBe Tables.documents(spark, sf).count()
  }

  it should "reproduce a driver-side bigram LM exactly in ta_bigram_surprisal" in {
    // independent local recomputation: corpus bigram/left-context counts
    // in plain Scala maps, per-doc mean -ln(c12/c1) — the distributed
    // window-sum formulation must agree to double-fold noise
    val toks = Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.TextFns.tokens(org.apache.spark.sql.functions.col("text")).as("tk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toVector).toMap
    val c12 = scala.collection.mutable.Map.empty[(String, String), Long]
    val c1 = scala.collection.mutable.Map.empty[String, Long]
    toks.values.foreach(tk => tk.sliding(2).filter(_.size == 2).foreach { p =>
      c12((p(0), p(1))) = c12.getOrElse((p(0), p(1)), 0L) + 1
      c1(p(0)) = c1.getOrElse(p(0), 0L) + 1
    })
    val expected = toks.collect { case (id, tk) if tk.size >= 2 =>
      val nll = tk.sliding(2).filter(_.size == 2)
        .map(p => math.log(c1(p(0)).toDouble) - math.log(c12((p(0), p(1))).toDouble)).sum
      id -> nll / (tk.size - 1)
    }
    val got = operators.TextAnalysis.taBigramSurprisal(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_nll2"))).toMap
    got.keySet shouldBe expected.keySet
    expected.foreach { case (id, nll) =>
      got(id)._1 shouldBe (toks(id).size - 1).toLong
      got(id)._2 shouldBe nll +- 1e-5
    }
  }

  it should "verify exactly the LSH candidate set with edit distances in dd_edit_pairs" in {
    val pairs = operators.Dedup.ddEditPairs(spark, sf).collect()
    val lshSet = operators.Dedup.ddLshPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet shouldBe lshSet
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    pairs.foreach { r =>
      val (lev, maxLen) = (r.getAs[Long]("lev"), r.getAs[Long]("max_len"))
      lev should be <= maxLen // distance never exceeds the longer doc
      // lev == 0 exactly when the raw texts are identical
      (lev == 0L) shouldBe
        (texts(r.getAs[Long]("doc_a")) == texts(r.getAs[Long]("doc_b")))
      r.getAs[Boolean]("is_near") shouldBe (10 * lev <= 3 * maxLen)
    }
  }

  it should "navigate to the true first/last/second orders per customer" in {
    import org.apache.spark.sql.functions._
    val hist = Tables.orders(spark, sf)
      .select(col("o_custkey"), unix_micros(col("o_orderdate").cast("timestamp")).as("d_us"),
        col("o_orderkey"), col("o_totalprice"))
      .collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(r =>
        (r.getLong(1), r.getLong(2))).map(_.getDouble(3)).toVector).toMap
    val rows = operators.RelationalExt.qWindowFirstLast(spark, sf).collect()
    rows.length shouldBe hist.size
    rows.foreach { r =>
      val h = hist(r.getAs[Long]("o_custkey"))
      r.getAs[Long]("n_orders") shouldBe h.size.toLong
      r.getAs[Double]("first_price") shouldBe h.head
      r.getAs[Double]("last_price") shouldBe h.last
      if (h.size >= 2) r.getAs[Double]("second_price") shouldBe h(1)
      else r.isNullAt(r.fieldIndex("second_price")) shouldBe true
    }
  }

  it should "profile each column identically to per-column scans" in {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, sf)
    val rows = operators.StatsOps.qProfile(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    rows.keySet shouldBe Set("l_returnflag", "l_linestatus", "l_shipdate", "l_quantity", "l_suppkey")
    val n = li.count()
    rows.values.foreach(_.getAs[Long]("n_rows") shouldBe n)
    Seq("l_returnflag", "l_linestatus", "l_shipdate", "l_quantity", "l_suppkey").foreach { c =>
      rows(c).getAs[Long]("n_distinct") shouldBe
        li.select(countDistinct(col(c))).collect()(0).getLong(0)
    }
    rows("l_quantity").getAs[String]("min_val") shouldBe "1"
    rows("l_returnflag").getAs[String]("min_val") shouldBe "A"
  }

  it should "backtest the seasonal forecast over exactly the 20% test span" in {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 3600000000").as("h"), col("event_type"))
    val (h0, h1) = ev.agg(min("h"), max("h")).collect()(0) match {
      case r => (r.getLong(0), r.getLong(1))
    }
    val split = h0 + ((h1 - h0 + 1) * 8) / 10
    val testHours = h1 - split + 1
    val rows = operators.EventValue.evForecast(spark, sf).collect()
    rows.length shouldBe ev.select("event_type").distinct().count().toInt
    rows.foreach { r =>
      r.getAs[Long]("n_test_hours") shouldBe testHours // densified: every hour scored
      // MAE dominates |bias| (triangle inequality), both finite
      r.getAs[Double]("mae") should be >= math.abs(r.getAs[Double]("bias")) - 1e-9
    }
    // per-type actuals tie out against a direct census of the test span
    val census = ev.filter(col("h") >= split).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      r.getAs[Long]("total_actual") shouldBe census.getOrElse(r.getAs[String]("event_type"), 0L)
    }
  }

  it should "conserve session-hours in ev_concurrency" in {
    import org.apache.spark.sql.functions._
    val rows = operators.EventValue.evConcurrency(spark, sf).collect()
    rows.foreach { r =>
      r.getAs[Long]("n_active") should be >= r.getAs[Long]("n_users")
      r.getAs[Long]("n_users") should be >= 1L
    }
    // Σ hourly actives == Σ over sessions of hours touched (independent census)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("us", "event_id")
    val sessHours = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("prev", lag(col("us"), 1).over(w))
      .withColumn("ns", (col("prev").isNull || col("us") - col("prev") > 1800000000L).cast("int"))
      .withColumn("sid", sum("ns").over(w.rowsBetween(Long.MinValue, 0)))
      .groupBy("user_id", "sid")
      .agg((expr("max(us) div 3600000000") - expr("min(us) div 3600000000") + 1).as("hrs"))
      .agg(sum("hrs")).collect()(0).getLong(0)
    rows.map(_.getAs[Long]("n_active")).sum shouldBe sessHours
  }

  it should "grow monotonically to the exact distinct-user total in ev_cumulative_users" in {
    import org.apache.spark.sql.functions._
    val rows = operators.EventValue.evCumulativeUsers(spark, sf).collect()
    val cums = rows.map(_.getAs[Long]("n_cumulative"))
    cums.toSeq shouldBe cums.sorted // monotone by construction
    cums.last shouldBe Tables.events(spark, sf)
      .select(countDistinct("user_id")).collect()(0).getLong(0)
    rows.map(_.getAs[Long]("n_new_users")).sum shouldBe cums.last
  }

  it should "tie shard balance and modality mix out against the manifest" in {
    import org.apache.spark.sql.functions._
    val bal = operators.Multimodal.mmShardBalance(spark, sf).collect()
    val manifest = operators.Multimodal.mmManifest(spark, sf)
      .groupBy("shard").agg(count(lit(1)).as("n"), sum("n_bytes").as("b"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    bal.foreach { r =>
      val (n, b) = manifest(r.getAs[Long]("shard"))
      r.getAs[Long]("n_records") shouldBe n
      r.getAs[Long]("shard_bytes") shouldBe b
      r.getAs[Double]("balance_ratio") should be > 0.0
    }
    // mean of balance ratios ≈ 1 by construction
    (bal.map(_.getAs[Double]("balance_ratio")).sum / bal.length) shouldBe 1.0 +- 0.01
    val mix = operators.Multimodal.mmModalityMix(spark, sf).collect()
    mix.map(_.getAs[Double]("byte_share")).sum shouldBe 1.0 +- 1e-4
    mix.map(_.getAs[Long]("n_records")).sum shouldBe Tables.documents(spark, sf).count()
  }

  it should "agree with a driver-side Pearson computation in ev_ts_similarity" in {
    import org.apache.spark.sql.functions._
    val counts = Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 3600000000").as("h"), col("event_type"))
      .groupBy("event_type", "h").count().collect()
      .groupBy(_.getString(0)).view
      .mapValues(_.map(r => r.getLong(1) -> r.getLong(2)).toMap).toMap
    val hs = counts.values.flatMap(_.keys)
    val (h0, h1) = (hs.min, hs.max)
    def series(t: String): Seq[Double] =
      (h0 to h1).map(h => counts(t).getOrElse(h, 0L).toDouble)
    def pearson(a: Seq[Double], b: Seq[Double]): Double = {
      val n = a.size.toDouble
      val (sa, sb) = (a.sum, b.sum)
      val saa = a.map(x => x * x).sum; val sbb = b.map(x => x * x).sum
      val sab = a.zip(b).map { case (x, y) => x * y }.sum
      (n * sab - sa * sb) / (math.sqrt(n * saa - sa * sa) * math.sqrt(n * sbb - sb * sb))
    }
    operators.EventValue.evTsSimilarity(spark, sf).collect().foreach { r =>
      val expected = pearson(series(r.getAs[String]("type_a")), series(r.getAs[String]("type_b")))
      r.getAs[Double]("corr") shouldBe expected +- 1e-5
      r.getAs[Long]("n") shouldBe (h1 - h0 + 1)
    }
  }

  it should "tie the dedup cascade out against its own stages" in {
    val r = operators.Dedup.ddCascade(spark, sf).collect()(0)
    val (nRaw, nExact, nNorm, nNear) = (r.getAs[Long]("n_raw"), r.getAs[Long]("n_exact"),
      r.getAs[Long]("n_norm"), r.getAs[Long]("n_neardup"))
    nRaw shouldBe Tables.documents(spark, sf).count()
    nExact shouldBe operators.Dedup.ddExact(spark, sf).count()
    nNorm shouldBe operators.Dedup.ddExactNorm(spark, sf).count()
    nNear shouldBe operators.Dedup.ddDupGroups(spark, sf)
      .select("cluster_rep").distinct().count()
    // the cascade only ever shrinks: raw ≥ exact ≥ norm; near-dup ≤ exact
    nRaw should be >= nExact
    nExact should be >= nNorm
    nNear should be <= nExact
  }

  it should "partition every user into one RFM segment with scores in 1..5" in {
    import org.apache.spark.sql.functions._
    val rows = operators.EventValue.evRfm(spark, sf).collect()
    rows.map(_.getAs[Long]("n_users")).sum shouldBe
      Tables.events(spark, sf).select(countDistinct("user_id")).collect()(0).getLong(0)
    rows.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        r.getAs[Long](c) should (be >= 1L and be <= 5L)
      }
    }
  }

  it should "match a brute-force ranked Gini per event type" in {
    // independent derivation: per-user counts collected, ranked ascending,
    // G = 2·Σ i·x_i / (n·Σx) − (n+1)/n — the textbook formula the grouped
    // histogram identity in evGini must reproduce exactly
    val got = operators.EventValue.evGini(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_users"),
        r.getAs[Long]("n_events"), r.getAs[Double]("gini")))).toMap
    val perUser = Tables.events(spark, sf)
      .filter("user_id is not null and event_type is not null")
      .groupBy("event_type", "user_id").count().collect()
      .map(r => (r.getString(0), r.getLong(2)))
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sorted }
    got.keySet shouldBe perUser.keySet
    perUser.foreach { case (t, xs) =>
      val n = xs.length.toLong
      val tot = xs.sum
      val s = xs.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
      val gini = 2.0 * s / (n.toDouble * tot.toDouble) - (n + 1).toDouble / n
      val (gotN, gotT, gotG) = got(t)
      withClue(s"type $t: ") {
        gotN shouldBe n
        gotT shouldBe tot
        gotG shouldBe (math.floor(gini * 1e6 + 0.5) / 1e6 +- 1e-6)
        gotG should (be >= 0.0 and be < 1.0)
      }
    }
  }

  it should "match brute-force DSIR importance weights and exclude the target source" in {
    def toks(t: String): Array[String] = t.split("\\s+").filter(_.nonEmpty)
    def bucket(f: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(f.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % operators.TextCorpus.DsirBuckets
    }
    val docs = Tables.documents(spark, sf)
      .filter("text is not null and source is not null").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        toks(r.getAs[String]("text"))))
      .filter(_._3.nonEmpty)
    val target = docs.map(_._2).min
    def feats(tk: Array[String]): Array[Long] =
      (tk ++ tk.sliding(2).filter(_.length == 2).map(_.mkString(" "))).map(bucket)
    val B = operators.TextCorpus.DsirBuckets
    val tCnt = docs.filter(_._2 == target).flatMap(d => feats(d._3))
      .groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
    val rCnt = docs.filter(_._2 != target).flatMap(d => feats(d._3))
      .groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
    val (tn, rn) = (tCnt.values.sum, rCnt.values.sum)
    def logr(b: Long): Double = math.log(
      ((tCnt.getOrElse(b, 0L) + 1).toDouble / (tn + B)) /
        ((rCnt.getOrElse(b, 0L) + 1).toDouble / (rn + B)))
    val got = operators.TextCorpus.taDsir(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("source"), r.getAs[Long]("n_feats"), r.getAs[Double]("logw"))))
      .toMap
    got.values.map(_._1) should not contain target
    val expected = docs.filter(_._2 != target).map { case (id, src, tk) =>
      val fs = feats(tk)
      id -> ((src, fs.length.toLong, fs.map(logr).sum))
    }.toMap
    got.keySet shouldBe expected.keySet
    expected.foreach { case (id, (src, nf, lw)) =>
      val (gSrc, gNf, gLw) = got(id)
      withClue(s"doc $id: ") {
        gSrc shouldBe src
        gNf shouldBe nf
        // Spark folds the per-bucket log ratios in decimal; the Scala sum
        // is plain double — agreement to well inside the 6-dp rounding
        gLw shouldBe (lw +- 1e-5)
      }
    }
  }

  it should "tie the ANN recall card out against its own audited pipelines" in {
    import org.apache.spark.sql.functions.col
    val card = operators.Similarity.annRecallCard(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    // round 14: the two √N serving schedules audit side by side with
    // the fixed-K pipelines, so the trained-codebook uplift is a card
    // number — every method row ties out against its own pipeline
    card.keySet shouldBe Set("graph", "ivf", "ivf_sqrt", "ivf_trained", "lsh")
    val truth = operators.Similarity.annBruteforce(spark, sf)
      .filter(col("rnk") <= 5).select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nQueries = truth.map(_._1).size.toLong
    Seq("graph" -> operators.Similarity.annBeam(spark, sf),
      "ivf" -> operators.Similarity.annIvf(spark, sf),
      "ivf_sqrt" -> operators.Similarity.annIvfSqrt(spark, sf),
      "ivf_trained" -> operators.Similarity.annIvfTrained(spark, sf),
      "lsh" -> operators.Similarity.annLsh(spark, sf)).foreach { case (m, df) =>
      val pairs = df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val hits = pairs.count(truth.contains)
      val r = card(m)
      withClue(s"method $m: ") {
        r.getAs[Long]("n_queries") shouldBe nQueries
        r.getAs[Long]("n_cand") shouldBe pairs.length.toLong
        r.getAs[Long]("n_hits") shouldBe hits.toLong
        r.getAs[Double]("recall_at_5") shouldBe
          (math.floor(hits / (5.0 * nQueries) * 1e6 + 0.5) / 1e6 +- 1e-9)
      }
    }
  }

  it should "serve beam-search results that are exact-cosine-consistent and graph-reachable" in {
    import org.apache.spark.sql.functions.col
    val S = operators.Similarity
    val beam = S.annBeam(spark, sf).collect()
    beam.nonEmpty shouldBe true
    // per query: ranks are 1..k (k <= 5), neighbors distinct, no self hits
    beam.groupBy(_.getAs[Long]("query_id")).foreach { case (qid, rows) =>
      withClue(s"query $qid: ") {
        rows.map(_.getAs[Long]("rnk")).sorted.toSeq shouldBe
          (1L to rows.length.toLong)
        rows.map(_.getAs[Long]("neighbor_id")).distinct.length shouldBe rows.length
        rows.foreach(_.getAs[Long]("neighbor_id") should not be qid)
        // ranked by descending rounded cos (raw-cos ordering implies it)
        rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("cos")).toSeq
          .sliding(2).foreach { w => if (w.length == 2) w(0) should be >= w(1) }
      }
    }
    // every served neighbor is REACHABLE: within BeamRounds+1 hops of an
    // entry point through the graph (entries themselves count as hop 0)
    val graph = S.nnDescentGraph(spark, sf).select("src", "nb").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    // driver-side replay of the indexable-vector rule (non-null, nrm > 0)
    val vecs: Map[Long, (Seq[Double], Double)] =
      Tables.embeddings(spark, sf).select("vec_id", "embedding")
        .filter(col("embedding").isNotNull).collect()
        .map { r =>
          val e: Seq[Double] = r.getSeq[Float](1).map(_.toDouble)
          r.getLong(0) -> ((e, math.sqrt(e.foldLeft(0.0)((a, x) => a + x * x))))
        }.filter(_._2._2 > 0).toMap
    val entries = vecs.keys.toSeq.sorted.take(S.BeamEntries).toSet
    var reach = entries
    for (_ <- 1 to S.BeamRounds)
      reach = reach ++ reach.flatMap(n => graph.getOrElse(n, Set.empty))
    beam.foreach { r =>
      withClue(s"(${r.getAs[Long]("query_id")}, ${r.getAs[Long]("neighbor_id")}): ") {
        reach should contain(r.getAs[Long]("neighbor_id"))
      }
    }
    // the reported cosine is the EXACT cosine (beam scores are never
    // approximations): cross-check a sample against the driver
    beam.take(50).foreach { r =>
      val (qe, qn) = vecs(r.getAs[Long]("query_id"))
      val (ne, nn) = vecs(r.getAs[Long]("neighbor_id"))
      val cos = qe.zip(ne).foldLeft(0.0)((a, p) => a + p._1 * p._2) / (qn * nn)
      r.getAs[Double]("cos") shouldBe (math.floor(cos * 1e6 + 0.5) / 1e6 +- 1e-9)
    }
  }

  it should "populate the shingle-strict truth on a shingle-dup corpus, contained in the token truth" in {
    import org.apache.spark.sql.functions.col
    // on the DRIVER corpus the strict row exists but is sparse by
    // design (vocabulary-level near-dups only) and the token row IS
    // ir_eval
    val plain = operators.Retrieval.irEvalStrict(spark, sf).collect()
      .map(r => r.getAs[String]("truth_def") -> r).toMap
    plain.keySet shouldBe Set("shingle", "token")
    val ev = operators.Retrieval.irEval(spark, sf).collect()(0)
    Seq("n_queries", "n_rel", "n_hits").foreach(c =>
      plain("token").getAs[Long](c) shouldBe ev.getAs[Long](c))
    plain("shingle").getAs[Long]("n_queries") should
      be < plain("token").getAs[Long]("n_queries")
    // the ScaleGen truncation corpus makes the shingle truth meaningful
    val dir = java.nio.file.Files.createTempDirectory("graft-shingledup").toString
    graft.tools.ScaleGen.shingleDups(spark, sf, dir, perQuery = 3)
    val strict = operators.Retrieval.irEvalStrict(spark, dir).collect()
      .map(r => r.getAs[String]("truth_def") -> r).toMap
    strict("shingle").getAs[Long]("n_queries") should be >= 8L
    strict("shingle").getAs[Long]("n_hits") should be >= 1L
    // containment: every shingle-truth pair is a token-truth pair
    // (driver-side replay of both definitions over the new corpus)
    val docs = Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        Option(r.getAs[String]("text")).getOrElse(""))
    val tok = docs.map { case (id, t) =>
      id -> t.split("\\s+").filter(_.nonEmpty) }.toMap
    val tokSet = tok.map { case (id, tk) => id -> tk.toSet }
    val shSet = tok.map { case (id, tk) =>
      id -> tk.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet }
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val qids = docs.map(_._1).sortBy(id => (md5hex(id.toString), id)).take(16)
    def truthOf(sets: Map[Long, Set[String]]): Set[(Long, Long)] =
      qids.flatMap { q =>
        val a = sets(q)
        docs.map(_._1).filter { d =>
          val b = sets(d)
          val i = (a & b).size
          d != q && 2 * i >= a.size + b.size - i
        }.map(q -> _)
      }.toSet
    val shTruth = truthOf(shSet)
    val tokTruth = truthOf(tokSet)
    shTruth.nonEmpty shouldBe true
    withClue(s"shingle pairs not in token truth: ${(shTruth -- tokTruth).take(5)}: ") {
      (shTruth -- tokTruth) shouldBe empty
    }
    // and the card's strict row agrees with the replayed truth census
    strict("shingle").getAs[Long]("n_rel") shouldBe shTruth.size.toLong
    strict("shingle").getAs[Long]("n_queries") shouldBe
      shTruth.map(_._1).size.toLong
  }

  it should "report fusion metrics whose bm25 row is exactly ir_eval" in {
    val fusion = operators.Retrieval.irFusion(spark, sf).collect()
      .map(r => r.getAs[String]("method") -> r).toMap
    fusion.keySet shouldBe Set("bm25", "rrf", "vector")
    // the bm25 row IS ir_eval (same top, same truth, same metric block)
    val ev = operators.Retrieval.irEval(spark, sf).collect()(0)
    val bm = fusion("bm25")
    Seq("n_queries", "n_rel", "n_hits").foreach(c =>
      bm.getAs[Long](c) shouldBe ev.getAs[Long](c))
    Seq("precision_at_10", "recall_at_10", "mrr").foreach(c =>
      bm.getAs[Double](c) shouldBe ev.getAs[Double](c))
    // shared truth: every method row evaluates the same queries/truth
    fusion.values.foreach { r =>
      r.getAs[Long]("n_queries") shouldBe ev.getAs[Long]("n_queries")
      r.getAs[Long]("n_rel") shouldBe ev.getAs[Long]("n_rel")
      r.getAs[Long]("n_hits") should be <= 10 * r.getAs[Long]("n_queries")
      Seq("precision_at_10", "recall_at_10", "mrr").foreach(c =>
        r.getAs[Double](c) should (be >= 0.0 and be <= 1.0))
    }
  }

  it should "rank metronomic users as more bot-like than bursty ones" in {
    // the census is oracle-checked for values; this pins the SEMANTICS on
    // a synthetic frame: a metronome (identical gaps) must score cv 0 and
    // sort ahead of a bursty user with the same event count
    import org.apache.spark.sql.functions._
    val sess = spark
    import sess.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(sec: Long) = new java.sql.Timestamp(base.getTime + sec * 1000)
    val bursty = Seq(1L, 2, 3, 4, 100, 101, 102, 5000, 5001, 9000, 9001, 12000)
    val rows =
      bursty.zipWithIndex.map { case (t, i) => (100L + i, at(t), 1L, "view", 1.0, "{}") } ++
        (0 until 12).map(i => (200L + i, at(600L * i), 2L, "view", 1.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("botcensus").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = operators.EventValue.evBotCensus(spark, dir).collect()
    out.map(_.getAs[Long]("user_id")).toSeq shouldBe Seq(2L, 1L)
    val bot = out.find(_.getAs[Long]("user_id") == 2L).get
    bot.getAs[Double]("cv_gap") shouldBe 0.0
    bot.getAs[Double]("mean_gap_s") shouldBe 600.0
    out.find(_.getAs[Long]("user_id") == 1L).get
      .getAs[Double]("cv_gap") should be > 0.5
  }

  it should "keep alpha-sweep shares normalized with alpha=1 proportional and flattening toward the tail" in {
    val rows = operators.Pipeline.pipeAlphaSweep(spark, sf).collect()
      .map(r => (r.getAs[Double]("alpha"), r.getAs[String]("source"),
        r.getAs[Long]("n_tokens"), r.getAs[Double]("raw_share"),
        r.getAs[Double]("temp_share"), r.getAs[Double]("epochs")))
    val byAlpha = rows.groupBy(_._1)
    byAlpha.keySet shouldBe Set(0.25, 0.5, 0.75, 1.0)
    byAlpha.foreach { case (a, rs) =>
      withClue(s"alpha $a: ") {
        // each share floor-rounded at 1e-6: sum within |sources| ulps of 1
        rs.map(_._5).sum shouldBe (1.0 +- rs.length * 1e-6)
        rs.foreach { r =>
          if (r._3 > 0)
            r._6 shouldBe (100000.0 * r._5 / r._3 +- math.max(0.2 / r._3 * 1e5 * 1e-5, 1e-3))
        }
      }
    }
    // alpha = 1 is proportional sampling by definition
    byAlpha(1.0).foreach(r => r._5 shouldBe (r._4 +- 1e-9))
    // temperature flattens: the largest source loses share as alpha drops
    val biggest = rows.maxBy(_._3)._2
    val bySrc = byAlpha.toSeq.sortBy(_._1).map(_._2.find(_._2 == biggest).get._5)
    bySrc shouldBe bySrc.sorted
  }

  behavior of "round-12 additions"

  it should "keep dd_line_trim consistent with the dd_line_dup census and its own cleaned text" in {
    import org.apache.spark.sql.functions._
    val trim = operators.Dedup.ddLineTrim(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val census = operators.Dedup.ddLineDup(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    trim.keySet shouldBe census.keySet
    census.foreach { case (id, c) =>
      val t = trim(id)
      withClue(s"doc $id: ") {
        // trim ≡ census by construction: same segmentation, same dup rule
        t.getAs[Long]("n_lines") shouldBe c.getAs[Long]("n_lines")
        t.getAs[Long]("removed_lines") shouldBe c.getAs[Long]("dup_lines")
        t.getAs[Long]("kept_lines") + t.getAs[Long]("removed_lines") shouldBe
          t.getAs[Long]("n_lines")
        t.getAs[Long]("kept_tokens") + t.getAs[Long]("removed_tokens") shouldBe
          t.getAs[Long]("n_tokens")
      }
    }
    // Re-segmentation closure: a kept segment is ≤ width tokens, so
    // segmenting the cleaned text re-yields EXACTLY the kept lines and
    // kept tokens — the invariant that makes the trimmed corpus safe to
    // feed back through the same census.
    val spark2 = spark
    import spark2.implicits._
    val reseg = trim.values.toSeq
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("cleaned_text")))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        coalesce(org.apache.spark.sql.functions.size(
          graft.functions.TextFns.lineSegments(col("text"),
            operators.Dedup.LineDupWidth)), lit(0)).cast("long").as("n_seg"),
        coalesce(org.apache.spark.sql.functions.size(
          graft.functions.TextFns.tokens(col("text"))), lit(0))
          .cast("long").as("n_tok"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    trim.foreach { case (id, t) =>
      withClue(s"doc $id reseg: ") {
        reseg(id)._1 shouldBe t.getAs[Long]("kept_lines")
        reseg(id)._2 shouldBe t.getAs[Long]("kept_tokens")
      }
    }
  }

  it should "cut exactly the 50-token duplicated spans and tie out against dd_dup_span" in {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-spantrim-op").toString
    // docs 0/1 share a 60-token span (>= SpanTrimTokens: cut) AND a
    // 12-token span (< threshold: kept); doc 2 is untouched
    val big = (1 to 60).map(i => s"big$i").mkString(" ")
    val small = (1 to 12).map(i => s"small$i").mkString(" ")
    def uniq(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    Seq(
      (0L, s"${uniq("a", 10)} $big ${uniq("b", 10)} $small ${uniq("c", 10)}", "en", "src0", 100L),
      (1L, s"${uniq("d", 10)} $big ${uniq("e", 10)} $small ${uniq("f", 10)}", "en", "src0", 100L),
      (2L, uniq("u", 30), "en", "src0", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = operators.Dedup.ddSpanTrim(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    got.keySet shouldBe Set(0L, 1L, 2L) // a trim emits the whole corpus
    Seq(0L -> ("a", "b", "c"), 1L -> ("d", "e", "f")).foreach { case (id, (x, y, z)) =>
      withClue(s"doc $id: ") {
        got(id).getAs[String]("cleaned_text") shouldBe
          s"${uniq(x, 10)} ${uniq(y, 10)} $small ${uniq(z, 10)}"
        got(id).getAs[Long]("removed_tokens") shouldBe 60L
        got(id).getAs[Long]("n_spans_cut") shouldBe 1L
        got(id).getAs[Long]("n_tokens") shouldBe 102L
      }
    }
    got(2L).getAs[String]("cleaned_text") shouldBe uniq("u", 30)
    got(2L).getAs[Long]("removed_tokens") shouldBe 0L
    got(2L).getAs[Long]("n_spans_cut") shouldBe 0L
  }

  it should "lose tokens exactly where dd_dup_span measures a threshold run, and re-trim to a fixpoint" in {
    import org.apache.spark.sql.functions._
    val trim = operators.Dedup.ddSpanTrim(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // the trim emits the whole corpus; ledger balances per doc
    trim.size.toLong shouldBe Tables.documents(spark, sf).count()
    trim.values.foreach { r =>
      r.getAs[Long]("kept_tokens") + r.getAs[Long]("removed_tokens") shouldBe
        r.getAs[Long]("n_tokens")
    }
    // islands tie-out: a doc loses tokens IFF its longest duplicated run
    // reaches the threshold the census measures against
    val census = operators.Dedup.ddDupSpan(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("max_run_tokens")).toMap
    val losers = trim.collect { case (id, r) if r.getAs[Long]("removed_tokens") > 0 => id }.toSet
    val thresholdDocs = census.collect {
      case (id, mx) if mx >= operators.Dedup.SpanTrimTokens => id }.toSet
    losers shouldBe thresholdDocs
    losers.nonEmpty shouldBe true // the sf corpus exercises the cut path
    // every loser removes at least its longest qualifying run's tokens
    losers.foreach { id =>
      trim(id).getAs[Long]("removed_tokens") should be >= census(id)
    }
    // Re-trim closure: running the trim over the CLEANED corpus removes
    // nothing — excising the threshold runs leaves no threshold run
    // (surviving duplicated windows all sit in sub-threshold islands,
    // and no seam across a cut re-creates one on this corpus).
    val spark2 = spark
    import spark2.implicits._
    val dir2 = java.nio.file.Files.createTempDirectory("graft-spantrim-fix").toString
    trim.values.toSeq
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("cleaned_text"),
        "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val second = operators.Dedup.ddSpanTrim(spark, dir2)
      .agg(sum(col("removed_tokens")).as("rm"),
        sum(col("kept_tokens")).as("kp")).collect()(0)
    second.getAs[Long]("rm") shouldBe 0L
    second.getAs[Long]("kp") shouldBe trim.values.map(_.getAs[Long]("kept_tokens")).sum
  }

  it should "tie the post-trim budget card out against dd_line_trim totals" in {
    import org.apache.spark.sql.functions._
    val card = operators.Pipeline.pipeTrimBudget(spark, sf).collect()
    val trim = operators.Dedup.ddLineTrim(spark, sf)
      .agg(sum("n_tokens"), sum("kept_tokens"), sum("removed_tokens"),
        count(lit(1))).collect()(0)
    card.map(_.getAs[Long]("raw_tokens")).sum shouldBe trim.getLong(0)
    card.map(_.getAs[Long]("kept_tokens")).sum shouldBe trim.getLong(1)
    card.map(_.getAs[Long]("removed_tokens")).sum shouldBe trim.getLong(2)
    card.map(_.getAs[Long]("n_docs")).sum shouldBe trim.getLong(3)
    // kept budget shares are floor-rounded at 1e-6: sum within strata ulps of 1
    val shares = card.flatMap(r => Option(r.getAs[java.lang.Double]("kept_budget_share")))
    shares.map(_.toDouble).sum shouldBe (1.0 +- card.length * 1e-6)
    card.foreach { r =>
      r.getAs[Long]("kept_tokens") + r.getAs[Long]("removed_tokens") shouldBe
        r.getAs[Long]("raw_tokens")
    }
  }

  it should "report a coherent IVF health card across both K schedules" in {
    import org.apache.spark.sql.functions._
    val n = Tables.embeddings(spark, sf)
      .filter(col("embedding").isNotNull).count()
    val rows = operators.Similarity.annIvfHealth(spark, sf).collect()
    val bySch = rows.groupBy(_.getAs[String]("scheme"))
    // round 14: the trained √N codebook audits as a third scheme
    bySch.keySet shouldBe Set("fixed16", "sqrtn", "trained")
    bySch("fixed16").length shouldBe 16
    bySch("sqrtn").length shouldBe operators.Similarity.sqrtCells(n)
    bySch("trained").length shouldBe operators.Similarity.sqrtCells(n)
    bySch.foreach { case (sch, rs) =>
      withClue(s"scheme $sch: ") {
        // every vector lands in exactly one cell
        rs.map(_.getAs[Long]("pop")).sum shouldBe n
        rs.map(_.getAs[Long]("n_cells")).distinct shouldBe Seq(rs.length.toLong)
        rs.map(_.getAs[Long]("n_empty")).distinct.length shouldBe 1
        rs.count(_.getAs[Long]("pop") == 0L) shouldBe
          rs.head.getAs[Long]("n_empty")
      }
    }
    // THE serving-path claim the card exists to measure: more cells ⇒
    // fewer balanced candidates per probed query (K grows as √N, so
    // cand_per_query grows as √N instead of N/16)
    val cand = (s: String) => bySch(s).head.getAs[Double]("cand_per_query")
    if (operators.Similarity.sqrtCells(n) > 16) cand("sqrtn") should be < cand("fixed16")
  }

  it should "return well-formed sqrt-N IVF and IVF-PQ neighbors" in {
    import org.apache.spark.sql.functions._
    Seq(operators.Similarity.annIvfSqrt(spark, sf),
        operators.Similarity.annIvfPqSqrt(spark, sf)).foreach { df =>
      df.count() should be > 0L
      df.agg(max("rnk")).collect()(0).getLong(0) should be <= 5L
      df.groupBy("query_id", "rnk").count()
        .filter(col("count") > 1).count() shouldBe 0L
    }
  }

  it should "count every integrity lane exactly on a seeded dirty fixture" in {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("mm-integrity").toString
    // docs 0..9: 0-4 web (2,3 payload-less: null/empty), 5-9 null source;
    // embeddings exist for 0..6 but 1 and 6 are null vectors; 100/101 orphans
    Seq[(Long, String, String)](
      (0L, "alpha text", "web"), (1L, "beta text", "web"), (2L, null, "web"),
      (3L, "", "web"), (4L, "gamma", "web"),
      (5L, "delta", null), (6L, "epsilon", null), (7L, null, null),
      (8L, "zeta", null), (9L, "eta", null))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", coalesce(
        org.apache.spark.sql.functions.length(col("text")).cast("long"), lit(0L)))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val vec = Array.fill(64)(0.5f)
    (Seq[(Long, Option[Array[Float]])]((100L, Some(vec)), (101L, None)) ++
      (0L to 6L).map(i => (i, if (i == 1L || i == 6L) None else Some(vec))))
      .toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = operators.Multimodal.mmIntegrity(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    out.keySet shouldBe Set("web", "(none)")
    val web = out("web"); val none = out("(none)")
    web.getAs[Long]("n_docs") shouldBe 5L
    web.getAs[Long]("n_payload") shouldBe 3L
    web.getAs[Long]("n_missing_payload") shouldBe 2L
    web.getAs[Long]("n_missing_embedding") shouldBe 0L // 0..4 all have rows
    web.getAs[Long]("n_null_embedding") shouldBe 1L // doc 1
    web.getAs[Long]("n_trainable") shouldBe 2L // 0, 4
    none.getAs[Long]("n_docs") shouldBe 5L
    none.getAs[Long]("n_payload") shouldBe 4L
    none.getAs[Long]("n_missing_embedding") shouldBe 3L // 7, 8, 9
    none.getAs[Long]("n_null_embedding") shouldBe 1L // doc 6
    none.getAs[Long]("n_trainable") shouldBe 1L // 5
    out.values.map(_.getAs[Long]("n_orphan_embeddings")).toSet shouldBe Set(2L)
    // the all-dangling corpus: documents wiped, embeddings left behind —
    // the orphan count must stay VISIBLE via the '(no-docs)' sentinel row
    val dir2 = java.nio.file.Files.createTempDirectory("mm-integrity-nodocs").toString
    Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", lit(0L))
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    Seq((100L, vec), (101L, vec)).toDF("vec_id", "embedding")
      .withColumn("label", lit(0))
      .write.mode("overwrite").parquet(s"$dir2/embeddings.parquet")
    val dangling = operators.Multimodal.mmIntegrity(spark, dir2).collect()
    dangling.length shouldBe 1
    dangling.head.getAs[String]("source") shouldBe "(no-docs)"
    dangling.head.getAs[Long]("n_docs") shouldBe 0L
    dangling.head.getAs[Long]("n_orphan_embeddings") shouldBe 2L
  }

  it should "compute the exact tie-corrected AUC on a known-answer fixture" in {
    // pairs: pos {0.9, 0.8, 0.5} vs neg {0.5, 0.3} → wins 5, tie 0.5
    // → U = 5.5, AUC = 5.5 / 6 = 0.91666… (half-up 6-dp → 0.916667)
    val spark2 = spark
    import spark2.implicits._
    val sc = Seq((1L, 0.9), (1L, 0.8), (1L, 0.5), (0L, 0.5), (0L, 0.3))
      .toDF("label", "score")
    val r = operators.QualityClassifier.aucOf(sc).collect()(0)
    r.getAs[Long]("n_pos") shouldBe 3L
    r.getAs[Long]("n_neg") shouldBe 2L
    r.getAs[Double]("auc") shouldBe 0.916667
    // degenerate single-class corpora report NULL, not a division error
    val onePos = Seq((1L, 0.9), (1L, 0.1)).toDF("label", "score")
    operators.QualityClassifier.aucOf(onePos).collect()(0).isNullAt(2) shouldBe true
    // perfect separation → 1.0; anti-separation → 0.0
    val perfect = Seq((1L, 0.9), (1L, 0.8), (0L, 0.2), (0L, 0.1)).toDF("label", "score")
    operators.QualityClassifier.aucOf(perfect).collect()(0).getAs[Double]("auc") shouldBe 1.0
    val inverted = Seq((0L, 0.9), (1L, 0.1)).toDF("label", "score")
    operators.QualityClassifier.aucOf(inverted).collect()(0).getAs[Double]("auc") shouldBe 0.0
  }

  it should "flag 13-gram contamination as a strict refinement of the 3-gram rule" in {
    // round 13 (r12 verdict item 5): a shared 13-gram implies all its
    // constituent 3-grams are shared, so the 13-gram flag set must be a
    // SUBSET of the 3-gram one — and on real data a far smaller one
    // (3-grams are common phrases; the whole point of the published
    // 8–13-gram convention). sf0.1 carries actual cloned boilerplate,
    // so the 13-gram set is non-empty there.
    val sf01 = "/root/testdata/sf0.1"
    val docs = graft.Tables.documents(spark, sf01)
    def pairs(n: Int): Set[(Long, Long)] =
      operators.Dedup.ddDecontaminatePairs(docs, n)
        .select("doc_id", "bench_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val p13 = pairs(13)
    val p3 = pairs(3)
    p13.nonEmpty shouldBe true // the cloned docs ARE flagged
    (p13 -- p3) shouldBe empty // subset relation
    p3.size should be > (10 * p13.size) // and 3-grams over-fire massively
    // the census ties out against the pair view and reports clean bench
    // docs as zeros instead of dropping them
    val census = operators.Dedup.ddDecontaminate(spark, sf01).collect()
      .map(r => r.getAs[Long]("bench_id") -> r).toMap
    val byBench = p13.groupBy(_._2).view.mapValues(_.size).toMap
    census.foreach { case (b, r) =>
      withClue(s"bench $b: ") {
        r.getAs[Long]("n_contam_docs") shouldBe byBench.getOrElse(b, 0).toLong
      }
    }
    byBench.keySet.subsetOf(census.keySet) shouldBe true
    census.values.exists(_.getAs[Long]("n_leaked_grams") == 0L) shouldBe true
    // the ACTION stage ties out against the pair view (round 14): the
    // dropped corpus docs are EXACTLY the pair view's flagged docs, a
    // kept doc never carries contamination counts, and survivors carry
    // a text hash (the oracle hash-checks the cleaned corpus)
    val drop = operators.Dedup.ddDecontaminateDrop(spark, sf01).collect()
    val flagged13 = p13.map(_._1)
    drop.filter(_.getAs[Long]("kept") == 0L).map(_.getAs[Long]("doc_id")).toSet shouldBe flagged13
    val byDoc = p13.groupBy(_._1).view.mapValues(_.map(_._2).toSet.size).toMap
    drop.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      withClue(s"doc $id: ") {
        r.getAs[Long]("n_bench_docs") shouldBe byDoc.getOrElse(id, 0).toLong
        if (r.getAs[Long]("kept") == 1L) {
          r.getAs[Long]("n_shared_grams") shouldBe 0L
          // null text stays null-hashed; any real text hashes
          (r.getAs[String]("text_md5") != null ||
            r.isNullAt(r.fieldIndex("text_md5"))) shouldBe true
        } else r.getAs[String]("text_md5") shouldBe null
      }
    }
  }

  it should "count every manifest defect lane exactly on a seeded dirty manifest" in {
    // the mm_manifest_integrity general form against a hand-corrupted
    // manifest (round 13, r12 verdict item 3): dangling entry, byte-length
    // mismatch, offset break, record-index gap and an unsharded doc, each
    // counted in its own lane; the clean shard reads all-zero
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq[(Long, String)](
      (1L, "aaaa"), (2L, "bb"), (3L, "cccccc"), (4L, null), (5L, null))
      .toDF("doc_id", "text")
    val manifest = Seq[(Long, Long, Option[Long], Long, Long)](
      // shard 0: clean — contiguous offsets, dense rec_idx, true lengths
      (1L, 0L, Some(4L), 1L, 0L), (2L, 0L, Some(2L), 2L, 4L),
      // shard 1: entry for a doc that is GONE (99), then doc 3 with a
      // wrong claimed length (7 vs actual 6), a broken offset (6, the
      // previous entry ends at 5) and a rec_idx gap (3 after 1)
      (99L, 1L, Some(5L), 1L, 0L), (3L, 1L, Some(7L), 3L, 6L),
      // shard 2: a null-payload doc's entry (null n_bytes, the
      // mmManifest shape for null text) followed by a normal entry —
      // the null claim contributes 0 to the expected cumulative, so
      // NOTHING in this shard is a defect (null <=> null is no
      // len-mismatch; offset 0 after a null entry is no break); doc 4
      // stays in NO shard to keep the unsharded lane exercised
      (5L, 2L, None, 1L, 0L), (2L, 2L, Some(2L), 2L, 0L))
      .toDF("doc_id", "shard", "n_bytes", "rec_idx", "offset")
    val out = operators.Multimodal.mmManifestIntegrityFor(docs, manifest)
      .collect().map(r => r.getAs[Long]("shard") -> r).toMap
    out.keySet shouldBe Set(0L, 1L, 2L)
    val nullShard = out(2L)
    Seq("n_dangling", "n_len_mismatch", "n_offset_breaks", "n_idx_breaks")
      .foreach(c => withClue(s"shard2 $c: ") { nullShard.getAs[Long](c) shouldBe 0L })
    nullShard.getAs[Long]("shard_bytes_manifest") shouldBe 2L
    nullShard.getAs[Long]("shard_bytes_docs") shouldBe 2L
    val clean = out(0L); val dirty = out(1L)
    clean.getAs[Long]("n_entries") shouldBe 2L
    Seq("n_dangling", "n_len_mismatch", "n_offset_breaks", "n_idx_breaks")
      .foreach(c => withClue(s"$c: ") { clean.getAs[Long](c) shouldBe 0L })
    clean.getAs[Long]("shard_bytes_manifest") shouldBe 6L
    clean.getAs[Long]("shard_bytes_docs") shouldBe 6L
    dirty.getAs[Long]("n_entries") shouldBe 2L
    dirty.getAs[Long]("n_dangling") shouldBe 1L // doc 99
    dirty.getAs[Long]("n_len_mismatch") shouldBe 1L // doc 3: 7 vs 6
    dirty.getAs[Long]("n_offset_breaks") shouldBe 1L // 6 where 5 expected
    dirty.getAs[Long]("n_idx_breaks") shouldBe 1L // rec_idx 3 where 2
    dirty.getAs[Long]("shard_bytes_manifest") shouldBe 12L
    dirty.getAs[Long]("shard_bytes_docs") shouldBe 6L // only doc 3 matched
    // doc 4 (null payload, still a document) appears in NO shard
    out.values.map(_.getAs[Long]("n_unsharded_docs")).toSet shouldBe Set(1L)
    // and the registered query over real testdata audits mmManifest
    // against its own corpus: every defect lane zero on every shard
    val real = operators.Multimodal.mmManifestIntegrity(spark, sf).collect()
    real.length should be > 0
    real.foreach { r =>
      Seq("n_dangling", "n_len_mismatch", "n_offset_breaks", "n_idx_breaks")
        .foreach(c => withClue(s"shard ${r.getAs[Long]("shard")} $c: ") {
          r.getAs[Long](c) shouldBe 0L
        })
      r.getAs[Long]("shard_bytes_manifest") shouldBe r.getAs[Long]("shard_bytes_docs")
      r.getAs[Long]("n_unsharded_docs") shouldBe 0L
    }
  }
}
