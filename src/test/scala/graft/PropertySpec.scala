package graft

import graft.grid.Tile
import graft.ops.{Algebra, Geo}
import graft.plans.AsofJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based coverage of the pure kernels + plan-level operators.
  * (Raw ScalaCheck generators with deterministic seeds — the
  * scalatest-scalacheck bridge isn't in the offline cache.) */
class PropertySpec extends AnyFunSuite {

  lazy val spark = SparkSpec.session
  import spark.implicits._

  /** Deterministically sample `n` values from a generator. */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("chip→unchip round-trips arbitrary sparse grids") {
    val pixelGen = Gen.listOf(for {
      t <- Gen.choose(0, 2); y <- Gen.choose(0, 40); x <- Gen.choose(0, 40)
      v <- Gen.choose(-1000, 1000)
    } yield (t, y, x, v.toDouble))
    for (pts <- samples(pixelGen, 5)) {
      val rows = pts.distinctBy(p => (p._1, p._2, p._3))
      if (rows.nonEmpty) {
        val long = rows.toDF("ti", "y", "x", "v")
          .select(expr("timestamp_micros(CAST(ti AS BIGINT))").as("t"),
            col("y"), col("x"), col("v"))
        val back = Tile.unchip(Tile.chip(long, 16, 16), 16, 16)
        assert(back.count() == rows.length)
        assert(back.except(long).isEmpty && long.except(back).isEmpty)
      }
    }
  }

  test("as-of join equals the brute-force per-row maximum") {
    val gen = for {
      left <- Gen.listOfN(30, for {
        k <- Gen.choose(0, 3); t <- Gen.choose(0L, 1000L)
      } yield (k, t))
      right <- Gen.listOfN(30, for {
        k <- Gen.choose(0, 3); t <- Gen.choose(0L, 1000L)
      } yield (k, t))
    } yield (left.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
             // unique (key, time) on the right: as-of picks the row, value = time
             right.map { case (k, t) => (k, t, t * 10 + k) }.distinctBy(r => (r._1, r._2)))
    for ((lrows, rrows) <- samples(gen, 5)) {
      if (lrows.nonEmpty && rrows.nonEmpty) {
        val l = lrows.toDF("lid", "k", "lt")
          .select(col("lid"), col("k"), expr("timestamp_micros(lt)").as("lt"))
        val r = rrows.toDF("k", "rt0", "payload")
          .select(col("k"), expr("timestamp_micros(rt0)").as("rt"), col("payload"))
        val got = AsofJoin.asof(l, r, "k", "lt", "rt", Seq("payload"))
          .select(col("lid"), col("asof_payload")).as[(Long, Option[Long])]
          .collect().toMap
        val expect = lrows.map { case (lid, k, lt) =>
          val cands = rrows.filter(rr => rr._1 == k && rr._2 <= lt)
          lid -> (if (cands.isEmpty) None
                  else Some(cands.maxBy(_._2)._3))
        }.toMap
        assert(got == expect)
      }
    }
  }

  test("clipWindow is always within the grid and consistent with membership") {
    val boxGen = for {
      w <- Gen.choose(-400.0, 400.0); s <- Gen.choose(-200.0, 200.0)
      dw <- Gen.choose(0.0, 200.0); dh <- Gen.choose(0.0, 100.0)
    } yield (w, s, w + dw, s + dh)
    for ((bw, bs, be, bn) <- samples(boxGen, 20)) {
      val row = Seq((bw, bs, be, bn)).toDF("bw", "bs", "be", "bn")
        .select(Geo.clipWindow(col("bw"), col("bs"), col("be"), col("bn"),
          64, 48, -180.0, 90.0, 5.625, 3.75): _*)
        .collect()(0)
      val (co, ro, w, h) = (row.getInt(0), row.getInt(1), row.getInt(2), row.getInt(3))
      assert(co >= 0 && ro >= 0 && w >= 0 && h >= 0)
      assert(co + w <= 64 && ro + h <= 48)
      assert((w == 0) == (h == 0)) // empty on either axis empties both
    }
  }

  test("PngCodec round-trips arbitrary images at every depth") {
    val imgGen = for {
      w <- Gen.choose(1, 13); h <- Gen.choose(1, 9)
      depth <- Gen.oneOf(8, 16, 24, 32)
      vals <- Gen.listOfN(w * h, Gen.choose(0L, (1L << math.min(depth, 31)) - 1))
    } yield (w, h, depth, vals.toArray)
    for ((w, h, depth, vals) <- samples(imgGen, 40)) {
      val bytes = graft.sources.PngCodec.encode(vals, w, h, depth)
      val img = graft.sources.PngCodec.decodeImage(bytes, 0)
      assert(img.w == w && img.h == h && img.end == bytes.length)
      assert(img.pixels.sameElements(vals), s"${w}x$h depth=$depth")
    }
  }

  test("PngCodec survives large incompressible payloads (deflate > input)") {
    // ~1 MB of full-entropy 16-bit samples: stored/raw deflate blocks
    // cost ~5 bytes per 64 KB on top of the input, so a single-shot
    // deflate into a fixed input-sized buffer silently truncates here.
    val rnd = new scala.util.Random(42)
    val (w, h) = (720, 720)
    val vals = Array.fill(w * h)(rnd.nextInt(65536).toLong)
    val bytes = graft.sources.PngCodec.encode(vals, w, h, 16)
    val img = graft.sources.PngCodec.decodeImage(bytes, 0)
    assert(img.w == w && img.h == h && img.end == bytes.length)
    assert(img.pixels.sameElements(vals))
  }

  test("HyperplaneBucket equals the naive per-plane sign computation") {
    val table = graft.functions.HyperplaneBucket.signTable(8, 16)
    val vecGen = Gen.listOfN(16, Gen.choose(-1000000L, 1000000L))
    for (vec <- samples(vecGen, 60)) {
      // naive: per plane, sum signed components, test >= 0
      var expect = 0L
      for (p <- 0 until 8) {
        var proj = 0L
        for (i <- 0 until 16)
          proj += (if (((table(i) >> p) & 1) != 0) vec(i) else -vec(i))
        if (proj >= 0) expect |= 1L << p
      }
      val got = spark.createDataFrame(Seq(Tuple1(vec.toArray)))
        .toDF("q").withColumn("vec_id", lit(0L))
      val bucket = graft.llm.Similarity.buckets(got, 8, 16)
        .select("bucket").as[Long].collect()(0)
      assert(bucket == expect, s"vec=$vec")
    }
  }

  test("noleap doy↔(month,day) mapping round-trips all 365 days") {
    import graft.ops.GeoCal
    val df = spark.range(365).select((col("id") + 1).cast("int").as("doy"))
      .withColumn("m", expr(s"CAST(${GeoCal.noleapMonthOf("doy")} AS INT)"))
      .withColumn("d", expr(s"CAST(doy - ${GeoCal.noleapCumBefore("doy")} AS INT)"))
      .withColumn("back", expr(s"CAST(${GeoCal.noleapCumByMonth("m")} + d AS INT)"))
    assert(df.filter(col("back") =!= col("doy")).isEmpty)
    // day bounds respect the noleap month lengths (Feb = 28)
    val lens = Seq(31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)
    val byM = df.groupBy("m").agg(max("d").as("mx"))
      .as[(Int, Int)].collect().toMap
    lens.zipWithIndex.foreach { case (len, i) => assert(byM(i + 1) == len) }
  }

  test("rescaleEncode stays within 0..255 for any input") {
    for (v <- samples(Gen.choose(-1e6, 1e6), 30)) {
      val e = Seq(v).toDF("v")
        .select(Algebra.rescaleEncode(col("v"), 0.0, 300.0).as("e"))
        .collect()(0).getInt(0)
      assert(e >= 0 && e <= 255)
    }
  }

  test("canonicalize: random graphs — labels are fixpoints and within-edge consistent") {
    val edgeGen = Gen.listOfN(25,
      Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L)).suchThat(p => p._1 != p._2))
    for (edges <- samples(edgeGen, 5)) {
      val pairs = edges.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
        .distinct.toDF("doc_a", "doc_b")
      // rounds beyond diameter: 20-node graphs settle well within 6.
      // BOTH execution paths must agree: the default (size-gated
      // driver union-find) and the distributed pointer-jump loop,
      // forced here with driverCap = 0
      val labels = graft.llm.Dedup.canonicalize(pairs, 6)
        .as[(Long, Long)].collect().toMap
      val labelsDist = graft.llm.Dedup.canonicalize(pairs, 6, driverCap = 0)
        .as[(Long, Long)].collect().toMap
      assert(labels == labelsDist,
        "driver union-find and distributed pointer-jump disagree")
      edges.foreach { case (a, b) =>
        assert(labels(a) == labels(b),
          s"edge ($a,$b) split across clusters: ${labels(a)} vs ${labels(b)}")
      }
      labels.foreach { case (id, c) =>
        assert(c <= id, s"canonical $c exceeds member $id")
        assert(labels(c) == c, s"representative $c not a fixpoint")
      }
    }
  }

  test("pagerankInt: symmetric graphs rank by degree; total mass conserved within floors") {
    // path graph 0-1-2-3-4: middle nodes outrank endpoints
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val pr = graft.llm.Dedup.pagerankInt(path, 3)
      .as[(Long, Long)].collect().toMap
    assert(pr(2L) > pr(0L) && pr(2L) > pr(4L))
    assert(pr(1L) == pr(3L) && pr(0L) == pr(4L)) // symmetry is exact
    // floors only ever DROP mass: total <= n * (150000 + 850000)
    assert(pr.values.sum <= 5L * 1000000L)
  }
}
