package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.eth.Ingest
import graft.functions.ColumnFns
import graft.llm.Dedup

/** ScalaCheck properties (SURVEY §5.3): range-planner tiling, bucket
  * arithmetic, hex round-trips, shingle counting. Driver-side laws run
  * hundreds of samples; column-level laws batch all samples into ONE Spark
  * job and assert over the whole frame (per-sample jobs would be quadratic
  * overhead for zero extra coverage). */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def check(label: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, s"$label: ${res.status}")
  }

  test("planRanges tiles [start, end] exactly once, in order, within batchSize") {
    check("planRanges", Prop.forAll(
      Gen.chooseNum(0L, 10000L), Gen.chooseNum(0L, 5000L), Gen.chooseNum(1L, 999L)) {
      (start, len, batch) =>
        val end = start + len
        val rs = Ingest.planRanges(start, end, batch)
        val tiles = rs.headOption.contains((start, math.min(start + batch - 1, end))) &&
          rs.lastOption.exists(_._2 == end) &&
          rs.sliding(2).forall { case Seq((_, h1), (l2, _)) => l2 == h1 + 1; case _ => true } &&
          rs.forall { case (l, h) => h >= l && h - l < batch }
        val total = rs.map { case (l, h) => h - l + 1 }.sum
        tiles && total == len + 1
    })
  }

  test("roundToBuckets returns whole buckets covering the range's full buckets") {
    check("roundToBuckets", Prop.forAll(
      Gen.chooseNum(0L, 100000L), Gen.chooseNum(0L, 50000L), Gen.chooseNum(1L, 5000L)) {
      (start, len, size) =>
        Ingest.roundToBuckets(start, start + len, size) match {
          case Some((lo, hi)) =>
            lo % size == 0 && (hi + 1) % size == 0 && lo <= start &&
              hi <= start + len && hi >= lo
          case None => // no whole bucket fits inside the range
            (start + len + 1) / size * size - 1 < (start / size) * size
        }
    })
  }

  test("bucket derivation equals floorDiv and is monotone (one Spark job)") {
    val ids = Gen.listOfN(500, Gen.chooseNum(0L, 1L << 40)).sample.get
    val out = ids.toDF("id")
      .select(col("id"), ColumnFns.blockIdGroup(col("id")).as("g"))
      .collect()
    out.foreach(r => assert(r.getAs[Int]("g") == Math.floorDiv(r.getAs[Long]("id"), 1000L)))
    val sorted = out.sortBy(_.getAs[Long]("id"))
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Int]("g") <= b.getAs[Int]("g"))
      case _ =>
    }
  }

  test("hex->binary->hex round-trips for arbitrary even-length blobs (one Spark job)") {
    val hexChars = "0123456789abcdef"
    val gen = Gen.chooseNum(0, 64).flatMap(n =>
      Gen.listOfN(n * 2, Gen.oneOf(hexChars.toSeq)).map("0x" + _.mkString))
    val samples = Gen.listOfN(300, gen).sample.get
    val out = samples.toDF("h")
      .select(col("h"),
        ColumnFns.binaryToHex(ColumnFns.hexToBinary(col("h"))).as("rt"))
      .collect()
    out.foreach { r =>
      val in = r.getAs[String]("h")
      // empty blob: "0x" decodes to a zero-length binary and re-encodes to "0x"
      assert(r.getAs[String]("rt") == in, s"roundtrip broke for $in")
    }
  }

  test("shingle count law: max(1, n - k + 1) for every token list (one Spark job)") {
    val gen = Gen.chooseNum(1, 30).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerStr.map(s => if (s.isEmpty) "x" else s.take(5))))
    val samples = Gen.listOfN(200, gen).sample.get
    val out = samples.map(_.mkString(" ")).toDF("text")
      .select(size(split(col("text"), " ")).as("n"),
        size(ColumnFns.shingles(ColumnFns.tokens(col("text")), 3)).as("s"))
      .collect()
    out.foreach(r =>
      assert(r.getAs[Int]("s") == math.max(1, r.getAs[Int]("n") - 2)))
  }

  test("md5Long stays in [0, 2^60) and is injective on distinct inputs here") {
    val samples = (0 until 1000).map(i => s"probe-$i")
    val out = samples.toDF("s")
      .select(ColumnFns.md5Long(col("s")).as("h")).collect().map(_.getAs[Long]("h"))
    assert(out.forall(h => h >= 0 && h < (1L << 60)))
    assert(out.distinct.length == out.length)
  }

  test("native hash kernels match their composable formulas on arbitrary strings (one Spark job)") {
    // random unicode-ish strings, incl. empties and high codepoints —
    // the Md5LongExpr / MinhashSigExpr / SimhashExpr equivalence must hold
    // for ANY input, not just the fixture corpus
    val gen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.oneOf("é", "ß", "中", "🎉", " ", "|")))
      .map(_.mkString)
    val samples = Gen.listOfN(400, gen).sample.get
    val df = samples.map(Tuple1(_)).toDF("s").localCheckpoint(true)

    val md5Rows = df.select(
      ColumnFns.md5Long(col("s")).as("native"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("viaHex"))
      .collect()
    md5Rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))

    import graft.llm.Dedup
    val k = 6
    val bases = df.select(transform(split(col("s"), " "),
      t => Dedup.minhashBase(t)).as("b"))
    val sigComposable = array((0 until k).map { h =>
      array_min(transform(col("b"),
        b => (lit(Dedup.minhashA(h)) * b + lit(Dedup.minhashB(h))) % Dedup.MinhashP))
    }: _*)
    val simComposable = (0 until 16).map { j =>
      val vote = aggregate(col("b"), lit(0L),
        (a, b) => a + when(shiftrightunsigned(b, j) % 2 === 1, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)
    val rows = bases.select(
      Dedup.minhashSignatureFromBases(col("b"), k).as("sigN"),
      sigComposable.as("sigC"),
      Dedup.simhashFromBases(col("b"), 16).as("simN"),
      simComposable.as("simC")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      assert(r.getLong(2) == r.getLong(3))
    }
  }

  test("chunkTokens law: count formula, stride offsets, full coverage, overlap") {
    // all random docs batched into ONE job per (chunkSize, stride) config
    val rnd = new scala.util.Random(42)
    val docs = (0L until 200L).map { i =>
      val n = 1 + rnd.nextInt(100)
      (i, (0 until n).map(t => s"w$t").mkString(" "))
    }.toDF("doc_id", "text")
    for ((cs, st) <- Seq((32, 24), (16, 16), (8, 3), (1, 1))) {
      val got = graft.llm.TextAnalysis.chunkTokens(docs, "doc_id", "text", cs, st)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3)))
        .groupBy(_._1)
      docs.collect().foreach { row =>
        val (id, n) = (row.getLong(0), row.getString(1).split(" ").length)
        val chunks = got(id).sortBy(_._2)
        val expect = if (n <= cs) 1L else (n - cs + st - 1) / st + 1L
        assert(chunks.length == expect, s"doc $id n=$n cs=$cs st=$st")
        // chunk i holds exactly tokens [i*st, min(i*st+cs, n))
        chunks.foreach { case (_, cid, nt, text) =>
          val start = (cid * st).toInt
          assert(nt == math.min(start + cs, n) - start)
          assert(text == (start until math.min(start + cs, n))
            .map(t => s"w$t").mkString(" "))
        }
        // coverage: every token appears in at least one chunk
        val covered = chunks.flatMap { case (_, cid, nt, _) =>
          (cid * st).toInt until ((cid * st).toInt + nt) }.toSet
        assert(covered == (0 until n).toSet, s"doc $id gap: cs=$cs st=$st")
      }
    }
  }

  test("simhash band pairs = exhaustive hamming pairs on a random corpus") {
    // pigeonhole recall law on 60 random docs over a tiny vocabulary
    // (shared words => near-identical signatures => adversarial density)
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docs = (0L until 60L).map { i =>
      (i, (0 until 5 + rnd.nextInt(10))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val got = Dedup.simhashBandPairs(docs, "doc_id", "text",
      bits = 16, bands = 4, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sigs = docs.select(col("doc_id"),
      Dedup.simhash(ColumnFns.tokens(col("text")), 16).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ia, ib, h)).toSet
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
  }

  test("batch-size invariance: any batching unions to the same row set") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val hi = Ingest.maxIngestedBlock(li, "l_orderkey").get
    val expected = li.count()
    for (batch <- Seq(7L, 1000L, 100000L)) {
      val total = Ingest.planRanges(0L, hi, batch).map { case (lo, h) =>
        li.filter(col("l_orderkey").between(lo, h)).count()
      }.sum
      assert(total == expected, s"batch=$batch")
    }
  }

  test("JSON-RPC quantity codec round-trips arbitrary unsigned values") {
    import graft.sources.rpc.RpcCodec
    check("hexQty/parseQty", Prop.forAll(Gen.chooseNum(0L, Long.MaxValue)) { n =>
      val enc = RpcCodec.hexQty(BigInt(n))
      // minimal hex: no leading zero digit (except "0x0" itself)
      val minimal = enc == "0x0" || !enc.startsWith("0x0")
      minimal && RpcCodec.parseQty(RpcCodec.read("\"" + enc + "\"")) == BigInt(n)
    })
    // uint256-scale values (beyond Long): the wei/difficulty regime
    check("hexQty big", Prop.forAll(Gen.chooseNum(0L, Long.MaxValue)) { n =>
      val big = BigInt(n) * BigInt(n) + BigInt(n)
      RpcCodec.parseQty(RpcCodec.read("\"" + RpcCodec.hexQty(big) + "\"")) == big
    })
  }

  test("morton interleave: tile locality — equal high bits of x and y give equal z prefixes") {
    // the property row-group skipping rests on: the Morton code of any
    // (x, y) inside a 2^k-aligned tile shares its high bits with every
    // other point of the tile, so a tile occupies ONE contiguous z range.
    // All samples batched into one frame (per this spec's discipline).
    val coord = Gen.chooseNum(0, 0xFFFF)
    val samples = (0 until 500).map { _ =>
      (coord.sample.get, coord.sample.get, coord.sample.get, coord.sample.get,
        Gen.chooseNum(1, 12).sample.get)
    }
    val out = samples.toDF("x1", "y1", "x2", "y2", "k")
      .select(col("x1"), col("y1"), col("x2"), col("y2"), col("k"),
        ColumnFns.mortonInterleave(col("x1"), col("y1")).as("z1"),
        ColumnFns.mortonInterleave(col("x2"), col("y2")).as("z2"))
      .collect()
    out.foreach { r =>
      val (x1, y1, x2, y2, k) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      val (z1, z2) = (r.getLong(5), r.getLong(6))
      val sameTile = (x1 >> k) == (x2 >> k) && (y1 >> k) == (y2 >> k)
      // same 2^k tile -> z codes agree above bit 2k
      assert(!sameTile || (z1 >> (2 * k)) == (z2 >> (2 * k)),
        s"($x1,$y1) vs ($x2,$y2) k=$k: z=$z1/$z2")
    }
    // and z is injective on the sampled points: distinct (x, y) -> distinct z
    val pts = out.map(r => ((r.getInt(0), r.getInt(1)), r.getLong(5))).distinct
    assert(pts.map(_._1).distinct.length == pts.map(_._2).distinct.length)
  }

  test("graph operators match executable reference models on random digraphs") {
    import graft.operators.Graph
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 8 + rnd.nextInt(6)
      val edges = (for {
        a <- 0 until n; b <- 0 until n
        if a != b && rnd.nextDouble() < 0.25
      } yield (a.toLong, b.toLong, 1L + rnd.nextInt(3))).toVector
      if (edges.nonEmpty) {
        val df = edges.toDF("src", "dst", "w")

        // --- reference structures
        val und = edges.map { case (a, b, _) => (a min b, a max b) }.toSet
        val nodes = und.toSeq.flatMap { case (u, v) => Seq(u, v) }.distinct.sorted
        val deg = nodes.map(nd => nd ->
          und.count { case (u, v) => u == nd || v == nd }.toLong).toMap

        // triangles + wedges vs brute force over all triples
        val triRef = nodes.combinations(3).count { case Seq(a, b, c) =>
          und((a, b)) && und((a, c)) && und((b, c)) }
        val wedgeRef = deg.values.map(dd => dd * (dd - 1) / 2).sum
        val tRow = Graph.triangleCount(df).collect()(0)
        assert(tRow.getAs[Long]("n_triangles") == triRef.toLong, s"trial $trial tri")
        assert(tRow.getAs[Long]("n_wedges") == wedgeRef, s"trial $trial wedges")

        // per-node clustering vs brute-force corner counts
        val triAt = nodes.map(nd => nd -> nodes.combinations(3).count {
          case Seq(a, b, c) => Seq(a, b, c).contains(nd) &&
            und((a, b)) && und((a, c)) && und((b, c)) }.toLong).toMap
        val ccRef = nodes.filter(deg(_) >= 2).map { nd =>
          val dd = deg(nd)
          nd -> ((triAt(nd), 1000L * triAt(nd) / (dd * (dd - 1) / 2)))
        }.toMap
        val cc = Graph.localClustering(df).collect()
          .map(r => r.getAs[Long]("node") ->
            ((r.getAs[Long]("n_tri"), r.getAs[Long]("clustering_milli")))).toMap
        assert(cc == ccRef, s"trial $trial clustering")

        // k-core vs a simulated fixed-round peel (same contract)
        val k = 2 + rnd.nextInt(2)
        var live = und
        for (_ <- 1 to 3) {
          val dg = live.toSeq.flatMap { case (u, v) => Seq(u, v) }
            .groupBy(identity).map { case (kk, s) => kk -> s.size.toLong }
          val keep = dg.filter(_._2 >= k).keySet
          live = live.filter { case (u, v) => keep(u) && keep(v) }
        }
        val coreRef = live.toSeq.flatMap { case (u, v) => Seq(u, v) }
          .groupBy(identity).map { case (kk, s) => kk -> s.size.toLong }
        val core = Graph.kcore(df, k = k, rounds = 3).collect()
          .map(r => r.getAs[Long]("node") -> r.getAs[Long]("deg")).toMap
        assert(core == coreRef, s"trial $trial kcore k=$k")

        // k-hop reach vs a BFS over the distinct directed edges
        val adj = edges.map { case (a, b, _) => (a, b) }.distinct
          .groupBy(_._1).map { case (kk, s) => kk -> s.map(_._2) }
        var hops = Map(0L -> 0)
        var frontier = Set(0L)
        for (h <- 1 to 3) {
          val next = frontier.flatMap(adj.getOrElse(_, Nil)) -- hops.keySet
          hops ++= next.map(_ -> h)
          frontier = next
        }
        val reach = Graph.khopReach(df, Seq(Tuple1(0L)).toDF("node"), maxHops = 3)
          .collect().map(r => r.getAs[Long]("node") -> r.getAs[Int]("hops")).toMap
        assert(reach == hops, s"trial $trial khop")

        // haircut taint vs a simulated push with identical Long arithmetic
        val ew = edges.groupBy { case (a, b, _) => (a, b) }
          .map { case (kk, s) => kk -> s.map(_._3).sum }
        val ow = ew.groupBy(_._1._1).map { case (kk, s) => kk -> s.values.sum }

        // weighted pagerank vs a simulated power iteration (same integer
        // micro-unit arithmetic, same dangling-mass evaporation)
        val allNodes = edges.flatMap { case (a, b, _) => Seq(a, b) }.distinct.sorted
        var rank = allNodes.map(_ -> 1000000L).toMap
        for (_ <- 1 to 3) {
          val contrib = ew.toSeq.flatMap { case ((s, dd), ww) =>
            rank.get(s).map(r => dd -> r * ww / ow(s)) }
            .groupBy(_._1).map { case (kk, s) => kk -> s.map(_._2).sum }
          rank = allNodes.map(nd =>
            nd -> (150000L + contrib.getOrElse(nd, 0L) * 850L / 1000L)).toMap
        }
        val pr = Graph.pagerank(df, iters = 3, weightCol = Some("w")).collect()
          .map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank_micro")).toMap
        assert(pr == rank, s"trial $trial pagerank")

        // two-hop aggregates vs brute-force pair enumeration
        val pairs = for {
          ((s0, mid), w1) <- ew.toSeq
          ((m2, dd), w2) <- ew.toSeq if m2 == mid
        } yield (s0, mid, dd, w1 * w2)
        val twoRef = pairs.groupBy(_._3).map { case (nd, ps) =>
          nd -> ((ps.map(_._4).sum, ps.map(_._1).distinct.size.toLong,
            ps.map(_._2).distinct.size.toLong)) }
        val two = Graph.twoHopPaths(df, weightCol = Some("w")).collect()
          .map(r => r.getAs[Long]("node") -> ((r.getAs[Long]("n_paths"),
            r.getAs[Long]("n_sources"), r.getAs[Long]("n_mids")))).toMap
        assert(two == twoRef, s"trial $trial twohop")
        var taint = Map(0L -> 1000000L)
        for (_ <- 1 to 2) {
          val pushed = ew.toSeq.flatMap { case ((s, dd), ww) =>
            taint.get(s).map(t => dd -> t * ww / ow(s)) }
          val absorbed = taint.filter { case (nd, _) => !ow.contains(nd) }.toSeq
          taint = (pushed ++ absorbed).groupBy(_._1)
            .map { case (kk, s) => kk -> s.map(_._2).sum }
        }
        val taintRef = taint.filter(_._2 > 0)
        val hc = Graph.haircutTaint(df, Seq(Tuple1(0L)).toDF("node"),
            iters = 2, weightCol = Some("w")).collect()
          .map(r => r.getAs[Long]("node") -> r.getAs[Long]("taint_micro")).toMap
        assert(hc == taintRef, s"trial $trial haircut")
      }
    }
  }

  test("partitioning invariance: new dedup/scoring ops give identical results under repartition") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = embs.filter($"vec_id" < 8)
    val members = embs.filter($"vec_id" >= 8)
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    assert(rows(Dedup.semanticDedup(members, cents, 0.3)) ==
      rows(Dedup.semanticDedup(members.repartition(13), cents, 0.3)))
    assert(rows(Dedup.duplicateSpans(docs, "doc_id", "text")) ==
      rows(Dedup.duplicateSpans(docs.repartition(13), "doc_id", "text")))
    assert(rows(graft.llm.Sampling.importanceWeights(docs, "doc_id", "text", $"lang" === "en")) ==
      rows(graft.llm.Sampling.importanceWeights(docs.repartition(13), "doc_id", "text", $"lang" === "en")))
    assert(rows(graft.llm.Similarity.pqCodes(members, cents, dim = 64, m = 8)) ==
      rows(graft.llm.Similarity.pqCodes(members.repartition(13), cents, dim = 64, m = 8)))
    assert(rows(graft.llm.TextAnalysis.globalQualityGate(docs, "doc_id", "text")) ==
      rows(graft.llm.TextAnalysis.globalQualityGate(docs.repartition(13), "doc_id", "text")))
  }

  test("partitioning invariance: round-7 ops give identical results under repartition") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    assert(rows(graft.llm.TextAnalysis.bpeTrainMerges(docs, rounds = 2)) ==
      rows(graft.llm.TextAnalysis.bpeTrainMerges(docs.repartition(13), rounds = 2)))
    assert(rows(graft.llm.Similarity.matryoshkaTruncate(embs, dims = 16)) ==
      rows(graft.llm.Similarity.matryoshkaTruncate(embs.repartition(13), dims = 16)))
    val ev = Seq((1L, "a", 10L, 100L), (1L, "a", 20L, 101L), (1L, "b", 30L, 102L),
      (2L, "x", 10L, 103L), (2L, "x", 40L, 104L), (2L, "y", 50L, 105L))
      .toDF("k", "attr", "ts", "ord")
    assert(rows(graft.operators.Scd2.buildIntervals(ev, "k", "attr", "ts", "ord")) ==
      rows(graft.operators.Scd2.buildIntervals(ev.repartition(5), "k", "attr", "ts", "ord")))
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 3L), (4L, 5L))
      .toDF("src", "dst")
    assert(rows(graft.operators.Graph.scc(edges, localThreshold = 0L)) ==
      rows(graft.operators.Graph.scc(edges.repartition(7), localThreshold = 0L)))
    val seeds = Seq(Tuple1(1L)).toDF("node")
    assert(rows(graft.operators.Graph.personalizedPagerank(edges, seeds, iters = 3)) ==
      rows(graft.operators.Graph.personalizedPagerank(edges.repartition(7), seeds, iters = 3)))
  }

  test("globalRowNumber equals the single-task row_number for arbitrary data and partitionings") {
    // one batched frame: 2k rows with heavy value ties so the tiebreak
    // and the range-boundary tie colocating both get exercised
    val df = (1 to 2000).map(i => (i.toLong, (i * 37 % 23).toLong))
      .toDF("id", "v")
    // smallInputBytes = 0 pins the two-phase branch — the point of this
    // property is two-phase == single-task, not the small-input dispatch
    def ranked(d: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      graft.operators.GlobalRank.globalRowNumber(d, Seq(col("v"), col("id")), "rn",
          smallInputBytes = 0L)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rn")).toMap
    val expect = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, v) => (v, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(ranked(df) == expect)
    assert(ranked(df.repartition(17)) == expect) // physical layout must not matter
    // the r15 small-input dispatch (default bound) must return the same rows
    assert(graft.operators.GlobalRank.globalRowNumber(df, Seq(col("v"), col("id")), "rn")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rn")).toMap == expect)
  }

  test("groupedRowNumber/groupedRankDense equal the window forms for arbitrary data and partitionings") {
    import org.apache.spark.sql.expressions.Window
    // heavy ties within few groups (the skew shape the operator exists
    // for), plus a NULL group: the add-back joins must be null-safe or
    // every null-group row silently vanishes
    val df = (1 to 2000).map(i =>
      (i.toLong, if (i % 5 == 0) null else s"g${i % 3}", (i * 37 % 23).toLong))
      .toDF("id", "g", "v")
    def rn(d: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      // smallInputBytes = 0 pins the two-phase branch (the property under
      // test); the default-dispatch branch is asserted at the end
      graft.operators.GlobalRank.groupedRowNumber(d, Seq("g"),
          Seq(col("v"), col("id")), "rn", smallInputBytes = 0L)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rn")).toMap
    val expectRn = df.withColumn("rn", row_number()
        .over(Window.partitionBy(col("g")).orderBy(col("v"), col("id"))).cast("long"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rn")).toMap
    assert(rn(df) == expectRn)
    assert(rn(df.repartition(17)) == expectRn) // physical layout must not matter
    def rd(d: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      graft.operators.GlobalRank.groupedRankDense(d, Seq("g"), Seq("v"),
          Seq(col("v").desc, col("id")), "rnk", "drnk", smallInputBytes = 0L)
        .collect().map(r => r.getAs[Long]("id") ->
          ((r.getAs[Long]("rnk"), r.getAs[Long]("drnk")))).toMap
    val wd = Window.partitionBy(col("g")).orderBy(col("v").desc)
    val expectRd = df.withColumn("rnk", rank().over(wd).cast("long"))
      .withColumn("drnk", dense_rank().over(wd).cast("long"))
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("rnk"), r.getAs[Long]("drnk")))).toMap
    assert(rd(df) == expectRd)
    assert(rd(df.repartition(17)) == expectRd)
    // the r15 small-input dispatch (default bound) must return the same rows
    assert(graft.operators.GlobalRank.groupedRowNumber(df, Seq("g"),
        Seq(col("v"), col("id")), "rn")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("rn")).toMap
      == expectRn)
    assert(graft.operators.GlobalRank.groupedRankDense(df, Seq("g"), Seq("v"),
        Seq(col("v").desc, col("id")), "rnk", "drnk")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("rnk"), r.getAs[Long]("drnk")))).toMap == expectRd)
  }

  test("exactPercentile equals the percentile aggregate: grouped, global, nulls, ties, both branches") {
    // duplicate-heavy values (ties), planted nulls (the aggregate skips
    // them), a null group key (an ordinary group), non-integral and
    // integral interpolation positions across several pct values
    val df = (1 to 1999).map { i =>
      val g = if (i % 13 == 0) null else s"g${i % 4}"
      val v = if (i % 17 == 0) null
              else java.lang.Long.valueOf((i * 37 % 53) * 10L)
      (i.toLong, g, v)
    }.toDF("id", "g", "v")
    for (pct <- Seq(0.25, 0.5, 0.9); pin <- Seq(0L, Long.MaxValue)) {
      val got = graft.operators.GlobalRank.exactPercentile(df, Seq("g"), "v",
          Seq(col("id")), pct, "p", smallInputBytes = pin)
        .collect().map(r => Option(r.getAs[String]("g")) ->
          (if (r.isNullAt(1)) None else Some(r.getAs[Double]("p")))).toMap
      val want = df.groupBy(col("g"))
        .agg(expr(s"percentile(v, $pct)").as("p"))
        .collect().map(r => Option(r.getAs[String]("g")) ->
          (if (r.isNullAt(1)) None else Some(r.getAs[Double]("p")))).toMap
      assert(got == want, s"grouped pct=$pct pin=$pin")
      val gotG = graft.operators.GlobalRank.exactPercentile(df, Seq.empty, "v",
          Seq(col("id")), pct, "p", smallInputBytes = pin)
        .collect()(0)
      val wantG = df.agg(expr(s"percentile(v, $pct)")).collect()(0)
      assert(gotG.getAs[Double]("p") == wantG.getDouble(0),
        s"global pct=$pct pin=$pin")
    }
    // all-null input: one NULL row, like the aggregate
    val nulls = Seq((1L, "a"), (2L, "b")).toDF("id", "g")
      .withColumn("v", lit(null).cast("long"))
    val r0 = graft.operators.GlobalRank.exactPercentile(nulls, Seq.empty, "v",
      Seq(col("id")), 0.5, "p").collect()
    assert(r0.length == 1 && r0(0).isNullAt(0))
    // DOCUMENTED divergence (r15 ADVICE): a GROUP whose values are ALL
    // NULL is dropped from the grouped output, whereas the `percentile`
    // aggregate emits that group with a NULL result. Every call site in
    // this repo uses non-null value columns, so the divergence is
    // unobservable there — this case pins the contract so a future
    // caller with nullable groups knows to left-join the group universe.
    val mixed = Seq((1L, "a", java.lang.Long.valueOf(10L)),
      (2L, "a", java.lang.Long.valueOf(20L)),
      (3L, "b", null.asInstanceOf[java.lang.Long])).toDF("id", "g", "v")
    val grouped = graft.operators.GlobalRank.exactPercentile(mixed, Seq("g"),
      "v", Seq(col("id")), 0.5, "p").collect()
    assert(grouped.map(_.getAs[String]("g")).toSet == Set("a"),
      "all-null group 'b' is dropped (aggregate would emit (b, NULL))")
    assert(mixed.groupBy(col("g")).agg(expr("percentile(v, 0.5)"))
      .collect().length == 2, "the aggregate keeps the all-null group")
  }

  test("BandedRange.peersWithin equals the RANGE-frame window count, negatives, boundaries, and nulls included") {
    import org.apache.spark.sql.expressions.Window
    // values straddle 0 and land exactly on bucket boundaries (multiples
    // of w) — the floor-division edge the bucket math must get right;
    // null VALUES must be peers of each other (the SQL frame semantics)
    // and a null GROUP key must be an ordinary group, not dropped
    val df = (1 to 1500).map { i =>
      val g = if (i % 7 == 0) null else s"g${i % 3}"
      val v = if (i % 11 == 0) null
              else java.lang.Long.valueOf(((i * 41 % 97) - 48) * 25L)
      (i.toLong, g, v)
    }.toDF("id", "g", "v")
    def banded(d: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      // smallInputBytes = 0 pins the banded branch — the point of this
      // property is banded == window, not the small-input dispatch
      graft.operators.BandedRange.peersWithin(d, Seq("g"), "v", w = 100L, "n",
          smallInputBytes = 0L)
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("n")).toMap
    val expect = df.withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("g")).orderBy(col("v")).rangeBetween(-100L, 0L)))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("n")).toMap
    assert(banded(df) == expect)
    assert(banded(df.repartition(13)) == expect)
    assert(banded(df).size == 1500, "no row may be dropped (nulls included)")
  }

  test("groupedPrefixSum equals the partitioned running sum, null groups and negative weights included") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 2000).map(i =>
      (i.toLong, if (i % 5 == 0) null else s"g${i % 3}", ((i * 37 % 23) - 5).toLong))
      .toDF("id", "g", "w")
    def cum(d: org.apache.spark.sql.DataFrame): Map[Long, BigDecimal] =
      graft.operators.GlobalRank.groupedPrefixSum(d, Seq("g"),
          Seq(col("id")), "w", "cw", smallInputBytes = 0L)
        .collect().map(r => r.getAs[Long]("id") ->
          BigDecimal(r.getAs[java.math.BigDecimal]("cw"))).toMap
    val expect = df.withColumn("cw", sum(col("w")).over(
        Window.partitionBy(col("g")).orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .collect().map(r => r.getAs[Long]("id") -> BigDecimal(r.getAs[Long]("cw"))).toMap
    assert(cum(df) == expect)
    assert(cum(df.repartition(17)) == expect)
    // the r15 small-input dispatch (default bound) must return the same rows
    assert(graft.operators.GlobalRank.groupedPrefixSum(df, Seq("g"),
        Seq(col("id")), "w", "cw")
      .collect().map(r => r.getAs[Long]("id") ->
        BigDecimal(r.getAs[java.math.BigDecimal]("cw"))).toMap == expect)
  }

  test("grouped ranking family: empty inputs yield empty (typed) outputs") {
    val empty = Seq.empty[(Long, String, Long)].toDF("id", "g", "v")
    assert(graft.operators.GlobalRank.groupedRowNumber(empty, Seq("g"),
      Seq(col("v"), col("id")), "rn").count() == 0)
    assert(graft.operators.GlobalRank.groupedRankDense(empty, Seq("g"),
      Seq("v"), Seq(col("v"), col("id")), "rnk", "drnk").count() == 0)
    assert(graft.operators.GlobalRank.groupedPrefixSum(empty, Seq("g"),
      Seq(col("id")), "v", "cw").count() == 0)
    assert(graft.operators.GlobalRank.groupedPrefixSumWithTotal(empty, Seq("g"),
      Seq(col("id")), "v", "cw", "tw").count() == 0)
    assert(graft.operators.GlobalRank.globalRowNumberAndPrefixSum(empty,
      Seq(col("id")), "v", "rn", "cw", "n", "tv").count() == 0)
    assert(graft.operators.BandedRange.peersWithin(empty, Seq("g"), "v",
      w = 10L, "n", smallInputBytes = 0L).count() == 0)
  }

  test("groupedWeightedMedianLower equals the window-form weighted median") {
    import org.apache.spark.sql.expressions.Window
    // unique (group, value) spine with a null group, heavy value ties
    // pre-collapsed away (the operator contract), skewed weights, and
    // one ALL-ZERO-weight group (must yield (min value, 0), not vanish)
    val df = (1 to 2000).map(i =>
      (if (i % 5 == 0) null else s"g${i % 3}", i.toLong,
        if (i % 5 != 0 && i % 3 == 0) 0L else ((i * 37 % 23) + 1).toLong))
      .toDF("g", "v", "w").groupBy("g", "v").agg(sum(col("w")).as("w"))
      .union(Seq(("gzero", 1L, 0L), ("gzero", 2L, 0L)).toDF("g", "v", "w"))
    val got = graft.operators.GlobalRank.groupedWeightedMedianLower(
        df.repartition(17), Seq("g"), "v", "w", "med", "tot")
      .collect().map(r => Option(r.getString(0)) ->
        ((r.getAs[Long]("med"), r.getAs[Long]("tot")))).toMap
    val expect = df
      .withColumn("cw", sum(col("w")).over(Window.partitionBy(col("g"))
        .orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("tw", sum(col("w")).over(Window.partitionBy(col("g"))))
      .filter(col("cw") * 2 >= col("tw"))
      .groupBy(col("g"))
      .agg(min(col("v")).as("med"), max(col("tw")).as("tot"))
      .collect().map(r => Option(r.getString(0)) ->
        ((r.getAs[Long]("med"), r.getAs[Long]("tot")))).toMap
    assert(got == expect)
    assert(got.contains(None), "the null group must survive")
    assert(got(Some("gzero")) == ((1L, 0L)), "zero-weight group must survive")
    // empty input
    val empty = Seq.empty[(String, Long, Long)].toDF("g", "v", "w")
    assert(graft.operators.GlobalRank.groupedWeightedMedianLower(empty,
      Seq("g"), "v", "w", "m", "t").count() == 0)
  }

  test("groupedLag equals the window-form lag, including null values and slice boundaries") {
    import org.apache.spark.sql.expressions.Window
    // few groups (the low-cardinality shape the helper exists for), many
    // rows per group so every slice boundary stitches, NULL values mixed
    // in (a null predecessor must come through as null, never re-pulled
    // from an earlier slice), and a null group
    val df = (1 to 5000).map(i =>
      (if (i % 11 == 0) null else s"t${i % 3}", i.toLong,
        if (i % 7 == 0) null else java.lang.Long.valueOf((i * 13 % 97).toLong)))
      .toDF("g", "ord", "v")
    // smallInputBytes = 0 pins the two-phase branch (the property under test)
    val got = graft.operators.GlobalRank.groupedLag(
        df.repartition(23), Seq("g"), Seq(col("ord")), "v", "prev",
        smallInputBytes = 0L)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)) ->
        Option(r.getAs[java.lang.Long]("prev"))).toMap
    val expect = df
      .withColumn("prev", lag(col("v"), 1).over(
        Window.partitionBy(col("g")).orderBy(col("ord"))))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)) ->
        Option(r.getAs[java.lang.Long]("prev"))).toMap
    assert(got == expect)
    // the r15 small-input dispatch (default bound) must return the same rows
    assert(graft.operators.GlobalRank.groupedLag(
        df.repartition(23), Seq("g"), Seq(col("ord")), "v", "prev")
      .collect().map(r => (Option(r.getString(0)), r.getLong(1)) ->
        Option(r.getAs[java.lang.Long]("prev"))).toMap == expect)
    // empty input
    val empty = Seq.empty[(String, Long, Long)].toDF("g", "ord", "v")
    assert(graft.operators.GlobalRank.groupedLag(empty, Seq("g"),
      Seq(col("ord")), "v", "prev").count() == 0)
  }

  test("fused rank+prefix-sum helpers equal their window forms, totals included") {
    import org.apache.spark.sql.expressions.Window
    // same adversarial shape as the grouped tests: heavy ties, few groups,
    // one null group, negative weights
    val df = (1 to 2000).map(i =>
      (i.toLong, if (i % 5 == 0) null else s"g${i % 3}", ((i * 37 % 23) - 5).toLong))
      .toDF("id", "g", "w")
    // grouped prefix sum with total
    val got = graft.operators.GlobalRank.groupedPrefixSumWithTotal(
        df.repartition(17), Seq("g"), Seq(col("id")), "w", "cw", "tw",
        smallInputBytes = 0L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((BigDecimal(r.getAs[java.math.BigDecimal]("cw")),
          BigDecimal(r.getAs[java.math.BigDecimal]("tw"))))).toMap
    val expect = df
      .withColumn("cw", sum(col("w")).over(Window.partitionBy(col("g"))
        .orderBy(col("id")).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("tw", sum(col("w")).over(Window.partitionBy(col("g"))))
      .collect().map(r => r.getAs[Long]("id") ->
        ((BigDecimal(r.getAs[Long]("cw")), BigDecimal(r.getAs[Long]("tw"))))).toMap
    assert(got == expect)
    // global fused rank + prefix sum + grand totals
    val gotG = graft.operators.GlobalRank.globalRowNumberAndPrefixSum(
        df.repartition(13), Seq(col("w"), col("id")), "w", "rn", "cw", "n", "tv",
        smallInputBytes = 0L)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("rn"), BigDecimal(r.getAs[java.math.BigDecimal]("cw")),
          r.getAs[Long]("n"), BigDecimal(r.getAs[java.math.BigDecimal]("tv"))))).toMap
    val w = Window.orderBy(col("w"), col("id"))
    val expectG = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cw", sum(col("w")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(df.agg(count(lit(1)).as("n"), sum(col("w")).as("tv")))
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("rn"), BigDecimal(r.getAs[Long]("cw")),
          r.getAs[Long]("n"), BigDecimal(r.getAs[Long]("tv"))))).toMap
    assert(gotG == expectG)
    // the r15 small-input dispatch (default bound) must return the same rows
    assert(graft.operators.GlobalRank.groupedPrefixSumWithTotal(
        df.repartition(17), Seq("g"), Seq(col("id")), "w", "cw", "tw")
      .collect().map(r => r.getAs[Long]("id") ->
        ((BigDecimal(r.getAs[java.math.BigDecimal]("cw")),
          BigDecimal(r.getAs[java.math.BigDecimal]("tw"))))).toMap == expect)
    assert(graft.operators.GlobalRank.globalRowNumberAndPrefixSum(
        df.repartition(13), Seq(col("w"), col("id")), "w", "rn", "cw", "n", "tv")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("rn"), BigDecimal(r.getAs[java.math.BigDecimal]("cw")),
          r.getAs[Long]("n"), BigDecimal(r.getAs[java.math.BigDecimal]("tv"))))).toMap
      == expectG)
  }

  test("salted two-phase topNgrams equals the naive group-window ranking") {
    import org.apache.spark.sql.expressions.Window
    // many colliding ngrams across few groups; salts=3 forces heavy
    // cross-salt competition so the subset property genuinely carries
    val words = Array("a", "b", "c", "d", "e", "f", "g")
    val df = (1 to 400).map { i =>
      val txt = (0 until 12).map(j => words((i * 7 + j * 3) % words.length))
        .mkString(" ")
      (i.toLong, txt, s"g${i % 2}")
    }.toDF("doc_id", "text", "grp")
    val fast = graft.llm.TextAnalysis.topNgrams(df, "grp", "text", n = 2, k = 4,
        salts = 3)
      .collect().map(r => (r.getString(0), r.getAs[Int]("rnk"),
        r.getString(2), r.getAs[Long]("n"))).toSet
    val counts = df
      .select(col("grp"), graft.functions.ColumnFns.tokens(col("text")).as("t"))
      .select(col("grp"), explode(graft.functions.ColumnFns.shingles(col("t"), 2)).as("ngram"))
      .groupBy("grp", "ngram").agg(count(lit(1)).as("n"))
    val naive = counts.withColumn("rnk", row_number().over(
        Window.partitionBy("grp").orderBy(col("n").desc, col("ngram"))))
      .filter(col("rnk") <= 4)
      .collect().map(r => (r.getString(0), r.getAs[Int]("rnk"),
        r.getString(1), r.getAs[Long]("n"))).toSet
    assert(fast == naive)
  }

  test("globalPrefixSum equals the single-task cumulative sum under any partitioning") {
    // negative weights included: the decimal accumulators must carry sign
    val df = (1 to 2000).map(i => (i.toLong, ((i * 37 % 23) - 5).toLong))
      .toDF("id", "w")
    def cum(d: org.apache.spark.sql.DataFrame): Map[Long, BigDecimal] =
      graft.operators.GlobalRank.globalPrefixSum(d, Seq(col("id")), "w", "cw",
          smallInputBytes = 0L)
        .collect()
        .map(r => r.getAs[Long]("id") -> BigDecimal(r.getAs[java.math.BigDecimal]("cw")))
        .toMap
    var run = 0L
    val expect = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).map { case (id, w) => run += w; id -> BigDecimal(run) }.toMap
    assert(cum(df) == expect)
    assert(cum(df.repartition(17)) == expect) // physical layout must not matter
    // the r15 small-input dispatch (default bound) must return the same rows
    assert(graft.operators.GlobalRank.globalPrefixSum(df, Seq(col("id")), "w", "cw")
      .collect()
      .map(r => r.getAs[Long]("id") -> BigDecimal(r.getAs[java.math.BigDecimal]("cw")))
      .toMap == expect)
  }

  test("KmvBottomK equals sorted-distinct-take-k for arbitrary long multisets") {
    val rows = (1 to 3000).map(i =>
      (s"g${i % 4}", ((i * 2654435761L) % 500) & 0x0FFFFFFFFFFFFFFFL))
    val df = rows.toDF("g", "h")
    val got = df.groupBy(col("g"))
      .agg(graft.operators.Sketches.bottomK(col("h"), 24).as("bk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val expect = rows.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(_._2).distinct.sorted.take(24).toSeq
    }
    assert(got == expect)
    // merge path: pre-partitioned partials re-merge to the same bottom-k
    val merged = df.repartition(11).groupBy(col("g"))
      .agg(graft.operators.Sketches.bottomK(col("h"), 24).as("bk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(merged == expect)
  }

  test("winnowing equals the literal SWA algorithm on random corpora (ties included)") {
    // independent in-memory reference: the paper's algorithm verbatim —
    // k-gram md5-base hashes, per-window min with RIGHTMOST tie, dedupe.
    // A tiny vocabulary forces repeated grams, so the tie rule is
    // genuinely exercised (equal hashes inside one window).
    def md5_30(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16) % 1073741824L
    }
    def ref(tokens: Seq[String], k: Int = 3, w: Int = 4): Set[(Long, Long)] = {
      val grams =
        if (tokens.length >= k) tokens.sliding(k).map(_.mkString(" ")).toVector
        else Vector(tokens.mkString(" "))
      val hs = grams.map(md5_30)
      if (hs.length < w) Set.empty
      else (0 to hs.length - w).map { j =>
        val (h, i) = (j until j + w).map(i => (hs(i), i)).minBy(t => (t._1, -t._2))
        (h, i.toLong)
      }.toSet
    }
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    val rnd = new scala.util.Random(42)
    val docs = (0 until 300).map { i =>
      val n = rnd.nextInt(31) // 0..30 tokens
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val got = graft.llm.TextAnalysis.winnowFingerprints(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.map(r => (r.getAs[Long]("fp_hash"), r.getAs[Long]("fp_pos"))).toSet
      }
    docs.foreach { case (id, text) =>
      val want = ref(if (text.isEmpty) Seq("") else text.split(" ").toSeq)
      assert(got.getOrElse(id, Set.empty) == want,
        s"doc $id ('$text'): got ${got.getOrElse(id, Set.empty)} want $want")
    }
  }

  test("spatial radius join equals the quadratic scan, including cell-boundary pairs") {
    import graft.operators.SpatialJoin
    val pts = (0L until 300L).map(i =>
      (i, (i * 7919) % 2000, (i * 104729) % 2000)).toDF("id", "x", "y")
    val probes = (0L until 8L).map(i =>
      (1000L + i, i * 250, 1999L - i * 250)).toDF("id", "x", "y")
    val viaCells = SpatialJoin.radiusJoin(pts, probes, "id", "x", "y", 150L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val naive = probes.select(col("id").as("probe_id"),
        col("x").as("qx"), col("y").as("qy"))
      .crossJoin(pts.select(col("id").as("point_id"),
        col("x").as("px"), col("y").as("py")))
      .withColumn("dist2", (col("px") - col("qx")) * (col("px") - col("qx"))
        + (col("py") - col("qy")) * (col("py") - col("qy")))
      .filter(col("dist2") <= 150L * 150L)
      .select("probe_id", "point_id", "dist2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaCells == naive, s"cell join diverged: ${viaCells.size} vs ${naive.size}")
    assert(naive.nonEmpty)
  }

  test("spatial radius join enforces the [0, 2^31) coordinate domain at scan time") {
    import graft.operators.SpatialJoin
    val good = Seq((1L, 10L, 10L)).toDF("id", "x", "y")
    // negative coordinate: packed-cell key would collide across rows
    val neg = Seq((2L, -5L, 10L)).toDF("id", "x", "y")
    val e1 = intercept[Exception] {
      SpatialJoin.radiusJoin(neg, good, "id", "x", "y", 100L).collect()
    }
    assert(e1.getMessage.contains("outside [0, 2^31)"), e1.getMessage)
    // >= 2^31: dist2 squares could wrap Long — must raise, not silently
    // admit/drop boundary pairs
    val huge = Seq((3L, (1L << 31) + 7L, 10L)).toDF("id", "x", "y")
    val e2 = intercept[Exception] {
      SpatialJoin.radiusJoin(good, huge, "id", "x", "y", 100L).collect()
    }
    assert(e2.getMessage.contains("outside [0, 2^31)"), e2.getMessage)
    // boundary-legal max coordinate still joins exactly
    val m = (1L << 31) - 1L
    val maxPts = Seq((4L, m, m)).toDF("id", "x", "y")
    val got = SpatialJoin.radiusJoin(maxPts, maxPts, "id", "x", "y", 3L).collect()
    assert(got.length == 1 && got(0).getAs[Long]("dist2") == 0L)
  }

  test("interleaved AVI round-trips both streams for arbitrary geometry (frames = still JPEG twins, samples exact)") {
    import graft.llm.Multimodal
    // block-constant pixels round-trip the DCT exactly, so every decoded
    // frame must be byte-identical to the SAME pixel function through the
    // still JPEG codec; audio must be the exact generator samples; and
    // every-k sampling must keep exactly the k-strided frame indices.
    check("aviRoundTrip", Prop.forAll(
      Gen.chooseNum(9, 24), Gen.chooseNum(7, 20), Gen.chooseNum(1, 6),
      Gen.chooseNum(10, 120), Gen.chooseNum(1, 4), Gen.chooseNum(0, 1000)) {
      (w, h, nf, spf, every, seed) =>
        val px = (f: Int) => (x: Int, y: Int) =>
          (((x / 8) * 57 + (y / 8) * 23 + f * 19 + seed) % 256,
            ((x / 8) * 31 + (y / 8) * 11 + f * 5 + seed * 3) % 256,
            ((x / 8) * 17 + (y / 8) * 29 + f * 3 + seed * 7) % 256)
        val gen = (f: Int) => (i: Int) => ((f * spf + i) * 13 + seed * 17) % 2048 - 1024
        val avi = Multimodal.encodeAviMjpegPcm(w, h, nf, px, 8000, spf, gen)
        val video = Multimodal.decodeAviMjpegFrames(avi, every)
        val audio = Multimodal.decodeAviPcm(avi)
        val videoOk = video.exists { case (dw, dh, dn, frames) =>
          dw == w && dh == h && dn == nf &&
            frames.map(_._1) == (0 until nf by every) &&
            frames.forall { case (f, rgb) =>
              Multimodal.decodeJpegRgb(Multimodal.encodeJpeg(w, h, px(f)))
                .exists { case (_, _, still) => java.util.Arrays.equals(rgb, still) }
            }
        }
        val audioOk = audio.exists { case (rate, s) =>
          rate == 8000 && s.length == nf * spf &&
            s.indices.forall(j => s(j) == gen(j / spf)(j % spf).toShort)
        }
        videoOk && audioOk
    })
  }

  test("interval overlap join equals the theta join and is bucket-size invariant") {
    import graft.operators.IntervalJoin
    // deterministic pseudo-random intervals: starts/lengths from a hash
    val a = (0L until 80L).map(i =>
      (s"a$i", (i * 7919) % 5000, (i * 7919) % 5000 + (i * 104729) % 900))
      .toDF("id", "s", "e")
    val b = (0L until 60L).map(i =>
      (s"b$i", (i * 6271) % 5000, (i * 6271) % 5000 + (i * 31) % 1200))
      .toDF("id", "s", "e")
    def run(bucket: Long) =
      IntervalJoin.overlapJoin(a, b, "id", "s", "e", "id", "s", "e", bucket)
        .select("a_id", "b_id", "overlap_s")
        .collect().map(_.toSeq).toSet
    val naive = a.select(col("id").as("a_id"), col("s").as("a_s"), col("e").as("a_e"))
      .crossJoin(b.select(col("id").as("b_id"), col("s").as("b_s"), col("e").as("b_e")))
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select(col("a_id"), col("b_id"),
        (least(col("a_e"), col("b_e")) - greatest(col("a_s"), col("b_s"))).as("overlap_s"))
      .collect().map(_.toSeq).toSet
    val r100 = run(100L)
    assert(r100 == naive, "bucketized join diverged from the theta join")
    // the bucket width is a PERFORMANCE knob, never a semantics knob
    assert(run(1L) == r100 && run(10000L) == r100)
  }
}
