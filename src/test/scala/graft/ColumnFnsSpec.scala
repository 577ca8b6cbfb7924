package graft

import org.apache.spark.sql.functions._

import graft.functions.ColumnFns._

/** Roundtrip / invariant laws for the column primitives (SURVEY §5.3),
  * driven by seeded random data through real Spark plans. */
class ColumnFnsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val hexes: Seq[String] = (1 to 200).map { _ =>
    val n = 1 + rnd.nextInt(32)
    "0x" + Seq.fill(n)("0123456789abcdef"(rnd.nextInt(16))).mkString * 2
  } // even-length hex bodies

  test("hex -> binary -> hex roundtrip identity (incl. empty and null)") {
    val df = (hexes :+ "0x").map(Tuple1(_)).toDF("h")
      .union(Seq(Tuple1(null.asInstanceOf[String])).toDF("h"))
    val out = df.select($"h", binaryToHex(hexToBinary($"h")).as("rt")).collect()
    out.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1))
      else assert(r.getString(1) == r.getString(0), s"roundtrip failed for ${r.getString(0)}")
    }
  }

  test("blockIdGroup is total, monotone, and exact on the int domain") {
    val ids = (0 until 500).map(_ => rnd.nextInt(Int.MaxValue).toLong) :+ 0L :+ Int.MaxValue.toLong
    val out = ids.toDF("id").select($"id", blockIdGroup($"id").as("g"))
      .orderBy("id").collect()
    out.foreach(r => assert(r.getInt(1) == (r.getLong(0) / 1000L).toInt))
    out.sliding(2).foreach {
      case Array(a, b) => assert(a.getInt(1) <= b.getInt(1))
      case _ =>
    }
  }

  test("txHashPrefix is a prefix of the hash body") {
    val out = hexes.map(Tuple1(_)).toDF("h")
      .select($"h", txHashPrefix($"h").as("p")).collect()
    out.foreach(r => assert(r.getString(0).substring(2).startsWith(r.getString(1))))
  }

  test("md5Long is deterministic, positive, < 2^60, and seed-independent families differ") {
    val words = Seq("alpha", "beta", "gamma", "")
    val df = words.map(Tuple1(_)).toDF("w")
    val a = df.select(md5Long($"w").as("h")).collect().map(_.getLong(0))
    val b = df.select(md5Long($"w").as("h")).collect().map(_.getLong(0))
    assert(a.toSeq == b.toSeq)
    assert(a.forall(h => h >= 0 && h < (1L << 60)))
    val s0 = df.select(md5LongSeeded(0, $"w")).collect().map(_.getLong(0))
    val s1 = df.select(md5LongSeeded(1, $"w")).collect().map(_.getLong(0))
    assert(s0.toSeq != s1.toSeq)
  }

  test("native shingles expression is bit-identical to the HOF chain") {
    // includes a NULL token array: the chain's when(null >= k) falls to
    // otherwise and concat_ws skips the null array, giving [""] — the
    // native kernel must match, so null-text docs cluster with empty-text
    // docs in dedup banding instead of silently dropping out
    val df = (Seq(
      Seq("a", "b", "c", "d"), Seq("x", "y"), Seq("solo"), Seq.empty[String],
      Seq("héllo", "🎉", "wörld", "z"))
      .map(Option(_)) :+ None)
      .map(Tuple1(_)).toDF("ts")
    val viaHof = {
      val t = col("ts")
      val slid = transform(sequence(lit(0), size(t) - 3),
        i => concat_ws(" ", slice(t, i + 1, lit(3))))
      when(size(t) >= 3, slid).otherwise(array(concat_ws(" ", t)))
    }
    val out = df.select(shingles(col("ts"), 3).as("native"), viaHof.as("hof"))
      .collect()
    out.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), r))
    // null tokens inside a gram are skipped (concat_ws semantics)
    val withNull = Seq(Tuple1(Seq(Some("a"), None, Some("b"), Some("c"))))
      .toDF("ts")
      .select(shingles(col("ts"), 3).as("s")).collect()(0).getSeq[String](0)
    assert(withNull == Seq("a b", "b c")) // grams [a,null,b] and [null,b,c]
  }

  test("native md5Long expression is bit-identical to the hex-string formula") {
    // the contract every DuckDB oracle relies on: md5Long(x) ==
    // conv(substring(md5(x),1,15),16,10) — exercised over ASCII, unicode
    // (multi-byte UTF-8), the empty string, and null
    val words = Seq("alpha", "beta gamma", "", "héllo 🎉 wörld", "0x" + "ab" * 32)
    val df = (words.map(Option(_)) :+ None).map(Tuple1(_)).toDF("w")
    val out = df.select(
      md5Long($"w").as("native"),
      conv(substring(org.apache.spark.sql.functions.md5($"w"), 1, 15), 16, 10)
        .cast("long").as("viaHex")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1), r.toString)
    }
    // inside a higher-order lambda (the MinHash hot path) and via SQL name
    graft.functions.GraftFunctions.register(spark)
    val hof = Seq(Seq("a", "b", "c")).toDF("ts")
      .select(transform($"ts", t => md5Long(t)).as("hs"),
        expr("transform(ts, t -> graft_md5_long(t))").as("sqls"))
      .collect()(0)
    assert(hof.getSeq[Long](0) == hof.getSeq[Long](1))
  }

  test("shingles: k-grams count and short-document fallback") {
    val df = Seq("a b c d e", "x y").map(Tuple1(_)).toDF("t")
    val out = df.select(shingles(tokens($"t"), 3).as("s")).collect()
    assert(out(0).getSeq[String](0) == Seq("a b c", "b c d", "c d e"))
    assert(out(1).getSeq[String](0) == Seq("x y")) // < k tokens -> whole doc
  }

  test("rollingFingerprint is order-sensitive and stable") {
    val df = Seq("a b c", "c b a", "a b c").map(Tuple1(_)).toDF("t")
    val fp = df.select(rollingFingerprint(tokens($"t")).as("f")).collect().map(_.getLong(0))
    assert(fp(0) == fp(2))
    assert(fp(0) != fp(1))
    assert(fp.forall(f => f >= 0 && f < 1000000007L))
  }

  test("dotProduct matches a reference computation") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val d = df.select(dotProduct($"a", $"b")).collect()(0).getDouble(0)
    assert(math.abs(d - 32.0) < 1e-12)
  }

  test("mortonInterleave: known codes, JVM cross-check, order isomorphism") {
    // x=0b11, y=0b01 -> z = x0<<0 | y0<<1 | x1<<2 | y1<<3 = 1+2+4 = 7
    val rnd = new scala.util.Random(11)
    val pts = (0 until 300).map(_ => (rnd.nextInt(1 << 16).toLong,
      rnd.nextInt(1 << 16).toLong)) :+ ((3L, 1L))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", mortonInterleave($"x", $"y").as("z")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def jvmMorton(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1) << (2 * i)) |
        (((y >> i) & 1) << (2 * i + 1))).sum
    assert(got((3L, 1L)) == 7L)
    pts.foreach { case (x, y) => assert(got((x, y)) == jvmMorton(x, y)) }
  }
}
