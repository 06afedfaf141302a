package graft

import graft.functions.{HashFunctions, VectorFunctions}
import org.apache.spark.sql.functions._

/** Properties of the custom Catalyst expressions: simhash locality,
  * rolling-hash order sensitivity, cosine correctness vs a plain Scala
  * computation, and interpreted-vs-codegen agreement.
  */
class HashFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def simhashOf(tokens: Seq[String]): Long =
    Seq(Tuple1(tokens)).toDF("t").select(HashFunctions.simhash64(col("t"))).head().getLong(0)

  test("simhash: near-identical token sets land at small Hamming distance, unrelated far") {
    val base = (1 to 120).map(i => s"tok$i")
    val nearDup = base.updated(5, "CHANGED").updated(50, "ALSO")
    val unrelated = (1 to 120).map(i => s"other$i")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val (hb, hn, hu) = (simhashOf(base), simhashOf(nearDup), simhashOf(unrelated))
    assert(ham(hb, hn) <= 12, s"near-dup hamming ${ham(hb, hn)}")
    assert(ham(hb, hu) >= 20, s"unrelated hamming ${ham(hb, hu)}")
  }

  test("rolling hash is order-sensitive; simhash is order-insensitive") {
    val t = Seq("a", "b", "c", "d")
    def roll(ts: Seq[String]) =
      Seq(Tuple1(ts)).toDF("t").select(HashFunctions.rollingHash(col("t"))).head().getLong(0)
    assert(roll(t) != roll(t.reverse))
    assert(simhashOf(t) == simhashOf(t.reverse))
  }

  test("cosine expression matches plain Scala computation") {
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    val got = Seq((a, b)).toDF("a", "b")
      .select(VectorFunctions.cosineSim(col("a"), col("b"))).head().getDouble(0)
    def d(x: Array[Float], y: Array[Float]) =
      x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
    val want = d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b)))
    assert(math.abs(got - want) < 1e-15)
  }

  test("expressions agree between codegen and interpreted eval") {
    val df = Seq((Seq("x", "y", "z"), Array(1f, 2f, 3f))).toDF("toks", "vec")
    val withCodegen = df.select(
      HashFunctions.simhash64(col("toks")), HashFunctions.rollingHash(col("toks")),
      VectorFunctions.cosineSim(col("vec"), col("vec"))).head()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.select(
        HashFunctions.simhash64(col("toks")), HashFunctions.rollingHash(col("toks")),
        VectorFunctions.cosineSim(col("vec"), col("vec"))).head()
      assert(withCodegen == interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("priorityHash column expression == reference kernel, non-negative, codegen == interpreted") {
    val keys = Seq(0L, 1L, -1L, 42L, Long.MaxValue, Long.MinValue, 123456789L)
    val df = keys.toDF("k")
    val got = df.select(HashFunctions.priorityHash(col("k"), 7L)).collect().map(_.getLong(0))
    // reference: the same splitmix finalizer, computed directly
    val want = keys.map { v =>
      var h = v * 0x9e3779b97f4a7c15L + 7L
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
      h & Long.MaxValue
    }
    assert(got.toSeq == want)
    assert(got.forall(_ >= 0L))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(HashFunctions.priorityHash(col("k"), 7L)).collect().map(_.getLong(0))
      assert(interp.toSeq == got.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("shingleStringsAll preserves duplicates; distinct of it equals shingleStrings") {
    val df = Seq(
      (1L, Seq("a", "b", "a", "b", "a", "b")), // "a b a" and "b a b" repeat
      (2L, Seq("x", "y", "z")),
      (3L, Seq("p", "q"))                      // shorter than one 3-gram
    ).toDF("id", "toks")
    val got = df.select(col("id"),
      HashFunctions.shingleStringsAll(col("toks"), 3).as("all"),
      HashFunctions.shingleStrings(col("toks"), 3).as("dedup"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[String](1), r.getSeq[String](2)))).toMap
    assert(got(1L)._1 == Seq("a b a", "b a b", "a b a", "b a b"))
    assert(got(1L)._2 == Seq("a b a", "b a b"))
    assert(got(2L)._1 == Seq("x y z") && got(2L)._2 == Seq("x y z"))
    assert(got(3L)._1.isEmpty && got(3L)._2.isEmpty)
    // interpreted eval agrees with codegen
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(col("id"), HashFunctions.shingleStringsAll(col("toks"), 3))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
      assert(interp(1L) == got(1L)._1 && interp(3L).isEmpty)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("minhash signature: more similar sets share more signature positions") {
    val base = (1 to 100).map(i => s"g$i")
    val near = base.drop(5) ++ Seq("n1", "n2", "n3", "n4", "n5")
    val far = (1 to 100).map(i => s"z$i")
    val df = Seq(("base", base), ("near", near), ("far", far)).toDF("k", "toks")
      .select(col("k"), HashFunctions.minhashSignature(col("toks"), 32).as("sig"))
    val sigs = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    def agree(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y }
    assert(agree(sigs("base"), sigs("near")) > agree(sigs("base"), sigs("far")))
    assert(agree(sigs("base"), sigs("near")) >= 16) // j≈0.9 → E[agree]≈29/32
  }

  // Plain-Scala winnowing reference: fnv1a over 0x1f-joined n-grams (the
  // HashOps.shingleHash contract), rightmost min per w-window, positions
  // deduped in order.
  private def winnowRef(tokens: Seq[String], n: Int, w: Int): Seq[Long] = {
    val hs = tokens.sliding(n).map(g =>
      graft.functions.HashOps.fnv1a(g.mkString("\u001f").getBytes("UTF-8"))).toVector
    val nWin = math.max(1, hs.length - w + 1)
    val picks = (0 until nWin).map { i =>
      val end = math.min(i + w, hs.length)
      (i until end).reverse.minBy(hs) // reversed → first minimal = rightmost
    }
    picks.distinct.map(hs)
  }

  test("winnowing: kernel == reference, window guarantee, short-doc null") {
    val rnd = new scala.util.Random(4711)
    val docs = (1L to 40L).map { id =>
      // small vocab → frequent hash ties, exercising the rightmost tie-break
      val nTok = 3 + rnd.nextInt(60)
      (id, Seq.fill(nTok)(s"w${rnd.nextInt(7)}"))
    } :+ (98L, Seq("a", "b")) :+ (99L, Seq.empty[String])
    val df = docs.toDF("id", "toks")
    val got = df.select(col("id"), HashFunctions.winnowFingerprints(col("toks"), 3, 4))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    docs.foreach { case (id, toks) =>
      if (toks.length < 3) assert(got(id) == null, s"doc $id: expected null for short doc")
      else {
        val want = winnowRef(toks, 3, 4)
        assert(got(id) == want, s"doc $id: kernel ${got(id)} != reference $want")
        // the winnowing guarantee: every window of w consecutive shingles
        // contains a selected fingerprint (selected values suffice to check
        // via the reference positions, which the kernel just matched)
        val hs = toks.sliding(3).map(g =>
          graft.functions.HashOps.fnv1a(g.mkString("\u001f").getBytes("UTF-8"))).toVector
        val selPos = hs.indices.filter(i => want.contains(hs(i))).toSet
        (0 until math.max(1, hs.length - 3)).foreach { i =>
          assert((i until math.min(i + 4, hs.length)).exists(selPos),
            s"doc $id: window at $i has no fingerprint")
        }
      }
    }
    // interpreted eval agrees with codegen
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(col("id"), HashFunctions.winnowFingerprints(col("toks"), 3, 4))
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
      assert(interp == got)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }
}
