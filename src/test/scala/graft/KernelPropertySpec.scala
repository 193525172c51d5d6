package graft

import graft.operators.{Dedup, TfIdf}
import org.apache.spark.sql.functions._

/** Randomized equivalence checks for the hot kernels against
  * brute-force Scala references (seeded generation, same pattern as
  * MergePropertySpec — no scalatestplus bridge in the offline cache):
  *
  *  - the capped inverted-index pair kernel (graft_posting_pairs)
  *    against per-pair set intersection over the same shingle
  *    semantics, with and without the maxDocFreq prune;
  *  - the distributed min-label-propagation regime of
  *    connectedComponents against the driver union-find regime on the
  *    same random graphs (the distributed loop otherwise only runs on
  *    over-threshold graphs no spec exercises);
  *  - BM25 against a direct mirror of the formula with the identical
  *    double-operation order and 6dp decimal accumulation.
  */
class KernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(1234)

  // ---- reference tokenize/shingle semantics (TextAnalysis/WordShingles)

  private def toks(s: String): Vector[String] =
    s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toVector

  private def shingleSet(s: String, n: Int): Set[String] = {
    val ts = toks(s)
    if (ts.length <= n) Set(ts.mkString(" "))
    else ts.sliding(n).map(_.mkString(" ")).toSet
  }

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta")

  private def randomDoc(len: Int): String =
    Vector.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  test("jaccardPairs matches brute-force set intersection (8 random corpora)") {
    for (trial <- 1 to 8) {
      val docs = (0 until 6 + rnd.nextInt(8)).map(i =>
        (i.toLong, randomDoc(3 + rnd.nextInt(8))))
      val cap = if (trial % 2 == 0) 0L else 3L
      val got = Dedup.jaccardPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", n = 2, threshold = 0.2, maxDocFreq = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

      val sh = docs.map { case (id, t) => id -> shingleSet(t, 2) }.toMap
      val df = sh.values.toSeq.flatten.groupBy(identity).map {
        case (s, occ) => s -> occ.size.toLong
      }
      val expected = (for {
        i <- docs.indices; j <- i + 1 until docs.size
        a = docs(i)._1; b = docs(j)._1
        common = (sh(a) & sh(b)).count(s => cap <= 0 || df(s) <= cap)
        if common >= 1
        jac = round6(common.toDouble / (sh(a).size + sh(b).size - common))
        if jac >= 0.2
      } yield (a, b) -> jac).toMap
      assert(got == expected, s"trial $trial cap=$cap docs=$docs")
    }
  }

  test("removeDuplicatedSegments matches brute force (6 random corpora)") {
    for (trial <- 1 to 6) {
      // docs are '.'-joined segments drawn from a small segment pool so
      // cross-doc repeats occur naturally; some docs get doubled spaces
      // and case flips to exercise the normalization
      val pool = Vector("alpha beta", "gamma  delta", "Eps Zeta", "eta",
        "theta alpha", "beta gamma", "", " ")
      val docs = (0 until 5 + rnd.nextInt(6)).map { i =>
        val n = 1 + rnd.nextInt(5)
        (i.toLong, Vector.fill(n)(pool(rnd.nextInt(pool.size))).mkString("."))
      }
      val cap = 1L + rnd.nextInt(2)
      val got = graft.operators.Corpus.removeDuplicatedSegments(
          docs.toDF("doc_id", "text"), "doc_id", "text", maxDocFreq = cap)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      graft.Caches.release(spark)

      def norm(s: String) = s.toLowerCase.replaceAll("\\s+", " ").trim
      val segsOf = docs.map { case (id, t) =>
        id -> t.split("\\.", -1).toVector.filter(_.trim.nonEmpty)
      }.toMap
      val docFreq = segsOf.toSeq
        .flatMap { case (id, ss) => ss.map(norm).distinct.map(_ -> id) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct.size }
      val expected = docs.map { case (id, _) =>
        val ss = segsOf(id)
        val keep = ss.filter(s => docFreq(norm(s)) <= cap)
        id -> ((keep.mkString("."), ss.size.toLong, (ss.size - keep.size).toLong))
      }.toMap
      assert(got == expected, s"trial $trial cap=$cap docs=$docs")
    }
  }

  test("identical docs: cap prunes every shingle to zero pairs; uncapped is all-1.0") {
    val docs = (0L until 5L).map(i => (i, "alpha beta gamma delta eps"))
    val df = docs.toDF("doc_id", "text")
    // every shingle appears in all 5 docs → df=5 > cap=3 → every posting
    // list overflows, so the prune leaves NO pairs at all
    assert(Dedup.jaccardPairs(df, "doc_id", "text", n = 2,
      threshold = 0.0, maxDocFreq = 3L).isEmpty)
    // uncapped, the same corpus is a clique of exact duplicates
    val all = Dedup.jaccardPairs(df, "doc_id", "text", n = 2,
        threshold = 0.9, maxDocFreq = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(all.length == 5 * 4 / 2)
    assert(all.forall(_._3 == 1.0))
  }

  test("distributed label propagation equals driver union-find (4 random graphs)") {
    for (trial <- 1 to 4) {
      val ids = (0L until (6 + rnd.nextInt(8)).toLong).toVector
      val pairs = (0 until 4 + rnd.nextInt(8)).map { _ =>
        val a = ids(rnd.nextInt(ids.size)); val b = ids(rnd.nextInt(ids.size))
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      if (pairs.nonEmpty) {
        val pdf = pairs.toDF("id1", "id2")
        val viaDriver = Dedup.connectedComponents(pdf)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // driverThreshold=0 forces the iterative regime on the same graph
        val viaDist = Dedup.connectedComponents(pdf, driverThreshold = 0L)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(viaDist == viaDriver, s"trial $trial pairs=$pairs")
        // sanity against a third, independent reference: union-find here
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
        }
        pairs.foreach { case (a, b) =>
          parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb
        }
        val members = parent.keys.toSeq.groupBy(find)
        val expected = members.values.flatMap { ms =>
          val m = ms.min; ms.map(_ -> m)
        }.toMap
        assert(viaDriver == expected, s"trial $trial pairs=$pairs")
      }
    }
  }

  test("PDF codec round-trips on random byte arrays (LZW, ASCIIHex, ASCII85)") {
    import graft.sources.Documents
    // reference encoders mirroring the spec forms (PipelineSpec builds
    // fixtures with the same logic; here the INPUTS are adversarial:
    // random bytes, all-zero runs, high-bit bytes, empty)
    def lzwEncode(data: Array[Byte]): Array[Byte] = {
      val dict = scala.collection.mutable.HashMap.empty[Seq[Byte], Int]
      (0 until 256).foreach(i => dict(Seq(i.toByte)) = i)
      var next = 258; var width = 9
      val out = new java.io.ByteArrayOutputStream()
      var bitBuf = 0L; var bits = 0
      def put(code: Int): Unit = {
        bitBuf = (bitBuf << width) | code; bits += width
        while (bits >= 8) {
          out.write(((bitBuf >>> (bits - 8)) & 0xFF).toInt); bits -= 8
        }
      }
      put(256)
      var cur = Seq.empty[Byte]
      data.foreach { b =>
        val ext = cur :+ b
        if (dict.contains(ext)) cur = ext
        else {
          put(dict(cur)); dict(ext) = next; next += 1
          if (next >= (1 << width) && width < 12) width += 1
          cur = Seq(b)
        }
      }
      if (cur.nonEmpty) put(dict(cur))
      put(257)
      if (bits > 0) out.write(((bitBuf << (8 - bits)) & 0xFF).toInt)
      out.toByteArray
    }
    def hexEncode(data: Array[Byte]): Array[Byte] =
      (data.map("%02X".format(_)).mkString + ">").getBytes("ISO-8859-1")
    def a85Encode(data: Array[Byte]): Array[Byte] = {
      val out = new StringBuilder
      data.grouped(4).foreach { g =>
        if (g.length == 4 && g.forall(_ == 0)) out.append('z')
        else {
          var v = 0L
          (0 until 4).foreach(i =>
            v = (v << 8) | (if (i < g.length) g(i) & 0xFFL else 0L))
          val cs = new Array[Char](5)
          (4 to 0 by -1).foreach { i =>
            cs(i) = ('!' + (v % 85).toInt).toChar; v /= 85
          }
          out.appendAll(cs, 0, g.length + 1)
        }
      }
      out.append("~>").toString.getBytes("ISO-8859-1")
    }
    def rlEncode(data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      while (i < data.length) {
        var run = 1
        while (i + run < data.length && data(i + run) == data(i) && run < 128)
          run += 1
        if (run >= 2) {
          out.write(257 - run); out.write(data(i)); i += run
        } else {
          var lit = 1
          while (i + lit < data.length && lit < 128 &&
              (i + lit + 1 >= data.length || data(i + lit + 1) != data(i + lit)))
            lit += 1
          out.write(lit - 1); out.write(data, i, lit); i += lit
        }
      }
      out.write(128)
      out.toByteArray
    }
    val cases = Seq(
      Array.emptyByteArray,
      Array.fill(4096)(0.toByte),
      Array.tabulate(997)(i => (i * 131 % 251).toByte)) ++
      (1 to 6).map(t => Array.fill(200 + rnd.nextInt(2000))(rnd.nextInt(256).toByte))
    cases.foreach { data =>
      assert(Documents.lzwDecode(lzwEncode(data)).map(_.toSeq).contains(data.toSeq),
        s"lzw len=${data.length}")
      assert(Documents.asciiHexDecode(hexEncode(data)).map(_.toSeq).contains(data.toSeq),
        s"hex len=${data.length}")
      assert(Documents.ascii85Decode(a85Encode(data)).map(_.toSeq).contains(data.toSeq),
        s"a85 len=${data.length}")
      assert(Documents.runLengthDecode(rlEncode(data)).map(_.toSeq).contains(data.toSeq),
        s"rl len=${data.length}")
    }
  }

  test("bm25 matches a direct formula mirror (5 random corpora)") {
    val (k1, b) = (1.2, 0.75)
    for (trial <- 1 to 5) {
      val docs = (0 until 5 + rnd.nextInt(6)).map(i =>
        (i.toLong, randomDoc(2 + rnd.nextInt(10))))
      val query = randomDoc(3)
      val got = TfIdf.bm25(docs.toDF("doc_id", "text"), "doc_id", "text", query)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

      val docToks = docs.map { case (id, t) => id -> toks(t) }.toMap
      val nd = docs.size.toLong
      val ttok = docToks.values.map(_.size.toLong).sum.toDouble
      val qts = toks(query).distinct
      val dfm = qts.map(t => t -> docToks.values.count(_.contains(t)).toLong).toMap
      for ((id, _) <- docs) {
        val ts = docToks(id)
        val dl = ts.size.toLong
        val contribs = qts.flatMap { t =>
          val tf = ts.count(_ == t).toLong
          val df = dfm(t)
          if (tf == 0) None
          else {
            val idf = math.log(1.0 + (nd - df + 0.5) / (df + 0.5))
            val w = idf * (tf * (k1 + 1.0)) /
              (tf + k1 * (1.0 - b + b * (dl / (ttok / nd))))
            Some(java.math.BigDecimal.valueOf(round6(w)))
          }
        }
        val expected =
          if (contribs.isEmpty) 0.0
          else round6(contribs.reduce(_.add(_)).doubleValue())
        assert(math.abs(got(id) - expected) < 1.1e-6,
          s"trial $trial doc=$id got=${got(id)} expected=$expected")
      }
    }
  }

  test("pixel grid signature equals a brute-force reference (random PPMs)") {
    // random sizes/pixels, the whole contract re-derived independently:
    // block index by the resize mapping, integer means, aHash bits by
    // strict-greater-than-integer-mean
    val gx = 9; val gy = 7
    for (trial <- 1 to 30) {
      val w = gx + rnd.nextInt(40)
      val h = gy + rnd.nextInt(30)
      val px = Array.fill[Byte](w * h * 3)(rnd.nextInt(256).toByte)
      val ppm = (s"P6\n$w $h\n255\n").getBytes("ISO-8859-1") ++ px
      val got = graft.expr.PixelGridSig.sig(ppm, gx, gy)
      assert(got != null, s"trial $trial: decode failed")
      val sums = Array.fill(gx * gy)(0L)
      val counts = Array.fill(gx * gy)(0L)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val blk = (y * gy / h) * gx + (x * gx / w)
        sums(blk) += px((y * w + x) * 3 + c) & 0xFF
        counts(blk) += 1
      }
      val sig = sums.indices.map(i => (sums(i) / counts(i)).toInt)
      val mean = sig.map(_.toLong).sum / sig.length
      val hash = sig.indices.foldLeft(0L) { (acc, i) =>
        if (sig(i) > mean) acc | (1L << i) else acc
      }
      assert(got.getArray(3).toIntArray.toSeq == sig,
        s"trial $trial ${w}x$h sig mismatch")
      assert(got.getLong(4) == hash, s"trial $trial ahash mismatch")
      // dhash: strict-greater gradient sign between row-adjacent blocks
      val dhash = (0 until gy).foldLeft(0L) { (acc, by) =>
        (0 until gx - 1).foldLeft(acc) { (a, bx) =>
          if (sig(by * gx + bx + 1) > sig(by * gx + bx))
            a | (1L << (by * (gx - 1) + bx))
          else a
        }
      }
      assert(got.getLong(5) == dhash, s"trial $trial dhash mismatch")
    }
  }
}
