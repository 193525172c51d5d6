package graft

import graft.operators.Classifier
import org.apache.spark.sql.functions._

/** Trainable LR quality classifier: learnability, exactness vs an
  * independent driver-side reference, determinism.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  // spam docs (label 1) share a marker token; ham docs don't
  private def docs = Seq(
    (1L, "buy spam pills now cheap spam offer", 1L),
    (2L, "spam spam discount deal spam", 1L),
    (3L, "quarterly engineering report on shuffle performance", 0L),
    (4L, "catalyst optimizer notes and benchmark results", 0L),
    (5L, "spam alert unbeatable spam prices", 1L),
    (6L, "reading group discussion of the streaming paper", 0L)
  ).toDF("doc_id", "text", "label")

  // ---- independent reference implementation (plain Scala, BigDecimal)

  private def md5Long(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  private def refTrain(rows: Seq[(Long, String, Long)], dim: Int,
      iters: Int, lr: BigDecimal): IndexedSeq[BigDecimal] = {
    val feats: Seq[(Long, Map[Int, Long])] = rows.map { case (id, text, _) =>
      id -> "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq
        .groupBy(t => (md5Long(t) % dim).toInt)
        .view.mapValues(_.size.toLong).toMap
    }
    val labels = rows.map(r => r._1 -> r._3).toMap
    var w = IndexedSeq.fill(dim + 1)(BigDecimal(0).setScale(10))
    for (_ <- 1 to iters) {
      val es = feats.map { case (id, x) =>
        val z = x.map { case (j, c) => w(j) * c }.sum + w(dim)
        val p = BigDecimal(1.0 / (1.0 + math.exp(-z.toDouble)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        id -> (p - labels(id))
      }.toMap
      val g: IndexedSeq[BigDecimal] = (0 until dim).map { j =>
        feats.map { case (id, x) =>
          es(id) * BigDecimal(x.getOrElse(j, 0L))
        }.foldLeft(BigDecimal(0))(_ + _)
      }
      val gb = es.values.foldLeft(BigDecimal(0))(_ + _)
      w = (0 until dim).map(j => (w(j) - lr * g(j)).setScale(10)) :+
        (w(dim) - lr * gb).setScale(10)
    }
    w
  }

  test("trainLrClassifier matches the independent reference exactly") {
    val lr = BigDecimal("0.01")
    val got = Classifier.trainLrClassifier(docs, "doc_id", "text", "label",
        dim = dim, iters = 5, lr = lr)
      .as[(Long, Double)].collect().toMap
    val ref = refTrain(docs.as[(Long, String, Long)].collect().toSeq,
      dim, iters = 5, lr = lr)
    (0 until dim).foreach { j =>
      assert(got(j.toLong) == ref(j).toDouble, s"weight $j")
    }
    assert(got(-1L) == ref(dim).toDouble, "bias")
  }

  test("the classifier learns the separable concept and scores separate") {
    val model = Classifier.trainLrClassifier(docs, "doc_id", "text", "label",
      dim = dim, iters = 20, lr = BigDecimal("0.05"))
    val spamBucket = (md5Long("spam") % dim).toLong
    val w = model.as[(Long, Double)].collect().toMap
    assert(w(spamBucket) > 0, "the spam bucket's weight turns positive")
    val scores = Classifier.scoreLr(docs, "doc_id", "text", model, dim)
      .as[(Long, Double)].collect().toMap
    val spamMin = Seq(1L, 2L, 5L).map(scores).min
    val hamMax = Seq(3L, 4L, 6L).map(scores).max
    assert(spamMin > hamMax,
      s"spam scores ($spamMin) must exceed ham scores ($hamMax)")
  }

  test("training is deterministic across invocations") {
    def run() = Classifier.trainLrClassifier(docs, "doc_id", "text", "label",
      dim = dim, iters = 3).as[(Long, Double)].collect().toSeq.sorted
    assert(run() == run())
  }

  test("the 100 TB recipe: sampled training equals training on the subset") {
    // the composition the Classifier scaladoc documents — train on a
    // hashSample'd slice (a pure scan-side filter), score everything.
    // Identity to lock: hashSample-filtered training ≡ training on the
    // equal pre-materialized subset, bit for bit (the filter pushes
    // into the scan and changes nothing about the arithmetic).
    val wide = (1L to 60L).map { i =>
      val label = i % 2
      val word = if (label == 1) "spam offer" else "calm prose"
      (i, s"$word document number $i", label)
    }.toDF("doc_id", "text", "label")
    val frac = 0.4
    val sampled = wide.filter(
      graft.operators.Filters.hashSample($"doc_id", frac, salt = "lr"))
    val subset = sampled.as[(Long, String, Long)].collect().toSeq
      .toDF("doc_id", "text", "label")
    assert(subset.count() > 5 && subset.count() < 60,
      "the sample must be a proper subset for the test to mean anything")
    def weights(d: org.apache.spark.sql.DataFrame) =
      Classifier.trainLrClassifier(d, "doc_id", "text", "label",
        dim = dim, iters = 3).as[(Long, Double)].collect().toSeq.sorted
    assert(weights(sampled) == weights(subset))
    // and the sampled model scores the FULL corpus — one map-only pass
    val scored = Classifier.scoreLr(wide,
      "doc_id", "text",
      Classifier.trainLrClassifier(sampled, "doc_id", "text", "label",
        dim = dim, iters = 3), dim)
    assert(scored.count() == 60)
  }
}
