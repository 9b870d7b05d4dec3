package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.CorpusClean

/** Corpus-hygiene operator behaviors beyond the driver oracle:
  * line-level cleaning (the testdata corpus has no newlines), sampling
  * determinism/nesting, and hand-computed repetition profiles.
  */
class CorpusCleanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("contaminationHits counts distinct shared n-grams per corpus doc") {
    val evalSet = Seq((100L, "one two three four five")).toDF("doc_id", "text")
    val corpus = Seq(
      // shares the 3-grams "one two three", "two three four" with eval
      (1L, "zz one two three four yy"),
      // no 3-gram overlap (only bigram-level sharing)
      (2L, "one two xx three four"),
      // repeated shared gram counts once (distinct per doc)
      (3L, "one two three qq one two three")).toDF("doc_id", "text")
    val hits = CorpusClean.contaminationHits(corpus, evalSet, "doc_id", "text", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hits == Map(1L -> 2L, 3L -> 1L))
  }

  test("cleanLines removes cross-document boilerplate, keeps order, empty-text survivors") {
    val docs = Seq(
      (1L, "keep me\nCOOKIE NOTICE\nunique line a"),
      (2L, "COOKIE NOTICE\nunique line b"),
      (3L, "COOKIE NOTICE"),
      (4L, "solo document")).toDF("doc_id", "text")
    val out = CorpusClean.cleanLines(docs, "doc_id", "text", minDocs = 3)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ("keep me\nunique line a", 3L, 1L))
    assert(out(2L) == ("unique line b", 2L, 1L))
    // every line was boilerplate: row survives with empty text
    assert(out(3L) == ("", 1L, 1L))
    assert(out(4L) == ("solo document", 1L, 0L))
  }

  test("repetitionStats matches hand-computed bigram profile") {
    val docs = Seq(
      // bigrams: "a b","b a","a b","b a","a b" -> counts {a b:3, b a:2}
      (1L, "a b a b a b"),
      // all bigrams unique
      (2L, "p q r s"),
      // below gram size
      (3L, "solo")).toDF("doc_id", "text")
    val out = CorpusClean.repetitionStats(docs, "doc_id", "text", n = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((5L, 0.6, 1.0)))
    assert(out(2L) == ((3L, math.rint(1.0 / 3.0 * 1e6) / 1e6, 0.0)))
    assert(out(3L) == ((0L, 0.0, 0.0)))
  }

  test("stratifiedSample is deterministic, nested across rates, and rate-accurate") {
    val df = (0L until 2000L).map(i => (i, s"s${i % 2}")).toDF("id", "strata")
    def kept(r0: Double, r1: Double): Set[Long] =
      CorpusClean.stratifiedSample(df, "id", "strata", Map("s0" -> r0, "s1" -> r1))
        .select("id").collect().map(_.getLong(0)).toSet
    val half = kept(0.5, 0.1)
    assert(half == kept(0.5, 0.1)) // deterministic
    val tenth = kept(0.1, 0.1)
    assert(tenth.subsetOf(kept(0.5, 0.5))) // nested as rates decrease
    // rate accuracy on 1000 rows/stratum: binomial 3-sigma ~ 47
    val s0 = half.count(_ % 2 == 0)
    assert(s0 > 500 - 50 && s0 < 500 + 50, s"s0 kept $s0")
    val s1 = half.count(_ % 2 == 1)
    assert(s1 > 100 - 30 && s1 < 100 + 30, s"s1 kept $s1")
    // absent strata drop; rate 0 drops; rate 1 keeps all
    assert(kept(0.0, 1.0).forall(_ % 2 == 1))
    assert(kept(0.0, 1.0).size == 1000)
    assert(CorpusClean.stratifiedSample(df, "id", "strata", Map("s0" -> 1.0))
      .count() == 1000)
  }

  test("redactPii scrubs emails/IPs/phones to typed placeholders with exact counts") {
    import spark.implicits._
    val docs = Seq(
      ("d1", "mail me at alice.smith+x@sub.example.org today"),
      ("d2", "server 192.168.0.1 and backup 10.0.0.2 up"),
      ("d3", "call 555-867-5309 or write bob@x.io"),
      ("d4", "nothing sensitive here"),
      ("d5", "")).toDF("doc_id", "text")
    val out = operators.CorpusClean.redactPii(docs, "text")
      .select("doc_id", "redacted", "n_redactions").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out("d1") == (("mail me at <EMAIL> today", 1L)))
    assert(out("d2") == (("server <IP> and backup <IP> up", 2L)))
    assert(out("d3") == (("call <PHONE> or write <EMAIL>", 2L)))
    assert(out("d4") == (("nothing sensitive here", 0L)))
    assert(out("d5") == (("", 0L)))
  }

  test("redactPii counts matches, not output placeholders (ADVICE r9)") {
    import spark.implicits._
    val docs = Seq(
      // literal placeholder tokens in the SOURCE must not count
      ("d1", "this doc says <EMAIL> and <IP> verbatim"),
      // a token embedding a placeholder ('<IP>x') must not skew the sum
      ("d2", "weird token <IP>x beside real 10.0.0.1"),
      // sequential-stage semantics: the email rule consumes the dotted
      // host before the IP rule ever sees it — one redaction, not two
      ("d3", "mail a@10.0.0.1.example.com only")).toDF("doc_id", "text")
    val out = operators.CorpusClean.redactPii(docs, "text")
      .select("doc_id", "redacted", "n_redactions").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out("d1") == (("this doc says <EMAIL> and <IP> verbatim", 0L)))
    assert(out("d2") == (("weird token <IP>x beside real <IP>", 1L)))
    assert(out("d3") == (("mail <EMAIL> only", 1L)))
  }

  test("domainHistogram counts documents per host, one per doc regardless of mentions") {
    import spark.implicits._
    val docs = Seq(
      ("d1", "see https://a.example.com/x and again https://a.example.com/y"),
      ("d2", "both http://a.example.com/z and https://b.example.org/"),
      ("d3", "no links at all"),
      ("d4", "tail https://b.example.org")).toDF("doc_id", "text")
    val got = operators.CorpusClean.domainHistogram(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a.example.com" -> 2L, "b.example.org" -> 2L))
  }

  test("unigramCrossEntropy matches the hand-computed corpus LM") {
    import spark.implicits._
    // corpus: a a b | c  -> counts a=2, b=1, c=1, N=4
    // p(a)=1/2 (1 bit), p(b)=p(c)=1/4 (2 bits)
    // d1: (2*1 + 1*2)/3 = 4/3;  d2: 2/1 = 2
    val docs = Seq(("d1", "a a b"), ("d2", "c")).toDF("doc_id", "text")
    val got = operators.CorpusClean.unigramCrossEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("d1" -> 1.333333, "d2" -> 2.0))
    // uniform corpus: every doc scores exactly log2(vocab)
    val unif = Seq(("u1", "x y"), ("u2", "z w")).toDF("doc_id", "text")
    val g2 = operators.CorpusClean.unigramCrossEntropy(unif, "doc_id", "text")
      .collect().map(r => r.getDouble(1))
    assert(g2.forall(_ == 2.0))
  }

  test("unigramCrossEntropy equals a driver-side reimplementation on random corpora") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val docs = (0 until (2 + rng.nextInt(5))).map { i =>
        val words = Array.fill(1 + rng.nextInt(12))("w" + rng.nextInt(6))
        (s"d$i", words.mkString(" "))
      }
      // exact double reimplementation (same math, driver-side)
      val toks = docs.flatMap { case (id, t) => t.trim.split("\\s+").map(id -> _) }
      val c = toks.groupBy(_._2).map { case (w, xs) => w -> xs.size.toDouble }
      val n = toks.size.toDouble
      val want = toks.groupBy(_._1).map { case (id, xs) =>
        val ce = xs.map { case (_, w) => -math.log(c(w) / n) / math.log(2.0) }.sum / xs.size
        id -> BigDecimal(ce).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      val got = operators.CorpusClean
        .unigramCrossEntropy(docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == want, s"trial $trial: $got != $want (docs=$docs)")
    }
  }

  test("bigramCrossEntropy matches the hand-computed interpolated LM") {
    import spark.implicits._
    // corpus: "x y x" | "y x" -> unigrams x=3, y=2, N=5
    // transitions: d1 (x,y),(y,x); d2 (y,x) -> c(x,y)=1, c(y,x)=2
    // prefix counts: x=1, y=2
    // p(y|x) = .75*1/1 + .25*2/5 = 0.85; p(x|y) = .75*2/2 + .25*3/5 = 0.9
    val docs = Seq(("d1", "x y x"), ("d2", "y x")).toDF("doc_id", "text")
    val got = operators.CorpusClean.bigramCrossEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    def b(x: Double) = -math.log(x) / math.log(2.0)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.keySet == Set("d1", "d2")) // no 1-token docs here; both have transitions
    assert(math.abs(got("d1") - r6((b(0.85) + b(0.9)) / 2)) < 1e-9)
    assert(math.abs(got("d2") - r6(b(0.9))) < 1e-9)
  }

  test("bigramCrossEntropy: single-token docs produce no row; lazy equals persisted") {
    import spark.implicits._
    val docs = Seq(("d1", "a a b a"), ("d2", "z"), ("d3", "b a")).toDF("doc_id", "text")
    def run(p: Boolean) = operators.CorpusClean
      .bigramCrossEntropy(docs, "doc_id", "text", persistGrams = p)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = run(true)
    assert(got.keySet == Set("d1", "d3")) // "z" has no transition
    assert(got == run(false))
    // conditional is a proper MLE: a doc that IS the whole corpus save
    // distinct suffixes scores below the unigram model on repeated grams
    val uni = operators.CorpusClean.unigramCrossEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("d1") < uni("d1")) // bigram context sharpens "a a b a"
  }

  test("commonUnits counts distinct docs, not occurrences") {
    val units = Seq((1L, "x"), (1L, "x"), (1L, "x"), (2L, "x"), (1L, "y"))
      .toDF("doc_id", "u")
    val out = CorpusClean.commonUnits(units, "doc_id", "u", minDocs = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("x", 2L)))
  }

  test("corpusShuffle: valid bucketed permutation, deterministic, salt re-deals") {
    val docs = (0L until 300L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    def shuffled(salt: String, parts: Int) =
      CorpusClean.corpusShuffle(docs.repartition(parts), "doc_id",
          nBuckets = 16, salt = salt)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val a = shuffled("shuf", 3)
    // every doc exactly once; buckets in range; positions contiguous 1..n
    assert(a.map(_._1).sorted.toSeq == (0L until 300L))
    assert(a.forall(t => t._2 >= 0 && t._2 < 16))
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length))
    }
    // deterministic under a different input partitioning
    assert(shuffled("shuf", 7).toSet == a.toSet)
    // a new salt is a fresh permutation (not the identity mapping)
    val b = shuffled("epoch2", 3)
    assert(b.toSet != a.toSet)
  }

  test("sampleByRate keeps the hash-threshold fraction, per-row rates, edges") {
    import org.apache.spark.sql.functions.{col, lit, when}
    val docs = (0L until 4000L).map(i => (i, i % 2)).toDF("doc_id", "par")
    def kept(rateOf: org.apache.spark.sql.Column): Long =
      CorpusClean.sampleByRate(docs.withColumn("r", rateOf), "doc_id", "r").count()
    assert(kept(lit(1.0)) == 4000L)  // rate >= 1 keeps everything
    assert(kept(lit(0.0)) == 0L)     // rate 0 keeps nothing
    val half = kept(lit(0.5))        // ~rate-accurate on uniform hashes
    assert(half > 1800 && half < 2200, s"rate 0.5 kept $half of 4000")
    // per-row rates: evens at 1.0, odds at 0.0 -> exactly the evens
    val mixed = CorpusClean.sampleByRate(
      docs.withColumn("r", when(col("par") === 0, 1.0).otherwise(0.0)),
      "doc_id", "r")
    assert(mixed.count() == 2000L &&
      mixed.filter(col("par") =!= 0).count() == 0L)
    // nested: every doc kept at 0.3 is also kept at 0.6 (same hash axis)
    val k3 = CorpusClean.sampleByRate(docs.withColumn("r", lit(0.3)), "doc_id", "r")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val k6 = CorpusClean.sampleByRate(docs.withColumn("r", lit(0.6)), "doc_id", "r")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(k3.subsetOf(k6))
  }

  test("corpusShuffle derives its bucket default from input parallelism") {
    // bucket count bounds the per-bucket rank window's parallelism
    // (VERDICT r10 #7): derived default tracks input partitions within
    // [64, 256]; an explicit value always wins
    val docs = (0L until 4000L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    def buckets(parts: Int, n: Int = -1): Long =
      CorpusClean.corpusShuffle(docs.repartition(parts), "doc_id", nBuckets = n)
        .select("bucket").distinct().count()
    assert(buckets(100) == 100)  // derived: 100 partitions -> 100 buckets
    assert(buckets(3) == 64)     // floor: never below the old default
    assert(buckets(100, n = 16) == 16) // explicit parameter wins
    // ceiling: one key byte caps derivation at 256
    val many = CorpusClean.corpusShuffle(docs.repartition(300), "doc_id")
    assert(many.select("bucket").distinct().count() == 256)
  }
}
