package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TokenizerStore
import graft.queries.TrainingB

class TrainingCSpec extends AnyFunSuite {
  import TestSpark._

  test("tokenizer store: idempotent build, stored merges = trained merges") {
    val words = TrainingB.bpeWordFreq(spark, sf)
    val root = java.nio.file.Files
      .createTempDirectory("graft-tok-spec").toString
    TokenizerStore.buildIfAbsent(words, root, rounds = 3)
    val v1 = graft.sources.Snapshots
      .latestVersion(TokenizerStore.mergesRoot(root))
    // a retried build must find the artifact, not retrain
    TokenizerStore.buildIfAbsent(words, root, rounds = 3)
    val v2 = graft.sources.Snapshots
      .latestVersion(TokenizerStore.mergesRoot(root))
    assert(v1.isDefined && v1 == v2, "retry produced a new version")
    // stored merge list ≡ the gated q_bpe_train output
    val stored = TokenizerStore.readMerges(spark, root)
      .select(col("merge_no"), col("pair"), col("merged"), col("cnt"))
    val trained = SparkEntry.queries("q_bpe_train")(spark, sf)
    assert(stored.exceptAll(trained).count() == 0
      && trained.exceptAll(stored).count() == 0)
  }

  test("tokenizer store: encodeSym replays the training loop's vocab exactly") {
    val words = TrainingB.bpeWordFreq(spark, sf)
    val root = TokenizerStore.defaultRoot(words, rounds = 3)
    TokenizerStore.buildIfAbsent(words, root, rounds = 3)
    // the loop's final vocab (train-time application, round by round)
    val (_, vocab) = TrainingB.bpeLoop(words, rounds = 3)
    // vs the stored-artifact encode (one replace chain, merge order)
    val enc = words.select(col("word"),
      TokenizerStore.encodeSym(spark, root, col("word")).as("sym2"))
    val joined = vocab.join(enc, Seq("word"))
    assert(joined.filter(col("sym") =!= col("sym2")).count() == 0,
      "stored-merge encode diverged from the training loop")
  }

  test("bpe encode: compression is real and consistent per source") {
    val df = SparkEntry.queries("q_bpe_encode")(spark, sf).cache()
    assert(df.count() == 20)
    // merges strictly compress: tokens < chars, and at least one
    // symbol per word
    assert(df.filter(col("tot_tokens") >= col("tot_chars")).count() == 0)
    assert(df.filter(col("tot_tokens") < col("n_words")).count() == 0)
    assert(df.filter(col("fertility") < 1.0).count() == 0)
    assert(df.filter(col("chars_per_token") <= 1.0).count() == 0)
    df.unpersist()
  }

  test("kl divergence: non-negative, exact nano accounting") {
    val df = SparkEntry.queries("q_kl_divergence")(spark, sf).cache()
    assert(df.count() == 20)
    // KL ≥ 0 up to per-term nano rounding (≤ n_terms · 0.5e-9)
    assert(df.filter(col("kl") < -1e-5).count() == 0)
    assert(df.filter(col("n_terms") > col("n_tokens")).count() == 0)
    val drift = df.filter(
      abs(col("kl") - col("kl_nano").cast("double") / 1e9) > 1e-12).count()
    assert(drift == 0)
    df.unpersist()
  }

  test("ngram diversity: 3 rows per source, ratios bounded, monotone in n") {
    val df = SparkEntry.queries("q_ngram_diversity")(spark, sf).cache()
    assert(df.count() == 60)
    assert(df.filter(col("distinct_ngrams") > col("total_ngrams")).count() == 0)
    assert(df.filter(col("diversity") <= 0.0 || col("diversity") > 1.0)
      .count() == 0)
    // longer n-grams are at least as distinct as unigrams
    val wide = df.groupBy(col("source"))
      .agg(max(when(col("n") === 1, col("diversity"))).as("d1"),
        max(when(col("n") === 3, col("diversity"))).as("d3"))
    assert(wide.filter(col("d3") < col("d1")).count() == 0)
    df.unpersist()
  }

  test("quality sweep: kept volume is monotone in threshold, fractions consistent") {
    val df = SparkEntry.queries("q_quality_sweep")(spark, sf).cache()
    assert(df.count() >= 2, "sweep produced too few threshold rows")
    val rows = df.orderBy(col("threshold")).collect()
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("docs_kept") >= hi.getAs[Long]("docs_kept"),
        "a stricter threshold kept more docs")
      assert(lo.getAs[Long]("tokens_kept") >= hi.getAs[Long]("tokens_kept"))
    }
    assert(df.filter(col("frac_docs") < 0.0 || col("frac_docs") > 1.0)
      .count() == 0)
    // threshold 0.5 row must agree with the #172 per-source accepts
    val accepts = SparkEntry.queries("q_quality_classifier")(spark, sf)
      .agg(sum(col("n_accept"))).head.getLong(0)
    val k05 = rows.find(_.getAs[Double]("threshold") == 0.5)
    assert(k05.forall(_.getAs[Long]("docs_kept") == accepts),
      "sweep@0.5 disagrees with the classifier gate")
    df.unpersist()
  }

  test("bpe merge application: sentinel-string replace matches a greedy list model") {
    // the replace-based apply used by the loop and the stored encode,
    // vs an explicit left-to-right non-overlapping merge of the symbol
    // list — on adversarial repeated-symbol words
    def model(syms: List[String], a: String, b: String): List[String] =
      syms match {
        case x :: y :: rest if x == a && y == b =>
          (a + b) :: model(rest, a, b)
        case x :: rest => x :: model(rest, a, b)
        case Nil => Nil
      }
    val merges = Seq(("a", "b"), ("ab", "a"), ("b", "b"), ("c", "ab"))
    val rnd = new scala.util.Random(7)
    val words = Seq("ab", "abab", "aabb", "bbbb", "abcab", "cababc") ++
      Seq.fill(500)(Seq.fill(2 + rnd.nextInt(10))(
        "abc".charAt(rnd.nextInt(3)).toString).mkString)
    words.foreach { w =>
      var sym = w.toCharArray.map(c => s"<$c>").mkString
      var lst = w.toCharArray.map(_.toString).toList
      merges.foreach { case (a, b) =>
        sym = sym.replace(s"<$a><$b>", s"<$a$b>")
        lst = model(lst, a, b)
      }
      assert(sym == lst.map(x => s"<$x>").mkString,
        s"word '$w': replace gave '$sym', model gave ${lst.mkString(" ")}")
    }
  }

  test("label balance: effective n below n, weights normalize and favor the tail") {
    val df = SparkEntry.queries("q_label_balance")(spark, sf).cache()
    assert(df.count() == 10)
    assert(df.filter(col("effective_n") >= col("n").cast("double")).count() == 0)
    val s = df.agg(sum(col("weight"))).head.getDouble(0)
    assert(math.abs(s - 1.0) < 1e-4, s"weight sum $s")
    // a smaller class never gets a smaller weight
    val a = df.select(col("n").as("na"), col("weight").as("wa"))
    val b = df.select(col("n").as("nb"), col("weight").as("wb"))
    assert(a.crossJoin(b)
      .filter(col("na") < col("nb") && col("wa") < col("wb") - 1e-9)
      .count() == 0)
    df.unpersist()
  }
}
