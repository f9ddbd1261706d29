package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationCSpec extends AnyFunSuite {
  import TestSpark._

  test("substring_dedup: untouched docs keep their exact original text") {
    val df = SparkEntry.queries("q_substring_dedup")(spark, sf).cache()
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(df.count() == docs.count())
    // a doc with nothing removed must reassemble to its original text
    val intact = df.filter(col("n_removed") === 0)
      .join(docs.select(col("doc_id"), md5(col("text")).as("orig_hash")), "doc_id")
    assert(intact.count() > 0)
    assert(intact.filter(col("cleaned_hash") =!= col("orig_hash")).count() == 0)
    df.unpersist()
  }

  test("substring_dedup: span removal keeps one copy corpus-wide") {
    val df = SparkEntry.queries("q_substring_dedup")(spark, sf).cache()
    // token-count invariant: kept_ntok <= original (removal only ever
    // shrinks), and something must be removed somewhere (testdata
    // plants full-duplicate docs)
    assert(df.filter(col("n_removed") > 0).count() > 0)
    val docsNtok = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("orig_ntok"))
    assert(df.join(docsNtok, "doc_id")
      .filter(col("kept_ntok") > col("orig_ntok")).count() == 0)
    // the keeper (min doc_id) of a fully duplicated pair stays intact:
    // no doc can lose spans it is the keeper of, so at least one copy
    // of every span survives — check no span hash vanishes entirely
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val n = ceil(size(col("toks")).cast("double") / 16).cast("int")
    val spans = docs.select(explode(transform(sequence(lit(0), n - 1),
      i => struct(col("doc_id"),
        md5(array_join(slice(col("toks"), i * 16 + 1, lit(16)), " ")).as("h")))).as("s"))
      .select(col("s.doc_id"), col("s.h"))
    // keeper per hash must have n_removed counting none of its own spans:
    // every hash's keeper doc keeps >= 1 occurrence, i.e. a doc that is
    // the keeper of ALL its spans has n_removed == 0
    val keepers = spans.groupBy(col("h")).agg(min(col("doc_id")).as("keeper"))
    val allKept = spans.join(keepers, "h")
      .groupBy(col("doc_id"))
      .agg(sum(when(col("doc_id") === col("keeper"), 0).otherwise(1)).as("foreign"))
      .filter(col("foreign") === 0)
    val broken = allKept.join(df, "doc_id").filter(col("n_removed") > 0)
    assert(broken.count() == 0)
    df.unpersist()
  }

  test("substring_dedup_offsets: finds off-grid duplicates the span grid provably misses") {
    import spark.implicits._
    // doc 1: 60 distinct tokens; doc 2: a 3-token prefix + doc 1's
    // tokens [5, 44] — a 40-token verbatim run whose start offsets (5
    // vs 3) disagree, so NO non-overlapping 16-token grid span can
    // ever align between the two docs
    val aToks = (0 until 60).map(i => s"a$i")
    val bToks = Seq("x0", "x1", "x2") ++ aToks.slice(5, 45)
    val tiny = Seq((1L, aToks.mkString(" ")), (2L, bToks.mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("graft-offgrid").toString
    tiny.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // the 16-token grid (#73) scores this pair ZERO duplicated spans —
    // the exact blind spot
    val grid = SparkEntry.queries("q_dedup_spans")(spark, dir)
    assert(grid.agg(sum(col("n_dup_spans"))).head.getLong(0) == 0,
      "grid method unexpectedly aligned the planted run")
    // the offsets method flags BOTH docs (40-token run >= W+WIN-1 = 23
    // guarantees a shared winnowing anchor at any offset pair)
    val off = SparkEntry.queries("q_substring_dedup_offsets")(spark, dir)
      .filter(col("doc_id") <= 2)
    val by = off.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(by(1L) > 0 && by(2L) > 0,
      s"offsets method missed the off-grid duplicate: $by")
  }

  test("substring_dedup_removal: off-grid run removed at suffix granularity, keeper intact") {
    import spark.implicits._
    val aToks = (0 until 60).map(i => s"a$i")
    val bToks = Seq("x0", "x1", "x2") ++ aToks.slice(5, 45)
    val tiny = Seq((1L, aToks.mkString(" ")), (2L, bToks.mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = java.nio.file.Files.createTempDirectory("graft-offrm").toString
    tiny.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rm = SparkEntry.queries("q_substring_dedup_removal")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getString(4))).toMap
    // the grid version (#91) would return doc 2 UNTOUCHED (no aligned
    // span); suffix-granularity removal collapses it to the 3-token
    // junk prefix, while the keeper (first occurrence, doc 1) keeps
    // its exact original text
    val md5a = java.security.MessageDigest.getInstance("MD5")
      .digest(aToks.mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val md5b = java.security.MessageDigest.getInstance("MD5")
      .digest("x0 x1 x2".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(rm(1L) == ((0L, 60L, md5a)), s"keeper doc was touched: ${rm(1L)}")
    assert(rm(2L)._2 == 3L && rm(2L)._3 == md5b,
      s"off-grid duplicate run survived removal: ${rm(2L)}")
  }

  test("substring_dedup_removal: planted copies collapse to their prefix; invariants hold") {
    val df = SparkEntry.queries("q_substring_dedup_removal")(spark, sf).cache()
    val planted = df.filter(col("doc_id") >= 1000000L).cache()
    assert(planted.count() > 0)
    // every planted copy = 3 junk tokens + a 40-token verbatim run
    // whose keeper is the source doc — removal strips AT LEAST the
    // run (kept <= prefix; a copy whose SOURCE doc is itself an exact
    // duplicate also loses prefix-straddling spans to its twin copy,
    // hence <= rather than ==), and copies of unique sources keep
    // exactly the prefix
    assert(planted.filter(col("kept_ntok") > 3).count() == 0,
      "a planted copy's duplicated run survived removal")
    assert(planted.filter(col("kept_ntok") === 3).count() > 0,
      "no planted copy kept exactly its junk prefix")
    // untouched docs reassemble to their original text
    val docs = graft.sources.Tables.documents(spark, sf)
    val intact = df.filter(col("n_rm_spans") === 0)
      .join(docs.select(col("doc_id"), md5(col("text")).as("oh"),
        size(split(col("text"), " ")).cast("long").as("ont")), "doc_id")
    assert(intact.count() > 0)
    assert(intact.filter(col("cleaned_hash") =!= col("oh") ||
      col("kept_ntok") =!= col("ont")).count() == 0)
    // removal only shrinks
    assert(df.join(docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ont")), "doc_id")
      .filter(col("kept_ntok") > col("ont")).count() == 0)
    planted.unpersist(); df.unpersist()
  }

  test("substring_dedup_offsets: every planted off-boundary copy is flagged; stats coherent") {
    val df = SparkEntry.queries("q_substring_dedup_offsets")(spark, sf).cache()
    val planted = df.filter(col("doc_id") >= 1000000L).cache()
    assert(planted.count() > 0, "no planted copies at this sf")
    // every planted copy carries a >= 40-token verbatim run from its
    // source doc — the anchor guarantee says ALL must be flagged
    assert(planted.filter(col("n_dup_anchors") === 0).count() == 0,
      "a planted off-boundary duplicate went undetected")
    // anchor accounting is sane everywhere
    assert(df.filter(col("n_dup_anchors") > col("n_anchors")).count() == 0)
    assert(df.filter(col("dup_frac") < 0 || col("dup_frac") > 1).count() == 0)
    // winnowing thins: anchors per doc are a small fraction of tokens
    val docsN = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("ntok"))
    assert(df.join(docsN, "doc_id").filter(col("n_anchors") > col("ntok")).count() == 0)
    planted.unpersist(); df.unpersist()
  }

  test("budget_sample: exactly min(k, n) docs per source, ranks contiguous, deterministic") {
    val df = SparkEntry.queries("q_budget_sample")(spark, sf).cache()
    val perSource = graft.sources.Tables.documents(spark, sf)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    val got = df.groupBy(col("source"))
      .agg(count(lit(1)).as("kept"), max(col("rank")).as("max_rank"),
        min(col("rank")).as("min_rank"))
      .join(perSource, "source")
    // kept == min(25, n) and ranks are 1..kept
    assert(got.filter(col("kept") =!= least(lit(25L), col("n"))).count() == 0)
    assert(got.filter(col("min_rank") =!= 1 || col("max_rank") =!= col("kept"))
      .count() == 0)
    // deterministic: a second run yields the identical set
    val again = SparkEntry.queries("q_budget_sample")(spark, sf)
    assert(df.exceptAll(again).count() == 0 && again.exceptAll(df).count() == 0)
    df.unpersist()
  }

  test("ann_filtered: every neighbor passes the metadata predicate, k exact") {
    val df = SparkEntry.queries("q_ann_filtered")(spark, sf).cache()
    val en = graft.sources.Tables.documents(spark, sf)
      .filter(col("lang") === "en").select(col("doc_id").as("n_id"))
    // pre-filter shape: no neighbor outside the predicate set
    assert(df.join(en, Seq("n_id"), "left_anti").count() == 0)
    // k exact per query (the en subset is larger than k at every SF)
    val perQ = df.groupBy(col("q_id")).agg(count(lit(1)).as("n"))
    assert(perQ.filter(col("n") =!= 5).count() == 0)
    // cosine is monotone non-increasing in rank (rank r vs r+1)
    val a = df.select(col("q_id"), col("rank"), col("cos"))
    val b = df.select(col("q_id"), (col("rank") - 1).as("rank"),
      col("cos").as("cos_next"))
    assert(a.join(b, Seq("q_id", "rank"))
      .filter(col("cos_next") > col("cos")).count() == 0)
    df.unpersist()
  }

  test("embedding_pca: unit-norm component, positive spectrum, deterministic") {
    val df = SparkEntry.queries("q_embedding_pca")(spark, sf).cache()
    assert(df.count() == 64)
    val normSq = df.agg(sum(col("pc") * col("pc"))).head.getDouble(0)
    assert(math.abs(normSq - 1.0) < 1e-4, s"component not unit-norm: $normSq")
    assert(df.filter(col("lambda") <= 0).count() == 0)
    // fixed start vector + deterministic rounds: a rerun is identical
    val again = SparkEntry.queries("q_embedding_pca")(spark, sf)
    assert(df.exceptAll(again).count() == 0)
    df.unpersist()
  }

  test("heavy_hitters: sketch-pruned result equals the exact threshold set") {
    val df = SparkEntry.queries("q_heavy_hitters")(spark, sf).cache()
    // exact reference computed the expensive way (full vocabulary agg)
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("term"))
    val exact = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val total = toks.count()
    val want = exact.filter(col("cnt") > total / 256.0)
      .select(col("term"), col("cnt"))
    val got = df.select(col("term"), col("cnt"))
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
    df.unpersist()
  }

  test("prefix filter: complete vs exact pairs, and the index is smaller than full") {
    val t = 0.6
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val variants = docs.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" near dup probe")).as("text"))
    val all = docs.unionByName(variants)
    val got = graft.dedup.TextDedup.prefixFilterPairs(all, "doc_id", "text", t)
      .select(col("doc_a"), col("doc_b")).cache()
    // completeness: every exact-threshold pair from the UNCAPPED
    // inverted index survives the prefix filter
    val want = graft.dedup.TextDedup.jaccardPairs(all, "doc_id", "text", maxDf = None)
      .filter(col("jaccard") >= t).select(col("doc_a"), col("doc_b"))
    assert(want.exceptAll(got).count() == 0, "prefix filter lost an exact pair")
    assert(got.exceptAll(want).count() == 0, "prefix filter passed a sub-threshold pair")
    // the scale claim: the prefix index holds strictly fewer entries
    // than the full inverted index
    val full = all.select(col("doc_id"),
      explode(array_distinct(graft.plans.WordShingles(col("text"), 3))).as("sh"))
      .count()
    val prefixFrac = 1.0 - t // |A| - ceil(t|A|) + 1 ≈ (1-t)|A|
    assert(got.count() > 0)
    // bound check is loose (+1 per doc) but must be well under full
    val ex = all.select(col("doc_id"),
      array_distinct(graft.plans.WordShingles(col("text"), 3)).as("shs"))
    val prefixEntries = ex.select((size(col("shs"))
      - ceil(lit(t) * size(col("shs"))) + 1).cast("long").as("p"))
      .agg(sum(col("p"))).head.getLong(0)
    assert(prefixEntries < full * (prefixFrac + 0.1),
      s"prefix index not smaller: $prefixEntries vs $full")
    got.unpersist()
  }

  test("dsir: target-language docs score higher; token counts conserve") {
    val df = SparkEntry.queries("q_dsir")(spark, sf).cache()
    val docs = graft.sources.Tables.documents(spark, sf)
    // expected count mirrors the query's length(t)>0 filter: empty
    // tokens (doubled/leading/trailing spaces) don't count, and docs
    // with no non-empty token must be ABSENT, not zero-scored
    val exp = docs.select(col("doc_id"),
      size(filter(split(col("text"), " "),
        t => length(t) > 0)).cast("long").as("nt0"), col("lang"))
    val joined = exp.join(df, Seq("doc_id"), "left").cache()
    assert(joined.filter(col("nt0") === 0 && col("n_tokens").isNotNull)
      .count() == 0, "token-less doc got a dsir score")
    assert(joined.filter(col("nt0") > 0 && col("n_tokens").isNull)
      .count() == 0, "tokenized doc missing from dsir output")
    assert(joined.filter(col("nt0") > 0 && col("n_tokens") =!= col("nt0"))
      .count() == 0)
    // no stray scored docs outside the corpus
    assert(df.join(docs, Seq("doc_id"), "left_anti").count() == 0)
    // the whole point: the declared-en slice must average a higher
    // importance weight than the rest (it IS the target distribution)
    val m = joined.groupBy(col("lang") === "en")
      .agg(avg(col("log_weight")).as("w")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(m(true) > m(false),
      s"en weight ${m(true)} not above non-en ${m(false)}")
    joined.unpersist()
    df.unpersist()
  }

  test("source_overlap: syndicated mirror shares spans with its origin sources") {
    val df = SparkEntry.queries("q_source_overlap")(spark, sf).cache()
    // pairs are strictly ordered (no self-pairs, no symmetric dupes)
    assert(df.filter(col("source_a") >= col("source_b")).count() == 0)
    // every source with a doc_id % 11 == 0 doc must overlap the mirror
    val expected = graft.sources.Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(11)) === 0)
      .select(col("source")).distinct()
    val withMirror = df.filter(col("source_b") === "syndicated")
      .select(col("source_a").as("source"))
    assert(expected.exceptAll(withMirror).count() == 0)
    df.unpersist()
  }
}
