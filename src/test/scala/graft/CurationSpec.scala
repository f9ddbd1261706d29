package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite {
  import TestSpark._

  test("dedup_spans: one row per doc, dup spans bounded by span count") {
    val df = SparkEntry.queries("q_dedup_spans")(spark, sf).cache()
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(df.count() == docs.count())
    assert(df.filter(col("n_dup_spans") > col("n_spans")).count() == 0)
    assert(df.filter(col("dup_frac") < 0 || col("dup_frac") > 1).count() == 0)
    // the synthetic vocab repeats 16-token spans across docs — the
    // operator must actually find corpus-level duplication
    assert(df.filter(col("n_dup_spans") > 0).count() > 0)
    df.unpersist()
  }

  test("dedup_spans: a doc duplicated verbatim has every span corpus-duplicated") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val planted = docs.limit(1)
      .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
    val all = docs.unionByName(planted)
    // replay the operator over the planted corpus
    val W = 16
    val toks = split(col("text"), " ")
    val nSpans = ceil(size(toks).cast("double") / W).cast("int")
    val spans = transform(sequence(lit(0), nSpans - 1),
      i => array_join(slice(toks, i * W + 1, lit(W)), " "))
    val sp = all.select(col("doc_id"), explode(spans).as("span"))
      .select(col("doc_id"), md5(col("span")).as("span_hash"))
    val dfc = sp.groupBy(col("span_hash")).agg(count(lit(1)).as("span_df"))
    val res = sp.join(dfc, "span_hash").groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("span_df") > 1, 1L).otherwise(0L)).as("n_dup_spans"))
    val clone = res.filter(col("doc_id") >= 5000000L).head()
    assert(clone.getAs[Long]("n_dup_spans") == clone.getAs[Long]("n_spans"))
  }

  test("decontaminate: eval slice excluded, flag consistent with overlap count") {
    val df = SparkEntry.queries("q_decontaminate")(spark, sf).cache()
    assert(df.filter(pmod(col("doc_id"), lit(97)) === 0).count() == 0)
    assert(df.filter(
      (col("contaminated") === 1) =!= (col("n_overlap") > 0)).count() == 0)
    assert(df.filter(col("n_overlap") > col("n_grams")).count() == 0)
    df.unpersist()
  }

  test("decontaminate: a planted eval copy is flagged with full overlap") {
    // doc 97 is in the eval slice; a corpus doc with identical text
    // must come back contaminated with n_overlap == n_grams
    val docs = graft.sources.Tables.documents(spark, sf)
    val evalDoc = docs.filter(pmod(col("doc_id"), lit(97)) === 0).limit(1)
      .select(col("text")).head().getString(0)
    val n = evalDoc.split(" ").length
    assume(n >= 8) // needs at least one 8-gram to overlap
    // replay with the planted copy appended as a non-eval doc_id
    val planted = spark.range(1).select(lit(6000001L).as("doc_id"),
      lit(evalDoc).as("text"), lit("en").as("lang"), lit("srcX").as("source"),
      lit(evalDoc.length.toLong).as("n_chars"))
    val all = docs.unionByName(planted)
    val tmp = java.nio.file.Files.createTempDirectory("graft-decon").toString
    all.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val res = SparkEntry.queries("q_decontaminate")(spark, tmp)
    val row = res.filter(col("doc_id") === 6000001L).head()
    assert(row.getAs[Int]("contaminated") == 1)
    assert(row.getAs[Long]("n_overlap") == row.getAs[Long]("n_grams"))
  }

  test("decontaminate: an NFC/case/spacing variant leak is caught (raw shingling misses it)") {
    import spark.implicits._
    // eval doc (id 0 is in the % 97 == 0 slice) with a composed é;
    // the corpus doc leaks the same 8-gram DECOMPOSED (e + U+0301),
    // upper-cased and double-spaced — byte-identical nowhere
    val evalText = "caf\u00e9 one two three four five six seven"
    val leaked = "Cafe\u0301 one  two three four five six seven plus trailing context"
    val clean = "totally unrelated text with eight distinct tokens here"
    val docs = Seq((0L, evalText), (1L, leaked), (2L, clean)).toDF("doc_id", "text")
    val res = graft.queries.Curation.decontaminateDocs(docs)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("contaminated")).toMap
    assert(res(1L) == 1, "variant leak not flagged after canonicalization")
    assert(res(2L) == 0, "clean doc wrongly flagged")
    // the raw (un-canonicalized) composition cannot see this leak:
    // no 8-token window of the raw strings is string-equal
    val rawEval = evalText.split(" ").sliding(8).map(_.mkString(" ")).toSet
    val rawLeak = leaked.split(" ").sliding(8).map(_.mkString(" ")).toSet
    assert(rawEval.intersect(rawLeak).isEmpty,
      "fixture broken: raw shingles already collide")
    // the per-eval-doc report sees the same leak
    val rep = graft.queries.Curation.contaminationReportDocs(docs)
      .filter(col("eval_id") === 0L).head()
    assert(rep.getAs[Long]("n_leaking_docs") == 1L)
  }

  test("dedup_bloom: exactly the planted duplicates match, fresh rows never do") {
    val df = SparkEntry.queries("q_dedup_bloom")(spark, sf).cache()
    val docs = graft.sources.Tables.documents(spark, sf)
    val dupIds = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val got = df.collect().map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("match_id")))
    // every %7==0 doc re-ingested verbatim recovers its original…
    assert(dupIds.forall(id => got.contains((id + 2000000L, id))))
    // …and no %7==3 (re-texted) row survives the exact verify
    assert(got.forall { case (nid, _) => (nid - 2000000L) % 7 == 0 })
    df.unpersist()
  }

  test("semdedup: planted copies dropped, originals kept, nothing else flagged") {
    val df = SparkEntry.queries("q_semdedup")(spark, sf).cache()
    val nVecs = graft.sources.Tables.embeddings(spark, sf).count()
    val nPlanted = graft.sources.Tables.embeddings(spark, sf)
      .filter(pmod(col("vec_id"), lit(5)) === 0).count()
    assert(df.count() == nVecs + nPlanted)
    // every planted verbatim copy is the larger-id member of a cos=1
    // pair → dropped; distinct originals never reach the threshold
    assert(df.filter(col("vec_id") >= 1000000L && col("keep") === 1).count() == 0)
    assert(df.filter(col("vec_id") < 1000000L && col("keep") === 0).count() == 0)
    df.unpersist()
  }

  test("tfidf: at most 3 ranked terms per doc, weights non-negative") {
    val df = SparkEntry.queries("q_tfidf")(spark, sf).cache()
    val perDoc = df.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n"), max(col("rank")).as("maxr"), min(col("rank")).as("minr"))
    assert(perDoc.filter(col("n") > 3).count() == 0)
    // ranks are contiguous from 1
    assert(perDoc.filter(col("minr") =!= 1 || col("maxr") =!= col("n")).count() == 0)
    // df <= N → ln(N/df) >= 0 → tfidf >= 0
    assert(df.filter(col("tfidf") < 0).count() == 0)
    df.unpersist()
  }

  test("ngram_lm: conditional log-probs non-positive, counts consistent") {
    val df = SparkEntry.queries("q_ngram_lm")(spark, sf).cache()
    assert(df.count() == 50)
    // every bigram occurrence implies a w1 occurrence → c2 <= c1 → logp <= 0
    assert(df.filter(col("logp") > 0).count() == 0)
    // descending by count
    val counts = df.select(col("c2")).collect().map(_.getLong(0))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    df.unpersist()
  }

  test("url_normalize: canonical forms collapse case/www/query/slash variants") {
    val df = SparkEntry.queries("q_url_normalize")(spark, sf).cache()
    val docs = graft.sources.Tables.documents(spark, sf).count()
    // 20 planted domains; all normalized (lowercase, no www, no query)
    assert(df.count() == math.min(20L, docs))
    assert(df.filter(col("domain").rlike("[A-Z]|www\\.|\\?")).count() == 0)
    // per-domain unique URLs bounded by the 7 path variants
    assert(df.filter(col("n_unique_urls") > 7).count() == 0)
    assert(df.agg(sum(col("n_urls"))).head().getLong(0) == docs)
    df.unpersist()
  }

  test("BloomIndex: save/load roundtrip, no false negatives, prune/definitelyNew partition") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("h"))
    val index = graft.dedup.BloomIndex.build(docs, "h", expectedItems = 10000L)
    // storable artifact: byte-identical through disk
    val tmp = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    graft.dedup.BloomIndex.save(index, s"$tmp/idx/corpus.bloom")
    val loaded = graft.dedup.BloomIndex.load(s"$tmp/idx/corpus.bloom")
    assert(java.util.Arrays.equals(index, loaded))
    // no false negatives: every indexed key passes prune
    assert(graft.dedup.BloomIndex.prune(docs, "h", loaded).count() == docs.count())
    // fresh keys: definitelyNew + prune partition the frame
    val fresh = docs.select(md5(concat(col("h"), lit("x"))).as("h"))
    val n = fresh.count()
    val newN = graft.dedup.BloomIndex.definitelyNew(fresh, "h", loaded).count()
    val mightN = graft.dedup.BloomIndex.prune(fresh, "h", loaded).count()
    assert(newN + mightN == n)
    // with a reasonably-sized sketch, false positives are rare
    assert(mightN < n / 10)
    // EMPTY corpus → null sketch → everything is definitely new
    // (not the null predicate, which would drop every row from both
    // prune and definitelyNew)
    val emptyIdx = graft.dedup.BloomIndex.build(docs.limit(0), "h")
    assert(graft.dedup.BloomIndex.definitelyNew(fresh, "h", emptyIdx).count() == n)
    assert(graft.dedup.BloomIndex.prune(fresh, "h", emptyIdx).count() == 0)
  }

  test("CurationJob: writes curated docs, packing table and bloom artifact; idempotent") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("graft-curation").toString
    val r1 = graft.pipelines.CurationJob.run(docs, out)
    assert(r1.input == docs.count())
    assert(r1.afterQuality <= r1.input && r1.afterDedup <= r1.afterQuality)
    assert(r1.afterMix <= r1.afterDedup && r1.afterMix > 0 && r1.bins > 0)
    // artifacts readable; curated is source-partitioned
    val curated = spark.read.parquet(s"$out/curated")
    assert(curated.count() == r1.afterDedup)
    assert(curated.columns.contains("source"))
    // the bloom artifact admits every curated doc (no false negatives)
    val idx = graft.dedup.BloomIndex.load(s"$out/corpus.bloom")
    val hashes = curated.select(md5(col("text")).as("h"))
    assert(graft.dedup.BloomIndex.prune(hashes, "h", idx).count() == r1.afterDedup)
    // re-run overwrites to the same counts (idempotent)
    val r2 = graft.pipelines.CurationJob.run(docs, out)
    assert(r2 == r1)
  }

  test("bpe_merge_step: 2-char pairs, counts descending") {
    val rows = SparkEntry.queries("q_bpe_merge_step")(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getAs[String]("pair").length == 2))
    val counts = rows.map(_.getAs[Long]("cnt"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
  }

  test("CurationJob.release: all stages commit versioned artifacts; a retry recomputes nothing") {
    import graft.sources.Snapshots
    val docs = graft.sources.Tables.documents(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("graft-release").toString
    val stages = Seq("curated", "labels", "tokens", "bins", "shards",
      "card", "report", "savings")
    val r1 = graft.pipelines.CurationJob.release(docs, out)
    assert(r1.versions.keySet == stages.toSet)
    // recomputed reports the ACTUAL artifact name (runId-keyed), and a
    // `latest` pointer names it for fixed-path consumers
    assert(r1.recomputed.toSet == stages.toSet + s"corpus.${r1.runId}.bloom")
    def latestBloom(): String = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/corpus.bloom.latest")), "UTF-8")
    assert(latestBloom() == s"corpus.${r1.runId}.bloom")
    val curated = Snapshots.readVersion(spark, s"$out/curated", r1.versions("curated"))
    val labels = Snapshots.readVersion(spark, s"$out/labels", r1.versions("labels"))
    val tokens = Snapshots.readVersion(spark, s"$out/tokens", r1.versions("tokens"))
    val nCur = curated.count()
    assert(nCur > 0 && labels.count() == nCur && tokens.count() == nCur)
    // decontamination held out the eval slice and dropped leaks
    assert(curated.filter(pmod(col("doc_id"), lit(97)) === 0).count() == 0)
    assert(tokens.agg(min(col("n_tok"))).head.getLong(0) > 0)
    // the report artifact IS #36d over the STORED labeling
    val report = Snapshots.readVersion(spark, s"$out/report", r1.versions("report"))
    val want = graft.queries.LlmData.dedupReportOf(labels)
    assert(report.exceptAll(want).count() == 0 && want.exceptAll(report).count() == 0)
    // card: one row per curated source; savings: one coherent row
    val card = Snapshots.readVersion(spark, s"$out/card", r1.versions("card"))
    assert(card.count() == curated.select(col("source")).distinct().count())
    val sav = Snapshots.readVersion(spark, s"$out/savings", r1.versions("savings")).head()
    assert(sav.getLong(sav.fieldIndex("n_docs")) == nCur &&
      sav.getLong(sav.fieldIndex("kept_docs")) <= nCur)
    // clean retry: same versions, ZERO stages recomputed
    val r2 = graft.pipelines.CurationJob.release(docs, out)
    assert(r2.versions == r1.versions && r2.recomputed.isEmpty)
    // a changed input commits forward while the old release stays pinned
    val r3 = graft.pipelines.CurationJob.release(
      docs.filter(pmod(col("doc_id"), lit(2)) === 0), out)
    assert(r3.runId != r1.runId &&
      r3.versions("curated") > r1.versions("curated"))
    assert(Snapshots.readVersion(spark, s"$out/curated", r1.versions("curated"))
      .count() == nCur)
    // bloom retention: the superseded run's bloom is pruned on the new
    // release and the latest pointer follows the winner
    val blooms = new java.io.File(out).listFiles()
      .map(_.getName).filter(n => n.startsWith("corpus.") && n.endsWith(".bloom"))
    assert(blooms.toSeq == Seq(s"corpus.${r3.runId}.bloom"),
      s"stale blooms survive release: ${blooms.mkString(",")}")
    assert(latestBloom() == s"corpus.${r3.runId}.bloom")
    // STALE REPLAY of the superseded release: a retried r1 (its
    // stages all no-op, its bloom already pruned by r3) must not
    // rebuild the old bloom, delete r3's, or roll the marker back
    val r1replay = graft.pipelines.CurationJob.release(docs, out)
    assert(r1replay.versions == r1.versions && r1replay.recomputed.isEmpty,
      "stale replay recomputed artifacts")
    val bloomsAfter = new java.io.File(out).listFiles()
      .map(_.getName).filter(n => n.startsWith("corpus.") && n.endsWith(".bloom"))
    assert(bloomsAfter.toSeq == Seq(s"corpus.${r3.runId}.bloom"),
      s"stale replay disturbed the winner's bloom: ${bloomsAfter.mkString(",")}")
    assert(latestBloom() == s"corpus.${r3.runId}.bloom",
      "stale replay rolled the latest marker backwards")
    // the superseded Release must hand back a bloom that EXISTS (the
    // winner's), flagged as superseded — never a path to the pruned
    // corpus.<r1.runId>.bloom a prefilter consumer would fail to load
    assert(r1replay.superseded, "stale replay not flagged as superseded")
    assert(r1replay.bloomPath == s"$out/corpus.${r3.runId}.bloom",
      s"superseded Release served the wrong bloom: ${r1replay.bloomPath}")
    assert(new java.io.File(r1replay.bloomPath).exists(),
      "superseded Release served a nonexistent bloom")
    graft.dedup.BloomIndex.load(r1replay.bloomPath)
    // the winning releases are never flagged
    assert(!r1.superseded && !r3.superseded)
  }

  test("CurationJob: empty-after-quality input completes with empty artifacts") {
    // nothing passes the quality gate → deduped corpus empty → the
    // bloom sketch is null; the job must finish, not NPE after the
    // curated write
    val junk = spark.range(3).select(col("id").as("doc_id"),
      lit("spam spam spam spam spam spam spam spam spam spam spam spam").as("text"),
      lit("en").as("lang"), lit("src0").as("source"), lit(60L).as("n_chars"))
    val out = java.nio.file.Files.createTempDirectory("graft-curation-empty").toString
    val r = graft.pipelines.CurationJob.run(junk, out)
    assert(r.input == 3 && r.afterQuality == 0 && r.afterDedup == 0)
    assert(r.afterMix == 0 && r.bins == 0)
    // null sketch round-trips as a zero-byte artifact → constant-false
    val idx = graft.dedup.BloomIndex.load(s"$out/corpus.bloom")
    assert(idx == null)
    val probe = spark.range(2).select(md5(col("id").cast("string")).as("h"))
    assert(graft.dedup.BloomIndex.definitelyNew(probe, "h", idx).count() == 2)
  }

  test("containment: planted excerpts fully contained in their originals") {
    val rows = SparkEntry.queries("q_containment")(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.forall { r =>
      val c = r.getAs[Double]("containment"); c > 0 && c <= 1.0 })
    // full containment exists (planted excerpts guarantee it even on a
    // corpus with no natural subset pairs) and the list is sorted desc
    assert(rows.head.getAs[Double]("containment") == 1.0)
    val vals = rows.map(_.getAs[Double]("containment"))
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
    // asymmetry: an excerpt is fully contained in its original —
    // verified directly on one planted pair
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val orig = docs.filter(pmod(col("doc_id"), lit(9)) === 0).limit(1)
      .select(col("doc_id"),
        array_distinct(graft.plans.WordShingles(col("text"), 3)).as("shs"),
        array_distinct(graft.plans.WordShingles(
          array_join(slice(split(col("text"), " "), 1, 16), " "), 3)).as("ex_shs"))
      .head()
    val shs = orig.getAs[Seq[String]]("shs").toSet
    val exShs = orig.getAs[Seq[String]]("ex_shs").toSet
    assert(exShs.nonEmpty && exShs.subsetOf(shs))
  }

  test("contamination_report: one row per eval doc, leak bounded by gram count") {
    val df = SparkEntry.queries("q_contamination_report")(spark, sf).cache()
    val nEval = graft.sources.Tables.documents(spark, sf)
      .filter(pmod(col("doc_id"), lit(97)) === 0).count()
    assert(df.count() == nEval)
    assert(df.filter(col("n_leaked_grams") > col("n_grams")).count() == 0)
    assert(df.filter(col("leak_frac") < 0 || col("leak_frac") > 1).count() == 0)
    df.unpersist()
  }

  test("dedup_report: histogram accounts for every document exactly once") {
    val df = SparkEntry.queries("q_dedup_report")(spark, sf).cache()
    val total = graft.sources.Tables.documents(spark, sf).count()
    assert(df.agg(sum(col("n_docs"))).head().getLong(0) == total)
    assert(df.filter(
      col("n_dropped") =!= col("n_docs") - col("n_clusters")).count() == 0)
    // singleton clusters exist (most docs are not near-dups)
    assert(df.filter(col("cluster_size") === 1).count() == 1)
    df.unpersist()
  }

  test("minhash_accuracy: estimates bounded, error consistent, estimator informative") {
    val df = SparkEntry.queries("q_minhash_accuracy")(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("est") < 0 || col("est") > 1).count() == 0)
    assert(df.filter(col("jaccard") < 0 || col("jaccard") > 1).count() == 0)
    assert(df.filter(
      abs(abs(col("est") - col("jaccard")) - col("abs_err")) > 1e-6).count() == 0)
    // the estimator must be informative on LSH candidates: mean error
    // well under chance (candidates share bands, so both est and true
    // jaccard are high — a broken estimator would show ~0.5 error)
    assert(df.agg(avg(col("abs_err"))).head().getDouble(0) < 0.3)
    df.unpersist()
  }

  test("dedup_bloom: plan applies the native bloom predicate before the join") {
    val plan = SparkEntry.queries("q_dedup_bloom")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"))
  }

  test("decontam_sweep: containment monotone in n; n=8 row equals q_decontaminate") {
    val sweep = SparkEntry.queries("q_decontam_sweep")(spark, sf).collect()
      .map(r => r.getAs[Int]("n") ->
        (r.getAs[Long]("n_contaminated"), r.getAs[Long]("n_overlap_grams"))).toMap
    assert(sweep.keySet == Set(5, 8, 13))
    // a shared 13-token run contains shared 8- and 5-token runs, so
    // flagged counts can only shrink as n grows
    assert(sweep(5)._1 >= sweep(8)._1 && sweep(8)._1 >= sweep(13)._1,
      s"containment monotonicity violated: $sweep")
    // cross-check the n=8 branch against the per-doc #74 operator
    val d74 = SparkEntry.queries("q_decontaminate")(spark, sf)
      .agg(sum(col("contaminated").cast("long")), sum(col("n_overlap"))).head()
    assert(sweep(8) == ((d74.getLong(0), d74.getLong(1))),
      s"sweep n=8 ${sweep(8)} != decontaminate aggregate $d74")
  }

  test("absorbDaily: O(batch) daily ingest — dedup vs stored index, idempotent, chained days") {
    import spark.implicits._
    import graft.dedup.LshIndex
    import graft.pipelines.CurationJob
    import graft.sources.Snapshots
    val corpus = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val curatedRoot =
      java.nio.file.Files.createTempDirectory("graft-curated").toString
    val lshRoot = java.nio.file.Files.createTempDirectory("graft-ingestlsh").toString
    Snapshots.commit(corpus, curatedRoot)
    LshIndex.build(corpus, lshRoot)
    val baseN = corpus.count()
    // day-1 batch: near-dups of corpus docs + fresh docs + junk
    // 12 unique 5-7 char words: passes the 10-token / mean-word-len /
    // symbol-ratio / repetition gates
    def freshDoc(i: Int): String =
      (0 until 12).map(j => s"fr${i}w$j").mkString(" ")
    val nearDups = corpus.filter(pmod(col("doc_id"), lit(10)) === 0).limit(10)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" near dup probe")).as("text"))
      .as[(Long, String)].collect().toSeq
    val fresh = (0 until 5).map(i => (2000000L + i, freshDoc(i)))
    val junk = Seq((3000000L, "x"))
    val day1 = (nearDups ++ fresh ++ junk).toDF("doc_id", "text")
    val d1 = CurationJob.absorbDaily(day1, curatedRoot, lshRoot, batchId = 0L)
      .cache()
    // dispositions: junk fails quality; near-dups match; fresh kept
    assert(d1.filter(col("doc_id") === 3000000L && col("quality_pass") === 0 &&
      col("kept") === 0).count() == 1, "junk doc was not quality-rejected")
    assert(d1.filter(col("doc_id") >= 2000000L && col("doc_id") < 3000000L &&
      col("kept") === 1).count() == 5, "fresh docs were not all kept")
    val dupDrops = d1.filter(col("doc_id") >= 1000000L && col("doc_id") < 2000000L &&
      col("n_matches") > 0 && col("kept") === 0).count()
    assert(dupDrops > 0, "no planted near-dup was matched and dropped")
    // curated corpus grew by exactly the kept docs, as a delta
    val kept1 = d1.filter(col("kept") === 1).count()
    assert(Snapshots.read(spark, curatedRoot).count() == baseN + kept1)
    val cv1 = Snapshots.versions(curatedRoot)
    // idempotent replay: same batchId → no new versions, same verdicts
    val d1b = CurationJob.absorbDaily(day1, curatedRoot, lshRoot, batchId = 0L)
    assert(Snapshots.versions(curatedRoot) == cv1,
      "replayed day committed a new curated version")
    assert(d1.exceptAll(d1b).count() == 0 && d1b.exceptAll(d1).count() == 0,
      "replayed day changed the disposition")
    // day 2: a near-dup OF A DAY-1 FRESH DOC must be dropped — the
    // stored index absorbed day 1, so day 2 sees it
    val day2 = Seq((4000000L, freshDoc(1) + " again and again")).toDF("doc_id", "text")
    val d2 = CurationJob.absorbDaily(day2, curatedRoot, lshRoot, batchId = 1L)
    assert(d2.filter(col("doc_id") === 4000000L && col("n_matches") > 0 &&
      col("kept") === 0).count() == 1,
      "day-2 near-dup of a day-1 doc was not caught by the absorbed index")

    // NIGHTLY MAINTENANCE: both days left delta chains on all three
    // roots — nightly compacts each back to one full snapshot and
    // vacuums history, with every reader invariant intact
    val preCount = Snapshots.read(spark, curatedRoot).count()
    val m = CurationJob.nightly(spark, curatedRoot, lshRoot, keep = 0)
    assert(m.compacted(curatedRoot).nonEmpty, "curated chain was not compacted")
    assert(m.compacted(LshIndex.bandsRoot(lshRoot)).nonEmpty &&
      m.compacted(LshIndex.shinglesRoot(lshRoot)).nonEmpty,
      "an index chain was not compacted")
    Seq(curatedRoot, LshIndex.bandsRoot(lshRoot),
        LshIndex.shinglesRoot(lshRoot)).foreach { r =>
      assert(!Snapshots.isDelta(r, Snapshots.latestVersion(r).get),
        s"latest under $r still a delta after nightly")
    }
    assert(m.vacuumed(curatedRoot).nonEmpty, "keep=0 vacuum dropped nothing")
    assert(Snapshots.read(spark, curatedRoot).count() == preCount,
      "nightly changed the curated corpus contents")
    // a re-run is free: nothing left to compact, nothing to vacuum
    val m2 = CurationJob.nightly(spark, curatedRoot, lshRoot, keep = 0)
    assert(m2.compacted.values.forall(_.isEmpty) &&
      m2.vacuumed.values.forall(_.isEmpty), "nightly re-run was not a no-op")
    // the replay watermark survived compaction: a re-delivered day-2
    // batch still no-ops on every root
    val cvN = Snapshots.versions(curatedRoot)
    val bvN = Snapshots.versions(LshIndex.bandsRoot(lshRoot))
    val d2b = CurationJob.absorbDaily(day2, curatedRoot, lshRoot, batchId = 1L)
    assert(Snapshots.versions(curatedRoot) == cvN &&
      Snapshots.versions(LshIndex.bandsRoot(lshRoot)) == bvN,
      "replayed day re-appended after nightly compaction")
    assert(d2.exceptAll(d2b).count() == 0 && d2b.exceptAll(d2).count() == 0)
    // and day 3 still matches THROUGH the compacted index
    val day3 = Seq((5000000L, freshDoc(2) + " once more with feeling"))
      .toDF("doc_id", "text")
    val d3 = CurationJob.absorbDaily(day3, curatedRoot, lshRoot, batchId = 2L)
    assert(d3.filter(col("doc_id") === 5000000L && col("n_matches") > 0 &&
      col("kept") === 0).count() == 1,
      "day-3 near-dup lost its match after nightly maintenance")
    d1.unpersist()
  }

  test("nightly with matches + vector roots: one entry point maintains every chain") {
    import spark.implicits._
    import graft.dedup.LshIndex
    import graft.pipelines.CurationJob
    import graft.similarity.{Embeddings, VectorIndex}
    import graft.sources.{Snapshots, Tables}
    val corpus = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val base = java.nio.file.Files.createTempDirectory("graft-nightly-all").toString
    val (curatedRoot, lshRoot, matchesRoot, vecRoot) =
      (s"$base/cur", s"$base/lsh", s"$base/matches", s"$base/vec")
    Snapshots.commit(corpus, curatedRoot)
    LshIndex.build(corpus, lshRoot)
    // grow a matches chain the way the streaming absorb loop does
    val b1 = corpus.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" near dup probe")).as("text"))
    CurationJob.absorbDaily(b1, curatedRoot, lshRoot, batchId = 0L)
    val m1 = LshIndex.absorbBatch(spark, lshRoot, b1.select(col("doc_id"),
      concat(col("text"), lit(" x")).as("text")), batchId = 1L)
    Snapshots.commitBatch(m1, matchesRoot, 0L)
    Snapshots.commitAppend(m1, matchesRoot, batchId = Some(1L))
    // and both vector chains
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), Embeddings.asDouble(col("embedding")).as("v"))
    val isB = pmod(col("vec_id"), lit(10)) === 7
    VectorIndex.build(vecs.filter(!isB), vecRoot)
    VectorIndex.buildPq(vecs.filter(!isB), vecRoot)
    VectorIndex.assignBatch(spark, vecRoot, vecs.filter(isB), batchId = 0L)
    VectorIndex.encodeBatchPq(spark, vecRoot, vecs.filter(isB), batchId = 0L)
    val m = CurationJob.nightly(spark, curatedRoot, lshRoot, keep = 7,
      matchesRoot = Some(matchesRoot), vectorRoot = Some(vecRoot))
    // every grown chain compacted in the ONE call
    Seq(curatedRoot, LshIndex.bandsRoot(lshRoot), LshIndex.shinglesRoot(lshRoot),
        matchesRoot, VectorIndex.assignmentsRoot(vecRoot),
        VectorIndex.pqCodesRoot(vecRoot)).foreach { r =>
      assert(m.compacted(r).nonEmpty, s"$r was not compacted")
      assert(!Snapshots.isDelta(r, Snapshots.latestVersion(r).get))
    }
    // full-commit-only vector roots are vacuum-covered but not compacted
    assert(m.compacted(VectorIndex.centroidsRoot(vecRoot)).isEmpty &&
      m.compacted.contains(VectorIndex.centroidsRoot(vecRoot)))
    // replay watermarks survived everywhere
    val mv = Snapshots.versions(matchesRoot)
    Snapshots.commitAppend(m1, matchesRoot, batchId = Some(1L))
    assert(Snapshots.versions(matchesRoot) == mv,
      "matches chain lost its watermark in the combined nightly")
  }

  test("curation week: corpus monotone, fresh kept, corpus-dups dropped, replay-stable") {
    val corpus = graft.sources.Tables.documents(spark, sf)
    val r1 = SparkEntry.queries("q_curation_week")(spark, sf).cache()
    // every original corpus doc survives the week untouched
    assert(r1.filter(col("doc_id") < 1000000L).count() == corpus.count())
    // fresh (reversed-token) docs were kept...
    assert(r1.filter(col("doc_id").between(10000000L, 19999999L)).count() > 0,
      "no fresh doc survived the week")
    // ...while near-dup plants of corpus docs were overwhelmingly
    // dropped (each matches its original through the stored index)
    val dupsKept = r1.filter(col("doc_id").between(1000000L, 7999999L)).count()
    val dupsPlanted = (0 until 7).map(d =>
      corpus.filter(pmod(col("doc_id"), lit(10)) === d).count()).sum
    assert(dupsKept < dupsPlanted / 2,
      s"corpus dups not dropped: $dupsKept of $dupsPlanted kept")
    // a full re-run replays all 7 days as no-ops: same corpus
    val r2 = SparkEntry.queries("q_curation_week")(spark, sf)
    assert(r1.exceptAll(r2).count() == 0 && r2.exceptAll(r1).count() == 0,
      "week replay changed the curated corpus")
    r1.unpersist()
  }

  test("forget: a deleted doc leaves the corpus, stops matching ingest, and erases physically") {
    import spark.implicits._
    import graft.dedup.LshIndex
    import graft.pipelines.CurationJob
    import graft.sources.Snapshots
    val corpus = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val curatedRoot =
      java.nio.file.Files.createTempDirectory("graft-forget-cur").toString
    val lshRoot = java.nio.file.Files.createTempDirectory("graft-forget-lsh").toString
    Snapshots.commit(corpus, curatedRoot)
    LshIndex.build(corpus, lshRoot)
    def freshDoc(i: Int): String =
      (0 until 12).map(j => s"fg${i}w$j").mkString(" ")
    // day 1 lands a fresh doc F
    val day1 = Seq((1000000L, freshDoc(1))).toDF("doc_id", "text")
    CurationJob.absorbDaily(day1, curatedRoot, lshRoot, batchId = 0L)
    assert(Snapshots.read(spark, curatedRoot)
      .filter(col("doc_id") === 1000000L).count() == 1)
    // a near-dup of F is dropped while F is indexed
    val probe = Seq((2000000L, freshDoc(1) + " again and again"))
      .toDF("doc_id", "text")
    val pre = CurationJob.absorbDaily(probe, curatedRoot, lshRoot, batchId = 1L)
    assert(pre.filter(col("doc_id") === 2000000L && col("kept") === 0)
      .count() == 1, "probe did not match F pre-delete")
    // FORGET F: gone from the corpus, and a new near-dup of F sails
    // through — F no longer matches anything
    CurationJob.forget(spark, curatedRoot, lshRoot,
      Seq(1000000L).toDF("doc_id"), batchId = Some(2L))
    assert(Snapshots.read(spark, curatedRoot)
      .filter(col("doc_id") === 1000000L).count() == 0,
      "forgotten doc still readable in the curated corpus")
    val probe2 = Seq((3000000L, freshDoc(1) + " yet another run"))
      .toDF("doc_id", "text")
    val post = CurationJob.absorbDaily(probe2, curatedRoot, lshRoot, batchId = 3L)
    assert(post.filter(col("doc_id") === 3000000L && col("n_matches") === 0 &&
      col("kept") === 1).count() == 1,
      "forgotten doc still matches new arrivals")
    // audit view: pre-delete curated version still shows F
    assert(Snapshots.readVersion(spark, curatedRoot, 1L)
      .filter(col("doc_id") === 1000000L).count() == 1,
      "pre-delete time travel lost the audit view")
    // replayed forget no-ops on the shared monotone clock... it is
    // BELOW the watermark now (absorb 3 advanced it)
    val cv = Snapshots.versions(curatedRoot)
    CurationJob.forget(spark, curatedRoot, lshRoot,
      Seq(1000000L).toDF("doc_id"), batchId = Some(2L))
    assert(Snapshots.versions(curatedRoot) == cv, "replayed forget re-committed")
    // physical erasure: nightly compaction + vacuum drop the bytes
    CurationJob.nightly(spark, curatedRoot, lshRoot, keep = 0)
    Seq(curatedRoot, LshIndex.bandsRoot(lshRoot),
        LshIndex.shinglesRoot(lshRoot)).foreach { r =>
      val latest = Snapshots.latestVersion(r).get
      assert(spark.read.option("basePath", s"$r/data/v=$latest")
        .parquet(s"$r/data/v=$latest")
        .filter(col("doc_id") === 1000000L).count() == 0,
        s"forgotten bytes survived nightly under $r")
    }
  }

  test("nightly + forget reach the span index: chain compacts, forgotten spans stop matching") {
    import spark.implicits._
    import graft.dedup.{LshIndex, SpanIndex}
    import graft.sources.Snapshots
    val base = java.nio.file.Files.createTempDirectory("graft-spanops").toString
    val (curatedRoot, lshRoot, spanRoot) =
      (s"$base/curated", s"$base/lsh", s"$base/span")
    def doc(i: Int): String = (0 until 40).map(j => s"w${i}x$j").mkString(" ")
    val corpus = Seq((1L, doc(1)), (2L, doc(2)), (3L, doc(3)))
      .toDF("doc_id", "text")
    Snapshots.commit(corpus, curatedRoot)
    LshIndex.build(corpus, lshRoot)
    SpanIndex.build(corpus, spanRoot)
    SpanIndex.absorbBatch(spark, spanRoot,
      Seq((100L, doc(4))).toDF("doc_id", "text"), batchId = 0L).count()
    // nightly with a span root compacts the smod chain in the same pass
    graft.pipelines.CurationJob.nightly(spark, curatedRoot, lshRoot,
      keep = 3, spanRoot = Some(spanRoot))
    val sroot = SpanIndex.spansRoot(spanRoot)
    assert(!Snapshots.isDelta(sroot, Snapshots.latestVersion(sroot).get),
      "nightly left the span chain un-compacted")
    // forget doc 2 through curated + LSH + spans in ONE call
    graft.pipelines.CurationJob.forget(spark, curatedRoot, lshRoot,
      Seq(2L).toDF("doc_id"), batchId = Some(1L), spanRoot = Some(spanRoot))
    // a re-send of the forgotten text matches nothing in the span index
    val r = SpanIndex.absorbBatch(spark, spanRoot,
      Seq((200L, doc(2))).toDF("doc_id", "text"), batchId = 2L).head()
    assert(r.getAs[Long]("n_dup_spans") == 0L,
      "forgotten doc's spans still matched a new arrival")
    // and the curated corpus no longer serves it
    assert(Snapshots.read(spark, curatedRoot)
      .filter(col("doc_id") === 2L).count() == 0,
      "forgotten doc still readable from the curated corpus")
  }

  test("absorbDaily with a span root: the day's candidates enter the span index on the same clock") {
    import spark.implicits._
    import graft.dedup.{LshIndex, SpanIndex}
    import graft.sources.Snapshots
    val base = java.nio.file.Files.createTempDirectory("graft-dailyspan").toString
    val (curatedRoot, lshRoot, spanRoot) =
      (s"$base/curated", s"$base/lsh", s"$base/span")
    def doc(i: Int): String = (0 until 40).map(j => s"d${i}y$j").mkString(" ")
    val corpus = Seq((1L, doc(1)), (2L, doc(2))).toDF("doc_id", "text")
    Snapshots.commit(corpus, curatedRoot)
    LshIndex.build(corpus, lshRoot)
    SpanIndex.build(corpus, spanRoot)
    val day1 = Seq((100L, doc(3))).toDF("doc_id", "text")
    graft.pipelines.CurationJob.absorbDaily(day1, curatedRoot, lshRoot,
      batchId = 0L, spanRoot = Some(spanRoot)).count()
    // a day-2 verbatim re-send is fully duplicated THROUGH day 1's
    // absorbed spans — without the spanRoot plumb the span index
    // would never have seen the ingest
    val r = SpanIndex.absorbBatch(spark, spanRoot,
      Seq((200L, doc(3))).toDF("doc_id", "text"), batchId = 1L).head()
    assert(r.getAs[Long]("n_dup_spans") == r.getAs[Long]("n_spans"),
      "daily ingest did not reach the span index")
    // a replayed day 1 no-ops on the span chain too (shared clock)
    val vs = Snapshots.versions(SpanIndex.spansRoot(spanRoot))
    graft.pipelines.CurationJob.absorbDaily(day1, curatedRoot, lshRoot,
      batchId = 0L, spanRoot = Some(spanRoot)).count()
    assert(Snapshots.versions(SpanIndex.spansRoot(spanRoot)) == vs,
      "replayed daily batch re-appended spans")
  }
}
