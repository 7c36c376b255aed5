package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainingData

/** Corpus-preparation operators: chunking, decontamination, stratified
  * sampling. */
class TrainingDataSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("chunkTokens: disjoint and overlapping windows cover every token") {
    val docs = Seq((1L, (1 to 75).map(i => s"t$i").mkString(" ")),
      (2L, "a b c")).toDF("doc_id", "text")
    val disjoint = TrainingData.chunkTokens(docs, maxTokens = 32).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    // 75 tokens at 32/chunk → 3 chunks of 32+32+11; 3 tokens → 1 chunk
    assert(disjoint.filter(_._1 == 1L).toSeq ==
      Seq((1L, 0, 0, 32), (1L, 1, 32, 32), (1L, 2, 64, 11)))
    assert(disjoint.filter(_._1 == 2L).toSeq == Seq((2L, 0, 0, 3)))
    val overlapped = TrainingData.chunkTokens(docs.filter($"doc_id" === 1), 32, overlap = 4)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3)))
    // stride 28: starts 0,28,56 with sizes 32,32,19
    assert(overlapped.toSeq == Seq((0, 0, 32), (1, 28, 32), (2, 56, 19)))
    intercept[IllegalArgumentException] {
      TrainingData.chunkTokens(docs, maxTokens = 8, overlap = 8)
    }
  }

  test("contamination finds planted eval overlap, skips short docs") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"), // eval (0 % 50 == 0)
      (1L, "prefix words then alpha beta gamma delta epsilon end"), // contaminated
      (2L, "completely different content with no overlap at all"),
      (3L, "tiny")).toDF("doc_id", "text") // < n tokens: no grams, no crash
    val hits = TrainingData.contamination(docs, docs.filter($"doc_id" % 50 === 0), n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(hits.keySet == Set(1L))
    assert(hits(1L) == 1L) // one eval doc matched
  }

  test("repetitionSignals counts words, distincts, top word and top bigram") {
    val docs = Seq(
      (1L, "spam spam spam ham"),   // top word spam×3; top bigram "spam spam"×2
      (2L, "a b a b a"),            // 5 words, 2 distinct; "a b"×2
      (3L, "solo")                  // 1 word: no bigrams at all
    ).toDF("doc_id", "text")
    val m = TrainingData.repetitionSignals(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(m(1L) == (4L, 2L, 3L, 2L), s"doc 1: ${m(1L)}")
    assert(m(2L) == (5L, 2L, 3L, 2L), s"doc 2: ${m(2L)}")
    assert(m(3L) == (1L, 1L, 1L, 0L), s"doc 3 (no bigram): ${m(3L)}")
  }

  test("hashSplit is content-stable and respects thresholds") {
    val docs = Seq((1L, "some document"), (2L, "another document"),
      (3L, "some document")).toDF("doc_id", "text")
    val rows = TrainingData.hashSplit(docs).select("doc_id", "bucket", "split")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(rows(1L) == rows(3L), "identical text → identical split")
    rows.values.foreach { case (b, s) =>
      assert(b >= 0 && b < 256)
      val expect = if (b < 205) "train" else if (b < 230) "val" else "test"
      assert(s == expect, s"bucket $b mapped to $s")
    }
    // all-train / all-test degenerate thresholds still valid
    assert(TrainingData.hashSplit(docs, trainUpto = 256, valUpto = 256)
      .filter($"split" =!= "train").count() == 0)
    intercept[IllegalArgumentException] {
      TrainingData.hashSplit(docs, trainUpto = 300, valUpto = 400)
    }
  }

  test("lineDedup keeps each line only at its first (doc, position) occurrence") {
    val docs = Seq(
      (1L, "x\ny\nx"), // intra-doc repeat of x must also go
      (2L, "y\nz"),    // y lost to doc 1, z survives
      (3L, "x")        // fully duplicated doc → empty survivor
    ).toDF("doc_id", "text")
    val m = TrainingData.lineDedup(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(m(1L) == (3L, 2L, "x\ny"), s"doc 1: ${m(1L)}")
    assert(m(2L) == (2L, 1L, "z"), s"doc 2: ${m(2L)}")
    assert(m(3L) == (1L, 0L, ""), s"doc 3: ${m(3L)}")
  }

  test("lineDedup and packSequences treat null text as empty, never drop docs") {
    val docs = Seq((1L, "x\ny"), (2L, null.asInstanceOf[String]), (3L, "z"))
      .toDF("doc_id", "text")
    val ld = TrainingData.lineDedup(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(ld.keySet == Set(1L, 2L, 3L), "every doc must appear in the output")
    assert(ld(2L) == (1L, 1L, ""), s"null doc = one empty line: ${ld(2L)}")
    val ps = TrainingData.packSequences(docs, budget = 10, nShards = 1).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(ps.map(_._1).toSet == Set(1L, 2L, 3L), "null doc must occupy budget")
    assert(ps.toMap.apply(2L) == 1L, "null doc counts the 1-token floor")
  }

  test("dupSpans finds cross-doc windows; hashed mode matches; stride thins") {
    val docs = Seq((1L, "abcdef"), (2L, "zabcd"), (3L, "qqq"))
      .toDF("doc_id", "text") // doc 3 shorter than the span → contributes none
    val plain = TrainingData.dupSpans(docs, spanLen = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(plain.toSeq == Seq(("abcd", 2L, 2L)), s"got ${plain.toSeq}")
    val hashed = TrainingData.dupSpans(docs, spanLen = 4, hashed = true).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(hashed.toSeq.sorted == plain.map(p => (p._2, p._3)).toSeq.sorted,
      "hashed mode must surface the same (n_docs, n_occ) population")
    // stride 2 samples positions 1,3,…: doc 1 yields abcd+cdef, doc 2 only
    // zabc — the shared window is no longer sampled on both sides
    assert(TrainingData.dupSpans(docs, spanLen = 4, stride = 2).count() == 0)
  }

  test("packSequences packs per shard, splits straddlers exactly at the budget") {
    val docs = Seq(
      (1L, "a b c d"),                   // 4 tokens
      (2L, "a b c d e f g h"),           // 8 tokens
      (3L, "a b c d e")                  // 5 tokens
    ).toDF("doc_id", "text")
    val one = TrainingData.packSequences(docs, budget = 10, nShards = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // stream: doc1 [0,4) seq0; doc2 [4,12) splits 6|2; doc3 [12,17) seq1
    assert(one == Set(
      (1L, 0L, 0L, 4L), (2L, 0L, 0L, 6L), (2L, 0L, 1L, 2L), (3L, 0L, 1L, 5L)),
      s"got $one")
    val sharded = TrainingData.packSequences(docs, budget = 10, nShards = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // shard 0: doc2 alone [0,8) seq0; shard 1: doc1 [0,4), doc3 [4,9) — both seq0
    assert(sharded == Set((2L, 0L, 0L, 8L), (1L, 1L, 0L, 4L), (3L, 1L, 0L, 5L)),
      s"got $sharded")
    // token conservation: per-doc slice sums equal the doc token counts
    val sums = TrainingData.packSequences(docs, budget = 3, nShards = 2)
      .groupBy("doc_id").agg(sum("n_tok_in_seq").as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sums == Map(1L -> 4L, 2L -> 8L, 3L -> 5L), s"got $sums")
  }

  test("piiScrub redacts emails, IPs, long digit runs — and only those") {
    val df = Seq(
      ("mail me at a.user+x@some-host.org now", "mail me at <EMAIL> now"),
      ("server 10.0.255.3 port 80", "server <IP> port 80"),
      ("id 1234567890 short 12345", "id <NUM> short 12345"), // <6 digits kept
      ("x@y.z at 1.2.3.4 ref 99999999", "x@y.z at <IP> ref <NUM>"), // 1-char TLD kept
      ("plain words stay untouched", "plain words stay untouched")
    ).toDF("raw", "expect")
    val out = df.select(TrainingData.piiScrub($"raw").as("got"), $"expect").collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1),
      s"got '${r.getString(0)}', want '${r.getString(1)}'"))
  }

  test("stratifiedSample keeps exact per-stratum slices and validates rates") {
    val df = (0L until 200L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val kept = TrainingData.stratifiedSample(df, "lang", col("doc_id"), Map("en" -> 40))
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // en docs are the even ids: those with id % 100 < 40 → 40 of 100
    assert(kept("en") == 40L && kept("de") == 100L)
    intercept[IllegalArgumentException] {
      TrainingData.stratifiedSample(df, "lang", col("doc_id"), Map("en" -> 101))
    }
  }

  test("shuffleDeterministic: stable permutation, contiguous per-shard ranks") {
    val docs = (0L until 300L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val a = TrainingData.shuffleDeterministic(docs, "seedA", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // permutation: every doc exactly once, shard within range
    assert(a.length == 300 && a.map(_._1).toSet.size == 300)
    assert(a.forall(t => t._2 >= 0 && t._2 < 8))
    // per-shard positions are contiguous 1..count
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // deterministic: identical on re-run; different under another seed
    val a2 = TrainingData.shuffleDeterministic(docs, "seedA", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.sortBy(_._1).toSeq == a2.sortBy(_._1).toSeq)
    val b = TrainingData.shuffleDeterministic(docs, "seedB", nShards = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(a.sortBy(_._1).toSeq != b.sortBy(_._1).toSeq)
    // order is not the input order (it IS a shuffle)
    val shard0 = a.filter(_._2 == a.head._2).sortBy(_._3).map(_._1)
    assert(shard0.toSeq != shard0.sorted.toSeq)
    intercept[IllegalArgumentException] {
      TrainingData.shuffleDeterministic(docs, "s", nShards = 257)
    }
  }

  test("domainCap enforces cap + blocklist deterministically") {
    val docs = (0L until 120L).map(i => (i, s"dom${i % 4}")).toDF("doc_id", "source")
    val kept = TrainingData.domainCap(docs, "source", cap = 10,
      blocklist = Seq("dom3"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(kept.length == 30, "3 surviving domains x cap 10")
    assert(!kept.exists(_._2 == "dom3"))
    kept.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to 10L).toSeq)
    }
    // stable survivor set on re-run
    val again = TrainingData.domainCap(docs, "source", cap = 10,
      blocklist = Seq("dom3")).collect().map(_.getLong(0)).toSet
    assert(again == kept.map(_._1).toSet)
    // domains under the cap keep everything
    val loose = TrainingData.domainCap(docs, "source", cap = 1000)
    assert(loose.count() == 120)
  }

  test("removeDupSpans keeps one copy of each duplicated region") {
    // identical pair: the later doc empties, the earlier survives intact
    val pair = Seq((1L, "abcdefgh"), (2L, "abcdefgh")).toDF("doc_id", "text")
    val gotPair = TrainingData.removeDupSpans(pair, spanLen = 4, hashed = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    assert(gotPair.toSeq == Seq((1L, 8L, 0L, "abcdefgh"), (2L, 8L, 8L, "")))
    // intra-doc repeat: second occurrence cut, unique middle kept
    val intra = Seq((1L, "abcdWXYZabcd")).toDF("doc_id", "text")
    val gotIntra = TrainingData.removeDupSpans(intra, spanLen = 4, hashed = false)
      .collect().map(r => (r.getLong(2), r.getString(3))).head
    assert(gotIntra == (4L, "abcdWXYZ"))
    // overlapping self-similar run collapses to exactly one span copy
    val run = Seq((1L, "aaaaaa")).toDF("doc_id", "text")
    val gotRun = TrainingData.removeDupSpans(run, spanLen = 4, hashed = false)
      .collect().map(_.getString(3)).head
    assert(gotRun == "aaaa")
    // hashed mode ≡ string mode; minCount above the multiplicity keeps all;
    // short and null docs pass through untouched
    val mixed = Seq((1L, "abcdefgh"), (2L, "abcdefgh"), (3L, "xy"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val viaHash = TrainingData.removeDupSpans(mixed, 4, hashed = true)
      .collect().map(r => (r.getLong(0), r.getString(3))).sortBy(_._1)
    val viaStr = TrainingData.removeDupSpans(mixed, 4, hashed = false)
      .collect().map(r => (r.getLong(0), r.getString(3))).sortBy(_._1)
    assert(viaHash.toSeq == viaStr.toSeq)
    assert(viaHash.toSeq == Seq((1L, "abcdefgh"), (2L, ""), (3L, "xy"), (4L, "")))
    val loose = TrainingData.removeDupSpans(mixed, 4, minCount = 3, hashed = false)
    assert(loose.agg(sum("n_removed")).head().getLong(0) == 0L)
  }

  test("null domains and ids survive the new operators consistently") {
    // domainCap: null domains form their own capped group and must NOT be
    // dropped just because a blocklist exists (bare !isin is NULL there)
    val docs = Seq((1L, "a"), (2L, "a"), (3L, null.asInstanceOf[String]),
      (4L, null.asInstanceOf[String]), (5L, "bad")).toDF("doc_id", "source")
    val kept = TrainingData.domainCap(docs, "source", cap = 1,
      blocklist = Seq("bad")).collect().map(r => (r.getLong(0), r.get(1)))
    assert(kept.length == 2, s"one per group incl. the null domain: ${kept.toSeq}")
    assert(kept.count(_._2 == null) == 1)
    assert(!kept.exists(_._2 == "bad"))
    // shuffleDeterministic: a null id still gets a real shard and pos
    val withNull = Seq((Some(1L), "x"), (None, "y"), (Some(3L), "z"))
      .toDF("doc_id", "text")
    val out = TrainingData.shuffleDeterministic(withNull, "s", 4).collect()
    assert(out.length == 3 && out.forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
    // removeDupSpans: null-id docs bypass the index — uncut, and their
    // windows don't count as occurrences for other docs
    val anon = Seq((Some(1L), "abcdefgh"), (None, "abcdefgh"))
      .toDF("doc_id", "text")
    val cleaned = TrainingData.removeDupSpans(anon, 4, hashed = false)
      .collect().map(r => (r.isNullAt(0), r.getString(3)))
    assert(cleaned.toSet == Set((false, "abcdefgh"), (true, "abcdefgh")),
      s"no pair counted across the null id: ${cleaned.toSeq}")
  }

  test("temperatureMix: quotas follow n^(1/T), fill deterministic") {
    // domains 64/16/4 docs; T=2 -> weights 8/4/2, shares 8/14, 4/14, 2/14
    val docs = ((0 until 64).map(i => (i.toLong, "a")) ++
      (100 until 116).map(i => (i.toLong, "b")) ++
      (200 until 204).map(i => (i.toLong, "c"))).toDF("doc_id", "source")
    val out = TrainingData.temperatureMix(docs, "source", total = 14,
      temperature = 2.0).collect()
    val byDom = out.groupBy(_.getAs[String]("source")).view.mapValues(_.length)
    assert(byDom.toMap == Map("a" -> 8, "b" -> 4, "c" -> 2),
      s"sqrt-scaled quotas: ${byDom.toMap}")
    // deterministic under re-run and domain-local rank is dense from 1
    val again = TrainingData.temperatureMix(docs, "source", total = 14,
      temperature = 2.0).collect()
    assert(out.map(_.getAs[Long]("doc_id")).sorted.toSeq ==
      again.map(_.getAs[Long]("doc_id")).sorted.toSeq)
    out.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("domain_rank")).sorted.toSeq ==
        (1L to rows.length).toSeq)
    }
    // T -> infinity flattens toward uniform: c's share grows
    val flat = TrainingData.temperatureMix(docs, "source", total = 12,
      temperature = 100.0).collect()
    val flatByDom = flat.groupBy(_.getAs[String]("source")).view
      .mapValues(_.length).toMap
    assert(flatByDom("c") >= 3, s"high T approaches uniform: $flatByDom")
  }

  test("validateChat: rule order, edge shapes, length accounting") {
    def run(js: String): (Int, Long, Long, Boolean, String) = {
      val r = TrainingData.validateChat(
        Seq((1L, js)).toDF("doc_id", "messages")).collect()(0)
      (r.getInt(1), r.getLong(2), r.getLong(3), r.getBoolean(4), r.getString(5))
    }
    // canonical valid example
    assert(run("""[{"role":"user","content":"hi"},
      {"role":"assistant","content":"hello"}]""") == (2, 2L, 5L, true, "ok"))
    // malformed JSON / non-array
    assert(run("""not json""")._5 == "parse")
    // single turn
    assert(run("""[{"role":"user","content":"hi"}]""")._5 == "short")
    // system must be followed by user
    assert(run("""[{"role":"system","content":"s"},
      {"role":"assistant","content":"a"}]""")._5 == "start")
    // unknown role mid-conversation fails alternation
    assert(run("""[{"role":"user","content":"u"},
      {"role":"tool","content":"t"},{"role":"assistant","content":"a"}]""")._5
      == "alternate")
    // null content counts as empty
    assert(run("""[{"role":"user","content":"u"},
      {"role":"assistant"}]""")._5 == "empty")
    // trailing user
    assert(run("""[{"role":"user","content":"u"},
      {"role":"assistant","content":"a"},{"role":"user","content":"u2"}]""")
      ._5 == "end")
    // system content not counted in either per-role sum
    val sys = run("""[{"role":"system","content":"syssys"},
      {"role":"user","content":"abc"},{"role":"assistant","content":"de"}]""")
    assert(sys == (3, 3L, 2L, true, "ok"), sys)
  }

  test("chatToTraining: role-tagged text, exact assistant mask spans") {
    val js = """[{"role":"system","content":"be brief"},
      {"role":"user","content":"hi"},
      {"role":"assistant","content":"hello there"},
      {"role":"user","content":"more"},
      {"role":"assistant","content":"ok"}]"""
    val r = TrainingData.chatToTraining(
      Seq((1L, js)).toDF("doc_id", "messages")).collect()(0)
    val text = r.getString(1)
    assert(text ==
      "<|system|>be brief<|user|>hi<|assistant|>hello there<|user|>more<|assistant|>ok")
    val spans = r.getSeq[org.apache.spark.sql.Row](2)
      .map(s => (s.getInt(0), s.getInt(1)))
    // spans must slice exactly the assistant contents out of the text
    assert(spans.map { case (s, e) => text.substring(s, e) } ==
      Seq("hello there", "ok"), spans)
    assert(r.getInt(3) == 2 && r.getLong(4) == 13L)
    // unparseable input: null text, empty spans
    val bad = TrainingData.chatToTraining(
      Seq((2L, "nope")).toDF("doc_id", "messages")).collect()(0)
    assert(bad.isNullAt(1) && bad.getInt(3) == 0 && bad.getLong(4) == 0L)
  }

  test("corpusDiff classifies added/removed/changed/same") {
    val oldDf = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newDf = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val m = TrainingData.corpusDiff(oldDf, newDf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "removed", 2L -> "same", 3L -> "changed",
      4L -> "added"), m)
  }

  test("dsirWeights ranks target-like docs above off-target docs") {
    // target speaks {alpha beta gamma}; raw mixes target-like docs with
    // docs from a disjoint vocabulary — the importance weight must rank
    // every target-like doc above every off-target doc
    val target = (0 until 20).map(i =>
      (100L + i, s"alpha beta gamma alpha beta")).toDF("doc_id", "text")
    val raw = ((0 until 5).map(i => (i.toLong, "alpha beta gamma beta")) ++
      (5 until 10).map(i => (i.toLong, "delta epsilon zeta delta epsilon")))
      .toDF("doc_id", "text")
    val w = TrainingData.dsirWeights(raw, target)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.size == 10)
    val likeMin = (0 until 5).map(i => w(i.toLong)).min
    val offMax = (5 until 10).map(i => w(i.toLong)).max
    assert(likeMin > offMax,
      s"target-like docs must outscore off-target: $likeMin <= $offMax ($w)")
    // zero-token doc scores 0 with 0 features
    val z = TrainingData.dsirWeights(
        Seq((1L, "")).toDF("doc_id", "text"), target)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(z.toSeq == Seq((1L, 0L, 0.0)), s"empty doc: ${z.toSeq}")
  }

  test("dsirSelect: top-k deterministic; gumbel reproducible, weight-biased") {
    val target = (0 until 10).map(i =>
      (200L + i, "alpha beta gamma")).toDF("doc_id", "text")
    val raw = ((0 until 6).map(i => (i.toLong, "alpha beta gamma")) ++
      (6 until 30).map(i => (i.toLong, "delta epsilon zeta")))
      .toDF("doc_id", "text")
    val top = TrainingData.dsirSelect(raw, target, k = 6)
      .collect().map(_.getLong(0)).toSet
    assert(top == (0 until 6).map(_.toLong).toSet, s"plain top-k: $top")
    val g1 = TrainingData.dsirSelect(raw, target, k = 10,
      gumbelSeed = Some("s1")).collect().map(_.getLong(0)).toSeq
    val g2 = TrainingData.dsirSelect(raw, target, k = 10,
      gumbelSeed = Some("s1")).collect().map(_.getLong(0)).toSeq
    assert(g1 == g2, "hash-gumbel must be reproducible across runs")
    // the 6 high-weight docs dominate a k=10 gumbel draw
    assert(g1.count(_ < 6L) >= 5, s"gumbel draw should favor weight: $g1")
  }

  test("corpusReport: one-row card with exact counts and percentiles") {
    val docs = Seq(
      (1L, "a b c", "en", "web"),        // 3 tokens
      (2L, "a b c", "en", "web"),        // exact dup of 1
      (3L, "d e f g h", "fr", "web"),    // 5 tokens
      (4L, "i j k l m n o", "en", "wiki")// 7 tokens
    ).toDF("doc_id", "text", "lang", "source")
    val r = TrainingData.corpusReport(docs).collect().head
    assert(r.getAs[Long]("n_docs") == 4 && r.getAs[Long]("n_tokens") == 18)
    assert(r.getAs[Long]("n_langs") == 2 && r.getAs[Long]("n_domains") == 2)
    assert(r.getAs[Long]("n_unique_texts") == 3)
    // tokens sorted: 3,3,5,7 → median (3+5)/2 = 4.0, p90 interpolated
    assert(r.getAs[Double]("median_tokens") == 4.0)
    assert(r.getAs[String]("top_domain") == "web" &&
      r.getAs[Long]("top_domain_docs") == 3)
    assert(r.getAs[Double]("dup_doc_rate6") == 0.25)
    // tie on domain counts breaks to the lexicographically greatest name
    val tied = TrainingData.corpusReport(docs.limit(2)
      .union(docs.filter(col("doc_id") === 4L))
      .union(Seq((5L, "x y", "en", "wiki")).toDF("doc_id", "text", "lang", "source")))
      .collect().head
    assert(tied.getAs[String]("top_domain") == "wiki")
  }

  test("temperatureMixTokens: token quotas ∝ tok^(1/T), greedy fill exact") {
    // domain A: 100 docs x 10 tokens (1000 tok); B: 10 docs x 10 (100 tok)
    val docs = ((0 until 100).map(i => (i.toLong, "A", 10L)) ++
      (100 until 110).map(i => (i.toLong, "B", 10L)))
      .toDF("doc_id", "source", "tokens")
    val out = TrainingData.temperatureMixTokens(docs, "source",
      totalTokens = 400L, temperature = 2.0).collect()
    // quotas: w_A = sqrt(1000), w_B = sqrt(100) -> A 302, B 95 tokens
    val wA = math.sqrt(1000.0); val wB = math.sqrt(100.0)
    val qA = math.floor(400.0 * wA / (wA + wB)).toLong
    val qB = math.floor(400.0 * wB / (wA + wB)).toLong
    val byDom = out.groupBy(_.getAs[String]("source"))
    assert(byDom("A").forall(_.getAs[Long]("quota") == qA))
    assert(byDom("B").forall(_.getAs[Long]("quota") == qB))
    // greedy 10-token fills: exactly floor(quota/10) docs per domain
    assert(byDom("A").length == qA / 10, s"A got ${byDom("A").length}")
    assert(byDom("B").length == qB / 10, s"B got ${byDom("B").length}")
    assert(byDom("A").map(_.getAs[Long]("cum_tokens")).max <= qA)
    // deterministic under re-run
    val again = TrainingData.temperatureMixTokens(docs, "source",
      totalTokens = 400L, temperature = 2.0)
      .collect().map(_.getAs[Long]("doc_id")).sorted
    assert(again.toSeq == out.map(_.getAs[Long]("doc_id")).sorted.toSeq)
  }

  test("tokenBudgetSelect matches the brute-force greedy prefix") {
    // deterministic pseudo-random frame with heavy score ties so the
    // boundary regularly lands mid-tie (id tie-break must decide)
    val rows = (0 until 500).map { i =>
      val score = ((i * 7919) % 13).toDouble
      val tokens = 1L + (i * 104729) % 9
      (i.toLong, score, tokens)
    }
    val df = rows.toDF("doc_id", "score", "tokens")
    // brute force: sort best-first, walk the prefix
    def greedy(budget: Long): Set[Long] = {
      var acc = 0L
      rows.sortBy { case (id, s, _) => (-s, id) }.iterator
        .takeWhile { case (_, _, t) => { acc += t; acc <= budget } }
        .map(_._1).toSet
    }
    for (budget <- Seq(0L, 1L, 137L, 1000L, 2499L, 100000L)) {
      val got = TrainingData.tokenBudgetSelect(df, budget, "score",
        "tokens", nBuckets = 8, sampleSize = 100)
        .collect().map(_.getLong(0)).toSet
      assert(got == greedy(budget), s"budget=$budget")
    }
    // a budget past the total keeps everything; zero keeps nothing
    assert(TrainingData.tokenBudgetSelect(df, 100000L, "score", "tokens",
      nBuckets = 8).count() == 500)
    assert(TrainingData.tokenBudgetSelect(df, 0L, "score", "tokens",
      nBuckets = 8).count() == 0)
    // output carries the caller's column names and exact values
    val out = TrainingData.tokenBudgetSelect(df, 137L, "score", "tokens",
      nBuckets = 8).collect()
    val byId = rows.map(r => r._1 -> r).toMap
    out.foreach { r =>
      val (_, s, t) = byId(r.getLong(0))
      assert(r.getDouble(1) == s && r.getLong(2) == t)
    }
    // null-score/token rows are excluded, never a driver crash
    val withNulls = df.unionByName(Seq(
      (9001L, Option.empty[Double], Option(5L)),
      (9002L, Option(3.0), Option.empty[Long]))
      .toDF("doc_id", "score", "tokens"))
    val sel = TrainingData.tokenBudgetSelect(withNulls, 137L, "score",
      "tokens", nBuckets = 8).collect().map(_.getLong(0)).toSet
    assert(!sel.contains(9001L) && !sel.contains(9002L))
    assert(sel == TrainingData.tokenBudgetSelect(df, 137L, "score",
      "tokens", nBuckets = 8).collect().map(_.getLong(0)).toSet)
  }

  test("weightedSample: deterministic, weight-biased, excludes w <= 0") {
    val df = (1L to 400L).map(i =>
      (i, if (i <= 20) 1000.0 else 1.0)).toDF("doc_id", "weight")
    val a = TrainingData.weightedSample(df, "weight", 50, "s1")
      .collect().map(_.getLong(0)).toSet
    val b = TrainingData.weightedSample(df, "weight", 50, "s1")
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "same seed must reproduce the same sample")
    val c = TrainingData.weightedSample(df, "weight", 50, "s2")
      .collect().map(_.getLong(0)).toSet
    assert(a != c, "a different seed must move the sample")
    // the 20 heavy docs (1000x weight) are essentially always all in
    assert((1L to 20L).count(a) >= 18, s"heavy docs under-sampled: $a")
    // without replacement: size is exactly n, no repeats by construction
    assert(a.size == 50)
    // non-positive / null weights are excluded even at n >= count
    val bad = Seq((1L, 2.0), (2L, 0.0), (3L, -1.0))
      .toDF("doc_id", "weight")
      .unionByName(Seq((4L, Option.empty[Double])).toDF("doc_id", "weight"))
    val kept = TrainingData.weightedSample(bad, "weight", 10, "s")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
    // a seed containing a single quote must not break expression parsing
    val q = TrainingData.weightedSample(df, "weight", 5, "o'brien's seed")
      .collect().map(_.getLong(0)).toSet
    assert(q.size == 5)
  }

  test("groupReport: per-group counts, interpolated quantiles, dup rate") {
    // group (web, en): token counts {1,2,3,4,4} -> p50 = 3 exact; one
    // exact dup pair -> dup rate 1 - 4/5 = 0.2
    val df = Seq(
      (1L, "a", "en", "web"), (2L, "a b", "en", "web"),
      (3L, "a b c", "en", "web"), (4L, "a b c d", "en", "web"),
      (5L, "a b c d", "en", "web"),
      (6L, "x y", "de", "web")).toDF("doc_id", "text", "lang", "source")
    val rows = TrainingData.groupReport(df).orderBy("domain", "lang")
      .collect()
    assert(rows.length == 2)
    val en = rows.find(_.getString(1) == "en").get
    assert(en.getLong(2) == 5 && en.getLong(3) == 14) // n_docs, n_tokens
    assert(en.getLong(4) == 4) // unique texts (two "a b c d")
    assert(en.getDouble(6) == 3.0) // p50 of {1,2,3,4,4}
    assert(en.getLong(9) == 1 && en.getLong(10) == 4) // min/max tokens
    assert(en.getDouble(11) == 0.2) // dup rate
    val de = rows.find(_.getString(1) == "de").get
    assert(de.getLong(2) == 1 && de.getDouble(6) == 2.0)
  }

  test("collocations: PMI separates a planted unit from chance pairs") {
    // "new york" always adjacent (5×); "of the" co-occurs but both words
    // are everywhere; singleton docs contribute unigrams, no bigrams
    val docs = Seq(
      (1L, "new york of the new york"),
      (2L, "the of new york of the"),
      (3L, "new york of the off"),
      (4L, "of the new york the of"),
      (5L, "solo")
    ).toDF("doc_id", "text")
    val out = TrainingData.collocations(docs, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    val ny = out(("new", "york"))
    val ofThe = out(("of", "the"))
    // hand-check "new york": n_ab=5, n_new=5, n_york=5, T=24, B=19
    assert(ny._1 == 5L)
    val expected = math.log((5.0 / 19) / ((5.0 / 24) * (5.0 / 24)))
    assert(math.abs(ny._2 - (math.rint(expected * 1e6) / 1e6)) < 1e-9,
      s"${ny._2} vs $expected")
    assert(ny._2 > ofThe._2, s"planted unit must outscore chance: $out")
    // below minCount drops
    assert(!out.contains(("the", "off")) && !out.contains(("york", "of"))
      || out(("york", "of"))._1 >= 2)
  }

  test("collocations: tokenization folds case and runs of whitespace") {
    val docs = Seq((1L, "  New   YORK new york  ")).toDF("doc_id", "text")
    val out = TrainingData.collocations(docs, minCount = 2).collect()
    assert(out.length == 1 && out.head.getString(0) == "new" &&
      out.head.getString(1) == "york" && out.head.getLong(2) == 2L)
  }
}
