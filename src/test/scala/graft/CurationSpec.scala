package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Sessions}

/** Tests for the corpus-curation family ([[graft.operators.Curation]])
  * and the keyed event-sequence ops ([[graft.operators.Sessions]]) on
  * hand-countable synthetic inputs — the battery queries cover the
  * fixture-scale oracle parity; these pin the SEMANTICS (what counts as
  * contamination, which spans get redacted, where a session breaks).
  */
class CurationSpec extends SparkSpecBase {

  import spark.implicits._

  // ----------------------------------------------------- decontamination

  /** doc 0 = benchmark; doc 1 copies 8 of its words verbatim; doc 2 is
    * disjoint. */
  private def contaminatedCorpus = Seq(
    (0L, "a b c d e f g h i j"),
    (1L, "x a b c d e f g h y"),
    (2L, "p q r s t u v w k m")
  ).toDF("doc_id", "text")

  test("contaminationHits flags exactly the doc sharing a verbatim 8-gram") {
    val hits = Curation
      .contaminationHits(contaminatedCorpus, col("doc_id") === 0L)
      .collect()
    assert(hits.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 1L)))
  }

  test("decontaminate keeps the clean doc and drops benchmark + contaminated") {
    val clean = Curation
      .decontaminate(contaminatedCorpus, col("doc_id") === 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(clean === Set(2L))
  }

  test("decontaminateFuzzy at a loosened threshold scrubs the reworded doc exact misses") {
    // benchmark = 64 tokens w0..w63; doc 1 rewords every 8th token, so
    // its longest verbatim run is 7 tokens — NO shared 8-gram, exact
    // decontamination keeps it — while its 3-shingle Jaccard vs the
    // benchmark is ≈ 0.45: the paraphrase shape. doc 2 is disjoint.
    val bench = (0 until 64).map(i => s"w$i").mkString(" ")
    val reworded = (0 until 64)
      .map(i => if (i % 8 == 7) s"CHANGED$i" else s"w$i").mkString(" ")
    val corpus = Seq(
      (0L, bench), (1L, reworded), (2L, "p q r s t u v w k m " * 4)
    ).toDF("doc_id", "text")
    val exactClean = Curation.decontaminate(corpus, col("doc_id") === 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(exactClean === Set(1L, 2L)) // verbatim scrub misses the paraphrase
    val fuzzyClean = Curation
      .decontaminateFuzzy(corpus, col("doc_id") === 0L, thresholdMilli = 400)
      .select("doc_id").as[Long].collect().toSet
    assert(fuzzyClean === Set(2L)) // the loosened-Jaccard dial catches it
    // at the strict default the paraphrase is below the bar — the dial
    // is the operator's contract, not a hidden constant
    val strictClean = Curation
      .decontaminateFuzzy(corpus, col("doc_id") === 0L)
      .select("doc_id").as[Long].collect().toSet
    assert(strictClean === Set(1L, 2L))
  }

  test("contamination gram count is DISTINCT shared grams, not occurrences") {
    // doc 1 contains the benchmark 3-gram "a b c" TWICE → still 1 shared gram
    val docs = Seq(
      (0L, "a b c"),
      (1L, "a b c z a b c")
    ).toDF("doc_id", "text")
    val hits = Curation
      .contaminationHits(docs, col("doc_id") === 0L, n = 3)
      .collect()
    assert(hits.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 1L)))
  }

  // -------------------------------------------- bloom-filter membership

  test("contaminationBloom flags a superset of the exact operator, no false negatives") {
    val bloom = Curation
      .contaminationBloom(contaminatedCorpus, col("doc_id") === 0L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    // doc 1: 3 distinct 8-grams, exactly one shared with the benchmark;
    // at 2^20 bits / 3 training grams a false positive is ~impossible,
    // so the bloom verdicts EQUAL the exact ones here — and the
    // no-false-negative direction is structural (all k true-member
    // probes were set by the build pass by construction)
    assert(bloom(1L) === ((3L, 1L, true)))
    assert(bloom(2L) === ((3L, 0L, false)))
    assert(!bloom.contains(0L)) // benchmark side is not scored
  }

  test("bloomBuild is idempotent under duplicate items: no pre-dedup shuffle needed") {
    val once = Seq("g one", "g two").toDF("s")
    val dup = Seq("g one", "g one", "g two", "g one").toDF("s")
    def words(df: org.apache.spark.sql.DataFrame) =
      Curation.bloomBuild(df, "s").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(words(once) === words(dup))
  }

  test("bloomMightContain: members always hit; a saturated filter flags everything") {
    val ref = Seq("alpha", "beta").toDF("s")
    val probeSet = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "s")
    val bloom = Curation.bloomBuild(ref, "s")
    val got = Curation.bloomMightContain(probeSet, bloom, "s", Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got(1L) && got(2L)) // structural: no false negatives
    assert(!got(3L))           // fp at m = 2^20, n = 2 is ~0
    // the saturation failure mode bloomBitsFor exists to prevent: an
    // undersized filter (32 bits, 5 probes, 2 items) goes dense enough
    // that even the non-member usually hits — all rows flagged members
    val tiny = Curation.bloomBuild(ref, "s", mBits = 32L, k = 5)
    val sat = Curation.bloomMightContain(probeSet, tiny, "s", Seq("id"),
      mBits = 32L, k = 5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(sat(1L) && sat(2L)) // members still never miss
  }

  test("bloomBitsFor sizes with the reference set; bloomHashesFor with the density") {
    assert(Curation.bloomBitsFor(1L) === 32L)       // rounds up to whole words
    assert(Curation.bloomBitsFor(1000L, 16) === 16000L)
    // doubling the reference set doubles the filter: load factor fixed
    assert(Curation.bloomBitsFor(2000L, 16) === 2 * Curation.bloomBitsFor(1000L, 16))
    assert(Curation.bloomHashesFor(16) === 11)      // round(16·ln2)
    assert(Curation.bloomHashesFor(1) === 1)
  }

  // ----------------------------------------------------- PII scrubbing

  test("scrubPii redacts emails, IPv4s and phone-likes and counts on the original") {
    val df = Seq(
      (0L, "mail bob.smith@example.com and carol@dept.example.org here"),
      (1L, "from 10.2.0.1 to 192.168.1.255 end"),
      (2L, "call 555-0199 or 555-0100"),
      (3L, "clean text only")
    ).toDF("doc_id", "text")
    val out = Curation.scrubPii(df)
      .select("doc_id", "text", "n_emails", "n_ips", "n_phones")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(0L) === (("mail <EMAIL> and <EMAIL> here", 2L, 0L, 0L)))
    assert(out(1L) === (("from <IP> to <IP> end", 0L, 2L, 0L)))
    assert(out(2L) === (("call <PHONE> or <PHONE>", 0L, 0L, 2L)))
    assert(out(3L) === (("clean text only", 0L, 0L, 0L)))
  }

  test("scrubPii does not mistake a phone for an IP or scrub plain words") {
    val out = Curation.scrubPii(Seq((0L, "v1.2.3 x 555-0100 y 1.2.3.4"))
        .toDF("doc_id", "text"))
      .select("text").as[String].head()
    // v1.2.3 survives (word boundary + only 3 groups); both PII forms go
    assert(out === "v1.2.3 x <PHONE> y <IP>")
  }

  // ----------------------------------------------------- repetition stats

  test("repetitionStats computes exact fixed-point fractions") {
    // 6 tokens, 2 distinct → dup = (4*1000) div 6 = 666
    // bigrams: "a a","a b","b a","a b","b b" → top "a b" ×2 of 5 → 400
    val out = Curation.repetitionStats(Seq((0L, "a a b a b b")).toDF("doc_id", "text"))
      .collect().head
    assert(out.getAs[Long]("n_tokens") === 6L)
    assert(out.getAs[Long]("n_distinct_tokens") === 2L)
    assert(out.getAs[Long]("dup_token_frac_milli") === 666L)
    assert(out.getAs[Long]("n_bigrams") === 5L)
    assert(out.getAs[Long]("top_bigram_count") === 2L)
    assert(out.getAs[Long]("top_bigram_frac_milli") === 400L)
  }

  test("repetitionStats flags the pathological doc, not the varied one") {
    val out = Curation.repetitionStats(Seq(
        (0L, "spam spam spam spam spam spam spam spam spam spam"),
        (1L, "one two three four five six seven eight nine ten")
      ).toDF("doc_id", "text"))
      .select("doc_id", "flagged")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(0L) === true) // dup_frac = 900, top bigram 9/9
    assert(out(1L) === false) // dup_frac = 0, top bigram 1/9 = 111
  }

  test("repetitionStats drops docs with fewer than 2 tokens") {
    val n = Curation.repetitionStats(Seq((0L, "solo"), (1L, ""), (2L, "a b"))
        .toDF("doc_id", "text"))
      .count()
    assert(n === 1L)
  }

  // ----------------------------------------------------- stratified sampling

  test("sampleStratified is deterministic, rate-respecting, and drops unlisted strata") {
    val docs = (0L until 4000L).map(i => (i, if (i % 2 == 0) "en" else "xx"))
      .toDF("doc_id", "lang")
    val rates = Seq("en" -> 250)
    val s1 = Curation.sampleStratified(docs, rates).select("doc_id").as[Long].collect().toSet
    val s2 = Curation.sampleStratified(docs, rates).select("doc_id").as[Long].collect().toSet
    assert(s1 === s2, "hash sampling must be reproducible")
    assert(s1.forall(_ % 2 == 0), "unlisted stratum must be dropped")
    // 2000 en docs at 250‰ → ~500; the multiplicative hash is uniform
    // enough that ±40 % bounds hold with huge margin
    assert(s1.size > 300 && s1.size < 700, s"rate off: ${s1.size} of 2000 at 250permille")
  }

  test("sampleStratified is a subset-stable monotone of the rate dial") {
    val docs = (0L until 2000L).map((_, "en")).toDF("doc_id", "lang")
    val lo = Curation.sampleStratified(docs, Seq("en" -> 100))
      .select("doc_id").as[Long].collect().toSet
    val hi = Curation.sampleStratified(docs, Seq("en" -> 300))
      .select("doc_id").as[Long].collect().toSet
    assert(lo.subsetOf(hi), "raising the rate must only ADD rows (bucket < rate)")
  }

  test("hashBucket stays in-range and overflow-safe at 100 TB-scale ids") {
    val big = Seq(Long.MaxValue - 1, 4000000000L, 0L).toDF("id")
    val buckets = big.select(Curation.hashBucket(col("id")).as("b"))
      .as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b < 1000))
  }

  // ----------------------------------------------------- mixture by budget

  /** Scala model of the operator's hash order. */
  private def hashOrderOf(id: Long): Long =
    ((id % 2147483647L) * Curation.HashMul) % 4294967296L

  private def mixtureModel(
      rows: Seq[(Long, String, Long)],
      budgetOf: String => Long): Set[Long] =
    rows.groupBy(_._2).flatMap { case (src, docs) =>
      val ordered = docs.sortBy(d => (hashOrderOf(d._1), d._1))
      val cum = ordered.scanLeft(0L)(_ + _._3).tail
      ordered.zip(cum).collect { case ((id, _, _), c) if c <= budgetOf(src) => id }
    }.toSet

  test("mixtureByBudget keeps the per-stratum hash-order prefix within budget") {
    val rows = (1L to 30L).map(i => (i, if (i % 2 == 0) "a" else "b", i % 7 + 1))
    val df = rows.toDF("doc_id", "source", "n_tokens")
    val budgets = Seq("a" -> 20L)
    val got = Curation.mixtureByBudget(df, budgets, defaultBudget = 15L)
      .select("doc_id").as[Long].collect().toSet
    val model = mixtureModel(rows, src => if (src == "a") 20L else 15L)
    assert(model.nonEmpty && model.size < rows.size) // budget genuinely bites
    assert(got === model)
  }

  test("mixtureByBudget selection is invariant under the buckets execution dial") {
    val rows = (1L to 50L).map(i => (i, s"s${i % 3}", i % 5 + 2))
    val df = rows.toDF("doc_id", "source", "n_tokens")
    def run(b: Int) = Curation.mixtureByBudget(df, Nil, defaultBudget = 30L, buckets = b)
      .select("doc_id").as[Long].collect().toSet
    val one = run(1) // degenerate: a single bucket = the plain window form
    assert(one === run(7) && one === run(64) && one === run(100000))
    assert(one === mixtureModel(rows, _ => 30L))
  }

  test("packByBudget fills packs to the budget in hash order; invariant to buckets") {
    val rows = (1L to 30L).map(i => (i, if (i % 2 == 0) "a" else "b", i % 7 + 1))
    val df = rows.toDF("doc_id", "source", "v")
    def run(b: Int) = Curation.packByBudget(df, budgetTokens = 20L,
        weightCol = "v", buckets = b)
      .select("doc_id", "pack_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = run(64)
    assert(got === run(1) && got === run(1000))
    // model: per-source hash-order cumsum, pack = (cum-1) div 20
    val model = rows.groupBy(_._2).flatMap { case (_, docs) =>
      val ordered = docs.sortBy(d => (hashOrderOf(d._1), d._1))
      val cum = ordered.scanLeft(0L)(_ + _._3).tail
      ordered.zip(cum).map { case ((id, _, _), c) => id -> (c - 1) / 20L }
    }
    assert(got === model)
    // packs genuinely fill: every source uses more than one pack
    assert(got.values.toSet.size > 1)
  }

  test("mixtureByBudget: zero budget drops a stratum; oversized budget keeps all") {
    val rows = Seq((1L, "x", 5L), (2L, "x", 5L), (3L, "y", 5L))
    val df = rows.toDF("doc_id", "source", "n_tokens")
    val got = Curation.mixtureByBudget(df, Seq("x" -> 0L), defaultBudget = 1000L)
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(3L))
  }

  // ----------------------------------------------------- CDC merge

  test("Cdc.upsert applies updates, inserts and deletes; update nulls overwrite") {
    val base = Seq((1L, Some("a"), 10L), (2L, Some("b"), 20L), (3L, Some("c"), 30L))
      .toDF("id", "s", "v")
    val changes = Seq(
      (2L, None: Option[String], 99L, false), // update: NULL s must be WRITTEN
      (4L, Some("d"), 40L, false),            // insert
      (3L, Some("c"), 30L, true))             // tombstone
      .toDF("id", "s", "v", "is_delete")
    val got = graft.operators.Cdc.upsert(base, changes, Seq("id"), Some("is_delete"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2))).toSet
    assert(got === Set((1L, Some("a"), 10L), (2L, None, 99L), (4L, Some("d"), 40L)))
  }

  // ----------------------------------------------------- markup cleaning

  test("cleanMarkup strips tags, unescapes entities once, collapses whitespace") {
    val docs = Seq(
      (1L, "<p>a<br/>b</p>  c\t<a href=\"x\">d</a>"),
      (2L, "&amp;lt; stays, &lt;b&gt; decodes, &quot;q&quot;"),
      (3L, "plain")
    ).toDF("doc_id", "text")
    val got = Curation.cleanMarkup(docs)
      .select("doc_id", "n_tags", "clean_text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // tags → spaces (words never fuse), whitespace collapsed
    assert(got(1L) === ((5L, "a b c d")))
    // &amp;lt; decodes ONCE to &lt; (amp last), real entities decode
    assert(got(2L) === ((0L, "&lt; stays, <b> decodes, \"q\"")))
    assert(got(3L) === ((0L, "plain")))
  }

  // ----------------------------------------------------- rank buckets

  test("rankBuckets assigns balanced rank quartiles with deterministic ties") {
    // stratum x: 8 rows, six tied at 100 — value cutoffs would collapse;
    // rank + id tie-break gives exactly 2 per quartile
    val rows = (1L to 8L).map(i => (i, "x", if (i <= 6) 100L else 200L)) :+ ((9L, "y", 5L))
    val got = Curation.rankBuckets(rows.toDF("doc_id", "lang", "v"), "v", "lang")
      .select("doc_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L,
      5L -> 2L, 6L -> 2L, 7L -> 3L, 8L -> 3L, 9L -> 0L))
  }

  test("rankBuckets ranks null values first, deterministically") {
    val rows = Seq((1L, "x", Some(10L)), (2L, "x", None), (3L, "x", Some(5L)),
      (4L, "x", None))
    val got = Curation.rankBuckets(rows.toDF("doc_id", "lang", "v"), "v", "lang",
        buckets = 4)
      .select("doc_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // null-first rank order: 2, 4, 3, 5 → buckets 0..3
    assert(got === Map(2L -> 0L, 4L -> 1L, 3L -> 2L, 1L -> 3L))
  }

  test("null-edge behavior: interval join drops null-ts points; rolling sums skip null values") {
    val pts = Seq((1L, Some(ts(5))), (2L, None)).toDF("pid", "ts")
    val ivs = Seq((10L, ts(0), ts(10))).toDF("iid", "t_start", "t_end")
    val joined = Sessions.intervalJoin(pts, ivs, "ts", "t_start", "t_end", 60000000L)
      .select("pid").as[Long].collect().toSeq
    assert(joined === Seq(1L)) // the null-ts point matches nothing

    val ev = Seq((1L, ts(0), 1L, Some(5L)), (1L, ts(1), 2L, None))
      .toDF("user_id", "ts", "event_id", "v")
    val out = Sessions.rollingAggs(ev, Seq("user_id"), "ts", 10L * 60 * 1000000,
        Seq("n" -> count(lit(1)), "s" -> sum(col("v"))))
      .select("event_id", "n", "s")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(2L) === ((2L, 5L))) // row counted, null value skipped by sum
  }

  // ----------------------------------------------------- sessionization

  private def ts(min: Long) = new java.sql.Timestamp(min * 60000L)

  test("sessionize breaks sessions at the gap and numbers them per user") {
    val events = Seq(
      (1L, ts(0), 10L), (1L, ts(5), 11L), (1L, ts(900), 12L), // user 1: 2 sessions (gap 895 min > 720)
      (2L, ts(0), 20L) // user 2: 1 session
    ).toDF("user_id", "ts", "event_id")
    val out = Sessions.sessionize(events)
      .select("user_id", "event_id", "session_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((1L, 10L)) === 1L)
    assert(out((1L, 11L)) === 1L)
    assert(out((1L, 12L)) === 2L)
    assert(out((2L, 20L)) === 1L)
  }

  test("sessionStats rolls up bounds and counts per session") {
    val events = Seq(
      (1L, ts(0), 1L), (1L, ts(10), 2L), (1L, ts(2000), 3L)
    ).toDF("user_id", "ts", "event_id")
    val out = Sessions.sessionStats(events)
      .select("user_id", "session_seq", "n_events", "t_start", "t_end")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getTimestamp(3), r.getTimestamp(4)))).toMap
    assert(out((1L, 1L)) === ((2L, ts(0), ts(10))))
    assert(out((1L, 2L)) === ((1L, ts(2000), ts(2000))))
  }

  test("sessionize tie-breaks equal timestamps by the tie column") {
    val events = Seq((1L, ts(0), 2L), (1L, ts(0), 1L)).toDF("user_id", "ts", "event_id")
    // both in one session either way; determinism shows in new-session flag
    val out = Sessions.sessionize(events).select("session_seq").as[Long].collect()
    assert(out.sorted.toSeq === Seq(1L, 1L))
  }

  test("funnel: per-anchor backward attribution with the chain property") {
    // tolerance 10 min; user 1 exercises every outcome class:
    //   purchase@10 ← click@5 ← view@2        full funnel
    //   purchase@100 ← click@99, view@2 is 97 min before the click —
    //     outside tolerance                    click-attributed only
    //   purchase@200: latest click@99 is 101 min before — unattributed
    //     (and by the CHAIN property the view hop must not fire even
    //     though view@199 is within 10 min of the purchase itself)
    // user 2: a purchase with no clicks at all  anchor only
    val events = Seq(
      (1L, ts(2), "view", 1L), (1L, ts(5), "click", 2L),
      (1L, ts(10), "purchase", 3L),
      (1L, ts(99), "click", 4L), (1L, ts(100), "purchase", 5L),
      (1L, ts(199), "view", 6L), (1L, ts(200), "purchase", 7L),
      (2L, ts(50), "purchase", 8L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val out = Sessions.funnel(events, Seq("view", "click", "purchase"),
        toleranceMicros = 10L * 60 * 1000000)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === ((3L, 2L, 1L)), "n_purchase, n_click, n_view for user 1")
    assert(out(2L) === ((1L, 0L, 0L)))
    // stage counts are monotone non-increasing along the chain
    out.values.foreach { case (p, c, v) => assert(p >= c && c >= v) }
    // 2-stage form and same-ts anchor duplicates both count
    val dup = Seq(
      (9L, ts(0), "click", 10L),
      (9L, ts(1), "purchase", 11L), (9L, ts(1), "purchase", 12L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val two = Sessions.funnel(dup, Seq("click", "purchase"),
        toleranceMicros = 10L * 60 * 1000000)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(two(9L) === ((2L, 2L)))
    intercept[IllegalArgumentException] {
      Sessions.funnel(dup, Seq("purchase"), 1L)
    }
    intercept[IllegalArgumentException] {
      Sessions.funnel(dup, Seq("click", "click"), 1L)
    }
  }

  test("property: funnel == driver-side brute force on a random event stream") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // random 3-type event soup over a handful of users and a small
    // time range — dense enough that every hop outcome (full chain,
    // tolerance cut, missing stage, same-ts collisions) occurs; seed
    // fixed so a failure replays
    val gen = Gen.listOfN(300, for {
      u <- Gen.chooseNum(1L, 6L)
      t <- Gen.chooseNum(0L, 120L)
      ty <- Gen.oneOf("view", "click", "purchase")
    } yield (u, t, ty))
    val raw = gen(Gen.Parameters.default, Seed(1212L)).get
      .zipWithIndex.map { case ((u, t, ty), i) => (u, t, ty, i.toLong) }
    val tolMin = 7L
    // brute force: per purchase, latest click at-or-before within tol
    // (ties collapse per (user, ts) to max event id — the operator's
    // documented dedup); then latest view at-or-before THAT click
    def latest(u: Long, ty: String, atOrBefore: Long): Option[Long] =
      raw.filter(e => e._1 == u && e._3 == ty && e._2 <= atOrBefore &&
          atOrBefore - e._2 <= tolMin)
        .map(_._2).maxOption
    val want = raw.filter(_._3 == "purchase").map { case (u, t, _, _) =>
      val click = latest(u, "click", t)
      val view = click.flatMap(ct => latest(u, "view", ct))
      (u, click.isDefined, view.isDefined)
    }.groupBy(_._1).map { case (u, hits) =>
      u -> ((hits.size.toLong, hits.count(_._2).toLong, hits.count(_._3).toLong))
    }
    val events = raw.map { case (u, t, ty, i) => (u, ts(t), ty, i) }
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = Sessions.funnel(events, Seq("view", "click", "purchase"),
        toleranceMicros = tolMin * 60 * 1000000)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === want)
    // regime check: the fixture actually exercised partial chains
    val (p, c, v) = want.values.foldLeft((0L, 0L, 0L)) {
      case ((a, b, d), (x, y, z)) => (a + x, b + y, d + z) }
    assert(p > c && c > v && v > 0,
      s"degenerate fixture: p=$p c=$c v=$v — expected strict attrition")
  }

  test("rollingAggs frames [ts - horizon, ts] inclusive; ts peers share a frame") {
    val events = Seq(
      (1L, ts(0), 1L, 10L), (1L, ts(10), 2L, 20L),  // 10 min apart — in range
      (1L, ts(10), 3L, 5L),                         // ts PEER of event 2
      (1L, ts(100), 4L, 1L),                        // alone: 100-10 > 10 min
      (2L, ts(0), 5L, 7L)
    ).toDF("user_id", "ts", "event_id", "v")
    val out = Sessions.rollingAggs(events, Seq("user_id"), "ts",
        horizonMicros = 10L * 60 * 1000000,
        aggs = Seq("n" -> count(lit(1)), "s" -> sum(col("v"))))
      .select("event_id", "n", "s")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((1L, 10L)))
    // inclusive lower bound: ts(0) is exactly horizon back from ts(10)
    assert(out(2L) === ((3L, 35L)))
    // RANGE (not ROWS): the peer sees the same frame, order-independent
    assert(out(3L) === ((3L, 35L)))
    assert(out(4L) === ((1L, 1L)))
    assert(out(5L) === ((1L, 7L)))
  }

  // ----------------------------------------------------- top-k per key

  test("topKPerKey keeps exactly k best rows per key with deterministic ties") {
    val df = Seq(
      (1L, 100L, 5.0), (1L, 101L, 5.0), (1L, 102L, 9.0), (1L, 103L, 1.0),
      (2L, 200L, 2.0)
    ).toDF("user_id", "event_id", "value")
    val out = Sessions.topKPerKey(df, 2, Seq("user_id"),
        Seq(col("value").desc, col("event_id")))
      .select("user_id", "event_id", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // user 1: 9.0 first, then the 5.0 TIE broken by event_id → 100 over 101
    assert(out === Set((1L, 102L, 1L), (1L, 100L, 2L), (2L, 200L, 1L)))
  }

  // ----------------------------------------------------- interval join

  test("intervalJoin pairs points with every containing interval, bounds inclusive") {
    val points = Seq((1L, ts(0)), (2L, ts(10)), (3L, ts(25)), (4L, ts(99)))
      .toDF("pid", "ts")
    val intervals = Seq(
      (100L, ts(0), ts(10)),   // catches 1 (start bound) and 2 (end bound)
      (200L, ts(5), ts(30)))   // catches 2 and 3 — overlaps the first
      .toDF("iid", "t_start", "t_end")
    def run(binMicros: Long) =
      Sessions.intervalJoin(points, intervals, "ts", "t_start", "t_end", binMicros)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Set((1L, 100L), (2L, 100L), (2L, 200L), (3L, 200L))
    // the bin width is an execution dial: sub-interval and
    // super-interval bins agree (no dup, no loss)
    assert(run(60L * 1000000) === expected)
    assert(run(3600L * 1000000) === expected)
  }

  test("intervalJoin at 1-microsecond bins still dedups (one bin per point)") {
    // microsecond-scale fixture so even the degenerate finest bin
    // explodes to only ~10 bins per interval
    def us(n: Long) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(0, n * 1000))
    val points = Seq((1L, us(5)), (2L, us(11))).toDF("pid", "ts")
    val intervals = Seq((100L, us(0), us(10)), (200L, us(5), us(12)))
      .toDF("iid", "t_start", "t_end")
    val got = Sessions.intervalJoin(points, intervals, "ts", "t_start", "t_end", 1L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 100L), (1L, 200L), (2L, 200L)))
  }

  test("intervalJoin keys restrict matches to the same key") {
    val points = Seq((1L, "a", ts(5)), (2L, "b", ts(5))).toDF("pid", "k", "ts")
    val intervals = Seq(("a", 10L, ts(0), ts(10))).toDF("k", "iid", "t_start", "t_end")
    val got = Sessions.intervalJoin(points, intervals, "ts", "t_start", "t_end",
        binMicros = 60L * 1000000, keys = Seq("k"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L)))
  }

  // ----------------------------------------------------- as-of join

  private def asofFixture = (
    Seq((1L, ts(100), 10L), (1L, ts(5), 11L), (2L, ts(100), 20L))
      .toDF("user_id", "ts", "pid"),
    Seq((1L, ts(5), 7L, "a"), (1L, ts(50), 8L, "b"), (1L, ts(200), 9L, "c"))
      .toDF("user_id", "ts", "rid", "tag"))

  test("asofJoin picks the latest right row at-or-before each left ts") {
    val (l, r) = asofFixture
    val got = Sessions.asofJoin(l, r, Seq("user_id"), "ts", Seq("rid", "tag"))
      .collect()
      .map(x => x.getLong(2) ->
        ((Option(x.get(3)).map(_.asInstanceOf[Long]), Option(x.getString(4)))))
      .toMap
    // pid 10 (t=100): rid 8 (t=50) — NOT the later rid 9; the two
    // payload columns come from the same row (struct-packed)
    assert(got(10L) === ((Some(8L), Some("b"))))
    // pid 11 (t=5): equal timestamp matches (inclusive >= convention)
    assert(got(11L) === ((Some(7L), Some("a"))))
    // user 2 has no clicks at all → null payload
    assert(got(20L) === ((None, None)))
  }

  test("asofJoin never matches NULL keys to each other") {
    val l = Seq((Some(1L), ts(100), 10L), (None: Option[Long], ts(100), 11L))
      .toDF("user_id", "ts", "pid")
    val r = Seq((Some(1L), ts(5), 7L), (None: Option[Long], ts(5), 8L))
      .toDF("user_id", "ts", "rid")
    val got = Sessions.asofJoin(l, r, Seq("user_id"), "ts", Seq("rid"))
      .collect()
      .map(x => x.getLong(2) -> Option(x.get(3)).map(_.asInstanceOf[Long])).toMap
    // SQL equality semantics: the null-key left row stays UNMATCHED
    assert(got === Map(10L -> Some(7L), 11L -> None))
  }

  test("asofJoin forward picks the earliest right row at-or-after; horizon bounds ahead") {
    val (l, r) = asofFixture
    val got = Sessions.asofJoin(l, r, Seq("user_id"), "ts", Seq("rid"),
        forward = true)
      .collect()
      .map(x => x.getLong(2) -> Option(x.get(3)).map(_.asInstanceOf[Long])).toMap
    // pid 10 (t=100): next click is rid 9 (t=200) — NOT the earlier 8
    // pid 11 (t=5): equal timestamp still matches (inclusive)
    // pid 20 (user 2): no clicks → unmatched
    assert(got === Map(10L -> Some(9L), 11L -> Some(7L), 20L -> None))
    // horizon: rid 9 is 100 s AHEAD → voided at a 10 s forward horizon
    val bounded = Sessions.asofJoin(l, r, Seq("user_id"), "ts", Seq("rid"),
        toleranceMicros = Some(10L * 1000000), forward = true)
      .collect()
      .map(x => x.getLong(2) -> Option(x.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(bounded === Map(10L -> None, 11L -> Some(7L), 20L -> None))
  }

  test("asofJoin tolerance voids matches older than the horizon") {
    val (l, r) = asofFixture
    val got = Sessions.asofJoin(l, r, Seq("user_id"), "ts", Seq("rid"),
        toleranceMicros = Some(10L * 1000000))
      .collect()
      .map(x => x.getLong(2) -> Option(x.get(3)).map(_.asInstanceOf[Long]))
      .toMap
    // pid 10 (t=100): nearest click is 50 s old > 10 s horizon → voided
    assert(got === Map(10L -> None, 11L -> Some(7L), 20L -> None))
  }

  test("resampleLocf materializes gaps and carries the last sum forward") {
    import spark.implicits._
    // key A: slots 10 (v=3+4), 13 (v=5); key B: single slot 2 (v=9).
    // slot = unix_micros div 1e6 with 1-second slots below.
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val events = Seq(
      ("A", ts(10), 3L), ("A", ts(10), 4L), ("A", ts(13), 5L),
      ("B", ts(2), 9L))
      .toDF("k", "ts", "v")
    val got = Sessions
      .resampleLocf(events, "k", "ts", col("v"), slotMicros = 1000000L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got === Map(
      ("A", 10L) -> (2L, 7L, false),
      ("A", 11L) -> (0L, 7L, true),   // gap, LOCF from slot 10
      ("A", 12L) -> (0L, 7L, true),
      ("A", 13L) -> (1L, 5L, false),
      ("B", 2L) -> (1L, 9L, false)))
  }

  test("zscoreOutliers flags the extreme point; constant keys emit nothing") {
    import spark.implicits._
    // X: nine 10s and one 100 → the 100 is far out; Y: constant → den=0
    val rows = (1L to 9L).map(i => (i, "X", 10L)) ++
      Seq((10L, "X", 100L)) ++ (11L to 14L).map(i => (i, "Y", 7L))
    val got = Sessions.zscoreOutliers(
        rows.toDF("event_id", "k", "v"), "k", "v", Seq("event_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap

    // sequential model of the same doubles
    val xs = rows.filter(_._2 == "X").map(_._3.toDouble)
    val (n, s, q) = (xs.size.toDouble, xs.sum, xs.map(x => x * x).sum)
    val expected = rows.filter(_._2 == "X").flatMap { case (id, _, v) =>
      val num = (n * v - s) * (n * v - s)
      val den = n * q - s * s
      if (num * 1e6 > den * Sessions.DefaultZThreshMilli * Sessions.DefaultZThreshMilli)
        Some(id -> math.round(num * 1e6 / den))
      else None
    }.toMap
    assert(got === expected)
    assert(got.contains(10L) && !got.keySet.exists(_ > 10L))
  }

  test("scd2 compresses runs null-safely and stamps validity intervals") {
    import spark.implicits._
    def t(min: Long) = new java.sql.Timestamp(min * 60000L)
    val log = Seq(
      (1L, t(0), Option(10.0), 1L),   // run A
      (1L, t(1), Option(10.0), 2L),   // same value → compressed away
      (1L, t(2), Option(20.0), 3L),   // run B
      (1L, t(3), None, 4L),           // value→null IS a transition
      (1L, t(4), None, 5L),           // null→null is not
      (2L, t(0), Option(7.0), 6L)     // second key, single current run
    ).toDF("user_id", "ts", "value", "event_id")
    val got = graft.operators.Cdc.scd2(log, Seq("user_id"), "ts",
        payload = Seq("value"), tieBreak = Seq("event_id"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1)) ->
        ((Option(r.get(2)), Option(r.getTimestamp(3)), r.getBoolean(4)))).toMap
    assert(got === Map(
      (1L, t(0)) -> ((Some(10.0), Some(t(2)), false)),
      (1L, t(2)) -> ((Some(20.0), Some(t(3)), false)),
      (1L, t(3)) -> ((None, None, true)),
      (2L, t(0)) -> ((Some(7.0), None, true))))
  }

  test("scd2 orders equal timestamps by the tie-break column") {
    import spark.implicits._
    def t(min: Long) = new java.sql.Timestamp(min * 60000L)
    // two changes at the same instant: seq 1 → 5.0, seq 2 → 6.0
    val log = Seq((1L, t(0), 5.0, 1L), (1L, t(0), 6.0, 2L))
      .toDF("user_id", "ts", "value", "event_id")
    val got = graft.operators.Cdc.scd2(log, Seq("user_id"), "ts",
        payload = Seq("value"), tieBreak = Seq("event_id"))
      .collect().map(r => r.getDouble(2) -> r.getBoolean(4)).toMap
    // 6.0 (higher seq) is the current row
    assert(got === Map(5.0 -> false, 6.0 -> true))
  }

  test("retention cohorts by first-event week with exact fixed-point shares") {
    import spark.implicits._
    // 1970-01-01 is a Thursday; week starts Monday 1969-12-29
    def day(d: Long) = new java.sql.Timestamp(d * 86400000L)
    val events = Seq(
      (1L, day(0)), (1L, day(1)),   // user 1: week 0 twice
      (1L, day(7)),                 // …and again the following week
      (2L, day(0)),                 // user 2: week 0 only
      (3L, day(7))                  // user 3: first touch in week 1
    ).toDF("user_id", "ts")
    val got = graft.operators.Sessions.retention(events).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      ("1969-12-29", 0L) -> ((2L, 2L, 10000L)),   // both cohort-0 users active
      ("1969-12-29", 1L) -> ((1L, 2L, 5000L)),    // user 1 returns next week
      ("1970-01-05", 0L) -> ((1L, 1L, 10000L))))  // user 3's own cohort
  }

  test("madOutliers flags by exact nearest-rank median/MAD; degenerate keys silent") {
    import spark.implicits._
    // X: 1..9 + 100 → med = 5 (rank (10+1)÷2 = 5), devs sorted
    // 0,1,1,2,2,3,3,4,4,95 → MAD = 2 → flag iff dev·1000 > 3000·2 ⇒ dev > 6
    val rows = (1L to 9L).map(i => (i, "X", i)) ++ Seq((10L, "X", 100L)) ++
      // Y: six identical + one odd → MAD = 0 → emits nothing
      (11L to 16L).map(i => (i, "Y", 7L)) ++ Seq((17L, "Y", 999L))
    val got = Sessions.madOutliers(rows.toDF("event_id", "k", "v"),
        keyCol = "k", valueCol = "v", idCols = Seq("event_id"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === Map(10L -> ((100L, 5L, 95L, 2L))))
  }

  test("winsorize clamps into the exact nearest-rank band and flags clips") {
    import spark.implicits._
    // key X: values 1..100 → p05 target rank 5 (lo=5), p95 rank 95 (hi=95)
    // key Y: 3 rows → lo rank max(1, (15+99)//100)=1, hi rank (285+99)//100=3
    val rows = (1L to 100L).map(i => (i, "X", i)) ++
      Seq((201L, "Y", 10L), (202L, "Y", 20L), (203L, "Y", 30L))
    val got = Sessions.winsorize(rows.toDF("event_id", "k", "v"),
        keyCol = "k", valueCol = "v", idCols = Seq("event_id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    for (i <- 1L to 4L) assert(got(i) === ((5L, true)), s"low tail $i")
    for (i <- 96L to 100L) assert(got(i) === ((95L, true)), s"high tail $i")
    for (i <- 5L to 95L) assert(got(i) === ((i, false)), s"band interior $i")
    // tiny key: band = [min, max], nothing clips
    assert(got(201L) === ((10L, false)))
    assert(got(203L) === ((30L, false)))
  }

  test("isqrt is exact on boundaries, perfect squares, and huge values") {
    import spark.implicits._
    val ns = Seq(0L, 1L, 2L, 3L, 4L, 8L, 9L, 15L, 16L, 24L, 25L,
      999999L, 1000000L, (1L << 31) - 1, 1L << 52, (1L << 52) + 1,
      3037000499L * 3037000499L, // largest int64 perfect square
      Long.MaxValue)
    val got = ns.toDF("n").select(col("n"), Curation.isqrt(col("n")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (n <- ns) {
      val s = BigInt(got(n))
      assert(s * s <= BigInt(n) && (s + 1) * (s + 1) > BigInt(n),
        s"isqrt($n) = $s is not exact")
    }
  }

  test("isqrt is exact on 500 random longs across all magnitudes") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    // spread across bit-widths so small and near-2^63 values both hit
    val ns = Seq.fill(500) {
      val bits = 1 + rnd.nextInt(63)
      (rnd.nextLong().abs >>> (63 - bits)).max(0L)
    }.distinct
    val got = ns.toDF("n").select(col("n"), Curation.isqrt(col("n")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (n <- ns) {
      val s = BigInt(got(n))
      assert(s * s <= BigInt(n) && (s + 1) * (s + 1) > BigInt(n),
        s"isqrt($n) = $s is not exact")
    }
  }

  test("temperatureMix flattens toward the small stratum with exact hash membership") {
    import spark.implicits._
    // counts 100 vs 400 → isqrt 10 vs 20 → rates 1000‰ and 500‰
    val rows = (0L until 100L).map(i => (i, "small")) ++
      (1000L until 1400L).map(i => (i, "big"))
    val got = Curation.temperatureMix(rows.toDF("doc_id", "source"))
      .select("doc_id", "source", "rate_x1000").collect()
    val rates = got.map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(rates === Map("small" -> 1000L, "big" -> 500L))
    // exact membership: the shared multiplicative-hash permille decision
    val keptIds = got.map(_.getLong(0)).toSet
    val model = rows.collect {
      case (id, src) if hashOrderOf(id) % 1000 <
        (if (src == "small") 1000L else 500L) => id
    }.toSet
    assert(keptIds === model)
    // every small-stratum doc survives; the big stratum genuinely thins
    assert((0L until 100L).forall(keptIds), "smallest stratum must keep all")
    val bigKept = keptIds.count(_ >= 1000L)
    assert(bigKept > 100 && bigKept < 300, s"big stratum kept $bigKept of 400")
  }

  test("distributionDrift: identical mixes score 0, a moved mix scores high") {
    import spark.implicits._
    // A: 4×x + 4×y; B: 4×x + 4×y → chi2 = 0 everywhere
    val same = ((1L to 8L).map(i => (i, "x")) ++ (9L to 16L).map(i => (i, "y")))
      .toDF("id", "cat")
    val s = Curation.distributionDrift(same, col("cat"), col("id") % 2 === 1)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(s === Map("x" -> 0L, "y" -> 0L))

    // A = 6×x + 2×y, B = 2×x + 6×y: per-category cross-multiplied term
    // (6·8−2·8)² / (8·8·8) = 1024/512 = 2 → 2,000,000 at ×1e6
    val moved = (
      (1L to 6L).map(i => (i * 2, "x")) ++ Seq((101L, "x"), (103L, "x")) ++
      Seq((200L, "y"), (202L, "y")) ++ (1L to 6L).map(i => (i * 2 + 1, "y")))
      .toDF("id", "cat")
    val m = Curation.distributionDrift(moved, col("cat"), col("id") % 2 === 1)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(m === Map(
      "x" -> ((6L, 2L, 2000000L)),
      "y" -> ((2L, 6L, 2000000L))))
  }

  test("dsirWeights ranks target-vocabulary docs above raw-only docs") {
    import spark.implicits._
    // Target stratum speaks t-words; the raw remainder speaks r-words.
    // A doc written in target vocabulary must carry a higher importance
    // weight (and clear the w >= 1 selection bar) than one written in
    // raw-only vocabulary (which must be negative: its buckets are
    // deflated under the target model by smoothing).
    val corpus = (
      (1L to 4L).map(i => (i, "t1 t2 t3", true)) ++
      (5L to 8L).map(i => (i, "r1 r2 r3", false)) :+
      ((9L, "   ", false))) // token-less: zeros, never selected
      .toDF("doc_id", "text", "tgt")
    val got = Curation.dsirWeights(corpus, col("tgt"))
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet === (1L to 9L).toSet) // every doc covered
    val (_, _, avgT, selT) = got(1L)
    val (_, _, avgR, selR) = got(5L)
    assert(avgT > avgR)
    assert(selT === 1L && selR === 0L)
    assert(avgR < 0L) // raw-only vocabulary scores anti-target
    assert(got(9L) === ((0L, 0L, 0L, 0L)))
    // identical docs score identically (the model is corpus-global)
    assert(got(1L) === got(2L) && got(5L) === got(6L))
  }

  // ----------------------------------------------------- weighted sampling

  test("sampleWeighted keeps the k smallest integer priorities, stable under repartition") {
    val rows = (1L to 200L).map(i => (i, i % 7 + 1)) // weights 1..7
    val df = rows.toDF("doc_id", "w")
    val hashMul = Curation.HashMul
    def prio(id: Long, w: Long) = ((id % 2147483647L) * hashMul % 4294967296L) / math.max(w, 1L)
    val expect = rows.map { case (i, w) => (prio(i, w), i) }.sorted.take(25).map(_._2).toSet
    val got = Curation.sampleWeighted(df, k = 25, idCol = "doc_id", weightCol = "w")
      .select("doc_id").as[Long].collect().toSet
    assert(got === expect)
    // partitioning must not change the selection
    val got17 = Curation.sampleWeighted(df.repartition(17), 25, "doc_id", "w")
      .select("doc_id").as[Long].collect().toSet
    assert(got17 === got)
  }

  test("sampleWeighted clamps non-positive weights instead of dividing by zero") {
    val df = Seq((1L, 0L), (2L, 5L), (3L, 0L)).toDF("doc_id", "w")
    // all rows remain selectable; k = all rows returns all rows
    val got = Curation.sampleWeighted(df, k = 3, idCol = "doc_id", weightCol = "w")
      .select("doc_id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 3L))
  }

  // ----------------------------------------------------- snapshot diff

  test("snapshotDiff classifies added/removed/changed and names moved columns") {
    val before = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
      .toDF("id", "s", "v")
    val after = Seq(
      (1L, "a", 10L), // unchanged → absent from the diff
      (2L, "B", 21L), // both payload columns moved
      (4L, "d", 41L), // one column moved; id 3 removed
      (5L, "e", 50L)) // added
      .toDF("id", "s", "v")
    val got = graft.operators.Cdc.snapshotDiff(before, after, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(
      (2L, "changed", "s,v"), (3L, "removed", ""),
      (4L, "changed", "v"), (5L, "added", "")))
  }

  test("snapshotDiff is empty on identical snapshots and null-safe on payload") {
    val a = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("id", "s")
    assert(graft.operators.Cdc.snapshotDiff(a, a, Seq("id")).count() === 0L)
    val b = Seq((1L, Some("y")), (2L, Option.empty[String])).toDF("id", "s")
    val got = graft.operators.Cdc.snapshotDiff(a, b, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    // null→value and value→null are both real changes
    assert(got === Set((1L, "changed", "s"), (2L, "changed", "s")))
  }

  test("snapshotDiff tolerates column order and rejects reserved output names") {
    val before = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "s", "v")
    // same column SET, different declaration order — the same table
    // version, realigned internally rather than rejected
    val after = Seq((10L, 1L, "a2"), (20L, 2L, "b")).toDF("v", "id", "s")
    val got = graft.operators.Cdc.snapshotDiff(before, after, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set((1L, "changed", "s")))
    val reserved = Seq((1L, "x")).toDF("id", "change")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Cdc.snapshotDiff(reserved, reserved, Seq("id"))
    }
    assert(e.getMessage.contains("reserved"))
  }

  // ----------------------------------------------------- transitions

  test("coverageSample keeps top-perCell per cell by (score desc, id), inner-joined") {
    import spark.implicits._
    val scored = Seq(
      (1L, 900L), (2L, 950L), (3L, 950L), (4L, 100L), // cell 10
      (5L, 500L), // cell 20 singleton
      (9L, 999L) // no cell assignment -> dropped by the inner join
    ).toDF("doc_id", "score_milli")
    val cells = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L), (5L, 20L))
      .toDF("vec_id", "cell")
    val got = Curation.coverageSample(scored, cells, perCell = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // cell 10: 950-tie broken by id (2 before 3); cell 20: singleton at rank 1
    assert(got === Set(
      (2L, 10L, 950L, 1L), (3L, 10L, 950L, 2L), (5L, 20L, 500L, 1L)))
    intercept[IllegalArgumentException] {
      Curation.coverageSample(scored, cells, perCell = 0)
    }
  }

  test("domainCap keeps top-k per domain by (score desc, id); merge == one-shot") {
    import spark.implicits._
    import graft.operators.{Curation, TextAnalysis}
    // crafted scores: "good" text (stopword-rich) beats digit/punct
    // noise; ids tie-break. Three domains, uneven sizes.
    def doc(id: Long, dom: String, good: Boolean) =
      (id, dom, if (good) "the cat and the dog are on the mat with the hat"
        else "x9$ 77## @@q 123 456 789 000 %%% !!! ???")
    val t1 = Seq(doc(1, "a", true), doc(2, "a", false), doc(3, "a", true),
      doc(4, "b", false), doc(5, "b", false))
    val t2 = Seq(doc(6, "a", true), doc(7, "b", true), doc(8, "c", false))
    val t3 = Seq(doc(9, "c", true), doc(10, "a", false))
    def df(xs: Seq[(Long, String, String)]) = xs.toDF("doc_id", "source", "text")
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val k = 2
    def oneShot(xs: Seq[(Long, String, String)]) =
      rows(Curation.domainCap(df(xs), k))
    def scored(xs: Seq[(Long, String, String)]) = TextAnalysis
      .quality(df(xs), carryCols = Seq("source"))
      .select(col("doc_id"), col("source"), col("score_milli"))
    val empty = Seq.empty[(Long, String, Long, Long)]
      .toDF("doc_id", "source", "score_milli", "domain_rank")
    val s1 = Curation.domainCapMerge(empty, scored(t1), k)
    assert(rows(s1) === oneShot(t1))
    // domain_rank is LongType on BOTH surfaces (batch topKPerKey cast,
    // merge output) — pinned explicitly so a drift on either side can
    // never reconcile silently through union type coercion
    assert(Curation.domainCap(df(t1), k).schema("domain_rank").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(s1.schema("domain_rank").dataType ===
      org.apache.spark.sql.types.LongType)
    val s2 = Curation.domainCapMerge(s1, scored(t2), k)
    assert(rows(s2) === oneShot(t1 ++ t2))
    val s3 = Curation.domainCapMerge(s2, scored(t3), k)
    assert(rows(s3) === oneShot(t1 ++ t2 ++ t3))
    // the cap actually bites: domain a has 5 docs, snapshot carries 2
    assert(rows(s3).count(_._2 == "a") === k)

    // NULL domains across tranches: the batch window groups nulls as
    // ONE partition, so the merge's touched test must be null-safe —
    // a plain equi-join would park prior null rows as "untouched"
    // forever while each tranche's nulls got a fresh rank 1..k (the
    // snapshot would grow by k per tranche). Nullable-domain rows and
    // a null-safe collect (getString -> Option).
    def rowsN(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2),
        r.getLong(3))).toSet
    val n1 = Seq((21L, null.asInstanceOf[String], "the cat and the dog are on the mat"),
      (22L, null.asInstanceOf[String], "x9$ 77## @@q 123 456"))
    val n2 = Seq((23L, null.asInstanceOf[String], "the cat and the dog are on the hat"),
      (24L, "a", "the dog and the cat are on the mat"))
    def dfN(xs: Seq[(Long, String, String)]) = xs.toDF("doc_id", "source", "text")
    def scoredN(xs: Seq[(Long, String, String)]) = TextAnalysis
      .quality(dfN(xs), carryCols = Seq("source"))
      .select(col("doc_id"), col("source"), col("score_milli"))
    val m1 = Curation.domainCapMerge(empty, scoredN(n1), k)
    val m2 = Curation.domainCapMerge(m1, scoredN(n2), k)
    assert(rowsN(m2) === rowsN(Curation.domainCap(dfN(n1 ++ n2), k)))
    assert(rowsN(m2).count(_._2.isEmpty) === k,
      "null domain must cap at k across tranches")
  }

  test("seam checkpoint: build-twice-act-on-FIRST survives (release is one generation deferred)") {
    // The r15 advice scenario: docs_training_set localCheckpoints its
    // curated seam; a same-key rebuild used to release the previous
    // build's blocks immediately, so acting on the FIRST returned
    // DataFrame after a second build threw an unrecoverable
    // "checkpoint block not found" far from the cause (a checkpointed
    // RDD cannot recompute after unpersist). Release is now deferred
    // one generation: the two newest builds stay live, the
    // grandparent is what gets released.
    val dir = "/root/testdata/sf0.001"
    val fn = SparkEntry.queries("docs_training_set")
    val first = fn(spark, dir)
    val second = fn(spark, dir) // re-checkpoints the same seam key
    val n1 = first.count()      // the pre-fix failure point
    assert(n1 > 0)
    assert(second.count() === n1)
    // a third build releases generation 1; the newest build still works
    assert(fn(spark, dir).count() === n1)
  }

  test("transitions counts adjacent pairs per user with exact permille shares") {
    // user 1: a→b→a→b ; user 2: b→b→c
    val events = Seq(
      (1L, ts(0), 1L, "a"), (1L, ts(1), 2L, "b"),
      (1L, ts(2), 3L, "a"), (1L, ts(3), 4L, "b"),
      (2L, ts(0), 5L, "b"), (2L, ts(1), 6L, "b"), (2L, ts(2), 7L, "c")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val got = Sessions.transitions(events)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // from a: a→b twice (1000‰); from b: one each of a/b/c (333‰ floor)
    assert(got === Map(
      ("a", "b") -> ((2L, 1000L)),
      ("b", "a") -> ((1L, 333L)),
      ("b", "b") -> ((1L, 333L)),
      ("b", "c") -> ((1L, 333L))))
  }
}
