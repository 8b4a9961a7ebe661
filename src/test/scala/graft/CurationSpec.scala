package graft

import org.apache.spark.sql.functions._

import graft.functions.AhoCorasick
import graft.operators.{Curation, Dedup}

/** Curation kernels: Aho–Corasick blocklist matching, Bloom-filter
  * decontamination (no-false-negatives containment vs the exact
  * guard), and the deflate compression-ratio signal.
  */
class CurationSpec extends SparkSuite {

  private lazy val docs = Tables(spark, sf("0.001")).documents

  test("AhoCorasick: overlapping, nested and repeated patterns") {
    val ac = new AhoCorasick(Seq("ab", "bc", "abc", "c", "zz"))
    // "abc" contains ab, bc, abc, c — but never zz
    assert(ac.matchedIds(
      org.apache.spark.unsafe.types.UTF8String.fromString("abc")).toSeq ==
      Seq(0, 1, 2, 3))
    // a pattern that is a suffix of another is found via fail links
    val ac2 = new AhoCorasick(Seq("window window", "dow win"))
    assert(ac2.matchedIds(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        "a window window b")).toSeq == Seq(0, 1))
    // no match → empty
    assert(ac.matchedIds(
      org.apache.spark.unsafe.types.UTF8String.fromString("xyx")).isEmpty)
    // multi-byte UTF-8 pattern matches byte-exactly
    val ac3 = new AhoCorasick(Seq("é«x"))
    assert(ac3.matchedIds(
      org.apache.spark.unsafe.types.UTF8String.fromString("ppé«xq")).toSeq ==
      Seq(0))
  }

  test("blocklistRedact: leftmost-longest single-pass replacement") {
    import org.apache.spark.unsafe.types.UTF8String
    val ac = new AhoCorasick(Seq("ab", "abc", "ca"))
    def red(s: String) = {
      val (r, n) = ac.redact(UTF8String.fromString(s),
        UTF8String.fromString("[X]"))
      (r.toString, n)
    }
    // longest pattern wins at a shared start; scan resumes after it
    assert(red("abcab") == ("[X][X]", 2))
    // overlap: leftmost occurrence wins, the overlapped "ca" is skipped
    assert(red("xabcay") == ("x[X]ay", 1))
    assert(red("zzz") == ("zzz", 0))
    // operator plumbing over a frame
    import spark.implicits._
    val out = Curation.blocklistRedact(
      Seq((1L, "keep abc here")).toDF("doc_id", "text"), Seq("abc"))
      .collect().head
    assert(out.getString(1) == "keep [BLOCKED] here" && out.getLong(2) == 1L)
  }

  test("blocklistRedact fuzz: matches a naive leftmost-longest scanner") {
    import org.apache.spark.unsafe.types.UTF8String
    val rnd = new scala.util.Random(7)
    val alphabet = "abc"
    def randStr(n: Int) =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    (0 until 300).foreach { _ =>
      val pats = (0 until 1 + rnd.nextInt(4)).map(_ => randStr(1 + rnd.nextInt(3)))
        .distinct
      val text = randStr(rnd.nextInt(24))
      val ac = new AhoCorasick(pats)
      val (got, nGot) = ac.redact(UTF8String.fromString(text),
        UTF8String.fromString("#"))
      // naive reference: at each position take the longest matching
      // pattern, else advance one char
      val sb = new StringBuilder
      var i = 0
      var n = 0
      while (i < text.length) {
        val hit = pats.filter(p => text.startsWith(p, i))
          .sortBy(-_.length).headOption
        hit match {
          case Some(p) => sb += '#'; i += p.length; n += 1
          case None => sb += text(i); i += 1
        }
      }
      assert(got.toString == sb.toString && nGot == n,
        s"pats=$pats text='$text' got='$got' want='$sb'")
    }
  }

  test("minHashLshPairsAcross: edited delivery pairs with its original") {
    import spark.implicits._
    val corpus = docs.select("doc_id", "text")
    val batch = corpus.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" v2")).as("text"))
    val pairs = Dedup.minHashLshPairsAcross(
      Dedup.minHashSignatures(corpus), Dedup.minHashSignatures(batch),
      minEstJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every edited doc must rediscover its own original at high estimate
    val selfPairs = pairs.filter { case (c, b, _) => b - 1000000L == c }
    assert(selfPairs.length == corpus.filter(col("doc_id") % 7 === 0).count())
    assert(selfPairs.forall(_._3 >= 0.8), selfPairs.take(5).toSeq)
  }

  test("curationFunnel: monotone funnel; survivors pass every guard") {
    val docs10 = Tables(spark, sf("0.01")).documents
    val benchmark = docs10.filter(pmod(col("doc_id"), lit(7)) === 0)
    val pats = Seq("window window", "vector join")
    val funnel = Curation.curationFunnel(docs10, benchmark, pats)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(funnel.map(_._1) ==
      Seq("blocklist", "quality", "exact_dedup", "near_dedup", "decontaminate"))
    // chained: each stage's input is the previous stage's output,
    // counts never increase, nothing lost unaccounted
    funnel.sliding(2).foreach { case Seq(a, b) => assert(a._3 == b._2) }
    funnel.foreach { case (_, in, out, dropped) =>
      assert(out <= in && dropped == in - out)
    }
    assert(funnel.count(_._4 > 0) >= 3, s"degenerate funnel: $funnel")
    // the surviving corpus passes every individual guard re-run
    val fin = Curation.finalSurvivors(docs10, benchmark, pats).persist()
    assert(Curation.blocklistMatches(fin, pats).count() == 0L)
    assert(Dedup.exactDupGroups(fin).count() == 0L)
    assert(Dedup.decontaminate(fin, benchmark).count() == fin.count())
    assert(fin.count() == funnel.last._3)
  }

  test("incrementalFunnel: two deliveries fold to the same survivors and " +
      "stage counts as a frozen-bounds full recompute") {
    import spark.implicits._
    def d(id: Long, text: String, nChars: Long = 60L) = (id, text, nChars)
    val pats = Seq("forbidden spell")
    val base = Seq(
      d(1, "the quick brown fox jumps over the lazy dog today"),
      d(2, "a curious cat walks along the narrow garden wall now"),
      d(3, "the quick brown fox jumps over the lazy dog today"), // exact dup of 1
      d(4, "a curious cat walks along the narrow garden fence now"), // near-dup of 2
      d(5, "many ships sail across the wide ocean under bright stars"),
      d(6, "old trees grow beside the quiet river and the green hill"),
      d(7, "children read wonderful books inside the warm village library"),
      d(8, "the baker sells fresh bread and sweet cakes every morning"),
      d(9, "this exact text sits in the held out benchmark set"),
      d(10, "he cast the forbidden spell and the tower fell down")
    ).toDF("doc_id", "text", "n_chars")
    val d1 = Seq(
      d(11, "the quick brown fox jumps over the lazy dog today"), // exact dup of survivor 1
      d(12, "a curious cat walks along the narrow garden gate now"), // near-dup of survivor 2
      d(13, "seven silver birds fly over the cold misty northern lake"),
      d(14, "xx yy", 2L), // frozen-bounds quality drop
      d(15, "another forbidden spell appears in this delivery text here")
    ).toDF("doc_id", "text", "n_chars")
    val d2 = Seq(
      d(16, "seven silver birds fly over the cold misty northern sea"), // near-dup of d1 survivor 13
      d(17, "seven silver birds fly over the cold misty northern lake"), // exact dup of 13
      d(18, "golden wheat fields stretch toward the far sunny horizon line"),
      d(19, "golden wheat fields stretch toward the far sunny horizon line") // in-delivery dup
    ).toDF("doc_id", "text", "n_chars")
    val benchmark = Seq(
      (900L, "this exact text sits in the held out benchmark set"))
      .toDF("doc_id", "text")

    val state0 = Curation.initialFunnelState(base, benchmark, pats)
    assert(state0.lenLo == 60.0 && state0.lenHi == 60.0)
    assert(state0.survivors.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 5L, 6L, 7L, 8L))
    val (state1, rep1) = Curation.incrementalFunnel(state0, d1, benchmark, pats)
    val (state2, rep2) = Curation.incrementalFunnel(state1, d2, benchmark, pats)
    def reportOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(reportOf(rep1) == Seq(
      ("blocklist", 5L, 4L, 1L), ("quality", 4L, 3L, 1L),
      ("exact_dedup", 3L, 2L, 1L), ("near_dedup", 2L, 1L, 1L),
      ("decontaminate", 1L, 1L, 0L)), reportOf(rep1))
    assert(reportOf(rep2) == Seq(
      ("blocklist", 4L, 4L, 0L), ("quality", 4L, 4L, 0L),
      ("exact_dedup", 4L, 2L, 2L), ("near_dedup", 2L, 1L, 1L),
      ("decontaminate", 1L, 1L, 0L)), reportOf(rep2))

    // the folded survivor corpus equals a full recompute over
    // base ∪ d1 ∪ d2 under the SAME frozen bounds
    val all = base.unionByName(d1).unionByName(d2)
    val f1 = all.join(Curation.blocklistMatches(all, pats).select("doc_id"),
      Seq("doc_id"), "left_anti")
    val f2 = f1.join(graft.operators.TextAnalysis.curationDecisions(f1,
        frozenBounds = Some((state0.lenLo, state0.lenHi)))
      .filter(col("keep")).select("doc_id"), Seq("doc_id"), "left_semi")
    val full = Dedup.decontaminate(
      Dedup.nearDeduplicate(Dedup.deduplicate(f2)), benchmark)
    val fullIds = full.collect().map(_.getLong(0)).sorted.toSeq
    val incIds = state2.survivors.collect().map(_.getLong(0)).sorted.toSeq
    assert(incIds == fullIds && incIds == Seq(1L, 2L, 5L, 6L, 7L, 8L, 13L, 18L),
      s"inc=$incIds full=$fullIds")
  }

  test("incrementalFunnel with SERVED survivor derivatives (digests, " +
      "postings, sizes) is byte-identical to the derived path") {
    import spark.implicits._
    def d(id: Long, text: String, n: Long = 60L) = (id, text, n)
    val pats = Seq("forbidden spell")
    val base = Seq(
      d(1, "seven silver birds fly over the cold misty northern sea"),
      d(2, "a quick brown fox jumps over the lazy dog near town"),
      d(3, "a quick brown fox jumps over the lazy dog near town"),
      d(4, "this exact text sits in the held out benchmark set")
    ).toDF("doc_id", "text", "n_chars")
    val delivery = Seq(
      d(11, "seven silver birds fly over the cold misty northern lake"),
      d(12, "completely novel delivery content with no twin anywhere here"),
      d(13, "a quick brown fox jumps over the lazy dog near town")
    ).toDF("doc_id", "text", "n_chars")
    val benchmark = Seq(
      (900L, "this exact text sits in the held out benchmark set"))
      .toDF("doc_id", "text")
    val st = Curation.initialFunnelState(base, benchmark, pats)
    val (_, repDerived) =
      Curation.incrementalFunnel(st, delivery, benchmark, pats)
    val served = st.copy(
      storedDigests = Some(st.survivors
        .select(xxhash64(col("text")).as("__d")).distinct()),
      storedPostings = Some(st.survivors.select(col("doc_id").as("sid"),
        explode(Dedup.shingles(Dedup.tokensOf(col("text")), 2)).as("gram"))),
      storedSizes = Some(st.survivors.select(col("doc_id").as("sid"),
        size(Dedup.shingles(Dedup.tokensOf(col("text")), 2))
          .cast("bigint").as("sng"))))
    val (_, repServed) =
      Curation.incrementalFunnel(served, delivery, benchmark, pats)
    assert(repServed.collect().map(_.toSeq).toSeq ==
      repDerived.collect().map(_.toSeq).toSeq)
  }

  test("incrementalNearDupKeepers: no survivors-derived frame under a " +
      "broadcast hint (the 100 TB driver-OOM guard)") {
    // the stored corpus may be SCANNED (semi-pruned probe side) but a
    // broadcast build over a survivors-derived frame collects
    // corpus-cardinality rows to the driver at exactly the scale the
    // incremental funnel exists for — pin it structurally: survivors
    // come from a marked parquet path, and no broadcast-hinted join
    // side's logical subtree may contain that relation
    val tmp = java.nio.file.Files.createTempDirectory("graft-surv-pin")
    try {
      val docs10 = Tables(spark, sf("0.001")).documents
        .select("doc_id", "text", "n_chars")
      docs10.filter(col("doc_id") < 400)
        .write.mode("overwrite").parquet(s"$tmp/survivors")
      val survivors = spark.read.parquet(s"$tmp/survivors")
      val s3 = docs10.filter(col("doc_id") >= 400)
      val keepers = Curation.incrementalNearDupKeepers(survivors, s3,
        n = 2, threshold = 0.2, maxDocFreq = 100L, "text", "doc_id")
      import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join, LogicalPlan}
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      def survivorsIn(p: LogicalPlan): Boolean = p.exists {
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.exists(_.toString.contains("graft-surv-pin"))
          case _ => false
        }
        case _ => false
      }
      val plan = keepers.queryExecution.optimizedPlan
      val joins = plan.collect { case j: Join => j }
      val offenders = joins.filter { j =>
        (j.hint.leftHint.exists(_.strategy.contains(BROADCAST)) &&
          survivorsIn(j.left)) ||
        (j.hint.rightHint.exists(_.strategy.contains(BROADCAST)) &&
          survivorsIn(j.right))
      }
      assert(offenders.isEmpty,
        s"survivors-derived broadcast builds:\n${offenders.mkString("\n")}")
      // traversal sanity: broadcast hints exist, and the survivors scan
      // is present (as a probe side) — both sides of the pin are live
      assert(joins.exists(j =>
        j.hint.leftHint.exists(_.strategy.contains(BROADCAST)) ||
        j.hint.rightHint.exists(_.strategy.contains(BROADCAST))),
        s"expected broadcast-hinted delivery-side builds in:\n$plan")
      assert(survivorsIn(plan), s"survivors scan missing from:\n$plan")
      // and the election itself stays correct on this split
      assert(keepers.count() > 0)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  test("funnel state: append-only save/load round-trip — each save " +
      "writes only the delta; the manifest unions back the full view") {
    import spark.implicits._
    def d(id: Long, text: String, nChars: Long = 60L) = (id, text, nChars)
    val pats = Seq("forbidden spell")
    val base = Seq(
      d(1, "the quick brown fox jumps over the lazy dog today"),
      d(2, "a curious cat walks along the narrow garden wall now"),
      d(5, "many ships sail across the wide ocean under bright stars"),
      d(6, "old trees grow beside the quiet river and the green hill")
    ).toDF("doc_id", "text", "n_chars")
    val d1 = Seq(
      d(11, "the quick brown fox jumps over the lazy dog today"), // dup of 1
      d(13, "seven silver birds fly over the cold misty northern lake")
    ).toDF("doc_id", "text", "n_chars")
    val d2 = Seq(
      d(17, "seven silver birds fly over the cold misty northern lake"), // dup of 13
      d(18, "golden wheat fields stretch toward the far sunny horizon line")
    ).toDF("doc_id", "text", "n_chars")
    val benchmark = Seq((900L, "unrelated benchmark row")).toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft-funnel-io")
    try {
      def ids(st: Curation.FunnelState) =
        st.survivors.collect().map(_.getLong(0)).sorted.toSeq
      def deltaIds(v: String) = spark.read.parquet(s"$root/$v/delta")
        .collect().map(_.getLong(0)).sorted.toSeq
      val s0 = Curation.initialFunnelState(base, benchmark, pats)
      Curation.saveFunnelState(s0, s"$root/state-0")
      assert(deltaIds("state-0") == Seq(1L, 2L, 5L, 6L))
      val l0 = Curation.loadFunnelState(spark, s"$root/state-0")
      assert(l0.liveDeltas == Seq("state-0/delta") && ids(l0) == ids(s0))
      val (s1, _) = Curation.incrementalFunnel(l0, d1, benchmark, pats)
      Curation.saveFunnelState(s1, s"$root/state-1")
      // only the delivery's survivors landed in the new version
      assert(deltaIds("state-1") == Seq(13L))
      val l1 = Curation.loadFunnelState(spark, s"$root/state-1")
      assert(l1.liveDeltas == Seq("state-0/delta", "state-1/delta"))
      assert(ids(l1) == Seq(1L, 2L, 5L, 6L, 13L))
      // in-memory double fold: one save still lands BOTH deltas
      val (s2a, _) = Curation.incrementalFunnel(l0, d1, benchmark, pats)
      val (s2b, _) = Curation.incrementalFunnel(s2a, d2, benchmark, pats)
      Curation.saveFunnelState(s2b, s"$root/state-2")
      assert(deltaIds("state-2") == Seq(13L, 18L))
      val l2 = Curation.loadFunnelState(spark, s"$root/state-2")
      assert(ids(l2) == Seq(1L, 2L, 5L, 6L, 13L, 18L))
      // compaction: the helper folds the delta chain into one snapshot
      // version whose manifest references only its own delta
      Curation.compactFunnelState(spark, s"$root/state-2", s"$root/state-3")
      val l3 = Curation.loadFunnelState(spark, s"$root/state-3")
      assert(l3.liveDeltas == Seq("state-3/delta") && ids(l3) == ids(l2))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("assignMonotoneIds: content-hash deliveries renumber above the " +
      "stored max, preserving every non-id column") {
    import spark.implicits._
    val stored = Seq((7L, "stored a", 8L), (41L, "stored b", 8L))
      .toDF("doc_id", "text", "n_chars")
    val state = Curation.FunnelState(stored, 0.0, 100.0)
    val delivery = Seq(
      (-8123456789L, "hash id one", 11L),
      (999999999999L, "hash id two", 11L),
      (3L, "hash id three", 13L)).toDF("doc_id", "text", "n_chars")
    val out = Curation.assignMonotoneIds(state, delivery)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.length == 3 && out.map(_._1).distinct.length == 3)
    assert(out.forall(_._1 > 41L), out.toSeq)
    assert(out.map(x => (x._2, x._3)).sorted.toSeq ==
      Seq(("hash id one", 11L), ("hash id three", 13L), ("hash id two", 11L)))
    // schema and column order unchanged
    assert(Curation.assignMonotoneIds(state, delivery).columns.toSeq ==
      Seq("doc_id", "text", "n_chars"))
    // no-headroom base (hash id near Long.MaxValue): fail fast instead
    // of wrapping to negative ids that silently corrupt keeper election.
    // The check runs inside the one renumbering pass (no extra count
    // job), so the executor-side error surfaces wrapped by Spark.
    val nearMax = Curation.FunnelState(
      Seq((Long.MaxValue - 1L, "stored", 6L)).toDF("doc_id", "text", "n_chars"),
      0.0, 100.0)
    val e = intercept[Throwable] {
      Curation.assignMonotoneIds(nearMax, delivery).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("headroom")), messages(e))
  }

  test("blocklistMatches equals the per-pattern contains chain") {
    val pats = Seq("window window", "vector join", "slow join sort")
    val got = Curation.blocklistMatches(docs, pats)
      .select(col("doc_id"), col("matched"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    val want = docs.select(col("doc_id"),
        pats.zipWithIndex.foldLeft(array()) { case (acc, (p, i)) =>
          concat(acc, when(contains(col("text"), lit(p)), array(lit(i)))
            .otherwise(array()))
        }.as("matched"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1)))
      .filter(_._2.nonEmpty).toMap
    assert(got == want && got.nonEmpty)
  }

  test("bloom decontamination: no false negatives vs the exact guard") {
    val benchmark = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
    val exactKept = Dedup.decontaminate(docs, benchmark)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bloomKept = Curation.bloomDecontaminate(docs, benchmark, fpp = 0.001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    // every truly contaminated doc is dropped by the bloom pass too
    assert(bloomKept.subsetOf(exactKept))
    // over-dropping is bounded: ≤ 5× the 0.1% fpp on this corpus size
    val overDropped = exactKept -- bloomKept
    assert(overDropped.size <= math.max(1, (all.size * 0.005).toInt),
      s"bloom over-dropped ${overDropped.size} of ${all.size}")
    assert(bloomKept.nonEmpty && (all -- exactKept).nonEmpty)
  }

  test("compression ratio: repetitive text compresses below noisy text") {
    import spark.implicits._
    val probe = Seq(
      (1L, "spark " * 400),                                  // templated
      (2L, (0 until 2000).map(i => (i * 2654435761L % 911).toString)
        .mkString(" ")),                                     // high entropy
      (3L, "")).toDF("doc_id", "text")
    val r = Curation.compressionRatios(probe)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) < 0.1 && r(2L) > r(1L) * 3)
    assert(r(3L) == 1.0) // empty input convention
    // deterministic across executions
    val again = Curation.compressionRatios(probe)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r == again)
  }

  test("funnel state: a 50-delta chain loads as ONE flat FileScan " +
      "(constant plan size) and compaction folds it to a single delta") {
    val root = java.nio.file.Files.createTempDirectory("graft-funnel-chain")
    try {
      val base = docs.select("doc_id", "text", "n_chars")
      var live = Seq.empty[String]
      for (i <- 0 until 50) {
        val slice = base.filter(pmod(col("doc_id"), lit(50)) === i)
        Curation.saveFunnelState(
          Curation.FunnelState(slice, 10.0, 90.0, Some(slice), live),
          s"$root/state-$i")
        live = live :+ s"state-$i/delta"
      }
      val st = Curation.loadFunnelState(spark, s"$root/state-49")
      assert(st.liveDeltas.size == 50, st.liveDeltas.size)
      assert(st.survivors.count() == base.count())
      // the load must be ONE multi-path FileScan, not a 50-way union
      // chain — the long-running-stream plan-size guarantee
      val scans = st.survivors.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.size == 1,
        s"expected one flat scan, got ${scans.size}:\n" +
          st.survivors.queryExecution.executedPlan)
      assert(scans.head.relation.location.rootPaths.size == 50)
      // compaction folds the whole chain into one delta dir
      Curation.compactFunnelState(spark, s"$root/state-49", s"$root/state-50")
      val c = Curation.loadFunnelState(spark, s"$root/state-50")
      assert(c.liveDeltas == Seq("state-50/delta"), c.liveDeltas)
      assert(c.survivors.count() == base.count())
    } finally org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
  }

  test("q92/q93 plans: row-local scans, no join or window over the corpus") {
    val p92 = SparkEntry.queries("q92_blocklist")(spark, sf("0.001"))
      .queryExecution.executedPlan.toString
    assert(p92.contains("multi_match"), s"expected the AC kernel in:\n$p92")
    assert(!p92.contains("Join"), s"q92 must not join:\n$p92")
    val p93 = SparkEntry.queries("q93_bloom_decontaminate")(spark, sf("0.001"))
      .queryExecution.executedPlan.toString
    assert(p93.contains("bloom_might_contain"),
      s"expected the bloom probe in:\n$p93")
    assert(!p93.contains("Join"),
      s"q93 corpus pass must filter in place, not join:\n$p93")
  }
  test("leakageSafeSplit: near-dup pairs NEVER straddle the split, " +
      "transitive chains share one component, singletons split " +
      "independently and reproducibly") {
    import graft.operators.{Curation, Dedup}
    import spark.implicits._
    // a transitive near-dup chain a~b, b~c (a and c need not pair
    // directly) plus unpaired singletons
    val docs = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),
      (11L, "alpha beta gamma delta epsilon zeta eta iota"),   // ~10
      (12L, "beta gamma delta epsilon zeta eta iota kappa"),   // ~11
      (50L, "completely different text about spark catalyst"),
      (51L, "yet another unrelated document body entirely"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, n = 2, threshold = 0.2,
      maxDocFreq = 100L)
    val pairSet = pairs.select("doc_id_a", "doc_id_b")
      .as[(Long, Long)].collect().toSet
    assert(pairSet.contains((10L, 11L)) && pairSet.contains((11L, 12L)),
      pairSet)
    val out = Curation.leakageSafeSplit(docs.select("doc_id"), pairs)
      .select("doc_id", "component", "split")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    val byId = out.map(r => r._1 -> r).toMap
    // the chain collapses to ONE component (min id) and ONE split —
    // the leakage guarantee: no pair can straddle train/test
    assert(Seq(10L, 11L, 12L).map(byId(_)._2).distinct == Seq(10L), out.toSeq)
    assert(Seq(10L, 11L, 12L).map(byId(_)._3).distinct.size == 1, out.toSeq)
    pairSet.foreach { case (a, b) =>
      assert(byId(a)._3 == byId(b)._3, s"pair ($a,$b) straddles the split")
    }
    // singletons are their own component
    assert(byId(50L)._2 == 50L && byId(51L)._2 == 51L)
    // reproducible: same inputs, identical assignment
    val again = Curation.leakageSafeSplit(docs.select("doc_id"), pairs)
      .select("doc_id", "component", "split")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(again.toSeq == out.toSeq)
    // and the split rule is exactly groupSplit's md5-prefix cut
    out.foreach { case (_, compId, split) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(compId.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 2)
      val expect = if (hex < "cc") "train" else if (hex < "e6") "val"
        else "test"
      assert(split == expect, s"component $compId: $split vs $expect")
    }
  }

  test("urlCuration at a 100k-entry blocklist: broadcast anti-join for " +
      "domains, PrefixSet kernel for paths — same results as the " +
      "literal forms, plan pinned") {
    import spark.implicits._
    // 100k blocked domains (2 real + filler), 50k blocked prefixes
    // (1 real + filler) — the size where the literal chain contract
    // ends
    val bigDomains = Set("blocked-a.example", "blocked-b.example") ++
      (1 to 100000).map(i => s"filler$i.example")
    val bigPrefixes = Seq("/ads/") ++
      (1 to 50000).map(i => s"/filler$i/")
    // RDD-backed, not a LocalRelation — Catalyst would otherwise fold
    // deterministic filters over local rows at OPTIMIZE time and the
    // plan pins below would have nothing to pin
    val docs = spark.sparkContext.parallelize(Seq(
      (1L, "https://keep.example/article/1", 100L),
      (2L, "https://blocked-a.example/article/2", 200L),
      (3L, "https://www.blocked-b.example/article/3", 300L),
      (4L, "https://keep.example/ads/4", 400L),
      (5L, "https://keep.example/filler7/5", 500L),
      (6L, "https://other.example/article/6", 600L)), 2)
      .toDF("doc_id", "url", "n_chars")
    val out = Curation.urlCuration(docs, bigDomains, bigPrefixes, 10)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 6L), out.collect().mkString(", "))
    // identical to the small-list (literal) semantics
    val small = Curation.urlCuration(docs,
      Set("blocked-a.example", "blocked-b.example"),
      Seq("/ads/", "/filler7/"), 10)
    assert(out.collect().map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1).toSeq ==
      small.collect().map(r => (r.getLong(0), r.getString(1)))
        .sortBy(_._1).toSeq)
    // plan pins: the domain side is a BROADCAST anti-join (the corpus
    // never shuffles for a blocklist) and no 100k-literal In chain
    // survives into the plan; the prefix rule is the kernel, not a
    // 50k-branch startsWith conjunction
    val exec = out.queryExecution.sparkPlan
    assert(exec.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
        if j.joinType.toString == "LeftAnti" => j
    }.nonEmpty, exec.toString.take(2000))
    val kernelFilters = exec.collect { case p => p }
      .flatMap(_.expressions)
      .flatMap(_.collect { case e: graft.functions.StartsWithAnyExpr => e })
    assert(kernelFilters.nonEmpty, "prefix kernel missing from the plan")
    val bigIns = exec.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f.condition
    }.flatMap(_.collect {
      case in: org.apache.spark.sql.catalyst.expressions.In
        if in.list.size > 1000 => in
      case inset: org.apache.spark.sql.catalyst.expressions.InSet
        if inset.hset.size > 1000 => inset
    })
    assert(bigIns.isEmpty, "a 100k-literal membership chain leaked")
    // the kernel itself: distinct-length bucketing is exact
    val ps = new graft.functions.PrefixSet(Seq("/a/", "/a/b/", "/xy/"))
    import org.apache.spark.unsafe.types.UTF8String
    assert(ps.matches(UTF8String.fromString("/a/c")))   // short prefix
    assert(ps.matches(UTF8String.fromString("/a/b/c")))
    assert(ps.matches(UTF8String.fromString("/xy/z")))
    assert(!ps.matches(UTF8String.fromString("/x/")))
    assert(!ps.matches(UTF8String.fromString("/a")))    // shorter than any
  }

  test("crawlCurationReport: the composed crawl-to-corpus pipeline " +
      "equals the hand-chained stages (q125 contract)") {
    import spark.implicits._
    import graft.sources.WarcReader
    val dir = java.nio.file.Files.createTempDirectory("graft-crawl").toFile
    try {
      // a crawl with every curation lever: a blocked domain, ads
      // paths, www-reduction, >cap docs on one domain, an exact dup,
      // a planted benchmark text, a non-HTML record and a 404.
      // Every payload has the SAME n_chars (fixed-width tokens) and a
      // ~50% stopword ratio, so the funnel's percentile length bounds
      // and stopword rule keep everything — the dedup/decontamination
      // levers are the only in-funnel drops, by construction.
      def html(id: String, text: String) =
        s"<html><body><p>doc $id ${WarcReader.htmlEscape(text)}</p></body></html>"
      def pay(tag: String) =
        (1 to 30).flatMap(j => Seq("the", f"$tag%sx$j%03d")).mkString(" ")
      val dupText = pay("d000")
      val benchDoc = s"doc 103 ${pay("b000")}"
      val bodies = (1 to 14).map { i =>
        val host = if (i % 5 == 0) "www.good.example" else "good.example"
        val path = if (i == 7) "ads/x" else s"article/$i"
        (s"https://$host/$path", f"2026-01-$i%02dT00:00:00Z",
          html(f"$i%03d", pay(f"w$i%03d")))
      } ++ Seq(
        ("https://bad.example/article/100", "2026-01-20T00:00:00Z",
          html("100", pay("v000"))),
        ("https://other.example/article/101", "2026-01-21T00:00:00Z",
          html("101", dupText)),
        ("https://other.example/article/102", "2026-01-22T00:00:00Z",
          html("101", dupText)), // exact dup of /article/101's content
        ("https://other.example/article/103", "2026-01-23T00:00:00Z",
          html("103", pay("b000"))))
      val f = new java.io.File(dir, "t.warc.gz")
      // plus a 404 and a non-HTML response: counted as responses,
      // dropped by extraction (the crawl_ingest delta)
      val extras = WarcReader.buildWarcGzRaw(Seq(
        WarcReader.httpResponseMember("https://good.example/missing",
          "2026-01-25T00:00:00Z", "<p>gone</p>", status = 404),
        WarcReader.httpResponseMember("https://good.example/logo",
          "2026-01-26T00:00:00Z", "bytes", contentType = "image/png")))
      java.nio.file.Files.write(f.toPath,
        WarcReader.buildWarcGz("t", bodies) ++ extras)
      val records = WarcReader.records(spark, f.getPath)
      val benchmark = Seq((900L, benchDoc)).toDF("doc_id", "text")
      val got = Curation.crawlCurationReport(records, benchmark,
          patterns = Seq("nonexistent blocklist phrase"),
          blockedDomains = Set("bad.example"),
          blockedPathPrefixes = Seq("/ads/"),
          capPerDomain = 10)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val byStage = got.map(r => r._1 -> r).toMap
      // hand-chained: extraction
      val docs = WarcReader.textDocuments(records)
      assert(byStage("crawl_ingest") ==
        (("crawl_ingest", bodies.size + 2L, docs.count())))
      assert(docs.count() == bodies.size.toLong) // 404 + png dropped
      // url curation: bad.example gone, /ads/ gone, cap 10 on
      // good.example (12 non-ads docs there → 2 evicted)
      val keep = Curation.urlCuration(docs, Set("bad.example"),
        Seq("/ads/"), 10)
      val kept = docs.join(keep.select("doc_id"), Seq("doc_id"),
        "left_semi")
      assert(byStage("url_curation")._3 == kept.count())
      assert(byStage("url_curation")._3 == 13L) // 10 good + 3 other
      // funnel stages equal the hand-run funnel over the survivors
      val funnel = Curation.curationFunnel(kept, benchmark,
          Seq("nonexistent blocklist phrase"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .map(r => r._1 -> r).toMap
      Seq("blocklist", "quality", "exact_dedup", "near_dedup",
        "decontaminate").foreach { st =>
        assert(byStage(st) == funnel(st), s"$st: ${byStage(st)} vs ${funnel(st)}")
      }
      // the funnel chains: input of each stage is the previous output
      val order = Seq("crawl_ingest", "url_curation", "blocklist",
        "quality", "exact_dedup", "near_dedup", "decontaminate")
      order.sliding(2).foreach { case Seq(a, b) =>
        assert(byStage(a)._3 == byStage(b)._2, s"$a -> $b")
      }
      // the levers actually fired: the exact dup and the contaminated
      // doc each dropped one
      assert(byStage("exact_dedup")._2 - byStage("exact_dedup")._3 == 1,
        got.mkString(", "))
      assert(byStage("decontaminate")._2 - byStage("decontaminate")._3 == 1,
        got.mkString(", "))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }
}

