package graft

import java.nio.file.Files

import graft.state.SlotStore

/** Unit coverage for the shared slotted-state core the funnel / IVF /
  * span-df hosts delegate to — listing, supersession, sweep, gates.
  * Host-level behavior (replay, torn-write recovery, lineage) is
  * covered end-to-end in StreamingSpec/DedupSpec/CurationSpec.
  */
class SlotStoreSpec extends SparkSuite {

  private def mk(root: java.io.File, name: String,
      committed: Boolean): Unit = {
    val d = new java.io.File(root, name)
    assert(d.mkdirs())
    if (committed)
      assert(new java.io.File(d, "_SUCCESS").createNewFile())
  }

  test("committedParts: multi-prefix single listing, torn dirs and " +
      "foreign names invisible, slot-ordered") {
    val root = Files.createTempDirectory("graft-slotstore").toFile
    try {
      mk(root, "a-0", committed = true)
      mk(root, "a-2", committed = true)
      mk(root, "a-1", committed = false) // torn
      mk(root, "b-7", committed = true)
      mk(root, "a-x", committed = true)  // non-numeric: not a part
      mk(root, "c-3", committed = true)  // unrequested prefix
      val parts = SlotStore.committedParts(spark, root.getPath, Seq("a", "b"))
      assert(parts.map(p => (p._1, p._2)) ==
        Seq(("a", 0L), ("a", 2L), ("b", 7L)), parts)
      // empty / missing dirs list as empty
      assert(SlotStore.committedParts(spark,
        new java.io.File(root, "nope").getPath, Seq("a")).isEmpty)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(root)
  }

  test("committedParts: a prefix that prefixes another matches " +
      "longest-first") {
    val root = Files.createTempDirectory("graft-slotstore-px").toFile
    try {
      mk(root, "dfs-delta-4", committed = true)
      mk(root, "dfs-delta-old-2", committed = true)
      val parts = SlotStore.committedParts(spark, root.getPath,
        Seq("dfs-delta", "dfs-delta-old"))
      assert(parts.map(p => (p._1, p._2)) ==
        Seq(("dfs-delta-old", 2L), ("dfs-delta", 4L)), parts)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(root)
  }

  test("liveParts: latest snapshot + strictly later deltas; no snapshot " +
      "means every delta") {
    val parts = Seq(("d", 1L, "p1"), ("s", 3L, "p3"), ("d", 3L, "p3d"),
      ("d", 4L, "p4"), ("s", 2L, "p2"), ("d", 5L, "p5"))
    val live = SlotStore.liveParts(parts, "d", "s")
    assert(live.map(p => (p._1, p._2)) ==
      Seq(("s", 3L), ("d", 4L), ("d", 5L)), live)
    val noSnap = SlotStore.liveParts(parts.filter(_._1 == "d"), "d", "s")
    assert(noSnap.map(_._2) == Seq(1L, 3L, 4L, 5L))
  }

  test("sweepSuperseded: committed AND torn parts at-or-below the " +
      "latest snapshot go; the snapshot and later deltas stay") {
    val root = Files.createTempDirectory("graft-slotstore-sweep").toFile
    try {
      mk(root, "d-0", committed = true)
      mk(root, "d-1", committed = false) // torn orphan below the snap
      mk(root, "s-1", committed = true)  // superseded older snapshot
      mk(root, "s-3", committed = true)  // the live snapshot
      mk(root, "d-3", committed = true)  // boundary delta: superseded
      mk(root, "d-4", committed = true)  // later delta: live
      val removed = SlotStore.sweepSuperseded(spark, root.getPath, "d", "s")
      assert(removed == 4, removed)
      assert(root.listFiles.map(_.getName).sorted.toSeq == Seq("d-4", "s-3"))
      // no snapshot → sweep is a no-op
      val root2 = Files.createTempDirectory("graft-slotstore-ns").toFile
      try {
        mk(root2, "d-0", committed = true)
        assert(SlotStore.sweepSuperseded(spark, root2.getPath, "d", "s") == 0)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(root2)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(root)
  }

  test("requireNotSuperseded rejects writes at or below the latest " +
      "snapshot slot; replayOrRegression gates retry/skip/regression") {
    val parts = Seq(("d", 1L, "x"), ("s", 5L, "y"))
    SlotStore.requireNotSuperseded(parts, "s", 6L, "t") // fine
    intercept[IllegalArgumentException] {
      SlotStore.requireNotSuperseded(parts, "s", 5L, "t")
    }
    intercept[IllegalArgumentException] {
      SlotStore.requireNotSuperseded(parts, "s", 2L, "t")
    }
    SlotStore.requireNotSuperseded(Seq(("d", 9L, "x")), "s", 0L, "t")
    assert(SlotStore.replayOrRegression(Some(4L), 4L, "t"))  // retry: skip
    assert(!SlotStore.replayOrRegression(Some(4L), 5L, "t")) // next: run
    assert(!SlotStore.replayOrRegression(None, 0L, "t"))     // fresh: run
    val e = intercept[IllegalStateException] {
      SlotStore.replayOrRegression(Some(4L), 3L, "t")
    }
    assert(e.getMessage.contains("checkpoint lineage"))
  }

  test("requireLineage is a no-op outside a streaming thread (no query " +
      "id property) and never creates the marker there") {
    val root = Files.createTempDirectory("graft-slotstore-lin").toFile
    try {
      SlotStore.requireLineage(spark, root.getPath, "t")
      assert(!new java.io.File(root, "_LINEAGE").exists())
    } finally org.apache.commons.io.FileUtils.deleteDirectory(root)
  }
}
