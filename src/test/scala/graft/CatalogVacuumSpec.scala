package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.sources.{CatalogCompaction, CatalogVacuum}

/** Physical vacuum lifecycle: the triad end-to-end. Checkpoints must
  * not change any as-of read; vacuum must delete exactly the covered
  * time-prefix, keep every retained cutoff bit-identical, REFUSE
  * cutoffs below the floor, and be idempotent.
  */
class CatalogVacuumSpec extends GraftSpec {

  private case class Chg(seq: Long, doc: Long, nChars: Long,
      level: String, op: String, eff: String)

  private val origin = "1995-12-31"

  private def baseRows: Seq[(Long, Long, String)] =
    (0L until 40L).map(i => (i, 100L + i, (i % 3 + 1).toString))

  private val changes = Seq(
    Chg(1L, 3L, 500L, "1", "upsert", "1996-01-10"),
    Chg(2L, 6L, 106L, "3", "upsert", "1996-01-20"), // level move 1->3
    Chg(3L, 9L, 109L, "1", "delete", "1996-02-05"),
    Chg(4L, 3L, 520L, "1", "upsert", "1996-03-15"), // supersedes seq 1
    Chg(5L, 100L, 700L, "2", "upsert", "1996-04-10"), // insert
    Chg(6L, 9L, 900L, "1", "upsert", "1996-05-20"), // resurrection
    Chg(7L, 12L, 112L, "1", "delete", "1996-06-25"))

  /** Brute-force reference fold — the independent check. */
  private def expectedAsOf(cutoff: String): Set[(Long, Long, String)] = {
    val st = scala.collection.mutable.Map[Long, (Long, String)]()
    baseRows.foreach { case (id, n, l) => st(id) = (n, l) }
    changes.filter(_.eff <= cutoff).sortBy(c => (c.eff, c.seq))
      .foreach { c =>
        if (c.op == "delete") st.remove(c.doc)
        else st(c.doc) = (c.nChars, c.level)
      }
    st.map { case (id, (n, l)) => (id, n, l) }.toSet
  }

  private def stateOf(df: DataFrame): Set[(Long, Long, String)] =
    df.select(col("doc_id"), col("n_chars"),
        col("processing_level").cast("string"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  /** Fresh versioned table with the full fixture history appended. */
  private def buildTable(): String = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft_vacuum").toString + "/t"
    val base = baseRows
      .toDF("doc_id", "n_chars", "processing_level")
    CatalogVacuum.init(spark, dir, base, origin)
    val log = changes
      .map(c => (c.doc, c.nChars, c.level, c.op, c.seq, c.eff))
      .toDF("doc_id", "n_chars", "processing_level", "op", "seq", "eff")
      .withColumn("eff", to_date(col("eff")))
    CatalogVacuum.appendLog(spark, dir, log)
    dir
  }

  private val cutoffs = Seq(origin, "1996-01-15", "1996-02-28",
    "1996-03-31", "1996-05-01", "1996-07-01")

  test("asOf equals the brute-force fold at every cutoff, and a " +
      "checkpoint changes no read") {
    val dir = buildTable()
    cutoffs.foreach { c =>
      assert(stateOf(CatalogVacuum.asOf(spark, dir, c)) == expectedAsOf(c),
        s"asOf($c) pre-checkpoint")
    }
    CatalogVacuum.checkpoint(spark, dir, "1996-03-31")
    assert(CatalogVacuum.snapshots(spark, dir) ==
      Seq(origin, "1996-03-31"))
    cutoffs.foreach { c =>
      assert(stateOf(CatalogVacuum.asOf(spark, dir, c)) == expectedAsOf(c),
        s"asOf($c) post-checkpoint")
    }
    // re-checkpointing the same watermark is a fixpoint (staged write:
    // the fold never reads the directory being replaced)
    CatalogVacuum.checkpoint(spark, dir, "1996-03-31")
    assert(stateOf(CatalogVacuum.asOf(spark, dir, "1996-03-31")) ==
      expectedAsOf("1996-03-31"))
  }

  test("full-history asOf equals CatalogCompaction.mergeOnRead — the " +
      "triad's two folds agree") {
    val s = spark
    import s.implicits._
    val dir = buildTable()
    val base = baseRows.toDF("doc_id", "n_chars", "processing_level")
    // seq is monotone with eff in the fixture, so the compactor's
    // seq-only ordering and the vacuum read's (eff, seq) ordering must
    // produce the same state
    val log = changes
      .map(c => (c.doc, c.nChars, c.level, c.op, c.seq))
      .toDF("doc_id", "n_chars", "processing_level", "op", "seq")
    val viaCompactor = stateOf(
      CatalogCompaction.mergeOnRead(base, log, "doc_id"))
    assert(stateOf(CatalogVacuum.asOf(spark, dir, "1996-07-01")) ==
      viaCompactor)
  }

  test("vacuum deletes exactly the covered time-prefix, keeps every " +
      "retained cutoff identical, refuses below the floor, and is " +
      "idempotent") {
    val dir = buildTable()
    CatalogVacuum.checkpoint(spark, dir, "1996-03-31")
    CatalogVacuum.checkpoint(spark, dir, "1996-06-30")
    val retained = Seq("1996-03-31", "1996-05-01", "1996-07-01")
    val before = retained.map(c =>
      c -> stateOf(CatalogVacuum.asOf(spark, dir, c))).toMap

    // horizon = 1996-06-30 - 90d = 1996-04-01; covering snapshot
    // w_cov = 1996-03-31; months 01..03 are the covered prefix
    val stats = CatalogVacuum.vacuum(spark, dir, 90)
    assert(stats.floor == "1996-03-31")
    assert(stats.vacuumedSegments == Seq("1996-01", "1996-02", "1996-03"))
    assert(stats.vacuumedSnapshots == Seq(origin))
    assert(stats.keptSegments == Seq("1996-04", "1996-05", "1996-06"))
    assert(CatalogVacuum.segments(spark, dir) ==
      Seq("1996-04", "1996-05", "1996-06"))
    assert(CatalogVacuum.snapshots(spark, dir) ==
      Seq("1996-03-31", "1996-06-30"))
    assert(CatalogVacuum.vacuumFloor(spark, dir).contains("1996-03-31"))

    // every retained cutoff reads bit-identical state
    retained.foreach { c =>
      assert(stateOf(CatalogVacuum.asOf(spark, dir, c)) == before(c),
        s"asOf($c) changed across vacuum")
    }
    // below the floor: REFUSE (the Delta versionAsOf contract), never
    // a silently wrong answer
    val e = intercept[IllegalStateException] {
      CatalogVacuum.asOf(spark, dir, "1996-02-28")
    }
    assert(e.getMessage.contains("1996-03-31"))

    // idempotent: a second run deletes nothing and moves nothing
    val again = CatalogVacuum.vacuum(spark, dir, 90)
    assert(again.floor == "1996-03-31")
    assert(again.vacuumedSegments.isEmpty &&
      again.vacuumedSnapshots.isEmpty)
    retained.foreach { c =>
      assert(stateOf(CatalogVacuum.asOf(spark, dir, c)) == before(c))
    }
  }

  test("a BACKDATED append after the covering checkpoint survives " +
      "vacuum (coverage receipt keeps its segment), retained reads " +
      "include it, and a re-checkpoint makes it deletable") {
    val s = spark
    import s.implicits._
    val dir = buildTable()
    CatalogVacuum.checkpoint(spark, dir, "1996-03-31")
    CatalogVacuum.checkpoint(spark, dir, "1996-06-30")
    // backdated: eff lands in month 1996-02 (inside what w_cov =
    // 1996-03-31 WOULD cover by eff alone) but is appended AFTER both
    // checkpoints — absent from every snapshot
    val late = Seq((20L, 888L, "2", "upsert", 8L, "1996-02-10"))
      .toDF("doc_id", "n_chars", "processing_level", "op", "seq", "eff")
      .withColumn("eff", to_date(col("eff")))
    CatalogVacuum.appendLog(spark, dir, late)

    val retained = Seq("1996-03-31", "1996-05-01", "1996-07-01")
    val before = retained.map(c =>
      c -> stateOf(CatalogVacuum.asOf(spark, dir, c))).toMap
    // the backdated upsert is visible at every retained cutoff
    retained.foreach { c =>
      assert(before(c).contains((20L, 888L, "2")), s"backdate at $c")
    }

    // horizon 1996-04-01, w_cov = 1996-03-31: months 01 and 03 are
    // provably folded (receipt counts match) and go; month 02 now has
    // 2 rows vs the receipt's 1 — an eff-only rule would DELETE it and
    // silently lose the backdated change; the receipt keeps it
    val stats = CatalogVacuum.vacuum(spark, dir, 90)
    assert(stats.vacuumedSegments == Seq("1996-01", "1996-03"))
    assert(stats.keptSegments ==
      Seq("1996-02", "1996-04", "1996-05", "1996-06"))
    retained.foreach { c =>
      assert(stateOf(CatalogVacuum.asOf(spark, dir, c)) == before(c),
        s"asOf($c) changed across vacuum with a backdated segment")
    }

    // re-checkpointing w_cov ALONE is not enough: asOf at late
    // cutoffs picks the stale 1996-06-30 snapshot, which still lacks
    // the backdated change — vacuum must keep the segment until EVERY
    // snapshot ≥ w_cov carries a matching receipt
    CatalogVacuum.checkpoint(spark, dir, "1996-03-31")
    val partial = CatalogVacuum.vacuum(spark, dir, 90)
    assert(partial.vacuumedSegments.isEmpty,
      "w_cov receipt alone must not license deletion under a stale " +
        "later snapshot")
    retained.foreach { c =>
      assert(stateOf(CatalogVacuum.asOf(spark, dir, c)) == before(c))
    }

    // full repair: re-checkpoint the stale later snapshot too; the
    // segment is then provably folded everywhere and the next vacuum
    // deletes it — with reads still bit-identical
    CatalogVacuum.checkpoint(spark, dir, "1996-06-30")
    val again = CatalogVacuum.vacuum(spark, dir, 90)
    assert(again.vacuumedSegments == Seq("1996-02"))
    assert(CatalogVacuum.segments(spark, dir) ==
      Seq("1996-04", "1996-05", "1996-06"))
    retained.foreach { c =>
      assert(stateOf(CatalogVacuum.asOf(spark, dir, c)) == before(c),
        s"asOf($c) changed after the repair checkpoint + vacuum")
    }
  }

  test("vacuum with no covering snapshot inside the horizon deletes " +
      "nothing — never strands a retained cutoff") {
    val dir = buildTable()
    CatalogVacuum.checkpoint(spark, dir, "1996-06-30")
    // horizon = 1986-ish: no snapshot that old besides none <= it
    val stats = CatalogVacuum.vacuum(spark, dir, 3650)
    assert(stats.vacuumedSegments.isEmpty &&
      stats.vacuumedSnapshots.isEmpty)
    assert(CatalogVacuum.segments(spark, dir).size == 6)
    // nothing was deleted, so every cutoff still reads correctly
    cutoffs.foreach { c =>
      assert(stateOf(CatalogVacuum.asOf(spark, dir, c)) == expectedAsOf(c))
    }
  }
}
