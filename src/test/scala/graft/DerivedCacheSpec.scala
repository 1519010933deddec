package graft

import org.scalatest.funsuite.AnyFunSuite

/** Focused specs for the two per-JVM amortization primitives the r12
  * optimization round leans on: LayoutCache (parquet trees) and
  * DerivedCache (driver-side learned artifacts). Both must compute a
  * key exactly once per JVM, re-run after a failure, and fail fast on
  * same-key re-entrancy instead of deadlocking.
  */
class DerivedCacheSpec extends AnyFunSuite {

  test("DerivedCache computes a key once and memoizes the value") {
    var runs = 0
    def get(): Seq[Int] =
      DerivedCache.getOrCompute("spec_once", "/spec/dir") {
        runs += 1; Seq(1, 2, 3)
      }
    assert(get() == Seq(1, 2, 3))
    assert(get() == Seq(1, 2, 3))
    assert(runs == 1, "compute ran more than once for the same key")
  }

  test("DerivedCache keys include the dir — two dirs, two computes") {
    var runs = 0
    def get(d: String): Int =
      DerivedCache.getOrCompute[Integer]("spec_dirs", d) { runs += 1; 7 }
    get("/a"); get("/b"); get("/a")
    assert(runs == 2)
  }

  test("DerivedCache: a failed compute is uncached, a retry re-runs") {
    var attempts = 0
    def get(fail: Boolean): Integer =
      DerivedCache.getOrCompute[Integer]("spec_retry", "/d") {
        attempts += 1
        if (fail) throw new RuntimeException("boom")
        42
      }
    intercept[RuntimeException](get(fail = true))
    assert(get(fail = false) == 42)
    assert(attempts == 2)
  }

  test("LayoutCache: same-key re-entrant getOrWrite fails fast " +
      "instead of deadlocking on its own future") {
    val e = intercept[IllegalStateException] {
      LayoutCache.getOrWrite("spec_reentrant", "/spec/dir") { _ =>
        LayoutCache.getOrWrite("spec_reentrant", "/spec/dir")(_ => ())
        ()
      }
    }
    assert(e.getMessage.contains("re-entrant"))
    // the failed outer write must be uncached: a retry runs the write
    var ran = false
    LayoutCache.getOrWrite("spec_reentrant", "/spec/dir")(_ => ran = true)
    assert(ran, "failed re-entrant attempt left a poisoned cache entry")
  }

  test("LayoutCache: cross-key nesting inside a write is allowed") {
    var innerRan = false
    LayoutCache.getOrWrite("spec_outer", "/spec/dir") { _ =>
      LayoutCache.getOrWrite("spec_inner", "/spec/dir")(_ => innerRan = true)
      ()
    }
    assert(innerRan)
  }

  test("DerivedCache: same-key re-entrant getOrCompute fails fast " +
      "instead of deadlocking on its own future") {
    val e = intercept[IllegalStateException] {
      DerivedCache.getOrCompute[Integer]("spec_dc_reentrant", "/d") {
        DerivedCache.getOrCompute[Integer]("spec_dc_reentrant", "/d")(1)
      }
    }
    assert(e.getMessage.contains("re-entrant"))
    // the failed outer compute must be uncached: a retry runs
    assert(DerivedCache.getOrCompute[Integer](
      "spec_dc_reentrant", "/d")(9) == 9)
  }

  test("LayoutCache: spark.graft.cacheRoot routes trees through the " +
      "session's Hadoop FS and the path round-trips") {
    val spark = TestSpark.spark
    val root = java.nio.file.Files
      .createTempDirectory("graft_spec_cacheroot").toString
    spark.conf.set("spark.graft.cacheRoot", root)
    try {
      var written: String = null
      val got = LayoutCache.getOrWrite("spec_fsroot", "/spec/dir") { tmp =>
        written = tmp
        // write through the Hadoop FS the path resolves to — the
        // round-trip a cluster's distributed write performs
        val p = new org.apache.hadoop.fs.Path(tmp, "marker")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val out = fs.create(p)
        out.writeUTF("ok"); out.close()
      }
      assert(got == written)
      // allocated under the configured root, not java.io.tmpdir
      val qualifiedRoot = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .makeQualified(new org.apache.hadoop.fs.Path(root)).toString
      assert(got.startsWith(qualifiedRoot),
        s"cache dir $got not under configured root $qualifiedRoot")
      // the written bytes read back through the same FS resolution
      val p = new org.apache.hadoop.fs.Path(got, "marker")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val in = fs.open(p)
      assert(in.readUTF() == "ok"); in.close()
    } finally spark.conf.unset("spark.graft.cacheRoot")
  }
}
