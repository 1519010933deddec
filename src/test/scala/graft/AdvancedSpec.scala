package graft

import org.apache.spark.sql.functions._
import graft.operators.{Advanced, Extensions}

/** Invariant specs for the round-7 additions (#151-157). Value-level
  * correctness is the DuckDB oracle's job (tools/check.py); these pin
  * the structural contracts.
  */
class AdvancedSpec extends GraftSpec {

  test("ts_ewma: first event per user equals its own value; one row per event") {
    val ev = Tables.eventsUs(spark, sf)
    val out = Advanced.tsEwma(spark, sf)
    assert(out.count() == ev.count())
    // the earliest event of each user has a single-element frame:
    // ewma = cents·2^0 / (1·100) = value (r4'd)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_us", "event_id")
    val first = ev.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("event_id"),
        graft.Exprs.r4((col("value").cast("decimal(18,2)") * 100)
          .cast("long").cast("double") / lit(100.0)).as("expect"))
    val joined = out.join(first, "event_id")
      .where(col("ewma") =!= col("expect"))
    assert(joined.count() == 0, "first-event ewma != value")
  }

  test("graph_components: root is the cluster minimum; sizes consistent") {
    val c = Advanced.graphComponents(spark, sf)
    assert(c.where(col("cluster_root") > col("node_id")).count() == 0)
    val bad = c.groupBy("cluster_root")
      .agg(count(lit(1)).as("n"), max("cluster_size").as("sz"),
        min("cluster_size").as("sz2"))
      .where(col("n") =!= col("sz") || col("sz") =!= col("sz2"))
    assert(bad.count() == 0, "cluster_size disagrees with member count")
  }

  test("text_keywords: dense ranks per source, positive keyness") {
    val k = Advanced.textKeywords(spark, sf)
    val perSource = k.groupBy("source")
      .agg(count(lit(1)).as("n"), min("rank").as("lo"), max("rank").as("hi"))
    assert(perSource.where(
      col("n") =!= col("hi") || col("lo") =!= 1).count() == 0)
    assert(k.where(col("keyness") <= 0).count() == 0)
  }

  test("events_bot_detect: gap stats internally consistent") {
    val b = Advanced.eventsBotDetect(spark, sf)
    assert(b.where(col("min_gap_us") > col("mean_gap_us")).count() == 0)
    assert(b.where(col("n_fast_gaps") > col("n_events") - 1).count() == 0)
    assert(b.where(col("is_bot") === 1 &&
      col("n_fast_gaps") * 2 <= col("n_events") - 1).count() == 0)
  }

  test("ann_range: threshold respected, no self-pairs, brute-force subset") {
    val r = Advanced.annRange(spark, sf)
    assert(r.where(col("cosine") < 0.3).count() == 0)
    assert(r.where(col("q_id") === col("c_id")).count() == 0)
    // every top-5 bruteforce hit above the threshold must appear here
    val bf = operators.Similarity.annBruteforce(spark, sf)
      .where(col("cosine") >= 0.3).select("q_id", "c_id")
    assert(bf.join(r.select("q_id", "c_id"), Seq("q_id", "c_id"),
      "left_anti").count() == 0)
  }

  test("decontaminate_minhash: orientation is corpus -> benchmark") {
    val d = Advanced.decontaminateMinhash(spark, sf)
    val src = Tables(spark, sf, "documents").select("doc_id", "source")
    val c = d.join(src.withColumnRenamed("doc_id", "corpus_id"), "corpus_id")
    assert(c.where(col("source") === "src0").count() == 0)
    val b = d.join(src.withColumnRenamed("doc_id", "bench_id"), "bench_id")
    assert(b.where(col("source") =!= "src0").count() == 0)
  }

  test("dedup_cluster_stats: doc counts fold back to the cluster table") {
    val s = Extensions.dedupClusterStats(spark, sf)
    val bad = s.where(
      col("n_docs_in") =!= col("cluster_size") * col("n_clusters"))
    assert(bad.count() == 0)
    val total = s.agg(sum("n_docs_in")).head.getLong(0)
    assert(total == Extensions.dedupCluster(spark, sf).count())
  }
}
