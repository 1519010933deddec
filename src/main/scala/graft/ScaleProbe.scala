package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-probe data generator: replicates a driver scale factor K× with
  * key-shifted replicas, producing a one-decade-larger dataset for
  * MEASURED scaling of the heavy operators (the 100-TB claim otherwise
  * rests on plan reasoning alone). This is a perf instrument, not eval
  * data — correctness stays on the driver's parquet + DuckDB oracle.
  *
  * Replication semantics (so a K× corpus behaves like MORE data, not
  * like K exact copies):
  *  - Every key column shifts by a per-replica stride (strides are
  *    mutually clear of each other and of mm_phash_dedup's +1e6
  *    re-upload id trick), so joins stay consistent within a replica
  *    and never cross replicas.
  *  - `region`/`nation` stay single-copy: they are bounded enumeration
  *    dims at ANY data scale (the BroadcastDimTables premise).
  *  - `documents.text` goes through a per-replica token SUBSTITUTION
  *    CIPHER (each token → a replica-tagged md5 token): document
  *    structure — token counts, repetition, and the WITHIN-replica
  *    near-dup relationships — is preserved exactly while
  *    cross-replica token sets are disjoint (Jaccard 0), so a K×
  *    corpus carries K× the dup density, never K² planted
  *    cross-replica twins.
  *  - `embeddings.embedding` is circularly rotated by a per-replica
  *    offset: deterministic, norm-preserving, and uncorrelated with
  *    the original (rotating a random vector decorrelates it), so
  *    cosine-based operators see fresh vectors, not clones.
  *  - `events` keep their timestamps: K× event density over the same
  *    horizon, which is how a bigger deployment actually looks.
  *
  * Usage: `runMain graft.ScaleProbe [srcDir] [outDir] [k]`, then run
  * `SPARK_GRAFT_SF_DIR=outDir runMain graft.Bench <heavy queries>`.
  */
object ScaleProbe {

  private val KD = 10000000L // doc_id / vec_id stride
  private val KO = 100000000L // orderkey stride
  // custkey stride: the +10 tail is LOAD-BEARING — it lands replica
  // variation inside name digits 4-8 (the ER blocking key renders the
  // shifted key into the name), keeping ER block sizes constant as K
  // grows; a clean 10^7 stride leaves digits 4-8 replica-invariant
  // and blocks fatten K× (the measured round-19 spill)
  private val KC = 10000100L
  private val KP = 10000000L // partkey stride
  private val KS = 1000000L // suppkey stride
  private val KE = 100000000L // event_id stride
  private val KU = 1000000L // user_id stride

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_probe"
    val k = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    val spark = GraftSession(cpus, "graft-scale-probe")
    build(spark, src, out, k)
    spark.stop()
  }

  def build(spark: SparkSession, src: String, out: String, k: Int): Unit = {
    // the customer name re-render is lpad(custkey, 9, '0'): a shifted
    // key above 10^9-1 would silently TRUNCATE to 9 digits, colliding
    // names and breaking both the ER blocking key and the generator's
    // never-cross-replicas contract — fail loudly instead of
    // corrupting (the bound admits the standing 100x probe exactly)
    val maxCust = Tables(spark, src, "customer")
      .agg(max(col("c_custkey"))).head.getLong(0)
    require((k - 1).toLong * KC + maxCust <= 999999999L,
      s"replication k=$k overflows the 9-digit customer-name block " +
        s"(max shifted custkey ${(k - 1).toLong * KC + maxCust} > " +
        "999999999); widen the name render before probing past this")
    def replicate(name: String)(shift: (DataFrame, Int) => DataFrame): Unit = {
      val base = Tables(spark, src, name)
      val all = (0 until k).map(i => shift(base, i)).reduce(_ unionAll _)
      all.write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    // bounded dims: single copy
    Seq("region", "nation").foreach { n =>
      Tables(spark, src, n).write.mode("overwrite")
        .parquet(s"$out/$n.parquet")
    }
    // replica i>0 customers are genuinely DIFFERENT PEOPLE, not key-
    // shifted clones: the name's digit block re-renders from the
    // SHIFTED key (KC's +10 tail pushes replica variation into name
    // digits 4-8 — the ER family's blocking key — so blocks stay
    // original-sized at any K instead of fattening K×), the balance
    // shifts by i·$2.01 (outside the ER $1 rule, so cross-replica
    // pairs fail the balance score), and the nation rotates by i
    // (cross-replica nation equality then needs |i−j| ≥ 25, whose
    // ≥250 name-digit gap is always lev ≥ 2 — killing every
    // cross-replica lev-1 twin). Without this, a 100× replica is 100
    // lev-0/1 twins per customer with identical balances — the
    // measured 59 GB er_golden_record spill and a quadratic candidate
    // blowup that violates this generator's own never-cross-replicas
    // contract (PLANS.md round-19).
    replicate("customer")((df, i) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(i * KC))
        .withColumn("c_name", concat(lit("Customer#"),
          lpad(col("c_custkey").cast("string"), 9, "0")))
        .withColumn("c_acctbal", col("c_acctbal") + lit(i * 2.01))
        .withColumn("c_nationkey",
          ((col("c_nationkey") + lit(i)) % 25).cast(
            df.schema("c_nationkey").dataType)))
    replicate("supplier")((df, i) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(i * KS)))
    replicate("part")((df, i) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(i * KP)))
    replicate("orders")((df, i) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(i * KO))
        .withColumn("o_custkey", col("o_custkey") + lit(i * KC)))
    replicate("lineitem")((df, i) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(i * KO))
        .withColumn("l_partkey", col("l_partkey") + lit(i * KP))
        .withColumn("l_suppkey", col("l_suppkey") + lit(i * KS)))
    replicate("events")((df, i) =>
      df.withColumn("event_id", col("event_id") + lit(i * KE))
        .withColumn("user_id", col("user_id") + lit(i * KU)))
    replicate("documents") { (df, i) =>
      // replica i>0: per-replica token SUBSTITUTION CIPHER — every
      // token maps injectively to a replica-tagged md5 token. Document
      // structure (token counts, repetition patterns, and crucially the
      // WITHIN-replica near-dup relationships) is preserved exactly,
      // while cross-replica token sets are disjoint (Jaccard 0), so a
      // K× corpus carries K× the dup density — never K² planted
      // cross-replica twins. (A first attempt with prefix-drop salting
      // left cross-replica Jaccard ≈ 0.7-0.99 — inside the 8×2 LSH
      // S-curve — and inflated candidates ~45×; see PLANS.md.)
      val salted =
        if (i == 0) df
        else df.withColumn("text", concat_ws(" ",
            expr(s"""transform(split(text, ' '),
               |  t -> concat('w', substring(md5(concat(t, 'r$i')), 1, 8)))"""
              .stripMargin)))
          .withColumn("n_chars", length(col("text")))
      salted.withColumn("doc_id", col("doc_id") + lit(i * KD))
    }
    replicate("embeddings") { (df, i) =>
      val rolled =
        if (i == 0) df
        else {
          // circular rotation by (i*7+3) mod dim positions:
          // norm-preserving and decorrelated from the source vector.
          // (i*7+3) mod dim hits 0 at i=27 for dim 64, which would make
          // that replica an exact clone — remap offset 0 into [1, dim-1]
          // so every replica ≥1 genuinely rotates.
          val r0 = pmod(lit(i * 7 + 3), size(col("embedding")))
          val r = when(r0 === 0,
            pmod(lit(i * 7 + 3), size(col("embedding")) - 1) + 1
          ).otherwise(r0)
          df.withColumn("embedding",
            when(r === 0, col("embedding")).otherwise(
              concat(
                slice(col("embedding"), r + lit(1),
                  size(col("embedding")) - r),
                slice(col("embedding"), lit(1), r))))
        }
      rolled.withColumn("vec_id", col("vec_id") + lit(i * KD))
    }
    println(s"[probe] built ${k}x replica of $src at $out")
  }
}
