package graft

import org.apache.spark.sql.functions._

/** Semantic properties of the corpus-preparation ops (SURVEY §2
  * #64-67) that the hash-oracle can't express.
  */
class CorpusSpec extends GraftSpec {

  test("text_repetition: fractions bounded, bigram count = tokens - 1") {
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), (size(split(col("text"), " ")) - 1)
        .cast("long").as("expect_bigrams"))
    val rep = operators.Corpus.textRepetition(spark, sf)
    val joined = rep.join(docs, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("n_bigrams") == r.getAs[Long]("expect_bigrams"))
      val dup = r.getAs[Double]("dup_frac")
      val top = r.getAs[Double]("top_frac")
      assert(dup >= 0.0 && dup < 1.0)
      assert(top > 0.0 && top <= 1.0)
      // the top bigram is itself a duplicate witness: if any bigram
      // repeats (top_cnt >= 2), dup_frac must be positive (1e-4 slack
      // because both fractions are rounded to 4dp)
      if (top > 1.0 / r.getAs[Long]("n_bigrams") + 1e-4) assert(dup > 0.0)
    }
  }

  test("decontaminate: flagged docs truly share a 5-gram; src0 never flagged") {
    val flagged = operators.Corpus.decontaminate(spark, sf)
    assert(flagged.count() > 0)
    // no benchmark doc flags itself
    val srcOf = Tables(spark, sf, "documents").select("doc_id", "source")
    assert(flagged.join(srcOf, "doc_id")
      .where(col("source") === "src0").count() == 0)
    // string-level re-verification of a sample: every flagged doc shares
    // at least one literal 5-gram with some src0 doc
    val g = Tables(spark, sf, "documents")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), col("source"), explode(expr(
        """transform(sequence(1, size(toks) - 4),
          |  i -> concat_ws(' ', slice(toks, i, 5)))""".stripMargin))
        .as("gram"))
    val stringHits = g.where(col("source") =!= "src0").as("c")
      .join(g.where(col("source") === "src0").as("b"),
        col("c.gram") === col("b.gram"))
      .select(col("c.doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val hashHits = flagged.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(hashHits == stringHits)
  }

  test("pack_sequences: chunk ids are non-decreasing prefix sums per source") {
    val packed = operators.Corpus.packSequences(spark, sf).collect()
    assert(packed.nonEmpty)
    packed.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getLong(1))
      var cum = 0L
      ordered.foreach { r =>
        assert(r.getLong(3) == cum / 2048, s"chunk mismatch at $r")
        cum += r.getLong(2)
      }
    }
  }

  test("dedup_passages: exact-duplicate docs share every passage") {
    val rep = operators.Corpus.dedupPassages(spark, sf)
    val rows = rep.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_shared") <= r.getAs[Long]("n_passages"))
      val f = r.getAs[Double]("shared_frac")
      assert(f >= 0.0 && f <= 1.0)
    }
    // string-level reverification: the docs the operator flags
    // (n_shared > 0) are EXACTLY the docs sharing a literal 8-token
    // aligned chunk with another doc
    val p = Tables(spark, sf, "documents")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(toks) div 8),
          |  i -> concat_ws(' ', slice(toks, (i - 1) * 8 + 1, 8)))"""
          .stripMargin)).as("chunk"))
    val stringFlagged = p.as("a")
      .join(p.as("b"), col("a.chunk") === col("b.chunk") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(stringFlagged.nonEmpty, "testdata has no shared passages?")
    val hashFlagged = rows.filter(_.getAs[Long]("n_shared") > 0)
      .map(_.getAs[Long]("doc_id")).toSet
    assert(hashFlagged == stringFlagged)
  }

  test("dedup_substrings finds a planted UNALIGNED duplicated span " +
    "that dedup_passages misses") {
    val sp = spark
    import sp.implicits._
    // a 16-token span S planted at offset 4 in doc 1 and offset 3 in
    // doc 2: the 1-token alignment shift guarantees no 8-token
    // NON-overlapping chunk of doc 1 equals any chunk of doc 2, while
    // every OVERLAPPING 8-window fully inside S matches
    val span = (1 to 16).map(i => s"s$i")
    val docA = ((1 to 4).map(i => s"a$i") ++ span ++
      (21 to 40).map(i => s"a$i")).mkString(" ") // 40 tokens
    val docB = ((1 to 3).map(i => s"b$i") ++ span ++
      (20 to 36).map(i => s"b$i")).mkString(" ") // 36 tokens
    val docC = (1 to 24).map(i => s"c$i").mkString(" ") // clean control
    val dir = java.nio.file.Files.createTempDirectory("graft_subdup")
    Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
      .write.parquet(dir.resolve("documents.parquet").toString)

    // the aligned-chunk operator sees zero sharing anywhere
    val pass = operators.Corpus.dedupPassages(spark, dir.toString)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_shared")).toMap
    assert(pass == Map(1L -> 0L, 2L -> 0L, 3L -> 0L),
      s"chunk alignment should hide the span, got $pass")

    // the overlapping-shingle operator recovers the full 16-token span
    // in both carriers (9 consecutive shared window starts run-merge to
    // exactly 16 covered tokens) and keeps the control clean
    val sub = operators.Corpus.dedupSubstrings(spark, dir.toString)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("dup_tokens"))).toMap
    assert(sub == Map(1L -> (40L, 16L), 2L -> (36L, 16L),
      3L -> (24L, 0L)), s"got $sub")
  }

  test("text_bpe_merges runs the real merge loop (hand-computed trace)") {
    val sp = spark
    import sp.implicits._
    // one doc, words: banana x3, bandana x1. By hand:
    //   it1 pairs: (a n)=8 (n a)=6 (b a)=4 (d a)=1 (n d)=1 -> merge "a n"
    //   it2 over [b,an,an,a]/[b,an,d,an,a]: (an a)=4 (b an)=4 tie ->
    //     lexical order picks "an a"; (an an)=3 (an d)=1 (d an)=1
    //   it3 over [b,an,ana]/[b,an,d,ana]: (b an)=4 (an ana)=3 ...
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe")
    Seq((1L, "banana banana banana bandana")).toDF("doc_id", "text")
      .write.parquet(dir.resolve("documents.parquet").toString)
    val out = operators.Corpus.textBpeMerges(spark, dir.toString)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3)))
    val winners = out.filter(_._2 == 1)
      .map(r => (r._1, r._3, r._4)).toSeq
    assert(winners == Seq((1, "a n", 8L), (2, "an a", 4L), (3, "b an", 4L)))
    // the merged pair is gone from the next iteration's pair universe
    val it2pairs = out.filter(_._1 == 2).map(_._3).toSet
    val it3pairs = out.filter(_._1 == 3).map(_._3).toSet
    assert(!it2pairs.contains("a n") && !it3pairs.contains("an a"))
    // it2's full table matches the hand trace
    assert(out.filter(_._1 == 2).map(r => r._3 -> r._4).toMap ==
      Map("an a" -> 4L, "b an" -> 4L, "an an" -> 3L,
        "an d" -> 1L, "d an" -> 1L))
  }

  test("corpus_bpe_encode equals a plain-Scala Sennrich reference " +
      "(learn + greedy rank-order encode), incl. chained merges and " +
      "1-char words") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "banana banana banana bandana", "srcA"),
      (2L, "aaaa aa banana", "srcA"), // chained occurrences of (a,a)
      (3L, "bandana band an a", "srcB")) // "a": encode-only, not learned
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_enc")
    docs.toDF("doc_id", "text", "source")
      .write.parquet(dir.resolve("documents.parquet").toString)

    // ---- plain-Scala reference: Sennrich learn + greedy L2R encode
    def greedyMerge(syms: Vector[String], m: (String, String)):
        Vector[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == m._1 && s == m._2)
          acc.dropRight(1) :+ (m._1 + m._2)
        else acc :+ s
      }
    val allWords: Seq[(String, Long)] = docs
      .flatMap(_._2.split(' ')).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }.toSeq
    var vocab: Seq[(Vector[String], Long)] = allWords
      .filter(_._1.length >= 2)
      .map { case (w, c) => w.split("").toVector -> c }
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(String, String)]
    var stop = false
    while (merges.size < 8 && !stop) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).filter(_.size == 2)
          .foreach(p => pc((p(0), p(1))) += c)
      }
      if (pc.isEmpty) stop = true
      else {
        val best = pc.toSeq
          .minBy { case ((a, b), c) => (-c, s"$a $b") }._1
        merges += best
        vocab = vocab.map { case (s, c) => greedyMerge(s, best) -> c }
      }
    }
    def encode(w: String): Int =
      merges.foldLeft(w.split("").toVector)(greedyMerge).size
    val expected = docs.map { case (id, text, _) =>
      val ws = text.split(' ')
      (id, ws.length.toLong, ws.map(encode(_).toLong).sum)
    }.sortBy(_._1)

    val got = operators.Corpus.corpusBpeEncode(spark, dir.toString)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_bpe_tokens"))).toSeq.sortBy(_._1)
    assert(got == expected)
    // the merges must have genuinely compressed: fewer tokens than
    // chars, at least one token per word
    got.zip(docs.sortBy(_._1)).foreach { case ((_, nw, nt), (_, t, _)) =>
      assert(nt >= nw && nt < t.replace(" ", "").length)
    }
  }

  test("corpus_bpe_vocab_sweep equals the plain-Scala reference at " +
      "every budget — prefix application IS the k-merge tokenizer — " +
      "and the compression curve is monotone") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "banana banana banana bandana", "srcA"),
      (2L, "aaaa aa banana", "srcA"),
      (3L, "bandana band an a", "srcB"))
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_sweep")
    docs.toDF("doc_id", "text", "source")
      .write.parquet(dir.resolve("documents.parquet").toString)

    def greedyMerge(syms: Vector[String], m: (String, String)):
        Vector[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == m._1 && s == m._2)
          acc.dropRight(1) :+ (m._1 + m._2)
        else acc :+ s
      }
    val allWords: Seq[(String, Long)] = docs
      .flatMap(_._2.split(' ')).groupBy(identity)
      .map { case (w, ws) => w -> ws.size.toLong }.toSeq
    var vocab: Seq[(Vector[String], Long)] = allWords
      .filter(_._1.length >= 2)
      .map { case (w, c) => w.split("").toVector -> c }
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(String, String)]
    var stop = false
    while (merges.size < 8 && !stop) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).filter(_.size == 2)
          .foreach(p => pc((p(0), p(1))) += c)
      }
      if (pc.isEmpty) stop = true
      else {
        val best = pc.toSeq
          .minBy { case ((a, b), c) => (-c, s"$a $b") }._1
        merges += best
        vocab = vocab.map { case (s, c) => greedyMerge(s, best) -> c }
      }
    }
    def encodeAt(w: String, k: Int): Vector[String] =
      merges.take(k).foldLeft(w.split("").toVector)(greedyMerge)
    val expected = Seq(0, 2, 4, 8).map { k =>
      val enc = allWords.map { case (w, c) => (encodeAt(w, k), c) }
      val vs = enc.flatMap(_._1).distinct.size.toLong
      val tw = enc.map(_._2).sum
      val tt = enc.map { case (s, c) => s.size * c }.sum
      (k.toLong, vs, tw, tt,
        math.floor(tt.toDouble / tw.toDouble * 10000.0 + 0.5) / 10000.0)
    }
    val got = operators.Corpus.corpusBpeVocabSweep(spark, dir.toString)
      .collect()
      .map(r => (r.getAs[Long]("n_merges"), r.getAs[Long]("vocab_size"),
        r.getAs[Long]("total_words"), r.getAs[Long]("total_tokens"),
        r.getAs[Double]("tokens_per_word"))).toSeq
    assert(got == expected)
    // tokens/word is non-increasing in the merge budget (a merge can
    // only shrink encodings) and total_words is budget-invariant
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(b._5 <= a._5 && a._3 == b._3)
    }
    assert(got.head._4 > got.last._4, "8 merges must genuinely compress")
  }

  test("tokened budget/pack twins are the cum-sum of corpus_bpe_encode " +
      "counts — unit swapped, admission logic unchanged") {
    val enc = operators.Corpus.bpeDocTokens(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_bpe_tokens")))
    val bySource = enc.groupBy(_._2)
    val nSources = bySource.size.toLong
    val slice = 30000L / nSources
    val admitted = bySource.values.flatMap { rows =>
      val sorted = rows.sortBy(_._1)
      val cums = sorted.scanLeft(0L)(_ + _._3).tail
      sorted.zip(cums).takeWhile(_._2 <= slice).map(_._1._1)
    }.toSet
    val gotBudget = operators.Corpus
      .corpusTokenBudgetTokened(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(gotBudget == admitted && admitted.nonEmpty)

    val chunks = bySource.values.flatMap { rows =>
      val sorted = rows.sortBy(_._1)
      val cums = sorted.scanLeft(0L)(_ + _._3).tail
      sorted.zip(cums).map { case ((id, _, nt), cum) =>
        id -> (cum - nt) / 2048L
      }
    }.toMap
    val gotPack = operators.Corpus.packSequencesTokened(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("chunk")).toMap
    assert(gotPack == chunks)
    // the unit change is MATERIAL: some chunk boundary differs from
    // the whitespace-word packing (else the twin is a rename)
    val wordPack = operators.Corpus.packSequences(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("chunk")).toMap
    assert(gotPack != wordPack)
  }

  test("mix_domains_tokened keeps exactly the docs whose md5 draw beats " +
      "the token-mass rate; token-mass rates differ from doc-count rates") {
    val enc = operators.Corpus.bpeDocTokens(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("n_bpe_tokens")))
    val tokBySource = enc.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val tokMin = tokBySource.values.min
    def draw(id: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
    }
    val expect = enc.filter { case (id, src, _) =>
      draw(id) < tokMin.toDouble / tokBySource(src)
    }.map(_._1).toSet
    val got = operators.Corpus.mixDomainsTokened(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(got == expect && got.nonEmpty)
    // material unit change: some source's token-mass keep rate differs
    // from its doc-count keep rate (else the twin is a rename)
    val nBySource = enc.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nMin = nBySource.values.min
    assert(tokBySource.keys.exists(s =>
      math.abs(tokMin.toDouble / tokBySource(s) -
        nMin.toDouble / nBySource(s)) > 1e-9))
    // and every kept doc's source is represented (no source starves)
    val keptSources = enc.filter(e => got.contains(e._1)).map(_._2).toSet
    assert(keptSources == tokBySource.keySet)
  }

  test("text_oov_rate: vocab tokens cover total minus OOV, bounds hold") {
    val oov = operators.Corpus.textOovRate(spark, sf)
    val rows = oov.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("n_oov_distinct") <= r.getAs[Long]("n_oov"))
      val f = r.getAs[Double]("oov_frac")
      assert(f >= 0.0 && f <= 1.0)
    }
    // corpus-level conservation: sum(n_tokens - n_oov) == total
    // occurrences of the top-30 vocabulary tokens
    val toks = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    val vocabCover = toks.groupBy("tok").count()
      .orderBy(desc("count"), col("tok")).limit(30)
      .agg(sum("count")).head.getLong(0)
    val inVocab = rows.map(r =>
      r.getAs[Long]("n_tokens") - r.getAs[Long]("n_oov")).sum
    assert(inVocab == vocabCover)
  }

  test("corpus_token_budget: kept docs are exactly the within-cap prefix") {
    val kept = operators.Corpus.corpusTokenBudget(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(kept.nonEmpty)
    val nSources = Tables(spark, sf, "documents")
      .select("source").distinct().count()
    val cap = 10000L / nSources
    // independent reconstruction: running token sum per source in
    // doc_id order, keep while the doc ENDS within the cap
    val docs = Tables(spark, sf, "documents")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      var cum = 0L
      rows.sortBy(_._2).flatMap { case (_, id, n) =>
        cum += n
        if (cum <= cap) Some((src, id)) else None
      }
    }.toSet
    assert(kept == expect)
  }

  test("mix_domains: kept sets are balanced near the smallest source") {
    val docs = Tables(spark, sf, "documents")
    val minCount = docs.groupBy("source").count()
      .agg(min("count")).head.getLong(0)
    val kept = operators.Corpus.mixDomains(spark, sf)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.nonEmpty)
    kept.foreach { case (src, n) =>
      // deterministic binomial draw around minCount: allow 4-sigma slack
      val sigma = math.sqrt(minCount.toDouble)
      assert(math.abs(n - minCount) <= 4 * sigma + 1,
        s"$src kept $n vs target $minCount")
    }
    // the smallest source keeps (almost) everything: p_keep = 1
    val smallest = docs.groupBy("source").count()
      .orderBy("count").head.getString(0)
    val orig = docs.where(col("source") === smallest).count()
    assert(kept(smallest) == orig)
  }

  test("corpus_unigram_encode equals a plain-Scala Viterbi reference " +
      "(vocab learn + min-cost segmentation, lexicographic " +
      "(bits, pieces) composite), and multigram pieces engage") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "banana bandana ana a nana", "srcA"),
      (2L, "ban ana banana bananana", "srcA"),
      (3L, "dan and band banda na", "srcB"))
    val dir = java.nio.file.Files.createTempDirectory("graft_uni_enc")
    docs.toDF("doc_id", "text", "source")
      .write.parquet(dir.resolve("documents.parquet").toString)

    // ---- plain-Scala reference: weighted substring vocab + Viterbi
    val wc = docs.flatMap(_._2.split(' ')).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cand = scala.collection.mutable.Map.empty[String, Long]
    wc.foreach { case (w, c) =>
      for (l <- 1 to 4; i <- 0 to w.length - l)
        cand.updateWith(w.substring(i, i + l))(v =>
          Some(v.getOrElse(0L) + c))
    }
    val vocab = cand.filter(_._1.length == 1).toMap ++
      cand.filter(_._1.length >= 2).toSeq
        .sortBy { case (p, c) => (-c, p) }.take(24).toMap
    val nTot = vocab.values.sum
    val cost = vocab.map { case (p, c) =>
      p -> ((63L - java.lang.Long.numberOfLeadingZeros(nTot / c))
        * 1024L + 1L)
    }
    val inf = 1000000000000000L
    def vit(w: String): Long = {
      val dp = Array.fill(w.length + 1)(inf); dp(0) = 0L
      for (i <- 1 to w.length; l <- 1 to math.min(4, i))
        cost.get(w.substring(i - l, i)).foreach { cp =>
          if (dp(i - l) + cp < dp(i)) dp(i) = dp(i - l) + cp
        }
      dp(w.length)
    }
    val expect = docs.map { case (id, text, _) =>
      val dps = text.split(' ').filter(_.nonEmpty).map(vit)
      id -> ((dps.length.toLong, dps.map(_ % 1024).sum,
        dps.map(_ / 1024).sum))
    }.toMap

    val got = operators.Corpus
      .corpusUnigramEncode(spark, dir.toString).collect()
    assert(got.length == docs.length)
    got.foreach { r =>
      val (nw, nt, bits) = expect(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("n_words") == nw)
      assert(r.getAs[Long]("n_uni_tokens") == nt,
        s"doc ${r.getAs[Long]("doc_id")}: Viterbi token count diverged")
      assert(r.getAs[Long]("uni_bits") == bits)
    }
    // the vocabulary's multigrams must actually win segments: fewer
    // tokens than characters overall, else the dp is vacuously chars
    val totTok = got.map(_.getAs[Long]("n_uni_tokens")).sum
    val totChars = docs.flatMap(_._2.split(' ')).map(_.length).sum
    assert(totTok < totChars, "Viterbi never chose a multigram piece")
  }

  test("pack_sequences_binned: a plain-Scala BFD replay over the real " +
      "encoded sizes matches bin-for-bin; accounting identities hold; " +
      "a tiny capacity exercises the oversize leg") {
    val c2048 = 2048L
    val out = operators.Corpus.packSequencesBinned(spark, sf).collect()
    assert(out.nonEmpty)
    val dt = operators.Corpus.bpeDocTokens(spark, sf)
      .select("source", "doc_id", "n_bpe_tokens").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val bySource = dt.groupBy(_._1)
    out.foreach { r =>
      val s = r.getAs[String]("source")
      val docs = bySource(s).sortBy(_._2)
      var bins = 0L
      docs.grouped(128).foreach { shard =>
        val b = scala.collection.mutable.ArrayBuffer.empty[Long]
        shard.filter(_._3 <= c2048).sortBy(x => (-x._3, x._2))
          .foreach { case (_, _, nt) =>
            val fit = b.zipWithIndex.filter(_._1 >= nt)
            if (fit.nonEmpty) {
              val (v, i) = fit.minBy(x => (x._1, x._2)); b(i) = v - nt
            } else b += c2048 - nt
          }
        bins += b.length
      }
      val oversize = docs.filter(_._3 > c2048)
        .map(x => (x._3 + c2048 - 1) / c2048).sum
      assert(r.getAs[Long]("bins_bfd") == bins + oversize,
        s"source $s: BFD bin count diverged from the Scala replay")
      val total = docs.map(_._3).sum
      assert(r.getAs[Long]("total_tokens") == total)
      assert(r.getAs[Long]("padding_tokens") ==
        r.getAs[Long]("bins_bfd") * c2048 - total)
      assert(r.getAs[Long]("greedy_chunks") == (total + c2048 - 1) / c2048)
      // BFD never splits docs, so it can only pay MORE bins than the
      // doc-splitting greedy lower bound
      assert(r.getAs[Long]("bins_bfd") >= r.getAs[Long]("greedy_chunks"))
    }
    val tiny = operators.Corpus
      .packSequencesBinned(spark, sf, chunkTokens = 16, shardDocs = 8)
      .collect()
    assert(tiny.exists(_.getAs[Long]("n_oversized") > 0),
      "tiny-capacity run planted no oversized docs")
    tiny.foreach(r => assert(r.getAs[Long]("padding_tokens") >= 0L))
  }

  test("corpus_tokenizer_eval: per-source masses equal the sums of the " +
      "two per-doc encodes, ratios consistent, both families engage") {
    val ev = operators.Corpus.corpusTokenizerEval(spark, sf).collect()
    assert(ev.nonEmpty)
    val bpe = operators.Corpus.bpeDocTokens(spark, sf)
      .groupBy("source")
      .agg(sum("n_words").as("w"), sum("n_bpe_tokens").as("b"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    val uni = operators.Corpus.unigramDocTokens(spark, sf)
      .groupBy("source").agg(sum("n_uni_tokens").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    ev.foreach { r =>
      val s0 = r.getAs[String]("source")
      assert(r.getAs[Long]("n_words") == bpe(s0)._1)
      assert(r.getAs[Long]("n_bpe_tokens") == bpe(s0)._2)
      assert(r.getAs[Long]("n_uni_tokens") == uni(s0))
      val bt = r.getAs[Double]("bpe_tokens_per_word")
      val ut = r.getAs[Double]("uni_tokens_per_word")
      // both tokenizers compress below characters but stay >= 1
      // token/word; the cross-family ratio is their quotient
      assert(bt >= 1.0 && ut >= 1.0)
      assert(math.abs(r.getAs[Double]("uni_vs_bpe") -
        uni(s0).toDouble / bpe(s0)._2) < 1e-3)
    }
  }

  test("corpus_unigram_vocab_sweep equals a plain-Scala reference at " +
      "every budget (prefix vocab, per-budget re-costing), with the " +
      "char baseline exact at budget 0") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "banana bandana ana a nana", "srcA"),
      (2L, "ban ana banana bananana", "srcA"),
      (3L, "dan and band banda na", "srcB"))
    val dir = java.nio.file.Files.createTempDirectory("graft_uni_swp")
    docs.toDF("doc_id", "text", "source")
      .write.parquet(dir.resolve("documents.parquet").toString)
    // plain-Scala: candidates once, re-cost + Viterbi per budget
    val wc = docs.flatMap(_._2.split(' ')).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cand = scala.collection.mutable.Map.empty[String, Long]
    wc.foreach { case (w, c) =>
      for (l <- 1 to 4; i <- 0 to w.length - l)
        cand.updateWith(w.substring(i, i + l))(v =>
          Some(v.getOrElse(0L) + c))
    }
    val chars = cand.filter(_._1.length == 1).toSeq
    val multi = cand.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c, p) }
    val inf = 1000000000000000L
    def sweepAt(k: Int): (Long, Long, Long, Long) = {
      val vocab = chars ++ multi.take(k)
      val nTot = vocab.map(_._2).sum
      val cost = vocab.map { case (p, c) =>
        p -> ((63L - java.lang.Long.numberOfLeadingZeros(nTot / c))
          * 1024L + 1L)
      }.toMap
      def vit(w: String): Long = {
        val dp = Array.fill(w.length + 1)(inf); dp(0) = 0L
        for (i <- 1 to w.length; l <- 1 to math.min(4, i))
          cost.get(w.substring(i - l, i)).foreach { cp =>
            if (dp(i - l) + cp < dp(i)) dp(i) = dp(i - l) + cp
          }
        dp(w.length)
      }
      val stream = docs.flatMap(_._2.split(' ')).filter(_.nonEmpty)
      val dps = stream.map(vit)
      (vocab.size.toLong, stream.length.toLong,
        dps.map(_ % 1024).sum, dps.map(_ / 1024).sum)
    }
    val got = operators.Corpus
      .corpusUnigramVocabSweep(spark, dir.toString).collect()
    assert(got.map(_.getAs[Long]("n_multigrams")).toSeq ==
      Seq(0L, 8L, 16L, 24L))
    got.foreach { r =>
      val k = r.getAs[Long]("n_multigrams").toInt
      val (vs, tw, tt, tb) = sweepAt(k)
      assert(r.getAs[Long]("vocab_size") == vs)
      assert(r.getAs[Long]("total_words") == tw)
      assert(r.getAs[Long]("total_tokens") == tt,
        s"budget $k: token mass diverged")
      assert(r.getAs[Long]("total_bits") == tb)
    }
    // budget 0 is the character baseline: tokens == stream characters
    val chars0 = docs.flatMap(_._2.split(' ')).map(_.length.toLong).sum
    assert(got.head.getAs[Long]("total_tokens") == chars0)
    // a real multigram budget must compress below the char baseline
    assert(got.last.getAs[Long]("total_tokens") < chars0)
  }

  test("corpus_wordpiece_encode: a plain-Scala greedy longest-match " +
      "replay over the learned role-split vocabulary matches every " +
      "document's counts, and multigram pieces genuinely compress " +
      "below the character baseline") {
    val vocab = operators.Corpus.wordpieceVocab(spark, sf).toSet
    val ini = vocab.filterNot(_.startsWith("##"))
    val con = vocab.filter(_.startsWith("##"))
    assert(ini.size == 24 && con.size == 24,
      s"role-split top-24s expected, got ${ini.size}/${con.size}")
    assert(vocab.forall(p => p.replace("##", "").length >= 2))
    def encode(w: String): Long = {
      var pos = 0
      var cnt = 0L
      while (pos < w.length) {
        val pref = if (pos == 0) "" else "##"
        val l = (4 to 2 by -1).find(l => pos + l <= w.length &&
          vocab.contains(pref + w.substring(pos, pos + l))).getOrElse(1)
        pos += l
        cnt += 1
      }
      cnt
    }
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = operators.Corpus.corpusWordpieceEncode(spark, sf).collect()
    assert(out.length == docs.size)
    var tok = 0L
    var chars = 0L
    out.foreach { r =>
      val words = docs(r.getAs[Long]("doc_id")).split(" ")
        .filter(_.nonEmpty)
      val nwp = words.map(encode).sum
      assert(r.getAs[Long]("n_words") == words.length.toLong)
      assert(r.getAs[Long]("n_wp_tokens") == nwp,
        s"doc ${r.getAs[Long]("doc_id")}: greedy replay diverged")
      val tpw = math.floor(
        nwp.toDouble / words.length * 10000.0 + 0.5) / 10000.0
      assert(r.getAs[Double]("tokens_per_word") == tpw)
      tok += nwp
      chars += words.map(_.length.toLong).sum
    }
    assert(tok < chars, "multigram pieces never fired - vacuous vocab")
  }

  test("corpus_wordpiece_vocab_sweep: every budget equals a plain-Scala " +
      "greedy replay over the rank-prefix vocabulary, and budget 0 is " +
      "exactly the character baseline") {
    val (iniL, conL) = operators.Corpus.wordpieceVocabRanked(spark, sf)
    assert(iniL.size == 24 && conL.size == 24)
    val words = Tables(spark, sf, "documents")
      .select("text").collect().flatMap(_.getString(0).split(" "))
      .filter(_.nonEmpty)
    def encode(w: String, vocab: Set[String]): Long = {
      var pos = 0; var cnt = 0L
      while (pos < w.length) {
        val pref = if (pos == 0) "" else "##"
        val l = (4 to 2 by -1).find(l => pos + l <= w.length &&
          vocab.contains(pref + w.substring(pos, pos + l))).getOrElse(1)
        pos += l; cnt += 1
      }
      cnt
    }
    val out = operators.Corpus.corpusWordpieceVocabSweep(spark, sf)
      .collect().map(r => r.getAs[Long]("n_role_pieces") -> r).toMap
    assert(out.keySet == Set(0L, 8L, 16L, 24L))
    for (k <- Seq(0, 8, 16, 24)) {
      val vocab = (iniL.take(k) ++ conL.take(k)).toSet
      val tokens = words.map(encode(_, vocab)).sum
      val r = out(k.toLong)
      assert(r.getAs[Long]("total_words") == words.length.toLong, s"k=$k")
      assert(r.getAs[Long]("total_tokens") == tokens,
        s"k=$k: greedy replay diverged")
    }
    // budget 0: the single-char fallback IS the tokenizer
    assert(out(0L).getAs[Long]("total_tokens") ==
      words.map(_.length.toLong).sum)
    // the full budget genuinely compresses below the char baseline
    assert(out(24L).getAs[Long]("total_tokens") <
      out(0L).getAs[Long]("total_tokens"))
  }

  test("mix_temperature: a plain-Scala sqrt/decimal replay matches " +
      "every share, temperature shares sum to ~1, and smoothing " +
      "genuinely boosts below-average sources and trims above-average " +
      "ones") {
    val docs = Tables(spark, sf, "documents")
      .select("source", "text").collect()
      .filter(!_.isNullAt(1))
      .map(r => r.getString(0) -> r.getString(1).split(" ", -1).length.toLong)
    val mass = docs.groupBy(_._1).map { case (s, g) =>
      s -> g.map(_._2).sum }.toMap
    val tokTotal = mass.values.sum
    def dec12(x: Double) = BigDecimal(x).setScale(12,
      BigDecimal.RoundingMode.HALF_UP)
    val sq = mass.map { case (s, m) => s -> dec12(math.sqrt(m.toDouble)) }
    val sqTotal = sq.values.sum
    def r4d(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    val out = operators.Corpus.mixTemperature(spark, sf).collect()
    assert(out.length == mass.size)
    var shareSum = 0.0
    out.foreach { r =>
      val s = r.getAs[String]("source")
      assert(r.getAs[Long]("tokens") == mass(s), s)
      val raw = r4d(mass(s).toDouble / tokTotal.toDouble)
      val temp = r4d(sq(s).toDouble / sqTotal.toDouble)
      assert(r.getAs[Double]("raw_share") == raw, s"$s raw")
      assert(r.getAs[Double]("temp_share") == temp, s"$s temp")
      assert(r.getAs[Double]("boost") == r4d(sq(s).toDouble /
        sqTotal.toDouble / (mass(s).toDouble / tokTotal.toDouble)), s)
      shareSum += temp
      // the defining property of temperature smoothing
      val rawExact = mass(s).toDouble / tokTotal.toDouble
      val tempExact = sq(s).toDouble / sqTotal.toDouble
      if (rawExact < 1.0 / mass.size * 0.95)
        assert(tempExact > rawExact, s"$s not boosted")
      if (rawExact > 1.0 / mass.size * 1.05)
        assert(tempExact < rawExact, s"$s not trimmed")
    }
    assert(math.abs(shareSum - 1.0) < 1e-3)
  }
}
