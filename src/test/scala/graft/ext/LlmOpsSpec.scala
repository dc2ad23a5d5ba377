package graft.ext

import org.apache.spark.sql.functions.col

import graft.SparkSuite

/** Semantics tests for the LLM-data operators: dedup finds exactly the
  * injected duplicates, LSH surfaces the injected near-dups with high
  * Jaccard, similarity ranking is ordered, and the decode plumbing
  * produces the deterministic stub features.
  */
class LlmOpsSpec extends SparkSuite {

  test("exact dedup: injected copies collapse onto the lowest doc_id") {
    val out = Dedup.qDocExactDedup(spark, sf).collect()
    val copies = out.filter(_.getAs[Long]("n_copies") > 1)
    // every doc_id % 7 == 0 was re-injected → exactly those have 2 copies
    assert(copies.forall(r => r.getAs[Long]("n_copies") === 2 &&
      r.getAs[Long]("keep_doc_id") % 7 === 0))
    assert(copies.length > 0)
    assert(out.map(_.getAs[Long]("keep_doc_id")).distinct.length === out.length)
  }

  test("minhash LSH: every injected near-dup pair surfaces with high Jaccard") {
    val pairs = Dedup.qDocMinhashPairs(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("jaccard")))
    val injected = pairs.filter { case (a, b, _) => b === a + 100000 }
    // EVERY doc_id divisible by 25 was re-injected with an appended suffix
    // and must come back as a candidate that survives Jaccard verification
    val sources = Dedup.qDocExactDedup(spark, sf).count() // 500 docs
    assert(injected.length === (0 until sources.toInt).count(_ % 25 == 0))
    assert(injected.forall { case (a, _, j) => a % 25 === 0 && j >= 0.75 })
    assert(pairs.forall { case (a, b, j) => a < b && j >= Dedup.jaccardThreshold && j <= 1.0 })
  }

  test("simhash: deterministic 16-bit signatures") {
    val s1 = Dedup.qDocSimhash(spark, sf).collect().map(r => r.getLong(0) -> r.getLong(1))
    val s2 = Dedup.qDocSimhash(spark, sf).collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(s1.toSeq === s2.toSeq)
    assert(s1.forall { case (_, h) => h >= 0 && h < (1L << Dedup.simhashBits) })
  }

  test("cosine top-k: per-query ranks are descending in cosine, k rows each") {
    val rows = Similarity.qEmbCosineTopk(spark, sf).collect()
    assert(rows.length === Similarity.nQueryVecs * Similarity.topK)
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(byRank.zip(byRank.tail).forall { case (hi, lo) => hi >= lo })
      assert(byRank.forall(c => c >= -1.0000001 && c <= 1.0000001))
    }
  }

  test("ANN LSH: results are a subset of each query's bucket, never beat brute force") {
    val brute = Similarity.qEmbCosineTopk(spark, sf).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Double]("cosine")).max }
    val ann = Similarity.qEmbAnnLsh(spark, sf).collect()
    assert(ann.nonEmpty)
    ann.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      // one bucket per query by construction
      assert(rs.map(_.getAs[Int]("bucket")).distinct.length === 1)
      // approximate top-1 can't exceed the exact top-1
      assert(rs.map(_.getAs[Double]("cosine")).max <= brute(q) + 1e-12)
    }
  }

  test("media decode: stub features are deterministic and sized") {
    val out = Multimodal.qMmDecode(spark, sf).collect()
    assert(out.length === 500)
    assert(out.forall(_.getAs[Long]("n_bytes") === 32L))
    assert(out.forall(_.getAs[Long]("feature64") >= 0L))
    assert(out.map(_.getAs[String]("media_type")).toSet === Set("image", "audio", "video"))
  }

  test("sample assembly: budget arithmetic per modality, coverage flag honest") {
    val out = Multimodal.qMmSampleAssembly(spark, sf).collect()
    val docs = graft.model.Tables.documents(spark, sf).count()
    val embIds = graft.model.Tables.embeddings(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(out.length === docs)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("total_tokens") ===
        r.getAs[Long]("text_tokens") + r.getAs[Long]("media_tokens"))
      assert(r.getAs[Boolean]("has_embedding") === embIds(id))
      r.getAs[String]("media_type") match {
        case "audio" => assert(r.getAs[Long]("media_tokens") === Multimodal.audioTokens)
        case "image" =>
          // 224-fit output → at most ceil(224/16)^2 = 196 patches
          assert(r.getAs[Long]("media_tokens") <= 196L && r.getAs[Long]("media_tokens") >= 1L)
        case "video" =>
          // ≤ 15 sampled frames × ≤ 196 patches
          assert(r.getAs[Long]("media_tokens") <= 15L * 196L)
      }
      assert(r.getAs[Boolean]("fits_budget") ===
        (r.getAs[Long]("total_tokens") <= Multimodal.sampleBudget))
    }
  }

  test("phash dedup: banding is EXACT vs local brute-force hamming; twins all found") {
    import org.apache.spark.sql.functions.{conv, expr, max, sha2, substring}
    val out = Multimodal.qMmPhashDedup(spark, sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Int]("hamming")))
    val base = graft.model.Tables.documents(spark, sf)
      .select(col("doc_id"),
        conv(substring(sha2(col("text"), 256), 1, 15), 16, 10).cast("long").as("ph"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val off = base.map(_._1).max + 1
    val codes = base ++ base.collect { case (id, ph) if id % 7 == 0 =>
      (id + off, ph ^ ((1L << (id * 13 % 60).toInt) | (1L << (id * 29 % 60).toInt)))
    }
    // exhaustive all-pairs hamming — the oracle banding must match exactly
    val brute = (for {
      (a, pa) <- codes; (b, pb) <- codes if a < b
      h = java.lang.Long.bitCount(pa ^ pb) if h <= Multimodal.phashMaxHamming
    } yield (a, b, h)).toSet
    assert(out.toSet === brute)
    // every planted twin pair present, at its planted distance (2 bit
    // flips; 1 when both flip positions coincide)
    base.filter(_._1 % 7 == 0).foreach { case (id, _) =>
      val found = out.find(p => p._1 == id && p._2 == id + off)
      assert(found.nonEmpty, s"twin of $id missing")
      assert(found.get._3 === (if (id * 13 % 60 == id * 29 % 60) 1 else 2))
    }
    assert(out.nonEmpty)
  }

  test("blockhash dedup: byte-space replay; planted re-encodes flagged, exact dups subsumed") {
    def blockhash(bytes: Array[Int]): Long = {
      val thr = bytes.sorted.apply(bytes.length / 2 - 1)
      bytes.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
        if (v >= thr) acc | (1L << i) else acc
      }
    }
    val texts = graft.model.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def payload(t: String): Array[Int] =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(t.getBytes("UTF-8")).map(_ & 0xFF)
    val off = texts.map(_._1).max + 1
    // the full byte-space replay: base payloads, +3-brightness re-encodes
    // (every 7th), exact copies (every 11th) — hash AFTER the perturbation
    val codes = texts.map { case (id, t) => id -> blockhash(payload(t)) } ++
      texts.collect { case (id, t) if id % 7 == 0 =>
        (id + off) -> blockhash(payload(t).map(b => (b + Multimodal.blockhashShift) % 256))
      } ++
      texts.collect { case (id, t) if id % 11 == 0 =>
        (id + 2 * off) -> blockhash(payload(t))
      }
    val brute = (for {
      (a, pa) <- codes; (b, pb) <- codes if a < b
      h = java.lang.Long.bitCount(pa ^ pb) if h <= Multimodal.phashMaxHamming
    } yield (a, b, h, h == 0)).toSet
    val out = Multimodal.qMmBlockhashDedup(spark, sf).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Int]("hamming"), r.getAs[Boolean]("is_exact"))).toSet
    // the mining is EXACT at its radius: banding+verify == brute force
    assert(out === brute)
    // exact duplicates are subsumed at hamming 0, every one of them
    texts.filter(_._1 % 11 == 0).foreach { case (id, _) =>
      assert(out.contains((id, id + 2 * off, 0, true)), s"exact dup of $id missing")
    }
    // planted re-encodes: found IFF within the radius (threshold-drift
    // pushes a small tail past it — the documented recall knob), and the
    // radius captures ≥ 90% of them on this corpus
    val twins = texts.filter(_._1 % 7 == 0).map(_._1)
    val found = twins.count(id => out.exists(p => p._1 == id && p._2 == id + off))
    assert(found.toDouble / twins.length >= 0.9,
      s"re-encode recall ${found}/${twins.length} below 90%")
    twins.foreach { id =>
      val h = java.lang.Long.bitCount(
        codes.toMap.apply(id) ^ codes.toMap.apply(id + off))
      assert(out.exists(p => p._1 == id && p._2 == id + off) ===
        (h <= Multimodal.phashMaxHamming), s"twin of $id: radius disagreement")
    }
  }

  test("blockhash: payloads past 64 bytes reduce to 32 block means — no bit-shift wrap") {
    import spark.implicits._
    // 128-byte ramp payload: under the pre-fix 1L << i packing, bytes 64+
    // would wrap (i mod 64) and OR unrelated positions into the code
    val big = Array.tabulate(128)(i => ((i * 7 + 3) % 256).toByte)
    val small = Array.tabulate(32)(i => ((i * 11 + 5) % 256).toByte)
    val ds = spark.createDataset(Seq(
      MediaRecord(1L, big, "image", 16, 16),
      MediaRecord(2L, small, "image", 16, 16)))
    val got = Multimodal.blockhashOf(ds).collect().map(h => h.doc_id -> h.blockhash).toMap
    def hashOf(px: Array[Int]): Long = {
      val thr = px.sorted.apply(px.length / 2 - 1)
      px.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
        if (v >= thr) acc | (1L << i) else acc
      }
    }
    // expected: 32 contiguous-range floor means, then the usual threshold
    val raw = big.map(_ & 0xFF)
    val means = Array.tabulate(32) { i =>
      val lo = i * raw.length / 32; val hi = (i + 1) * raw.length / 32
      raw.slice(lo, hi).sum / (hi - lo)
    }
    assert(got(1L) === hashOf(means))
    // all bits land in the 32-block range: bits 32..63 must be zero
    assert((got(1L) >>> 32) === 0L, "blockhash leaked past bit 31")
    // ≤64-byte payloads keep the historical byte-direct code unchanged
    assert(got(2L) === hashOf(small.map(_ & 0xFF)))
  }

  test("text stats: token invariants hold") {
    val rows = TextOps.qDocTextStats(spark, sf).collect()
    assert(rows.forall { r =>
      r.getAs[Long]("n_distinct_tokens") <= r.getAs[Long]("n_tokens") &&
        r.getAs[Long]("n_subword_tokens") >= r.getAs[Long]("n_tokens") &&
        r.getAs[Double]("avg_token_len") > 0.0
    })
  }

  test("weighted sampling: deterministic, weights in (0,1], keep rate tracks the weights") {
    val once = TextOps.qDocSampleWeighted(spark, sf).collect()
    val twice = TextOps.qDocSampleWeighted(spark, sf).collect()
    assert(once.map(_.getAs[Long]("doc_id")).toSeq === twice.map(_.getAs[Long]("doc_id")).toSeq)
    assert(once.nonEmpty)
    assert(once.forall { r =>
      val w = r.getAs[Double]("weight"); w > 0.0 && w <= 1.0
    })
    // the sample is a weight-proportional subset, never the whole corpus
    val n = graft.model.Tables.documents(spark, sf).count()
    assert(once.length < n)
  }

  test("vocab induction: top-k by tf, df <= tf, df <= corpus size, descending tf") {
    val rows = TextOps.qDocVocab(spark, sf).collect()
    val n = graft.model.Tables.documents(spark, sf).count()
    val vocabSize = graft.model.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(col("text"), " ")).as("t"))
      .distinct().count()
    assert(rows.length === math.min(TextOps.vocabTopK.toLong, vocabSize))
    val tfs = rows.map(_.getAs[Long]("tf"))
    assert(tfs.zip(tfs.tail).forall { case (hi, lo) => hi >= lo })
    assert(rows.forall(r => r.getAs[Long]("df") <= r.getAs[Long]("tf") &&
      r.getAs[Long]("df") <= n && r.getAs[Long]("df") >= 1))
  }

  test("bigram LM: probabilities are well-formed means over every multi-token doc") {
    val rows = TextOps.qDocBigramLm(spark, sf).collect()
    assert(rows.forall { r =>
      val p = r.getAs[Double]("avg_bigram_p")
      p > 0.0 && p <= 1.0 && r.getAs[Long]("n_bigrams") >= 1
    })
    // self-trained model property: a bigram that appears once under a
    // unique w1 has p = 1; average over a doc can only be <= 1
    assert(rows.length === graft.model.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(col("text"), " ")) >= 2).count())
  }

  test("tf-idf: k rows per doc, scores descend within doc, rare terms beat stopwords") {
    val rows = TextOps.qDocTfidf(spark, sf).collect()
    val n = graft.model.Tables.documents(spark, sf).count()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.size === n, "every document must produce a top-k group")
    assert(byDoc.values.forall(_.length <= TextOps.tfidfTopK))
    // within each doc the native top-k must agree with the (score DESC,
    // term ASC) order it was asked for
    assert(byDoc.values.forall { g =>
      val ordered = g.map(r => (-r.getAs[Double]("score"), r.getAs[String]("term")))
      ordered.zip(ordered.tail).forall { case (a, b) =>
        a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2)
      }
    })
    // idf sanity: within a doc, among terms with equal tf, the winner by
    // score is the one with the LOWER document frequency
    assert(rows.forall { r =>
      r.getAs[Long]("df") >= 1 && r.getAs[Long]("df") <= n &&
        r.getAs[Double]("score") > 0.0
    })
  }

  test("postings: term head and tf counts match a local index build") {
    import org.apache.spark.sql.functions.col
    val out = TextOps.qDocPostings(spark, sf).collect()
    val docs = graft.model.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" "))
    val df = docs.flatMap { case (id, ts) => ts.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.length).toMap
    val head = df.toSeq.sortBy { case (t, d) => (-d, t) }
      .take(TextOps.postingsTerms).map(_._1).toSet
    assert(out.map(_.getAs[String]("term")).toSet === head)
    val tf = docs.flatMap { case (id, ts) => ts.filter(head).map(t => (t, id)) }
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(out.length === tf.size)
    out.foreach { r =>
      val key = (r.getAs[String]("term"), r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("tf") === tf(key).toLong, key)
      assert(r.getAs[Long]("df") === df(key._1).toLong)
    }
  }

  test("vocab coverage: cumulative head shares match a local count, monotone, bounded") {
    import org.apache.spark.sql.functions.col
    val out = TextOps.qDocVocabCoverage(spark, sf).collect()
    assert(out.length === TextOps.coverageTopK)
    val counts = graft.model.Tables.documents(spark, sf)
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ", -1))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = counts.values.sum
    val head = counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(TextOps.coverageTopK)
    var cum = 0L
    out.zip(head).zipWithIndex.foreach { case ((r, (tok, n)), i) =>
      assert(r.getAs[Int]("rank") === i + 1)
      assert(r.getAs[String]("token") === tok)
      assert(r.getAs[Long]("tf") === n)
      cum += n
      assert(r.getAs[Double]("cum_share") === cum.toDouble / total)
    }
    // shares are a monotone curve inside (0, 1]
    val shares = out.map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => b >= a })
    assert(shares.last <= 1.0 && shares.head > 0.0)
  }

  test("bm25: top-20 matches a bit-exact local recompute in term-fold order") {
    val out = TextOps.qDocBm25(spark, sf).collect()
    assert(out.length <= TextOps.bm25TopDocs)
    // local full recompute, mirroring the query's exact arithmetic: the
    // rational (N+1)/(df+1) idf, the k1/b saturation, and the per-doc sum
    // folded in ASCENDING TERM ORDER (the query folds
    // array_sort(struct(term, score)) left-to-right)
    val docs = graft.model.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" "))
    val n = docs.length
    val tf = docs.map { case (id, ts) =>
      id -> ts.groupBy(identity).view.mapValues(_.length.toLong).toMap
    }.toMap
    val df = docs.flatMap { case (_, ts) => ts.distinct }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val dl = tf.view.mapValues(_.values.sum).toMap
    val avgdl = dl.values.sum.toDouble / dl.size.toDouble
    val qterms = df.toSeq.sortBy { case (t, d) => (-d, t) }
      .take(TextOps.bm25QueryTerms).map(_._1)
    val scored = tf.toSeq.flatMap { case (id, terms) =>
      val matched = qterms.filter(terms.contains).sorted
      if (matched.isEmpty) None
      else {
        var acc = 0.0
        matched.foreach { t =>
          val idf = (n + 1).toDouble / (df(t) + 1).toDouble
          val sat = (terms(t).toDouble * (1.0 + TextOps.bm25K1)) /
            (terms(t).toDouble + TextOps.bm25K1 *
              ((1.0 - TextOps.bm25B) + TextOps.bm25B * (dl(id).toDouble / avgdl)))
          acc += idf * sat
        }
        Some((id, matched.length.toLong, acc))
      }
    }
    val expect = scored.sortBy { case (id, _, s) => (-s, id) }
      .take(TextOps.bm25TopDocs)
    assert(out.length === expect.length)
    out.zip(expect).foreach { case (r, (id, m, s)) =>
      assert(r.getAs[Long]("doc_id") === id)
      assert(r.getAs[Long]("n_matched") === m)
      assert(r.getAs[Double]("bm25") === s, s"doc $id")
    }
  }
}
