package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants of the corpus-composition operators that the
  * DuckDB oracle can't express (it verifies value equality, not the
  * properties the construction promises). */
class CurationSpec extends SparkSpec {

  test("pipe_mixture: binding source saturates at 1.0, rates in (0,1], kept <= docs") {
    val out = Curation.pipeMixture(spark, sf).collect()
    assert(out.nonEmpty)
    val rates = out.map(_.getAs[Double]("rate"))
    // the scarcest-per-target source is never down-sampled...
    assert(rates.max == 1.0, "the binding source must saturate at rate 1.0")
    // ...and no rate escapes (0, 1]
    assert(rates.forall(r => r > 0.0 && r <= 1.0), s"rate out of range: ${rates.mkString(",")}")
    out.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"),
        s"source ${r.getAs[String]("source")} kept more docs than it has")
    }
  }

  test("dd_semdedup: each cell's minimum vec_id is never dropped (local-minima keep rule)") {
    val dropped = Similarity.ddSemdedup(spark, sf)
      .select(col("dropped").as("vec_id"))
    val cellMins = Similarity.ivfAssignment(spark, sf, 1)
      .groupBy("cell").agg(min(col("vec_id")).as("vec_id"))
      .select("vec_id")
    // a cell's global minimum has no lower-id cell-mate, so the greedy
    // rule can never drop it — the keep-list is provably non-empty per
    // occupied cell
    assert(cellMins.join(dropped, Seq("vec_id"), "left_semi").count() == 0)
  }

  test("cu_corpus_shuffle write path: shards never split across files, files sorted, corpus preserved") {
    import spark.implicits._
    val dir = "target/pipe/shard_write"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val docs = graft.sources.Tables.documents(spark, sf).select("doc_id", "n_chars")
    val n = 8
    Curation.shardAssign(docs, n)
      .repartition(n, col("shard"))
      .sortWithinPartitions("shard", "ord")
      .write.parquet(dir)

    val back = spark.read.parquet(dir)
      .select(input_file_name().as("file"), $"shard", $"ord", $"doc_id")
      .collect()
    // every shard lives wholly inside one file (a training reader can
    // fetch shard k without touching the others)
    val filesPerShard = back.groupBy(_.getAs[Long]("shard")).map(_._2.map(_.getAs[String]("file")).distinct.size)
    assert(filesPerShard.forall(_ == 1))
    // within each file, rows arrive in (shard, ord) order — the written
    // order IS the training read order
    back.groupBy(_.getAs[String]("file")).foreach { case (_, rows) =>
      val keys = rows.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("ord"))).toSeq
      assert(keys == keys.sorted)
    }
    // the shards partition the corpus: nothing lost, nothing duplicated
    assert(back.map(_.getAs[Long]("doc_id")).toSeq.sorted ==
      docs.select("doc_id").as[Long].collect().toSeq.sorted)
    // determinism: re-deriving the assignment yields the identical permutation
    val a1 = Curation.shardAssign(docs, n).select("doc_id", "shard", "ord").collect().toSet
    val a2 = Curation.shardAssign(docs.repartition(3), n).select("doc_id", "shard", "ord").collect().toSet
    assert(a1 == a2)
  }

  test("cu_token_budget: budgets partition the global budget, greedy fill never overshoots") {
    val out = Curation.cuTokenBudget(spark, sf).collect()
    assert(out.nonEmpty)
    // per-source budgets are rounded shares of 100k: the sum can drift
    // from the target only by cumulative rounding, < 0.5 per source
    val totalBudget = out.map(_.getAs[Long]("budget")).sum
    assert(math.abs(totalBudget - 100000L) <= out.length,
      s"budget shares sum to $totalBudget, expected ~100000")
    out.foreach { r =>
      assert(r.getAs[Long]("tokens_selected") <= r.getAs[Long]("budget"),
        s"source ${r.getAs[String]("source")} overshot its budget")
      assert(r.getAs[Double]("fill_rate") <= 1.0)
    }
  }

  test("cu_domain_cap: kept never exceeds the cap and kept+dropped partitions each domain") {
    val out = Curation.cuDomainCap(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= 40L)
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped") == r.getAs[Long]("n_docs"))
    }
  }

  test("cu_winsorize: thresholds ordered, winsorized sum bounded by the clip interval") {
    val out = Curation.cuWinsorize(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (lo, hi, n) = (r.getAs[Long]("p05"), r.getAs[Long]("p95"), r.getAs[Long]("n_docs"))
      assert(lo <= hi)
      val sw = r.getAs[Long]("sum_winsor")
      assert(sw >= n * lo && sw <= n * hi,
        s"winsorized sum $sw outside [$n*$lo, $n*$hi]")
      assert(r.getAs[Long]("n_clipped") <= n)
    }
  }

  test("cu_importance_sample: kept is a subsample and rates are proper probabilities") {
    val out = Curation.cuImportanceSample(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      val er = r.getAs[Double]("expected_rate")
      assert(er > 0.0 && er <= 1.0, s"expected_rate $er out of (0,1]")
      assert(r.getAs[Double]("keep_rate") >= 0.0 && r.getAs[Double]("keep_rate") <= 1.0)
    }
  }

  test("cu_epoch_plan: allocations cover 4x the corpus, caps bind exactly where alloc exceeds 4 epochs") {
    val out = Curation.cuEpochPlan(spark, sf).collect()
    assert(out.nonEmpty)
    val totalU = out.map(_.getAs[Long]("u_tokens")).sum
    val totalAlloc = out.map(_.getAs[Long]("alloc")).sum
    // each per-source alloc rounds once: the sum is within n_sources/2 of 4T
    assert(math.abs(totalAlloc - 4L * totalU) <= out.length,
      s"allocs $totalAlloc stray from 4x corpus ${4L * totalU}")
    out.foreach { r =>
      val u = r.getAs[Long]("u_tokens")
      val alloc = r.getAs[Long]("alloc")
      val epochs = r.getAs[Long]("epochs")
      val served = r.getAs[Long]("served")
      val deficit = r.getAs[Long]("deficit")
      assert(epochs >= 0L && epochs <= 4L)
      assert(served <= alloc && served <= 4L * u)
      assert(deficit === alloc - served && deficit >= 0L)
      // a deficit exists exactly when the repetition cap binds
      assert((deficit > 0L) === (alloc > 4L * u),
        s"${r.getAs[String]("source")}: deficit/cap inconsistency")
    }
    // the temperature upweighting must make the cap bind somewhere on
    // the fixture, else the entry is vacuous
    assert(out.exists(_.getAs[Long]("deficit") > 0L), "no source hit the epoch cap")
  }

  test("cu_dp_counts: release is deterministic, non-negative, within the capped-noise envelope") {
    val rel = Curation.cuDpCounts(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) -> r.getAs[Long]("released"))
      .toMap
    val truth = graft.sources.Tables.documents(spark, sf)
      .groupBy("lang", "source").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) -> r.getAs[Long]("n"))
      .toMap
    assert(rel.keySet === truth.keySet, "release must cover exactly the true cells")
    rel.foreach { case (cell, v) =>
      assert(v >= 0L, s"$cell released a negative count")
      // two-sided geometric capped at 17 per draw: |noise| <= 17, plus the
      // floor at 0 can only shrink the deviation further
      assert(math.abs(v - truth(cell)) <= 17L,
        s"$cell deviates by more than the capped noise: $v vs true ${truth(cell)}")
    }
    // keyed-hash noise: a second evaluation is bit-identical
    val again = Curation.cuDpCounts(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) -> r.getAs[Long]("released"))
      .toMap
    assert(again === rel, "DP release must be reproducible (keyed hash, not a PRNG)")
    // the mechanism is actually perturbing: at least one cell moved
    assert(rel.exists { case (c, v) => v != truth(c) }, "noise must not be identically zero")
  }
}
