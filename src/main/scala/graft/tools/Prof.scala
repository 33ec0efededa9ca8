package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiling harness: times sub-plans of the heavy operators so
  * optimization targets facts, not guesses. Run:
  * java -cp ... graft.tools.Prof [sfDir] */
object Prof {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // session config mirrors Verify/Bench — the audited plans must be
    // the plans the gates run (Prof without the extensions could not
    // even resolve vec_dot/hash_embed, caught by the r11 plan audit)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      // Sort-based shuffle writer for EVERY exchange (r14, SCALE.md
      // round-14): the default bypassMergeThreshold=200 routes <=200-
      // partition shuffles through the per-reducer-file writer — one
      // file create per (map task x reducer), which on this host's
      // filesystem dominated the dd_* map stages (dd_containment x100n:
      // 11-30 s bypass vs 2.8-4.7 s sort writer, non-monotonic in the
      // partition count because 183 vs 276 straddled the threshold).
      // The single-spill-file sort writer is also the only writer that
      // exists at real cluster reducer counts.
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.operators.Corpus.prime(spark, sf)
    spark.conf.set("spark.sql.shuffle.partitions",
      graft.operators.Corpus.shufflePartitions(spark, sf).toString)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    if (args.contains("plans")) { auditPlans(spark, sf); spark.stop(); return }
    // `Prof <sf> plan <query>`: execute ONE SparkEntry query and print
    // its AQE-finalized physical plan (the 100 TB plan audit, per query)
    val planIx = args.indexOf("plan")
    if (planIx >= 0 && args.length > planIx + 1) {
      val name = args(planIx + 1)
      val df = graft.SparkEntry.queries(name)(spark, sf)
      df.write.mode("overwrite").format("noop").save()
      println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0))
      spark.stop(); return
    }
    spark.range(100).count()
    val sh = graft.functions.Text.shingled(spark, sf)
    t("shingled.count")(sh.count())
    t("shingled.count2")(sh.count())
    val prefix = sh.withColumn("pfx", expr(
      "slice(array_sort(transform(sh, s -> md5(s))), 1, size(sh) - ((size(sh) * 4 + 4) div 5) + 1)"))
      .select(col("doc_id"), explode(col("pfx")).as("g"))
    t("prefix.count")(prefix.count())
    val cand = prefix.as("a").join(prefix.as("b"),
      col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    t("cand.count")(cand.count())
    t("ngram.full")(graft.operators.Dedup.ddNgramJaccard(spark, sf).count())
    t("simhash.full")(graft.operators.Dedup.ddSimhash(spark, sf).count())
    t("minhash.full")(graft.operators.Dedup.ddMinhashLsh(spark, sf).count())
    spark.stop()
  }

  /** `Prof <sf> plans`: physical-plan shape stats for the round-3
    * queries — scan/exchange/codegen counts, the facts behind the
    * "is this the plan you'd want at 100 TB" audit. */
  private def auditPlans(spark: SparkSession, sf: String): Unit = {
    // finalized (post-collect) plan string, Initial Plan echo stripped
    def finalPlan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    def stats(name: String, df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      // execute THIS dataset's QueryExecution so AQE finalizes and the
      // printed plan is the one that actually ran (pre-execution the
      // AdaptiveSparkPlan hides codegen spans and runtime join picks)
      df.collect()
      val p = finalPlan(df)
      def n(pat: String) = pat.r.findAllIn(p).size
      // every operator inside a span carries the "*(id)" marker, so
      // spans = DISTINCT stage ids, not marker occurrences
      val spans = """\*\((\d+)\)""".r.findAllMatchIn(p).map(_.group(1)).toSet.size
      println(f"$name%-20s parquetScans=${n("Scan parquet")}%2d cacheScans=${n("InMemoryTableScan")}%2d " +
        f"exchanges=${n("Exchange")}%2d wholestageSpans=$spans%2d " +
        f"final=${p.contains("isFinalPlan=true")}")
      df
    }
    stats("dd_embed_cosine", graft.operators.Similarity.ddEmbedCosine(spark, sf))
    stats("ml_score_gbt", graft.operators.MlScore.mlScoreGbt(spark, sf))
    stats("ann_ivf", graft.operators.Similarity.annIvf(spark, sf))
    stats("dd_ngram_jaccard", graft.operators.Dedup.ddNgramJaccard(spark, sf))
    val adc = stats("ann_pq_adc", graft.operators.Pq.annPqAdc(spark, sf))
    stats("ann_pq_rerank", graft.operators.Pq.annPqRerank(spark, sf))
    stats("op_resample_ffill", graft.operators.Events.opResampleFfill(spark, sf))
    stats("op_fuzzy_join", graft.operators.Curation.opFuzzyJoin(spark, sf))
    stats("ta_repetition", graft.operators.TextAnalysis.taRepetition(spark, sf))
    stats("dd_semdedup", graft.operators.Similarity.ddSemdedup(spark, sf))
    val q5 = stats("q5_local_supplier", graft.operators.Relational.q5LocalSupplier(spark, sf))
    // round-4 additions: the TPC-H shapes with multi-way fact self-joins
    // or decorrelated subqueries, plus the new text/merge operators
    stats("q2_min_cost", graft.operators.Tpch.q2MinCost(spark, sf))
    stats("q8_mktshare", graft.operators.Tpch.q8MktShare(spark, sf))
    stats("q9_profit", graft.operators.Tpch.q9Profit(spark, sf))
    val q21 = stats("q21_waiting", graft.operators.Tpch.q21Waiting(spark, sf))
    stats("ta_tfidf", graft.operators.TextAnalysis.taTfidf(spark, sf))
    stats("dd_span_dedup", graft.operators.Curation.ddSpanDedup(spark, sf))
    stats("op_upsert_merge", graft.operators.Curation.opUpsertMerge(spark, sf))
    // journey/SCD2/hybrid additions: funnel must chain user_id shuffles
    // (no fresh exchange per stage beyond the events-side one), scd2 is
    // a single exchange + two window passes, hybrid's joins are bounded
    val fun = stats("ev_funnel", graft.operators.Journeys.evFunnel(spark, sf))
    stats("ev_retention", graft.operators.Journeys.evRetention(spark, sf))
    stats("op_scd2", graft.operators.Journeys.opScd2(spark, sf))
    stats("ann_rrf_hybrid", graft.operators.Similarity.annRrfHybrid(spark, sf))
    stats("gr_pagerank", graft.operators.Graph.grPagerank(spark, sf))
    stats("gr_triangles", graft.operators.Graph.grTriangles(spark, sf))
    stats("gr_link_predict", graft.operators.Graph.grLinkPredict(spark, sf))
    stats("dd_containment", graft.operators.Dedup.ddContainment(spark, sf))
    stats("cu_dsir_weights", graft.operators.Curation.cuDsirWeights(spark, sf))
    stats("ta_lm_fluency", graft.operators.TextAnalysis.taLmFluency(spark, sf))
    println("\n-- ev_funnel full plan (user_id partitioning reused across stages?) --")
    println(finalPlan(fun).take(4000))
    println("\n-- q5_local_supplier full plan (pushdowns + join strategies) --")
    println(finalPlan(q5).take(6000))
    println("\n-- q21_waiting full plan (semi/anti self-joins must be hash, one lineitem scan reused) --")
    println(finalPlan(q21).take(5000))
    println("\n-- ann_pq_adc full plan (is the probe table the broadcast side?) --")
    println(finalPlan(adc).take(4000))
  }
}
