package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.sources.Tables

/** ML data-preparation operators — the feature-engineering steps a
  * training pipeline runs between curation and the trainer (the
  * reference stops at curated parquet; these are the canonical next
  * stage every large-scale pipeline adds on top).
  *
  * All four are engine-portable by construction: hashing is the
  * md5-derived 60-bit uniform ([[Text.hash60SparkSql]]), money math is
  * exact integer cents until one final division, and bin assignment is
  * rank-based with explicit tie-breaks — so DuckDB reproduces every
  * value bit-for-bit and the driver gate hash-verifies them.
  */
object MlPrep {

  /** Deterministic train/validation/test split (80/10/10): the
    * assignment is a pure function of the row key (md5 bucket, not
    * `rand()`), so it is stable under retries, repartitioning, cluster
    * size and incremental reruns — the property that makes a 100 TB
    * split reproducible without materializing membership lists. One
    * map-side expression + one aggregate-sized shuffle for the
    * readout; the split itself adds zero data movement. */
  def mlSplit(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("b",
        expr(s"${Text.hash60SparkSql("concat('split:', cast(doc_id as string))")} % 10"))
      .withColumn("split",
        when(col("b") < 8, "train").when(col("b") === 8, "validation").otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(expr("doc_id % 9973")).as("docid_check"),
        sum(col("n_chars")).as("sum_chars"))
      .withColumn("avg_chars", col("sum_chars").cast("double") / col("n_docs"))
      .orderBy("split")

  private val mlSplitSql: String =
    s"""SELECT split, count(*)::BIGINT AS n_docs,
       |  sum(doc_id % 9973)::BIGINT AS docid_check,
       |  sum(n_chars)::BIGINT AS sum_chars,
       |  sum(n_chars)::DOUBLE / count(*) AS avg_chars
       |FROM (SELECT *,
       |    CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'validation' ELSE 'test' END AS split
       |  FROM (SELECT *, ${Text.hash60DuckSql("'split:' || doc_id::VARCHAR")} % 10 AS b
       |        FROM documents))
       |GROUP BY split ORDER BY split""".stripMargin

  /** Feature hashing (the "hashing trick"): project an unbounded token
    * vocabulary onto a fixed 64-bucket feature space with a content
    * hash — no vocabulary build, no dictionary broadcast, the standard
    * way to featurize text at corpus scale. The readout is the
    * collision profile per bucket (total hits, distinct tokens mapped
    * there), which is both the correctness surface and the audit a
    * practitioner runs before trusting hashed features. Explode +
    * one hash-keyed aggregation: a single shuffle on the 64 buckets
    * (map-side combine shrinks it to 64 rows per task first). */
  def mlFeatureHash(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .withColumn("bucket", expr(s"${Text.hash60SparkSql("concat('fh:', tok)")} % 64"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_hits"),
        countDistinct(col("tok")).as("n_distinct_tokens"))
      .orderBy("bucket")

  private val mlFeatureHashSql: String =
    s"""SELECT bucket, count(*)::BIGINT AS n_hits,
       |  count(DISTINCT tok)::BIGINT AS n_distinct_tokens
       |FROM (SELECT tok, ${Text.hash60DuckSql("'fh:' || tok")} % 64 AS bucket
       |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
       |  WHERE len(tok) > 0)
       |GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Smoothed target encoding: replace a categorical with the
    * shrunk-toward-prior mean of the target (smoothing m=10), the
    * standard high-cardinality categorical encoder. Money stays exact
    * integer cents through the AGGREGATES; the encoded value
    * `(sum·N_g + m·S_g) / ((n+m)·N_g·100)` evaluates in the DOUBLE
    * domain with a pinned op sequence — each cast and IEEE op is
    * exactly specified, so both engines produce the identical bit
    * pattern at any scale. (The r2–r10 form multiplied the int64s
    * first "for exactness"; the r11 x100 gate caught `sum_cents · g_n`
    * at ≈6.9e18 overflowing int64 one decade beyond the proven
    * fixtures — products of two data-proportional aggregates can never
    * stay in a fixed-width integer. Double products round, but they
    * round IDENTICALLY in both engines given the same operand order,
    * which is what the compare actually needs.) Group sums are one
    * shuffle; the global prior is a one-row broadcast join (the
    * scalar-subquery shape — nothing data-sized moves). */
  def mlTargetEncode(spark: SparkSession, sfDir: String): DataFrame = {
    val cents = Tables.orders(spark, sfDir)
      .withColumn("cents", expr("cast(round(o_totalprice * 100) as bigint)"))
    val global = cents.agg(sum("cents").as("g_sum"), count(lit(1)).as("g_n"))
    cents.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
      .crossJoin(broadcast(global))
      .withColumn("encoded_dollars",
        expr("(cast(sum_cents as double) * cast(g_n as double) " +
          "+ cast(10 as double) * cast(g_sum as double)) " +
          "/ ((cast(n + 10 as double) * cast(g_n as double)) * cast(100 as double))"))
      .select("o_orderpriority", "n", "sum_cents", "encoded_dollars")
      .orderBy("o_orderpriority")
  }

  private val mlTargetEncodeSql: String =
    """WITH c AS (SELECT o_orderpriority, round(o_totalprice * 100)::BIGINT AS cents FROM orders),
      |g AS (SELECT sum(cents)::BIGINT AS g_sum, count(*)::BIGINT AS g_n FROM c)
      |SELECT o_orderpriority, count(*)::BIGINT AS n, sum(cents)::BIGINT AS sum_cents,
      |  (sum(cents)::BIGINT::DOUBLE * any_value(g_n)::DOUBLE
      |     + 10::DOUBLE * any_value(g_sum)::DOUBLE)
      |    / (((count(*) + 10)::DOUBLE * any_value(g_n)::DOUBLE) * 100::DOUBLE)
      |    AS encoded_dollars
      |FROM c CROSS JOIN g GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Equal-frequency discretization (quartile binning) of a continuous
    * feature, per category: `ntile(4)` over (cents, key) — the
    * explicit key tie-break makes rank assignment total, so the bin
    * edges are deterministic in any engine. The window partitions on
    * the category, so each group sorts independently in parallel (the
    * global-ntile single-partition trap is avoided; a skewed category
    * would call for the sampled-boundaries variant, which
    * `op_quantiles` provides the sketch for). One shuffle + per-key
    * sort, then an aggregate-sized readout. */
  def mlDiscretize(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
    Tables.orders(spark, sfDir)
      // a missing feature has no quantile: drop it here and in the
      // oracle (imputation is a separate upstream choice) — an unpinned
      // null would land in bin 1 on Spark (ASC nulls first) and bin 4
      // on DuckDB (nulls last); r10 null-jitter gate
      .filter(col("o_totalprice").isNotNull)
      .withColumn("cents", expr("cast(round(o_totalprice * 100) as bigint)"))
      .withColumn("bin", ntile(4).over(w).cast("long"))
      .groupBy("o_orderpriority", "bin")
      .agg(count(lit(1)).as("n"),
        min("cents").as("min_cents"), max("cents").as("max_cents"))
      .orderBy("o_orderpriority", "bin")
  }

  private val mlDiscretizeSql: String =
    """SELECT o_orderpriority, bin, count(*)::BIGINT AS n,
      |  min(cents)::BIGINT AS min_cents, max(cents)::BIGINT AS max_cents
      |FROM (SELECT o_orderpriority, cents,
      |    ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY cents, o_orderkey) AS bin
      |  FROM (SELECT *, round(o_totalprice * 100)::BIGINT AS cents FROM orders
      |        WHERE o_totalprice IS NOT NULL))
      |GROUP BY o_orderpriority, bin ORDER BY o_orderpriority, bin""".stripMargin

  /** LEARNING CURVE — "how much data does the model need": the
    * target-encoding model ([[mlTargetEncode]]'s shrinkage) is fit on
    * nested md5-bucket subsets of the training pool (10/25/50/100% of
    * buckets 0-89) and each fit is scored on the SAME held-out eval
    * slice (buckets 90-99), reporting per-category n_train and MAE.
    * The 4 fits run as ONE grouped pass: the bucketed relation cross
    * joins the 4-row fraction dim (broadcast — the bounded
    * scalar-batch shape), so training-subset stats for every fraction
    * come from a single shuffle on (fraction, category).
    *
    * Exactness: the prediction is carried as an integer RATIONAL
    * (num = sum_cents + 10·g_mean_cents, den = n + 10; g_mean itself
    * one division + round), per-row error is the exact integer
    * |cents·den − num|, summed as int64 per (fraction, category), and
    * MAE is a fixed chain of three divisions on exact integers —
    * nothing order-dependent anywhere. Headroom: cents·den ≤ 5e7·2e7
    * at 100×, inside int64. */
  def mlLearningCurve(spark: SparkSession, sfDir: String): DataFrame = {
    val bucketed = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority").as("cat"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"),
        expr(Text.hash60SparkSql("concat('lc:', cast(o_orderkey as string))") + " % 100")
          .as("bucket"))
    val frac = spark.range(0, 4).select(
      expr("element_at(array(9, 22, 45, 90), cast(id as int) + 1)").as("f"))
    val pool = bucketed.filter(col("bucket") < 90)
      .crossJoin(broadcast(frac)).filter(col("bucket") < col("f"))
    val gStats = pool.groupBy("f")
      .agg(expr("cast(round(cast(sum(cents) as double) / count(*)) as bigint)")
        .as("g_mean_c"))
    val catStats = pool.groupBy("f", "cat")
      .agg(count(lit(1)).as("n_train"), sum(col("cents")).as("sum_c"))
      .join(gStats, "f")
      .select(col("f"), col("cat"), col("n_train"),
        (col("sum_c") + lit(10L) * col("g_mean_c")).as("num"),
        (col("n_train") + lit(10L)).as("den"))
    val evalSet = bucketed.filter(col("bucket") >= 90)
    evalSet.join(broadcast(catStats), Seq("cat"))
      .withColumn("err", abs(col("cents") * col("den") - col("num")))
      .groupBy("f", "cat")
      .agg(max(col("n_train")).as("n_train"), count(lit(1)).as("n_eval"),
        sum(col("err")).as("sum_err"), max(col("den")).as("den"))
      .select(col("f").as("train_pct_buckets"), col("cat"), col("n_train"), col("n_eval"),
        (((col("sum_err").cast("double") / col("den")) / col("n_eval")) / 100.0)
          .as("mae_dollars"))
      .orderBy("train_pct_buckets", "cat")
  }

  private val mlLearningCurveSql: String = {
    val h = Text.hash60DuckSql("'lc:' || o_orderkey::VARCHAR") + " % 100"
    s"""WITH b AS (
       |  SELECT o_orderpriority AS cat, round(o_totalprice * 100)::BIGINT AS cents,
       |    $h AS bucket
       |  FROM orders),
       |frac AS (SELECT unnest([9, 22, 45, 90]) AS f),
       |pool AS (SELECT * FROM b CROSS JOIN frac WHERE bucket < 90 AND bucket < f),
       |g AS (SELECT f, round(sum(cents)::DOUBLE / count(*))::BIGINT AS g_mean_c
       |  FROM pool GROUP BY f),
       |cs AS (
       |  SELECT pool.f, pool.cat AS cat, count(*)::BIGINT AS n_train,
       |    (sum(cents)::BIGINT + 10 * any_value(g_mean_c))::BIGINT AS num,
       |    (count(*) + 10)::BIGINT AS den
       |  FROM pool JOIN g ON g.f = pool.f GROUP BY pool.f, cat)
       |SELECT cs.f AS train_pct_buckets, b.cat AS cat, any_value(n_train) AS n_train,
       |  count(*)::BIGINT AS n_eval,
       |  ((sum(abs(b.cents * den - num))::BIGINT::DOUBLE / any_value(den))
       |    / count(*)) / 100.0 AS mae_dollars
       |FROM b JOIN cs ON cs.cat = b.cat
       |WHERE b.bucket >= 90
       |GROUP BY cs.f, b.cat
       |ORDER BY train_pct_buckets, b.cat""".stripMargin
  }

  /** CHI-SQUARED FEATURE SELECTION — the classic filter-method ranking
    * (Yang & Pedersen 1997 for text): score every hashed token feature
    * against a binary label (`lang = 'en'`) with the 2×2 chi² statistic
    * and keep the top 15. With counts a (feature∧en), b (feature∧¬en),
    * c (¬feature∧en), d (¬feature∧¬en):
    * `chi² = N·(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))`.
    *
    * Bit-exactness: all counts and `ad−bc` are exact BIGINTs (≤ ~4e11
    * at any shipped fixture, far inside int64 and inside double's 2^53
    * exact-integer range), and the chi² is then a FIXED parenthesised
    * sequence of double multiplications and one division — the same
    * IEEE ops on the same inputs in both engines, so the ranking and
    * the reported statistic hash-match (no transcendental functions,
    * which is why chi² is chosen here over mutual information — MI's
    * log() is not cross-engine reproducible; the repo-wide log-free
    * discipline of [[TextAnalysis]]'s BM25 applies).
    *
    * Shape at scale: one map-side token explode + hash, one
    * aggregation to a [[MlPrep.Chi2Buckets]]-row feature table, then
    * all arithmetic on that bounded table (the ONE-ROW total is
    * broadcast — scalar-subquery shape). The corpus never shuffles
    * by anything wider than the 64-key bucket id with map-side
    * partial aggregation; at 100 TB the shuffle carries ≤ B rows per
    * mapper. */
  def mlChi2Select(spark: SparkSession, sfDir: String): DataFrame = {
    val per = Tables.documents(spark, sfDir)
      .select(col("lang"), explode(Text.tokens(col("text"))).as("tok"))
      .withColumn("bucket", expr(s"${Text.hash60SparkSql("tok")} % $Chi2Buckets"))
      .withColumn("is_en", (col("lang") === "en").cast("long"))
      .groupBy("bucket").agg(
        sum(col("is_en")).as("n_en"),
        sum(lit(1L) - col("is_en")).as("n_other"))
    val tot = per.agg(sum("n_en").as("t_en"), sum("n_other").as("t_other"))
    val wTop = Window.orderBy(col("chi2").desc, col("bucket"))
    per.crossJoin(broadcast(tot))
      .withColumn("c", col("t_en") - col("n_en"))
      .withColumn("d", col("t_other") - col("n_other"))
      .withColumn("diff", col("n_en") * col("d") - col("n_other") * col("c"))
      .withColumn("chi2",
        ((col("t_en") + col("t_other")).cast("double") *
          (col("diff").cast("double") * col("diff").cast("double"))) /
          (((col("n_en") + col("n_other")).cast("double") *
            (col("c") + col("d")).cast("double")) *
            ((col("n_en") + col("c")).cast("double") *
              (col("n_other") + col("d")).cast("double"))))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= 15)
      .select("rank", "bucket", "n_en", "n_other", "chi2")
      .orderBy("rank")
  }

  private val Chi2Buckets = 64

  private val mlChi2SelectSql: String =
    s"""WITH toks AS (
       |  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
       |per AS (
       |  SELECT ${Text.hash60DuckSql("tok")} % $Chi2Buckets AS bucket,
       |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_en,
       |    sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)::BIGINT AS n_other
       |  FROM toks GROUP BY 1),
       |tot AS (SELECT sum(n_en)::BIGINT AS t_en, sum(n_other)::BIGINT AS t_other FROM per),
       |scored AS (
       |  SELECT bucket, n_en, n_other,
       |    (t_en - n_en) AS c, (t_other - n_other) AS d,
       |    (n_en * (t_other - n_other) - n_other * (t_en - n_en)) AS diff,
       |    t_en, t_other
       |  FROM per, tot),
       |chi AS (
       |  SELECT bucket, n_en, n_other,
       |    ((t_en + t_other)::DOUBLE * (diff::DOUBLE * diff::DOUBLE)) /
       |      (((n_en + n_other)::DOUBLE * (c + d)::DOUBLE) *
       |        ((n_en + c)::DOUBLE * (n_other + d)::DOUBLE)) AS chi2
       |  FROM scored)
       |SELECT rank, bucket, n_en, n_other, chi2 FROM (
       |  SELECT *, row_number() OVER (ORDER BY chi2 DESC, bucket)::BIGINT AS rank
       |  FROM chi) t
       |WHERE rank <= 15 ORDER BY rank""".stripMargin

  /** GROUP K-FOLD assignment — cross-validation folds where every
    * event of a user lands in the SAME fold (the leakage guard:
    * correlated rows from one entity must not straddle train and
    * validation). The fold is a pure function of the GROUP key
    * (md5-bucket of user_id, the [[mlSplit]] discipline), so
    * assignment is reproducible at any parallelism, under retries,
    * and incrementally — no membership list is ever materialized.
    * The readout reports per-fold group/row counts and label balance
    * (share of purchase events), each ONE division on exact integers.
    * Shape at scale: one map-side hash + one fold-keyed aggregation
    * (5 groups) with map-side partials; nothing else moves. */
  def mlGroupKfold(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("fold",
        expr(s"${Text.hash60SparkSql("concat('fold:', cast(user_id as string))")} % 5"))
      .groupBy("fold").agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"),
        sum((col("event_type") === "purchase").cast("long")).as("n_purchase"),
        sum(expr("user_id % 9973")).as("user_check"))
      .withColumn("purchase_rate",
        col("n_purchase").cast("double") / col("n_events").cast("double"))
      .select("fold", "n_users", "n_events", "n_purchase", "purchase_rate", "user_check")
      .orderBy("fold")

  private val mlGroupKfoldSql: String =
    s"""SELECT ${Text.hash60DuckSql("'fold:' || user_id::VARCHAR")} % 5 AS fold,
       |  count(DISTINCT user_id)::BIGINT AS n_users,
       |  count(*)::BIGINT AS n_events,
       |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchase,
       |  sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::DOUBLE
       |    / count(*)::DOUBLE AS purchase_rate,
       |  sum(user_id % 9973)::BIGINT AS user_check
       |FROM events GROUP BY 1 ORDER BY fold""".stripMargin

  /** INVERSE-FREQUENCY CLASS WEIGHTS — the imbalance correction a
    * trainer applies when one label dominates: `w_c = N / (K·n_c)`
    * (the sklearn "balanced" convention), so each class contributes
    * equally to the loss regardless of its share. Counts are exact;
    * the weight is ONE double division of exact integers, so both
    * engines agree bitwise. Shape at scale: one label-keyed count
    * (map-side partials) to a K-row table; the ONE-ROW (N, K) total
    * is broadcast back — scalar-subquery shape. */
  def mlClassWeights(spark: SparkSession, sfDir: String): DataFrame = {
    val per = Tables.embeddings(spark, sfDir)
      .groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n"))
    val tot = per.agg(sum("n").as("n_total"), count(lit(1)).as("k"))
    per.crossJoin(broadcast(tot))
      .withColumn("weight",
        col("n_total").cast("double") / (col("k") * col("n")).cast("double"))
      .select("label", "n", "weight")
      .orderBy("label")
  }

  private val mlClassWeightsSql: String =
    """WITH per AS (
      |  SELECT label::BIGINT AS label, count(*)::BIGINT AS n
      |  FROM embeddings GROUP BY 1),
      |tot AS (SELECT sum(n)::BIGINT AS n_total, count(*)::BIGINT AS k FROM per)
      |SELECT label, n, n_total::DOUBLE / (k * n)::DOUBLE AS weight
      |FROM per, tot ORDER BY label""".stripMargin

  /** STRATIFIED K-FOLD — the class-balance guarantee [[mlGroupKfold]]'s
    * hash assignment cannot give: within each label stratum, rows are
    * ordered by a deterministic hash (an unbiased shuffle that is
    * reproducible, unlike rand()) and dealt ROUND-ROBIN
    * (`row_number % k`), so every fold holds ⌈n_c/k⌉ or ⌊n_c/k⌋ rows
    * of class c EXACTLY — rare classes stay represented in every
    * evaluation fold, the property stratified CV exists for. The
    * `spread` column audits it: max−min fold size within each stratum,
    * provably ≤ 1 by construction and hash-pinned by the oracle. One
    * window shuffle keyed on the label; folds then aggregate
    * map-side. At 100 TB the per-stratum sort is the cost — the same
    * per-key window every quantile/rank op pays, parallel across
    * strata. */
  def mlStratifiedKfold(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("label")
      .orderBy(col("hk"), col("vec_id"))
    val wLab = Window.partitionBy("label")
    Tables.embeddings(spark, sfDir)
      .withColumn("hk", expr(Text.hash60SparkSql("concat('skf:', cast(vec_id as string))")))
      .withColumn("fold", ((row_number().over(w) - 1) % 5).cast("long"))
      .groupBy("fold", "label")
      .agg(count(lit(1)).as("n"),
        sum(expr("vec_id % 9973")).as("id_check"))
      .withColumn("spread",
        (max(col("n")).over(Window.partitionBy("label"))
          - min(col("n")).over(Window.partitionBy("label"))).cast("long"))
      .select(col("fold"), col("label").cast("long").as("label"),
        col("n"), col("id_check"), col("spread"))
      .orderBy("fold", "label")
  }

  private val mlStratifiedKfoldSql: String =
    s"""WITH assigned AS (
       |  SELECT label, vec_id,
       |    (row_number() OVER (PARTITION BY label
       |      ORDER BY ${Text.hash60DuckSql("'skf:' || vec_id::VARCHAR")}, vec_id) - 1) % 5
       |      AS fold
       |  FROM embeddings),
       |cells AS (
       |  SELECT fold::BIGINT AS fold, label::BIGINT AS label,
       |    count(*)::BIGINT AS n, sum(vec_id % 9973)::BIGINT AS id_check
       |  FROM assigned GROUP BY 1, 2)
       |SELECT fold, label, n, id_check,
       |  (max(n) OVER (PARTITION BY label) - min(n) OVER (PARTITION BY label))::BIGINT
       |    AS spread
       |FROM cells ORDER BY fold, label""".stripMargin

  // ------------------------------------------------------------------
  // Closed-form linear regression from distributed sufficient statistics
  // — the canonical "train a linear model on 100 TB without an iterative
  // solver" pattern: ONE map-side-combinable aggregate collects the
  // moment sums (n, Σx, Σy, Σx², Σxy, Σy²) per group, and the normal
  // equations solve in a final per-group scalar expression. Zero
  // iterations, zero driver-side data, one shuffle of group-count rows.
  //
  // Bit-exactness across engines (the Exact.scala discipline applied to
  // second moments): every sum is an integer-cents BIGINT sum —
  // associative, so partial-aggregation order can't change it — and the
  // closed-form solve is ONE shared expression string evaluated by both
  // engines on those identical integers, so the doubles agree bitwise.
  // Σy² of a 10^7-cent price would overflow int64 around sf1 row counts,
  // so it is carried as a hi/lo pair split at 2^20 (two exact BIGINT
  // sums, recombined in the shared double expression — the recombination
  // is the same two IEEE ops on the same inputs in both engines, so it
  // stays bit-identical even past 2^53). Headroom at 100 TB (sf100k,
  // ~6e11 rows/group): Σxy ≈ 3e21 exceeds int64 — the deployment path is
  // the same hi/lo split applied to Σxy (or decimal(38,0) sums, which
  // Spark and DuckDB both hold exactly); the fixture-to-x100 range is
  // proven exact as shipped.

  /** Shared Spark/DuckDB final-solve fragments over the moment columns
    * (n, sx, sy, sxx, sxy, syy_hi, syy_lo[, ...]). Pure common-dialect
    * SQL (CAST, + - * /, parens only), so the exact text runs on both
    * engines. */
  private object Ols {
    val nD = "CAST(n AS DOUBLE)"
    val syyD = "(CAST(syy_hi AS DOUBLE) * CAST(1048576 AS DOUBLE) + CAST(syy_lo AS DOUBLE))"
    val cov = s"($nD * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    val varx = s"($nD * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    val vary = s"($nD * $syyD - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
    val slope = s"($cov / $varx)"
    val intercept =
      s"((CAST(sy AS DOUBLE) - $slope * CAST(sx AS DOUBLE)) / ($nD * CAST(100 AS DOUBLE)))"
    val r2 = s"(($cov * $cov) / ($varx * $vary))"

    // bivariate (x1 = quantity cents, x2 = discount cents): centered
    // normal equations solved by Cramer's rule, all from the same sums
    val s11 = varx
    val s22 = s"($nD * CAST(sww AS DOUBLE) - CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE))"
    val s12 = s"($nD * CAST(sxw AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sw AS DOUBLE))"
    val s1y = cov
    val s2y = s"($nD * CAST(swy AS DOUBLE) - CAST(sw AS DOUBLE) * CAST(sy AS DOUBLE))"
    val det = s"($s11 * $s22 - $s12 * $s12)"
    val b1 = s"(($s1y * $s22 - $s2y * $s12) / $det)"
    val b2 = s"(($s11 * $s2y - $s12 * $s1y) / $det)"
    val b0 =
      s"((CAST(sy AS DOUBLE) - $b1 * CAST(sx AS DOUBLE) - $b2 * CAST(sw AS DOUBLE)) / ($nD * CAST(100 AS DOUBLE)))"
    val r2Multi = s"((($b1 * $s1y + $b2 * $s2y)) / $vary)"
  }

  /** Univariate OLS per return flag: extendedprice ~ quantity. The
    * slope/intercept/R² come out of one aggregation pass — the shape
    * that trains on the full corpus at any scale (statistics shrink to
    * one row per group before any non-associative arithmetic runs). */
  def mlOls(spark: SparkSession, sfDir: String): DataFrame = {
    val sums = Tables.lineitem(spark, sfDir)
      .withColumn("xc", expr("cast(round(l_quantity * 100) as bigint)"))
      .withColumn("yc", expr("cast(round(l_extendedprice * 100) as bigint)"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("xc")).as("sx"), sum(col("yc")).as("sy"),
        sum(col("xc") * col("xc")).as("sxx"),
        sum(col("xc") * col("yc")).as("sxy"),
        sum(expr("(yc * yc) div 1048576")).as("syy_hi"),
        sum(expr("(yc * yc) % 1048576")).as("syy_lo"))
    sums.selectExpr("l_returnflag", "n",
      s"${Ols.slope} AS slope", s"${Ols.intercept} AS intercept",
      s"${Ols.r2} AS r2")
      .orderBy("l_returnflag")
  }

  private val mlOlsSql: String =
    s"""WITH c AS (
       |  SELECT l_returnflag,
       |    round(l_quantity * 100)::BIGINT AS xc,
       |    round(l_extendedprice * 100)::BIGINT AS yc
       |  FROM lineitem),
       |s AS (
       |  SELECT l_returnflag, count(*)::BIGINT AS n,
       |    sum(xc)::BIGINT AS sx, sum(yc)::BIGINT AS sy,
       |    sum(xc * xc)::BIGINT AS sxx, sum(xc * yc)::BIGINT AS sxy,
       |    sum((yc * yc) // 1048576)::BIGINT AS syy_hi,
       |    sum((yc * yc) % 1048576)::BIGINT AS syy_lo
       |  FROM c GROUP BY l_returnflag)
       |SELECT l_returnflag, n, ${Ols.slope} AS slope,
       |  ${Ols.intercept} AS intercept, ${Ols.r2} AS r2
       |FROM s ORDER BY l_returnflag""".stripMargin

  /** Bivariate OLS per return flag: extendedprice ~ quantity + discount,
    * solved in closed form (Cramer on the centered 2×2 normal
    * equations). Demonstrates the multi-feature extension of the same
    * one-pass sufficient-statistics shape — the 2×2 solve is a scalar
    * expression per group, no matrix library and no second pass. */
  def mlOls2(spark: SparkSession, sfDir: String): DataFrame = {
    val sums = Tables.lineitem(spark, sfDir)
      .withColumn("xc", expr("cast(round(l_quantity * 100) as bigint)"))
      .withColumn("wc", expr("cast(round(l_discount * 100) as bigint)"))
      .withColumn("yc", expr("cast(round(l_extendedprice * 100) as bigint)"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("xc")).as("sx"), sum(col("wc")).as("sw"), sum(col("yc")).as("sy"),
        sum(col("xc") * col("xc")).as("sxx"),
        sum(col("wc") * col("wc")).as("sww"),
        sum(col("xc") * col("wc")).as("sxw"),
        sum(col("xc") * col("yc")).as("sxy"),
        sum(col("wc") * col("yc")).as("swy"),
        sum(expr("(yc * yc) div 1048576")).as("syy_hi"),
        sum(expr("(yc * yc) % 1048576")).as("syy_lo"))
    sums.selectExpr("l_returnflag", "n",
      s"${Ols.b1} AS beta_qty", s"${Ols.b2} AS beta_disc",
      s"${Ols.b0} AS intercept", s"${Ols.r2Multi} AS r2")
      .orderBy("l_returnflag")
  }

  private val mlOls2Sql: String =
    s"""WITH c AS (
       |  SELECT l_returnflag,
       |    round(l_quantity * 100)::BIGINT AS xc,
       |    round(l_discount * 100)::BIGINT AS wc,
       |    round(l_extendedprice * 100)::BIGINT AS yc
       |  FROM lineitem),
       |s AS (
       |  SELECT l_returnflag, count(*)::BIGINT AS n,
       |    sum(xc)::BIGINT AS sx, sum(wc)::BIGINT AS sw, sum(yc)::BIGINT AS sy,
       |    sum(xc * xc)::BIGINT AS sxx, sum(wc * wc)::BIGINT AS sww,
       |    sum(xc * wc)::BIGINT AS sxw, sum(xc * yc)::BIGINT AS sxy,
       |    sum(wc * yc)::BIGINT AS swy,
       |    sum((yc * yc) // 1048576)::BIGINT AS syy_hi,
       |    sum((yc * yc) % 1048576)::BIGINT AS syy_lo
       |  FROM c GROUP BY l_returnflag)
       |SELECT l_returnflag, n, ${Ols.b1} AS beta_qty, ${Ols.b2} AS beta_disc,
       |  ${Ols.b0} AS intercept, ${Ols.r2Multi} AS r2
       |FROM s ORDER BY l_returnflag""".stripMargin

  /** SHAP attributions for the bivariate linear model — for a linear
    * model the exact Shapley value of feature j on row i is
    * βⱼ·(xᵢⱼ − x̄ⱼ), so the global mean-|SHAP| importance is
    * |βⱼ|·mean|xᵢⱼ − x̄ⱼ|. Every piece reduces to the same one-pass
    * sufficient statistics: the βs come from [[Ols]], and the mean
    * absolute deviation is carried EXACTLY as the integer sum
    * Σ|xᵢ·n − Σx| (multiplying through by n keeps the deviation an
    * integer — no per-row double subtraction whose order could
    * diverge), divided once at the end in a shared expression. Two
    * aggregation passes with a broadcast of the 3-row stats between
    * them; nothing data-sized moves. Headroom: |xc·n − sx| sums stay
    * under int64 through x100 of the shipped fixtures (≈2e16); the
    * 100 TB path is the same hi/lo split the second moments use. */
  def mlShapLinear(spark: SparkSession, sfDir: String): DataFrame = {
    val rows = Tables.lineitem(spark, sfDir)
      .withColumn("xc", expr("cast(round(l_quantity * 100) as bigint)"))
      .withColumn("wc", expr("cast(round(l_discount * 100) as bigint)"))
      .withColumn("yc", expr("cast(round(l_extendedprice * 100) as bigint)"))
    val stats = rows.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("xc")).as("sx"), sum(col("wc")).as("sw"), sum(col("yc")).as("sy"),
        sum(col("xc") * col("xc")).as("sxx"),
        sum(col("wc") * col("wc")).as("sww"),
        sum(col("xc") * col("wc")).as("sxw"),
        sum(col("xc") * col("yc")).as("sxy"),
        sum(col("wc") * col("yc")).as("swy"))
    val devs = rows
      .join(broadcast(stats.select(col("l_returnflag"), col("n"), col("sx"), col("sw"))),
        Seq("l_returnflag"))
      .groupBy("l_returnflag")
      .agg(sum(expr("abs(xc * n - sx)")).as("sdx"),
        sum(expr("abs(wc * n - sw)")).as("sdw"))
    val phiQty =
      s"(abs(${Ols.b1}) * (CAST(sdx AS DOUBLE) / (${Ols.nD} * ${Ols.nD} * CAST(100 AS DOUBLE))))"
    val phiDisc =
      s"(abs(${Ols.b2}) * (CAST(sdw AS DOUBLE) / (${Ols.nD} * ${Ols.nD} * CAST(100 AS DOUBLE))))"
    stats.join(devs, Seq("l_returnflag"))
      .selectExpr("l_returnflag", "n",
        s"$phiQty AS phi_qty", s"$phiDisc AS phi_disc")
      .orderBy("l_returnflag")
  }

  private val mlShapLinearSql: String = {
    val phiQty =
      s"(abs(${Ols.b1}) * (CAST(sdx AS DOUBLE) / (${Ols.nD} * ${Ols.nD} * CAST(100 AS DOUBLE))))"
    val phiDisc =
      s"(abs(${Ols.b2}) * (CAST(sdw AS DOUBLE) / (${Ols.nD} * ${Ols.nD} * CAST(100 AS DOUBLE))))"
    s"""WITH c AS (
       |  SELECT l_returnflag,
       |    round(l_quantity * 100)::BIGINT AS xc,
       |    round(l_discount * 100)::BIGINT AS wc,
       |    round(l_extendedprice * 100)::BIGINT AS yc
       |  FROM lineitem),
       |s AS (
       |  SELECT l_returnflag, count(*)::BIGINT AS n,
       |    sum(xc)::BIGINT AS sx, sum(wc)::BIGINT AS sw, sum(yc)::BIGINT AS sy,
       |    sum(xc * xc)::BIGINT AS sxx, sum(wc * wc)::BIGINT AS sww,
       |    sum(xc * wc)::BIGINT AS sxw, sum(xc * yc)::BIGINT AS sxy,
       |    sum(wc * yc)::BIGINT AS swy
       |  FROM c GROUP BY l_returnflag),
       |d AS (
       |  SELECT c.l_returnflag,
       |    sum(abs(c.xc * s.n - s.sx))::BIGINT AS sdx,
       |    sum(abs(c.wc * s.n - s.sw))::BIGINT AS sdw
       |  FROM c JOIN s ON s.l_returnflag = c.l_returnflag
       |  GROUP BY c.l_returnflag)
       |SELECT s.l_returnflag, n, $phiQty AS phi_qty, $phiDisc AS phi_disc
       |FROM s JOIN d ON d.l_returnflag = s.l_returnflag
       |ORDER BY s.l_returnflag""".stripMargin
  }

  /** TIME-BASED TRAIN/TEST SPLIT with the leakage-shaped audit row —
    * the split a FORECASTING or next-event model must use (a hash
    * split like [[mlSplit]] leaks the future into training): train =
    * events strictly before the window's exact epoch-microsecond
    * midpoint, test = at/after. The audit publishes what temporal
    * splits actually break on: COLD-START users — test users with no
    * training history (distinct-key anti-join, the exact population a
    * per-user model cannot score). Counts exact; one events scan, one
    * user-keyed distinct per side, one anti-join on user_id. */
  def mlTimeSplit(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val cut = ev.agg(
      expr("(min(unix_micros(ts)) + max(unix_micros(ts))) div 2").as("cut_us"))
    val tagged = ev.crossJoin(broadcast(cut))
      .withColumn("split",
        when(unix_micros(col("ts")) < col("cut_us"), "train").otherwise("test"))
    val stats = tagged.groupBy("split")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
    val trainUsers = tagged.filter(col("split") === "train")
      .select("user_id").distinct()
    val cold = tagged.filter(col("split") === "test")
      .select("user_id").distinct()
      .join(trainUsers, Seq("user_id"), "left_anti")
      .agg(count(lit(1)).as("n_cold_users"))
    stats
      .crossJoin(broadcast(cold))
      .withColumn("n_cold_users",
        when(col("split") === "test", col("n_cold_users")).otherwise(lit(0L)))
      .withColumn("cold_frac",
        col("n_cold_users").cast("double") / col("n_users").cast("double"))
      .select("split", "n_events", "n_users", "n_cold_users", "cold_frac")
      .orderBy("split")
  }

  private val mlTimeSplitSql: String =
    """WITH cut AS (
      |  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS cut_us FROM events),
      |tagged AS (
      |  SELECT CASE WHEN epoch_us(ts) < cut_us THEN 'train' ELSE 'test' END AS split,
      |    user_id
      |  FROM events, cut),
      |stats AS (
      |  SELECT split, count(*)::BIGINT AS n_events,
      |    count(DISTINCT user_id)::BIGINT AS n_users
      |  FROM tagged GROUP BY split),
      |cold AS (
      |  SELECT count(*)::BIGINT AS n_cold_users FROM (
      |    SELECT DISTINCT user_id FROM tagged WHERE split = 'test'
      |    EXCEPT
      |    SELECT DISTINCT user_id FROM tagged WHERE split = 'train') z)
      |SELECT split, n_events, n_users,
      |  CASE WHEN split = 'test' THEN n_cold_users ELSE 0 END::BIGINT AS n_cold_users,
      |  CASE WHEN split = 'test' THEN n_cold_users ELSE 0 END::BIGINT::DOUBLE
      |    / n_users::DOUBLE AS cold_frac
      |FROM stats, cold ORDER BY split""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_time_split" -> (mlTimeSplit _),
    "ml_ols" -> (mlOls _),
    "ml_ols2" -> (mlOls2 _),
    "ml_shap_linear" -> (mlShapLinear _),
    "ml_stratified_kfold" -> (mlStratifiedKfold _),
    "ml_class_weights" -> (mlClassWeights _),
    "ml_chi2_select" -> (mlChi2Select _),
    "ml_group_kfold" -> (mlGroupKfold _),
    "ml_learning_curve" -> (mlLearningCurve _),
    "ml_split" -> (mlSplit _),
    "ml_feature_hash" -> (mlFeatureHash _),
    "ml_target_encode" -> (mlTargetEncode _),
    "ml_discretize" -> (mlDiscretize _))

  val oracles: Map[String, String] = Map(
    "ml_time_split" -> mlTimeSplitSql,
    "ml_ols" -> mlOlsSql,
    "ml_ols2" -> mlOls2Sql,
    "ml_shap_linear" -> mlShapLinearSql,
    "ml_stratified_kfold" -> mlStratifiedKfoldSql,
    "ml_class_weights" -> mlClassWeightsSql,
    "ml_chi2_select" -> mlChi2SelectSql,
    "ml_group_kfold" -> mlGroupKfoldSql,
    "ml_learning_curve" -> mlLearningCurveSql,
    "ml_split" -> mlSplitSql,
    "ml_feature_hash" -> mlFeatureHashSql,
    "ml_target_encode" -> mlTargetEncodeSql,
    "ml_discretize" -> mlDiscretizeSql)
}
