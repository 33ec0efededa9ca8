package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Exact, Text}
import graft.sources.Tables

/** Text-analysis operators over `documents` (north-star extension surface,
  * SURVEY §7.5): token statistics, quality scoring, language-ID heuristic,
  * n-gram frequency, content fingerprinting.
  *
  * Everything is per-row column arithmetic plus at most one aggregation —
  * embarrassingly parallel, no shuffle except the explicit group-bys.
  * Ratios are computed with identical expression shapes in the oracle so
  * double division is bit-equal.
  */
object TextAnalysis {

  private[operators] val stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** Token counting (whitespace tokenizer): counts, distinct counts,
    * type-token ratio, mean token length. */
  def taTokenStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        (size(array_distinct(col("toks"))).cast("double") / size(col("toks"))).as("ttr"),
        ((length(col("text")) - size(col("toks")) + 1).cast("double") / size(col("toks")))
          .as("mean_token_len"))
      .orderBy("doc_id")

  private val taTokenStatsSql: String =
    """SELECT doc_id,
      |  len(w)::BIGINT AS n_tokens,
      |  len(list_distinct(w))::BIGINT AS n_distinct,
      |  len(list_distinct(w))::DOUBLE / len(w) AS ttr,
      |  (length(text) - len(w) + 1)::DOUBLE / len(w) AS mean_token_len
      |FROM (SELECT doc_id, text, string_split(text, ' ') w FROM documents) t
      |ORDER BY doc_id""".stripMargin

  /** Quality scoring: length/stopword-ratio features and a composite
    * score — the heuristics a pretraining-data pipeline gates on. */
  def taQuality(spark: SparkSession, sfDir: String): DataFrame = {
    val inStops = stopwords.map(s => s"'$s'").mkString(", ")
    Tables.documents(spark, sfDir)
      .withColumn("toks", Text.tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_stop", expr(s"size(filter(toks, t -> t IN ($inStops)))").cast("long"))
      .withColumn("stop_ratio", col("n_stop").cast("double") / col("n_tokens"))
      .select(col("doc_id"), length(col("text")).cast("long").as("text_len"),
        col("n_tokens"), col("n_stop"), col("stop_ratio"),
        (least(lit(1.0), col("n_tokens").cast("double") / 200.0) * (lit(1.0) - col("stop_ratio")))
          .as("quality_score"))
      .orderBy("doc_id")
  }

  private val taQualitySql: String = {
    val inStops = stopwords.map(s => s"'$s'").mkString(", ")
    s"""SELECT doc_id, length(text)::BIGINT AS text_len,
       |  len(w)::BIGINT AS n_tokens,
       |  len(list_filter(w, t -> t IN ($inStops)))::BIGINT AS n_stop,
       |  len(list_filter(w, t -> t IN ($inStops)))::DOUBLE / len(w) AS stop_ratio,
       |  least(1.0, len(w)::DOUBLE / 200.0) *
       |    (1.0 - len(list_filter(w, t -> t IN ($inStops)))::DOUBLE / len(w)) AS quality_score
       |FROM (SELECT doc_id, text, string_split(text, ' ') w FROM documents) t
       |ORDER BY doc_id""".stripMargin
  }

  /** Language-ID heuristic: count per-language marker tokens, pick the
    * argmax with a deterministic tie-break chain. (The fixture text is a
    * synthetic word soup, so this validates the machinery, not linguistic
    * accuracy.) */
  def taLangId(spark: SparkSession, sfDir: String): DataFrame = {
    def score(name: String, words: Seq[String]) =
      expr(s"size(filter(toks, t -> t IN (${words.map(w => s"'$w'").mkString(", ")})))")
        .cast("long").as(name)
    Tables.documents(spark, sfDir)
      .withColumn("toks", Text.tokens(col("text")))
      .withColumn("s_en", score("s_en", Seq("the", "a", "of")))
      .withColumn("s_de", score("s_de", Seq("der", "die", "das", "und")))
      .withColumn("s_fr", score("s_fr", Seq("le", "la", "les", "et")))
      .withColumn("s_es", score("s_es", Seq("el", "los", "las", "y")))
      .withColumn("pred_lang",
        when(col("s_de") > greatest(col("s_en"), col("s_fr"), col("s_es")), "de")
          .when(col("s_fr") > greatest(col("s_en"), col("s_de"), col("s_es")), "fr")
          .when(col("s_es") > greatest(col("s_en"), col("s_de"), col("s_fr")), "es")
          .when(col("s_en") >= 1, "en")
          .otherwise("und"))
      .select("doc_id", "lang", "s_en", "s_de", "s_fr", "s_es", "pred_lang")
      .orderBy("doc_id")
  }

  private val taLangIdSql: String =
    """SELECT doc_id, lang, s_en, s_de, s_fr, s_es,
      |  CASE WHEN s_de > greatest(s_en, s_fr, s_es) THEN 'de'
      |       WHEN s_fr > greatest(s_en, s_de, s_es) THEN 'fr'
      |       WHEN s_es > greatest(s_en, s_de, s_fr) THEN 'es'
      |       WHEN s_en >= 1 THEN 'en' ELSE 'und' END AS pred_lang
      |FROM (SELECT doc_id, lang,
      |    len(list_filter(w, t -> t IN ('the', 'a', 'of')))::BIGINT AS s_en,
      |    len(list_filter(w, t -> t IN ('der', 'die', 'das', 'und')))::BIGINT AS s_de,
      |    len(list_filter(w, t -> t IN ('le', 'la', 'les', 'et')))::BIGINT AS s_fr,
      |    len(list_filter(w, t -> t IN ('el', 'los', 'las', 'y')))::BIGINT AS s_es
      |  FROM (SELECT doc_id, lang, string_split(text, ' ') w FROM documents) t) s
      |ORDER BY doc_id""".stripMargin

  /** Corpus-level bigram frequency: explode bigrams, count, top-50.
    * The shuffle is on the bigram key (high cardinality — scales). */
  def taNgramFreq(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("toks", Text.tokens(col("text")))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> concat(element_at(toks, i + 1), ' ', element_at(toks, i + 2)))"))
        .as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram"))
      .limit(50)

  private val taNgramFreqSql: String =
    """SELECT bigram, count(*) AS cnt FROM (
      |  SELECT unnest([w[i] || ' ' || w[i+1] for i in generate_series(1, len(w) - 1)]) AS bigram
      |  FROM (SELECT string_split(text, ' ') w FROM documents) t WHERE len(w) >= 2) u
      |GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 50""".stripMargin

  /** COLLOCATION MINING (the statistical-phrase detector feeding
    * phrase-aware tokenizers and n-gram LMs): adjacent token pairs
    * scored by LIFT over the bigram sample space —
    * P(w1,w2) / (P(w1·)·P(·w2)) = n_pair·n_bigrams / (n_left·n_right)
    * — the exact-arithmetic member of the PMI family (PMI is just its
    * log, which would drag in libm and cost bit-portability; ranking
    * is identical). Support floor 3, top 30 by lift.
    *
    * Scale: one explode + three bigram-keyed aggregations (pair/left/
    * right marginals — each ONE shuffle with map-side partials), the
    * scalar total broadcast into the support-filtered pair relation;
    * the two marginal joins key on single words (vocabulary-sized,
    * broadcastable). Nothing is ever all-pairs over the vocabulary. */
  def taCollocations(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = Scratch.persist(Tables.documents(spark, sfDir)
      .withColumn("toks", Text.tokens(col("text")))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        """transform(sequence(0, size(toks) - 2),
          |  i -> struct(element_at(toks, i + 1) as w1, element_at(toks, i + 2) as w2))"""
          .stripMargin)).as("b"))
      .select(col("b.w1"), col("b.w2")))
    val pairCnt = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= 3)
    val leftCnt = pairs.groupBy("w1").agg(count(lit(1)).as("n_left"))
    val rightCnt = pairs.groupBy("w2").agg(count(lit(1)).as("n_right"))
    val total = pairs.agg(count(lit(1)).as("n_bigrams"))
    pairCnt
      .join(leftCnt, "w1")
      .join(rightCnt, "w2")
      .crossJoin(broadcast(total))
      .withColumn("lift",
        (col("n_pair") * col("n_bigrams")).cast("double") / (col("n_left") * col("n_right")))
      .select("w1", "w2", "n_pair", "n_left", "n_right", "lift")
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(30)
  }

  private val taCollocationsSql: String =
    """WITH pr AS (
      |  SELECT string_split(bigram, ' ')[1] AS w1, string_split(bigram, ' ')[2] AS w2
      |  FROM (SELECT unnest([w[i] || ' ' || w[i+1] for i in generate_series(1, len(w) - 1)]) AS bigram
      |        FROM (SELECT string_split(text, ' ') w FROM documents) t WHERE len(w) >= 2) u),
      |pc AS (SELECT w1, w2, count(*)::BIGINT AS n_pair FROM pr GROUP BY 1, 2
      |       HAVING count(*) >= 3),
      |lc AS (SELECT w1, count(*)::BIGINT AS n_left FROM pr GROUP BY 1),
      |rc AS (SELECT w2, count(*)::BIGINT AS n_right FROM pr GROUP BY 1),
      |tot AS (SELECT count(*)::BIGINT AS n_bigrams FROM pr)
      |SELECT pc.w1, pc.w2, n_pair, n_left, n_right,
      |  (n_pair * n_bigrams)::DOUBLE / (n_left * n_right) AS lift
      |FROM pc JOIN lc USING (w1) JOIN rc USING (w2), tot
      |ORDER BY lift DESC, w1, w2 LIMIT 30""".stripMargin

  /** Document fingerprinting: full md5, a 60-bit integer fingerprint, and
    * an order-insensitive bag-of-words fingerprint (rolling-hash family;
    * md5-based so both engines agree — SURVEY §7.5). */
  def taFingerprint(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("toks", Text.tokens(col("text")))
      .select(col("doc_id"),
        md5(col("text")).as("fp_md5"),
        expr(Text.hash60SparkSql("text")).as("fp_int60"),
        md5(array_join(array_sort(array_distinct(col("toks"))), " ")).as("fp_bag"))
      .orderBy("doc_id")

  private val taFingerprintSql: String =
    s"""SELECT doc_id, md5(text) AS fp_md5,
       |  ${Text.hash60DuckSql("text")} AS fp_int60,
       |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp_bag
       |FROM documents ORDER BY doc_id""".stripMargin

  /** BPE-ish regex tokenization (the pre-tokenizer split BPE vocabularies
    * are trained over — GPT-2-style alpha runs / digit runs / single
    * punctuation, ASCII classes so Java and DuckDB regex agree): token
    * counts per class + length stats per document. The per-row
    * `regexp_extract_all` is codegen'd; no shuffle at all.
    * NULL semantics (r11 nulls gate): a NULL text propagates NULL
    * through every stat (Spark `aggregate(NULL, …)` is NULL; the
    * oracle's empty-list coalesce-to-0 must therefore be guarded by an
    * IS NULL arm so it doesn't coerce missing text to 0); an EMPTY
    * text is a real document with 0 tokens on both sides. */
  def taBpeTokens(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("toks", expr("regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9 ])', 1)"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        expr("size(filter(toks, t -> t rlike '^[A-Za-z]+$'))").cast("long").as("n_alpha"),
        expr("size(filter(toks, t -> t rlike '^[0-9]+$'))").cast("long").as("n_num"),
        expr("size(filter(toks, t -> not (t rlike '^[A-Za-z0-9]')))").cast("long").as("n_punct"),
        expr("aggregate(toks, 0L, (acc, t) -> acc + length(t))").as("n_chars_tok"))
      .orderBy("doc_id")

  private val taBpeTokensSql: String =
    """SELECT doc_id,
      |  len(toks)::BIGINT AS n_tokens,
      |  len(list_filter(toks, t -> regexp_matches(t, '^[A-Za-z]+$')))::BIGINT AS n_alpha,
      |  len(list_filter(toks, t -> regexp_matches(t, '^[0-9]+$')))::BIGINT AS n_num,
      |  len(list_filter(toks, t -> NOT regexp_matches(t, '^[A-Za-z0-9]')))::BIGINT AS n_punct,
      |  (CASE WHEN toks IS NULL THEN NULL
      |        ELSE coalesce(list_sum(list_transform(toks, t -> len(t))), 0)
      |   END)::BIGINT AS n_chars_tok
      |FROM (SELECT doc_id,
      |        regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9 ])', 1) AS toks
      |      FROM documents) t
      |ORDER BY doc_id""".stripMargin

  /** The custom Catalyst expression exercised through the pure-SQL
    * surface: `word_shingles` is registered as a session SQL function
    * ([[graft.plans.GraftExtensions]]) and invoked from `spark.sql` —
    * the path a SQL-only consumer of this library uses. Per-language
    * shingle totals; short documents contribute empty arrays (size 0),
    * matching the oracle's comprehension semantics. */
  def taSqlShingles(spark: SparkSession, sfDir: String): DataFrame = {
    graft.plans.GraftExtensions.register(spark)
    Tables.documents(spark, sfDir).createOrReplaceTempView("graft_sql_docs")
    spark.sql(
      """SELECT lang, count(*) AS n_docs,
        |  sum(size(word_shingles(text, 3))) AS n_shingles
        |FROM graft_sql_docs GROUP BY lang ORDER BY lang""".stripMargin)
  }

  private val taSqlShinglesSql: String =
    """SELECT lang, count(*) AS n_docs,
      |  sum(len(list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
      |      for i in generate_series(1, len(w) - 2)])))::BIGINT AS n_shingles
      |FROM (SELECT lang, string_split(text, ' ') AS w FROM documents) t
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Document chunking into overlapping token windows (the unit-of-work
    * split every embedding/training pipeline runs before vectorizing):
    * windows of [[ChunkW]] tokens every [[ChunkS]] (16-token overlap),
    * the final short window kept. Pure per-row explode — chunk count
    * per doc is ceil((n−W)/S)+1 — so it is map-side at any corpus
    * size; no shuffle except the presentation sort. */
  private val ChunkW = 64
  private val ChunkS = 48

  def taChunk(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("toks", Text.tokens(col("text")))
      .withColumn("chunk_id", explode(expr(
        s"sequence(0, CASE WHEN size(toks) <= $ChunkW THEN 0 " +
          s"ELSE (size(toks) - $ChunkW + $ChunkS - 1) div $ChunkS END)")))
      .withColumn("chunk", expr(s"slice(toks, chunk_id * $ChunkS + 1, $ChunkW)"))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        size(col("chunk")).cast("long").as("n_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
      .orderBy("doc_id", "chunk_id")

  private val taChunkSql: String =
    s"""SELECT doc_id, cid::BIGINT AS chunk_id,
       |  len(w[cid * $ChunkS + 1 : cid * $ChunkS + $ChunkW])::BIGINT AS n_tokens,
       |  array_to_string(w[cid * $ChunkS + 1 : cid * $ChunkS + $ChunkW], ' ') AS chunk_text
       |FROM (SELECT doc_id, w, unnest(generate_series(0,
       |        CASE WHEN len(w) <= $ChunkW THEN 0
       |             ELSE (len(w) - $ChunkW + $ChunkS - 1) // $ChunkS END)) AS cid
       |      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) t) u
       |ORDER BY doc_id, chunk_id""".stripMargin

  /** Sequence packing: assign documents to fixed token-budget bins
    * ([[PackBudget]]) by running prefix-sum order within each source
    * stream — the batch-construction step that keeps training batches
    * dense. Windowed per `source` (not globally) so the prefix sums
    * parallelize across streams at scale; assignment is deterministic
    * in (source, doc_id) order. */
  private val PackBudget = 1024L

  def taPackBins(spark: SparkSession, sfDir: String): DataFrame = {
    val before = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, sfDir)
      .withColumn("n_tokens", size(Text.tokens(col("text"))).cast("long"))
      .withColumn("cum0", coalesce(sum(col("n_tokens")).over(before), lit(0L)))
      .select(col("source"), col("doc_id"), col("n_tokens"),
        expr(s"cum0 div $PackBudget").as("bin"),
        (col("cum0") % PackBudget).as("bin_offset"))
      .orderBy("source", "doc_id")
  }

  private val taPackBinsSql: String =
    s"""SELECT source, doc_id, n_tokens,
       |  (cum0 // $PackBudget)::BIGINT AS bin, (cum0 % $PackBudget)::BIGINT AS bin_offset
       |FROM (SELECT source, doc_id, n_tokens,
       |        coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum0
       |      FROM (SELECT source, doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
       |            FROM documents) t) u
       |ORDER BY source, doc_id""".stripMargin

  /** Repetition-based quality signals (the Gopher/MassiveText-style
    * repetition gate, distinct from [[taQuality]]'s length/stopword
    * features): per document, the share of word bigrams taken by the
    * single most frequent bigram (`top_bigram_frac`) and the share of
    * adjacent token positions that repeat the previous token
    * (`dup_adjacent_frac` — catches "batch batch batch" runs), plus the
    * boolean gate a curation pipeline would filter on. The fixture text
    * has no newlines, so the line-level variants of these rules are
    * vacuous here; the n-gram forms are the load-bearing ones.
    *
    * Shape at scale: bigram construction is a per-row projection
    * (no shuffle), then one partial-aggregated groupBy on
    * (doc_id, bigram) and one on doc_id — both keyed by doc, both
    * map-side combinable. Fractions are single integer-over-integer
    * divisions, bit-equal across engines. */
  def taRepetition(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.documents(spark, sfDir)
      .withColumn("toks", Text.tokens(col("text")))
      .filter(size(col("toks")) >= 2)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("dup_adjacent_n",
        expr("size(filter(sequence(1, size(toks) - 1), i -> toks[i] = toks[i - 1]))")
          .cast("long"))
      .select(col("doc_id"), col("n_tokens"), col("dup_adjacent_n"),
        explode(expr(
          "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
          .as("g"))
    base.groupBy("doc_id", "n_tokens", "dup_adjacent_n", "g")
      .agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "n_tokens", "dup_adjacent_n")
      .agg(count(lit(1)).as("n_distinct_bigrams"), max(col("c")).as("top_bigram_n"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - 1).as("n_bigrams"),
        col("n_distinct_bigrams"),
        col("top_bigram_n"),
        (col("top_bigram_n").cast("double") / (col("n_tokens") - 1)).as("top_bigram_frac"),
        col("dup_adjacent_n"),
        (col("dup_adjacent_n").cast("double") / (col("n_tokens") - 1)).as("dup_adjacent_frac"),
        (col("top_bigram_n").cast("double") / (col("n_tokens") - 1) >= 0.1)
          .as("flag_repetitive"))
      .orderBy("doc_id")
  }

  private val taRepetitionSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents
      |           WHERE len(string_split(text, ' ')) >= 2),
      |b AS (SELECT doc_id, len(w)::BIGINT AS n_tokens,
      |        len([i for i in generate_series(2, len(w)) if w[i] = w[i-1]])::BIGINT
      |          AS dup_adjacent_n,
      |        unnest([w[i] || ' ' || w[i+1] for i in generate_series(1, len(w) - 1)]) AS g
      |      FROM t),
      |c AS (SELECT doc_id, n_tokens, dup_adjacent_n, g, count(*) AS c
      |      FROM b GROUP BY 1, 2, 3, 4)
      |SELECT doc_id, n_tokens, n_tokens - 1 AS n_bigrams,
      |  count(*)::BIGINT AS n_distinct_bigrams,
      |  max(c)::BIGINT AS top_bigram_n,
      |  max(c)::DOUBLE / (n_tokens - 1) AS top_bigram_frac,
      |  dup_adjacent_n,
      |  dup_adjacent_n::DOUBLE / (n_tokens - 1) AS dup_adjacent_frac,
      |  max(c)::DOUBLE / (n_tokens - 1) >= 0.1 AS flag_repetitive
      |FROM c GROUP BY doc_id, n_tokens, dup_adjacent_n
      |ORDER BY doc_id""".stripMargin

  /** TF-IDF: top-3 terms per document. The idf is the LOG-FREE rational
    * form `N / df` (a monotone transform of the classic `ln(N/df)`, so
    * rankings are identical) — deliberately, because `ln` is a libm call
    * whose last-bit rounding is not guaranteed identical across engines,
    * which would break the hash-exact oracle compare; every operation
    * here is integer counting plus one division and one multiplication
    * performed in the same order by both engines.
    *
    * Shape at scale: explode → (doc, term) partial-agg count (the only
    * payload shuffle, keyed by high-cardinality term pairs), a term-keyed
    * df aggregate AQE can broadcast, a ONE-ROW corpus-count broadcast
    * (the scalar-subquery plan, whitelisted in PlanSpec), and a
    * per-document window for the top-3 — no global sort. */
  def taTfidf(spark: SparkSession, sfDir: String): DataFrame = {
    val tok = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("term"))
    // tf feeds BOTH the score join and the df aggregate — without the
    // (query-scoped, harness-released) persist the whole explode+count
    // subtree runs twice
    val tf = Scratch.persist(tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf")))
    val df = tf.groupBy(col("term").as("dterm")).agg(count(lit(1)).as("df"))
    val n = Tables.documents(spark, sfDir).agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(df, col("term") === col("dterm")).drop("dterm")
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") * (col("n_docs").cast("double") / col("df").cast("double")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select("doc_id", "rk", "term", "tf", "df", "score")
      .orderBy("doc_id", "rk")
  }

  private val taTfidfSql: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
      |df AS (SELECT term AS dterm, count(*)::BIGINT AS df FROM tf GROUP BY 1),
      |n AS (SELECT count(*)::BIGINT AS n_docs FROM documents)
      |SELECT doc_id, rk, term, tf, df, score FROM (
      |  SELECT doc_id, term, tf, df,
      |    tf::DOUBLE * (n_docs::DOUBLE / df::DOUBLE) AS score,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY tf::DOUBLE * (n_docs::DOUBLE / df::DOUBLE) DESC, term) AS rk
      |  FROM tf, df, n WHERE term = dterm) q
      |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin

  /** Query terms for [[taBm25]] — fixed at build time like a search
    * deployment's analyzed query; moderately common in the fixture
    * vocabulary so tf and length normalization, not mere presence,
    * decide the ranking. */
  private[operators] val Bm25Terms = Seq("customer", "stream", "window")

  /** BM25 keyword relevance (k1 = 1.2, b = 0.75) of every document for a
    * fixed 3-term query, top 25. The idf is the Robertson form WITHOUT
    * the log, `(N - df + 0.5) / (df + 0.5)` (same monotone-equivalence
    * argument as [[taTfidf]] — libm `ln` is not bit-portable), and the
    * 3 per-term scores are added as fixed-order column arithmetic, not a
    * float aggregation, so association order is identical in both
    * engines.
    *
    * Shape at scale: per-term tf and doclen are per-row projections over
    * ONE scan (no explode, no shuffle); corpus stats (N, df per term,
    * exact mean doclen) are a single 1-row aggregate broadcast into a
    * cross join (scalar-subquery plan, whitelisted); the top-25 is
    * TakeOrderedAndProject. */
  def taBm25(spark: SparkSession, sfDir: String): DataFrame =
    bm25Scored(spark, sfDir)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(25)

  /** The pre-top-k BM25 relation (doc_id, tf1..tf3, dl, score > 0) —
    * shared by [[taBm25]] and the hybrid-retrieval fusion in
    * [[Similarity.annRrfHybrid]]. */
  private[operators] def bm25Scored(spark: SparkSession, sfDir: String): DataFrame = {
    val perDoc = Tables.documents(spark, sfDir)
      .withColumn("toks", Text.tokens(col("text")))
      .select(Seq(col("doc_id"), size(col("toks")).cast("long").as("dl")) ++
        Bm25Terms.zipWithIndex.map { case (t, i) =>
          expr(s"size(filter(toks, x -> x = '$t'))").cast("long").as(s"tf${i + 1}")
        }: _*)
    val stats = perDoc.agg(
      count(lit(1)).as("n_docs"),
      count(when(col("tf1") > 0, lit(1))).as("df1"),
      count(when(col("tf2") > 0, lit(1))).as("df2"),
      count(when(col("tf3") > 0, lit(1))).as("df3"),
      Exact.exactAvg(col("dl"), 0).as("avgdl"))
    def termScore(i: Int): Column = {
      val tf = col(s"tf$i").cast("double")
      val df = col(s"df$i").cast("double")
      val idf = (col("n_docs").cast("double") - df + lit(0.5)) / (df + lit(0.5))
      idf * ((tf * lit(2.2)) / (tf + lit(1.2) *
        (lit(1.0) - lit(0.75) + lit(0.75) * col("dl").cast("double") / col("avgdl"))))
    }
    perDoc.crossJoin(broadcast(stats))
      .withColumn("score", termScore(1) + termScore(2) + termScore(3))
      .filter(col("score") > 0)
      .select("doc_id", "tf1", "tf2", "tf3", "dl", "score")
  }

  /** Oracle CTEs producing the same `bm` relation as [[bm25Scored]]. */
  private[operators] val bm25ScoredCtes: String = {
    val Seq(t1, t2, t3) = Bm25Terms
    def termScore(i: Int): String =
      s"(n_docs::DOUBLE - df$i::DOUBLE + 0.5) / (df$i::DOUBLE + 0.5) * " +
        s"((tf$i::DOUBLE * 2.2) / (tf$i::DOUBLE + 1.2 * " +
        "(1.0 - 0.75 + 0.75 * dl::DOUBLE / avgdl)))"
    s"""d AS (
       |  SELECT doc_id,
       |    len(list_filter(w, x -> x = '$t1'))::BIGINT AS tf1,
       |    len(list_filter(w, x -> x = '$t2'))::BIGINT AS tf2,
       |    len(list_filter(w, x -> x = '$t3'))::BIGINT AS tf3,
       |    len(w)::BIGINT AS dl
       |  FROM (SELECT doc_id, string_split(text, ' ') w FROM documents) t),
       |s AS (
       |  SELECT count(*)::BIGINT AS n_docs,
       |    count(CASE WHEN tf1 > 0 THEN 1 END)::BIGINT AS df1,
       |    count(CASE WHEN tf2 > 0 THEN 1 END)::BIGINT AS df2,
       |    count(CASE WHEN tf3 > 0 THEN 1 END)::BIGINT AS df3,
       |    ${Exact.sqlAvg("dl", 0)} AS avgdl
       |  FROM d),
       |bm AS (
       |  SELECT doc_id, tf1, tf2, tf3, dl, score FROM (
       |    SELECT doc_id, tf1, tf2, tf3, dl,
       |      ${termScore(1)} + ${termScore(2)} + ${termScore(3)} AS score
       |    FROM d, s) q
       |  WHERE score > 0)""".stripMargin
  }

  private val taBm25Sql: String =
    s"""WITH $bm25ScoredCtes
       |SELECT doc_id, tf1, tf2, tf3, dl, score FROM bm
       |ORDER BY score DESC, doc_id LIMIT 25""".stripMargin

  /** TOKENIZER-VOCABULARY COVERAGE: the top-100 corpus tokens by
    * frequency with each prefix's cumulative share of all token
    * occurrences — the curve a tokenizer team reads to size a
    * vocabulary ("how much of the stream do the first k entries
    * cover"). Counts are exact integers; the running sum is an exact
    * BIGINT window; each coverage value is ONE division of that exact
    * prefix by the exact total. One explode + one token-keyed count +
    * a top-k; the rank window runs over the bounded top-100 set. */
  def taVocabCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    val counts = Tables.documents(spark, sfDir)
      .select(explode(Text.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    val top = counts.orderBy(col("n").desc, col("tok")).limit(100)
    val w = Window.orderBy(col("n").desc, col("tok"))
    top
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum_n", sum(col("n")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .withColumn("coverage", col("cum_n").cast("double") / col("total"))
      .select("rank", "tok", "n", "cum_n", "coverage")
      .orderBy("rank")
  }

  private val taVocabCoverageSql: String =
    """WITH c AS (
      |  SELECT tok, count(*)::BIGINT AS n
      |  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents) t
      |  GROUP BY 1),
      |tot AS (SELECT sum(n)::BIGINT AS total FROM c),
      |top AS (SELECT tok, n FROM c ORDER BY n DESC, tok LIMIT 100)
      |SELECT row_number() OVER w::BIGINT AS rank, tok, n,
      |  sum(n) OVER (ORDER BY n DESC, tok
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_n,
      |  (sum(n) OVER (ORDER BY n DESC, tok
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE / total AS coverage
      |FROM top, tot
      |WINDOW w AS (ORDER BY n DESC, tok)
      |ORDER BY rank""".stripMargin

  /** Corpus-bigram language-model FLUENCY scoring — the n-gram-LM
    * quality gate (the KenLM-perplexity filter of CCNet/Gopher in a
    * bit-portable form): train add-one-smoothed bigram conditionals
    * p(w₂|w₁) = (c(w₁w₂)+1)/(c(w₁·)+V) on the corpus itself, score
    * each document by its MEAN bigram conditional probability.
    * Mean — not product — so nothing underflows and no log is needed;
    * the per-doc sum folds position-ordered probabilities left to
    * right (seeded 0.0), making the float accumulation
    * order-identical in both engines, and the final mean is one IEEE
    * division. High scores = documents built from corpus-common
    * transitions; low = disfluent/rare token soup.
    *
    * Shape at scale: bigrams are built MAP-SIDE (zip_with over the
    * token array — no self-join); the bigram-conditional table is one
    * (w₁,w₂) aggregation joined back on the bigram key; V is a 1-row
    * broadcast aggregate (whitelisted scalar plan); per-doc scoring is
    * one doc-keyed aggregation. Three shuffles total, all on keys the
    * aggregation needs anyway. */
  def taLmFluency(spark: SparkSession, sfDir: String): DataFrame = {
    // Tables.spread (r14): the tokenize/zip_with subtree ran on the
    // fixture's one scan split
    val docs = Tables.spread(spark, Tables.documents(spark, sfDir), col("doc_id"))
      .withColumn("toks", Text.tokens(col("text")))
      .filter(size(col("toks")) >= 2)
    // Scratch-persisted: consumed three times (bigram counts, context
    // counts, per-doc scoring join) — uncached, each consumer re-runs
    // the scan + zip_with + posexplode subtree (measured 4 scans /
    // 9 exchanges; persisted it is 2 scans and the groupings read the
    // cache). At 100 TB this is the explicit bigram staging table.
    val bi = graft.operators.Scratch.persist(docs.select(col("doc_id"), posexplode(expr(
        """zip_with(slice(toks, 1, size(toks) - 1), slice(toks, 2, size(toks) - 1),
          |(x, y) -> struct(x AS w1, y AS w2))""".stripMargin))
        .as(Seq("pos", "bg")))
      .select(col("doc_id"), col("pos"), col("bg.w1").as("w1"), col("bg.w2").as("w2")))
    val cnt = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
    val ctx = bi.groupBy("w1").agg(count(lit(1)).as("cs"))
    val vocab = docs.select(explode(col("toks")).as("tok"))
      .agg(countDistinct(col("tok")).as("vv"))
    val p = cnt.join(ctx, "w1").crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        ((col("c") + lit(1L)).cast("double") / (col("cs") + col("vv"))).as("p"))
    bi.join(p, Seq("w1", "w2"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_bigrams"),
        sort_array(collect_list(struct(col("pos"), col("p")))).as("ps"))
      .withColumn("fluency",
        expr("aggregate(ps, cast(0.0 as double), (acc, x) -> acc + x.p)") / col("n_bigrams"))
      .select("doc_id", "n_bigrams", "fluency")
      .orderBy("doc_id")
  }

  private val taLmFluencySql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |           WHERE len(string_split(text, ' ')) >= 2),
      |bg AS (SELECT doc_id,
      |         unnest([{'pos': i, 'w1': w[i], 'w2': w[i + 1]}
      |                 for i in generate_series(1, len(w) - 1)]) AS b
      |       FROM t),
      |bi AS (SELECT doc_id, b.pos AS pos, b.w1 AS w1, b.w2 AS w2 FROM bg),
      |cnt AS (SELECT w1, w2, count(*)::BIGINT AS c FROM bi GROUP BY 1, 2),
      |ctx AS (SELECT w1, count(*)::BIGINT AS cs FROM bi GROUP BY 1),
      |v AS (SELECT count(DISTINCT tok)::BIGINT AS vv
      |      FROM (SELECT unnest(w) AS tok FROM t) u),
      |p AS (SELECT cnt.w1, cnt.w2, (c + 1)::DOUBLE / (cs + vv) AS p
      |      FROM cnt JOIN ctx ON ctx.w1 = cnt.w1, v),
      |perdoc AS (
      |  SELECT doc_id, count(*)::BIGINT AS n_bigrams,
      |    list(p.p ORDER BY bi.pos) AS ps
      |  FROM bi JOIN p ON p.w1 = bi.w1 AND p.w2 = bi.w2
      |  GROUP BY doc_id)
      |SELECT doc_id, n_bigrams,
      |  list_reduce(ps, (x, y) -> x + y) / n_bigrams AS fluency
      |FROM perdoc ORDER BY doc_id""".stripMargin

  /** Token-diversity scoring via GINI IMPURITY, 1 − Σ p(term)², the
    * log-free stand-in for token entropy (same reason as [[taTfidf]]:
    * libm `ln` is not bit-portable, Gini ranks diversity with pure
    * rational arithmetic). All aggregation happens on exact integers
    * (Σcnt, Σcnt²); the single closing division is identical in both
    * engines. Shape: explode → (doc, term) partial-agg count → per-doc
    * agg — two doc-keyed shuffles, both map-side combinable. */
  def taDiversity(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("cnt") * col("cnt")).as("sum_sq"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"), col("sum_sq"),
        (lit(1.0) - col("sum_sq").cast("double") /
          (col("n_tokens") * col("n_tokens")).cast("double")).as("gini"))
      .orderBy("doc_id")

  private val taDiversitySql: String =
    """SELECT doc_id, n_tokens, n_distinct, sum_sq,
      |  1.0 - sum_sq::DOUBLE / (n_tokens * n_tokens)::DOUBLE AS gini
      |FROM (SELECT doc_id, sum(cnt)::BIGINT AS n_tokens, count(*) AS n_distinct,
      |        sum(cnt * cnt)::BIGINT AS sum_sq
      |      FROM (SELECT doc_id, term, count(*)::BIGINT AS cnt
      |            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |                  FROM documents) u
      |            GROUP BY doc_id, term) c
      |      GROUP BY doc_id) g
      |ORDER BY doc_id""".stripMargin

  /** Heavy hitters via the [[graft.plans.CmsAgg]] Count-Min sketch: one
    * pass builds the fixed-size (3×1024-counter) sketch, the exact
    * top-20 terms are then estimated from it, and the output carries
    * both the exact count and the sketch estimate plus the overcount
    * (≥ 0 by the CMS guarantee — a negative overcount anywhere means
    * the sketch is broken). The oracle REBUILDS the identical sketch in
    * SQL (the bucket hash is three disjoint 10-bit slices of the same
    * md5-derived hash60), so the custom aggregate's full
    * update/merge/eval path is hash-verified, not just sanity-checked.
    *
    * Shape at scale: the sketch pass aggregates to ONE 24 KB buffer via
    * map-side partial merge — no key shuffle at any cardinality (the
    * point of a sketch vs the exact groupBy, which this query also runs
    * but only to pick the 20 terms worth reporting); the 1-row sketch
    * broadcast is the scalar-subquery plan (whitelisted). */
  def taHeavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    val tok = Tables.documents(spark, sfDir)
      .select(explode(Text.tokens(col("text"))).as("term"))
      .withColumn("h", expr(Text.hash60SparkSql("term")))
    val sketch = tok.agg(graft.plans.CmsAgg.cms(col("h")).as("sk"))
    val top = tok.groupBy("term", "h").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("term")).limit(20)
    top.crossJoin(broadcast(sketch))
      .withColumn("cms_est", least(
        expr("sk[cast((h & 1023) as int)]"),
        expr("sk[cast(1024 + (shiftright(h, 10) & 1023) as int)]"),
        expr("sk[cast(2048 + (shiftright(h, 20) & 1023) as int)]")))
      .select(col("term"), col("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("overcount"))
      .orderBy(col("exact_cnt").desc, col("term"))
  }

  private val taHeavyHittersSql: String = {
    val h = Text.hash60DuckSql("term")
    s"""WITH tok AS (
       |  SELECT term, $h AS h
       |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents) u),
       |ctr AS (
       |  SELECT d, (h >> (10 * d)) & 1023 AS b, count(*)::BIGINT AS c
       |  FROM tok, (SELECT unnest([0, 1, 2]) AS d) ds
       |  GROUP BY 1, 2),
       |top AS (
       |  SELECT term, h, count(*)::BIGINT AS exact_cnt
       |  FROM tok GROUP BY 1, 2
       |  ORDER BY exact_cnt DESC, term LIMIT 20)
       |SELECT term, exact_cnt, min(c)::BIGINT AS cms_est,
       |  (min(c) - exact_cnt)::BIGINT AS overcount
       |FROM top JOIN ctr ON ((top.h >> (10 * ctr.d)) & 1023) = ctr.b
       |GROUP BY term, exact_cnt
       |ORDER BY exact_cnt DESC, term""".stripMargin
  }

  /** RAKE KEYPHRASE EXTRACTION (Rose et al.'s Rapid Automatic Keyword
    * Extraction — the unsupervised keyphrase baseline every corpus
    * summary starts from): candidate phrases are maximal stopword-free
    * token runs; each word scores degree/frequency (degree = summed
    * length of the phrases it appears in); a phrase scores the sum of
    * its words' scores. The division is INTEGER floor division at 1e6
    * scale (`(degree·1e6) div freq`), so word and phrase scores are
    * exact integers and the ranking is bit-portable — the float-ratio
    * form would make the cross-word sum order-sensitive.
    *
    * Scale: phrase splitting is per-row (codegen'd regex/array ops, no
    * shuffle); word stats are one shuffle on the word key, phrase
    * scores one shuffle on the phrase key, both with map-side partials;
    * top-25 is TakeOrderedAndProject. */
  def taKeyphrase(spark: SparkSession, sfDir: String): DataFrame = {
    val inStops = stopwords.map(s => s"'$s'").mkString(", ")
    // one row per PHRASE OCCURRENCE (spread r14: the tokenize/split ran
    // on the fixture's one scan split)
    val ph = Scratch.persist(
      Tables.spread(spark, Tables.documents(spark, sfDir), col("doc_id"))
      .withColumn("toks", Text.tokens(col("text")))
      .withColumn("marked", expr(
        s"array_join(transform(toks, t -> case when t in ($inStops) then '|' else t end), ' ')"))
      .select(explode(split(col("marked"), " *\\| *")).as("p"))
      .withColumn("phrase", trim(col("p")))
      .filter(col("phrase") =!= "")
      .select("phrase"))
    // word stats over all occurrences: freq + degree
    val ws = ph
      .select(col("phrase"), size(split(col("phrase"), " ")).as("plen"))
      .select(explode(split(col("phrase"), " ")).as("word"), col("plen"))
      .groupBy("word")
      .agg(expr("cast((sum(plen) * 1000000) div count(1) as bigint)").as("wscore"))
    val occ = ph.groupBy("phrase").agg(count(lit(1)).as("n_occurrences"))
    // per-distinct-phrase word multiset (a repeated word counts twice,
    // as in RAKE), scored by joining the word table
    val score = occ.select("phrase")
      .select(col("phrase"), explode(split(col("phrase"), " ")).as("word"))
      .join(ws, "word")
      .groupBy("phrase").agg(sum(col("wscore")).as("score"))
    score.join(occ, "phrase")
      .withColumn("n_words", size(split(col("phrase"), " ")).cast("long"))
      .select("phrase", "n_words", "n_occurrences", "score")
      .orderBy(col("score").desc, col("phrase"))
      .limit(25)
  }

  private val taKeyphraseSql: String = {
    val inStops = stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH ph AS (
       |  SELECT trim(p) AS phrase FROM (
       |    SELECT unnest(string_split_regex(array_to_string(
       |      list_transform(string_split(text, ' '),
       |        t -> CASE WHEN t IN ($inStops) THEN '|' ELSE t END), ' '),
       |      ' *\\| *')) AS p
       |    FROM documents) t
       |  WHERE trim(p) <> ''),
       |pw AS (SELECT unnest(string_split(phrase, ' ')) AS word,
       |         len(string_split(phrase, ' ')) AS plen FROM ph),
       |ws AS (SELECT word, ((sum(plen) * 1000000) // count(*))::BIGINT AS wscore
       |       FROM pw GROUP BY 1),
       |occ AS (SELECT phrase, count(*)::BIGINT AS n_occurrences FROM ph GROUP BY 1),
       |ds AS (SELECT d.phrase, sum(ws.wscore)::BIGINT AS score FROM (
       |    SELECT phrase, unnest(string_split(phrase, ' ')) AS word
       |    FROM (SELECT phrase FROM occ) u) d
       |  JOIN ws USING (word) GROUP BY 1)
       |SELECT ds.phrase, len(string_split(ds.phrase, ' '))::BIGINT AS n_words,
       |  occ.n_occurrences, ds.score
       |FROM ds JOIN occ USING (phrase)
       |ORDER BY score DESC, phrase LIMIT 25""".stripMargin
  }

  /** One BPE merge-learning iteration: the corpus-wide adjacent
    * character-pair frequency table that byte-pair-encoding training
    * greedily merges from (the [[taBpeTokens]] twin APPLIES a
    * vocabulary; this op shows how one is LEARNED). Words are the
    * whitespace tokens lowercased and restricted to `[a-z]{2,20}` so
    * character positions are engine-portable (no multi-byte
    * disagreement); pairs enumerate as `substr(w, i, 2)` over a
    * generated index range — a codegen'd higher-order transform, no
    * UDF. Occurrence-weighted (real BPE counts every token instance).
    * Explode + one 2-char-key aggregation with map-side combine: the
    * shuffled keyspace is ≤ 26², constant in corpus size. */
  def taBpeLearn(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w0"))
      .select(lower(col("w0")).as("w"))
      .filter(col("w").rlike("^[a-z]{2,20}$"))
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))")).as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(25)

  private val taBpeLearnSql: String =
    """SELECT pair, count(*)::BIGINT AS n FROM (
      |  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
      |                               i -> substr(w, i, 2))) AS pair
      |  FROM (SELECT lower(unnest(string_split(text, ' '))) AS w FROM documents)
      |  WHERE regexp_full_match(w, '[a-z]{2,20}'))
      |GROUP BY pair ORDER BY n DESC, pair LIMIT 25""".stripMargin

  /** Flesch-style readability scoring per language — the classic
    * quality signal over (words, sentences, syllables). All three
    * counts are whole-text regexes (`[^ ]+` tokens, `[.!?]` sentence
    * ends floored at 1, `[aeiouy]+` vowel-group syllable proxy) so
    * both engines count the identical spans; per-language sums stay
    * exact BIGINT and the Flesch formula evaluates once per language
    * as a fixed IEEE expression over those sums — bit-equal. Pure
    * map-side regex counting + one language-keyed aggregate-sized
    * shuffle; at corpus scale this is scan-bound. */
  def taReadability(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("lang"),
        expr("cast(regexp_count(text, '[^ ]+') as bigint)").as("w"),
        expr("cast(greatest(regexp_count(text, '[.!?]'), 1) as bigint)").as("s"),
        expr("cast(regexp_count(lower(text), '[aeiouy]+') as bigint)").as("y"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("w").as("words"),
        sum("s").as("sentences"), sum("y").as("syllables"))
      .withColumn("flesch", expr(
        """206.835 - 1.015 * (cast(words as double) / cast(sentences as double))
          |- 84.6 * (cast(syllables as double) / cast(words as double))""".stripMargin))
      .orderBy("lang")

  private val taReadabilitySql: String =
    """WITH d AS (
      |  SELECT lang,
      |    len(regexp_extract_all(text, '[^ ]+'))::BIGINT AS w,
      |    greatest(len(regexp_extract_all(text, '[.!?]')), 1)::BIGINT AS s,
      |    len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT AS y
      |  FROM documents)
      |SELECT lang, count(*)::BIGINT AS n_docs, sum(w)::BIGINT AS words,
      |  sum(s)::BIGINT AS sentences, sum(y)::BIGINT AS syllables,
      |  206.835 - 1.015 * (sum(w)::BIGINT::DOUBLE / sum(s)::BIGINT::DOUBLE)
      |    - 84.6 * (sum(y)::BIGINT::DOUBLE / sum(w)::BIGINT::DOUBLE) AS flesch
      |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  /** WINNOWING fingerprints (Schleimer/Wilkerson/Aiken SIGMOD'03 — the
    * MOSS algorithm): over each document's POSITIONAL word-3-gram hash
    * sequence, keep the minimum hash of every length-4 sliding window;
    * the distinct selected hashes are local fingerprints with the
    * guarantee that any shared run of ≥ 6 words between two documents
    * shares a fingerprint — the partial-copy detection primitive that
    * whole-document hashing ([[taFingerprint]]) structurally cannot
    * provide and set-Jaccard only approximates. Documents shorter than
    * one window contribute their global minimum (the standard
    * degenerate case).
    *
    * The whole selection is higher-order array algebra inside ONE
    * codegen'd projection — positional grams, windowed mins, distinct,
    * checksum — zero shuffles, zero explodes; at 100 TB this is a
    * map-only pass whose output (doc_id + counts + checksum) is
    * index-sized. The md5-derived gram hash is engine-identical, so
    * the fingerprint CHECKSUM is oracle-verified, not just counts. */
  def taWinnowing(spark: SparkSession, sfDir: String): DataFrame = {
    val gram = "concat_ws(' ', element_at(toks, cast(i as int)), " +
      "element_at(toks, cast(i as int) + 1), element_at(toks, cast(i as int) + 2))"
    // Tables.spread (r14): the per-doc gram-hash/window-min algebra is
    // the query's whole cost and ran on the fixture's one split (twice,
    // counting the range sort's sampling pass)
    Tables.spread(spark, Tables.documents(spark, sfDir), col("doc_id"))
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .withColumn("grams", expr(
        s"transform(sequence(1, size(toks) - 2), i -> ${Text.hash60SparkSql(gram)})"))
      .withColumn("fps", expr(
        """array_distinct(transform(sequence(1, greatest(size(grams) - 3, 1)),
          |  j -> array_min(slice(grams, cast(j as int), 4))))""".stripMargin))
      .select(col("doc_id"),
        size(col("grams")).cast("long").as("n_grams"),
        size(col("fps")).cast("long").as("n_fp"),
        expr("aggregate(transform(fps, x -> x % 1000000007), 0L, (a, b) -> a + b)")
          .as("fp_check"))
      .orderBy("doc_id")
  }

  private val taWinnowingSql: String = {
    val gramHash = "('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 15))::BIGINT"
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |g AS (SELECT doc_id,
       |  [$gramHash for i in generate_series(1, len(w) - 2)] AS grams
       |  FROM t WHERE len(w) >= 3),
       |f AS (SELECT doc_id, len(grams)::BIGINT AS n_grams,
       |  list_distinct([list_min(grams[j:j+3])
       |    for j in generate_series(1, greatest(len(grams) - 3, 1))]) AS fps
       |  FROM g)
       |SELECT doc_id, n_grams, len(fps)::BIGINT AS n_fp,
       |  list_sum(list_transform(fps, x -> x % 1000000007))::BIGINT AS fp_check
       |FROM f ORDER BY doc_id""".stripMargin
  }

  /** CODE-vs-PROSE detection — the corpus-composition gate every LLM
    * data pipeline runs to route documents to the right mixture bucket
    * (code is upsampled or downsampled deliberately, never by
    * accident). Heuristic: density of code-punctuation characters
    * (`{}();=<>#&|` — braces, statement/assignment/comparison/pipe
    * glyphs rare in natural prose, dense in every mainstream language's
    * source). A doc is flagged code iff symbols ≥ 5% of characters,
    * expressed as the integer cross-multiplication `n_sym·20 ≥ n_chars`
    * (no float threshold). The per-lang report's permille column is
    * integer-scaled and divided ONCE.
    *
    * The character class is spelled identically for Java regex and RE2
    * (all members are literal inside a class in both dialects), so the
    * two engines count the same symbols. Shape at scale: pure map-side
    * per-doc arithmetic + one 5-row aggregation; the text never
    * shuffles. */
  def taCodeDetect(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("n_sym",
        length(regexp_replace(col("text"), "[^{}();=<>#&|]", "")).cast("long"))
      .withColumn("is_code", (col("n_sym") * lit(20L) >= col("n_chars")).cast("long"))
      .groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(col("is_code")).as("n_code"),
        sum(col("n_sym")).as("sum_sym"),
        sum(col("n_chars")).as("sum_chars"),
        max(col("n_sym")).as("max_sym"))
      .withColumn("sym_permille",
        (col("sum_sym") * lit(1000L)).cast("double") / col("sum_chars").cast("double"))
      .select("lang", "n_docs", "n_code", "max_sym", "sym_permille")
      .orderBy("lang")

  private val taCodeDetectSql: String =
    """WITH d AS (
      |  SELECT lang, n_chars,
      |    len(regexp_replace(text, '[^{}();=<>#&|]', '', 'g'))::BIGINT AS n_sym
      |  FROM documents)
      |SELECT lang, count(*)::BIGINT AS n_docs,
      |  sum(CASE WHEN n_sym * 20 >= n_chars THEN 1 ELSE 0 END)::BIGINT AS n_code,
      |  max(n_sym)::BIGINT AS max_sym,
      |  (sum(n_sym)::BIGINT * 1000)::DOUBLE / sum(n_chars)::BIGINT::DOUBLE AS sym_permille
      |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  /** LANGUAGE-ID EVALUATION — the confusion matrix over
    * [[taLangId]]'s predictions against the corpus's labeled `lang`
    * column, the QA artifact a pipeline owner reads before trusting a
    * classifier to route documents ([[cuTemperatureMix]]-style
    * mixture decisions are only as good as this matrix). One row per
    * (truth, prediction) cell with the within-truth rate; `cell_rate`
    * on the diagonal is per-language recall. Counts exact; each rate
    * is ONE double division. Shape at scale: the per-doc scoring is
    * [[taLangId]]'s map-side filter counts; the matrix aggregation
    * shuffles ≤ langs² bounded cells with map-side partials. */
  def taLangidEval(spark: SparkSession, sfDir: String): DataFrame = {
    val wLang = Window.partitionBy("lang")
    taLangId(spark, sfDir)
      .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
      .withColumn("n_lang", sum(col("n")).over(wLang))
      .withColumn("cell_rate", col("n").cast("double") / col("n_lang").cast("double"))
      .select("lang", "pred_lang", "n", "cell_rate")
      .orderBy("lang", "pred_lang")
  }

  private val taLangidEvalSql: String =
    s"""WITH pred AS ($taLangIdSql),
       |cells AS (
       |  SELECT lang, pred_lang, count(*)::BIGINT AS n
       |  FROM pred GROUP BY 1, 2)
       |SELECT lang, pred_lang, n,
       |  n::DOUBLE / (sum(n) OVER (PARTITION BY lang))::BIGINT::DOUBLE AS cell_rate
       |FROM cells ORDER BY lang, pred_lang""".stripMargin

  /** DUPLICATE-NGRAM EXCESS FRACTION — the OTHER Gopher repetition
    * rule next to [[taRepetition]]'s adjacent/top-bigram gates: how
    * much of a document is excess re-occurrence of its own 3-grams
    * (`dup_frac = 3·(n_grams − n_distinct_grams) / n_tokens`), the
    * signal that catches looping generation and copy-pasted blocks
    * that adjacent-duplicate checks miss (the repeats need not be
    * adjacent). Entirely MAP-SIDE: the gram list and its distinct
    * count are per-row array ops (Spark `array_distinct`, DuckDB
    * `list_distinct` — both preserve exact equality semantics on
    * strings), so the corpus never shuffles; the only shuffle is the
    * 20-row top-k. Integer arithmetic until ONE double division. */
  def taDupFraction(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("toks", Text.tokens(col("text")))
      .filter(size(col("toks")) >= 3)
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("grams", expr(
        "transform(sequence(1, size(toks) - 2), i -> concat_ws(' ', slice(toks, i, 3)))"))
      .withColumn("n_grams", size(col("grams")).cast("long"))
      .withColumn("n_dup_excess",
        (col("n_grams") - size(array_distinct(col("grams")))).cast("long"))
      .withColumn("dup_frac",
        (col("n_dup_excess") * lit(3L)).cast("double") / col("n_tokens").cast("double"))
      .select("doc_id", "n_tokens", "n_grams", "n_dup_excess", "dup_frac")
      .orderBy(col("dup_frac").desc, col("doc_id")).limit(20)

  private val taDupFractionSql: String =
    """WITH g AS (
      |  SELECT doc_id, len(w)::BIGINT AS n_tokens,
      |    list_transform(generate_series(1, len(w) - 2),
      |      i -> array_to_string(w[i : i + 2], ' ')) AS grams
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents) t
      |  WHERE len(w) >= 3)
      |SELECT doc_id, n_tokens, len(grams)::BIGINT AS n_grams,
      |  (len(grams) - len(list_distinct(grams)))::BIGINT AS n_dup_excess,
      |  ((len(grams) - len(list_distinct(grams)))::BIGINT * 3)::DOUBLE
      |    / n_tokens::DOUBLE AS dup_frac
      |FROM g ORDER BY dup_frac DESC, doc_id LIMIT 20""".stripMargin

  /** UNICODE NFC NORMALIZATION — canonical-equivalence text cleanup via
    * the native [[graft.plans.NfcNormalize]] codegen expression (Spark
    * has no built-in; a Scala UDF would break whole-stage codegen).
    * `é` (U+00E9) and `e`+combining-acute (U+0301) are the same
    * character to a reader but different bytes to every hash-based
    * operator — exact dedup, MinHash shingles, BM25 terms all split on
    * un-normalized text, so NFC is the first map of a web-corpus
    * pipeline. The fixture text is ASCII (already NFC), so the entry
    * first DECOMPOSES it deterministically (every `e` gains U+0301) and
    * then verifies the normalizer re-composes: `len_raw − len_nfc`
    * equals the number of composed pairs, cross-checked against
    * DuckDB's built-in `nfc_normalize`. Entirely map-side — one
    * projection, no shuffle beyond the doc_id sort; at 100 TB the
    * already-NFC fast path (`Normalizer.isNormalized`, no allocation)
    * makes this a near-free scan. */
  def taUnicodeNorm(spark: SparkSession, sfDir: String): DataFrame = {
    graft.plans.GraftExtensions.register(spark)
    Tables.documents(spark, sfDir)
      .withColumn("raw", expr("replace(text, 'e', 'é')"))
      .withColumn("nfc", expr("nfc_normalize(raw)"))
      .select(col("doc_id"),
        length(col("raw")).cast("long").as("len_raw"),
        length(col("nfc")).cast("long").as("len_nfc"),
        (length(col("raw")) - length(col("nfc"))).cast("long").as("n_composed"),
        (col("nfc") =!= col("raw")).as("changed"))
      .orderBy("doc_id")
  }

  private val taUnicodeNormSql: String =
    """SELECT doc_id,
      |  length(raw)::BIGINT AS len_raw,
      |  length(nfc_normalize(raw))::BIGINT AS len_nfc,
      |  (length(raw) - length(nfc_normalize(raw)))::BIGINT AS n_composed,
      |  nfc_normalize(raw) <> raw AS changed
      |FROM (SELECT doc_id, replace(text, 'e', 'e' || chr(769)) AS raw
      |      FROM documents) t
      |ORDER BY doc_id""".stripMargin

  /** TOKENIZER FERTILITY — the standard tokenizer-evaluation statistic
    * (subword tokens emitted per whitespace word, per language): a
    * tokenizer with fertility ≫ 1 on a language inflates that
    * language's effective sequence lengths and training cost, which is
    * exactly what a mixture designer needs to see BEFORE fixing the
    * data budget (a corpus "balanced" in documents can be wildly
    * unbalanced in tokens). Uses the engine's BPE-ish regex tokenizer
    * (the [[taBpeTokens]] segmentation) over the whitespace word count,
    * plus compression (chars per subword). Map-side feature extraction
    * + one tiny per-lang aggregate; integers until the two final
    * divisions. */
  def taFertility(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("n_words", size(Text.tokens(col("text"))).cast("long"))
      .withColumn("n_sub",
        size(expr("regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9 ])', 1)")).cast("long"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_sub")).as("n_subwords"),
        sum(col("n_chars")).as("n_chars"))
      .withColumn("fertility",
        col("n_subwords").cast("double") / col("n_words").cast("double"))
      .withColumn("chars_per_subword",
        col("n_chars").cast("double") / col("n_subwords").cast("double"))
      .orderBy("lang")

  private val taFertilitySql: String =
    """SELECT lang, count(*)::BIGINT AS n_docs,
      |  sum(len(string_split(text, ' ')))::BIGINT AS n_words,
      |  sum(len(regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9 ])', 1)))::BIGINT
      |    AS n_subwords,
      |  sum(length(text))::BIGINT AS n_chars,
      |  sum(len(regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9 ])', 1)))::BIGINT::DOUBLE
      |    / sum(len(string_split(text, ' ')))::BIGINT::DOUBLE AS fertility,
      |  sum(length(text))::BIGINT::DOUBLE
      |    / sum(len(regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9 ])', 1)))::BIGINT::DOUBLE
      |    AS chars_per_subword
      |FROM documents GROUP BY lang ORDER BY lang""".stripMargin

  /** N-GRAM NOVELTY — per document, the fraction of its distinct word
    * 3-grams that appear for the FIRST time in the corpus (by doc_id
    * order): the curriculum/ordering signal behind "novelty decay"
    * dataset analyses — novelty near 0 marks documents whose content
    * the corpus has already seen even when no single near-duplicate
    * exists (the diffuse-redundancy case MinHash pair-finding misses
    * by design). First occurrence = min(doc_id) per shingle (one
    * hash-partitioned aggregation of the exploded shingle relation),
    * joined back on the SAME key — co-partitioned, no second shuffle
    * of the big side beyond the agg's own; counts exact, novelty one
    * double division. Native [[graft.plans.WordShingles]] produces the
    * distinct-shingle arrays map-side in codegen. */
  def taNgramNovelty(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = Text.shingled(spark, sfDir)
      .select(col("doc_id"), explode(col("sh")).as("g"))
    val first = pairs.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
    pairs.join(first, "g")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_distinct"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_distinct").cast("double"))
      .select("doc_id", "n_distinct", "n_novel", "novelty")
      .orderBy("doc_id")
  }

  private val taNgramNoveltySql: String =
    s"""WITH ${Text.shingleCteSql},
       |p AS (SELECT doc_id, unnest(s) AS g FROM sh),
       |f AS (SELECT g, min(doc_id) AS first_doc FROM p GROUP BY g)
       |SELECT p.doc_id, count(*)::BIGINT AS n_distinct,
       |  sum(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END)::BIGINT AS n_novel,
       |  sum(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END)::BIGINT::DOUBLE
       |    / count(*)::BIGINT::DOUBLE AS novelty
       |FROM p JOIN f ON f.g = p.g
       |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ta_ngram_novelty" -> (taNgramNovelty _),
    "ta_fertility" -> (taFertility _),
    "ta_unicode_norm" -> (taUnicodeNorm _),
    "ta_langid_eval" -> (taLangidEval _),
    "ta_dup_fraction" -> (taDupFraction _),
    "ta_code_detect" -> (taCodeDetect _),
    "ta_winnowing" -> (taWinnowing _),
    "ta_readability" -> (taReadability _),
    "ta_bpe_learn" -> (taBpeLearn _),
    "ta_heavy_hitters" -> (taHeavyHitters _),
    "ta_diversity" -> (taDiversity _),
    "ta_tfidf" -> (taTfidf _),
    "ta_bm25" -> (taBm25 _),
    "ta_lm_fluency" -> (taLmFluency _),
    "ta_vocab_coverage" -> (taVocabCoverage _),
    "ta_repetition" -> (taRepetition _),
    "ta_chunk" -> (taChunk _),
    "ta_pack_bins" -> (taPackBins _),
    "ta_sql_shingles" -> (taSqlShingles _),
    "ta_token_stats" -> (taTokenStats _),
    "ta_quality" -> (taQuality _),
    "ta_lang_id" -> (taLangId _),
    "ta_ngram_freq" -> (taNgramFreq _),
    "ta_collocations" -> (taCollocations _),
    "ta_keyphrase" -> (taKeyphrase _),
    "ta_fingerprint" -> (taFingerprint _),
    "ta_bpe_tokens" -> (taBpeTokens _))

  val oracles: Map[String, String] = Map(
    "ta_ngram_novelty" -> taNgramNoveltySql,
    "ta_fertility" -> taFertilitySql,
    "ta_unicode_norm" -> taUnicodeNormSql,
    "ta_langid_eval" -> taLangidEvalSql,
    "ta_dup_fraction" -> taDupFractionSql,
    "ta_code_detect" -> taCodeDetectSql,
    "ta_winnowing" -> taWinnowingSql,
    "ta_readability" -> taReadabilitySql,
    "ta_bpe_learn" -> taBpeLearnSql,
    "ta_heavy_hitters" -> taHeavyHittersSql,
    "ta_diversity" -> taDiversitySql,
    "ta_tfidf" -> taTfidfSql,
    "ta_bm25" -> taBm25Sql,
    "ta_lm_fluency" -> taLmFluencySql,
    "ta_vocab_coverage" -> taVocabCoverageSql,
    "ta_repetition" -> taRepetitionSql,
    "ta_chunk" -> taChunkSql,
    "ta_pack_bins" -> taPackBinsSql,
    "ta_sql_shingles" -> taSqlShinglesSql,
    "ta_token_stats" -> taTokenStatsSql,
    "ta_quality" -> taQualitySql,
    "ta_lang_id" -> taLangIdSql,
    "ta_ngram_freq" -> taNgramFreqSql,
    "ta_collocations" -> taCollocationsSql,
    "ta_keyphrase" -> taKeyphraseSql,
    "ta_fingerprint" -> taFingerprintSql,
    "ta_bpe_tokens" -> taBpeTokensSql)
}
