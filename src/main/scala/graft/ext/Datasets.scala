package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset assembly operators for training pipelines: reproducible
  * splitting and sampling. North-star extension (SURVEY.md §2.C).
  *
  * Both use MULTIPLICATIVE hashing of the record id (Knuth's 2654435761,
  * the golden-ratio constant) instead of an RNG: the assignment is a pure
  * per-row function — deterministic across runs, engines, partitionings
  * and cluster sizes, with no seed state to ship. Map-only, no shuffle;
  * scales linearly to any corpus size.
  */
object Datasets {

  /** Knuth's multiplicative-hash constant (2^32 / φ). */
  val GoldenRatioHash = 2654435761L
  /** DISTINCT multiplier for [[mixCorpus]]'s fractional-copy bucket so
    * corpus mixing and train/valid/test splitting draw independent
    * selections from the same id. It must be a different MULTIPLIER, not
    * an additive salt: (id+s)·K mod 1000 is only a constant rotation of
    * id·K mod 1000 (still perfectly correlated — a fractional weight
    * would again delete whole splits); a second multiplier coprime to
    * 1000 is a genuinely different bijection of the residues.
    */
  val MixHash = 2654435789L

  /** Per-mille bucket of an integer id — the basis for splits/samples.
    * ids are bounded well below 2^31 in practice so the product stays in
    * long range; callers with arbitrary longs should pre-fold.
    */
  def permilleBucket(id: Column): Column = pmod(id * GoldenRatioHash, lit(1000L))

  /** Deterministic train/valid/test assignment by per-mille thresholds
    * (defaults 80/10/10).
    */
  def deterministicSplit(
      df: DataFrame,
      idCol: String = "doc_id",
      trainPermille: Int = 800,
      validPermille: Int = 900
  ): DataFrame = {
    val b = permilleBucket(col(idCol))
    df.withColumn("split",
      when(b < trainPermille, "train").when(b < validPermille, "valid").otherwise("test"))
  }

  /** Deterministic sample: keep rows whose per-mille bucket falls below
    * the rate. Same rows selected on every engine and every run.
    */
  def hashSample(df: DataFrame, permille: Int, idCol: String = "doc_id"): DataFrame =
    df.where(permilleBucket(col(idCol)) < permille)

  /** Stratified deterministic sampling: a per-label keep rate (per mille),
    * labels absent from `rates` keep `defaultPermille` — the standard
    * corpus-rebalancing step (e.g. downsample the dominant language,
    * keep the tail whole). Same multiplicative-hash basis as
    * [[hashSample]]: per-label selections are NESTED as the rate grows
    * (raising one label's rate only adds rows), and assignment stays a
    * pure per-row function — map-only, no shuffle, engine- and
    * partitioning-independent.
    */
  def stratifiedSample(
      df: DataFrame,
      rates: Map[String, Int],
      labelCol: String = "lang",
      idCol: String = "doc_id",
      defaultPermille: Int = 1000
  ): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPermille).cast("long")) {
      case (acc, (label, p)) => when(col(labelCol) === label, lit(p.toLong)).otherwise(acc)
    }
    df.where(permilleBucket(col(idCol)) < rate)
  }

  /** Exact-size deterministic per-group sample: the `k` rows of each label
    * with the smallest multiplicative id hash (id tiebreak — the hash is
    * injective for ids < 2^32 so ties cannot occur, but belt and braces).
    * Unlike rate-based [[stratifiedSample]] this carves a FIXED budget per
    * group (eval slices, per-domain probes) and is nested: k+1 adds one
    * row. One per-label window over the same exchange a groupBy would
    * need; groups far larger than k should pre-filter with a permille
    * rate first (hash monotonicity makes that sound: the k smallest
    * hashes survive any rate ≥ k/n).
    */
  def fixedSizeSample(
      df: DataFrame,
      k: Int,
      labelCol: String = "lang",
      idCol: String = "doc_id"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hk = pmod(col(idCol) * GoldenRatioHash, lit(4294967296L))
    val w = Window.partitionBy(col(labelCol)).orderBy(hk, col(idCol))
    df.withColumn("_rn", row_number().over(w)).where(col("_rn") <= k).drop("_rn")
  }

  /** Deterministic weighted sample without replacement — Efraimidis &
    * Spirakis A-Res (IPL 2006): each row gets key u^(1/w) for u uniform in
    * (0,1] and weight w > 0; the k largest keys are an exact weighted
    * sample. u comes from the multiplicative id hash (not an RNG), so the
    * draw is a pure per-row function, reproducible across engines and
    * cluster sizes like everything else here. The heavy lifting is a
    * global top-k — Spark plans orderBy+limit as per-partition heaps plus
    * a driver merge of k rows (TakeOrderedAndProject), never a full sort,
    * so the shape holds at any corpus size for k ≪ data.
    *
    * Rows with NULL or non-positive weight are excluded (a zero-weight row
    * by definition cannot be drawn). Typical weights: token counts (sample
    * proportional to training contribution), quality scores.
    *
    * Bounds and caveats (shared with [[weightedSamplePerGroup]]):
    *  - `idCol * 2654435761` must not overflow Long, so ids must stay below
    *    ~3.46e9 (`Long.MaxValue / 2654435761`). Larger id spaces should be
    *    pre-folded first (e.g. `pmod(xxhash64(id), 2^31)`), the same bound
    *    permilleBucket documents for its hash.
    *  - The key `pow(u, 1/w)` is a transcendental: when a cross-engine
    *    comparison sits EXACTLY at the k-th cut boundary, Spark's
    *    `Math.pow` and another engine's libm may disagree in the last ulp
    *    and swap the boundary row. With the id tiebreaker and real-valued
    *    weights a tie is measure-zero in practice, but the gate is
    *    empirical, not a proof — unlike bm25's rational idf, which was
    *    chosen precisely to avoid this class of drift.
    */
  def weightedSample(
      df: DataFrame,
      k: Int,
      weightCol: String,
      idCol: String = "doc_id"
  ): DataFrame = {
    require(!df.columns.contains("_wkey"), "column _wkey is reserved by weightedSample")
    val u = (pmod(col(idCol) * GoldenRatioHash, lit(4294967296L)) + 1.0) / 4294967297.0
    val key = pow(u, lit(1.0) / col(weightCol).cast("double"))
    df.where(col(weightCol).isNotNull && col(weightCol).cast("double") > 0)
      .withColumn("_wkey", key)
      .orderBy(col("_wkey").desc, col(idCol))
      .limit(k)
      .drop("_wkey")
  }

  /** [[weightedSample]] with a FIXED budget per group (per-source /
    * per-language sampling quotas): the k largest A-Res keys within each
    * label. Runs through the bounded-heap grouped top-k
    * ([[graft.ops.TopK.topKPerGroup]]) rather than a per-group window
    * sort, so the shuffle carries ≤ k candidates per group per input
    * partition — groups of any size never sort fully. The id joins the
    * heap ordering as tiebreaker (descending, like all heap order
    * columns), keeping the draw total and deterministic.
    */
  def weightedSamplePerGroup(
      df: DataFrame,
      k: Int,
      weightCol: String,
      labelCol: String = "lang",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(!df.columns.contains("_wkey"), "column _wkey is reserved by weightedSamplePerGroup")
    val u = (pmod(col(idCol) * GoldenRatioHash, lit(4294967296L)) + 1.0) / 4294967297.0
    val key = pow(u, lit(1.0) / col(weightCol).cast("double"))
    val withKey = df.where(col(weightCol).isNotNull && col(weightCol).cast("double") > 0)
      .withColumn("_wkey", key)
    graft.ops.TopK.topKPerGroup(withKey, Seq(labelCol), Seq("_wkey", idCol), k)
      .drop("_wkey")
  }

  /** Distributed prefix sum of a numeric column in `idCol` order — the
    * scalable cumulative sum a single `Window.orderBy` (one task holding
    * the whole corpus) cannot provide. Two passes:
    *
    *   1. bucket ids into `numRanges` contiguous ranges split at
    *      approximate id quantiles (balanced by row count — see
    *      [[quantileBoundaries]]); per-range totals are one hash aggregation
    *      whose result (≤ numRanges rows) is collected and prefix-scanned
    *      on the driver — bounded by the range count, never by data size;
    *   2. a per-range window cumsum (partitionBy range, orderBy id — each
    *      range is one ordinary window partition) plus the per-range
    *      offset attached via a BROADCAST equi-join on the range id
    *      (constant per-row cost however large `numRanges` grows — a
    *      literal `when`-chain would be O(numRanges) per row and break
    *      codegen at high range counts).
    *
    * The result depends only on the id ordering, not on partitioning,
    * bucketing or cluster size. Returns the input plus `<outCol>` = sum of
    * `valueCol` over all rows with smaller id (exclusive prefix sum).
    */
  def prefixSum(
      df: DataFrame,
      valueCol: String,
      idCol: String = "doc_id",
      outCol: String = "prefix_sum",
      numRanges: Int = 256
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // cheap emptiness probe (limit-1 take), not a full min/max scan — the
    // quantile pass is the only whole-input read before the cumsum
    if (df.where(col(idCol).isNotNull).isEmpty) return df.withColumn(outCol, lit(0L))
    val interior = quantileBoundaries(df, idCol, numRanges)
    // _rg = number of interior boundaries at or below this id — a single
    // array scan over ≤ numRanges-1 broadcast literals, contiguous by
    // construction.
    val ranged = df.withColumn("_rg",
      if (interior.isEmpty) lit(0)
      else size(filter(typedLit(interior.toSeq), b => col(idCol).cast("long") >= b)))
    // NULL values read as 0: sum() over an all-NULL range returns NULL
    // (driver NPE on getLong), and per-row NULLs would silently NULL every
    // downstream cumulative sum.
    val v0 = coalesce(col(valueCol).cast("long"), lit(0L))
    val totals = ranged.groupBy(col("_rg")).agg(sum(v0).as("_t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.map(_._1).zip(totals.map(_._2).scanLeft(0L)(_ + _))
    val spark = df.sparkSession
    import spark.implicits._
    val offsetsDf = offsets.toSeq.toDF("_rg", "_off")
    val w = Window.partitionBy(col("_rg")).orderBy(col(idCol))
    ranged
      .join(broadcast(offsetsDf), Seq("_rg"))
      .withColumn(outCol,
        col("_off") + sum(v0).over(w) - v0)
      .drop("_rg", "_off")
  }

  /** Distinct sorted interior boundaries at id quantiles i/numRanges
    * (Greenwald-Khanna, one pass). Quantile (row-count) splits, not
    * span-uniform ones: a clustered id distribution — all ids packed into
    * 1 % of the span — would land every row in one span-uniform range and
    * hand the per-range window cumsum to a single straggler task, while
    * quantile boundaries stay balanced under any distribution. Boundary
    * placement only affects load balance, never the result (the prefix
    * sum depends solely on the id ordering), so the approximation is
    * harmless.
    */
  private[graft] def quantileBoundaries(df: DataFrame, idCol: String, numRanges: Int): Array[Long] =
    if (numRanges <= 1) Array.empty
    else {
      val probs = (1 until numRanges).map(_.toDouble / numRanges).toArray
      df.select(col(idCol).cast("double").as("_idq")).stat
        .approxQuantile("_idq", probs, 0.25 / numRanges)
        .map(_.toLong).distinct.sorted
    }

  /** Sequence packing for training: assign each document a pack id so
    * that pack k holds the documents whose cumulative token START offset
    * (in `idCol` order) falls in `[k·budget, (k+1)·budget)` — the
    * deterministic block-packing used to cut fixed-length training
    * sequences from a corpus. Built on [[prefixSum]], so it scales to any
    * corpus (no single-task global window) and the assignment depends
    * only on the id order. A document straddling a boundary stays in the
    * pack its first token falls in (standard block semantics; the
    * training loader splits residuals).
    *
    * Output: id, `n_tokens` (whitespace tokens), `token_offset`
    * (exclusive prefix sum), `pack_id` (= token_offset div budget).
    */
  /** TOKEN-BUDGET sampling — "give me N tokens of this corpus": documents
    * are taken in deterministic multiplicative-hash order (unbiased w.r.t.
    * generation order; id tie-broken, so the order is total) until the
    * cumulative token count reaches `budgetTokens`. The document that
    * CROSSES the budget boundary is included (fill semantics — the loader
    * truncates); equivalently: keep rows whose exclusive prefix sum is
    * below the budget.
    *
    * 100 TB shape: ordering key is a pure per-row hash; the cumulative sum
    * is the distributed two-pass [[prefixSum]] (per-range windows + driver
    * scan of ≤ numRanges totals) — no global single-task window at any
    * corpus size. Output adds `n_tokens` from `tokenCol` and
    * `tokens_before` (exclusive prefix in sample order).
    */
  def tokenBudgetSample(
      docs: DataFrame,
      tokenCol: String,
      budgetTokens: Long,
      idCol: String = "doc_id"
  ): DataFrame = {
    // hash ∈ [0, 2^31) shifted left 32 bits + id < 2^32 stays inside Long:
    // a total order (hash, id) encoded in ONE column for prefixSum.
    val ord = pmod(col(idCol) * GoldenRatioHash, lit(2147483648L)) * lit(4294967296L) + col(idCol)
    // NULL token counts read as 0 (a doc whose count is unknown spends no
    // budget but is not silently DROPPED — NULL would poison every later
    // row's cumulative sum and filter them all out).
    prefixSum(
      docs.withColumn("_ord", ord)
        .withColumn("n_tokens", coalesce(col(tokenCol).cast("long"), lit(0L))),
      "n_tokens", "_ord", "tokens_before")
      .where(col("tokens_before") < budgetTokens)
      .drop("_ord")
  }

  def packSequences(
      docs: DataFrame,
      budgetTokens: Long,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val counted = docs.select(col(idCol),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    prefixSum(counted, "n_tokens", idCol, "token_offset")
      .withColumn("pack_id", floor(col("token_offset") / lit(budgetTokens)).cast("long"))
  }

  /** Weighted corpus mixing — the domain/epoch up- and down-sampling step
    * of pretraining data assembly: each label gets a target weight w;
    * every row is emitted `floor(w)` times plus one more with probability
    * `frac(w)`, decided by the same multiplicative id hash as
    * [[hashSample]] (deterministic, engine- and partitioning-independent;
    * w = 0.5 halves a domain, w = 2.3 repeats it 2.3 epochs). Map-side
    * `explode(sequence(...))` — no shuffle, output scales with Σ w·rows.
    * Output: input columns plus `copy_idx` (0 until the row's copy count).
    */
  def mixCorpus(
      df: DataFrame,
      weights: Map[String, Double],
      labelCol: String = "source",
      idCol: String = "doc_id",
      defaultWeight: Double = 1.0
  ): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0 && w <= 100),
      "weights must be in [0,100]")
    // Decorrelated bucket (see [[MixHash]]): with the split's own hash a
    // fractional weight w keeps exactly the rows whose split-bucket <
    // w·1000 — all 'train' rows under the split thresholds, deleting the
    // valid/test splits of that label entirely.
    def copies(w: Double): Column = {
      val whole = math.floor(w).toLong
      val fracPermille = math.round((w - whole) * 1000)
      val mixBucket = pmod(col(idCol) * MixHash, lit(1000L))
      lit(whole) + when(mixBucket < fracPermille, 1L).otherwise(0L)
    }
    val nCopies = weights.foldLeft(copies(defaultWeight)) {
      case (acc, (label, w)) => when(col(labelCol) === label, copies(w)).otherwise(acc)
    }
    df.withColumn("_n", nCopies)
      .where(col("_n") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0L), col("_n") - 1)))
      .drop("_n")
  }

  /** TEMPERATURE-balanced corpus mixing — the multilingual-pretraining
    * rebalancing step (mC4/XLM-R style): label l's target share is
    * `c_l^α / Σ c^α`, flattening the head so low-resource labels are not
    * drowned; the per-label up/down-sampling weight `w_l = (N·c_l^α /
    * Σc^α) / c_l` is DERIVED FROM THE DATA (one label-bounded count agg
    * + scalar sums — no hand-maintained weight map), broadcast back, and
    * applied with [[mixCorpus]]'s deterministic floor+hash-gated-extra
    * copy rule. Total output size ≈ input size (Σ targets = N).
    *
    * α is restricted to {1/4, 1/2, 3/4} (`alphaQuarters` = 1..3),
    * computed as composed `sqrt` — IEEE-754 sqrt and multiply are
    * correctly rounded and therefore BIT-IDENTICAL across engines,
    * unlike `pow(x, 0.3)`, whose libm drift the repo's bm25 already
    * engineered out. The weight expression tree is fixed
    * (`(N·pa / Σpa) / c`) so the oracle replays it operation-for-
    * operation. NULL labels pass through with weight 1.
    *
    * Output: input columns + `copy_idx`. Map-only after the broadcast
    * weight join; scales like mixCorpus.
    */
  def temperatureMix(
      df: DataFrame,
      alphaQuarters: Int = 2,
      labelCol: String = "source",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(alphaQuarters >= 1 && alphaQuarters <= 3,
      s"alphaQuarters must be 1, 2 or 3 (alpha = 1/4, 1/2, 3/4), got $alphaQuarters")
    val counts = df.where(col(labelCol).isNotNull)
      .groupBy(col(labelCol)).agg(count(lit(1)).as("c"))
    def powAlpha(c: Column): Column = {
      val half = sqrt(c.cast("double"))
      val quarter = sqrt(half)
      alphaQuarters match {
        case 1 => quarter
        case 2 => half
        case 3 => half * quarter
      }
    }
    val withPa = counts.withColumn("pa", powAlpha(col("c")))
    val totals = withPa.agg(
      sum(col("c")).as("n_tot"), sum(col("pa")).as("pa_tot"))
    val wtab = withPa.crossJoin(broadcast(totals))
      .select(col(labelCol),
        ((col("n_tot").cast("double") * col("pa") / col("pa_tot")) /
          col("c").cast("double")).as("_w"))
    val joined = df.join(broadcast(wtab), Seq(labelCol), "left")
      .withColumn("_w", coalesce(col("_w"), lit(1.0)))
    val whole = floor(col("_w")).cast("long")
    val fracPermille = round((col("_w") - floor(col("_w"))) * 1000).cast("long")
    val mixBucket = pmod(col(idCol) * MixHash, lit(1000L))
    joined
      .withColumn("_n", whole + when(mixBucket < fracPermille, 1L).otherwise(0L))
      .where(col("_n") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0L), col("_n") - 1)))
      .drop("_n", "_w")
  }

  /** Crawl-to-crawl corpus diff: classify every document id across two
    * corpus versions as `added` / `removed` / `changed` / `unchanged`,
    * comparing CONTENT by the normalized fingerprint (formatting-only
    * edits — whitespace, case — read as unchanged, the same equivalence
    * [[graft.ext.Dedup.exact]] dedups by). The ops primitive under
    * incremental recrawls: `added ∪ changed` is the re-process set,
    * `removed` the tombstone set. One full outer join on the id — both
    * sides shrink to (id, fingerprint) before shuffling, so the join
    * moves two long+hash columns, not documents. NULL texts compare by
    * null-safe equality (two NULLs = unchanged).
    *
    * Returns `(idCol, status)`.
    */
  def corpusDiff(
      oldDocs: DataFrame,
      newDocs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    def fp(df: DataFrame, side: String) = df.select(col(idCol).as(s"_id_$side"),
      TextAnalysis.fingerprint(col(textCol)).as(s"_fp_$side"))
    fp(oldDocs, "o").join(fp(newDocs, "n"), col("_id_o") === col("_id_n"), "full_outer")
      .select(
        coalesce(col("_id_o"), col("_id_n")).as(idCol),
        when(col("_id_o").isNull, "added")
          .when(col("_id_n").isNull, "removed")
          .when(col("_fp_o") <=> col("_fp_n"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Per-domain frequency cap: keep at most `k` rows per `labelCol`
    * value, chosen in HASH order (smallest multiplicative id hash, id
    * tiebreak) — the web-curation staple that stops a single domain
    * from dominating the corpus while keeping the survivor set
    * deterministic and nested (raising k only ADDS rows, like
    * [[hashSample]]'s rate). Rides the bounded-heap grouped top-k
    * ([[graft.ops.TopK.topKPerGroup]] over the negated hash), so the
    * shuffle carries ≤ k candidate rows per domain per input partition
    * and a million-page domain never sorts fully. Same id bound as
    * [[permilleBucket]] (ids below ~3.46e9; pre-fold larger spaces).
    */
  def domainCap(
      df: DataFrame,
      k: Int,
      labelCol: String = "source",
      idCol: String = "doc_id"
  ): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(!df.columns.exists(Set("_nh", "_ni")), "columns _nh/_ni are reserved by domainCap")
    val hk = pmod(col(idCol) * GoldenRatioHash, lit(4294967296L))
    // top_k_agg keeps LARGEST by the struct order — negate (hash, id) so
    // the heap retains the k smallest-hash rows.
    graft.ops.TopK.topKPerGroup(
      df.where(col(idCol).isNotNull && col(labelCol).isNotNull)
        .withColumn("_nh", -hk).withColumn("_ni", -col(idCol)),
      Seq(labelCol), Seq("_nh", "_ni"), k)
      .drop("_nh", "_ni")
  }

  /** Global 0-based rank of each row in `(keyCol, idCol)` NUMERIC order,
    * distributed — the integer-key sibling of
    * [[graft.ext.Dedup.lexRank]]: approximate key quantiles split the
    * frame into balanced contiguous ranges, per-range counts give driver
    * offsets (≤ `numRanges` scalars collected), and a per-range
    * row_number window finishes the rank. No single-task global window
    * at any size.
    */
  private[graft] def numericRank(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      outCol: String,
      numRanges: Int = 256
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val interior = quantileBoundaries(df, keyCol, numRanges)
    val ranged = df.withColumn("_rg",
      if (interior.isEmpty) lit(0)
      else size(filter(typedLit(interior.toSeq), b => col(keyCol).cast("long") >= b)))
    val counts = ranged.groupBy(col("_rg")).agg(count(lit(1)).as("_t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _))
    val spark = df.sparkSession
    import spark.implicits._
    val offsetsDf = offsets.toSeq.toDF("_rg", "_off")
    val w = Window.partitionBy(col("_rg")).orderBy(col(keyCol), col(idCol))
    ranged.join(broadcast(offsetsDf), Seq("_rg"))
      .withColumn(outCol, col("_off") + row_number().over(w) - 1)
      .drop("_rg", "_off")
  }

  /** Deterministic epoch shuffle: assign every row a contiguous 0-based
    * `epoch_pos` in the order of a per-epoch hash — the "reshuffle the
    * corpus each epoch" step of a training-data pipeline, as a pure
    * function of (id, epoch): no RNG state, the same permutation on any
    * cluster and any engine, and a different permutation each epoch.
    * The epoch picks a DIFFERENT LARGE ODD MULTIPLIER,
    * `M_e = (M · (2·epoch + 1)) mod 2^32` (odd·odd stays odd — a
    * bijection of the residue ring): an additive epoch term would shift
    * every key by the same constant mod 2^32, making each "new" epoch a
    * cyclic ROTATION of the last, and a small multiplier perturbation
    * (M + 2e) moves keys by only 2e·id — microscopic next to the
    * inter-key gaps, so the order never changes. Distinct large
    * multipliers give genuinely unrelated orders; the spec pins that NO
    * epoch-1 adjacency survives into epoch 2 on a 500-row corpus.
    * (A rare epoch can land a small M_e with weaker mixing — the
    * permutation stays valid, just lower-discrepancy; skip such an
    * epoch if it matters.) Positions come from [[numericRank]], so the
    * shape is two scans + one bounded window — never a global sort into
    * one task. Ids must keep `id · M_e` in long range for ANY M_e < 2^32:
    * ids below ~2.1e9 (`Long.MaxValue / 2^32`), a tighter bound than
    * [[permilleBucket]]'s — pre-fold larger id spaces.
    */
  def epochShuffle(
      df: DataFrame,
      epoch: Int,
      idCol: String = "doc_id"
  ): DataFrame = {
    require(epoch >= 0, s"epoch must be >= 0, got $epoch")
    require(!df.columns.exists(Set("_ek", "epoch_pos")),
      "columns _ek/epoch_pos are reserved by epochShuffle")
    val mEpoch = BigInt(GoldenRatioHash) * (2L * epoch + 1L) % BigInt(4294967296L)
    val key = pmod(col(idCol) * mEpoch.toLong + lit(epoch.toLong) * 40503L,
      lit(4294967296L))
    numericRank(
      df.where(col(idCol).isNotNull).withColumn("_ek", key),
      "_ek", idCol, "epoch_pos")
      .drop("_ek")
  }

  /** Per-group quantile normalization: replace a value with its rank
    * permille within its `labelCol` group — `(1000·(rank−1)) div (n−1)`
    * over the `(value, id)` order, so scores from incomparable scales
    * (per-source quality models, per-language perplexities) land on one
    * [0, 1000] scale before cross-corpus thresholding. Integer
    * arithmetic end to end. A single-row group maps to 0. One shuffle
    * on the group key; groups skewed enough to matter get the same
    * salting treatment as any window — at corpus scale labels are
    * sources/languages, whose cardinality caps the per-group width.
    */
  def quantileNormalize(
      df: DataFrame,
      labelCol: String,
      valueCol: String,
      idCol: String = "doc_id"
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(!df.columns.exists(Set("_qrank", "_qn", "q_permille")),
      "columns _qrank/_qn/q_permille are reserved by quantileNormalize")
    val w = Window.partitionBy(col(labelCol)).orderBy(col(valueCol), col(idCol))
    val wn = Window.partitionBy(col(labelCol))
    df.where(col(valueCol).isNotNull)
      .withColumn("_qrank", row_number().over(w))
      .withColumn("_qn", count(lit(1)).over(wn))
      // _qrank is an Int (row_number): the multiply must run in longs or
      // groups past ~2.15M rows wrap 1000·rank over Int.MaxValue.
      .withColumn("q_permille",
        when(col("_qn") === 1, 0L)
          .otherwise(expr("(1000 * (cast(_qrank as bigint) - 1)) div (_qn - 1)")))
      .drop("_qrank", "_qn")
  }

  // ------------------------------------------------------------------ DSIR

  /** Whitespace tokens of a text column, lower-cased, empties dropped —
    * the corpus tokenization every text operator here shares.
    */
  private[graft] def dsirTokens(textCol: String): Column =
    filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0)

  /** Hashed n-gram feature buckets (unigrams + word bigrams) of a token
    * array — DSIR's featurization (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023 §3): a
    * fixed-size bucket space keeps the fitted model BOUNDED regardless of
    * corpus vocabulary, which is what lets the fit stage aggregate 100 TB
    * into ≤ `numBuckets` rows. xxhash64 is the bucket hash (codegen'd,
    * the same choice the MinHash/SimHash family makes).
    *
    * `tokens` MUST be a materialized column (an attribute), not an inline
    * expression: higher-order functions evaluate interpreted, so the
    * per-index `element_at(tokens, i)` lambda body would re-evaluate an
    * inline `split(...)` subtree once PER BIGRAM — O(len²) per document.
    * Callers project the token array first ([[withDsirTokens]]).
    */
  private[graft] def dsirBuckets(tokens: Column, numBuckets: Int): Column = {
    val bigrams = when(size(tokens) >= 2,
      transform(sequence(lit(0), size(tokens) - 2),
        i => concat_ws(" ", element_at(tokens, i + 1), element_at(tokens, i + 2))))
      .otherwise(array().cast("array<string>"))
    transform(concat(tokens, bigrams),
      t => pmod(xxhash64(t), lit(numBuckets.toLong)).cast("int"))
  }

  /** Projects the token array as a real column so every downstream
    * `element_at` inside a lambda is an O(1) attribute lookup — the
    * CollapseProject rule keeps the projection separate because the
    * attribute is referenced many times (see [[dsirBuckets]]).
    */
  // NOTE (r21): deliberately NOT Spread.acrossCores'd — the classifier's
  // gradient loop persists this frame and re-reads it every iteration, so
  // widening a tiny training set to cluster parallelism multiplied the
  // per-iteration task count 13x for no compute win (measured +3.8 s on
  // the quality-classifier gate).
  private[graft] def withDsirTokens(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("_dsir_toks", dsirTokens(textCol))

  /** Per-bucket feature counts of a corpus: ONE map-side-combined
    * aggregation whose shuffle is bounded by `numBuckets` per partition —
    * the only pass the fit stage makes over each corpus.
    */
  private def bucketCounts(df: DataFrame, textCol: String, numBuckets: Int): Array[Long] = {
    val rows = withDsirTokens(df, textCol)
      .select(explode(dsirBuckets(col("_dsir_toks"), numBuckets)).as("bucket"))
      .groupBy("bucket").count()
      .collect() // ≤ numBuckets rows by construction — driver-bounded
    val out = new Array[Long](numBuckets)
    rows.foreach(r => out(r.getInt(0)) = r.getLong(1))
    out
  }

  /** A fitted DSIR model: the per-bucket log importance ratio
    * `log p̂_target[b] − log p̂_raw[b]`. numBuckets doubles — ~0.5 MB at
    * the 2^16 default — small enough to ship to executors as one array
    * literal, which is what makes scoring with it map-only. Fit once,
    * score any number of shards: new raw data does NOT need a refit (the
    * model estimates two fixed distributions, not the shard).
    */
  final case class DsirModel(logRatio: Seq[Double], smoothing: Double) {
    def numBuckets: Int = logRatio.size
  }

  /** Fit the DSIR importance model (Xie et al. §3): hashed-n-gram
    * bag-of-words estimates of the TARGET and RAW distributions with
    * additive smoothing. Two bounded aggregations, one per corpus — each
    * shuffles ≤ numBuckets rows per partition after map-side combine —
    * then a driver-side table of numBuckets log-ratios.
    */
  def dsirFit(
      raw: DataFrame,
      target: DataFrame,
      textCol: String = "text",
      numBuckets: Int = 1 << 16,
      smoothing: Double = 0.5
  ): DsirModel = {
    require(numBuckets > 0 && smoothing > 0.0, "numBuckets and smoothing must be positive")
    val tCounts = bucketCounts(target, textCol, numBuckets)
    val rCounts = bucketCounts(raw, textCol, numBuckets)
    val tTotal = tCounts.sum.toDouble + numBuckets * smoothing
    val rTotal = rCounts.sum.toDouble + numBuckets * smoothing
    DsirModel(Array.tabulate(numBuckets) { b =>
      math.log((tCounts(b) + smoothing) / tTotal) - math.log((rCounts(b) + smoothing) / rTotal)
    }.toSeq, smoothing)
  }

  /** Score documents under a fitted model: appends `dsir_logweight` =
    * `Σ_b n_b(x) · logRatio[b]`. MAP-ONLY — the model rides as a literal
    * array, the score is a fixed-order per-row fold over the document's
    * feature buckets: zero shuffles, no join, deterministic on any
    * partitioning.
    */
  def dsirScoreWith(model: DsirModel, df: DataFrame, textCol: String = "text"): DataFrame = {
    val lam = typedLit(model.logRatio)
    withDsirTokens(df, textCol)
      .withColumn("dsir_logweight",
        aggregate(dsirBuckets(col("_dsir_toks"), model.numBuckets), lit(0.0),
          (acc, b) => acc + element_at(lam, b + 1)))
      .drop("_dsir_toks")
  }

  /** Fit-and-score convenience: the log importance weight of every raw
    * document against a target sample ([[dsirFit]] + [[dsirScoreWith]]).
    */
  def dsirScore(
      raw: DataFrame,
      target: DataFrame,
      textCol: String = "text",
      numBuckets: Int = 1 << 16,
      smoothing: Double = 0.5
  ): DataFrame =
    dsirScoreWith(dsirFit(raw, target, textCol, numBuckets, smoothing), raw, textCol)

  /** DSIR selection: sample `k` documents WITHOUT replacement with
    * probability ∝ exp(dsir_logweight) via the Gumbel-top-k trick
    * (public equivalence: top-k of `logw + Gumbel noise` is exactly
    * weighted sampling without replacement — Vieira 2014). The Gumbel
    * noise is hash-derived from the id ([[GoldenRatioHash]], same basis
    * as every sampler here), so selection is REPLAYABLE: deterministic
    * across runs, engines and partitionings, no RNG state. The top-k is
    * `orderBy(...).limit(k)` — Spark plans TakeOrderedAndProject, a
    * per-partition heap + driver merge of k rows, never a global sort.
    */
  def importanceResample(
      raw: DataFrame,
      target: DataFrame,
      k: Int,
      textCol: String = "text",
      idCol: String = "doc_id",
      numBuckets: Int = 1 << 16,
      smoothing: Double = 0.5
  ): DataFrame =
    importanceResampleWith(dsirFit(raw, target, textCol, numBuckets, smoothing),
      raw, k, textCol, idCol)

  /** [[importanceResample]] under an ALREADY-fitted model — the 100 TB
    * shape: fit once against the target sample, then select from any
    * number of raw shards without touching the target again.
    */
  def importanceResampleWith(
      model: DsirModel,
      raw: DataFrame,
      k: Int,
      textCol: String = "text",
      idCol: String = "doc_id"
  ): DataFrame = {
    val scored = dsirScoreWith(model, raw, textCol)
    // u in (0,1) from the multiplicative hash; +0.5 keeps it off 0 and 1
    // so both logs below are finite
    val u = (pmod(col(idCol) * GoldenRatioHash, lit(1L << 31)).cast("double") + 0.5) /
      (1L << 31).toDouble
    val gumbel = -log(-log(u))
    scored.withColumn("_gumbel_key", col("dsir_logweight") + gumbel)
      .orderBy(col("_gumbel_key").desc, col(idCol))
      .limit(k)
      .drop("_gumbel_key")
  }
}
