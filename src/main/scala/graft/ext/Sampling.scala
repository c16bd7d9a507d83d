package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for corpus curation. Both ops are pure row-local
 * predicates on a content/id hash: embarrassingly parallel (zero
 * shuffle), reproducible across runs, engines and backfills (`rand()` is
 * none of those), and composable with any downstream pipeline stage.
 */
object Sampling {

  /**
   * Stratified downsampling with per-group keep rates — the language/
   * source rebalancing step of a training-data pipeline (e.g. keep 25 %
   * of English, 100 % of everything else). A row is kept iff the first
   * 16 bits of md5(id) — compared as the lowercase hex prefix, which
   * orders identically to the integer in every engine — fall under its
   * group's rate. Rate granularity is 1/65536.
   *
   * Membership depends only on (id, own group rate): re-sampling after
   * new data arrives keeps exactly the previously-kept rows (append-only
   * stability), and tightening one group's rate never changes another's
   * sample.
   */
  def stratifiedByHash(df: DataFrame, groupCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    // "g" sorts above every hex digit → keep-all without a 5-char
    // threshold (lexicographic "ffff" < "10000" is false, so the
    // integer 65536 cannot be expressed as a comparable hex string)
    def hex(f: Double) = {
      require(f >= 0.0 && f <= 1.0, s"rate $f outside [0, 1]")
      if (f >= 1.0) "g" else f"${(f * 65536).toInt}%04x"
    }
    val threshold = rates.foldLeft(lit(hex(defaultRate)): Column) {
      case (acc, (group, f)) =>
        when(col(groupCol) === group, lit(hex(f))).otherwise(acc)
    }
    df.where(substring(md5(col(idCol).cast("string")), 1, 4) < threshold)
  }

  /**
   * Target-weight domain mixing — compose a corpus whose group (source /
   * domain / language) proportions match prescribed weights, the data-
   * mixture step of training-corpus assembly (fixed per-source sampling
   * weights à la GPT-3 / The Pile mixture tables).
   *
   * Sizing comes from the binding constraint: `scale = min_g(n_g / w_g)`
   * is the largest mixture for which every group can supply
   * `floor(scale * w_g)` rows without replacement; groups absent from
   * `weights` are dropped. Within a group, the kept rows are the lowest
   * `md5(id:seed)` ranks — deterministic, engine-reproducible, uniform
   * over the group. Unlike `stratifiedByHash` (fixed RATES, append-
   * stable), fixed PROPORTIONS necessarily re-balance when group counts
   * change, so membership is stable only for a fixed input corpus.
   *
   * Plan shape at 100 TB: per-row work is one md5 plus broadcast-joined
   * comparisons; in-group ranks use the same two-pass prefix sum as
   * `Shards.shuffleOrder` — bucket by the key's first byte, offset by a
   * (#groups × 256)-row broadcast frame, rank inside (group, bucket) —
   * so no window serializes a whole group onto one reducer. Group
   * counts/targets are a #groups-row aggregate, broadcast back.
   *
   * Every key of `weights` MUST appear in the data: a weighted group
   * with zero rows makes the prescribed proportions unsatisfiable (the
   * only consistent scale is 0 → empty output), so rather than silently
   * taking the binding constraint over present groups only — a mixture
   * that violates the prescription — the job raises at execution time
   * (a #groups-row check on the targets frame, no extra scan).
   */
  def mixByWeight(df: DataFrame, groupCol: String, idCol: String,
      weights: Map[String, Double], seed: String): DataFrame = {
    require(weights.nonEmpty, "mixByWeight needs at least one weighted group")
    weights.values.foreach(w =>
      require(w > 0, s"mixByWeight weights must be > 0, got $w"))
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = broadcast(weights.toSeq.toDF("__g", "__w"))
    val inMix = df.join(wdf, col(groupCol) === col("__g")).drop("__g")
    val withKey = inMix
      .withColumn("__key",
        md5(concat(col(idCol).cast("string"), lit(":" + seed))))
      .withColumn("__bucket",
        conv(substring(col("__key"), 1, 2), 16, 10).cast("int"))
    val bucketCounts = withKey.groupBy(col(groupCol), col("__bucket"))
      .agg(count(lit(1)).as("__n"))
    val wB = Window.partitionBy(col(groupCol)).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketCounts
      .withColumn("__offset", coalesce(sum(col("__n")).over(wB), lit(0L)))
      .select(col(groupCol), col("__bucket"), col("__offset"))
    // binding constraint over per-group totals — #groups rows, so the
    // empty-partitionBy window is a deliberate tiny single partition
    val targets = bucketCounts.groupBy(col(groupCol))
      .agg(sum(col("__n")).as("__ng"))
      .join(wdf, col(groupCol) === col("__g"))
      .withColumn("__scale", min(col("__ng").cast("double") / col("__w"))
        .over(Window.partitionBy()))
      // absent-group guard: the window count sees only PRESENT weighted
      // groups; fewer than weights.size means a prescribed source has no
      // rows and the proportions cannot be met — raise, don't mis-mix
      .withColumn("__present", count(lit(1)).over(Window.partitionBy()))
      .where(when(col("__present") === lit(weights.size), lit(true))
        .otherwise(raise_error(concat(
          lit(s"mixByWeight: only "), col("__present").cast("string"),
          lit(s" of ${weights.size} weighted groups present in the input;"),
          lit(" a weighted group with zero rows makes the prescribed"),
          lit(" proportions unsatisfiable"))).cast("boolean")))
      .withColumn("__target",
        floor(col("__scale") * col("__w")).cast("long"))
      .select(col(groupCol), col("__target"))
    val wLocal = Window.partitionBy(col(groupCol), col("__bucket"))
      .orderBy(col("__key"), col(idCol))
    withKey
      .join(broadcast(offsets), Seq(groupCol, "__bucket"))
      .join(broadcast(targets), Seq(groupCol))
      .withColumn("__rank", col("__offset") + row_number().over(wLocal))
      .where(col("__rank") <= col("__target"))
      .drop("__w", "__key", "__bucket", "__offset", "__target")
      .withColumnRenamed("__rank", "mix_rank")
  }

  /**
   * Temperature-flattened mixture — `mixByWeight` with the weights
   * DERIVED from the data: w_g = √n_g (exponent α = ½), the standard
   * rebalancing of multilingual/multi-domain corpora (upsample the tail
   * relative to its raw share so head domains stop drowning it; the
   * exponent family of mBERT/XLM-style sampling, pinned here to the
   * sqrt member because `sqrt` is correctly rounded on every IEEE
   * engine — an arbitrary `pow(n, α)` is only ~1-ulp accurate and may
   * disagree across engines exactly at a floor() boundary, which is a
   * cross-engine-exactness bug, not a math bug).
   *
   * The group counts are a #groups-row driver fetch (metadata-sized,
   * same contract as the DQ report); everything data-sized stays in
   * `mixByWeight`'s bucketed two-pass rank. With w = √n the binding
   * constraint min(n_g/w_g) = min(√n_g) means the SMALLEST group sets
   * the scale: target_g = floor(min_h(√n_h)·√n_g) — every group keeps
   * ~geometric-mean share between its raw size and equality.
   */
  def mixByTemperature(df: DataFrame, groupCol: String, idCol: String,
      seed: String): DataFrame = {
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n")).collect()
    require(counts.nonEmpty,
      s"mixByTemperature needs a non-empty input with non-null '$groupCol' keys")
    require(counts.forall(!_.isNullAt(0)),
      s"mixByTemperature: null values in group column '$groupCol' — " +
        "filter them out or bucket them under an explicit label first")
    val weights = counts.map(r =>
      r.get(0).toString -> math.sqrt(r.getLong(1).toDouble)).toMap
    mixByWeight(df, groupCol, idCol, weights, seed)
  }

  /**
   * Leakage-safe train/validation/test split: assign every document to
   * a split by its NEAR-DUP CLUSTER, not its own id. A split keyed on
   * the document id alone puts near-duplicates of a training doc into
   * the eval set — the contamination pathway that inflates benchmark
   * scores through paraphrases and mirrors, and the reason production
   * splits group by duplicate cluster (cf. the dedup-before-split
   * practice of Lee et al., ACL 2022 §6.2). `pairs` is any near-dup
   * pair list (id_a, id_b) — MinHash, SimHash, embedding-ANN; unpaired
   * docs are their own singleton group.
   *
   * Assignment is a pure function of the cluster label (the min doc id
   * of the cluster): label % 10 < `trainDeciles` → train, the next
   * decile → validation, the rest → test. Deterministic, append-
   * stable for singletons, and every cluster member shares the label —
   * co-assignment holds by construction, not by luck.
   *
   * Scale: connected components over the (tiny) pair graph + one id-
   * keyed join back to the corpus; document bodies never shuffle.
   */
  def leakageSafeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
      trainDeciles: Int = 8): DataFrame = {
    require(trainDeciles >= 1 && trainDeciles <= 8,
      s"trainDeciles $trainDeciles outside [1, 8] — validation and test " +
        "each need at least one decile")
    val comps = Dedup.components(pairs)
      .select(col("id").as(idCol), col("component"))
    df.select(col(idCol))
      .join(comps, Seq(idCol), "left")
      .withColumn("group_key", coalesce(col("component"), col(idCol)))
      .withColumn("split",
        when(col("group_key") % 10 < trainDeciles, lit("train"))
          .when(col("group_key") % 10 === trainDeciles, lit("validation"))
          .otherwise(lit("test")))
      .select(col(idCol), col("group_key"), col("split"))
  }
}
