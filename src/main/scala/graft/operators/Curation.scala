package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-balancing operators — the "don't let one domain eat the training
  * mix" stage every web-scale curation pipeline runs between dedup and
  * shuffle (RefinedWeb §3.1 URL/domain filtering; Dolma's per-domain caps;
  * the temperature-weighted language/domain mixing of multilingual LM
  * recipes, e.g. XLM-R's p_i^alpha resampling).
  *
  * Reference scope analog: the reference exposes only Hive DML over Kudu
  * tables (reference: HiveKuduTableOutputFormat.java — row sink, no corpus
  * ops); this family is part of the training-data surface this engine adds
  * on top of the same storage verbs.
  */
object Curation {

  /** Drop every row whose `domainCol` appears in `blocked` (a single
    * string column, any name). Broadcast anti-join: real blocklists are
    * ~10^5 domains (opt-out registries, NSFW lists) — literal-sized next to
    * a 100-TB corpus, so the scan stays a single narrow pass with no
    * shuffle. The blocklist column is renamed to a collision-proof
    * sentinel before the join, so a docs frame whose domain column is
    * literally named `domain` (the natural name) cannot make the join
    * condition ambiguous.
    *
    * NULL semantics: a row with a NULL `domainCol` always SURVIVES —
    * `NULL === x` is NULL, so the anti-join keeps it. That is the right
    * default for curation (a missing domain is "unknown", not "blocked");
    * callers who want NULL-domain rows gone filter them explicitly.
    */
  def blocklistFilter(docs: DataFrame, domainCol: String,
      blocked: DataFrame): DataFrame = {
    val b = broadcast(blocked.toDF("__graft_blocked_domain").distinct())
    docs.join(b, docs(domainCol) === b("__graft_blocked_domain"), "left_anti")
  }

  /** Per-domain cap: keep at most `cap` rows per `domainCol` value,
    * preferring high `rankCol` (ties broken by ascending `idCol` so the
    * survivor set is deterministic). Output = the surviving rows plus their
    * 1-based `keep_rank` within the domain.
    *
    * Two-phase salted TopN, so a megadomain (one host = 1% of a 100-TB
    * crawl → ~1 TB of rows under a single key) never lands on one task:
    *
    *  1. salt every row by `xxhash64(idCol) mod salts` and take the
    *     per-(domain, salt) top-`cap` — each task sorts ~|domain|/salts
    *     rows, and AQE's skew handling applies to the (domain, salt)
    *     shuffle like any other;
    *  2. take the global per-domain top-`cap` over the surviving
    *     `<= cap * salts` rows per domain — a bounded window.
    *
    * Equivalence (CurationSpec proves it under planted 1%-megadomain
    * skew): any row in a domain's true top-`cap` is a fortiori in the
    * top-`cap` of its salt slice (dropping other rows can only improve its
    * local rank), so phase 1's survivors are a superset of the true
    * top-`cap`; and every row that globally precedes a true top-`cap` row
    * is itself in the true top-`cap`, hence also a phase-1 survivor — so
    * phase 2 assigns exactly the global `keep_rank`. Identical survivor
    * set AND ranks, for any `salts >= 1`.
    *
    * `salts` sizes the skew headroom: phase 2 buffers `cap * salts` rows
    * per domain, so keep `salts` modest (default 16) and raise it only for
    * extreme single-domain skew. NULL domains form their own group (SQL
    * window partitioning groups NULLs together) and are capped like any
    * other — run [[blocklistFilter]] / a NULL filter first if they should
    * not compete.
    */
  def domainCap(docs: DataFrame, domainCol: String, rankCol: String,
      idCol: String, cap: Int, salts: Int = 16): DataFrame = {
    require(cap >= 1, s"domainCap: cap must be >= 1, got $cap")
    require(salts >= 1, s"domainCap: salts must be >= 1, got $salts")
    val preCapped =
      if (salts == 1) docs
      else docs
        .withColumn("__salt", pmod(xxhash64(col(idCol)), lit(salts)))
        .withColumn("__salt_rank", row_number().over(
          Window.partitionBy(col(domainCol), col("__salt"))
            .orderBy(col(rankCol).desc, col(idCol).asc)))
        .filter(col("__salt_rank") <= cap)
        .drop("__salt", "__salt_rank")
    preCapped
      .withColumn("keep_rank", row_number().over(
        Window.partitionBy(col(domainCol))
          .orderBy(col(rankCol).desc, col(idCol).asc)))
      .filter(col("keep_rank") <= cap)
  }

  /** Temperature-weighted mixture allocation at alpha = 0.5: give domain i
    * a share of `budget` samples proportional to sqrt(n_i) — the standard
    * "flatten the head, boost the tail" resampling exponent — rounded to
    * integers by Hamilton's largest-remainder method so the allocations sum
    * to EXACTLY `budget`.
    *
    * Output: (domain, n_docs BIGINT, weight_e6 BIGINT, alloc BIGINT),
    * one row per domain.
    *
    * Why alpha is fixed at 0.5: IEEE 754 requires sqrt (and *, floor) to be
    * correctly rounded, so `floor(sqrt(n) * 1e6)` is bit-identical in the
    * JVM and DuckDB and the whole allocation is cross-engine exact BIGINT
    * arithmetic. A general p^alpha needs `pow`, which libm implementations
    * round differently — the same engine-divergence that pushed d41/d47 to
    * integer units. A caller who wants other alphas resamples upstream.
    *
    * Scale shape (round-15: the last single-task stage is gone): the
    * corpus-sized work is ONE map-side-combined count per domain;
    * everything after runs on #domains rows (10^6-10^7 for a full web
    * crawl) — and even there, nothing sorts globally on one task:
    *  - the scalar totals (W, Σbase, seat count) are 1-row aggregates
    *    broadcast back, not `sum() OVER ()` windows;
    *  - the largest-remainder rank is a DISTRIBUTED ranking: domains are
    *    RANGE-partitioned on the strict total order (rem desc, domain
    *    asc), ranked locally per range partition (each a bounded
    *    ~#domains/P slice), and offset by the earlier partitions' row
    *    counts — a P-row summary join (P = shuffle partitions), never a
    *    single-task sort. Global rank = local rank + offset holds exactly
    *    because the range partitioner places every row of an earlier
    *    partition strictly before the current one in the same total
    *    order, and the order is strict (domain is unique per group).
    * CurationSpec pins equality with the directly-computed flat Hamilton
    * allocation on randomized domain tables, and PlanSpec's bench tail no
    * longer logs `WindowExec: No Partition Defined` for d49.
    *
    * BIGINT bound: the apportionment computes `budget * weight_e6`, so
    * budget x total weight must stay under 2^63 — safe through a
    * billion-sample budget against a ~10^12-doc corpus (W ~ 3x10^12);
    * past that, drop the weight scale to 1e3. Spark's ANSI mode fails
    * loudly on the overflow rather than wrapping.
    */
  def sqrtTemperatureAllocation(docs: DataFrame, domainCol: String,
      budget: Long): DataFrame = {
    require(budget >= 0, s"sqrtTemperatureAllocation: budget >= 0, got $budget")
    val counts0 = docs
      .groupBy(col(domainCol).as("domain"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("weight_e6",
        floor(sqrt(col("n_docs").cast("double")) * lit(1e6)).cast("long"))
    // the ONE corpus-sized pass, staged: totals, seat count, ranking, and
    // summaries all branch from here — without it each branch would re-run
    // the corpus count. Staged (not a bare .cache(), round-17): a cache
    // with no unpersist leaked one CacheManager entry per call, and every
    // LATER query's analysis walks all cached plans — a bench sweep
    // accumulated hundreds (Staged scaladoc). The slot keeps the whole
    // allocation lazy and releases the previous call's frame.
    val counts = Staged.stage("curation-counts", counts0)
    val wTot = counts.agg(sum(col("weight_e6")).as("w_tot")) // 1 row
    val based = counts.crossJoin(broadcast(wTot))
      .withColumn("base", expr(s"$budget * weight_e6 div w_tot"))
      .withColumn("rem", expr(s"$budget * weight_e6 % w_tot"))
      .drop("w_tot")
    val seats = based.agg((lit(budget) - sum(col("base"))).as("seats")) // 1 row
    // distributed largest-remainder rank — the shared [[DistributedRank]]
    // recipe (range-split on the strict total order, rank locally, add the
    // earlier partitions' sizes; the ranged frame is localCheckpointed so
    // every branch reads ONE materialized partitioning rather than relying
    // on exchange reuse)
    DistributedRank.withRank(based,
        Seq(col("rem").desc, col("domain").asc), "__hr")
      .crossJoin(broadcast(seats))
      .select(col("domain"), col("n_docs"), col("weight_e6"),
        (col("base") + when(col("__hr") <= col("seats"), 1L)
          .otherwise(0L)).cast("long").as("alloc"))
  }
}
