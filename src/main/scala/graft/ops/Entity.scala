package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fuzzy entity resolution — the record-linkage pass that reconciles dirty
  * duplicate records (re-crawled author/domain/license records, OCR'd
  * citations) before they become distinct "sources" downstream.
  *
  * Standard blocking + verification shape (Fellegi-Sunter / Dedoop):
  *  1. BLOCK on cheap exact attributes — candidates come from an EQUI-JOIN
  *     on the block key (the same convention as every near-dup family
  *     here: never an O(n²) name cross-product);
  *  2. VERIFY candidates with an edit-distance bound on the name.
  *
  * A block key must be corruption-invariant: here (nationkey, exact
  * DECIMAL(18,2) balance) — the attributes typos don't touch. At 100 TB
  * the block join shuffles on the key once; block sizes follow the key's
  * selectivity, not corpus size, and a hot block (e.g. bal=0.00) is AQE
  * skew-join territory, same as every equi-join in the engine.
  */
object Entity {

  /** Every `every`-th customer gains a dirty twin. */
  val PlantEvery = 25

  /** Verification bound: max name edit distance for a candidate match. */
  val MaxEditDist = 2

  /** Deterministic test augmentation (same role as VectorOps.plantedCorpus):
    * every `every`-th customer contributes a twin record at
    * `c_custkey + idOffset` whose name has ONE substituted character at
    * position (c_custkey % 8) + 1 — a typo'd duplicate the blocking must
    * recover. Non-name attributes are copied verbatim (block-key
    * invariance).
    */
  def withPlantedDirty(
      cust: DataFrame,
      every: Int = PlantEvery,
      idOffset: Long = 1000000L): DataFrame = {
    val g = cust.agg(max(col("c_custkey"))).collect()(0)
    require(g.getLong(0) < idOffset,
      s"withPlantedDirty: max(c_custkey)=${g.getLong(0)} >= idOffset=$idOffset — " +
        "planted ids would collide with genuine rows; raise idOffset")
    val pos = (col("c_custkey") % 8).cast("int")
    val corrupted = concat(
      substr(col("c_name"), lit(1), pos),
      lit("x"),
      substr(col("c_name"), pos + lit(2), lit(1000)))
    val twins = cust.filter(col("c_custkey") % every === 0)
      .select(
        (col("c_custkey") + idOffset).as("c_custkey"),
        corrupted.as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    cust.select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .unionByName(twins)
  }

  /** Blocked fuzzy-match pairs: records sharing (nationkey, exact decimal
    * balance) whose names are within `maxDist` edits. Output one row per
    * unordered pair (id_a < id_b) with the distance.
    */
  def resolvePairs(records: DataFrame, maxDist: Int = MaxEditDist): DataFrame = {
    val r = records.select(
      col("c_custkey").as("id"), col("c_name").as("name"),
      col("c_nationkey").as("nk"), col("c_acctbal").cast("decimal(18,2)").as("bal"))
    val a = r.select(col("id").as("id_a"), col("name").as("name_a"), col("nk"), col("bal"))
    val b = r.select(col("id").as("id_b"), col("name").as("name_b"), col("nk"), col("bal"))
    a.join(b, Seq("nk", "bal"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("name_a"), col("name_b")).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** GOLDEN RECORDS — the survivorship stage completing the
    * record-linkage chain: exact connected components over the matched
    * pair graph (a typo chain A~B~C folds into ONE entity even when A
    * and C are more than `maxDist` apart — the transitive-closure
    * semantics resolvePairs alone can't express), min-key representative
    * per entity, members merged by survivorship rules (the keeper's
    * name, MAX balance as the "latest update wins" proxy). Singletons
    * pass through as their own entity.
    *
    * Scale: the CC fixpoint is pair-graph-sized (pointer jumping, O(log
    * diameter) rounds); the merge is one hash aggregation keyed by
    * entity plus one keeper equi-join — the corpus is scanned once.
    * Output (entity_id, n_members, name, max_acctbal).
    */
  def goldenRecords(records: DataFrame, maxDist: Int = MaxEditDist): DataFrame =
    goldenRecordsFrom(records, resolvePairs(records, maxDist))

  /** Incremental blocked probe: matched pairs with AT LEAST one endpoint
    * in `newRecords`, canonicalized (id_a < id_b) — the
    * mediaNearDupPairsIncremental shape for the record tier. With unique
    * keys per batch every pair is generated exactly once (in the batch
    * of its later endpoint), so appending each batch's output
    * reconstructs `resolvePairs` over everything ingested
    * (StreamingEntityResSpec pins the equivalence). One equi-join of the
    * batch against the accumulated record index on the block key — never
    * history × history.
    */
  def resolvePairsIncremental(
      newRecords: DataFrame, allRecords: DataFrame,
      maxDist: Int = MaxEditDist): DataFrame = {
    def prep(df: DataFrame, suffix: String): DataFrame = df.select(
      col("c_custkey").as(s"id$suffix"), col("c_name").as(s"name$suffix"),
      col("c_nationkey").as("nk"), col("c_acctbal").cast("decimal(18,2)").as("bal"))
    prep(newRecords, "_a").join(prep(allRecords, "_b"), Seq("nk", "bal"))
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        levenshtein(col("name_a"), col("name_b")).as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
  }

  /** `goldenRecords` served from a PREBUILT matched-pair table
    * (id_a, id_b) — the survivorship body without the blocking pass,
    * shared by the batch path and the StreamingEntityRes serve.
    */
  def goldenRecordsFrom(records: DataFrame, matchedPairs: DataFrame): DataFrame = {
    val matched = matchedPairs
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val comps = Dedup.nearDupComponentsExact(matched)
    val withEntity = records
      .join(comps.withColumnRenamed("doc_id", "c_custkey"), Seq("c_custkey"), "left")
      .select(coalesce(col("rep"), col("c_custkey")).as("entity_id"), col("c_acctbal"))
    val agg = withEntity.groupBy(col("entity_id"))
      .agg(count(lit(1)).as("n_members"),
        round(max(col("c_acctbal")), 2).as("max_acctbal"))
    agg.join(records.select(col("c_custkey").as("entity_id"),
        col("c_name").as("name")), Seq("entity_id"))
      .select(col("entity_id"), col("n_members"), col("name"), col("max_acctbal"))
  }
}
