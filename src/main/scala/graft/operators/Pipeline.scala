package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextAnalysis

/** End-to-end corpus-cleaning pipeline — the composition every
  * pre-training data run executes, as ONE declarative plan: quality
  * filter → exact-dedup to a canonical copy → deterministic train/val
  * split → per-(split, lang) audit. Each stage reuses the engine's
  * primitives (TextAnalysis.qualityScore, the md5 fingerprint,
  * Sampling.hashBucket), so this query is also the integration test
  * that the pieces compose.
  *
  * Scale shape: the quality gate and fingerprint are a single narrow
  * projection pass (no shuffle); canonicalization is one shuffle on the
  * fingerprint; the split is hash arithmetic (no shuffle); the audit is
  * one partial-agg groupBy. Three exchanges total over the corpus, each
  * on a key that partitions evenly at any scale.
  */
object Pipeline {

  /** Per-key latest record of a changelog slice — the CDC compaction
    * primitive shared by pipeline_merge_upsert and the streaming
    * [[graft.streaming.CdcApply]] so the two folds cannot drift. One
    * hash shuffle on the key; the rank=1 filter compiles to
    * WindowGroupLimit (map-side top-1), so tasks forward one row per
    * key, never a key's whole history. */
  private[graft] def latestPerKey(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
    ev.withColumn("rk", row_number().over(w)).filter(col("rk") === 1).drop("rk")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "pipeline_clean_corpus" -> ((s, dir) => {
      val kept = Tables.documents(s, dir)
        .filter(TextAnalysis.qualityScore(col("text")) > 0.5)
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      val w = Window.partitionBy("fp").orderBy("doc_id")
      val canon = kept
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
      canon
        .withColumn("bucket", Sampling.hashBucket(col("doc_id")))
        .withColumn("split", when(col("bucket") < 90, "train").otherwise("val"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("chars"))
        .orderBy("split", "lang")
    }),

    // Sequence PACKING — the canonical pretraining data-prep step:
    // concatenate documents into fixed-length training sequences
    // (L = 512 tokens) and report per-sequence fill. Packing is
    // inherently ordered, so it runs inside bounded (lang, doc_id % 64)
    // pack groups: the running token offset is a window cumsum WITHIN a
    // group — groups are uniform hash buckets, so every window sort is
    // small and parallel, never a global single-partition sort (the
    // scale trap of naive packing). A doc's sequence is the one its
    // start offset falls in (the streaming-packer rule; straddling docs
    // spill into the next sequence). Deterministic: doc_id order inside
    // groups, integer token counts, integer division.
    "pipeline_pack_sequences" -> ((s, dir) => {
      val L = 512
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
        .withColumn("bucket", pmod(col("doc_id"), lit(64L)))
      val w = Window.partitionBy("lang", "bucket").orderBy("doc_id")
      docs
        .withColumn("start_off", sum("n_tok").over(w) - col("n_tok"))
        .withColumn("seq_id",
          floor(col("start_off").cast("double") / L).cast("long"))
        .groupBy("lang", "bucket", "seq_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("sum_tokens"))
        .orderBy("lang", "bucket", "seq_id")
    }),

    // MERGEABLE dataset card — the incremental form: per-(source, shard)
    // partials carry algebraic measures (counts, sums, min/max) plus a
    // language SET for the one holistic measure, then a merge step folds
    // shards into the published card. This is the artifact shape a
    // 100 TB pipeline persists per ingest batch: cards for new shards
    // are computed in isolation and the merge is re-run over partials
    // (shards × sources rows, not documents), so the corpus is never
    // re-scanned. Output ≡ pipeline_dataset_card (same oracle SQL);
    // the set-union distinct is order-insensitive, so the card stays
    // integer-exact and partition-count invariant.
    "pipeline_card_mergeable" -> ((s, dir) => {
      val partials = Tables.documents(s, dir)
        .withColumn("shard", pmod(col("doc_id"), lit(16L)))
        .groupBy("source", "shard")
        .agg(
          count(lit(1)).as("n_docs"),
          collect_set(col("lang")).as("langs"),
          sum(col("n_chars")).as("chars_total"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("tokens_total"),
          sum(when(TextAnalysis.qualityScore(col("text")) > 0.5, 1L).otherwise(0L)).as("n_keep"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
      partials
        .groupBy("source")
        .agg(
          sum(col("n_docs")).as("n_docs"),
          size(array_distinct(flatten(collect_list(col("langs"))))).cast("long").as("n_langs"),
          sum(col("chars_total")).as("chars_total"),
          sum(col("tokens_total")).as("tokens_total"),
          sum(col("n_keep")).as("n_keep"),
          min(col("min_chars")).as("min_chars"),
          max(col("max_chars")).as("max_chars"))
        .orderBy("source")
    }),

    // EXPECTATION SUITE — the declarative data-quality gate a pipeline
    // runs before promoting a snapshot (the dbt-test / Great-Expectations
    // shape): each constraint is one aggregate over its table — key
    // uniqueness, null checks, domain ranges, referential integrity
    // (orphan orders → customers as a broadcast-able anti-join count) —
    // unioned into a (constraint, n_checked, n_violations) report. Every
    // measure is a count, so the report is integer-exact; each table is
    // scanned once per constraint family and nothing is collected until
    // the final tiny union.
    "pipeline_expectations" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val events = Tables.events(s, dir)
      val orders = Tables.orders(s, dir)
      val customer = Tables.customer(s, dir)
      def row(name: String, checked: Column, violations: Column, df: DataFrame) =
        df.agg(checked.cast("long").as("n_checked"),
            violations.cast("long").as("n_violations"))
          .select(lit(name).as("check_name"), col("n_checked"), col("n_violations"))
      row("documents.doc_id unique",
          count(lit(1)), count(lit(1)) - countDistinct(col("doc_id")), docs)
        .unionByName(row("documents.text not null",
          count(lit(1)), sum(when(col("text").isNull, 1L).otherwise(0L)), docs))
        .unionByName(row("documents.n_chars = len(text)",
          count(lit(1)),
          sum(when(col("n_chars") =!= length(col("text")), 1L).otherwise(0L)), docs))
        .unionByName(row("events.ts not null",
          count(lit(1)), sum(when(col("ts").isNull, 1L).otherwise(0L)), events))
        .unionByName(row("events.value finite",
          count(lit(1)),
          sum(when(col("value").isNull || col("value").isNaN, 1L).otherwise(0L)), events))
        .unionByName(
          // no broadcast hint: customer scales with sf, so the planner
          // picks (and at threshold scale this is a shuffled anti-join)
          orders.join(customer.select(col("c_custkey").as("o_custkey")),
              Seq("o_custkey"), "left_anti")
            .agg(count(lit(1)).as("orphans"))
            .crossJoin(orders.agg(count(lit(1)).as("total")))
            .select(lit("orders.o_custkey referential").as("check_name"),
              col("total").as("n_checked"), col("orphans").as("n_violations")))
        .orderBy("check_name")
    }),

    // DATASET CARD — the per-source audit table published next to a
    // training corpus (docs, languages, char/token volume, quality-gate
    // survivors, size extremes). Every measure is integer-exact (counts,
    // long sums, a threshold gate on the shared quality score), so the
    // card is bit-reproducible across engines and runs — an audit
    // artifact must never depend on partition order. One partial-agg
    // groupBy on a bounded categorical key: a single scan + one tiny
    // exchange at any corpus size.
    "pipeline_dataset_card" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_chars")).as("chars_total"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("tokens_total"),
          sum(when(TextAnalysis.qualityScore(col("text")) > 0.5, 1L).otherwise(0L)).as("n_keep"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy("source")),

    // SCHEMA EVOLUTION at ingest: a long-lived corpus accumulates
    // batches written under different schema generations (here: a v1
    // generation from before lang/n_chars were tracked — simulated as
    // the even doc_ids projected down to the v1 columns — and the
    // current v2 generation). `unionByName(allowMissingColumns=true)`
    // is the Spark-native merge: columns align BY NAME (never by
    // position — the classic silent-corruption trap when generations
    // reorder columns), and absent v1 columns surface as typed nulls
    // downstream quality gates can reason about. Narrow per-batch
    // projections + one union: no shuffle except the output sort at any
    // corpus size.
    "pipeline_schema_evolution" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val v1 = docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("text"), col("source"))
        .withColumn("schema_gen", lit("v1"))
      val v2 = docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
        .withColumn("schema_gen", lit("v2"))
      v1.unionByName(v2, allowMissingColumns = true)
        .select(col("doc_id"), col("schema_gen"), col("source"), col("lang"),
          col("n_chars"), length(col("text")).cast("long").as("text_len"))
        .orderBy("doc_id")
    }),

    // DQ ROUTING — the action pipeline_expectations only reports: every
    // document is routed clean/quarantine with its violated rules named
    // (fixed rule order, comma-joined), the split table a writer uses
    // to land the two outputs separately so bad rows never silently
    // vanish — they land reviewable, with the reason attached. Rules
    // reuse the engine's own primitives (qualityScore, the PII
    // detectors) so the gate cannot drift from the ops it guards. One
    // narrow row-local projection: no shuffle, linear at any scale.
    "pipeline_quarantine" -> ((s, dir) => {
      val pii = expr(
        "size(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+', 0)) + " +
          "size(regexp_extract_all(text, '[0-9]{6,}', 0))")
      Tables.documents(s, dir)
        .withColumn("violations", concat_ws(",",
          when(col("n_chars") < 64, lit("too_short")),
          when(TextAnalysis.qualityScore(col("text")) <= 0.5, lit("low_quality")),
          when(pii > 0, lit("has_pii"))))
        .select(col("doc_id"),
          when(col("violations") === "", lit("clean"))
            .otherwise(lit("quarantine")).as("route"),
          col("violations"))
        .orderBy("doc_id")
    }),

    // CDC MERGE — fold a changelog onto a materialized snapshot the way
    // a lakehouse MERGE INTO does, with latest-wins upserts and delete
    // tombstones ('error' events model deletes). The events stream is
    // read as a changelog on entity key user_id, split at 2024-01-15:
    // the base half compacts to a snapshot (latest non-tombstone state
    // per key), the second half is the incoming delta. Merge rules:
    // delta tombstone deletes the key, delta upsert replaces-or-inserts,
    // untouched snapshot rows carry through — each output row tagged
    // kept/updated/inserted. Scale shape: each side compacts with ONE
    // hash shuffle on the key + a row_number()=1 filter that compiles to
    // WindowGroupLimit (map-side top-1 — tasks forward one row per key,
    // not the key's whole history), then ONE shuffled full-outer
    // equi-join on the key. Nothing rescans history at merge time: at
    // production scale the snapshot is a persisted artifact and each
    // batch's cost is proportional to the DELTA, the same
    // batch-proportional posture as dedup_incremental_minhash.
    "pipeline_merge_upsert" -> ((s, dir) => {
      val cut = "2024-01-15"
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("value"))
      val snap = latestPerKey(ev.filter(col("ts") < lit(cut)))
        .filter(col("event_type") =!= "error") // base tombstones compact away
        .select(col("user_id"), col("ts").as("s_ts"),
          col("event_type").as("s_type"), col("value").as("s_value"))
      val delta = latestPerKey(ev.filter(col("ts") >= lit(cut)))
        .select(col("user_id"), col("ts").as("d_ts"),
          col("event_type").as("d_type"), col("value").as("d_value"))
      snap.join(delta, Seq("user_id"), "full_outer")
        .filter(col("d_type").isNull || col("d_type") =!= "error")
        .select(col("user_id"),
          when(col("d_type").isNull, lit("kept"))
            .when(col("s_type").isNull, lit("inserted"))
            .otherwise(lit("updated")).as("op"),
          date_format(when(col("d_type").isNotNull, col("d_ts"))
            .otherwise(col("s_ts")), "yyyy-MM-dd HH:mm:ss").as("last_ts"),
          when(col("d_type").isNotNull, col("d_type"))
            .otherwise(col("s_type")).as("last_type"),
          when(col("d_type").isNotNull, col("d_value"))
            .otherwise(col("s_value")).as("last_value"))
        .orderBy("user_id")
    })
  )

  private val bucketSql =
    s"${graft.functions.PortableHash.sql("CAST(doc_id AS VARCHAR)")} % 100"

  def oracles: Map[String, String] = Map(
    "pipeline_clean_corpus" ->
      s"""WITH kept AS (
         |  SELECT doc_id, lang, n_chars,
         |         md5(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
         |  FROM documents
         |  WHERE ${TextAnalysis.qualitySql} > 0.5),
         |canon AS (
         |  SELECT * FROM (
         |    SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rk
         |    FROM kept) WHERE rk = 1)
         |SELECT CASE WHEN $bucketSql < 90 THEN 'train' ELSE 'val' END AS split,
         |       lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
         |FROM canon GROUP BY 1, 2 ORDER BY split, lang""".stripMargin,

    "pipeline_pack_sequences" ->
      """WITH docs AS (
        |  SELECT doc_id, lang,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |         doc_id % 64 AS bucket
        |  FROM documents),
        |off AS (
        |  SELECT doc_id, lang, bucket, n_tok,
        |         sum(n_tok) OVER (PARTITION BY lang, bucket ORDER BY doc_id)
        |           - n_tok AS start_off
        |  FROM docs)
        |SELECT lang, bucket,
        |       CAST(floor(CAST(start_off AS DOUBLE) / 512) AS BIGINT) AS seq_id,
        |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tokens
        |FROM off GROUP BY 1, 2, 3 ORDER BY lang, bucket, seq_id""".stripMargin,

    "pipeline_expectations" ->
      """SELECT * FROM (
        |  SELECT 'documents.doc_id unique' AS check_name,
        |         count(*) AS n_checked,
        |         CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) AS n_violations
        |  FROM documents
        |  UNION ALL
        |  SELECT 'documents.text not null', count(*),
        |         CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'documents.n_chars = len(text)', count(*),
        |         CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM documents
        |  UNION ALL
        |  SELECT 'events.ts not null', count(*),
        |         CAST(sum(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM events
        |  UNION ALL
        |  SELECT 'events.value finite', count(*),
        |         CAST(sum(CASE WHEN value IS NULL OR isnan(value) THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM events
        |  UNION ALL
        |  SELECT 'orders.o_custkey referential',
        |         (SELECT count(*) FROM orders),
        |         (SELECT count(*) FROM orders o
        |          WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                            WHERE c.c_custkey = o.o_custkey))
        |) ORDER BY check_name""".stripMargin,

    "pipeline_schema_evolution" ->
      """SELECT doc_id, 'v1' AS schema_gen, source,
        |       CAST(NULL AS VARCHAR) AS lang, CAST(NULL AS BIGINT) AS n_chars,
        |       CAST(length(text) AS BIGINT) AS text_len
        |FROM documents WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT doc_id, 'v2', source, lang, n_chars, CAST(length(text) AS BIGINT)
        |FROM documents WHERE doc_id % 2 = 1
        |ORDER BY doc_id""".stripMargin,
    "pipeline_dataset_card" -> cardSql,

    // the merge over per-shard partials must publish the very same card
    "pipeline_card_mergeable" -> cardSql,

    "pipeline_quarantine" ->
      s"""WITH v AS (
         |  SELECT doc_id, concat_ws(',',
         |    CASE WHEN n_chars < 64 THEN 'too_short' END,
         |    CASE WHEN ${TextAnalysis.qualitySql} <= 0.5 THEN 'low_quality' END,
         |    CASE WHEN len(regexp_extract_all(text, '[a-z0-9._%+-]+@[a-z0-9.-]+'))
         |           + len(regexp_extract_all(text, '[0-9]{6,}')) > 0
         |         THEN 'has_pii' END) AS violations
         |  FROM documents)
         |SELECT doc_id,
         |       CASE WHEN violations = '' THEN 'clean'
         |            ELSE 'quarantine' END AS route,
         |       violations
         |FROM v ORDER BY doc_id""".stripMargin,

    "pipeline_merge_upsert" ->
      """WITH base AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM events WHERE ts < TIMESTAMP '2024-01-15'),
        |snap AS (
        |  SELECT user_id, ts, event_type, value
        |  FROM base WHERE rk = 1 AND event_type <> 'error'),
        |chg AS (
        |  SELECT user_id, ts, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM events WHERE ts >= TIMESTAMP '2024-01-15'),
        |delta AS (
        |  SELECT user_id, ts, event_type, value FROM chg WHERE rk = 1)
        |SELECT COALESCE(s.user_id, d.user_id) AS user_id,
        |       CASE WHEN d.user_id IS NULL THEN 'kept'
        |            WHEN s.user_id IS NULL THEN 'inserted'
        |            ELSE 'updated' END AS op,
        |       strftime(CASE WHEN d.user_id IS NOT NULL THEN d.ts ELSE s.ts END,
        |                '%Y-%m-%d %H:%M:%S') AS last_ts,
        |       CASE WHEN d.user_id IS NOT NULL THEN d.event_type
        |            ELSE s.event_type END AS last_type,
        |       CASE WHEN d.user_id IS NOT NULL THEN d.value
        |            ELSE s.value END AS last_value
        |FROM snap s FULL OUTER JOIN delta d ON s.user_id = d.user_id
        |WHERE d.event_type IS NULL OR d.event_type <> 'error'
        |ORDER BY user_id""".stripMargin
  )

  private lazy val cardSql: String =
    s"""SELECT source, count(*) AS n_docs,
       |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       |       CAST(sum(n_chars) AS BIGINT) AS chars_total,
       |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens_total,
       |       CAST(sum(CASE WHEN ${TextAnalysis.qualitySql} > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       |       min(n_chars) AS min_chars, max(n_chars) AS max_chars
       |FROM documents GROUP BY source ORDER BY source""".stripMargin
}
