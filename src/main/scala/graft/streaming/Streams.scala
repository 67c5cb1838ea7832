package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface.
  *
  * The reference is batch-only (SURVEY §1.1), so this is beyond-parity:
  * the same event-stream semantics the batch suite covers (q28/q30)
  * expressed as incremental plans — `readStream → transform →
  * writeStream` with watermarks bounding state. Each transform takes a
  * streaming OR batch DataFrame (Spark's unified API), so the batch
  * tests validate logic and the streaming tests validate incremental
  * execution with MemoryStream sources.
  *
  * Scale: state is keyed by (user_id[, window]) — high-cardinality keys
  * shard across executors; watermarks evict state so long-running jobs
  * hold only the active horizon.
  */
object Streams {

  /** Sessionization (the streaming twin of q30): native session windows
    * merge events, the watermark closes sessions and evicts their
    * state. Spark's session_window is half-open — an event at EXACTLY
    * last_event + gap starts a new session — while the batch twin's
    * `ts - lag(ts) > gap` keeps it in the old one; one microsecond
    * (Spark's timestamp resolution) is added to the gap so the merge
    * condition becomes `gap' ≤ gap`, restoring exact batch≡stream
    * session boundaries on any corpus, exact-gap pairs included. The
    * widened gap would also shift the reported `session_end` (always
    * last_event + gap') one microsecond past the batch twin's
    * `last_event + gap` bound, so the select subtracts it back —
    * start AND end now match the batch boundaries exactly. */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gap 1 microsecond"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        (col("session_window.end") - expr("INTERVAL 1 MICROSECOND"))
          .as("session_end"),
        col("n_events"))

  /** Tumbling-window event counts with late-data handling: rows later
    * than the watermark are dropped, on-time late rows update their
    * window — standard incremental aggregation shape. */
  def eventCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  // ---- custom keyed state: KeyValueGroupedDataset.mapGroupsWithState

  final case class UserEvent(user_id: Long, event_type: String,
      ts: java.sql.Timestamp)
  final case class UserStats(user_id: Long, n_events: Long, n_purchases: Long)
  /** [[runningUserStats]] state: the running stats plus the MAX event
    * time seen, so a late-but-admissible older event cannot REWIND the
    * idle deadline (the timeout must track the newest event ever seen,
    * not the newest in the current micro-batch). An implementation
    * detail of the state store, not API — public only because Spark's
    * encoder codegen must reach the constructor and accessors. */
  final case class UserState(stats: UserStats, maxTs: Long)

  /** Running per-user counters — the mapGroupsWithState shape for
    * semantics window functions can't express incrementally. State is
    * one small struct per user, EVICTED once the watermark passes the
    * user's last event + `idleTimeout` (EventTimeTimeout — the
    * watermark-driven idiom; ProcessingTimeTimeout would make
    * `processAllAvailable` block forever in tests): without eviction
    * the store would hold one entry per user_id ever seen and grow
    * monotonically — the unbounded-state trap the module doc warns
    * about. A user reappearing after eviction restarts from zero;
    * widen idleTimeout (or snapshot-join a batch table) where lifetime
    * totals matter. */
  def runningUserStats(events: Dataset[UserEvent],
      idleTimeout: String = "24 hours",
      watermark: String = "10 minutes"): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserState, UserStats](
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[UserEvent], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            // idle horizon passed: re-emit the final stats and drop the
            // state entry (Update-mode sinks already hold this value)
            val last = state.get.stats
            state.remove()
            last
          } else {
            val prev = state.getOption.getOrElse(
              UserState(UserStats(uid, 0L, 0L), 0L))
            // deadline = max event time EVER seen + idleTimeout: a late
            // batch (older than a prior one, admitted by the watermark)
            // must not move the eviction deadline backwards
            var maxTs = prev.maxTs
            val next = batch.foldLeft(prev.stats) { (acc, e) =>
              maxTs = math.max(maxTs, e.ts.getTime)
              acc.copy(
                n_events = acc.n_events + 1,
                n_purchases = acc.n_purchases + (if (e.event_type == "purchase") 1 else 0))
            }
            state.update(UserState(next, maxTs))
            state.setTimeoutTimestamp(maxTs, idleTimeout)
            next
          }
      }
  }

  /** Expected output mode for [[runningUserStats]] sinks. */
  val runningStatsOutputMode: OutputMode = OutputMode.Update()

  final case class KeyedEvent(key: String, event_id: Option[Long],
      ts: java.sql.Timestamp)
  /** [[quietGapGate]] state: event-time micros of the LAST same-key
    * event seen (admitted or not — the lag semantics of the batch
    * operator). Public only for Spark's encoder codegen. */
  final case class QuietGapState(lastUs: Long)

  /** Streaming quiet-gap event gate — [[graft.operators.Relational
    * .dedupEventsQuietGap]] as custom keyed state
    * (`flatMapGroupsWithState`: 0-or-more emissions per input, which
    * `mapGroupsWithState` can't express): admit an event when NO
    * same-key event precedes it within `windowSec`, tracking one
    * event-time long per key. The retry-storm gate for live ingest —
    * content dedup can't catch retries that carry fresh ids. State is
    * EVICTED once the watermark passes the key's last event +
    * `windowSec` (EventTimeTimeout): an entry older than the window
    * can only produce "admit" decisions, which is exactly what its
    * absence produces, so eviction never changes output — the state
    * store is bounded by keys ACTIVE within one window, not keys ever
    * seen. Within a micro-batch the group sorts by (ts, id) before the
    * lag walk; ACROSS batches the gate assumes in-order arrival per
    * key (the exactly-once ingest contract this library's sinks
    * target) — a cross-batch late event is compared against the newest
    * earlier event, not rewound. Stream ≡ batch pinned on in-order
    * feeds in StreamsSpec. Rows with NULL timestamps carry no event
    * time and are dropped here (the BATCH operator keeps them —
    * documented deviation; filter them to a side channel first if they
    * matter). Output: the surviving (key, event_id, ts) rows. */
  def quietGapGate(events: DataFrame, keyCols: Seq[String], tsCol: String,
      idCol: String, windowSec: Long,
      watermark: String = "10 minutes"): Dataset[KeyedEvent] = {
    require(keyCols.nonEmpty, "keyCols must not be empty")
    require(windowSec > 0, s"windowSec must be > 0, got $windowSec")
    val spark = events.sparkSession
    import spark.implicits._
    val keyed = events
      .filter(col(tsCol).isNotNull)
      // NUL-separated, NULL-safe key encoding: concat_ws SKIPS null
      // arguments, so a bare cast would let (NULL, "click") collide
      // with ("click", NULL) into one state entry and wrongly suppress
      // cross-key events (review r18.3). Each component is prefixed
      // ("v" value / "n" null) so NULL is its own key component, like
      // the batch operator's window partitioning.
      .select(concat_ws("\u0000",
        keyCols.map(c => coalesce(concat(lit("v"), col(c).cast("string")),
          lit("n"))): _*).as("key"),
        col(idCol).cast("long").as("event_id"),
        col(tsCol).cast("timestamp").as("ts"))
      // watermark LAST: tagging before the select would mint a fresh
      // untagged `ts` attribute and EventTimeTimeout would reject it
      .withWatermark("ts", watermark)
      .as[KeyedEvent]
    keyed
      .groupByKey(_.key)
      .flatMapGroupsWithState[QuietGapState, KeyedEvent](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, batch: Iterator[KeyedEvent], state: GroupState[QuietGapState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            def us(e: KeyedEvent): Long =
              e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
            // a NULL tie id sorts first, like the batch window's
            // NULLS FIRST asc default (and never crashes the encoder —
            // event_id is Option for exactly that row shape)
            val sorted = batch.toSeq.sortBy(e =>
              (us(e), e.event_id.getOrElse(Long.MinValue)))
            var last = state.getOption.map(_.lastUs)
            val out = sorted.filter { e =>
              val t = us(e)
              val admit = last.forall(t - _ > windowSec * 1000000L)
              last = Some(t)
              admit
            }
            last.foreach { l =>
              state.update(QuietGapState(l))
              // Spark rejects a timeout at or below the watermark — an
              // old enough batch would otherwise throw; clamping to
              // watermark+1 evicts at the next trigger, which is
              // correct (the entry is already past its useful window)
              // CEIL the micros->millis conversion: flooring could
              // evict up to 999 us before lastUs + window, and a
              // gap-just-inside-the-window event arriving after that
              // eviction would be wrongly admitted (review r18.3)
              state.setTimeoutTimestamp(
                math.max((l + windowSec * 1000000L + 999L) / 1000L,
                  state.getCurrentWatermarkMs() + 1L))
            }
            out.iterator
          }
      }
  }

  final case class CdcInput(key: String, seq: Long, op: Option[String],
      payload: Option[String])
  /** [[cdcGate]] state: the key's CURRENT winner. Public only for
    * Spark's encoder codegen. */
  final case class CdcState(seq: Long, op: Option[String],
      payload: Option[String], deleted: Boolean)
  /** One net state change per key per micro-batch: the new current
    * row (`deleted = false`, `payload` = the row's key AND payload
    * columns as JSON — natural keys recover via `from_json`) or a
    * tombstone (`deleted = true`) when the latest operation is the
    * delete op. */
  final case class CdcChange(key: String, seq: Long, op: Option[String],
      payload: Option[String], deleted: Boolean)

  /** Streaming CDC apply — [[graft.operators.Relational.cdcApply]] as
    * custom keyed state (the warehouse-maintenance twin of
    * [[quietGapGate]]): materialize CURRENT state from a live
    * changelog, emitting one NET change row per key per micro-batch —
    * the new winner (highest `seqCol`; latest op `deleteOp` → a
    * tombstone with `deleted = true`) — and nothing when a batch
    * leaves the key unchanged (stale replays are ignored: only a
    * STRICTLY newer seq advances state, so replayed rows are
    * idempotent, exactly the batch operator's latest-wins contract; a
    * NULL op is NOT a tombstone — the batch stance). `seqCol` must be
    * key-unique (the batch contract: "pass tie columns IN seqCols" —
    * here, fold them into one long up front); rows whose seq is NULL
    * OR not castable to long carry no position in the log and are
    * dropped (the quietGapGate NULL-ts stance — the filter runs on the
    * CAST value, so a malformed version token degrades to a drop, not
    * an encoder crash mid-stream; review r19.1). The key columns AND
    * the payload columns ride as ONE JSON payload
    * (`to_json(struct(keyCols ++ payloadCols))` — `from_json` recovers
    * the NATURAL keys and values at the sink; the emitted `key` string
    * is the internal NUL-separated state encoding, for
    * dedup/partitioning only; review r19.3).
    *
    * State is one (seq, op, payload) per LIVE key with NO timeout —
    * deliberately: current-state semantics cannot forget a key without
    * re-admitting stale replays of it, and the state size equals the
    * materialized dimension itself (what any CDC target stores anyway;
    * at big-dimension scale back the store with RocksDB). Stream ≡
    * batch pinned on in-order feeds in StreamsSpec; `graft ingest
    * --mode cdc` fronts the bounded-input form. Output mode Append. */
  def cdcGate(changelog: DataFrame, keyCols: Seq[String], seqCol: String,
      opCol: String, deleteOp: String,
      payloadCols: Seq[String]): Dataset[CdcChange] = {
    require(keyCols.nonEmpty, "keyCols must not be empty")
    require(payloadCols.nonEmpty, "payloadCols must not be empty")
    val spark = changelog.sparkSession
    import spark.implicits._
    val keyed = changelog
      // the quietGapGate NUL-separated NULL-safe key encoding: a bare
      // concat_ws SKIPS nulls and would collide (NULL, "x") with
      // ("x", NULL)
      .select(concat_ws("\u0000",
        keyCols.map(c => coalesce(concat(lit("v"), col(c).cast("string")),
          lit("n"))): _*).as("key"),
        col(seqCol).try_cast(org.apache.spark.sql.types.LongType).as("seq"),
        col(opCol).cast("string").as("op"),
        to_json(struct((keyCols ++ payloadCols.filterNot(keyCols.contains))
          .map(col): _*)).as("payload"))
      // try_cast + filter on the RESULT: under ANSI a plain cast of an
      // uncastable version token throws mid-stream, and an
      // isNotNull-on-the-raw-column filter would let a NULL result
      // crash the non-nullable Long encoder (review r19.1)
      .filter(col("seq").isNotNull)
      .as[CdcInput]
    keyed
      .groupByKey(_.key)
      .flatMapGroupsWithState[CdcState, CdcChange](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, batch: Iterator[CdcInput], state: GroupState[CdcState]) =>
          // ONE streaming pass keeping the strict-> winner: seq is
          // key-unique by contract, so order among (out-of-contract)
          // equal seqs was never guaranteed — and materializing the
          // batch to sort it would hold a hot key's whole micro-batch
          // (payload JSON included) in executor memory (review r19.4)
          var cur = state.getOption
          var changed = false
          batch.foreach { r =>
            if (cur.forall(r.seq > _.seq)) {
              cur = Some(CdcState(r.seq, r.op, r.payload,
                deleted = r.op.contains(deleteOp)))
              changed = true
            }
          }
          if (!changed) Iterator.empty
          else {
            val c = cur.get
            state.update(c)
            Iterator.single(
              CdcChange(key, c.seq, c.op, c.payload, c.deleted))
          }
      }
  }

  final case class FunnelEvent(key: String, etype: String,
      ts: java.sql.Timestamp)
  /** [[funnelGate]] state: the key's first-touch entry (event-time
    * µs), the highest step reached (1-based) and its completion time.
    * Public only for Spark's encoder codegen. */
  final case class FunnelState(entryUs: Long, step: Int, prevUs: Long)
  /** One row per step COMPLETION: the live funnel event feed.
    * `count(distinct key) GROUP BY step_no` downstream reproduces
    * [[graft.operators.Relational.funnelStepsWithin]]'s n_keys. */
  final case class FunnelHit(key: String, step_no: Int, step: String,
      ts: java.sql.Timestamp)

  /** Streaming first-touch funnel — [[graft.operators.Relational
    * .funnelStepsWithin]] as custom keyed state (the product-analytics
    * twin of [[cdcGate]]): emit a row the moment a key completes a
    * funnel step, where entry is the key's FIRST step-1 event and
    * every later step must land strictly after the previous one and
    * within `withinSec` of entry (deadline inclusive — the batch
    * operator's exact contract). Within a micro-batch events walk in
    * event-time order (the per-key sort EVERY order-dependent gate
    * pays — the quietGapGate shape; same-instant events cannot advance
    * twice, so ties need no ordering); ACROSS batches the gate assumes
    * in-order arrival per key (the ingest contract). Walking in time
    * order IS the batch greedy: the first qualifying event per step is
    * the earliest. Rows with NULL timestamps are dropped (the
    * quietGapGate stance). State is one small struct per key that ever
    * entered, with NO timeout BY DESIGN: first-touch semantics must
    * remember the entry forever — evicting an expired or completed key
    * would let a later step-1 event RE-ENTER as a fresh funnel, which
    * the batch operator never does (the [[cdcGate]] stance; back the
    * store with RocksDB at big-key scale, or use session-scoped keys
    * when re-entry per session is the WANTED semantics). Stream ≡
    * batch pinned in StreamsSpec. Output mode Append. */
  def funnelGate(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      withinSec: Long): Dataset[FunnelHit] = {
    require(steps.nonEmpty, "steps must not be empty")
    require(steps.distinct.size == steps.size,
      s"duplicate step types in ${steps.mkString(", ")} — a funnel " +
        "revisiting a type needs distinct event types per stage")
    require(withinSec > 0, s"withinSec must be > 0, got $withinSec")
    val spark = events.sparkSession
    import spark.implicits._
    val windowUs = withinSec * 1000000L
    val keyed = events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(keyCol).cast("string").as("key"),
        col(typeCol).cast("string").as("etype"),
        col(tsCol).try_cast(org.apache.spark.sql.types.TimestampType)
          .as("ts"))
      // filter on the CAST result (the cdcGate r19.1 stance): a value
      // that fails the timestamp cast must degrade to a drop, not NPE
      // inside the state function and kill the query
      .filter(col("ts").isNotNull)
      .as[FunnelEvent]
    keyed
      .groupByKey(_.key)
      .flatMapGroupsWithState[FunnelState, FunnelHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, batch: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          def us(e: FunnelEvent): Long =
            e.ts.getTime * 1000L + (e.ts.getNanos / 1000L) % 1000L
          val sorted = batch.toSeq.sortBy(us)
          var st = state.getOption
          val hits = Seq.newBuilder[FunnelHit]
          sorted.foreach { e =>
            val t = us(e)
            st match {
              case None if e.etype == steps.head =>
                st = Some(FunnelState(t, 1, t))
                hits += FunnelHit(key, 1, steps.head, e.ts)
              case Some(s) if s.step < steps.length &&
                  e.etype == steps(s.step) && t > s.prevUs &&
                  t <= s.entryUs + windowUs =>
                st = Some(s.copy(step = s.step + 1, prevUs = t))
                hits += FunnelHit(key, s.step + 1, steps(s.step), e.ts)
              case _ => ()
            }
          }
          st.foreach(state.update)
          hits.result().iterator
      }
  }

  /** Stream-stream LAST-TOUCH attribution: each purchase is attributed
    * to the LATEST click by the same user within the preceding
    * `horizon`. The interval join emits every qualifying (purchase,
    * click) pair with bounded state (both sides watermarked, both ends
    * of the event-time range constrained — without the bound,
    * stream-stream join state grows forever); the chained append-mode
    * max-aggregation then collapses the pairs to ONE row per purchase
    * once the watermark passes, so a downstream `sum(amount)` counts
    * each purchase exactly once even when several clicks qualify.
    * Purchases are identified by (user_id, purchase_ts, amount) by
    * default — two byte-identical purchases in the same instant would
    * merge into ONE attributed row, undercounting a downstream
    * `sum(amount)`, which replayed/at-least-once sources make easy to
    * hit. Pass `purchaseIdCol` naming a unique purchase id column to
    * include it in the identity (and the output) instead. */
  def attributePurchases(clicks: DataFrame, purchases: DataFrame,
      horizon: String = "30 minutes", watermark: String = "1 hour",
      purchaseIdCol: Option[String] = None): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val idCols = purchaseIdCol.toSeq.map(col)
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user") +: col("ts").as("purchase_ts") +:
        col("amount") +: idCols: _*)
    p.join(c,
      col("p_user") === col("c_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon"))
      .groupBy(col("p_user").as("user_id") +: col("purchase_ts") +:
        col("amount") +: idCols: _*)
      .agg(max(col("click_ts")).as("click_ts"))
      .select(col("user_id") +: col("purchase_ts") +: col("click_ts") +:
        col("amount") +: idCols: _*)
  }

  /** Streaming exact dedup — the incremental twin of the batch p01
    * content-hash dedup: duplicates arriving within the watermark
    * horizon are dropped, and hash state older than the watermark is
    * evicted (without the watermark bound, dedup state would grow with
    * the corpus — unbounded at 100 TB/day ingest).
    */
  def dedupDocuments(docs: DataFrame, watermark: String = "1 hour"): DataFrame = {
    // fail fast instead of silently overwriting (then dropping) a
    // caller column of the same name — the admitAgainstCorpus contract
    require(!docs.columns.contains("content_hash"),
      "docs already has column content_hash — drop or rename it before " +
        "calling dedupDocuments, which derives (and then drops) its own")
    docs
      // null text keys on an explicit sentinel so null-text rows dedup
      // among THEMSELVES, distinct from empty text — matching the batch
      // twin ([[graft.operators.Pipeline.exactDedup]]/p01, where a null
      // md5 partition key groups nulls together, away from md5("")).
      // dropDuplicates would treat a raw null key the same way, but the
      // sentinel states the contract instead of leaning on null-equality.
      .withColumn("content_hash",
        coalesce(md5(col("text")), lit("null:")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")
      // return exactly the caller's columns, like the batch twin
      // (exactDedup drops its helper too) — a sink downstream should
      // not land a derived md5 column
      .drop("content_hash")
  }

  /** Streaming NEAR-dup admission — the incremental twin of the batch
    * p23 band-signature anti-join: a document whose band-0 MinHash LSH
    * signature (the p19/p23 bucket key, built from the same codegen'd
    * shingle + minhash kernels) was already admitted within the
    * watermark horizon is dropped, so boilerplate re-posts and
    * lightly-edited copies are rejected at ingest with NO pairwise
    * work and no batch re-scan. The signature is computed entirely
    * map-side (state is one fixed-width string per admitted bucket);
    * documents too short to shingle (< 5 words) key on their exact
    * content hash instead, so they still dedup exactly rather than all
    * colliding into one "short" bucket. Same recall caveat as p23: one
    * band is a high-precision/lower-recall sketch — the batch p02
    * verification pass remains the exactness story.
    */
  def neardupGate(docs: DataFrame, watermark: String = "1 hour"): DataFrame = {
    import graft.operators.Pipeline
    // same fail-fast contract as [[dedupDocuments]]/admitAgainstCorpus:
    // never silently overwrite-then-drop a caller's column
    require(!docs.columns.contains("band_sig"),
      "docs already has column band_sig — drop or rename it before " +
        "calling neardupGate, which derives (and then drops) its own")
    // null text keys on an explicit sentinel (same contract as
    // [[dedupDocuments]]): null-text rows dedup among themselves,
    // distinct from empty text, matching the batch p01/p23 twins.
    // Without it the null rows' band_sig would itself be null — which
    // dropDuplicates also groups together (null keys compare equal),
    // but the sentinel makes the grouping a stated contract rather
    // than an artifact of null-equality semantics.
    val ws = split(col("text"), "\\s+")
    docs
      .withColumn("band_sig",
        when(col("text").isNull, lit("null:"))
          .when(size(ws) >= 5, Pipeline.bandSignature(Pipeline.shingleHashes(ws)))
          .otherwise(concat(lit("short:"), md5(col("text")))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("band_sig")
      // same caller-columns contract as [[dedupDocuments]]
      .drop("band_sig")
  }

  /** [[neardupGate]] on the ONE-permutation band key: the dedup key is
    * the `rows`-slot [[graft.plans.OphSignature]] signature, computed
    * with ONE hash per shingle instead of `rows`
    * ([[graft.operators.Pipeline.ophSignatures]]'s kernel) — the
    * cheap-signature path for ingest streams, where the signature
    * recomputes on EVERY arriving document forever. Same null/short
    * sentinels, watermark semantics and caller-columns contract as
    * [[neardupGate]]; the candidate sensitivity differs only through
    * OPH's slot randomness (both keys are unbiased Jaccard samplers).
    */
  def neardupGateOph(docs: DataFrame, watermark: String = "1 hour",
      rows: Int = 4): DataFrame = {
    import graft.operators.Pipeline
    require(!docs.columns.contains("oph_band_sig"),
      "docs already has column oph_band_sig — drop or rename it before " +
        "calling neardupGateOph, which derives (and then drops) its own")
    val ws = split(col("text"), "\\s+")
    val sig = call_function("oph_sig", Pipeline.shingleHashes(ws), lit(rows))
    docs
      .withColumn("oph_band_sig",
        when(col("text").isNull, lit("null:"))
          .when(size(ws) >= 5,
            array_join(transform(sig, v => v.cast("string")), ","))
          .otherwise(concat(lit("short:"), md5(col("text")))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("oph_band_sig")
      .drop("oph_band_sig")
  }

  /** Ingest-time scrub + quality gate — the stage that runs in-line
    * with the stream BEFORE any stateful operator: drop documents
    * shorter than `minChars` (measured on the RAW text, so survival
    * does not depend on how much PII shrinks away), then redact PII in
    * place ([[graft.operators.PiiScrub]], the batch p20 expressions
    * verbatim) and record the match count as `n_pii`. Every other
    * column (`ts`, `source`, …) passes through untouched, so the gate
    * composes directly with the stateful stages —
    * `dedupDocuments(scrubAndGate(docs))` dedups on the scrubbed text.
    * Entirely stateless map-side expressions: no watermark, no state
    * store, and bit-identical between batch and streaming execution
    * (asserted batch≡stream in StreamsSpec). `patterns` swaps in a
    * caller compliance pack ([[graft.operators.PiiScrub.DefaultPatterns]]
    * is the production starting point); the default stays the frozen
    * fixture pack the batch≡stream assertion pins. */
  def scrubAndGate(docs: DataFrame, minChars: Int = 50,
      patterns: Seq[graft.operators.PiiScrub.PiiPattern] =
        graft.operators.PiiScrub.FixturePatterns): DataFrame = {
    import graft.operators.PiiScrub
    docs
      .filter(length(col("text")) >= minChars)
      .withColumn("n_pii",
        PiiScrub.counts(col("text"), patterns).reduce(_ + _))
      .withColumn("text", PiiScrub.redact(col("text"), patterns))
  }

  /** Blocklist gate for a document stream — [[graft.operators.Pipeline
    * .badwordsFilter]] applied per micro-batch: the config-sized
    * blocklist collapses to one sorted-hash broadcast row and each
    * batch's docs probe it map-side (binary search), so the gate is
    * STATELESS — no watermark, no state store — and composes freely
    * with the dedup/scrub gates. Blocked documents are dropped;
    * `textCol` names the stream's text column. */
  def blocklistGate(docs: DataFrame, badwords: Seq[String],
      textCol: String = "text"): DataFrame =
    graft.operators.Pipeline.badwordsFilter(docs, textCol, badwords)
      .filter(!col("blocked")).drop("blocked")

  /** Data-quality gate for an ingest stream — [[graft.operators
    * .Relational.flagRowViolations]] applied per micro-batch: every
    * row gains `n_violated`/`violated` from the ROW-LOCAL check
    * families (not-null / range / set), and rows violating anything
    * are DROPPED when `dropViolations` (quarantine them first by
    * splitting on the flag upstream of the drop). The projection is
    * one codegen'd map pass, so the gate is STATELESS — no watermark,
    * no state store — and composes freely with the scrub/dedup gates;
    * keyed checks (unique / referential) need cross-row state and
    * stay batch-side in `checkConstraints` (the library raises on
    * them here, same as batch). Stream ≡ batch pinned in StreamsSpec. */
  def auditGate(rows: DataFrame,
      checks: Seq[graft.operators.Relational.TableCheck],
      dropViolations: Boolean = true): DataFrame = {
    val flagged = graft.operators.Relational.flagRowViolations(rows, checks)
    if (dropViolations)
      flagged.filter(col("n_violated") === 0)
        .drop("n_violated", "violated")
    else flagged
  }

  /** Bloom snapshot gate for a document stream — [[graft.operators
    * .Pipeline.bloomDedupPacked]] applied per micro-batch: the STATIC
    * reference corpus (last snapshot's admitted docs) collapses to one
    * PACKED bitset row bounded by `mBits/8` bytes (the packed form
    * matters doubly here — the broadcast re-ships per micro-batch, so
    * the 32× saving over the sorted-position row is paid every
    * trigger), and each batch's docs probe it map-side via O(k) bit
    * tests, so the gate is STATELESS — no watermark, no state store —
    * and drops exactly what the batch operator would (flags pinned
    * packed ≡ positions in BloomPackedSpec, including the documented
    * false-positive trade; a doc the filter wrongly claims to know is
    * lost, never the reverse). This is the streaming half of the Dolma
    * BFF recipe: cheap snapshot-over-snapshot dedup for a live ingest
    * feed, with the exact/near-dup stateful gates handling
    * WITHIN-stream duplicates. The static side re-resolves per batch,
    * so republished snapshot files are picked up without a restart. */
  def bloomGate(docs: DataFrame, reference: DataFrame, textCol: String,
      mBits: Int, k: Int): DataFrame =
    graft.operators.Pipeline.bloomDedupPacked(docs, reference, textCol, mBits, k)
      .filter(!col("in_bloom")).drop("bloom_hits", "in_bloom")

  /** NEAR-dup gate against a STATIC reference corpus — [[bloomGate]]'s
    * recipe lifted from exact text hashes to OPH band keys
    * ([[graft.operators.Pipeline.neardupBloomBuild]] /
    * `neardupFlagAgainstBloom`, the p129-gated batch pair): the
    * reference's LSH bucket keys collapse into one fixed `mBits/8`-byte
    * packed Bloom row, and each arriving doc is dropped when ANY of its
    * band keys is claimed present. STATELESS like bloomGate (no
    * watermark, no state store; the static side re-resolves per batch,
    * so a republished reference snapshot is picked up without restart)
    * — this is how a live ingest feed scrubs near-duplicates of
    * yesterday's 100 TB corpus without yesterday's corpus ever
    * shuffling: the batch twin [[graft.operators.Pipeline
    * .minhashNeardupAgainstCorpus]] verifies exactly, this gate trades
    * its verification join for a fixed-size broadcast (Bloom false
    * positives lose a clean doc at the documented (bits/m)^k rate;
    * misses only from LSH recall). Within-stream duplicates still need
    * [[neardupGateOph]] — compose both, as `graft ingest` does for the
    * exact case. */
  def neardupGateAgainstCorpus(docs: DataFrame, reference: DataFrame,
      textCol: String = "text", mBits: Int = 1 << 22, k: Int = 5): DataFrame =
    graft.operators.Pipeline.neardupFlagAgainstBloom(docs, textCol,
      graft.operators.Pipeline.neardupBloomBuild(reference, textCol,
        mBits, k),
      mBits, k)
      .filter(!col("neardup_in_ref")).drop("neardup_in_ref")

  /** Streaming IMAGE near-dup gate against a static reference
    * collection — [[neardupGateAgainstCorpus]]'s deployment shape for
    * the perceptual-hash family: the reference's aHash band keys pack
    * ONCE into a fixed-size Bloom filter
    * ([[graft.operators.Multimodal.imageBloomBuild]]) and every
    * arriving image decodes + hashes in-stream (the typed
    * mapPartitions decode works unchanged under streaming) and probes
    * the broadcast filter map-side — stateless, no watermark, no
    * state store; a republished reference snapshot is picked up per
    * micro-batch without restart. Admits images the filter does not
    * claim; pigeonhole hamming ≤ 3 collisions with the reference
    * always drop, clean images drop at the filter's documented
    * false-positive rate. Output: the surviving hash rows (doc_id,
    * width, height, b0..b3). */
  def imageGateAgainstCorpus(
      records: Dataset[graft.operators.Multimodal.MediaRecord],
      refHashes: Dataset[graft.operators.Multimodal.ImagePHash],
      mBits: Int = 1 << 22, k: Int = 5): DataFrame = {
    val M = graft.operators.Multimodal
    M.imageFlagAgainstBloom(M.imagePerceptualHash(records),
      M.imageBloomBuild(refHashes, mBits, k), mBits, k)
      .filter(!col("neardup_in_ref")).drop("neardup_in_ref")
  }

  /** Streaming SEMANTIC decontamination gate — [[graft.operators
    * .Pipeline.semanticDecontaminate]] applied per micro-batch: the
    * STATIC eval set collapses to one broadcast row of (vector,
    * squared-norm) structs (benchmark-suite-sized by contract) and
    * every arriving row scores map-side (`float_dot` per eval vector,
    * `array_max`, the `>= tau` flag) — stateless, no watermark, no
    * state store, and the gate drops exactly what the batch operator
    * flags. The static side re-resolves per micro-batch, so a
    * republished eval snapshot is picked up without a restart. This is
    * the live-ingest half of the eval-similarity scrub: paraphrased
    * benchmark leakage that shares no n-gram with the eval set (and so
    * passes [[neardupGateAgainstCorpus]]) still blocks on embedding
    * proximity. Output: the surviving rows, probe columns dropped. */
  def semanticGate(docs: DataFrame, evalSet: DataFrame, vecCol: String,
      tau: Double): DataFrame =
    graft.operators.Pipeline.semanticDecontaminate(docs, evalSet, vecCol, tau)
      .filter(!col("flagged")).drop("max_cos", "n_over", "flagged")

  /** Streaming distinct-token counter — the HyperLogLog registers as a
    * STREAMING aggregation: each micro-batch's tokens melt map-side
    * into (bucket, rank) rows through the exact arithmetic of the
    * batch sketch ([[graft.operators.Pipeline.hllSketch]]'s own melt,
    * shared so the two can never drift), and `max(rank)` per bucket is
    * the running state — the state store holds AT MOST 2^b rows no
    * matter how long the stream runs, the bounded-state property that
    * makes an exact streaming `countDistinct` (unbounded key state)
    * unnecessary. Register-wise max is associative, idempotent and
    * monotone, so restarts and replays can only re-confirm state,
    * never corrupt it. Emit in update/complete mode; feed the rows to
    * [[graft.operators.Pipeline.hllMerge]]/`hllEstimate` (batch) for
    * the estimate, or max-merge them with a historical sketch. Output:
    * (bucket, register). */
  def distinctCountHll(docs: DataFrame, textCol: String = "text",
      b: Int = 6): DataFrame =
    graft.operators.Pipeline.hllMelt(docs, textCol, b)
      .groupBy(col("__b").as("bucket"))
      .agg(max(col("__rk")).as("register"))

  /** Streaming term-frequency Count-Min sketch — the CMS cells as a
    * STREAMING aggregation (the [[distinctCountHll]] pattern for
    * frequencies): each micro-batch's tokens melt map-side into
    * (row, pos) cell hits through the batch sketch's own double-hash
    * arithmetic ([[graft.operators.Pipeline.cmsSketch]]'s cell pass,
    * shared so batch and stream can never drift), and the running
    * count per cell is the state — AT MOST depth×width rows no matter
    * how long the stream runs, versus the unbounded vocabulary an
    * exact streaming term count would hold. Cell addition is
    * associative and commutative, so replays only re-add what the
    * checkpoint already excludes. Emit in update/complete mode; probe
    * with min-over-rows (the [[graft.operators.Pipeline.cmsEstimate]]
    * contract: estimates only ever over-count). Output: (row, pos,
    * cnt). */
  def termFrequencyCms(docs: DataFrame, textCol: String = "text",
      depth: Int = 3, width: Int = 1024): DataFrame = {
    require(depth >= 1, s"depth must be >= 1, got $depth")
    require(width >= 1, s"width must be >= 1, got $width")
    graft.operators.Pipeline.cmsCells(docs, textCol, depth, width)
      .select(col("__j").as("row"), col("__pos").as("pos"),
        col("__c").as("cnt"))
  }

  /** Streaming data card — the p80 corpus card's per-stratum counters
    * as a STREAMING aggregation: running (n_docs, n_tokens, n_chars)
    * per stratum value, state bounded by the stratum cardinality (a
    * lang/source column — NOT a url-like key; the batch datacard CLI
    * enforces the same contract with its print cap). Counts are
    * associative sums, so restarts re-add only what the checkpoint
    * excludes. Emit in update/complete mode; the totals row of the
    * batch [[graft.operators.Pipeline.dataCard]] is the SUM over these
    * rows, pinned stream ≡ batch in StreamsSpec. Output: (key, n_docs,
    * n_tokens, n_chars). */
  def runningCardCounts(docs: DataFrame, strataCol: String,
      textCol: String = "text"): DataFrame =
    docs
      .select(graft.operators.Pipeline.cardStratumKey(col(strataCol))
          .as("key"),
        graft.operators.Pipeline.cardTokenCount(col(textCol)).as("__tok"),
        graft.operators.Pipeline.cardCharCount(col(textCol)).as("__ch"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("n_tokens"),
        sum(col("__ch")).as("n_chars"))

  /** Stream-static enrichment: join the unbounded stream against a
    * bounded dimension table (source metadata, license registry,
    * per-domain quality priors). Spark broadcasts the static side into
    * every micro-batch — no stream state, no watermark, and the static
    * side re-resolves per batch so a refreshed dim table is picked up
    * by simply swapping the underlying files. Left join: an event with
    * an unknown key passes through with nulls rather than silently
    * dropping (the enrichment must never lose corpus rows). */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Checkpointed parquet ingestion — the landing end of the stream:
    * append-mode file sink whose commit log (under `checkpoint`) gives
    * exactly-once file output across restarts. A batch committed before
    * a crash is never rewritten on resume, and an uncommitted one is
    * replayed from the source offsets, so downstream batch jobs (the
    * whole Pipeline suite) read each ingested record exactly once.
    * Readers must use the sink's `_spark_metadata` log (plain
    * `spark.read.parquet` on the directory does) so half-written files
    * from an in-flight batch are invisible. */
  def toParquet(df: DataFrame, path: String, checkpoint: String,
      trigger: Option[org.apache.spark.sql.streaming.Trigger] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val w = df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
    trigger.fold(w)(w.trigger).start()
  }
}
