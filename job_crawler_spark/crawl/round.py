"""The crawl round loop: schedule -> fetch -> parse -> commit, resumable.

Spark-first re-expression of the reference's flagship pipeline
``search_jobs_with_analysis_framework`` (main.py:479-566, SURVEY.md §3.1):
validate -> fetch -> dedup -> limit -> enrich -> lineage log, generalized to
the north rule's round-based URL-frontier crawl:

  round k:
    1. read pending frontier (latest catalog snapshot)
    2. politeness-schedule the batch (per-host budget window rank)
    3. fetch + parse scheduled URLs (Arrow-batched stages)
    4. enrich documents (pure column expressions)
    5. expand outlinks -> new frontier candidates, dedup:
         Bloom prefilter (broadcast shards) -> exact anti-join vs seen
    6. COMMIT, in replay-idempotent order:
         documents (MERGE by doc_id) -> seen (anti-join append) ->
         seen_shards (OR-merge) -> frontier (overwrite) ->
         crawl_log (per-partition lineage, round-keyed rewrite) ->
         checkpoint marker (LAST)

Because the checkpoint marker commits last and every earlier write is
idempotent (MERGE / anti-join-append / OR / overwrite-derived-from-snapshot),
a job killed mid-round replays exactly that round and converges to the same
state — the kill-and-resume contract of BASELINE.json. Determinism: batch
selection is a pure function of the frontier snapshot (total order
(priority DESC, url_canon ASC)), fetch/parse are deterministic, so replayed
rounds are bit-identical.

Failed fetches are committed to ``seen`` (no retry) and counted in lineage —
the reference's errors-degrade-never-raise policy (main.py:241-243).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from job_crawler_spark import schemas
from job_crawler_spark.catalog import Catalog
from job_crawler_spark.crawl import fetcher, parser
from job_crawler_spark.functions.urls import canonicalize_url_col, host_col
from job_crawler_spark.operators import bloom, cuckoo
from job_crawler_spark.operators.dedup import anti_join_seen, first_wins_agg
from job_crawler_spark.operators.politeness import schedule_batch

CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("scheduled", T.LongType(), False),
        T.StructField("fetched", T.LongType(), False),
        T.StructField("failed", T.LongType(), False),
        T.StructField("docs_total", T.LongType(), False),
        T.StructField("seen_total", T.LongType(), False),
        T.StructField("frontier_pending", T.LongType(), False),
        # snapshot versions AFTER this round's commits — the next round (and
        # any replay of it) reads its inputs as-of these versions, never
        # "latest": time travel is what makes mid-frontier resume exact.
        T.StructField("frontier_v", T.IntegerType(), False),
        T.StructField("seen_v", T.IntegerType(), False),
        T.StructField("shards_v", T.IntegerType(), False),
    ]
)

PENDING_SCHEMA = T.StructType(
    [
        T.StructField("url_canon", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("priority", T.DoubleType(), False),
        T.StructField("round", T.IntegerType(), False),
    ]
)


@dataclass
class CrawlEngine:
    spark: SparkSession
    catalog: Catalog
    robots: DataFrame
    round_seconds: int = 60
    salt_buckets: int = 32
    # True by default: real crawl rounds have truncating budgets, so the
    # adaptive stats probe in schedule_batch would pay an extra full pass
    # over the frontier every round just to conclude "salt". Set to None to
    # re-enable adaptive detection, False for uncapped drain rounds.
    salted: bool | None = True
    # Adaptive salt sizing (SURVEY §7.3): each round records the written
    # frontier's hottest-host pending count (a one-column aggregate riding
    # the commit path) and the NEXT round sizes its phase-1 salt as
    # ceil(hottest / salt_target_rows), clamped to [1, 256] — so a mild
    # frontier doesn't pay 32-way pre-rank fan-out and a 10^9-row hot host
    # still gets bounded window partitions. Correctness-neutral for ANY
    # bucket count (top-k of per-bucket top-ks == global top-k); the first
    # round after a cold resume falls back to the static salt_buckets.
    salt_auto: bool = True
    salt_target_rows: int = 1 << 16
    # URL-seen prefilter backend: "bloom" (default) or "cuckoo" (deletable).
    # Correctness-neutral either way — the exact anti-join is authoritative.
    seen_filter: str = "bloom"
    # How candidate URLs consult the filter: "broadcast" ships the whole
    # filter to every executor (shuffle-free; right while it fits),
    # "routed" shuffles candidates to their shard's reducer and probes only
    # that shard (peak task memory = one shard, independent of filter size
    # — the 10^10-key design point). "auto" (default) picks by the merged
    # filter's configured size: broadcast while it fits under
    # broadcast_filter_max_bytes, routed beyond — so callers scaling the
    # filter up never have to remember to flip the flag.
    probe_mode: str = "auto"
    broadcast_filter_max_bytes: int = 256 << 20
    bloom_shards: int = 64
    bloom_bits: int = 1 << 20
    bloom_k: int = 5
    # cuckoo backend sizing: 1<<14 buckets x 4 slots x 2 B = 128 KiB/shard —
    # the same footprint as the bloom default, NOT bloom_bits (a 1<<20-bucket
    # table would be 8 MiB/shard, 512 MiB broadcast per round)
    cuckoo_buckets: int = 1 << 14
    # documents commit strategy: "mor" (default) = merge-on-read — append a
    # round-keyed partition per round (O(round) commit, like real Iceberg
    # MoR; read through read_docs(), fold superseded copies with
    # compact_docs()); "cow" = copy-on-write MERGE (whole-table rewrite per
    # round — the Iceberg-MERGE parity mode, exact table = visible rows).
    docs_mode: str = "mor"
    # Auto-compaction policy (mor mode): run() compacts the documents table
    # when the re-crawl backlog (victims force_recrawl re-admitted, each of
    # which leaves one superseded copy once refetched) reaches this fraction
    # of the table's physical rows. The trigger is free: an in-memory
    # counter vs a manifest row count — no table scan.
    # Opt-in crawler-trap demotion (operators/traps.py): each round profiles
    # the pending frontier's per-host URL-space signals (path diversity /
    # template collapse / query diversity / depth) and excludes trap-flagged
    # hosts from scheduling. Demotion, not deletion: the rows stay pending
    # in the frontier table, so flipping the flag (or a threshold change)
    # re-admits them — and the signal pass is two map-side-combined
    # aggregates over the already-read frontier frame. Default False: the
    # reference-parity gates pin the crawl order WITHOUT demotion, and trap
    # policy is a deployment decision.
    trap_demotion: bool = False
    # Opt-in redirect handling (operators/redirects.py): a frame of
    # HTTP-3xx edges (src, dst — CANONICAL URLs) resolved ONCE via pointer
    # doubling and applied at every admission point (bootstrap, seed
    # ingest, outlink expansion): sources rewrite to their final landing
    # URL, redirect loops are dropped before they ever reach the frontier.
    # Rewriting happens BEFORE first-wins dedup, so seeds collapsing onto
    # one landing URL dedup naturally, and the seen filter only ever
    # tracks final URLs (intermediate hops re-rewrite via one
    # broadcastable join per admission — no filter state for them).
    # Default None: the reference-parity gates pin crawl order WITHOUT
    # redirects, and the map is deployment data.
    redirects: DataFrame | None = None
    redirect_max_hops: int = 8
    _redirect_res: DataFrame | None = field(
        default=None, init=False, repr=False
    )
    # Opt-in learned DUST rules (operators/dust.py mine_param_rules
    # output): kept parameter-strip rules applied at the same admission
    # points, AFTER redirect resolution (a final landing URL gets its
    # learned-strippable params removed) and BEFORE first-wins dedup, so
    # parameter aliases collapse without ever being fetched. One rewrite
    # pass per admission, like the static canonicalizer — a URL whose
    # stripped form is itself a redirect source re-rewrites at its next
    # admission. Default None for the same parity/policy reasons as
    # `redirects`.
    dust_rules: DataFrame | None = None
    auto_compact: bool = True
    compact_superseded_frac: float = 0.2
    # The backlog counter is in-memory and lost on restart, so every
    # compact_check_rounds rounds the policy audits the EXACT superseded
    # count (physical rows minus distinct doc_ids — one single-column
    # aggregate) and compacts from that if the threshold is crossed. This
    # heals restart-lost counters and any backlog under/over-count.
    compact_check_rounds: int = 16
    stats: list[dict] = field(default_factory=list)
    # hottest-host pending count of the latest written frontier (driver-side
    # cache feeding salt_auto; None until a round commits in-process)
    _hot_pending: int | None = field(default=None, init=False, repr=False)
    # URLs force_recrawl re-admitted since the last compaction (upper bound
    # on superseded doc copies being created by subsequent rounds)
    _recrawl_backlog: int = field(default=0, init=False, repr=False)
    _rounds_since_compact_check: int = field(default=0, init=False, repr=False)

    def __post_init__(self) -> None:
        if self.seen_filter not in ("bloom", "cuckoo"):
            raise ValueError(
                f"seen_filter must be 'bloom' or 'cuckoo', got {self.seen_filter!r}"
            )
        if self.probe_mode not in ("auto", "broadcast", "routed"):
            raise ValueError(
                f"probe_mode must be 'auto', 'broadcast' or 'routed', got "
                f"{self.probe_mode!r}"
            )
        if self.docs_mode not in ("cow", "mor"):
            raise ValueError(
                f"docs_mode must be 'cow' or 'mor', got {self.docs_mode!r}"
            )

    # table names
    T_FRONTIER = "frontier"
    T_SEEN = "seen"
    T_SHARDS = "seen_shards"
    T_DOCS = "documents"
    T_LOG = "crawl_log"
    T_CKPT = "checkpoints"
    T_SCHED = "schedule_log"
    T_BLOOM_META = "bloom_meta"

    BLOOM_META_SCHEMA = T.StructType(
        [
            T.StructField("backend", T.StringType(), False),
            T.StructField("n_shards", T.IntegerType(), False),
            T.StructField("m_bits", T.LongType(), False),  # cuckoo: n_buckets
            T.StructField("k", T.IntegerType(), False),    # cuckoo: 0
        ]
    )

    def _meta_tuple(self) -> tuple[str, int, int, int]:
        if self.seen_filter == "bloom":
            return ("bloom", self.bloom_shards, self.bloom_bits, self.bloom_k)
        return ("cuckoo", self.bloom_shards, self.cuckoo_buckets, 0)

    def _check_bloom_params(self) -> None:
        """The persisted shard bitmaps/tables are only meaningful under the
        exact backend + parameters that built them — resuming with different
        ones would silently probe wrong bits (or crash on blob length).
        Pinned at bootstrap, validated on every round."""
        rows = self.catalog.read(
            self.spark, self.T_BLOOM_META, schema=self.BLOOM_META_SCHEMA
        ).collect()
        if not rows:
            return  # pre-meta catalog (or fresh): nothing to validate against
        meta = rows[0].asDict()
        # catalogs written before the backend field existed are bloom-built
        got = (
            meta.get("backend", "bloom"),
            int(meta["n_shards"]),
            int(meta["m_bits"]),
            int(meta["k"]),
        )
        want = self._meta_tuple()
        if got != want:
            raise ValueError(
                f"bloom parameter mismatch: catalog built with "
                f"(backend, n_shards, m_bits, k)={got}, engine configured "
                f"{want}; resuming would mis-probe persisted seen_shards"
            )

    # -- seen-filter backend dispatch ------------------------------------------
    # The seen_shards table stores per-ROUND deltas (backend shard schema +
    # a round column): each round's delta is written with the same
    # round-keyed idempotent rewrite as the other per-round tables, so a
    # crash-and-replay rewrites its own delta instead of re-merging into an
    # already-merged table. Bloom OR-merge happens to be idempotent, but
    # cuckoo fingerprint insertion is NOT — deltas make replay exact for
    # both. collect() merges all rounds' deltas when broadcasting.

    def _filter_schema(self) -> T.StructType:
        base = bloom.SHARD_SCHEMA if self.seen_filter == "bloom" else cuckoo.SHARD_SCHEMA
        return T.StructType(
            list(base.fields) + [T.StructField("round", T.IntegerType(), False)]
        )

    def _build_filter_shards(self, keys: DataFrame) -> DataFrame:
        if self.seen_filter == "bloom":
            return bloom.build_shards(
                keys, "url_canon", self.bloom_shards, self.bloom_bits, self.bloom_k
            )
        return cuckoo.build_shards(
            keys, "url_canon", self.bloom_shards, self.cuckoo_buckets
        )

    def _filter_bytes(self) -> int:
        """Configured size of the MERGED filter (all shards) in bytes."""
        if self.seen_filter == "bloom":
            return self.bloom_shards * (self.bloom_bits // 8)
        # cuckoo: buckets x 4 slots x 2-byte fingerprints per shard
        return self.bloom_shards * self.cuckoo_buckets * 4 * 2

    def _resolved_probe_mode(self) -> str:
        if self.probe_mode != "auto":
            return self.probe_mode
        return (
            "routed"
            if self._filter_bytes() > self.broadcast_filter_max_bytes
            else "broadcast"
        )

    def _split_new_vs_seen(self, not_pending: DataFrame, shards_df: DataFrame):
        shards_df = shards_df.drop("round")
        if self._resolved_probe_mode() == "routed":
            if self.seen_filter == "bloom":
                return bloom.split_by_bloom_routed(
                    not_pending, shards_df,
                    self.bloom_shards, self.bloom_bits, self.bloom_k,
                    "url_canon",
                )
            return cuckoo.split_by_cuckoo_routed(
                not_pending, shards_df,
                self.bloom_shards, self.cuckoo_buckets, "url_canon",
            )
        if self.seen_filter == "bloom":
            shards = bloom.collect_shards(
                shards_df, self.bloom_shards, self.bloom_bits, self.bloom_k
            )
            return bloom.split_by_bloom(not_pending, self.spark, shards, "url_canon")
        shards = cuckoo.collect_shards(
            shards_df, self.bloom_shards, self.cuckoo_buckets
        )
        return cuckoo.split_by_cuckoo(not_pending, self.spark, shards, "url_canon")

    # -- bootstrap -------------------------------------------------------------
    def _apply_redirects(self, canon: DataFrame) -> DataFrame:
        """Rewrite admitted candidates through the optional redirect map
        and then the optional learned DUST rules: redirect sources land
        on their final URL (host recomputed), loop/over-cap sources are
        dropped, learned-strippable query parameters are removed
        (host-preserving). No-op without either. Must run BEFORE dedup so
        candidates collapsing onto one rewritten URL dedup normally."""
        if self.redirects is not None:
            from job_crawler_spark.operators.redirects import rewrite_frontier

            if self._redirect_res is None:
                from job_crawler_spark.operators.checkpoints import (
                    tracked_persist,
                )
                from job_crawler_spark.operators.redirects import (
                    resolve_redirects,
                )

                # resolved once per engine instance, reused by every admission
                self._redirect_res = tracked_persist(
                    resolve_redirects(
                        self.redirects, max_hops=self.redirect_max_hops
                    )
                )
            canon = rewrite_frontier(
                canon, self._redirect_res, url_col="url_canon"
            ).withColumn("host", host_col(F.col("url_canon")))
        if self.dust_rules is not None:
            from job_crawler_spark.operators.dust import apply_param_rules

            canon = apply_param_rules(
                canon, self.dust_rules, url_col="url_canon"
            )
        return canon

    def bootstrap(self, raw_frontier: DataFrame) -> None:
        """Seed the frontier: canonicalize, drop null/invalid urls, rewrite
        through the optional redirect map, first-wins dedup on canonical
        URL by (priority DESC, url ASC)."""
        canon = self._apply_redirects(
            raw_frontier.filter(F.col("url").isNotNull())
            .withColumn("url_canon", canonicalize_url_col(F.col("url")))
            .withColumn("host", host_col(F.col("url")))
            .filter(F.col("host") != "")
        )
        # survivor per canon URL: highest priority, then smallest raw url —
        # total order => deterministic under any partitioning; min_by
        # aggregate form (map-side combine, no per-key sort)
        deduped = first_wins_agg(
            canon.withColumn("neg_priority", -F.col("priority")),
            ["url_canon"],
            ["neg_priority", "url"],
        ).select("url_canon", "host", "depth", "priority", "round")
        fv = self.catalog.overwrite(deduped, self.T_FRONTIER)
        empty_seen = self.spark.createDataFrame([], schema=schemas.SEEN_SCHEMA)
        sv = self.catalog.overwrite(empty_seen, self.T_SEEN)
        empty_shards = self.spark.createDataFrame([], schema=self._filter_schema())
        shv = self.catalog.overwrite(empty_shards, self.T_SHARDS)
        meta = self.spark.createDataFrame(
            [self._meta_tuple()], schema=self.BLOOM_META_SCHEMA
        )
        self.catalog.overwrite(meta, self.T_BLOOM_META)
        # round -1 checkpoint pins the bootstrap snapshot versions for round 0
        marker = self.spark.createDataFrame(
            [
                {
                    "round": -1, "scheduled": 0, "fetched": 0, "failed": 0,
                    "docs_total": 0, "seen_total": 0, "frontier_pending": 0,
                    "frontier_v": fv, "seen_v": sv, "shards_v": shv,
                }
            ],
            schema=CHECKPOINT_SCHEMA,
        )
        # tagged with its round: a pre-round-0 seed ingest repins this row
        # via overwrite_partition(-1), which must replace — not duplicate —
        # the bootstrap marker
        self.catalog.overwrite(marker, self.T_CKPT, part=-1)

    # -- resume ------------------------------------------------------------------
    def next_round(self) -> int:
        if not self.catalog.exists(self.T_CKPT):
            return 0
        ck = self.catalog.read(self.spark, self.T_CKPT, schema=CHECKPOINT_SCHEMA)
        row = ck.agg(F.max("round").alias("m")).collect()[0]
        return 0 if row.m is None else int(row.m) + 1

    def _pinned_ckpt_row(self, round_no: int) -> dict:
        """The full winning checkpoint row of round_no - 1: the state this
        round's inputs are read as-of. Replays therefore recompute from
        identical inputs even when later snapshots already exist. Returned
        whole so callers that go on to repin the same row (the adoption
        branch) don't pay a second read+collect job."""
        # manifest-stats pruned read: at 10^6 stored rounds this touches
        # the one file whose round range covers the target, not the table
        ck = self.catalog.read_pruned(
            self.spark,
            self.T_CKPT,
            {"round": (round_no - 1, round_no - 1)},
            schema=CHECKPOINT_SCHEMA,
        )
        # newest-version row wins if a legacy (untagged) catalog ever holds
        # duplicate rows for one round: the latest repin supersedes
        row = (
            ck.orderBy(F.col("frontier_v").desc(), F.col("seen_v").desc())
            .limit(1)
            .collect()
        )
        if not row:
            raise RuntimeError(
                f"no checkpoint for round {round_no - 1}; bootstrap first or "
                f"resume from next_round()"
            )
        return row[0].asDict()

    def _pinned_versions(self, round_no: int) -> tuple[int, int, int]:
        """(frontier_v, seen_v, shards_v) pins — see _pinned_ckpt_row."""
        r = self._pinned_ckpt_row(round_no)
        return int(r["frontier_v"]), int(r["seen_v"]), int(r["shards_v"])

    def _latest_ckpt_row(self, round_no: int) -> dict:
        """The winning checkpoint row for a round (latest repin supersedes)."""
        ck = self.catalog.read_pruned(
            self.spark,
            self.T_CKPT,
            {"round": (round_no, round_no)},
            schema=CHECKPOINT_SCHEMA,
        )
        return (
            ck.orderBy(F.col("frontier_v").desc(), F.col("seen_v").desc())
            .limit(1)
            .collect()[0]
            .asDict()
        )

    def _repin_checkpoint(
        self, round_no: int, updates: dict, row: dict | None = None
    ) -> None:
        """Rewrite a round's checkpoint row with updated pins/counts.
        Idempotent (overwrite_partition of a single row); used to make
        adopted-but-unpinned progress durable before anything builds on it.
        Pass ``row`` when the caller already fetched the checkpoint row —
        avoids a redundant read+collect job on the commit path."""
        row = dict(row) if row is not None else self._latest_ckpt_row(round_no)
        row.update(updates)
        marker = self.spark.createDataFrame([row], schema=CHECKPOINT_SCHEMA)
        self._round_keyed_write(self.T_CKPT, marker, CHECKPOINT_SCHEMA, round_no)

    def _effective_salt_buckets(self) -> int:
        """Phase-1 salt width for the next schedule: sized from the latest
        written frontier's hottest-host pending count when salt_auto is on
        and a round has committed in-process; the static salt_buckets
        otherwise (cold resume / first round). Any value >= 1 yields
        bit-identical schedules — this only tunes window-partition size."""
        if not self.salt_auto or self._hot_pending is None:
            return self.salt_buckets
        import math

        return max(1, min(256, math.ceil(self._hot_pending / self.salt_target_rows)))

    # -- one round ----------------------------------------------------------------
    def run_round(self, round_no: int) -> dict:
        import os as _os
        import time as _time

        _timing = bool(_os.environ.get("JCS_ROUND_TIMING"))
        _phases: dict[str, float] = {}
        _t0 = _time.perf_counter()

        def _mark(label: str) -> None:
            # attribution is per ACTION boundary: lazy upstream work lands in
            # the phase whose action forced it (cached frames pin boundaries)
            nonlocal _t0
            if _timing:
                now = _time.perf_counter()
                _phases[label] = round(now - _t0, 3)
                _t0 = now

        spark, cat = self.spark, self.catalog
        self._check_bloom_params()
        self._check_docs_mode()
        ck_row = self._pinned_ckpt_row(round_no)
        fv = int(ck_row["frontier_v"])
        sv = int(ck_row["seen_v"])
        shv = int(ck_row["shards_v"])
        # adopt unpinned APPEND-only frontier progress (a seed ingest that
        # crashed before its repin): commits are atomic, appends only add
        # pending rows, and a replay re-adopts at least the same set — the
        # round's final state stays consistent (its batch is a superset of
        # any crashed attempt's). Overwrites ahead of the pin are a crashed
        # ROUND and belong to its replay, never adopted here.
        latest_fv = cat.snapshot_id(self.T_FRONTIER)
        if latest_fv > fv and cat.is_pure_append(self.T_FRONTIER, fv, latest_fv):
            # Persist the adoption BEFORE any round write: if this round
            # later crashes after its frontier OVERWRITE but before its
            # checkpoint, the replay sees is_pure_append=false and cannot
            # re-adopt — an unpersisted adoption would make it recompute a
            # SMALLER batch from the stale pin, rewriting sched/docs/shard
            # partitions without the adopted seeds while their seen rows
            # from the crashed attempt persist (URLs in seen with no doc,
            # gone from the frontier). Repinning round-(N-1) first makes
            # every replay read the same adopted snapshot.
            self._repin_checkpoint(
                round_no - 1,
                {
                    "frontier_v": int(latest_fv),
                    "frontier_pending": int(
                        cat.row_count(self.T_FRONTIER, version=latest_fv)
                    ),
                },
                row=ck_row,
            )
            fv = latest_fv
        frontier = cat.read(spark, self.T_FRONTIER, version=fv, schema=PENDING_SCHEMA)
        seen = cat.read(spark, self.T_SEEN, version=sv, schema=schemas.SEEN_SCHEMA)

        sched_in = frontier
        if self.trap_demotion:
            from job_crawler_spark.operators.traps import (
                demote_traps,
                url_trap_signals,
            )

            sched_in = demote_traps(
                frontier, url_trap_signals(frontier, url_col="url_canon")
            )
        batch = schedule_batch(
            sched_in, self.robots, self.round_seconds,
            self._effective_salt_buckets(),
            salted=self.salted,
        ).cache()
        n_scheduled = batch.count()
        _mark("schedule")
        if n_scheduled == 0:
            batch.unpersist()
            return {"round": round_no, "scheduled": 0, "done": True}

        # schedule log: the deterministic crawl order (host, host_rank) this
        # round — the bit-reproducibility artifact the oracle test checks.
        sched_schema = T.StructType(
            [
                T.StructField("round", T.IntegerType(), False),
                T.StructField("host", T.StringType(), False),
                T.StructField("host_rank", T.IntegerType(), False),
                T.StructField("url_canon", T.StringType(), False),
            ]
        )
        sched = batch.select(
            F.lit(round_no).alias("round"), "host", "host_rank", "url_canon"
        )
        self._round_keyed_write(self.T_SCHED, sched, sched_schema, round_no)
        _mark("sched_write")

        fetched = fetcher.fetch_pages(batch).cache()
        ok_pages = fetched.filter(F.col("fetch_ok")).select(
            "url_canon", "depth", "page"
        )
        parsed = parser.parse_pages(ok_pages.select("url_canon", "page")).cache()
        docs = parser.enrich_documents(parsed.select("doc_id", "spans"))

        # outlinks -> frontier candidates (dedup within round + vs seen/pending)
        links = (
            parsed.join(
                ok_pages.select(F.col("url_canon").alias("doc_id"), "depth"),
                on="doc_id",
            )
            .select("depth", F.explode_outer("outlinks").alias("outlink"))
            .filter(F.col("outlink").isNotNull())
        )
        candidates = fetcher.expand_outlinks(links)
        # same admission guard as bootstrap: a malformed outlink canonicalizes
        # to an empty host and must never enter the frontier (the robots
        # left-join would otherwise admit it with a default budget forever)
        candidates = self._apply_redirects(
            candidates.filter(F.col("host") != "")
        )
        # one row per canon: max priority, min depth (deterministic aggregates)
        candidates = candidates.groupBy("url_canon", "host").agg(
            F.max("priority").alias("priority"), F.min("depth").alias("depth")
        )

        batch_urls = batch.select("url_canon")
        remaining = frontier.join(batch_urls, "url_canon", "left_anti")
        not_pending = candidates.join(
            frontier.select("url_canon"), "url_canon", "left_anti"
        ).join(batch_urls, "url_canon", "left_anti")

        # Bloom prefilter (provably-new skips the anti-join shuffle), exact
        # anti-join authoritative for the maybe-seen remainder (T4). Pinned
        # version: shards ⊇ seen at the same pin (commit order shards-before-
        # seen) so "bloom says new" is provable against the pinned seen.
        shards_df = cat.read(
            spark, self.T_SHARDS, version=shv, schema=self._filter_schema()
        )
        provably_new, maybe_seen, flagged = self._split_new_vs_seen(
            not_pending, shards_df
        )
        confirmed_new = anti_join_seen(maybe_seen, seen, "url_canon")
        discovered = provably_new.unionByName(confirmed_new).withColumn(
            "round", F.lit(round_no + 1)
        ).select("url_canon", "host", "depth", "priority", "round")

        # -------- commit (idempotent steps, checkpoint marker last) ---------
        # Writes are computed against the LATEST snapshots so a replay after
        # a partial commit never duplicates rows; reads above used the pinned
        # snapshots so the computed round is identical either way.
        # spans_parsed rides the docs write as an observe metric instead of
        # a second pass over the enriched frame (control-plane scalars fold
        # into actions that already run — the round-scaling fix).
        from pyspark.sql import Observation

        docs_obs = Observation()
        docs = docs.observe(
            docs_obs, F.coalesce(F.sum(F.size("spans")), F.lit(0)).alias("s")
        )
        if self.docs_mode == "mor":
            # merge-on-read: append this round's docs as a round-keyed
            # partition (O(round) commit); superseded copies (only possible
            # after a forced re-crawl) are resolved at read time by
            # read_docs()'s latest-wins window, and compact_docs() is the
            # Iceberg-compaction analog that folds them away.
            self._round_keyed_write(
                self.T_DOCS,
                docs.withColumn("round", F.lit(round_no)),
                None,
                round_no,
            )
        else:
            cat.merge_upsert(spark, self.T_DOCS, docs, key="doc_id")
        _mark("fetch_parse_merge_docs")

        latest_seen = cat.read(spark, self.T_SEEN, schema=schemas.SEEN_SCHEMA)
        new_seen = anti_join_seen(
            batch.select("url_canon").withColumn("first_round", F.lit(round_no)),
            latest_seen,
            "url_canon",
        ).cache()

        # shards BEFORE seen: the invariant is shards ⊇ seen at every commit
        # point — a crash between the two leaves extra filter entries
        # (harmless false-positive side), never missing ones (which would
        # break the provably-new shortcut). The delta is round-keyed and
        # built from the BATCH (a pure function of the pinned frontier
        # snapshot), NOT from new_seen (which depends on the latest seen
        # table and would come out empty on replay, erasing the crashed
        # attempt's delta) — so a replay REWRITES an identical delta.
        shard_delta = self._build_filter_shards(
            batch.select("url_canon")
        ).withColumn("round", F.lit(round_no))
        self._round_keyed_write(
            self.T_SHARDS, shard_delta, self._filter_schema(), round_no
        )
        shards_v = cat.snapshot_id(self.T_SHARDS)
        _mark("shard_delta_write")

        cat.append(new_seen, self.T_SEEN)
        seen_v = cat.snapshot_id(self.T_SEEN)
        new_seen.unpersist()
        _mark("seen_append")

        new_frontier = remaining.unionByName(discovered)
        frontier_v = cat.overwrite(new_frontier, self.T_FRONTIER)
        _mark("frontier_write")

        if self.salt_auto and self.salted is not False:
            # hottest-host pending count of the frontier the NEXT round will
            # schedule from — read back from the just-written snapshot (one
            # pruned string column, hash agg) rather than recomputing the
            # union's lineage. Feeds _effective_salt_buckets. Skipped when
            # salted=False (uncapped drain rounds): schedule_batch never
            # enters the salting phase there, so the stat would be dead
            # weight — a full-frontier aggregate per round at 10^9 rows.
            hot = (
                cat.read(
                    spark, self.T_FRONTIER, version=frontier_v,
                    schema=PENDING_SCHEMA,
                )
                .groupBy("host")
                .agg(F.count(F.lit(1)).alias("n"))
                .agg(F.max("n").alias("hot"))
                .collect()[0].hot
            )
            self._hot_pending = int(hot) if hot is not None else None
            _mark("host_stats")

        # per-partition lineage (round-keyed rewrite = replay-idempotent)
        lineage = (
            fetched.withColumn("partition_id", F.spark_partition_id())
            .groupBy("partition_id")
            .agg(
                F.count(F.lit(1)).alias("urls_scheduled"),
                F.sum(F.col("fetch_ok").cast("long")).alias("urls_fetched"),
                F.sum((~F.col("fetch_ok")).cast("long")).alias("urls_failed"),
            )
            .withColumn("round", F.lit(round_no))
        )
        spans_count = docs_obs.get["s"] or 0
        lineage = lineage.withColumn(
            "spans_parsed", F.lit(int(spans_count)).cast("long")
        ).select(schemas.CRAWL_LOG_SCHEMA.fieldNames())
        self._round_keyed_write(self.T_LOG, lineage, schemas.CRAWL_LOG_SCHEMA, round_no)
        _mark("lineage_write")

        n_fetched = fetched.filter(F.col("fetch_ok")).count()
        _mark("stats")
        # table stats from manifest metadata (row counts ride in the
        # manifests) — no full-table re-scan per round. In mor docs mode
        # docs_total counts PHYSICAL rows: equal to read_docs().count()
        # until a forced re-crawl leaves a superseded copy; compact_docs()
        # restores equality — the same approximate-until-compaction stats
        # semantics Iceberg MoR has with pending deletes.
        stats_row = {
            "round": round_no,
            "scheduled": int(n_scheduled),
            "fetched": int(n_fetched),
            "failed": int(n_scheduled - n_fetched),
            "docs_total": int(cat.row_count(self.T_DOCS)),
            "seen_total": int(cat.row_count(self.T_SEEN, version=seen_v)),
            "frontier_pending": int(
                cat.row_count(self.T_FRONTIER, version=frontier_v)
            ),
            "frontier_v": int(frontier_v),
            "seen_v": int(seen_v),
            "shards_v": int(shards_v),
        }
        ckpt = spark.createDataFrame([stats_row], schema=CHECKPOINT_SCHEMA)
        self._round_keyed_write(self.T_CKPT, ckpt, CHECKPOINT_SCHEMA, round_no)

        batch.unpersist()
        fetched.unpersist()
        parsed.unpersist()
        flagged.unpersist()
        self.stats.append(stats_row)
        if _timing:
            _mark("checkpoint_write")
            return {**stats_row, "done": False, "phase_seconds": _phases}
        return {**stats_row, "done": False}

    def _round_keyed_write(
        self, name: str, df: DataFrame, schema: T.StructType, round_no: int
    ) -> None:
        """Replace exactly this round's files (dynamic partition overwrite):
        a replay deletes-and-rewrites only its own round's data, so the
        commit costs O(round) — not O(total history) — per round."""
        del schema  # kept in the signature for call-site self-documentation
        self.catalog.overwrite_partition(df, name, round_no)

    def expire_old_snapshots(self, keep_last: int = 5) -> None:
        """Snapshot retention that can never break kill-and-resume: the
        latest checkpoint's pinned versions are passed as expiry floors, so
        the manifests time-travel resume needs always survive."""
        ck = self.catalog.read(self.spark, self.T_CKPT, schema=CHECKPOINT_SCHEMA)
        row = ck.orderBy(F.col("round").desc()).limit(1).collect()
        pins = {
            self.T_FRONTIER: int(row[0].frontier_v) if row else None,
            self.T_SEEN: int(row[0].seen_v) if row else None,
            self.T_SHARDS: int(row[0].shards_v) if row else None,
        }
        for name in (
            self.T_FRONTIER, self.T_SEEN, self.T_SHARDS, self.T_DOCS,
            self.T_LOG, self.T_SCHED, self.T_CKPT,
        ):
            if self.catalog.exists(name):
                self.catalog.expire_snapshots(
                    name, keep_last=keep_last, pin_floor=pins.get(name)
                )

    # -- documents read/compaction (merge-on-read mode) -------------------------
    def read_docs(self, version: int | None = None) -> DataFrame:
        """The documents table as users see it: in cow mode the stored rows;
        in mor mode latest-wins per doc_id (max round; copies within one
        round are bit-identical by determinism, so any pick is the same)."""
        docs = self.catalog.read(self.spark, self.T_DOCS, version=version)
        if self.docs_mode == "cow" or "round" not in docs.columns:
            return docs
        from pyspark.sql import Window

        w = Window.partitionBy("doc_id").orderBy(F.col("round").desc())
        return (
            docs.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "round")
        )

    def compact_docs(self) -> int:
        """Fold superseded doc copies away (Iceberg compaction analog): one
        full rewrite, amortized across however many rounds ran since the
        last compaction — run it on a schedule, not per round. Keeps the
        round column (partition tags survive) so replay semantics hold."""
        if self.docs_mode != "mor":
            return self.catalog.snapshot_id(self.T_DOCS)
        docs = self.catalog.read(self.spark, self.T_DOCS)
        from pyspark.sql import Window

        w = Window.partitionBy("doc_id").orderBy(F.col("round").desc())
        latest = (
            docs.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        # rewrite per round partition so future replays still target their
        # own round's files only — over ALL stored rounds, not just those
        # with surviving rows: a fully-superseded round's partition must be
        # emptied or its stale copies would outlive every compaction
        rounds = [
            int(r.round) for r in docs.select("round").distinct().collect()
        ]
        latest = latest.cache()
        v = self.catalog.snapshot_id(self.T_DOCS)
        for rnd in rounds:
            v = self.catalog.overwrite_partition(
                latest.filter(F.col("round") == rnd), self.T_DOCS, rnd
            )
        latest.unpersist()
        return v

    def _check_docs_mode(self) -> None:
        """A mor catalog has a round column in documents; resuming it in cow
        mode (or vice versa) would silently mix semantics — refuse."""
        schema = self.catalog.table_schema(self.T_DOCS)
        if schema is None:
            return
        has_round = "round" in schema.fieldNames()
        if has_round and self.docs_mode != "mor":
            raise ValueError(
                "documents table is merge-on-read (has a round column); "
                "configure CrawlEngine(docs_mode='mor') to resume it"
            )
        if not has_round and self.docs_mode != "cow":
            raise ValueError(
                "documents table is copy-on-write; configure "
                "CrawlEngine(docs_mode='cow') to resume it"
            )

    # -- incremental seed ingestion (streaming/continuous crawl) ---------------
    def ingest_seeds(self, raw_frontier: DataFrame) -> int:
        """Admit NEW seed URLs into a live crawl (micro-batch ingestion for
        the Structured Streaming continuous-crawl loop).

        Same admission pipeline as bootstrap (canonicalize -> validate ->
        first-wins dedup), then anti-joined against BOTH the seen set and
        the pending frontier, appended, and the latest checkpoint repinned
        so the next round reads them. IDEMPOTENT: replaying the same batch
        (foreachBatch redelivery after a crash) re-admits nothing — the
        anti-joins drain it — which is what makes the streaming loop
        exactly-once at the table level.

        Crash-window healing: if a previous ingest appended but crashed
        before the repin, the appended rows exist only in an UNPINNED
        frontier snapshot (the next round would overwrite them away from
        the stale pin). Every ingest therefore repins the LATEST frontier
        version even when it admits nothing new — commits are atomic, so
        the latest version is always a complete state, and repinning it
        completes any crashed predecessor. Returns the number admitted."""
        spark, cat = self.spark, self.catalog
        canon = (
            raw_frontier.filter(F.col("url").isNotNull())
            .withColumn("url_canon", canonicalize_url_col(F.col("url")))
            .withColumn("host", host_col(F.col("url")))
            .filter(F.col("host") != "")
        )
        canon = self._apply_redirects(canon)
        deduped = first_wins_agg(
            canon.withColumn("neg_priority", -F.col("priority")),
            ["url_canon"],
            ["neg_priority", "url"],
        ).select("url_canon", "host", "depth", "priority", "round")

        last = self.next_round() - 1
        ck_row = self._latest_ckpt_row(last)

        pinned_fv = int(ck_row["frontier_v"])
        latest_fv = cat.snapshot_id(self.T_FRONTIER)
        if latest_fv != pinned_fv and not cat.is_pure_append(
            self.T_FRONTIER, pinned_fv, latest_fv
        ):
            # unpinned OVERWRITE ahead of the pin = a crashed round; its
            # replay owns the frontier — adopting it here would corrupt
            # the replay's inputs
            raise RuntimeError(
                "unpinned non-append frontier state detected (crashed "
                "round?); replay it first: run_round(next_round())"
            )

        seen = cat.read(spark, self.T_SEEN, schema=schemas.SEEN_SCHEMA)
        frontier = cat.read(spark, self.T_FRONTIER, schema=PENDING_SCHEMA)
        fresh = (
            anti_join_seen(deduped, seen, "url_canon")
            .join(frontier.select("url_canon"), "url_canon", "left_anti")
            .cache()
        )
        n_new = fresh.count()
        if n_new == 0:
            fresh.unpersist()
            frontier_v = latest_fv  # adopt crashed-ingest appends, if any
        else:
            frontier_v = cat.append(fresh, self.T_FRONTIER)
            fresh.unpersist()
        if frontier_v != int(ck_row["frontier_v"]):
            # repin (also heals a predecessor that appended then crashed)
            self._repin_checkpoint(
                last,
                {
                    "frontier_v": int(frontier_v),
                    "frontier_pending": int(
                        cat.row_count(self.T_FRONTIER, version=frontier_v)
                    ),
                },
                row=ck_row,
            )
        return int(n_new)

    # -- forced re-crawl (the capability motivating the cuckoo backend) --------
    def force_recrawl(self, urls: DataFrame, priority: float = 1.0) -> dict:
        """Admin op: make previously-crawled URLs crawlable again.

        Steps (checkpoint-updated LAST like a round commit — a crash
        mid-way is invisible to the next round, which still reads the old
        pinned versions; RE-RUNNING THE SAME CALL COMPLETES IT):

        1. delete each URL's fingerprint from the shard delta of the round
           that inserted it (seen.first_round; distributed mapInPandas);
        2. delete the rows from the exact seen table (Iceberg DELETE WHERE —
           the stand-in rewrites; real Iceberg prunes to matching files);
        3. re-admit the URLs to the frontier at the given priority;
        4. update the latest checkpoint's pinned versions so the next round
           (or a resume) reads the post-delete snapshots.

        Re-runnability: the re-admission set is (urls ∩ seen) ∪ (urls not
        in seen AND not pending) — the second term is exactly where a
        half-completed predecessor left its victims (seen already deleted,
        not yet re-admitted); it also makes a forced crawl of a never-seen
        URL work, which is the natural semantics. The final repin always
        publishes the LATEST snapshots, adopting any committed-but-unpinned
        progress.

        Requires the cuckoo backend — Bloom bits cannot be deleted.
        """
        if self.seen_filter != "cuckoo":
            raise ValueError(
                "force_recrawl requires seen_filter='cuckoo' "
                "(bloom bits cannot be deleted)"
            )
        spark, cat = self.spark, self.catalog
        last = self.next_round() - 1
        ck_row = self._latest_ckpt_row(last)
        pinned_fv = int(ck_row["frontier_v"])
        latest_fv = cat.snapshot_id(self.T_FRONTIER)
        if latest_fv != pinned_fv and not cat.is_pure_append(
            self.T_FRONTIER, pinned_fv, latest_fv
        ):
            raise RuntimeError(
                "unpinned non-append frontier state detected (crashed "
                "round?); replay it first: run_round(next_round())"
            )

        urls = urls.select("url_canon").distinct()
        seen = cat.read(spark, self.T_SEEN, schema=schemas.SEEN_SCHEMA)
        frontier = cat.read(spark, self.T_FRONTIER, schema=PENDING_SCHEMA)
        victims = seen.join(urls, "url_canon").cache()
        n_victims = victims.count()

        # 1. shard deltas: rewrite only the rounds that inserted these keys
        if n_victims > 0:
            shards = cat.read(spark, self.T_SHARDS, schema=self._filter_schema())
            affected = [
                int(r.first_round)
                for r in victims.select("first_round").distinct().collect()
            ]
            rewritten = cuckoo.delete_from_round_deltas(
                shards.filter(F.col("round").isin(affected)),
                victims,
                self.bloom_shards,
                self.cuckoo_buckets,
            ).cache()
            for rnd in affected:
                cat.overwrite_partition(
                    rewritten.filter(F.col("round") == rnd), self.T_SHARDS, rnd
                )
            rewritten.unpersist()

            # 2. exact seen table
            kept = seen.join(victims.select("url_canon"), "url_canon", "left_anti")
            cat.overwrite(kept, self.T_SEEN)

        # 3. frontier re-admission: victims + any url a crashed predecessor
        # already removed from seen but never re-admitted (and never-seen
        # urls, the natural forced-crawl of an unknown URL) — minus anything
        # already pending
        to_readmit = (
            victims.select("url_canon")
            .unionByName(
                urls.join(seen.select("url_canon"), "url_canon", "left_anti")
            )
            .join(frontier.select("url_canon"), "url_canon", "left_anti")
            .distinct()
        )
        readmitted = to_readmit.select(
            "url_canon",
            host_col(F.col("url_canon")).alias("host"),
            F.lit(0).alias("depth"),
            F.lit(float(priority)).alias("priority"),
            F.lit(last + 1).alias("round"),
        ).cache()
        n_readmit = readmitted.count()
        if n_readmit > 0:
            cat.append(readmitted, self.T_FRONTIER)
        readmitted.unpersist()
        victims.unpersist()
        seen_v = cat.snapshot_id(self.T_SEEN)
        frontier_v = cat.snapshot_id(self.T_FRONTIER)
        shards_v = cat.snapshot_id(self.T_SHARDS)
        if n_victims == 0 and n_readmit == 0:
            # Nothing to do — UNLESS a crashed predecessor left committed
            # but unpinned state (e.g. crash between its frontier append
            # and its repin: victims already gone from seen AND already
            # pending, so both counts are 0 here). The repin below is
            # idempotent, so complete the crashed call unconditionally
            # whenever any latest snapshot differs from its pin.
            if (
                frontier_v == pinned_fv
                and seen_v == int(ck_row["seen_v"])
                and shards_v == int(ck_row["shards_v"])
            ):
                return {"recrawl": 0, "readmitted": 0, "round": last}

        # 4. repin the latest checkpoint (same round, latest versions/counts)
        self._repin_checkpoint(
            last,
            {
                "frontier_v": int(frontier_v),
                "seen_v": int(seen_v),
                "shards_v": int(shards_v),
                "seen_total": int(cat.row_count(self.T_SEEN, version=seen_v)),
                "frontier_pending": int(
                    cat.row_count(self.T_FRONTIER, version=frontier_v)
                ),
            },
            row=ck_row,
        )
        # each victim already has a doc copy (modulo fetch failures), so its
        # re-crawl will append a superseding copy — feed the auto-compaction
        # trigger run() checks after every round. max() covers the
        # crash-rerun path, where the completing call sees n_victims == 0
        # but re-admits the earlier crash's victims via the unknown-url
        # branch (n_readmit counts them).
        self._recrawl_backlog += max(int(n_victims), int(n_readmit))
        return {"recrawl": int(n_victims), "readmitted": int(n_readmit),
                "round": last}

    def revisit_due(
        self, *, base_interval: int = 1, max_interval: int = 64
    ) -> DataFrame:
        """Change-rate-adaptive revisit schedule (operators/revisit.py)
        computed from the engine's OWN fetch history: the mor documents
        table keeps one round-keyed copy per successful fetch, so
        (doc_id, round, xxhash64(spans)) is exactly the operator's
        (url, round, content hash) contract — failed fetches never wrote a
        docs row and correctly contribute no observation.

        ``due`` is evaluated against ``next_round()`` (the round about to
        run): a due row is one whose adaptive interval has elapsed by the
        time a recrawl could actually happen. History depth is bounded by
        ``compact_docs()`` — compaction folds superseded copies into the
        latest, which RESETS a URL's observed history to its most recent
        fetch (the bounded-history tradeoff any 10^10-URL scheduler makes;
        at scale the schedule state lives in the same table the compactor
        already maintains, no side state).

        Requires ``docs_mode='mor'`` — cow keeps only the latest copy, so
        there is no history to adapt to.
        """
        from job_crawler_spark.operators.revisit import revisit_schedule

        if self.docs_mode != "mor":
            raise ValueError(
                "revisit_due requires docs_mode='mor' "
                "(cow keeps no per-round fetch history)"
            )
        docs = self.catalog.read(self.spark, self.T_DOCS)
        hist = docs.select(
            F.col("doc_id").alias("url_canon"),
            F.col("round").cast("int").alias("round"),
            F.xxhash64("spans").cast("string").alias("content_hash"),
        )
        return revisit_schedule(
            hist,
            self.next_round(),
            base_interval=base_interval,
            max_interval=max_interval,
        )

    def revisit_round(
        self,
        *,
        base_interval: int = 1,
        max_interval: int = 64,
        budget: int | None = None,
        priority: float = 1.0,
    ) -> dict:
        """Policy -> mechanism: compute the adaptive revisit schedule and
        ``force_recrawl`` the due URLs (most-volatile-first under
        ``budget``, so a bounded recrawl allowance is spent on the URLs
        whose content actually churns). Inherits force_recrawl's
        idempotence and its cuckoo-backend requirement; the re-fetched
        copies supersede in mor and feed the auto-compaction backlog."""
        from job_crawler_spark.operators.revisit import due_urls

        victims = due_urls(
            self.revisit_due(
                base_interval=base_interval, max_interval=max_interval
            )
        )
        if budget is not None:
            victims = victims.limit(int(budget))
        out = self.force_recrawl(victims, priority=priority)
        out["budget"] = budget
        return out

    def mine_dust_rules(
        self, *, min_support: int = 2, min_precision: float = 0.95
    ) -> DataFrame:
        """DUST rule mining (operators/dust.py) over the engine's OWN
        documents: url = doc_id (the canonical URL), fingerprint =
        xxhash64(spans) — the same content key mirror_detect and the
        revisit scheduler use. Returns the full rule-verdict frame; the
        caller decides when learned rules graduate into `dust_rules`
        for admission rewriting (policy, like revisit_round vs
        revisit_due)."""
        from job_crawler_spark.operators.dust import mine_param_rules

        pages = self.read_docs().select(
            F.col("doc_id").alias("url"),
            F.xxhash64("spans").cast("string").alias("content_hash"),
        )
        return mine_param_rules(
            pages, min_support=min_support, min_precision=min_precision
        )

    def mirror_detect(
        self, *, threshold: float = 0.5, max_hosts_per_hash: int = 64
    ) -> DataFrame:
        """Mirror-host detection (operators/mirrors.py) over the engine's
        OWN documents: host from doc_id (the canonical URL), fingerprint =
        xxhash64(spans) — the same content key the revisit scheduler uses,
        so "mirror" means span-identical pages, robust to URL differences.
        Returns the mirror_pairs frame; policy (demote all but the
        lexicographically-first host, feed force_recrawl exclusions, ...)
        stays the caller's, like revisit_round vs revisit_due."""
        from job_crawler_spark.operators.mirrors import mirror_pairs

        pages = self.read_docs().select(
            host_col(F.col("doc_id")).alias("host"),
            F.xxhash64("spans").cast("string").alias("content_hash"),
        )
        return mirror_pairs(
            pages, threshold=threshold, max_hosts_per_hash=max_hosts_per_hash
        )

    def _maybe_compact(self) -> bool:
        """Auto-compaction policy (run() calls this between rounds): compact
        the mor documents table once the re-crawl backlog reaches
        compact_superseded_frac of the table's physical rows. The check is
        metadata-only (in-memory counter vs manifest row count). Safe by
        construction: docs versions are never pinned in checkpoints, and
        compact_docs rewrites per round partition keeping the round tags, so
        a replay still targets exactly its own round's files — compaction
        can never race a pinned checkpoint. Runs strictly BETWEEN round
        commits (never mid-round). The backlog is an upper bound (a victim
        not yet refetched contributes no superseded copy until it is) —
        over-eager compaction wastes one rewrite, never correctness. The
        counter is in-memory: a restarted engine starts at 0, so every
        compact_check_rounds rounds the policy audits the EXACT superseded
        count (physical minus distinct doc_ids, one single-column
        aggregate) — superseded copies therefore get folded within a
        bounded number of rounds even across restarts, and the streaming
        loop calls this too (crawl_stream.process_batch)."""
        if (
            self.docs_mode != "mor"
            or not self.auto_compact
            or not self.catalog.exists(self.T_DOCS)
        ):
            return False
        self._rounds_since_compact_check += 1
        physical = int(self.catalog.row_count(self.T_DOCS))
        if physical <= 0:
            return False
        superseded = self._recrawl_backlog
        threshold = max(1.0, self.compact_superseded_frac * physical)
        if (
            superseded < threshold
            and self._rounds_since_compact_check >= self.compact_check_rounds
        ):
            self._rounds_since_compact_check = 0
            n_distinct = (
                self.catalog.read(self.spark, self.T_DOCS)
                .select("doc_id")
                .distinct()
                .count()
            )
            superseded = physical - int(n_distinct)
        if superseded < threshold:
            return False
        self.compact_docs()
        self._recrawl_backlog = 0
        self._rounds_since_compact_check = 0
        return True

    # -- multi-round driver ---------------------------------------------------
    def run(self, max_rounds: int) -> list[dict]:
        start = self.next_round()
        out = []
        for r in range(start, start + max_rounds):
            res = self.run_round(r)
            out.append(res)
            if res.get("done"):
                break
            self._maybe_compact()
        return out
