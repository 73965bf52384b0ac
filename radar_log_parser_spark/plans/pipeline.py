"""The stage graph: read → parse → route → aggregate, with per-stage
checkpoints, lineage + metrics, and resumable restart.

Each checkpointed stage writes
    <work_dir>/<stage>/            parquet data (+ _SUCCESS from Spark)
    <work_dir>/<stage>/_lineage.json
with a content fingerprint chaining (engine version, config hash, vocab
hash, input path, parent fingerprints). On restart, a stage whose lineage
fingerprint matches is READ instead of recomputed — killing the job after
stage k and rerunning reproduces byte-identical final sinks without redoing
stages ≤ k (north-rule resumability requirement).

Storage format is switchable: parquet (default, always available) or
Iceberg (same layout via a catalog table; requires the iceberg-spark
runtime jar — absent in this sandbox, so it is feature-gated, not assumed).

Partitioning at scale:
  - `parsed` and routed row-level checkpoints are repartitioned by
    hash(doc_id) (the Iceberg `bucket(N, doc_id)` equivalent) — uniform
    regardless of source skew, and co-locates every per-doc operation.
  - sinks partitioned by low-cardinality keys (source/process) get a salt
    column derived from doc_id so one hot source cannot serialize the write
    (salted repartition; AQE skew handling covers the joins).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from radar_log_parser_spark.codec import Vocab
from radar_log_parser_spark.config import ConfigSpec
from radar_log_parser_spark.functions.parse import parse_stage
from radar_log_parser_spark.operators import aggregates as agg
from radar_log_parser_spark.operators import routing

ENGINE_VERSION = "0.1.0"

SALT_MOD = 16


def salted_repartition(df: DataFrame, key: str, buckets: int, salt_mod: int = SALT_MOD) -> DataFrame:
    """Repartition by (key, salt) for LOW-CARDINALITY keys (source/process):
    plain repartition(key) sends a hot source's entire shard to ONE task —
    at 10^12 rows a 90%-hot source serializes the write. The salt (a stable
    hash of doc_id mod salt_mod) fans each key over up to salt_mod tasks
    while keeping rows of one (key, salt) cell co-located, so per-source
    consumers still prune. (North rule: 'salted repartition for
    source-skewed shards'.)"""
    return df.repartition(
        buckets, F.col(key), F.pmod(F.xxhash64("doc_id"), F.lit(salt_mod))
    )


def _fingerprint(*parts: str) -> str:
    h = hashlib.sha256()
    for p in parts:
        h.update(p.encode())
        h.update(b"\x00")
    return h.hexdigest()[:24]


def _config_hash(cfg: ConfigSpec) -> str:
    return _fingerprint(repr(cfg))


@dataclass
class StageMetrics:
    stage: str
    fingerprint: str
    rows: int = -1
    files: int = 0
    per_file_rows: dict[str, int] = field(default_factory=dict)
    wall_s: float = 0.0
    resumed: bool = False


class Checkpointer:
    """Parquet-or-Iceberg stage storage with lineage manifests.

    fmt="iceberg" writes each stage as an Iceberg table via
    ``writeTo(...).using("iceberg")``, partitioned ``bucket(N, doc_id)``
    when the stage carries doc_id (the north rule's explicit bucketing),
    under a hadoop-type catalog rooted at the work dir. The iceberg-spark
    runtime jar is a plain maven artifact absent from this sandbox
    (verified: no network, no jar on the classpath), so construction fails
    FAST without it — the parquet path is the explicit fallback, never a
    silent substitution."""

    CATALOG = "rlps_ckpt"

    def __init__(self, spark: SparkSession, work_dir: str, fmt: str = "parquet"):
        self.spark = spark
        self.work_dir = work_dir
        if fmt == "iceberg" and not self._iceberg_available():
            raise RuntimeError(
                "iceberg requested but iceberg-spark runtime not on the "
                "classpath; use fmt='parquet'"
            )
        self.fmt = fmt
        os.makedirs(work_dir, exist_ok=True)
        if fmt == "iceberg":
            self._configure_catalog()

    def _iceberg_available(self) -> bool:
        try:
            self.spark._jvm.java.lang.Class.forName(  # noqa: SLF001
                "org.apache.iceberg.spark.SparkCatalog"
            )
            return True
        except Exception:
            return False

    def _configure_catalog(self) -> None:
        c = f"spark.sql.catalog.{self.CATALOG}"
        self.spark.conf.set(c, "org.apache.iceberg.spark.SparkCatalog")
        self.spark.conf.set(f"{c}.type", "hadoop")
        self.spark.conf.set(f"{c}.warehouse", self.work_dir)

    def _table(self, stage: str) -> str:
        return f"{self.CATALOG}.stages.{stage}"

    def path(self, stage: str) -> str:
        if self.fmt == "iceberg":
            return os.path.join(self.work_dir, "stages", stage)
        return os.path.join(self.work_dir, stage)

    def _lineage_path(self, stage: str) -> str:
        return os.path.join(self.path(stage), "_lineage.json")

    def is_complete(self, stage: str, fingerprint: str) -> bool:
        lp = self._lineage_path(stage)
        if not os.path.exists(lp):
            return False
        if self.fmt == "parquet" and not os.path.exists(
            os.path.join(self.path(stage), "_SUCCESS")
        ):
            return False
        try:
            with open(lp) as f:
                manifest = json.load(f)
            return manifest.get("fingerprint") == fingerprint
        except (OSError, json.JSONDecodeError):
            return False

    def read(self, stage: str) -> DataFrame:
        if self.fmt == "iceberg":
            return self.spark.read.table(self._table(stage))
        return self.spark.read.parquet(self.path(stage))

    def _write_data(self, stage: str, df: DataFrame, buckets: int) -> None:
        if self.fmt == "iceberg":
            w = df.writeTo(self._table(stage)).using("iceberg")
            if "doc_id" in df.columns:
                # Iceberg-native bucketing replaces the manual repartition
                # (the hidden-partitioning equivalent of bucket(N, doc_id))
                w = w.partitionedBy(F.bucket(buckets, F.col("doc_id")))
            w.createOrReplace()
        else:
            df.write.mode("overwrite").parquet(self.path(stage))

    def write(
        self,
        stage: str,
        df: DataFrame,
        fingerprint: str,
        parents: list[str],
        buckets: int = 32,
    ) -> StageMetrics:
        t0 = time.monotonic()
        out = self.path(stage)
        self._write_data(stage, df, buckets)
        metrics = StageMetrics(stage=stage, fingerprint=fingerprint)
        metrics.wall_s = time.monotonic() - t0
        total = 0
        if self.fmt == "iceberg":
            # per-partition lineage from the CURRENT snapshot's `.files`
            # metadata table — walking the data dir would also count data
            # files kept on disk by superseded snapshots (createOrReplace
            # retains history), overcounting after any stage re-write
            for r in (
                self.spark.read.table(f"{self._table(stage)}.files")
                .select("file_path", "record_count")
                .collect()
            ):
                rel = os.path.relpath(r["file_path"].removeprefix("file:"), out)
                metrics.per_file_rows[rel] = int(r["record_count"])
                total += int(r["record_count"])
        else:
            # parquet: row counts straight from the footers
            import pyarrow.parquet as pq

            for root, _dirs, names in os.walk(out):
                for name in sorted(names):
                    if not name.endswith(".parquet"):
                        continue
                    n = pq.ParquetFile(os.path.join(root, name)).metadata.num_rows
                    metrics.per_file_rows[os.path.relpath(os.path.join(root, name), out)] = n
                    total += n
        metrics.rows = total
        metrics.files = len(metrics.per_file_rows)
        os.makedirs(out, exist_ok=True)
        with open(self._lineage_path(stage), "w") as f:
            json.dump(
                {
                    "stage": stage,
                    "fingerprint": fingerprint,
                    "parents": parents,
                    "engine_version": ENGINE_VERSION,
                    "format": self.fmt,
                    "rows": metrics.rows,
                    "files": metrics.files,
                    "per_file_rows": metrics.per_file_rows,
                    "wall_s": round(metrics.wall_s, 3),
                },
                f,
                indent=1,
            )
        return metrics


@dataclass
class PipelineResult:
    sinks: dict[str, DataFrame]
    metrics: list[StageMetrics]

    def metric_rows(self) -> dict[str, int]:
        return {m.stage: m.rows for m in self.metrics}


class Pipeline:
    """Compile the config into the full dataflow and run it.

    checkpoint=False runs the whole plan lazily in one Spark job chain
    (bench mode); checkpoint=True materializes each stage with lineage for
    resumability (production mode, north rule).
    """

    ROW_SINKS = ("specific_issues", "other_routed", "grouped_routed", "events", "severity")
    AGG_SINKS = ("grouped_issues", "summary")

    def __init__(
        self,
        spark: SparkSession,
        cfg: ConfigSpec,
        vocab: Vocab,
        input_path: str,
        work_dir: str | None = None,
        checkpoint: bool = False,
        fmt: str = "parquet",
        buckets: int | None = None,
    ):
        self.spark = spark
        self.cfg = cfg
        self.vocab = vocab
        self.input_path = input_path
        self.checkpoint = checkpoint
        self.ckpt = Checkpointer(spark, work_dir, fmt) if checkpoint else None
        self.buckets = buckets or int(spark.conf.get("spark.sql.shuffle.partitions"))
        # vocab CONTENT hash: a changed vocab of identical size must
        # invalidate every checkpoint (decoded text changes everywhere)
        vocab_fp = hashlib.sha256(
            "\x00".join(vocab.id_to_token).encode()
        ).hexdigest()[:16]
        self._root_fp = _fingerprint(
            ENGINE_VERSION,
            _config_hash(cfg),
            vocab_fp,
            input_path,
        )
        self.metrics: list[StageMetrics] = []

    # -- stage runner -------------------------------------------------------
    def _stage(
        self,
        name: str,
        build,
        parents: list[str],
        bucket_by: str | None = None,
        salted_by: str | None = None,
    ) -> DataFrame:
        """bucket_by: high-cardinality cluster key (hash buckets — the
        parquet equivalent of Iceberg's bucket(N, doc_id); Iceberg mode
        declares the real thing in the table spec instead).
        salted_by: LOW-cardinality cluster key (source) — salted so a hot
        source cannot serialize the stage write (see salted_repartition)."""
        fp = _fingerprint(self._root_fp, name, *parents)
        if self.ckpt is None:
            return build()
        if self.ckpt.is_complete(name, fp):
            m = StageMetrics(stage=name, fingerprint=fp, resumed=True)
            self.metrics.append(m)
            return self.ckpt.read(name)
        df = build()
        if salted_by is not None:
            df = salted_repartition(df, salted_by, self.buckets)
        elif bucket_by is not None and self.ckpt.fmt != "iceberg":
            df = df.repartition(self.buckets, F.col(bucket_by))
        m = self.ckpt.write(name, df, fp, parents, buckets=self.buckets)
        self.metrics.append(m)
        return self.ckpt.read(name)

    # -- the graph ----------------------------------------------------------
    def run(self, job_factory=None) -> PipelineResult:
        """job_factory: optional callable(name, df) -> thunk | None, called
        for each sink AT THE MOMENT that sink's inputs are materialized; a
        returned thunk (e.g. a sink write) is submitted to ONE shared pool
        immediately. The fan-out is therefore DEPENDENCY-TIERED instead of
        driver-sequenced: sinks that need only the parsed blocks (events,
        severity) execute UNDERNEATH the Q1 keep-set collect, the per-issue
        sinks execute underneath the slim-scope materialization, and only
        the aggregate consumers wait for the slim blocks. Driver-sequenced
        materialization is pure anti-scale — the old kept→slim serial
        window cost 36–53 s at BOTH scaling levels (r5 campaign phase
        data), an Amdahl-dominant serial fraction at 16 cores while the
        4-core leg hid it under saturation. Within the final tier the
        fused summary — the measured fan-out straggler — is submitted
        FIRST (LPT order): under FIFO job scheduling its tasks win ties,
        so the long job spans the whole window instead of draining alone
        in the tail."""
        spark = self.spark
        cfg = self.cfg
        self.timings: dict[str, float] = {}
        t0 = time.monotonic()

        raw = spark.read.parquet(self.input_path)

        parsed = self._stage(
            "parsed",
            lambda: parse_stage(raw, cfg, self.vocab),
            parents=["input"],
            bucket_by="doc_id",
        )
        if self.ckpt is None:
            # unchechpointed (bench) mode: the parse UDF feeds five sinks —
            # materialize it once, EAGERLY, so the concurrent consumers
            # below never race to compute the same partition twice.
            # Two strategies, both SERIALIZED (deserialized wide rows blow
            # the storage pool and triple-vary build/read times under
            # eviction — measured 10→59→21s builds; serialized: stable 7-8s
            # builds, 0.5s reads):
            #   lc      — row-format RDD blocks (default)
            #   parquet — columnar scratch file: consumers get COLUMN
            #             PRUNING (the token arrays are only read by the 3
            #             sinks that carry them, not by the aggregates) at
            #             the cost of one disk round-trip
            if os.environ.get("RLPS_BENCH_CKPT", "lc") == "parquet":
                scratch = os.path.join(
                    os.environ.get("RLPS_SCRATCH", "/tmp"),
                    f"rlps_parsed_{os.getpid()}",
                )
                parsed.write.mode("overwrite").parquet(scratch)
                parsed = spark.read.parquet(scratch)
            else:
                from pyspark import StorageLevel

                parsed = parsed.localCheckpoint(
                    eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
                )
        self.timings["parse_materialize"] = round(time.monotonic() - t0, 2)
        t_fan = time.monotonic()  # the overlapped fan-out window opens here

        # ONE shared pool for every sink job; sinks are handed to it the
        # moment their inputs are materialized (dependency tiers), so the
        # keep-set collect and the slim materialization below never leave
        # the cluster idle.
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=12) if job_factory else None
        futs = []
        row_sinks: dict[str, DataFrame] = {}

        def ready(name: str, df: DataFrame) -> None:
            row_sinks[name] = df
            if pool is None:
                return
            thunk = job_factory(name, df)
            if thunk is None:
                return

            def go(thunk=thunk, name=name):
                s = time.monotonic()
                r = thunk()
                self.timings[f"job_{name}"] = round(time.monotonic() - s, 2)
                return r

            futs.append(pool.submit(go))

        # ---- tier 0: parsed-only sinks, submitted BEFORE the keep-set
        # collect so they execute underneath it
        events = self._stage(
            "events", lambda: routing.events_sink(parsed), parents=["parsed"]
        )
        severity = self._stage(
            "severity",
            lambda: routing.severity_sink(parsed),
            parents=["parsed"],
            salted_by="source",
        )
        ready("parsed", parsed)
        ready("events", events)
        ready("severity", severity)

        # the Q1 keep-set is config-sized: collect it ONCE and re-plan it as
        # a literal frame, so the N broadcast-join consumers below don't each
        # schedule their own keep-set job over the parsed frame. LAZY +
        # memoized: on a fully-checkpointed resume no stage build runs, so
        # the keep-set scan must not be scheduled at all (ADVICE r2).
        _kept_memo: list = []

        def kept() -> DataFrame:
            if not _kept_memo:
                s = time.monotonic()
                kept_src = routing.kept_processes(parsed)
                _kept_memo.append(
                    spark.createDataFrame(kept_src.collect(), kept_src.schema)
                )
                self.timings["kept"] = round(time.monotonic() - s, 2)
            return _kept_memo[0]

        ipmap = routing.issue_process_map(spark, cfg)

        # ---- tier 1: keep-set consumers (the kept() collect runs here in
        # the main thread, underneath the tier-0 jobs)
        specific = self._stage(
            "specific_issues",
            lambda: routing.specific_issues(parsed, kept()),
            parents=["parsed"],
            # row sinks are consumed per-source (the reference's per-report
            # views) → cluster by source, salted against hot sources
            salted_by="source",
        )
        scope = self._stage(
            "scoped",
            lambda: routing.scoped_direct(parsed, kept(), ipmap, cfg),
            parents=["parsed"],
            bucket_by="doc_id",
        )
        other = self._stage(
            "other_routed",
            lambda: routing.other_routed(scope),
            parents=["scoped"],
            bucket_by="doc_id",
        )
        grouped = self._stage(
            "grouped_routed",
            lambda: routing.grouped_routed(scope, cfg),
            parents=["scoped"],
            bucket_by="doc_id",
        )
        ready("specific_issues", specific)
        ready("scoped", scope)
        ready("other_routed", other)
        ready("grouped_routed", grouped)

        # Aggregation reads a SLIM scope: every aggregate keys on
        # (source, issue, proc_rank, line_no) plus the match arrays, and
        # needs `text` only on grouped MATCHING rows (grouped_totals' /
        # the fused summary's last-line extract) — field scanning no
        # longer needs any text because the per-line hits are extracted
        # at PARSE time (functions/fieldex.py, r5) and ride along as the
        # sparse fld{k} struct columns. The projection drops
        # tokens/n_tok/doc_id/process entirely and nulls text on
        # everything but grouped matches. Checkpoint mode gets pruning
        # from parquet; in
        # bench mode the slim frame is materialized (serialized eager
        # localCheckpoint) by DEFAULT: the summary DAG's three aggregate
        # subtrees otherwise re-derive it from the fat parsed blocks —
        # 3 full-row decodes of memory traffic, the resource the 4N leg is
        # ceiling-bound on (A/B: summary job 186→85 s at 16 cores,
        # BENCH/BASELINE.md). RLPS_BENCH_SLIM=off restores the lazy form
        # for A/B. The materialization runs in the MAIN thread but the
        # tier-0/1 jobs above are already draining in the pool underneath
        # it — the window is overlapped, not serial.
        from radar_log_parser_spark.functions.schema import fld_cols

        # match_arr itself stays behind: the aggregates only need the match
        # COUNT and the first/last substring per line (line-local
        # projections — match_arr is in scan order), so the slim blocks
        # carry 3 scalars instead of every substring. match_sets, the one
        # consumer of the full arrays, reads the fat scope directly.
        scope_slim = scope.select(
            "source", "issue", "proc_rank", "grouped", "line_no",
            F.when(
                F.col("grouped") & (F.size(F.coalesce(F.col("grp_arr"), F.array())) > 0),
                F.col("text"),
            ).alias("text"),
            F.size(F.coalesce(F.col("match_arr"), F.array())).alias("n_ng"),
            F.try_element_at("match_arr", F.lit(1)).alias("first_m"),
            F.try_element_at("match_arr", F.lit(-1)).alias("last_m"),
            "grp_arr",
            *fld_cols(cfg),
        )
        if self.ckpt is None and os.environ.get("RLPS_BENCH_SLIM", "lc") == "lc":
            from pyspark import StorageLevel

            s = time.monotonic()
            scope_slim = scope_slim.localCheckpoint(
                eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
            )
            self.timings["slim_materialize"] = round(time.monotonic() - s, 2)
        self._scope_slim = scope_slim
        ready("scoped_slim", scope_slim)

        # ---- tier 2: slim-scope consumers, straggler (summary) FIRST
        # Distributed summary (A8): one lazy DataFrame whose DAG is a SINGLE
        # fused two-level aggregation over the slim scope (summary
        # aggregate: non-grouped totals + first/last, grouped totals + last
        # line, and every field's ordered content in one pass — r3 ran four
        # slim scans and three joins here; the summary job was the fan-out
        # straggler and its worst scaler). Assembly is one left join against
        # the static (source × issue) base, formatted ENTIRELY JVM-side —
        # nothing driver-side scales with the corpus (the r2 driver
        # assembly was a 30-60 s serial tail and an OOM cliff at 10^12).
        # The source dimension comes from the RAW parquet scan, not the
        # materialized parsed blocks: row-format checkpoint blocks have no
        # column pruning, so `parsed.select("source").distinct()` re-read
        # every token array and text string just to list a handful of
        # sources; the parquet scan reads the dictionary-encoded source
        # column alone (parse preserves source 1:1, so the sets are equal).
        summary = agg.summary_frame(
            spark,
            cfg,
            raw.select("source").distinct(),
            agg.summary_aggregate(cfg, scope_slim),
        )
        if self.ckpt is not None:
            fp = _fingerprint(self._root_fp, "summary", "other_routed", "grouped_routed")
            self.metrics.append(self.ckpt.write("summary", summary, fp, ["other_routed", "grouped_routed", "scoped"]))
            summary = self.ckpt.read("summary").orderBy(
                "source", F.desc("priority"), F.asc("issue")
            )
        ready("summary", summary)

        grouped_issues = self._stage(
            "grouped_issues",
            lambda: agg.grouped_counts(routing.grouped_matches(scope_slim)),
            parents=["grouped_routed"],
        )
        ready("grouped_issues", grouped_issues)
        ready(
            "match_sets",
            agg.other_issue_match_sets(routing.other_matches(scope)),
        )

        # plan_build = the main-thread define-and-materialize path (kept
        # collect + slim materialization + stage builds); fanout_jobs = the
        # whole overlapped window. plan_build ⊂ fanout_jobs now — the old
        # serial layout paid them back-to-back.
        self.timings["plan_build"] = round(time.monotonic() - t_fan, 2)

        if pool is not None:
            try:
                for f in futs:
                    f.result()
            finally:
                pool.shutdown(wait=False)
        self.timings["fanout_jobs"] = round(time.monotonic() - t_fan, 2)

        return PipelineResult(sinks=dict(row_sinks), metrics=self.metrics)
