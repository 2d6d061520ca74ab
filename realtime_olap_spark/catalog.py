"""Role-typed table catalog.

The reference declares an explicit JSON schema per table where every column
has a role — DIMENSION / METRIC / TIME
(pinot-common/.../data/FieldSpec.java:378-391, Schema.java:61). Types are
INT/LONG/FLOAT/DOUBLE/BOOLEAN/STRING/BYTES, single- or multi-value
(FieldSpec.java:385-391, :72-73). We keep the role model as engine metadata
on top of Spark's StructType; the physical schema is whatever Parquet says.

Missing values in the reference are replaced at ingest by per-role sentinel
defaults (FieldSpec.java:52-64) — ``TableConfig.null_defaults`` reproduces
that for ingest jobs (the driver's synthetic data has no NULLs, so the
correctness suite is unaffected).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Session segment staging (the reference's segment-build analog —
#: SegmentIndexCreationDriverImpl: raw input is converted into the
#: engine's own segment layout at INGEST, and queries only ever touch
#: segments). A raw SINGLE-FILE parquet table is one row group = ONE
#: scan task no matter how many cores the session has, which serializes
#: every scan-side operator on it; staging rewrites it once per session
#: into ``defaultParallelism // 4`` part files (range-clustered and
#: sorted on the table's sorted/time columns, like the reference's
#: sorted-index segments), and every query reads the staged segments —
#: still parquet FileScans, so pushdown/pruning/ReadSchema semantics
#: are unchanged. Measured at sf0.1/local[32]: the classifier scoring
#: scan 1.68 s → 0.64 s, text_doc_features 2.49 s → 1.44 s, the hot-22
#: suite subset 18.2 s → 14.5 s. Multi-file tables are never staged (their file
#: layout is deliberate — bucketing, partitioning, sorted segments),
#: and tables above the size cap stage-as-is would cost more than they
#: save, so they are read raw. Disable with SPARK_GRAFT_STAGE=0.
STAGE_ENV = "SPARK_GRAFT_STAGE"
#: Staged part-file count override (default: defaultParallelism).
STAGE_PARTS_ENV = "SPARK_GRAFT_STAGE_PARTS"
STAGE_MAX_BYTES = 2 << 30

_STAGE_CLEANUP_DONE: set[str] = set()

#: Heartbeat period for the live session's staging dir. Must be well
#: under the 24 h sweep cutoff; 30 min leaves a 48× margin.
_STAGE_HEARTBEAT_SECONDS = 1800


def _touch_stage_heartbeat(own_dir: str) -> None:
    """Refresh the staging dir's mtime — the liveness signal the sweep
    honors. Called at registration and from the per-session heartbeat
    thread, so a >1-day session (soak, notebook, PQL server) whose
    memoized FileScan plans still reference its staged parquet is never
    swept by a newly started session."""
    try:
        os.utime(own_dir, None)
    except OSError:
        pass


def _register_stage_cleanup(root: str, own_dir: str) -> None:
    """Staging-area hygiene, best-effort, once per session: remove THIS
    session's staged segments at interpreter exit (staged data is a
    pure cache — any later session rebuilds it), and sweep sibling
    session directories whose HEARTBEAT (dir mtime) is older than a
    day. A live session re-touches its dir every
    ``_STAGE_HEARTBEAT_SECONDS`` from a daemon thread, so only
    directories whose owning process is gone (no heartbeat for 24 h)
    are ever removed — a dir's CREATION age alone is not a liveness
    signal."""
    if own_dir in _STAGE_CLEANUP_DONE:
        return
    _STAGE_CLEANUP_DONE.add(own_dir)
    import atexit
    import shutil
    import threading
    import time

    atexit.register(lambda: shutil.rmtree(own_dir, ignore_errors=True))
    _touch_stage_heartbeat(own_dir)

    def _beat() -> None:
        while True:
            time.sleep(_STAGE_HEARTBEAT_SECONDS)
            _touch_stage_heartbeat(own_dir)

    threading.Thread(target=_beat, daemon=True,
                     name=f"stage-heartbeat-{os.path.basename(own_dir)}"
                     ).start()

    cutoff = time.time() - 24 * 3600
    try:
        for d in os.listdir(root):
            p = os.path.join(root, d)
            if (p != own_dir and os.path.isdir(p)
                    and os.path.getmtime(p) < cutoff):
                shutil.rmtree(p, ignore_errors=True)
    except OSError:
        pass


def _footer_schema(path: str):
    """The pyarrow schema from one parquet footer at ``path`` (file or
    directory of part files — any one footer decides, since a table is
    written with one schema), or ``None`` when unreadable. Cheap,
    driver-side, once per Catalog thanks to the table cache."""
    import pyarrow.parquet as pq

    probe = path
    if os.path.isdir(path):
        parts = sorted(
            f for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        if not parts:
            return None
        probe = os.path.join(path, parts[0])
    try:
        return pq.read_schema(probe)
    except OSError:
        return None


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Names of TIMESTAMP(NANOS) columns in the parquet at ``path``.

    Spark's reader rejects nanos outright ([PARQUET_TYPE_ILLEGAL]), so
    these columns need the forced-INT64 workaround below. The generator
    behind /root/testdata has switched a column's unit between rounds
    (events.ts: ns in r1-r3, µs in r5) — sniff, never assume. Only
    TIMESTAMP types qualify (pa.types.is_timestamp): time64/duration
    columns also expose ``unit == 'ns'`` but must NOT be forced through
    the epoch-nanos re-derivation (r5 advisory)."""
    import pyarrow.types as pat

    schema = _footer_schema(path)
    if schema is None:
        return []
    return [f.name for f in schema
            if pat.is_timestamp(f.type) and f.type.unit == "ns"]

# Sentinel defaults per role, mirroring FieldSpec.java:52-64.
DIMENSION_DEFAULTS = {
    "int": -2147483648,
    "long": -9223372036854775808,
    "float": float("-inf"),
    "double": float("-inf"),
    "string": "null",
}
METRIC_DEFAULTS = {"int": 0, "long": 0, "float": 0.0, "double": 0.0}


# FieldSpec.DataType (FieldSpec.java:385-391) and TimeUnit names accepted
# by TimeGranularitySpec.
VALID_DATA_TYPES = frozenset(
    {"INT", "LONG", "FLOAT", "DOUBLE", "BOOLEAN", "STRING", "BYTES"})
VALID_TIME_UNITS = frozenset(
    {"DAYS", "HOURS", "MINUTES", "SECONDS", "MILLISECONDS", "MICROSECONDS",
     "NANOSECONDS"})


@dataclass(frozen=True)
class TableConfig:
    """Engine-level table metadata: column roles + time granularity."""

    name: str
    dimensions: tuple[str, ...]
    metrics: tuple[str, ...] = ()
    time_column: str | None = None
    time_unit: str = "DAYS"  # granularity of the time column (TimeGranularitySpec)
    multi_value: tuple[str, ...] = ()  # ArrayType columns (MV semantics, §2.4/§2.9)
    sorted_column: str | None = None  # sorted-index analog: sortWithinPartitions on write
    # per-column defaultNullValue overrides from the schema JSON, applied by
    # NullDefaultTransformer ahead of the per-role sentinels
    null_value_overrides: tuple[tuple[str, object], ...] = ()

    @property
    def columns(self) -> tuple[str, ...]:
        cols = list(self.dimensions) + list(self.metrics)
        if self.time_column:
            cols.append(self.time_column)
        return tuple(cols)

    @classmethod
    def from_json(cls, source: str | dict) -> TableConfig:
        """Load a Pinot-style schema JSON (Schema.java:61; the
        schemaTest.schema test-resource shape): ``dimensionFieldSpecs`` /
        ``metricFieldSpecs`` with INT/LONG/FLOAT/DOUBLE/BOOLEAN/STRING/
        BYTES dataTypes, ``singleValueField: false`` marking multi-value
        dimensions, optional per-field ``defaultNullValue``, and
        ``timeFieldSpec.incomingGranularitySpec`` naming the time column
        and its TimeUnit. Accepts a dict, a JSON string, or a file path;
        raises ``ValueError`` with the offending field on any invalid
        role/type/unit or duplicate column."""
        import json

        if isinstance(source, dict):
            doc = source
        elif source.lstrip().startswith("{"):
            doc = json.loads(source)
        else:
            with open(source) as fh:
                doc = json.load(fh)

        name = doc.get("schemaName")
        if not name or not isinstance(name, str):
            raise ValueError("schema JSON requires a string 'schemaName'")

        seen: set[str] = set()

        def field_of(spec: dict, role: str) -> str:
            col = spec.get("name")
            if not col or not isinstance(col, str):
                raise ValueError(f"{role} field spec missing 'name': {spec!r}")
            if col in seen:
                raise ValueError(f"duplicate column {col!r} in schema {name!r}")
            seen.add(col)
            dt = str(spec.get("dataType", "")).upper()
            if dt not in VALID_DATA_TYPES:
                raise ValueError(
                    f"{role} {col!r}: invalid dataType {spec.get('dataType')!r}"
                    f" (valid: {sorted(VALID_DATA_TYPES)})")
            return col

        dims: list[str] = []
        mv: list[str] = []
        overrides: list[tuple[str, object]] = []
        for spec in doc.get("dimensionFieldSpecs", []) or []:
            col = field_of(spec, "dimension")
            dims.append(col)
            if spec.get("singleValueField") is False:
                mv.append(col)
            if "defaultNullValue" in spec:
                overrides.append((col, spec["defaultNullValue"]))

        metrics: list[str] = []
        for spec in doc.get("metricFieldSpecs", []) or []:
            col = field_of(spec, "metric")
            if spec.get("singleValueField") is False:
                raise ValueError(
                    f"metric {col!r}: metrics are single-value in the "
                    f"reference (FieldSpec.java:72-73)")
            metrics.append(col)
            if "defaultNullValue" in spec:
                overrides.append((col, spec["defaultNullValue"]))

        time_column, time_unit = None, "DAYS"
        tfs = doc.get("timeFieldSpec")
        if tfs:
            g = tfs.get("incomingGranularitySpec", tfs)
            time_column = g.get("name")
            if not time_column:
                raise ValueError("timeFieldSpec missing granularity 'name'")
            if time_column in seen:
                raise ValueError(
                    f"time column {time_column!r} duplicates another field")
            time_unit = str(g.get("timeType", g.get("timeUnit", "DAYS"))).upper()
            if time_unit not in VALID_TIME_UNITS:
                raise ValueError(
                    f"timeFieldSpec: invalid timeType {time_unit!r} "
                    f"(valid: {sorted(VALID_TIME_UNITS)})")

        return cls(name=name, dimensions=tuple(dims), metrics=tuple(metrics),
                   time_column=time_column, time_unit=time_unit,
                   multi_value=tuple(mv),
                   null_value_overrides=tuple(overrides))

    def to_json(self) -> str:
        """Render back to the Pinot schema JSON shape ``from_json`` reads
        (types are omitted from TableConfig — the physical schema is
        Parquet's — so they render as STRING/DOUBLE placeholders unless an
        override implies otherwise; round-trip preserves roles, MV flags,
        null overrides, and the time spec)."""
        import json

        ov = dict(self.null_value_overrides)

        def spec(col: str, role: str) -> dict:
            d: dict = {"name": col,
                       "dataType": "DOUBLE" if role == "metric" else "STRING"}
            if col in self.multi_value:
                d["singleValueField"] = False
            if col in ov:
                d["defaultNullValue"] = ov[col]
            return d

        doc: dict = {
            "schemaName": self.name,
            "dimensionFieldSpecs": [spec(c, "dimension")
                                    for c in self.dimensions],
            "metricFieldSpecs": [spec(c, "metric") for c in self.metrics],
        }
        if self.time_column:
            doc["timeFieldSpec"] = {"incomingGranularitySpec": {
                "name": self.time_column, "dataType": "LONG",
                "timeType": self.time_unit}}
        return json.dumps(doc, indent=2)


# The driver's synthetic star schema (TESTDATA.md / FIXTURES.md).
TABLES: dict[str, TableConfig] = {
    t.name: t
    for t in [
        TableConfig(
            "lineitem",
            dimensions=("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                        "l_returnflag", "l_linestatus"),
            metrics=("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
            time_column="l_shipdate",
            time_unit="DAYS",
            sorted_column="l_returnflag",
        ),
        TableConfig(
            "orders",
            dimensions=("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"),
            metrics=("o_totalprice",),
            time_column="o_orderdate",
            time_unit="DAYS",
        ),
        TableConfig(
            "events",
            dimensions=("event_id", "user_id", "event_type", "props"),
            metrics=("value",),
            time_column="ts",
            time_unit="MILLISECONDS",
        ),
        TableConfig("customer",
                    dimensions=("c_custkey", "c_name", "c_nationkey", "c_mktsegment"),
                    metrics=("c_acctbal",)),
        TableConfig("supplier",
                    dimensions=("s_suppkey", "s_name", "s_nationkey"),
                    metrics=("s_acctbal",)),
        TableConfig("part",
                    dimensions=("p_partkey", "p_name", "p_brand", "p_type", "p_size"),
                    metrics=("p_retailprice",)),
        TableConfig("nation", dimensions=("n_nationkey", "n_name", "n_regionkey")),
        TableConfig("region", dimensions=("r_regionkey", "r_name")),
        TableConfig("documents",
                    dimensions=("doc_id", "text", "lang", "source"),
                    metrics=("n_chars",)),
        TableConfig("embeddings",
                    dimensions=("vec_id", "label"),
                    multi_value=("embedding",)),
    ]
}


# ---------------------------------------------------------------------------
# Derived (computed) tables — the media/curation surface exposed to the
# PQL/SQL entry points. Each builder takes the Catalog and returns a
# DataFrame; results are cached per Catalog like physical tables, so
# "SELECT video_codec, COUNT(*) FROM media_probe GROUP BY video_codec"
# works through PQLServer without dropping to the Python API. The
# probe/feature columns come from the same mapInPandas operators the
# suite queries use — metadata-only per-row CPU, payload never shuffled,
# so the derivation holds at corpus scale.
# ---------------------------------------------------------------------------

def _derived_media(cat: "Catalog") -> DataFrame:
    from realtime_olap_spark.operators import multimodal as M  # noqa: PLC0415
    return M.media_view(cat.table("documents"))


def _derived_media_probe(cat: "Catalog") -> DataFrame:
    from realtime_olap_spark.operators import multimodal as M  # noqa: PLC0415
    return M.probe_media(cat.table("media"), with_status=True)


def _derived_media_features(cat: "Catalog") -> DataFrame:
    from realtime_olap_spark.operators import multimodal as M  # noqa: PLC0415
    return M.extract_features(cat.table("media"))


# Analytics/curation families as PQL-addressable tables (r13): each is
# the family's canonical parameterization over the events/documents
# tables — "SELECT step_name, n_users FROM funnel" works through POST
# /query. Custom parameterizations go through Catalog.register_derived
# with the same operators. All stay one-shuffle scale shapes (the
# operators' own plans); the derivation is cached per Catalog.

def _derived_funnel(cat: "Catalog") -> DataFrame:
    from realtime_olap_spark.operators import funnel as FN  # noqa: PLC0415
    return FN.funnel_counts(cat.table("events"),
                            steps=("view", "click", "signup",
                                   "purchase"))


def _derived_retention(cat: "Catalog") -> DataFrame:
    from realtime_olap_spark.operators import retention as R  # noqa: PLC0415
    return R.cohort_retention(cat.table("events"),
                              bucket_seconds=86400)


def _derived_attribution(cat: "Catalog") -> DataFrame:
    from realtime_olap_spark.operators import attribution as A  # noqa: PLC0415
    return A.attribution_report(cat.table("events"), "purchase",
                                ("view", "click"))


def _derived_ohlc(cat: "Catalog") -> DataFrame:
    from realtime_olap_spark.operators import downsample as D  # noqa: PLC0415
    return D.ohlc(cat.table("events"), "ts", 3600, ("event_type",),
                  "value")


def _derived_events_hourly(cat: "Catalog") -> DataFrame:
    from realtime_olap_spark.operators import gapfill as G  # noqa: PLC0415
    bucketed = G.time_bucket(cat.table("events"), "ts", 3600,
                             ("event_type",),
                             (F.count(F.lit(1)).cast("double")
                              .alias("n_events"),))
    return G.gapfill(bucketed, "bucket", ("event_type",),
                     ("n_events",), 3600, how="zero")


def _derived_doc_signals(cat: "Catalog") -> DataFrame:
    # per-document curation signals (scan-side, zero shuffle):
    # detected language, quality score, token counts, fingerprint
    from realtime_olap_spark.operators import text as T  # noqa: PLC0415
    docs = cat.table("documents")
    t = F.col("text")
    return docs.select(
        "doc_id", "source", "lang",
        T.detect_language(t).alias("detected_lang"),
        T.quality_score(t).alias("quality_score"),
        T.token_count(t).alias("n_tokens"),
        T.bpe_ish_token_count(t).alias("n_bpe_tokens"),
        F.length(t).alias("n_chars"),
        T.rolling_fingerprint_fast(t).alias("fingerprint"))


def _derived_dedup_stats(cat: "Catalog") -> DataFrame:
    # per-source exact-duplicate inventory over documents: one
    # (source, text-hash) shuffle, then a tiny per-source rollup
    docs = cat.table("documents")
    per_text = (docs.groupBy("source", F.xxhash64("text").alias("_h"))
                .agg(F.count(F.lit(1)).alias("n")))
    return (per_text.groupBy("source")
            .agg(F.sum("n").alias("n_docs"),
                 F.count(F.lit(1)).alias("n_distinct_texts"),
                 F.sum(F.when(F.col("n") > 1, F.col("n"))
                       .otherwise(F.lit(0))).alias("n_dup_docs"),
                 F.max("n").alias("max_group")))


DERIVED_TABLES = {
    "media": _derived_media,
    "media_probe": _derived_media_probe,
    "media_features": _derived_media_features,
    "funnel": _derived_funnel,
    "retention": _derived_retention,
    "attribution": _derived_attribution,
    "ohlc": _derived_ohlc,
    "events_hourly": _derived_events_hourly,
    "doc_signals": _derived_doc_signals,
    "dedup_stats": _derived_dedup_stats,
}


@dataclass
class Catalog:
    """Loads the star-schema tables of one scale factor and registers views.

    A reference 'segment' maps to a Parquet file; a 'table' to the DataFrame
    over all its files (SURVEY.md §1.5). Queries address one table
    (README.md:27) — joins are an engine extension beyond reference parity.
    Derived tables (``DERIVED_TABLES`` + :meth:`register_derived`) expose
    the media/curation operators to the same entry points.
    """

    spark: SparkSession
    sf_dir: str = DEFAULT_SF_DIR
    _cache: dict[str, DataFrame] = field(default_factory=dict)
    _derived: dict[str, DataFrame] = field(default_factory=dict)
    _views_registered: bool = False

    def register_derived(self, name: str, df) -> None:
        """Register a session-scoped derived table addressable from the
        PQL/SQL entry points (e.g. a probed media inventory built from
        an external corpus). Physical table names AND the built-in
        derived names (``DERIVED_TABLES``) are reserved. If the SQL
        views were already registered, the new table becomes a temp
        view immediately — no re-``register_views()`` needed.

        ``df`` may also be a ZERO-ARG CALLABLE returning a DataFrame:
        it is re-evaluated on every :meth:`table` access, so
        catalog-backed relations inside it re-resolve per query — the
        way to keep a served view LIVE over a growing realtime sink
        (a plain DataFrame pins its file listing at analysis; see
        ``streaming.realtime_segments_table``). To keep the SQL
        surface consistent with the PQL path, the temp view for a
        callable is RE-REGISTERED from a fresh evaluation on every
        :meth:`table` access (every PQL query) and on
        :meth:`refresh_derived` — call the latter after out-of-band
        segment commits if querying only through ``spark.sql``."""
        if name in TABLES:
            raise ValueError(f"{name!r} is a physical table name")
        if name in DERIVED_TABLES:
            raise ValueError(f"{name!r} is a built-in derived table")
        self._derived[name] = df
        if self._views_registered:
            (df() if callable(df) else df).createOrReplaceTempView(name)

    def refresh_derived(self, name: str | None = None) -> None:
        """Re-evaluate callable-backed derived tables and re-register
        their SQL temp views, so ``spark.sql`` sees the same live data
        as the PQL path. ``name=None`` refreshes all of them."""
        names = [name] if name is not None else list(self._derived)
        for n in names:
            obj = self._derived[n]
            if callable(obj) and self._views_registered:
                obj().createOrReplaceTempView(n)

    def table(self, name: str) -> DataFrame:
        if name in self._derived:
            obj = self._derived[name]
            if callable(obj):
                df = obj()
                # keep the SQL temp view in lock-step with the PQL
                # path: a frozen snapshot view would silently serve
                # different data than POST /query as segments land
                if self._views_registered:
                    df.createOrReplaceTempView(name)
                return df
            return obj
        if name not in self._cache:
            if name in DERIVED_TABLES:
                self._cache[name] = DERIVED_TABLES[name](self)
                return self._cache[name]
            if name not in TABLES:
                raise KeyError(
                    f"unknown table {name!r}; known: "
                    f"{sorted(TABLES) + sorted(DERIVED_TABLES)}")
            from realtime_olap_spark.memo import session_memo  # noqa: PLC0415

            path = os.path.join(self.sf_dir, f"{name}.parquet")
            staged = self._should_stage(path)
            # The DataFrame OBJECT is memoized per (session, corpus,
            # stage decision), unmaterialized: every query builds a
            # fresh Catalog, and re-resolving spark.read.parquet per
            # build costs ~60 ms (raw single file) to ~130 ms (staged
            # 32-file directory) of driver-side DataSource resolution —
            # pure per-query overhead at bench time. The memoized value
            # stays a FileScan plan (materialize=False), so pushdown /
            # pruning / ReadSchema semantics are untouched.
            self._cache[name] = session_memo(
                self.spark, self.sf_dir, f"table_{name}_{int(staged)}_" + os.environ.get(STAGE_PARTS_ENV, "d"),
                lambda: self._load(name, path, staged), materialize=False)
        return self._cache[name]

    def _load(self, name: str, path: str, staged: bool) -> DataFrame:
        # A column's physical timestamp unit depends on the generator
        # run (events.ts has shipped as both NANOS and MICROS across
        # rounds). Spark rejects nanos outright, and assuming one
        # encoding silently corrupts the other — sniff the footer and
        # route EVERY table through the workaround only when needed.
        ns_cols = _nanos_timestamp_cols(path)
        if ns_cols:
            df = self._read_nanos(path, ns_cols)
        else:
            df = self.spark.read.parquet(path)
            if name == "events":
                # Natural read; normalize NTZ to the session-zone
                # timestamp the rest of the engine expects, and keep a
                # ts_ns epoch-nanos twin so the exposed events schema
                # is identical under both encodings. Column order is
                # derived from the sniffed footer (ts slot becomes
                # ts_ns, ts re-appended) — never a hardcoded list, so
                # a generator-added column flows through both branches
                # identically (r5 advisory).
                footer = _footer_schema(path)
                names = ([f.name for f in footer] if footer is not None
                         else df.columns)
                order = ["ts_ns" if n == "ts" else n for n in names]
                df = (df.withColumn("ts", F.col("ts").cast("timestamp"))
                        .withColumn(
                            "ts_ns",
                            (F.unix_micros(F.col("ts")) * F.lit(1000)).cast("long"))
                        .select(*order, "ts"))
        if staged:
            df = self.spark.read.parquet(self._staged_path(name, df))
        return df

    def _should_stage(self, path: str) -> bool:
        """Stage exactly the pathological case: ONE data file (= one scan
        task) below the size cap, on a multi-core session. Directories of
        part files keep their deliberate layout; oversized files read
        raw; SPARK_GRAFT_STAGE=0 turns staging off entirely."""
        if os.environ.get(STAGE_ENV, "1") == "0":
            return False
        if self.spark.sparkContext.defaultParallelism <= 1:
            return False
        if os.path.isfile(path):
            return os.path.getsize(path) < STAGE_MAX_BYTES
        if os.path.isdir(path):
            parts = [f for f in os.listdir(path)
                     if f.endswith(".parquet") and not f.startswith(("_", "."))]
            return (len(parts) == 1
                    and os.path.getsize(os.path.join(path, parts[0]))
                    < STAGE_MAX_BYTES)
        return False

    def _staged_path(self, name: str, df: DataFrame) -> str:
        """Write the table's session segments once per (session, corpus)
        — ``defaultParallelism // 4`` part files under the system temp
        dir, range-clustered + sorted on the table's declared
        sorted/time columns when present (the sorted-index segment
        analog: file and row-group stats on the cluster columns then
        skip at scan time) — and return the staged directory. Build +
        publish are serialized by the memo lock."""
        import hashlib
        import tempfile

        from realtime_olap_spark.memo import session_memo

        # Default part count = cores/4: staged segments balance parallel
        # decode against per-file scheduling overhead. Measured at
        # sf0.1/local[32] over the 22 hottest suite queries (interleaved
        # min-of-4, same session): raw 18.2 s, 8 parts 14.5 s, 16 parts
        # 15.6 s, 32 parts ~20 s — per-task dispatch (~6 ms) eats the
        # parallelism win past ~cores/4 on sub-second scans. Compute-
        # heavy scans (classifier scoring, doc features) still speed up
        # 2.6x at 8 parts. Override with SPARK_GRAFT_STAGE_PARTS.
        n = int(os.environ.get(
            STAGE_PARTS_ENV,
            max(2, self.spark.sparkContext.defaultParallelism // 4)))

        def build() -> str:
            # Path + memo key both carry the part count: a mid-session
            # knob change must build a NEW directory, never overwrite
            # files a live memoized DataFrame still points at.
            root = os.path.join(tempfile.gettempdir(), "rtolap_segments")
            own = os.path.join(root, self.spark.sparkContext.applicationId)
            _register_stage_cleanup(root, own)
            out = os.path.join(
                own, hashlib.md5(self.sf_dir.encode()).hexdigest()[:8],
                f"{name}_p{n}")
            # Range-cluster on (sorted_column, time_column) when the
            # table declares them: each staged file then covers a narrow
            # key/time range, so file- and row-group stats prune range
            # predicates — the sorted-index segment layout. Round-robin
            # would spray every file across the full key range and
            # defeat min/max skipping. Tables declaring neither are
            # round-robined (no clustering to preserve).
            cfg = TABLES.get(name)
            cluster = [c for c in
                       ((cfg.sorted_column, cfg.time_column) if cfg else ())
                       if c is not None]
            if cluster:
                staged = (df.repartitionByRange(n, *cluster)
                            .sortWithinPartitions(*cluster))
            else:
                staged = df.repartition(n)
            staged.write.mode("overwrite").parquet(out)
            return out

        return session_memo(self.spark, self.sf_dir,
                            f"segments_{name}_p{n}", build)

    def _read_nanos(self, path: str, ns_cols: list[str]) -> DataFrame:
        """Read a parquet whose ``ns_cols`` are TIMESTAMP(NANOS): force the
        physical INT64 as epoch-nanos (kept as ``<col>_ns``) and re-derive
        a microsecond timestamp under the original name (`div 1000` stays
        in long arithmetic — 1.7e18 ns doesn't survive a double; µs
        truncation matches what SQL engines expose for ns columns)."""
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_type
        from pyspark.sql.types import LongType, StructField, StructType

        probe = path
        if os.path.isdir(path):
            parts = sorted(f for f in os.listdir(path)
                           if f.endswith(".parquet")
                           and not f.startswith(("_", ".")))
            probe = os.path.join(path, parts[0])
        fields = [
            StructField(f.name,
                        LongType() if f.name in ns_cols
                        else from_arrow_type(f.type), True)
            for f in pq.read_schema(probe)]
        df = self.spark.read.schema(StructType(fields)).parquet(path)
        for c in ns_cols:
            df = (df.withColumnRenamed(c, f"{c}_ns")
                    .withColumn(c, F.expr(f"timestamp_micros({c}_ns div 1000)")))
        return df

    def config(self, name: str) -> TableConfig:
        return TABLES[name]

    def register_views(self) -> None:
        """Register every table as a temp view for the SQL entry point
        — physical tables AND the derived media/curation tables (the
        latter stay lazy: a view registration plans nothing)."""
        for name in TABLES:
            self.table(name).createOrReplaceTempView(name)
        for name in DERIVED_TABLES:
            self.table(name).createOrReplaceTempView(name)
        for name, df in self._derived.items():
            (df() if callable(df) else df).createOrReplaceTempView(name)
        self._views_registered = True
