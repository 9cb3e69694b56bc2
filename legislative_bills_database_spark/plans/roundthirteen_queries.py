"""Round-13 phases 100+: dictionary-scale multi-pattern search
(Aho-Corasick vs the reference's folded-OR, head-to-head), the
quantized-exact scalar Kalman filter + RTS smoother (the next rung of
the chunked-affine ladder), and the transformWithState streaming
census (Spark 4's successor to applyInPandasWithState).

VERDICT r12 "Next round" items 4-6. Discipline as everywhere:
exact-integer arithmetic wherever a value crosses engines, bounded
per-key arrays, repartition barriers between higher-order-function
projections (the r12 lambda-inlining finding), one data-sized shuffle
per query.
"""

from __future__ import annotations

import itertools
import string

from pyspark.sql import functions as F

from ..io import load_table
from .registry import query

# ---------------------------------------------------------------------------
# dictionary-scale multi-pattern search: 1000-term head-to-head
# ---------------------------------------------------------------------------

# The synthetic corpus vocabulary (TESTDATA.md documents generator).
# Used only to pick dictionary terms that actually HIT — correctness
# never depends on the hit/miss split (both engines see the same
# dictionary), so new vocabulary at other SFs is harmless.
_MT_VOCAB = (
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
)
_MT_HITS = sorted({w[i : i + 3] for w in _MT_VOCAB for i in range(len(w) - 2)})


def _mt_misses(k: int) -> list[str]:
    """First k letter-trigrams (aaa, aab, …) that are not substrings of
    any vocabulary word — deterministic dictionary padding. Letter-only
    terms can never match across word boundaries (every cross-word
    trigram contains a space), so these are guaranteed misses on the
    fixture corpus; if a larger SF ever grows the vocabulary, a miss
    turning into a hit is still engine-symmetric."""
    hits = set(_MT_HITS)
    out: list[str] = []
    for tri in ("".join(c) for c in itertools.product(string.ascii_lowercase, repeat=3)):
        if tri not in hits:
            out.append(tri)
            if len(out) == k:
                break
    return out


_MT_TERMS = sorted(_MT_HITS + _mt_misses(1000 - len(_MT_HITS)))
assert len(_MT_TERMS) == 1000 and len(set(_MT_TERMS)) == 1000
_MT_SQL_LIST = ", ".join(f"'{t}'" for t in _MT_TERMS)
# one predicate string, parsed ONCE by each engine (building 1000
# Column.contains calls costs ~2000 py4j round-trips; F.expr is one)
_MT_FOLDED_PRED = " OR ".join(
    f"lower(text) LIKE '%{t}%'" for t in _MT_TERMS
)


@query(
    "q_multiterm_scale",
    f"""
    WITH terms(t) AS (SELECT unnest([{_MT_SQL_LIST}])),
    grams AS (
      SELECT doc_id,
             unnest([substr(lower(text), p, 3)
                     FOR p IN generate_series(
                       1, CAST(length(text) AS INT) - 2)]) AS tri
      FROM documents WHERE length(text) >= 3
    ), occ AS (
      SELECT doc_id, tri FROM grams JOIN terms ON tri = t
    )
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
           CAST(count(DISTINCT tri) AS BIGINT) AS n_terms,
           min(tri) AS first_term, max(tri) AS last_term
    FROM occ GROUP BY doc_id
    """,
)
def q_multiterm_scale(spark, sf_dir):
    """The reference's multi-term search workload
    (legiscan_search_all_bills.R:52,88-93: substring stems ORed over
    bill text) at DICTIONARY scale — 1000 terms in ONE Aho-Corasick
    pass per document (operators/search.ahocorasick_hit_census,
    Arrow-batched mapInPandas, automaton built once per worker).

    Folded-OR (q_multiterm_or_filter's shape, q_multiterm_folded here)
    is O(terms × chars) per row; this is O(chars + matches) regardless
    of dictionary size. Measured head-to-head at sf0.1 (5000 docs,
    1000 terms, min-of-3): AC 0.92 s vs folded-OR 1.73 s — and the two
    rejected single-pass JVM alternatives are slower than BOTH
    (lookahead-alternation regex 1.73 s: Java regex backtracks
    alternations, still O(terms)/position; literal-map trigram probe
    5.3 s: GetMapValue on a CreateMap literal is a LINEAR scan). Both
    queries sit in bench.py so the crossover stays measured per round.

    Hash-certified: the DuckDB twin enumerates every text position and
    equi-joins 3-grams against the dictionary — a different algorithm
    agreeing on every (doc, n_hits, n_terms, first, last) row,
    including OVERLAPPING occurrences (the uniform 3-char dictionary
    makes the twin's substr join exact; the AC side needs no such
    restriction — variable-length parity vs folded-OR is pinned in
    tests/test_phase101.py on the reference's own 15 stems)."""
    from ..operators.search import ahocorasick_hit_census

    docs = load_table(spark, sf_dir, "documents")
    return ahocorasick_hit_census(docs, "doc_id", "text", _MT_TERMS)


@query(
    "q_multiterm_folded",
    f"SELECT doc_id FROM documents WHERE {_MT_FOLDED_PRED}",
)
def q_multiterm_folded(spark, sf_dir):
    """The SAME 1000-term search as q_multiterm_scale in the
    reference's own folded-OR shape (legiscan_search_all_bills.R:88-93
    scaled up) — the head-to-head baseline bench.py times against the
    AC pass every round. One F.expr parse (not 1000 Column calls);
    Catalyst folds it into a single codegen'd predicate at the scan."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.expr(_MT_FOLDED_PRED)).select("doc_id")


# ---------------------------------------------------------------------------
# quantized-exact scalar Kalman filter + RTS smoother
# ---------------------------------------------------------------------------

_KAL_G = 100_000  # gain/smoother-coefficient quantization grid
_KAL_Q = 100      # process-noise variance (cents²)
_KAL_R = 400      # observation-noise variance (cents²)
_KAL_P1 = 400     # posterior variance after the first observation

# the quantized gain and smoother coefficient, spelled once for the
# twin (textual substitution — the lateral-alias hazard)
_KAL_KG = "((fp[-1] + 100) * 100000 // (fp[-1] + 100 + 400))"
_KAL_CQ = "((fp[k - 1] * 100000) // (fp[k - 1] + 100))"


def _sql_kalman() -> str:
    return f"""
    WITH RECURSIVE vals AS (
      SELECT user_id,
             [CAST(ROUND(v * 100) AS BIGINT)
              FOR v IN list(value ORDER BY ts, event_id)] AS zs,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY user_id
    ), fwd AS (
      SELECT user_id, zs, n, CAST(1 AS BIGINT) AS k,
             [zs[1]] AS fm, [CAST({_KAL_P1} AS BIGINT)] AS fp
      FROM vals
      UNION ALL
      SELECT user_id, zs, n, k + 1,
             list_append(fm, fm[-1]
               + ({_KAL_KG} * (zs[CAST(k AS INT) + 1] - fm[-1])) // 100000),
             list_append(fp,
               ((100000 - {_KAL_KG}) * (fp[-1] + 100)) // 100000)
      FROM fwd WHERE k < n
    ), mats AS (
      SELECT user_id, n, fm, fp FROM fwd WHERE k = n
    ), bwd AS (
      SELECT user_id, n, fm, fp, n AS k, [fm[-1]] AS ms
      FROM mats
      UNION ALL
      SELECT user_id, n, fm, fp, k - 1,
             list_prepend(fm[CAST(k AS INT) - 1]
               + ({_KAL_CQ} * (ms[1] - fm[CAST(k AS INT) - 1])) // 100000,
               ms)
      FROM bwd WHERE k > 1
    )
    SELECT user_id, n AS n_events,
           fm[-1] AS m_final, fp[-1] AS p_final, ms[1] AS ms_first,
           CAST(len(list_filter(
             [ms[t] - fm[t] FOR t IN generate_series(1, CAST(n AS INT))],
             d -> d != 0)) AS BIGINT) AS n_moves,
           CAST(list_max(
             [abs(ms[t] - fm[t])
              FOR t IN generate_series(1, CAST(n AS INT))])
             AS BIGINT) AS max_abs_adj
    FROM bwd WHERE k = 1
    """


@query("q_kalman", _sql_kalman())
def q_kalman(spark, sf_dir):
    """Scalar Kalman filter + Rauch-Tung-Striebel smoother over each
    user's event-value series (local-level model: x_t = x_{t-1} + w,
    z_t = x_t + v) — the general-state-space rung of the chunked-affine
    ladder (EWMA scalar → Holt 2×2 → Holt-Winters (m+2)² →
    state-space), fused with the HMM quantization discipline
    (roundtwelve_queries.py:307): every division that would break
    BIGINT exactness is floor-/trunc-quantized to the 10⁵ grid, so the
    whole two-pass recursion hash-matches a recursive-CTE twin.

    Per step (all BIGINT, cents): Ppred = P + Q; gain Kq = (Ppred·10⁵)
    div (Ppred + R); m' = m + (Kq·(z − m)) div 10⁵; P' = ((10⁵ −
    Kq)·Ppred) div 10⁵. Backward (RTS, A = 1): Cq = (P_k·10⁵) div
    (P_k + Q); ms_k = m_k + (Cq·(ms_{{k+1}} − m_k)) div 10⁵. The m/ms
    updates have SIGNED numerators, so div is the portable TRUNC-div —
    (a − a%b)/b with Spark's dividend-sign %, matching DuckDB's //
    exactly (the q_goertzel pin); gains/variances are positive, where
    trunc == floor. Magnitudes: P ≤ 500, Kq·(z−m) ≤ 10⁵·5·10⁴ = 5·10⁹
    — far inside the 2⁵³ exact-double window for the lambda-scope
    division. P's recursion is data-independent (converges to the
    steady-state Riccati fixed point in ~6 steps) but is carried in
    the fold so the certificate covers it.

    Trajectory functionals ride the fold: n_moves (steps where
    hindsight moved the estimate) and max_abs_adj (the largest
    smoothing correction, in cents) — the quantities a training-data
    pipeline reads to decide whether online estimates suffice.

    Scale shape: one per-user ordered collect, two JVM folds, no UDF,
    no per-step shuffle; repartition(user_id) barriers between the
    fold projections (the r12 lambda-inlining finding — without them
    CollapseProject merges fm/fp INTO the backward lambda and the
    forward pass re-runs per backward element). n=1 guards on both
    folds (sequence(2,1) is DESCENDING; sequence(0,1,-1) throws)."""
    events = load_table(spark, sf_dir, "events")
    base = (
        events.groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "value"))
                ),
                lambda s: F.round(s["value"] * 100).cast("long"),
            ).alias("zs")
        )
        .withColumn("n", F.size("zs").cast("long"))
    )
    zs, n = F.col("zs"), F.col("n")
    G = F.lit(_KAL_G).cast("long")
    Q = F.lit(_KAL_Q).cast("long")
    R = F.lit(_KAL_R).cast("long")

    def _tdiv(num, den):
        # trunc toward zero == DuckDB //; exact: |num| < 2^53
        return ((num - num % den) / den).cast("long")

    fseed = F.struct(
        F.array(F.element_at(zs, 1)).alias("fm"),
        F.array(F.lit(_KAL_P1).cast("long")).alias("fp"),
    )

    def fstep(acc, k):
        m = F.element_at(acc["fm"], -1)
        p = F.element_at(acc["fp"], -1)
        ppred = p + Q
        kq = _tdiv(ppred * G, ppred + R)
        mn = m + _tdiv(kq * (F.element_at(zs, k.cast("int")) - m), G)
        pn = _tdiv((G - kq) * ppred, G)
        return F.struct(
            F.concat(acc["fm"], F.array(mn)).alias("fm"),
            F.concat(acc["fp"], F.array(pn)).alias("fp"),
        )

    fwd = F.when(
        n >= 2,
        F.aggregate(F.sequence(F.lit(2).cast("long"), n), fseed, fstep),
    ).otherwise(fseed)
    mats = base.select(
        "user_id",
        F.col("n").alias("n_events"),
        fwd["fm"].alias("fm"),
        fwd["fp"].alias("fp"),
    ).repartition("user_id")

    fm, fp = F.col("fm"), F.col("fp")
    ne = F.col("n_events")
    bseed = F.struct(F.array(F.element_at(fm, -1)).alias("ms"))

    def bstep(acc, k):
        mk = F.element_at(fm, k.cast("int"))
        pk = F.element_at(fp, k.cast("int"))
        cq = _tdiv(pk * G, pk + Q)
        msk = mk + _tdiv(cq * (F.element_at(acc["ms"], 1) - mk), G)
        return F.struct(F.concat(F.array(msk), acc["ms"]).alias("ms"))

    bwd = F.when(
        ne >= 2,
        F.aggregate(
            F.sequence(
                ne - 1, F.lit(1).cast("long"), F.lit(-1).cast("long")
            ),
            bseed,
            bstep,
        ),
    ).otherwise(bseed)
    smoothed = mats.select(
        "user_id", "n_events", "fm", "fp", bwd["ms"].alias("ms")
    ).repartition("user_id")

    idx = F.sequence(F.lit(1).cast("long"), F.col("n_events"))
    diffs = F.transform(
        idx,
        lambda t: F.element_at("ms", t.cast("int"))
        - F.element_at("fm", t.cast("int")),
    )
    return smoothed.select(
        "user_id",
        "n_events",
        F.element_at("fm", -1).alias("m_final"),
        F.element_at("fp", -1).alias("p_final"),
        F.element_at("ms", 1).alias("ms_first"),
        F.size(F.filter(diffs, lambda d: d != 0)).cast("long").alias(
            "n_moves"
        ),
        F.array_max(F.transform(diffs, F.abs)).alias("max_abs_adj"),
    )


# ---------------------------------------------------------------------------
# transformWithState census (Spark 4 arbitrary-state API)
# ---------------------------------------------------------------------------

_TWS_PROVIDERS = {
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
    "hdfs-heap": (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    ),
}


@query("q_stream_tws_totals")  # runs real availableNow streams → rows-only
def q_stream_tws_totals(spark, sf_dir):
    """API-migration census for transformWithStateInPandas (Spark 4's
    arbitrary-state successor to applyInPandasWithState, SPARK-46815):
    the same per-user running-totals processor
    (streaming/stateful.running_user_totals_tws) attempted under BOTH
    state-store providers, next to the legacy-API run that anchors the
    fixture — one row per (api, provider) with the batch-diff verdict
    or the classified refusal.

    Engine facts this census records (measured, not assumed):
    - transformWithState supports ONLY the RocksDB provider; the heap
      provider is refused. In THIS environment both attempts fail
      earlier: the API routes state through a PYTHON DRIVER WORKER
      speaking a protobuf protocol, and `google.protobuf` is not
      installed — the worker crashes at init
      (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE). The census
      probes importability directly and classifies the refusal as
      `python-worker-protobuf-missing`, so the moment the environment
      gains protobuf the rows upgrade to real batch-diff verdicts
      (rocksdb) and the provider rejection (hdfs-heap) with NO code
      change — the pytest pin (tests/test_phase101.py) flips to
      remind. The legacy applyInPandasWithState path needs no
      protobuf (state rides the Arrow channel) and stays green under
      RocksDB here, proving fixture + diff logic sound.
    """
    import importlib.util
    import shutil
    import tempfile
    import uuid as _uuid

    from ..streaming.events import _census_stream_confs
    from ..streaming.stateful import (
        running_user_totals,
        running_user_totals_tws,
    )

    events = load_table(spark, sf_dir, "events")
    try:  # find_spec raises if even the parent 'google' pkg is absent
        have_protobuf = (
            importlib.util.find_spec("google.protobuf") is not None
        )
    except ModuleNotFoundError:
        have_protobuf = False
    tmp = tempfile.mkdtemp(prefix="q_stream_tws_")
    prov_key = "spark.sql.streaming.stateStore.providerClass"
    try:
        json_dir = f"{tmp}/events_json"
        events.select(
            "event_id", "ts", "user_id", "event_type", "value"
        ).repartitionByRange(4, "ts").write.json(json_dir)
        landed_schema = (
            "event_id long, ts timestamp, user_id long,"
            " event_type string, value double"
        )
        batch_df = (
            spark.read.schema(landed_schema)
            .json(json_dir)
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 4).alias("total_value"),
            )
        )
        n_batch_users = batch_df.count()

        def run_one(api: str, provider: str):
            op = (
                running_user_totals_tws
                if api == "transformWithStateInPandas"
                else running_user_totals
            )
            stream_df = (
                spark.readStream.format("json")
                .schema(landed_schema)
                .option("maxFilesPerTrigger", 1)
                .load(json_dir)
            )
            name = "tws_census_" + _uuid.uuid4().hex[:8]
            prev = spark.conf.get(prov_key, None)
            spark.conf.set(prov_key, _TWS_PROVIDERS[provider])
            q = None
            try:
                with _census_stream_confs(spark, "8"):
                    q = (
                        op(stream_df)
                        .writeStream.format("memory")
                        .queryName(name)
                        .outputMode("update")
                        .trigger(availableNow=True)
                        .option(
                            "checkpointLocation",
                            f"{tmp}/cp_{name}",
                        )
                        .start()
                    )
                    if not q.awaitTermination(150):
                        q.stop()
                        raise RuntimeError(
                            f"tws census: {api}/{provider} did not "
                            f"drain in 150s"
                        )
            except Exception as ex:  # classified refusal is the DATA
                if q is not None:
                    try:
                        q.stop()
                    except Exception:
                        pass
                s = str(ex)
                if "exited unexpectedly" in s and not have_protobuf:
                    failure = "python-worker-protobuf-missing"
                elif (
                    "STATE_STORE" in s
                    or "RocksDB" in s.replace(
                        _TWS_PROVIDERS["rocksdb"], ""
                    )
                    or "provider" in s.lower()
                ):
                    failure = "provider-rejected"
                else:
                    failure = s.splitlines()[0][:80]
                return (api, provider, False, failure, None, None)
            finally:
                if prev is None:
                    spark.conf.unset(prov_key)
                else:
                    spark.conf.set(prov_key, prev)
            streamed = (
                spark.table(name)
                .groupBy("user_id")
                .agg(
                    F.max(F.struct("n_events", "total_value")).alias("s")
                )
                .select(
                    "user_id",
                    F.col("s.n_events").alias("n_events"),
                    F.round(F.col("s.total_value"), 4).alias(
                        "total_value"
                    ),
                )
            )
            n_stream_users = streamed.count()
            n_mismatch = (
                streamed.exceptAll(batch_df).count()
                + batch_df.exceptAll(streamed).count()
            )
            spark.catalog.dropTempView(name)
            equal = bool(
                n_mismatch == 0 and n_stream_users == n_batch_users
            )
            return (api, provider, True, None, equal, n_stream_users)

        rows = [
            run_one("applyInPandasWithState", "rocksdb"),
            run_one("transformWithStateInPandas", "rocksdb"),
            run_one("transformWithStateInPandas", "hdfs-heap"),
        ]
        return spark.createDataFrame(
            rows,
            "api string, provider string, ran boolean,"
            " failure string, batch_equal boolean, n_users long",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
