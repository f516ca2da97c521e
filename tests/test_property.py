"""Property-based tests (SURVEY §5.2(5)): the engine must agree with an
independent pandas reimplementation of the §2.1 math on randomized inputs,
and results must be invariant to record order."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_streams_example_spark.plans import solar

# slow tier (r12): definition-level brute-force/property replays —
# the builder's pre-commit gate (SPARK_GRAFT_SLOW=1) runs them; the
# driver's bounded default window keeps the oracle/streaming gates.
pytestmark = pytest.mark.slow



def round_half_up(x: float, digits: int) -> float:
    """Java BigDecimal.valueOf(x).setScale(digits, HALF_UP) — what Spark's
    F.round does. Python's built-in round is banker's (0.25 → 0.2, not
    0.3), so the reference must not use it. Decimal(repr(x)) mirrors
    Double.toString's shortest representation."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def pandas_reference_anomalies(rows: list[tuple]) -> set:
    """Independent §2.1 reimplementation in pandas (Java-double semantics)."""
    pdf = pd.DataFrame(rows, columns=["sec", "panel", "name", "power"])
    pdf["w"] = (pdf["sec"] // 30) * 30
    mod = (
        pdf.groupby(["w", "panel", "name"])
        .agg(sum_power=("power", "sum"), cnt=("power", "size"))
        .reset_index()
    )
    out = set()
    for (w, panel), grp in mod.groupby(["w", "panel"]):
        panel_avg = round_half_up(float(grp.sum_power.mean()), 1)
        squares = float(((grp.sum_power - panel_avg) ** 2).sum())
        deviance = round_half_up(math.sqrt(squares / len(grp)), 1)
        for _, r in grp.iterrows():
            if abs(r.sum_power - panel_avg) > 1.0 * deviance:
                out.add((int(w), r.panel, r["name"]))
    return out


record = st.tuples(
    st.integers(min_value=0, max_value=89),          # second offset → 3 windows
    st.sampled_from(["p1", "p2"]),
    st.sampled_from(["m1", "m2", "m3"]),
    # multiples of 0.25 are exactly representable → sums are exact in both
    # engines and the property cannot flake on float summation order
    st.integers(min_value=0, max_value=800).map(lambda v: v / 4.0),
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(record, min_size=1, max_size=60))
def test_anomalies_match_pandas_reference(spark, rows):
    df = spark.createDataFrame(
        [(f"2024-01-01 00:{s // 60:02d}:{s % 60:02d}", p, m, v) for s, p, m, v in rows],
        "ts STRING, panel STRING, name STRING, power DOUBLE",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        (int(r["w"].start.timestamp() % 3600), r.panel, r.module)
        for r in solar.anomalies(df).collect()
    }
    want = pandas_reference_anomalies(rows)
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(record, min_size=2, max_size=40), st.randoms())
def test_anomalies_invariant_under_row_order(spark, rows, rnd):
    shuffled = list(rows)
    rnd.shuffle(shuffled)

    def run(rs):
        df = spark.createDataFrame(
            [(f"2024-01-01 00:{s // 60:02d}:{s % 60:02d}", p, m, v) for s, p, m, v in rs],
            "ts STRING, panel STRING, name STRING, power DOUBLE",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        return {
            (int(r["w"].start.timestamp()), r.panel, r.module, r.sum_power, r.deviance)
            for r in solar.anomalies(df).collect()
        }

    assert run(rows) == run(shuffled)


# ---------------------------------------------------------------------------
# Quantization and repetition-signal properties (llm_extra operators)
# ---------------------------------------------------------------------------

vector = st.lists(
    st.floats(
        min_value=-100.0, max_value=100.0, allow_nan=False, allow_infinity=False
    ),
    min_size=4,
    max_size=4,
    # max|v| must survive /127 in float64: a denormal max (e.g. 5e-324)
    # underflows scale to exactly 0.0 and the engine rightly drops the
    # unquantizable vector — keep generated vectors in the meaningful range
).filter(lambda v: max(abs(x) for x in v) >= 1e-6)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(vector, min_size=1, max_size=8))
def test_int8_quantization_properties(spark, vectors):
    """Engine quantization on arbitrary vectors: |q| <= 127, per-element
    reconstruction error <= scale/2, and the engine's (scale, q_sum, mse)
    agree with an independent numpy reimplementation."""
    import numpy as np

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vectors)], "vec_id long, v array<double>"
    )
    scale = (
        F.array_max(F.transform(F.col("v"), lambda x: F.abs(x))) / F.lit(127.0)
    ).alias("scale")
    staged = df.select("vec_id", "v", scale).filter(F.col("scale") > 0)
    q = F.transform(F.col("v"), lambda x: F.round(x / F.col("scale")))
    err = F.aggregate(
        F.zip_with(F.col("v"), q, lambda x, qq: F.pow(x - qq * F.col("scale"), 2)),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    rows = staged.select(
        "vec_id",
        "scale",
        F.aggregate(q, F.lit(0.0), lambda a, b: a + b).cast("long").alias("q_sum"),
        (err / F.size("v")).alias("mse"),
    ).collect()
    assert len(rows) == len(vectors)
    for r in rows:
        v = np.array(vectors[r.vec_id], dtype=np.float64)
        ref_scale = np.abs(v).max() / 127.0
        assert abs(r.scale - ref_scale) < 1e-12
        ref_q = np.sign(v) * np.floor(np.abs(v / ref_scale) + 0.5)
        assert np.all(np.abs(ref_q) <= 127)
        assert r.q_sum == int(ref_q.sum())
        ref_mse = float(np.mean((v - ref_q * ref_scale) ** 2))
        assert abs(r.mse - ref_mse) < 1e-9
        assert r.mse <= (r.scale / 2) ** 2 + 1e-12


words = st.lists(
    st.sampled_from(["the", "cat", "sat", "mat", "dog", "a"]),
    min_size=0,
    max_size=12,
)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(words, min_size=1, max_size=5))
def test_repetition_signals_match_python_reference(spark, docs):
    """Engine repetition signals == a direct Python reimplementation on
    arbitrary word sequences (including empty and single-word docs)."""
    from pyspark.sql import functions as F

    from kafka_streams_example_spark.operators import text as tx

    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], "doc_id long, text string"
    )
    t = tx.tokens(F.lower(F.col("text")))
    bg = tx.word_ngrams_all(F.col("text"), 2)
    stage = df.select("doc_id", t.alias("t"), bg.alias("bg"))
    rows = stage.select(
        "doc_id",
        F.size("t").alias("n"),
        F.size(F.array_distinct("t")).alias("nd"),
        F.size("bg").alias("nbg"),
        F.size(F.array_distinct("bg")).alias("nbgd"),
    ).collect()
    for r in rows:
        ws = docs[r.doc_id]
        assert r.n == len(ws)
        assert r.nd == len(set(ws))
        ref_bg = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        assert r.nbg == len(ref_bg)
        assert r.nbgd == len(set(ref_bg))


texts = st.lists(
    st.text(
        alphabet=st.sampled_from("ab c"),  # spaces included → word structure
        min_size=0,
        max_size=700,
    ),
    min_size=1,
    max_size=8,
)


@given(texts)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_chunking_tiles_and_packing_conserves(spark, docs_txt):
    """llm_extra2 invariants on randomized corpora: character chunks tile
    each doc exactly (stride-aligned starts, full coverage, correct
    lengths) and sequence packing conserves tokens and docs."""
    from kafka_streams_example_spark.queries.text import (
        _CHUNK,
        _CTX,
        _STRIDE,
        pack_shard_count,
    )

    _SHARDS = pack_shard_count(len(docs_txt))

    pdf = pd.DataFrame(
        {
            "doc_id": range(len(docs_txt)),
            "text": docs_txt,
            "lang": "en",
            "source": "src0",
            "n_chars": [len(t) for t in docs_txt],
        }
    )
    df = spark.createDataFrame(pdf)

    # --- chunking (same plan as the registry query, local input) ---
    n_chunks = F.floor((F.length("text") - F.lit(1)) / F.lit(_STRIDE))
    chunks = (
        df.filter(F.length("text") > 0)
        .select("doc_id", F.explode(F.sequence(F.lit(0).cast("long"), n_chunks)).alias("i"), "text")
        .select(
            "doc_id",
            F.col("i").cast("int").alias("chunk_id"),
            F.substring(F.col("text"), (F.col("i") * _STRIDE + 1).cast("int"), _CHUNK).alias("chunk"),
        )
        .collect()
    )
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, t in enumerate(docs_txt):
        got = sorted(by_doc.get(doc_id, []), key=lambda r: r.chunk_id)
        if not t:
            assert got == []
            continue
        expect = [t[i : i + _CHUNK] for i in range(0, len(t), _STRIDE) if i == 0 or i < len(t)]
        # formula yields floor((len-1)/stride)+1 chunks
        assert len(got) == (len(t) - 1) // _STRIDE + 1
        for j, r in enumerate(got):
            assert r.chunk == t[j * _STRIDE : j * _STRIDE + _CHUNK]
        # coverage: concatenating stride-prefixes + last chunk == text
        rebuilt = "".join(c.chunk[:_STRIDE] for c in got[:-1]) + got[-1].chunk
        assert rebuilt == t

    # --- packing conservation (registry plan needs parquet; re-derive) ---
    toks = df.select(
        "doc_id",
        (F.col("doc_id") % _SHARDS).alias("shard"),
        F.size(F.filter(F.split(F.trim(F.lower("text")), r"\s+"), lambda x: x != "")).alias("n"),
    ).collect()
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    packed = (
        df.select("doc_id", (F.col("doc_id") % _SHARDS).alias("shard"),
                  F.size(F.filter(F.split(F.trim(F.lower("text")), r"\s+"), lambda x: x != "")).alias("n"))
        .withColumn("cum_before", F.sum("n").over(w) - F.col("n"))
        .groupBy("shard", F.floor(F.col("cum_before") / _CTX).alias("seq_id"))
        .agg(F.sum("n").alias("tot"), F.count("*").alias("n_docs"))
        .collect()
    )
    assert sum(r.tot for r in packed) == sum(r.n for r in toks)
    assert sum(r.n_docs for r in packed) == len(docs_txt)


# --------------------------------------------------------------------------
# Round-3 tranche properties
# --------------------------------------------------------------------------

_twa_event = st.tuples(
    st.integers(min_value=0, max_value=3600),            # second offset
    st.integers(min_value=1, max_value=3),               # user
    # quarter values: exactly representable, sums can't flake
    st.integers(min_value=0, max_value=400).map(lambda v: v / 4.0),
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_twa_event, min_size=1, max_size=40, unique_by=lambda t: (t[0], t[1])))
def test_time_weighted_average_matches_python_reference(spark, events):
    """TWA must equal the brute-force piecewise-constant integral computed
    independently in Python (last obs weightless; zero-span → plain mean)."""
    import pandas as pd

    from kafka_streams_example_spark.queries.timeseries import time_weighted_average

    # place ts by offset via timestamp arithmetic (hypothesis gives seconds)
    pdf = pd.DataFrame(
        [
            (i, pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=sec), uid, "e", val, "")
            for i, (sec, uid, val) in enumerate(events)
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(pdf).write.parquet(td + "/events.parquet")
        got = {r.user_id: r.twa_value for r in time_weighted_average(spark, td).collect()}

    for uid, grp in pdf.groupby("user_id"):
        g = grp.sort_values(["ts", "event_id"])
        t = g["ts"].astype("int64").to_numpy() // 1000  # ns → us
        v = g["value"].to_numpy()
        if t[-1] == t[0]:
            expect = float(v.mean())
        else:
            span = float(t[-1] - t[0])
            expect = float(sum(v[i] * ((t[i + 1] - t[i]) / span) for i in range(len(t) - 1)))
        assert got[uid] == pytest.approx(expect, abs=1.5e-6), uid


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=25,
    )
)
def test_blast_radius_matches_python_bfs(spark, edges):
    """The recursive-CTE hop-capped closure must equal an independent
    Python BFS (≤3 hops, min distance) on random graphs."""
    from collections import deque

    from pyspark.sql import functions as F

    pairs = spark.createDataFrame(
        [(min(u, v), max(u, v)) for u, v in edges], "id_a LONG, id_b LONG"
    ).dropDuplicates()
    pairs.createOrReplaceTempView("__blast_edges")
    got = {
        (r.seed, r.doc_id): r.hops
        for r in spark.sql(
            """
            WITH RECURSIVE
            und AS (SELECT id_a AS u, id_b AS v FROM __blast_edges
                    UNION SELECT id_b, id_a FROM __blast_edges),
            reach(seed, id, hops) AS (
                SELECT u, u, 0 FROM (SELECT DISTINCT u FROM und) s
                UNION ALL
                SELECT r.seed, e.v, r.hops + 1
                FROM reach r JOIN und e ON e.u = r.id
                WHERE r.hops < 3
            )
            SELECT seed, id AS doc_id, CAST(min(hops) AS INT) AS hops
            FROM reach WHERE seed <> id GROUP BY 1, 2
            """
        ).collect()
    }

    adj: dict[int, set[int]] = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    expect = {}
    for seed in adj:
        dist = {seed: 0}
        q = deque([seed])
        while q:
            cur = q.popleft()
            if dist[cur] >= 3:
                continue
            for nxt in adj.get(cur, ()):
                if nxt not in dist:
                    dist[nxt] = dist[cur] + 1
                    q.append(nxt)
        for node, d in dist.items():
            if node != seed:
                expect[(seed, node)] = d
    assert got == expect


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 999),
                  st.floats(0, 1, allow_nan=False, width=32)),
        min_size=1,
        max_size=120,
    )
)
def test_local_topk_superset_preserves_global_topk(spark, rows):
    """_local_topk_per_batch must never drop a row that belongs to the
    global top-k under (score desc, id asc) — on any random frame and any
    partitioning."""
    from pyspark.sql import Window

    from kafka_streams_example_spark.operators.similarity import _local_topk_per_batch

    df = spark.createDataFrame(
        [(q, float(s), c) for q, c, s in rows], "q_id LONG, score DOUBLE, vec_id LONG"
    ).repartition(3)
    k = 5
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("vec_id").asc())

    def topk(frame):
        return {
            (r.q_id, r.vec_id, r.rnk)
            for r in frame.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .collect()
        }

    assert topk(_local_topk_per_batch(df, k, c_col="vec_id")) == topk(df)


_scd_event = st.tuples(
    st.integers(min_value=0, max_value=300),             # second offset
    st.integers(min_value=1, max_value=3),               # user
    st.sampled_from(["on", "off", "idle"]),              # state
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_scd_event, min_size=1, max_size=40, unique_by=lambda t: (t[0], t[1])))
def test_scd2_partitions_timeline_and_matches_python_collapse(spark, events):
    """SCD2 output must partition each user's event timeline: versions are
    contiguous from 1, ranges chain exactly (valid_to == next valid_from,
    last open), consecutive states differ, n_events conserves, and the
    (state, n_events) run-length sequence equals a Python collapse."""
    import tempfile

    import pandas as pd

    from kafka_streams_example_spark.queries.operational import scd2_user_state

    pdf = pd.DataFrame(
        [
            (i, pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=sec), uid, s, 1.0, "")
            for i, (sec, uid, s) in enumerate(events)
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(pdf).write.parquet(td + "/events.parquet")
        rows = scd2_user_state(spark, td).collect()

    for uid, grp in pdf.groupby("user_id"):
        g = grp.sort_values(["ts", "event_id"])
        runs = []
        for s in g["event_type"]:
            if runs and runs[-1][0] == s:
                runs[-1][1] += 1
            else:
                runs.append([s, 1])
        got = sorted((r for r in rows if r.user_id == uid), key=lambda r: r.version)
        assert [r.version for r in got] == list(range(1, len(runs) + 1))
        assert [[r.state, r.n_events] for r in got] == runs
        for a, b in zip(got, got[1:]):
            assert a.valid_to == b.valid_from and a.state != b.state
        assert got[-1].valid_to is None
        assert sum(r.n_events for r in got) == len(g)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.integers(min_value=-200, max_value=200).map(lambda v: v / 4.0),
        min_size=2,
        max_size=60,
    )
)
def test_median_mad_matches_python_reference(spark, values):
    """Exact median and MAD must equal Python's statistics.median (midpoint
    interpolation) on arbitrary value sets, and every flagged outlier must
    actually breach the 3·1.4826·MAD fence."""
    import statistics
    import tempfile

    import pandas as pd

    from kafka_streams_example_spark.queries.stats import median_mad_outliers

    pdf = pd.DataFrame(
        [
            (i, pd.Timestamp("2024-01-01"), 1, "a", v, "")
            for i, v in enumerate(values)
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(pdf).write.parquet(td + "/events.parquet")
        (r,) = median_mad_outliers(spark, td).collect()

    med = statistics.median(values)
    adev = [abs(v - med) for v in values]
    mad = statistics.median(adev)
    assert r.med == pytest.approx(round(med, 6), abs=1e-9)
    assert r.mad == pytest.approx(round(mad, 6), abs=1e-9)
    assert r.n_outliers == sum(1 for d in adev if d > 3 * 1.4826 * mad)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 120)),  # (cust, day offset)
        min_size=1,
        max_size=25,
    )
)
def test_order_window_overlaps_matches_bruteforce(spark, orders):
    """Overlap pair counts must equal the O(n²) Python check on the same
    30-day windows."""
    import itertools
    import tempfile

    import pandas as pd

    from kafka_streams_example_spark.queries.events import order_window_overlaps

    pdf = pd.DataFrame(
        [
            (k, cust, "O", 1.0, pd.Timestamp("2024-01-01") + pd.Timedelta(days=day), "LOW")
            for k, (cust, day) in enumerate(orders)
        ],
        columns=[
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        ],
    )
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(pdf).write.parquet(td + "/orders.parquet")
        got = {r.custkey: r.n_overlapping_pairs
               for r in order_window_overlaps(spark, td).collect()}

    expect: dict[int, int] = {}
    for cust, grp in pdf.groupby("o_custkey"):
        n = 0
        for (_, a), (_, b) in itertools.combinations(grp.iterrows(), 2):
            sa, ea = a.o_orderdate, a.o_orderdate + pd.Timedelta(days=29)
            sb, eb = b.o_orderdate, b.o_orderdate + pd.Timedelta(days=29)
            if sa <= eb and sb <= ea:
                n += 1
        if n:
            expect[cust] = n
    assert got == expect


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(st.integers(1, 5), st.integers(0, 6)),  # (user, week offset)
        min_size=1,
        max_size=30,
    )
)
def test_cohort_retention_conserves_activity(spark, pairs):
    """Retention cells must sum to the number of distinct (user, week)
    pairs; week-0 retention is 1.0 in every cohort; every cell retention
    is in (0, 1]."""
    import tempfile

    import pandas as pd

    from kafka_streams_example_spark.queries.events import cohort_retention

    pdf = pd.DataFrame(
        [
            (i, pd.Timestamp("2024-01-01") + pd.Timedelta(weeks=wk, hours=1), uid,
             "view", 1.0, "")
            for i, (uid, wk) in enumerate(pairs)
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(pdf).write.parquet(td + "/events.parquet")
        rows = cohort_retention(spark, td).collect()

    distinct_uw = len({(uid, wk) for uid, wk in pairs})
    assert sum(r.n_active for r in rows) == distinct_uw
    for r in rows:
        assert 0.0 < r.retention <= 1.0
        if r.week_offset == 0:
            assert r.retention == 1.0


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.text(alphabet="abc ", min_size=0, max_size=30),
        min_size=2,
        max_size=20,
    )
)
def test_banded_levenshtein_matches_bruteforce(spark, texts):
    """The 3-band equi-join candidate generation must yield EXACTLY the
    brute-force O(n²) pair set (banding is complete for the length
    tolerance and each pair matches exactly once — no misses from band
    boundaries, no duplicates from the probe explode)."""
    import itertools
    import tempfile

    from kafka_streams_example_spark.queries.dedup import (
        _LEN_TOL,
        _LEV_MAX,
        neardup_levenshtein_pairs,
    )

    rows = [(i, t, "en", "w", len(t)) for i, t in enumerate(texts)]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
        ).write.parquet(td + "/documents.parquet")
        got = {(r.id_a, r.id_b): r.edit_dist
               for r in neardup_levenshtein_pairs(spark, td).collect()}

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    expect = {}
    for (i, a), (j, b) in itertools.combinations(enumerate(texts), 2):
        if abs(len(a) - len(b)) <= _LEN_TOL:
            d = lev(a, b)
            if d <= _LEV_MAX:
                expect[(i, j)] = d
    assert got == expect


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(st.integers(1, 3), st.sampled_from(["a", "b", "c", "d"])),
        min_size=2,
        max_size=40,
    )
)
def test_transition_matrix_is_row_stochastic_and_conserves(spark, events):
    """Per-cur transition probabilities must sum to 1 and total
    transition count must equal n_events - n_users (each user's chain
    has len-1 edges)."""
    import tempfile

    import pandas as pd

    from kafka_streams_example_spark.queries.events import event_transition_matrix

    pdf = pd.DataFrame(
        [
            (i, pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=i), uid, s, 1.0, "")
            for i, (uid, s) in enumerate(events)
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(pdf).write.parquet(td + "/events.parquet")
        rows = event_transition_matrix(spark, td).collect()

    n_users = pdf["user_id"].nunique()
    assert sum(r.n for r in rows) == len(pdf) - n_users
    by_cur: dict[str, float] = {}
    for r in rows:
        by_cur[r.cur] = by_cur.get(r.cur, 0.0) + r.p
    for cur, total in by_cur.items():
        assert total == pytest.approx(1.0, abs=2e-6), cur


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 7200),
                  st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=40,
        unique_by=lambda t: (t[0], t[1]),
    )
)
def test_session_paths_match_python_sessionizer(spark, events):
    """Session paths must equal an independent Python sessionization
    (30-min gap, first-3 truncation) — with the min-support filter
    applied to both sides."""
    import tempfile
    from collections import Counter

    import pandas as pd

    from kafka_streams_example_spark.queries.events import (
        _PATH_MIN_SESSIONS,
        _SESSION_GAP_MIN,
        top_session_paths,
    )

    pdf = pd.DataFrame(
        [
            (i, pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=sec), uid, et, 1.0, "")
            for i, (uid, sec, et) in enumerate(events)
        ],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(pdf).write.parquet(td + "/events.parquet")
        got = {r.path: r.n_sessions for r in top_session_paths(spark, td).collect()}

    paths: Counter = Counter()
    for _, grp in pdf.groupby("user_id"):
        g = grp.sort_values(["ts", "event_id"])
        cur: list[str] = []
        prev = None
        for _, row in g.iterrows():
            if prev is not None and (row.ts - prev).total_seconds() > _SESSION_GAP_MIN * 60:
                paths[">".join(cur[:3])] += 1
                cur = []
            cur.append(row.event_type)
            prev = row.ts
        if cur:
            paths[">".join(cur[:3])] += 1
    expect = {p: n for p, n in paths.items() if n >= _PATH_MIN_SESSIONS}
    assert got == expect


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(1, 5)),  # (order, part)
        min_size=1,
        max_size=40,
    )
)
def test_basket_lift_matches_bruteforce(spark, items):
    """Pair counts and lift must equal the brute-force basket math
    (dedup to distinct (order, part) first, min-support 3)."""
    import itertools
    import tempfile

    import pandas as pd

    from kafka_streams_example_spark.queries.events import (
        _BASKET_MIN_PAIRS,
        basket_part_pairs_lift,
    )

    pdf = pd.DataFrame(
        [
            (o, p, 1, i, 1.0, 1.0, 0.0, 0.0, "N", "O", pd.Timestamp("2024-01-01"))
            for i, (o, p) in enumerate(items)
        ],
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus", "l_shipdate",
        ],
    )
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(pdf).write.parquet(td + "/lineitem.parquet")
        got = {(r.part_a, r.part_b): (r.pair_n, r.lift)
               for r in basket_part_pairs_lift(spark, td).collect()}

    baskets = {o: sorted(set(g["l_partkey"])) for o, g in pdf.groupby("l_orderkey")}
    n_orders = len(baskets)
    freq: dict[int, int] = {}
    for parts in baskets.values():
        for p in parts:
            freq[p] = freq.get(p, 0) + 1
    pair_n: dict[tuple, int] = {}
    for parts in baskets.values():
        for a, b in itertools.combinations(parts, 2):
            pair_n[(a, b)] = pair_n.get((a, b), 0) + 1
    expect = {
        k: (n, round(n * n_orders / (freq[k[0]] * freq[k[1]]), 6))
        for k, n in pair_n.items()
        if n >= _BASKET_MIN_PAIRS
    }
    assert got == expect
