"""Semantics pins for the advanced-analytics operators (timeseries, sketches,
skyline, fuzzy, ranking) against hand-computed / brute-force baselines.
Cross-engine value checks live in test_queries_oracle.py via the registry."""

import datetime
import math

import pytest
from pyspark.sql import Row, functions as F

from custom_columnar_format_spark.operators import (
    fuzzy,
    ranking,
    sketches,
    skyline,
    timeseries,
)


def ts(day: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, day, 12, 0, 0)


class TestGapfill:
    def _toy(self, spark):
        # key "a": days 1, 4 observed; key "b": day 2 only
        return spark.createDataFrame(
            [
                Row(k="a", t=ts(1), v=10.0),
                Row(k="a", t=ts(1), v=5.0),
                Row(k="a", t=ts(4), v=7.0),
                Row(k="b", t=ts(2), v=1.0),
            ]
        )

    def test_ffill_carries_last_observed(self, spark):
        out = timeseries.gapfill_ffill(self._toy(spark), "t", "k", "v")
        rows = {(r["grp"], str(r["day"])): r for r in out.collect()}
        # full spine: both keys × days 1..4
        assert len(rows) == 8
        assert rows[("a", "2024-01-01")]["revenue_filled"] == 15.0
        assert rows[("a", "2024-01-02")]["revenue_filled"] == 15.0  # filled
        assert rows[("a", "2024-01-02")]["is_gap"] == 1
        assert rows[("a", "2024-01-04")]["revenue_filled"] == 7.0
        assert rows[("b", "2024-01-01")]["revenue_filled"] is None  # before first obs
        assert rows[("b", "2024-01-04")]["revenue_filled"] == 1.0

    def test_interpolation_is_linear_between_neighbors(self, spark):
        out = timeseries.interpolate_linear(self._toy(spark), "t", "k", "v")
        rows = {(r["grp"], str(r["day"])): r for r in out.collect()}
        # a: 15.0 on day1, 7.0 on day4 → day2 = 15 + (7-15)*1/3, day3 = 15 + (7-15)*2/3
        assert rows[("a", "2024-01-02")]["value_interp"] == pytest.approx(15 - 8 / 3, abs=1e-6)
        assert rows[("a", "2024-01-03")]["value_interp"] == pytest.approx(15 - 16 / 3, abs=1e-6)
        assert rows[("a", "2024-01-01")]["is_gap"] == 0
        # b has no right neighbor after day2 → ends stay null
        assert rows[("b", "2024-01-04")]["value_interp"] is None


class TestCountMinSketch:
    def test_exact_when_no_collisions_and_overestimate_always(self, spark):
        import collections

        items = [f"item_{i}" for i in range(50) for _ in range(i % 5 + 1)]
        truth = collections.Counter(items)
        df = spark.createDataFrame([Row(tok=t) for t in items])
        est = {
            r["tok"]: r["est"]
            for r in sketches.cms_estimate(
                sketches.cms_build(df, "tok"), df.select("tok").distinct(), "tok"
            ).collect()
        }
        assert set(est) == set(truth)
        for t, c in truth.items():
            assert est[t] >= c  # CMS never underestimates
        # with 50 distinct items in 4×256 cells, min-of-rows is exact w.h.p.
        assert sum(est[t] == c for t, c in truth.items()) >= 48

    def test_heavy_hitters_order_and_tiebreak(self, spark):
        df = spark.createDataFrame(
            [Row(tok=t) for t in ["x"] * 5 + ["y"] * 5 + ["z"] * 9]
        )
        top = sketches.cms_heavy_hitters(df, "tok", topk=2).collect()
        assert [r["tok"] for r in top] == ["z", "x"]  # tie x/y broken by value


class TestSkyline:
    def test_matches_bruteforce_dominance(self, spark):
        import random

        rng = random.Random(7)
        pts = [(i, rng.randint(0, 50) / 2.0, rng.randint(1, 40)) for i in range(300)]
        # inject exact duplicates — both must survive if on the frontier
        pts += [(1000, pts[0][1], pts[0][2]), (1001, pts[1][1], pts[1][2])]
        df = spark.createDataFrame(pts, ["id", "price", "size"])
        got = sorted(r["id"] for r in skyline.skyline_2d(df, "price", "size").collect())
        want = sorted(
            i
            for i, p, s in pts
            if not any(
                (p2 <= p and s2 >= s and (p2 < p or s2 > s)) for _, p2, s2 in pts
            )
        )
        assert got == want


class TestFuzzy:
    def test_pairs_match_bruteforce_levenshtein(self, spark):
        names = [
            (1, "red bolt"),
            (2, "hot bolt"),
            (3, "blue bolt"),
            (4, "red widget"),
            (5, "rad bolt"),
        ]
        df = spark.createDataFrame(names, ["id", "name"])
        got = {
            (r["id_a"], r["id_b"]): r["dist"]
            for r in fuzzy.fuzzy_name_pairs(
                df, "name", "id", F.element_at(F.split(F.col("name"), " "), 2), max_dist=3
            ).collect()
        }

        def lev(a, b):
            import functools

            @functools.lru_cache(maxsize=None)
            def d(i, j):
                if i == 0:
                    return j
                if j == 0:
                    return i
                return min(
                    d(i - 1, j) + 1,
                    d(i, j - 1) + 1,
                    d(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
                )

            return d(len(a), len(b))

        want = {
            (i1, i2): lev(n1, n2)
            for i1, n1 in names
            for i2, n2 in names
            if i1 < i2 and n1.split()[-1] == n2.split()[-1] and lev(n1, n2) <= 3
        }
        assert got == want
        assert (1, 4) not in got  # different block, never compared

    def test_oversized_block_dropped(self, spark):
        df = spark.createDataFrame(
            [(i, f"v{i} same") for i in range(10)], ["id", "name"]
        )
        out = fuzzy.fuzzy_name_pairs(
            df, "name", "id", F.lit("same"), max_dist=99, max_block=5
        )
        assert out.count() == 0  # block of 10 > cap 5


class TestBM25:
    def test_hand_computed_score(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "apple banana apple"),
                (2, "banana cherry"),
                (3, "cherry cherry cherry cherry"),
            ],
            ["doc_id", "text"],
        )
        out = {
            r["doc_id"]: r["score"]
            for r in ranking.bm25_topk(docs, ["apple"], topk=3).collect()
        }
        # only doc 1 contains 'apple': tf=2, dl=3, N=3, avgdl=3, df=1
        k1, b = 1.2, 0.75
        idf = math.log(1.0 + (3 - 1 + 0.5) / (1 + 0.5))
        want = idf * (2 * (k1 + 1)) / (2 + k1 * (1 - b + b * 3 / 3))
        assert out == {1: pytest.approx(round(want, 6), abs=1e-6)}

    def test_ranking_prefers_rarer_terms_and_breaks_ties_by_id(self, spark):
        docs = spark.createDataFrame(
            [(1, "rare word"), (2, "common word"), (3, "common word"), (4, "common filler")],
            ["doc_id", "text"],
        )
        got = [r["doc_id"] for r in ranking.bm25_topk(docs, ["rare", "common"], topk=4).collect()]
        assert got[0] == 1  # 'rare' has higher idf
        assert got[1:] == [2, 3, 4]  # equal-score docs tie-broken by id


class TestTriangles:
    def test_matches_bruteforce_enumeration(self, spark):
        import itertools
        import random

        rng = random.Random(3)
        nodes = list(range(12))
        edges = sorted(
            {tuple(sorted(rng.sample(nodes, 2))) for _ in range(30)}
        )
        df = spark.createDataFrame(edges, ["a", "b"])
        from custom_columnar_format_spark.operators import graph

        got = sorted(
            (r["na"], r["nb"], r["nc"]) for r in graph.triangles(df).collect()
        )
        es = set(edges)
        want = sorted(
            (x, y, z)
            for x, y, z in itertools.combinations(nodes, 3)
            if (x, y) in es and (y, z) in es and (x, z) in es
        )
        assert got == want


class TestRollingMedianAndWeightedSample:
    def test_rolling_median_matches_numpy(self, spark, sf_small):
        import numpy as np

        from custom_columnar_format_spark.queries.analytics import q_rolling_median_7d
        from custom_columnar_format_spark.queries.tables import load
        from pyspark.sql import functions as F

        got = {
            (r["event_type"], r["day"]): r["med7"]
            for r in q_rolling_median_7d(spark, sf_small).collect()
        }
        daily = (
            load(spark, sf_small, "events")
            .select("event_type", F.date_trunc("day", "ts").cast("date").alias("day"), "value")
            .groupBy("event_type", "day")
            .agg(F.round(F.sum("value"), 6).alias("rev"))
            .collect()
        )
        series = {}
        for r in sorted(daily, key=lambda r: (r["event_type"], r["day"])):
            series.setdefault(r["event_type"], []).append((str(r["day"]), r["rev"]))
        for et, pts in series.items():
            for i, (day, _) in enumerate(pts):
                frame = [v for _, v in pts[max(0, i - 6) : i + 1]]
                assert got[(et, day)] == pytest.approx(
                    round(float(np.median(frame)), 6), abs=1e-6
                )

    def test_weighted_sample_partition_invariant_and_biased_to_weight(self, spark, sf_small):
        from custom_columnar_format_spark.queries.analytics import q_weighted_sample_ares

        a = [r["doc_id"] for r in q_weighted_sample_ares(spark, sf_small).collect()]
        b = [
            r["doc_id"]
            for r in q_weighted_sample_ares(spark, sf_small).collect()
        ]
        assert a == b  # deterministic

    def test_weighted_sample_biased_to_weight_and_excludes_nonpositive(self, spark):
        from custom_columnar_format_spark.operators import sampling

        # 100 heavy docs (w=5000) among 400 light (w=5): a top-50 A-ES draw
        # should be dominated by heavy ids, and w<=0 rows must never appear
        rows = [(i, 5000 if i < 100 else 5) for i in range(500)] + [(900, 0), (901, -3)]
        df = spark.createDataFrame(rows, ["id", "w"])
        got = [r["id"] for r in sampling.weighted_sample(df, "id", "w", 50).collect()]
        assert len(got) == 50
        assert not {900, 901} & set(got)
        assert sum(1 for i in got if i < 100) >= 40  # heavy ids dominate


class TestEmptyInputs:
    """The analytics tier must degrade to empty outputs, not crash, when the
    filtered input is empty (a real pipeline hits this on a quiet partition)."""

    def test_all_operators_empty_safe(self, spark):
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StringType,
            StructField,
            StructType,
            TimestampType,
        )

        from custom_columnar_format_spark.operators import graph, sampling

        empty_ts = spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("k", StringType()),
                    StructField("t", TimestampType()),
                    StructField("v", DoubleType()),
                ]
            ),
        )
        assert timeseries.gapfill_ffill(empty_ts, "t", "k", "v").count() == 0
        assert timeseries.interpolate_linear(empty_ts, "t", "k", "v").count() == 0

        empty_docs = spark.createDataFrame(
            [], StructType([StructField("doc_id", LongType()), StructField("text", StringType())])
        )
        assert ranking.bm25_topk(empty_docs, ["x"], topk=5).count() == 0

        empty_tok = spark.createDataFrame([], StructType([StructField("tok", StringType())]))
        assert sketches.cms_heavy_hitters(empty_tok, "tok").count() == 0

        empty_pts = spark.createDataFrame(
            [], StructType([StructField("p", DoubleType()), StructField("s", LongType())])
        )
        assert skyline.skyline_2d(empty_pts, "p", "s").count() == 0

        empty_named = spark.createDataFrame(
            [], StructType([StructField("id", LongType()), StructField("name", StringType())])
        )
        assert (
            fuzzy.fuzzy_name_pairs(
                empty_named, "name", "id", F.element_at(F.split(F.col("name"), " "), 1)
            ).count()
            == 0
        )

        empty_edges = spark.createDataFrame(
            [], StructType([StructField("a", LongType()), StructField("b", LongType())])
        )
        assert graph.triangles(empty_edges).count() == 0

        empty_w = spark.createDataFrame(
            [], StructType([StructField("id", LongType()), StructField("w", LongType())])
        )
        assert sampling.weighted_sample(empty_w, "id", "w", 5).count() == 0


class TestGapfillProperty:
    def test_gapfill_matches_python_reference_on_random_series(self, spark):
        """Property-style pin (fixed seeds, many shapes): gapfill_ffill over
        random sparse (key, day, value) observations equals a pure-Python
        forward-fill over the same dense spine."""
        import random as _random

        for seed in range(8):
            rng = _random.Random(seed)
            n_keys = rng.randint(1, 4)
            obs = []
            for k in range(n_keys):
                for _ in range(rng.randint(1, 6)):
                    obs.append(
                        (f"k{k}", ts(rng.randint(1, 12)), float(rng.randint(-5, 50)))
                    )
            df = spark.createDataFrame(obs, ["k", "t", "v"])
            got = {
                (r["grp"], str(r["day"])): (r["revenue_filled"], r["is_gap"])
                for r in timeseries.gapfill_ffill(df, "t", "k", "v").collect()
            }

            days = sorted({t.date() for _, t, _ in obs})
            lo, hi = days[0], days[-1]
            spine = []
            d = lo
            while d <= hi:
                spine.append(d)
                d += datetime.timedelta(days=1)
            cells = {}
            for k, t, v in obs:
                cells[(k, t.date())] = round(cells.get((k, t.date()), 0.0) + v, 6)
            want = {}
            for k in {k for k, _, _ in obs}:
                last = None
                for d in spine:
                    if (k, d) in cells:
                        last = cells[(k, d)]
                        want[(k, str(d))] = (last, 0)
                    else:
                        want[(k, str(d))] = (last, 1)
            assert got.keys() == want.keys(), f"seed {seed}: spine mismatch"
            for key in want:
                gv, gg = got[key]
                wv, wg = want[key]
                assert gg == wg, f"seed {seed} {key}: is_gap"
                if wv is None:
                    assert gv is None, f"seed {seed} {key}"
                else:
                    assert gv == pytest.approx(wv, abs=1e-6), f"seed {seed} {key}"


class TestBinsAndMI:
    def test_equidepth_bins_are_depth_balanced(self, spark, sf_small):
        from custom_columnar_format_spark.queries.analytics import q_equidepth_bins

        rows = q_equidepth_bins(spark, sf_small).collect()
        assert len(rows) == 10
        total = sum(r["n"] for r in rows)
        for r in rows:
            # equi-depth: every decile within 2% of total/10 (ties can shift rows)
            assert abs(r["n"] - total / 10) <= max(2, total * 0.02)
        # bins are ordered, contiguous value ranges
        srt = sorted(rows, key=lambda r: r["bin"])
        for a, b in zip(srt, srt[1:]):
            assert a["hi"] <= b["lo"]

    def test_mutual_info_zero_for_independent_and_positive_for_dependent(self, spark):
        from pyspark.sql import functions as F

        # perfectly dependent: y == x → MI = H(x) = ln(2) for a fair binary x
        dep = spark.createDataFrame([(i, "a" if i % 2 else "b") for i in range(100)], ["i", "x"])
        dep = dep.select("x", F.col("x").alias("y"))
        joint = dep.groupBy("x", "y").agg(F.count(F.lit(1)).alias("nxy"))
        mx = joint.groupBy("x").agg(F.sum("nxy").alias("nx"))
        my = joint.groupBy("y").agg(F.sum("nxy").alias("ny"))
        tot = joint.agg(F.sum("nxy").alias("n"))
        term = (F.col("nxy").cast("double") / F.col("n")) * F.log(
            (F.col("nxy").cast("double") * F.col("n")) / (F.col("nx").cast("double") * F.col("ny"))
        )
        mi = (
            joint.join(mx, "x").join(my, "y").join(F.broadcast(tot))
            .agg(F.sum(term).alias("mi"))
            .first()["mi"]
        )
        assert mi == pytest.approx(math.log(2), abs=1e-9)


class TestFunnelK:
    def test_window_gating_and_lags(self, spark):
        from custom_columnar_format_spark.operators import funnel

        def t(h):
            return datetime.datetime(2024, 1, 1, 0, 0, 0) + datetime.timedelta(hours=h)

        rows = [
            # u1 completes all four stages; click 2h after view, signup 3h
            # after click, purchase 1h after signup
            (1, t(0), "view"), (1, t(2), "click"), (1, t(5), "signup"), (1, t(6), "purchase"),
            # u2: click arrives 30h after view — outside the 24h step window
            (2, t(0), "view"), (2, t(30), "click"),
            # u3: signup BEFORE the click → doesn't qualify as stage 3
            (3, t(0), "view"), (3, t(1), "signup"), (3, t(2), "click"),
            # u4 never views; later events can't start a chain
            (4, t(0), "click"), (4, t(1), "signup"),
        ]
        ev = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
        out = funnel.funnel_summary(ev, ["view", "click", "signup", "purchase"]).first()
        assert (out["stage_1"], out["stage_2"], out["stage_3"], out["stage_4"]) == (3, 2, 1, 1)
        assert out["lag_h_2"] == pytest.approx(2.0)  # only u1's click qualifies... plus u3's
        assert out["lag_h_3"] == pytest.approx(3.0)
        assert out["lag_h_4"] == pytest.approx(1.0)


class TestCMSScheme:
    def test_xxhash64_fast_path_same_guarantees(self, spark):
        import collections

        # distinct counts (1..40) so the true heavy hitter is unambiguous
        items = [f"k{i}" for i in range(40) for _ in range(i + 1)]
        truth = collections.Counter(items)
        df = spark.createDataFrame([(t,) for t in items], ["tok"])
        est = {
            r["tok"]: r["est"]
            for r in sketches.cms_estimate(
                sketches.cms_build(df, "tok", scheme="xxhash64"),
                df.select("tok").distinct(),
                "tok",
                scheme="xxhash64",
            ).collect()
        }
        assert set(est) == set(truth)
        for t, c in truth.items():
            assert est[t] >= c  # overestimate invariant holds for any scheme
        top = sketches.cms_heavy_hitters(df, "tok", topk=1, scheme="xxhash64").first()
        # the true heaviest key must win (40 keys in 4×256 cells: a key would
        # need a colliding heavier partner in ALL 4 rows to be displaced)
        assert truth[top["tok"]] == max(truth.values())


class TestCMSAbsentCandidate:
    def test_absent_candidate_estimates_zero(self, spark):
        from pyspark.sql import Row

        build = spark.createDataFrame([Row(tok=t) for t in ["a"] * 3 + ["b"] * 2])
        cand = spark.createDataFrame([Row(tok=t) for t in ["a", "zzz_never_seen"]])
        est = {
            r["tok"]: r["est"]
            for r in sketches.cms_estimate(sketches.cms_build(build, "tok"), cand, "tok").collect()
        }
        assert est["a"] >= 3
        assert est["zzz_never_seen"] == 0  # absent item: 0, not dropped/overestimated


def test_ewma_hand_computed(spark):
    """EWMA against hand-computed adjust=True values (alpha=0.5, window=7):
    short frames renormalize over what exists."""
    from custom_columnar_format_spark.operators import timeseries

    rows = [("k", 1, 1.0), ("k", 2, 3.0), ("k", 3, 5.0)]
    df = spark.createDataFrame(rows, ["key", "t", "v"])
    got = {
        r["t"]: r["v_ewma"]
        for r in timeseries.ewma(df, "key", "t", "v", alpha=0.5, window=7).collect()
    }
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx((0.5 * 1 + 1 * 3) / 1.5)
    assert got[3] == pytest.approx((0.25 * 1 + 0.5 * 3 + 1 * 5) / 1.75)


def test_ewma_window_truncation(spark):
    """Only the last `window` rows contribute: with window=2 the oldest value
    must not affect the third point at all."""
    from custom_columnar_format_spark.operators import timeseries

    rows = [("k", 1, 100.0), ("k", 2, 2.0), ("k", 3, 4.0)]
    df = spark.createDataFrame(rows, ["key", "t", "v"])
    got = {
        r["t"]: r["v_ewma"]
        for r in timeseries.ewma(df, "key", "t", "v", alpha=0.5, window=2).collect()
    }
    assert got[3] == pytest.approx((0.5 * 2 + 1 * 4) / 1.5)
