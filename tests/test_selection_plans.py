"""Tests for the data-selection & diagnostics tier
(plans/selection_plans.py): MMR re-ranking, k-center coreset, Holt
linear smoothing, chi-squared dependence — each replayed against an
independent sequential implementation (numpy / pure python).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from dww_data_pipeline_spark.plans.registry import REGISTRY, all_queries
from dww_data_pipeline_spark.sources.catalog import load_table


@pytest.fixture(scope="module", autouse=True)
def _loaded():
    all_queries()


def _quantized_np(spark, sf_dir) -> dict[int, np.ndarray]:
    """e2's int8 quantization replayed in numpy double math."""
    rows = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    out = {}
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        mn, mx = float(v.min()), float(v.max())
        if mx == mn:
            q = np.zeros(len(v), dtype=np.int64)
        else:
            q = np.floor((v - mn) * 255 / (mx - mn)).astype(np.int64) - 128
        out[int(r["vec_id"])] = q
    return out


class TestMmrRerank:
    def test_matches_sequential_greedy(self, spark, sf_dir):
        """Full selection (ids, steps, scores) equals a from-scratch
        sequential MMR over the same integer codes."""
        qv = _quantized_np(spark, sf_dir)
        want = []
        for qid in (0, 1, 2):
            q = qv[qid]
            rel = {i: int(v @ q) for i, v in qv.items() if i != qid}
            pool = sorted(rel, key=lambda i: (-rel[i], i))[:12]
            selected: list[int] = []
            for step in range(1, 5):
                best = None
                for c in pool:
                    if c in selected:
                        continue
                    ms = max((int(qv[c] @ qv[s]) for s in selected), default=0)
                    key = (-(rel[c] - ms), c)
                    if best is None or key < best[0]:
                        best = (key, c, ms)
                _, c, ms = best
                selected.append(c)
                want.append((qid, step, c, rel[c], ms, rel[c] - ms))
        got = sorted(
            (
                r["query_id"],
                r["step"],
                r["vec_id"],
                r["rel_dot"],
                r["max_sim_dot"],
                r["mmr2"],
            )
            for r in REGISTRY["s16_mmr_rerank"].spark(spark, sf_dir).collect()
        )
        assert got == sorted(want)

    def test_diversity_tradeoff_shape(self, spark, sf_dir):
        """Per query: 4 distinct picks; step 1 is the pure-relevance
        argmax (max_sim_dot = 0); mmr2 is the exact integer margin.
        (max_sim_dot CAN be negative — signed codes — so mmr2 may
        exceed rel_dot; no inequality is asserted between them.)"""
        rows = REGISTRY["s16_mmr_rerank"].spark(spark, sf_dir).collect()
        by_q: dict[int, list] = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        assert set(by_q) == {0, 1, 2}
        for q, rs in by_q.items():
            assert sorted(r["step"] for r in rs) == [1, 2, 3, 4]
            assert len({r["vec_id"] for r in rs}) == 4
            first = next(r for r in rs if r["step"] == 1)
            assert first["max_sim_dot"] == 0
            assert first["rel_dot"] == max(r["rel_dot"] for r in rs)
            for r in rs:
                assert r["mmr2"] == r["rel_dot"] - r["max_sim_dot"]


class TestKcenterCoreset:
    def test_matches_sequential_gonzalez(self, spark, sf_dir):
        """Selection order, distances, radii, and cell census equal a
        from-scratch farthest-point traversal."""
        qv = _quantized_np(spark, sf_dir)
        ids = sorted(qv)
        centers = [ids[0]]
        mind = {i: int(np.sum((qv[i] - qv[ids[0]]) ** 2)) for i in ids}
        want = [(1, ids[0], 0)]
        for step in range(2, 9):
            far = min(ids, key=lambda i: (-mind[i], i))
            want.append((step, far, mind[far]))
            for i in ids:
                mind[i] = min(mind[i], int(np.sum((qv[i] - qv[far]) ** 2)))
        radius = {s: d for s, _, d in want}
        final_radius = max(mind.values())
        census: dict[int, int] = {}
        for i in ids:
            best = min(
                range(1, 9),
                key=lambda s: (int(np.sum((qv[i] - qv[want[s - 1][1]]) ** 2)), s),
            )
            census[best] = census.get(best, 0) + 1
        got = sorted(
            (
                r["step"],
                r["center_id"],
                r["sel_dist_sq"],
                r["radius_sq_after"],
                r["n_assigned"],
            )
            for r in REGISTRY["e11_kcenter_coreset"].spark(spark, sf_dir).collect()
        )
        exp = sorted(
            (s, c, d, radius.get(s + 1, final_radius), census.get(s, 0))
            for s, c, d in want
        )
        assert got == exp

    def test_greedy_invariants(self, spark, sf_dir):
        """Covering radius is non-increasing; the census covers every
        vector; each step's radius_sq_after <= its sel_dist_sq."""
        rows = sorted(
            REGISTRY["e11_kcenter_coreset"].spark(spark, sf_dir).collect(),
            key=lambda r: r["step"],
        )
        n_vecs = load_table(spark, sf_dir, "embeddings").count()
        assert sum(r["n_assigned"] for r in rows) == n_vecs
        dists = [r["sel_dist_sq"] for r in rows[1:]]
        assert dists == sorted(dists, reverse=True)
        for r in rows[1:]:
            assert r["radius_sq_after"] <= r["sel_dist_sq"]


class TestHoltLinear:
    def test_matches_sequential_fold(self, spark, sf_dir):
        ev = load_table(spark, sf_dir, "events")
        import pyspark.sql.functions as F

        daily = (
            ev.groupBy("event_type", F.to_date("ts").alias("day"))
            .count()
            .collect()
        )
        series: dict[str, dict] = {}
        for r in daily:
            series.setdefault(r["event_type"], {})[r["day"]] = r["count"]
        want = {}
        for et, by_day in series.items():
            ys = [float(by_day[d]) for d in sorted(by_day)]
            if len(ys) < 2:
                continue
            level, trend = ys[0], ys[1] - ys[0]
            for y in ys[2:]:
                lnew = (y + level + trend) * 0.5
                trend = (lnew - level + trend) * 0.5
                level = lnew
            want[et] = (
                len(ys),
                round(level, 6),
                round(trend, 6),
                round(level + trend, 6),
                round(level + trend * 2.0, 6),
                round(level + trend * 3.0, 6),
            )
        got = {
            r["event_type"]: (
                r["n_days"],
                r["level"],
                r["trend"],
                r["forecast_1"],
                r["forecast_2"],
                r["forecast_3"],
            )
            for r in REGISTRY["ev18_holt_linear"].spark(spark, sf_dir).collect()
        }
        assert got == want
        assert all(v[0] == 30 for v in got.values())


class TestChi2Independence:
    def test_matches_sequential_chi2(self, spark, sf_dir):
        """Each pair's statistic equals a from-scratch contingency
        chi-squared with the same 1e-6 fixed-point floor."""
        pairs = {
            "orders.priority_x_status": ("orders", "o_orderpriority", "o_orderstatus"),
            "lineitem.returnflag_x_linestatus": ("lineitem", "l_returnflag", "l_linestatus"),
            "documents.lang_x_source": ("documents", "lang", "source"),
        }
        got = {
            r["pair"]: r
            for r in REGISTRY["dq21_chi2_independence"].spark(spark, sf_dir).collect()
        }
        assert set(got) == set(pairs)
        for label, (table, ca, cb) in pairs.items():
            rows = load_table(spark, sf_dir, table).select(ca, cb).collect()
            cells: dict[tuple, int] = {}
            for r in rows:
                cells[(r[ca], r[cb])] = cells.get((r[ca], r[cb]), 0) + 1
            n = sum(cells.values())
            rt: dict = {}
            ct: dict = {}
            for (a, b), o in cells.items():
                rt[a] = rt.get(a, 0) + o
                ct[b] = ct.get(b, 0) + o
            fp = 0
            for (a, b), o in cells.items():
                num = float(o * n - rt[a] * ct[b])
                den = float(n) * float(rt[a] * ct[b])
                fp += math.floor(num * num / den * 1000000.0)
            r_, c_ = len(rt), len(ct)
            g = got[label]
            assert g["n"] == n and g["r"] == r_ and g["c"] == c_
            assert g["dof"] == (r_ - 1) * (c_ - 1)
            assert g["chi2"] == fp / 1000000.0
            cv = round(math.sqrt((fp / 1000000.0) / (n * min(r_ - 1, c_ - 1))), 6)
            assert g["cramers_v"] == cv
            assert 0.0 <= g["cramers_v"] <= 1.0


class TestHardNegativeMining:
    def test_matches_sequential_mining(self, spark, sf_dir):
        qv = _quantized_np(spark, sf_dir)
        labels = {
            int(r["vec_id"]): r["label"]
            for r in load_table(spark, sf_dir, "embeddings")
            .select("vec_id", "label")
            .collect()
        }
        want = []
        for qid in (0, 1, 2):
            q, ql = qv[qid], labels[qid]
            pos = max(
                int(qv[i] @ q) for i in qv if labels[i] == ql and i != qid
            )
            negs = sorted(
                ((int(qv[i] @ q), i) for i in qv if labels[i] != ql),
                key=lambda p: (-p[0], p[1]),
            )[:5]
            for rank, (d, i) in enumerate(negs, 1):
                want.append((qid, rank, i, d, pos, d > pos))
        got = sorted(
            (
                r["query_id"],
                r["rank"],
                r["vec_id"],
                r["neg_dot"],
                r["pos_dot"],
                r["harder_than_pos"],
            )
            for r in REGISTRY["s17_hard_negative_mining"].spark(spark, sf_dir).collect()
        )
        assert got == sorted(want)


class TestCusumChangepoint:
    def test_matches_sequential_cusum(self, spark, sf_dir):
        import pyspark.sql.functions as F

        daily = (
            load_table(spark, sf_dir, "events")
            .groupBy("event_type", F.to_date("ts").alias("day"))
            .count()
            .collect()
        )
        series: dict[str, dict] = {}
        for r in daily:
            series.setdefault(r["event_type"], {})[r["day"]] = r["count"]
        want = []
        for et, by_day in series.items():
            days = sorted(by_day)
            d, t = len(days), sum(by_day.values())
            sp = sn = 0
            for day in days:
                y = by_day[day]
                sp = max(0, sp + 20 * d * y - 21 * t)
                sn = max(0, sn + 19 * t - 20 * d * y)
                want.append(
                    (et, day.isoformat(), y, sp, sn, sp > 10 * t, sn > 10 * t)
                )
        got = sorted(
            (
                r["event_type"],
                r["day"],
                r["cnt"],
                r["cusum_pos"],
                r["cusum_neg"],
                r["alarm_pos"],
                r["alarm_neg"],
            )
            for r in REGISTRY["ev19_cusum_changepoint"].spark(spark, sf_dir).collect()
        )
        assert got == sorted(want)

    def test_clamp_floor(self, spark, sf_dir):
        rows = REGISTRY["ev19_cusum_changepoint"].spark(spark, sf_dir).collect()
        assert all(r["cusum_pos"] >= 0 and r["cusum_neg"] >= 0 for r in rows)
        assert len(rows) == 150  # 5 types x 30 days


class TestSeasonalIndices:
    def test_matches_sequential_indices(self, spark, sf_dir):
        import pyspark.sql.functions as F

        daily = (
            load_table(spark, sf_dir, "events")
            .groupBy("event_type", F.to_date("ts").alias("day"))
            .count()
            .collect()
        )
        agg: dict[tuple, list] = {}
        tot: dict[str, list] = {}
        for r in daily:
            et, wd, c = r["event_type"], r["day"].isoweekday(), r["count"]
            a = agg.setdefault((et, wd), [0, 0])
            a[0] += 1
            a[1] += c
            t = tot.setdefault(et, [0, 0])
            t[0] += 1
            t[1] += c
        got = {
            (r["event_type"], r["weekday"]): (
                r["n_days"],
                r["sum_cnt"],
                r["seasonal_index"],
            )
            for r in REGISTRY["ev20_seasonal_indices"].spark(spark, sf_dir).collect()
        }
        want = {
            (et, wd): (
                n,
                s,
                round(float(s * tot[et][0]) / float(n * tot[et][1]), 6),
            )
            for (et, wd), (n, s) in agg.items()
        }
        assert got == want

    def test_index_mass_balance(self, spark, sf_dir):
        """Weighted by day counts, the indices average to exactly 1:
        sum_wd(n_wd * idx_wd) = D for each type (the multiplicative-
        decomposition normalization, exact by construction)."""
        rows = REGISTRY["ev20_seasonal_indices"].spark(spark, sf_dir).collect()
        by_et: dict[str, list] = {}
        for r in rows:
            by_et.setdefault(r["event_type"], []).append(r)
        for et, rs in by_et.items():
            d = sum(r["n_days"] for r in rs)
            weighted = sum(r["n_days"] * r["seasonal_index"] for r in rs)
            assert abs(weighted - d) < 1e-4


class TestRocchioPrf:
    def test_matches_sequential_prf(self, spark, sf_dir):
        qv = _quantized_np(spark, sf_dir)
        want = []
        for qid in (0, 1, 2):
            q = qv[qid]
            r1 = sorted(
                ((int(qv[i] @ q), i) for i in qv if i != qid),
                key=lambda p: (-p[0], p[1]),
            )[:5]
            fb = [i for _, i in r1]
            ev = 5 * q + sum(qv[i] for i in fb)
            r2 = sorted(
                ((int(qv[i] @ ev), i) for i in qv if i != qid),
                key=lambda p: (-p[0], p[1]),
            )[:5]
            for rank, (d, i) in enumerate(r2, 1):
                want.append((qid, rank, i, d, i in set(fb)))
        got = sorted(
            (
                r["query_id"],
                r["rank"],
                r["vec_id"],
                r["prf_dot"],
                r["in_feedback"],
            )
            for r in REGISTRY["s18_rocchio_prf"].spark(spark, sf_dir).collect()
        )
        assert got == sorted(want)


class TestHarmonicCentrality:
    def test_matches_sequential_bfs(self, spark, sf_dir):
        """Ring sizes and h6 equal a from-scratch BFS truncated at
        radius 3 over the same strong-tie graph."""
        from dww_data_pipeline_spark.plans.pipeline_ext import strong_tie_graph

        pairs, _, _ = strong_tie_graph(spark, sf_dir)
        adj: dict[int, set] = {}
        for r in pairs.collect():
            adj.setdefault(r["u"], set()).add(r["v"])
            adj.setdefault(r["v"], set()).add(r["u"])
        want = {}
        for u in adj:
            seen = {u}
            frontier = {u}
            rings = []
            for _ in range(3):
                frontier = {w for x in frontier for w in adj[x]} - seen
                rings.append(len(frontier))
                seen |= frontier
            n1, n2, n3 = rings
            want[u] = (n1, n2, n3, 6 * n1 + 3 * n2 + 2 * n3)
        got = {
            r["node"]: (r["n1"], r["n2"], r["n3"], r["h6"])
            for r in REGISTRY["pr9_harmonic_centrality"].spark(spark, sf_dir).collect()
        }
        assert got == want

    def test_harmonic_is_h6_over_6(self, spark, sf_dir):
        for r in REGISTRY["pr9_harmonic_centrality"].spark(spark, sf_dir).collect():
            assert r["harmonic"] == round(r["h6"] / 6.0, 6)
