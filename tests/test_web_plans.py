"""Property tests for the round-5 extension tier (plans/web_plans.py).

The registered queries are differentially verified against DuckDB on
the generator manifest; these tests push the OPERATORS beyond the
generator's five URL variants / planted waveforms: canonicalization
must be a fixpoint and engine-identical on adversarial URLs, flat
audio must fingerprint to nothing, and the compaction packing must
equal an independent reimplementation.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from dww_data_pipeline_spark.plans.web_plans import (
    _COMPACT_TARGET,
    _canon_sql,
)

ADVERSARIAL_URLS = [
    "HTTPS://API.Example.COM:443/v1/Users/",
    "http://example.com:8080/keep/port",          # non-default port survives
    "http://example.com/a/b/c///",                # run of trailing slashes
    "http://example.com/p?utm_source=x&utm_medium=y",  # query dies entirely
    "http://example.com/p?z=1&a=2&m=3",           # full sort
    "http://example.com/p?a=2#frag?fake=query",   # fragment hides a fake query
    "http://EXAMPLE.com",                          # empty path
    "https://example.com:443/",                    # default port + bare slash
    "http://example.com/CaseSensitive/Path",      # path case preserved
    "http://example.com/p?utm_x=1&b=2&utm_y=3",   # interleaved tracking params
]


class TestCanonicalizerProperties:
    @pytest.fixture(scope="class")
    def canon(self, spark):
        df = spark.createDataFrame([(u,) for u in ADVERSARIAL_URLS], ["url"])
        rows = df.select(
            "url", F.expr(_canon_sql("spark", "url")).alias("c")
        ).collect()
        return {r["url"]: r["c"] for r in rows}

    def test_idempotent_fixpoint(self, spark, canon):
        """canon(canon(u)) == canon(u): a canonical URL contains no
        messiness left for a second pass to remove."""
        df = spark.createDataFrame([(c,) for c in canon.values()], ["url"])
        again = {
            r["url"]: r["c"]
            for r in df.select(
                "url", F.expr(_canon_sql("spark", "url")).alias("c")
            ).collect()
        }
        for c in canon.values():
            assert again[c] == c

    def test_engines_agree_beyond_the_generator(self, canon):
        """The DuckDB template must produce the identical canonical
        form on URLs the registered query's generator never emits."""
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE u(url VARCHAR); INSERT INTO u VALUES "
            + ", ".join(f"('{x}')" for x in ADVERSARIAL_URLS)
        )
        duck = dict(
            con.execute(
                f"SELECT url, {_canon_sql('duckdb', 'url')} FROM u"
            ).fetchall()
        )
        assert duck == canon

    def test_specific_forms(self, canon):
        assert (
            canon["HTTPS://API.Example.COM:443/v1/Users/"]
            == "https://api.example.com/v1/Users"
        )
        assert (
            canon["http://example.com:8080/keep/port"]
            == "http://example.com:8080/keep/port"
        )
        assert canon["http://example.com/a/b/c///"] == "http://example.com/a/b/c"
        assert (
            canon["http://example.com/p?utm_source=x&utm_medium=y"]
            == "http://example.com/p"
        )
        assert (
            canon["http://example.com/p?z=1&a=2&m=3"]
            == "http://example.com/p?a=2&m=3&z=1"
        )
        # everything after '#' is fragment, including a fake '?'
        assert (
            canon["http://example.com/p?a=2#frag?fake=query"]
            == "http://example.com/p?a=2"
        )
        assert canon["http://EXAMPLE.com"] == "http://example.com"
        assert canon["https://example.com:443/"] == "https://example.com"
        assert (
            canon["http://example.com/CaseSensitive/Path"]
            == "http://example.com/CaseSensitive/Path"
        )
        assert (
            canon["http://example.com/p?utm_x=1&b=2&utm_y=3"]
            == "http://example.com/p?b=2"
        )


class TestAudioFingerprintEdges:
    def test_flat_audio_has_no_fingerprints(self, spark):
        """A constant-amplitude clip has no strict local maxima in its
        energy envelope — silent/flat audio must match NOTHING (the
        guard against a degenerate bucket that would pair every flat
        clip with every other)."""
        from dww_data_pipeline_spark.operators.documents import (
            audio_frame_energies,
        )

        flat = "A16\n8000 64\n" + " ".join(["500"] * 64)
        media = spark.createDataFrame(
            [(1, bytearray(flat.encode()))], "media_id long, payload binary"
        )
        env = audio_frame_energies(media, frame=4)
        rows = env.collect()
        assert rows[0]["decode_ok"]
        energies = rows[0]["energies"]
        assert len(set(energies)) == 1  # truly flat
        peaks = env.select(
            F.expr(
                "filter(sequence(1, size(energies) - 2), "
                "w -> element_at(energies, w) < element_at(energies, w + 1) "
                "AND element_at(energies, w + 1) >= element_at(energies, w + 2))"
            ).alias("p")
        ).collect()
        assert peaks[0]["p"] == []


class TestCompactionRepack:
    def test_query_equals_independent_packing(self, spark, sf_dir):
        """Re-pack the manifest with a plain Python loop and compare
        bin-by-bin — the window-prefix-sum formulation must equal the
        sequential first-fit-in-order semantics it claims."""
        from dww_data_pipeline_spark.plans.registry import REGISTRY, _load_all

        _load_all()
        from dww_data_pipeline_spark.sources.catalog import load_table

        d = load_table(spark, sf_dir, "documents")
        manifest = (
            d.groupBy("source", (F.col("doc_id") % 8).alias("file_id"))
            .agg(F.sum("n_chars").alias("bytes"))
            .collect()
        )
        by_src: dict[str, list] = {}
        for r in manifest:
            by_src.setdefault(r["source"], []).append((r["file_id"], r["bytes"]))
        want: dict[tuple, list] = {}
        for src, files in by_src.items():
            prefix = 0
            for fid, b in sorted(files):
                want.setdefault((src, prefix // _COMPACT_TARGET), []).append(
                    (fid, b)
                )
                prefix += b
        got = REGISTRY["ext_compaction_plan"].spark(spark, sf_dir).collect()
        assert len(got) == len(want)
        for r in got:
            fs = want[(r["source"], r["bin"])]
            assert r["n_files"] == len(fs)
            assert r["bin_bytes"] == sum(b for _, b in fs)
            assert r["first_file"] == min(f for f, _ in fs)
            assert r["last_file"] == max(f for f, _ in fs)


class TestZipfAndJlGates:
    def test_zipf_slope_negative_and_sane(self, spark, sf_dir):
        from dww_data_pipeline_spark.plans.registry import REGISTRY, _load_all

        _load_all()
        [r] = REGISTRY["v6_zipf_slope"].spark(spark, sf_dir).collect()
        # the synthetic corpus draws from a ~31-word vocabulary, so the
        # "top-100 head" is the whole vocab
        assert 30 <= r["n_ranks"] <= 100
        # frequencies are non-increasing in rank, so the fit must fall;
        # the near-uniform synthetic corpus is far shallower than
        # natural text's -1 — exactly what this diagnostic flags
        assert -1.5 < r["slope"] < 0

    def test_jl_ratios_bracket_one(self, spark, sf_dir):
        from dww_data_pipeline_spark.plans.registry import REGISTRY

        [r] = REGISTRY["e10_jl_distortion_gate"].spark(spark, sf_dir).collect()
        assert r["n_pairs"] == 190
        # E[ratio] = 1: the observed spread must bracket 1e6 and most
        # pairs must land within +-50%
        assert r["min_ratio_micro"] < 1_000_000 < r["max_ratio_micro"]
        assert r["n_within_50pct"] > 100


class TestFilteredAnnAndWap:
    def test_filtered_ann_respects_predicate_and_subsets_s2(self, spark, sf_dir):
        from dww_data_pipeline_spark.plans.registry import REGISTRY, _load_all

        _load_all()
        from dww_data_pipeline_spark.sources.catalog import load_table

        odd = {
            r["vec_id"]
            for r in load_table(spark, sf_dir, "embeddings")
            .filter(F.col("label") % 2 == 1)
            .select("vec_id")
            .collect()
        }
        got = REGISTRY["s14_filtered_ann"].spark(spark, sf_dir).collect()
        assert len(got) == 15  # 3 queries x top-5
        for r in got:
            assert r["vec_id"] in odd  # predicate is never violated
        # pre-filter property: within the same probed cells, the
        # filtered top-k distances can only be >= the unfiltered ones
        s2 = {
            (r["query_id"], r["rank"]): r["d2"]
            for r in REGISTRY["s2_ann_ivf_topk"].spark(spark, sf_dir).collect()
        }
        for r in got:
            # rank-wise dominance: the filtered candidate set is a
            # subset of the unfiltered one, so its k-th best distance
            # can never beat the unfiltered k-th best
            assert r["d2"] >= s2[(r["query_id"], r["rank"])]

    def test_wap_verdict_composes_gates(self, spark, sf_dir):
        from dww_data_pipeline_spark.plans.registry import REGISTRY

        rows = {r["gate"]: r for r in
                REGISTRY["ext_wap_audit"].spark(spark, sf_dir).collect()}
        assert set(rows) == {"pk_unique", "fk_customer", "null_keys",
                             "non_empty", "PUBLISH"}
        total = sum(rows[g]["n_violations"] for g in rows if g != "PUBLISH")
        assert rows["PUBLISH"]["n_violations"] == total
        assert rows["PUBLISH"]["passed"] == int(total == 0)


class TestScd2Asof:
    def test_exactly_one_version_per_existing_user(self, spark, sf_dir):
        from dww_data_pipeline_spark.plans.registry import REGISTRY, _load_all

        _load_all()
        rows = REGISTRY["ext_scd2_asof"].spark(spark, sf_dir).collect()
        users = [r["user_id"] for r in rows]
        # interval partitioning: at most one covering version per key
        assert len(users) == len(set(users)) > 0
        # consistency with the full history: re-deriving "current at T"
        # by max version with valid_from <= T gives the same versions
        hist = REGISTRY["ext_scd2_history"].spark(spark, sf_dir).collect()
        want = {}
        for h in hist:
            if h["valid_from"] <= "2024-01-08 00:00:00":
                if h["user_id"] not in want or h["version"] > want[h["user_id"]]:
                    want[h["user_id"]] = h["version"]
        got = {r["user_id"]: r["version"] for r in rows}
        assert got == want


class TestNearestJoinAndStickiness:
    def test_nearest_is_truly_nearest(self, spark, sf_dir):
        """Brute-force re-derivation: for every matched click the
        reported view must minimize |Δ| (with the (dms, ts, id)
        tiebreak) over ALL same-user views within tolerance."""
        from dww_data_pipeline_spark.plans.registry import REGISTRY, _load_all

        _load_all()
        from dww_data_pipeline_spark.sources.catalog import load_table

        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "user_id", "event_type",
            F.expr("unix_micros(ts) div 1000").alias("ms"),
        ).collect()
        views_by_user: dict[int, list] = {}
        clicks = []
        for r in ev:
            if r["event_type"] == "view":
                views_by_user.setdefault(r["user_id"], []).append(
                    (r["ms"], r["event_id"])
                )
            elif r["event_type"] == "click":
                clicks.append(r)
        got = {
            r["click_id"]: (r["nearest_view"], r["delta_ms"])
            for r in REGISTRY["j16_nearest_event_join"]
            .spark(spark, sf_dir)
            .collect()
        }
        tol = 30 * 60 * 1000
        n_checked = 0
        for cr in clicks:
            cands = [
                (abs(cr["ms"] - vms), vms, vid)
                for vms, vid in views_by_user.get(cr["user_id"], [])
                if abs(cr["ms"] - vms) <= tol
            ]
            if cands:
                best = min(cands)
                assert got[cr["event_id"]] == (best[2], best[0])
                n_checked += 1
            else:
                assert cr["event_id"] not in got
        assert n_checked == len(got) > 0

    def test_stickiness_bounds(self, spark, sf_dir):
        from dww_data_pipeline_spark.plans.registry import REGISTRY

        rows = REGISTRY["ev16_stickiness"].spark(spark, sf_dir).collect()
        assert rows
        for r in rows:
            # avg DAU can never exceed MAU -> ratio in (0, 1e6]
            assert 0 < r["stickiness_micro"] <= 1_000_000
            assert r["sum_dau"] <= r["n_days"] * r["mau"]


class TestDecodeAudit:
    def test_fallback_counts_match_plant(self, spark, sf_dir):
        from dww_data_pipeline_spark.plans.registry import REGISTRY, _load_all

        _load_all()
        rows = REGISTRY["m10_decode_audit"].spark(spark, sf_dir).collect()
        assert rows
        total_failed = sum(r["n_failed"] for r in rows)
        total = sum(r["n_media"] for r in rows)
        # exactly the planted corrupt share fails — decoder neither
        # accepts garbage nor drops valid images
        assert 0 < total_failed < total
        for r in rows:
            assert r["n_ok"] + r["n_failed"] == r["n_media"]


class TestPairSimilarityHist:
    def test_histogram_totals_match_candidates(self, spark, sf_dir):
        from dww_data_pipeline_spark.plans.registry import REGISTRY, _load_all

        _load_all()
        hist = REGISTRY["d21_pair_similarity_hist"].spark(spark, sf_dir).collect()
        n_cand = REGISTRY["d2_minhash_lsh_pairs"].spark(spark, sf_dir).count()
        assert sum(r["n_pairs"] for r in hist) == n_cand > 0
        for r in hist:
            assert 0 <= r["decile"] <= 10  # 10 = exact-duplicate bucket


class TestCanonicalizerRandomized:
    def test_300_seeded_random_urls_agree_and_fix(self, spark):
        """Deterministic fuzz: 300 structurally-random URLs (every
        combination dimension drawn from a seeded RNG) must (a)
        canonicalize identically on both engines and (b) be a
        fixpoint on the second pass."""
        import random

        rng = random.Random(20260814)
        schemes = ["http", "https", "HTTP", "HtTpS"]
        hosts = ["Example.COM", "sub.Example.org", "X.io", "WWW.Site7.com"]
        ports = ["", ":80", ":443", ":8080", ":9"]
        paths = ["", "/", "/a", "/A/b/C", "/x/y/", "/x//", "/p.html"]
        params = ["a=1", "B=2", "utm_source=x", "z=Z", "utm_y=3", "m=0"]
        frags = ["", "#f", "#sec?fake=1"]
        urls = []
        for _ in range(300):
            q = "&".join(
                rng.sample(params, rng.randint(0, 4))
            )
            urls.append(
                rng.choice(schemes) + "://" + rng.choice(hosts)
                + rng.choice(ports) + rng.choice(paths)
                + (("?" + q) if q else "") + rng.choice(frags)
            )
        df = spark.createDataFrame([(u,) for u in urls], ["url"])
        got = {
            r["url"]: r["c"]
            for r in df.select(
                "url", F.expr(_canon_sql("spark", "url")).alias("c")
            ).collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE u(url VARCHAR)")
        con.executemany("INSERT INTO u VALUES (?)", [(u,) for u in urls])
        duck = dict(
            con.execute(
                f"SELECT url, {_canon_sql('duckdb', 'url')} FROM u"
            ).fetchall()
        )
        assert duck == got
        cdf = spark.createDataFrame(
            [(c,) for c in set(got.values())], ["url"]
        )
        again = {
            r["url"]: r["c"]
            for r in cdf.select(
                "url", F.expr(_canon_sql("spark", "url")).alias("c")
            ).collect()
        }
        for c in set(got.values()):
            assert again[c] == c


class TestKhopReachability:
    def test_layers_are_true_bfs_layers(self, spark, sf_dir):
        """Brute-force BFS in Python over the same edge list must give
        identical (node, hop) layers."""
        from dww_data_pipeline_spark.plans.pipeline_ext import strong_tie_graph
        from dww_data_pipeline_spark.plans.registry import REGISTRY, _load_all

        _load_all()
        pairs, _, _ = strong_tie_graph(spark, sf_dir)
        adj: dict[int, set] = {}
        for r in pairs.collect():
            adj.setdefault(r["u"], set()).add(r["v"])
            adj.setdefault(r["v"], set()).add(r["u"])
        seeds = {n for n in adj if n % 40 == 1}
        want = {n: 0 for n in seeds}
        frontier = seeds
        for hop in (1, 2, 3):
            frontier = {
                b for a in frontier for b in adj.get(a, ()) if b not in want
            }
            for n in frontier:
                want[n] = hop
        got = {
            r["node"]: r["hop"]
            for r in REGISTRY["pr7_khop_reachability"]
            .spark(spark, sf_dir)
            .collect()
        }
        assert got == want and len(want) > len(seeds)


class TestLDiversity:
    def test_diverse_flag_matches_count(self, spark, sf_dir):
        from dww_data_pipeline_spark.plans.registry import REGISTRY, _load_all

        _load_all()
        rows = REGISTRY["dq19_l_diversity"].spark(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r["diverse"] == (r["l_distinct"] >= 3)
            # priorities are bounded: 5 distinct values exist in TPC-H
            assert 1 <= r["l_distinct"] <= 5


class TestTokenBudgetPlan:
    def test_allocations_and_epochs_reconcile(self, spark, sf_dir):
        from dww_data_pipeline_spark.plans.registry import REGISTRY, _load_all

        _load_all()
        rows = REGISTRY["t32_token_budget_plan"].spark(spark, sf_dir).collect()
        assert rows
        corpus_toks = sum(r["toks"] for r in rows)
        corpus_docs = sum(r["n_docs"] for r in rows)
        budget = 2 * corpus_toks
        # floor allocations never exceed the budget
        assert sum(r["planned_toks"] for r in rows) <= budget
        for r in rows:
            assert (
                r["planned_toks"]
                == (budget * r["n_docs"]) // corpus_docs
            )
            assert r["epochs_micro"] == (1_000_000 * r["planned_toks"]) // r["toks"]
            assert r["over_repeated"] == (r["epochs_micro"] > 4_000_000)
        # the per-document mixture must actually vary epochs across
        # sources (shorter-doc sources repeat more)
        assert len({r["epochs_micro"] for r in rows}) > 1


class TestIvmAndCalibration:
    def test_ivm_merge_equals_full_recompute(self, spark, sf_dir):
        from dww_data_pipeline_spark.plans.registry import REGISTRY, _load_all

        _load_all()
        from dww_data_pipeline_spark.sources.catalog import load_table

        got = {
            r["o_custkey"]: (r["n_orders"], round(r["spend"], 2))
            for r in REGISTRY["ext_ivm_merge"].spark(spark, sf_dir).collect()
        }
        o = load_table(spark, sf_dir, "orders")
        want = {
            r["o_custkey"]: (r["n"], round(float(r["s"]), 2))
            for r in o.groupBy("o_custkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"),
            )
            .collect()
        }
        assert got == want

    def test_calibration_matrix_is_monotone_in_aggregate(self, spark, sf_dir):
        """Higher estimates should sit at higher exact deciles on
        average — the property that makes minhash usable at all."""
        from dww_data_pipeline_spark.plans.registry import REGISTRY

        rows = REGISTRY["d22_minhash_calibration"].spark(spark, sf_dir).collect()
        assert rows
        total = sum(r["n_pairs"] for r in rows)
        assert total > 0
        by_est = {}
        for r in rows:
            assert 0 <= r["est_match"] <= 8 and 0 <= r["exact_decile"] <= 10
            s, n = by_est.get(r["est_match"], (0, 0))
            by_est[r["est_match"]] = (
                s + r["exact_decile"] * r["n_pairs"],
                n + r["n_pairs"],
            )
        means = {e: s / n for e, (s, n) in by_est.items()}
        es = sorted(means)
        # weak monotonicity between the extremes present in the data
        if len(es) > 1:
            assert means[es[-1]] >= means[es[0]]


class TestUnpivotRoundtrip:
    def test_roundtrip_equals_direct_groupby(self, spark, sf_dir):
        from dww_data_pipeline_spark.plans.registry import REGISTRY, _load_all

        _load_all()
        from dww_data_pipeline_spark.sources.catalog import load_table

        got = {
            (r["o_orderstatus"], r["o_orderpriority"]): r["n"]
            for r in REGISTRY["ext_unpivot_roundtrip"]
            .spark(spark, sf_dir)
            .collect()
        }
        want = {
            (r["o_orderstatus"], r["o_orderpriority"]): r["n"]
            for r in load_table(spark, sf_dir, "orders")
            .groupBy("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == want


class TestDiversityAndAssortativity:
    def test_simpson_bounds(self, spark, sf_dir):
        from dww_data_pipeline_spark.plans.registry import REGISTRY, _load_all

        _load_all()
        [r] = REGISTRY["v7_simpson_diversity"].spark(spark, sf_dir).collect()
        assert 1 <= r["n_sources"]
        assert 0 <= r["collision_micro"] <= 1_000_000
        # the UNBIASED n(n-1) collision estimator lets inverse-Simpson
        # exceed the source count by O(k/N) on finite samples — bound
        # with that slack, not the population-Simpson k ceiling
        assert 1.0 <= r["effective_sources"] <= r["n_sources"] * (
            1 + 2 * r["n_sources"] / r["n_docs"]
        )

    def test_assortativity_range_or_null(self, spark, sf_dir):
        from dww_data_pipeline_spark.plans.registry import REGISTRY

        [r] = (
            REGISTRY["pr8_degree_assortativity"].spark(spark, sf_dir).collect()
        )
        a = r["assortativity"]
        assert a is None or -1.0 <= a <= 1.0
