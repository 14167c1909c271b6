"""Round-7 continuation tests: independent cross-checks (numpy / pure
Python) for the operators whose oracle parity alone doesn't prove the
MATH is right — parity proves both engines compute the same thing, these
prove it's the *correct* thing."""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F

from breweries_data_engineering_case_spark.plans import registry
from breweries_data_engineering_case_spark.sources.readers import table_scan


class TestLabelPropagation:
    def test_labels_stay_within_components(self, spark, sf_dir):
        """Labels only travel along edges, so any two nodes sharing an LPA
        label must be in the same weakly-connected component."""
        lpa = {
            r["node"]: r["label"]
            for r in registry.QUERIES["graph_label_propagation"](
                spark, sf_dir
            ).collect()
        }
        cc = {
            r["node"]: r["component"]
            for r in registry.QUERIES["graph_connected_components"](
                spark, sf_dir
            ).collect()
        }
        assert set(lpa) == set(cc)
        label_to_comp: dict[int, int] = {}
        for node, label in lpa.items():
            comp = cc[node]
            assert label_to_comp.setdefault(label, comp) == comp
        # labels are node ids (the init state), never invented values
        assert set(lpa.values()) <= set(lpa.keys())


class TestKmvSketch:
    def test_exact_passthrough_and_bound(self, spark, sf_dir):
        rows = registry.QUERIES["events_kmv_distinct_sketch"](
            spark, sf_dir
        ).collect()
        assert any(r["scope"] == "__union__" for r in rows)
        for r in rows:
            # sf0.001 has far fewer than k=128 users: exact path everywhere
            assert r["est_distinct"] == r["exact_distinct"]
            assert r["within_bound"] is True

    def test_estimator_formula_from_hashes(self, spark, sf_dir):
        """Recompute (k-1)*M // h_k from the raw portable hashes with a
        tiny k where the estimate branch triggers even at sf0.001."""
        from breweries_data_engineering_case_spark.functions.hashing import (
            portable_hash64,
        )

        e = table_scan(spark, sf_dir, "events")
        hashes = sorted(
            r["hv"]
            for r in e.select(portable_hash64(F.col("user_id")).alias("hv"))
            .distinct()
            .collect()
        )
        k = 8
        assert len(hashes) > k
        est = (k - 1) * (1 << 60) // hashes[k - 1]
        exact = len(hashes)
        # KMV at k=8 is crude (sigma ~ 40%) but must be the right order
        assert 0.2 * exact < est < 5 * exact


class TestOlsTwoFactor:
    def test_matches_numpy_lstsq(self, spark, sf_dir):
        li = table_scan(spark, sf_dir, "lineitem").select(
            "l_returnflag",
            F.round("l_quantity").cast("long").alias("x1"),
            F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("y"),
        )
        pdf = li.toPandas()
        got = {
            r["l_returnflag"]: (r["beta_qty_microcents"], r["beta_disc_microcents"])
            for r in registry.QUERIES["lineitem_ols_two_factor"](
                spark, sf_dir
            ).collect()
        }
        for flag, grp in pdf.groupby("l_returnflag"):
            X = grp[["x1", "x2"]].to_numpy(dtype=np.float64)
            y = grp["y"].to_numpy(dtype=np.float64)
            beta, *_ = np.linalg.lstsq(X, y, rcond=None)
            b1, b2 = got[flag]
            # integer micro-cents vs float solve: agree to ~1e-3 relative
            assert math.isclose(b1 / 1e6, beta[0], rel_tol=1e-3, abs_tol=1e-2)
            assert math.isclose(b2 / 1e6, beta[1], rel_tol=1e-3, abs_tol=1e-2)


class TestAutocorr:
    def test_matches_numpy_corrcoef(self, spark, sf_dir):
        daily = (
            table_scan(spark, sf_dir, "events")
            .groupBy("event_type", F.col("ts").cast("date").alias("day"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        series: dict[str, dict] = {}
        for r in daily:
            series.setdefault(r["event_type"], {})[r["day"]] = r["cnt"]
        got = {
            (r["event_type"], r["lag"]): (r["n_pairs"], r["acf"])
            for r in registry.QUERIES["events_autocorr_daily"](
                spark, sf_dir
            ).collect()
        }
        from datetime import timedelta

        for et, by_day in series.items():
            for lag in (1, 2, 3):
                xs, ys = [], []
                for d, c in by_day.items():
                    d2 = d + timedelta(days=lag)
                    if d2 in by_day:
                        xs.append(c)
                        ys.append(by_day[d2])
                if (et, lag) not in got:
                    assert len(xs) == 0
                    continue
                n_pairs, acf = got[(et, lag)]
                assert n_pairs == len(xs)
                if acf is not None and len(xs) > 1:
                    ref = np.corrcoef(xs, ys)[0, 1]
                    assert math.isclose(acf, ref, rel_tol=1e-9, abs_tol=1e-9)


class TestGramMatrix:
    def test_matches_numpy_xtx(self, spark, sf_dir):
        emb = table_scan(spark, sf_dir, "embeddings").select("embedding").collect()
        Q = np.array(
            [
                [round(float(x) * 1_000_000) for x in r["embedding"][:16]]
                for r in emb
            ],
            dtype=np.int64,
        )
        ref = Q.T @ Q
        got = registry.QUERIES["embedding_gram_matrix_int"](spark, sf_dir).collect()
        assert len(got) == 16 * 17 // 2
        for r in got:
            assert r["gram"] == ref[r["i"], r["j"]], (r["i"], r["j"])


class TestFlesch:
    def test_recomputes_one_doc(self, spark, sf_dir):
        import re

        doc = (
            table_scan(spark, sf_dir, "documents")
            .filter(F.length("text") > 20)
            .orderBy("doc_id")
            .limit(1)
            .collect()[0]
        )
        row = (
            registry.QUERIES["doc_readability_flesch"](spark, sf_dir)
            .filter(F.col("doc_id") == doc["doc_id"])
            .collect()[0]
        )
        text = doc["text"]
        words = len(re.split(r"\s+", text.strip())) if text.strip() else 0
        sentences = max(len(re.findall(r"[.!?]+", text)), 1)
        syllables = len(re.findall(r"[aeiouy]+", text.lower()))
        assert row["words"] == words
        assert row["sentences"] == sentences
        assert row["syllables"] == syllables
        if words:
            ref = 206.835 - 1.015 * (words / sentences) - 84.6 * (syllables / words)
            assert math.isclose(row["flesch"], ref, rel_tol=1e-12)


class TestCohortLtv:
    def test_cumulative_monotone_and_offsets_anchor(self, spark, sf_dir):
        rows = registry.QUERIES["orders_cohort_ltv"](spark, sf_dir).collect()
        by_cohort: dict = {}
        for r in rows:
            by_cohort.setdefault(r["cohort_month"], []).append(r)
        for cohort, rs in by_cohort.items():
            rs.sort(key=lambda r: r["month_offset"])
            # every cohort starts at offset 0 (the first order defines it)
            assert rs[0]["month_offset"] == 0
            cum = 0
            for r in rs:
                cum += r["rev_cents"]
                assert r["cum_rev_cents"] == cum
                assert (
                    r["cum_ltv_cents_per_customer"]
                    == cum // r["n_customers"]
                )


class TestLshCandidateEval:
    def test_metric_identities(self, spark, sf_dir):
        r = registry.QUERIES["doc_lsh_candidate_eval"](spark, sf_dir).collect()[0]
        assert r["n_hits"] <= min(r["n_candidates"], r["n_truth_pairs"])
        if r["n_candidates"]:
            assert r["precision_permille"] == r["n_hits"] * 1000 // r["n_candidates"]
        if r["n_truth_pairs"]:
            assert r["recall_permille"] == r["n_hits"] * 1000 // r["n_truth_pairs"]


class TestBm25:
    def test_matches_bruteforce(self, spark, sf_dir):
        import re
        from collections import Counter
        from fractions import Fraction

        docs = table_scan(spark, sf_dir, "documents").select(
            "doc_id", "text"
        ).collect()
        terms = ("spark", "join", "window")
        dl, tfs = {}, {}
        for r in docs:
            toks = re.split(r"\s+", r["text"].strip()) if r["text"].strip() else []
            dl[r["doc_id"]] = len(toks)
            c = Counter(t for t in toks if t in terms)
            if c:
                tfs[r["doc_id"]] = c
        S, N = sum(dl.values()), len(dl)
        df = Counter(t for c in tfs.values() for t in c)
        scores = {}
        for did, c in tfs.items():
            s = 0
            for t, tf in c.items():
                # exact rational BM25 with k1=6/5, b=3/4, rational idf core
                frac = (
                    Fraction(22 * tf * S, 10 * tf * S + 3 * S + 9 * dl[did] * N)
                    * 1_000_000
                )
                s += int(frac * (2 * N - 2 * df[t] + 1)) // (2 * df[t] + 1)
            scores[did] = s
        got = registry.QUERIES["doc_bm25_topk"](spark, sf_dir).collect()
        ref = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)]
        assert [(r["doc_id"], r["bm25_micro"]) for r in got] == ref


class TestHybridRrf:
    def test_rrf_identity(self, spark, sf_dir):
        rows = registry.QUERIES["hybrid_search_rrf"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            expect = 0
            if r["lex_rank"] is not None:
                expect += 1_000_000_000 // (60 + r["lex_rank"])
            if r["vec_rank"] is not None:
                expect += 1_000_000_000 // (60 + r["vec_rank"])
            assert r["rrf_nano"] == expect
            assert r["lex_rank"] is not None or r["vec_rank"] is not None
        # descending fused order with doc_id tiebreak
        key = [(-r["rrf_nano"], r["doc_id"]) for r in rows]
        assert key == sorted(key)


class TestForecastFamily:
    def _daily(self, spark, sf_dir):
        rows = (
            table_scan(spark, sf_dir, "events")
            .groupBy("event_type", F.col("ts").cast("date").alias("day"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        series: dict[str, dict] = {}
        for r in rows:
            series.setdefault(r["event_type"], {})[r["day"]] = r["cnt"]
        return series

    def test_seasonal_naive_matches_python(self, spark, sf_dir):
        from datetime import timedelta

        series = self._daily(spark, sf_dir)
        got = {
            r["event_type"]: (r["n_eval_days"], r["mape_permille"])
            for r in registry.QUERIES["events_seasonal_naive_backtest"](
                spark, sf_dir
            ).collect()
        }
        for et, by_day in series.items():
            apes = [
                abs(c - by_day[d - timedelta(days=7)]) * 1000 // c
                for d, c in by_day.items()
                if d - timedelta(days=7) in by_day
            ]
            if not apes:
                assert et not in got
                continue
            assert got[et] == (len(apes), sum(apes) // len(apes))

    def test_holt_matches_fraction_recursion(self, spark, sf_dir):
        from fractions import Fraction as Fr

        series = self._daily(spark, sf_dir)
        got = {
            r["event_type"]: r["forecast_micro"]
            for r in registry.QUERIES["events_holt_forecast"](
                spark, sf_dir
            ).collect()
        }
        for et, by_day in series.items():
            xs = [c for _, c in sorted(by_day.items())][-8:]
            if len(xs) < 8:
                assert et not in got
                continue
            level, trend = Fr(xs[0]), Fr(0)
            for x in xs[1:]:
                new_level = Fr(1, 2) * x + Fr(1, 2) * (level + trend)
                trend = Fr(1, 2) * (new_level - level) + Fr(1, 2) * trend
                level = new_level
            fc = (level + trend) * 1_000_000
            expect = int(fc) if fc >= 0 else -int(-fc)  # sign-split floor
            assert got[et] == expect, et


class TestChi2Independence:
    def test_matches_float_chi2(self, spark, sf_dir):
        r = registry.QUERIES["customer_segment_nation_chi2"](
            spark, sf_dir
        ).collect()[0]
        obs = (
            table_scan(spark, sf_dir, "customer")
            .join(
                table_scan(spark, sf_dir, "nation"),
                F.col("c_nationkey") == F.col("n_nationkey"),
            )
            .groupBy("c_mktsegment", "n_name")
            .agg(F.count(F.lit(1)).alias("o"))
            .collect()
        )
        rows: dict = {}
        cols: dict = {}
        total = 0
        seen = {}
        for x in obs:
            rows[x["c_mktsegment"]] = rows.get(x["c_mktsegment"], 0) + x["o"]
            cols[x["n_name"]] = cols.get(x["n_name"], 0) + x["o"]
            seen[(x["c_mktsegment"], x["n_name"])] = x["o"]
            total += x["o"]
        # full r x c grid: empty cells with positive expectation contribute
        # E = R*C/T (the round-8 fix — observed-cells-only undercounts)
        chi2 = sum(
            (seen.get((s, n), 0) - rows[s] * cols[n] / total) ** 2
            / (rows[s] * cols[n] / total)
            for s in rows
            for n in cols
        )
        n_grid = len(rows) * len(cols)
        assert r["n_cells"] == n_grid
        assert r["dof"] == (len(rows) - 1) * (len(cols) - 1)
        # per-cell ppm floors lose < n_cells ppm total
        assert abs(r["chi2_ppm"] / 1e6 - chi2) < n_grid / 1e6 + 1e-6


class TestImageDhash:
    def test_banded_join_matches_bruteforce(self, spark):
        """The banded bucket join must equal brute-force all-pairs Hamming
        <= 7 (pigeonhole recall 1), and planted same-group variants must
        land closer than the cross-group median."""
        from breweries_data_engineering_case_spark.operators.multimodal import (
            dhash56,
            dhash_near_dup_pairs,
            image_dhash,
            synthetic_near_dup_images,
        )

        assets = synthetic_near_dup_images(spark, 48)
        hashes = image_dhash(assets)
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in dhash_near_dup_pairs(hashes, 7).collect()
        }
        hv = {r["asset_id"]: r["dhash"] for r in hashes.collect()}
        assert len(hv) == 48
        brute = {
            (a, b): bin(hv[a] ^ hv[b]).count("1")
            for a in hv
            for b in hv
            if a < b and bin(hv[a] ^ hv[b]).count("1") <= 7
        }
        assert got == brute
        # recompute one hash from the recipe, independent of the operator
        w, h, g = 16, 12, 5
        px = np.array(
            [(x * 3 + y * 5 + g * 17) % 256 for y in range(h) for x in range(w)],
            dtype=np.uint8,
        ).reshape(h, w)
        assert hv[g * 3] == dhash56(px)


class TestSkyline:
    def test_dominance_exact(self, spark, sf_dir):
        parts = (
            table_scan(spark, sf_dir, "part")
            .selectExpr(
                "p_partkey",
                "p_brand",
                "p_size",
                "CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
                " AS cents",
            )
            .collect()
        )
        got = {
            r["p_partkey"]
            for r in registry.QUERIES["part_skyline_pareto"](
                spark, sf_dir
            ).collect()
        }
        by_brand: dict = {}
        for p in parts:
            by_brand.setdefault(p["p_brand"], []).append(p)
        expect = set()
        for rows in by_brand.values():
            for p in rows:
                dominated = any(
                    q["p_size"] <= p["p_size"]
                    and q["cents"] <= p["cents"]
                    and (q["p_size"] < p["p_size"] or q["cents"] < p["cents"])
                    for q in rows
                )
                if not dominated:
                    expect.add(p["p_partkey"])
        assert got == expect


class TestRunsTest:
    def test_matches_fraction_z2(self, spark, sf_dir):
        from fractions import Fraction as Fr

        daily = (
            table_scan(spark, sf_dir, "orders")
            .groupBy(
                F.year(F.col("o_orderdate").cast("date")).alias("yr"),
                F.col("o_orderdate").cast("date").alias("day"),
            )
            .agg(
                F.sum(
                    (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                        "long"
                    )
                ).alias("cents")
            )
            .collect()
        )
        series: dict = {}
        for r in daily:
            series.setdefault(r["yr"], []).append((r["day"], r["cents"]))
        got = {
            r["yr"]: r
            for r in registry.QUERIES["orders_runs_test_randomness"](
                spark, sf_dir
            ).collect()
        }
        for yr, pts in series.items():
            pts.sort()
            signs = []
            for (_, a), (_, b) in zip(pts, pts[1:]):
                if b != a:
                    signs.append(1 if b > a else 0)
            if not signs:
                assert yr not in got
                continue
            n, n1 = len(signs), sum(signs)
            n2 = n - n1
            runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
            row = got[yr]
            assert (row["n_obs"], row["n_up"], row["n_down"], row["n_runs"]) == (
                n,
                n1,
                n2,
                runs,
            )
            if n1 and n2 and 2 * n1 * n2 > n and n > 1:
                num = runs * n - 2 * n1 * n2 - n
                z2 = Fr(num * num * (n - 1), 2 * n1 * n2 * (2 * n1 * n2 - n))
                assert row["z2_ppm"] == int(z2 * 1_000_000)
            else:
                assert row["z2_ppm"] is None


class TestCharCoverage:
    def test_curve_matches_counter(self, spark, sf_dir):
        from collections import Counter

        docs = table_scan(spark, sf_dir, "documents").select("text").collect()
        cnt = Counter()
        for r in docs:
            cnt.update(r["text"])
        rows = registry.QUERIES["vocab_char_coverage"](spark, sf_dir).collect()
        assert {r["ch"] for r in rows} == set(cnt)
        total = sum(cnt.values())
        ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        cum = 0
        by_rank = {r["rnk"]: r for r in rows}
        for rank, (ch, n) in enumerate(ordered, start=1):
            cum += n
            r = by_rank[rank]
            assert (r["ch"], r["n"]) == (ch, n)
            assert r["cum_coverage_ppm"] == cum * 1_000_000 // total
        assert rows and max(r["cum_coverage_ppm"] for r in rows) == 1_000_000


class TestMixtureTemperature:
    def test_flattens_toward_uniform(self, spark, sf_dir):
        rows = registry.QUERIES["source_mixture_temperature"](
            spark, sf_dir
        ).collect()
        assert len(rows) >= 2
        import math as m

        for r in rows:
            # temperature weight reproduces floor(sqrt(n)*1e6) normalization
            assert r["temp_weight_ppm"] <= 1_000_000
        big = max(rows, key=lambda r: r["n_docs"])
        small = min(rows, key=lambda r: r["n_docs"])
        if big["n_docs"] > small["n_docs"]:
            # sqrt sampling compresses the spread between sources
            assert (
                big["temp_weight_ppm"] - small["temp_weight_ppm"]
                < big["raw_share_ppm"] - small["raw_share_ppm"]
            )
        # recompute one weight end to end
        s = {r["source"]: m.floor(m.sqrt(r["n_docs"]) * 1_000_000) for r in rows}
        st = sum(s.values())
        for r in rows:
            assert r["temp_weight_ppm"] == s[r["source"]] * 1_000_000 // st


class TestNeighborMeanFeatures:
    def test_two_hop_recompute(self, spark, sf_dir):
        import hashlib
        from collections import defaultdict

        li = (
            table_scan(spark, sf_dir, "lineitem")
            .filter(F.col("l_partkey") < 200)
            .select("l_orderkey", "l_partkey")
            .collect()
        )
        by_order = defaultdict(set)
        for r in li:
            by_order[r["l_orderkey"]].add(r["l_partkey"])
        edges = set()
        for parts in by_order.values():
            ps = sorted(parts)
            for i, u in enumerate(ps):
                for v in ps[i + 1 :]:
                    h = int(hashlib.md5(f"{u}:{v}".encode()).hexdigest()[:15], 16)
                    if h % 10 == 0:
                        edges.add((u, v))
        adj = defaultdict(set)
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        feats = {
            r["p_partkey"]: (
                int(r["p_size"]),
                int(
                    __import__("decimal").Decimal(str(r["p_retailprice"]))
                    .quantize(__import__("decimal").Decimal("0.01"))
                    * 100
                ),
            )
            for r in table_scan(spark, sf_dir, "part")
            .filter(F.col("p_partkey") < 200)
            .collect()
        }
        h1 = {}
        for node, nbrs in adj.items():
            nb = [feats[b] for b in nbrs if b in feats]
            d = len(nb)
            h1[node] = (
                d,
                sum(s for s, _ in nb) // d,
                sum(c for _, c in nb) // d,
            )
        expect = {}
        for node, nbrs in adj.items():
            nb = [h1[b] for b in nbrs if b in h1]
            d = len(nb)
            expect[node] = h1[node] + (
                sum(s for _, s, _ in nb) // d,
                sum(c for _, _, c in nb) // d,
            )
        got = {
            r["node"]: (
                r["deg"],
                r["h1_size"],
                r["h1_cents"],
                r["h2_size"],
                r["h2_cents"],
            )
            for r in registry.QUERIES["graph_neighbor_mean_features"](
                spark, sf_dir
            ).collect()
        }
        assert got == expect


class TestAudioFingerprint:
    def test_planted_groups_fully_recovered(self, spark):
        rows = registry.QUERIES["multimodal_audio_fingerprint_dup"](
            spark, "unused"
        ).collect()
        got = {(r["id_a"], r["id_b"]) for r in rows}
        # every within-group pair collides (amplitude/phase invariance)...
        expect = {
            (g * 3 + i, g * 3 + j)
            for g in range(12)
            for i in range(3)
            for j in range(i + 1, 3)
        }
        assert expect <= got
        # ...and any extra pair must join two groups whose tones alias to
        # the same FFT peak sequence — never within-group misses
        for a, b in got - expect:
            assert a // 3 != b // 3


class TestOrderedConcat:
    def test_one_order_recomputed(self, spark, sf_dir):
        rows = registry.QUERIES["lineitem_ordered_concat"](
            spark, sf_dir
        ).collect()
        assert rows
        r = min(rows, key=lambda x: x["l_orderkey"])
        li = (
            table_scan(spark, sf_dir, "lineitem")
            .filter(F.col("l_orderkey") == r["l_orderkey"])
            .select("l_linenumber", F.col("l_shipdate").cast("date").alias("d"))
            .collect()
        )
        expect = [
            ln for _, ln in sorted((x["d"], x["l_linenumber"]) for x in li)
        ]
        assert r["lines_ordered"] == ",".join(str(x) for x in expect)
        assert r["n_lines"] == len(expect) >= 4
        assert r["first_ship"] == min(x["d"] for x in li)
        assert r["last_ship"] == max(x["d"] for x in li)


class TestPqAdc:
    def test_matches_numpy_pq(self, spark, sf_dir):
        emb = table_scan(spark, sf_dir, "embeddings").orderBy("vec_id").collect()
        Q = {
            r["vec_id"]: np.array(
                [round(float(x) * 1_000_000) for x in r["embedding"]],
                dtype=np.int64,
            )
            for r in emb
        }
        cb = {c: Q[c] for c in Q if c < 16}
        corpus = {v: Q[v] for v in Q if v >= 24}
        queries = {v: Q[v] for v in Q if 16 <= v <= 18}
        # encode corpus: per subspace argmin over codebook (tiebreak code)
        codes = {}
        for v, x in corpus.items():
            codes[v] = [
                min(
                    range(16),
                    key=lambda c, s=s: (
                        int(((x[s * 8 : s * 8 + 8] - cb[c][s * 8 : s * 8 + 8]) ** 2).sum()),
                        c,
                    ),
                )
                for s in range(8)
            ]
        got = {
            r["query_id"]: (r["n_hits"], r["recall_permille"])
            for r in registry.QUERIES["embedding_pq_adc_recall"](
                spark, sf_dir
            ).collect()
        }
        for qid, q in queries.items():
            adc = {
                v: sum(
                    int(
                        (
                            (q[s * 8 : s * 8 + 8] - cb[codes[v][s]][s * 8 : s * 8 + 8])
                            ** 2
                        ).sum()
                    )
                    for s in range(8)
                )
                for v in corpus
            }
            exact = {v: int(((q - x) ** 2).sum()) for v, x in corpus.items()}
            top = lambda d: {
                v for v, _ in sorted(d.items(), key=lambda kv: (kv[1], kv[0]))[:10]
            }
            hits = len(top(adc) & top(exact))
            assert got[qid] == (hits, hits * 100)


class TestLinkPrediction:
    def test_scores_bruteforce(self, spark, sf_dir):
        from collections import defaultdict

        li = (
            table_scan(spark, sf_dir, "lineitem")
            .filter(F.col("l_partkey") % 13 == 0)
            .select("l_orderkey", "l_partkey")
            .collect()
        )
        by_order = defaultdict(set)
        for r in li:
            by_order[r["l_orderkey"]].add(r["l_partkey"])
        edges = set()
        for parts in by_order.values():
            ps = sorted(parts)
            for i, u in enumerate(ps):
                for v in ps[i + 1 :]:
                    edges.add((u, v))
        adj = defaultdict(set)
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        scores = {}
        for u in adj:
            for w in adj:
                if u < w and (u, w) not in edges:
                    common = len(adj[u] & adj[w])
                    if common:
                        scores[(u, w)] = (
                            common * 1_000_000 // (len(adj[u]) + len(adj[w]) - common)
                        )
        got = registry.QUERIES["graph_link_prediction_jaccard"](
            spark, sf_dir
        ).collect()
        ref = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)]
        assert [((r["u"], r["w"]), r["jaccard_ppm"]) for r in got] == ref


class TestPoissonAnomaly:
    def test_flags_recomputed(self, spark, sf_dir):
        rows = registry.QUERIES["events_poisson_anomaly_days"](
            spark, sf_dir
        ).collect()
        assert rows
        from collections import defaultdict

        totals = defaultdict(lambda: [0, 0])
        for r in rows:
            totals[r["event_type"]][0] += r["cnt"]
            totals[r["event_type"]][1] += 1
        for r in rows:
            tot, nd = totals[r["event_type"]]
            lam = tot * 1000 // nd
            assert r["lambda_permille"] == lam
            assert r["is_anomaly"] == (
                (1000 * r["cnt"] - lam) ** 2 > 9000 * lam
            )


class TestRake:
    def test_matches_bruteforce(self, spark, sf_dir):
        from collections import Counter, defaultdict

        stop = {"a", "the", "and", "of", "to", "is", "in"}
        docs = table_scan(spark, sf_dir, "documents").select("text").collect()
        freq: Counter = Counter()
        deg: Counter = Counter()
        occ: Counter = Counter()
        for r in docs:
            toks = [t for t in r["text"].split(" ") if t != ""]
            phrase: list[str] = []
            phrases = []
            for t in toks + ["the"]:  # sentinel flush
                if t in stop:
                    if phrase:
                        phrases.append(phrase)
                    phrase = []
                else:
                    phrase.append(t)
            for p in phrases:
                occ[" ".join(p)] += 1
                for w in p:
                    freq[w] += 1
                    deg[w] += len(p)
        scores = {
            ph: sum(deg[w] * 1_000_000 // freq[w] for w in ph.split(" "))
            for ph in occ
        }
        got = registry.QUERIES["doc_rake_keywords"](spark, sf_dir).collect()
        ref = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)]
        assert [(r["phrase"], r["score_ppm"]) for r in got] == ref
        for r in got:
            assert r["n_occurrences"] == occ[r["phrase"]]


class TestTwoPassMedian:
    def test_matches_sorted_median(self, spark, sf_dir):
        cents = sorted(
            r["cents"]
            for r in table_scan(spark, sf_dir, "lineitem")
            .selectExpr(
                "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
                " AS cents"
            )
            .collect()
        )
        r = registry.QUERIES["lineitem_exact_median_two_pass"](
            spark, sf_dir
        ).collect()[0]
        n = len(cents)
        assert r["n_rows"] == n
        assert r["median_cents"] == cents[(n + 1) // 2 - 1]


class TestDiversityAndDispersion:
    def test_gini_recomputed(self, spark, sf_dir):
        from collections import Counter, defaultdict

        ev = (
            table_scan(spark, sf_dir, "events")
            .select("user_id", "event_type")
            .collect()
        )
        per_user: dict = defaultdict(Counter)
        for r in ev:
            per_user[r["user_id"]][r["event_type"]] += 1
        got = {
            r["user_id"]: r
            for r in registry.QUERIES["events_type_gini_impurity"](
                spark, sf_dir
            ).collect()
        }
        assert set(got) == set(per_user)
        for uid, cnts in per_user.items():
            t = sum(cnts.values())
            sq = sum(c * c for c in cnts.values())
            r = got[uid]
            assert r["n_events"] == t and r["n_types"] == len(cnts)
            assert r["gini_ppm"] == (t * t - sq) * 1_000_000 // (t * t)

    def test_vwap_bounds(self, spark, sf_dir):
        rows = registry.QUERIES["lineitem_daily_vwap"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r["vwap_cents"] == r["notional_cents"] // r["total_qty"]

    def test_fano_recomputed(self, spark, sf_dir):
        from collections import defaultdict

        daily = (
            table_scan(spark, sf_dir, "events")
            .groupBy("event_type", F.col("ts").cast("date").alias("day"))
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        )
        series = defaultdict(list)
        for r in daily:
            series[r["event_type"]].append(r["cnt"])
        got = {
            r["event_type"]: r
            for r in registry.QUERIES["events_burstiness_fano"](
                spark, sf_dir
            ).collect()
        }
        for et, xs in series.items():
            n, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
            r = got[et]
            assert (r["n_days"], r["n_events"]) == (n, sx)
            if n > 1 and sx:
                assert r["fano_ppm"] == (n * sxx - sx * sx) * 1_000_000 // (
                    n - 1
                ) // sx
            else:
                assert r["fano_ppm"] is None


class TestKAnonymity:
    def test_flags_recomputed(self, spark, sf_dir):
        rows = registry.QUERIES["dq_k_anonymity"](spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert r["k_anonymous"] == (r["n_rows"] >= 5)
        total = sum(r["n_rows"] for r in rows)
        assert total == table_scan(spark, sf_dir, "customer").count()


class TestCuped:
    def test_theta_and_rho2_fraction(self, spark, sf_dir):
        from collections import defaultdict
        from datetime import datetime
        from fractions import Fraction as Fr

        cut = datetime(2024, 1, 16)
        ev = table_scan(spark, sf_dir, "events").select("user_id", "ts").collect()
        xy = defaultdict(lambda: [0, 0])
        for r in ev:
            xy[r["user_id"]][0 if r["ts"] < cut else 1] += 1
        xs = [v[0] for v in xy.values()]
        ys = [v[1] for v in xy.values()]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        cov_n = n * sxy - sx * sy
        varx_n = n * sxx - sx * sx
        vary_n = n * syy - sy * sy
        r = registry.QUERIES["events_cuped_variance_reduction"](
            spark, sf_dir
        ).collect()[0]
        assert r["n_users"] == n
        th = Fr(cov_n * 1_000_000, varx_n)
        expect_theta = int(th) if th >= 0 else -int(-th)
        assert r["theta_ppm"] == expect_theta
        assert r["var_reduction_ppm"] == cov_n * cov_n * 1_000_000 // varx_n // vary_n
        assert 0 <= r["var_reduction_ppm"] <= 1_000_000


class TestTokenBudget:
    def test_hamilton_apportionment_exact(self, spark, sf_dir):
        rows = registry.QUERIES["dataset_token_budget_allocation"](
            spark, sf_dir
        ).collect()
        assert sum(r["alloc_tokens"] for r in rows) == 10_000
        total = sum(r["n_tokens"] for r in rows)
        for r in rows:
            lo = 10_000 * r["n_tokens"] // total
            assert r["alloc_tokens"] in (lo, lo + 1)


class TestRuntimeBloomFilter:
    def test_bloom_injected_and_result_exact(self, spark, sf_dir):
        df = registry.QUERIES["join_runtime_bloom_filter"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, "runtime bloom filter not injected"
        got = {(r["l_returnflag"]): (r["n_rows"], r["revenue"]) for r in df.collect()}
        o = table_scan(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = table_scan(spark, sf_dir, "lineitem")
        ref = {
            r["l_returnflag"]: (r["n_rows"], r["revenue"])
            for r in li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
                .cast("double")
                .alias("revenue"),
            )
            .collect()
        }
        assert got == ref


class TestInterarrivalCv:
    def test_fraction_recompute(self, spark, sf_dir):
        from collections import defaultdict

        ev = (
            table_scan(spark, sf_dir, "events")
            .select(
                "user_id",
                F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
                "event_id",
            )
            .collect()
        )
        per = defaultdict(list)
        for r in ev:
            per[r["user_id"]].append((r["us"], r["event_id"]))
        got = {
            r["user_id"]: (r["n_gaps"], r["cv2_ppm"])
            for r in registry.QUERIES["events_interarrival_cv"](
                spark, sf_dir
            ).collect()
        }
        for uid, pts in per.items():
            pts.sort()
            gaps = [(b[0] - a[0]) // 1_000_000 for a, b in zip(pts, pts[1:])]
            if len(gaps) < 2:
                assert uid not in got
                continue
            n, sg = len(gaps), sum(gaps)
            sgg = sum(g * g for g in gaps)
            if sg == 0:
                assert got[uid] == (n, None)
            else:
                expect = (n * sgg - sg * sg) * n * 1_000_000 // ((n - 1) * sg * sg)
                assert got[uid] == (n, expect)


class TestDecayValue:
    def test_one_customer_recomputed(self, spark, sf_dir):
        rows = registry.QUERIES["customer_decay_weighted_value"](
            spark, sf_dir
        ).collect()
        assert rows
        orders = (
            table_scan(spark, sf_dir, "orders")
            .selectExpr(
                "o_custkey",
                "CAST(o_orderdate AS DATE) AS d",
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
                " AS cents",
            )
            .collect()
        )
        anchor = max(r["d"] for r in orders)
        target = rows[0]["o_custkey"]
        mine = [r for r in orders if r["o_custkey"] == target]
        expect_raw = sum(r["cents"] for r in mine)
        expect_decayed = sum(
            r["cents"] >> min((anchor - r["d"]).days // 30, 39) for r in mine
        )
        r0 = rows[0]
        assert (r0["n_orders"], r0["raw_cents"], r0["decayed_cents"]) == (
            len(mine),
            expect_raw,
            expect_decayed,
        )
        for r in rows:
            assert r["decayed_cents"] <= r["raw_cents"]


class TestGiniByNation:
    def test_fraction_recompute(self, spark, sf_dir):
        from collections import defaultdict

        o = (
            table_scan(spark, sf_dir, "orders")
            .selectExpr(
                "o_custkey",
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
                " AS cents",
            )
            .groupBy("o_custkey")
            .agg(F.sum("cents").alias("cents"))
            .collect()
        )
        cmap = {
            r["c_custkey"]: r["c_nationkey"]
            for r in table_scan(spark, sf_dir, "customer").collect()
        }
        nmap = {
            r["n_nationkey"]: r["n_name"]
            for r in table_scan(spark, sf_dir, "nation").collect()
        }
        per = defaultdict(list)
        for r in o:
            per[nmap[cmap[r["o_custkey"]]]].append((r["cents"], r["o_custkey"]))
        got = {
            r["n_name"]: (r["n_customers"], r["gini_ppm"])
            for r in registry.QUERIES["orders_gini_by_nation"](
                spark, sf_dir
            ).collect()
        }
        for nation, vals in per.items():
            vals.sort()
            n = len(vals)
            sx = sum(c for c, _ in vals)
            six = sum(i * c for i, (c, _) in enumerate(vals, start=1))
            if n <= 1 or sx == 0:
                assert got[nation] == (n, None)
            else:
                g = (2 * six - (n + 1) * sx) * 1_000_000 // (n * sx)
                assert got[nation] == (n, g)
                assert 0 <= g < 1_000_000


class TestSqlUdf:
    def test_inlined_no_python(self, spark, sf_dir):
        df = registry.QUERIES["sql_udf_scalar"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
        rows = {r["o_orderpriority"]: r for r in df.collect()}
        for r in rows.values():
            # every order contributes 1..3 points
            assert r["n_orders"] <= r["total_tier_points"] <= 3 * r["n_orders"]


class TestYoyGrowth:
    def test_identity(self, spark, sf_dir):
        rows = registry.QUERIES["lineitem_monthly_yoy_growth"](
            spark, sf_dir
        ).collect()
        assert rows
        for r in rows:
            d = r["revenue_cents"] - r["prev_year_cents"]
            expect = (
                -((-d * 1000) // r["prev_year_cents"])
                if d < 0
                else (d * 1000) // r["prev_year_cents"]
            )
            assert r["yoy_growth_permille"] == expect


class TestAnovaEta2:
    def test_matches_float_recompute(self, spark, sf_dir):
        from collections import defaultdict

        daily = (
            table_scan(spark, sf_dir, "orders")
            .groupBy(
                F.col("o_orderdate").cast("date").alias("day"),
            )
            .agg(
                F.sum(
                    (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                        "long"
                    )
                ).alias("x")
            )
            .collect()
        )
        groups = defaultdict(list)
        xs = []
        for r in daily:
            # Python weekday(): Mon=0..Sun=6; Spark dayofweek-1: Sun=0..Sat=6
            dow = (r["day"].weekday() + 1) % 7
            groups[dow].append(r["x"])
            xs.append(r["x"])
        n = len(xs)
        s = float(sum(xs))
        sxx = float(sum(x * x for x in xs))
        between = sum(
            (float(sum(g)) ** 2) / len(g) for g in groups.values()
        ) - s * s / n
        total = sxx - s * s / n
        r = registry.QUERIES["orders_weekday_anova_eta2"](
            spark, sf_dir
        ).collect()[0]
        assert r["n_days"] == n
        import math as m

        assert m.isclose(r["eta_squared"], between / total, rel_tol=1e-9)
        assert 0 <= r["eta_squared"] <= 1


class TestLinearInterpolate:
    def test_one_user_recomputed(self, spark, sf_dir):
        from collections import defaultdict
        from datetime import timedelta

        act = (
            table_scan(spark, sf_dir, "events")
            .groupBy("user_id", F.col("ts").cast("date").alias("day"))
            .agg(F.count(F.lit(1)).alias("v"))
            .collect()
        )
        per = defaultdict(dict)
        for r in act:
            per[r["user_id"]][r["day"]] = r["v"]
        got = defaultdict(dict)
        for r in registry.QUERIES["events_linear_interpolate"](
            spark, sf_dir
        ).collect():
            got[r["user_id"]][r["day"]] = (r["observed"], r["value_permille"])
        assert set(got) == set(per)
        for uid, days in per.items():
            lo, hi = min(days), max(days)
            n_days = (hi - lo).days + 1
            assert len(got[uid]) == n_days
            cur = lo
            while cur <= hi:
                obs, vp = got[uid][cur]
                if cur in days:
                    assert obs and vp == days[cur] * 1000
                else:
                    d0 = max(d for d in days if d < cur)
                    d1 = min(d for d in days if d > cur)
                    expect = (
                        days[d0] * (d1 - cur).days + days[d1] * (cur - d0).days
                    ) * 1000 // (d1 - d0).days
                    assert not obs and vp == expect
                cur += timedelta(days=1)


class TestWinnowing:
    def test_fingerprints_bruteforce(self, spark, sf_dir):
        import hashlib
        import re
        from collections import defaultdict

        P = (1 << 31) - 1
        B = 1_000_003
        docs = table_scan(spark, sf_dir, "documents").select(
            "doc_id", "text"
        ).collect()
        fps_by_doc: dict = {}
        for r in docs:
            toks = (
                re.split(r"\s+", r["text"].strip()) if r["text"].strip() else []
            )
            th = [
                int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % P
                for t in toks
            ]
            kg = [
                ((th[i] * B + th[i + 1]) % P * B + th[i + 2]) % P
                for i in range(len(th) - 2)
            ]
            fps = {
                min(kg[i : i + 4]) for i in range(len(kg) - 3)
            }
            if fps:
                fps_by_doc[r["doc_id"]] = fps
        pair_counts = defaultdict(int)
        inv = defaultdict(set)
        for did, fps in fps_by_doc.items():
            for fp in fps:
                inv[fp].add(did)
        for fp, dids in inv.items():
            ds = sorted(dids)
            for i, a in enumerate(ds):
                for b in ds[i + 1 :]:
                    pair_counts[(a, b)] += 1
        ranked = sorted(
            ((c, a, b) for (a, b), c in pair_counts.items() if c >= 3),
            key=lambda t: (-t[0], t[1], t[2]),
        )
        got = registry.QUERIES["doc_winnowing_fingerprints"](
            spark, sf_dir
        ).collect()
        assert [(r["id_a"], r["id_b"], r["shared_fps"]) for r in got] == [
            (a, b, c) for c, a, b in ranked[: len(got)]
        ]


class TestAbPowerMde:
    def test_formula_recompute(self, spark, sf_dir):
        import hashlib
        import math as m

        ev = (
            table_scan(spark, sf_dir, "events")
            .filter(F.col("event_type") == "view")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        P = (1 << 60)
        n0 = n1 = c = 0
        for r in ev:
            h = int(hashlib.md5(str(r["user_id"]).encode()).hexdigest()[:15], 16)
            if h % 2 == 0:
                n0 += 1
            else:
                n1 += 1
            if r["n"] >= 14:
                c += 1
        got = registry.QUERIES["events_ab_power_mde"](spark, sf_dir).collect()[0]
        assert (got["n_control"], got["n_treatment"]) == (n0, n1)
        assert got["pooled_rate_permille"] == c * 1000 // (n0 + n1)
        p = c / (n0 + n1)
        mde = (1.959963984540054 + 0.8416212335729143) * m.sqrt(
            p * (1 - p) * (1 / n0 + 1 / n1)
        )
        assert m.isclose(got["mde_abs"], mde, rel_tol=1e-12)


class TestLog2Histogram:
    def test_buckets_consistent(self, spark, sf_dir):
        rows = registry.QUERIES["doc_length_log2_histogram"](
            spark, sf_dir
        ).collect()
        assert rows
        total = sum(r["n_docs"] for r in rows)
        assert total == table_scan(spark, sf_dir, "documents").count()
        for r in rows:
            b = r["log2_bucket"]
            if b == -1:
                assert r["min_tokens"] == r["max_tokens"] == 0
            else:
                assert 2**b <= r["min_tokens"] <= r["max_tokens"] < 2 ** (b + 1)


class TestSetOpsAll:
    def test_bag_multiplicities(self, spark, sf_dir):
        from collections import Counter

        cn = Counter(
            r["c_nationkey"]
            for r in table_scan(spark, sf_dir, "customer").collect()
        )
        sn = Counter(
            r["s_nationkey"]
            for r in table_scan(spark, sf_dir, "supplier").collect()
        )
        rows = registry.QUERIES["set_ops_all_bag_semantics"](
            spark, sf_dir
        ).collect()
        common = Counter(
            r["nationkey"] for r in rows if r["kind"] == "common_multiplicity"
        )
        surplus = Counter(
            r["nationkey"] for r in rows if r["kind"] == "customer_surplus"
        )
        for k in set(cn) | set(sn):
            assert common.get(k, 0) == min(cn.get(k, 0), sn.get(k, 0))
            assert surplus.get(k, 0) == max(cn.get(k, 0) - sn.get(k, 0), 0)


class TestLpaModularity:
    def test_q_bounds_and_fraction(self, spark, sf_dir):
        r = registry.QUERIES["graph_lpa_modularity"](spark, sf_dir).collect()[0]
        # Newman Q is bounded in [-1/2, 1) — scaled ppm
        assert -500_000 <= r["modularity_ppm"] < 1_000_000
        assert r["n_communities"] >= 1 and r["n_edges"] >= 1
        # LPA labels must yield at least as much modularity as the
        # all-singletons partition (Q_singletons <= 0 for any graph)
        assert r["modularity_ppm"] is not None


class TestForecastTournament:
    def test_consistent_with_components(self, spark, sf_dir):
        rows = {
            r["event_type"]: r
            for r in registry.QUERIES["events_forecast_backtest_tournament"](
                spark, sf_dir
            ).collect()
        }
        seasonal = {
            r["event_type"]: r
            for r in registry.QUERIES["events_seasonal_naive_backtest"](
                spark, sf_dir
            ).collect()
        }
        for et, r in rows.items():
            assert r["winner"] == (
                "seasonal_naive"
                if r["mape_seasonal_permille"] < r["mape_naive_permille"]
                else "naive"
            )
            # the tournament evaluates a subset of the single-method
            # backtest's days (both lags must exist), never more
            assert r["n_eval_days"] <= seasonal[et]["n_eval_days"]


class TestHhi:
    def test_fraction_recompute(self, spark, sf_dir):
        from collections import defaultdict

        li = (
            table_scan(spark, sf_dir, "lineitem")
            .selectExpr(
                "l_partkey",
                "l_suppkey",
                "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
                " AS cents",
            )
            .collect()
        )
        brand = {
            r["p_partkey"]: r["p_brand"]
            for r in table_scan(spark, sf_dir, "part").collect()
        }
        rev = defaultdict(int)
        for r in li:
            rev[(brand[r["l_partkey"]], r["l_suppkey"])] += r["cents"]
        per_brand = defaultdict(list)
        for (b, _), c in rev.items():
            per_brand[b].append(c)
        got = {
            r["p_brand"]: r
            for r in registry.QUERIES["supplier_hhi_by_brand"](
                spark, sf_dir
            ).collect()
        }
        for b, cs in per_brand.items():
            t = sum(cs)
            sq = sum(c * c for c in cs)
            r = got[b]
            assert r["n_suppliers"] == len(cs)
            assert r["hhi_ppm"] == sq * 1_000_000 // (t * t)
            assert 1_000_000 // len(cs) <= r["hhi_ppm"] <= 1_000_000


class TestSeasonalDecompose:
    def test_identity_holds(self, spark, sf_dir):
        rows = registry.QUERIES["orders_seasonal_decompose_exact"](
            spark, sf_dir
        ).collect()
        assert rows
        interior = [r for r in rows if r["trend_sum7"] is not None]
        assert interior, "complete centered windows must exist"
        for r in interior:
            # detrended identity and exact closure of the decomposition
            assert r["detrended_x7"] == 7 * r["revenue_cents"] - r["trend_sum7"]
            assert r["detrended_x7"] == r["seasonal_x7"] + r["residual_x7"]
        for r in rows:
            if r["trend_sum7"] is None:
                assert r["detrended_x7"] is None


class TestSpanCorruption:
    def test_plan_recomputed(self, spark, sf_dir):
        import hashlib
        import re

        docs = table_scan(spark, sf_dir, "documents").select(
            "doc_id", "text"
        ).collect()
        expect = []
        for d in docs:
            if not d["text"].strip():
                continue
            n = len(re.split(r"\s+", d["text"].strip()))
            masked = [
                p
                for p in range(n)
                if int(
                    hashlib.md5(f"{d['doc_id']}:{p}".encode()).hexdigest()[:15],
                    16,
                )
                % 100
                < 15
            ]
            spans = []
            for p in masked:
                if spans and spans[-1][0] + spans[-1][1] == p:
                    spans[-1][1] += 1
                else:
                    spans.append([p, 1])
            for sid, (start, ln) in enumerate(spans):
                expect.append((d["doc_id"], start, ln, sid))
        got = sorted(
            (r["doc_id"], r["span_start"], r["span_len"], r["sentinel_id"])
            for r in registry.QUERIES["doc_span_corruption_plan"](
                spark, sf_dir
            ).collect()
        )
        assert got == sorted(expect)


class TestTokenizerFertility:
    def test_ratio_identity(self, spark, sf_dir):
        rows = registry.QUERIES["doc_tokenizer_fertility"](
            spark, sf_dir
        ).collect()
        assert rows
        for r in rows:
            if r["words"]:
                assert (
                    r["fertility_ppm"]
                    == r["subtokens"] * 1_000_000 // r["words"]
                )
                assert r["fertility_ppm"] >= 1_000_000  # subtokens ⊇ words


class TestThresholdSweep:
    def test_cumulative_consistent(self, spark, sf_dir):
        rows = sorted(
            registry.QUERIES["doc_jaccard_threshold_sweep"](
                spark, sf_dir
            ).collect(),
            key=lambda r: -r["jaccard_decile"],
        )
        assert rows
        cum = 0
        for r in rows:
            cum += r["n_pairs"]
            assert r["n_pairs_at_or_above"] == cum
        n_docs = (
            table_scan(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 300)
            .count()
        )
        assert cum == n_docs * (n_docs - 1) // 2


class TestNormAudit:
    def test_norms_recomputed(self, spark, sf_dir):
        emb = table_scan(spark, sf_dir, "embeddings").collect()
        norms = {
            r["vec_id"]: sum(
                round(float(x) * 1_000_000) ** 2 for x in r["embedding"]
            )
            for r in emb
        }
        mean = sum(norms.values()) // len(norms)
        got = {
            r["vec_id"]: r
            for r in registry.QUERIES["embedding_norm_audit"](
                spark, sf_dir
            ).collect()
        }
        assert set(got) == set(norms)
        for vid, n2 in norms.items():
            r = got[vid]
            assert r["norm2_micro2"] == n2
            assert r["corpus_mean_norm2"] == mean
            assert r["is_outlier"] == (n2 * 2 < mean or n2 > mean * 2)


class TestTrgmSearch:
    def test_query_matches_bruteforce(self, spark, sf_dir):
        parts = table_scan(spark, sf_dir, "part").select(
            "p_partkey", "p_name"
        ).collect()

        def tris(s):
            p = "  " + s + " "
            return {p[i : i + 3] for i in range(len(p) - 2)}

        q = tris("red widgit")
        scores = {}
        for r in parts:
            t = tris(r["p_name"])
            shared = len(t & q)
            if shared:
                scores[r["p_partkey"]] = (
                    shared,
                    shared * 1_000_000 // (len(t) + len(q) - shared),
                )
        got = registry.QUERIES["part_trgm_fuzzy_search"](
            spark, sf_dir
        ).collect()
        ref = sorted(
            ((v[1], k) for k, v in scores.items()), key=lambda t: (-t[0], t[1])
        )[: len(got)]
        assert [(r["sim_ppm"], r["p_partkey"]) for r in got] == ref
        # the true 'red widget' rows must outrank everything else
        top_names = {r["p_name"] for r in got[:1]}
        assert "red widget" in top_names


class TestDiffInDiff:
    def test_estimator_recomputed(self, spark, sf_dir):
        import hashlib
        from collections import defaultdict
        from datetime import datetime

        cut = datetime(2024, 1, 16)
        ev = table_scan(spark, sf_dir, "events").select("user_id", "ts").collect()
        per = defaultdict(lambda: [0, 0])
        for r in ev:
            per[r["user_id"]][0 if r["ts"] < cut else 1] += 1
        sums = {0: [0, 0, 0], 1: [0, 0, 0]}  # arm -> [n, pre, post]
        for uid, (pre, post) in per.items():
            arm = (
                int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 2
            )
            sums[arm][0] += 1
            sums[arm][1] += pre
            sums[arm][2] += post
        n_c, sc_pre, sc_post = sums[0]
        n_t, st_pre, st_post = sums[1]
        r = registry.QUERIES["events_diff_in_diff"](spark, sf_dir).collect()[0]
        assert (r["n_treatment"], r["n_control"]) == (n_t, n_c)
        num = (st_post - st_pre) * n_c - (sc_post - sc_pre) * n_t
        expect = (
            -((-num * 1_000_000) // (n_t * n_c))
            if num < 0
            else (num * 1_000_000) // (n_t * n_c)
        )
        assert r["did_micro"] == expect


class TestRecsysEval:
    def test_bounds_and_consistency(self, spark, sf_dir):
        r = registry.QUERIES["recsys_coverage_diversity_eval"](
            spark, sf_dir
        ).collect()[0]
        assert 0 < r["n_recommended"] <= r["catalog_size"]
        assert (
            r["coverage_permille"]
            == r["n_recommended"] * 1000 // r["catalog_size"]
        )
        if r["n_rec_pairs"]:
            assert 0 <= r["mean_ild_ppm"] <= 1_000_000
        # consistency with the serving query: every recommended item
        # appears in part_similarity_topk's output
        recs = {
            x["rec"]
            for x in registry.QUERIES["part_similarity_topk"](
                spark, sf_dir
            ).collect()
        }
        assert len(recs) == r["n_recommended"]


class TestWilson:
    def test_shrinks_small_samples(self, spark, sf_dir):
        import math as m

        rows = registry.QUERIES["orders_high_value_rate_wilson"](
            spark, sf_dir
        ).collect()
        assert rows
        for r in rows:
            n, k = r["n_orders"], r["n_high_value"]
            p = k / n
            expect = (
                p + 1.9208 / n
                - 1.96 * m.sqrt(p * (1 - p) / n + 0.9604 / (n * n * n))
            ) / (1 + 3.8416 / n)
            assert m.isclose(r["wilson_lower"], expect, rel_tol=1e-12)
            assert r["wilson_lower"] <= p  # the bound is conservative


class TestMarkovAbsorption:
    def test_fixed_point_recomputed(self, spark, sf_dir):
        from collections import defaultdict

        trans = registry.QUERIES["events_markov_transitions"](
            spark, sf_dir
        ).collect()
        pm = defaultdict(dict)
        states = set()
        for r in trans:
            pm[r["from_type"]][r["to_type"]] = r["per_mille"]
            states |= {r["from_type"], r["to_type"]}
        p = {s: 1000 if s == "purchase" else 0 for s in states}
        for _ in range(4):
            p = {
                s: 1000
                if s == "purchase"
                else sum(v * p[t] for t, v in pm.get(s, {}).items()) // 1000
                for s in states
            }
        got = {
            r["event_type"]: r["absorb_permille"]
            for r in registry.QUERIES["events_markov_absorption_4step"](
                spark, sf_dir
            ).collect()
        }
        assert got == p
        assert got["purchase"] == 1000


class TestSegmentMigration:
    def test_matrix_consistent(self, spark, sf_dir):
        rows = registry.QUERIES["customer_segment_migration"](
            spark, sf_dir
        ).collect()
        assert rows
        n_cust = (
            table_scan(spark, sf_dir, "orders")
            .select("o_custkey")
            .distinct()
            .count()
        )
        assert sum(r["n_customers"] for r in rows) == n_cust
        from collections import defaultdict

        row_tot = defaultdict(int)
        for r in rows:
            row_tot[r["seg_h1"]] += r["n_customers"]
        for r in rows:
            assert (
                r["share_permille"]
                == r["n_customers"] * 1000 // row_tot[r["seg_h1"]]
            )


class TestFilterAblation:
    def test_grid_recomputed(self, spark, sf_dir):
        import re

        docs = table_scan(spark, sf_dir, "documents").select("text").collect()
        from collections import Counter

        grid = Counter()
        for r in docs:
            t = r["text"]
            n_tok = len(re.split(r"\s+", t.strip())) if t.strip() else 0
            alpha = (
                len(re.sub("[^A-Za-z]", "", t)) / len(t) if len(t) else 0.0
            )
            stops = sum(
                1
                for w in ("the", "and", "of")
                if re.search(rf"(^|\s){w}(\s|$)", t)
            )
            grid[(n_tok >= 5, alpha >= 0.6, stops >= 1)] += 1
        got = registry.QUERIES["doc_filter_ablation_grid"](
            spark, sf_dir
        ).collect()
        for r in got:
            key = (r["len_ok"], r["alpha_ok"], r["stop_ok"])
            assert r["n_docs"] == grid[key]
            assert r["survives_all"] == all(key)
        assert sum(r["n_docs"] for r in got) == len(docs)


class TestUpliftBands:
    def test_band_arithmetic(self, spark, sf_dir):
        rows = registry.QUERIES["events_uplift_by_activity_band"](
            spark, sf_dir
        ).collect()
        assert rows
        for r in rows:
            if r["n_treatment"] and r["n_control"]:
                assert r["uplift_permille"] == (
                    r["conv_t"] * 1000 // r["n_treatment"]
                    - r["conv_c"] * 1000 // r["n_control"]
                )
        # total users across bands == distinct users
        n_users = (
            table_scan(spark, sf_dir, "events")
            .select("user_id")
            .distinct()
            .count()
        )
        assert sum(r["n_treatment"] + r["n_control"] for r in rows) == n_users


class TestSecondOrderHazard:
    def test_hazard_recomputed(self, spark, sf_dir):
        from collections import defaultdict

        orders = (
            table_scan(spark, sf_dir, "orders")
            .selectExpr(
                "o_custkey",
                "o_orderkey",
                "CAST(o_orderdate AS DATE) AS d",
            )
            .collect()
        )
        per = defaultdict(list)
        max_m = 0
        for r in orders:
            m = r["d"].year * 12 + r["d"].month - 1
            per[r["o_custkey"]].append((r["d"], r["o_orderkey"], m))
            max_m = max(max_m, m)
        risk = defaultdict(int)
        events = defaultdict(int)
        for cust, rows_ in per.items():
            rows_.sort()
            first_m = rows_[0][2]
            second_m = rows_[1][2] if len(rows_) > 1 else None
            for k in range(1, 7):
                if max_m - first_m < k:
                    continue
                if second_m is not None and second_m - first_m < k:
                    continue
                risk[k] += 1
                if second_m is not None and second_m - first_m == k:
                    events[k] += 1
        got = {
            r["month_offset"]: r
            for r in registry.QUERIES["orders_second_order_hazard"](
                spark, sf_dir
            ).collect()
        }
        for k in got:
            r = got[k]
            assert (r["n_at_risk"], r["n_events"]) == (risk[k], events[k])
            assert r["hazard_permille"] == events[k] * 1000 // risk[k]


class TestBasketTriples:
    def test_triples_bruteforce(self, spark, sf_dir):
        from collections import Counter, defaultdict
        from itertools import combinations

        li = (
            table_scan(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_partkey")
            .collect()
        )
        baskets = defaultdict(set)
        for r in li:
            baskets[r["l_orderkey"]].add(r["l_partkey"])
        sup = Counter()
        for items in baskets.values():
            for t in combinations(sorted(items), 3):
                sup[t] += 1
        ref = sorted(
            ((c, t) for t, c in sup.items() if c >= 3),
            key=lambda x: (-x[0], x[1]),
        )
        got = registry.QUERIES["market_basket_triples"](
            spark, sf_dir
        ).collect()
        assert [
            (r["support"], (r["item_a"], r["item_b"], r["item_c"]))
            for r in got
        ] == ref[: len(got)]


class TestAffinityLift:
    def test_lift_recomputed(self, spark, sf_dir):
        from collections import Counter, defaultdict

        u = (
            table_scan(spark, sf_dir, "events")
            .select("user_id", "event_type")
            .distinct()
            .collect()
        )
        by_user = defaultdict(set)
        for r in u:
            by_user[r["user_id"]].add(r["event_type"])
        n_users = len(by_user)
        per = Counter(t for ts in by_user.values() for t in ts)
        both = Counter()
        for ts in by_user.values():
            s = sorted(ts)
            for i, a in enumerate(s):
                for b in s[i + 1 :]:
                    both[(a, b)] += 1
        got = {
            (r["type_a"], r["type_b"]): (r["n_both"], r["lift_ppm"])
            for r in registry.QUERIES["events_type_affinity_lift"](
                spark, sf_dir
            ).collect()
        }
        assert set(got) == set(both)
        for (ta, tb), (nb, lift) in got.items():
            assert nb == both[(ta, tb)]
            assert lift == nb * n_users * 1_000_000 // (per[ta] * per[tb])


class TestMultimodalKeepList:
    def test_keep_list_properties(self, spark, sf_dir):
        rows = registry.QUERIES["multimodal_dedup_keep_list"](
            spark, sf_dir
        ).collect()
        assert len(rows) == 48 + 36
        comp = {r["asset_id"]: r["component"] for r in rows}
        kept = {r["asset_id"] for r in rows if r["is_kept"]}
        # image and audio id spaces never merge (disjoint edges)
        for aid, c in comp.items():
            assert (aid < 1000) == (c < 1000)
        # component representative is kept, is the min of its members
        from collections import defaultdict

        members = defaultdict(list)
        for aid, c in comp.items():
            members[c].append(aid)
        for c, ms in members.items():
            assert min(ms) == c and c in kept
        # audio planted groups of 3 collapse to one survivor each
        audio_kept = {a for a in kept if a >= 1000}
        assert len(audio_kept) <= 12


class TestSimpsonsDetector:
    def test_cross_multiplied_directions(self, spark, sf_dir):
        rows = registry.QUERIES["simpsons_reversal_detector"](
            spark, sf_dir
        ).collect()
        assert rows
        on_hi = sum(r["n_hi"] for r in rows)
        or_hi = sum(r["r_hi"] for r in rows)
        on_lo = sum(r["n_lo"] for r in rows)
        or_lo = sum(r["r_lo"] for r in rows)
        overall = or_hi * on_lo > or_lo * on_hi
        for r in rows:
            assert r["overall_hi_worse"] == overall
            if r["n_hi"] and r["n_lo"]:
                stratum = r["r_hi"] * r["n_lo"] > r["r_lo"] * r["n_hi"]
                assert r["stratum_hi_worse"] == stratum
                assert r["is_reversal"] == (stratum != overall)
            else:
                assert r["is_reversal"] is None


class TestAnomalyConsensus:
    def test_vote_arithmetic(self, spark, sf_dir):
        rows = registry.QUERIES["events_anomaly_consensus"](
            spark, sf_dir
        ).collect()
        assert rows
        for r in rows:
            votes = sum(
                1
                for f in (
                    r["poisson_flag"],
                    r["zscore_flag"],
                    r["weekday_adjusted_flag"],
                )
                if f is True
            )
            assert r["consensus_anomaly"] == (votes >= 2)


class TestBfsHistogram:
    def test_distances_bruteforce(self, spark, sf_dir):
        from collections import defaultdict, deque, Counter

        li = (
            table_scan(spark, sf_dir, "lineitem")
            .filter(F.col("l_partkey") % 13 == 0)
            .select("l_orderkey", "l_partkey")
            .collect()
        )
        by_order = defaultdict(set)
        for r in li:
            by_order[r["l_orderkey"]].add(r["l_partkey"])
        adj = defaultdict(set)
        nodes = set()
        for parts in by_order.values():
            ps = sorted(parts)
            nodes |= parts
            for i, u in enumerate(ps):
                for v in ps[i + 1 :]:
                    adj[u].add(v)
                    adj[v].add(u)
        src = min(nodes)
        dist = {src: 0}
        frontier = deque([src])
        while frontier:
            u = frontier.popleft()
            if dist[u] >= 4:
                continue
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    frontier.append(v)
        hist = Counter(min(dist.get(n, -1), 4) if dist.get(n, -1) != -1 else -1 for n in nodes)
        got = {
            r["distance"]: r["n_nodes"]
            for r in registry.QUERIES["graph_bfs_distance_histogram"](
                spark, sf_dir
            ).collect()
        }
        assert got == dict(hist)


class TestCentroidShift:
    def test_fraction_recompute(self, spark, sf_dir):
        from collections import defaultdict

        emb = table_scan(spark, sf_dir, "embeddings").collect()
        sums: dict = defaultdict(lambda: [None, None, 0, 0])
        for r in emb:
            q = [round(float(x) * 1_000_000) for x in r["embedding"]]
            half = r["vec_id"] % 2
            slot = sums[r["label"]]
            if slot[half] is None:
                slot[half] = [0] * len(q)
            slot[half] = [a + b for a, b in zip(slot[half], q)]
            slot[2 + half] += 1
        got = {
            r["label"]: r
            for r in registry.QUERIES["embedding_centroid_shift_by_label"](
                spark, sf_dir
            ).collect()
        }
        for label, (s0, s1, n0, n1) in sums.items():
            r = got[label]
            assert (r["n_half0"], r["n_half1"]) == (n0, n1)
            if n0 and n1:
                num = sum(
                    (a * n1 - b * n0) ** 2 for a, b in zip(s0, s1)
                )
                assert r["shift_sq_micro2"] == num // (n0 * n0 * n1 * n1)


class TestDupRateBySource:
    def test_rate_recomputed(self, spark, sf_dir):
        from collections import Counter, defaultdict

        docs = table_scan(spark, sf_dir, "documents").select(
            "source", "text"
        ).collect()
        fp_count = Counter(r["text"] for r in docs)
        per = defaultdict(lambda: [0, 0])
        for r in docs:
            per[r["source"]][0] += 1
            if fp_count[r["text"]] > 1:
                per[r["source"]][1] += 1
        got = {
            r["source"]: r
            for r in registry.QUERIES["doc_dup_rate_by_source"](
                spark, sf_dir
            ).collect()
        }
        for src, (n, d) in per.items():
            r = got[src]
            assert (r["n_docs"], r["n_dup_docs"]) == (n, d)
            assert r["dup_rate_permille"] == d * 1000 // n


class TestMannKendall:
    def test_statistic_recomputed(self, spark, sf_dir):
        from collections import defaultdict

        orders = (
            table_scan(spark, sf_dir, "orders")
            .selectExpr(
                "CAST(o_orderdate AS DATE) AS d",
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
                " AS cents",
            )
            .collect()
        )
        per = defaultdict(lambda: [0, 0])
        for r in orders:
            mm = r["d"].year * 12 + r["d"].month - 1
            per[mm][0] += r["cents"]
            per[mm][1] += 1
        series = [s // c for _, (s, c) in sorted(per.items())]
        n = len(series)
        S = sum(
            (1 if b > a else -1 if b < a else 0)
            for i, a in enumerate(series)
            for b in series[i + 1 :]
        )
        r = registry.QUERIES["orders_aov_mann_kendall"](
            spark, sf_dir
        ).collect()[0]
        assert (r["n_months"], r["mk_s"]) == (n, S)
        den = n * (n - 1) * (2 * n + 5)
        if S > 0:
            expect = (S - 1) ** 2 * 18 * 1_000_000 // den
        elif S < 0:
            expect = -((S + 1) ** 2 * 18 * 1_000_000 // den)
        else:
            expect = 0
        assert r["signed_z2_ppm"] == expect


class TestTheilSen:
    def test_median_slope_recomputed(self, spark, sf_dir):
        from collections import defaultdict

        orders = (
            table_scan(spark, sf_dir, "orders")
            .selectExpr(
                "CAST(o_orderdate AS DATE) AS d",
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
                " AS cents",
            )
            .collect()
        )
        per = defaultdict(lambda: [0, 0])
        for r in orders:
            mm = r["d"].year * 12 + r["d"].month - 1
            per[mm][0] += r["cents"]
            per[mm][1] += 1
        pts = sorted((mm, s // c) for mm, (s, c) in per.items())
        slopes = []
        for i, (m1, a1) in enumerate(pts):
            for m2, a2 in pts[i + 1 :]:
                d = a2 - a1
                s = (
                    d * 1_000_000 // (m2 - m1)
                    if d >= 0
                    else -((-d) * 1_000_000 // (m2 - m1))
                )
                slopes.append(s)
        slopes.sort()
        r = registry.QUERIES["orders_aov_theil_sen"](spark, sf_dir).collect()[0]
        assert r["n_pairs"] == len(slopes)
        assert r["theil_sen_micro"] == slopes[(len(slopes) + 1) // 2 - 1]
        # sign agreement with Mann-Kendall (both detect the same trend)
        mk = registry.QUERIES["orders_aov_mann_kendall"](
            spark, sf_dir
        ).collect()[0]
        if mk["mk_s"] != 0 and r["theil_sen_micro"] != 0:
            assert (mk["mk_s"] > 0) == (r["theil_sen_micro"] > 0)


class TestTextRank:
    def test_ranks_recomputed(self, spark, sf_dir):
        from collections import Counter, defaultdict

        docs = table_scan(spark, sf_dir, "documents").select("text").collect()
        freq = Counter()
        pair = Counter()
        for r in docs:
            w = r["text"].split(" ")
            toks = [t for t in w if t != ""]
            freq.update(toks)
            for a, b in zip(w, w[1:]):
                if a != "" and b != "" and a != b:
                    pair[(min(a, b), max(a, b))] += 1
        vocab = {t for t, f in freq.items() if f >= 5}
        adj = defaultdict(list)
        for (u, v), wt in pair.items():
            if wt >= 2 and u in vocab and v in vocab:
                adj[u].append(v)
                adj[v].append(u)
        deg = {t: len(ns) for t, ns in adj.items()}
        pr = {t: 1_000_000 for t in deg}
        for _ in range(3):
            pr = {
                t: 200_000 + 4 * sum(pr[nb] // deg[nb] for nb in adj[t]) // 5
                for t in deg
            }
        ranked = sorted(pr.items(), key=lambda kv: (-kv[1], kv[0]))
        got = registry.QUERIES["doc_textrank_keywords"](
            spark, sf_dir
        ).collect()
        assert [(r["token"], r["textrank_ppm"]) for r in got] == ranked[
            : len(got)
        ]
        for r in got:
            assert r["degree"] == deg[r["token"]]


class TestClusteringCoefficient:
    def test_networkx_free_bruteforce(self, spark, sf_dir):
        from collections import defaultdict

        li = (
            table_scan(spark, sf_dir, "lineitem")
            .filter(F.col("l_partkey") % 13 == 0)
            .select("l_orderkey", "l_partkey")
            .collect()
        )
        by_order = defaultdict(set)
        for r in li:
            by_order[r["l_orderkey"]].add(r["l_partkey"])
        adj = defaultdict(set)
        for parts in by_order.values():
            ps = sorted(parts)
            for i, u in enumerate(ps):
                for v in ps[i + 1 :]:
                    adj[u].add(v)
                    adj[v].add(u)
        got = {
            r["node"]: r
            for r in registry.QUERIES["graph_clustering_coefficient"](
                spark, sf_dir
            ).collect()
        }
        assert set(got) == set(adj)
        for node, nbrs in adj.items():
            d = len(nbrs)
            tri = sum(
                1
                for a in nbrs
                for b in nbrs
                if a < b and b in adj[a]
            )
            r = got[node]
            assert (r["degree"], r["n_triangles"]) == (d, tri)
            if d >= 2:
                assert r["clustering_ppm"] == 2 * tri * 1_000_000 // (
                    d * (d - 1)
                )
            else:
                assert r["clustering_ppm"] is None


class TestDualSourcing:
    def test_coverage_identity(self, spark, sf_dir):
        rows = registry.QUERIES["part_dual_sourcing_coverage"](
            spark, sf_dir
        ).collect()
        assert rows
        for r in rows:
            assert 0 <= r["n_dual_sourced"] <= r["n_parts"]
            assert (
                r["coverage_permille"]
                == r["n_dual_sourced"] * 1000 // r["n_parts"]
            )


class TestIqrByBrand:
    def test_quartiles_bruteforce(self, spark, sf_dir):
        from collections import defaultdict

        li = (
            table_scan(spark, sf_dir, "lineitem")
            .selectExpr(
                "l_partkey",
                "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
                " AS cents",
            )
            .collect()
        )
        brand = {
            r["p_partkey"]: r["p_brand"]
            for r in table_scan(spark, sf_dir, "part").collect()
        }
        per = defaultdict(list)
        for r in li:
            per[brand[r["l_partkey"]]].append(r["cents"])
        got = {
            r["p_brand"]: r
            for r in registry.QUERIES["lineitem_price_iqr_by_brand"](
                spark, sf_dir
            ).collect()
        }
        for b, cs in per.items():
            cs.sort()
            n = len(cs)
            r = got[b]
            assert r["n_lines"] == n
            assert r["q1"] == cs[(n + 3) // 4 - 1]
            assert r["median"] == cs[(n + 1) // 2 - 1]
            assert r["q3"] == cs[(3 * n + 1) // 4 - 1]
            assert r["iqr"] == r["q3"] - r["q1"]


class TestPriceVolumeBridge:
    def test_bridge_closes_exactly(self, spark, sf_dir):
        rows = registry.QUERIES["orders_yoy_price_volume_bridge"](
            spark, sf_dir
        ).collect()
        assert rows
        for r in rows:
            assert (
                r["volume_effect_x_nprev"] + r["price_effect_x_nprev"]
                == r["total_delta_x_nprev"]
            )
            assert r["total_delta_x_nprev"] == r["n_prev"] * (
                r["rev_cur"] - r["rev_prev"]
            )


class TestOovRate:
    def test_rate_bruteforce(self, spark, sf_dir):
        import re
        from collections import defaultdict

        docs = table_scan(spark, sf_dir, "documents").select("text").collect()
        vocab = set()
        for r in docs:
            if r["text"].strip():
                vocab |= {
                    t for t in re.split(r"\s+", r["text"].strip()) if t
                }
        parts = table_scan(spark, sf_dir, "part").select(
            "p_brand", "p_name"
        ).collect()
        per = defaultdict(lambda: [0, 0])
        for r in parts:
            for t in r["p_name"].split(" "):
                if t:
                    per[r["p_brand"]][0] += 1
                    if t not in vocab:
                        per[r["p_brand"]][1] += 1
        got = {
            r["p_brand"]: r
            for r in registry.QUERIES["part_name_oov_rate"](
                spark, sf_dir
            ).collect()
        }
        for b, (n, o) in per.items():
            r = got[b]
            assert (r["n_name_tokens"], r["n_oov"]) == (n, o)


class TestHeapsCurve:
    def test_monotone_and_endpoint(self, spark, sf_dir):
        import re

        rows = sorted(
            registry.QUERIES["vocab_growth_heaps_curve"](
                spark, sf_dir
            ).collect(),
            key=lambda r: r["decile"],
        )
        assert [r["decile"] for r in rows] == list(range(1, 11))
        for a, b in zip(rows, rows[1:]):
            assert a["n_tokens"] <= b["n_tokens"]
            assert a["vocab_size"] <= b["vocab_size"]
        docs = table_scan(spark, sf_dir, "documents").select("text").collect()
        toks = [
            t
            for r in docs
            if r["text"].strip()
            for t in re.split(r"\s+", r["text"].strip())
            if t
        ]
        assert rows[-1]["n_tokens"] == len(toks)
        assert rows[-1]["vocab_size"] == len(set(toks))


class TestFiscal445:
    def test_mapping_recomputed(self, spark, sf_dir):
        from collections import defaultdict
        from datetime import date

        orders = (
            table_scan(spark, sf_dir, "orders")
            .selectExpr(
                "CAST(o_orderdate AS DATE) AS d",
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
                " AS cents",
            )
            .collect()
        )
        agg = defaultdict(lambda: [0, 0])
        for r in orders:
            d = r["d"]
            fy = d.year if d.month >= 2 else d.year - 1
            doy = (d - date(fy, 2, 1)).days
            wk = min(doy // 7, 51)
            period = (wk // 13) * 3 + (0 if wk % 13 < 4 else 1 if wk % 13 < 8 else 2) + 1
            agg[(fy, period)][0] += 1
            agg[(fy, period)][1] += r["cents"]
        got = {
            (r["fiscal_year"], r["fiscal_period"]): (
                r["n_orders"],
                r["revenue_cents"],
            )
            for r in registry.QUERIES["orders_fiscal_445_rollup"](
                spark, sf_dir
            ).collect()
        }
        assert got == {k: tuple(v) for k, v in agg.items()}
        assert all(1 <= p <= 12 for _, p in got)


class TestSimhashBitBalance:
    def test_votes_recomputed(self, spark, sf_dir):
        import hashlib
        import re
        from collections import defaultdict

        docs = table_scan(spark, sf_dir, "documents").select("text").collect()
        ones = defaultdict(int)
        n_docs = 0
        for r in docs:
            if not r["text"].strip():
                continue
            toks = re.split(r"\s+", r["text"].strip())
            hs = [
                int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in toks
            ]
            if not hs:
                continue
            n_docs += 1
            for b in range(32):
                if 2 * sum(1 for h in hs if (h >> b) & 1) > len(hs):
                    ones[b] += 1
        got = {
            r["bit"]: r
            for r in registry.QUERIES["doc_simhash_bit_balance"](
                spark, sf_dir
            ).collect()
        }
        assert len(got) == 32
        for b in range(32):
            r = got[b]
            assert (r["n_docs"], r["n_ones"]) == (n_docs, ones[b])
            dev = 2 * ones[b] - n_docs
            assert r["is_skewed"] == (dev * dev > 9 * n_docs)


class TestDowHourHeatmap:
    def test_shares_sum(self, spark, sf_dir):
        rows = registry.QUERIES["events_dow_hour_heatmap"](
            spark, sf_dir
        ).collect()
        assert 0 < len(rows) <= 168
        total = sum(r["n_events"] for r in rows)
        assert total == table_scan(spark, sf_dir, "events").count()
        for r in rows:
            assert r["share_ppm"] == r["n_events"] * 1_000_000 // total
            assert 0 <= r["dow"] <= 6 and 0 <= r["hr"] <= 23


class TestPmi:
    def test_top_pair_matches_bruteforce(self, spark, sf_dir):
        docs = table_scan(spark, sf_dir, "documents").select("text").collect()
        from collections import Counter

        uni: Counter = Counter()
        pairs: Counter = Counter()
        for r in docs:
            w = r["text"].split(" ")
            toks = [t for t in w if t != ""]
            uni.update(toks)
            for a, b in zip(w, w[1:]):
                if a != "" and b != "":
                    pairs[(a, b)] += 1
        T = sum(uni.values())
        P = sum(pairs.values())
        scores = {
            (a, b): n * T * T * 1_000_000 // (P * uni[a] * uni[b])
            for (a, b), n in pairs.items()
            if n >= 3
        }
        got = registry.QUERIES["vocab_pmi_collocations"](spark, sf_dir).collect()
        assert got, "collocation list must not be empty"
        best = max(scores.values())
        assert got[0]["pmi_ratio_ppm"] == best
        for r in got:
            assert scores[(r["center"], r["context"])] == r["pmi_ratio_ppm"]
