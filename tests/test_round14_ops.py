"""Round-14 operator: doc_kneser_ney_ppl_filter — independent math replay.

The registry parity gate proves Spark and DuckDB AGREE; these tests prove
the math is RIGHT: a from-scratch pandas/hashlib/math replay of the
interpolated Kneser-Ney bigram LM (train on lang='en', score all), the
micro-nat freeze's boundary margin (the DSIR discipline — a frozen
floor(1e6·ln) is only safe when the scaled ln sits far from an integer
boundary relative to the 1-ulp libm window), and the semantic point of
the CCNet filter (English documents score better under an English-trained
LM than non-English ones).
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest

V = 65536
MH_P = (1 << 31) - 1


def _tok_bucket(tok: str) -> int:
    h = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16)
    return (h % MH_P) % V


def _bigrams(text: str) -> list[tuple[int, int]]:
    toks = re.split(r"\s+", text.strip())
    th = [_tok_bucket(t) for t in toks]
    return list(zip(th, th[1:]))


def _ntile3(n: int, pos: int) -> int:
    size, extra = divmod(n, 3)
    head = extra * (size + 1)
    if pos < head:
        return pos // (size + 1) + 1
    return extra + (pos - head) // size + 1


def _brute_force(docs: pd.DataFrame):
    """Returns (per-doc dict, distinct (num, den) ratios, train-bigram
    count T)."""
    bg_by_doc = {}
    for r in docs.itertuples():
        if not r.text.strip():
            continue
        bgs = _bigrams(r.text)
        if bgs:
            bg_by_doc[r.doc_id] = (r.lang, Counter(bgs))
    big = Counter()
    for _, (lang, cnt) in bg_by_doc.items():
        if lang == "en":
            big.update(cnt)
    c1 = Counter()
    n1p = Counter()
    cont = Counter()
    for (w1, w2), c in big.items():
        c1[w1] += c
        n1p[w1] += 1
        cont[w2] += 1
    t = len(big)
    ratios = set()
    out = {}
    for doc_id, (lang, cnt) in bg_by_doc.items():
        nll = 0
        nb = 0
        for (w1, w2), dcnt in cnt.items():
            if w1 in c1:
                num = max(4 * big.get((w1, w2), 0) - 3, 0) * (t + V) + 3 * n1p[
                    w1
                ] * (cont.get(w2, 0) + 1)
                den = 4 * c1[w1] * (t + V)
            else:
                num = cont.get(w2, 0) + 1
                den = t + V
            ratios.add((num, den))
            lp = math.floor(1e6 * math.log(num / den))
            nll -= dcnt * lp
            nb += dcnt
        out[doc_id] = {
            "lang": lang,
            "n_bigrams": nb,
            "nll_micro_nats": nll,
            "ppl_micro_per_tok": nll // nb,
        }
    # per-language tertiles over (ppl asc, doc_id asc)
    by_lang = defaultdict(list)
    for doc_id, rec in out.items():
        by_lang[rec["lang"]].append((rec["ppl_micro_per_tok"], doc_id))
    names = {1: "head", 2: "middle", 3: "tail"}
    for lang, rows in by_lang.items():
        rows.sort()
        for pos, (_, doc_id) in enumerate(rows):
            out[doc_id]["ccnet_bucket"] = names[_ntile3(len(rows), pos)]
    return out, ratios, t


@pytest.fixture(scope="module")
def kn(spark, sf_dir):
    from breweries_data_engineering_case_spark.plans.registry import QUERIES

    sdf = QUERIES["doc_kneser_ney_ppl_filter"](spark, sf_dir)
    got = {r["doc_id"]: r.asDict() for r in sdf.collect()}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[
        ["doc_id", "lang", "text"]
    ]
    want, ratios, t = _brute_force(docs)
    return got, want, ratios, t


def test_kn_brute_force_replay(kn):
    got, want, _, _ = kn
    assert set(got) == set(want)
    for doc_id, w in want.items():
        g = got[doc_id]
        for k in (
            "lang",
            "n_bigrams",
            "nll_micro_nats",
            "ppl_micro_per_tok",
            "ccnet_bucket",
        ):
            assert g[k] == w[k], f"{doc_id}.{k}: spark {g[k]} != replay {w[k]}"


def test_kn_freeze_boundary_margin(kn):
    """Every frozen ln sits ≥1e-7 from the nearest integer boundary —
    ≥100× the ~1e-9 window a 1-ulp libm ln difference could move it."""
    _, _, ratios, _ = kn
    assert len(ratios) > 100  # the model is non-trivial
    worst = min(
        abs(1e6 * math.log(num / den) - round(1e6 * math.log(num / den)))
        for num, den in ratios
    )
    assert worst >= 1e-7, f"floor-boundary margin too small: {worst}"


def test_kn_semantics_nonvacuous(kn):
    got, want, ratios, t = kn
    # the testdata corpus draws every document from ONE 31-token shared
    # vocabulary (measured round 14), so the unseen-w1 branch CANNOT fire
    # here — the seen branch must, and the unseen branch gets its own
    # planted corpus below (the original min(dens) check was vacuously
    # green either way, round-14 review)
    assert any(den > t + V for _, den in ratios), "seen-w1 branch idle"
    # every language with ≥3 docs fills all three CCNet buckets
    langs = defaultdict(list)
    for rec in got.values():
        langs[rec["lang"]].append(rec)
    for lang, rows in langs.items():
        if len(rows) >= 3:
            assert {r["ccnet_bucket"] for r in rows} == {
                "head",
                "middle",
                "tail",
            }, lang
    # the CCNet point: an English-trained LM prefers English — the mean
    # per-token NLL of en docs is strictly below every other language's
    mean_ppl = {
        lang: sum(r["ppl_micro_per_tok"] for r in rows) / len(rows)
        for lang, rows in langs.items()
    }
    assert all(
        mean_ppl["en"] < mean_ppl[lang] for lang in mean_ppl if lang != "en"
    ), mean_ppl


def test_kn_unseen_w1_branch_planted(spark, tmp_path):
    """The testdata corpus shares one small vocabulary across languages,
    so the unseen-w1 continuation-only branch never fires there. Plant a
    corpus where it MUST: en train docs over tokens {a..f}, one zh doc
    whose token 'zq' never appears in train — every bigram starting at
    'zq' scores P = (cont(w2)+1)/(T+V). Runs the real registry function
    on the planted sf_dir and replays it with the same brute force."""
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "lang": ["en", "en", "en", "zh"],
            "text": [
                "a b c d e f a b",
                "b c d e f a c e",
                "a c e b d f b c",
                "zq a zq b zq c",
            ],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    from breweries_data_engineering_case_spark.plans.registry import QUERIES

    sdf = QUERIES["doc_kneser_ney_ppl_filter"](spark, str(tmp_path))
    got = {r["doc_id"]: r.asDict() for r in sdf.collect()}
    want, ratios, t = _brute_force(docs)
    assert any(den == t + V for _, den in ratios), "planted unseen-w1 idle"
    assert any(den > t + V for _, den in ratios)
    for doc_id, w in want.items():
        g = got[doc_id]
        for k in ("n_bigrams", "nll_micro_nats", "ppl_micro_per_tok"):
            assert g[k] == w[k], f"{doc_id}.{k}: spark {g[k]} != replay {w[k]}"
    # the zh doc leans on unseen-w1 probabilities ~1/(T+V) — far worse
    # than any in-vocabulary en doc under the en-trained LM
    assert got[4]["ppl_micro_per_tok"] > max(
        got[i]["ppl_micro_per_tok"] for i in (1, 2, 3)
    )


# ---------------------------------------------------------------------------
# embedding_d4_prune — independent numpy replay of the D4 curation pipeline
# ---------------------------------------------------------------------------


def _d4_brute_force(emb: pd.DataFrame):
    """From-scratch int64 replay: quantize (round half-away, the Spark/DuckDB
    ROUND contract), two Lloyd passes with trunc-division centroid update,
    within-cluster pair cosines, SemDeDup keep-min drops, prototypicality
    rank prune (rn·4 ≤ nc). Returns per-vec verdicts + the pair sims (for
    the threshold-margin audit)."""
    import numpy as np

    ids = emb["vec_id"].to_numpy()
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    v = X * 1e6
    Q = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)

    def trunc_div(s, n):
        return (np.sign(s) * (np.abs(s) // n)).astype(np.int64)

    def assign(cids, C):
        # exact integer squared L2; argmin ties → lowest cid (C sorted by cid)
        d = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=-1)
        return cids[np.argmin(d, axis=1)]

    k = max(8, math.isqrt(len(ids)))
    seed_mask = ids < k
    order0 = np.argsort(ids[seed_mask])
    c0_ids = ids[seed_mask][order0]
    C0 = Q[seed_mask][order0]
    a1 = assign(c0_ids, C0)
    cids1, C1 = [], []
    for cid in c0_ids:
        m = a1 == cid
        if m.any():
            cids1.append(cid)
            C1.append(trunc_div(Q[m].sum(axis=0), int(m.sum())))
    cids1 = np.array(cids1)
    C1 = np.stack(C1)
    a2 = assign(cids1, C1)

    n2 = (Q * Q).sum(axis=1)
    cn2 = (C1 * C1).sum(axis=1)
    crow = {cid: k for k, cid in enumerate(cids1)}
    proto = {}
    for j, vid in enumerate(ids):
        k = crow[a2[j]]
        dot = int((Q[j] * C1[k]).sum())
        proto[vid] = float(dot) / (math.sqrt(float(n2[j])) * math.sqrt(float(cn2[k])))

    pair_sims, drops = [], set()
    for cid in cids1:
        idx = np.where(a2 == cid)[0]
        for a in range(len(idx)):
            for b in range(a + 1, len(idx)):
                j, k = idx[a], idx[b]
                hi, lo = (j, k) if ids[j] > ids[k] else (k, j)
                sim = float((Q[hi] * Q[lo]).sum()) / (
                    math.sqrt(float(n2[hi])) * math.sqrt(float(n2[lo]))
                )
                pair_sims.append(sim)
                if sim >= 0.4:
                    drops.add(int(ids[hi]))

    stage = {}
    for cid in cids1:
        surv = sorted(
            (
                (-proto[int(ids[j])], int(ids[j]))
                for j in np.where(a2 == cid)[0]
                if int(ids[j]) not in drops
            ),
        )
        nc = len(surv)
        for rn, (_, vid) in enumerate(surv, start=1):
            stage[vid] = "proto_drop" if rn * 4 <= nc else "keep"
    for vid in drops:
        stage[vid] = "semdedup_drop"
    cluster = {int(ids[j]): int(a2[j]) for j in range(len(ids))}
    return stage, proto, cluster, pair_sims


@pytest.fixture(scope="module")
def d4(spark, sf_dir):
    from breweries_data_engineering_case_spark.plans.registry import QUERIES

    sdf = QUERIES["embedding_d4_prune"](spark, sf_dir)
    got = {r["vec_id"]: r.asDict() for r in sdf.collect()}
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")[["vec_id", "embedding"]]
    stage, proto, cluster, pair_sims = _d4_brute_force(emb)
    return got, stage, proto, cluster, pair_sims


def test_d4_brute_force_replay(d4):
    got, stage, proto, cluster, _ = d4
    assert set(got) == set(stage)
    for vid, g in got.items():
        assert g["stage"] == stage[vid], f"{vid}: {g['stage']} != {stage[vid]}"
        assert g["cluster"] == cluster[vid]
        # exact-int dot/norms → the double is a fixed correctly-rounded
        # sequence; numpy replays it bit-for-bit
        assert g["proto_sim"] == proto[vid], f"{vid}: proto_sim mismatch"


def test_d4_threshold_margin(d4):
    """No pair cosine sits ON the 0.4 SemDeDup boundary: exact-int inputs
    make both engines agree bitwise anyway, but a healthy margin means
    even a future 1-ulp drift in sqrt/div could not flip a verdict."""
    *_, pair_sims = d4
    margin = min(abs(s - 0.4) for s in pair_sims)
    assert margin >= 1e-7, f"pair sim within {margin} of the 0.4 threshold"


def test_d4_semantics_nonvacuous(d4):
    got, *_ = d4
    from collections import Counter as _C

    stages = _C(g["stage"] for g in got.values())
    # all three verdicts fire on the real corpus — never a vacuous column
    assert stages["semdedup_drop"] > 0
    assert stages["proto_drop"] > 0
    assert stages["keep"] > 0
    # exactly floor(nc/4) most-prototypical survivors pruned per cluster
    by_cluster: dict[int, list[dict]] = defaultdict(list)
    for g in got.values():
        if g["stage"] != "semdedup_drop":
            by_cluster[g["cluster"]].append(g)
    for cid, rows in by_cluster.items():
        n_drop = sum(1 for r in rows if r["stage"] == "proto_drop")
        assert n_drop == len(rows) // 4, f"cluster {cid}"
        if n_drop:
            worst_dropped = min(
                r["proto_sim"] for r in rows if r["stage"] == "proto_drop"
            )
            best_kept = max(r["proto_sim"] for r in rows if r["stage"] == "keep")
            assert worst_dropped >= best_kept  # prunes the PROTOTYPICAL side
