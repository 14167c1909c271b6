"""Round-14 operators: doremi_domain_mixture_weights and
doc_quality_classifier_distill — independent math replays.

The registry parity gate proves Spark and DuckDB AGREE; these tests prove
the math is RIGHT: from-scratch pandas/hashlib/math replays of the DoReMi
excess-loss → exponentiated-gradient → smoothed largest-remainder mixture
and of the Gopher→Naive-Bayes distillation, the micro-nat freeze boundary
margins (the DSIR discipline), and the semantic non-vacuousness of each
(weights actually reorder domains; the student actually predicts both
classes and agrees with the teacher well above chance).
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest

MH_P = (1 << 31) - 1


def _bucket(tok: str, v: int) -> int:
    h = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16)
    return (h % MH_P) % v


def _toks(text: str) -> list[str]:
    t = text.strip()
    return re.split(r"\s+", t) if t else []


# ---------------------------------------------------------------------------
# DoReMi
# ---------------------------------------------------------------------------

DOREMI_V = 1024
ETA = 100


def _doremi_brute_force(docs: pd.DataFrame):
    """Returns (per-lang dict, ln-freeze ratios, exp-freeze exponents,
    raw pre-clip excess totals)."""
    ckv = Counter()
    for r in docs.itertuples():
        for t in _toks(r.text):
            ckv[(r.lang, _bucket(t, DOREMI_V))] += 1
    pool = Counter()
    nk = Counter()
    for (lang, v), c in ckv.items():
        pool[v] += c
        nk[lang] += c
    n = sum(pool.values())
    ratios = set()

    def freeze(num: int, den: int) -> int:
        ratios.add((num, den))
        return math.floor(1e6 * math.log(num / den))

    lpr = {v: freeze(1000 * cv + 1, 1000 * n + DOREMI_V) for v, cv in pool.items()}
    et = Counter()
    for (lang, v), c in ckv.items():
        lpk = freeze(1000 * c + 1, 1000 * nk[lang] + DOREMI_V)
        et[lang] += c * (lpk - lpr[v])
    excess = {lang: max(et[lang], 0) // nk[lang] for lang in nk}
    mx = max(excess.values())
    exps = {lang: ETA * (e - mx) / 1e6 for lang, e in excess.items()}
    s = {lang: math.floor(1e9 * math.exp(x)) for lang, x in exps.items()}
    stot, k = sum(s.values()), len(s)
    a = {lang: 99 * sv * k + stot for lang, sv in s.items()}
    d = 100 * k * stot
    wfloor = {lang: (1000000 * av) // d for lang, av in a.items()}
    rem = {lang: (1000000 * av) % d for lang, av in a.items()}
    short = 1000000 - sum(wfloor.values())
    order = sorted(rem, key=lambda lang: (-rem[lang], lang))
    w = dict(wfloor)
    for lang in order[:short]:
        w[lang] += 1
    out = {
        lang: {
            "n_tokens": nk[lang],
            "excess_micro_per_tok": excess[lang],
            "eg_score_nano": s[lang],
            "weight_ppm": w[lang],
        }
        for lang in nk
    }
    return out, ratios, exps, dict(et)


@pytest.fixture(scope="module")
def doremi(spark, sf_dir):
    from breweries_data_engineering_case_spark.plans.registry import QUERIES

    sdf = QUERIES["doremi_domain_mixture_weights"](spark, sf_dir)
    got = {r["lang"]: r.asDict() for r in sdf.collect()}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["lang", "text"]]
    want, ratios, exps, _ = _doremi_brute_force(docs)
    return got, want, ratios, exps


def test_doremi_brute_force_replay(doremi):
    got, want, _, _ = doremi
    assert set(got) == set(want)
    for lang, w in want.items():
        g = got[lang]
        for k in (
            "n_tokens",
            "excess_micro_per_tok",
            "eg_score_nano",
            "weight_ppm",
        ):
            assert g[k] == w[k], f"{lang}.{k}: spark {g[k]} != replay {w[k]}"


def test_doremi_ln_freeze_boundary_margin(doremi):
    """Every frozen ln sits ≥1e-7 from the nearest integer boundary —
    ≥100× the ~1e-9 window a 1-ulp libm ln difference could move it."""
    _, _, ratios, _ = doremi
    assert len(ratios) > 50  # the model is non-trivial
    worst = min(
        abs(1e6 * math.log(num / den) - round(1e6 * math.log(num / den)))
        for num, den in ratios
    )
    assert worst >= 1e-7, f"ln floor-boundary margin too small: {worst}"


def test_doremi_exp_freeze_boundary_margin(doremi):
    """The EG freeze floor(1e9·exp(x)): x=0 (the max-excess domain) is
    exact in every IEEE libm (exp(0)=1, 1e9·1 is an exact double), and
    every other exponent's scaled exp must clear the boundary."""
    _, _, _, exps = doremi
    assert any(x == 0.0 for x in exps.values())  # max domain is normalized
    margins = [
        abs(1e9 * math.exp(x) - round(1e9 * math.exp(x)))
        for x in exps.values()
        if x != 0.0
    ]
    assert margins, "all domains at max — excess signal is degenerate"
    assert min(margins) >= 1e-4, f"exp floor-boundary margin: {min(margins)}"


def test_doremi_semantics_nonvacuous(doremi):
    got, want, _, _ = doremi
    weights = {lang: g["weight_ppm"] for lang, g in got.items()}
    excess = {lang: g["excess_micro_per_tok"] for lang, g in got.items()}
    # exact simplex in ppm
    assert sum(weights.values()) == 1_000_000
    # the signal is real: domains are NOT uniformly weighted...
    assert len(set(weights.values())) > 1, weights
    # ...and weight order follows excess-loss order (EG is monotone)
    for a in weights:
        for b in weights:
            if excess[a] > excess[b]:
                assert weights[a] > weights[b], (a, b, excess, weights)
    # DoReMi's uniform-smoothing floor: every domain keeps ≥ ~c/K mass
    k = len(weights)
    assert all(w >= (10_000 // k) - 1 for w in weights.values()), weights
    # en is the pool-dominant domain, so the pool LM underserves it LEAST
    assert excess["en"] == min(excess.values()), excess


# ---------------------------------------------------------------------------
# Gopher → Naive-Bayes distillation
# ---------------------------------------------------------------------------

NB_V = 4096


def _gopher_keep(text: str) -> bool:
    wc = Counter(w for w in text.split(" ") if w != "")
    if not wc:
        return False
    n = sum(wc.values())
    len_sum = sum(c * len(w) for w, c in wc.items())
    top = max(wc.values())
    stop = wc.get("a", 0) + wc.get("the", 0)
    return (
        20 <= n <= 100000
        and 2.0 <= len_sum / n <= 10.0
        and top / n <= 0.2
        and stop / n >= 0.005
    )


def _distill_brute_force(docs: pd.DataFrame):
    labels = {r.doc_id: _gopher_keep(r.text) for r in docs.itertuples()}
    fv = {}
    for r in docs.itertuples():
        cnt = Counter(_bucket(t, NB_V) for t in _toks(r.text))
        if cnt:
            fv[r.doc_id] = cnt
    cp = Counter()
    cn = Counter()
    for doc_id, cnt in fv.items():
        tgt = cp if labels[doc_id] else cn
        tgt.update(cnt)
    np_, nn = sum(cp.values()), sum(cn.values())
    dp = sum(1 for k in labels.values() if k)
    dn = len(labels) - dp
    vs = set(cp) | set(cn)
    ratios = []
    wv = {}
    for v in vs:
        num = (1000 * cp.get(v, 0) + 1) / (1000 * np_ + NB_V)
        den = (1000 * cn.get(v, 0) + 1) / (1000 * nn + NB_V)
        ratios.append(num / den)
        wv[v] = math.floor(1e6 * math.log(num / den))
    bias_ratio = (dp + 1) / (dn + 1)
    ratios.append(bias_ratio)
    bias = math.floor(1e6 * math.log(bias_ratio))
    per_source = defaultdict(lambda: Counter())
    for r in docs.itertuples():
        score = bias + sum(c * wv[v] for v, c in fv.get(r.doc_id, {}).items())
        pred = score >= 0
        keep = labels[r.doc_id]
        c = per_source[r.source]
        c["n_docs"] += 1
        c["n_keep_labels"] += int(keep)
        c["tp"] += int(keep and pred)
        c["fp"] += int(not keep and pred)
        c["fn"] += int(keep and not pred)
        c["tn"] += int(not keep and not pred)
        c["sum_score_micro"] += score
    out = {}
    for src, c in per_source.items():
        acc = (1000000 * (c["tp"] + c["tn"])) // c["n_docs"]
        out[src] = dict(c) | {"accuracy_ppm": acc}
    return out, ratios


@pytest.fixture(scope="module")
def distill(spark, sf_dir):
    from breweries_data_engineering_case_spark.plans.registry import QUERIES

    sdf = QUERIES["doc_quality_classifier_distill"](spark, sf_dir)
    got = {r["source"]: r.asDict() for r in sdf.collect()}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[
        ["doc_id", "source", "text"]
    ]
    want, ratios = _distill_brute_force(docs)
    return got, want, ratios


def test_distill_brute_force_replay(distill):
    got, want, _ = distill
    assert set(got) == set(want)
    for src, w in want.items():
        g = got[src]
        for k in (
            "n_docs",
            "n_keep_labels",
            "tp",
            "fp",
            "fn",
            "tn",
            "accuracy_ppm",
            "sum_score_micro",
        ):
            assert g[k] == w[k], f"{src}.{k}: spark {g[k]} != replay {w[k]}"


def test_distill_freeze_boundary_margin(distill):
    _, _, ratios = distill
    assert len(ratios) > 20
    worst = min(
        abs(1e6 * math.log(r) - round(1e6 * math.log(r))) for r in ratios
    )
    assert worst >= 1e-7, f"ln floor-boundary margin too small: {worst}"


def test_distill_semantics_nonvacuous(distill):
    got, _, _ = distill
    tp = sum(g["tp"] for g in got.values())
    fp = sum(g["fp"] for g in got.values())
    fn = sum(g["fn"] for g in got.values())
    tn = sum(g["tn"] for g in got.values())
    n = sum(g["n_docs"] for g in got.values())
    keep = sum(g["n_keep_labels"] for g in got.values())
    # the teacher is two-class on this corpus (else distillation is moot)
    assert 0 < keep < n, (keep, n)
    # the student predicts BOTH classes — it is not a constant function
    assert tp + fp > 0 and fn + tn > 0, (tp, fp, fn, tn)
    # in-sample agreement beats the majority-class baseline — the student
    # actually learned the rule, not just the prior
    majority = max(keep, n - keep) / n
    assert (tp + tn) / n > majority, ((tp + tn) / n, majority)


# ---------------------------------------------------------------------------
# planted corpora — branches the testdata can never fire
# ---------------------------------------------------------------------------


def test_doremi_single_domain_planted(spark, tmp_path):
    """K=1 boundary: with one domain, proxy ≡ reference (same counts, same
    denominators) so every frozen lp cancels exactly — excess 0, the EG
    score is the exact exp(0)=1 freeze, and the largest-remainder
    allocation must hand the whole simplex (exactly 1,000,000 ppm) to the
    single domain with zero shortfall correction."""
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "lang": ["en", "en", "en"],
            "text": ["a b c a", "b c a b", "c a b c"],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    from breweries_data_engineering_case_spark.plans.registry import QUERIES

    rows = QUERIES["doremi_domain_mixture_weights"](
        spark, str(tmp_path)
    ).collect()
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["excess_micro_per_tok"] == 0
    assert r["eg_score_nano"] == 1_000_000_000  # floor(1e9·exp(0)), exact
    assert r["weight_ppm"] == 1_000_000


def test_doremi_negative_excess_clip_planted(spark, tmp_path):
    """The testdata's domains all have positive excess, so GREATEST(et, 0)
    never fires there. Plant two domains with IDENTICAL token
    distributions: each half-pool proxy carries MORE Lidstone smoothing
    distortion than the full pool reference (ε ≈ (B−V)/2000 nats < 0 for
    B distinct buckets ≪ V), so the raw excess is strictly NEGATIVE and
    the clip must floor it to 0 — verified against the replay's pre-clip
    totals — and the two domains split the simplex exactly in half."""
    text = ["x y z x y", "y z x y z", "z x y z x"]
    docs = pd.DataFrame(
        {
            "doc_id": list(range(1, 7)),
            "lang": ["en"] * 3 + ["fr"] * 3,
            "text": text + text,
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    _, _, _, ets = _doremi_brute_force(docs)
    assert all(v < 0 for v in ets.values()), (
        f"planted corpus did not drive raw excess negative: {ets}"
    )
    from breweries_data_engineering_case_spark.plans.registry import QUERIES

    got = {
        r["lang"]: r.asDict()
        for r in QUERIES["doremi_domain_mixture_weights"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == {"en", "fr"}
    for r in got.values():
        assert r["excess_micro_per_tok"] == 0  # the clip fired
        assert r["eg_score_nano"] == 1_000_000_000
        assert r["weight_ppm"] == 500_000


def test_distill_one_class_planted(spark, tmp_path):
    """All-drop teacher boundary: every planted doc fails the Gopher rule
    (<20 words), one has EMPTY text (no label row, no feature rows — the
    coalesce/left-join path). Dp=0 drives the bias to ln(1/(Dn+1)) < 0 and
    every class-positive count to zero; the student must predict drop for
    every doc and the confusion matrix collapses to tn=n with perfect
    in-sample accuracy. Replayed with the same brute force."""
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "source": ["s1", "s1", "s2"],
            "text": ["a b c", "", "x y"],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    from breweries_data_engineering_case_spark.plans.registry import QUERIES

    got = {
        r["source"]: r.asDict()
        for r in QUERIES["doc_quality_classifier_distill"](
            spark, str(tmp_path)
        ).collect()
    }
    want, _ = _distill_brute_force(docs)
    assert set(got) == set(want)
    for src, w in want.items():
        g = got[src]
        for k in (
            "n_docs",
            "n_keep_labels",
            "tp",
            "fp",
            "fn",
            "tn",
            "accuracy_ppm",
            "sum_score_micro",
        ):
            assert g[k] == w[k], f"{src}.{k}: spark {g[k]} != replay {w[k]}"
    assert sum(g["n_keep_labels"] for g in got.values()) == 0
    assert all(g["tn"] == g["n_docs"] for g in got.values())
    assert all(g["accuracy_ppm"] == 1_000_000 for g in got.values())


# ---------------------------------------------------------------------------
# dataset_epoch_repetition_plan (Muennighoff et al. 2023)
# ---------------------------------------------------------------------------


def _epoch_plan_brute_force(docs: pd.DataFrame):
    """Returns (per-source dict, frozen pre-floor doubles for the margin
    audit)."""
    uniq = {}
    for r in docs.itertuples():
        if not r.text.strip():
            continue
        uniq.setdefault(r.source, {})[
            hashlib.md5(r.text.encode("utf-8")).hexdigest()
        ] = len(_toks(r.text))
    uk = {src: sum(m.values()) for src, m in uniq.items()}
    b = 2 * sum(uk.values())
    k = len(uk)
    budget = b // k
    out = {}
    frozen = []
    for src, u in uk.items():
        epochs_milli = (1000 * budget) // u
        if budget <= u:
            eff = budget
            retention = 1_000_000
        else:
            x = u + 77 * u * (1 - math.exp(-(5 * (budget - u)) / (77 * u))) / 5
            frozen.append(x)
            eff = math.floor(x)
            retention = (1_000_000 * (eff - u)) // (budget - u)
        out[src] = {
            "unique_tokens": u,
            "budget_tokens": budget,
            "epochs_milli": epochs_milli,
            "effective_tokens": eff,
            "efficiency_ppm": (1_000_000 * eff) // budget,
            "repeat_retention_ppm": retention,
            "beyond_4_epochs": epochs_milli > 4000,
        }
    return out, frozen


@pytest.fixture(scope="module")
def epoch_plan(spark, sf_dir):
    from breweries_data_engineering_case_spark.plans.registry import QUERIES

    sdf = QUERIES["dataset_epoch_repetition_plan"](spark, sf_dir)
    got = {r["source"]: r.asDict() for r in sdf.collect()}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["source", "text"]]
    want, frozen = _epoch_plan_brute_force(docs)
    return got, want, frozen


def test_epoch_plan_brute_force_replay(epoch_plan):
    got, want, _ = epoch_plan
    assert set(got) == set(want)
    for src, w in want.items():
        g = got[src]
        for key in w:
            assert g[key] == w[key], (
                f"{src}.{key}: spark {g[key]} != replay {w[key]}"
            )


def test_epoch_plan_freeze_boundary_margin(epoch_plan):
    """The one non-integer step (floor of the decay formula) must sit far
    from an integer boundary relative to the cross-engine 1-ulp window
    of exp() — same discipline as the ln freezes."""
    _, _, frozen = epoch_plan
    assert frozen, "repeat branch never fired — the plan is all-fresh"
    worst = min(abs(x - round(x)) for x in frozen)
    assert worst >= 1e-6, f"decay floor-boundary margin too small: {worst}"


def test_epoch_plan_semantics_nonvacuous(epoch_plan):
    got, _, _ = epoch_plan
    for g in got.values():
        # a 2x-pool equal split means every source repeats (epochs > 1)...
        assert g["epochs_milli"] > 1000
        # ...so effective < budget (repetition is never free)...
        assert g["effective_tokens"] < g["budget_tokens"]
        # ...but the early-epoch regime retains most of the value
        assert 900_000 < g["repeat_retention_ppm"] < 1_000_000
        # monotone sanity: more unique supply => fewer epochs
    srcs = sorted(got.values(), key=lambda g: g["unique_tokens"])
    for a, b in zip(srcs, srcs[1:]):
        if a["unique_tokens"] < b["unique_tokens"]:
            assert a["epochs_milli"] >= b["epochs_milli"]


def test_epoch_plan_branches_planted(spark, tmp_path):
    """The testdata's balanced sources keep every row in the ~2-epoch
    regime, so neither the budget<=U all-fresh branch nor the
    beyond-4-epochs flag ever fires there. Plant a skewed corpus: one
    source with a huge unique supply (budget < U: all fresh, retention
    pinned at 1e6) and one tiny source that the equal split forces far
    past 4 epochs. A duplicated text in the tiny source checks that U
    counts DEDUPLICATED supply."""
    big = [
        " ".join(f"w{i}_{j}" for j in range(40)) for i in range(30)
    ]  # 1200 unique tokens in one source; with K=3 the equal split gives
    # budget = 2*(1200+10+5)//3 = 810 < 1200, so 'big' is all-fresh
    docs = pd.DataFrame(
        {
            "doc_id": list(range(1, 35)),
            "source": ["big"] * 30 + ["tiny"] * 3 + ["mini"],
            "text": big + ["q r s t u", "q r s t u", "v w x y z"]
            + ["m1 m2 m3 m4 m5"],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    from breweries_data_engineering_case_spark.plans.registry import QUERIES

    got = {
        r["source"]: r.asDict()
        for r in QUERIES["dataset_epoch_repetition_plan"](
            spark, str(tmp_path)
        ).collect()
    }
    want, _ = _epoch_plan_brute_force(docs)
    for src, w in want.items():
        for key in w:
            assert got[src][key] == w[key], (src, key, got[src], w)
    # the duplicate doc did not inflate the tiny source's unique supply
    assert got["tiny"]["unique_tokens"] == 10
    # all-fresh branch: the big source's budget is below one epoch
    assert got["big"]["budget_tokens"] < got["big"]["unique_tokens"]
    assert (
        got["big"]["effective_tokens"] == got["big"]["budget_tokens"]
    )
    assert got["big"]["repeat_retention_ppm"] == 1_000_000
    assert not got["big"]["beyond_4_epochs"]
    # deep-repetition branch: the tiny source blows past 4 epochs and its
    # repeated tokens retain well under full value
    assert got["tiny"]["beyond_4_epochs"]
    assert got["tiny"]["repeat_retention_ppm"] < 900_000


# ---------------------------------------------------------------------------
# dataset_unimax_allocation (Chung et al. 2023)
# ---------------------------------------------------------------------------


def _unimax_iterative(docs: pd.DataFrame):
    """The paper's ITERATIVE UniMax loop, from scratch — the registry
    query implements a closed-form water-fill; agreeing with this loop
    on every corpus is the proof the closed form IS UniMax. Returns the
    per-lang allocation dict."""
    uniq = {}
    for r in docs.itertuples():
        if not r.text.strip():
            continue
        uniq.setdefault(r.lang, {})[
            hashlib.md5(r.text.encode("utf-8")).hexdigest()
        ] = len(_toks(r.text))
    u = {lang: sum(m.values()) for lang, m in uniq.items()}
    b = (3 * sum(u.values())) // 2
    cap = {lang: 2 * uv for lang, uv in u.items()}
    # iterate: equal share among uncapped; cap those that can't absorb it
    capped: set = set()
    while True:
        remaining = b - sum(cap[lang] for lang in capped)
        uncapped = [lang for lang in cap if lang not in capped]
        if not uncapped:
            break
        share = remaining // len(uncapped)
        newly = {lang for lang in uncapped if cap[lang] < share}
        if not newly:
            break
        capped |= newly
    alloc = {lang: cap[lang] for lang in capped}
    if uncapped:
        level, extra = divmod(remaining, len(uncapped))
        # remainder goes to the smallest-capacity uncapped langs,
        # (capacity, lang) ascending — the closed form's rank order
        order = sorted(uncapped, key=lambda lang: (cap[lang], lang))
        for pos, lang in enumerate(order):
            alloc[lang] = level + (1 if pos < extra else 0)
    out = {}
    for lang, uv in u.items():
        a = alloc[lang]
        out[lang] = {
            "unique_tokens": uv,
            "capacity_tokens": cap[lang],
            "alloc_tokens": a,
            "epochs_milli": (1000 * a) // uv,
            "capped": a == cap[lang],
        }
    return out, b


def _run_unimax(spark, sf_dir):
    from breweries_data_engineering_case_spark.plans.registry import QUERIES

    return {
        r["lang"]: r.asDict()
        for r in QUERIES["dataset_unimax_allocation"](spark, sf_dir).collect()
    }


def test_unimax_closed_form_equals_iterative(spark, sf_dir):
    got = _run_unimax(spark, sf_dir)
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["lang", "text"]]
    want, b = _unimax_iterative(docs)
    assert set(got) == set(want)
    for lang, w in want.items():
        for key in w:
            assert got[lang][key] == w[key], (lang, key, got[lang], w)
    # exact budget: B = 1.5·ΣU < ΣC = 2·ΣU, so the fill always lands the
    # full budget (the all-capped surplus branch is unreachable by
    # construction with these constants — the guard in the query is
    # belt-and-braces for future constant changes)
    assert sum(g["alloc_tokens"] for g in got.values()) == b
    # the UniMax signature: en (the biggest language) is in the uncapped
    # tail, every capped language pins at exactly 2.000 epochs, and the
    # water level is non-degenerate at sf0.01+ (some capped, some not;
    # at sf0.001 the supplies can land all-uncapped — equality with the
    # iterative loop above is the load-bearing check there)
    assert not got["en"]["capped"]
    for g in got.values():
        if g["capped"]:
            assert g["epochs_milli"] == 2000
        else:
            assert g["epochs_milli"] < 2000
    uncapped_allocs = sorted(
        g["alloc_tokens"] for g in got.values() if not g["capped"]
    )
    assert uncapped_allocs[-1] - uncapped_allocs[0] <= 1  # equal water level


def test_unimax_all_uncapped_planted(spark, tmp_path):
    """Equal supplies: the 1.5x budget splits below every 2-epoch cap, so
    NO language is capped and the equal split differs only by the
    largest-remainder ±1."""
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "lang": ["aa", "bb", "cc"],
            "text": ["t1 t2 t3 t4", "s1 s2 s3 s4", "r1 r2 r3 r4"],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    got = _run_unimax(spark, str(tmp_path))
    want, b = _unimax_iterative(docs)
    for lang, w in want.items():
        for key in w:
            assert got[lang][key] == w[key], (lang, key, got[lang], w)
    assert not any(g["capped"] for g in got.values())
    allocs = sorted(g["alloc_tokens"] for g in got.values())
    assert allocs[-1] - allocs[0] <= 1  # equal split, remainder spread
    assert sum(allocs) == b


def test_unimax_deep_skew_planted(spark, tmp_path):
    """One giant language among dwarfs: every dwarf caps at 2 epochs and
    the giant absorbs the whole remainder uncapped — and a duplicated
    dwarf doc must NOT raise its unique supply (dedup-first)."""
    giant = " ".join(f"g{i}" for i in range(400))
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "lang": ["gg", "d1", "d1", "d2"],
            "text": [giant, "x y z", "x y z", "p q"],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    got = _run_unimax(spark, str(tmp_path))
    want, _ = _unimax_iterative(docs)
    for lang, w in want.items():
        for key in w:
            assert got[lang][key] == w[key], (lang, key, got[lang], w)
    assert got["d1"]["unique_tokens"] == 3  # duplicate collapsed
    assert got["d1"]["capped"] and got["d2"]["capped"]
    assert not got["gg"]["capped"]
