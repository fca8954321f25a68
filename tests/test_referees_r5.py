"""Independent NumPy referees for the round-5 batch 16-19 entries whose
DuckDB oracles are mirrored-logic (same formula spelled in SQL): each
test re-derives the expected answer from the raw parquet with NumPy /
plain Python — a third implementation that would catch a shared
misconception in the Spark+SQL pair.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from es_analytics_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"


def _run(spark, name: str) -> pd.DataFrame:
    return REGISTRY[name].fn(spark, SF).toPandas()


def _events() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/events.parquet")


def test_geo_grid_nearest_matches_numpy_bruteforce(spark):
    """Referee: brute-force nearest supplier among those whose grid
    cell is in the customer's 3x3 neighborhood, straight NumPy."""
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    supp = pd.read_parquet(f"{SF}/supplier.parquet")
    ck = cust["c_custkey"].to_numpy(dtype=np.int64)
    sk = supp["s_suppkey"].to_numpy(dtype=np.int64)
    cx, cy = (ck * 48271 + 11) % 100000, (ck * 69621 + 7) % 100000
    sx, sy = (sk * 40692 + 3) % 100000, (sk * 16807 + 5) % 100000
    got = _run(spark, "geo_grid_nearest").set_index("c_custkey")
    n_checked = 0
    for i, c in enumerate(ck):
        near = (np.abs(sx // 10000 - cx[i] // 10000) <= 1) & (
            np.abs(sy // 10000 - cy[i] // 10000) <= 1
        )
        if not near.any():
            assert c not in got.index
            continue
        d2 = (cx[i] - sx[near]) ** 2 + (cy[i] - sy[near]) ** 2
        cand = sk[near]
        best = np.lexsort((cand, d2))[0]
        row = got.loc[c]
        assert int(row["nearest_suppkey"]) == int(cand[best])
        assert int(row["dist2"]) == int(d2[best])
        n_checked += 1
    assert n_checked > 0  # vacuous-entry trap


def test_stat_bh_fdr_matches_numpy(spark):
    """Referee: z, p (A&S 26.2.17), and the BH step-up recomputed from
    the raw events with NumPy float64."""
    ev = _events()
    dow = (
        ev["ts"].to_numpy().astype("datetime64[D]").astype(np.int64) % 7
    )
    key = pd.DataFrame({"t": ev["event_type"], "d": dow, "v": ev["value"]})
    v = ev["value"].to_numpy()
    n_g, s_g, ss_g = len(v), v.sum(), (v * v).sum()
    sd = math.sqrt((ss_g - s_g * s_g / n_g) / n_g)
    rows = []
    for (t, d), grp in key.groupby(["t", "d"]):
        n_c, s_c = len(grp), grp["v"].sum()
        z = (s_c / n_c - s_g / n_g) / (sd / math.sqrt(n_c))
        az = abs(z)
        tt = 1.0 / (1.0 + 0.2316419 * az)
        pdf = 0.3989422804014327 * math.exp(-0.5 * az * az)
        poly = tt * (
            0.319381530
            + tt
            * (
                -0.356563782
                + tt * (1.781477937 + tt * (-1.821255978 + tt * 1.330274429))
            )
        )
        rows.append((t, d, z, 2.0 * pdf * poly))
    ref = pd.DataFrame(rows, columns=["event_type", "dow", "z", "p"])
    ref = ref.sort_values(["p", "event_type", "dow"]).reset_index(drop=True)
    m = len(ref)
    ref["rk"] = np.arange(1, m + 1)
    ok = ref["p"] <= 0.1 * ref["rk"] / m
    k = int(ref["rk"][ok].max()) if ok.any() else 0
    ref["rejected"] = (ref["rk"] <= k).astype(int)
    got = _run(spark, "stat_bh_fdr")
    merged = got.merge(ref, on=["event_type", "dow"], suffixes=("", "_r"))
    assert len(merged) == m == len(got)
    # quantized engine outputs vs full-precision referee: 1e-5 slack
    assert np.allclose(merged["z"], merged["z_r"], atol=2e-5)
    assert np.allclose(merged["p"], merged["p_r"], atol=2e-5)
    assert (merged["p_rank"] == merged["rk"]).all()
    assert (merged["rejected"] == merged["rejected_r"]).all()


def test_ml_ols_two_features_matches_lstsq(spark):
    """Referee: numpy.linalg.lstsq on the raw lineitem design matrix."""
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    X = np.column_stack(
        [
            np.ones(len(li)),
            li["l_quantity"].to_numpy(),
            li["l_discount"].to_numpy(),
        ]
    )
    yv = li["l_extendedprice"].to_numpy()
    beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
    yhat = X @ beta
    ss_res = ((yv - yhat) ** 2).sum()
    ss_tot = ((yv - yv.mean()) ** 2).sum()
    got = _run(spark, "ml_ols_two_features").iloc[0]
    assert got["n_rows"] == len(li)
    assert abs(got["intercept"] - beta[0]) < 1e-3 * max(1.0, abs(beta[0]))
    assert abs(got["beta_quantity"] - beta[1]) < 1e-3 * max(1.0, abs(beta[1]))
    assert abs(got["beta_discount"] - beta[2]) < 1e-3 * max(1.0, abs(beta[2]))
    assert abs(got["r2"] - (1 - ss_res / ss_tot)) < 1e-6


def test_holt_winters_matches_numpy_recursion(spark):
    """Referee: the textbook recurrence in raw NumPy float64 over the
    daily decimal-contract sums, plus the y = fitted + residual
    reconstruction identity."""
    ev = _events()
    day = ev["ts"].to_numpy().astype("datetime64[D]")
    daily = (
        pd.DataFrame({"d": day, "v": ev["value"]})
        .groupby("d")["v"]
        .apply(lambda s: round(float(s.astype(float).sum()), 4))
        .sort_index()
    )
    ys = daily.to_numpy()
    l0 = ys[:7].mean()
    b0 = (ys[7:14].mean() - ys[:7].mean()) / 7
    s = list(ys[:7] - l0)
    lev, tr = l0, b0
    ref = []
    for t in range(7, len(ys)):
        s7 = s[0]
        fitted = lev + tr + s7
        l_new = 0.5 * (ys[t] - s7) + 0.5 * (lev + tr)
        b_new = 0.25 * (l_new - lev) + 0.75 * tr
        s_new = 0.25 * (ys[t] - l_new) + 0.75 * s7
        s = s[1:] + [s_new]
        lev, tr = l_new, b_new
        ref.append((daily.index[t], l_new, b_new, fitted))
    got = _run(spark, "ts_holt_winters_additive").sort_values("day")
    assert len(got) == len(ref)
    for (d, lv, bv, fv), (_, row) in zip(ref, got.iterrows()):
        assert row["day"].to_datetime64().astype("datetime64[D]") == d
        assert abs(row["level"] - lv) < 1e-4
        assert abs(row["trend"] - bv) < 1e-4
        assert abs(row["fitted"] - fv) < 1e-4
        assert abs(row["y"] - row["fitted"] - row["residual"]) < 2e-6


def test_silhouette_matches_sklearn_style_numpy(spark):
    """Referee: simplified silhouette in dense NumPy (centroids, own vs
    nearest-other distance, (b-a)/max(a,b)) over the raw embeddings."""
    em = pd.read_parquet(f"{SF}/embeddings.parquet")
    X = np.stack(em["embedding"].to_numpy()).astype(np.float64)
    lab = em["label"].to_numpy()
    labels = np.unique(lab)
    cents = np.stack([X[lab == c].mean(axis=0) for c in labels])
    d = np.sqrt(((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2))
    own_idx = np.searchsorted(labels, lab)
    a = d[np.arange(len(X)), own_idx]
    dd = d.copy()
    dd[np.arange(len(X)), own_idx] = np.inf
    b = dd.min(axis=1)
    sil = (b - a) / np.maximum(a, b)
    ref = pd.DataFrame({"label": lab, "sil": sil}).groupby("label")["sil"].mean()
    got = _run(spark, "ml_silhouette_by_label").set_index("label")
    assert len(got) == len(ref)
    for c in labels:
        assert abs(got.loc[c, "avg_silhouette"] - ref.loc[c]) < 1e-4
        assert got.loc[c, "n_vecs"] == int((lab == c).sum())


def test_drawdown_spells_reconstruct(spark):
    """Referee: spells recomputed with a plain Python scan over the
    daily net-flow curve."""
    ev = _events()
    day = ev["ts"].to_numpy().astype("datetime64[D]")
    flow = np.where(
        ev["event_type"] == "purchase",
        ev["value"],
        np.where(ev["event_type"] == "error", -ev["value"], 0.0),
    )
    daily = (
        pd.DataFrame({"d": day, "v": flow})
        .groupby("d")["v"]
        .sum()
        .sort_index()
    )
    eq = daily.cumsum().to_numpy()
    rm = np.maximum.accumulate(eq)
    under = eq < rm - 1e-9
    spells = []
    i = 0
    while i < len(eq):
        if under[i]:
            j = i
            while j < len(eq) and under[j]:
                j += 1
            spells.append((daily.index[i], j - i, float((rm - eq)[i:j].max())))
            i = j
        else:
            i += 1
    got = _run(spark, "ts_drawdown_spells").sort_values("spell_start")
    assert len(got) == len(spells)
    for (d, n, depth), (_, row) in zip(spells, got.iterrows()):
        assert row["spell_start"].to_datetime64().astype("datetime64[D]") == d
        assert row["n_days"] == n
        assert abs(row["max_depth"] - depth) < 1e-3


def test_threshold_tuning_confusion_identities(spark):
    """Structural referee: confusion counts are monotone in the
    threshold, tp+fn is constant, exactly one best row, and F1 at the
    best row equals max F1."""
    got = _run(spark, "ml_threshold_tuning").sort_values("threshold")
    assert list(got["threshold"]) == list(range(8))
    pos = got["tp"] + got["fn"]
    assert pos.nunique() == 1
    assert (got["tp"].diff().dropna() <= 0).all()
    assert (got["fn"].diff().dropna() >= 0).all()
    assert got["is_best"].sum() == 1
    best = got[got["is_best"] == 1].iloc[0]
    assert best["f1"] == got["f1"].max()
    # F1 identity on the best row
    tp, fp, fn = best["tp"], best["fp"], best["fn"]
    if tp > 0:
        assert abs(best["f1"] - 2 * tp / (2 * tp + fp + fn)) < 2e-6
