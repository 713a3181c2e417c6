#!/usr/bin/env python3
"""Third-engine crosscheck: independent numpy/pandas implementations of
the formula-heavy statistics, compared against a Verify dump.

The DuckDB oracle shares each query's FORMULA with the engine (the SQL
is authored alongside the Scala), so a formula transcribed wrongly in
both places passes the hash gate — exactly how the round-12 DTW
first-cell bug stayed invisible. This tool recomputes a sample of the
riskiest statistics from their TEXTBOOK definitions (midrank tests,
DP recurrences, estimators) straight off the fixture parquet, sharing
no code and no algebraic reformulation with either engine.

Usage: python3 tools/crosscheck.py <sfDir> <verifyOutDir>
"""
import sys
import math
import numpy as np
import duckdb


def out(con, outdir, name):
    return con.sql(
        f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()


def check(name, ok, detail=""):
    print(("PASS " if ok else "FAIL ") + name + (f": {detail}" if detail else ""))
    return ok


def midranks(values):
    """values -> rank array with ties sharing the average rank."""
    order = np.argsort(values, kind="stable")
    ranks = np.empty(len(values), dtype=float)
    sv = values[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0  # average of ranks i+1..j
        i = j
    return ranks


def main(sf, outdir):
    con = duckdb.connect()
    for t in ["orders", "customer", "events", "documents", "lineitem",
              "nation", "supplier"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    ok = True

    # ---- Mann-Whitney U (textbook midranks, tie-corrected z) ----
    df = con.sql("""SELECT CAST(round(o_totalprice*100) AS BIGINT) AS v,
        o_orderpriority = '1-URGENT' AS a FROM orders
        WHERE o_orderpriority IN ('1-URGENT','5-LOW')""").df()
    v = df["v"].to_numpy()
    isa = df["a"].to_numpy()
    r = midranks(v)
    na, nb = int(isa.sum()), int((~isa).sum())
    n = na + nb
    u = r[isa].sum() - na * (na + 1) / 2.0
    _, counts = np.unique(v, return_counts=True)
    tt = float((counts.astype(np.float64) ** 3 - counts).sum())
    sd = math.sqrt(na * nb / 12.0 * ((n + 1) - tt / (n * (n - 1))))
    z = (u - na * nb / 2.0) / sd
    got = out(con, outdir, "stats_mann_whitney").iloc[0]
    ok &= check("stats_mann_whitney",
                abs(got["u_stat"] - round(u, 2)) < 0.011 and
                abs(got["z_score"] - z) < 1e-5 and
                int(got["na"]) == na and int(got["nb"]) == nb,
                f"engine U={got['u_stat']} z={got['z_score']} vs ref U={u:.2f} z={z:.6f}")

    # ---- Kruskal-Wallis H (textbook midranks) ----
    df = con.sql("""SELECT CAST(round(value*100) AS BIGINT) AS v,
        event_type AS g FROM events""").df()
    v = df["v"].to_numpy()
    g = df["g"].to_numpy()
    r = midranks(v)
    n = len(v)
    ss = sum(r[g == grp].sum() ** 2 / (g == grp).sum() for grp in np.unique(g))
    h = 12.0 / (n * (n + 1)) * ss - 3.0 * (n + 1)
    _, counts = np.unique(v, return_counts=True)
    tt = float((counts.astype(np.float64) ** 3 - counts).sum())
    hc = h / (1.0 - tt / (float(n) ** 3 - n))
    got = out(con, outdir, "stats_kruskal_wallis").iloc[0]
    ok &= check("stats_kruskal_wallis",
                abs(got["h_stat"] - h) < 1e-4 and abs(got["h_corrected"] - hc) < 1e-4,
                f"engine H={got['h_stat']} Hc={got['h_corrected']} vs ref H={h:.6f} Hc={hc:.6f}")

    # ---- two-sample KS ----
    df = con.sql("""SELECT CAST(n_chars AS BIGINT) AS v, lang = 'en' AS a
        FROM documents""").df()
    va = np.sort(df[df["a"]]["v"].to_numpy())
    vb = np.sort(df[~df["a"]]["v"].to_numpy())
    allv = np.unique(df["v"].to_numpy())
    fa = np.searchsorted(va, allv, side="right") / len(va)
    fb = np.searchsorted(vb, allv, side="right") / len(vb)
    d = float(np.abs(fa - fb).max())
    got = out(con, outdir, "stats_ks_test").iloc[0]
    ok &= check("stats_ks_test", abs(got["ks_stat"] - d) < 1e-5,
                f"engine D={got['ks_stat']} vs ref D={d:.6f}")

    # ---- Cliff's delta (brute force over the two samples) ----
    df = con.sql("""SELECT CAST(n_chars AS BIGINT) AS v, lang AS g
        FROM documents WHERE lang IN ('en','fr')""").df()
    a = np.sort(df[df["g"] == "en"]["v"].to_numpy())
    b = np.sort(df[df["g"] == "fr"]["v"].to_numpy())
    gt = int(sum(len(a) - np.searchsorted(a, x, side="right") for x in b))
    lt = int(sum(np.searchsorted(a, x, side="left") for x in b))
    delta = (gt - lt) / (len(a) * len(b))
    got = out(con, outdir, "stats_cliffs_delta").iloc[0]
    ok &= check("stats_cliffs_delta",
                int(got["n_gt"]) == gt and int(got["n_lt"]) == lt and
                abs(got["cliffs_delta"] - delta) < 1e-5,
                f"engine gt={got['n_gt']} lt={got['n_lt']} δ={got['cliffs_delta']} "
                f"vs ref gt={gt} lt={lt} δ={delta:.6f}")

    # ---- Anderson-Darling per segment (erf-based Φ; the engine's
    # polynomial Φ is good to ~7.5e-8 abs, so tails loosen the bound) ----
    df = con.sql("""SELECT c_mktsegment AS seg,
        CAST(round(o_totalprice*100) AS BIGINT) AS c
        FROM orders JOIN customer ON o_custkey = c_custkey""").df()
    got = out(con, outdir, "stats_anderson_darling").set_index("seg")
    for seg, sub in df.groupby("seg"):
        x = np.sort(sub["c"].to_numpy().astype(np.float64))
        n = len(x)
        mu = x.mean()
        sd = x.std(ddof=1)
        z = (x - mu) / sd
        phi = 0.5 * (1.0 + np.vectorize(math.erf)(z / math.sqrt(2.0)))
        phi = np.clip(phi, 1e-300, 1 - 1e-16)
        i = np.arange(1, n + 1)
        s = ((2 * i - 1) * (np.log(phi) + np.log(1 - phi[::-1]))).sum()
        a2 = -n - s / n
        e = got.loc[seg, "a2"]
        ok &= check(f"stats_anderson_darling[{seg}]",
                    abs(e - a2) / max(abs(a2), 1.0) < 0.02,
                    f"engine A2={e} vs ref A2={a2:.4f}")

    # ---- Durbin-Watson per event type (OLS residuals over daily counts) ----
    df = con.sql("""SELECT event_type AS g,
        date_diff('day', DATE '2024-01-01', CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS t,
        count(*) AS y FROM events GROUP BY 1, 2 ORDER BY 1, 2""").df()
    got = out(con, outdir, "stats_durbin_watson").set_index("event_type")
    for grp, sub in df.groupby("g"):
        t = sub["t"].to_numpy().astype(np.float64)
        y = sub["y"].to_numpy().astype(np.float64)
        slope, icept = np.polyfit(t, y, 1)
        e = y - (icept + slope * t)
        dw = float(((e[1:] - e[:-1]) ** 2).sum() / (e ** 2).sum())
        ok &= check(f"stats_durbin_watson[{grp}]",
                    abs(got.loc[grp, "dw"] - dw) < 5e-4,
                    f"engine dw={got.loc[grp, 'dw']} vs ref {dw:.4f}")

    # ---- Kaplan-Meier (textbook product-limit estimator) ----
    df = con.sql("""WITH users AS (SELECT user_id,
          count(DISTINCT CAST(ts AS DATE)) AS t, CAST(max(ts) AS DATE) AS d1
        FROM events GROUP BY 1),
      mx AS (SELECT CAST(max(ts) AS DATE) AS dmax FROM events)
      SELECT t, (d1 = dmax) AS cens FROM users, mx ORDER BY t""").df()
    ts = np.sort(df["t"].unique())
    total = len(df)
    s = 1.0
    rows = []
    removed = 0
    for t in ts:
        at_t = df[df["t"] == t]
        d = int((~at_t["cens"]).sum())
        n_risk = total - removed
        if d > 0:
            s *= 1.0 - d / n_risk
            rows.append((int(t), n_risk, d, s))
        removed += len(at_t)
    got = out(con, outdir, "analytics_survival_km").sort_values("t")
    ref = list(rows)
    okk = len(got) == len(ref)
    if okk:
        for (t, nr, d, s), (_, row) in zip(ref, got.iterrows()):
            okk &= int(row["t"]) == t and int(row["n_risk"]) == nr and \
                int(row["deaths"]) == d and abs(row["s_km"] - s) < 1e-5
    ok &= check("analytics_survival_km", okk,
                f"{len(got)} rows vs ref {len(ref)}")

    # ---- DTW over hourly profiles (classic O(24^2) DP, |Δ| cost) ----
    df = con.sql("""SELECT event_type AS g,
        hour(CAST(ts AS TIMESTAMP)) AS h, count(*) AS y
        FROM events GROUP BY 1, 2""").df()
    profs = {}
    for grp, sub in df.groupby("g"):
        p = np.zeros(24, dtype=np.int64)
        p[sub["h"].to_numpy()] = sub["y"].to_numpy()
        profs[grp] = p

    def dtw(a, b):
        big = 10 ** 15
        D = np.full((24, 24), big, dtype=np.int64)
        for i in range(24):
            for j in range(24):
                c = abs(int(a[i]) - int(b[j]))
                if i == 0 and j == 0:
                    D[i, j] = c
                else:
                    best = min(
                        D[i - 1, j - 1] if i > 0 and j > 0 else big,
                        D[i - 1, j] if i > 0 else big,
                        D[i, j - 1] if j > 0 else big)
                    D[i, j] = c + best
        return int(D[23, 23])

    got = out(con, outdir, "ts_dtw")
    okk = True
    for _, row in got.iterrows():
        ref = dtw(profs[row["type_a"]], profs[row["type_b"]])
        l1 = int(np.abs(profs[row["type_a"]] - profs[row["type_b"]]).sum())
        if int(row["dtw"]) != ref or int(row["l1"]) != l1:
            okk = False
            print(f"  dtw({row['type_a']},{row['type_b']}): engine={row['dtw']} ref={ref}")
    ok &= check("ts_dtw", okk, f"{len(got)} pairs")

    # ---- PageRank over the nation trade graph (numpy power iteration) ----
    edges = con.sql("""SELECT CAST(c.c_nationkey AS BIGINT) AS src,
        CAST(s.s_nationkey AS BIGINT) AS dst, CAST(count(*) AS DOUBLE) AS w
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey GROUP BY 1, 2""").df()
    nn = 25
    P = np.zeros((nn, nn))
    for _, r2 in edges.iterrows():
        P[int(r2["src"]), int(r2["dst"])] = r2["w"]
    rowsum = P.sum(axis=1)
    dangling = rowsum == 0
    Pn = np.divide(P, rowsum[:, None], out=np.zeros_like(P),
                   where=rowsum[:, None] > 0)
    rank = np.full(nn, 1.0 / nn)
    got = out(con, outdir, "graph_pagerank").sort_values("nation_id")
    eng = got["pagerank"].to_numpy()
    ref_at = None
    for it in range(1, 101):
        rank = 0.15 / nn + 0.85 * (Pn.T @ rank + rank[dangling].sum() / nn)
        if np.allclose(np.round(rank, 6), eng, atol=2e-6):
            # the engine runs a fixed count; fast convergence can match
            # an earlier iterate within atol — either way the engine sits
            # ON the numpy trajectory, which is the point
            ref_at = it
            break
    ok &= check("graph_pagerank", ref_at is not None,
                f"on the numpy power-iteration trajectory (first atol "
                f"match at iteration {ref_at})"
                if ref_at else
                f"engine ranks are NOT on the numpy trajectory: "
                f"head={got.head(3).to_dict()}")

    # ---- Markov removal-effect attribution (independent journey
    # reconstruction + scenario remap + 20-step absorption) ----
    import pandas as pd
    ev = con.sql("""SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tu,
        event_id, CASE WHEN event_type='purchase' THEN 'conv'
        ELSE event_type END AS state FROM events""").df()
    ev = ev.sort_values(["user_id", "tu", "event_id"]).reset_index(drop=True)
    trans = []
    for _, sub in ev.groupby("user_id"):
        rows = sub.reset_index(drop=True)
        convs = rows.index[rows["state"] == "conv"]
        if len(convs):
            rows = rows.iloc[:convs[0] + 1]
        prev = "start"
        for st in rows["state"]:
            trans.append((prev, st))
            prev = st
        if not len(convs):
            trans.append((rows.iloc[-1]["state"], "null"))
    cnt = pd.DataFrame(trans, columns=["src", "dst"]) \
        .groupby(["src", "dst"]).size().reset_index(name="c")
    states = ["start", "view", "click", "signup", "error", "conv", "null"]

    def absorb(dfc, k=20):
        tot = dfc.groupby("src")["c"].transform("sum")
        p = dfc.assign(p=dfc["c"] / tot)
        v = {st: (1.0 if st == "conv" else 0.0) for st in states}
        for _ in range(k):
            nv = {}
            for st in states:
                if st == "conv":
                    nv[st] = 1.0
                elif st == "null":
                    nv[st] = 0.0
                else:
                    sub = p[p["src"] == st]
                    nv[st] = sum(sorted(float(r.p) * v[r.dst]
                                        for r in sub.itertuples()))
            v = nv
        return v["start"]

    vb = absorb(cnt)
    re = {}
    for ch in ["view", "click", "signup", "error"]:
        d = cnt[cnt["src"] != ch].copy()
        d["dst"] = d["dst"].where(d["dst"] != ch, "null")
        d = d.groupby(["src", "dst"], as_index=False)["c"].sum()
        re[ch] = (vb - absorb(d)) / vb
    sre = sum(sorted(re.values()))
    got = out(con, outdir, "analytics_markov_attribution")
    okk = True
    for _, row in got.iterrows():
        ch = row["channel"]
        okk &= abs(row["conv_base"] - vb) < 1e-5 and \
            abs(row["removal_effect"] - re[ch]) < 1e-5 and \
            abs(row["attribution_share"] - re[ch] / sre) < 1e-5
    ok &= check("analytics_markov_attribution", okk,
                f"base absorption ref={vb:.6f}")

    # ---- Shapley attribution, by a DIFFERENT algorithm: enumerate all
    # 4! channel orderings and average marginal contributions (the
    # engine uses the closed-form subset-weight formula instead) ----
    import itertools
    masks = con.sql("""WITH firstp AS (SELECT user_id, min(ts) AS pts
          FROM events WHERE event_type='purchase' GROUP BY 1),
        m0 AS (SELECT e.user_id,
            max(CASE WHEN e.event_type='view' THEN 1 ELSE 0 END)
            + max(CASE WHEN e.event_type='click' THEN 2 ELSE 0 END)
            + max(CASE WHEN e.event_type='signup' THEN 4 ELSE 0 END)
            + max(CASE WHEN e.event_type='error' THEN 8 ELSE 0 END) AS m
          FROM events e JOIN firstp f USING (user_id)
          WHERE e.ts < f.pts GROUP BY 1)
        SELECT coalesce(m, 0) AS m, count(*) AS c
        FROM firstp LEFT JOIN m0 USING (user_id) GROUP BY 1""").df()
    vfun = {}
    for ss in range(16):
        vfun[ss] = int(masks[(masks["m"].to_numpy() & (15 ^ ss)) == 0]["c"].sum())
    bits = {"view": 1, "click": 2, "signup": 4, "error": 8}
    phi = {ch: 0.0 for ch in bits}
    for perm in itertools.permutations(bits.keys()):
        s0 = 0
        for ch in perm:
            phi[ch] += vfun[s0 | bits[ch]] - vfun[s0]
            s0 |= bits[ch]
    phi = {ch: p / 24.0 for ch, p in phi.items()}
    got = out(con, outdir, "analytics_shapley_attribution")
    okk = all(abs(row["shapley"] - phi[row["channel"]]) < 1e-5
              for _, row in got.iterrows())
    # efficiency: Σφ = v(full) − v(∅) (v(∅) counts zero-touch converters)
    okk &= abs(sum(phi.values()) - (vfun[15] - vfun[0])) < 1e-9
    ok &= check("analytics_shapley_attribution", okk,
                f"ref φ={ {k: round(v_, 4) for k, v_ in phi.items()} }")

    # ---- Friedman χ² over day-blocks of event-type counts (textbook
    # tie-corrected form with per-block midranks) ----
    daily = con.sql("""SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
        event_type AS g, count(*) AS y FROM events GROUP BY 1, 2""").df()
    rsum = {}
    srr = 0.0
    nblocks = {}
    for _, sub in daily.groupby("d"):
        r = midranks(sub["y"].to_numpy())
        for grp, rk in zip(sub["g"], r):
            rsum[grp] = rsum.get(grp, 0.0) + rk
            nblocks[grp] = nblocks.get(grp, 0) + 1
        srr += float((r ** 2).sum())
    k = len(rsum)
    n = max(nblocks.values())
    sdev = sum((rj - n * (k + 1) / 2.0) ** 2 for rj in rsum.values())
    chi2 = (k - 1) * sdev / (srr - n * k * (k + 1) ** 2 / 4.0)
    got = out(con, outdir, "stats_friedman").iloc[0]
    ok &= check("stats_friedman",
                int(got["n_blocks"]) == n and abs(got["chi2_f"] - chi2) < 1e-3,
                f"engine χ²={got['chi2_f']} vs ref {chi2:.4f}")

    # ---- Cronbach's alpha over the 4 lineitem money items
    # (population variances, textbook k/(k-1)(1-Σv_i/v_tot)) ----
    li = con.sql("""SELECT CAST(round(l_quantity) AS BIGINT) AS q,
        CAST(round(l_extendedprice*100) AS BIGINT) AS p,
        CAST(round(l_discount*100) AS BIGINT) AS d,
        CAST(round(l_tax*100) AS BIGINT) AS t FROM lineitem""").df()
    items = [li[c].to_numpy().astype(np.float64) for c in ["q", "p", "d", "t"]]
    tot = sum(items)
    alpha = 4.0 / 3.0 * (1.0 - sum(x.var() for x in items) / tot.var())
    got = out(con, outdir, "stats_cronbach_alpha").iloc[0]
    acol = [c for c in got.index if "alpha" in c][0]
    ok &= check("stats_cronbach_alpha",
                abs(got[acol] - alpha) < 1e-4,
                f"engine α={got[acol]} vs ref {alpha:.6f}")

    # ---- simplified silhouette over the first-8 centroid book
    # (a = cosine distance to nearest centroid, b = to second) ----
    emb = con.sql("SELECT vec_id, embedding FROM read_parquet("
                  f"'{sf}/embeddings.parquet') ORDER BY vec_id").df()
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    C = X[:8]
    cos = (X @ C.T) / (np.linalg.norm(X, axis=1)[:, None]
                       * np.linalg.norm(C, axis=1)[None, :])
    # (cos DESC, cid) tie-break: argsort on (-cos, cid) lexicographic
    order = np.lexsort((np.arange(8)[None, :].repeat(len(X), 0),
                        -cos))  # last key primary
    best, second = order[:, 0], order[:, 1]
    a = 1.0 - cos[np.arange(len(X)), best]
    b = 1.0 - cos[np.arange(len(X)), second]
    sil = (b - a) / np.maximum(a, b)
    got = out(con, outdir, "sim_silhouette").sort_values("cid")
    okk = True
    for _, row in got.iterrows():
        m = best == int(row["cid"])
        okk &= int(row["n_vectors"]) == int(m.sum()) and \
            abs(row["mean_silhouette"] - sil[m].mean()) < 1e-3
    ok &= check("sim_silhouette", okk,
                f"{len(got)} clusters, ref mean sil={sil.mean():.4f}")

    print("== crosscheck " + ("ALL PASS" if ok else "HAS FAILURES"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
