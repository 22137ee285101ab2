#!/usr/bin/env python3
"""Gaussian stdio model worker for graft.providers.ProcessProvider.

The cross-language half of the out-of-process generator seam: the JVM
writes one JSON request line to stdin, the worker prints one JSON
response line to stdout and exits (stateless worker per call; the fitted
model travels inside the messages). Plays the role the reference's
Python model libraries play behind its adapters — a real subprocess, not
a JVM mock.

Protocol (mirrors ProcessProvider.scala's scaladoc):
  -> {"op":"fit","schema":{"numericCols":[...],...},"data":[{row},...]}
  -> {"op":"fit","schema":{...},"data_format":"arrow-ipc-files",
      "data_files":["/shared/part-00000-00000.arrow",...]}
  <- {"ok":true,"model":{"seed":S,"stats":{col:{"mean":m,"std":s}}}}
  -> {"op":"generate","model":<blob>,"n":N,"seqLen":L}
  <- {"ok":true,"rows":[{"seq_id":0,"step":0,col:v,...},...]}
  <- {"ok":false,"error":"message"}            (any failure; exit 0)

The Arrow data plane ("data_files") needs pyarrow: each file is a
self-contained IPC stream (schema preamble + one record batch) written
by the Spark executors — the JVM driver never materializes the rows.

Three model families, chosen by argv:
  (default)  per-numeric-column Gaussian (mean, population std) — pure
             stdlib, no third-party imports;
  "ar"       per-numeric-column AR(2) fitted with numpy.linalg.lstsq on
             per-entity lagged design rows (rows grouped by itemIdCols,
             ordered by tsCol; lags never bleed across entities) — a
             genuinely foreign numeric runtime standing where the
             reference's TF/Torch model libraries stand behind its
             adapters;
  "par"      PAR-style conditional sequence model (the SDV PARSynthesizer
             shape the reference wraps in sdv_adapter.py:94-130): the
             itemIdCols are CONTEXT columns, each fitted context carries
             its per-column level (mean) and init tail, and the temporal
             dynamics are a SHARED AR(order) on deviations from the
             context level, fitted with numpy lstsq across all entities.
             generate REQUIRES a "context" field in the request (one
             sequence per context row), mirroring the reference's
             "Missing context dataframe" ValueError
             (sdv_adapter.py:68 / tests/test_par.py:43-45); an EMPTY
             context list means "cycle the fitted contexts for n
             sequences" (the generation_arguments convenience);
  "timegan"  ydata-TimeGAN-style scale->window->shared-dynamics
             composition (ydata_adapter.py:267-322): MinMaxScaler over
             the numeric columns, sliding windows of `seqlen=N` (argv,
             default 8; the TrainParameters.sequence_length seat) over
             the time-ordered frame — len-seq_len windows, the
             reference's own off-by-one preserved — and a pooled lstsq
             AR(1) on scaled deviations fitted within windows; generate
             clamps to the scaled [0,1] range (the sigmoid seat) and
             inverse-transforms back to original units. No entity
             grouping: TimeGAN treats the frame as ONE multivariate
             series;
  "dgan"     DoppleGANger-style attribute/feature split (the synthcity
             shape the reference wraps in synthcity_adapter.py:109-155;
             doppleganger.py:39-41 — ATTRIBUTES are per-sequence
             constants drawn from a static distribution, FEATURES are
             the conditioned dynamics): fit learns the empirical
             attribute-tuple distribution over the catCols plus
             per-tuple numeric levels and a shared lstsq AR(1) on
             deviations; generate samples a seeded attribute tuple per
             sequence and emits the tuple's columns alongside the
             conditioned series — no context frame needed (the static
             model IS the context distribution).

Both carry a seeded PRNG in the model blob, so the same model produces
bit-identical sequences across fresh worker processes. The generate op
dispatches on the blob's "type" tag, not argv — the blob is opaque to
the JVM and round-trips verbatim.

Argv "fail" forces the error response (exercises the JVM error path).
"""
import json
import math
import random
import sys


def _arrow_rows(paths):
    import pyarrow as pa  # only the Arrow data plane needs it
    rows = []
    for p in paths:
        with open(p, "rb") as f:
            with pa.ipc.open_stream(f) as reader:
                for batch in reader:
                    rows.extend(batch.to_pylist())
    return rows


def _fit_ar(schema, rows, order=2):
    """Per-column AR(order) via numpy lstsq over per-entity lagged rows."""
    import numpy as np
    cols = schema["numericCols"]
    ids = schema.get("itemIdCols") or []
    ts = schema.get("tsCol")

    def key(r):
        k = tuple(str(r.get(c)) for c in ids)
        return k + ((r.get(ts),) if ts else ())

    ordered = sorted(rows, key=key)
    series = {}
    for r in ordered:
        series.setdefault(tuple(str(r.get(c)) for c in ids), {})
        for c in cols:
            v = r.get(c)
            if isinstance(v, (int, float)):
                series[tuple(str(r.get(cc)) for cc in ids)] \
                    .setdefault(c, []).append(float(v))
    coef = {}
    for c in cols:
        X, y, tail = [], [], []
        for ent in series.values():
            vs = ent.get(c, [])
            for t in range(order, len(vs)):
                X.append([1.0] + [vs[t - 1 - j] for j in range(order)])
                y.append(vs[t])
            if vs:
                tail = vs  # last entity's series seeds generation inits
        if len(y) > order:
            Xa, ya = np.asarray(X), np.asarray(y)
            beta, _, _, _ = np.linalg.lstsq(Xa, ya, rcond=None)
            resid = ya - Xa @ beta
            sigma = float(np.sqrt(float(np.mean(resid ** 2))))
            bs = [float(b) for b in beta]
        else:  # too short to fit: constant-mean degenerate AR
            allv = [v for ent in series.values() for v in ent.get(c, [])]
            m = sum(allv) / len(allv) if allv else 0.0
            bs, sigma = [m] + [0.0] * order, 0.0
        init = (tail[-order:] if len(tail) >= order
                else [0.0] * (order - len(tail)) + tail)
        coef[c] = {"beta": bs, "sigma": sigma, "init": init}
    return {"ok": True,
            "model": {"type": "ar", "seed": 20260814, "order": order,
                      "coef": coef}}


def _generate_ar(req):
    model = req["model"]
    rng = random.Random(int(model.get("seed", 0)))
    order = int(model.get("order", 2))
    cols = sorted(model["coef"])
    rows = []
    for s in range(int(req["n"])):
        state = {c: list(model["coef"][c]["init"]) for c in cols}
        for t in range(int(req["seqLen"])):
            row = {"seq_id": s, "step": t}
            for c in cols:
                m = model["coef"][c]
                x = m["beta"][0] + sum(
                    m["beta"][1 + j] * state[c][-1 - j] for j in range(order))
                x += m["sigma"] * rng.gauss(0.0, 1.0)
                state[c] = (state[c] + [x])[-order:]
                row[c] = x
            rows.append(row)
    return {"ok": True, "rows": rows}


def _group_series(schema, rows):
    """rows -> {context key tuple: {col: ordered value list}} (ordered by
    tsCol within each context; contexts are the itemIdCols tuple)."""
    cols = schema["numericCols"]
    ids = schema.get("itemIdCols") or []
    ts = schema.get("tsCol")
    ordered = sorted(rows, key=lambda r: (
        tuple(str(r.get(c)) for c in ids),
        (r.get(ts),) if ts else ()))
    series = {}
    for r in ordered:
        key = tuple(str(r.get(c)) for c in ids)
        ent = series.setdefault(key, {})
        for c in cols:
            v = r.get(c)
            if isinstance(v, (int, float)):
                ent.setdefault(c, []).append(float(v))
    return series


def _fit_par(schema, rows, order=1):
    """PAR-style fit: per-CONTEXT level + init tail, SHARED AR(order)
    dynamics on deviations from the level (lstsq pooled across entities,
    no intercept — deviations are centered per entity)."""
    import numpy as np
    cols = schema["numericCols"]
    ids = schema.get("itemIdCols") or []
    if not ids:
        return {"ok": False,
                "error": "Missing context dataframe: PAR requires "
                         "itemIdCols as context columns"}
    series = _group_series(schema, rows)
    contexts = []
    for key in sorted(series):
        stats = {}
        for c in cols:
            vs = series[key].get(c, [])
            mean = sum(vs) / len(vs) if vs else 0.0
            init = (vs[-order:] if len(vs) >= order
                    else [mean] * (order - len(vs)) + vs)
            stats[c] = {"mean": mean, "init": init}
        contexts.append({"key": list(key), "stats": stats})
    dyn = {}
    for c in cols:
        X, y = [], []
        for key, ent in series.items():
            vs = ent.get(c, [])
            if len(vs) <= order:
                continue
            m = sum(vs) / len(vs)
            dev = [v - m for v in vs]
            for t in range(order, len(dev)):
                X.append([dev[t - 1 - j] for j in range(order)])
                y.append(dev[t])
        if len(y) > order:
            Xa, ya = np.asarray(X), np.asarray(y)
            beta, _, _, _ = np.linalg.lstsq(Xa, ya, rcond=None)
            resid = ya - Xa @ beta
            sigma = float(np.sqrt(float(np.mean(resid ** 2))))
            phis = [float(b) for b in beta]
        else:
            phis, sigma = [0.0] * order, 0.0
        dyn[c] = {"phi": phis, "sigma": sigma}
    return {"ok": True,
            "model": {"type": "par", "seed": 20260815, "order": order,
                      "context_columns": ids, "contexts": contexts,
                      "dyn": dyn}}


def _generate_par(req):
    model = req["model"]
    if "context" not in req:
        # the reference's error path: ParGenerator.generate without a
        # context frame raises ValueError (sdv_adapter.py:68)
        return {"ok": False, "error": "Missing context dataframe"}
    fitted = model["contexts"]
    if not fitted:
        return {"ok": False, "error": "model has no fitted contexts"}
    ids = model["context_columns"]
    ctx = req["context"]
    if not ctx:  # empty frame: cycle fitted contexts for n sequences
        n = int(req.get("n", 0))
        ctx = [dict(zip(ids, fitted[i % len(fitted)]["key"]))
               for i in range(n)]
    by_key = {tuple(c["key"]): c["stats"] for c in fitted}
    rng = random.Random(int(model.get("seed", 0)))
    order = int(model.get("order", 1))
    cols = sorted(model["dyn"])
    rows = []
    for s, c_row in enumerate(ctx):
        key = tuple(str(c_row.get(c)) for c in ids)
        stats = by_key.get(key)
        if stats is None:
            return {"ok": False,
                    "error": "unknown context %r (not in fit data)" % (key,)}
        state = {c: [v - stats[c]["mean"] for v in stats[c]["init"]]
                 for c in cols}
        for t in range(int(req["seqLen"])):
            row = {"seq_id": s, "step": t}
            for i, c in enumerate(ids):
                row[c] = c_row.get(c)
            for c in cols:
                d = model["dyn"][c]
                dev = sum(d["phi"][j] * state[c][-1 - j]
                          for j in range(order))
                dev += d["sigma"] * rng.gauss(0.0, 1.0)
                state[c] = (state[c] + [dev])[-order:]
                row[c] = stats[c]["mean"] + dev
            rows.append(row)
    return {"ok": True, "rows": rows}


def _fit_dgan(schema, rows, order=1):
    """DoppleGANger-style fit: empirical attribute-tuple distribution
    (catCols, constant per entity) + per-tuple numeric levels + shared
    lstsq AR(order) dynamics on deviations from the tuple level."""
    import numpy as np
    cols = schema["numericCols"]
    ids = schema.get("itemIdCols") or []
    cats = schema.get("catCols") or []
    if not cats:
        return {"ok": False,
                "error": "dgan requires catCols as the attribute columns"}
    if not ids:
        # without entity keys every row collapses into one pseudo-entity
        # and only the first row's attribute tuple would ever be fitted
        return {"ok": False,
                "error": "dgan requires itemIdCols (entity keys)"}
    series = _group_series(schema, rows)
    # entity -> attribute tuple (first row's catCols; constants per
    # entity by the DoppleGANger contract)
    ts = schema.get("tsCol")
    ordered = sorted(rows, key=lambda r: (
        tuple(str(r.get(c)) for c in ids), (r.get(ts),) if ts else ()))
    ent_attrs = {}
    for r in ordered:
        key = tuple(str(r.get(c)) for c in ids)
        if key not in ent_attrs:
            ent_attrs[key] = tuple(
                "" if r.get(c) is None else str(r.get(c)) for c in cats)
    n_ent = len(ent_attrs) or 1
    # attribute distribution + per-tuple numeric levels
    tuples = {}
    for key, attr in ent_attrs.items():
        t = tuples.setdefault(attr, {"n": 0, "vals": {c: [] for c in cols}})
        t["n"] += 1
        for c in cols:
            t["vals"][c].extend(series.get(key, {}).get(c, []))
    attrs = []
    for attr in sorted(tuples):
        t = tuples[attr]
        stats = {}
        for c in cols:
            vs = t["vals"][c]
            m = sum(vs) / len(vs) if vs else 0.0
            stats[c] = {"mean": m}
        attrs.append({"attr": list(attr), "p": t["n"] / n_ent,
                      "stats": stats})
    # shared dynamics: pooled AR(order) on deviations from the TUPLE level
    dyn = {}
    for c in cols:
        X, y = [], []
        for key, ent in series.items():
            vs = ent.get(c, [])
            if len(vs) <= order:
                continue
            # tuple level for this entity's column
            mu = 0.0
            for a in attrs:
                if tuple(a["attr"]) == ent_attrs[key]:
                    mu = a["stats"][c]["mean"]
                    break
            dev = [v - mu for v in vs]
            for t in range(order, len(dev)):
                X.append([dev[t - 1 - j] for j in range(order)])
                y.append(dev[t])
        if len(y) > order:
            Xa, ya = np.asarray(X), np.asarray(y)
            beta, _, _, _ = np.linalg.lstsq(Xa, ya, rcond=None)
            resid = ya - Xa @ beta
            sigma = float(np.sqrt(float(np.mean(resid ** 2))))
            phis = [float(b) for b in beta]
        else:
            phis, sigma = [0.0] * order, 0.0
        dyn[c] = {"phi": phis, "sigma": sigma}
    return {"ok": True,
            "model": {"type": "dgan", "seed": 20260816, "order": order,
                      "cat_columns": cats, "attrs": attrs, "dyn": dyn}}


def _generate_dgan(req):
    model = req["model"]
    rng = random.Random(int(model.get("seed", 0)))
    order = int(model.get("order", 1))
    cats = model["cat_columns"]
    attrs = model["attrs"]
    if not attrs:
        return {"ok": False, "error": "model has no fitted attributes"}
    cols = sorted(model["dyn"])
    rows = []
    for s in range(int(req["n"])):
        u = rng.random()
        acc, pick = 0.0, attrs[-1]
        for a in attrs:
            acc += a["p"]
            if u < acc:
                pick = a
                break
        state = {c: [0.0] * order for c in cols}
        for t in range(int(req["seqLen"])):
            row = {"seq_id": s, "step": t}
            for i, c in enumerate(cats):
                row[c] = pick["attr"][i]
            for c in cols:
                d = model["dyn"][c]
                dev = sum(d["phi"][j] * state[c][-1 - j]
                          for j in range(order))
                dev += d["sigma"] * rng.gauss(0.0, 1.0)
                state[c] = (state[c] + [dev])[-order:]
                row[c] = pick["stats"][c]["mean"] + dev
            rows.append(row)
    return {"ok": True, "rows": rows}


def _argv_seqlen(default=8):
    for a in sys.argv[1:]:
        if a.startswith("seqlen="):
            return int(a.split("=", 1)[1])
    return default


def _fit_timegan(schema, rows, seq_len, order=1):
    """ydata-TimeGAN-style fit — the scale -> window -> shared-dynamics
    composition of ydata_adapter.py:267-322 behind the same seam:
      1. MinMaxScaler over the numeric columns (GLOBAL min/max; the
         adapter's transformer scales the whole frame — no entity
         grouping, TimeGAN treats the frame as one multivariate series);
      2. sliding windows of seq_len, stride 1, over the time-ordered
         frame. preprocess_timegan/real_data_loading emits exactly
         len(rows) - seq_len windows — ONE FEWER than the full count
         (the reference notes the skipped element "might be a bug";
         the observable window set is mirrored);
      3. shared dynamics: pooled lstsq AR(order) per column on scaled
         deviations from the column's scaled mean, fitted strictly
         WITHIN windows (lags never cross a window boundary).
    Rows with any missing numeric value are dropped before scaling. The
    blob carries the scaler bounds, so generate emits ORIGINAL units via
    the adapter's inverse_transform step; sequence starts cycle the
    fitted window inits (capped model state)."""
    import numpy as np
    cols = schema["numericCols"]
    ts = schema.get("tsCol")
    ids = schema.get("itemIdCols") or []
    # rows with a null ts cannot be temporally ordered -> dropped, like
    # rows with missing numeric values (a raw None in a sort key would
    # TypeError against real timestamps)
    usable = [r for r in rows if (not ts or r.get(ts) is not None)]
    ordered = sorted(usable, key=lambda r: (
        (r.get(ts),) if ts else (),
        tuple(str(r.get(c)) for c in ids)))
    kept = [r for r in ordered
            if all(isinstance(r.get(c), (int, float)) for c in cols)]
    if len(kept) <= seq_len:
        return {"ok": False,
                "error": "timegan requires more rows than "
                         "sequence_length=%d (got %d)" % (seq_len, len(kept))}
    scaler = {}
    for c in cols:
        vs = [float(r[c]) for r in kept]
        scaler[c] = {"min": min(vs), "max": max(vs)}

    def scale(c, v):
        s = scaler[c]
        span = s["max"] - s["min"]
        return (v - s["min"]) / span if span > 0.0 else 0.0

    scaled = {c: [scale(c, float(r[c])) for r in kept] for c in cols}
    n_win = len(kept) - seq_len  # real_data_loading: range(len - seq_len)
    means = {c: sum(scaled[c]) / len(scaled[c]) for c in cols}
    dyn = {}
    for c in cols:
        dev = [v - means[c] for v in scaled[c]]
        X, y = [], []
        for i in range(n_win):
            w = dev[i:i + seq_len]
            for t in range(order, seq_len):
                X.append([w[t - 1 - j] for j in range(order)])
                y.append(w[t])
        if len(y) > order:
            Xa, ya = np.asarray(X), np.asarray(y)
            beta, _, _, _ = np.linalg.lstsq(Xa, ya, rcond=None)
            resid = ya - Xa @ beta
            sigma = float(np.sqrt(float(np.mean(resid ** 2))))
            phis = [float(b) for b in beta]
        else:
            phis, sigma = [0.0] * order, 0.0
        dyn[c] = {"phi": phis, "sigma": sigma}
    inits = [{c: scaled[c][i:i + order] for c in cols}
             for i in range(min(n_win, 64))]
    return {"ok": True,
            "model": {"type": "timegan", "seed": 20260817, "order": order,
                      "seq_len": seq_len, "scaler": scaler, "means": means,
                      "inits": inits, "dyn": dyn}}


def _generate_timegan(req):
    model = req["model"]
    rng = random.Random(int(model.get("seed", 0)))
    order = int(model.get("order", 1))
    scaler = model["scaler"]
    means = model["means"]
    inits = model["inits"]
    if not inits:
        return {"ok": False, "error": "model has no fitted windows"}
    cols = sorted(model["dyn"])
    rows = []
    for s in range(int(req["n"])):
        init = inits[s % len(inits)]
        state = {c: [v - means[c] for v in init[c]] for c in cols}
        for t in range(int(req["seqLen"])):
            row = {"seq_id": s, "step": t}
            for c in cols:
                d = model["dyn"][c]
                dev = sum(d["phi"][j] * state[c][-1 - j]
                          for j in range(order))
                dev += d["sigma"] * rng.gauss(0.0, 1.0)
                state[c] = (state[c] + [dev])[-order:]
                # TimeGAN emits through a sigmoid: clamp to the scaled
                # [0, 1] range, then the adapter's inverse_transform
                v = means[c] + dev
                v = 0.0 if v < 0.0 else (1.0 if v > 1.0 else v)
                sc = scaler[c]
                row[c] = sc["min"] + v * (sc["max"] - sc["min"])
            rows.append(row)
    return {"ok": True, "rows": rows}


def handle(req):
    op = req.get("op")
    if op == "fit":
        cols = req["schema"]["numericCols"]
        if req.get("data_format") == "arrow-ipc-files":
            rows = _arrow_rows(req["data_files"])
        else:
            rows = req["data"]
        if "timegan" in sys.argv[1:]:
            return _fit_timegan(req["schema"], rows, _argv_seqlen())
        if "dgan" in sys.argv[1:]:
            return _fit_dgan(req["schema"], rows)
        if "par" in sys.argv[1:]:
            return _fit_par(req["schema"], rows)
        if "ar" in sys.argv[1:]:
            return _fit_ar(req["schema"], rows)
        stats = {}
        for c in cols:
            vs = [float(r[c]) for r in rows
                  if isinstance(r.get(c), (int, float))]
            n = len(vs)
            mean = sum(vs) / n if n else 0.0
            var = sum((v - mean) ** 2 for v in vs) / n if n else 0.0
            stats[c] = {"mean": mean, "std": math.sqrt(var)}
        return {"ok": True,
                "model": {"seed": 20260812, "stats": stats}}
    if op == "generate":
        if req["model"].get("type") == "timegan":
            return _generate_timegan(req)
        if req["model"].get("type") == "dgan":
            return _generate_dgan(req)
        if req["model"].get("type") == "par":
            return _generate_par(req)
        if req["model"].get("type") == "ar":
            return _generate_ar(req)
        model = req["model"]
        rng = random.Random(int(model.get("seed", 0)))
        cols = sorted(model["stats"])
        rows = []
        for s in range(int(req["n"])):
            for t in range(int(req["seqLen"])):
                row = {"seq_id": s, "step": t}
                for c in cols:
                    st = model["stats"][c]
                    row[c] = st["mean"] + st["std"] * rng.gauss(0.0, 1.0)
                rows.append(row)
        return {"ok": True, "rows": rows}
    return {"ok": False, "error": "unknown op %r" % (op,)}


def main():
    line = sys.stdin.readline()
    if "fail" in sys.argv[1:]:
        print(json.dumps({"ok": False, "error": "boom"}))
        return
    try:
        resp = handle(json.loads(line))
    except Exception as e:  # malformed request -> protocol error, exit 0
        resp = {"ok": False, "error": "%s: %s" % (type(e).__name__, e)}
    print(json.dumps(resp))


if __name__ == "__main__":
    main()
