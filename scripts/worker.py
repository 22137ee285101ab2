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

fit estimates a per-numeric-column Gaussian (mean, population std);
generate samples it with a seeded PRNG carried in the model blob, so the
same model produces bit-identical sequences across fresh worker
processes. Pure stdlib — no third-party imports.

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


def handle(req):
    op = req.get("op")
    if op == "fit":
        cols = req["schema"]["numericCols"]
        if req.get("data_format") == "arrow-ipc-files":
            rows = _arrow_rows(req["data_files"])
        else:
            rows = req["data"]
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
