#!/usr/bin/env python3
"""Arrow-batch embedding worker for graft.ext.Multimodal.transformViaArrow.

The external half of the media -> embedding seam: reads ONE Arrow IPC
stream on stdin holding (media_id: int64, payload: binary) rows, writes
ONE Arrow IPC stream on stdout holding (media_id: int64,
embedding: list<float32>) rows. Stateless — one process per batch, the
shape a pool of GPU encoder workers has behind a batch queue.

The embedding replicates graft.ext.Multimodal.stubEmbed's float math
BIT-FOR-BIT (float32 stride-sum of payload bytes / 255, double-sum L2
norm, float32 normalize), so the JVM-side parity spec can assert exact
equality — swapping in a real vision/audio encoder changes only the
body of embed().

Usage: embed_worker.py [dim]      (default dim = 16)
"""
import math
import sys

import numpy as np
import pyarrow as pa


def embed(payload, dim):
    raw = np.zeros(dim, dtype=np.float32)
    b = payload if payload is not None else b""
    # float32 accumulation in index order — matches the JVM loop exactly
    f255 = np.float32(255.0)
    for i in range(len(b)):
        raw[i % dim] = np.float32(raw[i % dim] + np.float32(b[i]) / f255)
    norm = math.sqrt(sum(float(x) * float(x) for x in raw))
    if norm == 0.0:
        return [float(x) for x in raw]
    return [float(np.float32(float(x) / norm)) for x in raw]


def main():
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    data = sys.stdin.buffer.read()
    out_schema = pa.schema([
        ("media_id", pa.int64()),
        ("embedding", pa.list_(pa.float32()))])
    sink = pa.BufferOutputStream()
    with pa.ipc.open_stream(pa.BufferReader(data)) as reader, \
            pa.ipc.new_stream(sink, out_schema) as writer:
        for batch in reader:
            rows = batch.to_pylist()
            writer.write_batch(pa.record_batch([
                pa.array([r["media_id"] for r in rows], pa.int64()),
                pa.array([embed(r["payload"], dim) for r in rows],
                         pa.list_(pa.float32()))], schema=out_schema))
    sys.stdout.buffer.write(sink.getvalue().to_pybytes())


if __name__ == "__main__":
    main()
