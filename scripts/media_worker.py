#!/usr/bin/env python3
"""Arrow-batch REAL media decoder for graft.ext.Multimodal.decodeViaWorker.

Pure-numpy BMP (24bpp uncompressed) + WAV (PCM16) decoder: reads ONE
Arrow IPC stream on stdin holding (media_id: int64, payload: binary)
rows, writes ONE Arrow IPC stream on stdout holding
(media_id, format, width, height, channels, sample_rate, n_samples,
mean_value) rows.

Mirrors graft.ext.Multimodal.decodeReal BIT-for-bit: every accumulation
is integer-exact (byte sums / int64 square sums), so mean_value is the
same IEEE double on both sides — the JVM parity spec asserts exact
equality. Swapping in a full codec (PIL/soundfile/GPU decoder) changes
only decode_one().
"""
import math
import struct
import sys

import numpy as np
import pyarrow as pa


def decode_bmp(b):
    if len(b) < 54:
        raise ValueError("truncated BMP header")
    data_off, = struct.unpack_from("<I", b, 10)
    hdr_size, = struct.unpack_from("<I", b, 14)
    if hdr_size < 40:
        raise ValueError("unsupported BMP core-header size %d" % hdr_size)
    w, h = struct.unpack_from("<ii", b, 18)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    comp, = struct.unpack_from("<I", b, 30)
    if w <= 0 or h <= 0 or planes != 1 or bpp != 24 or comp != 0:
        raise ValueError("unsupported BMP variant")
    row_bytes = w * 3
    row_stride = (row_bytes + 3) & ~3
    if len(b) < data_off + row_stride * (h - 1) + row_bytes:
        raise ValueError("truncated BMP pixel data")
    # rows are bottom-up and padded; gather the unpadded pixel bytes
    arr = np.frombuffer(b, dtype=np.uint8)
    total = 0
    for r in range(h):
        base = data_off + r * row_stride
        total += int(arr[base:base + row_bytes].astype(np.int64).sum())
    n_px_bytes = row_bytes * h
    return ("image/bmp", w, h, 3, 0, w * h, total / n_px_bytes)


def decode_wav(b):
    off = 12
    channels = sample_rate = -1
    data_off = data_len = -1
    while off + 8 <= len(b) and (channels < 0 or data_off < 0):
        cid = b[off:off + 4]
        clen, = struct.unpack_from("<I", b, off + 4)
        if cid == b"fmt ":
            if clen < 16 or off + 24 > len(b):
                raise ValueError("truncated fmt chunk")
            fmt, channels = struct.unpack_from("<HH", b, off + 8)
            sample_rate, = struct.unpack_from("<I", b, off + 12)
            bits, = struct.unpack_from("<H", b, off + 22)
            if fmt != 1 or bits != 16:
                raise ValueError("unsupported WAV variant")
        elif cid == b"data":
            data_off, data_len = off + 8, clen
        off += 8 + clen + (clen & 1)  # RIFF chunks pad to even
    if channels <= 0 or sample_rate <= 0 or data_off < 0:
        raise ValueError("WAV missing fmt/data chunk")
    if data_off + data_len > len(b):
        raise ValueError("truncated WAV data")
    samples = np.frombuffer(b, dtype="<i2", count=data_len // 2,
                            offset=data_off).astype(np.int64)
    n = len(samples)
    # float(sq) BEFORE the divide mirrors the JVM's sq.toDouble / n
    # exactly — a direct int/int true-division is correctly rounded and
    # can differ by 1 ulp once sq exceeds 2^53 (hours-long PCM)
    rms = (0.0 if n == 0
           else math.sqrt(float(int((samples * samples).sum())) / n) / 32768.0)
    return ("audio/wav", 0, 0, channels, sample_rate,
            n // max(channels, 1), rms)


def decode_ppm(b):
    """P6 twin of Multimodal.ppmPixels + the image branch of decodeReal:
    whitespace/comment header walk, single-whitespace pixel boundary,
    integer-exact byte mean."""
    off = 2
    ws = b" \n\r\t"

    def skip_ws_comments():
        nonlocal off
        moved = True
        while moved:
            moved = False
            while off < len(b) and b[off:off + 1] in ws:
                off += 1
                moved = True
            if off < len(b) and b[off:off + 1] == b"#":
                while off < len(b) and b[off:off + 1] != b"\n":
                    off += 1
                moved = True

    def read_int():
        nonlocal off
        skip_ws_comments()
        if off >= len(b) or not b[off:off + 1].isdigit():
            raise ValueError("P6 header: expected digits")
        v = 0
        while off < len(b) and b[off:off + 1].isdigit():
            v = v * 10 + int(b[off:off + 1])
            off += 1
        return v

    w, h, maxval = read_int(), read_int(), read_int()
    if w <= 0 or h <= 0 or not (1 <= maxval <= 255):
        raise ValueError("unsupported P6 variant")
    if off >= len(b) or b[off:off + 1] not in ws:
        raise ValueError("P6 header: missing pixel-data whitespace")
    off += 1
    need = w * h * 3
    if len(b) < off + need:
        raise ValueError("truncated P6 pixel data")
    arr = np.frombuffer(b, dtype=np.uint8, count=need, offset=off)
    total = int(arr.astype(np.int64).sum())
    return ("image/x-portable-pixmap", w, h, 3, 0, w * h, total / need)


def decode_avi(b):
    """Uncompressed-AVI twin of Multimodal.aviFrames + the video branch of
    decodeReal: nested LIST walk (strl scoping, movi/rec frames, even
    padding), geometry from the vids strf, integer-exact pixel mean."""
    w = h = bpp = -1
    comp = rate = scale = -1
    total = 0
    n_frames = 0
    n_px_bytes = 0
    arr = np.frombuffer(b, dtype=np.uint8)

    def parse_strl(off, end):
        nonlocal w, h, bpp, comp, rate, scale
        vids = False
        while off + 8 <= end:
            cid = b[off:off + 4]
            clen, = struct.unpack_from("<I", b, off + 4)
            if off + 8 + clen > end:
                raise ValueError("AVI chunk overruns strl")
            if cid == b"strh":
                vids = b[off + 8:off + 12] == b"vids"
                if vids:
                    scale, rate = struct.unpack_from("<II", b, off + 8 + 20)
            elif cid == b"strf" and vids:
                w, h = struct.unpack_from("<ii", b, off + 8 + 4)
                bpp, = struct.unpack_from("<H", b, off + 8 + 14)
                comp, = struct.unpack_from("<I", b, off + 8 + 16)
            off += 8 + clen + (clen & 1)

    def walk(off, end, in_movi):
        nonlocal total, n_frames, n_px_bytes
        while off + 8 <= end:
            cid = b[off:off + 4]
            clen, = struct.unpack_from("<I", b, off + 4)
            if off + 8 + clen > end:
                raise ValueError("AVI chunk overruns its parent")
            if cid == b"LIST":
                ltype = b[off + 8:off + 12]
                if ltype == b"strl":
                    parse_strl(off + 12, off + 8 + clen)
                elif ltype in (b"hdrl", b"movi", b"rec "):
                    walk(off + 12, off + 8 + clen,
                         in_movi or ltype == b"movi")
            elif (in_movi and cid[:2].isdigit()
                    and (cid[2:] == b"db" or (cid[2:] == b"dc" and clen))):
                if w <= 0 or h <= 0:
                    raise ValueError("AVI frame before vids strf")
                row_bytes = w * 3
                row_stride = (row_bytes + 3) & ~3
                if clen < row_stride * (h - 1) + row_bytes:
                    raise ValueError("truncated AVI frame chunk")
                # unpadded DIB rows only — same multiset of bytes as the
                # JVM's unpacked RGB, so the integer sums agree exactly
                for r in range(h):
                    base = off + 8 + r * row_stride
                    total += int(arr[base:base + row_bytes]
                                 .astype(np.int64).sum())
                n_frames += 1
                n_px_bytes += row_bytes * h
            off += 8 + clen + (clen & 1)

    walk(12, len(b), False)
    if w <= 0 or h <= 0 or bpp != 24 or comp != 0 or scale <= 0 or rate <= 0:
        raise ValueError("unsupported AVI variant")
    # floor(x+0.5) mirrors the JVM's Math.round (half-UP; python's round
    # is half-to-even — a rate/scale like 5/2 would diverge)
    fps = int(math.floor(rate / scale + 0.5))
    mean = 0.0 if n_px_bytes == 0 else total / n_px_bytes
    return ("video/avi", w, h, 3, fps, n_frames, mean)


def decode_one(b):
    b = b if b is not None else b""
    if len(b) >= 54 and b[:2] == b"BM":
        return decode_bmp(b)
    if len(b) >= 3 and b[:2] == b"P6" and b[2:3] in b" \n\r\t":
        return decode_ppm(b)
    if (len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE"):
        return decode_wav(b)
    if (len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"AVI "):
        return decode_avi(b)
    n = len(b)
    mean = 0.0 if n == 0 else int(np.frombuffer(b, dtype=np.uint8)
                                  .astype(np.int64).sum()) / n
    return ("application/octet-stream", 0, 0, 0, 0, n, mean)


def main():
    data = sys.stdin.buffer.read()
    out_schema = pa.schema([
        ("media_id", pa.int64()),
        ("format", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int64()),
        ("mean_value", pa.float64())])
    sink = pa.BufferOutputStream()
    with pa.ipc.open_stream(pa.BufferReader(data)) as reader, \
            pa.ipc.new_stream(sink, out_schema) as writer:
        for batch in reader:
            rows = batch.to_pylist()
            feats = [decode_one(r["payload"]) for r in rows]
            writer.write_batch(pa.record_batch([
                pa.array([r["media_id"] for r in rows], pa.int64()),
                pa.array([f[0] for f in feats], pa.string()),
                pa.array([f[1] for f in feats], pa.int32()),
                pa.array([f[2] for f in feats], pa.int32()),
                pa.array([f[3] for f in feats], pa.int32()),
                pa.array([f[4] for f in feats], pa.int32()),
                pa.array([f[5] for f in feats], pa.int64()),
                pa.array([f[6] for f in feats], pa.float64())],
                schema=out_schema))
    sys.stdout.buffer.write(sink.getvalue().to_pybytes())


if __name__ == "__main__":
    main()
