#!/usr/bin/env python
"""No-memo JPEG codec throughput microbench (VERDICT r06 item #7).

The jpeg_decode HEADLINE query memoizes by payload content (the
dedupe-before-decode pattern; <=33 distinct payloads per run), so its
bench number measures memo-hit throughput and would NOT move if the
decode kernel itself regressed.  This script times the kernel with
EVERY payload distinct — seeded random 16x16 RGB images, so each
encode/decode walks the full pipeline (DCT, quant, Huffman, marker
walk, dequant, IDCT, color transform) with no reuse.

Prints one JSON line per size:
  {"n": N, "encode_s": ..., "decode_s": ..., "enc_per_s": ...,
   "dec_per_s": ...}

Run both sizes and compare dec_per_s against the SCALE.md rows — a
drop well outside the recorded range is a decode-kernel regression
even when BENCH jpeg_decode is flat.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from kats_spark.operators.jpeg import decode_jpeg, encode_jpeg  # noqa: E402


def run(n: int, seed: int = 7) -> dict:
    rng = np.random.default_rng(seed)
    imgs = [rng.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(n)]
    t0 = time.perf_counter()
    payloads = [encode_jpeg(im, quality=90) for im in imgs]
    t1 = time.perf_counter()
    total = 0
    for p in payloads:
        arr = decode_jpeg(p)
        total += int(arr.size)
    t2 = time.perf_counter()
    assert total == n * 16 * 16 * 3
    return {
        "n": n,
        "encode_s": round(t1 - t0, 3),
        "decode_s": round(t2 - t1, 3),
        "enc_per_s": round(n / (t1 - t0), 1),
        "dec_per_s": round(n / (t2 - t1), 1),
    }


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [500, 2000]
    for n in sizes:
        run(min(50, n))  # warm numpy dispatch outside the timed region
        print(json.dumps(run(n)))
