#!/usr/bin/env python
"""Embedding-latency benchmark: p50 per-10-s-clip latency of the HEAR
timestamp-embedding path (the second north-star metric in BASELINE.json,
alongside bench.py's clips/s/chip).

Three metrics, one JSON line each (driver format):

1. ``embedding_latency_p50_per_10s_clip`` — RuntimeJEPA.get_timestamp_embeddings
   on (1, 160000) inputs, the labhamlet/wavjepa-base contract
   (/root/reference/README.md:81-87): end-to-end including host-side
   windowing (5 × 2.01-s batched windows), device transfer, and the host
   value fetch that closes each timing (the tunneled TPU backend does not
   block in block_until_ready).
2. ``wholeclip_latency_p50_per_10s_clip`` — the process_seconds=10.0
   single-pass mode (T=999 tokens, Pallas fused attention): same protocol,
   one window instead of five.
3. ``wholeclip_batch32_ms_per_clip`` — the same whole-clip mode amortized
   over a 32-clip batch (the offline-embedding throughput configuration
   eval/embeddings.py runs).

Env knobs: ITERS (default 20), BATCH (default 32).
"""

import json
import os
import time

import numpy as np


def _bench(fn, make_input, iters: int):
    """p50 ms over `iters` calls; each timing closed by a host value fetch."""
    rng = np.random.default_rng(0)
    emb, _ = fn(make_input(rng))  # warm (compile)
    assert np.all(np.isfinite(np.asarray(emb)))
    lat = []
    for _ in range(iters):
        clip = make_input(rng)
        t0 = time.perf_counter()
        emb, _ = fn(clip)
        _ = float(np.asarray(emb)[0, 0, 0])  # force
        lat.append(time.perf_counter() - t0)
    return float(np.percentile(lat, 50) * 1000)


def main():
    from wavjepa_tpu.api.runtime import load_model

    iters = int(os.environ.get("ITERS", "20"))
    batch = int(os.environ.get("BATCH", "32"))

    def clip_input(rng, n=1):
        return rng.standard_normal((n, 160000)).astype(np.float32)

    # 1. windowed HEAR path (base config, random weights — timing-equivalent)
    model = load_model("")
    p50 = _bench(model.get_timestamp_embeddings, clip_input, iters)
    print(json.dumps({
        "metric": "embedding_latency_p50_per_10s_clip",
        "value": round(p50, 2), "unit": "ms", "vs_baseline": None,
    }))

    # 2. whole-clip single-pass mode (T=999, Pallas fused attention)
    whole = load_model("", process_seconds=10.0)
    p50_whole = _bench(whole.get_timestamp_embeddings, clip_input, iters)
    print(json.dumps({
        "metric": "wholeclip_latency_p50_per_10s_clip",
        "value": round(p50_whole, 2), "unit": "ms", "vs_baseline": None,
    }))

    # 3. whole-clip mode amortized over a batch (offline-embedding config)
    p50_batch = _bench(
        whole.get_timestamp_embeddings,
        lambda rng: clip_input(rng, batch),
        max(4, iters // 2),
    )
    print(json.dumps({
        "metric": "wholeclip_batch32_ms_per_clip",
        "value": round(p50_batch / batch, 2), "unit": "ms/clip",
        "vs_baseline": None, "batch": batch,
    }))


if __name__ == "__main__":
    main()
