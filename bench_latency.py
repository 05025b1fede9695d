#!/usr/bin/env python
"""Embedding-latency benchmark: p50 per-10-s-clip latency of the HEAR
timestamp-embedding path (the second north-star metric in BASELINE.json,
alongside bench.py's clips/s/chip).

Measures RuntimeJEPA.get_timestamp_embeddings on (1, 160000) inputs — the
labhamlet/wavjepa-base contract (README.md:81-87) — end-to-end including
host-side windowing and device transfer, with a host value fetch closing
each timing (the tunneled TPU backend does not block in block_until_ready).

Prints ONE JSON line.
"""

import json
import time

import numpy as np


def main():
    import jax.numpy as jnp

    from wavjepa_tpu.api.runtime import load_model

    model = load_model("")  # base config, random weights (timing-equivalent)
    rng = np.random.default_rng(0)
    clip = rng.standard_normal((1, 160000)).astype(np.float32)

    # warm (compile)
    emb, ts = model.get_timestamp_embeddings(clip)
    assert np.all(np.isfinite(emb))

    lat = []
    for i in range(20):
        clip = rng.standard_normal((1, 160000)).astype(np.float32)
        t0 = time.perf_counter()
        emb, _ = model.get_timestamp_embeddings(clip)
        _ = float(emb[0, 0, 0])  # force
        lat.append(time.perf_counter() - t0)
    p50 = float(np.percentile(lat, 50) * 1000)
    print(
        json.dumps(
            {
                "metric": "embedding_latency_p50_per_10s_clip",
                "value": round(p50, 2),
                "unit": "ms",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
