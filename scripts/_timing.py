"""Hoist-proof, dispatch-free timing for tunneled-TPU profiling.

Round-4 lesson: Python-level chaining (call jit fn, derive a scalar carry
from its output with eager ops, feed it back) measures the probe PLUS
several eager-op tunnel round-trips per iteration.  Through the axon
tunnel those round-trips are large and bursty (observed: a crops+norm
probe "measuring" 444 ms for ~1 ms of compute; per-microbatch fwd sums
exceeding the full step they are part of).  The fix is to chain the
iterations INSIDE one jitted ``lax.scan``:

- every output leaf feeds the carry (nothing is DCE-able),
- the carry perturbs the next iteration's input (nothing is LICM-able),
- the whole timed region is ONE dispatch closed by ONE host fetch
  (``float(...)`` — the tunnel's ``block_until_ready`` does not block).
"""
import time

import jax
import jax.numpy as jnp


def timeit(name, fn, args, iters=8, repeats=2, quiet=False):
    """Time ``fn(carry_scalar, *args) -> pytree`` per-iteration.

    ``fn`` must use ``carry`` to perturb an input (e.g. ``x + c``) so XLA
    cannot hoist the body out of the scan.  Returns seconds per iteration
    (min over ``repeats`` fetch-closed runs of the scanned program).
    """

    def chained(c0, *a):
        def body(c, _):
            out = fn(c, *a)
            s = jnp.float32(0)
            for leaf in jax.tree.leaves(out):
                s = s + jnp.sum(jnp.abs(jnp.real(leaf))).astype(jnp.float32)
            return s * 1e-20, None

        c, _ = jax.lax.scan(body, c0, None, length=iters)
        return c

    jfn = jax.jit(chained)
    float(jfn(jnp.float32(0), *args))  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(jfn(jnp.float32(0), *args))  # one dispatch, one closing fetch
        times.append((time.perf_counter() - t0) / iters)
    dt = min(times)
    if not quiet:
        print(f"{name:40s} {dt*1e3:8.1f} ms", flush=True)
    return dt


def time_steps(step, state, batch, key, n=5, warm=1, loss_key="loss"):
    """Time a full train step fn ``step(state, batch, key) -> (state, metrics)``.

    Steps chain through ``state`` (no LICM possible); all ``n`` dispatches
    pipeline and the chain is closed by fetching the final loss AND a param
    leaf of the final state (so the last optimizer update is included).
    Returns (seconds/step, final_state).
    """
    for _ in range(warm):
        state, m = step(state, batch, key)
    float(m[loss_key])
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, batch, key)
    float(m[loss_key])
    float(jnp.ravel(jax.tree.leaves(state.params)[0])[0])
    dt = (time.perf_counter() - t0) / n
    return dt, state
