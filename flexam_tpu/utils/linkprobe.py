"""Link-health probing + resilient host->device staging (VERDICT r2
item 5: the RTT-gating discipline moves from docs into the product).

The axon tunnel's per-launch RTT and bandwidth degrade >10x for
stretches (BASELINE.md honesty notes: the same decode measured 11.6 s
and 69 s on the same day; a trivial probe once failed to finish in five
minutes). Launch-count-heavy phases (streamed VAE prepare/decode) absorb
the hit; the 4-launch denoise barely moves. So:

  * `probe_link()` — N tiny launch+fetch roundtrips; healthy means the
    median RTT is under `healthy_ms`. Cached for `ttl_s` so repeated
    generate() calls don't pay it again.
  * `staged_put(arr)` — host->device transfer in bounded chunks with
    per-chunk retry: on a degraded link one multi-hundred-MB transfer is
    an all-or-nothing timeout, while smaller staged uploads complete and
    surface progress.
  * `pipeline.generate()` runs the probe once, records the result in the
    metrics JSON (`utils.timing.metrics`), switches prepare to staged
    uploads when degraded, and prints a loud notice so inflated phase
    timings are attributable to the link rather than to a regression.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

_CACHE = {"t": 0.0, "result": None}


def probe_link(n: int = 8, healthy_ms: float = 100.0,
               ttl_s: float = 120.0, force: bool = False) -> dict:
    """Measure launch+fetch RTT with a trivial jit. Returns
    {"rtt_ms_median", "rtt_ms_p90", "healthy", "platform"}."""
    now = time.monotonic()
    if (not force and _CACHE["result"] is not None
            and now - _CACHE["t"] < ttl_s):
        return _CACHE["result"]

    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    if platform == "cpu":
        res = {"rtt_ms_median": 0.0, "rtt_ms_p90": 0.0, "healthy": True,
               "platform": platform}
        _CACHE.update(t=now, result=res)
        return res

    f = jax.jit(lambda x: x + 1)
    x = jnp.ones((8, 128))
    float(jnp.sum(f(x)))                      # compile outside the timing
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(jnp.sum(f(x)))                  # forced fetch: block_until_
        ts.append((time.perf_counter() - t0) * 1000.0)   # ready lies
    ts.sort()
    res = {
        "rtt_ms_median": round(ts[len(ts) // 2], 2),
        "rtt_ms_p90": round(ts[min(len(ts) - 1, int(len(ts) * 0.9))], 2),
        "healthy": ts[len(ts) // 2] < healthy_ms,
        "platform": platform,
    }
    _CACHE.update(t=now, result=res)
    if not res["healthy"]:
        print(f"WARNING: degraded device link (RTT median "
              f"{res['rtt_ms_median']:.0f} ms >= {healthy_ms:.0f} ms) — "
              "transfer-bound phases (prepare/decode) will inflate; "
              "switching to staged uploads with retry")
    return res


def staged_put(arr: np.ndarray, chunk_mb: int = 16, retries: int = 3,
               axis: int = 0):
    """Host->device transfer in `chunk_mb`-bounded slices along `axis`
    with per-slice retry, reassembled on device. Falls back to one
    device_put for small arrays."""
    import jax
    import jax.numpy as jnp

    arr = np.asarray(arr)
    nbytes = arr.nbytes
    if nbytes <= chunk_mb * (1 << 20) or arr.shape[axis] < 2:
        return jnp.asarray(arr)
    n = arr.shape[axis]
    per_item = max(nbytes // n, 1)
    step = max(1, int(chunk_mb * (1 << 20)) // per_item)
    parts = []
    for start in range(0, n, step):
        sl = [slice(None)] * arr.ndim
        sl[axis] = slice(start, min(start + step, n))
        piece = arr[tuple(sl)]
        last = None
        for attempt in range(retries):
            try:
                dev = jax.device_put(piece)
                jax.block_until_ready(dev)
                parts.append(dev)
                last = None
                break
            except Exception as e:      # transport hiccup: retry slice
                last = e
                time.sleep(1.0 + attempt)
        if last is not None:
            raise last
    return jnp.concatenate(parts, axis=axis)


def reset_probe_cache() -> None:
    _CACHE.update(t=0.0, result=None)
