"""Benchmark: flagship FlexAM DiT denoise throughput on the attached chip.

Prints ONE JSON line:
  {"metric": "denoise_steps_per_sec_per_chip", "value": N,
   "unit": "steps/s", "vs_baseline": N}

The workload is the reference default (SURVEY.md §2.7): Wan2.2-Fun-5B DiT,
512x896x97 frames -> latent [48, 25, 32, 56] -> 11,648 tokens (incl. 448
ref tokens), CFG pair batched as 2, bf16. One "step" = one full CFG
denoise iteration (2 transformer forwards batched + sampler update).

vs_baseline: the reference publishes no numbers (BASELINE.md); we report
against the driver north-star of 50 steps in <60 s on v5p-8, i.e.
0.833 steps/s aggregate -> per-chip target 0.104 steps/s.

Axon-tunnel gotchas handled here: params are initialized INSIDE one jit
(avoids a 2x10 GB stack transient), all tensors are jit arguments (never
closure constants -> MLIR-inlined), and timing forces a scalar fetch
(block_until_ready does not actually block over the tunnel).
"""

import json
import os
import time


def _cache_is_safe(cache_dir: str, timeout_s: float = 75.0) -> bool:
    """Pre-flight the persistent compile cache in a SUBPROCESS.

    Over the axon tunnel the cache's executable serialize/deserialize RPC
    sometimes wedges for minutes (observed 2026-08-17: a trivial jit's
    first call takes 2-4 min with the cache enabled, 1.7 s without — on
    CPU the cache is fine, so it is the tunnel path). The hang is inside
    a C++ call on the main thread, so it cannot be timed out in-process;
    probing in a child keeps bench.py itself from hanging. FLEXAM_JAX_CACHE
    overrides: "0" skips the cache (and the probe), "1" forces it on.
    """
    import subprocess
    import sys

    env = os.environ.get("FLEXAM_JAX_CACHE", "")
    if env == "0":
        return False
    if env == "1":
        return True
    code = (
        "import jax\n"
        f"jax.config.update('jax_compilation_cache_dir', {cache_dir!r})\n"
        "import jax.numpy as jnp\n"
        "float(jnp.sum(jax.jit(lambda x: x + 1)(jnp.ones((8, 128)))))\n"
    )
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        print("[bench] persistent compile cache disabled: serialize RPC "
              "over the tunnel is wedged (probe timed out)",
              file=sys.stderr, flush=True)
        return False


# last driver-independent measured value (update whenever a fresh capture
# lands in BASELINE.md) — referenced (under `last_known`, with value=null
# in the primary field so no consumer mistakes it for a fresh
# measurement — advisor r4) when the tunnel is down, so an outage never
# yields an unparseable record (VERDICT r3 item 2: BENCH_r03 was
# rc=124/parsed=null after a 26-min outage wait).
LAST_KNOWN = {
    "value": 0.4732, "int8_value": 0.6215, "unit": "steps/s", "round": 4,
    "source": "BASELINE.md round-4 rows, independently re-measured by the "
              "round-4 review (dense 0.4732 / int8 0.6215 steps/s)",
}

PROBE_HISTORY = []


def _emit_failure(reason: str):
    """One parseable JSON line on stdout even when no measurement ran.
    value is null — the real number rides only under `last_known` so a
    stale record can never be recorded as a fresh measurement."""
    print(json.dumps({
        "metric": "denoise_steps_per_sec_per_chip",
        "value": None,
        "unit": LAST_KNOWN["unit"],
        "vs_baseline": None,
        "ok": False,
        "stale": True,
        "reason": reason,
        "last_known": LAST_KNOWN,
        "probe_history": PROBE_HISTORY,
    }), flush=True)


def _wait_for_tpu(max_wait_s: float) -> bool:
    """The axon tunnel can be DOWN for stretches: a bare `jax.devices()`
    wedges for minutes in-process (unkillable C++ call). Probe it in a
    SUBPROCESS with a timeout and retry until the tunnel returns or the
    budget runs out, so the driver's round-end bench run rides out an
    outage window instead of hanging. Returns True when a device
    answered (or the platform is CPU-forced). Every attempt is recorded
    in PROBE_HISTORY for the failure record."""
    import subprocess
    import sys

    # no JAX_PLATFORMS=cpu early-out: the axon plugin OVERRIDES the env
    # var, so the subprocess probe (which inherits the env) is the only
    # honest predictor of what main() will experience
    code = ("import jax\n"
            "d = jax.devices()\n"
            "import jax.numpy as jnp\n"
            "float(jnp.sum(jnp.ones((8, 128)) + 1))\n"
            "print(d[0].platform, flush=True)\n")
    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        t0 = time.time()
        status = "error"
        try:
            r = subprocess.run([sys.executable, "-c", code], timeout=240,
                               capture_output=True, text=True)
            if r.returncode == 0:
                status = "ok"
            else:
                status = f"rc={r.returncode}"
        except subprocess.TimeoutExpired:
            status = "timeout"
        PROBE_HISTORY.append({"attempt": attempt, "t": round(t0, 1),
                              "elapsed_s": round(time.time() - t0, 1),
                              "status": status})
        if status == "ok":
            return True
        if time.time() >= deadline:
            return False
        print(f"[bench] device probe attempt {attempt} failed (tunnel "
              f"down?); retrying in 60 s "
              f"({int(deadline - time.time())} s budget left)",
              file=sys.stderr, flush=True)
        time.sleep(60)


def main():
    import sys

    # 1200 s default: the driver's own outer timeout killed the round-3
    # run at ~26 min while bench was still inside a 30-min wait loop —
    # the failure record must flush BEFORE any outer watchdog fires
    if not _wait_for_tpu(float(os.environ.get("FLEXAM_BENCH_WAIT", 1200))):
        print("[bench] no device answered within the wait budget — "
              "emitting an explicit stale record",
              file=sys.stderr, flush=True)
        _emit_failure("tunnel down: no device probe succeeded within "
                      "the wait budget")
        sys.exit(0)

    # retry-once on a mid-measurement failure (VERDICT r4 item 2): the
    # round-4 driver run died on a transient FAILED_PRECONDITION at the
    # param-materialization fetch — the same fetch succeeded minutes
    # later. A fresh device probe gates the retry so a hard outage goes
    # straight to the stale record instead of burning the watchdog.
    last_err = None
    for attempt in (1, 2):
        try:
            record = _measure()
            if attempt > 1:
                record["retried"] = True
            print(json.dumps(record), flush=True)
            return
        except (KeyboardInterrupt, SystemExit):
            raise
        except BaseException as e:          # noqa: BLE001
            last_err = e
            import traceback
            traceback.print_exc()
            if attempt == 1:
                print("[bench] measurement attempt 1 failed "
                      f"({type(e).__name__}); re-probing the device and "
                      "retrying once", file=sys.stderr, flush=True)
                import gc
                gc.collect()
                if not _wait_for_tpu(
                        float(os.environ.get("FLEXAM_BENCH_RETRY_WAIT",
                                             300))):
                    break
    # deliberate stale record -> exit 0 (the record itself carries
    # ok=false; a nonzero rc would make the driver discard it)
    _emit_failure(f"measurement failed after retry: "
                  f"{type(last_err).__name__}: {last_err}")
    sys.exit(0)


def _measure() -> dict:
    import sys

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    if _cache_is_safe(cache_dir):
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # serialized-executable cache (utils/aot_cache.py): the 5B denoise
    # step's XLA compile dominates a fresh bench process; a warm
    # .aot_cache loads it in <1 s instead. FLEXAM_AOT_CACHE=0 disables,
    # any other value overrides the directory.
    from flexam_tpu.utils.aot_cache import aot_call, configure
    aot_env = os.environ.get("FLEXAM_AOT_CACHE", "")
    configure("" if aot_env == "0" else aot_env or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".aot_cache"))

    from flexam_tpu.config import WAN22_5B_FLEXAM
    from flexam_tpu.models.dit import (dit_forward, init_dit_params,
                                       make_rope_tables_for)
    from flexam_tpu.sampling import build_schedule
    from flexam_tpu.sampling.flow_match import (sampler_init_state,
                                                sampler_step, schedule_arrays)

    def log(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    cfg = WAN22_5B_FLEXAM.dit
    t_init = time.perf_counter()
    # fast random init: values are irrelevant for throughput; generate each
    # leaf of the shape skeleton with one fused normal (the structured
    # xavier init compiles for ~10 min on this 1-core host)
    skeleton = jax.eval_shape(
        lambda key: init_dit_params(key, cfg, dtype=jnp.bfloat16),
        jax.random.PRNGKey(0))
    leaves, treedef = jax.tree_util.tree_flatten(skeleton)

    @jax.jit
    def make_params(key):
        keys = jax.random.split(key, len(leaves))
        return treedef.unflatten([
            (jax.random.normal(k, l.shape, jnp.float32) * 0.02
             ).astype(l.dtype)
            for k, l in zip(keys, leaves)])

    # the fused-RNG init jit itself compiles for ~2 min on this 1-core
    # host (1100+ rng ops) — cache its executable too
    params = aot_call(make_params, (jax.random.PRNGKey(0),), tag="dit_init")
    # force materialization
    float(jnp.sum(params["head"]["head"]["bias"].astype(jnp.float32)))
    # eager fused-kernel probe (must run OUTSIDE the denoise jit trace)
    from flexam_tpu.ops.fused import fused_enabled
    log(f"fused kernels available: {fused_enabled()}")
    log(f"5B param init: {time.perf_counter() - t_init:.1f}s on "
        f"{jax.devices()[0]}")
    rope = jnp.asarray(make_rope_tables_for(cfg), jnp.float32)

    b, c, f, h, w = 1, 48, 25, 32, 56      # 512x896x97f latents
    guidance = 6.0
    x0 = jax.random.normal(jax.random.PRNGKey(1), (b, c, f, h, w), jnp.float32)
    cond = {
        "y": jnp.zeros((2 * b, 100, f, h, w), jnp.bfloat16),
        "additional": jnp.zeros((2 * b, 240, f, h, w), jnp.bfloat16),
        "ref": jnp.zeros((2 * b, c, h, w), jnp.bfloat16),
        "context": (jax.random.normal(
            jax.random.PRNGKey(2), (2 * b, cfg.text_len, cfg.text_dim))
            * 0.02).astype(jnp.bfloat16),
        "density": jnp.full((2 * b,), 0.1, jnp.float32),
        "rope": rope,
    }

    tables = build_schedule("flow_match_euler", 50, shift=5.0)
    sched = schedule_arrays(tables)

    # opt-in block-sparse video self-attention (FLEXAM_ATTENTION=sparse;
    # FLEXAM_SPARSE_WINDOW sets the temporal window). The headline number
    # stays dense — sparse attention changes which keys participate, so
    # its speedup is reported as a separate BASELINE.md row.
    attn_fn = None
    if (os.environ.get("FLEXAM_ATTENTION", "").lower()
            in ("sparse", "pallas_sparse")):
        from flexam_tpu.ops.sparse_attention import sparse_attn_fn_for_latent
        attn_fn = sparse_attn_fn_for_latent((f, h, w))
        log("sparse video attention enabled "
            f"(window={os.environ.get('FLEXAM_SPARSE_WINDOW', '2')})")

    @jax.jit
    def denoise_step(params, cond, sched, state, i):
        x = state[0]
        xb = jnp.tile(x.astype(jnp.bfloat16), (2, 1, 1, 1, 1))
        t = jnp.full((2 * b,), sched["timesteps"][i], jnp.float32)
        extra = {"attn_fn": attn_fn} if attn_fn is not None else {}
        pred = dit_forward(params, cfg, xb, t, cond["context"],
                           density=cond["density"], y=cond["y"],
                           additional_control=cond["additional"],
                           full_ref=cond["ref"], rope_tables=cond["rope"],
                           **extra)
        v = pred[0:1] + guidance * (pred[1:2] - pred[0:1])
        state, _ = sampler_step(sched, False, state, v.astype(jnp.float32), i)
        return state

    def step(params, state, i):
        # routed through the executable cache (no-op when disabled); the
        # dense and int8 legs lower to different HLO -> distinct entries
        return aot_call(denoise_step,
                        (params, cond, sched, state, jnp.int32(i)),
                        tag="bench_denoise_step")

    state = sampler_init_state(x0, tables.order)
    t_c = time.perf_counter()
    state = step(params, state, 0)
    float(jnp.sum(state[0][:, 0, 0, 0, :8]))       # forced fetch
    log(f"compile + first step: {time.perf_counter() - t_c:.1f}s")

    n_steps = 5
    t0 = time.perf_counter()
    for i in range(1, n_steps + 1):
        state = step(params, state, i)
    float(jnp.sum(state[0][:, 0, 0, 0, :8]))       # forced fetch
    dt = time.perf_counter() - t0

    steps_per_sec = n_steps / dt
    log(f"{n_steps} steps in {dt:.2f}s")
    record = {
        "metric": "denoise_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
    }

    # the opt-in int8 block-linear rate (ops/qlinear.py, quality bound in
    # tests/test_sparse_quality.py) rides along as extra keys — the
    # headline stays the dense-exact bf16 rate for round-over-round
    # comparability. FLEXAM_BENCH_INT8=0 skips it (~35 s: in-place
    # conversion + one compile + 5 steps).
    if os.environ.get("FLEXAM_BENCH_INT8", "1") != "0":
        from flexam_tpu.ops.qlinear import convert_dit_to_int8
        t_q = time.perf_counter()
        params = convert_dit_to_int8(params)
        jax.block_until_ready(
            params["blocks"]["self_attn"]["q"]["weight_q"])
        log(f"int8 conversion: {time.perf_counter() - t_q:.1f}s")
        state = sampler_init_state(x0, tables.order)
        t_c = time.perf_counter()
        state = step(params, state, 0)
        float(jnp.sum(state[0][:, 0, 0, 0, :8]))
        log(f"int8 compile + first step: {time.perf_counter() - t_c:.1f}s")
        t0 = time.perf_counter()
        for i in range(1, n_steps + 1):
            state = step(params, state, i)
        float(jnp.sum(state[0][:, 0, 0, 0, :8]))
        int8_rate = n_steps / (time.perf_counter() - t0)
        log(f"int8: {n_steps} steps in {n_steps / int8_rate:.2f}s")
        record["int8_steps_per_sec"] = round(int8_rate, 4)
        record["int8_speedup"] = round(int8_rate / steps_per_sec, 3)

    target_per_chip = 50.0 / 60.0 / 8.0   # north star spread over 8 chips
    record["vs_baseline"] = round(steps_per_sec / target_per_chip, 3)
    return record


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except KeyboardInterrupt:
        raise
    except BaseException as e:          # noqa: BLE001
        # anything that escaped main's retry loop (e.g. an import error
        # before measurement) still leaves ONE parseable stale record,
        # and rc=0 so the driver keeps it (VERDICT r4 item 2)
        import traceback
        traceback.print_exc()
        _emit_failure(f"bench crashed outside the retry loop: "
                      f"{type(e).__name__}: {e}")
        raise SystemExit(0)
