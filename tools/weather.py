"""Tunnel-weather probe: is NOW a clean window for recording benchmarks?

The tunneled TPU's execution, staging, and wire speeds swing hour to
hour (BASELINE.md); kernel micro-benchmarks are stable ONLY when the
window is clean.  This probe times three warm micro-benchmarks and
prints a one-line verdict:

  python tools/weather.py          # ~60 s

- exec:  20 chained HCP-scale R-L-shaped GEMMs, one scalar fetch
         (clean: <1.5x the best-ever per-GEMM time)
- tv:    one fused Pallas TV stencil pass at HCP bbox scale
         (clean: ~35 ms; bad windows measured 10-30x)
- wire:  16 MB device->host fetch (clean: >20 MB/s)
"""

import json
import sys
import time

import numpy as np


def main():
    # Fail fast on a wedged tunnel: backend init itself hangs during an
    # outage (observed 2026-08-17: >90 min), and a hung probe eats its
    # caller's whole timeout budget.  Cheapest first: if the relay
    # process is dead its forwarded port refuses outright (3 s); then a
    # tiny-matmul liveness check in a subprocess with a tight deadline —
    # only then pay for the real probes in this process.
    import os
    import socket
    import subprocess
    import sys as _sys

    s = socket.socket()
    s.settimeout(3)
    try:
        s.connect(("127.0.0.1", 8082))
        s.close()
    except OSError:
        print(json.dumps({"clean": False, "why": "tunnel relay dead "
                          "(port 8082 refused)"}))
        sys.exit(1)
    # persistent compile cache in the child too: a cold probe compile
    # (15-400 s) must not read as a wedged tunnel at the liveness deadline
    cache = os.environ.get("FIBERS_JAX_CACHE", "/tmp/fibers_jax_cache")
    p = subprocess.Popen(
        [_sys.executable, "-c",
         "import jax; "
         "jax.config.update('jax_compilation_cache_dir', "
         f"{cache!r}); "
         "jax.config.update("
         "'jax_persistent_cache_min_compile_time_secs', 0.0); "
         "import jax.numpy as jnp; "
         "float((jnp.ones((64,64)) @ jnp.ones((64,64)))[0,0])"],
        env=dict(os.environ),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True)
    try:
        # 300 s: a live tunnel's first dispatch can pay 47-200+ s of
        # executable staging in slow windows (measured 46.9 s on
        # 2026-08-19, preflight itself timed at 120 s minutes later); a truly wedged tunnel hangs for hours, so this still fails fast.  45 s
        # misclassified slow-staging windows as dead.
        ok = p.wait(timeout=450) == 0
    except subprocess.TimeoutExpired:
        # Do NOT wait for the corpse: a tunnel-wedged child can sit in
        # an unkillable (uninterruptible-syscall) state, and
        # subprocess.run's post-kill wait then blocks the whole probe
        # for its caller's full timeout (observed: 600 s).
        p.kill()
        ok = False
    if not ok:
        print(json.dumps({"clean": False, "why": "tunnel unresponsive"}))
        sys.exit(1)

    import jax
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print(json.dumps({"clean": False, "why": "no TPU backend"}))
        return

    # --- exec probe: [720896, 254] x [254, 364] bf16-ish GEMM chain ---
    a = jnp.ones((65536, 254), jnp.float32)
    k = jnp.ones((254, 364), jnp.float32)

    @jax.jit
    def chain(a, k):
        x = a
        for _ in range(4):
            y = jnp.dot(x, k, precision=jax.lax.Precision.HIGH)
            x = jnp.dot(y, k.T, precision=jax.lax.Precision.HIGH) * 1e-3
        return x

    float(chain(a, k)[0, 0])                     # compile + warm
    t0 = time.time()
    float(chain(a, k)[0, 0])
    t_exec = time.time() - t0
    flops = 4 * 2 * 2 * 65536 * 254 * 364 * 3   # 3-pass bf16
    tflops = flops / max(t_exec, 1e-9) / 1e12

    # --- tv probe: HCP-bbox-scale fused stencil, one chunk ---
    from fibers_tpu.ops.pallas.tv_stencil import tv_multiplier
    v = jnp.ones((128, 130, 90, 128), jnp.float32)
    lam = jnp.full((128, 130, 90), 0.004, jnp.float32)
    float(tv_multiplier(v, lam)[0, 0, 0, 0])     # compile + warm
    t0 = time.time()
    float(tv_multiplier(v, lam)[0, 0, 0, 0])
    t_tv = time.time() - t0

    # --- wire probe: 16 MB flat fetch ---
    big = jnp.ones((4 << 20,), jnp.float32)
    np.asarray(big[:8])                          # force materialization
    t0 = time.time()
    np.asarray(big)
    t_wire = time.time() - t0
    mbs = 16.0 / max(t_wire, 1e-9)

    # Gates: exec best-ever observed ~8.6 on this skinny-GEMM probe, TV
    # best ~35 ms, wire 30-90 MB/s in good windows.  The e2e benchmarks
    # are wire-bound, so the wire gate carries the most weight.
    clean = tflops > 6.0 and t_tv < 0.055 and mbs > 25.0
    print(json.dumps({
        "clean": bool(clean),
        "exec_tflops": round(tflops, 1),
        "tv_ms": round(t_tv * 1000, 1),
        "wire_MBps": round(mbs, 1),
    }))
    sys.exit(0 if clean else 1)


if __name__ == "__main__":
    main()
