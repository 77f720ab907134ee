"""Benchmark suite.

Analogue of the reference's bench tier (``wenbo_engine/bench/``):

* :mod:`kernel_bw`    — per-op-class HBM bandwidth vs roofline
                        (kernel.py + matmul_vs_io.py analogue)
* :mod:`e2e`          — end-to-end circuit throughput across families
* :mod:`sweep`        — execution-knob hyperparameter sweep
* :mod:`suite`        — correctness + perf matrix over the circuit
                        library (MQT-bench-runner analogue; adds Qiskit
                        overlap checks when qiskit is installed)
* :mod:`spill_bw`     — out-of-core stripe streaming throughput

All scripts run on the ambient JAX platform (the TPU under axon);
set ``QST_BENCH_PLATFORM=cpu`` to force CPU.
"""
from __future__ import annotations

import os
import time


def setup_platform():
    import jax

    plat = os.environ.get("QST_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    # Persistent compilation cache: cold remote compiles through the
    # axon tunnel can take tens of minutes for deep circuits — a killed
    # or timed-out bench must not lose that work.
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    return jax.devices()[0]


def force(x) -> float:
    """Force execution with an on-device reduction + host fetch.

    block_until_ready is unreliable through the axon tunnel; fetching a
    reduced scalar is the only trustworthy completion barrier.
    """
    import jax
    import jax.numpy as jnp

    if x.dtype.kind == "c":
        v = jnp.sum(jnp.real(x) ** 2 + jnp.imag(x) ** 2)
    else:
        v = jnp.sum(x)
    return float(jax.device_get(v))


def warm_grant():
    """Establish the device grant (one-time minutes-scale cost on axon)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda: jnp.sum(jnp.ones((128, 128), jnp.float32)))
    t0 = time.time()
    float(jax.device_get(f()))
    return time.time() - t0


def timeit(fn, reps: int = 5) -> float:
    """Median-of-reps wall time of fn() (fn must force internally)."""
    fn()  # warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]
