"""Headline benchmark — runs on real TPU hardware (ambient axon platform).

Workload: the reference's scaling benchmark family — a non-stabilizer
H+T+CNOT layered circuit at n=28 (268M amplitudes, complex64), the
largest size the reference runs both in-RAM (412 s, complex128) and
out-of-core (139 s, complex64) on its benchmark machine
(``wenbo_engine/docs/v3_comparison.md:45-62``).

Executed in fixed-window planar-Pallas mode with planar end-to-end
io: the whole circuit compiles to 5 HBM passes (Gauss 3-mult MXU
panel kernels + terms-only fused-diag merging + global cross-phase
panel coalescing + forbidden-zone straddler gates folded into the
dual-panel passes as VPU prologues) with full-precision
accumulation — 77-79% of the composite HBM+MXU speed-of-light
floor under the round-5 corrected audit (16 B/amp HBM floor,
analytic 32.8 TFLOP/s MXU ceiling, two-point prefix differencing;
BENCH_LOCAL per_pass_roofline).  Results are forced with an
on-device norm reduction fetched to host (plain block_until_ready
is unreliable through the axon tunnel).

Prints ONE JSON line:
  metric        amplitude-updates per second at n=28
                (gates x 2^28 / steady wall-second, compile excluded)
  vs_baseline   reference out-of-core n=28 wall time (139 s) / ours.
"""
from __future__ import annotations

import json
import sys
import time


def main() -> None:
    import os

    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: repeated bench runs (and the CI
    # driver) skip the remote compile entirely on a warm cache.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from quantum_simulations_tpu.circuit import library as lib
    from quantum_simulations_tpu.runtime import simulator

    n = 28
    cd = lib.non_stabilizer(n, depth=4, seed=7)
    n_gates = len(cd["gates"])
    S = jax.ShapeDtypeStruct((1 << n,), jnp.complex64)

    # Establish the device grant with a tiny end-to-end fetch first.
    warm = jax.jit(lambda: jnp.sum(jnp.ones((128, 128), jnp.float32)))
    float(jax.device_get(warm()))

    # Fixed-window planar-Pallas mode with planar end-to-end io: the
    # state stays as two f32 planes across the whole run — the
    # complex64<->planar conversion is a strided retile worth ~25 ms
    # per call at n=28 that the planar chain never pays (measured
    # 0.157 s vs 0.182 s, bench/overhead.py).  Falls back to the
    # rotating-panel XLA mode if the Pallas path fails on this
    # backend.  The remote compile service 500s intermittently —
    # retry before falling back.
    P = jax.ShapeDtypeStruct((1 << n,), jnp.float32)

    def _compile_with_retries(build, lower_args, attempts=3):
        last = None
        for i in range(attempts):
            try:
                return build().lower(*lower_args).compile()
            except Exception as e:  # transient tpu_compile_helper 500s
                last = e
                time.sleep(5 * (i + 1))
        raise last

    mode = "planar_inprogram"
    try:
        # Steady state is measured with the reps chained INSIDE one
        # program (lax.fori_loop with a TRACED trip count, donated
        # planes): the per-dispatch axon-tunnel RPC (~1-5 ms each on a
        # loaded host) is host overhead, not circuit work, and the
        # two-point estimate (t(2R)-t(R))/R cancels the per-program
        # fixed cost exactly — same methodology as the per-pass audit
        # (bench/passes.py), which cross-checks this number pass by
        # pass.
        from jax import lax

        from quantum_simulations_tpu.circuit.panelize import (
            compile_window_schedule,
        )
        from quantum_simulations_tpu.ops import dense
        from quantum_simulations_tpu.runtime.simulator import (
            apply_window_op, pair_panel_diag,
        )

        ops = pair_panel_diag(compile_window_schedule(
            cd, diag_terms_only=True))

        def body(_, st):
            re, im = st
            for op, dterms in ops:
                re, im = apply_window_op(re, im, op, jnp.complex64,
                                         False, False, diag_terms=dterms)
            return (re, im)

        compiled = _compile_with_retries(
            lambda: jax.jit(
                lambda re, im, r: lax.fori_loop(0, r, body, (re, im)),
                donate_argnums=(0, 1)),
            (P, P, jax.ShapeDtypeStruct((), jnp.int32)))
        norm2 = jax.jit(
            lambda re, im: jnp.sum(re * re) + jnp.sum(im * im)
        ).lower(P, P).compile()

        zero_state = jax.jit(lambda: dense.zero_state_planar(n))

        def chain(k: int) -> tuple[float, float]:
            st = zero_state()
            t0 = time.perf_counter()
            st = compiled(*st, jnp.int32(k))
            norm = float(jax.device_get(norm2(*st)))
            return time.perf_counter() - t0, norm

        chain(1)  # warm
        reps = 10
        t1 = min(chain(reps)[0] for _ in range(3))
        runs2 = [chain(2 * reps) for _ in range(3)]
        t2 = min(t for t, _ in runs2)
        final_norm = runs2[-1][1]
        dt = (t2 - t1) / reps
    except Exception:
        mode = "complex_fallback"
        compiled = _compile_with_retries(
            lambda: simulator.build_panel_circuit_fn(
                cd, dtype="complex64", donate=False), (S,))
        norm2 = jax.jit(
            lambda x: jnp.sum(jnp.real(x) ** 2 + jnp.imag(x) ** 2)
        ).lower(S).compile()
        psi = jax.jit(
            lambda: jnp.zeros(1 << n, dtype=jnp.complex64).at[0].set(1.0))()
        float(jax.device_get(norm2(psi)))  # force input

        def chain_py(k: int) -> float:
            out = psi
            for _ in range(k):
                out = compiled(out)
            return float(jax.device_get(norm2(out)))

        chain_py(1)  # warm run
        reps = 10
        t0 = time.perf_counter()
        final_norm = chain_py(reps)
        dt = (time.perf_counter() - t0) / reps

    ref_wall_s = 139.0  # reference out-of-core n=28 (v3_comparison.md:60)
    result = {
        "metric": f"amplitude-updates/sec, n={n} non-stabilizer ({n_gates} gates)",
        "value": round(n_gates * (1 << n) / dt, 1),
        "unit": "amp-updates/s",
        "vs_baseline": round(ref_wall_s / dt, 1),
        "wall_s": round(dt, 4),
        "n_gates": n_gates,
        "norm2": round(final_norm, 7),
        "mode": mode,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
