"""The five BASELINE.md workload configs, end to end on the device.

Mirrors the driver's target list (``/root/repo/BASELINE.md``):
GHZ-20 dense; QFT-26 with CR + fusion; Sycamore-style random circuit
(n=26 single-chip stand-in for the 30q mesh config); QAOA MaxCut with
RZZ/RX layers; and the reference's n=28 non-stabilizer scaling tier.
The 40q out-of-core config needs a real TPU VM (host DMA) and is
exercised structurally by ``spill_bw``.

Run: ``python -m quantum_simulations_tpu.bench.baseline_configs``.
"""
from __future__ import annotations

import json
import time

from . import setup_platform, warm_grant


def run(reps: int = 4, retries: int = 3, only: tuple = (),
        stream: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from ..circuit import library as lib
    from ..runtime import simulator

    dev = setup_platform()
    warm_grant()

    configs = [
        ("ghz20", lib.ghz(20)),
        ("qft26", lib.qft(26)),
        ("sycamore26_d8", lib.sycamore_like(26, depth=8, seed=11)),
        ("qaoa26_p2", lib.qaoa_maxcut(26, p=2)),
        ("nonstab28", lib.non_stabilizer(28, depth=4, seed=7)),
    ]
    if only:
        configs = [c for c in configs if c[0] in only]
    rows = []
    from ..ops import dense

    for tag, cd in configs:
        n = cd["number_of_qubits"]
        P = jax.ShapeDtypeStruct((1 << n,), jnp.float32)
        row = {"config": tag, "n": n, "gates": len(cd["gates"])}
        try:
            t0 = time.time()
            compiled = None
            last = None
            for i in range(retries):
                try:
                    # Planar end-to-end: the complex64<->planar retile
                    # costs ~25 ms per call at n=28 (bench/overhead.py)
                    # that the planar chain never pays.
                    jfn = simulator.build_window_circuit_fn(
                        cd, dtype="complex64", donate=True, planar_io=True,
                    )
                    compiled = jfn.lower(P, P).compile()
                    break
                except Exception as e:  # transient remote-compile 500s
                    last = e
                    time.sleep(6 * (i + 1))
            if compiled is None:
                raise last
            row["compile_s"] = round(time.time() - t0, 1)
            norm2 = jax.jit(
                lambda re, im: jnp.sum(re * re) + jnp.sum(im * im)
            ).lower(P, P).compile()
            state = jax.jit(lambda n=n: dense.zero_state_planar(n))()

            def chain(k, state):
                # k chained applications dispatched async, ONE scalar
                # fetch at the end: the ~44 ms axon-tunnel RTT is paid
                # once per measurement instead of once per rep (it was
                # ~30% of the qft26 wall at per-rep-fetch reps=4).
                for _ in range(k):
                    state = compiled(*state)
                return float(jax.device_get(norm2(*state))), state

            _, state = chain(1, state)  # warm run
            t0 = time.time()
            norm, state = chain(reps, state)
            dt = (time.time() - t0) / reps
            row.update({
                "steady_s": round(dt, 4),
                "amp_updates_per_s": round(len(cd["gates"]) * (1 << n) / dt, 1),
                "norm2": round(norm, 6),
            })

            # NOTE a reps-inside-one-program variant was raced here
            # and measured 2x SLOWER per rep (qft26 0.072 vs 0.035):
            # inlining the jitted circuit drops its donation, so the
            # chain loses the a/b buffer ping-pong.  The Python-level
            # chain above IS the steady-state methodology.
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {str(e)[:120]}"
        rows.append(row)
        if stream:  # one JSON line per finished config (timeout-safe)
            print(json.dumps(row), flush=True)
    return {"device": str(dev), "rows": rows}


if __name__ == "__main__":
    import sys

    only = tuple(a for a in sys.argv[1:])
    out = run(only=only, stream=True)
    print(json.dumps(out, indent=1))
