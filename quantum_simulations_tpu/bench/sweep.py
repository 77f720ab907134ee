"""Hyperparameter sweep over execution knobs.

Analogue of ``wenbo_engine/bench/hyperparam_sweep.py``: mode x fusion x
panel width (and stripe width for the out-of-core tier), reporting
wall time per configuration on a fixed workload.
"""
from __future__ import annotations

import json
import time

from . import force, setup_platform, timeit, warm_grant


def run(n: int = 22, dtype="complex64", reps: int = 3) -> dict:
    import jax
    import jax.numpy as jnp

    from ..circuit import library as lib
    from ..ops import dense
    from ..runtime import simulator

    dev = setup_platform()
    warm_grant()
    cd = lib.non_stabilizer(n, depth=3, seed=5)
    S = jax.ShapeDtypeStruct((1 << n,), jnp.dtype(dtype))
    psi = jax.jit(lambda: dense.zero_state(n, dtype))()
    force(psi)

    rows = []
    configs = (
        [{"mode": "panel"}]
        + [{"mode": "fused", "use_fusion": f, "panel_width": w}
           for f in (True, False) for w in (None, 7)]
    )
    for cfg in configs:
        t0 = time.time()
        if cfg["mode"] == "panel":
            fn = simulator.build_panel_circuit_fn(cd, dtype=dtype, donate=False)
        else:
            fn = simulator.build_circuit_fn(
                cd, dtype=dtype, donate=False,
                use_fusion=cfg["use_fusion"], panel_width=cfg["panel_width"])
        compiled = fn.lower(S).compile()
        compile_s = time.time() - t0
        dt = timeit(lambda: force(compiled(psi)), reps)
        rows.append({**cfg, "compile_s": round(compile_s, 2),
                     "wall_s": round(dt, 4)})
    return {"n": n, "gates": len(cd["gates"]), "device": str(dev),
            "rows": rows}


if __name__ == "__main__":
    print(json.dumps(run(), indent=1))
