"""Deploy assets: the pod worker entry on a virtual 8-device mesh."""
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_pod_worker_virtual_mesh(tmp_path):
    cd = {
        "number_of_qubits": 8,
        "gates": [{"qubits": [0], "gate": "H"}] + [
            {"qubits": [i, i + 1], "gate": "CNOT"} for i in range(7)
        ],
    }
    p = tmp_path / "ghz.json"
    p.write_text(json.dumps(cd))
    r = subprocess.run(
        [sys.executable, str(REPO / "deploy" / "pod_worker.py"),
         str(p), "--devices", "8", "--shots", "4"],
        capture_output=True, text=True, timeout=500,
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": str(REPO),
             "JAX_PLATFORMS": "cpu", "HOME": "/root",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
    )
    assert r.returncode == 0, r.stderr[-800:]
    out = json.loads(r.stdout)
    assert out["mesh_devices"] == 8
    assert abs(out["norm2"] - 1.0) < 1e-5
    # GHZ: every sampled bitstring is all-zeros or all-ones
    for s in out["samples"]:
        assert len(set(s)) == 1
