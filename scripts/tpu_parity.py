"""TPU numerics parity: fused Pallas sweep kernels vs the XLA form.

Runs the LW and SW candidate-sweep kernels on the REAL TPU in float32,
both with the fused Pallas kernel (bf16 split-dot reductions,
ops/pallas/sweep_lw.py:43-70) and the plain XLA path, plus a float64 CPU
truth, and records the max relative errors to PARITY_TPU.json — the
committed hardware evidence for the ~2^-16 split-dot truncation claim
(previously asserted only in CPU interpret mode, tests/test_pallas.py).

Usage: python scripts/tpu_parity.py [output.json]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

import bench  # noqa: E402  (problem builder shared with the benchmark)

NWAV = int(os.environ.get("PARITY_NWAV", 1 << 18))
NLAY = 50
NSEG = 64


def lw_costs(device, dtype, use_pallas):
    import jax
    from ecckd_tpu.partition.cost_kernel import CandidateCostLw

    data = bench.build_inputs(NLAY, NWAV, NSEG, dtype)
    with jax.default_device(device):
        kernel = CandidateCostLw(
            "transmission", 0.02, data["layer_weight"],
            data["pressure_hl"], data["surf_emissivity"],
            data["surf_planck"], data["flux_dn_surf"],
            data["flux_up_toa"], data["planck_hl"], data["bg_od"],
            data["metric"], data["hr"], use_pallas=use_pallas)
        return kernel.costs(data["i1"], data["i2"], data["seg_of_wav"])


def sw_costs(device, dtype, use_pallas):
    import jax
    from ecckd_tpu.partition.cost_kernel import CandidateCostSw

    data = bench.build_inputs(NLAY, NWAV, NSEG, dtype)
    rng = np.random.default_rng(1)
    ssi = np.asarray(np.abs(rng.normal(1.0, 0.1, NWAV)), dtype)
    with jax.default_device(device):
        kernel = CandidateCostSw(
            "transmission", 0.02, data["layer_weight"], 0.5,
            data["pressure_hl"], ssi, 0.15, data["flux_dn_surf"],
            data["flux_up_toa"], data["bg_od"], data["metric"],
            data["hr"], use_pallas=use_pallas)
        return kernel.costs(data["i1"], data["i2"], data["seg_of_wav"])


def max_rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b) / np.maximum(np.abs(b), 1e-30)))


def main():
    import jax

    accel = jax.devices()[0]
    cpu = jax.devices("cpu")[0]
    out = {"device_kind": getattr(accel, "device_kind", str(accel)),
           "nwav": NWAV, "nlay": NLAY, "nseg": NSEG,
           "timestamp": time.strftime("%Y-%m-%d %H:%M:%S")}

    for tag, fn in (("lw", lw_costs), ("sw", sw_costs)):
        truth = fn(cpu, np.float64, use_pallas=False)   # f64 CPU truth
        xla = fn(accel, np.float32, use_pallas=False)
        pallas = fn(accel, np.float32, use_pallas=True)
        out[f"{tag}_pallas_vs_xla_max_rel"] = max_rel(pallas, xla)
        out[f"{tag}_pallas_vs_f64_max_rel"] = max_rel(pallas, truth)
        out[f"{tag}_xla_vs_f64_max_rel"] = max_rel(xla, truth)

    path = sys.argv[1] if len(sys.argv) > 1 else "PARITY_TPU.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
