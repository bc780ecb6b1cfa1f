"""Stage-1 (algebraic) synthetic convergence sweep.

From-scratch vol training plateaus ~370 mm (r4 sweeps) because the shared
bottleneck — a from-scratch backbone — never learns to localize blobs in
the ~100-step tiny budget.  Hypothesis: ``heatmap_multiplier: 100`` (tuned
by the reference for a PRETRAINED backbone, triangulation.py:164) saturates
the 2D soft-argmax at init: random logits x100 give a near-one-hot softmax
at a random location with vanishing gradients elsewhere.

    python benchmarks/alg_converge_sweep.py
"""

from __future__ import annotations

import os
import sys
import tempfile

import yaml

sys.path.insert(0, ".")

VARIANTS = {
    "base_m100_lr3e-4": {},
    "m100_lr1e-3": {"lr": 1e-3},
    "m10_lr1e-3": {"lr": 1e-3, "mult": 10.0},
    "m3_lr1e-3": {"lr": 1e-3, "mult": 3.0},
    "m10_lr3e-3": {"lr": 3e-3, "mult": 10.0},
}

EPOCHS = int(os.environ.get("SWEEP_EPOCHS", "12"))


def main():
    from lt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from lt_tpu.engine.train import run

    results = {}
    for name, v in VARIANTS.items():
        with open("experiments/synthetic/alg_tiny.yaml") as f:
            cfg = yaml.safe_load(f)
        cfg["opt"]["n_epochs"] = EPOCHS
        if "lr" in v:
            cfg["opt"]["lr"] = v["lr"]
        if "mult" in v:
            cfg["model"]["heatmap_multiplier"] = v["mult"]
        with tempfile.NamedTemporaryFile("w", suffix=".yaml",
                                         delete=False) as f:
            yaml.safe_dump(cfg, f)
            path = f.name
        logdir = tempfile.mkdtemp(prefix=f"alg_sweep_{name}_")
        m = run(path, logdir, max_epochs=EPOCHS)
        results[name] = float(m)
        print(f"SWEEP {name}: final val MPJPE rel = {m:.1f} mm", flush=True)
    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main()
