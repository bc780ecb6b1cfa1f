"""Hyperparameter sweep for the synthetic vol_tiny config.

Finds settings under which the tiny volumetric model converges well under
the voxel pitch within a test-sized budget (the e2e learning test,
tests/test_data_and_engine.py::test_end_to_end_volumetric_training_learns,
needs fast, reliable convergence on the CPU mesh).

Run on the TPU chip:  python benchmarks/vol_tiny_sweep.py
"""

from __future__ import annotations

import copy
import sys
import tempfile

import yaml

sys.path.insert(0, ".")

BASE = "experiments/synthetic/vol_tiny.yaml"


def run_variant(name: str, mutate, max_epochs: int):
    from lt_tpu.engine.train import run

    with open(BASE) as f:
        cfg = yaml.safe_load(f)
    cfg = copy.deepcopy(cfg)
    mutate(cfg)
    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as f:
        yaml.safe_dump(cfg, f)
        path = f.name
    logdir = tempfile.mkdtemp(prefix=f"vol_sweep_{name}_")
    metric = run(path, logdir, max_epochs=max_epochs)
    print(f"SWEEP {name}: final val MPJPE rel = {metric:.1f} mm", flush=True)
    return metric


def main():
    from lt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 6

    def ce(w):
        def m(cfg):
            cfg["opt"]["volumetric_ce_loss_weight"] = w
        return m

    def lr(v):
        def m(cfg):
            for k in ("lr", "process_features_lr", "volume_net_lr"):
                cfg["opt"][k] = v
        return m

    def both(w, v):
        def m(cfg):
            ce(w)(cfg)
            lr(v)(cfg)
        return m

    variants = {
        "ce0.1": ce(0.1),
        "ce1.0": ce(1.0),
        "lr3e-3": lr(3e-3),
        "ce0.1_lr3e-3": both(0.1, 3e-3),
    }
    results = {}
    for name, mutate in variants.items():
        try:
            results[name] = run_variant(name, mutate, epochs)
        except Exception as e:
            print(f"SWEEP {name}: FAILED {e}", flush=True)
    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main()
