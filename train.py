"""CLI entry point: train or evaluate a triangulation model.

Parity with /root/reference/train.py:33-46 (same flags, same semantics):

    python train.py --config experiments/synthetic/alg_tiny.yaml --logdir /tmp/logs
    python train.py --eval --eval_dataset val --config ... --logdir ...
"""

import argparse


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True,
                        help="Path to a YAML experiment config")
    parser.add_argument("--eval", action="store_true",
                        help="Only run evaluation")
    parser.add_argument("--eval_dataset", type=str, default="val",
                        choices=("train", "val"))
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--logdir", type=str, default="./logs")
    parser.add_argument("--resume", type=str, default=None,
                        help="Previous experiment dir: restore its newest "
                             "epoch checkpoint and continue training")
    parser.add_argument("--max_epochs", type=int, default=None,
                        help="Cap config.opt.n_epochs (smoke runs)")
    return parser.parse_args()


def main():
    args = parse_args()
    from lt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from lt_tpu.engine.train import run

    run(args.config, args.logdir, eval_only=args.eval,
        eval_dataset=args.eval_dataset, seed=args.seed,
        max_epochs=args.max_epochs, resume_dir=args.resume)


if __name__ == "__main__":
    main()
