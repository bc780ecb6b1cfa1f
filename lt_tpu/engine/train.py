"""Training/evaluation driver: experiment setup, epoch loops, persistence.

Functional parity target: /root/reference/train.py — ``setup_experiment``
(:124-151), ``one_epoch`` (:154-365), ``main`` (:383-478) — rebuilt around
jitted steps (lt_tpu.engine.steps), a device mesh (lt_tpu.parallel), Orbax
checkpoints with true resume, and host-side data iteration
(lt_tpu.data.batch.BatchIterator).
"""

from __future__ import annotations

import json
import os
import pickle
import shutil
import time
from collections import defaultdict
from datetime import datetime
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lt_tpu.data.batch import BatchIterator, prepare_batch
from lt_tpu.engine import checkpoint as ckpt
from lt_tpu.engine import factory
from lt_tpu.engine.steps import (TrainState, make_eval_step,
                                 make_train_step, make_vis_step)
from lt_tpu.parallel import mesh as mesh_lib
from lt_tpu.utils import cfg as cfg_lib


def setup_experiment(config, config_path: str, logdir: str, model_name: str,
                     is_train: bool = True):
    """Create the experiment dir + tensorboard writer (train.py:124-151)."""
    prefix = "" if is_train else "eval_"
    title = (config.get("title", "") + "_" if config.get("title") else "")
    experiment_name = "{}{}{}@{}".format(
        prefix, title, model_name, datetime.now().strftime("%d.%m.%Y-%H.%M.%S"))
    experiment_dir = os.path.join(logdir, experiment_name)
    os.makedirs(os.path.join(experiment_dir, "checkpoints"), exist_ok=True)
    if config_path and os.path.isfile(config_path):
        shutil.copy(config_path, os.path.join(experiment_dir, "config.yaml"))

    writer = None
    try:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(os.path.join(experiment_dir, "tb"))
        # Reference swaps these args (train.py:149, SURVEY §2.5); fixed here.
        writer.add_text("config", cfg_lib.config_to_str(config), 0)
    except Exception:
        pass
    return experiment_dir, writer


class MetricLogger:
    """Tensorboard + JSONL scalar logging (SURVEY.md §5 observability)."""

    def __init__(self, experiment_dir: Optional[str], writer=None):
        self.writer = writer
        self.jsonl = None
        if experiment_dir is not None:
            self.jsonl = open(os.path.join(experiment_dir, "metrics.jsonl"),
                              "a")

    def log(self, tag: str, scalars: dict, step: int):
        for name, value in scalars.items():
            value = float(value)
            if self.writer is not None:
                self.writer.add_scalar(f"{tag}/{name}", value, step)
        if self.jsonl is not None:
            record = {"tag": tag, "step": step,
                      **{k: float(v) for k, v in scalars.items()}}
            self.jsonl.write(json.dumps(record) + "\n")
            self.jsonl.flush()

    def close(self):
        if self.jsonl is not None:
            self.jsonl.close()
            self.jsonl = None
        if self.writer is not None:
            try:
                self.writer.close()
            except Exception:
                pass


def make_datasets(config, is_train: bool = True):
    """Dataset factory: 'human36m' (reference parity), 'cmu_panoptic'
    (beyond-parity; the reference publishes CMU numbers but ships no
    loader), or 'synthetic'."""
    kind = config.dataset.kind
    if kind == "human36m":
        from lt_tpu.data.human36m import Human36MMultiViewDataset

        def build(split_cfg, train, test):
            return Human36MMultiViewDataset(
                h36m_root=split_cfg.h36m_root,
                labels_path=split_cfg.labels_path,
                pred_results_path=split_cfg.get("pred_results_path"),
                image_shape=config.get("image_shape", (256, 256)),
                train=train, test=test,
                retain_every_n_frames_in_test=split_cfg.get(
                    "retain_every_n_frames_in_test", 1),
                with_damaged_actions=split_cfg.get("with_damaged_actions",
                                                   False),
                scale_bbox=split_cfg.get("scale_bbox", 1.5),
                kind=config.kind,
                undistort_images=split_cfg.get("undistort_images", False),
                ignore_cameras=split_cfg.get("ignore_cameras", ()),
                crop=split_cfg.get("crop", True))

        train_ds = build(config.dataset.train, True, False) if is_train else None
        val_ds = build(config.dataset.val, False, True)
        return train_ds, val_ds

    if kind in ("cmu", "cmu_panoptic"):
        from lt_tpu.data.cmu_panoptic import CMUPanopticMultiViewDataset

        def build(split_cfg, train, test):
            return CMUPanopticMultiViewDataset(
                panoptic_root=split_cfg.panoptic_root,
                sequences=split_cfg.sequences,
                camera_names=split_cfg.get("camera_names"),
                n_views=config.dataset.get("n_views", 4),
                train=train, test=test,
                retain_every_n_frames=split_cfg.get(
                    "retain_every_n_frames", 1),
                image_shape=config.get("image_shape", (256, 256)),
                scale_bbox=split_cfg.get("scale_bbox", 1.2),
                crop=split_cfg.get("crop", True))

        train_ds = (build(config.dataset.train, True, False)
                    if is_train else None)
        val_ds = build(config.dataset.val, False, True)
        return train_ds, val_ds

    if kind == "synthetic":
        from lt_tpu.data.synthetic import SyntheticMultiViewDataset

        def build(split_cfg, sample_offset):
            # Both splits share seed 0 — the visual domain (camera ring,
            # joint colors) must be identical or val measures a different
            # task; the splits' POSES are disjoint via sample_offset.
            return SyntheticMultiViewDataset(
                n_samples=split_cfg.get("n_samples", 128),
                n_views=config.dataset.get("n_views", 4),
                num_joints=config.model.backbone.num_joints,
                image_size=config.get("image_shape", (128, 128))[0],
                seed=0, sample_offset=sample_offset,
                cache_images=split_cfg.get("cache_images", True))

        train_ds = build(config.dataset.train, 0) if is_train else None
        val_ds = build(config.dataset.val, 1_000_000)
        return train_ds, val_ds

    raise NotImplementedError(f"Unknown dataset kind: {kind}")


def _merge_matching(dst: dict, src: dict) -> dict:
    """Copy leaves of ``src`` into ``dst`` where the key path exists in
    both with the same array shape; keep ``dst`` elsewhere."""
    out = {}
    for k, v in dst.items():
        s = src.get(k) if isinstance(src, dict) else None
        if isinstance(v, dict) and isinstance(s, dict):
            out[k] = _merge_matching(v, s)
        elif (s is not None and hasattr(v, "shape") and hasattr(s, "shape")
                and v.shape == s.shape):
            out[k] = s
        else:
            out[k] = v
    return out


def init_model_state(config, model, sample_batch, seed: int = 42
                     ) -> TrainState:
    """Initialize variables (+ optionally import reference checkpoints)."""
    model_name = config.model.name
    rngs = {"params": jax.random.PRNGKey(seed),
            "aug": jax.random.PRNGKey(seed + 1)}
    images = jnp.asarray(sample_batch["images"][:1])
    proj = jnp.asarray(sample_batch["proj_matrices"][:1])
    if model_name == "vol":
        pelvis = jnp.asarray(
            sample_batch.get("pred_keypoints_3d",
                             sample_batch["keypoints_3d"])[:1, :, :3])
        variables = jax.jit(model.init)(rngs, images, proj, pelvis)
    else:
        variables = jax.jit(model.init)(rngs, images, proj)
    variables = dict(variables)
    variables.setdefault("batch_stats", {})

    # Backbone-only pretrained weights: a reference .pth
    # (pose_resnet.py:338-375) OR one of our own Orbax checkpoints — the
    # reference's vol workflow initializes the backbone from a trained
    # algebraic model (train/human36m_vol_softmax.yaml), and here that
    # source can be a previous lt_tpu experiment directory.
    bb = config.model.backbone
    if bb.get("init_weights") and bb.get("checkpoint"):
        if bb.checkpoint.endswith(".pth"):
            from lt_tpu.utils import torch_import

            sd = torch_import.load_state_dict(bb.checkpoint)
            imported = torch_import.import_pose_resnet(
                sd, num_layers=bb.num_layers, num_joints=bb.num_joints)
            bb_params = imported["params"]
            bb_stats = imported["batch_stats"]
        elif bb.checkpoint.endswith(".npz"):
            # Compact fixture (lt_tpu.utils.fixture): a pretrained backbone
            # exported as f16 — the committed synthetic-domain stand-in for
            # the reference's pretrained 2D pose net.  Shape-checked merge
            # as below (final_layer may be absent or differently sized).
            from lt_tpu.utils import fixture

            src = fixture.load_backbone_npz(bb.checkpoint)
            bb_params = _merge_matching(variables["params"]["backbone"],
                                        src["params"])
            bb_stats = _merge_matching(
                variables["batch_stats"].get("backbone", {}),
                src["batch_stats"])
        else:
            src = ckpt.restore_raw(ckpt.resolve_checkpoint_dir(bb.checkpoint))
            # Shape-checked merge: source models may carry different heads
            # (alg_confidences vs vol_confidences) or a different-J
            # final_layer — copy only leaves that exist in the target with
            # matching shapes, keep the fresh init elsewhere
            # (pose_resnet.py:351-358 reinit semantics).
            bb_params = _merge_matching(variables["params"]["backbone"],
                                        src["params"]["backbone"])
            bb_stats = _merge_matching(
                variables["batch_stats"].get("backbone", {}),
                src["batch_stats"]["backbone"])
        variables["params"] = {**variables["params"],
                               "backbone": bb_params}
        variables["batch_stats"] = {**variables["batch_stats"],
                                    "backbone": bb_stats}

    # Whole-model weights (train.py:406-413).  Sources: a reference .pth,
    # a committed .npz fixture (lt_tpu.utils.fixture — the synthetic-domain
    # pretrained model the e2e tests fine-tune from), or a previous lt_tpu
    # experiment/checkpoint dir (Orbax).
    if config.model.get("init_weights") and config.model.get("checkpoint"):
        from lt_tpu.utils import torch_import

        path = config.model.checkpoint
        if path.endswith(".npz"):
            from lt_tpu.utils import fixture

            src = fixture.load_model_npz(path)
            variables["params"] = _merge_matching(variables["params"],
                                                  src["params"])
            variables["batch_stats"] = _merge_matching(
                variables["batch_stats"], src["batch_stats"])
        elif path.endswith(".pth"):
            sd = torch_import.load_state_dict(path)
            if model_name == "alg":
                imported = torch_import.import_algebraic_model(
                    sd, bb.num_layers, bb.num_joints)
            elif model_name == "vol":
                imported = torch_import.import_volumetric_model(
                    sd, bb.num_layers, bb.num_joints)
            else:
                imported = {"params": {"backbone": torch_import.
                                       import_pose_resnet(
                                           sd, bb.num_layers, bb.num_joints,
                                           prefix="backbone.")["params"]},
                            "batch_stats": {
                                "backbone": torch_import.import_pose_resnet(
                                    sd, bb.num_layers, bb.num_joints,
                                    prefix="backbone.")["batch_stats"]}}
            variables["params"] = {**variables["params"],
                                   **imported["params"]}
            variables["batch_stats"] = {**variables["batch_stats"],
                                        **imported["batch_stats"]}

    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return params, batch_stats


def build_train_state(config, params, batch_stats) -> tuple:
    optimizer = factory.make_optimizer(config, params, config.model.name)
    opt_state = optimizer.init(params)
    state = TrainState(params=params, batch_stats=batch_stats,
                       opt_state=opt_state, step=jnp.zeros((), jnp.int32))
    return state, optimizer


def _device_batch(batch, config, mesh=None, pad_to: Optional[int] = None):
    """Prepared numpy batch -> the dict of arrays the steps consume.

    With a ``mesh`` (the DDP replacement, /root/reference/train.py:452-453),
    every array is device_put with its leading axis sharded over the 'data'
    axis — replicated params + sharded batch makes XLA insert the gradient
    all-reduce over ICI.  ``pad_to`` pads a partial batch (eval tail with
    drop_last=False) up to a static size by repeating the last sample, which
    keeps shapes static (one compile) and divisible by the mesh; returns
    ``(device_batch, n_real)`` so callers can trim padded predictions.
    """
    images, kp_gt, validity, proj, view_mask = prepare_batch(batch)
    out = {"images": images,
           "keypoints_3d": np.concatenate([kp_gt, validity], -1),
           "keypoints_validity": validity,
           "proj_matrices": proj,
           "view_mask": view_mask}
    if "pred_keypoints_3d" in batch:
        out["pred_keypoints_3d"] = np.asarray(batch["pred_keypoints_3d"])
    n_real = int(images.shape[0])
    if pad_to is not None and n_real < pad_to:
        pad = pad_to - n_real
        out = {k: np.concatenate([v, np.repeat(v[-1:], pad, axis=0)])
               for k, v in out.items()}
        # Padded samples carry zero keypoint validity, so every
        # validity-normalized loss/metric in compute_losses excludes them
        # exactly (the keypoints_3d validity column too, for symmetry).
        out["keypoints_validity"][n_real:] = 0.0
        out["keypoints_3d"][n_real:, :, 3:] = 0.0
    if mesh is not None:
        out = mesh_lib.shard_batch(out, mesh)
    else:
        out = {k: jnp.asarray(v) for k, v in out.items()}
    return out, n_real


def train_epoch(train_step, state, iterator, epoch: int, rng, logger,
                config, n_iters_total: int, n_iters_per_epoch=None,
                vis_step=None, mesh=None):
    """One training epoch (train.py:154-365, is_train branch)."""
    vis_freq = config.get("vis_freq")
    end = time.time()
    for i, batch in enumerate(iterator.epoch(epoch)):
        if n_iters_per_epoch is not None and i >= n_iters_per_epoch:
            break
        data_time = time.time() - end
        device_batch, _ = _device_batch(batch, config, mesh=mesh)
        state, metrics = train_step(state, device_batch, rng)
        master = mesh_lib.is_master()
        if master and logger is not None:
            # One bulk device->host fetch: per-scalar float() would cost a
            # full transfer round-trip per metric per iteration.
            metrics = jax.device_get(metrics)
            batch_time = time.time() - end
            logger.log("train", {**{k: float(v) for k, v in metrics.items()},
                                 "batch_time": batch_time,
                                 "data_time": data_time,
                                 "batch_size": batch["images"].shape[0],
                                 "n_views": batch["images"].shape[1]},
                       n_iters_total)
        if (master and vis_freq and logger is not None
                and logger.writer is not None and vis_step is not None
                and n_iters_total % vis_freq == 0):
            _log_vis_panels(logger.writer, vis_step, state, batch,
                            device_batch, config, n_iters_total,
                            model_name=config.model.name)
        end = time.time()
        n_iters_total += 1
    return state, n_iters_total


def _log_vis_panels(writer, vis_step, state, batch, device_batch, config,
                    step: int, model_name: str = "alg"):
    """Tensorboard image panels every vis_freq iters (train.py:271-305):
    keypoint grid (+ cuboid wireframe for vol), heatmap overlays, volume
    MIPs, and parameter histograms (train.py:307-315)."""
    try:
        from lt_tpu.utils import vis

        out = jax.device_get(vis_step(state, device_batch))
        kp_pred = np.asarray(out.keypoints_3d)
        kind = config.get("kind", "human36m")
        n = min(batch["images"].shape[0], config.get("vis_n_elements", 2))

        confidences = getattr(out, "confidences", None)
        cuboids = None
        if model_name == "vol":
            side = config.model.get("cuboid_side", 2500.0)
            sides = np.array([side, side, side], np.float32)
            cuboids = (np.asarray(out.base_points) - sides / 2.0, sides)
        keypoints_2d = getattr(out, "keypoints_2d", None)

        for bi in range(n):
            panel = vis.visualize_batch(
                batch["images"], None, keypoints_2d,
                batch["proj_matrices"], batch["keypoints_3d"][:, :, :3],
                kp_pred, kind=kind, confidences=confidences,
                cuboids=cuboids, batch_index=bi)
            writer.add_image(f"train/keypoints_vis/{bi}",
                             panel.transpose(2, 0, 1), global_step=step)
            if getattr(out, "heatmaps", None) is not None:
                panel = vis.visualize_heatmaps(
                    batch["images"], np.asarray(out.heatmaps), kind=kind,
                    batch_index=bi)
                writer.add_image(f"train/heatmaps_vis/{bi}",
                                 panel.transpose(2, 0, 1), global_step=step)
            if getattr(out, "volumes", None) is not None:
                panel = vis.visualize_volumes(
                    batch["images"], np.asarray(out.volumes),
                    batch["proj_matrices"], kind=kind, batch_index=bi)
                writer.add_image(f"train/volumes_vis/{bi}",
                                 panel.transpose(2, 0, 1), global_step=step)

        # Parameter histograms (train.py:307-315).
        flat, _ = jax.tree_util.tree_flatten_with_path(state.params)
        for path, leaf in flat:
            name = "/".join(getattr(p, "key", str(p)) for p in path)
            writer.add_histogram(f"model/{name}", np.asarray(leaf), step)
    except Exception as e:  # vis must never take down training
        print("vis logging failed:", e)


def eval_epoch(eval_step, state, iterator, config, epoch: int,
               experiment_dir=None, logger=None, dataset=None,
               n_iters_total: int = 0, mesh=None):
    """One eval epoch + dataset.evaluate + results dump (train.py:337-359)."""
    results = defaultdict(list)
    metric_means = defaultdict(list)
    for batch in iterator.epoch(0):
        # Pad the drop_last=False tail batch to the static batch size (and
        # mesh divisibility); trim the padded predictions right after.
        device_batch, n_real = _device_batch(batch, config, mesh=mesh,
                                             pad_to=iterator.batch_size)
        keypoints, metrics = eval_step(state, device_batch)
        results["keypoints_3d"].append(np.asarray(keypoints)[:n_real])
        results["indexes"].append(np.asarray(batch["indexes"]))
        metrics = jax.device_get(metrics)
        # Weight each batch by its real sample count: the padded tail batch
        # must not count as much as a full batch in the epoch means (its
        # padded samples are already excluded on-device via zero validity).
        for k, v in metrics.items():
            metric_means[k].append((float(v), n_real))

    results["keypoints_3d"] = np.concatenate(results["keypoints_3d"], axis=0)
    results["indexes"] = np.concatenate(results["indexes"])

    scalar_metric, full_metric = 0.0, {}
    if dataset is not None:
        try:
            order = np.argsort(results["indexes"])
            # evaluate() expects predictions aligned with the dataset table.
            preds = results["keypoints_3d"][order]
            if len(preds) == len(dataset):
                scalar_metric, full_metric = dataset.evaluate(preds)
            else:  # partial eval (drop_last): score what we have
                scalar_metric, full_metric = _partial_evaluate(
                    dataset, preds, results["indexes"][order],
                    kind=config.get("kind", "human36m"))
        except Exception as e:  # train.py:342-346 behavior
            print("Failed to evaluate. Reason:", e)

    if mesh_lib.is_master() and experiment_dir is not None:
        checkpoint_dir = os.path.join(experiment_dir, "checkpoints",
                                      f"{epoch:04}")
        os.makedirs(checkpoint_dir, exist_ok=True)
        with open(os.path.join(checkpoint_dir, "results.pkl"), "wb") as f:
            pickle.dump(dict(results), f)
        with open(os.path.join(checkpoint_dir, "metric.json"), "w") as f:
            json.dump(full_metric, f, indent=4, sort_keys=True, default=float)
        if logger is not None:
            epoch_metrics = {
                k: float(np.average([x for x, _ in v],
                                    weights=[w for _, w in v]))
                for k, v in metric_means.items()}
            epoch_metrics["dataset_metric"] = scalar_metric
            logger.log("val_epoch", epoch_metrics, epoch)
    return scalar_metric, full_metric, results


def _partial_evaluate(dataset, preds, indexes, kind: str = "human36m"):
    """MPJPE over an index subset (used when drop_last trims the tail).

    GT comes from ``dataset.keypoints_world`` (the labels table) when
    available — ``dataset[i]`` would decode all V JPEGs per index just to
    read keypoints, which at H36M scale means re-decoding the split.
    """
    gt = np.stack([
        dataset.keypoints_world(int(i)) if hasattr(
            dataset, "keypoints_world") else
        dataset[int(i)]["keypoints_3d"][:, :3]
        for i in indexes])
    per_pose = np.sqrt(((gt - preds) ** 2).sum(2)).mean(1)
    if kind == "coco":  # pelvis = midpoint of the hips (vis.py kind tables)
        gt_root = (gt[:, 11:12] + gt[:, 12:13]) / 2.0
        pr_root = (preds[:, 11:12] + preds[:, 12:13]) / 2.0
    elif kind == "cmu":  # COCO19 bodyCenter
        gt_root, pr_root = gt[:, 2:3], preds[:, 2:3]
    else:  # human36m/mpii root joint 6 (human36m.py:258-266)
        gt_root, pr_root = gt[:, 6:7], preds[:, 6:7]
    gt_rel = gt - gt_root
    pr_rel = preds - pr_root
    per_pose_rel = np.sqrt(((gt_rel - pr_rel) ** 2).sum(2)).mean(1)
    scalar = float(per_pose_rel.mean())
    return scalar, {"per_pose_error": {"Average": {
        "Average": float(per_pose.mean())}},
        "per_pose_error_relative": {"Average": {"Average": scalar}}}


def resolve_resume(resume_dir: str, state):
    """Auto-resume: restore the newest epoch checkpoint of an experiment.

    ``resume_dir`` is a previous experiment directory (or its
    ``checkpoints/`` subdir); returns ``(state, start_epoch)`` where
    start_epoch continues after the checkpointed epoch.
    """
    cdir = os.path.join(resume_dir, "checkpoints")
    latest = ckpt.latest_epoch_dir(cdir if os.path.isdir(cdir)
                                   else resume_dir)
    if latest is None:
        raise FileNotFoundError(
            f"no epoch checkpoints found under {resume_dir}")
    state = ckpt.restore_checkpoint(latest, state)
    start_epoch = int(os.path.basename(latest)) + 1
    print(f"Auto-resumed from {latest} (continuing at epoch "
          f"{start_epoch}, step {int(state.step)})")
    return state, start_epoch


def run(config_path: str, logdir: str, eval_only: bool = False,
        eval_dataset: str = "val", seed: int = 42,
        max_epochs: Optional[int] = None, resume_dir: Optional[str] = None,
        overrides: Optional[dict] = None):
    """Full driver (train.py:383-478 parity). Returns the final val metric."""
    from lt_tpu.utils.cache import enable_compilation_cache

    # Multi-host rendezvous must precede any backend touch (the reference's
    # init_distributed runs first in main() for the same reason,
    # train.py:385).
    mesh_lib.initialize_multihost()
    enable_compilation_cache()

    config = cfg_lib.load_config(config_path)
    for k, v in (overrides or {}).items():
        node = config
        parts = k.split(".")  # dotted paths reach nested sections
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    # Per-device batch semantics (`opt.batch_per_device: true`): interpret
    # the config's batch sizes as per-chip and scale them by the device
    # count, so configs whose global batch doesn't divide the slice (the
    # reference's flagship batch_size 5 on an 8-chip slice: gcd(5, 8) = 1
    # would idle 7 chips) still use every device.  The standard TPU-pod
    # convention; the reference's DDP has no equivalent (its
    # torch.utils.data DataLoader batch is global, train.py:78).
    if config.opt.get("batch_per_device") and len(jax.devices()) > 1:
        scale = len(jax.devices())
        config.opt.batch_size = config.opt.batch_size * scale
        if config.opt.get("val_batch_size") is not None:
            config.opt.val_batch_size = config.opt.val_batch_size * scale
        print(f"batch_per_device: global batch {config.opt.batch_size} "
              f"over {scale} devices")

    if config.opt.get("n_objects_per_epoch") is not None:
        config.opt.n_iters_per_epoch = (config.opt.n_objects_per_epoch
                                        // config.opt.batch_size)

    # Debug sanitizers (replaces the reference's always-on detect_anomaly,
    # train.py:177): opt-in via config, zero cost when off.
    if config.get("debug_nans"):
        jax.config.update("jax_debug_nans", True)

    # Device profiling (SURVEY.md §5 — the reference only has wall-clock
    # timers): config.profile_dir captures a jax.profiler trace of the first
    # training steps, viewable in tensorboard/xprof.
    profile_dir = config.get("profile_dir")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    model_name = config.model.name
    val_batch_size = config.opt.get("val_batch_size", config.opt.batch_size)

    # Parallelism over the available devices.  Two driver-reachable modes:
    #
    # - Data parallelism (default; the reference's DDP wrap,
    #   train.py:452-453): params replicated, batches sharded on the leading
    #   axis over the 'data' mesh.  The mesh spans the most devices that
    #   evenly divide both batch sizes (per-device batches must be
    #   equal-sized under jax sharding).
    # - Spatial sharding (`model.volume_axis_sharding: true`, vol only —
    #   lt_tpu/parallel/spatial.py): ONE sample's volume is split on its X
    #   axis over the mesh (GSPMD inserts the conv halo exchanges).  Params
    #   replicated, batches replicated.  The latency/memory strategy, vs
    #   data parallelism's throughput strategy.
    #
    # On one device both are skipped and arrays are plain device_put.
    import math

    mesh = None          # batch-sharding mesh (data parallelism)
    model_mesh = None    # mesh handed to make_model (spatial sharding)
    n_devices = len(jax.devices())
    spatial = bool(config.model.get("volume_axis_sharding")
                   and model_name == "vol")
    if n_devices > 1 and spatial:
        n_mesh = math.gcd(config.model.get("volume_size", 64), n_devices)
        if n_mesh > 1:
            model_mesh = mesh_lib.make_mesh(n_mesh)
            print(f"Spatial (volume-X) sharding over {n_mesh} devices")
    elif n_devices > 1 and config.get("data_parallel", True):
        n_mesh = math.gcd(math.gcd(config.opt.batch_size, val_batch_size),
                          n_devices)
        if n_mesh > 1:
            mesh = mesh_lib.make_mesh(n_mesh)
        if n_mesh < n_devices:
            print(f"warning: batch sizes ({config.opt.batch_size}/"
                  f"{val_batch_size}) only divide over {n_mesh} of "
                  f"{n_devices} devices; the rest idle — pick batch sizes "
                  f"divisible by {n_devices} to use the whole slice")
        if mesh is not None:
            print(f"Data-parallel mesh over {n_mesh} devices "
                  f"({config.opt.batch_size // n_mesh} samples/device)")

    model = factory.make_model(config, mesh=model_mesh)
    criterion = factory.make_criterion(config)

    # The train split is also needed for `--eval --eval_dataset train`.
    need_train = (not eval_only) or eval_dataset == "train"
    train_ds, val_ds = make_datasets(config, is_train=need_train)

    train_it = None
    if train_ds is not None:
        train_it = BatchIterator(
            train_ds, config.opt.batch_size,
            shuffle=config.dataset.train.get("shuffle", True), seed=seed,
            shard_id=jax.process_index(), num_shards=jax.process_count(),
            randomize_n_views=config.dataset.train.get("randomize_n_views",
                                                       False),
            min_n_views=config.dataset.train.get("min_n_views"),
            max_n_views=config.dataset.train.get("max_n_views"))
    # drop_last=False: the real evaluator must always see the whole val set
    # (the per-action/per-subject breakdown, human36m.py:237-273, needs
    # len(preds) == len(dataset)); the tail batch is padded to a static
    # shape in eval_epoch instead of dropped.
    val_it = BatchIterator(val_ds, val_batch_size, shuffle=False,
                           drop_last=False, seed=seed)

    sample_batch = next(val_it.epoch(0))
    params, batch_stats = init_model_state(config, model, sample_batch, seed)
    state, optimizer = build_train_state(config, params, batch_stats)

    # Resume from one of our own checkpoints (full train state, true resume —
    # the reference can't do this, SURVEY.md §5).  .pth (reference import)
    # and .npz (committed fixture) sources carry weights only — they were
    # merged by init_model_state above and have no optimizer state to
    # restore.
    resume_path = config.model.get("checkpoint", "")
    if (config.model.get("init_weights") and resume_path
            and not resume_path.endswith((".pth", ".npz"))):
        state = ckpt.restore_checkpoint(resume_path, state, name="")
        print(f"Resumed train state from {resume_path} "
              f"(step {int(state.step)})")

    start_epoch = 0
    if resume_dir:
        state, start_epoch = resolve_resume(resume_dir, state)

    if mesh is not None:
        state = jax.device_put(state, mesh_lib.replicated_sharding(mesh))
    elif model_mesh is not None:  # spatial mode: params replicated, the
        # in-jit with_sharding_constraint splits the volume over the mesh
        state = jax.device_put(state,
                               mesh_lib.replicated_sharding(model_mesh))

    train_step = make_train_step(model, model_name, criterion, optimizer,
                                 config)
    eval_step = make_eval_step(model, model_name, criterion, config)
    vis_step = (make_vis_step(model, model_name, config)
                if config.get("vis_freq") else None)

    experiment_dir, writer = (None, None)
    if mesh_lib.is_master():
        experiment_dir, writer = setup_experiment(
            config, config_path, logdir, type(model).__name__,
            is_train=not eval_only)
    logger = MetricLogger(experiment_dir, writer)
    rng = jax.random.PRNGKey(seed)

    try:
        if eval_only:
            it = train_it if eval_dataset == "train" else val_it
            ds = train_ds if eval_dataset == "train" else val_ds
            scalar, full, _ = eval_epoch(eval_step, state, it, config, 0,
                                         experiment_dir, logger, ds,
                                         mesh=mesh)
            print(f"Eval metric (MPJPE rel, mm): {scalar:.3f}")
            return scalar

        n_epochs = config.opt.n_epochs if max_epochs is None else min(
            config.opt.n_epochs, max_epochs)
        # After --resume, continue the logger step axis where the restored
        # run left off (state.step counts train iterations) instead of
        # overwriting the already-written scalars from step 0.
        n_iters_total = int(state.step)
        scalar = None
        for epoch in range(start_epoch, n_epochs):
            state, n_iters_total = train_epoch(
                train_step, state, train_it, epoch, rng, logger, config,
                n_iters_total, config.opt.get("n_iters_per_epoch"),
                vis_step=vis_step, mesh=mesh)
            if profile_dir and epoch == 0:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                profile_dir = None
            scalar, full, _ = eval_epoch(eval_step, state, val_it, config,
                                         epoch, experiment_dir, logger,
                                         val_ds, mesh=mesh)
            if mesh_lib.is_master() and experiment_dir is not None:
                checkpoint_dir = os.path.join(experiment_dir, "checkpoints",
                                              f"{epoch:04}")
                os.makedirs(checkpoint_dir, exist_ok=True)
                ckpt.save_checkpoint(checkpoint_dir, state)
            print(f"epoch {epoch}: val MPJPE rel = {scalar:.3f} mm")
        return scalar
    finally:
        logger.close()
