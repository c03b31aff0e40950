"""Generic training loop shared by every method.

Keeps the reference run contract (train_fully_supervised_2D.py:84-178):
TensorBoard tags (info/lr, info/total_loss, info/loss_ce, info/val_*),
validation every 200 iterations with best-checkpointing, periodic
checkpoints every 3000 iterations, log.txt + stdout logging, snapshot dir
`{root}/{exp}_{fold}/{sup_type}`.

TPU-native runtime on top of it:
  * one jitted step with donated state (no per-step host round trips beyond
    scalar metric fetches at the logging cadence);
  * data-parallel over a 1-D device mesh, batch sharded over ICI;
  * on-device augmentation inside the step;
  * resumable full-state checkpoints; optional jax.profiler trace capture.
"""

from __future__ import annotations

import logging
import os
import shutil
import time

import jax
import numpy as np

from ..data.loader import prefetch
from ..eval.val2d import VolumePredictor, evaluate_fold
from ..parallel.mesh import make_mesh, replicate_tree, shard_batch
from ..utils.checkpoint import (
    restore_train_state,
    save_model_checkpoint,
    save_train_state,
)
from ..utils.logging_utils import Timer, setup_run_logging
from .config import TrainConfig
from .methods.common import MethodBundle


class Trainer:
    def __init__(self, cfg: TrainConfig, bundle: MethodBundle,
                 use_tensorboard: bool = True):
        self.cfg = cfg
        self.bundle = bundle
        self.snapshot_path = cfg.snapshot_path
        os.makedirs(self.snapshot_path, exist_ok=True)
        setup_run_logging(self.snapshot_path)
        self._snapshot_code()

        if cfg.debug_nans:
            jax.config.update("jax_debug_nans", True)
        self.mesh = make_mesh(cfg.num_devices)
        self.multi_device = self.mesh.devices.size > 1
        if cfg.batch_size % self.mesh.devices.size != 0:
            raise ValueError(
                f"batch_size {cfg.batch_size} must divide over "
                f"{self.mesh.devices.size} devices"
            )

        self.state = bundle.state
        if self.multi_device:
            self.state = replicate_tree(self.mesh, self.state)

        # K-step fusion: scan K train steps inside one device call so the
        # per-dispatch latency (severe over a tunneled chip, nonzero
        # anywhere) amortizes across K updates.
        self.multi = max(1, cfg.steps_per_call)
        if self.multi > 1:
            inner = bundle.step_fn
            k = self.multi

            def multi_step(state, stacked, rng, aux):
                keys = jax.random.split(rng, k)

                def body(st, xs):
                    key, one = xs
                    st, m = inner(st, one, key, aux)
                    return st, m

                state, ms = jax.lax.scan(body, state, (keys, stacked))
                return state, jax.tree.map(lambda x: x[-1], ms)

            self.step_fn = jax.jit(multi_step, donate_argnums=0)
        else:
            self.step_fn = jax.jit(bundle.step_fn, donate_argnums=0)

        def _round(v):
            return max(self.multi, (v // self.multi) * self.multi)

        if self.multi > 1 and cfg.val_every % self.multi:
            logging.warning(
                "steps_per_call %d does not divide val_every %d: validation/"
                "checkpoint cadence quantizes to every %d iterations (the "
                "reference contract is every %d, "
                "train_fully_supervised_2D.py:132)",
                self.multi, cfg.val_every, _round(cfg.val_every),
                cfg.val_every,
            )
        self.val_every = _round(cfg.val_every)
        self.ckpt_every = _round(cfg.ckpt_every)
        self.log_every = _round(cfg.log_every)
        self.image_every = _round(20)  # train_fully_supervised_2D.py:121
        self.data_iter = prefetch(bundle.data_iter, size=4 * self.multi)
        self.predictor = bundle.predictor or VolumePredictor(
            bundle.model, cfg.patch_size
        )
        self.base_rng = jax.random.key(
            cfg.seed, impl="rbg" if cfg.fast_prng else None
        )

        self.writer = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self.writer = SummaryWriter(self.snapshot_path + "/log")
            except Exception:  # pragma: no cover - TB optional
                logging.warning("tensorboardX unavailable; scalars not logged")

        if cfg.resume:
            ckpt = os.path.join(self.snapshot_path, "latest_full.ckpt")
            if os.path.exists(ckpt):
                self.state = restore_train_state(ckpt, self.state)
                logging.info(
                    "resumed from %s at step %d", ckpt, int(self.state.step)
                )

    # ------------------------------------------------------------------
    def _snapshot_code(self):
        """Copy the library into the run dir for provenance
        (train_fully_supervised_2D.py:198-201)."""
        try:
            src = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            dst = os.path.join(self.snapshot_path, "code")
            if os.path.exists(dst):
                shutil.rmtree(dst)
            shutil.copytree(
                src, dst, ignore=shutil.ignore_patterns("__pycache__", ".git")
            )
        except OSError as e:  # pragma: no cover - best effort
            logging.warning("code snapshot failed: %s", e)

    def _scalar(self, tag, value, step):
        if self.writer is not None:
            self.writer.add_scalar(tag, float(value), step)

    def _images(self, vis, step):
        """train/Image|Prediction|GroundTruth triptych
        (train_fully_supervised_2D.py:121-130)."""
        if self.writer is None or vis is None:
            return
        image = np.asarray(vis["image"], np.float32)
        lo, hi = image.min(), image.max()
        image = (image - lo) / max(hi - lo, 1e-12)
        self.writer.add_image("train/Image", image[None], step)
        pred = (np.asarray(vis["pred"]) * 50).astype(np.uint8)
        self.writer.add_image("train/Prediction", pred[None], step)
        lab = (np.asarray(vis["label"]) * 50).astype(np.uint8)
        self.writer.add_image("train/GroundTruth", lab[None], step)

    def _lr(self, iter_num):
        # logged LR comes from the same schedule the optimizer applies
        # (bundle.lr_schedule, else engine/optim.poly_lr) — no drift.
        if self.bundle.lr_schedule is not None:
            return float(self.bundle.lr_schedule(iter_num))
        from .optim import poly_lr

        return float(
            poly_lr(self.cfg.base_lr, self.cfg.max_iterations)(iter_num)
        )

    def validate(self, iter_num: int) -> tuple[float, float]:
        """Run validation; returns the metric that drives best-model
        selection.

        The main predictor keeps the reference training-val rule and the
        reference TB tags. When the bundle provides a select_predictor
        (ScribbleVC: the test-time no-memory mean-softmax rule — the
        memory-injected CAM metric is depressed ~14 pts and froze selection
        at a bad epoch, RESULTS.md round-2), its metric is logged under
        info/val_select_* and returned for selection instead.

        cfg.light_val skips the train-rule pass when a select_predictor
        exists (selection never reads it; it only feeds the reference TB
        tags). Validation dominates ScribbleVC wall-clock (~126 s/val at
        round-3 pace, 2 full evaluate_fold passes + host HD95), so the
        200-epoch protocol is hours of pure duplicate metric computation
        without this.
        """
        if self.bundle.val_variables is not None:
            variables = self.bundle.val_variables(self.state)
        else:
            variables = {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
            }
        nan_aware = self.bundle.nan_val_metrics
        if self.cfg.light_val and self.bundle.select_predictor is not None:
            mean = np.nanmean if nan_aware else np.mean
            sel_vars = (
                self.bundle.select_variables(self.state)
                if self.bundle.select_variables is not None
                else variables
            )
            sel_list = evaluate_fold(
                self.bundle.select_predictor, sel_vars,
                self.bundle.val_volumes, self.cfg.num_classes,
                nan_aware=nan_aware,
            )
            sel_perf = float(mean(sel_list, axis=0)[0])
            sel_hd95 = float(mean(sel_list, axis=0)[1])
            self._scalar("info/val_select_mean_dice", sel_perf, iter_num)
            self._scalar("info/val_select_mean_hd95", sel_hd95, iter_num)
            logging.info(
                "iteration %d : val(select-rule, light) dice %f",
                iter_num, sel_perf,
            )
            return sel_perf, sel_hd95
        metric_list = evaluate_fold(
            self.predictor, variables, self.bundle.val_volumes,
            self.cfg.num_classes, nan_aware=nan_aware,
        )
        for class_i in range(self.cfg.num_classes - 1):
            self._scalar(f"info/val_{class_i + 1}_dice",
                         metric_list[class_i, 0], iter_num)
            self._scalar(f"info/val_{class_i + 1}_hd95",
                         metric_list[class_i, 1], iter_num)
        mean = np.nanmean if nan_aware else np.mean
        performance = float(mean(metric_list, axis=0)[0])
        mean_hd95 = float(mean(metric_list, axis=0)[1])
        self._scalar("info/val_mean_dice", performance, iter_num)
        self._scalar("info/val_mean_hd95", mean_hd95, iter_num)
        if self.bundle.select_predictor is not None:
            sel_vars = (
                self.bundle.select_variables(self.state)
                if self.bundle.select_variables is not None
                else variables
            )
            sel_list = evaluate_fold(
                self.bundle.select_predictor, sel_vars,
                self.bundle.val_volumes, self.cfg.num_classes,
                nan_aware=nan_aware,
            )
            sel_perf = float(mean(sel_list, axis=0)[0])
            sel_hd95 = float(mean(sel_list, axis=0)[1])
            self._scalar("info/val_select_mean_dice", sel_perf, iter_num)
            self._scalar("info/val_select_mean_hd95", sel_hd95, iter_num)
            logging.info(
                "iteration %d : val(train-rule) dice %f ; val(select-rule) "
                "dice %f", iter_num, performance, sel_perf,
            )
            return sel_perf, sel_hd95
        return performance, mean_hd95

    # ------------------------------------------------------------------
    def train(self) -> str:
        cfg = self.cfg
        logging.info("%d iterations per epoch", self.bundle.steps_per_epoch)
        iter_num = int(self.state.step)
        best_performance = 0.0
        timer = Timer(cfg.max_iterations)
        profile_dir = os.path.join(self.snapshot_path, "profile")
        metrics = {}

        while iter_num < cfg.max_iterations:
            if self.multi > 1:
                parts = [next(self.data_iter) for _ in range(self.multi)]
                batch = jax.tree.map(lambda *xs: np.stack(xs), *parts)
                if self.multi_device:
                    batch = shard_batch(self.mesh, batch, batch_axis=1)
            else:
                batch = next(self.data_iter)
                if self.multi_device:
                    batch = shard_batch(self.mesh, batch)
            if cfg.profile_steps and iter_num == 10:
                jax.profiler.start_trace(profile_dir)
            rng = jax.random.fold_in(self.base_rng, iter_num)
            self.state, metrics = self.step_fn(
                self.state, batch, rng, self.bundle.aux
            )
            iter_num += self.multi
            if cfg.profile_steps and iter_num == 10 + cfg.profile_steps:
                jax.tree.map(
                    lambda x: x.block_until_ready(), self.state.params
                )
                jax.profiler.stop_trace()
                logging.info("profiler trace written to %s", profile_dir)

            if iter_num % self.image_every == 0:
                self._images(metrics.get("vis"), iter_num)

            if iter_num % self.log_every == 0:
                host_metrics = {
                    k: float(v) for k, v in metrics.items() if k != "vis"
                }
                lr = self._lr(iter_num)
                self._scalar("info/lr", lr, iter_num)
                for k, v in host_metrics.items():
                    self._scalar(f"info/{k}", v, iter_num)
                logging.info(
                    "iteration %d : %s : %.1f ms/it",
                    iter_num,
                    " ".join(f"{k}: {v:f}" for k, v in host_metrics.items()),
                    1e3 * timer.tick() / self.log_every,
                )

            if iter_num > 0 and iter_num % self.val_every == 0:
                performance, mean_hd95 = self.validate(iter_num)
                thresh = self.bundle.dice_snapshot_threshold
                if thresh is not None and performance > thresh:
                    # high-dice snapshot (train_ACDC_scribblevc.py:292-295)
                    save_model_checkpoint(
                        os.path.join(
                            self.snapshot_path,
                            f"{cfg.model}_{str(performance)[0:6]}_model.pth",
                        ),
                        self.state, eval_extra=self.bundle.eval_extra,
                    )
                if performance > best_performance:
                    best_performance = performance
                    save_model_checkpoint(
                        os.path.join(
                            self.snapshot_path,
                            f"iter_{iter_num}_dice_{round(best_performance, 4)}.pth",
                        ),
                        self.state, eval_extra=self.bundle.eval_extra,
                    )
                    save_model_checkpoint(
                        os.path.join(
                            self.snapshot_path, f"{cfg.model}_best_model.pth"
                        ),
                        self.state, eval_extra=self.bundle.eval_extra,
                    )
                logging.info(
                    "iteration %d : mean_dice : %f mean_hd95 : %f",
                    iter_num, performance, mean_hd95,
                )

            if iter_num % self.ckpt_every == 0:
                save_model_checkpoint(
                    os.path.join(self.snapshot_path, f"iter_{iter_num}.pth"),
                    self.state, eval_extra=self.bundle.eval_extra,
                )
                save_train_state(
                    os.path.join(self.snapshot_path, "latest_full.ckpt"),
                    self.state,
                )
                logging.info("save model to %s", self.snapshot_path)

            if self.bundle.host_hook is not None:
                self.state = self.bundle.host_hook(
                    self.bundle, self.state, iter_num
                ) or self.state

        if self.writer is not None:
            self.writer.close()
        return "Training Finished!"
