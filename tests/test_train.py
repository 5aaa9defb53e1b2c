"""End-to-end training tests on the synthetic dataset (CPU)."""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fmc_uia_tpu.config import Config
from fmc_uia_tpu.data.pipeline import build_data_engines
from fmc_uia_tpu.data.synthetic import generate_synthetic_dataset
from fmc_uia_tpu.metrics import average_validation_score, evaluate
from fmc_uia_tpu.models import build_model
from fmc_uia_tpu.models.multitask import init_variables
from fmc_uia_tpu.train import LRScheduler, Trainer
from tests.helpers import TINY_CONFIG

S = 64


def make_cfg(root, **overrides):
    cfg_dict = copy.deepcopy(TINY_CONFIG)
    cfg_dict["data"]["root_path"] = root
    cfg_dict["data"]["batch_size"] = 4
    cfg_dict["data"]["image_size"] = S
    cfg_dict["training"]["steps_per_epoch"] = 8

    def deep_update(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                deep_update(dst[k], v)
            else:
                dst[k] = v

    deep_update(cfg_dict, overrides)
    return Config(config_dict=cfg_dict)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_train")
    generate_synthetic_dataset(str(root), samples_per_task=16, seed=0)
    return str(root)


@pytest.fixture(scope="module")
def trained(synth_root):
    """Train one epoch over all task types; reused by several tests."""
    cfg = make_cfg(synth_root)
    train_engine, val_engine, registry = build_data_engines(cfg)
    model = build_model(cfg, registry)
    variables = init_variables(model, jax.random.PRNGKey(cfg.seed),
                               S, cfg.batch_size)
    trainer = Trainer(cfg, model, registry, variables["params"],
                      jax.random.PRNGKey(cfg.seed))
    logs_by_type = {}
    for batch in train_engine:
        logs = trainer.train_batch(batch, epoch=0)
        logs_by_type.setdefault(batch["task_type"], []).append(
            float(logs["total_loss"]))
    return cfg, registry, model, trainer, val_engine, logs_by_type


def test_losses_finite(trained):
    _, _, _, _, _, logs_by_type = trained
    for t, vals in logs_by_type.items():
        assert all(np.isfinite(v) for v in vals), (t, vals)


def test_step_counter_advances(trained):
    cfg, _, _, trainer, _, logs = trained
    total = sum(len(v) for v in logs.values())
    assert int(trainer.state.step) == total == 8


def test_evaluate_dataframe(trained):
    cfg, registry, model, trainer, val_engine, _ = trained
    mean = cfg.get("data.augmentation.normalize.mean")
    std = cfg.get("data.augmentation.normalize.std")
    df = evaluate(model, trainer.model_params, val_engine, registry, mean, std)
    assert not df.empty
    names = set(df["Task Name"])
    assert names == {"segmentation", "classification", "detection",
                     "Regression"}
    # metric columns present per type
    seg = df[df["Task Name"] == "segmentation"]
    assert seg["Dice"].notna().all()
    cls = df[df["Task Name"] == "classification"]
    assert cls["Accuracy"].notna().all() and cls["F1-Score"].notna().all()
    det = df[df["Task Name"] == "detection"]
    assert det["IoU"].notna().all()
    reg = df[df["Task Name"] == "Regression"]
    assert reg["MAE (pixels)"].notna().all()

    score = average_validation_score(df)
    assert 0.0 <= score <= 1.0


def test_training_reduces_loss(synth_root):
    """Single-task seg training for a few epochs reduces the dice loss."""
    cfg = make_cfg(
        synth_root,
        training={"steps_per_epoch": 10,
                  "single_task": {"enabled": True, "task_id": "T2A_syn_organ",
                                   "task_name": ""},
                  "optimizer": {"learning_rate": 3.0e-3}},
    )
    train_engine, _, registry = build_data_engines(cfg)
    model = build_model(cfg, registry)
    variables = init_variables(model, jax.random.PRNGKey(0), S, cfg.batch_size)
    trainer = Trainer(cfg, model, registry, variables["params"],
                      jax.random.PRNGKey(0))
    losses = []
    for epoch in range(3):
        for batch in train_engine:
            logs = trainer.train_batch(batch, epoch)
            losses.append(float(logs["raw_loss"]))
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert last < first, (first, last)


def test_adaptive_loss_warmup_freezes_log_vars(synth_root):
    cfg = make_cfg(
        synth_root,
        training={"adaptive_loss": {"enabled": True, "init_log_vars": -1.0,
                                     "learning_rate": 1e-2,
                                     "warmup_epochs": 1},
                  "steps_per_epoch": 4},
    )
    train_engine, _, registry = build_data_engines(cfg)
    model = build_model(cfg, registry)
    variables = init_variables(model, jax.random.PRNGKey(0), S, cfg.batch_size)
    trainer = Trainer(cfg, model, registry, variables["params"],
                      jax.random.PRNGKey(0))

    lv0 = {k: float(v) for k, v in trainer.state.params["adaptive"].items()}
    for batch in train_engine:
        trainer.train_batch(batch, epoch=0)  # warmup: frozen
    lv1 = {k: float(v) for k, v in trainer.state.params["adaptive"].items()}
    # During warmup gradient updates are gated; only AdamW's decoupled
    # weight decay drifts the value (exactly like the reference's zeroed
    # grads + optimizer.step(), torch applies wd unconditionally).
    for k in lv0:
        assert abs(lv1[k] - lv0[k]) < 1e-4, (k, lv0[k], lv1[k])

    for epoch in [1, 2]:
        for batch in train_engine:
            trainer.train_batch(batch, epoch=epoch)
    lv2 = {k: float(v) for k, v in trainer.state.params["adaptive"].items()}
    moved = any(abs(lv2[k] - lv1[k]) > 1e-3 for k in lv2)
    assert moved
    snap = trainer.adaptive_snapshot()
    assert set(snap["weights"]) == set(lv2)


def test_frozen_encoder_params_static(synth_root):
    cfg = make_cfg(synth_root,
                   model={"encoder": {"freeze_encoder": True}},
                   training={"steps_per_epoch": 3})
    train_engine, _, registry = build_data_engines(cfg)
    model = build_model(cfg, registry)
    variables = init_variables(model, jax.random.PRNGKey(0), S, cfg.batch_size)
    trainer = Trainer(cfg, model, registry, variables["params"],
                      jax.random.PRNGKey(0))
    enc_before = jax.tree_util.tree_map(
        np.asarray, trainer.state.params["model"]["encoder"])
    for batch in train_engine:
        trainer.train_batch(batch, epoch=0)
    enc_after = trainer.state.params["model"]["encoder"]
    for a, b in zip(jax.tree_util.tree_leaves(enc_before),
                    jax.tree_util.tree_leaves(enc_after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lr_scheduler_cosine():
    cfg = make_cfg("unused_root_path_not_loaded") if False else None
    from tests.helpers import make_tiny_config
    c = make_tiny_config(training={
        "num_epochs": 10,
        "scheduler": {"type": "CosineAnnealingLR", "T_max": 10,
                       "eta_min": 0.0},
        "optimizer": {"learning_rate": 1.0e-3},
    })
    sch = LRScheduler(c)
    assert sch.current_lr() == pytest.approx(1e-3)
    for _ in range(5):
        sch.step()
    assert sch.current_lr() == pytest.approx(
        0.0 + 1e-3 * (1 + np.cos(np.pi * 0.5)) / 2, rel=1e-6)
    for _ in range(5):
        sch.step()
    assert sch.current_lr() == pytest.approx(0.0, abs=1e-9)


def test_lr_scheduler_plateau():
    from tests.helpers import make_tiny_config
    c = make_tiny_config(training={"scheduler": {
        "type": "ReduceLROnPlateau", "mode": "max", "factor": 0.5,
        "patience": 1}})
    sch = LRScheduler(c)
    sch.step(0.5)   # best=0.5
    sch.step(0.4)   # bad=1
    assert sch.current_scale() == 1.0
    sch.step(0.4)   # bad=2 > patience -> reduce
    assert sch.current_scale() == 0.5


def test_detection_head_loss_mismatch_guard(synth_root):
    """Guided config error (reference loss_functions.py:72-79 analogue)."""
    import jax as _jax
    from fmc_uia_tpu.models.multitask import init_variables as _iv
    from fmc_uia_tpu.models import build_model as _bm
    from fmc_uia_tpu.tasks import TaskRegistry as _TR

    cfg = make_cfg(synth_root,
                   training={"loss_configs": {"detection": {"type": "Detection"}}})
    reg = _TR.from_config(cfg)
    model = _bm(cfg, reg)
    v = _iv(model, _jax.random.PRNGKey(0), S, 2)
    with pytest.raises(ValueError, match="head/loss mismatch"):
        Trainer(cfg, model, reg, v["params"], _jax.random.PRNGKey(0))


def test_warm_compile_aot_matches_jit(synth_root):
    """warm_compile's AOT executables must produce the same trajectory as
    the jit path (bench.py's parallel warm-start, VERDICT r2 Weak #4)."""
    cfg = make_cfg(synth_root)
    train_engine, _, registry = build_data_engines(cfg)
    model = build_model(cfg, registry)
    variables = init_variables(model, jax.random.PRNGKey(cfg.seed),
                               S, cfg.batch_size)

    # one example batch per present task type
    examples = {}
    for batch in train_engine:
        examples.setdefault(batch["task_type"], batch)
        if len(examples) == len(registry.present_types()):
            break

    def run(use_aot):
        trainer = Trainer(cfg, model, registry,
                          jax.tree_util.tree_map(jnp.copy,
                                                 variables["params"]),
                          jax.random.PRNGKey(cfg.seed))
        if use_aot:
            times = trainer.warm_compile(examples, parallel=True)
            assert set(times) == set(examples)
            assert len(trainer._compiled) == len(examples)
        losses = []
        for t in sorted(examples):
            logs = trainer.train_batch(examples[t], epoch=0)
            losses.append(float(logs["total_loss"]))
        return losses, int(trainer.state.step)

    jit_losses, jit_step = run(use_aot=False)
    aot_losses, aot_step = run(use_aot=True)
    assert jit_step == aot_step == len(examples)
    np.testing.assert_allclose(aot_losses, jit_losses, rtol=1e-6)
