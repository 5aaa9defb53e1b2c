"""Multi-task model orchestration.

The TPU counterpart of the reference's MultiTaskModel
(reference multitask_model.py:13-343): shared encoder -> optional MoE ->
per-task-type FPN decoder -> optional FiLM -> per-subtask head.

Key structural differences (all deliberate, see package docstring):
  * ``__call__(images, task_type, task_index, train)`` — task_type is a
    STATIC string selecting one of 4 traced programs; task_index is a
    DEVICE integer selecting the subtask inside banked heads / FiLM /
    prompts. The reference instead dispatches per-subtask modules in Python
    (multitask_model.py:176-250), which would force 27 compilations.
  * MoE aux loss and importance/load stats are emitted through flax's
    ``intermediates`` collection (functional; the reference stashes them on
    module attributes, moe.py:123-127).
  * Encoder freezing is an optimizer-mask concern (see train.py), not a
    requires_grad mutation (reference multitask_model.py:333-343).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fmc_uia_tpu.models.conditioning import (
    MoEConvBlock,
    build_film,
    build_task_prompt,
)
from fmc_uia_tpu.models.decoders import build_decoders
from fmc_uia_tpu.models.encoders import build_encoder
from fmc_uia_tpu.models.heads import build_head_banks
from fmc_uia_tpu.tasks import (
    CLASSIFICATION,
    DETECTION,
    REGRESSION,
    SEGMENTATION,
    TASK_TYPES,
    TaskRegistry,
)


class MultiTaskModel(nn.Module):
    """Shared-encoder multi-task model over a static task universe.

    Attributes:
      config: the Config object (treated as static module metadata).
      registry: TaskRegistry defining the task universe.
      dtype: compute dtype (bfloat16 for TPU mixed precision).
    """

    config: Any
    registry: TaskRegistry
    dtype: Any = jnp.float32
    ep_mesh: Any = None  # jax.sharding.Mesh for ragged-EP MoE (optional)

    def setup(self):
        cfg = self.config
        self.encoder = build_encoder(cfg, dtype=self.dtype)

        alias, modules = build_decoders(cfg, dtype=self.dtype)
        self.decoder_alias = alias
        # register as attributes so flax tracks parameters
        self.fpn_seg = modules["fpn_seg"]
        self.fpn_det = modules.get("fpn_det")
        self.fpn_cls = modules.get("fpn_cls")
        self.fpn_reg = modules.get("fpn_reg")

        self.use_fpn_for_cls = bool(
            cfg.get("model.decoder.use_fpn_for_classification", True))
        self.use_fpn_for_reg = bool(
            cfg.get("model.decoder.use_fpn_for_regression", True))
        self.fpn_out_channels = self.fpn_seg.out_channels

        self.film = build_film(cfg, len(self.registry), self.fpn_out_channels)

        # deep multi-stage conditioning over encoder features
        # (reference MultiFiLMLayer, film_layer.py:217-282; opt-in via
        # model.film.multi_stage — the reference model never wires it)
        film_cfg = cfg.get("model.film", {}) or {}
        self.multi_film = None
        if cfg.get("model.use_film", False) and film_cfg.get(
                "multi_stage", False):
            from fmc_uia_tpu.models.conditioning import MultiFiLM

            self.multi_film = MultiFiLM(
                num_tasks=len(self.registry),
                feature_channels=tuple(self.encoder.out_channels),
                use_affine=bool(film_cfg.get("use_affine", True)),
                use_embedding=bool(film_cfg.get("use_task_embedding",
                                                False)),
                embedding_dim=int(film_cfg.get("embedding_dim", 64)),
            )

        task_configs = self.registry.to_task_configs()
        prompt_cfg = cfg.get("model.task_prompt", {}) or {}
        self.task_prompt = build_task_prompt(cfg, task_configs)
        apply_names = prompt_cfg.get("apply_to_task_names")
        self.prompt_apply_names = (
            None if apply_names is None
            else tuple(str(n).lower() for n in apply_names)
        )

        moe_cfg = cfg.get("model.moe", {}) or {}
        self.use_moe = bool(moe_cfg.get("enabled", False))
        self.moe_stage_indices = tuple(
            moe_cfg.get("stage_indices") or range(4))
        if self.use_moe:
            enc_channels = self.encoder.out_channels
            expert_hidden = moe_cfg.get("expert_hidden")
            router_hidden = moe_cfg.get("router_hidden")
            self.moe_blocks = {
                str(i): MoEConvBlock(
                    num_experts=int(moe_cfg.get("num_experts", 4)),
                    expert_hidden=int(expert_hidden) if expert_hidden else None,
                    router_hidden=int(router_hidden) if router_hidden else None,
                    top_k=int(moe_cfg.get("top_k", 1)),
                    use_task_embedding=bool(
                        moe_cfg.get("use_task_embedding", True)),
                    task_embedding_dim=int(
                        moe_cfg.get("task_embedding_dim", 32)),
                    num_tasks=len(self.registry),
                    use_residual=bool(moe_cfg.get("use_residual", True)),
                    dropout=float(moe_cfg.get("dropout", 0.0)),
                    dispatch_mode=self._resolve_dispatch(moe_cfg),
                    ep_mesh=self.ep_mesh,
                    ep_axis=str(moe_cfg.get("ep_axis", "model")),
                    capacity_factor=float(
                        moe_cfg.get("capacity_factor", 2.0)),
                    dtype=self.dtype,
                    name=f"moe_stage{i}",
                )
                for i in self.moe_stage_indices
                if 0 <= i < len(enc_channels)
            }
        else:
            self.moe_blocks = {}

        self.head_banks = build_head_banks(cfg, self.registry, dtype=self.dtype)

        # static lookup tables (constants under jit)
        self.local_index_np = self.registry.local_index_table
        self.num_classes_np = self.registry.num_classes_table

    # -- helpers -----------------------------------------------------------
    def _resolve_dispatch(self, moe_cfg) -> str:
        """``model.moe.dispatch``: 'dense' | 'ragged' | 'auto' (pick from
        expert count / EP-mesh shape at build time, conditioning.py
        pick_dispatch_mode)."""
        from fmc_uia_tpu.models.conditioning import pick_dispatch_mode

        mode = str(moe_cfg.get("dispatch", "dense"))
        if mode != "auto":
            return mode
        return pick_dispatch_mode(
            int(moe_cfg.get("num_experts", 4)),
            int(moe_cfg.get("top_k", 1)),
            self.ep_mesh, str(moe_cfg.get("ep_axis", "model")))

    def _decoder_for(self, task_type: str):
        name = self.decoder_alias[task_type]
        return {
            "fpn_seg": self.fpn_seg,
            "fpn_det": self.fpn_det,
            "fpn_cls": self.fpn_cls,
            "fpn_reg": self.fpn_reg,
        }[name]

    def _apply_moe(self, features, task_index, train):
        if not self.use_moe:
            return features
        out = list(features)
        for i_str, block in self.moe_blocks.items():
            i = int(i_str)
            y, aux, stats = block(out[i], task_index, train=train)
            out[i] = y
            self.sow("intermediates", "moe_aux", aux)
            self.sow("intermediates", "moe_importance", stats["importance"])
            self.sow("intermediates", "moe_load", stats["load"])
        return out

    def __call__(
        self,
        images: jax.Array,
        task_type: str,
        task_index: jax.Array,
        train: bool = False,
    ):
        """Forward one single-task batch.

        Args:
          images: [B, H, W, 3] normalized float input (NHWC).
          task_type: STATIC task-type string (one of TASK_TYPES).
          task_index: device scalar int32 — global task index.
          train: static train/eval flag (dropout, etc.).

        Returns:
          segmentation: [B, H, W, Cmax] logits (or (main, [aux...]) with
            deep supervision); classification: [B, Cmax] logits; detection:
            CenterNet dict or [B, h, w, 5] grid map; Regression:
            [B, 2*Pmax] coords in [0, 1].
        """
        if task_type not in TASK_TYPES:
            raise ValueError(f"Unknown task_type: {task_type}")
        task_index = jnp.asarray(task_index, jnp.int32)
        local_idx = jnp.take(
            jnp.asarray(self.local_index_np), task_index, axis=0)

        x = images.astype(self.dtype)

        if self.task_prompt is not None and (
            self.prompt_apply_names is None
            or task_type.lower() in self.prompt_apply_names
        ):
            x = self.task_prompt(x, task_index)

        features = self.encoder(x, train=train)
        features = self._apply_moe(features, task_index, train)
        if self.multi_film is not None:
            features = self.multi_film(features, task_index)

        head = self.head_banks[task_type]

        needs_fpn = (
            task_type in (SEGMENTATION, DETECTION)
            or (task_type == CLASSIFICATION and self.use_fpn_for_cls)
            or (task_type == REGRESSION and self.use_fpn_for_reg)
        )
        if needs_fpn:
            fpn_features = self._decoder_for(task_type)(features, train=train)
            if self.film is not None:
                fpn_features = self.film(fpn_features, task_index)
            return head(fpn_features, local_idx, train=train)

        # cls/reg directly on last encoder feature
        return head(features[-1], local_idx, train=train)

    def init_all(self, images: jax.Array):
        """Initialization entry point touching every task-type branch.

        linen creates parameters lazily on first use; a single-task trace
        would leave the other head banks uninitialized. Use as:
        ``model.init(key, x, method=MultiTaskModel.init_all)``.
        """
        outs = {}
        for t in self.registry.present_types():
            gidx = self.registry.of_type(t)[0].global_index
            outs[t] = self(images, t, jnp.int32(gidx), train=False)
        return outs


def init_variables(model: "MultiTaskModel", key, image_size: int,
                   batch_size: int = 1):
    """Initialize all model variables with a dummy batch."""
    x = jnp.zeros((batch_size, image_size, image_size, 3), jnp.float32)
    return model.init(key, x, method=MultiTaskModel.init_all)


def build_model(config, registry: Optional[TaskRegistry] = None,
                dtype=None, mesh=None) -> MultiTaskModel:
    """Model factory (reference multitask_model.py:346-362).

    Encoder freezing (model.encoder.freeze_encoder) is honoured in the
    optimizer construction (train.build_optimizer), not here.

    ``mesh`` is only needed for mesh-coupled execution modes (currently
    ``model.moe.dispatch: ragged`` — GShard all_to_all expert parallelism);
    the default dense modes are mesh-free and shard purely via pjit specs.
    """
    if registry is None:
        registry = TaskRegistry.from_config(config)
    if dtype is None:
        dtype = jnp.bfloat16 if config.mixed_precision else jnp.float32
    return MultiTaskModel(config=config, registry=registry, dtype=dtype,
                          ep_mesh=mesh)
