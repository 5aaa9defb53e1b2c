"""Task-conditioning modules: FiLM, TaskPrompt2D, MoE.

TPU-native redesigns of the reference's conditioning stack:

  * FiLM (reference film_layer.py:7-214): per-task channel-wise gamma/beta on
    the FPN output. The per-task ParameterDict becomes a banked [T, C] table
    gathered by the global task index; the task-embedding variant is an
    Embed -> MLP pair.
  * TaskPrompt2D (reference task_prompt.py:16-143): static multi-hot task
    metadata (task-type one-hot + num_classes tag + task_id tokens) -> linear
    projection -> low-res spatial prompt -> tanh -> bilinear resize -> scaled
    add/mul injection into the input. The metadata table is a compile-time
    constant; selection is a device-side gather.
  * MoEConvBlock (reference moe.py:31-145): per-sample GAP routing (+task
    embedding), top-k renormalized gating, Switch-style load-balance aux
    loss. Experts are DENSE-computed exactly like the reference
    (moe.py:129-132) but batched as one grouped conv via einsum over the
    expert axis — all-expert compute maps onto the MXU instead of a Python
    loop. (Expert-parallel shard_map dispatch is a later optimization; the
    math here is the reference's.)
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from fmc_uia_tpu.models.layers import resize_to


# --------------------------------------------------------------------------
# FiLM
# --------------------------------------------------------------------------
class TaskFiLM(nn.Module):
    """Banked per-task gamma/beta, gathered by global task index.

    gamma init 1, beta init 0 (reference film_layer.py:121-131); applied as
    gamma * x + beta over channels (film_layer.py:94-98).
    """

    num_tasks: int
    num_features: int
    use_affine: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, task_index: jax.Array) -> jax.Array:
        gammas = self.param(
            "gammas", nn.initializers.ones,
            (self.num_tasks, self.num_features), jnp.float32,
        )
        gamma = jnp.take(gammas, task_index, axis=0).astype(x.dtype)
        out = x * gamma[None, None, None, :]
        if self.use_affine:
            betas = self.param(
                "betas", nn.initializers.zeros,
                (self.num_tasks, self.num_features), jnp.float32,
            )
            beta = jnp.take(betas, task_index, axis=0).astype(x.dtype)
            out = out + beta[None, None, None, :]
        return out


class TaskEmbeddingFiLM(nn.Module):
    """Task embedding -> MLP -> gamma/beta (reference film_layer.py:151-214)."""

    num_tasks: int
    num_features: int
    embedding_dim: int = 64
    use_affine: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, task_index: jax.Array) -> jax.Array:
        emb_table = self.param(
            "embedding", nn.initializers.normal(1.0),
            (self.num_tasks, self.embedding_dim), jnp.float32,
        )
        emb = jnp.take(emb_table, task_index, axis=0)

        def mlp(h, name):
            h = nn.Dense(self.num_features, name=f"{name}_fc1")(h)
            h = nn.relu(h)
            return nn.Dense(self.num_features, name=f"{name}_fc2")(h)

        gamma = mlp(emb, "gamma").astype(x.dtype)
        out = x * gamma[None, None, None, :]
        if self.use_affine:
            beta = mlp(emb, "beta").astype(x.dtype)
            out = out + beta[None, None, None, :]
        return out


class MultiFiLM(nn.Module):
    """Per-stage FiLM over a multi-scale feature list — deep task
    conditioning across encoder stages (reference film_layer.py:217-282
    ``MultiFiLMLayer``; unused by the reference model but part of its
    public surface).

    One banked (or embedding-MLP) gamma/beta generator per stage; stages
    may have different channel widths.
    """

    num_tasks: int
    feature_channels: tuple  # per-stage channel widths, e.g. (96,192,384,768)
    use_affine: bool = True
    use_embedding: bool = False
    embedding_dim: int = 64

    @nn.compact
    def __call__(self, features, task_index: jax.Array):
        if len(features) != len(self.feature_channels):
            raise ValueError(
                f"MultiFiLM configured for {len(self.feature_channels)} "
                f"stages, got {len(features)} features")
        out = []
        for i, (feat, ch) in enumerate(zip(features,
                                           self.feature_channels)):
            cls = TaskEmbeddingFiLM if self.use_embedding else TaskFiLM
            kwargs = dict(num_tasks=self.num_tasks, num_features=ch,
                          use_affine=self.use_affine)
            if self.use_embedding:
                kwargs["embedding_dim"] = self.embedding_dim
            out.append(cls(name=f"stage{i}", **kwargs)(feat, task_index))
        return out


def build_film(config, num_tasks: int, num_features: int) -> Optional[nn.Module]:
    """FiLM factory (reference multitask_model.py:50-79)."""
    if not config.get("model.use_film", False):
        return None
    film_cfg = config.get("model.film", {}) or {}
    use_affine = bool(film_cfg.get("use_affine", True))
    if film_cfg.get("use_task_embedding", False):
        return TaskEmbeddingFiLM(
            num_tasks=num_tasks, num_features=num_features,
            embedding_dim=int(film_cfg.get("embedding_dim", 64)),
            use_affine=use_affine,
        )
    return TaskFiLM(num_tasks=num_tasks, num_features=num_features,
                    use_affine=use_affine)


# --------------------------------------------------------------------------
# TaskPrompt2D
# --------------------------------------------------------------------------
_TASK_PREFIX_RE = re.compile(r"^t\d+[a-z]?$", re.IGNORECASE)


def _tokenize_task_id(task_id: str) -> List[str]:
    """Split task_id on '_' and drop the Tn[a-z] challenge prefix
    (reference task_prompt.py:16-24)."""
    parts = [p.strip().lower() for p in str(task_id).split("_") if p.strip()]
    return [p for p in parts if not _TASK_PREFIX_RE.match(p)]


def build_task_prompt_metadata(
    task_configs: Sequence[Dict],
) -> Tuple[np.ndarray, Dict[str, int], Dict[str, List[str]]]:
    """Multi-hot [num_tasks, D] metadata table (reference task_prompt.py:27-71):
    task-type one-hot + num_classes tag one-hot + task_id token multi-hot."""
    task_ids = [str(c["task_id"]) for c in task_configs]
    names = [str(c.get("task_name", "unknown")).lower() for c in task_configs]
    class_tags = [f"num_classes_{int(c.get('num_classes', -1))}"
                  for c in task_configs]

    type_vocab = sorted(set(names))
    class_vocab = sorted(set(class_tags))
    token_sets = [_tokenize_task_id(t) for t in task_ids]
    token_vocab = sorted({tok for toks in token_sets for tok in toks})

    type_to_i = {v: i for i, v in enumerate(type_vocab)}
    class_to_i = {v: i for i, v in enumerate(class_vocab)}
    token_to_i = {v: i for i, v in enumerate(token_vocab)}

    D = len(type_vocab) + len(class_vocab) + len(token_vocab)
    table = np.zeros((len(task_ids), D), np.float32)
    for row, (name, ctag, toks) in enumerate(zip(names, class_tags, token_sets)):
        table[row, type_to_i[name]] = 1.0
        table[row, len(type_vocab) + class_to_i[ctag]] = 1.0
        for tok in toks:
            table[row, len(type_vocab) + len(class_vocab) + token_to_i[tok]] = 1.0

    vocab_info = {
        "task_types": type_vocab,
        "num_classes_tags": class_vocab,
        "task_tokens": token_vocab,
    }
    return table, {t: i for i, t in enumerate(task_ids)}, vocab_info


class TaskPrompt2D(nn.Module):
    """Metadata -> linear -> low-res prompt -> tanh -> resize -> inject."""

    metadata_table: np.ndarray  # static [num_tasks, D]
    out_channels: int = 1
    prompt_size: int = 32
    inject_mode: str = "add"  # 'add' | 'mul'
    init_scale: float = 0.1
    use_tanh: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, task_index: jax.Array) -> jax.Array:
        table = jnp.asarray(self.metadata_table)
        vec = jnp.take(table, task_index, axis=0)  # [D]
        proj = nn.Dense(
            self.out_channels * self.prompt_size * self.prompt_size,
            name="prompt_proj",
        )(vec)
        prompt = proj.reshape(1, self.prompt_size, self.prompt_size,
                              self.out_channels)
        if self.use_tanh:
            prompt = jnp.tanh(prompt)
        prompt = resize_to(prompt, x.shape[1], x.shape[2], method="bilinear")
        scale = self.param("prompt_scale",
                           nn.initializers.constant(self.init_scale),
                           (), jnp.float32)
        prompt = (scale * prompt).astype(x.dtype)
        if self.inject_mode == "add":
            return x + prompt
        return x * (1.0 + prompt)


def build_task_prompt(config, task_configs) -> Optional[TaskPrompt2D]:
    cfg = config.get("model.task_prompt", {}) or {}
    if not cfg.get("enabled", False):
        return None
    table, _, _ = build_task_prompt_metadata(task_configs)
    mode = str(cfg.get("inject_mode", "add")).lower()
    if mode not in ("add", "mul"):
        raise ValueError(f"Unsupported inject_mode: {mode}")
    return TaskPrompt2D(
        metadata_table=table,
        out_channels=int(cfg.get("channels", 1)),
        prompt_size=int(cfg.get("prompt_size", 32)),
        inject_mode=mode,
        init_scale=float(cfg.get("init_scale", 0.1)),
        use_tanh=bool(cfg.get("use_tanh", True)),
    )


# --------------------------------------------------------------------------
# MoE
# --------------------------------------------------------------------------
class _ConvKernel(nn.Module):
    """Declare an nn.Conv-compatible bias-free kernel WITHOUT applying it —
    the ragged-dispatch MoE path slices per-expert weights out of the same
    grouped-kernel layouts the dense path's nn.Conv modules create, so the
    param tree (and any checkpoint) is identical across dispatch modes."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


def pick_dispatch_mode(num_experts: int, top_k: int, ep_mesh,
                       ep_axis: str) -> str:
    """Resolve ``model.moe.dispatch: auto`` to an execution mode.

    Ragged dispatch pays one ``all_to_all`` each way plus gather/scatter
    overhead but computes only routed tokens (~top_k/E of dense compute);
    dense computes all E experts on every sample with zero collectives.
    Dense wins while the E-fold redundant compute is cheaper than the
    dispatch overhead — measured true through E≈16 conv experts
    (SCALING.md). Ragged additionally requires the experts to actually be
    distributed (an EP mesh with >1 device on the axis, E divisible by the
    axis size)."""
    if ep_mesh is None or ep_axis not in getattr(ep_mesh, "axis_names", ()):
        return "dense"
    axis_size = int(ep_mesh.shape[ep_axis])
    if axis_size <= 1 or num_experts % axis_size:
        return "dense"
    if num_experts >= max(32, 8 * max(1, top_k)):
        return "ragged"
    return "dense"


class MoEConvBlock(nn.Module):
    """Mixture of conv experts with per-sample routing.

    Math parity with reference moe.py:31-137; compute restructured for MXU:
    all experts' 1x1/3x3/1x1 bottlenecks are evaluated with an extra expert
    axis folded into the channel dim of a single conv (grouped weights), then
    combined by the routing weights — one big batched contraction instead of
    E sequential convs.

    Returns (output, aux_loss, stats) — JAX is functional, so the aux loss
    and importance/load stats are explicit outputs rather than module state
    (reference stores them on self, moe.py:123-127).
    """

    num_experts: int = 4
    expert_hidden: Optional[int] = None
    router_hidden: Optional[int] = None
    top_k: int = 1
    use_task_embedding: bool = False
    task_embedding_dim: int = 32
    num_tasks: int = 0
    use_residual: bool = True
    dropout: float = 0.0
    # Execution mode. 'dense' = all experts on all samples, combined by the
    # gates (reference moe.py:129-132 semantics; right at 4-16 conv
    # experts). 'ragged' = GShard-style capacity-based all_to_all token
    # dispatch over ``ep_axis`` of ``ep_mesh`` (parallel/expert.py) — each
    # device hosts E/D experts and computes only its routed samples; pays
    # off at large E where dense compute is E-fold redundant.
    dispatch_mode: str = "dense"
    ep_mesh: Optional[object] = None  # jax.sharding.Mesh (hashable)
    ep_axis: str = "model"
    capacity_factor: float = 2.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, task_index: Optional[jax.Array] = None,
                 train: bool = False):
        B, H, W, C = x.shape
        E = self.num_experts
        hidden = self.expert_hidden or max(8, C // 2)

        pooled = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # [B, C]
        router_in = pooled
        if self.use_task_embedding:
            if task_index is None:
                raise ValueError("task_index required when use_task_embedding")
            emb_table = self.param(
                "task_embed", nn.initializers.normal(1.0),
                (self.num_tasks, self.task_embedding_dim), jnp.float32,
            )
            emb = jnp.take(emb_table, task_index, axis=0)
            router_in = jnp.concatenate(
                [pooled, jnp.broadcast_to(emb, (B, self.task_embedding_dim))],
                axis=1,
            )

        rh = self.router_hidden or max(16, router_in.shape[-1] // 2)
        r = nn.Dense(rh, name="router_fc1")(router_in)
        r = nn.relu(r)
        logits = nn.Dense(E, name="router_fc2")(r)  # [B, E]
        probs = jax.nn.softmax(logits, axis=1)
        raw_probs = probs

        if self.top_k < E:
            topk_vals, topk_idx = jax.lax.top_k(probs, self.top_k)
            dispatch = jnp.sum(
                jax.nn.one_hot(topk_idx, E, dtype=probs.dtype), axis=1
            )  # [B, E] 0/1
            masked = probs * dispatch
            probs = masked / (jnp.sum(masked, axis=1, keepdims=True) + 1e-9)
        else:
            dispatch = jnp.ones_like(probs)

        importance = jnp.mean(probs, axis=0)  # [E]
        load = jnp.mean(dispatch, axis=0)  # [E]
        aux_loss = E * jnp.sum(importance * load)

        if self.dispatch_mode == "ragged":
            out = self._ragged_experts(x, raw_probs, hidden, train)
        else:
            # Dense all-expert bottleneck, expert axis batched into channels:
            #   in: [B,H,W,C] -> [B,H,W,E*hidden] (1x1) -> depth-sep 3x3 per
            #   expert via feature_group_count=E -> [B,H,W,E*C] (1x1 grouped).
            h = nn.Conv(E * hidden, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expert_in")(x.astype(self.dtype))
            h = nn.relu(h)
            h = nn.Conv(E * hidden, (3, 3), use_bias=False, dtype=self.dtype,
                        feature_group_count=E, name="expert_mid")(h)
            h = nn.relu(h)
            if self.dropout > 0:
                h = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                               deterministic=not train)(h)
            h = nn.Conv(E * C, (1, 1), use_bias=False, dtype=self.dtype,
                        feature_group_count=E, name="expert_out")(h)
            h = h.reshape(B, H, W, E, C)
            out = jnp.einsum("bhwec,be->bhwc", h, probs.astype(h.dtype))

        if self.use_residual:
            out = out + x
        return out, aux_loss, {"importance": importance, "load": load}

    def _ragged_experts(self, x: jax.Array, raw_probs: jax.Array,
                        hidden: int, train: bool) -> jax.Array:
        """GShard-style expert-parallel execution: per-sample all_to_all
        dispatch to the device owning each expert (parallel/expert.py).

        Declares the SAME grouped-kernel params as the dense path (see
        _ConvKernel) and slices them per-expert, so dispatch mode is a pure
        execution choice — checkpoints and numerics (at zero-drop capacity)
        are identical to dense. Dropout is applied to the combined expert
        output rather than inside each expert (rng threading through
        shard_map is not worth it for a spatial-broadcast dropout).
        """
        from fmc_uia_tpu.parallel.expert import ragged_moe_apply

        B, Hh, Ww, C = x.shape
        E = self.num_experts
        mesh = self.ep_mesh
        if mesh is None or self.ep_axis not in mesh.axis_names:
            raise ValueError(
                "MoEConvBlock(dispatch_mode='ragged') needs ep_mesh with "
                f"axis {self.ep_axis!r} (got mesh={mesh})")

        w_in = _ConvKernel((1, 1, C, E * hidden), name="expert_in")()
        w_mid = _ConvKernel((3, 3, hidden, E * hidden), name="expert_mid")()
        w_out = _ConvKernel((1, 1, hidden, E * C), name="expert_out")()
        # grouped-kernel layouts -> leading expert axis (group-major
        # output channels: expert e owns out channels e*g:(e+1)*g)
        params = {
            "w_in": jnp.moveaxis(
                w_in.reshape(1, 1, C, E, hidden), 3, 0),
            "w_mid": jnp.moveaxis(
                w_mid.reshape(3, 3, hidden, E, hidden), 3, 0),
            "w_out": jnp.moveaxis(
                w_out.reshape(1, 1, hidden, E, C), 3, 0),
        }
        params = jax.tree_util.tree_map(
            lambda w: w.astype(self.dtype), params)
        dn = ("NHWC", "HWIO", "NHWC")

        def expert_fn(p, tokens):
            h = jax.lax.conv_general_dilated(
                tokens, p["w_in"], (1, 1), "VALID", dimension_numbers=dn)
            h = nn.relu(h)
            h = jax.lax.conv_general_dilated(
                h, p["w_mid"], (1, 1), "SAME", dimension_numbers=dn)
            h = nn.relu(h)
            return jax.lax.conv_general_dilated(
                h, p["w_out"], (1, 1), "VALID", dimension_numbers=dn)

        out = ragged_moe_apply(
            expert_fn, params, x.astype(self.dtype),
            raw_probs.astype(jnp.float32), mesh, axis=self.ep_axis,
            top_k=self.top_k, capacity_factor=self.capacity_factor)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, broadcast_dims=(1, 2),
                             deterministic=not train)(out)
        return out
