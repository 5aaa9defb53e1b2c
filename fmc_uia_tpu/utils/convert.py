"""Pretrained-weight conversion: torch/timm checkpoints -> flax params.

The reference gets pretrained encoders for free from timm
(reference encoders.py:53-59, 179-185, 528-534). In this zero-egress
environment weights cannot be downloaded, so conversion is offline: point
``convert_*`` at a local ``.pth``/``.bin`` state_dict (torch CPU load) and it
returns a params pytree matching our from-scratch encoders.

Covered mappings:
  * timm Swin v1 (``swin_{t,s,b,l}_patch4_window7_224``) -> SwinEncoder
  * timm ViT (``vit_*_patch16_224``; DINOv2/v3-style plain ViTs) -> ViTBackbone
  * torchvision ResNet-50 -> ResNetEncoder (GN stats are re-initialized;
    BN affine folds into GN scale/bias)

Tensor layout rules: torch Linear [out, in] -> [in, out]; torch Conv
[out, in, kh, kw] -> HWIO [kh, kw, in, out]; LayerNorm weight/bias ->
scale/bias.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into numpy arrays (CPU)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and "model" in obj and isinstance(
            obj["model"], dict):
        obj = obj["model"]
    return {k: np.asarray(v.detach().cpu().numpy()) if hasattr(v, "detach")
            else np.asarray(v) for k, v in obj.items()}


def _linear(sd, key):
    return {"kernel": sd[f"{key}.weight"].T.astype(np.float32),
            "bias": sd[f"{key}.bias"].astype(np.float32)}


def _linear_nobias(sd, key):
    return {"kernel": sd[f"{key}.weight"].T.astype(np.float32)}


def _conv(sd, key, bias=True):
    out = {"kernel": sd[f"{key}.weight"].transpose(2, 3, 1, 0)
           .astype(np.float32)}
    if bias and f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"].astype(np.float32)
    return out


def _norm(sd, key):
    return {"scale": sd[f"{key}.weight"].astype(np.float32),
            "bias": sd[f"{key}.bias"].astype(np.float32)}


def interpolate_rel_pos_bias(table: np.ndarray,
                             target_window: int) -> np.ndarray:
    """Bicubic-resample a relative-position-bias table between window sizes.

    table: [(2*ws-1)^2, H] for source window ws -> [(2*tw-1)^2, H].
    Standard practice when fine-tuning Swin at a different window size.
    """
    src_side = int(np.sqrt(table.shape[0]))
    tgt_side = 2 * target_window - 1
    if src_side == tgt_side:
        return table
    import jax

    grid = table.reshape(src_side, src_side, -1)
    out = jax.image.resize(grid, (tgt_side, tgt_side, grid.shape[-1]),
                           method="cubic")
    return np.asarray(out).reshape(tgt_side * tgt_side, -1).astype(
        np.float32)


def _swin_block_params(sd, base: str,
                       target_window: Optional[int] = None) -> Dict:
    bias = sd[f"{base}.attn.relative_position_bias_table"].astype(np.float32)
    if target_window is not None:
        bias = interpolate_rel_pos_bias(bias, target_window)
    return {
        "norm1": _norm(sd, f"{base}.norm1"),
        "attn": {
            "qkv": _linear(sd, f"{base}.attn.qkv"),
            "proj": _linear(sd, f"{base}.attn.proj"),
            "rel_pos_bias": bias,
        },
        "norm2": _norm(sd, f"{base}.norm2"),
        "mlp_fc1": _linear(sd, f"{base}.mlp.fc1"),
        "mlp_fc2": _linear(sd, f"{base}.mlp.fc2"),
    }


def _stack_trees(trees):
    """Stack a list of identical pytrees along a new leading axis."""
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *trees)


# Patch-merging 2x2 neighborhood concat order differs between timm and our
# encoder: timm flattens (w, h)-major -> chunks [(h0,w0),(h1,w0),(h0,w1),
# (h1,w1)] (swin_transformer.py PatchMerging permute(0,1,3,4,2,5)); ours is
# (h, w)-major -> [(h0,w0),(h0,w1),(h1,w0),(h1,w1)]. Chunks 1 and 2 swap.
_MERGE_CHUNK_PERM = (0, 2, 1, 3)


def _permute_merge_chunks(arr: np.ndarray, axis: int = 0) -> np.ndarray:
    """Reorder an array's 4C axis from timm chunk order to ours."""
    chunks = np.split(arr, 4, axis=axis)
    return np.concatenate([chunks[i] for i in _MERGE_CHUNK_PERM], axis=axis)


def _merge_params(sd, base: str) -> Dict:
    """Convert one timm PatchMerging (norm over 4C + reduction 4C->2C)."""
    norm = _norm(sd, f"{base}.norm")
    red = _linear_nobias(sd, f"{base}.reduction")
    return {
        "norm": {"scale": _permute_merge_chunks(norm["scale"]),
                 "bias": _permute_merge_chunks(norm["bias"])},
        "reduction": {"kernel": _permute_merge_chunks(red["kernel"],
                                                      axis=0)},
    }


def convert_swin(sd: Dict[str, np.ndarray],
                 depths: Sequence[int] = (2, 2, 18, 2),
                 scan_blocks: bool = True,
                 target_window: Optional[int] = None) -> Dict:
    """timm Swin v1 state_dict -> SwinEncoder params pytree.

    ``scan_blocks=True`` emits the scanned layout: per-stage pair params
    stacked on a leading [depth//2] axis under ``stage{s}_scan`` with
    ``block0`` (W-MSA) / ``block1`` (SW-MSA) children. ``target_window``
    resamples the relative-position-bias tables for a different window size.
    """
    params: Dict = {}
    params["patch_embed"] = _conv(sd, "patch_embed.proj")
    params["patch_norm"] = _norm(sd, "patch_embed.norm")

    def block(stage, b):
        return _swin_block_params(sd, f"layers.{stage}.blocks.{b}",
                                  target_window)

    # downsample layout: original Microsoft / old-timm keeps PatchMerging at
    # the END of the PREVIOUS stage (so layers.0.downsample exists); modern
    # timm (>=0.9) puts it at the START of the stage it feeds (so stage 0
    # has none). Detect once from layers.0.
    old_layout = "layers.0.downsample.reduction.weight" in sd

    for stage, depth in enumerate(depths):
        if stage > 0:
            ds = (f"layers.{stage - 1}.downsample" if old_layout
                  else f"layers.{stage}.downsample")
            params[f"merge{stage}"] = _merge_params(sd, ds)
        if scan_blocks and depth % 2 == 0 and depth > 0:
            even = [block(stage, b) for b in range(0, depth, 2)]
            odd = [block(stage, b) for b in range(1, depth, 2)]
            params[f"stage{stage}_scan"] = {
                "block0": _stack_trees(even),
                "block1": _stack_trees(odd),
            }
        else:
            for b in range(depth):
                params[f"stage{stage}_block{b}"] = block(stage, b)
    return params


def interpolate_pos_embed(grid_pos: np.ndarray,
                          target_grid: int) -> np.ndarray:
    """Bicubic-resample a [1, g*g, C] patch pos-embed to a new grid side."""
    g = int(np.sqrt(grid_pos.shape[1]))
    if g == target_grid:
        return grid_pos
    import jax

    grid = grid_pos.reshape(g, g, -1)
    out = jax.image.resize(grid, (target_grid, target_grid, grid.shape[-1]),
                           method="cubic")
    return np.asarray(out).reshape(
        1, target_grid * target_grid, -1).astype(np.float32)


def convert_vit(sd: Dict[str, np.ndarray], depth: int = 12,
                prefix: str = "", keep_prefix_tokens: bool = True,
                target_grid: Optional[int] = None) -> Dict:
    """timm plain-ViT state_dict -> ViTBackbone params pytree.

    ``keep_prefix_tokens``: map cls (+register) tokens into the backbone's
    ``prefix_tokens`` param (numerically faithful to timm); when False they
    and their pos-embed rows are dropped (patch-tokens-only backbone).
    ``target_grid``: resample the patch pos-embed grid to this side length.
    """
    g = lambda k: sd[prefix + k]  # noqa: E731

    def has(k):
        return (prefix + k) in sd

    params: Dict = {}
    params["patch_embed"] = {
        "kernel": g("patch_embed.proj.weight").transpose(2, 3, 1, 0)
        .astype(np.float32),
        "bias": g("patch_embed.proj.bias").astype(np.float32),
    }
    pos = g("pos_embed").astype(np.float32)
    n_rows = pos.shape[1]
    side = int(np.sqrt(n_rows))
    n_prefix = 0 if side * side == n_rows else n_rows - side * side
    prefix_pos, grid_pos = pos[:, :n_prefix, :], pos[:, n_prefix:, :]
    if target_grid is not None:
        grid_pos = interpolate_pos_embed(grid_pos, target_grid)

    tokens = []
    if keep_prefix_tokens:
        if has("cls_token"):
            tokens.append(g("cls_token").astype(np.float32))
        for key in ("reg_token", "register_tokens", "storage_tokens"):
            if has(key):
                tokens.append(g(key).astype(np.float32))
    if tokens:
        prefix_tokens = np.concatenate(tokens, axis=1)
        P = prefix_tokens.shape[1]
        if n_prefix < P:  # registers often have no pos-embed rows (timm
            # adds none when pos_embed excludes them): zero-pad
            prefix_pos = np.concatenate(
                [prefix_pos,
                 np.zeros((1, P - n_prefix, pos.shape[-1]), np.float32)],
                axis=1)
        params["prefix_tokens"] = prefix_tokens
        params["pos_embed"] = np.concatenate([prefix_pos, grid_pos], axis=1)
    else:
        params["pos_embed"] = grid_pos

    for i in range(depth):
        base = f"blocks.{i}"
        params[f"block{i}"] = {
            "norm1": _norm(sd, f"{prefix}{base}.norm1"),
            "qkv": _linear(sd, f"{prefix}{base}.attn.qkv"),
            "proj": _linear(sd, f"{prefix}{base}.attn.proj"),
            "norm2": _norm(sd, f"{prefix}{base}.norm2"),
            "mlp_fc1": _linear(sd, f"{prefix}{base}.mlp.fc1"),
            "mlp_fc2": _linear(sd, f"{prefix}{base}.mlp.fc2"),
        }
    return params


def convert_resnet50(sd: Dict[str, np.ndarray],
                     stage_sizes: Sequence[int] = (3, 4, 6, 3)) -> Dict:
    """torchvision ResNet-50 -> ResNetEncoder params.

    BatchNorm affine params fold into GroupNorm scale/bias; BN running
    statistics are dropped (GN normalizes per sample), so expect a brief
    adaptation phase when fine-tuning — the conv weights carry the value.
    """
    params: Dict = {"stem_conv": _conv(sd, "conv1", bias=False),
                    "GroupNorm_0": _norm(sd, "bn1")}

    for stage, blocks in enumerate(stage_sizes):
        for b in range(blocks):
            base = f"layer{stage + 1}.{b}"
            entry = {
                "Conv_0": _conv(sd, f"{base}.conv1", bias=False),
                "GroupNorm_0": _norm(sd, f"{base}.bn1"),
                "Conv_1": _conv(sd, f"{base}.conv2", bias=False),
                "GroupNorm_1": _norm(sd, f"{base}.bn2"),
                "Conv_2": _conv(sd, f"{base}.conv3", bias=False),
                "GroupNorm_2": _norm(sd, f"{base}.bn3"),
            }
            if f"{base}.downsample.0.weight" in sd:
                entry["proj"] = _conv(sd, f"{base}.downsample.0", bias=False)
                entry["GroupNorm_3"] = _norm(sd, f"{base}.downsample.1")
            params[f"stage{stage}_block{b}"] = entry
    return params


def _find_leaf(tree, key: str):
    """First leaf whose dict key matches ``key`` (depth-first)."""
    if isinstance(tree, dict):
        for k, v in tree.items():
            if str(k) == key and not isinstance(v, dict):
                return v
            found = _find_leaf(v, key)
            if found is not None:
                return found
    return None


def load_pretrained_encoder(encoder_name: str, checkpoint_path: str,
                            current_params: Dict) -> Dict:
    """Convert a local checkpoint and merge into an initialized encoder tree.

    ``current_params`` is the model's encoder subtree; geometry adaptations
    (Swin rel-pos-bias window, ViT pos-embed grid / prefix tokens) are
    inferred from its shapes. Entries missing from the checkpoint keep
    their initialization; shapes are validated against ``current_params``.
    """
    sd = load_torch_state_dict(checkpoint_path)
    if encoder_name.startswith("swin"):
        # infer per-stage depths from the checkpoint itself
        depths = []
        stage = 0
        while any(k.startswith(f"layers.{stage}.blocks.") for k in sd):
            depths.append(1 + max(
                int(k.split(".")[3]) for k in sd
                if k.startswith(f"layers.{stage}.blocks.")))
            stage += 1
        if not depths:
            raise ValueError(
                f"{checkpoint_path}: no 'layers.N.blocks.*' keys — not a "
                "timm-format Swin state_dict")
        scan = any(str(k).endswith("_scan") for k in current_params)
        target_window = None
        bias = _find_leaf(current_params, "rel_pos_bias")
        if bias is not None:
            side = int(np.sqrt(np.asarray(bias).shape[-2]))
            target_window = (side + 1) // 2
        converted = convert_swin(sd, depths, scan_blocks=scan,
                                 target_window=target_window)
        return merge_params(current_params, converted)

    if encoder_name.startswith("vit") or "dino" in encoder_name or (
            encoder_name.startswith("timm:")):
        depth = sum(1 for k in sd if k.endswith(".norm1.weight")
                    and k.startswith("blocks."))
        target = current_params.get("backbone", current_params)
        keep_prefix = "prefix_tokens" in target
        pos = np.asarray(target["pos_embed"])
        n_prefix = (np.asarray(target["prefix_tokens"]).shape[1]
                    if keep_prefix else 0)
        target_grid = int(np.sqrt(pos.shape[1] - n_prefix))
        converted = convert_vit(sd, depth=depth,
                                keep_prefix_tokens=keep_prefix,
                                target_grid=target_grid)
        if "backbone" in current_params:
            return dict(current_params, backbone=merge_params(
                current_params["backbone"], converted))
        return merge_params(current_params, converted)

    if encoder_name.startswith("resnet"):
        import warnings

        # The reference's smp resnet50 is BatchNorm (reference
        # encoders.py:748-796); ours is GroupNorm (batch-independent under
        # single-task round-robin batches). Folding BN affine into GN scale/
        # bias keeps the conv weights but CHANGES normalization semantics
        # (running statistics are dropped) — pretrained resnet weights are
        # a warm start here, not a numerically faithful import.
        warnings.warn(
            "resnet pretrained import: BatchNorm running statistics are "
            "dropped (this encoder uses GroupNorm); expect an adaptation "
            "phase when fine-tuning — outputs will NOT match the torch "
            "model.", UserWarning, stacklevel=2)
        converted = convert_resnet50(sd)
        return merge_params(current_params, converted)

    raise ValueError(f"No converter for encoder {encoder_name!r}")


def merge_params(current: Dict, incoming: Dict, path: str = "") -> Dict:
    """Recursively overlay ``incoming`` onto ``current`` with shape checks."""
    out = dict(current)
    for k, v in incoming.items():
        here = f"{path}/{k}"
        if k not in current:
            raise KeyError(f"converted param {here} not in model tree "
                           f"(have: {sorted(current)[:8]}...)")
        if isinstance(v, dict):
            out[k] = merge_params(current[k], v, here)
        else:
            cur = np.asarray(current[k])
            if cur.shape != v.shape:
                raise ValueError(
                    f"shape mismatch at {here}: model {cur.shape} vs "
                    f"checkpoint {v.shape}")
            out[k] = v.astype(cur.dtype)
    return out
