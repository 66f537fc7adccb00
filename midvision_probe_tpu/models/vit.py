"""One generic Flax ViT with per-layer taps — the whole ViT-side zoo.

The reference wraps ~20 separate torch ViT implementations (timm, HF, local
copies like ``ibot_transformers.py`` / ``impl_utils/beit_model.py`` /
``deit_utils.py``) behind the same capture-multilayer-taps loop
(``dino.py:181-195``). Here a single configurable module covers them all:

* cls token / register tokens (DINOv2-reg, ``dino.py:203``),
* learned pos-embed with bicubic resize (``evals/models/utils.py:12-52``) or
  fixed 2D sin-cos (MAE, ``mae.py:74-89``), with or without a cls pos entry,
* pre-norm blocks with fused-qkv attention, exact GELU MLP,
* LayerScale (DeiT-III ``deit_utils.py``, BEiT-v2),
* relative position bias tables (BEiT-v2 ``impl_utils/beit_model.py``),
* 2D RoPE on q/k (CroCo-v2) via the Pallas kernel in ``ops.rope2d``,
* windowed attention with decomposed relative positions (SAM).

Layout is NHWC / (B, N, C); compute dtype is configurable (bfloat16 on TPU),
params stay float32.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from midvision_probe_tpu.ops.activations import gelu
from midvision_probe_tpu.ops.image import resize
from midvision_probe_tpu.ops.rope2d import rope_2d


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 16
    width: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    in_channels: int = 3
    class_token: bool = True
    num_register_tokens: int = 0
    pos_embed: str = "learned"  # learned | sincos2d | none
    pos_embed_cls: bool = True  # pos-embed table includes a cls entry
    # canonical (training-time) pos-embed grid; None = current input grid.
    # Checkpoint loading fixes this to the stored table's grid and the table
    # is bicubic-resized to the input grid at apply time (utils.py:12-52).
    table_grid: tuple[int, int] | None = None
    layernorm_eps: float = 1e-6
    qkv_bias: bool = True
    patch_bias: bool = True  # CLIP's conv1 has no bias
    # gelu (erf in f32) | quickgelu (openai CLIP) | gelu_tanh (SigLIP:
    # big_vision trains with JAX's default tanh-approx gelu — HF mirrors it
    # as hidden_act="gelu_pytorch_tanh")
    act: str = "gelu"
    layerscale: bool = False
    rel_pos_bias: bool = False  # BEiT-style per-block relative position bias
    rope: bool = False  # CroCo-style 2D RoPE on q/k (no abs pos embed)
    rope_base: float = 100.0
    window_size: int = 0  # SAM-style windowed attention (0 = global)
    global_attn_indexes: Sequence[int] = ()
    use_rel_pos: bool = False  # SAM decomposed relative positions
    final_norm: bool = False  # apply final LN to tapped outputs
    pre_norm: bool = False  # CLIP-style LN before the blocks
    # Roll the (homogeneous) block stack into one lax.scan body instead of
    # unrolling depth copies of the block HLO. Same math, ~depth-times
    # smaller program — required to get ViT-L+ programs through tunnelled
    # remote-compile services with request-size limits. Param layout changes
    # to `blocks_scan/block/**` with a leading depth axis; use
    # ``stack_block_variables`` to adapt per-block checkpoints.
    scan_blocks: bool = False
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.width // self.num_heads

    @property
    def num_prefix_tokens(self) -> int:
        return (1 if self.class_token else 0) + self.num_register_tokens


def get_2d_sincos_pos_embed(embed_dim: int, grid_hw: tuple[int, int],
                            add_cls_token: bool = False) -> np.ndarray:
    """Fixed 2D sin-cos table (reference ``evals/models/utils.py:75-102``)."""
    h, w = grid_hw
    grid_h = np.arange(h, dtype=np.float32)
    grid_w = np.arange(w, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w goes first
    grid = np.stack(grid, axis=0).reshape(2, 1, h, w)

    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb = np.concatenate(
        [_1d(embed_dim // 2, grid[0]), _1d(embed_dim // 2, grid[1])], axis=1
    )
    if add_cls_token:
        emb = np.concatenate([np.zeros((1, embed_dim)), emb], axis=0)
    return emb.astype(np.float32)


def resize_pos_embed(pos: jnp.ndarray, hw: tuple[int, int],
                     has_cls_token: bool = True,
                     orig_hw: tuple[int, int] | None = None) -> jnp.ndarray:
    """Bicubic antialiased pos-embed resize (reference ``utils.py:12-52``).

    ``pos``: (n_tokens, C). Returns (new_n, C).

    The reference early-returns on token COUNT alone (``utils.py:31``), so
    a KNOWN-square table whose patch count coincides with a non-square
    input grid's (e.g. a 14x14=196 checkpoint table fed a 7x28=196 grid)
    silently applies spatially scrambled embeddings. Fixed per the
    latent-bug policy: when the table's grid is KNOWN (``orig_hw``, from
    the checkpoint's table_grid), the early return requires the grid
    SHAPES to match. With unknown provenance a count match must still
    mean "same grid" — random-init tables are created at the (possibly
    non-square) input grid itself.
    """
    n_grid = pos.shape[0] - 1 if has_cls_token else pos.shape[0]
    known = orig_hw is not None and n_grid == orig_hw[0] * orig_hw[1]
    if known:
        if tuple(orig_hw) == tuple(hw):
            return pos
    else:
        if n_grid == hw[0] * hw[1]:
            return pos
        orig = int(round(math.sqrt(n_grid)))
        orig_hw = (orig, orig)
    if has_cls_token:
        cls_embed, pos = pos[:1], pos[1:]
    grid = pos.reshape(orig_hw[0], orig_hw[1], -1)
    grid = resize(grid, hw, mode="bicubic", align_corners=False, antialias=True)
    pos = grid.reshape(hw[0] * hw[1], -1)
    if has_cls_token:
        pos = jnp.concatenate([cls_embed, pos], axis=0)
    return pos


class _DenseParams(nn.Module):
    """Declares an nn.Dense-compatible kernel/bias pair without computing —
    lets the fused-MLP kernel consume raw weights while the converter-facing
    param paths (``mlp/fc1/kernel`` etc.) stay identical."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return k, b


class Mlp(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        hidden = int(c.width * c.mlp_ratio)
        w1, b1 = _DenseParams(hidden, name="fc1")(x.shape[-1])
        w2, b2 = _DenseParams(c.width, name="fc2")(hidden)

        # NOTE: a fused fc1+gelu+fc2 Pallas kernel exists
        # (ops/fused_mlp.py) but measured SLOWER end-to-end than XLA's own
        # pipeline on v5e (384 -> 358..370 imgs/s at bm 256..1024): XLA
        # already overlaps/fuses the elementwise gelu well here. Kept as a
        # library op; not dispatched.
        x = x @ w1.astype(c.dtype) + b1.astype(c.dtype)
        if c.act == "quickgelu":  # openai CLIP: x * sigmoid(1.702 x)
            x = x * nn.sigmoid(1.702 * x)
        elif c.act == "gelu_tanh":  # SigLIP: tanh-approx gelu at ANY dtype
            x = jax.nn.gelu(x, approximate=True)
        else:
            x = gelu(x)  # erf in f32, tanh in bf16 (ops/activations.py)
        return x @ w2.astype(c.dtype) + b2.astype(c.dtype)


def _rel_pos_index(window: tuple[int, int]) -> np.ndarray:
    """BEiT relative-position index over a (h, w) grid + cls interactions."""
    h, w = window
    coords = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"))
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += h - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    idx = np.zeros((h * w + 1, h * w + 1), dtype=np.int64)
    num_rel = (2 * h - 1) * (2 * w - 1)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel
    idx[0:, 0] = num_rel + 1
    idx[0, 0] = num_rel + 2
    return idx


# test hook: force the fused-attention + whole-network-padding path with
# Pallas in interpret mode on CPU (tests/test_vit_attention.py)
_FORCE_INTERPRET = False


def fused_attention_ok(c: ViTConfig, n_padded: int) -> bool:
    """True when the single-pass fused-qkv Pallas kernel can serve a ViT of
    config ``c`` at (padded) sequence length ``n_padded``."""
    return (
        not c.rope
        and not c.rel_pos_bias
        and (jax.default_backend() == "tpu" or _FORCE_INTERPRET)
        and n_padded >= 256
        and 128 % c.head_dim == 0
        and (c.num_heads * c.head_dim) % 128 == 0
        and n_padded * c.head_dim * 4 <= 2 * 1024 * 1024  # K+V fit in VMEM
    )


class Attention(nn.Module):
    cfg: ViTConfig
    layer_idx: int = 0

    @nn.compact
    def __call__(self, x, pos_2d=None, grid_hw=None, n_valid=None):
        c = self.cfg
        B, N, C = x.shape
        qkv = nn.Dense(3 * C, use_bias=c.qkv_bias, dtype=c.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, c.num_heads, c.head_dim)
        q, k, v = jnp.moveaxis(qkv, 2, 0)  # each (B, N, H, hd)
        q = jnp.transpose(q, (0, 2, 1, 3))  # (B, H, N, hd)
        k = jnp.transpose(k, (0, 2, 1, 3))
        v = jnp.transpose(v, (0, 2, 1, 3))

        # expose raw q/k/v for the reference's return_kqv path
        # (``dino.py:82-138``); materialized only when callers request the
        # 'intermediates' collection (XLA DCEs these transposes otherwise)
        nv = N if n_valid is None else n_valid
        self.sow("intermediates", "qkv_heads",
                 (q[:, :, :nv], k[:, :, :nv], v[:, :, :nv]))

        scale = c.head_dim**-0.5
        # n_valid != None ⇒ ViT.__call__ already checked fused_attention_ok
        # at the padded length; otherwise check at this x's length
        use_fused = n_valid is not None or fused_attention_ok(c, N)
        if use_fused:
            # hot path: the single-pass kernel reads q/k/v straight from the
            # (B, N, 3, H, d) projection output and writes token-major — the
            # four (B, H, N, d) HBM transposes above never materialize.
            # n_valid != None: the whole network runs at a 128-padded token
            # count (ViT.__call__) and the kernel masks the padded K/V rows.
            from midvision_probe_tpu.ops.vit_attention import (
                fused_qkv_attention,
            )

            out = fused_qkv_attention(qkv, scale, _FORCE_INTERPRET,
                                      n_valid).reshape(B, N, C)
            return nn.Dense(C, dtype=c.dtype, name="proj")(out)

        if c.rope and pos_2d is not None:
            # rotate patch tokens only; prefix tokens are left untouched
            p = c.num_prefix_tokens
            q_pat = rope_2d(q[:, :, p:], pos_2d, base=c.rope_base,
                            use_pallas=False)
            k_pat = rope_2d(k[:, :, p:], pos_2d, base=c.rope_base,
                            use_pallas=False)
            q = jnp.concatenate([q[:, :, :p], q_pat], axis=2)
            k = jnp.concatenate([k[:, :, :p], k_pat], axis=2)

        bias = None
        if c.rel_pos_bias and grid_hw is not None:
            h, w = grid_hw
            num_rel = (2 * h - 1) * (2 * w - 1) + 3
            table = self.param(
                "rel_pos_bias_table",
                nn.initializers.zeros,
                (num_rel, c.num_heads),
                jnp.float32,
            )
            # converted variables hold raw numpy leaves; lift the table into
            # jnp before fancy-indexing (numpy would reject a traced index)
            idx = jnp.asarray(_rel_pos_index((h, w)))
            bias = jnp.transpose(jnp.asarray(table)[idx], (2, 0, 1))[None]

        from midvision_probe_tpu.ops.attention import multi_head_attention

        out = multi_head_attention(q, k, v, bias=bias, scale=scale)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, C)
        out = nn.Dense(C, dtype=c.dtype, name="proj")(out)
        return out


class Block(nn.Module):
    cfg: ViTConfig
    layer_idx: int = 0

    @nn.compact
    def __call__(self, x, pos_2d=None, grid_hw=None, n_valid=None):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=c.dtype, name="norm1")(x)
        h = Attention(c, self.layer_idx, name="attn")(h, pos_2d, grid_hw,
                                                      n_valid)
        if c.layerscale:
            gamma1 = self.param(
                "gamma_1", nn.initializers.ones, (c.width,), jnp.float32
            )
            h = h * gamma1.astype(c.dtype)
        x = x + h
        h = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=c.dtype, name="norm2")(x)
        h = Mlp(c, name="mlp")(h)
        if c.layerscale:
            gamma2 = self.param(
                "gamma_2", nn.initializers.ones, (c.width,), jnp.float32
            )
            h = h * gamma2.astype(c.dtype)
        return x + h


class _TapBlock(nn.Module):
    """Scan body: one Block step that writes its output into a per-TAP
    slot buffer instead of stacking every layer.

    ``ys``-stacking would materialize a ``(depth, B, N, C)`` tensor
    (~4.8 GB for ViT-L at the 480x640 batch-64 bench shape on a 16 GB
    chip) though only ``len(taps)`` layers are ever read. Slot ``k`` of
    the carried ``(len(taps), B, N, C)`` buffer is written by every
    layer in ``(taps[k-1], taps[k]]`` — same single (B, N, C) HBM write
    per iteration as stacking — so after the scan it holds exactly layer
    ``taps[k]``'s tokens (the last writer wins)."""

    cfg: ViTConfig
    grid_hw: tuple
    n_valid: int | None
    taps: tuple

    @nn.compact
    def __call__(self, carry, pos_2d):
        x, buf, i = carry
        x = Block(self.cfg, 0, name="block")(x, pos_2d, self.grid_hw,
                                             self.n_valid)
        taps_arr = jnp.asarray(self.taps, jnp.int32)
        slot = jnp.searchsorted(taps_arr, i)
        if max(self.taps) < self.cfg.depth - 1:
            # layers past the last tap would clobber the final slot;
            # redirect their write to the value already there
            slot = jnp.minimum(slot, len(self.taps) - 1)
            prev = jax.lax.dynamic_index_in_dim(buf, slot, 0,
                                                keepdims=False)
            write = jnp.where(i <= max(self.taps), x, prev)
        else:
            write = x
        buf = jax.lax.dynamic_update_index_in_dim(buf, write, slot, 0)
        return (x, buf, i + 1), None


def stack_block_variables(variables, depth: int):
    """Adapt a per-block param tree (``blocks_0`` .. ``blocks_{depth-1}``,
    the converter/checkpoint layout) to the ``scan_blocks=True`` layout
    (``blocks_scan/block/**`` with a leading depth axis).

    Host-side numpy stacking — call once at load time, not per step.
    """
    import copy

    variables = jax.tree_util.tree_map(np.asarray, dict(variables))
    params = dict(variables["params"])
    blocks = [params.pop(f"blocks_{i}") for i in range(depth)]
    params["blocks_scan"] = {
        "block": jax.tree_util.tree_map(lambda *xs: np.stack(xs), *blocks)
    }
    out = copy.copy(variables)
    out["params"] = params
    return out


class ViT(nn.Module):
    """Generic ViT; ``__call__`` returns per-block token taps.

    Args (call):
        images: (B, H, W, 3), already preprocessed/normalized.
        taps: block indices to capture (raw block outputs, matching the
            reference loop at ``dino.py:181-195``).

    Returns:
        dict with ``tokens``: list of (B, N, C) tapped token tensors (prefix
        tokens first), ``grid_hw``: the patch-grid shape.
    """

    cfg: ViTConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray, taps: Sequence[int]):
        c = self.cfg
        B, H, W, _ = images.shape
        gh, gw = H // c.patch_size, W // c.patch_size

        x = nn.Conv(
            c.width,
            (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            use_bias=c.patch_bias,
            dtype=c.dtype,
            name="patch_embed",
        )(images.astype(c.dtype))
        x = x.reshape(B, gh * gw, c.width)

        if c.class_token:
            cls = self.param(
                "cls_token", nn.initializers.zeros, (1, 1, c.width), jnp.float32
            )
            x = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(c.dtype), (B, 1, c.width)), x], axis=1
            )

        if c.pos_embed == "learned":
            tg = c.table_grid or (gh, gw)
            table_len = tg[0] * tg[1] + (1 if c.pos_embed_cls else 0)
            pos = self.param(
                "pos_embed",
                nn.initializers.normal(0.02),
                (table_len, c.width),
                jnp.float32,
            )
            # trust the actual table length over cfg.table_grid: converted
            # checkpoints carry their training grid in table_grid;
            # resize_pos_embed validates it against the actual table and
            # falls back to the square/count heuristic when inconsistent
            # (random-init tables are created at the input grid itself)
            pos = resize_pos_embed(
                pos, (gh, gw), has_cls_token=c.pos_embed_cls,
                orig_hw=c.table_grid,
            )
            if c.class_token and not c.pos_embed_cls:
                pos = jnp.concatenate([jnp.zeros_like(pos[:1]), pos], axis=0)
            if not c.class_token and c.pos_embed_cls:
                pos = pos[1:]
            x = x + pos[None].astype(c.dtype)
        elif c.pos_embed == "sincos2d":
            pos = jnp.asarray(
                get_2d_sincos_pos_embed(c.width, (gh, gw), add_cls_token=c.class_token)
            )
            x = x + pos[None].astype(c.dtype)

        if c.num_register_tokens:
            reg = self.param(
                "register_tokens",
                nn.initializers.zeros,
                (1, c.num_register_tokens, c.width),
                jnp.float32,
            )
            reg = jnp.broadcast_to(
                reg.astype(c.dtype), (B, c.num_register_tokens, c.width)
            )
            if c.class_token:
                x = jnp.concatenate([x[:, :1], reg, x[:, 1:]], axis=1)
            else:
                x = jnp.concatenate([reg, x], axis=1)

        if c.pre_norm:
            x = nn.LayerNorm(epsilon=c.layernorm_eps, dtype=c.dtype, name="norm_pre")(x)

        pos_2d = None
        if c.rope:
            yy, xx = jnp.meshgrid(jnp.arange(gh), jnp.arange(gw), indexing="ij")
            pos_2d = jnp.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1)
            pos_2d = jnp.broadcast_to(pos_2d[None], (B, gh * gw, 2))

        # Whole-network 128-padding: when the fused attention kernel will
        # serve every block, pad the token axis to a 128-multiple ONCE here
        # instead of padding/slicing the qkv tensor around the kernel in
        # every layer (each round trip is ~1 ms of HBM traffic at the
        # probing batch). Padded rows flow through LN/matmuls as garbage —
        # row-wise ops keep them confined to their own rows, and the kernel
        # masks them out of K/V — and are sliced off at tap capture.
        n_tokens = x.shape[1]
        n_valid = None
        n_pad = (-n_tokens) % 128
        if n_pad and fused_attention_ok(c, n_tokens + n_pad):
            n_valid = n_tokens
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))

        taps = list(taps)
        outputs: dict[int, jnp.ndarray] = {}
        max_tap = max(taps)
        final_norm = (
            nn.LayerNorm(epsilon=c.layernorm_eps, dtype=c.dtype, name="norm")
            if c.final_norm
            else None
        )
        if c.scan_blocks:
            # One compiled block body instead of `depth` unrolled copies;
            # tapped layers land in a (len(taps), B, N, C) slot buffer
            # (see _TapBlock — full ys stacking would be depth/len(taps)x
            # the HBM high-water).
            sorted_taps = tuple(sorted(set(taps)))
            # mirror the unrolled path's early break: scan only up to the
            # last tap (probing layer k runs k+1 blocks, not depth). Params
            # are created/stored at full depth — checkpoints stay layout-
            # compatible — and sliced to the scanned prefix at apply time.
            length = c.depth if self.is_initializing() else max_tap + 1
            scanned_cls = nn.scan(
                _TapBlock,
                variable_axes={"params": 0, "intermediates": 0},
                split_rngs={"params": True},
                in_axes=nn.broadcast,
                length=length,
            )
            if length < c.depth:
                # wrap the SCANNED module so the slice sees the stacked
                # (depth, ...) tree before scan splits it per iteration
                scanned_cls = nn.map_variables(
                    scanned_cls, "params",
                    trans_in_fn=lambda vs: jax.tree.map(
                        lambda a: a[:length], vs),
                )
            scanned = scanned_cls(c, (gh, gw), n_valid, sorted_taps,
                                  name="blocks_scan")
            buf0 = jnp.zeros((len(sorted_taps),) + x.shape, x.dtype)
            (_, buf, _), _ = scanned((x, buf0, jnp.int32(0)), pos_2d)
            for i in taps:
                tap = buf[sorted_taps.index(i)][:, :n_tokens]
                outputs[i] = final_norm(tap) if final_norm is not None else tap
        else:
            for i in range(c.depth):
                x = Block(c, i, name=f"blocks_{i}")(x, pos_2d, (gh, gw),
                                                    n_valid)
                if i in taps:
                    tap = x[:, :n_tokens]
                    outputs[i] = (final_norm(tap) if final_norm is not None
                                  else tap)
                if i == max_tap:
                    break

        return {
            "tokens": [outputs[i] for i in taps],
            "grid_hw": (gh, gw),
        }


# Canonical size presets (width/depth/heads) used across the zoo.
VIT_PRESETS = {
    "vit_small": dict(width=384, depth=12, num_heads=6),
    "vit_base": dict(width=768, depth=12, num_heads=12),
    "vit_large": dict(width=1024, depth=24, num_heads=16),
    "vit_huge": dict(width=1280, depth=32, num_heads=16),
    "vit_giant": dict(width=1536, depth=40, num_heads=24),
}
