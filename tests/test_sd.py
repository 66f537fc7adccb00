"""SD stack parity: tiny torch replicas in the diffusers naming convention
(UNet / VAE), transformers CLIPTextModel as an independent text golden."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from midvision_probe_tpu.models.sd.convert import (
    convert_text_encoder,
    convert_unet,
    convert_vae_encoder,
)
from midvision_probe_tpu.models.sd.text_encoder import (
    CLIPTextConfig,
    CLIPTextEncoder,
)
from midvision_probe_tpu.models.sd.unet import (
    UNet2DCondition,
    UNetConfig,
    timestep_embedding,
)
from midvision_probe_tpu.models.sd.vae import VAEEncoder, VAEEncoderConfig

torch.manual_seed(4)
G = 4  # tiny group count


# --------------------------------------------------------------- replicas --
class TResnet(nn.Module):
    def __init__(self, cin, cout, temb_dim=None):
        super().__init__()
        self.norm1 = nn.GroupNorm(G, cin, eps=1e-5 if temb_dim else 1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        if temb_dim:
            self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = nn.GroupNorm(G, cout, eps=1e-5 if temb_dim else 1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (
            nn.Conv2d(cin, cout, 1) if cin != cout else None
        )

    def forward(self, x, temb=None):
        h = self.conv1(nn.functional.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(nn.functional.silu(temb))[:, :, None, None]
        h = self.conv2(nn.functional.silu(self.norm2(h)))
        sc = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return sc + h


class TTransformerBlock(nn.Module):
    def __init__(self, dim, ctx_dim, head_dim):
        super().__init__()
        heads = max(dim // head_dim, 1)
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.norm3 = nn.LayerNorm(dim, eps=1e-5)
        self.attn1 = TAttn(dim, dim, heads, head_dim)
        self.attn2 = TAttn(dim, ctx_dim, heads, head_dim)
        self.ff = nn.Module()
        self.ff.net = nn.ModuleList([
            nn.Module(), nn.Identity(), nn.Linear(dim * 4, dim)
        ])
        self.ff.net[0].proj = nn.Linear(dim, dim * 8)

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x), None)
        x = x + self.attn2(self.norm2(x), ctx)
        g = self.ff.net[0].proj(self.norm3(x))
        a, b = g.chunk(2, dim=-1)
        return x + self.ff.net[2](a * nn.functional.gelu(b))


class TAttn(nn.Module):
    def __init__(self, dim, ctx_dim, heads, head_dim):
        super().__init__()
        inner = heads * head_dim
        self.heads = heads
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_k = nn.Linear(ctx_dim, inner, bias=False)
        self.to_v = nn.Linear(ctx_dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, dim)])

    def forward(self, x, ctx):
        ctx = x if ctx is None else ctx
        B, N, _ = x.shape
        M = ctx.shape[1]
        hd = self.to_q.out_features // self.heads
        q = self.to_q(x).view(B, N, self.heads, hd).transpose(1, 2)
        k = self.to_k(ctx).view(B, M, self.heads, hd).transpose(1, 2)
        v = self.to_v(ctx).view(B, M, self.heads, hd).transpose(1, 2)
        a = (q @ k.transpose(-2, -1)) * hd**-0.5
        a = a.softmax(dim=-1)
        o = (a @ v).transpose(1, 2).reshape(B, N, -1)
        return self.to_out[0](o)


class TSpatialTransformer(nn.Module):
    def __init__(self, ch, ctx_dim, head_dim):
        super().__init__()
        self.norm = nn.GroupNorm(G, ch, eps=1e-6)
        self.proj_in = nn.Linear(ch, ch)
        self.transformer_blocks = nn.ModuleList(
            [TTransformerBlock(ch, ctx_dim, head_dim)]
        )
        self.proj_out = nn.Linear(ch, ch)

    def forward(self, x, ctx):
        B, C, H, W = x.shape
        res = x
        h = self.norm(x).permute(0, 2, 3, 1).reshape(B, H * W, C)
        h = self.proj_in(h)
        h = self.transformer_blocks[0](h, ctx)
        h = self.proj_out(h)
        return res + h.reshape(B, H, W, C).permute(0, 3, 1, 2)


class TTinyUNet(nn.Module):
    """diffusers-named 2-level UNet matching UNetConfig((8, 16), 1 layer)."""

    def __init__(self, chans=(8, 16), ctx=12, head_dim=4):
        super().__init__()
        temb = chans[0] * 4
        self.conv_in = nn.Conv2d(4, chans[0], 3, padding=1)
        self.time_embedding = nn.Module()
        self.time_embedding.linear_1 = nn.Linear(chans[0], temb)
        self.time_embedding.linear_2 = nn.Linear(temb, temb)

        self.down_blocks = nn.ModuleList()
        # level 0: cross-attn block with downsampler
        b0 = nn.Module()
        b0.resnets = nn.ModuleList([TResnet(chans[0], chans[0], temb)])
        b0.attentions = nn.ModuleList(
            [TSpatialTransformer(chans[0], ctx, head_dim)]
        )
        b0.downsamplers = nn.ModuleList([nn.Module()])
        b0.downsamplers[0].conv = nn.Conv2d(chans[0], chans[0], 3, 2, 1)
        self.down_blocks.append(b0)
        # level 1: plain block
        b1 = nn.Module()
        b1.resnets = nn.ModuleList([TResnet(chans[0], chans[1], temb)])
        self.down_blocks.append(b1)

        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [TResnet(chans[1], chans[1], temb), TResnet(chans[1], chans[1], temb)]
        )
        self.mid_block.attentions = nn.ModuleList(
            [TSpatialTransformer(chans[1], ctx, head_dim)]
        )

        self.up_blocks = nn.ModuleList()
        # up 0 (level 1, plain, upsampler)
        u0 = nn.Module()
        u0.resnets = nn.ModuleList([
            TResnet(chans[1] + chans[1], chans[1], temb),
            TResnet(chans[1] + chans[0], chans[1], temb),
        ])
        u0.upsamplers = nn.ModuleList([nn.Module()])
        u0.upsamplers[0].conv = nn.Conv2d(chans[1], chans[1], 3, padding=1)
        self.up_blocks.append(u0)
        # up 1 (level 0, cross-attn)
        u1 = nn.Module()
        u1.resnets = nn.ModuleList([
            TResnet(chans[1] + chans[0], chans[0], temb),
            TResnet(chans[0] + chans[0], chans[0], temb),
        ])
        u1.attentions = nn.ModuleList([
            TSpatialTransformer(chans[0], ctx, head_dim),
            TSpatialTransformer(chans[0], ctx, head_dim),
        ])
        self.up_blocks.append(u1)

    def forward(self, x, temb_sincos, ctx):
        temb = self.time_embedding.linear_2(
            nn.functional.silu(self.time_embedding.linear_1(temb_sincos))
        )
        h = self.conv_in(x)
        skips = [h]
        b0 = self.down_blocks[0]
        h = b0.resnets[0](h, temb)
        h = b0.attentions[0](h, ctx)
        skips.append(h)
        h = b0.downsamplers[0].conv(h)
        skips.append(h)
        b1 = self.down_blocks[1]
        h = b1.resnets[0](h, temb)
        skips.append(h)

        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)

        taps = []
        u0 = self.up_blocks[0]
        for r in u0.resnets:
            h = r(torch.cat([h, skips.pop()], dim=1), temb)
        h = nn.functional.interpolate(h, scale_factor=2, mode="nearest")
        h = u0.upsamplers[0].conv(h)
        taps.append(h)
        u1 = self.up_blocks[1]
        for r, a in zip(u1.resnets, u1.attentions):
            h = r(torch.cat([h, skips.pop()], dim=1), temb)
            h = a(h, ctx)
        taps.append(h)
        return taps


def test_unet_matches_replica(rng):
    t = TTinyUNet().eval()
    cfg = UNetConfig(block_out_channels=(8, 16), layers_per_block=1,
                     cross_attention_dim=12, head_dim=4, norm_groups=G)
    variables = convert_unet(t.state_dict(), cfg)

    x = rng.randn(1, 4, 8, 8).astype(np.float32)
    ctx = rng.randn(1, 5, 12).astype(np.float32)
    ts = np.array([7], np.int64)
    temb_sincos = np.asarray(timestep_embedding(jnp.asarray(ts), 8))
    with torch.no_grad():
        ref = t(torch.from_numpy(x), torch.from_numpy(temb_sincos),
                torch.from_numpy(ctx))
    got = UNet2DCondition(cfg).apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(ts.astype(np.int32)), jnp.asarray(ctx),
        up_ft_indices=(0, 1),
    )["up_ft"]
    for g, r in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), r.numpy(),
            atol=1e-4, rtol=1e-3,
        )


# ------------------------------------------------------------------- VAE ---
class TTinyVAE(nn.Module):
    def __init__(self, chans=(8, 16), latent=2):
        super().__init__()
        enc = nn.Module()
        enc.conv_in = nn.Conv2d(3, chans[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        for lvl, ch in enumerate(chans):
            blk = nn.Module()
            cin = chans[max(lvl - 1, 0)]
            blk.resnets = nn.ModuleList([TResnet(cin, ch)])
            if lvl < len(chans) - 1:
                blk.downsamplers = nn.ModuleList([nn.Module()])
                blk.downsamplers[0].conv = nn.Conv2d(ch, ch, 3, 2, 0)
            enc.down_blocks.append(blk)
        enc.mid_block = nn.Module()
        enc.mid_block.resnets = nn.ModuleList(
            [TResnet(chans[-1], chans[-1]), TResnet(chans[-1], chans[-1])]
        )
        attn = nn.Module()
        attn.group_norm = nn.GroupNorm(G, chans[-1], eps=1e-6)
        attn.to_q = nn.Linear(chans[-1], chans[-1])
        attn.to_k = nn.Linear(chans[-1], chans[-1])
        attn.to_v = nn.Linear(chans[-1], chans[-1])
        attn.to_out = nn.ModuleList([nn.Linear(chans[-1], chans[-1])])
        enc.mid_block.attentions = nn.ModuleList([attn])
        enc.conv_norm_out = nn.GroupNorm(G, chans[-1], eps=1e-6)
        enc.conv_out = nn.Conv2d(chans[-1], 2 * latent, 3, padding=1)
        self.encoder = enc
        self.quant_conv = nn.Conv2d(2 * latent, 2 * latent, 1)
        self.latent = latent

    def forward(self, x):
        e = self.encoder
        h = e.conv_in(x)
        for lvl, blk in enumerate(e.down_blocks):
            h = blk.resnets[0](h)
            if hasattr(blk, "downsamplers"):
                h = nn.functional.pad(h, (0, 1, 0, 1))
                h = blk.downsamplers[0].conv(h)
        h = e.mid_block.resnets[0](h)
        a = e.mid_block.attentions[0]
        B, C, H, W = h.shape
        hh = a.group_norm(h).permute(0, 2, 3, 1).reshape(B, H * W, C)
        q, k, v = a.to_q(hh), a.to_k(hh), a.to_v(hh)
        att = (q @ k.transpose(-2, -1)) * C**-0.5
        o = a.to_out[0](att.softmax(-1) @ v)
        h = h + o.reshape(B, H, W, C).permute(0, 3, 1, 2)
        h = e.mid_block.resnets[1](h)
        h = e.conv_out(nn.functional.silu(e.conv_norm_out(h)))
        moments = self.quant_conv(h)
        return moments[:, : self.latent] * 0.18215


def test_vae_encoder_matches_replica(rng):
    t = TTinyVAE().eval()
    cfg = VAEEncoderConfig(block_out_channels=(8, 16), layers_per_block=1,
                           latent_channels=2, norm_groups=G)
    variables = convert_vae_encoder(t.state_dict(), cfg)

    x = rng.randn(1, 3, 16, 16).astype(np.float32)
    with torch.no_grad():
        ref = t(torch.from_numpy(x)).numpy()
    got = VAEEncoder(cfg).apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-4, rtol=1e-3
    )


# ------------------------------------------------------------------ text ---
def test_text_encoder_matches_transformers(rng):
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="gelu",
    )
    hf = transformers.CLIPTextModel(hf_cfg).eval()

    cfg = CLIPTextConfig(vocab_size=100, hidden_size=32, num_layers=2,
                         num_heads=4, max_positions=16)
    variables = convert_text_encoder(hf.state_dict(), cfg)

    ids = rng.randint(0, 100, size=(2, 16))
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).last_hidden_state.numpy()
    got = CLIPTextEncoder(cfg).apply(variables, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-5, rtol=1e-3)


def test_sd_featurizer_smoke_tiny(rng, tmp_path, monkeypatch):
    """Full DIFT pipeline (VAE -> noise -> UNet taps) on a tiny random-init
    config."""
    monkeypatch.setenv("MVP_CHECKPOINT_DIR", str(tmp_path))
    from midvision_probe_tpu.models.sd.featurizer import SDFeaturizer
    from midvision_probe_tpu.models.sd.text_encoder import CLIPTextConfig
    from midvision_probe_tpu.models.sd.unet import UNetConfig
    from midvision_probe_tpu.models.sd.vae import VAEEncoderConfig

    feat = SDFeaturizer(
        unet_cfg=UNetConfig(block_out_channels=(8, 16), layers_per_block=1,
                            cross_attention_dim=12, head_dim=4,
                            norm_groups=G),
        vae_cfg=VAEEncoderConfig(block_out_channels=(8, 16),
                                 layers_per_block=1, latent_channels=4,
                                 norm_groups=G),
        text_cfg=CLIPTextConfig(vocab_size=100, hidden_size=12, num_layers=1,
                                num_heads=2),
    )
    images = jnp.asarray(rng.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1)
    embeds = jnp.zeros((1, 77, 12))
    taps = feat(images, embeds, t=250, up_ft_indices=(0, 1))
    assert len(taps) == 2
    # tiny VAE halves once (2 levels): latents 16x16; up taps at 16 and 32?
    assert all(np.isfinite(np.asarray(t)).all() for t in taps)


def test_ldm_unet_converter_matches_diffusers_naming(rng):
    """Rename the diffusers-named tiny UNet's weights to LDM naming and
    require both converters to produce identical trees."""
    from midvision_probe_tpu.models.sd.convert import convert_unet_ldm

    t = TTinyUNet().eval()
    sd = t.state_dict()
    cfg = UNetConfig(block_out_channels=(8, 16), layers_per_block=1,
                     cross_attention_dim=12, head_dim=4, norm_groups=G)
    ref_tree = convert_unet(sd, cfg)

    block_map = {
        "time_embedding.linear_1": "time_embed.0",
        "time_embedding.linear_2": "time_embed.2",
        "conv_in": "input_blocks.0.0",
        "down_blocks.0.resnets.0": "input_blocks.1.0",
        "down_blocks.0.attentions.0": "input_blocks.1.1",
        "down_blocks.0.downsamplers.0.conv": "input_blocks.2.0.op",
        "down_blocks.1.resnets.0": "input_blocks.3.0",
        "mid_block.resnets.0": "middle_block.0",
        "mid_block.attentions.0": "middle_block.1",
        "mid_block.resnets.1": "middle_block.2",
        "up_blocks.0.resnets.0": "output_blocks.0.0",
        "up_blocks.0.resnets.1": "output_blocks.1.0",
        "up_blocks.0.upsamplers.0.conv": "output_blocks.1.1.conv",
        "up_blocks.1.resnets.0": "output_blocks.2.0",
        "up_blocks.1.attentions.0": "output_blocks.2.1",
        "up_blocks.1.resnets.1": "output_blocks.3.0",
        "up_blocks.1.attentions.1": "output_blocks.3.1",
    }
    resnet_sub = {
        "norm1": "in_layers.0", "conv1": "in_layers.2",
        "time_emb_proj": "emb_layers.1", "norm2": "out_layers.0",
        "conv2": "out_layers.3", "conv_shortcut": "skip_connection",
    }

    final = {}
    for k, v in sd.items():
        matched = None
        for d_name, l_name in sorted(block_map.items(),
                                     key=lambda kv: -len(kv[0])):
            if k.startswith(d_name):
                rest = k[len(d_name):]
                matched = (l_name, rest)
                break
        assert matched, k
        l_name, rest = matched
        if "resnets" in k or k.startswith("mid_block.resnets"):
            for d_sub, l_sub in resnet_sub.items():
                rest = rest.replace(f".{d_sub}.", f".{l_sub}.")
        final["model.diffusion_model." + l_name + rest] = v

    got_tree = convert_unet_ldm(final, cfg)

    import jax

    ref_leaves = jax.tree_util.tree_leaves_with_path(ref_tree)
    got = dict(jax.tree_util.tree_leaves_with_path(got_tree))
    assert len(ref_leaves) == len(got)
    for path, leaf in ref_leaves:
        np.testing.assert_array_equal(got[path], leaf)


def test_zero123_cond_embedding_matches_torch(rng, tmp_path, monkeypatch):
    """Self-contained Zero123 conditioning (zero123.py:48-56): CLIP image
    tower -> ln_post(cls) @ proj -> cat pose T -> cc_projection, verified
    against a torch oracle built from the same fabricated state_dict."""
    monkeypatch.setenv("MVP_CHECKPOINT_DIR", str(tmp_path))
    import os
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_convert_extra import _CLIPVisual

    from midvision_probe_tpu.models.sd.featurizer import Zero123

    d, depth, patch, img, emb_dim = 64, 2, 8, 224, 48
    # heads = width // 64 (CLIP's fixed head_dim, what _load_conditioning infers)
    tower = _CLIPVisual(d=d, heads=1, depth=depth, patch=patch, img=img).eval()
    ln_post = nn.LayerNorm(d, eps=1e-5).eval()
    with torch.no_grad():
        ln_post.weight.normal_(1.0, 0.05)
        ln_post.bias.normal_(0.0, 0.05)
    proj = torch.randn(d, emb_dim) * 0.05
    cc = nn.Linear(emb_dim + 4, 16).eval()

    sd = {f"cond_stage_model.model.visual.{k}": v
          for k, v in tower.state_dict().items()}
    sd["cond_stage_model.model.visual.ln_post.weight"] = ln_post.weight.data
    sd["cond_stage_model.model.visual.ln_post.bias"] = ln_post.bias.data
    sd["cond_stage_model.model.visual.proj"] = proj
    sd["cc_projection.weight"] = cc.weight.data
    sd["cc_projection.bias"] = cc.bias.data

    z = Zero123()  # no ckpt on disk -> random unet/vae, no conditioning yet
    z._load_conditioning(sd)
    assert z.clip_cfg.width == d and z.clip_cfg.depth == depth

    images = rng.rand(2, img, img, 3).astype(np.float32) * 2 - 1
    got = np.asarray(z.cond_embedding(images))

    # torch oracle (FrozenCLIPImageEmbedder preprocessing at native 224)
    from midvision_probe_tpu.models.zoo import (
        OPENAI_CLIP_MEAN,
        OPENAI_CLIP_STD,
    )

    x = (torch.from_numpy(images.transpose(0, 3, 1, 2)) + 1) / 2
    x = (x - torch.tensor(OPENAI_CLIP_MEAN)[:, None, None]) / torch.tensor(
        OPENAI_CLIP_STD)[:, None, None]
    with torch.no_grad():
        cls = ln_post(tower(x)[-1][:, 0])
        c = torch.cat([cls @ proj,
                       torch.tensor([[0.0, 0.0, 1.0, 0.0]]).expand(2, 4)], -1)
        ref = cc(c)[:, None].numpy()
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_unet_odd_latent_grid(rng):
    """Odd spatial grids (e.g. 480x640 images -> 60x80 latents -> 15x20 at
    depth) truncate on the way down; the up path must upsample to the
    NEXT SKIP's size (diffusers forward_upsample_size), not a blind 2x."""
    cfg = UNetConfig(block_out_channels=(8, 16), layers_per_block=1,
                     cross_attention_dim=12, head_dim=4, norm_groups=G)
    import jax

    from midvision_probe_tpu.models.sd.unet import UNet2DCondition

    unet = UNet2DCondition(cfg)
    x = jnp.asarray(rng.randn(1, 15, 20, 4).astype(np.float32))
    ctx = jnp.asarray(rng.randn(1, 5, 12).astype(np.float32))
    ts = jnp.array([7], jnp.int32)
    variables = unet.init(jax.random.PRNGKey(0), x, ts, ctx)
    out = unet.apply(variables, x, ts, ctx)["up_ft"]
    assert out[-1].shape[1:3] == (15, 20)
