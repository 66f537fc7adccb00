"""One-step SD featurizer + DIFT wrapper (reference ``dift_sd.py`` +
``stablediffusion.py``).

Pipeline per batch (``dift_sd.py:186-214``): CLIP-encode the prompt →
VAE-encode images to scaled mode latents → add DDPM noise at timestep t →
UNet forward capturing up-block features [1280, 1280, 640, 320] → resize to
the /16 grid for ``dense`` output.
"""

from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from midvision_probe_tpu.models.sd.convert import (
    convert_text_encoder,
    convert_unet,
    convert_vae_encoder,
)
from midvision_probe_tpu.models.sd.text_encoder import (
    CLIPTextConfig,
    CLIPTextEncoder,
)
from midvision_probe_tpu.models.sd.unet import UNet2DCondition, UNetConfig
from midvision_probe_tpu.models.sd.vae import VAEEncoder, VAEEncoderConfig

log = logging.getLogger(__name__)


def ddpm_alphas_cumprod(num_steps=1000, beta_start=0.00085, beta_end=0.012):
    """scaled_linear betas (SD scheduler config)."""
    betas = np.linspace(beta_start**0.5, beta_end**0.5, num_steps) ** 2
    return np.cumprod(1.0 - betas)


class SDFeaturizer:
    """Flax analog of reference ``SDFeaturizer`` (``dift_sd.py:157-262``).

    Weights resolve from ``$MVP_CHECKPOINT_DIR/sd21/{unet,vae,text_encoder}
    .bin`` (torch state_dicts in diffusers layout); missing parts random-init
    with a warning. Prompts need a local CLIP tokenizer
    (``$MVP_CHECKPOINT_DIR/sd21/tokenizer``) — otherwise pass
    ``prompt_embeds`` or use the empty prompt's learned embedding path.
    """

    def __init__(self, sd_id="stabilityai/stable-diffusion-2-1",
                 dtype=jnp.float32, unet_cfg=None, vae_cfg=None,
                 text_cfg=None):
        self.unet_cfg = unet_cfg or UNetConfig(dtype=dtype)
        self.vae_cfg = vae_cfg or VAEEncoderConfig(dtype=dtype)
        self.text_cfg = text_cfg or CLIPTextConfig(dtype=dtype)
        self.unet = UNet2DCondition(self.unet_cfg)
        self.vae = VAEEncoder(self.vae_cfg)
        self.text = CLIPTextEncoder(self.text_cfg)
        self.alphas_cumprod = jnp.asarray(ddpm_alphas_cumprod())
        self._load(sd_id)
        self._jit_feats = {}

    def _ckpt_dir(self):
        from midvision_probe_tpu.models.zoo import checkpoint_dir

        return os.path.join(checkpoint_dir(), "sd21")

    def _load(self, sd_id):
        import torch

        d = self._ckpt_dir()
        rng = jax.random.PRNGKey(0)
        cpu = jax.devices("cpu")[0]

        def try_load(name, converter, cfg, init_fn):
            path = os.path.join(d, f"{name}.bin")
            if os.path.exists(path):
                sd = torch.load(path, map_location="cpu", weights_only=False)
                sd = sd.get("state_dict", sd)
                return converter(sd, cfg)
            log.warning("SD %s weights missing under %s — random init "
                        "(features are not meaningful)", name, d)
            with jax.default_device(cpu):
                return init_fn(rng)

        self.unet_vars = try_load(
            "unet", convert_unet, self.unet_cfg,
            lambda r: self.unet.init(
                r, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, 77, self.text_cfg.hidden_size)),
            ),
        )
        self.vae_vars = try_load(
            "vae", convert_vae_encoder, self.vae_cfg,
            lambda r: self.vae.init(r, jnp.zeros((1, 64, 64, 3))),
        )
        self.text_vars = try_load(
            "text_encoder", convert_text_encoder, self.text_cfg,
            lambda r: self.text.init(r, jnp.zeros((1, 77), jnp.int32)),
        )

    def encode_prompt(self, prompts: list[str]) -> jnp.ndarray:
        """Tokenize + text-encode (``dift_sd.py:218-262``).

        Tokenization is self-contained (``sd/tokenizer.py`` CLIP BPE) from
        the vocab/merges files every SD checkpoint ships in ``tokenizer/``;
        the openai single-file ``bpe_simple_vocab_16e6.txt.gz`` also works."""
        from midvision_probe_tpu.models.sd.tokenizer import CLIPTokenizer

        tok_dir = os.path.join(self._ckpt_dir(), "tokenizer")
        gz = os.path.join(self._ckpt_dir(), "bpe_simple_vocab_16e6.txt.gz")
        if os.path.exists(os.path.join(tok_dir, "vocab.json")):
            tokenizer = CLIPTokenizer.from_dir(tok_dir)
        elif os.path.exists(gz):
            tokenizer = CLIPTokenizer.from_gzip(gz)
        else:
            raise FileNotFoundError(
                f"no tokenizer files under {tok_dir} or {gz}")
        ids = tokenizer(prompts)
        return self.text.apply(self.text_vars, jnp.asarray(ids))

    def __call__(self, images, prompt_embeds, t=1, up_ft_indices=(0, 1, 2, 3),
                 noise_seed=0):
        """images (B, H, W, 3) in [-1, 1]; prompt_embeds (B, 77, 1024)."""
        # one executable per tap set — a single cached closure would
        # silently serve the FIRST call's up_ft_indices to later calls
        cache_key = tuple(up_ft_indices)
        if self._jit_feats.get(cache_key) is None:
            # weights arrive as TRACED arguments: a closure would inline
            # the multi-GB UNet/VAE trees into the serialized HLO as
            # constants, which tunnelled compile services reject (the same
            # HTTP-413 failure probe_fit._forward refuses to reintroduce)
            @jax.jit
            def fn(vae_vars, unet_vars, images, embeds, t, noise_key):
                latents = self.vae.apply(vae_vars, images)
                a = self.alphas_cumprod[t]
                noise = jax.random.normal(noise_key, latents.shape,
                                          latents.dtype)
                noisy = (jnp.sqrt(a)[:, None, None, None] * latents
                         + jnp.sqrt(1 - a)[:, None, None, None] * noise)
                out = self.unet.apply(unet_vars, noisy, t, embeds,
                                      up_ft_indices=tuple(up_ft_indices))
                return out["up_ft"]

            self._jit_feats[cache_key] = fn
        B = images.shape[0]
        t_arr = jnp.full((B,), int(t), jnp.int32)
        key = jax.random.PRNGKey(noise_seed)
        return self._jit_feats[cache_key](
            self.vae_vars, self.unet_vars,
            jnp.asarray(images), jnp.asarray(prompt_embeds), t_arr, key)


class DIFT:
    """Reference ``stablediffusion.DIFT`` contract (feat dims
    [1280, 1280, 640, 320], /16 dense output, empty default prompt)."""

    def __init__(self, model_id="stabilityai/stable-diffusion-2-1",
                 time_step=250, output="dense", layer=1,
                 return_multilayer=False, add_norm=False, **_):
        assert output in ("gap", "dense")
        self.output = output
        self.time_step = time_step
        self.checkpoint_name = model_id.split("/")[-1] + f"_noise-{time_step}"
        self.patch_size = 16
        self.arch = "diffusion"
        self.featurizer = SDFeaturizer(model_id)
        feat_dims = [1280, 1280, 640, 320]
        multilayers = [0, 1, 2, 3]
        if return_multilayer:
            self.feat_dim = feat_dims
            self.multilayers = multilayers
        else:
            layer = multilayers[-1] if layer == -1 else layer
            self.feat_dim = feat_dims[layer]
            self.multilayers = [layer]
        self.return_multilayer = return_multilayer
        self.layer = "-".join(str(x) for x in self.multilayers)
        self._empty_embed = None

    def _prompt_embeds(self, batch, categories=None, prompts=None):
        if categories is not None:
            prompts = [f"a photo of a {c}" for c in categories]
        if prompts is None:
            # empty-prompt embedding is constant — encode once, broadcast
            # (the reference's null-prompt DIFT path, dift_sd.py:186-214)
            if self._empty_embed is None:
                self._empty_embed = self._prompt_embeds(1, prompts=[""])
            return jnp.broadcast_to(
                self._empty_embed, (batch,) + self._empty_embed.shape[1:])
        try:
            return self.featurizer.encode_prompt(prompts)
        except Exception as e:  # tokenizer absent: zero-context fallback
            log.warning("prompt encoding unavailable (%s); using zeros", e)
            return jnp.zeros(
                (batch, 77, self.featurizer.text_cfg.hidden_size)
            )

    def __call__(self, images, categories=None, prompts=None):
        from midvision_probe_tpu.ops.image import resize

        B, H, W, _ = images.shape
        embeds = self._prompt_embeds(B, categories, prompts)
        feats = self.featurizer(images, embeds, t=self.time_step)
        feats = [feats[i] for i in self.multilayers]
        h, w = H // self.patch_size, W // self.patch_size
        if self.output == "dense":
            feats = [resize(f.astype(jnp.float32), (h, w), mode="nearest")
                     for f in feats]
        else:
            feats = [f.mean(axis=(1, 2)) for f in feats]
        return feats[0] if len(feats) == 1 else feats


class Zero123:
    """Zero123 novel-view featurizer (reference ``zero123.py``).

    LDM SD-1.x-style UNet (8-ch concat-conditioned input, 768-d CLIP-image
    cross-attention, 8 fixed heads) + LDM VAE encoder, loaded from the
    lightning checkpoint (``$MVP_CHECKPOINT_DIR/zero123/105000.ckpt``) via
    the LDM-naming converters. Per the reference's ``sample_model``
    (``zero123.py:41-109``): up-block features are extracted for both the
    conditioned and unconditioned pass and combined with guidance scale 3.

    Conditioning is self-contained (reference ``zero123.py:41-56``): the
    checkpoint's own CLIP ViT-L/14 image tower (``cond_stage_model.model.
    visual.*``, open_clip naming) embeds the input view, the relative-pose
    vector T = [pitch, sin(azim), cos(azim), radius] (identity view →
    [0, 0, 1, 0]) is concatenated, and ``cc_projection`` (Linear 772→768)
    produces the cross-attention context. A precomputed embedding can still
    be passed to ``__call__`` to override.
    """

    GUIDANCE_SCALE = 3.0

    def __init__(self, time_step=1, output="dense", layer=1,
                 return_multilayer=False, add_norm=False, **_):
        assert output in ("gap", "dense")
        self.output = output
        self.time_step = time_step
        self.checkpoint_name = f"zero123_t-{time_step}"
        self.patch_size = 16
        self.arch = "diffusion"

        self.unet_cfg = UNetConfig(
            in_channels=8, cross_attention_dim=768, num_heads=8
        )
        self.vae_cfg = VAEEncoderConfig()
        self.unet = UNet2DCondition(self.unet_cfg)
        self.vae = VAEEncoder(self.vae_cfg)
        self.alphas_cumprod = jnp.asarray(ddpm_alphas_cumprod())
        self._load()
        self._jit = None

        feat_dims = [1280, 1280, 640, 320]
        multilayers = [0, 1, 2, 3]
        if return_multilayer:
            self.feat_dim = feat_dims
            self.multilayers = multilayers
        else:
            layer = multilayers[-1] if layer == -1 else layer
            self.feat_dim = feat_dims[layer]
            self.multilayers = [layer]
        self.return_multilayer = return_multilayer
        self.layer = "-".join(str(x) for x in self.multilayers)

    def _load(self):
        import torch

        from midvision_probe_tpu.models.sd.convert import (
            convert_unet_ldm,
            convert_vae_encoder_ldm,
        )
        from midvision_probe_tpu.models.zoo import checkpoint_dir

        path = os.path.join(checkpoint_dir(), "zero123", "105000.ckpt")
        cpu = jax.devices("cpu")[0]
        rng = jax.random.PRNGKey(0)
        self.clip_vars = self.clip_proj = self.cc_proj = None
        if os.path.exists(path):
            sd = torch.load(path, map_location="cpu",
                            weights_only=False)["state_dict"]
            self.unet_vars = convert_unet_ldm(sd, self.unet_cfg)
            self.vae_vars = convert_vae_encoder_ldm(sd, self.vae_cfg)
            self._load_conditioning(sd)
        else:
            log.warning("zero123 checkpoint missing under %s — random init",
                        path)
            with jax.default_device(cpu):
                self.unet_vars = self.unet.init(
                    rng, jnp.zeros((1, 8, 8, 8)), jnp.zeros((1,), jnp.int32),
                    jnp.zeros((1, 1, 768)),
                )
                self.vae_vars = self.vae.init(rng, jnp.zeros((1, 64, 64, 3)))

    def _load_conditioning(self, sd) -> None:
        """CLIP image tower + cc_projection from the lightning state_dict
        (reference ``zero123.py:48-56``; FrozenCLIPImageEmbedder holds the
        OpenAI CLIP ViT-L/14 visual under ``cond_stage_model.model.``)."""
        import numpy as np

        from midvision_probe_tpu.models.convert.clip_convert import (
            convert_vit_openclip,
        )
        from midvision_probe_tpu.models.vit import ViT, ViTConfig

        pre = "cond_stage_model.model."
        if f"{pre}visual.proj" not in sd:
            log.warning("zero123 ckpt lacks cond_stage_model — conditioning "
                        "must be passed in")
            return
        # infer tower dims from the weights (ViT-L/14 in the real ckpt)
        conv1 = sd[f"{pre}visual.conv1.weight"]
        width, patch = conv1.shape[0], conv1.shape[-1]
        depth = 1 + max(
            int(k[len(pre):].split(".")[3]) for k in sd
            if k.startswith(f"{pre}visual.transformer.resblocks.")
        )
        self.clip_cfg = ViTConfig(
            patch_size=patch, width=width, depth=depth,
            num_heads=max(width // 64, 1),
            pre_norm=True, patch_bias=False, act="quickgelu",
            layernorm_eps=1e-5, final_norm=True,
        )
        self.clip = ViT(self.clip_cfg)
        self.clip_vars = convert_vit_openclip(
            sd, self.clip_cfg, prefix=f"{pre}visual.")
        from midvision_probe_tpu.models.convert.common import _np as to_np

        self.clip_proj = jnp.asarray(to_np(sd[f"{pre}visual.proj"]))
        self.cc_proj = (
            jnp.asarray(to_np(sd["cc_projection.weight"])).T,
            jnp.asarray(to_np(sd["cc_projection.bias"])),
        )

    def cond_embedding(self, images, T=None) -> jnp.ndarray:
        """images (B, H, W, 3) in [-1, 1] → cc-projected context (B, 1, 768)
        (reference ``zero123.py:48-56``; identity view T = [0, 0, 1, 0])."""
        from midvision_probe_tpu.models.zoo import (
            OPENAI_CLIP_MEAN,
            OPENAI_CLIP_STD,
        )
        from midvision_probe_tpu.ops.image import resize

        assert self.clip_vars is not None, "conditioning weights not loaded"
        # FrozenCLIPImageEmbedder preprocess: bicubic 224 (align_corners,
        # antialias), [-1,1] -> [0,1], CLIP normalize
        x = resize(jnp.asarray(images), (224, 224), mode="bicubic",
                   align_corners=True, antialias=True)
        x = (x + 1.0) / 2.0
        x = (x - jnp.asarray(OPENAI_CLIP_MEAN)) / jnp.asarray(OPENAI_CLIP_STD)
        res = self.clip.apply(self.clip_vars, x,
                              taps=(self.clip_cfg.depth - 1,))
        emb = res["tokens"][0][:, 0] @ self.clip_proj  # ln_post(cls) @ proj
        B = emb.shape[0]
        if T is None:
            T = jnp.asarray([0.0, 0.0, 1.0, 0.0])
        T = jnp.broadcast_to(jnp.asarray(T)[None], (B, 4))
        c = jnp.concatenate([emb, T], axis=-1)[:, None]  # (B, 1, 772)
        w, b = self.cc_proj
        return c @ w + b

    def __call__(self, images, cond_embeds=None, noise_seed=0):
        """images (B, H, W, 3) in [-1, 1]; cond_embeds optional (B, 1, 768)."""
        from midvision_probe_tpu.ops.image import resize

        if self._jit is None:
            # weight trees as traced args — see SDFeaturizer.__call__
            @jax.jit
            def fn(vae_vars, unet_vars, images, ctx, t, key):
                # c_concat = unscaled VAE latents (zero123 encode_first_stage)
                latents = self.vae.apply(vae_vars, images)
                latents = latents / self.vae_cfg.scaling_factor
                # the UNet's primary input is PURE standard-normal noise
                # (zero123.py:75 ``img = torch.randn(shape)`` — the image
                # only enters through the c_concat channels); an earlier
                # revision DDPM-noised the latents here, which at t=1 fed
                # nearly-clean latents instead
                noise = jax.random.normal(key, latents.shape, latents.dtype)
                x = jnp.concatenate([noise, latents], axis=-1)
                # unconditioned branch zeroes BOTH the cross-attention
                # context and the concat latents (zero123.py:64-67)
                x_uc = jnp.concatenate([noise, jnp.zeros_like(latents)],
                                       axis=-1)
                cond = self.unet.apply(unet_vars, x, t, ctx)["up_ft"]
                uncond = self.unet.apply(
                    unet_vars, x_uc, t, jnp.zeros_like(ctx)
                )["up_ft"]
                return [
                    u + self.GUIDANCE_SCALE * (cc - u)
                    for cc, u in zip(cond, uncond)
                ]

            self._jit = fn
        B, H, W, _ = images.shape
        if cond_embeds is not None:
            ctx = jnp.asarray(cond_embeds)
        elif self.clip_vars is not None:
            ctx = self.cond_embedding(images)
        else:
            ctx = jnp.zeros((B, 1, 768))
        t = jnp.full((B,), int(self.time_step), jnp.int32)
        feats = self._jit(self.vae_vars, self.unet_vars,
                          jnp.asarray(images), ctx, t,
                          jax.random.PRNGKey(noise_seed))
        feats = [feats[i] for i in self.multilayers]
        h, w = H // self.patch_size, W // self.patch_size
        if self.output == "dense":
            feats = [resize(f.astype(jnp.float32), (h, w), mode="nearest")
                     for f in feats]
        else:
            feats = [f.mean(axis=(1, 2)) for f in feats]
        return feats[0] if len(feats) == 1 else feats
