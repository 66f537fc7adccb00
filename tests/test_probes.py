"""Probe decoder parity vs literal torch replicas of probes.py structures."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from midvision_probe_tpu.models.probes import (
    DPT,
    BinaryHead,
    DepthHead,
    Linear,
    MultiscaleHead,
    SurfaceNormalHead,
    TapNorms,
)

torch.manual_seed(1)


def _conv_params(m: nn.Conv2d) -> dict:
    out = {"kernel": m.weight.detach().numpy().transpose(2, 3, 1, 0)}
    if m.bias is not None:
        out["bias"] = m.bias.detach().numpy()
    return out


# ---------------------------------------------------------------- DPT ------
class _TorchRCU(nn.Module):
    """probes.py:263-306."""

    def __init__(self, features, kernel_size, is_transformer):
        super().__init__()
        self.is_transformer = is_transformer
        if is_transformer:
            padding = kernel_size // 2
            self.conv = nn.Sequential(
                nn.Conv2d(features, features, kernel_size, padding=padding),
                nn.ReLU(),
                nn.Conv2d(features, features, kernel_size, padding=padding),
                nn.ReLU(),
            )
        else:
            self.conv1 = nn.Conv2d(features, features, 3, 1, 1)
            self.conv2 = nn.Conv2d(features, features, 3, 1, 1)

    def forward(self, x):
        if self.is_transformer:
            return self.conv(x) + x
        # reference inplace ReLU mutates x: the residual is relu(x)
        # (probes.py:291-306; verified in test_reference_oracle.py)
        x = F.relu(x)
        out = self.conv1(x)
        out = F.relu(out)
        out = self.conv2(out)
        return out + x


class _TorchFusion(nn.Module):
    def __init__(self, features, kernel_size, with_skip, is_transformer):
        super().__init__()
        self.with_skip = with_skip
        self.is_transformer = is_transformer
        if with_skip:
            self.resConfUnit1 = _TorchRCU(features, kernel_size, is_transformer)
        self.resConfUnit2 = _TorchRCU(features, kernel_size, is_transformer)

    def forward(self, x, skip_x=None):
        if skip_x is not None and self.with_skip:
            x = self.resConfUnit1(x) + skip_x
        x = self.resConfUnit2(x)
        if not self.is_transformer:
            x = F.interpolate(x, scale_factor=2, mode="bilinear",
                              align_corners=True)
        return x


class _TorchDPT(nn.Module):
    """probes.py:309-399."""

    def __init__(self, input_dims, output_dim, hidden_dim, kernel_size):
        super().__init__()
        self.resnet = not isinstance(input_dims[0], int)
        if self.resnet:
            for i in range(4):
                setattr(self, f"conv_{i}",
                        nn.Conv2d(input_dims[i][0], hidden_dim, 3, 1, 1,
                                  bias=False))
        else:
            for i in range(4):
                setattr(self, f"conv_{i}", nn.Conv2d(input_dims[i], hidden_dim, 1))
        for i in range(4):
            setattr(self, f"ref_{i}",
                    _TorchFusion(hidden_dim, kernel_size,
                                 with_skip=(i != 3),
                                 is_transformer=not self.resnet))
        self.out_conv = nn.Sequential(
            nn.Conv2d(hidden_dim, hidden_dim, 3, padding=1),
            nn.ReLU(),
            nn.Conv2d(hidden_dim, output_dim, 3, padding=1),
        )

    def forward(self, feats):
        feats = [getattr(self, f"conv_{i}")(feats[i]) for i in range(4)]
        if not self.resnet:
            feats = [F.interpolate(x, scale_factor=2) for x in feats]
        out = self.ref_3(feats[3], None)
        out = self.ref_2(feats[2], out)
        out = self.ref_1(feats[1], out)
        out = self.ref_0(feats[0], out)
        if not self.resnet:
            out = F.interpolate(out, scale_factor=4)
        out = self.out_conv(out)
        return F.interpolate(out, scale_factor=2)


def _rcu_params(m: _TorchRCU) -> dict:
    if m.is_transformer:
        return {"conv1": _conv_params(m.conv[0]), "conv2": _conv_params(m.conv[2])}
    return {"conv1": _conv_params(m.conv1), "conv2": _conv_params(m.conv2)}


def _dpt_params(t: _TorchDPT) -> dict:
    p = {}
    for i in range(4):
        p[f"conv_{i}"] = _conv_params(getattr(t, f"conv_{i}"))
        ref = getattr(t, f"ref_{i}")
        rp = {"resConfUnit2": _rcu_params(ref.resConfUnit2)}
        if ref.with_skip:
            rp["resConfUnit1"] = _rcu_params(ref.resConfUnit1)
        p[f"ref_{i}"] = rp
    p["out_conv_0"] = _conv_params(t.out_conv[0])
    p["out_conv_1"] = _conv_params(t.out_conv[2])
    return {"params": p}


def test_dpt_vit_branch_matches_torch(rng):
    dims = [24, 24, 24, 24]
    t = _TorchDPT(dims, output_dim=5, hidden_dim=32, kernel_size=3).eval()
    feats_t = [torch.from_numpy(rng.randn(2, 24, 7, 9).astype(np.float32))
               for _ in range(4)]
    with torch.no_grad():
        ref = t(list(feats_t)).numpy()

    model = DPT(output_dim=5, hidden_dim=32, kernel_size=3, resnet_mode=False)
    feats_j = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in feats_t]
    got = model.apply(_dpt_params(t), feats_j)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-4, rtol=1e-3
    )


def test_dpt_resnet_branch_matches_torch(rng):
    dims = [(16, 0), (24, 0), (32, 0), (48, 0)]
    t = _TorchDPT(dims, output_dim=1, hidden_dim=32, kernel_size=3).eval()
    shapes = [(2, 16, 32, 32), (2, 24, 16, 16), (2, 32, 8, 8), (2, 48, 4, 4)]
    feats_t = [torch.from_numpy(rng.randn(*s).astype(np.float32)) for s in shapes]
    with torch.no_grad():
        ref = t(list(feats_t)).numpy()

    model = DPT(output_dim=1, hidden_dim=32, kernel_size=3, resnet_mode=True)
    feats_j = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in feats_t]
    got = model.apply(_dpt_params(t), feats_j)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-4, rtol=1e-3
    )


# ------------------------------------------------------- MultiscaleHead ----
class _TorchMultiscale(nn.Module):
    """probes.py:435-458 (make_conv expansion)."""

    def __init__(self, input_dims, output_dim, hidden_dim, k):
        super().__init__()
        self.convs = nn.ModuleList(
            [nn.Conv2d(d, hidden_dim, k) for d in input_dims]
        )
        interm = len(input_dims) * hidden_dim
        self.conv_mid = nn.Sequential(
            nn.Conv2d(interm, hidden_dim, k), nn.ReLU(),
            nn.Conv2d(hidden_dim, hidden_dim, k), nn.ReLU(),
            nn.Conv2d(hidden_dim, hidden_dim, k),
        )
        self.conv_out = nn.Sequential(
            nn.Conv2d(hidden_dim, hidden_dim, k), nn.ReLU(),
            nn.Conv2d(hidden_dim, output_dim, k),
        )

    def forward(self, feats):
        feats = [self.convs[i](f) for i, f in enumerate(feats)]
        h, w = feats[-1].shape[-2:]
        feats = [F.interpolate(f, (h, w), mode="bilinear") for f in feats]
        feats = torch.cat(feats, dim=1).relu()
        feats = F.interpolate(feats, scale_factor=2, mode="bilinear")
        feats = self.conv_mid(feats).relu()
        feats = F.interpolate(feats, scale_factor=4, mode="bilinear")
        return self.conv_out(feats)


def test_multiscale_head_matches_torch(rng):
    dims = [12, 12, 12, 12]
    t = _TorchMultiscale(dims, output_dim=3, hidden_dim=16, k=1).eval()
    feats_t = [torch.from_numpy(rng.randn(1, 12, 6, 8).astype(np.float32))
               for _ in range(4)]
    with torch.no_grad():
        ref = t(list(feats_t)).numpy()

    p = {}
    for i, c in enumerate(t.convs):
        p[f"convs_{i}"] = _conv_params(c)
    p["conv_mid_0"] = _conv_params(t.conv_mid[0])
    p["conv_mid_1"] = _conv_params(t.conv_mid[2])
    p["conv_mid_2"] = _conv_params(t.conv_mid[4])
    p["conv_out_0"] = _conv_params(t.conv_out[0])
    p["conv_out_1"] = _conv_params(t.conv_out[2])

    model = MultiscaleHead(output_dim=3, hidden_dim=16, kernel_size=1)
    feats_j = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in feats_t]
    got = model.apply({"params": p}, feats_j)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-4, rtol=1e-3
    )


def test_linear_head_matches_torch(rng):
    t = nn.Conv2d(24, 2, 3, padding=1).eval()
    feats = [rng.randn(1, 12, 5, 5).astype(np.float32) for _ in range(2)]
    with torch.no_grad():
        cat = torch.cat([torch.from_numpy(f) for f in feats], 1)
        up = F.interpolate(cat, scale_factor=4, mode="bilinear")
        ref = t(up).numpy()
    model = Linear(output_dim=2, kernel_size=3)
    got = model.apply(
        {"params": {"conv": _conv_params(t)}},
        [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats],
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref, atol=1e-5, rtol=1e-4
    )


# ------------------------------------------------------------- heads -------
def test_depth_head_bindepth_range(rng):
    import jax

    head = DepthHead(feat_dim=[8] * 4, head_type="linear", min_depth=0.001,
                     max_depth=10, prediction_type="bindepth", kernel_size=1)
    feats = [jnp.asarray(rng.randn(1, 4, 4, 8).astype(np.float32))
             for _ in range(4)]
    v = head.init(jax.random.PRNGKey(0), feats)
    out = head.apply(v, feats)
    assert out.shape == (1, 16, 16, 1)
    assert float(out.min()) >= 0.001 and float(out.max()) <= 10.0


def test_surface_normal_head_channels(rng):
    import jax

    for ua, ch in [(False, 3), (True, 4)]:
        head = SurfaceNormalHead(feat_dim=[8] * 4, head_type="multiscale",
                                 uncertainty_aware=ua, hidden_dim=16)
        feats = [jnp.asarray(rng.randn(1, 4, 4, 8).astype(np.float32))
                 for _ in range(4)]
        v = head.init(jax.random.PRNGKey(0), feats)
        out = head.apply(v, feats)
        assert out.shape[-1] == ch


def test_binary_head_sigmoid_and_batchnorm(rng):
    import jax

    head = BinaryHead(feat_dim=[8] * 4, head_type="linear", output_dim=1,
                      pred_type="sigmoid")
    feats = [jnp.asarray(rng.randn(4, 4, 4, 8).astype(np.float32))
             for _ in range(4)]
    v = head.init(jax.random.PRNGKey(0), feats, train=True)
    assert "batch_stats" in v
    out, updates = head.apply(v, feats, train=True, mutable=["batch_stats"])
    assert float(out.min()) >= 0 and float(out.max()) <= 1


def test_tap_norms_train_and_eval(rng):
    import jax

    tn = TapNorms(num_taps=2)
    feats = [jnp.asarray(rng.randn(4, 6, 6, 8).astype(np.float32))
             for _ in range(2)]
    v = tn.init(jax.random.PRNGKey(0), feats, train=True)
    out, upd = tn.apply(v, feats, train=True, mutable=["batch_stats"])
    # train mode: per-channel batch-normalized
    m = np.asarray(out[0]).mean(axis=(0, 1, 2))
    np.testing.assert_allclose(m, 0, atol=1e-4)
    out_eval = tn.apply(v, feats, train=False)
    assert out_eval[0].shape == feats[0].shape


def test_dpt_bf16_close_to_f32(rng):
    """system.probe_dtype=bfloat16 (mixed precision) must stay close to the
    f32 DPT prediction — the fast-suite lever's accuracy check."""
    import jax
    import jax.numpy as jnp

    from midvision_probe_tpu.models.probes import DepthHead

    feats = [jnp.asarray(rng.randn(2, 8, 8, 48).astype(np.float32))
             for _ in range(4)]
    kw = dict(feat_dim=[48] * 4, head_type="dpt",
              prediction_type="bindepth", hidden_dim=32, kernel_size=3)
    head32 = DepthHead(dtype=jnp.float32, **kw)
    head16 = DepthHead(dtype=jnp.bfloat16, **kw)
    variables = head32.init(jax.random.PRNGKey(0), feats)
    p32 = np.asarray(head32.apply(variables, feats))
    p16 = np.asarray(head16.apply(variables, feats))  # same f32 params
    # depth range ~[0, 10]; bf16 compute should agree to ~cm level
    assert np.abs(p32 - p16).max() < 0.15
    assert np.abs(p32 - p16).mean() < 0.02


def test_depth_head_dpt_defer_resize_is_exact(rng):
    """DepthHead defers the DPT decoder's trailing nearest 2x until after
    the per-pixel depth reduction (binning/sigmoid commutes exactly with
    nearest duplication). Must be bit-identical to the reference order:
    decode at full channels -> resize -> reduce."""
    import jax

    from midvision_probe_tpu.models.probes import make_decoder
    from midvision_probe_tpu.ops.image import resize as _resize

    for pred in ("bindepth", "sigdepth"):
        head = DepthHead(feat_dim=[16] * 4, head_type="dpt", hidden_dim=32,
                         prediction_type=pred, kernel_size=3)
        feats = [jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
                 for _ in range(4)]
        v = head.init(jax.random.PRNGKey(0), feats)
        got = head.apply(v, feats)

        # reference order on the SAME decoder params: full-res 256ch resize
        # first, then the per-pixel reduction
        output_dim = 256 if pred == "bindepth" else 1
        dec = make_decoder("dpt", [16] * 4, output_dim, 32, 3,
                           final_resize=True)
        x = dec.apply({"params": v["params"]["DPT_0"]}, feats)
        if pred == "bindepth":
            bins = jnp.linspace(0.001, 10.0, 256)
            prob = jax.nn.relu(x) + 0.1
            prob = prob / prob.sum(axis=-1, keepdims=True)
            ref = jnp.einsum("bhwk,k->bhw", prob, bins)[..., None]
        else:
            ref = 0.001 + jax.nn.sigmoid(x) * (10.0 - 0.001)
        assert got.shape == ref.shape
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_linear_head_hetero_grid_taps(rng):
    """CNN stage taps arrive at different grids (480² resnet:
    120²/60²/30²/15²); Linear must resize every tap to the LAST tap's grid
    (MultiscaleHead semantics, reference probes.py:446-449) before the
    channel concat instead of crashing (suite r5: every resnet depth/snorm
    cell). Param tree must stay the single reference 'conv'."""
    import jax
    import jax.numpy as jnp

    from midvision_probe_tpu.models.probes import Linear

    taps = [jnp.asarray(rng.randn(2, hw, hw, c).astype(np.float32))
            for hw, c in ((16, 8), (8, 12), (4, 16), (2, 24))]
    probe = Linear(output_dim=1)
    params = probe.init(jax.random.PRNGKey(0), taps)
    out = probe.apply(params, taps)
    assert out.shape == (2, 8, 8, 1)  # last grid 2x2, 4x upsample
    leaf_paths = ["/".join(str(k) for k in p) for p, _ in
                  jax.tree_util.tree_flatten_with_path(params)[0]]
    assert all("conv" in p for p in leaf_paths), leaf_paths
    # kernel input dim = channel sum of all taps
    assert params["params"]["conv"]["kernel"].shape[-2] == 8 + 12 + 16 + 24
    # same-grid taps keep the exact old path (no resize): compare against
    # a manual concat
    same = [jnp.asarray(rng.randn(2, 4, 4, c).astype(np.float32))
            for c in (8, 12)]
    p2 = probe.init(jax.random.PRNGKey(1), same)
    np.testing.assert_allclose(
        np.asarray(probe.apply(p2, same)),
        np.asarray(probe.apply(p2, jnp.concatenate(same, -1))),
        rtol=1e-6, atol=1e-6)
