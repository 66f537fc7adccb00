"""scan_blocks=True must be numerically identical to the unrolled loop.

The scan mode exists to shrink ViT-L+ HLO ~depth-fold (one lax.scan body
instead of `depth` unrolled block copies) so large programs fit through
remote-compile tunnels; it must not change the math or the tap protocol
(reference capture loop: dino.py:181-195).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from midvision_probe_tpu.models.vit import (
    ViT,
    ViTConfig,
    stack_block_variables,
)

CFGS = {
    "plain": dict(),
    "layerscale": dict(layerscale=True, num_register_tokens=2),
    "rope": dict(rope=True, pos_embed="none", class_token=False),
    "finalnorm": dict(final_norm=True, pos_embed="sincos2d"),
    # BEiT family (beitv2/midas_l16): per-block relative position bias
    # tables + LayerScale, no absolute pos embed
    "beit": dict(rel_pos_bias=True, layerscale=True, pos_embed="none"),
}


@pytest.mark.parametrize("variant", sorted(CFGS))
def test_scan_matches_loop(variant):
    base = ViTConfig(patch_size=8, width=64, depth=4, num_heads=2,
                     **CFGS[variant])
    scan = dataclasses.replace(base, scan_blocks=True)
    taps = (1, 3)

    img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 24, 3))
    variables = jax.jit(ViT(base).init,
                        static_argnums=2)(jax.random.PRNGKey(0), img, taps)
    out_loop = ViT(base).apply(variables, img, taps=taps)

    stacked = stack_block_variables(variables, base.depth)
    out_scan = ViT(scan).apply(stacked, img, taps=taps)

    assert out_scan["grid_hw"] == out_loop["grid_hw"]
    for a, b in zip(out_loop["tokens"], out_scan["tokens"]):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_zoo_scan_auto(monkeypatch):
    """Unset env = auto (deep models scan on the axon tunnel only);
    MVP_SCAN_BLOCKS forces either way. The tunnel's backend reports
    itself as plain "tpu", so detection keys on the platform SELECTION —
    the jax_platforms CONFIG first (authoritative: a script that
    programmatically moves to CPU updates it without scrubbing the env
    var), then the JAX_PLATFORMS env var."""
    from midvision_probe_tpu.models import zoo

    def decide(depth, platforms):
        # conftest pins config to "cpu"; emulate the production selection
        jax.config.update("jax_platforms", platforms)
        try:
            return zoo._use_scan_blocks(depth)
        finally:
            jax.config.update("jax_platforms", "cpu")

    monkeypatch.delenv("MVP_SCAN_BLOCKS", raising=False)
    assert not decide(24, "cpu")
    assert decide(24, "axon,cpu")      # the boot shim's actual selection
    assert not decide(12, "axon,cpu")  # ViT-B stays unrolled
    # config wins over a stale env var (programmatic switch to CPU)
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert not decide(24, "cpu")
    # env is the fallback when the config is unset
    monkeypatch.setattr(type(jax.config), "jax_platforms", None,
                        raising=False)
    assert zoo._use_scan_blocks(24)
    monkeypatch.setenv("MVP_SCAN_BLOCKS", "0")
    assert not zoo._use_scan_blocks(24)
    monkeypatch.setenv("MVP_SCAN_BLOCKS", "1")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert zoo._use_scan_blocks(12)


def test_scan_init_shapes():
    """Random init in scan mode creates the stacked layout directly (and
    per-layer weights differ — split_rngs)."""
    cfg = ViTConfig(patch_size=8, width=64, depth=3, num_heads=2,
                    scan_blocks=True)
    img = jnp.zeros((1, 16, 16, 3))
    variables = ViT(cfg).init(jax.random.PRNGKey(0), img, taps=(2,))
    blk = variables["params"]["blocks_scan"]["block"]
    w = np.asarray(blk["attn"]["qkv"]["kernel"])
    assert w.shape == (3, 64, 192)
    assert not np.allclose(w[0], w[1])


def test_scan_taps_before_last_layer():
    """max_tap < depth-1: layers after the last tap must NOT clobber the
    final slot of the tap buffer (the _TapBlock write-guard branch)."""
    base = ViTConfig(patch_size=8, width=64, depth=4, num_heads=2)
    scan = dataclasses.replace(base, scan_blocks=True)
    taps = (0, 2)

    img = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 24, 3))
    # init with a full-depth tap so all 4 blocks' params exist (the
    # unrolled loop early-exits at max_tap)
    variables = jax.jit(ViT(base).init, static_argnums=2)(
        jax.random.PRNGKey(0), img, (0, 2, 3))
    out_loop = ViT(base).apply(variables, img, taps=taps)
    stacked = stack_block_variables(variables, base.depth)
    out_scan = ViT(scan).apply(stacked, img, taps=taps)
    for a, b in zip(out_loop["tokens"], out_scan["tokens"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_extract_kqv_scan_mode(monkeypatch):
    """extract_kqv must work in scan mode (sown intermediates live under
    blocks_scan/block with a stacked depth axis) and match the unrolled
    path exactly."""
    from midvision_probe_tpu.models import zoo

    img = np.asarray(
        jax.random.normal(jax.random.PRNGKey(5), (1, 32, 32, 3)))
    monkeypatch.setenv("MVP_SCAN_BLOCKS", "0")
    unrolled = zoo.build_vit_extractor("test_tiny_vit", output="dense",
                                       init_size=32)
    monkeypatch.setenv("MVP_SCAN_BLOCKS", "1")
    scanned = zoo.build_vit_extractor("test_tiny_vit", output="dense",
                                      init_size=32)
    from midvision_probe_tpu.models.vit import stack_block_variables
    scanned.variables = stack_block_variables(
        unrolled.variables, unrolled.spec.num_layers)
    out_u = np.asarray(unrolled.extract_kqv(img, mode="kqv"))
    out_s = np.asarray(scanned.extract_kqv(img, mode="kqv"))
    np.testing.assert_allclose(out_u, out_s, rtol=2e-5, atol=2e-5)


def test_scan_mode_shards_over_mesh():
    """Scan mode must compose with SPMD: batch sharded over 'data', stacked
    (depth-leading) params replicated, on the virtual 8-device mesh."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg = ViTConfig(patch_size=8, width=64, depth=24, num_heads=2,
                    scan_blocks=True)
    img = jax.random.normal(jax.random.PRNGKey(7), (8, 32, 32, 3))
    variables = ViT(cfg).init(jax.random.PRNGKey(0), img, taps=(5, 23))

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    batch_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    v_sh = jax.device_put(variables, repl)
    img_sh = jax.device_put(img, batch_sh)

    @jax.jit
    def fwd(v, x):
        return ViT(cfg).apply(v, x, taps=(5, 23))["tokens"][-1]

    out = fwd(v_sh, img_sh)
    ref = fwd(variables, img)
    assert out.sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_scan_stops_at_max_tap():
    """Scan mode mirrors the unrolled path's early break: probing layer k
    runs k+1 blocks, not cfg.depth (2.7x wasted backbone compute for
    layer=11 on a depth-32 ViT otherwise). Checked on the jaxpr: the block
    scan's length must be max_tap+1."""
    scan = ViTConfig(patch_size=8, width=64, depth=4, num_heads=2,
                     scan_blocks=True)
    img = jax.random.normal(jax.random.PRNGKey(3), (1, 32, 24, 3))
    variables = jax.jit(ViT(scan).init, static_argnums=2)(
        jax.random.PRNGKey(0), img, (0, 1, 2, 3))
    # init keeps the full-depth stacked layout (checkpoint compatibility)
    stacked = variables["params"]["blocks_scan"]["block"]
    leaf = jax.tree_util.tree_leaves(stacked)[0]
    assert leaf.shape[0] == 4

    def scan_lengths(taps):
        jaxpr = jax.make_jaxpr(
            lambda v, x: ViT(scan).apply(v, x, taps=taps))(variables, img)
        return [e.params["length"] for e in jaxpr.jaxpr.eqns
                if e.primitive.name == "scan"]

    assert scan_lengths((0, 1))[0] == 2
    assert scan_lengths((0, 1, 2, 3))[0] == 4
    # and the truncated scan still matches the full one on shared taps
    out_part = ViT(scan).apply(variables, img, taps=(1,))
    out_full = ViT(scan).apply(variables, img, taps=(1, 3))
    np.testing.assert_allclose(np.asarray(out_part["tokens"][0]),
                               np.asarray(out_full["tokens"][0]),
                               rtol=1e-6, atol=1e-6)
