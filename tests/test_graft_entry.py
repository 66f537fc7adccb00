"""Protect the driver integration points: entry() compiles, multichip
dry-run executes dp+tp shardings on the virtual mesh."""

import jax
import jax.numpy as jnp


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises on failure


def test_entry_compiles_small():
    """entry() returns (fn, args); compile-check a reduced-size analog (the
    full ViT-B 480x640 compile is exercised on real hardware by the
    driver/bench)."""
    from midvision_probe_tpu.models import zoo

    bb = zoo.build_vit_extractor("test_tiny_vit", output="dense",
                                 return_multilayer=True, init_size=64)

    @jax.jit
    def fwd(im):
        maps, _ = bb._apply_fn(bb.variables, im)
        return [m.astype(jnp.float32) for m in maps]

    out = fwd(jnp.zeros((2, 64, 64, 3)))
    assert len(out) == 4 and out[0].shape == (2, 8, 8, 32)

    # the real entry() is importable and returns the right structure
    import __graft_entry__ as g

    assert callable(g.entry)
