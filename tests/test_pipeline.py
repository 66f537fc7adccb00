"""GPipe-style pipeline runner vs sequential execution (exact equality)."""

import jax
import jax.numpy as jnp
import numpy as np

from midvision_probe_tpu.parallel.mesh import make_mesh
from midvision_probe_tpu.parallel.pipeline import (
    pipeline_apply,
    stage_params_sharding,
)


def _stage_fn(params, x):
    # toy residual stage: x + tanh(x @ W + b)
    return x + jnp.tanh(x @ params["w"] + params["b"])


def _sequential(stacked, x):
    for s in range(stacked["w"].shape[0]):
        x = _stage_fn({"w": stacked["w"][s], "b": stacked["b"][s]}, x)
    return x


def test_pipeline_matches_sequential(rng):
    n_stages, d = 4, 16
    mesh = make_mesh(model_axis=n_stages)  # (data=2, model=4) on 8 CPUs
    stacked = {
        "w": jnp.asarray(rng.randn(n_stages, d, d).astype(np.float32) * 0.3),
        "b": jnp.asarray(rng.randn(n_stages, d).astype(np.float32) * 0.1),
    }
    x = jnp.asarray(rng.randn(8, d).astype(np.float32))

    ref = _sequential(stacked, x)
    sharded = jax.device_put(stacked, stage_params_sharding(mesh))
    for n_micro in (4, 8):
        got = pipeline_apply(_stage_fn, sharded, x, mesh, n_micro=n_micro)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_pipeline_under_jit(rng):
    n_stages, d = 2, 8
    mesh = make_mesh(model_axis=n_stages)
    stacked = {
        "w": jnp.asarray(rng.randn(n_stages, d, d).astype(np.float32) * 0.3),
        "b": jnp.zeros((n_stages, d), jnp.float32),
    }
    x = jnp.asarray(rng.randn(4, d).astype(np.float32))
    fn = jax.jit(lambda p, x: pipeline_apply(_stage_fn, p, x, mesh,
                                             n_micro=2))
    got = fn(jax.device_put(stacked, stage_params_sharding(mesh)), x)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_sequential(stacked, x)),
                               atol=1e-5, rtol=1e-5)
