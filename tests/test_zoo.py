"""Feature-contract tests for the backbone zoo (reference template dino.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from midvision_probe_tpu.models import zoo


def test_vit_extractor_dense_contract(rng):
    m = zoo.DINO(dino_name="dino", model_name="vitb16", output="dense")
    assert m.patch_size == 16
    assert m.feat_dim == 768
    assert m.multilayers == [11]
    assert m.layer == "11"
    assert m.arch == "vit"
    x = jnp.asarray(rng.randn(2, 112, 112, 3).astype(np.float32))
    out = m(x)
    assert out.shape == (2, 7, 7, 768)


def test_vit_extractor_multilayer_dense_cls(rng):
    m = zoo.DINO(output="dense-cls", return_multilayer=True)
    assert m.feat_dim == [1536] * 4
    assert m.multilayers == [2, 5, 8, 11]
    x = jnp.asarray(rng.randn(1, 112, 112, 3).astype(np.float32))
    outs = m(x)
    assert isinstance(outs, list) and len(outs) == 4
    for o in outs:
        assert o.shape == (1, 7, 7, 1536)


def test_vit_extractor_return_cls(rng):
    m = zoo.DINO(output="dense", return_cls=True)
    x = jnp.asarray(rng.randn(2, 112, 112, 3).astype(np.float32))
    out = m(x)
    assert out.shape == (2, 768)


def test_resnet_extractor_contract(rng):
    m = zoo.SIMCLR(arch="resnet50", return_layers=[1, 2, 3, 4],
                   return_multilayer=True)
    assert m.feat_dim == [(256, 120), (512, 60), (1024, 30), (2048, 15)]
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    outs = m(x)
    assert len(outs) == 4
    assert outs[0].shape == (1, 16, 16, 256)
    assert outs[3].shape == (1, 2, 2, 2048)


def test_registry_covers_reference_zoo():
    names = set(zoo.ZOO)
    # the 17-model R50 zoo (SURVEY §2.2)
    for n in ["simclr", "mocov2", "simsiam", "byol", "barlowtwins", "densecl",
              "swav", "selav2", "deepclusterv2", "clusterfit", "npid",
              "npid_plusplus", "pirl", "jigsaw", "rotnet", "mocov3", "dino"]:
        assert f"{n}_resnet50" in names, n
    for n in ["dino_vitb16", "dinov2_vitb14", "dinov2_vitb14_reg",
              "dinov2_vitl14", "mae_vitb16", "ibot_vitb16", "mocov3_vitb16",
              "maskfeat_vitb16", "milan_vitb16", "eva_vitb16", "pixmim_vitb16",
              "deit3_vitb16", "deit3_vitl16", "beitv2_vitb16"]:
        assert n in names, n


def test_instantiate_backbone_from_config():
    from midvision_probe_tpu.config import compose, instantiate

    cfg = compose("depth_training")
    model = instantiate(cfg.backbone)
    assert model.checkpoint_name == "dino_vitb16"
    assert model.output == "dense"


@pytest.mark.parametrize("name", ["dinov2_vitb14_reg"])
def test_register_tokens_ignored_in_spatial(rng, name):
    m = zoo.build_vit_extractor(name, output="dense", init_size=112)
    x = jnp.asarray(rng.randn(1, 112, 112, 3).astype(np.float32))
    out = m(x)
    assert out.shape == (1, 8, 8, 768)


def test_extract_kqv(rng):
    import jax.numpy as jnp

    m = zoo.build_vit_extractor("test_tiny_vit", output="dense", init_size=64)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    k = m.extract_kqv(x, mode="k")
    assert k.shape == (1, 8, 8, 32)
    kqv = m.extract_kqv(x, mode="kqv")
    assert kqv.shape == (1, 8, 8, 96)


def test_beit_fixed_input_resize():
    """Rel-pos-bias models force-resize inputs like the reference
    (beit_v2.py:255-257 resizes everything to 224 bilinear): a 256x320
    input must produce 14x14 features identical to a manually resized
    224x224 forward."""
    import numpy as np

    from midvision_probe_tpu.models import zoo
    from midvision_probe_tpu.ops.image import resize

    bb = zoo.build_vit_extractor("beitv2_vitb16", output="dense",
                                 return_multilayer=True, init_size=224)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, 256, 320, 3).astype(np.float32))
    maps, _ = bb._apply_fn(bb.variables, images)
    assert all(m.shape == (1, 14, 14, 768) for m in maps)

    manual = resize(images, (224, 224), mode="bilinear", align_corners=False)
    maps2, _ = bb._apply_fn(bb.variables, manual)
    np.testing.assert_allclose(np.asarray(maps[-1]), np.asarray(maps2[-1]),
                               atol=1e-6)


def test_extract_kqv_fixed_input():
    """extract_kqv must mirror the forward path's fixed-input resize —
    rel-pos-bias backbones (BEiT family) only run at their fixed grid."""
    import numpy as np

    from midvision_probe_tpu.models import zoo

    bb = zoo.build_vit_extractor("beitv2_vitb16", output="dense",
                                 return_multilayer=True, init_size=224)
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.rand(1, 256, 320, 3).astype(np.float32))
    kqv = bb.extract_kqv(images, mode="k")
    assert kqv.shape == (1, 14, 14, 768)
