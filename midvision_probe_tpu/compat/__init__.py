"""Compatibility shims: the reference's ``evals.*`` import paths.

The original hydra configs name torch classes like
``evals.models.dino.DINO`` (``configs/backbone/dino_b16.yaml:1``). The
config layer rewrites ``evals.X`` → ``midvision_probe_tpu.compat.X``
(``config/core.py``), and this package materializes those module paths so
the reference YAML files work verbatim against the TPU implementations.
"""

from __future__ import annotations

import sys
import types

from midvision_probe_tpu.models import probes as _probes
from midvision_probe_tpu.models import zoo as _zoo
from midvision_probe_tpu.models.maskcut import MaskCutProcessor as _MaskCut
from midvision_probe_tpu.datasets import nyu as _nyu
from midvision_probe_tpu.datasets import navi as _navi
from midvision_probe_tpu.datasets import spair as _spair
from midvision_probe_tpu.datasets import scannet_pairs as _scannet
from midvision_probe_tpu.datasets import taskonomy as _taskonomy
from midvision_probe_tpu.datasets import twoafc as _twoafc
from midvision_probe_tpu.datasets import voc as _voc

_MODULES = {
    "models.dino": {"DINO": _zoo.DINO},
    "models.dino_res50": {"DINO_RESNET": _zoo.DINO_RESNET},
    "models.mae": {"MAE": _zoo.MAE},
    "models.ibot": {"iBOT": _zoo.iBOT},
    "models.mocov3": {"MoCoV3": _zoo.MoCoV3},
    "models.mocov3_res50": {"MoCoV3_RES": _zoo.MoCoV3_RES},
    "models.maskfeat": {"MASKFEAT": _zoo.MASKFEAT},
    "models.milan": {"MILAN": _zoo.MILAN},
    "models.eva": {"EVA": _zoo.EVA},
    "models.pixmlm": {"PIXMLM": _zoo.PIXMLM},
    "models.beit_v2": {"BEiTV2": _zoo.BEiTV2},
    "models.deit": {"DeIT": _zoo.DeIT},
    "models.clip": {"CLIP": _zoo.CLIP},
    "models.siglip": {"SigLIP": _zoo.SigLIP},
    "models.sam": {"SAM": _zoo.SAM},
    "models.convnext": {"ConvNext": _zoo.ConvNext},
    "models.croco": {"CROCO": _zoo.CROCO},
    "models.midas_final": {"make_beit_backbone": _zoo.make_beit_backbone},
    "models.radio": {"RADIO": _zoo.RADIO},
    "models.stablediffusion": {"DIFT": _zoo.DIFT},
    "models.zero123": {"Zero123": _zoo.Zero123},
    "models.crocov2": {"CROCOV2": _zoo.CROCOV2},
    "models.simclr": {"SIMCLR": _zoo.SIMCLR},
    "models.mocov2": {"MOCOV2": _zoo.MOCOV2},
    "models.simsiam": {"SIMSIAM": _zoo.SIMSIAM},
    "models.byol": {"BYOL": _zoo.BYOL},
    "models.barlowtwins": {"BARLOWTWINS": _zoo.BARLOWTWINS},
    "models.densecl": {"DENSECL": _zoo.DENSECL},
    "models.swav": {"SWAV": _zoo.SWAV},
    "models.selav2": {"SELAV2": _zoo.SELAV2},
    "models.deepclusterv2": {"DEEPCLUSTERV2": _zoo.DEEPCLUSTERV2},
    "models.clusterfit": {"CLUSTERFIT": _zoo.CLUSTERFIT},
    "models.npid": {"NPID": _zoo.NPID},
    "models.npid-plusplus": {"NPID_PLUSPLUS": _zoo.NPID_PLUSPLUS},
    "models.pirl": {"PIRL": _zoo.PIRL},
    "models.jigsaw": {"JIGSAW": _zoo.JIGSAW},
    "models.rotnet": {"ROTNET": _zoo.ROTNET},
    "models.probes": {
        "DepthHead": _probes.DepthHead,
        "SurfaceNormalHead": _probes.SurfaceNormalHead,
        "BinaryHead": _probes.BinaryHead,
        "TaskonomyHead": _probes.TaskonomyHead,
    },
    "models.maskcut_processor": {"MaskCutProcessor": _MaskCut},
    "datasets.nyu": {"NYU": _nyu.NYU},
    "datasets.navi": {"NAVI": _navi.NAVI},
    "datasets.spair": {"SPairDataset": _spair.SPairDataset},
    "datasets.scannet_pairs": {
        "ScanNetPairsDataset": _scannet.ScanNetPairsDataset
    },
    "datasets.taskonomy": {"Taskonomy": _taskonomy.Taskonomy},
    "datasets.twoafcdataset": {"TwoAFCDataset": _twoafc.TwoAFCDataset},
    "datasets.voc": {"VOC": _voc.VOC},
}

_PKG = __name__
for _path, _attrs in _MODULES.items():
    parts = _path.split(".")
    # ensure intermediate packages exist
    for depth in range(1, len(parts)):
        pkg_name = f"{_PKG}." + ".".join(parts[:depth])
        if pkg_name not in sys.modules:
            sys.modules[pkg_name] = types.ModuleType(pkg_name)
    mod_name = f"{_PKG}.{_path}"
    mod = types.ModuleType(mod_name)
    for attr, obj in _attrs.items():
        setattr(mod, attr, obj)
    sys.modules[mod_name] = mod
