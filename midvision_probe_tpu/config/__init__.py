"""Hydra-compatible config layer (no hydra dependency).

The reference builds every component with hydra 1.x + OmegaConf
(``configs/depth_training.yaml:9-14``, ``train_depth.py:564-567``,
``@hydra.main`` at ``train_depth.py:849``). hydra is not available in this
environment, so this module re-implements the subset the framework needs:

* YAML experiment configs with a ``defaults:`` list of config groups
  (``optimizer: ten_epoch`` resolves ``configs/optimizer/ten_epoch.yaml``
  into ``cfg.optimizer``),
* dotlist CLI overrides ``key.sub=value`` and ``+key=value`` (append),
  including group swaps ``backbone=dino_b16``,
* ``${a.b}`` interpolation,
* ``instantiate(cfg, **extra)`` keyed on ``_target_`` strings, with a
  compatibility alias table so the reference's ``evals.models.*`` targets
  resolve to this package's classes,
* an ``@main(config_name=...)`` driver decorator replacing ``@hydra.main``.
"""

from midvision_probe_tpu.config.core import (  # noqa: F401
    Config,
    compose,
    instantiate,
    main,
    to_dict,
)
