"""Training/eval engine.

One shared ``ProbeTrainer`` replaces the reference's three ~800-LoC
near-duplicate drivers (``train_depth.py`` / ``train_snorm.py`` /
``train_generic_objectness.py`` — SURVEY §7): frozen feature extraction,
tap-norms, probe forward/backward, optimizer, validation and checkpointing
are identical across tasks; only the loss/metric adapters differ.
"""

from midvision_probe_tpu.engine.probe_fit import ProbeTrainer, TrainState  # noqa: F401
