"""A REAL 2-process ``jax.distributed`` run (VERDICT r2 #4).

Two CPU subprocesses (4 virtual devices each) rendezvous on a local
coordinator, assemble a global batch with
``multihost.make_global_batch`` (``jax.make_array_from_process_local_data``
path — unreachable in single-process tests), and take two SGD steps whose
gradient all-reduce crosses the process boundary. The losses must equal the
single-process full-batch values exactly — the reference analog is DDP's
bucketed gradient all-reduce (``/root/reference/train_depth.py:64-73``).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_matches_single_process(tmp_path):
    port = _free_port()
    out = tmp_path / "rank0.json"
    worker = os.path.join(os.path.dirname(__file__), "_worker_2proc.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(r), str(port), str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for r in (0, 1)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=540)
        logs.append(stdout.decode())
    assert all(p.returncode == 0 for p in procs), "\n---\n".join(logs)

    result = json.loads(out.read_text())
    assert result["process_count"] == 2

    # gather_rows merged both hosts' UNEVEN row lists in process order
    # (rank 0: 3 rows, rank 1: 2 rows) — the objectness validation path
    assert result["rows_f"] == [0.0, 1.0, 2.0, 10.0, 11.0]
    np.testing.assert_allclose(result["rows_iou"],
                               [0.0, 0.1, 0.2, 0.1, 0.2])

    # single-process oracle (same math, full batch, float32)
    X = (np.arange(16 * 8, dtype=np.float32).reshape(16, 8) / 100.0)
    Y = (X @ np.linspace(0.1, 0.8, 8, dtype=np.float32)[:, None]
         + 0.3).astype(np.float32)
    w = np.zeros((8, 1), np.float32)
    loss0 = float(np.mean((X @ w - Y) ** 2))
    g = 2.0 * X.T @ (X @ w - Y) / Y.size
    w = w - 0.1 * g
    loss1 = float(np.mean((X @ w - Y) ** 2))

    np.testing.assert_allclose(result["loss0"], loss0, rtol=1e-6)
    np.testing.assert_allclose(result["loss1"], loss1, rtol=1e-5)

    # ---- phase 2 oracle: the REAL ProbeTrainer, single-process ----
    # identical model/data/batching run in THIS process (8 virtual devices,
    # conftest mesh); multi-process losses/metrics must match. The shard
    # interleave reorders samples across the global batch, but every batch
    # contains the same 8-sample set per step (16 samples / bs 4 / 2 shards
    # feed global batches of 8), so the mean loss is order-invariant.
    import jax.numpy as jnp

    from midvision_probe_tpu.datasets.builder import Loader
    from midvision_probe_tpu.engine.probe_fit import ProbeTrainer
    from midvision_probe_tpu.models.probes import DepthHead
    from midvision_probe_tpu.models.zoo import build_vit_extractor
    from midvision_probe_tpu.ops.image import resize
    from midvision_probe_tpu.parallel import multihost as mh
    from midvision_probe_tpu.utils.losses import depth_loss

    class _DS:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            r = np.random.RandomState(100 + i)
            return {"image": r.rand(32, 32, 3).astype(np.float32),
                    "depth": (r.rand(32, 32, 1) * 9 + 0.5).astype(np.float32)}

    class _DS15(_DS):
        def __len__(self):
            return 15

    backbone = build_vit_extractor("test_tiny_vit", output="dense")
    probe = DepthHead(feat_dim=backbone.feat_dim, head_type="linear",
                      max_depth=10.0)

    def loss_fn(pred, b):
        return depth_loss(resize(pred, b["depth"].shape[1:3],
                                 mode="bilinear"), b["depth"], max_depth=10.0)

    trainer = ProbeTrainer(backbone=backbone, probe=probe, loss_fn=loss_fn,
                           n_steps=4, warmup_steps=1.0, seed=0)
    # single process: one loader over ALL samples, global batch 8 = the
    # union of the two 4-row host batches in the distributed run
    train_loader = Loader(_DS(), batch_size=8, shuffle=False, drop_last=True)
    trainer.init(next(iter(train_loader)))
    epoch_loss = trainer.train_epoch(train_loader)
    np.testing.assert_allclose(result["epoch_loss"], epoch_loss, rtol=2e-5)

    metrics = mh.gather_metrics(trainer.validate(
        Loader(_DS15(), batch_size=8, shuffle=False),
        lambda pred, b: {"mae": jnp.mean(jnp.abs(
            resize(pred, b["depth"].shape[1:3], mode="bilinear")
            - b["depth"]), axis=(1, 2, 3))},
    ))
    assert len(result["mae_sorted"]) == 15  # the wrapped repeat was dropped
    np.testing.assert_allclose(result["mae_sorted"],
                               sorted(metrics["mae"].tolist()), rtol=2e-5)

    # feature-cache + batch-order shuffle, multi-process vs single-process:
    # per-epoch order permutations are seeded, so both runs see the same
    # batch sets per epoch; epoch means must match
    trainer_c = ProbeTrainer(backbone=backbone, probe=probe, loss_fn=loss_fn,
                             n_steps=8, warmup_steps=1.0, seed=0,
                             cache_features=True)
    cache_loader = Loader(_DS(), batch_size=8, shuffle=False, drop_last=True,
                          shuffle_batch_order=True, seed=11)
    trainer_c.init(next(iter(cache_loader)))
    for ep, want in enumerate(result["cache_losses"]):
        cache_loader.set_epoch(ep)
        got = float(trainer_c.train_epoch(cache_loader))
        np.testing.assert_allclose(got, want, rtol=2e-5,
                                   err_msg=f"cached epoch {ep}")

    # ---- phase 3 oracle: the NAVI eval DRIVER, single-process ----
    # identical config re-run here (9 pairs, so the 2-process run sharded
    # 5 + 4 with one wrapped repeat dropped); the CSV row dict — every
    # recall and rotation bin, as formatted — must match the distributed
    # run exactly, and only rank 0 may have written a CSV
    from midvision_probe_tpu.config import compose

    import evaluate_navi_correspondence as navi_drv

    navi_cfg = compose(
        "navi_correspondence",
        ["backbone=test_tiny", "dataset=synthetic_navi",
         "dataset.num_instances=9", "num_corr=64", "batch_pairs=4",
         "scale_factor=0.25", f"output_dir={tmp_path / 'navi_1proc'}"],
    )
    navi_single = navi_drv.run(navi_cfg)
    assert navi_single["err_3d"].shape == (9, 64)
    assert result["navi_row"] == navi_single["row"]
    np.testing.assert_allclose(
        result["navi_err3d_sorted"],
        np.sort(np.asarray(navi_single["err_3d"]).reshape(-1)), rtol=1e-5)

    csv_2proc = tmp_path / "navi_2proc" / "navi_correspondence_final.csv"
    assert csv_2proc.exists()
    lines = [ln for ln in csv_2proc.read_text().splitlines() if ln.strip()]
    assert len(lines) == 2, f"rank-0-only CSV expected 1 data row: {lines}"
