#!/usr/bin/env python
"""Cache-shuffle A/B (VERDICT r2 #3) — measured accuracy impact of the
feature cache's fixed batch COMPOSITION vs the reference's full per-epoch
sample reshuffling (``sampler.set_epoch``, reference ``train_depth.py:94-95``).

Arms (same data, probe, schedule; N seeds each):
  * cache+order-shuffle — ``system.cache_features=true``: batch composition
    frozen (cache key), arrival ORDER epoch-permuted
    (``driver_common.cache_shuffle_kwargs``).
  * full-shuffle — no cache: sample-level reshuffle every epoch.

Runs the real ``train_depth.py`` driver on synthetic depth data on CPU.
Writes a markdown table with per-seed sa_d1/si_d1 and the mean deltas, so
the cache path's protocol deviation is a recorded number, not a hope.
"""
import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="test_tiny")
    ap.add_argument("--instances", type=int, default=256)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--epochs", default="ten_epoch")
    ap.add_argument("--seeds", type=int, nargs="*", default=[0, 1, 2])
    ap.add_argument("--out", default="logs/shuffle_ab_r4.md")
    args = ap.parse_args(argv)

    from midvision_probe_tpu.config import compose

    import train_depth

    arms = {"cache+order-shuffle": ["system.cache_features=true"],
            "full-shuffle": ["system.cache_features=false"]}
    rows = {name: [] for name in arms}
    for seed in args.seeds:
        for name, extra in arms.items():
            overrides = [
                f"backbone={args.backbone}", "dataset=synthetic",
                f"dataset.num_instances={args.instances}",
                f"dataset.image_size=[{args.size},{args.size}]",
                "probe=depth_linear", f"optimizer={args.epochs}",
                "batch_size=32", f"system.random_seed={seed}",
                f"output_dir=/tmp/shuffle_ab_{seed}_{name.split('+')[0]}",
                "wandb.use=False", "+render_images=False", *extra,
            ]
            cfg = compose("depth_training", overrides)
            t0 = time.time()
            row = train_depth.run(cfg)
            rows[name].append(row)
            print(f"[ab] seed {seed} {name}: sa_d1={row['sa_d1']:.4f} "
                  f"si_d1={row['si_d1']:.4f} ({time.time() - t0:.0f}s)",
                  flush=True)

    def mean(name, key):
        vals = [r[key] for r in rows[name]]
        return sum(vals) / len(vals)

    lines = [
        "# Cache-shuffle A/B — fixed batch composition vs full reshuffle",
        "",
        f"backbone {args.backbone} (random init), synthetic depth "
        f"{args.instances} imgs @ {args.size}², linear probe, "
        f"{args.epochs}, batch 32, seeds {args.seeds}, CPU, real "
        "`train_depth.py` driver.",
        "",
        "| arm | " + " | ".join(f"seed{s} sa_d1" for s in args.seeds) +
        " | mean sa_d1 | mean si_d1 |",
        "|---|" + "---|" * (len(args.seeds) + 2),
    ]
    for name in arms:
        per_seed = " | ".join(f"{r['sa_d1']:.4f}" for r in rows[name])
        lines.append(f"| {name} | {per_seed} | {mean(name, 'sa_d1'):.4f} "
                     f"| {mean(name, 'si_d1'):.4f} |")
    d_sa = mean("cache+order-shuffle", "sa_d1") - mean("full-shuffle", "sa_d1")
    d_si = mean("cache+order-shuffle", "si_d1") - mean("full-shuffle", "si_d1")
    spread = max(abs(a["sa_d1"] - b["sa_d1"]) for a, b in
                 zip(rows["cache+order-shuffle"], rows["full-shuffle"]))
    lines += [
        "",
        f"mean delta (cache − full-shuffle): sa_d1 {d_sa:+.4f}, "
        f"si_d1 {d_si:+.4f}; max per-seed |Δsa_d1| {spread:.4f}.",
        "",
        "Caveat: random-init backbone + synthetic data — the measurement "
        "isolates the optimizer-trajectory effect of batch-composition "
        "freezing, which is the only thing the cache changes (identical "
        "model, loss, schedule, data).",
    ]
    out_dir = os.path.dirname(os.path.abspath(args.out))
    os.makedirs(out_dir, exist_ok=True)  # don't lose 6 runs to a missing dir
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
